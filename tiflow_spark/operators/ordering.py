"""Event total order — the sorter key.

Reference: ComparePolymorphicEvents (/root/reference/cdc/model/mounter.go:163-186)
and the pebble sorter key layout
(/root/reference/cdc/processor/sourcemanager/sorter/pebble/encoding/key.go:85-120):
order by CRTs, then StartTs, then op with delete(1) < update(2) < insert(3)
(getDMLOrder, key.go:113). Here that becomes a derived column used in every
window/sort — a constant-folded CASE expression, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# delete < update < insert — getDMLOrder (encoding/key.go:113-120)
OP_ORDER = {"D": 1, "U": 2, "I": 3}


def op_order(op: Column | str = "op") -> Column:
    c = F.col(op) if isinstance(op, str) else op
    return (
        F.when(c == "D", F.lit(OP_ORDER["D"]))
        .when(c == "U", F.lit(OP_ORDER["U"]))
        .otherwise(F.lit(OP_ORDER["I"]))
    )


# The version tuple that totally orders events of one key. Larger = newer.
VERSION_COLS = ("commit_ts", "start_ts", "op_order")
