"""Update splitting — ShouldSplitKVEntry / SplitUpdateKVEntry.

Reference: an UPDATE whose handle (identity) key changed must be split into
DELETE(old key) + INSERT(new key) (/root/reference/cdc/model/kv.go:113-130);
modes None / AtStart / Always
(/root/reference/cdc/processor/sourcemanager/manager.go:39-46).

Spark form: derive the pre-image key from ``pre_payload``; where it differs
from the post-image key, explode the row into a delete (at the old key) and
an insert (at the new key), both inheriting (commit_ts, start_ts). The
delete sorts before the insert at equal ts by op_order — exactly the
reference's ordering guarantee.

For the transcripts table the key (conv_id, turn_idx) is immutable, so this
is a safety/parity operator: mode "always" re-writing updates as
delete+insert also reproduces safe-mode replication
(/root/reference/dm/syncer/safe-mode/mode.go).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_updates(
    events: DataFrame,
    pre_key_cols: dict[str, str] | None = None,
    mode: str = "on_key_change",
) -> DataFrame:
    """Split qualifying updates into delete+insert rows.

    ``pre_key_cols`` maps key column -> expression giving its pre-image value
    (e.g. {"conv_id": "pre_conv_id"}). If None or mode == "never", events
    pass through. mode: "never" | "on_key_change" | "always".
    """
    if mode == "never" or (pre_key_cols is None and mode != "always"):
        return events

    if pre_key_cols:
        key_changed = None
        for k, pre in pre_key_cols.items():
            neq = ~F.col(k).eqNullSafe(F.expr(pre))
            key_changed = neq if key_changed is None else (key_changed | neq)
    else:
        key_changed = F.lit(True)

    needs_split = (F.col("op") == "U") & (
        F.lit(True) if mode == "always" else key_changed
    )

    passthrough = events.filter(~needs_split)
    to_split = events.filter(needs_split)

    # delete at the PRE-image key, payload from pre_payload
    del_cols = []
    for c in events.columns:
        if pre_key_cols and c in pre_key_cols:
            del_cols.append(F.expr(pre_key_cols[c]).cast(events.schema[c].dataType).alias(c))
        elif c == "op":
            del_cols.append(F.lit("D").alias("op"))
        elif c == "payload":
            del_cols.append(F.lit(None).cast("string").alias("payload"))
        else:
            del_cols.append(F.col(c))
    deletes = to_split.select(*del_cols)

    inserts = to_split.withColumn("op", F.lit("I"))

    return passthrough.unionByName(deletes).unionByName(inserts)
