"""Naive single-threaded replay oracle (FIXTURES.md §6).

Ground truth for every e2e test: sort ALL change events by
(commit_ts, start_ts, op_order) globally — the reference's total order
(/root/reference/cdc/model/mounter.go:163-186) — and apply them one by one
to a dict keyed by (conv_id, turn_idx). The engine's final table must equal
this, independent of batching, partitioning, restarts, or redelivery.
"""

from __future__ import annotations

import json
from typing import Any

from tiflow_spark.operators.ordering import OP_ORDER


def replay(events: list[dict[str, Any]],
           version_fields: dict[int, tuple[str, ...]] | None = None,
           ) -> dict[tuple[str, int], dict[str, Any]]:
    """Replay change events; returns final state {key: decoded payload row}.

    ``version_fields`` maps schema_version -> allowed payload field names
    (the registry); fields outside the event's version are dropped, missing
    ones become None (mounter backfill rule).
    """
    all_fields: tuple[str, ...] = ("role", "text", "tool", "ts")
    state: dict[tuple[str, int], dict[str, Any]] = {}

    def sort_key(e: dict[str, Any]):
        return (
            e["commit_ts"],
            e["start_ts"],
            OP_ORDER[e["op"]],
            # final tie-break for exact redeliveries: any stable key
            e["conv_id"],
            e["turn_idx"],
        )

    for e in sorted(events, key=sort_key):
        key = (e["conv_id"], e["turn_idx"])
        if e["op"] == "D":
            state.pop(key, None)
            continue
        payload = json.loads(e["payload"]) if e["payload"] else {}
        allowed = (
            version_fields.get(e["schema_version"], all_fields)
            if version_fields
            else all_fields
        )
        row = {f: (payload.get(f) if f in allowed else None) for f in all_fields}
        row["commit_ts"] = e["commit_ts"]
        state[key] = row
    return state
