"""Pure-Python sequential replay oracle (FIXTURES.md "Oracle").

Ground truth for pytest: applies the CDC log event-by-event, in ``seq``
order, to an in-memory dict — the semantics the distributed engine must
reproduce.  Last-writer-wins by ``seq`` per ``(conv_id, turn_idx)``; a ``D``
with a winning seq removes the key; a later ``I`` re-inserts it.

This mirrors what the reference delegates to the *target system* (RDBMS
``INSERT ... ON DUPLICATE KEY UPDATE``, ``/root/reference/plugin-rdbms-util/
.../writer/util/WriterUtil.java:113-146``; OTS PUT/UPDATE/DELETE_ROW,
``/root/reference/otswriter/.../model/OTSOpType.java:4-6``).
"""

from __future__ import annotations

import pyarrow as pa

from .schema import LAKE_SCHEMA


def replay(events: pa.Table, state: dict | None = None, sparse: bool = False) -> dict:
    """Apply events sequentially (log order = seq order).  Returns/updates
    ``state``: {(conv_id, turn_idx): (seq, row-dict-or-None)}  (None = tombstone).

    ``sparse=True``: a U's null payload fields mean "unchanged" and merge
    onto the existing row (or create a partial row on an absent/deleted
    key); I always replaces the full image (explicit nulls included)."""
    if state is None:
        state = {}
    rows = events.to_pylist()
    key_cols = ("conv_id", "turn_idx", "seq")
    for r in rows:
        key = (r["conv_id"], r["turn_idx"])
        seq = r["seq"]
        prev = state.get(key)
        if prev is not None and prev[0] >= seq:
            continue  # stale event loses
        if r["op"] == "D":
            state[key] = (seq, None)
        elif sparse and r["op"] == "U":
            base = dict(prev[1]) if (prev is not None and prev[1] is not None) else {
                "conv_id": r["conv_id"], "turn_idx": r["turn_idx"],
            }
            for k, v in r.items():
                if k == "op":
                    continue
                if k in key_cols or v is not None:
                    base[k] = v
            state[key] = (seq, base)
        else:
            payload = {k: v for k, v in r.items() if k not in ("op",)}
            state[key] = (seq, payload)
    return state


def final_table(state: dict, schema: pa.Schema = LAKE_SCHEMA) -> pa.Table:
    """Live rows, sorted by (conv_id, turn_idx) — the stable output order."""
    live = sorted(
        (k, v[1]) for k, v in state.items() if v[1] is not None
    )
    rows = []
    for (_conv, _turn), payload in live:
        row = {f.name: payload.get(f.name) for f in schema}
        rows.append(row)
    if not rows:
        return schema.empty_table()
    return pa.Table.from_pylist(rows, schema=schema)


def replay_to_table(events: pa.Table, schema: pa.Schema = LAKE_SCHEMA,
                    sparse: bool = False) -> pa.Table:
    return final_table(replay(events, sparse=sparse), schema)
