"""Bootstrap-then-tail: incremental ingest from a source that only offers
FULL SNAPSHOTS (no binlog) — the migration path for every RDBMS the
reference can only bulk-re-read (its rdbms readers re-dump whole tables
each run, ``/root/reference/plugin-rdbms-util/.../CommonRdbmsReader.java``):

  1. bootstrap — day-0 snapshot becomes an initial WAL of inserts;
     one `run_job` builds the partitioned lake
  2. diff      — day-1 snapshot arrives; `relational.snapshot_cdc`
     derives the I/U/D delta with one distributed full-outer join
  3. tail      — the delta lands as NEW WAL segments (seqs above the
     lake watermark); `run_job` applies only those (pruned replay)
  4. verify    — final lake state equals the day-1 snapshot per row,
     and a second tail is a no-op (exactly-once held)

Usage:
    python examples/snapshot_bootstrap_tail.py [root_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

import ray


def _snapshot(day: int, n: int = 3000) -> pa.Table:
    """Deterministic synthetic source snapshots: day 1 drops every 13th
    key (deletes), rewrites text for every 7th (updates), and appends new
    keys (inserts)."""
    hi = n + (300 if day else 0)
    keys = np.array([k for k in range(hi) if day == 0 or k % 13 != 0])
    text = np.where(
        (keys % 7 == 0) & (day > 0),
        [f"row {k} rev{day}" for k in keys],
        [f"row {k} rev0" for k in keys],
    )
    return pa.table({
        "conv_id": pa.array([f"conv-{k % 97}" for k in keys], pa.string()),
        "turn_idx": pa.array((keys % 37).astype(np.int32)),
        "role": pa.array(np.where(keys % 2 == 0, "user", "assistant")),
        "text": pa.array(text.astype(object), pa.string()),
        "tool": pa.array([None] * len(keys), pa.string()),
        "ts": pa.array(
            np.full(len(keys), np.datetime64("2026-01-01", "us"))
            + (keys * 1000).astype("timedelta64[us]")
        ),
        # the snapshot's own key: (conv_id, turn_idx) would collide across
        # source rows, so the example keys rows by their source pk k and
        # maps it onto the transcript key space below
        "k": pa.array(keys, pa.int64()),
    })


def _dedupe_by_transcript_key(snap: pa.Table) -> pa.Table:
    """Map the source pk onto the lake key (conv_id, turn_idx): keep the
    max-k row per key so snapshots stay internally consistent."""
    import pyarrow.compute as pc

    t = snap.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending"),
                      ("k", "ascending")])
    conv = t["conv_id"].to_numpy(zero_copy_only=False)
    turn = t["turn_idx"].to_numpy(zero_copy_only=False)
    last = np.ones(t.num_rows, dtype=bool)
    if t.num_rows > 1:
        same = (conv[1:] == conv[:-1]) & (turn[1:] == turn[:-1])
        last[:-1] = ~same
    return t.filter(pa.array(last)).drop_columns(["k"])


def main(root: str = "/tmp/snap_tail") -> dict:
    import shutil

    import pyarrow.compute as pc
    import ray.data as rd

    from raydatax.driver import lake_table, run_job
    from raydatax.gen import append_wal, write_wal
    from raydatax.relational import snapshot_cdc
    from raydatax.schema import EVENT_SCHEMA

    shutil.rmtree(root, ignore_errors=True)
    wal, lake = os.path.join(root, "wal"), os.path.join(root, "lake")
    rep: dict = {}

    # 1. bootstrap: day-0 snapshot -> insert WAL -> lake
    day0 = _dedupe_by_transcript_key(_snapshot(0))
    ev0 = pa.table({
        "seq": pa.array(np.arange(1, day0.num_rows + 1, dtype=np.int64)),
        "op": pa.array(["I"] * day0.num_rows, pa.string()),
        **{f: day0[f] for f in day0.column_names},
    }).cast(EVENT_SCHEMA)
    write_wal(ev0, wal, seg_rows=1000)
    rep["bootstrap"] = run_job(wal, lake, partitions=8)

    # 2. diff: day-1 snapshot vs day-0 via the distributed full-outer join
    day1 = _dedupe_by_transcript_key(_snapshot(1))
    payload = ["role", "text", "tool", "ts"]
    delta = snapshot_cdc(
        rd.from_arrow(day1), rd.from_arrow(day0),
        key_cols=["conv_id", "turn_idx"], compare_cols=payload,
    ).take_all()
    rep["delta"] = {
        op: sum(1 for r in delta if r["op"] == op) for op in ("I", "U", "D")
    }

    # 3. tail: the delta becomes new WAL segments above the watermark
    base_seq = day0.num_rows + 1
    ev1 = pa.table({
        "seq": pa.array(np.arange(base_seq, base_seq + len(delta), dtype=np.int64)),
        "op": pa.array([r["op"] for r in delta], pa.string()),
        "conv_id": pa.array([r["conv_id"] for r in delta], pa.string()),
        "turn_idx": pa.array([r["turn_idx"] for r in delta], pa.int32()),
        "role": pa.array([r["role"] for r in delta], pa.string()),
        "text": pa.array([r["text"] for r in delta], pa.string()),
        "tool": pa.array([r["tool"] for r in delta], pa.string()),
        "ts": pa.array([r["ts"] for r in delta], pa.timestamp("us")),
    }).cast(EVENT_SCHEMA)
    # append-only WAL: new segments continue the numbering (max+1 rule)
    append_wal(ev1, wal, seg_rows=1000)
    rep["tail"] = run_job(wal, lake, partitions=8)

    # 4. verify: lake state == day-1 snapshot, rerun is a no-op
    lk = lake_table(lake).select(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    want = day1.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    rep["state_equal"] = lk.equals(want.select(lk.column_names))
    rep["rerun"] = run_job(wal, lake, partitions=8)
    rep["noop"] = rep["rerun"]["action"] == "noop"
    return rep


if __name__ == "__main__":
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    out = main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/snap_tail")
    print(out)
    ray.shutdown()
