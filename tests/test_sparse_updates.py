"""Sparse-update variant (FIXTURES F2): U events carry only changed fields;
the engine resolves each field independently (latest non-null since the last
full-image reset), matching the sequential oracle."""

import pyarrow as pa
import pytest

from raydatax.driver import lake_table, run_job
from raydatax.gen import gen_events, write_wal
from raydatax.merge import lww_winners
from raydatax.oracle import replay_to_table
from raydatax.schema import EVENT_SCHEMA

SORT = [("conv_id", "ascending"), ("turn_idx", "ascending")]


def _ev(seq, op, conv="c", turn=0, role=None, text=None, tool=None):
    return {"seq": seq, "op": op, "conv_id": conv, "turn_idx": turn,
            "role": role, "text": text, "tool": tool, "ts": None}


def test_sparse_kernel_semantics():
    events = pa.Table.from_pylist(
        [
            _ev(1, "I", role="user", text="v1", tool="search"),
            _ev(2, "U", text="v2"),                 # text only
            _ev(3, "U", tool=None, role="assistant"),  # role only
            _ev(4, "D"),
            _ev(5, "U", text="recreated"),          # U-create after delete
            _ev(6, "I", conv="d", role="user", text="full", tool=None),
            _ev(7, "U", conv="d", tool="python"),
        ],
        schema=EVENT_SCHEMA,
    )
    events = events.append_column("x", events["op"])  # noop extra? no — keep schema
    events = events.drop_columns(["x"])
    win = lww_winners(events, sparse=True)
    rows = {(r["conv_id"], r["turn_idx"]): r for r in win.to_pylist()}
    c = rows[("c", 0)]
    # after D at seq 4, the U at 5 creates a partial row: no leak from seq 1-3
    assert c["text"] == "recreated" and c["role"] is None and c["tool"] is None
    d = rows[("d", 0)]
    assert d == {**d, "role": "user", "text": "full", "tool": "python"}

    # oracle agrees
    want = replay_to_table(events, sparse=True).sort_by(SORT)
    got = win.drop_columns(["op"]).select(want.schema.names).sort_by(SORT)
    assert got.cast(want.schema).equals(want)


def test_sparse_end_to_end_vs_oracle(tmp_wal, tmp_lake):
    ev = gen_events(15_000, seed=61, sparse_updates=True)
    # sanity: some U rows really are partial
    import pyarrow.compute as pc

    u = ev.filter(pc.equal(ev["op"], "U"))
    assert u.num_rows and u["text"].null_count > 0 and u["role"].null_count > 0

    write_wal(ev, tmp_wal, seg_rows=3000)
    rep = run_job(tmp_wal, tmp_lake, partitions=8, sparse_updates=True)
    assert rep["events_replayed"] == ev.num_rows

    got = lake_table(tmp_lake).sort_by(SORT)
    want = replay_to_table(ev, sparse=True).sort_by(SORT)
    assert got.num_rows == want.num_rows
    assert got.cast(want.schema).equals(want)


def test_sparse_incremental_rebase(tmp_wal, tmp_lake):
    """Field values must persist across epochs: a U in epoch 2 merges onto
    the base row committed in epoch 1 (rebase carries the merged state)."""
    import glob
    import os

    ev = gen_events(10_000, seed=62, sparse_updates=True)
    half = ev.num_rows // 2
    write_wal(ev.slice(0, half), tmp_wal, seg_rows=2000)
    run_job(tmp_wal, tmp_lake, partitions=4, sparse_updates=True)

    existing = len(glob.glob(os.path.join(tmp_wal, "seg-*.parquet")))
    tmp2 = tmp_wal + "_x"
    write_wal(ev.slice(half), tmp2, seg_rows=2000)
    for i, p in enumerate(sorted(glob.glob(os.path.join(tmp2, "seg-*.parquet")))):
        os.rename(p, os.path.join(tmp_wal, f"seg-{existing + i:05d}.parquet"))
    run_job(tmp_wal, tmp_lake, partitions=4)

    got = lake_table(tmp_lake).sort_by(SORT)
    want = replay_to_table(ev, sparse=True).sort_by(SORT)
    assert got.cast(want.schema).equals(want)


def test_sparse_mode_is_lake_level_state(tmp_wal, tmp_lake):
    """The second run omits sparse_updates — the lake config remembers."""
    import json
    import os

    write_wal(gen_events(3000, seed=63, sparse_updates=True), tmp_wal, seg_rows=1000)
    run_job(tmp_wal, tmp_lake, partitions=4, sparse_updates=True)
    cfg = json.load(open(os.path.join(tmp_lake, "_lake.json")))
    assert cfg["sparse_updates"] is True
