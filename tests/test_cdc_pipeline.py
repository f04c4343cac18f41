"""End-to-end CDC replay correctness vs the sequential oracle (FIXTURES F2),
incremental tailing, dirty records, and metrics accounting."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydatax.driver import lake_table, run_job
from raydatax.gen import gen_events, write_wal
from raydatax.oracle import replay_to_table
from raydatax.schema import EVENT_SCHEMA

SORT = [("conv_id", "ascending"), ("turn_idx", "ascending")]


def wal_log(wal_dir):
    return pa.concat_tables(
        [pq.read_table(p) for p in sorted(glob.glob(os.path.join(wal_dir, "seg-*.parquet")))],
        promote_options="permissive",
    )


def test_replay_matches_oracle(tmp_wal, tmp_lake):
    events = gen_events(20_000, seed=42)
    write_wal(events, tmp_wal, seg_rows=4000)
    rep = run_job(tmp_wal, tmp_lake, partitions=8)
    assert rep["action"] == "applied"
    assert rep["events_replayed"] == events.num_rows

    got = lake_table(tmp_lake).sort_by(SORT)
    want = replay_to_table(events).sort_by(SORT)
    assert got.num_rows == want.num_rows
    assert got.cast(want.schema).equals(want)
    # per-turn text equality under stable (conv_id, turn_idx) ordering
    assert got["text"].equals(want["text"])


def test_incremental_tail(tmp_wal, tmp_lake):
    """Two tail cycles: new segments appended after the first apply are the
    only thing replayed in the second."""
    ev = gen_events(16_000, seed=7)
    half = ev.num_rows // 2
    write_wal(ev.slice(0, half), tmp_wal, seg_rows=2000)
    rep1 = run_job(tmp_wal, tmp_lake, partitions=4)
    assert rep1["events_replayed"] == half

    # append the remaining log as later segments (names continue)
    n_existing = len(glob.glob(os.path.join(tmp_wal, "seg-*.parquet")))
    rest = ev.slice(half)
    tmp2 = tmp_wal + "_x"
    write_wal(rest, tmp2, seg_rows=2000)
    for i, p in enumerate(sorted(glob.glob(os.path.join(tmp2, "seg-*.parquet")))):
        os.rename(p, os.path.join(tmp_wal, f"seg-{n_existing + i:05d}.parquet"))

    rep2 = run_job(tmp_wal, tmp_lake, partitions=4)
    assert rep2["events_replayed"] == ev.num_rows - half
    assert rep2["segments_pruned"] > 0, "old segments must be pruned by footer stats"

    got = lake_table(tmp_lake).sort_by(SORT)
    want = replay_to_table(ev).sort_by(SORT)
    assert got.cast(want.schema).equals(want)


def test_rerun_is_noop(tmp_wal, tmp_lake):
    write_wal(gen_events(5000, seed=5), tmp_wal, seg_rows=2000)
    run_job(tmp_wal, tmp_lake, partitions=4)
    rep = run_job(tmp_wal, tmp_lake, partitions=4)
    assert rep["action"] == "noop"
    assert rep["segments_read"] == 0


def test_dirty_records_dead_lettered(tmp_wal, tmp_lake):
    ev = gen_events(4000, seed=6)
    bad = pa.Table.from_pylist(
        [
            {"seq": 10_000_000, "op": "X", "conv_id": "c", "turn_idx": 0,
             "role": "user", "text": "t", "tool": None, "ts": None},
            {"seq": 10_000_001, "op": "I", "conv_id": None, "turn_idx": 0,
             "role": "user", "text": "t", "tool": None, "ts": None},
            {"seq": 10_000_002, "op": "I", "conv_id": "c", "turn_idx": 1,
             "role": None, "text": None, "tool": None, "ts": None},
        ],
        schema=EVENT_SCHEMA,
    )
    write_wal(pa.concat_tables([ev, bad]), tmp_wal, seg_rows=2000)
    rep = run_job(tmp_wal, tmp_lake, partitions=4)
    assert rep["dirty_records"] == 3
    assert rep["events_replayed"] == ev.num_rows
    dl = glob.glob(os.path.join(tmp_lake, "_deadletter", "*", "dirty-*.parquet"))
    assert dl and sum(pq.read_metadata(p).num_rows for p in dl) == 3
    # clean rows still correct
    want = replay_to_table(ev).sort_by(SORT)
    assert lake_table(tmp_lake).sort_by(SORT).cast(want.schema).equals(want)


def test_deadletter_repair_requeue(tmp_wal, tmp_lake):
    """Dirty-data round trip: dead-lettered records are listed, repaired,
    requeued as NEW events past the WAL tail, and applied by the next job
    — the full DataX dirty-record story, closed."""
    import pyarrow.compute as pc

    from raydatax.driver import list_deadletters, requeue_deadletters

    ev = gen_events(3000, seed=61)
    bad = pa.Table.from_pylist(
        [
            {"seq": 10_000_000, "op": "I", "conv_id": None, "turn_idx": 0,
             "role": "user", "text": "repair-me-a", "tool": None, "ts": None},
            {"seq": 10_000_001, "op": "I", "conv_id": None, "turn_idx": 1,
             "role": "user", "text": "repair-me-b", "tool": None, "ts": None},
        ],
        schema=EVENT_SCHEMA,
    )
    write_wal(pa.concat_tables([ev, bad]), tmp_wal, seg_rows=1000)
    rep = run_job(tmp_wal, tmp_lake, partitions=4)
    assert rep["dirty_records"] == 2
    dl = list_deadletters(tmp_lake)
    assert dl.num_rows == 2 and "__epoch" in dl.column_names

    def repair(t: pa.Table) -> pa.Table:
        fixed = pc.fill_null(t["conv_id"], "conv-repaired")
        return t.set_column(t.schema.get_field_index("conv_id"), "conv_id", fixed)

    n = requeue_deadletters(tmp_lake, tmp_wal, repair)
    assert n == 2
    assert list_deadletters(tmp_lake) is None  # cleared after requeue
    rep2 = run_job(tmp_wal, tmp_lake, partitions=4)
    assert rep2["action"] == "applied" and rep2["dirty_records"] == 0
    got = lake_table(tmp_lake)
    fixed_rows = got.filter(pc.equal(got["conv_id"], "conv-repaired"))
    assert fixed_rows.num_rows == 2
    assert sorted(fixed_rows["text"].to_pylist()) == ["repair-me-a", "repair-me-b"]


def test_dirty_record_limit_aborts_before_commit(tmp_wal, tmp_lake):
    ev = gen_events(2000, seed=8)
    bad = pa.Table.from_pylist(
        [{"seq": 10_000_000, "op": "Z", "conv_id": "c", "turn_idx": 0,
          "role": "u", "text": "t", "tool": None, "ts": None}],
        schema=EVENT_SCHEMA,
    )
    write_wal(pa.concat_tables([ev, bad]), tmp_wal, seg_rows=1000)
    with pytest.raises(RuntimeError, match="dirty-record limit"):
        run_job(tmp_wal, tmp_lake, partitions=4, error_limit_records=0)
    assert not glob.glob(os.path.join(tmp_lake, "_manifests", "part-*.json")), (
        "abort must happen before any partition commit"
    )


def test_metrics_and_lineage(tmp_wal, tmp_lake):
    ev = gen_events(10_000, seed=9)
    write_wal(ev, tmp_wal, seg_rows=2500)
    rep = run_job(tmp_wal, tmp_lake, partitions=4)
    assert rep["inserts"] + rep["updates"] + rep["deletes"] == rep["events_replayed"]
    per = rep["per_partition"]
    assert sum(r["replayed"] for r in per) == rep["events_replayed"]
    assert all(r["hw_seq"] >= 0 for r in per if r["action"] == "write")
    mpath = glob.glob(os.path.join(tmp_lake, "_metrics", "epoch-*.json"))
    assert mpath
    saved = json.load(open(mpath[0]))
    assert saved["events_replayed"] == rep["events_replayed"]


def test_engine_paths_equivalent(tmp_path):
    """The hash-exchange fast path and the pure-Dataset groupby path must
    produce byte-identical lakes."""
    wal = str(tmp_path / "wal")
    write_wal(gen_events(8000, seed=77), wal, seg_rows=2000)
    lake_a, lake_b = str(tmp_path / "a"), str(tmp_path / "b")
    run_job(wal, lake_a, partitions=4, engine="exchange")
    run_job(wal, lake_b, partitions=4, engine="dataset")
    fa = sorted(glob.glob(os.path.join(lake_a, "data", "part-*", "*.parquet")))
    fb = sorted(glob.glob(os.path.join(lake_b, "data", "part-*", "*.parquet")))
    assert [os.path.relpath(p, lake_a) for p in fa] == [os.path.relpath(p, lake_b) for p in fb]
    for a, b in zip(fa, fb):
        assert open(a, "rb").read() == open(b, "rb").read()


def test_dirty_percentage_limit(tmp_wal, tmp_lake):
    """ErrorRecordChecker percentage mode (reference checks record count OR
    fraction, ErrorRecordChecker.java:48-81)."""
    ev = gen_events(1000, seed=14)
    bad = pa.Table.from_pylist(
        [{"seq": 10_000_000 + i, "op": "Z", "conv_id": "c", "turn_idx": i,
          "role": "u", "text": "t", "tool": None, "ts": None} for i in range(200)],
        schema=EVENT_SCHEMA,
    )
    write_wal(pa.concat_tables([ev, bad]), tmp_wal, seg_rows=500)
    with pytest.raises(RuntimeError, match="percentage"):
        run_job(tmp_wal, tmp_lake, partitions=4, error_limit_percentage=0.05)
    # generous limit passes
    lake2 = tmp_lake + "_ok"
    rep = run_job(tmp_wal, lake2, partitions=4, error_limit_percentage=0.5)
    assert rep["dirty_records"] == 200


def test_engine_paths_equivalent_sparse(tmp_path):
    wal = str(tmp_path / "wal")
    write_wal(gen_events(6000, seed=78, sparse_updates=True), wal, seg_rows=1500)
    lake_a, lake_b = str(tmp_path / "a"), str(tmp_path / "b")
    run_job(wal, lake_a, partitions=4, engine="exchange", sparse_updates=True)
    run_job(wal, lake_b, partitions=4, engine="dataset", sparse_updates=True)
    fa = sorted(glob.glob(os.path.join(lake_a, "data", "part-*", "*.parquet")))
    fb = sorted(glob.glob(os.path.join(lake_b, "data", "part-*", "*.parquet")))
    for a, b in zip(fa, fb):
        assert open(a, "rb").read() == open(b, "rb").read()


def test_read_lake_pushdown(tmp_wal, tmp_lake):
    """columns= / filter= push into the parquet scan and agree with the
    full read (prune-at-the-read discipline)."""
    import pyarrow.dataset as pds

    from raydatax.driver import read_lake

    events = gen_events(10_000, seed=42)
    write_wal(events, tmp_wal, seg_rows=4000)
    run_job(tmp_wal, tmp_lake, partitions=4)

    full = lake_table(tmp_lake)
    ds = read_lake(tmp_lake, columns=["conv_id", "turn_idx"])
    assert set(ds.schema().names) == {"conv_id", "turn_idx"}
    assert ds.count() == full.num_rows

    flt = pds.field("turn_idx") < 5
    got = read_lake(tmp_lake, filter=flt).take_all()
    import pyarrow.compute as pc

    want = full.filter(pc.less(full["turn_idx"], 5))
    assert len(got) == want.num_rows

    # combined: filter fields ride along in columns, dropped post-scan
    both = read_lake(
        tmp_lake, columns=["conv_id", "text", "turn_idx"], filter=flt
    ).select_columns(["conv_id", "text"])
    assert set(both.schema().names) == {"conv_id", "text"}
    assert both.count() == want.num_rows


def test_single_partition_lake(ray_session, tmp_path):
    """partitions=1: num_returns=1 hands one bare ref (Ray never unpacks a
    1-element list) — the map stage must return the bare shard."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydatax.driver import lake_table, run_job
    from raydatax.gen import gen_wal
    from raydatax.oracle import replay_to_table

    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    gen_wal(wal, 3000)
    rep = run_job(wal, lake, partitions=1)
    assert rep["action"] == "applied" and rep["partitions_written"] == 1
    segs = pa.concat_tables([pq.read_table(f)
                             for f in sorted(glob.glob(wal + "/*.parquet"))])
    want = replay_to_table(segs)
    got = lake_table(lake)
    assert got.num_rows == want.num_rows
    cols = sorted(got.column_names)
    gp = got.select(cols).to_pandas().astype(str)
    wp = want.select(cols).to_pandas().astype(str)
    assert sorted(map(tuple, gp.itertuples(index=False, name=None))) == \
           sorted(map(tuple, wp.itertuples(index=False, name=None)))


def test_stats_free_segment_does_not_poison_watermark(ray_session, tmp_path):
    """A WAL segment written WITHOUT parquet column statistics widens the
    plan range to the ±2^62 sentinel; the committed watermark must come
    from the applied events, or every later append is silently ignored."""
    import glob

    import pyarrow.parquet as pq

    from raydatax.driver import run_job
    from raydatax.gen import gen_events, gen_wal

    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    gen_wal(wal, 2000, seg_rows=1000)
    # rewrite one segment with stats disabled (an external producer)
    seg = sorted(glob.glob(wal + "/seg-*.parquet"))[0]
    pq.write_table(pq.read_table(seg), seg, compression="zstd",
                   write_statistics=False)
    rep1 = run_job(wal, lake, partitions=4)
    assert rep1["action"] == "applied"

    # a later append MUST still apply (the poisoned watermark would prune it)
    from raydatax.gen import write_wal

    late = gen_events(500, seed=99)
    import numpy as np
    import pyarrow as pa

    bump = pa.table({
        "seq": pa.array(np.asarray(late["seq"]) + 10_000_000),
        **{c: late[c] for c in late.column_names if c != "seq"},
    }).cast(late.schema)
    k = len(glob.glob(wal + "/seg-*.parquet"))
    pq.write_table(bump, f"{wal}/seg-{k:05d}.parquet", compression="zstd")
    rep2 = run_job(wal, lake, partitions=4)
    assert rep2["action"] == "applied" and rep2["events_replayed"] > 0
