"""Retry util, job hooks, and the WAL event-log sink."""

import glob
import os

import pytest

from raydatax.driver import lake_table, run_job
from raydatax.gen import gen_events, write_wal
from raydatax.oracle import replay_to_table
from raydatax.sinks import write_wal_sink
from raydatax.util import retry


def test_retry_succeeds_after_failures():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        return "ok"

    assert retry(flaky, times=3, sleep_s=0.01) == "ok"
    assert calls["n"] == 3


def test_retry_exhausts():
    with pytest.raises(OSError):
        retry(lambda: (_ for _ in ()).throw(OSError("x")), times=2, sleep_s=0.01)


def test_job_hooks_and_pre_handler(tmp_wal, tmp_lake):
    write_wal(gen_events(3000, seed=51), tmp_wal, seg_rows=1000)
    seen = {}

    def pre(ctx):
        seen["pre"] = ctx["lake_dir"]

    def hook(report):
        seen["post"] = report["events_replayed"]

    def bad_hook(report):
        raise RuntimeError("hook boom")

    rep = run_job(tmp_wal, tmp_lake, partitions=4,
                  pre_handler=pre, post_hooks=[hook, bad_hook])
    assert seen["pre"] == tmp_lake
    assert seen["post"] == rep["events_replayed"] > 0
    assert rep["hook_errors"] and "boom" in rep["hook_errors"][0]


def test_wal_sink_roundtrip(tmp_path):
    """Produce a WAL with the sink, consume it with the engine — the
    pipeline-chaining contract."""
    import ray.data as rd

    ev = gen_events(6000, seed=52)
    ds = rd.from_arrow(ev)
    wal = str(tmp_path / "wal")
    paths = write_wal_sink(ds, wal, seg_rows=1500)
    assert len(paths) >= 4
    # appending continues numbering
    more = write_wal_sink(rd.from_arrow(gen_events(1000, seed=53, start_seq=10_000_000)), wal, seg_rows=1500)
    assert os.path.basename(more[0]) == f"seg-{len(paths):05d}.parquet"

    lake = str(tmp_path / "lake")
    run_job(wal, lake, partitions=4)
    got = lake_table(lake)
    import pyarrow as pa

    full = pa.concat_tables([ev, gen_events(1000, seed=53, start_seq=10_000_000)])
    want = replay_to_table(full)
    assert got.num_rows == want.num_rows


def test_vacuum_removes_superseded_epochs(tmp_wal, tmp_lake):
    """Each incremental epoch rewrites partition snapshots; superseded epoch
    files must be vacuumed automatically."""
    ev = gen_events(8000, seed=54)
    half = ev.num_rows // 2
    write_wal(ev.slice(0, half), tmp_wal, seg_rows=2000)
    run_job(tmp_wal, tmp_lake, partitions=4)
    import glob as g
    existing = len(g.glob(os.path.join(tmp_wal, "seg-*.parquet")))
    tmp2 = tmp_wal + "_x"
    write_wal(ev.slice(half), tmp2, seg_rows=2000)
    for i, p in enumerate(sorted(g.glob(os.path.join(tmp2, "seg-*.parquet")))):
        os.rename(p, os.path.join(tmp_wal, f"seg-{existing + i:05d}.parquet"))
    run_job(tmp_wal, tmp_lake, partitions=4)

    files = g.glob(os.path.join(tmp_lake, "data", "part-*", "epoch-*.parquet"))
    # only epoch-2 snapshots remain (epoch-1 vacuumed)
    assert files and all("epoch-000002" in f for f in files)
    want = replay_to_table(ev)
    got = lake_table(tmp_lake)
    assert got.num_rows == want.num_rows


def test_time_travel_snapshot_reads(tmp_wal, tmp_lake):
    """Each epoch's committed state stays readable within the retention
    window; beyond it, time travel raises with a vacuum hint."""
    import pyarrow as pa
    import pytest as _pytest

    from raydatax.driver import lake_table
    from raydatax.manifest import snapshot_manifests

    ev = gen_events(9000, seed=71)
    third = ev.num_rows // 3
    snapshots = {}
    epoch_of = []
    for i in range(3):
        part = ev.slice(0, third * (i + 1))
        import glob as g
        import shutil

        shutil.rmtree(tmp_wal, ignore_errors=True)
        write_wal(part, tmp_wal, seg_rows=1500)
        # retention is LAKE-LEVEL config: passed only at creation; later
        # applies (and any other ingest path) must honor it without the kwarg
        kw = {"time_travel_epochs": 2} if i == 0 else {}
        rep = run_job(tmp_wal, tmp_lake, partitions=2, **kw)
        epoch_of.append(rep["epoch"])
        snapshots[rep["epoch"]] = lake_table(tmp_lake)

    sort = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    for e in epoch_of[1:]:  # epochs inside the retention window
        got = lake_table(tmp_lake, at_epoch=e).sort_by(sort)
        want = snapshots[e].sort_by(sort)
        assert got.equals(want), e
    # current state == time travel to the last epoch
    assert lake_table(tmp_lake, at_epoch=epoch_of[-1]).num_rows == snapshots[epoch_of[-1]].num_rows

    # shrink the window to 0: older snapshots vacuumed, travel raises
    from raydatax.manifest import vacuum

    vacuum(tmp_lake, keep_unreferenced=0)
    with _pytest.raises(FileNotFoundError, match="vacuumed"):
        snapshot_manifests(tmp_lake, epoch_of[0])


def test_vacuum_keep_unreferenced_clamps(tmp_wal, tmp_lake):
    """keep_unreferenced larger than the unreferenced set must delete
    nothing (regression: negative slice stop deleted retained snapshots)."""
    from raydatax.manifest import vacuum

    write_wal(gen_events(2000, seed=59), tmp_wal, seg_rows=1000)
    run_job(tmp_wal, tmp_lake, partitions=2)
    import glob as g
    # fabricate 2 unreferenced epoch files in one partition dir
    pdir = sorted(g.glob(os.path.join(tmp_lake, "data", "part-*")))[0]
    for e in (90, 91):
        with open(os.path.join(pdir, f"epoch-{e:06d}.parquet"), "wb") as f:
            f.write(b"x")
    before = set(g.glob(os.path.join(pdir, "epoch-*.parquet")))
    removed = vacuum(tmp_lake, keep_unreferenced=3)  # 3 > 2 unreferenced
    assert removed == []
    assert set(g.glob(os.path.join(pdir, "epoch-*.parquet"))) == before
    # keep=1 drops only the oldest of the two
    removed = vacuum(tmp_lake, keep_unreferenced=1)
    assert [os.path.basename(p) for p in removed] == ["epoch-000090.parquet"]


def test_job_lock_blocks_concurrent_ingest(tmp_wal, tmp_lake):
    from raydatax.manifest import acquire_job_lock

    write_wal(gen_events(2000, seed=55), tmp_wal, seg_rows=1000)
    lock = acquire_job_lock(tmp_lake)
    try:
        with pytest.raises(RuntimeError, match="lock"):
            run_job(tmp_wal, tmp_lake, partitions=4)
    finally:
        lock.close()
    # after release, the job proceeds
    rep = run_job(tmp_wal, tmp_lake, partitions=4)
    assert rep["action"] == "applied"


def test_lake_config_wins_over_cli_args(tmp_wal, tmp_lake):
    """Partition mapping is lake-level state: a later run passing different
    P/salt must use the stored config (stable mapping under rebase)."""
    import json

    ev = gen_events(6000, seed=56)
    half = ev.num_rows // 2
    write_wal(ev.slice(0, half), tmp_wal, seg_rows=1500)
    run_job(tmp_wal, tmp_lake, partitions=4, salt=2)
    import glob as g
    existing = len(g.glob(os.path.join(tmp_wal, "seg-*.parquet")))
    tmp2 = tmp_wal + "_x"
    write_wal(ev.slice(half), tmp2, seg_rows=1500)
    for i, p in enumerate(sorted(g.glob(os.path.join(tmp2, "seg-*.parquet")))):
        os.rename(p, os.path.join(tmp_wal, f"seg-{existing + i:05d}.parquet"))
    run_job(tmp_wal, tmp_lake, partitions=64, salt=8)  # args must be ignored
    cfg = json.load(open(os.path.join(tmp_lake, "_lake.json")))
    assert cfg["partitions"] == 4 and cfg["salt"] == 2
    want = replay_to_table(ev)
    assert lake_table(tmp_lake).num_rows == want.num_rows


def test_commit_partition_idempotent_after_crash_between_rename_and_manifest(tmp_path):
    """Crash window: file renamed into data/ but manifest not yet written —
    a re-commit must succeed using the already-final file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydatax.manifest import commit_partition, load_manifests

    lake = str(tmp_path / "lake")
    staged = os.path.join(lake, "_staging", "epoch-000001", "part-00000.parquet")
    os.makedirs(os.path.dirname(staged))
    pq.write_table(pa.table({"a": [1, 2]}), staged)
    commit_partition(lake, 0, 1, staged, hw_seq=10, rows=2, counts={})
    # staged file is gone now (renamed); committing again simulates the
    # resume path after a crash in the window
    commit_partition(lake, 0, 1, staged, hw_seq=10, rows=2, counts={})
    m = load_manifests(lake)[0]
    assert m["hw_seq"] == 10 and m["rows"] == 2
    # RuntimeError, deliberately not OSError: util.retry must never
    # re-attempt an impossible commit
    with pytest.raises(RuntimeError):
        commit_partition(lake, 1, 1, "/nope/part-00001.parquet", 1, 1, {})


def test_corrupted_segment_fails_cleanly(tmp_wal, tmp_lake):
    """A truncated/corrupt WAL segment must raise a clear error, not hang or
    commit partial state."""
    write_wal(gen_events(3000, seed=57), tmp_wal, seg_rows=1000)
    seg = sorted(__import__("glob").glob(os.path.join(tmp_wal, "seg-*.parquet")))[1]
    data = open(seg, "rb").read()
    open(seg, "wb").write(data[: len(data) // 2])  # truncate mid-file
    with pytest.raises(Exception):
        run_job(tmp_wal, tmp_lake, partitions=4)
    assert not os.path.exists(os.path.join(tmp_lake, "_manifests", "_job.json")), (
        "job watermark must not advance on failure"
    )
