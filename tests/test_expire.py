"""TTL / retention expiry (``driver.expire_rows``): tombstones for rows
older than a cutoff flow through the NORMAL ingest path — exactly-once,
no in-place file mutation — and converge on re-run."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from raydatax.driver import expire_rows, lake_table, run_job
from raydatax.gen import gen_events, write_wal
from raydatax.oracle import replay_to_table

SORT = [("conv_id", "ascending"), ("turn_idx", "ascending")]


def _setup(tmp_wal, tmp_lake, n=10_000, seed=51):
    ev = gen_events(n, seed=seed)
    write_wal(ev, tmp_wal, seg_rows=2500)
    run_job(tmp_wal, tmp_lake, partitions=8)
    return ev


def _median_ts_us(t: pa.Table) -> int:
    us = t["ts"].cast(pa.int64())
    return int(pc.approximate_median(us).as_py())


def test_expire_removes_old_rows_via_normal_ingest(tmp_wal, tmp_lake):
    ev = _setup(tmp_wal, tmp_lake)
    live = replay_to_table(ev)
    cutoff = _median_ts_us(live)

    rep = expire_rows(tmp_lake, tmp_wal, older_than=cutoff)
    n_old = live.filter(
        pc.less(live["ts"], pa.scalar(cutoff, pa.timestamp("us")))
    ).num_rows
    assert rep["expired_keys"] == n_old > 0
    assert rep["segments"] > 0

    apply_rep = run_job(tmp_wal, tmp_lake, partitions=8)
    assert apply_rep["action"] == "applied"
    assert apply_rep["deletes"] == n_old

    got = lake_table(tmp_lake).sort_by(SORT)
    want = live.filter(
        pc.greater_equal(live["ts"], pa.scalar(cutoff, pa.timestamp("us")))
    ).sort_by(SORT)
    assert got.num_rows == want.num_rows
    assert got["text"].equals(want["text"])
    assert got["conv_id"].equals(want["conv_id"])

    # convergent: a second sweep finds nothing left below the cutoff
    again = expire_rows(tmp_lake, tmp_wal, older_than=cutoff)
    assert again["expired_keys"] == 0 and again["segments"] == 0


def test_expire_dry_run_writes_nothing(tmp_wal, tmp_lake):
    ev = _setup(tmp_wal, tmp_lake, n=4000, seed=52)
    cutoff = _median_ts_us(replay_to_table(ev))
    before = sorted(glob.glob(os.path.join(tmp_wal, "seg-*.parquet")))
    rep = expire_rows(tmp_lake, tmp_wal, older_than=cutoff, dry_run=True)
    assert rep["expired_keys"] > 0 and rep["dry_run"]
    assert sorted(glob.glob(os.path.join(tmp_wal, "seg-*.parquet"))) == before


def test_expire_windowed_lake_requires_in_window_event_ts(tmp_wal, tmp_lake):
    """A ts-windowed lake refuses the default row-ts tombstones (they sit
    behind ts_hw and would silently never apply) and accepts a pinned
    event_ts at/past the frontier."""
    ev = gen_events(4000, seed=57)
    write_wal(ev, tmp_wal, seg_rows=1000)
    us = ev["ts"].cast(pa.int64())
    lo, hi = int(pc.min(us).as_py()), int(pc.max(us).as_py()) + 1
    run_job(tmp_wal, tmp_lake, partitions=4, start_ts=lo, end_ts=hi)

    live = lake_table(tmp_lake)
    cutoff = _median_ts_us(live)
    with pytest.raises(ValueError, match="ts-windowed"):
        expire_rows(tmp_lake, tmp_wal, older_than=cutoff)
    rep = expire_rows(tmp_lake, tmp_wal, older_than=cutoff, event_ts=hi)
    assert rep["expired_keys"] > 0


def test_expire_refuses_changelog_lake(tmp_wal, tmp_lake):
    write_wal(gen_events(2000, seed=53), tmp_wal, seg_rows=1000)
    run_job(tmp_wal, tmp_lake, partitions=4, output="changelog")
    with pytest.raises(RuntimeError, match="changelog"):
        expire_rows(tmp_lake, tmp_wal, older_than=0)


def test_expire_cli_apply(tmp_wal, tmp_lake, capsys):
    ev = _setup(tmp_wal, tmp_lake, n=6000, seed=54)
    live = replay_to_table(ev)
    cutoff = _median_ts_us(live)

    from raydatax.maintenance import main as maint_main

    rc = maint_main(["expire", tmp_lake, tmp_wal,
                     "--older-than", str(cutoff), "--apply"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["expired_keys"] > 0
    assert rep["applied"]["deletes"] == rep["expired_keys"]
    got = lake_table(tmp_lake)
    assert pc.min(got["ts"]).cast(pa.int64()).as_py() >= cutoff


def test_expire_into_fresh_wal_dir_still_applies(tmp_wal, tmp_lake, tmp_path):
    """Tombstones written to a DIFFERENT (empty) WAL dir must mint seqs past
    the lake's applied watermark — seqs from 0 would be silently skipped as
    stale by the replay filter."""
    ev = _setup(tmp_wal, tmp_lake, n=4000, seed=56)
    live = replay_to_table(ev)
    cutoff = _median_ts_us(live)

    fresh = str(tmp_path / "ttl_wal")
    rep = expire_rows(tmp_lake, fresh, older_than=cutoff)
    assert rep["expired_keys"] > 0
    assert rep["seq_range"][0] > int(pc.max(ev["seq"]).as_py())

    apply_rep = run_job(fresh, tmp_lake, partitions=8)
    assert apply_rep["action"] == "applied"
    assert apply_rep["deletes"] == rep["expired_keys"]
    got = lake_table(tmp_lake)
    assert pc.min(got["ts"]).cast(pa.int64()).as_py() >= cutoff


def test_expire_rerun_after_crash_never_clobbers_segments(tmp_wal, tmp_lake):
    """Crash window: some tombstone segments written, one applied, then the
    sweep re-runs.  New segment names must continue past the MAX existing
    index — a count-based name would os.replace an applied segment and
    destroy the WAL's only record of those deletes."""
    import pyarrow.parquet as pq

    ev = _setup(tmp_wal, tmp_lake, n=6000, seed=59)
    live = replay_to_table(ev)
    cutoff = _median_ts_us(live)

    rep = expire_rows(tmp_lake, tmp_wal, older_than=cutoff)
    assert rep["segments"] >= 2
    new_segs = sorted(glob.glob(os.path.join(tmp_wal, "seg-*.parquet")))[
        -rep["segments"]:]
    # simulate the crash: drop the MIDDLE tombstone segments, keep the
    # last → the surviving WAL has a gap below its max index
    for p in new_segs[:-1]:
        os.remove(p)
    survivor = new_segs[-1]
    before = open(survivor, "rb").read()
    run_job(tmp_wal, tmp_lake, partitions=8)  # applies the survivor

    rep2 = expire_rows(tmp_lake, tmp_wal, older_than=cutoff)
    assert rep2["expired_keys"] > 0  # the dropped segments' keys re-sweep
    assert open(survivor, "rb").read() == before, (
        "re-run overwrote an applied WAL segment"
    )
    run_job(tmp_wal, tmp_lake, partitions=8)
    got = lake_table(tmp_lake)
    assert pc.min(got["ts"]).cast(pa.int64()).as_py() >= cutoff
    # the full WAL replayed from scratch reproduces the same final state
    fresh = str(tmp_lake) + "_replay"
    run_job(tmp_wal, fresh, partitions=8)
    want = lake_table(fresh)
    SORT2 = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    assert got.sort_by(SORT2).equals(want.sort_by(SORT2))


def test_diff_rejects_reversed_epochs(tmp_wal, tmp_lake):
    ev = gen_events(3000, seed=60)
    cut = ev.num_rows // 2
    write_wal(ev.slice(0, cut), tmp_wal, seg_rows=1000)
    rep1 = run_job(tmp_wal, tmp_lake, partitions=4, time_travel_epochs=4)
    import glob as _g

    n0 = len(_g.glob(os.path.join(tmp_wal, "seg-*.parquet")))
    from raydatax.gen import write_wal as _ww

    tmp2 = tmp_wal + "_x"
    _ww(ev.slice(cut), tmp2, seg_rows=1000)
    for i, p in enumerate(sorted(_g.glob(os.path.join(tmp2, "seg-*.parquet")))):
        os.rename(p, os.path.join(tmp_wal, f"seg-{n0 + i:05d}.parquet"))
    rep2 = run_job(tmp_wal, tmp_lake, partitions=4)

    from raydatax.driver import lake_diff

    with pytest.raises(ValueError, match="reversed|swap"):
        lake_diff(tmp_lake, from_epoch=rep2["epoch"], to_epoch=rep1["epoch"])


def test_expire_cli_apply_refuses_windowed_lake(tmp_wal, tmp_lake, capsys):
    ev = gen_events(2000, seed=61)
    write_wal(ev, tmp_wal, seg_rows=1000)
    us = ev["ts"].cast(pa.int64())
    lo, hi = int(pc.min(us).as_py()), int(pc.max(us).as_py()) + 1
    run_job(tmp_wal, tmp_lake, partitions=4, start_ts=lo, end_ts=hi)

    from raydatax.maintenance import main as maint_main

    before = sorted(glob.glob(os.path.join(tmp_wal, "seg-*.parquet")))
    with pytest.raises(SystemExit, match="windowed"):
        maint_main(["expire", tmp_lake, tmp_wal,
                    "--older-than", str(hi), "--event-ts", str(hi),
                    "--apply"])
    # refused BEFORE mutating the WAL
    assert sorted(glob.glob(os.path.join(tmp_wal, "seg-*.parquet"))) == before


def test_tail_wal_stream_time_ttl(tmp_wal, tmp_lake):
    """Tail loop with retain_ts_span_us keeps only the trailing window of
    stream time — the sweep runs after each applied epoch, cutoff derived
    from footer stats (deterministic, no wall clock)."""
    from raydatax.driver import tail_wal

    ev = gen_events(8000, seed=58)
    write_wal(ev, tmp_wal, seg_rows=2000)
    live = replay_to_table(ev)
    us = live["ts"].cast(pa.int64())
    lo, hi = int(pc.min(us).as_py()), int(pc.max(us).as_py())
    span = (hi - lo) // 3
    n_keep = live.filter(
        pc.greater_equal(us, pa.scalar(hi - span, pa.int64()))
    ).num_rows
    assert 0 < n_keep < live.num_rows, "fixture must actually sweep"

    reports = tail_wal(tmp_wal, tmp_lake, partitions=8,
                       idle_polls_to_stop=1, poll_interval_s=0.01,
                       retain_ts_span_us=span)
    assert len(reports) == 1
    ttl = reports[0]["ttl"]
    assert ttl["expired_keys"] == live.num_rows - n_keep
    assert ttl["applied_deletes"] == ttl["expired_keys"]

    got = lake_table(tmp_lake)
    assert got.num_rows == n_keep
    assert pc.min(got["ts"]).cast(pa.int64()).as_py() >= hi - span

    # converged: another tail over the same WAL is a no-op
    assert tail_wal(tmp_wal, tmp_lake, partitions=8, idle_polls_to_stop=1,
                    poll_interval_s=0.01, retain_ts_span_us=span) == []


def test_expire_event_ts_pins_tombstone_time(tmp_wal, tmp_lake):
    """With event_ts, every tombstone carries the pinned event time (the
    windowed-lake contract); default carries the expired row's own ts."""
    ev = _setup(tmp_wal, tmp_lake, n=3000, seed=55)
    live = replay_to_table(ev)
    cutoff = _median_ts_us(live)
    pin = int(pc.max(live["ts"].cast(pa.int64())).as_py()) + 1_000_000

    before = len(glob.glob(os.path.join(tmp_wal, "seg-*.parquet")))
    rep = expire_rows(tmp_lake, tmp_wal, older_than=cutoff, event_ts=pin)
    assert rep["segments"] > 0
    new = sorted(glob.glob(os.path.join(tmp_wal, "seg-*.parquet")))[before:]
    import pyarrow.parquet as pq

    for p in new:
        t = pq.read_table(p)
        assert set(t["op"].to_pylist()) == {"D"}
        assert set(t["ts"].cast(pa.int64()).to_pylist()) == {pin}
