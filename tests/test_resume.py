"""Exactly-once kill/resume (FIXTURES F5): a job killed mid-commit, resumed,
must replay only uncommitted events and produce byte-identical partition
files vs an uninterrupted run."""

import glob
import os

import pytest

from raydatax.driver import lake_table, run_job
from raydatax.gen import gen_events, write_wal

SORT = [("conv_id", "ascending"), ("turn_idx", "ascending")]


def _files(lake):
    return sorted(
        glob.glob(os.path.join(lake, "data", "part-*", "epoch-*.parquet"))
    )


def _bytes(path):
    with open(path, "rb") as f:
        return f.read()


@pytest.mark.parametrize("crash_after", [0, 3])
def test_kill_resume_byte_identical(tmp_path, crash_after):
    wal = str(tmp_path / "wal")
    ev = gen_events(15_000, seed=11)
    write_wal(ev, wal, seg_rows=3000)

    # uninterrupted reference run
    lake_a = str(tmp_path / "lake_a")
    run_job(wal, lake_a, partitions=8)

    # interrupted run: crash after committing `crash_after` partitions
    lake_b = str(tmp_path / "lake_b")
    with pytest.raises(KeyboardInterrupt):
        run_job(wal, lake_b, partitions=8, _crash_after_committing=crash_after)
    committed = glob.glob(os.path.join(lake_b, "_manifests", "part-*.json"))
    assert len(committed) == crash_after
    staged = glob.glob(os.path.join(lake_b, "_staging", "*", "part-*.parquet"))
    assert staged, "staging files must survive the crash"

    # resume
    rep = run_job(wal, lake_b, partitions=8)
    assert rep["action"] == "applied"
    # committed partitions are skipped (their events are below the watermark)
    skips = [r for r in rep["per_partition"] if r["action"] == "skip"]
    assert len(skips) == crash_after
    # staging gone after full commit
    assert not glob.glob(os.path.join(lake_b, "_staging", "epoch-*"))

    fa, fb = _files(lake_a), _files(lake_b)
    assert [os.path.relpath(p, lake_a) for p in fa] == [
        os.path.relpath(p, lake_b) for p in fb
    ], "same epoch + partition file names after resume"
    for a, b in zip(fa, fb):
        assert _bytes(a) == _bytes(b), f"byte mismatch: {a} vs {b}"

    ta = lake_table(lake_a).sort_by(SORT)
    tb = lake_table(lake_b).sort_by(SORT)
    assert ta.equals(tb)


def test_resume_after_crash_before_any_commit(tmp_path):
    wal = str(tmp_path / "wal")
    write_wal(gen_events(6000, seed=12), wal, seg_rows=2000)
    lake_a = str(tmp_path / "a")
    run_job(wal, lake_a, partitions=4)

    lake_b = str(tmp_path / "b")
    with pytest.raises(KeyboardInterrupt):
        run_job(wal, lake_b, partitions=4, _crash_after_committing=0)
    rep = run_job(wal, lake_b, partitions=4)
    assert rep["partitions_written"] >= 1
    for a, b in zip(_files(lake_a), _files(lake_b)):
        assert _bytes(a) == _bytes(b)


def test_resume_replays_only_uncommitted(tmp_path):
    """The resumed run's replayed-event count equals the events of
    uncommitted partitions only."""
    wal = str(tmp_path / "wal")
    ev = gen_events(12_000, seed=13)
    write_wal(ev, wal, seg_rows=3000)
    lake = str(tmp_path / "lake")
    with pytest.raises(KeyboardInterrupt):
        run_job(wal, lake, partitions=8, _crash_after_committing=2)
    rep = run_job(wal, lake, partitions=8)
    assert rep["events_replayed"] < ev.num_rows
    routed_to_skipped = sum(
        r["events_in"] for r in rep["per_partition"] if r["action"] == "skip"
    )
    assert rep["events_replayed"] + routed_to_skipped == ev.num_rows
