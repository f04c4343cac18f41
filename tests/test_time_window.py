"""Time-bounded replay (otsstreamreader startTime/endTime parity,
RecordProcessor.java:186-239): each windowed run applies only events with
ts in [start_ts, end_ts), checkpoints ts_hw at the window boundary, resumes
byte-identically across a crash inside a window, and refuses to mix with
seq-tailed ingestion."""

import glob
import os

import numpy as np
import pyarrow as pa
import pytest

from raydatax.driver import lake_table, run_job
from raydatax.gen import BASE_TS_US, gen_events, write_wal
from raydatax.oracle import replay_to_table

SORT = [("conv_id", "ascending"), ("turn_idx", "ascending")]


def _monotone_wal(tmp_path, n=12_000, seed=21, seg_rows=3000):
    """WAL whose event time is monotone in seq (the realistic binlog
    property windowed replay documents): ts = BASE + seq seconds."""
    ev = gen_events(n, seed=seed)
    seq = ev["seq"].to_numpy()
    ts = pa.array(BASE_TS_US + seq * 1_000_000, type=pa.timestamp("us"))
    ev = ev.set_column(ev.schema.get_field_index("ts"), "ts", ts)
    wal = str(tmp_path / "wal")
    write_wal(ev, wal, seg_rows=seg_rows)
    return wal, ev


def _cut(ev: pa.Table, lo_us, hi_us) -> pa.Table:
    import pyarrow.compute as pc

    m = pc.and_(pc.greater_equal(ev["ts"], pa.scalar(lo_us, pa.timestamp("us"))),
                pc.less(ev["ts"], pa.scalar(hi_us, pa.timestamp("us"))))
    return ev.filter(m)


def test_two_windows_match_oracle(tmp_path):
    wal, ev = _monotone_wal(tmp_path)
    n = ev.num_rows
    t0 = BASE_TS_US
    t1 = BASE_TS_US + (n // 2) * 1_000_000
    t2 = BASE_TS_US + (n + 1) * 1_000_000
    lake = str(tmp_path / "lake")

    rep1 = run_job(wal, lake, partitions=4, start_ts=t0, end_ts=t1)
    assert rep1["action"] == "applied"
    got1 = lake_table(lake).sort_by(SORT)
    want1 = replay_to_table(_cut(ev, t0, t1)).sort_by(SORT)
    assert got1.select(want1.column_names).cast(want1.schema).equals(want1)

    rep2 = run_job(wal, lake, partitions=4, start_ts=t1, end_ts=t2)
    assert rep2["action"] == "applied"
    got2 = lake_table(lake).sort_by(SORT)
    want2 = replay_to_table(ev).sort_by(SORT)
    assert got2.select(want2.column_names).cast(want2.schema).equals(want2)

    # ISO-string bounds parse to the same window (idempotent re-run: no-op)
    rep3 = run_job(wal, lake, partitions=4,
                   start_ts=np.datetime64(t1, "us").astype("datetime64[us]").item().isoformat(),
                   end_ts=np.datetime64(t2, "us").astype("datetime64[us]").item().isoformat())
    assert rep3["partitions_written"] == 0


def test_window_prunes_segments_by_ts_footer(tmp_path):
    wal, ev = _monotone_wal(tmp_path, n=12_000, seg_rows=3000)
    lake = str(tmp_path / "lake")
    t0 = BASE_TS_US
    t1 = BASE_TS_US + 2_000 * 1_000_000  # first ~2k seconds ≈ first segment
    rep = run_job(wal, lake, partitions=4, start_ts=t0, end_ts=t1)
    assert rep["segments_pruned"] > 0
    # a window entirely past the WAL is a noop with everything pruned
    far = BASE_TS_US + 10**9 * 1_000_000
    rep2 = run_job(wal, lake, partitions=4, start_ts=far, end_ts=far + 1)
    assert rep2["action"] == "noop"


def test_mode_mixing_raises(tmp_path):
    wal, ev = _monotone_wal(tmp_path, n=4000)
    lake_w = str(tmp_path / "lw")
    run_job(wal, lake_w, partitions=2, start_ts=BASE_TS_US,
            end_ts=BASE_TS_US + 10**12)
    with pytest.raises(RuntimeError, match="mode"):
        run_job(wal, lake_w, partitions=2)
    lake_s = str(tmp_path / "ls")
    run_job(wal, lake_s, partitions=2)
    with pytest.raises(RuntimeError, match="mode"):
        run_job(wal, lake_s, partitions=2, start_ts=BASE_TS_US,
                end_ts=BASE_TS_US + 10**12)


def test_null_ts_deadletters_in_window_mode(tmp_path):
    wal, ev = _monotone_wal(tmp_path, n=4000)
    # null out the ts of one I row → dirty in windowed mode
    import pyarrow.compute as pc

    idx = pc.equal(ev["op"], "I").to_numpy(zero_copy_only=False).nonzero()[0][0]
    ts = ev["ts"].to_pylist()
    ts[idx] = None
    ev2 = ev.set_column(ev.schema.get_field_index("ts"), "ts",
                        pa.array(ts, pa.timestamp("us")))
    wal2 = str(tmp_path / "wal2")
    write_wal(ev2, wal2, seg_rows=2000)
    lake = str(tmp_path / "lake2")
    rep = run_job(wal2, lake, partitions=2, start_ts=BASE_TS_US,
                  end_ts=BASE_TS_US + 10**12)
    assert rep["dirty_records"] == 1


def test_windowed_split_equals_full_replay_any_cut(tmp_path):
    """Property: for ANY window cut point over a ts-monotone log, replaying
    [t0, cut) then [cut, end) equals the one-shot full replay."""
    wal, ev = _monotone_wal(tmp_path, n=3000, seed=31, seg_rows=800)
    n = ev.num_rows
    want = replay_to_table(ev).sort_by(SORT)
    for frac in (0.1, 0.37, 0.5, 0.93):
        cut = BASE_TS_US + int(n * frac) * 1_000_000
        end = BASE_TS_US + (n + 1) * 1_000_000
        lake = str(tmp_path / f"lake_{int(frac * 100)}")
        run_job(wal, lake, partitions=2, start_ts=BASE_TS_US, end_ts=cut)
        run_job(wal, lake, partitions=2, start_ts=cut, end_ts=end)
        got = lake_table(lake).sort_by(SORT)
        assert got.select(want.column_names).cast(want.schema).equals(want), frac


def test_window_crash_resume_byte_identical(tmp_path):
    wal, ev = _monotone_wal(tmp_path)
    n = ev.num_rows
    t0, t1 = BASE_TS_US, BASE_TS_US + (n // 2) * 1_000_000
    t2 = BASE_TS_US + (n + 1) * 1_000_000

    def files(lake):
        return sorted(glob.glob(os.path.join(lake, "data", "part-*", "epoch-*.parquet")))

    lake_a = str(tmp_path / "lake_a")  # uninterrupted reference
    run_job(wal, lake_a, partitions=4, start_ts=t0, end_ts=t1)
    run_job(wal, lake_a, partitions=4, start_ts=t1, end_ts=t2)

    lake_b = str(tmp_path / "lake_b")  # crash mid-commit inside window 2
    run_job(wal, lake_b, partitions=4, start_ts=t0, end_ts=t1)
    with pytest.raises(KeyboardInterrupt):
        run_job(wal, lake_b, partitions=4, start_ts=t1, end_ts=t2,
                _crash_after_committing=1)
    rep = run_job(wal, lake_b, partitions=4, start_ts=t1, end_ts=t2)
    assert rep["action"] == "applied"

    fa, fb = files(lake_a), files(lake_b)
    assert [os.path.relpath(p, lake_a) for p in fa] == [
        os.path.relpath(p, lake_b) for p in fb
    ]
    for a, b in zip(fa, fb):
        with open(a, "rb") as f1, open(b, "rb") as f2:
            assert f1.read() == f2.read(), f"byte mismatch {a} vs {b}"


def test_windowed_changelog_replay(ray_session, tmp_path):
    """Time-bounded replay composes with changelog output: two consecutive
    [start, end) windows append exactly the in-window events to the log."""
    import numpy as np

    from raydatax.driver import changelog_table, run_job
    from raydatax.gen import BASE_TS_US, gen_events, write_wal

    ev = gen_events(8000, seed=31)
    # seq-monotone event time (the documented windowed-replay property)
    seqs = ev["seq"].to_numpy()
    ts = pa.array(BASE_TS_US + seqs * 1_000_000, pa.timestamp("us"))
    ev = ev.set_column(ev.schema.get_field_index("ts"), "ts", ts)
    wal = str(tmp_path / "wal")
    write_wal(ev, wal, seg_rows=2000)

    cut = BASE_TS_US + int(seqs[len(seqs) // 2]) * 1_000_000
    lake = str(tmp_path / "lake")
    r1 = run_job(wal, lake, partitions=4, output="changelog",
                 start_ts=BASE_TS_US, end_ts=cut)
    r2 = run_job(wal, lake, partitions=4,
                 start_ts=cut, end_ts=BASE_TS_US + 10**12)
    t = changelog_table(lake)
    assert r1["events_replayed"] + r2["events_replayed"] == ev.num_rows
    assert t.num_rows == ev.num_rows
    assert sorted(t["seq"].to_pylist()) == sorted(seqs.tolist())


def test_tail_wal_windowed_goes_idle(ray_session, tmp_path):
    """A windowed tail must terminate: reruns re-map in-window segments and
    report 'applied' with zero replayed events — that counts as idle."""
    import glob
    import time as _time

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from raydatax.driver import tail_wal
    from raydatax.gen import gen_wal

    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    gen_wal(wal, 2000)
    ts = pq.read_table(sorted(glob.glob(wal + "/*.parquet"))[0])["ts"]
    to_us = lambda t: int(t.timestamp() * 1e6)
    t0 = _time.monotonic()
    reports = tail_wal(
        wal, lake, poll_interval_s=0.05, idle_polls_to_stop=2,
        partitions=4,
        start_ts=to_us(pc.min(ts).as_py()), end_ts=to_us(pc.max(ts).as_py()),
    )
    assert _time.monotonic() - t0 < 60  # terminates (no busy spin)
    assert len(reports) == 1 and reports[0]["events_replayed"] > 0
