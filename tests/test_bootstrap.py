"""CDC bootstrap: initial full load at a WAL position + incremental tail
(driver.bootstrap_lake — the DataX full-sync → otsstream incremental
pattern; MySQL 'consistent snapshot at binlog position')."""

import glob

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from raydatax.driver import bootstrap_lake, lake_table, run_job
from raydatax.gen import gen_wal
from raydatax.oracle import replay_to_table


def _key(t):
    return sorted(
        zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist(), t["text"].to_pylist())
    )


def test_bootstrap_snapshot_then_incremental_tail(tmp_path):
    """Consistent snapshot at WAL position S → full load through the
    engine → tail applies ONLY events with seq > S; final state equals a
    full replay of the whole log.  A snapshot WITHOUT a seq column
    (external source) bootstraps to the same state."""
    wal = str(tmp_path / "wal")
    gen_wal(wal, 20000)
    events = pa.concat_tables(
        [pq.read_table(p) for p in sorted(glob.glob(f"{wal}/*.parquet"))],
        promote_options="permissive",
    )
    max_seq = pc.max(events["seq"]).as_py()
    S = max_seq // 2
    snapshot = replay_to_table(events.filter(pc.less_equal(events["seq"], S)))
    snap_path = str(tmp_path / "snapshot.parquet")
    pq.write_table(snapshot, snap_path)

    lake = str(tmp_path / "lake")
    rep = bootstrap_lake(snap_path, lake, snapshot_seq=S, partitions=8)
    assert rep["events_exported"] == snapshot.num_rows
    assert rep["snapshot_seq"] == S

    rep2 = run_job(wal, lake, partitions=8)
    n_post = events.filter(pc.greater(events["seq"], S)).num_rows
    assert rep2["events_routed"] == n_post  # pre-snapshot events never move

    got = lake_table(lake)
    want = replay_to_table(events)
    assert got.num_rows == want.num_rows
    # seq fidelity: snapshot rows kept their true seqs, so the final rows
    # match the full replay seq-for-seq
    assert sorted(got["seq"].to_pylist()) == sorted(want["seq"].to_pylist())
    assert _key(got) == _key(want)

    # external snapshot without seq: same final row content
    lake2 = str(tmp_path / "lake2")
    pq.write_table(snapshot.drop_columns(["seq"]), str(tmp_path / "snap2.parquet"))
    bootstrap_lake(str(tmp_path / "snap2.parquet"), lake2, snapshot_seq=S, partitions=8)
    run_job(wal, lake2, partitions=8)
    assert _key(lake_table(lake2)) == _key(want)


def test_bootstrap_guards(tmp_path):
    import pytest

    wal = str(tmp_path / "wal")
    gen_wal(wal, 2000)
    snapshot = replay_to_table(
        pa.concat_tables(
            [pq.read_table(p) for p in sorted(glob.glob(f"{wal}/*.parquet"))],
            promote_options="permissive",
        )
    )
    snap = str(tmp_path / "snap.parquet")
    pq.write_table(snapshot, snap)
    lake = str(tmp_path / "lake")
    bootstrap_lake(snap, lake, snapshot_seq=10_000_000, partitions=4)
    with pytest.raises(RuntimeError):
        bootstrap_lake(snap, lake, snapshot_seq=10_000_000, partitions=4)
    # bootstrap WAL cleaned up by default
    import os

    assert not os.path.exists(os.path.join(lake, "_bootstrap_wal"))


def test_bootstrap_crash_resume(tmp_path):
    """A bootstrap killed mid-replay leaves the lake half-built with the
    _bootstrap_wal marker in place — re-running bootstrap_lake resumes
    (deterministic re-export + idempotent replay) and converges to the
    same state; a COMPLETED bootstrap still refuses a second run."""
    import os

    import pytest

    wal = str(tmp_path / "wal")
    gen_wal(wal, 8000)
    events = pa.concat_tables(
        [pq.read_table(p) for p in sorted(glob.glob(f"{wal}/*.parquet"))],
        promote_options="permissive",
    )
    S = pc.max(events["seq"]).as_py()
    snapshot = replay_to_table(events)
    snap = str(tmp_path / "snap.parquet")
    pq.write_table(snapshot, snap)

    lake = str(tmp_path / "lake")
    with pytest.raises(KeyboardInterrupt):  # the simulated SIGKILL
        bootstrap_lake(snap, lake, snapshot_seq=S, partitions=6,
                       _crash_after_committing=2)
    assert os.path.isdir(os.path.join(lake, "_bootstrap_wal"))  # marker kept

    rep = bootstrap_lake(snap, lake, snapshot_seq=S, partitions=6)
    assert rep["snapshot_seq"] == S
    assert not os.path.isdir(os.path.join(lake, "_bootstrap_wal"))
    assert _key(lake_table(lake)) == _key(snapshot)

    with pytest.raises(RuntimeError):  # completed lake: refuse
        bootstrap_lake(snap, lake, snapshot_seq=S, partitions=6)

    # keep_bootstrap_wal=True must NOT weaken the completed-lake guard
    # (the in-progress marker is a separate file, not the kept WAL dir)
    lake3 = str(tmp_path / "lake3")
    bootstrap_lake(snap, lake3, snapshot_seq=S, partitions=6,
                   keep_bootstrap_wal=True)
    assert os.path.isdir(os.path.join(lake3, "_bootstrap_wal"))
    with pytest.raises(RuntimeError):
        bootstrap_lake(snap, lake3, snapshot_seq=S, partitions=6)
