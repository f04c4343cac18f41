"""Incremental materialized views over the lake (raydatax.view)."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from raydatax.driver import lake_table, run_job
from raydatax.gen import gen_events, write_wal
from raydatax.view import DEFAULT_AGGS, read_view, refresh_view, view_table


def _expected(lake):
    g = lake.group_by(["conv_id"]).aggregate(
        [("turn_idx", "count"), ("seq", "max"), ("ts", "max")]
    )
    return g.select(
        ["conv_id", "turn_idx_count", "seq_max", "ts_max"]
    ).rename_columns(["conv_id", "n_turns", "last_seq", "last_ts"]).sort_by(
        [("conv_id", "ascending")]
    )


def test_refresh_matches_full_recompute(tmp_wal, tmp_lake, tmp_path, ray_session):
    ev = gen_events(12_000, seed=91)
    write_wal(ev, tmp_wal, seg_rows=4000)
    run_job(tmp_wal, tmp_lake, partitions=8, salt=4)
    vdir = str(tmp_path / "view")

    rep = refresh_view(tmp_lake, vdir)
    assert rep["refreshed"] == 8 and rep["skipped"] == 0
    got = view_table(vdir)
    want = _expected(lake_table(tmp_lake))
    assert got.equals(want)
    # Dataset read path agrees
    ds = read_view(vdir).to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert ds["n_turns"].tolist() == want["n_turns"].to_pylist()


def test_refresh_is_incremental_and_idempotent(tmp_wal, tmp_lake, tmp_path, ray_session):
    ev = gen_events(12_000, seed=92)
    write_wal(ev, tmp_wal, seg_rows=4000)
    run_job(tmp_wal, tmp_lake, partitions=8, salt=4)
    vdir = str(tmp_path / "view")
    refresh_view(tmp_lake, vdir)

    # no lake change -> no work
    rep = refresh_view(tmp_lake, vdir)
    assert rep["refreshed"] == 0 and rep["skipped"] == 8

    # a small delta touching ~2 conversations -> only their partitions redo
    delta = gen_events(60, seed=93, n_convs=2, conv_offset=50_000_000,
                       start_seq=int(ev["seq"][-1].as_py()) + 1, insert_only=True)
    import pyarrow.parquet as pq
    pq.write_table(delta, os.path.join(tmp_wal, "seg-99999.parquet"))
    run_job(tmp_wal, tmp_lake, partitions=8, salt=4)

    before = {p: os.path.getmtime(os.path.join(vdir, "data", p))
              for p in os.listdir(os.path.join(vdir, "data"))}
    rep2 = refresh_view(tmp_lake, vdir)
    assert 1 <= rep2["refreshed"] <= 2
    assert rep2["skipped"] == 8 - rep2["refreshed"]
    after = {p: os.path.getmtime(os.path.join(vdir, "data", p))
             for p in os.listdir(os.path.join(vdir, "data"))}
    unchanged = [p for p in before if before[p] == after[p]]
    assert len(unchanged) == rep2["skipped"]
    assert view_table(vdir).equals(_expected(lake_table(tmp_lake)))


def test_refresh_repairs_missing_file_and_state(tmp_wal, tmp_lake, tmp_path, ray_session):
    ev = gen_events(6_000, seed=94)
    write_wal(ev, tmp_wal, seg_rows=3000)
    run_job(tmp_wal, tmp_lake, partitions=4, salt=2)
    vdir = str(tmp_path / "view")
    refresh_view(tmp_lake, vdir)
    want = view_table(vdir)

    # crash simulations: lost summary file / lost state json
    os.remove(os.path.join(vdir, "data", "part-00000.parquet"))
    os.remove(os.path.join(vdir, "_state", "part-00002.json"))
    rep = refresh_view(tmp_lake, vdir)
    assert rep["refreshed"] == 2
    assert view_table(vdir).equals(want)


def test_hot_key_summaries_merge_across_salted_partitions(
    tmp_wal, tmp_lake, tmp_path, ray_session
):
    ev = gen_events(20_000, seed=95, skew_hot_convs=1, skew_hot_frac=0.35)
    write_wal(ev, tmp_wal, seg_rows=5000)
    run_job(tmp_wal, tmp_lake, partitions=8, salt=4)
    vdir = str(tmp_path / "view")
    refresh_view(tmp_lake, vdir)

    raw = view_table(vdir, merged=False)
    hot = raw.filter(pc.equal(raw["conv_id"], "conv-00000000"))
    assert hot.num_rows > 1  # the hot conv really is split across partitions
    merged = view_table(vdir)
    assert merged.filter(
        pc.equal(merged["conv_id"], "conv-00000000")
    ).num_rows == 1
    assert merged.equals(_expected(lake_table(tmp_lake)))


def test_view_guards(tmp_wal, tmp_lake, tmp_path, ray_session):
    ev = gen_events(3_000, seed=96)
    write_wal(ev, tmp_wal, seg_rows=2000)
    run_job(tmp_wal, tmp_lake, partitions=4, salt=2)
    vdir = str(tmp_path / "view")
    with pytest.raises(ValueError):
        refresh_view(tmp_lake, vdir, aggs=[("text", "mean", "m")])
    refresh_view(tmp_lake, vdir)
    with pytest.raises(RuntimeError):
        refresh_view(tmp_lake, vdir, aggs=[("seq", "max", "only_seq")])


_expected_stream = _expected  # same aggregate, over the event stream


def test_changelog_view_delta_fold(tmp_wal, tmp_lake, tmp_path, ray_session):
    from raydatax.driver import changelog_table

    ev = gen_events(9_000, seed=97)
    third = ev.num_rows // 3
    write_wal(ev.slice(0, 2 * third), tmp_wal, seg_rows=3000)
    run_job(tmp_wal, tmp_lake, partitions=4, salt=2, output="changelog")
    vdir = str(tmp_path / "view")
    rep = refresh_view(tmp_lake, vdir)
    assert rep["refreshed"] == 4

    # fold is a noop with no new epochs
    rep = refresh_view(tmp_lake, vdir)
    assert rep["refreshed"] == 0 and rep["skipped"] == 4

    # append the rest -> every touched partition folds ONLY the delta
    import pyarrow.parquet as pq
    pq.write_table(ev.slice(2 * third), os.path.join(tmp_wal, "seg-99999.parquet"))
    run_job(tmp_wal, tmp_lake, partitions=4, salt=2, output="changelog")
    rep2 = refresh_view(tmp_lake, vdir)
    assert rep2["refreshed"] >= 1
    assert view_table(vdir).equals(_expected_stream(changelog_table(tmp_lake)))


def test_changelog_view_rebuilds_after_compaction_past_fold(
    tmp_wal, tmp_lake, tmp_path, ray_session
):
    from raydatax.driver import changelog_table, compact_changelog

    ev = gen_events(9_000, seed=98)
    half = ev.num_rows // 2
    write_wal(ev.slice(0, half), tmp_wal, seg_rows=1500)
    run_job(tmp_wal, tmp_lake, partitions=4, salt=2, output="changelog")
    vdir = str(tmp_path / "view")
    refresh_view(tmp_lake, vdir)

    import pyarrow.parquet as pq
    pq.write_table(ev.slice(half), os.path.join(tmp_wal, "seg-99999.parquet"))
    run_job(tmp_wal, tmp_lake, partitions=4, salt=2, output="changelog")
    compact_changelog(tmp_lake)  # horizon moves past the view's fold point

    rep = refresh_view(tmp_lake, vdir)
    assert rep["refreshed"] == 4  # every partition rebuilt, no double count
    assert view_table(vdir).equals(_expected_stream(changelog_table(tmp_lake)))

    # orphan collection: a stray data file not referenced by state
    stray = os.path.join(vdir, "data", "part-00000-fold-999999.parquet")
    open(stray, "wb").close()
    rep2 = refresh_view(tmp_lake, vdir)
    assert rep2["orphans_collected"] == 1 and not os.path.exists(stray)


def test_changelog_view_crash_repair(tmp_wal, tmp_lake, tmp_path, ray_session):
    from raydatax.driver import changelog_table

    ev = gen_events(5_000, seed=99)
    write_wal(ev, tmp_wal, seg_rows=2500)
    run_job(tmp_wal, tmp_lake, partitions=4, salt=2, output="changelog")
    vdir = str(tmp_path / "view")
    refresh_view(tmp_lake, vdir)
    want = view_table(vdir)

    # lost state json -> that partition rebuilds from the full live log
    os.remove(os.path.join(vdir, "_state", "part-00001.json"))
    rep = refresh_view(tmp_lake, vdir)
    assert rep["refreshed"] == 1
    assert view_table(vdir).equals(want)


def test_tail_wal_keeps_view_fresh(tmp_wal, tmp_lake, tmp_path, ray_session):
    """Streaming IVM: each applied epoch refreshes the view incrementally."""
    from raydatax.driver import tail_wal

    ev = gen_events(9000, seed=89)
    third = ev.num_rows // 3
    write_wal(ev.slice(0, third), tmp_wal, seg_rows=1500)
    vdir = str(tmp_path / "view")
    reports = tail_wal(tmp_wal, tmp_lake, poll_interval_s=0.05,
                       idle_polls_to_stop=1, view_dir=vdir,
                       partitions=4, salt=2)
    assert reports and all("view" in r for r in reports)
    import pyarrow.parquet as pq
    pq.write_table(ev.slice(third), os.path.join(tmp_wal, "seg-99999.parquet"))
    reports += tail_wal(tmp_wal, tmp_lake, poll_interval_s=0.05,
                        idle_polls_to_stop=1, view_dir=vdir,
                        partitions=4, salt=2)
    assert view_table(vdir).equals(_expected(lake_table(tmp_lake)))


def test_sigkill_mid_view_refresh_then_repair(tmp_wal, tmp_lake, tmp_path, ray_session):
    """Real kill -9 during a view refresh (its own process + Ray session):
    the survivor state — staged files, renamed finals, flipped state jsons,
    uncollected orphans, in any combination — must repair to exactly the
    clean-build result on the next refresh."""
    import signal
    import subprocess
    import sys
    import time as _time

    from raydatax.gen import gen_events as _ge

    ev = _ge(30_000, seed=88)
    write_wal(ev, tmp_wal, seg_rows=3000)
    run_job(tmp_wal, tmp_lake, partitions=8, salt=2)

    clean = str(tmp_path / "clean_view")
    refresh_view(tmp_lake, clean)
    want = view_table(clean)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    vdir = str(tmp_path / "killed_view")
    child = (
        "import sys; sys.path.insert(0, {repo!r});"
        "import ray; ray.init(address='local', num_cpus=2, include_dashboard=False, logging_level='ERROR');"
        "from raydatax.view import refresh_view;"
        "refresh_view({lake!r}, {vdir!r})"
    ).format(repo=repo, lake=tmp_lake, vdir=vdir)
    proc = subprocess.Popen([sys.executable, "-c", child],
                            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                            start_new_session=True)
    deadline = _time.time() + 120
    try:
        while _time.time() < deadline:
            import glob as _g
            produced = (_g.glob(os.path.join(vdir, "_staging", "*.parquet"))
                        + _g.glob(os.path.join(vdir, "data", "*.parquet")))
            if produced:
                os.killpg(proc.pid, signal.SIGKILL)
                break
            if proc.poll() is not None:
                break
            _time.sleep(0.02)
    finally:
        if proc.poll() is None:
            os.killpg(proc.pid, signal.SIGKILL)
        proc.wait()

    rep = refresh_view(tmp_lake, vdir)  # repair + finish
    assert rep["refreshed"] + rep["skipped"] == 8
    assert view_table(vdir).equals(want)
