"""Full operational lifecycle, chained: ingest → view → tail → repartition
→ continue tailing → maintenance — each stage verified against the oracle
replay of everything applied so far."""

import os

import pyarrow.parquet as pq

from raydatax.driver import (
    changelog_table,
    compact_changelog,
    lake_table,
    run_job,
    tail_wal,
)
from raydatax.driver import repartition_lake
from raydatax.gen import gen_events, write_wal
from raydatax.oracle import replay_to_table
from raydatax.view import refresh_view, view_table


def _sorted(t):
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def test_image_lifecycle(tmp_wal, tmp_lake, tmp_path, ray_session):
    ev = gen_events(15_000, seed=61)
    third = ev.num_rows // 3

    # T1: bootstrap ingest + view build
    write_wal(ev.slice(0, third), tmp_wal, seg_rows=2000)
    run_job(tmp_wal, tmp_lake, partitions=8, salt=2)
    vdir = str(tmp_path / "view")
    refresh_view(tmp_lake, vdir)
    want1 = replay_to_table(ev.slice(0, third))
    got1 = _sorted(lake_table(tmp_lake)).select(want1.column_names)
    assert got1.equals(_sorted(want1))

    # T2: tail an appended tranche, view kept fresh in the loop
    pq.write_table(ev.slice(third, third), os.path.join(tmp_wal, "seg-00100.parquet"))
    reports = tail_wal(tmp_wal, tmp_lake, poll_interval_s=0.05,
                       idle_polls_to_stop=1, view_dir=vdir,
                       partitions=8, salt=2)
    assert any(r["action"] == "applied" for r in reports)

    # repartition mid-life; the view moves to the new lake via a fresh build
    new_lake = str(tmp_path / "lake_p5")
    repartition_lake(tmp_lake, new_lake, partitions=5, salt=2)
    assert _sorted(lake_table(new_lake)).equals(_sorted(lake_table(tmp_lake)))

    # T3: the tail continues on the NEW lake only
    pq.write_table(ev.slice(2 * third), os.path.join(tmp_wal, "seg-00200.parquet"))
    run_job(tmp_wal, new_lake, partitions=5, salt=2)
    vdir2 = str(tmp_path / "view2")
    refresh_view(new_lake, vdir2)

    want = replay_to_table(ev)
    got = _sorted(lake_table(new_lake)).select(want.column_names)
    assert got.equals(_sorted(want))
    # view equals a fresh aggregate of the final lake
    lk = lake_table(new_lake)
    g = lk.group_by(["conv_id"]).aggregate(
        [("turn_idx", "count"), ("seq", "max"), ("ts", "max")]
    ).select(["conv_id", "turn_idx_count", "seq_max", "ts_max"]).rename_columns(
        ["conv_id", "n_turns", "last_seq", "last_ts"]
    ).sort_by([("conv_id", "ascending")])
    assert view_table(vdir2).equals(g)


def test_changelog_lifecycle(tmp_wal, tmp_lake, tmp_path, ray_session):
    ev = gen_events(12_000, seed=62)
    third = ev.num_rows // 3

    write_wal(ev.slice(0, third), tmp_wal, seg_rows=1500)
    run_job(tmp_wal, tmp_lake, partitions=4, salt=2, output="changelog")
    vdir = str(tmp_path / "view")
    refresh_view(tmp_lake, vdir)

    # epoch 2 + compaction (past the fold point) + epoch 3
    pq.write_table(ev.slice(third, third), os.path.join(tmp_wal, "seg-00100.parquet"))
    run_job(tmp_wal, tmp_lake, partitions=4, salt=2, output="changelog")
    compact_changelog(tmp_lake)
    pq.write_table(ev.slice(2 * third), os.path.join(tmp_wal, "seg-00200.parquet"))
    run_job(tmp_wal, tmp_lake, partitions=4, salt=2, output="changelog")
    refresh_view(tmp_lake, vdir)  # rebuild (compaction) then fold epoch 3

    # full history preserved through compaction + folds
    log = changelog_table(tmp_lake)
    assert log.num_rows == ev.num_rows
    g = log.group_by(["conv_id"]).aggregate(
        [("turn_idx", "count"), ("seq", "max"), ("ts", "max")]
    ).select(["conv_id", "turn_idx_count", "seq_max", "ts_max"]).rename_columns(
        ["conv_id", "n_turns", "last_seq", "last_ts"]
    ).sort_by([("conv_id", "ascending")])
    assert view_table(vdir).equals(g)

    # repartition the full history, verify multiset
    new_lake = str(tmp_path / "clg_p8")
    repartition_lake(tmp_lake, new_lake, partitions=8, salt=2)
    old = changelog_table(tmp_lake).sort_by([("seq", "ascending")])
    new = changelog_table(new_lake).sort_by([("seq", "ascending")])
    assert new.select(old.column_names).equals(old)
