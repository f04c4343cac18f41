"""Offline lake re-partitioning (driver.repartition_lake)."""

import os

import pyarrow.parquet as pq
import pytest

from raydatax.driver import (
    changelog_table,
    lake_table,
    load_job_watermark,
    repartition_lake,
    run_job,
)
from raydatax.gen import gen_events, write_wal
from raydatax.oracle import replay_to_table


def _sorted(t):
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


@pytest.mark.parametrize("new_p", [4, 16])
def test_repartition_image_preserves_state_and_watermark(
    tmp_wal, tmp_lake, tmp_path, ray_session, new_p
):
    ev = gen_events(12_000, seed=71)
    half = ev.num_rows // 2
    write_wal(ev.slice(0, half), tmp_wal, seg_rows=2000)
    run_job(tmp_wal, tmp_lake, partitions=8, salt=2)

    new_lake = str(tmp_path / f"lake_p{new_p}")
    rep = repartition_lake(tmp_lake, new_lake, partitions=new_p, salt=2)
    assert rep["events_exported"] == lake_table(tmp_lake).num_rows
    assert _sorted(lake_table(new_lake)).equals(_sorted(lake_table(tmp_lake)))
    assert load_job_watermark(new_lake) == load_job_watermark(tmp_lake)
    assert not os.path.exists(os.path.join(new_lake, "_bootstrap_wal"))

    # the tail continues on the NEW lake: apply the second half there and
    # demand exact oracle equality over the full log
    pq.write_table(ev.slice(half), os.path.join(tmp_wal, "seg-99999.parquet"))
    rep2 = run_job(tmp_wal, new_lake, partitions=new_p, salt=2)
    assert rep2["action"] == "applied"
    want = replay_to_table(ev)
    got = _sorted(lake_table(new_lake)).select(want.column_names)
    assert got.equals(_sorted(want))


def test_repartition_changelog_preserves_history(
    tmp_wal, tmp_lake, tmp_path, ray_session
):
    ev = gen_events(8_000, seed=72)
    write_wal(ev, tmp_wal, seg_rows=2000)
    run_job(tmp_wal, tmp_lake, partitions=8, salt=2, output="changelog")

    new_lake = str(tmp_path / "clg_p4")
    repartition_lake(tmp_lake, new_lake, partitions=4, salt=2)
    old = changelog_table(tmp_lake).sort_by([("seq", "ascending")])
    new = changelog_table(new_lake).sort_by([("seq", "ascending")])
    assert new.select(old.column_names).equals(old)


def test_repartition_guards(tmp_wal, tmp_lake, tmp_path, ray_session):
    ev = gen_events(3_000, seed=73)
    write_wal(ev, tmp_wal, seg_rows=1000)
    run_job(tmp_wal, tmp_lake, partitions=4, salt=2)
    new_lake = str(tmp_path / "out")
    repartition_lake(tmp_lake, new_lake, partitions=2, salt=2)
    with pytest.raises(RuntimeError):
        repartition_lake(tmp_lake, new_lake, partitions=2, salt=2)
    with pytest.raises(FileNotFoundError):
        repartition_lake(str(tmp_path / "nope"), str(tmp_path / "x"), partitions=2)


def test_repartition_preserves_evolved_columns(ray_session, tmp_path):
    """A lake whose WAL evolved an extra column must keep it through the
    repartition migration (the only path for a hash-version change)."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydatax.driver import lake_table, repartition_lake, run_job
    from raydatax.gen import gen_wal

    wal, lake, lake2 = (str(tmp_path / d) for d in ("wal", "lake", "lake2"))
    gen_wal(wal, 2000, seg_rows=1000)
    # evolve: the last segment gains an extra column
    seg = sorted(glob.glob(wal + "/seg-*.parquet"))[-1]
    t = pq.read_table(seg)
    t = t.append_column("channel", pa.array(["web"] * t.num_rows, pa.string()))
    pq.write_table(t, seg, compression="zstd")
    run_job(wal, lake, partitions=4)
    before = lake_table(lake)
    assert "channel" in before.column_names
    n_channel = before.filter(
        __import__("pyarrow").compute.is_valid(before["channel"])).num_rows
    assert n_channel > 0

    repartition_lake(lake, lake2, partitions=2)
    after = lake_table(lake2)
    assert "channel" in after.column_names
    n2 = after.filter(
        __import__("pyarrow").compute.is_valid(after["channel"])).num_rows
    assert n2 == n_channel  # evolved data survives the migration
