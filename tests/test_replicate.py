"""Incremental lake-to-lake replication (raydatax/replicate.py).

The replica must be byte-identical, converge incrementally (work ∝ the
records the destination lacks), mirror upstream compaction/vacuum, and be
promotable — a replica that continues the same WAL tail produces the same
bytes the primary would have."""

import glob
import hashlib
import os

import pytest

from raydatax.driver import changelog_table, compact_changelog, lake_table, run_job
from raydatax.gen import gen_wal
from raydatax.replicate import _history_records, replicate_lake


def _file_hashes(lake):
    out = {}
    for f in glob.glob(os.path.join(lake, "data", "part-*", "epoch-*.parquet")):
        with open(f, "rb") as fh:
            out[os.path.relpath(f, lake)] = hashlib.sha256(fh.read()).hexdigest()
    return out


def _append_delta(wal, tmp_path, n, seq0, conv0, tag):
    d = str(tmp_path / f"wal_{tag}")
    gen_wal(d, n, start_seq=seq0, conv_offset=conv0)
    n_seg = len(glob.glob(os.path.join(wal, "seg-*.parquet")))
    for i, p in enumerate(sorted(glob.glob(os.path.join(d, "seg-*.parquet")))):
        os.replace(p, os.path.join(wal, f"seg-{n_seg + i:05d}.parquet"))


@pytest.fixture()
def wal(tmp_path):
    d = str(tmp_path / "wal")
    gen_wal(d, 12000)
    return d


def test_replica_is_byte_identical_and_incremental(ray_session, wal, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    run_job(wal, src, partitions=4)

    rep = replicate_lake(src, dst)
    assert rep["files_copied"] > 0 and not rep["noop"]
    assert _file_hashes(dst) == _file_hashes(src)
    assert lake_table(dst).equals(lake_table(src))

    # converged replica: re-run moves nothing
    rep = replicate_lake(src, dst)
    assert rep["noop"] and rep["files_copied"] == 0

    # delta ingest upstream → the sync ships exactly the new records
    before = set(_history_records(src))
    _append_delta(wal, tmp_path, 2000, 20_000_000, 60_000, "d0")
    run_job(wal, src, partitions=4)
    new = {
        k: r for k, r in _history_records(src).items() if k not in before
    }
    rep = replicate_lake(src, dst)
    assert rep["records_synced"] == len(new)
    assert rep["files_copied"] == sum(
        os.path.exists(os.path.join(src, r["file"])) for r in new.values()
    )
    assert _file_hashes(dst) == _file_hashes(src)
    assert lake_table(dst).equals(lake_table(src))


def test_replica_mirrors_compaction_and_refuses_foreign_lakes(
    ray_session, wal, tmp_path
):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    run_job(wal, src, partitions=4, output="changelog")
    _append_delta(wal, tmp_path, 2000, 20_000_000, 60_000, "d0")
    run_job(wal, src, partitions=4)
    replicate_lake(src, dst)
    n_files_before = len(_file_hashes(dst))

    # upstream compaction collapses epochs; the sync prunes the replica
    compact_changelog(src)
    rep = replicate_lake(src, dst)
    assert rep["records_removed"] > 0 and rep["files_removed"] > 0
    assert len(_file_hashes(dst)) < n_files_before
    assert _file_hashes(dst) == _file_hashes(src)
    assert changelog_table(dst).equals(changelog_table(src))
    # the compaction horizon travels with the records
    from raydatax.manifest import changelog_files

    with pytest.raises(RuntimeError, match="compacted"):
        changelog_files(dst, at_epoch=0)

    # a replica of a DIFFERENT lake is refused (config mismatch)
    other = str(tmp_path / "other")
    wal2 = str(tmp_path / "wal2")
    gen_wal(wal2, 1000)
    run_job(wal2, other, partitions=8)
    with pytest.raises(RuntimeError, match="different lake config"):
        replicate_lake(other, dst)


def test_promoted_replica_continues_identically(ray_session, wal, tmp_path):
    """Failover: after promotion the replica tails the same WAL and lands
    on the same bytes the primary does — epoch numbering, watermarks and
    file contents all travel through the sync."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    run_job(wal, src, partitions=4)
    replicate_lake(src, dst)

    _append_delta(wal, tmp_path, 2000, 20_000_000, 60_000, "d0")
    run_job(wal, src, partitions=4)   # primary applies the delta
    run_job(wal, dst, partitions=4)   # promoted replica applies it itself
    assert _file_hashes(dst) == _file_hashes(src)
    assert lake_table(dst).equals(lake_table(src))
