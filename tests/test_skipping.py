"""File-level bloom data-skipping index (raydatax.skipping)."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from raydatax.skipping import (
    build_bloom_index,
    index_lake_column,
    prune_files,
    read_files_eq,
    read_lake_eq,
)


def _write_clustered(tmp_path, groups):
    """One file per group: the clustered layout blooms are for."""
    files = []
    for i, (vals, users) in enumerate(groups):
        p = str(tmp_path / f"f{i}.parquet")
        pq.write_table(
            pa.table({"user": pa.array(users), "v": pa.array(vals, pa.int64())}),
            p,
        )
        files.append(p)
    return files


@pytest.fixture
def clustered(tmp_path):
    return _write_clustered(
        tmp_path,
        [
            ([1, 2, 3], ["alice", "alice", "bob"]),
            ([4, 5], ["carol", "carol"]),
            ([6, 7, 8], ["dave", "erin", "dave"]),
        ],
    )


def test_prune_skips_absent_value_keeps_present(ray_session, clustered, tmp_path):
    idx = str(tmp_path / "idx")
    stats = build_bloom_index(clustered, "user", idx)
    assert stats == {"files_indexed": 3, "files_built": 3, "files_reused": 0}

    kept, skipped = prune_files(clustered, "user", "carol", idx)
    assert kept == [clustered[1]]
    assert sorted(skipped) == sorted([clustered[0], clustered[2]])

    # a value in no file: everything skipped (modulo bloom FPs — at this
    # size the filters are far below the FP regime)
    kept, skipped = prune_files(clustered, "user", "nobody", idx)
    assert kept == []


def test_read_files_eq_exactness_and_projection(ray_session, clustered, tmp_path):
    idx = str(tmp_path / "idx")
    build_bloom_index(clustered, "user", idx)
    out = read_files_eq(clustered, "user", "dave", idx, columns=["v"]).take_all()
    assert sorted(r["v"] for r in out) == [6, 8]
    # every-file-skipped case returns a typed empty Dataset
    out = read_files_eq(clustered, "user", "nobody", idx, columns=["v"]).take_all()
    assert out == []


def test_unindexed_files_always_kept(ray_session, clustered, tmp_path):
    idx = str(tmp_path / "idx")
    build_bloom_index(clustered[:2], "user", idx)
    kept, skipped = prune_files(clustered, "user", "dave", idx)
    # f2 holds dave but is NOT covered -> kept; f0/f1 covered and pruned
    assert clustered[2] in kept and clustered[0] in skipped
    out = read_files_eq(clustered, "user", "dave", idx).take_all()
    assert sorted(r["v"] for r in out) == [6, 8]


def test_incremental_rebuild_scans_only_new_files(ray_session, clustered, tmp_path):
    idx = str(tmp_path / "idx")
    build_bloom_index(clustered[:2], "user", idx)
    stats = build_bloom_index(clustered, "user", idx)
    assert stats == {"files_indexed": 3, "files_built": 1, "files_reused": 2}
    kept, _ = prune_files(clustered, "user", "erin", idx)
    assert kept == [clustered[2]]


def test_version_mismatch_fails_loudly(ray_session, clustered, tmp_path):
    import json

    idx = str(tmp_path / "idx")
    build_bloom_index(clustered, "user", idx)
    meta = os.path.join(idx, "bloom-user.json")
    with open(meta) as f:
        m = json.load(f)
    m["version"] = "bloom-v0"
    with open(meta, "w") as f:
        json.dump(m, f)
    with pytest.raises(RuntimeError, match="rebuild"):
        prune_files(clustered, "user", "alice", idx)


def test_all_null_file_is_skipped(ray_session, tmp_path):
    p = str(tmp_path / "nulls.parquet")
    pq.write_table(
        pa.table({"user": pa.nulls(4, pa.string()),
                  "v": pa.array([1, 2, 3, 4], pa.int64())}), p
    )
    idx = str(tmp_path / "idx")
    build_bloom_index([p], "user", idx)
    kept, skipped = prune_files([p], "user", "alice", idx)
    assert kept == [] and skipped == [p]


def test_lake_point_read_via_bloom(ray_session, tmp_path):
    """End-to-end on a real CDC lake: index conv_id, point-read one
    conversation, equals the unpruned read."""
    from raydatax.driver import read_lake, run_job
    from raydatax.gen import gen_wal

    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    gen_wal(wal, 3000)
    run_job(wal, lake, partitions=8)
    stats = index_lake_column(lake, "conv_id")
    assert stats["files_built"] == stats["files_indexed"] > 0

    full = read_lake(lake).take_all()
    conv = full[0]["conv_id"]
    want = sorted(
        (r["conv_id"], r["turn_idx"]) for r in full if r["conv_id"] == conv
    )
    got = read_lake_eq(lake, "conv_id", conv).take_all()
    assert sorted((r["conv_id"], r["turn_idx"]) for r in got) == want

    # the hash-partitioned layout clusters each conv into ONE partition:
    # the bloom must skip most files
    from raydatax import manifest as mf

    files = mf.committed_files(lake)
    kept, skipped = prune_files(files, "conv_id", conv, os.path.join(lake, "_skip"))
    assert len(kept) < len(files)
