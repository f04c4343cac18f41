"""Deterministic shuffle export (relational.shuffle_export): stable
pseudo-random order, hive shard layout, within-shard (h, key) order,
byte-identical re-export, and the SQL mix64 replica."""

import glob
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from raydatax.partition import hash_ints
from raydatax.relational import shuffle_export


def _ds(n=500):
    return rd.from_arrow(pa.table({
        "k": pa.array(range(n), pa.int64()),
        "v": pa.array([f"v{i}" for i in range(n)], pa.string()),
    }))


def test_summary_matches_numpy(ray_session):
    n = 500
    rows = shuffle_export(_ds(n), "k", shard_bits=3).take_all()
    h = hash_ints(np.arange(n, dtype=np.int64))
    shard = (h >> np.uint64(61)).astype(np.int64)
    for r in rows:
        m = shard == r["shard"]
        assert int(m.sum()) == r["n_rows"]
        assert str(int(h[m].min())) == r["min_h"]
        assert str(int(h[m].max())) == r["max_h"]
    assert sum(r["n_rows"] for r in rows) == n


def test_export_layout_and_order(ray_session, tmp_path):
    out = str(tmp_path / "shards")
    shuffle_export(_ds(400), "k", out_dir=out, shard_bits=2).take_all()
    dirs = sorted(glob.glob(out + "/shard=*"))
    assert len(dirs) == 4
    h_all = hash_ints(np.arange(400, dtype=np.int64))
    total = 0
    for d in dirs:
        t = pq.read_table(d)
        ks = np.concatenate([t["k"].to_numpy()]) if t.num_rows else np.array([], np.int64)
        hs = h_all[ks]
        # within-shard rows come back in (h, key) order
        assert list(hs) == sorted(hs)
        total += t.num_rows
    assert total == 400


def test_reexport_identical(ray_session, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    shuffle_export(_ds(300), "k", out_dir=a, shard_bits=2).take_all()
    shuffle_export(_ds(300), "k", out_dir=b, shard_bits=2).take_all()
    fa = sorted(glob.glob(a + "/**/*.parquet", recursive=True))
    fb = sorted(glob.glob(b + "/**/*.parquet", recursive=True))
    ka = [pq.read_table(f)["k"].to_pylist() for f in fa]
    kb = [pq.read_table(f)["k"].to_pylist() for f in fb]
    assert ka == kb


def test_sql_mix64_replica_bit_exact():
    import duckdb

    ks = np.array([0, 1, 2, 7, 123456789, 2**62, 2**63 - 2], dtype=np.int64)
    want = {int(k): str(int(h)) for k, h in zip(ks, hash_ints(ks))}
    got = duckdb.sql("""
        WITH src AS (SELECT unnest([0, 1, 2, 7, 123456789,
                                    4611686018427387904, 9223372036854775806]) AS k),
        u0 AS (SELECT k, CAST(k AS HUGEINT) AS u FROM src),
        x1 AS (SELECT k, CAST(xor(CAST(u AS BIGINT), CAST(u // 8589934592 AS BIGINT)) AS HUGEINT) AS x FROM u0),
        x1u AS (SELECT k, CASE WHEN x < 0 THEN x + 18446744073709551616 ELSE x END AS x FROM x1),
        m AS (SELECT k, ((x % 4294967296) * 3981806797
                    + (((x % 4294967296) * 4283543511
                        + (x // 4294967296) * 3981806797) % 4294967296)
                      * 4294967296) % 18446744073709551616 AS v FROM x1u),
        ms AS (SELECT k, CASE WHEN v >= 9223372036854775808
                              THEN v - 18446744073709551616 ELSE v END AS s,
                      v // 8589934592 AS hi FROM m),
        h2 AS (SELECT k, CAST(xor(CAST(s AS BIGINT),
                               CAST(CASE WHEN hi >= 9223372036854775808
                                         THEN hi - 18446744073709551616
                                         ELSE hi END AS BIGINT)) AS HUGEINT) AS x
               FROM ms)
        SELECT k, CAST(CASE WHEN x < 0 THEN x + 18446744073709551616 ELSE x END AS VARCHAR)
        FROM h2
    """).fetchall()
    assert {int(k): h for k, h in got} == want


def test_shard_bits_guard(ray_session):
    import pytest

    with pytest.raises(ValueError):
        shuffle_export(_ds(10), "k", shard_bits=0)


# ------------------------------------------------ train/val split


def test_train_val_split_entity_atomic(ray_session):
    from raydatax.relational import train_val_split

    n = 600
    t = pa.table({
        "row": pa.array(range(n), pa.int64()),
        "user": pa.array([i % 37 for i in range(n)], pa.int64()),
    })
    out = train_val_split(rd.from_arrow(t), "user", val_permille=300).take_all()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user"], set()).add(r["split"])
    # every entity lands wholly in one split
    assert all(len(s) == 1 for s in by_user.values())
    # assignment matches the pure formula
    users = np.array(sorted(by_user), dtype=np.int64)
    want = np.where(hash_ints(users) % np.uint64(1000) < 300, "val", "train")
    assert [by_user[int(u)].pop() for u in users] == list(want)


def test_train_val_split_guard(ray_session):
    import pytest

    from raydatax.relational import train_val_split

    with pytest.raises(ValueError):
        train_val_split(_ds(5), "k", val_permille=1001)


# ----------------------------------------- exact-N grouped sampling


def test_grouped_exact_sample_quota_and_pick(ray_session):
    from raydatax.relational import grouped_exact_sample

    n = 400
    t = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "g": pa.array(["a" if i % 4 else "b" for i in range(n)], pa.string()),
    })
    out = grouped_exact_sample(rd.from_arrow(t), "g", "k", n=30).take_all()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r["k"])
    assert sorted(len(v) for v in by_g.values()) == [30, 30]
    # the picked rows are the 30 smallest hashes per group
    h = hash_ints(np.arange(n, dtype=np.int64))
    for g, ks in by_g.items():
        members = [k for k in range(n) if ("a" if k % 4 else "b") == g]
        want = sorted(members, key=lambda k: h[k])[:30]
        assert sorted(ks) == sorted(want)


def test_grouped_exact_sample_small_group_kept_whole(ray_session):
    from raydatax.relational import grouped_exact_sample

    t = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "g": pa.array(["x", "x", "y"], pa.string())})
    out = grouped_exact_sample(rd.from_arrow(t), "g", "k", n=10).take_all()
    assert len(out) == 3  # quota above group size keeps everything
