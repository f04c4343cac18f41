"""Round-5 directive pins: skew-aware large-large join (sampled hot-key
detection -> left-side salting + right-side replication), differential
against DuckDB with a planted >=30%-hot key."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raydatax.relational import (
    approx_hot_join_keys,
    hash_join,
    skew_join,
)


def _skewed_sides(n=40000, keys=500, hot_frac=0.35, seed=7):
    """Fact side with one key holding ``hot_frac`` of the rows, dimension
    side with one row per key (plus some keys missing, for outer joins)."""
    rng = np.random.default_rng(seed)
    k = rng.integers(0, keys, n).astype(np.int64)
    k[rng.random(n) < hot_frac] = 7
    left = pa.table({
        "k": k,
        "v": rng.integers(0, 1000, n).astype(np.int64),
    })
    rk = np.arange(keys, dtype=np.int64)
    rk = rk[rk % 5 != 3]  # ~20% of keys absent on the right
    right = pa.table({"k": rk, "w": rk * 10})
    return left, right


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return (
        df[cols]
        .fillna(-1)
        .astype("int64")
        .sort_values(cols)
        .reset_index(drop=True)
    )


def test_hot_key_detection_finds_planted_key():
    left, _ = _skewed_sides()
    hot = approx_hot_join_keys(
        rd.from_arrow(left).repartition(16), "k", hot_share=0.05
    )
    assert 7 in hot["k"].to_pylist()
    # bounded: nothing below the share floor sneaks in
    assert hot.num_rows <= int(1 / 0.05)


def test_skew_join_inner_matches_duckdb():
    left, right = _skewed_sides()
    got = skew_join(
        rd.from_arrow(left).repartition(16),
        rd.from_arrow(right).repartition(4),
        "k", join_type="inner", salts=8, hot_share=0.05,
    ).to_pandas()
    exp = duckdb.sql(
        'SELECT l.k, l.v, r.w FROM "left" l JOIN "right" r USING (k)'
    ).df()
    assert _sorted(got).equals(_sorted(exp))
    # the planted key's rows survived intact (no salt-replica dup/loss)
    n_hot = int((left["k"].to_numpy() == 7).sum())
    assert int((got["k"] == 7).sum()) == n_hot


def test_skew_join_left_outer_matches_duckdb():
    left, right = _skewed_sides()
    got = skew_join(
        rd.from_arrow(left).repartition(16),
        rd.from_arrow(right).repartition(4),
        "k", join_type="left_outer", salts=4, hot_share=0.05,
    ).to_pandas()
    exp = duckdb.sql(
        'SELECT l.k, l.v, r.w FROM "left" l LEFT JOIN "right" r USING (k)'
    ).df()
    assert _sorted(got).equals(_sorted(exp))


def test_skew_join_equals_plain_hash_join():
    left, right = _skewed_sides(n=20000)
    lds = rd.from_arrow(left).repartition(8)
    rds = rd.from_arrow(right).repartition(2)
    a = skew_join(lds, rds, "k", salts=8, hot_share=0.05).to_pandas()
    b = hash_join(lds, rds, "k", join_type="inner").to_pandas()
    assert _sorted(a).equals(_sorted(b))


def test_skew_join_precomputed_hot_keys_and_no_hot_fallback():
    left, right = _skewed_sides(n=20000)
    lds = rd.from_arrow(left).repartition(8)
    rds = rd.from_arrow(right).repartition(2)
    pre = skew_join(
        lds, rds, "k", salts=4,
        hot_keys=pa.table({"k": pa.array([7], pa.int64())}),
    ).to_pandas()
    exp = duckdb.sql(
        'SELECT l.k, l.v, r.w FROM "left" l JOIN "right" r USING (k)'
    ).df()
    assert _sorted(pre).equals(_sorted(exp))
    # empty hot set -> plain hash_join path, same answer
    none = skew_join(
        lds, rds, "k",
        hot_keys=pa.table({"k": pa.array([], pa.int64())}),
    ).to_pandas()
    assert _sorted(none).equals(_sorted(exp))


def test_skew_join_composite_string_int_key():
    rng = np.random.default_rng(3)
    n = 20000
    k = rng.integers(0, 50, n).astype(np.int64)
    k[rng.random(n) < 0.4] = 9
    s = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    left = pa.table({"k": k, "s": s, "v": np.arange(n, dtype=np.int64)})
    right = duckdb.sql(
        'SELECT DISTINCT k, s FROM "left" ORDER BY k, s'
    ).arrow()
    right = right.append_column(
        "w", pa.array(np.arange(right.num_rows, dtype=np.int64))
    )
    got = skew_join(
        rd.from_arrow(left).repartition(8),
        rd.from_arrow(right).repartition(2),
        ["k", "s"], salts=4, hot_share=0.1,
    ).to_pandas()
    exp = duckdb.sql(
        'SELECT l.k, l.s, l.v, r.w FROM "left" l JOIN "right" r USING (k, s)'
    ).df()
    cols = ["k", "s", "v", "w"]
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_skew_join_rejects_unsupported_shapes():
    left, right = _skewed_sides(n=1000)
    lds = rd.from_arrow(left)
    rds = rd.from_arrow(right)
    with pytest.raises(ValueError, match="join_type"):
        skew_join(lds, rds, "k", join_type="full_outer")
    with pytest.raises(ValueError, match="salts"):
        skew_join(
            lds, rds, "k", salts=1,
            hot_keys=pa.table({"k": pa.array([7], pa.int64())}),
        )
    fleft = pa.table({"k": pa.array([1.5, 2.5]), "v": pa.array([1, 2])})
    with pytest.raises(ValueError, match="float"):
        skew_join(
            rd.from_arrow(fleft), rds, "k",
            hot_keys=pa.table({"k": pa.array([1.5])}),
        )
