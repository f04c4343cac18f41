"""Differential tests: asof_join and range_join vs DuckDB on seeded random
inputs with deliberate ties (small value ranges force boundary-equal rows,
overlapping intervals, duplicate probe timestamps — the cases a hand-picked
fixture misses).  DuckDB is the same oracle engine the external correctness
gate uses; int64 columns keep every comparison exact."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from raydatax.relational import asof_join, range_join


def _rand_tables(seed):
    rng = np.random.default_rng(seed)
    nl, nr, nk = 400, 120, 12
    keys = np.array([f"k{i:02d}" for i in range(nk)])
    left = pa.table({
        "k": pa.array(keys[rng.integers(0, nk, nl)]),
        "ts": pa.array(rng.integers(0, 100, nl).astype(np.int64)),
        "lid": pa.array(np.arange(nl, dtype=np.int64)),
    })
    lo = rng.integers(0, 100, nr).astype(np.int64)
    right = pa.table({
        "k": pa.array(keys[rng.integers(0, nk, nr)]),
        "lo": pa.array(lo),
        "hi": pa.array(lo + rng.integers(0, 30, nr).astype(np.int64)),
        "rid": pa.array(np.arange(nr, dtype=np.int64)),
    })
    return left, right


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_range_join_matches_duckdb(seed):
    left, right = _rand_tables(seed)
    out = range_join(
        rd.from_arrow(left), rd.from_arrow(right),
        key="k", ts_col="ts", lo_col="lo", hi_col="hi", num_partitions=4,
    ).to_pandas()
    got = sorted(zip(out["lid"], out["rid"]))
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = sorted(
        (int(a), int(b)) for a, b in con.execute(
            "SELECT l.lid, r.rid FROM l JOIN r"
            " ON l.k = r.k AND l.ts BETWEEN r.lo AND r.hi"
        ).fetchall()
    )
    con.close()
    assert got == want


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_join_matches_duckdb(seed):
    left, right_raw = _rand_tables(seed)
    # asof contract: right unique per (key, ts); keep the first rid per (k, lo)
    con = duckdb.connect()
    con.register("rraw", right_raw)
    right = con.execute(
        "SELECT k, lo AS ts, min(rid) AS rid FROM rraw GROUP BY k, lo"
    ).arrow()
    out = asof_join(
        rd.from_arrow(left), rd.from_arrow(right),
        key="k", ts_col="ts", num_partitions=4,
    ).to_pandas()
    got = sorted(
        (int(l), None if r is None or r != r else int(r))
        for l, r in zip(out["lid"], out["rid"])
    )
    con.register("l", left)
    con.register("r", right)
    want = sorted(
        (int(l), None if r is None else int(r)) for l, r in con.execute(
            "SELECT l.lid, r.rid FROM l ASOF LEFT JOIN r"
            " ON l.k = r.k AND l.ts >= r.ts"
        ).fetchall()
    )
    con.close()
    assert got == want
