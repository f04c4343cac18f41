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


@pytest.mark.parametrize("seed", [0, 1])
def test_window_scan_rank_pct_matches_duckdb(seed):
    """rank/dense_rank/percent_rank/cume_dist on tie-heavy random data:
    a tiny value range (0..8) forces dense tie runs in every partition —
    the outputs must match DuckDB's window functions as multisets
    (tied rows are identical, so multiset equality is full equality)."""
    from raydatax.relational import window_scan
    rng = np.random.default_rng(100 + seed)
    n, nk = 500, 7
    t = pa.table({
        "k": pa.array([f"g{i}" for i in rng.integers(0, nk, n)]),
        "v": pa.array(rng.integers(0, 8, n).astype(np.int64)),
    })
    out = window_scan(
        rd.from_arrow(t).repartition(5), key="k", order_col="v",
        ranks=True, pct=True, num_partitions=3,
    ).to_pandas()
    got = sorted(
        (r.k, int(r.v), int(r.rank), int(r.dense_rank),
         round(r.percent_rank, 12), round(r.cume_dist, 12))
        for r in out.itertuples()
    )
    con = duckdb.connect()
    con.register("t", t)
    exp = sorted(
        (k, int(v), int(rk), int(dr), round(pr, 12), round(cd, 12))
        for k, v, rk, dr, pr, cd in con.execute("""
            SELECT k, v,
                   rank() OVER w, dense_rank() OVER w,
                   percent_rank() OVER w, cume_dist() OVER w
            FROM t WINDOW w AS (PARTITION BY k ORDER BY v)
        """).fetchall()
    )
    assert got == exp


@pytest.mark.parametrize("seed", [0, 1])
def test_window_scan_ntile_lead_unique_order_matches_duckdb(seed):
    from raydatax.relational import window_scan
    rng = np.random.default_rng(200 + seed)
    n, nk = 300, 5
    t = pa.table({
        "k": pa.array([f"g{i}" for i in rng.integers(0, nk, n)]),
        "o": pa.array(np.arange(n, dtype=np.int64)),   # unique ordering
        "v": pa.array(rng.integers(0, 50, n).astype(np.int64)),
    })
    out = window_scan(
        rd.from_arrow(t).repartition(4), key="k", order_col="o",
        lead_cols=["v"], ntile_n=3, first_last_cols=["v"], num_partitions=2,
    ).to_pandas()
    got = sorted(
        (r.k, int(r.o),
         None if r.next_v != r.next_v else int(r.next_v),
         int(r.tile), int(r.first_v), int(r.last_v))
        for r in out.itertuples()
    )
    con = duckdb.connect()
    con.register("t", t)
    exp = sorted(
        (k, int(o), None if nv is None else int(nv), int(tl), int(fv), int(lv))
        for k, o, nv, tl, fv, lv in con.execute("""
            SELECT k, o, lead(v) OVER w, ntile(3) OVER w,
                   first_value(v) OVER w,
                   last_value(v) OVER (PARTITION BY k ORDER BY o
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND UNBOUNDED FOLLOWING)
            FROM t WINDOW w AS (PARTITION BY k ORDER BY o)
        """).fetchall()
    )
    assert got == exp


@pytest.mark.parametrize("seed", [0, 1])
def test_set_distinct_matches_duckdb(seed):
    from raydatax.relational import set_distinct
    rng = np.random.default_rng(300 + seed)
    mk = lambda n: pa.table({
        "a": pa.array([f"v{i}" for i in rng.integers(0, 25, n)]),
        "b": pa.array(rng.integers(0, 4, n).astype(np.int64)),
    })
    left, right = mk(300), mk(120)
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    for op, sql in [("intersect", "INTERSECT"), ("except", "EXCEPT")]:
        got = sorted(map(tuple, set_distinct(
            rd.from_arrow(left), rd.from_arrow(right), op
        ).to_pandas()[["a", "b"]].itertuples(index=False, name=None)))
        exp = sorted(con.execute(
            f"SELECT a, b FROM l {sql} SELECT a, b FROM r"
        ).fetchall())
        assert got == exp, op


@pytest.mark.parametrize("seed", [0, 1])
def test_grouped_concat_matches_duckdb(seed):
    from raydatax.relational import grouped_concat
    rng = np.random.default_rng(400 + seed)
    n = 250
    t = pa.table({
        "k": pa.array([f"g{i}" for i in rng.integers(0, 9, n)]),
        "o": pa.array(np.arange(n, dtype=np.int64)),       # unique order
        "v": pa.array([f"w{i}" for i in rng.integers(0, 50, n)]),
    })
    out = grouped_concat(
        rd.from_arrow(t).repartition(4), ["k"], "v", ["o"], sep=",",
        out_name="s", count_name="n", num_partitions=3,
    ).to_pandas()
    got = sorted(map(tuple, out[["k", "s", "n"]].itertuples(index=False, name=None)))
    con = duckdb.connect()
    con.register("t", t)
    exp = sorted(
        (k, s, int(c)) for k, s, c in con.execute("""
            SELECT k, string_agg(v, ',' ORDER BY o), count(v)
            FROM t GROUP BY k
        """).fetchall()
    )
    assert got == exp


# ------------------------------------------------- snapshot-derived CDC


def test_snapshot_cdc_classification(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raydatax.relational import snapshot_cdc

    old = pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array(["a", "b", None, "d"], pa.string()),
        "n": pa.array([10, 20, 30, 40], pa.int64()),
    })
    new = pa.table({
        "k": pa.array([2, 3, 4, 5], pa.int64()),
        "v": pa.array(["B", None, "d", "e"], pa.string()),
        "n": pa.array([20, 30, 41, 50], pa.int64()),
    })
    rows = {r["k"]: r for r in snapshot_cdc(
        rd.from_arrow(new), rd.from_arrow(old), ["k"], ["v", "n"]
    ).take_all()}
    assert rows[1]["op"] == "D" and rows[1]["v"] is None and rows[1]["n"] is None
    assert rows[2]["op"] == "U" and rows[2]["v"] == "B"  # value changed
    assert 3 not in rows  # null == null is NOT a change (null-safe compare)
    assert rows[4]["op"] == "U" and rows[4]["n"] == 41
    assert rows[5]["op"] == "I" and rows[5]["v"] == "e"


def test_snapshot_cdc_roundtrip_reconstructs_new(ray_session):
    """old snapshot + derived events replayed LWW == new snapshot."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raydatax.relational import snapshot_cdc

    rng = np.random.default_rng(11)
    old_k = np.arange(200)
    new_k = np.array([k for k in range(250) if k % 9 != 0])
    old = pa.table({"k": pa.array(old_k, pa.int64()),
                    "v": pa.array((old_k * 3 % 17).astype("int64"))})
    new = pa.table({"k": pa.array(new_k, pa.int64()),
                    "v": pa.array((new_k * 5 % 17).astype("int64"))})
    ev = snapshot_cdc(rd.from_arrow(new), rd.from_arrow(old), ["k"], ["v"]).take_all()
    state = {int(k): int(v) for k, v in zip(old["k"].to_pylist(), old["v"].to_pylist())}
    for e in ev:
        if e["op"] == "D":
            state.pop(e["k"], None)
        else:
            state[e["k"]] = e["v"]
    want = {int(k): int(v) for k, v in zip(new["k"].to_pylist(), new["v"].to_pylist())}
    assert state == want
