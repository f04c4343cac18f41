"""JDBC-family SQL source: splitPk range slicing + parallel slice reads.

Reference behavior being mirrored (not ported):
SingleTableSplitUtil.java:32-123,270-288 (min/max range slicing + IS NULL
slice), CommonRdbmsReader.java:173-228 (per-slice query with projection and
predicate pushdown).
"""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydatax.sql_source import (
    export_parquet_to_duckdb,
    plan_splits,
    read_sql_table,
    split_ranges,
)

SF = "/root/testdata/sf0.001"


def test_split_ranges_cover_span_exactly():
    rs = split_ranges(0, 99, 4)
    assert rs[0] == (0, 25, False)
    assert rs[-1][2] is True and rs[-1][1] == 99
    # every value lands in exactly one range
    seen = []
    for lo, hi, inc in rs:
        seen.extend(range(lo, hi + 1 if inc else hi))
    assert seen == list(range(100))


def test_split_ranges_narrow_span_degrades():
    assert split_ranges(5, 5, 8) == [(5, 5, True)]
    assert split_ranges(7, 3, 4) == []
    assert len(split_ranges(0, 2, 8)) <= 3


def test_plan_splits_shapes():
    plans = plan_splits("t", "pk", 0, 9, 2, ["a", "b"], "b > 1")
    assert len(plans) == 3  # 2 ranges + null slice
    assert 'SELECT "a", "b" FROM "t"' in plans[0].sql
    assert "(b > 1)" in plans[0].sql
    assert '"pk" IS NULL' in plans[-1].sql
    # no splitPk -> single full query
    assert len(plan_splits("t", None, None, None, 4, None, None)) == 1
    with pytest.raises(ValueError):
        plan_splits("t; drop", "pk", 0, 1, 2, None, None)


@pytest.fixture(scope="module")
def orders_db(tmp_path_factory):
    db = str(tmp_path_factory.mktemp("sqlsrc") / "orders.duckdb")
    export_parquet_to_duckdb(f"{SF}/orders.parquet", db, "orders")
    return db


def test_read_sql_table_matches_direct(ray_session, orders_db):
    got = (
        read_sql_table(orders_db, "orders", split_pk="o_orderkey", num_splits=4)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    want = (
        pq.read_table(f"{SF}/orders.parquet")
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["o_orderkey"] == want["o_orderkey"]).all()
    assert (got["o_totalprice"] == want["o_totalprice"]).all()


def test_read_sql_table_pushdown_and_projection(ray_session, orders_db):
    ds = read_sql_table(
        orders_db, "orders", split_pk="o_orderkey", num_splits=4,
        columns=["o_orderkey", "o_totalprice"], where="o_totalprice > 200000",
    )
    df = ds.to_pandas()
    assert list(df.columns) == ["o_orderkey", "o_totalprice"]
    assert (df["o_totalprice"] > 200000).all()
    n_direct = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/orders.parquet') "
        "WHERE o_totalprice > 200000"
    ).fetchone()[0]
    assert len(df) == n_direct


def test_null_pk_slice_not_lost(ray_session, tmp_path):
    db = str(tmp_path / "nulls.duckdb")
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES (1, 'a'), (2, 'b'), "
        "(NULL, 'n1'), (3, 'c'), (NULL, 'n2')) AS v(pk, val)"
    )
    con.close()
    df = read_sql_table(db, "t", split_pk="pk", num_splits=2).to_pandas()
    assert len(df) == 5
    assert sorted(df["val"]) == ["a", "b", "c", "n1", "n2"]


def test_sqlite_engine(ray_session, tmp_path):
    import sqlite3

    db = str(tmp_path / "t.sqlite")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE kv (k INTEGER, v TEXT)")
    con.executemany("INSERT INTO kv VALUES (?, ?)", [(i, f"v{i}") for i in range(50)])
    con.commit()
    con.close()
    df = (
        read_sql_table(db, "kv", split_pk="k", num_splits=3, engine="sqlite")
        .to_pandas()
        .sort_values("k")
    )
    assert df["k"].tolist() == list(range(50))


def test_token_split_plans_partition_ring():
    from raydatax.sql_source import _TOKEN_RING, plan_token_splits

    plans = plan_token_splits("t", "pk", 4, ["a"], "a > 0")
    assert len(plans) == 5  # 4 token ranges + null slice
    assert 'hash("pk") >= 0' in plans[0].sql
    assert '"pk" IS NOT NULL' in plans[0].sql
    # last range is ring-closed: no upper bound past 2^64
    assert plans[3].sql.count("hash") == 1
    assert str(_TOKEN_RING) not in plans[3].sql
    # middle ranges carry both bounds
    assert plans[1].sql.count("hash") == 2
    assert '"pk" IS NULL' in plans[-1].sql
    assert "(a > 0)" in plans[0].sql


def test_token_split_read_string_key(ray_session, tmp_path):
    """Token slices over a STRING key (what splitPk range-slicing cannot
    do): disjoint, complete, nulls kept — CassandraReaderHelper.java:415-430
    token-ring contract."""
    from raydatax.sql_source import read_sql_table

    db = str(tmp_path / "conv.duckdb")
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE conv AS SELECT 'conv-' || lpad(CAST(i AS VARCHAR), 5, '0')"
        " AS cid, i AS n FROM range(500) t(i)"
    )
    con.execute("INSERT INTO conv VALUES (NULL, -1), (NULL, -2)")
    con.close()

    ds = read_sql_table(db, "conv", split_pk="cid", num_splits=8,
                        split_mode="token")
    df = ds.to_pandas()
    assert len(df) == 502  # every row in exactly one slice, nulls included
    assert sorted(df["n"]) == list(range(-2, 500))
    # slices genuinely split the data: several non-empty token ranges
    sizes = [b.num_rows for b in ds.iter_batches(batch_size=None,
                                                 batch_format="pyarrow")]
    assert sum(sizes) == 502

    with pytest.raises(ValueError, match="duckdb only"):
        read_sql_table(db, "conv", split_pk="cid", split_mode="token",
                       engine="sqlite")
    with pytest.raises(ValueError, match="requires split_pk"):
        read_sql_table(db, "conv", split_mode="token")


def test_job_runner_rdbmsreader(ray_session, orders_db, tmp_path):
    from raydatax.job import run_job_config

    out = str(tmp_path / "out")
    rep = run_job_config(
        {
            "job": {
                "content": [
                    {
                        "reader": {
                            "name": "rdbmsreader",
                            "parameter": {
                                "path": orders_db,
                                "table": "orders",
                                "splitPk": "o_orderkey",
                                "numSplits": 3,
                                "column": ["o_orderkey", "o_totalprice"],
                                "where": "o_totalprice > 100000",
                            },
                        },
                        "writer": {
                            "name": "parquetwriter",
                            "parameter": {"path": out, "writeMode": "truncate"},
                        },
                    }
                ]
            }
        }
    )
    n = rep["contents"][0]["rows"]
    n_direct = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/orders.parquet') "
        "WHERE o_totalprice > 100000"
    ).fetchone()[0]
    assert n == n_direct


def test_write_sql_table_modes(tmp_path):
    """Writer family: replace (load-then-swap + unique key), insert
    (append), upsert (ON CONFLICT DO UPDATE with in-batch LWW dedupe),
    pre/postSql hooks — CommonRdbmsWriter/WriterUtil.java:113-146."""
    import ray.data as rd

    from raydatax.sql_source import write_sql_table

    db = str(tmp_path / "t.duckdb")
    base = pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "v": pa.array(["a", "b", "c"], pa.string()),
        "seq": pa.array([10, 10, 10], pa.int64()),
    })
    rep = write_sql_table(rd.from_arrow(base), db, "t",
                          write_mode="replace", unique_keys=["k"],
                          pre_sql=["CREATE TABLE IF NOT EXISTS audit(x INT)"],
                          post_sql=["INSERT INTO audit VALUES (1)"])
    assert rep["rows_in_table"] == 3

    # replace is idempotent (swap, not append)
    rep = write_sql_table(rd.from_arrow(base), db, "t",
                          write_mode="replace", unique_keys=["k"])
    assert rep["rows_in_table"] == 3

    # insert appends
    extra = pa.table({"k": pa.array([4], pa.int64()),
                      "v": pa.array(["d"], pa.string()),
                      "seq": pa.array([10], pa.int64())})
    rep = write_sql_table(rd.from_arrow(extra), db, "t", write_mode="insert")
    assert rep["rows_in_table"] == 4

    # upsert: conflicting keys update, new keys insert; duplicate keys
    # within the staged batch resolve last-writer-wins by order_by
    delta = pa.table({
        "k": pa.array([2, 2, 5], pa.int64()),
        "v": pa.array(["stale", "B2", "e"], pa.string()),
        "seq": pa.array([11, 12, 11], pa.int64()),
    })
    rep = write_sql_table(rd.from_arrow(delta), db, "t",
                          write_mode="upsert", conflict_keys=["k"],
                          order_by="seq")
    assert rep["rows_in_table"] == 5
    got = duckdb.connect(db).execute("SELECT k, v FROM t ORDER BY k").fetchall()
    assert got == [(1, "a"), (2, "B2"), (3, "c"), (4, "d"), (5, "e")]
    n_audit = duckdb.connect(db).execute("SELECT count(*) FROM audit").fetchone()[0]
    assert n_audit == 1


def test_write_sql_table_upsert_requires_keys(tmp_path):
    import ray.data as rd

    from raydatax.sql_source import write_sql_table

    t = pa.table({"k": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="conflict_keys"):
        write_sql_table(rd.from_arrow(t), str(tmp_path / "x.duckdb"), "t",
                        write_mode="upsert")


def test_write_sql_table_deleteinsert(tmp_path):
    """PG/Oracle delete-then-insert upsert (CommonRdbmsWriter.java:401-403,
    430-498): same final state as ON CONFLICT upsert, no unique index
    required on the target."""
    import ray.data as rd

    from raydatax.sql_source import write_sql_table

    db = str(tmp_path / "t.duckdb")
    base = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                     "v": pa.array(["a", "b", "c"], pa.string()),
                     "seq": pa.array([1, 1, 1], pa.int64())})
    write_sql_table(rd.from_arrow(base), db, "t", write_mode="replace")
    delta = pa.table({"k": pa.array([2, 2, 9], pa.int64()),
                      "v": pa.array(["old", "B", "z"], pa.string()),
                      "seq": pa.array([2, 3, 2], pa.int64())})
    rep = write_sql_table(rd.from_arrow(delta), db, "t",
                          write_mode="deleteinsert", conflict_keys=["k"],
                          order_by="seq")
    assert rep["rows_in_table"] == 4
    got = duckdb.connect(db).execute("SELECT k, v FROM t ORDER BY k").fetchall()
    assert got == [(1, "a"), (2, "B"), (3, "c"), (9, "z")]


def test_sample_split_read_skewed_string_key(ray_session, tmp_path):
    """Oracle SAMPLE split (SingleTableSplitUtil.java:293-388): quantile
    boundaries from a seeded sample balance a SKEWED string key; slices
    are disjoint + complete, nulls kept, quotes escaped in literals."""
    from raydatax.sql_source import plan_sample_splits, read_sql_table

    db = str(tmp_path / "s.duckdb")
    con = duckdb.connect(db)
    # heavy skew: 70% of keys share one prefix; one key contains a quote
    con.execute(
        "CREATE TABLE t AS SELECT CASE WHEN i % 10 < 7 THEN 'aaa-' ELSE 'zz-' END"
        " || lpad(CAST(i AS VARCHAR), 5, '0') AS k, i AS n FROM range(400) r(i)"
    )
    con.execute("INSERT INTO t VALUES ('it''s', -1), (NULL, -2)")
    con.close()

    df = read_sql_table(db, "t", split_pk="k", num_splits=4,
                        split_mode="sample").to_pandas()
    assert len(df) == 402
    assert sorted(df["n"]) == list(range(-2, 400))

    plans = plan_sample_splits(db, "t", "k", 4, None, None)
    assert 3 <= len(plans) <= 6  # open ends + interior ranges + null slice
    assert plans[-1].label == "null"

    with pytest.raises(ValueError, match="duckdb only"):
        read_sql_table(db, "t", split_pk="k", split_mode="sample",
                       engine="sqlite")
