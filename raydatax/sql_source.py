"""SQL source with splitPk range splitting — the JDBC reader family.

The reference's largest source family (mysql / oracle / postgresql /
sqlserver / drds / generic rdbms readers all share plugin-rdbms-util)
parallelizes a table read by slicing on a numeric primary key: compute
MIN/MAX of ``splitPk`` under the user's WHERE, cut the span into
``adviceNumber`` half-open ranges (last one inclusive), and add one extra
``splitPk IS NULL`` slice so null-keyed rows are not lost
(``/root/reference/plugin-rdbms-util/src/main/java/com/alibaba/datax/plugin/
rdbms/reader/util/SingleTableSplitUtil.java:32-123,270-288``); each slice
then runs as an independent query with projection + predicate pushed into
the SQL (``reader/CommonRdbmsReader.java:173-228``).

Here the "database" is an embeddable engine the sandbox actually has —
a DuckDB or SQLite **file** — and each slice becomes a Ray Data
``ReadTask`` via a custom :class:`SQLDatasource`, so the streaming executor
schedules, pipelines and backpressures slices exactly like parquet
fragments.  On a real cluster the same shape holds: every task opens its
own read-only connection (no connection object is ever serialized) and the
driver runs only the tiny MIN/MAX planning query.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pyarrow as pa

from ray.data.block import BlockMetadata
from ray.data.datasource import Datasource, ReadTask


def split_ranges(lo: int, hi: int, n: int) -> list[tuple[int, int, bool]]:
    """Cut the inclusive span [lo, hi] into ≤ n ranges (lo_i, hi_i,
    hi_inclusive): half-open except the last, which is inclusive — the
    splitPk slicing contract.  Fewer ranges come back when the span is
    narrower than n."""
    if lo > hi:
        return []
    span = hi - lo + 1
    n = max(1, min(n, span))
    step = math.ceil(span / n)
    out = []
    start = lo
    while start <= hi:
        end = min(start + step, hi + 1)
        if end > hi:
            out.append((start, hi, True))
            break
        out.append((start, end, False))
        start = end
    return out


def _quote_ident(name: str) -> str:
    if not name.replace("_", "").isalnum():
        raise ValueError(f"unsafe SQL identifier: {name!r}")
    return f'"{name}"'


@dataclass
class SQLSplitPlan:
    """One read slice: a complete SQL statement plus its predicate label."""

    sql: str
    label: str


def plan_splits(
    table: str,
    split_pk: str | None,
    pk_min: int | None,
    pk_max: int | None,
    num_splits: int,
    columns: list[str] | None,
    where: str | None,
) -> list[SQLSplitPlan]:
    """Compile the slice list.  Without a splitPk (or with an empty/constant
    key span) the read is one query — same degradation as the reference."""
    proj = ", ".join(_quote_ident(c) for c in columns) if columns else "*"
    tbl = _quote_ident(table)
    base_where = f"({where})" if where else None

    def q(pred: str | None) -> str:
        preds = [p for p in (pred, base_where) if p]
        w = f" WHERE {' AND '.join(preds)}" if preds else ""
        return f"SELECT {proj} FROM {tbl}{w}"

    if split_pk is None or pk_min is None or pk_max is None:
        return [SQLSplitPlan(q(None), "full")]
    pk = _quote_ident(split_pk)
    plans = []
    for lo, hi, inclusive in split_ranges(int(pk_min), int(pk_max), num_splits):
        cmp_hi = "<=" if inclusive else "<"
        pred = f"{pk} >= {lo} AND {pk} {cmp_hi} {hi}"
        plans.append(SQLSplitPlan(q(pred), f"{lo}..{hi}{']' if inclusive else ')'}"))
    # null slice: rows whose splitPk IS NULL would otherwise vanish
    plans.append(SQLSplitPlan(q(f"{pk} IS NULL"), "null"))
    return plans


# ------------------------------------------------------------ engine drivers


def _duckdb_query(db_path: str, sql: str) -> pa.Table:
    import duckdb

    con = duckdb.connect(db_path, read_only=True)
    try:
        return con.execute(sql).arrow()
    finally:
        con.close()


def _sqlite_query(db_path: str, sql: str) -> pa.Table:
    """sqlite has no column-type metadata on results — types are inferred
    from the rows, so a slice whose column is ALL NULL infers null type
    (documented limitation; DuckDB slices carry real types)."""
    import sqlite3

    con = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
    try:
        cur = con.execute(sql)
        names = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        con.close()
    if not rows:
        return pa.table({n: pa.array([]) for n in names})
    cols = list(zip(*rows))
    return pa.table({n: pa.array(list(c)) for n, c in zip(names, cols)})


_ENGINES = {"duckdb": _duckdb_query, "sqlite": _sqlite_query}


def _scalar_query(db_path: str, sql: str, engine: str):
    t = _ENGINES[engine](db_path, sql)
    return [t.column(i)[0].as_py() for i in range(t.num_columns)]


# --------------------------------------------------------------- datasource


class SQLDatasource(Datasource):
    """Custom Ray Data datasource: one ReadTask per splitPk slice.  The
    connection is opened INSIDE the task (connections don't serialize);
    metadata carries no row counts (unknown until executed), so the
    streaming executor treats slices as opaque blocks."""

    def __init__(self, db_path: str, plans: list[SQLSplitPlan], engine: str):
        self._db_path = db_path
        self._plans = plans
        self._engine = engine

    def get_name(self) -> str:
        return f"SQL[{self._engine}]"

    def estimate_inmemory_data_size(self):
        return None

    def get_read_tasks(self, parallelism: int) -> list[ReadTask]:
        query = _ENGINES[self._engine]
        db = self._db_path
        tasks = []
        for plan in self._plans:
            sql = plan.sql

            def read_fn(sql=sql):
                t = query(db, sql)
                # drop empty row-inferred (null-typed) blocks — e.g. the
                # always-present `pk IS NULL` slice on a NOT NULL key via
                # sqlite — so they can't poison downstream schema unification
                if t.num_rows or all(
                    not pa.types.is_null(f.type) for f in t.schema
                ):
                    yield t

            meta = BlockMetadata(
                num_rows=None, size_bytes=None, exec_stats=None,
                input_files=[f"{db}#{plan.label}"],
            )
            tasks.append(ReadTask(read_fn, meta))
        return tasks


def read_sql_table(
    db_path: str,
    table: str,
    split_pk: str | None = None,
    num_splits: int = 8,
    columns: list[str] | None = None,
    where: str | None = None,
    engine: str = "duckdb",
) -> "ray.data.Dataset":
    """Parallel SQL table read with splitPk range slicing.

    Planning runs ONE tiny MIN/MAX query on the driver; the data itself is
    read by the split tasks.  Projection (``columns``) and predicate
    (``where``) are pushed into every slice's SQL — only needed columns and
    rows leave the database, the reader-side pruning discipline."""
    import ray.data

    pk_min = pk_max = None
    if split_pk is not None:
        pk = _quote_ident(split_pk)
        w = f" WHERE ({where})" if where else ""
        pk_min, pk_max = _scalar_query(
            db_path,
            f"SELECT MIN({pk}), MAX({pk}) FROM {_quote_ident(table)}{w}",
            engine,
        )
    plans = plan_splits(table, split_pk, pk_min, pk_max, num_splits, columns, where)
    return ray.data.read_datasource(SQLDatasource(db_path, plans, engine))


def export_parquet_to_duckdb(
    parquet_path: str, db_path: str, table: str, engine: str = "duckdb"
) -> None:
    """Test/fixture helper: materialize a parquet file as a DuckDB table
    file (idempotent — recreated only when missing)."""
    import os

    if os.path.exists(db_path):
        return
    import duckdb

    tmp = db_path + ".tmp"
    if os.path.exists(tmp):
        os.remove(tmp)
    con = duckdb.connect(tmp)
    try:
        con.execute(
            f"CREATE TABLE {_quote_ident(table)} AS "
            f"SELECT * FROM read_parquet('{parquet_path}')"
        )
    finally:
        con.close()
    os.replace(tmp, db_path)
