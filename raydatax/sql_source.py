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


_TOKEN_RING = 1 << 64  # DuckDB hash() is UBIGINT: the full token ring


def plan_token_splits(
    table: str,
    token_pk: str,
    num_splits: int,
    columns: list[str] | None,
    where: str | None,
) -> list[SQLSplitPlan]:
    """Token-range slicing — the cassandrareader / kudureader split model
    (``/root/reference/cassandrareader/.../CassandraReaderHelper.java:415-430``
    cuts the Murmur3 token ring into ``token(pk) > lo AND token(pk) <= hi``
    ranges; kudu tablets hash-partition the same way).

    Unlike splitPk range slicing this needs NO min/max planning query and
    works on keys of ANY type (string conversation ids included): the
    uint64 ring of ``hash(pk)`` is cut into ``num_splits`` contiguous
    half-open ranges.  Rows land in exactly one slice; a separate
    ``IS NULL`` slice keeps null keys (hash(NULL) is engine-defined, so
    every range predicate carries ``pk IS NOT NULL``).  DuckDB-only: the
    split function must run inside the database, like Cassandra's
    ``token()``."""
    proj = ", ".join(_quote_ident(c) for c in columns) if columns else "*"
    tbl = _quote_ident(table)
    base_where = f"({where})" if where else None

    def q(pred: str) -> str:
        preds = [p for p in (pred, base_where) if p]
        return f"SELECT {proj} FROM {tbl} WHERE {' AND '.join(preds)}"

    pk = _quote_ident(token_pk)
    tok = f"hash({pk})"
    n = max(1, int(num_splits))
    bounds = [(_TOKEN_RING * i) // n for i in range(n + 1)]
    plans = []
    for i in range(n):
        lo, hi = bounds[i], bounds[i + 1]
        parts = [f"{pk} IS NOT NULL", f"{tok} >= {lo}"]
        if hi < _TOKEN_RING:  # last range is ring-closed: no upper bound
            parts.append(f"{tok} < {hi}")
        plans.append(SQLSplitPlan(q(" AND ".join(parts)), f"token[{lo}..{hi})"))
    plans.append(SQLSplitPlan(q(f"{pk} IS NULL"), "null"))
    return plans


def _sql_literal(v) -> str:
    import datetime

    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, datetime.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    if not isinstance(v, (int, float)):
        raise TypeError(f"unsupported sample-split boundary type: {type(v)}")
    return str(v)


def plan_sample_splits(
    db_path: str,
    table: str,
    split_pk: str,
    num_splits: int,
    columns: list[str] | None,
    where: str | None,
    sample_per_split: int = 64,
) -> list[SQLSplitPlan]:
    """Sample-based split boundaries — the Oracle reader's SAMPLE split
    (``/root/reference/plugin-rdbms-util/.../reader/util/
    SingleTableSplitUtil.java:293-388``: sample the key, cut at quantiles).
    Unlike min/max range slicing this balances SKEWED keys and supports
    ANY orderable type (string keys included): boundaries are the sampled
    quantiles, slices are half-open boundary ranges plus open ends and the
    ``IS NULL`` slice.  The planning query reads only the sample."""
    proj = ", ".join(_quote_ident(c) for c in columns) if columns else "*"
    tbl = _quote_ident(table)
    pk = _quote_ident(split_pk)
    base_where = f"({where})" if where else None

    def q(pred: str | None) -> str:
        preds = [p for p in (pred, base_where) if p]
        w = f" WHERE {' AND '.join(preds)}" if preds else ""
        return f"SELECT {proj} FROM {tbl}{w}"

    n = max(1, int(num_splits))
    samp = _duckdb_query(
        db_path,
        f"SELECT {pk} AS k FROM {tbl}"
        f"{' WHERE ' + base_where if base_where else ''}"
        f" USING SAMPLE {n * sample_per_split} ROWS (reservoir, 42)",
    )
    vals = sorted(v for v in samp.column("k").to_pylist() if v is not None)
    bounds = []
    for i in range(1, n):
        b = vals[(i * len(vals)) // n] if vals else None
        if b is not None and (not bounds or b != bounds[-1]):
            bounds.append(b)
    plans = []
    if not bounds:
        plans.append(SQLSplitPlan(q(f"{pk} IS NOT NULL"), "all"))
    else:
        lits = [_sql_literal(b) for b in bounds]
        plans.append(SQLSplitPlan(q(f"{pk} < {lits[0]}"), f"(..{bounds[0]})"))
        for lo, hi in zip(lits, lits[1:]):
            plans.append(SQLSplitPlan(q(f"{pk} >= {lo} AND {pk} < {hi}"),
                                      f"[{lo}..{hi})"))
        plans.append(SQLSplitPlan(q(f"{pk} >= {lits[-1]}"), f"[{bounds[-1]}..)"))
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
    split_mode: str = "range",
) -> "ray.data.Dataset":
    """Parallel SQL table read with splitPk slicing.

    ``split_mode="range"`` (default) is the JDBC-family contract: ONE tiny
    MIN/MAX planning query on the driver, numeric key ranges per task.
    ``split_mode="token"`` is the cassandra/kudu contract: contiguous
    ranges of the uint64 ``hash(pk)`` ring — no planning query at all, and
    the key may be any type (DuckDB engine only).  Projection (``columns``)
    and predicate (``where``) are pushed into every slice's SQL — only
    needed columns and rows leave the database, the reader-side pruning
    discipline."""
    import ray.data

    if split_mode == "token":
        if split_pk is None:
            raise ValueError("token split requires split_pk")
        if engine != "duckdb":
            raise ValueError("token split needs an in-database hash(): duckdb only")
        plans = plan_token_splits(table, split_pk, num_splits, columns, where)
    elif split_mode == "sample":
        if split_pk is None:
            raise ValueError("sample split requires split_pk")
        if engine != "duckdb":
            raise ValueError("sample split needs USING SAMPLE: duckdb only")
        plans = plan_sample_splits(db_path, table, split_pk, num_splits,
                                   columns, where)
    elif split_mode == "range":
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
    else:
        raise ValueError(f"unknown split_mode {split_mode!r}")
    return ray.data.read_datasource(SQLDatasource(db_path, plans, engine))


# ---------------------------------------------------------------- SQL writer


def write_sql_table(
    ds: "ray.data.Dataset",
    db_path: str,
    table: str,
    write_mode: str = "insert",
    conflict_keys: list[str] | None = None,
    order_by: str | None = None,
    unique_keys: list[str] | None = None,
    pre_sql: list[str] | None = None,
    post_sql: list[str] | None = None,
    staging_dir: str | None = None,
) -> dict:
    """RDBMS writer family — the reference's most-used sink
    (``/root/reference/plugin-rdbms-util/.../writer/CommonRdbmsWriter.java``,
    writeMode insert/replace/update at ``writer/util/WriterUtil.java:113-146``;
    pre/postSql ibid.; adswriter's load-then-switch pattern
    ``/root/reference/adswriter/.../AdsWriter.java``).

    Ray-side design: the Dataset STAGES itself as parquet (distributed,
    parallel write — the same two-phase discipline as the lake sink), then
    the database ingests the staged files in ONE bulk statement (DuckDB
    scans parquet natively) — load-then-swap, never a per-row loop.  A
    single-writer embedded engine serializes only this final cheap load; on
    a server RDBMS the identical staging generalizes to per-partition COPY.

    write_mode:
      - ``insert``  — append (INSERT INTO ... SELECT).
      - ``replace`` — full refresh: load into a staging table, atomic
        RENAME swap (adswriter semantics).  ``unique_keys`` adds a unique
        index after the load so later upserts have a conflict target.
      - ``upsert``  — INSERT ... ON CONFLICT (conflict_keys) DO UPDATE of
        every non-key column (mysql ON DUPLICATE KEY UPDATE semantics).
        ``order_by`` (e.g. a seq column) LWW-dedupes conflicting rows
        WITHIN the staged batch first — multi-row conflicts in one INSERT
        are an error in DuckDB, and last-writer-wins is the CDC contract.
      - ``deleteinsert`` — DELETE the staged keys then INSERT: the
        PG/Oracle upsert mechanism the fork adds
        (``CommonRdbmsWriter.java:401-403,430-498``).  Same final state as
        ``upsert``; needs no unique index on the target.
    """
    import os
    import shutil
    import tempfile

    import duckdb

    if write_mode not in ("insert", "replace", "upsert", "deleteinsert"):
        raise ValueError(f"unknown write_mode {write_mode!r}")
    if write_mode in ("upsert", "deleteinsert") and not conflict_keys:
        raise ValueError(f"{write_mode} requires conflict_keys")

    own_staging = staging_dir is None
    staging = staging_dir or tempfile.mkdtemp(prefix="raydatax_sqlsink_")
    try:
        ds.write_parquet(staging)
        scan = f"read_parquet('{staging}/*.parquet')"
        con = duckdb.connect(db_path)
        try:
            for s in pre_sql or []:
                con.execute(s)
            cols = [f[0] for f in con.execute(f"SELECT * FROM {scan} LIMIT 0").description]
            proj = ", ".join(_quote_ident(c) for c in cols)
            tbl = _quote_ident(table)
            if write_mode == "replace":
                load_tbl = _quote_ident(table + "__load")
                con.execute(f"DROP TABLE IF EXISTS {load_tbl}")
                con.execute(f"CREATE TABLE {load_tbl} AS SELECT {proj} FROM {scan}")
                con.execute(f"DROP TABLE IF EXISTS {tbl}")
                con.execute(f"ALTER TABLE {load_tbl} RENAME TO {tbl}")
                if unique_keys:
                    # after the swap: DuckDB cannot rename a table that an
                    # index depends on
                    idx = ", ".join(_quote_ident(k) for k in unique_keys)
                    con.execute(
                        f"CREATE UNIQUE INDEX {_quote_ident(table + '__uk')} "
                        f"ON {tbl} ({idx})"
                    )
            elif write_mode == "insert":
                con.execute(f"INSERT INTO {tbl} SELECT {proj} FROM {scan}")
            elif write_mode == "deleteinsert":
                keys = list(conflict_keys)
                pred = " AND ".join(
                    f"{tbl}.{_quote_ident(k)} = s.{_quote_ident(k)}" for k in keys
                )
                con.execute(
                    f"DELETE FROM {tbl} WHERE EXISTS "
                    f"(SELECT 1 FROM {scan} s WHERE {pred})"
                )
                src = f"SELECT {proj} FROM {scan}"
                if order_by:
                    part = ", ".join(_quote_ident(k) for k in keys)
                    src += (
                        f" QUALIFY row_number() OVER (PARTITION BY {part} "
                        f"ORDER BY {_quote_ident(order_by)} DESC) = 1"
                    )
                con.execute(f"INSERT INTO {tbl} {src}")
            else:  # upsert
                keys = [k for k in conflict_keys]
                non_keys = [c for c in cols if c not in keys]
                sets = ", ".join(
                    f"{_quote_ident(c)} = excluded.{_quote_ident(c)}" for c in non_keys
                )
                src = f"SELECT {proj} FROM {scan}"
                if order_by:
                    part = ", ".join(_quote_ident(k) for k in keys)
                    src += (
                        f" QUALIFY row_number() OVER (PARTITION BY {part} "
                        f"ORDER BY {_quote_ident(order_by)} DESC) = 1"
                    )
                target = ", ".join(_quote_ident(k) for k in keys)
                con.execute(
                    f"INSERT INTO {tbl} {src} "
                    f"ON CONFLICT ({target}) DO UPDATE SET {sets}"
                )
            n = con.execute(f"SELECT count(*) FROM {tbl}").fetchone()[0]
            for s in post_sql or []:
                con.execute(s)
        finally:
            con.close()
        return {"table": table, "rows_in_table": int(n), "mode": write_mode}
    finally:
        if own_staging:
            shutil.rmtree(staging, ignore_errors=True)


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
