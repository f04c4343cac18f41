"""Relational + per-record-transformer queries: TPC-H-ish aggregates,
joins, SQL-source reads, casts, the dx_* transform chain.

Split out of the former monolithic pipelines.py (round-3 verdict item 5);
the registry (QUERIES / ORACLE_SQL) stays in :mod:`raydatax.pipelines`.
"""


import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .relational import (
    broadcast_join,
    preagg_groupby,
    topk,
)
from .transforms import dx_filter, dx_url

from .q_common import (
    _cents,
    _p,
    _round,
    _scratch,
)


# ---------------------------------------------------------------- relational


def q1_pricing_summary(sf_dir: str):
    ds = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(np.datetime64("1998-09-01", "us"))))
        disc_price = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("disc_price", disc_price)

    out = preagg_groupby(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        [
            ("l_quantity", "sum", "sum_qty"),
            ("l_extendedprice", "sum", "sum_base_price"),
            ("disc_price", "sum", "sum_disc_price"),
            ("l_quantity", "count", "count_order"),
        ],
        mean_of=[("sum_qty", "count_order", "avg_qty")],
    )
    return out.map_batches(
        lambda t: _round(t, {"sum_qty": 2, "sum_base_price": 2, "sum_disc_price": 2, "avg_qty": 4}),
        batch_format="pyarrow",
    )


def top_orders(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "orders"),
                         columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return topk(ds, [("o_totalprice", "descending"), ("o_orderkey", "ascending")], 10)


def customers_per_region(sf_dir: str):
    import pyarrow.parquet as pq

    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey", "c_acctbal"])
    nation = pq.read_table(_p(sf_dir, "nation")).rename_columns(["c_nationkey", "n_name", "r_regionkey"])
    region = pq.read_table(_p(sf_dir, "region")).rename_columns(["r_regionkey", "r_name"])
    joined = broadcast_join(cust, nation, "c_nationkey")
    joined = broadcast_join(joined, region, "r_regionkey")
    out = preagg_groupby(
        joined, ["r_name"],
        [("c_custkey", "count", "n_customers"), ("c_acctbal", "sum", "sum_acctbal")],
        mean_of=[("sum_acctbal", "n_customers", "avg_acctbal")],
    )
    return out.map_batches(
        lambda t: _round(t, {"sum_acctbal": 2, "avg_acctbal": 4}), batch_format="pyarrow"
    )


def projection_filter_revenue(sf_dir: str):
    """Reader-style projection + predicate pushdown + computed column (the
    DataX reader `column`/`where` surface)."""
    ds = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
                 "l_discount", "l_returnflag"],
        filter=(pc.field("l_quantity") > 45) & (pc.field("l_returnflag") == "R"),
    )

    def proj(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "l_linenumber": t["l_linenumber"],
                         "l_quantity": t["l_quantity"], "revenue": rev})

    return ds.map_batches(proj, batch_format="pyarrow")


def semi_join_fulfilled(sf_dir: str):
    """Semi join where the build side (orders) is read DISTRIBUTED with the
    status predicate pushed to the parquet read; the key set is broadcast
    only because it is metadata-counted under threshold (see semi_join)."""
    from .relational import semi_join

    fulfilled = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey"],
        filter=pc.field("o_orderstatus") == "F",
    )
    li = rd.read_parquet(_p(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_returnflag", "l_quantity"])
    filtered = semi_join(li, fulfilled, "l_orderkey", "o_orderkey")
    out = preagg_groupby(
        filtered, ["l_returnflag"],
        [("l_quantity", "count", "n_items"), ("l_quantity", "sum", "sum_qty")],
    )
    return out.map_batches(lambda t: _round(t, {"sum_qty": 2}), batch_format="pyarrow")


def events_partitioned_roundtrip(sf_dir: str):
    """odps/hive partitioned-table parity: write events hive-partitioned by
    event_type (one key=value directory per partition — the resumable
    output layout), read back ONLY the 'click' partition with
    directory-level pruning, and aggregate per day."""
    import shutil

    from .sinks import read_partitioned, write_partitioned

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = f"/tmp/raydatax_part_{tag}"
    shutil.rmtree(out, ignore_errors=True)
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "ts", "value"])
    write_partitioned(ds, out, ["event_type"])

    clicks = read_partitioned(out, filters={"event_type": "click"},
                              columns=["ts", "value"])

    def add_day(t: pa.Table) -> pa.Table:
        return pa.table({"day": pc.strftime(t["ts"], format="%Y-%m-%d"),
                         "value": t["value"]})

    agg = preagg_groupby(
        clicks.map_batches(add_day, batch_format="pyarrow"),
        ["day"], [("value", "count", "n_events"), ("value", "sum", "sum_value")],
    )
    return agg.map_batches(lambda t: _round(t, {"sum_value": 2}), batch_format="pyarrow")


def customers_without_orders(sf_dir: str):
    """Anti join with a large build side: customers with NO fulfilled
    order.  The distinct order-customer key set is built distributed (with
    the status predicate pushed to the read) and the broadcast-vs-hash
    decision comes from a metadata count (relational.semi_join, anti=True)."""
    from .relational import semi_join

    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    ords = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey"],
        filter=pc.field("o_orderstatus") == "F",
    )
    return semi_join(cust, ords, "c_custkey", "o_custkey", anti=True)


def customer_order_counts(sf_dir: str):
    """LEFT OUTER join kept to the end: every customer with their
    fulfilled-order count, customers with none kept at 0 —
    relational.hash_join(join_type="left_outer") then a null-skipping
    grouped count (count(o_orderkey) ignores the unmatched rows' nulls,
    exactly the SQL rule)."""
    from .relational import hash_join, preagg_groupby

    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey"])
    ords = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey", "o_orderkey"],
        filter=pc.field("o_orderstatus") == "F",
    ).map_batches(
        lambda t: t.rename_columns(["c_custkey", "o_orderkey"]),
        batch_format="pyarrow",
    )
    joined = hash_join(cust, ords, on="c_custkey", join_type="left_outer")
    return preagg_groupby(joined, ["c_custkey"], [("o_orderkey", "count", "n_orders")])


def sql_split_read(sf_dir: str):
    """JDBC-family source parity: splitPk range-sliced parallel read out of
    a DuckDB database file (built once from the orders table), with
    projection and predicate pushed into every slice's SQL — the
    mysql/pg/oracle reader surface over an engine the sandbox can host."""
    from .sql_source import export_parquet_to_duckdb, read_sql_table

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    db = f"/tmp/raydatax_orders_{tag}.duckdb"
    export_parquet_to_duckdb(_p(sf_dir, "orders"), db, "orders")
    return read_sql_table(
        db, "orders", split_pk="o_orderkey", num_splits=6,
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
        where="o_totalprice > 150000",
    )


def sql_token_read(sf_dir: str):
    """Cassandra/kudu-family source parity: token-range sliced parallel
    read — contiguous ranges of the uint64 hash(pk) ring, cut WITHOUT any
    driver-side min/max planning query, over a STRING key (the case splitPk
    range slicing cannot handle).  Each row lands in exactly one slice; the
    union must hash-match a plain scan."""
    from .sql_source import export_parquet_to_duckdb, read_sql_table

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    db = f"/tmp/raydatax_customer_{tag}.duckdb"
    export_parquet_to_duckdb(_p(sf_dir, "customer"), db, "customer")
    return read_sql_table(
        db, "customer", split_pk="c_name", num_splits=8, split_mode="token",
        columns=["c_custkey", "c_name", "c_mktsegment", "c_acctbal"],
        where="c_acctbal > 1000",
    )


def sql_sample_read(sf_dir: str):
    """Oracle-reader SAMPLE split parity: slice boundaries from a seeded
    sample's quantiles (balances skew, works on the string key), union of
    slices must hash-match a plain filtered scan."""
    from .sql_source import export_parquet_to_duckdb, read_sql_table

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    db = f"/tmp/raydatax_customer_{tag}.duckdb"
    export_parquet_to_duckdb(_p(sf_dir, "customer"), db, "customer")
    return read_sql_table(
        db, "customer", split_pk="c_name", num_splits=5, split_mode="sample",
        columns=["c_custkey", "c_name", "c_acctbal"],
        where="c_acctbal < 9000",
    )


def sql_writer_roundtrip(sf_dir: str):
    """JDBC-family WRITER parity (CommonRdbmsWriter writeMode + adswriter
    load-then-swap): documents --replace--> DuckDB table with a unique key,
    a derived delta --upsert--> ON CONFLICT DO UPDATE (the mysql ON
    DUPLICATE KEY semantic), final state read back through the
    splitPk-sliced reader.  The oracle recomputes the post-upsert rows
    directly from the source table."""
    import tempfile

    from .sql_source import read_sql_table, write_sql_table

    db = os.path.join(tempfile.mkdtemp(prefix="raydatax_sqlsink_"), "docs.duckdb")
    docs = rd.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "lang", "source", "n_chars"]
    )
    write_sql_table(docs, db, "docs", write_mode="replace", unique_keys=["doc_id"])

    def bump(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(ids % 10 == 0))
        return sub.set_column(
            sub.schema.get_field_index("n_chars"), "n_chars",
            pc.add(sub["n_chars"], pa.scalar(1000, pa.int64())),
        )

    delta = docs.map_batches(bump, batch_format="pyarrow")
    write_sql_table(delta, db, "docs", write_mode="upsert", conflict_keys=["doc_id"])
    return read_sql_table(db, "docs", split_pk="doc_id", num_splits=6)


def distinct_event_types(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pa.table({"event_type": pa.array(vals, pa.string())})


# ------------------------------------------------------------- transformers


def transform_chain(sf_dir: str):
    """Full transformer surface under one oracle: dx_substr / dx_pad /
    dx_replace / dx_filter plus a REGISTERED external transformer, composed
    through the chain() registry path (TransformerRegistry +
    TransformerExchanger parity)."""
    from .transforms import REGISTRY, chain, register

    ds = rd.read_parquet(_p(sf_dir, "customer"),
                         columns=["c_custkey", "c_name", "c_mktsegment", "c_acctbal"])

    if "upper_col" not in REGISTRY:  # external (non-dx_) transformer hook
        def upper_col(batch: pa.Table, column: str) -> pa.Table:
            i = batch.schema.get_field_index(column)
            return batch.set_column(i, column, pc.utf8_upper(batch[column]))

        register("upper_col", upper_col)

    fn = chain([
        ("dx_substr", "name8", 0, 8),
        ("dx_pad", "seg_pad", "l", 12, "*"),
        ("dx_replace", "seg_repl", 2, 3, "XX"),
        ("upper_col", "name8"),
        ("dx_filter", "c_acctbal", ">", 5000),
    ])

    def apply(t: pa.Table) -> pa.Table:
        t = t.append_column("name8", t["c_name"])
        t = t.append_column("seg_pad", t["c_mktsegment"])
        t = t.append_column("seg_repl", t["c_mktsegment"])
        return fn(t).select(["c_custkey", "name8", "seg_pad", "seg_repl", "c_acctbal"])

    return ds.map_batches(apply, batch_format="pyarrow")


def url_extract(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "part"), columns=["p_partkey", "p_brand", "p_size"])

    def apply(t: pa.Table) -> pa.Table:
        brand = pc.replace_substring(t["p_brand"], "#", "-")
        url = pc.binary_join_element_wise(
            "https://parts.example.com/", brand, "/",
            pc.cast(t["p_partkey"], pa.string()),
            "?size=", pc.cast(t["p_size"], pa.string()), "",
        )
        t = t.append_column("url", url)
        t = dx_url(t, "url", parts=("host", "path"), param="size")
        return t.select(["p_partkey", "url_host", "url_path", "url_size"])

    return ds.map_batches(apply, batch_format="pyarrow")


def filter_like(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "part"), columns=["p_partkey", "p_type", "p_brand"])
    return ds.map_batches(
        lambda t: dx_filter(t, "p_type", "like", ".*ECO.*"), batch_format="pyarrow"
    )


def cast_roundtrip(sf_dir: str):
    """ColumnCast parity (string↔date↔long total conversion matrix,
    /root/reference/common/.../element/ColumnCast.java:17-43)."""
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "ts", "value"])

    def apply(t: pa.Table) -> pa.Table:
        # arrow %S always appends the fractional part for sub-second types →
        # format then slice to seconds precision (matches DuckDB strftime)
        full = pc.strftime(t["ts"], format="%Y-%m-%d %H:%M:%S")
        return pa.table(
            {
                "event_id": t["event_id"],
                "ts_str": pc.utf8_slice_codeunits(full, 0, 19),
                "day": pc.strftime(t["ts"], format="%Y-%m-%d"),
                "value_cents": _cents(t["value"]),
            }
        )

    return ds.map_batches(apply, batch_format="pyarrow")


def colocated_orders_customer(sf_dir: str):
    """Storage-partitioned join (raydatax.colocated): orders and customer
    are each hash-bucket-exported ONCE on the join key (the only shuffle),
    then joined bucket-by-bucket with zero exchange — the Hive bucketed /
    Iceberg storage-partitioned join pattern for repeated 100-TB joins.
    Output: one row per order with its customer's segment, price in exact
    integer cents (`_cents` SQL-twin discipline)."""
    import shutil

    from .colocated import colocated_join, write_bucketed

    da = _scratch("raydatax_bkt_orders", sf_dir)
    db = _scratch("raydatax_bkt_customer", sf_dir)
    shutil.rmtree(da, ignore_errors=True)
    shutil.rmtree(db, ignore_errors=True)
    write_bucketed(
        rd.read_parquet(_p(sf_dir, "orders"),
                        columns=["o_orderkey", "o_custkey", "o_totalprice"]),
        da, "o_custkey", buckets=16,
    )
    write_bucketed(
        rd.read_parquet(_p(sf_dir, "customer"),
                        columns=["c_custkey", "c_mktsegment"]),
        db, "c_custkey", buckets=16,
    )
    j = colocated_join(da, db, "o_custkey", "c_custkey")

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "c_mktsegment": t["c_mktsegment"],
            "price_cents": _cents(t["o_totalprice"]),
        })

    return j.map_batches(fin, batch_format="pyarrow").sort("o_orderkey")


def events_group_kfold(sf_dir: str, k: int = 5):
    """Leakage-safe GROUP k-fold assignment: every event of a user lands in
    the same fold (fold = mix64(user_id) % k — the engine's avalanche
    finalizer, deterministic across runs/partitionings/engines, zero
    shuffle for the assignment itself).  Output: per-fold row count and
    distinct-user count — the split manifest a training run records."""
    from .partition import hash_ints
    from .relational import preagg_groupby

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "user_id"])

    def tag(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        fold = (hash_ints(u) % np.uint64(k)).astype(np.int64)
        return pa.table({"fold": pa.array(fold), "user_id": t["user_id"]})

    per_user = preagg_groupby(
        ds.map_batches(tag, batch_format="pyarrow"),
        ["fold", "user_id"], [("user_id", "count", "n")],
    )
    out = preagg_groupby(
        per_user, ["fold"],
        [("n", "sum", "n_rows"), ("user_id", "count", "n_users")],
    )
    return out.map_batches(
        lambda t: pa.table({
            "fold": t["fold"],
            "n_rows": pc.cast(t["n_rows"], pa.int64()),
            "n_users": pc.cast(t["n_users"], pa.int64()),
        }),
        batch_format="pyarrow",
    ).sort("fold")


def events_window_dedup(sf_dir: str):
    """Windowed stream dedup: collapse repeats of (user, event_type) inside
    each tumbling hour to one logical event — first event id wins, the
    repeat count is kept (the keep-first analogue of the CDC LWW rule at
    the event level).  One pre-aggregated groupby; no per-row state."""
    from .relational import preagg_groupby

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts"]
    )

    def win(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table({
            "user_id": t["user_id"], "event_type": t["event_type"],
            "window_start": hour, "event_id": t["event_id"],
        })

    out = preagg_groupby(
        ds.map_batches(win, batch_format="pyarrow"),
        ["user_id", "event_type", "window_start"],
        [("event_id", "min", "first_event_id"), ("event_id", "count", "n_dups")],
    )
    return out.map_batches(
        lambda t: pa.table({
            "user_id": t["user_id"], "event_type": t["event_type"],
            "window_start": t["window_start"],
            "first_event_id": pc.cast(t["first_event_id"], pa.int64()),
            "n_dups": pc.cast(t["n_dups"], pa.int64()),
        }),
        batch_format="pyarrow",
    ).sort(["user_id", "event_type", "window_start"])


def colocated_custkey_stats(sf_dir: str):
    """Zero-shuffle aggregation over the bucketed layout
    (colocated.colocated_group_agg): orders are bucket-exported once on
    o_custkey (price pre-snapped to exact integer cents so the grouped
    sums are associative), then per-customer order count + revenue
    aggregate inside each bucket with NO exchange — the layout's second
    consumer after the join."""
    import shutil

    from .colocated import colocated_group_agg, write_bucketed

    d = _scratch("raydatax_bkt_ostats", sf_dir)
    shutil.rmtree(d, ignore_errors=True)
    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table({
            "o_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"],
            "price_cents": _cents(t["o_totalprice"]),
        }),
        batch_format="pyarrow",
    )
    write_bucketed(orders, d, "o_custkey", buckets=16)
    out = colocated_group_agg(d, [
        ("o_orderkey", "count", "n_orders"),
        ("price_cents", "sum", "sum_cents"),
    ])
    return out.map_batches(
        lambda t: pa.table({
            "o_custkey": t["o_custkey"],
            "n_orders": pc.cast(t["n_orders"], pa.int64()),
            "sum_cents": pc.cast(t["sum_cents"], pa.int64()),
        }),
        batch_format="pyarrow",
    ).sort("o_custkey")


def skew_salted_join(sf_dir: str):
    """Planted-skew LARGE-LARGE join through relational.skew_join: ~30% of
    lineitem rows collapse onto ONE derived hot key (l_orderkey % 10 < 3
    -> key 1), so a raw hash-partitioned join would ship ~30% of the fact
    table to a single partition.  skew_join detects the hot key from
    bounded per-batch truncated counts, salts its fact rows across 8
    sub-keys, replicates the matching dimension rows across the salts and
    joins on (k, __s) — the key-shuffle analogue of the reference's task/
    resource rebalancing (/root/reference/core/.../container/util/
    JobAssignUtil.java:20-57).  The right side is the per-key orders
    rollup (key 1 aggregates ~30% of orders into one row), so every key is
    unique on the right and the output is exactly one row per lineitem.
    Money flows as pre-snapped integer cents, so sums hash cross-engine."""
    from .relational import preagg_groupby, skew_join

    left = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_quantity", "l_extendedprice"],
    ).map_batches(
        lambda t: pa.table({
            "k": pc.if_else(
                pc.less(_mod10(t["l_orderkey"]), 3),
                pa.scalar(1, pa.int64()), t["l_orderkey"],
            ),
            "l_qty_cents": _cents(t["l_quantity"]),
            "l_price_cents": _cents(t["l_extendedprice"]),
        }),
        batch_format="pyarrow",
    )
    right = preagg_groupby(
        rd.read_parquet(
            _p(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"]
        ).map_batches(
            lambda t: pa.table({
                "k": pc.if_else(
                    pc.less(_mod10(t["o_orderkey"]), 3),
                    pa.scalar(1, pa.int64()), t["o_orderkey"],
                ),
                "price_cents": _cents(t["o_totalprice"]),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }),
            batch_format="pyarrow",
        ),
        ["k"],
        [("one", "sum", "o_cnt"), ("price_cents", "sum", "o_total_cents")],
    )
    out = skew_join(left, right, "k", join_type="inner", salts=8,
                    hot_share=0.05)
    return out.map_batches(
        lambda t: t.select(
            ["k", "l_qty_cents", "l_price_cents", "o_cnt", "o_total_cents"]
        ),
        batch_format="pyarrow",
    )


def _mod10(col: "pa.Array | pa.ChunkedArray"):
    """l_orderkey % 10 as an Arrow kernel (no Python per row)."""
    return pc.subtract(
        col, pc.multiply(pc.divide(col, pa.scalar(10, pa.int64())),
                         pa.scalar(10, pa.int64()))
    )


def colocated_user_type_join(sf_dir: str):
    """COMPOSITE-key storage-partitioned join (colocated.colocated_join
    over a (user_id:int64, event_type:string) bucket tuple): the events
    table and its per-(user, type) rollup are exported bucketed on the
    SAME ordered key tuple (per-column mix64 hashes polynomial-combined),
    then every event row joins its group's stats bucket-locally with zero
    exchange — the composite-key variant of colocated_orders_customer.
    Money pre-snaps to integer cents so sums hash cross-engine."""
    import shutil

    from .colocated import colocated_join, write_bucketed
    from .relational import preagg_groupby

    da = _scratch("raydatax_bkt_events_ut", sf_dir)
    db = _scratch("raydatax_bkt_utstats", sf_dir)
    shutil.rmtree(da, ignore_errors=True)
    shutil.rmtree(db, ignore_errors=True)
    ev = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["event_id", "user_id", "event_type", "value"],
    ).map_batches(
        lambda t: pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "event_type": t["event_type"],
            "value_cents": _cents(t["value"]),
        }),
        batch_format="pyarrow",
    )
    stats = preagg_groupby(
        ev.map_batches(
            lambda t: t.append_column(
                "one", pa.array(np.ones(t.num_rows, np.int64))
            ),
            batch_format="pyarrow",
        ),
        ["user_id", "event_type"],
        [("one", "sum", "n_events"), ("value_cents", "sum", "sum_cents")],
    )
    write_bucketed(ev, da, ["user_id", "event_type"], buckets=16)
    write_bucketed(stats, db, ["user_id", "event_type"], buckets=16)
    out = colocated_join(da, db, ["user_id", "event_type"])
    return out.map_batches(
        lambda t: t.select(
            ["event_id", "user_id", "event_type", "value_cents",
             "n_events", "sum_cents"]
        ),
        batch_format="pyarrow",
    )


def csv_lzo_roundtrip(sf_dir: str):
    """CSV ``compress: lzo`` parity (the reference's unstructured-storage
    codec knob, UnstructuredStorageReaderUtil.java:103-251): events are
    exported WORKER-SIDE as lzop-compressed CSV shards — one ``.csv.lzo``
    per block, encoded by the pure-Python LZO1X codec (raydatax/lzo.py) —
    then read back through the whole-file magic-sniffing codec path and
    aggregated per event_type.  All-integer payload so the text roundtrip
    is exact; the driver only ever holds the shard path list."""
    import io
    import shutil
    import uuid

    import pyarrow.csv as pacsv

    from .lzo import lzop_compress_bytes
    from .sources import ColumnEntry, read_csv_datax

    out = _scratch("raydatax_lzocsv", sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["event_id", "user_id", "event_type"])

    def dump(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string())})
        buf = io.BytesIO()
        pacsv.write_csv(t, buf,
                        write_options=pacsv.WriteOptions(include_header=False))
        name = os.path.join(out, f"part-{uuid.uuid4().hex}.csv.lzo")
        tmp = name + ".tmp"
        with open(tmp, "wb") as f:
            f.write(lzop_compress_bytes(buf.getvalue()))
        os.replace(tmp, name)
        return pa.table({"path": [name]})

    paths = [r["path"] for r in
             ds.map_batches(dump, batch_format="pyarrow").take_all()]
    spec = [ColumnEntry(index=0, type="long", name="event_id"),
            ColumnEntry(index=1, type="long", name="user_id"),
            ColumnEntry(index=2, type="string", name="event_type")]
    back = read_csv_datax(paths, spec)
    return preagg_groupby(
        back, ["event_type"],
        [("event_id", "count", "n_events"),
         ("user_id", "sum", "sum_uid"),
         ("event_id", "max", "max_eid")],
    )
