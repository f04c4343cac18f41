"""Window / sampling / sketch family queries: tumbling-hopping-session
windows, window functions, rollup/cube/pivot, HLL/CMS/heavy hitters,
sampling and split exports.

Split out of the former monolithic pipelines.py (round-3 verdict item 5);
the registry (QUERIES / ORACLE_SQL) stays in :mod:`raydatax.pipelines`.
"""


import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .relational import (
    broadcast_join,
    preagg_groupby,
    sessionize,
    tumbling_window,
)

from .q_cdc import transcript_cdc_replay
from .q_common import (
    _cents,
    _p,
    _round,
)


# ------------------------------------------------------------------ windows


def events_props_json(sf_dir: str):
    """JSON payload extraction (transforms.JsonExtract actor pool): parse
    the props column's JSON, pull $.k, aggregate sum/count per event
    type — the semi-structured step every log pipeline runs.  Extracted
    values are strings (the json_extract_string contract), cast before
    the aggregate."""
    from .relational import preagg_groupby
    from .transforms import JsonExtract

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "props"])
    parsed = ds.map_batches(
        JsonExtract,
        fn_constructor_kwargs={"column": "props", "paths": {"k_str": "k"}},
        batch_format="pyarrow", concurrency=(1, 8),
    )

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "k": pc.cast(t["k_str"], pa.int64()),
        })

    return preagg_groupby(
        parsed.map_batches(cast, batch_format="pyarrow"),
        ["event_type"], [("k", "sum", "k_sum"), ("k", "count", "n")],
    )


def events_hourly(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts", "value"])
    out = tumbling_window(ds, "user_id", "ts", "hour",
                          [("value", "count", "n_events"), ("value", "sum", "sum_value")])
    return out.map_batches(lambda t: _round(t, {"sum_value": 2}), batch_format="pyarrow")


def user_sessions(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])
    return sessionize(ds, "user_id", "ts", 30)


def asof_latest_purchase(sf_dir: str):
    """As-of (backward) join — for every click/view, the user's latest
    purchase at-or-before it (relational.asof_join: union + one hash
    exchange + sorted vectorized scan; DuckDB mirrors it with ASOF LEFT
    JOIN).  (user_id, ts) is unique in the testdata, the asof uniqueness
    contract."""
    from .relational import asof_join

    left = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["event_id", "ts", "user_id", "value"],
        filter=pc.field("event_type").isin(["click", "view"]),
    )
    right = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["event_id", "ts", "user_id", "value"],
        filter=pc.field("event_type") == "purchase",
    ).map_batches(
        lambda t: pa.table(
            {"user_id": t["user_id"], "ts": t["ts"],
             "purchase_id": t["event_id"], "purchase_value": t["value"]}
        ),
        batch_format="pyarrow",
    )
    out = asof_join(left, right, key="user_id", ts_col="ts", num_partitions=16)
    return out.select_columns(["event_id", "user_id", "value", "purchase_id", "purchase_value"])


def lineitem_measures_melt(sf_dir: str):
    """Unpivot (melt) the four lineitem measures to long form, then roll
    up per measure — relational.melt is batch-local (no shuffle); only the
    tiny per-measure partials move.  Integer-cents sums for order-exact
    SQL parity (oracle: UNION ALL unpivot)."""
    from .relational import melt, preagg_groupby

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = rd.read_parquet(_p(sf_dir, "lineitem"), columns=["l_orderkey"] + cols)
    long = melt(ds, ["l_orderkey"], cols, var_name="measure", value_name="v")
    with_cents = long.map_batches(
        lambda t: t.append_column("cents", _cents(t["v"])), batch_format="pyarrow"
    )
    return preagg_groupby(
        with_cents, ["measure"],
        [("v", "count", "n_rows"), ("cents", "sum", "sum_cents")],
    )


def events_value_pivot(sf_dir: str):
    """Pivot (long → wide): per user, the summed event value by event type
    as one column per type — conditional aggregation inside map_batches,
    then ONE pre-aggregated groupby of partials (relational.pivot)."""
    from .relational import pivot

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type", "value"])
    with_cents = ds.map_batches(
        lambda t: pa.table({
            "user_id": t["user_id"], "event_type": t["event_type"],
            "cents": _cents(t["value"]),
        }),
        batch_format="pyarrow",
    )
    return pivot(
        with_cents, key="user_id", pivot_col="event_type", value_col="cents",
        values=["click", "view", "purchase"], agg="sum",
    )


def events_value_stats(sf_dir: str):
    """Distributed moments — per event type: count, exact-cents sum, mean,
    sample variance and stddev, all from one pass of mergeable
    (count, sum, sum-of-squares) partials (relational.grouped_stats).
    Integer partials make the derived IEEE expression reproducible
    bit-for-bit against SQL computing the same formula."""
    from .relational import grouped_stats

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "value"])
    with_cents = ds.map_batches(
        lambda t: pa.table({"event_type": t["event_type"], "cents": _cents(t["value"])}),
        batch_format="pyarrow",
    )
    return grouped_stats(
        with_cents, ["event_type"], "cents",
        n_name="n_rows", sum_name="sum_cents", mean_name="mean_cents",
        var_name="var_cents", std_name="std_cents",
    )


def value_bucket_counts(sf_dir: str):
    """Theta join via broadcast cross join + filter
    (relational.cross_join_broadcast): every event matched against a small
    bucket-bounds table (lo ≤ cents < hi), counted per bucket — the
    non-equi-join pattern hash joins can't express, with zero shuffle for
    the join itself."""
    from .relational import cross_join_broadcast, preagg_groupby

    buckets = pa.table({
        "bucket": ["low", "mid", "high"],
        "lo": pa.array([0, 1000, 10000], pa.int64()),
        "hi": pa.array([1000, 10000, 1_000_000_000], pa.int64()),
    })
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["value"])
    with_cents = ds.map_batches(
        lambda t: pa.table({"cents": _cents(t["value"])}), batch_format="pyarrow"
    )
    crossed = cross_join_broadcast(with_cents, buckets)
    matched = crossed.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t["cents"], t["lo"]), pc.less(t["cents"], t["hi"])
        )),
        batch_format="pyarrow",
    )
    return preagg_groupby(matched, ["bucket"], [("cents", "count", "n")])


def busy_users(sf_dir: str):
    """GROUP BY ... HAVING: users with more than 60 events and their event
    count + exact-cents total — a post-aggregation filter on the (tiny)
    grouped result, so the predicate costs nothing at scale."""
    from .relational import preagg_groupby

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "value"])
    with_cents = ds.map_batches(
        lambda t: pa.table({"user_id": t["user_id"], "cents": _cents(t["value"])}),
        batch_format="pyarrow",
    )
    agg = preagg_groupby(
        with_cents, ["user_id"],
        [("cents", "count", "n_events"), ("cents", "sum", "total_cents")],
    )
    return agg.map_batches(
        lambda t: t.filter(pc.greater(t["n_events"], 60)), batch_format="pyarrow"
    )


def top_terms_heavy_hitters(sf_dir: str):
    """Heavy-hitters summary over the tokenized corpus
    (relational.heavy_hitters): per-batch top-capacity exact counts,
    groupby-sum merge, bounded global top-k.  The corpus vocabulary fits
    the summary capacity, so counts here are exact and the SQL gate
    certifies them; the truncated regime's undercount bound is
    pytest-pinned separately."""
    from .relational import heavy_hitters
    from .text import tokenize_batch

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    terms = ds.map_batches(
        lambda t: tokenize_batch(t), batch_format="pyarrow"
    ).select_columns(["term"])
    return heavy_hitters(terms, "term", k=10, capacity=64)


def favorite_event_type(sf_dir: str):
    """Per-group mode with a deterministic tie-break: each user's most
    frequent event type (count DESC, type ASC) — composed entirely from
    existing operators: pre-aggregated (user, type) counts, then
    grouped_topk n=1 over the tiny count table."""
    from .relational import grouped_topk, preagg_groupby

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type"])
    counts = preagg_groupby(
        ds, ["user_id", "event_type"], [("event_type", "count", "n")]
    )
    top = grouped_topk(
        counts, "user_id", [("n", "descending"), ("event_type", "ascending")], 1
    )
    return top.select_columns(["user_id", "event_type", "n"])


def bloom_filtered_revenue(sf_dir: str):
    """EXACT semi join with a Bloom pre-filter (relational.bloom_semi_join):
    fulfilled-order line items kept by testing a broadcast ~1.5-byte/key
    bitmap per batch BEFORE any exchange, false positives removed by the
    adaptive exact semi join on the survivors — identical output to the
    plain semi join, probe volume into the shuffle cut at the source."""
    from .relational import bloom_semi_join, preagg_groupby

    li = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_returnflag", "l_extendedprice"],
    ).map_batches(
        lambda t: pa.table({
            "l_orderkey": t["l_orderkey"], "l_returnflag": t["l_returnflag"],
            "cents": _cents(t["l_extendedprice"]),
        }),
        batch_format="pyarrow",
    )
    fulfilled = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderkey"],
        filter=pc.field("o_orderstatus") == "F",
    )
    kept = bloom_semi_join(li, fulfilled, "l_orderkey", "o_orderkey")
    return preagg_groupby(
        kept, ["l_returnflag"],
        [("cents", "count", "n_items"), ("cents", "sum", "revenue_cents")],
    )


def tfidf_terms(sf_dir: str):
    """Corpus TF-IDF top-5 terms per document (text.tfidf_top_terms):
    tokenize → pre-aggregated (doc, term) counts → document frequency →
    term join → tf·ln(N/df) → per-doc top-k with a total order.  The
    whole chain is SQL-expressible, so it runs under the exact gate."""
    from .text import tfidf_top_terms

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return tfidf_top_terms(ds, k=5)


def lineitem_qty_price_corr(sf_dir: str):
    """Per-flag covariance + Pearson correlation of quantity vs extended
    price — relational.grouped_corr's one-pass mergeable bivariate partials
    (count, Σx, Σy, Σx², Σy², Σxy); integer inputs keep the merged sums
    exact so the derived doubles match SQL computing the same formula."""
    from .relational import grouped_corr

    ds = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def ints(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "x": pc.cast(pc.floor(pc.add(t["l_quantity"], 0.5)), pa.int64()),
            "y": pc.cast(pc.floor(pc.add(t["l_extendedprice"], 0.5)), pa.int64()),
        })

    return grouped_corr(
        ds.map_batches(ints, batch_format="pyarrow"), ["l_returnflag"], "x", "y"
    )


def user_event_paths(sf_dir: str):
    """Grouped ordered concatenation (SQL ``string_agg(... ORDER BY ...)``
    / collect_list) — each user's event-type journey in (ts, event_id)
    order as one path string, via relational.grouped_concat's vectorized
    segment join (one sort + one binary_join kernel per partition)."""
    from .relational import grouped_concat

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["user_id", "event_type", "ts", "event_id"]
    )
    return grouped_concat(
        ds, ["user_id"], "event_type", ["ts", "event_id"],
        sep=">", out_name="path", count_name="n_events",
    )


def transcript_reassembly(sf_dir: str):
    """Flagship extension — the engine-replayed lake reassembled into ONE
    row per conversation: role-prefixed turns joined in turn order
    (collect_list over the LWW winners).  Exercises the full chain
    WAL → exchange → LWW merge → manifest commit → lake read →
    grouped ordered concat, end-to-end under the SQL gate."""
    from .relational import grouped_concat

    lk = transcript_cdc_replay(sf_dir)
    line = pc.binary_join_element_wise(lk["role"], lk["text"], ": ")
    turns = pa.table(
        {"conv_id": lk["conv_id"], "turn_idx": lk["turn_idx"], "line": line}
    )
    return grouped_concat(
        rd.from_arrow(turns), ["conv_id"], "line", ["turn_idx"],
        sep=" | ", out_name="transcript", count_name="n_turns",
    )


def approx_users_hll(sf_dir: str):
    """HyperLogLog approximate count-distinct (mergeable sketch): distinct
    event users estimated from per-batch 16 KB sketches — no key ever
    shuffles.  Approximate by design → rows-only under the gate; accuracy
    (~0.8% standard error) is pinned by pytest against the exact count."""
    from .relational import approx_count_distinct

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id"])
    n = approx_count_distinct(ds, "user_id")
    return pa.table({"approx_users": pa.array([n], pa.int64())})


def approx_users_hll_verified(sf_dir: str):
    """The HLL accuracy contract under the EXACT gate: the sketch estimate
    is compared in-engine against the exact distinct count (pre-aggregated
    groupby — SQL-expressible) and the row carries the exact count plus a
    boolean asserting |est/exact − 1| ≤ 5% (standard error at p=14 is
    ~0.8%; the testdata cardinality sits in the linear-counting regime,
    far from the crossover bias zone).  The SQL twin emits TRUE, so an
    HLL regression past its documented bound hash-FAILS the row.  The
    estimate itself can never be SQL-recomputed — DuckDB's
    approx_count_distinct is a different sketch."""
    from .relational import approx_count_distinct

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id"])
    est = approx_count_distinct(ds, "user_id")
    exact = preagg_groupby(
        ds, ["user_id"], [("user_id", "count", "__n")]
    ).count()
    ok = (abs(est / exact - 1.0) <= 0.05) if exact else est == 0
    return pa.table({"n_exact": pa.array([exact], pa.int64()),
                     "hll_within_5pct": pa.array([ok])})


def daily_users_hll(sf_dir: str):
    """Per-key HLL (grouped mergeable sketch): approximate distinct users
    per day — one 4 KB sketch row per (day, batch) shuffles, never a user
    id.  Approximate by design → rows-only; per-group accuracy is
    pytest-pinned and the exact twin is the oracled events_daily_users."""
    from .relational import grouped_approx_count_distinct

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])
    with_day = ds.map_batches(
        lambda t: pa.table({
            "day": pc.strftime(t["ts"], format="%Y-%m-%d"), "user_id": t["user_id"],
        }),
        batch_format="pyarrow",
    )
    return grouped_approx_count_distinct(
        with_day, ["day"], "user_id", out_name="approx_users"
    )


def events_sample(sf_dir: str):
    """Deterministic (engine-independent) 5% sample of the event stream by
    key hash — relational.deterministic_sample: pure integer arithmetic
    both engines evaluate identically, so the sampled row set is exactly
    reproducible (no RNG, no partitioning dependence)."""
    from .relational import deterministic_sample

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "event_type"]
    )
    return deterministic_sample(ds, "event_id", permille=50)


def events_mixture_sample(sf_dir: str):
    """Corpus-mixing to data-derived rates (relational.mixture_sample):
    sample the event stream DOWN to ≈2000 rows per event type — each
    type's keep-rate is min(10^6, max(1, 10^6·2000 // n_type)) ppm from a
    tiny counting pass, then the batch-local integer-hash keep rule.
    Pure integer arithmetic end-to-end: SQL reproduces membership exactly
    by computing the same counts and the same formula."""
    from .relational import mixture_sample

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "event_type"]
    )
    return mixture_sample(ds, "event_id", "event_type", target_rows=2000)


def events_shuffle_export(sf_dir: str):
    """Deterministic global shuffle to training shards
    (relational.shuffle_export): h = mix64(event_id) orders the corpus
    pseudo-randomly but reproducibly, shard = top 5 bits; one range sort
    clusters the hive shard directories, and the returned per-shard
    manifest (n_rows, min/max hash as decimal strings) is the oracle —
    SQL reproduces mix64 exactly in HUGEINT arithmetic."""
    import shutil

    from .relational import shuffle_export

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "event_type"]
    )
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = f"/tmp/raydatax_shuf_{tag}"
    shutil.rmtree(out, ignore_errors=True)
    return shuffle_export(ds, "event_id", out_dir=out, shard_bits=5)


def events_leakage_split(sf_dir: str):
    """Leakage-safe train/val split (relational.train_val_split): split
    assigned per USER (mix64(user_id) % 1000 < 100 → val), so no user
    straddles the boundary; returns per-(split, event_type) counts.  The
    SQL twin recomputes the identical mix64 in HUGEINT arithmetic."""
    from .relational import preagg_groupby, train_val_split

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "event_type"]
    )
    tagged = train_val_split(ds, "user_id", val_permille=100)
    return preagg_groupby(
        tagged, ["split", "event_type"], [("event_id", "count", "n_rows")]
    )


def events_exact_sample(sf_dir: str):
    """Exactly-N-per-group sampling (relational.grouped_exact_sample):
    precisely 150 events per event_type, chosen by mix64(event_id) rank —
    exact quotas (unlike rate sampling), deterministic and unbiased in
    input order; SQL reproduces the pick with row_number() over the
    bit-exact mix64 replica."""
    from .relational import grouped_exact_sample

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "event_type"]
    )
    return grouped_exact_sample(ds, "event_type", "event_id", n=150)


def event_value_ranks(sf_dir: str):
    """SQL rank()/dense_rank() tie semantics — every event ranked by value
    within its event type, in the same single hash-partitioned sorted scan
    as the other window functions (relational.window_scan ranks=True);
    ties share a rank, dense_rank has no gaps, so the output is
    deterministic even with duplicate values."""
    from .relational import window_scan

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "value"])
    with_cents = ds.map_batches(
        lambda t: pa.table({"event_type": t["event_type"], "cents": _cents(t["value"])}),
        batch_format="pyarrow",
    )
    out = window_scan(with_cents, key="event_type", order_col="cents", ranks=True)
    return out.select_columns(["event_type", "cents", "rank", "dense_rank"]).map_batches(
        lambda t: t.rename_columns(["event_type", "cents", "rnk", "drnk"]),
        batch_format="pyarrow",
    )


def event_value_distribution(sf_dir: str):
    """percent_rank / cume_dist over the value ordering — tie-safe under a
    hash gate because tied rows receive identical ranks and run ends (the
    derived doubles are the same fixed IEEE expression both engines
    evaluate over exact integers)."""
    from .relational import window_scan

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "value"])
    with_cents = ds.map_batches(
        lambda t: pa.table({"event_type": t["event_type"], "cents": _cents(t["value"])}),
        batch_format="pyarrow",
    )
    out = window_scan(with_cents, key="event_type", order_col="cents", pct=True)
    return out.select_columns(
        ["event_type", "cents", "percent_rank", "cume_dist"]
    ).map_batches(
        lambda t: t.rename_columns(["event_type", "cents", "pct_rank", "cume"]),
        batch_format="pyarrow",
    )


def event_stream_lead_tiles(sf_dir: str):
    """lead() and ntile() over a UNIQUE ordering (event_id) so the joint
    per-row assignment is deterministic — window_scan lead_cols + ntile_n
    in the same single sorted scan as everything else."""
    from .relational import window_scan

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_type", "event_id", "value"]
    )
    with_cents = ds.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"], "event_id": t["event_id"],
            "cents": _cents(t["value"]),
        }),
        batch_format="pyarrow",
    )
    out = window_scan(
        with_cents, key="event_type", order_col="event_id",
        lead_cols=["cents"], ntile_n=4, first_last_cols=["cents"],
    )
    return out.select_columns(
        ["event_type", "event_id", "cents", "next_cents", "tile",
         "first_cents", "last_cents"]
    )


def _user_day_side(sf_dir: str, event_type: str):
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type", "ts"])

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], event_type))
        return pa.table(
            {"user_id": t["user_id"], "day": pc.strftime(t["ts"], format="%Y-%m-%d")}
        )

    return ds.map_batches(f, batch_format="pyarrow")


def view_purchase_day_intersect(sf_dir: str):
    """Set op INTERSECT (distinct, multi-column): (user, day) pairs with a
    view AND a purchase — relational.set_distinct: presence flags + one
    pre-aggregated groupby over the row; only distinct partials shuffle."""
    from .relational import set_distinct

    return set_distinct(
        _user_day_side(sf_dir, "view"), _user_day_side(sf_dir, "purchase"), "intersect"
    )


def click_except_purchase_days(sf_dir: str):
    """Set op EXCEPT (distinct): (user, day) pairs with a click but no
    purchase that day — same flag-merge discipline as the intersect."""
    from .relational import set_distinct

    return set_distinct(
        _user_day_side(sf_dir, "click"), _user_day_side(sf_dir, "purchase"), "except"
    )


def purchase_attribution(sf_dir: str):
    """Range (interval) join — every click/view attributed to each purchase
    whose 2-hour attribution window ``[ts, ts + 2h]`` contains it, for the
    same user (relational.range_join: union + one hash exchange + per-
    partition probe-counting scan), then a pre-aggregated rollup per
    purchase.  Integer-cents sums for order-exact SQL parity."""
    from .relational import preagg_groupby, range_join

    TWO_H_US = 2 * 3_600_000_000
    left = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["event_id", "ts", "user_id", "value"],
        filter=pc.field("event_type").isin(["click", "view"]),
    ).map_batches(
        lambda t: t.append_column("cents", _cents(t["value"])).drop_columns(["value"]),
        batch_format="pyarrow",
    )
    right = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["event_id", "ts", "user_id"],
        filter=pc.field("event_type") == "purchase",
    ).map_batches(
        lambda t: pa.table({
            "user_id": t["user_id"],
            "lo": t["ts"],
            "hi": pc.add(t["ts"].cast(pa.int64()), TWO_H_US).cast(t["ts"].type),
            "purchase_id": t["event_id"],
        }),
        batch_format="pyarrow",
    )
    pairs = range_join(
        left, right, key="user_id", ts_col="ts", lo_col="lo", hi_col="hi",
        num_partitions=16,
    )
    return preagg_groupby(
        pairs, ["purchase_id"],
        [("event_id", "count", "n_attributed"), ("cents", "sum", "value_cents")],
    )


def top_events_per_type(sf_dir: str):
    """Grouped top-N (row_number() <= n per key): per-batch partial top-n,
    shuffle ≤ n rows per key per batch, final re-rank per key."""
    from .relational import grouped_topk

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "event_type", "value"])
    out = grouped_topk(
        ds, "event_type", [("value", "descending"), ("event_id", "ascending")], n=3
    )
    return out.select_columns(["event_type", "rank", "event_id", "value"])


def events_hopping(sf_dir: str):
    """Hopping windows (2 h wide, 1 h hop): vectorized in-map fan-out to the
    two containing windows, then the pre-aggregated (key, window) groupby."""
    from .relational import hopping_window

    HOUR_US = 3_600_000_000
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "ts", "value"])
    out = hopping_window(
        ds, "event_type", "ts", size_us=2 * HOUR_US, hop_us=HOUR_US,
        aggs=[("value", "count", "n_events"), ("value", "sum", "sum_value")],
    )
    return out.map_batches(lambda t: _round(t, {"sum_value": 2}), batch_format="pyarrow")


def user_running_totals(sf_dir: str):
    """Per-key ordered window functions (row_number, lag, running sum) in
    one hash-partitioned vectorized scan (relational.window_scan).  The
    running sum runs over integer cents — order-exact in both engines
    (float running sums are accumulation-order-sensitive)."""
    from .relational import window_scan

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "user_id", "value"])

    def add_cents(t: pa.Table) -> pa.Table:
        return t.append_column("cents", _cents(t["value"]))

    out = window_scan(
        ds.map_batches(add_cents, batch_format="pyarrow"),
        key="user_id", order_col="event_id",
        lag_cols=["value"], sum_cols=["cents"], num_partitions=16,
    )
    return out.select_columns(
        ["user_id", "event_id", "value", "rn", "prev_value", "run_cents"]
    )


def user_moving_avg(sf_dir: str):
    """Bounded-frame window aggregate (ROWS BETWEEN 4 PRECEDING AND
    CURRENT ROW) — window_scan's moving_sum, derived from the same single
    cumsum as the running total.  The 5-event moving average is the
    exact-integer moving sum divided by the in-frame row count
    (least(rn, 5)) — bit-identical to SQL avg() over the frame applied to
    integer cents, scaled back to dollars."""
    from .relational import window_scan

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "user_id", "value"])

    def add_cents(t: pa.Table) -> pa.Table:
        return t.append_column("cents", _cents(t["value"]))

    out = window_scan(
        ds.map_batches(add_cents, batch_format="pyarrow"),
        key="user_id", order_col="event_id",
        moving_sum=[("cents", 5)], num_partitions=16,
    )

    def finish(t: pa.Table) -> pa.Table:
        n_win = pc.min_element_wise(t["rn"], pa.scalar(5, pa.int64()))
        avg = pc.divide(
            pc.cast(t["mov_cents_5"], pa.float64()),
            pc.multiply(pc.cast(n_win, pa.float64()), 100.0),
        )
        return pa.table({"user_id": t["user_id"], "event_id": t["event_id"],
                         "mov_sum_cents": t["mov_cents_5"], "mov_avg": avg})

    return out.map_batches(finish, batch_format="pyarrow")


def revenue_rollup_region(sf_dir: str):
    """GROUP BY ROLLUP(region, nation): aggregate the raw table once at the
    finest level, roll coarser levels up from the RESULT (integer-cents sums
    so every level is order-exact vs SQL)."""
    import pyarrow.parquet as pq

    from .relational import rollup_aggregate

    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey", "c_acctbal"])
    nation = pq.read_table(_p(sf_dir, "nation")).rename_columns(["c_nationkey", "n_name", "r_regionkey"])
    region = pq.read_table(_p(sf_dir, "region")).rename_columns(["r_regionkey", "r_name"])
    joined = broadcast_join(cust, nation, "c_nationkey")
    joined = broadcast_join(joined, region, "r_regionkey")

    def add_cents(t: pa.Table) -> pa.Table:
        return t.append_column("cents", _cents(t["c_acctbal"]))

    out = rollup_aggregate(
        joined.map_batches(add_cents, batch_format="pyarrow"),
        ["r_name", "n_name"],
        [("c_custkey", "count", "n_customers"), ("cents", "sum", "acctbal_cents")],
    )
    return out.select_columns(["r_name", "n_name", "n_customers", "acctbal_cents"])


def orders_status_priority_cube(sf_dir: str):
    """GROUP BY CUBE(status, priority) — all four grouping sets
    (relational.cube_aggregate): the raw table aggregates once at the
    finest level, every other set re-aggregates that result;
    integer-cents sums keep all levels order-exact vs SQL."""
    from .relational import cube_aggregate

    ds = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"],
    )

    def add_cents(t: pa.Table) -> pa.Table:
        return t.append_column("cents", _cents(t["o_totalprice"]))

    out = cube_aggregate(
        ds.map_batches(add_cents, batch_format="pyarrow"),
        ["o_orderstatus", "o_orderpriority"],
        [("o_orderkey", "count", "n_orders"), ("cents", "sum", "total_cents")],
    )
    return out.select_columns(
        ["o_orderstatus", "o_orderpriority", "n_orders", "total_cents"]
    )


def events_temperature_sample(sf_dir: str):
    """Temperature-scaled corpus mixing (relational.
    temperature_mixture_sample, α = 0.5): each event type's share of a
    ≈20000-row budget is ∝ sqrt(n_type) — the T5 α-sampling rule that
    flattens head types and boosts tail types.  sqrt is IEEE-correctly-
    rounded, so the micro-snapped weights (and therefore every keep
    decision) reproduce bit-identically in SQL.  Output: kept rows per
    type (the mixture manifest)."""
    from .relational import preagg_groupby, temperature_mixture_sample

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "event_type"]
    )
    kept = temperature_mixture_sample(
        ds, "event_id", "event_type", total_rows=20000, alpha_permille=500
    )
    out = preagg_groupby(kept, ["event_type"], [("event_id", "count", "n_kept")])
    return out.map_batches(
        lambda t: pa.table({"event_type": t["event_type"],
                            "n_kept": pc.cast(t["n_kept"], pa.int64())}),
        batch_format="pyarrow",
    ).sort("event_type")
