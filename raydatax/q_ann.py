"""Embedding family queries: ANN (brute/IVF/PQ), k-means, embedding
near-dup + semantic dedup, multimodal features, incremental index probes.

Split out of the former monolithic pipelines.py (round-3 verdict item 5);
the registry (QUERIES / ORACLE_SQL) stays in :mod:`raydatax.pipelines`.
"""


import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .ann import brute_force_topk, ivf_topk
from .relational import (
    broadcast_join,
    preagg_groupby,
)

from .q_common import (
    _crawl_split,
    _p,
    _round,
)


# --------------------------------------------------------------------- ANN


def _queries_table(sf_dir: str, n: int = 3) -> pa.Table:
    """Query vectors via a predicate-pushed parquet read: only row groups
    whose vec_id stats overlap [0, n) leave storage (never the whole
    embeddings table — the table is the 100-TB side of this lookup)."""
    import pyarrow.parquet as pq

    e = pq.read_table(_p(sf_dir, "embeddings"), filters=[("vec_id", "<", n)])
    return e.filter(pc.less(e["vec_id"], n))


def ann_cosine_topk(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "embeddings"))
    out = brute_force_topk(ds, _queries_table(sf_dir), k=10)
    return out.select(["query_id", "rank", "neighbor_id"])


def ann_ivf(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "embeddings"))
    out = ivf_topk(ds, _queries_table(sf_dir), k=10, n_clusters=16, nprobe=4)
    return out.select(["query_id", "rank", "neighbor_id"])


def ann_pq_verified(sf_dir: str):
    """PQ-ADC search + exact rerank (ann.pq_topk): vectors scored as uint8
    codes against per-query lookup tables, per-batch partial shortlists,
    then the union shortlist's TRUE vectors rescored with exact cosine —
    the production compress-then-rerank layout.  The rerank makes the
    output exact whenever the true top-k survives the shortlist, which is
    what puts a quantized index under the same SQL hash gate as brute
    force (the approx_users_hll_verified pattern for ANN)."""
    from .ann import pq_topk

    ds = rd.read_parquet(_p(sf_dir, "embeddings"))
    out = pq_topk(
        ds, _queries_table(sf_dir), k=10, m_sub=32, n_codes=256, shortlist=64
    )
    return out.select(["query_id", "rank", "neighbor_id"])


def multimodal_features(sf_dir: str):
    """Binary-column decode + feature plumbing, SQL-oracled: media payloads
    are derived deterministically from the documents table (RDXM container
    wrapping the doc's utf-8 bytes, header fields pure functions of doc_id —
    see multimodal.media_from_documents), so the decode stage's outputs —
    parsed header fields AND the decoded blob's byte length — are
    recomputable in DuckDB from the source table."""
    from .multimodal import DecodeMedia, MediaFeatures, media_from_documents

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    media = docs.map_batches(media_from_documents, batch_format="pyarrow")
    out = (
        media.map_batches(DecodeMedia, batch_format="pyarrow", batch_size=64, concurrency=(1, 4))
        .map_batches(MediaFeatures, batch_format="pyarrow", batch_size=64, concurrency=(1, 4))
    )
    return out.select_columns(
        ["media_id", "dec_kind", "decoded_ok", "dec_width", "dec_height", "dec_bytes"]
    )


def events_stratified_sample(sf_dir: str):
    """Per-stratum deterministic sampling (relational.stratified_sample):
    keep all purchases, 20% of clicks, 5% of views, drop the rest — the
    corpus-mixing keep-rule, reproducible in SQL via a CASE over the same
    integer formula."""
    from .relational import stratified_sample

    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["event_id", "event_type", "user_id"])
    return stratified_sample(
        ds, key="event_id", strata_col="event_type",
        permille={"purchase": 1000, "click": 200, "view": 50},
    )


def embedding_components(sf_dir: str):
    """Generic list-column unnest (relational.explode_list) over the
    embeddings table: one row per (vec_id, pos, component), with the
    component scale-floored to an exact integer — float32→float64 widening
    is exact in both engines, so the int is cross-engine identical (raw
    float32 strings are NOT: pandas prints the float32, DuckDB the
    widened float64)."""
    from .relational import explode_list

    ds = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def apply(t: pa.Table) -> pa.Table:
        e = explode_list(t, "embedding", pos_col="pos", out="comp")
        milli = pc.cast(
            pc.floor(pc.add(pc.multiply(pc.cast(e["comp"], pa.float64()), 1000.0), 0.5)),
            pa.int64(),
        )
        return pa.table({"vec_id": e["vec_id"], "pos": e["pos"], "comp_milli": milli})

    return ds.map_batches(apply, batch_format="pyarrow")


def revenue_by_segment(sf_dir: str):
    """Both-sides-large distributed hash join chain (lineitem ⋈ orders ⋈
    customer — the join the reference cannot express at all), then a
    pre-aggregated rollup by market segment."""
    from .relational import hash_join

    li = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    ords = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])

    ords = ords.map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_custkey"]), batch_format="pyarrow"
    )
    cust = cust.map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_mktsegment"]), batch_format="pyarrow"
    )
    j1 = hash_join(li, ords, on="l_orderkey", num_partitions=16)
    # the customer side is the dimension table — broadcast it under a
    # metadata-counted threshold instead of shuffling the joined fact rows
    # through a second exchange (also avoids chaining a Dataset.join off a
    # join output, which crashes on empty hash partitions)
    cust = cust.materialize()
    if cust.count() <= 2_000_000:
        from .relational import _fetch_partials, broadcast_join

        tabs = [t for t in _fetch_partials(cust.to_arrow_refs()) if t.num_rows]
        if not tabs:  # pa.concat_tables([]) raises; an empty dim is a
            sch = cust.schema().base_schema  # legal (fully filtered) input
            tabs = [sch.empty_table()]
        j2 = broadcast_join(j1, pa.concat_tables(tabs), "o_custkey")
    else:
        j2 = hash_join(j1, cust, on="o_custkey", num_partitions=16)

    def add_rev(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("rev", rev)

    out = preagg_groupby(
        j2.map_batches(add_rev, batch_format="pyarrow"),
        ["c_mktsegment"],
        [("rev", "count", "n_items"), ("rev", "sum", "revenue")],
    )
    return out.map_batches(lambda t: _round(t, {"revenue": 2}), batch_format="pyarrow")


def orders_by_status(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderstatus", "o_totalprice"])
    out = preagg_groupby(
        ds, ["o_orderstatus"],
        [("o_totalprice", "count", "n_orders"), ("o_totalprice", "sum", "sum_total")],
    )
    return out.map_batches(lambda t: _round(t, {"sum_total": 2}), batch_format="pyarrow")


def part_type_stats(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "part"), columns=["p_type", "p_size"])
    return preagg_groupby(
        ds, ["p_type"],
        [("p_size", "min", "min_size"), ("p_size", "max", "max_size"),
         ("p_size", "count", "n_parts")],
    )


def events_daily_users(sf_dir: str):
    """COUNT(DISTINCT) at scale: dedupe to (day, user) pairs with in-batch
    hash aggregation first, then count pairs per day — the shuffle moves one
    row per distinct pair per batch, never raw events."""
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])

    def add_day(t: pa.Table) -> pa.Table:
        return pa.table({"day": pc.strftime(t["ts"], format="%Y-%m-%d"),
                         "user_id": t["user_id"]})

    pairs = preagg_groupby(
        ds.map_batches(add_day, batch_format="pyarrow"),
        ["day", "user_id"], [("user_id", "count", "c")],
    )
    return preagg_groupby(pairs, ["day"], [("user_id", "count", "n_users")])


def value_percentiles(sf_dir: str):
    """Size-adaptive per-group percentiles: exact sorted-group path (==
    SQL quantile_cont, keeps the oracle hash-green) under the row
    threshold, two-phase fixed-bin histogram above it (see
    relational.grouped_percentiles)."""
    from .relational import grouped_percentiles

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "value"])
    out = grouped_percentiles(ds, "event_type", "value",
                              [("p50", 0.5), ("p95", 0.95)])
    return out.map_batches(lambda t: _round(t, {"p50": 6, "p95": 6}), batch_format="pyarrow")


def events_value_outliers(sf_dir: str):
    """Tukey-fence data cleaning (relational.iqr_outliers): events whose
    value falls outside [q1 − 1.5·IQR, q3 + 1.5·IQR] of their event type.
    Quartiles snap to micro precision before the fence arithmetic, so SQL
    computing the same rounded quantile_cont and fences keeps the row set
    exactly equal."""
    from .relational import iqr_outliers

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )
    return iqr_outliers(ds, "event_type", "value")


def dedup_embedding_exact(sf_dir: str):
    """Exact cosine-threshold self-join (blocked block-pair tasks — see
    dedup.embedding_allpairs_exact), SQL-oracled against DuckDB's
    list_cosine_similarity over all pairs.  The verified baseline the
    approximate clustered variant (dedup_embedding) is measured against."""
    from .dedup import embedding_allpairs_exact

    ds = rd.read_parquet(_p(sf_dir, "embeddings"))
    pairs = embedding_allpairs_exact(ds, threshold=0.35, block_rows=256)
    return pairs.select(["a", "b"])


def dedup_embedding(sf_dir: str):
    from .dedup import embedding_neardup_pairs

    ds = rd.read_parquet(_p(sf_dir, "embeddings"))
    # random testdata embeddings: cosine ~ N(0, 1/sqrt(64)); 0.35 ≈ 2.8σ so a
    # small deterministic pair set survives (real corpora would use ~0.95)
    pairs = embedding_neardup_pairs(ds, threshold=0.35)
    return pairs.select_columns(["a", "b"])


def embedding_kmeans(sf_dir: str):
    """Distributed Lloyd's k-means (ann.kmeans_fit, k=4, 2 rounds seeded
    from the 4 smallest vec_ids): centroids re-snap to micro precision
    between rounds, making the whole loop engine-independent — the SQL
    twin unrolls both rounds (assignment = squared-L2 argmin with
    lowest-cluster tie-break, update = per-cluster mean) and must land on
    identical centroids and member counts."""
    from .ann import kmeans_fit_distributed

    ds = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    cent, counts = kmeans_fit_distributed(ds, k=4, iters=2)
    # the SQL twin's final CTE joins centroids to the last assignment's
    # counts, so a cluster emptied mid-run never appears there — drop
    # zero-count rows to keep the row sets identical
    nz = counts > 0
    cent, counts = cent[nz], counts[nz]
    cluster_ids = np.arange(len(nz), dtype=np.int64)[nz]
    k, d = cent.shape
    micro = np.floor(cent * 1e6 + 0.5).astype(np.int64)
    return pa.table({
        "cluster": pa.array(np.repeat(cluster_ids, d)),
        "pos": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), k)),
        "comp_micro": pa.array(micro.ravel()),
        "n": pa.array(np.repeat(counts, d)),
    })


def semantic_dedup_vecs(sf_dir: str):
    """Semantic dedup, dominance rule (dedup.semantic_dedup_keep): drop
    every vector with a cosine-≥0.35 partner of smaller id, keep the
    rest — the SQL-expressible rule (the kept set contains no near-dup
    pair; on chains it over-deletes vs SemDeDup's keep-first, which
    rule='greedy' provides and tests pin).  Pairs from the exact
    baseline; survivors via the adaptive anti semi join."""
    from .dedup import semantic_dedup_keep

    ds = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return semantic_dedup_keep(ds, threshold=0.35, block_rows=256)


def incremental_embedding_exact(sf_dir: str):
    """Incremental embedding near-dup under the exact-SQL gate: the prior
    crawl (vec_id % 3 == 0) seeds the persistent IVF index, the new
    crawl's pairs against index ∪ itself are computed EXACTLY (blocked
    block-pair Ray tasks — old–old blocks never scored;
    dedup.incremental_embedding_exact_pairs, the verification baseline of
    the IVF-probed incremental path).  Oracle: DuckDB
    list_cosine_similarity over every pair not wholly in the prior crawl."""
    import shutil

    from .dedup import embedding_index_add, incremental_embedding_exact_pairs

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    idx = f"/tmp/raydatax_ivf_idx_{tag}"
    shutil.rmtree(idx, ignore_errors=True)

    vecs = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    embedding_index_add(_crawl_split(vecs, "vec_id", True), idx)
    pairs = incremental_embedding_exact_pairs(
        _crawl_split(vecs, "vec_id", False), idx, threshold=0.35, block_rows=256
    )
    return pairs.select(["a", "b"])


def incremental_minhash_verified(sf_dir: str):
    """The INCREMENTAL LSH path under the exact-SQL gate: the prior crawl
    (doc_id % 3 == 0) is indexed (dedup.minhash_index_add), the new crawl
    probes the persistent index (incremental_minhash_pairs — index band
    rows move only where a new band hash lands, old–old pairs never
    generated), and every candidate is exact-verified with char-5-gram
    Jaccard at 0.6.  The oracle computes ALL cross/new pairs with exact
    Jaccard ≥ 0.6 in DuckDB — green certifies precision exactly and, at
    this corpus scale, recall of the probe path."""
    import shutil

    from .dedup import (
        incremental_minhash_pairs,
        minhash_index_add,
        ngram_jaccard_verify,
    )

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    idx = f"/tmp/raydatax_lsh_idx_{tag}"
    shutil.rmtree(idx, ignore_errors=True)

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    minhash_index_add(_crawl_split(docs, "doc_id", True), idx)
    cand = incremental_minhash_pairs(
        _crawl_split(docs, "doc_id", False), idx, threshold=0.6
    )
    ver = ngram_jaccard_verify(docs, cand.select_columns(["a", "b"]), k=5)
    kept = ver.map_batches(
        lambda t: t.filter(pc.greater_equal(t["jaccard"], 0.6)),
        batch_format="pyarrow",
    )
    return kept.sort(["a", "b"])


def incremental_dedup(sf_dir: str):
    """CROSS-CORPUS incremental dedup — the steady-state loop of a
    continuously ingested crawl: the prior crawl (doc_id % 3 == 0) seeds a
    persistent key index, the new crawl (the rest) is dedup'd against the
    index (adaptive anti semi join) and within itself (min id wins).
    Parity key = substr(lower(text), 1, 20), the same SQL-expressible
    content key as dedup_exact_prefix (the operator's default key is the
    64-bit rolling fingerprint — dedup.incremental_exact_dedup)."""
    import shutil

    from .dedup import incremental_exact_dedup

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    idx = f"/tmp/raydatax_dedup_idx_{tag}"
    shutil.rmtree(idx, ignore_errors=True)

    def prefix_key(t: pa.Table) -> pa.Table:
        k = pc.utf8_slice_codeunits(pc.utf8_lower(t["text"]), 0, 20)
        return pa.table({"doc_id": t["doc_id"], "__k": k})

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    prior = _crawl_split(docs, "doc_id", True)
    new = _crawl_split(docs, "doc_id", False)
    incremental_exact_dedup(prior, idx, key_fn=prefix_key)  # seeds epoch-0
    return incremental_exact_dedup(new, idx, key_fn=prefix_key, update_index=False)
