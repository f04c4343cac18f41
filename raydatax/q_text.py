"""Text / dedup family queries: token stats, quality, fingerprints,
exact/minhash/simhash dedup, retrieval (BM25, phrase, inverted index),
LM perplexity, packing, document sources.

Split out of the former monolithic pipelines.py (round-3 verdict item 5);
the registry (QUERIES / ORACLE_SQL) stays in :mod:`raydatax.pipelines`.
"""


import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .dedup import minhash_dedup, simhash_pairs
from .relational import (
    lww_latest,
    preagg_groupby,
)
from .text import LangId, fingerprint_md5, token_count

from .q_common import (
    _crawl_split,
    _derived_cdc_wal_table,
    _neighbor_pairs,
    _p,
    _scratch,
)


# ------------------------------------------------------------ text / dedup


def token_stats(sf_dir: str):
    """Whitespace + BPE-ish pre-tokenizer token counts (text.token_count /
    text.bpe_token_count) and character length, all vectorized."""
    from .text import bpe_token_count

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def apply(t: pa.Table) -> pa.Table:
        t = token_count(t)
        t = bpe_token_count(t)
        t = t.append_column("n_chars_calc", pc.cast(pc.utf8_length(t["text"]), pa.int64()))
        return t.select(["doc_id", "n_chars_calc", "n_tokens", "n_bpe_tokens"])

    return ds.map_batches(apply, batch_format="pyarrow")


def quality_ratios(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def apply(t: pa.Table) -> pa.Table:
        n = pc.max_element_wise(pc.cast(pc.utf8_length(t["text"]), pa.float64()), 1.0)
        punct = pc.cast(pc.count_substring_regex(t["text"], r"[.,;:!?]"), pa.float64())
        digit = pc.cast(pc.count_substring_regex(t["text"], r"[0-9]"), pa.float64())
        return pa.table({"doc_id": t["doc_id"],
                         "punct_ratio": pc.divide(punct, n),
                         "digit_ratio": pc.divide(digit, n)})

    return ds.map_batches(apply, batch_format="pyarrow")


def fingerprint(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: fingerprint_md5(t).select(["doc_id", "fp_md5"]), batch_format="pyarrow"
    )


def dedup_exact_prefix(sf_dir: str):
    """Exact dedup keyed on a normalized prefix (lower, first 20 chars) —
    groups exist even in a corpus without full-text duplicates."""
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def key(t: pa.Table) -> pa.Table:
        k = pc.utf8_slice_codeunits(pc.utf8_lower(t["text"]), 0, 20)
        return pa.table({"doc_id": t["doc_id"], "k": k})

    keyed = ds.map_batches(key, batch_format="pyarrow")
    out = preagg_groupby(
        keyed, ["k"], [("doc_id", "min", "doc_id"), ("doc_id", "count", "n_copies")]
    )
    return out.select_columns(["doc_id", "n_copies"])


def dedup_span_exact(sf_dir: str):
    """Exact substring (duplicated-span) dedup — Lee et al. 2022 sequence-
    level dedup over word 8-grams (dedup.duplicated_span_removal): every
    8-token span occurring >=2 times across >=2 documents is stripped from
    ALL documents; returns per doc (n_tokens, n_removed, text_clean).  The
    hot-gram discovery is one (gram, doc) preagg shuffle; the rewrite is
    batch-local with the hot set broadcast (adaptive — see the operator)."""
    from .dedup import duplicated_span_removal

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return duplicated_span_removal(ds, n=8, min_count=2, min_docs=2)


def sft_context_assembly(sf_dir: str):
    """SFT training-example assembly over transcripts
    (relational.prefix_concat_examples): the flagship's derived CDC stream
    is LWW-replayed to the live conversation table, then every assistant
    turn becomes one example — ``context`` = the preceding live turns
    rendered as "role: text" lines, budget-truncated to the most recent
    200 characters (the recency window an SFT packer applies), ``target``
    = the turn's own text.  One hash shuffle on conv_id; assembly is a
    vectorized segment scan (searchsorted budget cut) per partition."""
    from .relational import lww_latest, prefix_concat_examples

    wal = _derived_cdc_wal_table(sf_dir)
    live = lww_latest(
        rd.from_arrow(wal), ["conv_id", "turn_idx"], "seq", op_col="op"
    )

    def prep(t: pa.Table) -> pa.Table:
        line = pc.binary_join_element_wise(t["role"], t["text"], ": ")
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "line": line,
                "is_tgt": pc.equal(t["role"], "assistant"),
                "target": t["text"],
            }
        )

    ex = prefix_concat_examples(
        live.map_batches(prep, batch_format="pyarrow"),
        keys=["conv_id"], order_col="turn_idx", line_col="line",
        target_col="is_tgt", sep="\n", budget=200,
    )
    return ex.select_columns(
        ["conv_id", "turn_idx", "context", "target", "n_context"]
    )


def bloom_skip_scan(sf_dir: str):
    """File-level bloom data skipping (skipping.build_bloom_index /
    read_files_eq): documents range-clustered by lang (one sort — the
    "cluster then index" layout step), a per-file bloom index built on the
    lang column, then an equality scan for 'fr' that opens only files
    whose bloom admits the value (exact pyarrow filter removes bloom false
    positives, so the result is identical to the full scan).  The pruning
    behavior itself is pinned in tests/test_skipping.py; this row
    certifies exactness end-to-end."""
    import tempfile

    from .skipping import build_bloom_index, read_files_eq

    data_dir = tempfile.mkdtemp(prefix="raydatax_bloomdata_")
    idx_dir = tempfile.mkdtemp(prefix="raydatax_bloomidx_")
    docs = rd.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "lang", "source", "n_chars"]
    )
    docs.repartition(6).sort("lang").write_parquet(data_dir)
    build_bloom_index(data_dir, "lang", idx_dir)
    hits = read_files_eq(data_dir, "lang", "fr", idx_dir)
    return preagg_groupby(
        hits, ["source"],
        [("doc_id", "count", "n_docs"), ("n_chars", "sum", "total_chars")],
    )


def lang_id(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    out = ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))
    return out.select_columns(["doc_id", "lang_pred"])


def text_normalize(sf_dir: str):
    """Canonical corpus normalization (text.normalize_text): NFC + lower +
    whitespace collapse + trim, all RE2/Arrow kernels with an exact DuckDB
    twin — the preprocessing step that makes exact dedup comparable."""
    from .text import normalize_text

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def apply(t: pa.Table) -> pa.Table:
        t = normalize_text(t)
        return pa.table({"doc_id": t["doc_id"], "norm": t["norm"],
                         "n_chars_norm": pc.cast(pc.utf8_length(t["norm"]), pa.int64())})

    return ds.map_batches(apply, batch_format="pyarrow")


def pii_redact(sf_dir: str):
    """PII scrubbing (text.RedactPii actor stage).  The corpus has no PII,
    so each doc is deterministically augmented with an email / IPv4 / phone
    derived from doc_id — the SQL oracle builds the identical string and
    applies the identical RE2 rules in the identical order, so redacted
    output is byte-identical.  Redaction order is part of the contract."""
    from .text import RedactPii

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def augment(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks()
        idn = ids.to_numpy(zero_copy_only=False)
        aug = pc.binary_join_element_wise(
            t["text"], " reach user", pc.cast(ids, pa.string()),
            "@example.com or 10.2.", pc.cast(pa.array(idn % 250), pa.string()),
            ".99 call +1-555-",
            pc.utf8_lpad(pc.cast(pa.array(idn % 10000), pa.string()), 4, "0"),
            "",
        )
        return pa.table({"doc_id": t["doc_id"], "text": aug})

    out = ds.map_batches(augment, batch_format="pyarrow").map_batches(
        RedactPii, batch_format="pyarrow", concurrency=(1, 4)
    )
    return out.select_columns(["doc_id", "redacted"])


def token_positions(sf_dir: str):
    """Ordinal explode (text.explode_tokens): every document flattened to
    (doc_id, pos, tok) with 1-based in-document positions — the exact
    multiset of SQL's zipped unnest(string_split) + unnest(range)."""
    from .text import explode_tokens

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(lambda t: explode_tokens(t), batch_format="pyarrow")


def doc_repetition(sf_dir: str):
    """Gopher-style repetition quality signals (text.repetition_stats):
    two-level pre-aggregated groupby; ratios are exact-integer divisions."""
    from .text import repetition_stats

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return repetition_stats(ds)


def decontaminate_3gram(sf_dir: str):
    """Benchmark decontamination (text.ngram_contamination): benchmark =
    docs with doc_id % 13 == 0, training = the rest; a training doc is
    contaminated iff it shares a word 3-gram with any benchmark doc.
    Adaptive semi join on the n-gram — neither corpus hits the driver."""
    from .text import ngram_contamination

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def side(bench: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            mask = (ids % 13 == 0) if bench else (ids % 13 != 0)
            return t.filter(pa.array(mask))
        return f

    train = ds.map_batches(side(False), batch_format="pyarrow")
    bench = ds.map_batches(side(True), batch_format="pyarrow")
    return ngram_contamination(train, bench, n=3)


def docs_lm_perplexity(sf_dir: str):
    """CCNet-style LM quality scoring (text.fit_unigram_counts +
    text.lm_perplexity): fit an add-one-smoothed unigram LM on the trusted
    slice (lang = 'en'), score EVERY document's integer-exact micro
    log-prob sum, token count and OOV count under it.  Per-token log-probs
    snap to int64 micros before summation, so totals are associative and
    hash cross-engine; the vocabulary broadcasts (object store, once) at
    this scale and hash-joins above the metadata-counted limit."""
    from .text import fit_unigram_counts, lm_perplexity

    ds = rd.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "text", "lang"]
    )
    ref = ds.map_batches(
        lambda t: t.filter(pc.equal(t["lang"], "en")).select(["doc_id", "text"]),
        batch_format="pyarrow",
    )
    vocab = fit_unigram_counts(ref)
    return lm_perplexity(ds.select_columns(["doc_id", "text"]), vocab)


def inverted_index_terms(sf_dir: str):
    """Posting-list build (text.build_inverted_index): term → document
    frequency + ascending comma-joined doc-id postings, distributed
    (DISTINCT (term, doc) partials → one grouped ordered concat).  The
    build side of the search engines the reference only writes INTO
    (elasticsearchwriter/solrwriter); min_df=20 bounds the result to the
    index's head."""
    from .text import build_inverted_index

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return build_inverted_index(ds, min_df=20)


def index_and_search(sf_dir: str):
    """Boolean AND retrieval through the inverted index
    (text.index_and_query): build the full index, then intersect the
    posting lists of ['query', 'window', 'merge'] — work ∝ those terms'
    postings, never the corpus."""
    from .text import build_inverted_index, index_and_query

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    idx = build_inverted_index(ds)
    return index_and_query(idx, ["query", "window", "merge"])


def incremental_lm_perplexity(sf_dir: str):
    """Incremental LM fitting (text.unigram_index_add / read_unigram_index):
    the prior crawl (doc_id %% 3 == 0) and the new crawl land as two
    bucketed index epochs — each fit tokenizes ONLY its own crawl — then
    every document scores against the merged counts, which must equal a
    one-shot fit over the union (the SQL twin).  Same crash-atomic
    epoch/compaction discipline as the persistent dedup indexes."""
    import shutil

    from .text import lm_perplexity, read_unigram_index, unigram_index_add

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    idx = f"/tmp/raydatax_lmidx_{tag}"
    shutil.rmtree(idx, ignore_errors=True)
    unigram_index_add(idx, _crawl_split(ds, "doc_id", prior=True))
    unigram_index_add(idx, _crawl_split(ds, "doc_id", prior=False))
    vocab = read_unigram_index(idx)
    return lm_perplexity(ds, vocab)


def sequence_packing(sf_dir: str):
    """Greedy sequential packing (relational.pack_sequences over the
    distributed prefix sum): documents laid end-to-end in doc_id order,
    chunked every 4096 chars; per-sequence doc counts and sizes.  The SQL
    twin is a window cumsum — which DuckDB runs in one partition, and the
    engine runs as sort + O(blocks) driver ints."""
    from .relational import pack_sequences

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "n_chars"])
    packed = pack_sequences(ds, budget=4096, order_key="doc_id", size_col="n_chars")
    return preagg_groupby(
        packed, ["seq_id"],
        [("doc_id", "count", "n_docs"), ("n_chars", "sum", "total_chars")],
    )


def jsonl_doc_roundtrip(sf_dir: str):
    """Document-store family end-to-end (mongodbwriter → mongodbreader over
    an export dump): documents → ``sinks.write_jsonl`` assembling DEPTH-2
    nested sub-documents ("meta.src.source") → ``read_jsonl`` with
    dotted-path extraction → grouped counts.  The oracle recomputes the
    same aggregate from the source table, so a green row certifies the
    nested write + extraction round trip in both directions."""
    import tempfile

    from .sinks import write_jsonl
    from .sources import read_jsonl

    # unique per call: a shared fixed path would race between concurrent
    # gate/bench runs (one rmtree-ing what the other reads); scratch lives
    # under /tmp and is bounded by the sf documents size
    out_dir = tempfile.mkdtemp(prefix="raydatax_jsonl_")
    docs = rd.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "lang", "source", "n_chars"]
    )
    write_jsonl(
        docs, out_dir,
        doc_paths=[("doc_id", "doc_id"), ("meta.lang", "lang"),
                   ("meta.src.source", "source"), ("n_chars", "n_chars")],
    )
    ds = read_jsonl(
        out_dir,
        doc_paths=[("meta.lang", "lang"), ("meta.src.source", "source"),
                   ("n_chars", "n_chars")],
    )
    return preagg_groupby(
        ds, ["lang", "source"],
        [("n_chars", "count", "n_docs"), ("n_chars", "sum", "sum_chars")],
    )


def key_range_scan(sf_dir: str):
    """hbase11xreader surface end-to-end: events staged as a KV table
    SORTED by rowkey (user_id, version = event_id) so parquet row groups
    are the region analogue, then a rowkey-range scan [2, 12) in
    ``normal`` mode — latest version per rowkey — via footer-stat
    row-group pruning.  The range is non-empty at EVERY sf (user ids
    start at 0; sf0.001 tops out near 14), so the gate works at any
    scale.  Oracle: row_number() latest within the range."""
    import tempfile

    from .sources import read_key_range

    staged = tempfile.mkdtemp(prefix="raydatax_kv_")
    ds = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["event_id", "user_id", "event_type", "value"],
    )
    # distributed range partition + sort (Ray Data sort), small row groups
    # so the range scan has several "regions" to prune
    ds.sort("user_id").write_parquet(staged, row_group_size=4096)

    out = read_key_range(
        staged, "user_id", start=2, stop=12,
        mode="normal", version_col="event_id",
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "last_event_id": t["event_id"],
            "event_type": t["event_type"],
            "value": t["value"],
        })

    return out.map_batches(proj, batch_format="pyarrow")


def key_skip_scan(sf_dir: str):
    """Phoenix-over-HBase SKIP SCAN analogue: one scan serving several
    disjoint rowkey ranges (a Phoenix ``WHERE pk IN (...)``/OR'd-ranges
    query compiles to a skip scan, not N scans).  Row groups are pruned
    against the range UNION and each is opened at most once even when
    several ranges hit it (``sources.read_key_ranges``); latest version
    per rowkey (``normal`` mode).  Oracle: OR of the ranges + latest by
    row_number().  The middle range is empty at sf0.001 (user ids top
    near 14) — the scan must handle empty member ranges."""
    import tempfile

    from .sources import read_key_ranges

    staged = tempfile.mkdtemp(prefix="raydatax_kv_skip_")
    ds = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["event_id", "user_id", "event_type", "value"],
    )
    ds.sort("user_id").write_parquet(staged, row_group_size=4096)

    out = read_key_ranges(
        staged, "user_id", [(2, 5), (20, 23), (9, 12)],
        mode="normal", version_col="event_id",
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "last_event_id": t["event_id"],
            "event_type": t["event_type"],
            "value": t["value"],
        })

    return out.map_batches(proj, batch_format="pyarrow")


def tsdb_window_read(sf_dir: str):
    """tsdbreader split-model parity: the query [Jan 2 .. Jan 5) over two
    metrics runs as one read task per 6-hour interval (row groups pruned
    by ts footer stats, metric predicate pushed into each task); the union
    of interval slices must hash-match a plain filtered scan."""
    from .sources import read_tsdb

    return read_tsdb(
        _p(sf_dir, "events"), "ts",
        start="2024-01-02 00:00:00", end="2024-01-05 00:00:00",
        interval_s=6 * 3600,
        metric_col="event_type", metrics=["click", "view"],
        columns=["event_id", "event_type", "ts", "value"],
    )


def search_topk_scroll(sf_dir: str):
    """Search-reader family (elasticsearchreader match query + scroll,
    solrreader paged query): TF-score documents on two terms, page through
    the result with search_after cursors (2 pages × 10), which must equal
    the global top-20 by (score DESC, doc_id ASC) — certifying both the
    scoring and the cursor pagination against one SQL oracle."""
    from .text import search_scroll

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    terms = ["merge", "window"]
    pages, cursor = [], None
    for _ in range(2):
        page, cursor = search_scroll(ds, terms, 10, cursor=cursor)
        if page.num_rows:
            pages.append(page)
        if cursor is None:
            break
    return pa.concat_tables(pages)


def dedup_minhash(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return minhash_dedup(ds, threshold=0.6)


def ngram_jaccard(sf_dir: str):
    """Exact char-5-gram Jaccard over a deterministic candidate-pair list
    (every 25th doc vs its successor) — the verification stage of the
    near-dup pipeline, SQL-oracled: hashed-shingle distinct counts equal
    raw-substring distinct counts (64-bit collisions are negligible), and
    |∩|/|∪| is an integer division both engines perform identically."""
    from .dedup import ngram_jaccard_verify

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return ngram_jaccard_verify(ds, _neighbor_pairs(sf_dir), k=5)


def ngram_containment_docs(sf_dir: str):
    """Asymmetric near-dup: exact char-5-gram CONTAINMENT per direction
    (dedup.ngram_containment_verify) over the same deterministic pair list
    as ngram_jaccard — catches quotes / partial inclusion that Jaccard
    misses when the two docs differ in size.  Integer-over-integer
    divisions, cross-engine exact."""
    from .dedup import ngram_containment_verify

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return ngram_containment_verify(ds, _neighbor_pairs(sf_dir), k=5)


def edit_distance_docs(sf_dir: str):
    """Character-level verify stage (dedup.edit_distance_verify): exact
    Levenshtein distance over the same deterministic candidate-pair list
    as ngram_jaccard — the small-edit near-dup metric (templates, OCR
    noise) the set-based measures blur.  Banded two-row numpy DP per
    pair; collection bounded by the pair list."""
    from .dedup import edit_distance_verify

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return edit_distance_verify(ds, _neighbor_pairs(sf_dir))


def docs_cms_counts(sf_dir: str):
    """Count-min sketch frequency estimates (relational.cms_estimate,
    width 1024 × depth 2) for four probe terms over the tokenized corpus —
    bounded-memory counting whose deterministic hash chain lets SQL build
    the identical sketch, so even the collision noise matches exactly
    (estimates are ≥ the true count by construction)."""
    from .relational import cms_estimate
    from .text import tokenize_batch

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    terms = ds.map_batches(lambda t: tokenize_batch(t), batch_format="pyarrow")
    return cms_estimate(terms, "term", ["query", "window", "merge", "xyzzy"])


def docs_pmi_collocations(sf_dir: str):
    """Collocation extraction (text.pmi_collocations): top-20 token pairs
    by PMI over a ±3 windowed co-occurrence grid — pair volume bounded by
    tokens·window, counts pre-aggregated, the PMI expression one fixed
    IEEE computation over exact integers, micro-snapped."""
    from .text import pmi_collocations

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return pmi_collocations(ds, window=3, min_count=5, k=20)


def docs_bm25_topk(sf_dir: str):
    """Okapi BM25 top-15 (text.bm25_topk) for ['query','window','merge']:
    tf restricted to the query terms, df tiny, per-(doc,term)
    contributions micro-snapped before the per-doc sum so scores hash
    cross-engine; SQL computes the identical expression."""
    from .text import bm25_topk

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return bm25_topk(ds, ["query", "window", "merge"], k=15)


def docs_phrase_search(sf_dir: str):
    """match_phrase through the positional index (text.phrase_search):
    docs where 'order' is immediately followed by 'fast' — n−1 (doc,
    pos) hash joins over only the phrase terms' postings; SQL twin is
    the token_positions self-join."""
    from .text import phrase_search

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return phrase_search(ds, ["order", "fast"])


def dedup_minhash_verified(sf_dir: str):
    """The full MinHash LSH path under the exact-SQL gate: LSH candidate
    pairs (shingle → minhash → banded buckets) exact-verified with char-5-gram
    Jaccard and filtered at the same threshold.  The oracle computes ALL-pairs
    exact Jaccard ≥ 0.6 in DuckDB, so a green row certifies both precision
    (no false pair survives the verify) and — at this corpus scale — recall
    (LSH missed no true pair).  At 100-TB scale only the engine side runs;
    recall becomes the documented 1-(1-t^r)^b LSH bound."""
    from .dedup import minhash_candidate_pairs, ngram_jaccard_verify

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    cand = minhash_candidate_pairs(ds, threshold=0.6)
    ver = ngram_jaccard_verify(ds, cand.select_columns(["a", "b"]), k=5)
    kept = ver.map_batches(
        lambda t: t.filter(pc.greater_equal(t["jaccard"], 0.6)),
        batch_format="pyarrow",
    )
    return kept.sort(["a", "b"])


def dedup_keep_best(sf_dir: str):
    """Production dedup canonicalization (dedup.keep_best_dedup): cluster
    the exact-verified near-dup pairs (the dedup_minhash_verified
    relation) into connected components via the engine's adaptive path
    and keep the BEST document per cluster — longest text, ties to the
    smallest id — picked with distributed grouped_topk n=1 over the
    corpus-joined quality column (no driver metadata read, no per-node
    loop).  Emits one row per clustered document: (doc_id, canonical_id,
    keep).  The oracle recomputes components with a recursive CTE over
    the ALL-pairs exact-Jaccard relation and the same argmax."""
    from .dedup import keep_best_dedup, minhash_candidate_pairs, ngram_jaccard_verify

    ds = rd.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "text", "n_chars"]
    )
    cand = minhash_candidate_pairs(ds, threshold=0.6)
    ver = ngram_jaccard_verify(ds, cand.select_columns(["a", "b"]), k=5)
    kept = ver.map_batches(
        lambda t: t.filter(pc.greater_equal(t["jaccard"], 0.6)),
        batch_format="pyarrow",
    )
    return keep_best_dedup(ds, kept, quality_col="n_chars")


def similarity_join_docs(sf_dir: str):
    """Cross-table set-similarity join (dedup.similarity_join): documents
    split by doc_id parity into two "tables", joined on char-5-gram
    Jaccard ≥ 0.5 via shared-seed MinHash LSH blocking + exact shingle
    verification — the entity-resolution / fuzzy-join operator.  The
    oracle computes ALL cross-side pairs in SQL, so a green row certifies
    precision AND (at this scale) the LSH blocking's recall."""
    from .dedup import similarity_join

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def side(even: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            mask = (ids % 2 == 0) if even else (ids % 2 == 1)
            return t.filter(pa.array(mask))
        return f

    left = ds.map_batches(side(True), batch_format="pyarrow")
    right = ds.map_batches(side(False), batch_format="pyarrow")
    return similarity_join(left, right, threshold=0.5)


def dedup_simhash(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return simhash_pairs(ds, max_hamming=3)


def dedup_simhash_verified(sf_dir: str):
    """The SimHash near-dup path under the exact-SQL gate: 64-bit SimHash
    (word-token polynomial hash + splitmix-style mix, per-bit signed sums)
    banded into four 16-bit slices — any pair within Hamming ≤ 3 shares a
    slice by pigeonhole, so banding + Hamming verify is EXACT here, not
    probabilistic.  The oracle recomputes the identical signature in pure
    SQL (HUGEINT mod-2^64 polynomial, 32-bit-split multiply, xor via
    two's-complement BIGINT) and takes ALL-pairs bit_count(xor) ≤ 3: a
    green row certifies the signature kernel bit-for-bit AND the banding's
    recall.  Restricted to ASCII, token-bearing docs (the SQL twin hashes
    code points, the engine hashes UTF-8 bytes — identical only on ASCII;
    token-less docs have no SQL rows).  Bucket caps are lifted — the
    production entry ``dedup_simhash`` keeps them as its all-pairs guard."""

    def ascii_tokenful(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(pc.binary_length(pc.cast(t["text"], pa.binary())),
                     pc.utf8_length(t["text"])),
            pc.match_substring_regex(t["text"], r"\S"),
        )
        return t.filter(keep)

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    ds = ds.map_batches(ascii_tokenful, batch_format="pyarrow")
    return simhash_pairs(ds, max_hamming=3, max_bucket=None)


def docs_bigram_perplexity(sf_dir: str):
    """Second-order LM quality scoring (text.fit_bigram_counts +
    text.bigram_perplexity): fit an add-one-smoothed BIGRAM LM on the
    trusted slice (lang = 'en'), score EVERY document's integer-exact
    micro log-prob sum over its adjacent-token transitions, with the
    transition count and unseen-transition count.  The scorer is
    adaptive: under ~2M fitted rows the bigram/context relations are
    broadcast once per actor (the path taken at sf scale); above that it
    falls back to shuffle hash joins, so a corpus-scale bigram vocabulary
    is never assumed broadcastable.  Per-transition log-probs snap to
    int64 micros before summation, so totals hash cross-engine."""
    from .text import bigram_perplexity, fit_bigram_counts

    ds = rd.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "text", "lang"]
    )
    ref = ds.map_batches(
        lambda t: t.filter(pc.equal(t["lang"], "en")).select(["doc_id", "text"]),
        batch_format="pyarrow",
    )
    bigrams, contexts, v_size = fit_bigram_counts(ref)
    return bigram_perplexity(
        ds.select_columns(["doc_id", "text"]), bigrams, contexts, v_size
    ).sort("doc_id")


def incremental_bigram_perplexity(sf_dir: str):
    """Incremental BIGRAM LM fitting (text.bigram_index_add /
    read_bigram_index): the prior crawl (doc_id % 3 == 0) and the new
    crawl land as two bucketed index epochs — each fit tokenizes ONLY its
    own crawl — then every document scores against the merged counts,
    which must equal a one-shot bigram fit over the union (the SQL twin).
    The incremental_lm_perplexity contract one order higher."""
    import shutil

    from .text import bigram_index_add, bigram_perplexity, read_bigram_index

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    idx = _scratch("raydatax_bigidx", sf_dir)
    shutil.rmtree(idx, ignore_errors=True)
    bigram_index_add(idx, _crawl_split(ds, "doc_id", prior=True))
    bigram_index_add(idx, _crawl_split(ds, "doc_id", prior=False))
    bigrams, contexts, v = read_bigram_index(idx)
    return bigram_perplexity(ds, bigrams, contexts, v)
