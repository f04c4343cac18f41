"""Text-analysis stages for large-scale training-data pipelines.

These are first-class engine operators (not in the reference, which moves
records without looking inside them — its closest analogue is the
transformer chain, SURVEY.md §2.2).  All are vectorized Arrow batch
functions; the language-ID stage is a **callable class** (actor pool):
patterns compile once per actor in ``__init__``, per-batch work is pyarrow
``count_substring_regex`` kernels — the stateful-stage pattern from
``/opt/skills/guides/ray_guide.md``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def token_count(batch: pa.Table, column: str = "text", out: str = "n_tokens") -> pa.Table:
    """Whitespace-run token count (vectorized regex count)."""
    n = pc.count_substring_regex(batch[column], r"\S+")
    return batch.append_column(out, pc.cast(n, pa.int64()))


#: BPE-style pre-tokenizer unit: letter runs / digit runs / punctuation
#: runs (the GPT-2 pre-tokenizer's shape, RE2-safe so SQL
#: ``regexp_extract_all`` counts the identical segments)
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_count(batch: pa.Table, column: str = "text", out: str = "n_bpe_tokens") -> pa.Table:
    """Pre-tokenizer segment count — a closer proxy for LLM token budgets
    than whitespace runs ("a-b!" is 3 segments, 1 whitespace token).  One
    vectorized regex count per batch."""
    n = pc.count_substring_regex(batch[column], BPE_TOKEN_PATTERN)
    return batch.append_column(out, pc.cast(n, pa.int64()))


def quality_stats(batch: pa.Table, column: str = "text") -> pa.Table:
    """Cheap quality-scoring features: length, token count, punctuation /
    digit / uppercase ratios, mean token length.  All pyarrow kernels."""
    text = batch[column]
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    safe_chars = pc.max_element_wise(n_chars, 1.0)
    n_tok = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.float64())
    safe_tok = pc.max_element_wise(n_tok, 1.0)
    punct = pc.cast(pc.count_substring_regex(text, r"[.,;:!?]"), pa.float64())
    digit = pc.cast(pc.count_substring_regex(text, r"[0-9]"), pa.float64())
    upper = pc.cast(pc.count_substring_regex(text, r"[A-Z]"), pa.float64())
    ws = pc.cast(pc.count_substring_regex(text, r"\s"), pa.float64())
    if "n_chars" not in batch.column_names:
        batch = batch.append_column("n_chars", pc.cast(n_chars, pa.int64()))
    if "n_tokens" not in batch.column_names:
        batch = batch.append_column("n_tokens", pc.cast(n_tok, pa.int64()))
    batch = batch.append_column("punct_ratio", pc.divide(punct, safe_chars))
    batch = batch.append_column("digit_ratio", pc.divide(digit, safe_chars))
    batch = batch.append_column("upper_ratio", pc.divide(upper, safe_chars))
    batch = batch.append_column(
        "mean_token_len", pc.divide(pc.subtract(n_chars, ws), safe_tok)
    )
    return batch


# language markers: high-frequency function words / script ranges.
_LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in|is|that|for|with|was)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|mit|für|auf)\b",
    "fr": r"\b(le|la|les|des|est|une|dans|pour|que|avec)\b",
    "es": r"\b(el|los|las|una|es|en|por|para|con|del)\b",
    "zh": r"[一-鿿]",
}


class LangId:
    """Heuristic language ID (n-gram/function-word voting) as an actor-pool
    stage: marker patterns are built once per actor; per batch we count
    marker hits per language (vectorized) and take the argmax.

    Use: ``ds.map_batches(LangId(), ...)`` for tasks or
    ``ds.map_batches(LangId, concurrency=N, batch_format="pyarrow")`` for an
    actor pool.
    """

    def __init__(self, column: str = "text", out: str = "lang_pred", markers=None):
        self.column = column
        self.out = out
        self.markers = dict(markers or _LANG_MARKERS)
        self.langs = list(self.markers)

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.column]
        n_tok = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.float64())
        safe = pc.max_element_wise(n_tok, 1.0)
        scores = np.empty((len(self.langs), batch.num_rows), dtype=np.float64)
        for i, lang in enumerate(self.langs):
            hits = pc.cast(
                pc.count_substring_regex(text, self.markers[lang]), pa.float64()
            )
            # zh counts characters, not words — normalize by chars instead
            if lang == "zh":
                denom = pc.max_element_wise(
                    pc.cast(pc.utf8_length(text), pa.float64()), 1.0
                )
                scores[i] = pc.divide(hits, denom).to_numpy(zero_copy_only=False)
            else:
                scores[i] = pc.divide(hits, safe).to_numpy(zero_copy_only=False)
        best = np.argmax(scores, axis=0)
        conf = scores[best, np.arange(batch.num_rows)]
        pred = pa.array(np.array(self.langs, dtype=object)[best], type=pa.string())
        # no markers hit at all -> unknown
        pred = pc.if_else(pa.array(conf > 0.0), pred, pa.scalar(None, pa.string()))
        batch = batch.append_column(self.out, pred)
        return batch.append_column(self.out + "_score", pa.array(conf))


def fingerprint_md5(batch: pa.Table, column: str = "text", out: str = "fp_md5") -> pa.Table:
    """Content fingerprint = md5 hex of the UTF-8 text (matches SQL
    ``md5(text)`` for oracle checks).  Per-row C-speed hashing over the
    Arrow buffer; acceptable off the hot path."""
    col = batch[column]
    vals = [
        hashlib.md5(v.encode("utf-8")).hexdigest() if v is not None else None
        for v in col.to_pylist()
    ]
    return batch.append_column(out, pa.array(vals, type=pa.string()))


_POLY_R = 0x100000001B3  # odd -> invertible mod 2^64
_POLY_RINV = pow(_POLY_R, -1, 1 << 64)


def poly_hash_array(col: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """uint64 polynomial hash per value of an Arrow (large_)string or
    (large_)binary array, computed over the raw byte buffer — NO per-row
    Python objects.  This is the shared kernel behind
    :func:`fingerprint_rolling`, the engine's partition hashing, and the
    multimodal feature stub (hot enough that object materialization was the
    map stage's dominant cost)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ChunkedArray):  # pyarrow<17 may still return chunked
        col = col.chunk(0) if col.num_chunks else pa.array([], pa.string())
    if col.null_count:
        fill = b"" if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type) else ""
        col = pc.fill_null(col, fill)
    t = pa.table({"c": col})
    out = fingerprint_rolling(t, "c", "h")["h"]
    arr = out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0) if arr.num_chunks else pa.array([], pa.int64())
    return arr.to_numpy(zero_copy_only=False).view(np.uint64)


def fingerprint_rolling(batch: pa.Table, column: str = "text", out: str = "fp64") -> pa.Table:
    """64-bit polynomial (Rabin-Karp-family) document fingerprint, fully
    vectorized: hash(doc) = (Σ byte_i · r^(len-i)) + len, computed over the
    whole batch's concatenated UTF-8 buffer in one numpy pass using
    precomputed powers of r and its modular inverse (uint64 wraparound
    arithmetic IS the mod-2^64 ring)."""
    col = batch[column].combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0) if col.num_chunks else pa.array([], pa.string())
    n = len(col)
    if n == 0:
        return batch.append_column(out, pa.array([], pa.int64()))
    if pa.types.is_large_string(col.type) or pa.types.is_large_binary(col.type):
        off_dtype = np.int64
    elif pa.types.is_string(col.type) or pa.types.is_binary(col.type):
        off_dtype = np.int32  # the kernel never decodes utf-8: bytes are bytes
    else:
        raise TypeError(f"fingerprint_rolling: expected a (large_)string/binary column, got {col.type}")
    off_buf = col.buffers()[1]
    offsets = np.frombuffer(off_buf, dtype=off_dtype, count=n + 1).astype(np.int64)
    base = offsets[0]
    offsets = offsets - base
    total = int(offsets[-1])
    data = (
        np.frombuffer(col.buffers()[2], dtype=np.uint8, offset=int(base), count=total)
        if total
        else np.array([], np.uint8)
    )
    lens = np.diff(offsets)
    with np.errstate(over="ignore"):
        max_len = int(lens.max()) if n else 0
        pw_rinv = np.empty(max(max_len, 1), dtype=np.uint64)
        pw_rinv[0] = 1
        np.multiply.accumulate(
            np.full(max_len, _POLY_RINV & 0xFFFFFFFFFFFFFFFF, dtype=np.uint64)[: max(max_len - 1, 0)],
            out=pw_rinv[1:max_len] if max_len > 1 else pw_rinv[1:1],
        )
        pw_r = np.empty(max_len + 1, dtype=np.uint64)
        pw_r[0] = 1
        if max_len:
            np.multiply.accumulate(
                np.full(max_len, _POLY_R, dtype=np.uint64), out=pw_r[1:]
            )
        pos = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lens)
        contrib = data.astype(np.uint64) * pw_rinv[pos]
        sums = np.add.reduceat(contrib, offsets[:-1], dtype=np.uint64) if total else np.zeros(n, np.uint64)
        sums[lens == 0] = 0  # reduceat quirk: empty segment copies next element
        h = sums * pw_r[lens] + lens.astype(np.uint64)
    arr = pa.array(h.view(np.int64), type=pa.int64())
    if col.null_count:
        arr = pc.if_else(pc.is_valid(col), arr, pa.scalar(None, pa.int64()))
    return batch.append_column(out, arr)


# ------------------------------------------------------------ search reader


def term_scores(
    batch: pa.Table,
    terms: list[str],
    column: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Per-batch term-frequency scoring: score = total occurrence count of
    all query terms in the document (vectorized ``pc.count_substring`` per
    term — no per-row loops).  The match-query scoring stage of the
    search-reader family."""
    col = batch[column]
    score = pa.nulls(batch.num_rows, pa.int64())
    score = pc.fill_null(pc.cast(score, pa.int64()), 0)
    for term in terms:
        score = pc.add(score, pc.cast(pc.count_substring(col, term), pa.int64()))
    return pa.table({id_col: batch[id_col], "score": score})


def search_topk(
    ds,
    terms: list[str],
    k: int,
    column: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Search-reader family analogue (elasticsearchreader bool-must match
    query, ``/root/reference/elasticsearchreader/.../ESReader.java:174-188``;
    solrreader query pulls): score every document by term frequency, keep
    matches (score > 0), return the global top-k by (score DESC, id ASC) —
    a total order, so results are deterministic.  Top-k is per-block
    partial + tiny driver merge (``relational.topk``): no global sort
    shuffle, bounded driver memory (≤ k rows per block)."""
    from .relational import topk

    scored = ds.map_batches(
        lambda t: term_scores(t, terms, column, id_col), batch_format="pyarrow"
    ).filter(expr="score > 0")
    out = topk(scored, [("score", "descending"), (id_col, "ascending")], k)
    if out is None:
        return _empty_hits(ds, id_col)
    return out


def _empty_hits(ds, id_col: str) -> pa.Table:
    """Empty result with the CORRECT id type (string corpora included), so
    empty and non-empty pages stay concat-compatible."""
    try:
        sch = ds.schema()
        id_type = dict(zip(sch.names, sch.types))[id_col]
    except Exception:
        id_type = pa.int64()
    return pa.table({id_col: pa.array([], id_type),
                     "score": pa.array([], pa.int64())})


def search_scroll(
    ds,
    terms: list[str],
    page_size: int,
    cursor: tuple[int, int] | None = None,
    column: str = "text",
    id_col: str = "doc_id",
):
    """Scroll/search_after pagination over the match result (the ES scroll
    loop, ``ESReader.java:195-214``): ``cursor`` is the (score, id) of the
    last row already delivered; each page is the top ``page_size`` rows
    STRICTLY AFTER the cursor in (score DESC, id ASC) order.  Stateless
    between calls — exactly the search_after contract, so any worker can
    serve any page and a failed scroll resumes from its last cursor.
    Returns ``(page, next_cursor)``; next_cursor is None when exhausted."""
    scored = ds.map_batches(
        lambda t: term_scores(t, terms, column, id_col), batch_format="pyarrow"
    ).filter(expr="score > 0")
    if cursor is not None:
        cur_score, cur_id = cursor  # id may be any orderable type (strings!)

        def after_cursor(t: pa.Table) -> pa.Table:
            s = pa.scalar(cur_score, pa.int64())
            keep = pc.or_(
                pc.less(t["score"], s),
                pc.and_(pc.equal(t["score"], s),
                        pc.greater(t[id_col], pa.scalar(cur_id))),
            )
            return t.filter(keep)

        scored = scored.map_batches(after_cursor, batch_format="pyarrow")
    from .relational import topk

    page = topk(scored, [("score", "descending"), (id_col, "ascending")],
                page_size)
    if page is None or page.num_rows == 0:
        return (_empty_hits(ds, id_col), None)
    nxt = None
    if page.num_rows == page_size:
        nxt = (page["score"][-1].as_py(), page[id_col][-1].as_py())
    return page, nxt


def tokenize_batch(
    batch: pa.Table,
    column: str = "text",
    id_col: str = "doc_id",
    lower: bool = True,
) -> pa.Table:
    """Flatten each document into (id, term) rows: lowercase, split on the
    literal single space, drop empty tokens — one vectorized split +
    list_flatten per batch (the same contract as SQL
    ``unnest(string_split(lower(text), ' '))``, so results are
    cross-engine exact).  Purely batch-local; no shuffle."""
    col = batch[column].combine_chunks()
    if lower:
        col = pc.utf8_lower(col)
    lists = pc.split_pattern(col, " ")
    n_per = pc.fill_null(pc.list_value_length(lists), 0).to_numpy(
        zero_copy_only=False
    )
    flat = pc.list_flatten(lists)
    ids = batch[id_col].combine_chunks().take(
        pa.array(np.repeat(np.arange(batch.num_rows, dtype=np.int64), n_per))
    )
    out = pa.table({id_col: ids, "term": flat})
    return out.filter(pc.not_equal(out["term"], ""))


# Some pyarrow builds (16.1 here) ship a utf8_normalize whose every form
# emits DECOMPOSED output (compose flag never set) — probe it, because
# silently-decomposed "NFC" breaks cross-engine dedup/fingerprint equality.
_ARROW_NFC_OK = (
    pc.utf8_normalize(pa.array(["é"]), form="NFC")[0].as_py() == "é"
)


def normalize_text(
    batch: pa.Table,
    column: str = "text",
    out: str = "norm",
) -> pa.Table:
    """Canonical text normalization for training corpora: lowercase,
    whitespace runs collapsed to one space, ends trimmed, then unicode NFC
    — the exact contract of SQL
    ``nfc_normalize(trim(regexp_replace(lower(t), '\\s+', ' ', 'g')))``
    (both engines run RE2), so normalized output is cross-engine identical
    — which is what makes downstream exact dedup / fingerprints comparable
    across pipelines.

    The first three steps are vectorized Arrow kernels.  NFC composition
    is vectorized too when the build's ``utf8_normalize`` actually
    composes; on builds where it does not (probed above — pyarrow 16.1
    decomposes under every form), ASCII batches (already NFC) stay on the
    vectorized path and only batches containing non-ASCII rows pay a
    per-row ``unicodedata`` pass."""
    x = pc.utf8_lower(batch[column])
    x = pc.replace_substring_regex(x, pattern=r"\s+", replacement=" ")
    x = pc.utf8_trim_whitespace(x)
    if _ARROW_NFC_OK:
        x = pc.utf8_normalize(x, form="NFC")
    else:
        import unicodedata

        if isinstance(x, pa.ChunkedArray):
            x = x.combine_chunks()
        non_ascii = pc.fill_null(
            pc.greater(pc.count_substring_regex(x, r"[^\x00-\x7F]"), 0), False
        )
        if pc.any(non_ascii).as_py():
            # O(non-ASCII rows) Python, scattered back in one kernel — the
            # ASCII majority (already NFC) never materializes as objects
            flagged = x.filter(non_ascii)
            fixed = pa.array(
                [
                    unicodedata.normalize("NFC", v) if v is not None else None
                    for v in flagged.to_pylist()
                ],
                pa.string(),
            )
            x = pc.replace_with_mask(x, non_ascii, fixed)
    return batch.append_column(out, x)


# default PII redaction rules, applied IN ORDER (order is part of the
# contract: an email is consumed before the IP rule can see its digits)
PII_RULES: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+\d[\d-]{7,}\d", "<PHONE>"),
]


class RedactPii:
    """PII scrubbing as an actor-pool stage: rule list fixed per actor in
    ``__init__``, per-batch work is one vectorized
    ``replace_substring_regex`` sweep per rule (RE2; patterns are strings
    so DuckDB ``regexp_replace(..., 'g')`` with the same rules in the same
    order produces byte-identical output).  Use
    ``ds.map_batches(RedactPii, concurrency=N, batch_format="pyarrow")``."""

    def __init__(self, column: str = "text", out: str = "redacted",
                 rules: list[tuple[str, str]] | None = None):
        self.column = column
        self.out = out
        self.rules = list(rules or PII_RULES)

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch[self.column]
        for pattern, replacement in self.rules:
            x = pc.replace_substring_regex(x, pattern=pattern,
                                           replacement=replacement)
        return batch.append_column(self.out, x)


def explode_tokens(
    batch: pa.Table,
    column: str = "text",
    id_col: str = "doc_id",
    sep: str = " ",
    pos_col: str | None = "pos",
) -> pa.Table:
    """Explode each document into (id, pos, token) rows — the exact
    multiset of SQL ``unnest(string_split(text, sep))`` zipped with
    ``unnest(range(1, len+1))``: empty tokens KEPT, case preserved,
    ``pos`` 1-based within the document.  One vectorized split, then the
    generic list explode (``relational.explode_list``) — flatten, repeat,
    and position arithmetic live in one place.  Distinct from
    :func:`tokenize_batch` (which lowercases and drops empties for
    TF-IDF)."""
    from .relational import explode_list

    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lists = pa.table({id_col: batch[id_col], "__toks": pc.split_pattern(col, sep)})
    return explode_list(lists, "__toks", pos_col=pos_col, out="tok")


def ngram_table(
    batch: pa.Table,
    n: int,
    column: str = "text",
    id_col: str = "doc_id",
    sep: str = " ",
    pos_col: str | None = None,
) -> pa.Table:
    """Word n-grams per document as (id[, pos], ng) rows, fully vectorized:
    split once, then the n-gram strings come from ONE
    ``binary_join_element_wise`` over n shifted takes of the flat token
    array — candidate start positions are the within-document indices
    ``<= len - n`` (so no n-gram ever crosses a document boundary).
    Batch-local; no shuffle.  SQL twin:
    ``array_to_string(list_slice(ts, i, i+n-1), sep)`` for
    ``i in 1 .. len-n+1``."""
    if n < 1:
        raise ValueError(f"ngram_table: n must be >= 1, got {n}")
    col = batch[column].combine_chunks()
    lists = pc.split_pattern(col, sep)
    lens = pc.fill_null(pc.list_value_length(lists), 0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    flat = pc.list_flatten(lists)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if isinstance(flat, pa.ChunkedArray):  # pyarrow<17 may still return chunked
        flat = flat.chunk(0) if flat.num_chunks else pa.array([], pa.string())
    total = int(lens.sum())
    per_doc = np.maximum(lens - n + 1, 0)
    if total == 0 or int(per_doc.sum()) == 0:
        out = {id_col: pa.array([], batch[id_col].type)}
        if pos_col is not None:
            out[pos_col] = pa.array([], pa.int64())
        out["ng"] = pa.array([], pa.string())
        return pa.table(out)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    within = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    idx = np.nonzero(within <= np.repeat(lens, lens) - n)[0]
    parts = [flat.take(pa.array(idx + k)) for k in range(n)]
    ng = parts[0] if n == 1 else pc.binary_join_element_wise(*parts, sep)
    ids = batch[id_col].combine_chunks().take(
        pa.array(np.repeat(np.arange(batch.num_rows, dtype=np.int64), per_doc))
    )
    out = {id_col: ids}
    if pos_col is not None:
        out[pos_col] = pa.array(within[idx] + 1)
    out["ng"] = ng
    return pa.table(out)


def repetition_stats(
    ds,
    column: str = "text",
    id_col: str = "doc_id",
    sep: str = " ",
):
    """Gopher-style within-document repetition signals, distributed:
    explode to (doc, token) → per-(doc, token) counts via the
    pre-aggregated groupby (partials shuffle, never raw tokens×docs) → a
    second tiny groupby per doc folds them into n_tok / n_distinct /
    top_count, and the ratio columns (top-token fraction, distinct-token
    fraction) are exact-integer divisions — bit-identical to SQL.  High
    ``top_frac`` / low ``distinct_frac`` = boilerplate or degenerate
    repetition, the standard pre-training quality filter.

    Entirely BATCH-LOCAL — a document is one row, so its token statistics
    never leave the batch: explode, one in-batch Arrow hash aggregation per
    level, zero shuffles (the two-level groupby an engine would run if
    tokens were spread across rows is unnecessary here)."""

    def per_batch(t: pa.Table) -> pa.Table:
        toks = explode_tokens(t, column, id_col, sep, pos_col=None)
        counts = toks.group_by([id_col, "tok"]).aggregate([("tok", "count")])
        per_doc = counts.group_by([id_col]).aggregate(
            [("tok_count", "sum"), ("tok_count", "count"), ("tok_count", "max")]
        )
        n_tok = pc.cast(per_doc["tok_count_sum"], pa.int64())
        n_distinct = pc.cast(per_doc["tok_count_count"], pa.int64())
        top = pc.cast(per_doc["tok_count_max"], pa.int64())
        nf = pc.cast(n_tok, pa.float64())
        return pa.table({
            id_col: per_doc[id_col],
            "n_tok": n_tok,
            "n_distinct": n_distinct,
            "top_count": top,
            "top_frac": pc.divide(pc.cast(top, pa.float64()), nf),
            "distinct_frac": pc.divide(pc.cast(n_distinct, pa.float64()), nf),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow")


def ngram_contamination(
    train,
    bench,
    n: int = 3,
    column: str = "text",
    id_col: str = "doc_id",
    sep: str = " ",
):
    """Benchmark decontamination (the GPT-3 n-gram overlap check): flag
    every training document sharing at least one word n-gram with the
    benchmark set, with the count of DISTINCT contaminated n-grams per
    document.  Both sides explode to n-grams batch-local; the benchmark's
    distinct n-gram set is built distributed and the semi join is adaptive
    (broadcast under a metadata-counted threshold, hash-partitioned join
    above — ``relational.semi_join``), so neither corpus is ever collected
    on the driver.  The semi join runs BEFORE the distinct-count, so only
    contaminated pairs reach the shuffle."""
    from .relational import preagg_groupby, semi_join

    train_ng = train.map_batches(
        lambda t: ngram_table(t, n, column, id_col, sep), batch_format="pyarrow"
    )
    bench_ng = bench.map_batches(
        lambda t: ngram_table(t, n, column, id_col, sep), batch_format="pyarrow"
    ).select_columns(["ng"])
    hits = semi_join(train_ng, bench_ng, left_on="ng")
    pairs = preagg_groupby(
        hits, [id_col, "ng"], [("ng", "count", "__c")]
    ).select_columns([id_col, "ng"])
    return preagg_groupby(pairs, [id_col], [("ng", "count", "n_hits")])


def tfidf_top_terms(
    ds,
    k: int = 5,
    column: str = "text",
    id_col: str = "doc_id",
):
    """Corpus TF-IDF, distributed end-to-end, exact: tokenize batch-local
    → (doc, term) counts via the pre-aggregated groupby (only per-key
    partials shuffle) → document frequency as a second tiny groupby over
    the TF result → one hash join on term → score tf·ln(N/df) → top-k
    terms per document with a (score DESC, term ASC) total order.

    Every stage is the engine's own operator surface (preagg_groupby /
    hash_join / grouped_topk), so the scale story is theirs; the
    log-weighting is a fixed IEEE expression over exact integers —
    reproducible bit-for-bit against SQL.  Assumes ``id_col`` values are
    unique per document (N = corpus row count)."""
    from .relational import (
        _fetch_partials,
        broadcast_join,
        grouped_topk,
        hash_join,
        preagg_groupby,
    )

    n_docs = ds.count()
    pairs = ds.map_batches(
        lambda t: tokenize_batch(t, column, id_col), batch_format="pyarrow"
    )
    tf = preagg_groupby(pairs, [id_col, "term"], [("term", "count", "tf")]).materialize()
    df = preagg_groupby(tf, ["term"], [("term", "count", "df")]).materialize()
    # the vocabulary is almost always ≪ the (doc, term) table: decide from
    # block METADATA and broadcast it instead of shuffling tf through a
    # hash join (same adaptive discipline as semi_join)
    if df.count() <= 2_000_000:
        tables = [t for t in _fetch_partials(df.to_arrow_refs()) if t.num_rows]
        df_tab = pa.concat_tables(tables) if tables else None
        scored = broadcast_join(tf, df_tab, "term") if df_tab is not None else tf
    else:
        scored = hash_join(tf, df, on="term")

    def score(t: pa.Table) -> pa.Table:
        idf = pc.ln(
            pc.divide(
                pa.scalar(float(n_docs), pa.float64()),
                pc.cast(t["df"], pa.float64()),
            )
        )
        return t.append_column(
            "tfidf", pc.multiply(pc.cast(t["tf"], pa.float64()), idf)
        )

    with_score = scored.map_batches(score, batch_format="pyarrow")
    out = grouped_topk(
        with_score, id_col, [("tfidf", "descending"), ("term", "ascending")], k
    )
    return out.select_columns([id_col, "term", "tf", "df", "tfidf", "rank"])


# ------------------------------------------------ LM perplexity scoring
#
# CCNet-style quality filtering: fit a unigram language model on a trusted
# reference slice (one corpus pass), then score every document's
# cross-entropy under it — low-probability documents are boilerplate /
# wrong-language / garbage candidates.  The reference engine has no
# analogue (it never looks inside records); this is a first-class
# training-data operator.
#
# Cross-engine float discipline: each token's log-probability is snapped
# to an int64 MICRO value (floor(ln(p)·1e6 + 0.5)) before any summation,
# so per-document totals are integer sums — associative, order-free, and
# bit-identical to SQL computing the same expression (ln over one IEEE
# division is reproducible; sums of doubles would not be).


def fit_unigram_counts(ds, column: str = "text", id_col: str = "doc_id"):
    """One pass over the reference corpus → materialized vocabulary
    Dataset ``(term, c)``.  Tokenization is the corpus contract
    (:func:`tokenize_batch`: lower, split single space, drop empties);
    only per-batch (term, count) partials shuffle (preagg_groupby)."""
    from .relational import preagg_groupby

    pairs = ds.map_batches(
        lambda t: tokenize_batch(t, column, id_col), batch_format="pyarrow"
    )
    return preagg_groupby(pairs, ["term"], [("term", "count", "c")]).materialize()


def _vocab_totals(vocab) -> tuple[int, int]:
    """(N total reference tokens, V vocabulary size) from the vocab
    Dataset without pulling it to the driver: V from block metadata,
    N via one tiny per-block partial-sum column (O(blocks) ints)."""
    v_size = vocab.count()

    def part(t: pa.Table) -> pa.Table:
        s = pc.sum(t["c"]).as_py() or 0
        return pa.table({"s": pa.array([int(s)], pa.int64())})

    n_total = sum(
        r["s"] for r in vocab.map_batches(part, batch_format="pyarrow").take_all()
    )
    return int(n_total), int(v_size)


def _logp_micro(counts: np.ndarray, denom: int) -> np.ndarray:
    """int64 micro log-probability of add-one-smoothed unigrams: one IEEE
    division + pc.ln (the tfidf-proven cross-engine ln) + one multiply —
    exactly ``CAST(floor(ln(CAST(c+1 AS DOUBLE) / CAST(denom AS DOUBLE))
    * 1000000.0 + 0.5) AS BIGINT)``."""
    ratio = (counts.astype(np.float64) + 1.0) / float(denom)
    lp = pc.ln(pa.array(ratio, pa.float64())).to_numpy(zero_copy_only=False)
    return np.floor(lp * 1000000.0 + 0.5).astype(np.int64)


def lm_perplexity(
    ds,
    vocab,
    column: str = "text",
    id_col: str = "doc_id",
    broadcast_limit: int = 2_000_000,
):
    """Score every document under the fitted unigram LM: returns
    ``(id_col, n_tokens, n_oov, logp_micro)`` — token count, OOV count,
    and the integer-exact sum of per-token micro log-probs (perplexity =
    exp(-logp_micro / 1e6 / n_tokens), derivable downstream; kept integer
    here so the row hashes cross-engine).

    Adaptive join discipline (same as tfidf/semi_join): a vocabulary
    within ``broadcast_limit`` rows (decided from block metadata) is put
    in the object store ONCE and probed batch-locally inside an actor
    pool — zero shuffle; a larger one goes through the distributed
    left-outer hash join on (doc, term) counts, and per-doc totals come
    back via one pre-aggregated groupby.  Both paths are kernel-identical
    (differential-tested)."""
    import ray

    from .relational import _fetch_partials, hash_join, preagg_groupby

    n_total, v_size = _vocab_totals(vocab)
    denom = n_total + v_size
    if denom <= 0:
        raise ValueError("lm_perplexity: empty reference corpus")

    if v_size <= broadcast_limit:
        tables = [t for t in _fetch_partials(vocab.to_arrow_refs()) if t.num_rows]
        vtab = (
            pa.concat_tables(tables)
            if tables
            else pa.table({"term": pa.array([], pa.string()),
                           "c": pa.array([], pa.int64())})
        )
        ref = ray.put(vtab)

        class ScoreLM:
            def __init__(self):
                v = ray.get(ref)  # once per actor
                self.terms = v["term"].combine_chunks()
                self.counts = v["c"].to_numpy(zero_copy_only=False).astype(np.int64)

            def __call__(self, batch: pa.Table) -> pa.Table:
                n = batch.num_rows
                col = pc.utf8_lower(batch[column].combine_chunks())
                lists = pc.split_pattern(col, " ")
                n_per = pc.fill_null(pc.list_value_length(lists), 0).to_numpy(
                    zero_copy_only=False
                )
                flat = pc.list_flatten(lists)
                seg = np.repeat(np.arange(n, dtype=np.int64), n_per)
                keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
                keep = np.asarray(keep, dtype=bool)
                seg = seg[keep]
                terms = flat.filter(pa.array(keep))
                idx = pc.index_in(terms, value_set=self.terms)
                valid = pc.is_valid(idx).to_numpy(zero_copy_only=False)
                pos = pc.fill_null(idx, 0).to_numpy(zero_copy_only=False)
                c = np.where(valid, self.counts[pos] if len(self.counts) else 0, 0)
                micro = _logp_micro(c, denom)
                n_tok = np.bincount(seg, minlength=n).astype(np.int64)
                # int64 scatter-add, NOT float64-weighted bincount: a
                # float64 partial sum of micro log-probs is exact only
                # below 2^53 — the snap-before-sum contract requires the
                # SUM to stay integer too (same fix as fsck.lake_digest)
                n_oov = np.zeros(n, np.int64)
                np.add.at(n_oov, seg, (~valid).astype(np.int64))
                lp_sum = np.zeros(n, np.int64)
                np.add.at(lp_sum, seg, micro)
                return pa.table({
                    id_col: batch[id_col],
                    "n_tokens": pa.array(n_tok),
                    "n_oov": pa.array(n_oov),
                    "logp_micro": pa.array(lp_sum),
                })

        return ds.map_batches(ScoreLM, batch_format="pyarrow", concurrency=(1, 8))

    # distributed path: (doc, term, tf) ⟕ vocab, then one preagg groupby
    pairs = ds.map_batches(
        lambda t: tokenize_batch(t, column, id_col), batch_format="pyarrow"
    )
    tf = preagg_groupby(pairs, [id_col, "term"], [("term", "count", "tf")])
    joined = hash_join(tf, vocab, on="term", join_type="left_outer")

    def score(t: pa.Table) -> pa.Table:
        tfv = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        cv = pc.fill_null(t["c"], 0).to_numpy(zero_copy_only=False).astype(np.int64)
        oov = pc.is_null(t["c"]).to_numpy(zero_copy_only=False).astype(np.int64)
        micro = _logp_micro(cv, denom)
        return pa.table({
            id_col: t[id_col],
            "tf": pa.array(tfv),
            "oov_tf": pa.array(oov * tfv),
            "lp_tf": pa.array(micro * tfv),
        })

    scored = joined.map_batches(score, batch_format="pyarrow")
    agg = preagg_groupby(
        scored, [id_col],
        [("tf", "sum", "n_tokens"), ("oov_tf", "sum", "n_oov"),
         ("lp_tf", "sum", "logp_micro")],
    )
    # documents with zero tokens have no (doc, term) row: restore them at
    # (0, 0, 0) via a left join from the id column (distributed; the id
    # side is never collected)
    ids = ds.select_columns([id_col])
    out = hash_join(ids, agg, on=id_col, join_type="left_outer")

    def fill(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pc.fill_null(t["n_tokens"], 0),
            "n_oov": pc.fill_null(t["n_oov"], 0),
            "logp_micro": pc.fill_null(t["logp_micro"], 0),
        })

    return out.map_batches(fill, batch_format="pyarrow")


def bigram_pairs_batch(
    batch: pa.Table, column: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Flatten each document into adjacent-token (id, w1, w2) rows under
    the corpus tokenization contract (:func:`tokenize_batch`: lower, split
    single space, drop empties — adjacency is over the COMPACTED token
    stream, i.e. after empty-drop, matching SQL row_number re-ranking).
    Purely batch-local; no shuffle."""
    col = pc.utf8_lower(batch[column].combine_chunks())
    lists = pc.split_pattern(col, " ")
    n_per = pc.fill_null(pc.list_value_length(lists), 0).to_numpy(
        zero_copy_only=False
    )
    flat = pc.list_flatten(lists)
    seg = np.repeat(np.arange(batch.num_rows, dtype=np.int64), n_per)
    keep = np.asarray(
        pc.not_equal(flat, "").to_numpy(zero_copy_only=False), dtype=bool
    )
    seg = seg[keep]
    toks = flat.filter(pa.array(keep))
    if len(seg) < 2:
        return pa.table({id_col: pa.array([], batch[id_col].type),
                         "w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string())})
    adj = seg[:-1] == seg[1:]  # consecutive tokens in the same doc
    li = np.nonzero(adj)[0]
    ids = batch[id_col].combine_chunks().take(pa.array(seg[li]))
    return pa.table({
        id_col: ids,
        "w1": toks.take(pa.array(li)),
        "w2": toks.take(pa.array(li + 1)),
    })


def _bigram_fit_partials(
    batch: pa.Table, column: str, id_col: str
) -> pa.Table:
    """ONE tokenization pass emitting both relations the bigram fit
    needs, as mergeable partials: pair rows (w1, w2, c=1) AND per-batch
    unigram count rows (w1=term, w2=NULL, c=batch count).  The term rows
    cannot be derived from the pair relation (a single-token document's
    term appears in no pair) and folding them into the same pass avoids
    the second full corpus tokenization a separate unigram fit would
    cost — at corpus scale the tokenize IS the dominant fit cost."""
    col = pc.utf8_lower(batch[column].combine_chunks())
    lists = pc.split_pattern(col, " ")
    n_per = pc.fill_null(pc.list_value_length(lists), 0).to_numpy(
        zero_copy_only=False)
    flat = pc.list_flatten(lists)
    seg = np.repeat(np.arange(batch.num_rows, dtype=np.int64), n_per)
    keep = np.asarray(
        pc.not_equal(flat, "").to_numpy(zero_copy_only=False), dtype=bool)
    seg = seg[keep]
    toks = flat.filter(pa.array(keep))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    vc = toks.value_counts() if len(toks) else None
    parts = []
    if vc is not None and len(vc):
        parts.append(pa.table({
            "w1": vc.field("values"),
            "w2": pa.array([None] * len(vc), pa.string()),
            "c": pc.cast(vc.field("counts"), pa.int64()),
        }))
    if len(seg) >= 2:
        li = np.nonzero(seg[:-1] == seg[1:])[0]
        if len(li):
            parts.append(pa.table({
                "w1": toks.take(pa.array(li)),
                "w2": toks.take(pa.array(li + 1)),
                "c": pa.array(np.ones(len(li), np.int64)),
            }))
    if not parts:
        return pa.table({"w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64())})
    return pa.concat_tables(parts, promote_options="permissive")


def _bigram_fit_relations(ds, column: str, id_col: str):
    """(bigram (w1, w2, c2) Dataset, unigram (term, c) Dataset) from ONE
    tokenization pass over the corpus — the combined partials are
    materialized once and split by the w2 NULL tag."""
    from .relational import preagg_groupby

    combined = ds.map_batches(
        lambda t: _bigram_fit_partials(t, column, id_col),
        batch_format="pyarrow",
    ).materialize()
    pair_rows = combined.map_batches(
        lambda t: t.filter(pc.is_valid(t["w2"])), batch_format="pyarrow")
    term_rows = combined.map_batches(
        lambda t: pa.table({"term": t.filter(pc.is_null(t["w2"]))["w1"],
                            "c": t.filter(pc.is_null(t["w2"]))["c"]}),
        batch_format="pyarrow")
    bigrams = preagg_groupby(pair_rows, ["w1", "w2"], [("c", "sum", "c2")])
    terms = preagg_groupby(term_rows, ["term"], [("c", "sum", "c")])
    return bigrams, terms


def fit_bigram_counts(ds, column: str = "text", id_col: str = "doc_id"):
    """One pass over the reference corpus → the bigram LM's three fitted
    pieces: ``(bigrams, contexts, V)`` — a materialized (w1, w2, c2)
    Dataset, its (w1, c1 = Σ_w2 c2) context fold (derived from the bigram
    partials, no second corpus read), and the unigram vocabulary size V
    (the add-one smoothing denominator's constant, same definition as the
    unigram LM; computed in the SAME tokenization pass via tagged
    partials — see :func:`_bigram_fit_partials`)."""
    from .relational import preagg_groupby

    bigrams, terms = _bigram_fit_relations(ds, column, id_col)
    bigrams = bigrams.materialize()
    contexts = preagg_groupby(
        bigrams, ["w1"], [("c2", "sum", "c1")]
    ).materialize()
    v_size = terms.count()
    return bigrams, contexts, int(v_size)


def bigram_perplexity(
    ds,
    bigrams,
    contexts,
    v_size: int,
    column: str = "text",
    id_col: str = "doc_id",
    broadcast_limit: int = 2_000_000,
):
    """Score every document under the fitted add-one-smoothed BIGRAM LM:
    p(w2|w1) = (c2(w1,w2) + 1) / (c1(w1) + V).  Returns ``(id_col,
    n_bigrams, n_oov, logp_micro)`` — transition count, unseen-transition
    count, and the integer-exact sum of per-transition micro log-probs
    (same snap-before-sum discipline as :func:`lm_perplexity`: each
    transition's ln of ONE IEEE division is floored to int64 micros, so
    document totals are associative integer sums, cross-engine exact).

    Adaptive join discipline (the :func:`lm_perplexity` contract one
    order higher): a bigram relation within ``broadcast_limit`` rows
    (decided from block metadata — the relation is materialized) is put
    in the object store ONCE and probed batch-locally inside an actor
    pool — zero shuffle (the exact lookup key is ``w1 || ' ' || w2``:
    tokens cannot contain the split character, so the join key is
    collision-free); a larger one goes through three distributed
    left-outer hash joins on the per-transition partials, and per-doc
    totals come back via one pre-aggregated groupby.  Both paths use the
    same pc.ln kernel over the same IEEE division (differential-tested).
    """
    import ray as _ray

    from .relational import _fetch_partials, hash_join, preagg_groupby

    if v_size <= 0:
        raise ValueError("bigram_perplexity: empty reference corpus")

    if bigrams.count() <= broadcast_limit:
        bt = [t for t in _fetch_partials(bigrams.to_arrow_refs()) if t.num_rows]
        btab = pa.concat_tables(bt) if bt else pa.table(
            {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
             "c2": pa.array([], pa.int64())})
        ct = [t for t in _fetch_partials(contexts.to_arrow_refs()) if t.num_rows]
        ctab = pa.concat_tables(ct) if ct else pa.table(
            {"w1": pa.array([], pa.string()), "c1": pa.array([], pa.int64())})
        ref = _ray.put((btab, ctab))
        col_v, id_v, v_f = column, id_col, float(v_size)

        class ScoreBigram:
            def __init__(self):
                b, c = _ray.get(ref)  # once per actor
                self.bkeys = pc.binary_join_element_wise(
                    b["w1"].combine_chunks(), b["w2"].combine_chunks(), " "
                )
                self.c2 = b["c2"].to_numpy(zero_copy_only=False).astype(np.int64)
                self.cterms = c["w1"].combine_chunks()
                self.c1 = c["c1"].to_numpy(zero_copy_only=False).astype(np.int64)

            def __call__(self, batch: pa.Table) -> pa.Table:
                n = batch.num_rows
                col = pc.utf8_lower(batch[col_v].combine_chunks())
                lists = pc.split_pattern(col, " ")
                n_per = pc.fill_null(pc.list_value_length(lists), 0).to_numpy(
                    zero_copy_only=False)
                flat = pc.list_flatten(lists)
                seg = np.repeat(np.arange(n, dtype=np.int64), n_per)
                keep = np.asarray(
                    pc.not_equal(flat, "").to_numpy(zero_copy_only=False),
                    dtype=bool)
                seg = seg[keep]
                toks = flat.filter(pa.array(keep))
                zero = pa.table({
                    id_v: batch[id_v],
                    "n_bigrams": pa.array(np.zeros(n, np.int64)),
                    "n_oov": pa.array(np.zeros(n, np.int64)),
                    "logp_micro": pa.array(np.zeros(n, np.int64)),
                })
                if len(seg) < 2:
                    return zero
                li = np.nonzero(seg[:-1] == seg[1:])[0]
                if not len(li):
                    return zero
                w1 = toks.take(pa.array(li))
                w2 = toks.take(pa.array(li + 1))
                keys = pc.binary_join_element_wise(w1, w2, " ")
                i2 = pc.index_in(keys, value_set=self.bkeys)
                seen = pc.is_valid(i2).to_numpy(zero_copy_only=False)
                p2 = pc.fill_null(i2, 0).to_numpy(zero_copy_only=False)
                c2 = np.where(seen, self.c2[p2] if len(self.c2) else 0, 0)
                i1 = pc.index_in(w1, value_set=self.cterms)
                v1 = pc.is_valid(i1).to_numpy(zero_copy_only=False)
                p1 = pc.fill_null(i1, 0).to_numpy(zero_copy_only=False)
                c1 = np.where(v1, self.c1[p1] if len(self.c1) else 0, 0)
                ratio = (c2.astype(np.float64) + 1.0) / (c1.astype(np.float64) + v_f)
                lp = pc.ln(pa.array(ratio, pa.float64())).to_numpy(
                    zero_copy_only=False)
                micro = np.floor(lp * 1000000.0 + 0.5).astype(np.int64)
                segp = seg[li]
                # int64 scatter-add: keep the snapped-micro SUM integer
                # too (float64-weighted bincount loses exactness past
                # 2^53 and would diverge from the distributed path's
                # int64 preagg sums)
                n_oov = np.zeros(n, np.int64)
                np.add.at(n_oov, segp, (~seen).astype(np.int64))
                lp_sum = np.zeros(n, np.int64)
                np.add.at(lp_sum, segp, micro)
                return pa.table({
                    id_v: batch[id_v],
                    "n_bigrams": pa.array(
                        np.bincount(segp, minlength=n).astype(np.int64)),
                    "n_oov": pa.array(n_oov),
                    "logp_micro": pa.array(lp_sum),
                })

        return ds.map_batches(ScoreBigram, batch_format="pyarrow",
                              concurrency=(1, 8))

    pairs = ds.map_batches(
        lambda t: bigram_pairs_batch(t, column, id_col), batch_format="pyarrow"
    )
    tf = preagg_groupby(pairs, [id_col, "w1", "w2"], [("w1", "count", "tf")])
    j2 = hash_join(tf, bigrams, on=["w1", "w2"], join_type="left_outer",
                   portable=True)
    j1 = hash_join(j2, contexts, on="w1", join_type="left_outer",
                   portable=True)

    def score(t: pa.Table) -> pa.Table:
        tfv = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        c2 = pc.fill_null(t["c2"], 0).to_numpy(zero_copy_only=False).astype(np.int64)
        c1 = pc.fill_null(t["c1"], 0).to_numpy(zero_copy_only=False).astype(np.int64)
        oov = pc.is_null(t["c2"]).to_numpy(zero_copy_only=False).astype(np.int64)
        ratio = (c2.astype(np.float64) + 1.0) / (c1.astype(np.float64) + float(v_size))
        lp = pc.ln(pa.array(ratio, pa.float64())).to_numpy(zero_copy_only=False)
        micro = np.floor(lp * 1000000.0 + 0.5).astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            "tf": pa.array(tfv),
            "oov_tf": pa.array(oov * tfv),
            "lp_tf": pa.array(micro * tfv),
        })

    scored = j1.map_batches(score, batch_format="pyarrow")
    agg = preagg_groupby(
        scored, [id_col],
        [("tf", "sum", "n_bigrams"), ("oov_tf", "sum", "n_oov"),
         ("lp_tf", "sum", "logp_micro")],
    )
    ids = ds.select_columns([id_col])
    out = hash_join(ids, agg, on=id_col, join_type="left_outer", portable=True)

    def fill(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col],
            "n_bigrams": pc.cast(pc.fill_null(t["n_bigrams"], 0), pa.int64()),
            "n_oov": pc.cast(pc.fill_null(t["n_oov"], 0), pa.int64()),
            "logp_micro": pc.cast(pc.fill_null(t["logp_micro"], 0), pa.int64()),
        })

    return out.map_batches(fill, batch_format="pyarrow")


# ---------------------------------------------------- inverted index
#
# The search-engine build side the reference only *talks to*
# (elasticsearchwriter / solrwriter push documents at a service that
# builds postings); here the posting-list build IS an engine operator:
# term → sorted doc-id posting list + document frequency, distributed
# end-to-end.


def build_inverted_index(
    ds,
    column: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
):
    """Term → (df, postings) over the corpus: tokenize batch-local →
    DISTINCT (term, doc) via the pre-aggregated groupby (only per-batch
    partials shuffle) → one grouped ordered concat (hash-partition on
    term, one sort per partition, a single binary_join kernel).  Postings
    are the comma-joined doc ids in ascending order — the cross-engine
    contract of SQL ``string_agg(CAST(id AS VARCHAR), ',' ORDER BY id)``.
    Memory bound: one term's posting string must fit in a task's heap
    (inherent to posting lists; stop-word terms dominate — filter them
    with ``min_df``'s sibling ``max_df`` upstream if needed)."""
    from .relational import grouped_concat, preagg_groupby

    pairs = ds.map_batches(
        lambda t: tokenize_batch(t, column, id_col), batch_format="pyarrow"
    )
    distinct = preagg_groupby(pairs, ["term", id_col], [("term", "count", "__tf")])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "term": t["term"],
            "__ord": t[id_col],
            "__doc": pc.cast(t[id_col], pa.string()),
        })

    idx = grouped_concat(
        distinct.map_batches(prep, batch_format="pyarrow"),
        ["term"], "__doc", ["__ord"],
        sep=",", out_name="postings", count_name="df",
    )
    if min_df > 1:
        idx = idx.map_batches(
            lambda t: t.filter(pc.greater_equal(t["df"], min_df)),
            batch_format="pyarrow",
        )
    return idx.select_columns(["term", "df", "postings"])


def index_and_query(index_ds, terms: list[str], id_col: str = "doc_id"):
    """Boolean AND retrieval THROUGH the inverted index: select the query
    terms' rows (K rows), explode their postings, keep doc ids present in
    all K lists (count == K after the distinct-by-construction explode).
    Work ∝ the query terms' posting volume, never the corpus."""
    from .relational import preagg_groupby

    k = len(set(terms))
    if k == 0:
        raise ValueError("index_and_query: no terms")
    tset = pa.array(sorted(set(terms)), pa.string())

    def explode(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["term"], value_set=tset))
        lists = pc.split_pattern(t["postings"].combine_chunks(), ",")
        flat = pc.list_flatten(lists)
        return pa.table({id_col: pc.cast(flat, pa.int64())})

    hits = index_ds.map_batches(explode, batch_format="pyarrow")
    counts = preagg_groupby(hits, [id_col], [(id_col, "count", "__k")])
    return counts.map_batches(
        lambda t: t.filter(pc.equal(t["__k"], k)).select([id_col]),
        batch_format="pyarrow",
    )


# ------------------------------------------------ BM25 / phrase search


def bm25_topk(
    ds,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    column: str = "text",
    id_col: str = "doc_id",
):
    """Okapi BM25 ranking as engine operators — the relevance scoring the
    search-reader family's backends perform server-side, here computed
    over the corpus itself: tf from pre-aggregated (doc, term) partials
    restricted to the query terms (the shuffle is ∝ matching docs, never
    the corpus), df per query term (tiny, pulled to the driver), doc
    lengths from one counting pass, idf = ln((N−df+0.5)/(df+0.5) + 1).

    Cross-engine float discipline: each (doc, term) contribution —
    a fixed IEEE expression over exact integers and the one shared
    ``avglen`` double — snaps to int64 micros BEFORE the per-doc sum, so
    scores are associative integer sums (the LM-perplexity discipline).
    Returns the global top-k by (score_micro DESC, id ASC) via the
    bounded per-block partial merge."""
    import ray

    from .relational import hash_join, preagg_groupby, topk

    tset = pa.array(sorted(set(terms)), pa.string())
    pairs = ds.map_batches(
        lambda t: tokenize_batch(t, column, id_col), batch_format="pyarrow"
    )
    doclen = preagg_groupby(
        pairs, [id_col], [("term", "count", "dl")]
    ).materialize()
    n_docs = doclen.count()
    if n_docs == 0:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "score_micro": pa.array([], pa.int64())}))
    total = sum(
        r["s"] for r in doclen.map_batches(
            lambda t: pa.table({"s": [int(pc.sum(t["dl"]).as_py() or 0)]}),
            batch_format="pyarrow",
        ).take_all()
    )
    avglen = float(total) / float(n_docs)  # one IEEE division, shared with SQL

    qpairs = pairs.map_batches(
        lambda t: t.filter(pc.is_in(t["term"], value_set=tset)),
        batch_format="pyarrow",
    )
    tf = preagg_groupby(qpairs, [id_col, "term"], [("term", "count", "tf")])
    df_rows = preagg_groupby(
        tf, ["term"], [("term", "count", "df")]
    ).take_all()  # ≤ len(terms) rows by construction
    # idf through pc.ln — the same Arrow kernel the rest of the module's
    # snap-before-sum pipelines (tfidf, docs_lm_perplexity) rely on to
    # agree with DuckDB's ln; driver-side math.log (libm) can differ by
    # a ulp right at a micro-rounding boundary and flip score_micro
    df_np = np.array([r["df"] for r in df_rows], np.float64)
    idf_arg = (n_docs - df_np + 0.5) / (df_np + 0.5) + 1.0
    idf_np = pc.ln(pa.array(idf_arg)).to_numpy(zero_copy_only=False)
    idf = {r["term"]: float(v) for r, v in zip(df_rows, idf_np)}
    joined = hash_join(tf, doclen, on=id_col)
    idf_terms = pa.array(list(idf), pa.string())
    idf_vals = np.array([idf[t] for t in idf], np.float64)

    def contrib(t: pa.Table) -> pa.Table:
        tfv = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        pos = pc.fill_null(
            pc.index_in(t["term"], value_set=idf_terms), 0
        ).to_numpy(zero_copy_only=False)
        num = tfv * (k1 + 1.0)
        den = tfv + k1 * (1.0 - b + b * (dl / avglen))
        micro = np.floor(idf_vals[pos] * (num / den) * 1000000.0 + 0.5)
        return pa.table({id_col: t[id_col],
                         "c": pa.array(micro.astype(np.int64))})

    scored = joined.map_batches(contrib, batch_format="pyarrow")
    per_doc = preagg_groupby(scored, [id_col], [("c", "sum", "score_micro")])
    out = topk(per_doc, [("score_micro", "descending"), (id_col, "ascending")], k)
    import ray.data as _rd

    return _rd.from_arrow(out) if out is not None else _rd.from_arrow(
        pa.table({id_col: pa.array([], pa.int64()),
                  "score_micro": pa.array([], pa.int64())})
    )


def phrase_search(
    ds,
    phrase: list[str],
    column: str = "text",
    id_col: str = "doc_id",
):
    """Exact phrase retrieval through a positional index: documents where
    ``phrase[i]`` occupies token position p+i for every i — the
    match_phrase query of the search-reader family, expressed as n−1
    distributed (doc, pos) hash joins over ONLY the phrase terms'
    postings (work ∝ posting sizes).  Token contract =
    :func:`explode_tokens` (space split, case preserved, empties keep
    their slots) — identical to the SQL ``token_positions`` twin."""
    if len(phrase) < 2:
        raise ValueError("phrase_search: need at least 2 terms")
    from .relational import hash_join, preagg_groupby

    pos_ds = ds.map_batches(
        lambda t: explode_tokens(t, column, id_col), batch_format="pyarrow"
    )

    def hits(term: str, offset: int):
        def f(t: pa.Table) -> pa.Table:
            s = t.filter(pc.equal(t["tok"], term))
            # rebase to the phrase-start position so every join is on equality
            base = pc.subtract(s["pos"], offset)
            return pa.table({id_col: s[id_col], "p0": pc.cast(base, pa.int64())})
        return pos_ds.map_batches(f, batch_format="pyarrow")

    cur = hits(phrase[0], 0)
    for i, term in enumerate(phrase[1:], start=1):
        cur = hash_join(cur, hits(term, i), on=[id_col, "p0"])
        if i < len(phrase) - 1:
            # chained joins: Ray's JoinOperator emits schema-less blocks
            # for empty hash partitions, which crash acero in the next
            # join — repartition re-unifies block schemas (the documented
            # workaround, see relational.semi_join)
            cur = cur.repartition(8)
    return preagg_groupby(
        cur, [id_col], [(id_col, "count", "__n")]
    ).select_columns([id_col])


# --------------------------------------------- co-occurrence / PMI


def cooccurrence_pairs(
    batch: pa.Table,
    window: int,
    column: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Windowed token co-occurrence pairs per batch — for every token
    position i and offset d in 1..window, the unordered pair
    {tok[i], tok[i+d]} (canonicalized bytewise min/max so (x,y) and
    (y,x) merge), never crossing a document boundary.  Pure shifted-take
    arithmetic on the flat token array (the ngram_table trick), so the
    pair volume is bounded by tokens·window — the well-behaved
    collocation contract (an unwindowed per-doc cross join would be
    quadratic in document length).  Tokenization contract =
    :func:`tokenize_batch` on positions (lower, single-space split,
    empties keep slots but pair rows with an empty side are dropped)."""
    if window < 1:
        raise ValueError(f"cooccurrence_pairs: window must be >= 1, got {window}")
    col = pc.utf8_lower(batch[column].combine_chunks())
    lists = pc.split_pattern(col, " ")
    lens = pc.fill_null(pc.list_value_length(lists), 0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    flat = pc.list_flatten(lists)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.chunk(0) if flat.num_chunks else pa.array([], pa.string())
    total = int(lens.sum())
    outs_a, outs_b = [], []
    if total:
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        within = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
        doc_len = np.repeat(lens, lens)
        for d in range(1, window + 1):
            idx = np.nonzero(within <= doc_len - 1 - d)[0]
            if not len(idx):
                continue
            x = flat.take(pa.array(idx))
            y = flat.take(pa.array(idx + d))
            keep = pc.and_(pc.not_equal(x, ""), pc.not_equal(y, ""))
            x, y = x.filter(keep), y.filter(keep)
            lt = pc.less_equal(x, y)
            outs_a.append(pc.if_else(lt, x, y))
            outs_b.append(pc.if_else(lt, y, x))
    if not outs_a:
        return pa.table({"a": pa.array([], pa.string()),
                         "b": pa.array([], pa.string())})
    return pa.table({
        "a": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in outs_a]),
        "b": pa.concat_arrays([b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b for b in outs_b]),
    })


def pmi_collocations(
    ds,
    window: int = 3,
    min_count: int = 5,
    k: int = 20,
    column: str = "text",
    id_col: str = "doc_id",
):
    """Top-k collocations by pointwise mutual information over windowed
    co-occurrence: PMI(a,b) = ln(c_ab · T² / (P · c_a · c_b)) with c_ab
    the pair count (bounded by tokens·window), c_a/c_b unigram occurrence
    counts, T total tokens, P total pairs.  Pair and unigram counts are
    pre-aggregated (only partials shuffle); T and P are tiny folds; the
    PMI expression is one fixed IEEE computation over exact integers,
    micro-snapped — SQL reproduces rows and scores exactly.  Returns
    ``(a, b, c_ab, pmi_micro, rank)``."""
    from .relational import preagg_groupby, topk

    pairs = ds.map_batches(
        lambda t: cooccurrence_pairs(t, window, column, id_col),
        batch_format="pyarrow",
    )
    cab = preagg_groupby(pairs, ["a", "b"], [("a", "count", "c_ab")]).materialize()
    toks = ds.map_batches(
        lambda t: tokenize_batch(t, column, id_col), batch_format="pyarrow"
    )
    uni = preagg_groupby(toks, ["term"], [("term", "count", "c")]).materialize()

    def blocksum(dset, col):
        return sum(
            r["s"] for r in dset.map_batches(
                lambda t: pa.table({"s": [int(pc.sum(t[col]).as_py() or 0)]}),
                batch_format="pyarrow",
            ).take_all()
        )

    t_total, p_total = blocksum(uni, "c"), blocksum(cab, "c_ab")
    if p_total == 0:
        import ray.data as _rd

        return _rd.from_arrow(pa.table({
            "a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
            "c_ab": pa.array([], pa.int64()),
            "pmi_micro": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64())}))

    from .relational import hash_join

    filt = cab.map_batches(
        lambda t: t.filter(pc.greater_equal(t["c_ab"], min_count)),
        batch_format="pyarrow",
    )
    ua = uni.map_batches(
        lambda t: pa.table({"a": t["term"], "c_a": t["c"]}), batch_format="pyarrow")
    ub = uni.map_batches(
        lambda t: pa.table({"b": t["term"], "c_b": t["c"]}), batch_format="pyarrow")
    # chained joins: repartition between them re-unifies block schemas
    # (Ray's JoinOperator emits schema-less blocks for empty hash
    # partitions — see relational.semi_join's hazard note)
    joined = hash_join(
        hash_join(filt, ua, on="a").repartition(8), ub, on="b"
    )

    def score(t: pa.Table) -> pa.Table:
        c_ab = t["c_ab"].to_numpy(zero_copy_only=False).astype(np.float64)
        c_a = t["c_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        c_b = t["c_b"].to_numpy(zero_copy_only=False).astype(np.float64)
        ratio = (c_ab * float(t_total) * float(t_total)) / (
            float(p_total) * c_a * c_b)
        lp = pc.ln(pa.array(ratio, pa.float64())).to_numpy(zero_copy_only=False)
        micro = np.floor(lp * 1000000.0 + 0.5).astype(np.int64)
        return pa.table({"a": t["a"], "b": t["b"], "c_ab": t["c_ab"],
                         "pmi_micro": pa.array(micro)})

    scored = joined.map_batches(score, batch_format="pyarrow")
    out = topk(scored, [("pmi_micro", "descending"), ("a", "ascending"),
                        ("b", "ascending")], k)
    import ray.data as _rd

    if out is None:
        return _rd.from_arrow(pa.table({
            "a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
            "c_ab": pa.array([], pa.int64()),
            "pmi_micro": pa.array([], pa.int64())}))
    n = out.num_rows
    return _rd.from_arrow(out.append_column("rank", pa.array(
        np.arange(1, n + 1, dtype=np.int64))))


# ------------------------------------------- incremental LM vocabulary


def unigram_index_add(index_dir: str, ds, column: str = "text",
                      id_col: str = "doc_id") -> dict:
    """Persistent unigram-count index: each crawl's vocabulary lands as a
    new bucketed epoch (``epoch-N/__bucket=H/``, the dedup-index layout —
    crash-atomic stage-then-rename, collision-proof max+1 numbering), so
    FITTING cost is ∝ the delta corpus: an hourly crawl tokenizes only
    its own documents, never the history.  Counts are mergeable — the
    read side sums across epochs — so no epoch ever rewrites another."""
    import os

    from .dedup import INDEX_BUCKETS, _commit_index_epoch, _index_epochs
    from .partition import hash_string_column

    os.makedirs(index_dir, exist_ok=True)
    vocab = fit_unigram_counts(ds, column, id_col)
    live, _ = _index_epochs(index_dir)
    nxt = (max(n for n, _ in live) + 1) if live else 0

    def bucket(t: pa.Table, B: int) -> pa.Array:
        h = hash_string_column(t["term"].combine_chunks())
        return pa.array((h % np.uint64(B)).astype(np.int64))

    _commit_index_epoch(index_dir, nxt, vocab, bucket_fn=bucket,
                        buckets=INDEX_BUCKETS)
    return {"epoch": nxt, "terms": vocab.count()}


def read_unigram_index(index_dir: str):
    """Merged vocabulary Dataset (term, c) across all live epochs — one
    pre-aggregated sum over the epoch parts (bucketed hive leaves)."""
    import glob
    import os

    import ray.data as rd

    from .dedup import _drop_hive_bucket, _index_epochs
    from .relational import preagg_groupby

    live, _ = _index_epochs(index_dir)
    files: list[str] = []
    for _, d in live:
        files.extend(sorted(glob.glob(
            os.path.join(index_dir, d, "**", "*.parquet"), recursive=True)))
    if not files:
        raise ValueError(f"read_unigram_index: no live epochs in {index_dir}")
    ds = rd.read_parquet(files).map_batches(
        _drop_hive_bucket, batch_format="pyarrow")
    return preagg_groupby(ds, ["term"], [("c", "sum", "c")]).materialize()


def bigram_index_add(index_dir: str, ds, column: str = "text",
                     id_col: str = "doc_id") -> dict:
    """Persistent BIGRAM-count index: each crawl lands as ONE outer epoch
    ``index_dir/epoch-N/`` holding BOTH fitted relations — bucketed
    (w1, w2, c2) partials under ``epoch-N/bigrams`` (bucket = mix64 of
    the collision-free ``w1 || ' ' || w2`` key) and the crawl's unigram
    (term, c) vocabulary under ``epoch-N/terms`` (for the smoothing
    constant V) — so FITTING cost is ∝ the delta corpus, the
    :func:`unigram_index_add` discipline one order higher, and BOTH
    relations come from ONE tokenization pass over the delta
    (:func:`_bigram_fit_relations`).  Counts are mergeable; the read side
    sums across epochs.

    Both relations are staged under one ``.stage-epoch-N`` dir and become
    visible in a SINGLE rename: a crash mid-add leaves only the invisible
    stage dir, never a terms epoch without its bigram counts (two
    separate renames had a window where :func:`read_bigram_index`
    returned smoothed probabilities matching no one-shot fit)."""
    import os
    import shutil

    from .dedup import INDEX_BUCKETS, _commit_index_epoch, _index_epochs
    from .partition import hash_string_column

    big, terms = _bigram_fit_relations(ds, column, id_col)

    def term_bucket(t: pa.Table, B: int) -> pa.Array:
        h = hash_string_column(t["term"].combine_chunks())
        return pa.array((h % np.uint64(B)).astype(np.int64))

    def pair_bucket(t: pa.Table, B: int) -> pa.Array:
        keys = pc.binary_join_element_wise(
            t["w1"].combine_chunks(), t["w2"].combine_chunks(), " ")
        h = hash_string_column(keys)
        return pa.array((h % np.uint64(B)).astype(np.int64))

    os.makedirs(index_dir, exist_ok=True)
    live, _ = _index_epochs(index_dir)
    nxt = (max(n for n, _ in live) + 1) if live else 0
    final = os.path.join(index_dir, f"epoch-{nxt}")
    stage = os.path.join(index_dir, f".stage-epoch-{nxt}")
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage)
    # inner commits land as epoch-0 INSIDE the stage (each gets the sorted
    # bucketed hive layout from _commit_index_epoch); neither is readable
    # until the one outer rename below flips both at once
    _commit_index_epoch(os.path.join(stage, "bigrams"), 0, big,
                        bucket_fn=pair_bucket, buckets=INDEX_BUCKETS)
    _commit_index_epoch(os.path.join(stage, "terms"), 0, terms,
                        bucket_fn=term_bucket, buckets=INDEX_BUCKETS)
    os.rename(stage, final)
    return {"epoch": nxt, "epochs": {"terms": nxt, "bigrams": nxt}}


def _bigram_index_files(index_dir: str, sub: str) -> list[str]:
    """Parquet files of one sub-relation (terms | bigrams) across all live
    OUTER epochs of a bigram index."""
    import glob
    import os

    from .dedup import _index_epochs

    live, _ = _index_epochs(index_dir)
    files: list[str] = []
    for _, d in live:
        files.extend(sorted(glob.glob(
            os.path.join(index_dir, d, sub, "**", "*.parquet"),
            recursive=True)))
    return files


def read_bigram_index(index_dir: str):
    """Merged fitted bigram LM across all live epochs: ``(bigrams,
    contexts, V)`` exactly as :func:`fit_bigram_counts` returns them —
    one pre-aggregated sum over the bigram epoch parts, the context fold
    derived from the merged relation, V a distinct-count over the terms
    sub-relation (duplicate counts across crawls can't move it)."""
    import ray.data as rd

    from .dedup import _drop_hive_bucket
    from .relational import preagg_groupby

    files = _bigram_index_files(index_dir, "bigrams")
    if not files:
        raise ValueError(f"read_bigram_index: no live epochs in {index_dir}")
    ds = rd.read_parquet(files).map_batches(
        _drop_hive_bucket, batch_format="pyarrow")
    bigrams = preagg_groupby(
        ds, ["w1", "w2"], [("c2", "sum", "c2")]).materialize()
    contexts = preagg_groupby(
        bigrams, ["w1"], [("c2", "sum", "c1")]).materialize()
    tfiles = _bigram_index_files(index_dir, "terms")
    tds = rd.read_parquet(tfiles).map_batches(
        _drop_hive_bucket, batch_format="pyarrow")
    v_size = preagg_groupby(tds, ["term"], [("c", "sum", "c")]).count()
    return bigrams, contexts, int(v_size)


def unigram_index_compact(index_dir: str) -> dict:
    """Fold all live epochs into ONE merged, bucketed epoch behind a
    ``folded_upto`` horizon marker (the compact_index discipline): the
    merged counts and the marker become visible in one atomic rename, so
    a crash leaves either the old epochs or the folded one — never both
    live."""
    from .dedup import INDEX_BUCKETS, _commit_index_epoch, _index_epochs
    from .partition import hash_string_column

    live, _ = _index_epochs(index_dir)
    if len(live) < 2:
        return {"folded": 0}
    merged = read_unigram_index(index_dir)
    hi = max(n for n, _ in live)

    def bucket(t: pa.Table, B: int) -> pa.Array:
        h = hash_string_column(t["term"].combine_chunks())
        return pa.array((h % np.uint64(B)).astype(np.int64))

    _commit_index_epoch(index_dir, hi + 1, merged, bucket_fn=bucket,
                        buckets=INDEX_BUCKETS,
                        marker={"folded_upto": hi})
    return {"folded": len(live), "epoch": hi + 1}
