"""Distributed byte-pair-encoding (BPE) vocabulary learning.

The reference has no tokenizer — this belongs to the LLM-training-data
operator family (dedup / quality / token counting) this engine carries as
first-class components.  Fitting a tokenizer is a corpus-scale job: the
design below touches the corpus exactly once.

Shape of the computation
------------------------
1. **One corpus-scale pass**: tokenize + word-frequency table via the
   pre-aggregate-then-groupby discipline (`relational.preagg_groupby`).
   BPE statistics depend only on (distinct word, frequency) — the classic
   Sennrich formulation — so every merge round afterwards runs on the
   vocabulary, not the corpus.  At 100 TB the vocabulary is millions of
   rows where the corpus is trillions.
2. **Per merge round** (over distinct words only):
   - *pair counting*: vectorized from the delimited symbol-string
     representation (``"|a|b|c|"`` for symbols ``[a, b, c]``) — split,
     flatten, adjacency by offset arithmetic, weighted ``np.bincount``
     over dictionary codes.  No Python loop over words.
   - *best pair*: max total count, ties broken (left, right) ascending —
     a total order, so the learner is deterministic and engine-independent.
   - *merge application*: ONE ``pc.replace_substring`` of ``"|l|r|"`` →
     ``"|lr|"`` across the whole word column.

Merge-application semantics are **leftmost non-overlapping substitution**
— exactly SQL ``replace()`` / Arrow ``replace_substring`` (parity pinned
by test) — which deviates from Sennrich's one-at-a-time greedy only on
runs of ≥3 identical symbols (``aaa`` + merge(a,a) → ``[aa, a]`` either
way, but ``aaaaa`` → ``[aa, a, aa]`` here vs ``[aa, aa, a]``).  This
substitution rule is what makes the whole learner hash-oracle-able in
DuckDB as unrolled per-round CTEs.

Adaptive execution (the `graph.pagerank` pattern): under a
metadata-counted distinct-word threshold the rounds run on one driver
table; above it each round is a ``map_batches`` per-block pair-count
partial + a small groupby-sum (the shuffle moves O(distinct pairs per
block), already aggregated), a per-block argmax reduced over O(blocks)
single rows on the driver, and the chosen pair broadcast back into a
vectorized replace map.  Both paths share the same kernels and produce
bit-identical merge tables (differential-tested).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .relational import preagg_groupby

DRIVER_WORD_THRESHOLD = 200_000

_MERGE_SCHEMA = pa.schema(
    [
        ("round", pa.int64()),
        ("lft", pa.large_string()),
        ("rgt", pa.large_string()),
        ("merged", pa.large_string()),
        ("pair_count", pa.int64()),
    ]
)


def _as_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col


def delimit_words(words: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """``"abc"`` → ``"|a|b|c|"``: every codepoint becomes one symbol,
    each symbol wrapped in the ``|`` boundary marker (words must not
    contain ``|`` — callers filter with ``token_pattern``)."""
    words = _as_array(pc.cast(_as_array(words), pa.large_string()))
    inner = pc.replace_substring_regex(words, pattern="(.)", replacement=r"\1|")
    bar = pa.scalar("|", pa.large_string())
    return _as_array(
        pc.binary_join_element_wise(bar, inner, pa.scalar("", pa.large_string()))
    )


def pair_counts(sym_str: "pa.Array | pa.ChunkedArray", freq: np.ndarray) -> pa.Table:
    """Weighted adjacent-symbol-pair counts of a delimited word column.

    Fully vectorized: one split kernel, adjacency from the list-array
    offsets (every flat element except each word's last is a pair-left),
    one dictionary encode, one weighted bincount over combined codes.
    Returns (lft, rgt, cnt) with one row per distinct pair.
    """
    syms = _as_array(pc.split_pattern(pc.utf8_trim(_as_array(sym_str), "|"), "|"))
    offsets = syms.offsets.to_numpy()
    offsets = offsets - offsets[0]  # sliced arrays keep absolute offsets
    flat = syms.values
    if len(flat) == 0:
        return _MERGE_SCHEMA.empty_table().select([])  # unused shape
    n_per_word = np.diff(offsets)
    is_last = np.zeros(len(flat), dtype=bool)
    is_last[offsets[1:] - 1] = True
    left_idx = np.where(~is_last)[0]
    if len(left_idx) == 0:
        return pa.table(
            {
                "lft": pa.array([], pa.large_string()),
                "rgt": pa.array([], pa.large_string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    weights = np.repeat(np.asarray(freq, dtype=np.int64), n_per_word)[left_idx]

    d = pc.dictionary_encode(flat)
    codes = d.indices.to_numpy().astype(np.int64)
    vocab = d.dictionary
    v = len(vocab)
    pair_code = codes[left_idx] * v + codes[left_idx + 1]
    # int64-exact grouped sum via sort + reduceat (float64-weighted
    # bincount is exact only below 2^53 — per-batch word frequencies can
    # multiply past it at extreme block sizes; same discipline as the LM
    # scorers and lake_digest).  reduceat over the sorted codes beats the
    # unbuffered np.add.at scatter by ~an order of magnitude in this
    # per-merge-round hot loop AND never allocates the dense v² slot
    # array.
    order = np.argsort(pair_code, kind="stable")
    sc = pair_code[order]
    starts = np.concatenate(([0], np.flatnonzero(np.diff(sc)) + 1))
    sums = np.add.reduceat(weights[order], starts)
    uniq = sc[starts]
    lft = pc.take(vocab, pa.array(uniq // v, pa.int64()))
    rgt = pc.take(vocab, pa.array(uniq % v, pa.int64()))
    return pa.table(
        {
            "lft": pc.cast(lft, pa.large_string()),
            "rgt": pc.cast(rgt, pa.large_string()),
            "cnt": pa.array(sums, pa.int64()),
        }
    )


def best_pair(counts: pa.Table) -> tuple[str, str, int] | None:
    """argmax by (cnt desc, lft asc, rgt asc) — the learner's total order."""
    if counts.num_rows == 0:
        return None
    lft = np.asarray(counts["lft"].to_pylist(), dtype=object)
    rgt = np.asarray(counts["rgt"].to_pylist(), dtype=object)
    cnt = counts["cnt"].to_numpy()
    i = np.lexsort((rgt, lft, -cnt))[0]
    return str(lft[i]), str(rgt[i]), int(cnt[i])


def apply_merge(
    sym_str: "pa.Array | pa.ChunkedArray", lft: str, rgt: str
) -> pa.Array:
    """One vectorized leftmost-non-overlapping substitution — the
    merge-application rule shared bit-for-bit with SQL ``replace()``."""
    return _as_array(
        pc.replace_substring(
            _as_array(sym_str), pattern=f"|{lft}|{rgt}|", replacement=f"|{lft}{rgt}|"
        )
    )


def _tokenize_batch(batch: pa.Table, column: str, token_pattern: str) -> pa.Table:
    toks = pc.list_flatten(pc.split_pattern(pc.utf8_lower(batch[column]), " "))
    toks = toks.filter(pc.match_substring_regex(toks, token_pattern))
    return pa.table({"w": pc.cast(toks, pa.large_string())})


def word_frequencies(
    ds: "ray.data.Dataset", column: str = "text", token_pattern: str = "^[a-z0-9]+$"
) -> "ray.data.Dataset":
    """The corpus-scale pass: lowercase whitespace tokens filtered to
    ``token_pattern``, counted by the pre-aggregated groupby (partials per
    block, shuffle moves one row per distinct word per block)."""
    toks = ds.map_batches(
        _tokenize_batch,
        fn_kwargs=dict(column=column, token_pattern=token_pattern),
        batch_format="pyarrow",
    )
    return preagg_groupby(toks, ["w"], [("w", "count", "f")])


def _merge_rows(merges: list[tuple[int, str, str, int]]) -> pa.Table:
    return pa.table(
        {
            "round": pa.array([m[0] for m in merges], pa.int64()),
            "lft": pa.array([m[1] for m in merges], pa.large_string()),
            "rgt": pa.array([m[2] for m in merges], pa.large_string()),
            "merged": pa.array([m[1] + m[2] for m in merges], pa.large_string()),
            "pair_count": pa.array([m[3] for m in merges], pa.int64()),
        }
    )


def _learn_driver(words: pa.Table, n_merges: int) -> pa.Table:
    sym = delimit_words(words["w"])
    freq = words["f"].to_numpy()
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        b = best_pair(pair_counts(sym, freq))
        if b is None:
            break
        merges.append((r, b[0], b[1], b[2]))
        sym = apply_merge(sym, b[0], b[1])
    return _merge_rows(merges)


def _learn_distributed(words: "ray.data.Dataset", n_merges: int) -> pa.Table:
    def init_syms(batch: pa.Table) -> pa.Table:
        return pa.table({"s": delimit_words(batch["w"]), "f": batch["f"]})

    cur = words.map_batches(init_syms, batch_format="pyarrow").materialize()
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        def partial(batch: pa.Table) -> pa.Table:
            return pair_counts(batch["s"], batch["f"].to_numpy())

        summed = preagg_groupby(
            cur.map_batches(partial, batch_format="pyarrow"),
            ["lft", "rgt"],
            [("cnt", "sum", "cnt")],
        )

        def block_best(batch: pa.Table) -> pa.Table:
            b = best_pair(batch)
            if b is None:
                return pa.table(
                    {
                        "lft": pa.array([], pa.large_string()),
                        "rgt": pa.array([], pa.large_string()),
                        "cnt": pa.array([], pa.int64()),
                    }
                )
            return pa.table(
                {
                    "lft": pa.array([b[0]], pa.large_string()),
                    "rgt": pa.array([b[1]], pa.large_string()),
                    "cnt": pa.array([b[2]], pa.int64()),
                }
            )

        # one candidate row per block → O(blocks) driver rows, then the
        # same total-order argmax picks the global winner.
        cands = pa.Table.from_pylist(
            summed.map_batches(block_best, batch_format="pyarrow").take_all(),
            schema=pa.schema(
                [("lft", pa.large_string()), ("rgt", pa.large_string()), ("cnt", pa.int64())]
            ),
        )
        b = best_pair(cands)
        if b is None:
            break
        merges.append((r, b[0], b[1], b[2]))
        lft, rgt = b[0], b[1]

        def apply(batch: pa.Table, lft=lft, rgt=rgt) -> pa.Table:
            return pa.table({"s": apply_merge(batch["s"], lft, rgt), "f": batch["f"]})

        cur = cur.map_batches(apply, batch_format="pyarrow").materialize()
    return _merge_rows(merges)


def learn_bpe(
    ds: "ray.data.Dataset",
    column: str = "text",
    n_merges: int = 6,
    token_pattern: str = "^[a-z0-9]+$",
    driver_threshold: int = DRIVER_WORD_THRESHOLD,
) -> pa.Table:
    """Learn ``n_merges`` BPE merges; returns the merge table
    (round, lft, rgt, merged, pair_count) — the tokenizer artifact.

    Adaptive: distinct-word count (block metadata of the materialized
    frequency table, nothing fetched) decides driver vs distributed
    rounds; both paths are kernel-identical.
    """
    wf = word_frequencies(ds, column, token_pattern).materialize()
    if wf.count() <= driver_threshold:
        tables = [t for t in ray.get(wf.to_arrow_refs()) if t.num_rows]
        if not tables:
            return _merge_rows([])
        words = pa.concat_tables(tables, promote_options="permissive")
        return _learn_driver(words, n_merges)
    return _learn_distributed(wf, n_merges)


def encode_token_counts(
    ds: "ray.data.Dataset",
    merges: pa.Table,
    id_col: str = "doc_id",
    column: str = "text",
    token_pattern: str = "^[a-z0-9]+$",
) -> "ray.data.Dataset":
    """Encode the corpus with a learned merge table and count BPE symbols
    per document — the sizing pass a packing/budgeting stage consumes.

    The merge list is tiny (it IS the tokenizer) and travels in the task
    closure; application is the same replace chain as the learner, so the
    count per word is ``count('|') - 1`` of its final delimited string.
    Documents with zero pattern-matching tokens report 0.
    """
    pairs = list(
        zip(merges["lft"].to_pylist(), merges["rgt"].to_pylist())
    )

    def encode(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch[column])
        toks = pc.split_pattern(low, " ")
        toks_flat = _as_array(pc.list_flatten(toks))
        offsets = _as_array(toks).offsets.to_numpy()
        offsets = offsets - offsets[0]
        doc_idx = np.repeat(np.arange(batch.num_rows), np.diff(offsets))
        keep = pc.match_substring_regex(toks_flat, token_pattern).to_numpy(
            zero_copy_only=False
        )
        toks_flat = toks_flat.filter(pa.array(keep))
        doc_idx = doc_idx[keep]
        sym = delimit_words(toks_flat)
        for lft, rgt in pairs:
            sym = apply_merge(sym, lft, rgt)
        per_tok = pc.subtract(pc.count_substring(sym, "|"), 1).to_numpy()
        n_bpe = np.zeros(batch.num_rows, dtype=np.int64)
        np.add.at(n_bpe, doc_idx, per_tok)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")
