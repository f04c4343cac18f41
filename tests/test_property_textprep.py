"""Property tests for the late-round-2 text-prep kernels: n-gram windows,
explode ordinals, packing arithmetic, stratified membership."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from raydatax.text import explode_tokens, ngram_table

TOKENS = ["a", "bb", "ccc", "", "Ж", "x-y", "42"]
texts_strategy = st.lists(
    st.lists(st.sampled_from(TOKENS), min_size=0, max_size=8).map(" ".join),
    min_size=0, max_size=12,
)


def _py_ngrams(text: str, n: int):
    toks = text.split(" ")
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


@settings(max_examples=150, deadline=None)
@given(texts=texts_strategy, n=st.integers(1, 4))
def test_ngram_table_matches_python_reference(texts, n):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = ngram_table(t, n, pos_col="pos")
    want = [(i, p + 1, ng) for i, tx in enumerate(texts)
            for p, ng in enumerate(_py_ngrams(tx, n))]
    got = list(zip(out["doc_id"].to_pylist(), out["pos"].to_pylist(),
                   out["ng"].to_pylist()))
    assert got == want


@settings(max_examples=150, deadline=None)
@given(texts=texts_strategy)
def test_explode_tokens_matches_str_split(texts):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = explode_tokens(t)
    want = [(i, p + 1, tok) for i, tx in enumerate(texts)
            for p, tok in enumerate(tx.split(" "))]
    got = list(zip(out["doc_id"].to_pylist(), out["pos"].to_pylist(),
                   out["tok"].to_pylist()))
    assert got == want


@settings(max_examples=100, deadline=None)
@given(sizes=st.lists(st.integers(0, 500), min_size=1, max_size=50),
       budget=st.integers(1, 600))
def test_packing_arithmetic_is_serial_greedy(sizes, budget):
    """seq_id = exclusive running size // budget — every sequence except
    possibly the last is 'full' (adding its first doc crossed the
    boundary), and ids are non-decreasing."""
    cum = np.concatenate(([0], np.cumsum(sizes)))[:-1]
    seq = cum // budget
    assert (np.diff(seq) >= 0).all()
    # a seq id is skipped only by a doc longer than the budget
    jumps = np.diff(seq)
    big = np.array(sizes[:-1]) > budget
    assert ((jumps <= 1) | big).all()


@settings(max_examples=100, deadline=None)
@given(keys=st.lists(st.integers(0, 10**9), min_size=0, max_size=200),
       permille=st.integers(0, 1000))
def test_stratified_membership_equals_formula(keys, permille):
    import ray  # noqa: F401  (module import only; no session needed)

    from raydatax.relational import stratified_sample  # noqa: F401

    v = np.array(keys, dtype=np.int64)
    mask = ((v % 1_000_003) * 2654435761) % 1000 < permille
    # duckdb-compatible reference: nonneg ints, same arithmetic
    ref = [((k % 1_000_003) * 2654435761) % 1000 < permille for k in keys]
    assert mask.tolist() == ref


def test_temperature_mixture_flattens_head():
    """alpha=0.5 must give the tail stratum a HIGHER keep rate than
    proportional sampling while keeping totals near the budget, and the
    alpha=1000 path must equal plain proportional mixture rates."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raydatax.relational import temperature_mixture_sample

    # head: 9000 rows of 'web', tail: 100 rows of 'books'
    n_web, n_books = 9000, 100
    t = pa.table({
        "k": pa.array(np.arange(n_web + n_books), pa.int64()),
        "s": pa.array(["web"] * n_web + ["books"] * n_books, pa.string()),
    })
    ds = rd.from_arrow(t)
    kept = temperature_mixture_sample(ds, "k", "s", total_rows=1000,
                                      alpha_permille=500).take_all()
    counts = {"web": 0, "books": 0}
    for r in kept:
        counts[r["s"]] += 1
    # sqrt weights: web ~ 94.9, books ~ 10 → books share ≈ 9.5% of 1000,
    # far above its 1.1% proportional share
    assert counts["books"] >= 60           # boosted tail
    assert 700 <= counts["web"] + counts["books"] <= 1300  # near budget

    import pytest
    with pytest.raises(ValueError, match="alpha_permille"):
        temperature_mixture_sample(ds, "k", "s", 100, alpha_permille=333)
