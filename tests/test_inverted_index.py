"""Inverted index (text.build_inverted_index / text.index_and_query):
posting order, df counts, min_df filter, AND retrieval, empty results."""

import pyarrow as pa
import ray.data as rd

from raydatax.text import build_inverted_index, index_and_query


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                   "text": pa.array(texts, pa.string())}))


def _index_map(idx):
    return {r["term"]: (int(r["df"]), r["postings"]) for r in idx.take_all()}


def test_postings_sorted_distinct_lowercased(ray_session):
    # doc 2 repeats "b b" — postings must stay distinct; "B" lowercases
    idx = _index_map(build_inverted_index(_docs(["a B", "b a", "b b"],
                                                ids=[5, 3, 2])))
    assert idx["a"] == (2, "3,5")
    assert idx["b"] == (3, "2,3,5")


def test_min_df_filters_tail(ray_session):
    idx = _index_map(build_inverted_index(_docs(["a b", "a c", "a d"]),
                                          min_df=3))
    assert set(idx) == {"a"}
    assert idx["a"] == (3, "0,1,2")


def test_and_query_intersects(ray_session):
    ds = _docs(["x y z", "x y", "y z", "x z q"])
    idx = build_inverted_index(ds)
    got = sorted(r["doc_id"] for r in index_and_query(idx, ["x", "z"]).take_all())
    assert got == [0, 3]
    # duplicate query terms collapse: k counts unique terms
    got = sorted(r["doc_id"] for r in index_and_query(idx, ["x", "x"]).take_all())
    assert got == [0, 1, 3]


def test_and_query_empty_intersection(ray_session):
    ds = _docs(["only alpha", "only beta"])
    idx = build_inverted_index(ds)
    out = index_and_query(idx, ["alpha", "beta"])
    assert out.count() == 0


# --------------------------------------------- containment verify


def test_ngram_containment_quote_vs_jaccard(ray_session):
    from raydatax.dedup import ngram_containment_verify, ngram_jaccard_verify

    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"w{i}q{i * 7}z" for i in range(120))
    host = quote + " " + filler
    ds = _docs([quote, host], ids=[1, 2])
    cont = ngram_containment_verify(ds, [(1, 2)], k=5).to_pylist()[0]
    jac = ngram_jaccard_verify(ds, [(1, 2)], k=5).to_pylist()[0]
    assert cont["contain_a"] == 1.0  # every gram of the quote is in the host
    assert cont["contain_b"] < 0.2
    assert jac["jaccard"] < 0.2  # Jaccard alone would miss the inclusion


def test_ngram_containment_empty_and_missing(ray_session):
    from raydatax.dedup import ngram_containment_verify

    ds = _docs(["abcdefgh"], ids=[1])
    rows = ngram_containment_verify(ds, [(1, 99)], k=5).to_pylist()
    assert rows == [{"a": 1, "b": 99, "contain_a": 0.0, "contain_b": 0.0}]


# --------------------------------------------- edit-distance verify


def test_edit_distance_matches_duckdb(ray_session):
    import duckdb

    from raydatax.dedup import edit_distance_verify

    texts = ["kitten", "sitting", "", "abc", "acb", "abc"]
    ds = _docs(texts, ids=list(range(6)))
    pairs = [(0, 1), (2, 3), (4, 5), (3, 5)]
    got = {(r["a"], r["b"]): r["edit_dist"]
           for r in edit_distance_verify(ds, pairs).to_pylist()}
    for (a, b), d in got.items():
        want = duckdb.sql(
            f"SELECT levenshtein('{texts[a]}', '{texts[b]}')").fetchone()[0]
        assert d == want, (a, b, d, want)
    assert got[(0, 1)] == 3 and got[(3, 5)] == 0


def test_edit_distance_missing_doc_counts_as_empty(ray_session):
    from raydatax.dedup import edit_distance_verify

    ds = _docs(["abcd"], ids=[1])
    rows = edit_distance_verify(ds, [(1, 404)]).to_pylist()
    assert rows == [{"a": 1, "b": 404, "edit_dist": 4}]


# ----------------------------------------------- BM25 / phrase search


def test_bm25_ranks_rarer_term_higher(ray_session):
    from raydatax.text import bm25_topk

    # 'rare' appears in one doc, 'common' in all four
    docs = ["rare common x", "common y z", "common a b", "common c d"]
    out = bm25_topk(_docs(docs), ["rare", "common"], k=4).take_all()
    assert out[0]["doc_id"] == 0  # the rare-term doc wins
    assert out[0]["score_micro"] > out[1]["score_micro"]
    assert len(out) == 4


def test_bm25_length_normalization(ray_session):
    from raydatax.text import bm25_topk

    # same tf for 'hit', but doc 1 is much longer -> lower score
    docs = ["hit one two", "hit " + " ".join(f"f{i}" for i in range(40))]
    out = {r["doc_id"]: r["score_micro"]
           for r in bm25_topk(_docs(docs), ["hit"], k=2).take_all()}
    assert out[0] > out[1]


def test_phrase_search_adjacency_and_order(ray_session):
    from raydatax.text import phrase_search

    docs = ["alpha beta gamma", "beta alpha", "alpha x beta", "alpha beta"]
    got = sorted(r["doc_id"] for r in
                 phrase_search(_docs(docs), ["alpha", "beta"]).take_all())
    assert got == [0, 3]  # reversed and gapped orders do not match


def test_phrase_search_three_terms_and_guard(ray_session):
    import pytest

    from raydatax.text import phrase_search

    docs = ["a b c d", "a b x c", "b c d"]
    got = sorted(r["doc_id"] for r in
                 phrase_search(_docs(docs), ["a", "b", "c"]).take_all())
    assert got == [0]
    with pytest.raises(ValueError):
        phrase_search(_docs(docs), ["solo"])


# ------------------------------------------------ PMI collocations


def test_cooccurrence_pairs_window_and_boundary(ray_session):
    from raydatax.text import cooccurrence_pairs

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a b c", "c a"], pa.string())})
    rows = cooccurrence_pairs(t, window=2).to_pylist()
    got = sorted((r["a"], r["b"]) for r in rows)
    # doc1: (a,b) d1, (b,c) d1, (a,c) d2; doc2: (a,c) d1 canonicalized —
    # never (c, <doc1 token>) across the boundary
    assert got == [("a", "b"), ("a", "c"), ("a", "c"), ("b", "c")]


def test_pmi_ranks_exclusive_pair_first(ray_session):
    from raydatax.text import pmi_collocations

    # "x y" always together; "p q" co-occur but p and q also appear alone
    docs = ["x y"] * 6 + ["p q"] * 6 + ["p r", "q s"] * 6
    out = pmi_collocations(_docs(docs), window=2, min_count=5, k=3).take_all()
    assert (out[0]["a"], out[0]["b"]) == ("x", "y")
    assert out[0]["pmi_micro"] > out[-1]["pmi_micro"]
    assert out[0]["rank"] == 1
