"""LM perplexity scoring (text.fit_unigram_counts / text.lm_perplexity):
broadcast vs distributed-join path parity, OOV accounting, empty docs,
and the integer-micro log-prob discipline."""

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from raydatax.text import _logp_micro, fit_unigram_counts, lm_perplexity


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                   "text": pa.array(texts, pa.string())}))


def _as_map(res):
    rows = res.to_pandas().sort_values("doc_id")
    return {
        int(r.doc_id): (int(r.n_tokens), int(r.n_oov), int(r.logp_micro))
        for r in rows.itertuples()
    }


def test_lm_perplexity_hand_computed(ray_session):
    # reference corpus: "a a b" → vocab {a:2, b:1}, N=3, V=2, denom=5
    ref = _docs(["a a b"])
    vocab = fit_unigram_counts(ref)
    scored = _as_map(lm_perplexity(_docs(["a b", "c", ""]), vocab))

    denom = 5
    lp = lambda c: math.floor(math.log((c + 1) / denom) * 1e6 + 0.5)
    assert scored[0] == (2, 0, lp(2) + lp(1))
    assert scored[1] == (1, 1, lp(0))  # OOV token smoothed at c=0
    assert scored[2] == (0, 0, 0)  # empty doc kept at zeros


def test_lm_perplexity_paths_identical(ray_session):
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(words, size=rng.integers(1, 30)))
             for _ in range(120)]
    ds = _docs(texts)
    vocab = fit_unigram_counts(_docs(texts[:60]))
    bcast = _as_map(lm_perplexity(ds, vocab))
    dist = _as_map(lm_perplexity(ds, vocab, broadcast_limit=0))
    assert bcast == dist


def test_lm_perplexity_lowercases_like_corpus_contract(ray_session):
    vocab = fit_unigram_counts(_docs(["Hello World"]))
    scored = _as_map(lm_perplexity(_docs(["HELLO hello"]), vocab))
    assert scored[0][0] == 2 and scored[0][1] == 0  # both hit the vocab


def test_logp_micro_matches_sql_expression():
    import duckdb

    counts = np.array([0, 1, 2, 7, 1000], dtype=np.int64)
    denom = 1234
    got = _logp_micro(counts, denom)
    want = duckdb.sql(
        "SELECT CAST(floor(ln(CAST(c + 1 AS DOUBLE) / CAST(1234 AS DOUBLE))"
        " * 1000000.0 + 0.5) AS BIGINT) AS lp"
        " FROM (SELECT unnest([0, 1, 2, 7, 1000]) AS c)"
    ).fetchnumpy()["lp"]
    assert list(got) == list(want)


# -------------------------------------------------- mixture sampling


def test_mixture_sample_rates_and_caps(ray_session):
    import ray.data as rd

    from raydatax.relational import mixture_sample

    n = 1000
    t = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "s": pa.array((["big"] * 800) + (["small"] * 200), pa.string()),
    })
    ds = rd.from_arrow(t)
    # target 200/stratum: big rate = 1e6*200//800 = 250000 ppm, small capped
    out = mixture_sample(ds, "k", "s", target_rows=200).take_all()
    small = [r for r in out if r["s"] == "small"]
    big = [r for r in out if r["s"] == "big"]
    assert len(small) == 200  # rate capped at 10^6 keeps everything
    want_big = [k for k in range(800)
                if ((k % 1_000_003) * 2654435761) % 1_000_000 < 250_000]
    assert sorted(r["k"] for r in big) == want_big

    # dict targets: absent strata are dropped
    out = mixture_sample(ds, "k", "s", target_rows={"small": 100}).take_all()
    assert all(r["s"] == "small" for r in out)

    import pytest

    with pytest.raises(ValueError):
        mixture_sample(ds, "k", "s", target_rows=-1)


def test_mixture_sample_huge_stratum_downsamples_not_drops(ray_session):
    import ray.data as rd

    from raydatax.relational import mixture_sample

    n = 120_000  # permille resolution would floor 1000*10//120000 to 0
    t = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "s": pa.array(["web"] * n, pa.string()),
    })
    out = mixture_sample(rd.from_arrow(t), "k", "s", target_rows=10).take_all()
    # ppm rate = max(1, 83) = 83 -> ~10 rows survive, never zero
    assert 0 < len(out) < 100


# -------------------------------------------- incremental vocabulary


def test_unigram_index_incremental_equals_oneshot(ray_session, tmp_path):
    import ray.data as rd

    from raydatax.text import (
        fit_unigram_counts,
        lm_perplexity,
        read_unigram_index,
        unigram_index_add,
        unigram_index_compact,
    )

    texts_a = ["a a b c", "b d e"] * 5
    texts_b = ["c c f", "a f f g"] * 5
    idx = str(tmp_path / "lmidx")
    unigram_index_add(idx, _docs(texts_a))
    unigram_index_add(idx, _docs(texts_b, ids=range(100, 100 + len(texts_b))))
    merged = read_unigram_index(idx)
    all_docs = _docs(texts_a + texts_b)
    oneshot = fit_unigram_counts(all_docs)

    probe = _docs(["a b f zz", ""], ids=[0, 1])
    inc = _as_map(lm_perplexity(probe, merged))
    one = _as_map(lm_perplexity(probe, oneshot))
    assert inc == one

    # compaction folds the epochs without changing a single score
    rep = unigram_index_compact(idx)
    assert rep["folded"] == 2
    after = _as_map(lm_perplexity(probe, read_unigram_index(idx)))
    assert after == inc
    # compacting a single live epoch is a no-op
    assert unigram_index_compact(idx) == {"folded": 0}


def test_bigram_pairs_batch_compaction():
    """Adjacency is over the COMPACTED stream: empty tokens (double
    spaces) are dropped BEFORE pairing, single-token and empty docs emit
    nothing, pairs never cross documents."""
    import pyarrow as pa

    from raydatax.text import bigram_pairs_batch

    batch = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["A  b c", "solo", "", "x y"], pa.string()),
    })
    out = bigram_pairs_batch(batch)
    rows = sorted(zip(out["doc_id"].to_pylist(),
                      out["w1"].to_pylist(), out["w2"].to_pylist()))
    # doc 1: "a  b c" → tokens [a, b, c] → (a,b), (b,c) — the double space
    # must NOT break adjacency; docs 2/3 emit nothing; doc 4 → (x,y)
    assert rows == [(1, "a", "b"), (1, "b", "c"), (4, "x", "y")]


def test_bigram_perplexity_known_values():
    """Tiny closed-form corpus: ref doc 'a b a b', V=2; transitions
    (a,b)x2, (b,a)x1 → c2(a,b)=2, c2(b,a)=1, c1(a)=2, c1(b)=1."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from raydatax.text import bigram_perplexity, fit_bigram_counts

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b a b", "a b z"], pa.string()),
    }))
    ref = docs.filter(lambda r: r["doc_id"] == 1)
    bigrams, contexts, v = fit_bigram_counts(ref)
    assert v == 2
    out = {r["doc_id"]: r for r in bigram_perplexity(docs, bigrams, contexts, v).take_all()}
    def micro(c2, c1):
        return math.floor(math.log((c2 + 1) / (c1 + v)) * 1e6 + 0.5)
    # doc 1: (a,b) c2=2 c1=2; (b,a) c2=1 c1=1; (a,b) again
    assert out[1]["n_bigrams"] == 3 and out[1]["n_oov"] == 0
    assert out[1]["logp_micro"] == 2 * micro(2, 2) + micro(1, 1)
    # doc 2: (a,b) seen; (b,z) unseen (c2=0, context b c1=1)
    assert out[2]["n_bigrams"] == 2 and out[2]["n_oov"] == 1
    assert out[2]["logp_micro"] == micro(2, 2) + micro(0, 1)


def test_bigram_perplexity_broadcast_matches_distributed():
    """The adaptive broadcast path and the shuffle-join path must be
    value-identical (same pc.ln kernel over the same division)."""
    import pyarrow as pa
    import ray.data as rd

    from raydatax.text import bigram_perplexity, fit_bigram_counts

    texts = ["the cat sat on the mat", "the cat ran", "a dog sat",
             "", "solo", "the   spaced   out   doc"]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    bigrams, contexts, v = fit_bigram_counts(docs)
    a = {r["doc_id"]: (r["n_bigrams"], r["n_oov"], r["logp_micro"])
         for r in bigram_perplexity(docs, bigrams, contexts, v).take_all()}
    b = {r["doc_id"]: (r["n_bigrams"], r["n_oov"], r["logp_micro"])
         for r in bigram_perplexity(docs, bigrams, contexts, v,
                                    broadcast_limit=0).take_all()}
    assert a == b and len(a) == len(texts)


def test_bigram_index_two_epochs_equal_one_shot(tmp_path):
    """Two index epochs (disjoint crawls) merged must equal a one-shot
    fit over the union — the mergeable-counts contract."""
    import pyarrow as pa
    import ray.data as rd

    from raydatax.text import (
        bigram_index_add,
        fit_bigram_counts,
        read_bigram_index,
    )

    texts = ["the cat sat", "the cat ran far", "a dog sat down",
             "the dog and the cat"]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    idx = str(tmp_path / "bigidx")
    bigram_index_add(idx, docs.filter(lambda r: r["doc_id"] < 2))
    bigram_index_add(idx, docs.filter(lambda r: r["doc_id"] >= 2))
    bi, ci, vi = read_bigram_index(idx)
    b1, c1, v1 = fit_bigram_counts(docs)

    def as_map(ds, keys):
        return {tuple(r[k] for k in keys): r[[c for c in r if c not in keys][0]]
                for r in ds.take_all()}

    assert as_map(bi, ["w1", "w2"]) == as_map(b1, ["w1", "w2"])
    assert as_map(ci, ["w1"]) == as_map(c1, ["w1"])
    assert vi == v1
