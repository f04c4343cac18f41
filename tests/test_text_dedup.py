"""Text analysis + dedup family over the documents corpus."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from raydatax.dedup import (
    exact_dedup,
    minhash_dedup,
    minhash_signatures,
    ngram_jaccard_verify,
    simhash64,
    simhash_pairs,
)
from raydatax.text import (
    LangId,
    fingerprint_md5,
    fingerprint_rolling,
    quality_stats,
    token_count,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return pq.read_table(f"{SF}/documents.parquet")


def test_fingerprint_and_shingles_large_string(docs):
    """large_string columns (int64 offsets) must hash identically to string
    columns — misreading offsets as int32 would silently corrupt dedup."""
    from raydatax.dedup import _buffers, shingle_hashes

    small = docs.slice(0, 50)
    big = small.set_column(
        small.schema.get_field_index("text"),
        "text",
        small["text"].cast(pa.large_string()),
    )
    h_small = fingerprint_rolling(small, "text")["fp64"].to_pylist()
    h_big = fingerprint_rolling(big, "text")["fp64"].to_pylist()
    assert h_small == h_big

    col_s = small["text"].combine_chunks()
    col_b = big["text"].combine_chunks()
    ws, os_ = shingle_hashes(col_s)
    wb, ob = shingle_hashes(col_b)
    assert np.array_equal(ws, wb) and np.array_equal(os_, ob)

    with pytest.raises(TypeError):
        _buffers(pa.array([1, 2, 3]))


@pytest.fixture(scope="module")
def corpus_with_dups(docs):
    dup = docs.slice(0, 10).set_column(
        0, "doc_id", pa.array(np.arange(90_000, 90_010))
    )
    return pa.concat_tables([docs, dup])


def test_token_count_and_quality(docs):
    out = quality_stats(token_count(docs))
    toks = out["n_tokens"].to_pylist()
    assert all(t > 0 for t in toks)
    py = [len(t.split()) for t in docs["text"].to_pylist()]
    assert toks == py, "token count must equal whitespace split"
    assert all(0 <= r <= 1 for r in out["punct_ratio"].to_pylist())


def test_langid_on_real_language_text():
    b = pa.table(
        {
            "text": [
                "the cat sat on the mat and the dog was in the house",
                "le chat est dans la maison avec le chien pour la nuit",
                "el perro es grande y la casa es una de las mejores",
                "der Hund ist nicht in der Küche und das ist ein Problem",
                "这是一个中文句子用于测试语言识别",
                "zzz qqq xxx",
            ]
        }
    )
    out = LangId()(b)
    assert out["lang_pred"].to_pylist() == ["en", "fr", "es", "de", "zh", None]


def test_fingerprints(docs):
    a = fingerprint_rolling(docs)["fp64"].to_pylist()
    b = fingerprint_rolling(docs)["fp64"].to_pylist()
    assert a == b
    assert len(set(a)) == len(a), "distinct texts -> distinct fingerprints"
    import hashlib

    md = fingerprint_md5(docs.slice(0, 3))["fp_md5"].to_pylist()
    want = [hashlib.md5(t.encode()).hexdigest() for t in docs["text"].to_pylist()[:3]]
    assert md == want


def test_exact_dedup(corpus_with_dups):
    out = exact_dedup(rd.from_arrow(corpus_with_dups)).to_pandas()
    assert len(out) == 500  # 500 distinct texts
    assert (out["n_copies"] > 1).sum() == 10
    # representative is the min doc_id (the original, not the 90k clone)
    assert out[out.n_copies > 1]["doc_id"].max() < 90_000


def test_minhash_dedup_recovers_planted(corpus_with_dups):
    out = minhash_dedup(rd.from_arrow(corpus_with_dups), threshold=0.8).to_pandas()
    planted = out[out.doc_id >= 90_000]
    assert (~planted.keep).all()
    assert (planted.cluster_rep == planted.doc_id - 90_000).all()


def test_minhash_dedup_distributed_path_matches_driver_path(corpus_with_dups):
    """pair_driver_threshold=0 forces distributed min-label propagation; the
    (doc_id, cluster_rep, keep) output must be identical to the driver
    union-find path, and the corpus id list must never be collected."""
    ds = rd.from_arrow(corpus_with_dups)
    a = minhash_dedup(ds, threshold=0.8).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        minhash_dedup(ds, threshold=0.8, pair_driver_threshold=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)
    assert len(a) == corpus_with_dups.num_rows


def test_propagate_min_labels_chain():
    """A 4-node chain (diameter 3) must converge to the component min."""
    from raydatax.dedup import propagate_min_labels

    pairs = rd.from_arrow(
        pa.table({"a": pa.array([10, 11, 12], pa.int64()),
                  "b": pa.array([11, 12, 13], pa.int64())})
    )
    out = propagate_min_labels(pairs).to_pandas().sort_values("node")
    assert out["node"].tolist() == [10, 11, 12, 13]
    assert out["label"].tolist() == [10, 10, 10, 10]


def test_simhash_hot_bucket_capped():
    """An adversarial bucket (identical text ⇒ one simhash slice bucket)
    must produce a capped pair count, not O(n²)."""
    n = 400
    t = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                  "text": pa.array(["same text for everyone here"] * n)})
    pairs = simhash_pairs(rd.from_arrow(t)).to_pandas()
    cap = 128
    assert len(pairs) <= cap * (cap - 1) // 2


def test_minhash_signature_similarity():
    t = pa.array(
        ["the quick brown fox jumps over the lazy dog " * 5,
         "the quick brown fox jumps over the lazy dog " * 5 + "extra!",
         "completely different content with other words entirely"]
    )
    sig = minhash_signatures(t)
    near = (sig[0] == sig[1]).mean()
    far = (sig[0] == sig[2]).mean()
    assert near > 0.7 > far


def test_simhash_properties():
    col = pa.array(
        ["alpha beta gamma delta epsilon zeta eta theta " * 4,
         "alpha beta gamma delta epsilon zeta eta theta " * 4 + "iota",
         "one two three four five six seven eight nine ten"]
    )
    sh = simhash64(col)
    ham = bin(int(sh[0]) ^ int(sh[1])).count("1")
    ham_far = bin(int(sh[0]) ^ int(sh[2])).count("1")
    assert ham < 8 < ham_far


def test_simhash_pairs_finds_planted(corpus_with_dups):
    pairs = simhash_pairs(rd.from_arrow(corpus_with_dups)).to_pandas()
    planted = pairs[(pairs.b - pairs.a) == 90_000]
    assert len(planted) == 10
    assert (planted.hamming == 0).all()


def test_ngram_jaccard(corpus_with_dups):
    out = ngram_jaccard_verify(
        rd.from_arrow(corpus_with_dups), [(0, 90_000), (0, 3)]
    ).to_pylist()
    assert out[0]["jaccard"] == 1.0
    assert out[1]["jaccard"] < 0.9


def test_embedding_neardup_recovers_planted():
    import pyarrow.parquet as pq
    from raydatax.dedup import embedding_neardup_pairs

    e = pq.read_table(f"{SF}/embeddings.parquet")
    # plant near-dups: copies of vec 0..4 with tiny noise
    import numpy as np

    base = np.stack([np.asarray(v, dtype=np.float32) for v in e["embedding"].to_pylist()[:5]])
    noisy = base + np.random.default_rng(0).normal(0, 1e-3, base.shape).astype(np.float32)
    clones = pa.table(
        {
            "vec_id": pa.array(np.arange(90_000, 90_005), pa.int64()),
            "embedding": pa.array([list(v) for v in noisy], pa.list_(pa.float32())),
            "label": pa.array([0] * 5, pa.int32()),
        }
    )
    corpus = pa.concat_tables([e.cast(clones.schema), clones])
    p1 = (embedding_neardup_pairs(rd.from_arrow(corpus), threshold=0.99)
          .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    found = set(zip(p1["a"], p1["b"]))
    assert {(i, 90_000 + i) for i in range(5)} <= found
    # determinism (the pair Dataset's content, order-insensitively)
    p2 = (embedding_neardup_pairs(rd.from_arrow(corpus), threshold=0.99)
          .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    assert p1.equals(p2)


def test_embedding_allpairs_exact_matches_numpy():
    """Blocked block-pair join == single-matrix numpy ground truth, and the
    approximate clustered variant is a subset of it."""
    import pyarrow.parquet as pq
    import numpy as np
    from raydatax.ann import _matrix, _normalize
    from raydatax.dedup import embedding_allpairs_exact, embedding_neardup_pairs

    e = pq.read_table(f"{SF}/embeddings.parquet")
    # small block_rows forces many cross-block tasks
    got = embedding_allpairs_exact(rd.from_arrow(e), threshold=0.35, block_rows=64)
    m = _normalize(_matrix(e["embedding"]))
    ids = e["vec_id"].to_numpy(zero_copy_only=False)
    sims = m @ m.T
    ii, jj = np.nonzero(sims >= 0.35)
    want = {(int(ids[i]), int(ids[j])) for i, j in zip(ii, jj) if ids[i] < ids[j]}
    assert {(r["a"], r["b"]) for r in got.to_pylist()} == want
    approx = embedding_neardup_pairs(rd.from_arrow(e), threshold=0.35)
    assert {(r["a"], r["b"]) for r in approx.take_all()} <= want


def test_search_topk_and_scroll(ray_session):
    """ES/solr search-reader analogue: TF scoring, deterministic tie order,
    search_after pagination equals the unpaged top-k, cursor exhaustion."""
    import ray.data as rd

    from raydatax.text import search_scroll, search_topk

    t = pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": pa.array([
            "cat cat cat", "cat dog", "dog", "nothing here",
            "cat cat cat", "dog dog", "cat", "x",
        ]),
    })
    ds = rd.from_arrow(t)
    top = search_topk(ds, ["cat", "dog"], 5)
    # ties broken by doc_id ascending: (3,id0),(3,id4),(2,id1),(2,id5),(1,..)
    assert top["doc_id"].to_pylist() == [0, 4, 1, 5, 2]
    assert top["score"].to_pylist() == [3, 3, 2, 2, 1]

    # scroll pages concatenated == unpaged top-k; final page exhausts
    got, cursor, pages = [], None, 0
    while True:
        page, cursor = search_scroll(ds, ["cat", "dog"], 2, cursor=cursor)
        got += page["doc_id"].to_pylist()
        pages += 1
        if cursor is None:
            break
    assert got == search_topk(ds, ["cat", "dog"], 10)["doc_id"].to_pylist()
    assert pages >= 3

    # no matches -> empty table, no cursor
    page, cursor = search_scroll(ds, ["zebra"], 3)
    assert page.num_rows == 0 and cursor is None


def test_search_scroll_string_ids(ray_session):
    """Cursor pagination over a STRING id column (the normal ES case):
    cursors carry string ids; empty pages keep the string id type."""
    import ray.data as rd

    from raydatax.text import search_scroll, search_topk

    t = pa.table({
        "doc_id": pa.array([f"doc-{i:02d}" for i in range(6)]),
        "text": pa.array(["cat cat", "cat", "dog", "cat", "z", "cat"]),
    })
    ds = rd.from_arrow(t)
    got, cursor = [], None
    while True:
        page, cursor = search_scroll(ds, ["cat", "dog"], 2, cursor=cursor)
        got += page["doc_id"].to_pylist()
        if cursor is None:
            break
    assert got == search_topk(ds, ["cat", "dog"], 10)["doc_id"].to_pylist()
    assert got[0] == "doc-00"  # score 2 first, then ties by id

    empty, cur = search_scroll(ds, ["zebra"], 2)
    assert empty.num_rows == 0 and cur is None
    assert empty.schema.field("doc_id").type == pa.string()


def test_tokenize_batch_empties_nulls_case():
    import pyarrow as pa
    from raydatax.text import tokenize_batch
    t = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["Hello  world", None, "a"],   # double space -> empty token dropped
    })
    out = tokenize_batch(t)
    rows = sorted(zip(out["doc_id"].to_pylist(), out["term"].to_pylist()))
    assert rows == [(1, "hello"), (1, "world"), (3, "a")]


def test_tfidf_top_terms_small_corpus():
    import math
    import pyarrow as pa
    import ray.data as rd
    from raydatax.text import tfidf_top_terms
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2],
        "text": ["cat cat dog", "dog fish"],
    }))
    out = tfidf_top_terms(ds, k=2).to_pandas()
    d1 = out[out.doc_id == 1].sort_values("rank")
    # 'cat' df=1 tf=2 -> 2*ln(2); 'dog' df=2 -> idf 0
    assert list(d1["term"]) == ["cat", "dog"]
    assert abs(d1.iloc[0]["tfidf"] - 2 * math.log(2)) < 1e-12
    assert d1.iloc[1]["tfidf"] == 0.0
    d2 = out[out.doc_id == 2].sort_values("rank")
    assert list(d2["term"]) == ["fish", "dog"]


def test_training_data_pipeline_example():
    """The examples/ showcase composes dedup -> quality gate -> lang-id
    actor pool -> token stats -> hash_split; smoke it end-to-end at
    sf0.001 and check the split invariants."""
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "training_data_pipeline",
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "training_data_pipeline.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    train, test = mod.build("/root/testdata/sf0.001")
    tr, te = train.to_pandas(), test.to_pandas()
    assert len(tr) + len(te) > 0
    assert set(tr["doc_id"]).isdisjoint(set(te["doc_id"]))
    for col in ("lang_pred", "n_tokens", "text"):
        assert col in tr.columns


def test_incremental_exact_dedup_index_lifecycle(tmp_path):
    """Crawl 1 seeds the index; crawl 2 drops docs already seen (cross-corpus)
    AND dups within itself; crawl 3 against the grown index drops crawl-2
    survivors too.  Matches a serial python reference at every step."""
    from raydatax.dedup import incremental_exact_dedup

    idx = str(tmp_path / "idx")

    def corpus(ids, texts):
        return rd.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
        ).repartition(3)

    c1 = corpus([1, 2, 3], ["aaa", "bbb", "aaa"])
    out1 = {r["doc_id"]: r["n_copies"]
            for r in incremental_exact_dedup(c1, idx).take_all()}
    assert out1 == {1: 2, 2: 1}  # min-id reps, within-crawl copy counts

    # crawl 2: 'aaa'/'bbb' already indexed; 'ccc' duplicated within
    c2 = corpus([10, 11, 12, 13], ["aaa", "ccc", "ccc", "bbb"])
    out2 = {r["doc_id"]: r["n_copies"]
            for r in incremental_exact_dedup(c2, idx).take_all()}
    assert out2 == {11: 2}

    # crawl 3: 'ccc' (crawl-2 survivor) is now indexed; 'ddd' is novel
    c3 = corpus([20, 21], ["ccc", "ddd"])
    out3 = {r["doc_id"]: r["n_copies"]
            for r in incremental_exact_dedup(c3, idx).take_all()}
    assert out3 == {21: 1}

    # update_index=False must leave the index untouched
    c4 = corpus([30], ["eee"])
    incremental_exact_dedup(c4, idx, update_index=False).materialize()
    out5 = {r["doc_id"]: r["n_copies"]
            for r in incremental_exact_dedup(corpus([40], ["eee"]), idx).take_all()}
    assert out5 == {40: 1}


def test_incremental_minhash_dedup_cross_crawl(tmp_path, docs):
    """Crawl 1 (exact copies of docs 0-9 planted as 90k ids) is indexed;
    crawl 2 re-sends copies of the SAME base docs plus novel docs: the
    copies must be killed by the INDEX (dup_of = the indexed id), the
    novel docs kept; a within-crawl-2 duplicate pair resolves to its min
    id.  Third assertion: the index grew by crawl-2 survivors only."""
    from raydatax.dedup import incremental_minhash_dedup, minhash_index_add

    idx = str(tmp_path / "lsh")
    base = docs.slice(0, 40)
    minhash_index_add(rd.from_arrow(base), idx)

    # crawl 2: copies of indexed docs 0..9 (ids 90k+), two copies of doc 50
    # (not indexed — a new-new pair), novel docs 60..69
    copies = base.slice(0, 10).set_column(
        0, "doc_id", pa.array(np.arange(90_000, 90_010))
    )
    nn = pa.concat_tables([
        docs.slice(50, 1).set_column(0, "doc_id", pa.array([70_000])),
        docs.slice(50, 1).set_column(0, "doc_id", pa.array([70_001])),
    ])
    novel = docs.slice(60, 10)
    crawl2 = pa.concat_tables([copies, nn, novel])
    out = incremental_minhash_dedup(
        rd.from_arrow(crawl2).repartition(3), idx, threshold=0.99
    ).to_pandas().set_index("doc_id").sort_index()

    planted = out.loc[90_000:90_009]
    assert (~planted.keep).all()
    assert (planted.dup_of == np.arange(10)).all()  # killed BY THE INDEX

    assert bool(out.loc[70_000].keep) and not bool(out.loc[70_001].keep)
    assert out.loc[70_001].dup_of == 70_000  # within-crawl cluster min

    kept_novel = out.loc[60:69]
    assert kept_novel.keep.all()

    # crawl 3: a copy of novel doc 60 must now be killed by the grown index
    crawl3 = docs.slice(60, 1).set_column(0, "doc_id", pa.array([95_000]))
    out3 = incremental_minhash_dedup(
        rd.from_arrow(crawl3), idx, threshold=0.99, update_index=False
    ).to_pandas()
    assert not bool(out3.keep.iloc[0]) and out3.dup_of.iloc[0] == 60


def test_incremental_embedding_dedup_cross_crawl(tmp_path):
    """IVF-probed embedding dedup against a persistent index: crawl-1
    vectors are indexed (centroids fixed at creation); crawl 2's noisy
    clones of indexed vectors are killed BY THE INDEX, its within-crawl
    clone pair resolves to the min id, novel vectors keep; the exact
    blocked baseline finds the same pair set; a crawl-3 clone of a crawl-2
    survivor is killed by the grown index."""
    from raydatax.dedup import (
        embedding_index_add,
        incremental_embedding_dedup,
        incremental_embedding_exact_pairs,
        incremental_embedding_pairs,
    )

    e = pq.read_table(f"{SF}/embeddings.parquet").select(["vec_id", "embedding"])
    idx = str(tmp_path / "ivf")
    base = e.slice(0, 60)
    embedding_index_add(rd.from_arrow(base), idx)

    rng = np.random.default_rng(3)

    def clones(src_rows, ids):
        m = np.stack([np.asarray(v, np.float32) for v in src_rows["embedding"].to_pylist()])
        noisy = m + rng.normal(0, 1e-3, m.shape).astype(np.float32)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(v) for v in noisy], pa.list_(pa.float32())),
        })

    crawl2 = pa.concat_tables([
        clones(e.slice(0, 5), np.arange(90_000, 90_005)),      # indexed clones
        clones(e.slice(70, 1), [70_000]),                       # vec 70 not indexed
        clones(e.slice(70, 1), [70_001]),                       # its twin
        e.slice(80, 10).cast(pa.schema([("vec_id", pa.int64()),
                                        ("embedding", pa.list_(pa.float32()))])),
    ])
    c2 = rd.from_arrow(crawl2).repartition(3)

    ivf = incremental_embedding_pairs(c2, idx, threshold=0.99).to_pandas()
    exact = incremental_embedding_exact_pairs(c2, idx, threshold=0.99).to_pandas()
    assert set(zip(ivf.a, ivf.b)) == set(zip(exact.a, exact.b))

    out = incremental_embedding_dedup(c2, idx, threshold=0.99).to_pandas()
    out = out.set_index("vec_id").sort_index()
    planted = out.loc[90_000:90_004]
    assert (~planted.keep).all()
    assert (planted.dup_of == np.arange(5)).all()
    assert bool(out.loc[70_000].keep) and not bool(out.loc[70_001].keep)
    assert out.loc[70_001].dup_of == 70_000
    assert out.loc[80:89].keep.all()

    crawl3 = clones(e.slice(70, 1), [95_000])  # near crawl-2 survivor 70_000
    out3 = incremental_embedding_dedup(
        rd.from_arrow(crawl3), idx, threshold=0.99, update_index=False
    ).to_pandas()
    assert not bool(out3.keep.iloc[0]) and out3.dup_of.iloc[0] == 70_000


def test_incremental_embedding_first_crawl_bootstrap(tmp_path):
    """incremental_embedding_dedup on a NONEXISTENT index fits + persists
    the centroids itself (first crawl of the steady-state loop): within-
    crawl clones resolve, and the created index kills a later clone."""
    from raydatax.dedup import incremental_embedding_dedup

    e = pq.read_table(f"{SF}/embeddings.parquet").select(["vec_id", "embedding"])
    idx = str(tmp_path / "ivf")
    rng = np.random.default_rng(9)
    m = np.stack([np.asarray(v, np.float32) for v in e["embedding"].to_pylist()[:1]])
    clone = pa.table({
        "vec_id": pa.array([50_000], pa.int64()),
        "embedding": pa.array(
            [list((m + rng.normal(0, 1e-3, m.shape).astype(np.float32))[0])],
            pa.list_(pa.float32())),
    })
    crawl1 = pa.concat_tables([
        e.slice(0, 30).cast(pa.schema([("vec_id", pa.int64()),
                                       ("embedding", pa.list_(pa.float32()))])),
        clone,
    ])
    out = incremental_embedding_dedup(
        rd.from_arrow(crawl1), idx, threshold=0.99
    ).to_pandas().set_index("vec_id")
    assert not bool(out.loc[50_000].keep) and out.loc[50_000].dup_of == 0
    assert out.loc[0:29].keep.all()

    crawl2 = clone.set_column(0, "vec_id", pa.array([60_000], pa.int64()))
    out2 = incremental_embedding_dedup(
        rd.from_arrow(crawl2), idx, threshold=0.99, update_index=False
    ).to_pandas()
    assert not bool(out2.keep.iloc[0]) and out2.dup_of.iloc[0] == 0


def test_index_epoch_commit_is_crash_atomic(tmp_path, docs):
    """A crashed index add leaves only a .stage-epoch-N dir: probes must
    not see its rows, and the retry commits the same epoch number."""
    import os

    from raydatax.dedup import (
        _lsh_index_files,
        incremental_exact_dedup,
        minhash_index_add,
    )

    idx = str(tmp_path / "lsh")
    minhash_index_add(rd.from_arrow(docs.slice(0, 20)), idx)

    # simulate a crashed second add: stage dir written, rename never ran
    stage = os.path.join(idx, ".stage-epoch-1")
    os.makedirs(stage)
    pq.write_table(pq.read_table(f"{idx}/epoch-0/" + os.listdir(f"{idx}/epoch-0")[0]),
                   os.path.join(stage, "part-0.parquet"))

    files, next_epoch = _lsh_index_files(idx)
    assert next_epoch == 1  # the stage dir is invisible
    assert all("/.stage-" not in f for f in files)

    # retry lands as epoch-1, replacing the stage
    minhash_index_add(rd.from_arrow(docs.slice(20, 10)), idx)
    assert os.path.isdir(os.path.join(idx, "epoch-1"))
    assert not os.path.exists(stage)

    # the exact-dedup index uses the same commit: kill-safe by construction
    eidx = str(tmp_path / "exact")
    incremental_exact_dedup(rd.from_arrow(docs.slice(0, 5)), eidx)
    # epoch dir + the bucket-count meta (index-level state, round 3)
    assert sorted(os.listdir(eidx)) == ["_index.json", "epoch-0"]
    # epochs are hash-partitioned on disk so probes can prune their read
    assert all(d.startswith("__bucket=")
               for d in os.listdir(os.path.join(eidx, "epoch-0")))


# ---------------------------------------------- duplicated-span removal


def _span_corpus():
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    "the quick brown fox jumps over the lazy dog tail",
                    "intro words the quick brown fox jumps over outro",
                    "totally unrelated content with fresh vocabulary here",
                    "the quick brown fox jumps over",  # fully covered at n=6
                    "short doc",  # shorter than n: no grams, untouched
                ]
            ),
        }
    )


def test_span_removal_broadcast_path(ray_session):
    from raydatax.dedup import duplicated_span_removal

    out = duplicated_span_removal(
        rd.from_arrow(_span_corpus()), n=6, min_count=2, min_docs=2
    ).take_all()
    rows = {r["doc_id"]: r for r in out}
    assert len(rows) == 5
    # docs 1/2/4 share "the quick brown fox jumps over" (6 tokens)
    assert rows[1]["n_removed"] == 6
    assert rows[1]["text_clean"] == "the lazy dog tail"
    assert rows[2]["text_clean"] == "intro words outro"
    assert rows[4] == {
        "doc_id": 4, "n_tokens": 6, "n_removed": 6, "text_clean": ""
    }
    assert rows[3]["n_removed"] == 0
    assert rows[5] == {
        "doc_id": 5, "n_tokens": 2, "n_removed": 0, "text_clean": "short doc"
    }


def test_span_removal_overlapping_spans_union(ray_session):
    from raydatax.dedup import duplicated_span_removal

    # "a b c d" and "b c d e" both hot at n=4 -> union covers a..e
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "x a b c d e y",
                    "a b c d q q q",
                    "p b c d e p p",
                ]
            ),
        }
    )
    out = duplicated_span_removal(
        rd.from_arrow(t), n=4, min_count=2, min_docs=2
    ).take_all()
    rows = {r["doc_id"]: r for r in out}
    assert rows[1]["text_clean"] == "x y"
    assert rows[1]["n_removed"] == 5


def test_span_removal_min_docs_gate(ray_session):
    from raydatax.dedup import duplicated_span_removal

    # the repeated gram lives in ONE doc only: min_docs=2 must spare it
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b c z a b c", "other words entirely here"]),
        }
    )
    out = duplicated_span_removal(
        rd.from_arrow(t), n=3, min_count=2, min_docs=2
    ).take_all()
    assert all(r["n_removed"] == 0 for r in out)
    out2 = duplicated_span_removal(
        rd.from_arrow(t), n=3, min_count=2, min_docs=1
    ).take_all()
    assert {r["doc_id"]: r["n_removed"] for r in out2} == {1: 6, 2: 0}


def test_span_removal_paths_differential(ray_session):
    """Broadcast path == reassembly path on the sf0.001 documents table."""
    from raydatax.dedup import duplicated_span_removal

    ds = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    kw = dict(n=8, min_count=2, min_docs=2)
    fast = duplicated_span_removal(ds, **kw).take_all()
    slow = duplicated_span_removal(ds, broadcast_threshold=0, **kw).take_all()
    key = lambda rows: sorted(  # noqa: E731
        (r["doc_id"], r["n_tokens"], r["n_removed"], r["text_clean"]) for r in rows
    )
    assert key(fast) == key(slow)
    assert any(r["n_removed"] > 0 for r in fast)
    assert any(r["n_removed"] == 0 for r in fast)


# ------------------------------------------------------ similarity join


def test_similarity_join_cross_side_only(ray_session):
    from raydatax.dedup import similarity_join

    left = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 2, 4], pa.int64()),
        "text": pa.array([
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy dog",  # dup of id 0
            "completely different content with no overlap at all",
        ]),
    }))
    right = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 3], pa.int64()),
        "text": pa.array([
            "the quick brown fox jumps over the lazy dog!",  # near-dup
            "unrelated right side text about something else",
        ]),
    }))
    out = similarity_join(left, right, threshold=0.5).to_pylist()
    got = {(r["a"], r["b"]) for r in out}
    # left ids 0 and 2 both match right id 1; the left-left dup (0,2)
    # must NOT appear — this is a join, not a dedup
    assert got == {(0, 1), (2, 1)}
    assert all(r["jaccard"] >= 0.5 for r in out)


def test_similarity_join_candidates_unverified(ray_session):
    from raydatax.dedup import similarity_join

    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["same exact text here", "same exact text here"]),
    })
    left = rd.from_arrow(t.filter(pa.array([True, False])))
    right = rd.from_arrow(t.filter(pa.array([False, True])))
    cand = similarity_join(left, right, verify=False).take_all()
    assert len(cand) == 1
    assert cand[0]["a"] == 0 and cand[0]["b"] == 1
    assert cand[0]["est_jaccard"] == 1.0


def test_similarity_join_empty_side(ray_session):
    from raydatax.dedup import similarity_join

    left = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["some text"]),
    }))
    right = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))
    out = similarity_join(left, right, threshold=0.1)
    assert out.num_rows == 0


# --------------------------------------------------- semantic dedup


def test_semantic_dedup_keep_greedy_rule(ray_session):
    import numpy as np
    import ray.data as rd

    from raydatax.dedup import semantic_dedup_keep

    # vecs 0,1 near-identical; 2 orthogonal; 3 duplicates 2
    vecs = np.array([[1.0, 0.0], [0.999, 0.01], [0.0, 1.0], [0.01, 0.999]],
                    dtype=np.float32)
    t = pa.table({
        "vec_id": pa.array([10, 11, 20, 21], pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    keep = sorted(r["vec_id"] for r in
                  semantic_dedup_keep(rd.from_arrow(t), threshold=0.95,
                                      block_rows=2).take_all())
    assert keep == [10, 20]  # smaller id of each dup pair survives


def test_semantic_dedup_exact_vs_approx_paths(ray_session):
    import numpy as np
    import ray.data as rd

    from raydatax.dedup import semantic_dedup_keep

    rng = np.random.default_rng(3)
    base = rng.normal(size=(40, 16)).astype(np.float32)
    dup = base[:10] + rng.normal(scale=1e-3, size=(10, 16)).astype(np.float32)
    all_v = np.vstack([base, dup])
    t = pa.table({
        "vec_id": pa.array(range(50), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in all_v],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(t)
    exact = sorted(r["vec_id"] for r in
                   semantic_dedup_keep(ds, 0.999, block_rows=8).take_all())
    approx = sorted(r["vec_id"] for r in
                    semantic_dedup_keep(ds, 0.999, exact=False).take_all())
    assert exact == sorted(range(40))  # the 10 planted dups drop
    assert approx == exact  # IVF path finds the same planted dups here


def test_semantic_dedup_rules_differ_on_chains(ray_session):
    import numpy as np
    import ray.data as rd

    from raydatax.dedup import semantic_dedup_keep

    # chain: 0~1, 1~2, but 0 !~ 2 (angles 0, ~25, ~50 degrees)
    import math

    angs = [0.0, math.radians(25), math.radians(50)]
    t = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array(
            [[math.cos(a), math.sin(a)] for a in angs], pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(t)
    thr = 0.95  # cos(25deg)=.906<.95? no: .906 -> pick .9
    thr = 0.9
    dom = sorted(r["vec_id"] for r in
                 semantic_dedup_keep(ds, thr, block_rows=2).take_all())
    greedy = sorted(r["vec_id"] for r in
                    semantic_dedup_keep(ds, thr, block_rows=2,
                                        rule="greedy").take_all())
    assert dom == [0]          # dominance over-deletes the chain tail
    assert greedy == [0, 2]    # keep-first keeps the far end

    import pytest

    with pytest.raises(ValueError):
        semantic_dedup_keep(ds, thr, exact=False, rule="greedy")
    with pytest.raises(ValueError):
        semantic_dedup_keep(ds, thr, rule="bogus")


def test_dedup_keep_best_prefers_quality_over_min_id(ray_session, tmp_path, monkeypatch):
    """The canonical doc is the LONGEST of a cluster, not the smallest id."""
    import pyarrow.parquet as pq

    base = "the quick brown fox jumps over the lazy dog " * 4
    t = pa.table({
        "doc_id": pa.array([10, 11, 50], pa.int64()),
        "text": pa.array([base, base + "plus tail",
                          "completely different content here"], pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
        "n_chars": pa.array([len(base), len(base) + 9, 33], pa.int64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    from raydatax.pipelines import dedup_keep_best

    rows = {r["doc_id"]: r for r in dedup_keep_best(str(d)).take_all()}
    # 10 and 11 are near-dups; 11 is longer so it is canonical despite 10 < 11
    assert rows[10]["canonical_id"] == 11 and not rows[10]["keep"]
    assert rows[11]["canonical_id"] == 11 and rows[11]["keep"]
    assert 50 not in rows  # singletons never enter the clustered relation
