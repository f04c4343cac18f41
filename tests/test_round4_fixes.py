"""Round-4 directive pins: distributed keep-best canonicalization and the
Dataset-native exact-verify overloads (no driver pair lists)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _docs():
    """Three near-dup clusters + singletons, with a quality column that
    disagrees with min-id so keep-best is distinguishable from min-id."""
    base1 = "the quick brown fox jumps over the lazy dog " * 4
    base2 = "pack my box with five dozen liquor jugs today " * 4
    rows = [
        (10, base1, len(base1)),
        (11, base1 + "plus a longer tail here", len(base1) + 23),
        (12, base1 + "tail", len(base1) + 4),
        (20, base2, len(base2)),
        (21, base2 + "!!", len(base2) + 2),
        (50, "completely different content about databases", 44),
        (51, "ab", 2),  # shorter than the shingle width k=5
    ]
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "n_chars": pa.array([r[2] for r in rows], pa.int64()),
    })


def test_dataset_verify_matches_list_verify(ray_session):
    """The pair-Dataset overload must reproduce the list path bit-for-bit,
    including zero-intersection pairs and sub-k docs."""
    from raydatax.dedup import ngram_containment_verify, ngram_jaccard_verify

    t = _docs()
    ds = rd.from_arrow(t)
    pairs = [(10, 11), (10, 12), (20, 21), (10, 50), (10, 51), (50, 51)]
    want_j = {(r["a"], r["b"]): r["jaccard"]
              for r in ngram_jaccard_verify(ds, pairs, k=5).to_pylist()}
    want_c = {(r["a"], r["b"]): (r["contain_a"], r["contain_b"])
              for r in ngram_containment_verify(ds, pairs, k=5).to_pylist()}

    pd = rd.from_arrow(pa.table({
        "a": pa.array([p[0] for p in pairs], pa.int64()),
        "b": pa.array([p[1] for p in pairs], pa.int64()),
    }))
    got_j = {(r["a"], r["b"]): r["jaccard"]
             for r in ngram_jaccard_verify(ds, pd, k=5).take_all()}
    got_c = {(r["a"], r["b"]): (r["contain_a"], r["contain_b"])
             for r in ngram_containment_verify(ds, pd, k=5).take_all()}
    assert got_j == want_j  # exact float equality: same ints, one division
    assert got_c == want_c
    assert want_j[(10, 50)] == 0.0 and want_j[(10, 51)] == 0.0


def test_keep_best_distributed_path_matches_driver_path(ray_session):
    """Above the pair threshold keep_best_dedup must switch to min-label
    propagation + grouped_topk and return the identical relation."""
    from raydatax.dedup import keep_best_dedup

    t = _docs()
    ds = rd.from_arrow(t)
    pairs = rd.from_arrow(pa.table({
        "a": pa.array([10, 10, 20], pa.int64()),
        "b": pa.array([11, 12, 21], pa.int64()),
    }))

    def rel(out):
        return sorted(
            (r["doc_id"], r["canonical_id"], bool(r["keep"]))
            for r in out.take_all()
        )

    driver = rel(keep_best_dedup(ds, pairs, pair_driver_threshold=1_000))
    dist = rel(keep_best_dedup(ds, pairs, pair_driver_threshold=0))
    assert driver == dist
    # 11 is the longest of cluster {10,11,12}; 21 of {20,21}; singletons absent
    assert driver == [
        (10, 11, False), (11, 11, True), (12, 11, False),
        (20, 21, False), (21, 21, True),
    ]


def test_keep_best_empty_pairs(ray_session):
    from raydatax.dedup import keep_best_dedup

    ds = rd.from_arrow(_docs())
    empty = rd.from_arrow(pa.table({
        "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
    }))
    out = keep_best_dedup(ds, empty)
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "canonical_id", "keep"}


def test_portable_hash_join_matches_native(ray_session):
    """portable=True must agree with the native JoinOperator on inner and
    left_outer joins, including unmatched-left rows."""
    from raydatax.relational import hash_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "lv": pa.array(["a", "b", "c", "d"], pa.string()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([2, 3, 3, 9], pa.int64()),
        "rv": pa.array([20, 30, 31, 90], pa.int64()),
    }))

    def rel(ds):
        return sorted(
            (r["k"], r["lv"], r.get("rv")) for r in ds.take_all()
        )

    for jt in ("inner", "left_outer"):
        nat = rel(hash_join(left, right, on="k", join_type=jt))
        por = rel(hash_join(left, right, on="k", join_type=jt, portable=True))
        assert nat == por, jt


def test_edit_distance_verify_dataset_matches_list():
    """The pair-Dataset overload must be value-identical to the bounded
    list path, including missing endpoints (scored as empty string)."""
    from raydatax.dedup import edit_distance_verify

    docs = rd.from_arrow(_docs())
    pair_list = [(10, 11), (10, 12), (20, 21), (50, 51), (10, 999)]
    want = {(r["a"], r["b"]): r["edit_dist"]
            for r in edit_distance_verify(docs, pair_list).to_pylist()}
    pairs_ds = rd.from_arrow(pa.table({
        "a": pa.array([p[0] for p in pair_list], pa.int64()),
        "b": pa.array([p[1] for p in pair_list], pa.int64()),
    }))
    got_ds = edit_distance_verify(docs, pairs_ds)
    got = {(r["a"], r["b"]): r["edit_dist"] for r in got_ds.take_all()}
    assert got == want and len(got) == len(pair_list)


def test_edit_distance_verify_empty_pairs_dataset():
    from raydatax.dedup import edit_distance_verify

    docs = rd.from_arrow(_docs())
    empty = rd.from_arrow(pa.table({
        "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
    }))
    out = edit_distance_verify(docs, empty)
    assert out.count() == 0
    assert set(out.schema().names) == {"a", "b", "edit_dist"}
