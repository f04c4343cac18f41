"""BPE vocabulary learning: kernel parity, path equivalence, encoder."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from raydatax.bpe import (
    apply_merge,
    best_pair,
    delimit_words,
    encode_token_counts,
    learn_bpe,
    pair_counts,
)

CORPUS = [
    "the cat sat on the mat",
    "the cat ate the rat",
    "a cat and a rat sat",
    "aaaaa aaa the the the",
]


def _docs_ds():
    return rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(CORPUS)), pa.int64()), "text": CORPUS}
        )
    )


def test_pair_counts_weighted_hand_case():
    sym = delimit_words(pa.array(["ab", "aba"]))
    counts = pair_counts(sym, np.array([3, 2]))
    got = {
        (l, r): c
        for l, r, c in zip(
            counts["lft"].to_pylist(),
            counts["rgt"].to_pylist(),
            counts["cnt"].to_pylist(),
        )
    }
    # "ab"×3 → (a,b)=3; "aba"×2 → (a,b)=2, (b,a)=2
    assert got == {("a", "b"): 5, ("b", "a"): 2}


def test_best_pair_total_order_tiebreak():
    t = pa.table(
        {
            "lft": ["b", "a", "a"],
            "rgt": ["a", "z", "b"],
            "cnt": pa.array([7, 7, 7], pa.int64()),
        }
    )
    assert best_pair(t) == ("a", "b", 7)


def test_merge_application_matches_sql_replace_on_runs():
    """The documented substitution rule: leftmost non-overlapping — parity
    with DuckDB replace() pinned on adversarial repeated-symbol runs."""
    words = ["aaa", "aaaa", "aaaaa", "abaab", "xaaay", "a"]
    sym = delimit_words(pa.array(words))
    merged = apply_merge(sym, "a", "a").to_pylist()
    for raw, got in zip(sym.to_pylist(), merged):
        want = duckdb.sql(
            f"select replace('{raw}', '|a|a|', '|aa|')"
        ).fetchone()[0]
        assert got == want


def test_learn_bpe_driver_and_distributed_identical(ray_session):
    ds = _docs_ds()
    m_driver = learn_bpe(ds, n_merges=4)
    m_dist = learn_bpe(ds, n_merges=4, driver_threshold=1)
    assert m_driver.equals(m_dist)
    assert m_driver.num_rows == 4
    # round 1 pinned against a pure-Python pair count over the corpus
    from collections import Counter

    pair_c = Counter()
    for text in CORPUS:
        for w in text.split(" "):
            for i in range(len(w) - 1):
                pair_c[(w[i], w[i + 1])] += 1
    best = min(pair_c.items(), key=lambda kv: (-kv[1], kv[0]))
    assert (m_driver["lft"][0].as_py(), m_driver["rgt"][0].as_py()) == best[0]
    assert m_driver["pair_count"][0].as_py() == best[1]


def test_learn_bpe_merged_symbols_feed_later_rounds(ray_session):
    # a corpus engineered so round 2 merges a round-1 output symbol
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": ["abc abc abc ab"]})
    )
    m = learn_bpe(ds, n_merges=2)
    assert m["merged"].to_pylist() == ["ab", "abc"]
    assert m["pair_count"].to_pylist() == [4, 3]


def test_learn_bpe_stops_when_no_pairs(ray_session):
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": ["a b c d"]})
    )
    m = learn_bpe(ds, n_merges=5)
    assert m.num_rows == 0


def test_encode_counts_match_python_reference(ray_session):
    ds = _docs_ds()
    merges = learn_bpe(ds, n_merges=4)
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in encode_token_counts(ds, merges).take_all()
    }
    pairs = list(zip(merges["lft"].to_pylist(), merges["rgt"].to_pylist()))
    for doc_id, text in enumerate(CORPUS):
        n = 0
        for w in text.lower().split(" "):
            if not w.isalnum():
                continue
            s = "|" + "|".join(w) + "|"
            for l, r in pairs:
                s = s.replace(f"|{l}|{r}|", f"|{l}{r}|")
            n += s.count("|") - 1
        assert got[doc_id] == n, doc_id
