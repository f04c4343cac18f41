"""Training-data prep operators: normalization, PII redaction, ordinal
explode, n-grams, repetition stats, decontamination, prefix sum, packing."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from raydatax.relational import ordered_prefix_sum, pack_sequences
from raydatax.text import (
    RedactPii,
    explode_tokens,
    ngram_contamination,
    ngram_table,
    normalize_text,
    repetition_stats,
)


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_normalize_text_collapses_and_trims():
    t = _docs(["  HeLLo\t  World \n", "a", ""])
    out = normalize_text(t)["norm"].to_pylist()
    assert out == ["hello world", "a", ""]


def test_redact_pii_rules_and_order():
    t = _docs(["mail bob.smith+x@corp.example.org now",
               "host 192.168.0.1 up",
               "call +1-555-0134 today",
               "clean text"])
    out = RedactPii()(t)["redacted"].to_pylist()
    assert out == ["mail <EMAIL> now", "host <IP> up",
                   "call <PHONE> today", "clean text"]


def test_explode_tokens_keeps_empties_with_positions():
    t = _docs(["a  b", "x"])  # double space -> empty middle token
    out = explode_tokens(t)
    assert out["tok"].to_pylist() == ["a", "", "b", "x"]
    assert out["pos"].to_pylist() == [1, 2, 3, 1]
    assert out["doc_id"].to_pylist() == [0, 0, 0, 1]


def test_ngram_table_respects_doc_boundaries():
    t = _docs(["one two three four", "a b", "solo"])
    out = ngram_table(t, 3, pos_col="pos")
    assert out["ng"].to_pylist() == ["one two three", "two three four"]
    assert out["doc_id"].to_pylist() == [0, 0]
    assert out["pos"].to_pylist() == [1, 2]
    # n=1 degenerates to the token explode (minus empties handling: kept)
    uni = ngram_table(t, 1)
    assert uni.num_rows == 4 + 2 + 1


def test_ngram_table_empty_and_short():
    t = _docs([], [])
    assert ngram_table(t, 3).num_rows == 0
    t2 = _docs(["a b"])
    assert ngram_table(t2, 3).num_rows == 0


def test_repetition_stats(ray_session):
    ds = rd.from_arrow(_docs(["a a a b", "x y z w"]))
    out = {r["doc_id"]: r for r in repetition_stats(ds).take_all()}
    assert out[0]["n_tok"] == 4 and out[0]["n_distinct"] == 2
    assert out[0]["top_count"] == 3 and out[0]["top_frac"] == 0.75
    assert out[1]["top_frac"] == 0.25 and out[1]["distinct_frac"] == 1.0


def test_ngram_contamination(ray_session):
    train = rd.from_arrow(_docs(
        ["the quick brown fox jumps", "totally unique words here", "quick brown fox again"],
        [1, 2, 3]))
    bench = rd.from_arrow(_docs(["lazy quick brown fox sleeps"], [100]))
    out = {r["doc_id"]: r["n_hits"] for r in ngram_contamination(train, bench, n=3).take_all()}
    # "quick brown fox" is the only shared 3-gram
    assert out == {1: 1, 3: 1}


def test_ordered_prefix_sum_multiblock(ray_session):
    n = 5000
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 100, n)
    ids = rng.permutation(n)
    t = pa.table({"k": pa.array(ids, pa.int64()), "v": pa.array(vals, pa.int64())})
    ds = rd.from_arrow(t).repartition(8)
    out = ordered_prefix_sum(ds, "k", "v", out="run").to_pandas().sort_values("k")
    expect = np.cumsum(vals[np.argsort(ids)])
    assert (out["run"].to_numpy() == expect).all()
    # exclusive variant
    out2 = ordered_prefix_sum(ds, "k", "v", out="run", exclusive=True).to_pandas().sort_values("k")
    assert (out2["run"].to_numpy() == expect - vals[np.argsort(ids)]).all()


def test_pack_sequences_matches_serial_packing(ray_session):
    sizes = [100, 50, 200, 300, 120, 80, 500, 40]
    t = pa.table({"doc_id": pa.array(range(8), pa.int64()),
                  "n": pa.array(sizes, pa.int64())})
    ds = rd.from_arrow(t).repartition(3)
    out = pack_sequences(ds, budget=300, order_key="doc_id", size_col="n").to_pandas()
    out = out.sort_values("doc_id")
    cum = np.concatenate(([0], np.cumsum(sizes)))[:-1]
    assert (out["seq_id"].to_numpy() == cum // 300).all()
    with pytest.raises(ValueError):
        pack_sequences(ds, budget=0, order_key="doc_id", size_col="n")


def test_stratified_sample_rates_and_guards(ray_session):
    from raydatax.relational import deterministic_sample, stratified_sample

    n = 6000
    t = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "s": pa.array((["a", "b", "c"] * (n // 3))),
    })
    ds = rd.from_arrow(t).repartition(4)
    out = stratified_sample(ds, "k", "s", {"a": 1000, "b": 100}).to_pandas()
    # stratum a: kept entirely; c: default 0 -> dropped
    assert (out[out.s == "a"].shape[0]) == n // 3
    assert (out[out.s == "c"].shape[0]) == 0
    # stratum b matches the single-rate operator exactly (same formula)
    only_b = ds.filter(lambda r: r["s"] == "b")
    want_b = sorted(deterministic_sample(only_b, "k", 100).to_pandas()["k"])
    got_b = sorted(out[out.s == "b"]["k"])
    assert got_b == want_b
    with pytest.raises(ValueError):
        stratified_sample(ds, "k", "s", {"a": 1001})


def test_text_kernels_differential_vs_duckdb(ray_session):
    """Random adversarial corpus (unicode, doubled spaces, empties,
    punctuation runs): explode / ngram / normalize / BPE-count must equal
    DuckDB's formulation as exact multisets."""
    import duckdb

    from raydatax.text import bpe_token_count, normalize_text

    rng = np.random.default_rng(11)
    pieces = ["héllo", "a", "", "x-y!", "42", "München", "  ", "b\tc", ".."]
    texts = [
        " ".join(rng.choice(pieces, size=rng.integers(0, 9)).tolist())
        for _ in range(300)
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    con = duckdb.connect()
    con.register("docs", t)

    got = explode_tokens(t).to_pandas().sort_values(["doc_id", "pos"])
    want = con.execute("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') ts FROM docs)
        SELECT doc_id, unnest(range(1, len(ts)+1)) AS pos, unnest(ts) AS tok
        FROM toks ORDER BY doc_id, pos""").df()
    assert got["tok"].tolist() == want["tok"].tolist()
    assert got["pos"].tolist() == want["pos"].tolist()

    got_ng = ngram_table(t, 2, pos_col="pos").to_pandas().sort_values(["doc_id", "pos"])
    want_ng = con.execute("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') ts FROM docs),
        pos AS (SELECT doc_id, unnest(range(1, greatest(len(ts)-1, 0)+1)) AS i FROM toks)
        SELECT p.doc_id, p.i, array_to_string(list_slice(t.ts, p.i, p.i+1), ' ') AS ng
        FROM pos p JOIN toks t ON p.doc_id = t.doc_id ORDER BY p.doc_id, p.i""").df()
    assert got_ng["ng"].tolist() == want_ng["ng"].tolist()

    got_n = normalize_text(t)["norm"].to_pylist()
    want_n = [r[0] for r in con.execute(
        r"SELECT nfc_normalize(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))"
        " FROM docs ORDER BY doc_id").fetchall()]
    assert got_n == want_n

    got_b = bpe_token_count(t)["n_bpe_tokens"].to_pylist()
    want_b = [r[0] for r in con.execute(
        r"SELECT len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))"
        " FROM docs ORDER BY doc_id").fetchall()]
    assert got_b == want_b


def test_prefix_sum_null_sizes_match_sql_skip_semantics(ray_session):
    """Null size values contribute 0 (SQL sum-OVER skips NULLs) instead of
    poisoning the cumsum with NaN-cast garbage."""
    t = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "v": pa.array([5, None, 7], pa.int64())})
    out = ordered_prefix_sum(rd.from_arrow(t), "k", "v", out="run").to_pandas()
    assert out.sort_values("k")["run"].tolist() == [5, 5, 12]


def test_prefix_sum_empty_input_keeps_schema(ray_session):
    t = pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    out = ordered_prefix_sum(rd.from_arrow(t), "k", "v", out="run")
    assert "run" in out.schema().names and out.count() == 0
