"""End-to-end training-data preparation over the `documents` table — the
composition a 100-TB corpus pipeline runs, expressed entirely with the
engine's operators and streaming end to end (nothing but the small survivor
id-sets and final stats ever reach the driver):

  1. normalization + PII   — NFC/lower/ws-collapse, then the ordered
                              email/IP/phone redaction sweep (actor pool)
  2. exact dedup            — keep one representative per identical
                              NORMALIZED text (content-hash groupby)
  3. decontamination        — drop docs sharing a word 6-gram with the
                              held-out benchmark slice (adaptive semi join)
  4. quality filtering      — vectorized ratio gates + Gopher-style
                              repetition stats
  5. language ID            — actor-pool stage, markers built once per actor
  6. token statistics       — whitespace token counts
  7. deterministic split    — hash_split on doc_id (stable, leak-free)
  8. sequence packing       — concat-then-chunk seq ids on the train side
  9. partitioned output     — train/ and test/ parquet directories

Usage:
    python examples/training_data_pipeline.py [sf_dir] [out_dir]
    (defaults: /root/testdata/sf0.001  /tmp/training_data)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.compute as pc

import ray
import ray.data as rd


def build(sf_dir: str):
    """Return the (train, test) Datasets — lazy; nothing executes yet."""
    import pyarrow as pa

    from raydatax.dedup import exact_dedup
    from raydatax.relational import hash_split, semi_join
    from raydatax.text import (
        LangId,
        RedactPii,
        ngram_contamination,
        normalize_text,
        quality_stats,
        token_count,
    )

    raw = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    # 1. normalize (NFC/lower/ws) then scrub PII — both batch-local; the
    # normalized+redacted text REPLACES the raw column for everything below
    def norm(t: pa.Table) -> pa.Table:
        n = normalize_text(t)
        return pa.table({"doc_id": n["doc_id"], "text": n["norm"]})

    docs = raw.map_batches(norm, batch_format="pyarrow").map_batches(
        RedactPii(column="text", out="text2"), batch_format="pyarrow"
    ).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "text": t["text2"]}),
        batch_format="pyarrow",
    )

    # 2. exact dedup -> survivor ids (small) -> semi join keeps the text rows
    survivors = exact_dedup(docs).select_columns(["doc_id"])
    deduped = semi_join(docs, survivors, "doc_id")

    # 3. decontaminate vs the held-out benchmark slice (doc_id % 13 == 0)
    def side(bench):
        def f(t: pa.Table) -> pa.Table:
            import numpy as np
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            mask = (ids % 13 == 0) if bench else (ids % 13 != 0)
            return t.filter(pa.array(mask))
        return f

    bench = docs.map_batches(side(True), batch_format="pyarrow")
    candidates = deduped.map_batches(side(False), batch_format="pyarrow")
    contaminated = ngram_contamination(candidates, bench, n=6).select_columns(["doc_id"])
    deduped = semi_join(candidates, contaminated, "doc_id", anti=True)

    # 4. quality gates on vectorized ratios (per-batch, no shuffle)
    def quality_gate(t):
        q = quality_stats(t)
        keep = pc.and_(
            pc.less_equal(q["punct_ratio"], 0.3),
            pc.greater_equal(q["n_chars"], 20),
        )
        return t.filter(keep)

    clean = deduped.map_batches(quality_gate, batch_format="pyarrow")

    # 5. language ID as an actor pool (setup once per actor), 6. token stats
    tagged = clean.map_batches(LangId, concurrency=2, batch_format="pyarrow")
    with_tokens = tagged.map_batches(token_count, batch_format="pyarrow")

    # 7. deterministic 10% test split on the document key
    return hash_split(with_tokens, "doc_id", test_permille=100)


def main(sf_dir: str, out_dir: str) -> dict:
    import pyarrow as pa

    from raydatax.bpe import learn_bpe
    from raydatax.relational import pack_sequences

    train, test = build(sf_dir)
    # 8. pack the training docs into ~4096-token sequences (global prefix
    # sum over the deterministic doc_id order)
    train = pack_sequences(train, budget=4096, order_key="doc_id",
                           size_col="n_tokens")
    train.write_parquet(f"{out_dir}/train")
    test.write_parquet(f"{out_dir}/test")
    n_train = rd.read_parquet(f"{out_dir}/train").count()
    n_test = rd.read_parquet(f"{out_dir}/test").count()

    # 9. fit a tokenizer on the corpus (one corpus pass; merge rounds run
    # on the distinct-word table only) — the artifact a training run ships
    merges = learn_bpe(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"]),
        n_merges=8,
    )

    # 10. compress the embedding corpus to PQ codes + answer a query with
    # exact rerank — the stored-index + search side of the pipeline
    import numpy as np

    from raydatax.ann import pq_topk

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    queries = pa.Table.from_pydict(
        {
            "vec_id": [r["vec_id"] for r in emb.take(2)],
            "embedding": [r["embedding"] for r in emb.take(2)],
        }
    )
    nn = pq_topk(emb, queries, k=5, m_sub=32, n_codes=256, shortlist=64)

    return {
        "train_rows": n_train,
        "test_rows": n_test,
        "bpe_merges": merges["merged"].to_pylist(),
        "nn_rows": nn.num_rows,
        "out_dir": out_dir,
    }


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/training_data"
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    print(main(sf, out))
    ray.shutdown()
