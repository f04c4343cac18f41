"""End-to-end training-data preparation over the `documents` table — the
composition a 100-TB corpus pipeline runs, expressed entirely with the
engine's operators and streaming end to end (nothing but the small survivor
id-sets and final stats ever reach the driver):

  1. exact dedup            — keep one representative per identical text
                              (content-hash groupby; text never shuffles)
  2. quality filtering      — vectorized length/alpha/stopword ratios
  3. language ID            — actor-pool stage, markers built once per actor
  4. token statistics       — whitespace token counts
  5. deterministic split    — hash_split on doc_id (stable, leak-free)
  6. partitioned output     — train/ and test/ parquet directories

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
    from raydatax.dedup import exact_dedup
    from raydatax.relational import hash_split, semi_join
    from raydatax.text import LangId, quality_stats, token_count

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    # 1. exact dedup -> survivor ids (small) -> semi join keeps the text rows
    survivors = exact_dedup(docs).select_columns(["doc_id"])
    deduped = semi_join(docs, survivors, "doc_id")

    # 2. quality gates on vectorized ratios (per-batch, no shuffle)
    def quality_gate(t):
        q = quality_stats(t)
        keep = pc.and_(
            pc.less_equal(q["punct_ratio"], 0.3),
            pc.greater_equal(q["n_chars"], 20),
        )
        return t.filter(keep)

    clean = deduped.map_batches(quality_gate, batch_format="pyarrow")

    # 3. language ID as an actor pool (setup once per actor), 4. token stats
    tagged = clean.map_batches(LangId, concurrency=2, batch_format="pyarrow")
    with_tokens = tagged.map_batches(token_count, batch_format="pyarrow")

    # 5. deterministic 10% test split on the document key
    return hash_split(with_tokens, "doc_id", test_permille=100)


def main(sf_dir: str, out_dir: str) -> dict:
    train, test = build(sf_dir)
    train.write_parquet(f"{out_dir}/train")
    test.write_parquet(f"{out_dir}/test")
    n_train = rd.read_parquet(f"{out_dir}/train").count()
    n_test = rd.read_parquet(f"{out_dir}/test").count()
    return {"train_rows": n_train, "test_rows": n_test, "out_dir": out_dir}


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/training_data"
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    print(main(sf, out))
    ray.shutdown()
