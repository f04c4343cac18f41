"""Incremental crawl-ingest loop: every dedup modality against its
PERSISTENT index.

The steady-state shape of a web-scale corpus: the full corpus is never
re-deduplicated — each new crawl probes the indexes built by every prior
crawl, survivors are appended, and the next crawl sees them.  Three
modalities run side by side over the same crawl stream:

  1. exact       — content-key index (``dedup.incremental_exact_dedup``)
  2. near-dup    — MinHash band-bucket LSH index
                   (``dedup.incremental_minhash_dedup``)
  3. embeddings  — IVF index with centroids fixed at creation
                   (``dedup.incremental_embedding_dedup``)

Run: ``python examples/incremental_crawl_dedup.py [sf_dir] [state_dir]``
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import ray
import ray.data as rd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raydatax.dedup import (  # noqa: E402
    incremental_embedding_dedup,
    incremental_exact_dedup,
    incremental_minhash_dedup,
)


def crawl_slices(sf_dir: str, n_crawls: int = 3):
    """Deterministic 'crawls' from the shared testdata (doc_id mod n);
    each later crawl ALSO RE-SENDS ~1/8 of the previous slice under fresh
    ids (an ID-based rule — batch/partitioning-independent) — the
    constructed cross-crawl duplicates the persistent indexes must
    catch."""
    import numpy as np

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def part(ds, col, i):
        def f(t: pa.Table) -> pa.Table:
            ids = t[col].to_numpy(zero_copy_only=False)
            keep = ids % n_crawls == i
            cur = t.filter(pa.array(keep))
            if i == 0:
                return cur
            # re-send: copies of the PREVIOUS crawl's slice with new ids —
            # the index built last crawl must kill these
            prev = t.filter(
                pa.array((ids % n_crawls == i - 1) & ((ids // n_crawls) % 8 == 0))
            )
            prev = prev.set_column(
                prev.schema.get_field_index(col), col,
                pa.array(
                    1_000_000 * i
                    + prev[col].to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64(),
                ),
            )
            return pa.concat_tables([cur, prev])

        return ds.map_batches(f, batch_format="pyarrow")

    for i in range(n_crawls):
        yield part(docs, "doc_id", i), part(vecs, "vec_id", i)


def main(sf_dir: str, state_dir: str) -> dict:
    shutil.rmtree(state_dir, ignore_errors=True)
    exact_idx = f"{state_dir}/exact"
    lsh_idx = f"{state_dir}/lsh"
    ivf_idx = f"{state_dir}/ivf"

    report = []
    compactions = {}
    for i, (docs, vecs) in enumerate(crawl_slices(sf_dir)):
        if i == 2:
            # steady-state maintenance: fold the epochs the first two
            # crawls accumulated into one bucketed epoch per index, so
            # crawl 3 probes open ~1 file per bucket again — and must
            # still drop every re-sent duplicate (asserted by the test)
            from raydatax.dedup import compact_index

            compactions = {
                "exact": compact_index(exact_idx),
                "lsh": compact_index(lsh_idx),
                "ivf": compact_index(ivf_idx),
            }
        exact = incremental_exact_dedup(docs, exact_idx)
        near = incremental_minhash_dedup(docs, lsh_idx, threshold=0.99)
        emb = incremental_embedding_dedup(vecs, ivf_idx, threshold=0.99)
        kept_near = near.map_batches(
            lambda t: t.filter(t["keep"].combine_chunks()
                               if isinstance(t["keep"], pa.ChunkedArray)
                               else t["keep"]),
            batch_format="pyarrow",
        ).count()
        kept_emb = emb.map_batches(
            lambda t: t.filter(t["keep"].combine_chunks()
                               if isinstance(t["keep"], pa.ChunkedArray)
                               else t["keep"]),
            batch_format="pyarrow",
        ).count()
        report.append(
            {
                "crawl": i,
                "exact_survivors": exact.count(),
                "neardup_kept": kept_near,
                "neardup_dropped": near.count() - kept_near,
                "embedding_kept": kept_emb,
                "embedding_dropped": emb.count() - kept_emb,
            }
        )
    return {"crawls": report, "state_dir": state_dir,
            "compactions": compactions}


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    state = sys.argv[2] if len(sys.argv) > 2 else "/tmp/crawl_state"
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    print(main(sf, state))
    ray.shutdown()
