"""Approximate-nearest-neighbor search over an embedding column.

Baseline: **brute-force cosine top-k** — the query matrix is broadcast once
(``ray.put``), every batch does one float64 matmul against it and emits ≤ k
partial rows per query; the driver merges ≤ k·blocks rows.  No shuffle.

Scale path: **IVF** — deterministic k-means (seeded, Lloyd iterations on a
sample) → centroid assignment per batch → only batches' vectors falling in
the ``nprobe`` closest clusters of any query are scored.  Recall < 1.0 by
construction; verified against brute force in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _matrix(col: pa.ChunkedArray) -> np.ndarray:
    """(n, d) float64 from a list<float> column, zero-copy-ish."""
    col = col.combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0)
    dim = len(col[0])
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(col), dim).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _ScoreBatch:
    """Actor-pool stage: query matrix fetched once per actor in __init__."""

    def __init__(self, query_ref, k: int, id_col: str, vec_col: str):
        q_ids, q_mat = ray.get(query_ref)
        self.q_ids = q_ids
        self.q = _normalize(q_mat)          # (Q, d)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_matrix(batch[self.vec_col]))   # (n, d)
        sims = m @ self.q.T                            # (n, Q)
        k = min(self.k, len(ids))
        # per query: top-k rows of this batch (partial top-k)
        part = np.argpartition(-sims, k - 1, axis=0)[:k]   # (k, Q)
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[1]):
            rows = part[:, qi]
            out_q.append(np.full(k, self.q_ids[qi], dtype=np.int64))
            out_id.append(ids[rows])
            out_sim.append(sims[rows, qi])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_id), pa.int64()),
                "cosine": pa.array(np.concatenate(out_sim), pa.float64()),
            }
        )


def brute_force_topk(
    ds: "ray.data.Dataset",
    queries: pa.Table,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency=(1, 8),
) -> pa.Table:
    """Exact cosine top-k for every query row; returns
    (query_id, neighbor_id, rank, cosine) sorted by (query_id, rank).
    Ties broken by neighbor_id for full determinism."""
    q_ids = queries[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    q_mat = _matrix(queries[vec_col])
    ref = ray.put((q_ids, q_mat))

    parts = ds.map_batches(
        _ScoreBatch,
        fn_constructor_kwargs=dict(query_ref=ref, k=k, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    ).take_all()
    if not parts:
        return None
    qids = np.array([r["query_id"] for r in parts])
    nids = np.array([r["neighbor_id"] for r in parts])
    sims = np.array([r["cosine"] for r in parts])
    out = []
    for q in np.unique(qids):
        m = qids == q
        order = np.lexsort((nids[m], -sims[m]))[:k]
        for rank, j in enumerate(order):
            out.append(
                {
                    "query_id": int(q),
                    "rank": rank + 1,
                    "neighbor_id": int(nids[m][j]),
                    "cosine": float(sims[m][j]),
                }
            )
    return pa.Table.from_pylist(out)


def kmeans_fit(sample: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 5) -> np.ndarray:
    """Deterministic Lloyd's on normalized vectors (cosine ≈ dot)."""
    rng = np.random.default_rng(seed)
    x = _normalize(sample)
    idx = rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)
    cent = x[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cent[c] = v / nv
    return cent


def ivf_topk(
    ds: "ray.data.Dataset",
    queries: pa.Table,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 4096,
    seed: int = 5,
) -> pa.Table:
    """IVF: fit centroids on a driver-side sample (ONE small take), broadcast
    (centroids, probed-cluster set), filter each batch to vectors in probed
    clusters, brute-force the survivors.  Approximate by construction."""
    sample = ds.limit(sample_rows).take_all()
    smat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample])
    cent = kmeans_fit(smat, n_clusters, seed=seed)

    q_ids = queries[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    q_mat = _normalize(_matrix(queries[vec_col]))
    q_assign = np.argsort(-(q_mat @ cent.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    probed = np.unique(q_assign)
    ref = ray.put((cent, set(probed.tolist())))

    def prefilter(batch: pa.Table) -> pa.Table:
        c, pset = ray.get(ref)
        m = _normalize(_matrix(batch[vec_col]))
        assign = np.argmax(m @ c.T, axis=1)
        keep = np.isin(assign, list(pset))
        return batch.filter(pa.array(keep))

    filtered = ds.map_batches(prefilter, batch_format="pyarrow")
    return brute_force_topk(filtered, queries, k, id_col, vec_col)
