"""Approximate-nearest-neighbor search over an embedding column.

Baseline: **brute-force cosine top-k** — the query matrix is broadcast once
(``ray.put``), every batch does one float64 matmul against it and emits ≤ k
partial rows per query; the driver merges ≤ k·blocks rows.  No shuffle.

Scale path: **IVF** — deterministic k-means (seeded, Lloyd iterations on a
sample) → centroid assignment per batch → only batches' vectors falling in
the ``nprobe`` closest clusters of any query are scored.  Recall < 1.0 by
construction; verified against brute force in tests.

Memory-scale path: **PQ (product quantization) + exact rerank** — vectors
compress to ``m_sub`` uint8 codes (d·4 bytes → m bytes, 32× at d=64/m=8);
search scores codes with per-query ADC lookup tables (one gather+sum per
subspace, no float vector ever touched), keeps a per-batch partial
shortlist, and optionally reranks the shortlist's TRUE vectors with exact
cosine.  With rerank the output is exact whenever the true top-k survives
the shortlist — which is what lets ``ann_pq_verified`` run under the same
SQL hash gate as brute force.  At 100 TB the codes are precomputed once
(``pq_encode``) and stored next to the IVF cluster assignment (see the
persistent IVF index in dedup.py), so a query touches ``nprobe`` buckets
of uint8 codes plus ``shortlist`` full vectors.
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


# ------------------------------------------------------------- PQ + rerank


def _kmeans_l2(x: np.ndarray, n_codes: int, iters: int = 10, seed: int = 7) -> np.ndarray:
    """Deterministic Lloyd's under L2 for (unnormalized) subvectors."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(x), size=min(n_codes, len(x)), replace=False)
    cent = x[np.sort(idx)].copy()
    for _ in range(iters):
        # argmin ||x-c||² == argmax (x·c - ||c||²/2); x² is constant per row
        score = x @ cent.T - 0.5 * (cent * cent).sum(axis=1)
        assign = np.argmax(score, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
    return cent


def pq_fit(
    sample: np.ndarray, m_sub: int = 8, n_codes: int = 64, seed: int = 7
) -> np.ndarray:
    """Fit per-subspace codebooks on NORMALIZED sample vectors; returns
    (m_sub, n_codes, d//m_sub).  d must divide evenly into subspaces."""
    x = _normalize(sample)
    n, d = x.shape
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible into {m_sub} subspaces")
    dsub = d // m_sub
    books = np.empty((m_sub, min(n_codes, n), dsub), dtype=np.float64)
    for j in range(m_sub):
        books[j] = _kmeans_l2(x[:, j * dsub : (j + 1) * dsub], n_codes, seed=seed + j)
    return books


def _pq_codes(x_norm: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m_sub) uint8 codes for normalized vectors."""
    m_sub, n_codes, dsub = books.shape
    codes = np.empty((len(x_norm), m_sub), dtype=np.uint8)
    for j in range(m_sub):
        sub = x_norm[:, j * dsub : (j + 1) * dsub]
        score = sub @ books[j].T - 0.5 * (books[j] * books[j]).sum(axis=1)
        codes[:, j] = np.argmax(score, axis=1)
    return codes


def pq_encode(
    ds: "ray.data.Dataset",
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """Compress the corpus to (id, pq_code: list<uint8>) — the stored
    artifact a persistent PQ index keeps per IVF bucket."""
    ref = ray.put(books)

    def encode(batch: pa.Table) -> pa.Table:
        b = ray.get(ref)
        codes = _pq_codes(_normalize(_matrix(batch[vec_col])), b)
        return pa.table(
            {
                id_col: batch[id_col],
                "pq_code": pa.array(list(codes), pa.list_(pa.uint8())),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


class _PqScoreBatch:
    """Actor-pool stage: codebooks + per-query ADC lookup tables built once
    per actor; per batch one encode + m_sub gathers + a partial shortlist."""

    def __init__(self, ref, shortlist: int, id_col: str, vec_col: str):
        books, q_ids, q_mat = ray.get(ref)
        self.books = books
        self.q_ids = q_ids
        m_sub, n_codes, dsub = books.shape
        q = _normalize(q_mat)                       # (Q, d)
        # lut[q, j, c] = q_subj · books[j, c]
        self.lut = np.stack(
            [q[:, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m_sub)],
            axis=1,
        )                                            # (Q, m_sub, n_codes)
        self.shortlist = shortlist
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        codes = _pq_codes(_normalize(_matrix(batch[self.vec_col])), self.books)
        n, m_sub = codes.shape
        q_n = len(self.q_ids)
        sims = np.zeros((n, q_n), dtype=np.float64)
        for j in range(m_sub):
            sims += self.lut[:, j, codes[:, j]].T    # (n, Q) gather per subspace
        k = min(self.shortlist, n)
        part = np.argpartition(-sims, k - 1, axis=0)[:k]
        out_q, out_id, out_sim = [], [], []
        for qi in range(q_n):
            rows = part[:, qi]
            out_q.append(np.full(k, self.q_ids[qi], dtype=np.int64))
            out_id.append(ids[rows])
            out_sim.append(sims[rows, qi])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_id), pa.int64()),
                "adc": pa.array(np.concatenate(out_sim), pa.float64()),
            }
        )


def pq_topk(
    ds: "ray.data.Dataset",
    queries: pa.Table,
    k: int = 10,
    m_sub: int = 8,
    n_codes: int = 64,
    shortlist: int = 64,
    rerank: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 4096,
    seed: int = 7,
) -> pa.Table:
    """PQ-ADC search: codebooks fit on a driver sample, codes scored against
    per-query lookup tables, per-batch partial shortlists merged on the
    driver (≤ shortlist·blocks rows), then — with ``rerank`` — the union
    shortlist's true vectors rescored with exact cosine for the final
    top-k.  Rerank output equals brute force whenever the true top-k
    survives the shortlist (pinned by test + the SQL-oracled query)."""
    sample = ds.limit(sample_rows).take_all()
    smat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample])
    books = pq_fit(smat, m_sub=m_sub, n_codes=n_codes, seed=seed)

    q_ids = queries[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    q_mat = _matrix(queries[vec_col])
    ref = ray.put((books, q_ids, q_mat))

    parts = ds.map_batches(
        _PqScoreBatch,
        fn_constructor_kwargs=dict(
            ref=ref, shortlist=shortlist, id_col=id_col, vec_col=vec_col
        ),
        batch_format="pyarrow",
        concurrency=(1, 8),
    ).take_all()
    if not parts:
        return None
    qids = np.array([r["query_id"] for r in parts])
    nids = np.array([r["neighbor_id"] for r in parts])
    sims = np.array([r["adc"] for r in parts])

    keep_n = shortlist if rerank else k
    short_ids: set[int] = set()
    approx_rows = []
    for q in np.unique(qids):
        m = qids == q
        order = np.lexsort((nids[m], -sims[m]))[:keep_n]
        ids_q = nids[m][order]
        short_ids.update(int(i) for i in ids_q)
        if not rerank:
            approx_rows.extend(
                {
                    "query_id": int(q),
                    "rank": rank + 1,
                    "neighbor_id": int(i),
                    "adc": float(sims[m][order][rank]),
                }
                for rank, i in enumerate(ids_q[:k])
            )
    if not rerank:
        return pa.Table.from_pylist(approx_rows)

    # exact rerank: ONE more pruned pass fetching only shortlisted vectors
    ids_ref = ray.put(np.array(sorted(short_ids), dtype=np.int64))

    def prefilter(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        keep = np.isin(batch[id_col].to_numpy(zero_copy_only=False), wanted)
        return batch.filter(pa.array(keep))

    survivors = ds.map_batches(prefilter, batch_format="pyarrow")
    return brute_force_topk(survivors, queries, k, id_col, vec_col)


def ivf_pq_topk(
    ds: "ray.data.Dataset",
    queries: pa.Table,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    m_sub: int = 32,
    n_codes: int = 256,
    shortlist: int = 64,
    rerank: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 4096,
    seed: int = 5,
) -> pa.Table:
    """The canonical IVF+PQ layout: an IVF coarse quantizer prunes the
    corpus to the queries' ``nprobe`` clusters, PQ-ADC scores only the
    survivors, exact cosine reranks the shortlist.  At 100 TB this is the
    stored form — per-cluster buckets of uint8 codes (see the persistent
    IVF index in dedup.py for the on-disk partitioning) — so a query
    touches nprobe buckets of codes plus ``shortlist`` full vectors.
    Recall is bounded by the IVF probe (approximate by construction);
    rerank makes the output exact OVER the probed subset."""
    sample = ds.limit(sample_rows).take_all()
    smat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample])
    cent = kmeans_fit(smat, n_clusters, seed=seed)

    q_mat = _normalize(_matrix(queries[vec_col]))
    q_assign = np.argsort(-(q_mat @ cent.T), axis=1)[:, :nprobe]
    probed = np.unique(q_assign)
    ref = ray.put((cent, set(probed.tolist())))

    def prefilter(batch: pa.Table) -> pa.Table:
        c, pset = ray.get(ref)
        m = _normalize(_matrix(batch[vec_col]))
        assign = np.argmax(m @ c.T, axis=1)
        keep = np.isin(assign, list(pset))
        return batch.filter(pa.array(keep))

    survivors = ds.map_batches(prefilter, batch_format="pyarrow")
    return pq_topk(
        survivors, queries, k=k, m_sub=m_sub, n_codes=n_codes,
        shortlist=shortlist, rerank=rerank, id_col=id_col, vec_col=vec_col,
        sample_rows=sample_rows, seed=seed,
    )


def kmeans_fit_distributed(
    ds,
    k: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Distributed Lloyd's k-means as a first-class engine loop — the
    clustering primitive behind IVF bucketing and cluster-based corpus
    curation, run over the WHOLE corpus (not the driver sample
    ``_kmeans_l2`` uses for code books): per iteration, centroids
    broadcast (object store, once), every batch assigns rows by squared
    L2 argmin (ties → lowest cluster id) and emits per-cluster partial
    (sum-vector, count) rows — k·d ints per batch (member components
    snap to int64 micros BEFORE accumulation, so partials are
    associative and block-boundary-independent), the only thing that
    ever leaves a task; the driver folds the tiny partials and re-snaps
    centroids to MICRO precision between rounds, which makes the whole
    loop reproducible across engines (the bpe_learn unrolled-rounds
    discipline: SQL recomputes identical centroids, so identical
    assignments; distances are int64 micro-term sums, so argmin is
    order-independent too).  Empty clusters keep their previous centroid
    and report count 0 — callers mirroring a SQL twin that only emits
    assigned clusters should drop the zero-count rows.

    Returns ``(centroids (k, d) float64 micro-snapped, counts (k,)
    int64)`` — counts from the LAST assignment pass."""
    import ray

    seeds_tab = (
        ds.map_batches(
            lambda t: pa.table({id_col: t[id_col], vec_col: t[vec_col]}),
            batch_format="pyarrow",
        )
        .sort(id_col)
        .limit(k)
        .take_all()
    )
    if len(seeds_tab) < k:
        raise ValueError(f"kmeans_fit: need at least k={k} rows")
    cent = np.array([list(r[vec_col]) for r in seeds_tab], dtype=np.float64)
    cent = np.floor(cent * 1e6 + 0.5) / 1e6
    d = cent.shape[1]
    counts = np.zeros(k, dtype=np.int64)

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            x = _matrix(t[vec_col])
            # squared L2 via explicit diffs, each term snapped to an int64
            # micro BEFORE the sum: both engines compute the identical
            # per-term double (micro-snapped inputs, one multiply), and an
            # integer sum is associative — so argmin can never flip on a
            # near-tie from summation order (numpy pairwise vs SQL GROUP BY)
            sq = (x[:, None, :] - c[None, :, :]) ** 2
            dist = np.floor(sq * 1e6 + 0.5).astype(np.int64).sum(axis=2)
            assign = np.argmin(dist, axis=1)  # first (lowest id) on ties
            # snap-before-sum: each member component snaps to an int64
            # micro BEFORE accumulation, so partial sums are associative
            # integers — batch/block boundaries can never move a centroid
            # by a ulp (the lm_perplexity/bm25 discipline)
            xm = np.floor(x * 1e6 + 0.5).astype(np.int64)
            sums = np.zeros((k, d), dtype=np.int64)
            np.add.at(sums, assign, xm)
            cnt = np.bincount(assign, minlength=k).astype(np.int64)
            keep = cnt > 0
            return pa.table({
                "c": pa.array(np.arange(k, dtype=np.int64)[keep]),
                "n": pa.array(cnt[keep]),
                "s": pa.array([list(v) for v in sums[keep]],
                              pa.list_(pa.int64())),
            })

        rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
        sums = np.zeros((k, d), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for r in rows:  # ≤ k rows per block — tiny driver fold
            sums[r["c"]] += np.asarray(r["s"], dtype=np.int64)
            counts[r["c"]] += r["n"]
        nz = counts > 0
        # mean of micro ints, rounded back to a micro-snapped float —
        # one IEEE division over exact integers, identical in SQL
        cent[nz] = np.floor(sums[nz] / counts[nz, None] + 0.5) / 1e6
    return cent, counts
