"""Deduplication family for training-data pipelines.

Four levels, all Ray-Data-first (guide: ``/opt/skills/guides/ray_guide.md``
"Aggregation at scale"):

- **exact**: 64-bit content hash per batch (vectorized) → pre-aggregated
  groupby on the hash (min id + count) — the shuffle moves one row per
  distinct hash per batch, never the text;
- **MinHash + LSH**: char-shingle rolling hashes → per-permutation minima
  (numpy ``minimum.reduceat`` over the whole batch's shingles — no per-doc
  Python) → band buckets exploded to (band, hash, doc, signature) rows →
  ``groupby(band, hash)`` → candidate pairs with signature-estimated
  Jaccard → union-find clustering of the (small) surviving pair set;
- **SimHash**: token hashes → signed bit-sums per doc (64 ``reduceat``
  passes) → 64-bit fingerprint → banded buckets → Hamming-distance pairs;
- **n-gram Jaccard**: exact verification of candidate pairs (shingle-set
  intersection-over-union), run only on LSH survivors.

Partitioning assumption: candidate PAIRS are sparse relative to the corpus
(every bucket/cluster fan-out is capped).  Clustering is adaptive, decided
from pair-block METADATA: small pair sets use driver union-find with the
node→rep mapping broadcast back; large ones run distributed min-label
propagation (:func:`propagate_min_labels`) — the corpus id list is never
collected on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .relational import preagg_groupby

_R = 0x100000001B3
_MASK = (1 << 64) - 1

# Default bucket count of the hash-partitioned persistent-index layout —
# full rationale at the layout helpers (search INDEX LAYOUT below).  Needed
# at module top: it is a default argument of the public index functions.
INDEX_BUCKETS = 64


def _buffers(col: pa.Array):
    """(byte buffer, per-value offsets int64) of a string array.  Handles
    both string (int32 offsets) and large_string (int64 offsets) — Arrow
    casts/concat on big text blocks can silently produce large_string, and
    misreading its offsets as int32 would yield wrong hashes, not an error."""
    n = len(col)
    if pa.types.is_large_string(col.type):
        off_dtype = np.int64
    elif pa.types.is_string(col.type):
        off_dtype = np.int32
    else:
        raise TypeError(f"expected a (large_)string column, got {col.type}")
    off = np.frombuffer(col.buffers()[1], dtype=off_dtype, count=n + 1).astype(np.int64)
    base = off[0]
    off = off - base
    total = int(off[-1])
    data = (
        np.frombuffer(col.buffers()[2], dtype=np.uint8, offset=int(base), count=total)
        if total
        else np.array([], np.uint8)
    )
    return data, off


def _string_col(batch: pa.Table, column: str) -> pa.Array:
    col = batch[column].combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0) if col.num_chunks else pa.array([], pa.string())
    return col


def shingle_hashes(col: pa.Array, k: int = 5):
    """All k-byte shingle rolling hashes for every string, in one numpy pass:
    prefix polynomial hashes over the concatenated buffer, windows differenced
    with modular-inverse powers.  Returns (hashes uint64, doc_offsets)."""
    data, off = _buffers(col)
    n = len(col)
    lens = np.diff(off)
    with np.errstate(over="ignore"):
        total = len(data)
        rinv = pow(_R, -1, 1 << 64)
        max_len = int(lens.max()) if n else 0
        pw_rinv = np.ones(max(max_len + 1, 1), dtype=np.uint64)
        if max_len:
            np.multiply.accumulate(np.full(max_len, rinv & _MASK, dtype=np.uint64), out=pw_rinv[1:])
        pw_r = np.ones(max(max_len + 1, 1), dtype=np.uint64)
        if max_len:
            np.multiply.accumulate(np.full(max_len, _R, dtype=np.uint64), out=pw_r[1:])
        pos = np.arange(total, dtype=np.int64) - np.repeat(off[:-1], lens)
        contrib = data.astype(np.uint64) * pw_rinv[pos]
        prefix = np.zeros(total + 1, dtype=np.uint64)
        np.cumsum(contrib, out=prefix[1:])
        # reset prefix per doc: window hash = (prefix[i+k]-prefix[i]) * r^(pos)
        n_sh = np.maximum(lens - k + 1, 0)
        sh_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(n_sh, out=sh_off[1:])
        idx = np.arange(int(sh_off[-1]), dtype=np.int64) - np.repeat(sh_off[:-1], n_sh)
        start = np.repeat(off[:-1], n_sh) + idx            # global byte index
        spos = idx                                          # position within doc
        win = (prefix[start + k] - prefix[start]) * pw_r[spos]
        # scramble (splitmix-style) so band slicing sees uniform bits
        win = (win ^ (win >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        win ^= win >> np.uint64(33)
    return win, sh_off


def minhash_signatures(
    col: pa.Array, num_perm: int = 64, k: int = 5, seed: int = 7
) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signature matrix, vectorized: one
    ``minimum.reduceat`` over all shingles per permutation."""
    win, sh_off = shingle_hashes(col, k)
    n = len(sh_off) - 1
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    n_sh = np.diff(sh_off)
    nonempty = n_sh > 0
    starts = sh_off[:-1][nonempty]
    with np.errstate(over="ignore"):
        for p in range(num_perm):
            t = a[p] * win + b[p]
            if len(t):
                sig[nonempty, p] = np.minimum.reduceat(t, starts)
    return sig


def band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) uint64: polynomial combine of each band's rows."""
    n, num_perm = sig.shape
    rows = num_perm // bands
    with np.errstate(over="ignore"):
        out = np.zeros((n, bands), dtype=np.uint64)
        for b in range(bands):
            h = np.uint64(14695981039346656037)
            acc = np.full(n, h)
            for r_i in range(rows):
                acc = (acc ^ sig[:, b * rows + r_i]) * np.uint64(_R)
            out[:, b] = acc
    return out


# --------------------------------------------------------------- exact dedup


def exact_dedup(
    ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Representative per distinct content: (min id, copy count), grouped by
    a 64-bit content hash so the shuffle never moves the text itself."""
    from .text import fingerprint_rolling

    def h(batch: pa.Table) -> pa.Table:
        batch = fingerprint_rolling(batch, text_col, "__h")
        return batch.select([id_col, "__h"])

    hashed = ds.map_batches(h, batch_format="pyarrow")
    out = preagg_groupby(
        hashed, ["__h"], [(id_col, "min", id_col), (id_col, "count", "n_copies")]
    )
    return out.select_columns([id_col, "n_copies"])


def incremental_exact_dedup(
    new_docs: "ray.data.Dataset",
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    key_fn=None,
    update_index: bool = True,
    index_buckets: int = INDEX_BUCKETS,
) -> "ray.data.Dataset":
    """Steady-state dedup of a CONTINUOUSLY ingested corpus: drop new
    documents whose content key is already in the persistent index (every
    previous crawl's survivors), dedup within the new batch (min id wins,
    copy count kept), then append the surviving keys to the index as a new
    epoch of parquet part files — so the next ingest dedups against this
    one's output.  This is the incremental form of :func:`exact_dedup`,
    composed from the engine's adaptive primitives: the index membership
    test is :func:`raydatax.relational.semi_join` (anti — broadcast under
    a metadata-counted key-set threshold, hash-partitioned join above) and
    the within-batch dedup is a pre-aggregated groupby; neither corpus nor
    index is ever collected on the driver.

    ``key_fn(batch) -> pa.Table[id_col, "__k"]`` defaults to the
    vectorized 64-bit rolling fingerprint.  The index is append-only
    (``epoch-N/`` subdirectories) — idempotent re-runs of a failed epoch
    should pass ``update_index=False`` first and commit the index last,
    or guard with the lake job lock for concurrent writers."""
    import os

    from .relational import semi_join
    from .text import fingerprint_rolling

    if key_fn is None:
        def key_fn(batch: pa.Table) -> pa.Table:
            b = fingerprint_rolling(batch, text_col, "__k")
            return b.select([id_col, "__k"])

    keyed = new_docs.map_batches(key_fn, batch_format="pyarrow")
    files, next_epoch = _lsh_index_files(index_dir)  # shared epoch-N layout
    if files:
        keyed = keyed.materialize()
        # prune the index read to the buckets the new crawl's keys touch —
        # at steady state the read is ∝ delta, not ∝ corpus
        B = _load_index_buckets(index_dir)
        if B:
            files = _index_files_for_buckets(
                index_dir, _wanted_buckets(keyed, _bucket_exact, B)
            )
    if files:
        index = ray.data.read_parquet(files).map_batches(
            _drop_hive_bucket, batch_format="pyarrow"
        )
        keyed = semi_join(keyed, index, left_on="__k", anti=True)
    reps = preagg_groupby(
        keyed, ["__k"], [(id_col, "min", id_col), (id_col, "count", "n_copies")]
    ).materialize()
    if update_index:
        os.makedirs(index_dir, exist_ok=True)
        _commit_index_epoch(index_dir, next_epoch,
                            reps.select_columns(["__k"]),
                            bucket_fn=_bucket_exact, buckets=index_buckets)
    return reps.select_columns([id_col, "n_copies"])


# ----------------------------------------------------------- minhash-lsh


def _pairs_from_groups(group: pa.Table, max_bucket: int = 64) -> pa.Table:
    """Candidate pairs within one (band, band_hash) bucket, with
    signature-estimated Jaccard.  Oversized buckets are truncated (and
    flagged via the `truncated` column) — no silent cap."""
    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "est_jaccard": pa.array([], pa.float64()),
         "truncated": pa.array([], pa.bool_())}
    )
    if group.num_rows < 2:
        return empty
    trunc = group.num_rows > max_bucket
    g = group.slice(0, max_bucket)
    ids = g["doc_id"].to_numpy(zero_copy_only=False)
    sig = np.stack(g["sig"].to_numpy(zero_copy_only=False))
    order = np.argsort(ids)
    ids, sig = ids[order], sig[order]
    iu = np.triu_indices(len(ids), 1)
    est = (sig[iu[0]] == sig[iu[1]]).mean(axis=1)
    return pa.table(
        {
            "a": pa.array(ids[iu[0]], pa.int64()),
            "b": pa.array(ids[iu[1]], pa.int64()),
            "est_jaccard": pa.array(est, pa.float64()),
            "truncated": pa.array(np.full(len(iu[0]), trunc)),
        }
    )


def _explode_bands(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    num_perm: int,
    bands: int,
    k: int,
    seed: int,
) -> "ray.data.Dataset":
    """doc → MinHash → one row per (band, band_hash, doc_id, sig): the LSH
    bucket rows shared by the batch and incremental paths (and the schema
    the persistent LSH index stores)."""

    def explode(batch: pa.Table) -> pa.Table:
        col = _string_col(batch, text_col)
        sig = minhash_signatures(col, num_perm, k, seed)
        bh = band_hashes(sig, bands)
        n = len(col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        band_id = np.tile(np.arange(bands, dtype=np.int32), n)
        return pa.table(
            {
                "band": pa.array(band_id),
                "bh": pa.array(bh.reshape(-1).view(np.int64)),
                "doc_id": pa.array(np.repeat(ids, bands), pa.int64()),
                "sig": pa.array(list(np.repeat(sig, bands, axis=0))),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def minhash_candidate_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    threshold: float = 0.5,
    seed: int = 7,
) -> "ray.data.Dataset":
    """doc → MinHash → LSH band explode → bucket groupby → estimated-Jaccard
    pairs above threshold (deduplicated across bands)."""
    exploded = _explode_bands(ds, text_col, id_col, num_perm, bands, k, seed)
    pairs = exploded.groupby(["band", "bh"]).map_groups(
        _pairs_from_groups, batch_format="pyarrow"
    )
    pairs = pairs.map_batches(
        lambda t: t.filter(pc.greater_equal(t["est_jaccard"], threshold)),
        batch_format="pyarrow",
    )
    # same pair can surface from several bands → keep one (max estimate)
    return preagg_groupby(
        pairs, ["a", "b"], [("est_jaccard", "max", "est_jaccard")]
    )


def cluster_pairs(pairs: list[tuple[int, int]], ids: list[int]) -> dict[int, int]:
    """Union-find on the driver: id → cluster representative (min id).
    Safe only because LSH pairs are sparse/capped (see module docstring)."""
    parent: dict[int, int] = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {i: find(i) for i in ids}


def propagate_min_labels(
    pairs: "ray.data.Dataset",
    max_rounds: int = 64,
    num_partitions: int | None = None,
    shortcut: bool = False,
) -> "ray.data.Dataset":
    """Distributed connected components over a pair Dataset by iterative
    min-label propagation: every node starts at min(self, neighbors), each
    round takes the min over its neighborhood again, until the global label
    sum stops decreasing (labels are monotone non-increasing, so an
    unchanged sum IS the fixpoint).  Rounds = cluster diameter; near-dup
    clusters are shallow — a pathological chain exceeding ``max_rounds``
    RAISES rather than silently returning unconverged (wrong) labels.

    ``shortcut=True`` adds pointer-doubling each round (lbl(n) ←
    min(lbl(n), lbl(lbl(n))) — one extra label-table self-join): distance
    to the component min HALVES per round, so convergence is O(log
    diameter) instead of O(diameter).  Use it for general graphs
    (:func:`raydatax.graph.connected_components` does); the near-dup
    paths keep the plain variant — their clusters are shallow and the
    extra join is pure overhead there.  Returns (node, label) for every
    node that appears in a pair — nothing is ever collected on the driver
    except the one convergence scalar per round."""
    from .relational import _join_partitions

    n_parts = _join_partitions(num_partitions or 16)

    def both(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"src": np.concatenate([a, b]), "dst": np.concatenate([b, a])}
        )

    edges = pairs.map_batches(both, batch_format="pyarrow").materialize()
    labels = preagg_groupby(
        edges.map_batches(
            lambda t: pa.table(
                {"node": t["src"], "label": pc.min_element_wise(t["src"], t["dst"])}
            ),
            batch_format="pyarrow",
        ),
        ["node"],
        [("label", "min", "label")],
    ).materialize()
    prev_sum = labels.sum("label")
    converged = False
    for _ in range(max_rounds):
        lbl_src = labels.map_batches(
            lambda t: pa.table({"src": t["node"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        prop = edges.join(lbl_src, "inner", n_parts, on=("src",))
        cand = prop.map_batches(
            lambda t: pa.table({"node": t["dst"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        merged = cand.union(labels)
        if shortcut:
            # pointer doubling: a node's label is itself a node id, so its
            # own label is one lookup away — lbl(n) ← lbl(lbl(n))
            lab_as_src = labels.map_batches(
                lambda t: pa.table({"src": t["label"], "orig": t["node"]}),
                batch_format="pyarrow",
            )
            hop = lab_as_src.join(lbl_src, "inner", n_parts, on=("src",))
            cand2 = hop.map_batches(
                lambda t: pa.table({"node": t["orig"], "label": t["label"]}),
                batch_format="pyarrow",
            )
            merged = merged.union(cand2)
        labels = preagg_groupby(
            merged, ["node"], [("label", "min", "label")]
        ).materialize()
        s = labels.sum("label")
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        raise RuntimeError(
            f"propagate_min_labels did not converge in {max_rounds} rounds "
            f"(a component's diameter exceeds it); raise max_rounds"
        )
    return labels


# Pair-set size at or under which clustering runs as driver union-find
# (bounded: LSH buckets are capped, so pairs ≤ Σ capped-bucket²).
PAIR_DRIVER_THRESHOLD = 200_000


def minhash_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    pair_driver_threshold: int = PAIR_DRIVER_THRESHOLD,
    **kw,
) -> "ray.data.Dataset":
    """Full near-dup pipeline → Dataset(doc_id, cluster_rep, keep).

    The candidate-pair set is materialized in the OBJECT STORE and counted
    from block metadata; a small pair set is clustered with driver
    union-find and the (tiny) node→rep mapping broadcast back into a
    map_batches over the ids, a large one goes through distributed
    min-label propagation + a hash left-join.  The corpus id list is never
    collected on the driver in either path."""
    pairs = minhash_candidate_pairs(
        ds, text_col, id_col, threshold=threshold, **kw
    ).materialize()
    n_pairs = pairs.count()
    ids = ds.select_columns([id_col])

    def _finalize(rep_of):
        """rep_of: (sorted keys, reps) numpy arrays broadcast via ray.put."""
        ref = ray.put(rep_of)

        def assign(t: pa.Table) -> pa.Table:
            keys, reps = ray.get(ref)
            idv = t[id_col].to_numpy(zero_copy_only=False)
            if len(keys):
                pos = np.minimum(np.searchsorted(keys, idv), len(keys) - 1)
                hit = keys[pos] == idv
                rep = np.where(hit, reps[pos], idv)
            else:
                rep = idv
            return pa.table(
                {
                    id_col: pa.array(idv, pa.int64()),
                    "cluster_rep": pa.array(rep, pa.int64()),
                    "keep": pa.array(rep == idv),
                }
            )

        return ids.map_batches(assign, batch_format="pyarrow")

    if n_pairs == 0:
        return _finalize((np.array([], np.int64), np.array([], np.int64)))
    if n_pairs <= pair_driver_threshold:
        tables = [t for t in ray.get(pairs.to_arrow_refs()) if t.num_rows]
        pr = pa.concat_tables(tables, promote_options="permissive")
        pair_list = list(
            zip(pr["a"].to_numpy(zero_copy_only=False).tolist(),
                pr["b"].to_numpy(zero_copy_only=False).tolist())
        )
        nodes = sorted({i for p in pair_list for i in p})
        mapping = cluster_pairs(pair_list, nodes)
        keys = np.array(nodes, np.int64)
        reps = np.array([mapping[n] for n in nodes], np.int64)
        return _finalize((keys, reps))

    from .relational import _join_partitions

    labels = propagate_min_labels(pairs)
    lbl = labels.map_batches(
        lambda t: pa.table({id_col: t["node"], "cluster_rep": t["label"]}),
        batch_format="pyarrow",
    )
    joined = ids.join(lbl, "left_outer", _join_partitions(16), on=(id_col,))

    def fin(t: pa.Table) -> pa.Table:
        rep = pc.coalesce(t["cluster_rep"], t[id_col])
        return pa.table(
            {
                id_col: t[id_col],
                "cluster_rep": rep.combine_chunks() if isinstance(rep, pa.ChunkedArray) else rep,
                "keep": pc.equal(rep, t[id_col]),
            }
        )

    return joined.map_batches(fin, batch_format="pyarrow")


def keep_best_dedup(
    ds: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    quality_col: str = "n_chars",
    id_col: str = "doc_id",
    pair_driver_threshold: int = PAIR_DRIVER_THRESHOLD,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Canonical-document selection over a VERIFIED near-dup pair Dataset:
    cluster the pairs into connected components, then keep the BEST
    document per cluster — max ``quality_col``, ties to the smallest id —
    instead of the naive min-id rule.  Returns ``(id_col, canonical_id,
    keep)`` for every document that appears in a pair (singletons never
    enter the clustered relation).

    Distributed end-to-end: clustering is the engine's adaptive path
    (driver union-find only while the metadata-counted pair set is under
    ``pair_driver_threshold``, else :func:`propagate_min_labels`); the
    representative comes from one hash join of the (node, label) relation
    against the corpus's (id, quality) columns followed by distributed
    ``grouped_topk`` n=1 over (quality DESC, id ASC) — per-doc metadata is
    never read onto the driver and no per-cluster Python loop exists at
    any scale.  Reference parity: the upsert-selects-winner contract
    (/root/reference/plugin-rdbms-util/.../WriterUtil.java:113-146)
    generalized from latest-wins to a quality rule."""
    from .relational import grouped_topk, hash_join

    pairs = pairs.select_columns(["a", "b"]).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "canonical_id": pa.array([], pa.int64()),
            "keep": pa.array([], pa.bool_()),
        }))
    if n_pairs <= pair_driver_threshold:
        tables = [t for t in ray.get(pairs.to_arrow_refs()) if t.num_rows]
        pr = pa.concat_tables(tables, promote_options="permissive")
        pair_list = list(
            zip(pr["a"].to_numpy(zero_copy_only=False).tolist(),
                pr["b"].to_numpy(zero_copy_only=False).tolist())
        )
        nodes = sorted({i for p in pair_list for i in p})
        mapping = cluster_pairs(pair_list, nodes)
        labels = ray.data.from_arrow(pa.table({
            "node": pa.array(nodes, pa.int64()),
            "label": pa.array([mapping[n] for n in nodes], pa.int64()),
        }))
    else:
        labels = propagate_min_labels(pairs, num_partitions=num_partitions)

    lbl = labels.map_batches(
        lambda t: pa.table({id_col: t["node"], "label": t["label"]}),
        batch_format="pyarrow",
    )
    # members: one row per clustered doc with its quality — materialized
    # because it feeds BOTH the representative pick and the final
    # canonical join; portable joins (no per-join actor pool, no
    # schema-less-empty-block hazard between chained joins)
    members = hash_join(
        lbl, ds.select_columns([id_col, quality_col]), on=id_col,
        num_partitions=num_partitions, portable=True,
    ).materialize()
    best = grouped_topk(
        members, "label",
        [(quality_col, "descending"), (id_col, "ascending")], 1,
    )
    canon = best.map_batches(
        lambda t: pa.table({"label": t["label"], "canonical_id": t[id_col]}),
        batch_format="pyarrow",
    )
    out = hash_join(
        members.select_columns([id_col, "label"]), canon, on="label",
        num_partitions=num_partitions, portable=True,
    )

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col],
            "canonical_id": t["canonical_id"],
            "keep": pc.equal(t[id_col], t["canonical_id"]),
        })

    return out.map_batches(fin, batch_format="pyarrow")


# ------------------------------------------------------ incremental minhash


def _index_epochs(index_dir: str) -> tuple[list[tuple[int, str]], int]:
    """((epoch number, dir name) for every LIVE epoch, ascending; the
    folded-compaction horizon).  An epoch folded into a later compacted
    epoch (its number ≤ the max ``_folded.json`` ``folded_upto`` marker)
    is dead history — skipped even if its dir still exists (crash between
    the compaction commit and its cleanup), the same marker discipline as
    ``compact_changelog``."""
    import json
    import os

    entries = []
    for d in (os.listdir(index_dir) if os.path.isdir(index_dir) else []):
        if d.startswith("epoch-"):
            entries.append((int(d.split("-", 1)[1]), d))
    horizon = -1
    for num, d in entries:
        mp = os.path.join(index_dir, d, "_folded.json")
        if os.path.exists(mp):
            with open(mp) as f:
                horizon = max(horizon, int(json.load(f)["folded_upto"]))
    live = sorted((num, d) for num, d in entries if num > horizon)
    return live, horizon


def _lsh_index_files(index_dir: str) -> tuple[list[str], int]:
    """(sorted parquet files across LIVE epoch-N subdirs — including the
    hive-style ``__bucket=H`` leaves of bucket-partitioned epochs, next
    epoch number).  ``.stage-*`` dirs (in-flight writes, see
    :func:`_commit_index_epoch`) are invisible — a crashed add never
    contributes partial rows.  The next epoch number is max+1 over ALL
    epoch dirs (folded ones included): a count-based number could collide
    with a surviving higher-numbered epoch after compaction removes the
    folded dirs."""
    import glob
    import os

    live, _ = _index_epochs(index_dir)
    all_nums = [
        int(d.split("-", 1)[1])
        for d in (os.listdir(index_dir) if os.path.isdir(index_dir) else [])
        if d.startswith("epoch-")
    ]
    files = sorted(
        f
        for _, e in live
        for f in glob.glob(
            os.path.join(index_dir, e, "**", "*.parquet"), recursive=True
        )
    )
    return files, (max(all_nums) + 1 if all_nums else 0)


# INDEX LAYOUT.  The hash-partitioned on-disk index layout is the
# incremental analogue of otsstreamreader's per-shard checkpoint locality
# (/root/reference/otsstreamreader/.../model/ShardCheckpoint.java:8-118):
# each epoch is written as epoch-N/__bucket=H/ with H = key_hash % B, so a
# probe reads ONLY the buckets the new crawl touches — read cost ∝ delta,
# not ∝ corpus.  B (INDEX_BUCKETS, defined at module top) is INDEX-LEVEL
# state (like the lake's partition map and the IVF centroids): fixed at
# the first bucketed commit, persisted in _index.json, reused by every
# later add and probe — mixing bucket counts would misroute probes.  At
# web scale set it so one bucket's rows fit a read task comfortably
# (e.g. 4096); the default suits test corpora.


def _index_meta_path(index_dir: str) -> str:
    import os

    return os.path.join(index_dir, "_index.json")


def _load_index_buckets(index_dir: str) -> int | None:
    """Stored bucket count, or None for a legacy (flat-epoch) index —
    probes then fall back to reading the whole index."""
    import json
    import os

    p = _index_meta_path(index_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(json.load(f)["buckets"])


def _ensure_index_buckets(index_dir: str, buckets: int = INDEX_BUCKETS) -> int:
    import json
    import os

    stored = _load_index_buckets(index_dir)
    if stored is not None:
        return stored  # index-level state: the stored value always wins
    os.makedirs(index_dir, exist_ok=True)
    tmp = _index_meta_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"buckets": int(buckets)}, f)
    os.replace(tmp, _index_meta_path(index_dir))
    return int(buckets)


def _index_files_for_buckets(
    index_dir: str, wanted: "set[int] | None"
) -> list[str]:
    """Index files pruned to the probed bucket set: bucket-partitioned
    epochs contribute only their ``__bucket=H`` leaves with H ∈ wanted;
    legacy flat epochs contribute all their files (no pruning possible,
    still correct).  ``wanted=None`` reads everything."""
    import glob
    import os

    out: list[str] = []
    if not os.path.isdir(index_dir):
        return out
    live, _ = _index_epochs(index_dir)
    for _, e in live:
        edir = os.path.join(index_dir, e)
        subs = sorted(
            d for d in os.listdir(edir) if d.startswith("__bucket=")
        )
        if not subs:  # legacy flat epoch — unprunable, read it whole
            out.extend(sorted(glob.glob(os.path.join(edir, "*.parquet"))))
            continue
        if wanted is not None:
            subs = [d for d in subs if int(d.split("=", 1)[1]) in wanted]
        for d in subs:
            out.extend(sorted(glob.glob(os.path.join(edir, d, "*.parquet"))))
    return out


def _wanted_buckets(rows, bucket_fn, buckets: int) -> set[int]:
    """Distinct bucket ids the probing side touches: per-block distinct
    inside ``map_batches`` (no shuffle — a groupby here costs a full
    sort-exchange for ≤ ``buckets`` outputs), then a driver union over at
    most blocks × ``buckets`` tiny int rows."""
    b = rows.map_batches(
        lambda t: pa.table(
            {"__bucket": np.unique(
                bucket_fn(t, buckets).to_numpy(zero_copy_only=False)
            )}
        ),
        batch_format="pyarrow",
    )
    return {r["__bucket"] for r in b.take_all()}


def _bucket_exact(t: pa.Table, buckets: int) -> pa.Array:
    """Bucket of an exact-dedup key: integer keys bucket on their own
    bits; string keys (custom ``key_fn``s, e.g. lowercase prefixes) go
    through the engine's deterministic buffer-level string hash."""
    col = t["__k"]
    if pa.types.is_integer(col.type):
        k = (pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
             .astype(np.int64).view(np.uint64))
    else:
        from .partition import hash_string_column

        k = hash_string_column(col)
    return pa.array((k % np.uint64(buckets)).astype(np.int64))


def _bucket_minhash(t: pa.Table, buckets: int) -> pa.Array:
    # same composite bucket key as the probe's __bkey: bh ^ (band+1)
    b = t["band"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = t["bh"].to_numpy(zero_copy_only=False).astype(np.int64)
    key = (h ^ (b + 1)).view(np.uint64)
    return pa.array((key % np.uint64(buckets)).astype(np.int64))


def _bucket_embedding(t: pa.Table, buckets: int) -> pa.Array:
    c = t["__cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.array(c % buckets)


def _drop_hive_bucket(t: pa.Table) -> pa.Table:
    """Reading bucketed epoch files re-materializes ``__bucket`` as a hive
    STRING column; it is layout metadata, not index data — drop it."""
    return t.drop_columns(["__bucket"]) if "__bucket" in t.column_names else t


def _commit_index_epoch(
    index_dir: str, next_epoch: int, rows, bucket_fn=None,
    buckets: int = INDEX_BUCKETS, marker: dict | None = None,
) -> str:
    """Crash-atomic index epoch append: write the rows Dataset into a
    ``.stage-epoch-N`` dir, then ``os.rename`` it to ``epoch-N`` — the
    same stage-then-flip discipline as the lake sink.  A crash mid-write
    leaves only an invisible stage dir; a retry overwrites it.  With a
    ``bucket_fn`` the epoch is hash-partitioned on disk
    (``__bucket=H/`` hive leaves) so later probes read ∝ delta."""
    import os
    import shutil

    final = os.path.join(index_dir, f"epoch-{next_epoch}")
    stage = os.path.join(index_dir, f".stage-epoch-{next_epoch}")
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage)
    if bucket_fn is not None:
        B = _ensure_index_buckets(index_dir, buckets)
        rows = rows.map_batches(
            lambda t: t.append_column("__bucket", bucket_fn(t, B)),
            batch_format="pyarrow",
        )
        # range-partition by bucket before the hive write: an unsorted
        # write splits EVERY task's block across every bucket (tasks × B
        # tiny files — measured 4085 files for a 14 MB epoch, and the
        # next probe's read paid ~10 s just opening them); sorted, each
        # output block spans a contiguous bucket range so the epoch is
        # ~max(blocks, B) files
        rows.sort("__bucket").write_parquet(stage, partition_cols=["__bucket"])
    else:
        rows.write_parquet(stage)
    if marker is not None:
        # a compacted epoch carries the horizon marker INSIDE itself so the
        # marker and the merged rows become visible in one atomic rename
        import json

        with open(os.path.join(stage, "_folded.json"), "w") as f:
            json.dump(marker, f)
    # rename onto an existing committed epoch fails loudly (ENOTEMPTY) —
    # concurrent adds to one index are not supported (use the job lock)
    os.rename(stage, final)
    return final


def _index_bucket_fn(files: list[str]):
    """Infer the index kind (→ its bucket function) from the stored row
    schema: minhash rows carry (band, bh), embedding rows __cluster, exact
    rows __k."""
    import pyarrow.parquet as pq

    names = set(pq.read_schema(files[0]).names)
    if {"band", "bh"} <= names:
        return _bucket_minhash
    if "__cluster" in names:
        return _bucket_embedding
    if "__k" in names:
        return _bucket_exact
    return None


def compact_index(index_dir: str, min_epochs: int = 2) -> dict:
    """Fold a persistent dedup index's accumulated epochs into ONE
    bucket-partitioned epoch — the index analogue of
    ``compact_changelog``.  At steady state (a crawl per hour → an epoch
    per hour) a probe opens epochs × probed-bucket files; compaction caps
    that at ~1 file per probed bucket until the next accumulation.

    Crash-atomic via the changelog marker discipline: the merged epoch is
    staged then renamed into place carrying ``_folded.json`` (horizon =
    the max folded epoch number) INSIDE it, so commit is one rename;
    readers skip epochs at or below the horizon even while their dirs
    still exist, and a re-run finishes the interrupted cleanup.  Works on
    all three index kinds (exact key / MinHash bands / IVF clusters —
    inferred from the stored schema) and re-buckets legacy flat epochs."""
    import os
    import shutil

    live, horizon = _index_epochs(index_dir)
    # finish any interrupted cleanup first (folded dirs below the horizon)
    swept = 0
    for d in (os.listdir(index_dir) if os.path.isdir(index_dir) else []):
        if d.startswith("epoch-") and int(d.split("-", 1)[1]) <= horizon:
            shutil.rmtree(os.path.join(index_dir, d))
            swept += 1
    if len(live) < min_epochs:
        return {"action": "noop", "live_epochs": len(live),
                "cleanup_swept": swept}

    files, next_epoch = _lsh_index_files(index_dir)
    rows = ray.data.read_parquet(files).map_batches(
        _drop_hive_bucket, batch_format="pyarrow"
    )
    fold_upto = max(num for num, _ in live)
    _commit_index_epoch(
        index_dir, next_epoch, rows,
        bucket_fn=_index_bucket_fn(files),
        buckets=_load_index_buckets(index_dir) or INDEX_BUCKETS,
        marker={"folded_upto": fold_upto},
    )
    for num, d in live:
        shutil.rmtree(os.path.join(index_dir, d))
    return {"action": "compacted", "folded_epochs": len(live),
            "epoch": next_epoch, "folded_upto": fold_upto,
            "cleanup_swept": swept}


def minhash_index_add(
    docs: "ray.data.Dataset",
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    seed: int = 7,
    index_buckets: int = INDEX_BUCKETS,
) -> int:
    """Append every doc's LSH band rows (band, bh, doc_id, sig) to the
    persistent index as a new epoch of parquet part files (distributed
    write — the exploded rows never pass through the driver).  Returns the
    epoch number written.  LSH parameters are a property of the index —
    every add and probe must use the same (num_perm, bands, k, seed);
    ``index_buckets`` only matters on the FIRST add (stored value wins)."""
    import os

    _, next_epoch = _lsh_index_files(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    _commit_index_epoch(
        index_dir, next_epoch,
        _explode_bands(docs, text_col, id_col, num_perm, bands, k, seed),
        bucket_fn=_bucket_minhash, buckets=index_buckets,
    )
    return next_epoch


def _pairs_from_groups_mixed(group: pa.Table, max_bucket: int = 64) -> pa.Table:
    """Candidate pairs within one probed bucket, SKIPPING old–old pairs:
    only pairs touching at least one new doc matter — indexed docs were
    paired against each other in their own ingest epochs.  Same truncation
    discipline as :func:`_pairs_from_groups`; pairs are emitted (min id,
    max id) regardless of which side is new."""
    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "a_is_new": pa.array([], pa.bool_()), "b_is_new": pa.array([], pa.bool_()),
         "est_jaccard": pa.array([], pa.float64()),
         "truncated": pa.array([], pa.bool_())}
    )
    if group.num_rows < 2:
        return empty
    trunc = group.num_rows > max_bucket
    # keep new rows preferentially under truncation — an old row can only
    # pair against a new one, so new rows are the scarce resource.  Within
    # each class order by id so the kept subset is DETERMINISTIC (the
    # shuffle's arrival order is not — the documented
    # partitioning-independence of keep/dup_of depends on this)
    order0 = np.lexsort(
        (
            group["doc_id"].to_numpy(zero_copy_only=False),
            ~group["is_new"].to_numpy(zero_copy_only=False),
        )
    )
    g = group.take(pa.array(order0[:max_bucket]))
    ids = g["doc_id"].to_numpy(zero_copy_only=False)
    new = g["is_new"].to_numpy(zero_copy_only=False)
    sig = np.stack(g["sig"].to_numpy(zero_copy_only=False))
    order = np.argsort(ids)
    ids, new, sig = ids[order], new[order], sig[order]
    iu = np.triu_indices(len(ids), 1)
    touch_new = new[iu[0]] | new[iu[1]]
    lo, hi = iu[0][touch_new], iu[1][touch_new]
    if not len(lo):
        return empty
    est = (sig[lo] == sig[hi]).mean(axis=1)
    return pa.table(
        {
            "a": pa.array(ids[lo], pa.int64()),
            "b": pa.array(ids[hi], pa.int64()),
            "a_is_new": pa.array(new[lo]),
            "b_is_new": pa.array(new[hi]),
            "est_jaccard": pa.array(est, pa.float64()),
            "truncated": pa.array(np.full(len(lo), trunc)),
        }
    )


def incremental_minhash_pairs(
    new_docs: "ray.data.Dataset",
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kw,
) -> "ray.data.Dataset":
    """Candidate near-dup pairs touching at least one NEW doc — see
    :func:`_incremental_minhash_probe` (this is the pair output alone)."""
    _, pairs = _incremental_minhash_probe(new_docs, index_dir, text_col, id_col, **kw)
    return pairs


def _incremental_minhash_probe(
    new_docs: "ray.data.Dataset",
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    threshold: float = 0.5,
    seed: int = 7,
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """(new band rows MATERIALIZED, candidate pairs): the new crawl's band
    rows probe the PERSISTENT LSH index.  Index rows move only where a new
    band hash lands (adaptive semi join on the bucket key — at steady
    state the probed slice is ∝ the new crawl, not the corpus), old–old
    pairs are never generated.  Pair rows carry ``a_is_new``/``b_is_new``
    (False ⇒ that side is an indexed doc).  The returned band rows let the
    dedup path append survivors WITHOUT recomputing signatures — at crawl
    scale the shingle+minhash pass is the dominant CPU cost."""
    from .relational import semi_join

    new_rows = _explode_bands(
        new_docs, text_col, id_col, num_perm, bands, k, seed
    ).map_batches(
        lambda t: t.append_column("is_new", pa.array(np.ones(t.num_rows, bool))),
        batch_format="pyarrow",
    ).materialize()

    files, _ = _lsh_index_files(index_dir)
    if files:
        # the on-disk index is hash-partitioned by bucket key
        # (epoch-N/__bucket=H/): prune the read to the buckets the new
        # crawl's band hashes land in — read ∝ delta, not ∝ corpus
        # (legacy flat epochs fall back to a full read)
        B = _load_index_buckets(index_dir)
        if B:
            files = _index_files_for_buckets(
                index_dir, _wanted_buckets(new_rows, _bucket_minhash, B)
            )
    both = new_rows
    if files:
        # composite bucket key for the probe: band is 0..bands-1, bh is a
        # 64-bit hash — mixing with XOR on shifted band keeps int64 exact
        def bkey(t: pa.Table) -> pa.Table:
            t = _drop_hive_bucket(t)
            b = t["band"].to_numpy(zero_copy_only=False).astype(np.int64)
            h = t["bh"].to_numpy(zero_copy_only=False)
            return t.append_column("__bkey", pa.array(h ^ (b + 1), pa.int64()))

        index = ray.data.read_parquet(files).map_batches(bkey, batch_format="pyarrow")
        # mask-path membership (raised threshold): the probe side carries
        # the sig list column, which acero hash joins cannot hold as a
        # payload — the bucket-key set is bands×new_docs int64s, bounded by
        # the crawl, broadcast once.  Bucket pruning above already bounds
        # the rows that ever leave disk; this join bounds what shuffles.
        probed = semi_join(
            index, new_rows.map_batches(bkey, batch_format="pyarrow"),
            left_on="__bkey", right_on="__bkey",
            broadcast_threshold=50_000_000,
        ).map_batches(
            lambda t: t.drop_columns(["__bkey"]).append_column(
                "is_new", pa.array(np.zeros(t.num_rows, bool))
            ),
            batch_format="pyarrow",
        )
        both = new_rows.union(probed)
    pairs = both.groupby(["band", "bh"]).map_groups(
        _pairs_from_groups_mixed, batch_format="pyarrow"
    )
    pairs = pairs.map_batches(
        lambda t: t.filter(pc.greater_equal(t["est_jaccard"], threshold)),
        batch_format="pyarrow",
    )
    # the flags are a pure function of (a, b) → fold them into the group
    # key (no bool aggregation kernels needed, no duplicate groups)
    pairs = preagg_groupby(
        pairs,
        ["a", "b", "a_is_new", "b_is_new"],
        [("est_jaccard", "max", "est_jaccard")],
    )
    return new_rows, pairs


def _mark_new_docs(
    pairs: "ray.data.Dataset",
    ids: "ray.data.Dataset",
    id_col: str,
    pair_driver_threshold: int = PAIR_DRIVER_THRESHOLD,
) -> "ray.data.Dataset":
    """Shared keep/drop marking for the incremental dedup family.  Input:
    a MATERIALIZED pair Dataset with (a, b, a_is_new, b_is_new) — old–old
    pairs must already be excluded — and the new crawl's id column.
    Output: (id_col, dup_of, keep) per new doc.

    (1) a new doc paired with an INDEXED partner is dropped (``dup_of`` =
    min such partner); (2) the remaining new docs cluster over the
    new–new pairs (adaptive: driver union-find under a metadata-counted
    threshold, distributed min-label propagation above) and each
    cluster's min id keeps."""
    def split_cross(t: pa.Table) -> pa.Table:
        cross = t.filter(pc.xor(t["a_is_new"], t["b_is_new"]))
        nid = pc.if_else(cross["a_is_new"], cross["a"], cross["b"])
        partner = pc.if_else(cross["a_is_new"], cross["b"], cross["a"])
        return pa.table({"nid": nid, "partner": partner})

    dropped_by_index = preagg_groupby(
        pairs.map_batches(split_cross, batch_format="pyarrow"),
        ["nid"],
        [("partner", "min", "dup_of")],
    ).materialize()

    new_new = pairs.map_batches(
        lambda t: t.filter(
            pc.and_(t["a_is_new"], t["b_is_new"])
        ).select(["a", "b"]),
        batch_format="pyarrow",
    ).materialize()

    from .graph import connected_components

    comp = connected_components(
        new_new, src_col="a", dst_col="b",
        pair_driver_threshold=pair_driver_threshold,
    )

    from .relational import _join_partitions

    # ONE join, not a chain: (a) an EMPTY mapped Dataset reaching
    # Dataset.join has no schema (acero "no match for key field") — branch
    # on metadata counts; (b) Ray's JoinOperator emits SCHEMA-LESS blocks
    # for empty hash partitions, so chaining a second join off the first
    # fails the same way whenever the crawl is small relative to the
    # partition count (a one-doc hourly micro-crawl is a legitimate
    # input).  The two right sides are union-merged on the id first —
    # a doc can appear in both (index-killed AND in a new-new pair), and
    # max-over-one-non-null-per-side preserves both columns.
    n_parts = _join_partitions(16)
    sides = []
    if dropped_by_index.count():
        sides.append(dropped_by_index.map_batches(
            lambda t: pa.table({
                id_col: t["nid"],
                "dup_of_idx": t["dup_of"],
                "rep": pa.nulls(t.num_rows, t["dup_of"].type),
            }),
            batch_format="pyarrow",
        ))
    comp = comp.materialize()
    if comp.count():
        sides.append(comp.map_batches(
            lambda t: pa.table({
                id_col: t["node"],
                "dup_of_idx": pa.nulls(t.num_rows, t["component"].type),
                "rep": t["component"],
            }),
            batch_format="pyarrow",
        ))
    out = ids
    if sides:
        merged = sides[0] if len(sides) == 1 else sides[0].union(*sides[1:])
        merged = preagg_groupby(
            merged, [id_col],
            [("dup_of_idx", "max", "dup_of_idx"), ("rep", "max", "rep")],
        )
        out = ids.join(merged, "left_outer", n_parts, on=(id_col,))

    def fin(t: pa.Table) -> pa.Table:
        idv = t[id_col]
        rep = (
            pc.coalesce(t["rep"], idv) if "rep" in t.column_names else idv
        )
        if "dup_of_idx" in t.column_names:
            idx_kill = pc.is_valid(t["dup_of_idx"])
            dup_of = pc.coalesce(t["dup_of_idx"], rep)
        else:
            idx_kill = pa.array(np.zeros(t.num_rows, bool))
            dup_of = rep
        keep = pc.and_(pc.invert(idx_kill), pc.equal(rep, idv))
        return pa.table(
            {
                id_col: idv.combine_chunks() if isinstance(idv, pa.ChunkedArray) else idv,
                "dup_of": dup_of.combine_chunks() if isinstance(dup_of, pa.ChunkedArray) else dup_of,
                "keep": keep.combine_chunks() if isinstance(keep, pa.ChunkedArray) else keep,
            }
        )

    return out.map_batches(fin, batch_format="pyarrow").materialize()


def _append_survivor_rows(
    marked: "ray.data.Dataset",
    new_rows: "ray.data.Dataset",
    id_col: str,
    index_dir: str,
    bucket_fn=None,
) -> int:
    """Shared index-update epilogue of the incremental dedup family:
    filter the ALREADY-COMPUTED index rows (band rows / IVF assignments)
    to the kept docs — mask-based semi join with a raised threshold so a
    list payload never reaches an acero hash join — drop the ``is_new``
    probe flag, and append them as the next index epoch.  Signatures /
    assignments are never recomputed.  Returns the kept-doc count (0 ⇒
    nothing appended)."""
    import os

    from .relational import semi_join

    kept = marked.map_batches(
        lambda t: t.filter(
            t["keep"].combine_chunks()
            if isinstance(t["keep"], pa.ChunkedArray) else t["keep"]
        ).select([id_col]),
        batch_format="pyarrow",
    ).materialize()
    n = kept.count()
    if n:  # an all-duplicate crawl adds nothing to the index
        rows = semi_join(
            new_rows, kept, left_on=id_col, broadcast_threshold=50_000_000
        ).map_batches(
            lambda t: t.drop_columns(["is_new"]), batch_format="pyarrow"
        )
        _, next_epoch = _lsh_index_files(index_dir)
        _commit_index_epoch(index_dir, next_epoch, rows, bucket_fn=bucket_fn)
    return n


def incremental_minhash_dedup(
    new_docs: "ray.data.Dataset",
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    update_index: bool = True,
    pair_driver_threshold: int = PAIR_DRIVER_THRESHOLD,
    **kw,
) -> "ray.data.Dataset":
    """Near-dup dedup of a new crawl against every previous crawl — the
    steady-state web-scale loop (a 100-TB corpus is never re-dedup'd whole;
    new documents probe the persisted LSH index).  Returns ``(doc_id,
    dup_of, keep)`` for the NEW docs only:

    - a new doc directly paired with an INDEXED doc is dropped
      (``dup_of`` = smallest such indexed partner);
    - remaining new docs are clustered over the new–new pairs (adaptive:
      driver union-find under a metadata-counted pair threshold,
      distributed min-label propagation above) and the min-id
      representative of each cluster keeps;
    - survivors' band rows are appended to the index (``update_index``),
      so the next crawl dedups against this one's survivors.

    Kept/dropped status is deterministic and partitioning-independent.
    Note the documented asymmetry vs re-running the batch dedup on the
    union: dropped docs are not re-indexed, so transitive chains resolve
    through each epoch's survivor — standard incremental-LSH semantics."""
    import os

    new_rows, pairs = _incremental_minhash_probe(
        new_docs, index_dir, text_col, id_col, threshold=threshold, **kw
    )
    pairs = pairs.materialize()

    ids = new_docs.select_columns([id_col])
    marked = _mark_new_docs(pairs, ids, id_col, pair_driver_threshold)
    if update_index:
        _append_survivor_rows(marked, new_rows, id_col, index_dir,
                              bucket_fn=_bucket_minhash)
    return marked


# ----------------------------------------------------------------- simhash


def simhash64(col: pa.Array, k_token: int = 1, seed: int = 11) -> np.ndarray:
    """64-bit SimHash per doc from word-token hashes: per-bit signed sums via
    64 vectorized ``reduceat`` passes (no per-doc loops)."""
    toks = pc.split_pattern_regex(pc.coalesce(col, pa.scalar("")), r"\s+")
    flat = pc.list_flatten(toks)
    flat = flat.filter(pc.not_equal(flat, ""))  # may contain empties at edges
    # token list offsets: rebuild via list lengths minus removed empties —
    # simpler: recompute by splitting lengths before filtering
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    # count empties per doc to adjust offsets
    empty_mask = pc.equal(pc.list_flatten(toks), "")
    if pc.any(empty_mask).as_py():
        # per-doc empties: explode doc index and sum mask
        doc_idx = np.repeat(np.arange(len(col)), lens)
        em = empty_mask.to_numpy(zero_copy_only=False)
        adj = np.bincount(doc_idx[em], minlength=len(col)) if em.any() else 0
        lens = lens - adj
    off = np.zeros(len(col) + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])

    # polynomial full-string hash per token (the fingerprint kernel)
    from .text import fingerprint_rolling

    tok_tab = pa.table({"t": flat})
    th = fingerprint_rolling(tok_tab, "t", "h")["h"].to_numpy(zero_copy_only=False).view(np.uint64)
    with np.errstate(over="ignore"):
        th = (th + np.uint64(seed)) * np.uint64(0x9E3779B97F4A7C15)
        th ^= th >> np.uint64(29)
    n = len(col)
    out = np.zeros(n, dtype=np.uint64)
    nonempty = np.diff(off) > 0
    starts = off[:-1][nonempty]
    for bit in range(64):
        signs = (((th >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) * 2 - 1)
        sums = np.zeros(n, dtype=np.int64)
        if len(signs):
            sums[nonempty] = np.add.reduceat(signs, starts)
        out |= (sums > 0).astype(np.uint64) << np.uint64(bit)
    return out


def simhash_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int | None = 128,
) -> "ray.data.Dataset":
    """Near-dup pairs by SimHash: bucket on each of `bands` 16-bit slices
    (any pair within Hamming ≤ bands-1 shares ≥1 slice), verify Hamming.
    ``max_bucket`` caps an adversarially hot slice bucket (truncated
    deterministically by id); ``None`` lifts the cap — the exact-verify
    twin ``pipelines.dedup_simhash_verified`` needs completeness, while
    production keeps the cap as its all-pairs guard."""

    def explode(batch: pa.Table) -> pa.Table:
        col = _string_col(batch, text_col)
        sh = simhash64(col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        width = 64 // bands
        mask = np.uint64((1 << width) - 1)
        parts = [
            ((sh >> np.uint64(b * width)) & mask).astype(np.int64) for b in range(bands)
        ]
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), len(ids))),
                "key": pa.array(np.stack(parts, axis=1).reshape(-1)),
                "doc_id": pa.array(np.repeat(ids, bands), pa.int64()),
                "sh": pa.array(np.repeat(sh.view(np.int64), bands), pa.int64()),
            }
        )

    cap = max_bucket

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                          "hamming": pa.array([], pa.int64())})
        if group.num_rows < 2:
            return empty
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        sh = group["sh"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.argsort(ids)
        ids, sh = ids[order], sh[order]
        # same cap discipline as the MinHash buckets: an adversarially hot
        # 16-bit slice bucket must not explode into all-pairs — truncate
        # (deterministically, by id order) instead of O(n²)-ing
        if cap is not None and len(ids) > cap:
            ids, sh = ids[:cap], sh[:cap]
        iu = np.triu_indices(len(ids), 1)
        x = sh[iu[0]] ^ sh[iu[1]]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
            if not x.any():
                break
        keep = ham <= max_hamming
        return pa.table({"a": pa.array(ids[iu[0]][keep], pa.int64()),
                         "b": pa.array(ids[iu[1]][keep], pa.int64()),
                         "hamming": pa.array(ham[keep])})

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    pairs = exploded.groupby(["band", "key"]).map_groups(bucket_pairs, batch_format="pyarrow")
    return preagg_groupby(pairs, ["a", "b"], [("hamming", "min", "hamming")])


# ------------------------------------------------- embedding-cosine near-dup


def _adaptive_clusters(
    n_rows: int, target_rows_per_cluster: int = 4096,
    max_clusters: int = 65_536,
) -> int:
    """IVF cluster count from the corpus size: ~target rows per cluster so
    the within-cluster O(k²) scoring stays bounded as the corpus grows (a
    fixed cluster count would make k = N/16 dwarf any cap and let
    truncation silently dominate — the opposite of what dedup is for)."""
    return max(1, min(max_clusters, -(-n_rows // target_rows_per_cluster)))


def embedding_neardup_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int | None = None,
    sample_rows: int = 4096,
    seed: int = 5,
    assign_probes: int = 2,
    target_rows_per_cluster: int = 4096,
) -> "ray.data.Dataset":
    """Embedding-cosine near-duplicate pairs (cosine ≥ threshold, a < b),
    returned as a DATASET — pair sets of a near-duplicate-heavy corpus
    (exactly the corpus dedup exists for) are O(Σ cluster-pairs) and never
    pass through the driver (shape parity with :func:`minhash_dedup`).

    Scale path: IVF-style bucketing — deterministic k-means on a sample,
    assign every vector to its ``assign_probes`` nearest centroids inside
    ``map_batches`` (multi-probe assignment: boundary vectors land in both
    neighboring clusters, recovering most near-boundary pairs), then
    all-pairs cosine ONLY within each capped cluster (``groupby(cluster)``
    map_groups), pairs deduplicated across probes.  Remaining cross-cluster
    misses are the documented approximation (same contract as IVF ANN).
    ``n_clusters=None`` (default) derives the cluster count from the
    dataset's row count at ~``target_rows_per_cluster`` rows per cluster
    (:func:`_adaptive_clusters`) so within-cluster work stays bounded as
    the corpus grows."""
    from .ann import _matrix, _normalize, kmeans_fit

    if n_clusters is None:
        n_clusters = _adaptive_clusters(ds.count(), target_rows_per_cluster)
        # enough sample support to actually separate that many clusters
        sample_rows = max(sample_rows, 8 * n_clusters)
    sample = ds.limit(sample_rows).take_all()
    smat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample])
    cent = kmeans_fit(smat, min(n_clusters, len(smat)), seed=seed)
    probes = max(1, min(assign_probes, len(cent)))
    ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _normalize(_matrix(batch[vec_col]))
        sims = m @ c.T
        top = np.argsort(-sims, axis=1)[:, :probes].astype(np.int32)
        idx = np.repeat(np.arange(batch.num_rows), probes)
        out = batch.take(pa.array(idx))
        return out.append_column("__cluster", pa.array(top.reshape(-1)))

    def pairs_in_cluster(group: pa.Table, max_cluster: int = 8192) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        if group.num_rows < 2:
            return empty
        ids = group[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_matrix(group[vec_col]))
        order = np.argsort(ids)
        ids, m = ids[order], m[order]
        # cluster-size cap: within-cluster work is O(k²); a skewed cluster
        # is truncated deterministically (by id) rather than allowed to
        # blow up — at real scale raise n_clusters so k stays bounded
        if len(ids) > max_cluster:
            ids, m = ids[:max_cluster], m[:max_cluster]
        # blocked matmul keeps peak memory at chunk×k instead of k×k
        chunk = 2048
        parts_a, parts_b, parts_c = [], [], []
        for s in range(0, len(ids), chunk):
            sims = m[s : s + chunk] @ m.T
            ii, jj = np.nonzero(sims >= threshold)
            gi = ii + s
            up = jj > gi  # strict upper triangle only (a < b)
            parts_a.append(ids[gi[up]])
            parts_b.append(ids[jj[up]])
            parts_c.append(sims[ii[up], jj[up]])
        if not parts_a:
            return empty
        return pa.table({"a": pa.array(np.concatenate(parts_a), pa.int64()),
                         "b": pa.array(np.concatenate(parts_b), pa.int64()),
                         "cosine": pa.array(np.concatenate(parts_c), pa.float64())})

    out = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("__cluster")
        .map_groups(pairs_in_cluster, batch_format="pyarrow")
    )
    # multi-probe assignment surfaces the same pair from ≥1 cluster →
    # dedupe — and that pre-aggregated Dataset IS the result (consumers
    # sort or write it; the driver never holds the pair set)
    return preagg_groupby(out, ["a", "b"], [("cosine", "max", "cosine")])


def embedding_allpairs_exact(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 8192,
) -> pa.Table:
    """EXACT cosine-threshold self-join: the verification baseline for
    :func:`embedding_neardup_pairs` (same contract as brute-force top-k vs
    IVF in ``ann.py``).

    Blocked block-pair tasks, not a broadcast: vectors are normalized and
    re-blocked to ``block_rows``, blocks stay in the object store, and one
    Ray task per block pair (i ≤ j) does a single (block × block) float64
    matmul — P(P+1)/2 tasks, each holding exactly two blocks.  Compute is
    inherently O(N²·d) (it is the exact join); memory per task and driver
    traffic (only surviving pairs come back) are bounded.  No node ever
    sees the whole matrix."""
    n = ds.count()  # metadata-only on the parquet read (projection keeps rows)
    prepped = ds.map_batches(
        lambda t: pa.table({id_col: t[id_col], vec_col: t[vec_col]}),
        batch_format="pyarrow",
    )
    num_blocks = max(1, -(-n // block_rows))
    refs = prepped.repartition(num_blocks).to_arrow_refs()

    empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})

    @ray.remote(num_cpus=1)
    def pair_task(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
        from .ann import _matrix, _normalize

        if ta.num_rows == 0 or tb.num_rows == 0:
            return empty
        ia = ta[id_col].to_numpy(zero_copy_only=False)
        ib = tb[id_col].to_numpy(zero_copy_only=False)
        ma = _normalize(_matrix(ta[vec_col]))
        mb = _normalize(_matrix(tb[vec_col]))
        sims = ma @ mb.T
        ii, jj = np.nonzero(sims >= threshold)
        aa, bb = ia[ii], ib[jj]
        # orient a < b; drop self-pairs (diagonal of the same-block task)
        lo, hi = np.minimum(aa, bb), np.maximum(aa, bb)
        keep = lo < hi
        if same:  # same block scores every ordered pair twice — keep one
            keep &= aa < bb
        return pa.table({"a": pa.array(lo[keep], pa.int64()),
                         "b": pa.array(hi[keep], pa.int64()),
                         "cosine": pa.array(sims[ii[keep], jj[keep]], pa.float64())})

    futs = [
        pair_task.remote(refs[i], refs[j], i == j)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    parts = [t for t in ray.get(futs) if t.num_rows]
    if not parts:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    out = pa.concat_tables(parts)
    # cross-block duplicates are impossible (each unordered block pair runs
    # once) — just order the result deterministically
    return out.sort_by([("a", "ascending"), ("b", "ascending")])


# ------------------------------------------------------- exact n-gram jaccard


# ---------------------------------------------- incremental embedding dedup


def _embedding_index_meta(index_dir: str):
    """(centroid matrix or None, stored assign_probes, epoch files, next
    epoch).  Centroids AND probe count are index-level state, fixed at
    creation — every add and probe must use the same values or rows land
    in incompatible cluster sets."""
    import os

    files, next_epoch = _lsh_index_files(index_dir)  # same epoch-N layout
    cpath = os.path.join(index_dir, "_centroids.parquet")
    cent, probes = None, None
    if os.path.exists(cpath):
        import pyarrow.parquet as pq

        t = pq.read_table(cpath)
        cent = np.stack([np.asarray(v, np.float64) for v in t["centroid"].to_pylist()])
        meta = t.schema.metadata or {}
        probes = int(meta.get(b"assign_probes", b"2"))
    return cent, probes, files, next_epoch


def _ensure_centroids(
    index_dir: str,
    ds: "ray.data.Dataset",
    vec_col: str,
    n_clusters: int,
    sample_rows: int,
    seed: int,
    assign_probes: int,
    create: bool = True,
):
    """Load the index's persisted centroids (returning the full
    ``(cent, probes, files, next_epoch)`` meta tuple), fitting +
    persisting them from a sample of ``ds`` on FIRST use when ``create``
    — the cluster partitioning and probe count are index-level state
    (same rule as the lake's partition mapping); every later add and
    probe reuses them.  ``create=False`` (read-only probes) RAISES on a
    missing index instead of silently creating one at a mistyped path."""
    import os

    from .ann import kmeans_fit

    cent, probes, files, next_epoch = _embedding_index_meta(index_dir)
    if cent is not None:
        return cent, probes, files, next_epoch
    if not create:
        raise ValueError(
            f"no embedding index at {index_dir} — add vectors first "
            "(read-only probes never create an index)"
        )
    sample = ds.limit(sample_rows).take_all()
    if not sample:
        raise ValueError(
            "cannot fit index centroids from an EMPTY vector dataset"
        )
    smat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample])
    cent = kmeans_fit(smat, n_clusters, seed=seed)
    probes = max(1, min(assign_probes, len(cent)))
    os.makedirs(index_dir, exist_ok=True)
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"centroid": pa.array([list(c) for c in cent])}).replace_schema_metadata(
            {b"assign_probes": str(probes).encode()}
        ),
        os.path.join(index_dir, "_centroids.parquet"),
    )
    return cent, probes, files, next_epoch


def _assign_multiprobe(
    batch: pa.Table, cent: np.ndarray, probes: int, id_col: str, vec_col: str
) -> pa.Table:
    """The index row kernel shared by index ADD and PROBE (they MUST stay
    identical — probe rows of surviving vectors are appended verbatim):
    each vector duplicated into its ``probes`` nearest clusters, with a
    ``__primary`` flag on the rank-0 row so readers can take exactly one
    row per id without a join."""
    from .ann import _matrix, _normalize

    m = _normalize(_matrix(batch[vec_col]))
    sims = m @ cent.T
    top = np.argsort(-sims, axis=1)[:, :probes].astype(np.int32)
    idx = np.repeat(np.arange(batch.num_rows), probes)
    out = pa.table({id_col: batch[id_col], vec_col: batch[vec_col]}).take(
        pa.array(idx)
    )
    out = out.append_column("__cluster", pa.array(top.reshape(-1)))
    primary = np.zeros(out.num_rows, bool)
    primary[::probes] = True
    return out.append_column("__primary", pa.array(primary))


def embedding_index_add(
    ds: "ray.data.Dataset",
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int | None = None,
    sample_rows: int = 4096,
    seed: int = 5,
    assign_probes: int = 2,
    index_buckets: int = INDEX_BUCKETS,
) -> int:
    """Append vectors to the persistent IVF near-dup index.  The FIRST add
    fits deterministic k-means centroids on a sample and persists them
    (``_centroids.parquet``, see :func:`_ensure_centroids`); with
    ``n_clusters=None`` the count is derived from the first crawl's size
    (:func:`_adaptive_clusters` — ~4096 rows/cluster).  Rows are stored
    multi-probe-assigned (id, vector, __cluster) so probes only ever move
    matching clusters; ``index_buckets`` matters only at creation."""
    import os

    from .ann import _matrix, _normalize

    if n_clusters is None:
        n_clusters = _adaptive_clusters(ds.count())
        sample_rows = max(sample_rows, 8 * n_clusters)
    cent, probes, _, next_epoch = _ensure_centroids(
        index_dir, ds, vec_col, n_clusters, sample_rows, seed, assign_probes
    )
    ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        return _assign_multiprobe(batch, ray.get(ref), probes, id_col, vec_col)

    _commit_index_epoch(
        index_dir, next_epoch, ds.map_batches(assign, batch_format="pyarrow"),
        bucket_fn=_bucket_embedding, buckets=index_buckets,
    )
    return next_epoch


def incremental_embedding_pairs(
    new_vecs: "ray.data.Dataset",
    index_dir: str,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = 8192,
) -> "ray.data.Dataset":
    """Cosine near-dup candidate pairs touching at least one NEW vector —
    see :func:`_incremental_embedding_probe` (pair output alone)."""
    _, pairs = _incremental_embedding_probe(
        new_vecs, index_dir, threshold, id_col, vec_col, max_cluster
    )
    return pairs


def _incremental_embedding_probe(
    new_vecs: "ray.data.Dataset",
    index_dir: str,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = 8192,
    create_index: bool = False,
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """(assigned new rows MATERIALIZED, candidate pairs): new vectors are
    assigned with the INDEX's persisted centroids (and its stored probe
    count) and probe only the matching clusters (adaptive semi join — at
    steady state the probed slice is ∝ the new crawl); within each
    cluster one capped blocked matmul scores new×all, old–old pairs are
    skipped.  Approximation contract is the same as the batch IVF variant
    (cross-cluster misses); :func:`incremental_embedding_exact_pairs` is
    the exact baseline.  The returned assigned rows (index row schema +
    ``is_new``) let the dedup path append survivors without re-running
    the assignment matmul."""
    from .ann import _matrix, _normalize
    from .relational import semi_join

    # first-crawl bootstrap (only when the caller may WRITE the index):
    # fit + persist centroids from the new vectors — an empty index then
    # simply yields new-new pairs only.  Read-only probes raise on a
    # missing index instead of creating one at a mistyped path.  Cluster
    # count is corpus-derived at creation (the extra count() pass runs
    # only on the bootstrap crawl; existing indexes use their persisted
    # centroids untouched).
    n_clusters, sample_rows = 16, 4096
    if _embedding_index_meta(index_dir)[0] is None and create_index:
        n_clusters = _adaptive_clusters(new_vecs.count())
        sample_rows = max(sample_rows, 8 * n_clusters)
    cent, probes, files, _ = _ensure_centroids(
        index_dir, new_vecs, vec_col, n_clusters=n_clusters,
        sample_rows=sample_rows, seed=5, assign_probes=2, create=create_index,
    )
    ref = ray.put(cent)

    def assign_new(batch: pa.Table) -> pa.Table:
        out = _assign_multiprobe(batch, ray.get(ref), probes, id_col, vec_col)
        return out.append_column("is_new", pa.array(np.ones(out.num_rows, bool)))

    new_rows = new_vecs.map_batches(assign_new, batch_format="pyarrow").materialize()
    if files:
        # IVF epochs are hash-partitioned by cluster id on disk — read
        # only the clusters the new vectors probe (∝ delta, not corpus)
        B = _load_index_buckets(index_dir)
        if B:
            files = _index_files_for_buckets(
                index_dir, _wanted_buckets(new_rows, _bucket_embedding, B)
            )
    both = new_rows
    if files:  # empty index (first crawl) → new-new pairs only
        index = ray.data.read_parquet(files).map_batches(
            lambda t: _drop_hive_bucket(t).append_column(
                "is_new", pa.array(np.zeros(t.num_rows, bool))
            ),
            batch_format="pyarrow",
        )
        probed = semi_join(index, new_rows, left_on="__cluster", right_on="__cluster")
        both = new_rows.union(probed)

    def pairs_in_cluster(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "a_is_new": pa.array([], pa.bool_()), "b_is_new": pa.array([], pa.bool_()),
             "cosine": pa.array([], pa.float64()),
             "truncated": pa.array([], pa.bool_())}
        )
        if group.num_rows < 2:
            return empty
        trunc = group.num_rows > max_cluster
        # new rows preferentially under the cap (old rows only pair vs
        # new), id-ordered within each class — deterministic truncation,
        # same discipline + `truncated` flag as the LSH bucket caps
        order0 = np.lexsort(
            (
                group[id_col].to_numpy(zero_copy_only=False),
                ~group["is_new"].to_numpy(zero_copy_only=False),
            )
        )
        g = group.take(pa.array(order0[:max_cluster]))
        ids = g[id_col].to_numpy(zero_copy_only=False)
        new = g["is_new"].to_numpy(zero_copy_only=False)
        m = _normalize(_matrix(g[vec_col]))
        order = np.argsort(ids)
        ids, new, m = ids[order], new[order], m[order]
        chunk = 2048
        pa_, pb_, pan, pbn, pcs = [], [], [], [], []
        for s in range(0, len(ids), chunk):
            sims = m[s : s + chunk] @ m.T
            ii, jj = np.nonzero(sims >= threshold)
            gi = ii + s
            up = (jj > gi) & (new[gi] | new[jj])  # a<b, touch-new only
            pa_.append(ids[gi[up]]); pb_.append(ids[jj[up]])
            pan.append(new[gi[up]]); pbn.append(new[jj[up]])
            pcs.append(sims[ii[up], jj[up]])
        if not pa_ or not len(np.concatenate(pa_)):
            return empty
        n_out = len(np.concatenate(pa_))
        return pa.table(
            {
                "a": pa.array(np.concatenate(pa_), pa.int64()),
                "b": pa.array(np.concatenate(pb_), pa.int64()),
                "a_is_new": pa.array(np.concatenate(pan)),
                "b_is_new": pa.array(np.concatenate(pbn)),
                "cosine": pa.array(np.concatenate(pcs), pa.float64()),
                "truncated": pa.array(np.full(n_out, trunc)),
            }
        )

    pairs = both.groupby("__cluster").map_groups(
        pairs_in_cluster, batch_format="pyarrow"
    )
    # a pair can surface from several probes → dedup (flags are functions
    # of the ids: fold into the key)
    pairs = preagg_groupby(
        pairs, ["a", "b", "a_is_new", "b_is_new"], [("cosine", "max", "cosine")]
    )
    return new_rows, pairs


def incremental_embedding_exact_pairs(
    new_vecs: "ray.data.Dataset",
    index_dir: str,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 8192,
) -> pa.Table:
    """EXACT cosine pairs touching at least one new vector: blocked
    block-pair Ray tasks — new×new (i ≤ j) plus new×index cross blocks.
    Index blocks stay in the object store; old–old blocks are never
    scored.  The verification baseline for the IVF-probed variant, and
    itself SQL-verifiable (every pair is a plain exact cosine)."""
    from .ann import _matrix, _normalize

    _, _, files, _ = _embedding_index_meta(index_dir)

    def prep(src):
        return src.map_batches(
            lambda t: pa.table({id_col: t[id_col], vec_col: t[vec_col]}),
            batch_format="pyarrow",
        )

    n_new = new_vecs.count()
    new_blocks = prep(new_vecs).repartition(max(1, -(-n_new // block_rows))).to_arrow_refs()
    old_blocks = []
    if files:
        # the index stores multi-probe rows; __primary marks exactly one
        # row per id (predicate-pruned read, no shuffle, no join — acero
        # joins cannot carry list payloads)
        old = ray.data.read_parquet(
            files, filter=(pc.field("__primary") == True)  # noqa: E712
        ).materialize()
        n_old = old.count()
        old_blocks = prep(old).repartition(max(1, -(-n_old // block_rows))).to_arrow_refs()

    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "a_is_new": pa.array([], pa.bool_()), "b_is_new": pa.array([], pa.bool_()),
         "cosine": pa.array([], pa.float64())}
    )

    @ray.remote(num_cpus=1)
    def pair_task(ta: pa.Table, tb: pa.Table, same: bool, tb_is_new: bool) -> pa.Table:
        if ta.num_rows == 0 or tb.num_rows == 0:
            return empty
        ia = ta[id_col].to_numpy(zero_copy_only=False)
        ib = tb[id_col].to_numpy(zero_copy_only=False)
        ma = _normalize(_matrix(ta[vec_col]))
        mb = _normalize(_matrix(tb[vec_col]))
        sims = ma @ mb.T
        ii, jj = np.nonzero(sims >= threshold)
        aa, bb = ia[ii], ib[jj]
        lo, hi = np.minimum(aa, bb), np.maximum(aa, bb)
        keep = lo < hi
        if same:
            keep &= aa < bb
        # ta is always the NEW side; flags follow the (lo, hi) orientation
        a_new = np.where(aa[keep] == lo[keep], True, tb_is_new)
        b_new_arr = np.where(aa[keep] == lo[keep], tb_is_new, True)
        return pa.table(
            {"a": pa.array(lo[keep], pa.int64()), "b": pa.array(hi[keep], pa.int64()),
             "a_is_new": pa.array(a_new), "b_is_new": pa.array(b_new_arr),
             "cosine": pa.array(sims[ii[keep], jj[keep]], pa.float64())}
        )

    futs = [
        pair_task.remote(new_blocks[i], new_blocks[j], i == j, True)
        for i in range(len(new_blocks))
        for j in range(i, len(new_blocks))
    ] + [
        pair_task.remote(nb, ob, False, False)
        for nb in new_blocks
        for ob in old_blocks
    ]
    tables = [t for t in ray.get(futs) if t.num_rows]
    if not tables:
        return empty
    out = pa.concat_tables(tables, promote_options="permissive")
    # dedup (a pair can only appear once here, but index multi-probe rows
    # duplicated ids were already collapsed) — sort for determinism
    order = np.lexsort(
        (out["b"].to_numpy(zero_copy_only=False), out["a"].to_numpy(zero_copy_only=False))
    )
    return out.take(pa.array(order))


def incremental_embedding_dedup(
    new_vecs: "ray.data.Dataset",
    index_dir: str,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    update_index: bool = True,
    pair_driver_threshold: int = PAIR_DRIVER_THRESHOLD,
    **kw,
) -> "ray.data.Dataset":
    """Embedding near-dup dedup of a new crawl against the persistent IVF
    index — the embedding-modality member of the incremental family
    (exact: :func:`incremental_exact_dedup`, text LSH:
    :func:`incremental_minhash_dedup`).  Marking semantics are shared
    (:func:`_mark_new_docs`): index-killed vectors carry ``dup_of`` = the
    indexed partner, survivors cluster and their ALREADY-ASSIGNED rows
    are appended to the index (the assignment matmul is not re-run)."""
    new_rows, pairs = _incremental_embedding_probe(
        new_vecs, index_dir, threshold, id_col, vec_col,
        create_index=update_index, **kw
    )
    pairs = pairs.materialize()
    ids = new_vecs.select_columns([id_col])
    marked = _mark_new_docs(pairs, ids, id_col, pair_driver_threshold)
    if update_index:
        _append_survivor_rows(marked, new_rows, id_col, index_dir,
                              bucket_fn=_bucket_embedding)
    return marked


def _pair_shingle_stats(
    ds: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    k: int,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Dataset-native exact shingle statistics for a candidate-pair
    Dataset — the distributed backbone of the ``*_verify`` overloads:
    returns ``(a, b, ni, na, nb)`` (intersection size and each side's
    distinct char-k-gram count) with NOTHING held on the driver.

    Shape: the corpus is semi-joined down to the pair endpoints, each
    surviving doc explodes into distinct (doc, gram-hash) rows (text never
    shuffles — only 64-bit hashes), then two hash joins land each pair's
    left-side grams on the right side's gram rows — intersection rows per
    pair — and one pre-aggregated count plus two size left-joins finish
    the stats.  Work ∝ Σ candidate-pair shingle-set sizes (LSH survivors
    only), never the corpus; this is the 100-TB path the list-based
    verify's driver collection can't take.  Integer counts only; the
    callers do the single IEEE division, so values match the list path
    bit-for-bit."""
    from .relational import hash_join, semi_join

    pairs = pairs.select_columns(["a", "b"]).materialize()
    if pairs.count() == 0:
        return ray.data.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "ni": pa.array([], pa.int64()), "na": pa.array([], pa.int64()),
            "nb": pa.array([], pa.int64()),
        }))

    def endpoints(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({"x": pa.array(np.concatenate([a, b]), pa.int64())})

    need = pairs.map_batches(endpoints, batch_format="pyarrow")
    sub = semi_join(ds.select_columns([id_col, text_col]), need, id_col, "x")

    def explode(batch: pa.Table) -> pa.Table:
        col = _string_col(batch, text_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        win, off = shingle_hashes(col, k)
        uniq = [np.unique(win[off[i]:off[i + 1]]).view(np.int64)
                for i in range(len(col))]
        counts = np.array([len(u) for u in uniq], np.int64)
        if not counts.sum():
            return pa.table({"__id": pa.array([], pa.int64()),
                             "gram": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "__id": pa.array(np.repeat(ids.astype(np.int64), counts)),
            "gram": pa.array(np.concatenate([u for u in uniq if len(u)])),
            "n": pa.array(np.repeat(counts, counts)),
        })

    # each gram row carries its doc's distinct-shingle COUNT ("n", emitted
    # by explode), so the sizes ride the intersection rows for free (max
    # over a constant) instead of two extra size joins; a pair with ZERO
    # intersection gets ni=na=nb=0 from the final left join — sound,
    # because every score derived from the stats (Jaccard, either
    # containment) is exactly 0.0 when ni=0 regardless of true set sizes
    grams = sub.map_batches(explode, batch_format="pyarrow").materialize()

    def rename(new_id: str, n_out: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({new_id: t["__id"], "gram": t["gram"], n_out: t["n"]})
        return f

    # portable (bucket-cogroup) joins: no per-join actor pool, and no
    # schema-less-empty-block hazard between chained joins
    ga = grams.map_batches(rename("a", "na"), batch_format="pyarrow")
    gb = grams.map_batches(rename("b", "nb"), batch_format="pyarrow")
    j1 = hash_join(pairs, ga, on="a", num_partitions=num_partitions,
                   portable=True)
    inter = hash_join(j1, gb, on=["b", "gram"], num_partitions=num_partitions,
                      portable=True)
    stats = preagg_groupby(
        inter, ["a", "b"],
        [("gram", "count", "ni"), ("na", "max", "na"), ("nb", "max", "nb")],
    )
    withni = hash_join(pairs, stats, on=["a", "b"], join_type="left_outer",
                       num_partitions=num_partitions, portable=True)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "a": t["a"], "b": t["b"],
            "ni": pc.fill_null(t["ni"], 0).cast(pa.int64()),
            "na": pc.fill_null(t["na"], 0).cast(pa.int64()),
            "nb": pc.fill_null(t["nb"], 0).cast(pa.int64()),
        })

    return withni.map_batches(fin, batch_format="pyarrow")


def ngram_jaccard_verify(
    ds: "ray.data.Dataset",
    pairs: "list[tuple[int, int]] | ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> "pa.Table | ray.data.Dataset":
    """Exact char-k-gram Jaccard for candidate pairs.

    ``pairs`` as a DATASET (columns a, b) runs the fully distributed path
    (:func:`_pair_shingle_stats` — hash joins of gram rows onto the pair
    relation, zero driver collection) and returns a Dataset of
    ``(a, b, jaccard)`` — the corpus-scale verify stage.  ``pairs`` as a
    Python list keeps the bounded driver path (shingle sets of ONLY the
    referenced docs collected via broadcast-id semi-join) and returns a
    pa.Table in pair-list order.  Both compute |∩| / |∪| as one IEEE
    division over exact integers — identical values either way."""
    if isinstance(pairs, ray.data.Dataset):
        stats = _pair_shingle_stats(ds, pairs, text_col, id_col, k)

        def fin(t: pa.Table) -> pa.Table:
            ni = t["ni"].to_numpy(zero_copy_only=False).astype(np.int64)
            na = t["na"].to_numpy(zero_copy_only=False).astype(np.int64)
            nb = t["nb"].to_numpy(zero_copy_only=False).astype(np.int64)
            union = na + nb - ni
            jac = np.where(union > 0, ni / np.maximum(union, 1), 0.0)
            return pa.table({"a": t["a"], "b": t["b"],
                             "jaccard": pa.array(jac, pa.float64())})

        return stats.map_batches(fin, batch_format="pyarrow")
    sets = _pair_shingle_sets(ds, pairs, text_col, id_col, k)
    out = []
    for a, b in pairs:
        sa, sb = sets.get(a, set()), sets.get(b, set())
        union = len(sa | sb)
        out.append({"a": a, "b": b, "jaccard": (len(sa & sb) / union) if union else 0.0})
    return pa.Table.from_pylist(out) if out else pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "jaccard": pa.array([], pa.float64())}
    )


def ngram_containment_verify(
    ds: "ray.data.Dataset",
    pairs: "list[tuple[int, int]] | ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> "pa.Table | ray.data.Dataset":
    """Exact char-k-gram CONTAINMENT for candidate pairs — the
    asymmetric near-dup metric (|A∩B| / |A| and |A∩B| / |B|): detects
    quotes / partial inclusion where Jaccard stays low because the hosts
    differ in size (a 100-word quote inside a 10k-word page is
    containment ≈ 1 for the quote, Jaccard ≈ 0.01).  Same pair-Dataset /
    pair-list dual contract as :func:`ngram_jaccard_verify`; divisions
    are integer-over-integer, cross-engine exact."""
    if isinstance(pairs, ray.data.Dataset):
        stats = _pair_shingle_stats(ds, pairs, text_col, id_col, k)

        def fin(t: pa.Table) -> pa.Table:
            ni = t["ni"].to_numpy(zero_copy_only=False).astype(np.int64)
            na = t["na"].to_numpy(zero_copy_only=False).astype(np.int64)
            nb = t["nb"].to_numpy(zero_copy_only=False).astype(np.int64)
            ca = np.where(na > 0, ni / np.maximum(na, 1), 0.0)
            cb = np.where(nb > 0, ni / np.maximum(nb, 1), 0.0)
            return pa.table({"a": t["a"], "b": t["b"],
                             "contain_a": pa.array(ca, pa.float64()),
                             "contain_b": pa.array(cb, pa.float64())})

        return stats.map_batches(fin, batch_format="pyarrow")
    sets = _pair_shingle_sets(ds, pairs, text_col, id_col, k)
    out = []
    for a, b in pairs:
        sa, sb = sets.get(a, set()), sets.get(b, set())
        ni = len(sa & sb)
        out.append({
            "a": a, "b": b,
            "contain_a": (ni / len(sa)) if sa else 0.0,
            "contain_b": (ni / len(sb)) if sb else 0.0,
        })
    return pa.Table.from_pylist(out) if out else pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "contain_a": pa.array([], pa.float64()),
         "contain_b": pa.array([], pa.float64())}
    )


def _pair_shingle_sets(
    ds: "ray.data.Dataset",
    pairs: list[tuple[int, int]],
    text_col: str,
    id_col: str,
    k: int,
) -> dict[int, set]:
    """Distinct char-k-gram hash sets for the docs referenced by a pair
    list (bounded by the list, never the corpus)."""
    need = sorted({i for p in pairs for i in p})
    ref = ray.put(pa.array(need, pa.int64()))

    def collect(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch[id_col], value_set=ray.get(ref))
        sub = batch.filter(m)
        if sub.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "sh": pa.array([], pa.list_(pa.int64()))})
        col = _string_col(sub, text_col)
        win, off = shingle_hashes(col, k)
        lists = [np.unique(win[off[i]:off[i + 1]]).view(np.int64) for i in range(len(col))]
        return pa.table({id_col: sub[id_col], "sh": pa.array([list(x) for x in lists], pa.list_(pa.int64()))})

    rows = ds.map_batches(collect, batch_format="pyarrow").take_all()
    return {r[id_col]: set(r["sh"]) for r in rows}


# ------------------------------------------- duplicated-span removal


def _hot_span_grams(
    ds: "ray.data.Dataset",
    n: int,
    min_count: int,
    min_docs: int,
    column: str,
    id_col: str,
    sep: str,
) -> "ray.data.Dataset":
    """Corpus-duplicated word n-grams: total occurrences >= min_count AND
    distinct documents >= min_docs.  Two pre-aggregated groupbys — the
    first (the only heavy shuffle) moves one row per distinct (gram, doc)
    per block, the second one row per distinct gram.  Never the text."""
    from .text import ngram_table

    grams = ds.map_batches(
        lambda t: ngram_table(t, n, column, id_col, sep), batch_format="pyarrow"
    )
    per_doc = preagg_groupby(grams, ["ng", id_col], [(id_col, "count", "__c")])
    stats = preagg_groupby(
        per_doc, ["ng"], [("__c", "sum", "total"), ("__c", "count", "ndocs")]
    )

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["total"], min_count),
            pc.greater_equal(t["ndocs"], min_docs),
        )
        return t.filter(m).select(["ng"])

    return stats.map_batches(keep, batch_format="pyarrow")


def duplicated_span_removal(
    ds: "ray.data.Dataset",
    n: int = 8,
    min_count: int = 2,
    min_docs: int = 2,
    column: str = "text",
    id_col: str = "doc_id",
    sep: str = " ",
    broadcast_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """Exact substring (duplicated-span) deduplication, the sequence-level
    dedup of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better") re-expressed over word n-grams: find every n-token
    span repeated across the corpus, then strip ALL tokens covered by any
    such span from every document.  Unlike document-level dedup (exact /
    MinHash above) this removes boilerplate duplicated INSIDE otherwise
    distinct documents — the dominant duplication mode in web crawls.

    Returns a Dataset of ``(id, n_tokens, n_removed, text_clean)``, one
    row per input document (``text_clean = ""`` when fully covered).

    Scale shape: hot-gram discovery is the defining cost — one shuffle of
    (gram, doc) partials (suffix arrays do it in one machine's RAM; at
    corpus scale the shuffle IS the suffix array).  The rewrite is then
    adaptive on the hot-set size, read from block metadata:

    - **broadcast path** (hot set <= ``broadcast_threshold``): the gram
      strings are ``ray.put`` once and every batch rebuilds locally — one
      ``is_in`` over the batch's gram strings, a difference-array cover
      mask over the flat token space, and one ``binary_join`` to re-join
      survivors.  No second shuffle; docs never leave their block.
    - **reassembly path** (hot set larger): grams-with-positions semi-join
      the hot set (hash-partitioned, build side never on the driver),
      covered token positions expand batch-local, and surviving tokens
      re-join per document via the ordered ``grouped_concat`` — the
      reassembly shuffle is the price of a hot set too big to broadcast.

    Both paths emit identical rows (differential-tested).  SQL twin: see
    the ``dedup_span_exact`` oracle (hot grams via GROUP BY ... HAVING,
    cover via a DISTINCT position-range join, rebuild via string_agg
    ORDER BY position)."""
    hot = _hot_span_grams(ds, n, min_count, min_docs, column, id_col, sep).materialize()
    n_hot = hot.count()
    if n_hot <= broadcast_threshold:
        from .relational import _fetch_partials

        tables = [t for t in _fetch_partials(hot.to_arrow_refs()) if t.num_rows]
        hot_arr = (
            pa.concat_tables(tables)["ng"].combine_chunks()
            if tables
            else pa.array([], pa.string())
        )
        if isinstance(hot_arr, pa.ChunkedArray):
            hot_arr = hot_arr.chunk(0) if hot_arr.num_chunks else pa.array([], pa.string())
        ref = ray.put(hot_arr)
        return ds.map_batches(
            lambda t: _strip_spans_batch(t, ray.get(ref), n, column, id_col, sep),
            batch_format="pyarrow",
        )
    return _strip_spans_reassemble(ds, hot, n, column, id_col, sep)


def _strip_spans_batch(
    batch: pa.Table,
    hot_arr: pa.Array,
    n: int,
    column: str,
    id_col: str,
    sep: str,
) -> pa.Table:
    """Batch-local span strip: gram membership → difference-array cover
    mask over the flat token space → one filter + ListArray re-wrap +
    binary_join.  No per-row Python."""
    from .text import ngram_table

    col = batch[column].combine_chunks()
    lists = pc.split_pattern(col, sep)
    lens = pc.fill_null(pc.list_value_length(lists), 0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    total = int(lens.sum())
    covered = np.zeros(total, dtype=bool)
    if total and len(hot_arr):
        grams = ngram_table(batch, n, column, id_col, sep, pos_col="pos")
        member = pc.is_in(grams["ng"], value_set=hot_arr).to_numpy(
            zero_copy_only=False
        )
        if member.any():
            doc_starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
            # grams carry 1-based within-doc positions; map back to flat
            gid = pc.index_in(
                grams[id_col], value_set=batch[id_col].combine_chunks()
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            flat_start = (
                doc_starts[gid[member]]
                + grams["pos"].to_numpy(zero_copy_only=False)[member]
                - 1
            )
            d = np.zeros(total + 1, dtype=np.int64)
            np.add.at(d, flat_start, 1)
            np.subtract.at(d, flat_start + n, 1)  # never crosses a doc end
            covered = np.cumsum(d[:-1]) > 0
    flat = pc.list_flatten(lists)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    surviving = flat.filter(pa.array(~covered))
    cum_cov = np.concatenate(([0], np.cumsum(covered)))
    ends = np.cumsum(lens)
    starts = ends - lens
    removed = cum_cov[ends] - cum_cov[starts]
    new_lens = lens - removed
    offsets = np.concatenate(([0], np.cumsum(new_lens))).astype(np.int32)
    relisted = pa.ListArray.from_arrays(pa.array(offsets), surviving)
    clean = pc.binary_join(relisted, sep)
    # null input text -> 0 tokens, null output (split of null is null)
    is_null = pc.is_null(col)
    clean = pc.if_else(is_null, pa.nulls(len(col), pa.string()), clean)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pa.array(lens),
            "n_removed": pa.array(removed),
            "text_clean": clean,
        }
    )


def _strip_spans_reassemble(
    ds: "ray.data.Dataset",
    hot: "ray.data.Dataset",
    n: int,
    column: str,
    id_col: str,
    sep: str,
) -> "ray.data.Dataset":
    """Hot set too large to broadcast: semi-join grams against it, expand
    covered positions batch-local, anti-join the exploded tokens on a
    composite (id:pos) key, reassemble per document with the ordered
    grouped_concat, and left-join back onto per-doc token counts so fully
    covered documents still emit a row (text_clean = "")."""
    from .relational import grouped_concat, hash_join, preagg_groupby, semi_join
    from .text import explode_tokens, ngram_table

    def ckey(t: pa.Table, pos: str) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(t[id_col], pa.string()), pc.cast(t[pos], pa.string()), ":"
        )
        return t.append_column("__k", k)

    grams = ds.map_batches(
        lambda t: ngram_table(t, n, column, id_col, sep, pos_col="pos"),
        batch_format="pyarrow",
    )
    hits = semi_join(grams, hot, left_on="ng").select_columns([id_col, "pos"])

    def expand(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().take(
            pa.array(np.repeat(np.arange(t.num_rows, dtype=np.int64), n))
        )
        pos = (
            np.repeat(t["pos"].to_numpy(zero_copy_only=False), n)
            + np.tile(np.arange(n, dtype=np.int64), t.num_rows)
        )
        return pa.table({id_col: ids, "pos": pa.array(pos)})

    covered = preagg_groupby(
        hits.map_batches(expand, batch_format="pyarrow"),
        [id_col, "pos"],
        [("pos", "count", "__c")],
    ).map_batches(lambda t: ckey(t, "pos").select(["__k"]), batch_format="pyarrow")

    toks = ds.map_batches(
        lambda t: ckey(explode_tokens(t, column, id_col, sep, pos_col="pos"), "pos"),
        batch_format="pyarrow",
    )
    surv = semi_join(toks, covered, left_on="__k", anti=True)
    joined = grouped_concat(
        surv, [id_col], "tok", ["pos"], sep=sep,
        out_name="text_clean", count_name="__kept",
    )

    totals = ds.map_batches(
        lambda t: pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pc.fill_null(
                    pc.list_value_length(
                        pc.split_pattern(t[column].combine_chunks(), sep)
                    ),
                    0,
                ).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    out = hash_join(totals, joined, on=id_col, join_type="left_outer")

    def finish(t: pa.Table) -> pa.Table:
        kept = pc.fill_null(t["__kept"], 0).cast(pa.int64())
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": t["n_tokens"],
                "n_removed": pc.subtract(t["n_tokens"], kept),
                "text_clean": pc.fill_null(t["text_clean"], ""),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


# ----------------------------------------------------- similarity join


def _pairs_from_groups_cross(group: pa.Table, max_bucket: int = 64) -> pa.Table:
    """Candidate pairs within one LSH bucket, CROSS-SIDE ONLY — the join
    variant of :func:`_pairs_from_groups_mixed`: left–left and right–right
    pairs are never generated (a join, not a dedup).  Truncation keeps the
    first ``max_bucket`` rows PER SIDE ordered by id, so the kept subset
    (and therefore the join result) is deterministic under any shuffle
    arrival order; a ``truncated`` flag marks lossy buckets."""
    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "est_jaccard": pa.array([], pa.float64()),
         "truncated": pa.array([], pa.bool_())}
    )
    side = group["side"].to_numpy(zero_copy_only=False)
    nl, nr = int((side == 0).sum()), int((side == 1).sum())
    if nl == 0 or nr == 0:
        return empty
    trunc = nl > max_bucket or nr > max_bucket
    order = np.lexsort((group["doc_id"].to_numpy(zero_copy_only=False), side))
    keep = np.concatenate(
        (order[:nl][:max_bucket], order[nl:][:max_bucket])
    )
    g = group.take(pa.array(keep))
    ids = g["doc_id"].to_numpy(zero_copy_only=False)
    s = g["side"].to_numpy(zero_copy_only=False)
    sig = np.stack(g["sig"].to_numpy(zero_copy_only=False))
    li, ri = np.nonzero(s == 0)[0], np.nonzero(s == 1)[0]
    lo = np.repeat(li, len(ri))
    hi = np.tile(ri, len(li))
    est = (sig[lo] == sig[hi]).mean(axis=1)
    return pa.table(
        {
            "a": pa.array(ids[lo], pa.int64()),
            "b": pa.array(ids[hi], pa.int64()),
            "est_jaccard": pa.array(est, pa.float64()),
            "truncated": pa.array(np.full(len(lo), trunc)),
        }
    )


def similarity_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    threshold: float = 0.5,
    seed: int = 7,
    max_bucket: int = 64,
    verify: bool = True,
) -> pa.Table | "ray.data.Dataset":
    """Set-similarity join (the SSJoin / entity-resolution blocking
    pattern): pair every left row with every right row whose char-k-gram
    Jaccard is ≥ ``threshold``, without the L×R cross product — both sides
    MinHash into shared LSH band buckets (same permutations/seed, so equal
    texts collide by construction), only co-bucketed cross-side pairs are
    generated, and survivors are exact-verified on their true shingle
    sets.  Ids must be globally unique ACROSS both sides (tag them before
    calling if the tables share an id space).

    Scale shape: one shuffle of (band, hash) rows per side (∝ corpus ×
    bands, text never moves), per-bucket pair fan-out capped per SIDE at
    ``max_bucket`` (deterministic id-ordered truncation, flagged), exact
    verification ∝ candidates.  Recall is the LSH bound 1-(1-t^r)^b —
    certified complete at gate scale by the all-pairs SQL oracle
    (``similarity_join_docs``).  With ``verify=False`` returns the
    candidate Dataset (a, b, est_jaccard, truncated) unverified."""

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side, np.int8))
            )
        return f

    le = _explode_bands(left, text_col, id_col, num_perm, bands, k, seed)
    re_ = _explode_bands(right, text_col, id_col, num_perm, bands, k, seed)
    both = le.map_batches(tag(0), batch_format="pyarrow").union(
        re_.map_batches(tag(1), batch_format="pyarrow")
    )
    pairs = both.groupby(["band", "bh"]).map_groups(
        lambda g: _pairs_from_groups_cross(g, max_bucket),
        batch_format="pyarrow",
    )
    cand = preagg_groupby(
        pairs, ["a", "b"], [("est_jaccard", "max", "est_jaccard")]
    )
    if not verify:
        return cand
    # Dataset-native verify: the candidate pairs stay in the object store
    # (no driver pair list); only the VERIFIED result — bounded by the true
    # join output — is collected to honor the pa.Table return contract
    ver = ngram_jaccard_verify(
        left.union(right), cand.select_columns(["a", "b"]), text_col, id_col, k
    )
    kept = ver.map_batches(
        lambda t: t.filter(pc.greater_equal(t["jaccard"], threshold)),
        batch_format="pyarrow",
    )
    tables = [t for t in ray.get(kept.to_arrow_refs()) if t.num_rows]
    out = pa.concat_tables(tables, promote_options="permissive") if tables else pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "jaccard": pa.array([], pa.float64())}
    )
    return out.sort_by([("a", "ascending"), ("b", "ascending")])


# --------------------------------------------------- semantic dedup


def semantic_dedup_keep(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = True,
    block_rows: int = 8192,
    rule: str = "dominance",
) -> "ray.data.Dataset":
    """Semantic dedup keep-set over cosine near-dup pairs.  Two rules:

    ``rule="dominance"`` (default): drop a vector iff it has ANY partner
    with a smaller id (cosine ≥ threshold).  Order-free and
    SQL-expressible (the gate oracle); the kept set provably contains no
    near-dup pair, but on similarity CHAINS (a~b, b~c, a≁c) it
    over-deletes relative to SemDeDup — c drops because of the
    already-dropped b.  Conservative for dedup, not
    representative-preserving.

    ``rule="greedy"``: the SemDeDup (Abbas et al. 2023) keep-first rule —
    scan ids ascending, keep a vector iff no KEPT smaller neighbor; on
    the chain above it keeps {a, c}.  Sequential by nature, so it runs on
    the driver over the bounded exact pair table (requires
    ``exact=True``); every dropped vector has a KEPT near-duplicate.

    ``exact=True`` scores pairs with the blocked exact self-join
    (:func:`embedding_allpairs_exact` — the O(N²) verification baseline,
    SQL-certifiable); ``exact=False`` uses the IVF-clustered approximate
    pair stage (:func:`embedding_neardup_pairs`, the 100-TB path: work ∝
    cluster sizes, pairs never leave the cluster).  Survivors stream out
    through the adaptive anti semi join — never the driver."""
    from .relational import semi_join

    if rule not in ("dominance", "greedy"):
        raise ValueError(f"semantic_dedup_keep: unknown rule {rule!r}")
    if rule == "greedy" and not exact:
        raise ValueError(
            "semantic_dedup_keep: rule='greedy' needs the exact pair table "
            "(exact=True) — the keep-first scan is sequential in id order"
        )
    if exact:
        pairs_tab = embedding_allpairs_exact(
            ds, threshold=threshold, id_col=id_col, vec_col=vec_col,
            block_rows=block_rows,
        )
        if rule == "greedy":
            nbrs: dict[int, list[int]] = {}
            for a, b in zip(pairs_tab["a"].to_pylist(), pairs_tab["b"].to_pylist()):
                nbrs.setdefault(b, []).append(a)
            kept: set[int] = set()
            dropped = []
            for v in sorted(set(pairs_tab["a"].to_pylist())
                            | set(pairs_tab["b"].to_pylist())):
                if any(u in kept for u in nbrs.get(v, ())):
                    dropped.append(v)
                else:
                    kept.add(v)
            pairs = ray.data.from_arrow(
                pa.table({"b": pa.array(dropped, pa.int64())})
            )
        else:
            pairs = ray.data.from_arrow(pairs_tab.select(["b"]))
    else:
        pairs = embedding_neardup_pairs(
            ds, threshold=threshold, id_col=id_col, vec_col=vec_col
        ).select_columns(["b"])
    return semi_join(
        ds.select_columns([id_col]), pairs, left_on=id_col, right_on="b", anti=True
    )


def _levenshtein(a: str, b: str) -> int:
    """Exact Levenshtein distance — the classic full two-row DP scan,
    O(len_a·len_b), vectorized along the inner row (no band shortcut:
    cost is quadratic even for near-equal texts)."""
    if a == b:
        return 0
    if not a or not b:
        return max(len(a), len(b))
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    idx = np.arange(len(bb) + 1, dtype=np.int64)
    prev = idx.copy()
    cur = np.empty_like(prev)
    for i, ca in enumerate(np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)):
        cur[0] = i + 1
        # substitution / deletion candidates, fully vectorized
        np.minimum(prev[:-1] + (bb != ca), prev[1:] + 1, out=cur[1:])
        # insertion propagation: cur[j] = j + min_{i<=j}(cand[i] - i)
        # (a running min — one accumulate instead of a scalar scan)
        np.minimum.accumulate(cur - idx, out=cur)
        cur += idx
        prev, cur = cur, prev
    return int(prev[-1])


def edit_distance_verify(
    ds: "ray.data.Dataset",
    pairs: "list[tuple[int, int]] | ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 32,
) -> "pa.Table | ray.data.Dataset":
    """Exact Levenshtein distance for candidate pairs — the
    character-level verify stage (templated spam, OCR noise, small edits)
    complementing the set-based ones (Jaccard / containment).

    ``pairs`` as a DATASET (columns a, b) runs distributed: the corpus is
    semi-joined down to the pair endpoints, each endpoint's text rides two
    hash joins onto the pair relation (text moves, but only for LSH
    survivors — work and shuffle ∝ candidate pairs, zero driver
    collection), and each pair's DP runs inside ``map_batches``; returns
    a Dataset.  ``pairs`` as a Python list keeps the bounded driver path
    (referenced docs collected via broadcast-id filter) and returns a
    pa.Table in pair-list order.  A missing endpoint scores as the empty
    string on both paths.  Per-pair cost is the quadratic DP either way —
    bound pair lists and text lengths accordingly."""
    if isinstance(pairs, ray.data.Dataset):
        from .relational import hash_join, semi_join

        pairs = pairs.select_columns(["a", "b"]).materialize()
        if pairs.count() == 0:
            return ray.data.from_arrow(pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "edit_dist": pa.array([], pa.int64())}
            ))

        def endpoints(t: pa.Table) -> pa.Table:
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            return pa.table({"x": pa.array(np.concatenate([a, b]), pa.int64())})

        need = pairs.map_batches(endpoints, batch_format="pyarrow")
        sub = semi_join(
            ds.select_columns([id_col, text_col]), need, id_col, "x"
        ).materialize()

        def side(out_id: str, out_t: str):
            def f(t: pa.Table) -> pa.Table:
                return pa.table({out_id: t[id_col],
                                 out_t: _string_col(t, text_col)})
            return f

        j = hash_join(
            pairs, sub.map_batches(side("a", "ta"), batch_format="pyarrow"),
            on="a", join_type="left_outer",
            num_partitions=num_partitions, portable=True,
        )
        j = hash_join(
            j, sub.map_batches(side("b", "tb"), batch_format="pyarrow"),
            on="b", join_type="left_outer",
            num_partitions=num_partitions, portable=True,
        )

        def score(t: pa.Table) -> pa.Table:
            d = [_levenshtein(x or "", y or "")
                 for x, y in zip(t["ta"].to_pylist(), t["tb"].to_pylist())]
            return pa.table({"a": t["a"], "b": t["b"],
                             "edit_dist": pa.array(d, pa.int64())})

        return j.map_batches(score, batch_format="pyarrow")

    need = sorted({i for p in pairs for i in p})
    ref = ray.put(pa.array(need, pa.int64()))

    def collect(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch[id_col], value_set=ray.get(ref))
        sub = batch.filter(m)
        return pa.table({id_col: sub[id_col], "t": _string_col(sub, text_col)})

    rows = ds.map_batches(collect, batch_format="pyarrow").take_all()
    texts = {r[id_col]: (r["t"] or "") for r in rows}

    out = []
    for a, b in pairs:
        ta, tb = texts.get(a, ""), texts.get(b, "")
        out.append({"a": a, "b": b, "edit_dist": _levenshtein(ta, tb)})
    return pa.Table.from_pylist(out) if out else pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "edit_dist": pa.array([], pa.int64())}
    )
