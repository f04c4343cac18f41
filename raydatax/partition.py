"""Salted hash partitioning on ``conv_id`` + hot-key detection.

The reference's skew story is task-list shuffling and resource-mark
round-robin (``/root/reference/core/.../container/util/JobAssignUtil.java:
41-49``, ``JobContainer.java:384``) — good enough for thread scheduling, not
for a key shuffle.  Here skew is handled explicitly (north_rule):

- cold conversations:  partition = H(conv_id) % P
- hot conversations:   partition = P + hot_index*S + H64(turn_idx) % S

Salting by ``turn_idx`` (not round-robin) keeps the LWW invariant: the same
``(conv_id, turn_idx)`` key always lands in the same salted sub-partition,
so per-key last-writer-wins stays correct (SURVEY.md §7.4).

Hot keys are detected by frequency sampling over WAL segment heads — the
same idea as Oracle's SAMPLE(x) split-point sampling in the reference
(``/root/reference/plugin-rdbms-util/.../reader/util/SingleTableSplitUtil.
java:293-388``) — and frozen into the lake config at creation so the
partition mapping stays stable for the lake's lifetime (a rebase merge
requires it).  Re-partitioning an existing lake (e.g. a conversation turning
hot later) is an offline maintenance job, not an ingest-path concern.

Hashing is ``pandas.util.hash_array`` (vectorized SipHash with a fixed key)
— deterministic across processes, nodes and runs, unlike Python's ``hash``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pandas.util import hash_array


def hash_strings(arr: np.ndarray) -> np.ndarray:
    """Deterministic uint64 hash of an object-dtype string array."""
    return hash_array(arr.astype(object, copy=False), categorize=False)


def hash_ints(arr: np.ndarray) -> np.ndarray:
    return hash_array(np.ascontiguousarray(arr, dtype=np.int64))


def assign_partitions(
    batch: pa.Table,
    partitions: int,
    salt: int,
    hot_keys: list[str],
    part_col: str = "__part",
) -> pa.Table:
    """Vectorized partition assignment; appends an int32 ``__part`` column."""
    conv = batch.column("conv_id").to_numpy(zero_copy_only=False)
    h = hash_strings(conv)
    part = (h % np.uint64(partitions)).astype(np.int64)
    if hot_keys:
        hot_index = {k: i for i, k in enumerate(hot_keys)}
        # membership test via a small dict over unique values of the batch
        uniq, inv = np.unique(conv, return_inverse=True)
        uniq_hot = np.array([hot_index.get(u, -1) for u in uniq], dtype=np.int64)
        hot_i = uniq_hot[inv]
        mask = hot_i >= 0
        if mask.any():
            turn = batch.column("turn_idx").to_numpy(zero_copy_only=False)
            salt_slot = (hash_ints(turn[mask]) % np.uint64(salt)).astype(np.int64)
            part[mask] = partitions + hot_i[mask] * salt + salt_slot
    return batch.append_column(part_col, pa.array(part.astype(np.int32)))


def detect_hot_keys(
    segment_paths: list[str],
    partitions: int,
    hot_threshold: float = 0.05,
    max_hot: int = 16,
    sample_rows_per_segment: int = 8192,
) -> list[str]:
    """Deterministic frequency sample: read the head of each segment's first
    row group, count conv_id shares; a conversation holding more than
    ``hot_threshold`` of sampled events (and more than ~4 partitions' fair
    share) is hot.  Cheap: touches one row group per segment."""
    counts: dict[str, int] = {}
    total = 0
    for p in segment_paths:
        f = pq.ParquetFile(p)
        head = next(f.iter_batches(batch_size=sample_rows_per_segment, columns=["conv_id"]))
        col = head.column(0).drop_null()  # dirty rows may carry null keys
        if len(col) == 0:
            continue
        vals, cnts = np.unique(np.asarray(col), return_counts=True)
        for v, c in zip(vals.tolist(), cnts.tolist()):
            counts[v] = counts.get(v, 0) + c
        total += len(head)
    if not total:
        return []
    # hot = holds >= hot_threshold of events AND at least ~2 partitions'
    # fair share (salting a conv below fair share would only add overhead)
    floor = max(hot_threshold, 2.0 / max(partitions, 1))
    hot = [k for k, c in counts.items() if c / total >= floor]
    hot.sort(key=lambda k: (-counts[k], k))
    return hot[:max_hot]
