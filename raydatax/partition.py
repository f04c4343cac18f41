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

Hashing is a 64-bit polynomial over the raw Arrow UTF-8 buffer with a
splitmix finalizer (:func:`raydatax.text.poly_hash_array`) — deterministic
across processes, nodes and runs (unlike Python's ``hash``), and computed
WITHOUT materializing per-row Python strings: the object-array conversion
the previous pandas ``hash_array`` path required was the map stage's
single largest cost at bench scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# Version tag of the key→partition hash function.  The mapping is lake-level
# state (rebase merge, byte-identical resume and lookup pruning all depend on
# every ingest of a lake agreeing on it), so the tag is persisted in
# ``_lake.json`` at creation and validated on every subsequent ingest/lookup:
# changing the hash below REQUIRES bumping this string, and old lakes must be
# migrated via ``driver.repartition_lake`` (which re-buckets by full export,
# never by hash pruning).  v1 was pandas SipHash (round 1); v2 is the
# buffer-level polynomial + splitmix finalizer below.
HASH_VERSION = "poly-splitmix-v2"

_MIX = np.uint64(0xFF51AFD7ED558CCD)


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix-style avalanche so `% P` sees uniform low bits."""
    with np.errstate(over="ignore"):
        h = (h ^ (h >> np.uint64(33))) * _MIX
        h ^= h >> np.uint64(33)
    return h


def hash_string_column(col: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Deterministic uint64 hash of an Arrow string column, zero Python
    objects on the path."""
    from .text import poly_hash_array

    return _mix64(poly_hash_array(col))


def hash_strings(arr: np.ndarray) -> np.ndarray:
    """Deterministic uint64 hash of an object/str numpy array (point
    lookups and tests; the batch path uses :func:`hash_string_column`)."""
    return hash_string_column(pa.array(arr.astype(object, copy=False), type=pa.string()))


def hash_ints(arr: np.ndarray) -> np.ndarray:
    return _mix64(np.ascontiguousarray(arr, dtype=np.int64).view(np.uint64).copy())


def assign_partitions(
    batch: pa.Table,
    partitions: int,
    salt: int,
    hot_keys: list[str],
    part_col: str = "__part",
) -> pa.Table:
    """Vectorized partition assignment; appends an int32 ``__part`` column."""
    conv_col = batch.column("conv_id")
    h = hash_string_column(conv_col)
    part = (h % np.uint64(partitions)).astype(np.int64)
    if hot_keys:
        # membership via Arrow's hash join kernel — no object conversion
        hot_i_arr = pc.fill_null(
            pc.index_in(conv_col, value_set=pa.array(hot_keys, pa.string())), -1
        )
        hot_i = hot_i_arr.to_numpy(zero_copy_only=False).astype(np.int64)
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
