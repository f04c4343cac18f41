"""File-level data-skipping indexes over immutable Parquet file sets.

The lakehouse-style secondary index (Delta/Iceberg bloom filters, ClickHouse
skip indexes): one Bloom filter + typed min/max per DATA FILE for a chosen
column, consolidated into one small index Parquet.  An equality read probes
the index on the driver (index size ∝ files, ~1.5 bytes/distinct value each)
and opens only files whose bloom admits the value — at 100 TB a point query
on a clustered column touches a handful of files instead of the full scan.

Design contract this module relies on: **data files are immutable** — the
lake's staged-then-committed files are never rewritten in place (new epochs
add new files), so a file path identifies its content forever and the index
never goes stale for covered files.  Files NOT covered by the index (added
after the last build) are always kept by the pruner — correctness never
depends on index freshness, only skip-effectiveness does — and a rebuild is
incremental: it scans only files missing from the existing index.

Complements the z-order/min-max path (``sources.plan_box``): min/max prunes
range predicates on clustered columns; blooms prune EQUALITY on
high-cardinality columns whose file ranges overlap.

Reference parity: the reference's closest surface is per-split predicate
pushdown into the source (`/root/reference/plugin-rdbms-util/.../
SingleTableSplitUtil.java:39` — WHERE on every split's SQL); this module is
the file-store analogue where there is no server to push into.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from .relational import _hll_finalize, _hll_hash

# bump when the blob layout / hash changes — probing a mismatched index
# must fail loudly, not skip wrong files (same discipline as
# partition.HASH_VERSION for the lake's partition mapping)
BLOOM_INDEX_VERSION = "bloom-v1"

_INDEX_SCHEMA = pa.schema(
    [
        ("file", pa.string()),
        ("n_rows", pa.int64()),
        ("m_bits", pa.int64()),
        ("n_hashes", pa.int64()),
        ("bloom", pa.binary()),
        ("vmin", pa.string()),
        ("vmax", pa.string()),
    ]
)


def _file_bloom(path: str, column: str, bits_per_key: int) -> dict:
    """One file's index row: distinct values -> one bitmap (file-local,
    no tree merge needed), plus stringified min/max for range pruning."""
    t = pq.read_table(path, columns=[column])
    col = t[column].combine_chunks()
    if pa.types.is_dictionary(col.type):  # hive-partition columns read back
        col = col.cast(col.type.value_type)
    distinct = pc.unique(col.drop_null())
    n = len(distinct)
    m_bits = 1 << max(10, int(np.ceil(np.log2(max(1, n) * bits_per_key))))
    n_hashes = max(1, int(round(0.693 * m_bits / max(1, n))))
    bm = np.zeros(m_bits // 8, np.uint8)
    if n:
        h1 = _hll_hash(distinct)
        h2 = _hll_finalize(h1) | np.uint64(1)
        mask = np.uint64(m_bits - 1)
        for i in range(n_hashes):
            with np.errstate(over="ignore"):
                pos = (h1 + np.uint64(i) * h2) & mask
            np.bitwise_or.at(
                bm,
                (pos >> np.uint64(3)).astype(np.int64),
                np.left_shift(1, (pos & np.uint64(7)).astype(np.int64)).astype(
                    np.uint8
                ),
            )
        vmin = str(pc.min(distinct).as_py())
        vmax = str(pc.max(distinct).as_py())
    else:
        vmin = vmax = None
    return {
        "file": path,
        "n_rows": t.num_rows,
        "m_bits": m_bits,
        "n_hashes": n_hashes,
        "bloom": bm.tobytes(),
        "vmin": vmin,
        "vmax": vmax,
    }


_file_bloom_task = ray.remote(_file_bloom)


def _index_paths(index_dir: str, column: str) -> tuple[str, str]:
    return (
        os.path.join(index_dir, f"bloom-{column}.parquet"),
        os.path.join(index_dir, f"bloom-{column}.json"),
    )


def build_bloom_index(
    files: list[str] | str,
    column: str,
    index_dir: str,
    bits_per_key: int = 12,
) -> dict:
    """Build (or incrementally extend) the per-file bloom index for
    ``column``.  ``files`` is an explicit list or a directory to glob
    recursively.  One Ray task per MISSING file (reads only the indexed
    column); rows for files already covered are reused verbatim, so a
    steady-state rebuild after an ingest costs ∝ new files.  The index
    parquet + meta JSON are staged and renamed (crash-atomic, same
    discipline as the lake manifests).  Returns build stats."""
    if isinstance(files, str):
        files = sorted(
            glob.glob(os.path.join(files, "**", "*.parquet"), recursive=True)
        )
    files = sorted(files)
    os.makedirs(index_dir, exist_ok=True)
    idx_path, meta_path = _index_paths(index_dir, column)

    existing: dict[str, dict] = {}
    if os.path.exists(idx_path) and os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("version") == BLOOM_INDEX_VERSION and meta.get("column") == column:
            old = pq.read_table(idx_path)
            live = set(files)
            for r in old.to_pylist():
                if r["file"] in live:
                    existing[r["file"]] = r

    missing = [f for f in files if f not in existing]
    built = ray.get(
        [_file_bloom_task.remote(f, column, bits_per_key) for f in missing]
    )
    rows = [existing[f] for f in files if f in existing] + built
    rows.sort(key=lambda r: r["file"])
    table = pa.Table.from_pylist(rows, schema=_INDEX_SCHEMA)
    tmp = idx_path + ".tmp"
    pq.write_table(table, tmp, compression="zstd")
    os.replace(tmp, idx_path)
    meta = {
        "version": BLOOM_INDEX_VERSION,
        "column": column,
        "bits_per_key": bits_per_key,
        "n_files": len(rows),
    }
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, sort_keys=True)
    os.replace(tmp, meta_path)
    return {"files_indexed": len(rows), "files_built": len(built),
            "files_reused": len(existing)}


def prune_files(
    files: list[str],
    column: str,
    value,
    index_dir: str,
) -> tuple[list[str], list[str]]:
    """Split ``files`` into (kept, skipped) for an equality predicate
    ``column == value``.  Probing is driver-local over the tiny index
    table; files without an index row are ALWAYS kept (freshness never
    affects correctness).  A missing or version-mismatched index keeps
    everything (and the caller's exact filter still applies)."""
    idx_path, meta_path = _index_paths(index_dir, column)
    if not (os.path.exists(idx_path) and os.path.exists(meta_path)):
        return list(files), []
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("version") != BLOOM_INDEX_VERSION or meta.get("column") != column:
        raise RuntimeError(
            f"bloom index at {idx_path} is {meta.get('version')!r} for column "
            f"{meta.get('column')!r} — rebuild with build_bloom_index({column!r})"
        )
    idx = {r["file"]: r for r in pq.read_table(idx_path).to_pylist()}
    probe = _hll_hash(pa.array([value]))
    h2 = _hll_finalize(probe) | np.uint64(1)
    kept, skipped = [], []
    for f in files:
        r = idx.get(f)
        if r is None:
            kept.append(f)
            continue
        if r["vmin"] is None:  # all-null file: no value can match
            skipped.append(f)
            continue
        bm = np.frombuffer(r["bloom"], np.uint8)
        mask = np.uint64(r["m_bits"] - 1)
        hit = True
        for i in range(r["n_hashes"]):
            with np.errstate(over="ignore"):
                pos = int((probe[0] + np.uint64(i) * h2[0]) & mask)
            if not (bm[pos >> 3] >> (pos & 7)) & 1:
                hit = False
                break
        (kept if hit else skipped).append(f)
    return kept, skipped


def read_files_eq(
    files: list[str] | str,
    column: str,
    value,
    index_dir: str,
    columns: list[str] | None = None,
) -> "ray.data.Dataset":
    """Equality scan with bloom skipping: prune the file list through the
    index, then an EXACT pyarrow filter removes bloom false positives —
    the result is identical to the unindexed scan, only the I/O changes.
    Returns an empty (correctly typed) Dataset when every file is skipped.
    """
    import ray.data

    if isinstance(files, str):
        files = sorted(
            glob.glob(os.path.join(files, "**", "*.parquet"), recursive=True)
        )
    kept, _skipped = prune_files(sorted(files), column, value, index_dir)
    read_cols = columns
    if columns is not None and column not in columns:
        read_cols = list(columns) + [column]
    if not kept:
        schema = pq.read_schema(sorted(files)[0])
        if read_cols is not None:
            schema = pa.schema([schema.field(c) for c in read_cols])
        ds = ray.data.from_arrow(schema.empty_table())
    else:
        ds = ray.data.read_parquet(
            kept,
            columns=read_cols,
            filter=pc.field(column) == value,
        )
    if columns is not None and column not in columns:
        ds = ds.select_columns(list(columns))
    return ds


def index_lake_column(lake_dir: str, column: str, bits_per_key: int = 12) -> dict:
    """Bloom-index a committed lake column (all current epochs' files).
    Incremental by construction: files committed since the last build are
    the only ones scanned."""
    from . import manifest as mf

    files = mf.committed_files(lake_dir)
    return build_bloom_index(
        files, column, os.path.join(lake_dir, "_skip"), bits_per_key
    )


def read_lake_eq(
    lake_dir: str,
    column: str,
    value,
    columns: list[str] | None = None,
) -> "ray.data.Dataset":
    """Point/equality read over a lake using its bloom skip index (built
    via :func:`index_lake_column`).  Files committed after the last index
    build are scanned unpruned — exactness is unconditional."""
    from . import manifest as mf

    files = mf.committed_files(lake_dir)
    if not files:
        raise FileNotFoundError(f"no committed partitions under {lake_dir}")
    return read_files_eq(
        files, column, value, os.path.join(lake_dir, "_skip"), columns
    )
