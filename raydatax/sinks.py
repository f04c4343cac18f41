"""Sink surface: file writers with DataX writeMode parity.

Reference semantics (SURVEY.md §2.4):

- **txtfilewriter / hdfswriter writeMode** ``truncate | append | nonConflict``
  (``/root/reference/txtfilewriter/.../TxtFileWriter.java:94-192``;
  ``hdfswriter/.../HdfsWriter.java:149-187``): truncate clears the target
  dir, append adds new files under a unique prefix, nonConflict errors if
  anything is already there.
- The exactly-once **two-phase** lake sink (staging + manifest) lives in
  ``manifest.py``/``merge.py`` — this module is the simpler file-drop
  surface for CSV/JSON/Parquet exports.
"""

from __future__ import annotations

import glob
import os
import shutil


class WriteModeError(RuntimeError):
    pass


def _prepare_dir(path: str, write_mode: str) -> None:
    os.makedirs(path, exist_ok=True)
    existing = [p for p in glob.glob(os.path.join(path, "*")) if not p.endswith(".tmp")]
    if write_mode == "truncate":
        for p in existing:
            if os.path.isdir(p):
                shutil.rmtree(p)
            else:
                os.remove(p)
    elif write_mode == "nonConflict":
        if existing:
            raise WriteModeError(
                f"nonConflict: target {path} already contains {len(existing)} entries"
            )
    elif write_mode != "append":
        raise ValueError(f"unknown writeMode {write_mode!r}")


def write_wal_sink(
    ds,
    wal_dir: str,
    seg_rows: int = 250_000,
    start_segment: int | None = None,
) -> list[str]:
    """Event-log sink (the kafkawriter/datahubwriter analogue,
    ``/root/reference/kafkawriter/.../KafkaWriter.java:120-141``): append a
    Dataset of EVENT_SCHEMA rows to a WAL directory as ordered segment
    files, continuing the existing numbering — the produced log is a valid
    input for another raydatax ingest job (pipeline chaining).

    Segments are written through the driver (``iter_batches``) because
    segment NUMBERING is a global order — acceptable because a WAL producer
    is sequential by definition; the consumer side is what scales."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(wal_dir, exist_ok=True)
    if start_segment is None:
        existing = sorted(_glob.glob(os.path.join(wal_dir, "seg-*.parquet")))
        start_segment = (
            int(os.path.basename(existing[-1])[4:9]) + 1 if existing else 0
        )
    paths: list[str] = []
    buf: list[pa.Table] = []
    buffered = 0
    k = start_segment

    def flush():
        nonlocal buf, buffered, k
        if not buffered:
            return
        seg = pa.concat_tables(buf, promote_options="permissive")
        path = os.path.join(wal_dir, f"seg-{k:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(seg, tmp, compression="zstd",
                       row_group_size=min(seg_rows, 65536))
        os.replace(tmp, path)
        paths.append(path)
        buf, buffered = [], 0
        k += 1

    for batch in ds.iter_batches(batch_size=seg_rows, batch_format="pyarrow"):
        buf.append(batch)
        buffered += batch.num_rows
        if buffered >= seg_rows:
            flush()
    flush()
    return paths


def write_partitioned(
    ds,
    path: str,
    partition_cols: list[str],
    write_mode: str = "truncate",
    **kwargs,
) -> str:
    """Hive-partitioned parquet sink (one ``key=value`` directory per
    partition value — the odps/hive partitioned-table surface,
    ``/root/reference/odpswriter/.../OdpsWriter.java`` partition handling,
    and the resumable-output layout the 100-TB guidelines require: a failed
    run can skip finished partitions and a reader prunes directories).
    Returns the output dir."""
    _prepare_dir(path, write_mode)
    ds.write_parquet(path, partition_cols=list(partition_cols), **kwargs)
    return path


def read_partitioned(path: str, filters: dict | None = None, columns=None):
    """Read a hive-partitioned dataset with DIRECTORY-level pruning: only
    partitions matching ``filters`` (col -> value) are even listed, the
    read-side analogue of odpsreader's partition list."""
    import ray.data as rd
    from ray.data.datasource.partitioning import Partitioning, PathPartitionFilter

    kwargs = {}
    if filters:
        def keep(part: dict) -> bool:
            return all(part.get(k) == str(v) for k, v in filters.items())

        kwargs["partition_filter"] = PathPartitionFilter.of(
            keep, style="hive"
        )
    if columns:
        kwargs["columns"] = list(columns)
    return rd.read_parquet(path, **kwargs)


def write_files(
    ds,
    path: str,
    fmt: str = "parquet",
    write_mode: str = "append",
    **kwargs,
) -> str:
    """Write a Dataset to a directory of files with DataX writeMode
    semantics.  Returns the output dir."""
    _prepare_dir(path, write_mode)
    if fmt == "parquet":
        ds.write_parquet(path, **kwargs)
    elif fmt == "csv":
        ds.write_csv(path, **kwargs)
    elif fmt == "json":
        ds.write_json(path, **kwargs)
    else:
        raise ValueError(f"unknown format {fmt!r}")
    return path
