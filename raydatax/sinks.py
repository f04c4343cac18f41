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


def _nest_columns(t, doc_paths):
    """Assemble flat columns into nested struct columns, bottom-up.

    ``doc_paths``: ordered ``(dotted_path, source_column)`` — the exact
    inverse of the reader's extraction contract (``sources.read_jsonl``),
    so ``write_jsonl`` → ``read_jsonl`` round-trips.  Struct assembly is
    ``pa.StructArray.from_arrays`` — zero-copy wrapping of the existing
    Arrow buffers, no per-row work."""
    import pyarrow as pa

    def build(entries):
        # entries: list of (remaining_segments, source_col); group by head
        order, groups = [], {}
        for segs, src in entries:
            head = segs[0]
            if head not in groups:
                groups[head] = []
                order.append(head)
            groups[head].append((segs[1:], src))
        out = {}
        for head in order:
            sub = groups[head]
            leaves = [s for s in sub if not s[0]]
            if leaves and len(sub) > 1:
                raise ValueError(
                    f"path {head!r} is both a leaf and a sub-document prefix"
                )
            if leaves:
                out[head] = t[leaves[0][1]].combine_chunks()
            else:
                children = build(sub)
                out[head] = pa.StructArray.from_arrays(
                    list(children.values()), names=list(children.keys())
                )
        return out

    cols = build([(path.split("."), src) for path, src in doc_paths])
    return pa.table(cols)


def write_jsonl(
    ds,
    path: str,
    doc_paths: list[tuple[str, str]] | None = None,
    write_mode: str = "truncate",
) -> str:
    """Document-store sink — the mongodbwriter analogue (bulk upserts of
    nested documents, ``/root/reference/mongodbwriter/``; also the shape
    elasticsearchwriter bulk-indexes): flat columns reassembled into
    arbitrarily nested sub-documents per ``doc_paths`` (the inverse of
    ``sources.read_jsonl(doc_paths=)``), written as JSON-lines by every
    write task in parallel.  Returns the output dir."""
    _prepare_dir(path, write_mode)
    if doc_paths:
        import pyarrow as pa  # noqa: F401  (used via _nest_columns)

        ds = ds.map_batches(
            lambda t: _nest_columns(t, doc_paths), batch_format="pyarrow"
        )
    ds.write_json(path)
    return path


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


def write_sorted(
    ds,
    path: str,
    key: str,
    write_mode: str = "truncate",
) -> dict:
    """Globally ORDER-BY-``key`` export: ONE range sort, then each sorted
    block writes its own ``part-{i:05d}.parquet`` (worker-side write, no
    driver data), and a ``_sorted.json`` manifest records the per-file
    key ranges — file order IS global order, so a reader streams the
    corpus in key order (time-ordered training shards, merge-joinable
    extracts) and can binary-search the manifest for a key range instead
    of scanning.  Deterministic names ⇒ an interrupted export re-runs
    idempotently; the manifest, written last, is the commit marker.
    Returns the manifest dict."""
    import json

    import ray

    import pyarrow.parquet as _pq

    from .merge import PARQUET_OPTS

    _prepare_dir(path, write_mode)

    @ray.remote
    def _write_block(t, i: int) -> dict | None:
        if t.num_rows == 0 or key not in t.column_names:
            return None  # sorts can emit empty zero-schema blocks
        t = t.sort_by([(key, "ascending")])
        f = os.path.join(path, f"part-{i:05d}.parquet")
        tmp = f + ".tmp"
        _pq.write_table(t.replace_schema_metadata(None), tmp, **PARQUET_OPTS)
        os.replace(tmp, f)
        return {"file": os.path.basename(f), "rows": t.num_rows,
                "min": t[key][0].as_py(), "max": t[key][-1].as_py()}

    refs = ds.sort(key).to_arrow_refs()
    entries = [e for e in ray.get([_write_block.remote(r, i)
                                   for i, r in enumerate(refs)]) if e]
    for a, b in zip(entries, entries[1:]):
        if b["min"] < a["max"]:
            raise AssertionError(
                f"write_sorted: overlapping block ranges {a} / {b}"
            )
    manifest = {"key": key, "files": entries,
                "rows": sum(e["rows"] for e in entries)}
    tmp = os.path.join(path, "_sorted.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, os.path.join(path, "_sorted.json"))
    return manifest


def read_sorted(path: str, key_range: tuple | None = None, columns=None):
    """Read a :func:`write_sorted` export in global key order; with
    ``key_range=(lo, hi)`` only the files whose recorded [min, max]
    intersects the half-open range [lo, hi) are even listed — manifest
    pruning, no footer reads.

    Global order is this function's CONTRACT, but Ray's streaming
    executor only preserves block order when ``preserve_order`` is set —
    under load it otherwise emits whichever block finishes first (seen
    once under a saturated host: a consumer observed interleaved key
    ranges).  The dataset executes lazily AFTER this returns, so the
    flag must be set on the session context and left on; it disables an
    out-of-order-completion optimization for other datasets, never their
    semantics."""
    import json

    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().execution_options.preserve_order = True
    with open(os.path.join(path, "_sorted.json")) as fh:
        manifest = json.load(fh)
    files = manifest["files"]
    if key_range is not None:
        lo, hi = key_range
        files = [e for e in files if e["max"] >= lo and e["min"] < hi]
    if not files:
        raise FileNotFoundError(f"no files in range under {path}")
    return rd.read_parquet([os.path.join(path, e["file"]) for e in files],
                           columns=columns)


# --------------------------------------------------------------- bulk writer


class BulkWriter:
    """Actor-pool bulk sink with the RDBMS/HTTP writer family's buffered
    at-least-once semantics (clickhouse/adbpg/ocs/bk writers; the shared
    contract lives in `/root/reference/plugin-rdbms-util/.../writer/
    CommonRdbmsWriter.java:283-317` — flush on batchSize/batchByteSize —
    and `:360-428` — a failed batch is replayed ROW AT A TIME so one bad
    record dirties itself, never the batch):

    - ``backend_factory()`` runs once per actor (the connection / client,
      like the per-task JDBC conn at `CommonRdbmsReader.java:188`); it
      returns a callable ``flush(pa.Table) -> None`` that raises on
      failure.  The backend must tolerate replays (at-least-once).
    - every incoming Arrow batch is sliced to ``batch_rows`` /
      ``batch_bytes`` caps and flushed; transient flush errors retry with
      exponential backoff (`RetryUtil.java:25-44`);
    - a chunk that still fails is replayed row-by-row: rows that fail
      alone come back as dirty (with the error reason), the rest land;
    - ``__call__`` emits one report row per chunk (rows_written, dirty,
      reason sample) — sum downstream and assert the job's dirty budget
      like ``ErrorRecordChecker.java:18-82``.

    Use via :func:`write_bulk`.  There is deliberately NO cross-call
    buffer: ``map_batches`` actors have no flush-on-close hook, so a
    trailing buffer would be dropped on actor exit — each call flushes
    everything it received (caps SUBDIVIDE a batch, they never hold rows
    back)."""

    def __init__(self, backend_factory, batch_rows: int = 4096,
                 batch_bytes: int = 4 << 20, retries: int = 3,
                 base_sleep_s: float = 0.05, retryable=None):
        self.flush = backend_factory()
        self.batch_rows = batch_rows
        self.batch_bytes = batch_bytes
        self.retries = retries
        self.base_sleep_s = base_sleep_s
        # only TRANSIENT errors earn backoff retries; a deterministic
        # rejection (bad data) re-raised immediately means a poisoned
        # chunk's good rows are bulk-written at most once before the
        # row-level replay — bounding duplicates at 2x per good row on
        # non-transactional backends (retrying the whole chunk N times
        # multiplied them N+2x).  Mirrors the reference's split between
        # RetryUtil (transient) and the one-shot row fallback
        # (CommonRdbmsWriter.java:360-428).
        self.retryable = retryable if retryable is not None else (
            lambda e: isinstance(e, (ConnectionError, TimeoutError, OSError))
        )

    def _flush_retry(self, chunk) -> None:
        import time as _time

        for attempt in range(self.retries + 1):
            try:
                self.flush(chunk)
                return
            except Exception as e:
                if attempt == self.retries or not self.retryable(e):
                    raise
                _time.sleep(self.base_sleep_s * (2 ** attempt))

    def __call__(self, t):
        import pyarrow as pa

        reports = []
        pos = 0
        while pos < t.num_rows:
            n = min(self.batch_rows, t.num_rows - pos)
            chunk = t.slice(pos, n)
            # byte cap: halve until under (slice is zero-copy, nbytes is
            # metadata arithmetic — no row materializes on the driver side)
            while n > 1 and chunk.nbytes > self.batch_bytes:
                n = max(1, n // 2)
                chunk = t.slice(pos, n)
            pos += n
            written = dirty = 0
            reason = None
            try:
                self._flush_retry(chunk)
                written = n
            except Exception:
                # batch poisoned: isolate row by row (rollback analogue)
                for i in range(n):
                    row = chunk.slice(i, 1)
                    try:
                        self._flush_retry(row)
                        written += 1
                    except Exception as re:
                        dirty += 1
                        if reason is None:
                            reason = f"{type(re).__name__}: {re}"[:200]
            reports.append((written, dirty, 1, reason))
        return pa.table({
            "rows_written": pa.array([r[0] for r in reports], pa.int64()),
            "rows_dirty": pa.array([r[1] for r in reports], pa.int64()),
            "flushes": pa.array([r[2] for r in reports], pa.int64()),
            "dirty_reason": pa.array([r[3] for r in reports], pa.string()),
        })


def write_bulk(ds, backend_factory, concurrency: int = 4,
               error_limit_records: int | None = None, **writer_kw) -> dict:
    """Drive :class:`BulkWriter` over a Dataset and fold the per-chunk
    reports into one job summary; raises if dirty rows exceed
    ``error_limit_records`` (post-run check, `ErrorRecordChecker.java`)."""
    rep = ds.map_batches(
        BulkWriter,
        fn_constructor_kwargs={"backend_factory": backend_factory, **writer_kw},
        concurrency=concurrency,
        batch_format="pyarrow",
    )
    written = dirty = flushes = 0
    reasons: list[str] = []
    for b in rep.iter_batches(batch_format="pyarrow"):
        written += sum(b["rows_written"].to_pylist())
        dirty += sum(b["rows_dirty"].to_pylist())
        flushes += sum(b["flushes"].to_pylist())
        reasons += [r for r in b["dirty_reason"].to_pylist() if r][:3]
    out = {"rows_written": written, "rows_dirty": dirty,
           "flushes": flushes, "dirty_reasons": reasons[:3]}
    if error_limit_records is not None and dirty > error_limit_records:
        raise RuntimeError(
            f"write_bulk: {dirty} dirty rows exceed the "
            f"error limit {error_limit_records}: {reasons[:3]}"
        )
    return out
