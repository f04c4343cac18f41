"""Source surface: file readers with DataX unstructured-storage parity + the
synthetic stream source.

Reference semantics covered (SURVEY.md §2.3):

- **CSV/text parse core** (``/root/reference/plugin-unstructured-storage-util/
  .../reader/UnstructuredStorageReaderUtil.java:103-251, 373-551``): per-file
  split, delimiter, encoding, skipHeader, ``nullFormat``, compression, and the
  ordered ``column`` list of ``{index|value, type, format}`` entries —
  projection + reorder by index, constant-value injection, typed casts with
  date formats.  Here: ``ray.data.read_csv`` (per-file splits are built in)
  + one vectorized ``map_batches`` applying the column spec.
- **txtfilereader / hdfsreader / ossreader / ftpreader**: one task per file —
  Ray Data's file-based datasources already split per file/block.
- **streamreader** synthetic source (``/root/reference/streamreader/.../
  StreamReader.java:95-166,174-181``): N parallel slices each generating
  ``sliceRecordCount`` deterministic records — here a ``ray.data.range``
  over shards with the seeded generator in ``map_batches``, so generation
  itself is distributed and deterministic per (seed, shard).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


@dataclass
class ColumnEntry:
    """One entry of the DataX reader `column` list: either a source column
    by ``index`` or a constant ``value``; `type` in long|double|string|
    boolean|date; `format` = strptime format for date parsing."""

    index: int | None = None
    value: str | None = None
    type: str = "string"
    format: str | None = None
    name: str | None = None


_ARROW_TYPES = {
    "long": pa.int64(),
    "double": pa.float64(),
    "string": pa.string(),
    "boolean": pa.bool_(),
    "date": pa.timestamp("us"),
    "bytes": pa.binary(),
}


def apply_column_spec(batch: pa.Table, spec: list[ColumnEntry]) -> pa.Table:
    """Vectorized projection / reorder / const-injection / typed cast — the
    engine form of UnstructuredStorageReaderUtil.transportOneRecord
    (:373-551), minus the per-record loop."""
    n = batch.num_rows
    cols, names = [], []
    for i, entry in enumerate(spec):
        name = entry.name or f"col{i}"
        target = _ARROW_TYPES[entry.type]
        if entry.value is not None:  # constant column
            if entry.type == "date" and entry.format:
                import datetime as _dt

                v = _dt.datetime.strptime(entry.value, entry.format)
                arr = pa.array([v] * n, type=target)
            else:
                arr = pa.array([entry.value] * n).cast(target)
        else:
            src = batch.column(entry.index)
            if entry.type == "date" and entry.format:
                arr = pc.strptime(pc.cast(src, pa.string()), format=entry.format, unit="us")
            elif entry.type == "boolean" and pa.types.is_string(src.type):
                arr = pc.equal(pc.utf8_lower(src), "true")
            else:
                arr = pc.cast(src, target)
        cols.append(arr)
        names.append(name)
    return pa.Table.from_arrays(cols, names=names)


# Extensions handled by the whole-file decompress path (per-file read task —
# none of these formats block-split anyway).  gzip ALSO works through the
# plain read_csv path (Arrow auto-detects it); the rest mirror the
# reference's compress knob (UnstructuredStorageReaderUtil.java:103-251:
# gzip, bzip2, zip, lzo, lzo_deflate, hadoop-snappy, framing-snappy).
_WHOLE_FILE_CODEC_EXTS = (
    ".bz2", ".zip", ".xz", ".lzma", ".zst", ".snappy", ".lzo", ".lzo_deflate",
)


def decompress_file_bytes(name: str, data: bytes) -> bytes:
    """Decompress one file's bytes, detecting the codec by MAGIC BYTES (the
    Arrow filesystem layer already auto-decompresses the codecs it knows —
    gzip/bz2/zstd — so extension alone would double-decompress; sniffing
    handles both raw and pre-decompressed inputs).  Snappy comes in two
    decodable flavors — the framed stream format (sNaPpY magic) and raw
    blocks (varint size preamble, what ``pa.compress`` emits) — both via
    Arrow's bundled snappy codec.  LZO comes in two container flavors —
    lzop files (magic-sniffed) and Hadoop LzoCodec raw blocks (the
    reference's ``compress: lzo_deflate``, extension-routed) — both via
    the pure-Python LZO1X codec in :mod:`raydatax.lzo`.  Hadoop's
    magic-less block-snappy is not decodable here — it raises a
    clearly-marked NotImplementedError instead of guessing."""
    if data[:10] == b"\xff\x06\x00\x00sNaPpY":
        return _snappy_framed(data)
    if name.lower().endswith(".snappy"):
        try:
            return _snappy_raw(data)
        except Exception as e:
            raise NotImplementedError(
                "this .snappy file is not raw-block or framed snappy "
                "(hadoop block-snappy?); re-encode as framed snappy, "
                "gzip, bzip2, zstd, xz or zip"
            ) from e
    from raydatax.lzo import LZOP_MAGIC, lzo_deflate_decompress_bytes, lzop_decompress_bytes

    if data[: len(LZOP_MAGIC)] == LZOP_MAGIC:
        return lzop_decompress_bytes(data)
    if name.lower().endswith((".lzo", ".lzo_deflate")):
        return lzo_deflate_decompress_bytes(data)
    if data[:4] == b"PK\x03\x04":
        return b"".join(_zip_members(data))
    if data[:6] == b"\xfd7zXZ\x00" or data[:3] == b"\x5d\x00\x00":
        import lzma

        return lzma.decompress(data)
    if data[:3] == b"BZh":
        import bz2

        return bz2.decompress(data)
    if data[:2] == b"\x1f\x8b":
        import gzip

        return gzip.decompress(data)
    if data[:4] == b"\x28\xb5\x2f\xfd":
        return pa.input_stream(pa.BufferReader(data), compression="zstd").read()
    return data


def _read_raw_file_bytes(path: str) -> bytes:
    """One file's bytes through pyarrow.fs WITHOUT compression inference
    (compression=None): codec handling is magic-byte sniffing in
    :func:`decompress_file_bytes`, which also copes with pre-decompressed
    input — suffix-based inference would double-decompress or, for
    .snappy, demand the absent python-snappy package."""
    from pyarrow import fs as pafs

    try:
        fsys, rel = pafs.FileSystem.from_uri(path)
    except (ValueError, pa.ArrowInvalid):
        fsys, rel = pafs.LocalFileSystem(), path
    with fsys.open_input_stream(rel, compression=None) as f:
        return f.read()


def _snappy_raw(data: bytes) -> bytes:
    """One raw snappy block: the uncompressed length rides in front as a
    varint (the snappy block format's preamble), which Arrow's codec needs
    passed explicitly."""
    size, shift, i = 0, 0, 0
    while True:
        b = data[i]
        size |= (b & 0x7F) << shift
        i += 1
        shift += 7
        if not b & 0x80:
            break
    return bytes(pa.decompress(data, decompressed_size=size, codec="snappy"))


def _snappy_framed(data: bytes) -> bytes:
    """Snappy framing format: a stream of [type, 3-byte LE length, payload]
    chunks after the sNaPpY identifier; compressed (0x00) and uncompressed
    (0x01) chunks carry a 4-byte CRC we skip (whole-file reads re-verify
    via parse), reserved-skippable chunks are skipped per spec."""
    out = []
    i = 0
    while i + 4 <= len(data):
        typ = data[i]
        ln = int.from_bytes(data[i + 1:i + 4], "little")
        chunk = data[i + 4:i + 4 + ln]
        i += 4 + ln
        if typ == 0x00:
            out.append(_snappy_raw(chunk[4:]))
        elif typ == 0x01:
            out.append(bytes(chunk[4:]))
        # 0xff stream identifier / 0x02-0xfd reserved-unskippable would
        # fail parse anyway / 0xfe padding: all skipped
    return b"".join(out)


def _zip_members(data: bytes) -> list[bytes]:
    import io
    import zipfile

    with zipfile.ZipFile(io.BytesIO(data)) as z:
        return [z.read(n) for n in sorted(z.namelist())]


def _file_payloads(name: str, data: bytes) -> list[bytes]:
    """One CSV payload per logical file: a zip archive yields one payload
    PER MEMBER (each parsed separately, so skipHeader applies to every
    member's own header, not just the first); everything else yields its
    decompressed bytes."""
    if data[:4] == b"PK\x03\x04":
        return _zip_members(data)
    return [decompress_file_bytes(name, data)]


def read_csv_datax(
    paths: str | list[str],
    column_spec: list[ColumnEntry] | None = None,
    delimiter: str = ",",
    skip_header: bool = False,
    null_format: str | None = None,
    encoding: str = "utf8",
) -> "rd.Dataset":
    """CSV source with the reference's reader knobs.  Plain and gzip files
    go through Ray's block-splitting CSV datasource; bz2/zip/xz/zstd files
    decompress whole-file inside the read task (one task per file — the
    txtfilereader split unit) and parse with the same Arrow CSV options.
    Mixed path lists are split so the block-splittable files keep their
    parallel reads, then unioned."""
    from pyarrow import csv as pacsv

    read_opts = pacsv.ReadOptions(encoding=encoding, autogenerate_column_names=not skip_header)
    parse_opts = pacsv.ParseOptions(delimiter=delimiter, newlines_in_values=True)
    convert_opts = pacsv.ConvertOptions(
        null_values=[null_format] if null_format is not None else [""],
        strings_can_be_null=null_format is not None,
    )
    path_list = [paths] if isinstance(paths, str) else list(paths)
    whole = [p for p in path_list if p.lower().endswith(_WHOLE_FILE_CODEC_EXTS)]
    plain = [p for p in path_list if not p.lower().endswith(_WHOLE_FILE_CODEC_EXTS)]

    parts = []
    if plain:
        parts.append(
            rd.read_csv(
                plain,
                read_options=read_opts,
                parse_options=parse_opts,
                convert_options=convert_opts,
            )
        )
    if whole:
        def parse_files(batch: pa.Table) -> pa.Table:
            # bytes are read HERE, inside the task (not via
            # read_binary_files: Ray's file datasource detects ".snappy"
            # by suffix and hard-imports python-snappy, absent in this
            # container; compression=None keeps the bytes raw for our
            # magic-byte sniffing)
            tabs = []
            for path in batch.column("path").to_pylist():
                data = _read_raw_file_bytes(path)
                for raw in _file_payloads(path, data):
                    tabs.append(
                        pacsv.read_csv(
                            pa.BufferReader(raw),
                            read_options=read_opts,
                            parse_options=parse_opts,
                            convert_options=convert_opts,
                        )
                    )
            return pa.concat_tables(tabs, promote_options="permissive")

        parts.append(
            rd.from_items([{"path": p} for p in whole]).map_batches(
                parse_files, batch_format="pyarrow", batch_size=1
            )
        )
    ds = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    if column_spec:
        ds = ds.map_batches(
            lambda t: apply_column_spec(t, column_spec), batch_format="pyarrow"
        )
    return ds


def read_jsonl(
    paths: str | list[str],
    doc_paths: list[tuple[str, str]] | None = None,
) -> "rd.Dataset":
    """JSON-lines source (per-file splits built in) — the runnable analogue
    of the document-store reader family (mongodbreader over a mongoexport
    dump, elasticsearch scroll dumps).

    ``doc_paths``: ordered list of ``(dotted_path, out_name)`` — the
    mongodbreader nested-document column contract
    (``/root/reference/mongodbreader/.../MongoDBReader.java:125-170``):
    ``"a.b.c"`` walks sub-documents; a missing path yields a NULL column
    entry, never a skipped/misaligned record (the reference comments on
    exactly that bug).  Extraction is vectorized ``pc.struct_field`` over
    the parsed Arrow structs — no per-row JSON handling."""
    ds = rd.read_json(paths)
    if not doc_paths:
        return ds

    def extract(t: pa.Table) -> pa.Table:
        cols = {}
        for path, name in doc_paths:
            head, *rest = path.split(".")
            try:
                arr = t[head]
                if rest:
                    arr = pc.struct_field(arr, rest)
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
            except (KeyError, pa.ArrowInvalid, pa.ArrowTypeError):
                # null-typed (not string-typed) so a batch/file where the
                # path is entirely absent still unifies with typed batches
                # from files that do carry it (null promotes to any type)
                arr = pa.nulls(t.num_rows, pa.null())
            cols[name] = arr
        return pa.table(cols)

    return ds.map_batches(extract, batch_format="pyarrow")


def synthetic_stream(
    total_records: int,
    seed: int = 42,
    shards: int = 8,
) -> "rd.Dataset":
    """The streamreader analogue: `shards` parallel slices, each generating
    its deterministic share of a transcript CDC log (seeded per shard,
    disjoint seq ranges) — generation runs ON the cluster, not the driver."""
    per_shard = max(1, total_records // shards)

    def gen_shard(batch: pa.Table) -> pa.Table:
        from .gen import gen_events

        out = []
        for shard_id in batch.column("id").to_pylist():
            out.append(
                gen_events(
                    per_shard,
                    seed=seed + shard_id,
                    start_seq=shard_id * per_shard * 2,
                )
            )
        return pa.concat_tables(out) if out else None

    return rd.range(shards).map_batches(
        gen_shard, batch_format="pyarrow", batch_size=1
    )


# ------------------------------------------------------- rowkey-range reader


def plan_key_ranges(
    paths: list[str],
    key_col: str,
    ranges: list[tuple],
) -> tuple[list[tuple[str, list[int]]], int]:
    """Row-group-granular scan plan for a UNION of rowkey ranges
    ``[(start, stop), ...]`` (each end may be None = open) — the
    hbase11xreader region/rowkey-range split model
    (``/root/reference/hbase11xreader/.../Hbase11xHelper.java:290-330``
    splits the scan into per-region rowkey ranges; a parquet row group
    with footer min/max stats is our region analogue), generalized to the
    Phoenix SKIP-SCAN shape: several disjoint key ranges served by one
    scan, each row group opened at most once.  Only footers are read on
    the driver; a row group whose key stats cannot overlap ANY range is
    never opened.  Returns ``([(path, [rg, ...]), ...], pruned)``.
    Works for integer and string rowkeys (parquet keeps typed stats for
    both); missing stats keep the group (prune conservatively)."""
    import pyarrow.parquet as pq

    plans, pruned = [], 0
    for p in paths:
        md = pq.read_metadata(p)
        # row_group().column() takes the parquet LEAF index, which diverges
        # from the Arrow field index whenever a nested column precedes the
        # key — resolve by leaf path, not position
        idx = next(
            (i for i in range(md.num_columns)
             if md.schema.column(i).path == key_col),
            -1,
        )
        if idx < 0:
            raise KeyError(f"{key_col!r} not a primitive leaf column in {p}")
        keep = []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                overlaps = any(
                    (start is None or st.max >= start)
                    and (stop is None or st.min < stop)
                    for start, stop in ranges
                )
                if not overlaps:
                    pruned += 1
                    continue
            keep.append(rg)
        if keep:
            plans.append((p, keep))
    return plans, pruned


def plan_key_range(
    paths: list[str],
    key_col: str,
    start=None,
    stop=None,
) -> tuple[list[tuple[str, list[int]]], int]:
    """Single-range form of :func:`plan_key_ranges`."""
    return plan_key_ranges(paths, key_col, [(start, stop)])


def read_key_ranges(
    paths: str | list[str],
    key_col: str,
    ranges: list[tuple],
    columns: list[str] | None = None,
    mode: str = "multiVersion",
    version_col: str = "seq",
) -> "rd.Dataset":
    """KV rowkey SKIP SCAN — several disjoint rowkey ranges served by one
    scan, the Phoenix-over-HBase access pattern (a Phoenix query with
    ``WHERE pk IN (...)`` / OR'd ranges compiles to one skip scan instead
    of N scans).  ``mode`` mirrors the reference hbase readers' two output
    modes (``Hbase11xReader`` mode switch): ``multiVersion`` yields EVERY
    stored version of each row (one record per cell-version); ``normal``
    collapses to the latest version per rowkey by ``version_col`` (LWW).
    Planning prunes parquet row groups by footer key stats against the
    range UNION (each group opened at most once); the exact OR-of-ranges
    predicate is applied in-task."""
    import glob as _glob
    import os as _os

    from ray.data.block import BlockMetadata
    from ray.data.datasource import Datasource, ReadTask

    if isinstance(paths, str):
        paths = (
            sorted(_glob.glob(_os.path.join(paths, "*.parquet")))
            if _os.path.isdir(paths)
            else [paths]
        )
    if mode not in ("multiVersion", "normal"):
        raise ValueError(f"unknown mode {mode!r}")
    if not ranges:
        raise ValueError("read_key_ranges needs at least one (start, stop)")
    read_cols = columns
    if columns is not None:
        # the range predicate always needs the key; normal mode's LWW also
        # needs the version column — read them, project away at the end
        need = [key_col] + ([version_col] if mode == "normal" else [])
        extra = [c for c in need if c not in columns]
        if extra:
            read_cols = [*extra, *columns]
    plans, _ = plan_key_ranges(paths, key_col, ranges)
    if not plans:  # fully pruned: empty dataset with the projected schema
        import pyarrow.parquet as pq

        sch = pq.read_schema(paths[0])
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns])
        return rd.from_arrow(sch.empty_table())

    class _KeyRangeSource(Datasource):
        def get_name(self):
            return f"KeyRange[{key_col}]"

        def estimate_inmemory_data_size(self):
            return None

        def get_read_tasks(self, parallelism: int) -> list[ReadTask]:
            import pyarrow.parquet as pq

            tasks = []
            for path, rgs in plans:
                def read_fn(path=path, rgs=rgs):
                    t = pq.ParquetFile(path).read_row_groups(
                        rgs, columns=read_cols
                    )
                    expr = None
                    for start, stop in ranges:
                        e = None
                        if start is not None:
                            e = pc.field(key_col) >= start
                        if stop is not None:
                            e2 = pc.field(key_col) < stop
                            e = e2 if e is None else e & e2
                        if e is None:  # fully open range: keep everything
                            expr = None
                            break
                        expr = e if expr is None else expr | e
                    if expr is not None:
                        t = t.filter(expr)
                    yield t

                meta = BlockMetadata(
                    num_rows=None, size_bytes=None, exec_stats=None,
                    input_files=[f"{path}#rg{rgs[0]}-{rgs[-1]}"],
                )
                tasks.append(ReadTask(read_fn, meta))
            return tasks

    ds = rd.read_datasource(_KeyRangeSource())
    if mode == "normal":
        from .relational import lww_latest

        ds = lww_latest(ds, [key_col], version_col)
    if read_cols is not columns:
        ds = ds.select_columns(columns)
    return ds


def read_key_range(
    paths: str | list[str],
    key_col: str,
    start=None,
    stop=None,
    columns: list[str] | None = None,
    mode: str = "multiVersion",
    version_col: str = "seq",
) -> "rd.Dataset":
    """Single-range KV rowkey scan — the hbase11xreader surface; see
    :func:`read_key_ranges` for the multi-range (skip scan) form."""
    return read_key_ranges(
        paths, key_col, [(start, stop)],
        columns=columns, mode=mode, version_col=version_col,
    )


# ------------------------------------------------ column-spec stream source


_ALNUM = np.frombuffer(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
    dtype=np.uint8,
)


def _random_strings(rng, n: int, lo: int, hi: int) -> pa.Array:
    """n random alphanumeric strings of length in [lo, hi] — built as ONE
    byte buffer + offsets (no per-row Python strings)."""
    lens = rng.integers(lo, hi + 1, size=n)
    total = int(lens.sum())
    data = _ALNUM[rng.integers(0, len(_ALNUM), size=total)]
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())
    )


def synthetic_columns(
    column_spec: list[dict],
    total_records: int,
    seed: int = 42,
    shards: int = 8,
) -> "rd.Dataset":
    """The reference streamreader's column-spec generator
    (``/root/reference/streamreader/.../StreamReader.java:95-166`` mixup
    parse, ``:221-306`` generate): each column is either a constant
    ``value`` (priority) or ``random: "a, b"`` with type semantics —
    LONG/DOUBLE = value in [a, b]; STRING/BYTES = alphanumeric of length
    in [a, b]; BOOL = a:b false:true ratio; DATE = instant between two
    datetimes (``dateFormat``, default ``%Y-%m-%d %H:%M:%S``).
    Generation is seeded per shard and runs ON the cluster."""
    per_shard = max(1, -(-total_records // shards))

    def gen_shard(batch: pa.Table) -> pa.Table:
        out = []
        for sid in batch.column("id").to_pylist():
            n = min(per_shard, total_records - sid * per_shard)
            if n <= 0:
                continue
            rng = np.random.default_rng(seed * 1_000_003 + sid)
            cols, names = [], []
            for i, c in enumerate(column_spec):
                typ = str(c.get("type", "string")).lower()
                names.append(c.get("name", f"col{i}"))
                if "value" in c:
                    v = c["value"]
                    if typ == "long":
                        arr = pa.array(np.full(n, int(v), np.int64))
                    elif typ == "double":
                        arr = pa.array(np.full(n, float(v), np.float64))
                    elif typ == "bool":
                        arr = pa.array(np.full(n, str(v).lower() == "true"))
                    elif typ == "bytes":
                        arr = pa.array([str(v).encode()] * n, pa.binary())
                    elif typ == "date":
                        fmt = c.get("dateFormat", "%Y-%m-%d %H:%M:%S")
                        import datetime as _dt

                        ts = _dt.datetime.strptime(str(v), fmt)
                        arr = pa.array([ts] * n, pa.timestamp("us"))
                    else:
                        arr = pa.array([str(v)] * n, pa.string())
                elif "random" in c:
                    a_s, b_s = [s.strip() for s in str(c["random"]).split(",", 1)]
                    if typ == "long":
                        arr = pa.array(rng.integers(int(a_s), int(b_s) + 1,
                                                    size=n, dtype=np.int64))
                    elif typ == "double":
                        arr = pa.array(rng.uniform(float(a_s), float(b_s), size=n))
                    elif typ == "bool":
                        a, b = int(a_s), int(b_s)  # false:true ratio
                        p_true = b / (a + b) if (a + b) else 0.5
                        arr = pa.array(rng.random(n) < p_true)
                    elif typ in ("string", "bytes"):
                        s = _random_strings(rng, n, int(a_s), int(b_s))
                        arr = s if typ == "string" else s.cast(pa.binary())
                    elif typ == "date":
                        fmt = c.get("dateFormat", "%Y-%m-%d %H:%M:%S")
                        import datetime as _dt

                        # epoch deltas, NOT .timestamp() (which interprets
                        # naive datetimes in the host's local timezone —
                        # nondeterministic across machines)
                        epoch = _dt.datetime(1970, 1, 1)
                        lo = (_dt.datetime.strptime(a_s, fmt) - epoch).total_seconds()
                        hi = (_dt.datetime.strptime(b_s, fmt) - epoch).total_seconds()
                        us = rng.uniform(lo, hi, size=n) * 1e6
                        arr = pa.array(us.astype(np.int64)).cast(pa.timestamp("us"))
                    else:
                        raise ValueError(f"unknown streamreader type {typ!r}")
                else:
                    raise ValueError("streamreader column needs value or random")
                cols.append(arr)
            out.append(pa.table(dict(zip(names, cols))))
        if out:
            return pa.concat_tables(out)
        # every shard id in this batch had an empty quota (total_records <
        # shards*per_shard leaves trailing shards empty) — map_batches
        # rejects None; emit a zero-row table with the spec's schema
        _PT = {"long": pa.int64(), "double": pa.float64(), "bool": pa.bool_(),
               "bytes": pa.binary(), "date": pa.timestamp("us")}
        fields = [
            pa.field(c.get("name", f"col{i}"),
                     _PT.get(str(c.get("type", "string")).lower(), pa.string()))
            for i, c in enumerate(column_spec)
        ]
        return pa.schema(fields).empty_table()

    return rd.range(shards).map_batches(gen_shard, batch_format="pyarrow",
                                        batch_size=1)


# ----------------------------------------------------- time-series reader


def read_tsdb(
    paths: str | list[str],
    ts_col: str,
    start,
    end,
    interval_s: int = 3600,
    metric_col: str | None = None,
    metrics: list | None = None,
    columns: list[str] | None = None,
) -> "rd.Dataset":
    """Time-series reader — the tsdbreader/opentsdbreader split model
    (``/root/reference/tsdbreader/.../TSDBReader.java:94-96,145-192``:
    split the query into per-hour time intervals, default 1 h, one task
    per metric × interval).  Over parquet the per-interval split is one
    read task per [w, w+interval) window touching only the row groups
    whose ``ts_col`` footer stats overlap it (a row group spanning two
    windows is exact-filtered in-task, so windows neither lose nor
    duplicate rows); the metric predicate is pushed into every task
    instead of multiplying tasks (each (metric, interval) pair is an
    independent HTTP query in the reference, but re-reading a columnar
    row group once per metric would be pure waste)."""
    import datetime as _dt
    import glob as _glob
    import os as _os

    from ray.data.block import BlockMetadata
    from ray.data.datasource import Datasource, ReadTask

    def _ts(v):
        if isinstance(v, _dt.datetime):
            return v
        return _dt.datetime.fromisoformat(str(v))

    lo, hi = _ts(start), _ts(end)
    if isinstance(paths, str):
        paths = (
            sorted(_glob.glob(_os.path.join(paths, "*.parquet")))
            if _os.path.isdir(paths)
            else [paths]
        )
    read_cols = columns
    if columns is not None:
        need = [ts_col] + ([metric_col] if metric_col and metrics else [])
        extra = [c for c in need if c not in columns]
        if extra:
            read_cols = [*extra, *columns]

    windows = []
    w = lo
    step = _dt.timedelta(seconds=int(interval_s))
    while w < hi:
        windows.append((w, min(w + step, hi)))
        w += step

    # ONE footer pass per file (not per window): cache each row group's
    # (min, max) ts stats, then assign row groups to overlapping windows —
    # a year of hourly windows over many files must not re-read metadata
    # 8760 times
    import pyarrow.parquet as _pq

    file_stats: list[tuple[str, list]] = []
    for p in paths:
        md = _pq.read_metadata(p)
        idx = next(
            (i for i in range(md.num_columns)
             if md.schema.column(i).path == ts_col),
            -1,
        )
        if idx < 0:
            raise KeyError(f"{ts_col!r} not a primitive leaf column in {p}")
        rg_stats = []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                rg_stats.append((rg, st.min, st.max))
            else:
                rg_stats.append((rg, None, None))  # no stats: never prune
        file_stats.append((p, rg_stats))

    def _may_overlap(mn, mx, wlo, whi) -> bool:
        if mn is None:
            return True
        try:
            return not (mx < wlo or mn >= whi)
        except TypeError:
            return True  # incomparable stats (e.g. tz-aware): never prune

    per_window = []
    for wlo, whi in windows:
        plans = []
        for p, rg_stats in file_stats:
            keep = [rg for rg, mn, mx in rg_stats
                    if _may_overlap(mn, mx, wlo, whi)]
            if keep:
                plans.append((p, keep))
        per_window.append((wlo, whi, plans))

    class _TsdbSource(Datasource):
        def get_name(self):
            return f"Tsdb[{ts_col}/{interval_s}s]"

        def estimate_inmemory_data_size(self):
            return None

        def get_read_tasks(self, parallelism: int) -> list[ReadTask]:
            import pyarrow.parquet as pq

            tasks = []
            for wlo, whi, plans in per_window:
                for path, rgs in plans:
                    def read_fn(path=path, rgs=rgs, wlo=wlo, whi=whi):
                        t = pq.ParquetFile(path).read_row_groups(
                            rgs, columns=read_cols
                        )
                        t = t.filter(
                            (pc.field(ts_col) >= wlo) & (pc.field(ts_col) < whi)
                        )
                        if metric_col and metrics:
                            t = t.filter(
                                pc.is_in(t[metric_col], value_set=pa.array(metrics))
                            )
                        if read_cols is not columns:
                            t = t.select(columns)
                        yield t

                    meta = BlockMetadata(
                        num_rows=None, size_bytes=None, exec_stats=None,
                        input_files=[f"{path}#{wlo:%Y%m%dT%H%M}"],
                    )
                    tasks.append(ReadTask(read_fn, meta))
            return tasks

    return rd.read_datasource(_TsdbSource())


# ------------------------------------------------ z-order clustering


def zorder_codes(
    arrays: list[np.ndarray], bounds: list[tuple[float, float]], bits: int = 16
) -> np.ndarray:
    """uint64 Morton (z-order) codes: each column linearly quantized to
    ``bits`` over its [lo, hi] bounds, bit-interleaved column-major so
    nearby (c0, c1, ...) tuples share code prefixes.  k·bits must fit 64.
    Vectorized: k·bits shift/or passes over the whole array, no Python
    per-row work.  NaN/None quantize to 0 — pruning stays conservative
    because parquet stats ignore nulls and the exact predicate runs
    in-task anyway."""
    k = len(arrays)
    if k * bits > 64:
        raise ValueError(f"{k} cols × {bits} bits exceeds 64-bit codes")
    q = []
    for a, (lo, hi) in zip(arrays, bounds):
        x = np.asarray(a, dtype=np.float64)
        span = hi - lo
        scale = ((1 << bits) - 1) / span if span > 0 else 0.0
        xq = np.clip((x - lo) * scale, 0, (1 << bits) - 1)
        xq = np.where(np.isfinite(xq), xq, 0.0)
        q.append(xq.astype(np.uint64))
    z = np.zeros(len(q[0]), dtype=np.uint64)
    for i in range(bits):
        for j in range(k):
            z |= ((q[j] >> np.uint64(i)) & np.uint64(1)) << np.uint64(i * k + j)
    return z


def write_zordered(
    ds: "rd.Dataset",
    path: str,
    cols: list[str],
    bits: int = 16,
    row_group_size: int = 4096,
) -> dict:
    """Cluster a table on several columns at once — the OPTIMIZE ZORDER
    maintenance op of lake formats: one bounds aggregate, a Morton-code
    column added per batch, ONE range sort on the code (the shuffle is
    inherent to re-clustering), small row groups.  After this, footer
    min/max stats are tight on EVERY clustered column simultaneously, so
    a multi-dimension box scan (:func:`read_box`) prunes on all of them —
    a 1-D sort can only ever prune its leading column.  Returns the
    bounds used (callers persist them to quantize future writes
    identically)."""
    from ray.data.aggregate import Max, Min

    aggs = []
    for c in cols:
        aggs += [Min(c), Max(c)]
    stats = ds.aggregate(*aggs)
    bounds = [(stats[f"min({c})"], stats[f"max({c})"]) for c in cols]

    def add_z(batch: pa.Table) -> pa.Table:
        arrays = [
            batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in cols
        ]
        return batch.append_column(
            "__z", pa.array(zorder_codes(arrays, bounds, bits), pa.uint64())
        )

    (
        ds.map_batches(add_z, batch_format="pyarrow")
        .sort("__z")
        .drop_columns(["__z"])
        .write_parquet(path, row_group_size=row_group_size)
    )
    return {"cols": cols, "bounds": bounds, "bits": bits}


def plan_box(
    paths: list[str],
    preds: dict[str, tuple],
) -> tuple[list[tuple[str, list[int]]], int]:
    """Row-group plan for a conjunctive box ``{col: [lo, hi), ...}`` —
    multi-column generalization of :func:`plan_key_ranges`: a row group
    survives only if its footer stats overlap EVERY column's range.
    Missing stats keep the group (conservative)."""
    import pyarrow.parquet as pq

    plans, pruned = [], 0
    for p in paths:
        md = pq.read_metadata(p)
        idxs = {}
        for c in preds:
            idx = next(
                (i for i in range(md.num_columns) if md.schema.column(i).path == c),
                -1,
            )
            if idx < 0:
                raise KeyError(f"{c!r} not a primitive leaf column in {p}")
            idxs[c] = idx
        keep = []
        for rg in range(md.num_row_groups):
            ok = True
            for c, (lo, hi) in preds.items():
                st = md.row_group(rg).column(idxs[c]).statistics
                if st is not None and st.has_min_max:
                    if (lo is not None and st.max < lo) or (
                        hi is not None and st.min >= hi
                    ):
                        ok = False
                        break
            if ok:
                keep.append(rg)
            else:
                pruned += 1
        if keep:
            plans.append((p, keep))
    return plans, pruned


def read_box(
    paths: "str | list[str]",
    preds: dict[str, tuple],
    columns: list[str] | None = None,
) -> "rd.Dataset":
    """Multi-dimension box scan ``{col: [lo, hi), ...}`` (half-open; an
    end may be None) over a parquet table: row groups pruned by footer
    stats on every predicate column at once (tight after
    :func:`write_zordered`), exact conjunctive predicate applied in-task,
    one read task per surviving file."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq
    from ray.data.block import BlockMetadata
    from ray.data.datasource import Datasource, ReadTask

    if isinstance(paths, str):
        paths = (
            sorted(_glob.glob(_os.path.join(paths, "*.parquet")))
            if _os.path.isdir(paths)
            else [paths]
        )
    if not preds:
        raise ValueError("read_box needs at least one column predicate")
    read_cols = columns
    if columns is not None:
        extra = [c for c in preds if c not in columns]
        if extra:
            read_cols = [*extra, *columns]
    plans, _ = plan_box(paths, preds)
    if not plans:
        sch = _pq.read_schema(paths[0])
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns])
        return rd.from_arrow(sch.empty_table())

    class _BoxSource(Datasource):
        def get_name(self):
            return f"BoxScan[{','.join(preds)}]"

        def estimate_inmemory_data_size(self):
            return None

        def get_read_tasks(self, parallelism: int) -> list[ReadTask]:
            tasks = []
            for path, rgs in plans:
                def read_fn(path=path, rgs=rgs):
                    t = _pq.ParquetFile(path).read_row_groups(
                        rgs, columns=read_cols
                    )
                    expr = None
                    for c, (lo, hi) in preds.items():
                        if lo is not None:
                            e = pc.field(c) >= lo
                            expr = e if expr is None else expr & e
                        if hi is not None:
                            e = pc.field(c) < hi
                            expr = e if expr is None else expr & e
                    if expr is not None:
                        t = t.filter(expr)
                    yield t

                meta = BlockMetadata(
                    num_rows=None, size_bytes=None, exec_stats=None,
                    input_files=[f"{path}#rg{rgs[0]}-{rgs[-1]}"],
                )
                tasks.append(ReadTask(read_fn, meta))
            return tasks

    ds = rd.read_datasource(_BoxSource())
    if read_cols is not columns:
        ds = ds.select_columns(columns)
    return ds
