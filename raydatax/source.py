"""WAL segment discovery + incremental read planning.

The binlog/WAL is a directory of ordered Parquet segment files (the shard
analogue of otsstreamreader — shard list at ``/root/reference/otsstreamreader/
.../OTSStreamReaderMasterProxy.java:78-107``).  Planning prunes at the
metadata level: a segment whose footer max(``seq``) is <= the global minimum
high-watermark cannot contribute any replayable event and is never opened —
the engine-side analogue of DataX's reader split + WHERE-range pushdown
(``/root/reference/plugin-rdbms-util/.../reader/util/SingleTableSplitUtil.
java:32-123``).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

from .schema import evolve_event_schema


@dataclass
class ReadPlan:
    segments: list[str]
    min_seq: int
    max_seq: int
    event_schema: pa.Schema
    skipped_segments: int = 0
    segment_schemas: dict[str, str] = field(default_factory=dict)


def discover_segments(wal_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(wal_dir, "seg-*.parquet")))


def segment_seq_range(path: str) -> tuple[int, int]:
    """min/max seq from parquet row-group statistics (footer only)."""
    md = pq.read_metadata(path)
    idx = md.schema.to_arrow_schema().get_field_index("seq")
    mn, mx = None, None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return (-(1 << 62), 1 << 62)  # no stats: cannot prune
        mn = st.min if mn is None else min(mn, st.min)
        mx = st.max if mx is None else max(mx, st.max)
    return (mn, mx)


def segment_ts_range(path: str) -> tuple[int, int]:
    """min/max event-time (µs) from parquet row-group statistics (footer
    only); unbounded when stats are missing — prune conservatively."""
    md = pq.read_metadata(path)
    sch = md.schema.to_arrow_schema()
    if "ts" not in sch.names:
        return (-(1 << 62), 1 << 62)
    idx = sch.get_field_index("ts")
    mn, mx = None, None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return (-(1 << 62), 1 << 62)
        # physical (raw) stats are int64 µs for timestamp[us] — avoids any
        # local-timezone interpretation of logical datetime stats
        if not isinstance(st.min_raw, int) or not isinstance(st.max_raw, int):
            return (-(1 << 62), 1 << 62)
        lo, hi = st.min_raw, st.max_raw
        mn = lo if mn is None else min(mn, lo)
        mx = hi if mx is None else max(mx, hi)
    return (mn, mx)


def plan_read(
    wal_dir: str,
    min_hw: int,
    ts_lo: int | None = None,
    ts_hi: int | None = None,
) -> ReadPlan:
    """Segments that may contain events with seq > min_hw (and, for
    time-bounded replay, event time in [ts_lo, ts_hi) µs — the
    otsstreamreader startTime/endTime window), plus the unified (evolved)
    event schema across them."""
    all_segs = discover_segments(wal_dir)
    keep, schemas = [], []
    lo, hi = None, None
    for p in all_segs:
        mn, mx = segment_seq_range(p)
        if mx <= min_hw:
            continue
        if ts_lo is not None or ts_hi is not None:
            t_mn, t_mx = segment_ts_range(p)
            if ts_lo is not None and t_mx < ts_lo:
                continue
            if ts_hi is not None and t_mn >= ts_hi:
                continue
        keep.append(p)
        schemas.append(pq.read_schema(p))
        lo = mn if lo is None else min(lo, mn)
        hi = mx if hi is None else max(hi, mx)
    schema = evolve_event_schema(schemas) if schemas else evolve_event_schema([])
    return ReadPlan(
        segments=keep,
        min_seq=lo if lo is not None else 0,
        max_seq=hi if hi is not None else -1,
        event_schema=schema,
        skipped_segments=len(all_segs) - len(keep),
        segment_schemas={os.path.basename(p): str(s) for p, s in zip(keep, schemas)},
    )


# --------------------------------------------------- multi-table demux


def demux_wal(
    src_dir: str,
    dst_base: str,
    table_col: str = "table",
    drop_col: bool = True,
) -> dict:
    """Route ONE CDC stream carrying several tables into per-table WAL
    dirs — the Debezium-style topology the reference handles as one DataX
    job per table (each job re-reads the source; here the stream is read
    once).  One Ray task per source segment: partition the segment by
    ``table_col`` (dictionary encode + one filter per value), write
    ``dst_base/<table>/seg-{k}.parquet`` with the SOURCE segment number —
    per-table seq order is inherited, so every routed dir is a valid WAL
    for ``run_job``/``tail_wal``.

    Idempotent + resumable: outputs are deterministic and written
    temp+rename; ``_demux.json`` records finished source segments, so a
    resumed demux skips them (the ShardCheckpoint discipline) and a
    re-run of an unrecorded segment overwrites byte-identical files.
    Returns ``{"tables": {name: dir}, "segments_routed": n,
    "rows": {name: n}}``.
    """
    import json

    import ray as _ray

    segs = discover_segments(src_dir)
    if not segs:
        raise FileNotFoundError(f"no WAL segments under {src_dir}")
    os.makedirs(dst_base, exist_ok=True)
    manifest_path = os.path.join(dst_base, "_demux.json")
    done: dict[str, dict] = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            state = json.load(f)
        if state.get("table_col") != table_col:
            raise ValueError(
                f"demux at {dst_base} was started with table_col="
                f"{state.get('table_col')!r}, not {table_col!r}"
            )
        done = state.get("done", {})

    def route_one(path: str) -> dict:
        import pyarrow.compute as pc

        t = pq.read_table(path)
        col = t[table_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        names = pc.unique(col).to_pylist()
        out = t.drop_columns([table_col]) if drop_col else t
        seg_name = os.path.basename(path)
        counts = {}
        for name in sorted(str(n) for n in names):
            mask = pc.equal(col, name)
            part = out.filter(mask)
            tdir = os.path.join(dst_base, name)
            os.makedirs(tdir, exist_ok=True)
            final = os.path.join(tdir, seg_name)
            tmp = final + ".tmp"
            pq.write_table(
                part, tmp, compression="zstd", row_group_size=65536
            )
            os.replace(tmp, final)
            counts[name] = part.num_rows
        return {"segment": seg_name, "rows": counts}

    todo = [p for p in segs if os.path.basename(p) not in done]
    if _ray.is_initialized() and len(todo) > 1:
        fn = _ray.remote(route_one)
        results = _ray.get([fn.remote(p) for p in todo])
    else:
        results = [route_one(p) for p in todo]

    for r in results:
        done[r["segment"]] = r["rows"]
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"table_col": table_col, "done": done}, f, indent=1)
    os.replace(tmp, manifest_path)

    rows: dict[str, int] = {}
    for seg_rows in done.values():
        for name, n in seg_rows.items():
            rows[name] = rows.get(name, 0) + n
    return {
        "tables": {name: os.path.join(dst_base, name) for name in sorted(rows)},
        "segments_routed": len(done),
        "rows": rows,
    }
