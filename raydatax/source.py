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


def plan_read(wal_dir: str, min_hw: int) -> ReadPlan:
    """Segments that may contain events with seq > min_hw, plus the unified
    (evolved) event schema across them."""
    all_segs = discover_segments(wal_dir)
    keep, schemas = [], []
    lo, hi = None, None
    for p in all_segs:
        mn, mx = segment_seq_range(p)
        if mx <= min_hw:
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
