"""Incremental materialized views over a raydatax lake.

The classic CDC downstream: a per-conversation summary table maintained
incrementally — after each ingest epoch, only partitions whose lake
manifest advanced since the view's last refresh are recomputed.  The
reference has no analogue (DataX moves records; anything derived is a
full re-run downstream); this is the capability an incremental-ingest
engine exists to enable, so it is built on the engine's own invariants:

- **Partition-aligned, shuffle-free refresh.**  The view keeps one summary
  file per lake partition; each stale partition is recomputed by ONE Ray
  task that reads only that partition's committed image file and runs a
  single Arrow hash aggregation.  Work per refresh is O(changed
  partitions), not O(lake).
- **Two-phase commit, mirrored from the lake** (`manifest.py` pattern):
  workers write staged files with DETERMINISTIC names keyed by
  (partition, source epoch) and the lake's fixed parquet options, the
  driver renames and atomically flips a per-partition state json — a
  kill at any point is resumed idempotently by the next refresh, and a
  state json pointing at a missing file marks the partition stale again.
- **Salted hot keys merge at read time.**  A hot conversation is split
  across salt sub-partitions by the exchange, so its summary rows appear
  in several view partitions; the aggregate spec is restricted to
  MERGEABLE functions (count/sum/min/max) and recorded in the view state,
  and :func:`view_table` / :func:`read_view(merged=True)` fold the
  spillovers with the matching merge functions (count re-merges as sum).
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray

from . import manifest as mf
from .manifest import _atomic_write_json, _read_json
from .merge import PARQUET_OPTS

# aggregate fn -> fn used when merging partial summaries of a split key
_MERGE_FN = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}

#: default spec: per-conversation turn count, latest seq and event time.
DEFAULT_AGGS: list[tuple[str, str, str]] = [
    ("turn_idx", "count", "n_turns"),
    ("seq", "max", "last_seq"),
    ("ts", "max", "last_ts"),
]


def _state_dir(view_dir: str) -> str:
    return os.path.join(view_dir, "_state")


def _state_path(view_dir: str, pid: int) -> str:
    return os.path.join(_state_dir(view_dir), f"part-{pid:05d}.json")


def _load_state(view_dir: str) -> dict[int, dict]:
    out: dict[int, dict] = {}
    for p in glob.glob(os.path.join(_state_dir(view_dir), "part-*.json")):
        s = _read_json(p)
        if s is not None:
            out[int(s["partition"])] = s
    return out


def _spec_path(view_dir: str) -> str:
    return os.path.join(view_dir, "_view.json")


@ray.remote
def _summarize_partition(
    lake_file: str, key: str, aggs: list[tuple[str, str, str]], staged: str
) -> int:
    """Recompute one partition's summary from its committed image file and
    write the staged parquet (worker-side write, driver only renames —
    the engine's sink discipline).  Returns the summary row count."""
    cols = sorted({key} | {c for c, _, _ in aggs})
    t = pq.read_table(lake_file, columns=cols)
    grouped = t.group_by([key]).aggregate([(c, fn) for c, fn, _ in aggs])
    # pyarrow names outputs "<col>_<fn>"; bind them to the spec's out names
    names = [key] + [f"{c}_{fn}" for c, fn, _ in aggs]
    grouped = grouped.select(names).rename_columns(
        [key] + [out for _, _, out in aggs]
    )
    grouped = grouped.sort_by([(key, "ascending")])  # deterministic bytes
    tmp = staged + ".tmp"
    pq.write_table(grouped.replace_schema_metadata(None), tmp, **PARQUET_OPTS)
    os.replace(tmp, staged)
    return grouped.num_rows


def refresh_view(
    lake_dir: str,
    view_dir: str,
    key: str = "conv_id",
    aggs: list[tuple[str, str, str]] | None = None,
) -> dict:
    """Bring the materialized view up to the lake's committed state,
    recomputing ONLY partitions whose manifest epoch advanced (or whose
    summary file is missing — the crash-repair path).  Idempotent; safe to
    kill at any point.  Raises on a changelog lake (its manifests are
    per-epoch deltas, not images — aggregate ``read_changelog`` instead)
    and on a spec change (a view's spec is fixed at creation, like the
    lake's partition mapping)."""
    aggs = list(aggs or DEFAULT_AGGS)
    bad = [fn for _, fn, _ in aggs if fn not in _MERGE_FN]
    if bad:
        raise ValueError(
            f"refresh_view: non-mergeable aggregate fns {bad} — a salted hot "
            f"key spans partitions, so view aggs must be in {sorted(_MERGE_FN)}"
        )
    cfg = mf.load_lake_config(lake_dir)
    if cfg is not None and cfg.get("output", "image") == "changelog":
        raise RuntimeError(
            f"{lake_dir} is a changelog lake — a view needs image manifests; "
            f"aggregate read_changelog() instead"
        )
    os.makedirs(_state_dir(view_dir), exist_ok=True)
    os.makedirs(os.path.join(view_dir, "data"), exist_ok=True)
    os.makedirs(os.path.join(view_dir, "_staging"), exist_ok=True)
    spec = {"key": key, "aggs": [list(a) for a in aggs]}
    prior = _read_json(_spec_path(view_dir))
    if prior is None:
        _atomic_write_json(_spec_path(view_dir), spec)
    elif prior != spec:
        raise RuntimeError(
            f"view spec changed (was {prior}, now {spec}) — create a new view"
        )

    manifests = mf.load_manifests(lake_dir)
    if not manifests:
        raise FileNotFoundError(f"no committed lake partitions under {lake_dir}")
    state = _load_state(view_dir)

    stale: list[tuple[int, dict]] = []
    for pid, man in sorted(manifests.items()):
        st = state.get(pid)
        final = os.path.join(view_dir, "data", f"part-{pid:05d}.parquet")
        if st is None or st["epoch"] < man["epoch"] or not os.path.exists(final):
            stale.append((pid, man))

    refs = []
    for pid, man in stale:
        staged = os.path.join(
            view_dir, "_staging", f"part-{pid:05d}-epoch-{man['epoch']:06d}.parquet"
        )
        lake_file = os.path.join(lake_dir, man["file"])
        refs.append(
            (pid, man, staged,
             _summarize_partition.remote(lake_file, key, aggs, staged))
        )

    rows = 0
    for pid, man, staged, ref in refs:
        n = ray.get(ref)
        rows += n
        final = os.path.join(view_dir, "data", f"part-{pid:05d}.parquet")
        os.replace(staged, final)
        _atomic_write_json(
            _state_path(view_dir, pid),
            {"partition": pid, "epoch": man["epoch"], "rows": n,
             "file": os.path.relpath(final, view_dir)},
        )
    return {
        "refreshed": len(stale),
        "skipped": len(manifests) - len(stale),
        "rows_recomputed": rows,
    }


def _view_files(view_dir: str) -> list[str]:
    state = _load_state(view_dir)
    if not state:
        raise FileNotFoundError(f"no refreshed view state under {view_dir}")
    return [os.path.join(view_dir, s["file"]) for _, s in sorted(state.items())]


def read_view(view_dir: str, merged: bool = True) -> "ray.data.Dataset":
    """The view as a streaming Dataset.  ``merged=True`` (default) folds
    the summaries of salted hot keys that span partitions — a
    pre-aggregated groupby over the (already tiny) per-partition summary
    rows with the spec's MERGE functions; ``merged=False`` returns the raw
    partition-local rows."""
    import ray.data

    ds = ray.data.read_parquet(_view_files(view_dir))
    if not merged:
        return ds
    spec = _read_json(_spec_path(view_dir))
    from .relational import preagg_groupby

    merge_aggs = [
        (out, _MERGE_FN[fn], out) for _, fn, out in (tuple(a) for a in spec["aggs"])
    ]
    return preagg_groupby(ds, [spec["key"]], merge_aggs)


def view_table(view_dir: str, merged: bool = True) -> pa.Table:
    """Small-view convenience: the merged view as one Arrow table (driver
    memory — use :func:`read_view` for big key spaces)."""
    tables = [pq.read_table(f) for f in _view_files(view_dir)]
    t = pa.concat_tables(tables, promote_options="permissive")
    if not merged:
        return t
    spec = _read_json(_spec_path(view_dir))
    key = spec["key"]
    aggs = [tuple(a) for a in spec["aggs"]]
    grouped = t.group_by([key]).aggregate(
        [(out, _MERGE_FN[fn]) for _, fn, out in aggs]
    )
    names = [key] + [f"{out}_{_MERGE_FN[fn]}" for _, fn, out in aggs]
    return grouped.select(names).rename_columns(
        [key] + [out for _, _, out in aggs]
    ).sort_by([(key, "ascending")])
