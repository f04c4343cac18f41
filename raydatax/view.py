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
def _fold_partition_delta(
    delta_files: list[str],
    prior_file: str | None,
    key: str,
    aggs: list[tuple[str, str, str]],
    staged: str,
) -> int:
    """Changelog-mode refresh for one partition: aggregate ONLY the new
    epoch files (the delta since the view's last folded epoch) and merge
    the partials into the prior summary with the spec's merge functions —
    work ∝ delta events, never partition history.  Worker-side staged
    write, deterministic bytes (key-sorted, fixed parquet opts)."""
    cols = sorted({key} | {c for c, _, _ in aggs})
    parts = []
    for f in delta_files:
        t = pq.read_table(f, columns=cols)
        g = t.group_by([key]).aggregate([(c, fn) for c, fn, _ in aggs])
        names = [key] + [f"{c}_{fn}" for c, fn, _ in aggs]
        parts.append(g.select(names).rename_columns([key] + [o for _, _, o in aggs]))
    if prior_file is not None:
        parts.append(pq.read_table(prior_file))
    merged = pa.concat_tables(parts, promote_options="permissive")
    g = merged.group_by([key]).aggregate(
        [(out, _MERGE_FN[fn]) for _, fn, out in aggs]
    )
    names = [key] + [f"{out}_{_MERGE_FN[fn]}" for _, fn, out in aggs]
    g = g.select(names).rename_columns([key] + [out for _, _, out in aggs])
    g = g.sort_by([(key, "ascending")])
    tmp = staged + ".tmp"
    pq.write_table(g.replace_schema_metadata(None), tmp, **PARQUET_OPTS)
    os.replace(tmp, staged)
    return g.num_rows


def refresh_view(
    lake_dir: str,
    view_dir: str,
    key: str = "conv_id",
    aggs: list[tuple[str, str, str]] | None = None,
) -> dict:
    """Bring the materialized view up to the lake's committed state,
    recomputing ONLY partitions whose manifest epoch advanced (or whose
    summary file is missing — the crash-repair path).  Idempotent; safe to
    kill at any point.  Raises on a spec change (a view's spec is fixed at
    creation, like the lake's partition mapping).

    On a **changelog lake** the refresh is a pure DELTA FOLD: only epoch
    files newer than the view's last folded epoch are aggregated and
    merged into the prior summary (work ∝ delta events — the view never
    re-reads history).  The summary then describes the EVENT STREAM
    (counts skip tombstones' null payload columns), not collapsed table
    state.  A partition compacted past the view's fold point rebuilds from
    its live files.  Crash-safety differs from image mode — a fold is not
    idempotent against its own output, so final files are epoch-qualified
    and the fold always derives from the PRIOR state's file; orphans are
    collected on the next refresh."""
    aggs = list(aggs or DEFAULT_AGGS)
    bad = [fn for _, fn, _ in aggs if fn not in _MERGE_FN]
    if bad:
        raise ValueError(
            f"refresh_view: non-mergeable aggregate fns {bad} — a salted hot "
            f"key spans partitions, so view aggs must be in {sorted(_MERGE_FN)}"
        )
    cfg = mf.load_lake_config(lake_dir)
    changelog = cfg is not None and cfg.get("output", "image") == "changelog"
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

    if changelog:
        return _refresh_changelog(lake_dir, view_dir, key, aggs)

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
        # image recompute IS the fold with one delta (the current image)
        # and no prior — the merge re-aggregation is an identity on a
        # single partial, so one staged-write/agg code path serves both
        # view modes
        refs.append(
            (pid, man, staged,
             _fold_partition_delta.remote([lake_file], None, key, aggs, staged))
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


def _refresh_changelog(
    lake_dir: str, view_dir: str, key: str, aggs: list[tuple[str, str, str]]
) -> dict:
    """Delta-fold refresh for changelog lakes (see :func:`refresh_view`).

    Two-phase per partition, fold-twice-safe: the staged fold (keyed by
    target epoch) always derives from the file the STATE points at plus
    the epochs after the state's fold point, so recomputing after a crash
    at any step — staged written, final renamed, state flipped, old file
    not yet collected — yields identical bytes and no double counting."""
    records = mf.changelog_records(lake_dir)
    if not records:
        raise FileNotFoundError(f"no committed lake partitions under {lake_dir}")
    state = _load_state(view_dir)

    work = []  # (pid, target_epoch, delta_files, prior_file, staged)
    for pid, (recs, horizon) in sorted(records.items()):
        live = [r for r in recs if horizon is None or r["epoch"] >= horizon]
        latest = max(r["epoch"] for r in recs)
        st = state.get(pid)
        prior_file = (
            os.path.join(view_dir, st["file"])
            if st is not None and os.path.exists(os.path.join(view_dir, st["file"]))
            else None
        )
        folded = st["epoch"] if st is not None and prior_file is not None else -1
        if horizon is not None and folded < horizon and folded >= 0:
            # history below the fold point was compacted away: rebuild
            prior_file, folded = None, -1
        delta = [r for r in live if r["epoch"] > folded]
        if not delta:
            continue
        staged = os.path.join(
            view_dir, "_staging", f"part-{pid:05d}-fold-{latest:06d}.parquet"
        )
        files = [os.path.join(lake_dir, r["file"]) for r in delta]
        work.append((pid, latest, files, prior_file, staged))

    refs = [
        (pid, epoch, staged,
         _fold_partition_delta.remote(files, prior, key, aggs, staged))
        for pid, epoch, files, prior, staged in work
    ]
    rows = 0
    for pid, epoch, staged, ref in refs:
        n = ray.get(ref)
        rows += n
        final = os.path.join(
            view_dir, "data", f"part-{pid:05d}-fold-{epoch:06d}.parquet"
        )
        os.replace(staged, final)
        _atomic_write_json(
            _state_path(view_dir, pid),
            {"partition": pid, "epoch": epoch, "rows": n,
             "file": os.path.relpath(final, view_dir)},
        )
    # collect files no longer referenced by any state entry (superseded
    # folds, or leftovers from a crash between state flip and cleanup)
    live_files = {s["file"] for s in _load_state(view_dir).values()}
    dropped = 0
    for f in glob.glob(os.path.join(view_dir, "data", "part-*.parquet")):
        if os.path.relpath(f, view_dir) not in live_files:
            os.remove(f)
            dropped += 1
    return {
        "refreshed": len(work),
        "skipped": len(records) - len(work),
        "rows_recomputed": rows,
        "orphans_collected": dropped,
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
