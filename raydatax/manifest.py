"""Commit manifests: the exactly-once / checkpoint-resume state store.

Design (SURVEY.md §3.2, §4):

```
<lake>/
  _lake.json                      # immutable lake config: P, S, hot registry
  data/part-<pid>/epoch-<e>.parquet   # committed partition snapshots
  _manifests/part-<pid>.json      # latest pointer per partition (atomic)
  _staging/epoch-<e>/part-<pid>.parquet + plan.json   # phase-1 output
  _deadletter/epoch-<e>/*.parquet # dirty records (DataX dirty-data parity)
  _metrics/epoch-<e>.json         # per-partition lineage + job report
```

Two-phase commit mirrors the reference's hdfswriter (write to UUID tmp dir,
rename on Job.post — ``/root/reference/hdfswriter/.../HdfsWriter.java:190-322``,
``HdfsHelper.java:207-243``) except that our staged names are deterministic
(partition id + epoch, never UUIDs) so a killed+resumed job reproduces
byte-identical files.  The per-partition manifest is the engine's
ShardCheckpoint (``/root/reference/otsstreamreader/.../model/
ShardCheckpoint.java:8-118``): it records the committed file and the
high-watermark ``seq``; resume replays only events with ``seq > hw``.
Manifests are timestamp-free so repeated runs converge to identical bytes;
wall-clock metrics live only under ``_metrics/``.
"""

from __future__ import annotations

import glob
import json
import os
import re


def _atomic_write_json(path: str, obj: dict) -> None:
    """Write-temp + rename: the atomic publish primitive (ES alias-flip /
    hdfs rename analogue)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _read_json(path: str) -> dict | None:
    try:
        with open(path) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


# ---------------------------------------------------------------- lake config


def lake_config_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_lake.json")


def load_lake_config(lake_dir: str) -> dict | None:
    return _read_json(lake_config_path(lake_dir))


def init_lake(lake_dir: str, partitions: int, salt: int, hot_keys: list[str],
              sparse_updates: bool = False, time_travel_epochs: int = 0,
              output: str = "image") -> dict:
    """Create (or load) the immutable lake config.  Partition mapping must be
    stable across the lake's lifetime (rebase merge depends on it), so
    P / S / the hot-key registry are fixed at creation.  Time-travel
    retention is lake-level too: EVERY ingest path (run_job, tail_wal, the
    job runner) vacuums, so a per-call-only setting would let one caller
    silently delete the snapshot window another caller relies on.
    ``output`` ("image" | "changelog") is equally lake-level: the two modes
    store different things under data/ (latest row images vs append-only
    change history) and must never mix."""
    cfg = load_lake_config(lake_dir)
    if cfg is not None:
        return cfg
    if output not in ("image", "changelog"):
        raise ValueError(f"unknown lake output mode {output!r}")
    cfg = {
        "partitions": int(partitions),
        "salt": int(salt),
        "hot_keys": list(hot_keys),
        "sparse_updates": bool(sparse_updates),
        "time_travel_epochs": int(time_travel_epochs),
        "output": output,
        "format": "raydatax-lake-v1",
        "hash_version": _hash_version(),
    }
    _atomic_write_json(lake_config_path(lake_dir), cfg)
    return cfg


def _hash_version() -> str:
    from .partition import HASH_VERSION

    return HASH_VERSION


def check_hash_version(cfg: dict, lake_dir: str) -> None:
    """Refuse to touch a lake whose key→partition hash differs from this
    build's.  Without this guard a hash change silently remaps conv_ids to
    different partitions: LWW keys split across partitions (stale/duplicate
    rows survive), lookup pruning reads the wrong partition, and resume is
    no longer byte-identical.  Lakes written before the tag existed are
    treated as mismatched too — their mapping is unknown.  Migration path:
    ``driver.repartition_lake`` (full export re-bucket, no hash pruning)."""
    found = cfg.get("hash_version", "<untagged pre-v2 lake>")
    want = _hash_version()
    if found != want:
        raise RuntimeError(
            f"lake {lake_dir} was partitioned with hash {found!r} but this "
            f"build uses {want!r}; ingesting or key-pruned lookups would "
            f"mis-map keys. Migrate with driver.repartition_lake()."
        )


def total_partitions(cfg: dict) -> int:
    return cfg["partitions"] + len(cfg["hot_keys"]) * cfg["salt"]


# ----------------------------------------------------------------- manifests


def manifest_path(lake_dir: str, pid: int) -> str:
    return os.path.join(lake_dir, "_manifests", f"part-{pid:05d}.json")


def load_manifests(lake_dir: str) -> dict[int, dict]:
    out: dict[int, dict] = {}
    for p in glob.glob(os.path.join(lake_dir, "_manifests", "part-*.json")):
        m = _read_json(p)
        if m is not None:
            out[int(m["partition"])] = m
    return out


def commit_partition(
    lake_dir: str,
    pid: int,
    epoch: int,
    staged_file: str,
    hw_seq: int,
    rows: int,
    counts: dict,
) -> dict:
    """Phase 2 for one partition: rename staged file into data/, then
    atomically flip the manifest pointer.  Idempotent: a re-run after a crash
    between rename and manifest write simply re-renames a file that is
    already there (os.replace) and rewrites the same manifest."""
    final_dir = os.path.join(lake_dir, "data", f"part-{pid:05d}")
    os.makedirs(final_dir, exist_ok=True)
    final_file = os.path.join(final_dir, f"epoch-{epoch:06d}.parquet")
    if os.path.exists(staged_file):
        os.replace(staged_file, final_file)
    elif not os.path.exists(final_file):
        # a RuntimeError, deliberately NOT OSError: util.retry's default
        # retry_on=(OSError,) must not re-attempt an impossible commit
        raise RuntimeError(
            f"neither staged nor final file for part {pid}: {staged_file}")
    man = {
        "partition": pid,
        "epoch": epoch,
        "file": os.path.relpath(final_file, lake_dir),
        "hw_seq": int(hw_seq),
        "rows": int(rows),
        "bytes": os.path.getsize(final_file),
        "counts": counts,
    }
    _atomic_write_json(manifest_path(lake_dir, pid), man)
    # append-only history record → time travel (snapshot-by-epoch reads);
    # idempotent: a resumed commit rewrites the identical record
    _atomic_write_json(history_path(lake_dir, pid, epoch), man)
    return man


def history_path(lake_dir: str, pid: int, epoch: int) -> str:
    return os.path.join(
        lake_dir, "_manifests", "history", f"part-{pid:05d}-epoch-{epoch:06d}.json"
    )


def snapshot_manifests(lake_dir: str, at_epoch: int) -> dict[int, dict]:
    """Manifest set as of ``at_epoch``: for every partition, its newest
    commit with epoch ≤ at_epoch.  Raises if a needed snapshot file was
    vacuumed away (the time-travel window is ``vacuum(keep_unreferenced=N)``
    / ``run_job(time_travel_epochs=N)``)."""
    best: dict[int, dict] = {}
    for p in glob.glob(os.path.join(lake_dir, "_manifests", "history", "part-*.json")):
        m = _read_json(p)
        if m is None or m["epoch"] > at_epoch:
            continue
        cur = best.get(m["partition"])
        if cur is None or m["epoch"] > cur["epoch"]:
            best[m["partition"]] = m
    for pid, m in best.items():
        if not os.path.exists(os.path.join(lake_dir, m["file"])):
            raise FileNotFoundError(
                f"time travel to epoch {at_epoch}: partition {pid}'s snapshot "
                f"{m['file']} was vacuumed — raise time_travel_epochs/"
                f"keep_unreferenced to widen the retention window"
            )
    return best


def iter_history_records(lake_dir: str) -> list[tuple[str, dict | None]]:
    """Every ``(path, parsed record | None-if-unreadable)`` under
    ``_manifests/history`` — THE single definition of where history
    records live and how they parse.  fsck, replication, compaction and
    the changelog readers all shape their own views from this, so a
    layout change (new field, path scheme, tombstone convention) cannot
    silently drift between them."""
    return [
        (p, _read_json(p))
        for p in sorted(
            glob.glob(
                os.path.join(lake_dir, "_manifests", "history", "part-*.json")
            )
        )
    ]


def changelog_records(lake_dir: str) -> dict[int, tuple[list[dict], int | None]]:
    """Per-partition commit history records of a changelog lake:
    ``{pid: (records epoch-ascending, compaction horizon or None)}``.
    Records below a partition's horizon are superseded by its compacted
    record (which holds the full history ≤ horizon)."""
    by_part: dict[int, list[dict]] = {}
    for _, m in iter_history_records(lake_dir):
        if m is not None:
            by_part.setdefault(m["partition"], []).append(m)
    out: dict[int, tuple[list[dict], int | None]] = {}
    for pid, recs in by_part.items():
        recs = sorted(recs, key=lambda m: m["epoch"])
        horizon = max(
            (m["epoch"] for m in recs if m.get("compacted_upto")), default=None
        )
        out[pid] = (recs, horizon)
    return out


def changelog_files(lake_dir: str, at_epoch: int | None = None) -> list[str]:
    """ALL committed epoch files, partition-major then epoch-ascending — the
    read side of a ``output="changelog"`` lake, where every epoch file is
    live history (not a superseded snapshot).  ``at_epoch`` bounds the log
    to commits ≤ that epoch.

    A record carrying ``compacted_upto: E`` means its file holds the FULL
    history ≤ E for its partition (see ``driver.compact_changelog``):
    records below E are superseded and skipped — even when their files are
    already deleted, so a crash between marker write and file deletion
    leaves a readable lake and a re-run finishes the cleanup.  Reading AT
    an epoch below a partition's compaction horizon raises loudly (that
    history no longer exists file-by-file)."""
    out = []
    for pid, (recs, horizon) in sorted(changelog_records(lake_dir).items()):
        if horizon is not None and at_epoch is not None and at_epoch < horizon:
            raise RuntimeError(
                f"partition {pid}: changelog history ≤ epoch {horizon} was "
                f"compacted — cannot read at epoch {at_epoch}"
            )
        for m in recs:
            if at_epoch is not None and m["epoch"] > at_epoch:
                continue
            if horizon is not None and m["epoch"] < horizon:
                continue  # superseded by the compacted record
            f = os.path.join(lake_dir, m["file"])
            if not os.path.exists(f):
                raise FileNotFoundError(
                    f"changelog epoch file missing: {m['file']} — was this "
                    f"lake vacuumed as an image lake?"
                )
            out.append(f)
    return out


def committed_files(lake_dir: str, at_epoch: int | None = None) -> list[str]:
    """Table state = latest committed file of every partition (or, with
    ``at_epoch``, the newest ≤ that epoch), in partition order (the stable
    output ordering's outer key)."""
    mans = load_manifests(lake_dir) if at_epoch is None else snapshot_manifests(lake_dir, at_epoch)
    return [
        os.path.join(lake_dir, mans[pid]["file"]) for pid in sorted(mans)
    ]


# ------------------------------------------------------------------ staging


def staging_dir(lake_dir: str, epoch: int) -> str:
    return os.path.join(lake_dir, "_staging", f"epoch-{epoch:06d}")


def plan_path(lake_dir: str, epoch: int) -> str:
    return os.path.join(staging_dir(lake_dir, epoch), "plan.json")


def find_resumable_plan(
    lake_dir: str, segments: list[str], max_seq: int, window: list | None = None
) -> dict | None:
    """If a prior (killed) run staged a plan for the same WAL frontier (and,
    for time-bounded replay, the same [start_ts, end_ts) window), continue
    its epoch — this is what makes resume byte-identical to an uninterrupted
    run (same epoch number → same file names)."""
    for p in sorted(glob.glob(os.path.join(lake_dir, "_staging", "epoch-*", "plan.json"))):
        plan = _read_json(p)
        if (
            plan is not None
            and plan.get("max_seq") == max_seq
            and plan.get("segments") == segments
            and plan.get("window") == window
        ):
            return plan
    return None


def next_epoch(lake_dir: str) -> int:
    epochs = [m["epoch"] for m in load_manifests(lake_dir).values()]
    for p in glob.glob(os.path.join(lake_dir, "_staging", "epoch-*")):
        m = re.search(r"epoch-(\d+)$", p)
        if m:
            epochs.append(int(m.group(1)))
    return (max(epochs) + 1) if epochs else 1


def write_plan(lake_dir: str, plan: dict) -> None:
    _atomic_write_json(plan_path(lake_dir, plan["epoch"]), plan)


def vacuum(lake_dir: str, keep_unreferenced: int = 0) -> list[str]:
    """Delete partition data files no longer referenced by any manifest
    (each rebase epoch writes a fresh snapshot file; without vacuum old
    epochs accumulate forever — a real leak at scale).  Safe after commit:
    manifests already point at the new files.  ``keep_unreferenced`` retains
    the N newest unreferenced epochs per partition — the TIME-TRAVEL window
    for ``committed_files(at_epoch=)`` / ``read_lake(at_epoch=)``.

    History JSONs are trimmed too — at a micro-batch cadence (1440
    epochs/day × P partitions) unbounded per-epoch records are a real
    small-file leak.  Per partition we keep: records whose data file still
    exists (inside the window), any ``compacted_upto`` marker (a changelog
    lake's compaction horizon lives in these), and two TOMBSTONES — the
    partition's oldest record plus the newest vacuumed one — so a time
    travel anywhere past the window still resolves to a record whose file
    is gone and fails LOUDLY (``snapshot_manifests``) instead of silently
    returning partial state."""
    cfg = load_lake_config(lake_dir)
    if cfg is not None and cfg.get("output", "image") == "changelog":
        # every epoch file of a changelog lake IS live history — only the
        # newest is manifest-referenced, so vacuuming would DELETE the log
        raise RuntimeError(
            f"vacuum on changelog lake {lake_dir}: old epochs are live "
            "history, not superseded snapshots — use compact_changelog"
        )
    referenced = {os.path.join(lake_dir, m["file"]) for m in load_manifests(lake_dir).values()}
    removed = []
    for pdir in sorted(glob.glob(os.path.join(lake_dir, "data", "part-*"))):
        files = sorted(glob.glob(os.path.join(pdir, "epoch-*.parquet")))
        unref = [f for f in files if f not in referenced]
        n_drop = max(0, len(unref) - keep_unreferenced) if keep_unreferenced else len(unref)
        for f in unref[:n_drop]:
            os.remove(f)
            removed.append(f)

    by_part: dict[int, list[tuple[str, dict]]] = {}
    for p in glob.glob(os.path.join(lake_dir, "_manifests", "history", "part-*.json")):
        m = _read_json(p)
        if m is not None:
            by_part.setdefault(int(m["partition"]), []).append((p, m))
    for recs in by_part.values():
        recs.sort(key=lambda pm: pm[1]["epoch"])
        vacuumed = [
            (p, m) for p, m in recs
            if not os.path.exists(os.path.join(lake_dir, m["file"]))
        ]
        keep_paths = {recs[0][0]}  # oldest record: loud-failure lower bound
        if vacuumed:
            keep_paths.add(vacuumed[-1][0])  # newest trimmed-below-here mark
        for p, m in recs:
            if (m.get("compacted_upto")
                    or os.path.exists(os.path.join(lake_dir, m["file"]))):
                keep_paths.add(p)
        for p, _ in vacuumed:
            if p not in keep_paths:
                os.remove(p)
                removed.append(p)
    return removed


def acquire_job_lock(lake_dir: str):
    """Advisory exclusive lock: two concurrent ingest jobs on one lake would
    race on staging files and epoch numbering.  Returns the held lock file
    object (keep it alive for the job's duration) or raises RuntimeError."""
    import fcntl

    os.makedirs(lake_dir, exist_ok=True)
    f = open(os.path.join(lake_dir, "_lock"), "w")
    try:
        fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        f.close()
        raise RuntimeError(
            f"another ingest job holds the lock on {lake_dir}"
        ) from None
    return f


def gc_staging(lake_dir: str, committed_epoch: int) -> list[str]:
    """Orphan-staging GC (hdfswriter deletes its tmp dir on post): remove
    staging dirs for epochs <= the fully committed one."""
    removed = []
    for p in glob.glob(os.path.join(lake_dir, "_staging", "epoch-*")):
        m = re.search(r"epoch-(\d+)$", p)
        if m and int(m.group(1)) <= committed_epoch:
            for f in glob.glob(os.path.join(p, "*")):
                os.remove(f)
            os.rmdir(p)
            removed.append(p)
    return removed
