"""Incremental lake-to-lake replication (disaster-recovery sync).

The reference engine is, at heart, a data mover; this module is the
lake-granularity version of that job: make (and keep) a byte-identical
replica of a raydatax lake on another filesystem root, shipping ONLY what
the replica doesn't already have.  The unit of replication is the commit
history record — the same unit the ingest path commits — so the replica
inherits every engine property for free: image or changelog mode, time
travel, compaction horizons, loud-failure tombstones, hash-version guard.

Design (per-partition commit ordering mirrors the ingest path, which
itself follows hdfswriter's write-then-rename-then-publish:
`/root/reference/hdfswriter/.../HdfsWriter.java:190-192`):

1. data files are copied FIRST (Ray task per partition batch, tmp+rename —
   the driver never holds file bytes), 2. each file's history record is
   written after its file exists, 3. the latest per-partition manifest is
   flipped LAST.  A crash at any point leaves the replica readable at its
   previous state; a re-run converges (records are compared by content, a
   file already present at the right size is not re-copied).
4. a prune pass then mirrors deletions: dst records absent from src (a
   compaction or vacuum ran upstream) are removed along with data files no
   src record or manifest references — the replica tracks the source's
   retention policy instead of leaking superseded epochs forever.

Work is ∝ delta: an unchanged partition costs one JSON comparison, no
data reads.  At 100 TB the copy tasks stream file bytes worker-to-worker
(here: local fs → local fs; on a real cluster the same plan runs with an
object-store / S3 filesystem in the copy task).

Scope notes: `_staging`, `_lock`, `_deadletter` and `_bootstrap_wal` are
operational state of the PRIMARY and are deliberately not replicated;
`_metrics` (per-epoch lineage) IS replicated so the replica carries its
provenance.  The replica is a full lake — `read_lake`, `changelog_table`,
`lookup_conversation` and (after promotion) `run_job` all work on it.
"""

from __future__ import annotations

import glob
import os
import shutil

import ray

from . import manifest as mf


def _history_records(lake_dir: str) -> dict[tuple[int, int], dict]:
    return {
        (int(m["partition"]), int(m["epoch"])): m
        for _, m in mf.iter_history_records(lake_dir)
        if m is not None
    }


@ray.remote
def _copy_files(pairs: list[tuple[str, str]]) -> tuple[int, int]:
    """Copy src→dst.tmp then rename (atomic publish).  Skips pairs whose
    destination already matches the source size — records are immutable
    once committed, so same path + same size ⇒ same bytes."""
    copied, nbytes = 0, 0
    for src, dst in pairs:
        try:
            if os.path.getsize(dst) == os.path.getsize(src):
                continue
        except OSError:
            pass
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tmp = dst + ".tmp"
        shutil.copyfile(src, tmp)
        os.replace(tmp, dst)
        copied += 1
        nbytes += os.path.getsize(dst)
    return copied, nbytes


def replicate_lake(src_lake: str, dst_lake: str, prune: bool = True) -> dict:
    """One incremental sync pass; call repeatedly (e.g. on a cron after
    each ingest epoch) to keep the replica converged.  Holds both job
    locks: the source lock gives a consistent cut (no half-committed epoch
    is ever shipped), the destination lock keeps two replicators from
    racing."""
    cfg = mf.load_lake_config(src_lake)
    if cfg is None:
        raise RuntimeError(f"{src_lake} is not a raydatax lake (no _lake.json)")
    src_lock = mf.acquire_job_lock(src_lake)
    try:
        dst_cfg = mf.load_lake_config(dst_lake)
        if dst_cfg is not None and dst_cfg != cfg:
            raise RuntimeError(
                f"{dst_lake} holds a different lake config than {src_lake} "
                "(partition mapping / mode / hash version differ) — a "
                "replica must start empty or match; refusing to mix lakes"
            )
        dst_lock = mf.acquire_job_lock(dst_lake)
        try:
            if dst_cfg is None:
                mf._atomic_write_json(mf.lake_config_path(dst_lake), cfg)

            src_hist = _history_records(src_lake)
            dst_hist = _history_records(dst_lake)
            changed = {
                k: rec for k, rec in src_hist.items() if dst_hist.get(k) != rec
            }

            # 1. data files for new/changed records, batched per partition
            by_pid: dict[int, list[tuple[str, str]]] = {}
            for (pid, _), rec in changed.items():
                sfile = os.path.join(src_lake, rec["file"])
                if os.path.exists(sfile):  # tombstone records have no file
                    by_pid.setdefault(pid, []).append(
                        (sfile, os.path.join(dst_lake, rec["file"]))
                    )
            copy_stats = ray.get(
                [_copy_files.remote(pairs) for pairs in by_pid.values()]
            )
            files_copied = sum(c for c, _ in copy_stats)
            bytes_copied = sum(b for _, b in copy_stats)

            # 2. history records (each file now present), 3. manifests, and
            # ONLY THEN delete superseded replica files — a record replaced
            # in place (same epoch, new file: a compaction marker) leaves
            # the old file orphaned on dst, but removing it before the
            # manifest flip opens a crash window where the dst manifest
            # still names the deleted file (replica unreadable for
            # manifest-driven consumers until a re-run)
            stale_after_flip: list[str] = []
            for (pid, epoch), rec in changed.items():
                mf._atomic_write_json(mf.history_path(dst_lake, pid, epoch), rec)
                old = dst_hist.get((pid, epoch))
                if old is not None and old["file"] != rec["file"]:
                    stale_after_flip.append(os.path.join(dst_lake, old["file"]))
            src_man = mf.load_manifests(src_lake)
            dst_man = mf.load_manifests(dst_lake)
            parts_updated = 0
            for pid, man in src_man.items():
                if dst_man.get(pid) != man:
                    mf._atomic_write_json(mf.manifest_path(dst_lake, pid), man)
                    parts_updated += 1
            for stale in stale_after_flip:
                if os.path.exists(stale):
                    os.remove(stale)

            # job metadata + lineage (small JSONs; content-compared)
            aux_copied = 0
            for rel in ["_manifests/_job.json"] + sorted(
                os.path.relpath(p, src_lake)
                for p in glob.glob(os.path.join(src_lake, "_metrics", "*.json"))
            ):
                sp, dp = os.path.join(src_lake, rel), os.path.join(dst_lake, rel)
                obj = mf._read_json(sp)
                if obj is not None and mf._read_json(dp) != obj:
                    mf._atomic_write_json(dp, obj)
                    aux_copied += 1

            # 4. mirror upstream deletions (vacuum / compaction cleanup)
            records_removed = files_removed = 0
            if prune:
                for key in set(dst_hist) - set(src_hist):
                    p = mf.history_path(dst_lake, *key)
                    if os.path.exists(p):
                        os.remove(p)
                        records_removed += 1
                # tombstone records name files vacuum already deleted on
                # the source — existence on src, not record membership, is
                # what the replica mirrors
                keep = {
                    rec["file"]
                    for rec in src_hist.values()
                    if os.path.exists(os.path.join(src_lake, rec["file"]))
                } | {man["file"] for man in src_man.values()}
                for f in glob.glob(
                    os.path.join(dst_lake, "data", "part-*", "epoch-*.parquet")
                ):
                    if os.path.relpath(f, dst_lake) not in keep:
                        os.remove(f)
                        files_removed += 1

            return {
                "records_synced": len(changed),
                "files_copied": files_copied,
                "bytes_copied": bytes_copied,
                "partitions_updated": parts_updated,
                "aux_synced": aux_copied,
                "records_removed": records_removed,
                "files_removed": files_removed,
                "noop": not changed and parts_updated == 0,
            }
        finally:
            dst_lock.close()
    finally:
        src_lock.close()
