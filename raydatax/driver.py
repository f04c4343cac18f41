"""Job orchestration: plan → pipeline → two-phase commit → report.

Lifecycle mapping to the reference (SURVEY.md §3):

| DataX phase (JobContainer.java:96-182)     | here                         |
|--------------------------------------------|------------------------------|
| init/prepare                               | load lake config + manifests |
| split (reader.split × writer.split)        | WAL segment plan > watermark |
| schedule/run (TaskGroups of channels)      | one Ray Data pipeline        |
| post — writer first (JobContainer:559-562) | per-partition file rename + manifest flip, then job watermark |
| checkLimit (ErrorRecordChecker)            | dead-letter threshold        |
| hooks / logStatistics                      | _metrics/epoch-N.json        |

The pipeline is Ray-Data-first and streams end-to-end::

    read_parquet(segments, filter=seq>hw)          # prune at the read
      .map_batches(normalize)                      # Arrow schema unification + dirty split
      .map_batches(assign_partitions)              # salted hash on conv_id
      .groupby("__part").map_groups(MergeWorker)   # the ONLY shuffle
      -> tiny lineage rows                         # data goes straight to staged parquet

Merged data is written by the merge workers themselves (deterministic staged
files) — it is never collected on the driver and never re-shuffled; the
driver only sees O(P) lineage rows.  No ``ray.init`` here except in the CLI
``main`` (guarded), per the driver contract.
"""

from __future__ import annotations

import glob
import json
import os
import time

import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from . import manifest as mf
from .merge import MergeWorker, make_normalizer
from .metrics import build_report, format_summary
from .partition import assign_partitions, detect_hot_keys
from .schema import lake_schema_for
from .source import plan_read


def job_state_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_manifests", "_job.json")


def load_job_watermark(lake_dir: str) -> int:
    st = mf._read_json(job_state_path(lake_dir))
    return st["wal_hw"] if st else -1


def _ts_us(v) -> int | None:
    """Parse a window bound: int µs, ISO-8601 string, or datetime."""
    if v is None:
        return None
    import numpy as np

    if isinstance(v, (int, np.integer)):
        return int(v)
    return int(np.datetime64(v, "us").astype(np.int64))


def run_job(
    wal_dir: str,
    lake_dir: str,
    partitions: int = 32,
    salt: int = 4,
    hot_threshold: float = 0.05,
    merge_concurrency: int | None = None,
    error_limit_records: int | None = None,
    error_limit_percentage: float | None = None,
    quiet: bool = True,
    engine: str = "exchange",
    sparse_updates: bool = False,
    pre_handler=None,
    post_hooks: list | None = None,
    start_ts=None,
    end_ts=None,
    hang_timeout_s: float | None = 600.0,
    time_travel_epochs: int | None = None,
    output: str | None = None,
    _crash_after_committing: int | None = None,
) -> dict:
    """Tail the WAL and upsert into the lake.  Idempotent: killing this at
    any point and re-running converges to the same committed state with
    byte-identical partition files (FIXTURES.md F5).

    ``start_ts``/``end_ts`` (int µs, ISO string, or datetime) bound the
    replay to an event-time window [start_ts, end_ts) — the otsstreamreader
    startTime/endTime contract (``/root/reference/otsstreamreader/.../core/
    RecordProcessor.java:186-239``): each windowed run applies only events
    whose ``ts`` falls in the window and checkpoints ``ts_hw = end_ts``.
    A lake is either seq-tailed or ts-windowed — the mode is recorded in
    the job state and mixing raises.  Windowed replay assumes stream-time
    monotonicity ACROSS windows (a later window's events carry later seqs,
    the realistic binlog property); within a window LWW-by-seq handles any
    order.  Null-ts events are dead-lettered in windowed mode.

    ``output`` selects the lake's storage mode at creation (lake-level,
    like P/salt/sparse; a later call passing a different mode raises):
    ``"image"`` (default) keeps the LWW-collapsed latest row per key;
    ``"changelog"`` keeps the FULL ordered change history — every event
    with its op + seq as append-only per-partition epoch files, O(delta)
    per epoch (the otsstreamreader multi-version output mode,
    ``MultiVerModeRecordSender.java:23-28,40-127``).  Read it back with
    :func:`read_changelog`."""
    t0 = time.monotonic()
    ts_lo, ts_hi = _ts_us(start_ts), _ts_us(end_ts)
    windowed = ts_lo is not None or ts_hi is not None
    mode = "window" if windowed else "seq"
    os.makedirs(lake_dir, exist_ok=True)
    _lock = mf.acquire_job_lock(lake_dir)  # one ingest job per lake at a time
    try:
        if pre_handler is not None:  # DataX preHandle (JobContainer.java:312-345)
            pre_handler(dict(wal_dir=wal_dir, lake_dir=lake_dir))

        manifests = mf.load_manifests(lake_dir)
        hws = {pid: m["hw_seq"] for pid, m in manifests.items()}
        base_files = {pid: m["file"] for pid, m in manifests.items()}
        job_state = mf._read_json(job_state_path(lake_dir))
        if job_state is not None and job_state.get("mode", "seq") != mode:
            raise RuntimeError(
                f"lake {lake_dir} was ingested in {job_state.get('mode', 'seq')!r} "
                f"mode; cannot mix with {mode!r} replay"
            )
        cfg_early = mf.load_lake_config(lake_dir)
        if cfg_early is not None:
            # partition-hash mismatch would silently split LWW keys across
            # partitions — hard-stop before any planning (manifest.py)
            mf.check_hash_version(cfg_early, lake_dir)
        if (output is not None and cfg_early is not None
                and output != cfg_early.get("output", "image")):
            raise RuntimeError(
                f"lake {lake_dir} stores {cfg_early.get('output', 'image')!r} "
                f"output; cannot ingest with output={output!r} (storage mode "
                f"is lake-level state)"
            )
        # windowed mode can't prune by the job seq watermark (ts, not seq,
        # defines the frontier); per-partition watermarks still dedupe
        min_hw = -1 if windowed else load_job_watermark(lake_dir)

        plan = plan_read(wal_dir, min_hw, ts_lo, ts_hi)
        plan_info = {
            "segments_read": len(plan.segments),
            "segments_pruned": plan.skipped_segments,
        }
        if not plan.segments:
            report = build_report(0, [], time.monotonic() - t0, plan_info, 0)
            report["action"] = "noop"
            from .util import invoke_hooks

            invoke_hooks(post_hooks, report)
            return report

        # --- epoch resolution: continue an interrupted epoch for the same WAL
        # frontier (same epoch => same deterministic file names => byte-identical
        # resume), else open a new one.
        seg_names = [os.path.basename(p) for p in plan.segments]
        window = [ts_lo, ts_hi] if windowed else None
        prior = mf.find_resumable_plan(lake_dir, seg_names, plan.max_seq, window)
        cfg = mf.load_lake_config(lake_dir)
        if prior is not None and cfg is not None:
            epoch = prior["epoch"]
        else:
            epoch = mf.next_epoch(lake_dir)
            if cfg is None:
                hot = detect_hot_keys(plan.segments, partitions, hot_threshold)
                cfg = mf.init_lake(lake_dir, partitions, salt, hot, sparse_updates,
                                   time_travel_epochs=time_travel_epochs or 0,
                                   output=output or "image")
            plan_doc = {"epoch": epoch, "max_seq": plan.max_seq, "segments": seg_names}
            if window is not None:
                plan_doc["window"] = window
            mf.write_plan(lake_dir, plan_doc)
        P, S, hot_keys = cfg["partitions"], cfg["salt"], cfg["hot_keys"]
        # update semantics are lake-level state: fixed at creation, like P/S
        sparse = bool(cfg.get("sparse_updates", False))
        # mismatch vs an explicit `output` was already rejected by the
        # cfg_early check above (which runs BEFORE the noop early-return)
        out_mode = cfg.get("output", "image")

        lake_schema = lake_schema_for(plan.event_schema)
        deadletter_dir = os.path.join(lake_dir, "_deadletter", f"epoch-{epoch:06d}")

        n_parts_total = mf.total_partitions(cfg)
        if merge_concurrency is None:
            # leave at least half the CPUs to the read/normalize stages — an
            # actor pool that reserves every CPU serializes the pipeline
            import ray as _ray

            cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
            merge_concurrency = max(1, min(16, n_parts_total, cpus // 2))

        if engine == "exchange":
            # fast path: map-side hash exchange + merge actor pool (exchange.py —
            # avoids Ray Data's sort-based groupby shuffle, which needs no sort)
            from .exchange import run_exchange

            lineage = run_exchange(
                plan.segments, min_hw, plan.event_schema, P, S, hot_keys,
                n_parts_total, deadletter_dir, lake_dir, epoch, lake_schema,
                base_files, hws, merge_concurrency, sparse=sparse,
                ts_lo=ts_lo, ts_hi=ts_hi, hang_timeout_s=hang_timeout_s,
                output=out_mode,
            )
        else:
            # Dataset path: identical semantics via groupby().map_groups — kept
            # as the pure-Ray-Data expression of the same plan (and as fallback)
            read_filter = pc.field("seq").is_null() | (pc.field("seq") > min_hw)
            ds = ray.data.read_parquet(
                plan.segments,
                filter=read_filter,
                schema=plan.event_schema,
                file_extensions=["parquet"],
            )
            ds = ds.map_batches(
                make_normalizer(plan.event_schema, deadletter_dir, sparse,
                                require_ts=windowed),
                batch_format="pyarrow",
            )
            if windowed:
                from .merge import window_filter as _wf

                ds = ds.map_batches(
                    lambda b: _wf(b, ts_lo, ts_hi), batch_format="pyarrow"
                )
            ds = ds.map_batches(
                lambda b: assign_partitions(b, P, S, hot_keys), batch_format="pyarrow"
            )
            lineage_ds = ds.groupby("__part").map_groups(
                MergeWorker,
                fn_constructor_kwargs=dict(
                    lake_dir=lake_dir,
                    epoch=epoch,
                    lake_schema=lake_schema,
                    base_files=base_files,
                    high_watermarks=hws,
                    sparse=sparse,
                    output=out_mode,
                ),
                batch_format="pyarrow",
                concurrency=merge_concurrency,
            )
            lineage = lineage_ds.take_all()  # O(P) rows — the only driver materialization

        # --- dirty-record threshold (ErrorRecordChecker parity) BEFORE commit
        dirty_rows = 0
        for p in glob.glob(os.path.join(deadletter_dir, "dirty-*.parquet")):
            dirty_rows += pq.read_metadata(p).num_rows
        if error_limit_records is not None and dirty_rows > error_limit_records:
            raise RuntimeError(
                f"dirty-record limit exceeded: {dirty_rows} > {error_limit_records}; "
                f"job aborted before commit (dead letters under {deadletter_dir})"
            )
        if error_limit_percentage is not None:
            routed = sum(r["events_in"] for r in lineage)
            total = dirty_rows + routed
            pct = dirty_rows / total if total else 0.0
            if pct > error_limit_percentage:
                raise RuntimeError(
                    f"dirty-record percentage exceeded: {pct:.4f} > "
                    f"{error_limit_percentage} ({dirty_rows}/{total}); job aborted"
                )

        # --- phase 2: per-partition atomic commit (writer post before job post)
        committed = 0
        for row in lineage:
            if row["action"] != "write":
                continue
            if _crash_after_committing is not None and committed >= _crash_after_committing:
                # test hook (FIXTURES.md F5): simulate a kill mid-commit — some
                # partitions committed, staging left behind, no job watermark
                raise KeyboardInterrupt("simulated crash mid-commit")
            committed += 1
            counts = {
                "replayed": row["replayed"],
                "ins": row["ins"],
                "upd": row["upd"],
                "del": row["del_"],
                "lww_dropped": row["lww_dropped"],
                "deleted_keys": row["deleted_keys"],
            }
            from .util import retry

            retry(
                lambda r=row: mf.commit_partition(
                    lake_dir, r["partition"], epoch, r["file"], r["hw_seq"],
                    r["rows_out"], counts,
                ),
                times=3,
            )
        # job-level watermark.  Seq mode: ALL events <= plan.max_seq are now
        # applied+committed.  Window mode: the frontier is ts_hw = end_ts
        # (checkpoint-at-boundary); wal_hw records the max APPLIED seq (the
        # segment footer max may include out-of-window events).
        if windowed:
            applied_hw = max((r["hw_seq"] for r in lineage), default=-1)
            prev_wal_hw = job_state.get("wal_hw", -1) if job_state else -1
            prev_ts_hw = job_state.get("ts_hw") if job_state else None
            new_ts_hw = ts_hi if ts_hi is not None else prev_ts_hw
            if prev_ts_hw is not None and new_ts_hw is not None:
                new_ts_hw = max(prev_ts_hw, new_ts_hw)
            state = {"epoch": epoch, "mode": mode,
                     "wal_hw": max(prev_wal_hw, applied_hw), "ts_hw": new_ts_hw}
        else:
            new_hw = plan.max_seq
            if new_hw >= (1 << 62):
                # footer-stats sentinel (a segment without seq statistics
                # widens the plan range to ±2^62): committing it would
                # poison the lake — every future plan would prune ALL
                # segments as "≤ watermark" and appends would be silently
                # ignored forever.  Derive the watermark from the APPLIED
                # events instead (lineage hw_seq), like the windowed branch.
                new_hw = max((r["hw_seq"] for r in lineage), default=-1)
            prev_hw = job_state.get("wal_hw", -1) if job_state else -1
            state = {"epoch": epoch, "mode": mode,
                     "wal_hw": max(prev_hw, new_hw)}
        mf._atomic_write_json(job_state_path(lake_dir), state)
        mf.gc_staging(lake_dir, epoch)
        # drop superseded epoch snapshots beyond the time-travel window —
        # retention is LAKE-LEVEL config (set at creation, every ingest path
        # honors it); an explicit per-call value overrides for this run only
        retain = (time_travel_epochs if time_travel_epochs is not None
                  else int(cfg.get("time_travel_epochs", 0)))
        if out_mode != "changelog":
            # every epoch file IS live history in a changelog lake — the
            # image-mode notion of "superseded snapshot" does not exist there
            mf.vacuum(lake_dir, keep_unreferenced=retain)

        report = build_report(epoch, lineage, time.monotonic() - t0, plan_info, dirty_rows)
        report["action"] = "applied"
        mf._atomic_write_json(
            os.path.join(lake_dir, "_metrics", f"epoch-{epoch:06d}.json"), report
        )
        if not quiet:
            print(format_summary(report))
        from .util import invoke_hooks

        invoke_hooks(post_hooks, report)  # DataX invokeHooks (JobContainer.java:971-975)
        return report


    finally:
        _lock.close()  # flock released on close

# ----------------------------------------------------------- dead letters


def list_deadletters(lake_dir: str, epoch: int | None = None):
    """All dead-lettered (dirty) records, with their epoch — the inspection
    half of the DataX dirty-data story (records diverted instead of failing
    the job; the writer surfaces them for repair)."""
    import re

    import pyarrow as pa

    pat = os.path.join(lake_dir, "_deadletter",
                       f"epoch-{epoch:06d}" if epoch is not None else "epoch-*",
                       "dirty-*.parquet")
    tables = []
    for p in sorted(glob.glob(pat)):
        m = re.search(r"epoch-(\d+)", p)
        t = pq.read_table(p)
        tables.append(t.append_column("__epoch", pa.array([int(m.group(1))] * t.num_rows)))
    if not tables:
        return None
    return pa.concat_tables(tables, promote_options="permissive")


def requeue_deadletters(lake_dir: str, wal_dir: str, repair_fn, epoch: int | None = None,
                        clear: bool = True) -> int:
    """Repair dead-lettered records and append them to the WAL as NEW events
    (fresh seq range past the current WAL maximum — a repair is a new
    version by definition under LWW).  ``repair_fn(table) -> table`` fixes
    the payload; rows it cannot fix may be dropped.  Returns the number of
    requeued events.  The next ``run_job`` applies them like any other
    appended segment.  Records are de-duplicated across epochs first (the
    same bad row re-dead-letters on every epoch that re-reads its segment).
    For a ts-WINDOWED lake the repair must also set ``ts`` inside a window
    that will still be replayed — a repaired ts behind the lake's ``ts_hw``
    is filtered out by the next window and never applied."""
    import numpy as np
    import pyarrow as pa

    from .gen import write_wal
    from .schema import EVENT_SCHEMA, normalize_to
    from .source import discover_segments, segment_seq_range

    bad = list_deadletters(lake_dir, epoch)
    if bad is None or bad.num_rows == 0:
        return 0
    bad = bad.drop_columns(["__epoch"])
    if bad.num_rows > 1:
        # the same record can sit in several epochs' dead-letter dirs
        # (re-read segments re-dead-letter it) — requeue one copy only
        df = bad.to_pandas().drop_duplicates()
        bad = pa.Table.from_pandas(df, schema=bad.schema, preserve_index=False)
    repaired = repair_fn(bad)
    if repaired is None or repaired.num_rows == 0:
        return 0
    segs = discover_segments(wal_dir)
    # same floor rule as expire_rows: requeuing into a WAL dir whose
    # footers trail the lake's applied watermark must not mint stale seqs
    max_seq = max(
        max((segment_seq_range(p)[1] for p in segs), default=-1),
        load_job_watermark(lake_dir),
    )
    fresh = pa.array(np.arange(max_seq + 1, max_seq + 1 + repaired.num_rows), pa.int64())
    repaired = repaired.set_column(
        repaired.schema.get_field_index("seq"), "seq", fresh
    )
    repaired = normalize_to(repaired, EVENT_SCHEMA)
    # max index + 1, never the count — a WAL with gaps (e.g. a crashed
    # parallel expire sweep) must not have live segments overwritten
    existing = max(
        (int(os.path.basename(p)[4:-8]) for p in segs), default=-1
    ) + 1
    # write_wal numbers from 0, which would collide with the live log —
    # stage in a scratch dir, then move after the current tail
    stage = os.path.join(wal_dir, "_requeue")
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    new_paths = write_wal(repaired, stage, seg_rows=max(repaired.num_rows, 1))
    for k, p in enumerate(new_paths):
        os.replace(p, os.path.join(wal_dir, f"seg-{existing + k:05d}.parquet"))
    shutil.rmtree(stage, ignore_errors=True)
    if clear:
        pat = os.path.join(lake_dir, "_deadletter",
                           f"epoch-{epoch:06d}" if epoch is not None else "epoch-*")
        import shutil

        for d in glob.glob(pat):
            shutil.rmtree(d)
    return repaired.num_rows


@ray.remote
def _block_rows(t) -> int:
    return t.num_rows


@ray.remote
def _expire_segment(block, seq0: int, path: str, event_ts_us) -> int:
    """Build one WAL segment of tombstones from one block of expired keys
    and write it atomically (tmp + rename)."""
    import numpy as np
    import pyarrow as pa

    from .schema import EVENT_SCHEMA, normalize_to

    pa.set_cpu_count(1)
    n = block.num_rows
    ts = (
        block["ts"]
        if event_ts_us is None
        else pa.array(
            np.full(n, event_ts_us, dtype=np.int64), pa.timestamp("us")
        )
    )
    ev = pa.table(
        {
            "seq": pa.array(np.arange(seq0, seq0 + n, dtype=np.int64)),
            "op": pa.nulls(n, pa.string()).fill_null("D"),
            "conv_id": block["conv_id"],
            "turn_idx": block["turn_idx"],
            "ts": ts,
        }
    )
    ev = normalize_to(ev, EVENT_SCHEMA)
    tmp = path + ".tmp"
    pq.write_table(ev, tmp, compression="zstd", row_group_size=65536)
    os.replace(tmp, path)
    return n


def expire_rows(
    lake_dir: str,
    wal_dir: str,
    older_than,
    event_ts=None,
    dry_run: bool = False,
) -> dict:
    """TTL / retention sweep as FIRST-CLASS CDC: scan the lake for live rows
    with ``ts < older_than`` (column-pruned, predicate-pushdown read — only
    the key columns + ts leave storage) and append tombstone (``D``) events
    for them to the WAL.  The deletes then flow through the NORMAL ingest
    path (``run_job``) — exactly-once, byte-identical resume, per-partition
    lineage — instead of mutating committed files in place, the same
    discipline the OTS writer's DeleteRow ops follow in the reference
    (``/root/reference/otswriter/.../OtsWriterSlaveProxy.java``).

    Convergent-idempotent: a crash mid-append leaves some tombstone
    segments behind; duplicate deletes for a key are harmless under LWW,
    and a re-run after apply finds only the still-live remainder.

    ``event_ts`` pins the tombstones' event time (int µs / ISO / datetime).
    Default: each tombstone carries its expired row's own ``ts`` —
    deterministic, but BEHIND a ts-windowed lake's frontier, where the
    next window would filter the deletes out; windowed lakes must pass an
    in-window ``event_ts``.  Seq-tailed lakes (the default mode) need no
    care here.  Fresh seqs continue past the WAL's current maximum, the
    ``requeue_deadletters`` convention."""
    import pyarrow.dataset as pads

    from .source import discover_segments, segment_seq_range

    cfg = mf.load_lake_config(lake_dir)
    if cfg is None:
        raise FileNotFoundError(f"no lake at {lake_dir}")
    if cfg.get("output", "image") == "changelog":
        raise RuntimeError(
            f"{lake_dir} is a changelog lake — every version is live history "
            f"there; bound reads with read_changelog(at_epoch=) or compact "
            f"instead of expiring"
        )
    cutoff = _ts_us(older_than)
    if cutoff is None:
        raise ValueError(f"unparseable cutoff: {older_than!r}")
    ev_us = _ts_us(event_ts) if event_ts is not None else None
    state = mf._read_json(job_state_path(lake_dir))
    if state is not None and state.get("mode") == "window":
        # a windowed lake replays only events inside future windows — a
        # tombstone carrying the expired row's OLD ts (the default) sits
        # behind ts_hw and would never be applied.  Fail loudly instead.
        ts_hw = state.get("ts_hw")
        if ev_us is None or (ts_hw is not None and ev_us < ts_hw):
            raise ValueError(
                f"{lake_dir} is ts-windowed (ts_hw={ts_hw}): pass an "
                f"event_ts at or past the frontier so the next window "
                f"actually replays the tombstones"
            )

    import pyarrow as pa

    expr = pads.field("ts") < pa.scalar(cutoff, pa.timestamp("us"))
    ds = read_lake(lake_dir, columns=["conv_id", "turn_idx", "ts"], filter=expr)
    refs = ds.to_arrow_refs()
    counts = ray.get([_block_rows.remote(r) for r in refs])
    total = int(sum(counts))
    report = {"expired_keys": total, "cutoff_us": cutoff, "segments": 0,
              "dry_run": dry_run}
    if dry_run or total == 0:
        return report

    segs = discover_segments(wal_dir)
    # floor at BOTH the WAL's footer max and the lake's applied watermark:
    # expiring into a fresh/empty WAL dir must not mint seqs at 0 — the
    # replay filter (seq > hw) would silently skip the deletes as stale
    seq0 = max(
        max((segment_seq_range(p)[1] for p in segs), default=-1),
        load_job_watermark(lake_dir),
    ) + 1
    # name from MAX existing index + 1, never the count: a crash between
    # parallel segment writes leaves gaps (..5 written, 6 missing, 7
    # written), and a count-based rerun would os.replace an existing —
    # possibly already APPLIED — segment, destroying the WAL's only
    # record of those deletes for any from-scratch replay
    next_seg = max(
        (int(os.path.basename(p)[4:-8]) for p in segs), default=-1
    ) + 1
    os.makedirs(wal_dir, exist_ok=True)
    writes = []
    k = 0
    for r, c in zip(refs, counts):
        if c == 0:
            continue
        path = os.path.join(wal_dir, f"seg-{next_seg + k:05d}.parquet")
        writes.append(_expire_segment.remote(r, seq0, path, ev_us))
        seq0 += c
        k += 1
    ray.get(writes)
    report["segments"] = k
    report["seq_range"] = [seq0 - total, seq0 - 1]
    return report


# ------------------------------------------------------------- lake readers


def read_lake(
    lake_dir: str,
    at_epoch: int | None = None,
    columns: list[str] | None = None,
    filter=None,
) -> "ray.data.Dataset":
    """Committed table state as a streaming Dataset (partition-major,
    key-sorted within partitions — the stable output order; note Ray's
    streaming executor preserves that BLOCK order for a consumer only
    under ``DataContext.execution_options.preserve_order`` — aggregate /
    join / write consumers don't care, ordered iteration does).
    ``at_epoch``
    time-travels to the snapshot as of that epoch (retained per the lake's
    ``time_travel_epochs`` config, set at creation via
    ``run_job(time_travel_epochs=N)`` on the first apply).

    ``columns`` / ``filter`` (a pyarrow dataset expression) push straight
    into the parquet scan — only the requested columns / row groups leave
    storage, the same prune-at-the-read discipline the reference's readers
    apply via their SQL ``column``/``where`` config
    (`/root/reference/plugin-rdbms-util/.../SingleTableSplitUtil.java:39`).
    When both are given, the filter's fields must be among ``columns``
    (project them, then drop with ``.select_columns``)."""
    cfg = mf.load_lake_config(lake_dir)
    if cfg is not None and cfg.get("output", "image") == "changelog":
        raise RuntimeError(
            f"{lake_dir} is a changelog lake (append-only history) — use "
            f"read_changelog(); its latest manifest alone is one epoch's delta"
        )
    files = mf.committed_files(lake_dir, at_epoch)
    if not files:
        raise FileNotFoundError(f"no committed partitions under {lake_dir}")
    return _read_pruned(files, columns, filter)


def _read_pruned(files: list[str], columns, filter) -> "ray.data.Dataset":
    # Ray binds the filter against the schema it is given, and with a
    # column projection the given schema must match the projected output —
    # so when BOTH are passed, the filter's fields must appear in
    # ``columns`` (project them, then ``.select_columns`` the rest away)
    schema = _unified_schema(files)
    kw = {}
    if columns is not None:
        import pyarrow as pa

        schema = pa.schema([schema.field(c) for c in columns])
        kw["columns"] = list(columns)
    if filter is not None:
        kw["filter"] = filter
    return ray.data.read_parquet(files, schema=schema, **kw)


def _unified_schema(files: list[str]):
    """Widened union schema across committed files (footers only).  Files
    from different epochs can differ — a partition that received no events
    since an early epoch keeps its narrow schema (int32 turn_idx, missing
    later columns), and changelog epochs are permanent by design — so reads
    must promote, never downcast to whichever file happens to come last."""
    import pyarrow as pa

    return pa.unify_schemas(
        [pq.read_schema(f) for f in files], promote_options="permissive"
    )


def _unified_concat(files: list[str]):
    import pyarrow as pa

    tables = [t for t in (pq.read_table(f) for f in files) if t.num_rows]
    if not tables:
        return None
    return pa.concat_tables(tables, promote_options="permissive")


def read_changelog(
    lake_dir: str,
    at_epoch: int | None = None,
    columns: list[str] | None = None,
    filter=None,
) -> "ray.data.Dataset":
    """Full committed change history of a ``output="changelog"`` lake as a
    streaming Dataset: every event with its op + seq, partition-major, then
    epoch-ascending, key-seq-sorted within each epoch file.  A total
    per-key replay order needs only a per-key seq sort downstream (epochs
    already commit in seq order).  ``at_epoch`` bounds the log.
    ``columns``/``filter`` push into the parquet scan (see read_lake)."""
    cfg = mf.load_lake_config(lake_dir)
    if cfg is None:
        raise FileNotFoundError(f"no lake at {lake_dir}")
    if cfg.get("output", "image") != "changelog":
        raise RuntimeError(
            f"{lake_dir} is an image lake — read_changelog applies only to "
            f"lakes created with run_job(output='changelog')"
        )
    files = mf.changelog_files(lake_dir, at_epoch)
    if not files:
        raise FileNotFoundError(f"no committed changelog epochs under {lake_dir}")
    return _read_pruned(files, columns, filter)


def changelog_table(lake_dir: str, at_epoch: int | None = None):
    """Small-scale helper (tests): the whole change history as one
    pyarrow.Table in deterministic (partition, epoch, key, seq) order,
    promoted onto the widened union schema across epochs."""
    return _unified_concat(mf.changelog_files(lake_dir, at_epoch))


def lake_table(lake_dir: str, at_epoch: int | None = None):
    """Small-scale helper (tests): whole table as one pyarrow.Table in
    deterministic partition-major order, promoted onto the widened union
    schema (a partition that received no events since an early epoch still
    carries that epoch's narrower schema)."""
    cfg = mf.load_lake_config(lake_dir)
    if cfg is not None and cfg.get("output", "image") == "changelog":
        raise RuntimeError(
            f"{lake_dir} is a changelog lake — use changelog_table(); the "
            f"latest manifests alone are one epoch's delta"
        )
    return _unified_concat(mf.committed_files(lake_dir, at_epoch))


# --------------------------------------------------------- snapshot diff


def _diff_plan(
    lake_dir: str, from_epoch: int, to_epoch: int | None = None
) -> list[tuple[int, str | None, str]]:
    """Changed-partition plan for ``lake_diff``: ``(pid, old_file|None,
    new_file)`` for every partition whose committed file DIFFERS between the
    two snapshots.  A partition whose manifest is unchanged contributed no
    winning event in the interval, so it is skipped without opening it —
    the diff's read cost is ∝ changed partitions, not ∝ table size (the
    same work-∝-delta discipline as the incremental view refresh)."""
    if to_epoch is not None and to_epoch < from_epoch:
        raise ValueError(
            f"to_epoch {to_epoch} < from_epoch {from_epoch} — a reversed "
            f"interval would silently invert every insert/delete label; "
            f"swap the arguments"
        )
    old = mf.snapshot_manifests(lake_dir, from_epoch)
    new = (
        mf.load_manifests(lake_dir)
        if to_epoch is None
        else mf.snapshot_manifests(lake_dir, to_epoch)
    )
    gone = set(old) - set(new)
    if gone:
        raise RuntimeError(
            f"partitions {sorted(gone)} committed at epoch {from_epoch} are "
            f"absent at the target snapshot — manifests only ever gain "
            f"partitions; is to_epoch earlier than from_epoch?"
        )
    plan: list[tuple[int, str | None, str]] = []
    for pid in sorted(new):
        nm, om = new[pid], old.get(pid)
        if om is not None and om["file"] == nm["file"]:
            continue
        plan.append(
            (
                pid,
                os.path.join(lake_dir, om["file"]) if om is not None else None,
                os.path.join(lake_dir, nm["file"]),
            )
        )
    return plan


def diff_snapshot_tables(old, new, base_schema) -> "object":
    """The pure snapshot-diff kernel over two (single-partition) live-row
    tables, both conformed to ``base_schema``.  Classification is by the
    row's ``seq`` version: the LWW invariant makes equal seq ⇒ identical
    row, so unchanged rows never pay a payload comparison.  Output carries
    ``_op`` ∈ insert / update / delete — the NEW image for insert/update,
    the final OLD image for delete — key-sorted."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .schema import KEY_COLUMNS

    keys = list(KEY_COLUMNS)
    out_schema = pa.schema(list(base_schema) + [pa.field("_op", pa.string())])

    def _with_op(t: pa.Table, op: str) -> pa.Table:
        return t.append_column(
            "_op", pa.array(np.full(t.num_rows, op, dtype=object), pa.string())
        )

    if old is None or old.num_rows == 0:
        out = _with_op(new, "insert") if new is not None else None
    elif new is None or new.num_rows == 0:
        out = _with_op(old, "delete")
    else:
        ok = old.select(keys + ["seq"]).append_column(
            "__i", pa.array(np.arange(old.num_rows, dtype=np.int64))
        )
        nk = new.select(keys + ["seq"]).append_column(
            "__i", pa.array(np.arange(new.num_rows, dtype=np.int64))
        )
        j = ok.join(
            nk, keys=keys, join_type="full outer",
            left_suffix="_o", right_suffix="_n",
        )
        so, sn = j["seq_o"], j["seq_n"]
        ins = pc.is_null(so)
        dele = pc.is_null(sn)
        upd = pc.and_(
            pc.and_(pc.is_valid(so), pc.is_valid(sn)), pc.not_equal(so, sn)
        )
        parts = []
        for mask, src, tag, icol in (
            (ins, new, "insert", "__i_n"),
            (upd, new, "update", "__i_n"),
            (dele, old, "delete", "__i_o"),
        ):
            take = j.filter(mask)[icol]
            if len(take):
                parts.append(_with_op(src.take(take), tag))
        out = pa.concat_tables(parts) if parts else None
    if out is None or out.num_rows == 0:
        return out_schema.empty_table()
    return out.sort_by([(k, "ascending") for k in keys])


@ray.remote
def _diff_partition(old_file: str | None, new_file: str, schema) -> "object":
    """Diff ONE partition's two committed snapshot files.  Keys never move
    between partitions (partition mapping is lake-lifetime state — see
    ``_lake.json``/``check_hash_version``), so the per-partition pairwise
    diff is exact with NO shuffle."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .schema import normalize_to

    pa.set_cpu_count(1)
    base = pa.schema([f for f in schema if f.name != "_op"])

    def _load(f):
        return normalize_to(pq.read_table(f), base) if f is not None else None

    return diff_snapshot_tables(_load(old_file), _load(new_file), base)


def lake_diff(
    lake_dir: str, from_epoch: int, to_epoch: int | None = None
) -> "ray.data.Dataset":
    """Change feed between two committed snapshots of an image lake (a
    Delta-CDF-style ``table_changes``): one row per key whose live image
    changed in ``(from_epoch, to_epoch]``, as ``_op`` ∈ insert / update /
    delete plus the row image — the NEW image for insert/update, the final
    pre-delete OLD image for delete.  Computed FROM the snapshots (manifest
    history retained per ``time_travel_epochs``), so it works even after
    the interval's WAL segments are gone — the read-side complement of
    ``read_changelog`` for image lakes.

    Scale shape: partition mapping is lake-lifetime stable, so a key can
    never move between partitions and the diff decomposes into independent
    per-partition pairwise joins — ONE Ray task per *changed* partition,
    zero shuffle, and partitions untouched in the interval are skipped
    without opening them (``_diff_plan``).  Mirrors the reference's
    otsstreamreader change-capture read surface
    (``/root/reference/otsstreamreader/.../core/RecordProcessor.java``)
    recast as a snapshot differencing primitive."""
    import pyarrow as pa

    cfg = mf.load_lake_config(lake_dir)
    if cfg is None:
        raise FileNotFoundError(f"no lake at {lake_dir}")
    if cfg.get("output", "image") == "changelog":
        raise RuntimeError(
            f"{lake_dir} is a changelog lake — its epoch files ARE the "
            f"change feed; use read_changelog(at_epoch=) to bound it"
        )
    plan = _diff_plan(lake_dir, from_epoch, to_epoch)
    if not plan:
        files = mf.committed_files(lake_dir, to_epoch)
        base = _unified_schema(files)
        schema = pa.schema(list(base) + [pa.field("_op", pa.string())])
        return ray.data.from_arrow(schema.empty_table())
    files = [f for _, o, n in plan for f in (o, n) if f is not None]
    base = _unified_schema(files)
    schema = pa.schema(list(base) + [pa.field("_op", pa.string())])
    return ray.data.from_arrow_refs(
        [_diff_partition.remote(o, n, schema) for _, o, n in plan]
    )


def compact_changelog(
    lake_dir: str,
    upto_epoch: int | None = None,
    min_files: int = 1,
    min_delta_ratio: float = 0.0,
) -> dict:
    """Offline maintenance for ``output="changelog"`` lakes: merge each
    partition's epoch files ≤ ``upto_epoch`` (default: its newest commit)
    into ONE key-seq-sorted file — the log-segment compaction a micro-batch
    cadence needs (1-minute epochs = 1440 files/partition/day; at 100 TB
    the small-file count, not the bytes, is what kills the reader).

    Runs under the lake's job lock (never concurrent with ingest).  Crash-
    safe and idempotent: the merged file atomically REPLACES the newest
    epoch's file (same path), its history record gains ``compacted_upto``,
    and only then are superseded records/files deleted — readers skip
    records below a partition's compaction horizon even if their files
    still (or no longer) exist, so every intermediate state is readable
    and a re-run completes the cleanup.  Events are unique by ``seq`` and
    the sort is total, so the merged file is deterministic (same
    PARQUET_OPTS as the ingest path).  Time travel below the horizon
    raises loudly.

    **Amortized cost policy** (``min_files`` / ``min_delta_ratio``): a
    compaction rewrites a partition's full retained history, so calling it
    after every micro-batch makes total write volume quadratic in the log
    length.  ``min_delta_ratio=r`` skips partitions whose uncompacted delta
    bytes are below ``r x`` the compacted base's bytes — the classic
    geometric (size-tiered) major-compaction trigger: each row is rewritten
    only ``O(log_{1+r} N)`` times over the lake's lifetime, and a
    compaction pass touches only partitions that actually accumulated
    delta (work ∝ delta, like the ingest path).  ``min_files`` skips
    partitions with fewer UNCOMPACTED epoch files regardless of bytes
    (the compacted base does not count — it is the fold target, not
    pending delta); a partition always needs ≥2 live records total to
    have anything to merge.  Defaults (1, 0.0) preserve the
    always-compact behavior; steady-state
    micro-batch deployments should run ``min_delta_ratio=0.5`` (or so) on
    a cron.  Mirrors size-tiered policy of LSM stores rather than DataX
    (which has no persistent state to compact); the per-shard horizon
    bookkeeping follows otsstreamreader's checkpoint locality
    (`otsstreamreader/.../model/ShardCheckpoint.java:8-118`)."""
    import pyarrow as pa

    from .merge import PARQUET_OPTS, sort_key_seq

    cfg = mf.load_lake_config(lake_dir)
    if cfg is None or cfg.get("output", "image") != "changelog":
        raise RuntimeError(f"{lake_dir} is not a changelog lake")
    lock = mf.acquire_job_lock(lake_dir)
    try:
        by_part: dict[int, list[dict]] = {}
        rec_paths: dict[tuple[int, int], str] = {}
        for p, m in mf.iter_history_records(lake_dir):
            if m is not None:
                by_part.setdefault(m["partition"], []).append(m)
                rec_paths[(m["partition"], m["epoch"])] = p
        compacted, files_removed, skipped = 0, 0, 0
        manifests = mf.load_manifests(lake_dir)

        # per-partition merge work (read → concat → sort → write) runs as
        # Ray tasks — a 100-TB lake has thousands of partitions and the
        # driver must only sequence commits, never hold partition data
        @ray.remote
        def _merge_partition(paths: list[str], final: str) -> tuple[int, int]:
            merged = pa.concat_tables(
                [pq.read_table(f) for f in paths], promote_options="permissive"
            )
            merged, _ = sort_key_seq(merged)
            tmp = final + ".tmp"
            pq.write_table(merged.replace_schema_metadata(None), tmp, **PARQUET_OPTS)
            os.replace(tmp, final)
            return int(merged.num_rows), os.path.getsize(final)

        plans = []  # (pid, live, target, final, merge_ref)
        for pid in sorted(by_part):
            recs = sorted(by_part[pid], key=lambda m: m["epoch"])
            horizon = max((m["epoch"] for m in recs if m.get("compacted_upto")),
                          default=-1)
            # finish any interrupted cleanup first: records (and files)
            # below an existing horizon are superseded leftovers from a
            # crash between the commit point and the deletes
            for m in recs:
                if m["epoch"] < horizon:
                    f = os.path.join(lake_dir, m["file"])
                    if os.path.exists(f):
                        os.remove(f)
                        files_removed += 1
                    rp = rec_paths.get((pid, m["epoch"]))
                    if rp and os.path.exists(rp):
                        os.remove(rp)
            # crash-window repair for the HORIZON epoch itself: a crash
            # after the commit point (its record now names the -c file)
            # but before cleanup leaves the epoch's pre-compaction delta
            # file orphaned and the latest-manifest mirror stale — neither
            # is below the horizon, so the loop above never touches them
            base = next((m for m in recs
                         if m["epoch"] == horizon and m.get("compacted_upto")),
                        None)
            if base is not None:
                old_delta = os.path.join(
                    lake_dir, "data", f"part-{pid:05d}",
                    f"epoch-{base['epoch']:06d}.parquet",
                )
                if (os.path.relpath(old_delta, lake_dir) != base["file"]
                        and os.path.exists(old_delta)):
                    os.remove(old_delta)
                    files_removed += 1
                latest = manifests.get(pid)
                if (latest is not None and latest["epoch"] == base["epoch"]
                        and latest.get("file") != base["file"]):
                    latest.update(file=base["file"], rows=base["rows"],
                                  bytes=base["bytes"])
                    mf._atomic_write_json(mf.manifest_path(lake_dir, pid), latest)
            live = [m for m in recs if m["epoch"] >= horizon]
            if upto_epoch is not None:
                live = [m for m in live if m["epoch"] <= upto_epoch]
            # min_files counts UNCOMPACTED epoch files, as documented: the
            # compacted base (the record carrying the horizon marker) is
            # not one of them — counting it fired one delta early on every
            # previously-compacted partition
            uncompacted = sum(1 for m in live if not m.get("compacted_upto"))
            if len(live) < 2 or uncompacted < min_files:
                skipped += 1
                continue
            # geometric trigger: live[0] is the compacted base iff it
            # carries the horizon marker (a never-compacted partition has
            # base_bytes 0 and always qualifies)
            if min_delta_ratio > 0.0 and live[0].get("compacted_upto"):
                delta_bytes = sum(int(m.get("bytes", 0)) for m in live[1:])
                if delta_bytes < min_delta_ratio * int(live[0].get("bytes", 0)):
                    skipped += 1
                    continue
            target = live[-1]
            paths = [os.path.join(lake_dir, m["file"]) for m in live]
            # the merged file gets a NEW deterministic name; the single
            # atomic history-record write below is the commit point (a
            # crash before it leaves the old records authoritative, a crash
            # after it leaves the marker authoritative — never both)
            final = os.path.join(
                lake_dir, "data", f"part-{pid:05d}",
                f"epoch-{target['epoch']:06d}-c.parquet",
            )
            plans.append((pid, live, target, final,
                          _merge_partition.remote(paths, final)))

        for pid, live, target, final, ref in plans:
            rows, nbytes = ray.get(ref)
            new_rec = dict(target)
            new_rec["file"] = os.path.relpath(final, lake_dir)
            new_rec["rows"] = rows
            new_rec["bytes"] = nbytes
            new_rec["compacted_upto"] = target["epoch"]
            mf._atomic_write_json(
                mf.history_path(lake_dir, pid, target["epoch"]), new_rec
            )  # ← commit point
            # latest manifest mirrors the newest epoch's record
            latest = manifests.get(pid)
            if latest is not None and latest["epoch"] == target["epoch"]:
                latest.update(file=new_rec["file"], rows=new_rec["rows"],
                              bytes=new_rec["bytes"])
                mf._atomic_write_json(mf.manifest_path(lake_dir, pid), latest)
            # cleanup LAST: superseded files (incl. the target epoch's old
            # delta file), then the superseded records
            for m in live:
                f = os.path.join(lake_dir, m["file"])
                if f != final and os.path.exists(f):
                    os.remove(f)
                    files_removed += 1
                if m is not target:
                    rp = rec_paths.get((pid, m["epoch"]))
                    if rp and os.path.exists(rp):
                        os.remove(rp)
            # stray merged files from a crash BEFORE a commit point (their
            # record was never written) are unreferenced — sweep them
            for f in glob.glob(os.path.join(
                    lake_dir, "data", f"part-{pid:05d}", "epoch-*-c.parquet")):
                if f != final:
                    os.remove(f)
                    files_removed += 1
            compacted += 1
        return {
            "partitions_compacted": compacted,
            "files_removed": files_removed,
            "partitions_skipped": skipped,
        }
    finally:
        lock.close()


@ray.remote
def _export_wal_segment(
    src: str, dst: str, add_op: bool, fill_seq: int | None = None
) -> int:
    """Shared insert-WAL export task (repartition + bootstrap): one
    parquet file → one deterministic WAL segment.  ``add_op`` stamps every
    row as an INSERT (dropping any pre-existing op column — a snapshot's
    op is not an event op); ``fill_seq`` backfills a missing seq column
    (the consistent-snapshot position)."""
    import pyarrow as pa

    from .merge import PARQUET_OPTS
    from .schema import EVENT_SCHEMA

    t = pq.read_table(src)
    if fill_seq is not None and "seq" not in t.column_names:
        t = t.append_column("seq", pa.array([fill_seq] * t.num_rows, pa.int64()))
    if add_op:
        if "op" in t.column_names:
            t = t.drop_columns(["op"])
        t = t.append_column("op", pa.array(["I"] * t.num_rows, pa.string()))
    # canonical columns in EVENT_SCHEMA order, then any schema-EVOLVED
    # extras (evolve_event_schema keeps them and committed lake files
    # carry them — dropping extras here would silently lose that data on
    # the repartition/bootstrap migration path)
    canon = [f.name for f in EVENT_SCHEMA if f.name in t.column_names]
    extras = [c for c in t.column_names if c not in canon]
    names = canon + extras
    tmp = dst + ".tmp"
    pq.write_table(t.select(names).replace_schema_metadata(None), tmp, **PARQUET_OPTS)
    os.replace(tmp, dst)
    return t.num_rows


def repartition_lake(
    old_lake: str,
    new_lake: str,
    partitions: int,
    salt: int = 4,
    keep_bootstrap_wal: bool = False,
    **job_kwargs,
) -> dict:
    """Offline re-partitioning maintenance job — the documented answer to
    "P and salt are fixed at lake creation".  The committed table IS a
    valid event log (rows retain their winning ``seq``), so repartitioning
    is a bootstrap replay through the normal engine: export each committed
    file as an insert-event WAL segment (one Ray task per file, driver
    never holds rows), ``run_job`` it into the new lake with the new
    partition count/salt (hot keys re-detected on the new mapping), then
    carry the OLD job watermark forward — correct because every event in
    (image max seq, old hw] is already reflected in the image (its key's
    winner has a ≥ seq or was deleted), so a subsequent tail applies only
    genuinely new events and replays of that range would be idempotent
    anyway.  Changelog lakes re-bucket their FULL event history (ops and
    seqs preserved); the epoch structure collapses to one bootstrap epoch,
    which only renumbers history records — the event multiset and per-key
    order are unchanged."""
    cfg = mf.load_lake_config(old_lake)
    if cfg is None:
        raise FileNotFoundError(f"no lake at {old_lake}")
    if mf.load_lake_config(new_lake) is not None:
        raise RuntimeError(f"target lake already exists: {new_lake}")
    old_state = mf._read_json(job_state_path(old_lake))
    changelog = cfg.get("output", "image") == "changelog"
    files = (mf.changelog_files(old_lake) if changelog
             else mf.committed_files(old_lake))
    if not files:
        raise FileNotFoundError(f"no committed partitions under {old_lake}")

    wal = os.path.join(new_lake, "_bootstrap_wal")
    # a crashed earlier attempt may have left segments from a DIFFERENT
    # old-lake state (e.g. pre-compaction file count) under deterministic
    # names — stale leftovers would be replayed alongside the fresh export
    import shutil

    shutil.rmtree(wal, ignore_errors=True)
    os.makedirs(wal, exist_ok=True)

    refs = [
        _export_wal_segment.remote(
            src, os.path.join(wal, f"seg-{i:05d}.parquet"), not changelog
        )
        for i, src in enumerate(files)
    ]
    exported = sum(ray.get(refs))

    report = run_job(
        wal, new_lake, partitions=partitions, salt=salt,
        output=cfg.get("output"), sparse_updates=cfg.get("sparse_updates", False),
        **job_kwargs,
    )
    # carry the old watermark (and window mode) so the next tail resumes
    # exactly where the old lake stopped; keep the new lake's own epoch
    if old_state is not None:
        new_state = mf._read_json(job_state_path(new_lake)) or {}
        carried = dict(old_state)
        carried["epoch"] = new_state.get("epoch", carried.get("epoch", 0))
        carried["wal_hw"] = max(
            int(old_state.get("wal_hw", -1)), int(new_state.get("wal_hw", -1))
        )
        mf._atomic_write_json(job_state_path(new_lake), carried)
    if not keep_bootstrap_wal:
        shutil.rmtree(wal, ignore_errors=True)
    report["events_exported"] = exported
    return report


def bootstrap_lake(
    snapshot_path: str,
    lake_dir: str,
    snapshot_seq: int,
    partitions: int = 64,
    salt: int = 4,
    keep_bootstrap_wal: bool = False,
    **job_kwargs,
) -> dict:
    """Initial FULL LOAD at a log position + incremental tail — the classic
    CDC bootstrap (DataX full sync then otsstreamreader incremental;
    MySQL 'consistent snapshot at binlog position X, replay from X').

    ``snapshot_path`` is a parquet file or directory of transcript rows
    (the lake row shape, ``seq`` optional) captured consistently at WAL
    position ``snapshot_seq``.  Every row becomes an INSERT event — rows
    that carry a ``seq`` keep it (higher fidelity LWW), rows without get
    ``snapshot_seq`` (a consistent snapshot holds ONE row per key, so the
    shared seq never competes within a key) — exported as WAL segments by
    parallel Ray tasks (the driver never holds rows) and replayed through
    the NORMAL engine into a fresh lake.  The job watermark lands at
    ``snapshot_seq``, so a subsequent :func:`run_job` / :func:`tail_wal`
    on the live WAL replays exactly the events after the snapshot
    position (reference: full-sync job + ShardCheckpoint start position,
    otsstreamreader/../StreamJob lifecycle)."""
    import glob as _glob
    import shutil

    wal = os.path.join(lake_dir, "_bootstrap_wal")
    marker = os.path.join(lake_dir, "_bootstrap_in_progress")
    params = {
        "snapshot_path": os.path.abspath(snapshot_path),
        "snapshot_seq": int(snapshot_seq),
        "partitions": int(partitions),
        "salt": int(salt),
    }
    # a dedicated in-progress marker (NOT the WAL dir, which the caller may
    # keep): lake-exists + marker = an interrupted bootstrap — resume it
    # (export is deterministic, run_job is idempotent); lake-exists without
    # the marker = a completed lake, refuse.  A resume must re-run with the
    # SAME parameters — a different snapshot/seq/mapping replayed over the
    # partially committed epoch would silently mix two bootstraps
    if mf.load_lake_config(lake_dir) is not None:
        prior = mf._read_json(marker)
        if prior is None:
            raise RuntimeError(f"target lake already exists: {lake_dir}")
        if prior != params:
            raise RuntimeError(
                f"interrupted bootstrap at {lake_dir} used different "
                f"parameters {prior} — resume with the same ones or remove "
                f"the lake"
            )
    files = (
        sorted(_glob.glob(os.path.join(snapshot_path, "*.parquet")))
        if os.path.isdir(snapshot_path)
        else [snapshot_path]
    )
    if not files:
        raise FileNotFoundError(f"no snapshot parquet under {snapshot_path}")

    os.makedirs(lake_dir, exist_ok=True)
    mf._atomic_write_json(marker, params)
    shutil.rmtree(wal, ignore_errors=True)  # stale crashed-attempt exports
    os.makedirs(wal, exist_ok=True)

    refs = [
        _export_wal_segment.remote(
            src, os.path.join(wal, f"seg-{i:05d}.parquet"),
            add_op=True, fill_seq=snapshot_seq,
        )
        for i, src in enumerate(files)
    ]
    exported = sum(ray.get(refs))

    report = run_job(wal, lake_dir, partitions=partitions, salt=salt, **job_kwargs)

    # the watermark must sit exactly at the snapshot position: rows that
    # carried their true (lower) seqs would otherwise leave wal_hw short
    # and the first tail would re-apply pre-snapshot events
    state = mf._read_json(job_state_path(lake_dir)) or {}
    state["wal_hw"] = max(int(state.get("wal_hw", -1)), int(snapshot_seq))
    mf._atomic_write_json(job_state_path(lake_dir), state)

    if not keep_bootstrap_wal:
        shutil.rmtree(wal, ignore_errors=True)
    os.remove(marker)
    report["events_exported"] = exported
    report["snapshot_seq"] = snapshot_seq
    return report


def lake_info(lake_dir: str) -> dict:
    """Lake inspection: config, per-partition rows/bytes/watermarks, totals
    — the operational 'describe table' surface."""
    cfg = mf.load_lake_config(lake_dir)
    if cfg is None:
        raise FileNotFoundError(f"no lake at {lake_dir}")
    manifests = mf.load_manifests(lake_dir)
    parts = [
        {"partition": pid, "epoch": m["epoch"], "rows": m["rows"],
         "bytes": m["bytes"], "hw_seq": m["hw_seq"]}
        for pid, m in sorted(manifests.items())
    ]
    info = {
        "config": cfg,
        "partitions_committed": len(parts),
        "rows_total": sum(p["rows"] for p in parts),
        "bytes_total": sum(p["bytes"] for p in parts),
        "job_watermark": load_job_watermark(lake_dir),
        "partitions": parts,
    }
    if cfg.get("output", "image") == "changelog":
        # every epoch file is live history: totals come from the full log,
        # not just each partition's newest commit
        files = mf.changelog_files(lake_dir)
        info["rows_total"] = sum(pq.read_metadata(f).num_rows for f in files)
        info["bytes_total"] = sum(os.path.getsize(f) for f in files)
        info["changelog_files"] = len(files)
    return info


def lookup_conversation(lake_dir: str, conv_id: str):
    """Point lookup with partition pruning: hash the key to its partition
    (same salted mapping as ingest), read ONE partition file with a parquet
    row filter — the lake-side analogue of OTS GetRow.  Returns a
    pyarrow.Table of the conversation's turns in turn order."""
    import numpy as np
    import pyarrow.compute as pc

    from .partition import hash_strings

    cfg = mf.load_lake_config(lake_dir)
    if cfg is None:
        raise FileNotFoundError(f"no lake at {lake_dir}")
    # pruning below recomputes the ingest-time hash — a mismatched build
    # would read the wrong partition and miss the conversation entirely
    mf.check_hash_version(cfg, lake_dir)
    manifests = mf.load_manifests(lake_dir)
    P, S, hot = cfg["partitions"], cfg["salt"], cfg["hot_keys"]
    if conv_id in hot:
        pids = [P + hot.index(conv_id) * S + s for s in range(S)]  # all salt slots
    else:
        h = hash_strings(np.array([conv_id], dtype=object))[0]
        pids = [int(h % np.uint64(P))]
    if cfg.get("output", "image") == "changelog":
        # point lookup over a changelog lake = the conversation's FULL
        # version history: every epoch file of its partition(s), in
        # (turn, seq) order — partition pruning applies identically
        tags = {f"part-{pid:05d}" for pid in pids}
        files = [f for f in mf.changelog_files(lake_dir)
                 if os.path.basename(os.path.dirname(f)) in tags]
    else:
        files = [os.path.join(lake_dir, manifests[pid]["file"])
                 for pid in pids if pid in manifests]
    tables = [
        pq.read_table(f, filters=[("conv_id", "==", conv_id)]) for f in files
    ]
    tables = [t for t in tables if t.num_rows]
    import pyarrow as pa

    if not tables:
        return None
    out = pa.concat_tables(tables, promote_options="permissive")
    return out.sort_by([("turn_idx", "ascending"), ("seq", "ascending")])


def _lake_max_ts_us(lake_dir: str) -> int | None:
    """Max event-time across the committed snapshot, from parquet FOOTER
    stats only (O(files) metadata reads, no data scan).  None when any
    file lacks trustworthy ts stats — callers must then skip, never
    guess."""
    from .source import segment_ts_range

    mx = None
    for f in mf.committed_files(lake_dir):
        lo, hi = segment_ts_range(f)
        if hi >= (1 << 62):
            return None
        mx = hi if mx is None else max(mx, hi)
    return mx


def _stream_ttl_sweep(
    lake_dir: str, wal_dir: str, span_us: int, **job_kwargs
) -> dict:
    """One stream-time retention sweep: expire rows older than (lake max
    event-time − span) and apply the tombstones.  Shared by ``tail_wal``
    and the driver CLI so the two paths cannot diverge.  A lake whose
    committed files lack trustworthy ts footer stats cannot derive a
    cutoff — that is reported as ``{"skipped": ...}``, never silently."""
    mx = _lake_max_ts_us(lake_dir)
    if mx is None:
        return {"skipped": "no trustworthy ts footer stats; cannot derive "
                           "a stream-time cutoff", "expired_keys": 0}
    exp = expire_rows(lake_dir, wal_dir, older_than=mx - span_us)
    if exp["expired_keys"]:
        exp["applied_deletes"] = run_job(wal_dir, lake_dir, **job_kwargs)[
            "deletes"
        ]
    return exp


def tail_wal(
    wal_dir: str,
    lake_dir: str,
    poll_interval_s: float = 1.0,
    idle_polls_to_stop: int = 2,
    view_dir: str | None = None,
    retain_ts_span_us: int | None = None,
    **job_kwargs,
) -> list[dict]:
    """Kafka-reader-style tail loop (``/root/reference/kafkareader/.../
    KafkaReader.java:202-241``: poll → apply → commit offset): repeatedly
    apply newly appended WAL segments; each applied epoch commits its
    watermark (the offset-commit analogue).  Stops after
    ``idle_polls_to_stop`` consecutive empty polls (the reference runs to a
    midnight deadline; a library can't block forever).

    ``view_dir`` keeps a materialized summary view continuously fresh:
    after every applied epoch the view refreshes incrementally (only the
    partitions that epoch touched — ``view.refresh_view``), the streaming
    IVM loop; each report gains a ``view`` sub-dict.

    ``retain_ts_span_us`` enforces a STREAM-TIME retention window: after
    each applied epoch, rows older than (lake max event-time − span) are
    expired through the normal ingest path (``expire_rows`` → immediate
    apply).  The cutoff derives from footer stats — deterministic, no
    wall clock, no data scan — so replays of the same WAL produce the
    same retention decisions.  Seq-tailed lakes only (a ts-windowed
    lake's expire raises, demanding an explicit in-window event_ts).

    SEQ-SPACE CONTRACT: the WAL dir is one total-ordered log — every
    appender (the producer, ``requeue_deadletters``, this sweep) must
    mint seqs above the dir's current maximum, which the sweep does.  A
    producer with an INDEPENDENT seq namespace (e.g. upstream binlog
    positions) must not share a WAL dir with the sweep: the tombstones
    would occupy the producer's future positions and its later events
    would be skipped as stale.  For such sources run ``maintenance
    expire`` offline between producer batches instead."""
    reports = []
    idle = 0
    while idle < idle_polls_to_stop:
        rep = run_job(wal_dir, lake_dir, **job_kwargs)
        # windowed jobs re-map in-window segments on every run (min_hw=-1)
        # and report 'applied' even when every merge skipped — count a poll
        # with zero replayed events as IDLE or the tail busy-spins forever,
        # minting an epoch + metrics file per iteration
        if rep["action"] == "applied" and rep.get("events_replayed", 0) > 0:
            if retain_ts_span_us is not None:
                rep["ttl"] = _stream_ttl_sweep(
                    lake_dir, wal_dir, retain_ts_span_us, **job_kwargs
                )
            if view_dir is not None:
                from .view import refresh_view

                rep["view"] = refresh_view(lake_dir, view_dir)
            reports.append(rep)
            idle = 0
        else:
            idle += 1
            if idle < idle_polls_to_stop:
                time.sleep(poll_interval_s)
    return reports


def main(argv: list[str] | None = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description="raydatax CDC ingest driver")
    ap.add_argument("--wal", required=True)
    ap.add_argument("--lake", required=True)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--salt", type=int, default=4)
    ap.add_argument("--concurrency", type=int, default=None)
    ap.add_argument("--error-limit", type=int, default=None)
    ap.add_argument("--start-ts", default=None, help="window start (ISO or µs)")
    ap.add_argument("--end-ts", default=None, help="window end (ISO or µs)")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--refresh-view", default=None, metavar="VIEW_DIR",
                    help="after the apply, refresh the materialized "
                         "conversation-summary view at this path")
    ap.add_argument("--retain-span-us", type=int, default=None,
                    help="stream-time TTL: after the apply, expire rows "
                         "older than (lake max event-time − span) through "
                         "the normal ingest path and apply the deletes")
    args = ap.parse_args(argv)

    import ray

    owned = False
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
        owned = True
    try:
        report = run_job(
            args.wal,
            args.lake,
            partitions=args.partitions,
            salt=args.salt,
            merge_concurrency=args.concurrency,
            error_limit_records=args.error_limit,
            start_ts=int(args.start_ts) if args.start_ts and args.start_ts.isdigit() else args.start_ts,
            end_ts=int(args.end_ts) if args.end_ts and args.end_ts.isdigit() else args.end_ts,
            quiet=False,
        )
        print(json.dumps({k: v for k, v in report.items() if k != "per_partition"}))
        if args.retain_span_us is not None and report["action"] == "applied":
            print(json.dumps({"ttl": _stream_ttl_sweep(
                args.lake, args.wal, args.retain_span_us, quiet=True
            )}))
        if args.refresh_view:
            from .view import refresh_view

            print(json.dumps({"view": refresh_view(args.lake, args.refresh_view)}))
        return 0
    finally:
        if owned:
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())


def run_multi_table_job(
    src_wal: str,
    base_dir: str,
    table_col: str = "table",
    partitions: int = 8,
    time_travel_epochs: int | None = None,
    _crash_after_tables: int | None = None,
    **job_kw,
) -> dict:
    """One tagged CDC stream → N lakes in one call: demux the stream once
    (source.demux_wal — read once, routed per-table WALs under
    ``base_dir/wal/<table>``, resumable), then the normal exactly-once
    ingest per table into ``base_dir/lake/<table>``.  Re-running resumes
    both halves: the demux skips recorded segments, each ingest tails from
    its own watermark.  Returns ``{"tables": {name: report}, "demux": ...,
    "snapshot": ...}`` — the reference needs one DataX job per table, each
    re-reading the source (job JSON per table); here routing cost is paid
    once.

    **Cross-table consistency.**  Every cycle ingests ALL tables to the
    SAME source boundary (demux routes whole source segments, each table
    then applies its full routed WAL), and only after the LAST table
    commits does ``base_dir/_snapshot.json`` flip (tmp+rename) to record
    the per-table (epoch, watermark) set that together represent ONE
    source watermark — mirroring the job-level shared endTime checkpoint
    all shards commit in the reference's stream reader
    (/root/reference/otsstreamreader/.../core/RecordProcessor.java:186-239).
    A crash between two tables' commits leaves the snapshot at the
    PREVIOUS cycle, so :func:`read_consistent` never observes table A at
    source-seq W+k while B sits at W; the rerun finishes the remaining
    tables (their siblings no-op on their watermarks) and flips the
    snapshot once.  The per-table lakes default to ``time_travel_epochs=1``
    here (overridable) because the previous consistent epoch must stay
    readable while a new cycle is mid-flight."""
    import os as _os
    import signal as _signal

    from . import manifest as mf
    from .source import demux_wal

    routed = demux_wal(src_wal, _os.path.join(base_dir, "wal"), table_col)
    reports = {}
    pinned: dict[str, dict] = {}
    for i, (name, wal_dir) in enumerate(sorted(routed["tables"].items())):
        if _crash_after_tables is not None and i >= _crash_after_tables:
            _os.kill(_os.getpid(), _signal.SIGKILL)  # test hook: hard kill
        lake_dir = _os.path.join(base_dir, "lake", name)
        reports[name] = run_job(
            wal_dir, lake_dir, partitions=partitions,
            time_travel_epochs=(1 if time_travel_epochs is None
                                else time_travel_epochs),
            **job_kw,
        )
        mans = mf.load_manifests(lake_dir)
        pinned[name] = {
            "lake": _os.path.relpath(lake_dir, base_dir),
            "epoch": max((m["epoch"] for m in mans.values()), default=0),
            "watermark": max((m["hw_seq"] for m in mans.values()), default=-1),
        }
    snap_path = _os.path.join(base_dir, "_snapshot.json")
    prev = mf._read_json(snap_path) or {}
    snapshot = {
        "cycle": int(prev.get("cycle", 0)) + 1,
        "source_segments": routed["segments_routed"],
        "source_horizon": max(
            (p["watermark"] for p in pinned.values()), default=-1
        ),
        "tables": pinned,
    }
    mf._atomic_write_json(snap_path, snapshot)
    return {"demux": routed, "tables": reports, "snapshot": snapshot}


def read_consistent(
    base_dir: str,
    columns: list[str] | None = None,
) -> dict:
    """Cross-table-consistent reads over a :func:`run_multi_table_job`
    output tree: every table comes back PINNED at the epoch recorded by
    the last fully-committed cycle's ``_snapshot.json`` — never the mixed
    state a crash mid-cycle leaves in the live manifests.  Returns
    ``{"tables": {name: Dataset}, "cycle": n, "source_horizon": seq}``.
    Raises FileNotFoundError before the first complete cycle."""
    import os as _os

    from . import manifest as mf

    snap = mf._read_json(_os.path.join(base_dir, "_snapshot.json"))
    if snap is None:
        raise FileNotFoundError(
            f"read_consistent: {base_dir} has no _snapshot.json — no "
            "multi-table cycle has fully committed yet"
        )
    tables = {
        name: read_lake(
            _os.path.join(base_dir, p["lake"]), at_epoch=int(p["epoch"]),
            columns=columns,
        )
        for name, p in snap["tables"].items()
    }
    return {
        "tables": tables,
        "cycle": snap["cycle"],
        "source_horizon": snap["source_horizon"],
    }
