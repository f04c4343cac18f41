"""Map-side hash exchange for the merge shuffle (the fast path).

Why raw Ray here: the only wide operation in the engine is "co-locate all
events of a (salted) key partition".  Ray Data's ``groupby`` implements that
as a full SORT shuffle — measured on this node at 2M text-heavy events it
spends ~58s of a 62s job in Sort (SortReduce ≈ 47k rows/s); the alpha
``hash_shuffle`` strategy stalls outright.  A hash partition does not need
any ordering, so this module implements the classic two-stage exchange
directly on Ray core — the one place the Dataset API genuinely can't
express the semantics we need efficiently (per the build guidelines):

- **map stage** (stateless tasks, one per WAL segment): read → normalize
  (Arrow schema unification + dead-letter split) → salted hash partition →
  split the block into P sub-tables (one ``take`` + ``slice`` views) →
  return them as P separate object refs (``num_returns=P``) so the object
  store holds per-partition shards;
- **merge stage** (stateful ACTOR POOL, ``MergeActor``): each actor pulls
  (pid, shard refs) work items, zero-copy-reads the shards, and runs the
  shared rebase-LWW kernel (:func:`raydatax.merge.merge_partition_tables`).

Partitioning assumption (documented per guidelines): a partition's events
for one epoch plus its base partition file must fit one worker's heap —
choose ``partitions`` so (epoch volume / P) ≈ 100-500 MB.  Shard count is
S·P objects (S = segments); both stages stream through the object store
and spill under pressure, exactly like a Dataset shuffle, minus the sort.

Fault tolerance: map and merge are pure functions of their inputs, and the
staged-file sink is deterministic + idempotent, so Ray task retries are
safe (the reference's failover story, ``/root/reference/core/.../taskgroup/
TaskGroupContainer.java:162-241``, comes for free).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from .merge import make_normalizer, merge_partition_tables, window_filter
from .partition import assign_partitions


class StageStalledError(RuntimeError):
    """A stage made no progress within the hang timeout (the engine-side
    TaskMonitor: DataX expires a task after a no-progress interval,
    ``/root/reference/core/.../taskgroup/TaskMonitor.java:61-94``)."""


def wait_with_watchdog(
    refs: list, stage: str, hang_timeout_s: float | None, poll_s: float = 5.0
) -> list:
    """ray.wait/ray.get with no-progress detection: completions are polled;
    if NO new task finishes within ``hang_timeout_s`` the stage raises
    :class:`StageStalledError` with a progress snapshot instead of blocking
    forever (Ray retries cover crashed workers; the watchdog covers silent
    hangs — deadlocked I/O, lost connections, livelock).  "No progress"
    means NOTHING completed in the window — size the timeout above the
    largest expected single task (a huge hot partition's merge counts as
    one task); pass ``run_job(hang_timeout_s=None)`` to disable."""
    import time

    if hang_timeout_s is None:
        ray.wait(refs, num_returns=len(refs), fetch_local=False)
        return refs
    pending = list(refs)
    done_n = 0
    last_progress = time.monotonic()
    while pending:
        done, pending = ray.wait(
            pending, num_returns=len(pending), timeout=poll_s, fetch_local=False
        )
        now = time.monotonic()
        if done:
            done_n += len(done)
            last_progress = now
        elif now - last_progress > hang_timeout_s:
            raise StageStalledError(
                f"{stage} stage stalled: {done_n}/{len(refs)} tasks done, "
                f"no progress for {now - last_progress:.0f}s"
            )
    return refs


def split_by_partition(batch: pa.Table, n_parts: int, part_col: str = "__part") -> list[pa.Table]:
    """Split one Arrow block into per-partition sub-tables: one stable
    argsort on the small int partition column + boundary slices (views into
    one contiguous take — no per-partition filtering passes)."""
    part = batch.column(part_col).to_numpy(zero_copy_only=False)
    order = np.argsort(part, kind="stable")
    sorted_tab = batch.take(pa.array(order)).drop_columns([part_col])
    sorted_part = part[order]
    bounds = np.searchsorted(sorted_part, np.arange(n_parts + 1))
    return [
        sorted_tab.slice(bounds[p], bounds[p + 1] - bounds[p]) for p in range(n_parts)
    ]


def _retain_pages() -> None:
    """Keep jemalloc's freed pages resident in this worker process instead
    of decaying them back to the OS: the replay hot path allocates and
    frees data-sized Arrow buffers on every shard, and on this host
    re-provisioning a returned page is the single most expensive thing a
    worker can do (fresh-page first touch caps at ~0.03–1.5 GB/s in the
    degraded hypervisor windows while already-resident pages stream at
    200+ GB/s — tools/membw_probe.py).  Retention is bounded by one
    task's peak working set per worker, which map-chunk sizing already
    caps.  No-op when jemalloc isn't the active pool."""
    try:
        pa.jemalloc_set_decay_ms(-1)
    except Exception:
        pass


def _encode_shard(tab: pa.Table) -> "bytes | pa.Buffer":
    """Shuffle compression: the exchange moves zstd-compressed Arrow IPC
    bytes, not raw Arrow — ~3-4x less object-store / network traffic for
    transcript text at the cost of cheap extra CPU.  IPC was measured 1.6x
    cheaper to encode and 6x cheaper to decode than zstd-parquet shards for
    only ~20% more bytes (shards are small; parquet's writer setup + column
    indexes dominate at that size).  On a multi-node cluster this is what
    you want for the cross-node exchange; on this sandbox it moves the
    workload off the memory-bandwidth wall back to the (plentiful) cores.

    Returns the IPC stream as a pa.Buffer, NOT bytes: Ray pickles Arrow
    buffers with out-of-band (pickle-5) data, so the shard lands in the
    object store with ONE copy — `.to_pybytes()` here cost a full extra
    heap copy per shard (fresh pages, see :func:`_retain_pages`) before
    Ray copied it again."""
    if tab.num_rows == 0:
        return b""
    sink = pa.BufferOutputStream()
    opts = pa.ipc.IpcWriteOptions(compression="zstd")
    with pa.ipc.new_stream(sink, tab.schema, options=opts) as w:
        w.write_table(tab, max_chunksize=1 << 20)
    return sink.getvalue()


def _decode_shard(buf: "bytes | pa.Buffer", schema: pa.Schema) -> pa.Table:
    if not buf:
        return schema.empty_table()
    return pa.ipc.open_stream(pa.BufferReader(buf)).read_all()


@ray.remote
def map_segment(
    path: str,
    row_groups: list[int] | None,
    min_hw: int,
    event_schema: pa.Schema,
    partitions: int,
    salt: int,
    hot_keys: list[str],
    n_parts_total: int,
    deadletter_dir: str | None,
    sparse: bool = False,
    ts_lo: int | None = None,
    ts_hi: int | None = None,
) -> list[pa.Table]:
    """Map stage: (segment, row-group subset) → normalized, partition-split
    shards.  Row-group granularity keeps map parallelism ≫ segment count.
    ``ts_lo``/``ts_hi`` (µs) bound the replay to an event-time window
    (otsstreamreader startTime/endTime); the window filter runs AFTER the
    normalizer so null-ts rows dead-letter instead of silently vanishing."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    # each worker gets 1 logical CPU — don't let Arrow's internal pool
    # oversubscribe the node (N workers × all-cores pools thrash badly)
    pa.set_cpu_count(1)
    _retain_pages()  # reuse freed pages across the tasks this worker runs
    windowed = ts_lo is not None or ts_hi is not None
    f = pq.ParquetFile(path)
    tab = f.read_row_groups(row_groups) if row_groups is not None else f.read()
    if min_hw >= 0 and "seq" in tab.column_names:
        keep = pc.or_kleene(pc.is_null(tab["seq"]), pc.greater(tab["seq"], min_hw))
        tab = tab.filter(pc.fill_null(keep, True))
    tab = make_normalizer(event_schema, deadletter_dir, sparse, require_ts=windowed)(tab)
    if windowed:
        tab = window_filter(tab, ts_lo, ts_hi)
    tab = assign_partitions(tab, partitions, salt, hot_keys)
    shards = [_encode_shard(t) for t in split_by_partition(tab, n_parts_total)]
    # with num_returns=1 Ray hands the caller ONE ref to the return value
    # itself (it never unpacks a 1-element list), so the single-partition
    # case must return the bare shard for the ref to resolve to bytes
    return shards if n_parts_total > 1 else shards[0]


def plan_map_chunks(segments: list[str], target_rows: int = 262_144) -> list[tuple[str, list[int] | None]]:
    """Split segments into map-task chunks of ~target_rows using parquet
    footers only (the DataX reader split analogue — one task per slice)."""
    import pyarrow.parquet as pq

    chunks: list[tuple[str, list[int] | None]] = []
    for path in segments:
        md = pq.read_metadata(path)
        n_rg = md.num_row_groups
        if n_rg <= 1:
            chunks.append((path, None))
            continue
        cur: list[int] = []
        cur_rows = 0
        for rg in range(n_rg):
            cur.append(rg)
            cur_rows += md.row_group(rg).num_rows
            if cur_rows >= target_rows:
                chunks.append((path, cur))
                cur, cur_rows = [], 0
        if cur:
            chunks.append((path, cur))
    return chunks


@ray.remote(num_cpus=0)
class WriteGate:
    """Async token actor bounding CONCURRENT staged-file writes across the
    merge pool.  Rationale (measured, BENCH/BASELINE.md): 32 merge actors
    staging ~1.3 GB together cross the kernel dirty-page threshold and the
    epoch serializes on disk writeback (47–50 s vs 15.5 s on tmpfs, same
    binary); ≤8 gated writers with in-token fsync stream the same bytes
    without the cliff while the other actors keep merging.

    Multi-node: the cliff is PER-NODE (each node's dirty-page pool and
    disk), so permits are tracked per ``node_id`` — one semaphore per
    node inside the single gate actor.  Scaling one global budget by the
    node count (the earlier approximation) did NOT bound per-node
    writers: Ray can pack most num_cpus=0 merge actors of a skewed epoch
    onto one node, hand it most of the global tokens, and recreate the
    cliff there.  Keying by the caller's node keeps the budget local no
    matter how the pool is placed; a single metadata-sized actor hop per
    STAGED FILE (not per batch) stays negligible at any scale."""

    def __init__(self, permits_per_node: int):
        self._permits = max(1, permits_per_node)
        self._sems: dict = {}

    async def acquire(self, node_id: str = "") -> bool:
        import asyncio

        sem = self._sems.get(node_id)
        if sem is None:
            sem = self._sems[node_id] = asyncio.Semaphore(self._permits)
        await sem.acquire()
        return True

    async def release(self, node_id: str = "") -> bool:
        self._sems[node_id].release()
        return True


@ray.remote
class MergeActor:
    """Stateful merge worker: one actor handles many partitions serially,
    holding the job-constant state (lake dir, epoch, schema, manifest maps)
    once instead of per task."""

    def __init__(
        self,
        lake_dir: str,
        epoch: int,
        lake_schema: pa.Schema,
        event_schema: pa.Schema,
        base_files: dict[int, str],
        high_watermarks: dict[int, int],
        sparse: bool = False,
        output: str = "image",
        write_gate=None,
    ):
        pa.set_cpu_count(1)  # see map_segment: avoid N×all-cores Arrow pools
        _retain_pages()  # reuse freed pages across this actor's partitions
        self.sparse = sparse
        self.output = output
        self.lake_dir = lake_dir
        self.epoch = epoch
        self.lake_schema = lake_schema
        self.event_schema = event_schema
        self.base_files = base_files
        self.hws = high_watermarks
        self.write_gate = write_gate

    def merge(self, pid: int, *shards: bytes) -> dict:
        return merge_partition_tables(
            pid,
            [_decode_shard(s, self.event_schema) for s in shards],
            self.lake_dir,
            self.epoch,
            self.lake_schema,
            self.base_files.get(pid),
            self.hws.get(pid, -1),
            sparse=self.sparse,
            output=self.output,
            write_gate=self.write_gate,
        )


def run_exchange(
    segments: list[str],
    min_hw: int,
    event_schema: pa.Schema,
    partitions: int,
    salt: int,
    hot_keys: list[str],
    n_parts_total: int,
    deadletter_dir: str | None,
    lake_dir: str,
    epoch: int,
    lake_schema: pa.Schema,
    base_files: dict[int, str],
    high_watermarks: dict[int, int],
    merge_concurrency: int,
    sparse: bool = False,
    ts_lo: int | None = None,
    ts_hi: int | None = None,
    hang_timeout_s: float | None = 600.0,
    output: str = "image",
) -> list[dict]:
    """Drive the two stages; returns lineage rows (one per touched
    partition).  Partitions that received zero events are merged too when
    they have uncommitted watermark state to repair, otherwise skipped."""
    chunks = plan_map_chunks(segments)
    shard_refs: list[list[ray.ObjectRef]] = [
        map_segment.options(num_returns=n_parts_total).remote(
            path, rgs, min_hw, event_schema, partitions, salt, hot_keys,
            n_parts_total, deadletter_dir, sparse, ts_lo, ts_hi,
        )
        for path, rgs in chunks
    ]
    if n_parts_total == 1:
        # num_returns=1 gives one bare ref (resolving to the single shard's
        # bytes — see map_segment's tail); normalize to the list-of-refs
        # shape the merge fan-out expects
        shard_refs = [[r] if not isinstance(r, list) else r for r in shard_refs]

    # a partition's merge needs shards from EVERY map task, so the merge
    # phase starts at the map barrier anyway — spawn the actors NOW with
    # num_cpus=0 so their process startup + imports overlap the map stage
    # without reserving CPUs away from it (merges only run post-barrier,
    # when the CPUs are free again)
    #
    # the gate only matters when enough writers run to hit the measured
    # dirty-page cliff; below that it's one extra RPC per partition.
    # RAYDATAX_WRITE_GATE_PERMITS overrides (0 disables) — the A/B knob
    # behind the numbers in BENCH/BASELINE.md.
    permits = int(os.environ.get("RAYDATAX_WRITE_GATE_PERMITS", "8"))
    # permits are PER NODE inside the gate (semaphore keyed by the
    # caller's node id) — no node-count scaling needed or wanted
    write_gate = (
        WriteGate.remote(permits)
        if permits > 0 and max(1, merge_concurrency) > permits
        else None
    )
    actors = [
        MergeActor.options(num_cpus=0).remote(
            lake_dir, epoch, lake_schema, event_schema, base_files,
            high_watermarks, sparse, output, write_gate,
        )
        for _ in range(max(1, merge_concurrency))
    ]
    try:
        flat = [r for refs in shard_refs for r in refs]
        wait_with_watchdog(flat, "map", hang_timeout_s)
        lineage_refs = []
        for pid in range(n_parts_total):
            shards = [refs[pid] for refs in shard_refs]
            actor = actors[pid % len(actors)]
            lineage_refs.append(actor.merge.remote(pid, *shards))
        wait_with_watchdog(lineage_refs, "merge", hang_timeout_s)
        lineage = ray.get(lineage_refs)
    finally:
        for a in actors:  # never leak the pool, watchdog abort included
            ray.kill(a)
        if write_gate is not None:
            ray.kill(write_gate)
    # drop no-op lineage for partitions that had no events at all
    return [r for r in lineage if r["events_in"] > 0 or r["action"] == "write"]
