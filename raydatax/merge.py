"""Normalize/validate stage + per-partition LWW merge workers.

The merge is a **rebase**: for each partition, (committed base rows ∪ new
events with ``seq > high_watermark``) → last-writer-wins by ``seq`` per
``(conv_id, turn_idx)`` → live rows (winning op != D), sorted by key →
staged Parquet.  Rebase makes replays idempotent (the exactly-once story)
and keeps delete semantics correct across restarts without a separate
tombstone store (SURVEY.md §7.4): base rows carry their ``seq``, so a stale
replayed event simply loses.

This is the engine-side generalization of the reference's upsert writers —
MySQL ``INSERT ... ON DUPLICATE KEY UPDATE`` (``/root/reference/
plugin-rdbms-util/.../writer/util/WriterUtil.java:113-146``) and OTS
PUT/UPDATE/DELETE_ROW (``/root/reference/otswriter/.../model/OTSOpType.
java:4-6``) — except the "target system" is our own Parquet lake, so the
merge must be associative/commutative (LWW by total-ordered seq is both).

Everything on the hot path is vectorized: Arrow ``sort_by`` + numpy
group-boundary masks; no per-row Python.
"""

from __future__ import annotations

import hashlib
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .schema import OPS, normalize_to

# Deterministic parquet knobs: byte-identical resume requires fixed
# compression + row-group size + no wall-clock metadata.
PARQUET_OPTS = dict(compression="zstd", compression_level=3, row_group_size=131072)

# fdatasync (data + size, skips inode-timestamp writeback) where the OS has
# it; plain fsync elsewhere (macOS Python builds lack fdatasync)
_datasync = getattr(os, "fdatasync", os.fsync)


def _write_staged(out: pa.Table, path: str, write_gate=None) -> None:
    """Stage one partition file (tmp + atomic replace).  ``write_gate`` is
    an optional token actor bounding CONCURRENT staged writes: measured on
    the bench host, 32 merge writers staging ~1.3 GB together cross the
    kernel's dirty-page threshold and serialize on the disk (47-50 s vs
    15.5 s with the lake on tmpfs, identical binary).  While gated, the
    file is fsync'd INSIDE the token so the bound applies to dirty pages,
    not just open file handles — writeback streams instead of bursting.
    A size-based opt-out was considered and rejected: the cliff case and
    the fine case differ only ~2× in file size here, so any compression-
    estimated threshold lands between them by luck; the measured A/B
    (BENCH/BASELINE.md) shows gating costs ≤ noise below the cliff.
    File bytes are identical either way (byte-identical resume holds)."""
    import ray as _ray

    tmp = path + ".tmp"
    if write_gate is not None:
        # the gate budgets dirty pages PER NODE — identify ours so a
        # skew-packed pool on one node still respects that node's budget
        node = _ray.get_runtime_context().get_node_id()
        _ray.get(write_gate.acquire.remote(node))
        try:
            with open(tmp, "wb") as f:
                pq.write_table(out, f, **PARQUET_OPTS)
                f.flush()
                _datasync(f.fileno())
        finally:
            write_gate.release.remote(node)
    else:
        # flush here too: the manifest that will reference this file is
        # fsync'd, so an unflushed data file could survive a power loss as
        # a durable manifest pointing at truncated parquet.  fdatasync, not
        # fsync: a fresh tmp file's durability needs its data + size (both
        # flushed by fdatasync); the inode timestamps fsync adds buy nothing
        # here and cost an extra journal write per partition file
        with open(tmp, "wb") as f:
            pq.write_table(out, f, **PARQUET_OPTS)
            f.flush()
            _datasync(f.fileno())
    os.replace(tmp, path)

LINEAGE_SCHEMA = pa.schema(
    [
        ("partition", pa.int32()),
        ("action", pa.string()),  # write | skip
        ("events_in", pa.int64()),      # events routed to this partition
        ("replayed", pa.int64()),       # events with seq > high-watermark
        ("ins", pa.int64()),
        ("upd", pa.int64()),
        ("del_", pa.int64()),
        ("base_rows", pa.int64()),
        ("lww_dropped", pa.int64()),    # stale versions superseded by LWW
        ("deleted_keys", pa.int64()),   # keys whose winning op is D
        ("rows_out", pa.int64()),
        ("hw_seq", pa.int64()),
        ("bytes_out", pa.int64()),
        ("wall_ms", pa.int64()),
        ("file", pa.string()),
    ]
)


def window_filter(tab: pa.Table, ts_lo: int | None, ts_hi: int | None) -> pa.Table:
    """Keep rows with event time in [ts_lo, ts_hi) µs, null ts dropped —
    THE window semantics of time-bounded replay, shared by both engines
    (exchange.map_segment and the dataset path) so a boundary or
    null-handling change can never diverge between them."""
    if (ts_lo is None and ts_hi is None) or tab.num_rows == 0:
        return tab
    keep = None
    if ts_lo is not None:
        keep = pc.greater_equal(tab["ts"], pa.scalar(ts_lo, pa.timestamp("us")))
    if ts_hi is not None:
        hi_m = pc.less(tab["ts"], pa.scalar(ts_hi, pa.timestamp("us")))
        keep = hi_m if keep is None else pc.and_(keep, hi_m)
    return tab.filter(pc.fill_null(keep, False))


def make_normalizer(event_schema: pa.Schema, deadletter_dir: str | None,
                    sparse: bool = False, require_ts: bool = False):
    """Stateless map_batches fn: unify each batch onto the evolved event
    schema (adds missing columns as nulls, widens ints — the Arrow
    schema-unification step), then split off dirty rows.

    Dirty-record policy mirrors DataX: a bad record never fails the batch, it
    is diverted to a dead-letter store with a reason column
    (``/root/reference/core/.../exchanger/TransformerExchanger.java:53-127``;
    dirty threshold check at job end like ``ErrorRecordChecker.java:18-82``).
    Dead-letter file names are content hashes → replays are idempotent.
    """

    def normalize(batch: pa.Table) -> pa.Table:
        batch = normalize_to(batch, event_schema)
        valid = pc.and_kleene(
            pc.and_kleene(pc.is_valid(batch["seq"]), pc.is_valid(batch["conv_id"])),
            pc.and_kleene(
                pc.is_valid(batch["turn_idx"]),
                pc.is_in(batch["op"], value_set=pa.array(OPS)),
            ),
        )
        # I must carry a row image (text+role); D rows may be all-null; in
        # sparse mode U rows carry only changed fields (any may be null)
        exempt = pc.equal(batch["op"], "D")
        if sparse:
            exempt = pc.or_kleene(exempt, pc.equal(batch["op"], "U"))
        has_payload = pc.or_kleene(
            exempt,
            pc.and_kleene(pc.is_valid(batch["text"]), pc.is_valid(batch["role"])),
        )
        if require_ts:
            # time-bounded replay can only window events that carry an event
            # time — a null ts is a dirty record there, not a silent drop
            valid = pc.and_kleene(valid, pc.is_valid(batch["ts"]))
        ok = pc.fill_null(pc.and_kleene(valid, has_payload), False)
        if pc.all(ok).as_py():
            return batch
        bad = batch.filter(pc.invert(ok))
        if deadletter_dir is not None and bad.num_rows:
            os.makedirs(deadletter_dir, exist_ok=True)
            sink = pa.BufferOutputStream()
            pq.write_table(bad.replace_schema_metadata(None), sink, **PARQUET_OPTS)
            buf = sink.getvalue()
            name = hashlib.sha1(buf.to_pybytes()).hexdigest()[:16]
            path = os.path.join(deadletter_dir, f"dirty-{name}.parquet")
            if not os.path.exists(path):
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(buf.to_pybytes())
                os.replace(tmp, path)
        return batch.filter(ok)

    return normalize


PAYLOAD_COLUMNS_EXCLUDED = ("conv_id", "turn_idx", "seq", "op")


def sort_key_seq(combined: pa.Table) -> tuple[pa.Table, np.ndarray]:
    """Sort by (conv_id, turn_idx, seq) via an INTEGER rank of conv_id
    instead of the string itself: the distinct conversations per partition
    are few relative to events, so dictionary-encode (one pass),
    lexicographically rank the (small) dictionary, and run a pure-integer
    3-key sort — measured several times cheaper than the string-led sort on
    transcript-sized partitions, with an identical resulting order (Arrow
    string ordering is bytewise).  Returns the sorted table plus the
    key-change mask ``neq`` (row i+1 starts a new (conv, turn) group)."""
    combined = combined.combine_chunks()
    conv = combined.column("conv_id")
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.chunk(0)  # single chunk after combine; per-chunk dicts would break adjacency
    enc = pc.dictionary_encode(conv)
    dic = enc.dictionary
    sort_idx = pc.array_sort_indices(dic).to_numpy(zero_copy_only=False)
    rank_of = np.empty(len(dic), np.int64)
    rank_of[sort_idx] = np.arange(len(dic), dtype=np.int64)
    rank = rank_of[enc.indices.to_numpy(zero_copy_only=False)]
    s = combined.append_column("__rank", pa.array(rank)).sort_by(
        [("__rank", "ascending"), ("turn_idx", "ascending"), ("seq", "ascending")]
    ).combine_chunks()
    rank_s = s.column("__rank").to_numpy(zero_copy_only=False)
    turn = s.column("turn_idx").to_numpy(zero_copy_only=False)
    s = s.drop_columns(["__rank"])
    neq = (rank_s[1:] != rank_s[:-1]) | (turn[1:] != turn[:-1])
    return s, neq


def lww_winners(combined: pa.Table, sparse: bool = False) -> pa.Table:
    """Vectorized LWW: sort by (conv_id, turn_idx, seq) and keep the last row
    of every key group.  Output remains key-sorted (the stable output
    order).

    ``sparse=True`` implements FIXTURES F2's sparse-update variant: a ``U``
    carries only changed fields (nulls = "unchanged"), so fields resolve
    independently — each winner field is the latest non-null value since the
    key's last full-image reset (``I`` replaces the whole row, explicit
    nulls included; ``D`` clears).  Resolution is one numpy pass per column:
    global last-valid-index accumulate, clipped at reset-segment starts."""
    if combined.num_rows == 0:
        return combined
    s, neq = sort_key_seq(combined)
    last = np.append(neq, True)

    if sparse:
        n = s.num_rows
        idx = np.arange(n, dtype=np.int64)
        first_of_key = np.append(True, neq)
        op_arr = s.column("op")
        if isinstance(op_arr, pa.ChunkedArray):
            op_arr = op_arr.chunk(0)
        is_update = pc.equal(op_arr, "U").to_numpy(zero_copy_only=False)
        is_delete = pc.equal(op_arr, "D").to_numpy(zero_copy_only=False)
        reset = (~is_update) | first_of_key
        # start index of each reset segment, broadcast to its rows
        seg_start = np.maximum.accumulate(np.where(reset, idx, 0))
        payload = [c for c in s.column_names if c not in PAYLOAD_COLUMNS_EXCLUDED]
        cols = {name: s.column(name) for name in s.column_names}
        for name in payload:
            col = cols[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.chunk(0) if col.num_chunks else pa.nulls(0, col.type)
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            # a (defensive) non-null payload on a D must not leak into a
            # following U-create — treat D payloads as absent
            valid = valid & ~is_delete
            lastv = np.maximum.accumulate(np.where(valid, idx, -1))
            # the global last valid index is in-segment iff >= seg_start
            src = np.where(lastv >= seg_start, lastv, -1)
            take_idx = pa.array(
                np.where(src >= 0, src, 0), type=pa.int64()
            )
            resolved = col.take(take_idx)
            if (src < 0).any():
                resolved = pc.if_else(pa.array(src >= 0), resolved, pa.scalar(None, col.type))
            cols[name] = resolved
        s = pa.Table.from_arrays(
            [cols[c] for c in s.column_names], schema=s.schema
        )
    return s.filter(pa.array(last))


def _empty_lineage(pid: int, action: str, t0: float, hw: int, **kw) -> dict:
    row = {f.name: 0 for f in LINEAGE_SCHEMA}
    row.update(
        partition=pid,
        action=action,
        wall_ms=int((time.monotonic() - t0) * 1000),
        file="",
        hw_seq=hw,
    )
    row.update(kw)
    return row


def merge_partition_tables(
    pid: int,
    event_tables: list[pa.Table],
    lake_dir: str,
    epoch: int,
    lake_schema: pa.Schema,
    base_file: str | None,
    hw: int,
    sparse: bool = False,
    output: str = "image",
    write_gate=None,
) -> dict:
    """The merge kernel, shared by both execution paths (Dataset map_groups
    and the hash-exchange actor pool): rebase-LWW one partition's events onto
    its committed base and write the staged file.  Returns one lineage row
    (plain dict).  The per-partition LWW state is materialized from the base
    file + this epoch's events — bounded by live keys of one partition,
    never by the event stream (SURVEY.md §7.4 10^10-event framing).

    ``output="changelog"`` is the otsstreamreader multi-version mode
    (``/root/reference/otsstreamreader/.../core/MultiVerModeRecordSender.
    java:23-28,40-127`` — full change log with op types + sequence id,
    versus the single-version row-image mode): the epoch's replayed events
    are written AS-IS, key-seq-sorted with their ``op``, as an append-only
    epoch file — no base read, no LWW collapse, cost O(delta) per epoch.
    The seq > hw replay filter still dedupes resumes exactly-once."""
    t0 = time.monotonic()
    merge_schema = pa.schema(list(lake_schema) + [pa.field("op", pa.string())])
    event_tables = [t for t in event_tables if t.num_rows]
    events = (
        pa.concat_tables(event_tables, promote_options="none")
        if event_tables
        else merge_schema.empty_table()
    )
    events_in = events.num_rows
    replay = events.filter(pc.greater(events["seq"], hw)) if events_in else events
    if replay.num_rows == 0:
        # partition already at (or beyond) this frontier — committed by a
        # previous attempt of this epoch, or events were stale replays
        return _empty_lineage(pid, "skip", t0, hw, events_in=events_in)

    ops = replay.column("op")
    n_ins = pc.sum(pc.equal(ops, "I")).as_py() or 0
    n_upd = pc.sum(pc.equal(ops, "U")).as_py() or 0
    n_del = pc.sum(pc.equal(ops, "D")).as_py() or 0

    if output == "changelog":
        s, _ = sort_key_seq(normalize_to(replay, merge_schema))
        out = s.replace_schema_metadata(None)
        staging = os.path.join(lake_dir, "_staging", f"epoch-{epoch:06d}")
        os.makedirs(staging, exist_ok=True)
        path = os.path.join(staging, f"part-{pid:05d}.parquet")
        _write_staged(out, path, write_gate)
        return _empty_lineage(
            pid, "write", t0, hw,
            events_in=events_in,
            replayed=replay.num_rows,
            ins=n_ins, upd=n_upd, del_=n_del,
            rows_out=out.num_rows,
            hw_seq=max(hw, pc.max(replay["seq"]).as_py()),
            bytes_out=os.path.getsize(path),
            file=path,
        )

    if base_file is not None:
        base = pq.read_table(os.path.join(lake_dir, base_file))
        base = normalize_to(base, lake_schema)
        base = base.append_column("op", pa.nulls(base.num_rows, pa.string()).fill_null("I"))
    else:
        base = merge_schema.empty_table()

    replay_m = normalize_to(replay, merge_schema)
    combined = pa.concat_tables([base, replay_m], promote_options="none")
    winners = lww_winners(combined, sparse=sparse)
    live = winners.filter(pc.not_equal(winners["op"], "D"))
    out = normalize_to(live, lake_schema).replace_schema_metadata(None)

    staging = os.path.join(lake_dir, "_staging", f"epoch-{epoch:06d}")
    os.makedirs(staging, exist_ok=True)
    path = os.path.join(staging, f"part-{pid:05d}.parquet")
    _write_staged(out, path, write_gate)

    new_hw = max(hw, pc.max(replay["seq"]).as_py())
    return _empty_lineage(
        pid,
        "write",
        t0,
        hw,
        events_in=events_in,
        replayed=replay.num_rows,
        ins=n_ins,
        upd=n_upd,
        del_=n_del,
        base_rows=base.num_rows,
        lww_dropped=combined.num_rows - winners.num_rows,
        deleted_keys=winners.num_rows - live.num_rows,
        rows_out=out.num_rows,
        hw_seq=new_hw,
        bytes_out=os.path.getsize(path),
        file=path,
    )


class MergeWorker:
    """Per-partition merge worker for the Dataset path (actor pool via
    ``groupby.map_groups``); one ``__call__`` = one partition group.
    Delegates to :func:`merge_partition_tables`; the merged data goes
    straight to a deterministic staged Parquet file and is never
    re-shuffled — only the one-row lineage flows back."""

    def __init__(
        self,
        lake_dir: str,
        epoch: int,
        lake_schema: pa.Schema,
        base_files: dict[int, str],
        high_watermarks: dict[int, int],
        sparse: bool = False,
        output: str = "image",
    ):
        self.lake_dir = lake_dir
        self.epoch = epoch
        self.lake_schema = lake_schema
        self.base_files = base_files
        self.hws = high_watermarks
        self.sparse = sparse
        self.output = output

    def __call__(self, group: pa.Table) -> pa.Table:
        pid = group.column("__part")[0].as_py()
        events = group.drop_columns(["__part"])
        row = merge_partition_tables(
            pid,
            [events],
            self.lake_dir,
            self.epoch,
            self.lake_schema,
            self.base_files.get(pid),
            self.hws.get(pid, -1),
            sparse=self.sparse,
            output=self.output,
        )
        return pa.Table.from_pylist([row], schema=LINEAGE_SCHEMA)
