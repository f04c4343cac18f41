"""Deterministic, seeded synthetic CDC-log generator (FIXTURES.md F1–F4).

This is the engine's analogue of the reference's `streamreader` synthetic
source (per-column const / random(a,b) generators, sliceRecordCount per task —
``/root/reference/streamreader/src/main/java/com/alibaba/datax/plugin/reader/
streamreader/StreamReader.java:95-166,221-306``), specialised to the
transcript-CDC shape and fully vectorized (numpy + pyarrow) so bench-scale
logs (millions of events) generate in seconds.

Everything is a pure function of ``seed``:
- a universe of conversations, each with a deterministic number of turns;
- per-key event chains: first event ``I``, then ``U``/``D`` (a ``D`` may be
  followed by a re-``I``), lengths geometric — yielding roughly the
  FIXTURES F2 60/30/10 I/U/D mix with repeated updates to the same key
  (exercises last-writer-wins);
- chains randomly interleaved into one global log; ``seq`` = log position
  (strictly increasing, the version vector);
- skew variant (F3): hot conversations receive a target fraction of all
  events by getting proportionally more TURNS (long-running transcripts;
  the per-key chain-length distribution stays identical to cold keys);
- schema-evolution variant (F4) at WAL-write time: early segments lack the
  ``tool`` column, final segments carry ``turn_idx`` widened to int64.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .schema import EVENT_SCHEMA

BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

_TOOLS = np.array(["search", "python", "browser"])

# CSV-hostile vocabulary: unicode, embedded newlines and commas (FIXTURES F1).
_VOCAB = [
    "the", "quick", "naïve", "model,", "says:", "héllo", "世界", "stream\n",
    "merge", "upsert,", "Ω-batch", "arrow", "parquet", "shuffle", "conv",
    "turn;", "tool», «call", "répond", "データ", "lake\nhouse", "π≈3.14159,",
    "okay——", "final", "answer,", "done.",
]


def _sentence_pool(rng: np.random.Generator, size: int = 2048) -> np.ndarray:
    """Deterministic pool of word-salad sentences (10-40 words)."""
    vocab = np.array(_VOCAB, dtype=object)
    lens = rng.integers(10, 41, size=size)
    out = np.empty(size, dtype=object)
    for i in range(size):
        out[i] = " ".join(vocab[rng.integers(0, len(vocab), size=lens[i])])
    return out


def conv_universe(n_convs: int, seed: int = 42, conv_offset: int = 0):
    """(conv_id strings, turns-per-conv int array), deterministic in seed."""
    rng = np.random.default_rng(seed + 1)
    conv_ids = np.array(
        [f"conv-{conv_offset + i:08d}" for i in range(n_convs)], dtype=object
    )
    turns = rng.integers(2, 41, size=n_convs).astype(np.int64)
    return conv_ids, turns


def gen_events(
    n_events: int,
    seed: int = 42,
    n_convs: int | None = None,
    skew_hot_convs: int = 0,
    skew_hot_frac: float = 0.0,
    start_seq: int = 0,
    insert_only: bool = False,
    conv_offset: int = 0,
    sparse_updates: bool = False,
) -> pa.Table:
    """Generate a CDC event log (EVENT_SCHEMA, log/seq order).

    ``skew_hot_convs``/``skew_hot_frac``: route ~frac of all events to the
    first ``skew_hot_convs`` conversations (F3: 1 conv → 30%).
    ``insert_only``: pure-I log (bootstrap / base-snapshot load, F1).
    """
    rng = np.random.default_rng(seed)
    if n_convs is None:
        # avg 21 turns/conv, avg chain ~1.6 events/key
        n_convs = max(4, int(n_events / (21 * 1.6)))
    conv_ids, turns = conv_universe(n_convs, seed, conv_offset)

    # skew: hot conversations are LONG-RUNNING transcripts — scale their
    # TURN counts so they hold ~skew_hot_frac of all events (chain-length
    # distribution per key stays identical, so hot and cold keys share the
    # same events-per-turn expectation and the Markov pass below stays
    # O(total); scaling chain lengths instead would make one key's chain
    # ~frac·n_events long and the per-position pass O(max_len · n_keys))
    if skew_hot_convs > 0 and skew_hot_frac > 0 and n_convs > skew_hot_convs:
        # sized against n_events (not cold turns): the trim-to-target pass
        # below drops TAIL keys, never the hot front, so this lands the
        # post-trim hot share at ~skew_hot_frac
        target_turns = skew_hot_frac * n_events / 1.6
        per_hot = max(2, int(round(target_turns / skew_hot_convs)))
        turns[:skew_hot_convs] = per_hot

    # --- key universe: (conv_idx, turn_idx) for every turn of every conv
    key_conv = np.repeat(np.arange(n_convs), turns)
    key_turn = np.concatenate([np.arange(t) for t in turns]) if n_convs else np.array([], dtype=np.int64)
    n_keys = len(key_conv)

    # --- chain length per key (first event is I; extras are U/D/re-I)
    if insert_only:
        lengths = np.ones(n_keys, dtype=np.int64)
    else:
        extras = np.minimum(rng.geometric(0.62, size=n_keys) - 1, 10)
        lengths = 1 + extras
    # trim/grow to approximately n_events by scaling key count
    total = int(lengths.sum())
    if total > n_events * 1.25:
        # drop tail keys (deterministic) to land near the target
        cum = np.cumsum(lengths)
        keep = int(np.searchsorted(cum, n_events)) + 1
        lengths = lengths[:keep]
        key_conv, key_turn = key_conv[:keep], key_turn[:keep]
        n_keys = keep
        total = int(lengths.sum())

    # --- per-chain op kinds (0=I, 1=U, 2=D); Markov over chain positions
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    kinds = np.zeros(total, dtype=np.int8)  # pos 0 = I
    max_len = int(lengths.max()) if n_keys else 0
    prev_kind = np.zeros(n_keys, dtype=np.int8)
    for pos in range(1, max_len):
        active = lengths > pos
        r = rng.random(n_keys)
        k = np.where(prev_kind == 2, 0, np.where(r < 0.78, 1, 2)).astype(np.int8)
        idx = offsets[active] + pos
        kinds[idx] = k[active]
        prev_kind = np.where(active, k, prev_kind)

    # --- interleave chains into a global log preserving within-key order:
    # per-key sorted uniforms become event "times"; global argsort = log order
    key_rep = np.repeat(np.arange(n_keys), lengths)
    chain_pos = np.arange(total) - np.repeat(offsets, lengths)
    u = rng.random(total)
    i1 = np.lexsort((u, key_rep))       # within each key block: u ascending
    times = u[i1]                        # aligned with key-major chain order
    perm = np.argsort(times, kind="stable")  # key-major index -> log order

    # --- payload fields (key-major), then permute to log order
    conv_idx = key_conv[key_rep]
    turn = key_turn[key_rep]
    pool = _sentence_pool(np.random.default_rng(seed + 2))
    pool_idx = (conv_idx * 131 + turn * 7 + chain_pos * 13) % len(pool)
    h = rng.integers(0, 1 << 30, size=total)

    conv_l = conv_idx[perm]
    turn_l = turn[perm]
    kinds_l = kinds[perm]
    pool_l = pool_idx[perm]
    h_l = h[perm]
    cpos_l = chain_pos[perm]
    seq = np.arange(start_seq, start_seq + total, dtype=np.int64)

    is_del = kinds_l == 2
    # dictionary-style construction: take tiny string arrays by index (arrow
    # `take` is zero-copy-ish and avoids 2M-element Python object arrays)
    op = pa.array(["I", "U", "D"], type=pa.string()).take(pa.array(kinds_l))

    # role: turn 0 -> "system" for ~5% of convs else "user"; then alternate
    role_idx = (turn_l % 2).astype(np.int8)
    role_idx[(turn_l == 0) & (conv_l % 20 == 0)] = 2
    role = pa.array(["user", "assistant", "system"], type=pa.string()).take(pa.array(role_idx))

    # text: pooled sentence + version/seq marker (unique, checks LWW winner)
    text_arr = pc.binary_join_element_wise(
        pa.array(pool, type=pa.string()).take(pa.array(pool_l)),
        pc.cast(pa.array(cpos_l.astype(np.int64)), pa.string()),
        pc.cast(pa.array(seq), pa.string()),
        " ·v",
    )

    tool_idx = np.where(h_l % 10 < 2, h_l % 3, 3)
    tool = pa.array(["search", "python", "browser", None], type=pa.string()).take(
        pa.array(tool_idx)
    )
    ts = BASE_TS_US + conv_l * 3_600_000_000 + turn_l * 60_000_000 + cpos_l * 1_000_000

    conv_str = pa.array(conv_ids, type=pa.string()).take(pa.array(conv_l))

    # D rows: payload all null — EXCEPT ts, which is the event time of the
    # delete itself (real binlog deletes are timestamped; time-bounded
    # replay needs it to window tombstones).  Sparse variant (FIXTURES F2):
    # U rows carry only "changed" fields — independently nulled ~50%.
    is_upd = kinds_l == 1

    def _masked(arr: pa.Array, field_bit: int = 0, keep_on_delete: bool = False) -> pa.Array:
        mask = np.zeros(len(is_del), dtype=bool) if keep_on_delete else is_del.copy()
        if sparse_updates:
            drop = is_upd & (((h_l >> (4 + field_bit)) & 1) == 1)
            mask = mask | drop
        return pc.if_else(pa.array(mask), pa.scalar(None, type=arr.type), arr)

    table = pa.Table.from_arrays(
        [
            pa.array(seq, type=pa.int64()),
            op,
            conv_str,
            pa.array(turn_l.astype(np.int32), type=pa.int32()),
            _masked(role, 0),
            _masked(text_arr, 1),
            _masked(tool, 2),
            _masked(pa.array(ts, type=pa.timestamp("us")), 3, keep_on_delete=True),
        ],
        schema=EVENT_SCHEMA,
    )
    return table


def write_wal(
    table: pa.Table,
    wal_dir: str,
    seg_rows: int = 10_000,
    evolution: bool = False,
) -> list[str]:
    """Write the log as ordered segment files ``seg-{k:05d}.parquet`` (the
    shard analogue).  Parquet footer stats carry per-segment min/max ``seq``
    for read-side pruning.  ``evolution=True`` produces FIXTURES F4: the
    first 40%% of segments lack ``tool``; the last 20%% widen ``turn_idx``
    to int64."""
    os.makedirs(wal_dir, exist_ok=True)
    n = table.num_rows
    n_segs = max(1, (n + seg_rows - 1) // seg_rows)
    paths = []
    for k in range(n_segs):
        seg = table.slice(k * seg_rows, seg_rows)
        if evolution and k < max(1, int(n_segs * 0.4)):
            seg = seg.drop_columns(["tool"])
        elif evolution and k >= n_segs - max(1, int(n_segs * 0.2)):
            s2 = seg.schema.set(
                seg.schema.get_field_index("turn_idx"), pa.field("turn_idx", pa.int64())
            )
            seg = seg.cast(s2)
        path = os.path.join(wal_dir, f"seg-{k:05d}.parquet")
        pq.write_table(seg, path, compression="zstd", row_group_size=min(seg_rows, 65536))
        paths.append(path)
    return paths


def append_wal(
    table: pa.Table,
    wal_dir: str,
    seg_rows: int = 10_000,
) -> list[str]:
    """Append new segments to an EXISTING WAL, continuing the
    ``seg-{k:05d}`` numbering from the current maximum index (max+1, never
    a count — a crashed parallel writer must not overwrite an applied
    segment; same rule as the expire/requeue sweeps).  The incremental
    half of :func:`write_wal` — bootstrap writes, tails append."""
    os.makedirs(wal_dir, exist_ok=True)
    existing = [
        int(f[4:9]) for f in os.listdir(wal_dir)
        if f.startswith("seg-") and f.endswith(".parquet")
    ]
    start = (max(existing) + 1) if existing else 0
    n = table.num_rows
    n_segs = max(1, (n + seg_rows - 1) // seg_rows)
    paths = []
    for k in range(n_segs):
        seg = table.slice(k * seg_rows, seg_rows)
        path = os.path.join(wal_dir, f"seg-{start + k:05d}.parquet")
        # tmp + rename, the engine sweep's discipline (_expire_segment): a
        # producer killed mid-write must never leave a torn segment that
        # wedges every later plan_read of the log
        tmp = path + ".tmp"
        pq.write_table(seg, tmp, compression="zstd",
                       row_group_size=min(seg_rows, 65536))
        os.replace(tmp, path)
        paths.append(path)
    return paths


def gen_wal(
    wal_dir: str,
    n_events: int,
    seed: int = 42,
    seg_rows: int = 10_000,
    evolution: bool = False,
    slab_rows: int = 4_000_000,
    **kw,
) -> list[str]:
    """Generate + write a WAL.  Logs above ``slab_rows`` are generated in
    independent slabs (disjoint conversation namespaces + disjoint ``seq``
    ranges — semantically one log whose keys never cross slabs), which keeps
    any single Arrow string array under the 2 GB offset limit and lets the
    slabs generate in PARALLEL as Ray tasks when a session is running."""
    if n_events <= slab_rows:
        return write_wal(gen_events(n_events, seed=seed, **kw), wal_dir, seg_rows, evolution)
    if evolution:
        raise ValueError("evolution WALs are only supported in single-slab mode")

    n_slabs = (n_events + slab_rows - 1) // slab_rows
    per_slab = n_events // n_slabs
    slab_span = per_slab * 2  # seq headroom: gen may emit up to ~1.25x target

    # caller-supplied namespace offsets (e.g. a delta log's disjoint
    # conv/seq range) compose with the per-slab offsets instead of
    # colliding as duplicate kwargs
    base_conv = int(kw.pop("conv_offset", 0))
    base_seq = int(kw.pop("start_seq", 0))

    def _one(slab: int) -> list[str]:
        t = gen_events(
            per_slab,
            seed=seed + slab * 1000,
            start_seq=base_seq + slab * slab_span,
            conv_offset=base_conv + slab * 10_000_000,
            **kw,
        )
        return write_wal(t, os.path.join(wal_dir, f"_slab{slab:02d}"), seg_rows)

    import ray as _ray

    if _ray.is_initialized():
        one = _ray.remote(_one)
        slab_paths = _ray.get([one.remote(s) for s in range(n_slabs)])
    else:
        slab_paths = [_one(s) for s in range(n_slabs)]

    # move slab segments into the WAL root with global numbering
    paths = []
    k = 0
    for sp in slab_paths:
        for p in sp:
            dest = os.path.join(wal_dir, f"seg-{k:05d}.parquet")
            os.replace(p, dest)
            paths.append(dest)
            k += 1
    for slab in range(n_slabs):
        d = os.path.join(wal_dir, f"_slab{slab:02d}")
        if os.path.isdir(d):
            os.rmdir(d)
    return paths
