"""Storage-partitioned (co-located) joins — the zero-shuffle join path.

At 100 TB the expensive part of a repeated equi-join is the all-to-all
exchange that re-partitions both sides every time.  The classical fix
(Hive bucketed map-side join, Iceberg/Spark storage-partitioned join) is
to pay the shuffle ONCE at write time: both tables are exported
hash-bucketed on the join key, and every later join reads bucket H of
each side into one task and joins locally — no exchange, no driver
state, work per task bounded by the bucket pair.  Reference parity: the
sharded-table reader fans one logical table into per-shard reads
(/root/reference/plugin-rdbms-util/.../TableSplitUtil.java) — here the
shard (bucket) assignment is content-hash so TWO tables split the same
way, which is what makes the join side-local.

The export is INCREMENTAL: it reuses the engine's bucketed-epoch-store
primitives (:mod:`raydatax.dedup`'s ``_commit_index_epoch`` /
``_index_epochs`` — crash-atomic staged epoch commits, a ``_folded.json``
compaction horizon, sorted hive leaves).  A continuously-ingested table
appends ``epoch-N/__bucket=H/`` deltas (write cost ∝ delta — exactly the
persistent-dedup-index discipline) and :func:`compact_bucketed` folds
accumulated epochs back to one, so the join's file count stays bounded.

Contract: both sides bucketed with the SAME bucket count and the SAME
hash (the engine's mix64 avalanche finalizer over the int64 key — equal
key values land in equal buckets on both sides, whatever the column
names).  ``colocated_join`` validates the stored layout metadata and
refuses mismatched exports loudly.  Bucket count sizes the per-task
memory: pick B so corpus/B fits a worker heap (the same rule as every
bucketed layout in :mod:`raydatax.dedup`).
"""
from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from .partition import hash_ints, hash_string_column

_META = "_buckets.json"


_COMBINE = np.uint64(0x100000001B3)  # polynomial combine multiplier


def _keys_list(key) -> list[str]:
    return [key] if isinstance(key, str) else list(key)


def _col_hash(t: pa.Table, key: str, kind: str) -> np.ndarray:
    """uint64 hash of ONE key column; nulls refuse loudly (NaN→int64 is
    platform-defined garbage: a null key would silently bucket on an
    arbitrary value — joins never match nulls, but colocated_group_agg
    would emit a null group bucketed by garbage.  Same contract as the
    samplers' non-negative-key validation)."""
    col = t[key]
    if col.null_count:
        raise ValueError(
            f"colocated: key column {key!r} contains {col.null_count} "
            "null(s) — bucket keys must be non-null (filter or fill them "
            "before the export)"
        )
    if kind == "mix64":
        k = col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        return hash_ints(k)
    if kind == "mix64_str":
        return hash_string_column(col.combine_chunks())
    raise ValueError(f"colocated: unknown hash kind {kind!r}")


def _bucket_fn_for(keys, kinds):
    """Bucket assignment for a (possibly composite) key tuple: per-column
    mix64 hashes (int64 value / string UTF-8 buffer) polynomial-combined
    in column order, then ``% B``.  Both sides of a join must use the
    SAME ordered kind list — equal key TUPLES must land in equal buckets,
    so the hash family list is layout-level metadata, validated like the
    bucket count.  A single-column key skips the combine entirely
    (bucket = mix64(col) % B, bit-identical to the round-4 layout, so
    existing exports stay readable and re-appendable)."""
    keys, kinds = _keys_list(keys), list(kinds)
    if len(keys) == 1:
        key, kind = keys[0], kinds[0]

        def f(t: pa.Table, B: int) -> pa.Array:
            h = _col_hash(t, key, kind)
            return pa.array((h % np.uint64(B)).astype(np.int64))

        return f

    from .partition import _mix64

    def f(t: pa.Table, B: int) -> pa.Array:
        h = np.zeros(t.num_rows, np.uint64)
        with np.errstate(over="ignore"):
            for key, kind in zip(keys, kinds):
                h = _mix64(h * _COMBINE + _col_hash(t, key, kind))
        return pa.array((h % np.uint64(B)).astype(np.int64))

    return f


def _hash_kinds(ds: "ray.data.Dataset", keys: list[str]) -> list[str]:
    """Pick each key column's hash family from its Arrow type (schema
    only, no data read)."""
    types = dict(zip(ds.schema().names, ds.schema().types))
    kinds = []
    for key in keys:
        t = types[key]
        if pa.types.is_integer(t):
            kinds.append("mix64")
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            kinds.append("mix64_str")
        else:
            raise ValueError(
                f"colocated: key column {key!r} has type {t} — only "
                "integer and string join keys are bucketable"
            )
    return kinds


def _write_meta(out_dir: str, keys: list[str], buckets: int,
                kinds: list[str]) -> None:
    # single-column exports keep the round-4 scalar JSON shape (older
    # exports stay readable and re-appendable); composite keys record
    # ordered lists
    key = keys[0] if len(keys) == 1 else keys
    kind = kinds[0] if len(kinds) == 1 else kinds
    tmp = os.path.join(out_dir, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"key": key, "buckets": int(buckets), "hash": kind}, f)
    os.replace(tmp, os.path.join(out_dir, _META))


def _layout(path: str) -> dict:
    """Layout metadata, NORMALIZED: ``key`` and ``hash`` always come back
    as ordered lists (round-4 single-column exports stored scalars)."""
    meta = os.path.join(path, _META)
    if not os.path.exists(meta):
        raise ValueError(
            f"colocated: {path} has no {_META} — not a write_bucketed "
            "export (a co-located join over un-co-partitioned data would "
            "silently drop every cross-bucket match)"
        )
    with open(meta) as f:
        la = json.load(f)
    la["key"] = _keys_list(la["key"])
    la["hash"] = _keys_list(la["hash"])
    return la


def write_bucketed(
    ds: "ray.data.Dataset",
    out_dir: str,
    key: str | list[str],
    buckets: int = 32,
) -> str:
    """FRESH export of ``ds`` hash-bucketed on ``key`` (one int64/string
    column, or an ordered LIST of them for composite warehouse keys):
    epoch-0 of the bucketed-epoch layout (``epoch-0/__bucket=H/`` hive
    leaves with H = combined-mix64(key…) % buckets, range-sorted so the
    epoch is ~max(blocks, B) files — the tiny-files discipline).  Later
    deltas go through :func:`append_bucketed`; the one sort here is the
    ONE shuffle the storage-partitioned join ever pays per epoch."""
    shutil.rmtree(out_dir, ignore_errors=True)
    append_bucketed(ds, out_dir, key, buckets=buckets)
    return out_dir


def append_bucketed(
    ds: "ray.data.Dataset",
    out_dir: str,
    key: str | list[str],
    buckets: int = 32,
) -> int:
    """Append a delta to a bucketed export as a NEW crash-atomic epoch
    (stage + rename — a crash leaves only an invisible stage dir; the
    dedup-index commit discipline).  Validates the stored layout: the
    first append fixes (key tuple, buckets); later appends must match in
    COLUMN ORDER too (the combine is order-sensitive).  Write cost ∝
    delta.  Returns the epoch number written."""
    from .dedup import _commit_index_epoch

    if buckets < 1 or buckets > 1 << 16:
        raise ValueError(f"append_bucketed: buckets must be 1..65536, got {buckets}")
    keys = _keys_list(key)
    os.makedirs(out_dir, exist_ok=True)
    kinds = _hash_kinds(ds, keys)
    if os.path.exists(os.path.join(out_dir, _META)):
        la = _layout(out_dir)
        if la["key"] != keys:
            raise ValueError(
                f"append_bucketed: export is bucketed on {la['key']!r}, "
                f"not {keys!r} (order matters — the combine is ordered)"
            )
        if la["hash"] != kinds:
            raise ValueError(
                f"append_bucketed: export hashes {la['hash']!r} keys, the "
                f"delta's {keys!r} columns need {kinds!r} — key type changed"
            )
        buckets = int(la["buckets"])  # layout-level state: stored wins
    else:
        _write_meta(out_dir, keys, buckets, kinds)
    # the epoch-store helper persists its own bucket count (_index.json,
    # stored-wins) — if the directory already carries a DIFFERENT one
    # (e.g. a repurposed index dir), data would be physically bucketed by
    # that value while the join iterates ours, silently never reading the
    # excess buckets.  Refuse the divergence instead.
    from .dedup import _load_index_buckets

    stored = _load_index_buckets(out_dir)
    if stored is not None and int(stored) != int(buckets):
        raise ValueError(
            f"append_bucketed: {out_dir} already carries an epoch-store "
            f"bucket count of {stored} (≠ {buckets}) — not a compatible "
            "bucketed export; use a fresh directory"
        )
    nums = [int(d.split("-", 1)[1]) for d in os.listdir(out_dir)
            if d.startswith("epoch-")]
    nxt = (max(nums) + 1) if nums else 0
    _commit_index_epoch(out_dir, nxt, ds,
                        bucket_fn=_bucket_fn_for(keys, kinds),
                        buckets=buckets)
    return nxt


def compact_bucketed(out_dir: str, min_epochs: int = 2) -> dict:
    """Fold a bucketed export's accumulated epochs into ONE (file count
    back to ~B), behind the same crash-atomic ``_folded.json`` horizon as
    the dedup index: the folded epoch and its horizon marker become
    visible in one rename, and the old epoch dirs are swept after —
    a crash between the two leaves a correct (if duplicated-on-disk,
    never double-READ) export that a rerun finishes sweeping."""
    from .dedup import _commit_index_epoch, _drop_hive_bucket, _index_epochs

    la = _layout(out_dir)
    live, horizon = _index_epochs(out_dir)
    # sweep epochs a prior crash left behind (≤ horizon, already folded)
    swept = 0
    for d in os.listdir(out_dir):
        if d.startswith("epoch-") and int(d.split("-", 1)[1]) <= horizon:
            shutil.rmtree(os.path.join(out_dir, d))
            swept += 1
    if len(live) < min_epochs:
        return {"action": "noop", "live_epochs": len(live),
                "cleanup_swept": swept}
    files = _live_files(out_dir)
    rows = ray.data.read_parquet(files).map_batches(
        _drop_hive_bucket, batch_format="pyarrow"
    )
    hi = max(num for num, _ in live)
    _commit_index_epoch(
        out_dir, hi + 1, rows,
        bucket_fn=_bucket_fn_for(la["key"], la["hash"]),
        buckets=int(la["buckets"]), marker={"folded_upto": hi},
    )
    for num, d in live:
        shutil.rmtree(os.path.join(out_dir, d))
    return {"action": "compacted", "folded_epochs": len(live),
            "epoch": hi + 1, "cleanup_swept": swept}


def _live_files(path: str, bucket: int | None = None) -> list[str]:
    """Parquet files of all LIVE epochs (compaction horizon respected),
    optionally restricted to one bucket."""
    from .dedup import _index_epochs

    live, _ = _index_epochs(path)
    leaf = f"__bucket={bucket}" if bucket is not None else "__bucket=*"
    out: list[str] = []
    for _num, d in live:
        out.extend(sorted(glob.glob(os.path.join(path, d, leaf, "*.parquet"))))
    return out


def _require_live(path: str, who: str) -> None:
    """Raise if ``path`` has zero live epochs (the export vanished)."""
    from .dedup import _index_epochs

    live, _ = _index_epochs(path)
    if not live:
        raise ValueError(
            f"{who}: {path} has no live epochs at read time — the export "
            "was removed or fully compacted away while this scan was pending"
        )


def _side_schema(path: str) -> pa.Schema:
    files = _live_files(path)
    if not files:
        raise ValueError(f"colocated_join: {path} holds no bucket files")
    return pq.read_schema(files[0])


def colocated_join(
    dir_a: str,
    dir_b: str,
    key_a: str | list[str],
    key_b: str | list[str] | None = None,
    join_type: str = "inner",
    right_suffix: str = "_r",
) -> "ray.data.Dataset":
    """Join two bucketed exports WITHOUT a shuffle: one Ray task per
    bucket H reads both sides' bucket-H files (across all live epochs —
    appended deltas join transparently) and hash-joins them in memory
    (Arrow acero) — matches can only live in equal buckets because both
    exports hashed the key (tuple) identically, which the stored layout
    metadata proves (mismatched bucket count / hash list / key tuple
    raises).  Composite keys join positionally: ``key_a[i]`` pairs with
    ``key_b[i]``.  ``join_type``: inner | left outer (Arrow kernel
    names).  The result streams as B independent blocks; empty buckets
    emit a schema-stable empty block so downstream operators never see
    the schema-less-block hazard."""
    keys_a = _keys_list(key_a)
    keys_b = _keys_list(key_b) if key_b is not None else keys_a
    if len(keys_a) != len(keys_b):
        raise ValueError(
            f"colocated_join: key tuples differ in length — {keys_a} vs "
            f"{keys_b}"
        )
    la, lb = _layout(dir_a), _layout(dir_b)
    if la["buckets"] != lb["buckets"] or la["hash"] != lb["hash"]:
        raise ValueError(
            f"colocated_join: layouts disagree — {la} vs {lb}; re-export one "
            "side with the other's bucket count"
        )
    if la["key"] != keys_a or lb["key"] != keys_b:
        raise ValueError(
            f"colocated_join: exports were bucketed on ({la['key']}, "
            f"{lb['key']}), not the requested ({keys_a}, {keys_b}) — joining "
            "on a different key than the bucketing key needs a shuffle join"
        )
    B = int(la["buckets"])
    sch_a, sch_b = _side_schema(dir_a), _side_schema(dir_b)

    def join_bucket(t: pa.Table) -> pa.Table:
        out = []
        for h in t["__b"].to_pylist():
            fa = _live_files(dir_a, h)
            fb = _live_files(dir_b, h)
            # an export the driver validated can vanish before a lazy task
            # runs (rmtree'd fixture dirs, a compaction sweep racing the
            # join, a non-shared filesystem): an EMPTY bucket leaf is
            # normal, but ZERO live epochs means the whole side is gone —
            # substituting empty tables would silently drop every match.
            # Liveness is checked only when a bucket comes back empty (the
            # suspicious case), not per batch — re-listing both exports'
            # epoch dirs on every batch is per-batch filesystem traffic
            # that grows with epoch count on shared filesystems.
            if not fa:
                _require_live(dir_a, "colocated_join")
            if not fb:
                _require_live(dir_b, "colocated_join")
            ta = (pa.concat_tables([pq.read_table(f) for f in fa])
                  if fa else sch_a.empty_table())
            tb = (pa.concat_tables([pq.read_table(f) for f in fb])
                  if fb else sch_b.empty_table())
            out.append(ta.join(
                tb, keys=keys_a, right_keys=keys_b, join_type=join_type,
                right_suffix=right_suffix,
            ))
        return pa.concat_tables(out, promote_options="permissive")

    buckets_ds = ray.data.from_items(
        [{"__b": h} for h in range(B)]
    ).repartition(B)
    return buckets_ds.map_batches(join_bucket, batch_format="pyarrow")


def colocated_group_agg(
    dir_a: str,
    aggs: list[tuple[str, str, str]],
) -> "ray.data.Dataset":
    """Zero-shuffle GROUP BY over a bucketed export: the grouping key is
    the bucketing key, so every group lives entirely inside one bucket —
    one task per bucket reads its live-epoch files and aggregates with
    Arrow's hash kernels, and the union of per-bucket results IS the
    global result (no exchange, no combiner/final split).  The second
    consumer of the storage-partitioned layout: pay the bucketing shuffle
    once, then both joins and aggregations run exchange-free.

    ``aggs``: (column, fn, out_name) with fn ∈ Arrow group_by kernels
    (sum / count / min / max / mean).  Groups split across epochs (a key
    appended in several deltas) are re-merged per bucket — still inside
    the one task, because co-location holds across epochs.  Composite
    bucket keys group by the full key tuple."""
    la = _layout(dir_a)
    keys = la["key"]
    B = int(la["buckets"])
    sch = _side_schema(dir_a)

    def agg_bucket(t: pa.Table) -> pa.Table:
        out = []
        for h in t["__b"].to_pylist():
            files = _live_files(dir_a, h)
            if not files:
                # liveness checked only on the suspicious empty-bucket
                # case, not per batch (see join_bucket)
                _require_live(dir_a, "colocated_group_agg")
            tb = (pa.concat_tables([pq.read_table(f) for f in files])
                  if files else sch.empty_table())
            g = tb.group_by(keys).aggregate([(c, fn) for c, fn, _ in aggs])
            cols = {k: g[k] for k in keys}
            for c, fn, name in aggs:
                cols[name] = g[f"{c}_{fn}"]
            out.append(pa.table(cols))
        return pa.concat_tables(out, promote_options="permissive")

    buckets_ds = ray.data.from_items(
        [{"__b": h} for h in range(B)]
    ).repartition(B)
    return buckets_ds.map_batches(agg_bucket, batch_format="pyarrow")
