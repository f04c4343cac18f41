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

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from .partition import hash_ints

_META = "_buckets.json"


def write_bucketed(
    ds: "ray.data.Dataset",
    out_dir: str,
    key: str,
    buckets: int = 32,
) -> str:
    """Export ``ds`` hash-bucketed on int64 column ``key``: hive layout
    ``__bucket=H/`` with H = mix64(key) % buckets, range-sorted so each
    output block spans a contiguous bucket range (~max(blocks, B) files,
    not blocks×B — the tiny-files discipline of the dedup index layout).
    Writes ``_buckets.json`` describing the layout; the join validates it.
    This is the ONE shuffle the storage-partitioned join ever pays."""
    if buckets < 1 or buckets > 1 << 16:
        raise ValueError(f"write_bucketed: buckets must be 1..65536, got {buckets}")

    def tag(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        b = (hash_ints(k) % np.uint64(buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b))

    from .sinks import write_partitioned

    tagged = ds.map_batches(tag, batch_format="pyarrow").sort("__bucket")
    write_partitioned(tagged, out_dir, ["__bucket"])
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump({"key": key, "buckets": int(buckets), "hash": "mix64"}, f)
    return out_dir


def _layout(path: str) -> dict:
    meta = os.path.join(path, _META)
    if not os.path.exists(meta):
        raise ValueError(
            f"colocated_join: {path} has no {_META} — not a write_bucketed "
            "export (a co-located join over un-co-partitioned data would "
            "silently drop every cross-bucket match)"
        )
    with open(meta) as f:
        return json.load(f)


def _side_schema(path: str) -> pa.Schema:
    files = glob.glob(os.path.join(path, "__bucket=*", "*.parquet"))
    if not files:
        raise ValueError(f"colocated_join: {path} holds no bucket files")
    return pq.read_schema(sorted(files)[0])


def colocated_join(
    dir_a: str,
    dir_b: str,
    key_a: str,
    key_b: str | None = None,
    join_type: str = "inner",
    right_suffix: str = "_r",
) -> "ray.data.Dataset":
    """Join two :func:`write_bucketed` exports WITHOUT a shuffle: one Ray
    task per bucket H reads ``dir_a/__bucket=H`` and ``dir_b/__bucket=H``
    and hash-joins them in memory (Arrow acero) — matches can only live in
    equal buckets because both exports hashed the key identically, which
    the stored layout metadata proves (mismatched bucket count / hash /
    key raises).  ``join_type``: inner | left outer (Arrow kernel names).
    The result streams as B independent blocks; empty buckets emit a
    schema-stable empty block so downstream operators never see the
    schema-less-block hazard."""
    key_b = key_b or key_a
    la, lb = _layout(dir_a), _layout(dir_b)
    if la["buckets"] != lb["buckets"] or la["hash"] != lb["hash"]:
        raise ValueError(
            f"colocated_join: layouts disagree — {la} vs {lb}; re-export one "
            "side with the other's bucket count"
        )
    if la["key"] != key_a or lb["key"] != key_b:
        raise ValueError(
            f"colocated_join: exports were bucketed on ({la['key']}, "
            f"{lb['key']}), not the requested ({key_a}, {key_b}) — joining "
            "on a different key than the bucketing key needs a shuffle join"
        )
    B = int(la["buckets"])
    sch_a, sch_b = _side_schema(dir_a), _side_schema(dir_b)

    def join_bucket(t: pa.Table) -> pa.Table:
        out = []
        for h in t["__b"].to_pylist():
            fa = sorted(glob.glob(os.path.join(dir_a, f"__bucket={h}", "*.parquet")))
            fb = sorted(glob.glob(os.path.join(dir_b, f"__bucket={h}", "*.parquet")))
            ta = (pa.concat_tables([pq.read_table(f) for f in fa])
                  if fa else sch_a.empty_table())
            tb = (pa.concat_tables([pq.read_table(f) for f in fb])
                  if fb else sch_b.empty_table())
            out.append(ta.join(
                tb, keys=key_a, right_keys=key_b, join_type=join_type,
                right_suffix=right_suffix,
            ))
        return pa.concat_tables(out, promote_options="permissive")

    buckets_ds = ray.data.from_items(
        [{"__b": h} for h in range(B)]
    ).repartition(B)
    return buckets_ds.map_batches(join_bucket, batch_format="pyarrow")
