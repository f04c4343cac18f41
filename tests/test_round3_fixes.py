"""Round-3 hardening: partition-hash version guard, vacuum history
trimming, shortest-paths weight validation, streamreader empty-quota
shards, histogram percentiles with NULL group keys."""

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from raydatax.driver import lookup_conversation, run_job
from raydatax.gen import gen_events, write_wal
from raydatax.manifest import (
    lake_config_path,
    snapshot_manifests,
    vacuum,
)


def _reingest(tmp_wal, ev, lo, hi):
    import shutil

    shutil.rmtree(tmp_wal, ignore_errors=True)
    write_wal(ev.slice(lo, hi - lo), tmp_wal, seg_rows=1500)


def test_hash_version_guard(tmp_wal, tmp_lake, ray_session):
    """A lake partitioned with a different (or unknown) key hash must refuse
    ingest AND key-pruned lookups — a silent remap splits LWW keys across
    partitions and reads the wrong partition on lookup."""
    ev = gen_events(4000, seed=311)
    write_wal(ev, tmp_wal, seg_rows=2000)
    run_job(tmp_wal, tmp_lake, partitions=4)

    cfg_path = lake_config_path(tmp_lake)
    with open(cfg_path) as f:
        cfg = json.load(f)
    assert cfg["hash_version"] == "poly-splitmix-v2"

    cfg["hash_version"] = "pandas-siphash-v1"
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    with pytest.raises(RuntimeError, match="repartition_lake"):
        run_job(tmp_wal, tmp_lake, partitions=4)
    with pytest.raises(RuntimeError, match="hash"):
        lookup_conversation(tmp_lake, "conv-1")

    # legacy lakes (no tag at all) are refused too — their mapping is unknown
    del cfg["hash_version"]
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    with pytest.raises(RuntimeError, match="untagged"):
        run_job(tmp_wal, tmp_lake, partitions=4)


def test_vacuum_trims_history_bounded(tmp_wal, tmp_lake, ray_session):
    """History JSONs must not grow one-per-epoch forever once their data
    files are vacuumed; the loud-failure property of time travel past the
    window must survive the trim (tombstone records)."""
    ev = gen_events(8000, seed=313)
    q = ev.num_rows // 4
    epochs = []
    for i in range(4):
        _reingest(tmp_wal, ev, 0, q * (i + 1))
        rep = run_job(tmp_wal, tmp_lake, partitions=2)
        epochs.append(rep["epoch"])

    hist_dir = os.path.join(tmp_lake, "_manifests", "history")
    vacuum(tmp_lake, keep_unreferenced=0)
    removed_twice = vacuum(tmp_lake, keep_unreferenced=0)  # idempotent
    assert removed_twice == []

    # per partition: ≤ 1 live record + 2 tombstones (oldest + newest-trimmed)
    per_part = {}
    for p in glob.glob(os.path.join(hist_dir, "part-*.json")):
        with open(p) as f:
            m = json.load(f)
        per_part.setdefault(m["partition"], []).append(m["epoch"])
    assert per_part
    for pid, eps in per_part.items():
        assert len(eps) <= 3, (pid, eps)

    # time travel to ANY pre-window epoch still fails loudly, never silently
    for e in epochs[:-1]:
        with pytest.raises(FileNotFoundError, match="vacuumed"):
            snapshot_manifests(tmp_lake, e)


def test_vacuum_refuses_changelog_lakes(tmp_wal, tmp_lake, ray_session):
    """Only the newest epoch of a changelog lake is manifest-referenced —
    vacuum would delete the live history; it must refuse loudly (the
    maintenance CLI calls vacuum directly, bypassing the driver's skip)."""
    write_wal(gen_events(3000, seed=319), tmp_wal, seg_rows=1500)
    run_job(tmp_wal, tmp_lake, partitions=2, output="changelog")
    with pytest.raises(RuntimeError, match="compact_changelog"):
        vacuum(tmp_lake)


def test_shortest_paths_rejects_negative_weights(ray_session):
    from raydatax.graph import shortest_paths

    edges = rd.from_arrow(
        pa.table({"src": pa.array([1, 2], pa.int64()),
                  "dst": pa.array([2, 3], pa.int64()),
                  "w": pa.array([5, -1], pa.int64())})
    )
    with pytest.raises(Exception, match="non-negative"):
        shortest_paths(edges, seeds=[1], rounds=2).materialize()


def test_synthetic_columns_empty_quota_shards(ray_session):
    """total_records < shards*per_shard leaves trailing shards with an empty
    quota; the generator must emit a typed zero-row table, not None."""
    from raydatax.sources import synthetic_columns

    spec = [
        {"name": "k", "type": "long", "random": "0, 9"},
        {"name": "s", "type": "string", "random": "3, 6"},
    ]
    ds = synthetic_columns(spec, total_records=3, shards=8, seed=7).materialize()
    assert ds.count() == 3
    sch = ds.schema()
    assert set(sch.names) == {"k", "s"}
    assert dict(zip(sch.names, sch.types))["k"] == pa.int64()


def test_dedup_index_probe_reads_only_touched_buckets(tmp_path, ray_session):
    """The persistent dedup indexes are hash-partitioned by bucket key on
    disk; an incremental probe's read file-list must exclude buckets the
    new crawl does not touch (read ∝ delta, not ∝ corpus) while the
    keep/dup_of output stays identical to a full-index probe."""
    from raydatax.dedup import (
        INDEX_BUCKETS,
        _bucket_exact,
        _index_files_for_buckets,
        _load_index_buckets,
        _wanted_buckets,
        incremental_exact_dedup,
        incremental_minhash_dedup,
        minhash_index_add,
    )
    from raydatax.text import fingerprint_rolling

    # ---- exact index: 300 distinct docs spread across many buckets
    docs = pa.table({
        "doc_id": pa.array(np.arange(300), pa.int64()),
        "text": pa.array([f"unique document number {i} stands alone" for i in range(300)]),
    })
    eidx = str(tmp_path / "exact")
    incremental_exact_dedup(rd.from_arrow(docs), eidx)
    assert _load_index_buckets(eidx) == INDEX_BUCKETS

    all_files = _index_files_for_buckets(eidx, None)
    assert len({f.split("__bucket=")[1].split("/")[0] for f in all_files}) > 8

    # a one-doc crawl touches exactly one bucket
    probe = pa.table({"doc_id": pa.array([9999], pa.int64()),
                      "text": pa.array(["unique document number 7 stands alone"])})
    keyed = fingerprint_rolling(probe, "text", "__k").select(["doc_id", "__k"])
    wanted = _wanted_buckets(rd.from_arrow(keyed), _bucket_exact, INDEX_BUCKETS)
    assert len(wanted) == 1
    pruned = _index_files_for_buckets(eidx, wanted)
    assert pruned and len(pruned) < len(all_files)
    assert all(f"__bucket={next(iter(wanted))}/" in f for f in pruned)

    # the pruned probe still catches the duplicate end-to-end
    out = {r["doc_id"]: r for r in incremental_exact_dedup(
        rd.from_arrow(probe), eidx, update_index=False).take_all()}
    assert out == {}  # exact dup of doc 7 → filtered by the index

    fresh = pa.table({"doc_id": pa.array([10_000], pa.int64()),
                      "text": pa.array(["a never seen sentence entirely"])})
    out2 = [r["doc_id"] for r in incremental_exact_dedup(
        rd.from_arrow(fresh), eidx, update_index=False).take_all()]
    assert out2 == [10_000]

    # ---- minhash LSH index: pruned probe == legacy full-scan marking
    base = [f"the quick brown fox jumps over dog {i} " * 6 for i in range(40)]
    lidx = str(tmp_path / "lsh")
    minhash_index_add(rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(40), pa.int64()),
        "text": pa.array(base)})), lidx)
    crawl = pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": pa.array([base[3], "zebras graze quietly on the open plain " * 6]),
    })
    marked = {r["doc_id"]: (r["dup_of"], r["keep"]) for r in
              incremental_minhash_dedup(rd.from_arrow(crawl), lidx,
                                        threshold=0.9,
                                        update_index=False).take_all()}
    assert marked[100] == (3, False)   # caught by the pruned index probe
    assert marked[101] == (101, True)


def test_write_gate_budgets_per_node(ray_session):
    """Permits are per node id: one node exhausting its budget must not
    consume another node's tokens (the skew-packed-pool scenario), and
    release frees the right node's slot."""
    import ray

    from raydatax.exchange import WriteGate

    gate = WriteGate.remote(1)
    try:
        assert ray.get(gate.acquire.remote("node-a"), timeout=10)
        # node-b has its own budget — grants immediately
        assert ray.get(gate.acquire.remote("node-b"), timeout=10)
        # node-a is exhausted — a second acquire must NOT complete
        pending = gate.acquire.remote("node-a")
        ready, _ = ray.wait([pending], timeout=1.0)
        assert not ready, "second acquire on an exhausted node's budget"
        ray.get(gate.release.remote("node-a"), timeout=10)
        assert ray.get(pending, timeout=10)
    finally:
        ray.kill(gate)


def test_write_gate_preserves_byte_identity(tmp_wal, tmp_path, ray_session):
    """A merge pool large enough to engage the write gate (>8 actors) must
    produce byte-identical partition files to an ungated small pool — the
    gate bounds dirty-page pressure, never content."""
    import hashlib

    ev = gen_events(12_000, seed=317)
    write_wal(ev, tmp_wal, seg_rows=3000)

    def ingest(lake, conc):
        run_job(tmp_wal, lake, partitions=12, salt=2, merge_concurrency=conc)
        out = {}
        for p in sorted(glob.glob(os.path.join(lake, "data", "part-*", "*.parquet"))):
            rel = os.path.relpath(p, lake)
            out[rel] = hashlib.sha1(open(p, "rb").read()).hexdigest()
        return out

    ungated = ingest(str(tmp_path / "lake_small"), 2)
    gated = ingest(str(tmp_path / "lake_gated"), 12)  # > 8 → WriteGate active
    assert ungated == gated


def test_pruned_probe_equals_full_scan(tmp_path, ray_session, monkeypatch):
    """Differential: the bucket-pruned incremental probe must mark the
    SAME keep/dup_of as a forced full-index scan, across several seeded
    corpora with planted cross-crawl and new-new duplicates."""
    import raydatax.dedup as dd

    for seed in (3, 11):
        rng = np.random.default_rng(seed)
        base = [
            " ".join(f"w{rng.integers(0, 50)}" for _ in range(60))
            for _ in range(30)
        ]
        prior = pa.table({
            "doc_id": pa.array(np.arange(30), pa.int64()),
            "text": pa.array(base),
        })
        # crawl: one clone of a prior doc, one internal dup pair, one fresh
        fresh = " ".join(f"z{rng.integers(0, 50)}" for _ in range(60))
        crawl = pa.table({
            "doc_id": pa.array([100, 101, 102, 103], pa.int64()),
            "text": pa.array([base[seed % 30], fresh, fresh,
                              " ".join(f"q{i}" for i in range(60))]),
        })

        def run(idx):
            dd.minhash_index_add(rd.from_arrow(prior), idx)
            out = dd.incremental_minhash_dedup(
                rd.from_arrow(crawl), idx, threshold=0.9, update_index=False
            ).take_all()
            return sorted((r["doc_id"], r["dup_of"], r["keep"]) for r in out)

        pruned = run(str(tmp_path / f"idx_pruned_{seed}"))

        real = dd._index_files_for_buckets
        monkeypatch.setattr(
            dd, "_index_files_for_buckets",
            lambda index_dir, wanted, _real=real: _real(index_dir, None),
        )
        full = run(str(tmp_path / f"idx_full_{seed}"))
        monkeypatch.setattr(dd, "_index_files_for_buckets", real)

        assert pruned == full, seed
        dupped = {d: (o, k) for d, o, k in pruned}
        assert dupped[100] == (seed % 30, False)  # cross-crawl clone dropped
        assert dupped[101] == (101, True)         # new-new pair: min id keeps
        assert dupped[102] == (101, False)
        assert dupped[103] == (103, True)


def test_key_skip_scan_prunes_and_dedupes_row_groups(tmp_path, ray_session):
    """Multi-range skip scan: row groups outside every range are pruned,
    a group hit by two ranges is opened once, and the result equals the
    union of single-range scans."""
    import pyarrow.parquet as pq

    from raydatax.sources import plan_key_ranges, read_key_range, read_key_ranges

    t = pa.table({
        "k": pa.array(np.arange(1000), pa.int64()),
        "seq": pa.array(np.arange(1000), pa.int64()),
        "v": pa.array(np.arange(1000) * 3, pa.int64()),
    })
    p = str(tmp_path / "kv.parquet")
    pq.write_table(t, p, row_group_size=100)  # groups: [0,100), [100,200)…

    # two ranges inside group 1, one in group 7 — groups 0,2..6,8,9 pruned
    ranges = [(110, 120), (150, 160), (705, 715)]
    plans, pruned = plan_key_ranges([p], "k", ranges)
    assert pruned == 8
    assert plans == [(p, [1, 7])]  # group 1 listed ONCE despite two hits

    got = sorted(r["k"] for r in read_key_ranges(
        [p], "k", ranges, columns=["k", "v"]).take_all())
    want = sorted(
        r["k"]
        for a, b in ranges
        for r in read_key_range([p], "k", a, b, columns=["k", "v"]).take_all()
    )
    assert got == want == (
        list(range(110, 120)) + list(range(150, 160)) + list(range(705, 715))
    )


def test_embedding_cluster_count_scales_with_corpus():
    """IVF cluster count must grow with the corpus (target rows/cluster),
    not stay fixed — a fixed 16 makes cluster size N/16 dwarf any cap and
    truncation silently dominate at scale."""
    from raydatax.dedup import _adaptive_clusters

    n = _adaptive_clusters(40_960, target_rows_per_cluster=4096)
    assert n == 10
    assert _adaptive_clusters(409_600, target_rows_per_cluster=4096) == 100
    assert _adaptive_clusters(10) == 1  # tiny corpora: one cluster
    assert _adaptive_clusters(10**12) == 65_536  # capped


def test_grouped_percentiles_histogram_null_keys(ray_session):
    """NULL group keys are legitimate SQL groups; the histogram path must
    bin them (not IndexError on a NaN gidx) and agree with the exact path
    to within one bin width."""
    from raydatax.relational import grouped_percentiles

    rng = np.random.default_rng(17)
    keys = ["a"] * 400 + ["b"] * 300 + [None] * 300
    vals = rng.uniform(0.0, 100.0, size=1000)
    ds = rd.from_arrow(pa.table({"g": pa.array(keys, pa.string()),
                                 "v": pa.array(vals)}))
    pcts = [("p50", 0.5), ("p95", 0.95)]
    exact = {r["g"]: r for r in grouped_percentiles(
        ds, "g", "v", pcts, exact_threshold=10_000).take_all()}
    hist = {r["g"]: r for r in grouped_percentiles(
        ds, "g", "v", pcts, exact_threshold=0, num_bins=4096).take_all()}
    assert set(hist) == set(exact) == {"a", "b", None}
    bin_w = 100.0 / 4096
    for g in exact:
        for name, _ in pcts:
            assert abs(hist[g][name] - exact[g][name]) <= 2 * bin_w, (g, name)
