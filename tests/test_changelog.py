"""Changelog (multi-version) lake mode — otsstreamreader MultiVerMode parity
(/root/reference/otsstreamreader/.../core/MultiVerModeRecordSender.java:23-28,
40-127: full change log with op types + sequence id, vs the single-version
row-image mode of SingleVerAndUpOnlyModeRecordSender.java:37-50).

The lake stores the FULL ordered change history as append-only per-partition
epoch files: O(delta) per epoch, no base rewrite, exactly-once via the same
seq > hw replay filter and two-phase manifest commit as image mode.
"""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydatax.driver import (
    changelog_table,
    read_changelog,
    read_lake,
    run_job,
)
from raydatax.gen import gen_wal


def _wal_events(wal_dir):
    return pa.concat_tables(
        [pq.read_table(p) for p in sorted(glob.glob(os.path.join(wal_dir, "seg-*.parquet")))],
        promote_options="permissive",
    )


@pytest.fixture()
def wal(tmp_path):
    d = str(tmp_path / "wal")
    gen_wal(d, 12000)
    return d


def test_changelog_holds_every_event_exactly_once(ray_session, wal, tmp_path):
    lake = str(tmp_path / "lake")
    rep = run_job(wal, lake, partitions=4, output="changelog")
    assert rep["action"] == "applied"
    t = changelog_table(lake)
    src = _wal_events(wal)
    assert t.num_rows == src.num_rows == rep["events_replayed"]
    assert sorted(t["seq"].to_pylist()) == sorted(src["seq"].to_pylist())
    assert "op" in t.column_names  # ops retained — I, U AND D rows all live
    assert set(t["op"].to_pylist()) == {"I", "U", "D"}
    # within each epoch file, rows are (conv_id, turn_idx, seq)-sorted
    from raydatax.manifest import changelog_files

    for f in changelog_files(lake):
        part = pq.read_table(f)
        keys = list(zip(part["conv_id"].to_pylist(), part["turn_idx"].to_pylist(),
                        part["seq"].to_pylist()))
        assert keys == sorted(keys)


def test_changelog_epochs_append_without_rewriting_history(ray_session, wal, tmp_path):
    lake = str(tmp_path / "lake")
    run_job(wal, lake, partitions=4, output="changelog")
    before = {
        f: (os.path.getsize(f), os.path.getmtime(f))
        for f in glob.glob(os.path.join(lake, "data", "part-*", "epoch-*.parquet"))
    }
    # append a delta and re-ingest: prior epoch files must be untouched
    gen_wal(str(tmp_path / "wal2"), 3000, start_seq=10_000_000, conv_offset=50_000)
    n_seg = len(glob.glob(os.path.join(wal, "seg-*.parquet")))
    for i, p in enumerate(sorted(glob.glob(str(tmp_path / "wal2" / "seg-*.parquet")))):
        os.replace(p, os.path.join(wal, f"seg-{n_seg + i:05d}.parquet"))
    rep2 = run_job(wal, lake, partitions=4)
    assert rep2["action"] == "applied"
    for f, (size, mtime) in before.items():
        assert os.path.getsize(f) == size and os.path.getmtime(f) == mtime
    # and the log now holds base + delta exactly
    t = changelog_table(lake)
    assert t.num_rows == _wal_events(wal).num_rows
    # lake_info totals span the full history, not just the newest epoch
    from raydatax.driver import lake_info

    info = lake_info(lake)
    assert info["rows_total"] == t.num_rows
    assert info["changelog_files"] > 4
    # idempotent rerun
    assert run_job(wal, lake, partitions=4)["action"] == "noop"


def test_changelog_crash_resume_byte_identical(ray_session, wal, tmp_path):
    """Kill mid-commit, resume: converges to the same bytes as an
    uninterrupted run (same epoch, deterministic staged names)."""
    lake_a = str(tmp_path / "a")
    lake_b = str(tmp_path / "b")
    run_job(wal, lake_a, partitions=4, output="changelog")
    with pytest.raises(KeyboardInterrupt):
        run_job(wal, lake_b, partitions=4, output="changelog",
                _crash_after_committing=2)
    rep = run_job(wal, lake_b, partitions=4)
    assert rep["action"] == "applied"
    fa = sorted(glob.glob(os.path.join(lake_a, "data", "part-*", "*.parquet")))
    fb = sorted(glob.glob(os.path.join(lake_b, "data", "part-*", "*.parquet")))
    assert [os.path.relpath(f, lake_a) for f in fa] == [
        os.path.relpath(f, lake_b) for f in fb
    ]
    for a, b in zip(fa, fb):
        with open(a, "rb") as f1, open(b, "rb") as f2:
            assert f1.read() == f2.read(), f"{a} differs"


def test_changelog_mode_guards(ray_session, wal, tmp_path):
    image = str(tmp_path / "img")
    clg = str(tmp_path / "clg")
    run_job(wal, image, partitions=2)
    run_job(wal, clg, partitions=2, output="changelog")

    with pytest.raises(RuntimeError, match="storage mode is lake-level"):
        run_job(wal, image, partitions=2, output="changelog")
    with pytest.raises(RuntimeError, match="storage mode is lake-level"):
        run_job(wal, clg, partitions=2, output="image")
    with pytest.raises(RuntimeError, match="read_changelog"):
        read_lake(clg)
    with pytest.raises(RuntimeError, match="image lake"):
        read_changelog(image)


def test_changelog_engines_equivalent(ray_session, wal, tmp_path):
    """The pure-Dataset path writes the byte-identical changelog."""
    a = str(tmp_path / "ex")
    b = str(tmp_path / "dsx")
    run_job(wal, a, partitions=4, output="changelog", engine="exchange")
    run_job(wal, b, partitions=4, output="changelog", engine="dataset")
    fa = sorted(glob.glob(os.path.join(a, "data", "part-*", "*.parquet")))
    fb = sorted(glob.glob(os.path.join(b, "data", "part-*", "*.parquet")))
    assert len(fa) == len(fb) > 0
    for x, y in zip(fa, fb):
        with open(x, "rb") as f1, open(y, "rb") as f2:
            assert f1.read() == f2.read()


def test_changelog_replays_to_image_state(ray_session, wal, tmp_path):
    """Collapsing the changelog with generic LWW reproduces the image
    lake exactly — the two output modes are views of one stream."""
    import pyarrow.compute as pc

    from raydatax.driver import lake_table
    from raydatax.relational import lww_latest

    img = str(tmp_path / "img")
    clg = str(tmp_path / "clg")
    run_job(wal, img, partitions=4)
    run_job(wal, clg, partitions=4, output="changelog")

    collapsed = (
        lww_latest(read_changelog(clg), ["conv_id", "turn_idx"], "seq",
                   op_col="op", num_partitions=4)
        .to_arrow_refs()
    )
    import ray

    got = pa.concat_tables(
        [t.drop_columns(["op"]) for t in ray.get(collapsed) if t.num_rows],
        promote_options="permissive",
    )
    want = lake_table(img)
    key = lambda t: sorted(
        zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist(),
            t["seq"].to_pylist(), t["text"].to_pylist())
    )
    assert key(got) == key(want)


def test_changelog_schema_evolution_across_epochs(ray_session, tmp_path):
    """Changelog epoch files are PERMANENT, so an early epoch's narrow
    schema (no tool, int32 turn_idx) must still unify with later widened
    epochs at read time — unlike image mode, where rebase rewrites."""
    import glob as _glob

    from raydatax.gen import gen_events, write_wal

    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    ev = gen_events(6000, seed=25)
    n = ev.num_rows
    # the F4 evolution layout: early segments lack tool, late widen
    # turn_idx; ingest in TWO waves so the epoch files really differ
    write_wal(ev, wal, seg_rows=750, evolution=True)
    segs = sorted(_glob.glob(os.path.join(wal, "seg-*.parquet")))
    held_back = segs[len(segs) // 2:]
    stash = {p: p + ".hold" for p in held_back}
    for p, h in stash.items():
        os.replace(p, h)

    run_job(wal, lake, partitions=4, output="changelog")
    from raydatax.manifest import changelog_files

    assert all(
        pq.read_schema(f).field("turn_idx").type == pa.int32()
        for f in changelog_files(lake)
    )

    for p, h in stash.items():
        os.replace(h, p)
    run_job(wal, lake, partitions=4)
    assert any(
        pq.read_schema(f).field("turn_idx").type == pa.int64()
        for f in changelog_files(lake)
    )

    t = changelog_table(lake)
    assert t.num_rows == n
    assert t.schema.field("turn_idx").type == pa.int64()
    assert "tool" in t.schema.names
    # pre-evolution events carry null tool
    assert t["tool"].null_count > 0

    # the streaming reader unifies too
    ds = read_changelog(lake)
    assert ds.count() == n
    assert set(ds.schema().names) >= {"conv_id", "turn_idx", "op", "seq", "tool"}


def test_changelog_compaction(ray_session, wal, tmp_path):
    """Log-segment compaction: 3 ingest epochs collapse to one file per
    partition; content is unchanged; re-run is a no-op; later deltas
    compact again; time travel below the horizon raises."""
    from raydatax.driver import compact_changelog
    from raydatax.manifest import changelog_files

    lake = str(tmp_path / "lake")
    run_job(wal, lake, partitions=4, output="changelog")
    for k, (seq0, conv0) in enumerate([(20_000_000, 60_000), (30_000_000, 70_000)]):
        d = str(tmp_path / f"wal_d{k}")
        gen_wal(d, 2000, start_seq=seq0, conv_offset=conv0)
        n_seg = len(glob.glob(os.path.join(wal, "seg-*.parquet")))
        for i, p in enumerate(sorted(glob.glob(os.path.join(d, "seg-*.parquet")))):
            os.replace(p, os.path.join(wal, f"seg-{n_seg + i:05d}.parquet"))
        run_job(wal, lake, partitions=4)

    before = changelog_table(lake)
    n_files_before = len(changelog_files(lake))
    assert n_files_before > 4  # several epochs per partition

    rep = compact_changelog(lake)
    assert rep["partitions_compacted"] == 4
    assert len(changelog_files(lake)) == 4  # one file per partition
    after = changelog_table(lake)
    assert after.num_rows == before.num_rows
    assert sorted(after["seq"].to_pylist()) == sorted(before["seq"].to_pylist())
    # key-seq sorted within the compacted file
    for f in changelog_files(lake):
        part = pq.read_table(f)
        keys = list(zip(part["conv_id"].to_pylist(), part["turn_idx"].to_pylist(),
                        part["seq"].to_pylist()))
        assert keys == sorted(keys)

    # idempotent
    assert compact_changelog(lake)["partitions_compacted"] == 0

    # below-horizon time travel raises; at/after the horizon still works
    with pytest.raises(RuntimeError, match="compacted"):
        changelog_files(lake, at_epoch=1)

    # new deltas after compaction ingest + read + compact again
    d = str(tmp_path / "wal_d2")
    gen_wal(d, 1500, start_seq=40_000_000, conv_offset=80_000)
    n_seg = len(glob.glob(os.path.join(wal, "seg-*.parquet")))
    for i, p in enumerate(sorted(glob.glob(os.path.join(d, "seg-*.parquet")))):
        os.replace(p, os.path.join(wal, f"seg-{n_seg + i:05d}.parquet"))
    run_job(wal, lake, partitions=4)
    t2 = changelog_table(lake)
    assert t2.num_rows > after.num_rows
    rep2 = compact_changelog(lake)
    assert rep2["partitions_compacted"] == 4
    assert changelog_table(lake).num_rows == t2.num_rows

    # ingest still works after compaction (hw preserved: rerun is a noop)
    assert run_job(wal, lake, partitions=4)["action"] == "noop"


def test_compaction_geometric_trigger(ray_session, wal, tmp_path):
    """min_delta_ratio skips partitions whose delta is small relative to
    their compacted base (the size-tiered major-compaction trigger):
    a tiny delta on a big base does NOT trigger a rewrite, an
    accumulated delta does, and the skip never loses data."""
    from raydatax.driver import compact_changelog
    from raydatax.manifest import changelog_files

    lake = str(tmp_path / "lake")
    run_job(wal, lake, partitions=4, output="changelog")

    def append_delta(n, seq0, conv0, tag):
        d = str(tmp_path / f"wal_{tag}")
        gen_wal(d, n, start_seq=seq0, conv_offset=conv0)
        n_seg = len(glob.glob(os.path.join(wal, "seg-*.parquet")))
        for i, p in enumerate(sorted(glob.glob(os.path.join(d, "seg-*.parquet")))):
            os.replace(p, os.path.join(wal, f"seg-{n_seg + i:05d}.parquet"))
        run_job(wal, lake, partitions=4)

    append_delta(3000, 20_000_000, 60_000, "d0")
    # establish the compacted base
    rep = compact_changelog(lake)
    assert rep["partitions_compacted"] == 4

    # a small delta (~3% of the base) does not meet ratio 0.5
    append_delta(400, 30_000_000, 70_000, "small")
    before = changelog_table(lake)
    rep = compact_changelog(lake, min_delta_ratio=0.5)
    assert rep["partitions_compacted"] == 0
    assert rep["partitions_skipped"] == 4
    after = changelog_table(lake)
    assert after.num_rows == before.num_rows  # skip loses nothing

    # accumulate deltas past the trigger → compaction fires
    append_delta(9000, 40_000_000, 80_000, "big")
    before = changelog_table(lake)
    rep = compact_changelog(lake, min_delta_ratio=0.5)
    assert rep["partitions_compacted"] == 4
    assert len(changelog_files(lake)) == 4
    after = changelog_table(lake)
    assert sorted(after["seq"].to_pylist()) == sorted(before["seq"].to_pylist())

    # min_files alone: one fresh UNCOMPACTED delta per partition (the
    # compacted base does not count), below a min_files=3 bar
    append_delta(500, 50_000_000, 90_000, "tail")
    rep = compact_changelog(lake, min_files=3)
    assert rep["partitions_compacted"] == 0 and rep["partitions_skipped"] == 4
    rep = compact_changelog(lake)  # defaults still always-compact
    assert rep["partitions_compacted"] == 4


def test_changelog_compaction_crash_states_stay_readable(ray_session, wal, tmp_path):
    """Either side of the commit point is a readable lake: a stray merged
    file without its record is ignored; once the marker record exists,
    superseded records are skipped even if their files were deleted."""
    import json as _json

    from raydatax.driver import compact_changelog
    from raydatax.manifest import changelog_files

    lake = str(tmp_path / "lake")
    run_job(wal, lake, partitions=2, output="changelog")
    d = str(tmp_path / "wal_d")
    gen_wal(d, 2000, start_seq=20_000_000, conv_offset=60_000)
    n_seg = len(glob.glob(os.path.join(wal, "seg-*.parquet")))
    for i, p in enumerate(sorted(glob.glob(os.path.join(d, "seg-*.parquet")))):
        os.replace(p, os.path.join(wal, f"seg-{n_seg + i:05d}.parquet"))
    run_job(wal, lake, partitions=2)
    base = changelog_table(lake)

    # crash BEFORE the commit point: stray -c file, records untouched
    stray = os.path.join(lake, "data", "part-00000", "epoch-000099-c.parquet")
    pq.write_table(base.slice(0, 1), stray)
    assert changelog_table(lake).num_rows == base.num_rows
    os.remove(stray)

    # crash AFTER the commit point mid-cleanup: compact, then restore one
    # superseded record (its file is already gone) — reader must skip it
    hist = os.path.join(lake, "_manifests", "history")
    pre_recs = {p: open(p).read() for p in glob.glob(os.path.join(hist, "*.json"))}
    compact_changelog(lake)
    gone = set(pre_recs) - set(glob.glob(os.path.join(hist, "*.json")))
    assert gone
    victim = sorted(gone)[0]
    with open(victim, "w") as f:
        f.write(pre_recs[victim])
    assert changelog_table(lake).num_rows == base.num_rows  # no raise, no dupes
    rec = _json.load(open(victim))
    assert not os.path.exists(os.path.join(lake, rec["file"]))
    # a compaction re-run completes the cleanup: the stale record is
    # removed even though there is nothing new to compact
    rep = compact_changelog(lake)
    assert rep["partitions_compacted"] == 0
    assert not os.path.exists(victim)
    assert changelog_table(lake).num_rows == base.num_rows


def test_changelog_lookup_and_lake_table_guard(ray_session, wal, tmp_path):
    """Point lookup on a changelog lake returns the conversation's FULL
    version history across epochs; lake_table refuses (like read_lake)."""
    from raydatax.driver import lake_table, lookup_conversation

    lake = str(tmp_path / "lake")
    run_job(wal, lake, partitions=4, output="changelog")
    # pick a conv present in the log
    t = changelog_table(lake)
    conv = t["conv_id"][0].as_py()
    n_versions = len([x for x in t["conv_id"].to_pylist() if x == conv])

    got = lookup_conversation(lake, conv)
    assert got is not None and got.num_rows == n_versions
    assert "op" in got.column_names
    # (turn, seq)-ordered history
    keys = list(zip(got["turn_idx"].to_pylist(), got["seq"].to_pylist()))
    assert keys == sorted(keys)

    with pytest.raises(RuntimeError, match="changelog_table"):
        lake_table(lake)


def test_changelog_compaction_promotes_evolved_schemas(ray_session, tmp_path):
    """Compacting epochs with DIFFERENT schemas (pre/post evolution)
    produces one widened file; the log content survives."""
    import glob as _glob

    from raydatax.driver import compact_changelog
    from raydatax.gen import gen_events, write_wal
    from raydatax.manifest import changelog_files

    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    ev = gen_events(4000, seed=29)
    write_wal(ev, wal, seg_rows=500, evolution=True)
    segs = sorted(_glob.glob(os.path.join(wal, "seg-*.parquet")))
    stash = {p: p + ".hold" for p in segs[len(segs) // 2:]}
    for p, h in stash.items():
        os.replace(p, h)
    run_job(wal, lake, partitions=2, output="changelog")
    for p, h in stash.items():
        os.replace(h, p)
    run_job(wal, lake, partitions=2)

    before = changelog_table(lake)
    rep = compact_changelog(lake)
    assert rep["partitions_compacted"] == 2
    files = changelog_files(lake)
    assert len(files) == 2
    for f in files:
        assert pq.read_schema(f).field("turn_idx").type == pa.int64()
    after = changelog_table(lake)
    assert after.num_rows == before.num_rows == ev.num_rows
    assert sorted(after["seq"].to_pylist()) == sorted(before["seq"].to_pylist())


def test_changelog_at_epoch_bounds_log(ray_session, wal, tmp_path):
    """at_epoch bounds the log to commits <= that epoch (before any
    compaction); compact_changelog refuses image lakes."""
    from raydatax.driver import compact_changelog

    lake = str(tmp_path / "lake")
    run_job(wal, lake, partitions=2, output="changelog")
    n1 = changelog_table(lake).num_rows
    gen_wal(str(tmp_path / "wal2"), 2000, start_seq=30_000_000, conv_offset=75_000)
    n_seg = len(glob.glob(os.path.join(wal, "seg-*.parquet")))
    for i, p in enumerate(sorted(glob.glob(str(tmp_path / "wal2" / "seg-*.parquet")))):
        os.replace(p, os.path.join(wal, f"seg-{n_seg + i:05d}.parquet"))
    run_job(wal, lake, partitions=2)

    assert changelog_table(lake, at_epoch=1).num_rows == n1
    assert changelog_table(lake).num_rows > n1
    assert read_changelog(lake, at_epoch=1).count() == n1

    img = str(tmp_path / "img")
    run_job(wal, img, partitions=2)
    with pytest.raises(RuntimeError, match="not a changelog lake"):
        compact_changelog(img)


def test_changelog_salted_hot_conversation_history(ray_session, tmp_path):
    """Hot-key salting composes with changelog mode: a hot conversation's
    events spread across salt sub-partitions, yet its full version history
    comes back complete via the salted point lookup."""
    from raydatax.driver import lookup_conversation
    from raydatax.gen import gen_events, write_wal
    from raydatax.manifest import load_lake_config

    ev = gen_events(20_000, seed=33, skew_hot_convs=1, skew_hot_frac=0.35)
    wal = str(tmp_path / "wal")
    write_wal(ev, wal, seg_rows=4000)
    lake = str(tmp_path / "lake")
    # partitions=8 → hot floor is 2/8 = 0.25 < the fixture's 0.35 share
    run_job(wal, lake, partitions=8, salt=3, hot_threshold=0.05,
            output="changelog")

    cfg = load_lake_config(lake)
    assert cfg["hot_keys"], "fixture must trigger hot-key detection"
    hot = cfg["hot_keys"][0]

    want = ev.filter(pa.compute.equal(ev["conv_id"], hot))
    got = lookup_conversation(lake, hot)
    assert got.num_rows == want.num_rows  # every version, no loss, no dupes
    assert sorted(got["seq"].to_pylist()) == sorted(want["seq"].to_pylist())
    # history really spans multiple salt sub-partitions
    files = {os.path.basename(os.path.dirname(f))
             for f in glob.glob(os.path.join(lake, "data", "part-*", "*.parquet"))}
    assert len(files) > 8  # base partitions + salted sub-partitions


def test_compaction_crash_after_commit_point_repairs_on_rerun(ray_session, tmp_path):
    """Crash between the history-record commit and cleanup: the horizon
    epoch's pre-compaction delta file and the stale manifest mirror must
    be repaired by the next compaction run."""
    import glob
    import json
    import os

    from raydatax import manifest as mf
    from raydatax.driver import compact_changelog, read_changelog, run_job
    from raydatax.gen import gen_wal
    from raydatax.merge import PARQUET_OPTS  # noqa: F401 (parity import)

    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    gen_wal(wal, 2000, seg_rows=500)
    run_job(wal, lake, partitions=2, output="changelog")
    # second epoch so there is something to compact (seqs above the HW)
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydatax.gen import append_wal, gen_events

    late = gen_events(700, seed=7)
    late = pa.table({
        "seq": pa.array(np.asarray(late["seq"]) + 10_000_000),
        **{c: late[c] for c in late.column_names if c != "seq"},
    }).cast(late.schema)
    append_wal(late, wal, seg_rows=500)
    run_job(wal, lake, partitions=2, output="changelog")
    before_rows = read_changelog(lake).count()

    compact_changelog(lake)

    # simulate the crash window for partition 0: restore the horizon
    # epoch's OLD delta file and point the manifest mirror back at it
    recs = [(p, m) for p, m in mf.iter_history_records(lake)
            if m is not None and m["partition"] == 0]
    base = max((m for _, m in recs), key=lambda m: m["epoch"])
    assert base.get("compacted_upto") is not None
    old_delta = os.path.join(lake, "data", "part-00000",
                             f"epoch-{base['epoch']:06d}.parquet")
    with open(old_delta, "wb") as f:
        f.write(b"orphaned pre-compaction bytes")
    man_path = mf.manifest_path(lake, 0)
    man = json.load(open(man_path))
    man["file"] = os.path.relpath(old_delta, lake)
    man["rows"] = 1
    mf._atomic_write_json(man_path, man)

    compact_changelog(lake)  # re-run repairs the crash window
    assert not os.path.exists(old_delta)
    man2 = json.load(open(man_path))
    assert man2["file"] == base["file"] and man2["rows"] == base["rows"]
    assert read_changelog(lake).count() == before_rows
