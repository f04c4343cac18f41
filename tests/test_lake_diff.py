"""Snapshot diff (``lake_diff``) — the Delta-CDF-style change feed between
two committed epochs of an image lake, verified against a brute-force dict
diff of the two time-travel snapshots."""

import glob
import os

import pyarrow as pa
import pytest

from raydatax.driver import _diff_plan, lake_diff, lake_table, run_job
from raydatax.gen import gen_events, write_wal


def _append_segments(src_table, wal_dir, seg_rows):
    """Append a table as new WAL segments continuing the name sequence."""
    n_existing = len(glob.glob(os.path.join(wal_dir, "seg-*.parquet")))
    tmp = wal_dir + "_next"
    write_wal(src_table, tmp, seg_rows=seg_rows)
    for i, p in enumerate(sorted(glob.glob(os.path.join(tmp, "seg-*.parquet")))):
        os.rename(p, os.path.join(wal_dir, f"seg-{n_existing + i:05d}.parquet"))


def _brute_diff(old_t: pa.Table, new_t: pa.Table) -> dict:
    """Expected change set from the two snapshot tables: key → (_op, seq)."""

    def by_key(t):
        d = t.to_pydict()
        return {
            (c, ti): s
            for c, ti, s in zip(d["conv_id"], d["turn_idx"], d["seq"])
        }

    old, new = by_key(old_t), by_key(new_t)
    out = {}
    for k, s in new.items():
        if k not in old:
            out[k] = ("insert", s)
        elif old[k] != s:
            out[k] = ("update", s)
    for k, s in old.items():
        if k not in new:
            out[k] = ("delete", s)
    return out


def _got_diff(ds) -> dict:
    t = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow")]
        or [ds.schema().base_schema.empty_table()],
        promote_options="permissive",
    )
    d = t.to_pydict()
    return {
        (c, ti): (op, s)
        for c, ti, op, s in zip(d["conv_id"], d["turn_idx"], d["_op"], d["seq"])
    }


def test_lake_diff_matches_brute_force(tmp_wal, tmp_lake):
    ev = gen_events(16_000, seed=31)
    cut = ev.num_rows * 6 // 10
    write_wal(ev.slice(0, cut), tmp_wal, seg_rows=2000)
    rep1 = run_job(tmp_wal, tmp_lake, partitions=8, time_travel_epochs=8)
    _append_segments(ev.slice(cut), tmp_wal, seg_rows=2000)
    rep2 = run_job(tmp_wal, tmp_lake, partitions=8)
    e1, e2 = rep1["epoch"], rep2["epoch"]

    want = _brute_diff(lake_table(tmp_lake, at_epoch=e1), lake_table(tmp_lake, at_epoch=e2))
    got = _got_diff(lake_diff(tmp_lake, from_epoch=e1, to_epoch=e2))
    assert got == want
    assert {op for op, _ in want.values()} == {"insert", "update", "delete"}, (
        "fixture must exercise all three op classes"
    )


def test_diff_plan_skips_untouched_partitions(tmp_wal, tmp_lake):
    """A tiny second delta touches few keys; partitions it misses must not
    appear in the plan (their files are never opened), and the pruned diff
    must still equal the brute-force one."""
    import pyarrow.compute as pc

    ev = gen_events(12_000, seed=32)
    cut = ev.num_rows - 400
    write_wal(ev.slice(0, cut), tmp_wal, seg_rows=2000)
    rep1 = run_job(tmp_wal, tmp_lake, partitions=16, time_travel_epochs=8)
    # delta confined to ONE conversation → one (or salted-few) partitions
    tail = ev.slice(cut)
    cid = tail["conv_id"][0].as_py()
    delta = tail.filter(pc.equal(tail["conv_id"], cid))
    assert delta.num_rows > 0
    _append_segments(delta, tmp_wal, seg_rows=200)
    rep2 = run_job(tmp_wal, tmp_lake, partitions=16)
    e1, e2 = rep1["epoch"], rep2["epoch"]

    plan = _diff_plan(tmp_lake, e1, e2)
    import raydatax.manifest as mf

    committed = mf.snapshot_manifests(tmp_lake, e2)
    assert 0 < len(plan) < len(committed), (
        f"a 400-event delta over 16 partitions should leave some untouched "
        f"(plan={len(plan)}, partitions={len(committed)})"
    )
    want = _brute_diff(lake_table(tmp_lake, at_epoch=e1), lake_table(tmp_lake, at_epoch=e2))
    got = _got_diff(lake_diff(tmp_lake, from_epoch=e1, to_epoch=e2))
    assert got == want


def test_diff_same_epoch_is_empty_with_schema(tmp_wal, tmp_lake):
    write_wal(gen_events(3000, seed=33), tmp_wal, seg_rows=1000)
    rep = run_job(tmp_wal, tmp_lake, partitions=4, time_travel_epochs=4)
    e = rep["epoch"]
    ds = lake_diff(tmp_lake, from_epoch=e, to_epoch=e)
    assert ds.count() == 0
    names = ds.schema().names
    assert "_op" in names and "conv_id" in names and "seq" in names


def test_diff_refuses_changelog_lake(tmp_wal, tmp_lake):
    write_wal(gen_events(2000, seed=34), tmp_wal, seg_rows=1000)
    run_job(tmp_wal, tmp_lake, partitions=4, output="changelog")
    with pytest.raises(RuntimeError, match="changelog"):
        lake_diff(tmp_lake, from_epoch=1)


def test_diff_patch_reconstructs_new_snapshot(tmp_wal, tmp_lake):
    """Patch invariant: old snapshot + change feed == new snapshot, byte for
    byte per cell (upsert inserts/updates, drop deletes)."""
    ev = gen_events(10_000, seed=37)
    cut = ev.num_rows * 2 // 3
    write_wal(ev.slice(0, cut), tmp_wal, seg_rows=2500)
    rep1 = run_job(tmp_wal, tmp_lake, partitions=8, time_travel_epochs=8)
    _append_segments(ev.slice(cut), tmp_wal, seg_rows=2500)
    rep2 = run_job(tmp_wal, tmp_lake, partitions=8)

    old_t = lake_table(tmp_lake, at_epoch=rep1["epoch"])
    new_t = lake_table(tmp_lake, at_epoch=rep2["epoch"])
    feed = pa.concat_tables(
        ray_get_tables(lake_diff(tmp_lake, from_epoch=rep1["epoch"],
                                 to_epoch=rep2["epoch"])),
        promote_options="permissive",
    )

    def rows(t, with_op=False):
        cols = [c for c in t.column_names if c != "_op"]
        d = t.select(cols).to_pylist()
        if with_op:
            return {
                (r["conv_id"], r["turn_idx"]): (op, tuple(sorted(r.items())))
                for r, op in zip(d, t["_op"].to_pylist())
            }
        return {(r["conv_id"], r["turn_idx"]): tuple(sorted(r.items())) for r in d}

    state = rows(old_t)
    # old rows lack columns added later; promote them the same way the
    # feed's unified schema does before comparing
    from raydatax.schema import normalize_to

    base = pa.schema([f for f in feed.schema if f.name != "_op"])
    state = rows(normalize_to(old_t, base))
    for key, (op, img) in rows(feed, with_op=True).items():
        if op == "delete":
            assert key in state
            del state[key]
        else:
            assert (key in state) == (op == "update")
            state[key] = img
    assert state == rows(normalize_to(new_t, base))


def ray_get_tables(ds):
    import ray

    return [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]


def test_diff_cli_counts_and_export(tmp_wal, tmp_lake, tmp_path, capsys):
    """``python -m raydatax.maintenance diff`` prints per-op counts and the
    exported parquet feed matches them."""
    import json

    import pyarrow.dataset as pads

    from raydatax.maintenance import main as maint_main

    ev = gen_events(6000, seed=36)
    cut = ev.num_rows // 2
    write_wal(ev.slice(0, cut), tmp_wal, seg_rows=1500)
    rep1 = run_job(tmp_wal, tmp_lake, partitions=4, time_travel_epochs=4)
    _append_segments(ev.slice(cut), tmp_wal, seg_rows=1500)
    run_job(tmp_wal, tmp_lake, partitions=4)

    out_dir = str(tmp_path / "feed")
    rc = maint_main(
        ["diff", tmp_lake, "--from-epoch", str(rep1["epoch"]), "--out", out_dir]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["changes"] == sum(rep["by_op"].values()) > 0
    assert set(rep["by_op"]) == {"insert", "update", "delete"}
    feed = pads.dataset(out_dir).to_table()
    assert feed.num_rows == rep["changes"]


def test_diff_spans_schema_evolution(tmp_wal, tmp_lake):
    """Second epoch adds a column (schema evolution); diff rows promote onto
    the widened schema, old-image deletes carrying null for the new column."""
    ev = gen_events(8000, seed=35)
    cut = ev.num_rows // 2
    write_wal(ev.slice(0, cut), tmp_wal, seg_rows=2000)
    rep1 = run_job(tmp_wal, tmp_lake, partitions=4, time_travel_epochs=8)
    late = ev.slice(cut).append_column(
        "rating", pa.array(range(ev.num_rows - cut), pa.int64())
    )
    _append_segments(late, tmp_wal, seg_rows=2000)
    rep2 = run_job(tmp_wal, tmp_lake, partitions=4)

    want = _brute_diff(
        lake_table(tmp_lake, at_epoch=rep1["epoch"]),
        lake_table(tmp_lake, at_epoch=rep2["epoch"]),
    )
    ds = lake_diff(tmp_lake, from_epoch=rep1["epoch"], to_epoch=rep2["epoch"])
    assert "rating" in ds.schema().names
    got = _got_diff(ds)
    assert got == want
