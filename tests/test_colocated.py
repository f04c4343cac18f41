"""Storage-partitioned (co-located) join: layout metadata contract,
zero-shuffle join correctness vs a plain hash join, empty buckets, and
outer-join semantics."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from raydatax.colocated import colocated_join, write_bucketed


def _sides(tmp_path, buckets=8, n_a=500, n_b=120):
    rng = np.random.default_rng(7)
    a = pa.table({
        "k": pa.array(rng.integers(0, 150, n_a), pa.int64()),
        "va": pa.array(rng.integers(0, 10_000, n_a), pa.int64()),
    })
    # b: unique keys 0..n_b-1 → some a keys (>= n_b) have no match
    b = pa.table({
        "k": pa.array(np.arange(n_b), pa.int64()),
        "vb": pa.array(rng.integers(0, 10_000, n_b), pa.int64()),
    })
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    write_bucketed(rd.from_arrow(a), da, "k", buckets=buckets)
    write_bucketed(rd.from_arrow(b), db, "k", buckets=buckets)
    return a, b, da, db


def _sorted_pd(t: pa.Table):
    cols = sorted(t.column_names)
    return t.select(cols).to_pandas().sort_values(cols).reset_index(drop=True)


def _sorted_pd_from_ds(ds):
    import ray
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    t = pa.concat_tables(tables, promote_options="permissive")
    return _sorted_pd(t)


def test_inner_matches_reference_join(tmp_path):
    a, b, da, db = _sides(tmp_path)
    got = _sorted_pd_from_ds(colocated_join(da, db, "k"))
    # single-table Arrow join oracle (pa.Table.join DEFAULTS to left outer)
    want = _sorted_pd(a.join(b, keys="k", join_type="inner"))
    assert got.equals(want)


def test_left_outer_keeps_unmatched(tmp_path):
    a, b, da, db = _sides(tmp_path)
    got = _sorted_pd_from_ds(
        colocated_join(da, db, "k", join_type="left outer")
    )
    want = _sorted_pd(a.join(b, keys="k", join_type="left outer"))
    assert got.equals(want)


def test_bucket_count_mismatch_raises(tmp_path):
    a, b, da, _ = _sides(tmp_path)
    db2 = str(tmp_path / "b2")
    write_bucketed(rd.from_arrow(b), db2, "k", buckets=4)
    with pytest.raises(ValueError, match="layouts disagree"):
        colocated_join(da, db2, "k")


def test_wrong_key_raises(tmp_path):
    _, _, da, db = _sides(tmp_path)
    with pytest.raises(ValueError, match="bucketed on"):
        colocated_join(da, db, "va")


def test_missing_metadata_raises(tmp_path):
    _, _, da, db = _sides(tmp_path)
    import os
    os.remove(os.path.join(db, "_buckets.json"))
    with pytest.raises(ValueError, match="_buckets.json"):
        colocated_join(da, db, "k")


def test_empty_buckets_schema_stable(tmp_path):
    # 2 keys into 8 buckets → most buckets empty on both sides; the join
    # must still emit schema-stable blocks and the right rows
    a = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "va": pa.array([10, 20], pa.int64())})
    b = pa.table({"k": pa.array([2], pa.int64()),
                  "vb": pa.array([200], pa.int64())})
    da, db = str(tmp_path / "ea"), str(tmp_path / "eb")
    write_bucketed(rd.from_arrow(a), da, "k", buckets=8)
    write_bucketed(rd.from_arrow(b), db, "k", buckets=8)
    ds = colocated_join(da, db, "k")
    out = _sorted_pd_from_ds(ds)
    assert out.to_dict("records") == [{"k": 2, "va": 20, "vb": 200}]
    # downstream ops over the (mostly empty) blocks don't crash
    assert ds.count() == 1


def test_bucket_files_are_bounded(tmp_path):
    # the sorted hive write keeps the layout at ~max(blocks, B) files,
    # not blocks × B (tiny-files discipline)
    import glob
    _sides(tmp_path, buckets=8)
    files = glob.glob(str(tmp_path / "a" / "epoch-*" / "__bucket=*" / "*.parquet"))
    assert 0 < len(files) <= 40  # max(blocks, 8) + slack, never blocks*8


def test_append_joins_transparently(tmp_path):
    """write + append must join identically to one export of the union,
    and compaction must fold epochs without changing the result."""
    import glob

    from raydatax.colocated import append_bucketed, compact_bucketed

    rng = np.random.default_rng(3)
    a1 = pa.table({"k": pa.array(rng.integers(0, 60, 200), pa.int64()),
                   "va": pa.array(np.arange(200), pa.int64())})
    a2 = pa.table({"k": pa.array(rng.integers(0, 60, 100), pa.int64()),
                   "va": pa.array(np.arange(200, 300), pa.int64())})
    b = pa.table({"k": pa.array(np.arange(60), pa.int64()),
                  "vb": pa.array(np.arange(1000, 1060), pa.int64())})
    da, db = str(tmp_path / "inc_a"), str(tmp_path / "inc_b")
    write_bucketed(rd.from_arrow(a1), da, "k", buckets=8)
    assert append_bucketed(rd.from_arrow(a2), da, "k") == 1
    write_bucketed(rd.from_arrow(b), db, "k", buckets=8)

    want = _sorted_pd(
        pa.concat_tables([a1, a2]).join(b, keys="k", join_type="inner"))
    got = _sorted_pd_from_ds(colocated_join(da, db, "k"))
    assert got.equals(want)

    rep = compact_bucketed(da)
    assert rep["action"] == "compacted" and rep["folded_epochs"] == 2
    live = [d for d in glob.glob(str(tmp_path / "inc_a" / "epoch-*"))]
    assert len(live) == 1  # folded to one epoch on disk
    got2 = _sorted_pd_from_ds(colocated_join(da, db, "k"))
    assert got2.equals(want)


def test_append_wrong_key_raises(tmp_path):
    from raydatax.colocated import append_bucketed

    _, b, da, _ = _sides(tmp_path)
    with pytest.raises(ValueError, match="bucketed on"):
        append_bucketed(rd.from_arrow(b), da, "vb")


def test_string_key_join(tmp_path):
    """String join keys bucket via the poly+mix64 string hash; both sides
    co-locate by VALUE and the join matches the Arrow oracle."""
    rng = np.random.default_rng(11)
    names = [f"user-{i}" for i in range(40)]
    a = pa.table({
        "name": pa.array([names[i] for i in rng.integers(0, 40, 300)], pa.string()),
        "va": pa.array(np.arange(300), pa.int64()),
    })
    b = pa.table({
        "name": pa.array(names[:25], pa.string()),
        "vb": pa.array(np.arange(25), pa.int64()),
    })
    da, db = str(tmp_path / "sa"), str(tmp_path / "sb")
    write_bucketed(rd.from_arrow(a), da, "name", buckets=8)
    write_bucketed(rd.from_arrow(b), db, "name", buckets=8)
    got = _sorted_pd_from_ds(colocated_join(da, db, "name"))
    want = _sorted_pd(a.join(b, keys="name", join_type="inner"))
    assert got.equals(want)
    # mixing an int-keyed side with a string-keyed side fails loudly
    c = pa.table({"k": pa.array(np.arange(10), pa.int64()),
                  "vc": pa.array(np.arange(10), pa.int64())})
    dc = str(tmp_path / "sc")
    write_bucketed(rd.from_arrow(c), dc, "k", buckets=8)
    with pytest.raises(ValueError, match="layouts disagree"):
        colocated_join(da, dc, "name", "k")


def test_unbucketable_key_type_raises(tmp_path):
    a = pa.table({"k": pa.array([1.5, 2.5]), "v": pa.array([1, 2], pa.int64())})
    with pytest.raises(ValueError, match="bucketable"):
        write_bucketed(rd.from_arrow(a), str(tmp_path / "f"), "k", buckets=4)


def test_group_agg_matches_global_groupby(tmp_path):
    """Per-bucket aggregation unioned == a global groupby, including keys
    whose rows arrived across several epochs."""
    from raydatax.colocated import append_bucketed, colocated_group_agg

    rng = np.random.default_rng(5)
    a1 = pa.table({"k": pa.array(rng.integers(0, 30, 200), pa.int64()),
                   "v": pa.array(rng.integers(0, 100, 200), pa.int64())})
    a2 = pa.table({"k": pa.array(rng.integers(0, 30, 150), pa.int64()),
                   "v": pa.array(rng.integers(0, 100, 150), pa.int64())})
    d = str(tmp_path / "agg")
    write_bucketed(rd.from_arrow(a1), d, "k", buckets=8)
    append_bucketed(rd.from_arrow(a2), d, "k")
    got = _sorted_pd_from_ds(colocated_group_agg(
        d, [("v", "count", "n"), ("v", "sum", "s")]))
    both = pa.concat_tables([a1, a2])
    g = both.group_by("k").aggregate([("v", "count"), ("v", "sum")])
    want = _sorted_pd(pa.table({"k": g["k"], "n": g["v_count"], "s": g["v_sum"]}))
    got = got.astype({"n": "int64", "s": "int64"})
    want = want.astype({"n": "int64", "s": "int64"})
    assert got.equals(want)


# -------------------------------------------------- composite keys (round 5)


def _composite_sides(tmp_path, buckets=8, n=600):
    rng = np.random.default_rng(11)
    a = pa.table({
        "k": pa.array(rng.integers(0, 40, n), pa.int64()),
        "s": pa.array(np.array(["x", "y", "z"])[rng.integers(0, 3, n)]),
        "va": pa.array(np.arange(n), pa.int64()),
    })
    import duckdb
    b = duckdb.sql('SELECT DISTINCT k, s FROM a ORDER BY k, s').arrow()
    b = b.append_column("vb", pa.array(
        np.arange(b.num_rows, dtype=np.int64) * 7))
    da, db = str(tmp_path / "ca"), str(tmp_path / "cb")
    write_bucketed(rd.from_arrow(a), da, ["k", "s"], buckets=buckets)
    write_bucketed(rd.from_arrow(b), db, ["k", "s"], buckets=buckets)
    return a, b, da, db


def test_composite_join_matches_duckdb(tmp_path):
    import duckdb

    a, b, da, db = _composite_sides(tmp_path)
    got = _sorted_pd_from_ds(colocated_join(da, db, ["k", "s"]))
    exp = duckdb.sql(
        "SELECT a.k, a.s, a.va, b.vb FROM a JOIN b USING (k, s)"
    ).df()
    cols = sorted(exp.columns)
    exp = exp[cols].sort_values(cols).reset_index(drop=True)
    assert got.equals(exp)


def test_composite_group_agg_matches_duckdb(tmp_path):
    import duckdb

    from raydatax.colocated import colocated_group_agg

    a, _b, da, _db = _composite_sides(tmp_path)
    got = _sorted_pd_from_ds(
        colocated_group_agg(da, [("va", "sum", "sum_va"),
                                 ("va", "count", "n")])
    )
    exp = duckdb.sql(
        "SELECT k, s, CAST(SUM(va) AS BIGINT) AS sum_va, "
        "COUNT(*) AS n FROM a GROUP BY 1, 2"
    ).df()
    cols = sorted(exp.columns)
    exp = exp[cols].sort_values(cols).reset_index(drop=True)
    assert got.equals(exp)


def test_composite_key_order_mismatch_raises(tmp_path):
    _a, _b, da, db = _composite_sides(tmp_path)
    with pytest.raises(ValueError, match="bucketed on"):
        colocated_join(da, db, ["s", "k"])  # wrong order: combine is ordered


def test_composite_append_kind_mismatch_raises(tmp_path):
    from raydatax.colocated import append_bucketed

    a, _b, da, _db = _composite_sides(tmp_path)
    # delta where s turned into an int: hash-kind list changes → refuse
    bad = pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "s": pa.array([10, 11], pa.int64()),
        "va": pa.array([0, 0], pa.int64()),
    })
    with pytest.raises(ValueError, match="key type changed"):
        append_bucketed(rd.from_arrow(bad), da, ["k", "s"])


def test_composite_append_joins_transparently(tmp_path):
    import duckdb

    from raydatax.colocated import append_bucketed

    a, b, da, db = _composite_sides(tmp_path)
    delta = pa.table({
        "k": pa.array([0, 1, 2], pa.int64()),
        "s": pa.array(["x", "y", "z"]),
        "va": pa.array([9001, 9002, 9003], pa.int64()),
    })
    append_bucketed(rd.from_arrow(delta), da, ["k", "s"])
    both = pa.concat_tables([a, delta])
    got = _sorted_pd_from_ds(colocated_join(da, db, ["k", "s"]))
    exp = duckdb.sql(
        'SELECT t.k, t.s, t.va, b.vb FROM "both" t JOIN b USING (k, s)'
    ).df()
    cols = sorted(exp.columns)
    exp = exp[cols].sort_values(cols).reset_index(drop=True)
    assert got.equals(exp)


def test_single_key_layout_unchanged_by_composite_support(tmp_path):
    """Round-4 single-column exports must keep their scalar metadata shape
    and bucket mapping (mix64(col) % B with NO combine step)."""
    import json
    import os

    from raydatax.partition import hash_ints

    a, _b, da, _db = _sides(tmp_path)
    with open(os.path.join(da, "_buckets.json")) as f:
        meta = json.load(f)
    assert meta["key"] == "k" and meta["hash"] == "mix64"  # scalar, not list
    # spot-check one row's physical bucket
    k0 = a["k"][0].as_py()
    expected = int(hash_ints(np.array([k0])) % np.uint64(meta["buckets"]))
    import glob
    files = glob.glob(os.path.join(da, "epoch-0", f"__bucket={expected}", "*.parquet"))
    import pyarrow.parquet as pq
    found = any(
        k0 in pq.read_table(f, columns=["k"])["k"].to_pylist() for f in files
    )
    assert found
