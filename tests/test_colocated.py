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
