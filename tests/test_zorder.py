"""Z-order clustering: Morton codes, multi-column pruning, box scans."""

import glob
import tempfile

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from raydatax.sources import plan_box, read_box, write_zordered, zorder_codes


def _grid_table(n=40_000):
    i = np.arange(n, dtype=np.int64)
    return pa.table(
        {
            "row_id": i,
            "a": i % 200,
            "b": (i * 7919) % 1000,
        }
    )


def test_zorder_codes_locality():
    # neighbors in 2-D space get closer codes than distant points
    a = np.array([5.0, 5.0, 900.0])
    b = np.array([7.0, 8.0, 900.0])
    z = zorder_codes([a, b], [(0.0, 1000.0), (0.0, 1000.0)], bits=16)
    assert abs(int(z[0]) - int(z[1])) < abs(int(z[0]) - int(z[2]))


def test_zorder_codes_guards():
    with pytest.raises(ValueError):
        zorder_codes([np.ones(3)] * 5, [(0.0, 1.0)] * 5, bits=16)
    # degenerate bounds (constant column) quantize to 0, no crash
    z = zorder_codes([np.ones(4)], [(1.0, 1.0)], bits=8)
    assert (z == 0).all()


def test_box_scan_exact_and_prunes_on_second_dim(ray_session):
    t = _grid_table()
    zdir = tempfile.mkdtemp(prefix="zo_t_")
    sdir = tempfile.mkdtemp(prefix="s1_t_")
    write_zordered(rd.from_arrow(t), zdir, ["a", "b"], row_group_size=1024)
    rd.from_arrow(t).sort("a").write_parquet(sdir, row_group_size=1024)

    # a box selective ONLY on the second column: the 1-D layout cannot
    # prune it at all, the z-ordered layout must
    preds = {"b": (100.0, 150.0)}
    pz, _ = plan_box(sorted(glob.glob(zdir + "/*.parquet")), preds)
    ps, _ = plan_box(sorted(glob.glob(sdir + "/*.parquet")), preds)
    kept_z = sum(len(r) for _, r in pz)
    kept_s = sum(len(r) for _, r in ps)
    assert kept_z < kept_s / 2, (kept_z, kept_s)

    got = read_box(zdir, preds, columns=["row_id", "a", "b"]).to_pandas()
    got = got.sort_values("row_id").reset_index(drop=True)
    df = t.to_pandas()
    want = (
        df[(df.b >= 100) & (df.b < 150)]
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_box_scan_conjunctive_and_open_ends(ray_session):
    t = _grid_table(8_000)
    zdir = tempfile.mkdtemp(prefix="zo_t2_")
    write_zordered(rd.from_arrow(t), zdir, ["a", "b"], row_group_size=512)
    got = read_box(
        zdir, {"a": (10, 20), "b": (None, 500.0)}, columns=["row_id"]
    ).to_pandas()
    df = t.to_pandas()
    want = df[(df.a >= 10) & (df.a < 20) & (df.b < 500)][["row_id"]]
    assert sorted(got.row_id) == sorted(want.row_id)


def test_box_scan_fully_pruned_keeps_schema(ray_session):
    t = _grid_table(2_000)
    zdir = tempfile.mkdtemp(prefix="zo_t3_")
    write_zordered(rd.from_arrow(t), zdir, ["a", "b"], row_group_size=512)
    out = read_box(zdir, {"b": (5000.0, 6000.0)}, columns=["row_id", "b"])
    assert out.count() == 0
    assert out.schema().names == ["row_id", "b"]
