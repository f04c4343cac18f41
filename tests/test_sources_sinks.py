"""DataX reader/writer parity: CSV column-spec semantics, synthetic stream
source, writeMode file sinks, and the exchange map planner."""

import glob
import os

import pyarrow as pa
import pytest

from raydatax.exchange import plan_map_chunks, split_by_partition
from raydatax.sinks import WriteModeError, write_files
from raydatax.sources import ColumnEntry, apply_column_spec, read_csv_datax, synthetic_stream


def _write_csv(tmp_path, name, text):
    p = str(tmp_path / name)
    with open(p, "w") as f:
        f.write(text)
    return p


def test_csv_column_spec(tmp_path):
    p = _write_csv(
        tmp_path, "a.csv",
        "1,alice,2020-01-02 03:04:05,true,\\N\n2,bob,2021-12-31 23:59:59,false,x\n",
    )
    spec = [
        ColumnEntry(index=0, type="long", name="id"),
        ColumnEntry(index=1, type="string", name="name"),
        ColumnEntry(index=2, type="date", format="%Y-%m-%d %H:%M:%S", name="ts"),
        ColumnEntry(index=3, type="boolean", name="flag"),
        ColumnEntry(value="const!", type="string", name="tag"),  # const injection
        ColumnEntry(index=4, type="string", name="opt"),
    ]
    ds = read_csv_datax(p, spec, null_format="\\N")
    rows = sorted(ds.take_all(), key=lambda r: r["id"])  # block order is not guaranteed
    assert rows[0]["id"] == 1 and rows[0]["name"] == "alice"
    assert str(rows[0]["ts"]).startswith("2020-01-02")
    assert rows[0]["flag"] is True and rows[1]["flag"] is False
    assert {r["tag"] for r in rows} == {"const!"}
    assert rows[0]["opt"] is None and rows[1]["opt"] == "x"  # nullFormat


def test_csv_reorder_and_projection():
    batch = pa.table({"c0": ["9", "8"], "c1": ["a", "b"], "c2": ["1.5", "2.5"]})
    spec = [ColumnEntry(index=2, type="double", name="v"),
            ColumnEntry(index=0, type="long", name="k")]
    out = apply_column_spec(batch, spec)
    assert out.column_names == ["v", "k"]
    assert out["v"].to_pylist() == [1.5, 2.5]
    assert out["k"].to_pylist() == [9, 8]


def test_synthetic_stream_deterministic():
    a = synthetic_stream(4000, seed=9, shards=4).take_all()
    b = synthetic_stream(4000, seed=9, shards=4).take_all()
    assert len(a) == len(b) > 0
    sa = sorted(r["seq"] for r in a)
    sb = sorted(r["seq"] for r in b)
    assert sa == sb
    assert len(set(sa)) == len(sa), "seq must be globally unique across shards"


def test_write_modes(tmp_path):
    import ray.data as rd

    ds = rd.from_items([{"a": 1}, {"a": 2}])
    out = str(tmp_path / "out")
    write_files(ds, out, fmt="parquet", write_mode="nonConflict")
    n1 = len(glob.glob(os.path.join(out, "*")))
    assert n1 > 0
    with pytest.raises(WriteModeError):
        write_files(ds, out, fmt="parquet", write_mode="nonConflict")
    write_files(ds, out, fmt="parquet", write_mode="append")
    assert len(glob.glob(os.path.join(out, "*"))) > n1
    write_files(ds, out, fmt="csv", write_mode="truncate")
    files = glob.glob(os.path.join(out, "*"))
    assert files and all(f.endswith(".csv") for f in files)
    with pytest.raises(ValueError):
        write_files(ds, out, fmt="parquet", write_mode="bogus")


def test_plan_map_chunks(tmp_path):
    import pyarrow.parquet as pq

    t = pa.table({"seq": pa.array(range(10_000), pa.int64())})
    p = str(tmp_path / "seg.parquet")
    pq.write_table(t, p, row_group_size=1000)
    chunks = plan_map_chunks([p], target_rows=2500)
    assert len(chunks) == 4
    assert all(path == p for path, _ in chunks)
    covered = [rg for _, rgs in chunks for rg in rgs]
    assert covered == list(range(10))


def test_split_by_partition_covers_all_rows():
    t = pa.table({"x": list(range(100)), "__part": [i % 7 for i in range(100)]})
    parts = split_by_partition(t, 7)
    assert sum(p.num_rows for p in parts) == 100
    for pid, p in enumerate(parts):
        assert p.num_rows == len([i for i in range(100) if i % 7 == pid])
        assert "__part" not in p.column_names


def test_csv_gzip_compression(tmp_path):
    """Compressed CSV inputs (the unstructured-storage codec surface) are
    handled transparently by the Arrow filesystem layer."""
    import gzip

    p = str(tmp_path / "a.csv.gz")
    with gzip.open(p, "wt") as f:
        f.write("5,five\n6,six\n")
    spec = [ColumnEntry(index=0, type="long", name="id"),
            ColumnEntry(index=1, type="string", name="w")]
    rows = sorted(read_csv_datax(p, spec).take_all(), key=lambda r: r["id"])
    assert [r["id"] for r in rows] == [5, 6]
    assert rows[1]["w"] == "six"
