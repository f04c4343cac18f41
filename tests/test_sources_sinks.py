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


def test_csv_whole_file_codecs(tmp_path):
    """bz2 / zip / xz / zstd / snappy (raw-block AND framed) CSVs
    decompress whole-file inside the read task (one task per file,
    txtfilereader split unit); non-snappy bytes under a .snappy name raise
    the documented NotImplementedError, corrupt LZO raises LzoError (the
    decodable-LZO path itself is covered in test_lzo.py)."""
    import bz2
    import lzma
    import zipfile

    body = "7,seven\n8,eight\n"
    spec = [ColumnEntry(index=0, type="long", name="id"),
            ColumnEntry(index=1, type="string", name="w")]

    paths = []
    p = str(tmp_path / "a.csv.bz2")
    with bz2.open(p, "wt") as f:
        f.write(body)
    paths.append(p)
    p = str(tmp_path / "b.csv.xz")
    with lzma.open(p, "wt") as f:
        f.write("9,nine\n")
    paths.append(p)
    p = str(tmp_path / "c.csv.zip")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("inner.csv", "10,ten\n")
    paths.append(p)
    p = str(tmp_path / "d.csv.zst")
    import pyarrow as _pa

    with _pa.output_stream(p, compression="zstd") as f:
        f.write(b"11,eleven\n")
    paths.append(p)
    # raw snappy block (varint preamble, what pa.compress emits)
    p = str(tmp_path / "e.csv.snappy")
    with open(p, "wb") as f:
        f.write(bytes(_pa.compress(b"12,twelve\n", codec="snappy")))
    paths.append(p)
    # framed snappy: sNaPpY identifier + one compressed chunk (CRC unchecked)
    raw = bytes(_pa.compress(b"13,thirteen\n", codec="snappy"))
    chunk = b"\x00" + (len(raw) + 4).to_bytes(3, "little") + b"\x00\x00\x00\x00" + raw
    p = str(tmp_path / "f.csv.snappy")
    with open(p, "wb") as f:
        f.write(b"\xff\x06\x00\x00sNaPpY" + chunk)
    paths.append(p)

    rows = sorted(read_csv_datax(paths, spec).take_all(), key=lambda r: r["id"])
    assert [r["id"] for r in rows] == [7, 8, 9, 10, 11, 12, 13]
    assert rows[-1]["w"] == "thirteen"

    from raydatax.sources import decompress_file_bytes

    with pytest.raises(NotImplementedError, match="snappy"):
        decompress_file_bytes("x.csv.snappy", b"\xff\xff\xff\xffgarbage")
    # LZO is decodable now (raydatax.lzo); garbage still fails loudly.
    from raydatax.lzo import LzoError

    with pytest.raises(LzoError):
        decompress_file_bytes("x.csv.lzo", b"data")


def test_zip_members_parsed_individually_and_mixed_lists(tmp_path):
    """Each zip member is its own CSV (skipHeader applies per member), and
    a mixed plain+compressed path list unions both read paths."""
    import zipfile

    z = str(tmp_path / "two.csv.zip")
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("m1.csv", "id,w\n1,one\n2,two\n")
        zf.writestr("m2.csv", "id,w\n3,three\n")
    plain = str(tmp_path / "p.csv")
    with open(plain, "w") as f:
        f.write("id,w\n4,four\n")
    spec = [ColumnEntry(index=0, type="long", name="id"),
            ColumnEntry(index=1, type="string", name="w")]
    rows = sorted(
        read_csv_datax([plain, z], spec, skip_header=True).take_all(),
        key=lambda r: r["id"],
    )
    assert [r["id"] for r in rows] == [1, 2, 3, 4]
    assert rows[2]["w"] == "three"  # m2's header did NOT become a data row


def test_grouped_percentiles_degenerate_and_null_groups():
    """Histogram path: a constant-value group returns that value exactly,
    and NULL values are excluded (quantile_cont semantics)."""
    import ray.data as rd

    from raydatax.relational import grouped_percentiles

    t = pa.table({
        "k": ["c"] * 100 + ["m"] * 100 + ["n"] * 4,
        "v": [7.0] * 100 + [float(i) for i in range(100)] + [None, None, 0.0, 100.0],
    })
    out = (
        grouped_percentiles(rd.from_arrow(t), "k", "v", [("p50", 0.5)],
                            exact_threshold=0)
        .to_pandas().set_index("k")
    )
    assert out.loc["c", "p50"] == 7.0          # degenerate group: exact
    assert abs(out.loc["m", "p50"] - 49.5) < (99 / 8192) * 2
    assert out.loc["n", "n"] == 2              # nulls excluded from count
    assert 0.0 <= out.loc["n", "p50"] <= 100.0


def test_propagate_min_labels_raises_on_nonconvergence():
    import pytest as _pytest
    import ray.data as rd

    from raydatax.dedup import propagate_min_labels

    pairs = rd.from_arrow(
        pa.table({"a": pa.array([1, 2, 3, 4], pa.int64()),
                  "b": pa.array([2, 3, 4, 5], pa.int64())})
    )
    with _pytest.raises(RuntimeError, match="converge"):
        propagate_min_labels(pairs, max_rounds=1)


def test_partitioned_write_read_roundtrip(tmp_path):
    """Hive-partitioned sink + directory-pruned read (odps partitioned
    table parity): only the filtered partition's files are listed."""
    import glob as g

    import pyarrow.parquet as pq
    import ray.data as rd

    from raydatax.sinks import read_partitioned, write_partitioned

    t = pa.table({"k": ["a", "b", "a", "c", "b", "a"],
                  "v": [1, 2, 3, 4, 5, 6]})
    out = str(tmp_path / "part")
    write_partitioned(rd.from_arrow(t), out, ["k"])
    dirs = sorted(os.path.basename(p) for p in g.glob(os.path.join(out, "k=*")))
    assert dirs == ["k=a", "k=b", "k=c"]
    got = read_partitioned(out, filters={"k": "a"}).to_pandas()
    assert sorted(got["v"].tolist()) == [1, 3, 6]
    # no filter → everything
    assert read_partitioned(out).count() == 6


def test_exchange_watchdog_detects_stall(ray_session):
    """wait_with_watchdog raises StageStalledError when no task completes
    within the hang timeout (TaskMonitor no-progress parity), and passes
    through quietly when tasks finish."""
    import ray as _ray

    from raydatax.exchange import StageStalledError, wait_with_watchdog

    @_ray.remote
    def quick():
        return 1

    refs = [quick.remote() for _ in range(4)]
    assert wait_with_watchdog(refs, "map", hang_timeout_s=30.0, poll_s=0.2) == refs

    @_ray.remote
    def stuck():
        import time as _t

        _t.sleep(60)

    ref = [stuck.remote()]
    with pytest.raises(StageStalledError, match="map stage stalled: 0/1"):
        wait_with_watchdog(ref, "map", hang_timeout_s=1.0, poll_s=0.2)
    _ray.cancel(ref[0], force=True)


def test_jsonl_nested_doc_extraction(tmp_path):
    """mongodbreader nested-document contract: dotted paths walk
    sub-documents; a missing path yields NULLs, never misalignment."""
    import json as _json

    from raydatax.sources import read_jsonl

    p = tmp_path / "dump.jsonl"
    rows = [
        {"doc_id": 1, "meta": {"lang": "en", "source": "web"}, "n": 10},
        {"doc_id": 2, "meta": {"lang": "fr", "source": "book"}, "n": 20},
        {"doc_id": 3, "meta": {"lang": "de", "source": "web"}, "n": 30},
    ]
    p.write_text("\n".join(_json.dumps(r) for r in rows) + "\n")

    out = read_jsonl(
        str(p),
        doc_paths=[("doc_id", "doc_id"), ("meta.lang", "lang"),
                   ("missing.path", "gone"), ("n", "n")],
    ).take_all()
    out.sort(key=lambda r: r["doc_id"])
    assert [r["lang"] for r in out] == ["en", "fr", "de"]
    assert [r["gone"] for r in out] == [None, None, None]
    assert [r["n"] for r in out] == [10, 20, 30]


def test_write_jsonl_nested_roundtrip(ray_session, tmp_path):
    """mongodbwriter analogue: flat columns assembled into depth-2 nested
    sub-documents (write_jsonl doc_paths), read back through the reader's
    dotted-path extraction — exact inverse contract."""
    import json as _json

    import ray.data as rd

    from raydatax.sinks import write_jsonl
    from raydatax.sources import read_jsonl

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "lang": pa.array(["en", "fr", None], pa.string()),
        "site": pa.array(["web", "book", "web"], pa.string()),
        "n": pa.array([10, 20, 30], pa.int64()),
    })
    out = str(tmp_path / "dump")
    write_jsonl(
        rd.from_arrow(t), out,
        doc_paths=[("doc_id", "doc_id"), ("meta.lang", "lang"),
                   ("meta.src.site", "site"), ("n", "n")],
    )
    # raw JSON really is nested (depth 2)
    import glob

    lines = []
    for f in sorted(glob.glob(out + "/*.json")):
        lines += [_json.loads(x) for x in open(f) if x.strip()]
    by_id = {r["doc_id"]: r for r in lines}
    assert by_id[1]["meta"]["src"]["site"] == "web"
    assert by_id[3]["meta"]["lang"] is None

    back = read_jsonl(
        out, doc_paths=[("doc_id", "doc_id"), ("meta.lang", "lang"),
                        ("meta.src.site", "site"), ("n", "n")],
    ).take_all()
    back.sort(key=lambda r: r["doc_id"])
    assert [r["site"] for r in back] == ["web", "book", "web"]
    assert [r["lang"] for r in back] == ["en", "fr", None]
    assert [r["n"] for r in back] == [10, 20, 30]


def test_write_jsonl_leaf_prefix_conflict(ray_session, tmp_path):
    import ray.data as rd

    from raydatax.sinks import write_jsonl

    t = pa.table({"a": pa.array([1]), "b": pa.array([2])})
    with pytest.raises(Exception, match="leaf and a sub-document"):
        write_jsonl(rd.from_arrow(t), str(tmp_path / "x"),
                    doc_paths=[("m", "a"), ("m.b", "b")])


def test_jsonreader_job_doc_paths(tmp_path):
    import json as _json

    from raydatax.job import run_job_config

    src = tmp_path / "in.jsonl"
    src.write_text(
        "\n".join(
            _json.dumps({"k": i, "meta": {"v": f"x{i}"}}) for i in range(5)
        )
        + "\n"
    )
    dest = tmp_path / "out"
    cfg = {
        "job": {
            "content": [{
                "reader": {"name": "jsonreader",
                           "parameter": {"path": str(src),
                                         "docPaths": [
                                             {"path": "k", "name": "k"},
                                             {"path": "meta.v", "name": "v"}]}},
                "writer": {"name": "csvwriter",
                           "parameter": {"path": str(dest),
                                         "writeMode": "truncate"}},
            }]
        }
    }
    run_job_config(cfg)
    import glob

    files = glob.glob(str(dest / "*"))
    assert files
    body = "".join(open(f).read() for f in files)
    assert "x3" in body


def test_key_range_plan_prunes_row_groups(tmp_path):
    """Row groups whose footer stats cannot overlap [start, stop) are never
    opened — the region-pruning analogue (Hbase11xHelper.java:290-330)."""
    import pyarrow.parquet as pq

    from raydatax.sources import plan_key_range

    t = pa.table({"k": pa.array(range(1000), pa.int64()),
                  "v": pa.array(range(1000), pa.int64())})
    p = str(tmp_path / "kv.parquet")
    pq.write_table(t, p, row_group_size=100)  # 10 "regions", k sorted

    plans, pruned = plan_key_range([p], "k", 250, 420)
    assert pruned == 7
    assert plans == [(p, [2, 3, 4])]
    # unbounded sides
    plans, pruned = plan_key_range([p], "k", None, 100)
    assert plans == [(p, [0])] and pruned == 9
    # fully pruned
    plans, pruned = plan_key_range([p], "k", 5000, None)
    assert plans == [] and pruned == 10


def test_key_range_scan_modes(ray_session, tmp_path):
    """multiVersion yields every stored version; normal collapses to the
    latest per rowkey; string keys work; exact bounds applied in-task."""
    import pyarrow.parquet as pq

    from raydatax.sources import read_key_range

    t = pa.table({
        "k": pa.array(["a", "a", "b", "b", "b", "c", "d"], pa.string()),
        "seq": pa.array([1, 2, 1, 3, 2, 1, 1], pa.int64()),
        "v": pa.array([10, 20, 30, 40, 50, 60, 70], pa.int64()),
    })
    p = str(tmp_path / "kv.parquet")
    pq.write_table(t, p, row_group_size=3)

    multi = read_key_range(p, "k", "a", "c").take_all()
    assert len(multi) == 5  # every version of a and b, c/d excluded

    norm = read_key_range(p, "k", "a", "c", mode="normal").take_all()
    norm.sort(key=lambda r: r["k"])
    assert [(r["k"], r["seq"], r["v"]) for r in norm] == [("a", 2, 20), ("b", 3, 40)]

    # projection without the key column still range-filters correctly
    vals = read_key_range(p, "k", "b", "d", columns=["v"]).take_all()
    assert sorted(r["v"] for r in vals) == [30, 40, 50, 60]
    assert set(vals[0]) == {"v"}

    # fully-pruned range -> empty dataset with the projected schema
    empty = read_key_range(p, "k", "zz", None, columns=["k", "v"])
    assert empty.count() == 0
    assert set(empty.schema().names) == {"k", "v"}

    with pytest.raises(ValueError, match="unknown mode"):
        read_key_range(p, "k", mode="latest")


def test_key_range_nested_schema_stats_resolved_by_leaf_path(tmp_path):
    """A nested column BEFORE the rowkey must not shift the statistics
    lookup (parquet leaf index != Arrow field index)."""
    import pyarrow.parquet as pq

    from raydatax.sources import plan_key_range

    t = pa.table({
        "meta": pa.array([{"a": i, "b": i * 2} for i in range(6)]),
        "k": pa.array(range(6), pa.int64()),
        "v": pa.array(range(6), pa.int64()),
    })
    p = str(tmp_path / "nested.parquet")
    pq.write_table(t, p, row_group_size=3)
    plans, pruned = plan_key_range([p], "k", 4, None)
    assert plans == [(p, [1])] and pruned == 1
    with pytest.raises(KeyError, match="leaf"):
        plan_key_range([p], "meta", 0, None)


def test_key_range_normal_mode_projection_without_keys(ray_session, tmp_path):
    """normal mode with a column list omitting key/version columns still
    works: they are read for LWW, then projected away."""
    import pyarrow.parquet as pq

    from raydatax.sources import read_key_range

    t = pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "seq": pa.array([1, 2, 1], pa.int64()),
        "v": pa.array(["old", "new", "b"], pa.string()),
    })
    p = str(tmp_path / "kv.parquet")
    pq.write_table(t, p)
    rows = read_key_range(p, "k", 1, 3, columns=["v"], mode="normal").take_all()
    assert sorted(r["v"] for r in rows) == ["b", "new"]
    assert set(rows[0]) == {"v"}


def test_synthetic_columns_mixup_spec(ray_session):
    """streamreader column-spec generator (StreamReader.java:95-166,
    221-306): const value takes priority, random ranges per type, BOOL is
    a false:true ratio, deterministic per (seed, shard)."""
    from raydatax.sources import synthetic_columns

    spec = [
        {"type": "long", "random": "5, 9", "name": "n"},
        {"type": "string", "random": "2, 4", "name": "s"},
        {"type": "double", "random": "0, 1", "name": "d"},
        {"type": "bool", "random": "0, 1", "name": "b"},  # always true
        {"type": "date", "random": "2014-07-07 00:00:00, 2016-07-07 00:00:00",
         "name": "t"},
        {"type": "bytes", "random": "1, 2", "name": "raw"},
        {"type": "string", "value": "k", "random": "9, 9", "name": "c"},
    ]
    rows = synthetic_columns(spec, 500, seed=3, shards=4).take_all()
    assert len(rows) == 500
    assert all(5 <= r["n"] <= 9 for r in rows)
    assert all(2 <= len(r["s"]) <= 4 and r["s"].isalnum() for r in rows)
    assert all(0 <= r["d"] <= 1 for r in rows)
    assert all(r["b"] is True for r in rows)
    assert all(2014 <= r["t"].year <= 2016 for r in rows)
    assert all(isinstance(r["raw"], bytes) and 1 <= len(r["raw"]) <= 2 for r in rows)
    assert {r["c"] for r in rows} == {"k"}  # value beats random

    again = synthetic_columns(spec, 500, seed=3, shards=4).take_all()
    assert sorted(map(str, again)) == sorted(map(str, rows))

    with pytest.raises(Exception, match="value or random"):
        synthetic_columns([{"type": "long"}], 10, shards=1).take_all()


def test_read_tsdb_interval_splits_exact(ray_session, tmp_path):
    """tsdbreader analogue: per-interval read tasks; a row group spanning
    two windows is exact-filtered (no loss, no duplication); metric
    predicate pushed; projection without ts/metric still filters."""
    import datetime as dt

    import pyarrow.parquet as pq

    from raydatax.sources import read_tsdb

    base = dt.datetime(2024, 3, 1)
    n = 240  # one row per minute for 4 hours
    t = pa.table({
        "ts": pa.array([base + dt.timedelta(minutes=i) for i in range(n)],
                       pa.timestamp("us")),
        "metric": pa.array(["cpu", "mem"]).take(
            pa.array([i % 2 for i in range(n)])),
        "v": pa.array(range(n), pa.int64()),
    })
    p = str(tmp_path / "ts.parquet")
    pq.write_table(t, p, row_group_size=90)  # groups straddle hour bounds

    ds = read_tsdb(p, "ts", start=base + dt.timedelta(hours=1),
                   end=base + dt.timedelta(hours=3), interval_s=3600)
    rows = ds.take_all()
    assert len(rows) == 120  # exactly hours [1, 3)
    assert len({r["v"] for r in rows}) == 120  # no duplicates across windows

    only_cpu = read_tsdb(p, "ts", start=base, end=base + dt.timedelta(hours=4),
                         interval_s=3600, metric_col="metric",
                         metrics=["cpu"]).take_all()
    assert len(only_cpu) == 120 and all(r["metric"] == "cpu" for r in only_cpu)

    proj = read_tsdb(p, "ts", start=base + dt.timedelta(hours=2),
                     end=base + dt.timedelta(hours=3), interval_s=1800,
                     metric_col="metric", metrics=["mem"],
                     columns=["v"]).take_all()
    assert len(proj) == 30 and set(proj[0]) == {"v"}


def test_csv_non_utf8_encodings(tmp_path, ray_session):
    """Charset handling (UnstructuredStorageReaderUtil encoding knob,
    /root/reference/plugin-unstructured-storage-util/.../UnstructuredStorageReaderUtil.java):
    GBK and latin-1 CSVs decode to identical UTF-8 Arrow strings, both on
    the block-split path and the whole-file codec path."""
    import gzip

    spec = [ColumnEntry(index=0, type="long", name="id"),
            ColumnEntry(index=1, type="string", name="w")]
    p1 = str(tmp_path / "gbk.csv")
    with open(p1, "wb") as f:
        f.write("1,中文测试\n2,北京\n".encode("gbk"))
    out = read_csv_datax(p1, column_spec=spec, encoding="gbk").take_all()
    assert sorted(r["w"] for r in out) == ["中文测试", "北京"]

    p2 = str(tmp_path / "lat.csv.bz2")
    import bz2
    with open(p2, "wb") as f:
        f.write(bz2.compress("3,café\n".encode("latin-1")))
    out2 = read_csv_datax(p2, column_spec=spec, encoding="latin-1").take_all()
    assert out2[0]["w"] == "café"


def test_write_sorted_global_order_and_range_read(tmp_path, ray_session):
    import json

    import numpy as np
    import ray.data as rd

    from raydatax.sinks import read_sorted, write_sorted

    rng = np.random.default_rng(21)
    keys = rng.permutation(20_000)
    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "v": pa.array(keys * 2, pa.int64())})
    out = str(tmp_path / "sorted")
    man = write_sorted(rd.from_arrow(t).repartition(6), out, "k")
    assert man["rows"] == 20_000
    # file order is global order: ranges strictly non-overlapping
    files = man["files"]
    assert all(a["max"] <= b["min"] for a, b in zip(files, files[1:]))
    # full read-back in order
    got = read_sorted(out).to_pandas()["k"].to_numpy()
    assert (got == np.sort(keys)).all()
    # manifest-pruned range read
    sub = read_sorted(out, key_range=(5000, 6000)).to_pandas()
    assert set(range(5000, 6000)) <= set(sub["k"])
    assert len(json.load(open(f"{out}/_sorted.json"))["files"]) >= 2
    # idempotent re-run over the same dir (truncate default)
    man2 = write_sorted(rd.from_arrow(t).repartition(6), out, "k")
    assert man2["rows"] == man["rows"]
