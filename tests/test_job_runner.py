"""Declarative job-JSON runner (DataX `python datax.py job.json` parity)."""

import glob
import os

import pytest

from raydatax.job import JobConfigError, run_job_config


def test_stream_to_parquet_with_transformers(tmp_path):
    out = str(tmp_path / "out")
    cfg = {
        "job": {
            "content": [{
                "reader": {"name": "streamreader",
                           "parameter": {"sliceRecordCount": 500, "channel": 2, "seed": 7}},
                "transformer": [
                    {"name": "dx_substr", "parameter": {"column": "text", "paras": [0, 20]}},
                    {"name": "dx_filter", "parameter": {"column": "op", "paras": ["=", "D"]}},
                ],
                "writer": {"name": "parquetwriter",
                           "parameter": {"path": out, "writeMode": "truncate"}},
            }],
        }
    }
    rep = run_job_config(cfg)
    assert rep["contents"][0]["rows"] > 0
    import pyarrow.parquet as pq

    files = glob.glob(os.path.join(out, "*.parquet"))
    t = pq.read_table(files[0])
    assert max(len(x) for x in t["text"].to_pylist() if x) <= 20
    assert "D" not in set(t["op"].to_pylist())  # dx_filter dropped deletes


def test_csv_to_json(tmp_path):
    src = str(tmp_path / "in.csv")
    open(src, "w").write("1,alpha\n2,beta\n")
    out = str(tmp_path / "o")
    cfg = {
        "job": {"content": [{
            "reader": {"name": "csvreader", "parameter": {
                "path": src,
                "column": [{"index": 0, "type": "long", "name": "id"},
                           {"index": 1, "type": "string", "name": "word"},
                           {"value": "k", "type": "string", "name": "tag"}],
            }},
            "writer": {"name": "jsonwriter", "parameter": {"path": out}},
        }]}
    }
    rep = run_job_config(cfg)
    assert rep["contents"][0]["rows"] == 2
    import json as j

    lines = [j.loads(line) for f in glob.glob(os.path.join(out, "*.json"))
             for line in open(f)]
    assert sorted(r["id"] for r in lines) == [1, 2]
    assert all(r["tag"] == "k" for r in lines)


def test_wal_to_lake_cdc_path(tmp_path):
    from raydatax.gen import gen_wal

    wal = str(tmp_path / "wal")
    gen_wal(wal, 5000, seed=9, seg_rows=1000)
    lake = str(tmp_path / "lake")
    cfg = {
        "job": {
            "content": [{
                "reader": {"name": "walreader", "parameter": {"path": wal}},
                "writer": {"name": "lakewriter",
                           "parameter": {"path": lake, "partitions": 4}},
            }],
            "setting": {"errorLimit": {"record": 0}},
        }
    }
    rep = run_job_config(cfg)
    c = rep["contents"][0]
    assert c["action"] == "applied" and c["rows_total"] > 0
    assert os.path.exists(os.path.join(lake, "_lake.json"))


def test_stream_to_streamwriter_and_walwriter(tmp_path):
    cfg = {
        "job": {"content": [{
            "reader": {"name": "streamreader", "parameter": {"sliceRecordCount": 300}},
            "writer": {"name": "streamwriter", "parameter": {"print": 2}},
        }]}
    }
    rep = run_job_config(cfg)
    assert rep["contents"][0]["rows"] > 0

    wal_out = str(tmp_path / "walout")
    cfg["job"]["content"][0]["writer"] = {"name": "walwriter",
                                          "parameter": {"path": wal_out, "segRows": 200}}
    rep = run_job_config(cfg)
    assert rep["contents"][0]["segments"] >= 1


def test_bad_config():
    with pytest.raises(JobConfigError):
        run_job_config({"job": {}})
    with pytest.raises(JobConfigError):
        run_job_config({"job": {"content": [{"reader": {"name": "nope"},
                                             "writer": {"name": "parquetwriter",
                                                        "parameter": {"path": "/tmp/x"}}}]}})


def test_multi_step_job_chains_wal_to_lake(tmp_path):
    """One config, two contents: produce a WAL, then ingest it — the
    pipeline-chaining story through the declarative surface."""
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    cfg = {
        "job": {
            "content": [
                {"reader": {"name": "streamreader",
                            "parameter": {"sliceRecordCount": 1000, "channel": 2, "seed": 3}},
                 "writer": {"name": "walwriter", "parameter": {"path": wal, "segRows": 500}}},
                {"reader": {"name": "walreader", "parameter": {"path": wal}},
                 "writer": {"name": "lakewriter", "parameter": {"path": lake, "partitions": 4}}},
            ]
        }
    }
    rep = run_job_config(cfg)
    assert rep["contents"][0]["writer"] == "walwriter"
    assert rep["contents"][1]["action"] == "applied"
    assert rep["contents"][1]["rows_total"] > 0


def test_job_runner_search_and_keyrange_readers(ray_session, tmp_path):
    """Job-JSON surface for the search-reader and rowkey-range families."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydatax.job import run_job_config

    corpus = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(["cat cat", "dog", "cat", "x", "cat dog dog", "y"]),
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(corpus, src)

    out = str(tmp_path / "hits")
    rep = run_job_config({"job": {"content": [{
        "reader": {"name": "searchreader",
                   "parameter": {"path": src, "terms": ["cat", "dog"],
                                 "topK": 3}},
        "writer": {"name": "parquetwriter",
                   "parameter": {"path": out, "writeMode": "truncate"}},
    }]}})
    assert rep["contents"][0]["rows"] == 3

    kv = pa.table({
        "k": pa.array([1, 1, 2, 3], pa.int64()),
        "seq": pa.array([1, 2, 1, 1], pa.int64()),
        "v": pa.array(["a", "A", "b", "c"]),
    })
    kvp = str(tmp_path / "kv.parquet")
    pq.write_table(kv, kvp)
    out2 = str(tmp_path / "latest")
    rep = run_job_config({"job": {"content": [{
        "reader": {"name": "hbasereader",
                   "parameter": {"path": kvp, "rowkeyColumn": "k",
                                 "startRowkey": 1, "endRowkey": 3,
                                 "mode": "normal", "versionColumn": "seq"}},
        "writer": {"name": "parquetwriter",
                   "parameter": {"path": out2, "writeMode": "truncate"}},
    }]}})
    assert rep["contents"][0]["rows"] == 2  # latest of k=1, plus k=2
