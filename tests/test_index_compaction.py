"""Persistent-index compaction (``dedup.compact_index``): epochs fold into
one bucket-partitioned epoch behind a crash-atomic horizon marker; probe
results are identical before and after, for all three index kinds."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from raydatax.dedup import (
    _index_epochs,
    _index_files_for_buckets,
    _lsh_index_files,
    compact_index,
    incremental_exact_dedup,
)


@pytest.fixture(scope="module")
def docs():
    return pq.read_table("/root/testdata/sf0.001/documents.parquet")


def _corpus(ids, texts):
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    ).repartition(2)


def _epoch_dirs(idx):
    return sorted(d for d in os.listdir(idx) if d.startswith("epoch-"))


def test_exact_index_compaction_probe_equality(tmp_path):
    idx = str(tmp_path / "idx")
    incremental_exact_dedup(_corpus([1, 2], ["aaa", "bbb"]), idx).materialize()
    incremental_exact_dedup(_corpus([10, 11], ["ccc", "ddd"]), idx).materialize()
    incremental_exact_dedup(_corpus([20], ["eee"]), idx).materialize()
    assert len(_epoch_dirs(idx)) == 3

    rep = compact_index(idx)
    assert rep["action"] == "compacted" and rep["folded_epochs"] == 3
    # folded dirs gone; exactly the merged epoch remains, marker inside
    dirs = _epoch_dirs(idx)
    assert dirs == [f"epoch-{rep['epoch']}"]
    assert os.path.exists(os.path.join(idx, dirs[0], "_folded.json"))

    # probe: every previously indexed key still dedups; novel key survives
    out = {
        r["doc_id"]: r["n_copies"]
        for r in incremental_exact_dedup(
            _corpus([30, 31, 32, 33, 34, 35],
                    ["aaa", "bbb", "ccc", "ddd", "eee", "fff"]),
            idx,
        ).take_all()
    }
    assert out == {35: 1}

    # re-compaction folds {merged, new} again; numbering never collides
    rep2 = compact_index(idx)
    assert rep2["action"] == "compacted"
    assert rep2["epoch"] > rep["epoch"]


def test_horizon_skips_folded_dirs_before_cleanup(tmp_path):
    """Crash window: the merged epoch (with its marker) is committed but
    the folded dirs were not yet removed — readers must already skip
    them, and the next compact_index sweeps them."""
    import shutil

    idx = str(tmp_path / "idx")
    incremental_exact_dedup(_corpus([1], ["aaa"]), idx).materialize()
    incremental_exact_dedup(_corpus([2], ["bbb"]), idx).materialize()

    # simulate the crash: preserve the folded dirs, compact, restore them
    backup = str(tmp_path / "bk")
    shutil.copytree(idx, backup)
    rep = compact_index(idx)
    for d in _epoch_dirs(backup):
        if not os.path.exists(os.path.join(idx, d)):
            shutil.copytree(os.path.join(backup, d), os.path.join(idx, d))
    assert len(_epoch_dirs(idx)) == 3  # merged + 2 stale folded dirs

    live, horizon = _index_epochs(idx)
    assert horizon == rep["folded_upto"]
    assert [n for n, _ in live] == [rep["epoch"]]
    files, _ = _lsh_index_files(idx)
    assert all(f"epoch-{rep['epoch']}" in f for f in files)
    assert _index_files_for_buckets(idx, None) == files

    # duplicate-free probe even with stale dirs on disk
    out = {
        r["doc_id"]: r["n_copies"]
        for r in incremental_exact_dedup(
            _corpus([9, 8], ["aaa", "zzz"]), idx, update_index=False
        ).take_all()
    }
    assert out == {8: 1}

    # the next compaction call finishes the interrupted cleanup
    rep2 = compact_index(idx, min_epochs=99)
    assert rep2["action"] == "noop" and rep2["cleanup_swept"] == 2
    assert len(_epoch_dirs(idx)) == 1


def test_minhash_index_compaction_probe_equality(tmp_path, docs):
    from raydatax.dedup import incremental_minhash_dedup, minhash_index_add

    idx = str(tmp_path / "lsh")
    minhash_index_add(rd.from_arrow(docs.slice(0, 20)), idx)
    minhash_index_add(rd.from_arrow(docs.slice(20, 20)), idx)
    assert len(_epoch_dirs(idx)) == 2

    crawl = pa.concat_tables([
        docs.slice(5, 1).set_column(0, "doc_id", pa.array([90_000])),
        docs.slice(25, 1).set_column(0, "doc_id", pa.array([90_001])),
    ])

    def probe():
        out = incremental_minhash_dedup(
            rd.from_arrow(crawl), idx, threshold=0.99, update_index=False
        ).to_pandas().set_index("doc_id").sort_index()
        return [(int(i), bool(r.keep), int(r.dup_of) if r.dup_of == r.dup_of
                 else None) for i, r in out.iterrows()]

    before = probe()
    rep = compact_index(idx)
    assert rep["action"] == "compacted" and rep["folded_epochs"] == 2
    assert probe() == before
    assert before[0] == (90_000, False, 5) and before[1] == (90_001, False, 25)
    # the merged epoch is bucket-partitioned (hive leaves present)
    assert glob.glob(os.path.join(idx, f"epoch-{rep['epoch']}", "__bucket=*"))


def test_embedding_index_compaction_probe_equality(tmp_path):
    from raydatax.dedup import embedding_index_add, incremental_embedding_dedup

    rng = np.random.default_rng(7)
    base = rng.normal(size=(60, 16)).astype(np.float32)

    def tab(ids, vecs):
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
        })

    idx = str(tmp_path / "ivf")
    embedding_index_add(rd.from_arrow(tab(range(30), base[:30])), idx)
    embedding_index_add(rd.from_arrow(tab(range(30, 60), base[30:])), idx)
    assert len(_epoch_dirs(idx)) == 2

    crawl = tab([900, 901], [base[3], rng.normal(size=16).astype(np.float32)])

    def probe():
        out = incremental_embedding_dedup(
            rd.from_arrow(crawl), idx, threshold=0.98, update_index=False
        ).to_pandas().set_index("vec_id").sort_index()
        return [(int(i), bool(r.keep)) for i, r in out.iterrows()]

    before = probe()
    rep = compact_index(idx)
    assert rep["action"] == "compacted" and rep["folded_epochs"] == 2
    assert probe() == before
    assert before == [(900, False), (901, True)]
