"""BulkWriter / write_bulk — the buffered at-least-once bulk-sink family
(flush caps, exponential retry, batch-failure → row-level dirty
isolation).

NOTE: backend factories are built as CLOSURES with all state defined
inside — pytest test modules are not importable from Ray workers, so a
module-level class here would pickle by reference and the actor pool
would restart forever on the failed import."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from raydatax.sinks import write_bulk


def _mk_backend_factory(out_dir, transient_failures=0, reject_poison=True):
    """Returns a picklable factory: one parquet part per flush; refuses
    POISON rows; optionally fails the first N flush calls (retry fodder)."""

    def factory():
        state = {"n": 0, "left": transient_failures}
        os.makedirs(out_dir, exist_ok=True)

        def flush(t):
            import pyarrow.compute as pc
            import pyarrow.parquet as _pq

            if state["left"] > 0:
                state["left"] -= 1
                raise ConnectionError("transient backend hiccup")
            if reject_poison and "text" in t.column_names:
                if pc.any(pc.equal(t["text"], "POISON")).as_py():
                    raise ValueError("backend rejects POISON rows")
            state["n"] += 1
            _pq.write_table(
                t, os.path.join(out_dir, f"part-{os.getpid()}-{state['n']:05d}.parquet")
            )

        return flush

    return factory


def _table(n, poison_at=()):
    text = [f"row-{i}" for i in range(n)]
    for i in poison_at:
        text[i] = "POISON"
    return pa.table({"id": pa.array(range(n), pa.int64()),
                     "text": pa.array(text, pa.string())})


def _read_back(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))
    return pa.concat_tables([pq.read_table(f) for f in files])


def test_bulk_writer_isolates_poison_rows(ray_session, tmp_path):
    out = str(tmp_path / "out")
    t = _table(1000, poison_at=(137, 611))
    rep = write_bulk(ray.data.from_arrow(t), _mk_backend_factory(out),
                     concurrency=2, batch_rows=64, retries=1,
                     base_sleep_s=0.0)
    assert rep["rows_written"] == 998
    assert rep["rows_dirty"] == 2
    assert any("POISON" in r for r in rep["dirty_reasons"])
    got = _read_back(out)
    assert got.num_rows == 998
    assert "POISON" not in set(got["text"].to_pylist())
    assert sorted(got["id"].to_pylist()) == [
        i for i in range(1000) if i not in (137, 611)
    ]


def test_bulk_writer_retries_transient_failures(ray_session, tmp_path):
    out = str(tmp_path / "out")
    t = _table(500)
    rep = write_bulk(ray.data.from_arrow(t),
                     _mk_backend_factory(out, transient_failures=2),
                     concurrency=1, batch_rows=100, retries=3,
                     base_sleep_s=0.0)
    assert rep["rows_written"] == 500 and rep["rows_dirty"] == 0
    assert _read_back(out).num_rows == 500


def test_bulk_writer_enforces_error_limit(ray_session, tmp_path):
    out = str(tmp_path / "out")
    t = _table(200, poison_at=(7,))
    with pytest.raises(RuntimeError, match="error limit"):
        write_bulk(ray.data.from_arrow(t), _mk_backend_factory(out),
                   concurrency=1, batch_rows=50, retries=0,
                   base_sleep_s=0.0, error_limit_records=0)


def test_bulk_writer_byte_cap_subdivides(ray_session, tmp_path):
    out = str(tmp_path / "out")
    t = pa.table({"text": pa.array(["x" * 10_000] * 64, pa.string())})
    rep = write_bulk(ray.data.from_arrow(t), _mk_backend_factory(out),
                     concurrency=1, batch_rows=64, batch_bytes=40_000,
                     retries=0, base_sleep_s=0.0)
    assert rep["rows_written"] == 64
    assert rep["flushes"] >= 16  # 64 x 10 kB under a 40 kB cap
    assert _read_back(out).num_rows == 64
