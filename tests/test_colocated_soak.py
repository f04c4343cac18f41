"""Continuous storage-partitioned analytics loop under crash pressure
(round-5 directive): append deltas, join, aggregate, compact — with a
real SIGKILL mid-append — and demand (a) join/agg results always equal a
fresh one-shot export's, (b) the live file count stays bounded by
compaction, (c) the killed epoch is invisible until its retry commits."""

import glob
import os
import signal
import subprocess
import sys
import time

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from raydatax.colocated import (
    append_bucketed,
    colocated_group_agg,
    colocated_join,
    compact_bucketed,
    write_bucketed,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUCKETS = 8
KEYS = 200

CHILD = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import numpy as np, pyarrow as pa, ray.data as rd
from raydatax.colocated import append_bucketed
# a big delta so the stage window is wide enough to kill into
n = 400_000
t = pa.table({{
    "k": pa.array(np.arange(n, dtype=np.int64) % {keys}),
    "v": pa.array(np.full(n, 10**9, np.int64)),
}})
append_bucketed(rd.from_arrow(t).repartition(8), {da!r}, "k")
"""


def _delta(cycle: int, n: int = 2000) -> pa.Table:
    """Deterministic per-cycle delta: values encode the cycle so a lost or
    doubled epoch moves every downstream sum."""
    i = np.arange(n, dtype=np.int64)
    return pa.table({
        "k": pa.array((i * 13 + cycle) % KEYS),
        "v": pa.array(cycle * 100_000 + i),
    })


def _dim() -> pa.Table:
    k = np.arange(KEYS, dtype=np.int64)
    return pa.table({"k": pa.array(k), "w": pa.array(k * 7)})


def _live_parquet_count(da: str) -> int:
    from raydatax.dedup import _index_epochs

    live, _ = _index_epochs(da)
    n = 0
    for _num, d in live:
        n += len(glob.glob(os.path.join(da, d, "__bucket=*", "*.parquet")))
    return n, len(live)


def _check_against_oracle(da, db, acc: pa.Table):
    import ray

    dim = _dim()
    got_join = pa.concat_tables(
        [t for t in ray.get(colocated_join(da, db, "k").to_arrow_refs())
         if t.num_rows],
        promote_options="permissive",
    ).to_pandas()
    exp_join = duckdb.sql(
        "SELECT acc.k, acc.v, dim.w FROM acc JOIN dim USING (k)"
    ).df()
    cols = ["k", "v", "w"]
    a = got_join[cols].sort_values(cols).reset_index(drop=True)
    b = exp_join[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)

    got_agg = pa.concat_tables(
        [t for t in ray.get(
            colocated_group_agg(da, [("v", "sum", "sv"),
                                     ("v", "count", "n")]).to_arrow_refs())
         if t.num_rows],
        promote_options="permissive",
    ).to_pandas()
    exp_agg = duckdb.sql(
        "SELECT k, CAST(SUM(v) AS BIGINT) AS sv, COUNT(*) AS n "
        "FROM acc GROUP BY 1"
    ).df()
    cols = ["k", "sv", "n"]
    a = got_agg[cols].sort_values(cols).reset_index(drop=True)
    b = exp_agg[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


@pytest.mark.slow
def test_colocated_loop_soak_sigkill_bounded_files(ray_session, tmp_path):
    da = str(tmp_path / "fact")
    db = str(tmp_path / "dim")
    write_bucketed(rd.from_arrow(_delta(0)), da, "k", buckets=BUCKETS)
    write_bucketed(rd.from_arrow(_dim()), db, "k", buckets=BUCKETS)
    acc = _delta(0)

    cycles = 12
    kill_at = 6
    max_live_epochs = 0
    for c in range(1, cycles + 1):
        if c == kill_at:
            # a writer dies MID-APPEND: poll for the stage dir, SIGKILL
            proc = subprocess.Popen(
                [sys.executable, "-c",
                 CHILD.format(repo=REPO, da=da, keys=KEYS)],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                start_new_session=True,
            )
            deadline = time.time() + 120
            killed = False
            try:
                while time.time() < deadline:
                    if glob.glob(os.path.join(da, ".stage-epoch-*")):
                        os.killpg(proc.pid, signal.SIGKILL)
                        killed = True
                        break
                    if proc.poll() is not None:
                        break
                    time.sleep(0.01)
            finally:
                if proc.poll() is None:
                    os.killpg(proc.pid, signal.SIGKILL)
                proc.wait()
            if killed:
                # the dead epoch is INVISIBLE: results unchanged
                _check_against_oracle(da, db, acc)
        d = _delta(c)
        append_bucketed(rd.from_arrow(d).repartition(4), da, "k")
        acc = pa.concat_tables([acc, d])
        if c % 4 == 0:
            rep = compact_bucketed(da)
            assert rep["action"] in ("compacted", "noop")
        _n_files, n_live = _live_parquet_count(da)
        max_live_epochs = max(max_live_epochs, n_live)

    # compaction keeps the live epoch count bounded by the cadence, not
    # the cycle count (4 appends between compactions + the folded epoch)
    assert max_live_epochs <= 6
    rep = compact_bucketed(da)  # cycle 12 compacted in-loop → may be noop
    assert rep["action"] in ("compacted", "noop")
    n_files, n_live = _live_parquet_count(da)
    assert n_live == 1
    # one folded epoch is ~max(blocks, B) files — bounded, not ∝ cycles
    assert n_files <= 4 * BUCKETS
    _check_against_oracle(da, db, acc)
