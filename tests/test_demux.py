"""Multi-table WAL demux: content-exact routing, valid per-table WALs,
resume manifest."""

import glob
import json
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from raydatax.driver import read_lake, run_job
from raydatax.gen import gen_events, write_wal
from raydatax.oracle import replay_to_table
from raydatax.source import demux_wal


def _tagged_wal(tmp: str) -> tuple[str, pa.Table, pa.Table]:
    """One WAL carrying two tables: disjoint conv namespaces, interleaved
    by seq."""
    t0 = gen_events(3000, seed=11)
    t1 = gen_events(2000, seed=22, conv_offset=10_000_000)
    tag0 = t0.append_column("table", pa.array(["orders"] * t0.num_rows))
    tag1 = t1.append_column("table", pa.array(["users"] * t1.num_rows))
    both = pa.concat_tables([tag0, tag1]).sort_by("ts")
    src = os.path.join(tmp, "wal")
    write_wal(both, src, seg_rows=1000)
    return src, t0, t1


def test_demux_then_replay_matches_per_table_oracle(ray_session):
    tmp = tempfile.mkdtemp(prefix="demux_")
    src, t0, t1 = _tagged_wal(tmp)
    routed = demux_wal(src, os.path.join(tmp, "routed"))
    assert set(routed["tables"]) == {"orders", "users"}
    assert routed["rows"]["orders"] == t0.num_rows
    assert routed["rows"]["users"] == t1.num_rows

    for name, events in (("orders", t0), ("users", t1)):
        lake = os.path.join(tmp, f"lake_{name}")
        run_job(routed["tables"][name], lake, partitions=4)
        got = (
            read_lake(lake)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        want = (
            replay_to_table(events)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert got[want.columns.tolist()].equals(want), name


def test_demux_resume_skips_recorded_segments(ray_session):
    tmp = tempfile.mkdtemp(prefix="demux_r_")
    src, t0, t1 = _tagged_wal(tmp)
    dst = os.path.join(tmp, "routed")
    first = demux_wal(src, dst)
    n_segs = first["segments_routed"]

    # simulate a crash that lost the last segment's manifest entry: the
    # resumed demux must re-route ONLY that segment, byte-identically
    mpath = os.path.join(dst, "_demux.json")
    state = json.load(open(mpath))
    dropped = sorted(state["done"])[-1]
    del state["done"][dropped]
    json.dump(state, open(mpath, "w"))
    before = {
        f: open(f, "rb").read()
        for f in glob.glob(os.path.join(dst, "*", "seg-*.parquet"))
    }
    second = demux_wal(src, dst)
    assert second["segments_routed"] == n_segs
    assert second["rows"] == first["rows"]
    for f, blob in before.items():
        assert open(f, "rb").read() == blob, f


def test_demux_guards(ray_session):
    tmp = tempfile.mkdtemp(prefix="demux_g_")
    src, _, _ = _tagged_wal(tmp)
    dst = os.path.join(tmp, "routed")
    demux_wal(src, dst)
    with pytest.raises(ValueError, match="table_col"):
        demux_wal(src, dst, table_col="other")
    with pytest.raises(FileNotFoundError):
        demux_wal(os.path.join(tmp, "missing"), dst)


def test_run_multi_table_job_end_to_end(ray_session):
    from raydatax.driver import run_multi_table_job

    tmp = tempfile.mkdtemp(prefix="demux_mt_")
    src, t0, t1 = _tagged_wal(tmp)
    base = os.path.join(tmp, "multi")
    out = run_multi_table_job(src, base, partitions=4)
    assert set(out["tables"]) == {"orders", "users"}
    for name, events in (("orders", t0), ("users", t1)):
        got = (
            read_lake(os.path.join(base, "lake", name))
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        want = (
            replay_to_table(events)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert got[want.columns.tolist()].equals(want), name
    # second call: demux skips everything, both ingests are no-ops
    again = run_multi_table_job(src, base, partitions=4)
    assert all(r["action"] == "noop" for r in again["tables"].values())
