"""Cross-table consistent demux commits (round-5 directive): a killed
multi-table cycle must never expose table A at source-seq W+k while table
B sits at W — readers go through the shared-watermark `_snapshot.json`
that flips only after the LAST table commits (the analogue of the
reference stream reader's job-level shared endTime checkpoint)."""

import os
import subprocess
import sys

import pyarrow as pa
import pytest

from raydatax.driver import read_consistent, read_lake, run_multi_table_job
from raydatax.gen import append_wal, gen_events, write_wal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from raydatax.driver import run_multi_table_job
run_multi_table_job({src!r}, {base!r}, partitions=4,
                    _crash_after_tables={crash})
"""


def _tagged(seed_a, seed_b, start_seq=0):
    a = gen_events(1500, seed=seed_a, start_seq=start_seq)
    b = gen_events(1000, seed=seed_b, start_seq=start_seq + 1_000_000,
                   conv_offset=10_000_000)
    ta = a.append_column("table", pa.array(["orders"] * a.num_rows))
    tb = b.append_column("table", pa.array(["users"] * b.num_rows))
    return pa.concat_tables([ta, tb]).sort_by("seq")


def _consistent_state(base):
    snap = read_consistent(base)
    out = {}
    for name, ds in snap["tables"].items():
        out[name] = (
            ds.to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
    return snap["cycle"], snap["source_horizon"], out


def _run_child(src, base, crash):
    proc = subprocess.run(
        [sys.executable, "-c",
         CHILD.format(repo=REPO, src=src, base=base, crash=crash)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    return proc.returncode


def test_sigkill_between_table_commits_never_observes_mixed(
    tmp_path, ray_session
):
    src = str(tmp_path / "src")
    base = str(tmp_path / "multi")
    write_wal(_tagged(31, 32), src, seg_rows=500)

    # cycle 1: complete
    rep1 = run_multi_table_job(src, base, partitions=4)
    assert rep1["snapshot"]["cycle"] == 1
    c1, h1, state1 = _consistent_state(base)
    assert c1 == 1

    # cycle 2 arrives, and the job is SIGKILLed after the FIRST table's
    # commit (tables run in sorted order: orders commits, users never runs)
    append_wal(_tagged(41, 42, start_seq=5_000_000), src, seg_rows=500)
    rc = _run_child(src, base, crash=1)
    assert rc != 0  # the child really died

    # the hazard exists: the live manifests ARE mixed...
    orders_live = read_lake(os.path.join(base, "lake", "orders")).to_pandas()
    users_live = read_lake(os.path.join(base, "lake", "users")).to_pandas()
    assert orders_live["seq"].max() > state1["orders"]["seq"].max()
    assert users_live["seq"].max() == state1["users"]["seq"].max()

    # ...but the consistent reader never sees it: still cycle 1, both
    # tables byte-equal to the pre-crash consistent state
    c, h, state = _consistent_state(base)
    assert (c, h) == (c1, h1)
    for name in ("orders", "users"):
        assert state[name].equals(state1[name]), name

    # resume: the finished table no-ops on its watermark, the missing one
    # catches up, and the snapshot flips ONCE to the new shared horizon
    rep2 = run_multi_table_job(src, base, partitions=4)
    assert rep2["snapshot"]["cycle"] == 2
    assert rep2["tables"]["orders"]["action"] == "noop"
    assert rep2["tables"]["users"]["action"] == "applied"
    c2, h2, state2 = _consistent_state(base)
    assert c2 == 2 and h2 > h1
    # consistent view now equals the live state for both tables
    for name, live in (("orders", orders_live), ("users", users_live)):
        got = state2[name]
        want = (
            read_lake(os.path.join(base, "lake", name))
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert got.equals(want), name


def test_consistent_read_before_first_complete_cycle_raises(
    tmp_path, ray_session
):
    src = str(tmp_path / "src")
    base = str(tmp_path / "multi")
    write_wal(_tagged(51, 52), src, seg_rows=500)
    rc = _run_child(src, base, crash=1)  # dies before the second table
    assert rc != 0
    # one lake exists and is readable directly — but there is no
    # consistent cross-table snapshot to observe
    read_lake(os.path.join(base, "lake", "orders"))
    with pytest.raises(FileNotFoundError, match="no multi-table cycle"):
        read_consistent(base)
