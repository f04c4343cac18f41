"""Real-process kill/resume: SIGKILL an ingest driver mid-merge (its own Ray
session, staging files on disk), resume from the orphaned state, and demand
byte-identical output vs an uninterrupted run.  This is FIXTURES F5 with a
real kill -9 rather than the deterministic crash hook."""

import glob
import os
import signal
import subprocess
import sys
import time

from raydatax.driver import run_job
from raydatax.gen import gen_wal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import sys, time
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from raydatax.driver import run_job
run_job({wal!r}, {lake!r}, partitions=8, merge_concurrency=1)
"""


import pytest


@pytest.mark.parametrize(
    "seed,gen_kw",
    [
        (91, {}),
        # north-rule intersection: exactly-once × skew — the hot conv's
        # SALTED sub-partitions must also resume byte-identically
        (92, {"skew_hot_convs": 1, "skew_hot_frac": 0.35}),
    ],
    ids=["uniform", "skewed"],
)
def test_sigkill_mid_merge_then_resume(tmp_path, seed, gen_kw):
    wal = str(tmp_path / "wal")
    gen_wal(wal, 60_000, seed=seed, seg_rows=5000, **gen_kw)

    # reference: uninterrupted run in THIS session
    lake_ref = str(tmp_path / "ref")
    run_job(wal, lake_ref, partitions=8)

    # victim: separate process with its own Ray session, killed once staging
    # appears (mid-merge, before/during commits)
    lake = str(tmp_path / "lake")
    proc = subprocess.Popen(
        [sys.executable, "-c", CHILD.format(repo=REPO, wal=wal, lake=lake)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    deadline = time.time() + 120
    killed = False
    try:
        while time.time() < deadline:
            staged = glob.glob(os.path.join(lake, "_staging", "epoch-*", "part-*.parquet"))
            if len(staged) >= 2:
                os.killpg(proc.pid, signal.SIGKILL)
                killed = True
                break
            if proc.poll() is not None:
                break  # finished before we could kill — still a valid resume test
            time.sleep(0.05)
    finally:
        if proc.poll() is None:
            os.killpg(proc.pid, signal.SIGKILL)
        proc.wait()
    assert killed or proc.returncode == 0

    # the dead child's lock fd is gone with the process; resume in-session
    rep = run_job(wal, lake, partitions=8)
    assert rep["action"] in ("applied", "noop")

    fa = sorted(glob.glob(os.path.join(lake_ref, "data", "part-*", "*.parquet")))
    fb = sorted(glob.glob(os.path.join(lake, "data", "part-*", "*.parquet")))
    assert [os.path.relpath(p, lake_ref) for p in fa] == [
        os.path.relpath(p, lake) for p in fb
    ]
    for a, b in zip(fa, fb):
        assert open(a, "rb").read() == open(b, "rb").read(), f"byte mismatch {a}"
