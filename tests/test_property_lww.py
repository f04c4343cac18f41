"""Property-based correctness: arbitrary event sequences through the
vectorized LWW kernel (full-image and sparse) must match the sequential
oracle; multi-epoch churn must equal a single-shot replay."""

import glob
import os

import hypothesis.strategies as st
import pyarrow as pa
from hypothesis import HealthCheck, given, settings

from raydatax.driver import lake_table, run_job
from raydatax.gen import gen_events, write_wal
from raydatax.merge import lww_winners
from raydatax.oracle import replay_to_table
from raydatax.schema import EVENT_SCHEMA

SORT = [("conv_id", "ascending"), ("turn_idx", "ascending")]


@st.composite
def event_logs(draw):
    n = draw(st.integers(1, 60))
    rows = []
    for seq in range(n):
        rows.append(
            {
                "seq": seq,
                "op": draw(st.sampled_from(["I", "U", "D"])),
                "conv_id": draw(st.sampled_from(["a", "b", "c"])),
                "turn_idx": draw(st.integers(0, 2)),
                "role": draw(st.sampled_from([None, "user", "assistant"])),
                "text": draw(st.sampled_from([None, "x", "yy", "zzz", ""])),
                "tool": draw(st.sampled_from([None, "search"])),
                "ts": None,
            }
        )
    # D rows are null-payload by contract
    for r in rows:
        if r["op"] == "D":
            r["role"] = r["text"] = r["tool"] = None
    return pa.Table.from_pylist(rows, schema=EVENT_SCHEMA)


def _kernel_vs_oracle(events: pa.Table, sparse: bool):
    win = lww_winners(events, sparse=sparse)
    live = win.filter(pa.compute.not_equal(win["op"], "D"))
    got = live.drop_columns(["op"]).sort_by(SORT)
    want = replay_to_table(events, sparse=sparse).sort_by(SORT)
    got = got.select(want.schema.names).cast(want.schema)
    assert got.equals(want), f"\nGOT:\n{got.to_pylist()}\nWANT:\n{want.to_pylist()}"


@settings(max_examples=120, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(event_logs())
def test_kernel_full_image_matches_oracle(events):
    _kernel_vs_oracle(events, sparse=False)


@settings(max_examples=120, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(event_logs())
def test_kernel_sparse_matches_oracle(events):
    _kernel_vs_oracle(events, sparse=True)


def test_multi_epoch_churn(tmp_path):
    """Five successive tail epochs == one single-shot replay; epochs vacuum
    down to the latest snapshot; metrics accumulate per epoch."""
    ev = gen_events(15_000, seed=81)
    n = ev.num_rows
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    k = 5
    seg_counter = 0
    for i in range(k):
        sl = ev.slice(i * n // k, (n // k) if i < k - 1 else n - (k - 1) * (n // k))
        tmp2 = str(tmp_path / f"w{i}")
        write_wal(sl, tmp2, seg_rows=1000)
        os.makedirs(wal, exist_ok=True)
        for p in sorted(glob.glob(os.path.join(tmp2, "seg-*.parquet"))):
            os.rename(p, os.path.join(wal, f"seg-{seg_counter:05d}.parquet"))
            seg_counter += 1
        rep = run_job(wal, lake, partitions=4)
        assert rep["action"] == "applied"
        assert rep["epoch"] == i + 1

    want = replay_to_table(ev).sort_by(SORT)
    got = lake_table(lake).sort_by(SORT)
    assert got.cast(want.schema).equals(want)
    # vacuum kept only the newest snapshot per partition
    for pdir in glob.glob(os.path.join(lake, "data", "part-*")):
        files = glob.glob(os.path.join(pdir, "epoch-*.parquet"))
        assert len(files) == 1
    # one metrics file per applied epoch
    assert len(glob.glob(os.path.join(lake, "_metrics", "epoch-*.json"))) == k
