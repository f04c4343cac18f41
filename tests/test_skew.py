"""Skew handling (FIXTURES F3): a hot conversation holding ~30%+ of all
events must be detected, salted across sub-partitions, and still merge to
the exact oracle state."""

import json
import os

import numpy as np

from raydatax.driver import lake_table, run_job
from raydatax.gen import gen_events, write_wal
from raydatax.oracle import replay_to_table
from raydatax.partition import assign_partitions, detect_hot_keys

SORT = [("conv_id", "ascending"), ("turn_idx", "ascending")]


def test_hot_key_detection_and_salted_merge(tmp_wal, tmp_lake):
    ev = gen_events(25_000, seed=31, skew_hot_convs=1, skew_hot_frac=0.3)
    write_wal(ev, tmp_wal, seg_rows=4000)

    rep = run_job(tmp_wal, tmp_lake, partitions=8, salt=4)
    cfg = json.load(open(os.path.join(tmp_lake, "_lake.json")))
    assert "conv-00000000" in cfg["hot_keys"], "hot conversation must be detected"

    # salted sub-partitions (pid >= P) actually received rows
    salted = [
        r for r in rep["per_partition"]
        if r["partition"] >= cfg["partitions"] and r["action"] == "write"
    ]
    assert len(salted) >= 2, "hot conv must spread over multiple salted splits"

    want = replay_to_table(ev).sort_by(SORT)
    got = lake_table(tmp_lake).sort_by(SORT)
    assert got.cast(want.schema).equals(want)


def test_salting_is_key_stable():
    """Same (conv_id, turn_idx) must always map to the same salted partition
    (LWW correctness under salting, SURVEY.md §7.4)."""
    ev = gen_events(5000, seed=32, skew_hot_convs=1, skew_hot_frac=0.4)
    hot = ["conv-00000000"]
    a = assign_partitions(ev, 8, 4, hot)
    b = assign_partitions(ev, 8, 4, hot)
    assert a["__part"].equals(b["__part"])
    parts = a["__part"].to_numpy()
    conv = np.asarray(ev["conv_id"])
    turn = np.asarray(ev["turn_idx"])
    seen = {}
    for c, t, p in zip(conv, turn, parts):
        key = (c, t)
        assert seen.setdefault(key, p) == p
    hot_parts = {p for c, p in zip(conv, parts) if c == "conv-00000000"}
    assert hot_parts.issubset(set(range(8, 12))) and len(hot_parts) > 1


def test_detection_threshold(tmp_wal):
    ev = gen_events(20_000, seed=33)  # no skew
    write_wal(ev, tmp_wal, seg_rows=5000)
    import glob
    segs = sorted(glob.glob(os.path.join(tmp_wal, "seg-*.parquet")))
    assert detect_hot_keys(segs, partitions=8) == []
