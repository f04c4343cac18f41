"""Generator determinism + oracle semantics (no Ray needed)."""

import collections

import numpy as np
import pyarrow as pa

from raydatax.gen import gen_events, write_wal
from raydatax.oracle import replay, replay_to_table
from raydatax.schema import EVENT_SCHEMA


def test_deterministic():
    a = gen_events(5000, seed=42)
    b = gen_events(5000, seed=42)
    assert a.equals(b)
    c = gen_events(5000, seed=43)
    assert not a.equals(c)


def test_event_mix_and_order():
    t = gen_events(30_000, seed=1)
    seq = t["seq"].to_numpy()
    assert (np.diff(seq) > 0).all(), "seq must be strictly increasing in log order"
    mix = collections.Counter(t["op"].to_pylist())
    n = t.num_rows
    assert 0.5 < mix["I"] / n < 0.75
    assert 0.15 < mix["U"] / n < 0.4
    assert 0.03 < mix["D"] / n < 0.2
    assert t.schema.equals(EVENT_SCHEMA)


def test_updates_hit_existing_keys_and_deletes_are_null_payload():
    t = gen_events(10_000, seed=2)
    rows = t.to_pylist()
    seen = set()
    for r in rows:
        key = (r["conv_id"], r["turn_idx"])
        if r["op"] in ("U", "D"):
            assert key in seen, "U/D must target a previously inserted key"
        if r["op"] == "D":
            assert r["text"] is None and r["role"] is None
        else:
            assert r["text"] is not None and r["role"] is not None
            seen.add(key)


def test_oracle_lww_order_independent():
    t = gen_events(8000, seed=3)
    base = replay_to_table(t)
    perm = np.random.default_rng(0).permutation(t.num_rows)
    shuffled = t.take(pa.array(perm))
    assert replay_to_table(shuffled).equals(base)


def test_oracle_reinsert_after_delete():
    ev = pa.Table.from_pylist(
        [
            {"seq": 1, "op": "I", "conv_id": "c", "turn_idx": 0, "role": "user",
             "text": "a", "tool": None, "ts": None},
            {"seq": 2, "op": "D", "conv_id": "c", "turn_idx": 0, "role": None,
             "text": None, "tool": None, "ts": None},
            {"seq": 3, "op": "I", "conv_id": "c", "turn_idx": 0, "role": "user",
             "text": "b", "tool": None, "ts": None},
            {"seq": 0, "op": "U", "conv_id": "c", "turn_idx": 0, "role": "user",
             "text": "stale", "tool": None, "ts": None},
        ],
        schema=EVENT_SCHEMA,
    )
    out = replay_to_table(ev)
    assert out.num_rows == 1
    assert out["text"][0].as_py() == "b"


def test_skew_generator(tmp_path):
    t = gen_events(20_000, seed=4, skew_hot_convs=1, skew_hot_frac=0.3)
    c = collections.Counter(t["conv_id"].to_pylist())
    assert c["conv-00000000"] / t.num_rows >= 0.25

    paths = write_wal(t, str(tmp_path / "w"), seg_rows=5000)
    assert len(paths) == (t.num_rows + 4999) // 5000
