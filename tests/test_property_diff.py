"""Property-based correctness of the snapshot-diff kernel: for arbitrary
event logs and an arbitrary watermark split, ``diff_snapshot_tables`` over
the two LWW states must equal the brute-force dict diff — including
delete→reinsert churn, all-delete intervals, and empty sides."""

import hypothesis.strategies as st
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import HealthCheck, given, settings

from raydatax.driver import diff_snapshot_tables
from raydatax.oracle import replay_to_table
from raydatax.schema import EVENT_SCHEMA, lake_schema_for, normalize_to


@st.composite
def log_and_split(draw):
    n = draw(st.integers(1, 60))
    rows = []
    for seq in range(n):
        op = draw(st.sampled_from(["I", "U", "D"]))
        rows.append(
            {
                "seq": seq,
                "op": op,
                "conv_id": draw(st.sampled_from(["a", "b", "c"])),
                "turn_idx": draw(st.integers(0, 2)),
                "role": None if op == "D" else draw(st.sampled_from(["user", "assistant"])),
                "text": None if op == "D" else draw(st.sampled_from(["x", "yy", "zzz", ""])),
                "tool": None if op == "D" else draw(st.sampled_from([None, "search"])),
                "ts": None,
            }
        )
    w = draw(st.integers(-1, n - 1))  # -1 = empty old snapshot
    return pa.Table.from_pylist(rows, schema=EVENT_SCHEMA), w


def _brute(old_t, new_t):
    def by_key(t):
        d = t.to_pydict()
        return {
            (c, ti): s for c, ti, s in zip(d["conv_id"], d["turn_idx"], d["seq"])
        }

    old, new = by_key(old_t), by_key(new_t)
    out = {}
    for k, s in new.items():
        if k not in old:
            out[k] = ("insert", s)
        elif old[k] != s:
            out[k] = ("update", s)
    for k, s in old.items():
        if k not in new:
            out[k] = ("delete", s)
    return out


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(log_and_split())
def test_diff_kernel_matches_brute_force(case):
    events, w = case
    old = replay_to_table(events.filter(pc.less_equal(events["seq"], w)))
    new = replay_to_table(events)
    base = lake_schema_for(EVENT_SCHEMA)
    got_t = diff_snapshot_tables(
        normalize_to(old, base), normalize_to(new, base), base
    )
    d = got_t.to_pydict()
    got = {
        (c, ti): (op, s)
        for c, ti, op, s in zip(d["conv_id"], d["turn_idx"], d["_op"], d["seq"])
    }
    assert got == _brute(old, new)
    # images: insert/update carry the NEW row, delete the final OLD row
    by_key_new = {
        (c, ti): tx
        for c, ti, tx in zip(*(new.to_pydict()[x] for x in ("conv_id", "turn_idx", "text")))
    }
    by_key_old = {
        (c, ti): tx
        for c, ti, tx in zip(*(old.to_pydict()[x] for x in ("conv_id", "turn_idx", "text")))
    }
    for key, op, tx in zip(
        zip(d["conv_id"], d["turn_idx"]), d["_op"], d["text"]
    ):
        assert tx == (by_key_old[key] if op == "delete" else by_key_new[key])
