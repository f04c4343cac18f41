"""Point lookup (partition pruning) + kafkareader-style tail loop."""

import glob
import os

from raydatax.driver import lake_table, lookup_conversation, run_job, tail_wal
from raydatax.gen import gen_events, write_wal
from raydatax.oracle import replay_to_table


def test_lookup_cold_and_hot(tmp_wal, tmp_lake):
    ev = gen_events(20_000, seed=41, skew_hot_convs=1, skew_hot_frac=0.35)
    write_wal(ev, tmp_wal, seg_rows=4000)
    run_job(tmp_wal, tmp_lake, partitions=8, salt=4)

    want = replay_to_table(ev)
    for conv in ("conv-00000000", "conv-00000005"):  # hot + cold
        got = lookup_conversation(tmp_lake, conv)
        exp = want.filter(
            __import__("pyarrow").compute.equal(want["conv_id"], conv)
        ).sort_by([("turn_idx", "ascending")])
        assert got.num_rows == exp.num_rows
        assert got["text"].to_pylist() == exp["text"].to_pylist()
    assert lookup_conversation(tmp_lake, "conv-99999999") is None or \
        lookup_conversation(tmp_lake, "conv-99999999").num_rows == 0


def test_tail_wal_applies_appended_segments(tmp_wal, tmp_lake):
    ev = gen_events(9000, seed=43)
    third = ev.num_rows // 3
    write_wal(ev.slice(0, third), tmp_wal, seg_rows=1500)
    reports = tail_wal(tmp_wal, tmp_lake, poll_interval_s=0.05,
                       idle_polls_to_stop=2, partitions=4)
    assert len(reports) == 1

    # append the rest as two more "kafka polls"
    for k, sl in enumerate((ev.slice(third, third), ev.slice(2 * third))):
        n_existing = len(glob.glob(os.path.join(tmp_wal, "seg-*.parquet")))
        tmp2 = tmp_wal + f"_x{k}"
        write_wal(sl, tmp2, seg_rows=1500)
        for i, p in enumerate(sorted(glob.glob(os.path.join(tmp2, "seg-*.parquet")))):
            os.rename(p, os.path.join(tmp_wal, f"seg-{n_existing + i:05d}.parquet"))
        reports += tail_wal(tmp_wal, tmp_lake, poll_interval_s=0.05,
                            idle_polls_to_stop=2, partitions=4)
    assert sum(r["events_replayed"] for r in reports) == ev.num_rows

    want = replay_to_table(ev).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    got = lake_table(tmp_lake).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got.cast(want.schema).equals(want)


def test_lake_info(tmp_wal, tmp_lake):
    from raydatax.driver import lake_info

    ev = gen_events(5000, seed=44)
    write_wal(ev, tmp_wal, seg_rows=1000)
    rep = run_job(tmp_wal, tmp_lake, partitions=4)
    info = lake_info(tmp_lake)
    assert info["rows_total"] == rep["rows_total"]
    assert info["partitions_committed"] == rep["partitions_written"]
    assert info["job_watermark"] == max(p["hw_seq"] for p in info["partitions"])
    assert info["config"]["partitions"] == 4
