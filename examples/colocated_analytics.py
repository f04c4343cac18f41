"""Storage-partitioned analytics loop: pay the join exchange ONCE.

The steady-state shape of a repeatedly-joined warehouse pair: both
tables are hash-bucket-exported on the join key (the only shuffle ever
paid), every later join and every groupby-on-the-key runs bucket-local
with ZERO exchange, daily deltas append as crash-atomic epochs (write
cost ∝ delta), and compaction folds the epochs back to ~B files.
Measured at sf0.1 this is ~30× per repeated join vs a shuffle hash join
(BENCH/BASELINE.md, round-4 A/B).

  1. export   — orders + customer bucketed on custkey (write_bucketed)
  2. join     — exchange-free per-order segment projection (colocated_join)
  3. agg      — exchange-free per-customer stats (colocated_group_agg)
  4. delta    — a late orders slice appends as epoch-1 (append_bucketed)
  5. rejoin   — the same join now sees the delta transparently
  6. compact  — epochs fold to one behind the crash-atomic horizon

Run: ``python examples/colocated_analytics.py [sf_dir] [state_dir]``
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow.compute as pc
import ray
import ray.data as rd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raydatax.colocated import (  # noqa: E402
    append_bucketed,
    colocated_group_agg,
    colocated_join,
    compact_bucketed,
    write_bucketed,
)


def main(sf_dir: str, state_dir: str) -> dict:
    shutil.rmtree(state_dir, ignore_errors=True)
    da = os.path.join(state_dir, "orders")
    db = os.path.join(state_dir, "customer")

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    # 90% arrives in the initial export, 10% later as the delta
    base = orders.map_batches(
        lambda t: t.filter(pc.greater(pc.bit_wise_and(t["o_orderkey"], 7), 0)),
        batch_format="pyarrow",
    )
    delta = orders.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["o_orderkey"], 7), 0)),
        batch_format="pyarrow",
    )
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )

    write_bucketed(base, da, "o_custkey", buckets=8)
    write_bucketed(cust, db, "c_custkey", buckets=8)

    joined_base = colocated_join(da, db, "o_custkey", "c_custkey").count()
    agg_base = colocated_group_agg(
        da, [("o_orderkey", "count", "n_orders")]
    ).count()

    epoch = append_bucketed(delta, da, "o_custkey")
    joined_full = colocated_join(da, db, "o_custkey", "c_custkey").count()

    comp = compact_bucketed(da)
    joined_compacted = colocated_join(da, db, "o_custkey", "c_custkey").count()

    return {
        "rows_total": orders.count(),
        "joined_base": joined_base,
        "customers_seen": agg_base,
        "delta_epoch": epoch,
        "joined_full": joined_full,
        "compaction": comp,
        "joined_after_compact": joined_compacted,
    }


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    state = sys.argv[2] if len(sys.argv) > 2 else "/tmp/raydatax_colocated_demo"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    rep = main(sf, state)
    print(rep)
    ray.shutdown()
