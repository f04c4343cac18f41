"""The full operational lifecycle of a transcript CDC lake, end to end —
the runbook a production deployment follows, expressed as one script:

  1. ingest      — tail a WAL of I/U/D events into a partitioned lake
                   (salted hash exchange, LWW merge actors, two-phase
                   manifest commit)
  2. serve       — point lookup with partition pruning; per-conversation
                   summary view built once
  3. delta       — a localized late batch lands; tail applies ONLY the new
                   segments; the view refreshes ONLY touched partitions
  4. audit       — lake_diff: the change feed between the two epochs
                   (insert/update/delete, per-changed-partition, no shuffle)
  5. retention   — expire_rows: rows older than a cutoff are tombstoned
                   THROUGH the normal ingest path, never mutated in place
  6. verify      — lake_fsck checks the commit invariants offline
  7. DR          — replicate_lake ships an incremental replica, then
                   converges to a no-op

Usage:
    python examples/lake_lifecycle.py [root_dir]   (default /tmp/lifecycle)
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.compute as pc

import ray


def main(root: str = "/tmp/lifecycle") -> dict:
    import shutil

    import pyarrow as pa

    from raydatax.driver import (
        expire_rows, lake_diff, lake_table, lookup_conversation, run_job,
    )
    from raydatax.fsck import lake_fsck
    from raydatax.gen import gen_events, write_wal
    from raydatax.replicate import replicate_lake
    from raydatax.view import refresh_view, view_table

    shutil.rmtree(root, ignore_errors=True)
    wal, lake = os.path.join(root, "wal"), os.path.join(root, "lake")
    report: dict = {}

    # 1. ingest ----------------------------------------------------------
    ev = gen_events(30_000, seed=11)
    write_wal(ev, wal, seg_rows=5000)
    rep1 = run_job(wal, lake, partitions=16, time_travel_epochs=8)
    report["ingest"] = {k: rep1[k] for k in ("epoch", "events_replayed",
                                             "rows_total", "action")}

    # 2. serve -----------------------------------------------------------
    conv = lake_table(lake)["conv_id"][0].as_py()
    turns = lookup_conversation(lake, conv)
    vdir = os.path.join(root, "view")
    refresh_view(lake, vdir)
    report["serve"] = {"conv": conv, "turns": turns.num_rows,
                       "view_rows": view_table(vdir).num_rows}

    # 3. delta -----------------------------------------------------------
    late = gen_events(600, seed=13, n_convs=4,
                      conv_offset=900_000, start_seq=10_000_000)
    n0 = len(glob.glob(os.path.join(wal, "seg-*.parquet")))
    stage = os.path.join(root, "wal_next")
    write_wal(late, stage, seg_rows=600)
    for i, p in enumerate(sorted(glob.glob(os.path.join(stage, "seg-*.parquet")))):
        os.rename(p, os.path.join(wal, f"seg-{n0 + i:05d}.parquet"))
    rep2 = run_job(wal, lake, partitions=16)
    v = refresh_view(lake, vdir)
    report["delta"] = {"events": rep2["events_replayed"],
                       "segments_pruned": rep2["segments_pruned"],
                       "view_refreshed": v["refreshed"],
                       "view_skipped": v["skipped"]}

    # 4. audit -----------------------------------------------------------
    feed = lake_diff(lake, from_epoch=rep1["epoch"], to_epoch=rep2["epoch"])
    by_op = {r["_op"]: r["count()"] for r in feed.groupby("_op").count().take_all()}
    report["audit"] = by_op

    # 5. retention -------------------------------------------------------
    live = lake_table(lake)
    cutoff = int(pc.approximate_median(live["ts"].cast(pa.int64())).as_py())
    exp = expire_rows(lake, wal, older_than=cutoff)
    rep3 = run_job(wal, lake, partitions=16)
    assert rep3["deletes"] == exp["expired_keys"]
    report["retention"] = {"expired": exp["expired_keys"],
                           "rows_after": lake_table(lake).num_rows}

    # 6. verify ----------------------------------------------------------
    fsck = lake_fsck(lake)
    assert fsck["ok"], fsck
    report["verify"] = {"ok": fsck["ok"]}

    # 7. DR --------------------------------------------------------------
    replica = os.path.join(root, "replica")
    first = replicate_lake(lake, replica)
    assert replicate_lake(lake, replica)["noop"]
    assert lake_table(replica).num_rows == report["retention"]["rows_after"]
    report["dr"] = {"files_copied": first["files_copied"], "converged": True}
    return report


if __name__ == "__main__":
    owned = False
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
        owned = True
    try:
        import json

        print(json.dumps(main(sys.argv[1] if len(sys.argv) > 1 else
                               "/tmp/lifecycle"), indent=1))
    finally:
        if owned:
            ray.shutdown()
