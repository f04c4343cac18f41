"""End-to-end example smoke: the incremental crawl-ingest loop."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))


def test_lake_lifecycle_example(tmp_path):
    import lake_lifecycle as ll

    rep = ll.main(str(tmp_path / "root"))
    assert rep["ingest"]["action"] == "applied"
    assert rep["serve"]["turns"] > 0
    # the localized delta refreshed a strict subset of view partitions
    assert 0 < rep["delta"]["view_refreshed"] < (
        rep["delta"]["view_refreshed"] + rep["delta"]["view_skipped"]
    )
    assert rep["audit"].get("insert", 0) > 0
    assert rep["retention"]["expired"] > 0
    assert rep["verify"]["ok"] and rep["dr"]["converged"]


def test_incremental_crawl_dedup_example(tmp_path):
    import incremental_crawl_dedup as icd

    rep = icd.main("/root/testdata/sf0.001", str(tmp_path / "state"))
    crawls = rep["crawls"]
    assert [c["crawl"] for c in crawls] == [0, 1, 2]
    # every crawl keeps its own fresh slice
    assert all(c["exact_survivors"] > 100 for c in crawls)
    # later crawls drop their RE-SENT duplicates via the persistent indexes
    assert crawls[1]["neardup_dropped"] >= 20
    assert crawls[1]["embedding_dropped"] >= 20
    # crawl 3 runs AFTER compact_index folded each index's epochs — the
    # merged single-epoch indexes must still kill every re-sent duplicate
    assert crawls[2]["embedding_dropped"] >= 20
    assert all(c["action"] == "compacted" and c["folded_epochs"] == 2
               for c in rep["compactions"].values())


def test_snapshot_bootstrap_tail_example(tmp_path):
    import snapshot_bootstrap_tail as sbt

    rep = sbt.main(str(tmp_path / "root"))
    assert rep["bootstrap"]["action"] == "applied"
    d = rep["delta"]
    assert d["I"] > 0 and d["U"] > 0 and d["D"] > 0
    assert rep["tail"]["action"] == "applied"
    # the tail replayed ONLY the delta segments (pruned bootstrap ones)
    assert rep["tail"]["segments_pruned"] > 0
    assert rep["state_equal"] and rep["noop"]


def test_colocated_analytics_example(tmp_path):
    import colocated_analytics as ca

    rep = ca.main("/root/testdata/sf0.001", str(tmp_path / "state"))
    # every order joins exactly one customer → joined == exported rows
    assert rep["joined_full"] == rep["rows_total"]
    assert rep["joined_base"] < rep["rows_total"]      # delta not yet in
    assert rep["delta_epoch"] == 1
    assert rep["compaction"]["action"] == "compacted"
    assert rep["joined_after_compact"] == rep["rows_total"]
    assert rep["customers_seen"] > 0
