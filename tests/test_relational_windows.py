"""Edge cases for the round-2 relational additions: as-of join, grouped
top-N, hopping windows, per-key window scan, rollup aggregates.

The happy paths are oracled end-to-end (tools/check_oracle.py queries
asof_latest_purchase / top_events_per_type / events_hopping /
user_running_totals / revenue_rollup_region); these tests pin the
boundary semantics DuckDB's hash gate can't isolate: ts-tie inclusivity,
unmatched-left NULLs, sub-n groups, window-boundary membership, per-key
lag/running-sum resets, NULL level markers."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from raydatax.relational import (
    asof_join,
    grouped_topk,
    hopping_window,
    range_join,
    rollup_aggregate,
    window_scan,
)

US = 1_000_000
HOUR_US = 3_600 * US


def _ts(sec_list):
    return pa.array(np.array(sec_list, np.int64) * US).cast(pa.timestamp("us"))


def _sorted_rows(ds, cols):
    t = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    return sorted(tuple(r) for r in t[cols].itertuples(index=False, name=None))


def test_asof_join_tie_inclusive_and_unmatched():
    left = rd.from_arrow(pa.table({
        "k": ["a", "a", "a", "b"],
        "ts": _ts([5, 10, 20, 5]),
        "lid": [1, 2, 3, 4],
    }))
    # right: a@10 ties left a@10 (inclusive match), a@15 matches a@20;
    # key b has NO right rows at all -> NULL
    right = rd.from_arrow(pa.table({
        "k": ["a", "a"],
        "ts": _ts([10, 15]),
        "rid": [100, 150],
    }))
    out = asof_join(left, right, key="k", ts_col="ts", num_partitions=4).to_pandas()
    by_lid = {int(r.lid): r.rid for r in out.itertuples()}
    assert len(out) == 4  # every left row survives (ASOF LEFT)
    assert np.isnan(by_lid[1])        # a@5: nothing at-or-before
    assert by_lid[2] == 100           # a@10: ts tie is inclusive
    assert by_lid[3] == 150           # a@20: latest, not first
    assert np.isnan(by_lid[4])        # key with empty right side


def test_asof_join_never_crosses_keys():
    # right row for key a must not leak into key b even when b's left ts is later
    left = rd.from_arrow(pa.table({"k": ["b"], "ts": _ts([100]), "lid": [1]}))
    right = rd.from_arrow(pa.table({"k": ["a"], "ts": _ts([50]), "rid": [9]}))
    out = asof_join(left, right, key="k", ts_col="ts", num_partitions=2).to_pandas()
    assert len(out) == 1 and np.isnan(out["rid"][0])


def test_asof_join_column_collision_raises():
    left = rd.from_arrow(pa.table({"k": ["a"], "ts": _ts([1]), "v": [1]}))
    right = rd.from_arrow(pa.table({"k": ["a"], "ts": _ts([1]), "v": [2]}))
    try:
        asof_join(left, right, key="k", ts_col="ts")
        assert False, "collision must raise"
    except ValueError as e:
        assert "collision" in str(e)


def test_grouped_topk_sub_n_groups_and_ties():
    ds = rd.from_arrow(pa.table({
        "g": ["x", "x", "x", "x", "y"],
        "v": [5.0, 9.0, 9.0, 1.0, 3.0],
        "id": [1, 2, 3, 4, 5],
    }))
    out = grouped_topk(ds, "g", [("v", "descending"), ("id", "ascending")], n=2).to_pandas()
    rows = _sorted_rows(out, ["g", "rank", "id"])
    # tie at v=9 broken by id asc; y has only one row (rank 1, no padding)
    assert rows == [("x", 1, 2), ("x", 2, 3), ("y", 1, 5)]


def test_grouped_topk_partial_stage_prunes():
    # 1 key spread over 4 blocks of 25 rows: the shuffle input must carry
    # <= n rows per key per batch (here <= 3*4 = 12 of the 100), and the
    # final re-rank must still find the global top-3
    ds = rd.from_arrow(pa.table({
        "g": ["k"] * 100, "v": list(range(100)), "id": list(range(100))
    })).repartition(4)
    out = grouped_topk(ds, "g", [("v", "descending"), ("id", "ascending")], n=3).to_pandas()
    assert list(out.sort_values("rank")["v"]) == [99, 98, 97]

    # pin the pruning property itself, not just the final answer: run the
    # partial stage exactly as grouped_topk builds it and count its rows
    from raydatax.relational import _segment_starts

    def keep_topn(t):
        s = t.sort_by([("g", "ascending"), ("v", "descending"), ("id", "ascending")])
        seg_start, _ = _segment_starts(s, ["g"])
        rank = np.arange(s.num_rows, dtype=np.int64) - seg_start
        return s.filter(pa.array(rank < 3))

    partial_rows = ds.map_batches(keep_topn, batch_format="pyarrow").count()
    assert partial_rows <= 12, partial_rows  # not the raw 100


def test_hopping_window_membership_on_boundary():
    # size 2h hop 1h: an event exactly ON a window start belongs to that
    # window and the previous one; each event appears in exactly size/hop
    ds = rd.from_arrow(pa.table({
        "k": ["a", "a"],
        "ts": _ts([3600, 3600 + 1800]),  # 01:00:00 and 01:30:00
        "v": [1.0, 2.0],
    }))
    out = hopping_window(ds, "k", "ts", 2 * HOUR_US, HOUR_US,
                         [("v", "count", "n"), ("v", "sum", "s")]).to_pandas()
    got = {(w.hour, int(r.n), float(r.s)) for r, w in zip(out.itertuples(), out["window"])}
    # window 00:00 covers [00:00,02:00): both events; window 01:00 covers both too
    assert (0, 2, 3.0) in got and (1, 2, 3.0) in got
    assert len(out) == 2


def test_hopping_window_int64_ts_with_empty_blocks():
    # regression: the empty-batch path must emit the INPUT ts type for the
    # window column (it hardcoded timestamp[us], producing mixed block
    # schemas for int64 ts columns whenever a block filtered to empty)
    t = pa.table({
        "k": ["a", "a", "b"],
        "ts": pa.array([10, 25, 10], pa.int64()),
        "v": [1.0, 2.0, 4.0],
    })
    ds = rd.from_arrow(t).repartition(4)  # some blocks are empty
    out = hopping_window(ds, "k", "ts", size_us=20, hop_us=10,
                         aggs=[("v", "sum", "s")])
    assert out.schema().types[out.schema().names.index("window")] == pa.int64()
    rows = {(r["k"], r["window"]): r["s"] for r in out.take_all()}
    # ts=10 → windows {0, 10}; ts=25 → windows {10, 20}
    assert rows[("a", 0)] == 1.0 and rows[("a", 10)] == 3.0
    assert rows[("a", 20)] == 2.0 and rows[("b", 10)] == 4.0 and rows[("b", 0)] == 4.0


def test_hopping_window_size_must_divide():
    ds = rd.from_arrow(pa.table({"k": ["a"], "ts": _ts([0]), "v": [1.0]}))
    try:
        hopping_window(ds, "k", "ts", 3 * HOUR_US, 2 * HOUR_US, [("v", "count", "n")])
        assert False
    except ValueError as e:
        assert "multiple" in str(e)


def test_window_scan_per_key_resets():
    ds = rd.from_arrow(pa.table({
        "k": ["a", "a", "a", "b"],
        "o": [10, 20, 30, 5],
        "v": [1, 2, 3, 7],
    }))
    out = window_scan(ds, "k", "o", lag_cols=["v"], sum_cols=["v"],
                      num_partitions=4).to_pandas()
    out = out.sort_values(["k", "o"]).reset_index(drop=True)
    assert list(out["rn"]) == [1, 2, 3, 1]
    assert list(out["run_v"]) == [1, 3, 6, 7]          # resets at key b
    prev = out["prev_v"]
    assert np.isnan(prev[0]) and list(prev[1:3]) == [1, 2] and np.isnan(prev[3])


def test_window_scan_key_in_one_partition_despite_many_blocks():
    # one key spread over many input blocks still yields one dense ordered scan
    n = 500
    ds = rd.from_arrow(pa.table({
        "k": ["k"] * n, "o": list(range(n)), "v": [1] * n
    })).repartition(8)
    out = window_scan(ds, "k", "o", sum_cols=["v"], num_partitions=4).to_pandas()
    out = out.sort_values("o")
    assert list(out["rn"]) == list(range(1, n + 1))
    assert list(out["run_v"]) == list(range(1, n + 1))


def test_range_join_inclusive_bounds_overlaps_and_keys():
    # intervals overlap arbitrarily; bounds inclusive BOTH ends; no key leak
    left = rd.from_arrow(pa.table({
        "k": ["u", "u", "u", "u", "w"],
        "ts": _ts([5, 10, 20, 30, 10]),
        "lid": [1, 2, 3, 4, 5],
    }))
    right = rd.from_arrow(pa.table({
        "k": ["u", "u", "u"],
        "lo": _ts([5, 8, 25]),
        "hi": _ts([10, 20, 30]),
        "rid": [100, 200, 300],
    }))
    out = range_join(left, right, key="k", ts_col="ts",
                     lo_col="lo", hi_col="hi", num_partitions=4).to_pandas()
    pairs = _sorted_rows(out, ["lid", "rid"])
    # lid1@5: in [5,10] (lo tie inclusive); lid2@10: in [5,10] (hi tie) AND [8,20]
    # lid3@20: [8,20] only; lid4@30: [25,30]; lid5 key w: inner join -> dropped
    assert pairs == [(1, 100), (2, 100), (2, 200), (3, 200), (4, 300)]


def test_range_join_short_interval_among_long_ones():
    # the probe window is sized by the LONGEST interval in the partition;
    # a short interval between long ones must still match exactly
    left = rd.from_arrow(pa.table({
        "k": ["u", "u"], "ts": _ts([100, 51]), "lid": [1, 2]
    }))
    right = rd.from_arrow(pa.table({
        "k": ["u", "u"],
        "lo": _ts([0, 99]),
        "hi": _ts([50, 101]),   # long [0,50], short [99,101]
        "rid": [10, 20],
    }))
    out = range_join(left, right, key="k", ts_col="ts",
                     lo_col="lo", hi_col="hi", num_partitions=2).to_pandas()
    # lid1@100 matches only the short one; lid2@51 matches nothing
    assert _sorted_rows(out, ["lid", "rid"]) == [(1, 20)]


def test_range_join_empty_sides_and_collision():
    left = rd.from_arrow(pa.table({"k": ["u"], "ts": _ts([1]), "lid": [1]}))
    right_empty = rd.from_arrow(pa.table({
        "k": pa.array([], pa.string()),
        "lo": pa.chunked_array([], pa.timestamp("us")),
        "hi": pa.chunked_array([], pa.timestamp("us")),
        "rid": pa.array([], pa.int64()),
    }))
    out = range_join(left, right_empty, key="k", ts_col="ts",
                     lo_col="lo", hi_col="hi", num_partitions=2)
    assert out.count() == 0
    bad = rd.from_arrow(pa.table({
        "k": ["u"], "lo": _ts([0]), "hi": _ts([2]), "lid": [9]
    }))
    try:
        range_join(left, bad, key="k", ts_col="ts", lo_col="lo", hi_col="hi")
        assert False, "collision must raise"
    except ValueError as e:
        assert "collision" in str(e)


def test_rollup_levels_and_null_markers():
    ds = rd.from_arrow(pa.table({
        "a": ["r1", "r1", "r2"],
        "b": ["n1", "n2", "n3"],
        "v": [1, 2, 4],
    }))
    out = rollup_aggregate(ds, ["a", "b"],
                           [("v", "sum", "s"), ("v", "count", "c"),
                            ("v", "max", "mx")]).to_pandas()
    rows = {(r.a if isinstance(r.a, str) else None,
             r.b if isinstance(r.b, str) else None): (int(r.s), int(r.c), int(r.mx))
            for r in out.itertuples()}
    assert rows[("r1", "n1")] == (1, 1, 1)
    assert rows[("r1", None)] == (3, 2, 2)     # count rolls up as SUM of counts
    assert rows[("r2", None)] == (4, 1, 4)
    assert rows[(None, None)] == (7, 3, 4)     # grand total; max of maxes
    assert len(rows) == 3 + 2 + 1


def test_melt_wide_to_long_with_type_unification():
    from raydatax.relational import melt
    ds = rd.from_arrow(pa.table({
        "id": ["a", "b"],
        "x": pa.array([1, 2], pa.int32()),      # int32 + float64 -> float64
        "y": [1.5, None],
    }))
    out = melt(ds, ["id"], ["x", "y"], var_name="m", value_name="v")
    t = out.to_pandas()
    assert len(t) == 4
    rows = {(r.id, r.m): r.v for r in t.itertuples()}
    assert rows[("a", "x")] == 1.0 and rows[("b", "x")] == 2.0
    assert rows[("a", "y")] == 1.5
    assert rows[("b", "y")] != rows[("b", "y")]  # NaN (null passes through)
    try:
        melt(ds, ["id"], [])
        assert False, "empty value_cols must raise"
    except ValueError as e:
        assert "value_cols" in str(e)


def test_pivot_long_to_wide_sum_count_and_missing_value():
    from raydatax.relational import pivot
    ds = rd.from_arrow(pa.table({
        "k": ["u1", "u1", "u1", "u2"],
        "p": ["a", "a", "b", "a"],
        "v": [10, 20, 5, 7],
    })).repartition(3)
    out = pivot(ds, key="k", pivot_col="p", value_col="v",
                values=["a", "b", "zzz"], agg="sum").to_pandas()
    rows = {r.k: (r.a, r.b) for r in out.itertuples()}
    assert rows["u1"] == (30, 5)
    assert rows["u2"][0] == 7
    # value never present in the data -> all-null column, and u2 has no 'b'
    assert out.set_index("k").loc["u2", "b"] != out.set_index("k").loc["u2", "b"] or \
        out.set_index("k").loc["u2", "b"] is None or \
        str(out.set_index("k").loc["u2", "b"]) in ("nan", "<NA>", "None")
    cnt = pivot(ds, key="k", pivot_col="p", value_col="v",
                values=["a", "b"], agg="count").to_pandas()
    crows = {r.k: (int(r.a), int(r.b)) for r in cnt.itertuples()}
    assert crows["u1"] == (2, 1)
    assert crows["u2"] == (1, 0)
    try:
        pivot(ds, key="k", pivot_col="p", value_col="v", values=["a"], agg="avg")
        assert False, "bad agg must raise"
    except ValueError as e:
        assert "sum|count" in str(e)


def test_grouped_stats_moments_and_single_row_nulls():
    from raydatax.relational import grouped_stats
    import math
    ds = rd.from_arrow(pa.table({
        "k": ["a", "a", "a", "b", "c", "c"],
        "v": [2, 4, 6, 10, 5, 5],
    })).repartition(3)
    out = grouped_stats(ds, ["k"], "v").to_pandas().set_index("k")
    assert int(out.loc["a", "n_rows"]) == 3 and int(out.loc["a", "sum_v"]) == 12
    assert out.loc["a", "mean_v"] == 4.0
    assert out.loc["a", "var_v"] == 4.0          # sample var of 2,4,6
    assert out.loc["a", "std_v"] == 2.0
    assert math.isnan(out.loc["b", "var_v"])     # single row -> null var/std
    assert math.isnan(out.loc["b", "std_v"])
    assert out.loc["c", "var_v"] == 0.0 and out.loc["c", "std_v"] == 0.0
    # squares are overflow-checked, not silently wrapped
    big = rd.from_arrow(pa.table({"k": ["x"], "v": [2**33]}))
    try:
        grouped_stats(big, ["k"], "v").to_pandas()
        assert False, "int64 square overflow must raise"
    except Exception as e:
        assert "overflow" in str(e).lower()


def test_grouped_concat_order_nulls_and_large_string():
    from raydatax.relational import grouped_concat
    ds = rd.from_arrow(pa.table({
        "k": ["a", "a", "b", "a", "b"],
        "o": [3, 1, 1, 2, 2],
        "v": ["z", "x", None, "y", "q"],   # null dropped (string_agg rule)
    })).repartition(2)
    out = grouped_concat(ds, ["k"], "v", ["o"], sep="-",
                         out_name="s", count_name="n").to_pandas().set_index("k")
    assert out.loc["a", "s"] == "x-y-z" and int(out.loc["a", "n"]) == 3
    assert out.loc["b", "s"] == "q" and int(out.loc["b", "n"]) == 1
    # large_string values go through the int64-offset list path
    big = pa.table({
        "k": ["g", "g"],
        "o": [2, 1],
        "v": pa.array(["B", "A"], pa.large_string()),
    })
    out2 = grouped_concat(rd.from_arrow(big), ["k"], "v", ["o"],
                          sep="+", out_name="s").to_pandas()
    assert out2.loc[0, "s"] == "A+B"


def test_set_distinct_intersect_except_nulls_and_dupes():
    from raydatax.relational import set_distinct
    left = rd.from_arrow(pa.table({
        "a": ["x", "x", "y", None, "z"],
        "b": [1, 1, 2, 3, 4],
    }))
    right = rd.from_arrow(pa.table({
        "a": ["x", None, "q"],
        "b": [1, 3, 9],
    }))
    def rows(ds):
        t = ds.to_pandas()
        out = []
        for a, b in t[["a", "b"]].itertuples(index=False, name=None):
            out.append((None if a is None or a != a else a, int(b)))
        return sorted(out, key=str)

    inter = rows(set_distinct(left, right, "intersect"))
    # duplicates collapse; NULL keys compare equal (SQL set-op rule)
    assert (None, 3) in inter
    assert ("x", 1) in inter and len(inter) == 2
    exc = rows(set_distinct(left, right, "except"))
    assert sorted(exc, key=str) == sorted([("y", 2), ("z", 4)], key=str)
    try:
        set_distinct(left, rd.from_arrow(pa.table({"a": ["x"]})), "intersect")
        assert False, "column mismatch must raise"
    except ValueError as e:
        assert "column mismatch" in str(e)
    try:
        set_distinct(left, right, "union")
        assert False, "bad op must raise"
    except ValueError as e:
        assert "intersect|except" in str(e)


def test_window_scan_rank_dense_rank_ties():
    from raydatax.relational import window_scan
    ds = rd.from_arrow(pa.table({
        "k": ["a", "a", "a", "a", "b"],
        "o": [10, 10, 20, 30, 7],
    }))
    out = window_scan(ds, key="k", order_col="o", ranks=True).to_pandas()
    got = sorted(
        (r.k, int(r.o), int(r.rank), int(r.dense_rank)) for r in out.itertuples()
    )
    assert got == [
        ("a", 10, 1, 1), ("a", 10, 1, 1),   # tie shares rank
        ("a", 20, 3, 2),                     # rank gaps, dense_rank doesn't
        ("a", 30, 4, 3),
        ("b", 7, 1, 1),                      # resets per key
    ]


def test_deterministic_sample_reproducible_and_validated():
    from raydatax.relational import deterministic_sample
    t = pa.table({"id": list(range(1000)), "v": [float(i) for i in range(1000)]})
    a = deterministic_sample(rd.from_arrow(t), "id", 100).to_pandas()
    b = deterministic_sample(rd.from_arrow(t).repartition(7), "id", 100).to_pandas()
    # partitioning-independent and deterministic
    assert sorted(a["id"]) == sorted(b["id"])
    assert 50 <= len(a) <= 150                     # ~10% of 1000
    assert sorted(deterministic_sample(rd.from_arrow(t), "id", 0).to_pandas().index) == []
    assert len(deterministic_sample(rd.from_arrow(t), "id", 1000).to_pandas()) == 1000
    try:
        deterministic_sample(rd.from_arrow(t), "id", 1001)
        assert False, "permille range must be validated"
    except ValueError as e:
        assert "permille" in str(e)


def test_approx_count_distinct_accuracy_and_merge():
    from raydatax.relational import approx_count_distinct
    # 40k distinct ints with duplicates, spread over many blocks: the
    # per-batch sketches must max-merge to the same answer regardless of
    # partitioning (associativity), within HLL's ~0.8% standard error
    ids = np.concatenate([np.arange(40_000), np.arange(10_000)])
    rng = np.random.default_rng(7)
    rng.shuffle(ids)
    t = pa.table({"u": ids})
    est1 = approx_count_distinct(rd.from_arrow(t), "u")
    est2 = approx_count_distinct(rd.from_arrow(t).repartition(13), "u")
    # n=40k at p=14 sits in the classic-HLL crossover zone: ~5% bound
    assert abs(est1 - 40_000) / 40_000 < 0.05
    assert abs(est2 - 40_000) / 40_000 < 0.05
    assert est1 == est2                      # merge is partitioning-invariant
    # string path + exact small-range regime (linear counting)
    s = pa.table({"u": [f"user-{i % 500}" for i in range(5000)]})
    est_s = approx_count_distinct(rd.from_arrow(s), "u")
    assert abs(est_s - 500) / 500 < 0.05
    try:
        approx_count_distinct(rd.from_arrow(t), "u", p=3)
        assert False, "p range must be validated"
    except ValueError as e:
        assert "p must be" in str(e)


def test_window_scan_lead_pct_cume_ntile():
    from raydatax.relational import window_scan
    ds = rd.from_arrow(pa.table({
        "k": ["a", "a", "a", "a", "a", "b"],
        "o": [1, 2, 3, 4, 5, 1],
        "v": [10, 20, 30, 40, 50, 7],
    }))
    out = window_scan(ds, key="k", order_col="o", lead_cols=["v"],
                      pct=True, ntile_n=2).to_pandas()
    out = out.sort_values(["k", "o"]).reset_index(drop=True)
    a = out[out.k == "a"]
    assert list(a["next_v"])[:4] == [20, 30, 40, 50]
    assert np.isnan(list(a["next_v"])[4])            # lead at segment end
    assert list(a["percent_rank"]) == [0.0, 0.25, 0.5, 0.75, 1.0]
    assert list(a["cume_dist"]) == [0.2, 0.4, 0.6, 0.8, 1.0]
    assert list(a["tile"]) == [1, 1, 1, 2, 2]        # 5 rows, 2 tiles: 3+2
    b = out[out.k == "b"]
    assert np.isnan(b["next_v"].iloc[0])             # single-row key
    assert b["percent_rank"].iloc[0] == 0.0 and b["cume_dist"].iloc[0] == 1.0
    assert int(b["tile"].iloc[0]) == 1
    # ties: equal order values share percent_rank and cume_dist
    t2 = rd.from_arrow(pa.table({"k": ["x"] * 4, "o": [5, 5, 7, 7], "v": [1, 1, 1, 1]}))
    o2 = window_scan(t2, key="k", order_col="o", pct=True).to_pandas()
    got = sorted((int(r.o), r.percent_rank, r.cume_dist) for r in o2.itertuples())
    assert got == [(5, 0.0, 0.5), (5, 0.0, 0.5), (7, 2/3, 1.0), (7, 2/3, 1.0)]
    try:
        window_scan(t2, key="k", order_col="o", ntile_n=0)
        assert False, "ntile_n must be validated"
    except ValueError as e:
        assert "ntile_n" in str(e)


def test_grouped_approx_count_distinct_per_key_accuracy():
    from raydatax.relational import grouped_approx_count_distinct
    rng = np.random.default_rng(3)
    # key a: 3000 distinct of 9000 rows; key b: 10 distinct; key c: 1
    ka = rng.integers(0, 3000, 9000)
    t = pa.table({
        "k": ["a"] * 9000 + ["b"] * 100 + ["c"],
        "u": np.concatenate([ka, np.arange(10).repeat(10), [99]]),
    })
    out = grouped_approx_count_distinct(
        rd.from_arrow(t).repartition(5), ["k"], "u"
    ).to_pandas().set_index("k")["approx_distinct"]
    exact_a = len(np.unique(ka))
    assert abs(int(out["a"]) - exact_a) / exact_a < 0.05
    assert int(out["b"]) == 10          # linear-counting regime is near-exact
    assert int(out["c"]) == 1
    try:
        grouped_approx_count_distinct(rd.from_arrow(t), ["k"], "u", p=17)
        assert False, "p range must be validated"
    except ValueError as e:
        assert "p must be" in str(e)


def test_grouped_corr_perfect_anti_constant_single():
    from raydatax.relational import grouped_corr
    import math
    ds = rd.from_arrow(pa.table({
        "k": ["p", "p", "p", "a", "a", "c", "c", "s"],
        "x": [1,   2,   3,   1,   2,   5,   9,   4],
        "y": [10,  20,  30,  8,   4,   7,   7,   1],
    })).repartition(3)
    out = grouped_corr(ds, ["k"], "x", "y").to_pandas().set_index("k")
    assert out.loc["p", "corr"] == 1.0           # perfectly linear
    assert out.loc["a", "corr"] == -1.0          # perfectly anti-linear
    assert out.loc["a", "covar_samp"] == -2.0    # cov of (1,8),(2,4)
    assert math.isnan(out.loc["c", "corr"])      # constant y -> zero variance
    assert out.loc["c", "covar_samp"] == 0.0
    assert math.isnan(out.loc["s", "corr"])      # single row
    assert math.isnan(out.loc["s", "covar_samp"])


def test_window_scan_first_last_values():
    from raydatax.relational import window_scan
    ds = rd.from_arrow(pa.table({
        "k": ["a", "a", "a", "b"],
        "o": [2, 1, 3, 9],
        "v": [20, 10, 30, 7],
    }))
    out = window_scan(ds, key="k", order_col="o",
                      first_last_cols=["v"]).to_pandas()
    out = out.sort_values(["k", "o"]).reset_index(drop=True)
    assert list(out["first_v"]) == [10, 10, 10, 7]
    assert list(out["last_v"]) == [30, 30, 30, 7]


def test_bloom_build_probe_no_false_negatives_and_fp_rate():
    from raydatax.relational import bloom_semi_join, build_bloom, _hll_hash, _hll_finalize
    present = pa.table({"k": np.arange(0, 20_000, 2)})        # evens
    bitmap, m_bits, n_hashes = build_bloom(rd.from_arrow(present), "k")
    bm = np.frombuffer(bitmap, np.uint8)
    mask = np.uint64(m_bits - 1)

    def hits(vals):
        t = pa.table({"k": vals})
        h1 = _hll_hash(t["k"].combine_chunks())
        h2 = _hll_finalize(h1) | np.uint64(1)
        ok = np.ones(len(vals), bool)
        for i in range(n_hashes):
            with np.errstate(over="ignore"):
                pos = (h1 + np.uint64(i) * h2) & mask
            ok &= ((bm[(pos >> np.uint64(3)).astype(np.int64)]
                    >> (pos & np.uint64(7)).astype(np.uint8)) & 1) > 0
        return ok

    assert hits(np.arange(0, 20_000, 2)).all()                # NO false negatives
    fp = hits(np.arange(1, 20_000, 2)).mean()                 # odds are absent
    assert fp < 0.02, fp                                      # ~0.3% expected at 12 bits/key
    # end-to-end exactness: bloom path == plain key-set semantics
    left = rd.from_arrow(pa.table({"k": np.arange(100), "v": np.arange(100)}))
    right = rd.from_arrow(pa.table({"k": np.array([3, 5, 5, 97, 1000])}))
    out = bloom_semi_join(left, right, "k").to_pandas()
    assert sorted(out["k"]) == [3, 5, 97]


def test_heavy_hitters_exact_and_truncated_regimes():
    from raydatax.relational import heavy_hitters
    rng = np.random.default_rng(11)
    # exact regime: distinct fits capacity -> counts identical to value_counts
    small = pa.array(rng.integers(0, 20, 5000).astype(np.int64))
    t = pa.table({"v": small})
    out = heavy_hitters(rd.from_arrow(t).repartition(6), "v", k=5, capacity=64)
    import collections
    exact = collections.Counter(small.to_pylist())
    expect = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = list(zip(out["v"].to_pylist(), out["cnt"].to_pylist()))
    assert got == expect
    # truncated regime: zipf-ish skew, capacity 8 << 200 distinct values;
    # merged counts are undercounts within sum_b(n_b)/capacity and the true
    # heavy hitter is still ranked first
    vals = np.concatenate([
        np.zeros(3000, np.int64),                 # one dominant value
        rng.integers(1, 200, 3000).astype(np.int64),
    ])
    rng.shuffle(vals)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(10)
    out2 = heavy_hitters(ds, "v", k=3, capacity=8)
    assert out2["v"][0].as_py() == 0
    cnt0 = out2["cnt"][0].as_py()
    assert cnt0 <= 3000 and 3000 - cnt0 <= len(vals) / 8


def test_cross_join_broadcast_product_and_collision():
    from raydatax.relational import cross_join_broadcast
    left = rd.from_arrow(pa.table({"x": [1, 2, 3]})).repartition(2)
    right = pa.table({"y": ["a", "b"]})
    out = cross_join_broadcast(left, right).to_pandas()
    assert sorted(map(tuple, out[["x", "y"]].itertuples(index=False, name=None))) == [
        (1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "b")
    ]
    try:
        cross_join_broadcast(left, pa.table({"x": [9]})).to_pandas()
        assert False, "column collision must raise"
    except Exception as e:
        assert "collision" in str(e)
    try:
        cross_join_broadcast(left, pa.table({"y": pa.array([], pa.string())}))
        assert False, "empty right must raise"
    except ValueError as e:
        assert "non-empty" in str(e)


def test_hash_split_complement_and_stability():
    from raydatax.relational import hash_split
    t = pa.table({"id": list(range(2000)), "v": list(range(2000))})
    train, test = hash_split(rd.from_arrow(t), "id", 200)
    tr, te = train.to_pandas(), test.to_pandas()
    assert len(tr) + len(te) == 2000
    assert set(tr["id"]).isdisjoint(set(te["id"]))          # exact complements
    # the multiplicative hash is equidistributed mod 1000, so sequential
    # keys split almost exactly proportionally (here exactly 20%)
    assert 300 <= len(te) <= 500
    # partitioning-invariant: same rows land on the same side
    train2, test2 = hash_split(rd.from_arrow(t).repartition(7), "id", 200)
    assert sorted(test2.to_pandas()["id"]) == sorted(te["id"])


def test_pivot_auto_discovers_values_and_caps():
    from raydatax.relational import pivot_auto
    ds = rd.from_arrow(pa.table({
        "k": ["u1", "u1", "u2"],
        "p": ["b", "a", "a"],
        "v": [5, 10, 7],
    }))
    out = pivot_auto(ds, key="k", pivot_col="p", value_col="v").to_pandas()
    assert list(out.columns) == ["k", "a", "b"]       # sorted, deterministic
    rows = {r.k: (r.a, r.b) for r in out.itertuples()}
    assert rows["u1"] == (10, 5)
    assert rows["u2"][0] == 7
    try:
        pivot_auto(ds, key="k", pivot_col="p", value_col="v", max_values=1)
        assert False, "cap must raise"
    except ValueError as e:
        assert "max_values" in str(e)


def test_mix_corpora_weighted_tagged_reproducible():
    from raydatax.relational import mix_corpora
    a = pa.table({"_mix_key": list(range(1000)), "text": ["a"] * 1000})
    b = pa.table({"_mix_key": list(range(1000)), "text": ["b"] * 1000})
    mixed = mix_corpora([
        (rd.from_arrow(a), "web", 800),
        (rd.from_arrow(b), "code", 200),
    ]).to_pandas()
    by_src = mixed.groupby("source").size()
    assert by_src["web"] == 800 and by_src["code"] == 200   # exact (equidistributed hash)
    # reproducible under different partitioning
    mixed2 = mix_corpora([
        (rd.from_arrow(a).repartition(7), "web", 800),
        (rd.from_arrow(b).repartition(3), "code", 200),
    ]).to_pandas()
    k1 = sorted(map(tuple, mixed[["source", "_mix_key"]].itertuples(index=False, name=None)))
    k2 = sorted(map(tuple, mixed2[["source", "_mix_key"]].itertuples(index=False, name=None)))
    assert k1 == k2
    try:
        mix_corpora([])
        assert False, "empty sources must raise"
    except ValueError as e:
        assert "at least one" in str(e)


def test_window_scan_moving_sum_bounded_frame(ray_session):
    """ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW: clamps at the segment
    start, never crosses keys, exact ints."""
    import numpy as np

    t = pa.table({
        "k": pa.array(["a"] * 5 + ["b"] * 3),
        "o": pa.array([1, 2, 3, 4, 5, 1, 2, 3], pa.int64()),
        "v": pa.array([10, 20, 30, 40, 50, 7, 8, 9], pa.int64()),
    })
    out = (window_scan(rd.from_arrow(t).repartition(3), key="k", order_col="o",
                       moving_sum=[("v", 3)], num_partitions=4)
           .to_pandas().sort_values(["k", "o"]))
    assert out["mov_v_3"].tolist() == [10, 30, 60, 90, 120, 7, 15, 24]
    import pytest as _pt
    with _pt.raises(ValueError):
        window_scan(rd.from_arrow(t), key="k", order_col="o", moving_sum=[("v", 0)])


def test_explode_list_multiset_and_positions(ray_session):
    from raydatax.relational import explode_list

    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array([[10, 20], [], None, [30]], pa.list_(pa.int64())),
        "tag": pa.array(["a", "b", "c", "d"]),
    })
    out = explode_list(t, "v")
    assert out["id"].to_pylist() == [1, 1, 4]
    assert out["pos"].to_pylist() == [1, 2, 1]
    assert out["v"].to_pylist() == [10, 20, 30]
    assert out["tag"].to_pylist() == ["a", "a", "d"]
    out2 = explode_list(t, "v", pos_col=None, out="elem")
    assert out2.column_names == ["id", "tag", "elem"]


def test_table_profile_nulls_and_types(ray_session):
    import numpy as np

    from raydatax.relational import table_profile

    t = pa.table(
        {
            "i": pa.array([3, None, 1, 3, None, 7], pa.int64()),
            "s": pa.array(["b", "a", None, "a", "c", "b"]),
            "f": pa.array([1.5, 2.25, -0.0, 0.0, None, 2.25], pa.float64()),
        }
    )
    prof = table_profile(rd.from_arrow(t), ["i", "s", "f"])
    rows = {r["column"]: r for r in prof.to_pylist()}
    assert rows["i"] == {
        "column": "i", "n_rows": 6, "n_nulls": 2, "ndv": 3,
        "min_str": "1", "max_str": "7",
    }
    assert rows["s"] == {
        "column": "s", "n_rows": 6, "n_nulls": 1, "ndv": 3,
        "min_str": "a", "max_str": "c",
    }
    # -0.0 and 0.0 collapse to one distinct value (SQL equality), doubles
    # display as milli scale-floor ints
    assert rows["f"] == {
        "column": "f", "n_rows": 6, "n_nulls": 1, "ndv": 3,
        "min_str": "0", "max_str": "2250",
    }


def test_prefix_concat_examples_budget_and_edges(ray_session):
    from raydatax.relational import prefix_concat_examples

    t = pa.table(
        {
            "conv": pa.array(["a", "a", "a", "a", "b", "b"]),
            "turn": pa.array([0, 1, 2, 3, 0, 1], pa.int64()),
            "line": pa.array(["aaaa", "bbbb", "cccc", "dddd", "xx", "yy"]),
            "is_t": pa.array([False, True, False, True, True, True]),
        }
    )
    # no budget: full prefix
    out = {
        (r["conv"], r["turn"]): r
        for r in prefix_concat_examples(
            rd.from_arrow(t), ["conv"], "turn", "line", "is_t"
        ).take_all()
    }
    assert len(out) == 4
    assert out[("a", 1)]["context"] == "aaaa" and out[("a", 1)]["n_context"] == 1
    assert out[("a", 3)]["context"] == "aaaa\nbbbb\ncccc"
    # first row of a segment: empty context, not the previous conv's tail
    assert out[("b", 0)] == {
        "conv": "b", "turn": 0, "line": "xx", "is_t": True,
        "context": "", "n_context": 0,
    }
    assert out[("b", 1)]["context"] == "xx"

    # budget=9: "bbbb\ncccc" joins to exactly 9 -> kept; adding "aaaa"
    # (14) would not
    out9 = {
        (r["conv"], r["turn"]): r
        for r in prefix_concat_examples(
            rd.from_arrow(t), ["conv"], "turn", "line", "is_t", budget=9
        ).take_all()
    }
    assert out9[("a", 3)]["context"] == "bbbb\ncccc"
    assert out9[("a", 3)]["n_context"] == 2
    # budget below the nearest line: empty context
    out3 = {
        (r["conv"], r["turn"]): r
        for r in prefix_concat_examples(
            rd.from_arrow(t), ["conv"], "turn", "line", "is_t", budget=3
        ).take_all()
    }
    assert out3[("a", 3)]["context"] == "" and out3[("a", 3)]["n_context"] == 0
    assert out3[("b", 1)]["context"] == "xx"  # "xx" alone costs 2 <= 3


# --------------------------------------------------------- SCD2 history


def test_scd2_intervals_and_delete_close(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raydatax.relational import scd2_history

    log = pa.table({
        "k": pa.array(["a", "a", "a", "b", "b"], pa.string()),
        "sub": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "op": pa.array(["I", "U", "D", "I", "U"], pa.string()),
        "val": pa.array(["v1", "v2", None, "w1", "w2"], pa.string()),
        "seq": pa.array([10, 20, 30, 5, 40], pa.int64()),
    })
    rows = sorted(
        scd2_history(rd.from_arrow(log), ["k", "sub"], "seq", op_col="op").take_all(),
        key=lambda r: (r["k"], r["seq"]),
    )
    # key a: I@10 -> [10,20), U@20 -> [20,30) closed by the delete, none current
    assert [(r["valid_from_seq"], r["valid_to_seq"], r["is_current"]) for r in rows
            if r["k"] == "a"] == [(10, 20, False), (20, 30, False)]
    # key b: U@40 is the open current version
    assert [(r["valid_from_seq"], r["valid_to_seq"], r["is_current"]) for r in rows
            if r["k"] == "b"] == [(5, 40, False), (40, None, True)]
    # helper columns dropped, payload kept
    assert "val" in rows[0] and "__scd_k" not in rows[0] and "rn" not in rows[0]


def test_scd2_composite_key_no_cross_talk(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raydatax.relational import scd2_history

    # ("x", "1y") vs ("x1", "y"): naive concatenation would collide
    log = pa.table({
        "k1": pa.array(["x", "x1"], pa.string()),
        "k2": pa.array(["1y", "y"], pa.string()),
        "seq": pa.array([1, 2], pa.int64()),
    })
    rows = scd2_history(rd.from_arrow(log), ["k1", "k2"], "seq").take_all()
    assert all(r["is_current"] for r in rows)  # distinct keys, both open


# ------------------------------------------------------ IQR outliers


def test_iqr_outliers_hand_case(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raydatax.relational import iqr_outliers

    vals = [10.0] * 20 + [11.0] * 20 + [12.0] * 20 + [100.0, -50.0]
    t = pa.table({
        "id": pa.array(range(len(vals)), pa.int64()),
        "g": pa.array(["a"] * len(vals), pa.string()),
        "v": pa.array(vals, pa.float64()),
    })
    out = iqr_outliers(rd.from_arrow(t), "g", "v").take_all()
    assert sorted(r["v"] for r in out) == [-50.0, 100.0]


def test_iqr_outliers_null_values_never_flagged(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raydatax.relational import iqr_outliers

    t = pa.table({
        "id": pa.array(range(8), pa.int64()),
        "g": pa.array(["a"] * 8, pa.string()),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, None, 999.0], pa.float64()),
    })
    out = iqr_outliers(rd.from_arrow(t), "g", "v").take_all()
    assert [r["v"] for r in out] == [999.0]


# ------------------------------------------------------ CUBE lattice


def test_cube_aggregate_all_subsets(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raydatax.relational import cube_aggregate

    t = pa.table({
        "a": pa.array(["x", "x", "y"], pa.string()),
        "b": pa.array(["p", "q", "p"], pa.string()),
        "v": pa.array([1, 2, 4], pa.int64()),
    })
    rows = cube_aggregate(rd.from_arrow(t), ["a", "b"],
                          [("v", "sum", "s")]).take_all()
    got = {(r["a"], r["b"]): r["s"] for r in rows}
    assert got == {
        ("x", "p"): 1, ("x", "q"): 2, ("y", "p"): 4,   # finest
        ("x", None): 3, ("y", None): 4,                # by a
        (None, "p"): 5, (None, "q"): 2,                # by b (not in ROLLUP)
        (None, None): 7,                               # grand total
    }
    assert len(rows) == 8


# ------------------------------------------------- count-min sketch


def test_cms_estimate_bounds_and_exactness(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raydatax.relational import cms_estimate

    vals = ["a"] * 50 + ["b"] * 7 + [f"u{i}" for i in range(30)]
    ds = rd.from_arrow(pa.table({"k": pa.array(vals, pa.string())}))
    got = {r["term"]: r["est"]
           for r in cms_estimate(ds, "k", ["a", "b", "absent"]).to_pylist()}
    # CMS is one-sided: estimate >= true count; with width 1024 and 32
    # distinct keys, collisions are unlikely -> exact here
    assert got["a"] >= 50 and got["b"] >= 7 and got["absent"] >= 0
    assert got["a"] == 50 and got["b"] == 7

    import pytest

    with pytest.raises(ValueError):
        cms_estimate(ds, "k", ["a"], depth=3)


def test_iqr_outliers_all_null_values_returns_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raydatax.relational import iqr_outliers

    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "g": pa.array(["a", "a", "b"], pa.string()),
        "v": pa.array([None, None, None], pa.float64()),
    })
    out = iqr_outliers(rd.from_arrow(t), "g", "v")
    assert out.count() == 0
    assert set(out.schema().names) == {"id", "g", "v"}
