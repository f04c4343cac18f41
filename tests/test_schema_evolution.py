"""Schema evolution (FIXTURES F4): early segments lack `tool`, late segments
widen `turn_idx` to int64; the engine unifies at batch boundaries."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from raydatax.driver import lake_table, run_job
from raydatax.gen import gen_events, write_wal
from raydatax.oracle import replay_to_table
from raydatax.schema import evolve_event_schema, lake_schema_for

SORT = [("conv_id", "ascending"), ("turn_idx", "ascending")]


def test_evolution_end_to_end(tmp_wal, tmp_lake):
    ev = gen_events(15_000, seed=21)
    write_wal(ev, tmp_wal, seg_rows=2500, evolution=True)

    segs = sorted(glob.glob(os.path.join(tmp_wal, "seg-*.parquet")))
    schemas = [pq.read_schema(p) for p in segs]
    assert "tool" not in schemas[0].names
    assert schemas[-1].field("turn_idx").type == pa.int64()

    rep = run_job(tmp_wal, tmp_lake, partitions=4)
    assert rep["action"] == "applied"
    got = lake_table(tmp_lake)
    # unified lake schema: tool present, turn_idx widened
    assert got.schema.field("turn_idx").type == pa.int64()
    assert "tool" in got.schema.names

    # oracle over the unified log: events from tool-less segments carry null tool
    evolved = evolve_event_schema(schemas)
    log = pa.concat_tables(
        [pq.read_table(p) for p in segs], promote_options="permissive"
    ).select(evolved.names).cast(evolved)
    want = replay_to_table(log, schema=lake_schema_for(evolved)).sort_by(SORT)
    got = got.sort_by(SORT)
    assert got.cast(want.schema).equals(want)
    # some events lost their tool value by construction
    assert want["tool"].null_count > 0


def test_evolution_incremental(tmp_wal, tmp_lake):
    """Apply the pre-evolution prefix first, then tail the evolved suffix —
    the lake schema must widen across epochs."""
    ev = gen_events(10_000, seed=22)
    n = ev.num_rows
    pre = ev.slice(0, n // 2).drop_columns(["tool"])
    write_wal(pre, tmp_wal, seg_rows=2000)
    run_job(tmp_wal, tmp_lake, partitions=4)
    # canonical schema baseline: `tool` exists but is entirely null pre-evolution
    t1 = lake_table(tmp_lake)
    assert t1["tool"].null_count == t1.num_rows

    post = ev.slice(n // 2)
    existing = len(glob.glob(os.path.join(tmp_wal, "seg-*.parquet")))
    tmp2 = tmp_wal + "_x"
    write_wal(post, tmp2, seg_rows=2000)
    for i, p in enumerate(sorted(glob.glob(os.path.join(tmp2, "seg-*.parquet")))):
        os.rename(p, os.path.join(tmp_wal, f"seg-{existing + i:05d}.parquet"))
    run_job(tmp_wal, tmp_lake, partitions=4)

    got = lake_table(tmp_lake)
    assert "tool" in got.schema.names

    # ground truth: full log with null tool for the prefix
    import pyarrow.compute as pc  # noqa: F401
    pre_null = pre.add_column(
        ev.schema.get_field_index("tool"),
        "tool",
        pa.nulls(pre.num_rows, pa.string()),
    )
    log = pa.concat_tables([pre_null, post])
    want = replay_to_table(log).sort_by(SORT)
    assert got.sort_by(SORT).cast(want.schema).equals(want)
