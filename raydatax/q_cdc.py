"""CDC / lake family queries — replay, upsert, changelog, SCD2, views,
time travel, replication, digests (gate window rows + twins).

Split out of the former monolithic pipelines.py (round-3 verdict item 5);
the registry (QUERIES / ORACLE_SQL) stays in :mod:`raydatax.pipelines`.
"""


import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .relational import (
    lww_latest,
)

from .q_common import (
    _derived_cdc_wal_table,
    _p,
)


# --------------------------------------------------------------- CDC family


def cdc_lww_upsert(sf_dir: str):
    """The engine's upsert contract as a standalone relational op over the
    `events` table: op derived deterministically from event_id, LWW by
    event_id per (user_id, event_type), delete drops the key."""
    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["event_id", "user_id", "event_type", "value"])

    def tag(t: pa.Table) -> pa.Table:
        m = t["event_id"].to_numpy(zero_copy_only=False) % 10
        op = np.where(m < 6, "I", np.where(m < 9, "U", "D"))
        return t.append_column("op", pa.array(op, pa.string()))

    out = lww_latest(
        ds.map_batches(tag, batch_format="pyarrow"),
        ["user_id", "event_type"], "event_id", op_col="op", num_partitions=16,
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "last_event_id": t["event_id"],
                "value": t["value"],
            }
        )

    return out.map_batches(proj, batch_format="pyarrow")


def _project_transcript(lk: pa.Table) -> pa.Table:
    """The flagship's gate projection, shared by every query that is
    oracled against transcript_cdc_replay's SQL (job_json_roundtrip,
    lake_replication) — the three MUST stay byte-identical or a clone
    silently drifts from the shared oracle."""
    full = pc.strftime(lk["ts"], format="%Y-%m-%d %H:%M:%S")
    return pa.table(
        {
            "conv_id": lk["conv_id"],
            "turn_idx": lk["turn_idx"],
            "role": lk["role"],
            "text": lk["text"],
            "tool": lk["tool"],
            "ts_str": pc.utf8_slice_codeunits(full, 0, 19),
            "seq": lk["seq"],
        }
    )


def transcript_cdc_replay(sf_dir: str):
    """Flagship transcript CDC replay THROUGH THE FULL ENGINE — WAL segments
    → salted hash exchange → rebase-LWW merge actors → two-phase manifest
    commit → lake read — with a DuckDB oracle: the CDC event stream is
    derived deterministically from the driver's `events` table (seq =
    event_id, op from event_id % 10, key = (conv-<user>, event_id % 37)),
    so LWW replay is SQL-expressible as
    ``row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC)``
    with delete-winners dropped (mirrors otsstreamreader semantics,
    /root/reference/otsstreamreader/.../core/RecordProcessor.java)."""
    import shutil

    from .driver import lake_table, run_job
    from .gen import write_wal

    wal_table = _derived_cdc_wal_table(sf_dir)

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = f"/tmp/raydatax_entry_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    write_wal(wal_table, os.path.join(root, "wal"), seg_rows=20_000)
    run_job(os.path.join(root, "wal"), os.path.join(root, "lake"), partitions=8)
    lk = lake_table(os.path.join(root, "lake"))
    return _project_transcript(lk)


def job_json_roundtrip(sf_dir: str):
    """The DECLARATIVE surface end-to-end under the exact gate: the same
    derived CDC stream as ``transcript_cdc_replay``, but driven through a
    job-JSON file on disk — ``{"job": {"content": [{"reader": walreader,
    "writer": lakewriter}], "setting": {errorLimit}}}`` — parsed and
    executed by ``job.run_job_config`` (the ``python -m raydatax.job``
    path, mirroring the reference's Engine.java:122-172 job lifecycle:
    parse config → bind reader/writer → run → report).  A green row
    certifies that the declarative runner compiles to the identical
    engine pipeline (salted exchange, LWW merge, two-phase commit) as the
    programmatic API."""
    import json
    import shutil

    from .driver import lake_table
    from .gen import write_wal
    from .job import run_job_config

    wal_table = _derived_cdc_wal_table(sf_dir)

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = f"/tmp/raydatax_jobjson_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    write_wal(wal_table, os.path.join(root, "wal"), seg_rows=20_000)

    cfg = {
        "job": {
            "content": [{
                "reader": {"name": "walreader",
                           "parameter": {"path": os.path.join(root, "wal")}},
                "writer": {"name": "lakewriter",
                           "parameter": {"path": os.path.join(root, "lake"),
                                         "partitions": 4, "salt": 2}},
            }],
            "setting": {"errorLimit": {"record": 0}},
        }
    }
    cfg_path = os.path.join(root, "job.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f, indent=1)
    with open(cfg_path) as f:  # the file IS the interface — reparse it
        report = run_job_config(json.load(f))
    assert report["contents"][0]["action"] == "applied", report

    lk = lake_table(os.path.join(root, "lake"))
    return _project_transcript(lk)


def lake_replication(sf_dir: str):
    """Incremental DR replication under the exact gate: the flagship's
    derived CDC stream is ingested in TWO epochs with a replica sync after
    each (``replicate.replicate_lake``) — the second sync ships only the
    delta epoch's records (asserted), and the query returns the REPLICA's
    table, so the hash-green row certifies the replica is value-identical
    to what the primary's replay produces.  The lake-granularity analogue
    of the reference's whole purpose (moving data between stores), with
    hdfswriter's publish ordering (files → records → manifest pointer,
    `/root/reference/hdfswriter/.../HdfsWriter.java:190-192`)."""
    import glob
    import shutil

    from .driver import lake_table, run_job
    from .gen import write_wal
    from .replicate import replicate_lake

    wal_table = _derived_cdc_wal_table(sf_dir)
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = f"/tmp/raydatax_repl_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    wal = os.path.join(root, "wal")
    # small segments guarantee ≥2 even at sf0.001 (the holdout below
    # needs a non-empty first epoch)
    write_wal(wal_table, wal, seg_rows=max(200, wal_table.num_rows // 8))
    src, dst = os.path.join(root, "lake"), os.path.join(root, "replica")

    # epoch 1: all but the last segment; sync the full lake
    segs = sorted(glob.glob(os.path.join(wal, "seg-*.parquet")))
    holdout = segs[-1] + ".holdout"
    os.replace(segs[-1], holdout)
    run_job(wal, src, partitions=8)
    first = replicate_lake(src, dst)

    # epoch 2: the held-out tail; the sync is incremental
    os.replace(holdout, segs[-1])
    run_job(wal, src, partitions=8)
    second = replicate_lake(src, dst)
    # incremental: the second sync ships exactly the delta epoch's new
    # snapshot per touched partition — never a re-copy of converged bytes
    assert second["files_copied"] == second["partitions_updated"], (first, second)
    assert replicate_lake(src, dst)["noop"]  # converged

    lk = lake_table(dst)
    return _project_transcript(lk)


def lake_snapshot_diff(sf_dir: str):
    """Snapshot diff under the exact gate (``driver.lake_diff`` — the
    Delta-CDF-style ``table_changes`` read surface): the flagship's derived
    CDC stream is applied in TWO epochs split at seq ≤ ⌊max·6/10⌋, and the
    change feed between the two time-travel snapshots is classified
    insert / update / delete by the rows' ``seq`` version.  Exactly
    SQL-expressible: LWW state at each watermark (``row_number() OVER
    (... ORDER BY seq DESC)``), FULL JOINed on the key, kept where either
    side is absent or the winning seq moved.  Engine shape: one Ray task
    per CHANGED partition, zero shuffle; untouched partitions are skipped
    without opening them (work ∝ delta)."""
    import glob
    import shutil

    import ray

    from .driver import lake_diff, run_job
    from .gen import write_wal

    wal_table = _derived_cdc_wal_table(sf_dir)
    w1 = pc.max(wal_table["seq"]).as_py() * 6 // 10  # floor, ints — == SQL //
    early = pc.less_equal(wal_table["seq"], w1)

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = f"/tmp/raydatax_diff_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    wal = os.path.join(root, "wal")
    lake = os.path.join(root, "lake")
    write_wal(wal_table.filter(early), wal, seg_rows=20_000)
    rep1 = run_job(wal, lake, partitions=8, time_travel_epochs=8)
    n0 = len(glob.glob(os.path.join(wal, "seg-*.parquet")))
    late_dir = wal + "_next"
    write_wal(wal_table.filter(pc.invert(early)), late_dir, seg_rows=20_000)
    for i, p in enumerate(sorted(glob.glob(os.path.join(late_dir, "seg-*.parquet")))):
        os.rename(p, os.path.join(wal, f"seg-{n0 + i:05d}.parquet"))
    rep2 = run_job(wal, lake, partitions=8)

    ds = lake_diff(lake, from_epoch=rep1["epoch"], to_epoch=rep2["epoch"])
    parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    t = pa.concat_tables(parts, promote_options="permissive")
    full = pc.strftime(t["ts"], format="%Y-%m-%d %H:%M:%S")
    return pa.table(
        {
            "op": t["_op"],
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "role": t["role"],
            "text": t["text"],
            "tool": t["tool"],
            "ts_str": pc.utf8_slice_codeunits(full, 0, 19),
            "seq": t["seq"],
        }
    )


def conversation_summary_view(sf_dir: str):
    """Incremental materialized view under the SQL gate (view.refresh_view):
    the flagship's derived CDC stream is ingested through the full engine,
    then the per-conversation summary view refreshes partition-locally
    (O(changed partitions), shuffle-free) and the salted-hot-key merge is
    folded at read.  The oracle recomputes the same aggregates over the
    SQL LWW replay — so the view machinery (two-phase refresh commit,
    mergeable-agg discipline) is value-verified end to end."""
    import shutil

    from .driver import run_job
    from .gen import write_wal
    from .view import refresh_view, view_table

    wal_table = _derived_cdc_wal_table(sf_dir)
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = f"/tmp/raydatax_view_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    write_wal(wal_table, os.path.join(root, "wal"), seg_rows=20_000)
    run_job(os.path.join(root, "wal"), os.path.join(root, "lake"), partitions=8)
    refresh_view(os.path.join(root, "lake"), os.path.join(root, "view"))
    v = view_table(os.path.join(root, "view"))
    full = pc.strftime(v["last_ts"], format="%Y-%m-%d %H:%M:%S")
    return pa.table({
        "conv_id": v["conv_id"],
        "n_turns": v["n_turns"],
        "last_seq": v["last_seq"],
        "last_ts_str": pc.utf8_slice_codeunits(full, 0, 19),
    })


def cdc_changelog_export(sf_dir: str):
    """The engine's multi-version output mode under the SQL gate
    (otsstreamreader MultiVerModeRecordSender parity): the same derived CDC
    stream as the flagship, ingested with ``run_job(output="changelog")``,
    read back via ``read_changelog`` — EVERY event with its op + seq must
    survive, deletes included, exactly once."""
    import shutil

    from .driver import changelog_table, run_job
    from .gen import write_wal

    wal_table = _derived_cdc_wal_table(sf_dir)
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = f"/tmp/raydatax_changelog_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    write_wal(wal_table, os.path.join(root, "wal"), seg_rows=20_000)
    run_job(os.path.join(root, "wal"), os.path.join(root, "lake"),
            partitions=8, output="changelog")
    log = changelog_table(os.path.join(root, "lake"))
    full = pc.strftime(log["ts"], format="%Y-%m-%d %H:%M:%S")
    return pa.table(
        {
            "conv_id": log["conv_id"],
            "turn_idx": log["turn_idx"],
            "op": log["op"],
            "role": log["role"],
            "text": log["text"],
            "tool": log["tool"],
            "ts_str": pc.utf8_slice_codeunits(full, 0, 19),
            "seq": log["seq"],
        }
    )


def scd2_transcripts(sf_dir: str):
    """Type-2 SCD history straight off the engine's changelog output
    (relational.scd2_history over read-back multi-version rows): every
    non-delete change event becomes a validity interval
    [valid_from_seq, valid_to_seq) per (conv_id, turn_idx); deletes close
    the chain.  One hash-partitioned ordered scan; SQL is the identical
    lead() window."""
    import shutil

    from .driver import changelog_table, run_job
    from .gen import write_wal
    from .relational import scd2_history

    wal_table = _derived_cdc_wal_table(sf_dir)
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = f"/tmp/raydatax_scd2_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    write_wal(wal_table, os.path.join(root, "wal"), seg_rows=20_000)
    run_job(os.path.join(root, "wal"), os.path.join(root, "lake"),
            partitions=8, output="changelog")
    log = changelog_table(os.path.join(root, "lake")).select(
        ["conv_id", "turn_idx", "op", "role", "text", "seq"]
    )
    hist = scd2_history(
        rd.from_arrow(log), ["conv_id", "turn_idx"], "seq", op_col="op"
    )
    return hist.select_columns(
        ["conv_id", "turn_idx", "role", "text",
         "valid_from_seq", "valid_to_seq", "is_current"]
    )


def snapshot_cdc_orders(sf_dir: str):
    """Binlog-free CDC (relational.snapshot_cdc): two deterministic
    snapshots of `orders` — old drops key%11==0 (→ I), perturbs
    o_totalprice for key%7==0 (→ U), new drops key%13==0 (→ D) — are
    full-outer hash-joined and classified into I/U/D change events with
    null-safe payload comparison.  SQL twin is the identical FULL OUTER
    JOIN."""
    from .relational import snapshot_cdc

    base = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
    )

    def mk_old(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(k % 11 != 0))
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        bump = pc.if_else(pa.array(k % 7 == 0),
                          pc.add(t["o_totalprice"], 1.0), t["o_totalprice"])
        return t.set_column(t.schema.get_field_index("o_totalprice"),
                            "o_totalprice", bump)

    def mk_new(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(k % 13 != 0))

    old = base.map_batches(mk_old, batch_format="pyarrow")
    new = base.map_batches(mk_new, batch_format="pyarrow")
    return snapshot_cdc(new, old, ["o_orderkey"],
                        ["o_orderstatus", "o_totalprice"])


def lake_state_digest(sf_dir: str):
    """Order-free content digest of the flagship lake (fsck.lake_digest):
    per logical conv-hash group, row count + mod-2^64 sum of each row's
    buffer-level content hash — replica verification without moving a
    row.  The SQL twin replays the same state and reproduces the
    poly/mix64 hashes in HUGEINT arithmetic."""
    import shutil

    from .driver import run_job
    from .fsck import lake_digest
    from .gen import write_wal

    wal_table = _derived_cdc_wal_table(sf_dir)
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = f"/tmp/raydatax_digest_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    write_wal(wal_table, os.path.join(root, "wal"), seg_rows=20_000)
    run_job(os.path.join(root, "wal"), os.path.join(root, "lake"), partitions=8)
    return lake_digest(os.path.join(root, "lake"), groups=8)


def lake_time_travel(sf_dir: str):
    """Time travel under the exact gate: the derived CDC stream lands in
    TWO applies (events with seq ≤ max_seq // 2, then the rest — two
    committed epochs), and the query reads the lake AS OF the FIRST epoch
    via ``read_lake(at_epoch=1)`` — the result must equal the SQL LWW
    replay of only the first half, proving later commits never leak into
    a historical snapshot.  The lake retains history via
    ``run_job(time_travel_epochs=4)``."""
    import shutil

    from .driver import lake_table, run_job
    from .gen import append_wal, write_wal

    wal_table = _derived_cdc_wal_table(sf_dir)
    cutoff = int(pc.max(wal_table["seq"]).as_py()) // 2
    early = pc.less_equal(wal_table["seq"], cutoff)
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = f"/tmp/raydatax_ttravel_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    wal, lake = os.path.join(root, "wal"), os.path.join(root, "lake")
    write_wal(wal_table.filter(early), wal, seg_rows=20_000)
    run_job(wal, lake, partitions=8, time_travel_epochs=4)
    append_wal(wal_table.filter(pc.invert(early)), wal, seg_rows=20_000)
    run_job(wal, lake, partitions=8, time_travel_epochs=4)
    return _project_transcript(lake_table(lake, at_epoch=1))


def schema_evolution_replay(sf_dir: str):
    """Schema evolution under the exact gate (FIXTURES F4): the WAL is
    written with evolution=True — the first 40% of segments LACK the tool
    column (added-column drift) and the last 20% widen turn_idx to int64 —
    and the replay must still land on the SQL state, with tool NULL
    exactly where the winning event predates the column (Arrow schema
    unification at batch boundaries, schema.unify)."""
    import shutil

    from .driver import lake_table, run_job
    from .gen import write_wal

    wal_table = _derived_cdc_wal_table(sf_dir)
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = f"/tmp/raydatax_evolve_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    wal, lake = os.path.join(root, "wal"), os.path.join(root, "lake")
    write_wal(wal_table, wal, seg_rows=1000, evolution=True)
    run_job(wal, lake, partitions=8)
    return _project_transcript(lake_table(lake))


def transcript_window_replay(sf_dir: str):
    """Time-bounded replay, hash-verified: the same derived CDC stream as
    the flagship but with a seq-monotone event time (ts = BASE + seq
    seconds, the realistic binlog property windowed replay documents),
    applied as TWO consecutive [start_ts, end_ts) windows through the full
    engine — checkpoint-at-boundary, windowed mode state — whose final lake
    must equal the one-shot LWW replay the SQL oracle computes."""
    import shutil

    import pyarrow.parquet as pq

    from .driver import lake_table, run_job
    from .gen import BASE_TS_US, write_wal
    from .schema import EVENT_SCHEMA

    e = pq.read_table(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "event_type"]
    ).sort_by([("event_id", "ascending")])
    eid = e["event_id"].to_numpy()
    opk = np.where(eid % 10 < 6, 0, np.where(eid % 10 < 9, 1, 2)).astype(np.int8)
    op = pa.array(["I", "U", "D"], pa.string()).take(pa.array(opk))
    conv = pc.binary_join_element_wise(
        pa.scalar("conv-"), pc.cast(e["user_id"], pa.string()), ""
    )
    turn = (eid % 37).astype(np.int32)
    role = pa.array(["user", "assistant"], pa.string()).take(
        pa.array((turn % 2).astype(np.int8))
    )
    text = pc.binary_join_element_wise(
        e["event_type"], pc.cast(e["event_id"], pa.string()), " w"
    )
    ts = pa.array(BASE_TS_US + eid * 1_000_000, pa.timestamp("us"))

    is_del = pa.array(opk == 2)

    def _mask(arr):
        a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        return pc.if_else(is_del, pa.scalar(None, a.type), a)

    wal_table = pa.Table.from_arrays(
        [
            pa.array(eid, pa.int64()),
            op,
            conv.combine_chunks() if isinstance(conv, pa.ChunkedArray) else conv,
            pa.array(turn, pa.int32()),
            _mask(role),
            _mask(text),
            pa.nulls(len(eid), pa.string()),  # tool: absent in this stream
            ts,  # event time set on every op incl. deletes
        ],
        schema=EVENT_SCHEMA,
    )

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = f"/tmp/raydatax_window_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    wal = os.path.join(root, "wal")
    lake = os.path.join(root, "lake")
    write_wal(wal_table, wal, seg_rows=20_000)
    mid = int(BASE_TS_US + int(np.median(eid)) * 1_000_000)
    end = int(BASE_TS_US + (int(eid.max()) + 1) * 1_000_000)
    run_job(wal, lake, partitions=8, start_ts=int(BASE_TS_US), end_ts=mid)
    run_job(wal, lake, partitions=8, start_ts=mid, end_ts=end)
    lk = lake_table(lake)
    return pa.table(
        {
            "conv_id": lk["conv_id"],
            "turn_idx": lk["turn_idx"],
            "role": lk["role"],
            "text": lk["text"],
            "seq": lk["seq"],
        }
    )
