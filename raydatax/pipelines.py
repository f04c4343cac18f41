"""Named pipelines over the driver-provided testdata tables + their ANSI-SQL
oracles (DuckDB).  This is the external correctness gate: every pipeline is
implemented Ray-Data-first here and mirrored in :data:`ORACLE_SQL`; the
harness runs both and compares row counts, schema, and value hashes.

Column-name parity rule: every computed/aggregate column is named
identically in the Ray code and the SQL.  Float discipline: ratios are
exact-operand divisions (bit-identical in both engines); order-dependent
float SUMs are rounded (2 decimals for money, 4 for means).

None of these call ``ray.init`` — the harness owns the session.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .ann import brute_force_topk, ivf_topk
from .dedup import minhash_dedup, simhash_pairs
from .relational import (
    broadcast_join,
    lww_latest,
    preagg_groupby,
    sessionize,
    topk,
    tumbling_window,
)
from .text import LangId, fingerprint_md5, token_count
from .transforms import dx_filter, dx_url


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _round(batch: pa.Table, cols: dict[str, int]) -> pa.Table:
    """Half-up rounding via explicit scale-floor: floor(x*10^nd + 0.5)/10^nd.
    The SQL oracles use the literally identical formula, so both engines
    perform the same IEEE ops on the same doubles — bit-identical results
    (arrow's pc.round and DuckDB's round() disagree near midpoints)."""
    for name, nd in cols.items():
        i = batch.schema.get_field_index(name)
        s = float(10 ** nd)
        r = pc.divide(pc.floor(pc.add(pc.multiply(batch[name], s), 0.5)), s)
        batch = batch.set_column(i, name, r)
    return batch


def _cents(col) -> pa.Array:
    """Exact integer cents: floor(x*100 + 0.5) as int64 — same scale-floor
    convention as :func:`_round`; the SQL side is the literally identical
    `CAST(floor(value * 100 + 0.5) AS BIGINT)` (integer sums are
    accumulation-order-exact where float sums are not)."""
    return pc.cast(pc.floor(pc.add(pc.multiply(col, 100.0), 0.5)), pa.int64())


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


def _derived_cdc_wal_table(sf_dir: str) -> pa.Table:
    """The flagship's deterministic transcript CDC stream, derived from the
    driver's `events` table so replay is SQL-recomputable: seq = event_id,
    op from event_id % 10, key = (conv-<user>, event_id % 37); D rows carry
    a null payload (tombstones)."""
    import pyarrow.parquet as pq

    from .schema import EVENT_SCHEMA

    e = pq.read_table(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts"]
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
        e["event_type"], pc.cast(e["event_id"], pa.string()), " v"
    )
    tool_idx = np.where(eid % 5 < 2, eid % 5, 2).astype(np.int8)
    tool = pa.array(["search", "python", None], pa.string()).take(pa.array(tool_idx))
    ts = e["ts"].cast(pa.timestamp("us"))

    is_del = pa.array(opk == 2)

    def _mask(arr):
        a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        return pc.if_else(is_del, pa.scalar(None, a.type), a)

    return pa.Table.from_arrays(
        [
            pa.array(eid, pa.int64()),
            op,
            conv.combine_chunks() if isinstance(conv, pa.ChunkedArray) else conv,
            pa.array(turn, pa.int32()),
            _mask(role),
            _mask(text),
            _mask(tool),
            _mask(ts),
        ],
        schema=EVENT_SCHEMA,
    )


def _neighbor_pairs(sf_dir: str) -> list[tuple[int, int]]:
    """The deterministic candidate-pair list shared by the three verify
    queries (ngram_jaccard / ngram_containment_docs / edit_distance_docs)
    AND re-encoded in their SQL twins: (i, i+1) for every doc_id i with
    i %% 25 == 0 whose successor exists.  Change it in lockstep with the
    oracles' ``pairs`` CTE or the three silently diverge."""
    import pyarrow.parquet as pq

    ids = set(pq.read_table(_p(sf_dir, "documents"), columns=["doc_id"])["doc_id"].to_pylist())
    return [(i, i + 1) for i in sorted(ids) if i % 25 == 0 and i + 1 in ids]


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


# ---------------------------------------------------------------- relational


def q1_pricing_summary(sf_dir: str):
    ds = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(np.datetime64("1998-09-01", "us"))))
        disc_price = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("disc_price", disc_price)

    out = preagg_groupby(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        [
            ("l_quantity", "sum", "sum_qty"),
            ("l_extendedprice", "sum", "sum_base_price"),
            ("disc_price", "sum", "sum_disc_price"),
            ("l_quantity", "count", "count_order"),
        ],
        mean_of=[("sum_qty", "count_order", "avg_qty")],
    )
    return out.map_batches(
        lambda t: _round(t, {"sum_qty": 2, "sum_base_price": 2, "sum_disc_price": 2, "avg_qty": 4}),
        batch_format="pyarrow",
    )


def top_orders(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "orders"),
                         columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return topk(ds, [("o_totalprice", "descending"), ("o_orderkey", "ascending")], 10)


def customers_per_region(sf_dir: str):
    import pyarrow.parquet as pq

    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey", "c_acctbal"])
    nation = pq.read_table(_p(sf_dir, "nation")).rename_columns(["c_nationkey", "n_name", "r_regionkey"])
    region = pq.read_table(_p(sf_dir, "region")).rename_columns(["r_regionkey", "r_name"])
    joined = broadcast_join(cust, nation, "c_nationkey")
    joined = broadcast_join(joined, region, "r_regionkey")
    out = preagg_groupby(
        joined, ["r_name"],
        [("c_custkey", "count", "n_customers"), ("c_acctbal", "sum", "sum_acctbal")],
        mean_of=[("sum_acctbal", "n_customers", "avg_acctbal")],
    )
    return out.map_batches(
        lambda t: _round(t, {"sum_acctbal": 2, "avg_acctbal": 4}), batch_format="pyarrow"
    )


def projection_filter_revenue(sf_dir: str):
    """Reader-style projection + predicate pushdown + computed column (the
    DataX reader `column`/`where` surface)."""
    ds = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
                 "l_discount", "l_returnflag"],
        filter=(pc.field("l_quantity") > 45) & (pc.field("l_returnflag") == "R"),
    )

    def proj(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "l_linenumber": t["l_linenumber"],
                         "l_quantity": t["l_quantity"], "revenue": rev})

    return ds.map_batches(proj, batch_format="pyarrow")


def semi_join_fulfilled(sf_dir: str):
    """Semi join where the build side (orders) is read DISTRIBUTED with the
    status predicate pushed to the parquet read; the key set is broadcast
    only because it is metadata-counted under threshold (see semi_join)."""
    from .relational import semi_join

    fulfilled = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey"],
        filter=pc.field("o_orderstatus") == "F",
    )
    li = rd.read_parquet(_p(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_returnflag", "l_quantity"])
    filtered = semi_join(li, fulfilled, "l_orderkey", "o_orderkey")
    out = preagg_groupby(
        filtered, ["l_returnflag"],
        [("l_quantity", "count", "n_items"), ("l_quantity", "sum", "sum_qty")],
    )
    return out.map_batches(lambda t: _round(t, {"sum_qty": 2}), batch_format="pyarrow")


def events_partitioned_roundtrip(sf_dir: str):
    """odps/hive partitioned-table parity: write events hive-partitioned by
    event_type (one key=value directory per partition — the resumable
    output layout), read back ONLY the 'click' partition with
    directory-level pruning, and aggregate per day."""
    import shutil

    from .sinks import read_partitioned, write_partitioned

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = f"/tmp/raydatax_part_{tag}"
    shutil.rmtree(out, ignore_errors=True)
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "ts", "value"])
    write_partitioned(ds, out, ["event_type"])

    clicks = read_partitioned(out, filters={"event_type": "click"},
                              columns=["ts", "value"])

    def add_day(t: pa.Table) -> pa.Table:
        return pa.table({"day": pc.strftime(t["ts"], format="%Y-%m-%d"),
                         "value": t["value"]})

    agg = preagg_groupby(
        clicks.map_batches(add_day, batch_format="pyarrow"),
        ["day"], [("value", "count", "n_events"), ("value", "sum", "sum_value")],
    )
    return agg.map_batches(lambda t: _round(t, {"sum_value": 2}), batch_format="pyarrow")


def customers_without_orders(sf_dir: str):
    """Anti join with a large build side: customers with NO fulfilled
    order.  The distinct order-customer key set is built distributed (with
    the status predicate pushed to the read) and the broadcast-vs-hash
    decision comes from a metadata count (relational.semi_join, anti=True)."""
    from .relational import semi_join

    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    ords = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey"],
        filter=pc.field("o_orderstatus") == "F",
    )
    return semi_join(cust, ords, "c_custkey", "o_custkey", anti=True)


def customer_order_counts(sf_dir: str):
    """LEFT OUTER join kept to the end: every customer with their
    fulfilled-order count, customers with none kept at 0 —
    relational.hash_join(join_type="left_outer") then a null-skipping
    grouped count (count(o_orderkey) ignores the unmatched rows' nulls,
    exactly the SQL rule)."""
    from .relational import hash_join, preagg_groupby

    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey"])
    ords = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey", "o_orderkey"],
        filter=pc.field("o_orderstatus") == "F",
    ).map_batches(
        lambda t: t.rename_columns(["c_custkey", "o_orderkey"]),
        batch_format="pyarrow",
    )
    joined = hash_join(cust, ords, on="c_custkey", join_type="left_outer")
    return preagg_groupby(joined, ["c_custkey"], [("o_orderkey", "count", "n_orders")])


def sql_split_read(sf_dir: str):
    """JDBC-family source parity: splitPk range-sliced parallel read out of
    a DuckDB database file (built once from the orders table), with
    projection and predicate pushed into every slice's SQL — the
    mysql/pg/oracle reader surface over an engine the sandbox can host."""
    from .sql_source import export_parquet_to_duckdb, read_sql_table

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    db = f"/tmp/raydatax_orders_{tag}.duckdb"
    export_parquet_to_duckdb(_p(sf_dir, "orders"), db, "orders")
    return read_sql_table(
        db, "orders", split_pk="o_orderkey", num_splits=6,
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
        where="o_totalprice > 150000",
    )


def sql_token_read(sf_dir: str):
    """Cassandra/kudu-family source parity: token-range sliced parallel
    read — contiguous ranges of the uint64 hash(pk) ring, cut WITHOUT any
    driver-side min/max planning query, over a STRING key (the case splitPk
    range slicing cannot handle).  Each row lands in exactly one slice; the
    union must hash-match a plain scan."""
    from .sql_source import export_parquet_to_duckdb, read_sql_table

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    db = f"/tmp/raydatax_customer_{tag}.duckdb"
    export_parquet_to_duckdb(_p(sf_dir, "customer"), db, "customer")
    return read_sql_table(
        db, "customer", split_pk="c_name", num_splits=8, split_mode="token",
        columns=["c_custkey", "c_name", "c_mktsegment", "c_acctbal"],
        where="c_acctbal > 1000",
    )


def sql_sample_read(sf_dir: str):
    """Oracle-reader SAMPLE split parity: slice boundaries from a seeded
    sample's quantiles (balances skew, works on the string key), union of
    slices must hash-match a plain filtered scan."""
    from .sql_source import export_parquet_to_duckdb, read_sql_table

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    db = f"/tmp/raydatax_customer_{tag}.duckdb"
    export_parquet_to_duckdb(_p(sf_dir, "customer"), db, "customer")
    return read_sql_table(
        db, "customer", split_pk="c_name", num_splits=5, split_mode="sample",
        columns=["c_custkey", "c_name", "c_acctbal"],
        where="c_acctbal < 9000",
    )


def sql_writer_roundtrip(sf_dir: str):
    """JDBC-family WRITER parity (CommonRdbmsWriter writeMode + adswriter
    load-then-swap): documents --replace--> DuckDB table with a unique key,
    a derived delta --upsert--> ON CONFLICT DO UPDATE (the mysql ON
    DUPLICATE KEY semantic), final state read back through the
    splitPk-sliced reader.  The oracle recomputes the post-upsert rows
    directly from the source table."""
    import tempfile

    from .sql_source import read_sql_table, write_sql_table

    db = os.path.join(tempfile.mkdtemp(prefix="raydatax_sqlsink_"), "docs.duckdb")
    docs = rd.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "lang", "source", "n_chars"]
    )
    write_sql_table(docs, db, "docs", write_mode="replace", unique_keys=["doc_id"])

    def bump(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(ids % 10 == 0))
        return sub.set_column(
            sub.schema.get_field_index("n_chars"), "n_chars",
            pc.add(sub["n_chars"], pa.scalar(1000, pa.int64())),
        )

    delta = docs.map_batches(bump, batch_format="pyarrow")
    write_sql_table(delta, db, "docs", write_mode="upsert", conflict_keys=["doc_id"])
    return read_sql_table(db, "docs", split_pk="doc_id", num_splits=6)


def distinct_event_types(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pa.table({"event_type": pa.array(vals, pa.string())})


# ------------------------------------------------------------- transformers


def transform_chain(sf_dir: str):
    """Full transformer surface under one oracle: dx_substr / dx_pad /
    dx_replace / dx_filter plus a REGISTERED external transformer, composed
    through the chain() registry path (TransformerRegistry +
    TransformerExchanger parity)."""
    from .transforms import REGISTRY, chain, register

    ds = rd.read_parquet(_p(sf_dir, "customer"),
                         columns=["c_custkey", "c_name", "c_mktsegment", "c_acctbal"])

    if "upper_col" not in REGISTRY:  # external (non-dx_) transformer hook
        def upper_col(batch: pa.Table, column: str) -> pa.Table:
            i = batch.schema.get_field_index(column)
            return batch.set_column(i, column, pc.utf8_upper(batch[column]))

        register("upper_col", upper_col)

    fn = chain([
        ("dx_substr", "name8", 0, 8),
        ("dx_pad", "seg_pad", "l", 12, "*"),
        ("dx_replace", "seg_repl", 2, 3, "XX"),
        ("upper_col", "name8"),
        ("dx_filter", "c_acctbal", ">", 5000),
    ])

    def apply(t: pa.Table) -> pa.Table:
        t = t.append_column("name8", t["c_name"])
        t = t.append_column("seg_pad", t["c_mktsegment"])
        t = t.append_column("seg_repl", t["c_mktsegment"])
        return fn(t).select(["c_custkey", "name8", "seg_pad", "seg_repl", "c_acctbal"])

    return ds.map_batches(apply, batch_format="pyarrow")


def url_extract(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "part"), columns=["p_partkey", "p_brand", "p_size"])

    def apply(t: pa.Table) -> pa.Table:
        brand = pc.replace_substring(t["p_brand"], "#", "-")
        url = pc.binary_join_element_wise(
            "https://parts.example.com/", brand, "/",
            pc.cast(t["p_partkey"], pa.string()),
            "?size=", pc.cast(t["p_size"], pa.string()), "",
        )
        t = t.append_column("url", url)
        t = dx_url(t, "url", parts=("host", "path"), param="size")
        return t.select(["p_partkey", "url_host", "url_path", "url_size"])

    return ds.map_batches(apply, batch_format="pyarrow")


def filter_like(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "part"), columns=["p_partkey", "p_type", "p_brand"])
    return ds.map_batches(
        lambda t: dx_filter(t, "p_type", "like", ".*ECO.*"), batch_format="pyarrow"
    )


def cast_roundtrip(sf_dir: str):
    """ColumnCast parity (string↔date↔long total conversion matrix,
    /root/reference/common/.../element/ColumnCast.java:17-43)."""
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "ts", "value"])

    def apply(t: pa.Table) -> pa.Table:
        # arrow %S always appends the fractional part for sub-second types →
        # format then slice to seconds precision (matches DuckDB strftime)
        full = pc.strftime(t["ts"], format="%Y-%m-%d %H:%M:%S")
        return pa.table(
            {
                "event_id": t["event_id"],
                "ts_str": pc.utf8_slice_codeunits(full, 0, 19),
                "day": pc.strftime(t["ts"], format="%Y-%m-%d"),
                "value_cents": _cents(t["value"]),
            }
        )

    return ds.map_batches(apply, batch_format="pyarrow")


# ------------------------------------------------------------ text / dedup


def token_stats(sf_dir: str):
    """Whitespace + BPE-ish pre-tokenizer token counts (text.token_count /
    text.bpe_token_count) and character length, all vectorized."""
    from .text import bpe_token_count

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def apply(t: pa.Table) -> pa.Table:
        t = token_count(t)
        t = bpe_token_count(t)
        t = t.append_column("n_chars_calc", pc.cast(pc.utf8_length(t["text"]), pa.int64()))
        return t.select(["doc_id", "n_chars_calc", "n_tokens", "n_bpe_tokens"])

    return ds.map_batches(apply, batch_format="pyarrow")


def quality_ratios(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def apply(t: pa.Table) -> pa.Table:
        n = pc.max_element_wise(pc.cast(pc.utf8_length(t["text"]), pa.float64()), 1.0)
        punct = pc.cast(pc.count_substring_regex(t["text"], r"[.,;:!?]"), pa.float64())
        digit = pc.cast(pc.count_substring_regex(t["text"], r"[0-9]"), pa.float64())
        return pa.table({"doc_id": t["doc_id"],
                         "punct_ratio": pc.divide(punct, n),
                         "digit_ratio": pc.divide(digit, n)})

    return ds.map_batches(apply, batch_format="pyarrow")


def fingerprint(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: fingerprint_md5(t).select(["doc_id", "fp_md5"]), batch_format="pyarrow"
    )


def dedup_exact_prefix(sf_dir: str):
    """Exact dedup keyed on a normalized prefix (lower, first 20 chars) —
    groups exist even in a corpus without full-text duplicates."""
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def key(t: pa.Table) -> pa.Table:
        k = pc.utf8_slice_codeunits(pc.utf8_lower(t["text"]), 0, 20)
        return pa.table({"doc_id": t["doc_id"], "k": k})

    keyed = ds.map_batches(key, batch_format="pyarrow")
    out = preagg_groupby(
        keyed, ["k"], [("doc_id", "min", "doc_id"), ("doc_id", "count", "n_copies")]
    )
    return out.select_columns(["doc_id", "n_copies"])


def dedup_span_exact(sf_dir: str):
    """Exact substring (duplicated-span) dedup — Lee et al. 2022 sequence-
    level dedup over word 8-grams (dedup.duplicated_span_removal): every
    8-token span occurring >=2 times across >=2 documents is stripped from
    ALL documents; returns per doc (n_tokens, n_removed, text_clean).  The
    hot-gram discovery is one (gram, doc) preagg shuffle; the rewrite is
    batch-local with the hot set broadcast (adaptive — see the operator)."""
    from .dedup import duplicated_span_removal

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return duplicated_span_removal(ds, n=8, min_count=2, min_docs=2)


def sft_context_assembly(sf_dir: str):
    """SFT training-example assembly over transcripts
    (relational.prefix_concat_examples): the flagship's derived CDC stream
    is LWW-replayed to the live conversation table, then every assistant
    turn becomes one example — ``context`` = the preceding live turns
    rendered as "role: text" lines, budget-truncated to the most recent
    200 characters (the recency window an SFT packer applies), ``target``
    = the turn's own text.  One hash shuffle on conv_id; assembly is a
    vectorized segment scan (searchsorted budget cut) per partition."""
    from .relational import lww_latest, prefix_concat_examples

    wal = _derived_cdc_wal_table(sf_dir)
    live = lww_latest(
        rd.from_arrow(wal), ["conv_id", "turn_idx"], "seq", op_col="op"
    )

    def prep(t: pa.Table) -> pa.Table:
        line = pc.binary_join_element_wise(t["role"], t["text"], ": ")
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "line": line,
                "is_tgt": pc.equal(t["role"], "assistant"),
                "target": t["text"],
            }
        )

    ex = prefix_concat_examples(
        live.map_batches(prep, batch_format="pyarrow"),
        keys=["conv_id"], order_col="turn_idx", line_col="line",
        target_col="is_tgt", sep="\n", budget=200,
    )
    return ex.select_columns(
        ["conv_id", "turn_idx", "context", "target", "n_context"]
    )


def bloom_skip_scan(sf_dir: str):
    """File-level bloom data skipping (skipping.build_bloom_index /
    read_files_eq): documents range-clustered by lang (one sort — the
    "cluster then index" layout step), a per-file bloom index built on the
    lang column, then an equality scan for 'fr' that opens only files
    whose bloom admits the value (exact pyarrow filter removes bloom false
    positives, so the result is identical to the full scan).  The pruning
    behavior itself is pinned in tests/test_skipping.py; this row
    certifies exactness end-to-end."""
    import tempfile

    from .skipping import build_bloom_index, read_files_eq

    data_dir = tempfile.mkdtemp(prefix="raydatax_bloomdata_")
    idx_dir = tempfile.mkdtemp(prefix="raydatax_bloomidx_")
    docs = rd.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "lang", "source", "n_chars"]
    )
    docs.repartition(6).sort("lang").write_parquet(data_dir)
    build_bloom_index(data_dir, "lang", idx_dir)
    hits = read_files_eq(data_dir, "lang", "fr", idx_dir)
    return preagg_groupby(
        hits, ["source"],
        [("doc_id", "count", "n_docs"), ("n_chars", "sum", "total_chars")],
    )


def lang_id(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    out = ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))
    return out.select_columns(["doc_id", "lang_pred"])


def text_normalize(sf_dir: str):
    """Canonical corpus normalization (text.normalize_text): NFC + lower +
    whitespace collapse + trim, all RE2/Arrow kernels with an exact DuckDB
    twin — the preprocessing step that makes exact dedup comparable."""
    from .text import normalize_text

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def apply(t: pa.Table) -> pa.Table:
        t = normalize_text(t)
        return pa.table({"doc_id": t["doc_id"], "norm": t["norm"],
                         "n_chars_norm": pc.cast(pc.utf8_length(t["norm"]), pa.int64())})

    return ds.map_batches(apply, batch_format="pyarrow")


def pii_redact(sf_dir: str):
    """PII scrubbing (text.RedactPii actor stage).  The corpus has no PII,
    so each doc is deterministically augmented with an email / IPv4 / phone
    derived from doc_id — the SQL oracle builds the identical string and
    applies the identical RE2 rules in the identical order, so redacted
    output is byte-identical.  Redaction order is part of the contract."""
    from .text import RedactPii

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def augment(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks()
        idn = ids.to_numpy(zero_copy_only=False)
        aug = pc.binary_join_element_wise(
            t["text"], " reach user", pc.cast(ids, pa.string()),
            "@example.com or 10.2.", pc.cast(pa.array(idn % 250), pa.string()),
            ".99 call +1-555-",
            pc.utf8_lpad(pc.cast(pa.array(idn % 10000), pa.string()), 4, "0"),
            "",
        )
        return pa.table({"doc_id": t["doc_id"], "text": aug})

    out = ds.map_batches(augment, batch_format="pyarrow").map_batches(
        RedactPii, batch_format="pyarrow", concurrency=(1, 4)
    )
    return out.select_columns(["doc_id", "redacted"])


def token_positions(sf_dir: str):
    """Ordinal explode (text.explode_tokens): every document flattened to
    (doc_id, pos, tok) with 1-based in-document positions — the exact
    multiset of SQL's zipped unnest(string_split) + unnest(range)."""
    from .text import explode_tokens

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(lambda t: explode_tokens(t), batch_format="pyarrow")


def doc_repetition(sf_dir: str):
    """Gopher-style repetition quality signals (text.repetition_stats):
    two-level pre-aggregated groupby; ratios are exact-integer divisions."""
    from .text import repetition_stats

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return repetition_stats(ds)


def decontaminate_3gram(sf_dir: str):
    """Benchmark decontamination (text.ngram_contamination): benchmark =
    docs with doc_id % 13 == 0, training = the rest; a training doc is
    contaminated iff it shares a word 3-gram with any benchmark doc.
    Adaptive semi join on the n-gram — neither corpus hits the driver."""
    from .text import ngram_contamination

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def side(bench: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            mask = (ids % 13 == 0) if bench else (ids % 13 != 0)
            return t.filter(pa.array(mask))
        return f

    train = ds.map_batches(side(False), batch_format="pyarrow")
    bench = ds.map_batches(side(True), batch_format="pyarrow")
    return ngram_contamination(train, bench, n=3)


def docs_lm_perplexity(sf_dir: str):
    """CCNet-style LM quality scoring (text.fit_unigram_counts +
    text.lm_perplexity): fit an add-one-smoothed unigram LM on the trusted
    slice (lang = 'en'), score EVERY document's integer-exact micro
    log-prob sum, token count and OOV count under it.  Per-token log-probs
    snap to int64 micros before summation, so totals are associative and
    hash cross-engine; the vocabulary broadcasts (object store, once) at
    this scale and hash-joins above the metadata-counted limit."""
    from .text import fit_unigram_counts, lm_perplexity

    ds = rd.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "text", "lang"]
    )
    ref = ds.map_batches(
        lambda t: t.filter(pc.equal(t["lang"], "en")).select(["doc_id", "text"]),
        batch_format="pyarrow",
    )
    vocab = fit_unigram_counts(ref)
    return lm_perplexity(ds.select_columns(["doc_id", "text"]), vocab)


def inverted_index_terms(sf_dir: str):
    """Posting-list build (text.build_inverted_index): term → document
    frequency + ascending comma-joined doc-id postings, distributed
    (DISTINCT (term, doc) partials → one grouped ordered concat).  The
    build side of the search engines the reference only writes INTO
    (elasticsearchwriter/solrwriter); min_df=20 bounds the result to the
    index's head."""
    from .text import build_inverted_index

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return build_inverted_index(ds, min_df=20)


def index_and_search(sf_dir: str):
    """Boolean AND retrieval through the inverted index
    (text.index_and_query): build the full index, then intersect the
    posting lists of ['query', 'window', 'merge'] — work ∝ those terms'
    postings, never the corpus."""
    from .text import build_inverted_index, index_and_query

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    idx = build_inverted_index(ds)
    return index_and_query(idx, ["query", "window", "merge"])


def incremental_lm_perplexity(sf_dir: str):
    """Incremental LM fitting (text.unigram_index_add / read_unigram_index):
    the prior crawl (doc_id %% 3 == 0) and the new crawl land as two
    bucketed index epochs — each fit tokenizes ONLY its own crawl — then
    every document scores against the merged counts, which must equal a
    one-shot fit over the union (the SQL twin).  Same crash-atomic
    epoch/compaction discipline as the persistent dedup indexes."""
    import shutil

    from .text import lm_perplexity, read_unigram_index, unigram_index_add

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    idx = f"/tmp/raydatax_lmidx_{tag}"
    shutil.rmtree(idx, ignore_errors=True)
    unigram_index_add(idx, _crawl_split(ds, "doc_id", prior=True))
    unigram_index_add(idx, _crawl_split(ds, "doc_id", prior=False))
    vocab = read_unigram_index(idx)
    return lm_perplexity(ds, vocab)


def sequence_packing(sf_dir: str):
    """Greedy sequential packing (relational.pack_sequences over the
    distributed prefix sum): documents laid end-to-end in doc_id order,
    chunked every 4096 chars; per-sequence doc counts and sizes.  The SQL
    twin is a window cumsum — which DuckDB runs in one partition, and the
    engine runs as sort + O(blocks) driver ints."""
    from .relational import pack_sequences

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "n_chars"])
    packed = pack_sequences(ds, budget=4096, order_key="doc_id", size_col="n_chars")
    return preagg_groupby(
        packed, ["seq_id"],
        [("doc_id", "count", "n_docs"), ("n_chars", "sum", "total_chars")],
    )


def jsonl_doc_roundtrip(sf_dir: str):
    """Document-store family end-to-end (mongodbwriter → mongodbreader over
    an export dump): documents → ``sinks.write_jsonl`` assembling DEPTH-2
    nested sub-documents ("meta.src.source") → ``read_jsonl`` with
    dotted-path extraction → grouped counts.  The oracle recomputes the
    same aggregate from the source table, so a green row certifies the
    nested write + extraction round trip in both directions."""
    import tempfile

    from .sinks import write_jsonl
    from .sources import read_jsonl

    # unique per call: a shared fixed path would race between concurrent
    # gate/bench runs (one rmtree-ing what the other reads); scratch lives
    # under /tmp and is bounded by the sf documents size
    out_dir = tempfile.mkdtemp(prefix="raydatax_jsonl_")
    docs = rd.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "lang", "source", "n_chars"]
    )
    write_jsonl(
        docs, out_dir,
        doc_paths=[("doc_id", "doc_id"), ("meta.lang", "lang"),
                   ("meta.src.source", "source"), ("n_chars", "n_chars")],
    )
    ds = read_jsonl(
        out_dir,
        doc_paths=[("meta.lang", "lang"), ("meta.src.source", "source"),
                   ("n_chars", "n_chars")],
    )
    return preagg_groupby(
        ds, ["lang", "source"],
        [("n_chars", "count", "n_docs"), ("n_chars", "sum", "sum_chars")],
    )


def key_range_scan(sf_dir: str):
    """hbase11xreader surface end-to-end: events staged as a KV table
    SORTED by rowkey (user_id, version = event_id) so parquet row groups
    are the region analogue, then a rowkey-range scan [2, 12) in
    ``normal`` mode — latest version per rowkey — via footer-stat
    row-group pruning.  The range is non-empty at EVERY sf (user ids
    start at 0; sf0.001 tops out near 14), so the gate works at any
    scale.  Oracle: row_number() latest within the range."""
    import tempfile

    from .sources import read_key_range

    staged = tempfile.mkdtemp(prefix="raydatax_kv_")
    ds = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["event_id", "user_id", "event_type", "value"],
    )
    # distributed range partition + sort (Ray Data sort), small row groups
    # so the range scan has several "regions" to prune
    ds.sort("user_id").write_parquet(staged, row_group_size=4096)

    out = read_key_range(
        staged, "user_id", start=2, stop=12,
        mode="normal", version_col="event_id",
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "last_event_id": t["event_id"],
            "event_type": t["event_type"],
            "value": t["value"],
        })

    return out.map_batches(proj, batch_format="pyarrow")


def key_skip_scan(sf_dir: str):
    """Phoenix-over-HBase SKIP SCAN analogue: one scan serving several
    disjoint rowkey ranges (a Phoenix ``WHERE pk IN (...)``/OR'd-ranges
    query compiles to a skip scan, not N scans).  Row groups are pruned
    against the range UNION and each is opened at most once even when
    several ranges hit it (``sources.read_key_ranges``); latest version
    per rowkey (``normal`` mode).  Oracle: OR of the ranges + latest by
    row_number().  The middle range is empty at sf0.001 (user ids top
    near 14) — the scan must handle empty member ranges."""
    import tempfile

    from .sources import read_key_ranges

    staged = tempfile.mkdtemp(prefix="raydatax_kv_skip_")
    ds = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["event_id", "user_id", "event_type", "value"],
    )
    ds.sort("user_id").write_parquet(staged, row_group_size=4096)

    out = read_key_ranges(
        staged, "user_id", [(2, 5), (20, 23), (9, 12)],
        mode="normal", version_col="event_id",
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "last_event_id": t["event_id"],
            "event_type": t["event_type"],
            "value": t["value"],
        })

    return out.map_batches(proj, batch_format="pyarrow")


def tsdb_window_read(sf_dir: str):
    """tsdbreader split-model parity: the query [Jan 2 .. Jan 5) over two
    metrics runs as one read task per 6-hour interval (row groups pruned
    by ts footer stats, metric predicate pushed into each task); the union
    of interval slices must hash-match a plain filtered scan."""
    from .sources import read_tsdb

    return read_tsdb(
        _p(sf_dir, "events"), "ts",
        start="2024-01-02 00:00:00", end="2024-01-05 00:00:00",
        interval_s=6 * 3600,
        metric_col="event_type", metrics=["click", "view"],
        columns=["event_id", "event_type", "ts", "value"],
    )


def search_topk_scroll(sf_dir: str):
    """Search-reader family (elasticsearchreader match query + scroll,
    solrreader paged query): TF-score documents on two terms, page through
    the result with search_after cursors (2 pages × 10), which must equal
    the global top-20 by (score DESC, doc_id ASC) — certifying both the
    scoring and the cursor pagination against one SQL oracle."""
    from .text import search_scroll

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    terms = ["merge", "window"]
    pages, cursor = [], None
    for _ in range(2):
        page, cursor = search_scroll(ds, terms, 10, cursor=cursor)
        if page.num_rows:
            pages.append(page)
        if cursor is None:
            break
    return pa.concat_tables(pages)


def dedup_minhash(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return minhash_dedup(ds, threshold=0.6)


def ngram_jaccard(sf_dir: str):
    """Exact char-5-gram Jaccard over a deterministic candidate-pair list
    (every 25th doc vs its successor) — the verification stage of the
    near-dup pipeline, SQL-oracled: hashed-shingle distinct counts equal
    raw-substring distinct counts (64-bit collisions are negligible), and
    |∩|/|∪| is an integer division both engines perform identically."""
    from .dedup import ngram_jaccard_verify

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return ngram_jaccard_verify(ds, _neighbor_pairs(sf_dir), k=5)


def ngram_containment_docs(sf_dir: str):
    """Asymmetric near-dup: exact char-5-gram CONTAINMENT per direction
    (dedup.ngram_containment_verify) over the same deterministic pair list
    as ngram_jaccard — catches quotes / partial inclusion that Jaccard
    misses when the two docs differ in size.  Integer-over-integer
    divisions, cross-engine exact."""
    from .dedup import ngram_containment_verify

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return ngram_containment_verify(ds, _neighbor_pairs(sf_dir), k=5)


def edit_distance_docs(sf_dir: str):
    """Character-level verify stage (dedup.edit_distance_verify): exact
    Levenshtein distance over the same deterministic candidate-pair list
    as ngram_jaccard — the small-edit near-dup metric (templates, OCR
    noise) the set-based measures blur.  Banded two-row numpy DP per
    pair; collection bounded by the pair list."""
    from .dedup import edit_distance_verify

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return edit_distance_verify(ds, _neighbor_pairs(sf_dir))


def docs_cms_counts(sf_dir: str):
    """Count-min sketch frequency estimates (relational.cms_estimate,
    width 1024 × depth 2) for four probe terms over the tokenized corpus —
    bounded-memory counting whose deterministic hash chain lets SQL build
    the identical sketch, so even the collision noise matches exactly
    (estimates are ≥ the true count by construction)."""
    from .relational import cms_estimate
    from .text import tokenize_batch

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    terms = ds.map_batches(lambda t: tokenize_batch(t), batch_format="pyarrow")
    return cms_estimate(terms, "term", ["query", "window", "merge", "xyzzy"])


def docs_pmi_collocations(sf_dir: str):
    """Collocation extraction (text.pmi_collocations): top-20 token pairs
    by PMI over a ±3 windowed co-occurrence grid — pair volume bounded by
    tokens·window, counts pre-aggregated, the PMI expression one fixed
    IEEE computation over exact integers, micro-snapped."""
    from .text import pmi_collocations

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return pmi_collocations(ds, window=3, min_count=5, k=20)


def docs_bm25_topk(sf_dir: str):
    """Okapi BM25 top-15 (text.bm25_topk) for ['query','window','merge']:
    tf restricted to the query terms, df tiny, per-(doc,term)
    contributions micro-snapped before the per-doc sum so scores hash
    cross-engine; SQL computes the identical expression."""
    from .text import bm25_topk

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return bm25_topk(ds, ["query", "window", "merge"], k=15)


def docs_phrase_search(sf_dir: str):
    """match_phrase through the positional index (text.phrase_search):
    docs where 'order' is immediately followed by 'fast' — n−1 (doc,
    pos) hash joins over only the phrase terms' postings; SQL twin is
    the token_positions self-join."""
    from .text import phrase_search

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return phrase_search(ds, ["order", "fast"])


def dedup_minhash_verified(sf_dir: str):
    """The full MinHash LSH path under the exact-SQL gate: LSH candidate
    pairs (shingle → minhash → banded buckets) exact-verified with char-5-gram
    Jaccard and filtered at the same threshold.  The oracle computes ALL-pairs
    exact Jaccard ≥ 0.6 in DuckDB, so a green row certifies both precision
    (no false pair survives the verify) and — at this corpus scale — recall
    (LSH missed no true pair).  At 100-TB scale only the engine side runs;
    recall becomes the documented 1-(1-t^r)^b LSH bound."""
    from .dedup import minhash_candidate_pairs, ngram_jaccard_verify

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    cand = minhash_candidate_pairs(ds, threshold=0.6)
    ver = ngram_jaccard_verify(ds, cand.select_columns(["a", "b"]), k=5)
    kept = ver.map_batches(
        lambda t: t.filter(pc.greater_equal(t["jaccard"], 0.6)),
        batch_format="pyarrow",
    )
    return kept.sort(["a", "b"])


def dedup_keep_best(sf_dir: str):
    """Production dedup canonicalization (dedup.keep_best_dedup): cluster
    the exact-verified near-dup pairs (the dedup_minhash_verified
    relation) into connected components via the engine's adaptive path
    and keep the BEST document per cluster — longest text, ties to the
    smallest id — picked with distributed grouped_topk n=1 over the
    corpus-joined quality column (no driver metadata read, no per-node
    loop).  Emits one row per clustered document: (doc_id, canonical_id,
    keep).  The oracle recomputes components with a recursive CTE over
    the ALL-pairs exact-Jaccard relation and the same argmax."""
    from .dedup import keep_best_dedup, minhash_candidate_pairs, ngram_jaccard_verify

    ds = rd.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "text", "n_chars"]
    )
    cand = minhash_candidate_pairs(ds, threshold=0.6)
    ver = ngram_jaccard_verify(ds, cand.select_columns(["a", "b"]), k=5)
    kept = ver.map_batches(
        lambda t: t.filter(pc.greater_equal(t["jaccard"], 0.6)),
        batch_format="pyarrow",
    )
    return keep_best_dedup(ds, kept, quality_col="n_chars")


def similarity_join_docs(sf_dir: str):
    """Cross-table set-similarity join (dedup.similarity_join): documents
    split by doc_id parity into two "tables", joined on char-5-gram
    Jaccard ≥ 0.5 via shared-seed MinHash LSH blocking + exact shingle
    verification — the entity-resolution / fuzzy-join operator.  The
    oracle computes ALL cross-side pairs in SQL, so a green row certifies
    precision AND (at this scale) the LSH blocking's recall."""
    from .dedup import similarity_join

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def side(even: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            mask = (ids % 2 == 0) if even else (ids % 2 == 1)
            return t.filter(pa.array(mask))
        return f

    left = ds.map_batches(side(True), batch_format="pyarrow")
    right = ds.map_batches(side(False), batch_format="pyarrow")
    return similarity_join(left, right, threshold=0.5)


def dedup_simhash(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return simhash_pairs(ds, max_hamming=3)


def dedup_simhash_verified(sf_dir: str):
    """The SimHash near-dup path under the exact-SQL gate: 64-bit SimHash
    (word-token polynomial hash + splitmix-style mix, per-bit signed sums)
    banded into four 16-bit slices — any pair within Hamming ≤ 3 shares a
    slice by pigeonhole, so banding + Hamming verify is EXACT here, not
    probabilistic.  The oracle recomputes the identical signature in pure
    SQL (HUGEINT mod-2^64 polynomial, 32-bit-split multiply, xor via
    two's-complement BIGINT) and takes ALL-pairs bit_count(xor) ≤ 3: a
    green row certifies the signature kernel bit-for-bit AND the banding's
    recall.  Restricted to ASCII, token-bearing docs (the SQL twin hashes
    code points, the engine hashes UTF-8 bytes — identical only on ASCII;
    token-less docs have no SQL rows).  Bucket caps are lifted — the
    production entry ``dedup_simhash`` keeps them as its all-pairs guard."""

    def ascii_tokenful(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(pc.binary_length(pc.cast(t["text"], pa.binary())),
                     pc.utf8_length(t["text"])),
            pc.match_substring_regex(t["text"], r"\S"),
        )
        return t.filter(keep)

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    ds = ds.map_batches(ascii_tokenful, batch_format="pyarrow")
    return simhash_pairs(ds, max_hamming=3, max_bucket=None)


# ------------------------------------------------------------------ windows


def events_props_json(sf_dir: str):
    """JSON payload extraction (transforms.JsonExtract actor pool): parse
    the props column's JSON, pull $.k, aggregate sum/count per event
    type — the semi-structured step every log pipeline runs.  Extracted
    values are strings (the json_extract_string contract), cast before
    the aggregate."""
    from .relational import preagg_groupby
    from .transforms import JsonExtract

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "props"])
    parsed = ds.map_batches(
        JsonExtract,
        fn_constructor_kwargs={"column": "props", "paths": {"k_str": "k"}},
        batch_format="pyarrow", concurrency=(1, 8),
    )

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "k": pc.cast(t["k_str"], pa.int64()),
        })

    return preagg_groupby(
        parsed.map_batches(cast, batch_format="pyarrow"),
        ["event_type"], [("k", "sum", "k_sum"), ("k", "count", "n")],
    )


def events_hourly(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts", "value"])
    out = tumbling_window(ds, "user_id", "ts", "hour",
                          [("value", "count", "n_events"), ("value", "sum", "sum_value")])
    return out.map_batches(lambda t: _round(t, {"sum_value": 2}), batch_format="pyarrow")


def user_sessions(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])
    return sessionize(ds, "user_id", "ts", 30)


def asof_latest_purchase(sf_dir: str):
    """As-of (backward) join — for every click/view, the user's latest
    purchase at-or-before it (relational.asof_join: union + one hash
    exchange + sorted vectorized scan; DuckDB mirrors it with ASOF LEFT
    JOIN).  (user_id, ts) is unique in the testdata, the asof uniqueness
    contract."""
    from .relational import asof_join

    left = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["event_id", "ts", "user_id", "value"],
        filter=pc.field("event_type").isin(["click", "view"]),
    )
    right = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["event_id", "ts", "user_id", "value"],
        filter=pc.field("event_type") == "purchase",
    ).map_batches(
        lambda t: pa.table(
            {"user_id": t["user_id"], "ts": t["ts"],
             "purchase_id": t["event_id"], "purchase_value": t["value"]}
        ),
        batch_format="pyarrow",
    )
    out = asof_join(left, right, key="user_id", ts_col="ts", num_partitions=16)
    return out.select_columns(["event_id", "user_id", "value", "purchase_id", "purchase_value"])


def lineitem_measures_melt(sf_dir: str):
    """Unpivot (melt) the four lineitem measures to long form, then roll
    up per measure — relational.melt is batch-local (no shuffle); only the
    tiny per-measure partials move.  Integer-cents sums for order-exact
    SQL parity (oracle: UNION ALL unpivot)."""
    from .relational import melt, preagg_groupby

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = rd.read_parquet(_p(sf_dir, "lineitem"), columns=["l_orderkey"] + cols)
    long = melt(ds, ["l_orderkey"], cols, var_name="measure", value_name="v")
    with_cents = long.map_batches(
        lambda t: t.append_column("cents", _cents(t["v"])), batch_format="pyarrow"
    )
    return preagg_groupby(
        with_cents, ["measure"],
        [("v", "count", "n_rows"), ("cents", "sum", "sum_cents")],
    )


def events_value_pivot(sf_dir: str):
    """Pivot (long → wide): per user, the summed event value by event type
    as one column per type — conditional aggregation inside map_batches,
    then ONE pre-aggregated groupby of partials (relational.pivot)."""
    from .relational import pivot

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type", "value"])
    with_cents = ds.map_batches(
        lambda t: pa.table({
            "user_id": t["user_id"], "event_type": t["event_type"],
            "cents": _cents(t["value"]),
        }),
        batch_format="pyarrow",
    )
    return pivot(
        with_cents, key="user_id", pivot_col="event_type", value_col="cents",
        values=["click", "view", "purchase"], agg="sum",
    )


def events_value_stats(sf_dir: str):
    """Distributed moments — per event type: count, exact-cents sum, mean,
    sample variance and stddev, all from one pass of mergeable
    (count, sum, sum-of-squares) partials (relational.grouped_stats).
    Integer partials make the derived IEEE expression reproducible
    bit-for-bit against SQL computing the same formula."""
    from .relational import grouped_stats

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "value"])
    with_cents = ds.map_batches(
        lambda t: pa.table({"event_type": t["event_type"], "cents": _cents(t["value"])}),
        batch_format="pyarrow",
    )
    return grouped_stats(
        with_cents, ["event_type"], "cents",
        n_name="n_rows", sum_name="sum_cents", mean_name="mean_cents",
        var_name="var_cents", std_name="std_cents",
    )


def value_bucket_counts(sf_dir: str):
    """Theta join via broadcast cross join + filter
    (relational.cross_join_broadcast): every event matched against a small
    bucket-bounds table (lo ≤ cents < hi), counted per bucket — the
    non-equi-join pattern hash joins can't express, with zero shuffle for
    the join itself."""
    from .relational import cross_join_broadcast, preagg_groupby

    buckets = pa.table({
        "bucket": ["low", "mid", "high"],
        "lo": pa.array([0, 1000, 10000], pa.int64()),
        "hi": pa.array([1000, 10000, 1_000_000_000], pa.int64()),
    })
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["value"])
    with_cents = ds.map_batches(
        lambda t: pa.table({"cents": _cents(t["value"])}), batch_format="pyarrow"
    )
    crossed = cross_join_broadcast(with_cents, buckets)
    matched = crossed.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t["cents"], t["lo"]), pc.less(t["cents"], t["hi"])
        )),
        batch_format="pyarrow",
    )
    return preagg_groupby(matched, ["bucket"], [("cents", "count", "n")])


def busy_users(sf_dir: str):
    """GROUP BY ... HAVING: users with more than 60 events and their event
    count + exact-cents total — a post-aggregation filter on the (tiny)
    grouped result, so the predicate costs nothing at scale."""
    from .relational import preagg_groupby

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "value"])
    with_cents = ds.map_batches(
        lambda t: pa.table({"user_id": t["user_id"], "cents": _cents(t["value"])}),
        batch_format="pyarrow",
    )
    agg = preagg_groupby(
        with_cents, ["user_id"],
        [("cents", "count", "n_events"), ("cents", "sum", "total_cents")],
    )
    return agg.map_batches(
        lambda t: t.filter(pc.greater(t["n_events"], 60)), batch_format="pyarrow"
    )


def top_terms_heavy_hitters(sf_dir: str):
    """Heavy-hitters summary over the tokenized corpus
    (relational.heavy_hitters): per-batch top-capacity exact counts,
    groupby-sum merge, bounded global top-k.  The corpus vocabulary fits
    the summary capacity, so counts here are exact and the SQL gate
    certifies them; the truncated regime's undercount bound is
    pytest-pinned separately."""
    from .relational import heavy_hitters
    from .text import tokenize_batch

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    terms = ds.map_batches(
        lambda t: tokenize_batch(t), batch_format="pyarrow"
    ).select_columns(["term"])
    return heavy_hitters(terms, "term", k=10, capacity=64)


def favorite_event_type(sf_dir: str):
    """Per-group mode with a deterministic tie-break: each user's most
    frequent event type (count DESC, type ASC) — composed entirely from
    existing operators: pre-aggregated (user, type) counts, then
    grouped_topk n=1 over the tiny count table."""
    from .relational import grouped_topk, preagg_groupby

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type"])
    counts = preagg_groupby(
        ds, ["user_id", "event_type"], [("event_type", "count", "n")]
    )
    top = grouped_topk(
        counts, "user_id", [("n", "descending"), ("event_type", "ascending")], 1
    )
    return top.select_columns(["user_id", "event_type", "n"])


def bloom_filtered_revenue(sf_dir: str):
    """EXACT semi join with a Bloom pre-filter (relational.bloom_semi_join):
    fulfilled-order line items kept by testing a broadcast ~1.5-byte/key
    bitmap per batch BEFORE any exchange, false positives removed by the
    adaptive exact semi join on the survivors — identical output to the
    plain semi join, probe volume into the shuffle cut at the source."""
    from .relational import bloom_semi_join, preagg_groupby

    li = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_returnflag", "l_extendedprice"],
    ).map_batches(
        lambda t: pa.table({
            "l_orderkey": t["l_orderkey"], "l_returnflag": t["l_returnflag"],
            "cents": _cents(t["l_extendedprice"]),
        }),
        batch_format="pyarrow",
    )
    fulfilled = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderkey"],
        filter=pc.field("o_orderstatus") == "F",
    )
    kept = bloom_semi_join(li, fulfilled, "l_orderkey", "o_orderkey")
    return preagg_groupby(
        kept, ["l_returnflag"],
        [("cents", "count", "n_items"), ("cents", "sum", "revenue_cents")],
    )


def tfidf_terms(sf_dir: str):
    """Corpus TF-IDF top-5 terms per document (text.tfidf_top_terms):
    tokenize → pre-aggregated (doc, term) counts → document frequency →
    term join → tf·ln(N/df) → per-doc top-k with a total order.  The
    whole chain is SQL-expressible, so it runs under the exact gate."""
    from .text import tfidf_top_terms

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return tfidf_top_terms(ds, k=5)


def lineitem_qty_price_corr(sf_dir: str):
    """Per-flag covariance + Pearson correlation of quantity vs extended
    price — relational.grouped_corr's one-pass mergeable bivariate partials
    (count, Σx, Σy, Σx², Σy², Σxy); integer inputs keep the merged sums
    exact so the derived doubles match SQL computing the same formula."""
    from .relational import grouped_corr

    ds = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def ints(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "x": pc.cast(pc.floor(pc.add(t["l_quantity"], 0.5)), pa.int64()),
            "y": pc.cast(pc.floor(pc.add(t["l_extendedprice"], 0.5)), pa.int64()),
        })

    return grouped_corr(
        ds.map_batches(ints, batch_format="pyarrow"), ["l_returnflag"], "x", "y"
    )


def user_event_paths(sf_dir: str):
    """Grouped ordered concatenation (SQL ``string_agg(... ORDER BY ...)``
    / collect_list) — each user's event-type journey in (ts, event_id)
    order as one path string, via relational.grouped_concat's vectorized
    segment join (one sort + one binary_join kernel per partition)."""
    from .relational import grouped_concat

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["user_id", "event_type", "ts", "event_id"]
    )
    return grouped_concat(
        ds, ["user_id"], "event_type", ["ts", "event_id"],
        sep=">", out_name="path", count_name="n_events",
    )


def transcript_reassembly(sf_dir: str):
    """Flagship extension — the engine-replayed lake reassembled into ONE
    row per conversation: role-prefixed turns joined in turn order
    (collect_list over the LWW winners).  Exercises the full chain
    WAL → exchange → LWW merge → manifest commit → lake read →
    grouped ordered concat, end-to-end under the SQL gate."""
    from .relational import grouped_concat

    lk = transcript_cdc_replay(sf_dir)
    line = pc.binary_join_element_wise(lk["role"], lk["text"], ": ")
    turns = pa.table(
        {"conv_id": lk["conv_id"], "turn_idx": lk["turn_idx"], "line": line}
    )
    return grouped_concat(
        rd.from_arrow(turns), ["conv_id"], "line", ["turn_idx"],
        sep=" | ", out_name="transcript", count_name="n_turns",
    )


def approx_users_hll(sf_dir: str):
    """HyperLogLog approximate count-distinct (mergeable sketch): distinct
    event users estimated from per-batch 16 KB sketches — no key ever
    shuffles.  Approximate by design → rows-only under the gate; accuracy
    (~0.8% standard error) is pinned by pytest against the exact count."""
    from .relational import approx_count_distinct

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id"])
    n = approx_count_distinct(ds, "user_id")
    return pa.table({"approx_users": pa.array([n], pa.int64())})


def approx_users_hll_verified(sf_dir: str):
    """The HLL accuracy contract under the EXACT gate: the sketch estimate
    is compared in-engine against the exact distinct count (pre-aggregated
    groupby — SQL-expressible) and the row carries the exact count plus a
    boolean asserting |est/exact − 1| ≤ 5% (standard error at p=14 is
    ~0.8%; the testdata cardinality sits in the linear-counting regime,
    far from the crossover bias zone).  The SQL twin emits TRUE, so an
    HLL regression past its documented bound hash-FAILS the row.  The
    estimate itself can never be SQL-recomputed — DuckDB's
    approx_count_distinct is a different sketch."""
    from .relational import approx_count_distinct

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id"])
    est = approx_count_distinct(ds, "user_id")
    exact = preagg_groupby(
        ds, ["user_id"], [("user_id", "count", "__n")]
    ).count()
    ok = (abs(est / exact - 1.0) <= 0.05) if exact else est == 0
    return pa.table({"n_exact": pa.array([exact], pa.int64()),
                     "hll_within_5pct": pa.array([ok])})


def daily_users_hll(sf_dir: str):
    """Per-key HLL (grouped mergeable sketch): approximate distinct users
    per day — one 4 KB sketch row per (day, batch) shuffles, never a user
    id.  Approximate by design → rows-only; per-group accuracy is
    pytest-pinned and the exact twin is the oracled events_daily_users."""
    from .relational import grouped_approx_count_distinct

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])
    with_day = ds.map_batches(
        lambda t: pa.table({
            "day": pc.strftime(t["ts"], format="%Y-%m-%d"), "user_id": t["user_id"],
        }),
        batch_format="pyarrow",
    )
    return grouped_approx_count_distinct(
        with_day, ["day"], "user_id", out_name="approx_users"
    )


def events_sample(sf_dir: str):
    """Deterministic (engine-independent) 5% sample of the event stream by
    key hash — relational.deterministic_sample: pure integer arithmetic
    both engines evaluate identically, so the sampled row set is exactly
    reproducible (no RNG, no partitioning dependence)."""
    from .relational import deterministic_sample

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "event_type"]
    )
    return deterministic_sample(ds, "event_id", permille=50)


def events_mixture_sample(sf_dir: str):
    """Corpus-mixing to data-derived rates (relational.mixture_sample):
    sample the event stream DOWN to ≈2000 rows per event type — each
    type's keep-rate is min(10^6, max(1, 10^6·2000 // n_type)) ppm from a
    tiny counting pass, then the batch-local integer-hash keep rule.
    Pure integer arithmetic end-to-end: SQL reproduces membership exactly
    by computing the same counts and the same formula."""
    from .relational import mixture_sample

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "event_type"]
    )
    return mixture_sample(ds, "event_id", "event_type", target_rows=2000)


def events_shuffle_export(sf_dir: str):
    """Deterministic global shuffle to training shards
    (relational.shuffle_export): h = mix64(event_id) orders the corpus
    pseudo-randomly but reproducibly, shard = top 5 bits; one range sort
    clusters the hive shard directories, and the returned per-shard
    manifest (n_rows, min/max hash as decimal strings) is the oracle —
    SQL reproduces mix64 exactly in HUGEINT arithmetic."""
    import shutil

    from .relational import shuffle_export

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "event_type"]
    )
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = f"/tmp/raydatax_shuf_{tag}"
    shutil.rmtree(out, ignore_errors=True)
    return shuffle_export(ds, "event_id", out_dir=out, shard_bits=5)


def events_leakage_split(sf_dir: str):
    """Leakage-safe train/val split (relational.train_val_split): split
    assigned per USER (mix64(user_id) % 1000 < 100 → val), so no user
    straddles the boundary; returns per-(split, event_type) counts.  The
    SQL twin recomputes the identical mix64 in HUGEINT arithmetic."""
    from .relational import preagg_groupby, train_val_split

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "event_type"]
    )
    tagged = train_val_split(ds, "user_id", val_permille=100)
    return preagg_groupby(
        tagged, ["split", "event_type"], [("event_id", "count", "n_rows")]
    )


def events_exact_sample(sf_dir: str):
    """Exactly-N-per-group sampling (relational.grouped_exact_sample):
    precisely 150 events per event_type, chosen by mix64(event_id) rank —
    exact quotas (unlike rate sampling), deterministic and unbiased in
    input order; SQL reproduces the pick with row_number() over the
    bit-exact mix64 replica."""
    from .relational import grouped_exact_sample

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "event_type"]
    )
    return grouped_exact_sample(ds, "event_type", "event_id", n=150)


def event_value_ranks(sf_dir: str):
    """SQL rank()/dense_rank() tie semantics — every event ranked by value
    within its event type, in the same single hash-partitioned sorted scan
    as the other window functions (relational.window_scan ranks=True);
    ties share a rank, dense_rank has no gaps, so the output is
    deterministic even with duplicate values."""
    from .relational import window_scan

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "value"])
    with_cents = ds.map_batches(
        lambda t: pa.table({"event_type": t["event_type"], "cents": _cents(t["value"])}),
        batch_format="pyarrow",
    )
    out = window_scan(with_cents, key="event_type", order_col="cents", ranks=True)
    return out.select_columns(["event_type", "cents", "rank", "dense_rank"]).map_batches(
        lambda t: t.rename_columns(["event_type", "cents", "rnk", "drnk"]),
        batch_format="pyarrow",
    )


def event_value_distribution(sf_dir: str):
    """percent_rank / cume_dist over the value ordering — tie-safe under a
    hash gate because tied rows receive identical ranks and run ends (the
    derived doubles are the same fixed IEEE expression both engines
    evaluate over exact integers)."""
    from .relational import window_scan

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "value"])
    with_cents = ds.map_batches(
        lambda t: pa.table({"event_type": t["event_type"], "cents": _cents(t["value"])}),
        batch_format="pyarrow",
    )
    out = window_scan(with_cents, key="event_type", order_col="cents", pct=True)
    return out.select_columns(
        ["event_type", "cents", "percent_rank", "cume_dist"]
    ).map_batches(
        lambda t: t.rename_columns(["event_type", "cents", "pct_rank", "cume"]),
        batch_format="pyarrow",
    )


def event_stream_lead_tiles(sf_dir: str):
    """lead() and ntile() over a UNIQUE ordering (event_id) so the joint
    per-row assignment is deterministic — window_scan lead_cols + ntile_n
    in the same single sorted scan as everything else."""
    from .relational import window_scan

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_type", "event_id", "value"]
    )
    with_cents = ds.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"], "event_id": t["event_id"],
            "cents": _cents(t["value"]),
        }),
        batch_format="pyarrow",
    )
    out = window_scan(
        with_cents, key="event_type", order_col="event_id",
        lead_cols=["cents"], ntile_n=4, first_last_cols=["cents"],
    )
    return out.select_columns(
        ["event_type", "event_id", "cents", "next_cents", "tile",
         "first_cents", "last_cents"]
    )


def _user_day_side(sf_dir: str, event_type: str):
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type", "ts"])

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], event_type))
        return pa.table(
            {"user_id": t["user_id"], "day": pc.strftime(t["ts"], format="%Y-%m-%d")}
        )

    return ds.map_batches(f, batch_format="pyarrow")


def view_purchase_day_intersect(sf_dir: str):
    """Set op INTERSECT (distinct, multi-column): (user, day) pairs with a
    view AND a purchase — relational.set_distinct: presence flags + one
    pre-aggregated groupby over the row; only distinct partials shuffle."""
    from .relational import set_distinct

    return set_distinct(
        _user_day_side(sf_dir, "view"), _user_day_side(sf_dir, "purchase"), "intersect"
    )


def click_except_purchase_days(sf_dir: str):
    """Set op EXCEPT (distinct): (user, day) pairs with a click but no
    purchase that day — same flag-merge discipline as the intersect."""
    from .relational import set_distinct

    return set_distinct(
        _user_day_side(sf_dir, "click"), _user_day_side(sf_dir, "purchase"), "except"
    )


def purchase_attribution(sf_dir: str):
    """Range (interval) join — every click/view attributed to each purchase
    whose 2-hour attribution window ``[ts, ts + 2h]`` contains it, for the
    same user (relational.range_join: union + one hash exchange + per-
    partition probe-counting scan), then a pre-aggregated rollup per
    purchase.  Integer-cents sums for order-exact SQL parity."""
    from .relational import preagg_groupby, range_join

    TWO_H_US = 2 * 3_600_000_000
    left = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["event_id", "ts", "user_id", "value"],
        filter=pc.field("event_type").isin(["click", "view"]),
    ).map_batches(
        lambda t: t.append_column("cents", _cents(t["value"])).drop_columns(["value"]),
        batch_format="pyarrow",
    )
    right = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["event_id", "ts", "user_id"],
        filter=pc.field("event_type") == "purchase",
    ).map_batches(
        lambda t: pa.table({
            "user_id": t["user_id"],
            "lo": t["ts"],
            "hi": pc.add(t["ts"].cast(pa.int64()), TWO_H_US).cast(t["ts"].type),
            "purchase_id": t["event_id"],
        }),
        batch_format="pyarrow",
    )
    pairs = range_join(
        left, right, key="user_id", ts_col="ts", lo_col="lo", hi_col="hi",
        num_partitions=16,
    )
    return preagg_groupby(
        pairs, ["purchase_id"],
        [("event_id", "count", "n_attributed"), ("cents", "sum", "value_cents")],
    )


def top_events_per_type(sf_dir: str):
    """Grouped top-N (row_number() <= n per key): per-batch partial top-n,
    shuffle ≤ n rows per key per batch, final re-rank per key."""
    from .relational import grouped_topk

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "event_type", "value"])
    out = grouped_topk(
        ds, "event_type", [("value", "descending"), ("event_id", "ascending")], n=3
    )
    return out.select_columns(["event_type", "rank", "event_id", "value"])


def events_hopping(sf_dir: str):
    """Hopping windows (2 h wide, 1 h hop): vectorized in-map fan-out to the
    two containing windows, then the pre-aggregated (key, window) groupby."""
    from .relational import hopping_window

    HOUR_US = 3_600_000_000
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "ts", "value"])
    out = hopping_window(
        ds, "event_type", "ts", size_us=2 * HOUR_US, hop_us=HOUR_US,
        aggs=[("value", "count", "n_events"), ("value", "sum", "sum_value")],
    )
    return out.map_batches(lambda t: _round(t, {"sum_value": 2}), batch_format="pyarrow")


def user_running_totals(sf_dir: str):
    """Per-key ordered window functions (row_number, lag, running sum) in
    one hash-partitioned vectorized scan (relational.window_scan).  The
    running sum runs over integer cents — order-exact in both engines
    (float running sums are accumulation-order-sensitive)."""
    from .relational import window_scan

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "user_id", "value"])

    def add_cents(t: pa.Table) -> pa.Table:
        return t.append_column("cents", _cents(t["value"]))

    out = window_scan(
        ds.map_batches(add_cents, batch_format="pyarrow"),
        key="user_id", order_col="event_id",
        lag_cols=["value"], sum_cols=["cents"], num_partitions=16,
    )
    return out.select_columns(
        ["user_id", "event_id", "value", "rn", "prev_value", "run_cents"]
    )


def user_moving_avg(sf_dir: str):
    """Bounded-frame window aggregate (ROWS BETWEEN 4 PRECEDING AND
    CURRENT ROW) — window_scan's moving_sum, derived from the same single
    cumsum as the running total.  The 5-event moving average is the
    exact-integer moving sum divided by the in-frame row count
    (least(rn, 5)) — bit-identical to SQL avg() over the frame applied to
    integer cents, scaled back to dollars."""
    from .relational import window_scan

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "user_id", "value"])

    def add_cents(t: pa.Table) -> pa.Table:
        return t.append_column("cents", _cents(t["value"]))

    out = window_scan(
        ds.map_batches(add_cents, batch_format="pyarrow"),
        key="user_id", order_col="event_id",
        moving_sum=[("cents", 5)], num_partitions=16,
    )

    def finish(t: pa.Table) -> pa.Table:
        n_win = pc.min_element_wise(t["rn"], pa.scalar(5, pa.int64()))
        avg = pc.divide(
            pc.cast(t["mov_cents_5"], pa.float64()),
            pc.multiply(pc.cast(n_win, pa.float64()), 100.0),
        )
        return pa.table({"user_id": t["user_id"], "event_id": t["event_id"],
                         "mov_sum_cents": t["mov_cents_5"], "mov_avg": avg})

    return out.map_batches(finish, batch_format="pyarrow")


def revenue_rollup_region(sf_dir: str):
    """GROUP BY ROLLUP(region, nation): aggregate the raw table once at the
    finest level, roll coarser levels up from the RESULT (integer-cents sums
    so every level is order-exact vs SQL)."""
    import pyarrow.parquet as pq

    from .relational import rollup_aggregate

    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey", "c_acctbal"])
    nation = pq.read_table(_p(sf_dir, "nation")).rename_columns(["c_nationkey", "n_name", "r_regionkey"])
    region = pq.read_table(_p(sf_dir, "region")).rename_columns(["r_regionkey", "r_name"])
    joined = broadcast_join(cust, nation, "c_nationkey")
    joined = broadcast_join(joined, region, "r_regionkey")

    def add_cents(t: pa.Table) -> pa.Table:
        return t.append_column("cents", _cents(t["c_acctbal"]))

    out = rollup_aggregate(
        joined.map_batches(add_cents, batch_format="pyarrow"),
        ["r_name", "n_name"],
        [("c_custkey", "count", "n_customers"), ("cents", "sum", "acctbal_cents")],
    )
    return out.select_columns(["r_name", "n_name", "n_customers", "acctbal_cents"])


def orders_status_priority_cube(sf_dir: str):
    """GROUP BY CUBE(status, priority) — all four grouping sets
    (relational.cube_aggregate): the raw table aggregates once at the
    finest level, every other set re-aggregates that result;
    integer-cents sums keep all levels order-exact vs SQL."""
    from .relational import cube_aggregate

    ds = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"],
    )

    def add_cents(t: pa.Table) -> pa.Table:
        return t.append_column("cents", _cents(t["o_totalprice"]))

    out = cube_aggregate(
        ds.map_batches(add_cents, batch_format="pyarrow"),
        ["o_orderstatus", "o_orderpriority"],
        [("o_orderkey", "count", "n_orders"), ("cents", "sum", "total_cents")],
    )
    return out.select_columns(
        ["o_orderstatus", "o_orderpriority", "n_orders", "total_cents"]
    )


# --------------------------------------------------------------------- ANN


def _queries_table(sf_dir: str, n: int = 3) -> pa.Table:
    import pyarrow.parquet as pq

    e = pq.read_table(_p(sf_dir, "embeddings"))
    return e.filter(pc.less(e["vec_id"], n))


def ann_cosine_topk(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "embeddings"))
    out = brute_force_topk(ds, _queries_table(sf_dir), k=10)
    return out.select(["query_id", "rank", "neighbor_id"])


def ann_ivf(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "embeddings"))
    out = ivf_topk(ds, _queries_table(sf_dir), k=10, n_clusters=16, nprobe=4)
    return out.select(["query_id", "rank", "neighbor_id"])


def ann_pq_verified(sf_dir: str):
    """PQ-ADC search + exact rerank (ann.pq_topk): vectors scored as uint8
    codes against per-query lookup tables, per-batch partial shortlists,
    then the union shortlist's TRUE vectors rescored with exact cosine —
    the production compress-then-rerank layout.  The rerank makes the
    output exact whenever the true top-k survives the shortlist, which is
    what puts a quantized index under the same SQL hash gate as brute
    force (the approx_users_hll_verified pattern for ANN)."""
    from .ann import pq_topk

    ds = rd.read_parquet(_p(sf_dir, "embeddings"))
    out = pq_topk(
        ds, _queries_table(sf_dir), k=10, m_sub=32, n_codes=256, shortlist=64
    )
    return out.select(["query_id", "rank", "neighbor_id"])


def multimodal_features(sf_dir: str):
    """Binary-column decode + feature plumbing, SQL-oracled: media payloads
    are derived deterministically from the documents table (RDXM container
    wrapping the doc's utf-8 bytes, header fields pure functions of doc_id —
    see multimodal.media_from_documents), so the decode stage's outputs —
    parsed header fields AND the decoded blob's byte length — are
    recomputable in DuckDB from the source table."""
    from .multimodal import DecodeMedia, MediaFeatures, media_from_documents

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    media = docs.map_batches(media_from_documents, batch_format="pyarrow")
    out = (
        media.map_batches(DecodeMedia, batch_format="pyarrow", batch_size=64, concurrency=(1, 4))
        .map_batches(MediaFeatures, batch_format="pyarrow", batch_size=64, concurrency=(1, 4))
    )
    return out.select_columns(
        ["media_id", "dec_kind", "decoded_ok", "dec_width", "dec_height", "dec_bytes"]
    )


def events_stratified_sample(sf_dir: str):
    """Per-stratum deterministic sampling (relational.stratified_sample):
    keep all purchases, 20% of clicks, 5% of views, drop the rest — the
    corpus-mixing keep-rule, reproducible in SQL via a CASE over the same
    integer formula."""
    from .relational import stratified_sample

    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["event_id", "event_type", "user_id"])
    return stratified_sample(
        ds, key="event_id", strata_col="event_type",
        permille={"purchase": 1000, "click": 200, "view": 50},
    )


def embedding_components(sf_dir: str):
    """Generic list-column unnest (relational.explode_list) over the
    embeddings table: one row per (vec_id, pos, component), with the
    component scale-floored to an exact integer — float32→float64 widening
    is exact in both engines, so the int is cross-engine identical (raw
    float32 strings are NOT: pandas prints the float32, DuckDB the
    widened float64)."""
    from .relational import explode_list

    ds = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def apply(t: pa.Table) -> pa.Table:
        e = explode_list(t, "embedding", pos_col="pos", out="comp")
        milli = pc.cast(
            pc.floor(pc.add(pc.multiply(pc.cast(e["comp"], pa.float64()), 1000.0), 0.5)),
            pa.int64(),
        )
        return pa.table({"vec_id": e["vec_id"], "pos": e["pos"], "comp_milli": milli})

    return ds.map_batches(apply, batch_format="pyarrow")


def revenue_by_segment(sf_dir: str):
    """Both-sides-large distributed hash join chain (lineitem ⋈ orders ⋈
    customer — the join the reference cannot express at all), then a
    pre-aggregated rollup by market segment."""
    from .relational import hash_join

    li = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    ords = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])

    ords = ords.map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_custkey"]), batch_format="pyarrow"
    )
    cust = cust.map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_mktsegment"]), batch_format="pyarrow"
    )
    j1 = hash_join(li, ords, on="l_orderkey", num_partitions=16)
    # the customer side is the dimension table — broadcast it under a
    # metadata-counted threshold instead of shuffling the joined fact rows
    # through a second exchange (also avoids chaining a Dataset.join off a
    # join output, which crashes on empty hash partitions)
    cust = cust.materialize()
    if cust.count() <= 2_000_000:
        from .relational import _fetch_partials, broadcast_join

        tabs = [t for t in _fetch_partials(cust.to_arrow_refs()) if t.num_rows]
        if not tabs:  # pa.concat_tables([]) raises; an empty dim is a
            sch = cust.schema().base_schema  # legal (fully filtered) input
            tabs = [sch.empty_table()]
        j2 = broadcast_join(j1, pa.concat_tables(tabs), "o_custkey")
    else:
        j2 = hash_join(j1, cust, on="o_custkey", num_partitions=16)

    def add_rev(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("rev", rev)

    out = preagg_groupby(
        j2.map_batches(add_rev, batch_format="pyarrow"),
        ["c_mktsegment"],
        [("rev", "count", "n_items"), ("rev", "sum", "revenue")],
    )
    return out.map_batches(lambda t: _round(t, {"revenue": 2}), batch_format="pyarrow")


def orders_by_status(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderstatus", "o_totalprice"])
    out = preagg_groupby(
        ds, ["o_orderstatus"],
        [("o_totalprice", "count", "n_orders"), ("o_totalprice", "sum", "sum_total")],
    )
    return out.map_batches(lambda t: _round(t, {"sum_total": 2}), batch_format="pyarrow")


def part_type_stats(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "part"), columns=["p_type", "p_size"])
    return preagg_groupby(
        ds, ["p_type"],
        [("p_size", "min", "min_size"), ("p_size", "max", "max_size"),
         ("p_size", "count", "n_parts")],
    )


def events_daily_users(sf_dir: str):
    """COUNT(DISTINCT) at scale: dedupe to (day, user) pairs with in-batch
    hash aggregation first, then count pairs per day — the shuffle moves one
    row per distinct pair per batch, never raw events."""
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])

    def add_day(t: pa.Table) -> pa.Table:
        return pa.table({"day": pc.strftime(t["ts"], format="%Y-%m-%d"),
                         "user_id": t["user_id"]})

    pairs = preagg_groupby(
        ds.map_batches(add_day, batch_format="pyarrow"),
        ["day", "user_id"], [("user_id", "count", "c")],
    )
    return preagg_groupby(pairs, ["day"], [("user_id", "count", "n_users")])


def value_percentiles(sf_dir: str):
    """Size-adaptive per-group percentiles: exact sorted-group path (==
    SQL quantile_cont, keeps the oracle hash-green) under the row
    threshold, two-phase fixed-bin histogram above it (see
    relational.grouped_percentiles)."""
    from .relational import grouped_percentiles

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "value"])
    out = grouped_percentiles(ds, "event_type", "value",
                              [("p50", 0.5), ("p95", 0.95)])
    return out.map_batches(lambda t: _round(t, {"p50": 6, "p95": 6}), batch_format="pyarrow")


def events_value_outliers(sf_dir: str):
    """Tukey-fence data cleaning (relational.iqr_outliers): events whose
    value falls outside [q1 − 1.5·IQR, q3 + 1.5·IQR] of their event type.
    Quartiles snap to micro precision before the fence arithmetic, so SQL
    computing the same rounded quantile_cont and fences keeps the row set
    exactly equal."""
    from .relational import iqr_outliers

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )
    return iqr_outliers(ds, "event_type", "value")


def dedup_embedding_exact(sf_dir: str):
    """Exact cosine-threshold self-join (blocked block-pair tasks — see
    dedup.embedding_allpairs_exact), SQL-oracled against DuckDB's
    list_cosine_similarity over all pairs.  The verified baseline the
    approximate clustered variant (dedup_embedding) is measured against."""
    from .dedup import embedding_allpairs_exact

    ds = rd.read_parquet(_p(sf_dir, "embeddings"))
    pairs = embedding_allpairs_exact(ds, threshold=0.35, block_rows=256)
    return pairs.select(["a", "b"])


def dedup_embedding(sf_dir: str):
    from .dedup import embedding_neardup_pairs

    ds = rd.read_parquet(_p(sf_dir, "embeddings"))
    # random testdata embeddings: cosine ~ N(0, 1/sqrt(64)); 0.35 ≈ 2.8σ so a
    # small deterministic pair set survives (real corpora would use ~0.95)
    pairs = embedding_neardup_pairs(ds, threshold=0.35)
    return pairs.select_columns(["a", "b"])


def embedding_kmeans(sf_dir: str):
    """Distributed Lloyd's k-means (ann.kmeans_fit, k=4, 2 rounds seeded
    from the 4 smallest vec_ids): centroids re-snap to micro precision
    between rounds, making the whole loop engine-independent — the SQL
    twin unrolls both rounds (assignment = squared-L2 argmin with
    lowest-cluster tie-break, update = per-cluster mean) and must land on
    identical centroids and member counts."""
    from .ann import kmeans_fit_distributed

    ds = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    cent, counts = kmeans_fit_distributed(ds, k=4, iters=2)
    # the SQL twin's final CTE joins centroids to the last assignment's
    # counts, so a cluster emptied mid-run never appears there — drop
    # zero-count rows to keep the row sets identical
    nz = counts > 0
    cent, counts = cent[nz], counts[nz]
    cluster_ids = np.arange(len(nz), dtype=np.int64)[nz]
    k, d = cent.shape
    micro = np.floor(cent * 1e6 + 0.5).astype(np.int64)
    return pa.table({
        "cluster": pa.array(np.repeat(cluster_ids, d)),
        "pos": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), k)),
        "comp_micro": pa.array(micro.ravel()),
        "n": pa.array(np.repeat(counts, d)),
    })


def semantic_dedup_vecs(sf_dir: str):
    """Semantic dedup, dominance rule (dedup.semantic_dedup_keep): drop
    every vector with a cosine-≥0.35 partner of smaller id, keep the
    rest — the SQL-expressible rule (the kept set contains no near-dup
    pair; on chains it over-deletes vs SemDeDup's keep-first, which
    rule='greedy' provides and tests pin).  Pairs from the exact
    baseline; survivors via the adaptive anti semi join."""
    from .dedup import semantic_dedup_keep

    ds = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return semantic_dedup_keep(ds, threshold=0.35, block_rows=256)


def _crawl_split(ds, id_name: str, prior: bool):
    """The shared two-crawl convention of the incremental_* queries and
    their SQL mirrors: prior crawl = id % 3 == 0, new crawl = the rest."""

    def f(t: pa.Table) -> pa.Table:
        ids = t[id_name].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((ids % 3 == 0) == prior))

    return ds.map_batches(f, batch_format="pyarrow")


def incremental_embedding_exact(sf_dir: str):
    """Incremental embedding near-dup under the exact-SQL gate: the prior
    crawl (vec_id % 3 == 0) seeds the persistent IVF index, the new
    crawl's pairs against index ∪ itself are computed EXACTLY (blocked
    block-pair Ray tasks — old–old blocks never scored;
    dedup.incremental_embedding_exact_pairs, the verification baseline of
    the IVF-probed incremental path).  Oracle: DuckDB
    list_cosine_similarity over every pair not wholly in the prior crawl."""
    import shutil

    from .dedup import embedding_index_add, incremental_embedding_exact_pairs

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    idx = f"/tmp/raydatax_ivf_idx_{tag}"
    shutil.rmtree(idx, ignore_errors=True)

    vecs = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    embedding_index_add(_crawl_split(vecs, "vec_id", True), idx)
    pairs = incremental_embedding_exact_pairs(
        _crawl_split(vecs, "vec_id", False), idx, threshold=0.35, block_rows=256
    )
    return pairs.select(["a", "b"])


def incremental_minhash_verified(sf_dir: str):
    """The INCREMENTAL LSH path under the exact-SQL gate: the prior crawl
    (doc_id % 3 == 0) is indexed (dedup.minhash_index_add), the new crawl
    probes the persistent index (incremental_minhash_pairs — index band
    rows move only where a new band hash lands, old–old pairs never
    generated), and every candidate is exact-verified with char-5-gram
    Jaccard at 0.6.  The oracle computes ALL cross/new pairs with exact
    Jaccard ≥ 0.6 in DuckDB — green certifies precision exactly and, at
    this corpus scale, recall of the probe path."""
    import shutil

    from .dedup import (
        incremental_minhash_pairs,
        minhash_index_add,
        ngram_jaccard_verify,
    )

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    idx = f"/tmp/raydatax_lsh_idx_{tag}"
    shutil.rmtree(idx, ignore_errors=True)

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    minhash_index_add(_crawl_split(docs, "doc_id", True), idx)
    cand = incremental_minhash_pairs(
        _crawl_split(docs, "doc_id", False), idx, threshold=0.6
    )
    ver = ngram_jaccard_verify(docs, cand.select_columns(["a", "b"]), k=5)
    kept = ver.map_batches(
        lambda t: t.filter(pc.greater_equal(t["jaccard"], 0.6)),
        batch_format="pyarrow",
    )
    return kept.sort(["a", "b"])


def incremental_dedup(sf_dir: str):
    """CROSS-CORPUS incremental dedup — the steady-state loop of a
    continuously ingested crawl: the prior crawl (doc_id % 3 == 0) seeds a
    persistent key index, the new crawl (the rest) is dedup'd against the
    index (adaptive anti semi join) and within itself (min id wins).
    Parity key = substr(lower(text), 1, 20), the same SQL-expressible
    content key as dedup_exact_prefix (the operator's default key is the
    64-bit rolling fingerprint — dedup.incremental_exact_dedup)."""
    import shutil

    from .dedup import incremental_exact_dedup

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    idx = f"/tmp/raydatax_dedup_idx_{tag}"
    shutil.rmtree(idx, ignore_errors=True)

    def prefix_key(t: pa.Table) -> pa.Table:
        k = pc.utf8_slice_codeunits(pc.utf8_lower(t["text"]), 0, 20)
        return pa.table({"doc_id": t["doc_id"], "__k": k})

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    prior = _crawl_split(docs, "doc_id", True)
    new = _crawl_split(docs, "doc_id", False)
    incremental_exact_dedup(prior, idx, key_fn=prefix_key)  # seeds epoch-0
    return incremental_exact_dedup(new, idx, key_fn=prefix_key, update_index=False)


# --------------------------------------------------------------------- graph


def graph_export_edges(sf_dir: str):
    """Graph-DB export family (gdbreader/gdbwriter — Gremlin label export,
    GdbReader.java:81-105 per-label split + mapping/DefaultGdbMapper):
    orders become a bipartite ``placed`` edge set labeled by order status,
    written as a parquet graph-export snapshot, read back through the
    per-label split reader (only labels 'F' and 'O' — predicate-pruned)
    with a column-spec mapping rule, then aggregated per label.  Money
    moves as exact integer cents (scale-floor, accumulation-order-exact).
    The oracle recomputes the aggregate directly from orders."""
    from .graph import export_graph, read_graph
    from .sources import ColumnEntry

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = f"/tmp/raydatax_graph_{tag}"
    orders = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderstatus", "o_custkey", "o_totalprice"],
    )

    def to_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": t["o_orderkey"],
                "label": t["o_orderstatus"],
                "src": pc.cast(t["o_custkey"], pa.int64()),
                "dst": t["o_orderkey"],
                "weight_cents": _cents(t["o_totalprice"]),
            }
        )

    edges = orders.map_batches(to_edges, batch_format="pyarrow")
    paths = export_graph(None, edges, root)
    spec = [
        ColumnEntry(index=1, type="string", name="label"),
        ColumnEntry(index=2, type="long", name="src"),
        ColumnEntry(index=4, type="long", name="weight_cents"),
    ]
    got = read_graph(paths["edges"], labels=["F", "O"], column_spec=spec)
    return preagg_groupby(
        got,
        ["label"],
        [("src", "count", "n_edges"), ("weight_cents", "sum", "total_cents")],
    )


def graph_khop(sf_dir: str):
    """k-hop BFS (depth ≤ 3) over a deterministic interaction graph derived
    from events — src=user_id, dst=(user_id*3 + event_id) mod U with
    U = max(user_id)+1, distinct edges, seeds {0,1,2}.  The engine runs
    :func:`raydatax.graph.k_hop` (adaptive semi-join frontier expansion);
    the oracle is a recursive CTE taking min(depth) per reached node."""
    from .graph import k_hop

    ev = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_id"])
    n_users = int(ev.max("user_id")) + 1

    def to_edges(t: pa.Table, _u: int = n_users) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        e = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": u, "dst": (u * 3 + e) % _u})

    edges = preagg_groupby(
        ev.map_batches(to_edges, batch_format="pyarrow"),
        ["src", "dst"],
        [("src", "count", "__c")],
    ).select_columns(["src", "dst"])
    return k_hop(edges, seeds=[0, 1, 2], k=3)


def graph_pagerank(sf_dir: str):
    """Deterministic integer PageRank (3 iterations) over the same derived
    interaction graph as graph_khop — micro-unit ranks, damping 17/20,
    floor division throughout, so engine and SQL produce bit-identical
    integers (float PageRank could never hash-match).  Oracle = the three
    iterations unrolled as chained CTEs."""
    from .graph import pagerank

    ev = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_id"])
    n_users = int(ev.max("user_id")) + 1

    def to_edges(t: pa.Table, _u: int = n_users) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        e = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": u, "dst": (u * 3 + e) % _u})

    edges = ev.map_batches(to_edges, batch_format="pyarrow")
    return pagerank(edges, iters=3)


def graph_shortest_paths(sf_dir: str):
    """3-hop-bounded shortest paths from seeds {0,1,2} over the derived
    interaction graph with integer weights w = event_id % 97 + 1 (parallel
    edges collapse to min w).  Deterministic integer relaxation — exact on
    both engines; oracle = the three rounds unrolled as chained CTEs."""
    from .graph import shortest_paths

    ev = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_id"])
    n_users = int(ev.max("user_id")) + 1

    def to_edges(t: pa.Table, _u: int = n_users) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        e = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": u, "dst": (u * 3 + e) % _u, "w": e % 97 + 1})

    edges = ev.map_batches(to_edges, batch_format="pyarrow")
    return shortest_paths(edges, seeds=[0, 1, 2], rounds=3)


def graph_triangles(sf_dir: str):
    """Per-vertex triangle counts over a sparse deterministic graph (events
    with event_id % 13 == 0).  Canonical-orientation wedge join + adaptive
    semi-join closure — exact integers both sides."""
    from .graph import triangle_count

    ev = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_id"])
    n_users = int(ev.max("user_id")) + 1

    def to_edges(t: pa.Table, _u: int = n_users) -> pa.Table:
        e = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (e % 13) == 0
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        return pa.table({"src": u, "dst": (u * 7 + e[keep]) % _u})

    return triangle_count(ev.map_batches(to_edges, batch_format="pyarrow"))


def graph_components(sf_dir: str):
    """Undirected connected components over a SPARSE deterministic graph
    (only events with event_id % 97 == 0 contribute an edge — several
    nontrivial components at every sf).  Engine = distributed min-label
    propagation (graph.connected_components → dedup.propagate_min_labels);
    oracle = recursive CTE propagating self-labels over both edge
    directions, min per node."""
    from .graph import connected_components

    ev = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_id"])
    n_users = int(ev.max("user_id")) + 1

    def to_edges(t: pa.Table, _u: int = n_users) -> pa.Table:
        e = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (e % 97) == 0
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        e = e[keep]
        return pa.table({"src": u, "dst": (u * 5 + e) % _u})

    edges = preagg_groupby(
        ev.map_batches(to_edges, batch_format="pyarrow"),
        ["src", "dst"],
        [("src", "count", "__c")],
    ).select_columns(["src", "dst"])
    return connected_components(edges)


def events_profile(sf_dir: str):
    """One-scan ANALYZE over the events table (relational.table_profile):
    per column n_rows / n_nulls / exact NDV / typed min–max in a single
    pass — per-batch value_counts partials, ONE groupby merge on
    (column, key), a tiny per-column fold.  Display follows the repo's
    cross-engine float discipline (doubles as milli scale-floor ints,
    timestamps as ISO seconds) so the whole profile hash-matches SQL."""
    from .relational import table_profile

    ds = rd.read_parquet(_p(sf_dir, "events"))
    return table_profile(ds, ["event_id", "user_id", "event_type", "value", "ts"])


def cdc_demux_routing(sf_dir: str):
    """Multi-table stream routing (source.demux_wal): events staged as ONE
    tagged segment stream (table = event_type), demuxed in one pass into
    per-table WAL dirs (one Ray task per segment, temp+rename, resumable
    manifest), then the 'purchase' table's routed dir read back whole —
    certifying content-exact routing, not just counts.  The reference runs
    one DataX job per table, re-reading the source each time; here the
    stream is read once."""
    import glob as _glob
    import os as _os
    import tempfile

    from .source import demux_wal

    src = tempfile.mkdtemp(prefix="raydatax_mtsrc_")
    dst = tempfile.mkdtemp(prefix="raydatax_mtdst_")
    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "value", "event_type"]
    )

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("table", t["event_type"])

    ds.map_batches(tag, batch_format="pyarrow").write_parquet(src)
    for i, f in enumerate(sorted(_glob.glob(_os.path.join(src, "*.parquet")))):
        _os.rename(f, _os.path.join(src, f"seg-{i:05d}.parquet"))

    routed = demux_wal(src, dst, table_col="table")
    return rd.read_parquet(routed["tables"]["purchase"]).select_columns(
        ["event_id", "user_id", "value", "event_type"]
    )


def zorder_box_scan(sf_dir: str):
    """Multi-dimension clustering end-to-end (sources.write_zordered →
    read_box): events re-clustered on Morton codes over (user_id, value)
    — the OPTIMIZE ZORDER maintenance op of lake formats — then a box
    scan selective on the SECOND dimension, which a 1-D sort cannot
    prune: row groups pruned by footer stats on both columns at once,
    exact conjunctive predicate in-task.  Oracle: the plain WHERE."""
    import tempfile

    from .sources import read_box, write_zordered

    staged = tempfile.mkdtemp(prefix="raydatax_zo_")
    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "value"]
    )
    write_zordered(ds, staged, ["user_id", "value"], row_group_size=4096)
    return read_box(
        staged,
        {"user_id": (2, None), "value": (50.0, 60.0)},
        columns=["event_id", "user_id", "value"],
    )


def bpe_learn(sf_dir: str):
    """Fit a 6-merge BPE tokenizer over the document corpus
    (bpe.learn_bpe): ONE corpus pass builds the word-frequency table
    (pre-aggregated groupby), then each merge round runs on distinct
    words only — vectorized pair counting from the delimited
    symbol-string representation, total-order argmax, one
    replace_substring application.  Merge application is leftmost
    non-overlapping substitution == SQL replace(), which is what lets
    the whole learner run under the exact hash gate as unrolled
    per-round CTEs."""
    from .bpe import learn_bpe

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["text"])
    return learn_bpe(ds, n_merges=6)


def bpe_encode_counts(sf_dir: str):
    """Encode the corpus with the learned merges and count BPE symbols
    per document (bpe.encode_token_counts) — the fit-then-apply round
    trip: the merge table is tiny (it IS the tokenizer) and travels in
    the task closure; per-word symbol count is count('|')-1 of the
    final delimited string, summed per doc with np.add.at."""
    from .bpe import encode_token_counts, learn_bpe

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    merges = learn_bpe(ds, n_merges=6)
    return encode_token_counts(ds, merges)


# ------------------------------------------------------------------ registry

# Registry order is LOAD-BEARING: the external correctness gate records
# only the FIRST 50 entries.  The gate window below is curated so every
# operator family lands at least one hash-certified driver row — CDC core,
# the declarative runner, each source/sink family, transformers, joins,
# windows, asof/range joins, rollup/pivot, percentiles, sketches, set ops,
# sampling, the text-prep family, every dedup modality (exact / MinHash /
# SimHash / embedding / ngram-verify / incremental ×3), ANN, multimodal,
# and the graph family.  Entries past the window are equally maintained
# and checked by the local replica gate (tools/check_oracle.py).
QUERIES = {
    # --- gate window (first 50): one row per operator family -----------
    "transcript_cdc_replay": transcript_cdc_replay,
    "cdc_lww_upsert": cdc_lww_upsert,
    "cdc_changelog_export": cdc_changelog_export,
    "snapshot_cdc_orders": snapshot_cdc_orders,
    "scd2_transcripts": scd2_transcripts,
    "conversation_summary_view": conversation_summary_view,
    "sft_context_assembly": sft_context_assembly,
    "job_json_roundtrip": job_json_roundtrip,
    "events_partitioned_roundtrip": events_partitioned_roundtrip,
    "sql_split_read": sql_split_read,
    "sql_writer_roundtrip": sql_writer_roundtrip,
    "search_topk_scroll": search_topk_scroll,
    "key_range_scan": key_range_scan,
    "tsdb_window_read": tsdb_window_read,
    "jsonl_doc_roundtrip": jsonl_doc_roundtrip,
    "transform_chain": transform_chain,
    "cast_roundtrip": cast_roundtrip,
    "revenue_by_segment": revenue_by_segment,
    "lake_state_digest": lake_state_digest,
    "user_sessions": user_sessions,
    "asof_latest_purchase": asof_latest_purchase,
    "revenue_rollup_region": revenue_rollup_region,
    "events_value_pivot": events_value_pivot,
    "value_percentiles": value_percentiles,
    "approx_users_hll_verified": approx_users_hll_verified,
    "top_terms_heavy_hitters": top_terms_heavy_hitters,
    "events_profile": events_profile,
    "lang_id": lang_id,
    "decontaminate_3gram": decontaminate_3gram,
    "sequence_packing": sequence_packing,
    "tfidf_terms": tfidf_terms,
    "dedup_span_exact": dedup_span_exact,
    "dedup_minhash_verified": dedup_minhash_verified,
    "dedup_simhash_verified": dedup_simhash_verified,
    "similarity_join_docs": similarity_join_docs,
    "lake_time_travel": lake_time_travel,
    "incremental_minhash_verified": incremental_minhash_verified,
    "incremental_embedding_exact": incremental_embedding_exact,
    "ann_pq_verified": ann_pq_verified,
    "multimodal_features": multimodal_features,
    "graph_export_edges": graph_export_edges,
    "graph_pagerank": graph_pagerank,
    "lake_snapshot_diff": lake_snapshot_diff,
    "bpe_learn": bpe_learn,
    "schema_evolution_replay": schema_evolution_replay,
    "bloom_skip_scan": bloom_skip_scan,
    "docs_lm_perplexity": docs_lm_perplexity,
    "events_shuffle_export": events_shuffle_export,
    "inverted_index_terms": inverted_index_terms,
    "semantic_dedup_vecs": semantic_dedup_vecs,
    # --- beyond the gate window: locally gate-checked (tools/check_oracle.py)
    "customers_without_orders": customers_without_orders,
    "events_sample": events_sample,
    "token_stats": token_stats,
    "view_purchase_day_intersect": view_purchase_day_intersect,
    "dedup_exact_prefix": dedup_exact_prefix,
    "purchase_attribution": purchase_attribution,
    "q1_pricing_summary": q1_pricing_summary,
    "url_extract": url_extract,
    "event_value_ranks": event_value_ranks,
    "quality_ratios": quality_ratios,
    "fingerprint": fingerprint,
    "dedup_embedding_exact": dedup_embedding_exact,
    "ann_cosine_topk": ann_cosine_topk,
    "bpe_encode_counts": bpe_encode_counts,
    "ngram_jaccard": ngram_jaccard,
    "cdc_demux_routing": cdc_demux_routing,
    "graph_shortest_paths": graph_shortest_paths,
    "transcript_window_replay": transcript_window_replay,
    "key_skip_scan": key_skip_scan,
    "sql_token_read": sql_token_read,
    "sql_sample_read": sql_sample_read,
    "top_orders": top_orders,
    "customers_per_region": customers_per_region,
    "projection_filter_revenue": projection_filter_revenue,
    "distinct_event_types": distinct_event_types,
    "filter_like": filter_like,
    "token_positions": token_positions,
    "doc_repetition": doc_repetition,
    "text_normalize": text_normalize,
    "pii_redact": pii_redact,
    "dedup_minhash": dedup_minhash,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding": dedup_embedding,
    "events_hourly": events_hourly,
    "lineitem_measures_melt": lineitem_measures_melt,
    "events_value_stats": events_value_stats,
    "busy_users": busy_users,
    "value_bucket_counts": value_bucket_counts,
    "favorite_event_type": favorite_event_type,
    "bloom_filtered_revenue": bloom_filtered_revenue,
    "lineitem_qty_price_corr": lineitem_qty_price_corr,
    "user_event_paths": user_event_paths,
    "transcript_reassembly": transcript_reassembly,
    "customer_order_counts": customer_order_counts,
    "event_value_distribution": event_value_distribution,
    "event_stream_lead_tiles": event_stream_lead_tiles,
    "approx_users_hll": approx_users_hll,
    "daily_users_hll": daily_users_hll,
    "click_except_purchase_days": click_except_purchase_days,
    "top_events_per_type": top_events_per_type,
    "events_hopping": events_hopping,
    "user_running_totals": user_running_totals,
    "user_moving_avg": user_moving_avg,
    "ann_ivf": ann_ivf,
    "events_stratified_sample": events_stratified_sample,
    "embedding_components": embedding_components,
    "orders_by_status": orders_by_status,
    "part_type_stats": part_type_stats,
    "events_daily_users": events_daily_users,
    "graph_khop": graph_khop,
    "graph_components": graph_components,
    "graph_triangles": graph_triangles,
    "lake_replication": lake_replication,
    "index_and_search": index_and_search,
    "events_mixture_sample": events_mixture_sample,
    "events_leakage_split": events_leakage_split,
    "ngram_containment_docs": ngram_containment_docs,
    "events_exact_sample": events_exact_sample,
    "edit_distance_docs": edit_distance_docs,
    "events_value_outliers": events_value_outliers,
    "semi_join_fulfilled": semi_join_fulfilled,
    "docs_bm25_topk": docs_bm25_topk,
    "docs_phrase_search": docs_phrase_search,
    "embedding_kmeans": embedding_kmeans,
    "incremental_dedup": incremental_dedup,
    "events_props_json": events_props_json,
    "orders_status_priority_cube": orders_status_priority_cube,
    "zorder_box_scan": zorder_box_scan,
    "docs_cms_counts": docs_cms_counts,
    "docs_pmi_collocations": docs_pmi_collocations,
    "incremental_lm_perplexity": incremental_lm_perplexity,
    "dedup_keep_best": dedup_keep_best,
}

# The BPE oracle unrolls the learner's merge rounds as chained CTEs (the
# graph_pagerank pattern): round r = pair explosion (zipped-unnest over
# the symbol list), integer pair counts, total-order argmax, one
# replace() application feeding round r+1.
def _bpe_round_sql(r: int) -> str:
    prev = f"w{r - 1}"
    return f"""
        p{r} AS (SELECT string_split(trim(s, '|'), '|') AS ts, f FROM {prev}),
        e{r} AS (SELECT list_extract(ts, i) AS lft, list_extract(ts, i+1) AS rgt, f
                 FROM (SELECT ts, f, unnest(range(1, len(ts))) AS i FROM p{r})),
        c{r} AS (SELECT lft, rgt, CAST(sum(f) AS BIGINT) AS cnt
                 FROM e{r} GROUP BY lft, rgt),
        b{r} AS (SELECT lft, rgt, cnt FROM c{r} ORDER BY cnt DESC, lft, rgt LIMIT 1),
        w{r} AS (SELECT replace(s, '|'||b.lft||'|'||b.rgt||'|',
                                   '|'||b.lft||b.rgt||'|') AS s, f
                 FROM {prev} CROSS JOIN b{r} b)"""


_BPE_LEARNER_CTES = (
    r"""WITH toks AS (SELECT doc_id,
                      unnest(string_split(lower(text), ' ')) AS w FROM documents),
        wf AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM toks
               WHERE regexp_matches(w, '^[a-z0-9]+$') GROUP BY w),
        w0 AS (SELECT '|' || regexp_replace(w, '(.)', '\1|', 'g') AS s, f FROM wf),"""
    + ",".join(_bpe_round_sql(r) for r in range(1, 7))
)

_BPE_LEARN_SQL = (
    _BPE_LEARNER_CTES
    + "\n        "
    + " UNION ALL ".join(
        f"SELECT {r} AS round, lft, rgt, lft||rgt AS merged, cnt AS pair_count FROM b{r}"
        for r in range(1, 7)
    )
    + " ORDER BY round"
)

_BPE_ENCODE_SQL = (
    _BPE_LEARNER_CTES
    + r""",
        dt0 AS (SELECT doc_id, '|' || regexp_replace(w, '(.)', '\1|', 'g') AS s
                FROM toks WHERE regexp_matches(w, '^[a-z0-9]+$')),"""
    + ",".join(
        f"""
        dt{r} AS (SELECT doc_id, replace(s, '|'||b.lft||'|'||b.rgt||'|',
                                            '|'||b.lft||b.rgt||'|') AS s
                  FROM dt{r - 1} CROSS JOIN b{r} b)"""
        for r in range(1, 7)
    )
    + """,
        enc AS (SELECT doc_id,
                       CAST(sum(length(s) - length(replace(s, '|', '')) - 1)
                            AS BIGINT) AS n_bpe_tokens
                FROM dt6 GROUP BY doc_id)
        SELECT d.doc_id, coalesce(e.n_bpe_tokens, 0) AS n_bpe_tokens
        FROM documents d LEFT JOIN enc e USING (doc_id)"""
)

ORACLE_SQL = {
    "bpe_learn": _BPE_LEARN_SQL,
    "bpe_encode_counts": _BPE_ENCODE_SQL,
    "zorder_box_scan": """
        SELECT event_id, user_id, value FROM events
        WHERE user_id >= 2 AND value >= 50 AND value < 60
    """,
    "cdc_demux_routing": """
        SELECT event_id, user_id, value, event_type FROM events
        WHERE event_type = 'purchase'
    """,
    "events_profile": """
        SELECT 'event_id' AS column, count(*) AS n_rows,
               CAST(count(*) - count(event_id) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT event_id) AS BIGINT) AS ndv,
               CAST(min(event_id) AS VARCHAR) AS min_str,
               CAST(max(event_id) AS VARCHAR) AS max_str FROM events
        UNION ALL
        SELECT 'user_id', count(*),
               CAST(count(*) - count(user_id) AS BIGINT),
               CAST(count(DISTINCT user_id) AS BIGINT),
               CAST(min(user_id) AS VARCHAR),
               CAST(max(user_id) AS VARCHAR) FROM events
        UNION ALL
        SELECT 'event_type', count(*),
               CAST(count(*) - count(event_type) AS BIGINT),
               CAST(count(DISTINCT event_type) AS BIGINT),
               min(event_type), max(event_type) FROM events
        UNION ALL
        SELECT 'value', count(*),
               CAST(count(*) - count(value) AS BIGINT),
               CAST(count(DISTINCT value) AS BIGINT),
               CAST(CAST(floor(min(value)*1000+0.5) AS BIGINT) AS VARCHAR),
               CAST(CAST(floor(max(value)*1000+0.5) AS BIGINT) AS VARCHAR)
        FROM events
        UNION ALL
        SELECT 'ts', count(*),
               CAST(count(*) - count(ts) AS BIGINT),
               CAST(count(DISTINCT ts) AS BIGINT),
               strftime(min(ts), '%Y-%m-%d %H:%M:%S'),
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') FROM events
    """,
    # exact-rerank PQ search: output contract identical to brute force
    "ann_pq_verified": """
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                   FROM embeddings WHERE vec_id < 3),
        s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(e.embedding, q.qe) AS sim
              FROM embeddings e CROSS JOIN q),
        r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY sim DESC, neighbor_id) AS rank
              FROM s)
        SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 10
    """,
    "cdc_lww_upsert": """
        WITH tagged AS (
          SELECT *, CASE WHEN event_id % 10 < 6 THEN 'I'
                         WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op
          FROM events),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY event_id DESC) AS rn
          FROM tagged)
        SELECT user_id, event_type, event_id AS last_event_id, value
        FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    # order-free state digest: poly/mix64 HUGEINT replicas of the
    # engine's buffer-level row hash, summed mod 2^64 per logical group —
    # commutative, so partitioning/order never matter
    "lake_state_digest": """
        WITH RECURSIVE pw(k, v) AS (
          SELECT 0, CAST(1 AS HUGEINT)
          UNION ALL SELECT k+1, (v * 1099511628211) % 18446744073709551616
          FROM pw WHERE k < 80
        ),
        src AS (
          SELECT event_id AS seq,
                 CASE WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                 CAST(event_id % 37 AS INTEGER) AS turn_idx,
                 event_type || ' v' || CAST(event_id AS VARCHAR) AS text
          FROM events),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY seq DESC) AS rn
          FROM src),
        state AS (SELECT conv_id, turn_idx, text
                  FROM ranked WHERE rn = 1 AND op <> 'D'),
        rows_s AS (SELECT conv_id,
                          conv_id || chr(31) || CAST(turn_idx AS VARCHAR)
                                  || chr(31) || coalesce(text, '') AS s
                   FROM state),
        cs AS (SELECT conv_id, s, length(s) AS L,
                      unnest(generate_series(1, length(s))) AS p
               FROM rows_s),
        ph AS (SELECT any_value(conv_id) AS conv_id, s,
                      (sum(CAST(ord(substr(s, CAST(p AS INTEGER), 1)) AS HUGEINT)
                           * pw.v) + any_value(L)) % 18446744073709551616 AS u
               FROM cs JOIN pw ON pw.k = cs.L - cs.p + 1
               GROUP BY s),
        cc AS (SELECT DISTINCT conv_id FROM state),
        cs2 AS (SELECT conv_id, length(conv_id) AS L,
                       unnest(generate_series(1, length(conv_id))) AS p
                FROM cc),
        pc2 AS (SELECT conv_id,
                       (sum(CAST(ord(substr(conv_id, CAST(p AS INTEGER), 1)) AS HUGEINT)
                            * pw.v) + any_value(L)) % 18446744073709551616 AS uc
                FROM cs2 JOIN pw ON pw.k = cs2.L - cs2.p + 1
                GROUP BY conv_id),
        hs AS (SELECT (
          SELECT CASE WHEN x2 < 0 THEN x2 + 18446744073709551616 ELSE x2 END
          FROM (SELECT CAST(xor(CAST(CASE WHEN v2 >= 9223372036854775808 THEN v2 - 18446744073709551616 ELSE v2 END AS BIGINT),
                                CAST(CASE WHEN v2 // 8589934592 >= 9223372036854775808 THEN v2 // 8589934592 - 18446744073709551616 ELSE v2 // 8589934592 END AS BIGINT)) AS HUGEINT) AS x2
                FROM (SELECT ((x1 % 4294967296) * 3981806797
                            + (((x1 % 4294967296) * 4283543511
                                + (x1 // 4294967296) * 3981806797) % 4294967296)
                              * 4294967296) % 18446744073709551616 AS v2
                      FROM (SELECT CASE WHEN x0 < 0 THEN x0 + 18446744073709551616 ELSE x0 END AS x1
                            FROM (SELECT CAST(xor(CAST(CASE WHEN ph.u >= 9223372036854775808 THEN ph.u - 18446744073709551616 ELSE ph.u END AS BIGINT),
                                                  CAST(ph.u // 8589934592 AS BIGINT)) AS HUGEINT) AS x0) ) ) ) ) AS h,
                      CAST((
          SELECT CASE WHEN x2 < 0 THEN x2 + 18446744073709551616 ELSE x2 END
          FROM (SELECT CAST(xor(CAST(CASE WHEN v2 >= 9223372036854775808 THEN v2 - 18446744073709551616 ELSE v2 END AS BIGINT),
                                CAST(CASE WHEN v2 // 8589934592 >= 9223372036854775808 THEN v2 // 8589934592 - 18446744073709551616 ELSE v2 // 8589934592 END AS BIGINT)) AS HUGEINT) AS x2
                FROM (SELECT ((x1 % 4294967296) * 3981806797
                            + (((x1 % 4294967296) * 4283543511
                                + (x1 // 4294967296) * 3981806797) % 4294967296)
                              * 4294967296) % 18446744073709551616 AS v2
                      FROM (SELECT CASE WHEN x0 < 0 THEN x0 + 18446744073709551616 ELSE x0 END AS x1
                            FROM (SELECT CAST(xor(CAST(CASE WHEN pc2.uc >= 9223372036854775808 THEN pc2.uc - 18446744073709551616 ELSE pc2.uc END AS BIGINT),
                                                  CAST(pc2.uc // 8589934592 AS BIGINT)) AS HUGEINT) AS x0) ) ) ) ) % 8 AS BIGINT) AS pid
               FROM ph JOIN pc2 USING (conv_id))
        SELECT pid, CAST(count(*) AS BIGINT) AS n_rows,
               CAST((sum(h // 4294967296) * 4294967296
                     + sum(h % 4294967296)) % 18446744073709551616 AS VARCHAR) AS digest
        FROM hs GROUP BY pid
    """,
    "transcript_cdc_replay": """
        WITH src AS (
          SELECT event_id AS seq,
                 CASE WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                 CAST(event_id % 37 AS INTEGER) AS turn_idx,
                 CASE WHEN (event_id % 37) % 2 = 0 THEN 'user'
                      ELSE 'assistant' END AS role,
                 event_type || ' v' || CAST(event_id AS VARCHAR) AS text,
                 CASE WHEN event_id % 5 = 0 THEN 'search'
                      WHEN event_id % 5 = 1 THEN 'python' ELSE NULL END AS tool,
                 ts
          FROM events),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY seq DESC) AS rn
          FROM src)
        SELECT conv_id, turn_idx, role, text, tool,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str, seq
        FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    "conversation_summary_view": """
        WITH src AS (
          SELECT event_id AS seq,
                 CASE WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                 CAST(event_id % 37 AS INTEGER) AS turn_idx,
                 ts
          FROM events),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY seq DESC) AS rn
          FROM src),
        live AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
        SELECT conv_id,
               CAST(count(*) AS BIGINT) AS n_turns,
               CAST(max(seq) AS BIGINT) AS last_seq,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts_str
        FROM live GROUP BY conv_id
    """,
    # multi-version mode: the FULL derived change log survives — every op
    # (deletes included, payload-masked like the engine's tombstones)
    "cdc_changelog_export": """
        WITH src AS (
          SELECT event_id AS seq,
                 CASE WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                 CAST(event_id % 37 AS INTEGER) AS turn_idx,
                 CASE WHEN (event_id % 37) % 2 = 0 THEN 'user'
                      ELSE 'assistant' END AS role,
                 event_type || ' v' || CAST(event_id AS VARCHAR) AS text,
                 CASE WHEN event_id % 5 = 0 THEN 'search'
                      WHEN event_id % 5 = 1 THEN 'python' ELSE NULL END AS tool,
                 ts
          FROM events)
        SELECT conv_id, turn_idx, op,
               CASE WHEN op = 'D' THEN NULL ELSE role END AS role,
               CASE WHEN op = 'D' THEN NULL ELSE text END AS text,
               CASE WHEN op = 'D' THEN NULL ELSE tool END AS tool,
               CASE WHEN op = 'D' THEN NULL
                    ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS ts_str,
               seq
        FROM src
    """,
    "snapshot_cdc_orders": """
        WITH old AS (
          SELECT o_orderkey, o_orderstatus,
                 CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
                      ELSE o_totalprice END AS o_totalprice
          FROM orders WHERE o_orderkey % 11 <> 0),
        new AS (
          SELECT o_orderkey, o_orderstatus, o_totalprice
          FROM orders WHERE o_orderkey % 13 <> 0),
        j AS (
          SELECT coalesce(n.o_orderkey, o.o_orderkey) AS k,
                 n.o_orderkey AS nk, o.o_orderkey AS ok,
                 n.o_orderstatus AS ns, n.o_totalprice AS nt,
                 o.o_orderstatus AS os, o.o_totalprice AS ot
          FROM new n FULL OUTER JOIN old o ON n.o_orderkey = o.o_orderkey)
        SELECT k AS o_orderkey,
               CASE WHEN nk IS NULL THEN NULL ELSE ns END AS o_orderstatus,
               CASE WHEN nk IS NULL THEN NULL ELSE nt END AS o_totalprice,
               CASE WHEN ok IS NULL THEN 'I'
                    WHEN nk IS NULL THEN 'D' ELSE 'U' END AS op
        FROM j
        WHERE ok IS NULL OR nk IS NULL
           OR (ns IS DISTINCT FROM os OR nt IS DISTINCT FROM ot)
    """,
    "scd2_transcripts": """
        WITH src AS (
          SELECT event_id AS seq,
                 CASE WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                 CAST(event_id % 37 AS INTEGER) AS turn_idx,
                 CASE WHEN (event_id % 37) % 2 = 0 THEN 'user'
                      ELSE 'assistant' END AS role,
                 event_type || ' v' || CAST(event_id AS VARCHAR) AS text
          FROM events),
        led AS (
          SELECT *, lead(seq) OVER (PARTITION BY conv_id, turn_idx
                                    ORDER BY seq) AS valid_to_seq
          FROM src)
        SELECT conv_id, turn_idx,
               CASE WHEN op = 'D' THEN NULL ELSE role END AS role,
               CASE WHEN op = 'D' THEN NULL ELSE text END AS text,
               seq AS valid_from_seq, valid_to_seq,
               valid_to_seq IS NULL AS is_current
        FROM led WHERE op <> 'D'
    """,
    # FIXTURES F4 drift reproduced in SQL: segments are 1000-row slices in
    # event_id order; the first max(1, floor(0.4*n_segs)) segments carry no
    # tool column, so the winner's tool is NULL exactly there
    "schema_evolution_replay": """
        WITH n AS (SELECT count(*) AS n,
                          CAST(ceil(count(*) / 1000.0) AS BIGINT) AS n_segs
                   FROM events),
        cutoff AS (SELECT greatest(1, CAST(floor(n_segs * 0.4) AS BIGINT))
                          * 1000 AS rows_no_tool FROM n),
        src AS (
          SELECT event_id AS seq,
                 row_number() OVER (ORDER BY event_id) AS rnk,
                 CASE WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                 CAST(event_id % 37 AS INTEGER) AS turn_idx,
                 CASE WHEN (event_id % 37) % 2 = 0 THEN 'user'
                      ELSE 'assistant' END AS role,
                 event_type || ' v' || CAST(event_id AS VARCHAR) AS text,
                 CASE WHEN event_id % 5 = 0 THEN 'search'
                      WHEN event_id % 5 = 1 THEN 'python' ELSE NULL END AS tool,
                 ts
          FROM events),
        src2 AS (
          SELECT seq, op, conv_id, turn_idx, role, text,
                 CASE WHEN rnk <= (SELECT rows_no_tool FROM cutoff)
                      THEN NULL ELSE tool END AS tool,
                 ts
          FROM src),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY seq DESC) AS rn
          FROM src2)
        SELECT conv_id, turn_idx, role, text, tool,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str, seq
        FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    "lake_time_travel": """
        WITH src AS (
          SELECT event_id AS seq,
                 CASE WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                 CAST(event_id % 37 AS INTEGER) AS turn_idx,
                 CASE WHEN (event_id % 37) % 2 = 0 THEN 'user'
                      ELSE 'assistant' END AS role,
                 event_type || ' v' || CAST(event_id AS VARCHAR) AS text,
                 CASE WHEN event_id % 5 = 0 THEN 'search'
                      WHEN event_id % 5 = 1 THEN 'python' ELSE NULL END AS tool,
                 ts
          FROM events
          WHERE event_id <= (SELECT max(event_id) // 2 FROM events)),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY seq DESC) AS rn
          FROM src)
        SELECT conv_id, turn_idx, role, text, tool,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str, seq
        FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    "transcript_window_replay": """
        WITH src AS (
          SELECT event_id AS seq,
                 CASE WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                 CAST(event_id % 37 AS INTEGER) AS turn_idx,
                 CASE WHEN (event_id % 37) % 2 = 0 THEN 'user'
                      ELSE 'assistant' END AS role,
                 event_type || ' w' || CAST(event_id AS VARCHAR) AS text
          FROM events),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY seq DESC) AS rn
          FROM src)
        SELECT conv_id, turn_idx, role, text, seq
        FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
               floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS sum_base_price,
               floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS sum_disc_price,
               count(l_quantity) AS count_order,
               floor(sum(l_quantity) / count(l_quantity) * 10000 + 0.5) / 10000 AS avg_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "top_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "customers_per_region": """
        SELECT r.r_name,
               count(c.c_custkey) AS n_customers,
               floor(sum(c.c_acctbal) * 100 + 0.5) / 100 AS sum_acctbal,
               floor(sum(c.c_acctbal) / count(c.c_custkey) * 10000 + 0.5) / 10000 AS avg_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    "projection_filter_revenue": """
        SELECT l_orderkey, l_linenumber, l_quantity,
               l_extendedprice * (1 - l_discount) AS revenue
        FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
    """,
    "semi_join_fulfilled": """
        SELECT l_returnflag, count(l_quantity) AS n_items,
               floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        GROUP BY l_returnflag
    """,
    "customers_without_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
    "events_partitioned_roundtrip": """
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               count(value) AS n_events,
               floor(sum(value) * 100 + 0.5) / 100 AS sum_value
        FROM events WHERE event_type = 'click'
        GROUP BY strftime(ts, '%Y-%m-%d')
    """,
    "sql_split_read": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_totalprice > 150000
    """,
    # token slices partition the table: their union IS the filtered scan
    "sql_token_read": """
        SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        FROM customer WHERE c_acctbal > 1000
    """,
    "key_range_scan": """
        SELECT user_id, event_id AS last_event_id, event_type, value
        FROM events
        WHERE user_id >= 2 AND user_id < 12
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY event_id DESC) = 1
    """,
    # skip scan: OR of disjoint key ranges, latest version per key
    "key_skip_scan": """
        SELECT user_id, event_id AS last_event_id, event_type, value
        FROM events
        WHERE (user_id >= 2 AND user_id < 5)
           OR (user_id >= 20 AND user_id < 23)
           OR (user_id >= 9 AND user_id < 12)
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY event_id DESC) = 1
    """,
    # per-interval tsdb slices partition the window: union == filtered scan
    "tsdb_window_read": """
        SELECT event_id, event_type, ts, value FROM events
        WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
          AND ts <  TIMESTAMP '2024-01-05 00:00:00'
          AND event_type IN ('click', 'view')
    """,
    # sample-quantile slices partition the table: union == filtered scan
    "sql_sample_read": """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer WHERE c_acctbal < 9000
    """,
    # non-overlapping substring counts: the replace trick counts exactly
    # what pc.count_substring counts; (score DESC, doc_id ASC) is total
    "search_topk_scroll": """
        SELECT doc_id,
               CAST((length(text) - length(replace(text, 'merge', ''))) / 5
                  + (length(text) - length(replace(text, 'window', ''))) / 6
                  AS BIGINT) AS score
        FROM documents
        WHERE (length(text) - length(replace(text, 'merge', ''))) / 5
            + (length(text) - length(replace(text, 'window', ''))) / 6 > 0
        ORDER BY score DESC, doc_id
        LIMIT 20
    """,
    # post-upsert table state recomputed from the source: rows whose key
    # got a conflicting delta carry the updated value (ON DUPLICATE KEY)
    "sql_writer_roundtrip": """
        SELECT doc_id, lang, source,
               CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000
                    ELSE n_chars END AS n_chars
        FROM documents
    """,
    "distinct_event_types": "SELECT DISTINCT event_type FROM events",
    "transform_chain": """
        SELECT c_custkey, upper(substr(c_name, 1, 8)) AS name8,
               lpad(substr(c_mktsegment, 1, 12), 12, '*') AS seg_pad,
               substr(c_mktsegment, 1, 2) || 'XX' || substr(c_mktsegment, 6) AS seg_repl,
               c_acctbal
        FROM customer WHERE c_acctbal IS NULL OR NOT (c_acctbal > 5000)
    """,
    "url_extract": """
        WITH u AS (
          SELECT p_partkey,
                 'https://parts.example.com/' || replace(p_brand, '#', '-') || '/'
                   || CAST(p_partkey AS VARCHAR) || '?size=' || CAST(p_size AS VARCHAR) AS url
          FROM part)
        SELECT p_partkey,
               split_part(url, '/', 3) AS url_host,
               regexp_extract(url, '^[a-z]+://[^/]+([^?#]*)', 1) AS url_path,
               regexp_extract(url, '[?&]size=([^&#]*)', 1) AS url_size
        FROM u
    """,
    "filter_like": """
        SELECT p_partkey, p_type, p_brand FROM part
        WHERE NOT regexp_full_match(p_type, '.*ECO.*')
    """,
    "cast_roundtrip": """
        SELECT event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
               strftime(ts, '%Y-%m-%d') AS day,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
        FROM events
    """,
    "token_stats": """
        SELECT doc_id, length(text) AS n_chars_calc,
               len(regexp_extract_all(text, '\\S+')) AS n_tokens,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS n_bpe_tokens
        FROM documents
    """,
    "quality_ratios": """
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
                 / greatest(length(text), 1) AS punct_ratio,
               CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                 / greatest(length(text), 1) AS digit_ratio
        FROM documents
    """,
    "fingerprint": "SELECT doc_id, md5(text) AS fp_md5 FROM documents",
    "text_normalize": r"""
        SELECT doc_id,
               nfc_normalize(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS norm,
               CAST(length(nfc_normalize(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS BIGINT) AS n_chars_norm
        FROM documents
    """,
    "pii_redact": r"""
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(
                 text || ' reach user' || CAST(doc_id AS VARCHAR)
                      || '@example.com or 10.2.' || CAST(doc_id % 250 AS VARCHAR)
                      || '.99 call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                 '\+\d[\d-]{7,}\d', '<PHONE>', 'g') AS redacted
        FROM documents
    """,
    "token_positions": """
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
        SELECT doc_id, unnest(range(1, len(ts)+1)) AS pos, unnest(ts) AS tok
        FROM toks
    """,
    "doc_repetition": """
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        counts AS (
          SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok)
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tok,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(max(c) AS BIGINT) AS top_count,
               CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_frac,
               CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS distinct_frac
        FROM counts GROUP BY doc_id
    """,
    "decontaminate_3gram": """
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        pos AS (SELECT doc_id, unnest(range(1, greatest(len(ts)-2, 0)+1)) AS i FROM toks),
        ngr AS (
          SELECT p.doc_id, array_to_string(list_slice(t.ts, p.i, p.i+2), ' ') AS ng
          FROM pos p JOIN toks t ON p.doc_id = t.doc_id),
        bench AS (SELECT DISTINCT ng FROM ngr WHERE doc_id % 13 = 0),
        train AS (SELECT DISTINCT doc_id, ng FROM ngr WHERE doc_id % 13 <> 0)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
        FROM train WHERE ng IN (SELECT ng FROM bench)
        GROUP BY doc_id
    """,
    # CCNet-style unigram LM scoring: per-token log-probs snap to int64
    # micros BEFORE summation (floor(ln·1e6 + 0.5)), so per-doc totals are
    # associative integer sums — ln over one IEEE division is the
    # tfidf-proven cross-engine-exact expression.
    "docs_lm_perplexity": """
        WITH rt AS (
          SELECT term FROM (
            SELECT unnest(string_split(lower(text), ' ')) AS term
            FROM documents WHERE lang = 'en')
          WHERE term <> ''),
        vocab AS (SELECT term, count(*) AS c FROM rt GROUP BY term),
        nv AS (SELECT (SELECT count(*) FROM rt)
                    + (SELECT count(*) FROM vocab) AS denom),
        t2 AS (
          SELECT doc_id, term FROM (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
            FROM documents)
          WHERE term <> ''),
        scored AS (
          SELECT t2.doc_id,
                 CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov,
                 CAST(floor(ln(CAST(coalesce(v.c, 0) + 1 AS DOUBLE)
                               / CAST(nv.denom AS DOUBLE))
                            * 1000000.0 + 0.5) AS BIGINT) AS lp
          FROM t2 LEFT JOIN vocab v USING (term) CROSS JOIN nv),
        agg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(oov) AS BIGINT) AS n_oov,
                 CAST(sum(lp) AS BIGINT) AS logp_micro
          FROM scored GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(a.n_tokens, 0) AS n_tokens,
               coalesce(a.n_oov, 0) AS n_oov,
               coalesce(a.logp_micro, 0) AS logp_micro
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    # mixture sampling: rates derived from per-stratum counts with pure
    # integer arithmetic (floor division), then the stratified keep rule —
    # membership reproduces exactly
    "events_mixture_sample": """
        WITH n AS (SELECT event_type, count(*) AS n FROM events GROUP BY event_type),
        r AS (SELECT event_type,
                     least(1000000, greatest(1, (1000000 * 2000) // n)) AS rate
              FROM n)
        SELECT e.event_id, e.user_id, e.event_type
        FROM events e JOIN r USING (event_type)
        WHERE ((e.event_id % 1000003) * 2654435761) % 1000000 < r.rate
    """,
    "events_exact_sample": """
        WITH u0 AS (SELECT event_id, user_id, event_type, CAST(event_id AS HUGEINT) AS u FROM events),
        x1 AS (SELECT * EXCLUDE (u), CAST(xor(CAST(u AS BIGINT), CAST(u // 8589934592 AS BIGINT)) AS HUGEINT) AS x FROM u0),
        x1u AS (SELECT * EXCLUDE (x), CASE WHEN x < 0 THEN x + 18446744073709551616 ELSE x END AS x FROM x1),
        m AS (SELECT * EXCLUDE (x), ((x % 4294967296) * 3981806797
                    + (((x % 4294967296) * 4283543511
                        + (x // 4294967296) * 3981806797) % 4294967296)
                      * 4294967296) % 18446744073709551616 AS v FROM x1u),
        ms AS (SELECT * EXCLUDE (v), CASE WHEN v >= 9223372036854775808
                              THEN v - 18446744073709551616 ELSE v END AS s,
                      v // 8589934592 AS hi FROM m),
        h2 AS (SELECT * EXCLUDE (s, hi), CAST(xor(CAST(s AS BIGINT),
                               CAST(CASE WHEN hi >= 9223372036854775808
                                         THEN hi - 18446744073709551616
                                         ELSE hi END AS BIGINT)) AS HUGEINT) AS x
               FROM ms),
        hu AS (SELECT * EXCLUDE (x),
                      CASE WHEN x < 0 THEN x + 18446744073709551616 ELSE x END AS h FROM h2),
        ranked AS (SELECT event_id, user_id, event_type,
                          row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
                   FROM hu)
        SELECT event_id, user_id, event_type FROM ranked WHERE rn <= 150
    """,
    "events_leakage_split": """
        WITH u0 AS (SELECT event_id, event_type, CAST(user_id AS HUGEINT) AS u FROM events),
        x1 AS (SELECT event_id, event_type, CAST(xor(CAST(u AS BIGINT), CAST(u // 8589934592 AS BIGINT)) AS HUGEINT) AS x FROM u0),
        x1u AS (SELECT event_id, event_type, CASE WHEN x < 0 THEN x + 18446744073709551616 ELSE x END AS x FROM x1),
        m AS (SELECT event_id, event_type, ((x % 4294967296) * 3981806797
                    + (((x % 4294967296) * 4283543511
                        + (x // 4294967296) * 3981806797) % 4294967296)
                      * 4294967296) % 18446744073709551616 AS v FROM x1u),
        ms AS (SELECT event_id, event_type, CASE WHEN v >= 9223372036854775808
                              THEN v - 18446744073709551616 ELSE v END AS s,
                      v // 8589934592 AS hi FROM m),
        h2 AS (SELECT event_id, event_type, CAST(xor(CAST(s AS BIGINT),
                               CAST(CASE WHEN hi >= 9223372036854775808
                                         THEN hi - 18446744073709551616
                                         ELSE hi END AS BIGINT)) AS HUGEINT) AS x
               FROM ms),
        hu AS (SELECT event_id, event_type,
                      CASE WHEN x < 0 THEN x + 18446744073709551616 ELSE x END AS h FROM h2)
        SELECT CASE WHEN h % 1000 < 100 THEN 'val' ELSE 'train' END AS split,
               event_type, CAST(count(*) AS BIGINT) AS n_rows
        FROM hu GROUP BY 1, 2
    """,
    # mix64 (partition.hash_ints) replicated in HUGEINT arithmetic:
    # logical >>33 = // 2^33, xor through BIGINT two's complement, the
    # 64x64 multiply mod 2^64 via 32-bit split.  Nonnegative keys only.
    "events_shuffle_export": """
        WITH u0 AS (SELECT CAST(event_id AS HUGEINT) AS u FROM events),
        x1 AS (SELECT CAST(xor(CAST(u AS BIGINT), CAST(u // 8589934592 AS BIGINT)) AS HUGEINT) AS x FROM u0),
        x1u AS (SELECT CASE WHEN x < 0 THEN x + 18446744073709551616 ELSE x END AS x FROM x1),
        m AS (SELECT ((x % 4294967296) * 3981806797
                    + (((x % 4294967296) * 4283543511
                        + (x // 4294967296) * 3981806797) % 4294967296)
                      * 4294967296) % 18446744073709551616 AS v FROM x1u),
        ms AS (SELECT CASE WHEN v >= 9223372036854775808
                           THEN v - 18446744073709551616 ELSE v END AS s,
                      v // 8589934592 AS hi FROM m),
        h2 AS (SELECT CAST(xor(CAST(s AS BIGINT),
                               CAST(CASE WHEN hi >= 9223372036854775808
                                         THEN hi - 18446744073709551616
                                         ELSE hi END AS BIGINT)) AS HUGEINT) AS x
               FROM ms),
        hu AS (SELECT CASE WHEN x < 0 THEN x + 18446744073709551616 ELSE x END AS h FROM h2)
        SELECT CAST(h // 576460752303423488 AS BIGINT) AS shard,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(h) AS VARCHAR) AS min_h,
               CAST(max(h) AS VARCHAR) AS max_h
        FROM hu GROUP BY 1
    """,
    "inverted_index_terms": """
        WITH t2 AS (
          SELECT DISTINCT doc_id, term FROM (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
            FROM documents)
          WHERE term <> '')
        SELECT term, CAST(count(*) AS BIGINT) AS df,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        FROM t2 GROUP BY term HAVING count(*) >= 20
    """,
    "index_and_search": """
        WITH t2 AS (
          SELECT DISTINCT doc_id, term FROM (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
            FROM documents)
          WHERE term <> '')
        SELECT doc_id FROM t2 WHERE term IN ('query', 'window', 'merge')
        GROUP BY doc_id HAVING count(*) = 3
    """,
    "incremental_lm_perplexity": """
        WITH rt AS (
          SELECT term FROM (
            SELECT unnest(string_split(lower(text), ' ')) AS term
            FROM documents)
          WHERE term <> ''),
        vocab AS (SELECT term, count(*) AS c FROM rt GROUP BY term),
        nv AS (SELECT (SELECT count(*) FROM rt)
                    + (SELECT count(*) FROM vocab) AS denom),
        t2 AS (
          SELECT doc_id, term FROM (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
            FROM documents)
          WHERE term <> ''),
        scored AS (
          SELECT t2.doc_id,
                 CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov,
                 CAST(floor(ln(CAST(coalesce(v.c, 0) + 1 AS DOUBLE)
                               / CAST(nv.denom AS DOUBLE))
                            * 1000000.0 + 0.5) AS BIGINT) AS lp
          FROM t2 LEFT JOIN vocab v USING (term) CROSS JOIN nv),
        agg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(oov) AS BIGINT) AS n_oov,
                 CAST(sum(lp) AS BIGINT) AS logp_micro
          FROM scored GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(a.n_tokens, 0) AS n_tokens,
               coalesce(a.n_oov, 0) AS n_oov,
               coalesce(a.logp_micro, 0) AS logp_micro
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    "sequence_packing": """
        WITH c AS (
          SELECT doc_id, n_chars,
                 CAST(coalesce(sum(n_chars) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
          FROM documents)
        SELECT cum_before // 4096 AS seq_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM c GROUP BY seq_id
    """,
    # heuristic lang-id IS SQL-expressible: marker-hit ratios are divisions
    # of identical integers (bit-identical doubles in both engines), and the
    # CASE cascade reproduces numpy argmax's first-max tie-break over the
    # language order [en, de, fr, es, zh].
    "lang_id": """
        WITH h AS (
          SELECT doc_id,
                 greatest(len(regexp_extract_all(text, '\\S+')), 1) AS ntok,
                 greatest(length(text), 1) AS nchr,
                 len(regexp_extract_all(text,
                   '\\b(the|and|of|to|in|is|that|for|with|was)\\b')) AS h_en,
                 len(regexp_extract_all(text,
                   '\\b(der|die|das|und|ist|nicht|ein|mit|für|auf)\\b')) AS h_de,
                 len(regexp_extract_all(text,
                   '\\b(le|la|les|des|est|une|dans|pour|que|avec)\\b')) AS h_fr,
                 len(regexp_extract_all(text,
                   '\\b(el|los|las|una|es|en|por|para|con|del)\\b')) AS h_es,
                 len(regexp_extract_all(text, '[一-鿿]')) AS h_zh
          FROM documents),
        sc AS (
          SELECT doc_id,
                 CAST(h_en AS DOUBLE) / ntok AS s_en,
                 CAST(h_de AS DOUBLE) / ntok AS s_de,
                 CAST(h_fr AS DOUBLE) / ntok AS s_fr,
                 CAST(h_es AS DOUBLE) / ntok AS s_es,
                 CAST(h_zh AS DOUBLE) / nchr AS s_zh
          FROM h)
        SELECT doc_id,
               CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN NULL
                    WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es
                         AND s_en >= s_zh THEN 'en'
                    WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
                    WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
                    WHEN s_es >= s_zh THEN 'es'
                    ELSE 'zh' END AS lang_pred
        FROM sc
    """,
    "dedup_exact_prefix": """
        SELECT min(doc_id) AS doc_id, count(doc_id) AS n_copies
        FROM documents GROUP BY substr(lower(text), 1, 20)
    """,
    # fuzzy join == ALL cross-side pairs at exact 5-gram Jaccard >= 0.5
    # (certifies LSH blocking recall at gate scale, precision always)
    "similarity_join_docs": """
        WITH idx AS (
          SELECT doc_id, text,
                 unnest(generate_series(1, greatest(length(text) - 4, 0))) AS i
          FROM documents),
        g AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS gram FROM idx),
        sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        inter AS (
          SELECT ga.doc_id AS a, gb.doc_id AS b, count(*) AS ni
          FROM g ga JOIN g gb ON ga.gram = gb.gram
          WHERE ga.doc_id % 2 = 0 AND gb.doc_id % 2 = 1
          GROUP BY 1, 2)
        SELECT i.a, i.b,
               CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.a
        JOIN sizes sb ON sb.doc_id = i.b
        WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= 0.5
    """,
    # SFT example assembly over the derived live transcripts: context =
    # budget-truncated suffix of preceding "role: text" lines (DESC window
    # cumsum <= 200 joined chars), target = the assistant turn's text
    "sft_context_assembly": """
        WITH src AS (
          SELECT event_id AS seq,
                 CASE WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                 CAST(event_id % 37 AS INTEGER) AS turn_idx,
                 CASE WHEN (event_id % 37) % 2 = 0 THEN 'user'
                      ELSE 'assistant' END AS role,
                 event_type || ' v' || CAST(event_id AS VARCHAR) AS text
          FROM events),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY seq DESC) AS rn
          FROM src),
        live AS (SELECT conv_id, turn_idx, role, text
                 FROM ranked WHERE rn = 1 AND op <> 'D'),
        lines AS (SELECT conv_id, turn_idx, role || ': ' || text AS line
                  FROM live),
        pairs AS (
          SELECT t.conv_id, t.turn_idx AS tgt, l.turn_idx AS src_turn,
                 l.line, length(l.line) AS ln
          FROM live t JOIN lines l
            ON l.conv_id = t.conv_id AND l.turn_idx < t.turn_idx
          WHERE t.role = 'assistant'),
        win AS (
          SELECT *, sum(ln + 1) OVER (PARTITION BY conv_id, tgt
                                      ORDER BY src_turn DESC) - 1 AS cost
          FROM pairs),
        ctx AS (SELECT conv_id, tgt,
                       string_agg(line, chr(10) ORDER BY src_turn) AS context,
                       CAST(count(*) AS BIGINT) AS n_context
                FROM win WHERE cost <= 200 GROUP BY conv_id, tgt)
        SELECT t.conv_id, t.turn_idx, coalesce(c.context, '') AS context,
               t.text AS target,
               coalesce(c.n_context, 0) AS n_context
        FROM live t LEFT JOIN ctx c
          ON c.conv_id = t.conv_id AND c.tgt = t.turn_idx
        WHERE t.role = 'assistant'
    """,
    # bloom-pruned equality scan == full scan (the exact filter removes
    # bloom false positives; pruning only changes I/O)
    "bloom_skip_scan": """
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents WHERE lang = 'fr' GROUP BY source
    """,
    # exact substring dedup: hot 8-grams (>=2 occurrences, >=2 docs) ->
    # DISTINCT covered positions -> anti-join tokens -> string_agg rebuild
    "dedup_span_exact": """
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        pos AS (SELECT doc_id, unnest(range(1, greatest(len(ts)-7, 0)+1)) AS i FROM toks),
        ngr AS (SELECT p.doc_id, p.i,
                       array_to_string(list_slice(t.ts, p.i, p.i+7), ' ') AS ng
                FROM pos p JOIN toks t USING (doc_id)),
        hot AS (SELECT ng FROM ngr GROUP BY ng
                HAVING count(*) >= 2 AND count(DISTINCT doc_id) >= 2),
        cov AS (SELECT DISTINCT g.doc_id, g.i + o.o AS p
                FROM ngr g JOIN hot USING (ng)
                CROSS JOIN (SELECT unnest(range(0, 8)) AS o) o),
        tp AS (SELECT doc_id, unnest(range(1, len(ts)+1)) AS p FROM toks),
        tk AS (SELECT tp.doc_id, tp.p, t.ts[CAST(tp.p AS INTEGER)] AS tok
               FROM tp JOIN toks t USING (doc_id)),
        surv AS (SELECT tk.doc_id,
                        string_agg(tk.tok, ' ' ORDER BY tk.p) AS text_clean,
                        count(*) AS n_kept
                 FROM tk ANTI JOIN cov ON tk.doc_id = cov.doc_id AND tk.p = cov.p
                 GROUP BY tk.doc_id)
        SELECT t.doc_id, CAST(len(t.ts) AS BIGINT) AS n_tokens,
               CAST(len(t.ts) - coalesce(s.n_kept, 0) AS BIGINT) AS n_removed,
               coalesce(s.text_clean, '') AS text_clean
        FROM toks t LEFT JOIN surv s USING (doc_id)
    """,
    # unrolled Lloyd's rounds (the bpe_learn discipline): centroids are
    # micro-snapped between rounds in BOTH engines, so assignments agree
    "embedding_kmeans": """
        WITH e AS (
          SELECT vec_id, unnest(range(1, len(embedding)+1)) AS pos,
                 CAST(unnest(embedding) AS DOUBLE) AS comp
          FROM embeddings),
        c0 AS (
          SELECT r - 1 AS c, pos,
                 floor(comp * 1000000 + 0.5) / 1000000 AS comp
          FROM (SELECT dense_rank() OVER (ORDER BY vec_id) AS r, pos, comp
                FROM e WHERE vec_id IN (SELECT vec_id FROM embeddings
                                        ORDER BY vec_id LIMIT 4))),
        d1 AS (
          SELECT e.vec_id, c.c,
                 sum(CAST(floor((e.comp - c.comp) * (e.comp - c.comp)
                                * 1000000 + 0.5) AS BIGINT)) AS dist
          FROM e JOIN c0 c ON e.pos = c.pos
          GROUP BY e.vec_id, c.c),
        a1 AS (
          SELECT vec_id, c FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY dist, c) AS rn
            FROM d1)
          WHERE rn = 1),
        cnt1 AS (SELECT c, count(*) AS n FROM a1 GROUP BY c),
        c1 AS (
          SELECT a.c, e.pos,
                 floor(sum(CAST(floor(e.comp * 1000000 + 0.5) AS BIGINT))
                       / count(*) + 0.5) / 1000000 AS comp
          FROM e JOIN a1 a USING (vec_id)
          GROUP BY a.c, e.pos),
        d2 AS (
          SELECT e.vec_id, c.c,
                 sum(CAST(floor((e.comp - c.comp) * (e.comp - c.comp)
                                * 1000000 + 0.5) AS BIGINT)) AS dist
          FROM e JOIN c1 c ON e.pos = c.pos
          GROUP BY e.vec_id, c.c),
        a2 AS (
          SELECT vec_id, c FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY dist, c) AS rn
            FROM d2)
          WHERE rn = 1),
        cnt2 AS (SELECT c, count(*) AS n FROM a2 GROUP BY c),
        c2 AS (
          SELECT a.c, e.pos,
                 floor(sum(CAST(floor(e.comp * 1000000 + 0.5) AS BIGINT))
                       / count(*) + 0.5) / 1000000 AS comp
          FROM e JOIN a2 a USING (vec_id)
          GROUP BY a.c, e.pos)
        SELECT c2.c AS cluster, c2.pos,
               CAST(floor(c2.comp * 1000000 + 0.5) AS BIGINT) AS comp_micro,
               CAST(cnt2.n AS BIGINT) AS n
        FROM c2 JOIN cnt2 USING (c)
    """,
    "semantic_dedup_vecs": """
        WITH dropped AS (
          SELECT DISTINCT b.vec_id AS v
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35)
        SELECT vec_id FROM embeddings
        WHERE vec_id NOT IN (SELECT v FROM dropped)
    """,
    "ngram_containment_docs": """
        WITH pairs AS (
          SELECT d.doc_id AS a, d.doc_id + 1 AS b
          FROM documents d
          WHERE d.doc_id % 25 = 0
            AND EXISTS (SELECT 1 FROM documents e WHERE e.doc_id = d.doc_id + 1)),
        need AS (SELECT a AS x FROM pairs UNION SELECT b FROM pairs),
        idx AS (
          SELECT d.doc_id, d.text,
                 unnest(generate_series(1, greatest(length(d.text) - 4, 0))) AS i
          FROM documents d JOIN need ON d.doc_id = need.x),
        g AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS gram FROM idx),
        sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        inter AS (
          SELECT p.a, p.b, count(*) AS ni
          FROM pairs p
          JOIN g ga ON ga.doc_id = p.a
          JOIN g gb ON gb.doc_id = p.b AND gb.gram = ga.gram
          GROUP BY p.a, p.b)
        SELECT p.a, p.b,
               CASE WHEN coalesce(sa.n, 0) = 0 THEN 0.0
                    ELSE CAST(coalesce(i.ni, 0) AS DOUBLE) / sa.n END AS contain_a,
               CASE WHEN coalesce(sb.n, 0) = 0 THEN 0.0
                    ELSE CAST(coalesce(i.ni, 0) AS DOUBLE) / sb.n END AS contain_b
        FROM pairs p
        LEFT JOIN sizes sa ON sa.doc_id = p.a
        LEFT JOIN sizes sb ON sb.doc_id = p.b
        LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
    """,
    "edit_distance_docs": """
        WITH pairs AS (
          SELECT d.doc_id AS a, d.doc_id + 1 AS b
          FROM documents d
          WHERE d.doc_id % 25 = 0
            AND EXISTS (SELECT 1 FROM documents e WHERE e.doc_id = d.doc_id + 1))
        SELECT p.a, p.b,
               CAST(levenshtein(coalesce(da.text, ''),
                                coalesce(db.text, '')) AS BIGINT) AS edit_dist
        FROM pairs p
        JOIN documents da ON da.doc_id = p.a
        JOIN documents db ON db.doc_id = p.b
    """,
    # the CMS sketch rebuilt in SQL: identical poly+mix64 hash chain,
    # identical slot arithmetic — estimates (collisions included) match
    "docs_cms_counts": """
        WITH RECURSIVE pw(k, v) AS (
          SELECT 0, CAST(1 AS HUGEINT)
          UNION ALL SELECT k+1, (v * 1099511628211) % 18446744073709551616
          FROM pw WHERE k < 80
        ),
        toks AS (
          SELECT term FROM (
            SELECT unnest(string_split(lower(text), ' ')) AS term
            FROM documents)
          WHERE term <> ''),
        tf AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
        ap AS (SELECT term FROM tf
               UNION SELECT unnest(['query', 'window', 'merge', 'xyzzy'])),
        cs AS (SELECT term, length(term) AS L,
                      unnest(generate_series(1, length(term))) AS p
               FROM ap),
        ph AS (SELECT term,
                      (sum(CAST(ord(substr(term, CAST(p AS INTEGER), 1)) AS HUGEINT)
                           * pw.v) + any_value(L)) % 18446744073709551616 AS up
               FROM cs JOIN pw ON pw.k = cs.L - cs.p + 1
               GROUP BY term),
        hu AS (SELECT term, (
          SELECT CASE WHEN x2 < 0 THEN x2 + 18446744073709551616 ELSE x2 END
          FROM (SELECT CAST(xor(CAST(CASE WHEN v2 >= 9223372036854775808 THEN v2 - 18446744073709551616 ELSE v2 END AS BIGINT),
                                CAST(CASE WHEN v2 // 8589934592 >= 9223372036854775808 THEN v2 // 8589934592 - 18446744073709551616 ELSE v2 // 8589934592 END AS BIGINT)) AS HUGEINT) AS x2
                FROM (SELECT ((x1 % 4294967296) * 3981806797
                            + (((x1 % 4294967296) * 4283543511
                                + (x1 // 4294967296) * 3981806797) % 4294967296)
                              * 4294967296) % 18446744073709551616 AS v2
                      FROM (SELECT CASE WHEN x0 < 0 THEN x0 + 18446744073709551616 ELSE x0 END AS x1
                            FROM (SELECT CAST(xor(CAST(CASE WHEN ph.up >= 9223372036854775808 THEN ph.up - 18446744073709551616 ELSE ph.up END AS BIGINT),
                                                  CAST(ph.up // 8589934592 AS BIGINT)) AS HUGEINT) AS x0) ) ) ) ) AS u FROM ph),
        hs AS (SELECT term,
                      CAST((
          SELECT CASE WHEN x2 < 0 THEN x2 + 18446744073709551616 ELSE x2 END
          FROM (SELECT CAST(xor(CAST(CASE WHEN v2 >= 9223372036854775808 THEN v2 - 18446744073709551616 ELSE v2 END AS BIGINT),
                                CAST(CASE WHEN v2 // 8589934592 >= 9223372036854775808 THEN v2 // 8589934592 - 18446744073709551616 ELSE v2 // 8589934592 END AS BIGINT)) AS HUGEINT) AS x2
                FROM (SELECT ((x1 % 4294967296) * 3981806797
                            + (((x1 % 4294967296) * 4283543511
                                + (x1 // 4294967296) * 3981806797) % 4294967296)
                              * 4294967296) % 18446744073709551616 AS v2
                      FROM (SELECT CASE WHEN x0 < 0 THEN x0 + 18446744073709551616 ELSE x0 END AS x1
                            FROM (SELECT CAST(xor(CAST(CASE WHEN ((hu.u + 11400714819323198485) % 18446744073709551616) >= 9223372036854775808 THEN ((hu.u + 11400714819323198485) % 18446744073709551616) - 18446744073709551616 ELSE ((hu.u + 11400714819323198485) % 18446744073709551616) END AS BIGINT),
                                                  CAST(((hu.u + 11400714819323198485) % 18446744073709551616) // 8589934592 AS BIGINT)) AS HUGEINT) AS x0) ) ) ) ) % 1024 AS BIGINT) AS s0,
                      CAST((
          SELECT CASE WHEN x2 < 0 THEN x2 + 18446744073709551616 ELSE x2 END
          FROM (SELECT CAST(xor(CAST(CASE WHEN v2 >= 9223372036854775808 THEN v2 - 18446744073709551616 ELSE v2 END AS BIGINT),
                                CAST(CASE WHEN v2 // 8589934592 >= 9223372036854775808 THEN v2 // 8589934592 - 18446744073709551616 ELSE v2 // 8589934592 END AS BIGINT)) AS HUGEINT) AS x2
                FROM (SELECT ((x1 % 4294967296) * 3981806797
                            + (((x1 % 4294967296) * 4283543511
                                + (x1 // 4294967296) * 3981806797) % 4294967296)
                              * 4294967296) % 18446744073709551616 AS v2
                      FROM (SELECT CASE WHEN x0 < 0 THEN x0 + 18446744073709551616 ELSE x0 END AS x1
                            FROM (SELECT CAST(xor(CAST(CASE WHEN ((hu.u + 14029467366897019727) % 18446744073709551616) >= 9223372036854775808 THEN ((hu.u + 14029467366897019727) % 18446744073709551616) - 18446744073709551616 ELSE ((hu.u + 14029467366897019727) % 18446744073709551616) END AS BIGINT),
                                                  CAST(((hu.u + 14029467366897019727) % 18446744073709551616) // 8589934592 AS BIGINT)) AS HUGEINT) AS x0) ) ) ) ) % 1024 AS BIGINT) AS s1
               FROM hu),
        sk0 AS (SELECT hs.s0 AS slot, sum(tf.c) AS n
                FROM tf JOIN hs USING (term) GROUP BY hs.s0),
        sk1 AS (SELECT hs.s1 AS slot, sum(tf.c) AS n
                FROM tf JOIN hs USING (term) GROUP BY hs.s1)
        SELECT p.term,
               CAST(least(coalesce(k0.n, 0), coalesce(k1.n, 0)) AS BIGINT) AS est
        FROM (SELECT unnest(['query', 'window', 'merge', 'xyzzy']) AS term) p
        JOIN hs USING (term)
        LEFT JOIN sk0 k0 ON k0.slot = hs.s0
        LEFT JOIN sk1 k1 ON k1.slot = hs.s1
    """,
    "docs_pmi_collocations": """
        WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ts
                      FROM documents),
        tp AS (SELECT doc_id, unnest(range(1, len(ts)+1)) AS pos,
                      unnest(ts) AS tok
               FROM toks),
        prs AS (
          SELECT least(x.tok, y.tok) AS a, greatest(x.tok, y.tok) AS b
          FROM tp x JOIN tp y ON x.doc_id = y.doc_id
                            AND y.pos - x.pos BETWEEN 1 AND 3
          WHERE x.tok <> '' AND y.tok <> ''),
        cab AS (SELECT a, b, count(*) AS c_ab FROM prs GROUP BY a, b),
        uni AS (SELECT tok AS term, count(*) AS c FROM tp
                WHERE tok <> '' GROUP BY tok),
        tt AS (SELECT CAST((SELECT count(*) FROM tp WHERE tok <> '') AS DOUBLE) AS t,
                      CAST((SELECT count(*) FROM prs) AS DOUBLE) AS p),
        scored AS (
          SELECT cab.a, cab.b, CAST(cab.c_ab AS BIGINT) AS c_ab,
                 CAST(floor(ln((CAST(cab.c_ab AS DOUBLE) * tt.t * tt.t)
                               / (tt.p * ua.c * ub.c))
                            * 1000000.0 + 0.5) AS BIGINT) AS pmi_micro
          FROM cab
          JOIN uni ua ON ua.term = cab.a
          JOIN uni ub ON ub.term = cab.b
          CROSS JOIN tt
          WHERE cab.c_ab >= 5),
        ranked AS (SELECT *, row_number() OVER (ORDER BY pmi_micro DESC,
                                                a ASC, b ASC) AS rank
                   FROM scored)
        SELECT a, b, c_ab, pmi_micro, CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= 20
    """,
    "docs_bm25_topk": """
        WITH toks AS (
          SELECT doc_id, term FROM (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
            FROM documents)
          WHERE term <> ''),
        dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*) FROM dl) AS n,
                         CAST((SELECT count(*) FROM toks) AS DOUBLE)
                           / (SELECT count(*) FROM dl) AS avglen),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
               WHERE term IN ('query', 'window', 'merge')
               GROUP BY doc_id, term),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        contrib AS (
          SELECT tf.doc_id,
                 CAST(floor(
                   ln((CAST(s.n AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
                      / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
                   * ((CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
                      / (CAST(tf.tf AS DOUBLE)
                         + 1.2 * (1.0 - 0.75
                                  + 0.75 * (CAST(dl.dl AS DOUBLE) / s.avglen))))
                   * 1000000.0 + 0.5) AS BIGINT) AS c
          FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
          CROSS JOIN stats s),
        scored AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS score_micro
                   FROM contrib GROUP BY doc_id),
        ranked AS (SELECT *, row_number() OVER (ORDER BY score_micro DESC,
                                                doc_id ASC) AS rn
                   FROM scored)
        SELECT doc_id, score_micro FROM ranked WHERE rn <= 15
    """,
    "docs_phrase_search": """
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        tp AS (SELECT doc_id, unnest(range(1, len(ts)+1)) AS pos,
                      unnest(ts) AS tok
               FROM toks)
        SELECT DISTINCT a.doc_id
        FROM tp a JOIN tp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        WHERE a.tok = 'order' AND b.tok = 'fast'
    """,
    "ngram_jaccard": """
        WITH pairs AS (
          SELECT d.doc_id AS a, d.doc_id + 1 AS b
          FROM documents d
          WHERE d.doc_id % 25 = 0
            AND EXISTS (SELECT 1 FROM documents e WHERE e.doc_id = d.doc_id + 1)),
        need AS (SELECT a AS x FROM pairs UNION SELECT b FROM pairs),
        idx AS (
          SELECT d.doc_id, d.text,
                 unnest(generate_series(1, greatest(length(d.text) - 4, 0))) AS i
          FROM documents d JOIN need ON d.doc_id = need.x),
        g AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS gram FROM idx),
        sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        inter AS (
          SELECT p.a, p.b, count(*) AS ni
          FROM pairs p
          JOIN g ga ON ga.doc_id = p.a
          JOIN g gb ON gb.doc_id = p.b AND gb.gram = ga.gram
          GROUP BY p.a, p.b)
        SELECT p.a, p.b,
               CASE WHEN coalesce(sa.n, 0) + coalesce(sb.n, 0)
                         - coalesce(i.ni, 0) = 0 THEN 0.0
                    ELSE CAST(coalesce(i.ni, 0) AS DOUBLE)
                         / (coalesce(sa.n, 0) + coalesce(sb.n, 0)
                            - coalesce(i.ni, 0)) END AS jaccard
        FROM pairs p
        LEFT JOIN sizes sa ON sa.doc_id = p.a
        LEFT JOIN sizes sb ON sb.doc_id = p.b
        LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
    """,
    # ALL-pairs exact char-5-gram Jaccard >= 0.6: certifies the engine's
    # LSH-candidate + exact-verify path end to end (precision exactly,
    # recall at this corpus scale)
    "dedup_minhash_verified": """
        WITH idx AS (
          SELECT doc_id, text,
                 unnest(generate_series(1, greatest(length(text) - 4, 0))) AS i
          FROM documents),
        g AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS gram FROM idx),
        sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        inter AS (
          SELECT ga.doc_id AS a, gb.doc_id AS b, count(*) AS ni
          FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id
          GROUP BY 1, 2)
        SELECT i.a, i.b,
               CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.a
        JOIN sizes sb ON sb.doc_id = i.b
        WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= 0.6
    """,
    # the engine's 64-bit SimHash recomputed in pure SQL: mod-2^64
    # polynomial token hash (HUGEINT), splitmix-style multiply via 32-bit
    # split (a full 64×64 product overflows HUGEINT), xor through BIGINT
    # two's complement, per-bit signed sums, signatures packed as two
    # 32-bit halves, ALL-pairs hamming via bit_count(xor) — any pair with
    # hamming ≤ 3 shares one of four 16-bit bands (pigeonhole), so the
    # engine's banded candidates are provably complete and the row is
    # exactly comparable
    # components over the ALL-pairs exact-Jaccard relation (recursive
    # CTE, min-label), then the quality argmax (longest text, ties to
    # smallest id)
    "dedup_keep_best": """
        WITH RECURSIVE idx AS (
          SELECT d.doc_id, d.text, d.n_chars,
                 unnest(generate_series(1, greatest(length(d.text) - 4, 0))) AS i
          FROM documents d),
        g AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS gram FROM idx),
        sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        inter AS (
          SELECT ga.doc_id AS a, gb.doc_id AS b, count(*) AS ni
          FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id
          GROUP BY 1, 2),
        prs AS (
          SELECT i.a, i.b
          FROM inter i
          JOIN sizes sa ON sa.doc_id = i.a
          JOIN sizes sb ON sb.doc_id = i.b
          WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= 0.6),
        edges AS (SELECT a AS src, b AS dst FROM prs
                  UNION SELECT b, a FROM prs),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        reach(node, lbl) AS (
          SELECT node, node FROM nodes
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
        comp AS (SELECT node, min(lbl) AS c FROM reach GROUP BY node),
        best AS (
          SELECT c, node AS best_id FROM (
            SELECT comp.c, comp.node,
                   row_number() OVER (PARTITION BY comp.c
                                      ORDER BY d.n_chars DESC, comp.node ASC) AS rn
            FROM comp JOIN documents d ON d.doc_id = comp.node)
          WHERE rn = 1)
        SELECT comp.node AS doc_id, best.best_id AS canonical_id,
               comp.node = best.best_id AS keep
        FROM comp JOIN best USING (c)
    """,
    "dedup_simhash_verified": r"""
        WITH RECURSIVE p2(k, v) AS (
          SELECT 0, CAST(1 AS HUGEINT) UNION ALL SELECT k+1, v*2 FROM p2 WHERE k < 63
        ),
        pw(k, v) AS (
          SELECT 0, CAST(1 AS HUGEINT)
          UNION ALL
          SELECT k+1, (v * 1099511628211) % 18446744073709551616
          FROM pw WHERE k < 2048
        ),
        toks AS (
          SELECT doc_id, tok
          FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
                FROM documents
                WHERE regexp_matches(text, '\S')
                  AND octet_length(encode(text)) = length(text))
          WHERE tok <> ''
        ),
        tok1 AS (SELECT row_number() OVER () AS tid, doc_id, tok,
                        length(tok) AS L FROM toks),
        chars AS (
          SELECT t.tid, t.doc_id, t.L,
                 CAST(ord(substr(t.tok, CAST(p AS INTEGER), 1)) AS HUGEINT) AS b,
                 t.L - CAST(p AS INTEGER) + 1 AS e
          FROM tok1 t, unnest(range(1, t.L + 1)) AS u(p)
        ),
        thash AS (
          SELECT c.tid, c.doc_id,
                 (SUM(c.b * pw.v) + ANY_VALUE(c.L)) % 18446744073709551616 AS h
          FROM chars c JOIN pw ON pw.k = c.e
          GROUP BY c.tid, c.doc_id
        ),
        mixed AS (
          SELECT tid, doc_id,
            (
              (((h + 11) % 18446744073709551616) % 4294967296) * 11400714819323198485
              + (((((h + 11) % 18446744073709551616) // 4294967296)
                  * 11400714819323198485) % 4294967296) * 4294967296
            ) % 18446744073709551616 AS th0
          FROM thash
        ),
        thu AS (
          SELECT tid, doc_id,
            CAST(xor(
              CAST(CASE WHEN th0 >= 9223372036854775808
                        THEN th0 - 18446744073709551616 ELSE th0 END AS BIGINT),
              CAST(th0 // 536870912 AS BIGINT)
            ) AS BIGINT) AS ths
          FROM mixed
        ),
        thb AS (
          SELECT tid, doc_id,
            CASE WHEN ths < 0 THEN CAST(ths AS HUGEINT) + 18446744073709551616
                 ELSE CAST(ths AS HUGEINT) END AS u
          FROM thu
        ),
        bits AS (
          SELECT t.doc_id, CAST(bt AS INTEGER) AS bit,
                 CASE WHEN SUM(CASE WHEN (t.u // p2.v) % 2 = 1
                                    THEN 1 ELSE -1 END) > 0
                      THEN 1 ELSE 0 END AS db
          FROM thb t, unnest(range(0, 64)) AS r(bt)
          JOIN p2 ON p2.k = bt
          GROUP BY t.doc_id, bt
        ),
        sigs AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN bit < 32
                               THEN db * CAST(p2.v AS BIGINT) ELSE 0 END) AS BIGINT) AS lo,
                 CAST(SUM(CASE WHEN bit >= 32
                               THEN db * CAST(p2.v AS BIGINT) ELSE 0 END) AS BIGINT) AS hi
          FROM bits JOIN p2 ON p2.k = bit % 32
          GROUP BY doc_id
        )
        SELECT a.doc_id AS a, b.doc_id AS b,
               CAST(bit_count(xor(a.lo, b.lo))
                    + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS hamming
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
    """,
    # export + nested-extraction round trip recomputed from the source table
    "jsonl_doc_roundtrip": """
        SELECT lang, source,
               CAST(count(n_chars) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY lang, source
    """,
    # exact cosine-threshold self-join: DuckDB scores every pair, the
    # engine scores block pairs — same float64 arithmetic, same set
    "dedup_embedding_exact": """
        SELECT e1.vec_id AS a, e2.vec_id AS b
        FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
        WHERE list_cosine_similarity(e1.embedding, e2.embedding) >= 0.35
    """,
    # decode round-trip: every decoded column is a pure function of the
    # source documents row (media_from_documents' generative rule)
    "multimodal_features": """
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'image'
                               WHEN 1 THEN 'audio'
                               ELSE 'video' END AS dec_kind,
               TRUE AS decoded_ok,
               CAST(16 + (doc_id * 37) % 240 AS INTEGER) AS dec_width,
               CAST(16 + (doc_id * 53) % 240 AS INTEGER) AS dec_height,
               CAST(coalesce(octet_length(encode(text)), 0) AS BIGINT) AS dec_bytes
        FROM documents
    """,
    "events_props_json": """
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
               CAST(count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS n
        FROM events GROUP BY event_type
    """,
    "events_hourly": """
        SELECT user_id, date_trunc('hour', ts) AS window,
               count(value) AS n_events, floor(sum(value) * 100 + 0.5) / 100 AS sum_value
        FROM events GROUP BY user_id, date_trunc('hour', ts)
    """,
    "user_sessions": """
        WITH o AS (
          SELECT user_id, ts,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
          FROM events)
        SELECT user_id,
               CAST(sum(CASE WHEN prev IS NULL
                        OR (epoch(ts) - epoch(prev)) > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
               count(ts) AS n_events
        FROM o GROUP BY user_id
    """,
    "asof_latest_purchase": """
        SELECT l.event_id, l.user_id, l.value,
               r.event_id AS purchase_id, r.value AS purchase_value
        FROM (SELECT * FROM events WHERE event_type IN ('click', 'view')) l
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    "lineitem_measures_melt": """
        WITH long AS (
          SELECT l_orderkey, 'l_quantity' AS measure,
                 CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS cents,
                 l_quantity AS v FROM lineitem
          UNION ALL SELECT l_orderkey, 'l_extendedprice',
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT),
                 l_extendedprice FROM lineitem
          UNION ALL SELECT l_orderkey, 'l_discount',
                 CAST(floor(l_discount * 100 + 0.5) AS BIGINT),
                 l_discount FROM lineitem
          UNION ALL SELECT l_orderkey, 'l_tax',
                 CAST(floor(l_tax * 100 + 0.5) AS BIGINT),
                 l_tax FROM lineitem)
        SELECT measure, count(v) AS n_rows,
               CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM long GROUP BY measure
    """,
    "events_value_pivot": """
        WITH src AS (
          SELECT user_id, event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events)
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'click' THEN cents END) AS BIGINT) AS click,
               CAST(sum(CASE WHEN event_type = 'view' THEN cents END) AS BIGINT) AS view,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN cents END) AS BIGINT) AS purchase
        FROM src GROUP BY user_id
    """,
    "event_value_distribution": """
        WITH src AS (
          SELECT event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events)
        SELECT event_type, cents,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume
        FROM src
        WINDOW w AS (PARTITION BY event_type ORDER BY cents)
    """,
    "event_stream_lead_tiles": """
        WITH src AS (
          SELECT event_type, event_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events)
        SELECT event_type, event_id, cents,
               lead(cents) OVER w AS next_cents,
               ntile(4) OVER w AS tile,
               first_value(cents) OVER w AS first_cents,
               last_value(cents) OVER (PARTITION BY event_type
                                       ORDER BY event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND UNBOUNDED FOLLOWING) AS last_cents
        FROM src
        WINDOW w AS (PARTITION BY event_type ORDER BY event_id)
    """,
    "events_sample": """
        SELECT event_id, user_id, event_type
        FROM events
        WHERE ((event_id % 1000003) * 2654435761) % 1000 < 50
    """,
    "event_value_ranks": """
        WITH src AS (
          SELECT event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events)
        SELECT event_type, cents,
               rank() OVER (PARTITION BY event_type ORDER BY cents) AS rnk,
               dense_rank() OVER (PARTITION BY event_type ORDER BY cents) AS drnk
        FROM src
    """,
    "customer_order_counts": """
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer
        LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders
                   WHERE o_orderstatus = 'F') o
          ON o.o_custkey = c_custkey
        GROUP BY c_custkey
    """,
    "view_purchase_day_intersect": """
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'view'
        INTERSECT
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'purchase'
    """,
    "click_except_purchase_days": """
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'purchase'
    """,
    "value_bucket_counts": """
        WITH b(bucket, lo, hi) AS (VALUES
          ('low', 0, 1000), ('mid', 1000, 10000),
          ('high', 10000, 1000000000)),
        src AS (
          SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events)
        SELECT bucket, count(cents) AS n
        FROM src CROSS JOIN b
        WHERE cents >= lo AND cents < hi
        GROUP BY bucket
    """,
    "busy_users": """
        WITH src AS (
          SELECT user_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events)
        SELECT user_id, count(cents) AS n_events,
               CAST(sum(cents) AS BIGINT) AS total_cents
        FROM src GROUP BY user_id
        HAVING count(cents) > 60
    """,
    "top_terms_heavy_hitters": """
        WITH toks AS (
          SELECT unnest(string_split(lower(text), ' ')) AS term
          FROM documents),
        counts AS (
          SELECT term, count(term) AS cnt
          FROM toks WHERE term <> '' GROUP BY term)
        SELECT term, cnt FROM counts
        ORDER BY cnt DESC, term ASC LIMIT 10
    """,
    "favorite_event_type": """
        WITH counts AS (
          SELECT user_id, event_type, count(event_type) AS n
          FROM events GROUP BY user_id, event_type)
        SELECT user_id, event_type, n
        FROM counts
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY n DESC, event_type ASC) = 1
    """,
    "bloom_filtered_revenue": """
        WITH kept AS (
          SELECT l_returnflag,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
          FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                               WHERE o_orderstatus = 'F'))
        SELECT l_returnflag, count(cents) AS n_items,
               CAST(sum(cents) AS BIGINT) AS revenue_cents
        FROM kept GROUP BY l_returnflag
    """,
    "tfidf_terms": """
        WITH toks AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
          FROM documents),
        toks2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
        tf AS (SELECT doc_id, term, count(term) AS tf
               FROM toks2 GROUP BY doc_id, term),
        df AS (SELECT term, count(term) AS df FROM tf GROUP BY term),
        n AS (SELECT count(*) AS n FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, df.df,
                 CAST(tf.tf AS DOUBLE)
                   * ln(CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE)) AS tfidf
          FROM tf JOIN df USING (term) CROSS JOIN n),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term ASC) AS rank
          FROM scored)
        SELECT doc_id, term, tf, df, tfidf, rank FROM ranked WHERE rank <= 5
    """,
    "lineitem_qty_price_corr": """
        WITH src AS (
          SELECT l_returnflag,
                 CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
                 CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y
          FROM lineitem),
        p AS (
          SELECT l_returnflag, count(x) AS n_rows,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy,
                 CAST(sum(x * y) AS BIGINT) AS sxy
          FROM src GROUP BY l_returnflag)
        SELECT l_returnflag, n_rows,
               CASE WHEN n_rows > 1 THEN
                 (CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                      / CAST(n_rows AS DOUBLE))
                 / (CAST(n_rows AS DOUBLE) - 1.0) END AS covar_samp,
               CASE WHEN n_rows > 1
                     AND (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                          * CAST(sx AS DOUBLE) / CAST(n_rows AS DOUBLE)) > 0
                     AND (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                          * CAST(sy AS DOUBLE) / CAST(n_rows AS DOUBLE)) > 0
                THEN (CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                          / CAST(n_rows AS DOUBLE))
                   / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                           * CAST(sx AS DOUBLE) / CAST(n_rows AS DOUBLE))
                        * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                           * CAST(sy AS DOUBLE) / CAST(n_rows AS DOUBLE)))
                END AS corr
        FROM p
    """,
    "user_event_paths": """
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
               count(event_type) AS n_events
        FROM events GROUP BY user_id
    """,
    "transcript_reassembly": """
        WITH src AS (
          SELECT event_id AS seq,
                 CASE WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                 CAST(event_id % 37 AS INTEGER) AS turn_idx,
                 CASE WHEN (event_id % 37) % 2 = 0 THEN 'user'
                      ELSE 'assistant' END AS role,
                 event_type || ' v' || CAST(event_id AS VARCHAR) AS text
          FROM events),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY seq DESC) AS rn
          FROM src),
        winners AS (
          SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
        SELECT conv_id,
               string_agg(role || ': ' || text, ' | ' ORDER BY turn_idx)
                 AS transcript,
               count(text) AS n_turns
        FROM winners GROUP BY conv_id
    """,
    "events_value_stats": """
        WITH src AS (
          SELECT event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events),
        p AS (
          SELECT event_type, count(cents) AS n_rows,
                 CAST(sum(cents) AS BIGINT) AS sum_cents,
                 CAST(sum(cents * cents) AS BIGINT) AS ssq
          FROM src GROUP BY event_type)
        SELECT event_type, n_rows, sum_cents,
               CAST(sum_cents AS DOUBLE) / CAST(n_rows AS DOUBLE) AS mean_cents,
               CASE WHEN n_rows > 1 THEN
                 (CAST(ssq AS DOUBLE)
                    - CAST(sum_cents AS DOUBLE) * CAST(sum_cents AS DOUBLE)
                      / CAST(n_rows AS DOUBLE))
                 / (CAST(n_rows AS DOUBLE) - 1.0) END AS var_cents,
               CASE WHEN n_rows > 1 THEN
                 sqrt(greatest(
                   (CAST(ssq AS DOUBLE)
                      - CAST(sum_cents AS DOUBLE) * CAST(sum_cents AS DOUBLE)
                        / CAST(n_rows AS DOUBLE))
                   / (CAST(n_rows AS DOUBLE) - 1.0), 0.0)) END AS std_cents
        FROM p
    """,
    "purchase_attribution": """
        WITH l AS (
          SELECT event_id, ts, user_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events WHERE event_type IN ('click', 'view')),
        r AS (
          SELECT event_id AS purchase_id, user_id, ts
          FROM events WHERE event_type = 'purchase')
        SELECT r.purchase_id,
               count(l.event_id) AS n_attributed,
               CAST(sum(l.cents) AS BIGINT) AS value_cents
        FROM r JOIN l
          ON l.user_id = r.user_id
         AND l.ts >= r.ts AND l.ts <= r.ts + INTERVAL 2 HOUR
        GROUP BY r.purchase_id
    """,
    "top_events_per_type": """
        SELECT event_type, rn AS rank, event_id, value FROM (
          SELECT event_type, event_id, value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value DESC, event_id) AS rn
          FROM events) WHERE rn <= 3
    """,
    "events_hopping": """
        SELECT event_type,
               date_trunc('hour', ts) - to_hours(i.i) AS "window",
               count(value) AS n_events,
               floor(sum(value) * 100 + 0.5) / 100 AS sum_value
        FROM events CROSS JOIN (VALUES (0), (1)) AS i(i)
        GROUP BY 1, 2
    """,
    "user_running_totals": """
        WITH src AS (
          SELECT user_id, event_id, value,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events)
        SELECT user_id, event_id, value,
               row_number() OVER w AS rn,
               lag(value) OVER w AS prev_value,
               CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents
        FROM src WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
    "user_moving_avg": """
        WITH src AS (
          SELECT user_id, event_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events),
        w AS (
          SELECT user_id, event_id,
                 CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov_sum_cents,
                 row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
          FROM src)
        SELECT user_id, event_id, mov_sum_cents,
               CAST(mov_sum_cents AS DOUBLE) / (CAST(least(rn, 5) AS DOUBLE) * 100.0) AS mov_avg
        FROM w
    """,
    "revenue_rollup_region": """
        WITH src AS (
          SELECT r.r_name, n.n_name, c.c_custkey,
                 CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS cents
          FROM customer c
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey)
        SELECT r_name, n_name, count(c_custkey) AS n_customers,
               CAST(sum(cents) AS BIGINT) AS acctbal_cents
        FROM src GROUP BY ROLLUP(r_name, n_name)
    """,
    "orders_status_priority_cube": """
        WITH src AS (
          SELECT o_orderstatus, o_orderpriority, o_orderkey,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
          FROM orders)
        SELECT o_orderstatus, o_orderpriority,
               count(o_orderkey) AS n_orders,
               CAST(sum(cents) AS BIGINT) AS total_cents
        FROM src GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    "ann_cosine_topk": """
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                   FROM embeddings WHERE vec_id < 3),
        s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(e.embedding, q.qe) AS sim
              FROM embeddings e CROSS JOIN q),
        r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY sim DESC, neighbor_id) AS rank
              FROM s)
        SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 10
    """,
    "events_stratified_sample": """
        SELECT event_id, event_type, user_id
        FROM events
        WHERE ((event_id % 1000003) * 2654435761) % 1000 <
              CASE event_type WHEN 'purchase' THEN 1000
                              WHEN 'click' THEN 200
                              WHEN 'view' THEN 50
                              ELSE 0 END
    """,
    "embedding_components": """
        WITH e AS (
          SELECT vec_id, unnest(range(1, len(embedding)+1)) AS pos,
                 CAST(unnest(embedding) AS DOUBLE) AS comp
          FROM embeddings)
        SELECT vec_id, pos,
               CAST(floor(comp * 1000 + 0.5) AS BIGINT) AS comp_milli
        FROM e
    """,
    "revenue_by_segment": """
        SELECT c.c_mktsegment,
               count(l.l_extendedprice) AS n_items,
               floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) / 100 AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    "orders_by_status": """
        SELECT o_orderstatus, count(o_totalprice) AS n_orders,
               floor(sum(o_totalprice) * 100 + 0.5) / 100 AS sum_total
        FROM orders GROUP BY o_orderstatus
    """,
    "part_type_stats": """
        SELECT p_type, min(p_size) AS min_size, max(p_size) AS max_size,
               count(p_size) AS n_parts
        FROM part GROUP BY p_type
    """,
    "events_daily_users": """
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY strftime(ts, '%Y-%m-%d')
    """,
    "events_value_outliers": """
        WITH q AS (
          SELECT event_type,
                 floor(quantile_cont(value, 0.25) * 1000000 + 0.5) / 1000000 AS q1,
                 floor(quantile_cont(value, 0.75) * 1000000 + 0.5) / 1000000 AS q3
          FROM events GROUP BY event_type),
        f AS (SELECT event_type, q1 - 1.5 * (q3 - q1) AS lo,
                     q3 + 1.5 * (q3 - q1) AS hi FROM q)
        SELECT e.event_id, e.event_type, e.value
        FROM events e JOIN f USING (event_type)
        WHERE e.value < f.lo OR e.value > f.hi
    """,
    "value_percentiles": """
        SELECT event_type,
               floor(quantile_cont(value, 0.5) * 1000000 + 0.5) / 1000000 AS p50,
               floor(quantile_cont(value, 0.95) * 1000000 + 0.5) / 1000000 AS p95,
               count(value) AS n
        FROM events GROUP BY event_type
    """,
    "incremental_embedding_exact": """
        SELECT e1.vec_id AS a, e2.vec_id AS b
        FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
        WHERE list_cosine_similarity(e1.embedding, e2.embedding) >= 0.35
          AND NOT (e1.vec_id % 3 = 0 AND e2.vec_id % 3 = 0)
    """,
    "incremental_minhash_verified": """
        WITH idx AS (
          SELECT doc_id, text,
                 unnest(generate_series(1, greatest(length(text) - 4, 0))) AS i
          FROM documents),
        g AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS gram FROM idx),
        sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        inter AS (
          SELECT ga.doc_id AS a, gb.doc_id AS b, count(*) AS ni
          FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id
          WHERE NOT (ga.doc_id % 3 = 0 AND gb.doc_id % 3 = 0)
          GROUP BY 1, 2)
        SELECT i.a, i.b,
               CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.a
        JOIN sizes sb ON sb.doc_id = i.b
        WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= 0.6
    """,
    "incremental_dedup": """
        WITH prior AS (
            SELECT DISTINCT substr(lower(text), 1, 20) AS k
            FROM documents WHERE doc_id % 3 = 0
        ), novel AS (
            SELECT doc_id, substr(lower(text), 1, 20) AS k
            FROM documents WHERE doc_id % 3 <> 0
        )
        SELECT min(doc_id) AS doc_id, count(doc_id) AS n_copies
        FROM novel
        WHERE k NOT IN (SELECT k FROM prior)
        GROUP BY k
    """,
    "graph_export_edges": """
        SELECT o_orderstatus AS label,
               CAST(count(*) AS BIGINT) AS n_edges,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders
        WHERE o_orderstatus IN ('F', 'O')
        GROUP BY o_orderstatus
    """,
    "graph_khop": """
        WITH RECURSIVE edges AS (
            SELECT DISTINCT CAST(user_id AS BIGINT) AS src,
                   (CAST(user_id AS BIGINT) * 3 + event_id)
                       % (SELECT max(user_id) + 1 FROM events) AS dst
            FROM events
        ), reach(node, depth) AS (
            SELECT * FROM (VALUES (CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
                                  (1, 0), (2, 0)) AS s(node, depth)
            UNION
            SELECT e.dst, r.depth + 1
            FROM reach r JOIN edges e ON e.src = r.node
            WHERE r.depth < 3
        )
        SELECT node, min(depth) AS depth FROM reach GROUP BY node
    """,
    "graph_shortest_paths": """
        WITH e0 AS (
            SELECT CAST(user_id AS BIGINT) AS src,
                   (CAST(user_id AS BIGINT) * 3 + event_id)
                       % (SELECT max(user_id) + 1 FROM events) AS dst,
                   CAST(min(event_id % 97 + 1) AS BIGINT) AS w
            FROM events
            GROUP BY 1, 2
        ), d0 AS (
            SELECT * FROM (VALUES (CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
                                  (1, 0), (2, 0)) AS s(node, dist)
        ), d1 AS (
            SELECT node, min(dist) AS dist FROM (
                SELECT * FROM d0
                UNION ALL
                SELECT e.dst, d.dist + e.w FROM d0 d JOIN e0 e ON e.src = d.node
            ) GROUP BY node
        ), d2 AS (
            SELECT node, min(dist) AS dist FROM (
                SELECT * FROM d1
                UNION ALL
                SELECT e.dst, d.dist + e.w FROM d1 d JOIN e0 e ON e.src = d.node
            ) GROUP BY node
        ), d3 AS (
            SELECT node, min(dist) AS dist FROM (
                SELECT * FROM d2
                UNION ALL
                SELECT e.dst, d.dist + e.w FROM d2 d JOIN e0 e ON e.src = d.node
            ) GROUP BY node
        )
        SELECT node, dist FROM d3
    """,
    "graph_triangles": """
        WITH raw AS (
            SELECT CAST(user_id AS BIGINT) AS u,
                   (CAST(user_id AS BIGINT) * 7 + event_id)
                       % (SELECT max(user_id) + 1 FROM events) AS v
            FROM events
            WHERE event_id % 13 = 0
        ), e0 AS (
            SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
            FROM raw WHERE u <> v
        ), tri AS (
            SELECT e1.a, e1.b, e2.b AS c
            FROM e0 e1
            JOIN e0 e2 ON e2.a = e1.b
            JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
        )
        SELECT a, CAST(count(*) AS BIGINT) AS n_triangles
        FROM tri GROUP BY a
    """,
    "graph_pagerank": """
        WITH e0 AS (
            SELECT DISTINCT CAST(user_id AS BIGINT) AS src,
                   (CAST(user_id AS BIGINT) * 3 + event_id)
                       % (SELECT max(user_id) + 1 FROM events) AS dst
            FROM events
        ), outdeg AS (
            SELECT src, CAST(count(*) AS BIGINT) AS odeg FROM e0 GROUP BY src
        ), nodes AS (
            SELECT src AS node FROM e0 UNION SELECT dst FROM e0
        ), pr0 AS (
            SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes
        ), s1 AS (
            SELECT e.dst AS node,
                   CAST(sum((p.rank * 17) // (20 * o.odeg)) AS BIGINT) AS inc
            FROM pr0 p JOIN outdeg o ON o.src = p.node JOIN e0 e ON e.src = p.node
            GROUP BY e.dst
        ), pr1 AS (
            SELECT n.node, CAST(150000 + COALESCE(s.inc, 0) AS BIGINT) AS rank
            FROM nodes n LEFT JOIN s1 s ON s.node = n.node
        ), s2 AS (
            SELECT e.dst AS node,
                   CAST(sum((p.rank * 17) // (20 * o.odeg)) AS BIGINT) AS inc
            FROM pr1 p JOIN outdeg o ON o.src = p.node JOIN e0 e ON e.src = p.node
            GROUP BY e.dst
        ), pr2 AS (
            SELECT n.node, CAST(150000 + COALESCE(s.inc, 0) AS BIGINT) AS rank
            FROM nodes n LEFT JOIN s2 s ON s.node = n.node
        ), s3 AS (
            SELECT e.dst AS node,
                   CAST(sum((p.rank * 17) // (20 * o.odeg)) AS BIGINT) AS inc
            FROM pr2 p JOIN outdeg o ON o.src = p.node JOIN e0 e ON e.src = p.node
            GROUP BY e.dst
        ), pr3 AS (
            SELECT n.node, CAST(150000 + COALESCE(s.inc, 0) AS BIGINT) AS rank
            FROM nodes n LEFT JOIN s3 s ON s.node = n.node
        )
        SELECT node, rank FROM pr3
    """,
    "graph_components": """
        WITH RECURSIVE e0 AS (
            SELECT DISTINCT CAST(user_id AS BIGINT) AS a,
                   (CAST(user_id AS BIGINT) * 5 + event_id)
                       % (SELECT max(user_id) + 1 FROM events) AS b
            FROM events
            WHERE event_id % 97 = 0
        ), edges AS (
            SELECT a AS src, b AS dst FROM e0
            UNION
            SELECT b, a FROM e0
        ), nodes AS (
            SELECT DISTINCT src AS node FROM edges
        ), reach(node, lbl) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT e.dst, r.lbl
            FROM reach r JOIN edges e ON e.src = r.node
        )
        SELECT node, min(lbl) AS component FROM reach GROUP BY node
    """,
    # rows-only (non-SQL-expressible) entries intentionally omitted:
    # lang_id, dedup_minhash, dedup_simhash, ann_ivf,
    # multimodal_features, dedup_embedding (IVF-approximate pair set)
}

# the declarative runner replays the exact same derived CDC stream as the
# programmatic flagship — one oracle, two engine surfaces
ORACLE_SQL["job_json_roundtrip"] = ORACLE_SQL["transcript_cdc_replay"]

# the DR replica must be value-identical to the primary's replay — same
# oracle, third engine surface (incremental replicate_lake sync)
ORACLE_SQL["lake_replication"] = ORACLE_SQL["transcript_cdc_replay"]

# snapshot diff: LWW state at the two watermarks, FULL JOIN on the key,
# kept where a side is absent or the winning seq moved — exactly the
# engine's seq-version classification
ORACLE_SQL["lake_snapshot_diff"] = """
    WITH src AS (
      SELECT event_id AS seq,
             CASE WHEN event_id % 10 < 6 THEN 'I'
                  WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
             'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
             CAST(event_id % 37 AS INTEGER) AS turn_idx,
             CASE WHEN (event_id % 37) % 2 = 0 THEN 'user'
                  ELSE 'assistant' END AS role,
             event_type || ' v' || CAST(event_id AS VARCHAR) AS text,
             CASE WHEN event_id % 5 = 0 THEN 'search'
                  WHEN event_id % 5 = 1 THEN 'python' ELSE NULL END AS tool,
             ts
      FROM events),
    mx AS (SELECT CAST(max(event_id) AS BIGINT) * 6 // 10 AS w1 FROM events),
    r1 AS (
      SELECT s.*, row_number() OVER (PARTITION BY conv_id, turn_idx
                                     ORDER BY seq DESC) AS rn
      FROM src s, mx WHERE s.seq <= mx.w1),
    s1 AS (SELECT conv_id, turn_idx, role, text, tool, ts, seq
           FROM r1 WHERE rn = 1 AND op <> 'D'),
    r2 AS (
      SELECT s.*, row_number() OVER (PARTITION BY conv_id, turn_idx
                                     ORDER BY seq DESC) AS rn
      FROM src s),
    s2 AS (SELECT conv_id, turn_idx, role, text, tool, ts, seq
           FROM r2 WHERE rn = 1 AND op <> 'D')
    SELECT
      CASE WHEN s1.seq IS NULL THEN 'insert'
           WHEN s2.seq IS NULL THEN 'delete'
           ELSE 'update' END AS op,
      conv_id, turn_idx,
      CASE WHEN s2.seq IS NULL THEN s1.role ELSE s2.role END AS role,
      CASE WHEN s2.seq IS NULL THEN s1.text ELSE s2.text END AS text,
      CASE WHEN s2.seq IS NULL THEN s1.tool ELSE s2.tool END AS tool,
      strftime(CASE WHEN s2.seq IS NULL THEN s1.ts ELSE s2.ts END,
               '%Y-%m-%d %H:%M:%S') AS ts_str,
      CASE WHEN s2.seq IS NULL THEN s1.seq ELSE s2.seq END AS seq
    FROM s1 FULL JOIN s2 USING (conv_id, turn_idx)
    WHERE s1.seq IS NULL OR s2.seq IS NULL OR s1.seq <> s2.seq
"""

# the HLL accuracy contract: exact distinct count is SQL, the in-bound flag
# is asserted engine-side (TRUE here) — a sketch regression hash-fails
ORACLE_SQL["approx_users_hll_verified"] = """
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS hll_within_5pct
    FROM events
"""
