"""Shared helpers of the named query pipelines (the q_* family modules):
table paths, the money/mean rounding and integer-cents conventions, the
derived CDC WAL builder, and the deterministic crawl-split / neighbor-pair
conventions the incremental and verify queries (and their SQL oracles)
agree on."""


import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _scratch(prefix: str, sf_dir: str) -> str:
    """Per-RUN scratch path: sf_dir basename + this driver's pid.  A path
    keyed on the scale factor alone makes two concurrent runs over the
    same sf_dir rmtree each other's exports mid-join (the vanished-export
    guard fails loudly rather than corrupting, but the query turns flaky
    under concurrency); the pid token gives each driver process its own
    tree while staying deterministic within a run."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return f"/tmp/{prefix}_{tag}_p{os.getpid()}"


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


def _crawl_split(ds, id_name: str, prior: bool):
    """The shared two-crawl convention of the incremental_* queries and
    their SQL mirrors: prior crawl = id % 3 == 0, new crawl = the rest."""

    def f(t: pa.Table) -> pa.Table:
        ids = t[id_name].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((ids % 3 == 0) == prior))

    return ds.map_batches(f, batch_format="pyarrow")
