"""Graph export reader + distributed traversal operators.

Runnable analogue of the reference's graph-DB family (gdbreader /
gdbwriter — Gremlin export): the reference splits the export job one task
per LABEL (GdbReader.java:81-105 ``split``), each task fetches its label's
elements in batched ID ranges (GdbReader.java:150-200 ``startRead``) and
maps (id, label, from, to, properties) to flat records through a
MappingRule (mapping/DefaultGdbMapper.java).  Here the graph lives as
Parquet *export tables* — vertices ``(id, label, <props...>)``, edges
``(id, label, src, dst, <props...>)`` — and the same contract is
expressed Ray-Data-first:

- label discovery is a distributed distinct over the ``label`` column
  (the reference's ``graph.getLabels()`` metadata call);
- the per-label task split is a predicate-pruned ``read_parquet`` per
  label (row groups that cannot contain the label never leave storage);
- the property→column mapping rule is the SAME column spec the file
  readers use (:func:`raydatax.sources.apply_column_spec`), so a graph
  export is read with the exact projection/cast/const machinery of every
  other source.

Traversals are built on the engine's adaptive primitives — frontier
expansion through :func:`raydatax.relational.semi_join` (broadcast under
a metadata-counted threshold, hash-partitioned join above) and connected
components through :func:`raydatax.dedup.propagate_min_labels`
(distributed min-label propagation; nothing but one scalar per round on
the driver).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .relational import preagg_groupby, semi_join
from .sources import ColumnEntry, apply_column_spec


def graph_labels(path: str, label_col: str = "label") -> list[str]:
    """Distinct labels of a graph export (the ``graph.getLabels()``
    metadata call): a distributed distinct over the pruned label column.
    Labels are schema-like — a handful of values — so collecting the
    distinct set on the driver is bounded."""
    ds = rd.read_parquet(path, columns=[label_col])
    return sorted(ds.unique(label_col))


def read_graph(
    path: str,
    labels: Sequence[str] | None = None,
    label_col: str = "label",
    column_spec: list[ColumnEntry] | None = None,
) -> "rd.Dataset":
    """Per-label split export read.  One predicate-pruned parquet read per
    requested label (the reference's one-task-per-label split), unioned
    lazily; an optional column spec applies the mapping rule.  With
    ``labels=None`` every discovered label is exported (GdbReader.java:
    91-99 falls back to all labels the same way)."""
    labs = list(labels) if labels is not None else graph_labels(path, label_col)
    if not labs:
        raise ValueError("graph export has no labels to read")
    parts = [
        rd.read_parquet(path, filter=(pc.field(label_col) == lab)) for lab in labs
    ]
    ds = parts[0]
    if len(parts) > 1:
        ds = ds.union(*parts[1:])
    if column_spec is not None:
        spec = list(column_spec)
        ds = ds.map_batches(
            lambda t, _s=spec: apply_column_spec(t, _s), batch_format="pyarrow"
        )
    return ds


def export_graph(
    vertices: "rd.Dataset | pa.Table | None",
    edges: "rd.Dataset | pa.Table | None",
    root: str,
) -> dict[str, str]:
    """Write a graph export (the gdbwriter direction): ``<root>/vertices``
    and ``<root>/edges`` parquet directories.  Fresh directories each call
    — an export is a snapshot, stale part-files from a previous run must
    not survive."""
    import os
    import shutil

    out: dict[str, str] = {}
    for name, data in (("vertices", vertices), ("edges", edges)):
        if data is None:
            continue
        d = os.path.join(root, name)
        if os.path.exists(d):
            shutil.rmtree(d)
        os.makedirs(d, exist_ok=True)
        if isinstance(data, pa.Table):
            import pyarrow.parquet as pq

            pq.write_table(data, os.path.join(d, "part-0.parquet"))
        else:
            data.write_parquet(d)
        out[name] = d
    return out


def k_hop(
    edges: "rd.Dataset",
    seeds: Iterable[int],
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> "rd.Dataset":
    """BFS reachability to depth ``k``: returns ``(node, depth)`` with the
    FIRST-VISIT (minimum) depth per reachable node, seeds at depth 0.

    Each round is one adaptive semi join of the (large) edge table against
    the current frontier, a pre-aggregated distinct of the neighbor set,
    and an anti join against the visited set — frontier and visited stay
    Datasets throughout; the driver sees only block-metadata row counts.
    Per-round work is ∝ edges incident to the frontier, so a bounded-k
    traversal never touches more of the graph than the reachable ball."""
    seed_arr = np.unique(np.asarray(list(seeds), dtype=np.int64))
    if seed_arr.size == 0:
        raise ValueError("k_hop needs at least one seed")
    visited = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(seed_arr, pa.int64()),
                "depth": pa.array(np.zeros(seed_arr.size, np.int64), pa.int64()),
            }
        )
    ).materialize()
    frontier = visited
    for depth in range(1, k + 1):
        touched = semi_join(edges, frontier, left_on=src_col, right_on="node")
        nbrs = preagg_groupby(
            touched.map_batches(
                lambda t, _d=dst_col: pa.table({"node": pc.cast(t[_d], pa.int64())}),
                batch_format="pyarrow",
            ),
            ["node"],
            [("node", "count", "__c")],
        ).select_columns(["node"])
        fresh = semi_join(nbrs, visited, left_on="node", anti=True).map_batches(
            lambda t, _i=depth: t.append_column(
                "depth", pa.array(np.full(t.num_rows, _i, np.int64), pa.int64())
            ),
            batch_format="pyarrow",
        ).materialize()
        if fresh.count() == 0:
            break
        visited = visited.union(fresh).materialize()
        frontier = fresh
    return visited


def pagerank(
    edges: "rd.Dataset",
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 16,
    edge_driver_threshold: int = 2_000_000,
) -> "rd.Dataset":
    """Deterministic INTEGER PageRank: ranks in micro-units (every node
    starts at 1_000_000), damping 17/20, per-edge contribution
    ``(rank * 17) // (20 * outdeg)`` — all int64 floor arithmetic, so the
    result is independent of partitioning, accumulation order, and engine
    (float PageRank sums are order-sensitive and can never hash-match a
    SQL oracle).  Dangling nodes keep the base rank (no redistribution —
    the documented simplification, mirrored by the oracle).  Each
    iteration is two hash joins + one pre-aggregated integer sum; edges
    are deduplicated first."""
    from .relational import _join_partitions, preagg_groupby

    n_parts = _join_partitions(num_partitions)
    e = preagg_groupby(
        edges.map_batches(
            lambda t: pa.table(
                {"src": pc.cast(t[src_col], pa.int64()),
                 "dst": pc.cast(t[dst_col], pa.int64())}
            ),
            batch_format="pyarrow",
        ),
        ["src", "dst"],
        [("src", "count", "__c")],
    ).select_columns(["src", "dst"]).materialize()

    # adaptive small-graph path (edge count from block metadata, same rule
    # as the dedup clustering): the per-iteration joins have fixed shuffle
    # latency that dwarfs a small graph — run the IDENTICAL integer
    # arithmetic with numpy on the driver instead
    if e.count() <= edge_driver_threshold:
        tabs = [t for t in ray.get(e.to_arrow_refs()) if t.num_rows]
        if not tabs:
            return rd.from_arrow(
                pa.table({"node": pa.array([], pa.int64()),
                          "rank": pa.array([], pa.int64())})
            )
        et = pa.concat_tables(tabs, promote_options="permissive")
        src = et["src"].to_numpy(zero_copy_only=False)
        dst = et["dst"].to_numpy(zero_copy_only=False)
        nodes_np = np.unique(np.concatenate([src, dst]))
        si = np.searchsorted(nodes_np, src)
        di = np.searchsorted(nodes_np, dst)
        odeg = np.zeros(len(nodes_np), np.int64)
        np.add.at(odeg, si, 1)
        rank = np.full(len(nodes_np), 1_000_000, np.int64)
        for _ in range(iters):
            contrib = (rank[si] * 17) // (20 * odeg[si])
            inc = np.zeros(len(nodes_np), np.int64)
            np.add.at(inc, di, contrib)  # int adds — order-independent
            rank = inc + 150_000
        return rd.from_arrow(
            pa.table({"node": pa.array(nodes_np, pa.int64()),
                      "rank": pa.array(rank, pa.int64())})
        )

    outdeg = preagg_groupby(e, ["src"], [("dst", "count", "odeg")]).materialize()
    nodes = preagg_groupby(
        e.map_batches(
            lambda t: pa.table(
                {"node": pa.concat_arrays([
                    t["src"].combine_chunks() if isinstance(t["src"], pa.ChunkedArray) else t["src"],
                    t["dst"].combine_chunks() if isinstance(t["dst"], pa.ChunkedArray) else t["dst"],
                ])}
            ),
            batch_format="pyarrow",
        ),
        ["node"],
        [("node", "count", "__c")],
    ).select_columns(["node"]).materialize()

    ranks = nodes.map_batches(
        lambda t: t.append_column(
            "rank", pa.array(np.full(t.num_rows, 1_000_000, np.int64), pa.int64())
        ),
        batch_format="pyarrow",
    ).materialize()

    # attach each edge's source out-degree ONCE, outside the loop: saves a
    # join per iteration AND avoids chaining a join directly off another
    # join's output in one plan (Ray's JoinOperator emits schema-less
    # blocks for empty hash partitions, which crash acero as the next
    # join's input on sparse graphs)
    e_deg = e.join(outdeg, "inner", n_parts, on=("src",)).materialize()

    for _ in range(iters):
        sender = ranks.map_batches(
            lambda t: pa.table({"src": t["node"], "rank": t["rank"]}),
            batch_format="pyarrow",
        )
        contrib = sender.join(e_deg, "inner", n_parts, on=("src",)).map_batches(
            lambda t: pa.table(
                {
                    "node": t["dst"],
                    "contrib": pa.array(
                        (t["rank"].to_numpy(zero_copy_only=False) * 17)
                        // (20 * t["odeg"].to_numpy(zero_copy_only=False)),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        incoming = preagg_groupby(contrib, ["node"], [("contrib", "sum", "inc")])
        ranks = nodes.join(incoming, "left_outer", n_parts, on=("node",)).map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "rank": pc.add(
                        pc.fill_null(pc.cast(t["inc"], pa.int64()), 0),
                        pa.scalar(150_000, pa.int64()),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
    return ranks


def shortest_paths(
    edges: "rd.Dataset",
    seeds: Iterable[int],
    rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    num_partitions: int = 16,
    edge_driver_threshold: int = 2_000_000,
) -> "rd.Dataset":
    """Bounded-hop single/multi-source shortest paths (Bellman–Ford,
    ``rounds`` relaxations): ``(node, dist)`` = the minimum total INTEGER
    weight over paths of ≤ ``rounds`` edges from any seed; unreached
    nodes are absent.  Integer weights + fixed round count make the
    result engine/order-exact (the same discipline as the integer
    PageRank — its SQL oracle is the rounds unrolled as chained CTEs).
    Parallel edges collapse to their minimum weight first.  Adaptive:
    numpy relaxation on the driver under a metadata-counted edge
    threshold, per-round hash join + pre-aggregated integer min above."""
    from .relational import _join_partitions, preagg_groupby

    seed_arr = np.unique(np.asarray(list(seeds), dtype=np.int64))
    if seed_arr.size == 0:
        raise ValueError("shortest_paths needs at least one seed")
    n_parts = _join_partitions(num_partitions)

    def _edge_batch(t: pa.Table) -> pa.Table:
        w = pc.cast(t[weight_col], pa.int64())
        # negative weights would let the relaxation step walk out of
        # unreached nodes (INF + w < INF) and mark them reached with
        # ~2e18 distances; Bellman–Ford with bounded rounds is only
        # defined here for non-negative integer weights
        mn = pc.min(w).as_py()
        if mn is not None and mn < 0:
            raise ValueError(
                f"shortest_paths requires non-negative weights; saw {mn}"
            )
        return pa.table(
            {"src": pc.cast(t[src_col], pa.int64()),
             "dst": pc.cast(t[dst_col], pa.int64()),
             "w": w}
        )

    e = preagg_groupby(
        edges.map_batches(_edge_batch, batch_format="pyarrow"),
        ["src", "dst"],
        [("w", "min", "w")],
    ).materialize()

    if e.count() <= edge_driver_threshold:
        tabs = [t for t in ray.get(e.to_arrow_refs()) if t.num_rows]
        if not tabs:
            return rd.from_arrow(
                pa.table({"node": pa.array(seed_arr, pa.int64()),
                          "dist": pa.array(np.zeros(seed_arr.size, np.int64))})
            )
        et = pa.concat_tables(tabs, promote_options="permissive")
        src = et["src"].to_numpy(zero_copy_only=False)
        dst = et["dst"].to_numpy(zero_copy_only=False)
        w = et["w"].to_numpy(zero_copy_only=False)
        nodes_np = np.unique(np.concatenate([src, dst, seed_arr]))
        si = np.searchsorted(nodes_np, src)
        di = np.searchsorted(nodes_np, dst)
        INF = np.iinfo(np.int64).max // 4
        dist = np.full(len(nodes_np), INF, np.int64)
        dist[np.searchsorted(nodes_np, seed_arr)] = 0
        for _ in range(rounds):
            # never relax FROM an unreached node (belt-and-braces with the
            # non-negative weight check: keeps INF nodes inert even if a
            # pathological weight approaches the INF/4 headroom)
            reached_src = dist[si] < INF
            cand = np.where(reached_src, dist[si] + w, INF)
            nxt = dist.copy()
            np.minimum.at(nxt, di, cand)
            dist = nxt
        reached = dist < INF
        return rd.from_arrow(
            pa.table({"node": pa.array(nodes_np[reached], pa.int64()),
                      "dist": pa.array(dist[reached], pa.int64())})
        )

    dists = rd.from_arrow(
        pa.table({"node": pa.array(seed_arr, pa.int64()),
                  "dist": pa.array(np.zeros(seed_arr.size, np.int64))})
    ).materialize()
    for _ in range(rounds):
        sender = dists.map_batches(
            lambda t: pa.table({"src": t["node"], "dist": t["dist"]}),
            batch_format="pyarrow",
        )
        cand = sender.join(e, "inner", n_parts, on=("src",)).map_batches(
            lambda t: pa.table(
                {"node": t["dst"], "dist": pc.add(t["dist"], t["w"])}
            ),
            batch_format="pyarrow",
        )
        dists = preagg_groupby(
            cand.union(dists), ["node"], [("dist", "min", "dist")]
        ).materialize()
    return dists


def triangle_count(
    edges: "rd.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 16,
) -> "rd.Dataset":
    """Per-vertex triangle counting (count keyed by the triangle's lowest
    vertex): edges are canonicalized to a<b (self-loops dropped,
    deduplicated), wedges built by ONE hash join (b of the first edge =
    a of the second — canonical ordering makes every triangle a<b<c
    appear exactly once), then closed with an adaptive semi join of the
    wedge's (a, c) composite key against the edge set.  All integers —
    exact on both engines.  Composite key packs (a, c) as a·2³¹ + c
    (node ids must be < 2³¹ — raises otherwise)."""
    from .relational import _join_partitions, preagg_groupby, semi_join

    n_parts = _join_partitions(num_partitions)

    def canon(t: pa.Table) -> pa.Table:
        a = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) and (max(a.max(), b.max()) >= 1 << 31 or min(a.min(), b.min()) < 0):
            raise ValueError("triangle_count needs node ids in [0, 2^31)")
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo < hi
        return pa.table({"a": lo[keep], "b": hi[keep]})

    e0 = preagg_groupby(
        edges.map_batches(canon, batch_format="pyarrow"),
        ["a", "b"],
        [("a", "count", "__c")],
    ).select_columns(["a", "b"]).materialize()
    if e0.count() == 0:  # empty-side acero joins have no schema — guard
        return rd.from_arrow(
            pa.table({"a": pa.array([], pa.int64()),
                      "n_triangles": pa.array([], pa.int64())})
        )

    right = e0.map_batches(
        lambda t: pa.table({"b": t["a"], "c": t["b"]}), batch_format="pyarrow"
    )
    wedges = e0.join(right, "inner", n_parts, on=("b",))
    keyed = wedges.map_batches(
        lambda t: t.append_column(
            "__k",
            pa.array(
                (t["a"].to_numpy(zero_copy_only=False) << 31)
                + t["c"].to_numpy(zero_copy_only=False),
                pa.int64(),
            ),
        ),
        batch_format="pyarrow",
    )
    ekeys = e0.map_batches(
        lambda t: pa.table(
            {"__k": pa.array(
                (t["a"].to_numpy(zero_copy_only=False) << 31)
                + t["b"].to_numpy(zero_copy_only=False),
                pa.int64(),
            )}
        ),
        batch_format="pyarrow",
    )
    closed = semi_join(keyed, ekeys, left_on="__k")
    return preagg_groupby(closed, ["a"], [("a", "count", "n_triangles")])


def connected_components(
    edges: "rd.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 64,
    pair_driver_threshold: int | None = None,
) -> "rd.Dataset":
    """Undirected connected components over an edge Dataset: ``(node,
    component)`` where the component id is the minimum node id of the
    component.

    Adaptive like the near-dup clustering it shares machinery with
    (:func:`raydatax.dedup.minhash_dedup`): the edge pair set is
    materialized in the object store and counted from block METADATA — a
    small one is clustered with driver union-find (shuffle-free, one
    round-trip), a large one goes through distributed min-label
    propagation (:func:`raydatax.dedup.propagate_min_labels`, iterative
    groupby rounds to a fixpoint) so node ids are never collected on the
    driver.  Both paths emit the identical (node, min-id component)
    labeling."""
    from .dedup import PAIR_DRIVER_THRESHOLD, cluster_pairs, propagate_min_labels

    if pair_driver_threshold is None:
        pair_driver_threshold = PAIR_DRIVER_THRESHOLD
    pairs = edges.map_batches(
        lambda t: pa.table(
            {"a": pc.cast(t[src_col], pa.int64()), "b": pc.cast(t[dst_col], pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()
    n_pairs = pairs.count()
    if n_pairs <= pair_driver_threshold:
        tables = [t for t in ray.get(pairs.to_arrow_refs()) if t.num_rows]
        if not tables:
            return rd.from_arrow(
                pa.table({"node": pa.array([], pa.int64()),
                          "component": pa.array([], pa.int64())})
            )
        pr = pa.concat_tables(tables, promote_options="permissive")
        pair_list = list(
            zip(
                pr["a"].to_numpy(zero_copy_only=False).tolist(),
                pr["b"].to_numpy(zero_copy_only=False).tolist(),
            )
        )
        nodes = sorted({i for p in pair_list for i in p})
        mapping = cluster_pairs(pair_list, nodes)
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes, pa.int64()),
                    "component": pa.array([mapping[n] for n in nodes], pa.int64()),
                }
            )
        )
    # general graphs can have long-diameter components (unlike the shallow
    # near-dup clusters) — pointer-doubling converges in O(log diameter)
    out = propagate_min_labels(pairs, max_rounds=max_rounds, shortcut=True)
    return out.map_batches(
        lambda t: pa.table({"node": t["node"], "component": t["label"]}),
        batch_format="pyarrow",
    )
