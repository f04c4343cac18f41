"""Graph export reader (gdbreader/gdbwriter analogue) + traversal ops."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from raydatax.graph import (
    connected_components,
    export_graph,
    graph_labels,
    k_hop,
    read_graph,
)
from raydatax.sources import ColumnEntry


def _edge_table(rng, n_nodes: int, n_edges: int) -> pa.Table:
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    return pa.table(
        {
            "id": pa.array(np.arange(n_edges), pa.int64()),
            "label": pa.array(["knows" if i % 2 == 0 else "likes" for i in range(n_edges)]),
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "weight": pa.array(rng.integers(1, 100, n_edges), pa.int64()),
        }
    )


def _bfs_reference(edges: list[tuple[int, int]], seeds: list[int], k: int) -> dict[int, int]:
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    depth = {s: 0 for s in seeds}
    frontier = list(seeds)
    for lvl in range(1, k + 1):
        nxt = []
        for v in frontier:
            for w in adj.get(v, ()):
                if w not in depth:
                    depth[w] = lvl
                    nxt.append(w)
        frontier = nxt
    return depth


def _components_reference(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {i for p in edges for i in p}
    return {n: find(n) for n in nodes}


def test_export_read_label_split(tmp_path):
    rng = np.random.default_rng(7)
    et = _edge_table(rng, 40, 200)
    paths = export_graph(None, rd.from_arrow(et), str(tmp_path / "g"))

    # label discovery = the getLabels() metadata call
    assert graph_labels(paths["edges"]) == ["knows", "likes"]

    # a one-label read returns exactly that label's edges
    knows = read_graph(paths["edges"], labels=["knows"]).take_all()
    assert len(knows) == 100
    assert all(r["label"] == "knows" for r in knows)

    # labels=None → all labels (GdbReader fallback)
    everything = read_graph(paths["edges"])
    assert everything.count() == 200

    # stale part files from a previous export must not survive a re-export
    export_graph(None, rd.from_arrow(et.slice(0, 10)), str(tmp_path / "g"))
    assert read_graph(str(tmp_path / "g/edges")).count() == 10


def test_export_mapping_rule(tmp_path):
    rng = np.random.default_rng(8)
    et = _edge_table(rng, 20, 60)
    paths = export_graph(None, rd.from_arrow(et), str(tmp_path / "g"))
    spec = [
        ColumnEntry(index=2, type="long", name="from_id"),
        ColumnEntry(index=3, type="long", name="to_id"),
        ColumnEntry(index=4, type="string", name="w"),  # typed cast
        ColumnEntry(value="edge", type="string", name="kind"),  # const inject
    ]
    rows = read_graph(paths["edges"], labels=["likes"], column_spec=spec).take_all()
    assert len(rows) == 30
    assert set(rows[0]) == {"from_id", "to_id", "w", "kind"}
    assert all(r["kind"] == "edge" and isinstance(r["w"], str) for r in rows)


def test_k_hop_matches_bfs_reference():
    rng = np.random.default_rng(21)
    n_nodes, n_edges = 300, 900
    src = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    dst = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(5)
    seeds = [3, 77]
    got = {r["node"]: r["depth"] for r in k_hop(edges, seeds, k=3).take_all()}
    want = _bfs_reference(list(zip(src.tolist(), dst.tolist())), seeds, 3)
    assert got == want


def test_k_hop_isolated_seed():
    edges = rd.from_arrow(pa.table({"src": pa.array([1], pa.int64()),
                                    "dst": pa.array([2], pa.int64())}))
    got = {r["node"]: r["depth"] for r in k_hop(edges, [99], k=2).take_all()}
    assert got == {99: 0}


def test_connected_components_both_paths():
    rng = np.random.default_rng(5)
    n_nodes, n_edges = 400, 260  # sparse → many nontrivial components
    src = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    dst = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    want = _components_reference(list(zip(src.tolist(), dst.tolist())))

    small = {r["node"]: r["component"]
             for r in connected_components(edges).take_all()}
    assert small == want

    # force the distributed min-label-propagation path; identical labeling
    big = {r["node"]: r["component"]
           for r in connected_components(edges, pair_driver_threshold=0).take_all()}
    assert big == want


def test_connected_components_long_chain_pointer_doubling():
    """A 300-node path (diameter 299) through the DISTRIBUTED path must
    converge — pointer doubling makes rounds O(log diameter), far under
    the default max_rounds; plain propagation would need 299 rounds."""
    n = 300
    src = np.arange(n - 1, dtype=np.int64)
    dst = src + 1
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    out = connected_components(edges, pair_driver_threshold=0).take_all()
    assert len(out) == n
    assert all(r["component"] == 0 for r in out)


def test_pagerank_integer_paths_identical():
    """Driver and distributed paths run the same int64 floor arithmetic —
    results must be identical, partitioning-independent, and match a
    serial python reference."""
    from raydatax.graph import pagerank

    rng = np.random.default_rng(11)
    src = rng.integers(0, 50, 200).astype(np.int64)
    dst = rng.integers(0, 50, 200).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)

    a = {r["node"]: r["rank"] for r in pagerank(edges, iters=4).take_all()}
    b = {r["node"]: r["rank"]
         for r in pagerank(edges, iters=4, edge_driver_threshold=0).take_all()}
    assert a == b

    # serial reference with identical arithmetic
    pairs = sorted(set(zip(src.tolist(), dst.tolist())))
    nodes = sorted({x for p in pairs for x in p})
    odeg = {n: 0 for n in nodes}
    for s, d in pairs:
        odeg[s] += 1
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(4):
        inc = {n: 0 for n in nodes}
        for s, d in pairs:
            inc[d] += (rank[s] * 17) // (20 * odeg[s])
        rank = {n: inc[n] + 150_000 for n in nodes}
    assert a == rank


def test_triangle_count_matches_reference():
    from raydatax.graph import triangle_count

    rng = np.random.default_rng(13)
    src = rng.integers(0, 40, 300).astype(np.int64)
    dst = rng.integers(0, 40, 300).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    got = {r["a"]: r["n_triangles"] for r in triangle_count(edges).take_all()}

    e = {(min(a, b), max(a, b)) for a, b in zip(src.tolist(), dst.tolist()) if a != b}
    want: dict[int, int] = {}
    for a, b in e:
        for c in range(b + 1, 40):
            if (b, c) in e and (a, c) in e:
                want[a] = want.get(a, 0) + 1
    assert got == want


def test_shortest_paths_paths_identical_and_match_reference():
    from raydatax.graph import shortest_paths

    rng = np.random.default_rng(17)
    src = rng.integers(0, 60, 250).astype(np.int64)
    dst = rng.integers(0, 60, 250).astype(np.int64)
    w = rng.integers(1, 50, 250).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst, "w": w})).repartition(4)
    seeds = [5, 40]

    a = {r["node"]: r["dist"]
         for r in shortest_paths(edges, seeds, rounds=4).take_all()}
    b = {r["node"]: r["dist"]
         for r in shortest_paths(edges, seeds, rounds=4,
                                 edge_driver_threshold=0).take_all()}
    assert a == b

    # serial reference: 4 Bellman-Ford relaxations over min-weight edges
    emin: dict[tuple[int, int], int] = {}
    for s, d, wt in zip(src.tolist(), dst.tolist(), w.tolist()):
        k = (s, d)
        emin[k] = min(emin.get(k, wt), wt)
    INF = 1 << 60
    dist = {s: 0 for s in seeds}
    for _ in range(4):
        nxt = dict(dist)
        for (s, d), wt in emin.items():
            if s in dist and dist[s] + wt < nxt.get(d, INF):
                nxt[d] = dist[s] + wt
        dist = nxt
    assert a == dist
