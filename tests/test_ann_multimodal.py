"""ANN search + multimodal plumbing + relational operators."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from raydatax.ann import brute_force_topk, ivf_topk, kmeans_fit
from raydatax.multimodal import DecodeMedia, MediaFeatures, frame_sample_plan, synth_media
from raydatax.relational import (
    broadcast_join,
    lww_latest,
    preagg_groupby,
    sessionize,
    topk,
    tumbling_window,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb():
    return pq.read_table(f"{SF}/embeddings.parquet")


def test_brute_force_topk_exact(emb):
    queries = emb.slice(0, 2)
    out = brute_force_topk(rd.from_arrow(emb), queries, k=5).to_pandas()
    # numpy ground truth
    m = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"].to_pylist()])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    for q in (0, 1):
        sims = m @ m[q]
        want = set(np.lexsort((np.arange(len(sims)), -sims))[:5])
        got = set(out[out.query_id == q].neighbor_id)
        assert got == want
    assert (out[out["rank"] == 1].neighbor_id.values == [0, 1]).all(), "self-match first"


def test_ivf_recall(emb):
    queries = emb.slice(0, 5)
    ds = rd.from_arrow(emb)
    bf = brute_force_topk(ds, queries, k=10).to_pandas()
    iv = ivf_topk(ds, queries, k=10, n_clusters=8, nprobe=3).to_pandas()
    bset = set(zip(bf.query_id, bf.neighbor_id))
    iset = set(zip(iv.query_id, iv.neighbor_id))
    recall = len(bset & iset) / len(bset)
    assert recall >= 0.6, f"IVF recall too low: {recall}"


def test_kmeans_deterministic(emb):
    m = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"].to_pylist()[:200]])
    assert np.array_equal(kmeans_fit(m, 8), kmeans_fit(m, 8))


def test_multimodal_pipeline():
    media = synth_media(50)
    ds = rd.from_arrow(media)
    out = (
        ds.map_batches(DecodeMedia, batch_format="pyarrow", batch_size=16, concurrency=2)
        .map_batches(MediaFeatures, batch_format="pyarrow", batch_size=16, concurrency=2)
    ).take_all()
    assert len(out) == 50
    assert all(r["decoded_ok"] for r in out)
    assert all(r["dec_width"] == r["width"] for r in out)
    assert all(len(r["features"]) == 64 for r in out)
    # deterministic features
    out2 = rd.from_arrow(media).map_batches(MediaFeatures(), batch_format="pyarrow").take_all()
    assert out[0]["features"] == out2[0]["features"]


def test_media_from_documents_roundtrip():
    """Decode must recover exactly the header fields + blob bytes that
    media_from_documents encoded from the source rows."""
    from raydatax.multimodal import media_from_documents

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 7, 100], pa.int64()),
        "text": pa.array(["alpha", "béta", "", "long " * 50, "z"], pa.string()),
    })
    media = media_from_documents(docs)
    out = rd.from_arrow(media).map_batches(DecodeMedia(), batch_format="pyarrow").take_all()
    by_id = {r["media_id"]: r for r in out}
    for did, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        r = by_id[did]
        assert r["decoded_ok"]
        assert r["dec_kind"] == ["image", "audio", "video"][did % 3]
        assert r["dec_width"] == 16 + (did * 37) % 240
        assert r["dec_height"] == 16 + (did * 53) % 240
        assert r["dec_bytes"] == len(text.encode("utf-8"))


def test_multimodal_bad_payload_is_dirty_not_fatal():
    media = synth_media(5)
    bad = media.set_column(
        media.schema.get_field_index("payload"), "payload",
        pa.array([b"garbage"] * 5, pa.binary()),
    )
    out = rd.from_arrow(bad).map_batches(DecodeMedia(), batch_format="pyarrow").take_all()
    assert all(not r["decoded_ok"] for r in out)


def test_frame_sample_plan():
    plan = frame_sample_plan(pa.array([2500, 0, None], pa.int32()), every_ms=1000)
    assert plan.to_pylist() == [[0, 1000, 2000], [], []]


# ---------------------------------------------------------------- relational


def test_preagg_groupby_matches_pandas():
    li = pq.read_table(f"{SF}/lineitem.parquet")
    ds = rd.from_arrow(li)
    out = preagg_groupby(
        ds, ["l_returnflag"],
        [("l_quantity", "sum", "sum_qty"), ("l_quantity", "count", "n")],
        mean_of=[("sum_qty", "n", "avg_qty")],
    ).to_pandas().set_index("l_returnflag").sort_index()
    pdf = li.to_pandas().groupby("l_returnflag")["l_quantity"].agg(["sum", "count", "mean"])
    assert np.allclose(out["sum_qty"], pdf["sum"])
    assert (out["n"] == pdf["count"]).all()
    assert np.allclose(out["avg_qty"], pdf["mean"])


def test_preagg_groupby_distributed_path_no_driver_fetch(monkeypatch):
    """High-cardinality keys must route through the distributed groupby with
    NO driver fetch of the partial blocks: the branch decision comes from
    block metadata, and the only ray.get the driver path would do is the
    (patched-out) _fetch_partials indirection."""
    import raydatax.relational as rel

    li = pq.read_table(f"{SF}/lineitem.parquet")
    ds = rd.from_arrow(li)

    def boom(refs):
        raise AssertionError("distributed path fetched partials to the driver")

    monkeypatch.setattr(rel, "_fetch_partials", boom)
    # threshold 0 forces the distributed branch even on this small input
    out = preagg_groupby(
        ds, ["l_orderkey", "l_linenumber"],  # ~unique per row: high cardinality
        [("l_quantity", "sum", "sum_qty")],
        driver_merge_threshold=0,
    ).to_pandas()
    pdf = (
        li.to_pandas().groupby(["l_orderkey", "l_linenumber"])["l_quantity"].sum()
    )
    assert len(out) == len(pdf)
    got = out.set_index(["l_orderkey", "l_linenumber"])["sum_qty"].sort_index()
    assert np.allclose(got, pdf.sort_index())


def test_broadcast_join_real():
    cust = pq.read_table(f"{SF}/customer.parquet").rename_columns(
        ["c_custkey", "c_name", "n_nationkey", "c_acctbal", "c_mktsegment"]
    )
    nation = pq.read_table(f"{SF}/nation.parquet")
    out = broadcast_join(rd.from_arrow(cust), nation, "n_nationkey").to_pandas()
    want = cust.to_pandas().merge(nation.to_pandas(), on="n_nationkey")
    assert len(out) == len(want)
    assert set(out.columns) == set(want.columns)


def test_semi_join_paths_agree():
    """Broadcast path (threshold high) and hash-join path (threshold 0)
    must produce identical semi/anti results; the hash path never fetches
    the key set to the driver."""
    import raydatax.relational as rel
    from raydatax.relational import semi_join

    li = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
    orders = rd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey"],
        filter=__import__("pyarrow").compute.field("o_orderstatus") == "F",
    )

    def run(threshold):
        out = semi_join(li, orders, "l_orderkey", "o_orderkey",
                        broadcast_threshold=threshold)
        return out.to_pandas().sort_values(["l_orderkey", "l_quantity"]).reset_index(drop=True)

    a = run(10**9)
    b = run(0)
    assert a[["l_orderkey", "l_quantity"]].equals(b[["l_orderkey", "l_quantity"]])

    def run_anti(threshold):
        out = semi_join(li, orders, "l_orderkey", "o_orderkey",
                        anti=True, broadcast_threshold=threshold)
        return out.to_pandas().sort_values(["l_orderkey", "l_quantity"]).reset_index(drop=True)

    aa, bb = run_anti(10**9), run_anti(0)
    assert aa[["l_orderkey", "l_quantity"]].equals(bb[["l_orderkey", "l_quantity"]])
    assert len(a) + len(aa) == li.count()


def test_topk():
    orders = pq.read_table(f"{SF}/orders.parquet")
    got = topk(rd.from_arrow(orders), [("o_totalprice", "descending"), ("o_orderkey", "ascending")], 10)
    want = orders.to_pandas().sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(10)
    assert got["o_orderkey"].to_pylist() == want["o_orderkey"].tolist()


def test_grouped_percentiles_histogram_close_to_exact():
    """Forcing the histogram path must stay within one bin width of the
    exact per-group quantiles (and agree exactly on counts)."""
    from raydatax.relational import grouped_percentiles

    ev = pq.read_table(f"{SF}/events.parquet")
    ds = rd.from_arrow(ev)
    spec = [("p50", 0.5), ("p95", 0.95)]
    exact = (
        grouped_percentiles(ds, "event_type", "value", spec)
        .to_pandas().set_index("event_type").sort_index()
    )
    approx = (
        grouped_percentiles(ds, "event_type", "value", spec, exact_threshold=0)
        .to_pandas().set_index("event_type").sort_index()
    )
    assert (exact["n"] == approx["n"]).all()
    df = ev.to_pandas()
    span = df.groupby("event_type")["value"].agg(lambda s: s.max() - s.min())
    tol = (span / 8192 * 2.0).reindex(exact.index)
    for colname in ("p50", "p95"):
        assert (abs(exact[colname] - approx[colname]) <= tol).all()


def test_lww_latest_matches_window_semantics():
    ev = pq.read_table(f"{SF}/events.parquet")
    ds = rd.from_arrow(ev)
    got = lww_latest(ds, ["user_id", "event_type"], "event_id", num_partitions=4).to_pandas()
    pdf = ev.to_pandas().sort_values("event_id").groupby(["user_id", "event_type"]).tail(1)
    assert len(got) == len(pdf)
    g = got.sort_values(["user_id", "event_type"]).reset_index(drop=True)
    w = pdf.sort_values(["user_id", "event_type"]).reset_index(drop=True)
    assert (g.event_id.values == w.event_id.values).all()


def test_tumbling_window_and_sessionize():
    ev = pq.read_table(f"{SF}/events.parquet")
    ds = rd.from_arrow(ev)
    w = tumbling_window(ds, "user_id", "ts", "hour", [("value", "sum", "sum_value"), ("value", "count", "n")]).to_pandas()
    pdf = ev.to_pandas()
    pdf["window"] = pdf["ts"].dt.floor("h")
    want = pdf.groupby(["user_id", "window"]).agg(sum_value=("value", "sum"), n=("value", "count")).reset_index()
    m = w.sort_values(["user_id", "window"]).reset_index(drop=True)
    ww = want.sort_values(["user_id", "window"]).reset_index(drop=True)
    assert len(m) == len(ww) and np.allclose(m.sum_value, ww.sum_value)

    s = sessionize(ds, "user_id", "ts", 30).to_pandas()
    assert s.n_events.sum() == len(pdf)
    one = pdf[pdf.user_id == pdf.user_id.iloc[0]].sort_values("ts")
    gaps = (one.ts.diff().dt.total_seconds() / 60 > 30).sum() + 1
    assert int(s[s.user_id == pdf.user_id.iloc[0]].n_sessions.iloc[0]) == gaps


def test_pq_rerank_equals_brute_force(emb):
    from raydatax.ann import pq_topk

    queries = emb.slice(0, 3)
    ds = rd.from_arrow(emb)
    bf = brute_force_topk(ds, queries, k=10).select(
        ["query_id", "rank", "neighbor_id"]
    )
    out = pq_topk(ds, queries, k=10, m_sub=32, n_codes=256, shortlist=64).select(
        ["query_id", "rank", "neighbor_id"]
    )
    assert out.equals(bf)


def test_pq_raw_adc_recall_floor(emb):
    from raydatax.ann import pq_topk

    queries = emb.slice(0, 3)
    ds = rd.from_arrow(emb)
    bf = brute_force_topk(ds, queries, k=10)
    raw = pq_topk(ds, queries, k=10, m_sub=32, n_codes=256, rerank=False)
    bf_ids = {(r["query_id"], r["neighbor_id"]) for r in bf.to_pylist()}
    raw_ids = {(r["query_id"], r["neighbor_id"]) for r in raw.to_pylist()}
    # quantized-only scoring is approximate; on this corpus it stays well
    # above chance — the rerank test above is the exactness contract
    assert len(raw_ids & bf_ids) / len(bf_ids) >= 0.6


def test_pq_encode_compresses_to_uint8_codes(emb):
    from raydatax.ann import pq_encode, pq_fit

    sample = np.stack(
        [np.asarray(v, dtype=np.float64) for v in emb["embedding"].to_pylist()[:256]]
    )
    books = pq_fit(sample, m_sub=8, n_codes=16)
    assert books.shape == (8, 16, 8)
    codes = pq_encode(rd.from_arrow(emb), books).take_all()
    assert len(codes) == emb.num_rows
    c0 = codes[0]["pq_code"]
    assert len(c0) == 8 and all(0 <= int(c) < 16 for c in c0)


def test_pq_fit_rejects_indivisible_dim():
    from raydatax.ann import pq_fit

    with pytest.raises(ValueError):
        pq_fit(np.ones((10, 10)), m_sub=3)


def test_ivf_pq_recall_and_probed_exactness(emb):
    from raydatax.ann import ivf_pq_topk

    queries = emb.slice(0, 3)
    ds = rd.from_arrow(emb)
    out = ivf_pq_topk(ds, queries, k=10, n_clusters=8, nprobe=4)
    bf = brute_force_topk(ds, queries, k=10)
    bf_ids = {(r["query_id"], r["neighbor_id"]) for r in bf.to_pylist()}
    got_ids = {(r["query_id"], r["neighbor_id"]) for r in out.to_pylist()}
    # the self-match always lives in the query's own (probed) cluster
    assert all((q, q) in got_ids for q in (0, 1, 2))
    assert len(got_ids & bf_ids) / len(bf_ids) >= 0.6


# ------------------------------------------------------- kmeans_fit


def test_kmeans_fit_separated_blobs(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raydatax.ann import kmeans_fit_distributed

    rng = np.random.default_rng(5)
    blobs = np.concatenate([
        rng.normal(loc=c, scale=0.05, size=(50, 8))
        for c in (0.0, 5.0, -5.0)
    ]).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(range(150), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in blobs],
                              pa.list_(pa.float32())),
    })
    cent, counts = kmeans_fit_distributed(rd.from_arrow(t), k=3, iters=5)
    assert sorted(counts) == [50, 50, 50]
    means = sorted(cent.mean(axis=1))
    assert abs(means[0] + 5) < 0.2 and abs(means[1]) < 0.2 and abs(means[2] - 5) < 0.2


def test_kmeans_fit_empty_cluster_keeps_centroid(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raydatax.ann import kmeans_fit_distributed

    # two far blobs, k=3 seeded from the first 3 rows (all in blob A):
    # at least one cluster empties; its centroid must stay finite
    vecs = np.concatenate([
        np.full((20, 4), 0.0), np.full((20, 4), 9.0)
    ]) + np.linspace(0, 0.01, 40)[:, None]
    t = pa.table({
        "vec_id": pa.array(range(40), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    cent, counts = kmeans_fit_distributed(rd.from_arrow(t), k=3, iters=3)
    assert int(counts.sum()) == 40
    assert np.isfinite(cent).all()
