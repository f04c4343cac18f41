"""Vectorized per-record transformer surface (DataX `dx_*` parity).

The reference applies a sequential per-record UDF chain between reader and
writer (``/root/reference/core/.../exchanger/TransformerExchanger.java:
53-127``); each transformer implements ``evaluate(Record, paras...)`` and is
registered under a ``dx_`` name (``core/.../transformer/TransformerRegistry.
java:28-40``; semantics doc ``transformer/doc/transformer.md:12-108``).

Here each transformer is a **vectorized Arrow batch function** (column in,
column out) plus a registry mirroring TransformerRegistry, composed into a
single ``map_batches`` stage via :func:`chain` — one Python call per batch,
zero per-row work.  Null semantics follow the reference: null input passes
through untouched (e.g. SubstrTransformer.java:37-40).

Transformers (reference file:line for each):
- dx_substr   — SubstrTransformer.java:21-64
- dx_pad      — PadTransformer.java:21-89
- dx_replace  — ReplaceTransformer.java:21-64
- dx_filter   — FilterTransformer.java:20-311 (like / not like / comparisons)
- dx_url      — UrlTransformer.java:33-99 (fork addition)
- dx_groovy's escape hatch → any Python callable on the Arrow batch
"""

from __future__ import annotations

from collections.abc import Callable
from urllib.parse import parse_qs, urlsplit

import pyarrow as pa
import pyarrow.compute as pc


def _col(batch: pa.Table, name: str) -> pa.ChunkedArray:
    if name not in batch.column_names:
        raise KeyError(f"transformer references unknown column {name!r}")
    return batch.column(name)


def _set_col(batch: pa.Table, name: str, arr) -> pa.Table:
    i = batch.schema.get_field_index(name)
    return batch.set_column(i, name, arr)


# ------------------------------------------------------------- transformers


def dx_substr(batch: pa.Table, column: str, start: int, length: int) -> pa.Table:
    """Substring [start, start+length) by codeunit; null passes through.
    Unlike the reference (start beyond the string is a dirty record,
    SubstrTransformer.java:55-58) an out-of-range start yields '' — the
    vectorized-friendly total version; the dirty path is covered by the
    engine's dead-letter split instead."""
    s = pc.utf8_slice_codeunits(_col(batch, column), start, start + length)
    return _set_col(batch, column, s)


def dx_pad(batch: pa.Table, column: str, side: str, length: int, pad: str) -> pa.Table:
    """Pad to `length` on the left ('l') or right ('r'); longer strings are
    truncated to `length` (PadTransformer.java:60-88)."""
    col = _col(batch, column)
    trunc = pc.utf8_slice_codeunits(col, 0, length)
    if side == "l":
        out = pc.utf8_lpad(trunc, width=length, padding=pad)
    elif side == "r":
        out = pc.utf8_rpad(trunc, width=length, padding=pad)
    else:
        raise ValueError(f"dx_pad side must be 'l' or 'r', got {side!r}")
    return _set_col(batch, column, out)


def dx_replace(batch: pa.Table, column: str, start: int, length: int, replace: str) -> pa.Table:
    """Positional splice: keep [0,start), insert `replace`, keep
    [start+length, ...) (ReplaceTransformer.java:45-63)."""
    col = _col(batch, column)
    head = pc.utf8_slice_codeunits(col, 0, start)
    tail = pc.utf8_slice_codeunits(col, start + length, 1 << 30)
    out = pc.binary_join_element_wise(head, replace, tail, "")
    return _set_col(batch, column, out)


_COMPARE = {
    ">": pc.greater, "<": pc.less, "=": pc.equal, "==": pc.equal,
    "!=": pc.not_equal, ">=": pc.greater_equal, "<=": pc.less_equal,
}


def dx_filter(batch: pa.Table, column: str, op: str, value) -> pa.Table:
    """DROP records matching the predicate (FilterTransformer semantics:
    matching records are removed from the stream, returning-null-filters —
    FilterTransformer.java:74-76,134-136).  `like` is a full-match regex as
    in Java ``Pattern.matches`` (FilterTransformer.java:216-230); null
    columns never match a comparison and are kept, matching the reference's
    null rules (lines 205-212)."""
    col = _col(batch, column)
    if op in ("like", "not like"):
        m = pc.match_substring_regex(pc.cast(col, pa.string()), f"^(?:{value})$")
        if op == "not like":
            m = pc.invert(m)
    else:
        try:
            cmp = _COMPARE[op]
        except KeyError:
            raise ValueError(f"dx_filter: unsupported op {op!r}") from None
        if pa.types.is_string(col.type):
            m = cmp(col, pa.scalar(str(value)))
        else:
            m = cmp(col, pa.scalar(float(value)).cast(col.type)
                    if pa.types.is_floating(col.type) else pa.scalar(value))
    keep = pc.invert(pc.fill_null(m, False))  # null comparison -> keep
    return batch.filter(keep)


_URL_PARTS = ("scheme", "host", "path", "query", "fragment")


def dx_url(batch: pa.Table, column: str, parts: tuple[str, ...] = _URL_PARTS,
           param: str | None = None) -> pa.Table:
    """URL field extraction (fork's UrlTransformer.java:33-99): appends
    `<column>_<part>` columns; optionally a single query parameter.  Parsing
    is per-distinct-value (urlsplit is not vectorizable) — acceptable because
    URL columns are typically low-cardinality per batch; for high-cardinality
    use a regex-based map_batches instead."""
    col = pc.cast(_col(batch, column), pa.string())
    enc = pc.dictionary_encode(col.combine_chunks())
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.chunk(0)
    dictionary = enc.dictionary.to_pylist()
    parsed = []
    for u in dictionary:
        try:
            sp = urlsplit(u)
            row = {"scheme": sp.scheme, "host": sp.hostname or "", "path": sp.path,
                   "query": sp.query, "fragment": sp.fragment}
            if param is not None:
                row["param"] = (parse_qs(sp.query).get(param) or [None])[0]
        except ValueError:
            row = dict.fromkeys((*_URL_PARTS, "param"), None)
        parsed.append(row)
    idx = enc.indices
    for part in parts:
        vals = pa.array([p[part] for p in parsed], type=pa.string())
        batch = batch.append_column(f"{column}_{part}", vals.take(idx))
    if param is not None:
        vals = pa.array([p["param"] for p in parsed], type=pa.string())
        batch = batch.append_column(f"{column}_{param}", vals.take(idx))
    return batch


# ------------------------------------------------------ registry + chaining

def _normalize_transformer(batch: pa.Table, column: str = "text") -> pa.Table:
    """normalize_text as a chainable transformer: REPLACES the column in
    place (chain semantics), instead of appending ``norm``."""
    from .text import normalize_text

    out = normalize_text(batch, column, out="__norm")
    i = out.schema.get_field_index(column)
    return out.set_column(i, column, out["__norm"]).drop_columns(["__norm"])


def _redact_transformer(batch: pa.Table, column: str = "text") -> pa.Table:
    """PII redaction as a chainable transformer (in-place column)."""
    from .text import RedactPii

    out = RedactPii(column=column, out="__red")(batch)
    i = out.schema.get_field_index(column)
    return out.set_column(i, column, out["__red"]).drop_columns(["__red"])


REGISTRY: dict[str, Callable[..., pa.Table]] = {
    "dx_substr": dx_substr,
    "dx_pad": dx_pad,
    "dx_replace": dx_replace,
    "dx_filter": dx_filter,
    "dx_url": dx_url,
    # engine-provided externals (non-dx_ namespace, like user plugins):
    # the text-prep stages usable from job JSON transformer chains
    "normalize_text": _normalize_transformer,
    "redact_pii": _redact_transformer,
}


def register(name: str, fn: Callable[..., pa.Table]) -> None:
    """External-transformer hook (TransformerRegistry.java:42-109); unlike
    native ones, external names must NOT start with dx_ (lines 149-165)."""
    if name.startswith("dx_"):
        raise ValueError("external transformer names must not start with 'dx_'")
    REGISTRY[name] = fn


def chain(specs: list[tuple]) -> Callable[[pa.Table], pa.Table]:
    """Compose a transformer chain into ONE map_batches function —
    the Ray-Data replacement for the per-record TransformerExchanger loop.

    specs: [(name, arg1, arg2, ...), ...] applied in order.
    Usage: ``ds.map_batches(chain([("dx_substr", "text", 0, 10)]),
    batch_format="pyarrow")``
    """
    resolved = [(REGISTRY[name], args) for name, *args in (tuple(s) for s in specs)]

    def apply(batch: pa.Table) -> pa.Table:
        for fn, args in resolved:
            batch = fn(batch, *args)
        return batch

    return apply


class JsonExtract:
    """JSON-column field extraction as a stateful actor stage — the
    semi-structured payload step every log pipeline runs (the reference's
    closest analogue is mongodbreader's dotted docPaths,
    ``/root/reference/mongodbreader/.../MongoDBReader.java`` document
    flattening; here it is a first-class transformer over a STRING column
    holding JSON).

    ``paths``: {out_col: dot.path}.  Parsing is real (``json.loads`` per
    value — JSON is an inherently per-item codec, same boundary as
    DecodeMedia), but it runs inside an actor pool with the parser bound
    once, and each batch converts through one ``to_pylist()`` round trip
    rather than per-row Arrow scalars.  Missing paths / invalid JSON →
    NULL (never an error: dirty payloads are data, not crashes).
    Extracted values are emitted as strings (the lossless common form;
    cast downstream), matching SQL ``json_extract_string``."""

    def __init__(self, column: str, paths: dict[str, str]):
        import json

        self.column = column
        self.paths = {out: p.split(".") for out, p in paths.items()}
        self._loads = json.loads

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = batch[self.column].to_pylist()
        outs: dict[str, list] = {out: [] for out in self.paths}
        for v in vals:
            doc = None
            if v is not None:
                try:
                    doc = self._loads(v)
                except (ValueError, TypeError):
                    doc = None
            for out, path in self.paths.items():
                cur = doc
                for part in path:
                    if isinstance(cur, dict):
                        cur = cur.get(part)
                    else:
                        cur = None
                        break
                if cur is None or isinstance(cur, (dict, list)):
                    outs[out].append(None)
                elif isinstance(cur, bool):
                    outs[out].append("true" if cur else "false")
                elif isinstance(cur, float):
                    outs[out].append(repr(cur))
                else:
                    outs[out].append(str(cur))
        for out in self.paths:
            batch = batch.append_column(out, pa.array(outs[out], pa.string()))
        return batch
