"""Relational operator surface, Ray-Data-first.

The reference is an ELT mover whose only "query surface" is projection /
filter / per-record map / upsert-by-key (SURVEY.md §2.5) — everything wider
lives here, built from first principles on Ray Data:

- **partial pre-aggregation** before every groupby (combine inside
  ``map_batches`` with pyarrow's own hash aggregation, then shuffle only the
  tiny partials) — at 100 TB the shuffle moves per-key partials, not rows;
- **broadcast joins** for small sides (``ray.put`` once, Arrow hash-join
  per batch inside the tasks) — no shuffle at all;
- **top-k** as per-block partial top-k + driver merge of ≤ k·blocks rows;
- **generic LWW latest-by-version** (the CDC upsert as a standalone
  operator over arbitrary key/seq columns);
- tumbling **windows** as truncated-timestamp pre-aggregated groupbys;
  **sessionization** as sorted per-key ``map_groups``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Max, Min, Sum

# ----------------------------------------------------------- pre-aggregation

_PARTIAL_FUNCS = {"sum": "sum", "count": "count", "min": "min", "max": "max"}
_MERGE_AGG = {"sum": Sum, "count": Sum, "min": Min, "max": Max}

# Partial-row count at or under which the final merge runs as one Arrow hash
# aggregation on the driver (skipping a whole shuffle round).  The decision
# is made from block METADATA — see preagg_groupby.
DRIVER_MERGE_THRESHOLD = 200_000

# Indirection for the driver-side fetch so tests can assert the distributed
# path never pulls partial blocks to the driver.
_fetch_partials = ray.get


def preagg_groupby(
    ds: "ray.data.Dataset",
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    mean_of: list[tuple[str, str, str]] | None = None,
    driver_merge_threshold: int = DRIVER_MERGE_THRESHOLD,
) -> "ray.data.Dataset":
    """Grouped aggregation with in-batch combining.

    ``aggs``: (column, fn, out_name) with fn in sum|count|min|max.
    ``mean_of``: (sum_name, count_name, out_name) computed after the merge.

    Stage 1 runs pyarrow's hash aggregation inside every batch (one partial
    row per key per batch); stage 2 shuffles only the partials — the
    pre-aggregate-then-groupby discipline for scale.
    """
    partial_specs = []
    out_names = []
    for col, fn, out in aggs:
        partial_specs.append((col, _PARTIAL_FUNCS[fn]))
        out_names.append((f"{col}_{_PARTIAL_FUNCS[fn]}", fn, out))

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(keys).aggregate(partial_specs)

    # Adaptive final merge, decided WITHOUT driver materialization: execute
    # the partial stage once (blocks stay in the object store), read the
    # total partial row count from block METADATA (``count()`` on a
    # materialized dataset sums cached per-block num_rows — no block is
    # fetched), and only then choose.  Small partial sets are combined on
    # the driver with one Arrow hash aggregation — skipping a whole Ray
    # shuffle round; large (high-cardinality-key) ones go through the
    # distributed groupby and the driver never holds them.
    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    total_partial_rows = partials.count()
    if total_partial_rows == 0:
        out = partials  # empty input: keep the (empty) dataset shape
    elif total_partial_rows <= driver_merge_threshold:
        tables = [t for t in _fetch_partials(partials.to_arrow_refs()) if t.num_rows]
        merged = pa.concat_tables(tables, promote_options="permissive")
        agg_specs = []
        renames = {}
        for partial_name, fn, out_name in out_names:
            arrow_fn = "sum" if fn in ("sum", "count") else fn
            agg_specs.append((partial_name, arrow_fn))
            renames[f"{partial_name}_{arrow_fn}"] = out_name
        final = merged.group_by(keys).aggregate(agg_specs)
        final = final.rename_columns(
            [renames.get(c, c) for c in final.column_names]
        )
        # column order parity with the distributed path: keys first
        final = final.select(keys + [o for _, _, o in out_names])
        out = ray.data.from_arrow(final)
    else:
        merge_aggs = [
            _MERGE_AGG[fn](partial_name, alias_name=out)
            for partial_name, fn, out in out_names
        ]
        out = partials.groupby(keys).aggregate(*merge_aggs)
    if mean_of:
        def add_means(batch: pa.Table) -> pa.Table:
            for s, c, name in mean_of:
                batch = batch.append_column(
                    name, pc.divide(pc.cast(batch[s], pa.float64()), pc.cast(batch[c], pa.float64()))
                )
            return batch
        out = out.map_batches(add_means, batch_format="pyarrow")
    return out


def melt(
    ds: "ray.data.Dataset",
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> "ray.data.Dataset":
    """Unpivot (wide → long): each row becomes ``len(value_cols)`` rows of
    ``id_cols + (var_name, value_name)`` — SQL ``UNPIVOT`` / pandas
    ``melt``.  Purely batch-local (one vertical concat of column slices per
    batch, value columns cast to a common type); no shuffle, so it
    parallelizes like any map stage at 100-TB scale."""
    if not value_cols:
        raise ValueError("melt: value_cols must be non-empty")

    def f(t: pa.Table) -> pa.Table:
        types = [t.schema.field(c).type for c in value_cols]
        target = types[0]
        for typ in types[1:]:
            target = pa.unify_schemas(
                [pa.schema([("v", target)]), pa.schema([("v", typ)])],
                promote_options="permissive",
            ).field("v").type
        parts = []
        for c in value_cols:
            part = t.select(id_cols)
            part = part.append_column(var_name, pa.array([c] * t.num_rows))
            part = part.append_column(value_name, t[c].cast(target))
            parts.append(part)
        return pa.concat_tables(parts)

    return ds.map_batches(f, batch_format="pyarrow")


def pivot(
    ds: "ray.data.Dataset",
    key: str,
    pivot_col: str,
    value_col: str,
    values: list[str],
    agg: str = "sum",
) -> "ray.data.Dataset":
    """Pivot (long → wide): one output column per entry in ``values``,
    aggregated with ``agg`` (sum|count) — SQL conditional aggregation
    (``SUM(CASE WHEN pivot = v THEN value END)``).

    The pivot values must be enumerated (same contract as SQL PIVOT ... IN
    (...)): each batch emits the conditional columns locally, then ONE
    pre-aggregated groupby on ``key`` shuffles partials only — never the
    raw rows."""
    if agg not in ("sum", "count"):
        raise ValueError(f"pivot: agg must be sum|count, got {agg}")

    def widen(t: pa.Table) -> pa.Table:
        out = {key: t[key]}
        for v in values:
            mask = pc.equal(t[pivot_col], v)
            out[v] = pc.if_else(mask, t[value_col], pa.nulls(t.num_rows, t[value_col].type))
        return pa.table(out)

    wide = ds.map_batches(widen, batch_format="pyarrow")
    return preagg_groupby(wide, [key], [(v, agg, v) for v in values])


def _hll_finalize(h: np.ndarray) -> np.ndarray:
    # full splitmix64 avalanche ON TOP of the engine hash: HLL needs
    # every bit uniform (register index = top bits, rank = low-bit
    # zeros) and the partitioner's single-round mix measurably biases
    # sequential integers (est 66k for 40k distinct).  Local to the
    # sketch — the lake partition hash is frozen state and stays as-is.
    with np.errstate(over="ignore"):
        h = h + np.uint64(0x9E3779B97F4A7C15)
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return h ^ (h >> np.uint64(31))


def _hll_hash(a: "pa.Array") -> np.ndarray:
    from .partition import hash_ints, hash_string_column

    if pa.types.is_string(a.type) or pa.types.is_large_string(a.type):
        h = hash_string_column(a)
    else:
        h = hash_ints(a.to_numpy(zero_copy_only=False))
    return _hll_finalize(h)


def _hll_idx_rank(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    # bit length via frexp: exact for w < 2^53 (here w < 2^(64-p),
    # p >= 11 keeps it inside the float53 window; smaller p only
    # loses the rank of astronomically-rare deep-zero tails)
    bl = np.frexp(w.astype(np.float64))[1]
    rank = np.where(w == 0, 64 - p + 1, 64 - p - bl + 1).astype(np.uint8)
    return idx, rank


def _hll_estimate(regs: np.ndarray) -> int:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting (small-range bias)
    return int(round(est))


def approx_count_distinct(
    ds: "ray.data.Dataset",
    col: str,
    p: int = 14,
) -> int:
    """HyperLogLog approximate count-distinct — the mergeable-sketch
    pattern for "how many distinct users in 100 TB" without shuffling a
    single key: every batch reduces to a 2^p-register sketch (one row),
    registers max-merge associatively, and only the tiny sketches reach the
    driver (blocks × 2^p bytes — bounded, documented).  Standard-error
    ≈ 1.04/sqrt(2^p) (~0.8% at the default p=14) away from the crossover;
    classic corrections only (linear counting under 2.5·m — NO HLL++ bias
    table), so in the crossover zone n ≈ 2.5·2^p expect up to ~5% positive
    bias (measured +0.2..3.8% at n=40k, p=14).  Hashing is the engine's
    buffer-level kernel (:mod:`raydatax.partition`) plus a full splitmix64
    avalanche — zero Python objects per value."""
    if not 4 <= p <= 18:
        raise ValueError(f"approx_count_distinct: p must be 4..18, got {p}")
    m = 1 << p

    def sketch(t: pa.Table) -> pa.Table:
        regs = np.zeros(m, np.uint8)
        if t.num_rows:
            idx, rank = _hll_idx_rank(_hll_hash(t[col].combine_chunks()), p)
            np.maximum.at(regs, idx, rank)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    rows = ds.map_batches(sketch, batch_format="pyarrow").take_all()
    regs = np.zeros(m, np.uint8)
    for r in rows:
        regs = np.maximum(regs, np.frombuffer(r["regs"], np.uint8))
    return _hll_estimate(regs)


def grouped_approx_count_distinct(
    ds: "ray.data.Dataset",
    keys: list[str],
    col: str,
    p: int = 12,
    out_name: str = "approx_distinct",
) -> "ray.data.Dataset":
    """Per-key HLL — approximate distinct ``col`` per ``keys`` group
    ("distinct users per day over 100 TB") without ever shuffling a value:
    each batch emits ONE sketch row per key present (a 2^p-byte register
    blob built with a single flat ``maximum.at`` over key-offset register
    indices), and the groupby merges blobs with an elementwise max.  What
    shuffles is keys × batches sketch rows — independent of the number of
    distinct values.  Sized for moderate key counts with large per-key
    cardinalities (each sketch row is 2^p bytes; the default p=12 = 4 KB
    → ~1.6% standard error); for millions of groups use exact grouped
    count-distinct instead, the sketch no longer pays."""
    if not 4 <= p <= 16:
        raise ValueError(f"grouped_approx_count_distinct: p must be 4..16, got {p}")
    m = 1 << p

    def sketch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {k: t[k] for k in keys}
            cols["regs"] = pa.array([], pa.binary())
            return pa.table(cols)
        # integer-encode the (possibly composite) key per batch
        s = t.sort_by([(k, "ascending") for k in keys])
        _, newkey = _segment_starts(s, keys)
        key_idx = np.cumsum(newkey.astype(np.int64)) - 1
        heads = np.flatnonzero(newkey)
        n_keys = len(heads)
        idx, rank = _hll_idx_rank(_hll_hash(s[col].combine_chunks()), p)
        flat = np.zeros(n_keys * m, np.uint8)
        np.maximum.at(flat, key_idx * m + idx, rank)
        blobs = flat.reshape(n_keys, m).tobytes()
        head_arr = pa.array(heads)
        cols = {k: s.column(k).take(head_arr) for k in keys}
        cols["regs"] = pa.array(
            [blobs[i * m:(i + 1) * m] for i in range(n_keys)], pa.binary()
        )
        return pa.table(cols)

    partials = ds.map_batches(sketch, batch_format="pyarrow")

    def merge_group(group: pa.Table) -> pa.Table:
        regs = np.zeros(m, np.uint8)
        for b in group["regs"].to_pylist():
            regs = np.maximum(regs, np.frombuffer(b, np.uint8))
        cols = {k: group.column(k).slice(0, 1) for k in keys}
        cols[out_name] = pa.array([_hll_estimate(regs)], pa.int64())
        return pa.table(cols)

    return partials.groupby(keys).map_groups(merge_group, batch_format="pyarrow")


def grouped_corr(
    ds: "ray.data.Dataset",
    keys: list[str],
    x: str,
    y: str,
    cov_name: str = "covar_samp",
    corr_name: str = "corr",
    n_name: str = "n_rows",
) -> "ray.data.Dataset":
    """Per-key sample covariance and Pearson correlation from ONE pass of
    mergeable partials (count, Σx, Σy, Σx², Σy², Σxy) — the bivariate
    sibling of :func:`grouped_stats`; raw rows never shuffle.  Integer
    inputs keep every merged sum exact, so the derived IEEE expressions
    reproduce bit-for-bit against SQL computing the same formulas
    (cov = (Σxy − ΣxΣy/n)/(n−1); corr = cov·(n−1) / sqrt((Σx²−Σx²/n)
    ·(Σy²−Σy²/n)) with null when either variance is 0 or n < 2).
    Products are overflow-checked."""
    sq_x, sq_y, xy = f"__{x}_sq", f"__{y}_sq", f"__{x}_{y}"

    def add_products(t: pa.Table) -> pa.Table:
        return (
            t.append_column(sq_x, pc.multiply_checked(t[x], t[x]))
            .append_column(sq_y, pc.multiply_checked(t[y], t[y]))
            .append_column(xy, pc.multiply_checked(t[x], t[y]))
        )

    agg = preagg_groupby(
        ds.map_batches(add_products, batch_format="pyarrow"),
        keys,
        [
            (x, "count", n_name),
            (x, "sum", "__sx"), (y, "sum", "__sy"),
            (sq_x, "sum", "__sxx"), (sq_y, "sum", "__syy"), (xy, "sum", "__sxy"),
        ],
    )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t[n_name], pa.float64())
        sx = pc.cast(t["__sx"], pa.float64())
        sy = pc.cast(t["__sy"], pa.float64())
        sxx = pc.cast(t["__sxx"], pa.float64())
        syy = pc.cast(t["__syy"], pa.float64())
        sxy = pc.cast(t["__sxy"], pa.float64())
        nulls = pa.nulls(t.num_rows, pa.float64())
        multi = pc.greater(n, 1.0)
        num = pc.subtract(sxy, pc.divide(pc.multiply(sx, sy), n))
        cov = pc.if_else(multi, pc.divide(num, pc.subtract(n, 1.0)), nulls)
        ssx = pc.subtract(sxx, pc.divide(pc.multiply(sx, sx), n))
        ssy = pc.subtract(syy, pc.divide(pc.multiply(sy, sy), n))
        denom_ok = pc.and_(multi, pc.and_(pc.greater(ssx, 0.0), pc.greater(ssy, 0.0)))
        corr = pc.if_else(
            denom_ok, pc.divide(num, pc.sqrt(pc.multiply(ssx, ssy))), nulls
        )
        cols = {k: t[k] for k in keys}
        cols[n_name] = t[n_name]
        cols[cov_name] = cov
        cols[corr_name] = corr
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow")


def deterministic_sample(
    ds: "ray.data.Dataset",
    key: str,
    permille: int,
    modulus: int = 1_000_003,
    multiplier: int = 2654435761,
) -> "ray.data.Dataset":
    """Reproducible hash sampling: keep a row iff
    ``((key % modulus) * multiplier) % 1000 < permille`` — plain integer
    arithmetic any engine can evaluate identically (the ``% modulus`` keeps
    the product inside int64), so the sample is stable across runs,
    engines, and partitionings — unlike RNG-based sampling.  The exact
    version of the reference's sample-based split estimation
    (/root/reference/plugin-rdbms-util/.../reader/util/
    SingleTableSplitUtil.java:293-388, Oracle SAMPLE split).  Batch-local
    filter: no shuffle, no state.  ``key`` must be a non-negative integer
    column (negative dividends differ between C-style and floored mod)."""
    if not 0 <= permille <= 1000:
        raise ValueError(f"deterministic_sample: permille must be 0..1000, got {permille}")

    def f(t: pa.Table) -> pa.Table:
        v = t[key].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        mask = ((v % modulus) * multiplier) % 1000 < permille
        return t.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow")


def hash_split(
    ds: "ray.data.Dataset",
    key: str,
    test_permille: int,
    modulus: int = 1_000_003,
    multiplier: int = 2654435761,
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """Deterministic train/test split: (train, test) datasets partitioned
    by the same engine-independent integer arithmetic as
    :func:`deterministic_sample` — the two sides are exact complements, a
    row's side never changes across runs/partitionings, and keeping the
    KEY (not the row) as the split unit means all rows of one key land on
    one side (no leakage between splits when ``key`` identifies the
    entity).  Batch-local; no shuffle."""
    if not 0 <= test_permille <= 1000:
        raise ValueError(
            f"hash_split: test_permille must be 0..1000, got {test_permille}"
        )

    def side(test: bool):
        def f(t: pa.Table) -> pa.Table:
            v = t[key].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            mask = ((v % modulus) * multiplier) % 1000 < test_permille
            return t.filter(pa.array(mask if test else ~mask))

        return f

    return (
        ds.map_batches(side(False), batch_format="pyarrow"),
        ds.map_batches(side(True), batch_format="pyarrow"),
    )


def mix_corpora(
    sources: list[tuple["ray.data.Dataset", str, int]],
    tag_name: str = "source",
) -> "ray.data.Dataset":
    """Weighted corpus mixing for training-data assembly: each source is
    ``(dataset, label, permille)`` — the deterministic hash-sampled
    fraction of each corpus, tagged with its label, unioned into one
    stream.  Sampling needs a stable key, so every source dataset must
    carry an integer column named ``_mix_key`` (document id, event id);
    a row is kept iff its key hash falls under the source's permille
    (:func:`deterministic_sample` arithmetic), making the mix
    reproducible run-to-run and resumable mid-stream — membership never
    depends on ordering or partitioning."""
    if not sources:
        raise ValueError("mix_corpora: at least one source required")
    parts = []
    for ds, label, permille in sources:
        sampled = deterministic_sample(ds, "_mix_key", permille)
        parts.append(
            sampled.map_batches(
                lambda t, label=label: t.append_column(
                    tag_name, pa.array([label] * t.num_rows)
                ),
                batch_format="pyarrow",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def set_distinct(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    op: str,
) -> "ray.data.Dataset":
    """Distinct set operations — SQL ``INTERSECT`` / ``EXCEPT`` over whole
    rows: tag each side with presence flags, union, then ONE pre-aggregated
    groupby on all columns (per-batch combining first, so only distinct
    (row, flags) partials shuffle), and filter on the merged flags.  NULLs
    compare equal, as in SQL set ops (Arrow group_by groups nulls)."""
    if op not in ("intersect", "except"):
        raise ValueError(f"set_distinct: op must be intersect|except, got {op}")
    lcols, rcols = left.schema().names, right.schema().names
    if lcols != rcols:
        raise ValueError(f"set_distinct: column mismatch {lcols} vs {rcols}")

    def tag(l_flag: int, r_flag: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "__l", pa.array(np.full(t.num_rows, l_flag, np.int8))
            ).append_column("__r", pa.array(np.full(t.num_rows, r_flag, np.int8)))

        return f

    both = left.map_batches(tag(1, 0), batch_format="pyarrow").union(
        right.map_batches(tag(0, 1), batch_format="pyarrow")
    )
    flagged = preagg_groupby(
        both, lcols, [("__l", "max", "__l"), ("__r", "max", "__r")]
    )
    keep = (
        (lambda t: pc.and_(pc.equal(t["__l"], 1), pc.equal(t["__r"], 1)))
        if op == "intersect"
        else (lambda t: pc.and_(pc.equal(t["__l"], 1), pc.equal(t["__r"], 0)))
    )
    return flagged.map_batches(
        lambda t: t.filter(keep(t)).drop_columns(["__l", "__r"]),
        batch_format="pyarrow",
    )


def pivot_auto(
    ds: "ray.data.Dataset",
    key: str,
    pivot_col: str,
    value_col: str,
    agg: str = "sum",
    max_values: int = 1000,
) -> "ray.data.Dataset":
    """:func:`pivot` with the pivot values DISCOVERED from the data (the
    pandas-pivot convenience): one tiny distinct pass over ``pivot_col``
    (pre-aggregated, counted from metadata), sorted for a deterministic
    column order, then the enumerated pivot.  Capped at ``max_values`` —
    a pivot is a schema, and a schema with thousands of data-derived
    columns is an error, not a feature."""
    distinct = preagg_groupby(
        ds.select_columns([pivot_col]), [pivot_col], [(pivot_col, "count", "__c")]
    ).select_columns([pivot_col]).materialize()
    n = distinct.count()
    if n > max_values:
        raise ValueError(
            f"pivot_auto: {n} distinct pivot values exceeds max_values="
            f"{max_values}; enumerate explicitly with pivot() if intended"
        )
    tables = [t for t in _fetch_partials(distinct.to_arrow_refs()) if t.num_rows]
    values = sorted(
        v for t in tables for v in t[pivot_col].to_pylist() if v is not None
    )
    return pivot(ds, key, pivot_col, value_col, values, agg)


def grouped_stats(
    ds: "ray.data.Dataset",
    keys: list[str],
    col: str,
    n_name: str = "n_rows",
    sum_name: str | None = None,
    mean_name: str | None = None,
    var_name: str | None = None,
    std_name: str | None = None,
) -> "ray.data.Dataset":
    """Per-key count / sum / mean / sample variance / sample stddev from ONE
    pass of mergeable partials — the distributed-variance combiner: each
    batch contributes (count, sum, sum-of-squares), the groupby merges sums,
    and the moments are derived after the merge.  Raw rows never shuffle.

    ``col`` should be an integer column (e.g. exact cents) so the merged
    partials are accumulation-order-exact; the derived moments are then a
    fixed IEEE expression over exact integers — reproducible bit-for-bit
    against SQL computing the same expression.  Squares are overflow-checked
    (at 100-TB scale route sums through decimal/float partials instead of
    letting int64 wrap).  Keys with a single row get null var/std
    (``var_samp`` semantics)."""
    sum_name = sum_name or f"sum_{col}"
    mean_name = mean_name or f"mean_{col}"
    var_name = var_name or f"var_{col}"
    std_name = std_name or f"std_{col}"
    sq = f"__{col}_sq"

    def add_sq(t: pa.Table) -> pa.Table:
        return t.append_column(sq, pc.multiply_checked(t[col], t[col]))

    agg = preagg_groupby(
        ds.map_batches(add_sq, batch_format="pyarrow"),
        keys,
        [(col, "count", n_name), (col, "sum", sum_name), (sq, "sum", "__ssq")],
    )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t[n_name], pa.float64())
        s = pc.cast(t[sum_name], pa.float64())
        ssq = pc.cast(t["__ssq"], pa.float64())
        mean = pc.divide(s, n)
        var = pc.divide(
            pc.subtract(ssq, pc.divide(pc.multiply(s, s), n)),
            pc.subtract(n, 1.0),
        )
        multi = pc.greater(n, 1.0)
        var = pc.if_else(multi, var, pa.nulls(t.num_rows, pa.float64()))
        # clamp to 0 before sqrt: float cancellation can leave a tiny
        # negative variance when all values are equal (SQL side mirrors
        # this with sqrt(greatest(var, 0)))
        std = pc.sqrt(pc.max_element_wise(var, 0.0, skip_nulls=False))
        return (
            t.drop_columns(["__ssq"])
            .append_column(mean_name, mean)
            .append_column(var_name, var)
            .append_column(std_name, std)
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# -------------------------------------------------------------- joins


def _join_partitions(requested: int) -> int:
    """Clamp join partition count to the session's CPU budget: the native
    hash join spins one aggregator actor per partition, and a pool larger
    than ~2× the CPUs just queues (and can starve a small test session)."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, min(requested, cpus * 2))


def broadcast_join(
    ds: "ray.data.Dataset",
    small: pa.Table,
    keys: list[str] | str,
    join_type: str = "inner",
) -> "ray.data.Dataset":
    """Join against a broadcast small side (dimension table).  The small
    table is put in the object store ONCE and hash-joined (Arrow) inside
    every task — never re-shipped per batch, never shuffled (the pattern the
    reference can't express; its only join-like op is target-side upsert)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    ref = ray.put(small)

    class JoinBatch:
        def __init__(self):
            self.small = ray.get(ref)  # once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.join(self.small, keys=keys, join_type=join_type)

    return ds.map_batches(JoinBatch, batch_format="pyarrow", concurrency=(1, 8))


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str | list[str],
    join_type: str = "inner",
    num_partitions: int = 32,
    portable: bool = False,
) -> "ray.data.Dataset":
    """Both-sides-large join: hash-partitioned on the key.

    Uses the native ``Dataset.join`` (hash-partitioned aggregator actors)
    when this Ray version provides it; otherwise falls back to the portable
    bucket pattern — add ``__b = hash(key) % B`` to both sides, tag, union,
    ``groupby(__b)`` and Arrow-join matching buckets pairwise inside
    ``map_groups``.  Skewed keys: pre-salt hot keys before calling (same
    discipline as the CDC partitioner).

    ``portable=True`` forces the bucket pattern even when the native join
    exists — chained joins prefer it: the native JoinOperator both spins a
    fresh aggregator-actor pool per join (a fixed multi-second tax when
    the relations are small) and emits schema-less blocks for empty hash
    partitions that crash a DOWNSTREAM join without a repartition barrier
    (the hazard at :func:`semi_join`); the bucket pattern has neither
    problem."""
    on_t = (on,) if isinstance(on, str) else tuple(on)
    if hasattr(left, "join") and not portable:
        return left.join(
            right, join_type=join_type,
            num_partitions=_join_partitions(num_partitions), on=on_t,
        )

    # portable path: bucket + per-bucket Arrow join.  The two sides are
    # null-padded to ONE unified schema before the union — Ray's groupby
    # concatenates group rows across blocks, so mixed schemas would hand
    # join_bucket a single-side table and a KeyError
    import numpy as np
    from pandas.util import hash_array

    l_schema, r_schema = left.schema(), right.schema()
    l_cols = list(l_schema.names)
    r_cols = [c for c in r_schema.names if c not in on_t]
    clash = set(l_cols) & set(r_cols) - set(on_t)
    if clash:
        raise ValueError(f"hash_join(portable): column collision {sorted(clash)}")
    types = {c: l_schema.types[l_schema.names.index(c)] for c in l_cols}
    types.update({c: r_schema.types[r_schema.names.index(c)] for c in r_cols})
    all_cols = l_cols + r_cols

    def bucketed(side: str):
        def f(batch: pa.Table) -> pa.Table:
            h = np.zeros(batch.num_rows, dtype=np.uint64)
            for k in on_t:
                h ^= hash_array(
                    batch[k].to_numpy(zero_copy_only=False).astype(object), categorize=False
                )
            cols = {
                c: (batch[c] if c in batch.column_names
                    else pa.nulls(batch.num_rows, types[c]))
                for c in all_cols
            }
            cols["__b"] = pa.array((h % num_partitions).astype(np.int32))
            cols["__side"] = pa.array(np.full(batch.num_rows, side == "l"))
            return pa.table(cols)

        return f

    lb = left.map_batches(bucketed("l"), batch_format="pyarrow")
    rb = right.map_batches(bucketed("r"), batch_format="pyarrow")

    def join_bucket(group: pa.Table) -> pa.Table:
        is_l = group["__side"]
        lt = group.filter(is_l).select(list(on_t) + [c for c in l_cols if c not in on_t])
        rt = group.filter(pc.invert(is_l)).select(list(on_t) + r_cols)
        # Arrow spells join types with spaces ("left outer") where the
        # Dataset API uses underscores ("left_outer") — accept both here
        return lt.join(rt, keys=list(on_t), join_type=join_type.replace("_", " "))

    return lb.union(rb).groupby("__b").map_groups(join_bucket, batch_format="pyarrow")


def _join_key_hash(t: pa.Table, cols: list[str]) -> np.ndarray:
    """Deterministic uint64 hash of a join-key column tuple: polynomial
    combine of per-column mix64 hashes (strings hash the raw UTF-8 buffer,
    ints/timestamps their int64 value) — order-sensitive, zero Python
    objects on the path.  Used only for hot-key MEMBERSHIP in
    :func:`skew_join`, where a collision merely salts one extra cold key
    (more replication, never a wrong row)."""
    from .partition import _mix64, hash_ints, hash_string_column

    h = np.zeros(t.num_rows, np.uint64)
    with np.errstate(over="ignore"):
        for c in cols:
            col = t[c]
            typ = col.type
            if pa.types.is_string(typ) or pa.types.is_large_string(typ):
                hk = hash_string_column(col.combine_chunks())
            else:
                arr = col.to_numpy(zero_copy_only=False)
                if np.issubdtype(arr.dtype, np.floating):
                    raise ValueError(
                        f"skew_join: float join key {c!r} unsupported"
                    )
                hk = hash_ints(arr.astype(np.int64, copy=False))
            h = _mix64(h * np.uint64(0x100000001B3) + hk)
    return h


def approx_hot_join_keys(
    ds: "ray.data.Dataset",
    on: str | list[str],
    hot_share: float = 0.05,
    top_per_batch: int = 64,
    total: int | None = None,
) -> pa.Table:
    """Sampled hot-key detection for :func:`skew_join`: every batch
    contributes only its TOP-``top_per_batch`` per-key partial counts
    (space-saving-style truncation — per-block detection state is bounded
    no matter how many distinct keys a block holds), the partials are
    pre-agg-summed, and keys whose truncated count still reaches
    ``hot_share`` of the row total come back as a SMALL pyarrow table
    (≤ 1/hot_share rows by construction, since truncation only
    UNDERcounts).  A borderline hot key can be missed — that costs
    partition balance, never correctness: salting any subset of keys is
    semantics-preserving.  The same frequency-sampling idea as the CDC
    partitioner's :func:`raydatax.partition.detect_hot_keys` (and the
    reference's Oracle SAMPLE(x) split sampling,
    /root/reference/plugin-rdbms-util/.../SingleTableSplitUtil.java:293),
    applied to a join relation."""
    on_t = [on] if isinstance(on, str) else list(on)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(on_t).aggregate([([], "count_all")])
        if g.num_rows > top_per_batch:
            order = pc.sort_indices(
                g, sort_keys=[("count_all", "descending")]
            )
            g = g.take(order[:top_per_batch])
        return g.rename_columns(
            [("__hc" if n == "count_all" else n) for n in g.column_names]
        )

    if total is None:
        total = ds.count()
    empty = pa.table(
        {c: pa.array([], ds.schema().base_schema.field(c).type) for c in on_t}
    )
    if not total:
        return empty
    floor = max(int(np.ceil(hot_share * total)), 1)
    merged = preagg_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        on_t,
        [("__hc", "sum", "__hc")],
    )
    hot = merged.map_batches(
        lambda t: t.filter(pc.greater_equal(t["__hc"], floor)),
        batch_format="pyarrow",
    )
    tables = [t for t in ray.get(hot.to_arrow_refs()) if t.num_rows]
    if not tables:
        return empty
    return pa.concat_tables(tables).select(on_t)


def skew_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str | list[str],
    join_type: str = "inner",
    num_partitions: int = 32,
    salts: int = 8,
    hot_share: float = 0.05,
    hot_keys: pa.Table | None = None,
    portable: bool = False,
) -> "ray.data.Dataset":
    """Skew-aware large-large join: :func:`hash_join` partitions by the raw
    key, so one hot key holding 30% of the rows floods one partition.  Here
    detected hot keys are SALTED on the left (each hot row gets one of
    ``salts`` sub-keys) and REPLICATED on the right (each hot row appears
    once per salt), then the join runs on (key…, __s) — the hot key's rows
    spread over ``salts`` partitions instead of one.  This is the
    key-shuffle analogue of the reference's task/resource rebalancing
    (/root/reference/core/.../container/util/JobAssignUtil.java:20-57) and
    the same salting discipline as the CDC partitioner
    (:mod:`raydatax.partition`).

    Hot keys come from ``hot_keys`` (a small key table — pass one computed
    from a prior epoch's profile at 100-TB scale) or are detected with
    :func:`approx_hot_join_keys`, which executes the LEFT pipeline one
    extra time: hand the function an input that is cheap to re-execute (a
    parquet read) or pre-detected keys.  Membership is checked by uint64
    key hash broadcast once per actor; a hash collision only salts an
    extra cold key (more replication, never a wrong row).

    ``join_type`` is limited to ``inner`` / ``left_outer``: an unmatched
    RIGHT hot row would otherwise surface once per salt."""
    jt = join_type.replace(" ", "_")
    if jt == "left":
        jt = "left_outer"
    if jt not in ("inner", "left_outer"):
        raise ValueError(
            f"skew_join: join_type {join_type!r} unsupported (inner and "
            "left_outer only — replicated right rows would duplicate "
            "unmatched-right output)"
        )
    on_t = [on] if isinstance(on, str) else list(on)
    if hot_keys is None:
        hot_keys = approx_hot_join_keys(left, on_t, hot_share=hot_share)
    if hot_keys.num_rows == 0:
        return hash_join(
            left, right, on_t, join_type=jt,
            num_partitions=num_partitions, portable=portable,
        )
    hot_h = np.unique(_join_key_hash(hot_keys, on_t))  # sorted for isin
    S = int(salts)
    if S < 2:
        raise ValueError("skew_join: salts must be >= 2")

    # the hot set is BOUNDED TINY (≤ 1/hot_share hashes, ~a few hundred
    # bytes) — closure capture ships it with each task spec, which is
    # cheaper than an actor pool whose fixed size would throttle the map
    # stage below the cluster's parallelism; broadcast-via-ray.put is for
    # big sides, not this
    def salt_left(t: pa.Table) -> pa.Table:
        is_hot = np.isin(_join_key_hash(t, on_t), hot_h)
        salt = np.zeros(t.num_rows, np.int32)
        idx = np.flatnonzero(is_hot)
        if len(idx):
            # round-robin over the hot rows of this batch: any salt
            # assignment is correct (the right side carries every
            # replica), round-robin keeps the spread even
            salt[idx] = (np.arange(len(idx)) % S).astype(np.int32)
        return t.append_column("__s", pa.array(salt))

    def salt_right(t: pa.Table) -> pa.Table:
        is_hot = np.isin(_join_key_hash(t, on_t), hot_h)
        if not is_hot.any():
            return t.append_column(
                "__s", pa.array(np.zeros(t.num_rows, np.int32))
            )
        cold = np.flatnonzero(~is_hot)
        hot = np.flatnonzero(is_hot)
        take = np.concatenate([cold, np.repeat(hot, S)])
        salt = np.concatenate(
            [np.zeros(len(cold), np.int32),
             np.tile(np.arange(S, dtype=np.int32), len(hot))]
        )
        return t.take(pa.array(take)).append_column("__s", pa.array(salt))

    lb = left.map_batches(salt_left, batch_format="pyarrow")
    rb = right.map_batches(salt_right, batch_format="pyarrow")
    joined = hash_join(
        lb, rb, on_t + ["__s"], join_type=jt,
        num_partitions=num_partitions, portable=portable,
    )
    return joined.drop_columns(["__s"])


def cross_join_broadcast(
    left: "ray.data.Dataset",
    right: pa.Table,
) -> "ray.data.Dataset":
    """Cross (cartesian) join against a SMALL broadcast side: the right
    table is ``ray.put`` once and every batch expands locally with one
    repeat/tile take pair — no shuffle at all.  Output is |batch|·|right|
    rows per batch, so the right side must be genuinely small (dimension
    grids, bucket bounds, parameter sets); this is the theta-join building
    block (cross join + filter) for non-equi predicates that the hash
    joins can't express."""
    if right.num_rows == 0 or left is None:
        raise ValueError("cross_join_broadcast: right side must be non-empty")
    overlap = set(right.column_names)
    ref = ray.put(right)

    def f(t: pa.Table) -> pa.Table:
        bad = overlap & set(t.column_names)
        if bad:
            raise ValueError(f"cross_join_broadcast: column collision {sorted(bad)}")
        r = ray.get(ref)
        n, m = t.num_rows, r.num_rows
        if n == 0:
            return pa.table(
                {**{c: t[c] for c in t.column_names},
                 **{c: pa.array([], r.schema.field(c).type) for c in r.column_names}}
            )
        lrep = t.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), m)))
        rrep = r.take(pa.array(np.tile(np.arange(m, dtype=np.int64), n)))
        out = lrep
        for c in r.column_names:
            out = out.append_column(c, rrep[c])
        return out

    return left.map_batches(f, batch_format="pyarrow")


def semi_join_filter(ds, key_values, column: str, anti: bool = False):
    """Semi/anti join by broadcasting an in-memory key set/array and masking
    per batch.  For a build side that is itself a Dataset use
    :func:`semi_join`, which only broadcasts under a size threshold."""
    vals = key_values if isinstance(key_values, pa.Array) else pa.array(sorted(key_values))
    ref = ray.put(vals)

    def f(batch: pa.Table) -> pa.Table:
        vals = ray.get(ref)
        m = pc.is_in(batch[column], value_set=vals)
        if anti:
            m = pc.invert(m)
        return batch.filter(pc.fill_null(m, anti))

    return ds.map_batches(f, batch_format="pyarrow")


def semi_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_on: str,
    right_on: str | None = None,
    anti: bool = False,
    broadcast_threshold: int = 2_000_000,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Semi/anti join whose build side may be LARGE.  The distinct key set
    is computed distributed (pre-aggregated groupby — the shuffle moves one
    row per distinct key per block) and counted from block METADATA; only
    a small key set is pulled to the driver and broadcast, a large one goes
    through a hash-partitioned join (left_outer + null-mask for anti).  The
    build side is never read whole on the driver.

    Hazard note: Ray's JoinOperator emits schema-less blocks for EMPTY
    hash partitions, which crash acero when they reach a later join as
    input.  The hash path here engages only above ``broadcast_threshold``
    keys, where partitions are necessarily populated — but if you feed a
    join OUTPUT in as ``left`` of another sparse join, interpose a
    ``repartition(k)`` (measured to re-unify block schemas) or
    restructure to a single join (see ``dedup._mark_new_docs``)."""
    right_on = right_on or left_on
    keys = preagg_groupby(
        right, [right_on], [(right_on, "count", "__c")]
    ).select_columns([right_on]).materialize()
    n_keys = keys.count()

    if n_keys <= broadcast_threshold:
        tables = [t for t in _fetch_partials(keys.to_arrow_refs()) if t.num_rows]
        if not tables:
            return left if anti else left.filter(lambda _: False)
        arr = pa.concat_tables(tables)[right_on].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.chunk(0) if arr.num_chunks else pa.array([])
        return semi_join_filter(left, arr, left_on, anti=anti)

    marked = keys.map_batches(
        lambda t: pa.table(
            {left_on: t[right_on],
             "__m": pa.array(np.ones(t.num_rows, dtype=np.int8))}
        ),
        batch_format="pyarrow",
    )
    if not anti:
        out = left.join(marked, "inner", _join_partitions(num_partitions), on=(left_on,))
        return out.drop_columns(["__m"])
    out = left.join(marked, "left_outer", _join_partitions(num_partitions), on=(left_on,))
    return out.map_batches(
        lambda t: t.filter(pc.is_null(t["__m"])).drop_columns(["__m"]),
        batch_format="pyarrow",
    )


def heavy_hitters(
    ds: "ray.data.Dataset",
    col: str,
    k: int = 10,
    capacity: int | None = None,
) -> pa.Table:
    """Misra-Gries-style heavy hitters: every batch reduces to its top
    ``capacity`` (value, count) pairs by exact in-batch counts (one
    ``value_counts`` + sort per batch), partials merge with a pre-aggregated
    groupby-sum, and the global top-``k`` comes from the bounded
    block-partial top-k (no global sort).  Deterministic tie-break
    (count DESC, value ASC).

    Exactness regime: when a batch's distinct values fit ``capacity``
    (default max(8k, 64)) nothing is truncated and the counts are EXACT —
    that regime is what the SQL gate certifies.  Above it, a value's merged
    count is an undercount by at most Σ_b n_b/capacity over the batches
    that dropped it (per-batch dropped count ≤ the capacity-th kept count
    ≤ n_b/capacity) — the classic summary trade-off, pinned by test."""
    capacity = capacity or max(8 * k, 64)

    def summarize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({col: pa.array([], t.schema.field(col).type),
                             "cnt": pa.array([], pa.int64())})
        vc = pc.value_counts(t[col].combine_chunks())
        part = pa.table({col: vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})
        if part.num_rows > capacity:
            part = part.sort_by(
                [("cnt", "descending"), (col, "ascending")]
            ).slice(0, capacity)
        return part

    merged = preagg_groupby(
        ds.map_batches(summarize, batch_format="pyarrow"), [col],
        [("cnt", "sum", "cnt")],
    )
    out = topk(merged, [("cnt", "descending"), (col, "ascending")], k)
    if out is None:
        return pa.table({col: pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    return out


def build_bloom(
    keys: "ray.data.Dataset",
    col: str,
    bits_per_key: int = 12,
) -> tuple[bytes, int, int]:
    """Distributed Bloom-filter build over a key Dataset: every block
    reduces to one m-bit partial bitmap, partials OR-merge associatively
    through a remote task tree (the driver touches only the final bitmap).
    Returns ``(bitmap, m_bits, n_hashes)``; m ≈ bits_per_key · n keys
    (rounded up to a power of two) → FP rate ≈ 0.6185^bits_per_key
    (~0.3% at the default 12).  Double hashing (h1 + i·h2) gives the k
    probe positions from two 64-bit hashes — no k independent hash
    functions needed."""
    n = keys.count()
    m_bits = 1 << max(10, int(np.ceil(np.log2(max(1, n) * bits_per_key))))
    n_hashes = max(1, int(round(0.693 * m_bits / max(1, n))))
    mask = np.uint64(m_bits - 1)

    def block_bitmap(t: pa.Table) -> pa.Table:
        bm = np.zeros(m_bits // 8, np.uint8)
        if t.num_rows:
            h1 = _hll_hash(t[col].combine_chunks())
            h2 = _hll_finalize(h1) | np.uint64(1)
            for i in range(n_hashes):
                with np.errstate(over="ignore"):
                    pos = (h1 + np.uint64(i) * h2) & mask
                np.bitwise_or.at(bm, (pos >> np.uint64(3)).astype(np.int64),
                                 np.left_shift(1, (pos & np.uint64(7)).astype(np.int64)).astype(np.uint8))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    @ray.remote
    def or_merge(*blobs: bytes) -> bytes:
        acc = np.frombuffer(blobs[0], np.uint8).copy()
        for b in blobs[1:]:
            acc |= np.frombuffer(b, np.uint8)
        return acc.tobytes()

    parts = keys.map_batches(block_bitmap, batch_format="pyarrow").materialize()
    # per-block blob refs extracted remotely — blobs never queue up on the
    # driver; the OR tree reduces them 8 at a time
    blob_refs = [
        _extract_bloom_blob.remote(block_ref) for block_ref in parts.to_arrow_refs()
    ]
    while len(blob_refs) > 1:
        blob_refs = [
            or_merge.remote(*blob_refs[i:i + 8])
            for i in range(0, len(blob_refs), 8)
        ]
    return ray.get(blob_refs[0]), m_bits, n_hashes


@ray.remote
def _extract_bloom_blob(block: pa.Table) -> bytes:
    import numpy as _np

    blobs = block["bm"].to_pylist()
    acc = _np.frombuffer(blobs[0], _np.uint8).copy()
    for b in blobs[1:]:
        acc |= _np.frombuffer(b, _np.uint8)
    return acc.tobytes()


def bloom_semi_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_on: str,
    right_on: str | None = None,
    bits_per_key: int = 12,
    broadcast_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """EXACT semi join with a Bloom pre-filter: the build side's distinct
    keys become one compact bitmap (ray.put once, ~1.5 bytes/key) that
    every probe batch tests locally, discarding non-matching rows BEFORE
    the exchange; the ~0.3% false positives are then removed by the
    adaptive exact :func:`semi_join` over the (now tiny) survivor stream.
    No false negatives — a Bloom filter never drops a present key — so
    the result is identical to the plain semi join; what changes at 100 TB
    is the probe volume entering the shuffle."""
    right_on = right_on or left_on
    keys = preagg_groupby(
        right, [right_on], [(right_on, "count", "__c")]
    ).select_columns([right_on]).materialize()
    bitmap, m_bits, n_hashes = build_bloom(keys, right_on, bits_per_key)
    bm_ref = ray.put(np.frombuffer(bitmap, np.uint8))
    mask = np.uint64(m_bits - 1)

    def probe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        bm = ray.get(bm_ref)
        h1 = _hll_hash(t[left_on].combine_chunks())
        h2 = _hll_finalize(h1) | np.uint64(1)
        hit = np.ones(t.num_rows, bool)
        for i in range(n_hashes):
            with np.errstate(over="ignore"):
                pos = (h1 + np.uint64(i) * h2) & mask
            bits = bm[(pos >> np.uint64(3)).astype(np.int64)]
            hit &= (bits >> (pos & np.uint64(7)).astype(np.uint8)) & 1 > 0
        return t.filter(pa.array(hit))

    survivors = left.map_batches(probe, batch_format="pyarrow")
    return semi_join(
        survivors, keys, left_on, right_on,
        broadcast_threshold=broadcast_threshold,
    )


# -------------------------------------------------------------- top-k


def topk(
    ds: "ray.data.Dataset",
    sort_keys: list[tuple[str, str]],
    k: int,
) -> pa.Table:
    """Global top-k: per-batch partial top-k (each block contributes ≤ k
    rows), then one small driver-side merge — no global sort shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        return batch.sort_by(sort_keys).slice(0, k)

    refs = ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    parts = [t for t in ray.get(refs) if t.num_rows]
    if not parts:
        return None
    merged = pa.concat_tables(parts, promote_options="permissive")
    return merged.sort_by(sort_keys).slice(0, k)


# ------------------------------------------------------- LWW latest (upsert)


def lww_latest(
    ds: "ray.data.Dataset",
    keys: list[str],
    seq_col: str,
    op_col: str | None = None,
    delete_value: str = "D",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Generic last-writer-wins: keep each key's max-``seq_col`` row; if
    ``op_col`` is given, keys whose winning row carries ``delete_value`` are
    dropped (CDC upsert/delete as a standalone relational operator — the
    engine's merge specialised in merge.py uses the same contract).

    Shuffle = ONE hash partition on the key columns; LWW inside each
    partition is vectorized (sort + group-boundary mask).  One partition =
    one ``map_groups`` task heap: size ``num_partitions`` so
    rows/num_partitions fits a worker (~100-500 MB) — at real scale pass
    hundreds/thousands; the CDC engine path (exchange.py) is the
    fully-tuned variant of this operator."""

    def add_part(batch: pa.Table) -> pa.Table:
        from pandas.util import hash_array

        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for kcol in keys:
            arr = batch[kcol].to_numpy(zero_copy_only=False)
            h ^= hash_array(arr.astype(object, copy=False), categorize=False)
        return batch.append_column("__part", pa.array((h % num_partitions).astype(np.int32)))

    def merge_group(group: pa.Table) -> pa.Table:
        order = [(kcol, "ascending") for kcol in keys] + [(seq_col, "ascending")]
        s = group.drop_columns(["__part"]).sort_by(order)
        if s.num_rows == 0:
            return s
        cols = []
        for kcol in keys:
            a = s.column(kcol).combine_chunks()
            if isinstance(a, pa.ChunkedArray):
                a = a.chunk(0)
            if pa.types.is_string(a.type) or pa.types.is_large_string(a.type):
                a = pc.dictionary_encode(a).indices
            cols.append(a.to_numpy(zero_copy_only=False))
        neq = np.zeros(s.num_rows - 1, dtype=bool)
        for c in cols:
            neq |= c[1:] != c[:-1]
        winners = s.filter(pa.array(np.append(neq, True)))
        if op_col is not None:
            winners = winners.filter(pc.not_equal(winners[op_col], delete_value))
        return winners

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(merge_group, batch_format="pyarrow")
    )


# ---------------------------------------------------------- percentiles


def grouped_percentiles(
    ds: "ray.data.Dataset",
    key: str,
    value_col: str,
    percentiles: list[tuple[str, float]],
    exact_threshold: int = 5_000_000,
    num_bins: int = 8192,
    max_groups: int = 1_000_000,
) -> "ray.data.Dataset":
    """Per-group percentiles with a size-adaptive plan.

    Per-group row counts and min/max come from ONE pre-aggregated pass.
    Groups at or under ``exact_threshold`` rows use the exact path (sorted
    ``map_groups`` + numpy linear interpolation == SQL ``quantile_cont``) —
    one group must fit a task's heap, which the threshold guarantees.
    Above it, a two-phase fixed-bin histogram runs instead: per-batch
    ``np.bincount`` into ``num_bins`` bins per group (vectorized, combined
    in-batch), a groupby-sum of the tiny (group, bin) partials, then linear
    interpolation within the hit bin — error ≤ one bin width
    ((max-min)/num_bins), documented approximation, no group ever
    materializes in one heap."""
    stats_ds = preagg_groupby(
        ds, [key],
        [(value_col, "count", "__n"), (value_col, "min", "__lo"),
         (value_col, "max", "__hi")],
    ).materialize()
    n_groups = stats_ds.count()  # metadata — nothing fetched yet
    if n_groups > max_groups:
        raise ValueError(
            f"grouped_percentiles: {n_groups} groups exceeds max_groups="
            f"{max_groups}; this operator holds one stats row per group on "
            f"the driver — for very-high-cardinality keys use a plain "
            f"preagg_groupby with min/max or raise max_groups deliberately"
        )
    stats = stats_ds.take_all()  # bounded by the guard above, not by rows
    if not stats:
        return ray.data.from_arrow(
            pa.table({key: pa.array([], pa.string()),
                      **{n: pa.array([], pa.float64()) for n, _ in percentiles},
                      "n": pa.array([], pa.int64())})
        )
    max_n = max(r["__n"] for r in stats)

    if max_n <= exact_threshold:
        def per_group(g: pa.Table) -> pa.Table:
            vals = g[value_col].drop_null()  # quantile_cont ignores NULLs
            v = np.sort(vals.to_numpy(zero_copy_only=False))
            cols = {key: [g[key][0].as_py()]}
            for name, q in percentiles:
                cols[name] = pa.array(
                    [float(np.percentile(v, q * 100)) if len(v) else None],
                    pa.float64(),
                )
            cols["n"] = pa.array([len(v)], pa.int64())
            return pa.table(cols)

        return ds.groupby(key).map_groups(per_group, batch_format="pyarrow")

    # ---- histogram path: broadcast per-group (lo, hi), bincount per batch
    gkeys = [r[key] for r in stats]
    # an all-null group has null min/max → NaN (its output is None anyway)
    lo = np.array([r["__lo"] if r["__lo"] is not None else np.nan for r in stats], np.float64)
    hi = np.array([r["__hi"] if r["__hi"] is not None else np.nan for r in stats], np.float64)
    n_rows = np.array([r["__n"] for r in stats], np.int64)
    width = np.where(hi > lo, (hi - lo) / num_bins, 1.0)
    # a NULL group key is a legitimate SQL group; index_in returns null for
    # null inputs, so route those rows to the null group's slot explicitly
    # (a float/NaN gidx would IndexError the fancy indexing below)
    null_gi = next((i for i, k in enumerate(gkeys) if k is None), -1)
    ref = ray.put((pa.array(gkeys), lo, width, null_gi))

    def partial_hist(t: pa.Table) -> pa.Table:
        keys_arr, lo_b, w_b, null_slot = ray.get(ref)
        if t[value_col].null_count:  # quantile_cont ignores NULLs
            t = t.filter(pc.is_valid(t[value_col]))
        gidx_arr = pc.fill_null(
            pc.index_in(t[key], value_set=keys_arr), null_slot
        )
        if null_slot < 0:  # no null group in stats → drop stray null keys
            t = t.filter(pc.greater_equal(gidx_arr, 0))
            gidx_arr = pc.filter(gidx_arr, pc.greater_equal(gidx_arr, 0))
        gidx = gidx_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.clip(((v - lo_b[gidx]) / w_b[gidx]).astype(np.int64), 0, num_bins - 1)
        flat = gidx * num_bins + b
        cnt = np.bincount(flat, minlength=1)  # sparse combine below
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {"__g": pa.array((nz // num_bins).astype(np.int64)),
             "__b": pa.array((nz % num_bins).astype(np.int64)),
             "__c": pa.array(cnt[nz].astype(np.int64))}
        )

    hist = preagg_groupby(
        ds.map_batches(partial_hist, batch_format="pyarrow"),
        ["__g", "__b"], [("__c", "sum", "c")],
    ).take_all()  # ≤ groups × num_bins tiny rows
    counts = {}
    for r in hist:
        counts.setdefault(r["__g"], {})[r["__b"]] = r["c"]
    out_cols: dict[str, list] = {key: list(gkeys)}
    for name, _ in percentiles:
        out_cols[name] = []
    for gi in range(len(gkeys)):
        bins = counts.get(gi, {})
        order = sorted(bins)
        cum = np.cumsum([bins[b] for b in order])
        total = int(cum[-1]) if len(cum) else 0

        def rank_value(r: int) -> float:
            # estimated value of the rank-r order statistic: locate its bin,
            # place it at the in-bin midpoint of its position — always
            # within the element's true bin, so error ≤ one bin width
            if hi[gi] <= lo[gi]:
                return float(lo[gi])  # degenerate group: every value == lo
            j = min(int(np.searchsorted(cum, r + 1)), len(order) - 1)
            b = order[j]
            prev = cum[j - 1] if j else 0
            frac = (r - prev + 0.5) / bins[b]
            return float(lo[gi] + width[gi] * (b + min(max(frac, 0.0), 1.0)))

        for name, q in percentiles:
            if total == 0:
                out_cols[name].append(None)
                continue
            target = q * (total - 1)
            r_lo, r_hi = int(np.floor(target)), int(np.ceil(target))
            v_lo = rank_value(r_lo)
            v_hi = v_lo if r_hi == r_lo else rank_value(r_hi)
            out_cols[name].append(v_lo + (target - r_lo) * (v_hi - v_lo))
    out_cols["n"] = pa.array(n_rows, pa.int64())
    return ray.data.from_arrow(pa.table(out_cols))


# -------------------------------------------------------------- windows


def tumbling_window(
    ds: "ray.data.Dataset",
    key: str,
    ts_col: str,
    unit: str,
    aggs: list[tuple[str, str, str]],
) -> "ray.data.Dataset":
    """Tumbling event-time window = truncate ts to the window start, then a
    pre-aggregated groupby on (key, window)."""

    def add_window(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch[ts_col], unit=unit)
        return batch.append_column("window", w)

    return preagg_groupby(
        ds.map_batches(add_window, batch_format="pyarrow"), [key, "window"], aggs
    )


def _hash_partition_col(batch: pa.Table, keys: list[str], num_partitions: int) -> pa.Table:
    """Append ``__part = hash(keys) % num_partitions`` (same discipline as
    the CDC exchange: ONE hash partitioning reused by every per-key scan)."""
    from pandas.util import hash_array

    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for kcol in keys:
        arr = batch[kcol].to_numpy(zero_copy_only=False)
        h ^= hash_array(arr.astype(object, copy=False), categorize=False)
    return batch.append_column("__part", pa.array((h % num_partitions).astype(np.int32)))


def _segment_starts(s: pa.Table, keys: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """For a table SORTED by ``keys``: per-row start index of its key segment
    and the new-segment mask — the shared vectorized-scan primitive (no
    Python loop over rows; adjacent-inequality + ``maximum.accumulate``)."""
    n = s.num_rows
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, bool)
    newkey = np.zeros(n, dtype=bool)
    newkey[0] = True
    for kcol in keys:
        a = s.column(kcol).combine_chunks()
        if isinstance(a, pa.ChunkedArray):
            a = a.chunk(0) if a.num_chunks else pa.array([])
        if pa.types.is_string(a.type) or pa.types.is_large_string(a.type):
            # equality of dictionary indices == equality of values (one
            # dictionary: the array was combined into a single chunk above)
            a = pc.dictionary_encode(a).indices
        v = a.to_numpy(zero_copy_only=False)
        newkey[1:] |= v[1:] != v[:-1]
    idx = np.arange(n, dtype=np.int64)
    seg_start = np.maximum.accumulate(np.where(newkey, idx, -1))
    return seg_start, newkey


def _pad_to(ordered: list[str], side_tag: int, other_fields):
    """Batch fn that pads a side to the unified join schema: missing
    columns as typed nulls, ``__side`` tag appended, columns reordered to
    ``ordered`` (shared by :func:`asof_join` and :func:`range_join`)."""

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {c: t[c] for c in t.column_names}
        for name, typ in other_fields:
            cols[name] = pa.nulls(n, typ)
        cols["__side"] = pa.array(np.full(n, side_tag, np.int8))
        return pa.table({c: cols[c] for c in ordered})

    return f


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    ts_col: str,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """As-of (backward) join: for every left row, attach the columns of the
    LATEST right row with ``right.ts <= left.ts`` for the same key
    (unmatched left rows keep the right columns NULL — ASOF LEFT JOIN).

    Ray Data has no asof join; this is the composition the task brief calls
    for: pad both sides to one schema, tag, union, hash-partition on the key
    (each key lands wholly in one partition), then ONE sorted vectorized
    scan per partition — sort by (key, ts, side) with right rows first at
    ts ties (inclusive match), forward-carry the last right index with
    ``maximum.accumulate`` and invalidate carries that cross a key segment.
    Shuffle cost = one hash exchange; no per-row Python.

    Right must be unique per (key, ts) for deterministic output (same
    contract DuckDB's ASOF JOIN assumes); non-key/ts column names must not
    collide between the sides."""
    l_names, l_types = left.schema().names, left.schema().types
    r_names, r_types = right.schema().names, right.schema().types
    l_other = [(c, t) for c, t in zip(l_names, l_types) if c not in (key, ts_col)]
    r_other = [(c, t) for c, t in zip(r_names, r_types) if c not in (key, ts_col)]
    clash = {c for c, _ in l_other} & {c for c, _ in r_other}
    if clash:
        raise ValueError(f"asof_join: column collision {sorted(clash)}")
    ordered = [key, ts_col] + [c for c, _ in l_other] + [c for c, _ in r_other] + ["__side"]

    unioned = right.map_batches(_pad_to(ordered, 0, l_other), batch_format="pyarrow").union(
        left.map_batches(_pad_to(ordered, 1, r_other), batch_format="pyarrow")
    )
    parted = unioned.map_batches(
        lambda t: _hash_partition_col(t, [key], num_partitions), batch_format="pyarrow"
    )

    r_value_names = [c for c, _ in r_other]

    def merge(group: pa.Table) -> pa.Table:
        s = group.drop_columns(["__part"]).sort_by(
            [(key, "ascending"), (ts_col, "ascending"), ("__side", "ascending")]
        )
        n = s.num_rows
        if n == 0:
            return s.drop_columns(["__side"])
        side = s["__side"].combine_chunks().to_numpy(zero_copy_only=False)
        seg_start, _ = _segment_starts(s, [key])
        idx = np.arange(n, dtype=np.int64)
        last_right = np.maximum.accumulate(np.where(side == 0, idx, -1))
        valid = last_right >= seg_start
        left_mask = side == 1
        match = np.where(valid, last_right, 0)[left_mask]
        has_match = pa.array(valid[left_mask])
        out = s.filter(pa.array(left_mask))
        take_idx = pa.array(match)
        for c in r_value_names:
            src = s.column(c).combine_chunks()
            taken = src.take(take_idx)
            out = out.set_column(
                out.schema.get_field_index(c), c,
                pc.if_else(has_match, taken, pa.nulls(len(match), src.type)),
            )
        return out.drop_columns(["__side"])

    return parted.groupby("__part").map_groups(merge, batch_format="pyarrow")


def range_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Range (interval) join: every left row paired with every right
    interval ``[lo, hi]`` (inclusive) of the same key that contains
    ``left.ts`` — INNER join emitting left columns + right's value columns.

    Ray Data has no range join; same composition as :func:`asof_join`: pad
    both sides to one schema, tag, union, hash-partition on the key, then a
    per-partition vectorized probe scan.  Within a partition, two probe
    rows per left row (at ``ts - L`` and ``ts``, where L is the partition's
    longest interval) are sorted together with the right rows by
    ``(key, t, tag)``; a cumulative count of right rows at each probe gives
    the exact candidate rank range, fanned out with ``repeat`` + cumsum
    offsets and filtered by the ``hi`` bound.  No composite sort keys (no
    overflow risk), no per-row Python.

    Partitioning assumption this relies on: output fan-out per left row is
    bounded by the number of intervals within L of it — keep interval
    length bounded (e.g. capped attribution/session windows) or the join
    explodes regardless of engine.  ``lo``/``hi``/``ts`` must share one
    orderable type (timestamps or ints); non-key column names must not
    collide between the sides."""
    l_names, l_types = left.schema().names, left.schema().types
    r_names, r_types = right.schema().names, right.schema().types
    l_other = [(c, t) for c, t in zip(l_names, l_types) if c != key]
    r_other = [(c, t) for c, t in zip(r_names, r_types) if c not in (key, lo_col, hi_col)]
    clash = {c for c, _ in l_other} & ({c for c, _ in r_other} | {lo_col, hi_col})
    if clash:
        raise ValueError(f"range_join: column collision {sorted(clash)}")
    r_value_names = [c for c, _ in r_other]
    out_names = [key] + [c for c, _ in l_other] + r_value_names
    ordered = [key, lo_col, hi_col] + [c for c, _ in l_other] + r_value_names + ["__side"]

    lo_type = right.schema().types[r_names.index(lo_col)]
    hi_type = right.schema().types[r_names.index(hi_col)]
    unioned = right.map_batches(_pad_to(ordered, 0, l_other), batch_format="pyarrow").union(
        left.map_batches(
            _pad_to(ordered, 1, r_other + [(lo_col, lo_type), (hi_col, hi_type)]),
            batch_format="pyarrow",
        )
    )
    parted = unioned.map_batches(
        lambda t: _hash_partition_col(t, [key], num_partitions), batch_format="pyarrow"
    )

    def merge(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["__part"])
        side = g["__side"].combine_chunks().to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 1))
        rt = g.filter(pa.array(side == 0))
        empty = pa.table(
            {c: pa.chunked_array([], g.schema.field(c).type) for c in out_names}
        )
        nl, nr = lt.num_rows, rt.num_rows
        if nl == 0 or nr == 0:
            return empty
        as_i64 = lambda col: col.cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        ts_l = as_i64(lt[ts_col])
        lo_r, hi_r = as_i64(rt[lo_col]), as_i64(rt[hi_col])
        span = int(max(0, (hi_r - lo_r).max()))
        # probe union: tag 0 = window start (counts right rows with lo < ts-L),
        # tag 1 = right row, tag 2 = window end (counts lo <= ts) — tie order
        # start < right < end makes both bounds inclusive-correct.
        u = pa.table({
            key: pa.concat_arrays(
                [lt[key].combine_chunks(), lt[key].combine_chunks(),
                 rt[key].combine_chunks()]
            ),
            "__t": pa.array(np.concatenate([ts_l - span, ts_l, lo_r])),
            "__tag": pa.array(np.concatenate(
                [np.zeros(nl, np.int8), np.full(nl, 2, np.int8), np.ones(nr, np.int8)]
            )),
            "__idx": pa.array(np.concatenate(
                [np.arange(nl, dtype=np.int64), np.arange(nl, dtype=np.int64),
                 np.arange(nr, dtype=np.int64)]
            )),
        }).sort_by([(key, "ascending"), ("__t", "ascending"), ("__tag", "ascending")])
        tag_u = u["__tag"].combine_chunks().to_numpy(zero_copy_only=False)
        idx_u = u["__idx"].combine_chunks().to_numpy(zero_copy_only=False)
        is_right = tag_u == 1
        cnt_before = np.cumsum(is_right) - is_right  # right rows strictly before
        start_count = np.empty(nl, np.int64)
        end_count = np.empty(nl, np.int64)
        start_count[idx_u[tag_u == 0]] = cnt_before[tag_u == 0]
        end_count[idx_u[tag_u == 2]] = cnt_before[tag_u == 2]
        right_rank_to_orig = idx_u[is_right]  # rank in (key, lo) order → rt row
        n = end_count - start_count
        total = int(n.sum())
        if total == 0:
            return empty
        li = np.repeat(np.arange(nl, dtype=np.int64), n)
        offs = np.cumsum(n) - n
        ri = right_rank_to_orig[
            np.arange(total, dtype=np.int64) - np.repeat(offs, n)
            + np.repeat(start_count, n)
        ]
        keep = hi_r[ri] >= ts_l[li]
        li, ri = li[keep], ri[keep]
        out = lt.take(pa.array(li)).select([key, ts_col] + [c for c, _ in l_other if c != ts_col])
        rsel = rt.take(pa.array(ri))
        for c in r_value_names:
            out = out.append_column(c, rsel[c])
        return out.select(out_names)

    return parted.groupby("__part").map_groups(merge, batch_format="pyarrow")


def grouped_topk(
    ds: "ray.data.Dataset",
    key: str,
    sort_keys: list[tuple[str, str]],
    n: int,
) -> "ray.data.Dataset":
    """Top-``n`` rows PER KEY (``row_number() OVER (PARTITION BY key ORDER
    BY ...) <= n``), with a 1-based ``rank`` column.

    Two-stage like global :func:`topk`: every batch first keeps at most
    ``n`` rows per key it contains (in-batch sort + segment-rank mask — the
    shuffle then moves ≤ n rows per key per batch, never the raw stream),
    then one groupby per key re-ranks the survivors.  ``sort_keys`` should
    end with a unique tiebreaker for deterministic output."""
    order = [(key, "ascending")] + list(sort_keys)

    def keep_topn(t: pa.Table, with_rank: bool) -> pa.Table:
        s = t.sort_by(order)
        seg_start, _ = _segment_starts(s, [key])
        rank = np.arange(s.num_rows, dtype=np.int64) - seg_start
        keep = rank < n
        out = s.filter(pa.array(keep))
        if with_rank:
            out = out.append_column("rank", pa.array(rank[keep] + 1))
        return out

    partial = ds.map_batches(
        lambda t: keep_topn(t, with_rank=False), batch_format="pyarrow"
    )
    return partial.groupby(key).map_groups(
        lambda g: keep_topn(g, with_rank=True), batch_format="pyarrow"
    )


def hopping_window(
    ds: "ray.data.Dataset",
    key: str,
    ts_col: str,
    size_us: int,
    hop_us: int,
    aggs: list[tuple[str, str, str]],
) -> "ray.data.Dataset":
    """Hopping (sliding) event-time windows: width ``size_us``, advancing by
    ``hop_us`` (``size_us`` must be a multiple).  Each row is expanded to
    the ``size/hop`` windows containing it with one vectorized
    ``np.repeat``/``take`` per batch — the fan-out happens inside the map
    stage, and the only shuffle is the pre-aggregated (key, window) groupby
    of partials (same discipline as :func:`tumbling_window`)."""
    if size_us % hop_us:
        raise ValueError("hopping_window: size must be a multiple of hop")
    k = size_us // hop_us

    def expand(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column("window", pa.nulls(0, t[ts_col].type))
        ts_type = t[ts_col].type
        ts = t[ts_col].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        w0 = (ts // hop_us) * hop_us
        rep = t.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), k)))
        wins = np.repeat(w0, k) - np.tile(np.arange(k, dtype=np.int64) * hop_us, n)
        return rep.append_column("window", pc.cast(pa.array(wins), ts_type))

    return preagg_groupby(
        ds.map_batches(expand, batch_format="pyarrow"), [key, "window"], aggs
    )


def window_scan(
    ds: "ray.data.Dataset",
    key: str,
    order_col: str,
    lag_cols: list[str] | None = None,
    sum_cols: list[str] | None = None,
    num_partitions: int = 32,
    ranks: bool = False,
    lead_cols: list[str] | None = None,
    pct: bool = False,
    ntile_n: int | None = None,
    first_last_cols: list[str] | None = None,
    moving_sum: list[tuple[str, int]] | None = None,
) -> "ray.data.Dataset":
    """Per-key ordered window functions in one vectorized scan:
    ``rn`` (row_number), ``prev_<c>`` (lag 1) for ``lag_cols``,
    ``next_<c>`` (lead 1) for ``lead_cols`` and ``run_<c>`` (running sum,
    UNBOUNDED PRECEDING .. CURRENT ROW) for ``sum_cols`` — PARTITION BY
    key ORDER BY order_col.  With ``ranks=True`` also ``rank`` /
    ``dense_rank`` (SQL tie semantics: equal order values share a rank;
    dense_rank has no gaps) — derived from the equal-value run starts, no
    extra sort.  ``pct=True`` adds ``percent_rank`` ((rank-1)/(rows-1),
    0 for single-row partitions) and ``cume_dist`` (rows at-or-below the
    current value / partition rows); ``ntile_n=k`` adds ``tile`` with the
    standard first-(rows % k)-tiles-get-the-extra-row split;
    ``first_last_cols`` adds ``first_<c>`` / ``last_<c>`` (first_value /
    last_value over the WHOLE partition — rows UNBOUNDED PRECEDING ..
    UNBOUNDED FOLLOWING, the per-key constant form);
    ``moving_sum=[(c, k)]`` adds ``mov_<c>_<k>`` — the bounded frame
    ``ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW`` sum, derived from the
    same single cumsum (``cs[i] - cs[w] + v[w]`` with the window start
    clamped at the segment start — no second pass).  With ties,
    per-row outputs are deterministic as a multiset (tied rows are
    identical), which is exactly what an order-insensitive comparison —
    or SQL itself — guarantees.

    Hash-partition on the key (a key never splits), then per partition:
    one sort + segment-start arithmetic; lag is a shifted ``take`` masked
    at segment starts, the running sum is a global ``cumsum`` rebased at
    each segment start.  For exact cross-engine (SQL) parity pass INTEGER
    ``sum_cols`` — the rebase subtraction is order-exact only for ints;
    floats carry the usual accumulation-order caveat."""
    lag_cols = lag_cols or []
    sum_cols = sum_cols or []
    lead_cols = lead_cols or []
    first_last_cols = first_last_cols or []
    moving_sum = moving_sum or []
    if ntile_n is not None and ntile_n < 1:
        raise ValueError(f"window_scan: ntile_n must be >= 1, got {ntile_n}")
    if any(k < 1 for _, k in moving_sum):
        raise ValueError("window_scan: moving_sum window k must be >= 1")
    parted = ds.map_batches(
        lambda t: _hash_partition_col(t, [key], num_partitions), batch_format="pyarrow"
    )

    def scan(group: pa.Table) -> pa.Table:
        s = group.drop_columns(["__part"]).sort_by(
            [(key, "ascending"), (order_col, "ascending")]
        )
        n = s.num_rows
        if n == 0:
            out = s.append_column("rn", pa.nulls(0, pa.int64()))
            for c in lag_cols:
                out = out.append_column(f"prev_{c}", pa.nulls(0, s.schema.field(c).type))
            for c in sum_cols:
                out = out.append_column(f"run_{c}", pa.nulls(0, s.schema.field(c).type))
            if ranks:
                out = out.append_column("rank", pa.nulls(0, pa.int64()))
                out = out.append_column("dense_rank", pa.nulls(0, pa.int64()))
            for c in lead_cols:
                out = out.append_column(f"next_{c}", pa.nulls(0, s.schema.field(c).type))
            if pct:
                out = out.append_column("percent_rank", pa.nulls(0, pa.float64()))
                out = out.append_column("cume_dist", pa.nulls(0, pa.float64()))
            if ntile_n is not None:
                out = out.append_column("tile", pa.nulls(0, pa.int64()))
            for c in first_last_cols:
                out = out.append_column(f"first_{c}", pa.nulls(0, s.schema.field(c).type))
                out = out.append_column(f"last_{c}", pa.nulls(0, s.schema.field(c).type))
            for c, k in moving_sum:
                out = out.append_column(f"mov_{c}_{k}", pa.nulls(0, s.schema.field(c).type))
            return out
        seg_start, newkey = _segment_starts(s, [key])
        idx = np.arange(n, dtype=np.int64)
        rn0 = idx - seg_start
        out = s.append_column("rn", pa.array(rn0 + 1))
        need_val_runs = ranks or pct
        if need_val_runs:
            val_start, newval = _segment_starts(s, [key, order_col])
        if ranks:
            out = out.append_column("rank", pa.array(val_start - seg_start + 1))
            cs = np.cumsum(newval.astype(np.int64))
            out = out.append_column("dense_rank", pa.array(cs - cs[seg_start] + 1))
        need_seg_end = pct or ntile_n is not None or bool(first_last_cols)
        if need_seg_end:
            seg_bounds = np.append(np.flatnonzero(newkey), n)
            seg_end = np.repeat(seg_bounds[1:], np.diff(seg_bounds))
            seg_len = seg_end - seg_start
        if pct:
            denom = np.maximum(seg_len - 1, 1).astype(np.float64)
            out = out.append_column(
                "percent_rank",
                pa.array(np.where(seg_len > 1, (val_start - seg_start) / denom, 0.0)),
            )
            val_bounds = np.append(np.flatnonzero(newval), n)
            run_end = np.repeat(val_bounds[1:], np.diff(val_bounds))
            out = out.append_column(
                "cume_dist", pa.array((run_end - seg_start) / seg_len.astype(np.float64))
            )
        if ntile_n is not None:
            q, r = seg_len // ntile_n, seg_len % ntile_n
            big_span = r * (q + 1)
            tile = np.where(
                rn0 < big_span,
                rn0 // (q + 1) + 1,
                r + (rn0 - big_span) // np.maximum(q, 1) + 1,
            )
            out = out.append_column("tile", pa.array(tile.astype(np.int64)))
        not_first = pa.array(~newkey)
        for c in lag_cols:
            src = s.column(c).combine_chunks()
            shifted = src.take(pa.array(np.maximum(idx - 1, 0)))
            out = out.append_column(
                f"prev_{c}", pc.if_else(not_first, shifted, pa.nulls(n, src.type))
            )
        for c in first_last_cols:
            src = s.column(c).combine_chunks()
            out = out.append_column(f"first_{c}", src.take(pa.array(seg_start)))
            out = out.append_column(f"last_{c}", src.take(pa.array(seg_end - 1)))
        if lead_cols:
            last_in_seg = np.zeros(n, dtype=bool)
            last_in_seg[:-1] = newkey[1:]
            last_in_seg[-1] = True
            not_last = pa.array(~last_in_seg)
            for c in lead_cols:
                src = s.column(c).combine_chunks()
                shifted = src.take(pa.array(np.minimum(idx + 1, n - 1)))
                out = out.append_column(
                    f"next_{c}", pc.if_else(not_last, shifted, pa.nulls(n, src.type))
                )
        for c in sum_cols:
            v = s.column(c).combine_chunks().to_numpy(zero_copy_only=False)
            cs = np.cumsum(v)
            base = cs[seg_start] - v[seg_start]
            out = out.append_column(f"run_{c}", pa.array(cs - base, s.schema.field(c).type))
        for c, k in moving_sum:
            v = s.column(c).combine_chunks().to_numpy(zero_copy_only=False)
            cs = np.cumsum(v)
            w = np.maximum(seg_start, idx - k + 1)
            out = out.append_column(
                f"mov_{c}_{k}", pa.array(cs - cs[w] + v[w], s.schema.field(c).type)
            )
        return out

    return parted.groupby("__part").map_groups(scan, batch_format="pyarrow")


def grouped_concat(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    order_cols: list[str],
    sep: str = ",",
    out_name: str | None = None,
    count_name: str = "n_items",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Per-key ordered string aggregation — SQL
    ``string_agg(value, sep ORDER BY order_cols)`` / collect_list: one row
    per key holding the values joined in order, plus the item count.

    Hash-partition on the keys (a key never splits), ONE sort per
    partition, then a vectorized segment join: the sorted value column is
    wrapped as a ListArray at the segment offsets and joined with a single
    ``binary_join`` kernel — no Python loop over rows or groups.  Null
    values are dropped before joining (string_agg semantics).  Pass
    ``order_cols`` that are unique per key for a deterministic result (the
    same caveat SQL's ORDER BY ties carry).  Memory bound: one key's joined
    string must fit in a task's heap — inherent to the operator's output,
    not the implementation."""
    out_name = out_name or f"concat_{value_col}"
    parted = ds.map_batches(
        lambda t: _hash_partition_col(
            t.filter(pc.is_valid(t[value_col])), keys, num_partitions
        ),
        batch_format="pyarrow",
    )
    sort_spec = [(k, "ascending") for k in keys] + [(o, "ascending") for o in order_cols]

    def join_group(group: pa.Table) -> pa.Table:
        s = group.drop_columns(["__part"]).sort_by(sort_spec)
        n = s.num_rows
        vals = s.column(value_col).combine_chunks() if n else pa.array([], pa.string())
        if n == 0:
            cols = {k: s.column(k) for k in keys}
            cols[out_name] = pa.array([], vals.type)
            cols[count_name] = pa.array([], pa.int64())
            return pa.table(cols)
        _, newkey = _segment_starts(s, keys)
        starts = np.flatnonzero(newkey)
        offsets = np.append(starts, n)
        if pa.types.is_large_string(vals.type):
            lst = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), vals)
            sep_scalar = pa.scalar(sep, pa.large_string())
        else:
            lst = pa.ListArray.from_arrays(pa.array(offsets.astype(np.int32)), vals)
            sep_scalar = pa.scalar(sep, pa.string())
        head = pa.array(starts)
        cols = {k: s.column(k).take(head) for k in keys}
        cols[out_name] = pc.binary_join(lst, sep_scalar)
        cols[count_name] = pa.array(np.diff(offsets))
        return pa.table(cols)

    return parted.groupby("__part").map_groups(join_group, batch_format="pyarrow")


def rollup_aggregate(
    ds: "ray.data.Dataset",
    keys: list[str],
    aggs: list[tuple[str, str, str]],
) -> "ray.data.Dataset":
    """``GROUP BY ROLLUP(keys...)``: the finest grouping plus every prefix
    level up to the grand total, rolled columns emitted as NULL.

    The raw data is aggregated ONCE (pre-aggregated groupby at the finest
    level); every coarser level re-aggregates the finest RESULT — at scale
    the rollup costs one shuffle of partials plus trivially-small re-aggs
    of the aggregate itself (sum/count roll up as sums, min/max as
    min/max; use integer sum columns for order-exact SQL parity)."""
    finest = preagg_groupby(ds, keys, aggs).materialize()
    out_specs = [(out, "sum" if fn in ("sum", "count") else fn, out) for _, fn, out in aggs]
    out_names = [out for _, _, out in aggs]
    key_types = {
        c: t for c, t in zip(finest.schema().names, finest.schema().types) if c in keys
    }

    def pad_nulls(dropped: list[str]):
        def f(t: pa.Table) -> pa.Table:
            for c in dropped:
                t = t.append_column(c, pa.nulls(t.num_rows, key_types[c]))
            return t.select(keys + out_names)

        return f

    levels = [finest.map_batches(pad_nulls([]), batch_format="pyarrow")]
    for k in range(len(keys) - 1, -1, -1):
        prefix, dropped = keys[:k], keys[k:]
        if prefix:
            lvl = preagg_groupby(finest, prefix, out_specs)
        else:
            withc = finest.map_batches(
                lambda t: t.append_column("__all", pa.array(np.zeros(t.num_rows, np.int8))),
                batch_format="pyarrow",
            )
            lvl = preagg_groupby(withc, ["__all"], out_specs).drop_columns(["__all"])
        levels.append(lvl.map_batches(pad_nulls(dropped), batch_format="pyarrow"))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def cube_aggregate(
    ds: "ray.data.Dataset",
    keys: list[str],
    aggs: list[tuple[str, str, str]],
) -> "ray.data.Dataset":
    """``GROUP BY CUBE(keys...)``: every SUBSET of the keys (2^k grouping
    sets), rolled columns emitted as NULL — the full OLAP lattice, vs
    :func:`rollup_aggregate`'s prefix chain.

    Same scale shape as rollup: the raw data aggregates ONCE at the
    finest level; every other grouping set re-aggregates the finest
    RESULT (mergeable aggs only — sum/count roll up as sums, min/max as
    min/max); 2^k − 1 trivially-small re-aggs of the aggregate itself."""
    from itertools import combinations

    finest = preagg_groupby(ds, keys, aggs).materialize()
    out_specs = [(out, "sum" if fn in ("sum", "count") else fn, out)
                 for _, fn, out in aggs]
    out_names = [out for _, _, out in aggs]
    key_types = {
        c: t for c, t in zip(finest.schema().names, finest.schema().types)
        if c in keys
    }

    def pad_nulls(dropped: list[str]):
        def f(t: pa.Table) -> pa.Table:
            for c in dropped:
                t = t.append_column(c, pa.nulls(t.num_rows, key_types[c]))
            return t.select(keys + out_names)

        return f

    levels = [finest.map_batches(pad_nulls([]), batch_format="pyarrow")]
    subsets = [
        list(c)
        for r in range(len(keys) - 1, -1, -1)
        for c in combinations(keys, r)
    ]
    for subset in subsets:
        dropped = [k for k in keys if k not in subset]
        if subset:
            lvl = preagg_groupby(finest, subset, out_specs)
        else:
            withc = finest.map_batches(
                lambda t: t.append_column(
                    "__all", pa.array(np.zeros(t.num_rows, np.int8))),
                batch_format="pyarrow",
            )
            lvl = preagg_groupby(withc, ["__all"], out_specs).drop_columns(["__all"])
        levels.append(lvl.map_batches(pad_nulls(dropped), batch_format="pyarrow"))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def sessionize(
    ds: "ray.data.Dataset",
    key: str,
    ts_col: str,
    gap_minutes: float,
) -> "ray.data.Dataset":
    """Session windows: per-key sorted scan; a gap > ``gap_minutes`` starts a
    new session.  Implemented as ``groupby(key).map_groups`` over the sorted
    group — the Ray-Data shape for ordered per-key state (no event-time
    watermarks needed for replay-shaped input)."""
    gap_us = int(gap_minutes * 60 * 1e6)

    def per_key(group: pa.Table) -> pa.Table:
        s = group.sort_by([(ts_col, "ascending")])
        ts = s[ts_col].cast(pa.int64()).to_numpy()
        breaks = int((np.diff(ts) > gap_us).sum()) + 1 if len(ts) else 0
        return pa.table({key: [s[key][0].as_py()], "n_sessions": pa.array([breaks], pa.int64()),
                         "n_events": pa.array([len(ts)], pa.int64())})

    return ds.groupby(key).map_groups(per_key, batch_format="pyarrow")


# ------------------------------------------------------ distributed prefix sum


@ray.remote
def _block_col_sum(t: pa.Table, col: str) -> int | None:
    # a sort can emit empty blocks with an EMPTY schema — flag them (None)
    # so the caller drops them from the output entirely
    if t.num_rows == 0 or col not in t.column_names:
        return None
    s = pc.sum(t[col])
    return int(s.as_py() or 0)


@ray.remote
def _block_cumsum(t: pa.Table, order_key: str, col: str, offset: int,
                  out: str, exclusive: bool) -> pa.Table:
    t = t.sort_by([(order_key, "ascending")])
    # nulls contribute 0, matching SQL `sum() OVER` (which skips NULLs) and
    # the pc.sum the block offsets were computed with — without the fill, a
    # null became NaN → int64 garbage for every later row
    v = pc.fill_null(pc.cast(t[col], pa.int64()), 0).to_numpy(
        zero_copy_only=False
    )
    c = np.cumsum(v, dtype=np.int64) + offset
    if exclusive:
        c = c - v
    return t.append_column(out, pa.array(c))


def ordered_prefix_sum(
    ds: "ray.data.Dataset",
    order_key: str,
    col: str,
    out: str = "running",
    exclusive: bool = False,
) -> "ray.data.Dataset":
    """Global ordered cumulative sum — the distributed prefix-sum primitive
    ``window_scan`` cannot provide (its running sums are per-KEY; a global
    ``sum() OVER (ORDER BY ...)`` would put the whole dataset in one
    partition).  Three steps: ONE range sort on ``order_key`` (the only
    wide op), a metadata-sized reduction of per-block sums (one int per
    block to the driver — O(blocks), never rows), then each block adds its
    exclusive block-prefix offset and cumsums locally.  Raw Ray tasks are
    justified here: the Dataset API has no ordered scan with cross-block
    carry.  ``order_key`` must be unique for a deterministic total order
    (ties within a block are broken by the in-block sort; ties ACROSS
    blocks would be placement-dependent).  ``col`` must be integral —
    integer prefix sums are accumulation-order-exact, float ones are not."""
    refs = ds.sort(order_key).to_arrow_refs()
    sums = ray.get([_block_col_sum.remote(r, col) for r in refs])
    kept = [(r, s) for r, s in zip(refs, sums) if s is not None]
    if not kept:
        # empty input: keep the schema contract (input columns + `out`)
        # so downstream stages referencing `out` see an empty table, not
        # a missing column
        sch = ds.schema()
        empty = pa.table(
            {**{n: pa.array([], t) for n, t in zip(sch.names, sch.types)},
             out: pa.array([], pa.int64())}
        )
        return ray.data.from_arrow(empty)
    refs = [r for r, _ in kept]
    offsets = np.concatenate(
        ([0], np.cumsum([s for _, s in kept], dtype=np.int64))
    )[:-1]
    out_refs = [
        _block_cumsum.remote(r, order_key, col, int(o), out, exclusive)
        for r, o in zip(refs, offsets)
    ]
    return ray.data.from_arrow_refs(out_refs)


def pack_sequences(
    ds: "ray.data.Dataset",
    budget: int,
    order_key: str,
    size_col: str,
    seq_col: str = "seq_id",
) -> "ray.data.Dataset":
    """Greedy sequential sequence packing for training-data assembly: lay
    documents end-to-end in ``order_key`` order and chunk the concatenated
    stream every ``budget`` size units — each document's sequence id is
    ``floor(exclusive_running_size / budget)``, exactly the SQL
    ``sum(size) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING AND 1
    PRECEDING) // budget``.  Deterministic (independent of partitioning),
    one sort + O(blocks) driver state via :func:`ordered_prefix_sum`.  A
    document longer than ``budget`` simply spans sequences, as in
    concat-then-chunk pre-training pipelines."""
    if budget <= 0:
        raise ValueError(f"pack_sequences: budget must be positive, got {budget}")
    run = ordered_prefix_sum(ds, order_key, size_col, out="__cum", exclusive=True)

    def assign(t: pa.Table) -> pa.Table:
        c = t["__cum"].to_numpy(zero_copy_only=False)
        return t.drop_columns(["__cum"]).append_column(
            seq_col, pa.array(c // budget)
        )

    return run.map_batches(assign, batch_format="pyarrow")


def explode_list(
    batch: pa.Table,
    column: str,
    pos_col: str | None = "pos",
    out: str | None = None,
) -> pa.Table:
    """Explode (unnest) a list column: one output row per element, all
    other columns repeated — the exact multiset of SQL ``unnest(col)``
    (zipped with ``unnest(range(1, len+1))`` when ``pos_col`` is set;
    positions are 1-based).  Null/empty lists produce no rows (SQL unnest
    rule).  Batch-local: one ``list_flatten`` + one ``take`` per other
    column, no per-row Python, no shuffle."""
    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lens = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    flat = pc.list_flatten(col)
    take = pa.array(np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens))
    cols, names = [], []
    for name in batch.column_names:
        if name == column:
            continue
        names.append(name)
        cols.append(batch[name].combine_chunks().take(take))
    if pos_col is not None:
        total = int(lens.sum())
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        names.append(pos_col)
        cols.append(pa.array(
            np.arange(total, dtype=np.int64) - np.repeat(starts, lens) + 1
        ))
    names.append(out or column)
    cols.append(flat)
    return pa.table(dict(zip(names, cols)))


def stratified_sample(
    ds: "ray.data.Dataset",
    key: str,
    strata_col: str,
    permille: dict[str, int],
    default_permille: int = 0,
    modulus: int = 1_000_003,
    multiplier: int = 2654435761,
) -> "ray.data.Dataset":
    """Per-stratum deterministic sampling — :func:`deterministic_sample`
    with the keep-rate chosen by each row's stratum (the corpus-assembly
    primitive: "3% of web, 40% of books, all of wiki").  Same pure integer
    arithmetic, so membership is stable across runs / engines /
    partitionings and exactly reproducible in SQL with a CASE over the
    identical formula.  Batch-local; no shuffle, no state.  ``key`` must
    be non-negative (same modulo-sign caveat as
    :func:`deterministic_sample`)."""
    for s, p in permille.items():
        if not 0 <= p <= 1000:
            raise ValueError(f"stratified_sample: permille must be 0..1000, got {p} for {s!r}")
    if not 0 <= default_permille <= 1000:
        raise ValueError(f"stratified_sample: default permille must be 0..1000, got {default_permille}")

    def f(t: pa.Table) -> pa.Table:
        v = t[key].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        strata = t[strata_col]
        rate = np.full(t.num_rows, default_permille, dtype=np.int64)
        for s, p in permille.items():
            m = pc.fill_null(pc.equal(strata, s), False).to_numpy(zero_copy_only=False)
            rate[np.asarray(m, dtype=bool)] = p
        mask = ((v % modulus) * multiplier) % 1000 < rate
        return t.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow")


# ----------------------------------------------------- table profiling


def table_profile(ds: "ray.data.Dataset", columns: list[str]) -> pa.Table:
    """One-scan column profiling — the ANALYZE operator a corpus pipeline
    runs before anything else: per column (n_rows, n_nulls, ndv exact,
    min, max) in a single corpus pass.

    Shape: each batch reduces every column to its DISTINCT
    (value-key, count) partial (``pc.value_counts`` — per-batch work ∝
    batch ndv, vectorized); the only shuffle moves those partials, merged
    by one groupby on (column, key); a second tiny groupby folds the
    merged distinct table to one row per column (every aggregate —
    counts, ndv as sum-of-ones over post-merge keys, typed min/max — is
    mergeable).  Exact-NDV is the documented exact regime: partial volume
    ∝ ndv per block; at high cardinality use approx_count_distinct (HLL)
    instead.

    Display rules (the repo's cross-engine float discipline): int64 →
    decimal string (exact for \\|v\\| < 2^53); float64 → milli scale-floor
    integer string; timestamp[us] → ISO seconds (19 chars); string →
    identity.  Returns (column, n_rows, n_nulls, ndv, min_str, max_str)
    ordered by the requested column list.
    """
    schema = ds.schema()
    arrow_schema = getattr(schema, "base_schema", schema)
    types = {c: arrow_schema.field(c).type for c in columns}

    def partial(batch: pa.Table) -> pa.Table:
        cols, keys, nums, cnts = [], [], [], []
        for c in columns:
            arr = batch[c]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            n_null = arr.null_count
            non = arr.drop_null()
            t = types[c]
            if pa.types.is_timestamp(t):
                non_key = pc.cast(non.cast(pa.int64()), pa.string())
                non_num = pc.cast(non.cast(pa.int64()), pa.float64())
            elif pa.types.is_floating(t):
                norm = pc.add(pc.cast(non, pa.float64()), 0.0)  # -0.0 -> 0.0
                non_key = pc.cast(norm, pa.string())
                non_num = norm
            elif pa.types.is_integer(t):
                non_key = pc.cast(non, pa.string())
                non_num = pc.cast(non, pa.float64())
            else:
                non_key = pc.cast(non, pa.large_string())
                non_num = None
            vc = pc.value_counts(non_key)
            k = len(vc)
            keys.append(pc.cast(vc.field("values"), pa.large_string()))
            cnts.append(pc.cast(vc.field("counts"), pa.int64()))
            if non_num is not None and k:
                # v_num is identical for every occurrence of a key; take
                # it from the first occurrence via an index join
                idx = pc.index_in(vc.field("values"), non_key)
                nums.append(pc.take(non_num, idx))
            else:
                nums.append(pa.nulls(k, pa.float64()))
            cols.append(pa.array([c] * k, pa.large_string()))
            if n_null:
                cols.append(pa.array([c], pa.large_string()))
                keys.append(pa.nulls(1, pa.large_string()))
                nums.append(pa.nulls(1, pa.float64()))
                cnts.append(pa.array([n_null], pa.int64()))
        return pa.table(
            {
                "column": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in cols]),
                "v_str": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in keys]),
                "v_num": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in nums]),
                "cnt": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in cnts]),
            }
        )

    merged = preagg_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["column", "v_str"],
        [("cnt", "sum", "cnt"), ("v_num", "min", "v_num")],
    )

    def helpers(t: pa.Table) -> pa.Table:
        isval = pc.is_valid(t["v_str"])
        return pa.table(
            {
                "column": t["column"],
                "cnt": t["cnt"],
                "null_cnt": pc.if_else(isval, pa.scalar(0, pa.int64()), t["cnt"]),
                "one": pc.cast(isval, pa.int64()),
                "v_num": t["v_num"],
                "v_str": t["v_str"],
            }
        )

    final = preagg_groupby(
        merged.map_batches(helpers, batch_format="pyarrow"),
        ["column"],
        [
            ("cnt", "sum", "n_rows"),
            ("null_cnt", "sum", "n_nulls"),
            ("one", "sum", "ndv"),
            ("v_num", "min", "num_min"),
            ("v_num", "max", "num_max"),
            ("v_str", "min", "str_min"),
            ("v_str", "max", "str_max"),
        ],
    )
    rows = {r["column"]: r for r in final.take_all()}

    def fmt(c: str, r: dict, which: str):
        t = types[c]
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return r[f"str_{which}"]
        v = r[f"num_{which}"]
        if v is None:
            return None
        if pa.types.is_timestamp(t):
            import datetime

            return datetime.datetime.utcfromtimestamp(v / 1e6).strftime(
                "%Y-%m-%d %H:%M:%S"
            )
        if pa.types.is_floating(t):
            return str(int(np.floor(v * 1000 + 0.5)))
        return str(int(v))

    out = {
        "column": [],
        "n_rows": [],
        "n_nulls": [],
        "ndv": [],
        "min_str": [],
        "max_str": [],
    }
    for c in columns:
        r = rows.get(c)
        if r is None:
            continue
        out["column"].append(c)
        out["n_rows"].append(int(r["n_rows"]))
        out["n_nulls"].append(int(r["n_nulls"]))
        out["ndv"].append(int(r["ndv"]))
        out["min_str"].append(fmt(c, r, "min"))
        out["max_str"].append(fmt(c, r, "max"))
    return pa.table(
        {
            "column": pa.array(out["column"], pa.string()),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
            "n_nulls": pa.array(out["n_nulls"], pa.int64()),
            "ndv": pa.array(out["ndv"], pa.int64()),
            "min_str": pa.array(out["min_str"], pa.string()),
            "max_str": pa.array(out["max_str"], pa.string()),
        }
    )


# ------------------------------------------- prefix-context assembly


def prefix_concat_examples(
    ds: "ray.data.Dataset",
    keys: list[str],
    order_col: str,
    line_col: str,
    target_col: str,
    sep: str = "\n",
    budget: int | None = None,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Per-key ordered prefix assembly — the SFT training-example builder
    over conversation transcripts: for every row where ``target_col`` is
    true, emit that row's columns plus ``context`` (the ``line_col`` values
    of all PRECEDING rows in the key group, joined by ``sep``) and
    ``n_context`` (how many lines made it in).  With ``budget`` set, the
    context is the MAXIMAL SUFFIX of preceding lines whose joined length
    (code points, separators included) fits — the recency-window
    truncation an SFT packer applies when a conversation outgrows the
    model's context.

    Shuffle = ONE hash partition on the keys (a conversation never
    splits), then a per-partition sort + vectorized segment scan: window
    starts come from one ``searchsorted`` over the cumulative line-length
    array (strictly increasing when ``sep`` is non-empty), so budget
    truncation is O(targets log rows) with no per-row Python; the joins
    themselves are C-level ``str.join`` per emitted example — Θ(output
    bytes), the inherent cost of materializing quadratic-ish contexts.
    Memory bound: one partition must fit a task heap (same caveat as
    ``grouped_concat``).  SQL twin: a self-join of targets to earlier
    lines with a DESC window cumsum for the budget and ``string_agg(line,
    sep ORDER BY ord)`` — see the ``sft_context_assembly`` oracle."""
    sep_len = len(sep)

    def scan(group: pa.Table) -> pa.Table:
        s = group.drop_columns(["__part"]).sort_by(
            [(k, "ascending") for k in keys] + [(order_col, "ascending")]
        )
        n = s.num_rows
        out_fields = [f for f in s.schema]
        if n == 0:
            return pa.table(
                {
                    **{f.name: pa.array([], f.type) for f in out_fields},
                    "context": pa.array([], pa.string()),
                    "n_context": pa.array([], pa.int64()),
                }
            )
        seg_start, _new = _segment_starts(s, keys)
        line_arr = pc.fill_null(s[line_col].combine_chunks(), "")
        lens = pc.utf8_length(line_arr).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        # c[i] = sum over rows[0:i] of (len + sep_len): window j..i-1 costs
        # (c[i] - c[j]) - sep_len joined characters
        c = np.concatenate(([0], np.cumsum(lens + sep_len)))
        is_t = s[target_col].to_numpy(zero_copy_only=False).astype(bool)
        tgt = np.nonzero(is_t)[0]
        starts = seg_start[tgt]
        if budget is not None:
            cut = np.searchsorted(c, c[tgt] - budget - sep_len, side="left")
            starts = np.maximum(starts, cut)
        lines = line_arr.to_pylist()
        ctx = [sep.join(lines[j:i]) for j, i in zip(starts, tgt)]
        picked = s.take(pa.array(tgt))
        return pa.table(
            {
                **{f.name: picked[f.name] for f in out_fields},
                "context": pa.array(ctx, pa.string()),
                "n_context": pa.array((tgt - starts).astype(np.int64)),
            }
        )

    parted = ds.map_batches(
        lambda t: _hash_partition_col(t, keys, num_partitions),
        batch_format="pyarrow",
    )
    return parted.groupby("__part").map_groups(scan, batch_format="pyarrow")


def mixture_sample(
    ds: "ray.data.Dataset",
    key: str,
    strata_col: str,
    target_rows: int | dict[str, int],
    modulus: int = 1_000_003,
    multiplier: int = 2654435761,
) -> "ray.data.Dataset":
    """Sample DOWN to a target corpus mixture: each stratum's keep-rate is
    derived from its measured size — ``rate_s = min(10^6, max(1,
    10^6·target_s // n_s))`` parts-per-million — then applied with the
    deterministic integer-hash keep rule (the PPM sibling of
    :func:`stratified_sample`'s permille rule).  This is the data-mixing
    primitive for training-corpus assembly ("equalize the sources", "cap
    web at 2× books"): the rates come from the data, not the caller.

    PPM resolution (not permille) plus the floor-to-1 clamp means a
    stratum vastly larger than its target down-samples instead of
    silently vanishing: at 2.1M rows with target 2000, permille would
    floor to 0 and drop the stratum entirely; here rate = 952 ppm keeps
    ≈2000.  Only target 0 (or absence from the dict) drops a stratum.

    Two passes, both scale-safe: the counting pass is one pre-aggregated
    groupby over the stratum column (tiny result — one row per stratum,
    the driver holds only that); the sampling pass is batch-local with
    zero shuffle.  ``target_rows``: one int for every stratum, or a dict
    per stratum (strata absent from the dict are DROPPED — rate 0, the
    explicit-mixture contract).  Pure integer arithmetic end-to-end, so
    membership reproduces exactly in SQL with the identical formula
    ``((key % 1000003) * 2654435761) % 1000000 < rate_ppm``.

    ``key`` must be a non-negative integer column (numpy ``%`` follows
    the divisor's sign while SQL ``%`` follows the dividend's, so
    negative keys would silently diverge from the SQL twin); the
    sampling pass validates and raises on the first negative key."""
    if isinstance(target_rows, int):
        if target_rows < 0:
            raise ValueError(f"mixture_sample: target must be >= 0, got {target_rows}")
    else:
        for s, t in target_rows.items():
            if t < 0:
                raise ValueError(f"mixture_sample: target must be >= 0, got {t} for {s!r}")

    counts = preagg_groupby(ds, [strata_col], [(strata_col, "count", "n")])
    ppm: dict[str, int] = {}
    for row in counts.take_all():  # one row per stratum by construction
        s, n = row[strata_col], int(row["n"])
        tgt = target_rows if isinstance(target_rows, int) else target_rows.get(s)
        if tgt is None or n <= 0 or int(tgt) == 0:
            continue
        ppm[s] = min(1_000_000, max(1, (1_000_000 * int(tgt)) // n))

    return _ppm_filter(ds, key, strata_col, ppm, modulus, multiplier,
                       op_name="mixture_sample")


def _ppm_filter(
    ds: "ray.data.Dataset",
    key: str,
    strata_col: str,
    ppm: dict[str, int],
    modulus: int,
    multiplier: int,
    op_name: str,
) -> "ray.data.Dataset":
    """Shared deterministic keep rule of the mixture-sampling family:
    keep iff ``((key % modulus) * multiplier) % 10^6 < ppm[stratum]`` —
    the formula the SQL twins replicate verbatim, so it must stay
    bit-identical across every sampler that uses it.  Validates the
    non-negative-key contract (numpy ``%`` follows the divisor's sign,
    SQL the dividend's)."""
    def f(t: pa.Table) -> pa.Table:
        v = t[key].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        if v.size and int(v.min()) < 0:
            raise ValueError(
                f"{op_name}: key column {key!r} has negative values — "
                "the keep rule's % diverges from SQL on negative dividends; "
                "normalize to non-negative ids first"
            )
        strata = t[strata_col]
        rate = np.zeros(t.num_rows, dtype=np.int64)
        for s, p in ppm.items():
            m = pc.fill_null(pc.equal(strata, s), False).to_numpy(zero_copy_only=False)
            rate[np.asarray(m, dtype=bool)] = p
        mask = ((v % modulus) * multiplier) % 1_000_000 < rate
        return t.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow")


def temperature_mixture_sample(
    ds: "ray.data.Dataset",
    key: str,
    strata_col: str,
    total_rows: int,
    alpha_permille: int = 500,
    modulus: int = 1_000_003,
    multiplier: int = 2654435761,
) -> "ray.data.Dataset":
    """Temperature-scaled mixture sampling (the T5 / multilingual
    α-sampling rule): stratum s gets an expected share ∝ n_s^α of
    ``total_rows``, flattening the head and boosting the tail as α drops
    below 1.  α is restricted to {250, 500, 750, 1000} permille because
    those powers compose from IEEE-754 ``sqrt`` alone (sqrt is CORRECTLY
    ROUNDED by the standard, so numpy and SQL compute bit-identical
    weights; a general ``pow`` carries no such guarantee and would break
    the cross-engine contract): n^.25 = sqrt(sqrt n), n^.75 =
    sqrt(n)·sqrt(sqrt n) — one extra exact multiply.

    Weights snap to int64 micros (floor(w·10^6 + 0.5)) and every
    derivation after the snap is big-integer arithmetic — rate_s =
    min(10^6, 10^6·total·w_s // (Σw · n_s)) ppm — exact in both engines
    (HUGEINT on the SQL side).  The keep rule and the two-pass,
    driver-holds-one-row-per-stratum shape are :func:`mixture_sample`'s;
    ``key`` must be a non-negative integer column (same % sign caveat).
    """
    if alpha_permille not in (250, 500, 750, 1000):
        raise ValueError(
            "temperature_mixture_sample: alpha_permille must be one of "
            f"250/500/750/1000 (sqrt-composable powers), got {alpha_permille}"
        )
    if total_rows < 0:
        raise ValueError(
            f"temperature_mixture_sample: total_rows must be >= 0, got {total_rows}"
        )

    counts = preagg_groupby(ds, [strata_col], [(strata_col, "count", "n")])
    rows = counts.take_all()  # one row per stratum by construction
    w_micro: dict[str, int] = {}
    for r in rows:
        n = float(int(r["n"]))
        if alpha_permille == 250:
            w = np.sqrt(np.sqrt(n))
        elif alpha_permille == 500:
            w = np.sqrt(n)
        elif alpha_permille == 750:
            w = np.sqrt(n) * np.sqrt(np.sqrt(n))
        else:
            w = n
        w_micro[r[strata_col]] = int(np.floor(w * 1_000_000.0 + 0.5))
    sum_w = sum(w_micro.values())
    ppm: dict[str, int] = {}
    for r in rows:
        s, n = r[strata_col], int(r["n"])
        if n <= 0 or sum_w <= 0 or total_rows == 0:
            continue
        # the same floor-to-1 clamp as mixture_sample: without it a
        # stratum so large that its exact rate floors below 1 ppm would
        # silently VANISH from the mixture (the head stratum, typically —
        # the worst possible row to drop); floor-to-1 over-keeps slightly
        # instead, and only total_rows == 0 drops everything
        ppm[s] = min(
            1_000_000,
            max(1, (1_000_000 * total_rows * w_micro[s]) // (sum_w * n)),
        )

    return _ppm_filter(ds, key, strata_col, ppm, modulus, multiplier,
                       op_name="temperature_mixture_sample")


def shuffle_export(
    ds: "ray.data.Dataset",
    key: str,
    out_dir: str | None = None,
    shard_bits: int = 6,
) -> "ray.data.Dataset":
    """Deterministic global shuffle for training export: every row is
    assigned a pseudo-random but REPRODUCIBLE position — ``h = mix64(key)``
    (the engine's avalanche finalizer, :mod:`raydatax.partition`) — and a
    shard = the top ``shard_bits`` bits of h, so shard assignment and
    within-shard order are stable across runs, partitionings and engines
    (no RNG: re-running an export after a failure reproduces byte-wise
    identical shard membership, the resumability contract).

    With ``out_dir``, one range sort on h clusters rows so each hive
    shard directory (``shard=NN/``) holds its rows in (h, key) order —
    the global-shuffle-then-shard layout a training loader consumes
    sequentially.  Returns the per-shard summary Dataset
    ``(shard, n_rows, min_h, max_h)`` (hashes as decimal strings — uint64
    is out of SQL BIGINT range), computed with one pre-aggregated groupby;
    the summary is the export's manifest and its cross-engine oracle."""
    if not 1 <= shard_bits <= 16:
        raise ValueError(f"shuffle_export: shard_bits must be 1..16, got {shard_bits}")
    from .partition import hash_ints

    def assign(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        h = hash_ints(k)
        shard = (h >> np.uint64(64 - shard_bits)).astype(np.int64)
        return t.append_column("__h", pa.array(h, pa.uint64())).append_column(
            "shard", pa.array(shard)
        )

    tagged = ds.map_batches(assign, batch_format="pyarrow")
    if out_dir is not None:
        import glob as _glob

        import pyarrow.parquet as _pq

        from .sinks import write_partitioned

        # ONE corpus pass: the range sort clusters shards and the write
        # keeps __h (the loader's resume/verification handle); the
        # manifest then comes from parquet FOOTER stats — min/max/count
        # of __h per shard directory, zero data read, and it provably
        # describes the files actually written.
        clustered = tagged.sort(["__h", key])
        write_partitioned(clustered, out_dir, ["shard"])
        shards, ns, mins, maxs = [], [], [], []
        for d in sorted(_glob.glob(os.path.join(out_dir, "shard=*"))):
            n, mn, mx = 0, None, None
            for f in sorted(_glob.glob(os.path.join(d, "*.parquet"))):
                md = _pq.ParquetFile(f).metadata
                ci = md.schema.to_arrow_schema().get_field_index("__h")
                n += md.num_rows
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        raise ValueError(
                            f"shuffle_export: {f} row group {rg} lacks "
                            "__h stats — cannot build the footer manifest"
                        )
                    mn = st.min if mn is None else min(mn, st.min)
                    mx = st.max if mx is None else max(mx, st.max)
            shards.append(int(d.rsplit("=", 1)[-1]))
            ns.append(n)
            mins.append(str(int(mn)))
            maxs.append(str(int(mx)))
        return ray.data.from_arrow(pa.table({
            "shard": pa.array(shards, pa.int64()),
            "n_rows": pa.array(ns, pa.int64()),
            "min_h": pa.array(mins, pa.string()),
            "max_h": pa.array(maxs, pa.string()),
        }))

    summary = preagg_groupby(
        tagged, ["shard"],
        [("shard", "count", "n_rows"), ("__h", "min", "min_h"), ("__h", "max", "max_h")],
    )

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table({
            "shard": t["shard"],
            "n_rows": t["n_rows"],
            "min_h": pc.cast(t["min_h"], pa.string()),
            "max_h": pc.cast(t["max_h"], pa.string()),
        })

    return summary.map_batches(fmt, batch_format="pyarrow")


def train_val_split(
    ds: "ray.data.Dataset",
    entity_col: str,
    val_permille: int = 100,
    out_col: str = "split",
) -> "ray.data.Dataset":
    """Leakage-safe train/validation split: the assignment is a pure
    function of the ENTITY (``mix64(entity) % 1000 < val_permille`` →
    ``'val'``), so every row of a conversation/user/document lands in the
    same split — across runs, engines, partitionings and future ingests
    (new rows of a known entity join its split; no RNG, no state).
    Batch-local, zero shuffle; SQL reproduces membership with the
    bit-exact HUGEINT mix64 replica (see the shuffle_export oracle —
    which, like this operator, requires non-negative entity ids: the
    mix64 replica models the uint64 reinterpretation only for
    non-negative BIGINTs)."""
    if not 0 <= val_permille <= 1000:
        raise ValueError(
            f"train_val_split: val_permille must be 0..1000, got {val_permille}"
        )
    from .partition import hash_ints

    def assign(t: pa.Table) -> pa.Table:
        k = t[entity_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        bucket = (hash_ints(k) % np.uint64(1000)).astype(np.int64)
        split = np.where(bucket < val_permille, "val", "train")
        return t.append_column(out_col, pa.array(split, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def scd2_history(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    seq_col: str,
    op_col: str | None = None,
    delete_value: str = "D",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Type-2 slowly-changing-dimension history from a CDC change log:
    each key's change events (ordered by ``seq_col``, which must be unique
    per key — the WAL sequence number is) become validity intervals —
    ``valid_from_seq`` = the event's seq, ``valid_to_seq`` = the NEXT
    change's seq (NULL while current), ``is_current`` = no later change.
    Delete events close the last interval and open none (standard SCD2
    tombstone handling) — they participate in the lead pass, then drop.

    One hash-partitioned ordered scan (:func:`window_scan` lead) over a
    composite key — the same single-sort shape as the other window
    operators; nothing is materialized on the driver."""
    sep = "\x1f"

    def mk_key(t: pa.Table) -> pa.Table:
        parts = []
        for k in key_cols:
            c = t[k]
            if not pa.types.is_string(c.type):
                c = pc.cast(c, pa.string())
            parts.append(c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c)
        combo = parts[0]
        for p in parts[1:]:
            combo = pc.binary_join_element_wise(combo, p, sep)
        return t.append_column("__scd_k", combo)

    keyed = ds.map_batches(mk_key, batch_format="pyarrow")
    led = window_scan(
        keyed, "__scd_k", seq_col,
        lead_cols=[seq_col], num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        if op_col is not None:
            t = t.filter(pc.not_equal(t[op_col], delete_value))
        nxt = t[f"next_{seq_col}"]
        out = t.drop_columns(["__scd_k", "rn", f"next_{seq_col}"])
        out = out.append_column("valid_from_seq", pc.cast(t[seq_col], pa.int64()))
        out = out.append_column("valid_to_seq", pc.cast(nxt, pa.int64()))
        return out.append_column("is_current", pc.is_null(nxt))

    return led.map_batches(finish, batch_format="pyarrow")


def snapshot_cdc(
    new: "ray.data.Dataset",
    old: "ray.data.Dataset",
    key_cols: list[str],
    compare_cols: list[str],
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Derive a change log from two TABLE SNAPSHOTS — CDC without a
    binlog, the incremental mode for sources that only offer full reads
    (the reference's rdbms readers re-read whole tables each run,
    ``/root/reference/plugin-rdbms-util/.../CommonRdbmsReader.java``; this
    operator turns consecutive such reads into I/U/D events the normal
    exactly-once ingest replays).  One distributed full-outer hash join on
    the key; per-row classification is vectorized null-arithmetic:
    key only in ``new`` → I, only in ``old`` → D (tombstone payload),
    both but any compare column differs (null-safe) → U, identical rows
    emit nothing.  Returns key cols + ``new``'s payload (NULL for D) +
    ``op``."""
    presence = "__snap_old_m"

    def mark_old(t: pa.Table) -> pa.Table:
        cols = {k: t[k] for k in key_cols}
        for c in compare_cols:
            cols[f"__old_{c}"] = t[c]
        cols[presence] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    def mark_new(t: pa.Table) -> pa.Table:
        cols = {k: t[k] for k in key_cols}
        for c in compare_cols:
            cols[c] = t[c]
        cols["__new_m"] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    joined = hash_join(
        new.map_batches(mark_new, batch_format="pyarrow"),
        old.map_batches(mark_old, batch_format="pyarrow"),
        on=key_cols, join_type="full_outer", num_partitions=num_partitions,
    )

    def classify(t: pa.Table) -> pa.Table:
        in_new = pc.is_valid(t["__new_m"])
        in_old = pc.is_valid(t[presence])
        changed = pa.array(np.zeros(t.num_rows, dtype=bool))
        for c in compare_cols:
            a, b = t[c], t[f"__old_{c}"]
            both_null = pc.and_(pc.is_null(a), pc.is_null(b))
            eq = pc.or_(pc.fill_null(pc.equal(a, b), False), both_null)
            changed = pc.or_(changed, pc.invert(eq))
        op = pc.if_else(
            pc.invert(in_old), pa.scalar("I", pa.string()),
            pc.if_else(pc.invert(in_new), pa.scalar("D", pa.string()),
                       pa.scalar("U", pa.string())),
        )
        keep = pc.or_(pc.invert(pc.and_(in_new, in_old)),
                      pc.and_(pc.and_(in_new, in_old), changed))
        cols = {k: t[k] for k in key_cols}
        for c in compare_cols:
            # D rows are tombstones: payload nulled (the WAL convention)
            cols[c] = pc.if_else(in_new, t[c], pa.scalar(None, t[c].type))
        cols["op"] = op
        return pa.table(cols).filter(keep)

    return joined.map_batches(classify, batch_format="pyarrow")


def grouped_exact_sample(
    ds: "ray.data.Dataset",
    group_col: str,
    key: str,
    n: int,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Exactly-N-per-group deterministic sample ("10k examples per
    source"): rows are ranked inside each group by ``mix64(key)`` (a
    pseudo-random but engine-independent order; ``key`` breaks the
    astronomically-unlikely hash tie) and the first ``n`` survive.  Unlike
    rate-based sampling (:func:`stratified_sample`) the group quota is
    EXACT, and unlike ``LIMIT``-style heads the kept rows are unbiased in
    any meaningful input order.  One hash-partitioned sorted scan
    (:func:`window_scan`); reproducible in SQL as ``row_number() OVER
    (PARTITION BY group ORDER BY h, key) <= n`` over the mix64 replica.

    Hashes order as uint64; the sort column ships them as
    sign-flipped int64 (order-preserving), matching the SQL HUGEINT
    order exactly."""
    if n < 1:
        raise ValueError(f"grouped_exact_sample: n must be >= 1, got {n}")
    from .partition import hash_ints

    def tag(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        h = hash_ints(k)
        signed = (h ^ np.uint64(1 << 63)).view(np.int64)  # uint64 order kept
        return t.append_column("__gs_h", pa.array(signed))

    ranked = window_scan(
        ds.map_batches(tag, batch_format="pyarrow"),
        group_col, "__gs_h", num_partitions=num_partitions,
    )

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(t["rn"], n)).drop_columns(["__gs_h", "rn"])

    return ranked.map_batches(keep, batch_format="pyarrow")


def iqr_outliers(
    ds: "ray.data.Dataset",
    key: str,
    value_col: str,
    factor: float = 1.5,
) -> "ray.data.Dataset":
    """Tukey-fence outlier detection per group — the numeric data-cleaning
    rule (drop rows outside [q1 − f·IQR, q3 + f·IQR]) as one engine
    operator: quartiles from the size-adaptive percentile plan (tiny
    result, one row per group — pulled to the driver by the same contract
    as :func:`grouped_percentiles`), fences broadcast, the scan
    batch-local.  Quartiles snap to micro precision before the fence
    arithmetic so the decision expression is bit-identical to SQL
    computing ``floor(quantile_cont·1e6 + 0.5)/1e6`` and the same fences.
    Returns the OUTLIER rows (the complement is the cleaned corpus)."""
    import math

    pct = grouped_percentiles(
        ds, key, value_col, [("__q1", 0.25), ("__q3", 0.75)]
    )
    rows = pct.take_all()
    keys, los, his = [], [], []
    for r in rows:
        if r["__q1"] is None or r["__q3"] is None:
            continue
        q1 = math.floor(r["__q1"] * 1000000 + 0.5) / 1000000
        q3 = math.floor(r["__q3"] * 1000000 + 0.5) / 1000000
        iqr = q3 - q1
        keys.append(r[key])
        los.append(q1 - factor * iqr)
        his.append(q3 + factor * iqr)
    if not keys:
        # no group has computable quartiles (empty input / all-null
        # values): zero outliers, schema preserved
        return ds.map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")
    key_arr = pa.array(keys)
    lo_np, hi_np = np.array(los, np.float64), np.array(his, np.float64)

    def flag(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t[key], value_set=key_arr)
        valid = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        pos = pc.fill_null(idx, 0).to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False)
        vn = np.nan_to_num(v, nan=0.0)
        out = valid & ~np.isnan(v) & (
            (vn < lo_np[pos]) | (vn > hi_np[pos])
        ) if len(lo_np) else np.zeros(t.num_rows, dtype=bool)
        return t.filter(pa.array(out))

    return ds.map_batches(flag, batch_format="pyarrow")


def cms_estimate(
    ds: "ray.data.Dataset",
    col: str,
    probes: list[str],
    width: int = 1024,
    depth: int = 2,
    salts: tuple[int, ...] = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F),
) -> pa.Table:
    """Count-min sketch over a string column, built distributed and probed
    for ``probes`` — frequency estimation in O(depth·width) memory however
    many distinct keys flow (the bounded-memory sibling of
    :func:`heavy_hitters`'s exact counts and the HLL cardinality sketch).
    Per batch: one pre-aggregated (key, count) pass, then each distinct
    key increments ``depth`` slots ``mix64(mix64(poly(key)) + salt_d) %
    width``; the tiny (depth, slot) partials merge through one groupby and
    the driver holds only the depth×width sketch.  Estimate = min over
    rows (the classic one-sided bound: ≥ true count, inflated only by
    collisions).  Every hash is the engine's deterministic chain, so SQL
    reproduces the sketch — and therefore the estimates — exactly."""
    if depth > len(salts):
        raise ValueError(f"cms_estimate: need {depth} salts, got {len(salts)}")
    from .partition import _mix64, hash_string_column

    tf = preagg_groupby(ds, [col], [(col, "count", "__c")])

    def slots(t: pa.Table) -> pa.Table:
        u = hash_string_column(t[col].combine_chunks())
        c = t["__c"].to_numpy(zero_copy_only=False)
        # all depths in ONE int64-exact grouped sum: combined code
        # d·width + slot, sort + np.add.reduceat (float64-weighted
        # bincount loses exactness past 2^53 — the snap/count-before-sum
        # rule — and the unbuffered np.add.at scatter it replaced is ~an
        # order of magnitude slower per batch)
        codes, ws = [], []
        ci = c.astype(np.int64, copy=False)
        with np.errstate(over="ignore"):
            for d in range(depth):
                idx = (_mix64(u + np.uint64(salts[d])) % np.uint64(width))
                codes.append(idx.astype(np.int64) + d * width)
                ws.append(ci)
        if not codes or len(u) == 0:
            e = np.array([], np.int64)
            return pa.table({"d": pa.array(e), "slot": pa.array(e),
                             "c": pa.array(e)})
        code = np.concatenate(codes)
        w = np.concatenate(ws)
        order = np.argsort(code, kind="stable")
        sc = code[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(sc)) + 1))
        sums = np.add.reduceat(w[order], starts)
        uniq = sc[starts]
        return pa.table({
            "d": pa.array(uniq // width),
            "slot": pa.array(uniq % width),
            "c": pa.array(sums.astype(np.int64)),
        })

    merged = preagg_groupby(
        tf.map_batches(slots, batch_format="pyarrow"), ["d", "slot"],
        [("c", "sum", "n")],
    ).take_all()  # ≤ depth × width rows by construction
    sketch = np.zeros((depth, width), dtype=np.int64)
    for r in merged:
        sketch[r["d"], r["slot"]] = r["n"]

    pu = hash_string_column(pa.array(probes, pa.string()))
    ests = []
    with np.errstate(over="ignore"):
        for i in range(len(probes)):
            est = min(
                int(sketch[d, int(_mix64(pu[i:i + 1] + np.uint64(salts[d]))[0]
                                  % np.uint64(width))])
                for d in range(depth)
            )
            ests.append(est)
    return pa.table({"term": pa.array(probes, pa.string()),
                     "est": pa.array(ests, pa.int64())})
