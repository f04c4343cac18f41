"""Property tests for the round-2 operator kernels: search_after
pagination, nested-document assembly, and split-range coverage."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from raydatax.sinks import _nest_columns
from raydatax.sql_source import split_ranges


@settings(max_examples=200, deadline=None)
@given(lo=st.integers(-1000, 1000), span=st.integers(0, 500),
       n=st.integers(1, 40))
def test_split_ranges_cover_every_value_once(lo, span, n):
    hi = lo + span
    rs = split_ranges(lo, hi, n)
    covered = []
    for a, b, inc in rs:
        covered.extend(range(a, b + 1 if inc else b))
    assert covered == list(range(lo, hi + 1))


@settings(max_examples=100, deadline=None)
@given(st.lists(
    st.tuples(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1,
                 max_size=3),
        st.integers(0, 9),
    ),
    min_size=1, max_size=6,
))
def test_nest_then_extract_roundtrip(path_specs):
    """Random dotted paths nest into structs and extract back to the same
    flat values (the write_jsonl -> read_jsonl contract), or raise the
    documented leaf/prefix conflict."""
    # unique full paths; drop specs whose path duplicates an earlier one
    seen, specs = set(), []
    for segs, v in path_specs:
        path = ".".join(segs)
        if path in seen:
            continue
        seen.add(path)
        specs.append((path, v))

    n = 5
    src = pa.table({f"src{i}": pa.array([v * 10 + r for r in range(n)],
                                        pa.int64())
                    for i, (_, v) in enumerate(specs)})
    doc_paths = [(path, f"src{i}") for i, (path, _) in enumerate(specs)]
    conflict = any(
        p1 != p2 and p2.startswith(p1 + ".") for p1, _ in specs for p2, _ in specs
    )
    if conflict:
        with pytest.raises(ValueError, match="leaf and a sub-document"):
            _nest_columns(src, doc_paths)
        return
    nested = _nest_columns(src, doc_paths)
    for path, srccol in doc_paths:
        head, *rest = path.split(".")
        arr = nested[head]
        if rest:
            arr = pc.struct_field(arr.combine_chunks(), rest)
        assert arr.to_pylist() == src[srccol].to_pylist()


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(page_size=st.integers(1, 9), seed=st.integers(0, 5))
def test_scroll_pages_partition_matchset(ray_session, page_size, seed):
    """Any page size: concatenated scroll pages == unpaged top-k, no
    duplicates, no gaps (the search_after contract)."""
    import numpy as np
    import ray.data as rd

    from raydatax.text import search_scroll, search_topk

    rng = np.random.default_rng(seed)
    words = ["cat", "dog", "fish", "x"]
    texts = [" ".join(rng.choice(words, size=rng.integers(0, 6)))
             for _ in range(25)]
    t = pa.table({"doc_id": pa.array(range(25), pa.int64()),
                  "text": pa.array(texts)})
    ds = rd.from_arrow(t)

    got, cursor, guard = [], None, 0
    while True:
        page, cursor = search_scroll(ds, ["cat", "dog"], page_size,
                                     cursor=cursor)
        got += page["doc_id"].to_pylist()
        guard += 1
        assert guard < 40
        if cursor is None:
            break
    want = search_topk(ds, ["cat", "dog"], 100)["doc_id"].to_pylist()
    assert got == want
    assert len(set(got)) == len(got)
