"""DataX dx_* transformer parity (vectorized Arrow versions)."""

import pyarrow as pa
import pytest

from raydatax.transforms import (
    REGISTRY,
    chain,
    dx_filter,
    dx_pad,
    dx_replace,
    dx_substr,
    dx_url,
    register,
)


@pytest.fixture
def batch():
    return pa.table(
        {
            "s": ["hello world", "ab", None, "长字符串测试", ""],
            "n": [1.5, 20.0, 3.0, None, -7.0],
        }
    )


def test_substr(batch):
    out = dx_substr(batch, "s", 0, 5)
    assert out["s"].to_pylist() == ["hello", "ab", None, "长字符串测", ""]


def test_substr_beyond_length_is_empty(batch):
    out = dx_substr(batch, "s", 100, 5)
    assert out["s"].to_pylist() == ["", "", None, "", ""]


def test_pad(batch):
    out = dx_pad(batch, "s", "l", 4, "*")
    assert out["s"].to_pylist() == ["hell", "**ab", None, "长字符串", "****"]
    out = dx_pad(batch, "s", "r", 4, "-")
    assert out["s"].to_pylist() == ["hell", "ab--", None, "长字符串", "----"]
    with pytest.raises(ValueError):
        dx_pad(batch, "s", "x", 4, "-")


def test_replace(batch):
    out = dx_replace(batch, "s", 1, 3, "XY")
    assert out["s"].to_pylist()[0] == "hXYo world"
    assert out["s"].to_pylist()[1] == "aXY"
    assert out["s"].to_pylist()[2] is None


def test_filter_compare_drops_matching(batch):
    out = dx_filter(batch, "n", ">", 2)
    # records MATCHING the predicate are dropped; nulls are kept
    assert out["n"].to_pylist() == [1.5, None, -7.0]
    out = dx_filter(batch, "n", "<=", 1.5)
    assert out["n"].to_pylist() == [20.0, 3.0, None]


def test_filter_like_full_match(batch):
    out = dx_filter(batch, "s", "like", "h.*")
    assert out["s"].to_pylist() == ["ab", None, "长字符串测试", ""]
    # null never matches any predicate → never dropped (reference null rules)
    out = dx_filter(batch, "s", "not like", "h.*")
    assert out["s"].to_pylist() == ["hello world", None]


def test_filter_bad_op(batch):
    with pytest.raises(ValueError):
        dx_filter(batch, "n", "~", 1)


def test_url():
    b = pa.table(
        {"u": ["https://ex.com:8080/a/b?q=1&r=2#frag", "ftp://h/x", None]}
    )
    out = dx_url(b, "u", param="q")
    assert out["u_scheme"].to_pylist() == ["https", "ftp", None]
    assert out["u_host"].to_pylist() == ["ex.com", "h", None]
    assert out["u_path"].to_pylist() == ["/a/b", "/x", None]
    assert out["u_q"].to_pylist() == ["1", None, None]


def test_chain_and_registry(batch):
    fn = chain([("dx_substr", "s", 0, 5), ("dx_pad", "s", "r", 6, "_"), ("dx_filter", "n", ">", 5)])
    out = fn(batch)
    assert out["s"].to_pylist() == ["hello_", None, "长字符串测_", "_____" + "_"]
    with pytest.raises(ValueError):
        register("dx_bad", lambda b: b)
    register("noop", lambda b: b)
    assert "noop" in REGISTRY


def test_unknown_column(batch):
    with pytest.raises(KeyError):
        dx_substr(batch, "zz", 0, 1)


def test_text_prep_transformers_in_chain():
    """normalize_text / redact_pii are registry transformers usable from a
    job-JSON chain; they replace the column in place (chain semantics)."""
    import pyarrow as pa

    from raydatax.transforms import chain

    t = pa.table({"text": pa.array(["  Mail ME: bob@x.org  NOW ", "plain"])})
    fn = chain([("normalize_text", "text"), ("redact_pii", "text")])
    out = fn(t)
    assert out.column_names == ["text"]
    assert out["text"].to_pylist() == ["mail me: <EMAIL> now", "plain"]


def test_json_extract_paths_and_dirty_payloads(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raydatax.transforms import JsonExtract

    rows = [
        '{"k": 1, "meta": {"tag": "a", "ok": true}}',
        '{"k": "txt", "meta": {"tag": 2.5}}',
        '{"other": 9}',
        'not json at all',
        None,
        '{"meta": [1, 2]}',
    ]
    t = pa.table({"i": pa.array(range(len(rows)), pa.int64()),
                  "props": pa.array(rows, pa.string())})
    fx = JsonExtract("props", {"k": "k", "tag": "meta.tag", "ok": "meta.ok"})
    out = fx(t).to_pylist()
    assert [r["k"] for r in out] == ["1", "txt", None, None, None, None]
    assert [r["tag"] for r in out] == ["a", "2.5", None, None, None, None]
    assert [r["ok"] for r in out] == ["true", None, None, None, None, None]
