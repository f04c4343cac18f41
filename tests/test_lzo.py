"""LZO1X codec + lzop / lzo_deflate containers (the reference's CSV
``compress: lzo`` / ``lzo_deflate`` knob,
plugin-unstructured-storage-util/.../UnstructuredStorageReaderUtil.java:103-251).

The compressor emits only M3 instructions (a valid LZO1X subset), so the
decoder's other instruction classes (M1 near/far, M2, M4) are exercised by
hand-assembled streams derived from the public format doc (kernel lzo.rst)."""
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from raydatax.lzo import (
    LzoError,
    lzo1x_compress,
    lzo1x_decompress,
    lzo_deflate_compress_bytes,
    lzo_deflate_decompress_bytes,
    lzop_compress_bytes,
    lzop_decompress_bytes,
)

EOF = bytes([0x11, 0x00, 0x00])


def test_roundtrip_battery():
    rng = random.Random(7)
    cases = [b"", b"a", b"ab", b"abc", b"abcd", b"ab" * 5000, b"\x00" * 100000,
             b"abcabcabcabc", b"the quick brown fox. " * 500]
    # literal-run and match-length encoding boundaries
    for n in (18, 19, 272, 273, 274, 528):
        cases.append(bytes(rng.getrandbits(8) for _ in range(n)))
    for n in (33, 34, 35, 288, 2048):  # M3 length direct/extension edges
        cases.append(b"Q" * 7 + b"Z" * n + b"Q" * 7 + b"Z" * n)
    for _ in range(20):
        motif = bytes(rng.getrandbits(8) for _ in range(rng.randint(1, 40)))
        cases.append(motif * rng.randint(1, 400)
                     + bytes(rng.getrandbits(8) for _ in range(rng.randint(0, 50))))
    for data in cases:
        z = lzo1x_compress(data)
        assert lzo1x_decompress(z, len(data)) == data
        assert lzo1x_decompress(z) == data  # no expected-length hint


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=4000))
def test_roundtrip_hypothesis(data):
    assert lzo1x_decompress(lzo1x_compress(data), len(data)) == data


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=1, max_size=30), st.integers(1, 300), st.binary(max_size=20))
def test_roundtrip_hypothesis_repetitive(motif, reps, tail):
    data = motif * reps + tail
    assert lzo1x_decompress(lzo1x_compress(data), len(data)) == data


def test_hand_vectors_other_instruction_classes():
    # First-byte 18..20 short-literal form + M1 near (state 1..3, opcode<16):
    # "abc", then 2-byte copy from distance 1 -> "abccc".
    v = bytes([20]) + b"abc" + bytes([0x00, 0x00]) + EOF
    assert lzo1x_decompress(v) == b"abccc"

    # M2 (opcode>=64): literal run "abcd", then copy 4 from distance 4.
    # inst = (len-1)<<5 | DDD<<2, dist = DDD + (H<<3) + 1.
    v = bytes([1]) + b"abcd" + bytes([(3 << 5) | (3 << 2), 0x00]) + EOF
    assert lzo1x_decompress(v) == b"abcdabcd"

    # M1 far (state==4, opcode<16): after a long literal run, a 3-byte copy
    # from distance (t>>2) + (H<<2) + 2049.
    rng = random.Random(3)
    lits = bytes(rng.getrandbits(8) for _ in range(3000))
    run = bytes([0]) + bytes([0] * ((3000 - 18 - 1) // 255)) + bytes(
        [((3000 - 18 - 1) % 255) + 1]
    )
    v = run + lits + bytes([0x00, 0x00]) + EOF
    want = lits + lits[3000 - 2049 : 3000 - 2049 + 3]
    assert lzo1x_decompress(v) == want

    # M4 (opcode 16..31, distance >= 16384): copy 3 from distance 16385.
    lits = bytes(rng.getrandbits(8) for _ in range(17000))
    run = bytes([0]) + bytes([0] * ((17000 - 18 - 1) // 255)) + bytes(
        [((17000 - 18 - 1) % 255) + 1]
    )
    v = run + lits + bytes([17, (1 << 2) & 0xFF, 0x00]) + EOF
    want = lits + lits[17000 - 16385 : 17000 - 16385 + 3]
    assert lzo1x_decompress(v) == want


def test_corrupt_streams_raise():
    with pytest.raises(LzoError):
        lzo1x_decompress(b"")
    with pytest.raises(LzoError):
        lzo1x_decompress(bytes([1]) + b"abcd")  # no EOF marker
    with pytest.raises(LzoError):
        lzo1x_decompress(lzo1x_compress(b"hello world"), 999)  # wrong length
    with pytest.raises(LzoError):  # match distance before stream start
        lzo1x_decompress(bytes([1]) + b"abcd" + bytes([(3 << 5) | (3 << 2), 0xFF]) + EOF)
    with pytest.raises(LzoError):
        lzo1x_decompress(lzo1x_compress(b"data") + b"x")  # trailing garbage
    with pytest.raises(LzoError):
        lzop_decompress_bytes(b"not an lzop file at all")
    # flipped payload byte -> adler32 mismatch (or stream corruption)
    z = bytearray(lzop_compress_bytes(b"checksummed payload " * 50))
    z[-5] ^= 0xFF
    with pytest.raises(LzoError):
        lzop_decompress_bytes(bytes(z))


def test_containers_roundtrip_multiblock_and_stored():
    rng = random.Random(11)
    compressible = (b"id,word,value\n" + b"row,%d\n" % 7 * 40000)
    incompressible = bytes(rng.getrandbits(8) for _ in range(70000))
    for data in (b"", b"x", compressible, incompressible):
        assert lzop_decompress_bytes(lzop_compress_bytes(data, block_size=16384)) == data
        assert (
            lzo_deflate_decompress_bytes(
                lzo_deflate_compress_bytes(data, block_size=16384)
            )
            == data
        )
    # incompressible blocks take the stored (src_len == dst_len) path
    z = lzop_compress_bytes(incompressible, block_size=16384)
    assert len(z) < len(incompressible) + 16 * 24  # no blow-up beyond headers


def test_csv_lzo_read_path(tmp_path, ray_session):
    """.lzo (lzop container) and .lzo_deflate (Hadoop raw blocks) CSVs read
    through the whole-file codec path, mixed with a plain CSV."""
    from raydatax.sources import ColumnEntry, read_csv_datax

    spec = [ColumnEntry(index=0, type="long", name="id"),
            ColumnEntry(index=1, type="string", name="w")]
    p1 = str(tmp_path / "a.csv.lzo")
    with open(p1, "wb") as f:
        f.write(lzop_compress_bytes(b"1,one\n2,two\n"))
    p2 = str(tmp_path / "b.csv.lzo_deflate")
    with open(p2, "wb") as f:
        f.write(lzo_deflate_compress_bytes(b"3,three\n"))
    p3 = str(tmp_path / "c.csv")
    with open(p3, "w") as f:
        f.write("4,four\n")
    rows = sorted(read_csv_datax([p1, p2, p3], spec).take_all(), key=lambda r: r["id"])
    assert [r["id"] for r in rows] == [1, 2, 3, 4]
    assert [r["w"] for r in rows] == ["one", "two", "three", "four"]
