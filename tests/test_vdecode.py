"""Differential tests: vectorized multi-row decode ≡ per-row Codec.decode.

Mirrors the reference's JIT/non-JIT dual-path testing discipline
(/root/reference/tests/test_algorithms.py:29-47): the same inputs must decode
bit-identically through both implementations.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rle_array_spark.chooser import choose_codec
from rle_array_spark.codecs import CODECS
from rle_array_spark.codecs.vdecode import (
    _grouped_arange,
    _unpack_many,
    decode_rows_vectorized,
)
from rle_array_spark.codecs.bitpack import pack_bits, packed_nbytes


def _pack_rows(payloads: list[bytes]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    lens = np.array([len(p) for p in payloads], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    return buf, starts, lens


def _roundtrip(rows: list[np.ndarray], codec_for_row) -> None:
    enc = [codec_for_row(r) for r in rows]
    payloads = [p for _, p in enc]
    names = [n for n, _ in enc]
    buf, starts, lens = _pack_rows(payloads)
    ns = np.array([r.size for r in rows], dtype=np.int64)
    flat, offsets = decode_rows_vectorized(buf, starts, lens, names, ns)
    assert flat.dtype == np.int32
    for j, r in enumerate(rows):
        got = flat[offsets[j] : offsets[j + 1]]
        ref = CODECS[names[j]].decode(memoryview(payloads[j]), r.size)
        np.testing.assert_array_equal(got, r.astype(np.int32))
        np.testing.assert_array_equal(got, ref)


EDGE_ROWS = [
    np.array([], dtype=np.int32),
    np.array([0], dtype=np.int32),
    np.array([17], dtype=np.int32),
    np.full(64, 5, dtype=np.int32),
    np.tile(np.array([0, 1], dtype=np.int32), 64),
    np.array([0, 2**31 - 1, 0, 2**31 - 1], dtype=np.int32),
    np.arange(100, dtype=np.int32),
    np.arange(1000, 1256, dtype=np.int32),
    np.zeros(33, dtype=np.int32),
    np.array([255, 256, 65535, 65536, 2**24 - 1, 2**24], dtype=np.int32),
]


@pytest.mark.parametrize("codec", ["raw", "bitpack", "for", "rle", "dict"])
def test_single_codec_edges(codec):
    _roundtrip(EDGE_ROWS, lambda r: (codec, CODECS[codec].encode(r)))


def test_mixed_codecs_auto():
    rng = np.random.default_rng(7)
    rows = list(EDGE_ROWS)
    rows.append(rng.integers(0, 65536, size=2000).astype(np.int32))  # raw-ish
    rows.append(rng.integers(0, 250, size=2000).astype(np.int32))  # bitpack
    rows.append(rng.integers(10**6, 10**6 + 100, size=2000).astype(np.int32))  # for
    rows.append(np.repeat(rng.integers(0, 100, size=40), 50).astype(np.int32))  # rle
    rows.append(rng.choice(np.array([3, 900, 40_000], dtype=np.int32), size=2000))  # dict
    rows.append(np.tile(rng.integers(0, 65536, size=16).astype(np.int32), 100))  # ngram
    _roundtrip(rows, choose_codec)


def test_every_width_bitpack():
    rows = []
    for width in range(0, 32):
        vmax = (1 << width) - 1
        rng = np.random.default_rng(width)
        rows.append(rng.integers(0, vmax + 1, size=97, dtype=np.int64).astype(np.int32))
    _roundtrip(rows, lambda r: ("bitpack", CODECS["bitpack"].encode(r)))


def test_unpack_many_matches_unpack_bits():
    from rle_array_spark.codecs.bitpack import unpack_bits

    rng = np.random.default_rng(3)
    for width in (1, 3, 7, 8, 11, 16, 17, 24, 31, 32, 33):
        ns = np.array([0, 1, 5, 97, 256], dtype=np.int64)
        payloads = []
        expected = []
        for n in ns:
            v = rng.integers(0, 1 << min(width, 63), size=int(n), dtype=np.uint64)
            payloads.append(pack_bits(v, width))
            expected.append(v)
        buf, starts, _ = _pack_rows(payloads)
        got = _unpack_many(buf, starts, ns, width)
        np.testing.assert_array_equal(got, np.concatenate(expected))
        # cross-check each row against the scalar unpack
        off = 0
        for n, p in zip(ns, payloads):
            np.testing.assert_array_equal(
                got[off : off + n], unpack_bits(p, int(n), width)
            )
            off += n


def test_unpack_many_chunking():
    import rle_array_spark.codecs.vdecode as vd

    rng = np.random.default_rng(5)
    ns = np.full(64, 1000, dtype=np.int64)
    vals = [rng.integers(0, 1 << 13, size=1000, dtype=np.uint64) for _ in ns]
    payloads = [pack_bits(v, 13) for v in vals]
    buf, starts, _ = _pack_rows(payloads)
    old = vd._UNPACK_CHUNK_VALUES
    try:
        vd._UNPACK_CHUNK_VALUES = 4096  # force the split path
        got = _unpack_many(buf, starts, ns, 13)
    finally:
        vd._UNPACK_CHUNK_VALUES = old
    np.testing.assert_array_equal(got, np.concatenate(vals))


def test_unpack_many_single_giant_row():
    # A single block above the chunk cap must split at byte-aligned value
    # boundaries instead of building a total×width bit-index matrix.
    import rle_array_spark.codecs.vdecode as vd

    rng = np.random.default_rng(7)
    for width in (1, 3, 6, 13, 17):
        v = rng.integers(0, 1 << width, size=20_000, dtype=np.uint64)
        buf, starts, _ = _pack_rows([pack_bits(v, width)])
        old = vd._UNPACK_CHUNK_VALUES
        try:
            vd._UNPACK_CHUNK_VALUES = 4096
            got = _unpack_many(buf, starts, np.array([v.size], dtype=np.int64), width)
        finally:
            vd._UNPACK_CHUNK_VALUES = old
        np.testing.assert_array_equal(got, v)


def test_grouped_arange():
    np.testing.assert_array_equal(
        _grouped_arange(np.array([3, 0, 2, 1])), [0, 1, 2, 0, 1, 0]
    )
    assert _grouped_arange(np.array([], dtype=np.int64)).size == 0


def test_corrupt_rle_length_raises():
    good = CODECS["rle"].encode(np.repeat(np.int32(7), 10))
    buf, starts, lens = _pack_rows([good])
    with pytest.raises(ValueError, match="length mismatch"):
        decode_rows_vectorized(buf, starts, lens, ["rle"], np.array([11]))


@settings(max_examples=50, deadline=None)
@given(
    data=st.lists(
        st.lists(st.integers(0, 2**31 - 1), min_size=0, max_size=200),
        min_size=1,
        max_size=12,
    )
)
def test_property_vectorized_roundtrip(data):
    rows = [np.array(r, dtype=np.int32) for r in data]
    _roundtrip(rows, choose_codec)


# ---- fused multi-row NGRAM decode (ngram.decode_group) ----


def _ngram_rows(seed: int, n_rows: int) -> list[np.ndarray]:
    """Motif-heavy rows the chooser would send to NGRAM, varied shapes."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_rows):
        motif = rng.integers(0, 50, rng.integers(2, 6)).astype(np.int32)
        reps = int(rng.integers(5, 60))
        noise = rng.integers(0, 1000, rng.integers(0, 20)).astype(np.int32)
        rows.append(np.concatenate([np.tile(motif, reps), noise]))
    return rows


@pytest.mark.parametrize("seed", range(4))
def test_ngram_decode_group_differential(seed):
    """decode_group must be bit-identical to per-row NGRAM decode over
    mixed shapes, including empty and symbol-free rows."""
    from rle_array_spark.codecs.ngram import decode_group

    rows = _ngram_rows(seed, 9)
    rows.insert(3, np.array([], dtype=np.int32))          # empty row
    rows.insert(5, np.arange(7, dtype=np.int32))          # likely 0-symbol row
    ng = CODECS["ngram"]
    payloads = [ng.encode(r) for r in rows]
    ns = np.array([r.size for r in rows], dtype=np.int64)
    fused = decode_group([memoryview(p) for p in payloads], ns)
    expect = np.concatenate(
        [ng.decode(memoryview(p), int(n)) for p, n in zip(payloads, ns)]
    ) if ns.sum() else np.zeros(0, np.int32)
    np.testing.assert_array_equal(fused, expect)
    assert fused.dtype == np.int32


def test_ngram_decode_group_single_and_empty():
    from rle_array_spark.codecs.ngram import decode_group

    assert decode_group([], np.array([], dtype=np.int64)).size == 0
    r = np.tile(np.array([3, 4, 5], np.int32), 40)
    p = CODECS["ngram"].encode(r)
    np.testing.assert_array_equal(
        decode_group([memoryview(p)], np.array([r.size])), r
    )


def test_ngram_decode_group_length_mismatch_raises():
    from rle_array_spark.codecs.ngram import decode_group

    r = np.tile(np.array([3, 4, 5], np.int32), 40)
    p = CODECS["ngram"].encode(r)
    with pytest.raises(ValueError, match="length mismatch"):
        decode_group([memoryview(p)], np.array([r.size + 1]))


@settings(max_examples=60, deadline=None)
@given(
    data=st.lists(
        st.one_of(
            st.lists(st.integers(0, 2**31 - 1), min_size=0, max_size=60),
            # motif-heavy rows that actually build grammars
            st.tuples(
                st.lists(st.integers(0, 99), min_size=1, max_size=5),
                st.integers(2, 40),
            ).map(lambda t: (t[0] * t[1])),
        ),
        min_size=2,
        max_size=10,
    )
)
def test_property_ngram_decode_group(data):
    """decode_group == per-row ngram decode on arbitrary mixed rows
    (randomized guard for the table-first expansion + segment gather)."""
    from rle_array_spark.codecs.ngram import decode_group

    rows = [np.asarray(r, dtype=np.int32) for r in data]
    ng = CODECS["ngram"]
    payloads = [ng.encode(r) for r in rows]
    ns = np.array([r.size for r in rows], dtype=np.int64)
    fused = decode_group([memoryview(p) for p in payloads], ns)
    parts = [ng.decode(memoryview(p), int(n)) for p, n in zip(payloads, ns)]
    expect = np.concatenate(parts) if parts else np.zeros(0, np.int32)
    np.testing.assert_array_equal(fused, expect)
