"""Property-based round-trip tests (hypothesis): for ANY non-negative int32
array, every codec must round-trip bit-identically, the chooser's pick must
round-trip AND never exceed raw by more than the threshold guard, and
compressed reductions must equal their decoded-domain twins."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from rle_array_spark.chooser import choose_codec
from rle_array_spark.codecs import CODECS, decode_block, encode_block
from rle_array_spark.codecs.reduce import block_min_max, block_sum, decode_slice
from rle_array_spark.codecs.transform import transform_block

token_arrays = arrays(
    dtype=np.int32,
    shape=st.integers(0, 400),
    elements=st.one_of(
        st.integers(0, 3),  # low-card / runs regime
        st.integers(0, 65535),  # vocab regime
        st.integers(0, 2**31 - 1),  # full-range regime
    ),
)

# run-structured arrays: repeat small values with varying lengths
run_arrays = st.lists(
    st.tuples(st.integers(0, 100), st.integers(1, 50)), min_size=0, max_size=40
).map(
    lambda pairs: np.repeat(
        np.array([v for v, _ in pairs], dtype=np.int32),
        np.array([l for _, l in pairs], dtype=np.int64),
    )
    if pairs
    else np.array([], dtype=np.int32)
)

any_tokens = st.one_of(token_arrays, run_arrays)


@settings(max_examples=150, deadline=None)
@given(arr=any_tokens, codec=st.sampled_from(sorted(CODECS)))
def test_every_codec_roundtrips(arr, codec):
    payload = encode_block(arr, codec)
    out = decode_block(payload, codec, arr.size)
    np.testing.assert_array_equal(out, arr)
    assert out.dtype == np.int32


@settings(max_examples=150, deadline=None)
@given(arr=any_tokens)
def test_auto_roundtrips_and_beats_threshold(arr):
    codec, payload = choose_codec(arr)
    np.testing.assert_array_equal(decode_block(payload, codec, arr.size), arr)
    if codec != "raw":
        assert len(payload) <= arr.size * 4


@settings(max_examples=100, deadline=None)
@given(arr=any_tokens, codec=st.sampled_from(sorted(CODECS)))
def test_compressed_reductions_match(arr, codec):
    payload = encode_block(arr, codec)
    assert block_sum(codec, payload, arr.size) == int(arr.sum(dtype=np.int64))
    if arr.size:
        assert block_min_max(codec, payload, arr.size) == (int(arr.min()), int(arr.max()))


@settings(max_examples=100, deadline=None)
@given(
    arr=any_tokens,
    codec=st.sampled_from(sorted(CODECS)),
    start=st.integers(-5, 500),
    length=st.integers(0, 500),
)
def test_slice_matches_numpy(arr, codec, start, length):
    payload = encode_block(arr, codec)
    lo = max(0, start)
    hi = max(lo, min(start + length, arr.size))
    np.testing.assert_array_equal(
        decode_slice(codec, payload, arr.size, start, start + length), arr[lo:hi]
    )


@settings(max_examples=100, deadline=None)
@given(arr=any_tokens, codec=st.sampled_from(sorted(CODECS)), k=st.integers(0, 1000))
def test_transform_add_matches_or_raises_on_overflow(arr, codec, k):
    payload = encode_block(arr, codec)
    expected = arr.astype(np.int64) + k
    overflows = arr.size > 0 and int(expected.max()) > 2**31 - 1
    if overflows:
        # silent int32 wraparound would be data corruption; must raise
        with pytest.raises(ValueError, match="int32 token range"):
            transform_block(codec, payload, arr.size, lambda v: v + k)
        return
    new_codec, new_payload = transform_block(codec, payload, arr.size, lambda v: v + k)
    np.testing.assert_array_equal(decode_block(new_payload, new_codec, arr.size), expected)
