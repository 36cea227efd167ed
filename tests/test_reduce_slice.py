"""Compressed-domain reduction + slice tests (reference test_reduce.py
differential pattern: every op × codec × shape vs the uncompressed truth)."""

from __future__ import annotations

import numpy as np
import pytest

from rle_array_spark.codecs import CODECS, encode_block
from rle_array_spark.codecs.reduce import (
    block_any_all,
    block_min_max,
    block_prod,
    block_sum,
    decode_slice,
)

ARRAYS = {
    "runs": np.repeat(np.array([5, 9, 5, 0], dtype=np.int32), [100, 1, 200, 57]),
    "zipf": np.minimum(np.random.default_rng(7).zipf(1.3, 2000), 65535).astype(np.int32),
    "narrow": np.random.default_rng(8).integers(1000, 1256, 2000).astype(np.int32),
    "motifs": np.tile(np.array([10, 20, 30, 40], dtype=np.int32), 300),
    "single": np.array([3], dtype=np.int32),
    "alternating": np.tile(np.array([0, 1], dtype=np.int32), 500),
}


@pytest.mark.parametrize("name", list(ARRAYS))
@pytest.mark.parametrize("codec", list(CODECS))
def test_block_sum_minmax(codec, name):
    arr = ARRAYS[name]
    payload = encode_block(arr, codec)
    assert block_sum(codec, payload, arr.size) == int(arr.sum(dtype=np.int64))
    assert block_min_max(codec, payload, arr.size) == (int(arr.min()), int(arr.max()))


@pytest.mark.parametrize("codec", list(CODECS))
def test_block_any_all_prod(codec):
    cases = [
        np.array([0, 0, 0], np.int32),
        np.array([0, 1, 2], np.int32),
        np.array([3, 1, 2], np.int32),
        np.repeat(np.array([2, 3], np.int32), [5, 4]),
    ]
    for arr in cases:
        payload = encode_block(arr, codec)
        assert block_any_all(codec, payload, arr.size) == (
            bool((arr != 0).any()),
            bool((arr != 0).all()),
        )
        assert block_prod(codec, payload, arr.size) == pytest.approx(
            float(np.prod(arr.astype(np.float64)))
        )


def test_block_reduce_empty():
    arr = np.array([], dtype=np.int32)
    for codec in CODECS:
        payload = encode_block(arr, codec)
        assert block_sum(codec, payload, 0) == 0
        assert block_min_max(codec, payload, 0) == (0, 0)


@pytest.mark.parametrize("name", list(ARRAYS))
@pytest.mark.parametrize("codec", list(CODECS))
@pytest.mark.parametrize(
    "bounds", [(0, 8), (3, 17), (0, 10**9), (100, 101), (357, 999), (5, 5), (-3, 4)]
)
def test_decode_slice(codec, name, bounds):
    arr = ARRAYS[name]
    payload = encode_block(arr, codec)
    start, stop = bounds
    expected = arr[max(0, start) : max(0, min(stop, arr.size))]
    out = decode_slice(codec, payload, arr.size, start, stop)
    np.testing.assert_array_equal(out, expected)


def test_rle_slice_is_sublinear():
    """Slicing 10 elements out of a 1M-element RLE block must not expand
    the whole block (reference fastpath contract, tests/test_fastpath.py)."""
    arr = np.repeat(np.arange(1000, dtype=np.int32), 1000)  # 1M elements, 1000 runs
    payload = encode_block(arr, "rle")
    import time

    t0 = time.monotonic()
    for i in range(0, 1_000_000, 50_000):
        np.testing.assert_array_equal(
            decode_slice("rle", payload, arr.size, i, i + 10), arr[i : i + 10]
        )
    assert time.monotonic() - t0 < 0.2
