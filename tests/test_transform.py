"""Compute-on-compressed tests: value-map over encoded payloads must equal
transform-then-encode (the reference's scalar-operator semantics,
/root/reference/rle_array/array.py:846-849 + recompress invariant
_algorithms.py:343-367)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rle_array_spark.codecs import CODECS, decode_block, encode_block
from rle_array_spark.codecs.transform import transform_block
from rle_array_spark.engine import encode_df, transform_blocks, decode_stats_df

ARRAYS = {
    "runs": np.repeat(np.array([5, 9, 5, 0], dtype=np.int32), [100, 1, 200, 57]),
    "zipf": np.minimum(np.random.default_rng(7).zipf(1.3, 2000), 65535).astype(np.int32),
    "narrow": np.random.default_rng(8).integers(1000, 1256, 2000).astype(np.int32),
    "motifs": np.tile(np.array([10, 20, 30, 40], dtype=np.int32), 300),
    "empty": np.array([], dtype=np.int32),
    "single": np.array([3], dtype=np.int32),
}


@pytest.mark.parametrize("name", list(ARRAYS))
@pytest.mark.parametrize("codec", list(CODECS))
@pytest.mark.parametrize("op", [lambda v: v + 7, lambda v: v * 3, lambda v: v // 2])
def test_transform_equals_decode_fn_encode(codec, name, op):
    arr = ARRAYS[name]
    payload = encode_block(arr, codec)
    new_codec, new_payload = transform_block(codec, payload, arr.size, op)
    out = decode_block(new_payload, new_codec, arr.size)
    np.testing.assert_array_equal(out, op(arr.astype(np.int64)).astype(np.int32))


def test_transform_rle_merges_runs():
    # floor-div collapses adjacent runs 4,5 → 2,2 which must merge
    arr = np.repeat(np.array([4, 5, 9], dtype=np.int32), [10, 10, 5])
    payload = encode_block(arr, "rle")
    _, new_payload = transform_block("rle", payload, arr.size, lambda v: v // 2)
    import struct

    n_runs = struct.unpack_from("<I", new_payload, 0)[0]
    assert n_runs == 2  # [2]*20 + [4]*5
    np.testing.assert_array_equal(
        decode_block(new_payload, "rle", arr.size), arr // 2
    )


def test_transform_rle_work_is_run_proportional():
    """The payload-level transform must not expand runs: transformed RLE of
    a 1M-element 2-run array stays 2 runs and is fast."""
    arr = np.repeat(np.array([1, 2], dtype=np.int32), [500_000, 500_000])
    payload = encode_block(arr, "rle")
    import time

    t0 = time.monotonic()
    for _ in range(100):
        transform_block("rle", payload, arr.size, lambda v: v + 1)
    assert time.monotonic() - t0 < 0.5  # 100 transforms of 1M elements


def test_transform_blocks_spark(sequences):
    blocks = encode_df(sequences, codec="auto")
    shifted = transform_blocks(blocks, "add", 7)
    a = decode_stats_df(shifted).select("doc_id", "tok_sum", "tok_min", "tok_max")
    b = decode_stats_df(blocks).select("doc_id", "tok_sum", "tok_min", "tok_max", "n_tok")
    j = a.alias("a").join(b.alias("b"), "doc_id")
    n = sequences.count()
    ok = j.filter(
        (F.col("a.tok_sum") == F.col("b.tok_sum") + 7 * F.col("b.n_tok"))
        & ((F.col("b.n_tok") == 0) | (F.col("a.tok_min") == F.col("b.tok_min") + 7))
        & ((F.col("b.n_tok") == 0) | (F.col("a.tok_max") == F.col("b.tok_max") + 7))
    ).count()
    assert ok == n


def test_transform_blocks_metadata_consistent(sequences):
    """Analytically-updated metadata must match a decode-side recompute."""
    blocks = encode_df(sequences, codec="auto")
    shifted = transform_blocks(blocks, "mul", 2)
    meta = shifted.select("doc_id", "tok_sum", "tok_min", "tok_max")
    recomputed = decode_stats_df(shifted).select("doc_id", "tok_sum", "tok_min", "tok_max")
    j = meta.alias("m").join(recomputed.alias("r"), "doc_id")
    n = sequences.count()
    ok = j.filter(
        (F.col("m.tok_sum") == F.col("r.tok_sum"))
        & (F.col("m.tok_min") == F.col("r.tok_min"))
        & (F.col("m.tok_max") == F.col("r.tok_max"))
    ).count()
    assert ok == n


def test_block_minmax_metadata(sequences):
    """tok_min/tok_max block columns equal decoded per-row min/max."""
    blocks = encode_df(sequences, codec="auto")
    meta = blocks.select("doc_id", "tok_min", "tok_max")
    dec = decode_stats_df(blocks).select("doc_id", "tok_min", "tok_max")
    j = meta.alias("m").join(dec.alias("d"), "doc_id")
    n = sequences.count()
    ok = j.filter(
        (F.col("m.tok_min") == F.col("d.tok_min"))
        & (F.col("m.tok_max") == F.col("d.tok_max"))
    ).count()
    assert ok == n
