"""Codec registry + block-level encode/decode entry points."""

from __future__ import annotations

import numpy as np

from rle_array_spark.codecs.core import BlockStats, Codec, TOKEN_DTYPE, compute_stats
from rle_array_spark.codecs.dictionary import DictCodec
from rle_array_spark.codecs.ngram import NgramCodec
from rle_array_spark.codecs.rle import RleCodec, reference_rle_nbytes, split_runs
from rle_array_spark.codecs.simple import BitpackCodec, ForCodec, RawCodec

CODECS: dict[str, Codec] = {
    c.name: c
    for c in (RawCodec(), BitpackCodec(), ForCodec(), RleCodec(), DictCodec(), NgramCodec())
}

__all__ = [
    "CODECS",
    "BlockStats",
    "Codec",
    "TOKEN_DTYPE",
    "compute_stats",
    "encode_block",
    "decode_block",
    "reference_rle_nbytes",
    "split_runs",
]


def _lookup(codec: str) -> Codec:
    try:
        return CODECS[codec]
    except KeyError:
        raise ValueError(
            f"unknown codec {codec!r}; available: {sorted(CODECS)}"
        ) from None


def encode_block(values: np.ndarray, codec: str) -> bytes:
    return _lookup(codec).encode(values)


def decode_block(payload: bytes | memoryview, codec: str, n: int) -> np.ndarray:
    return _lookup(codec).decode(payload, n)
