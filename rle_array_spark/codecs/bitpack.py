"""Bit-packing primitives: pack non-negative ints into ``width`` bits each.

Pure NumPy, fully vectorized (no per-element Python). These are the shared
substrate for the BITPACK / FOR codecs and for the packed run-values /
run-lengths inside the RLE, DICT and NGRAM payloads.

The reference engine stores run-end positions as raw int64
(/root/reference/rle_array/types.py:7); packing them is one of this engine's
size wins over the reference's ``r * (value_bytes + 8)`` formula.
"""

from __future__ import annotations

import numpy as np

__all__ = ["bit_width", "pack_bits", "unpack_bits"]


def bit_width(max_value: int) -> int:
    """Bits needed to represent values in [0, max_value]. 0 when max_value == 0."""
    if max_value < 0:
        raise ValueError(f"bit_width requires non-negative max_value, got {max_value}")
    return int(max_value).bit_length()


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative integers into ``width`` bits each (little-endian bit order).

    ``width == 0`` encodes a constant-zero stream as zero bytes.
    """
    if width == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64 unsupported")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # (n, width) bit matrix, LSB first, then pack to bytes.
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack_bits(buf: bytes | memoryview, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns uint64 array of length ``n``."""
    if n == 0 or width == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8, count=(n * width + 7) // 8)
    bits = np.unpackbits(raw, count=n * width, bitorder="little").reshape(n, width)
    weights = (np.uint64(1) << np.arange(width, dtype=np.uint64))
    return bits.astype(np.uint64) @ weights


def packed_nbytes(n: int, width: int) -> int:
    """Size in bytes of a packed stream of ``n`` values at ``width`` bits."""
    return (n * width + 7) // 8
