"""Bit-packing primitives: pack non-negative ints into ``width`` bits each.

Pure NumPy, fully vectorized. Byte-aligned widths (8/16/32/64) take a direct
dtype-cast fast path; other widths route through C-level
``np.unpackbits``/``np.packbits`` (little-endian bit order) on the smallest
containing integer dtype — no Python-level bit loops anywhere.

These are the shared substrate for the BITPACK / FOR codecs and for the
packed run-values / run-lengths inside the RLE, DICT and NGRAM payloads.
The reference engine stores run-end positions as raw int64
(/root/reference/rle_array/types.py:7); packing them is one of this engine's
size wins over the reference's ``r * (value_bytes + 8)`` formula.
"""

from __future__ import annotations

import numpy as np

__all__ = ["bit_width", "pack_bits", "unpack_bits", "packed_nbytes"]

_EXACT = {8: np.dtype("<u1"), 16: np.dtype("<u2"), 32: np.dtype("<u4"), 64: np.dtype("<u8")}


def bit_width(max_value: int) -> int:
    """Bits needed to represent values in [0, max_value]. 0 when max_value == 0."""
    if max_value < 0:
        raise ValueError(f"bit_width requires non-negative max_value, got {max_value}")
    return int(max_value).bit_length()


def _container(width: int) -> tuple[np.dtype, int]:
    for w in (8, 16, 32, 64):
        if width <= w:
            return _EXACT[w], w
    raise ValueError(f"width {width} > 64 unsupported")


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative integers into ``width`` bits each (little-endian bit
    order). ``width == 0`` encodes a constant-zero stream as zero bytes."""
    if width == 0:
        return b""
    v = np.asarray(values)
    if v.size == 0:
        return b""
    exact = _EXACT.get(width)
    if exact is not None:
        return v.astype(exact, copy=False).tobytes()
    dtype, w = _container(width)
    cells = v.astype(dtype, copy=False).reshape(-1, 1).view(np.uint8)
    bits = np.unpackbits(cells, axis=1, bitorder="little")[:, :width]
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack_bits(buf: bytes | memoryview, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns uint64 array of length ``n``."""
    if n == 0 or width == 0:
        return np.zeros(n, dtype=np.uint64)
    exact = _EXACT.get(width)
    if exact is not None:
        return np.frombuffer(buf, dtype=exact, count=n).astype(np.uint64)
    dtype, w = _container(width)
    raw = np.frombuffer(buf, dtype=np.uint8, count=(n * width + 7) // 8)
    bits = np.unpackbits(raw, count=n * width, bitorder="little").reshape(n, width)
    padded = np.zeros((n, w), dtype=np.uint8)
    padded[:, :width] = bits
    return (
        np.packbits(padded, axis=1, bitorder="little")
        .view(dtype)
        .ravel()
        .astype(np.uint64)
    )


def packed_nbytes(n: int, width: int) -> int:
    """Size in bytes of a packed stream of ``n`` values at ``width`` bits."""
    return (n * width + 7) // 8
