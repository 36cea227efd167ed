"""DICT codec — dictionary encoding.

Generalizes the reference's ``factorize`` (dictionary-encode run values,
/root/reference/rle_array/array.py:294-306) into a standalone codec: the
sorted unique-value table plus bit-packed codes. The dict table itself is
FOR+bit-packed (it is a sorted int array, so deltas would pack even tighter;
kept absolute-FOR for decode simplicity — the table is the minor term).
"""

from __future__ import annotations

import struct

import numpy as np

from rle_array_spark.codecs.bitpack import bit_width, pack_bits, packed_nbytes, unpack_bits
from rle_array_spark.codecs.core import BlockStats, Codec, check_tokens

_HEADER = "<IqBB"  # cardinality:uint32, dbase:int64, dwidth:uint8, cwidth:uint8
_HEADER_SIZE = struct.calcsize(_HEADER)


class DictCodec(Codec):
    name = "dict"

    def encode(self, values: np.ndarray, table: np.ndarray | None = None) -> bytes:
        v = check_tokens(values)
        if table is None:
            table = np.unique(v)
        card = int(table.size)
        if card == 0:
            return struct.pack(_HEADER, 0, 0, 0, 0)
        span = int(table[-1]) - int(table[0]) + 1
        if span <= 2 * v.size:
            # Dense value range: O(span + n) inverse-lookup table beats the
            # O(n log card) searchsorted (identical codes either way for a
            # covering table). np.zeros + clip-mode take keep even a
            # MISUSED partial table deterministic and crash-free — the same
            # garbage-codes-no-crash class the searchsorted path has.
            lut = np.zeros(span, dtype=np.int64)
            lut[table - table[0]] = np.arange(card, dtype=np.int64)
            codes = np.take(lut, v.astype(np.int64) - int(table[0]), mode="clip")
        else:
            codes = np.searchsorted(table, v)
        dbase = int(table[0])
        dwidth = bit_width(int(table[-1]) - dbase)
        cwidth = bit_width(card - 1)
        header = struct.pack(_HEADER, card, dbase, dwidth, cwidth)
        return (
            header
            + pack_bits(table.astype(np.int64) - dbase, dwidth)
            + pack_bits(codes, cwidth)
        )

    def decode(self, payload, n: int) -> np.ndarray:
        buf = memoryview(payload)
        card, dbase, dwidth, cwidth = struct.unpack_from(_HEADER, buf, 0)
        if card == 0:
            return np.zeros(0, dtype=np.int32)
        off = _HEADER_SIZE
        tbytes = packed_nbytes(card, dwidth)
        table = (
            unpack_bits(buf[off : off + tbytes], card, dwidth).astype(np.int64) + dbase
        ).astype(np.int32)
        codes = unpack_bits(buf[off + tbytes :], n, cwidth).astype(np.int64)
        return table[codes]

    def parts(self, payload, n: int) -> tuple[np.ndarray, np.ndarray]:
        """(table int64 ascending-unique, codes int64) without gathering
        values — the code-domain view used by the dict⊕dict zip."""
        buf = memoryview(payload)
        card, dbase, dwidth, cwidth = struct.unpack_from(_HEADER, buf, 0)
        if card == 0:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
        off = _HEADER_SIZE
        tbytes = packed_nbytes(card, dwidth)
        table = unpack_bits(buf[off : off + tbytes], card, dwidth).astype(np.int64) + dbase
        codes = unpack_bits(buf[off + tbytes :], n, cwidth).astype(np.int64)
        return table, codes

    def encode_parts(self, table: np.ndarray, codes: np.ndarray) -> bytes:
        """Build a payload from a SORTED-UNIQUE int32 table (every entry
        referenced) + codes — byte-identical to ``encode(table[codes])``
        without materializing the values."""
        card = int(table.size)
        if card == 0:
            return struct.pack(_HEADER, 0, 0, 0, 0)
        dbase = int(table[0])
        dwidth = bit_width(int(table[-1]) - dbase)
        cwidth = bit_width(card - 1)
        return (
            struct.pack(_HEADER, card, dbase, dwidth, cwidth)
            + pack_bits(table.astype(np.int64) - dbase, dwidth)
            + pack_bits(codes, cwidth)
        )

    def estimate_size(self, stats: BlockStats) -> int:
        if stats.n == 0:
            return _HEADER_SIZE
        dwidth = bit_width(stats.vmax - stats.vmin)
        cwidth = bit_width(max(stats.cardinality - 1, 0))
        return (
            _HEADER_SIZE
            + packed_nbytes(stats.cardinality, dwidth)
            + packed_nbytes(stats.n, cwidth)
        )
