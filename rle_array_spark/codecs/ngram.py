"""NGRAM codec — FSST-style symbol-table compression of token n-grams.

FSST builds a table of frequent string substrings and replaces them with
1-byte codes; the token-stream analog here is a Re-Pair-style pair grammar:
each round finds the most frequent adjacent token *pairs* and replaces them
with fresh symbol ids (> any token value), so after R rounds a symbol can
cover an n-gram of up to 2^R original tokens. The symbol table (left, right
per symbol) ships inside the payload; the final stream and table are
bit-packed.

No reference counterpart (SURVEY.md §2.e) — the closest structure is the
reference's dictionary-on-run-values ``factorize``
(/root/reference/rle_array/array.py:294-306), composed over sliding windows.

All steps are vectorized NumPy: pair counting via np.unique on a fused
(left*M + right) key; greedy non-overlapping replacement resolves conflicts
between adjacent matches with the alternate-position trick (keep even offsets
within each chain of consecutive match positions).
"""

from __future__ import annotations

import struct

import numpy as np

from rle_array_spark.codecs.bitpack import bit_width, pack_bits, packed_nbytes, unpack_bits
from rle_array_spark.codecs.core import BlockStats, Codec, check_tokens

_HEADER = "<HqIBB"  # n_syms:uint16, sym_base:int64, n_stream:uint32, twidth:uint8, swidth:uint8
_HEADER_SIZE = struct.calcsize(_HEADER)

MAX_SYMS = 256
MAX_ROUNDS = 8
PAIRS_PER_ROUND = 64
MIN_PAIR_COUNT = 4  # a table entry costs ~2 packed ints; needs >=4 hits to pay off


def _greedy_nonoverlapping(positions: np.ndarray) -> np.ndarray:
    """From sorted candidate match positions (each match spans [p, p+1]),
    keep a maximal greedy left-to-right non-overlapping subset."""
    if positions.size == 0:
        return positions
    gaps = np.diff(positions)
    chain_start = np.concatenate(([True], gaps > 1))
    chain_id = np.cumsum(chain_start) - 1
    starts = positions[chain_start]
    offsets = positions - starts[chain_id]
    return positions[offsets % 2 == 0]


class NgramCodec(Codec):
    name = "ngram"

    @staticmethod
    def repeat_fraction(values: np.ndarray, sample_pairs: int = 2048) -> float:
        """Fraction of adjacent-pair occurrences that round-1 could replace
        (pairs appearing >= MIN_PAIR_COUNT times). One np.unique over the
        fused digram keys — ~1/MAX_ROUNDS of a full grammar build — used by
        the chooser to skip hopeless blocks; later rounds only compound what
        round 1 finds, so a weak round 1 bounds the whole grammar's gain.

        Computed on the first ``sample_pairs`` digrams: it feeds a go/no-go
        heuristic only (the trial encode measures the real size), and pair
        frequency is stationary enough within one sequence that a prefix
        sample ranks identically in practice."""
        n = min(values.size, sample_pairs + 1)
        if n < 2:
            return 0.0
        v = values[:n]
        s = v.astype(np.int64)
        key_mult = np.int64(int(v.max()) + MAX_SYMS + 2)
        keys = s[:-1] * key_mult + s[1:]
        _, counts = np.unique(keys, return_counts=True)
        eligible = counts[counts >= MIN_PAIR_COUNT].sum()
        return float(eligible) / float(n)

    def encode(self, values: np.ndarray) -> bytes:
        v = check_tokens(values)
        n = int(v.size)
        if n == 0:
            return struct.pack(_HEADER, 0, 0, 0, 0, 0)
        sym_base = int(v.max()) + 1
        key_mult = np.int64(sym_base + MAX_SYMS + 1)
        s = v.astype(np.int64)
        table_left: list[int] = []
        table_right: list[int] = []

        for _ in range(MAX_ROUNDS):
            if s.size < 2 or len(table_left) >= MAX_SYMS:
                break
            keys = s[:-1] * key_mult + s[1:]
            uniq, counts = np.unique(keys, return_counts=True)
            eligible = counts >= MIN_PAIR_COUNT
            if not eligible.any():
                break
            budget = min(PAIRS_PER_ROUND, MAX_SYMS - len(table_left))
            cand_idx = np.flatnonzero(eligible)
            if cand_idx.size > budget:
                top = np.argsort(counts[cand_idx], kind="stable")[::-1][:budget]
                cand_idx = cand_idx[top]
            sel_keys = np.sort(uniq[cand_idx])
            # Assign fresh symbol ids in sorted-key order (deterministic).
            sym_ids = sym_base + len(table_left) + np.arange(sel_keys.size, dtype=np.int64)
            table_left.extend((sel_keys // key_mult).tolist())
            table_right.extend((sel_keys % key_mult).tolist())
            # Match positions: keys present in sel_keys.
            pos_in_sel = np.searchsorted(sel_keys, keys)
            pos_in_sel = np.clip(pos_in_sel, 0, sel_keys.size - 1)
            is_match = sel_keys[pos_in_sel] == keys
            kept = _greedy_nonoverlapping(np.flatnonzero(is_match))
            if kept.size == 0:
                break
            s[kept] = sym_ids[pos_in_sel[kept]]
            drop = np.zeros(s.size, dtype=bool)
            drop[kept + 1] = True
            s = s[~drop]

        n_syms = len(table_left)
        table = np.empty(2 * n_syms, dtype=np.int64)
        if n_syms:
            table[0::2] = table_left
            table[1::2] = table_right
        max_id = sym_base + n_syms - 1
        twidth = bit_width(max_id) if n_syms else 0
        swidth = bit_width(int(s.max())) if s.size else 0
        header = struct.pack(_HEADER, n_syms, sym_base, s.size, twidth, swidth)
        return header + pack_bits(table, twidth) + pack_bits(s, swidth)

    def decode(self, payload, n: int) -> np.ndarray:
        buf = memoryview(payload)
        n_syms, sym_base, n_stream, twidth, swidth = struct.unpack_from(_HEADER, buf, 0)
        if n == 0:
            return np.zeros(0, dtype=np.int32)
        off = _HEADER_SIZE
        tbytes = packed_nbytes(2 * n_syms, twidth)
        table = unpack_bits(buf[off : off + tbytes], 2 * n_syms, twidth).astype(np.int64)
        left, right = table[0::2], table[1::2]
        s = unpack_bits(buf[off + tbytes :], n_stream, swidth).astype(np.int64)
        # Expand symbols; terminates because symbol k expands only to ids
        # strictly smaller than sym_base + k (grammar is acyclic by build order).
        while True:
            mask = s >= sym_base
            if not mask.any():
                break
            reps = np.where(mask, 2, 1)
            idx = np.cumsum(reps) - reps
            out = np.repeat(s, reps)
            sym = s[mask] - sym_base
            out[idx[mask]] = left[sym]
            out[idx[mask] + 1] = right[sym]
            s = out
        if s.size != n:
            raise ValueError(f"ngram decode length mismatch: {s.size} != {n}")
        return s.astype(np.int32)

    def estimate_size(self, stats: BlockStats) -> int | None:
        # Compression depends on n-gram structure invisible to scalar stats;
        # require a trial encode (chooser gates it on size heuristics).
        return None
