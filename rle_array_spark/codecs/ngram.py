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
    return positions[_greedy_mask(positions)]


def _greedy_mask(positions: np.ndarray) -> np.ndarray:
    """Boolean-mask form of :func:`_greedy_nonoverlapping` over the same
    sorted positions (identical kept set; the fused batch encoder needs
    the mask to select parallel symbol arrays)."""
    if positions.size == 0:
        return np.zeros(0, dtype=bool)
    chain_start = np.empty(positions.size, dtype=bool)
    chain_start[0] = True
    np.greater(positions[1:] - positions[:-1], 1, out=chain_start[1:])
    chain_id = np.cumsum(chain_start) - 1
    starts = positions[chain_start]
    return (positions - starts[chain_id]) % 2 == 0


def _encode_fused(vs: list[np.ndarray], vmaxes: list[int]) -> list[bytes]:
    """One fused grammar build over a group of non-empty rows; see
    NgramCodec.encode_batch. Every selection / tie-break / stop decision
    replicates the solo loop in ``NgramCodec.encode`` exactly."""
    g = len(vs)
    mult = max(vmaxes) + MAX_SYMS + 1
    big_m = mult * mult
    sym_bases = np.array([m + 1 for m in vmaxes], dtype=np.int64)
    s = np.concatenate([v.astype(np.int64) for v in vs])
    row_of = np.repeat(
        np.arange(g, dtype=np.int64), np.array([v.size for v in vs], dtype=np.int64)
    )
    n_syms = np.zeros(g, dtype=np.int64)
    active = np.ones(g, dtype=bool)
    rounds: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []  # (row, left, right)

    for _ in range(MAX_ROUNDS):
        active &= n_syms < MAX_SYMS  # solo: break when table is full
        if not active.any() or s.size < 2:
            break
        valid = row_of[:-1] == row_of[1:]
        valid &= active[row_of[:-1]]
        pos = np.flatnonzero(valid)
        if pos.size == 0:
            break
        fk = row_of[pos] * big_m + s[pos] * mult + s[pos + 1]
        uniq, counts = np.unique(fk, return_counts=True)
        eligible = counts >= MIN_PAIR_COUNT
        rows_with_digrams = np.unique(row_of[pos])
        if not eligible.any():
            break  # every active row would have break-ed (no table growth)
        cand = np.flatnonzero(eligible)
        cr = (uniq[cand] // big_m).astype(np.int64)
        cc = counts[cand]
        # Rows with digrams but no eligible pair stop WITHOUT table growth.
        active[rows_with_digrams[~np.isin(rows_with_digrams, cr)]] = False
        # Per-row top-budget selection by (count desc, key desc) — the solo
        # stable-argsort-reversed tie-break. cand is ascending in fused key
        # == (row, key) lexicographic, so -cand orders key-desc within row.
        sel_order = np.lexsort((-cand, -cc, cr))
        sr_sorted = cr[sel_order]
        row_change = np.empty(sr_sorted.size, dtype=bool)
        row_change[0] = True
        np.not_equal(sr_sorted[1:], sr_sorted[:-1], out=row_change[1:])
        seg_start = np.flatnonzero(row_change)
        seg_id = np.cumsum(row_change) - 1
        rank_in_row = np.arange(sr_sorted.size) - seg_start[seg_id]
        budget = np.minimum(PAIRS_PER_ROUND, MAX_SYMS - n_syms[sr_sorted])
        sel = sel_order[rank_in_row < budget]
        selu = np.sort(cand[sel])  # (row, key) ascending — solo sym order
        sk = uniq[selu]
        sel_rows = (sk // big_m).astype(np.int64)
        local = sk % big_m
        left = local // mult
        right = local % mult
        # Fresh symbol ids: sym_base_row + prior table size + rank-by-key.
        rchange = np.empty(sel_rows.size, dtype=bool)
        rchange[0] = True
        np.not_equal(sel_rows[1:], sel_rows[:-1], out=rchange[1:])
        rstart = np.flatnonzero(rchange)
        rid = np.cumsum(rchange) - 1
        rank = np.arange(sel_rows.size) - rstart[rid]
        sym = sym_bases[sel_rows] + n_syms[sel_rows] + rank
        rounds.append((sel_rows, left, right))
        rows_u, row_cnt = sel_rows[rstart], np.diff(np.append(rstart, sel_rows.size))
        n_syms[rows_u] += row_cnt
        # Matches: fused keys present in the selected set.
        pis = np.searchsorted(sk, fk)
        np.clip(pis, 0, sk.size - 1, out=pis)
        is_match = sk[pis] == fk
        mpos = pos[is_match]
        kept_mask = _greedy_mask(mpos)  # chains never span rows (see solo)
        kept = mpos[kept_mask]
        # Rows that selected symbols but kept no match stop (solo breaks
        # AFTER appending table entries).
        kept_rows = np.unique(row_of[kept]) if kept.size else np.zeros(0, np.int64)
        active[rows_u[~np.isin(rows_u, kept_rows)]] = False
        if kept.size == 0:
            continue  # table may still have grown; other rows proceed
        s[kept] = sym[pis[is_match]][kept_mask]
        drop = np.zeros(s.size, dtype=bool)
        drop[kept + 1] = True
        keep = ~drop
        s = s[keep]
        row_of = row_of[keep]

    # Assemble per-row payloads (identical packing to the solo path).
    if rounds:
        all_rows = np.concatenate([r for r, _, _ in rounds])
        all_left = np.concatenate([le for _, le, _ in rounds])
        all_right = np.concatenate([ri for _, _, ri in rounds])
        by_row = np.argsort(all_rows, kind="stable")  # keeps round order
        all_rows, all_left, all_right = (
            all_rows[by_row], all_left[by_row], all_right[by_row]
        )
        trow_off = np.searchsorted(all_rows, np.arange(g + 1))
    else:
        all_left = all_right = np.zeros(0, dtype=np.int64)
        trow_off = np.zeros(g + 1, dtype=np.int64)
    srow_off = np.searchsorted(row_of, np.arange(g + 1))
    out: list[bytes] = []
    for r in range(g):
        ns = int(n_syms[r])
        s_r = s[srow_off[r] : srow_off[r + 1]]
        table = np.empty(2 * ns, dtype=np.int64)
        if ns:
            table[0::2] = all_left[trow_off[r] : trow_off[r + 1]]
            table[1::2] = all_right[trow_off[r] : trow_off[r + 1]]
        sym_base = int(sym_bases[r])
        twidth = bit_width(sym_base + ns - 1) if ns else 0
        swidth = bit_width(int(s_r.max())) if s_r.size else 0
        header = struct.pack(_HEADER, ns, sym_base, s_r.size, twidth, swidth)
        out.append(header + pack_bits(table, twidth) + pack_bits(s_r, swidth))
    return out


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

    @staticmethod
    def repeat_fraction_batch(
        rows: list[np.ndarray], sample_pairs: int = 2048
    ) -> list[float]:
        """Fused form of :meth:`repeat_fraction`: ONE np.unique over every
        row's digram keys (row-prefixed, same shared-mult argument as
        encode_batch) instead of one per row. Bit-identical fractions —
        integer counts divide by the same n."""
        fracs = [0.0] * len(rows)
        work: list[tuple[int, np.ndarray]] = []
        vmaxes: list[int] = []
        for i, values in enumerate(rows):
            n = min(values.size, sample_pairs + 1)
            if n < 2:
                continue
            v = values[:n]
            work.append((i, v))
            vmaxes.append(int(v.max()))
        if not work:
            return fracs
        order = sorted(range(len(work)), key=lambda j: vmaxes[j])
        g_start = 0
        while g_start < len(order):
            g_end = g_start + 1
            while g_end < len(order):
                mult = vmaxes[order[g_end]] + MAX_SYMS + 2
                if (g_end - g_start + 1) * mult * mult >= 2**63:
                    break
                g_end += 1
            group = order[g_start:g_end]
            mult = vmaxes[group[-1]] + MAX_SYMS + 2
            big_m = mult * mult
            keys = []
            for gi, j in enumerate(group):
                v = work[j][1].astype(np.int64)
                keys.append(gi * big_m + v[:-1] * mult + v[1:])
            fk = np.concatenate(keys)
            uniq, counts = np.unique(fk, return_counts=True)
            elig = counts >= MIN_PAIR_COUNT
            if elig.any():
                gr = (uniq[elig] // big_m).astype(np.int64)
                per_row = np.bincount(gr, weights=counts[elig], minlength=len(group))
                for gi, j in enumerate(group):
                    i, v = work[j]
                    fracs[i] = float(per_row[gi]) / float(v.size)
            g_start = g_end
        return fracs

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

    def encode_batch(self, rows: list[np.ndarray]) -> list[bytes]:
        """Byte-identical to ``[self.encode(r) for r in rows]`` with the
        grammar rounds FUSED across rows: each round runs ONE np.unique /
        selection / replacement pass over the concatenation of every
        still-active row's stream instead of ~20 numpy calls per row per
        round — the per-call overhead that dominates encode cost on small
        blocks (measured 0.32 ms/row at ~660 tokens). Fused keys are
        ``row_group * mult² + left * mult + right`` with a shared ``mult``
        (any mult larger than every component preserves each row's key
        ORDER and (left,right) extraction, so selections are unchanged);
        rows are greedily grouped so the fused key fits int64 even for
        near-2³¹ token values. Per-row grammar state (symbol budget, stop
        conditions, sym_base) is tracked per row; a row that would have
        ``break``-ed solo is masked out of later rounds. Equality with the
        solo path is pinned by tests/test_codecs.py differentials."""
        payloads: list[bytes | None] = [None] * len(rows)
        nonempty: list[int] = []
        checked: list[np.ndarray] = []
        vmaxes: list[int] = []
        for i, r in enumerate(rows):
            v = check_tokens(r)
            if v.size == 0:
                payloads[i] = struct.pack(_HEADER, 0, 0, 0, 0, 0)
            else:
                nonempty.append(i)
                checked.append(v)
                vmaxes.append(int(v.max()))
        if not nonempty:
            return payloads  # type: ignore[return-value]
        # Group rows (vmax-ascending) so group_size * mult² stays in int64.
        order = sorted(range(len(nonempty)), key=lambda j: vmaxes[j])
        g_start = 0
        while g_start < len(order):
            g_end = g_start + 1
            while g_end < len(order):
                mult = vmaxes[order[g_end]] + MAX_SYMS + 1
                if (g_end - g_start + 1) * mult * mult >= 2**63:
                    break
                g_end += 1
            group = order[g_start:g_end]
            outs = _encode_fused(
                [checked[j] for j in group], [vmaxes[j] for j in group]
            )
            for j, p in zip(group, outs):
                payloads[nonempty[j]] = p
            g_start = g_end
        return payloads  # type: ignore[return-value]

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


_GROUP_BASE = np.int64(1) << 32  # above any int32 terminal, so fused ids disambiguate


def decode_group(payloads: list, ns) -> np.ndarray:
    """Fused multi-row NGRAM decode — the decode-side analog of the fused
    batch encoder above. Each row's symbol ids are remapped into ONE global
    namespace (symbol k of row r → _GROUP_BASE + table_offset_r + k;
    terminals are int32 so they stay below _GROUP_BASE), the remapped
    streams are concatenated, and a single vectorized expansion loop runs
    for the whole group: iterations = max grammar depth over the group,
    each one numpy-call-bounded over the fused stream, instead of a full
    expansion loop per row (the r3 decode profile: per-row NGRAM ran at
    ~7.5 Mtok/s and held 50% of batch decode time with 8% of the tokens).
    Expansion is order-preserving, so row r's tokens occupy
    out[sum(ns[:r]) : sum(ns[:r+1])] of the returned flat array.
    Bit-identical to per-row decode (tests/test_vdecode.py differential).
    """
    ns = np.asarray(ns, dtype=np.int64)
    streams: list[np.ndarray] = []
    tables: list[np.ndarray] = []
    table_off = 0
    for payload, n in zip(payloads, ns.tolist()):
        if n == 0:
            continue
        buf = memoryview(payload)
        n_syms, sym_base, n_stream, twidth, swidth = struct.unpack_from(_HEADER, buf, 0)
        off = _HEADER_SIZE
        tbytes = packed_nbytes(2 * n_syms, twidth)
        s = unpack_bits(buf[off + tbytes :], n_stream, swidth).astype(np.int64)
        if n_syms:
            table = unpack_bits(buf[off : off + tbytes], 2 * n_syms, twidth).astype(
                np.int64
            )
            shift = _GROUP_BASE + table_off - sym_base
            tables.append(np.where(table >= sym_base, table + shift, table))
            s = np.where(s >= sym_base, s + shift, s)
            table_off += n_syms
        streams.append(s)
    total = int(ns.sum())
    if not streams:
        return np.zeros(0, dtype=np.int32)
    s = np.concatenate(streams)
    if not tables:  # every row symbol-free: streams are already terminals
        if s.size != total:
            raise ValueError(
                f"ngram group decode length mismatch: {s.size} != {total}"
            )
        return s.astype(np.int32)
    # Expand the grammar TABLE first: the expansion loop runs over
    # table-sized arrays (2 ints per symbol, << stream size) for
    # max-depth iterations; the stream then expands in ONE
    # segment-gather pass. Measured vs looping over the stream itself:
    # the stream loop re-walked the full (growing) stream per depth
    # level — ~100 ms vs ~40 ms per bench batch rep.
    defs = np.concatenate(tables)  # [l0, r0, l1, r1, ...] in global order
    n_total_syms = defs.size // 2
    left = defs[0::2].copy()
    right = defs[1::2].copy()
    seg = np.repeat(np.arange(n_total_syms, dtype=np.int64), 2)
    while True:
        mask = defs >= _GROUP_BASE
        if not mask.any():
            break
        reps = np.where(mask, 2, 1)
        idx = np.cumsum(reps) - reps
        nd = np.repeat(defs, reps)
        seg = np.repeat(seg, reps)
        sym = defs[mask] - _GROUP_BASE
        nd[idx[mask]] = left[sym]
        nd[idx[mask] + 1] = right[sym]
        defs = nd
    # defs is now every symbol's full terminal expansion, contiguous per
    # symbol in id order (np.repeat preserves order)
    exp_len = np.bincount(seg, minlength=n_total_syms)
    exp_off = np.cumsum(exp_len) - exp_len
    term = s < _GROUP_BASE
    sym_ids = s[~term] - _GROUP_BASE
    lens_out = np.ones(s.size, dtype=np.int64)
    lens_out[~term] = exp_len[sym_ids]
    out_off = np.cumsum(lens_out) - lens_out
    produced = int(out_off[-1] + lens_out[-1]) if s.size else 0
    if produced != total:
        raise ValueError(f"ngram group decode length mismatch: {produced} != {total}")
    out = np.empty(total, dtype=np.int64)
    out[out_off[term]] = s[term]
    li = lens_out[~term]
    if li.size:
        dst = np.repeat(out_off[~term], li) + _grouped_arange(li)
        src = np.repeat(exp_off[sym_ids], li) + _grouped_arange(li)
        out[dst] = defs[src]
    return out.astype(np.int32)


def _grouped_arange(counts: np.ndarray) -> np.ndarray:
    """concatenate(arange(c) for c in counts), vectorized (same idiom as
    vdecode._grouped_arange — duplicated here to avoid a circular import:
    vdecode imports the codec registry which imports this module)."""
    counts = counts.astype(np.int64, copy=False)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(counts)
    return np.arange(total, dtype=np.int64) - np.repeat(ends - counts, counts)
