"""Codec kernel unit tests: round-trip + size properties, no Spark.

Mirrors the reference's kernel test strategy
(/root/reference/tests/test_algorithms.py): hand-written shape tables
(empty, singleton, all-equal, alternating, boundary values) plus
differential/property tests with deterministic randomness.
"""

from __future__ import annotations

import numpy as np
import pytest

from rle_array_spark.chooser import choose_codec
from rle_array_spark.codecs import CODECS, compute_stats, decode_block, encode_block
from rle_array_spark.codecs.bitpack import bit_width, pack_bits, unpack_bits
from rle_array_spark.codecs.rle import reference_rle_nbytes, split_runs

MAX_TOKEN = np.iinfo(np.int32).max

# Reference-derived micro-fixtures (FIXTURES.md §5) + adversarial shapes.
EDGE_ARRAYS = {
    "empty": np.array([], dtype=np.int32),
    "single": np.array([7], dtype=np.int32),
    "all_equal": np.full(1000, 42, dtype=np.int32),
    "alternating": np.tile(np.array([0, 1], dtype=np.int32), 500),
    "ref_case": np.array([13, 13, 42, 42, 42, 13], dtype=np.int32),  # test_algorithms.py:99-105
    "zero_and_max": np.array([0, MAX_TOKEN, 0, MAX_TOKEN, MAX_TOKEN], dtype=np.int32),
    "narrow_range": np.arange(1000, 1256, dtype=np.int32),
    "long_runs": np.repeat(np.array([5, 9, 5, 0], dtype=np.int32), [1000, 1, 2000, 57]),
    "two_values": np.array([3] * 100 + [8] * 100, dtype=np.int32),
    "increasing": np.arange(5000, dtype=np.int32),
    "repeated_ngrams": np.tile(np.array([10, 20, 30, 40], dtype=np.int32), 200),
}


def _random_arrays():
    rng = np.random.default_rng(42)
    out = {}
    out["uniform_full"] = rng.integers(0, 65536, size=3000).astype(np.int32)
    out["lowcard"] = rng.integers(0, 17, size=3000).astype(np.int32)
    out["zipf"] = np.minimum(rng.zipf(1.3, size=3000), 65535).astype(np.int32)
    out["runs_random"] = np.repeat(
        rng.integers(0, 100, size=50).astype(np.int32), rng.integers(1, 200, size=50)
    )
    return out


ALL_ARRAYS = {**EDGE_ARRAYS, **_random_arrays()}


@pytest.mark.parametrize("width", [0, 1, 3, 7, 8, 13, 17, 31, 32, 40])
def test_bitpack_roundtrip(width):
    rng = np.random.default_rng(width)
    hi = 1 if width == 0 else (1 << width)
    vals = rng.integers(0, hi, size=257, dtype=np.uint64)
    buf = pack_bits(vals, width)
    assert len(buf) == (257 * width + 7) // 8
    out = unpack_bits(buf, 257, width)
    np.testing.assert_array_equal(out, vals)


def test_bit_width():
    assert bit_width(0) == 0
    assert bit_width(1) == 1
    assert bit_width(255) == 8
    assert bit_width(256) == 9
    with pytest.raises(ValueError):
        bit_width(-1)


def test_split_runs_reference_case():
    # compress([13,13,42,42,42,13]) → values [13,42,13], ends [2,5,6]
    values, lengths = split_runs(EDGE_ARRAYS["ref_case"])
    np.testing.assert_array_equal(values, [13, 42, 13])
    np.testing.assert_array_equal(np.cumsum(lengths), [2, 5, 6])


@pytest.mark.parametrize("name", list(ALL_ARRAYS))
@pytest.mark.parametrize("codec", list(CODECS))
def test_roundtrip_bit_identical(codec, name):
    arr = ALL_ARRAYS[name]
    payload = encode_block(arr, codec)
    out = decode_block(payload, codec, arr.size)
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, arr)


@pytest.mark.parametrize("name", list(ALL_ARRAYS))
def test_auto_choice_roundtrip_and_threshold(name):
    arr = ALL_ARRAYS[name]
    codec, payload = choose_codec(arr)
    out = decode_block(payload, codec, arr.size)
    np.testing.assert_array_equal(out, arr)
    if codec != "raw":
        assert len(payload) <= arr.size * 4  # threshold guard


def test_auto_never_worse_than_reference_formula():
    # north_rule: total compressed size <= reference's r*(4+8) per array.
    total_ours, total_ref = 0, 0
    for arr in ALL_ARRAYS.values():
        if arr.size == 0:
            continue
        _, payload = choose_codec(arr)
        stats = compute_stats(arr)
        total_ours += len(payload)
        total_ref += min(reference_rle_nbytes(stats.n_runs), stats.raw_bytes)
    assert total_ours <= total_ref


class TestCodecWins:
    """Golden per-regime winners (FIXTURES.md §1 table; mirrors
    tests/test_autoconversion.py:83-130 construction style)."""

    def test_rle_wins_on_long_runs(self):
        codec, _ = choose_codec(EDGE_ARRAYS["long_runs"])
        assert codec == "rle"

    def test_narrow_range_prefers_for(self):
        arr = np.random.default_rng(1).integers(1000, 1256, size=4000).astype(np.int32)
        codec, payload = choose_codec(arr)
        assert codec in ("for", "dict")
        assert len(payload) <= arr.size + 100  # ~8 bits/token

    def test_lowcard_compresses_hard(self):
        arr = np.random.default_rng(2).integers(0, 5, size=4000).astype(np.int32)
        codec, payload = choose_codec(arr)
        assert codec in ("dict", "for", "bitpack")
        assert len(payload) < arr.size * 4 / 8

    def test_random_full_range_stays_raw_at_tight_threshold(self):
        arr = (
            np.random.default_rng(3)
            .integers(0, 2**31 - 1, size=4000)
            .astype(np.int32)
        )
        # bitpack at 31 bits still shaves 3% off raw; a 0.9 threshold demands
        # a real win and must fall back to raw (the reference's `rain` case).
        codec, _ = choose_codec(arr, threshold=0.9, enable_ngram=False)
        assert codec == "raw"

    def test_ngram_wins_on_repeated_motifs(self):
        motif = np.array([101, 202, 303, 404, 505, 606, 707, 808], dtype=np.int32)
        rng = np.random.default_rng(4)
        parts = []
        for _ in range(100):
            parts.append(motif)
            parts.append(rng.integers(0, 60000, size=3).astype(np.int32))
        arr = np.concatenate(parts)
        ngram_size = len(encode_block(arr, "ngram"))
        for other in ("rle", "dict", "for", "bitpack", "raw"):
            assert ngram_size < len(encode_block(arr, other))


def test_decode_wrong_length_raises():
    arr = EDGE_ARRAYS["long_runs"]
    payload = encode_block(arr, "rle")
    with pytest.raises(ValueError):
        decode_block(payload, "rle", arr.size + 1)


def test_negative_tokens_rejected():
    with pytest.raises(ValueError):
        encode_block(np.array([-1, 2], dtype=np.int32), "rle")


def test_stats():
    s = compute_stats(EDGE_ARRAYS["ref_case"])
    assert (s.n, s.n_runs, s.cardinality, s.vmin, s.vmax) == (6, 3, 2, 13, 42)
    e = compute_stats(EDGE_ARRAYS["empty"])
    assert (e.n, e.n_runs, e.cardinality) == (0, 0, 0)


def test_lazy_chooser_matches_eager_trials():
    """choose_codec defers encoding exact-model trials (FOR/BITPACK always,
    DICT when cardinality was exact) — selection AND payload bytes must be
    identical to encoding every trial eagerly, across every corpus regime
    and at a tight threshold (the raw-guard interacts with deferral)."""
    from rle_array_spark.chooser import (
        AUTO_CANDIDATES,
        NGRAM_CARD_RATIO_FASTPASS,
        NGRAM_CARD_RATIO_SKIP,
        NGRAM_MIN_REPEAT_FRACTION,
        NGRAM_MIN_TOKENS,
        NGRAM_PROJECTION_MARGIN,
        NGRAM_SAMPLE_TOKENS,
        NGRAM_SKIP_IF_RATIO_BELOW,
        RUNNER_UP_SLACK,
    )
    from rle_array_spark.codecs import compute_stats
    from rle_array_spark.codecs.ngram import NgramCodec

    def eager(values, threshold):
        stats = compute_stats(values)
        raw_bytes = stats.raw_bytes
        if stats.n == 0:
            return "raw", CODECS["raw"].encode(values)
        ests = [(CODECS[n].estimate_size(stats), n) for n in AUTO_CANDIDATES]
        best_est = min(ests)
        runner = min(e for e in ests if e[1] != best_est[1])
        trial = [best_est[1]]
        if runner[0] <= RUNNER_UP_SLACK * max(best_est[0], 1):
            trial.append(runner[1])
        name_, payload_, size_ = "raw", None, raw_bytes
        for n in trial:
            p = (CODECS["dict"].encode(values, table=stats.uniq)
                 if n == "dict" else CODECS[n].encode(values))
            if len(p) < size_:
                name_, payload_, size_ = n, p, len(p)
        card_ratio = stats.cardinality / stats.n
        if (card_ratio < NGRAM_CARD_RATIO_SKIP and stats.n >= NGRAM_MIN_TOKENS
                and size_ > NGRAM_SKIP_IF_RATIO_BELOW * raw_bytes):
            if stats.n > NGRAM_SAMPLE_TOKENS:
                sample = values[:NGRAM_SAMPLE_TOKENS]
                proj = len(CODECS["ngram"].encode(sample)) / (sample.size * 4) * raw_bytes
                worth = proj < NGRAM_PROJECTION_MARGIN * size_
            elif card_ratio < NGRAM_CARD_RATIO_FASTPASS:
                worth = True
            else:
                worth = NgramCodec.repeat_fraction(values) >= NGRAM_MIN_REPEAT_FRACTION
            if worth:
                p = CODECS["ngram"].encode(values)
                if len(p) < size_:
                    name_, payload_, size_ = "ngram", p, len(p)
        if payload_ is None or size_ > threshold * raw_bytes:
            return "raw", CODECS["raw"].encode(values)
        return name_, payload_

    rng = np.random.default_rng(13)
    cases = list(EDGE_ARRAYS.values())
    from rle_array_spark import datagen

    batch = datagen.generate_block(0, 25, include_edges=True)
    tok = batch.column("tokens")
    cases += [np.asarray(tok[i].values, dtype=np.int32) for i in range(batch.num_rows)]
    for _ in range(60):
        n = int(rng.integers(0, 3000))
        cases.append(rng.integers(0, int(rng.integers(2, 70000)), size=n).astype(np.int32))
    for ms in (8, 256):
        motif = rng.integers(0, 60000, size=ms)
        v = np.tile(motif, 3000 // ms + 1)[:3000].astype(np.int32)
        m = rng.random(3000) < 0.2
        v[m] = rng.integers(0, 60000, size=m.sum())
        cases.append(v)
    for thr in (1.0, 0.5):
        for v in cases:
            a = eager(v.copy(), thr)
            b = choose_codec(v.copy(), threshold=thr)
            assert a[0] == b[0] and a[1] == b[1], (thr, v.size, a[0], b[0])


def test_ngram_encode_batch_byte_identical():
    """Fused batch grammar build must produce byte-identical payloads to
    the solo encoder for every regime, any grouping (subsets reshuffle the
    shared-mult groups), including near-INT32_MAX values (the int64 fused
    key capacity edge) and empty/single rows."""
    import random

    from rle_array_spark import datagen

    ng = CODECS["ngram"]
    rng = np.random.default_rng(3)
    cases = [
        np.array([], dtype=np.int32),
        np.array([7], dtype=np.int32),
        np.full(1000, 3, dtype=np.int32),
        np.tile(np.array([0, 1], dtype=np.int32), 500),
        rng.integers(0, 5, size=3000).astype(np.int32),
        np.array([2**31 - 1] * 100, dtype=np.int32),
        np.tile(np.array([2**31 - 1, 2**31 - 2], dtype=np.int32), 300),
    ]
    batch = datagen.generate_block(0, 30, include_edges=True)
    tok = batch.column("tokens")
    cases += [np.asarray(tok[i].values, dtype=np.int32) for i in range(batch.num_rows)]
    for ms in (4, 64, 256):
        motif = rng.integers(0, 60000, size=ms)
        v = np.tile(motif, 3000 // ms + 1)[:3000].astype(np.int32)
        m = rng.random(3000) < 0.2
        v[m] = rng.integers(0, 60000, size=m.sum())
        cases.append(v)
    solo = [ng.encode(v.copy()) for v in cases]
    fused = ng.encode_batch([v.copy() for v in cases])
    assert solo == fused
    for trial in range(3):
        random.seed(trial)
        sub = random.sample(range(len(cases)), k=len(cases) // 2)
        f = ng.encode_batch([cases[i].copy() for i in sub])
        assert all(f[j] == solo[i] for j, i in enumerate(sub))


def test_repeat_fraction_batch_matches_solo():
    from rle_array_spark.codecs.ngram import NgramCodec

    rng = np.random.default_rng(5)
    cases = [np.array([], dtype=np.int32), np.array([4], dtype=np.int32)]
    for _ in range(80):
        n = int(rng.integers(2, 6000))
        cases.append(
            rng.integers(0, int(rng.integers(2, 70000)), size=n).astype(np.int32)
        )
    solo = [NgramCodec.repeat_fraction(v) for v in cases]
    batch = NgramCodec.repeat_fraction_batch(cases)
    assert solo == batch


def test_choose_codec_batch_matches_solo():
    """The engine kernel's batch chooser must return identical (name,
    payload) per row as choose_codec — incl. the sample-projection upgrade
    path (rows > NGRAM_SAMPLE_TOKENS) and tight-threshold raw fallbacks."""
    from rle_array_spark import datagen
    from rle_array_spark.chooser import choose_codec_batch

    rng = np.random.default_rng(13)
    batch = datagen.generate_block(0, 25, include_edges=True)
    tok = batch.column("tokens")
    cases = [np.asarray(tok[i].values, dtype=np.int32) for i in range(batch.num_rows)]
    for _ in range(40):
        n = int(rng.integers(0, 3000))
        cases.append(
            rng.integers(0, int(rng.integers(2, 70000)), size=n).astype(np.int32)
        )
    for ms in (8, 256):  # > sample-window rows exercise projection+upgrade
        motif = rng.integers(0, 60000, size=ms)
        v = np.tile(motif, 12000 // ms + 1)[:12000].astype(np.int32)
        m = rng.random(12000) < 0.15
        v[m] = rng.integers(0, 60000, size=m.sum())
        cases.append(v)
    for thr in (1.0, 0.5):
        solo = [choose_codec(v.copy(), threshold=thr) for v in cases]
        bat = choose_codec_batch([v.copy() for v in cases], threshold=thr)
        assert solo == bat
