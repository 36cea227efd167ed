"""MinHash/LSH operating-point tests at the production parameters
(NUM_HASHES=128, BANDS=16, r=8 — S-curve threshold ≈ 0.71): planted
near-duplicates with known Jaccard must be recalled by the banded LSH,
and the 128 min-slots must behave like independent estimators (the
squared-LCG coefficient fix; an affine-in-j stream correlates them)."""

from __future__ import annotations

import numpy as np
import pytest

from rle_array_spark import pipeline as P

K = P.SHINGLE_K
RNG = np.random.default_rng(404)
ALPHABET = np.array(list("abcdefghijklmnopqrstuvwxyz "))


def _rand_text(n: int) -> str:
    return "".join(RNG.choice(ALPHABET, n))


def _mutate(text: str, n_mut: int) -> str:
    """Mutate n_mut well-separated positions (each kills ~K shingles/side)."""
    chars = list(text)
    pos = np.linspace(10, len(chars) - 10, n_mut).astype(int)
    for p in pos:
        old = chars[p]
        repl = [c for c in "0123456789" if c != old]
        chars[p] = repl[int(RNG.integers(len(repl)))]
    return "".join(chars)


def _shingles(text: str) -> set[str]:
    return {text[i : i + K] for i in range(len(text) - K + 1)}


def _jaccard(a: str, b: str) -> float:
    sa, sb = _shingles(a), _shingles(b)
    return len(sa & sb) / len(sa | sb)


@pytest.fixture(scope="module")
def planted(spark):
    """60 base docs + 40 near-dups at 1..4 mutations (J ~ 0.80-0.97)."""
    rows = []
    pairs = []
    for i in range(60):
        text = _rand_text(220)
        rows.append((f"base-{i:03d}", text, "synthetic"))
        if i < 40:
            dup = _mutate(text, 1 + i % 4)
            rows.append((f"dup-{i:03d}", dup, "synthetic"))
            pairs.append((f"base-{i:03d}", f"dup-{i:03d}", _jaccard(text, dup)))
    docs = spark.createDataFrame(rows, "doc_id string, text string, source string")
    return docs, pairs


def test_planted_pairs_are_in_target_band(planted):
    _, pairs = planted
    js = [j for _, _, j in pairs]
    assert min(js) >= 0.70 and max(js) <= 0.99
    assert sum(j >= 0.8 for j in js) >= 30  # enough high-J pairs to measure recall


def test_lsh_recall_at_production_point(planted):
    """Recall over planted pairs with true J >= 0.8 must be >= 0.9 (the
    analytic expectation at J=0.8, b=16, r=8 is 1-(1-0.8^8)^16 ~ 0.947,
    and ~1.0 above J=0.85)."""
    docs, pairs = planted
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in P.minhash_candidate_pairs(docs).collect()
    }
    target = [(a, b) for a, b, j in pairs if j >= 0.8]
    hit = sum(((a, b) in cand or (b, a) in cand) for a, b in target)
    recall = hit / len(target)
    assert recall >= 0.9, f"recall {recall:.3f} over {len(target)} planted pairs"


def test_signature_estimates_jaccard(planted):
    """Slot-equality fraction estimates true Jaccard: with 128 independent
    slots the standard error at J~0.85 is ~0.032, so |est - J| < 0.15
    for every planted pair is a ~4.7-sigma bound — it fails if the
    coefficient stream correlates the slots."""
    docs, pairs = planted
    sigs = {r["doc_id"]: r["sig"] for r in P.minhash_signatures(docs).collect()}
    assert all(len(s) == P.NUM_HASHES for s in sigs.values())
    assert all(0 <= v < P.MINHASH_PRIME for s in sigs.values() for v in s)
    for a, b, j in pairs:
        est = float(np.mean(np.array(sigs[a]) == np.array(sigs[b])))
        assert abs(est - j) < 0.15, (a, b, j, est)


def test_bands_must_divide_num_hashes(planted):
    docs, _ = planted
    with pytest.raises(ValueError, match="divide"):
        P.lsh_bands(docs, num_hashes=128, bands=12)


def test_coeffs_deterministic_and_distinct():
    c1 = P.minhash_coeffs(128)
    c2 = P.minhash_coeffs(128)
    assert c1 == c2
    assert len({a for a, _ in c1}) > 120  # coefficients don't collapse
    assert all(1 <= a < (1 << 31) and 0 <= b < (1 << 31) for a, b in c1)


def test_multi_mb_doc_bounded_row(spark):
    """r5 scale hardening: a multi-MB document must produce a bounded
    shingle row — <= SHINGLE_CAP int64 base hashes, no string array —
    and still dedup against a near-identical copy within the cap."""
    n = 3_000_000  # ~3 MB text, ~3M shingle positions uncapped
    base = _rand_text(n)
    near = "x" + base[1:]  # differs in one char -> J ~ 1 within the cap
    docs = spark.createDataFrame(
        [("big-a", base, "s"), ("big-b", near, "s")],
        "doc_id string, text string, source string",
    )
    sh = P.shingle_sets(docs)
    field = sh.schema["shingles"].dataType
    assert field.simpleString() == "array<bigint>"
    sizes = {r["doc_id"]: r["n"] for r in sh.selectExpr("doc_id", "size(shingles) as n").collect()}
    assert all(0 < s <= P.SHINGLE_CAP for s in sizes.values()), sizes
    cand = {tuple(sorted((r["doc_a"], r["doc_b"])))
            for r in P.minhash_candidate_pairs(docs).collect()}
    assert ("big-a", "big-b") in cand
