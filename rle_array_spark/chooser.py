"""Cost-based codec auto-selection.

Generalizes the reference's measured-ratio threshold rule
(``auto_convert_to_rle``: keep compressed iff compressed_nbytes /
raw_nbytes <= threshold, /root/reference/rle_array/autoconversion.py:40-103)
into a three-stage chooser:

1. analytic size model per codec from per-block stats (run count → RLE,
   cardinality → DICT, value range → BITPACK/FOR) ranks candidates for free;
2. the top candidate is trial-encoded (plus the runner-up when the estimates
   are within 10% — the models are near-exact except RLE's run-length width
   guess), and NGRAM — which has no analytic model — is trial-encoded on a
   bounded sample window and kept only if its projected full-size beats the
   measured best (keeps grammar building off the hot path for blocks where
   it cannot win);
3. threshold-vs-raw guard: if the winner does not beat ``threshold × raw``,
   keep RAW (the reference's `rain` column case, README.rst:85).
"""

from __future__ import annotations

import numpy as np

from rle_array_spark.codecs import CODECS, compute_stats
from rle_array_spark.codecs.core import BlockStats

# Codecs with analytic size models, eligible for auto-selection.
AUTO_CANDIDATES = ("rle", "dict", "for", "bitpack")
NGRAM_MIN_TOKENS = 64
# Skip the NGRAM trial when the best analytic candidate already compresses
# below this ratio — grammar coding cannot meaningfully improve on it.
NGRAM_SKIP_IF_RATIO_BELOW = 0.15
NGRAM_SAMPLE_TOKENS = 8192
# Minimum fraction of adjacent-pair occurrences that round 1 could replace
# for the grammar build to be worth trying on small blocks.
NGRAM_MIN_REPEAT_FRACTION = 0.30
# distinct/total above which the digram gate is skipped entirely (cannot
# pass), and below which it is assumed to pass (always does) — measured
# separations on the mixed corpus, see choose_codec.
NGRAM_CARD_RATIO_SKIP = 0.55
NGRAM_CARD_RATIO_FASTPASS = 0.05
# Sampled projection must beat the measured best by this margin to pay for
# the full grammar encode.
NGRAM_PROJECTION_MARGIN = 0.9
RUNNER_UP_SLACK = 1.10
DEFAULT_THRESHOLD = 1.0


def choose_codec(
    values: np.ndarray,
    stats: BlockStats | None = None,
    threshold: float = DEFAULT_THRESHOLD,
    enable_ngram: bool = True,
) -> tuple[str, bytes]:
    """Pick the smallest codec for one token array; returns (name, payload)."""
    if stats is None:
        stats = compute_stats(values)
    raw_bytes = stats.raw_bytes
    if stats.n == 0:
        return "raw", CODECS["raw"].encode(values)

    estimates = {name: CODECS[name].estimate_size(stats) for name in AUTO_CANDIDATES}
    best_est = min((sz, name) for name, sz in estimates.items())
    runner_up = min((sz, name) for name, sz in estimates.items() if name != best_est[1])
    trial_names = [best_est[1]]
    if runner_up[0] <= RUNNER_UP_SLACK * max(best_est[0], 1):
        trial_names.append(runner_up[1])

    # Lazy trials: FOR/BITPACK size models are exact by construction, and
    # DICT's is exact whenever the cardinality was exact (stats.uniq
    # present) — measured 0 deviations across every corpus regime
    # (tests/test_codecs.py chooser differential). For those, the estimate
    # IS the measurement, so only the winner is ever encoded; RLE's
    # run-width guess still pays for a real trial. Selection (and payload
    # bytes) are identical to encoding every trial eagerly.
    best_name, best_payload = "raw", None
    best_size = raw_bytes
    for name in trial_names:
        exact = name in ("for", "bitpack") or (name == "dict" and stats.uniq is not None)
        if exact:
            size, payload = estimates[name], None
        else:
            payload = (
                CODECS["dict"].encode(values, table=stats.uniq)
                if name == "dict"
                else CODECS[name].encode(values)
            )
            size = len(payload)
        if size < best_size:
            best_name, best_payload, best_size = name, payload, size

    # Free pre-gate from already-computed stats: a digram repeating >=
    # MIN_PAIR_COUNT times needs its constituent tokens to repeat, so high
    # distinct/total rules the grammar out before any digram counting.
    # Measured on the mixed-regime corpus: 0/932 blocks with
    # cardinality/n >= 0.55 pass the repeat-fraction gate, 377/377 with
    # < 0.05 pass it — only the middle band pays for the digram scan.
    card_ratio = stats.cardinality / stats.n
    if (
        enable_ngram
        and card_ratio < NGRAM_CARD_RATIO_SKIP
        and stats.n >= NGRAM_MIN_TOKENS
        and best_size > NGRAM_SKIP_IF_RATIO_BELOW * raw_bytes
    ):
        if stats.n > NGRAM_SAMPLE_TOKENS:
            sample = values[: NGRAM_SAMPLE_TOKENS]
            sample_payload = CODECS["ngram"].encode(sample)
            projected = len(sample_payload) / (sample.size * 4) * raw_bytes
            worth_it = projected < NGRAM_PROJECTION_MARGIN * best_size
        elif card_ratio < NGRAM_CARD_RATIO_FASTPASS:
            worth_it = True
        else:
            # Round-1 digram repetition bounds the whole grammar's gain at
            # ~1/MAX_ROUNDS of a full build; skip blocks it cannot help.
            from rle_array_spark.codecs.ngram import NgramCodec

            worth_it = NgramCodec.repeat_fraction(values) >= NGRAM_MIN_REPEAT_FRACTION
        if worth_it:
            payload = CODECS["ngram"].encode(values)
            if len(payload) < best_size:
                best_name, best_payload, best_size = "ngram", payload, len(payload)

    # Threshold-vs-raw guard (autoconversion.py:93-99 semantics).
    if best_name == "raw" or best_size > threshold * raw_bytes:
        return "raw", CODECS["raw"].encode(values)
    if best_payload is None:  # deferred exact-model winner: encode it now
        best_payload = (
            CODECS["dict"].encode(values, table=stats.uniq)
            if best_name == "dict"
            else CODECS[best_name].encode(values)
        )
    return best_name, best_payload


def choose_codec_batch(
    rows: list[np.ndarray],
    stats_list: list[BlockStats | None] | None = None,
    threshold: float = DEFAULT_THRESHOLD,
    enable_ngram: bool = True,
    runs_fn=None,
) -> list[tuple[str, bytes]]:
    """Batch form of :func:`choose_codec` — identical (name, payload) per
    row (pinned by tests/test_codecs.py differential), with every NGRAM
    trial in the batch fused into one grammar build
    (NgramCodec.encode_batch): the per-row numpy call overhead that
    dominated trial cost on small blocks is paid once per ROUND per batch.
    Three phases: (1) per-row lazy analytic trials + the sample/full gate
    decisions, (2) one fused encode over all sample windows and
    gate-passing full rows, (3) projection upgrades from the sample rows
    get a second fused encode, then winners finalize."""
    from rle_array_spark.codecs.ngram import NgramCodec

    n = len(rows)
    if stats_list is None:
        stats_list = [None] * n
    state: list[tuple[str, bytes | None, int, BlockStats] | None] = [None] * n
    out: list[tuple[str, bytes] | None] = [None] * n
    full_idx: list[int] = []
    sample_idx: list[int] = []
    rf_idx: list[int] = []

    for i, values in enumerate(rows):
        stats = stats_list[i]
        if stats is None:
            stats = compute_stats(values)
        raw_bytes = stats.raw_bytes
        if stats.n == 0:
            out[i] = ("raw", CODECS["raw"].encode(values))
            continue
        estimates = {nm: CODECS[nm].estimate_size(stats) for nm in AUTO_CANDIDATES}
        best_est = min((sz, nm) for nm, sz in estimates.items())
        runner_up = min((sz, nm) for nm, sz in estimates.items() if nm != best_est[1])
        trial_names = [best_est[1]]
        if runner_up[0] <= RUNNER_UP_SLACK * max(best_est[0], 1):
            trial_names.append(runner_up[1])
        best_name, best_payload = "raw", None
        best_size = raw_bytes
        for nm in trial_names:
            exact = nm in ("for", "bitpack") or (nm == "dict" and stats.uniq is not None)
            if exact:
                size, payload = estimates[nm], None
            else:
                if nm == "rle" and runs_fn is not None:
                    # Batch-precomputed canonical runs (engine change mask,
                    # ``runs_fn(i)``): identical bytes to RleCodec.encode's
                    # own split_runs, minus the per-row O(n) change re-scan.
                    # Same negative-token rejection (a negative value is a
                    # negative run value).
                    from rle_array_spark.codecs.core import check_tokens
                    from rle_array_spark.codecs.rle import encode_runs

                    rv, rl = runs_fn(i)
                    payload = encode_runs(check_tokens(rv), rl)
                elif nm == "dict":
                    payload = CODECS["dict"].encode(values, table=stats.uniq)
                else:
                    payload = CODECS[nm].encode(values)
                size = len(payload)
            if size < best_size:
                best_name, best_payload, best_size = nm, payload, size
        state[i] = (best_name, best_payload, best_size, stats)
        card_ratio = stats.cardinality / stats.n
        if (
            enable_ngram
            and card_ratio < NGRAM_CARD_RATIO_SKIP
            and stats.n >= NGRAM_MIN_TOKENS
            and best_size > NGRAM_SKIP_IF_RATIO_BELOW * raw_bytes
        ):
            if stats.n > NGRAM_SAMPLE_TOKENS:
                sample_idx.append(i)
            elif card_ratio < NGRAM_CARD_RATIO_FASTPASS:
                full_idx.append(i)
            else:
                rf_idx.append(i)

    # Fused repeat-fraction gate for the mid-cardinality band.
    if rf_idx:
        fracs = NgramCodec.repeat_fraction_batch([rows[i] for i in rf_idx])
        full_idx.extend(
            i for i, rf in zip(rf_idx, fracs) if rf >= NGRAM_MIN_REPEAT_FRACTION
        )
        full_idx.sort()

    # Fused ngram pass: sample windows first (their projections can demand
    # full encodes), full-gate rows alongside.
    ngram = CODECS["ngram"]
    batch1 = [rows[i][:NGRAM_SAMPLE_TOKENS] for i in sample_idx] + [
        rows[i] for i in full_idx
    ]
    payloads1 = ngram.encode_batch(batch1) if batch1 else []
    upgrades: list[int] = []
    for j, i in enumerate(sample_idx):
        best_size = state[i][2]
        sample = batch1[j]
        projected = len(payloads1[j]) / (sample.size * 4) * state[i][3].raw_bytes
        if projected < NGRAM_PROJECTION_MARGIN * best_size:
            upgrades.append(i)
    payloads2 = (
        ngram.encode_batch([rows[i] for i in upgrades]) if upgrades else []
    )
    ngram_payloads = dict(zip(full_idx, payloads1[len(sample_idx):]))
    ngram_payloads.update(zip(upgrades, payloads2))

    for i, values in enumerate(rows):
        if out[i] is not None:
            continue
        best_name, best_payload, best_size, stats = state[i]
        p = ngram_payloads.get(i)
        if p is not None and len(p) < best_size:
            best_name, best_payload, best_size = "ngram", p, len(p)
        if best_name == "raw" or best_size > threshold * stats.raw_bytes:
            out[i] = ("raw", CODECS["raw"].encode(values))
        elif best_payload is None:
            out[i] = (
                best_name,
                CODECS["dict"].encode(values, table=stats.uniq)
                if best_name == "dict"
                else CODECS[best_name].encode(values),
            )
        else:
            out[i] = (best_name, best_payload)
    return out  # type: ignore[return-value]
