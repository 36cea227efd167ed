"""Cost-based codec auto-selection.

Generalizes the reference's measured-ratio threshold rule
(``auto_convert_to_rle``: keep compressed iff compressed_nbytes /
raw_nbytes <= threshold, /root/reference/rle_array/autoconversion.py:40-103)
into a two-stage chooser:

1. analytic size model per codec from per-block stats (run count → RLE,
   cardinality → DICT, value range → BITPACK/FOR) ranks candidates cheaply;
2. the top candidates are trial-encoded and the measured smallest wins —
   preserving the reference's "measure, don't trust the model" semantics;
3. threshold-vs-raw guard: if the winner does not beat ``threshold × raw``,
   keep RAW (the reference's `rain` column case, README.rst:85).
"""

from __future__ import annotations

import numpy as np

from rle_array_spark.codecs import CODECS, compute_stats
from rle_array_spark.codecs.core import BlockStats

# Codecs eligible for auto-selection, cheapest-to-estimate first.
AUTO_CANDIDATES = ("rle", "dict", "for", "bitpack")
# NGRAM has no analytic model; trial it only when the block is big enough to
# amortize grammar building and no candidate already achieves this ratio.
NGRAM_MIN_TOKENS = 64
NGRAM_SKIP_IF_RATIO_BELOW = 0.15
DEFAULT_THRESHOLD = 1.0
TRIAL_TOP_K = 2


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

    estimates = sorted(
        (CODECS[name].estimate_size(stats), name) for name in AUTO_CANDIDATES
    )
    best_name, best_payload = "raw", None
    best_size = raw_bytes
    for _, name in estimates[:TRIAL_TOP_K]:
        payload = CODECS[name].encode(values)
        if len(payload) < best_size:
            best_name, best_payload, best_size = name, payload, len(payload)

    if (
        enable_ngram
        and stats.n >= NGRAM_MIN_TOKENS
        and best_size > NGRAM_SKIP_IF_RATIO_BELOW * raw_bytes
    ):
        payload = CODECS["ngram"].encode(values)
        if len(payload) < best_size:
            best_name, best_payload, best_size = "ngram", payload, len(payload)

    # Threshold-vs-raw guard (autoconversion.py:93-99 semantics).
    if best_payload is None or best_size > threshold * raw_bytes:
        return "raw", CODECS["raw"].encode(values)
    return best_name, best_payload
