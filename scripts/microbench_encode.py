"""Single-core kernel microbenchmark: encode (auto + per-codec) and decode
throughput over a deterministic slice of the bench corpus generator.
No Spark — isolates kernel CPU cost from executor scheduling. Usage:

    python scripts/microbench_encode.py [n_blocks]
"""

from __future__ import annotations

import os
import sys
import time
from collections import Counter

import numpy as np
import pyarrow.compute as pc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rle_array_spark import datagen  # noqa: E402
from rle_array_spark.chooser import choose_codec  # noqa: E402
from rle_array_spark.codecs import CODECS  # noqa: E402


def load_rows(n_blocks: int) -> list[np.ndarray]:
    rows = []
    for b in range(n_blocks):
        batch = datagen.generate_block(b, 120)
        col = batch.column("tokens")
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.int32)
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(lens)))
        rows.extend(flat[offs[i] : offs[i + 1]] for i in range(len(lens)))
    return rows


def main() -> None:
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rows = load_rows(n_blocks)
    total = sum(r.size for r in rows)
    print(f"{len(rows)} rows, {total / 1e6:.1f} M tokens")

    t0 = time.monotonic()
    enc = [choose_codec(r) for r in rows]
    t_enc = time.monotonic() - t0
    enc_bytes = sum(len(p) for _, p in enc)
    print(
        f"encode auto : {t_enc:6.2f}s  {total / t_enc / 1e6:6.1f} M tok/s  "
        f"ratio {total * 4 / enc_bytes:.3f}  {dict(Counter(n for n, _ in enc))}"
    )

    # Batched chooser (the engine kernel's path): ngram trials fused.
    from rle_array_spark.chooser import choose_codec_batch

    t0 = time.monotonic()
    enc_b = []
    for lo in range(0, len(rows), 1024):  # engine-batch-sized groups
        enc_b.extend(choose_codec_batch(rows[lo : lo + 1024]))
    t_b = time.monotonic() - t0
    assert all(a == b for a, b in zip(enc, enc_b))
    print(f"encode batch: {t_b:6.2f}s  {total / t_b / 1e6:6.1f} M tok/s  (same payloads)")

    t0 = time.monotonic()
    enc_rle = [CODECS["rle"].encode(r) for r in rows]
    t_rle = time.monotonic() - t0
    print(
        f"encode rle  : {t_rle:6.2f}s  {total / t_rle / 1e6:6.1f} M tok/s  "
        f"ratio {total * 4 / sum(len(p) for p in enc_rle):.3f}"
    )

    t0 = time.monotonic()
    dec = [CODECS[n].decode(memoryview(p), r.size) for (n, p), r in zip(enc, rows)]
    t_dec = time.monotonic() - t0
    print(f"decode auto : {t_dec:6.2f}s  {total / t_dec / 1e6:6.1f} M tok/s")
    for d, r in zip(dec, rows):
        assert np.array_equal(d, r)
    print("round-trip OK")


if __name__ == "__main__":
    main()
