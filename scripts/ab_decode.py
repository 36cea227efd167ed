"""Interleaved A/B of the DECODE kernel between two checkouts.

Same protocol as ab_kernel.py (the only timing that survives this VM's
1.4-1.7x drift): alternate variants in adjacent fresh processes, 3 pairs,
min-of-reps inside each process, compare WITHIN pairs. Each side encodes
the bench corpus with its OWN encoder (payloads are byte-deterministic
across rounds — compression ratios byte-stable for 3 rounds) and then
times `_decode_rows` over real Arrow block batches, i.e. exactly the
per-batch kernel `decode_df`/`decode_stats_df` run inside mapInArrow.

Usage:
    python scripts/ab_decode.py d71a4dd          # vs a git ref
    python scripts/ab_decode.py /path/checkout   # vs a dir
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = "/tmp/rle_bench_corpus_b258_r120"

_CHILD = r"""
import sys, time
sys.path.insert(0, sys.argv[1])
import numpy as np, pyarrow as pa, pyarrow.parquet as pq, pyarrow.compute as pc
from rle_array_spark.engine import _encode_column, _decode_rows
t = pq.read_table(sys.argv[3])
batches = t.to_batches(max_chunksize=4000)[:6]
blocks = []
ntok = 0
for b in batches:
    col = b.column(b.schema.get_field_index('tokens'))
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.int32)
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(lens)))
    ntok += flat.size
    enc = _encode_column(flat, offs, "auto", 1.0)
    codecs = enc["codec"] if isinstance(enc, dict) else enc[0]
    payloads = enc["payload"] if isinstance(enc, dict) else enc[1]
    n_values = enc["n_values"] if isinstance(enc, dict) else enc[2]
    blocks.append(pa.record_batch({
        "codec": pa.array(list(codecs), pa.string()),
        "payload": pa.array(list(payloads), pa.binary()),
        "n_values": pa.array(np.asarray(n_values, dtype=np.int32), pa.int32()),
    }))
for blk in blocks:
    _decode_rows(blk)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    for blk in blocks:
        _decode_rows(blk)
    best = min(best, time.perf_counter() - t0)
print(f"{sys.argv[2]}: decode {best:.3f}s {ntok/best/1e6:.1f} Mtok/s", flush=True)
"""


def run(path: str, label: str) -> None:
    subprocess.run(
        [sys.executable, "-c", _CHILD, path, label, CORPUS],
        check=True,
        env={**os.environ, "PYTHONPATH": ""},
    )


def main() -> None:
    if len(sys.argv) != 2:
        sys.exit(__doc__)
    other = sys.argv[1]
    if not os.path.exists(CORPUS):
        sys.exit(f"bench corpus missing at {CORPUS} — run bench.py once first")
    cleanup = None
    if not os.path.isdir(other):
        wt = tempfile.mkdtemp(prefix="ab_decode_")
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--force", wt, other],
            check=True,
            capture_output=True,
        )
        cleanup, other = wt, wt
    try:
        for _ in range(3):  # pairs — compare WITHIN each pair
            run(other, "base")
            run(REPO, "work")
    finally:
        if cleanup:
            subprocess.run(
                ["git", "-C", REPO, "worktree", "remove", "--force", cleanup],
                capture_output=True,
            )


if __name__ == "__main__":
    main()
