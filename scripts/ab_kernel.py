"""Interleaved A/B of the encode kernel between two checkouts.

The ONLY timing protocol that survives this VM's drift (cells measured
minutes apart vary 1.4-1.7x uniformly): alternate the two variants in
adjacent fresh processes, several pairs, min-of-reps inside each process,
and compare PAIRWISE. Used for every perf claim in BASELINE.md round 3.

Usage:
    # compare working tree against a ref (creates a temp worktree):
    python scripts/ab_kernel.py d71a4dd
    # or against an existing checkout dir:
    python scripts/ab_kernel.py /path/to/other/checkout
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
import numpy as np, pyarrow.parquet as pq, pyarrow.compute as pc
from rle_array_spark.engine import _encode_column
t = pq.read_table(sys.argv[3])
batches = t.to_batches(max_chunksize=4000)[:6]
cols = []
for b in batches:
    col = b.column(b.schema.get_field_index('tokens'))
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.int32)
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(lens)))
    cols.append((flat, offs))
ntok = sum(f.size for f, _ in cols)
for f, o in cols:
    _encode_column(f, o, "auto", 1.0)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    for f, o in cols:
        _encode_column(f, o, "auto", 1.0)
    best = min(best, time.perf_counter() - t0)
print(f"{sys.argv[2]}: {best:.3f}s {ntok/best/1e6:.1f} Mtok/s")
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
        wt = tempfile.mkdtemp(prefix="ab_kernel_")
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
