"""Randomized soak of the packing kernel's carry-state machinery.

Drives codecs-free `packing._pack_kernel` directly with synthetic Arrow
batches — random doc counts/lengths (including empty-ish and giant
multi-example docs), random shard interleavings, and RANDOM BATCH
FRAGMENTATION (the cross-batch tail/starts carry is where state bugs
live) — and compares every emitted example and piece count against a
naive per-shard Python packer. No Spark session: thousands of corpus
shapes per minute.

Usage: python scripts/soak_pack.py [seconds]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rle_array_spark.packing import _pack_kernel  # noqa: E402


def naive_pack(docs_by_shard: dict[int, list[np.ndarray]], L: int):
    """Reference: concat each shard's stream, chunk into L, count overlaps."""
    out = []
    for sh in sorted(docs_by_shard):
        docs = [d for d in docs_by_shard[sh] if len(d)]
        if not docs:
            continue
        stream = np.concatenate(docs)
        starts = np.cumsum([0] + [len(d) for d in docs[:-1]])
        ends = starts + np.asarray([len(d) for d in docs])
        for ex in range(len(stream) // L):
            a, b = ex * L, (ex + 1) * L
            pieces = int(np.sum((starts < b) & (ends > a)))
            out.append((sh, ex, pieces, tuple(stream[a:b].tolist())))
    return sorted(out)


def one_iter(rng: np.random.Generator) -> int:
    L = int(rng.choice([8, 16, 64, 256, 512]))
    n_shards = int(rng.integers(1, 9))
    n_docs = int(rng.integers(1, 120))
    docs_by_shard: dict[int, list[np.ndarray]] = {}
    rows = []  # (shard, tokens) in shard-sorted order
    shards_order = np.sort(rng.integers(0, n_shards, size=n_docs))
    for sh in shards_order:
        kind = rng.random()
        if kind < 0.1:
            n = int(rng.integers(3 * L, 8 * L))  # giant: multi-example span
        elif kind < 0.25:
            n = int(rng.integers(1, 3))  # minnow
        else:
            n = int(rng.integers(1, 2 * L))
        t = rng.integers(0, 10_000, size=n).astype(np.int32)
        docs_by_shard.setdefault(int(sh), []).append(t)
        rows.append((int(sh), t))
    # random fragmentation into RecordBatches (1..n_docs rows per batch)
    batches = []
    i = 0
    while i < len(rows):
        j = min(len(rows), i + int(rng.integers(1, 7)))
        chunk = rows[i:j]
        shard_arr = pa.array([r[0] for r in chunk], type=pa.int32())
        flat = np.concatenate([r[1] for r in chunk]) if chunk else np.empty(0, np.int32)
        offs = np.concatenate(([0], np.cumsum([len(r[1]) for r in chunk])))
        toks = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()), pa.array(flat, type=pa.int32())
        )
        batches.append(
            pa.RecordBatch.from_arrays([shard_arr, toks], names=["shard", "tokens"])
        )
        i = j
    got = []
    for rb in _pack_kernel(L)(iter(batches)):
        sh = rb.column("shard").to_numpy(zero_copy_only=False)
        ex = rb.column("example_id").to_numpy(zero_copy_only=False)
        np_ = rb.column("n_pieces").to_numpy(zero_copy_only=False)
        toks = rb.column("tokens").to_pylist()
        got.extend(
            (int(s), int(e), int(p), tuple(t))
            for s, e, p, t in zip(sh, ex, np_, toks)
        )
    exp = naive_pack(docs_by_shard, L)
    assert sorted(got) == exp, (
        f"MISMATCH L={L} shards={n_shards} docs={n_docs}: "
        f"{len(got)} vs {len(exp)} examples"
    )
    return len(exp)


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 120
    rng = np.random.default_rng(0xC0FFEE)
    t0 = time.perf_counter()
    iters = examples = 0
    while time.perf_counter() - t0 < seconds:
        examples += one_iter(rng)
        iters += 1
        if iters % 500 == 0:
            print(f"{iters} corpora, {examples} examples, "
                  f"{time.perf_counter() - t0:.0f}s")
    print(
        f"SOAK PASS: {iters} randomized corpora / {examples} verified "
        f"examples in {time.perf_counter() - t0:.0f}s, 0 mismatches"
    )


if __name__ == "__main__":
    main()
