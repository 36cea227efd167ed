"""Two-cluster-size scaling evidence for sequence packing (north rule
N→4N analog): the same pack_examples job at local[2] / local[8] /
local[32] over the same corpus, fresh session per level, min-of-reps.

Usage: python scripts/scale_pack.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rle_array_spark import packing as PK  # noqa: E402
from rle_array_spark.engine import session  # noqa: E402

CORPUS = "/tmp/rle_bench_corpus_b258_r120"


def run_level(cores: int, reps: int) -> float:
    spark = session(
        app=f"scale-pack-{cores}", cores=cores, shuffle_partitions=max(cores * 2, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        seq = spark.read.parquet(CORPUS)

        def job():
            return (
                PK.pack_examples(seq, seq_len=512, n_shards=max(cores * 2, 8))
                .agg(F.count("*"), F.sum("n_pieces"))
                .collect()
            )

        job()  # warm
        best = min(
            (lambda t0: (job(), time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(reps)
        )
        return best
    finally:
        spark.stop()


def main() -> None:
    # 3+ reps: the first timed rep in a fresh session can read ~2x slow
    # (page cache + worker-pool warmup survive the single warm call only
    # partially at low core counts) — min-of-2 recorded a false 0.38
    # efficiency once; min-of-3 is stable (BASELINE.md round 5)
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        raise SystemExit(f"bench corpus missing at {CORPUS}; run bench.py first")
    import pyarrow.parquet as pq

    ntok = sum(
        pq.read_table(os.path.join(CORPUS, f), columns=["n_tok"])["n_tok"]
        .to_pandas()
        .sum()
        for f in os.listdir(CORPUS)
        if f.endswith(".parquet")
    )
    thr = {}
    for cores in (2, 8, 32):
        wall = run_level(cores, reps)
        thr[cores] = ntok / wall
        print(f"local[{cores}]: {wall:6.2f}s = {thr[cores]/1e6:6.1f} Mtok/s")
    e28 = thr[8] / thr[2] / 4
    e832 = thr[32] / thr[8] / 4
    print(f"scaling efficiency 2->8 (N->4N): {e28:.3f}")
    print(f"scaling efficiency 8->32: {e832:.3f}")


if __name__ == "__main__":
    main()
