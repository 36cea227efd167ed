"""Interleaved A/B: relational vs kernel sequence packing (packing.py).

Both variants live in the same tree, so the pairwise protocol runs them
alternately inside one session (adjacent in time — the only layout this
VM's 1.4-1.7x drift can't fake). The consumer is an aggregate over every
packed token (forces full assembly, returns one row).

Usage: python scripts/ab_pack.py [pairs] [n_shards]
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


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = session(app="ab-pack", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        raise SystemExit(f"bench corpus missing at {CORPUS}; run bench.py first")
    seq = spark.read.parquet(CORPUS)
    ntok = seq.agg(F.sum("n_tok")).collect()[0][0]

    def consume(packed):
        row = packed.agg(
            F.count("*").alias("n"),
            F.sum(F.expr("aggregate(tokens, 0L, (a, x) -> a + x)")).alias("s"),
            F.sum("n_pieces").alias("p"),
        ).collect()[0]
        return (row["n"], row["s"], row["p"])

    def run(fn):
        t0 = time.perf_counter()
        sig = consume(fn(seq, seq_len=PK.PACK_SEQ_LEN, n_shards=n_shards))
        return time.perf_counter() - t0, sig

    # warm both paths (worker spawn, code paths, page cache)
    run(PK.pack_examples_kernel)
    run(PK.pack_examples)
    print(f"corpus {ntok/1e6:.1f} Mtok, n_shards={n_shards}, L={PK.PACK_SEQ_LEN}")
    ratios = []
    for i in range(pairs):
        tk, sk = run(PK.pack_examples_kernel)
        tr, sr = run(PK.pack_examples)
        assert sk == sr, (sk, sr)
        ratios.append(tr / tk)
        print(
            f"pair {i}: kernel {tk:6.2f}s ({ntok/tk/1e6:6.1f} Mtok/s)"
            f"  relational {tr:6.2f}s ({ntok/tr/1e6:6.1f} Mtok/s)"
            f"  ratio {tr/tk:.2f}x  [examples={sk[0]}]"
        )
    ratios.sort()
    print(f"median relational/kernel ratio: {ratios[len(ratios)//2]:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
