"""Wall-time the CPU-heavy pipeline gate cells at sf0.1 and report the
partition count their kernel stage actually runs at — hunting more
single-scan-partition serialization of the shingle_sets kind (fixed r5).

Run AFTER the suite; contended runs are meaningless on this box.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rle_array_spark.engine import session
from rle_array_spark import queries as Q

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CELLS = [
    "dedup_simhash",
    "signlsh_knn_top1",
    "ivf_knn_top1",
    "cosine_pairs_lsh",
    "lang_id",
    "quality_scores",
    "doc_fingerprints",
    "token_counts",
]


def main() -> None:
    spark = session(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    reg = Q.build_queries()
    # warm the session / scan cache once
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    for name in CELLS:
        fn = reg[name]
        best = None
        for _ in range(3):
            t0 = time.monotonic()
            n = fn(spark, SF_DIR).count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:28s} min {best:7.3f} s  rows={n}")
    spark.stop()


if __name__ == "__main__":
    main()
