"""Interleaved A/B: shingle_sets small-file-count repartition vs the old
single-partition plan, on the full dedup_survivors pipeline at sf0.1.

Variant OLD monkeypatches shingle_sets back to its pre-guard body (same
expression, no repartition) so both variants run in one session,
alternating, on the same warmed input. Also asserts the surviving doc_id
set is identical between variants (placement is row-local; any diff is a
bug)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rle_array_spark import pipeline as P
from rle_array_spark.engine import session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

NEW_SHINGLES = P.shingle_sets


def old_shingle_sets(docs):
    d = P._docs_prepared(docs)
    return d.select(
        "doc_id",
        F.expr(
            f"array_distinct(transform("
            f"sequence(1, least(length(text) - {P.SHINGLE_K} + 1, {P.SHINGLE_CAP})),"
            f" i -> cast(conv(substring(md5(substring(text, i, {P.SHINGLE_K})), 1, 8),"
            f" 16, 10) as bigint)))"
        ).alias("shingles"),
    )


def run(docs, variant):
    P.shingle_sets = NEW_SHINGLES if variant == "new" else old_shingle_sets
    t0 = time.time()
    ids = sorted(r[0] for r in P.dedup_survivors(docs).select("doc_id").collect())
    return time.time() - t0, ids


def main():
    spark = session(app="ab_dedup_parallel", shuffle_partitions=32)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.count()
    # warm both shapes untimed
    run(docs, "old")
    run(docs, "new")
    times = {"old": [], "new": []}
    ref_ids = None
    for i in range(3):
        for v in ("old", "new"):
            dt, ids = run(docs, v)
            if ref_ids is None:
                ref_ids = ids
            assert ids == ref_ids, f"variant {v} rep {i}: survivor set diverged"
            times[v].append(round(dt, 3))
            print(f"pair {i} {v}: {dt:.3f} s")
    print(f"old: {times['old']}  min {min(times['old']):.3f}")
    print(f"new: {times['new']}  min {min(times['new']):.3f}")
    print(f"speedup (min/min): {min(times['old']) / min(times['new']):.3f}x")
    print(f"survivors: {len(ref_ids)} (identical across all reps)")
    spark.stop()


if __name__ == "__main__":
    main()
