"""Stage-level wall profile of the dedup_survivors pipeline at sf0.1.

Times each materialization boundary separately (count() actions over the
same persisted inputs the gated query uses) so the heavy gate cell's cost
is attributable: prepared-docs scan, shingle_sets (md5 per shingle),
minhash_signatures (128 universal hashes per shingle), lsh_bands +
candidate self-join, Jaccard verify, full survivors. Run AFTER the test
suite; contended runs are meaningless on this box.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rle_array_spark import pipeline as P
from rle_array_spark.engine import session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(label, fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    print(f"{label:40s} {best:8.3f} s   ({out})")
    return best


def main():
    spark = session(app="profile_dedup", shuffle_partitions=32)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.count()  # warm page cache + workers

    d = P._docs_prepared(docs).persist()
    timed("prepared docs (scan+persist)", lambda: d.count(), reps=1)

    sh = P.shingle_sets(docs).persist()
    timed("shingle_sets (md5/shingle) materialize", lambda: sh.count(), reps=1)
    timed("shingle_sets re-count (persisted)", lambda: sh.count())

    sig = P.minhash_signatures(docs, shingles=sh)
    timed("minhash_signatures (128 perms)", lambda: sig.count())

    bands = P.lsh_bands(docs, shingles=sh)
    timed("lsh_bands (16 band md5s)", lambda: bands.count())

    pairs = P.minhash_candidate_pairs(docs, shingles=sh)
    timed("candidate self-join", lambda: pairs.count())

    near = P.near_dup_pairs_jaccard(docs)  # re-derives+persists its own shingles
    timed("near_dup_pairs_jaccard (fresh)", lambda: near.count(), reps=1)

    t0 = time.time()
    n = P.dedup_survivors(docs).count()
    print(f"{'dedup_survivors end-to-end (fresh)':40s} {time.time()-t0:8.3f} s   ({n})")

    spark.stop()


if __name__ == "__main__":
    main()
