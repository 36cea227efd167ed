"""Skew soak: pathological giant-sequence corpus through the chunked +
salted encode path at real volume (not CI — run manually; results recorded
in BASELINE.md).

Corpus: a handful of giant documents (tens of millions of tokens each, the
'one sequence pins one executor' nightmare) mixed with ordinary rows.
Checks, in one run:
  1. bit-identical round trip through chunk → salt → encode → decode →
     reassemble;
  2. partition token-mass balance after the salted repartition (max/median
     bounded — the whole point of splitting before the shuffle);
  3. throughput of the worst-case path.

Usage: python scripts/soak_giant.py [giant_tokens_M] [n_giants] [chunk_tokens]

Balance scales with chunks-per-partition: when giants dominate the corpus,
pick chunk_tokens so each heavy source yields >= ~4 chunks per partition
(balls-into-bins: k chunks into P partitions has max load ~k/P + O(sqrt(k/P
log P)), so relative imbalance shrinks as k/P grows). The default 1 Mi-token
chunks are the Arrow-batch-size bound; drop to 256 Ki when giant mass is a
large fraction of the corpus.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rle_array_spark.engine import (  # noqa: E402
    decode_df,
    encode_df,
    session,
    verify_roundtrip,
)

PARTITIONS = 64


def build_corpus(spark, giant_tokens: int, n_giants: int):
    """Deterministic corpus: n_giants huge docs + 2000 ordinary docs."""
    import pyarrow as pa

    def gen(iterator):
        for batch in iterator:
            for bid in batch.column("id").to_pylist():
                rng = np.random.default_rng((77, int(bid)))
                if bid < n_giants:
                    n = giant_tokens
                    toks = rng.integers(0, 256, n).astype(np.int32)  # low-card giant
                    rows = [(f"giant-{bid}", toks, n, "giant")]
                else:
                    rows = []
                    for j in range(40):
                        n = int(rng.integers(64, 4096))
                        rows.append(
                            (f"doc-{bid}-{j}", rng.integers(0, 65536, n).astype(np.int32), n, "web")
                        )
                doc_ids = [r[0] for r in rows]
                lens = np.array([r[2] for r in rows], dtype=np.int64)
                flat = np.concatenate([r[1] for r in rows])
                offsets = np.concatenate(([0], np.cumsum(lens)))
                tokens = pa.LargeListArray.from_arrays(
                    pa.array(offsets), pa.array(flat, type=pa.int32())
                ).cast(pa.list_(pa.int32()))
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(doc_ids),
                        tokens,
                        pa.array(lens.astype(np.int32)),
                        pa.array([r[3] for r in rows]),
                    ],
                    names=["doc_id", "tokens", "n_tok", "source"],
                )

    return spark.range(n_giants + 50).repartition(32).mapInArrow(
        gen, "doc_id string, tokens array<int>, n_tok int, source string"
    )


def main() -> None:
    giant_m = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_giants = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    chunk_tokens = int(sys.argv[3]) if len(sys.argv) > 3 else 1 << 20
    # Heap sized like a real cluster would for giant-row ingest: each
    # concurrent scan task over a giant needs ~3x its raw bytes transiently
    # (vector growth + Arrow transfer); below 16g nothing changes.
    # 4 B/token raw x ~6 (3x transient, doubled for concurrency headroom)
    heap_gb = 16 + (n_giants * giant_m * 4 * 6) // 1000
    spark = session(
        app="soak-giant", cores=32, shuffle_partitions=PARTITIONS,
        driver_memory=f"{heap_gb}g",
    )
    spark.sparkContext.setLogLevel("ERROR")
    import pyspark.sql.functions as F

    corpus_path = f"/tmp/soak_giant_{giant_m}M_{n_giants}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        build_corpus(spark, giant_m * 1_000_000, n_giants).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    df = spark.read.parquet(corpus_path)
    total = df.agg(F.sum("n_tok")).collect()[0][0]
    print(f"corpus: {df.count()} rows, {total / 1e6:.1f} M tokens "
          f"({n_giants} giants x {giant_m} M), chunk={chunk_tokens}")

    t0 = time.monotonic()
    blocks = encode_df(
        df, codec="auto", num_partitions=PARTITIONS, chunk_tokens=chunk_tokens
    ).cache()
    enc = blocks.agg(
        F.sum("n_values").alias("toks"),
        F.sum("encoded_bytes").alias("enc"),
        F.sum("raw_bytes").alias("raw"),
    ).collect()[0]
    wall = time.monotonic() - t0
    print(f"encode (chunked+salted): {wall:.1f} s = {enc['toks'] / wall / 1e6:.1f} M tok/s, "
          f"ratio {enc['raw'] / enc['enc']:.3f}")

    # partition balance: token mass per shuffle partition
    bal = (
        blocks.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.sum(F.col("n_values").cast("long")).alias("toks"))
        .collect()
    )
    masses = sorted(r["toks"] for r in bal)
    import statistics

    med = statistics.median(masses)
    ideal = sum(masses) / len(masses)
    print(f"partition balance: {len(masses)} partitions, "
          f"max/ideal = {masses[-1] / ideal:.2f}, max/median = {masses[-1] / med:.2f} "
          f"(min {masses[0] / 1e6:.2f} M, med {med / 1e6:.2f} M, max {masses[-1] / 1e6:.2f} M)")

    # giant spread: how many partitions hold chunks of giant-0
    spread = (
        blocks.withColumn("pid", F.spark_partition_id())
        .filter(F.col("doc_id") == "giant-0")
        .select("pid").distinct().count()
    )
    print(f"giant-0 chunks spread over {spread} partitions")

    t0 = time.monotonic()
    bad = verify_roundtrip(df, blocks, reassemble_chunks=True)
    print(f"roundtrip: {bad} mismatches ({time.monotonic() - t0:.1f} s verify)")
    blocks.unpersist()
    spark.stop()
    assert bad == 0, "ROUND TRIP FAILED"
    print("SOAK PASS")


if __name__ == "__main__":
    main()
