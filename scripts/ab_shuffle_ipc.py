"""A/B: salted-path shuffle transport — per-row packed binary (current)
vs Arrow-IPC blob envelopes (SURVEY §9.4's remaining unmeasured option).

Variant A (current): pack_tokens_df row-binary → salted repartition →
encode kernel. One Tungsten row per (chunked) sequence through the shuffle.

Variant B (IPC blobs): compute the same salted target pid as a column at
scan parallelism, group each input batch's rows by pid inside a mapInArrow
kernel and serialize every group to ONE Arrow IPC stream buffer, shuffle
(pid, blob) rows, then deserialize + encode on the reduce side. Orders of
magnitude fewer shuffle rows; same bytes, same balance at blob granularity.

Interleaved in ONE session (A,B,A,B,...) so VM drift hits both arms alike;
compare within adjacent pairs. Run on an idle machine.

Usage: python scripts/ab_shuffle_ipc.py [corpus_parquet_dir] [num_partitions] [pairs]
(default corpus: the bench corpus — run bench.py once to create it)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYARROW_IGNORE_TIMEZONE", "1")

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rle_array_spark.engine import (
    BLOCK_SCHEMA,
    _encode_batch,
    encode_df,
    pack_tokens_df,
    session,
)

CORPUS = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rle_bench_corpus_b258_r120"
NUM_PARTS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
PAIRS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def encode_salted_ipc(df: DataFrame, num_partitions: int) -> DataFrame:
    """Variant B: same salted key, IPC-blob transport."""
    packed = pack_tokens_df(df)
    length_bucket = F.ceil(F.log2(F.greatest(F.col("n_tok"), F.lit(1)) + 1))
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(num_partitions * 8))
    pid = F.pmod(F.xxhash64("source", length_bucket, salt), F.lit(num_partitions))
    with_pid = packed.withColumn("pid", pid.cast("int"))

    def envelope(batches):
        for batch in batches:
            if not batch.num_rows:
                continue
            tbl = pa.table(batch)
            pids = batch.column("pid").to_numpy(zero_copy_only=False)
            import numpy as np

            order = np.argsort(pids, kind="stable")
            sorted_tbl = tbl.take(pa.array(order))
            sorted_pids = pids[order]
            bounds = np.flatnonzero(
                np.concatenate(([True], sorted_pids[1:] != sorted_pids[:-1]))
            )
            ends = np.append(bounds[1:], sorted_pids.size)
            out_pids, blobs = [], []
            for s, e in zip(bounds.tolist(), ends.tolist()):
                sub = sorted_tbl.slice(s, e - s)
                sink = pa.BufferOutputStream()
                with pa.ipc.new_stream(sink, sub.schema) as w:
                    w.write_table(sub)
                out_pids.append(int(sorted_pids[s]))
                blobs.append(sink.getvalue().to_pybytes())
            yield pa.record_batch(
                {
                    "pid": pa.array(out_pids, pa.int32()),
                    "blob": pa.array(blobs, pa.binary()),
                }
            )

    blobs = with_pid.mapInArrow(envelope, "pid int, blob binary").repartition(
        num_partitions, "pid"
    )

    def unwrap_encode(batches):
        for batch in batches:
            for blob in batch.column("blob"):
                with pa.ipc.open_stream(pa.BufferReader(blob.as_buffer())) as r:
                    tbl = r.read_all()
                for b in tbl.drop_columns(["pid"]).to_batches():
                    if b.num_rows:
                        yield _encode_batch(b, "auto", 1.0)

    return blobs.mapInArrow(unwrap_encode, BLOCK_SCHEMA)


def main() -> None:
    spark = session(app="ab-shuffle-ipc", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(CORPUS)
    ntok = df.agg(F.sum("n_tok")).collect()[0][0]
    print(f"corpus tokens: {ntok}, partitions: {NUM_PARTS}", flush=True)

    def run_a():
        encode_df(df, codec="auto", num_partitions=NUM_PARTS).agg(
            F.sum("encoded_bytes")
        ).collect()

    def run_b():
        encode_salted_ipc(df, NUM_PARTS).agg(F.sum("encoded_bytes")).collect()

    # byte-equality sanity once (same payload totals both transports)
    a0 = encode_df(df, codec="auto", num_partitions=NUM_PARTS).agg(
        F.sum("encoded_bytes")
    ).collect()[0][0]
    b0 = encode_salted_ipc(df, NUM_PARTS).agg(F.sum("encoded_bytes")).collect()[0][0]
    print(f"encoded_bytes A={a0} B={b0} equal={a0 == b0}", flush=True)

    for i in range(PAIRS):
        t0 = time.perf_counter(); run_a(); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); run_b(); tb = time.perf_counter() - t0
        print(
            f"pair {i}: A(row-binary) {ta:.2f}s {ntok/ta/1e6:.1f} Mtok/s | "
            f"B(ipc-blob) {tb:.2f}s {ntok/tb/1e6:.1f} Mtok/s | B/A {tb/ta:.2f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
