"""Structured Streaming encode: continuously encode arriving sequence files.

The batch engine's kernels are stateless ``mapInArrow`` transforms, so the
same ``encode_df`` plan runs unchanged under ``readStream`` — Spark's
streaming checkpoint (WAL + file-source log) provides exactly-once
per-micro-batch delivery, complementing the batch writer's per-partition
commit log (tableio.py). The reference has no streaming story (SURVEY §2.d);
this is the Spark-native continuous-ingest path for a training-data
pipeline: new pre-tokenized shards land in a directory / table and encoded
blocks append downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rle_array_spark.chooser import DEFAULT_THRESHOLD
from rle_array_spark.engine import encode_df
from rle_array_spark.tokenize import SEQUENCES_SCHEMA


def read_sequence_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(SEQUENCES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(input_dir)


def encode_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    codec: str = "auto",
    threshold: float = DEFAULT_THRESHOLD,
    available_now: bool = True,
):
    """Start (and by default drain) a streaming encode job.

    ``available_now=True`` processes everything currently in ``input_dir``
    and stops — the test/drain mode; ``False`` leaves a continuous query
    running. Restarting with the same checkpoint_dir resumes exactly-once
    after the last committed micro-batch.
    """
    stream = read_sequence_stream(spark, input_dir)
    blocks = encode_df(stream, codec=codec, threshold=threshold)
    writer = (
        blocks.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
        return query
    return writer.trigger(processingTime="10 seconds").start()
