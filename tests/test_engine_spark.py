"""Spark-level engine tests: differential round-trip vs the uncompressed
input (the reference's dominant pattern, tests/test_operators.py /
tests/test_reduce.py:91-112), per-codec forced encodes, stats kernels,
and the no-decode audit path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rle_array_spark.engine import (
    decode_df,
    decode_stats_df,
    encode_df,
    salted_repartition,
    tokens_stats_df,
    verify_roundtrip,
)
from rle_array_spark.tokenize import tokenize_documents


@pytest.mark.parametrize("codec", ["rle", "dict", "bitpack", "for", "ngram", "raw", "auto"])
def test_roundtrip_bit_identical_per_codec(sequences, codec):
    blocks = encode_df(sequences, codec=codec)
    assert verify_roundtrip(sequences, blocks) == 0


def test_roundtrip_documents_tokens(documents, sequences):
    seq = tokenize_documents(documents)
    blocks = encode_df(seq, codec="auto")
    assert verify_roundtrip(seq, blocks) == 0


def test_decode_preserves_row_count_and_schema(sequences):
    blocks = encode_df(sequences, codec="auto")
    decoded = decode_df(blocks)
    assert decoded.count() == sequences.count()
    assert dict(decoded.dtypes)["tokens"] == "array<int>"


def test_auto_beats_reference_size(sequences):
    """north_rule: total compressed size <= the reference's analytic
    r×(4+8) bytes (capped at raw, since the reference auto-conversion
    keeps raw when RLE loses)."""
    blocks = encode_df(sequences, codec="auto")
    row = blocks.agg(
        F.sum("encoded_bytes").alias("ours"),
        F.sum(F.least("ref_rle_bytes", "raw_bytes")).alias("ref"),
    ).collect()[0]
    assert row["ours"] <= row["ref"]


def test_compressed_domain_audit_equals_decode(sequences):
    """tok_sum metadata (computed at encode time from the compressed domain)
    must equal the decoded-domain sum — the engine's cheap audit path."""
    blocks = encode_df(sequences, codec="auto").cache()
    meta = blocks.agg(F.sum("tok_sum").alias("s"), F.sum("n_values").alias("n")).collect()[0]
    dec = (
        decode_stats_df(blocks)
        .agg(F.sum("tok_sum").alias("s"), F.sum("n_tok").alias("n"))
        .collect()[0]
    )
    assert (meta["s"], meta["n"]) == (dec["s"], dec["n"])
    blocks.unpersist()


def test_stats_differential_encoded_vs_plain(sequences):
    """decode_stats_df(encode(df)) ≡ tokens_stats_df(df) row by row."""
    blocks = encode_df(sequences, codec="auto")
    a = decode_stats_df(blocks)
    b = tokens_stats_df(sequences)
    cols = ["n_tok", "tok_sum", "tok_min", "tok_max", "tok_wsum", "n_runs", "card"]
    joined = a.alias("a").join(b.alias("b"), "doc_id", "inner")
    n = sequences.count()
    assert joined.count() == n
    cond = None
    for c in cols:
        eq = F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
        cond = eq if cond is None else (cond & eq)
    assert joined.filter(cond).count() == n


def test_salted_repartition_spreads_giants(spark):
    """Without the salt, every `giant` row hashes to one (source, bucket)
    partition; with it they must spread. A single row is the minimum unit —
    splitting one giant sequence across blocks is a chunking feature, not a
    partitioning one — so the assertion is on giant-row placement."""
    rows = [(f"giant-{i:04d}", [1, 2, 3], 200_000 + i, "giant") for i in range(32)]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    reparted = salted_repartition(df, 8)
    pids = {
        r["pid"]
        for r in reparted.withColumn("pid", F.spark_partition_id())
        .select("pid")
        .distinct()
        .collect()
    }
    assert len(pids) >= 4


def test_forced_codec_column(sequences):
    blocks = encode_df(sequences, codec="rle")
    assert blocks.select("codec").distinct().collect() == [("rle",)]


def test_empty_input(spark):
    empty = spark.createDataFrame(
        [], "doc_id string, tokens array<int>, n_tok int, source string"
    )
    blocks = encode_df(empty, codec="auto")
    assert blocks.count() == 0
    assert decode_df(blocks).count() == 0


def test_per_block_bound_invariant(sequences):
    """r5 gate arm for compression_accounting: EVERY block (not just the
    total) must satisfy encoded_bytes <= min(ref_rle_bytes, raw_bytes) —
    the self-certifying invariant the oracle checks as bound_violations=0
    (reference autoconversion.py:93-99 threshold-vs-raw semantics)."""
    blocks = encode_df(sequences, codec="auto")
    viol = blocks.agg(
        F.sum(
            (F.col("encoded_bytes") > F.least("ref_rle_bytes", "raw_bytes"))
            .cast("long")
        ).alias("v")
    ).collect()[0]["v"]
    assert viol == 0
