"""Deterministic codepoint tokenizer: documents(text) → sequences(tokens).

Turns the driver-provided `documents` table into the engine's input shape
(doc_id:string, tokens:array<int32>, n_tok:int32, source:string). The token
id of each character is its Unicode codepoint, which makes the tokenization
expressible in ANSI SQL for the DuckDB oracle
(`list_transform(string_split(text, ''), c -> unicode(c))`) — the driver's
correctness gate can therefore check the full encode→decode round trip
against a tokenizer-equivalent oracle that never sees the codecs.

Vectorized: one utf-32 encode per Arrow batch (C-level), no per-character
Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEQUENCES_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def _tokenize_kernel(batches):
    import pyarrow.compute as pc

    for batch in batches:
        if not batch.num_rows:
            continue
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # Whole-batch transcode, zero per-row Python: char counts from
        # pc.utf8_length (C), then ONE utf-8 decode + utf-32 encode over the
        # batch's concatenated value buffer. Rows are contiguous in the
        # buffer, so per-row codepoint slices follow from the char counts.
        # utf8 carries int32 offsets, large_utf8 (e.g. with
        # spark.sql.execution.arrow.useLargeVarTypes=true) int64 — reading
        # the wrong width would silently misparse, so dispatch on the type.
        if pa.types.is_large_string(col.type):
            off_dt, off_w = np.int64, 8
        elif pa.types.is_string(col.type):
            off_dt, off_w = np.int32, 4
        else:
            raise TypeError(f"tokenize kernel expects utf8 text, got {col.type}")
        lengths = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        byte_offs = np.frombuffer(
            col.buffers()[1], dtype=off_dt, count=len(col) + 1, offset=off_w * col.offset
        )
        seg = memoryview(col.buffers()[2])[byte_offs[0] : byte_offs[-1]]
        flat = np.frombuffer(
            str(seg, "utf-8").encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int32)
        offsets = np.concatenate(([0], np.cumsum(lengths)))
        tokens = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), pa.array(flat, type=pa.int32())
        )
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("doc_id"),
                tokens,
                pa.array(lengths.astype(np.int32)),
                batch.column("source"),
            ],
            names=["doc_id", "tokens", "n_tok", "source"],
        )


def tokenize_documents(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, source, ...) → sequences DataFrame.

    Empty texts are filtered (mirrored in oracle SQL: DuckDB's
    string_split('', '') yields [''] not [], so both sides drop them).
    """
    prepared = documents.filter(F.length("text") > 0).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "text",
        F.col("source").cast("string").alias("source"),
    )
    return prepared.mapInArrow(_tokenize_kernel, SEQUENCES_SCHEMA)


# The oracle-side equivalent, parameterized over the docs table/view name.
ORACLE_TOKENIZE_CTE = """
tok AS (
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           source,
           list_transform(string_split(text, ''), c -> unicode(c)) AS tokens
    FROM documents
    WHERE length(text) > 0
)
"""
