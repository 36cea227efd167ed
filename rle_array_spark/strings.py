"""String-column encode/decode over Spark DataFrames.

Extends the typed family (typed.py) to variable-width utf8 — the
reference's object/str dtype with None
(/root/reference/rle_array/dtype.py:11-27) — as ``array<string>`` columns
in the same (doc_id, source, vals) shape. Same scale posture: one
mapInArrow kernel at scan parallelism, no shuffle, self-contained payloads,
zone-map metadata (cardinality, null_count, min/max value) per block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

from rle_array_spark.codecs.strings import (
    decode_strings,
    encode_string_block_stats,
)

STRING_BLOCKS_SCHEMA = (
    "doc_id string, source string, codec string, payload binary, "
    "n_values int, n_runs int, null_count int, card int, "
    "val_min string, val_max string, raw_bytes long, encoded_bytes long"
)


def encode_strings_df(df: DataFrame, col: str = "vals", codec: str = "auto") -> DataFrame:
    """(doc_id, source, <col> array<string>) → string encoded blocks."""

    def kernel(batches):
        for batch in batches:
            if not batch.num_rows:
                continue
            lists = batch.column(col)
            if isinstance(lists, pa.ChunkedArray):
                lists = lists.combine_chunks()
            offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            child = lists.flatten()
            n_rows = batch.num_rows
            names_out: list[str] = []
            payloads: list[bytes] = []
            n_values = np.empty(n_rows, dtype=np.int32)
            n_runs = np.empty(n_rows, dtype=np.int32)
            null_count = np.zeros(n_rows, dtype=np.int32)
            card = np.zeros(n_rows, dtype=np.int32)
            vmin: list[str | None] = []
            vmax: list[str | None] = []
            raw_bytes = np.empty(n_rows, dtype=np.int64)
            enc_bytes = np.empty(n_rows, dtype=np.int64)
            import pyarrow.compute as pc

            base = offsets[0]
            for i in range(n_rows):
                lo, hi = int(offsets[i] - base), int(offsets[i + 1] - base)
                row = child.slice(lo, hi - lo)
                name, payload, r, k, nulls = encode_string_block_stats(row, codec)
                names_out.append(name)
                payloads.append(payload)
                n_values[i] = hi - lo
                n_runs[i] = r
                null_count[i] = nulls
                card[i] = k
                valid_vals = row.drop_null()
                if len(valid_vals):
                    vmin.append(pc.min(valid_vals).as_py())
                    vmax.append(pc.max(valid_vals).as_py())
                else:
                    vmin.append(None)
                    vmax.append(None)
                raw_bytes[i] = int(
                    pc.sum(pc.binary_length(valid_vals.cast(pa.binary()))).as_py() or 0
                ) + 4 * (hi - lo)
                enc_bytes[i] = len(payload)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    batch.column("source"),
                    pa.array(names_out, type=pa.string()),
                    pa.array(payloads, type=pa.binary()),
                    pa.array(n_values),
                    pa.array(n_runs),
                    pa.array(null_count),
                    pa.array(card),
                    pa.array(vmin, type=pa.string()),
                    pa.array(vmax, type=pa.string()),
                    pa.array(raw_bytes),
                    pa.array(enc_bytes),
                ],
                names=[
                    "doc_id", "source", "codec", "payload", "n_values", "n_runs",
                    "null_count", "card", "val_min", "val_max", "raw_bytes",
                    "encoded_bytes",
                ],
            )

    return df.select("doc_id", "source", col).mapInArrow(kernel, STRING_BLOCKS_SCHEMA)


def decode_strings_df(blocks: DataFrame) -> DataFrame:
    """String blocks → (doc_id, source, vals array<string>) with element
    nulls restored; values identical to the encoded input."""

    def kernel(batches):
        for batch in batches:
            if not batch.num_rows:
                continue
            codecs_col = batch.column("codec").to_pylist()
            n_col = batch.column("n_values").to_numpy(zero_copy_only=False).astype(np.int64)
            payload_col = batch.column("payload")
            parts: list[np.ndarray] = []
            any_null = False
            masks: list[np.ndarray | None] = []
            for i in range(batch.num_rows):
                vals, valid = decode_strings(
                    codecs_col[i],
                    memoryview(payload_col[i].as_buffer()),
                    int(n_col[i]),
                )
                parts.append(vals)
                masks.append(valid)
                any_null = any_null or valid is not None
            flat = (
                np.concatenate(parts) if parts else np.zeros(0, dtype=object)
            )
            offsets = np.concatenate(([0], np.cumsum(n_col, dtype=np.int64)))
            if any_null:
                invalid = np.zeros(flat.size, dtype=bool)
                for i, m in enumerate(masks):
                    if m is not None:
                        invalid[offsets[i] : offsets[i + 1]] = ~m
                child = pa.array(flat, type=pa.string(), mask=invalid)
            else:
                child = pa.array(flat, type=pa.string())
            lists = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), child)
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), batch.column("source"), lists],
                names=["doc_id", "source", "vals"],
            )

    schema = "doc_id string, source string, vals array<string>"
    return blocks.select("doc_id", "source", "codec", "payload", "n_values").mapInArrow(
        kernel, schema
    )
