"""Encoded-table writer with per-partition lineage and checkpointed resume.

Sandbox layout (Parquet directory + JSON manifest). On a cluster with an
Iceberg catalog the same writer body targets
``write.format("iceberg").mode("append")`` — the seam is this module only
(SURVEY.md §7.6); partition files become Iceberg data files and the manifest
becomes the snapshot.

Resumability model (north_rule "checkpointed resumability"):
- partition contents are deterministic: the salted repartition hashes fixed
  columns, and the kernel sorts rows by doc_id before writing, so the same
  input + partition count always produces byte-identical partition files;
- each partition commits atomically (write tmp → os.replace) together with a
  sidecar lineage JSON keyed by an order-insensitive fingerprint of the
  partition's input rows;
- a restarted job recomputes each partition's fingerprint, finds the sidecar
  already committed with the same fingerprint, and skips the encode + write
  (idempotent per-partition commit log — the batch analog of a streaming
  checkpoint, SURVEY.md §2.d).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession

from rle_array_spark.chooser import DEFAULT_THRESHOLD
from rle_array_spark.engine import _encode_batch, pack_tokens_df, salted_repartition

BLOCKS_ARROW_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("source", pa.string()),
        ("codec", pa.string()),
        ("payload", pa.binary()),
        ("n_values", pa.int32()),
        ("n_runs", pa.int32()),
        ("tok_sum", pa.int64()),
        ("tok_min", pa.int32()),
        ("tok_max", pa.int32()),
        ("raw_bytes", pa.int64()),
        ("encoded_bytes", pa.int64()),
        ("ref_rle_bytes", pa.int64()),
        ("chunk_idx", pa.int32()),
        ("n_chunks", pa.int32()),
        ("chunk_offset", pa.int64()),
    ]
)

LINEAGE_SCHEMA = (
    "part_id int, status string, fingerprint string, n_rows long, n_tokens long, "
    "raw_bytes long, encoded_bytes long, ref_rle_bytes long, tok_sum long, "
    "codec_histogram string, wall_ms long"
)


def _fingerprint(doc_ids: list[str], n_toks: list[int], chunk_idxs: list[int]) -> str:
    """Order-insensitive fingerprint of a partition's input rows (chunk_idx
    included so two equal-length chunks of one doc don't XOR-cancel)."""
    acc = 0
    for d, n, c in zip(doc_ids, n_toks, chunk_idxs):
        h = hashlib.sha256(f"{d}:{c}:{n}".encode()).digest()[:16]
        acc ^= int.from_bytes(h, "little")
    return f"{acc:032x}"


def _part_paths(out_dir: str, part_id: int) -> tuple[str, str]:
    data = os.path.join(out_dir, "blocks", f"part-{part_id:05d}.parquet")
    lineage = os.path.join(out_dir, "lineage", f"part-{part_id:05d}.json")
    return data, lineage


class InjectedFailure(RuntimeError):
    """Raised by the fail-injection hook in resume tests."""


def encode_to_dir(
    df: DataFrame,
    out_dir: str,
    codec: str = "auto",
    threshold: float = DEFAULT_THRESHOLD,
    num_partitions: int = 32,
    fail_at_partition: int | None = None,
    chunk_tokens: int | None = None,
) -> list[dict]:
    """Encode a sequences DataFrame into ``out_dir/blocks`` with one parquet
    file + lineage sidecar per partition; returns the lineage records and
    writes the merged job manifest. Safe to re-run after a failure."""
    os.makedirs(os.path.join(out_dir, "blocks"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "lineage"), exist_ok=True)
    manifest_path = os.path.join(out_dir, "_manifest.json")
    prior = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            prior = json.load(f)
        if (
            prior.get("codec") != codec
            or prior.get("threshold") != threshold
            or prior.get("num_partitions") != num_partitions
            or prior.get("chunk_tokens") != chunk_tokens
        ):
            # Parameter change invalidates the checkpoint entirely.
            for entry in prior.get("partitions", []):
                for p in _part_paths(out_dir, entry["part_id"]):
                    if os.path.exists(p):
                        os.remove(p)
            prior = {}

    # Tokens travel through the shuffle as packed binary (one memcpy per row,
    # 3-5× cheaper than shuffling array<int>); the encode kernel reads either
    # form transparently.
    parted = salted_repartition(
        pack_tokens_df(
            df.select("doc_id", "tokens", "n_tok", "source"), chunk_tokens=chunk_tokens
        ),
        num_partitions,
    )

    def kernel(batches):
        ctx = TaskContext.get()
        part_id = ctx.partitionId() if ctx is not None else 0
        t0 = time.monotonic()
        in_batches = [b for b in batches if b.num_rows]
        doc_ids: list[str] = []
        n_toks: list[int] = []
        chunk_idxs: list[int] = []
        for b in in_batches:
            doc_ids.extend(b.column("doc_id").to_pylist())
            n_toks.extend(b.column("n_tok").to_pylist())
            chunk_idxs.extend(b.column("chunk_idx").to_pylist())
        fp = _fingerprint(doc_ids, n_toks, chunk_idxs)
        data_path, lineage_path = _part_paths(out_dir, part_id)

        if os.path.exists(lineage_path) and os.path.exists(data_path):
            with open(lineage_path) as f:
                rec = json.load(f)
            if rec.get("fingerprint") == fp:
                rec["status"] = "skipped"  # checkpoint hit: no re-encode
                yield _lineage_batch(rec)
                return

        if fail_at_partition is not None and part_id == fail_at_partition:
            raise InjectedFailure(f"injected failure at partition {part_id}")

        table = (
            pa.Table.from_batches(
                [_encode_batch(b, codec, threshold) for b in in_batches],
                schema=BLOCKS_ARROW_SCHEMA,
            )
            if in_batches
            else BLOCKS_ARROW_SCHEMA.empty_table()
        )
        # Deterministic file bytes: sort by (doc_id, chunk_idx) so reruns
        # are byte-identical.
        table = table.sort_by([("doc_id", "ascending"), ("chunk_idx", "ascending")])
        tmp_path = data_path + f".tmp-{os.getpid()}"
        pq.write_table(table, tmp_path)
        os.replace(tmp_path, data_path)

        hist: dict[str, int] = {}
        for c in table.column("codec").to_pylist():
            hist[c] = hist.get(c, 0) + 1
        rec = {
            "part_id": part_id,
            "status": "encoded",
            "fingerprint": fp,
            "n_rows": table.num_rows,
            "n_tokens": int(_col_sum(table, "n_values")),
            "raw_bytes": int(_col_sum(table, "raw_bytes")),
            "encoded_bytes": int(_col_sum(table, "encoded_bytes")),
            "ref_rle_bytes": int(_col_sum(table, "ref_rle_bytes")),
            "tok_sum": int(_col_sum(table, "tok_sum")),
            "codec_histogram": json.dumps(hist, sort_keys=True),
            "wall_ms": int((time.monotonic() - t0) * 1000),
        }
        tmp_lineage = lineage_path + f".tmp-{os.getpid()}"
        with open(tmp_lineage, "w") as f:
            json.dump(rec, f)
        os.replace(tmp_lineage, lineage_path)
        yield _lineage_batch(rec)

    lineage_rows = [r.asDict() for r in parted.mapInArrow(kernel, LINEAGE_SCHEMA).collect()]
    manifest = {
        "codec": codec,
        "threshold": threshold,
        "num_partitions": num_partitions,
        "chunk_tokens": chunk_tokens,
        "partitions": sorted(lineage_rows, key=lambda r: r["part_id"]),
    }
    tmp_manifest = manifest_path + ".tmp"
    with open(tmp_manifest, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp_manifest, manifest_path)
    return lineage_rows


def _col_sum(table: pa.Table, name: str) -> int:
    import pyarrow.compute as pc

    if table.num_rows == 0:
        return 0
    return pc.sum(table.column(name)).as_py() or 0


def _lineage_batch(rec: dict) -> pa.RecordBatch:
    return pa.RecordBatch.from_pylist(
        [rec],
        schema=pa.schema(
            [
                ("part_id", pa.int32()),
                ("status", pa.string()),
                ("fingerprint", pa.string()),
                ("n_rows", pa.int64()),
                ("n_tokens", pa.int64()),
                ("raw_bytes", pa.int64()),
                ("encoded_bytes", pa.int64()),
                ("ref_rle_bytes", pa.int64()),
                ("tok_sum", pa.int64()),
                ("codec_histogram", pa.string()),
                ("wall_ms", pa.int64()),
            ]
        ),
    )


def read_blocks(spark: SparkSession, out_dir: str) -> DataFrame:
    from rle_array_spark.engine import BLOCK_SCHEMA

    return spark.read.schema(BLOCK_SCHEMA).parquet(os.path.join(out_dir, "blocks"))


def read_manifest(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "_manifest.json")) as f:
        return json.load(f)
