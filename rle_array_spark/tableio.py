"""Encoded-table writer: immutable data files, snapshot manifests, lineage,
checkpointed resume, time travel, vacuum.

Sandbox layout (Parquet files + JSON manifests) with Iceberg's semantics —
on a cluster with an Iceberg catalog this module is the only seam to swap
(SURVEY.md §7.6):

- **Immutable data files** named ``part-{pid}-{fingerprint16}.parquet``
  where the fingerprint covers the partition's input rows AND the encode
  parameters — changing codec/threshold/chunking produces new files and
  never rewrites old ones;
- **Snapshot manifests** ``snapshots/v{N}.json`` list the exact data files
  of a committed version; ``_manifest.json`` is the atomic latest pointer.
  Readers only ever see complete snapshots (a crashed job leaves data files
  but no snapshot — invisible);
- **Checkpointed resume** (north_rule): each partition commits atomically
  (tmp → rename) with a lineage sidecar; a restarted job recomputes each
  partition's fingerprint, finds the sidecar committed, and skips the
  encode + write. Partition contents are deterministic (salted hash
  repartition + doc_id/chunk sort), so reruns are byte-identical;
- **Time travel**: ``read_blocks(spark, dir, snapshot=N)``;
- **Vacuum**: delete data files referenced by no snapshot.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession

from rle_array_spark.chooser import DEFAULT_THRESHOLD
from rle_array_spark.engine import (
    _encode_batch,
    encode_df,
    pack_tokens_df,
    salted_repartition,
)

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


def _fingerprint(
    doc_ids: list[str], n_toks: list[int], chunk_idxs: list[int], params_key: str
) -> str:
    """Order-insensitive fingerprint of a partition's input rows + encode
    params (chunk_idx included so two equal-length chunks of one doc don't
    XOR-cancel; params included so a codec/threshold change produces new
    immutable files instead of silently reusing stale ones)."""
    acc = int.from_bytes(hashlib.sha256(params_key.encode()).digest()[:16], "little")
    for d, n, c in zip(doc_ids, n_toks, chunk_idxs):
        h = hashlib.sha256(f"{d}:{c}:{n}:{params_key}".encode()).digest()[:16]
        acc ^= int.from_bytes(h, "little")
    return f"{acc:032x}"


def _data_path(out_dir: str, part_id: int, fp: str) -> str:
    return os.path.join(out_dir, "blocks", f"part-{part_id:05d}-{fp[:16]}.parquet")


def _lineage_path(out_dir: str, part_id: int, fp: str) -> str:
    return os.path.join(out_dir, "lineage", f"part-{part_id:05d}-{fp[:16]}.json")


class InjectedFailure(RuntimeError):
    """Raised by the fail-injection hook in resume tests."""


AUTO_CHUNK_MIN = 1 << 16
AUTO_CHUNK_MAX = 1 << 20
AUTO_CHUNK_PER_PARTITION = 8


def auto_chunk_tokens(df: DataFrame, num_partitions: int) -> int | None:
    """Pick a chunk size from corpus shape (one metadata-only aggregate).

    Partition balance after the salted shuffle is a balls-into-bins
    problem: k chunks into P partitions has relative imbalance
    ~O(sqrt(P/k)), so we target >= AUTO_CHUNK_PER_PARTITION chunks per
    partition for the heavy tail (measured in scripts/soak_giant.py:
    1 Mi-token chunks left max/ideal at 7.6 on a giant-dominated corpus,
    256 Ki brought it to 2.8). Returns None when no row would ever split —
    keeps the fingerprint/params identity of plain unchunked runs."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.sum(F.col("n_tok").cast("long")).alias("total"),
        F.max("n_tok").alias("longest"),
    ).collect()[0]
    total, longest = int(row["total"] or 0), int(row["longest"] or 0)
    chunk = int(
        min(AUTO_CHUNK_MAX,
            max(AUTO_CHUNK_MIN, total // (AUTO_CHUNK_PER_PARTITION * num_partitions)))
    )
    return chunk if longest > chunk else None


def encode_to_dir(
    df: DataFrame,
    out_dir: str,
    codec: str = "auto",
    threshold: float = DEFAULT_THRESHOLD,
    num_partitions: int = 32,
    fail_at_partition: int | None = None,
    chunk_tokens: int | str | None = None,
    encode_first: bool = True,
    commit_mode: str = "sidecar",
) -> list[dict]:
    """Encode a sequences DataFrame into ``out_dir`` (one immutable parquet
    file + lineage sidecar per partition), commit a new snapshot, and return
    the lineage records. Safe to re-run after a failure; re-running an
    already-committed configuration is a full checkpoint hit.

    ``chunk_tokens="auto"`` sizes chunks from the corpus shape (see
    :func:`auto_chunk_tokens`); the resolved value enters the params
    fingerprint, so auto-runs checkpoint/resume exactly like explicit ones
    as long as the corpus shape is unchanged.

    ``encode_first=True`` (default) encodes at scan parallelism and
    shuffles the ENCODED blocks into deterministic partitions — the
    shuffle moves ~2.5× fewer bytes (compressed payloads vs raw tokens)
    and the encode runs on the no-shuffle fast path. Set False to shuffle
    raw (packed) tokens BEFORE encoding — the defense when the INPUT
    layout itself is pathological (e.g. one unsplittable parquet row group
    holding a giant sequence would otherwise pin its whole encode on one
    scan task; chunking splits it only after the scan).

    ``commit_mode`` selects the resume protocol:

    - ``"sidecar"`` (default): each partition writes a lineage JSON sidecar
      via tmp-file + ``os.replace`` — assumes a shared filesystem with
      atomic rename (local, NFS, HDFS).
    - ``"manifest"``: NO executor-side sidecars. The data file itself is the
      checkpoint: its name embeds the partition fingerprint, its bytes are
      deterministic, and the skip-check is existence + a validating
      metadata-columns read (a torn file from a mid-write crash fails the
      read and is re-encoded). This is the object-store-safe protocol —
      on S3-class storage a PUT is atomic per object and rename doesn't
      exist, so per-partition rename-committed sidecars can't work; all
      lineage then lives only in the driver-committed snapshot manifest,
      exactly like Iceberg's metadata layer (the seam SURVEY.md §7.6
      names). Both modes produce byte-identical data files and can resume
      each other's partial runs (sidecar-mode reruns re-encode
      manifest-written partitions at worst — never corrupt them)."""
    if commit_mode not in ("sidecar", "manifest"):
        raise ValueError(f"commit_mode must be 'sidecar' or 'manifest', got {commit_mode!r}")
    if chunk_tokens == "auto":
        chunk_tokens = auto_chunk_tokens(df, num_partitions)
    os.makedirs(os.path.join(out_dir, "blocks"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "lineage"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "snapshots"), exist_ok=True)
    params_key = (
        f"{codec}|{threshold}|{num_partitions}|{chunk_tokens}|ef={int(encode_first)}"
    )

    if encode_first:
        parted = salted_repartition(
            encode_df(
                df.select("doc_id", "tokens", "n_tok", "source"),
                codec=codec,
                threshold=threshold,
                chunk_tokens=chunk_tokens,
            ),
            num_partitions,
        )
    else:
        parted = salted_repartition(
            pack_tokens_df(
                df.select("doc_id", "tokens", "n_tok", "source"),
                chunk_tokens=chunk_tokens,
            ),
            num_partitions,
        )

    def kernel(batches):
        ctx = TaskContext.get()
        part_id = ctx.partitionId() if ctx is not None else 0
        t0 = time.monotonic()
        in_batches = [b for b in batches if b.num_rows]
        length_field = "n_values" if encode_first else "n_tok"
        doc_ids: list[str] = []
        n_toks: list[int] = []
        chunk_idxs: list[int] = []
        for b in in_batches:
            doc_ids.extend(b.column("doc_id").to_pylist())
            n_toks.extend(b.column(length_field).to_pylist())
            chunk_idxs.extend(b.column("chunk_idx").to_pylist())
        fp = _fingerprint(doc_ids, n_toks, chunk_idxs, params_key)
        data_path = _data_path(out_dir, part_id, fp)
        lineage_path = _lineage_path(out_dir, part_id, fp)

        if commit_mode == "sidecar":
            if os.path.exists(lineage_path) and os.path.exists(data_path):
                with open(lineage_path) as f:
                    rec = json.load(f)
                if rec.get("fingerprint") == fp:
                    rec["status"] = "skipped"  # checkpoint hit: no re-encode
                    yield _lineage_batch(rec)
                    return
        else:  # manifest mode: the self-certifying data file IS the checkpoint
            rec = _stats_from_data_file(data_path, part_id, fp)
            if rec is not None:
                yield _lineage_batch(rec)
                return

        if fail_at_partition is not None and part_id == fail_at_partition:
            raise InjectedFailure(f"injected failure at partition {part_id}")

        if not in_batches:
            table = BLOCKS_ARROW_SCHEMA.empty_table()
        elif encode_first:  # rows arrive already encoded — just assemble
            table = (
                pa.Table.from_batches(in_batches)
                .select(BLOCKS_ARROW_SCHEMA.names)
                .cast(BLOCKS_ARROW_SCHEMA)
            )
        else:
            table = pa.Table.from_batches(
                [_encode_batch(b, codec, threshold) for b in in_batches],
                schema=BLOCKS_ARROW_SCHEMA,
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
        if commit_mode == "sidecar":
            tmp_lineage = lineage_path + f".tmp-{os.getpid()}"
            with open(tmp_lineage, "w") as f:
                json.dump(rec, f)
            os.replace(tmp_lineage, lineage_path)
        yield _lineage_batch(rec)

    lineage_rows = [r.asDict() for r in parted.mapInArrow(kernel, LINEAGE_SCHEMA).collect()]
    lineage_rows.sort(key=lambda r: r["part_id"])

    # Commit: write the next snapshot, then atomically bump the pointer.
    existing = sorted(glob.glob(os.path.join(out_dir, "snapshots", "v*.json")))
    version = 1 + max(
        (int(os.path.basename(p)[1:-5]) for p in existing), default=0
    )
    snapshot = {
        "version": version,
        "parent": version - 1 if existing else None,
        "codec": codec,
        "threshold": threshold,
        "num_partitions": num_partitions,
        "chunk_tokens": chunk_tokens,
        "params_key": params_key,
        "files": [
            os.path.basename(_data_path(out_dir, r["part_id"], r["fingerprint"]))
            for r in lineage_rows
        ],
        "partitions": lineage_rows,
    }
    snap_path = os.path.join(out_dir, "snapshots", f"v{version}.json")
    with open(snap_path + ".tmp", "w") as f:
        json.dump(snapshot, f, indent=1)
    os.replace(snap_path + ".tmp", snap_path)
    pointer = {"latest": version, **{k: snapshot[k] for k in ("codec", "threshold", "num_partitions", "chunk_tokens")}, "partitions": lineage_rows}
    tmp_manifest = os.path.join(out_dir, "_manifest.json.tmp")
    with open(tmp_manifest, "w") as f:
        json.dump(pointer, f, indent=1)
    os.replace(tmp_manifest, os.path.join(out_dir, "_manifest.json"))
    return lineage_rows


_STATS_COLUMNS = ["codec", "n_values", "raw_bytes", "encoded_bytes", "ref_rle_bytes", "tok_sum"]


def _stats_from_data_file(data_path: str, part_id: int, fp: str) -> dict | None:
    """Manifest-mode skip-check: rebuild the lineage record from a committed
    data file's own metadata columns (a bounded, partition-local read —
    never the payloads). Returns None when the file is absent or unreadable
    (torn mid-write crash on a filesystem without atomic rename) — the torn
    file is removed so the caller's re-encode rewrites it cleanly."""
    if not os.path.exists(data_path):
        return None
    try:
        t = pq.read_table(data_path, columns=_STATS_COLUMNS)
    except pa.lib.ArrowInvalid:
        # Genuinely corrupt parquet (torn mid-write on a filesystem without
        # atomic rename): quarantine under .corrupt rather than delete, so
        # a file earlier snapshots reference is never destroyed outright;
        # the caller's re-encode rewrites via the tmp+replace path.
        os.replace(data_path, data_path + ".corrupt")
        return None
    except Exception:
        # Transient read error (EMFILE, interrupted read, permissions):
        # the file may be perfectly valid — leave it in place; re-encode
        # overwrites it atomically.
        return None
    hist: dict[str, int] = {}
    for c in t.column("codec").to_pylist():
        hist[c] = hist.get(c, 0) + 1
    return {
        "part_id": part_id,
        "status": "skipped",
        "fingerprint": fp,
        "n_rows": t.num_rows,
        "n_tokens": int(_col_sum(t, "n_values")),
        "raw_bytes": int(_col_sum(t, "raw_bytes")),
        "encoded_bytes": int(_col_sum(t, "encoded_bytes")),
        "ref_rle_bytes": int(_col_sum(t, "ref_rle_bytes")),
        "tok_sum": int(_col_sum(t, "tok_sum")),
        "codec_histogram": json.dumps(hist, sort_keys=True),
        "wall_ms": 0,
    }


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


def read_snapshot(out_dir: str, snapshot: int | None = None) -> dict:
    """Load a snapshot manifest (latest when ``snapshot`` is None)."""
    if snapshot is None:
        with open(os.path.join(out_dir, "_manifest.json")) as f:
            snapshot = json.load(f)["latest"]
    path = os.path.join(out_dir, "snapshots", f"v{snapshot}.json")
    with open(path) as f:
        return json.load(f)


def read_blocks(spark: SparkSession, out_dir: str, snapshot: int | None = None) -> DataFrame:
    """Read the encoded-blocks table at a snapshot (latest by default) —
    only the files that snapshot committed, never uncommitted stragglers."""
    from rle_array_spark.engine import BLOCK_SCHEMA

    snap = read_snapshot(out_dir, snapshot)
    files = [os.path.join(out_dir, "blocks", f) for f in snap["files"]]
    return spark.read.schema(BLOCK_SCHEMA).parquet(*files)


def read_manifest(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "_manifest.json")) as f:
        return json.load(f)


def vacuum(out_dir: str, keep_snapshots: int | None = None) -> list[str]:
    """Delete data files referenced by no (kept) snapshot; optionally expire
    all but the newest ``keep_snapshots`` manifests. Returns deleted paths."""
    snaps = sorted(
        glob.glob(os.path.join(out_dir, "snapshots", "v*.json")),
        key=lambda p: int(os.path.basename(p)[1:-5]),
    )
    if keep_snapshots is not None and len(snaps) > keep_snapshots:
        for p in snaps[:-keep_snapshots]:
            os.remove(p)
        snaps = snaps[-keep_snapshots:]
    referenced: set[str] = set()
    for p in snaps:
        with open(p) as f:
            referenced.update(json.load(f)["files"])
    deleted = []
    for path in glob.glob(os.path.join(out_dir, "blocks", "*.parquet")):
        if os.path.basename(path) not in referenced:
            os.remove(path)
            deleted.append(path)
            sidecar = os.path.join(
                out_dir, "lineage", os.path.basename(path)[:-8] + ".json"
            )
            if os.path.exists(sidecar):
                os.remove(sidecar)
    return deleted


# ---------------------------------------------------------------------------
# Whole-table (mixed-dtype) checkpointed writer
# ---------------------------------------------------------------------------

def encode_table_to_dir(
    df,
    cols: list[str],
    out_dir: str,
    codec: str = "auto",
    num_partitions: int = 32,
    fail_at_partition: int | None = None,
    commit_mode: str = "sidecar",
) -> list[dict]:
    """Checkpointed writer for the mixed-dtype whole-table encode
    (tableframe.encode_table_df): every array column under its codec
    family, one wide row per input row, written as one immutable parquet
    file per partition with the same snapshot/lineage/resume discipline as
    :func:`encode_to_dir`.

    Encode-first by construction: columns are encoded at scan parallelism
    and the shuffle moves encoded wide rows (binary payloads), keyed by a
    deterministic hash repartition on doc_id. Frame rows are assumed
    bounded (no chunking — chunk upstream or use the single-column path
    for giant-sequence corpora). Lineage totals aggregate across all
    encoded columns."""
    from pyspark.sql import functions as F

    from rle_array_spark.tableframe import encode_table_df, table_schema

    if commit_mode not in ("sidecar", "manifest"):
        raise ValueError(f"commit_mode must be 'sidecar' or 'manifest', got {commit_mode!r}")
    os.makedirs(os.path.join(out_dir, "blocks"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "lineage"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "snapshots"), exist_ok=True)
    wide_ddl, kinds = table_schema(df, cols)
    params_key = (
        f"table|{codec}|{num_partitions}|{','.join(f'{c}:{kinds[c]}' for c in cols)}"
    )

    blocks = encode_table_df(df, cols, codec=codec)
    parted = blocks.repartition(num_partitions, "doc_id").sortWithinPartitions("doc_id")

    n_value_cols = [f"{c}__n_values" for c in cols]
    enc_cols = [f"{c}__encoded_bytes" for c in cols]

    def kernel(batches):
        ctx = TaskContext.get()
        part_id = ctx.partitionId() if ctx is not None else 0
        t0 = time.monotonic()
        in_batches = [b for b in batches if b.num_rows]
        doc_ids: list[str] = []
        n_vals: list[int] = []
        for b in in_batches:
            doc_ids.extend(b.column("doc_id").to_pylist())
            totals = None
            for nc in n_value_cols:
                col = b.column(nc).to_numpy(zero_copy_only=False)
                totals = col.astype("int64") if totals is None else totals + col
            n_vals.extend(int(x) for x in totals)
        # Row ordinals (not a constant) in the chunk slot: with a constant,
        # two rows with identical (doc_id, n_values) XOR-cancel and adding/
        # removing such a pair would leave the fingerprint unchanged,
        # silently reusing a stale data file on resume.
        fp = _fingerprint(doc_ids, n_vals, list(range(len(doc_ids))), params_key)
        data_path = _data_path(out_dir, part_id, fp)
        lineage_path = _lineage_path(out_dir, part_id, fp)

        if commit_mode == "sidecar":
            if os.path.exists(lineage_path) and os.path.exists(data_path):
                with open(lineage_path) as f:
                    rec = json.load(f)
                if rec.get("fingerprint") == fp:
                    rec["status"] = "skipped"
                    yield _lineage_batch(rec)
                    return
        else:
            rec = _table_stats_from_file(
                data_path, part_id, fp, n_value_cols, enc_cols,
                [f"{c}__codec" for c in cols],
            )
            if rec is not None:
                yield _lineage_batch(rec)
                return

        if fail_at_partition is not None and part_id == fail_at_partition:
            raise InjectedFailure(f"injected failure at partition {part_id}")

        if in_batches:
            table = pa.Table.from_batches(in_batches)
        else:
            # empty partition: schema comes from the plan via an empty select
            yield _lineage_batch({
                "part_id": part_id, "status": "encoded", "fingerprint": fp,
                "n_rows": 0, "n_tokens": 0, "raw_bytes": 0, "encoded_bytes": 0,
                "ref_rle_bytes": 0, "tok_sum": 0, "codec_histogram": "{}",
                "wall_ms": int((time.monotonic() - t0) * 1000),
            })
            return
        table = table.sort_by([("doc_id", "ascending")])
        tmp_path = data_path + f".tmp-{os.getpid()}"
        pq.write_table(table, tmp_path)
        os.replace(tmp_path, data_path)

        hist: dict[str, int] = {}
        for c in cols:
            for name in table.column(f"{c}__codec").to_pylist():
                hist[name] = hist.get(name, 0) + 1
        rec = {
            "part_id": part_id,
            "status": "encoded",
            "fingerprint": fp,
            "n_rows": table.num_rows,
            "n_tokens": sum(_col_sum(table, nc) for nc in n_value_cols),
            # per-column raw accounting lives in the blocks themselves
            # (field sets differ per family); lineage totals track values+bytes
            "raw_bytes": 0,
            "encoded_bytes": sum(_col_sum(table, ec) for ec in enc_cols),
            "ref_rle_bytes": 0,
            "tok_sum": 0,
            "codec_histogram": json.dumps(hist, sort_keys=True),
            "wall_ms": int((time.monotonic() - t0) * 1000),
        }
        if commit_mode == "sidecar":
            tmp_lineage = lineage_path + f".tmp-{os.getpid()}"
            with open(tmp_lineage, "w") as f:
                json.dump(rec, f)
            os.replace(tmp_lineage, lineage_path)
        yield _lineage_batch(rec)

    lineage_rows = [r.asDict() for r in parted.mapInArrow(kernel, LINEAGE_SCHEMA).collect()]
    lineage_rows.sort(key=lambda r: r["part_id"])

    existing = sorted(glob.glob(os.path.join(out_dir, "snapshots", "v*.json")))
    version = 1 + max((int(os.path.basename(p)[1:-5]) for p in existing), default=0)
    snapshot = {
        "version": version,
        "parent": version - 1 if existing else None,
        "codec": codec,
        "table_cols": {c: kinds[c] for c in cols},
        "table_schema": wide_ddl,
        "num_partitions": num_partitions,
        "params_key": params_key,
        "files": [
            os.path.basename(_data_path(out_dir, r["part_id"], r["fingerprint"]))
            for r in lineage_rows
            if r["n_rows"] > 0 or os.path.exists(
                _data_path(out_dir, r["part_id"], r["fingerprint"])
            )
        ],
        "partitions": lineage_rows,
    }
    snap_path = os.path.join(out_dir, "snapshots", f"v{version}.json")
    with open(snap_path + ".tmp", "w") as f:
        json.dump(snapshot, f, indent=1)
    os.replace(snap_path + ".tmp", snap_path)
    pointer = {"latest": version, "codec": codec, "num_partitions": num_partitions,
               "table_cols": snapshot["table_cols"], "partitions": lineage_rows}
    tmp_manifest = os.path.join(out_dir, "_manifest.json.tmp")
    with open(tmp_manifest, "w") as f:
        json.dump(pointer, f, indent=1)
    os.replace(tmp_manifest, os.path.join(out_dir, "_manifest.json"))
    return lineage_rows


def _table_stats_from_file(
    data_path: str,
    part_id: int,
    fp: str,
    n_value_cols: list[str],
    enc_cols: list[str],
    codec_cols: list[str],
) -> dict | None:
    """Manifest-mode skip-check for table-writer files (wide schema)."""
    if not os.path.exists(data_path):
        return None
    try:
        t = pq.read_table(data_path, columns=n_value_cols + enc_cols + codec_cols)
    except pa.lib.ArrowInvalid:
        # Corrupt file: quarantine, never os.remove (see _stats_from_data_file).
        os.replace(data_path, data_path + ".corrupt")
        return None
    except Exception:
        # Transient read error: leave the possibly-valid file; re-encode
        # replaces it atomically.
        return None
    hist: dict[str, int] = {}
    for cc in codec_cols:
        for name in t.column(cc).to_pylist():
            hist[name] = hist.get(name, 0) + 1
    return {
        "part_id": part_id,
        "status": "skipped",
        "fingerprint": fp,
        "n_rows": t.num_rows,
        "n_tokens": sum(_col_sum(t, nc) for nc in n_value_cols),
        "raw_bytes": 0,
        "encoded_bytes": sum(_col_sum(t, ec) for ec in enc_cols),
        "ref_rle_bytes": 0,
        "tok_sum": 0,
        "codec_histogram": json.dumps(hist, sort_keys=True),
        "wall_ms": 0,
    }


def read_table_blocks(spark: SparkSession, out_dir: str, snapshot: int | None = None) -> DataFrame:
    """Read the wide encoded-table rows at a snapshot (latest by default).
    An all-empty snapshot (no data files) yields an empty DataFrame with
    the committed schema."""
    snap = read_snapshot(out_dir, snapshot)
    files = [os.path.join(out_dir, "blocks", f) for f in snap["files"]]
    ddl = snap.get("table_schema")
    if not files:
        return spark.createDataFrame([], ddl)
    reader = spark.read.schema(ddl) if ddl else spark.read
    return reader.parquet(*files)
