"""Deterministic synthetic tokenized-sequence corpus (FIXTURES.md §1).

Schema matches BASELINE.json `input_hint`:
    doc_id: string, tokens: array<int32>, n_tok: int32, source: string

Each `source` is constructed so a specific codec wins, mirroring how the
reference's cube generator controls run lengths
(/root/reference/rle_array/testing.py:70-113) and how its autoconversion
tests construct single_value / two_values / increasing columns per expected
outcome (/root/reference/tests/test_autoconversion.py:83-130).

Generation is seeded and block-deterministic: row block i always produces the
same rows regardless of parallelism, so benchmarks and resume tests see
identical inputs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

SEED = 42
VOCAB = 65536
PAD_TOKEN = 0

SOURCES = ("padded", "natural", "code", "lowcard", "narrow", "random", "giant")

ARROW_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string(), nullable=False),
        pa.field("tokens", pa.list_(pa.field("element", pa.int32(), nullable=False)), nullable=False),
        pa.field("n_tok", pa.int32(), nullable=False),
        pa.field("source", pa.string(), nullable=False),
    ]
)


def _lengths(rng: np.random.Generator, n: int, source: str) -> np.ndarray:
    if source == "giant":
        return rng.integers(100_000, 400_000, size=n)
    ln = rng.lognormal(mean=np.log(512), sigma=0.6, size=n)
    return np.clip(ln, 8, 8192).astype(np.int64)


def _gen_tokens(rng: np.random.Generator, length: int, source: str) -> np.ndarray:
    if source == "padded":
        # ~90% pad runs interleaved with short content bursts.
        out = np.full(length, PAD_TOKEN, dtype=np.int32)
        n_bursts = max(1, length // 200)
        starts = np.sort(rng.integers(0, max(1, length - 16), size=n_bursts))
        for s in starts:
            w = int(rng.integers(4, 16))
            out[s : s + w] = rng.integers(1, VOCAB, size=min(w, length - s))
        return out
    if source == "natural":
        z = np.minimum(rng.zipf(1.3, size=length), VOCAB - 1)
        return z.astype(np.int32)
    if source == "code":
        # repeated keyword/indent motifs separated by identifier noise
        motifs = [
            rng.integers(0, VOCAB, size=int(rng.integers(3, 9))).astype(np.int32)
            for _ in range(6)
        ]
        parts, total = [], 0
        while total < length:
            m = motifs[int(rng.integers(0, len(motifs)))]
            noise = rng.integers(0, VOCAB, size=int(rng.integers(0, 3))).astype(np.int32)
            parts.extend((m, noise))
            total += m.size + noise.size
        return np.concatenate(parts)[:length]
    if source == "lowcard":
        return rng.integers(0, 256, size=length).astype(np.int32)
    if source == "narrow":
        return rng.integers(1000, 1256, size=length).astype(np.int32)
    if source in ("random", "giant"):
        return rng.integers(0, VOCAB, size=length).astype(np.int32)
    raise ValueError(f"unknown source {source}")


# Edge rows the reference's kernel tests demand (tests/test_algorithms.py:79-143).
def _edge_rows() -> list[tuple[str, np.ndarray]]:
    return [
        ("edge-empty", np.array([], dtype=np.int32)),
        ("edge-single", np.array([17], dtype=np.int32)),
        ("edge-allequal", np.full(64, 5, dtype=np.int32)),
        ("edge-alternating", np.tile(np.array([0, 1], dtype=np.int32), 64)),
        ("edge-bounds", np.array([0, VOCAB - 1, 0, VOCAB - 1], dtype=np.int32)),
    ]


def generate_block(block_id: int, rows_per_source: int, include_edges: bool = False) -> pa.RecordBatch:
    """One deterministic Arrow batch; `giant` gets 1 row per 50 regular rows."""
    doc_ids: list[str] = []
    sources: list[str] = []
    token_arrays: list[np.ndarray] = []
    for source in SOURCES:
        n = max(1, rows_per_source // 50) if source == "giant" else rows_per_source
        rng = np.random.default_rng((SEED, block_id, SOURCES.index(source)))
        lengths = _lengths(rng, n, source)
        for i, length in enumerate(lengths):
            doc_ids.append(f"{source}-{block_id:04d}-{i:06d}")
            sources.append(source)
            token_arrays.append(_gen_tokens(rng, int(length), source))
    if include_edges:
        for doc_id, arr in _edge_rows():
            doc_ids.append(doc_id)
            sources.append("edge")
            token_arrays.append(arr)

    n_toks = np.array([a.size for a in token_arrays], dtype=np.int32)
    offsets = np.concatenate(([0], np.cumsum(n_toks))).astype(np.int64)
    flat = (
        np.concatenate(token_arrays)
        if token_arrays
        else np.array([], dtype=np.int32)
    )
    tokens = pa.LargeListArray.from_arrays(pa.array(offsets), pa.array(flat, type=pa.int32())).cast(
        pa.list_(pa.int32())
    )
    return pa.RecordBatch.from_arrays(
        [pa.array(doc_ids), tokens, pa.array(n_toks), pa.array(sources)],
        names=["doc_id", "tokens", "n_tok", "source"],
    )


def generate_table(n_blocks: int = 1, rows_per_source: int = 40, include_edges: bool = True) -> pa.Table:
    batches = [
        generate_block(b, rows_per_source, include_edges=(include_edges and b == 0))
        for b in range(n_blocks)
    ]
    return pa.Table.from_batches(batches).cast(ARROW_SCHEMA.with_metadata(None), safe=False)


def write_corpus(path: str, n_blocks: int = 1, rows_per_source: int = 40, include_edges: bool = True) -> None:
    import pyarrow.parquet as pq

    pq.write_table(generate_table(n_blocks, rows_per_source, include_edges), path)


def iter_blocks(n_blocks: int, rows_per_source: int) -> Iterator[pa.RecordBatch]:
    for b in range(n_blocks):
        yield generate_block(b, rows_per_source)
