"""Regression tests: batches whose LAST row is an empty token array.

np.*.reduceat clamped the trailing empty row's boundary into the previous
row's segment (idx = min(starts, flat.size-1)), truncating the final
element of the last non-empty row — tok_sum/min/max/wsum silently wrong
for any corpus containing empty documents. Fixed by reducing only at
non-empty-row starts.
"""
import numpy as np
import pyarrow as pa

from rle_array_spark.engine import _encode_column, _stats_batch


def _stats(flat, offsets):
    n = offsets.size - 1
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([f"d{i}" for i in range(n)]),
            pa.array(["s"] * n),
        ],
        names=["doc_id", "source"],
    )
    out = _stats_batch(batch, flat, offsets)
    return {name: out.column(name).to_numpy(zero_copy_only=False) for name in out.schema.names}


def test_encode_trailing_empty_row_exact_metadata():
    flat = np.array([1, 1, 2, 2, 100], dtype=np.int32)
    offsets = np.array([0, 5, 5], dtype=np.int64)
    c = _encode_column(flat, offsets, "auto", 0.9)
    assert c["tok_sum"].tolist() == [106, 0]
    assert c["tok_min"].tolist() == [1, 0]
    assert c["tok_max"].tolist() == [100, 0]
    assert c["n_values"].tolist() == [5, 0]
    assert c["n_runs"].tolist() == [3, 0]


def test_encode_interleaved_empty_rows():
    flat = np.array([5, 5, 7], dtype=np.int32)
    offsets = np.array([0, 0, 2, 2, 3, 3], dtype=np.int64)
    c = _encode_column(flat, offsets, "auto", 0.9)
    assert c["tok_sum"].tolist() == [0, 10, 0, 7, 0]
    assert c["tok_min"].tolist() == [0, 5, 0, 7, 0]
    assert c["tok_max"].tolist() == [0, 5, 0, 7, 0]


def test_encode_all_rows_empty():
    flat = np.zeros(0, dtype=np.int32)
    offsets = np.array([0, 0, 0], dtype=np.int64)
    c = _encode_column(flat, offsets, "auto", 0.9)
    assert c["tok_sum"].tolist() == [0, 0]
    assert c["n_values"].tolist() == [0, 0]


def test_stats_batch_trailing_empty_row():
    flat = np.array([1, 1, 2, 2, 100], dtype=np.int32)
    offsets = np.array([0, 5, 5], dtype=np.int64)
    s = _stats(flat, offsets)
    assert s["tok_sum"].tolist() == [106, 0]
    assert s["tok_min"].tolist() == [1, 0]
    assert s["tok_max"].tolist() == [100, 0]
    # wsum = 1*1 + 1*2 + 2*3 + 2*4 + 100*5 = 517
    assert s["tok_wsum"].tolist() == [517, 0]
    assert s["n_runs"].tolist() == [3, 0]
    assert s["card"].tolist() == [3, 0]


def test_stats_batch_interleaved_empty_rows():
    flat = np.array([5, 5, 7], dtype=np.int32)
    offsets = np.array([0, 0, 2, 2, 3, 3], dtype=np.int64)
    s = _stats(flat, offsets)
    assert s["tok_sum"].tolist() == [0, 10, 0, 7, 0]
    # row 1 wsum = 5*1 + 5*2 = 15; row 3 wsum = 7*1 = 7
    assert s["tok_wsum"].tolist() == [0, 15, 0, 7, 0]
    assert s["n_runs"].tolist() == [0, 1, 0, 1, 0]
    assert s["card"].tolist() == [0, 1, 0, 1, 0]


def test_stats_batch_randomized_vs_naive():
    rng = np.random.default_rng(7)
    for trial in range(20):
        n_rows = int(rng.integers(1, 12))
        lengths = rng.integers(0, 6, size=n_rows)
        # force some trailing empties
        if trial % 3 == 0 and n_rows > 1:
            lengths[-1] = 0
        offsets = np.concatenate(([0], np.cumsum(lengths))).astype(np.int64)
        flat = rng.integers(0, 50, size=int(offsets[-1])).astype(np.int32)
        s = _stats(flat, offsets)
        for i in range(n_rows):
            row = flat[offsets[i] : offsets[i + 1]]
            if row.size:
                assert s["tok_sum"][i] == row.sum()
                assert s["tok_min"][i] == row.min()
                assert s["tok_max"][i] == row.max()
                assert s["tok_wsum"][i] == int(
                    (row.astype(np.int64) * np.arange(1, row.size + 1)).sum()
                )
            else:
                assert s["tok_sum"][i] == 0 and s["n_runs"][i] == 0
