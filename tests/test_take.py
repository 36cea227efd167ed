"""Compressed-domain take/gather: differential vs decode + fancy index
(the reference's take oracle, /root/reference/tests/test_algorithms.py
pattern for _take_kernel, _algorithms.py:370-481)."""

from __future__ import annotations

import numpy as np
import pytest

from rle_array_spark.codecs import CODECS
from rle_array_spark.codecs.reduce import take_runs
from rle_array_spark.codecs.rle import encode_runs

CASES = [
    ("runny", np.repeat(np.arange(20, dtype=np.int32) % 5, 37)),
    ("alternating", np.tile(np.array([3, 9], dtype=np.int32), 200)),
    ("constant", np.full(313, 7, dtype=np.int32)),
    ("random", np.random.default_rng(11).integers(0, 50, 500).astype(np.int32)),
    ("wide", np.random.default_rng(12).integers(0, 2**30, 300).astype(np.int32)),
    ("single", np.array([42], dtype=np.int32)),
]

IDX_BUILDERS = [
    ("stride3", lambda n: np.arange(0, n, 3)),
    ("stride7off2", lambda n: np.arange(2, n, 7)),
    ("head", lambda n: np.arange(min(5, n))),
    ("tail", lambda n: np.arange(max(0, n - 5), n)),
    ("all", lambda n: np.arange(n)),
    ("sparse", lambda n: np.unique(np.linspace(0, n - 1, num=min(n, 9), dtype=np.int64))),
]


@pytest.mark.parametrize("codec", ["rle", "dict", "bitpack", "for", "raw", "ngram"])
@pytest.mark.parametrize("case_name,values", CASES, ids=[c[0] for c in CASES])
def test_take_matches_decode_gather(codec, case_name, values):
    payload = CODECS[codec].encode(values)
    decoded = CODECS[codec].decode(payload, values.size)
    for idx_name, build in IDX_BUILDERS:
        idx = build(values.size)
        rv, rl = take_runs(codec, payload, values.size, idx)
        got = np.repeat(rv, rl)
        np.testing.assert_array_equal(got, decoded[idx], err_msg=f"{idx_name}")
        # canonical form: no empty runs, adjacent run values differ
        assert (rl >= 1).all()
        if rv.size > 1:
            assert (rv[1:] != rv[:-1]).all()
        # runs round-trip through the direct RLE emit
        rt = CODECS["rle"].decode(encode_runs(rv, rl), int(rl.sum()))
        np.testing.assert_array_equal(rt, got)


def test_take_run_reuse_merges_skipped_runs():
    # runs A(5) B(1) A(5): stride 2 from position 0 skips B entirely →
    # output must be ONE canonical run of A, not two
    values = np.concatenate(
        [np.full(5, 4), np.full(1, 9), np.full(5, 4)]
    ).astype(np.int32)
    payload = CODECS["rle"].encode(values)
    rv, rl = take_runs("rle", payload, values.size, np.array([0, 2, 4, 6, 8, 10]))
    assert rv.tolist() == [4]
    assert rl.tolist() == [6]


def test_take_empty_and_bounds():
    values = np.arange(10, dtype=np.int32)
    payload = CODECS["rle"].encode(values)
    rv, rl = take_runs("rle", payload, 10, np.zeros(0, dtype=np.int64))
    assert rv.size == 0 and rl.size == 0
    with pytest.raises(IndexError):
        take_runs("rle", payload, 10, np.array([10]))
    with pytest.raises(IndexError):
        take_runs("rle", payload, 10, np.array([-1]))


def test_take_blocks_stride_and_chunks(spark):
    from rle_array_spark import datagen
    from rle_array_spark.engine import decode_df, encode_df, take_blocks

    import pyarrow as pa

    table = datagen.generate_table(n_blocks=2, rows_per_source=10)
    df = spark.createDataFrame(table.to_pandas())
    raw = {r["doc_id"]: r["tokens"] for r in df.collect()}

    for kwargs in ({"stride": 7, "offset": 2}, {"indices": np.arange(1, 5000, 13)}):
        for chunk in (None, 256):
            blocks = encode_df(df, codec="auto", chunk_tokens=chunk)
            taken = take_blocks(blocks, **kwargs)
            out = decode_df(taken, reassemble_chunks=chunk is not None)
            got = {r["doc_id"]: r["tokens"] for r in out.collect()}
            assert set(got) == set(raw)
            for doc_id, toks in raw.items():
                arr = np.asarray(toks, dtype=np.int64)
                if "stride" in kwargs:
                    exp = arr[kwargs["offset"] :: kwargs["stride"]]
                else:
                    idx = kwargs["indices"]
                    exp = arr[idx[idx < arr.size]]
                np.testing.assert_array_equal(
                    np.asarray(got[doc_id], dtype=np.int64), exp,
                    err_msg=f"{doc_id} {kwargs} chunk={chunk}",
                )


def test_take_blocks_metadata_exact(spark):
    from rle_array_spark import datagen
    from rle_array_spark.engine import encode_df, take_blocks

    table = datagen.generate_table(n_blocks=1, rows_per_source=8)
    df = spark.createDataFrame(table.to_pandas())
    blocks = encode_df(df, codec="auto")
    taken = take_blocks(blocks, stride=3).collect()
    raw = {r["doc_id"]: np.asarray(r["tokens"], dtype=np.int64) for r in df.collect()}
    for r in taken:
        exp = raw[r["doc_id"]][::3]
        assert r["codec"] == "rle"
        assert r["n_values"] == exp.size
        assert r["tok_sum"] == int(exp.sum()) if exp.size else r["tok_sum"] == 0
        if exp.size:
            assert r["tok_min"] == int(exp.min())
            assert r["tok_max"] == int(exp.max())
            boundaries = 1 + int(np.count_nonzero(exp[1:] != exp[:-1]))
            assert r["n_runs"] == boundaries


def test_reverse_blocks_differential(spark):
    from rle_array_spark import datagen
    from rle_array_spark.engine import decode_df, encode_df, reverse_blocks

    table = datagen.generate_table(n_blocks=1, rows_per_source=8)
    df = spark.createDataFrame(table.to_pandas())
    raw = {r["doc_id"]: list(r["tokens"]) for r in df.collect()}
    for codec in ("rle", "dict", "bitpack", "for", "raw", "auto"):
        blocks = encode_df(df, codec=codec)
        rev = reverse_blocks(blocks)
        got = {r["doc_id"]: list(r["tokens"]) for r in decode_df(rev).collect()}
        for doc_id, toks in raw.items():
            assert got[doc_id] == toks[::-1], (codec, doc_id)
        # metadata is order-invariant: sum/min/max/n_runs unchanged
        before = {r["doc_id"]: (r["tok_sum"], r["tok_min"], r["tok_max"], r["n_runs"])
                  for r in blocks.collect()}
        after = {r["doc_id"]: (r["tok_sum"], r["tok_min"], r["tok_max"], r["n_runs"])
                 for r in rev.collect()}
        assert before == after, codec


def test_reverse_blocks_rejects_chunked(spark):
    import pytest as _pytest

    from rle_array_spark import datagen
    from rle_array_spark.engine import encode_df, reverse_blocks

    table = datagen.generate_table(n_blocks=1, rows_per_source=8)
    df = spark.createDataFrame(table.to_pandas())
    blocks = encode_df(df, codec="auto", chunk_tokens=64)
    with _pytest.raises(Exception, match="unchunked"):
        reverse_blocks(blocks).collect()


def test_take_blocks_repeated_indices(spark):
    from rle_array_spark import datagen
    from rle_array_spark.engine import decode_df, encode_df, take_blocks

    table = datagen.generate_table(n_blocks=1, rows_per_source=4)
    df = spark.createDataFrame(table.to_pandas())
    raw = {r["doc_id"]: np.asarray(r["tokens"]) for r in df.collect()}
    idx = np.array([0, 0, 2, 2, 2, 5])
    taken = decode_df(take_blocks(encode_df(df, codec="auto"), indices=idx))
    got = {r["doc_id"]: np.asarray(r["tokens"]) for r in taken.collect()}
    for doc_id, toks in raw.items():
        exp = toks[idx[idx < toks.size]]
        np.testing.assert_array_equal(got[doc_id], exp, err_msg=doc_id)
    with pytest.raises(Exception, match="sorted"):
        take_blocks(encode_df(df, codec="auto"), indices=np.array([3, 1]))
