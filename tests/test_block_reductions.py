"""block_reductions_df: compressed-domain reductions vs the decoded oracle
(differential pattern of /root/reference/tests/test_reduce.py:91-112)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from rle_array_spark import datagen
from rle_array_spark.engine import block_reductions_df, encode_df


@pytest.fixture(scope="module")
def corpus(spark):
    table = datagen.generate_table(n_blocks=1, rows_per_source=6, include_edges=True)
    return spark.createDataFrame(table.to_pandas())


def test_block_reductions_match_decoded(spark, corpus):
    blocks = encode_df(corpus, codec="auto")
    got = {r["doc_id"]: r for r in block_reductions_df(blocks).collect()}
    rows = corpus.select("doc_id", "tokens").collect()
    assert len(got) == len(rows)
    for r in rows:
        arr = np.array(r["tokens"], dtype=np.int64)
        g = got[r["doc_id"]]
        if arr.size == 0:
            assert (g["n_tok"], g["tok_sum"], g["tok_min"], g["tok_max"]) == (0, 0, 0, 0)
            assert (g["any_nz"], g["all_nz"]) == (False, True)
            continue
        assert g["n_tok"] == arr.size
        assert g["tok_sum"] == int(arr.sum())
        assert g["tok_min"] == int(arr.min())
        assert g["tok_max"] == int(arr.max())
        assert g["any_nz"] == bool((arr != 0).any())
        assert g["all_nz"] == bool((arr != 0).all())


def test_block_reductions_every_codec(spark, corpus):
    # forced codecs must agree with each other (payload-independent result)
    results = []
    for codec in ("rle", "dict", "bitpack", "for", "ngram", "raw"):
        blocks = encode_df(corpus, codec=codec)
        agg = (
            block_reductions_df(blocks)
            .agg(
                F.sum("tok_sum").alias("s"),
                F.min("tok_min").alias("mn"),
                F.max("tok_max").alias("mx"),
                F.sum(F.col("any_nz").cast("int")).alias("na"),
                F.sum(F.col("all_nz").cast("int")).alias("nl"),
            )
            .collect()[0]
        )
        results.append((codec, tuple(agg)))
    baseline = results[0][1]
    for codec, vals in results[1:]:
        assert vals == baseline, f"{codec} disagrees: {vals} != {baseline}"


def test_block_prod_mod_differential():
    import numpy as np

    from rle_array_spark.codecs import encode_block
    from rle_array_spark.codecs.reduce import block_prod_mod

    P = 1_000_000_007
    rng = np.random.default_rng(3)
    for values in (
        np.repeat(np.array([2, 3, 2, 7], dtype=np.int32), [50, 3, 20, 1]),
        rng.integers(0, 1000, 257).astype(np.int32),
        np.zeros(5, dtype=np.int32),
        np.array([], dtype=np.int32),
        np.array([999999], dtype=np.int32),
    ):
        expect = 1
        for v in values.tolist():
            expect = (expect * v) % P
        for codec in ("rle", "dict", "bitpack", "for", "raw", "ngram"):
            payload = encode_block(values, codec)
            assert block_prod_mod(codec, payload, values.size, P) == expect, codec


def test_dict_stats_ignore_unreferenced_table_entries():
    """An externally-supplied dict table may contain entries no code refers
    to; min/max/any/all must reflect only referenced values."""
    import numpy as np

    from rle_array_spark.codecs.dictionary import DictCodec
    from rle_array_spark.codecs.reduce import block_any_all, block_min_max, payload_stats

    values = np.array([5, 5, 9, 9, 9], dtype=np.int32)
    table = np.array([0, 5, 9, 1000], dtype=np.int32)  # 0 and 1000 unused
    payload = DictCodec().encode(values, table=table)
    assert block_min_max("dict", payload, 5) == (5, 9)
    any_nz, all_nz = block_any_all("dict", payload, 5)
    assert any_nz and all_nz  # the unreferenced 0 must not flip all_nz
    n_runs, s, lo, hi = payload_stats("dict", payload, 5)
    assert (lo, hi, s) == (5, 9, 37)


# ---- compressed-domain value_counts (aggregation pushdown) ----


@pytest.mark.parametrize("codec", ["rle", "dict", "bitpack", "for", "raw", "ngram"])
@pytest.mark.parametrize("seed", range(4))
def test_value_counts_block_differential(codec, seed):
    from rle_array_spark.codecs import encode_block
    from rle_array_spark.codecs.reduce import value_counts_block

    rng = np.random.default_rng(seed)
    vals = np.repeat(
        rng.integers(0, 40, 16).astype(np.int32), rng.integers(1, 20, 16)
    )
    got_v, got_c = value_counts_block(codec, encode_block(vals, codec), vals.size)
    exp_v, exp_c = np.unique(vals, return_counts=True)
    np.testing.assert_array_equal(got_v, exp_v)
    np.testing.assert_array_equal(got_c, exp_c)
    assert int(got_c.sum()) == vals.size
    # empty
    got_v, got_c = value_counts_block(codec, encode_block(vals[:0], codec), 0)
    assert got_v.size == 0 and got_c.size == 0


def test_value_counts_blocks_df_merges_chunks(spark, sequences):
    from pyspark.sql import functions as F

    from rle_array_spark.engine import encode_df, value_counts_blocks_df

    blocks = encode_df(sequences, codec="auto")
    vc = {
        (r["doc_id"], r["value"]): r["count"]
        for r in value_counts_blocks_df(blocks).collect()
    }
    raw = {r["doc_id"]: r["tokens"] for r in sequences.select("doc_id", "tokens").collect()}
    for d, toks in raw.items():
        x = np.asarray(toks, dtype=np.int64)
        uv, uc = np.unique(x, return_counts=True)
        for v, c in zip(uv.tolist(), uc.tolist()):
            assert vc[(d, v)] == c, (d, v)
    assert sum(vc.values()) == sum(len(t) for t in raw.values())


# ---- histogram sort (sorted RLE == value histogram) ----


@pytest.mark.parametrize("codec", ["rle", "dict", "bitpack", "raw"])
@pytest.mark.parametrize("descending", [False, True])
def test_sort_block_differential(codec, descending):
    from rle_array_spark.codecs import decode_block, encode_block
    from rle_array_spark.codecs.reduce import sort_block

    rng = np.random.default_rng(11)
    vals = np.repeat(
        rng.integers(0, 30, 16).astype(np.int32), rng.integers(1, 15, 16)
    )
    c, p = sort_block(codec, encode_block(vals, codec), vals.size,
                      descending=descending)
    exp = np.sort(vals)
    if descending:
        exp = exp[::-1]
    np.testing.assert_array_equal(decode_block(p, c, vals.size), exp)
    # empty block
    c, p = sort_block(codec, encode_block(vals[:0], codec), 0)
    assert decode_block(p, c, 0).size == 0


def test_sort_blocks_df_merges_chunks(spark, sequences):
    from rle_array_spark.engine import decode_df, encode_df, sort_blocks_df

    blocks = encode_df(sequences, codec="auto")
    out = sort_blocks_df(blocks).cache()
    got = {r["doc_id"]: r["tokens"] for r in decode_df(out).collect()}
    raw = {r["doc_id"]: r["tokens"] for r in sequences.select("doc_id", "tokens").collect()}
    nonempty = {d for d, t in raw.items() if len(t)}
    assert set(got.keys()) == nonempty  # all-empty docs have no histogram rows
    for d in nonempty:
        np.testing.assert_array_equal(
            np.asarray(got[d], dtype=np.int64),
            np.sort(np.asarray(raw[d], dtype=np.int64)),
        )
    # output is single-block maximal-runny RLE
    rows = out.select("codec", "n_chunks", "n_values", "n_runs").collect()
    for r in rows:
        assert r["codec"] == "rle" and r["n_chunks"] == 1
    out.unpersist()


# ---- compressed-domain quantiles (histogram -> cumulative pick) ----


def test_source_quantiles_df_matches_numpy(spark, sequences):
    from rle_array_spark.engine import encode_df, source_quantiles_df

    probs = (0.25, 0.5, 0.75)
    blocks = encode_df(sequences, codec="auto")
    got = {r["source"]: r for r in source_quantiles_df(blocks, probs).collect()}
    raw = sequences.select("source", "tokens").collect()
    per_source: dict[str, list] = {}
    for r in raw:
        per_source.setdefault(r["source"], []).extend(r["tokens"])
    for src, toks in per_source.items():
        x = np.sort(np.asarray(toks, dtype=np.int64))
        if x.size == 0:
            assert src not in got  # empty sources have no histogram rows
            continue
        row = got[src]
        assert row["n_toks"] == x.size
        for p in probs:
            k = int(np.ceil(p * x.size))  # 1-based quantile_disc convention
            assert row[f"p{int(p * 100)}"] == x[k - 1], (src, p)


def test_source_quantiles_df_rejects_inexact_prob(spark, sequences):
    from rle_array_spark.engine import encode_df, source_quantiles_df

    blocks = encode_df(sequences.limit(1), codec="auto")
    with pytest.raises(ValueError, match="binary-exact"):
        source_quantiles_df(blocks, probs=(0.3,))
    with pytest.raises(ValueError, match="interpolation"):
        source_quantiles_df(blocks, interpolation="nearest")


def test_source_quantiles_df_linear_matches_numpy(spark, sequences):
    """interpolation='linear' must reproduce numpy's default (pandas-linear)
    quantile — the convention the reference's decode-fallback quantile
    inherits (/root/reference/rle_array/array.py:537-554) — bit-exactly,
    since binary-exact probs keep h=(n-1)p and the fraction exact."""
    from rle_array_spark.engine import encode_df, source_quantiles_df

    probs = (0.25, 0.5, 0.75)
    blocks = encode_df(sequences, codec="auto")
    got = {
        r["source"]: r
        for r in source_quantiles_df(blocks, probs, interpolation="linear").collect()
    }
    raw = sequences.select("source", "tokens").collect()
    per_source: dict[str, list] = {}
    for r in raw:
        per_source.setdefault(r["source"], []).extend(r["tokens"])
    for src, toks in per_source.items():
        x = np.asarray(toks, dtype=np.float64)
        if x.size == 0:
            assert src not in got
            continue
        row = got[src]
        assert row["n_toks"] == x.size
        for p in probs:
            assert row[f"p{int(p * 100)}"] == float(np.quantile(x, p)), (src, p)


# ---- containment lookup (zone-map prune + compressed occurrence count) ----


def test_docs_containing_df_matches_bruteforce(spark, sequences):
    from rle_array_spark.engine import docs_containing_df, encode_df

    blocks = encode_df(sequences, codec="auto")
    raw = {r["doc_id"]: r["tokens"] for r in sequences.select("doc_id", "tokens").collect()}
    for token in (0, 5, 17, 1000, 10**9):
        got = {r["doc_id"]: r["n_hits"] for r in docs_containing_df(blocks, token).collect()}
        want = {}
        for d, toks in raw.items():
            c = int(np.count_nonzero(np.asarray(toks, dtype=np.int64) == token))
            if c:
                want[d] = c
        assert got == want, token


# ---- exact dedup over encoded blocks (payload fingerprints) ----


def test_dedup_exact_encoded_finds_planted_dups(spark):
    from rle_array_spark.engine import dedup_exact_encoded_df, encode_df

    rng = np.random.default_rng(31)
    rows = []
    a = rng.integers(0, 100, size=400).tolist()
    b = rng.integers(0, 5, size=900).tolist()
    c = rng.integers(0, 65000, size=50).tolist()
    rows.append(("d000", "s", a))
    rows.append(("d001", "s", b))
    rows.append(("d002", "s", a))      # dup of d000
    rows.append(("d003", "s", c))
    rows.append(("d004", "s", b))      # dup of d001
    rows.append(("d005", "s", b))      # dup of d001
    rows.append(("d006", "s", a[:-1] + [a[-1] ^ 1]))  # near-miss, NOT a dup
    df = spark.createDataFrame(
        [(d, s, v, len(v)) for d, s, v in rows],
        "doc_id string, source string, tokens array<int>, n_tok int",
    )
    # chunking on: identical docs must fingerprint identically across chunks
    blocks = encode_df(df, codec="auto", chunk_tokens=128)
    groups = {r["representative"]: r for r in dedup_exact_encoded_df(blocks).collect()}
    assert set(groups) == {"d000", "d001"}
    assert groups["d000"]["n_docs"] == 2 and groups["d000"]["n_toks"] == 400
    assert groups["d001"]["n_docs"] == 3 and groups["d001"]["n_toks"] == 900
