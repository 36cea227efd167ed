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
