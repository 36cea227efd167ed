"""Mixed-dtype whole-table encode/decode (frame-level auto_convert_to_rle
across the three codec families, /root/reference/rle_array/autoconversion.py)."""

from __future__ import annotations

import numpy as np
import pytest

from rle_array_spark.tableframe import decode_table_df, encode_table_df


@pytest.fixture(scope="module")
def mixed_df(spark):
    rows = []
    rng = np.random.default_rng(31)
    for i in range(25):
        n = int(rng.integers(0, 40))
        toks = [int(x) for x in rng.integers(0, 9, n)]
        vals = [None if rng.random() < 0.2 else float(np.round(rng.normal(), 4)) for _ in range(n)]
        tags = [None if rng.random() < 0.1 else f"t{int(rng.integers(0, 4))}" for _ in range(n)]
        rows.append((f"d{i}", "s" if i % 2 else "t", toks, vals, tags))
    return spark.createDataFrame(
        rows,
        "doc_id string, source string, toks array<int>, vals array<double>, tags array<string>",
    )


def test_table_roundtrip_all_kinds(mixed_df):
    blocks = encode_table_df(mixed_df, ["toks", "vals", "tags"])
    out = decode_table_df(blocks, {"toks": "int", "vals": "double", "tags": "string"})
    got = {r["doc_id"]: r for r in out.collect()}
    for r in mixed_df.collect():
        g = got[r["doc_id"]]
        assert g["toks"] == r["toks"], r["doc_id"]
        assert g["tags"] == r["tags"], r["doc_id"]
        a, b = g["vals"], r["vals"]
        assert len(a) == len(b)
        for x, y in zip(a, b):
            assert (x is None) == (y is None)
            if x is not None:
                assert x == y or (np.isnan(x) and np.isnan(y))


def test_table_blocks_metadata(mixed_df):
    blocks = encode_table_df(mixed_df, ["toks", "vals", "tags"])
    cols = set(blocks.columns)
    assert {"toks__codec", "toks__tok_sum", "vals__vtype", "vals__null_count",
            "tags__card", "tags__n_runs"} <= cols
    rows = {r["doc_id"]: r for r in blocks.collect()}
    raw = {r["doc_id"]: r for r in mixed_df.collect()}
    for doc_id, r in rows.items():
        assert r["toks__n_values"] == len(raw[doc_id]["toks"])
        assert r["vals__null_count"] == sum(v is None for v in raw[doc_id]["vals"])
        tags = [t for t in raw[doc_id]["tags"] if t is not None]
        assert r["tags__card"] == len(set(tags))


def test_table_encode_plan_is_narrow(spark, mixed_df):
    from tests.test_plans import explain_str

    blocks = encode_table_df(mixed_df, ["toks", "vals", "tags"])
    out = decode_table_df(blocks, {"toks": "int", "vals": "double", "tags": "string"})
    assert "Exchange" not in explain_str(out)


def test_table_rejects_non_array_column(spark):
    df = spark.createDataFrame(
        [("a", "s", 1)], "doc_id string, source string, x int"
    )
    with pytest.raises(ValueError, match="array"):
        encode_table_df(df, ["x"])
