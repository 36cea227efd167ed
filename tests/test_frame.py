"""Frame-level multi-column encode: the reference's auto_convert_to_rle
frame semantics (/root/reference/rle_array/autoconversion.py:40-130) as a
wide blocks table, plus join-free cross-column zip."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rle_array_spark.engine import decode_frame_df, encode_frame_df, zip_frame_df


@pytest.fixture(scope="module")
def two_col_df(spark, sequences):
    # second token column derived in-plan: tokens mod 7 (same length per row)
    return sequences.select(
        "doc_id",
        "source",
        "tokens",
        F.expr("transform(tokens, x -> x % 7)").alias("mods"),
    )


def test_frame_roundtrip_both_columns(spark, two_col_df):
    wide = encode_frame_df(two_col_df, ["tokens", "mods"])
    decoded = decode_frame_df(wide, ["tokens", "mods"])
    got = {r["doc_id"]: r for r in decoded.collect()}
    for r in two_col_df.collect():
        g = got[r["doc_id"]]
        assert list(g["tokens"]) == list(r["tokens"])
        assert list(g["mods"]) == list(r["mods"])


def test_frame_per_column_codec_choice(spark, two_col_df):
    """Each column gets its own codec per row: `mods` has range [0,7) so its
    blocks must never be raw for non-trivial rows, independent of `tokens`."""
    wide = encode_frame_df(two_col_df, ["tokens", "mods"]).cache()
    rows = wide.select("tokens__codec", "mods__codec", "tokens__n_values").collect()
    assert any(r["tokens__codec"] != r["mods__codec"] for r in rows)
    for r in rows:
        if r["tokens__n_values"] >= 64:
            assert r["mods__codec"] != "raw"  # 3-bit values always compress
    # metadata is truthful per column
    bad = wide.filter(
        (F.col("mods__tok_max") >= 7) | (F.col("mods__tok_min") < 0)
    ).count()
    assert bad == 0
    wide.unpersist()


def test_zip_frame_join_free_plan_and_values(spark, two_col_df):
    """zip across co-located encoded columns: NO exchange in the plan, and
    decoded result equals tokens + tokens % 7."""
    from tests.test_plans import explain_str

    wide = encode_frame_df(two_col_df, ["tokens", "mods"])
    zipped = zip_frame_df(wide, "tokens", "mods", "add", out_col="z")
    plan = explain_str(zipped)
    assert "Exchange" not in plan
    assert "Join" not in plan

    decoded = decode_frame_df(
        zipped.select(
            "doc_id", "source",
            F.col("z__codec").alias("s__codec"),
            F.col("z__payload").alias("s__payload"),
            F.col("z__n_values").alias("s__n_values"),
        ),
        ["s"],
    )
    got = {r["doc_id"]: np.array(r["s"], dtype=np.int64) for r in decoded.collect()}
    for r in two_col_df.select("doc_id", "tokens").collect():
        v = np.array(r["tokens"], dtype=np.int64)
        np.testing.assert_array_equal(got[r["doc_id"]], v + v % 7)


def test_frame_compression_accounting(spark, two_col_df):
    """Σ encoded over both columns ≤ Σ raw (4 B/token/column)."""
    wide = encode_frame_df(two_col_df, ["tokens", "mods"])
    agg = wide.agg(
        F.sum(F.col("tokens__encoded_bytes") + F.col("mods__encoded_bytes")).alias("enc"),
        F.sum((F.col("tokens__n_values") + F.col("mods__n_values")).cast("long") * 4).alias("raw"),
    ).collect()[0]
    assert agg["enc"] < agg["raw"]


def test_filter_frame_join_free_plan_and_values(spark, two_col_df):
    """Compressed-domain relational row filter: a zip-comparison mask
    gathers EVERY encoded column of the wide row — df[df.mods < 3] — with
    no exchange in the plan; decoded columns equal numpy boolean indexing
    and per-column metadata reflects the post-filter blocks."""
    from rle_array_spark.engine import filter_frame_df
    from tests.test_plans import explain_str

    wide = encode_frame_df(two_col_df, ["tokens", "mods"])
    three = two_col_df.select(
        "doc_id", "source",
        F.expr("transform(tokens, x -> 3)").alias("threes"),
    )
    # mask column lives in the same wide row: encode all three columns
    wide3 = encode_frame_df(
        two_col_df.join(three, ["doc_id", "source"]),
        ["tokens", "mods", "threes"],
    )
    masked = filter_frame_df(
        zip_frame_df(wide3, "mods", "threes", "lt", out_col="m"), "m"
    )
    plan = explain_str(masked)
    # the input join is upstream of encode; from the wide table on, the
    # comparison + filter stages add no exchange
    assert "m__codec" not in masked.columns  # mask dropped
    decoded = decode_frame_df(masked, ["tokens", "mods", "threes"])
    got = {r["doc_id"]: r for r in decoded.collect()}
    for r in two_col_df.collect():
        toks = np.array(r["tokens"], dtype=np.int64)
        mods = np.array(r["mods"], dtype=np.int64)
        keep = mods < 3
        g = got[r["doc_id"]]
        np.testing.assert_array_equal(np.array(g["tokens"], np.int64), toks[keep])
        np.testing.assert_array_equal(np.array(g["mods"], np.int64), mods[keep])
        assert list(g["threes"]) == [3] * int(keep.sum())
    # metadata truthfulness on the filtered frame
    rows = masked.select(
        "doc_id", "tokens__n_values", "mods__n_values", "threes__n_values",
        "mods__tok_max",
    ).collect()
    for r in rows:
        assert r["tokens__n_values"] == r["mods__n_values"] == r["threes__n_values"]
        assert r["mods__tok_max"] < 3 or r["mods__n_values"] == 0


def test_filter_frame_plan_no_exchange_from_encoded(spark, two_col_df):
    """From an already-encoded wide frame, comparison + filter must add no
    Exchange and no Join (pure mapInArrow chain)."""
    from rle_array_spark.engine import filter_frame_df
    from tests.test_plans import explain_str

    wide = encode_frame_df(two_col_df, ["tokens", "mods"])
    # persist the encode lineage boundary so explain shows only downstream
    wide = wide.localCheckpoint(eager=True)
    masked = filter_frame_df(
        zip_frame_df(wide, "tokens", "mods", "gt", out_col="m"), "m"
    )
    plan = explain_str(masked)
    assert "Exchange" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_filter_frame_keep_mask_and_errors(spark, two_col_df):
    from rle_array_spark.engine import filter_frame_df

    wide = encode_frame_df(two_col_df, ["tokens", "mods"])
    with pytest.raises(ValueError, match="mask column"):
        filter_frame_df(wide, "nope")
    zipped = zip_frame_df(wide, "mods", "mods", "eq", out_col="m")
    kept = filter_frame_df(zipped, "m", drop_mask=False)
    assert "m__codec" in kept.columns
    # mask == all-ones after filtering by itself
    r = kept.select("m__tok_min", "m__tok_max", "m__n_values",
                    "tokens__n_values").collect()
    for row in r:
        if row["m__n_values"]:
            assert row["m__tok_min"] == 1 and row["m__tok_max"] == 1
        assert row["m__n_values"] == row["tokens__n_values"]


def test_transform_frame_df_inplace_and_append(spark, two_col_df):
    """Per-column scalar chain over a wide frame row: in-place rewrite and
    appended column both equal numpy, stay Exchange-free, and leave the
    other columns' bytes untouched."""
    import numpy as np

    from rle_array_spark.engine import transform_frame_df
    from tests.test_plans import explain_str

    wide = encode_frame_df(two_col_df, ["tokens", "mods"]).cache()
    steps = [("mul", 3), ("mod", 251)]

    out = transform_frame_df(wide, "mods", steps)
    assert "Exchange" not in explain_str(out)
    assert set(out.columns) == set(wide.columns)
    got = {r["doc_id"]: r["mods"] for r in decode_frame_df(out, ["mods"]).collect()}
    raw = {r["doc_id"]: r["tokens"] for r in two_col_df.select("doc_id", "tokens").collect()}
    for doc_id, tokens in raw.items():
        v = np.array(tokens, dtype=np.int64)
        np.testing.assert_array_equal(
            np.array(got[doc_id], dtype=np.int64), (v % 7) * 3 % 251
        )
    # untouched column passes through byte-identical
    before = {r["doc_id"]: bytes(r["tokens__payload"]) for r in wide.collect()}
    after = {r["doc_id"]: bytes(r["tokens__payload"]) for r in out.collect()}
    assert before == after

    out2 = transform_frame_df(wide, "mods", steps, out_col="m3")
    assert "m3__codec" in out2.columns and "mods__codec" in out2.columns
    got2 = {
        r["doc_id"]: (r["mods"], r["m3"])
        for r in decode_frame_df(out2, ["mods", "m3"]).collect()
    }
    for doc_id, tokens in raw.items():
        v = np.array(tokens, dtype=np.int64)
        m, m3 = got2[doc_id]
        np.testing.assert_array_equal(np.array(m, dtype=np.int64), v % 7)
        np.testing.assert_array_equal(np.array(m3, dtype=np.int64), (v % 7) * 3 % 251)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not in frame"):
        transform_frame_df(wide, "nope", steps)
    with _pytest.raises(ValueError, match="already in frame"):
        transform_frame_df(wide, "mods", steps, out_col="tokens")
    with _pytest.raises(ValueError, match="invalid operand"):
        transform_frame_df(wide, "mods", [("mod", 0)])

    # dict form: N in-place chains in ONE kernel pass
    multi = transform_frame_df(
        wide, {"tokens": [("add", 5)], "mods": [("mul", 2), ("max", 3)]}
    )
    assert "Exchange" not in explain_str(multi)
    gotm = {
        r["doc_id"]: r for r in decode_frame_df(multi, ["tokens", "mods"]).collect()
    }
    for doc_id, tokens in raw.items():
        v = np.array(tokens, dtype=np.int64)
        np.testing.assert_array_equal(
            np.array(gotm[doc_id]["tokens"], dtype=np.int64), v + 5
        )
        np.testing.assert_array_equal(
            np.array(gotm[doc_id]["mods"], dtype=np.int64),
            np.maximum(v % 7 * 2, 3),
        )
    with _pytest.raises(ValueError, match="steps/out_col must be None"):
        transform_frame_df(wide, {"mods": steps}, steps)
    with _pytest.raises(ValueError, match="empty column"):
        transform_frame_df(wide, {})
    wide.unpersist()
