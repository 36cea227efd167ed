"""Cross-dtype cast operator (reference astype,
/root/reference/rle_array/array.py:445-453,670-681): kernel-level byte
canonicality, run merging, null carry-over, and the DataFrame-level
cast_typed_df round trip."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from rle_array_spark.codecs.typed import (
    cast_typed,
    decode_typed,
    encode_tdict,
    encode_traw,
    encode_trle,
    encode_typed,
    typed_payload_stats,
)

_DIRECT = {"trle": encode_trle, "tdict": encode_tdict, "traw": encode_traw}


def _mk(dtype, rng, n=40, with_nulls=True):
    dtype = np.dtype(dtype)
    if dtype.kind == "b":
        vals = rng.integers(0, 2, n).astype(bool)
    elif dtype.kind == "f":
        vals = np.repeat(rng.normal(0, 100, max(1, n // 4)), 4)[:n].astype(dtype)
    elif dtype.kind == "M":
        vals = np.repeat(
            rng.integers(1_500_000_000_000_000, 1_700_000_000_000_000, max(1, n // 4)), 4
        )[:n].astype("<i8").view(dtype)
    else:
        vals = np.repeat(rng.integers(-100, 100, max(1, n // 4)), 4)[:n].astype(dtype)
    valid = None
    if with_nulls:
        valid = rng.random(n) > 0.2
        if valid.all():
            valid[0] = False
    return vals, valid


CASTS = [
    ("float64", "float32"),
    ("float32", "float64"),
    ("int64", "int32"),
    ("int32", "int64"),
    ("int32", "float64"),
    ("float64", "int32"),   # truncation toward zero
    ("bool", "int8"),
    ("int16", "float32"),
    ("datetime64[us]", "datetime64[ns]"),
]


@pytest.mark.parametrize("codec", ["trle", "tdict", "traw"])
@pytest.mark.parametrize("src,dst", CASTS)
@pytest.mark.parametrize("with_nulls", [False, True])
def test_cast_byte_canonical(codec, src, dst, with_nulls):
    """cast_typed must emit EXACTLY the bytes of encoding the numpy-cast
    array from scratch under the same codec — proves the run-domain trle
    path merges collapsed runs canonically."""
    rng = np.random.default_rng(zlib.crc32(repr((codec, src, dst)).encode()))
    vals, valid = _mk(src, rng, with_nulls=with_nulls)
    name, payload = encode_typed(vals, valid, codec)
    # numpy reference: cast with null slots forward-filled exactly like the
    # payload body (cast commutes with forward-fill, so fill-then-cast works)
    body, _ = decode_typed(name, payload, vals.size)
    expected = body.astype(np.dtype(dst))
    got_name, got = cast_typed(name, payload, vals.size, dst)
    assert got_name == codec
    assert got == _DIRECT[codec](expected, valid)
    out, out_valid = decode_typed(got_name, got, vals.size)
    assert out.dtype == np.dtype(dst)
    np.testing.assert_array_equal(
        out[valid] if valid is not None else out,
        expected[valid] if valid is not None else expected,
    )
    if valid is None:
        assert out_valid is None
    else:
        np.testing.assert_array_equal(out_valid, valid)


def test_cast_trle_merges_collapsing_runs():
    """Adjacent float64 runs closer than float32 resolution collapse into
    ONE run after the cast — n_runs must shrink and the payload must stay
    canonical (no duplicate adjacent run values)."""
    vals = np.repeat(np.array([1.0, 1.0 + 1e-12, 7.5], dtype=np.float64), 5)
    name, payload = encode_typed(vals, None, "trle")
    assert typed_payload_stats(name, payload, vals.size)[0] == 3
    got_name, got = cast_typed(name, payload, vals.size, "float32")
    assert typed_payload_stats(got_name, got, vals.size)[0] == 2
    out, _ = decode_typed(got_name, got, vals.size)
    np.testing.assert_array_equal(out, vals.astype(np.float32))


def test_cast_same_dtype_is_identity():
    vals = np.array([1, 1, 2, 3, 3], dtype=np.int32)
    name, payload = encode_typed(vals, None, "trle")
    got_name, got = cast_typed(name, payload, vals.size, "int32")
    assert (got_name, got) == (name, payload)


def test_cast_all_null_and_empty():
    rng = np.random.default_rng(3)
    vals = rng.normal(size=6)
    valid = np.zeros(6, dtype=bool)
    for codec in ("trle", "tdict", "traw"):
        name, payload = encode_typed(vals, valid, codec)
        got_name, got = cast_typed(name, payload, 6, "float32")
        out, out_valid = decode_typed(got_name, got, 6)
        assert out.dtype == np.dtype("float32")
        assert not out_valid.any()
    empty = np.zeros(0, dtype=np.int64)
    name, payload = encode_typed(empty, None, "trle")
    got_name, got = cast_typed(name, payload, 0, "int32")
    out, _ = decode_typed(got_name, got, 0)
    assert out.size == 0 and out.dtype == np.dtype("int32")


def test_cast_unsupported_target_raises():
    vals = np.ones(4, dtype=np.int32)
    name, payload = encode_typed(vals, None, "trle")
    with pytest.raises(ValueError):
        cast_typed(name, payload, 4, "complex128")


def test_cast_typed_df_roundtrip_and_metadata(spark):
    """float64 → float32 → int32 over DataFrame blocks: decoded values
    equal the two-step numpy cast, stored metadata equals the payload
    audit, and the plan stays exchange-free."""
    from pyspark.sql import functions as F

    from rle_array_spark.typed import (
        cast_typed_df,
        decode_typed_df,
        encode_typed_df,
        typed_block_reductions_df,
    )

    rng = np.random.default_rng(11)
    rows = []
    expect = {}
    for i in range(25):
        n = int(rng.integers(0, 40))
        v = np.repeat(rng.normal(0, 50, max(1, n // 3)), 3)[:n]
        mask = rng.random(n) > 0.15
        pyvals = [float(x) if m else None for x, m in zip(v, mask)]
        rows.append((f"d{i:02d}", "s", pyvals))
        expect[f"d{i:02d}"] = [
            int(np.float64(x).astype(np.float32).astype(np.int32)) if x is not None else None
            for x in pyvals
        ]
    df = spark.createDataFrame(rows, "doc_id string, source string, vals array<double>")
    blocks = encode_typed_df(df, "vals")
    casted = cast_typed_df(cast_typed_df(blocks, "float32"), "int32")

    assert "Exchange" not in casted._jdf.queryExecution().executedPlan().toString()

    got = {r["doc_id"]: r["vals"] for r in decode_typed_df(casted, "int").collect()}
    assert got == expect

    audit = typed_block_reductions_df(casted).select(
        "doc_id", "n_runs", "null_count", "val_min", "val_max"
    )
    stored = casted.select("doc_id", "n_runs", "null_count", "val_min", "val_max")
    def _norm(row):
        return tuple(
            None if isinstance(v, float) and np.isnan(v) else v for v in tuple(row)[1:]
        )

    a = {r["doc_id"]: _norm(r) for r in audit.collect()}
    s = {r["doc_id"]: _norm(r) for r in stored.collect()}
    assert a == s
