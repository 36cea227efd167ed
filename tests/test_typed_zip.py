"""Typed union-grid zips: differential vs decode → numpy op → mask combine
(reference binary operators across dtypes with null propagation,
/root/reference/tests/test_operators.py)."""

from __future__ import annotations

import numpy as np
import pytest

from rle_array_spark.codecs.typed import decode_typed, encode_typed
from rle_array_spark.codecs.typed_zip import (
    COMPARISON_OPS,
    TYPED_ZIP_OPS,
    zip_typed_blocks,
)


def _mk(vals, mask, codec):
    vals = np.ascontiguousarray(vals)
    return encode_typed(vals, mask, codec)


def _pairs():
    rng = np.random.default_rng(41)
    n = 240
    runny = np.repeat(rng.normal(size=8), 30)
    noisy = rng.normal(size=n)
    nanny = noisy.copy()
    nanny[rng.random(n) < 0.3] = np.nan
    m1 = rng.random(n) > 0.2
    m2 = rng.random(n) > 0.2
    ints = rng.integers(0, 5, n).astype(np.int64)
    intr = np.repeat(rng.integers(0, 9, 12), 20).astype(np.int64)
    return [
        ("float_runny_runny", runny, None, np.roll(runny, 7), None),
        ("float_runny_noisy", runny, None, noisy, None),
        ("float_nan_masks", nanny, m1, noisy, m2),
        ("float_one_masked", runny, m1, noisy, None),
        ("int_runny", intr, None, np.roll(intr, 3), None),
        ("int_masked", ints, m1, intr, m2),
    ]


@pytest.mark.parametrize("codec_a", ["trle", "tdict", "traw", "auto"])
@pytest.mark.parametrize("op", sorted(TYPED_ZIP_OPS))
def test_zip_typed_differential(codec_a, op):
    for label, va, ma, vb, mb in _pairs():
        if op == "div" and va.dtype.kind != "f":
            continue  # int true-div leaves the dtype; float-only here
        na, pa_ = _mk(va, ma, codec_a)
        nb, pb_ = _mk(vb, mb, "auto")
        name, payload = zip_typed_blocks(na, pa_, nb, pb_, va.size, op)
        got, valid = decode_typed(name, payload, va.size)
        exp = TYPED_ZIP_OPS[op](va, vb)
        if op in COMPARISON_OPS:
            exp = exp.astype(np.bool_)
        if exp.dtype.kind == "f":
            # engine arithmetic canonicalizes NaN payloads (numpy's own
            # choice is SIMD-width-dependent); pin exp identically
            exp = exp.copy()
            exp[np.isnan(exp)] = np.nan
        exp_mask = None
        if ma is not None or mb is not None:
            exp_mask = (ma if ma is not None else np.ones(va.size, bool)) & (
                mb if mb is not None else np.ones(vb.size, bool)
            )
        if exp_mask is None:
            assert valid is None or valid.all(), label
            np.testing.assert_array_equal(
                got.view(np.uint8 if got.dtype.kind == "b" else got.dtype),
                exp.view(np.uint8 if exp.dtype.kind == "b" else exp.dtype),
                err_msg=f"{label} {op}",
            )
        else:
            vgot = np.ones(va.size, bool) if valid is None else valid
            np.testing.assert_array_equal(vgot, exp_mask, err_msg=f"{label} {op} mask")
            # compare only valid slots (null slots carry fillers by design)
            ga, ea = got[exp_mask], exp[exp_mask]
            if ga.dtype.kind == "f":
                np.testing.assert_array_equal(
                    ga.view("<u8"), ea.view("<u8"), err_msg=f"{label} {op}"
                )
            else:
                np.testing.assert_array_equal(ga, ea, err_msg=f"{label} {op}")


def test_zip_typed_dtype_mismatch_raises():
    na, pa_ = _mk(np.zeros(4, np.float64), None, "auto")
    nb, pb_ = _mk(np.zeros(4, np.int64), None, "auto")
    with pytest.raises(ValueError, match="dtype mismatch"):
        zip_typed_blocks(na, pa_, nb, pb_, 4, "add")


def test_zip_typed_empty():
    na, pa_ = _mk(np.zeros(0, np.float64), None, "auto")
    name, payload = zip_typed_blocks(na, pa_, na, pa_, 0, "add")
    got, valid = decode_typed(name, payload, 0)
    assert got.size == 0


def test_zip_typed_df_roundtrip(spark):
    from pyspark.sql import functions as F

    from rle_array_spark.typed import decode_typed_df, encode_typed_df, zip_typed_df

    rng = np.random.default_rng(43)
    rows_a, rows_b = [], []
    for i in range(15):
        n = int(rng.integers(0, 50))
        a = [None if rng.random() < 0.2 else float(np.round(rng.normal(), 3)) for _ in range(n)]
        b = [None if rng.random() < 0.2 else float(np.round(rng.normal(), 3)) for _ in range(n)]
        rows_a.append((f"d{i}", "s", a))
        rows_b.append((f"d{i}", "s", b))
    schema = "doc_id string, source string, vals array<double>"
    da = spark.createDataFrame(rows_a, schema)
    db = spark.createDataFrame(rows_b, schema)
    ba = encode_typed_df(da, codec="auto")
    bb = encode_typed_df(db, codec="auto")
    summed = zip_typed_df(ba, bb, "add")
    out = {r["doc_id"]: r["vals"] for r in decode_typed_df(summed, "double").collect()}
    for (doc_id, _, a), (_, _, b) in zip(rows_a, rows_b):
        exp = [None if (x is None or y is None) else x + y for x, y in zip(a, b)]
        got = out[doc_id]
        assert len(got) == len(exp)
        for g, e in zip(got, exp):
            assert (g is None) == (e is None)
            if g is not None:
                assert g == pytest.approx(e, abs=0)
    # comparison op → bool blocks with the same null propagation
    ltb = zip_typed_df(ba, bb, "lt")
    assert ltb.select("vtype").distinct().collect() == [("bool",)]
    out2 = {r["doc_id"]: r["vals"] for r in decode_typed_df(ltb, "boolean").collect()}
    for (doc_id, _, a), (_, _, b) in zip(rows_a, rows_b):
        exp = [None if (x is None or y is None) else (x < y) for x, y in zip(a, b)]
        assert out2[doc_id] == exp, doc_id


def test_zip_typed_df_post_chain_differential(spark):
    """``post`` steps fused into the zip kernel are byte-identical to
    composing the same steps after the zip: (a+b)*3-100, (a-b)>=0 with a
    trailing comparison, and invert over a comparison zip's bool blocks."""
    from rle_array_spark.typed import (
        encode_typed_df,
        transform_typed_chain_df,
        transform_typed_df,
        zip_typed_df,
    )

    rng = np.random.default_rng(81)
    rows_a, rows_b = [], []
    for i in range(12):
        n = int(rng.integers(0, 120))
        reps_a = np.repeat(rng.integers(-20, 20, n // 6 + 1), 6)[:n]
        reps_b = np.repeat(rng.integers(-20, 20, n // 4 + 1), 4)[:n]
        ma = rng.random(n) < 0.15
        mb = rng.random(n) < 0.15
        rows_a.append((f"d{i}", "s", [None if m else int(v) for v, m in zip(reps_a, ma)]))
        rows_b.append((f"d{i}", "s", [None if m else int(v) for v, m in zip(reps_b, mb)]))
    schema = "doc_id string, source string, vals array<long>"
    ba = encode_typed_df(spark.createDataFrame(rows_a, schema)).persist()
    bb = encode_typed_df(spark.createDataFrame(rows_b, schema)).persist()

    def payloads(df):
        return {r["doc_id"]: (r["codec"], bytes(r["payload"])) for r in df.collect()}

    cases = [
        ("add", [("mul", 3), ("sub", 100)]),
        ("sub", [("ge", 0)]),
        ("lt", [("invert", None)]),
    ]
    for op, steps in cases:
        fused = payloads(zip_typed_df(ba, bb, op, post=steps))
        expected = payloads(transform_typed_chain_df(zip_typed_df(ba, bb, op), steps))
        assert fused == expected, (op, steps)

    # single-step post against the single-op transform too
    fused = payloads(zip_typed_df(ba, bb, "add", post=[("rsub", 50)]))
    expected = payloads(transform_typed_df(zip_typed_df(ba, bb, "add"), "rsub", 50))
    assert fused == expected

    with pytest.raises(ValueError, match="last chain step"):
        zip_typed_df(ba, bb, "add", post=[("ge", 0), ("abs", None)])
    # arithmetic post on a comparison zip would silently emit non-bool
    # blocks — must fail at the driver
    with pytest.raises(ValueError, match="bool domain"):
        zip_typed_df(ba, bb, "lt", post=[("add", 1)])
    ba.unpersist(); bb.unpersist()


def test_zip_typed_fastpath_contract():
    """trle⊕trle must be silent; any non-trle input must raise
    PerformanceWarning (escalated to error here, the fastpath discipline of
    tests/test_fastpath.py)."""
    import warnings

    from rle_array_spark.codecs.core import PerformanceWarning

    runny = np.repeat(np.arange(5, dtype=np.float64), 40)
    na, pa_ = _mk(runny, None, "trle")
    nb, pb_ = _mk(np.roll(runny, 3), None, "trle")
    with warnings.catch_warnings():
        warnings.simplefilter("error", PerformanceWarning)
        zip_typed_blocks(na, pa_, nb, pb_, runny.size, "add")  # silent

    nc, pc_ = _mk(runny, None, "traw")
    with pytest.warns(PerformanceWarning, match="decodes its value stream"):
        zip_typed_blocks(na, pa_, nc, pc_, runny.size, "add")


@pytest.mark.parametrize("codec", ["trle", "tdict", "traw", "auto"])
def test_take_typed_differential(codec):
    import warnings

    from rle_array_spark.codecs.typed_zip import take_typed

    rng = np.random.default_rng(61)
    cases = [
        (np.repeat(rng.normal(size=7), 40), None),
        (rng.normal(size=200), rng.random(200) > 0.25),
        (rng.integers(0, 4, 300).astype(np.int64), None),
        (np.zeros(0, np.float64), None),
    ]
    idx_builders = [
        lambda n: np.arange(0, n, 3),
        lambda n: np.arange(2, n, 7),
        lambda n: np.arange(n),
        lambda n: np.zeros(0, dtype=np.int64),
    ]
    for vals, mask in cases:
        vals = np.ascontiguousarray(vals)
        name, payload = encode_typed(vals, mask, codec)
        for build in idx_builders:
            idx = build(vals.size)
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                tname, tpayload = take_typed(name, payload, vals.size, idx)
            got, gvalid = decode_typed(tname, tpayload, idx.size)
            exp = vals[idx]
            exp_mask = mask[idx] if mask is not None else None
            if exp_mask is not None and exp_mask.all():
                exp_mask = None
            if exp_mask is None:
                assert gvalid is None
            else:
                np.testing.assert_array_equal(gvalid, exp_mask)
            keep = exp_mask if exp_mask is not None else np.ones(idx.size, bool)
            w = vals.dtype.itemsize
            bits = {1: "<u1", 2: "<u2", 4: "<u4", 8: "<u8"}[w]
            np.testing.assert_array_equal(
                np.ascontiguousarray(got).view(bits)[keep],
                np.ascontiguousarray(exp).view(bits)[keep],
            )


@pytest.mark.parametrize("codec", ["trle", "tdict", "traw", "auto"])
def test_reverse_typed_differential(codec):
    import warnings

    from rle_array_spark.codecs.typed_zip import reverse_typed

    rng = np.random.default_rng(67)
    for vals, mask in [
        (np.repeat(rng.normal(size=5), 30), rng.random(150) > 0.3),
        (rng.integers(0, 9, 120).astype(np.int64), None),
    ]:
        vals = np.ascontiguousarray(vals)
        name, payload = encode_typed(vals, mask, codec)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            rname, rpayload = reverse_typed(name, payload, vals.size)
        got, gvalid = decode_typed(rname, rpayload, vals.size)
        exp_mask = mask[::-1] if mask is not None else None
        keep = exp_mask if exp_mask is not None else np.ones(vals.size, bool)
        if exp_mask is None:
            assert gvalid is None or gvalid.all()
        else:
            np.testing.assert_array_equal(gvalid, exp_mask)
        np.testing.assert_array_equal(
            np.ascontiguousarray(got).view("<u8" if vals.dtype.itemsize == 8 else "<u4")[keep],
            np.ascontiguousarray(vals[::-1]).view("<u8" if vals.dtype.itemsize == 8 else "<u4")[keep],
        )
