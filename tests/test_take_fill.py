"""Reference-complete take semantics at kernel level: arbitrary index
order, negative-index wrapping, and allow_fill (-1 → fill), mirroring
/root/reference/tests/test_algorithms.py test_take_no_fill_ok/raise and
test_take_fill_ok/raise across all three codec families."""

from __future__ import annotations

import warnings

import numpy as np
import pyarrow as pa
import pytest

from rle_array_spark.codecs import CODECS
from rle_array_spark.codecs.reduce import normalize_take_indices, take_any
from rle_array_spark.codecs.strings import (
    decode_strings,
    encode_string_block,
    take_strings,
)
from rle_array_spark.codecs.typed import decode_typed, encode_typed
from rle_array_spark.codecs.typed_zip import take_typed


def _enc(vals, codec):
    return CODECS[codec].encode(np.asarray(vals, dtype=np.int32))


def _expand(rv, rl):
    return np.repeat(rv, rl)


VALS = np.repeat(np.array([7, 3, 3, 9, 1], np.int32), [4, 3, 1, 5, 2])  # n=15


@pytest.mark.parametrize("codec", ["rle", "dict", "bitpack", "raw", "for"])
@pytest.mark.parametrize(
    "idx",
    [
        [0, 2, 4, 9],              # sorted (fast path)
        [9, 0, 4, 2],              # unsorted
        [3, 3, 3, 0, 14],          # repeats out of order
        [-1, -15, 5],              # negative wrapping (no fill)
        [],                        # empty
    ],
)
def test_take_any_no_fill(codec, idx):
    p = _enc(VALS, codec)
    rv, rl = take_any(codec, p, VALS.size, np.array(idx, dtype=np.int64))
    exp = VALS[np.asarray(idx, dtype=np.int64)]
    np.testing.assert_array_equal(_expand(rv, rl), exp)


@pytest.mark.parametrize("codec", ["rle", "dict"])
def test_take_any_fill(codec):
    p = _enc(VALS, codec)
    idx = np.array([2, -1, 0, -1, 14], dtype=np.int64)
    rv, rl = take_any(codec, p, VALS.size, idx, allow_fill=True, fill_value=77)
    np.testing.assert_array_equal(
        _expand(rv, rl), [VALS[2], 77, VALS[0], 77, VALS[14]]
    )


def test_take_any_reference_error_contract():
    p = _enc(VALS, "rle")
    with pytest.raises(IndexError, match="out of bounds"):
        take_any("rle", p, VALS.size, np.array([0, 15]))
    with pytest.raises(IndexError, match="out of bounds"):
        take_any("rle", p, VALS.size, np.array([-16]))
    with pytest.raises(ValueError, match="-2"):
        take_any("rle", p, VALS.size, np.array([-2]), allow_fill=True)
    # non-empty take from empty raises; all-fill from empty is allowed
    pe = _enc(np.zeros(0, np.int32), "rle")
    with pytest.raises(IndexError, match="non-empty"):
        take_any("rle", pe, 0, np.array([0]))
    with pytest.raises(IndexError, match="non-empty"):
        take_any("rle", pe, 0, np.array([-1]))  # no allow_fill
    rv, rl = take_any("rle", pe, 0, np.array([-1, -1]), allow_fill=True, fill_value=5)
    np.testing.assert_array_equal(_expand(rv, rl), [5, 5])
    # documented deviation: empty no-fill take from empty returns empty
    rv, rl = take_any("rle", pe, 0, np.array([], dtype=np.int64))
    assert rv.size == 0


def test_normalize_take_indices_wraps_and_masks():
    idx, fm = normalize_take_indices([-1, -3, 2], 5, False)
    np.testing.assert_array_equal(idx, [4, 2, 2])
    assert not fm.any()
    idx, fm = normalize_take_indices([-1, 0, -1], 5, True)
    np.testing.assert_array_equal(fm, [True, False, True])


TYPED_CASES = [
    ("float", np.repeat(np.array([1.5, -2.0, 8.25]), [5, 4, 6]), None),
    (
        "float_nulls",
        np.repeat(np.array([1.5, -2.0, 8.25]), [5, 4, 6]),
        np.array([True] * 10 + [False] * 5),
    ),
    ("int", np.repeat(np.array([4, 9, 4], np.int64), 5), None),
]


@pytest.mark.parametrize("codec", ["trle", "tdict", "traw", "auto"])
@pytest.mark.parametrize("label,vals,valid", TYPED_CASES)
def test_take_typed_unsorted_and_fill(codec, label, vals, valid):
    n = vals.size
    name, p = encode_typed(np.ascontiguousarray(vals), valid, codec)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        # unsorted, with wrapping
        idx = np.array([8, 0, -1, 8, 3], dtype=np.int64)
        c, pl = take_typed(name, p, n, idx)
        got, gv = decode_typed(c, pl, idx.size)
        exp = vals[idx]
        exp_v = valid[idx] if valid is not None else np.ones(idx.size, bool)
        np.testing.assert_array_equal(got[exp_v], exp[exp_v])
        if gv is not None:
            np.testing.assert_array_equal(gv, exp_v)
        else:
            assert exp_v.all()
        # fill with null
        idxf = np.array([0, -1, 8, -1], dtype=np.int64)
        c, pl = take_typed(name, p, n, idxf, allow_fill=True)
        got, gv = decode_typed(c, pl, idxf.size)
        assert gv is not None and not gv[1] and not gv[3]
        if valid is None or valid[0]:
            assert got[0] == vals[0]
        # fill with a scalar
        c, pl = take_typed(name, p, n, idxf, allow_fill=True, fill_value=3)
        got, gv = decode_typed(c, pl, idxf.size)
        assert got[1] == 3 and got[3] == 3
        assert gv is None or (gv[1] and gv[3])


def test_take_typed_fill_from_empty_and_dtype():
    name, p = encode_typed(np.zeros(0, dtype=np.float64), None, "trle")
    c, pl = take_typed(name, p, 0, np.array([-1, -1]), allow_fill=True)
    got, gv = decode_typed(c, pl, 2)
    assert got.dtype == np.float64 and gv is not None and not gv.any()
    with pytest.raises(IndexError, match="non-empty"):
        take_typed(name, p, 0, np.array([0]))


STR_VALS = ["a"] * 5 + ["bb"] * 4 + [None] * 3 + ["c"] * 3


@pytest.mark.parametrize("codec", ["srle", "sdict", "sraw", "auto"])
def test_take_strings_unsorted_and_fill(codec):
    n = len(STR_VALS)
    name, p = encode_string_block(pa.array(STR_VALS, type=pa.string()), codec)

    def dec(c, pl, k):
        got, gv = decode_strings(c, pl, k)
        if gv is None:
            return list(got)
        return [v if ok else None for v, ok in zip(got, gv)]

    idx = np.array([10, 0, -1, 5], dtype=np.int64)  # unsorted + wrap (-1 → last)
    c, pl = take_strings(name, p, n, idx)
    assert dec(c, pl, idx.size) == [None, "a", "c", "bb"]
    idxf = np.array([0, -1, 9, -1], dtype=np.int64)
    c, pl = take_strings(name, p, n, idxf, allow_fill=True)
    assert dec(c, pl, idxf.size) == ["a", None, None, None]
    c, pl = take_strings(name, p, n, idxf, allow_fill=True, fill_value="FF")
    assert dec(c, pl, idxf.size) == ["a", "FF", None, "FF"]
    with pytest.raises(ValueError):
        take_strings(name, p, n, np.array([-2]), allow_fill=True)
    with pytest.raises(IndexError):
        take_strings(name, p, n, np.array([n]))


def test_take_strings_all_fill_from_empty():
    name, p = encode_string_block(pa.array([], type=pa.string()), "sraw")
    c, pl = take_strings(name, p, 0, np.array([-1, -1]), allow_fill=True,
                         fill_value="z")
    got, gv = decode_strings(c, pl, 2)
    assert list(got) == ["z", "z"] and gv is None
