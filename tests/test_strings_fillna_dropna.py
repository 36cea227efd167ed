"""String-family dropna / fillna (object-dtype analog of the typed ops;
reference _algorithms.py:174-199, array.py:902-911 over str/None arrays)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from rle_array_spark.codecs.strings import (
    decode_strings,
    dropna_strings,
    encode_string_block,
    fillna_strings,
    string_payload_stats,
)

CASES = [
    ["a", "a", None, "b", "b", None, None, "a"],
    [None, None, "x", "x", "y"],          # leading nulls
    [None, None, None],                   # all null
    ["a", "b", "c", "d"],                 # no nulls
    [],
    ["", None, "", "z"],                  # empty string != null
    ["aa"] * 6 + [None] * 3 + ["aa"] * 4, # null run bridging equal runs
]
CODECS = ["srle", "sdict", "sraw", "sfsst", "auto"]


def _enc(vals, codec):
    return encode_string_block(pa.array(vals, type=pa.string()), codec)


@pytest.mark.parametrize("codec", CODECS)
@pytest.mark.parametrize("case", range(len(CASES)))
def test_dropna_strings(codec, case):
    vals = CASES[case]
    name, payload = _enc(vals, codec)
    got_name, got, new_n = dropna_strings(name, payload, len(vals))
    expected = [v for v in vals if v is not None]
    assert new_n == len(expected)
    out, out_valid = decode_strings(got_name, got, new_n)
    assert list(out) == expected
    assert out_valid is None
    # stats of the result: null-free, card = distinct survivors
    r, nc, k, lo, hi = string_payload_stats(got_name, got, new_n)
    assert nc == 0
    assert k == len(set(expected))
    if expected:
        assert (lo, hi) == (min(expected), max(expected))


@pytest.mark.parametrize("codec", CODECS)
@pytest.mark.parametrize("case", range(len(CASES)))
def test_fillna_strings_value(codec, case):
    vals = CASES[case]
    name, payload = _enc(vals, codec)
    got_name, got = fillna_strings(name, payload, len(vals), value="FILL")
    expected = [v if v is not None else "FILL" for v in vals]
    out, out_valid = decode_strings(got_name, got, len(vals))
    assert list(out) == expected
    assert out_valid is None or out_valid.all()


@pytest.mark.parametrize("codec", CODECS)
def test_fillna_strings_value_existing_table_entry(codec):
    """Filling with a value already in the dictionary must reuse its code."""
    vals = ["a", None, "b", None, "a"]
    name, payload = _enc(vals, codec)
    got_name, got = fillna_strings(name, payload, 5, value="a")
    out, _ = decode_strings(got_name, got, 5)
    assert list(out) == ["a", "a", "b", "a", "a"]


@pytest.mark.parametrize("codec", CODECS)
@pytest.mark.parametrize("case", range(len(CASES)))
def test_fillna_strings_ffill(codec, case):
    vals = CASES[case]
    name, payload = _enc(vals, codec)
    got_name, got = fillna_strings(name, payload, len(vals), method="ffill")
    expected, last = [], None
    for v in vals:
        last = v if v is not None else last
        expected.append(last)
    out, out_valid = decode_strings(got_name, got, len(vals))
    for i, e in enumerate(expected):
        if e is None:
            assert out_valid is not None and not out_valid[i]
        else:
            assert (out_valid is None or out_valid[i]) and out[i] == e
    # header-only rewrite for the code-backed codecs (body untouched);
    # sraw/sfsst bodies store nulls as "" and must rewrite + re-choose
    if name in ("srle", "sdict"):
        assert got_name == name


@pytest.mark.parametrize("codec", CODECS)
def test_fillna_strings_bfill(codec):
    vals = [None, "b", None, None, "c", None]
    name, payload = _enc(vals, codec)
    got_name, got = fillna_strings(name, payload, 6, method="bfill")
    out, out_valid = decode_strings(got_name, got, 6)
    assert list(out[:5]) == ["b", "b", "c", "c", "c"]
    assert out_valid is not None and not out_valid[5]  # trailing stays null


def test_fillna_strings_arg_validation():
    name, payload = _enc(["a"], "sdict")
    with pytest.raises(ValueError):
        fillna_strings(name, payload, 1)
    with pytest.raises(ValueError):
        fillna_strings(name, payload, 1, value="x", method="ffill")


def test_string_fillna_dropna_df(spark):
    from rle_array_spark.strings import (
        decode_strings_df,
        dropna_strings_df,
        encode_strings_df,
        fillna_strings_df,
    )

    rng = np.random.default_rng(41)
    words = ["red", "green", "blue", ""]
    rows, exp_drop, exp_fill = [], {}, {}
    for i in range(20):
        n = int(rng.integers(0, 25))
        vals = [
            None if rng.random() < 0.25 else words[int(rng.integers(0, 4))]
            for _ in range(n)
        ]
        d = f"d{i:02d}"
        rows.append((d, "s", vals))
        exp_drop[d] = [v for v in vals if v is not None]
        exp_fill[d] = [v if v is not None else "?" for v in vals]
    df = spark.createDataFrame(rows, "doc_id string, source string, vals array<string>")
    blocks = encode_strings_df(df).persist()

    dropped = dropna_strings_df(blocks)
    assert "Exchange" not in dropped._jdf.queryExecution().executedPlan().toString()
    got = {r["doc_id"]: r["vals"] for r in decode_strings_df(dropped).collect()}
    assert got == exp_drop
    meta = {r["doc_id"]: (r["n_values"], r["null_count"]) for r in dropped.collect()}
    assert meta == {d: (len(v), 0) for d, v in exp_drop.items()}

    filled = fillna_strings_df(blocks, value="?")
    got = {r["doc_id"]: r["vals"] for r in decode_strings_df(filled).collect()}
    assert got == exp_fill
    blocks.unpersist()


@pytest.mark.parametrize("codec", ["srle", "sdict"])
@pytest.mark.parametrize("case", range(len(CASES)))
def test_fillna_value_byte_canonical(codec, case):
    """fillna(value) on dict-backed codecs must emit the same bytes as
    encoding the filled values from scratch (first-occurrence table order,
    unreferenced entries pruned) — the cross-path byte-determinism contract
    fingerprint/dedup comparisons rely on."""
    vals = CASES[case]
    if not any(v is None for v in vals):
        pytest.skip("null-free block: fillna is an identity return by contract")
    name, payload = _enc(vals, codec)
    got_name, got = fillna_strings(name, payload, len(vals), value="FILL")
    filled = [v if v is not None else "FILL" for v in vals]
    if got_name in ("srle", "sdict"):
        # fresh encode restricted to the same srle-vs-sdict chooser
        from rle_array_spark.codecs.strings import encode_sdict, encode_srle

        arr = pa.array(filled, type=pa.string())
        rle_p, dict_p = encode_srle(arr), encode_sdict(arr)
        want_name, want = (
            ("srle", rle_p) if len(rle_p) <= len(dict_p) else ("sdict", dict_p)
        )
        assert (got_name, got) == (want_name, want)


def test_fillna_value_byte_canonical_new_table_entry():
    """The regression shape: fill value absent from the table and first
    appearing BEFORE other values — appearance order must win over
    append-at-end."""
    from rle_array_spark.codecs.strings import encode_sdict, encode_srle

    vals = [None, "b", None, "b"]
    name, payload = _enc(vals, "sdict")
    got_name, got = fillna_strings(name, payload, 4, value="a")
    arr = pa.array(["a", "b", "a", "b"], type=pa.string())
    rle_p, dict_p = encode_srle(arr), encode_sdict(arr)
    want_name, want = ("srle", rle_p) if len(rle_p) <= len(dict_p) else ("sdict", dict_p)
    assert (got_name, got) == (want_name, want)


def test_rewrite_raw_bytes_exact(spark):
    """_strings_rewrite_df must recompute raw_bytes with the encode path's
    exact accounting (valid value bytes + 4*n), not an offsets-only floor —
    an identity rewrite (fillna on a null-free block) keeps raw_bytes."""
    from pyspark.sql import functions as F

    from rle_array_spark.strings import encode_strings_df, fillna_strings_df

    rows = [("d1", "s", ["alpha", "beta", "alpha", None]),
            ("d2", "s", ["xx", "yy", "zz"])]  # null-free: identity rewrite
    df = spark.createDataFrame(rows, "doc_id string, source string, vals array<string>")
    blocks = encode_strings_df(df)
    before = {r["doc_id"]: r["raw_bytes"] for r in blocks.collect()}
    after_df = fillna_strings_df(blocks, value="beta")
    after = {r["doc_id"]: r["raw_bytes"] for r in after_df.collect()}
    # d2 has no nulls: raw_bytes must be unchanged (2+2+2 value bytes + 4*3)
    assert after["d2"] == before["d2"] == 6 + 4 * 3
    # d1's null becomes "beta": value bytes 5+4+5+4, offsets 4*4
    assert after["d1"] == 18 + 16
