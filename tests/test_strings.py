"""String codec family: round-trip with nulls/unicode/empties, codec choice,
size bound, and the Spark-level encode/decode path (the reference's
object-dtype surface, /root/reference/rle_array/dtype.py:11-27 and
tests/test_algorithms.py:84-133)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from rle_array_spark.codecs.strings import (
    STRING_CODECS,
    decode_strings,
    encode_sraw,
    encode_string_block,
    encode_string_block_stats,
)

CASES = {
    "runny": ["a"] * 30 + ["bb"] * 20 + ["a"] * 10,
    "distinct": [f"val-{i}" for i in range(50)],
    "low_card": [f"k{i % 4}" for i in range(200)],
    "with_nulls": ["x", None, None, "y", "y", None, "x"],
    "leading_null": [None, None, "x", "x"],
    "all_null": [None, None, None],
    "unicode": ["héllo", "wörld", "héllo", "日本語", ""],
    "empty_vs_null": ["", None, "", "a"],
    "empty": [],
    "single": ["only"],
}


def _roundtrip(vals, codec):
    arr = pa.array(vals, type=pa.string())
    name, payload = encode_string_block(arr, codec)
    out, valid = decode_strings(name, payload, len(vals))
    if valid is None:
        return list(out)
    return [v if ok else None for v, ok in zip(out, valid)]


@pytest.mark.parametrize("codec", [*STRING_CODECS, "auto"])
@pytest.mark.parametrize("case", CASES)
def test_string_roundtrip(codec, case):
    vals = CASES[case]
    assert _roundtrip(vals, codec) == vals


def test_string_auto_never_beats_raw_bound():
    for case, vals in CASES.items():
        arr = pa.array(vals, type=pa.string())
        name, payload = encode_string_block(arr, "auto")
        assert len(payload) <= len(encode_sraw(arr)), case


def test_string_auto_picks_sensible_codecs():
    runny = pa.array(["a"] * 500 + ["b"] * 500)
    assert encode_string_block(runny, "auto")[0] == "srle"
    low_card = pa.array([f"k{i % 3}" for i in range(999)])
    assert encode_string_block(low_card, "auto")[0] in ("sdict", "srle")
    # shared-prefix distinct values → the FSST grammar beats raw (and on
    # any ASCII payload the grammar's bit-packed stream alone beats 8-bit
    # raw bytes, so sfsst is the expected winner for distinct ASCII text)
    prefixed = pa.array([f"unique-value-{i:06d}" for i in range(500)])
    assert encode_string_block(prefixed, "auto")[0] == "sfsst"
    # tiny distinct blocks stay raw (no bytes for a grammar to amortize)
    small = pa.array([f"v{i}" for i in range(20)])
    assert encode_string_block(small, "auto")[0] == "sraw"


def test_string_stats_null_run_semantics():
    # nulls forward-fill: x x ∅ ∅ y → runs [x x x x][y] = 2
    arr = pa.array(["x", "x", None, None, "y"])
    name, payload, n_runs, card, nulls = encode_string_block_stats(arr, "auto")
    assert n_runs == 2
    assert card == 2
    assert nulls == 2


def test_encode_decode_strings_df(spark):
    from pyspark.sql import functions as F

    from rle_array_spark.strings import decode_strings_df, encode_strings_df

    rows = [
        ("d1", "s", ["a", "a", "b", None, "b"]),
        ("d2", "s", []),
        ("d3", "t", [None, None]),
        ("d4", "t", ["héllo", "", "héllo"] * 40),
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, vals array<string>")
    blocks = encode_strings_df(df, codec="auto")
    got_blocks = {r["doc_id"]: r for r in blocks.collect()}
    assert got_blocks["d1"]["null_count"] == 1
    assert got_blocks["d1"]["card"] == 2
    assert got_blocks["d3"]["n_values"] == 2
    assert got_blocks["d4"]["encoded_bytes"] < got_blocks["d4"]["raw_bytes"]
    assert got_blocks["d4"]["val_min"] == "" and got_blocks["d4"]["val_max"] == "héllo"

    out = {r["doc_id"]: r["vals"] for r in decode_strings_df(blocks).collect()}
    for doc_id, _, vals in rows:
        assert out[doc_id] == vals, doc_id


def test_encode_strings_df_forced_codecs_roundtrip(spark):
    from rle_array_spark.strings import decode_strings_df, encode_strings_df

    rows = [("d%d" % i, "s", [f"w{j % 5}" for j in range(i * 7 % 23)]) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id string, source string, vals array<string>")
    for codec in STRING_CODECS:
        blocks = encode_strings_df(df, codec=codec)
        assert blocks.select("codec").distinct().collect() == [(codec,)]
        out = {r["doc_id"]: r["vals"] for r in decode_strings_df(blocks).collect()}
        for doc_id, _, vals in rows:
            assert out[doc_id] == vals, (codec, doc_id)


def test_sfsst_roundtrip_all_cases():
    from rle_array_spark.codecs.strings import encode_sfsst

    for case, vals in CASES.items():
        assert _roundtrip(vals, "sfsst") == vals, case


def test_sfsst_wins_on_shared_substrings():
    # high-cardinality values sharing a long prefix: dictionary stores every
    # distinct value whole, raw stores every byte — the grammar pays
    from rle_array_spark.codecs.strings import encode_sraw

    vals = [f"https://example.com/products/category/item-{i:05d}" for i in range(300)]
    arr = pa.array(vals, type=pa.string())
    name, payload = encode_string_block(arr, "auto")
    assert name == "sfsst"
    assert len(payload) < 0.5 * len(encode_sraw(arr))
    assert _roundtrip(vals, "auto") == vals


@pytest.mark.parametrize("codec", [*STRING_CODECS, "auto"])
def test_take_and_reverse_strings_differential(codec):
    from rle_array_spark.codecs.strings import (
        encode_string_block,
        reverse_strings,
        take_strings,
    )

    for case, vals in CASES.items():
        arr = pa.array(vals, type=pa.string())
        name, payload = encode_string_block(arr, codec)
        n = len(vals)
        for idx in (list(range(0, n, 3)), list(range(1, n, 2)), list(range(n)), []):
            import numpy as np

            tname, tpayload = take_strings(name, payload, n, np.array(idx, dtype=np.int64))
            out, valid = decode_strings(tname, tpayload, len(idx))
            got = (
                list(out) if valid is None
                else [v if ok else None for v, ok in zip(out, valid)]
            )
            assert got == [vals[i] for i in idx], (case, codec, idx[:3])
        rname, rpayload = reverse_strings(name, payload, n)
        out, valid = decode_strings(rname, rpayload, n)
        got = (
            list(out) if valid is None
            else [v if ok else None for v, ok in zip(out, valid)]
        )
        assert got == vals[::-1], (case, codec)


def test_zip_strings_compare_kernel():
    import warnings

    from rle_array_spark.codecs.strings import encode_string_block, zip_strings_compare
    from rle_array_spark.codecs.typed import decode_typed
    from rle_array_spark.codecs.core import PerformanceWarning

    a = ["x", "y", None, "z", "x"] * 20
    b = ["x", "n", "y", None, "x"] * 20
    pa_a = encode_string_block(pa.array(a, type=pa.string()), "sdict")
    pa_b = encode_string_block(pa.array(b, type=pa.string()), "srle")
    with warnings.catch_warnings():
        warnings.simplefilter("error", PerformanceWarning)  # code path: silent
        name, payload = zip_strings_compare(*pa_a, *pa_b, len(a), "eq")
    out, valid = decode_typed(name, payload, len(a))
    for i, (x, y) in enumerate(zip(a, b)):
        if x is None or y is None:
            assert not valid[i]
        else:
            assert valid is None or valid[i]
            assert bool(out[i]) == (x == y), i
    # ne is the complement at valid slots
    name2, payload2 = zip_strings_compare(*pa_a, *pa_b, len(a), "ne")
    out2, valid2 = decode_typed(name2, payload2, len(a))
    for i in range(len(a)):
        if valid is None or valid[i]:
            assert bool(out2[i]) == (not bool(out[i]))
    # non-dict pair decodes with a warning
    pa_raw = encode_string_block(pa.array(a, type=pa.string()), "sraw")
    with pytest.warns(PerformanceWarning, match="decodes both value"):
        zip_strings_compare(*pa_raw, *pa_b, len(a), "eq")


def test_zip_strings_df(spark):
    from rle_array_spark.strings import encode_strings_df, zip_strings_df
    from rle_array_spark.typed import decode_typed_df

    rows_a = [("d1", "s", ["a", "b", None, "c"]), ("d2", "s", [])]
    rows_b = [("d1", "s", ["a", "x", "b", None]), ("d2", "s", [])]
    schema = "doc_id string, source string, vals array<string>"
    ba = encode_strings_df(spark.createDataFrame(rows_a, schema))
    bb = encode_strings_df(spark.createDataFrame(rows_b, schema))
    out = zip_strings_df(ba, bb, "eq")
    dec = {r["doc_id"]: r["vals"] for r in decode_typed_df(out, "boolean").collect()}
    assert dec["d1"] == [True, False, None, None]
    assert dec["d2"] == []


def test_string_corrupt_payload_raises_never_wrong():
    """Truncated string payloads must raise, not silently return data."""
    import struct

    vals = ["alpha", None, "beta", "beta", "gamma"] * 20
    arr = pa.array(vals, type=pa.string())
    for codec in STRING_CODECS:
        name, payload = encode_string_block(arr, codec)
        for cut in (1, len(payload) // 2, len(payload) - 1):
            with pytest.raises((ValueError, IndexError, struct.error)):
                out, valid = decode_strings(name, payload[:cut], len(vals))
                assert len(out) == len(vals)
                # a "successful" decode of a truncated payload must at least
                # fail to reproduce the data (checked via ValueError above);
                # reaching here with full-size output means silent corruption
                raise ValueError("decode accepted truncated payload")


def test_transform_strings_kernel_all_codecs():
    """transform_strings must be value-identical to decode→map→re-encode
    across all four string codecs, including colliding outputs (case fold
    merges table entries) and nulls."""
    import pyarrow as pa

    from rle_array_spark.codecs.strings import (
        decode_strings,
        encode_string_block,
        transform_strings,
    )

    words = ["Click", "VIEW", "buy", "Click", None, "view", "BUY", ""] * 25
    arr = pa.array(words, type=pa.string())
    exp = [None if w is None else w.lower() for w in words]
    for codec in ("srle", "sdict", "sraw", "sfsst", "auto"):
        c, p = encode_string_block(arr, codec)
        nc, npay = transform_strings(c, p, len(words), lambda s: s.lower())
        out, valid = decode_strings(nc, npay, len(words))
        got = [
            None if (valid is not None and not valid[i]) else out[i]
            for i in range(len(words))
        ]
        assert got == exp, codec


def test_transform_strings_df_spark(spark):
    """Spark-level: upper() over an encoded string column, nulls preserved,
    then the fused table-domain filter on the mapped values."""
    from rle_array_spark.strings import (
        decode_strings_df,
        encode_strings_df,
        filter_strings_df,
        transform_strings_df,
    )

    rows = [
        ("a", "s", ["x", "X", None, "click", "Click"]),
        ("b", "s", []),
        ("c", "s", ["CLICK"] * 100),
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, vals array<string>")
    up = transform_strings_df(encode_strings_df(df, "vals"), lambda s: s.upper())
    got = {r["doc_id"]: r["vals"] for r in decode_strings_df(up).collect()}
    assert got["a"] == ["X", "X", None, "CLICK", "CLICK"]
    assert got["b"] == [] and got["c"] == ["CLICK"] * 100
    n = {
        r["doc_id"]: r["vals"]
        for r in decode_strings_df(filter_strings_df(up, "eq", "CLICK")).collect()
    }
    assert len(n["a"]) == 2 and len(n["c"]) == 100


@pytest.mark.parametrize("codec", ["srle", "sdict", "sraw", "sfsst", "auto"])
def test_decode_strings_arrow_differential(codec):
    """Arrow-native decode equals the object-path decode + mask across
    codecs, null patterns, unicode, empty strings and empty blocks."""
    import numpy as np
    import pyarrow as pa

    from rle_array_spark.codecs.strings import (
        decode_strings,
        decode_strings_arrow,
        encode_string_block,
    )

    rng = np.random.default_rng(83)
    vocab = ["click", "view", "ümläut✓", "", "a" * 40, "日本語テキスト", "x"]
    cases = []
    for trial in range(12):
        n = int(rng.integers(0, 200))
        vals = [vocab[int(rng.integers(0, len(vocab)))] for _ in range(n)]
        if trial % 3 == 0:  # high-cardinality regime (drives sraw/sfsst)
            vals = [f"doc-{rng.integers(0, 10**9)}-{v}" for v in vals]
        mask = rng.random(n) < 0.25 if trial % 2 else np.zeros(n, bool)
        arr = pa.array(
            [None if m else v for v, m in zip(vals, mask)], type=pa.string()
        )
        cases.append(arr)
    cases.append(pa.array([], type=pa.string()))
    cases.append(pa.array([None, None, None], type=pa.string()))

    for arr in cases:
        name, payload = encode_string_block(arr, codec)
        n = len(arr)
        obj, valid = decode_strings(name, memoryview(payload), n)
        got = decode_strings_arrow(name, memoryview(payload), n)
        assert len(got) == n
        exp = [
            None if (valid is not None and not valid[i]) else obj[i]
            for i in range(n)
        ]
        assert got.to_pylist() == exp, (codec, name, n)
