"""Typed codec tests: the reference's full dtype surface — bool, int
widths, float32/64 with NaN, datetime64 — plus element nulls, as
bit-identical round trips (/root/reference/rle_array/dtype.py:11-27;
float/NaN tests /root/reference/tests/test_algorithms.py:84-133,300-308).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rle_array_spark.codecs.typed import (
    TYPED_CODECS,
    decode_typed,
    encode_typed,
)

DTYPE_SAMPLES = {
    "<f8": np.array([0.0, -0.0, np.nan, np.nan, 1.5, 1.5, np.inf, -np.inf, 5e-324]),
    "<f4": np.array([1.25, 1.25, np.nan, -0.0, 0.0], dtype="<f4"),
    "?": np.array([True, True, False, True] * 8),
    "<i8": np.array([-(2**62), 2**62, 7, 7, 7]),
    "<i4": np.array([-5, -5, 0, 2**31 - 1], dtype="<i4"),
    "<i2": np.array([-3, -3, 9], dtype="<i2"),
    "<M8[ns]": np.array([0, 0, 10**18], dtype="<M8[ns]"),
    "<M8[us]": np.array([0, 10**15, 10**15], dtype="<M8[us]"),
    "<m8[ns]": np.arange(10, dtype="<m8[ns]"),
}


@pytest.mark.parametrize("codec", ("auto",) + TYPED_CODECS)
@pytest.mark.parametrize("dt", sorted(DTYPE_SAMPLES))
def test_bit_identical_roundtrip(codec, dt):
    vals = DTYPE_SAMPLES[dt]
    name, payload = encode_typed(vals, None, codec)
    out, mask = decode_typed(name, payload, vals.size)
    assert out.dtype == vals.dtype
    assert mask is None
    assert out.tobytes() == np.ascontiguousarray(vals).tobytes()


def test_nan_runs_compress():
    """A long NaN run must RLE like any other run — bit-pattern equality,
    the float analog of the reference's null==null change detection
    (_algorithms.py:155-171)."""
    vals = np.repeat(np.array([np.nan, 1.0, np.nan, 2.0]), 1000)
    name, payload = encode_typed(vals, None, "auto")
    assert len(payload) < vals.nbytes // 100
    out, _ = decode_typed(name, payload, vals.size)
    assert out.tobytes() == vals.tobytes()


def test_signed_zero_distinct():
    """-0.0 and +0.0 differ in bits and must round-trip distinctly (a
    value-equality codec would merge them into one run)."""
    vals = np.array([0.0, -0.0, 0.0, -0.0])
    for codec in ("trle", "tdict", "traw"):
        _, payload = encode_typed(vals, None, codec)
        out, _ = decode_typed(codec, payload, 4)
        assert np.signbit(out).tolist() == [False, True, False, True]


@pytest.mark.parametrize("codec", ("auto",) + TYPED_CODECS)
def test_null_mask_roundtrip(codec):
    rng = np.random.default_rng(1)
    vals = rng.normal(size=300)
    mask = rng.random(300) > 0.25
    name, payload = encode_typed(vals, mask, codec)
    out, omask = decode_typed(name, payload, 300)
    assert omask is not None and (omask == mask).all()
    assert out[mask].tobytes() == vals[mask].tobytes()


def test_leading_and_all_null():
    vals = np.array([9.0, 1.0, 1.0, 2.0])
    mask = np.array([False, True, True, True])
    name, payload = encode_typed(vals, mask, "auto")
    out, omask = decode_typed(name, payload, 4)
    assert (omask == mask).all() and out[1:].tolist() == [1.0, 1.0, 2.0]

    mask0 = np.zeros(5, dtype=bool)
    name, payload = encode_typed(np.zeros(5), mask0, "auto")
    out, omask = decode_typed(name, payload, 5)
    assert omask is not None and not omask.any()


def test_null_run_compresses():
    """Nulls are forward-filled in the body, so a null gap inside a run
    must NOT split the run (the reference's null-run semantics)."""
    vals = np.repeat(np.array([3.0, 7.0]), 500)
    mask = np.ones(1000, dtype=bool)
    mask[100:400] = False
    name, payload = encode_typed(vals, mask, "trle")
    # body has 2 value runs; null section has 3 mask runs
    n_runs = int(np.frombuffer(payload, dtype="<u4", count=1, offset=2 + 5 + 12)[0])
    assert n_runs == 2


def test_empty_and_singleton():
    for codec in ("auto",) + TYPED_CODECS:
        for vals in (np.zeros(0), np.array([np.nan])):
            name, payload = encode_typed(vals, None, codec)
            out, _ = decode_typed(name, payload, vals.size)
            assert out.tobytes() == vals.tobytes()


@settings(max_examples=60, deadline=None)
@given(
    data=st.lists(
        st.one_of(
            st.none(),
            st.floats(allow_nan=True, allow_infinity=True, width=64),
        ),
        max_size=200,
    )
)
def test_property_float_null_roundtrip(data):
    vals = np.array([0.0 if v is None else v for v in data], dtype="<f8")
    mask = np.array([v is not None for v in data], dtype=bool)
    m = None if mask.all() else mask
    name, payload = encode_typed(vals, m, "auto")
    out, omask = decode_typed(name, payload, vals.size)
    if m is None:
        assert omask is None
        assert out.tobytes() == vals.tobytes()
    else:
        assert (omask == mask).all()
        assert out[mask].tobytes() == vals[mask].tobytes()


def test_typed_df_roundtrip_spark(spark):
    """End-to-end Spark round trip: doubles with nulls+NaN, bools,
    timestamps — via Arrow kernels, no per-row Python at the API surface."""
    from pyspark.sql import functions as F

    from rle_array_spark.typed import decode_typed_df, encode_typed_df

    rows = [
        ("a", "s", [1.0, 1.0, None, float("nan"), 2.5]),
        ("b", "s", []),
        ("c", "s", [None, None]),
        ("d", "s", [0.25] * 500),
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, vals array<double>")
    blocks = encode_typed_df(df, "vals")
    meta = {r["doc_id"]: r for r in blocks.collect()}
    assert meta["a"]["null_count"] == 1 and meta["a"]["vtype"] == "float64"
    assert meta["d"]["codec"] in ("trle", "tdict")
    assert meta["d"]["encoded_bytes"] < meta["d"]["raw_bytes"]
    dec = decode_typed_df(blocks, "double")
    got = {r["doc_id"]: r["vals"] for r in dec.collect()}
    assert got["b"] == []
    assert got["c"] == [None, None]
    assert got["a"][:3] == [1.0, 1.0, None]
    assert np.isnan(got["a"][3]) and got["a"][4] == 2.5
    assert got["d"] == [0.25] * 500


def test_typed_unsupported_dtype_raises():
    with pytest.raises(ValueError, match="unsupported typed-codec dtype"):
        encode_typed(np.array(["x", "y"], dtype=object), None, "trle")


def _oracle_stats(vals, mask):
    import numpy as np

    if mask is None:
        mask = np.ones(len(vals), dtype=bool)
    numeric = (
        vals.astype(np.float64)
        if vals.dtype.kind in "fiub"
        else vals.view("<i8").astype(np.float64)
    )
    keep = mask.copy()
    if vals.dtype.kind == "f":
        keep &= ~np.isnan(numeric)
    nc = int((~mask).sum())
    if not keep.any():
        return nc, None, None, None
    kv = numeric[keep]
    return nc, float(kv.min()), float(kv.max()), float(kv.sum())


@pytest.mark.parametrize("codec", ["trle", "tdict", "traw", "auto"])
def test_typed_payload_stats_differential(codec):
    import numpy as np

    from rle_array_spark.codecs.typed import encode_typed, typed_payload_stats

    rng = np.random.default_rng(17)
    cases = [
        (np.repeat(np.arange(6, dtype=np.int64), 40), None),
        (rng.normal(size=200), rng.random(200) > 0.3),
        (np.where(rng.random(300) < 0.25, np.nan, rng.normal(size=300)), None),
        (np.array([np.nan, np.nan, np.nan]), None),
        (np.zeros(50, dtype=bool), np.zeros(50, dtype=bool)),  # all null
        (rng.integers(0, 3, 500).astype(np.int16), rng.random(500) > 0.1),
        ((np.arange(100) * 1000).astype("<M8[us]"), rng.random(100) > 0.5),
    ]
    for vals, mask in cases:
        name, payload = encode_typed(vals, mask, codec)
        r, nc, lo, hi, s = typed_payload_stats(name, payload, vals.size)
        enc, emin, emax, esum = _oracle_stats(np.ascontiguousarray(vals), mask)
        assert nc == enc, (name, vals.dtype)
        assert (lo is None) == (emin is None), (name, vals.dtype)
        if lo is not None:
            assert lo == emin and hi == emax, (name, vals.dtype)
            assert s == pytest.approx(esum, rel=1e-12), (name, vals.dtype)


def test_typed_block_reductions_df_matches_metadata(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from rle_array_spark.typed import (
        encode_typed_df,
        typed_block_reductions_df,
    )

    rng = np.random.default_rng(23)
    rows = []
    for i in range(30):
        n = int(rng.integers(0, 60))
        vals = rng.normal(size=n)
        vals[rng.random(n) < 0.2] = np.nan
        pyvals = [None if rng.random() < 0.15 else float(v) for v in vals]
        rows.append((f"d{i}", "s", pyvals))
    df = spark.createDataFrame(rows, "doc_id string, source string, vals array<double>")
    blocks = encode_typed_df(df, codec="auto")
    audit = typed_block_reductions_df(blocks)
    joined = (
        blocks.alias("b")
        .join(audit.alias("a"), ["doc_id"])
        .select(
            "doc_id",
            (F.col("b.null_count") == F.col("a.null_count")).alias("nc_ok"),
            (
                F.col("b.val_min").eqNullSafe(F.col("a.val_min"))
                & F.col("b.val_max").eqNullSafe(F.col("a.val_max"))
            ).alias("mm_ok"),
        )
        .collect()
    )
    assert all(r["nc_ok"] for r in joined)
    assert all(r["mm_ok"] for r in joined)


def test_encode_typed_df_n_runs_matches_payload_audit(spark):
    """Stored n_runs must agree with the payload's forward-filled run
    structure (the audit contract): [1.0, None, 1.0] is ONE payload run."""
    import numpy as np
    from pyspark.sql import functions as F

    from rle_array_spark.typed import encode_typed_df, typed_block_reductions_df

    df = spark.createDataFrame(
        [("a", "s", [1.0, None, 1.0]), ("b", "s", [None, 2.0, None, 3.0, 3.0])],
        "doc_id string, source string, vals array<double>",
    )
    blocks = encode_typed_df(df, codec="auto")
    stored = {r["doc_id"]: r["n_runs"] for r in blocks.collect()}
    audit = {r["doc_id"]: r["n_runs"] for r in typed_block_reductions_df(blocks).collect()}
    assert stored == audit
    assert stored["a"] == 1  # null forward-fills: one run of 1.0
    assert stored["b"] == 3  # leading null fills with 0: [0][2,2][3,3]


def test_zip_typed_df_empty_rows_keep_dtype(spark):
    """A doc with an empty sequence must not poison the batch dtype."""
    from rle_array_spark.typed import decode_typed_df, encode_typed_df, zip_typed_df

    rows = [("a", "s", [1, 2, 3]), ("b", "s", [])]
    schema = "doc_id string, source string, vals array<long>"
    ba = encode_typed_df(spark.createDataFrame(rows, schema))
    bb = encode_typed_df(spark.createDataFrame(rows, schema))
    out = zip_typed_df(ba, bb, "add")
    assert set(r["vtype"] for r in out.collect()) == {"int64"}
    dec = {r["doc_id"]: r["vals"] for r in decode_typed_df(out, "long").collect()}
    assert dec["a"] == [2, 4, 6] and dec["b"] == []
    # comparison on empty rows → bool everywhere
    cmp_out = zip_typed_df(ba, bb, "le")
    assert set(r["vtype"] for r in cmp_out.collect()) == {"bool"}


def test_typed_corrupt_payload_raises_never_wrong():
    """Truncated typed payloads must raise, not silently return data
    (mirrors the token-path corruption probe in the verify recipe)."""
    import numpy as np
    import pytest as _pytest

    from rle_array_spark.codecs.typed import decode_typed, encode_typed

    vals = np.repeat(np.arange(20, dtype=np.int64), 10)
    mask = np.arange(200) % 5 != 0
    for codec in ("trle", "tdict", "traw"):
        name, payload = encode_typed(vals, mask, codec)
        for cut in (1, len(payload) // 2, len(payload) - 1):
            with _pytest.raises((ValueError, IndexError, KeyError, struct_error())):
                out, valid = decode_typed(name, payload[:cut], vals.size)
                # length checks may pass short cuts through to here:
                assert out.size == vals.size


def struct_error():
    import struct

    return struct.error


def test_take_and_reverse_typed_df(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from rle_array_spark.typed import (
        decode_typed_df,
        encode_typed_df,
        reverse_typed_df,
        take_typed_df,
    )

    rng = np.random.default_rng(71)
    rows = []
    for i in range(20):
        n = int(rng.integers(0, 40))
        vals = [None if rng.random() < 0.2 else float(np.round(rng.normal(), 3)) for _ in range(n)]
        rows.append((f"d{i}", "s", vals))
    df = spark.createDataFrame(rows, "doc_id string, source string, vals array<double>")
    blocks = encode_typed_df(df, codec="auto")

    taken = decode_typed_df(take_typed_df(blocks, stride=3, offset=1), "double")
    got = {r["doc_id"]: r["vals"] for r in taken.collect()}
    for doc_id, _, vals in rows:
        assert got[doc_id] == vals[1::3], doc_id

    idx = np.array([0, 0, 2, 7])
    taken2 = decode_typed_df(take_typed_df(blocks, indices=idx), "double")
    got2 = {r["doc_id"]: r["vals"] for r in taken2.collect()}
    for doc_id, _, vals in rows:
        exp = [vals[j] for j in idx if j < len(vals)]
        assert got2[doc_id] == exp, doc_id

    rev = decode_typed_df(reverse_typed_df(blocks), "double")
    got3 = {r["doc_id"]: r["vals"] for r in rev.collect()}
    for doc_id, _, vals in rows:
        assert got3[doc_id] == vals[::-1], doc_id

    # metadata on the rewritten blocks matches a fresh audit
    from rle_array_spark.typed import typed_block_reductions_df

    tk = take_typed_df(blocks, stride=3, offset=1)
    audit = {r["doc_id"]: r for r in typed_block_reductions_df(tk).collect()}
    for r in tk.collect():
        a = audit[r["doc_id"]]
        assert r["n_runs"] == a["n_runs"] and r["null_count"] == a["null_count"]


def test_choose_typed_raw_guard_is_analytic():
    """choose_typed's raw-vs-winner guard uses the analytic traw size
    (len(encode_traw) == 2 + null_header + n*w exactly); pin that equality
    and that the guard still returns traw whenever raw is no larger."""
    import numpy as np

    from rle_array_spark.codecs.typed import (
        _mask_runs,
        _normalize,
        choose_typed,
        decode_typed,
        encode_traw,
    )

    rng = np.random.default_rng(7)
    for trial in range(300):
        n = int(rng.integers(0, 300))
        kind = trial % 5
        if kind == 0:
            vals = rng.normal(size=n)
            vals[rng.random(n) < 0.2] = np.nan
        elif kind == 1:
            vals = rng.integers(0, 5, size=n).astype(np.int32)
        elif kind == 2:
            vals = rng.random(n) < 0.5
        elif kind == 3:
            vals = rng.integers(0, 10**15, size=n).astype("datetime64[us]")
        else:
            vals = np.repeat(rng.normal(size=n // 10 + 1), 10)[:n]
        valid = None
        if rng.random() < 0.6 and n:
            valid = rng.random(n) < 0.8
        code, bv, valid_n = _normalize(vals, valid)
        null_bytes = 0 if valid_n is None else 5 + 4 * _mask_runs(valid_n)[1].size
        assert 2 + null_bytes + bv.size * vals.dtype.itemsize == len(
            encode_traw(vals, valid)
        )
        name, payload = choose_typed(vals, valid)
        if name != "traw":  # winner must beat raw strictly
            assert len(payload) < len(encode_traw(vals, valid))
        out, ov = decode_typed(name, payload, n)
        got_valid = ov if ov is not None else np.ones(n, dtype=bool)
        want_valid = valid if valid is not None else np.ones(n, dtype=bool)
        assert np.array_equal(got_valid, want_valid)
        if n:
            eq = out[got_valid] == vals[got_valid]
            if vals.dtype.kind == "f":
                eq = eq | (np.isnan(out[got_valid]) & np.isnan(vals[got_valid]))
            assert eq.all()


def test_doc_quantiles_typed_matches_numpy(spark):
    """Compressed-histogram per-doc quantiles == numpy sort-and-pick over
    the decoded values (nulls excluded, NaN sorting last), float dtype
    with planted NaNs and nulls."""
    import numpy as np

    from rle_array_spark.typed import doc_quantiles_typed_df, encode_typed_df

    rng = np.random.default_rng(23)
    rows = []
    raw = {}
    for d in range(30):
        n = int(rng.integers(1, 200))
        vals = np.round(rng.normal(size=n), 3)
        vals[rng.random(n) < 0.1] = np.nan
        mask = rng.random(n) < 0.15  # nulls
        pyvals = [None if m else float(v) for v, m in zip(vals, mask)]
        rows.append((f"d{d:03d}", "src", pyvals))
        raw[f"d{d:03d}"] = np.sort(vals[~mask])  # NaN sorts last
    df = spark.createDataFrame(rows, "doc_id string, source string, vals array<double>")
    blocks = encode_typed_df(df, "vals")
    got = {r["doc_id"]: r for r in doc_quantiles_typed_df(blocks, "double").collect()}
    for d, x in raw.items():
        if x.size == 0:
            assert d not in got
            continue
        row = got[d]
        assert row["n_vals"] == x.size
        for p in (0.25, 0.5, 0.75):
            k = int(np.ceil(p * x.size))
            want = x[k - 1]
            v = row[f"p{int(p * 100)}"]
            assert (np.isnan(want) and np.isnan(v)) or v == want, (d, p)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="binary-exact"):
        doc_quantiles_typed_df(blocks, "double", probs=(0.3,))
    with _pytest.raises(ValueError, match="interpolation"):
        doc_quantiles_typed_df(blocks, "double", interpolation="nearest")

    # linear variant: pandas/numpy-linear pick on the same sorted order
    # (NaN participates sorting last — interpolation touching the NaN
    # region yields NaN, the histogram-order semantics)
    lin = {
        r["doc_id"]: r
        for r in doc_quantiles_typed_df(
            blocks, "double", interpolation="linear"
        ).collect()
    }
    for d, x in raw.items():
        if x.size == 0:
            continue
        row = lin[d]
        for p in (0.25, 0.5, 0.75):
            h = (x.size - 1) * p
            lo = x[int(np.floor(h))]
            hi = x[min(int(np.floor(h)) + 1, x.size - 1)]
            want = lo + (h - np.floor(h)) * (hi - lo)
            v = row[f"p{int(p * 100)}"]
            assert (np.isnan(want) and np.isnan(v)) or v == want, (d, p, v, want)


def test_transform_typed_df_ops(spark):
    """Compressed-domain unary + scalar ops over typed columns (reference
    __neg__/__abs__ and scalar dunders, array.py:748-849): decode of the
    transformed blocks equals numpy over the raw values; nulls stay null;
    comparisons produce bool blocks."""
    import numpy as np

    from rle_array_spark.typed import (
        decode_typed_df,
        encode_typed_df,
        transform_typed_df,
    )

    rng = np.random.default_rng(77)
    rows = []
    raw = {}
    for d in range(20):
        n = int(rng.integers(1, 120))
        vals = np.repeat(
            rng.integers(-40, 40, max(n // 4, 1)).astype(np.float64), 4
        )[:n]
        mask = rng.random(n) < 0.2
        rows.append((f"d{d:02d}", "s", [None if m else float(v) for v, m in zip(vals, mask)]))
        raw[f"d{d:02d}"] = (vals, mask)
    df = spark.createDataFrame(rows, "doc_id string, source string, vals array<double>")
    blocks = encode_typed_df(df, "vals").persist()

    cases = [
        ("neg", None, lambda v: -v),
        ("abs", None, lambda v: np.abs(v)),
        ("mul", 2.5, lambda v: v * 2.5),
        ("pow", 2, lambda v: np.power(v, 2.0)),
        ("ge", 0, lambda v: v >= 0),
    ]
    for op, operand, npfn in cases:
        out = transform_typed_df(blocks, op, operand)
        elem = "boolean" if op == "ge" else "double"
        got = {r["doc_id"]: r["vals"] for r in decode_typed_df(out, elem).collect()}
        for d, (vals, mask) in raw.items():
            g = got[d]
            exp = npfn(vals)
            for i in range(len(vals)):
                if mask[i]:
                    assert g[i] is None, (op, d, i)
                else:
                    assert g[i] == exp[i], (op, d, i, g[i], exp[i])

    import pytest as _pytest

    with _pytest.raises(ValueError, match="takes no operand"):
        transform_typed_df(blocks, "neg", 3)
    with _pytest.raises(ValueError, match="needs an operand"):
        transform_typed_df(blocks, "mul")
    with _pytest.raises(ValueError, match="unsupported op"):
        transform_typed_df(blocks, "sqrtish", 1)
    blocks.unpersist()


def test_transform_typed_df_invert(spark):
    """``invert`` (reference __invert__, array.py:835-836) on both domains:
    bitwise not over int blocks (~v = -v-1, nulls stay null) and logical
    not over bool mask blocks; floats raise like numpy does."""
    import numpy as np
    import pytest as _pytest

    from rle_array_spark.typed import (
        decode_typed_df,
        encode_typed_df,
        transform_typed_df,
    )

    rng = np.random.default_rng(78)
    rows = []
    raw = {}
    for d in range(12):
        n = int(rng.integers(1, 100))
        vals = np.repeat(rng.integers(-50, 50, max(n // 4, 1)), 4)[:n]
        mask = rng.random(n) < 0.2
        rows.append(
            (f"d{d:02d}", "s", [None if m else int(v) for v, m in zip(vals, mask)])
        )
        raw[f"d{d:02d}"] = (vals, mask)
    df = spark.createDataFrame(rows, "doc_id string, source string, vals array<long>")
    blocks = encode_typed_df(df, "vals").persist()

    got = {
        r["doc_id"]: r["vals"]
        for r in decode_typed_df(transform_typed_df(blocks, "invert"), "long").collect()
    }
    for d, (vals, mask) in raw.items():
        for i in range(len(vals)):
            if mask[i]:
                assert got[d][i] is None, (d, i)
            else:
                assert got[d][i] == -int(vals[i]) - 1, (d, i)

    # bool mask blocks: ~(v >= 0) == (v < 0); null comparisons stay null
    masks = transform_typed_df(blocks, "ge", 0)
    got_b = {
        r["doc_id"]: r["vals"]
        for r in decode_typed_df(
            transform_typed_df(masks, "invert"), "boolean"
        ).collect()
    }
    for d, (vals, mask) in raw.items():
        for i in range(len(vals)):
            if mask[i]:
                assert got_b[d][i] is None, (d, i)
            else:
                assert got_b[d][i] == bool(vals[i] < 0), (d, i)
    blocks.unpersist()

    # float inversion raises (numpy contract the reference inherits)
    from rle_array_spark.codecs.typed import encode_typed
    from rle_array_spark.codecs.typed_zip import TYPED_UNARY_OPS, transform_typed

    fvals = np.array([1.5, 1.5, -2.0], dtype=np.float64)
    codec, payload = encode_typed(fvals)
    with _pytest.raises(TypeError):
        transform_typed(codec, payload, 3, TYPED_UNARY_OPS["invert"])


def test_transform_typed_df_reflected(spark):
    """Reflected scalar forms (reference __rsub__/__rtruediv__/
    __rfloordiv__/__rmod__/__rpow__, array.py:769-807): scalar OP values
    over typed blocks, nulls stay null; integer k//0 and k%0 are
    zero-safe (0); an int scalar over a float column promotes to float."""
    import numpy as np
    import pytest as _pytest

    from rle_array_spark.typed import (
        decode_typed_df,
        encode_typed_df,
        transform_typed_df,
    )

    rng = np.random.default_rng(79)
    rows = []
    raw = {}
    for d in range(10):
        n = int(rng.integers(1, 80))
        vals = np.repeat(rng.integers(-6, 7, max(n // 4, 1)), 4)[:n]
        mask = rng.random(n) < 0.2
        rows.append(
            (f"d{d:02d}", "s", [None if m else int(v) for v, m in zip(vals, mask)])
        )
        raw[f"d{d:02d}"] = (vals, mask)
    df = spark.createDataFrame(rows, "doc_id string, source string, vals array<long>")
    blocks = encode_typed_df(df, "vals").persist()

    def npref(op, k, v):
        if op == "rsub":
            return k - v
        if op == "rfloordiv":
            return np.floor_divide(k, v, out=np.zeros_like(v), where=v != 0)
        if op == "rmod":
            return np.mod(k, v, out=np.zeros_like(v), where=v != 0)
        if op == "rpow":
            return np.power(float(k), v.astype(np.float64))
        raise AssertionError(op)

    for op, k, elem in [
        ("rsub", 100, "long"),
        ("rfloordiv", 360, "long"),
        ("rmod", 360, "long"),
        ("rpow", 2, "double"),
    ]:
        got = {
            r["doc_id"]: r["vals"]
            for r in decode_typed_df(transform_typed_df(blocks, op, k), elem).collect()
        }
        for d, (vals, mask) in raw.items():
            exp = npref(op, k, vals)
            for i in range(len(vals)):
                if mask[i]:
                    assert got[d][i] is None, (op, d, i)
                else:
                    assert got[d][i] == exp[i], (op, d, i, got[d][i], exp[i])
    blocks.unpersist()

    # int scalar over a FLOAT column: rdiv/rfloordiv promote to float
    fdf = spark.createDataFrame(
        [("f0", "s", [2.0, 2.0, 0.5, None, -4.0])],
        "doc_id string, source string, vals array<double>",
    )
    fb = encode_typed_df(fdf, "vals")
    got = decode_typed_df(transform_typed_df(fb, "rdiv", 2), "double").collect()[0]["vals"]
    assert got[0] == 1.0 and got[2] == 4.0 and got[3] is None and got[4] == -0.5
    got = decode_typed_df(transform_typed_df(fb, "rfloordiv", 9), "double").collect()[0]["vals"]
    assert got[0] == 4.0 and got[2] == 18.0 and got[3] is None and got[4] == -3.0

    with _pytest.raises(ValueError, match="unsupported op"):
        transform_typed_df(fb, "rlt", 1)  # reflected comparisons stay unnamed
    with _pytest.raises(ValueError, match="needs an operand"):
        transform_typed_df(fb, "rsub")


def test_transform_typed_chain_df_differential(spark):
    """Fused chain (one kernel pass) is BYTE-identical to the equivalent
    step-by-step transform_typed_df composition, including a trailing
    comparison; comparisons mid-chain raise."""
    import numpy as np
    import pytest as _pytest

    from rle_array_spark.typed import (
        encode_typed_df,
        transform_typed_chain_df,
        transform_typed_df,
    )

    rng = np.random.default_rng(80)
    rows = []
    for d in range(15):
        n = int(rng.integers(1, 150))
        vals = np.repeat(rng.integers(-30, 30, max(n // 5, 1)), 5)[:n]
        mask = rng.random(n) < 0.15
        rows.append(
            (f"d{d:02d}", "s", [None if m else int(v) for v, m in zip(vals, mask)])
        )
    df = spark.createDataFrame(rows, "doc_id string, source string, vals array<long>")
    blocks = encode_typed_df(df, "vals").persist()

    chains = [
        [("neg", None), ("abs", None), ("mul", 3), ("sub", 100)],
        [("add", 1), ("rfloordiv", 100000), ("rsub", 500)],
        [("invert", None), ("abs", None)],
        [("mul", 2), ("ge", 0)],  # trailing comparison → bool blocks
    ]
    for steps in chains:
        fused = {
            (r["doc_id"],): (r["codec"], bytes(r["payload"]))
            for r in transform_typed_chain_df(blocks, steps).collect()
        }
        step = blocks
        for op, k in steps:
            step = transform_typed_df(step, op, k)
        expected = {
            (r["doc_id"],): (r["codec"], bytes(r["payload"]))
            for r in step.collect()
        }
        assert fused == expected, steps

    with _pytest.raises(ValueError, match="last chain step"):
        transform_typed_chain_df(blocks, [("ge", 0), ("abs", None)])
    with _pytest.raises(ValueError, match="empty transform chain"):
        transform_typed_chain_df(blocks, [])
    blocks.unpersist()


def test_transform_typed_round(spark):
    """r5: named typed-float round(decimals) (reference array.py:913-916,
    tests/test_misc_operations.py:57-79): decode equals np.round
    (HALF-EVEN, incl. exact halves like 2.5 -> 2.0), nulls stay null,
    decimals=0 default, chains compose, non-int decimals raise."""
    import numpy as np
    import pytest as _pytest

    from rle_array_spark.typed import (
        decode_typed_df,
        encode_typed_df,
        transform_typed_chain_df,
        transform_typed_df,
    )

    rng = np.random.default_rng(505)
    rows = []
    raw = {}
    for d in range(12):
        n = int(rng.integers(1, 90))
        vals = np.repeat(
            rng.uniform(-50, 50, max(n // 3, 1)), 3
        )[:n]
        # plant exact halves to pin half-even vs half-away
        vals[: min(4, n)] = [2.5, 3.5, -2.5, 0.125][: min(4, n)]
        mask = rng.random(n) < 0.15
        rows.append(
            (f"d{d:02d}", "s", [None if m else float(v) for v, m in zip(vals, mask)])
        )
        raw[f"d{d:02d}"] = (vals, mask)
    df = spark.createDataFrame(rows, "doc_id string, source string, vals array<double>")
    blocks = encode_typed_df(df, "vals").persist()

    for decimals, operand in [(0, None), (0, 0), (2, 2)]:
        out = transform_typed_df(blocks, "round", operand)
        got = {r["doc_id"]: r["vals"] for r in decode_typed_df(out, "double").collect()}
        for d, (vals, mask) in raw.items():
            exp = np.round(vals, decimals)
            for i in range(len(vals)):
                if mask[i]:
                    assert got[d][i] is None
                else:
                    assert got[d][i] == exp[i], (decimals, d, i, got[d][i], exp[i])

    # chained: round(v / 7, 2) in one fused pass == stepwise numpy
    chained = transform_typed_chain_df(blocks, [("div", 7), ("round", 2)])
    got = {r["doc_id"]: r["vals"] for r in decode_typed_df(chained, "double").collect()}
    for d, (vals, mask) in raw.items():
        exp = np.round(vals / 7, 2)
        for i in range(len(vals)):
            if not mask[i]:
                assert got[d][i] == exp[i]

    with _pytest.raises(ValueError, match="decimals must be an int"):
        transform_typed_df(blocks, "round", 1.5)
    blocks.unpersist()
