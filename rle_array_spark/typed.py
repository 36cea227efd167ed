"""Typed-column encode/decode over Spark DataFrames.

Extends the token engine to the reference's full dtype surface: any
fixed-width element type (bool, int8..64, float32/64 incl. NaN,
timestamp/duration) with element-level nulls, as ``array<T>`` columns in
the same (doc_id, source, vals) shape as the token path
(/root/reference/rle_array/dtype.py:11-27 — the reference registers one
extension dtype per numpy dtype; here one blocks row per sequence with a
dtype tag inside the payload).

Same scale posture as engine.encode_df: one mapInArrow kernel at scan
parallelism, no shuffle, payloads self-contained, zone-map metadata
(val_min/val_max/null_count) alongside every block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

from rle_array_spark.codecs.typed import _fill_nulls, decode_typed, encode_typed

TYPED_BLOCKS_SCHEMA = (
    "doc_id string, source string, vtype string, codec string, payload binary, "
    "n_values int, n_runs int, null_count int, val_min double, val_max double, "
    "raw_bytes long, encoded_bytes long"
)

# numpy dtype name ↔ Spark element type for decode round-trips
_SPARK_ELEM = {
    "int32": "int",
    "int64": "long",
    "float64": "double",
    "float32": "float",
    "bool": "boolean",
    "int16": "short",
    "int8": "byte",
    "datetime64[us]": "timestamp",
}


def _arrow_np_dtype(t: pa.DataType) -> np.dtype:
    if pa.types.is_timestamp(t):
        return np.dtype(f"<M8[{t.unit}]")
    if pa.types.is_duration(t):
        return np.dtype(f"<m8[{t.unit}]")
    return np.dtype(t.to_pandas_dtype())


def _list_child_parts(col: pa.Array):
    """ListArray → (offsets int64 normalized to 0, flat values ndarray,
    flat valid mask | None). Buffer-level extraction so a float NULL and a
    float NaN stay distinct (to_numpy would fold both to NaN)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    child = col.flatten()
    dtype = _arrow_np_dtype(child.type)
    valid = None
    if child.null_count:
        valid = ~np.asarray(child.is_null())
        child = child.fill_null(
            pa.scalar(0, type=pa.int64()).cast(child.type)
            if not pa.types.is_boolean(child.type)
            else False
        )
    if pa.types.is_boolean(child.type):
        bits = np.frombuffer(child.buffers()[1], dtype=np.uint8)
        vals = np.unpackbits(bits, bitorder="little", count=child.offset + len(child))[
            child.offset :
        ].astype(bool)
    else:
        buf = child.buffers()[1]
        vals = np.frombuffer(buf, dtype=dtype, count=child.offset + len(child))[
            child.offset :
        ]
    return offsets, vals, valid


def encode_typed_df(df: DataFrame, col: str = "vals", codec: str = "auto") -> DataFrame:
    """(doc_id, source, <col> array<T>) → typed encoded blocks.

    Scan-parallel, shuffle-free; per-row cost-based codec choice on the
    value bit patterns (NaN-run aware); in-band null mask."""

    def kernel(batches):
        for batch in batches:
            if not batch.num_rows:
                continue
            offsets, flat, valid = _list_child_parts(batch.column(col))
            n_rows = batch.num_rows
            names_out, payloads = [], []
            n_values = np.empty(n_rows, dtype=np.int32)
            n_runs = np.empty(n_rows, dtype=np.int32)
            null_count = np.zeros(n_rows, dtype=np.int32)
            vmin = np.full(n_rows, np.nan)
            vmax = np.full(n_rows, np.nan)
            enc_bytes = np.empty(n_rows, dtype=np.int64)
            w = flat.dtype.itemsize
            is_float = flat.dtype.kind == "f"
            numeric_view = (
                flat if flat.dtype.kind in "fiub" else flat.view("<i8")
            )
            for i in range(n_rows):
                lo, hi = int(offsets[i]), int(offsets[i + 1])
                row = flat[lo:hi]
                mask = valid[lo:hi] if valid is not None else None
                name, payload = encode_typed(row, mask, codec)
                names_out.append(name)
                payloads.append(payload)
                n_values[i] = hi - lo
                bv = row.view(f"<u{w}") if w > 1 else row.view("<u1")
                if mask is not None and not mask.all():
                    null_count[i] = int((~mask).sum())
                    # n_runs must match the PAYLOAD's run structure, which
                    # forward-fills null slots (the audit primitive
                    # typed_payload_stats recomputes exactly this)
                    bv = _fill_nulls(bv, mask)
                n_runs[i] = (
                    1 + int(np.count_nonzero(bv[1:] != bv[:-1])) if bv.size else 0
                )
                nv = numeric_view[lo:hi]
                if mask is not None and not mask.all():
                    nv = nv[mask]
                if nv.size:
                    if is_float:
                        finite = nv[~np.isnan(nv)]
                        if finite.size:
                            vmin[i] = float(finite.min())
                            vmax[i] = float(finite.max())
                    else:
                        vmin[i] = float(nv.min())
                        vmax[i] = float(nv.max())
                enc_bytes[i] = len(payload)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    batch.column("source"),
                    pa.array([str(flat.dtype)] * n_rows, type=pa.string()),
                    pa.array(names_out, type=pa.string()),
                    pa.array(payloads, type=pa.binary()),
                    pa.array(n_values),
                    pa.array(n_runs),
                    pa.array(null_count),
                    pa.array(vmin),
                    pa.array(vmax),
                    pa.array((offsets[1:] - offsets[:-1]) * w),
                    pa.array(enc_bytes),
                ],
                names=[
                    "doc_id", "source", "vtype", "codec", "payload", "n_values",
                    "n_runs", "null_count", "val_min", "val_max", "raw_bytes",
                    "encoded_bytes",
                ],
            )

    return df.select("doc_id", "source", col).mapInArrow(kernel, TYPED_BLOCKS_SCHEMA)


def zip_blocks_pairwise_df(blocks_a: DataFrame, blocks_b: DataFrame, row_op) -> DataFrame:
    """Shared scaffolding for block-pair zips that emit typed blocks:
    align two block tables on (doc_id, source) — one block per key is the
    contract of the typed/string encoders (no chunking) — check lengths,
    apply ``row_op(codec_a, payload_a, codec_b, payload_b, n) -> (codec,
    payload)`` or ``(codec, payload, new_n)`` — the 3-tuple form for
    length-changing ops like the boolean-mask gather — per pair, and
    recompute metadata exactly from the new payloads. Used by
    :func:`zip_typed_df`, :func:`mask_typed_df`, strings.zip_strings_df."""
    from pyspark.sql import functions as F

    from rle_array_spark.codecs.typed import DTYPE_CODES, typed_payload_stats

    a = blocks_a.select(
        "doc_id", "source",
        F.col("codec").alias("codec_a"), F.col("payload").alias("payload_a"),
        "n_values",
    )
    b = blocks_b.select(
        "doc_id", "source",
        F.col("codec").alias("codec_b"), F.col("payload").alias("payload_b"),
        F.col("n_values").alias("n_values_b"),
    )
    joined = a.join(b, ["doc_id", "source"], "inner")

    def kernel(batches):
        for batch in batches:
            if not batch.num_rows:
                continue
            ca = batch.column("codec_a").to_pylist()
            cb = batch.column("codec_b").to_pylist()
            pa_col = batch.column("payload_a")
            pb_col = batch.column("payload_b")
            n_col = batch.column("n_values").to_numpy(zero_copy_only=False)
            nb_col = batch.column("n_values_b").to_numpy(zero_copy_only=False)
            n_rows = batch.num_rows
            new_codecs: list[str] = []
            new_payloads: list[bytes] = []
            vtypes: list[str] = []
            n_runs = np.empty(n_rows, dtype=np.int32)
            null_count = np.empty(n_rows, dtype=np.int32)
            vmin = np.full(n_rows, np.nan)
            vmax = np.full(n_rows, np.nan)
            out_n = np.empty(n_rows, dtype=np.int32)
            for i in range(n_rows):
                nv = int(n_col[i])
                if nv != int(nb_col[i]):
                    raise ValueError(
                        f"zip length mismatch: {nv} != {int(nb_col[i])}"
                    )
                res = row_op(
                    ca[i], memoryview(pa_col[i].as_buffer()),
                    cb[i], memoryview(pb_col[i].as_buffer()),
                    nv,
                )
                c, p = res[0], res[1]
                nn = int(res[2]) if len(res) == 3 else nv
                new_codecs.append(c)
                new_payloads.append(p)
                out_n[i] = nn
                r, nc, lo, hi, _ = typed_payload_stats(c, p, nn)
                n_runs[i], null_count[i] = r, nc
                if lo is not None:
                    vmin[i], vmax[i] = lo, hi
                vtypes.append(str(DTYPE_CODES[p[0]]))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    batch.column("source"),
                    pa.array(vtypes, type=pa.string()),
                    pa.array(new_codecs, type=pa.string()),
                    pa.array(new_payloads, type=pa.binary()),
                    pa.array(out_n),
                    pa.array(n_runs),
                    pa.array(null_count),
                    pa.array(vmin),
                    pa.array(vmax),
                    pa.array(
                        out_n.astype(np.int64)
                        * np.array(
                            [DTYPE_CODES[p[0]].itemsize for p in new_payloads],
                            dtype=np.int64,
                        )
                    ),
                    pa.array(np.array([len(p) for p in new_payloads], dtype=np.int64)),
                ],
                names=[
                    "doc_id", "source", "vtype", "codec", "payload", "n_values",
                    "n_runs", "null_count", "val_min", "val_max", "raw_bytes",
                    "encoded_bytes",
                ],
            )

    return joined.mapInArrow(kernel, TYPED_BLOCKS_SCHEMA)


def zip_typed_df(
    blocks_a: DataFrame, blocks_b: DataFrame, op: str, post=None
) -> DataFrame:
    """Elementwise ``op`` over two typed encoded columns aligned on
    (doc_id, source), on the run-boundary union grid (codecs/typed_zip.py)
    — the reference's any-dtype binary operators with null propagation
    (/root/reference/tests/test_operators.py over dtype fixtures).
    Comparisons produce bool blocks. Metadata (n_runs, null_count,
    val_min/val_max) is recomputed exactly from the new payload.

    ``post`` is an optional scalar/unary chain (the
    :func:`transform_typed_chain_df` steps format) FUSED into the zip
    kernel: ``(a + b) * 3 - 100`` or ``(a - b) >= t`` runs as one pass —
    one union-grid evaluation + one emit instead of a zip stage followed
    by N transform stages. Decode-identical to composing the steps after
    the zip (differential-tested); a comparison is only legal as the
    last post step, and a comparison zip op only takes bool-domain post
    steps (e.g. ``invert``)."""
    from rle_array_spark.codecs.typed_zip import (
        COMPARISON_OPS,
        TYPED_ZIP_OPS,
        zip_typed_blocks,
    )

    if op not in TYPED_ZIP_OPS:
        raise ValueError(f"unsupported typed zip op {op!r}; one of {sorted(TYPED_ZIP_OPS)}")
    if post is not None and op in COMPARISON_OPS:
        # the zip output is a bool mask — arithmetic post steps would
        # silently emit non-bool blocks that mask_typed_df later rejects
        # deep in an executor; fail at the driver instead
        for step in post:
            name = step[0] if isinstance(step, (tuple, list)) else step
            if name not in ("invert", "eq", "ne"):
                raise ValueError(
                    f"post step {name!r} on a comparison zip must stay in "
                    "the bool domain (invert/eq/ne)"
                )
    post_fn, post_bool = (None, False) if post is None else _resolve_typed_chain(post)

    def row_op(ca, pa_, cb, pb_, nv):
        return zip_typed_blocks(
            ca, pa_, cb, pb_, nv, op, post_fn=post_fn, post_bool=post_bool
        )

    return zip_blocks_pairwise_df(blocks_a, blocks_b, row_op)


def mask_typed_df(value_blocks: DataFrame, mask_blocks: DataFrame) -> DataFrame:
    """Boolean-mask gather ``values[mask]`` over two typed encoded columns
    aligned on (doc_id, source); the mask column holds bool blocks (the
    output of the comparison zips), so ``arr[arr > x]`` composes in the
    encoded domain — the reference's boolean ``__getitem__``
    (/root/reference/rle_array/array.py:655-668) for every dtype. Null
    mask slots DROP rows (SQL WHERE semantics; codecs/typed_zip.mask_typed).
    n_values and all metadata reflect the post-gather block exactly."""
    from rle_array_spark.codecs.typed_zip import mask_typed

    return zip_blocks_pairwise_df(value_blocks, mask_blocks, mask_typed)


def filter_typed_df(blocks: DataFrame, op: str, operand, pre=None) -> DataFrame:
    """Fused scalar-comparison filter ``values[values op operand]`` over a
    typed encoded column — ``df[df.x < c]`` for any dtype — in ONE
    shuffle-free mapInArrow pass with no mask payload
    (codecs/typed_zip.filter_typed: comparison on run values for trle /
    the table for tdict; null slots drop, SQL WHERE). Metadata reflects
    the post-filter blocks exactly.

    ``pre`` is an optional scalar/unary chain (the
    :func:`transform_typed_chain_df` steps format, arithmetic only) fused
    into the PREDICATE: ``filter_typed_df(b, 'gt', c, pre=[('abs',
    None)])`` keeps the ORIGINAL values where ``abs(v) > c`` — a filter
    on a derived quantity with no derived column materialized and still
    one kernel pass; ``operand`` compares in the chain's output domain."""
    from rle_array_spark.codecs.typed_zip import filter_typed

    pre_fn = None
    if pre is not None:
        pre_fn, pre_bool = _resolve_typed_chain(pre)
        if pre_bool:
            raise ValueError(
                "pre chain must be arithmetic (no comparisons) — the "
                "filter op is the comparison"
            )

    def row_fn(c, p, n):
        return filter_typed(c, p, n, op, operand, pre_fn=pre_fn)

    return _block_transform_df(blocks, row_fn)


def _resolve_typed_op(op: str, operand=None):
    """→ (fn(values ndarray) -> ndarray, to_bool) for one scalar/unary
    operator name — the shared resolution behind ``transform_typed_df``
    and the fused ``transform_typed_chain_df``."""
    from rle_array_spark.codecs.typed_zip import (
        COMPARISON_OPS,
        TYPED_UNARY_OPS,
        TYPED_ZIP_OPS,
    )

    if op == "round":
        # reference ``round(decimals)`` (array.py:913-916, exercised in
        # tests/test_misc_operations.py:57-79): np.round the run values
        # and recompress — the last named reference dunder. HALF-EVEN
        # (numpy/IEEE) semantics, matching the reference's numpy round;
        # the DuckDB oracle uses round_even(), NOT round() (half-away).
        decimals = 0 if operand is None else operand
        if not isinstance(decimals, (int, np.integer)) or isinstance(decimals, bool):
            raise ValueError(f"round decimals must be an int, got {decimals!r}")
        fn = lambda v, _d=int(decimals): np.round(v, _d)  # noqa: E731
        to_bool = False
    elif op in TYPED_UNARY_OPS:
        if operand is not None:
            raise ValueError(f"unary op {op!r} takes no operand")
        base = TYPED_UNARY_OPS[op]
        fn = base
        to_bool = False
    elif op in TYPED_ZIP_OPS:
        if operand is None:
            raise ValueError(f"scalar op {op!r} needs an operand")
        zf = TYPED_ZIP_OPS[op]
        opnd = np.asarray(operand)  # 0-d array: broadcasts AND has .astype
        fn = lambda v: zf(v, opnd)  # noqa: E731 — scalar broadcast
        to_bool = op in COMPARISON_OPS
    elif (
        op.startswith("r")
        and op[1:] in TYPED_ZIP_OPS
        and op[1:] not in COMPARISON_OPS
    ):
        # reflected scalar forms (reference __rsub__/__rtruediv__/
        # __rfloordiv__/__rmod__/__rpow__, array.py:769-807): scalar OP
        # values. The scalar side is materialized to the values' shape so
        # the zero-safe where= branches of floordiv/mod see full arrays,
        # and promoted so an int scalar over a float column divides in
        # float (reflected comparisons are just the mirrored forward ops
        # and stay unnamed, like the reference's pandas dispatch).
        if operand is None:
            raise ValueError(f"scalar op {op!r} needs an operand")
        zf = TYPED_ZIP_OPS[op[1:]]
        opnd = np.asarray(operand)

        def fn(v, _zf=zf, _k=opnd):  # noqa: E731 — reflected broadcast
            k_arr = np.broadcast_to(_k, v.shape).astype(
                np.result_type(_k, v), copy=False
            )
            return _zf(k_arr, v)

        to_bool = False
    else:
        raise ValueError(
            f"unsupported op {op!r}; unary: {sorted(TYPED_UNARY_OPS)}, "
            f"scalar: {sorted(TYPED_ZIP_OPS)} (+ reflected r-forms of the "
            f"non-commutative ones)"
        )
    return fn, to_bool


def transform_typed_df(blocks: DataFrame, op: str, operand=None) -> DataFrame:
    """Compressed-domain scalar/unary operator over a typed encoded column
    (reference dunders array.py:748-849 for arbitrary dtypes): unary ops
    from ``TYPED_UNARY_OPS`` (neg/abs/pos/invert, no operand) or any
    ``TYPED_ZIP_OPS`` entry applied against a broadcast scalar operand
    (add/sub/mul/div/floordiv/mod/pow/min/max + comparisons → bool
    blocks usable as masks), or a reflected ``r``-form of a
    non-commutative one (rsub/rdiv/rfloordiv/rmod/rpow — scalar OP
    values, reference __rsub__ etc., array.py:769-807). Runs in one
    shuffle-free mapInArrow pass on run values only; nulls stay null;
    adjacent runs made equal by the map merge (recompress invariant).
    Metadata recomputed exactly."""
    from rle_array_spark.codecs.typed_zip import transform_typed

    fn, to_bool = _resolve_typed_op(op, operand)

    def row_fn(c, p, n):
        nc, npay = transform_typed(c, p, n, fn, to_bool=to_bool)
        return nc, npay, n  # value-map: length unchanged

    return _block_transform_df(blocks, row_fn)


def _resolve_typed_chain(steps):
    """→ (composed fn, to_bool) for a list of ``op`` / ``(op, operand)``
    steps; a comparison is only legal as the LAST step."""
    if not steps:
        raise ValueError("empty transform chain")
    fns: list = []
    to_bool = False
    for i, step in enumerate(steps):
        op, operand = step if isinstance(step, (tuple, list)) else (step, None)
        fn_i, b = _resolve_typed_op(op, operand)
        if b and i != len(steps) - 1:
            raise ValueError(
                f"comparison {op!r} only allowed as the last chain step"
            )
        fns.append(fn_i)
        to_bool = b

    def fused(v):
        for f in fns:
            v = f(v)
        return v

    return fused, to_bool


def transform_typed_chain_df(blocks: DataFrame, steps) -> DataFrame:
    """Fused chain of scalar/unary operators in ONE kernel pass — the
    expression-evaluation shape for chained dunders like
    ``abs(-a) * 3 - 100`` (reference chains in tests/test_operators.py).
    ``steps`` is a list of ``op`` / ``(op, operand)`` items resolved
    exactly like :func:`transform_typed_df`; the composed value map runs
    over each block's run values once, so an N-op chain pays one payload
    parse + one emit + one Arrow pass instead of N (N mapInArrow stages
    collapse to one — at cluster scale that is N× less Arrow
    (de)serialization and task-launch overhead on the hot expression
    path). A comparison is only allowed as the LAST step (its bool output
    leaves the arithmetic domain); results are bit-identical to the
    step-by-step chain (differential-tested)."""
    from rle_array_spark.codecs.typed_zip import transform_typed

    fused, to_bool = _resolve_typed_chain(steps)

    def row_fn(c, p, n):
        nc, npay = transform_typed(c, p, n, fused, to_bool=to_bool)
        return nc, npay, n

    return _block_transform_df(blocks, row_fn)


def cast_typed_df(blocks: DataFrame, to_dtype) -> DataFrame:
    """Cross-dtype cast over typed encoded blocks — the reference's
    ``astype`` (/root/reference/rle_array/array.py:445-453,670-681) as a
    compressed-domain block transform: trle casts run values only (adjacent
    runs merging canonically), tdict/traw re-encode the cast values under
    the same codec. Shuffle-free mapInArrow; metadata (n_runs, null_count,
    val_min/val_max, byte sizes) recomputed exactly from the new payload."""
    from rle_array_spark.codecs.typed import cast_typed

    to_dtype = np.dtype(to_dtype)

    def row_fn(c, p, n):
        nc, np_ = cast_typed(c, p, n, to_dtype)
        return nc, np_, n

    return _block_transform_df(blocks, row_fn)


def _block_transform_df(blocks: DataFrame, row_fn) -> DataFrame:
    """Shared scaffold for shuffle-free per-block transforms that may change
    length: ``row_fn(codec, payload, n) -> (codec, payload, new_n)``;
    vtype from the payload's dtype tag, metadata recomputed exactly."""
    from rle_array_spark.codecs.typed import DTYPE_CODES, typed_payload_stats

    def kernel(batches):
        for batch in batches:
            if not batch.num_rows:
                continue
            codecs_col = batch.column("codec").to_pylist()
            payload_col = batch.column("payload")
            n_col = batch.column("n_values").to_numpy(zero_copy_only=False).astype(np.int64)
            n_rows = batch.num_rows
            new_codecs: list[str] = []
            new_payloads: list[bytes] = []
            vtypes: list[str] = []
            new_n = np.empty(n_rows, dtype=np.int32)
            n_runs = np.empty(n_rows, dtype=np.int32)
            null_count = np.empty(n_rows, dtype=np.int32)
            vmin = np.full(n_rows, np.nan)
            vmax = np.full(n_rows, np.nan)
            raw_bytes = np.empty(n_rows, dtype=np.int64)
            for i in range(n_rows):
                nv = int(n_col[i])
                c, p, nn = row_fn(
                    codecs_col[i], memoryview(payload_col[i].as_buffer()), nv
                )
                new_codecs.append(c)
                new_payloads.append(p)
                new_n[i] = nn
                r, nc, lo, hi, _ = typed_payload_stats(c, p, nn)
                n_runs[i], null_count[i] = r, nc
                if lo is not None:
                    vmin[i], vmax[i] = lo, hi
                dt = DTYPE_CODES[p[0]]
                vtypes.append(str(dt))
                raw_bytes[i] = nn * dt.itemsize
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    batch.column("source"),
                    pa.array(vtypes, type=pa.string()),
                    pa.array(new_codecs, type=pa.string()),
                    pa.array(new_payloads, type=pa.binary()),
                    pa.array(new_n),
                    pa.array(n_runs),
                    pa.array(null_count),
                    pa.array(vmin),
                    pa.array(vmax),
                    pa.array(raw_bytes),
                    pa.array(np.array([len(p) for p in new_payloads], dtype=np.int64)),
                ],
                names=[
                    "doc_id", "source", "vtype", "codec", "payload", "n_values",
                    "n_runs", "null_count", "val_min", "val_max", "raw_bytes",
                    "encoded_bytes",
                ],
            )

    return blocks.select(
        "doc_id", "source", "codec", "payload", "n_values"
    ).mapInArrow(kernel, TYPED_BLOCKS_SCHEMA)


def fillna_typed_df(blocks: DataFrame, value=None, method: str | None = None) -> DataFrame:
    """fillna over typed encoded blocks (reference array.py:902-911) —
    compressed-domain: ffill is a header-only rewrite (the body already
    forward-fills nulls), fillna(value) rewrites null runs on the run grid;
    bfill decodes. Shuffle-free; length unchanged."""
    from rle_array_spark.codecs.typed import fillna_typed

    def row_fn(c, p, n):
        nc, np_ = fillna_typed(c, p, n, value=value, method=method)
        return nc, np_, n

    return _block_transform_df(blocks, row_fn)


def shift_typed_df(blocks: DataFrame, periods: int) -> DataFrame:
    """Positional shift within each sequence (reference array.py:875-900):
    vacated slots become null. Run-domain for trle (codecs/typed.shift_typed),
    shuffle-free, length unchanged."""
    from rle_array_spark.codecs.typed import shift_typed

    def row_fn(c, p, n):
        nc, np_ = shift_typed(c, p, n, periods)
        return nc, np_, n

    return _block_transform_df(blocks, row_fn)


def dropna_typed_df(blocks: DataFrame) -> DataFrame:
    """dropna over typed encoded blocks (reference _algorithms.py:174-199):
    run lengths shrink by their null counts, computed from the in-payload
    validity RLE — O(runs) per block, no decode on the trle path.
    n_values reflects the post-drop length."""
    from rle_array_spark.codecs.typed import dropna_typed

    return _block_transform_df(blocks, dropna_typed)


TYPED_REDUCTIONS_SCHEMA = (
    "doc_id string, source string, n_runs int, null_count int, "
    "val_min double, val_max double, val_sum double"
)


def typed_block_reductions_df(blocks: DataFrame) -> DataFrame:
    """Recompute per-block stats from the PAYLOADS (compressed-domain for
    trle/tdict — run values × per-run valid counts, table × code counts —
    see codecs.typed.typed_payload_stats). The audit primitive for typed
    blocks: comparing this against the stored metadata columns catches
    payload corruption without decoding a single array."""
    from rle_array_spark.codecs.typed import typed_payload_stats

    def kernel(batches):
        for batch in batches:
            if not batch.num_rows:
                continue
            codecs_col = batch.column("codec").to_pylist()
            n_col = batch.column("n_values").to_numpy(zero_copy_only=False).astype(np.int64)
            payload_col = batch.column("payload")
            n_rows = batch.num_rows
            n_runs = np.empty(n_rows, dtype=np.int32)
            null_count = np.empty(n_rows, dtype=np.int32)
            vmin = np.full(n_rows, np.nan)
            vmax = np.full(n_rows, np.nan)
            vsum = np.full(n_rows, np.nan)
            for i in range(n_rows):
                r, nc, lo, hi, s = typed_payload_stats(
                    codecs_col[i],
                    memoryview(payload_col[i].as_buffer()),
                    int(n_col[i]),
                )
                n_runs[i], null_count[i] = r, nc
                if lo is not None:
                    vmin[i], vmax[i], vsum[i] = lo, hi, s
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    batch.column("source"),
                    pa.array(n_runs),
                    pa.array(null_count),
                    pa.array(vmin),
                    pa.array(vmax),
                    pa.array(vsum),
                ],
                names=[
                    "doc_id", "source", "n_runs", "null_count",
                    "val_min", "val_max", "val_sum",
                ],
            )

    return blocks.select(
        "doc_id", "source", "codec", "payload", "n_values"
    ).mapInArrow(kernel, TYPED_REDUCTIONS_SCHEMA)


def decode_typed_df(blocks: DataFrame, elem_type: str) -> DataFrame:
    """Typed blocks → (doc_id, source, vals array<elem_type>) with element
    nulls restored; values bit-identical to the encoded input."""

    def kernel(batches):
        for batch in batches:
            if not batch.num_rows:
                continue
            codecs_col = batch.column("codec").to_pylist()
            n_col = batch.column("n_values").to_numpy(zero_copy_only=False).astype(np.int64)
            payload_col = batch.column("payload")
            parts, masks = [], []
            any_null = False
            for i in range(batch.num_rows):
                vals, valid = decode_typed(
                    codecs_col[i],
                    memoryview(payload_col[i].as_buffer()),
                    int(n_col[i]),
                )
                parts.append(vals)
                masks.append(valid)
                any_null = any_null or valid is not None
            flat = (
                np.concatenate(parts)
                if parts
                else np.zeros(0, dtype=np.float64)
            )
            offsets = np.concatenate(([0], np.cumsum(n_col, dtype=np.int64)))
            if any_null:
                invalid = np.zeros(flat.size, dtype=bool)
                for i, m in enumerate(masks):
                    if m is not None:
                        invalid[offsets[i] : offsets[i + 1]] = ~m
                child = pa.array(flat, mask=invalid)
            else:
                child = pa.array(flat)
            lists = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), child)
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), batch.column("source"), lists],
                names=["doc_id", "source", "vals"],
            )

    schema = f"doc_id string, source string, vals array<{elem_type}>"
    return blocks.select("doc_id", "source", "codec", "payload", "n_values").mapInArrow(
        kernel, schema
    )


def _typed_rewrite_df(blocks: DataFrame, row_op, n_values_fn) -> DataFrame:
    """Per-block payload rewrite with a length map that depends only on the
    OLD length: ``row_op(codec, payload, n) -> (codec, payload)``,
    ``n_values_fn(n) -> new_n``. Thin adapter over _block_transform_df
    (which allows fully dynamic lengths, e.g. dropna)."""

    def fn(c, p, n):
        nc, np_ = row_op(c, p, n)
        return nc, np_, n_values_fn(n)

    return _block_transform_df(blocks, fn)


def take_typed_df(
    blocks: DataFrame,
    stride: int | None = None,
    offset: int = 0,
    indices=None,
) -> DataFrame:
    """Positional gather over typed blocks — the any-dtype analog of
    engine.take_blocks (stride grid or explicit sorted indices clipped per
    block; repeats allowed). Run-domain for trle (codecs/typed_zip.take_typed),
    with exact metadata recompute."""
    from rle_array_spark.codecs.typed_zip import take_typed

    if (stride is None) == (indices is None):
        raise ValueError("exactly one of stride / indices is required")
    if stride is not None and (stride < 1 or offset < 0):
        raise ValueError(f"need stride >= 1 and offset >= 0, got {stride}/{offset}")
    if indices is not None:
        idx_global = np.asarray(indices, dtype=np.int64)
        if idx_global.size:
            if idx_global[0] < 0:
                raise ValueError("indices must be non-negative")
            if np.any(np.diff(idx_global) < 0):
                raise ValueError("indices must be sorted non-decreasing")

    def row_op(codec, payload, n):
        if stride is not None:
            idx = np.arange(offset, n, stride, dtype=np.int64)
        else:
            idx = idx_global[: int(np.searchsorted(idx_global, n))]
        return take_typed(codec, payload, n, idx)

    def n_values_fn(n):
        if stride is not None:
            return max(0, (n - offset + stride - 1) // stride) if n > offset else 0
        return int(np.searchsorted(idx_global, n))

    return _typed_rewrite_df(blocks, row_op, n_values_fn)


def reverse_typed_df(blocks: DataFrame) -> DataFrame:
    """Reversed typed blocks (negative-step slice) — run-domain, O(n_runs)
    for trle."""
    from rle_array_spark.codecs.typed_zip import reverse_typed

    return _typed_rewrite_df(blocks, reverse_typed, lambda n: n)


def value_counts_typed_df(blocks: DataFrame, elem_type: str) -> DataFrame:
    """Value histogram from typed payloads: per-block (value, partial
    count) pairs in one shuffle-free pass (codecs/typed_zip.
    value_counts_typed — run values weighted by lengths for trle, code
    bincount for tdict; null slots excluded), merged with a relational
    groupBy that shuffles only distinct values. Returns (doc_id, value,
    count); NaNs group as one key (bit-view grouping)."""

    def kernel(batches):
        from rle_array_spark.codecs.typed_zip import value_counts_typed

        for batch in batches:
            if not batch.num_rows:
                continue
            codecs_col = batch.column("codec").to_pylist()
            payload_col = batch.column("payload")
            n_col = batch.column("n_values").to_numpy(zero_copy_only=False)
            doc_ids = batch.column("doc_id").to_pylist()
            out_docs: list[str] = []
            parts: list[np.ndarray] = []
            counts_parts: list[np.ndarray] = []
            for i in range(batch.num_rows):
                vals, counts = value_counts_typed(
                    codecs_col[i],
                    memoryview(payload_col[i].as_buffer()),
                    int(n_col[i]),
                )
                if vals.size:
                    out_docs.extend([doc_ids[i]] * vals.size)
                    parts.append(vals)
                    counts_parts.append(counts)
            if out_docs:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(out_docs, type=pa.string()),
                        pa.array(np.concatenate(parts)),
                        pa.array(np.concatenate(counts_parts)),
                    ],
                    names=["doc_id", "value", "count"],
                )

    partials = blocks.select("doc_id", "codec", "payload", "n_values").mapInArrow(
        kernel, f"doc_id string, value {elem_type}, count long"
    )
    from pyspark.sql import functions as F

    return partials.groupBy("doc_id", "value").agg(F.sum("count").alias("count"))


def doc_quantiles_typed_df(
    blocks: DataFrame,
    elem_type: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
    interpolation: str = "lower",
) -> DataFrame:
    """Exact per-doc discrete quantiles over a typed column, computed from
    the compressed value-counts histogram (nulls excluded by construction;
    float NaN sorts LAST — the Spark/NumPy convention). Same ceil(p·n)
    pick and binary-exact-probability contract as the token-side
    ``engine.source_quantiles_df``; the shuffle carries only (doc, value,
    count) tuples.

    ``interpolation='linear'`` mirrors engine.source_quantiles_df's
    pandas/numpy-linear variant (reference decode-fallback convention,
    array.py:537-554): h = (n-1)p, interpolate between the two order
    statistics from the same cumulative column; output DOUBLE. Numeric
    element types only (linear interpolation of timestamps/bools is not
    defined here)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if interpolation not in ("lower", "linear"):
        raise ValueError(f"interpolation must be 'lower' or 'linear', got {interpolation!r}")
    for p in probs:
        if not (0 < p <= 1) or (p * 2**32) != int(p * 2**32):
            raise ValueError(f"probability {p} is not a binary-exact fraction")
    vc = value_counts_typed_df(blocks, elem_type)
    w_cum = (
        Window.partitionBy("doc_id")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = vc.withColumn("cum", F.sum("count").over(w_cum)).withColumn(
        "n_vals", F.sum("count").over(Window.partitionBy("doc_id"))
    )
    from rle_array_spark.engine import quantile_aggs

    return cum.groupBy("doc_id", "n_vals").agg(
        *quantile_aggs("n_vals", probs, interpolation)
    )
