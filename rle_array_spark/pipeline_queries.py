"""Driver-contract queries + DuckDB oracles for the pipeline operators.

The oracle SQL re-derives every hash from the same md5 primitives, so a
Spark-side logic bug (wrong shingling, band slicing, bit packing, cosine
fold) breaks the cross-engine hash match. Registered into the main registry
by queries.py."""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rle_array_spark import pipeline as P

SHINGLE_K = P.SHINGLE_K
NUM_HASHES = P.NUM_HASHES
BANDS = P.BANDS
R = P.ROWS_PER_BAND


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


# ---- shared oracle CTEs ----------------------------------------------------

_D_CTE = f"""d AS (
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, text, source
    FROM documents WHERE length(text) >= {SHINGLE_K}
)"""

# Shingles as 32-bit md5-prefix base hashes, positions capped at
# SHINGLE_CAP — byte-for-byte the scheme in pipeline.shingle_sets (r5
# scale hardening: the string never leaves the lambda).
_SH_CTE = f"""sh AS (
    SELECT doc_id,
           list_distinct(list_transform(
               range(1, least(length(text) - {SHINGLE_K} + 1, {P.SHINGLE_CAP}) + 1),
               i -> ('0x' || substring(md5(substring(text, i, {SHINGLE_K})), 1, 8))::BIGINT
           )) AS shingles
    FROM d
)"""

# Same universal-hash scheme as pipeline.minhash_signatures: the shingle
# base hash h -> per-slot (a_j*h + b_j) mod (2^31-1), all int64
# arithmetic DuckDB reproduces bit-identically.
_SIG_LIST = ", ".join(
    f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {P.MINHASH_PRIME}))"
    for a, b in P.minhash_coeffs(NUM_HASHES)
)
_SIG_CTE = f"""sig AS (
    SELECT doc_id, [{_SIG_LIST}] AS sig
    FROM (SELECT doc_id, shingles AS hs FROM sh)
)"""

_BANDS_CTE = f"""bands AS (
    SELECT doc_id, t.i AS band_idx,
           ('0x' || substring(md5(array_to_string(
               list_transform(sig[t.i * {R} + 1 : t.i * {R} + {R}],
                              x -> CAST(x AS VARCHAR)), '|')), 1, 15))::BIGINT AS band_key
    FROM sig, range({BANDS}) t(i)
)"""

_CAND_CTE = """cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)"""

_WORDS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')"


# ---- queries ----------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.exact_dedup_groups(_docs(spark, sf_dir))


ORACLE_DEDUP_EXACT = f"""WITH {_D_CTE}
SELECT md5(text) AS text_hash,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS representative
FROM d GROUP BY md5(text) HAVING count(*) > 1"""


def q_dedup_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.minhash_candidate_pairs(_docs(spark, sf_dir))


ORACLE_MINHASH_CAND = f"""WITH {_D_CTE}, {_SH_CTE}, {_SIG_CTE}, {_BANDS_CTE}, {_CAND_CTE}
SELECT doc_a, doc_b FROM cand"""


def q_dedup_jaccard_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.near_dup_pairs_jaccard(_docs(spark, sf_dir), threshold=0.8)


ORACLE_JACCARD = f"""WITH {_D_CTE}, {_SH_CTE}, {_SIG_CTE}, {_BANDS_CTE}, {_CAND_CTE}
SELECT c.doc_a, c.doc_b,
       round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
             / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6) AS jaccard
FROM cand c
JOIN sh sa ON sa.doc_id = c.doc_a
JOIN sh sb ON sb.doc_id = c.doc_b
WHERE round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
            / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6) >= 0.8"""


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.dedup_survivors(_docs(spark, sf_dir), threshold=0.8)


# The full pipeline replayed in SQL: `d` is rebound to the exact-dedup
# representatives, so the shared shingle/signature/band/candidate CTEs run
# over the post-exact-dedup corpus exactly like the Spark path.
ORACLE_DEDUP_SURVIVORS = f"""WITH d0 AS (
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, text, source
    FROM documents WHERE length(text) >= {SHINGLE_K}
), reps AS (
    SELECT min(doc_id) AS doc_id FROM d0 GROUP BY md5(text)
), d AS (
    SELECT d0.* FROM d0 JOIN reps USING (doc_id)
), {_SH_CTE}, {_SIG_CTE}, {_BANDS_CTE}, {_CAND_CTE},
ver AS (
    SELECT c.doc_b
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.doc_a
    JOIN sh sb ON sb.doc_id = c.doc_b
    WHERE round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
                / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6) >= 0.8
)
SELECT doc_id, source, CAST(length(text) AS INT) AS n_chars
FROM d WHERE doc_id NOT IN (SELECT doc_b FROM ver)"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.simhash(_docs(spark, sf_dir))


def _simhash_oracle() -> str:
    sums = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(P.SIMHASH_BITS)
    )
    pack = " + ".join(
        f"CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(P.SIMHASH_BITS)
    )
    return f"""WITH {_D_CTE},
w AS (SELECT doc_id, unnest({_WORDS}) AS w FROM d),
h AS (SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) AS h FROM w),
b AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id)
SELECT doc_id, CAST({pack} AS BIGINT) AS simhash FROM b"""


ORACLE_SIMHASH = _simhash_oracle()


def q_knn_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.knn_top1(_emb(spark, sf_dir), n_queries=10)


ORACLE_KNN_TOP1 = """WITH q AS (
    SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 10
), c AS (
    SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings WHERE vec_id >= 10
), s AS (
    SELECT qid, cid,
           round(list_dot_product(qe, ce)
                 / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))), 9) AS cos
    FROM q, c
), r AS (
    SELECT qid, cid, cos,
           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rk
    FROM s
)
SELECT qid, cid AS nn_id, round(cos, 6) AS cos_sim FROM r WHERE rk = 1"""


def q_cosine_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.cosine_pairs_lsh(_emb(spark, sf_dir), threshold=0.35, anchor_ids=150)


def _duck_lsh_buckets(n_tables: int, n_planes: int, dim: int) -> str:
    """DuckDB expression re-deriving the Spark squared-LCG sign-LSH buckets
    bit-identically (shared by the signlsh and cosine-pairs oracles)."""
    m = f"((1103515245 * ((t * {n_planes} + p) * 131 + j) + 12345) % 2147483648)"
    plane = f"((({m} * {m}) % 2147483647)/1073741823.5 - 1.0)"
    dot = f"list_sum(list_transform(range(0, {dim}), j -> emb[j+1] * {plane}))"
    return (
        f"list_transform(range(0, {n_tables}), t ->"
        f" list_sum(list_transform(range(0, {n_planes}), p ->"
        f" CASE WHEN {dot} > 0 THEN (1 << p) ELSE 0 END)))"
    )


def _cosine_pairs_lsh_oracle(
    threshold: float = 0.35,
    n_tables: int = P.PAIRS_LSH_TABLES,
    n_planes: int = P.PAIRS_LSH_PLANES,
    dim: int = 64,
    anchor_ids: int = 150,
) -> str:
    cos_ab = (
        "round(list_dot_product(a.emb, b.emb) / (sqrt(list_dot_product(a.emb, a.emb))"
        " * sqrt(list_dot_product(b.emb, b.emb))), 6)"
    )
    return f"""WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
), b AS (
    SELECT vec_id, {_duck_lsh_buckets(n_tables, n_planes, dim)} AS buckets FROM e
), idx AS (
    SELECT vec_id, unnest(buckets) AS bucket, generate_subscripts(buckets, 1) AS t
    FROM b
), cand AS (
    SELECT DISTINCT q.vec_id AS ida, c.vec_id AS idb
    FROM idx q JOIN idx c ON q.t = c.t AND q.bucket = c.bucket
    WHERE q.vec_id < c.vec_id
), verified AS (
    SELECT cand.ida, cand.idb, {cos_ab} AS cos_sim
    FROM cand JOIN e a ON cand.ida = a.vec_id JOIN e b ON cand.idb = b.vec_id
    WHERE {cos_ab} >= {threshold}
), exact AS (
    SELECT a.vec_id AS ida, b.vec_id AS idb
    FROM e a, e b
    WHERE a.vec_id < b.vec_id AND a.vec_id < {anchor_ids} AND b.vec_id < {anchor_ids}
      AND {cos_ab} >= {threshold}
), rec AS (
    SELECT COALESCE(round(avg(CASE WHEN v.ida IS NOT NULL THEN 1 ELSE 0 END), 3), 1.0)
               AS recall_vs_bruteforce
    FROM exact x LEFT JOIN verified v ON x.ida = v.ida AND x.idb = v.idb
)
SELECT verified.ida, verified.idb, verified.cos_sim, rec.recall_vs_bruteforce
FROM verified, rec"""


ORACLE_COSINE_PAIRS_LSH = _cosine_pairs_lsh_oracle()


def q_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.ivf_knn_top1(_emb(spark, sf_dir), n_queries=10)


def _ivf_oracle(n_queries: int = 10, n_clusters: int = P.IVF_CLUSTERS,
                nprobe: int = P.IVF_NPROBE) -> str:
    """DuckDB re-derivation of the IVF-flat path: identical seed centroids
    (first n_clusters candidate vectors), identical nearest-cell
    assignment and probe ranking (list_dot_product cosine, ties to the
    smaller cent_id — rank margins >= 5e-05 on every sf, so no rounding is
    needed before ranking), identical inverted-list join and top-1 pick."""
    nq = n_queries
    return f"""WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
), cent AS (
    SELECT vec_id - {nq} AS cent_id, emb AS cemb FROM e
    WHERE vec_id >= {nq} AND vec_id < {nq + n_clusters}
), cand AS (
    SELECT vec_id AS cid, emb AS ce FROM e WHERE vec_id >= {nq}
), q AS (
    SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id < {nq}
), assign AS (
    SELECT cid, cent_id FROM (
        SELECT cid, cent_id,
               row_number() OVER (PARTITION BY cid ORDER BY
                   list_dot_product(ce, cemb)
                   / (sqrt(list_dot_product(ce, ce)) * sqrt(list_dot_product(cemb, cemb)))
                   DESC, cent_id ASC) AS rk
        FROM cand, cent)
    WHERE rk = 1
), probe AS (
    SELECT qid, cent_id FROM (
        SELECT qid, cent_id,
               row_number() OVER (PARTITION BY qid ORDER BY
                   list_dot_product(qe, cemb)
                   / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(cemb, cemb)))
                   DESC, cent_id ASC) AS rk
        FROM q, cent)
    WHERE rk <= {nprobe}
), pairs AS (
    SELECT qid, cid FROM probe JOIN assign USING (cent_id)
), scored AS (
    SELECT qid, cid,
           round(list_dot_product(qe, ce)
                 / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))), 9) AS cos
    FROM pairs JOIN q USING (qid) JOIN cand USING (cid)
), ivf AS (
    SELECT qid, cid AS ivf_nn_id FROM (
        SELECT qid, cid,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rk
        FROM scored)
    WHERE rk = 1
), ncand AS (
    SELECT qid, CAST(count(*) AS BIGINT) AS n_cand FROM pairs GROUP BY qid
), exact AS (
    SELECT qid, cid AS exact_nn_id FROM (
        SELECT qid, cid,
               row_number() OVER (PARTITION BY qid ORDER BY
                   round(list_dot_product(qe, ce)
                         / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))), 9)
                   DESC, cid ASC) AS rk
        FROM q, cand)
    WHERE rk = 1
), joined AS (
    SELECT e2.qid, e2.exact_nn_id,
           coalesce(i.ivf_nn_id, -1) AS ivf_nn_id,
           coalesce(n.n_cand, 0) AS n_cand,
           CASE WHEN coalesce(i.ivf_nn_id, -1) = e2.exact_nn_id THEN 1 ELSE 0 END AS hit
    FROM exact e2 LEFT JOIN ivf i USING (qid) LEFT JOIN ncand n USING (qid)
)
SELECT qid, exact_nn_id, ivf_nn_id, n_cand, hit,
       round(avg(hit) OVER (), 3) AS recall_vs_bruteforce
FROM joined"""


ORACLE_IVF_KNN = _ivf_oracle()


def q_signlsh_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.signlsh_knn_top1(_emb(spark, sf_dir), n_queries=10)


def _signlsh_oracle(n_queries: int = 10, n_tables: int = P.LSH_TABLES,
                    n_planes: int = P.LSH_PLANES, dim: int = 64) -> str:
    """DuckDB re-derivation of the multi-table sign-LSH path: identical
    squared-LCG hyperplanes (pure integer arithmetic), identical bucket
    join, identical top-1 ordering — so the hash match verifies the
    approximate path end-to-end, including its self-reported recall."""
    buckets = _duck_lsh_buckets(n_tables, n_planes, dim)
    cos = (
        "round(list_dot_product(qe, ce) / (sqrt(list_dot_product(qe, qe))"
        " * sqrt(list_dot_product(ce, ce))), 9)"
    )
    return f"""WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
), b AS (
    SELECT vec_id, {buckets} AS buckets FROM e
), idx AS (
    SELECT vec_id, unnest(buckets) AS bucket, generate_subscripts(buckets, 1) AS t
    FROM b
), cand AS (
    SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
    FROM idx q JOIN idx c ON q.t = c.t AND q.bucket = c.bucket
    WHERE q.vec_id < {n_queries} AND c.vec_id >= {n_queries}
), qv AS (SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id < {n_queries}),
cv AS (SELECT vec_id AS cid, emb AS ce FROM e WHERE vec_id >= {n_queries}),
scored AS (
    SELECT cand.qid, cand.cid, {cos} AS cos
    FROM cand JOIN qv USING (qid) JOIN cv USING (cid)
), lsh AS (
    SELECT qid, cid AS lsh_nn_id FROM (
        SELECT qid, cid,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rk
        FROM scored) WHERE rk = 1
), nc AS (
    SELECT qid, CAST(count(*) AS BIGINT) AS n_cand FROM cand GROUP BY qid
), exact AS (
    SELECT qid, cid AS exact_nn_id FROM (
        SELECT qid, cid,
               row_number() OVER (PARTITION BY qid ORDER BY {cos} DESC, cid ASC) AS rk
        FROM qv, cv) WHERE rk = 1
), out0 AS (
    SELECT x.qid, x.exact_nn_id,
           COALESCE(l.lsh_nn_id, -1) AS lsh_nn_id,
           COALESCE(nc.n_cand, 0) AS n_cand,
           CAST(COALESCE(l.lsh_nn_id, -1) = x.exact_nn_id AS INT) AS hit
    FROM exact x LEFT JOIN lsh l USING (qid) LEFT JOIN nc USING (qid)
)
SELECT qid, exact_nn_id, lsh_nn_id, n_cand, hit,
       round(avg(hit) OVER (), 3) AS recall_vs_bruteforce
FROM out0"""


ORACLE_SIGNLSH = _signlsh_oracle()


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.lang_id(_docs(spark, sf_dir))


def _ratio_sql(stops: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{s}'" for s in stops)
    return f"len(list_filter({_WORDS}, x -> x in ({lst}))) / greatest(len({_WORDS}), 1)"


ORACLE_LANG_ID = f"""WITH {_D_CTE},
r AS (
    SELECT doc_id, source,
           {_ratio_sql(P.EN_STOP)} AS r_en,
           {_ratio_sql(P.DE_STOP)} AS r_de,
           {_ratio_sql(P.FR_STOP)} AS r_fr,
           {_ratio_sql(P.ES_STOP)} AS r_es
    FROM d
)
SELECT doc_id, source,
       CASE WHEN r_en >= r_de AND r_en >= r_fr AND r_en >= r_es THEN 'en'
            WHEN r_de >= r_fr AND r_de >= r_es THEN 'de'
            WHEN r_fr >= r_es THEN 'fr' ELSE 'es' END AS pred_lang
FROM r"""


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.quality_scores(_docs(spark, sf_dir))


ORACLE_QUALITY = f"""WITH {_D_CTE}
SELECT doc_id,
       CAST(len({_WORDS}) AS INT) AS n_words,
       round(list_sum(list_transform({_WORDS}, x -> length(x))) / greatest(len({_WORDS}), 1), 6) AS mean_word_len,
       round(len(regexp_extract_all(text, '[.,;:!?]')) / length(text), 6) AS punct_ratio,
       round(len(list_filter({_WORDS}, x -> x in ('the','and','of','to','in','is','a')))
             / greatest(len({_WORDS}), 1), 6) AS stop_ratio,
       round(least(len({_WORDS}) / 100.0, 1.0) * 0.4
             + round(len(list_filter({_WORDS}, x -> x in ('the','and','of','to','in','is','a')))
                / greatest(len({_WORDS}), 1), 6) * 0.4
             + least(round(len(regexp_extract_all(text, '[.,;:!?]')) / length(text), 6) * 10, 1.0) * 0.2, 4) AS quality
FROM d"""


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.token_counts(_docs(spark, sf_dir))


ORACLE_TOKEN_COUNTS = f"""WITH {_D_CTE}
SELECT doc_id,
       CAST(len({_WORDS}) AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS bpe_ish_tokens,
       CAST(length(text) AS INT) AS n_chars
FROM d"""


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.doc_fingerprints(_docs(spark, sf_dir))


ORACLE_FINGERPRINTS = """SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       CAST(list_reduce(list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT)),
                        (a, x) -> (a * 31 + x) % 2147483647) AS BIGINT) AS fingerprint
FROM documents WHERE length(text) > 0"""


def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.extract_image_features(P.fake_image_table(_docs(spark, sf_dir)))


ORACLE_IMAGE_FEATURES = f"""WITH {_D_CTE}
SELECT doc_id,
       CAST(('0x' || substr(md5(text), 1, 2)) AS INT) AS width,
       CAST(('0x' || substr(md5(text), 3, 2)) AS INT) AS height,
       CAST(list_sum(list_transform(range(0, 16),
                                    i -> CAST(('0x' || substr(md5(text), i * 2 + 1, 2)) AS INT))) AS BIGINT)
           AS byte_sum,
       CAST(16 AS INT) AS n_bytes
FROM d"""


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    feats = P.extract_audio_features(P.fake_audio_table(_docs(spark, sf_dir)))
    return feats.withColumn("duration_ms", F.round("duration_ms", 3))


def _hexbyte(expr: str, i: str) -> str:
    """DuckDB: byte ``i`` (0-based) of the hex string ``expr`` as INT."""
    return f"CAST(('0x' || substr({expr}, ({i}) * 2 + 1, 2)) AS INT)"


ORACLE_AUDIO_FEATURES = f"""WITH {_D_CTE},
h AS (SELECT doc_id, md5(text) || md5(text || '2') AS hx FROM d),
b AS (
    SELECT doc_id,
           {_hexbyte('hx', '0')} AS b0,
           {_hexbyte('hx', '1')} AS b1,
           {_hexbyte('hx', '2')} AS b2,
           list_sum(list_transform(range(0, 32),
                    i -> CAST({_hexbyte('hx', 'i')} AS BIGINT)
                         * CAST({_hexbyte('hx', 'i')} AS BIGINT))) AS energy
    FROM h
)
SELECT doc_id,
       CAST(8000 + b0 * 64 AS INT) AS sample_rate,
       CAST(b1 * 256 + b2 AS INT) AS n_samples,
       round((b1 * 256 + b2) * 1000.0 / (8000 + b0 * 64), 3) AS duration_ms,
       CAST(energy AS BIGINT) AS energy
FROM b"""


def q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.frame_sample(P.fake_video_table(_docs(spark, sf_dir)), stride=2)


ORACLE_VIDEO_FRAME_SAMPLE = f"""WITH {_D_CTE},
h AS (SELECT doc_id, md5(text) || md5(text || 'f1') || md5(text || 'f2') AS hx FROM d),
f AS (SELECT doc_id, hx, unnest([0, 2]) AS frame_idx FROM h)
SELECT doc_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(list_sum(list_transform(range(0, 16),
            i -> CAST({_hexbyte('hx', 'frame_idx * 16 + i')} AS BIGINT))) AS BIGINT)
           AS frame_sum
FROM f"""


def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.resize_image(P.fake_image_table(_docs(spark, sf_dir)))


ORACLE_IMAGE_RESIZE = f"""WITH {_D_CTE},
h AS (SELECT doc_id, md5(text) AS hx FROM d)
SELECT doc_id,
       CAST(8 AS INT) AS n_out,
       CAST(list_sum(list_transform(range(0, 8),
            i -> CAST(({_hexbyte('hx', 'i * 2')} + {_hexbyte('hx', 'i * 2 + 1')}) // 2 AS BIGINT)))
           AS BIGINT) AS out_sum
FROM h"""


def pipeline_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_candidates": q_dedup_minhash_candidates,
        "dedup_jaccard_verified": q_dedup_jaccard_verified,
        "dedup_simhash": q_dedup_simhash,
        "dedup_survivors": q_dedup_survivors,
        "knn_top1_cosine": q_knn_top1,
        "cosine_pairs_lsh": q_cosine_pairs_lsh,
        "signlsh_knn_top1": q_signlsh_knn,
        "ivf_knn_top1": q_ivf_knn,
        "lang_id": q_lang_id,
        "quality_scores": q_quality_scores,
        "token_counts": q_token_counts,
        "doc_fingerprints": q_doc_fingerprints,
        "image_features": q_image_features,
        "audio_features": q_audio_features,
        "video_frame_sample": q_video_frame_sample,
        "image_resize": q_image_resize,
    }


def pipeline_oracles() -> dict[str, str]:
    return {
        "dedup_exact": ORACLE_DEDUP_EXACT,
        "dedup_minhash_candidates": ORACLE_MINHASH_CAND,
        "dedup_jaccard_verified": ORACLE_JACCARD,
        "dedup_simhash": ORACLE_SIMHASH,
        "dedup_survivors": ORACLE_DEDUP_SURVIVORS,
        "knn_top1_cosine": ORACLE_KNN_TOP1,
        "cosine_pairs_lsh": ORACLE_COSINE_PAIRS_LSH,
        "signlsh_knn_top1": ORACLE_SIGNLSH,
        "ivf_knn_top1": ORACLE_IVF_KNN,
        "lang_id": ORACLE_LANG_ID,
        "quality_scores": ORACLE_QUALITY,
        "token_counts": ORACLE_TOKEN_COUNTS,
        "doc_fingerprints": ORACLE_FINGERPRINTS,
        "image_features": ORACLE_IMAGE_FEATURES,
        "audio_features": ORACLE_AUDIO_FEATURES,
        "video_frame_sample": ORACLE_VIDEO_FRAME_SAMPLE,
        "image_resize": ORACLE_IMAGE_RESIZE,
    }
