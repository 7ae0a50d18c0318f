"""Feature-engineering queries: deterministic encoding (SURVEY §2 J1/J6),
flag recodes + string parsing (B6/I1/J3/J7), PSI drift (D8/J8), and the
multimodal mapInPandas path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mle_proj_datapipeline_spark.functions.core import binary_flag, parse_leading_int
from mle_proj_datapipeline_spark.operators.encode import (
    build_dictionary,
    dictionary_encode,
    one_hot,
)
from mle_proj_datapipeline_spark.operators.multimodal import attach_binary, byte_stats
from mle_proj_datapipeline_spark.operators.psi import psi
from mle_proj_datapipeline_spark.plans.registry import register
from mle_proj_datapipeline_spark.sources.catalog import load_table


# --------------------------------------------------------------------------
# J6: dictionary (label) encoding — deterministic, dictionary-driven
# --------------------------------------------------------------------------
@register(
    "dict_encode_priority",
    oracle="""
    WITH d AS (
        SELECT o_orderpriority AS value,
               row_number() OVER (ORDER BY count(*) DESC, o_orderpriority ASC) - 1 AS idx
        FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY o_orderpriority)
    SELECT o.o_orderpriority AS priority,
           coalesce(d.idx, -1) AS priority_idx, count(*) AS n
    FROM orders o LEFT JOIN d ON d.value = o.o_orderpriority
    GROUP BY 1, 2
    """,
)
def dict_encode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global dictionary (count DESC, value ASC) + broadcast-join encode —
    the deterministic replacement for per-batch StringIndexer.fit
    (SURVEY §4.2)."""
    o = load_table(spark, sf_dir, "orders")
    d = build_dictionary(o, "o_orderpriority")
    return (
        dictionary_encode(o, "o_orderpriority", d, "priority_idx")
        .groupBy(F.col("o_orderpriority").alias("priority"), "priority_idx")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# J1: fixed-width one-hot encoding
# --------------------------------------------------------------------------
@register(
    "ohe_segment_profile",
    oracle="""
    SELECT c_nationkey AS nationkey,
           CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS seg_AUTOMOBILE,
           CAST(sum(CASE WHEN c_mktsegment = 'BUILDING'   THEN 1 ELSE 0 END) AS BIGINT) AS seg_BUILDING,
           CAST(sum(CASE WHEN c_mktsegment = 'FURNITURE'  THEN 1 ELSE 0 END) AS BIGINT) AS seg_FURNITURE,
           CAST(sum(CASE WHEN c_mktsegment IN ('AUTOMOBILE','BUILDING','FURNITURE')
                     OR c_mktsegment IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS seg_OTHER
    FROM customer GROUP BY c_nationkey
    """,
)
def ohe_segment_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-category OHE → stable 0/1 columns (+OTHER bucket), summed
    per nation. Column set is fixed regardless of batch contents."""
    c = load_table(spark, sf_dir, "customer")
    cats = ["AUTOMOBILE", "BUILDING", "FURNITURE"]
    ohe = one_hot(c, "c_mktsegment", cats, prefix="seg")
    return ohe.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        *[F.sum(f"seg_{x}").alias(f"seg_{x}") for x in cats],
        F.sum("seg_OTHER").alias("seg_OTHER"),
    )


# --------------------------------------------------------------------------
# B6 + I1 + J7: CASE-WHEN flags and string → int parsing
# --------------------------------------------------------------------------
@register(
    "order_flag_recodes",
    oracle="""
    SELECT CAST(nullif(regexp_extract(o_orderpriority, '([0-9]+)', 1), '') AS INT) AS priority_rank,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_finished,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS is_urgent,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def order_flag_recodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary recodes (pymnt_plan-style, silver_loan_terms.py:23-26),
    leading-int parse (term parse, gold_loan_terms.py:14), and a
    membership target flag (model_operations.py:96) in one projection."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            parse_leading_int("o_orderpriority").alias("priority_rank"),
            binary_flag("o_orderstatus", "F").alias("is_finished"),
            # CASE-semantics membership: NULL priority is NOT urgent
            # (isin alone yields NULL for a NULL input, which would
            # poison the whole column to float on the Arrow boundary —
            # NULL-key fuzz find, round 7)
            F.coalesce(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int"),
                F.lit(0),
            ).alias("is_urgent"),
            "o_totalprice",
        )
        .groupBy("priority_rank", "is_finished", "is_urgent")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# D8/J8: PSI drift between two yearly order-value distributions
# --------------------------------------------------------------------------
@register(
    "psi_totalprice_drift",
    oracle="""
    WITH e AS (SELECT o_totalprice AS v FROM orders
               WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'),
    a AS (SELECT o_totalprice AS v FROM orders
          WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
    bps AS (SELECT list_transform(
                quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
                x -> round(x, 6)) AS b FROM e),
    eb AS (SELECT len(list_filter((SELECT b FROM bps), x -> v > x)) AS bucket FROM e),
    ab AS (SELECT len(list_filter((SELECT b FROM bps), x -> v > x)) AS bucket FROM a),
    ec AS (SELECT bucket, count(*) AS e_cnt FROM eb GROUP BY bucket),
    ac AS (SELECT bucket, count(*) AS a_cnt FROM ab GROUP BY bucket),
    fr AS (
        SELECT greatest(coalesce(e_cnt, 0) / (SELECT count(*) FROM e), 1e-6) AS e_frac,
               greatest(coalesce(a_cnt, 0) / (SELECT count(*) FROM a), 1e-6) AS a_frac
        FROM ec FULL JOIN ac USING (bucket))
    SELECT round(sum((a_frac - e_frac) * ln(a_frac / e_frac)), 4) AS psi
    FROM fr
    """,
)
def psi_totalprice_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI(1995 order values → 1996) with exact decile breakpoints —
    the reference drift trigger's metric (utils/model_operations.py:161-179)."""
    o = load_table(spark, sf_dir, "orders")
    e = o.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select("o_totalprice")
    a = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_totalprice")
    return psi(e, a, "o_totalprice", buckets=10)


# --------------------------------------------------------------------------
# Multimodal: Arrow-batched binary feature extraction (mapInPandas)
# --------------------------------------------------------------------------
@register(
    "multimodal_byte_stats",
    oracle="""
    WITH raw AS (
        SELECT source, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n_bytes
        FROM documents),
    b AS (
        SELECT source, n_bytes,
               CASE WHEN n_bytes = 0 THEN NULL
                    ELSE 16 * (strpos('0123456789ABCDEF', substr(h, 1, 1)) - 1)
                         + (strpos('0123456789ABCDEF', substr(h, 2, 1)) - 1)
               END AS first_byte,
               -- two-hex-digit chunks via regexp_extract_all, NOT
               -- substr(h, 2*i, 1) over range(n): substr on a UTF-8
               -- varchar is O(position), so the indexed form was
               -- O(bytes^2) — 300 s on one 300 KB document (long-docs
               -- fuzz find, round 9); this form is linear and
               -- byte-identical
               coalesce(list_sum(list_transform(regexp_extract_all(h, '..'),
                        s -> 16 * (strpos('0123456789ABCDEF', substr(s, 1, 1)) - 1)
                             + (strpos('0123456789ABCDEF', substr(s, 2, 1)) - 1))), 0)
                   % 997 AS checksum_mod
        FROM raw)
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(min(first_byte) AS INT) AS min_first_byte,
           CAST(sum(checksum_mod) AS BIGINT) AS checksum_total
    FROM b GROUP BY source
    """,
)
def multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: attach blob + metadata struct, extract
    features via Arrow-batched mapInPandas (the decode-shaped path),
    aggregate JVM-side. The oracle reproduces the byte math EXACTLY for
    any UTF-8 text by walking hex(encode(text)) two digits at a time —
    the earlier per-character ascii() form silently assumed ASCII and
    diverged on multi-byte codepoints (caught by the round-7 unicode
    fuzz mutation)."""
    docs = attach_binary(load_table(spark, sf_dir, "documents"))
    stats = byte_stats(docs)
    return stats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("first_byte").alias("min_first_byte"),
        F.sum("checksum_mod").alias("checksum_total"),
    )


@register(
    "image_meta_extract",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
           CAST(doc_id % 64 + 1 AS INT) AS width,
           CAST((doc_id * 7) % 48 + 1 AS INT) AS height
    FROM documents
    """,
)
def image_meta_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode path, end to end: build genuine PNG/JPEG
    payloads per doc (operators/multimodal.attach_synthetic_images —
    actual encoders, dims arithmetic in doc_id), then recover format and
    dimensions with the pure-Python header parser via Arrow-batched
    mapInPandas (decode_image). The oracle predicts what the byte-level
    parse must find — if the PNG writer or parser drifted by one byte,
    the hash compare fails."""
    from mle_proj_datapipeline_spark.operators.multimodal import (
        attach_synthetic_images,
        decode_image,
    )

    docs = load_table(spark, sf_dir, "documents")
    return decode_image(attach_synthetic_images(docs))


@register(
    "audio_feature_extract",
    oracle="""
    WITH p AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS sr,
               doc_id % 500 + 10 AS n,
               (doc_id * 37) % 20000 AS amp
        FROM documents)
    SELECT doc_id,
           CAST(sr AS INT) AS sample_rate,
           CAST(n AS BIGINT) AS n_samples,
           round(n * 1000.0 / sr, 4) AS duration_ms,
           round(CAST(amp AS DOUBLE), 4) AS rms,
           CAST(amp AS INT) AS peak
    FROM p
    """,
)
def audio_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode path, end to end (the WAV twin of
    image_meta_extract): build genuine mono 16-bit PCM RIFF/WAVE blobs
    per doc (operators/multimodal.attach_synthetic_audio — a ±amp
    square wave whose rate/length/amplitude are arithmetic in doc_id),
    then recover sample rate, frame count, duration, RMS and peak by
    actually parsing the RIFF chunks and decoding the PCM samples
    (audio_features, Arrow-batched mapInPandas). A square wave's RMS is
    exactly its amplitude, so every output column is predictable by the
    oracle — one wrong header byte or sample and the hash compare
    fails."""
    from mle_proj_datapipeline_spark.operators.multimodal import (
        attach_synthetic_audio,
        audio_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    return audio_features(attach_synthetic_audio(docs))


@register(
    "video_frame_stats",
    oracle="""
    WITH p AS (
        SELECT doc_id,
               doc_id % 7 + 2 AS n_frames,
               CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 12 ELSE 24 END AS fps,
               doc_id % 16 + 1 AS width,
               (doc_id * 3) % 12 + 1 AS height
        FROM documents),
    f AS (
        SELECT p.*, t.k
        FROM p, range(0, 8) t(k)
        WHERE t.k < p.n_frames AND t.k % 2 = 0)
    SELECT doc_id,
           CAST(n_frames AS INT) AS n_frames,
           CAST(fps AS INT) AS fps,
           CAST(width AS INT) AS width,
           CAST(height AS INT) AS height,
           count(*) AS n_sampled,
           CAST(sum((doc_id * 11 + k * 17) % 256) AS BIGINT) AS sum_mean_px
    FROM f GROUP BY doc_id, n_frames, fps, width, height
    """,
)
def video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video path, end to end (closes the last multimodal stub):
    build a genuine RIFF/AVI container of constant-gray PNG frames per
    doc (operators/multimodal.attach_synthetic_video — frame count,
    fps, dimensions and gray values all arithmetic in doc_id), demux it
    and sample every 2nd frame with real PNG pixel decode
    (sample_frames, flatMap-shaped mapInPandas), then aggregate per
    clip. A constant frame's mean pixel IS its gray value, so the
    oracle predicts every sampled frame's stats — one wrong chunk
    offset or filter byte and the hash compare fails."""
    from mle_proj_datapipeline_spark.operators.multimodal import (
        attach_synthetic_video,
        sample_frames,
    )

    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(attach_synthetic_video(docs), every_n=2)
    return frames.groupBy("doc_id").agg(
        F.max("n_frames").alias("n_frames"),
        F.max("fps").alias("fps"),
        F.max("width").alias("width"),
        F.max("height").alias("height"),
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("mean_px").cast("long").alias("sum_mean_px"),
    )


# --------------------------------------------------------------------------
# Winsorization: percentile-clamped robust feature stats
# --------------------------------------------------------------------------
@register(
    "winsorized_price_stats",
    oracle="""
    WITH b AS (
        SELECT round(quantile_cont(o_totalprice, 0.01), 4) AS p01,
               round(quantile_cont(o_totalprice, 0.99), 4) AS p99
        FROM orders),
    w AS (
        SELECT o_orderpriority,
               least(greatest(o_totalprice, p01), p99) AS clamped
        FROM orders, b)
    SELECT o_orderpriority,
           count(*) AS n,
           round(sum(clamped), 2) AS sum_clamped,
           round(min(clamped), 2) AS min_clamped,
           round(max(clamped), 2) AS max_clamped
    FROM w GROUP BY o_orderpriority
    """,
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (outlier clamping at exact p01/p99) + robust stats
    per priority — the standard heavy-tail treatment before fitting.

    Scale: the percentile bounds are ONE 1-row aggregate broadcast into
    a narrow map clamp — the fact table is scanned twice but never
    shuffled full-width (the group stats shuffle carries partials). At
    100 TB swap F.percentile for percentile_approx (one pass,
    mergeable) exactly as the PSI operator documents."""
    o = load_table(spark, sf_dir, "orders")
    b = o.agg(
        F.round(F.percentile(F.col("o_totalprice"), F.lit(0.01)), 4).alias("p01"),
        F.round(F.percentile(F.col("o_totalprice"), F.lit(0.99)), 4).alias("p99"),
    )
    clamped = F.least(F.greatest(F.col("o_totalprice"), F.col("p01")), F.col("p99"))
    return (
        o.crossJoin(F.broadcast(b))
        .select("o_orderpriority", clamped.alias("clamped"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("clamped"), 2).alias("sum_clamped"),
            F.round(F.min("clamped"), 2).alias("min_clamped"),
            F.round(F.max("clamped"), 2).alias("max_clamped"),
        )
    )


# --------------------------------------------------------------------------
# Group-wise z-score normalization
# --------------------------------------------------------------------------
@register(
    "zscore_acctbal_by_nation",
    oracle="""
    WITH s AS (
        SELECT c_nationkey,
               avg(c_acctbal) AS mu,
               stddev_samp(c_acctbal) AS sigma,
               count(*) AS n
        FROM customer GROUP BY c_nationkey)
    SELECT c.c_custkey,
           c.c_nationkey,
           -- + 0 pins IEEE -0.0 to +0.0: a balance a hair below the
           -- group mean rounds to negative zero in one engine and
           -- positive zero in the other (sf1 sweep find, same pin as
           -- the OLS-trend slope)
           round((c.c_acctbal - s.mu) / s.sigma, 4) + 0 AS z
    FROM customer c JOIN s USING (c_nationkey)
    WHERE s.n >= 2 AND s.sigma > 0
    """,
)
def zscore_acctbal_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise z-score normalization — per-nation standardization of
    a feature before modeling (the distributed form of
    sklearn's groupby-StandardScaler).

    Scale: group stats are a partial-agg shuffle to ~nations rows,
    broadcast back into a narrow map transform — the customer table
    itself never shuffles. Degenerate groups (n < 2 or zero variance)
    are excluded by declared semantics."""
    c = load_table(spark, sf_dir, "customer")
    s = c.groupBy("c_nationkey").agg(
        F.avg("c_acctbal").alias("mu"),
        F.stddev_samp("c_acctbal").alias("sigma"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        c.join(F.broadcast(s), "c_nationkey")
        .filter((F.col("n") >= 2) & (F.col("sigma") > 0))
        .select(
            "c_custkey",
            "c_nationkey",
            # + 0.0 pins IEEE -0.0 (mirrored in the oracle)
            (
                F.round((F.col("c_acctbal") - F.col("mu")) / F.col("sigma"), 4)
                + F.lit(0.0)
            ).alias("z"),
        )
    )
