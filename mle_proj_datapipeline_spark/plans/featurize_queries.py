"""Text featurization: signed feature hashing, corpus-trained bigram LM scoring.

Split from the round-5 analytics module so the per-file freshness
clock tracks one family (the VERDICT r4 item-2 discipline): an edit
here stales only this family's driver rows.

Float parity follows the registry convention (rounding at fixed grids,
integer-exact arithmetic wherever midpoints can land on rounding
boundaries); determinism via total-order tiebreaks and the H31
cross-engine hash."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mle_proj_datapipeline_spark.plans.llm_common import _h31  # noqa: F401
from mle_proj_datapipeline_spark.plans.registry import register
from mle_proj_datapipeline_spark.sources.catalog import load_table


# --------------------------------------------------------------------------
# Featurization: the hashing trick (signed feature hashing)
# --------------------------------------------------------------------------
_FH_BUCKETS = 16


@register(
    "feature_hashing_doc_vectors",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
    h AS (
        SELECT doc_id,
               {_h31('term')} % {_FH_BUCKETS} AS bucket,
               CASE WHEN ({_h31('term')} // {_FH_BUCKETS}) % 2 = 0
                    THEN 1 ELSE -1 END AS sgn
        FROM tok)
    SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS val
    FROM h GROUP BY 1, 2
    """,
)
def feature_hashing_doc_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: fixed-width signed-hash featurization of
    documents — no vocabulary pass, no dictionary state, the
    featurizer every streaming/distributed text classifier starts
    with. bucket = H31(term) mod 16, sign = a second hash bit
    (unbiases collisions, Weinberger et al.); sparse (doc, bucket,
    value) triples out.

    Scale: explode + ONE partial-aggregated shuffle keyed by
    (doc, bucket) — no vocabulary join, unlike TF-IDF; width is a
    constant, so output is ≤ docs × buckets regardless of vocabulary
    growth. All-integer arithmetic, bit-identical cross-engine."""
    from mle_proj_datapipeline_spark.operators.hashing import h31

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    h = h31(F.col("term"))
    return (
        tok.select(
            "doc_id",
            (h % _FH_BUCKETS).alias("bucket"),
            F.when((F.floor(h / _FH_BUCKETS) % 2) == 0, 1).otherwise(-1).alias("sgn"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sgn").cast("bigint").alias("val"))
    )


# --------------------------------------------------------------------------
# Corpus-trained bigram LM quality scoring (the real ppl-proxy)
# --------------------------------------------------------------------------
@register(
    "bigram_lm_doc_scores",
    oracle="""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    uni AS (
        SELECT u.term, count(*) AS c1
        FROM (SELECT unnest(t) AS term FROM tok) u GROUP BY 1),
    v AS (SELECT count(*) AS vsz FROM uni),
    big AS (
        SELECT doc_id, u.z[1] AS w1, u.z[2] AS w2
        FROM (SELECT doc_id, unnest(list_zip(t, t[2:])) AS z FROM tok) u
        WHERE u.z[2] IS NOT NULL),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1, 2)
    SELECT big.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln((c2.c2 + 1.0) / (uni.c1 + v.vsz))), 4) AS avg_logprob
    FROM big
    JOIN c2 USING (w1, w2)
    JOIN uni ON uni.term = big.w1
    CROSS JOIN v
    GROUP BY big.doc_id
    """,
)
def bigram_lm_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language model scoring each document —
    the REAL form of the perplexity-proxy quality gate (CCNet/KenLM
    style): train add-one-smoothed bigram probabilities on the corpus
    itself, then score every doc by mean log P(w2|w1) =
    ln((c(w1,w2)+1)/(c(w1)+|V|)). Low scorers are the gibberish/
    boilerplate candidates.

    Scale: ONE explode for unigram counts, ONE in-row zip for bigrams
    (no positional self-join); the count tables are vocabulary-sized
    and broadcast back onto the bigram stream; |V| rides along as a
    broadcast scalar. Integer counts make the smoothed ratio the same
    two doubles in both engines. The bigram stream feeds two consumers
    (its own count table and the scoring join) and Spark does not reuse
    the subtree, so it is materialized once — tokenize+zip runs one
    time (measured 1.4→1.1 s at sf0.1)."""
    from mle_proj_datapipeline_spark.sources.snapshots import materialize_frame

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.split("text", " ").alias("t"))
    # uni feeds both the scoring join and the |V| scalar — materialized
    # (vocabulary-sized) so the unigram explode also runs once.
    uni = materialize_frame(
        tok.select(F.explode("t").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vsz = uni.agg(F.count(F.lit(1)).alias("vsz"))
    pairs = F.arrays_zip(
        F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
        F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
    )
    big = materialize_frame(
        tok.select("doc_id", F.explode(pairs).alias("p")).select(
            "doc_id", F.col("p.0").alias("w1"), F.col("p.1").alias("w2")
        )
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    return (
        big.join(F.broadcast(c2), ["w1", "w2"])
        .join(F.broadcast(uni.withColumnRenamed("term", "w1")), "w1")
        .crossJoin(F.broadcast(vsz))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(
                F.avg(F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("vsz")))), 4
            ).alias("avg_logprob"),
        )
    )


# --------------------------------------------------------------------------
# Corpus law: Zipf slope of the term-frequency distribution
# --------------------------------------------------------------------------
_ZIPF_TOP = 1000


@register(
    "zipf_slope_terms",
    oracle=f"""
    WITH tf AS (
        SELECT u.term, count(*) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents) u
        GROUP BY 1),
    ranked AS (
        SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, term) AS DOUBLE)) AS lx,
               ln(CAST(c AS DOUBLE)) AS ly
        FROM tf
        ORDER BY c DESC, term LIMIT {_ZIPF_TOP}),
    m AS (
        SELECT count(*) AS n,
               sum(lx) / count(*) AS mx, sum(ly) / count(*) AS my,
               sum(lx * ly) / count(*) - (sum(lx) / count(*)) * (sum(ly) / count(*)) AS cxy,
               sum(lx * lx) / count(*) - (sum(lx) / count(*)) ** 2 AS vx,
               sum(ly * ly) / count(*) - (sum(ly) / count(*)) ** 2 AS vy
        FROM ranked)
    SELECT CAST(n AS BIGINT) AS n_terms,
           round(cxy / vx, 4) AS zipf_slope,
           round(my - (cxy / vx) * mx, 4) AS intercept,
           round((cxy * cxy) / (vx * vy), 4) AS r2
    FROM m
    """,
)
def zipf_slope_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus term-frequency distribution:
    OLS slope of ln(freq) on ln(rank) for the top-{k} terms (natural
    language sits near −1; a corpus drifting away from its usual slope
    signals boilerplate floods or template spam — a cheap corpus-level
    quality alarm beside the per-doc gates).

    One explode → term counts (partial-agg shuffle), rank by a
    total-order window over the vocabulary-sized relation, OLS by
    explicit moment algebra on the {k}-row frame — both engines run
    identical arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = (
        tf.orderBy(F.desc("c"), "term")
        .limit(_ZIPF_TOP)
        .select(
            F.log(
                F.row_number()
                .over(Window.orderBy(F.desc("c"), "term"))
                .cast("double")
            ).alias("lx"),
            F.log(F.col("c").cast("double")).alias("ly"),
        )
    )
    n = F.count(F.lit(1))
    m = ranked.agg(
        n.alias("n"),
        (F.sum("lx") / n).alias("mx"),
        (F.sum("ly") / n).alias("my"),
        (F.sum(F.col("lx") * F.col("ly")) / n
         - (F.sum("lx") / n) * (F.sum("ly") / n)).alias("cxy"),
        (F.sum(F.col("lx") * F.col("lx")) / n
         - (F.sum("lx") / n) * (F.sum("lx") / n)).alias("vx"),
        (F.sum(F.col("ly") * F.col("ly")) / n
         - (F.sum("ly") / n) * (F.sum("ly") / n)).alias("vy"),
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_terms"),
        F.round(F.col("cxy") / F.col("vx"), 4).alias("zipf_slope"),
        F.round(
            F.col("my") - (F.col("cxy") / F.col("vx")) * F.col("mx"), 4
        ).alias("intercept"),
        F.round(
            (F.col("cxy") * F.col("cxy")) / (F.col("vx") * F.col("vy")), 4
        ).alias("r2"),
    )


# --------------------------------------------------------------------------
# Corpus law: Heaps' vocabulary growth at document checkpoints
# --------------------------------------------------------------------------
_HEAPS_STEP = 50


@register(
    "heaps_vocab_growth",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
    first_seen AS (
        SELECT term, min(doc_id) AS fd FROM tok GROUP BY 1),
    doc_tokens AS (
        SELECT doc_id, count(*) AS nt FROM tok GROUP BY 1),
    ckpt AS (
        SELECT DISTINCT ((doc_id // {_HEAPS_STEP}) + 1)
                        * {_HEAPS_STEP} AS ck
        FROM documents)
    SELECT ck AS docs_seen,
           (SELECT CAST(coalesce(sum(nt), 0) AS BIGINT)
            FROM doc_tokens WHERE doc_id < ck) AS tokens_seen,
           (SELECT CAST(count(*) AS BIGINT)
            FROM first_seen WHERE fd < ck) AS vocab_size
    FROM ckpt
    """,
)
def heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law curve: vocabulary size vs corpus size at every
    {step}-document checkpoint — the sub-linear vocab growth a healthy
    natural corpus shows (V ≈ K·Nᵝ, β≈0.5); a kink flags a domain
    shift or machine-generated flood at that point in the ingest
    order.

    First-occurrence doc per term comes from ONE groupBy (min doc_id)
    over the exploded stream; checkpoint roll-ups are cumulative sums
    over the checkpoint spine joined against vocabulary-sized frames —
    never a per-checkpoint rescan of the corpus.

    r12 (guide §2.4): per-doc token counts never needed the explode —
    count(exploded split) per doc == size(split), so the bucket totals
    come straight off a map-side-combined groupBy of the docs frame
    (null text: explode contributed no row, size() yields NULL, and
    sum() skips it — identical bucket totals either way). And since
    every doc lands in exactly one bucket, that aggregate's key set IS
    the checkpoint spine — the third docs scan (distinct ck) is gone.
    documents scans 3 → 2, corpus-wide explodes 2 → 1."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    first_seen = tok.groupBy("term").agg(F.min("doc_id").alias("fd"))
    spine = (
        docs.groupBy(
            ((F.floor(F.col("doc_id") / _HEAPS_STEP) + 1) * _HEAPS_STEP)
            .cast("bigint")
            .alias("ck")
        )
        # size() null-handling made explicit (ADVICE r12): under
        # ANSI mode (the 4.x default) size(NULL) is NULL and sum()
        # skips it — identical to the old explode contributing no row —
        # but with spark.sql.ansi.enabled=false size(NULL) returns -1
        # and every null-text doc would silently deflate the bucket
        # total. The when() pins the invariant instead of inheriting
        # it from session config.
        .agg(
            F.sum(
                F.when(
                    F.col("text").isNotNull(), F.size(F.split("text", " "))
                ).otherwise(F.lit(0))
            ).alias("bt")
        )
    )
    voc_part = (
        first_seen.select(
            ((F.floor(F.col("fd") / _HEAPS_STEP) + 1) * _HEAPS_STEP)
            .cast("bigint")
            .alias("b"),
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("bv"))
    )
    # Cumulate ON the checkpoint spine (a bucket with no new terms
    # would otherwise leave a hole in a per-bucket running sum).
    w = Window.orderBy("ck").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        spine.join(voc_part, spine.ck == voc_part.b, "left")
        .drop("b")
        .select(
            "ck",
            F.sum(F.coalesce("bt", F.lit(0))).over(w).cast("bigint").alias("cum_t"),
            F.sum(F.coalesce("bv", F.lit(0))).over(w).cast("bigint").alias("cum_v"),
        )
        .select(
            F.col("ck").alias("docs_seen"),
            F.col("cum_t").alias("tokens_seen"),
            F.col("cum_v").alias("vocab_size"),
        )
    )
