"""Distribution-profiling and drift queries (SURVEY.md §2 D8/I3/J8
depth): token budgeting, exact percentiles, equal-width and
equal-frequency binning, second-moment aggregate families, and the
weekly PSI drift series.

Split from plans/extension_queries.py (round 6) so the per-file
freshness clock tracks one family: an edit here stales only these
driver rows (the VERDICT r4 item-2 / r5 item-2 discipline).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mle_proj_datapipeline_spark.plans.registry import register
from mle_proj_datapipeline_spark.sources.catalog import load_table

# --------------------------------------------------------------------------
# Text: token counting — whitespace + BPE-ish regex pre-tokenizer
# --------------------------------------------------------------------------
_BPE_PAT = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@register(
    "doc_token_stats",
    oracle=f"""
    WITH t AS (
        SELECT source,
               length(text) - length(replace(text, ' ', '')) + 1 AS ws_tokens,
               len(regexp_extract_all(text, '{_BPE_PAT}')) AS bpe_tokens
        FROM documents)
    SELECT source, count(*) AS n_docs,
           CAST(sum(ws_tokens) AS BIGINT) AS total_ws_tokens,
           CAST(sum(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
           CAST(max(bpe_tokens) AS BIGINT) AS max_bpe_tokens,
           round(CAST(sum(bpe_tokens) AS DOUBLE) / sum(ws_tokens), 4) AS bpe_per_ws
    FROM t GROUP BY source
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgeting per corpus source: whitespace tokens vs a BPE-ish
    regex pre-tokenizer (letter runs | digit runs | single punctuation).
    Pure JVM expressions — the whole pipeline stays in codegen."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.length("text") - F.length(F.regexp_replace(F.col("text"), " ", "")) + F.lit(1)
    bpe = F.regexp_count(F.col("text"), F.lit(_BPE_PAT))
    t = docs.select("source", ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))
    return t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws_tokens").cast("long").alias("total_ws_tokens"),
        F.sum("bpe_tokens").cast("long").alias("total_bpe_tokens"),
        F.max("bpe_tokens").cast("long").alias("max_bpe_tokens"),
        F.round(F.sum("bpe_tokens").cast("double") / F.sum("ws_tokens"), 4).alias("bpe_per_ws"),
    )


# --------------------------------------------------------------------------
# Exact percentiles (D8-adjacent; exact, so oracle-comparable)
# --------------------------------------------------------------------------
@register(
    "acctbal_percentiles",
    oracle="""
    SELECT c_mktsegment,
           round(quantile_cont(c_acctbal, 0.25), 4) AS p25,
           round(quantile_cont(c_acctbal, 0.50), 4) AS p50,
           round(quantile_cont(c_acctbal, 0.75), 4) AS p75,
           count(*) AS n
    FROM customer GROUP BY c_mktsegment
    """,
)
def acctbal_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated quartiles per segment. At 100 TB swap
    F.percentile for percentile_approx (t-digest) — exact percentile is
    a full sort per group; the approx variant is one pass, mergeable."""
    c = load_table(spark, sf_dir, "customer")
    pct = F.percentile(F.col("c_acctbal"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return (
        c.groupBy("c_mktsegment")
        .agg(pct.alias("p"), F.count(F.lit(1)).alias("n"))
        .select(
            "c_mktsegment",
            F.round(F.element_at("p", 1), 4).alias("p25"),
            F.round(F.element_at("p", 2), 4).alias("p50"),
            F.round(F.element_at("p", 3), 4).alias("p75"),
            "n",
        )
    )


# --------------------------------------------------------------------------
# Equal-width histogram (D8-adjacent: distribution profiling)
# --------------------------------------------------------------------------
@register(
    "totalprice_histogram",
    oracle="""
    WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders)
    SELECT least(CAST(floor((o_totalprice - b.lo) / (b.hi - b.lo) * 10) AS BIGINT) + 1, 10) AS bucket,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders, b GROUP BY 1
    """,
)
def totalprice_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width 10-bucket histogram: one scalar min/max pass
    (broadcast as a 1-row frame) + one bucketed aggregation — the
    distribution profile that feeds drift monitors and Bucketizer-style
    features without MLlib. The bucket formula is written out (not
    width_bucket) so both engines evaluate the identical expression;
    max clamps into the top bucket."""
    o = load_table(spark, sf_dir, "orders")
    b = o.agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
    # try_divide: a single-distinct-price table has hi = lo, so the
    # bucket ratio is 0/0 — the oracle's x/0 is NULL, least(NULL, 10)
    # skips the NULL in BOTH engines (everything lands in the top
    # bucket), and ANSI `/` must not crash (singleton-fact fuzz find,
    # round 8).
    bucket = F.least(
        F.floor(
            F.try_divide(F.col("o_totalprice") - F.col("lo"), F.col("hi") - F.col("lo"))
            * 10
        ).cast("long")
        + 1,
        F.lit(10).cast("long"),
    )
    return (
        o.crossJoin(F.broadcast(b))
        .select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


# --------------------------------------------------------------------------
# Statistical aggregates: stddev/variance/correlation/covariance (D6 ext)
# --------------------------------------------------------------------------
@register(
    "lineitem_price_stats",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           round(stddev_samp(l_extendedprice), 2) AS sd_price,
           round(var_samp(l_discount), 6) AS var_disc,
           round(covar_samp(l_extendedprice, l_quantity)
                 / nullif(stddev_samp(l_extendedprice)
                          * stddev_samp(l_quantity), 0), 4) AS corr_price_qty,
           round(covar_samp(l_extendedprice, l_discount), 2) AS covar_price_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def lineitem_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregate family (stddev/variance/correlation/
    covariance) — all single-pass mergeable aggregates (partial
    moment-sums combine map-side; no sort, no second scan).

    Pearson corr is computed as try_divide(covar_samp, sd·sd) rather
    than F.corr: under ANSI mode Spark's corr aggregate raises
    DIVIDE_BY_ZERO when either variable has zero variance (zero-
    variance fuzz find, round 9), while DuckDB's corr returns NULL.
    The ORACLE mirrors the same covar/(sd·sd) formulation with
    nullif(·,0) standing in for try_divide (ADVICE r9: native corr's
    separate (n−1) divisions and sqrt(x·y) vs sqrt(x)·sqrt(y) are not
    ulp-identical to this expression, so a value on the 4-decimal
    rounding half-grid could diverge) — both engines now compute the
    identical expression, same mergeable one-pass moments."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(
            F.try_divide(
                F.covar_samp("l_extendedprice", "l_quantity"),
                F.stddev_samp("l_extendedprice") * F.stddev_samp("l_quantity"),
            ),
            4,
        ).alias("corr_price_qty"),
        F.round(F.covar_samp("l_extendedprice", "l_discount"), 2).alias("covar_price_disc"),
    )


# --------------------------------------------------------------------------
# Equal-frequency binning (ntile) — the discretizer the histogram lacks
# --------------------------------------------------------------------------
@register(
    "acctbal_decile_stats",
    oracle="""
    WITH b AS (
        SELECT c_acctbal,
               ntile(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS decile
        FROM customer WHERE c_acctbal IS NOT NULL)
    SELECT decile, count(*) AS n,
           round(min(c_acctbal), 2) AS lo,
           round(max(c_acctbal), 2) AS hi
    FROM b GROUP BY decile
    """,
)
def acctbal_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency discretization via ntile over a TOTAL order
    (value, key tiebreak — without it ntile's bin boundaries are
    execution-dependent on ties). Complements the equi-width
    totalprice_histogram. Global-sort window: at 100 TB compute decile
    edges with percentile_approx and bin by range instead (one pass,
    no global sort) — this exact form is the oracle-checkable twin."""
    from pyspark.sql import Window

    # NULL balances have no decile — and the engines disagree on where
    # NULL sorts (Spark ASC = NULLS FIRST, DuckDB = NULLS LAST), so the
    # filter is the contract, mirrored in the oracle (NULL-fuzz find).
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal").isNotNull())
    w = Window.orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("lo"),
            F.round(F.max("c_acctbal"), 2).alias("hi"),
        )
    )


# --------------------------------------------------------------------------
# Correlation / covariance aggregates per group
# --------------------------------------------------------------------------
@register(
    "price_qty_correlation",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           round(covar_samp(l_extendedprice, l_quantity)
                 / nullif(stddev_samp(l_extendedprice)
                          * stddev_samp(l_quantity), 0), 4) AS price_qty_corr,
           round(covar_samp(l_extendedprice, l_quantity), 2) AS price_qty_cov
    FROM lineitem GROUP BY l_returnflag
    """,
)
def price_qty_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate aggregates (Pearson corr, sample covariance) per group
    — single partial-aggregable shuffle; the moment sums are mergeable,
    so the same plan holds at any scale. corr = try_divide(covar_samp,
    sd·sd): ANSI-safe under zero variance (NULL; zero-variance fuzz
    find, round 9). The oracle mirrors the identical covar/(sd·sd)
    expression via nullif(·,0) rather than native corr (ADVICE r9:
    the formulations are not ulp-identical, so a half-grid rounding
    value could diverge)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.try_divide(
                F.covar_samp("l_extendedprice", "l_quantity"),
                F.stddev_samp("l_extendedprice") * F.stddev_samp("l_quantity"),
            ),
            4,
        ).alias("price_qty_corr"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("price_qty_cov"),
    )


# --------------------------------------------------------------------------
# J8 depth: weekly PSI drift SERIES vs the baseline week
# --------------------------------------------------------------------------
PSI_EPS = 1e-6
PSI_QS = [i / 10 for i in range(1, 10)]


@register(
    "weekly_psi_drift",
    oracle=f"""
    WITH wko AS (
        SELECT strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS wk,
               o_totalprice AS v
        FROM orders),
    b AS (SELECT min(wk) AS bwk FROM wko),
    bps AS (
        SELECT list_transform(
            quantile_cont(v, [{", ".join(str(q) for q in PSI_QS)}]),
            x -> round(x, 6)) AS bps
        FROM wko, b WHERE wk = bwk),
    bk AS (SELECT wk, len(list_filter(bps, x -> v > x)) AS bucket FROM wko, bps),
    cnt AS (SELECT wk, bucket, count(*) AS n FROM bk GROUP BY wk, bucket),
    tot AS (SELECT wk, count(*) AS t FROM wko GROUP BY wk),
    spine AS (
        SELECT w.wk, b2.bucket
        FROM (SELECT DISTINCT wk FROM wko) w,
             (SELECT unnest(range(0, 10)) AS bucket) b2),
    frac AS (
        SELECT s.wk, s.bucket,
               greatest(CAST(coalesce(n, 0) AS DOUBLE) / t, {PSI_EPS}) AS f
        FROM spine s
        LEFT JOIN cnt ON s.wk = cnt.wk AND s.bucket = cnt.bucket
        JOIN tot ON s.wk = tot.wk),
    base AS (SELECT bucket, f AS ef FROM frac, b WHERE wk = bwk)
    SELECT fr.wk,
           round(sum((fr.f - base.ef) * ln(fr.f / base.ef)), 4) AS psi
    FROM frac fr JOIN base ON fr.bucket = base.bucket, b
    WHERE fr.wk != b.bwk
    GROUP BY fr.wk
    """,
)
def weekly_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI drift SERIES: every week's order-value distribution scored
    against the baseline (first) week — the reference computes one PSI
    pair per run (utils/model_operations.py:161-179); a monitoring
    panel needs the whole trajectory in one job. Decile breakpoints
    come from the baseline week only (its semantics), every week
    buckets against those same broadcast breakpoints, and the PSI fold
    runs over an explicit (week × bucket) spine so empty buckets clamp
    identically in both engines.

    Scale — ONE scan of orders (VERDICT r4 item 4; the r4 shape
    re-derived the wk/value projection in five subtrees = five scans):
    the 2-column (week, value) projection is localCheckpoint'ed once,
    and baseline week, breakpoints, and bucket counts all read the
    materialized blocks instead of re-scanning the table; totals and
    the week spine then derive from the (weeks × buckets)-sized count
    aggregate, and the baseline fractions attach via a window over that
    tiny frame instead of a self-join (which would execute the bucket
    subtree twice). Asserted by tests/test_plan_shape.py (no parquet
    scan in the final plan — the single scan happens at
    materialization)."""
    from pyspark.sql import Window

    from mle_proj_datapipeline_spark.sources.snapshots import materialize_frame

    o = load_table(spark, sf_dir, "orders")
    wk = F.date_format(F.date_trunc("week", F.col("o_orderdate")), "yyyy-MM-dd")
    # The ONE orders scan: project to (wk, v) and materialize, so the
    # three consumers below (baseline week, breakpoints, bucket counts)
    # read executor-local blocks, not parquet.
    wko = materialize_frame(
        o.select(wk.alias("wk"), F.col("o_totalprice").alias("v"))
    )
    bwk = wko.agg(F.min("wk").alias("bwk"))
    bps = (
        wko.crossJoin(F.broadcast(bwk))
        .filter(F.col("wk") == F.col("bwk"))
        .agg(
            # 6-decimal breakpoint convention — see operators/psi.py:
            # pins the half-open bucket edge against O(1e-12)
            # cross-engine interpolation noise on boundary point-masses.
            F.transform(
                F.percentile(F.col("v"), F.array(*[F.lit(q) for q in PSI_QS])),
                lambda b: F.round(b, 6),
            ).alias("bps")
        )
    )
    bucket = F.size(F.filter(F.col("bps"), lambda b: F.col("v") > b))
    cnt = (
        wko.crossJoin(F.broadcast(bps))
        .select("wk", bucket.alias("bucket"))
        .groupBy("wk", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # r12: materialize cnt too — spine derives FROM cnt (via tot) and
    # then left-joins back onto it, so without this cut the whole
    # bucket-assign + groupBy subtree over the full wko frame planned
    # TWICE (once under each join branch; 16 Exchanges in the before
    # plan, the dominant cost paid double). The cut is (weeks × bucket)-
    # sized — trivially small at any scale.
    cnt = materialize_frame(cnt)
    # Totals and the (week × bucket) spine derive from cnt — weeks-sized
    # frames, no table access. The left join fills empty buckets.
    tot = cnt.groupBy("wk").agg(F.sum("n").alias("t"))
    spine = tot.select(
        "wk", "t", F.explode(F.sequence(F.lit(0), F.lit(len(PSI_QS)))).alias("bucket")
    )
    frac = (
        spine.join(cnt, ["wk", "bucket"], "left")
        .select(
            "wk",
            "bucket",
            F.greatest(
                F.coalesce(F.col("n"), F.lit(0)).cast("double") / F.col("t"),
                F.lit(PSI_EPS),
            ).alias("f"),
        )
    )
    wb = Window.partitionBy("bucket")
    return (
        frac.crossJoin(F.broadcast(bwk))
        .withColumn(
            "ef", F.max(F.when(F.col("wk") == F.col("bwk"), F.col("f"))).over(wb)
        )
        .filter(F.col("wk") != F.col("bwk"))
        .groupBy("wk")
        .agg(
            F.round(
                F.sum((F.col("f") - F.col("ef")) * F.log(F.col("f") / F.col("ef"))), 4
            ).alias("psi")
        )
    )

