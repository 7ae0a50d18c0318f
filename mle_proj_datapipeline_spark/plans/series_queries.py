"""Windowed-analytics and time-series queries (SURVEY.md §2 F/I2
extensions): the full ranking-function family, percent-of-total,
calendar-spine gap fill, deterministic list aggregation, per-key
recursive folds (EWMA), grouped-map OLS trends, fulfillment lag, and
recent-N-weeks semi-join analytics.

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
# Semi-join on recent weeks (E3 — query_model_performance.py:88-104 shape)
# --------------------------------------------------------------------------
@register(
    "recent_week_event_stats",
    oracle="""
    WITH recent AS (
        SELECT DISTINCT date_trunc('week', ts) AS wk FROM events
        ORDER BY wk DESC LIMIT 4)
    SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week, event_type,
           count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events
    WHERE date_trunc('week', ts) IN (SELECT wk FROM recent)
    GROUP BY 1, 2
    """,
)
def recent_week_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metrics over only the N most recent weekly partitions — the
    reference's `IN (SELECT DISTINCT week_date ... LIMIT %s)` analytic
    (query_model_performance.py:96-102) as a broadcast left-semi join.
    At scale the 4-row week list broadcasts; with week as a partition
    key this prunes the scan to 4 partitions."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "wk", F.date_trunc("week", F.col("ts"))
    )
    recent = ev.select("wk").distinct().orderBy(F.desc("wk")).limit(4)
    return (
        ev.join(F.broadcast(recent), "wk", "left_semi")
        .groupBy(F.date_format("wk", "yyyy-MM-dd").alias("week"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# Window-function family breadth (F extensions): dense_rank, ntile,
# percent_rank, cume_dist, lag in one pass
# --------------------------------------------------------------------------
@register(
    "supplier_balance_ranks",
    oracle="""
    SELECT s_nationkey, s_suppkey,
           dense_rank()   OVER w AS drk,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 4) AS prk,
           round(cume_dist()    OVER w, 4) AS cd,
           round(s_acctbal - lag(s_acctbal, 1, s_acctbal) OVER w, 2) AS delta_prev
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey ASC)
    """,
)
def supplier_balance_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family over one window spec — one sort,
    five functions (Catalyst fuses same-spec window functions into a
    single Window operator; check: exactly one Sort in the plan)."""
    from pyspark.sql import Window

    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return s.select(
        "s_nationkey",
        "s_suppkey",
        F.dense_rank().over(w).alias("drk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("prk"),
        F.round(F.cume_dist().over(w), 4).alias("cd"),
        F.round(
            F.col("s_acctbal")
            - F.coalesce(F.lag("s_acctbal", 1).over(w), F.col("s_acctbal")),
            2,
        ).alias("delta_prev"),
    )


# --------------------------------------------------------------------------
# Grouped-map Arrow (applyInPandas): per-user OLS value trend
# --------------------------------------------------------------------------
@register(
    "user_value_trend",
    oracle="""
    WITH s AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events),
    b AS (
        SELECT user_id,
               (sec - min(sec) OVER (PARTITION BY user_id)) / 86400.0 AS x,
               value AS y
        FROM s),
    a AS (
        SELECT user_id, count(*) AS n, sum(x*y) AS sxy, sum(x) AS sx,
               sum(y) AS sy, sum(x*x) AS sxx
        FROM b GROUP BY user_id)
    SELECT user_id, n,
           round((sxy - sx*sy/n) / (sxx - sx*sx/n), 4) + 0 AS slope_per_day,
           round(sy/n - ((sxy - sx*sy/n) / (sxx - sx*sx/n)) * sx/n, 4) + 0 AS intercept
    FROM a
    WHERE n >= 2 AND (sxx - sx*sx/n) != 0
    """,
)
def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS slope/intercept of event value over days-since-first
    -event, fitted group-at-a-time through the grouped-map Arrow path
    (operators/grouped.per_user_trend, applyInPandas). The oracle
    recomputes the identical closed form from SQL moment sums, so the
    group-shuffle + whole-group-pandas plumbing is exact-hash-verified."""
    from mle_proj_datapipeline_spark.operators.grouped import per_user_trend

    return per_user_trend(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Percent-of-total window aggregate (F extension: unordered frame)
# --------------------------------------------------------------------------
@register(
    "segment_revenue_share",
    oracle="""
    WITH seg AS (
        SELECT c.c_mktsegment AS segment, sum(o.o_totalprice) AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1)
    SELECT segment, round(revenue, 2) AS revenue,
           round(revenue / sum(revenue) OVER (), 4) AS share
    FROM seg
    """,
)
def segment_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total: a whole-relation window aggregate (no
    partition, no order — a 5-row exchange after the groupBy, not a
    second scan of orders)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    from pyspark.sql import Window

    seg = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")),
               o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    return seg.select(
        "segment",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.col("revenue") / F.sum("revenue").over(Window.partitionBy()), 4).alias("share"),
    )


# --------------------------------------------------------------------------
# Calendar spine + gap fill + running total (I2/F extension)
# --------------------------------------------------------------------------
@register(
    "weekly_revenue_spine",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('week', min(o_orderdate)) AS lo,
               date_trunc('week', max(o_orderdate)) AS hi FROM orders),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 7 DAY)) AS wk FROM bounds),
    weekly AS (
        SELECT date_trunc('week', o_orderdate) AS wk, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1)
    SELECT strftime(spine.wk, '%Y-%m-%d') AS week,
           coalesce(weekly.n_orders, 0) AS n_orders,
           coalesce(weekly.revenue, 0.0) AS revenue,
           round(sum(coalesce(weekly.revenue, 0.0))
                 OVER (ORDER BY spine.wk ROWS UNBOUNDED PRECEDING), 2) AS cum_revenue
    FROM spine LEFT JOIN weekly ON spine.wk = weekly.wk
    """,
)
def weekly_revenue_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense weekly time series from sparse facts: generate the full
    Monday-week calendar spine (sequence+explode from the min/max
    bounds — one broadcastable row), left-join weekly revenue, zero-fill
    gaps, and run a cumulative total over the spine. The gap-filling
    pattern every panel/forecasting pipeline needs and naive groupBy
    silently gets wrong (missing weeks vanish instead of reading 0)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    wk = F.date_trunc("week", F.col("o_orderdate"))
    # r12 (guide §2.4): bounds used to re-scan orders (min/max of the raw
    # dates) — a second full pass. date_trunc is monotonic, so
    # min/max(trunc(d)) == trunc(min/max(d)): read the bounds off the
    # |weeks|-sized aggregate instead, cut once, scan orders exactly once.
    from mle_proj_datapipeline_spark.sources.snapshots import materialize_frame

    weekly = materialize_frame(
        o.groupBy(wk.alias("wk")).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
    bounds = weekly.agg(F.min("wk").alias("lo"), F.max("wk").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 7 days"))).alias("wk")
    )
    joined = spine.join(weekly, "wk", "left").select(
        "wk",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
    )
    w = Window.orderBy("wk").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return joined.select(
        F.date_format("wk", "yyyy-MM-dd").alias("week"),
        "n_orders",
        "revenue",
        F.round(F.sum("revenue").over(w), 2).alias("cum_revenue"),
    )


# --------------------------------------------------------------------------
# Deterministic list aggregation: sort_array(collect_list) -> string
# --------------------------------------------------------------------------
@register(
    "nation_top_customers_list",
    oracle="""
    WITH ranked AS (
        SELECT c_nationkey, c_name,
               row_number() OVER (PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
        FROM customer)
    SELECT c_nationkey AS nationkey,
           array_to_string(list_sort(list(c_name)), ',') AS top_customers
    FROM ranked WHERE rk <= 3 GROUP BY c_nationkey
    """,
)
def nation_top_customers_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List aggregation done deterministically: collect_list order is
    execution-dependent (the classic silent flake), so the engine's
    contract is sort_array(collect_list(...)) and a string join —
    hash-stable across engines, partitionings, and retries. Top-3 per
    nation by (acctbal DESC, custkey ASC) total order."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.array_join(F.sort_array(F.collect_list("c_name")), ",").alias(
                "top_customers"
            )
        )
    )


# --------------------------------------------------------------------------
# Fulfillment lag: per-order date arithmetic joined to line items
# --------------------------------------------------------------------------
@register(
    "order_fulfillment_lag",
    oracle="""
    WITH lag AS (
        SELECT o.o_orderpriority,
               date_diff('day', o.o_orderdate, max(l.l_shipdate)) AS days_to_last_ship
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate)
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(min(days_to_last_ship) AS BIGINT) AS min_lag,
           CAST(max(days_to_last_ship) AS BIGINT) AS max_lag,
           round(avg(days_to_last_ship), 4) AS avg_lag
    FROM lag GROUP BY o_orderpriority
    """,
)
def order_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-last-shipment lag distribution per priority: the
    orders⨝lineitem shuffle happens once on orderkey with a partial
    max per order, then a tiny re-aggregation by priority — date
    arithmetic (datediff) stays JVM-side."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lag = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            "o_orderpriority",
            F.datediff(F.col("last_ship"), F.col("o_orderdate")).alias(
                "days_to_last_ship"
            ),
        )
    )
    return lag.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("days_to_last_ship").cast("long").alias("min_lag"),
        F.max("days_to_last_ship").cast("long").alias("max_lag"),
        F.round(F.avg("days_to_last_ship"), 4).alias("avg_lag"),
    )


# --------------------------------------------------------------------------
# Per-key EWMA: a recursive time-series fold, expressed declaratively
# --------------------------------------------------------------------------
EWMA_ALPHA = 0.2


@register(
    "customer_value_ewma",
    oracle=f"""
    WITH g AS (
        SELECT o_custkey,
               count(*) AS n_orders,
               list_transform(
                   list_sort(list(struct_pack(d := o_orderdate,
                                              k := o_orderkey,
                                              v := o_totalprice))),
                   x -> x.v) AS vs
        FROM orders WHERE o_totalprice IS NOT NULL GROUP BY o_custkey)
    SELECT o_custkey, n_orders,
           round(list_reduce(vs, (acc, v) -> {1 - EWMA_ALPHA} * acc
                                             + {EWMA_ALPHA} * v), 4) AS ewma_value
    FROM g
    """,
)
def customer_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each customer's order
    value in arrival order — a RECURSIVE per-key fold (s_t depends on
    s_{t-1}) with no window-function form, done declaratively: sort the
    (date, key, value) structs inside an array and fold with the
    built-in ``aggregate`` HOF. Seed = first value in both engines
    (DuckDB list_reduce seeds with the head; Spark folds from NULL with
    a coalesce), and both fold left-to-right with the identical
    0.8*acc + 0.2*v expression, so the doubles are bit-equal.

    Scale: one shuffle (the groupBy); per-group arrays are bounded by
    orders-per-customer, not data volume; the fold is JVM codegen, no
    UDF, no recursion, no iteration."""
    # NULL order values are measurement gaps, not zeros: inside the
    # fold a NULL would reset (Spark's reseed coalesce) or poison
    # (DuckDB) the accumulator — divergent AND wrong. The series is
    # the non-null values; n_orders is the series length (NULL-fuzz
    # find, mirrored in the oracle).
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    g = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("o_orderdate").alias("d"),
                        F.col("o_orderkey").alias("k"),
                        F.col("o_totalprice").alias("v"),
                    )
                )
            ),
            lambda x: x["v"],
        ).alias("vs"),
    )
    ewma = F.aggregate(
        F.col("vs"),
        F.lit(None).cast("double"),
        lambda acc, v: F.coalesce(
            acc * F.lit(1 - EWMA_ALPHA) + v * F.lit(EWMA_ALPHA), v
        ),
    )
    return g.select(
        "o_custkey", "n_orders", F.round(ewma, 4).alias("ewma_value")
    )

