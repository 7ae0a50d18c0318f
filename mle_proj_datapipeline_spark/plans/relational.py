"""Core relational queries — the scan/filter/project/join/agg/window/
sort/set-op surface of SURVEY.md §2 (families A,B,D,E,F,G,H) expressed
Spark-first over the TPC-H-ish testdata tables.

Each query cites the reference operator it generalizes. Plans are built
with the DataFrame API so Catalyst handles pushdown/pruning/join
selection; small dimensions are broadcast-hinted (at 100 TB nation/
region/supplier stay broadcastable; lineitem/orders joins become
sort-merge on their keys and AQE handles skew).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mle_proj_datapipeline_spark.plans.registry import register
from mle_proj_datapipeline_spark.sources.catalog import load_table


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


# --------------------------------------------------------------------------
# Aggregations (SURVEY §2 D1/D3/D6: groupBy multi-aggregate; generalizes the
# reference's per-model metrics summary, utils/query_model_performance.py:29-43)
# --------------------------------------------------------------------------
@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                  AS sum_qty,
           round(sum(l_extendedprice), 2)                             AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)          AS sum_disc_price,
           round(sum(l_quantity), 2)      / count(*)                  AS avg_qty,
           round(sum(l_extendedprice), 2) / count(*)                  AS avg_price,
           round(sum(l_discount), 2)      / count(*)                  AS avg_disc,
           count(*)                                                   AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filtered scan → hash agg with partial (map-side)
    combine. The shipdate filter pushes down to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(_revenue()), 4).alias("sum_disc_price"),
            (F.round(F.sum("l_quantity"), 2) / F.count(F.lit(1))).alias("avg_qty"),
            (F.round(F.sum("l_extendedprice"), 2) / F.count(F.lit(1))).alias("avg_price"),
            (F.round(F.sum("l_discount"), 2) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Scan → filter → project → scalar agg (SURVEY §2 B3/B8/D3; pushdown test)
# --------------------------------------------------------------------------
@register(
    "forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS promo_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: all three predicates reach the scan
    (PushedFilters); projection prunes to 4 columns (ReadSchema)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("promo_revenue"))
    )


# --------------------------------------------------------------------------
# Join chain + top-k (SURVEY §2 E1/E2/G2; generalizes feature⨝label join
# utils/model_operations.py:39 + top-k utils/gold_feature_store.py:97-105)
# --------------------------------------------------------------------------
@register(
    "top_revenue_orders",
    oracle="""
    SELECT o.o_orderkey,
           strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d')        AS orderdate,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)    AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_shipdate  > TIMESTAMP '1997-01-01'
    GROUP BY o.o_orderkey, strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d')
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → 3-way join → agg → top-k.
    Catalyst plans TakeOrderedAndProject for the limit; the customer side
    post-filter is broadcastable."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"))
        .agg(F.round(F.sum(_revenue()), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "nation_revenue",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey AND c.c_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join — the 4-way left-join chain of the
    reference feature store (utils/gold_feature_store.py:325-327)
    generalized. Dims are broadcast; fact-fact join (lineitem⨝orders) is
    the only shuffle pair."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    dim = (
        s.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == F.col("s_nationkey")))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(_revenue()), 4).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Grouped multi-aggregate over a join (SURVEY §2 D6/D9)
# --------------------------------------------------------------------------
@register(
    "segment_order_stats",
    oracle="""
    SELECT c.c_mktsegment                       AS segment,
           count(*)                             AS order_cnt,
           round(sum(o.o_totalprice), 2)        AS total_sales,
           round(sum(o.o_totalprice), 2) / count(*) AS avg_price,
           round(min(o.o_totalprice), 2)        AS min_price,
           round(max(o.o_totalprice), 2)        AS max_price,
           round(stddev_samp(o.o_totalprice), 4) AS std_price,
           count(DISTINCT o.o_custkey)          AS n_customers
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def segment_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's per-model COUNT/AVG/MIN/MAX/STDDEV/SUM metrics
    summary (utils/query_model_performance.py:29-43) as one hash agg.
    count(DISTINCT) adds the exact distinct path (expand + two-phase agg)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total_sales"),
            (F.round(F.sum("o_totalprice"), 2) / F.count(F.lit(1))).alias("avg_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.stddev_samp("o_totalprice"), 4).alias("std_price"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


# --------------------------------------------------------------------------
# Semi / anti joins (SURVEY §2 E3; IN-subquery shape
# utils/query_model_performance.py:96-102)
# --------------------------------------------------------------------------
@register(
    "customers_with_open_orders",
    oracle="""
    SELECT n.n_name AS nation, count(*) AS n_customers
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    GROUP BY n.n_name
    """,
)
def customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — the engine form of the reference's
    ``WHERE week_date IN (SELECT ...)`` analytics filter."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "customers_without_orders",
    oracle="""
    SELECT c.c_mktsegment AS segment, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c.c_mktsegment
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (declared engine extension in SURVEY §2.E — not in
    the reference; built-in in Spark), date-bounded with the
    idle_customer_balance pattern (plans/tpch_queries.py) so the oracle
    row compares real rows at every test SF: the pure anti-join was
    vacuously empty (every synthetic customer has ≥1 order), proving
    0 == 0 (VERDICT r7 Next #2). Folded back from the round-8
    plans/hotfix_r8 overlay."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(o, c.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --------------------------------------------------------------------------
# Window functions (SURVEY §2 F1: ROW_NUMBER per partition —
# utils/query_model_performance.py:147-166 "best model per week")
# --------------------------------------------------------------------------
@register(
    "top_supplier_per_nation_week",
    oracle="""
    WITH weekly AS (
        SELECT n.n_name AS nation,
               strftime(date_trunc('week', l.l_shipdate), '%Y-%m-%d') AS week,
               s.s_name AS supplier,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE l.l_shipdate >= TIMESTAMP '1998-01-01' AND l.l_shipdate < TIMESTAMP '1998-07-01'
        GROUP BY 1, 2, 3
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY nation, week
                                     ORDER BY revenue DESC, supplier ASC) AS rk
        FROM weekly
    )
    SELECT nation, week, supplier, revenue FROM ranked WHERE rk = 1
    """,
)
def top_supplier_per_nation_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query: scan → filter → joins → weekly tumbling agg →
    window rank → rank-1 filter. Same shape as the reference's best-model-
    per-week CTE (utils/query_model_performance.py:148-166), generalized
    to nation/week/supplier. One shuffle for the agg; the window reuses
    the (nation, week) clustering."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-07-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    weekly = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_format(F.date_trunc("week", F.col("l_shipdate")), "yyyy-MM-dd").alias("week"),
            F.col("s_name").alias("supplier"),
        )
        .agg(F.round(F.sum(_revenue()), 4).alias("revenue"))
    )
    w = Window.partitionBy("nation", "week").orderBy(F.desc("revenue"), F.asc("supplier"))
    return (
        weekly.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


@register(
    "order_value_deltas",
    oracle="""
    WITH seq AS (
        SELECT o_custkey,
               o_totalprice - lag(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS delta
        FROM orders
    )
    SELECT o_custkey AS custkey,
           count(delta)                 AS n_deltas,
           round(sum(delta), 2) / count(delta) AS avg_delta
    FROM seq
    WHERE delta IS NOT NULL
    GROUP BY o_custkey
    """,
)
def order_value_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() over an ordered per-key window (engine extension per SURVEY
    §2.F 'not present: lead/lag'). Total-order tiebreak on o_orderkey."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("delta", F.col("o_totalprice") - F.lag("o_totalprice").over(w))
        .filter(F.col("delta").isNotNull())
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count("delta").alias("n_deltas"),
            (F.round(F.sum("delta"), 2) / F.count("delta")).alias("avg_delta"),
        )
    )


@register(
    "rolling_order_avg",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
           / count(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rolling_avg_price
    FROM orders
    """,
)
def rolling_order_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling frame (rowsBetween) — engine form of the reference's
    50-week rolling training window (utils/dag_functions.py:554-578)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        (F.round(F.sum("o_totalprice").over(w), 2) / F.count(F.lit(1)).over(w)).alias("rolling_avg_price"),
    )


# --------------------------------------------------------------------------
# Rollup / grouping sets (declared extension, SURVEY §2.D "not present")
# --------------------------------------------------------------------------
@register(
    "revenue_rollup",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           round(sum(s.s_acctbal), 2) AS total_balance,
           count(*) AS n_suppliers
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over region→nation hierarchy: partial + grand totals in one
    pass (Expand operator, still a single shuffle)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.col("r_name").alias("region"), F.col("n_name").alias("nation"), "s_acctbal")
        .rollup("region", "nation")
        .agg(
            F.round(F.sum("s_acctbal"), 2).alias("total_balance"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
    )


# --------------------------------------------------------------------------
# Set operations (SURVEY §2 H: union; intersect/except declared extensions)
# --------------------------------------------------------------------------
@register(
    "active_party_keys",
    oracle="""
    SELECT 'both' AS side, count(*) AS n FROM (
        SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'customer_only', count(*) FROM (
        SELECT c_nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'union_distinct', count(*) FROM (
        SELECT c_nationkey FROM customer UNION SELECT s_nationkey FROM supplier)
    """,
)
def active_party_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect / except / union-distinct in one result."""
    # r12 (guide §2.4): the three set operations each re-scanned both
    # tables (six scans, three distinct-shuffles per side). One distinct
    # per side + one null-safe full-outer join answers all three counts
    # in a single pass: intersect = matched rows, except = left-only
    # rows, union-distinct = all rows (set ops treat NULL keys as equal,
    # which eqNullSafe preserves).
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    dc = c.distinct().select(F.col("k").alias("ck"), F.lit(1).alias("in_c"))
    ds = s.distinct().select(F.col("k").alias("sk"), F.lit(1).alias("in_s"))
    j = dc.join(ds, F.col("ck").eqNullSafe(F.col("sk")), "full")
    row = j.agg(
        F.count_if(F.col("in_c").isNotNull() & F.col("in_s").isNotNull()).alias("b"),
        F.count_if(F.col("in_c").isNotNull() & F.col("in_s").isNull()).alias("co"),
        F.count(F.lit(1)).alias("u"),
    )
    return row.select(
        F.explode(
            F.array(
                F.struct(F.lit("both").alias("side"), F.col("b").alias("n")),
                F.struct(F.lit("customer_only").alias("side"), F.col("co").alias("n")),
                F.struct(F.lit("union_distinct").alias("side"), F.col("u").alias("n")),
            )
        ).alias("r")
    ).select("r.*")


# --------------------------------------------------------------------------
# Top-k categories with deterministic tiebreak (SURVEY §2 D2,
# utils/gold_feature_store.py:97-105 top-10 emp_title)
# --------------------------------------------------------------------------
@register(
    "top_doc_sources",
    oracle="""
    SELECT source, count(*) AS n_docs
    FROM documents
    GROUP BY source
    ORDER BY n_docs DESC, source ASC
    LIMIT 10
    """,
)
def top_doc_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 categories by frequency — TakeOrderedAndProject, no RDD hop
    (the reference detours through .rdd.map at gold_feature_store.py:104)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("source"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Keyed dedup (SURVEY §2 D4 — fixes anti-pattern §4.4: full-row distinct)
# --------------------------------------------------------------------------
@register(
    "dedup_first_per_group",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang, source, n_chars,
               row_number() OVER (PARTITION BY lang, source ORDER BY doc_id ASC) AS rk
        FROM documents)
    SELECT doc_id, lang, source, n_chars FROM ranked WHERE rk = 1
    """,
)
def dedup_first_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first keyed dedup via window rank — deterministic, unlike bare
    dropDuplicates (which keeps an arbitrary row per key)."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(F.asc("doc_id"))
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


# --------------------------------------------------------------------------
# TPC-H Q3 shape: segment-filtered shipping priority (fact-fact join)
# --------------------------------------------------------------------------
@register(
    "shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: the canonical fact⨝fact analytics join. Customer
    (dim-sized after the segment filter) broadcasts; orders⨝lineitem
    shuffles once on orderkey with both date filters pushed to the
    scans; aggregation is partial before its exchange; top-10 is a
    TakeOrdered, not a global sort."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders (agg-as-filter then enrich)
# --------------------------------------------------------------------------
@register(
    "large_volume_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey, sum(l_quantity) AS qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 150)
    SELECT c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o.o_totalprice, 2) AS totalprice,
           round(b.qty, 2) AS total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate lineitem to find big orders (partial
    agg before the shuffle), then enrich with order/customer rows. The
    HAVING output is orders-of-interest sized, so both enrichment joins
    broadcast it — the fact table is scanned once and never re-shuffled."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 150)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("qty", 2).alias("total_qty"),
        )
    )


# --------------------------------------------------------------------------
# max_by / arg_max family: latest order per customer without a window
# --------------------------------------------------------------------------
@register(
    "latest_order_per_customer",
    oracle="""
    WITH k AS (
        SELECT *,
               strftime(o_orderdate, '%Y-%m-%d') || '|' ||
                   lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS ord
        FROM orders)
    SELECT o_custkey,
           arg_max(o_orderkey, ord) AS latest_orderkey,
           strftime(max(o_orderdate), '%Y-%m-%d') AS latest_orderdate,
           round(arg_max(o_totalprice, ord), 2) AS latest_totalprice
    FROM k GROUP BY o_custkey
    """,
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax WITHOUT a window: max_by over a composite (date, key)
    lexicographic ordering key — one partial-aggregable shuffle instead
    of a full per-key sort, the cheaper plan when only the argmax row
    is needed (F1's row_number shape costs a sort; this costs a max).
    The zero-padded composite keeps ties deterministic in both engines
    (DuckDB's arg_max takes no struct ordering, so both sides order by
    the same string)."""
    o = load_table(spark, sf_dir, "orders")
    ordkey = F.concat(
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.lit("|"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
    )
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", ordkey).alias("latest_orderkey"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("latest_orderdate"),
        F.round(F.max_by("o_totalprice", ordkey), 2).alias("latest_totalprice"),
    )


# --------------------------------------------------------------------------
# Set-op family: INTERSECT (nations present on both sides of the market)
# --------------------------------------------------------------------------
@register(
    "nations_with_both",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def nations_with_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT completes the set-op family (union H1,
    anti/except via customers_without_orders): nations with at least one
    customer AND one supplier. Plans as an aggregate + semi-join over
    pre-distincted sides, not a pairwise comparison."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)
