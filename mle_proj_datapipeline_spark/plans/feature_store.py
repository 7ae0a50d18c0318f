"""Medallion end-to-end on the TPC-H-shaped testdata: ONE registered
query that runs the engine's flagship composite pipeline —
bronze (raw tables) → silver (typed per-entity aggregates) → gold
(wide, fixed-width numeric feature matrix + binary label) — under a
full DuckDB oracle (VERDICT r6 item 8: the fixtures-based medallion
build in plans/medallion.py is golden-tested locally but its input CSVs
are not among the driver's pre-registered tables, so the composite
path had no driver-verified row).

Shape parity with the reference pipeline (utils/gold_feature_store.py
288-353 in brsse/mle_proj_datapipeline): declared-category OHE (fixed
width, +OTHER bucket — never a per-batch fit), left joins onto an
entity spine, missing-indicator flags BEFORE fills, constant + mean
imputation, and a binary label column. Re-expressed on customer /
orders / lineitem so DuckDB can replay it exactly.

Scale: two partial-aggregated shuffles (orders and lineitem roll up to
|customers| rows each) + one broadcast of the 1-row global mean + the
spine joins on c_custkey — the canonical feature-store build plan; at
100 TB the per-entity aggregates are map-side combinable and the spine
join co-partitions on the entity key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mle_proj_datapipeline_spark.operators.encode import one_hot
from mle_proj_datapipeline_spark.operators.impute import add_missing_flags
from mle_proj_datapipeline_spark.plans.registry import register
from mle_proj_datapipeline_spark.sources.catalog import load_table

# Declared OHE categories (4 of the 5 segments, so OTHER is exercised):
# part of the schema contract, never refit per batch.
SEGMENT_CATS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD"]

_ORACLE = f"""
WITH ostats AS (
    SELECT o_custkey AS c_custkey,
           count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS total_spend,
           round(sum(o_totalprice), 2) / count(*) AS avg_order_value
    FROM orders GROUP BY 1),
listats AS (
    SELECT o.o_custkey AS c_custkey,
           round(sum(l.l_quantity), 4) AS total_qty,
           round(sum(l.l_discount), 2) / count(*) AS avg_discount
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1),
gmean AS (SELECT round(avg(avg_order_value), 4) AS g FROM ostats)
SELECT c.c_custkey,
       n.n_name AS nation,
       {", ".join(f"CASE WHEN c.c_mktsegment = '{s}' THEN 1 ELSE 0 END AS seg_{s}" for s in SEGMENT_CATS)},
       CASE WHEN c.c_mktsegment IN ({", ".join(f"'{s}'" for s in SEGMENT_CATS)})
                 OR c.c_mktsegment IS NULL THEN 0 ELSE 1 END AS seg_OTHER,
       round(c.c_acctbal, 4) AS acctbal,
       CASE WHEN c.c_acctbal > 5000 THEN 1 ELSE 0 END AS high_value,
       CASE WHEN os.c_custkey IS NULL THEN 1 ELSE 0 END AS orders_missing,
       coalesce(os.n_orders, 0) AS n_orders,
       coalesce(os.total_spend, 0.0) AS total_spend,
       coalesce(os.avg_order_value, gmean.g) AS avg_order_value,
       coalesce(ls.total_qty, 0.0) AS total_qty,
       coalesce(ls.avg_discount, 0.0) AS avg_discount
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN ostats os ON os.c_custkey = c.c_custkey
LEFT JOIN listats ls ON ls.c_custkey = c.c_custkey
CROSS JOIN gmean
"""


@register("feature_store_build", oracle=_ORACLE)
def feature_store_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze→silver→gold feature-store build, one row per customer:

    - silver: orders and lineitem roll up to per-customer aggregates
      (two partial-agg shuffles, map-side combinable);
    - gold: customer spine LEFT-joins the silver aggregates (a missing
      aggregate row IS the signal — flag first, fill second, exactly
      the medallion imputation order), declared-category OHE over
      c_mktsegment (fixed width + OTHER), broadcast nation dim, mean
      imputation of avg_order_value from the 1-row global aggregate
      (broadcast, no collect), and the binary high_value label."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_discount"
    )

    # r12 (guide §2.4): ostats feeds BOTH the gold spine join and the
    # global-mean imputation aggregate — without a lineage cut the
    # orders scan + per-customer groupBy executed twice (three orders
    # scans in the final plan). Cut once at the |customers|-sized silver
    # aggregate; gmean then folds the checkpointed rows.
    from mle_proj_datapipeline_spark.sources.snapshots import materialize_frame

    ostats = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("total_spend"),
        # round-the-exact-cents-sum THEN divide (registry float-parity
        # convention, see segment_order_stats): a rounded avg can land
        # on a decimal midpoint where HALF_UP on binary doubles splits
        # across engines.
        (F.round(F.sum("o_totalprice"), 2) / F.count(F.lit(1))).alias("avg_order_value"),
    )
    ostats = materialize_frame(ostats)
    listats = (
        li.join(o.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("total_qty"),
            (F.round(F.sum("l_discount"), 2) / F.count(F.lit(1))).alias("avg_discount"),
        )
    )
    # The global mean folds per-customer values in partition order, so
    # it is rounded at a 4dp grid before the fill (abs float noise
    # ~1e-7 on ~1e5-scale values, far inside the grid) — unrounded it
    # diverged from DuckDB the moment any customer actually needed the
    # imputation (caught by the mutated-table fuzz harness, seed 3
    # rate 8: heavy sampling creates order-less customers).
    gmean = ostats.agg(F.round(F.avg("avg_order_value"), 4).alias("__gmean"))

    spine = (
        c.join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("nation"), "c_mktsegment", "c_acctbal")
        .join(ostats, "c_custkey", "left")
        .join(listats, "c_custkey", "left")
        .crossJoin(F.broadcast(gmean))
    )
    # Flags must see the original nulls (impute-order contract): a
    # customer absent from ostats surfaces as NULL n_orders here.
    spine = add_missing_flags(spine, ["n_orders"], suffix="__null")
    spine = spine.withColumn("orders_missing", F.col("n_orders__null"))
    spine = one_hot(spine, "c_mktsegment", SEGMENT_CATS, prefix="seg")
    return spine.select(
        "c_custkey",
        "nation",
        *[F.col(f"seg_{s}") for s in SEGMENT_CATS],
        "seg_OTHER",
        F.round("c_acctbal", 4).alias("acctbal"),
        F.when(F.col("c_acctbal") > 5000, F.lit(1)).otherwise(F.lit(0)).alias("high_value"),
        "orders_missing",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"),
        F.coalesce("avg_order_value", F.col("__gmean")).alias("avg_order_value"),
        F.coalesce("total_qty", F.lit(0.0)).alias("total_qty"),
        F.coalesce("avg_discount", F.lit(0.0)).alias("avg_discount"),
    )
