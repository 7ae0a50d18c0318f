"""Streaming medallion integration: weekly files land → foreachBatch
silver transform → snapshot_week-partitioned output. Asserts
stream==batch parity, incremental arrival handling, and idempotent
re-runs — the reference's FileSensor→bronze→silver DAG chain
(dags/dag.py:110-198) as one checkpointed stream."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mle_proj_datapipeline_spark.plans.medallion import silver_loan_terms, to_bronze
from mle_proj_datapipeline_spark.streaming.weekly import incremental_silver
from tests.fixtures import gen_domain_tables


def _transform(df):
    return silver_loan_terms(to_bronze(df))


@pytest.fixture(scope="module")
def loans(spark):
    from mle_proj_datapipeline_spark.schemas import DOMAIN_TABLES

    return spark.createDataFrame(
        gen_domain_tables()["loan_terms"], schema=DOMAIN_TABLES["loan_terms"]
    )


def _collect(spark, path):
    return {
        tuple(str(v) for v in r)
        for r in spark.read.parquet(path)
        .select("id", "snapshot_week", "grade")
        .collect()
    }


def test_incremental_silver_stream(spark, loans, tmp_path_factory):
    land = str(tmp_path_factory.mktemp("land"))
    out = str(tmp_path_factory.mktemp("silver_out") / "loan_terms")
    ckpt = str(tmp_path_factory.mktemp("ckpt"))

    weeks = sorted(
        r["wk"] for r in loans.select(
            F.date_format(F.date_trunc("week", F.date_add("snapshot_date", 1)), "yyyy-MM-dd").alias("wk")
        ).distinct().collect()
    )
    cut = weeks[len(weeks) // 2]
    early = loans.filter(
        F.date_format(F.date_trunc("week", F.date_add("snapshot_date", 1)), "yyyy-MM-dd") < cut
    )
    late = loans.subtract(early)

    # wave 1: early weeks land
    early.coalesce(1).write.mode("overwrite").parquet(f"{land}/w1")
    q = incremental_silver(spark, f"{land}/*", loans.schema, _transform, out, ckpt)
    q.awaitTermination(120)
    assert _collect(spark, out) == {
        tuple(str(v) for v in r)
        for r in _transform(early).select("id", "snapshot_week", "grade").collect()
    }

    # wave 2: late weeks land; early partitions must survive (dynamic
    # overwrite touches only the arriving weeks)
    late.coalesce(1).write.mode("overwrite").parquet(f"{land}/w2")
    q = incremental_silver(spark, f"{land}/*", loans.schema, _transform, out, ckpt)
    q.awaitTermination(120)
    full_batch = {
        tuple(str(v) for v in r)
        for r in _transform(loans).select("id", "snapshot_week", "grade").collect()
    }
    assert _collect(spark, out) == full_batch

    # re-run with same checkpoint: no reprocessing, output unchanged
    q = incremental_silver(spark, f"{land}/*", loans.schema, _transform, out, ckpt)
    q.awaitTermination(120)
    assert _collect(spark, out) == full_batch


def test_incremental_gold_aligns_sources(spark, tmp_path_factory):
    """Gold weeks materialize only when all four silver tables have the
    week (the FileSensor alignment), deferred weeks self-heal when the
    last source lands, and the final store equals the one-shot batch
    build."""
    from mle_proj_datapipeline_spark.plans.medallion import (
        gold_feature_store,
        silver_credit_history,
        silver_demographic,
        silver_financial,
        top_k_categories,
    )
    from mle_proj_datapipeline_spark.schemas import DOMAIN_TABLES
    from mle_proj_datapipeline_spark.streaming.gold import incremental_gold, partition_weeks

    silver_root = str(tmp_path_factory.mktemp("silver_root"))
    gold_root = str(tmp_path_factory.mktemp("gold_root"))
    ckpt = str(tmp_path_factory.mktemp("gold_ckpt"))

    raw = gen_domain_tables()
    transforms = {
        "credit_history": silver_credit_history,
        "demographic": silver_demographic,
        "financial": silver_financial,
        "loan_terms": silver_loan_terms,
    }
    silvers = {
        t: fn(to_bronze(spark.createDataFrame(raw[t], schema=DOMAIN_TABLES[t])))
        for t, fn in transforms.items()
    }
    weeks = sorted(
        r["snapshot_week"] for r in silvers["loan_terms"].select("snapshot_week").distinct().collect()
    )
    cut = weeks[len(weeks) // 2]
    emp_top = [c.strip().upper() for c in top_k_categories(silvers["demographic"], "emp_title", 10)]

    # wave 1: loan_terms lands in full; the other three only before `cut`
    for t, df in silvers.items():
        part = df if t == "loan_terms" else df.filter(F.col("snapshot_week") < cut)
        part.write.mode("overwrite").partitionBy("snapshot_week").parquet(f"{silver_root}/{t}")
    incremental_gold(spark, silver_root, gold_root, ckpt, emp_top)
    assert partition_weeks(spark, f"{gold_root}/feature_store") == {w for w in weeks if w < cut}

    # wave 2: the stragglers land; deferred weeks must now build
    for t, df in silvers.items():
        if t != "loan_terms":
            df.filter(F.col("snapshot_week") >= cut).write.mode("append").partitionBy(
                "snapshot_week"
            ).parquet(f"{silver_root}/{t}")
    incremental_gold(spark, silver_root, gold_root, ckpt, emp_top)
    assert partition_weeks(spark, f"{gold_root}/feature_store") == set(weeks)

    # parity with the one-shot batch build
    expected = gold_feature_store(
        silvers["credit_history"].drop("snapshot_week"),
        silvers["demographic"].drop("snapshot_week"),
        silvers["financial"].drop("snapshot_week"),
        silvers["loan_terms"],
        emp_title_top=emp_top,
    )
    got = spark.read.parquet(f"{gold_root}/feature_store")
    assert sorted(got.columns) == sorted(expected.columns)
    cols = ["id", "snapshot_week", "grade_ordinal", "loan_amnt", "emp_length_years"]

    def rows(df):
        return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())

    assert rows(got) == rows(expected)

    # idempotent re-run: checkpoints mean no new files, nothing rebuilt
    assert incremental_gold(spark, silver_root, gold_root, ckpt, emp_top) == []


def test_maintain_gold_backfills_half_written_week(spark, tmp_path_factory):
    """A crash between the feature_store and label_store writes leaves a
    week with features but no labels; the next maintenance pass must
    rebuild it (the 'have' set is the intersection of BOTH gold tables)."""
    import shutil

    from mle_proj_datapipeline_spark.plans.medallion import (
        silver_credit_history,
        silver_demographic,
        silver_financial,
        top_k_categories,
    )
    from mle_proj_datapipeline_spark.schemas import DOMAIN_TABLES
    from mle_proj_datapipeline_spark.streaming.gold import maintain_gold, partition_weeks

    silver_root = str(tmp_path_factory.mktemp("silver_root2"))
    gold_root = str(tmp_path_factory.mktemp("gold_root2"))

    raw = gen_domain_tables()
    transforms = {
        "credit_history": silver_credit_history,
        "demographic": silver_demographic,
        "financial": silver_financial,
        "loan_terms": silver_loan_terms,
    }
    silvers = {
        t: fn(to_bronze(spark.createDataFrame(raw[t], schema=DOMAIN_TABLES[t])))
        for t, fn in transforms.items()
    }
    for t, df in silvers.items():
        df.write.mode("overwrite").partitionBy("snapshot_week").parquet(f"{silver_root}/{t}")
    emp_top = [c.strip().upper() for c in top_k_categories(silvers["demographic"], "emp_title", 10)]

    built = maintain_gold(spark, silver_root, gold_root, emp_top)
    assert built, "initial build produced no weeks"

    # Simulate the crash: one week's label partition vanishes.
    victim = built[0]
    shutil.rmtree(f"{gold_root}/label_store/snapshot_week={victim}")
    assert victim not in partition_weeks(spark, f"{gold_root}/label_store")

    rebuilt = maintain_gold(spark, silver_root, gold_root, emp_top)
    assert victim in rebuilt
    assert victim in partition_weeks(spark, f"{gold_root}/label_store")
