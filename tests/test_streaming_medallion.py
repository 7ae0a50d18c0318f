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
