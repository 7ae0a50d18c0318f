"""observed_write (sources/observe.py): metrics ride the write's own
pass — correct values, no second scan, works against a real sink."""

from __future__ import annotations

import pyspark.sql.functions as F

from mle_proj_datapipeline_spark.sources.observe import observed_write
from tests.conftest import SF_ORACLE


def test_observed_metrics_match_recompute(spark):
    o = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    got = observed_write(
        o,
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_cust": F.count_if(F.col("o_custkey").isNull()),
            "sum_price_cents": F.sum(F.round(F.col("o_totalprice") * 100)),
        },
    )
    assert got["n_rows"] == o.count()
    assert got["n_null_cust"] == 0
    want = o.agg(F.sum(F.round(F.col("o_totalprice") * 100))).collect()[0][0]
    assert got["sum_price_cents"] == want


def test_observed_write_to_real_sink(spark, tmp_path):
    o = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").limit(100)
    path = str(tmp_path / "out")
    got = observed_write(o, {"n_rows": F.count(F.lit(1))}, path=path)
    assert got["n_rows"] == 100
    assert spark.read.parquet(path).count() == 100


def test_observe_is_single_scan(spark):
    """The observed plan must contain exactly the one scan the write
    itself needs — CollectMetrics piggybacks, it never re-reads."""
    o = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    observed = o.observe("m", F.count(F.lit(1)).alias("n"))
    plan = observed._sc._jvm.PythonSQLUtils.explainString(
        observed._jdf.queryExecution(), "formatted"
    )
    import re

    n_scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
    assert n_scans == 1, plan
    assert "CollectMetrics" in plan


def test_enforce_expectations_pass_and_fail(spark):
    from mle_proj_datapipeline_spark.sources.observe import (
        ExpectationError,
        enforce_expectations,
    )

    o = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    report = enforce_expectations(
        o,
        [
            ("has_rows", F.count(F.lit(1)), lambda v: v > 0),
            ("no_null_keys", F.count_if(F.col("o_orderkey").isNull()), lambda v: v == 0),
        ],
    )
    assert report["has_rows"] > 0

    import pytest

    with pytest.raises(ExpectationError) as ei:
        enforce_expectations(
            o,
            [
                ("impossible", F.count(F.lit(1)), lambda v: v < 0),
                ("also_bad", F.min("o_totalprice"), lambda v: v > 1e12),
            ],
        )
    # ALL failed rules are reported, not just the first
    assert len(ei.value.failures) == 2
    assert "impossible" in ei.value.failures[0]
