"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's registry
(mle_proj_datapipeline_spark/plans/*) for the DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Importing the plan modules populates the registry.
import mle_proj_datapipeline_spark.plans.relational  # noqa: F401,E402
import mle_proj_datapipeline_spark.plans.pipeline_queries  # noqa: F401,E402
import mle_proj_datapipeline_spark.plans.llm_queries  # noqa: F401,E402
import mle_proj_datapipeline_spark.plans.feature_queries  # noqa: F401,E402
import mle_proj_datapipeline_spark.plans.extension_queries  # noqa: F401,E402
import mle_proj_datapipeline_spark.plans.lifecycle_queries  # noqa: F401,E402
from mle_proj_datapipeline_spark.plans.registry import ORACLES, QUERIES  # noqa: E402
from mle_proj_datapipeline_spark.session import tune_session  # noqa: E402

FLAGSHIP = "top_supplier_per_nation_week"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    return QUERIES[FLAGSHIP](spark, SMOKE_SF_DIR)


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(tune_session(spark), sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column aliases)."""
    return dict(ORACLES)
