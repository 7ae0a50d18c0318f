"""Weekly pipeline entry point — the engine's replacement for the
reference's Airflow DAG run (dags/dag.py:73-380): one command ingests
the four entity CSVs, runs bronze→silver→gold for a week (or all
weeks), and reports the retraining-trigger decision — no orchestrator,
no sensors, no per-task SparkSessions.

    python -m mle_proj_datapipeline_spark.cli \
        --source-dir /path/with/{credit_history,demographic,financial,loan_terms}.csv \
        --warehouse /path/to/warehouse [--week YYYY-MM-DD]

Weekly incremental semantics come from dynamic partition overwrite
(re-running a week is idempotent); full-history runs are the same code
with no week filter (the reference needed a separate catchup mode).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession

from mle_proj_datapipeline_spark.plans.medallion import run_pipeline
from mle_proj_datapipeline_spark.schemas import DOMAIN_TABLES
from mle_proj_datapipeline_spark.session import get_spark
from mle_proj_datapipeline_spark.sources.readers import read_csv

ENTITY_TABLES = ("credit_history", "demographic", "financial", "loan_terms")


def ingest(spark: SparkSession, source_dir: str) -> dict:
    """Declared-schema CSV ingest for the four entity tables (replaces
    inferSchema silver reads, silver_*.py:7). Corrupt rows are counted
    and quarantined, never fatal."""
    bronze = {}
    quarantined = {}
    for name in ENTITY_TABLES:
        # cache: Spark disallows filtering on ONLY the corrupt-record
        # column of a raw CSV scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
        df = read_csv(spark, f"{source_dir}/{name}.csv", DOMAIN_TABLES[name]).cache()
        bad = df.filter(df["_corrupt_record"].isNotNull())
        quarantined[name] = bad.count()
        bronze[name] = df.filter(df["_corrupt_record"].isNull()).drop("_corrupt_record")
    return {"bronze": bronze, "quarantined": quarantined}


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source-dir", required=True, help="dir with <table>.csv files")
    ap.add_argument("--warehouse", required=True, help="output root (parquet)")
    ap.add_argument("--week", default=None, help="Sunday YYYY-MM-DD; omit = all weeks")
    args = ap.parse_args(argv)

    spark = get_spark(app_name="weekly_pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    ing = ingest(spark, args.source_dir)
    out = run_pipeline(spark, ing["bronze"], args.warehouse, week_start=args.week)

    report = {
        "week": args.week or "ALL",
        "quarantined_rows": ing["quarantined"],
        "feature_store_rows": out["feature_store"].count(),
        "feature_store_cols": len(out["feature_store"].columns),
        "label_store_rows": out["label_store"].count(),
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
