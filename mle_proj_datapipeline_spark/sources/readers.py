"""Schema-declared readers.

The reference reads CSV with ``inferSchema=True`` (reference:
utils/silver_credit_history.py:7 et al.) — a two-pass scan that is
unacceptable at 100 TB and yields drift-prone types. Every engine read
declares a StructType; malformed rows route to a permissive-mode corrupt
column instead of failing the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    permissive: bool = True,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """CSV scan with a declared schema (never inferSchema).

    ``permissive`` adds a corrupt-record column so bad rows are kept and
    quarantinable — at 100 TB a single bad row must not kill a stage.
    """
    read_schema = (
        StructType(list(schema.fields) + [StructField(corrupt_col, StringType(), True)])
        if permissive
        else schema
    )
    reader = spark.read.schema(read_schema)
    reader = reader.option("header", str(header).lower())
    if permissive:
        reader = reader.option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", corrupt_col)
    else:
        reader = reader.option("mode", "FAILFAST")
    return reader.csv(path)


def read_parquet(spark: SparkSession, *paths: str) -> DataFrame:
    """Parquet scan. Prefer ONE partitioned root + a partition predicate
    over enumerating paths (reference anti-pattern:
    utils/model_operations.py:33-35 passes 50 explicit weekly paths) —
    partition pruning then happens in the optimizer, not in Python."""
    return spark.read.parquet(*paths)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType,
    permissive: bool = True,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSONL scan with a declared schema — same contract as ``read_csv``
    (no inference pass, corrupt rows quarantined not fatal). For JSON
    *columns* inside a table use ``from_json`` (see json_event_props);
    this is for JSON-lines files as a source."""
    read_schema = (
        StructType(list(schema.fields) + [StructField(corrupt_col, StringType(), True)])
        if permissive
        else schema
    )
    reader = spark.read.schema(read_schema)
    if permissive:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    else:
        reader = reader.option("mode", "FAILFAST")
    return reader.json(path)
