"""Schema-declared readers.

The reference reads CSV with ``inferSchema=True`` (reference:
utils/silver_credit_history.py:7 et al.) — a two-pass scan that is
unacceptable at 100 TB and yields drift-prone types. Every engine read
declares a StructType; malformed rows route to a permissive-mode corrupt
column instead of failing the job.
"""

from __future__ import annotations

import pyspark.sql.functions as F
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


def footer_stats(
    spark: SparkSession,
    path: str,
    min_cols: tuple[str, ...] = (),
    max_cols: tuple[str, ...] = (),
    require_pushdown: bool = True,
) -> DataFrame:
    """Metadata-only table stats: COUNT(*) plus MIN/MAX of the given
    columns served from parquet FOOTER statistics via DSv2 aggregate
    pushdown — the scan reads row-group metadata, not data pages, so at
    100 TB this answers in seconds regardless of table size.

    The v2 reader and ``spark.sql.parquet.aggregatePushdown`` are
    enabled only for the duration of this call (the session-wide default
    stays the v1 reader, whose plan shapes the rest of the engine is
    guarded against); the one-row result is materialized inside that
    window via an eager ``localCheckpoint``, then the confs are
    restored. With ``require_pushdown`` (the default) the call FAILS
    LOUDLY if the optimizer could not push the aggregate (e.g. a
    timestamp column, a filter, or a non-parquet source) — silently
    falling back to a full scan would defeat the point.
    """
    import pyspark.sql.functions as F

    from mle_proj_datapipeline_spark.sources.snapshots import materialize_frame

    conf_keys = {
        "spark.sql.sources.useV1SourceList": "",
        "spark.sql.parquet.aggregatePushdown": "true",
    }
    saved = {k: spark.conf.get(k, None) for k in conf_keys}
    for k, v in conf_keys.items():
        spark.conf.set(k, v)
    try:
        df = spark.read.parquet(path)
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        aggs += [F.min(c).alias(f"min_{c}") for c in min_cols]
        aggs += [F.max(c).alias(f"max_{c}") for c in max_cols]
        out = df.agg(*aggs)
        if require_pushdown:
            plan = out._sc._jvm.PythonSQLUtils.explainString(
                out._jdf.queryExecution(), "simple"
            )
            if "PushedAggregation: [COUNT" not in plan:
                raise ValueError(
                    f"footer_stats: aggregate was not pushed to the parquet "
                    f"footer for {path} (unsupported column type or source); "
                    f"use a plain agg instead of silently full-scanning"
                )
        try:
            return materialize_frame(out)
        except Exception as exc:  # zero-row-group file: no footer stats
            # Spark's pushdown reader throws AT EXECUTION on a parquet
            # file with no row groups ("No min/max found") — an empty
            # table genuinely has no footer statistics to serve
            # (empty-table fuzz find, round 7). Fall back to the plain
            # aggregate for THIS declared case only (count 0, NULL
            # min/max — the relation the SQL oracle produces); every
            # other failure keeps the loud contract above.
            if "No min/max found" not in str(exc):
                raise
            spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
            return materialize_frame(spark.read.parquet(path).agg(*aggs))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def read_parquet_evolved(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """Schema-evolution-tolerant parquet read: files written under
    OLDER schema versions (missing newer columns) and files carrying
    columns the engine no longer declares both load into exactly the
    declared ``schema`` — missing columns materialize as typed NULLs,
    undeclared columns are dropped, and matching columns are cast to
    the declared type AFTER the scan (so int files satisfy a bigint
    declaration). Caveat: parquet schema merge rejects files whose
    PHYSICAL type differs for the same column — type migrations need a
    rewrite (or a snapshot-table commit), only add/drop evolves freely.

    ``mergeSchema`` pays one footer pass over the file set (footers
    only — no data pages), which is the price of not maintaining a
    table format's schema log; snapshot tables (sources/snapshots.py)
    carry their schema in the manifest and skip it. Reads stay
    column-pruned: Catalyst prunes the merged schema down to what the
    query touches, and columns absent from an individual file are
    null-filled at the scan, not by a join."""
    raw = spark.read.option("mergeSchema", "true").parquet(path)
    present = {f.name for f in raw.schema.fields}
    cols = [
        (F.col(f.name).cast(f.dataType) if f.name in present
         else F.lit(None).cast(f.dataType)).alias(f.name)
        for f in schema.fields
    ]
    return raw.select(*cols)
