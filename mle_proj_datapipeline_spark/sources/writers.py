"""Partitioned, idempotent sinks.

The reference writes one directory per week with the week encoded in the
*filename* (reference: utils/process_silver_tables.py:81-85,
utils/gold_feature_store.py:346-350) and overwrites the whole directory.
Engine version: Hive-style ``partitionBy`` columns + dynamic partition
overwrite, so re-running week W rewrites only W's partition and readers
get automatic partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Idempotent partition-overwrite write.

    Dynamic partition overwrite is set ON THE WRITER (never trusted to
    ambient session conf — a session lacking it would statically
    overwrite and delete every other partition), so ``mode="overwrite"``
    replaces only the partitions present in ``df`` — the engine's
    equivalent of the reference's per-week overwrite semantics.
    """
    writer = df.write.mode(mode).format(fmt)
    if partition_cols:
        if mode == "overwrite":
            writer = writer.option("partitionOverwriteMode", "dynamic")
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)


def compact_partitioned(
    spark,
    path: str,
    partition_col: str,
    files_per_partition: int = 1,
    fmt: str = "parquet",
) -> None:
    """Rewrite a Hive-partitioned table so each partition directory holds
    ``files_per_partition`` data files (small-file compaction for
    incremental sinks — streaming foreachBatch and weekly re-runs
    accrete a file per micro-batch per partition).

    One shuffle keyed on (partition value, file slot): every output task
    holds rows for exactly one target file, and dynamic partition
    overwrite swaps each directory's contents in place. At 100 TB run it
    per-partition-range (WHERE week BETWEEN ...) so the rewrite is
    incremental too; for versioned tables prefer
    sources/snapshots.compact (time-travel-safe).
    """
    import pyspark.sql.functions as F

    df = spark.read.format(fmt).load(path)
    slot = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(files_per_partition))
    (
        df.repartition(F.col(partition_col), slot)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .format(fmt)
        .save(path)
    )
