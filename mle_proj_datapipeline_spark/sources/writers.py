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

    Requires ``spark.sql.sources.partitionOverwriteMode=dynamic`` (set by
    the session factory) so ``mode="overwrite"`` replaces only the
    partitions present in ``df`` — the engine's equivalent of the
    reference's per-week overwrite semantics.
    """
    writer = df.write.mode(mode).format(fmt)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)
