"""Declarative null-imputation operator family (SURVEY.md §2.C).

The reference's imputation surface:
- constant fill 0/−1/999/"MISSING"  (utils/silver_credit_history.py:40-49,
  utils/silver_financial.py:23-38, utils/silver_demographic.py:20-23)
- per-column mode fill in a Python loop — one groupBy + one driver action
  PER COLUMN, i.e. 9 shuffles for 9 columns
  (utils/silver_credit_history.py:31-37; anti-pattern SURVEY §4.1)
- mean fill (utils/silver_financial.py:20-21)
- missing-indicator flags (utils/silver_credit_history.py:19,
  utils/silver_financial.py:15-17)

Engine design: ONE job for all mode columns (melt → single groupBy →
window rank), ONE job for all means (multi-aggregate row), then a single
projection applies every fill + flag. Mode tie-break is defined as
(count DESC, value ASC) — the reference leaves ties nondeterministic
(SURVEY §7 "what's hard").

Scale: the melt multiplies rows by n_mode_cols but aggregates with
map-side partial combine down to |distinct values| rows — at 100 TB this
is one shuffle of pre-aggregated (col, value, count) triples, versus N
full shuffles in the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from itertools import chain
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


@dataclass
class ImputeSpec:
    """What to fill where. All strategies apply in one pass."""

    constants: dict[str, Any] = field(default_factory=dict)
    mean_cols: list[str] = field(default_factory=list)
    mode_cols: list[str] = field(default_factory=list)
    flag_cols: list[str] = field(default_factory=list)  # adds {col}_missing 0/1


def add_missing_flags(df: DataFrame, cols: list[str], suffix: str = "_missing") -> DataFrame:
    """{col}_missing ∈ {0,1} (utils/silver_credit_history.py:19)."""
    return df.withColumns(
        {c + suffix: F.when(F.col(c).isNull(), F.lit(1)).otherwise(F.lit(0)) for c in cols}
    )


def compute_modes(df: DataFrame, cols: list[str]) -> dict[str, str]:
    """Per-column mode for all ``cols`` in ONE shuffle.

    Melt via map+explode → groupBy(col, value) → rank (count DESC, value
    ASC) → first per col. Returns string-typed modes; caller casts back.
    """
    if not cols:
        return {}
    kv = F.explode(
        F.map_from_arrays(
            F.array(*[F.lit(c) for c in cols]),
            F.array(*[F.col(c).cast("string") for c in cols]),
        )
    ).alias("col_name", "value")
    counts = (
        df.select(kv)
        .filter(F.col("value").isNotNull())
        .groupBy("col_name", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("col_name").orderBy(F.desc("cnt"), F.asc("value"))
    rows = counts.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1).collect()
    return {r["col_name"]: r["value"] for r in rows}


def compute_means(df: DataFrame, cols: list[str]) -> dict[str, float]:
    """All means in one multi-aggregate job (vs one job per column)."""
    if not cols:
        return {}
    row = df.agg(*[F.avg(c).alias(c) for c in cols]).first()
    return {c: row[c] for c in cols if row[c] is not None}


def fit_impute_stats(df: DataFrame, spec: ImputeSpec) -> dict[str, Any]:
    """Compute the data-dependent fill values (modes + means) once, as a
    pinnable stats dict. The imputation analogue of the global category
    dictionary (operators/encode.py): per-batch statistics drift across
    incremental runs — a week with unusual nulls would silently shift
    every fill — so streaming/weekly pipelines fit stats on a reference
    window and apply them to every batch (persist as a tiny JSON/table
    next to the checkpoint)."""
    return {**compute_means(df, spec.mean_cols), **compute_modes(df, spec.mode_cols)}


def impute(
    df: DataFrame, spec: ImputeSpec, stats: dict[str, Any] | None = None
) -> DataFrame:
    """Apply the full spec: flags first (they must see original nulls),
    then every fill in one projection. Pass ``stats`` (from
    ``fit_impute_stats`` on a reference window) to pin mode/mean fills
    across incremental batches; omit it for whole-dataset batch runs."""
    out = add_missing_flags(df, spec.flag_cols)
    if stats is None:
        stats = fit_impute_stats(df, spec)
    dtypes = dict(df.dtypes)
    fills: dict[str, F.Column] = {}
    for c, v in chain(spec.constants.items(), stats.items()):
        if c in dtypes:
            fills[c] = F.coalesce(F.col(c), F.lit(v).cast(dtypes[c]))
    return out.withColumns(fills)
