"""Deterministic categorical encoding (SURVEY.md §2 J1/J2/J6).

The reference fits a StringIndexer+OneHotEncoder PER weekly batch
(utils/gold_feature_store.py:113-117,153-166,261-269), so encoding width
and index order drift across weeks — patched downstream by zero-filling
missing feature columns (utils/model_inference_utils.py:62-65;
anti-pattern SURVEY §4.2). Engine policy: encodings come from an
explicit, versionable DICTIONARY (value → stable index), derived
deterministically (frequency DESC, value ASC) or supplied by the caller,
and OHE emits a FIXED column set.

No MLlib vectors anywhere — OHE goes straight to 0/1 integer columns
(the reference immediately flattens its vectors back to scalars anyway,
gold_feature_store.py:118-125, with a driver action per column to probe
vector width)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def build_dictionary(df: DataFrame, col: str, max_size: int | None = None) -> DataFrame:
    """(value, idx) dictionary ordered by (count DESC, value ASC) — one
    shuffle; deterministic; monotonically growable by re-running on a
    superset and keeping old indices fixed upstream."""
    w = Window.orderBy(F.desc("cnt"), F.asc("value"))
    d = (
        df.select(F.col(col).alias("value"))
        .filter(F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("idx", F.row_number().over(w) - 1)
        .select("value", "idx")
    )
    return d.filter(F.col("idx") < max_size) if max_size else d


def dictionary_encode(
    df: DataFrame, col: str, dictionary: DataFrame, out_col: str | None = None
) -> DataFrame:
    """Replace a category with its dictionary index via broadcast join;
    unseen/null values get index -1 (explicit, not schema drift)."""
    out = out_col or f"{col}_idx"
    d = dictionary.select(
        F.col("value").alias(f"__dict_{col}"), F.col("idx").alias(out)
    )
    return (
        df.join(F.broadcast(d), df[col] == F.col(f"__dict_{col}"), "left")
        .drop(f"__dict_{col}")
        .withColumn(out, F.coalesce(F.col(out), F.lit(-1)))
    )


def one_hot(
    df: DataFrame,
    col: str,
    categories: list[str],
    other_bucket: bool = True,
    prefix: str | None = None,
) -> DataFrame:
    """Fixed-width OHE: one 0/1 column per *declared* category (+OTHER).

    The category list is part of the schema contract — every batch emits
    identical columns (vs the reference's per-batch fit width drift).
    Mirrors the top-10+OTHER capping at gold_feature_store.py:97-111."""
    p = prefix or col
    cols = {
        f"{p}_{c}": F.when(F.col(col) == c, F.lit(1)).otherwise(F.lit(0)) for c in categories
    }
    if other_bucket:
        cols[f"{p}_OTHER"] = F.when(
            F.col(col).isin(*categories) | F.col(col).isNull(), F.lit(0)
        ).otherwise(F.lit(1))
    return df.withColumns(cols)


def top_k_categories(df: DataFrame, col: str, k: int = 10) -> list[str]:
    """Deterministic top-k category list (count DESC, value ASC) — the
    engine form of the reference's top-10 emp_title collect
    (gold_feature_store.py:97-105, minus the RDD detour)."""
    rows = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(col))
        .limit(k)
        .collect()
    )
    return [r[col] for r in rows]
