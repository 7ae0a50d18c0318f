"""SymSpell deletion-neighborhood blocking for bounded edit-distance
candidate generation.

The fuzzy-match family (entity resolution, near-duplicate names) is an
ENGINE EXTENSION per BASELINE.json's north star — the reference
(brsse/mle_proj_datapipeline) has no fuzzy-matching code to cite; it is
part of the "beyond the reference's own surface" LLM-data-pipeline
operator set this engine adds for 100 TB training-data work.

Theorem (SymSpell / Garbe): if ``levenshtein(a, b) <= d`` then deleting
at most ``d`` characters from each of ``a`` and ``b`` can produce a
common string — walk an optimal alignment and, per edit, delete the
substituted character from both sides, an inserted character from one
side, a deleted character from the other. Hence joining rows on their
(deduped) <=d-deletion variants yields a candidate set that is a strict
SUPERSET of all true <=d pairs, and an exact ``levenshtein`` filter
afterwards restores exactness.

Scale design (100 TB): the legacy (nation, name-length) block key is
Theta(sum block^2) — quadratic in block size, near-linear ONLY when the
key is selective (round-10 sf1 census: 60k-entity blocks -> 499 s).
Deletion-neighborhood buckets are keyed by string CONTENT, so bucket
membership is bounded by the local edit-neighborhood density, not by
attribute frequency: candidates stay near the true-pair count on any
name distribution. Costs: one row -> O(len^2) variant rows (deduped;
len is a short name, not a document), one equi-join shuffle on the
variant key, a cheap codegen levenshtein verify, and a pair-id
dropDuplicates. No UDFs — variants are generated with native
transform/sequence/substring higher-order functions.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def deletion_variants(name: Column, max_deletions: int = 2) -> Column:
    """Array of all distinct strings formed by deleting up to
    ``max_deletions`` (1 or 2) characters from ``name``, including the
    string itself — pure JVM higher-order functions, no UDF.

    Guards: ``sequence(1, L)`` DESCENDS when L < 1 (Spark semantics),
    so each deletion tier is gated on the length it needs; a NULL name
    yields a single-element [NULL] array (NULL bucket keys never
    equi-join, matching levenshtein-with-NULL semantics).
    """
    if max_deletions not in (1, 2):
        raise ValueError("deletion_variants supports max_deletions in {1, 2}")
    one = F.lit(1)
    length = F.length(name)
    empty = F.array().cast("array<string>")
    d1 = F.transform(
        F.sequence(one, length),
        lambda i: F.concat(
            F.substring(name, one, i - 1),
            F.substring(name, i + 1, length),
        ),
    )
    tiers = [F.array(name), F.when(length >= 1, d1).otherwise(empty)]
    if max_deletions == 2:
        d2 = F.flatten(
            F.transform(
                F.sequence(one, length - 1),
                lambda i: F.transform(
                    F.sequence(i + 1, length),
                    lambda j: F.concat(
                        F.substring(name, one, i - 1),
                        F.substring(name, i + 1, j - i - 1),
                        F.substring(name, j + 1, length),
                    ),
                ),
            )
        )
        tiers.append(F.when(length >= 2, d2).otherwise(empty))
    return F.array_distinct(F.concat(*tiers))


def symspell_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: Sequence[str] = (),
    max_edit: int = 2,
) -> DataFrame:
    """Exact bounded-edit-distance pairs via deletion-neighborhood
    blocking: all (id_a < id_b) with ``levenshtein(name_a, name_b) <=
    max_edit`` and equal values on every ``block_cols`` column.

    Returns columns ``[*block_cols, id_a, id_b, name_a, name_b,
    dist]`` — one row per unordered pair (multi-bucket duplicates are
    dropped on the pair id AFTER the levenshtein verify, so the
    dedup shuffle carries only true pairs).
    """
    blocks = list(block_cols)
    v = df.select(
        F.col(id_col).alias("__sp_id"),
        F.col(name_col).alias("__sp_name"),
        *blocks,
        F.explode(deletion_variants(F.col(name_col), max_edit)).alias("__sp_key"),
    )
    a = v.select(
        F.col("__sp_id").alias("id_a"),
        F.col("__sp_name").alias("name_a"),
        *blocks,
        "__sp_key",
    )
    b = v.select(
        F.col("__sp_id").alias("id_b"),
        F.col("__sp_name").alias("name_b"),
        *blocks,
        "__sp_key",
    )
    return (
        a.join(b, [*blocks, "__sp_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= F.lit(max_edit))
        .dropDuplicates(["id_a", "id_b"])
        .select(*blocks, "id_a", "id_b", "name_a", "name_b", "dist")
    )
