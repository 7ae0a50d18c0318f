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
len is a short name, not a document), ONE shuffle of the variant
relation (groupBy hashed bucket key + in-bucket pair expansion via
array HOFs), a cheap codegen levenshtein verify, and a pair-id
dropDuplicates. No UDFs — variants are generated with native
transform/sequence/substring higher-order functions.

Round-12 falsification rebuild (FALSIFY_r12.json): the r11 self-join
formulation evaluated the un-materialized variant relation once PER
JOIN SIDE and inherited the source's partitioning into the explode
stage (a single-file 150 k-row table ran the 22.8 M-row variant
explode on ONE core), so its cost was a large output-INDEPENDENT
constant — 139.6 s on a realistic sparse-name set with only 4,221
true pairs. This formulation (explode-parallelism guard + single
groupBy shuffle + C(k,2) bucket expansion, oversize buckets falling
back to an equi-join so no task materializes an unbounded k^2 array)
measures 21.0 s on that set and 101.1 s on the adversarial dense
synth-sf1 set (17,013,300 true pairs — output-bound, previously
~109 s). Pair sets proven identical by tests/test_symspell.py.
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
    max_bucket_expand: int = 1024,
) -> DataFrame:
    """Exact bounded-edit-distance pairs via deletion-neighborhood
    blocking: all (id_a < id_b) with ``levenshtein(name_a, name_b) <=
    max_edit`` and equal values on every ``block_cols`` column.

    Returns columns ``[*block_cols, id_a, id_b, name_a, name_b,
    dist]`` — one row per unordered pair (multi-bucket duplicates are
    dropped on the pair id AFTER the levenshtein verify, so the
    dedup shuffle carries only true pairs).

    Physical shape (round-12 rebuild, module docstring): the variant
    relation shuffles ONCE — groupBy on an ``xxhash64(blocks, variant)``
    bucket key, then C(k,2) in-bucket pair expansion with array HOFs.
    Buckets larger than ``max_bucket_expand`` (duplicate-heavy or
    adversarially dense keys) run through a per-bucket equi-join
    instead, so no task materializes a k^2 index array; any such
    instance is output-bound anyway (the bucket alone implies
    ~k^2/2 candidate pairs). Exactness is unaffected by hashing: a
    hash collision can only ADD candidates with equal block values,
    and the levenshtein verify removes every non-pair, while every
    true pair is still found through a genuinely shared variant
    (superset theorem above). NULL names hash into a shared bucket
    but ``levenshtein(NULL, ·) <= d`` is never true, preserving the
    no-NULL-matches contract of the legacy equi-join.

    Explode-parallelism guard: the O(len^2) variant explode runs in
    the SOURCE's partitioning (it precedes the first shuffle), so a
    small single-file input would generate tens of millions of
    variant rows on one core. Inputs with fewer partitions than the
    cluster's default parallelism are repartitioned on the id first;
    wide inputs (the 100 TB case) pass through untouched.
    """
    from mle_proj_datapipeline_spark.session import ensure_parallelism

    blocks = list(block_cols)
    # Legacy-join NULL contract: an equi-join key that is NULL never
    # matches, but groupBy treats NULLs as EQUAL — drop NULL-block rows
    # up front so the bucket path cannot pair what the join never did.
    for bc in blocks:
        df = df.filter(F.col(bc).isNotNull())
    df = ensure_parallelism(df)
    v = df.select(
        F.col(id_col).alias("__sp_id"),
        F.col(name_col).alias("__sp_name"),
        *blocks,
        F.explode(
            F.transform(
                deletion_variants(F.col(name_col), max_edit),
                lambda s: F.xxhash64(*[F.col(c) for c in blocks], s),
            )
        ).alias("__sp_key"),
    )
    buckets = v.groupBy("__sp_key", *blocks).agg(
        F.collect_list(F.struct("__sp_id", "__sp_name")).alias("__sp_ms")
    )
    ms = F.col("__sp_ms")
    n = F.size(ms)
    # i<j index pairs over the bucket array; each pair is canonicalized
    # by id order so the downstream dropDuplicates key is stable.
    pair_idx = F.filter(
        F.flatten(
            F.transform(
                F.sequence(F.lit(0), n - 1),
                lambda i: F.transform(
                    F.sequence(F.lit(0), n - 1),
                    lambda j: F.struct(i.alias("i"), j.alias("j")),
                ),
            )
        ),
        lambda p: p["i"] < p["j"],
    )
    expanded = (
        buckets.filter((n >= 2) & (n <= max_bucket_expand))
        .select(*blocks, F.explode(pair_idx).alias("__sp_p"), ms)
        .select(
            *blocks,
            F.element_at(ms, F.col("__sp_p.i") + 1).alias("__sp_x"),
            F.element_at(ms, F.col("__sp_p.j") + 1).alias("__sp_y"),
        )
        .select(
            *blocks,
            F.least("__sp_x.__sp_id", "__sp_y.__sp_id").alias("id_a"),
            F.greatest("__sp_x.__sp_id", "__sp_y.__sp_id").alias("id_b"),
            F.when(
                F.col("__sp_x.__sp_id") < F.col("__sp_y.__sp_id"),
                F.col("__sp_x.__sp_name"),
            )
            .otherwise(F.col("__sp_y.__sp_name"))
            .alias("name_a"),
            F.when(
                F.col("__sp_x.__sp_id") < F.col("__sp_y.__sp_id"),
                F.col("__sp_y.__sp_name"),
            )
            .otherwise(F.col("__sp_x.__sp_name"))
            .alias("name_b"),
        )
    )
    big = buckets.filter(n > max_bucket_expand).select(
        "__sp_key", *blocks, F.explode(ms).alias("__sp_m")
    )
    a = big.select(
        F.col("__sp_m.__sp_id").alias("id_a"),
        F.col("__sp_m.__sp_name").alias("name_a"),
        *blocks,
        "__sp_key",
    )
    b = big.select(
        F.col("__sp_m.__sp_id").alias("id_b"),
        F.col("__sp_m.__sp_name").alias("name_b"),
        *blocks,
        "__sp_key",
    )
    joined_big = (
        a.join(b, [*blocks, "__sp_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(*blocks, "id_a", "id_b", "name_a", "name_b")
    )
    return (
        expanded.unionByName(joined_big)
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= F.lit(max_edit))
        .dropDuplicates(["id_a", "id_b"])
        .select(*blocks, "id_a", "id_b", "name_a", "name_b", "dist")
    )
