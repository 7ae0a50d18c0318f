"""Prototype-and-measure harness whose winning arm LANDED in round 12:
variant B below (single-shuffle bucket expansion) is now the registered
``operators/symspell.py::symspell_pairs`` implementation, and variant C
(materialize pairs before CC) landed in ``operators/cc.py``. Kept as
the measurement record for the FALSIFY_r12.json adjudication — the
"legacy" arm here resolves to the CURRENT operator after the rebuild,
so arm-vs-arm deltas no longer reproduce the pre-fix readings.

The r12 sparse-name probe showed the pair stage costs ~120 s at 150k
rows REGARDLESS of output (4,221 true pairs vs the dense synth's 17M):
the cost is the 2 x 22.8M-row string-keyed self-join shuffle, not pair
volume. Candidate fixes, each exactness-preserving:

A. xxhash64 variant keys — join on an 8-byte long instead of a ~20-byte
   string (hash collisions only ADD candidates with equal block cols;
   the levenshtein verify removes any non-pair, and every true pair is
   still found via its genuine shared variant).
B. bucket-collect — ONE shuffle (groupBy hashed key, collect_list of
   (id, name)) then JVM-side C(k,2) pair expansion via array HOFs,
   instead of shuffling the variant relation twice through a
   sort-merge self-join. Oversize buckets (adversarial all-equal
   names) fall back to the join path under a cap so no single array
   materializes k^2 pairs.
C. (golden_records only) localCheckpoint the pair set before CC — CC
   derives nodes and edges as two separate actions over the un-
   materialized pair lineage, evaluating the expensive stage twice.

Measured on BOTH name distributions (sparse realistic + dense
sequential synth sf1) before anything lands on r13-prep.
"""

from __future__ import annotations

import os
import sys
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from mle_proj_datapipeline_spark.operators.symspell import (  # noqa: E402
    deletion_variants,
    symspell_pairs,
)

SPARSE_DIR = os.path.join(HERE, "spark-warehouse", "sparse_sf1")
DENSE_DIR = os.path.join(HERE, "spark-warehouse", "synth_sf1")


def symspell_pairs_hashed(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols=(),
    max_edit: int = 2,
) -> DataFrame:
    """Variant A: identical join shape, 8-byte hashed variant key."""
    blocks = list(block_cols)
    v = df.select(
        F.col(id_col).alias("__sp_id"),
        F.col(name_col).alias("__sp_name"),
        *blocks,
        F.explode(
            F.transform(
                deletion_variants(F.col(name_col), max_edit),
                lambda s: F.xxhash64(s),
            )
        ).alias("__sp_key"),
    )
    a = v.select(
        F.col("__sp_id").alias("id_a"), F.col("__sp_name").alias("name_a"),
        *blocks, "__sp_key",
    )
    b = v.select(
        F.col("__sp_id").alias("id_b"), F.col("__sp_name").alias("name_b"),
        *blocks, "__sp_key",
    )
    return (
        a.join(b, [*blocks, "__sp_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= F.lit(max_edit))
        .dropDuplicates(["id_a", "id_b"])
        .select(*blocks, "id_a", "id_b", "name_a", "name_b", "dist")
    )


def symspell_pairs_bucketed(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols=(),
    max_edit: int = 2,
    max_bucket_expand: int = 1024,
) -> DataFrame:
    """Variant B: one shuffle — groupBy hashed (blocks, variant) key,
    collect members, expand C(k,2) pairs with array HOFs. Buckets
    larger than ``max_bucket_expand`` (adversarial duplicate-heavy
    keys) go through the legacy self-join instead, so no executor
    materializes a k^2 array."""
    blocks = list(block_cols)
    v = df.select(
        F.col(id_col).alias("__sp_id"),
        F.col(name_col).alias("__sp_name"),
        *blocks,
        F.explode(
            F.transform(
                deletion_variants(F.col(name_col), max_edit),
                lambda s: F.xxhash64(*blocks, s),
            )
        ).alias("__sp_key"),
    )
    buckets = v.groupBy("__sp_key", *blocks).agg(
        F.collect_list(F.struct("__sp_id", "__sp_name")).alias("__sp_ms")
    )
    small = buckets.filter(F.size("__sp_ms") <= max_bucket_expand)
    # i<j index pairs; order each pair by id so the downstream
    # dropDuplicates key is canonical
    ms = F.col("__sp_ms")
    n = F.size(ms)
    pair_idx = F.filter(
        F.flatten(
            F.transform(
                F.sequence(F.lit(0), n - 1),
                lambda i: F.transform(
                    F.sequence(F.lit(0), n - 1), lambda j: F.struct(i.alias("i"), j.alias("j"))
                ),
            )
        ),
        lambda p: p["i"] < p["j"],
    )
    expanded = (
        small.filter(n >= 2)
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
            ).otherwise(F.col("__sp_y.__sp_name")).alias("name_a"),
            F.when(
                F.col("__sp_x.__sp_id") < F.col("__sp_y.__sp_id"),
                F.col("__sp_y.__sp_name"),
            ).otherwise(F.col("__sp_x.__sp_name")).alias("name_b"),
        )
    )
    big = buckets.filter(F.size("__sp_ms") > max_bucket_expand)
    m = big.select(
        "__sp_key", *blocks, F.explode("__sp_ms").alias("__sp_m")
    ).select(
        "__sp_key", *blocks,
        F.col("__sp_m.__sp_id").alias("__sp_id"),
        F.col("__sp_m.__sp_name").alias("__sp_name"),
    )
    a = m.select(
        F.col("__sp_id").alias("id_a"), F.col("__sp_name").alias("name_a"),
        *blocks, "__sp_key",
    )
    b = m.select(
        F.col("__sp_id").alias("id_b"), F.col("__sp_name").alias("name_b"),
        *blocks, "__sp_key",
    )
    joined_big = (
        a.join(b, [*blocks, "__sp_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(*blocks, "id_a", "id_b", "name_a", "name_b")
    )
    return (
        expanded.unionByName(joined_big)
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= F.lit(2 if max_edit == 2 else max_edit))
        .dropDuplicates(["id_a", "id_b"])
        .select(*blocks, "id_a", "id_b", "name_a", "name_b", "dist")
    )


def main() -> None:
    from mle_proj_datapipeline_spark.session import get_spark
    from mle_proj_datapipeline_spark.sources.catalog import load_table

    spark = get_spark(app_name="symspell_v2")
    spark.sparkContext.setLogLevel("ERROR")
    which = sys.argv[1] if len(sys.argv) > 1 else "sparse"
    sf_dir = {"sparse": SPARSE_DIR, "dense": DENSE_DIR}[which]
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", F.length("c_name").alias("ln")
    )
    arms = {
        "legacy": symspell_pairs,
        "hashed": symspell_pairs_hashed,
        "bucketed": symspell_pairs_bucketed,
    }
    only = sys.argv[2:] or list(arms)
    counts = {}
    for tag in only:
        fn = arms[tag]
        t0 = time.time()
        n = fn(c, "c_custkey", "c_name", block_cols=("c_nationkey", "ln")).count()
        counts[tag] = n
        print(f"{which} {tag}: {n} pairs in {round(time.time() - t0, 1)} s", flush=True)
    if len(set(counts.values())) > 1:
        print("PAIR-COUNT MISMATCH:", counts, flush=True)


if __name__ == "__main__":
    main()
