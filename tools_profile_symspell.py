"""Stage-level profile of the symspell pair stage on the sparse_sf1
realistic-name set (round-12 falsification follow-up). Locates where
the ~120 s output-independent constant goes:

  t_read      — customer scan + block-col projection
  t_gen1      — ONE pass of variant generation (v.count())
  t_gen_mat   — materialize v once (write to parquet)
  t_join_mat  — self-join + verify + pair-dedup FROM the materialized
                variants (i.e. legacy minus the double generation)
  t_legacy    — the registered plan end-to-end (generation evaluated
                once per join side)

Usage: python tools_profile_symspell.py [sparse|dense]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import pyspark.sql.functions as F

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from mle_proj_datapipeline_spark.operators.symspell import (  # noqa: E402
    deletion_variants,
    symspell_pairs,
)


def main() -> None:
    from mle_proj_datapipeline_spark.session import get_spark
    from mle_proj_datapipeline_spark.sources.catalog import load_table

    which = sys.argv[1] if len(sys.argv) > 1 else "sparse"
    sf_dir = os.path.join(
        HERE, "spark-warehouse", {"sparse": "sparse_sf1", "dense": "synth_sf1"}[which]
    )
    spark = get_spark(app_name="profile_symspell")
    spark.sparkContext.setLogLevel("ERROR")

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", F.length("c_name").alias("ln")
    )
    t0 = time.time()
    n = c.count()
    print(f"t_read: {round(time.time()-t0,1)} s ({n} rows)", flush=True)

    v = c.select(
        F.col("c_custkey").alias("__sp_id"),
        F.col("c_name").alias("__sp_name"),
        "c_nationkey",
        "ln",
        F.explode(deletion_variants(F.col("c_name"), 2)).alias("__sp_key"),
    )
    t0 = time.time()
    nv = v.count()
    print(f"t_gen1: {round(time.time()-t0,1)} s ({nv} variant rows)", flush=True)

    mat = os.path.join(HERE, "spark-warehouse", f"__prof_variants_{which}")
    shutil.rmtree(mat, ignore_errors=True)
    t0 = time.time()
    v.write.mode("overwrite").parquet(mat)
    print(f"t_gen_mat: {round(time.time()-t0,1)} s", flush=True)

    vm = spark.read.parquet(mat)
    a = vm.select(
        F.col("__sp_id").alias("id_a"), F.col("__sp_name").alias("name_a"),
        "c_nationkey", "ln", "__sp_key",
    )
    b = vm.select(
        F.col("__sp_id").alias("id_b"), F.col("__sp_name").alias("name_b"),
        "c_nationkey", "ln", "__sp_key",
    )
    t0 = time.time()
    ncand = (
        a.join(b, ["c_nationkey", "ln", "__sp_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .count()
    )
    print(f"t_join_cand (from mat): {round(time.time()-t0,1)} s ({ncand} candidates)", flush=True)

    t0 = time.time()
    npairs = (
        a.join(b, ["c_nationkey", "ln", "__sp_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= F.lit(2))
        .dropDuplicates(["id_a", "id_b"])
        .count()
    )
    print(f"t_join_mat (full, from mat): {round(time.time()-t0,1)} s ({npairs} pairs)", flush=True)

    t0 = time.time()
    nl = symspell_pairs(
        c, "c_custkey", "c_name", block_cols=("c_nationkey", "ln")
    ).count()
    print(f"t_legacy: {round(time.time()-t0,1)} s ({nl} pairs)", flush=True)
    shutil.rmtree(mat, ignore_errors=True)


if __name__ == "__main__":
    main()
