"""Supplementary r13 plan dumps for the subtrees that localCheckpoint
lineage cuts hide from the final registered-query plans:

- pagerank_iteration_<tag>.txt — the full 5-round supplier_pagerank
  iteration plan with the identity checkpointer (shows the per-round
  join structure the lazy cuts hide).
- bpe_paircount_<tag>.txt — one BPE pair-count pass over the encoded
  corpus subtree (pre-checkpoint), showing the scan parallelism.
- decon_kept_<tag>.txt — benchmark_decontamination's capped-shingle
  subtree (pre-materialize), showing the scan parallelism.

Run: python tools_plans_r13_sub.py <tag>   (tag = before/after; run
"before" from a worktree at the pre-change commit)."""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    from pyspark.sql import SparkSession, Window
    import pyspark.sql.functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)

    def dump(df, name):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print("ok", name)

    from mle_proj_datapipeline_spark.operators.graph import (
        cooccurrence_pairs,
        pagerank,
    )
    from mle_proj_datapipeline_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = cooccurrence_pairs(li, "l_orderkey", "l_suppkey", directed=False)
    ranks = pagerank(
        edges,
        iterations=5,
        validate=False,
        symmetric=True,
        checkpointer=lambda df: df,
    )
    dump(ranks, "pagerank_iteration")

    import mle_proj_datapipeline_spark.operators.bpe as B

    docs = load_table(spark, sf_dir, "documents")
    try:  # r13 corpus build (parallelism guard)
        from mle_proj_datapipeline_spark.session import ensure_parallelism

        has_guard = "ensure_parallelism" in open(B.__file__).read()
    except ImportError:
        has_guard = False
    if has_guard:
        corpus = (
            ensure_parallelism(docs.select("text"))
            .select(B.encode_tokens("text", 64).alias("s"))
        )
    else:
        corpus = docs.select(B.encode_tokens("text", 64).alias("s"))
    dump(B.pair_counts(corpus), "bpe_paircount")

    from mle_proj_datapipeline_spark.operators import hashing as dd
    import mle_proj_datapipeline_spark.plans.llm_corpus_queries as C

    decon_src = open(C.__file__).read()
    base = docs.select("doc_id", "text")
    if "ensure_parallelism(docs.select(\"doc_id\", \"text\"))" in decon_src:
        from mle_proj_datapipeline_spark.session import ensure_parallelism

        base = ensure_parallelism(base)
    sh = base.select("doc_id", F.explode(dd.word_shingles(F.col("text"), 3)).alias("s"))
    kept = (
        sh.withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy("s")))
        .filter(F.col("__n") <= C.DECON_DF_CAP)
        .drop("__n")
    )
    dump(kept, "decon_kept")


if __name__ == "__main__":
    main()
