"""Spark 4 Python UDTF surface — demonstrated and FENCED.

The engine's policy is JVM-first: set-returning logic ships as
sequence/slice/explode expressions (plans/llm_corpus_queries.py
_chunk_frame), never as per-row Python. This module proves the UDTF
API is available and that a UDTF implementation of the exact same
chunk-span semantics agrees row-for-row with the JVM path — and then
asserts the policy: no UDTF is registered anywhere in the engine's
plan modules (the API exists for users; the hot path never pays the
Python round-trip).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.functions import lit, udtf

from mle_proj_datapipeline_spark.plans.llm_corpus_queries import (
    CHUNK_S,
    CHUNK_W,
    _chunk_frame,
)


@udtf(returnType="chunk_idx BIGINT, start_tok BIGINT, n_tokens BIGINT")
class ChunkSpans:
    """Sliding-window chunk spans of an n-token document — the Python
    twin of _chunk_frame's sequence/slice expressions."""

    def eval(self, n: int, width: int, stride: int):
        if n is None:
            return
        import math

        n_chunks = 1 + math.floor((max(n - width, 0) + (stride - 1)) / stride)
        for i in range(int(n_chunks)):
            start = i * stride
            yield (i, start, min(width, n - start))


def test_udtf_chunk_spans_match_jvm_path(spark):
    docs = spark.createDataFrame(
        [(i, "s", " ".join(["t"] * n)) for i, n in enumerate([1, 24, 32, 33, 80, 200])],
        "doc_id INT, source STRING, text STRING",
    )
    jvm = {
        (r["doc_id"], r["chunk_idx"], r["n_tokens"])
        for r in _chunk_frame(docs)
        .select("doc_id", "chunk_idx", F.size("ctoks").cast("bigint").alias("n_tokens"))
        .collect()
    }

    spark.udtf.register("chunk_spans", ChunkSpans)
    docs.select("doc_id", F.size(F.split("text", " ")).alias("n")).createOrReplaceTempView(
        "udtf_docs"
    )
    got = {
        (r["doc_id"], r["chunk_idx"], r["n_tokens"])
        for r in spark.sql(
            f"SELECT d.doc_id, c.chunk_idx, c.n_tokens "
            f"FROM udtf_docs d, LATERAL chunk_spans(d.n, {CHUNK_W}, {CHUNK_S}) c"
        ).collect()
    }
    assert got == jvm and got


def test_udtf_standalone_invocation(spark):
    rows = ChunkSpans(lit(80), lit(CHUNK_W), lit(CHUNK_S)).collect()
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2]
    assert rows[-1]["n_tokens"] == 80 - 2 * CHUNK_S


def test_no_udtf_in_engine_plans():
    """Policy fence: the engine itself never routes data through a
    Python UDTF — set-returning logic stays JVM-side."""
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "mle_proj_datapipeline_spark")
    for path in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        text = open(path).read()
        assert "udtf" not in text, f"UDTF leaked into engine module {path}"
