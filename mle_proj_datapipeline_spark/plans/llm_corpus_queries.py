"""Corpus-construction query family: mixing, packing, PII scrub,
decontamination, chunking, splits, and the fused corpus-build capstone
(split from llm_queries.py so the per-file freshness clock tracks one
family).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mle_proj_datapipeline_spark.operators import hashing as dd
from mle_proj_datapipeline_spark.plans.llm_common import _SH, _h31
from mle_proj_datapipeline_spark.plans.registry import register
from mle_proj_datapipeline_spark.session import ensure_parallelism
from mle_proj_datapipeline_spark.sources.catalog import load_table

# --------------------------------------------------------------------------
# Data mixing: deterministic source-balanced downsampling
# --------------------------------------------------------------------------
@register(
    "balanced_corpus_sample",
    oracle=f"""
    WITH counts AS (
        SELECT source, count(*) AS n FROM documents GROUP BY source),
    target AS (SELECT min(n) AS m FROM counts)
    SELECT d.doc_id, d.source
    FROM documents d JOIN counts c ON d.source = c.source, target
    WHERE ({_h31("CAST(d.doc_id AS VARCHAR)")} % c.n) < target.m
    """,
)
def balanced_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data mixing: downsample every source toward the rarest
    source's size with a PURE-INTEGER hash threshold — keep iff
    H31(doc_id) mod n_source < n_min, so each source retains ≈ n_min
    docs in expectation. Deterministic across runs, engines, and
    cluster layouts (no RNG, no floats anywhere); per-source rates are
    a 5-row broadcast. The same shape implements any target mixture by
    replacing n_min with per-source target counts."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # r12 (guide §2.4): the rarest-source size was a separate aggregate
    # OF the per-source counts — re-evaluating the docs scan + groupBy —
    # attached by a second broadcast join. A window min over the ≤5-row
    # counts frame rides the same broadcast row: one scan for the
    # counts, one for the row stream.
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    counts = counts.withColumn("m", F.min("n").over(Window.partitionBy()))
    return (
        docs.join(F.broadcast(counts), "source")
        .filter(dd.h31(F.col("doc_id").cast("string")) % F.col("n") < F.col("m"))
        .select("doc_id", "source")
    )


# --------------------------------------------------------------------------
# Sequence packing: docs -> fixed token-budget context windows
# --------------------------------------------------------------------------
PACK_BUDGET = 256


@register(
    "context_window_packing",
    oracle=f"""
    WITH t AS (
        SELECT source, doc_id, len(string_split(text, ' ')) AS toks
        FROM documents),
    c AS (
        SELECT source, doc_id, toks,
               COALESCE(SUM(toks) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM t)
    SELECT source,
           CAST(floor(cum_before / {PACK_BUDGET}.0) AS BIGINT) AS pack_id,
           count(*) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS total_tokens
    FROM c GROUP BY source, pack_id
    """,
)
def context_window_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LM training: concatenate each source's docs
    in doc_id order and cut packs at every PACK_BUDGET cumulative
    tokens (the concat-and-chunk packing used to fill context windows;
    a doc straddling the boundary starts the next pack's count — the
    deterministic, shuffle-free definition both engines share).

    Scale: one window cum-sum per source (single shuffle on source,
    in-partition sort — same profile as the rolling-frame family), then
    a partial-agg groupBy. Packing is per-source sequential by
    definition; at 100 TB sources partition the work, and a finer
    pre-partitioned pack key (source, day) bounds any one window
    partition."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    toks = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = docs.select(
        "source",
        "doc_id",
        toks.alias("toks"),
    ).withColumn("cum_before", F.coalesce(F.sum("toks").over(w), F.lit(0)))
    return (
        c.withColumn(
            "pack_id", F.floor(F.col("cum_before") / F.lit(float(PACK_BUDGET))).cast("long")
        )
        .groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("long").alias("total_tokens"),
        )
    )


# --------------------------------------------------------------------------
# PII scrub: regex detection + redaction (counts and redacted length)
# --------------------------------------------------------------------------
_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "\\+1-555-[0-9]{4}"


@register(
    "pii_scrub_stats",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or +1-555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS full_text
        FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(full_text, '{_EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(full_text, '{_PHONE_RE}')) AS INT) AS n_phones,
           CAST(length(regexp_replace(regexp_replace(full_text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS INT) AS redacted_len
    FROM aug
    """,
)
def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: detect and redact emails and
    phone numbers with pure regex (JVM-side regexp_count /
    regexp_replace — no UDF). The fixture corpus carries no PII, so a
    deterministic email+phone per doc is appended first; the scrub then
    must find and redact exactly those (oracle checks counts AND the
    post-redaction byte length, so a lazy/greedy regex drift fails).

    Scale: pure narrow map work, linear; regexes are anchored-free,
    single-pass RE2-compatible patterns that behave identically in
    Spark (Java regex) and DuckDB (RE2)."""
    return pii_scrub_frame(load_table(spark, sf_dir, "documents"))


def pii_scrub_frame(docs: DataFrame) -> DataFrame:
    """The scrub projection itself — pure narrow map work, so the SAME
    expression runs unchanged on a batch frame or a readStream frame
    (batch/stream parity tested in tests/test_streaming.py)."""
    full = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(full, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(full, F.lit(_EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(full, F.lit(_PHONE_RE)).cast("int").alias("n_phones"),
        F.length(redacted).cast("int").alias("redacted_len"),
    )


# --------------------------------------------------------------------------
# Benchmark decontamination: shingle-containment of train docs vs benchmark
# --------------------------------------------------------------------------
DECON_DF_CAP = 25  # stop-shingles: drop shingles in more docs than this
DECON_THRESHOLD = 0.1


@register(
    "benchmark_decontamination",
    oracle=f"""
    WITH sh AS (SELECT doc_id, unnest({_SH}) AS s FROM documents),
    df AS (SELECT s, count(*) AS n FROM sh GROUP BY s),
    kept AS (SELECT sh.doc_id, sh.s FROM sh JOIN df USING (s)
             WHERE df.n <= {DECON_DF_CAP}),
    bench AS (SELECT * FROM kept WHERE doc_id % 50 = 0),
    train AS (SELECT * FROM kept WHERE doc_id % 50 != 0),
    m AS (SELECT t.doc_id AS train_id, b.doc_id AS bench_id, count(*) AS hits
          FROM train t JOIN bench b ON t.s = b.s GROUP BY 1, 2),
    sizes AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY doc_id)
    SELECT train_id, bench_id, CAST(hits AS BIGINT) AS hits,
           round(hits / CAST(sz AS DOUBLE), 4) AS containment
    FROM m JOIN sizes ON m.train_id = sizes.doc_id
    WHERE hits / CAST(sz AS DOUBLE) >= {DECON_THRESHOLD}
    """,
)
def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag training docs whose distinct
    word-3-gram containment against any benchmark doc (here the
    deterministic held-out slice doc_id % 50 == 0) exceeds a threshold
    — the n-gram-overlap check run before LM training.

    Scale shape: an INVERTED-INDEX equi-join on the shingle (ids only),
    with a document-frequency stop-shingle cap applied first — the
    corpus-wide fanout of a hot shingle ("in the the") is bounded by
    construction, the same skew discipline as the blocked dedup family.
    Counts then reduce per (train, bench) pair via map-side combinable
    aggregation; denominators join back from a per-doc size table.
    The capped shingle relation feeds THREE consumers (train side,
    bench side, per-doc sizes) and Spark does not reuse the exchange
    across them (verified: 0 ReusedExchange), so it is materialized
    once — shingling and the DF-cap window run exactly one time."""
    from pyspark.sql import Window

    from mle_proj_datapipeline_spark.sources.snapshots import materialize_frame

    docs = load_table(spark, sf_dir, "documents")
    # The shingle explode (split + 3-gram transform + array_distinct
    # per doc) runs in the SCAN stage, upstream of the DF-cap window's
    # exchange — a single-file local corpus pins it to one core (the
    # driver's 8-vs-32-core ratio read 1.00, i.e. fully serial).
    # Round-robin the raw (id, text) rows first; no-op at cluster
    # scale where the scan already arrives partitioned (guide §2.6).
    sh = ensure_parallelism(docs.select("doc_id", "text")).select(
        "doc_id", F.explode(dd.word_shingles(F.col("text"), 3)).alias("s")
    )
    # DF cap as a count-over-window on the shingle key: the (doc, s)
    # pairs must shuffle by s for the containment join anyway, so the
    # window piggybacks on that partitioning — one shuffle instead of
    # the groupBy+join form's two (measured ~1.8x at sf0.1).
    kept = materialize_frame(
        sh.withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy("s")))
        .filter(F.col("__n") <= DECON_DF_CAP)
        .drop("__n")
    )
    is_bench = F.col("doc_id") % 50 == 0
    bench = kept.filter(is_bench).select(F.col("doc_id").alias("bench_id"), "s")
    train = kept.filter(~is_bench).select(F.col("doc_id").alias("train_id"), "s")
    m = train.join(bench, "s").groupBy("train_id", "bench_id").agg(
        F.count(F.lit(1)).cast("long").alias("hits")
    )
    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    contain = F.col("hits") / F.col("sz").cast("double")
    return (
        m.join(sizes, m.train_id == sizes.doc_id)
        .filter(contain >= DECON_THRESHOLD)
        .select("train_id", "bench_id", "hits", F.round(contain, 4).alias("containment"))
    )


# --------------------------------------------------------------------------
# Sliding-window chunking (RAG / pretraining context chunks)
# --------------------------------------------------------------------------
CHUNK_W = 32  # window: tokens per chunk
CHUNK_S = 24  # stride: 8-token overlap between consecutive chunks

_CHUNK_CTE = f"""
    t AS (SELECT doc_id, source, string_split(text, ' ') AS toks,
                 len(string_split(text, ' ')) AS n
          FROM documents),
    c AS (SELECT doc_id, source, toks, n,
                 unnest(generate_series(0,
                     CAST(1 + floor((greatest(n - {CHUNK_W}, 0) + {CHUNK_S - 1})
                                    / {CHUNK_S}.0) AS BIGINT) - 1)) AS chunk_idx
          FROM t),
    s AS (SELECT doc_id, source, chunk_idx,
                 list_slice(toks, chunk_idx * {CHUNK_S} + 1,
                            chunk_idx * {CHUNK_S} + {CHUNK_W}) AS ctoks
          FROM c)
"""


def _chunk_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, source, chunk_idx, ctoks): overlapping CHUNK_W-token
    windows at stride CHUNK_S — narrow map work, no shuffle; the explode
    fans each doc out by ceil(max(n-W,0)/S)+1, proportional to its
    length (bounded fanout, unlike a per-token explode)."""
    toks = F.split(F.col("text"), " ")
    n = F.size("toks")
    n_chunks = (
        F.lit(1)
        + F.floor((F.greatest(n - CHUNK_W, F.lit(0)) + (CHUNK_S - 1)) / F.lit(float(CHUNK_S)))
    ).cast("bigint")
    return (
        docs.select("doc_id", "source", toks.alias("toks"))
        .withColumn("chunk_idx", F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)))
        .select(
            "doc_id",
            "source",
            "chunk_idx",
            F.expr(f"slice(toks, chunk_idx * {CHUNK_S} + 1, {CHUNK_W})").alias("ctoks"),
        )
    )


@register(
    "doc_sliding_chunks",
    oracle=f"""
    WITH {_CHUNK_CTE}
    SELECT doc_id, chunk_idx, CAST(len(ctoks) AS BIGINT) AS n_tokens,
           substr(md5(array_to_string(ctoks, ' ')), 1, 8) AS chunk_hash
    FROM s
    """,
)
def doc_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunking of every document (window
    CHUNK_W tokens, stride CHUNK_S) — the context-chunk fan-out a RAG
    indexer or a fixed-context pretraining tokenizer runs first. One
    narrow projection + bounded explode; chunk identity is the md5 of
    the reassembled window so the oracle verifies exact window
    boundaries, not just counts."""
    docs = load_table(spark, sf_dir, "documents")
    return _chunk_frame(docs).select(
        "doc_id",
        "chunk_idx",
        F.size("ctoks").cast("bigint").alias("n_tokens"),
        F.substring(F.md5(F.array_join("ctoks", " ")), 1, 8).alias("chunk_hash"),
    )


@register(
    "chunk_exact_dedup",
    oracle=f"""
    WITH {_CHUNK_CTE},
    h AS (SELECT doc_id, source, chunk_idx,
                 md5(array_to_string(ctoks, ' ')) AS h
          FROM s),
    r AS (SELECT source, h,
                 row_number() OVER (PARTITION BY h
                     ORDER BY doc_id ASC, chunk_idx ASC) AS rk
          FROM h)
    SELECT source,
           count(*) AS n_chunks,
           count(*) FILTER (WHERE rk = 1) AS n_kept,
           round(1.0 - CAST(count(*) FILTER (WHERE rk = 1) AS DOUBLE)
                     / count(*), 4) AS dup_ratio
    FROM r GROUP BY source
    """,
)
def chunk_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document CHUNK-level exact dedup (the paragraph-dedup pass
    of a pretraining pipeline, e.g. CCNet's, at window granularity):
    every chunk hashes its content, the first (doc_id, chunk_idx)
    occurrence survives, and the per-source duplication ratio reports
    how much of each source is redundant boilerplate.

    Scale: one shuffle on the content hash (the canonical exact-dedup
    key — uniform by construction, no skew), then a per-source
    partial agg."""
    from pyspark.sql import Window

    ch = _chunk_frame(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", "chunk_idx", F.md5(F.array_join("ctoks", " ")).alias("h")
    )
    w = Window.partitionBy("h").orderBy(F.asc("doc_id"), F.asc("chunk_idx"))
    ranked = ch.withColumn("rk", F.row_number().over(w))
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count(F.when(F.col("rk") == 1, 1)).alias("n_kept"),
        F.round(
            F.lit(1.0)
            - F.count(F.when(F.col("rk") == 1, 1)).cast("double") / F.count(F.lit(1)),
            4,
        ).alias("dup_ratio"),
    )


# --------------------------------------------------------------------------
# Temperature-based corpus mixing (alpha = 0.5 → sqrt scaling)
# --------------------------------------------------------------------------
@register(
    "corpus_mixing_weights",
    oracle="""
    WITH s AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source),
    z AS (SELECT sum(sqrt(n_tokens)) AS z, sum(n_tokens) AS tot FROM s)
    SELECT source, n_docs, n_tokens,
           round(sqrt(n_tokens) / z, 6) AS weight,
           round((sqrt(n_tokens) / z) / (CAST(n_tokens AS DOUBLE) / tot), 4)
               AS upsample
    FROM s, z
    """,
)
def corpus_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing for multi-corpus pretraining
    (alpha = 0.5, i.e. sqrt scaling — the unigram-LM / XLM-R recipe):
    per-source sampling weight ∝ n_tokens^alpha, plus the implied
    upsample factor vs natural proportions (rare sources > 1, dominant
    sources < 1).

    Scale: one per-source aggregate (tiny result) + a broadcast of the
    two scalar normalizers — the corpus itself is scanned once."""
    docs = load_table(spark, sf_dir, "documents")
    src = (
        docs.select("source", F.size(F.split(F.col("text"), " ")).alias("toks"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("bigint").alias("n_tokens"),
        )
    )
    # r12 (guide §2.4): the normalizers were a separate aggregate of the
    # per-source frame — re-running the tokenize + groupBy subtree — and
    # a broadcast cross-join. Whole-frame window sums over the ≤5-row
    # source frame: the corpus is genuinely scanned once now.
    from pyspark.sql import Window

    wall = Window.partitionBy()
    src = src.withColumn("z", F.sum(F.sqrt("n_tokens")).over(wall)).withColumn(
        "tot", F.sum("n_tokens").over(wall)
    )
    return src.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.sqrt("n_tokens") / F.col("z"), 6).alias("weight"),
        F.round(
            (F.sqrt("n_tokens") / F.col("z"))
            / (F.col("n_tokens").cast("double") / F.col("tot")),
            4,
        ).alias("upsample"),
    )


# --------------------------------------------------------------------------
# Capstone: the corpus build as ONE declarative plan
# --------------------------------------------------------------------------
MIN_TOKENS = 30
MIN_TTR = 0.3  # type-token ratio floor (Gopher-style repetition gate)


@register(
    "corpus_build_pipeline",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, source, text, string_split(text, ' ') AS toks
        FROM documents WHERE lang = 'en'),
    q AS (
        SELECT doc_id, source, text, toks, len(toks) AS n
        FROM base
        WHERE len(toks) >= {MIN_TOKENS}
          AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= {MIN_TTR}),
    d AS (
        SELECT doc_id, source, toks, n,
               row_number() OVER (PARTITION BY md5(text)
                   ORDER BY doc_id ASC) AS rk
        FROM q),
    k AS (SELECT doc_id, source, toks, n FROM d WHERE rk = 1),
    c AS (
        SELECT doc_id, source, toks, n,
               unnest(generate_series(0,
                   CAST(1 + floor((greatest(n - {CHUNK_W}, 0) + {CHUNK_S - 1})
                                  / {CHUNK_S}.0) AS BIGINT) - 1)) AS chunk_idx
        FROM k),
    s AS (
        SELECT source, doc_id,
               len(list_slice(toks, chunk_idx * {CHUNK_S} + 1,
                              chunk_idx * {CHUNK_S} + {CHUNK_W})) AS ct
        FROM c)
    SELECT source,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_chunks,
           CAST(sum(ct) AS BIGINT) AS n_chunk_tokens
    FROM s GROUP BY source
    """,
)
def corpus_build_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END corpus build as one declarative plan: language
    filter → quality gate (min length + type-token ratio) → exact dedup
    (content-hash keep-first) → sliding-window chunking → per-source
    yield stats. A reference user runs this as four orchestrated jobs
    with materialized intermediates; here Catalyst fuses it into one
    lineage — ONE scan of the corpus (plan-guarded), filters pushed to
    the scan, and the only shuffles are the dedup hash partition and
    the final per-source aggregate."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = docs.filter(F.col("lang") == "en").select(
        "doc_id", "source", "text", toks.alias("toks")
    )
    q = base.withColumn("n", F.size("toks")).filter(
        (F.col("n") >= MIN_TOKENS)
        & (F.size(F.array_distinct("toks")).cast("double") / F.col("n") >= MIN_TTR)
    )
    w = Window.partitionBy(F.md5("text")).orderBy(F.asc("doc_id"))
    kept = (
        q.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "source", "toks", "n")
    )
    n_chunks = (
        F.lit(1)
        + F.floor(
            (F.greatest(F.col("n") - CHUNK_W, F.lit(0)) + (CHUNK_S - 1))
            / F.lit(float(CHUNK_S))
        )
    ).cast("bigint")
    chunks = kept.withColumn(
        "chunk_idx", F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1))
    ).select(
        "source",
        "doc_id",
        F.size(
            F.expr(f"slice(toks, chunk_idx * {CHUNK_S} + 1, {CHUNK_W})")
        ).alias("ct"),
    )
    return chunks.groupBy("source").agg(
        F.count_distinct(F.col("doc_id")).alias("n_docs"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("ct").cast("bigint").alias("n_chunk_tokens"),
    )


@register(
    "train_val_test_split",
    oracle=f"""
    WITH s AS (
        SELECT source,
               CASE WHEN {_h31("'split|' || CAST(doc_id AS VARCHAR)")} % 100 < 80
                        THEN 'train'
                    WHEN {_h31("'split|' || CAST(doc_id AS VARCHAR)")} % 100 < 90
                        THEN 'val'
                    ELSE 'test' END AS split,
               len(string_split(text, ' ')) AS toks
        FROM documents)
    SELECT source, split,
           count(*) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS n_tokens
    FROM s GROUP BY source, split
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by content-stable
    hash (H31 of a salted doc key) — membership is a pure function of
    the row, so the split is reproducible under re-partitioning,
    re-runs, and engine changes (the property a rand()-based split
    silently loses; the reference's train_test_split re-shuffles every
    run). Per-(source, split) doc/token yields come out in one pass.

    Scale: narrow map + one partial-agg shuffle of (source, split)
    pairs; no sampling action, no second scan."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = dd.h31(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))) % 100
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(
            "source",
            split.alias("split"),
            F.size(F.split(F.col("text"), " ")).alias("toks"),
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("bigint").alias("n_tokens"),
        )
    )
