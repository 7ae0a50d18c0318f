"""Text-analysis query family: fingerprints, language-ID, quality
scoring, TF-IDF, perplexity proxy, repetition filter (split from
llm_queries.py so the per-file freshness clock tracks one family).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mle_proj_datapipeline_spark.operators import text as tx
from mle_proj_datapipeline_spark.plans.llm_common import P, _h31
from mle_proj_datapipeline_spark.plans.registry import register
from mle_proj_datapipeline_spark.sources.catalog import load_table

# --------------------------------------------------------------------------
# Text: document fingerprint (rolling hash) groups
# --------------------------------------------------------------------------
@register(
    "doc_fingerprints",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang,
               list_transform(string_split(text, ' '), tok -> {_h31('tok')}) AS hs
        FROM documents)
    SELECT CAST(list_reduce(list_concat([CAST(0 AS BIGINT)], hs),
                            (acc, x) -> (acc * 31 + x) % {P}) AS BIGINT) AS fp,
           count(*) AS n_docs, min(doc_id) AS first_doc
    FROM t GROUP BY 1
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive polynomial fingerprint per doc; grouping exposes
    exact token-sequence duplicates. 500/5000 distinct fp values make
    this a strong cross-engine hash-parity check."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(tx.doc_fingerprint(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
    )


# --------------------------------------------------------------------------
# Text: language-ID heuristic (confusion vs labeled lang)
# --------------------------------------------------------------------------
_LANG_SCORES = {
    lang: f"len(list_filter(string_split(text,' '), t -> t IN ({', '.join(repr(w) for w in ws)})))"
    for lang, ws in sorted(tx.LANG_STOPWORDS.items())
}
_G = f"greatest({', '.join(_LANG_SCORES.values())})"
_PRED = (
    "CASE WHEN " + _G + " = 0 THEN 'und' "
    + " ".join(f"WHEN {s} = {_G} THEN '{lang}'" for lang, s in _LANG_SCORES.items())
    + " END"
)


@register(
    "doc_lang_id",
    oracle=f"""
    SELECT lang, {_PRED} AS lang_pred, count(*) AS n
    FROM documents GROUP BY 1, 2
    """,
)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID vs the labeled lang column (confusion
    counts). Ties resolve alphabetically; no hits → 'und'."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", tx.lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# Text: quality scoring profile
# --------------------------------------------------------------------------
@register(
    "doc_quality_by_lang",
    oracle="""
    WITH q AS (
        SELECT lang,
               length(text) AS n_chars,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
               CAST(length(text) - length(regexp_replace(text, '[a-z]', '', 'g')) AS DOUBLE)
                 / length(text) AS alpha_ratio,
               len(regexp_extract_all(text, '[a-z]+')) AS n_alpha_words
        FROM documents)
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT)      AS total_tokens,
           CAST(sum(n_alpha_words) AS BIGINT) AS total_alpha_words,
           round(avg(alpha_ratio), 4) AS avg_alpha_ratio,
           CAST(sum(n_chars) AS DOUBLE) / sum(n_tokens) AS chars_per_token
    FROM q GROUP BY lang
    """,
)
def doc_quality_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter features (length/token/char-class ratios) rolled up
    per language — the shape of a pretraining quality gate."""
    docs = load_table(spark, sf_dir, "documents")
    feats = tx.quality_features(F.col("text"))
    q = docs.select(
        "lang",
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        feats["alpha_ratio"].alias("alpha_ratio"),
        tx.word_count_regex(F.col("text")).alias("n_alpha_words"),
    )
    return q.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_alpha_words").alias("total_alpha_words"),
        F.round(F.avg("alpha_ratio"), 4).alias("avg_alpha_ratio"),
        (F.sum("n_chars").cast("double") / F.sum("n_tokens")).alias("chars_per_token"),
    )


# --------------------------------------------------------------------------
# Text: TF-IDF top terms per corpus source
# --------------------------------------------------------------------------
@register(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
        FROM documents),
    tf  AS (SELECT doc_id, source, term, count(*) AS tf
            FROM tok GROUP BY doc_id, source, term),
    df  AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n   AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
        SELECT tf.source, tf.term,
               round(avg(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df)), 4) AS avg_tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
        GROUP BY tf.source, tf.term),
    ranked AS (
        SELECT source, term, avg_tfidf,
               row_number() OVER (PARTITION BY source ORDER BY avg_tfidf DESC, term ASC) AS rk
        FROM scored)
    SELECT source, term, avg_tfidf, rk FROM ranked WHERE rk <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most distinctive terms per corpus source by average TF-IDF
    — explode → tf per doc-term, then df DERIVED from tf (its rows are
    already unique per (doc, term), so document frequency is a plain
    count — no second corpus explode/tokenize pass; measured 1.2→0.9 s
    at sf0.1) → broadcast the (small) df table back → per-source top-k.
    No MLlib HashingTF (hash collisions would make the oracle inexact);
    the df side is a term dictionary, exactly the global-dictionary
    pattern the engine uses for categorical encoding."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("term")
    )
    from mle_proj_datapipeline_spark.sources.snapshots import materialize_frame

    # r12: tf feeds BOTH the df broadcast build and the scored join —
    # without a cut the tokenize/explode/agg subtree executes twice in
    # one job (guide §2.4). The cut is (doc, distinct-term)-sized.
    tf = materialize_frame(
        tok.groupBy("doc_id", "source", "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("source", "term")
        .agg(
            F.round(
                F.avg(F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))), 4
            ).alias("avg_tfidf")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.desc("avg_tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("source", "term", "avg_tfidf", "rk")
    )


# --------------------------------------------------------------------------
# Text analysis: perplexity-proxy quality scoring (Arrow pandas-UDF path)
# --------------------------------------------------------------------------
_PPL_COUNTS = ", ".join(
    f"length(regexp_replace(text, '[^{rx[1:-1]}]', '', 'g')) AS k{i}"
    for i, (_, rx) in enumerate(tx.PPL_CLASSES)
)
_PPL_OTHER = "n - " + " - ".join(f"k{i}" for i in range(len(tx.PPL_CLASSES)))


def _ppl_term(k: str) -> str:
    return (
        f"CASE WHEN {k} > 0 THEN -(CAST({k} AS DOUBLE)/n)*ln(CAST({k} AS DOUBLE)/n) "
        "ELSE 0 END"
    )


_PPL_H = " + ".join(_ppl_term(f"k{i}") for i in range(len(tx.PPL_CLASSES) + 1))


@register(
    "doc_ppl_scores",
    oracle=f"""
    WITH c AS (
        SELECT doc_id, lang, length(text) AS n, {_PPL_COUNTS} FROM documents),
    k AS (SELECT *, {_PPL_OTHER} AS k{len(tx.PPL_CLASSES)} FROM c)
    SELECT doc_id, lang,
           CASE WHEN n = 0 THEN NULL ELSE round(exp({_PPL_H}), 4) END AS ppl_proxy
    FROM k
    """,
)
def doc_ppl_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity proxy (char-class entropy, operators/
    text.ppl_proxy_udf) scored through the vectorized Arrow pandas-UDF
    path — the quality-classifier slot a real LM scorer plugs into. The
    oracle recomputes the identical entropy from SQL class counts, so
    the whole Arrow batch pipeline (serialization, null handling,
    batching) is exact-hash-verified, not just smoke-tested."""
    docs = load_table(spark, sf_dir, "documents")
    ppl = tx.ppl_proxy_udf()
    return docs.select(
        "doc_id", "lang", F.round(ppl(F.col("text")), 4).alias("ppl_proxy")
    )


# --------------------------------------------------------------------------
# Repetition-based quality filter (Gopher-style rules)
# --------------------------------------------------------------------------
@register(
    "doc_repetition_quality",
    oracle="""
    WITH t AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    c AS (SELECT doc_id, tok, count(*) AS n FROM t GROUP BY doc_id, tok),
    s AS (
        SELECT doc_id,
               CAST(sum(n) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(max(n) AS BIGINT) AS top_n
        FROM c GROUP BY doc_id)
    -- floor-shift rounding, not round(): an integer ratio like
    -- 2598/40000 sits exactly on the printed half-grid (0.06495) where
    -- Spark's round (BigDecimal HALF_UP on the shortest decimal string)
    -- and DuckDB's (binary value) disagree; floor(x*1e4 + 0.5)/1e4 is
    -- the same pure-double op in both engines (long-docs fuzz find,
    -- round 9 — same idiom as the impute-mean cents grid)
    SELECT doc_id,
           floor(n_distinct / CAST(total AS DOUBLE) * 10000 + 0.5) / 10000 AS ttr,
           floor(top_n / CAST(total AS DOUBLE) * 10000 + 0.5) / 10000 AS top_ratio,
           CAST(CASE WHEN n_distinct / CAST(total AS DOUBLE) >= 0.3
                      AND top_n / CAST(total AS DOUBLE) <= 0.2
                THEN 1 ELSE 0 END AS INT) AS keep
    FROM s
    """,
)
def doc_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filter (the Gopher-rule family):
    type-token ratio and most-common-token share per document; ``keep``
    drops boilerplate/degenerate docs (ttr < 0.3 or one token > 20%).

    Scale: explode + two partial-agg groupBys keyed on doc_id — shuffle
    volume is (doc, distinct-token) pairs, and every aggregate is
    map-side combinable. No per-doc quadratic HOF over the token array
    (an aggregate-within-transform would re-scan the array per distinct
    token)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    counts = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("n"))
    s = counts.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.max("n").cast("long").alias("top_n"),
    )
    ttr = F.col("n_distinct") / F.col("total").cast("double")
    top = F.col("top_n") / F.col("total").cast("double")
    # floor-shift rounding (see the oracle comment): cross-engine-exact
    # where round() flakes on a printed half-grid ratio like 2598/40000
    return s.select(
        "doc_id",
        (F.floor(ttr * 10000 + F.lit(0.5)) / 10000).alias("ttr"),
        (F.floor(top * 10000 + F.lit(0.5)) / 10000).alias("top_ratio"),
        F.when((ttr >= 0.3) & (top <= 0.2), F.lit(1)).otherwise(F.lit(0)).cast("int").alias("keep"),
    )



# --------------------------------------------------------------------------
# Text: distributed BPE vocabulary learning (merge-table training)
# --------------------------------------------------------------------------
_BPE_MERGES = 6
_BPE_CHARS = 64

# Oracle half of the case-fold convention pin (see
# operators/bpe.clean_text): İ (U+0130) → i+U+0307 — the one
# unconditional lowercase EXPANSION, which Spark's Java full case
# mapping applies but DuckDB's per-codepoint lower does not — and
# Σ → σ unconditionally, declaring away Java's context-sensitive
# Final_Sigma rule. With both substituted before lower(), the fold is
# a pure per-codepoint map in BOTH engines.
_CASEFOLD_PIN = "replace(replace(text, 'İ', 'i̇'), 'Σ', 'σ')"


def _bpe_oracle() -> str:
    """Unrolled BPE training as chained CTEs: per step, adjacent-pair
    counts over the double-delimited token stream, deterministic argmax
    (count DESC, left, right), literal merge rewrite. Exactly the
    recurrence operators/bpe.bpe_learn runs."""
    prep = f"""
    s0 AS (
        SELECT '||' || array_to_string(
                   string_split(replace(replace(
                       substr(lower({_CASEFOLD_PIN}), 1, {_BPE_CHARS}), '|', ''), ' ', '_'),
                   ''), '||') || '||' AS s
        FROM documents)"""
    stages = []
    for k in range(1, _BPE_MERGES + 1):
        stages.append(f"""
    t{k} AS (
        SELECT list_filter(string_split(s, '||'), x -> x <> '') AS tok
        FROM s{k - 1}),
    p{k} AS (
        SELECT u.z[1] AS l, u.z[2] AS r, count(*) AS c
        FROM (SELECT unnest(list_zip(tok, tok[2:])) AS z FROM t{k}) u
        WHERE u.z[2] IS NOT NULL
        GROUP BY 1, 2),
    m{k} AS (
        SELECT {k} AS step, l, r, c FROM p{k}
        ORDER BY c DESC, l, r LIMIT 1),
    s{k} AS (
        SELECT replace(s, '|' || l || '||' || r || '|', '|' || l || r || '|') AS s
        FROM s{k - 1} CROSS JOIN m{k})"""
        )
    union = " UNION ALL ".join(
        f"SELECT step, l AS left, r AS right, c AS pair_count FROM m{k}"
        for k in range(1, _BPE_MERGES + 1)
    )
    return f"WITH {prep},{','.join(stages)} {union}"


@register("bpe_merge_table", oracle=_bpe_oracle())
def bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING over the documents corpus: learn the
    first {n} merge rules (the artifact a tokenizer ships). Completes
    the text family's tokenizer story — ``doc_token_stats`` counts
    tokens with a fixed regex; this learns the vocabulary itself from
    corpus statistics. See operators/bpe.py for the per-step plan shape
    (one partial-aggregated pair-count shuffle + map-only rewrite) and
    the double-delimiter encoding that makes literal replace an exact
    greedy BPE merge in both engines."""
    from mle_proj_datapipeline_spark.operators.bpe import bpe_learn

    docs = load_table(spark, sf_dir, "documents")
    return bpe_learn(docs, "text", n_merges=_BPE_MERGES, max_chars=_BPE_CHARS)


def _bpe_segment_oracle() -> str:
    """bpe_apply twin: re-run the training chain (same CTEs as
    _bpe_oracle, merge rules only), then segment every doc with the
    final rule set and report per-doc token stats."""
    prep = f"""
    d0 AS (
        SELECT doc_id,
               replace(replace(substr(lower({_CASEFOLD_PIN}), 1, {_BPE_CHARS}), '|', ''),
                       ' ', '_') AS clean
        FROM documents),
    s0 AS (
        SELECT '||' || array_to_string(string_split(clean, ''), '||') || '||' AS s
        FROM d0),
    a0 AS (
        SELECT doc_id, clean,
               '||' || array_to_string(string_split(clean, ''), '||') || '||' AS s
        FROM d0)"""
    stages = []
    for k in range(1, _BPE_MERGES + 1):
        stages.append(f"""
    t{k} AS (
        SELECT list_filter(string_split(s, '||'), x -> x <> '') AS tok
        FROM s{k - 1}),
    p{k} AS (
        SELECT u.z[1] AS l, u.z[2] AS r, count(*) AS c
        FROM (SELECT unnest(list_zip(tok, tok[2:])) AS z FROM t{k}) u
        WHERE u.z[2] IS NOT NULL
        GROUP BY 1, 2),
    m{k} AS (
        SELECT l, r FROM p{k} ORDER BY c DESC, l, r LIMIT 1),
    s{k} AS (
        SELECT replace(s, '|' || l || '||' || r || '|', '|' || l || r || '|') AS s
        FROM s{k - 1} CROSS JOIN m{k}),
    a{k} AS (
        SELECT doc_id, clean,
               replace(s, '|' || l || '||' || r || '|', '|' || l || r || '|') AS s
        FROM a{k - 1} CROSS JOIN m{k})"""
        )
    last = f"a{_BPE_MERGES}"
    return f"""
    WITH {prep},{','.join(stages)}
    SELECT doc_id,
           CAST(len(clean) AS BIGINT) AS n_chars,
           CAST(len(list_filter(string_split(s, '||'), x -> x <> '')) AS BIGINT)
               AS n_tokens,
           round(CAST(len(clean) AS DOUBLE)
                 / len(list_filter(string_split(s, '||'), x -> x <> '')), 4)
               AS chars_per_token
    FROM {last} WHERE len(clean) > 0
    """


@register("bpe_segment_stats", oracle=_bpe_segment_oracle())
def bpe_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit→transform over the same corpus: learn the merge table
    (bpe_learn), then SEGMENT every document with it (bpe_apply — the
    merge table is the driver-held model artifact applied as chained
    map-only literal replaces) and report per-doc compression:
    chars per BPE token. The production shape: train once, persist the
    merge table, transform any corpus with zero extra shuffles."""
    from mle_proj_datapipeline_spark.operators.bpe import bpe_apply, bpe_learn, clean_text

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_learn(docs, "text", n_merges=_BPE_MERGES, max_chars=_BPE_CHARS)
    applied = bpe_apply(docs, merges, "text", max_chars=_BPE_CHARS)
    clean = clean_text(F.col("text"), _BPE_CHARS)
    toks = F.filter(F.split(F.col("bpe_stream"), r"\|\|"), lambda t: t != F.lit(""))
    return (
        applied.select(
            "doc_id",
            F.length(clean).cast("bigint").alias("n_chars"),
            F.size(toks).cast("bigint").alias("n_tokens"),
        )
        .filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "n_chars",
            "n_tokens",
            F.round(F.col("n_chars").cast("double") / F.col("n_tokens"), 4).alias(
                "chars_per_token"
            ),
        )
    )
