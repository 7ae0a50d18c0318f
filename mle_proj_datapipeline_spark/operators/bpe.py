"""Distributed BPE vocabulary learning — byte-pair-encoding merges as
iterative DataFrame jobs.

The text family already *counts* tokens with a BPE-ish regex
(plans/llm_text_queries doc_token_stats); this module *learns* the
merge table itself, which is the part of tokenizer training that needs
the whole corpus: each merge step is a corpus-wide adjacent-pair count
(one shuffle, partial-aggregated), a driver-held argmax (one tiny row —
the merge RULE, same privilege as the k-means codebook / dictionary
encodings), and a map-only literal rewrite of every document.

Token-stream encoding: documents are carried as one string with every
token boundary marked by a DOUBLE delimiter — ``||tok||tok||`` — so a
merge of pair (a,b) is the literal replace ``|a||b|`` → ``|ab|``.
Adjacent occurrences each own one of the two shared boundary pipes,
which makes non-overlapping left-to-right literal replacement EXACTLY
the greedy BPE merge scan, and the rewritten string keeps the
double-delimiter invariant. Both engines (Spark `replace`, DuckDB
`replace`) implement the same left-to-right non-overlapping scan, so
the whole training run is bit-reproducible cross-engine — no RNG, no
order dependence.

Scale design (100 TB):
- Per merge step: ONE shuffle of (pair → partial count) at
  #partitions · |active pair vocab| volume, one broadcast-sized argmax
  (driver holds a single row), one map-only rewrite. No join of the
  corpus with anything.
- The corpus column is localCheckpoint-ed each step so lineage (and
  the replanning cost) stays constant across merges.
- Real tokenizer training does thousands of merges with the same loop
  shape; the cost driver is the rewrite pass, which is why production
  implementations batch multiple non-interacting merges per pass —
  noted here as the extension point, not implemented.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

DELIM = "||"


def encode_tokens(text: Column | str, max_chars: int = 64) -> Column:
    """Initial token stream: lowercase, truncate, strip the delimiter
    char, spaces to '_' (visible-space marker), one token per char,
    double-delimited. ``||h||e||l||l||o||``."""
    c = F.col(text) if isinstance(text, str) else text
    clean = F.replace(
        F.replace(F.substring(F.lower(c), 1, max_chars), F.lit("|"), F.lit("")),
        F.lit(" "),
        F.lit("_"),
    )
    return F.concat(
        F.lit(DELIM), F.array_join(F.split(clean, ""), DELIM), F.lit(DELIM)
    )


def pair_counts(corpus: DataFrame, stream_col: str = "s") -> DataFrame:
    """Corpus-wide adjacent-pair counts: (left, right, c). One shuffle,
    map-side combined."""
    toks = F.filter(
        F.split(F.col(stream_col), r"\|\|"), lambda t: t != F.lit("")
    )
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
    )
    return (
        corpus.select(F.explode(pairs).alias("p"))
        .select(F.col("p.0").alias("left"), F.col("p.1").alias("right"))
        .groupBy("left", "right")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bpe_learn(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
    max_chars: int = 64,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over ``docs[text_col]``; returns
    the merge table (step, left, right, pair_count) — the artifact a
    tokenizer ships. Deterministic argmax: (count DESC, left ASC,
    right ASC)."""
    spark = docs.sparkSession
    corpus = docs.select(encode_tokens(text_col, max_chars).alias("s")).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        top = (
            pair_counts(corpus)
            .orderBy(F.col("c").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()  # 1 row: the merge rule (driver-held, like a codebook)
        )
        if not top:
            break
        left, right, c = top[0]["left"], top[0]["right"], top[0]["c"]
        merges.append((step, left, right, c))
        corpus = corpus.select(
            F.replace(
                F.col("s"),
                F.lit(f"|{left}{DELIM}{right}|"),
                F.lit(f"|{left}{right}|"),
            ).alias("s")
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "step INT, left STRING, right STRING, pair_count BIGINT"
    )


def bpe_apply(
    docs: DataFrame,
    merges: DataFrame | list[tuple[str, str]],
    text_col: str = "text",
    max_chars: int = 64,
    out_col: str = "bpe_stream",
) -> DataFrame:
    """Transform step of the fit→transform pair: re-encode ``text_col``
    and apply the learned merges IN TRAINING ORDER as chained literal
    replaces (each is map-only, JVM-side). ``merges`` is the DataFrame
    ``bpe_learn`` returned (collected here — the merge table is the
    driver-held model artifact, thousands of rows at most) or an
    in-memory [(left, right), ...] list."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("step").collect()
        rules = [(r["left"], r["right"]) for r in rows]
    else:
        rules = list(merges)
    col = encode_tokens(text_col, max_chars)
    for left, right in rules:
        col = F.replace(
            col, F.lit(f"|{left}{DELIM}{right}|"), F.lit(f"|{left}{right}|")
        )
    return docs.withColumn(out_col, col)
