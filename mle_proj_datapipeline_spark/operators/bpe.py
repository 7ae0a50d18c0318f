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
  shape; the cost driver is the rewrite pass, so ``bpe_learn`` batches
  multiple NON-INTERACTING merges per pass (``batch`` parameter) with a
  selection rule that provably reproduces the sequential merge table —
  see ``select_merge_batch`` for the proof sketch. ``batch=1`` is the
  plain sequential loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

DELIM = "||"


def clean_text(text: Column | str, max_chars: int = 64) -> Column:
    """Canonicalized text the BPE stream is built from: case-fold,
    truncate to ``max_chars`` code points, strip the delimiter char,
    spaces to '_' (visible-space marker).

    Case-fold convention pin (round 9, unicode contract class): the two
    places Java's full case mapping diverges from per-codepoint folding
    are pre-substituted BEFORE ``lower()`` —

    - ``İ`` (U+0130) → ``i`` + U+0307, the only unconditional lowercase
      EXPANSION in Unicode (SpecialCasing.txt). Spark's ``lower`` (Java
      full mapping) already produces exactly this, so engine output is
      unchanged; DuckDB's per-codepoint ``lower`` yields a bare ``i``,
      which silently diverged the cross-engine stream (caught by the
      unicode fuzz class on 'İstanbul').
    - ``Σ`` (U+03A3) → ``σ`` unconditionally, declaring away Java's
      context-sensitive Final_Sigma rule (word-final Σ → ς) that
      per-codepoint engines don't apply.
    - ``I`` (ASCII) → ``i`` (ADVICE r9): on a tr/az-default-locale JVM,
      Java's ``String.toLowerCase()`` maps ASCII ``I`` to dotless ``ı``
      — the substitution makes the fold locale-proof for the Turkic
      mappings. It is a no-op relative to ``lower()`` on every other
      locale, and the oracle's per-codepoint ``lower`` already yields
      ``i``, so no oracle change is needed.

    With these pinned, the token stream is bit-identical in Spark and
    DuckDB independent of the JVM default locale for the tr/az case
    mappings; locales with further special mappings (lt's extra
    combining dots) are outside the corpus contract. The oracles mirror
    the İ/Σ replaces (plans/llm_text_queries)."""
    c = F.col(text) if isinstance(text, str) else text
    folded = F.replace(
        F.replace(
            F.replace(c, F.lit("İ"), F.lit("i̇")),
            F.lit("Σ"),
            F.lit("σ"),
        ),
        F.lit("I"),
        F.lit("i"),
    )
    return F.replace(
        F.replace(F.substring(F.lower(folded), 1, max_chars), F.lit("|"), F.lit("")),
        F.lit(" "),
        F.lit("_"),
    )


def encode_tokens(text: Column | str, max_chars: int = 64) -> Column:
    """Initial token stream over ``clean_text``: one token per char,
    double-delimited. ``||h||e||l||l||o||``."""
    return F.concat(
        F.lit(DELIM),
        F.array_join(F.split(clean_text(text, max_chars), ""), DELIM),
        F.lit(DELIM),
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


def select_merge_batch(
    ranked: list[tuple[str, str, int]],
    k: int,
    prior_compounds: set[str],
    truncated: bool,
) -> list[tuple[str, str, int]]:
    """Largest prefix of the ranked pair table that sequential BPE
    provably merges in exactly this order, so ONE rewrite pass can
    apply them all (VERDICT r5 item 5). ``ranked`` is the pair table in
    the deterministic argmax order (count DESC, left, right), possibly
    ``truncated`` to its top M rows; ``prior_compounds`` is every merge
    compound learned so far (the full multi-char vocabulary — initial
    tokens are single chars, so a compound string can coincide with an
    existing token ONLY via this set).

    Selection walks the ranking and keeps candidates whose symbols are
    disjoint from every earlier selection, stopping at the first
    conflict (count ``c_stop``). Why the result is exactly what the
    sequential recount-per-step loop picks:

    - A selected pair shares no symbol with earlier selections, so its
      count is unchanged when its turn comes (existing pair counts
      never increase: new adjacencies always involve a freshly created
      compound token, which — by the ``prior_compounds`` guard — equals
      no existing token string).
    - Every pair a prior merge creates or perturbs involves a merged
      symbol, i.e. is "dirty". All rows ranked before the stop point
      were selected (clean), so every dirty pair ranks at/after it:
      count ≤ c_stop. A CREATED pair's count is bounded by the dirty
      pair it descends from ((x,ab) ≤ (x,a); chains of batch merges
      bottom out in an original dirty pair), hence also ≤ c_stop.
    - Therefore any selection with count STRICTLY above c_stop beats
      every changed/new candidate at its sequential step; ties at
      c_stop are trimmed because the tie-break against an unseen new
      pair's name is undecidable from the table. The top-1 selection is
      the literal global argmax — always kept, so progress is
      guaranteed and ``batch=1`` degenerates to the sequential loop.
    - Self-pairs (l==r) and compounds colliding with an existing token
      (``l+r in prior_compounds``) make the merge's own output interact
      with later counts in ways the table can't bound, so such a
      selection closes the batch behind itself.
    """
    sel: list[tuple[str, str, int]] = []
    used: set[str] = set()
    c_stop = (ranked[-1][2] if ranked else 0) if truncated else 0
    stop_after = False
    for left, right, c in ranked:
        if stop_after or len(sel) == k or left in used or right in used:
            c_stop = c
            break
        sel.append((left, right, c))
        used.update((left, right))
        if left == right or (left + right) in prior_compounds:
            stop_after = True
    keep = sel[:1]
    for left, right, c in sel[1:]:
        if c <= c_stop:
            break
        keep.append((left, right, c))
    return keep


def bpe_learn(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
    max_chars: int = 64,
    batch: int = 8,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over ``docs[text_col]``; returns
    the merge table (step, left, right, pair_count) — the artifact a
    tokenizer ships. Deterministic argmax: (count DESC, left ASC,
    right ASC). Up to ``batch`` provably non-interacting merges are
    applied per corpus pass (see ``select_merge_batch`` — the output is
    bit-identical to the ``batch=1`` sequential loop, which the DuckDB
    oracle unrolls), cutting the count-shuffle + rewrite passes ~k×."""
    from mle_proj_datapipeline_spark.session import ensure_parallelism

    spark = docs.sparkSession
    # The corpus pass is re-run every count batch (explode of ~|chars|
    # adjacent pairs per doc + partial agg) and inherits the SCAN's
    # partitioning through the checkpoint — a single-file local corpus
    # would pin every BPE pass to one core (the symspell §2.6 lesson;
    # the driver's 8-vs-32-core ratio for bpe_merge_table read 0.89,
    # i.e. serial). Round-robin the raw ids/text BEFORE the encode so
    # the checkpointed stream is spread; no-op at cluster scale.
    corpus = (
        ensure_parallelism(docs.select(text_col))
        .select(encode_tokens(text_col, max_chars).alias("s"))
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, int]] = []
    compounds: set[str] = set()
    top_m = max(64, 8 * batch)
    pending = 0  # replaces applied lazily since the last checkpoint
    while len(merges) < n_merges:
        rows = (
            pair_counts(corpus)
            .orderBy(F.col("c").desc(), F.col("left"), F.col("right"))
            .limit(top_m)
            .collect()  # top slice of the ranking (driver-held, like a codebook)
        )
        if not rows:
            break
        ranked = [(r["left"], r["right"], r["c"]) for r in rows]
        chosen = select_merge_batch(
            ranked,
            min(batch, n_merges - len(merges)),
            compounds,
            truncated=len(ranked) == top_m,
        )
        col = F.col("s")
        for left, right, c in chosen:
            merges.append((len(merges) + 1, left, right, c))
            compounds.add(left + right)
            col = F.replace(
                col,
                F.lit(f"|{left}{DELIM}{right}|"),
                F.lit(f"|{left}{right}|"),
            )
        corpus = corpus.select(col.alias("s"))
        pending += len(chosen)
        # Rewrites are map-only, so re-deriving a few of them per count
        # pass beats materializing the whole corpus every batch —
        # checkpoint only when the lazy replace chain approaches the
        # expression-depth bound (the bpe_apply MAX_EXPR_CHAIN hazard).
        if pending >= MAX_EXPR_CHAIN // 2:
            corpus = corpus.localCheckpoint()
            pending = 0
    return spark.createDataFrame(
        merges, "step INT, left STRING, right STRING, pair_count BIGINT"
    )


MAX_EXPR_CHAIN = 64


def bpe_apply(
    docs: DataFrame,
    merges: DataFrame | list[tuple[str, str]],
    text_col: str = "text",
    max_chars: int = 64,
    out_col: str = "bpe_stream",
) -> DataFrame:
    """Transform step of the fit→transform pair: re-encode ``text_col``
    and apply the learned merges IN TRAINING ORDER as literal replaces
    (each is map-only). ``merges`` is the DataFrame ``bpe_learn``
    returned (collected here — the merge table is the driver-held model
    artifact, thousands of rows at most) or an in-memory
    [(left, right), ...] list.

    Physical strategy by rule count: up to ``MAX_EXPR_CHAIN`` rules the
    replaces chain as nested JVM expressions inside whole-stage codegen
    (zero Python); a PRODUCTION merge table (thousands of rules) would
    blow up Catalyst's analysis on a thousands-deep expression tree, so
    above the threshold the same in-order replace loop runs as ONE
    Arrow-batched ``mapInPandas`` stage — still map-only, analyzed
    once, same output bit-for-bit (tested across the threshold)."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("step").collect()
        rules = [(r["left"], r["right"]) for r in rows]
    else:
        rules = list(merges)
    encoded = encode_tokens(text_col, max_chars)
    if len(rules) <= MAX_EXPR_CHAIN:
        col = encoded
        for left, right in rules:
            col = F.replace(
                col, F.lit(f"|{left}{DELIM}{right}|"), F.lit(f"|{left}{right}|")
            )
        return docs.withColumn(out_col, col)

    import pandas as pd  # noqa: F401  (mapInPandas contract)

    pats = [(f"|{lf}{DELIM}{rt}|", f"|{lf}{rt}|") for lf, rt in rules]
    src = docs.withColumn(out_col, encoded)
    schema = src.schema

    def apply_rules(batches):
        for pdf in batches:
            s = pdf[out_col]
            for pat, rep in pats:
                # pandas str.replace(regex=False) is the same
                # left-to-right non-overlapping literal scan as
                # F.replace / DuckDB replace.
                s = s.str.replace(pat, rep, regex=False)
            pdf[out_col] = s
            yield pdf

    return src.mapInPandas(apply_rules, schema)
