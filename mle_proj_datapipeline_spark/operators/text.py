"""Text-analysis operators for training-data pipelines: language ID
(stopword heuristic), quality scoring, token counting, and document
fingerprinting. All built-in expressions (no UDFs), all with exact SQL
oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column

from mle_proj_datapipeline_spark.operators.hashing import P31, h31

# Tiny stopword lists per language for the n-gram/stopword heuristic.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist"),
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "de", "et", "est"),
}


def tokens(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.split(col, " ")


def token_count(text: Column | str) -> Column:
    """Whitespace token count via length arithmetic (dialect-neutral)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.length(col) - F.length(F.regexp_replace(col, " ", "")) + F.lit(1)


def word_count_regex(text: Column | str, pattern: str = "[a-z]+") -> Column:
    """Regex token count (BPE-ish pre-tokenizer shape)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(col, F.lit(pattern))


def stopword_hits(text: Column | str, lang: str) -> Column:
    """How many tokens are stopwords of ``lang`` (with multiplicity)."""
    toks = tokens(text)
    words = LANG_STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def lang_id(text: Column | str) -> Column:
    """Argmax language by stopword hits; ties and zero-hit docs resolve
    to the alphabetically-first language ('und' when no hits at all)."""
    scores = [(lang, stopword_hits(text, lang)) for lang in sorted(LANG_STOPWORDS)]
    best = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    for lang, s in reversed(scores):  # earlier langs win ties
        out = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def quality_features(text: Column | str) -> dict[str, Column]:
    """Length / token / character-class stats used for quality filters."""
    col = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(col)
    n_tokens = token_count(col)
    n_alpha = F.length(col) - F.length(F.regexp_replace(col, "[a-z]", ""))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        # try_divide, not /: an EMPTY document must score NULL (the
        # oracle's DuckDB division-by-zero semantics, skipped by avg),
        # not crash the whole corpus scan under ANSI mode — found by
        # the mutated-table fuzz harness injecting an empty doc.
        "alpha_ratio": F.try_divide(n_alpha.cast("double"), n_chars),
        "avg_token_len": F.try_divide(
            (n_chars - n_tokens + 1).cast("double"), n_tokens
        ),
    }


def doc_fingerprint(text: Column | str) -> Column:
    """Order-sensitive polynomial rolling hash over token hashes:
    fp = fold(tokens, 0, (acc, t) -> (acc*31 + H31(t)) mod P31).
    Equal fingerprints ⇒ identical token sequences (mod collisions) —
    the content-defined fingerprint used for exact-dup detection."""
    hs = F.transform(tokens(text), h31)
    return F.aggregate(
        hs,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(31) + x) % F.lit(P31),
    )


# Character classes for the perplexity-proxy scorer. Each class is a
# regex over one char; "other" is the complement. The same classes are
# embedded in the SQL oracle (llm_text_queries.doc_ppl_scores).
PPL_CLASSES: tuple[tuple[str, str], ...] = (
    ("lower", "[a-z]"),
    ("upper", "[A-Z]"),
    ("digit", "[0-9]"),
    ("space", "[ ]"),
)


def ppl_proxy_udf():
    """Vectorized Arrow pandas UDF: character-class perplexity proxy.

    Score = exp(H) where H is the Shannon entropy (nats) of the
    document's character-CLASS distribution (lower/upper/digit/space/
    other). Natural prose lands in a narrow band (mostly lowercase +
    spaces → low perplexity ≈ 1.5-2.5); boilerplate, code, and
    mojibake drift high — the cheapest useful stand-in for an LM
    perplexity filter, and deliberately simple enough to have an EXACT
    SQL oracle (unlike a real LM).

    This is the quality-classifier slot on the Arrow batch path
    (roadmap): swap the body for a real model (fasttext/LM scoring)
    without touching the Spark plumbing — same ``pandas_udf`` shape,
    same whole-column Arrow transfer, no per-row Python.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def ppl(texts: pd.Series) -> pd.Series:
        n = texts.str.len().to_numpy(dtype="float64")
        counts = [texts.str.count(rx).to_numpy(dtype="float64") for _, rx in PPL_CLASSES]
        counts.append(n - np.sum(counts, axis=0))  # "other" complement
        with np.errstate(divide="ignore", invalid="ignore"):
            h = np.zeros_like(n)
            for c in counts:
                p = np.where(n > 0, c / np.where(n > 0, n, 1.0), 0.0)
                h -= np.where(p > 0, p * np.log(np.where(p > 0, p, 1.0)), 0.0)
        return pd.Series(np.where(n > 0, np.exp(h), np.nan))

    return ppl
