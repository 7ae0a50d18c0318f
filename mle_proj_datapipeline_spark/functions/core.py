"""Scalar-function library (SURVEY.md §2.I and J3/J6/J7): native-
expression replacements for every Python UDF and driver-side scalar the
reference uses. No Python UDFs — everything stays in whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def parse_leading_int(col: Column | str) -> Column:
    """First integer embedded in a string, NULL if none — the native form
    of the reference's ``regexp_extract(term, r"(\\d+)", 1)`` term parse
    (utils/gold_loan_terms.py:14), ANSI-safe via try_cast."""
    c = F.col(col) if isinstance(col, str) else col
    # regexp_extract yields '' on no-match; nullif makes the cast ANSI-safe
    return F.nullif(F.regexp_extract(c, r"(\d+)", 1), F.lit("")).cast("int")


def parse_emp_length(col: Column | str) -> Column:
    """Native when-chain replacing the reference's row-at-a-time Python
    UDF ``parse_emp_length`` (utils/gold_feature_store.py:128-146):
    '10+ years'→10, '< 1 year'→0, 'N years'→N, NULL/other→-1."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c.isNull(), F.lit(-1))
        .when(c.startswith("10+"), F.lit(10))
        .when(c.startswith("<"), F.lit(0))
        .otherwise(F.coalesce(parse_leading_int(c), F.lit(-1)))
        .cast("int")
    )


def to_date_mmm_yyyy(col: Column | str) -> Column:
    """``'Aug-2005'`` → DATE (utils/silver_credit_history.py:22)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(c, "MMM-yyyy")


def whole_months_between(a: Column | str, b: Column | str) -> Column:
    """Integer month difference (calendar months crossed) — the
    cross-engine-stable variant of months_between
    (utils/silver_credit_history.py:25)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return (F.year(ca) - F.year(cb)) * 12 + (F.month(ca) - F.month(cb))


def grade_to_ordinal(col: Column | str) -> Column:
    """A..G → 0..6, else -1 (utils/gold_loan_terms.py:18-26)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.lit(-1)
    for i, g in enumerate("ABCDEFG"):
        out = F.when(c == g, F.lit(i)).otherwise(out)
    return out.cast("int")


def binary_flag(col: Column | str, true_value: str) -> Column:
    """y/n-style recode → 0/1 (utils/silver_loan_terms.py:23-26)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == true_value, F.lit(1)).otherwise(F.lit(0))


def binary_target(col: Column | str, positive: tuple[str, ...] = ("D", "E", "F", "G")) -> Column:
    """grade ∈ {D..G} → 1 else 0 (utils/model_operations.py:96,191)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isin(*positive).cast("int")


def seconds_between(end: Column | str, start: Column | str) -> Column:
    """Whole-second gap ``end - start`` for TIMESTAMP **or**
    TIMESTAMP_NTZ columns. Direct ``ts.cast("long")`` is illegal on
    TIMESTAMP_NTZ (the driver-generated parquet carries naive
    ``timestamp[us]``, which Spark 4 reads as NTZ), and routing through
    ``timestamp_ltz`` would make the result session-timezone-dependent.
    Subtracting two timestamps of the same flavor yields a DAY-TO-SECOND
    interval, whose long cast is the exact second count — JVM-side and
    timezone-free. Each endpoint is date_trunc'd to the second first so
    the result counts second-boundary crossings, matching ANSI
    ``date_diff('second', start, end)`` on sub-second timestamps."""
    ce = F.col(end) if isinstance(end, str) else end
    cs = F.col(start) if isinstance(start, str) else start
    return (F.date_trunc("second", ce) - F.date_trunc("second", cs)).cast("long")


def normalize_category(col: Column | str, missing: str = "MISSING") -> Column:
    """coalesce → trim → upper (utils/gold_feature_store.py:107,
    utils/silver_demographic.py:18-19)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.upper(F.trim(F.coalesce(c, F.lit(missing))))
