"""Population Stability Index — the reference's drift metric
(``calculate_psi``, utils/model_operations.py:161-179: np.percentile
decile breakpoints from the expected series, bucket both series,
Σ (a−e)·ln(a/e)), rebuilt as pure DataFrame ops.

Engine form: exact ``percentile`` for breakpoints (matches the oracle's
quantile_cont; at 100 TB swap in percentile_approx — the sketch path —
and accept approximate breakpoints), broadcast the 9 breakpoints, bucket
via a filtered-array count, aggregate both series in one pass each.
Fractions are clamped at 1e-6 (the reference clamps at 1e-10 via
np.where; any positive epsilon regularizes ln(0)).

Breakpoints are ROUNDED TO 6 DECIMALS before bucketing, and every
oracle that buckets against quantile_cont must round identically: the
two engines' linear-interpolation arithmetic can land a breakpoint
O(1e-12) apart, and when a duplicate point-mass sits exactly on a
decile boundary (the dup-rows fuzz class) that noise flips `v > bp`
for every copy at once. Rounding pins one half-open convention; a
genuine ≥1e-6 breakpoint difference still diverges."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

EPS = 1e-6


def bucketize(value: Column, breakpoints: Column) -> Column:
    """Bucket index = #breakpoints strictly below value (0..len(bps))."""
    return F.size(F.filter(breakpoints, lambda b: value > b))


def psi(
    expected: DataFrame,
    actual: DataFrame,
    col: str,
    buckets: int = 10,
) -> DataFrame:
    """One-row DataFrame (psi DOUBLE). Breakpoints come from ``expected``
    (the reference semantics)."""
    qs = [i / buckets for i in range(1, buckets)]
    # r12 (guide §2.4): the breakpoint row is consumed by BOTH bucket
    # passes — uncut, the expected-side percentile scan ran twice; and
    # the totals were eager driver counts, each a THIRD/SECOND full
    # evaluation of its input subtree. Cut the 1-row breakpoint frame
    # once; fold totals as whole-frame window sums over the ≤(buckets+1)-
    # row bucket frame (every row — NULLs land in bucket 0 — is counted
    # in exactly one bucket, so sum(cnt) == count(*)). Each input is now
    # evaluated once per pass it genuinely needs: expected twice
    # (holistic percentile + bucketing), actual once.
    from mle_proj_datapipeline_spark.sources.snapshots import materialize_frame

    bps = materialize_frame(
        expected.agg(
            F.transform(
                F.percentile(F.col(col), F.array(*[F.lit(q) for q in qs])),
                lambda b: F.round(b, 6),
            ).alias("bps")
        )
    )

    def frac_by_bucket(df: DataFrame, name: str) -> DataFrame:
        return (
            df.crossJoin(F.broadcast(bps))
            .select(bucketize(F.col(col), F.col("bps")).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(f"{name}_cnt"))
        )

    e = frac_by_bucket(expected, "e")
    a = frac_by_bucket(actual, "a")
    from pyspark.sql import Window

    wall = Window.partitionBy()
    joined = (
        e.join(a, "bucket", "full")
        .select(
            "bucket",
            (
                F.coalesce(F.col("e_cnt"), F.lit(0))
                / F.sum("e_cnt").over(wall)
            ).alias("e_frac"),
            (
                F.coalesce(F.col("a_cnt"), F.lit(0))
                / F.sum("a_cnt").over(wall)
            ).alias("a_frac"),
        )
        .select(
            F.greatest(F.col("e_frac"), F.lit(EPS)).alias("e_frac"),
            F.greatest(F.col("a_frac"), F.lit(EPS)).alias("a_frac"),
        )
    )
    return joined.agg(
        F.round(
            F.sum((F.col("a_frac") - F.col("e_frac")) * F.log(F.col("a_frac") / F.col("e_frac"))),
            4,
        ).alias("psi")
    )
