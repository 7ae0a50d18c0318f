"""Grouped-map Arrow operators (``applyInPandas``): per-entity model
fits that need the whole group in one pandas frame.

This is the third Arrow surface the engine exercises, next to
``mapInPandas`` (operators/multimodal.py, per-partition streaming) and
scalar ``pandas_udf`` (operators/text.ppl_proxy_udf, per-column
vectorized): ``applyInPandas`` shuffles on the group key and hands each
group to Python as one DataFrame — the shape for per-entity
regressions, per-group sklearn fits, or any model that can't be
expressed as a running aggregate.

Scale notes (100 TB): one shuffle on the group key; each group must fit
in one executor's memory (fine for per-user/per-device panels, wrong
for whale groups — pre-aggregate or sample those). The OLS below has a
closed form, so at pure-SQL scale you'd use regr_slope-style built-in
aggregates; it exists here to pin the applyInPandas plumbing with an
exactly-verifiable computation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

TREND_SCHEMA = "user_id long, n long, slope_per_day double, intercept double"


def per_user_trend(events: DataFrame, min_points: int = 2) -> DataFrame:
    """Per-user OLS trend of ``value`` over time via grouped-map Arrow.

    x = whole days since the user's first event, computed from
    INTEGER-truncated epoch seconds so the time base is bit-identical
    across engines (fractional-second doubles round differently).
    Closed-form normal equations, term order fixed to match the SQL
    oracle: slope = (Σxy − ΣxΣy/n) / (Σx² − (Σx)²/n).
    Groups with fewer than ``min_points`` events or zero x-variance
    (all events in one second) are dropped.
    """

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        sec = (pdf["ts"].astype("int64") // 10**9).to_numpy()
        x = (sec - sec.min()) / 86400.0
        y = pdf["value"].to_numpy(dtype="float64")
        n = len(pdf)
        sxx = float(np.sum(x * x)) - float(np.sum(x)) ** 2 / n
        if n < min_points or sxx == 0.0:
            return pd.DataFrame(columns=["user_id", "n", "slope_per_day", "intercept"])
        sxy = float(np.sum(x * y)) - float(np.sum(x)) * float(np.sum(y)) / n
        slope = sxy / sxx
        intercept = float(np.sum(y)) / n - slope * float(np.sum(x)) / n
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n": [n],
                "slope_per_day": [slope],
                "intercept": [intercept],
            }
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(fit, TREND_SCHEMA)
        .select(
            "user_id",
            "n",
            # + 0.0 normalizes IEEE negative zero: with a constant y the
            # slope numerator is an order-of-summation epsilon that can
            # round to -0.0 in one engine and +0.0 in the other
            # (zero-variance fuzz find, round 9); -0.0 + 0.0 == +0.0,
            # every other value is unchanged. The oracle mirrors it.
            (F.round("slope_per_day", 4) + F.lit(0.0)).alias("slope_per_day"),
            (F.round("intercept", 4) + F.lit(0.0)).alias("intercept"),
        )
    )
