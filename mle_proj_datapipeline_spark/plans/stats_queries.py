"""Statistical analytics: robust MAD outliers, seasonality, target encoding, Markov transitions, RANGE frames, survival curves, CUPED experiment metrics.

Split from the round-5 analytics module so the per-file freshness
clock tracks one family (the VERDICT r4 item-2 discipline): an edit
here stales only this family's driver rows.

Float parity follows the registry convention (rounding at fixed grids,
integer-exact arithmetic wherever midpoints can land on rounding
boundaries); determinism via total-order tiebreaks and the H31
cross-engine hash."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mle_proj_datapipeline_spark.plans.llm_common import _h31  # noqa: F401
from mle_proj_datapipeline_spark.plans.registry import register
from mle_proj_datapipeline_spark.sources.catalog import load_table


# --------------------------------------------------------------------------
# D9/I3 extension: median/MAD robust outlier profile per nation
# --------------------------------------------------------------------------
@register(
    "mad_outlier_stats",
    oracle="""
    WITH c AS (
        SELECT n_name, CAST(round(c_acctbal * 100) AS BIGINT) AS cb
        FROM customer JOIN nation ON c_nationkey = n_nationkey),
    m AS (SELECT n_name, median(cb) AS med FROM c GROUP BY 1),
    d AS (
        SELECT c.n_name, med, abs(cb - med) AS dev
        FROM c JOIN m USING (n_name)),
    s AS (SELECT n_name, max(med) AS med, median(dev) AS mad FROM d GROUP BY 1)
    SELECT d.n_name,
           round(max(d.med) / 100, 4) AS med,
           round(max(s.mad) / 100, 4) AS mad,
           count(*) AS n,
           CAST(sum(CASE WHEN s.mad > 0 AND 0.6745 * d.dev > 3.5 * s.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM d JOIN s USING (n_name)
    GROUP BY d.n_name
    """,
)
def mad_outlier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier profile: median + MAD + count of
    modified-z outliers (Iglewicz–Hoaglin: |0.6745·(x−med)/MAD| > 3.5).
    The heavy-tail-safe alternative to ``zscore_acctbal_by_nation`` —
    mean/stddev are themselves dragged by the outliers being hunted;
    median/MAD have a 50% breakdown point.

    Plan shape: ONE scan of customer, ONE hash exchange on n_name —
    both medians come from window aggregates over the same partitioning
    (dev's median is a second Window op on the already-exchanged data),
    then a partial-aggregated groupBy on the same key. The nation dim
    is broadcast. At 100 TB swap the exact window median for
    approx_percentile(0.5) (sketch path) without changing shape.

    Cross-engine float parity: medians are computed over integer CENTS
    so every even-count midpoint (x.5) is exact in double — interpolated
    medians of 2-decimal money land exactly on half-cents, where the two
    engines' interpolation formulas otherwise differ by 1 ulp and flip
    the rounded output."""
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cb")
    )
    w = Window.partitionBy("n_name")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("med", F.expr("median(cb)").over(w))
        .withColumn("dev", F.abs(F.col("cb") - F.col("med")))
        .withColumn("mad", F.expr("median(dev)").over(w))
        .groupBy("n_name")
        .agg(
            F.round(F.max("med") / 100, 4).alias("med"),
            F.round(F.max("mad") / 100, 4).alias("mad"),
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    (F.col("mad") > 0)
                    & (0.6745 * F.col("dev") > 3.5 * F.col("mad")),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )


# --------------------------------------------------------------------------
# I2/D9 extension: day-of-week seasonality index over events
# --------------------------------------------------------------------------
@register(
    "dow_seasonality",
    oracle="""
    WITH d AS (
        SELECT isodow(ts) AS isodow,
               count(*) AS n_events,
               sum(value) AS sv
        FROM events GROUP BY 1)
    SELECT isodow, n_events,
           round(sv / n_events, 4) AS avg_value,
           round((sv / n_events)
                 / (sum(sv) OVER () / sum(n_events) OVER ()), 4)
               AS seasonality_idx
    FROM d
    """,
)
def dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality: per-ISO-weekday mean event value and its
    ratio to the overall mean. Detects whether the pipeline's weekly
    cadence (reference cron ``0 6 * * 0``, dags/dag.py:77) matches the
    data's own weekly cycle, and is the standard de-seasonalization
    feature for calendar-aware drift monitoring.

    Plan shape: ONE scan aggregated to ≤7 rows (partial agg map-side),
    overall mean derived from the 7-row aggregate by an unpartitioned
    window — no second scan, no broadcast-join of a scalar."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.select((F.weekday("ts") + 1).alias("isodow"), "value")
        .groupBy("isodow")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sv"))
    )
    w = Window.partitionBy()
    avg = F.col("sv") / F.col("n_events")
    overall = F.sum("sv").over(w) / F.sum("n_events").over(w)
    return d.select(
        "isodow",
        "n_events",
        F.round(avg, 4).alias("avg_value"),
        F.round(avg / overall, 4).alias("seasonality_idx"),
    )
# --------------------------------------------------------------------------
# J-family extension: leave-one-out target encoding with smoothing
# --------------------------------------------------------------------------
_TE_PRIOR_M = 20  # smoothing pseudo-count


@register(
    "target_encode_priority",
    oracle=f"""
    WITH o AS (
        SELECT o_orderkey, o_orderpriority,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders WHERE o_orderpriority IS NOT NULL),
    g AS (
        SELECT o_orderkey, o_orderpriority, y,
               sum(y) OVER (PARTITION BY o_orderpriority) AS s,
               count(*) OVER (PARTITION BY o_orderpriority) AS n,
               sum(y) OVER () AS gs, count(*) OVER () AS gn
        FROM o)
    SELECT o_orderkey,
           CASE WHEN n > 1
                THEN round(CAST(s - y AS DOUBLE) / (n - 1), 6) END AS loo_te,
           round((CAST(s - y AS DOUBLE) + {_TE_PRIOR_M} * (CAST(gs AS DOUBLE) / gn))
                 / ((n - 1) + {_TE_PRIOR_M}), 6) AS loo_te_smooth
    FROM g
    """,
)
def target_encode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of o_orderpriority against the
    fulfilled-order target — the leakage-safe categorical encoding for
    GBDT features (each row's own label is excluded from its category
    mean; a smoothed variant shrinks rare categories toward the global
    prior with m={m} pseudo-counts).

    Plan shape (scale-aware): a WINDOW over a 5-value category would
    concentrate every row into ≤5 partitions, and an unpartitioned
    window for the prior would concentrate them into ONE — so instead
    the category stats come from a partial-aggregated groupBy (tiny
    shuffle), the prior from an aggregate of that 5-row frame, and
    both attach back to the row stream as BROADCAST joins (map-side,
    no row shuffle at all). Two pruned scans of orders beat one
    single-partition sort at any scale. Exact-integer sums → the
    division is the same two doubles in both engines."""
    # NULL categories cannot be target-encoded (and a plain equi-join
    # would silently drop them while the oracle's window kept them —
    # NULL-fuzz find); they are excluded by contract, mirrored in the
    # oracle. Singleton categories have no leave-one-out mean (0/0 —
    # an ANSI crash): loo_te is NULL there, the smoothed form still
    # shrinks to the prior.
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isNotNull())
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        )
    )
    # r12 (guide §2.4): the prior used to be a separate aggregate of the
    # category-stats subtree — re-evaluating its scan + groupBy — and
    # attached via a second broadcast (cross) join. A whole-frame window
    # over the ≤5-row stats frame carries the prior on the SAME broadcast
    # row instead: orders is scanned twice (stats + row stream), not
    # three times, and one join disappears.
    g = o.groupBy("o_orderpriority").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).alias("n")
    )
    wall = Window.partitionBy()  # ≤5-row category frame, never data-sized
    g = g.withColumn(
        "prior", F.sum("s").over(wall).cast("double") / F.sum("n").over(wall)
    )
    loo = F.when(
        F.col("n") > 1,
        (F.col("s") - F.col("y")).cast("double") / (F.col("n") - 1),
    )
    smooth = (
        (F.col("s") - F.col("y")).cast("double") + _TE_PRIOR_M * F.col("prior")
    ) / ((F.col("n") - 1) + _TE_PRIOR_M)
    return (
        o.join(F.broadcast(g), "o_orderpriority")
        .select(
            "o_orderkey",
            F.round(loo, 6).alias("loo_te"),
            F.round(smooth, 6).alias("loo_te_smooth"),
        )
    )


# --------------------------------------------------------------------------
# Sequence analytics: first-order Markov transition matrix of event types
# --------------------------------------------------------------------------
@register(
    "event_transition_matrix",
    oracle="""
    WITH s AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events),
    t AS (
        SELECT prev, event_type AS next, count(*) AS c
        FROM s WHERE prev IS NOT NULL GROUP BY 1, 2)
    SELECT prev, next, c,
           round(CAST(c AS DOUBLE) / sum(c) OVER (PARTITION BY prev), 4) AS p
    FROM t
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next | prev) with counts — the behavioral-sequence
    summary behind session modeling and anomaly scoring.

    Plan shape: one shuffle on user_id for the lag window (total order
    (ts, event_id) makes equal-timestamp sequences deterministic in
    both engines), then a partial-aggregated groupBy on the (prev,next)
    pair — |event_types|² rows — and a tiny window for row-normalized
    probabilities. No self-join of events with events (the naive
    sequential-pair join)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    t = (
        s.groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wp = Window.partitionBy("prev")
    return t.select(
        "prev", "next", "c",
        F.round(F.col("c").cast("double") / F.sum("c").over(wp), 4).alias("p"),
    )


# --------------------------------------------------------------------------
# F2 extension: time-based RANGE window frame (interval preceding)
# --------------------------------------------------------------------------
@register(
    "orders_range_frame_avg",
    oracle="""
    WITH o AS (
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders)
    SELECT o_custkey, o_orderkey,
           CAST(count(*) OVER w AS BIGINT) AS n_in_window,
           round(CAST(sum(cents) OVER w AS DOUBLE)
                 / count(*) OVER w / 100, 4) AS avg_30d
    FROM o
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
    """,
)
def orders_range_frame_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day average order value per customer — a TIME-based
    RANGE frame (all orders whose date falls in [current−30d, current]),
    the event-time sibling of the row-count frame in
    ``rolling_order_avg``. RANGE frames are set-based: equal order
    dates share one frame, so the result is deterministic without a
    tiebreak, unlike ROWS frames over ties.

    One shuffle on o_custkey, one in-partition sort by date serves the
    frame. Money averaged in integer CENTS (exact window sums; the
    division is the same two doubles in both engines)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    win = (
        "PARTITION BY o_custkey ORDER BY o_orderdate "
        "RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW"
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.expr(f"count(*) OVER ({win})").cast("bigint").alias("n_in_window"),
        F.round(
            F.expr(f"CAST(sum(cents) OVER ({win}) AS DOUBLE)")
            / F.expr(f"count(*) OVER ({win})")
            / 100,
            4,
        ).alias("avg_30d"),
    )
# --------------------------------------------------------------------------
# Experimentation: CUPED variance-reduced A/B metrics
# --------------------------------------------------------------------------
_CUPED_SPLIT = "2024-01-16"


@register(
    "cuped_adjusted_metrics",
    oracle=f"""
    WITH u AS (
        SELECT user_id,
               sum(CASE WHEN ts <  TIMESTAMP '{_CUPED_SPLIT}' THEN value ELSE 0 END) AS x,
               sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}' THEN value ELSE 0 END) AS y,
               {_h31('CAST(user_id AS VARCHAR)')} % 2 AS grp
        FROM events GROUP BY user_id),
    m AS (
        SELECT count(*) AS n,
               sum(x) / count(*) AS mx, sum(y) / count(*) AS my,
               sum(x * y) / count(*) - (sum(x) / count(*)) * (sum(y) / count(*)) AS cxy,
               sum(x * x) / count(*) - (sum(x) / count(*)) ** 2 AS vx
        FROM u),
    adj AS (
        SELECT u.grp, u.y, u.y - (m.cxy / m.vx) * (u.x - m.mx) AS ya FROM u CROSS JOIN m)
    SELECT grp,
           CAST(count(*) AS BIGINT) AS n_users,
           round(sum(y) / count(*), 4) AS mean_y,
           round(sum(ya) / count(*), 4) AS mean_y_cuped,
           round(sum(y * y) / count(*) - (sum(y) / count(*)) ** 2, 2) AS var_y,
           round(sum(ya * ya) / count(*) - (sum(ya) / count(*)) ** 2, 2) AS var_y_cuped
    FROM adj GROUP BY grp
    """,
)
def cuped_adjusted_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for A/B metrics: per-user pre-period
    value (x, before {split}) de-noises the experiment-period metric
    (y) via ŷ = y − θ(x − x̄), θ = cov(x,y)/var(x) — the standard
    experimentation-platform trick that shrinks metric variance
    without biasing the mean. Groups come from the deterministic H31
    user hash (the engine's reproducible randomization).

    ONE scan: pre/post sums are conditional aggregates of the same
    groupBy(user); θ and x̄ are a broadcast 1-row moment frame; all
    variances use explicit moment algebra so both engines run the same
    arithmetic. Output is 2 rows — variance columns visibly shrink
    under CUPED while means are preserved."""
    from mle_proj_datapipeline_spark.operators.hashing import h31

    ev = load_table(spark, sf_dir, "events")
    split = F.lit(_CUPED_SPLIT).cast("timestamp_ntz")
    # r12 (guide §2.4): the per-user frame feeds both the moment
    # aggregate and the adjusted-metric pass — uncut, the events scan +
    # groupBy ran twice. Cut once at the |users|-sized frame.
    from mle_proj_datapipeline_spark.sources.snapshots import materialize_frame

    u = materialize_frame(
        ev.groupBy("user_id").agg(
            F.sum(F.when(F.col("ts") < split, F.col("value")).otherwise(0.0)).alias("x"),
            F.sum(F.when(F.col("ts") >= split, F.col("value")).otherwise(0.0)).alias("y"),
        ).withColumn("grp", h31(F.col("user_id").cast("string")) % 2)
    )
    cnt = F.count(F.lit(1))
    m = u.agg(
        cnt.alias("n"),
        (F.sum("x") / cnt).alias("mx"),
        (F.sum(F.col("x") * F.col("y")) / cnt
         - (F.sum("x") / cnt) * (F.sum("y") / cnt)).alias("cxy"),
        (F.sum(F.col("x") * F.col("x")) / cnt
         - (F.sum("x") / cnt) * (F.sum("x") / cnt)).alias("vx"),
    )
    # try_divide: a single-user frame has var(x) = 0, so θ is 0/0 — the
    # oracle's x/0 is NULL (ŷ degrades to NULL, the declared answer when
    # CUPED is undefined), and ANSI `/` must not crash (singleton-fact
    # fuzz find, round 8).
    adj = u.crossJoin(F.broadcast(m)).select(
        "grp",
        "y",
        (F.col("y") - F.try_divide(F.col("cxy"), F.col("vx")) * (F.col("x") - F.col("mx"))).alias("ya"),
    )
    c = F.count(F.lit(1))
    return adj.groupBy("grp").agg(
        c.cast("bigint").alias("n_users"),
        F.round(F.sum("y") / c, 4).alias("mean_y"),
        F.round(F.sum("ya") / c, 4).alias("mean_y_cuped"),
        F.round(
            F.sum(F.col("y") * F.col("y")) / c - (F.sum("y") / c) * (F.sum("y") / c), 2
        ).alias("var_y"),
        F.round(
            F.sum(F.col("ya") * F.col("ya")) / c - (F.sum("ya") / c) * (F.sum("ya") / c),
            2,
        ).alias("var_y_cuped"),
    )


# --------------------------------------------------------------------------
# Survival analysis: Kaplan–Meier time-to-reorder with censoring
# --------------------------------------------------------------------------
_KM_HORIZON = "1998-08-02"  # TPC-H dataset end date: censoring horizon


@register(
    "km_reorder_survival",
    oracle=f"""
    WITH seq AS (
        SELECT o_custkey, o_orderdate,
               lead(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS nxt
        FROM orders),
    obs AS (
        SELECT CASE WHEN nxt IS NULL
                    THEN date_diff('day', o_orderdate, DATE '{_KM_HORIZON}')
                    ELSE date_diff('day', o_orderdate, nxt) END AS t,
               CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS ev
        FROM seq),
    grp AS (
        SELECT t, CAST(sum(ev) AS BIGINT) AS d,
               CAST(count(*) - sum(ev) AS BIGINT) AS c
        FROM obs GROUP BY t),
    risk AS (
        SELECT t, d, c,
               CAST((SELECT count(*) FROM obs) AS BIGINT)
                 - CAST(coalesce(sum(d + c) OVER (
                       ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS n_at_risk
        FROM grp),
    km AS (
        SELECT t, d, c, n_at_risk,
               exp(sum(ln(greatest(1 - CAST(d AS DOUBLE) / n_at_risk, 1e-12)))
                   OVER (ORDER BY t)) AS s
        FROM risk)
    SELECT t AS gap_days, d AS n_events, c AS n_censored, n_at_risk,
           round(s, 4) + 0 AS survival
    FROM km WHERE d > 0
    """,
)
def km_reorder_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier estimator of time-to-reorder: for every customer,
    each inter-order gap is an EVENT and the tail after the last order
    is CENSORED at the dataset horizon — the survival-analysis form of
    churn/retention modeling (naive mean-gap stats are biased because
    they silently drop the still-alive tails; KM is the standard
    unbiased treatment of censoring).

    Plan shape: one customer-keyed window (lead) builds observations,
    then EVERYTHING downstream lives on the |distinct gaps|-sized
    frame: at-risk counts and the survival curve are cumulative
    windows over that small ordered spine, never over raw rows. The
    cumulative product is exp∘Σln with the terminal factor clamped at
    1e-12 (the last risk set can fail entirely → factor 0; survival
    rounds to exactly 0 from there either way) — both engines fold the
    same ordered spine, so parity holds at 4dp."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_orderdate", F.lead("o_orderdate").over(w).alias("nxt")
    )
    horizon = F.lit(_KM_HORIZON).cast("date")
    obs = seq.select(
        F.when(
            F.col("nxt").isNull(), F.datediff(horizon, F.col("o_orderdate"))
        )
        .otherwise(F.datediff(F.col("nxt"), F.col("o_orderdate")))
        .alias("t"),
        F.when(F.col("nxt").isNull(), 0).otherwise(1).alias("ev"),
    )
    grp = obs.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        (F.count(F.lit(1)) - F.sum("ev")).cast("bigint").alias("c"),
    )
    # r12 (guide §2.4): n_total used to be a separate aggregate of the
    # gap spine, re-evaluating the orders scan + lead-window + groupBy a
    # second time, attached by a broadcast cross-join. A whole-frame
    # window sum shares the curve's single sort over the tiny spine.
    wt = Window.orderBy("t")
    prior = F.coalesce(
        F.sum(F.col("d") + F.col("c")).over(
            wt.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    n_total = F.sum(F.col("d") + F.col("c")).over(
        wt.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    risk = grp.withColumn("n_at_risk", (n_total - prior).cast("bigint"))
    km = risk.withColumn(
        "s",
        F.exp(
            F.sum(
                F.log(
                    F.greatest(
                        1 - F.col("d").cast("double") / F.col("n_at_risk"),
                        F.lit(1e-12),
                    )
                )
            ).over(wt)
        ),
    )
    return km.filter(F.col("d") > 0).select(
        F.col("t").cast("bigint").alias("gap_days"),
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        "n_at_risk",
        (F.round("s", 4) + F.lit(0.0)).alias("survival"),
    )


# --------------------------------------------------------------------------
# Forecasting: Holt's linear trend over the weekly revenue series
# --------------------------------------------------------------------------
_HOLT_ALPHA = 0.3
_HOLT_BETA = 0.1


@register(
    "holt_weekly_forecast",
    oracle=f"""
    WITH wkly AS (
        SELECT strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS wk,
               round(sum(o_totalprice), 2) AS y
        FROM orders GROUP BY 1),
    idx AS (
        SELECT wk, y, row_number() OVER (ORDER BY wk) AS i FROM wkly),
    n AS (SELECT max(i) AS n FROM idx),
    rec AS (
        WITH RECURSIVE h(i, l, b, fitted) AS (
            SELECT 1, a.y,
                   (SELECT y FROM idx WHERE i = 2) - a.y,
                   CAST(NULL AS DOUBLE)
            FROM idx a WHERE a.i = 1
            UNION ALL
            SELECT idx.i,
                   {_HOLT_ALPHA} * idx.y + (1 - {_HOLT_ALPHA}) * (h.l + h.b),
                   {_HOLT_BETA} * (({_HOLT_ALPHA} * idx.y
                       + (1 - {_HOLT_ALPHA}) * (h.l + h.b)) - h.l)
                       + (1 - {_HOLT_BETA}) * h.b,
                   h.l + h.b
            FROM h JOIN idx ON idx.i = h.i + 1)
        SELECT * FROM h)
    SELECT idx.wk, idx.y,
           round(rec.fitted, 2) AS fitted,
           round(rec.l, 2) AS level,
           round(rec.b, 2) AS trend
    FROM rec JOIN idx USING (i) WHERE rec.fitted IS NOT NULL
    """,
)
def holt_weekly_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing over weekly revenue —
    REAL forecasting beside the Q6-style ``forecast_revenue`` scan:
    level/trend recursions l_t = αy_t+(1−α)(l+b), b_t = β(l_t−l)+(1−β)b
    with the standard init (l₁=y₁, b₁=y₂−y₁), reporting each week's
    one-step-ahead fitted value l+b.

    Plan shape: the heavy work is the distributed weekly aggregation;
    the recursion then runs as ONE deterministic in-order fold
    (aggregate HOF with a struct accumulator carrying level, trend,
    and the fitted array) over the |weeks|-sized sorted series — the
    customer_value_ewma discipline extended to coupled two-state
    recursions. The oracle is a recursive CTE running the identical
    arithmetic; weekly y is rounded to cents BEFORE the recursion so
    both engines fold the same inputs."""
    o = load_table(spark, sf_dir, "orders")
    wk = F.date_format(F.date_trunc("week", F.col("o_orderdate")), "yyyy-MM-dd")
    wkly = (
        o.groupBy(wk.alias("wk"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("y"))
    )
    # The global agg emits its one row even over EMPTY orders (s=[]),
    # and Holt needs two points for the (l₁, b₁) init — shorter series
    # have no fitted values, exactly the rows the oracle's
    # `fitted IS NOT NULL` drops (empty-table fuzz find, round 7: the
    # unguarded slice(s, 2, size-1) is a length<0 ANSI crash at size 0
    # and an out-of-bounds s[1] at size 1).
    series = wkly.agg(
        F.sort_array(F.collect_list(F.struct("wk", "y"))).alias("s")
    ).filter(F.size("s") >= 2)
    a, b = _HOLT_ALPHA, _HOLT_BETA
    new_l = f"{a}D * x.y + {1 - a}D * (acc.l + acc.b)"
    init = (
        "named_struct("
        "'l', CAST(s[0].y AS DOUBLE), "
        "'b', CAST(s[1].y - s[0].y AS DOUBLE), "
        "'steps', CAST(array() AS ARRAY<STRUCT<f: DOUBLE, l: DOUBLE, b: DOUBLE>>))"
    )
    step = (
        f"(acc, x) -> named_struct("
        f"'l', {new_l}, "
        f"'b', {b}D * (({new_l}) - acc.l) + {1 - b}D * acc.b, "
        f"'steps', array_append(acc.steps, named_struct("
        f"'f', acc.l + acc.b, "
        f"'l', {new_l}, "
        f"'b', {b}D * (({new_l}) - acc.l) + {1 - b}D * acc.b)))"
    )
    folded = series.select(
        F.col("s"),
        F.expr(f"aggregate(slice(s, 2, size(s) - 1), {init}, {step}).steps").alias(
            "steps"
        ),
    )
    return folded.select(
        F.posexplode(
            F.expr("zip_with(slice(s, 2, size(s) - 1), steps, (r, st) -> struct(r.wk AS wk, r.y AS y, st.f AS f, st.l AS l, st.b AS b))")
        ).alias("j", "z")
    ).select(
        F.col("z.wk").alias("wk"),
        F.col("z.y").alias("y"),
        F.round("z.f", 2).alias("fitted"),
        F.round("z.l", 2).alias("level"),
        F.round("z.b", 2).alias("trend"),
        # A NULL weekly y poisons the recursion from that week on (NULL
        # level/trend → NULL fitted); the declared semantic is the
        # oracle's `WHERE fitted IS NOT NULL` — a week with no fitted
        # value has no row (all-NULL-measure fuzz find, round 8). No-op
        # for gap-free series.
    ).where(F.col("fitted").isNotNull())
