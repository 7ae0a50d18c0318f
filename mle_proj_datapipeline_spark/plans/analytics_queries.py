"""Round-5 analytics extensions: robust statistics, PPS sampling, and
calendar seasonality.

Families added here (each a first-class §2-style operator with a DuckDB
oracle):

- **Poisson PPS sampling with Horvitz–Thompson weights** — the
  production form of weighted sampling (probability proportional to
  size) for building training mixes from heavy-tailed corpora. The
  reference samples uniformly via ``df.sample`` (utils/
  model_operations.py:79-85); PPS + HT-weighting is the
  survey-statistics upgrade that keeps totals unbiased. Inclusion is
  decided by pure integer hash arithmetic (H31 mod 1e6 vs an integer
  per-row threshold), so the sample is reproducible across runs,
  engines, and cluster sizes — no RNG, no partition dependence.
- **Deterministic fixed-size uniform sample** — ORDER BY content hash
  LIMIT k. Spark executes this as TakeOrderedAndProject (per-partition
  top-k, then a k-row merge on the driver) — no global sort at 100 TB.
- **Robust outlier detection (median/MAD)** — the heavy-tail-safe
  sibling of ``zscore_acctbal_by_nation``. Mean/stddev break under the
  very outliers they are meant to find; median absolute deviation does
  not (Iglewicz–Hoaglin modified z-score, |0.6745·dev/MAD| > 3.5).
- **Day-of-week seasonality index** — calendar-profile drift feature
  (reference runs its whole pipeline on a weekly cron, dags/dag.py:77;
  the seasonality index is the natural data-level check that weekly
  cadence matches the data's own weekly cycle).
- **Graph centrality (PageRank)** — operators/graph.py power iteration
  over a co-purchase edge list; link-graph importance as a
  source-quality prior.
- **Distributed linear algebra** — covariance matrix by nested
  posexplode + partial aggregation; top principal direction by power
  iteration over the covariance DataFrame (PCA without MLlib or
  driver linear algebra).
- **Leave-one-out target encoding** — leakage-safe categorical
  feature with m-smoothing toward the global prior.
- **Markov transition matrix** — per-user event-sequence bigram
  probabilities via one lag window + pair-count aggregation.

Float parity: every float output is rounded on both sides per the
registry convention (money 2dp, ratios 4dp)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mle_proj_datapipeline_spark.plans.llm_common import _h31
from mle_proj_datapipeline_spark.plans.registry import register
from mle_proj_datapipeline_spark.sources.catalog import load_table

# --------------------------------------------------------------------------
# Graph centrality: PageRank over the supplier co-occurrence graph
# --------------------------------------------------------------------------
_PR_ITERS = 5
_PR_DAMPING = 0.85


def _pagerank_oracle() -> str:
    """Unrolled power iteration as chained CTEs — the oracle runs the
    exact recurrence the Spark operator runs (teleport 0.15/n, damping
    0.85, symmetric co-occurrence edges, |V| = non-isolated nodes)."""
    stages = []
    for k in range(1, _PR_ITERS + 1):
        stages.append(f"""
    c{k} AS (
        SELECT e.dst AS node, sum(p.r / deg.deg) AS m
        FROM e JOIN r{k - 1} p ON e.src = p.node JOIN deg ON deg.src = e.src
        GROUP BY e.dst),
    r{k} AS (
        SELECT v.node, 0.15 / nn.n + 0.85 * coalesce(c{k}.m, 0) AS r
        FROM v CROSS JOIN nn LEFT JOIN c{k} ON c{k}.node = v.node)""")
    return f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e AS (
        SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey),
    deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
    v AS (SELECT DISTINCT src AS node FROM e),
    nn AS (SELECT count(*) AS n FROM v),
    r0 AS (SELECT node, 1.0 / nn.n AS r FROM v CROSS JOIN nn),
    {",".join(stages)}
    SELECT node AS s_suppkey, round(r, 6) AS pr FROM r{_PR_ITERS}
    """


@register("supplier_pagerank", oracle=_pagerank_oracle())
def supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the supplier co-purchase graph (suppliers are
    linked when they fulfil lines of the same order) — link-graph
    importance as a corpus/source-quality prior, the graph-centrality
    sibling of ``neardup_clusters``'s connected components.

    Edge build: ONE groupBy(order) → collect_set(supplier), then the
    per-order pair fan-out happens IN-ROW (nested transform + explode,
    bounded by suppliers-per-order²) — one shuffle to per-order sets
    replaces the self-join's dedup + join + dedup chain (measured ~30%
    cheaper, identical edge set). Never all-pairs across orders.
    Iteration: see operators/graph.pagerank (one shuffle per round,
    partial aggregation, checkpointed lineage).

    Float parity: teleport is 1-0.85 computed in binary vs the
    oracle's 0.15 decimal literal — ≤1 ulp apart, invisible at the
    6dp output rounding."""
    from mle_proj_datapipeline_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    sets = li.groupBy("l_orderkey").agg(F.collect_set("l_suppkey").alias("ss"))
    edges = sets.select(
        F.explode(
            F.expr(
                "flatten(transform(ss, x -> "
                "transform(filter(ss, y -> y != x), "
                "y -> struct(x AS src, y AS dst))))"
            )
        ).alias("p")
    ).select("p.src", "p.dst")
    ranks = pagerank(edges, iterations=_PR_ITERS, damping=_PR_DAMPING)
    return ranks.select(
        F.col("node").alias("s_suppkey"), F.round("r", 6).alias("pr")
    )

# --------------------------------------------------------------------------
# J4 extension: Poisson PPS sample + Horvitz–Thompson weights
# --------------------------------------------------------------------------
_PPS_MOD = 1_000_000


@register(
    "pps_orders_sample",
    oracle=f"""
    SELECT o_orderkey,
           round(o_totalprice, 2) AS o_totalprice,
           round({_PPS_MOD}.0 / CAST(floor(o_totalprice) AS BIGINT), 4) AS ht_weight
    FROM orders
    WHERE {_h31('CAST(o_orderkey AS VARCHAR)')} % {_PPS_MOD}
          < CAST(floor(o_totalprice) AS BIGINT)
    """,
)
def pps_orders_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size Bernoulli (Poisson) sample of
    orders: row i is kept iff H31(key) mod 1e6 < floor(weight_i), i.e.
    with inclusion probability p_i = floor(w_i)/1e6, and carries its
    Horvitz–Thompson weight 1/p_i so any downstream SUM(x·ht_weight)
    is an unbiased estimate of the population total.

    All-integer inclusion arithmetic — bit-identical across engines and
    cluster layouts, unlike ``df.sample(seed=)`` (partition-dependent,
    reference utils/model_operations.py:79-85). Map-only: no shuffle,
    filter evaluated at the scan."""
    from mle_proj_datapipeline_spark.operators.dedup import h31

    o = load_table(spark, sf_dir, "orders")
    w_int = F.floor(F.col("o_totalprice")).cast("bigint")
    keep = h31(F.col("o_orderkey").cast("string")) % _PPS_MOD < w_int
    return o.filter(keep).select(
        "o_orderkey",
        F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
        F.round(F.lit(float(_PPS_MOD)) / w_int, 4).alias("ht_weight"),
    )


# --------------------------------------------------------------------------
# J4 extension: fixed-size uniform sample as TakeOrdered (no global sort)
# --------------------------------------------------------------------------
@register(
    "uniform_k_sample",
    oracle=f"""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    ORDER BY {_h31('CAST(o_orderkey AS VARCHAR)')}, o_orderkey
    LIMIT 500
    """,
)
def uniform_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k uniform sample: order by content hash, take k. A
    fixed-SIZE complement to the fixed-RATE ``orders_hash_sample`` —
    reservoir-sampling semantics without RNG state. Spark plans
    ORDER BY+LIMIT as TakeOrderedAndProject: each partition keeps its
    local top-500 by hash, the driver merges 500·P candidate rows —
    no global sort, no full shuffle, scale-safe at any corpus size."""
    from mle_proj_datapipeline_spark.operators.dedup import h31

    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderpriority")
        .orderBy(h31(F.col("o_orderkey").cast("string")), F.col("o_orderkey"))
        .limit(500)
    )


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
# Distributed linear algebra: covariance matrix + PCA power iteration
# --------------------------------------------------------------------------
_EMB_D = 64
_POWER_ITERS = 8

_COV_CTE = f"""
    x AS (
        SELECT list_transform(embedding, v -> CAST(v AS DOUBLE)) AS ed
        FROM embeddings),
    cells AS (
        SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
               avg(ed[i + 1] * ed[j + 1]) AS exy,
               avg(ed[i + 1]) AS ex, avg(ed[j + 1]) AS ey
        FROM x
        CROSS JOIN range(0, {_EMB_D}) t1(i) CROSS JOIN range(0, {_EMB_D}) t2(j)
        GROUP BY 1, 2),
    cov AS (SELECT i, j, exy - ex * ey AS c FROM cells)"""


@register(
    "embedding_covariance",
    oracle=f"""
    WITH {_COV_CTE}
    SELECT i, j, round(c, 6) + 0 AS cov FROM cov WHERE i <= j
    """,
)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance matrix of the embedding columns — the
    E[xy] − E[x]E[y] moment aggregation that PCA whitening, Mahalanobis
    scoring, and feature-decorrelation all start from.

    Plan shape: ONE scan; each row fans out to d² (i,j,xi,xj) cells via
    two nested posexplodes (JVM-side, no UDF, no join), and partial
    aggregation collapses them to d² running moments per partition
    BEFORE the shuffle — shuffle volume is #partitions · d², independent
    of row count. For d in the thousands swap the explode for a
    per-partition NumPy Gram accumulation over mapInPandas (the Arrow
    path); at d=64 the JVM explode wins."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "xi"),
        F.col("embedding").cast("array<double>").alias("e"),
    )
    pairs = x.select("i", "xi", F.posexplode("e").alias("j", "xj")).filter(
        F.col("i") <= F.col("j")
    )
    return (
        pairs.groupBy("i", "j")
        .agg(
            F.avg(F.col("xi") * F.col("xj")).alias("exy"),
            F.avg("xi").alias("ex"),
            F.avg("xj").alias("ey"),
        )
        .select(
            "i", "j",
            (F.round(F.col("exy") - F.col("ex") * F.col("ey"), 6) + F.lit(0.0)).alias("cov"),
        )
    )


def _power_iteration_oracle() -> str:
    """Unrolled power iteration v ← C·v / ‖C·v‖ as chained CTEs, from
    the exact uniform start vector 1/8 (= 1/√64, exact in binary)."""
    stages = []
    for k in range(1, _POWER_ITERS + 1):
        stages.append(f"""
    u{k} AS (
        SELECT cov.i AS j, sum(cov.c * v{k - 1}.v) AS u
        FROM cov JOIN v{k - 1} ON cov.j = v{k - 1}.j
        GROUP BY cov.i),
    n{k} AS (SELECT sqrt(sum(u * u)) AS nrm FROM u{k}),
    v{k} AS (SELECT j, u / nrm AS v FROM u{k} CROSS JOIN n{k})""")
    return f"""
    WITH {_COV_CTE},
    v0 AS (SELECT CAST(j AS INTEGER) AS j, 0.125 AS v FROM range(0, {_EMB_D}) t(j)),
    {",".join(stages)},
    ray AS (
        SELECT sum(v{_POWER_ITERS}.v * u) AS eigval
        FROM u{_POWER_ITERS} JOIN v{_POWER_ITERS} USING (j)
        CROSS JOIN n{_POWER_ITERS})
    SELECT j AS dim, round(v, 5) + 0 AS loading, round(eigval, 6) + 0 AS eigval
    FROM v{_POWER_ITERS} CROSS JOIN ray
    """


@register("embedding_pca_power", oracle=_power_iteration_oracle())
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding cloud by distributed
    power iteration: v ← C·v/‖C·v‖ over the d² covariance DataFrame —
    PCA as pure joins + aggregations, no MLlib, no driver linear
    algebra. Returns (dim, loading, eigval) with the Rayleigh-quotient
    eigenvalue λ = vᵀCv (= ‖u‖ после normalize since v is unit).

    Scale design: the data-sized work is the ONE covariance pass
    (see embedding_covariance — shuffle is d² per partition); the
    iteration then runs on d²-row / d-row DataFrames (matvec = one
    equi-join + groupBy per round, lineage truncated per round). The
    deterministic uniform start (1/√d, exact in binary) and fixed
    iteration count make both engines run the identical recurrence —
    sign and value are reproducible, unlike RNG-seeded solvers."""
    from mle_proj_datapipeline_spark.operators.linalg import covariance, top_eigvec

    emb = load_table(spark, sf_dir, "embeddings")
    cov = covariance(emb, "embedding")
    return top_eigvec(cov, _EMB_D, iterations=_POWER_ITERS).select(
        F.col("j").alias("dim"),
        (F.round("v", 5) + F.lit(0.0)).alias("loading"),
        (F.round("eigval", 6) + F.lit(0.0)).alias("eigval"),
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
        FROM orders),
    g AS (
        SELECT o_orderkey, o_orderpriority, y,
               sum(y) OVER (PARTITION BY o_orderpriority) AS s,
               count(*) OVER (PARTITION BY o_orderpriority) AS n,
               sum(y) OVER () AS gs, count(*) OVER () AS gn
        FROM o)
    SELECT o_orderkey,
           round(CAST(s - y AS DOUBLE) / (n - 1), 6) AS loo_te,
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
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    g = o.groupBy("o_orderpriority").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).alias("n")
    )
    pri = g.agg(
        (F.sum("s").cast("double") / F.sum("n")).alias("prior")
    )
    loo = (F.col("s") - F.col("y")).cast("double") / (F.col("n") - 1)
    smooth = (
        (F.col("s") - F.col("y")).cast("double") + _TE_PRIOR_M * F.col("prior")
    ) / ((F.col("n") - 1) + _TE_PRIOR_M)
    return (
        o.join(F.broadcast(g), "o_orderpriority")
        .crossJoin(F.broadcast(pri))
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
# Model-serving prep: per-vector int8 quantization with error audit
# --------------------------------------------------------------------------
@register(
    "embedding_int8_quantize",
    oracle="""
    WITH x AS (
        SELECT vec_id,
               list_transform(embedding, v -> CAST(v AS DOUBLE)) AS ed
        FROM embeddings),
    s AS (
        SELECT vec_id, ed,
               list_reduce(list_transform(ed, v -> abs(v)),
                           (a, b) -> greatest(a, b)) / 127 AS scale
        FROM x),
    e AS (
        SELECT vec_id, scale,
               list_transform(ed, v -> abs(round(v / scale) * scale - v)) AS errs
        FROM s WHERE scale > 0)
    SELECT vec_id,
           round(scale, 8) AS scale,
           round(list_reduce(errs, (a, b) -> greatest(a, b)), 8) AS max_abs_err,
           round(list_reduce(errs, (a, b) -> a + b) / len(errs), 8) AS mean_abs_err
    FROM e
    """,
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization audit — the compression
    step before shipping an embedding table to a serving store:
    scale = max|x|/127, q = round(x/scale), and the reconstruction
    error |q·scale − x| summarized per vector. Pure JVM higher-order
    functions over the array column — no explode, no shuffle at all
    (map-only); error folds run in array order so both engines sum
    identically (the customer_value_ewma determinism convention)."""
    emb = load_table(spark, sf_dir, "embeddings")
    ed = F.col("embedding").cast("array<double>")
    scale = (
        F.aggregate(
            F.transform(ed, lambda v: F.abs(v)),
            F.lit(0.0),
            lambda a, b: F.greatest(a, b),
        )
        / 127
    )
    errs = F.transform(
        F.col("ed"),
        lambda v: F.abs(F.round(v / F.col("scale")) * F.col("scale") - v),
    )
    return (
        emb.select("vec_id", ed.alias("ed"), scale.alias("scale"))
        .filter(F.col("scale") > 0)
        .withColumn("errs", errs.cast("array<double>"))
        .select(
            "vec_id",
            F.round("scale", 8).alias("scale"),
            F.round(
                F.aggregate(
                    F.col("errs"), F.lit(0.0), lambda a, b: F.greatest(a, b)
                ),
                8,
            ).alias("max_abs_err"),
            F.round(
                F.aggregate(F.col("errs"), F.lit(0.0), lambda a, b: a + b)
                / F.size("errs"),
                8,
            ).alias("mean_abs_err"),
        )
    )


# --------------------------------------------------------------------------
# Featurization: the hashing trick (signed feature hashing)
# --------------------------------------------------------------------------
_FH_BUCKETS = 16


@register(
    "feature_hashing_doc_vectors",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
    h AS (
        SELECT doc_id,
               {_h31('term')} % {_FH_BUCKETS} AS bucket,
               CASE WHEN ({_h31('term')} // {_FH_BUCKETS}) % 2 = 0
                    THEN 1 ELSE -1 END AS sgn
        FROM tok)
    SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS val
    FROM h GROUP BY 1, 2
    """,
)
def feature_hashing_doc_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: fixed-width signed-hash featurization of
    documents — no vocabulary pass, no dictionary state, the
    featurizer every streaming/distributed text classifier starts
    with. bucket = H31(term) mod 16, sign = a second hash bit
    (unbiases collisions, Weinberger et al.); sparse (doc, bucket,
    value) triples out.

    Scale: explode + ONE partial-aggregated shuffle keyed by
    (doc, bucket) — no vocabulary join, unlike TF-IDF; width is a
    constant, so output is ≤ docs × buckets regardless of vocabulary
    growth. All-integer arithmetic, bit-identical cross-engine."""
    from mle_proj_datapipeline_spark.operators.dedup import h31

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    h = h31(F.col("term"))
    return (
        tok.select(
            "doc_id",
            (h % _FH_BUCKETS).alias("bucket"),
            F.when((F.floor(h / _FH_BUCKETS) % 2) == 0, 1).otherwise(-1).alias("sgn"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sgn").cast("bigint").alias("val"))
    )


# --------------------------------------------------------------------------
# Corpus-trained bigram LM quality scoring (the real ppl-proxy)
# --------------------------------------------------------------------------
@register(
    "bigram_lm_doc_scores",
    oracle="""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    uni AS (
        SELECT u.term, count(*) AS c1
        FROM (SELECT unnest(t) AS term FROM tok) u GROUP BY 1),
    v AS (SELECT count(*) AS vsz FROM uni),
    big AS (
        SELECT doc_id, u.z[1] AS w1, u.z[2] AS w2
        FROM (SELECT doc_id, unnest(list_zip(t, t[2:])) AS z FROM tok) u
        WHERE u.z[2] IS NOT NULL),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1, 2)
    SELECT big.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln((c2.c2 + 1.0) / (uni.c1 + v.vsz))), 4) AS avg_logprob
    FROM big
    JOIN c2 USING (w1, w2)
    JOIN uni ON uni.term = big.w1
    CROSS JOIN v
    GROUP BY big.doc_id
    """,
)
def bigram_lm_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language model scoring each document —
    the REAL form of the perplexity-proxy quality gate (CCNet/KenLM
    style): train add-one-smoothed bigram probabilities on the corpus
    itself, then score every doc by mean log P(w2|w1) =
    ln((c(w1,w2)+1)/(c(w1)+|V|)). Low scorers are the gibberish/
    boilerplate candidates.

    Scale: ONE explode for unigram counts, ONE in-row zip for bigrams
    (no positional self-join); the count tables are vocabulary-sized
    and broadcast back onto the bigram stream; |V| rides along as a
    broadcast scalar. Integer counts make the smoothed ratio the same
    two doubles in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.split("text", " ").alias("t"))
    uni = (
        tok.select(F.explode("t").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vsz = uni.agg(F.count(F.lit(1)).alias("vsz"))
    pairs = F.arrays_zip(
        F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
        F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
    )
    big = tok.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.0").alias("w1"), F.col("p.1").alias("w2")
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    return (
        big.join(F.broadcast(c2), ["w1", "w2"])
        .join(F.broadcast(uni.withColumnRenamed("term", "w1")), "w1")
        .crossJoin(F.broadcast(vsz))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(
                F.avg(F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("vsz")))), 4
            ).alias("avg_logprob"),
        )
    )


# --------------------------------------------------------------------------
# Embedding drift: per-dimension standardized mean difference by label
# --------------------------------------------------------------------------
@register(
    "embedding_dim_drift",
    oracle="""
    WITH x AS (
        SELECT label, CAST(i AS INTEGER) AS dim,
               CAST(embedding[i + 1] AS DOUBLE) AS v
        FROM embeddings CROSS JOIN range(0, 64) t(i)),
    g AS (
        SELECT label, dim, count(*) AS n,
               sum(v) / count(*) AS m,
               sum(v * v) / count(*) - (sum(v) / count(*)) ** 2 AS var
        FROM x GROUP BY 1, 2),
    a AS (
        SELECT dim,
               sum(n * m) / sum(n) AS gm,
               sum(n * (var + m * m)) / sum(n)
                   - (sum(n * m) / sum(n)) ** 2 AS gvar
        FROM g GROUP BY 1)
    SELECT g.label, g.dim,
           round(g.m, 6) AS mean_v,
           round(g.m - a.gm, 6) + 0 AS mean_shift,
           round((g.m - a.gm) / sqrt(a.gvar), 4) + 0 AS smd
    FROM g JOIN a USING (dim)
    """,
)
def embedding_dim_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension drift of each label's embedding distribution
    against the global: mean shift and standardized mean difference
    (SMD = (μ_label − μ_all)/σ_all) — the per-feature drift panel for
    embedding spaces, where PSI-style binning is impractical at d=64+.

    Variances come from explicit moment algebra (E[x²]−E[x]², and the
    global from the label-level moments via the law of total variance)
    rather than the engines' stddev kernels, so both sides compute the
    SAME arithmetic. One explode pass → (label×dim)-sized frames."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
    )
    g = x.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("v") / F.count(F.lit(1))).alias("m"),
        (
            F.sum(F.col("v") * F.col("v")) / F.count(F.lit(1))
            - (F.sum("v") / F.count(F.lit(1))) * (F.sum("v") / F.count(F.lit(1)))
        ).alias("var"),
    )
    a = g.groupBy("dim").agg(
        (F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("gm"),
        (
            F.sum(F.col("n") * (F.col("var") + F.col("m") * F.col("m"))) / F.sum("n")
            - (F.sum(F.col("n") * F.col("m")) / F.sum("n"))
            * (F.sum(F.col("n") * F.col("m")) / F.sum("n"))
        ).alias("gvar"),
    )
    return g.join(F.broadcast(a), "dim").select(
        "label",
        "dim",
        F.round("m", 6).alias("mean_v"),
        (F.round(F.col("m") - F.col("gm"), 6) + F.lit(0.0)).alias("mean_shift"),
        (
            F.round((F.col("m") - F.col("gm")) / F.sqrt("gvar"), 4) + F.lit(0.0)
        ).alias("smd"),
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
    from mle_proj_datapipeline_spark.operators.dedup import h31

    ev = load_table(spark, sf_dir, "events")
    split = F.lit(_CUPED_SPLIT).cast("timestamp_ntz")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, F.col("value")).otherwise(0.0)).alias("x"),
        F.sum(F.when(F.col("ts") >= split, F.col("value")).otherwise(0.0)).alias("y"),
    ).withColumn("grp", h31(F.col("user_id").cast("string")) % 2)
    cnt = F.count(F.lit(1))
    m = u.agg(
        cnt.alias("n"),
        (F.sum("x") / cnt).alias("mx"),
        (F.sum(F.col("x") * F.col("y")) / cnt
         - (F.sum("x") / cnt) * (F.sum("y") / cnt)).alias("cxy"),
        (F.sum(F.col("x") * F.col("x")) / cnt
         - (F.sum("x") / cnt) * (F.sum("x") / cnt)).alias("vx"),
    )
    adj = u.crossJoin(F.broadcast(m)).select(
        "grp",
        "y",
        (F.col("y") - (F.col("cxy") / F.col("vx")) * (F.col("x") - F.col("mx"))).alias("ya"),
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
    total = grp.agg(F.sum(F.col("d") + F.col("c")).alias("n_total"))
    wt = Window.orderBy("t")
    prior = F.coalesce(
        F.sum(F.col("d") + F.col("c")).over(
            wt.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    risk = grp.crossJoin(F.broadcast(total)).withColumn(
        "n_at_risk", (F.col("n_total") - prior).cast("bigint")
    )
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
# Association rules: part co-purchase support / confidence / lift
# --------------------------------------------------------------------------
@register(
    "part_association_rules",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
    item AS (SELECT l_partkey, count(*) AS ci FROM li GROUP BY 1),
    pair AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS cp
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
    scored AS (
        SELECT pa, pb, cp,
               round(CAST(cp AS DOUBLE) / n.n_orders, 6) AS support,
               round(CAST(cp AS DOUBLE) / ia.ci, 4) AS confidence,
               round(CAST(cp AS DOUBLE) * n.n_orders / (ia.ci * ib.ci), 4) AS lift
        FROM pair
        JOIN item ia ON ia.l_partkey = pair.pa
        JOIN item ib ON ib.l_partkey = pair.pb
        CROSS JOIN n
        WHERE cp >= 2)
    SELECT pa, pb, cp, support, confidence, lift
    FROM scored ORDER BY lift DESC, pa, pb LIMIT 20
    """,
)
def part_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over parts co-ordered in the
    same order: support, confidence P(b|a), and lift — the classic
    co-occurrence mining family (frequent-pair flavor, min support 2).

    Scale: pair generation is the bounded per-order fan-out (the
    pagerank edge build); item counts broadcast back onto the pair
    stream; final top-20 by (lift, pa, pb) is TakeOrderedAndProject.
    A min-support HAVING keeps the pair relation bounded long before
    ranking — the Apriori pruning step, expressed relationally."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates()
    )
    n = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    item = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("ci"))
    sets = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ss"))
    pair = (
        sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, x -> "
                    "transform(filter(ss, y -> y > x), "
                    "y -> struct(x AS pa, y AS pb))))"
                )
            ).alias("p")
        )
        .select("p.pa", "p.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("cp"))
        .filter(F.col("cp") >= 2)
    )
    ia = item.select(F.col("l_partkey").alias("pa"), F.col("ci").alias("cia"))
    ib = item.select(F.col("l_partkey").alias("pb"), F.col("ci").alias("cib"))
    return (
        pair.join(F.broadcast(ia), "pa")
        .join(F.broadcast(ib), "pb")
        .crossJoin(F.broadcast(n))
        .select(
            "pa", "pb", "cp",
            F.round(F.col("cp").cast("double") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("cp").cast("double") / F.col("cia"), 4).alias("confidence"),
            F.round(
                F.col("cp").cast("double") * F.col("n_orders")
                / (F.col("cia") * F.col("cib")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "pa", "pb")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Graph: triangle count on the supplier co-purchase graph
# --------------------------------------------------------------------------
@register(
    "supplier_triangles",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e AS (
        SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey),
    tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1 JOIN e e2 ON e2.u = e1.v
                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
    per_node AS (
        SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        FROM (SELECT a AS node FROM tri UNION ALL
              SELECT b FROM tri UNION ALL
              SELECT c FROM tri)
        GROUP BY node)
    SELECT node AS s_suppkey, n_triangles
    FROM per_node ORDER BY n_triangles DESC, node LIMIT 25
    """,
)
def supplier_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the supplier co-purchase graph —
    the clustering-coefficient numerator, the standard community-
    density metric next to PageRank (importance) and connected
    components (membership).

    Scale: edges are kept ORIENTED (u < v), so each triangle is
    enumerated exactly once as (a<b<c) by a wedge join (e(a,b)⋈e(b,c))
    closed by one membership equi-join on e(a,c) — the classic
    node-iterator shape. All equi-joins on bounded keys; at production
    scale orient by DEGREE instead of id so high-degree hubs don't own
    every wedge (noted, same plan shape)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .dropDuplicates()
    )
    sets = li.groupBy("l_orderkey").agg(F.collect_set("l_suppkey").alias("ss"))
    e = (
        sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, x -> "
                    "transform(filter(ss, y -> y > x), "
                    "y -> struct(x AS u, y AS v))))"
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
        .dropDuplicates()
        .localCheckpoint()
    )
    wedge = e.alias("e1").join(
        e.alias("e2"), F.col("e1.v") == F.col("e2.u")
    ).select(
        F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), F.col("e2.v").alias("c")
    )
    tri = wedge.join(
        e.select(F.col("u").alias("a"), F.col("v").alias("c")), ["a", "c"]
    )
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return (
        nodes.groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), "node")
        .limit(25)
        .select(F.col("node").alias("s_suppkey"), "n_triangles")
    )
