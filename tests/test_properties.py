"""Property-based tests (hypothesis) — the invariants SURVEY.md §5
commits to: imputation leaves no nulls in declared columns; dedup is
idempotent; the week partitioner maps every date to exactly one
Sunday-anchored week; PSI(x, x) = 0; fingerprints are permutation-
sensitive but duplication-stable."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from mle_proj_datapipeline_spark.operators.dedup import exact_dedup
from mle_proj_datapipeline_spark.operators.impute import ImputeSpec, impute
from mle_proj_datapipeline_spark.operators.psi import psi
from mle_proj_datapipeline_spark.plans.medallion import week_of

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ROWS = st.lists(
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        st.one_of(st.none(), st.floats(min_value=-100, max_value=100, allow_nan=False)),
    ),
    min_size=1,
    max_size=25,
)

SCHEMA = StructType(
    [StructField("cat", StringType(), True), StructField("num", DoubleType(), True)]
)


@SLOW
@given(rows=ROWS)
def test_impute_leaves_no_nulls(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    spec = ImputeSpec(
        constants={"cat": "MISSING"}, mean_cols=["num"], flag_cols=["cat", "num"]
    )
    out = impute(df, spec).cache()
    assert out.filter(F.col("cat").isNull()).count() == 0
    # all-null num columns have no mean — only then may nulls remain
    if any(r[1] is not None for r in rows):
        assert out.filter(F.col("num").isNull()).count() == 0
    # flags reflect ORIGINAL nulls
    assert out.filter(F.col("cat_missing") == 1).count() == sum(
        1 for r in rows if r[0] is None
    )


@SLOW
@given(rows=st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=30))
def test_exact_dedup_idempotent(spark, rows):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(rows)], ["id", "content"])
    once = exact_dedup(df, "content", ["id"])
    twice = exact_dedup(once, "content", ["id"])
    got_once = sorted(map(tuple, once.collect()))
    assert got_once == sorted(map(tuple, twice.collect()))
    # keeps exactly one row per distinct content, the min id
    assert len(got_once) == len(set(rows))
    for i, v in enumerate(rows):
        if i == min(j for j, w in enumerate(rows) if w == v):
            assert (i, v) in got_once


@SLOW
@given(
    d=st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2030, 12, 31)),
)
def test_week_partitioner_total_and_sunday_anchored(spark, d):
    row = spark.createDataFrame([(d,)], ["d"]).select(week_of(F.col("d")).alias("wk")).first()
    wk = dt.date.fromisoformat(row["wk"])
    assert wk.weekday() == 6  # Sunday
    assert wk <= d <= wk + dt.timedelta(days=6)


@SLOW
@given(
    vals=st.lists(
        st.floats(min_value=-1000, max_value=1000, allow_nan=False),
        min_size=20,
        max_size=60,
    )
)
def test_psi_self_is_zero(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    assert psi(df, df, "x").first()["psi"] == 0.0


EDGES = st.lists(
    st.tuples(st.integers(min_value=0, max_value=20), st.integers(min_value=0, max_value=20)),
    min_size=1,
    max_size=30,
)


@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=EDGES)
def test_connected_components_matches_union_find(spark, edges):
    """Min-label propagation must agree with a reference union-find on
    arbitrary graphs (self-loops, duplicates, chains, cycles)."""
    from mle_proj_datapipeline_spark.operators.dedup import connected_components

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}
    # canonical root = min node of the component
    roots: dict[int, int] = {}
    for n, r in expected.items():
        roots[r] = min(roots.get(r, n), n)
    expected = {n: roots[r] for n, r in expected.items()}

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["comp"] for r in connected_components(pairs).collect()}
    assert got == expected
