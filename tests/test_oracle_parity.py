"""Every registered query with an oracle must match DuckDB at sf0.01 —
the same gate the driver runs (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, duck_connection


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()


ORACLED = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    compare(q(spark, SF_ORACLE), duck, sql, name=name)


def test_all_queries_have_entries():
    qs = entrymod.queries()
    assert qs, "query registry is empty"
    missing = set(entrymod.oracle_sql()) - set(qs)
    assert not missing, f"oracles without queries: {missing}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.schema.fieldNames()


def test_every_query_runs_at_smallest_sf(spark):
    """Small-data robustness: every registered query must EXECUTE at
    sf0.001 (50-500 rows/table) — percentile breakpoints over tiny
    groups, empty LSH buckets, single-member clusters, and short
    series are exactly where operators crash first. Row counts are
    not asserted (that is the oracle's job at sf0.01); completing the
    plan without error is."""
    failures = []
    qs = entrymod.queries()
    for name in sorted(qs):
        try:
            qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as ex:  # collect all, report together
            failures.append(f"{name}: {type(ex).__name__}: {str(ex)[:200]}")
    assert not failures, "\n".join(failures)
