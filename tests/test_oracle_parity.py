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
