"""Strict (raw-stringified, no canonicalization) Spark↔DuckDB compare —
guards against dtype drift (e.g. DuckDB HUGEINT sums surfacing as
float64) that the tolerant harness in oracle_harness.py would mask but
an unknown driver-side hash normalization might not."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE
from tests.oracle_harness import duck_connection


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_strict_string_parity(spark, duck, name):
    got = entrymod.queries()[name](spark, SF_ORACLE).toPandas()
    want = duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
    w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
    assert len(g) == len(w), f"{name}: rows {len(g)} != {len(w)}"
    diffs = [(a, b) for a, b in zip(g, w) if a != b]
    assert not diffs, f"{name}: {len(diffs)} strict mismatches; first: {diffs[:2]}"
