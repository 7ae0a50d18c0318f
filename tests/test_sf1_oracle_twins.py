"""Pin staged-twin ≡ registered-oracle equivalence (VERDICT r11 item 5).

The sf1 census (tools_sf1_parity.py) swaps four resource-bound
registered oracles for staged temp-table re-encodings in
tools_sf1_oracles.py.  The README asserted "verified row-identical at
sf0.01 before use" — this test PINS that claim in the suite so a future
edit to a staged twin cannot silently detach the sf1 census from the
driver's registered contract.

Pure DuckDB (no Spark session): runs each staged twin and the
registered ORACLES[name] SQL on the same sf0.01 connection and asserts
canonicalized row-identity.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from tests.conftest import SF_ORACLE
from tests.oracle_harness import canonicalize, duck_connection

import tools_sf1_oracles as twins


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(twins.OVERRIDES))
def test_staged_twin_matches_registered_oracle(con, name):
    import __spark_entry__ as entrymod

    registered = con.execute(entrymod.ORACLES[name]).fetchdf()
    staged = twins.OVERRIDES[name](con)
    assert sorted(staged.columns) == sorted(registered.columns), (
        f"{name}: staged twin columns {sorted(staged.columns)} != "
        f"registered {sorted(registered.columns)}"
    )
    assert len(staged) == len(registered), (
        f"{name}: staged twin rows {len(staged)} != registered {len(registered)}"
    )
    g, w = canonicalize(staged), canonicalize(registered)
    diffs = [(a, b) for a, b in zip(g, w) if a != b]
    assert not diffs, (
        f"{name}: staged twin diverges from registered oracle; "
        f"first 3: {diffs[:3]}"
    )
