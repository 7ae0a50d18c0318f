"""Gate on the committed cross-SF scaling report (VERDICT r4 item 7).

SCALING.json is produced by `python tools_scaling.py` (headline queries
timed warm at sf0.01 and sf0.1). These tests make the report
load-bearing: it must cover the current bench headline, and no query
may scale superlinearly past the red line — the failure mode (quadratic
candidate generation) that a single-SF bench cannot distinguish from
"slow but fine".
"""

from __future__ import annotations

import json
import os

import pytest

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PATH = os.path.join(_HERE, "SCALING.json")


@pytest.fixture(scope="module")
def report():
    if not os.path.exists(_PATH):
        pytest.fail("SCALING.json missing — run `python tools_scaling.py`")
    with open(_PATH) as fh:
        return json.load(fh)


def test_report_covers_current_headline(report):
    """A renamed/added headline query must re-run the report — a stale
    report silently stops gating new operators."""
    import bench

    from mle_proj_datapipeline_spark.plans.registry import QUERIES

    headline = {n for n in bench.HEADLINE if n in QUERIES}
    covered = set(report["queries"])
    missing = headline - covered
    assert not missing, f"headline queries absent from SCALING.json: {sorted(missing)}"


def test_no_query_scales_superlinearly(report):
    """Time-ratio must stay under flag_factor x row-ratio for EVERY
    query: sf0.01 -> sf0.1 is ~10x rows, so anything past ~30x time is
    superlinear growth, not overhead noise."""
    limit = report["flag_factor"] * report["row_ratio"]
    offenders = {
        n: q["ratio"]
        for n, q in report["queries"].items()
        if q["ratio"] is not None and q["ratio"] > limit
    }
    assert not offenders, (
        f"superlinear scaling (ratio > {limit:.0f}x): {offenders} — "
        "look for unbounded candidate generation or a lost broadcast"
    )
    assert not any(q["flagged"] for q in report["queries"].values())


def test_fitted_growth_exponents_stay_subquadratic(report):
    """3-point fit gate (VERDICT r5 item 8): the least-squares exponent
    of t ≈ a·n^b over sf0.001/0.01/0.1 must stay ≤ exp_limit for every
    query whose top-SF time is above the noise floor. The fit
    UNDERestimates asymptotic growth (fixed overheads flatten the
    small-SF end), so an exponent past ~1.3 is real superlinearity that
    a two-point ratio near overhead dominance can hide."""
    limit = report["exp_limit"]
    floor = report["noise_floor_s"]
    offenders = {
        n: q["exponent"]
        for n, q in report["queries"].items()
        if q["exponent"] is not None
        and q["t_hi"] >= floor
        and q["exponent"] > limit
    }
    assert not offenders, (
        f"fitted growth exponent > {limit}: {offenders} — superlinear in n, "
        "check candidate generation / per-key fan-out / lost partial agg"
    )
    # three points recorded per query — the fit is real, not a 2-point slope
    assert all(len(q["t_by_sf"]) == 3 for q in report["queries"].values())
