"""Degree-orientation invariance for supplier_triangles (round 12).

The round-12 falsification probe (FALSIFY_r12.json) showed degree
orientation wins 6.6x over id orientation on a Zipf-skewed co-purchase
graph while producing IDENTICAL per-node counts. This test pins the
invariance half permanently at suite scale: a crafted hub-heavy graph
(one supplier in most orders — the adversarial shape where a wrong
orientation tie-break double- or zero-counts hub triangles) must yield
the same per-node triangle counts from the registered degree-oriented
plan and the tools-side id-oriented control twin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def skew_dir(tmp_path):
    rng = np.random.default_rng(42)
    n_orders, n_supp = 150, 30
    rows = []
    for ok in range(1, n_orders + 1):
        # hub supplier 1 joins ~2/3 of orders; tail Zipf-ish over 2..30
        members = set()
        if rng.random() < 0.66:
            members.add(1)
        k = int(rng.integers(2, 6))
        ranks = np.arange(2, n_supp + 1, dtype=float)
        p = ranks ** -1.2
        p /= p.sum()
        members.update(
            int(s) for s in rng.choice(np.arange(2, n_supp + 1), size=k, p=p)
        )
        for ln, sk in enumerate(sorted(members), start=1):
            rows.append((ok, int(rng.integers(1, 2000)), sk, ln))
    df = pd.DataFrame(
        rows, columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
    )
    df["l_quantity"] = 1.0
    df["l_extendedprice"] = 100.0
    df["l_discount"] = 0.0
    df["l_tax"] = 0.0
    df["l_returnflag"] = "N"
    df["l_linestatus"] = "O"
    df["l_shipdate"] = pd.Timestamp("1995-06-15")
    d = tmp_path / "skew_sf"
    d.mkdir()
    df.to_parquet(d / "lineitem.parquet", index=False)
    return str(d)


def test_triangle_counts_orientation_invariant_on_skewed_graph(spark, skew_dir):
    import __spark_entry__ as entry
    from tools_falsify_r12 import _id_oriented_triangles

    got = (
        entry.QUERIES["supplier_triangles"](spark, skew_dir)
        .toPandas()
        .sort_values(["n_triangles", "s_suppkey"], ascending=[False, True])
        .reset_index(drop=True)
    )
    ctrl = (
        _id_oriented_triangles(spark, skew_dir)
        .toPandas()
        .rename(columns={"node": "s_suppkey"})
        .sort_values(["n_triangles", "s_suppkey"], ascending=[False, True])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    assert got[["s_suppkey", "n_triangles"]].values.tolist() == (
        ctrl[["s_suppkey", "n_triangles"]].values.tolist()
    )
    # the hub must actually be a hub (fixture sanity: it closes the most
    # triangles, so the orientation tie-breaks were genuinely exercised)
    assert got.iloc[0]["s_suppkey"] == 1
