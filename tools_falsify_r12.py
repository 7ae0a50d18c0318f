"""Round-12 falsification probes (VERDICT r11 item 4) — tools-side only,
pkg/ untouched.

The r11 adjudication of the three perf-weak marks says their sf1 cost is
OUTPUT-bound on adversarial synthetic data, not a plan defect:

1. ``fuzzy_name_pairs`` / ``customer_golden_records`` — the synthesized
   sf1 customer names are SEQUENTIAL (`Customer#000...`): one 18-char
   length, dense edit-neighborhoods, 17,013,300 true <=2-edit pairs.
   Claim to falsify: on a REALISTIC sparse name distribution at the
   same 150k-row scale the same plans track output size (target <= 25 s
   like the rest of the registry).
2. ``supplier_triangles`` — the synthesized co-purchase graph is
   dense-REGULAR (degrees 864-945 over 10k nodes, 4.5M undirected
   edges), where degree orientation provably cannot beat id orientation
   (docstring: 487 vs 429 s). Claim to falsify: on a SKEWED (Zipf)
   graph with comparable |E|, degree orientation wins because hubs
   receive edges instead of fanning out Theta(hub_deg^2) wedges.

Both datasets are generated deterministically under spark-warehouse/
(gitignored), measured with the REGISTERED engine queries, and value-
checked against DuckDB oracles (fuzzy family) or an id-oriented twin
(triangles — per-node counts must be orientation-invariant). Results go
to FALSIFY_r12.json and the README scale table.

Usage: python tools_falsify_r12.py [gen|fuzzy|tri|all]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

SPARSE_DIR = os.path.join(HERE, "spark-warehouse", "sparse_sf1")
SKEW_DIR = os.path.join(HERE, "spark-warehouse", "skew_sf1")
OUT_PATH = os.path.join(HERE, "FALSIFY_r12.json")

N_CUSTOMERS = 150_000
N_TYPO_VARIANTS = 3_000
N_EXACT_DUPS = 500
N_NATIONS = 25

N_LINEITEMS = 6_000_000
N_ORDERS = 1_472_360  # matches the synth sf1 tree
N_SUPPLIERS = 10_000
ZIPF_S = 1.05


# --------------------------------------------------------------------------
# Generators (deterministic, numpy-seeded)
# --------------------------------------------------------------------------
_SYLLABLES = [
    "an", "bar", "bel", "ca", "dan", "del", "dor", "el", "fan", "gar",
    "hal", "in", "jor", "kel", "lan", "lor", "mar", "mel", "nor", "or",
    "pel", "quin", "ran", "rel", "sal", "tan", "tor", "ul", "van", "wen",
    "xan", "yor", "zan", "ber", "cor", "dun", "eth", "fin", "gol", "hur",
]


def _names(rng: np.random.Generator, n: int) -> list[str]:
    """Pronounceable First Last names: sparse edit-neighborhoods,
    varying lengths, natural near-collisions — the realistic contrast
    to the synth tree's sequential single-length namespace."""
    syl = np.array(_SYLLABLES)
    f_n = rng.integers(2, 4, size=n)
    l_n = rng.integers(2, 5, size=n)
    picks = rng.integers(0, len(syl), size=(n, 7))
    out = []
    for i in range(n):
        first = "".join(syl[picks[i, : f_n[i]]])
        last = "".join(syl[picks[i, 3 : 3 + l_n[i]]])
        out.append(f"{first.capitalize()} {last.capitalize()}")
    return out


def gen_sparse_customer() -> dict:
    """150k customers: 146.5k organic + 3k same-length typo variants
    (1-2 substitutions — the realistic data-entry/OCR error model that
    stays inside the (nation, length) block both engine and oracle
    declare) + 500 exact duplicates."""
    rng = np.random.default_rng(120_001)
    n_base = N_CUSTOMERS - N_TYPO_VARIANTS - N_EXACT_DUPS
    names = _names(rng, n_base)
    nation = rng.integers(0, N_NATIONS, size=n_base)
    acct = np.round(rng.uniform(-999.99, 9999.99, size=n_base), 2)

    letters = "abcdefghijklmnopqrstuvwxyz"
    all_names = list(names)
    all_nation = list(nation)
    all_acct = list(acct)
    base_idx = rng.integers(0, n_base, size=N_TYPO_VARIANTS)
    for bi in base_idx:
        s = list(names[bi])
        n_edits = 1 + int(rng.random() < 0.3)
        for _ in range(n_edits):
            pos = int(rng.integers(0, len(s)))
            repl = letters[int(rng.integers(0, 26))]
            while repl == s[pos].lower():
                repl = letters[int(rng.integers(0, 26))]
            s[pos] = repl
        all_names.append("".join(s))
        all_nation.append(nation[bi])
        all_acct.append(round(float(rng.uniform(-999.99, 9999.99)), 2))
    dup_idx = rng.integers(0, n_base, size=N_EXACT_DUPS)
    for bi in dup_idx:
        all_names.append(names[bi])
        all_nation.append(nation[bi])
        all_acct.append(round(float(rng.uniform(-999.99, 9999.99)), 2))

    import pandas as pd

    seg = np.array(["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"])
    df = pd.DataFrame(
        {
            "c_custkey": np.arange(1, N_CUSTOMERS + 1, dtype=np.int64),
            "c_name": all_names,
            "c_nationkey": np.array(all_nation, dtype=np.int32),
            "c_acctbal": np.array(all_acct, dtype=np.float64),
            "c_mktsegment": seg[rng.integers(0, 5, size=N_CUSTOMERS)],
        }
    )
    os.makedirs(SPARSE_DIR, exist_ok=True)
    df.to_parquet(os.path.join(SPARSE_DIR, "customer.parquet"), index=False)
    uniq_len = df.c_name.str.len().nunique()
    return {"rows": len(df), "distinct_name_lengths": int(uniq_len)}


def gen_skew_lineitem() -> dict:
    """6M lineitems over 1.47M orders; supplier drawn Zipf(s=1.05) over
    10k keys — the power-law co-purchase graph where hubs exist and
    degree orientation has something to protect against."""
    rng = np.random.default_rng(120_002)
    ranks = np.arange(1, N_SUPPLIERS + 1, dtype=np.float64)
    p = ranks ** (-ZIPF_S)
    p /= p.sum()
    supp = rng.choice(
        np.arange(1, N_SUPPLIERS + 1, dtype=np.int64), size=N_LINEITEMS, p=p
    )
    orderkey = rng.integers(1, N_ORDERS + 1, size=N_LINEITEMS).astype(np.int64)

    import pandas as pd

    df = pd.DataFrame(
        {
            "l_orderkey": orderkey,
            "l_partkey": rng.integers(1, 200_001, size=N_LINEITEMS).astype(np.int64),
            "l_suppkey": supp,
            "l_linenumber": np.ones(N_LINEITEMS, dtype=np.int32),
            "l_quantity": np.float64(1.0),
            "l_extendedprice": np.round(
                rng.uniform(900.0, 105_000.0, size=N_LINEITEMS), 2
            ),
            "l_discount": np.float64(0.0),
            "l_tax": np.float64(0.0),
            "l_returnflag": "N",
            "l_linestatus": "O",
            "l_shipdate": pd.Timestamp("1995-06-15"),
        }
    )
    os.makedirs(SKEW_DIR, exist_ok=True)
    df.to_parquet(os.path.join(SKEW_DIR, "lineitem.parquet"), index=False)
    return {"rows": len(df)}


# --------------------------------------------------------------------------
# Probes
# --------------------------------------------------------------------------
def _spark():
    from mle_proj_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="falsify_r12")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _duck(sf_dir: str, tables: list[str]):
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{os.path.join(sf_dir, t + '.parquet')}')"
        )
    return con


def _canon(df) -> list[tuple]:
    cols = sorted(df.columns)
    return sorted(map(tuple, df[cols].astype(str).values.tolist()))


def probe_fuzzy() -> dict:
    import __spark_entry__ as entry

    spark = _spark()
    con = _duck(SPARSE_DIR, ["customer"])
    res: dict = {"dataset": "sparse_sf1 (150k realistic names)"}

    t0 = time.time()
    true_pairs = con.execute(
        """
        WITH b AS (SELECT c_custkey, c_name, c_nationkey,
                          length(c_name) AS ln FROM customer)
        SELECT count(*) FROM b x JOIN b y
          ON x.c_nationkey = y.c_nationkey AND x.ln = y.ln
         AND x.c_custkey < y.c_custkey
        WHERE levenshtein(x.c_name, y.c_name) <= 2
        """
    ).fetchone()[0]
    res["true_pairs"] = int(true_pairs)
    res["t_truepair_duckdb"] = round(time.time() - t0, 1)

    for name in ("fuzzy_name_pairs", "customer_golden_records"):
        t0 = time.time()
        got = entry.QUERIES[name](spark, SPARSE_DIR).toPandas()
        t_engine = round(time.time() - t0, 1)
        t0 = time.time()
        want = con.execute(entry.ORACLES[name]).fetchdf()
        t_oracle = round(time.time() - t0, 1)
        res[name] = {
            "t_engine_s": t_engine,
            "t_oracle_duckdb_s": t_oracle,
            "rows": len(got),
            "value_match": _canon(got) == _canon(want),
        }
    con.close()
    return res


def _id_oriented_triangles(spark, sf_dir: str):
    """Tools-side id-oriented twin of supplier_triangles: identical
    edge snapshot, orientation by key instead of degree rank — the
    control arm for the skew experiment. Per-node counts must be
    IDENTICAL (orientation only reorders enumeration)."""
    from pyspark.sql import functions as F

    from mle_proj_datapipeline_spark.plans.graph_queries import (
        ensure_cooccurrence_edges,
    )

    eb = ensure_cooccurrence_edges(spark, sf_dir, "l_suppkey", "cooccur_supp")
    e = (
        eb.filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .localCheckpoint()
    )
    wedge = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.u") == F.col("e2.u"))
        .filter(F.col("e1.v") < F.col("e2.v"))
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    tri = wedge.join(
        e.select(F.col("u").alias("b"), F.col("v").alias("c")), ["b", "c"]
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
    )


def probe_triangles() -> dict:
    import __spark_entry__ as entry

    spark = _spark()
    res: dict = {"dataset": f"skew_sf1 (Zipf s={ZIPF_S}, 6M lineitems)"}

    # First call builds the edge snapshot (timed apart — it is the
    # shared graph-family ingest, identical for both orientations).
    t0 = time.time()
    from mle_proj_datapipeline_spark.plans.graph_queries import (
        ensure_cooccurrence_edges,
    )

    eb = ensure_cooccurrence_edges(spark, SKEW_DIR, "l_suppkey", "cooccur_supp")
    n_edges = eb.count()
    res["t_edge_snapshot_s"] = round(time.time() - t0, 1)
    res["directed_edges"] = int(n_edges)
    from pyspark.sql import functions as F

    deg = eb.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    row = deg.agg(
        F.min("d").alias("mn"), F.max("d").alias("mx"), F.avg("d").alias("av")
    ).collect()[0]
    res["degree_min_max_avg"] = [int(row.mn), int(row.mx), round(float(row.av), 1)]

    t0 = time.time()
    got = entry.QUERIES["supplier_triangles"](spark, SKEW_DIR).toPandas()
    res["t_degree_oriented_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    ctrl = _id_oriented_triangles(spark, SKEW_DIR).toPandas()
    res["t_id_oriented_s"] = round(time.time() - t0, 1)
    res["value_match_both_orientations"] = _canon(got) == _canon(ctrl)
    res["top3"] = got.head(3).to_dict("records")
    return res


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    out: dict = {}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as fh:
            out = json.load(fh)
    if what in ("gen", "all"):
        out["gen_sparse"] = gen_sparse_customer()
        print("gen_sparse:", out["gen_sparse"], flush=True)
        out["gen_skew"] = gen_skew_lineitem()
        print("gen_skew:", out["gen_skew"], flush=True)
    if what in ("fuzzy", "all"):
        out["fuzzy"] = probe_fuzzy()
        print("fuzzy:", json.dumps(out["fuzzy"]), flush=True)
    if what in ("tri", "all"):
        out["triangles"] = probe_triangles()
        print("triangles:", json.dumps(out["triangles"]), flush=True)
    with open(OUT_PATH, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")


if __name__ == "__main__":
    main()
