"""Targeted sf≈1 parity for the queries the r12 optimization round
changed — the same harness as tools_sf1_parity.py (synthesized 6M-row
lineitem tree, DuckDB oracles with the staged re-encodings for the
resource-unbounded four), restricted to the changed set so the
post-change engine is value-verified two decades above the driver gate
without re-running the full 165-query census.

Excluded from the set (separately evidenced): customer_golden_records /
fuzzy_name_pairs (FALSIFY_r12.json value-checks the rebuilt symspell
path at sparse sf1), supplier_triangles (unchanged this round).
Run AFTER tools_scaling4.py has synthesized spark-warehouse/synth_sf1.
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
os.environ["SPARK_GRAFT_WAREHOUSE"] = "/tmp/sf1_targeted_wh"

import duckdb
import __spark_entry__ as entrymod
from pyspark.sql import SparkSession

SF_DIR = "/root/repo/spark-warehouse/synth_sf1"
OUT = "/tmp/sf1_targeted_r12.jsonl"
ORACLE_TIMEOUT_S = 300
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

CHANGED = [
    # batch one + singles
    "tfidf_top_terms", "weekly_psi_drift", "late_shipping_suppliers",
    "simhash_neardups", "neardup_clusters",
    "supplier_pagerank", "supplier_pagerank_served",
    # batch two
    "pr_auc_from_scores", "lift_gain_deciles", "ks_drift_totalprice",
    "key_skew_profile", "feature_store_build", "cm_heavy_hitters_served",
    "weekly_revenue_spine", "target_encode_priority", "cohort_retention",
    "table_quality_report",
    # batch three
    "psi_totalprice_drift", "part_association_rules", "embedding_dim_drift",
    "balanced_corpus_sample", "corpus_mixing_weights", "active_party_keys",
    "cuped_adjusted_metrics", "km_reorder_survival",
    "part_value_concentration", "top_quarter_supplier",
    "excess_volume_suppliers",
    # resumed-session changes
    "heaps_vocab_growth", "label_embedding_centroids",
]

spark = (
    SparkSession.builder.master("local[24]")
    .config("spark.driver.memory", "56g")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
con.execute("SET memory_limit='24GB'")
os.makedirs("/tmp/duck_tmp", exist_ok=True)
con.execute("SET temp_directory='/tmp/duck_tmp'")
con.execute("SET max_temp_directory_size='30GB'")
for name in TABLES:
    con.execute(
        f"CREATE VIEW {name} AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/{name}.parquet/*.parquet')"
    )
tscol = con.execute(
    "SELECT typeof(ts) FROM read_parquet("
    f"'{SF_DIR}/events.parquet/*.parquet') LIMIT 1"
).fetchone()[0]
if tscol.upper() in ("BIGINT", "INT64"):
    con.execute("DROP VIEW events")
    con.execute(
        "CREATE VIEW events AS SELECT event_id, "
        "make_timestamp(ts // 1000) AS ts, user_id, event_type, value, props "
        f"FROM read_parquet('{SF_DIR}/events.parquet/*.parquet')"
    )


def run_oracle(sql):
    cur = con.cursor()
    timer = threading.Timer(ORACLE_TIMEOUT_S, cur.interrupt)
    timer.start()
    try:
        return cur.execute(sql).fetchdf()
    finally:
        timer.cancel()
        cur.close()


from tools_sf1_oracles import OVERRIDES as SF1_OVERRIDES

_override_cache = {}
qs, osql = entrymod.queries(), entrymod.oracle_sql()
out = open(OUT, "w")
green = diffs = 0
for name in CHANGED:
    rec = {"name": name}
    t0 = time.time()
    got = qs[name](spark, SF_DIR).toPandas()
    rec["t_spark"] = round(time.time() - t0, 1)
    rec["rows"] = len(got)
    t1 = time.time()
    if name in SF1_OVERRIDES:
        fn = SF1_OVERRIDES[name]
        if fn not in _override_cache:
            _override_cache[fn] = fn(con)
        want = _override_cache[fn].copy()
        rec["oracle_encoding"] = "staged"
    else:
        want = run_oracle(osql[name])
    rec["t_duckdb"] = round(time.time() - t1, 1)
    g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
    w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
    rec["status"] = "green" if g == w else "DIFF"
    if g == w:
        green += 1
    else:
        diffs += 1
        gs, ws = set(g), set(w)
        rec["sample_diffs"] = (
            [{"spark": r} for r in list(gs - ws)[:3]]
            + [{"duckdb": r} for r in list(ws - gs)[:3]]
        )
    print(f"{rec['status']:5s} {name} spark={rec['t_spark']}s "
          f"duck={rec['t_duckdb']}s rows={rec['rows']}", flush=True)
    out.write(json.dumps(rec) + "\n")
    out.flush()
out.close()
print(f"SUMMARY checked={len(CHANGED)} green={green} diff={diffs}")
