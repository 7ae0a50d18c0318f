"""Targeted sf≈1 parity for the queries the r13 optimization round
changed — the same harness as tools_sf1_parity.py (synthesized 6M-row
lineitem tree, DuckDB oracles with the staged re-encodings for the
resource-unbounded queries), restricted to the changed set so the
post-change engine is value-verified two decades above the driver gate
without re-running the full 165-query census.

Resources derive from the environment (ADVICE r12 item 3): cores from
$SPARK_GRAFT_CPUS or os.cpu_count()-8 (leave headroom for DuckDB),
driver memory from $SPARK_GRAFT_DRIVER_MEM_SF1 (default scales with
/proc/meminfo), repo root from this file's location.
Run AFTER tools_scaling4.py has synthesized spark-warehouse/synth_sf1.
"""
import json
import os
import sys
import threading
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
os.chdir(_REPO)
os.environ["SPARK_GRAFT_WAREHOUSE"] = "/tmp/sf1_targeted_wh_r13"

import duckdb
import __spark_entry__ as entrymod
from pyspark.sql import SparkSession

SF_DIR = os.path.join(_REPO, "spark-warehouse", "synth_sf1")
OUT = "/tmp/sf1_targeted_r13.jsonl"
ORACLE_TIMEOUT_S = 300
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

CHANGED = [
    # r13 operator/plan changes
    "simhash_neardups",            # kernel -> HOF revert
    "supplier_pagerank",           # deg-on-ranks fuse + single |E| exchange
    "supplier_pagerank_served",    # rank snapshot serve
    "bpe_merge_table",             # corpus-pass parallelism
    "bpe_segment_stats",
    "benchmark_decontamination",   # shingle-pass parallelism
    "heaps_vocab_growth",          # explicit null-text handling
    # graph default arm shares the repartition(src) change
    "neardup_clusters",
]


def _cores() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return max(4, (os.cpu_count() or 8) - 8)


def _driver_mem() -> str:
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM_SF1")
    if env:
        return env
    try:
        with open("/proc/meminfo") as fh:
            kb = int(fh.readline().split()[1])
        return f"{max(8, int(kb / 1024 / 1024 * 0.45))}g"
    except (OSError, ValueError):
        return "16g"


spark = (
    SparkSession.builder.master(f"local[{_cores()}]")
    .config("spark.driver.memory", _driver_mem())
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
