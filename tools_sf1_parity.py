"""Full-registry DuckDB-oracle parity at synthesized sf≈1 (6M-row
lineitem) — two decades above the driver's sf0.01 gate. Read-only.

Hardened after run 1: DuckDB memory/temp caps (the pagerank oracle's
inline-iteration encoding spilled >59 GB and filled the disk, killing
the Spark JVM's shuffle writes with it), a 240 s interrupt watchdog per
oracle, and JSONL incremental results with resume-on-restart.
"""
import os
import sys
import json
import time
import threading

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
os.environ["SPARK_GRAFT_WAREHOUSE"] = "/tmp/sf1_parity_wh"

import duckdb
import __spark_entry__ as entrymod
from pyspark.sql import SparkSession

SF_DIR = "/root/repo/spark-warehouse/synth_sf1"
ROWS_PATH = "/tmp/sf1_rows.jsonl"
ORACLE_TIMEOUT_S = 240
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

done = {}
if os.path.exists(ROWS_PATH):
    with open(ROWS_PATH) as fh:
        for line in fh:
            try:
                r = json.loads(line)
                done[r["name"]] = r
            except ValueError:
                pass

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
    """Execute with an interrupt watchdog so a superlinear oracle
    encoding fails fast instead of running unbounded.

    ADVICE r10 race fix: the watchdog interrupts a FRESH per-query
    cursor, not the shared connection — if the timer fires in the
    window between fetchdf() returning and timer.cancel(), the pending
    interrupt lands on a cursor that is closed immediately after,
    instead of poisoning the NEXT oracle on the shared connection."""
    cur = con.cursor()
    timer = threading.Timer(ORACLE_TIMEOUT_S, cur.interrupt)
    timer.start()
    try:
        return cur.execute(sql).fetchdf()
    finally:
        timer.cancel()
        cur.close()


# Staged re-encodings of the four oracles whose registered CTE forms
# are resource-unbounded at 6M rows (VERDICT r10 item 4) — same math,
# temp-table staging + bounded iteration. Registered oracles untouched.
from tools_sf1_oracles import OVERRIDES as SF1_OVERRIDES

_override_cache = {}

qs, osql = entrymod.queries(), entrymod.oracle_sql()
out = open(ROWS_PATH, "a")
t_start = time.time()
for i, name in enumerate(qs):
    if name in done:
        continue
    rec = {"name": name}
    t0 = time.time()
    try:
        got = qs[name](spark, SF_DIR).toPandas()
        rec["t_spark"] = round(time.time() - t0, 1)
        rec["rows"] = len(got)
    except Exception as exc:
        rec["status"] = "spark_err"
        rec["detail"] = f"{type(exc).__name__}: {str(exc)[:200]}"
        print(f"ERR  {name}: {type(exc).__name__}", flush=True)
        out.write(json.dumps(rec) + "\n"); out.flush()
        continue
    if name not in osql:
        rec["status"] = "no_oracle"
        out.write(json.dumps(rec) + "\n"); out.flush()
        continue
    t1 = time.time()
    try:
        if name in SF1_OVERRIDES:
            fn = SF1_OVERRIDES[name]
            cached = fn in _override_cache
            if not cached:
                _override_cache[fn] = fn(con)
            # Defensive copy: two queries can share one staged fn
            # (pagerank + its served twin); a future in-place mutation
            # during diff reporting must not corrupt the second compare.
            want = _override_cache[fn].copy()
            rec["oracle_encoding"] = "staged-cached" if cached else "staged"
        else:
            want = run_oracle(osql[name])
        # A cached staged hit costs ~0s; record null so timings aren't
        # mistaken for a real oracle run.
        rec["t_duckdb"] = (
            None
            if rec.get("oracle_encoding") == "staged-cached"
            else round(time.time() - t1, 1)
        )
    except Exception as exc:
        rec["status"] = "oracle_err"
        rec["detail"] = f"{type(exc).__name__}: {str(exc)[:200]}"
        print(f"OERR {name}: {type(exc).__name__}: {str(exc)[:120]}", flush=True)
        out.write(json.dumps(rec) + "\n"); out.flush()
        continue
    g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
    w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
    rec["status"] = "green" if g == w else "DIFF"
    if g != w:
        # record up to 3 differing cells for adjudication
        diffs = []
        gs, ws = set(g), set(w)
        for row in list(gs - ws)[:3]:
            diffs.append({"spark": row})
        for row in list(ws - gs)[:3]:
            diffs.append({"duckdb": row})
        rec["sample_diffs"] = diffs
        print(f"DIFF {name}: {len(g)} vs {len(w)} rows", flush=True)
    out.write(json.dumps(rec) + "\n"); out.flush()
    if (i + 1) % 10 == 0:
        print(f"...{i+1}/{len(qs)} ({time.time()-t_start:.0f}s)", flush=True)

out.close()
rows = [json.loads(l) for l in open(ROWS_PATH)]
by = {}
for r in rows:
    by[r["name"]] = r
summary = {
    "checked": len(by),
    "green": sum(1 for r in by.values() if r.get("status") == "green"),
    "diff": sorted(n for n, r in by.items() if r.get("status") == "DIFF"),
    "oracle_err": sorted(n for n, r in by.items() if r.get("status") == "oracle_err"),
    "spark_err": sorted(n for n, r in by.items() if r.get("status") == "spark_err"),
    "rows_only": sorted(n for n, r in by.items() if r.get("status") == "no_oracle"),
}
print(json.dumps(summary, indent=1))
with open("/tmp/sf1_parity_summary.json", "w") as fh:
    json.dump(summary, fh, indent=1)
