"""r12 audit: flag registered queries whose physical plan scans the same
input location more than once — the double-evaluated-subtree smell
(guide §2.4). A duplicate scan is not automatically a defect (self-joins
and two-subset filters of one table are legitimate); the flagged list is
the REVIEW queue. Run:
    python tools_dupscan_r12.py [sf_dir]
Prints one line per flagged query: name, {location: count}.
"""
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    flagged = 0
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 - keep auditing the rest
            print(f"ERR {name} {type(exc).__name__}: {exc}", flush=True)
            continue
        # toString() prints "Location: InMemoryFileIndex(1 paths)[file:/...]"
        # while explain("formatted") prints "Location: InMemoryFileIndex [..]"
        locs = Counter(re.findall(r"Location: \w+[^\[]*\[([^\],]*)", plan))
        dups = {loc: n for loc, n in locs.items() if n > 1}
        if dups:
            flagged += 1
            short = {os.path.basename(k.rstrip("/")): v for k, v in dups.items()}
            print(f"DUP {name} {short}", flush=True)
    print(f"done flagged={flagged}", flush=True)


if __name__ == "__main__":
    main()
