"""Round-13 profiling: per-query job/stage decomposition for the
serial-suspect queries (bpe_merge_table, benchmark_decontamination,
supplier_pagerank, supplier_pagerank_served, feature_store_build).

Prints, per query: wall time (noop sink), job count, and per-stage
task-count/max-task-time/total-task-time from the status tracker —
enough to see single-task (serial) stages without the UI."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: F401  (imports all plan modules)
from mle_proj_datapipeline_spark.plans.registry import QUERIES
from mle_proj_datapipeline_spark.session import get_spark

TARGETS = sys.argv[1:] or [
    "bpe_merge_table",
    "benchmark_decontamination",
    "supplier_pagerank",
    "supplier_pagerank_served",
    "feature_store_build",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_r13")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    spark.range(1).count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).write.format(
        "noop"
    ).mode("overwrite").save()
    tracker = sc.statusTracker()

    for name in TARGETS:
        # one cold + one profiled warm run
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        for j in list(sc._jsc.getPersistentRDDs().values()):
            j.unpersist(False)
        jobs0 = set(tracker.getJobIdsForGroup(None) or [])
        sc.setJobDescription(f"r13-profile:{name}")
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobDescription(None)
        jobs = [j for j in (tracker.getJobIdsForGroup(None) or []) if j not in jobs0]
        stages = []
        for jid in sorted(jobs):
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is None:
                    continue
                stages.append(
                    {
                        "job": jid,
                        "stage": sid,
                        "name": si.name.split("\n")[0][:70],
                        "tasks": si.numTasks,
                        "done": si.numCompletedTasks,
                    }
                )
        print(
            json.dumps(
                {
                    "query": name,
                    "warm_wall": round(wall, 3),
                    "n_jobs": len(jobs),
                    "stages": stages,
                }
            )
        )
        for j in list(sc._jsc.getPersistentRDDs().values()):
            j.unpersist(False)


if __name__ == "__main__":
    main()
