"""Bench harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Execution is measured with the noop sink (full plan runs on executors,
nothing collects to the driver).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import mle_proj_datapipeline_spark.plans.relational  # noqa: F401
import mle_proj_datapipeline_spark.plans.pipeline_queries  # noqa: F401
import mle_proj_datapipeline_spark.plans.llm_dedup_queries  # noqa: F401
import mle_proj_datapipeline_spark.plans.llm_ann_queries  # noqa: F401
import mle_proj_datapipeline_spark.plans.llm_text_queries  # noqa: F401
import mle_proj_datapipeline_spark.plans.llm_corpus_queries  # noqa: F401
import mle_proj_datapipeline_spark.plans.feature_queries  # noqa: F401
import mle_proj_datapipeline_spark.plans.rollup_queries  # noqa: F401
import mle_proj_datapipeline_spark.plans.profile_queries  # noqa: F401
import mle_proj_datapipeline_spark.plans.series_queries  # noqa: F401
import mle_proj_datapipeline_spark.plans.matching_queries  # noqa: F401
import mle_proj_datapipeline_spark.plans.lifecycle_queries  # noqa: F401
import mle_proj_datapipeline_spark.plans.tpch_queries  # noqa: F401
import mle_proj_datapipeline_spark.plans.quality_queries  # noqa: F401
import mle_proj_datapipeline_spark.plans.graph_queries  # noqa: F401
import mle_proj_datapipeline_spark.plans.sampling_queries  # noqa: F401
import mle_proj_datapipeline_spark.plans.stats_queries  # noqa: F401
import mle_proj_datapipeline_spark.plans.linalg_queries  # noqa: F401
import mle_proj_datapipeline_spark.plans.featurize_queries  # noqa: F401
import mle_proj_datapipeline_spark.plans.served_queries  # noqa: F401
import mle_proj_datapipeline_spark.plans.feature_store  # noqa: F401
from mle_proj_datapipeline_spark.plans.registry import QUERIES
from mle_proj_datapipeline_spark.session import get_spark

HEADLINE = [
    "pricing_summary",
    "forecast_revenue",
    "top_revenue_orders",
    "nation_revenue",
    "segment_order_stats",
    "top_supplier_per_nation_week",
    "user_sessions",
    "asof_purchase_click",
    "minhash_lsh_neardups",
    "simhash_neardups",
    "ann_cosine_topk",
    "ann_lsh_top1",
    "ann_ivf_topk",
    "doc_quality_by_lang",
    "embedding_cosine_neardups",
    "doc_token_stats",
    "dedup_canonical_corpus",
    "neardup_clusters",
    "tfidf_top_terms",
    "weekly_revenue_spine",
    "kmeans_embedding_cells",
    "semantic_dedup_medoids",
    "cm_sketch_heavy_hitters",
    "session_window_stats",
    "orders_footer_stats",
    "benchmark_decontamination",
    "context_window_packing",
    "shipping_priority",
    # round-4 widening (VERDICT r2 item 8): heavy multimodal/text/TPC-H
    "image_meta_extract",
    "pii_scrub_stats",
    "doc_repetition_quality",
    "cohort_retention",
    "part_profit_by_nation",
    "late_shipping_suppliers",
    "video_frame_stats",
    "audio_feature_extract",
    "ann_ivf_trained_topk",
    "purchase_click_window_pairs",
    "corpus_build_pipeline",
    "chunk_exact_dedup",
    "weekly_psi_drift",
    "customer_value_ewma",
    # round-5 additions
    "prediction_metrics",
    "ann_lsh_indexed_top1",
    "roc_auc_from_scores",
    "score_calibration_bins",
    "table_quality_report",
    "scd2_priority_history",
    "variant_event_props",
    "ks_drift_totalprice",
    "key_skew_profile",
    "stratified_group_sample",
    "pr_auc_from_scores",
    "lift_gain_deciles",
    "point_in_time_features",
    "mad_outlier_stats",
    "pps_orders_sample",
    "supplier_pagerank",
    "bpe_merge_table",
    "embedding_pca_power",
    "asof_nearest_click",
    "event_transition_matrix",
    "target_encode_priority",
    "bigram_lm_doc_scores",
    "k_anonymity_report",
    "bigram_lm_scores_served",
    "cm_heavy_hitters_served",
    # round-7 additions
    "supplier_pagerank_served",
    "feature_store_build",
]


def _prev_round_timings() -> tuple[dict[str, float], float, float]:
    """Per-query steady-state timings (and both calibration-probe
    readings — fixed-compute JVM seconds and the shuffle probe, 0.0 if
    the round predates either) from the latest BENCH_r*.json in the
    repo root — enables round-over-round deltas."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    # newest round with a USABLE parse (a crashed round records
    # parsed=null — skip it rather than losing the deltas entirely)
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json")), reverse=True):
        try:
            with open(path) as fh:
                d = json.load(fh)
            # driver wraps our line under "parsed"
            d = d.get("parsed", d) if isinstance(d, dict) else {}
            q = dict((d or {}).get("queries", {}))
            if q:
                # calib rides in the compact line from round 9 on, the
                # shuffle probe from round 11; for earlier rounds they
                # are 0.0 and normalization is skipped (a same-round
                # BENCH_DETAIL fallback would pair prev-round timings
                # with this round's environment — wrong epoch, worse
                # than no normalization).
                return (
                    q,
                    float((d or {}).get("calib", 0.0) or 0.0),
                    float((d or {}).get("calib_sh", 0.0) or 0.0),
                )
        except (OSError, ValueError, AttributeError):
            continue
    return {}, 0.0, 0.0


def _calibration_probe(spark) -> dict[str, float]:
    """Fixed-cost environment probe (VERDICT r8 item 4): a constant-size
    JVM-only aggregation and a constant-size DuckDB scan, each the median
    of 3 runs. Neither touches the engine or the test data, so their
    round-over-round movement measures ENVIRONMENT drift (CPU contention,
    JVM/JIT state, container throttling) — per-query deltas can then be
    normalized by the probe ratio instead of re-adjudicating 10-18%
    whole-bench swings query by query (rounds 7 and 8 both paid that tax).
    """
    jvm_runs: list[float] = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(20_000_000).selectExpr(
            "sum(id * 2654435761 % 1000003) AS s"
        ).write.format("noop").mode("overwrite").save()
        jvm_runs.append(time.perf_counter() - t0)
    # Shuffle-weighted twin (VERDICT r10 item 7): the compute-only probe
    # over-corrects compute-heavy queries when drift is in the exchange
    # path (task scheduling, shuffle I/O, serialization). A constant
    # 100k-row hash-repartition + aggregation brackets that axis so the
    # normalized deltas can be read against BOTH ratios.
    shuffle_runs: list[float] = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(100_000).selectExpr("id % 1009 AS k", "id AS v").repartition(
            32, "k"
        ).groupBy("k").agg({"v": "sum"}).write.format("noop").mode(
            "overwrite"
        ).save()
        shuffle_runs.append(time.perf_counter() - t0)
    duck_runs: list[float] = []
    try:
        import duckdb

        for _ in range(3):
            t0 = time.perf_counter()
            duckdb.sql(
                "SELECT sum(i * 2654435761 % 1000003) FROM range(20000000) t(i)"
            ).fetchall()
            duck_runs.append(time.perf_counter() - t0)
    except Exception:
        duck_runs = [0.0]

    def med(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2

    return {
        "jvm": round(med(jvm_runs), 3),
        "jvm_shuffle": round(med(shuffle_runs), 3),
        "duckdb": round(med(duck_runs), 3),
    }


def _release_checkpoints(spark) -> None:
    """Unpersist all persistent RDD blocks (localCheckpoint residue from
    materializing queries). Run BETWEEN timed queries, outside the timed
    region: without this, block-manager accumulation across 100 query
    executions inflates late-list queries by up to ~2x and makes totals
    order-dependent — each query should be measured as the self-contained
    job it is in production."""
    try:
        for j in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            j.unpersist(False)
    except Exception:
        pass


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in QUERIES]

    # Session warm-up: JVM/executor spin-up and parquet-footer reads are
    # cluster-init costs, not query costs — pay them before timing.
    spark.range(1).count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).write.format(
        "noop"
    ).mode("overwrite").save()

    calib = _calibration_probe(spark)

    # Pass 1 (cold): includes one-time Catalyst planning + whole-stage
    # codegen compilation per query. Pass 2 (steady state): the
    # per-batch execution cost — what repeats every production run and
    # what scales with data volume. `value` reports steady state;
    # cold numbers ride along for transparency.
    cold: dict[str, float] = {}
    exchanges: dict[str, int] = {}
    job_counts: dict[str, int] = {}
    tracker = spark.sparkContext.statusTracker()

    def _job_count() -> int:
        try:
            return len(tracker.getJobIdsForGroup(None))
        except Exception:
            return 0

    for name in names:
        jobs0 = _job_count()
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 3)
        # Probe classification signals (VERDICT r11 item 6), gathered
        # outside the timed region: Exchange count in the physical plan
        # proxies per-action stage weight, and the job-count delta
        # catches iterative/multi-job queries (k-means training,
        # pagerank, BPE) whose scheduling cost never shows in the final
        # returned plan. Either being high means exchange/scheduling
        # drift dominates, so the shuffle probe's ratio matches better
        # than the fixed-compute probe's.
        try:
            exchanges[name] = (
                df._jdf.queryExecution().executedPlan().toString().count("Exchange")
            )
        except Exception:
            exchanges[name] = -1
        job_counts[name] = _job_count() - jobs0
        _release_checkpoints(spark)

    # Steady state is the MEDIAN of N warm repeats (VERDICT r6 item 2:
    # single-run timings at sub-second per query drifted +-10% between
    # rounds, hiding real improvements behind environment noise). The
    # spread (min/max across repeats) rides along in BENCH_DETAIL.json
    # so cross-round deltas are adjudicable against run noise.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for name in names:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.perf_counter() - t0, 3))
            _release_checkpoints(spark)

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2

    timings = {n: round(median(rs), 3) for n, rs in runs.items()}
    spread = {
        n: {"min": min(rs), "max": max(rs), "runs": rs} for n, rs in runs.items()
    }

    prev, prev_calib, prev_calib_sh = _prev_round_timings()
    deltas = {
        n: round(timings[n] - prev[n], 3) for n in timings if n in prev
    }
    # Drift-normalized deltas: scale this round's timing by the inverse
    # of the environment-probe ratio before differencing. Only available
    # once the previous round also carried the probe. The shuffle-probe
    # ratio rides alongside (available from round 12 on) so adjudication
    # can bracket fixed-compute vs exchange-path drift.
    drift_ratio = (
        round(calib["jvm"] / prev_calib, 4) if prev_calib > 0 else None
    )
    drift_ratio_shuffle = (
        round(calib["jvm_shuffle"] / prev_calib_sh, 4)
        if prev_calib_sh > 0
        else None
    )
    deltas_norm = (
        {
            n: round(timings[n] / drift_ratio - prev[n], 3)
            for n in timings
            if n in prev
        }
        if drift_ratio
        else {}
    )
    deltas_norm_shuffle = (
        {
            n: round(timings[n] / drift_ratio_shuffle - prev[n], 3)
            for n in timings
            if n in prev
        }
        if drift_ratio_shuffle
        else {}
    )
    # Matched normalization (VERDICT r11 item 6): r11's compute-only
    # probe over-corrected exchange-heavy queries (ann_ivf_trained_topk
    # read +0.55 s normalized vs +0.1 s raw). Each query now uses the
    # probe matching its plan class — >= 4 Exchanges in the physical
    # plan means stage-scheduling/exchange cost dominates at sf0.1, so
    # the shuffle probe's ratio applies; otherwise the fixed-compute
    # probe's. Both raw maps ride alongside so adjudication can bracket.
    _SHUFFLE_CLASS_MIN_EXCHANGES = 4
    _SHUFFLE_CLASS_MIN_JOBS = 4
    probe_class = {
        n: (
            "shuffle"
            if exchanges.get(n, 0) >= _SHUFFLE_CLASS_MIN_EXCHANGES
            or job_counts.get(n, 0) >= _SHUFFLE_CLASS_MIN_JOBS
            else "compute"
        )
        for n in names
    }
    deltas_norm_matched = {}
    for n in timings:
        if n not in prev:
            continue
        r = (
            drift_ratio_shuffle
            if probe_class[n] == "shuffle"
            else drift_ratio
        )
        if r:
            deltas_norm_matched[n] = round(timings[n] / r - prev[n], 3)
    # The driver captures only the tail (~2 KB) of stdout, so the line it
    # parses must stay compact: steady-state totals + per-query warm only,
    # tight separators, 2-decimal precision. Cold timings and
    # round-over-round deltas go to BENCH_DETAIL.json in-repo instead
    # (VERDICT r4 item 1: parsed was null for rounds 2-4).
    detail = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cold_value": round(sum(cold.values()), 3),
        "cold_queries": cold,
        "delta_vs_prev_round": deltas,
        "delta_vs_prev_round_drift_normalized": deltas_norm,
        "delta_vs_prev_round_drift_normalized_shuffle": deltas_norm_shuffle,
        "delta_vs_prev_round_drift_normalized_matched": deltas_norm_matched,
        "probe_class": probe_class,
        "exchange_counts": exchanges,
        "cold_job_counts": job_counts,
        "calibration_probe": calib,
        "calibration_probe_prev_jvm": prev_calib,
        "calibration_probe_prev_jvm_shuffle": prev_calib_sh,
        "drift_ratio_vs_prev": drift_ratio,
        "drift_ratio_shuffle_vs_prev": drift_ratio_shuffle,
        "warm_reps": reps,
        "warm_spread": spread,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    # Only the canonical sf0.1 run owns the committed artifact — a quick
    # probe at another SF must not clobber it, and the DRIVER's per-round
    # pass must not dirty the working tree either (VERDICT r8 item 6):
    # non-canonical runs write to BENCH_DETAIL_last.json (gitignored).
    canonical = os.environ.get("SPARK_GRAFT_BENCH_CANONICAL", "") == "1"
    detail_name = (
        "BENCH_DETAIL.json"
        if (canonical and abs(sf - 0.1) < 1e-9)
        else "BENCH_DETAIL_last.json"
    )
    with open(os.path.join(here, detail_name), "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
        fh.write("\n")
    compact = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 2),
        "unit": "sec",
        "queries": {n: round(t, 2) for n, t in timings.items()},
        "sf": sf,
        "calib": round(calib["jvm"], 2),
        "calib_sh": round(calib["jvm_shuffle"], 2),
    }
    line = json.dumps(compact, separators=(",", ":"))
    # Hard guard: the driver keeps the LAST 2000 chars of output and our
    # line is the final thing printed (r8 measured: line at 1887 chars
    # ended exactly at the tail boundary), so ≤1950 leaves real margin.
    # Degrade gracefully as the headline list grows: first drop per-query
    # precision to 1 decimal (full 3-decimal medians + spread live in
    # BENCH_DETAIL.json), and only if even that overflows drop per-query
    # detail entirely.
    if len(line) > 1950:
        compact["queries"] = {n: round(t, 1) for n, t in timings.items()}
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1950:
        compact["queries"] = {}
        compact["queries_in"] = "BENCH_DETAIL.json"
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
