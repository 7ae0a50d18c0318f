"""Cross-SF scaling report (VERDICT r4 item 7; 3-point fit r5 item 8):
run the bench headline at sf0.001, sf0.01 and sf0.1 and fit a per-query
growth EXPONENT (ln t vs ln rows least squares) instead of a single
ratio. A single-SF bench cannot see a quadratic candidate blowup (it
just looks "slow"); a two-point ratio can hide it behind fixed-overhead
dominance at the small point — three points expose curvature.

Flag rules (either trips):
- fitted exponent > EXP_LIMIT with the top-SF time above NOISE_FLOOR_S
  (sub-noise-floor timings make exponents scheduling-jitter, not signal);
- warm top-pair time-ratio > FLAG_FACTOR x row-ratio (the original hard
  red line, kept as a backstop for non-power-law blowups).

Writes SCALING.json (machine-readable, consumed by
tests/test_scaling_report.py) and SCALING.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402  (headline list + registry imports)
from mle_proj_datapipeline_spark.plans.registry import QUERIES  # noqa: E402
from mle_proj_datapipeline_spark.session import get_spark  # noqa: E402

SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)
FLAG_FACTOR = 3.0
EXP_LIMIT = 1.3
NOISE_FLOOR_S = 0.3


def run_pass(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    """One cold pass (planning + codegen) then one timed warm pass."""
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).write.format(
        "noop"
    ).mode("overwrite").save()
    for name in names:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def fit_exponent(rows: list[int], times: list[float]) -> float | None:
    """Least-squares slope of ln(t) on ln(n) over the SF points — the b
    of t ≈ a·n^b. Fixed overheads flatten the small-SF end, so the fit
    UNDERestimates asymptotic growth; anything it still pushes past
    EXP_LIMIT is real."""
    pts = [(math.log(n), math.log(t)) for n, t in zip(rows, times) if t > 0]
    if len(pts) < 2:
        return None
    mx = sum(x for x, _ in pts) / len(pts)
    my = sum(y for _, y in pts) / len(pts)
    vx = sum((x - mx) ** 2 for x, _ in pts)
    if vx == 0:
        return None
    return round(sum((x - mx) * (y - my) for x, y in pts) / vx, 3)


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    spark = get_spark(app_name="scaling")
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n in bench.HEADLINE if n in QUERIES]
    spark.range(1).count()

    rows_by_sf = {
        sf: spark.read.parquet(f"{sf}/lineitem.parquet").count() for sf in SF_DIRS
    }
    row_ratio = rows_by_sf[SF_DIRS[-1]] / rows_by_sf[SF_DIRS[-2]]

    timings = [run_pass(spark, sf, names) for sf in SF_DIRS]

    queries = {}
    for n in names:
        ts = [t[n] for t in timings]
        lo, hi = ts[-2], ts[-1]
        ratio = round(hi / lo, 2) if lo > 0 else None
        exponent = fit_exponent([rows_by_sf[sf] for sf in SF_DIRS], ts)
        exp_flag = bool(
            exponent is not None and exponent > EXP_LIMIT and hi >= NOISE_FLOOR_S
        )
        ratio_flag = bool(ratio is not None and ratio > FLAG_FACTOR * row_ratio)
        queries[n] = {
            "t_by_sf": dict(zip(SF_DIRS, ts)),
            "t_lo": lo,
            "t_hi": hi,
            "ratio": ratio,
            "exponent": exponent,
            "flagged": exp_flag or ratio_flag,
        }
    report = {
        "sf_dirs": list(SF_DIRS),
        "sf_lo": SF_DIRS[-2],
        "sf_hi": SF_DIRS[-1],
        "lineitem_rows": rows_by_sf,
        "row_ratio": round(row_ratio, 2),
        "flag_factor": FLAG_FACTOR,
        "exp_limit": EXP_LIMIT,
        "noise_floor_s": NOISE_FLOOR_S,
        "queries": queries,
    }
    with open(os.path.join(here, "SCALING.json"), "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
        fh.write("\n")

    lines = [
        "# Cross-SF scaling report (3-point exponent fit)",
        "",
        "Warm per-query seconds at "
        + ", ".join(f"`{sf}`" for sf in SF_DIRS)
        + " (lineitem rows "
        + " -> ".join(f"{rows_by_sf[sf]:,}" for sf in SF_DIRS)
        + ").",
        "",
        f"`exp` is the least-squares slope of ln(time) on ln(rows) over the "
        f"three points — the b of t ≈ a·n^b. Fixed overheads flatten the "
        f"small-SF end, so the fit underestimates asymptotic growth; a query "
        f"is FLAGGED when exp > {EXP_LIMIT} (and t@sf0.1 ≥ {NOISE_FLOOR_S}s, "
        f"below which timings are scheduler jitter) OR when the sf0.01→sf0.1 "
        f"time-ratio exceeds {FLAG_FACTOR:.0f} x row-ratio "
        f"(= {FLAG_FACTOR * row_ratio:.0f}x, the non-power-law backstop).",
        "",
        "Generated by `python tools_scaling.py`; "
        "`tests/test_scaling_report.py` gates on this file.",
        "",
        "| query | t@sf0.001 | t@sf0.01 | t@sf0.1 | ratio | exp | flag |",
        "|---|---|---|---|---|---|---|",
    ]
    for n in sorted(queries, key=lambda q: -(queries[q]["exponent"] or -9)):
        q = queries[n]
        ratio = "n/a" if q["ratio"] is None else f"{q['ratio']:.2f}x"
        expo = "n/a" if q["exponent"] is None else f"{q['exponent']:.2f}"
        ts = [q["t_by_sf"][sf] for sf in SF_DIRS]
        lines.append(
            f"| {n} | {ts[0]:.2f} | {ts[1]:.2f} | {ts[2]:.2f} | {ratio} | "
            f"{expo} | {'**FLAGGED**' if q['flagged'] else ''} |"
        )
    with open(os.path.join(here, "SCALING.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    n_flagged = sum(q["flagged"] for q in queries.values())
    print(json.dumps({"queries": len(queries), "flagged": n_flagged,
                      "row_ratio": round(row_ratio, 2)}))


if __name__ == "__main__":
    main()
