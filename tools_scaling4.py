"""4-point cross-SF scaling fit (VERDICT r9 item 5): extend the 3-point
sf0.001→0.1 exponent fit by one more decade for the TOP-10 most
expensive headline queries, using a locally synthesized sf≈1 derived
from the driver's sf0.1 parquet.

Synthesis (salt-and-union ×10, cardinality-ratio preserving):
- Fact and large-dim tables (customer supplier part orders lineitem
  events documents embeddings) are replicated ×10; every replica gets a
  DISJOINT key universe by shifting each table's surrogate keys (and the
  fact FKs that reference them) by ``replica · stride`` where stride =
  max(key)+1 of the source — so per-key fan-ins (orders/customer,
  lineitem/order, events/user) are EXACTLY preserved and join
  multiplicities scale linearly, like a real SF step.
- nation/region stay fixed (TPC-H dims do not scale with SF), so
  FK targets in 0..24 are untouched.
- documents.text gets a per-replica lowercase-alphabet rotation
  (``translate``): without it every doc would gain 9 EXACT duplicates
  and pair-generating dedup operators (MinHash bands, neardup clusters)
  would measure a C(10,2) per-group pair explosion — a skew artifact of
  the synthesis, not data growth. The rotation keeps length, token
  shape, and per-replica duplicate-group sizes identical to the source
  while making shingle sets disjoint across replicas.
- embeddings vectors are left byte-identical across replicas (only
  vec_id shifts): the expensive embedding consumers (k-means, IVF
  training, PCA) are linear passes where stacked duplicate points cost
  exactly what distinct points cost; no pair-generation path consumes
  embeddings in the top-10 set.

The synthesized tree lives under ``spark-warehouse/synth_sf1/``
(gitignored; rebuilt on demand, fingerprinted by the source listing so a
driver-side sf0.1 regeneration invalidates it).

Writes SCALING4.json and splices a marker-delimited 4-point section into
SCALING.md (idempotent; tools_scaling.py regeneration drops the section,
re-running this script restores it).
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: F401,E402  (imports populate the registry)
import tools_scaling  # noqa: E402
from mle_proj_datapipeline_spark.plans.registry import QUERIES  # noqa: E402
from mle_proj_datapipeline_spark.session import get_spark  # noqa: E402
from mle_proj_datapipeline_spark.sources.catalog import (  # noqa: E402
    source_fingerprint,
)

HERE = os.path.dirname(os.path.abspath(__file__))
SRC_SF_DIR = "/root/testdata/sf0.1"
SYNTH_DIR = os.path.join(HERE, "spark-warehouse", "synth_sf1")
REPLICAS = 10
TOP_N = 10

# (table, own surrogate keys to shift) — FK shifts are derived from the
# referenced table's stride below. nation/region are fixed dims.
SCALED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": [],  # only FKs
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FK = {
    "orders": {"o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
}
ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _stride(spark, table: str, key: str) -> int:
    import pyspark.sql.functions as F

    row = (
        spark.read.parquet(f"{SRC_SF_DIR}/{table}.parquet")
        .agg(F.max(key).alias("m"))
        .collect()[0]
    )
    return int(row["m"]) + 1


def build_synth_sf1(spark) -> None:
    """Materialize the ×10 salted union under SYNTH_DIR, keyed on the
    source fingerprint so a regenerated sf0.1 forces a rebuild."""
    import pyspark.sql.functions as F

    fp = "|".join(
        source_fingerprint(SRC_SF_DIR, t) for t in sorted(SCALED) + ["nation", "region"]
    )
    meta_path = os.path.join(SYNTH_DIR, "_meta.json")
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as fh:
                if json.load(fh).get("src_fingerprint") == fp:
                    return
        except (OSError, ValueError):
            pass

    strides = {
        t: _stride(spark, t, keys[0]) for t, keys in SCALED.items() if keys
    }
    # events has two independent key spaces
    strides_user = _stride(spark, "events", "user_id")

    for t in ("nation", "region"):
        spark.read.parquet(f"{SRC_SF_DIR}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{SYNTH_DIR}/{t}.parquet")

    for t, own_keys in SCALED.items():
        # events.ts is parquet TIMESTAMP(NANOS): read raw (nanosAsLong
        # already set by any prior load_table; set defensively) so the
        # int64 ns column round-trips bit-identically and the catalog's
        # bigint→timestamp conversion applies to the synth copy too.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        src = spark.read.parquet(f"{SRC_SF_DIR}/{t}.parquet")
        parts = []
        for r in range(REPLICAS):
            rep = src
            for k in own_keys:
                s = strides_user if (t, k) == ("events", "user_id") else strides[t]
                rep = rep.withColumn(k, F.col(k) + F.lit(r * s))
            for k, ref in FK.get(t, {}).items():
                rep = rep.withColumn(k, F.col(k) + F.lit(r * strides[ref]))
            if t == "documents" and r:
                rot = ALPHA[r:] + ALPHA[:r]
                rep = rep.withColumn(
                    "text",
                    F.translate(
                        "text", ALPHA + ALPHA.upper(), rot + rot.upper()
                    ),
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{SYNTH_DIR}/{t}.parquet"
        )

    with open(meta_path, "w") as fh:
        json.dump({"src_fingerprint": fp, "replicas": REPLICAS}, fh)


BEGIN = "<!-- scaling4:begin -->"
END = "<!-- scaling4:end -->"


def splice_md(section: str) -> None:
    path = os.path.join(HERE, "SCALING.md")
    text = open(path).read() if os.path.exists(path) else ""
    if BEGIN in text and END in text:
        head, rest = text.split(BEGIN, 1)
        _, tail = rest.split(END, 1)
        text = head + BEGIN + "\n" + section + "\n" + END + tail
    else:
        text = text.rstrip() + "\n\n" + BEGIN + "\n" + section + "\n" + END + "\n"
    with open(path, "w") as fh:
        fh.write(text)


def main() -> None:
    spark = get_spark(app_name="scaling4")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    build_synth_sf1(spark)

    with open(os.path.join(HERE, "SCALING.json")) as fh:
        base = json.load(fh)
    top = sorted(
        base["queries"], key=lambda n: -(base["queries"][n]["t_hi"] or 0)
    )[:TOP_N]
    top = [n for n in top if n in QUERIES]

    sf_dirs = list(tools_scaling.SF_DIRS) + [SYNTH_DIR]
    rows_by_sf = {
        sf: spark.read.parquet(f"{sf}/lineitem.parquet").count() for sf in sf_dirs
    }
    timings = [tools_scaling.run_pass(spark, sf, top) for sf in sf_dirs]

    queries = {}
    for n in top:
        ts = [t[n] for t in timings]
        exp4 = tools_scaling.fit_exponent([rows_by_sf[sf] for sf in sf_dirs], ts)
        exp3 = base["queries"][n]["exponent"]
        ratio = round(ts[-1] / ts[-2], 2) if ts[-2] > 0 else None
        flagged = bool(
            exp4 is not None
            and exp4 > tools_scaling.EXP_LIMIT
            and ts[-1] >= tools_scaling.NOISE_FLOOR_S
        ) or bool(
            ratio is not None
            and ratio
            > tools_scaling.FLAG_FACTOR
            * (rows_by_sf[sf_dirs[-1]] / rows_by_sf[sf_dirs[-2]])
        )
        queries[n] = {
            "t_by_sf": dict(zip(sf_dirs, ts)),
            "exponent_3pt": exp3,
            "exponent_4pt": exp4,
            "ratio_top_pair": ratio,
            "flagged": flagged,
        }

    report = {
        "sf_dirs": sf_dirs,
        "lineitem_rows": rows_by_sf,
        "replicas": REPLICAS,
        "queries": queries,
    }
    with open(os.path.join(HERE, "SCALING4.json"), "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
        fh.write("\n")

    lines = [
        "## 4-point fit (top-10 most expensive, + synthesized sf≈1)",
        "",
        f"`spark-warehouse/synth_sf1/` = the sf0.1 parquet salted-and-"
        f"unioned ×{REPLICAS} (disjoint key universes per replica, FK "
        "fan-ins exactly preserved, nation/region fixed, documents.text "
        "alphabet-rotated per replica so dedup pair generation sees no "
        "synthetic duplicate explosion). lineitem rows "
        + " -> ".join(f"{rows_by_sf[sf]:,}" for sf in sf_dirs)
        + " — one more decade than the 3-point fit; `exp4` is the "
        "least-squares slope over all four points.",
        "",
        "| query | t@sf0.001 | t@sf0.01 | t@sf0.1 | t@sf1 | exp3 | exp4 | flag |",
        "|---|---|---|---|---|---|---|---|",
    ]
    def fmt(x, spec=".2f"):
        # fit_exponent returns None on degenerate timings (non-positive
        # or missing) — render 'n/a' instead of crashing the report
        # AFTER the expensive bench pass (ADVICE r10).
        return format(x, spec) if x is not None else "n/a"

    for n in sorted(queries, key=lambda q: -(queries[q]["exponent_4pt"] or -9)):
        q = queries[n]
        ts = [q["t_by_sf"][sf] for sf in sf_dirs]
        lines.append(
            f"| {n} | {fmt(ts[0])} | {fmt(ts[1])} | {fmt(ts[2])} | {fmt(ts[3])} "
            f"| {fmt(q['exponent_3pt'])} | {fmt(q['exponent_4pt'])} "
            f"| {'**FLAGGED**' if q['flagged'] else ''} |"
        )
    splice_md("\n".join(lines))
    print(
        json.dumps(
            {
                "queries": len(queries),
                "flagged": sum(q["flagged"] for q in queries.values()),
                "rows_sf1": rows_by_sf[SYNTH_DIR],
            }
        )
    )


if __name__ == "__main__":
    main()
