"""Dump .explain("formatted") for the headline + weak-mark queries to
plans/r13/<query>_<tag>.txt (tag = before/after). Run:
    python tools_plans_r13.py before [name ...]
Plans are captured against sf0.1 so scan stats match the bench."""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    qs = entry.queries()
    names = list(bench.HEADLINE) + [
        "customer_golden_records",
        "fuzzy_name_pairs",
        "supplier_triangles",
        "approx_order_cardinalities",
    ]
    # Explicitly-named queries outside the headline set are honored too
    # (any registered query can be a r12 optimization target).
    names += [n for n in only if n in qs and n not in names]
    names = [n for n in names if n in qs and (not only or n in only)]
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            print("ok", name)
        except Exception as exc:  # noqa: BLE001 - keep dumping the rest
            print("ERR", name, exc)


if __name__ == "__main__":
    main()
