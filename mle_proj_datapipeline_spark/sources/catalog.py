"""Table catalog over a scale-factor directory of parquet tables.

Replaces the reference's filename-encoded partition discovery
(reference: utils/weekly_evaluation.py:343-375 enumerates
``*_week_YYYY_MM_DD`` dirs by regex; utils/model_operations.py:29-35
hand-builds 50 paths). Spark's catalog + Hive partitioning does this
natively; here the testdata is one parquet per table, so the catalog is a
thin loader + view registrar.
"""

from __future__ import annotations

import os
import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_URI_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Column pruning + predicate pushdown reach the
    parquet reader automatically because we return the lazy scan.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark 4 rejects
    (PARQUET_TYPE_ILLEGAL); we read nanos as long and convert to a
    microsecond timestamp with exact integer division (`div`, not `/` —
    double division loses precision above 2^53 ns)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register temp views so the Spark SQL surface works over the same
    tables the DuckDB oracle sees."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def _hadoop_file_listing(path: str) -> list[str]:
    """``path:size:mtime_ms`` per file under ``path`` (recursive,
    sorted), through the active session's Hadoop FileSystem — the same
    listing every other storage-layer operation uses (the
    snapshots.list_subdirs pattern), so hdfs:// and s3a:// sf_dirs
    fingerprint by real file state. Raises when no SparkSession is
    active: a constant fingerprint would pin persisted snapshots to
    stale sources (silent stale serving), strictly worse than failing."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"source_fingerprint({path!r}): path has a URI scheme but no "
            "SparkSession is active to list it through the Hadoop "
            "FileSystem; refusing to return a constant fingerprint"
        )
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return []
    parts = []
    it = fs.listFiles(jpath, True)  # recursive; yields files only
    while it.hasNext():
        st = it.next()
        parts.append(
            f"{st.getPath().toString()}:{st.getLen()}:{st.getModificationTime()}"
        )
    return sorted(parts)


def source_fingerprint(sf_dir: str, table: str) -> str:
    """Content fingerprint of a source table's files (path, size, mtime
    per file) — NO data scan; the staleness key for a persisted index
    or derived snapshot. The testdata parquet is regenerated between
    driver rounds, so state keyed on geometry alone would silently
    serve the OLD corpus.

    Plain local paths stat through the OS (no JVM round-trip, and
    byte-stable with the pre-round-9 fingerprint format, so upgrading
    does not invalidate existing snapshots). Paths with a URI scheme
    (hdfs://, s3a://, file://) list through the session's Hadoop
    FileSystem — before round 9 they hashed to a constant, so
    fingerprint-pinned snapshots never invalidated (ADVICE r7 #2)."""
    import hashlib

    path = os.path.join(sf_dir, f"{table}.parquet")
    if _URI_SCHEME.match(sf_dir):
        parts = _hadoop_file_listing(path)
    else:
        parts = []
        if os.path.isdir(path):
            for dirpath, _, names in sorted(os.walk(path)):
                for n in sorted(names):
                    p = os.path.join(dirpath, n)
                    st = os.stat(p)
                    parts.append(f"{p}:{st.st_size}:{st.st_mtime_ns}")
        elif os.path.exists(path):
            st = os.stat(path)
            parts.append(f"{path}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()
