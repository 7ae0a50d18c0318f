"""Custom Python data source (sources/pysource.py): partition-parallel
reads, cross-partitioning determinism, filter pushdown semantics, and
vanilla-session compatibility (no-pushdown default)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mle_proj_datapipeline_spark.sources.pysource import (
    LANGS,
    register_synthdocs,
)


def _read(spark, **opts):
    r = spark.read.format("synthdocs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_partition_parallel_and_deterministic(spark):
    """The scan schedules one task per id slice, and the SAME rows come
    back under any partition count (pure function of doc_id — retries
    and speculation are safe)."""
    register_synthdocs(spark)
    a = _read(spark, n_docs=400, numPartitions=4)
    assert a.rdd.getNumPartitions() == 4
    assert a.count() == 400
    b = _read(spark, n_docs=400, numPartitions=13)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # every generated lang is from the declared alphabet
    langs = {r["lang"] for r in a.select("lang").distinct().collect()}
    assert langs <= set(LANGS)


def test_filter_pushdown_preserves_semantics(spark):
    """Pushdown variant: lang-equality prunes AT THE SOURCE and returns
    exactly what the unpushed plan returns; non-pushable predicates stay
    with Spark and still apply."""
    register_synthdocs(spark)
    plain = _read(spark, n_docs=600).filter(F.col("lang") == "de")
    pushed = _read(spark, n_docs=600, filterPushdown="true").filter(
        F.col("lang") == "de"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, pushed.collect())
    )
    # residual (unsupported) predicate on top of the pushed one
    both = _read(spark, n_docs=600, filterPushdown="true").filter(
        (F.col("lang") == "de") & (F.col("n_chars") > 100)
    )
    want = [t for t in map(tuple, plain.collect()) if t[4] > 100]
    assert sorted(map(tuple, both.collect())) == sorted(want)


def test_source_joins_with_engine_tables(spark):
    """The Python source composes with ordinary DataFrame ops — group by
    generated lang × source, the shape corpus jobs run."""
    register_synthdocs(spark)
    df = _read(spark, n_docs=300)
    agg = (
        df.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("n_chars").alias("avg_chars"))
    )
    rows = agg.collect()
    assert sum(r["n"] for r in rows) == 300


def test_stream_source_equals_batch(spark, tmp_path):
    """Streaming form: micro-batches by id-range offset; the streamed
    rows must equal the batch read of the same id range (offsets fully
    determine data — the exactly-once replay contract)."""
    import time

    register_synthdocs(spark)
    stream = (
        spark.readStream.format("synthdocs")
        .option("batch_size", 100)
        .option("max_docs", 250)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.table("synth_stream").count() >= 250:
                break
            time.sleep(1)
    finally:
        q.stop()
    got = sorted(map(tuple, spark.table("synth_stream").collect()))
    want = sorted(
        map(tuple, _read(spark, n_docs=250).collect())
    )
    assert got == want and len(got) == 250


# --------------------------------------------------------------------------
# Python data SINK (writer API, two-phase commit)
# --------------------------------------------------------------------------
def test_jsonl_sink_roundtrip_and_manifest(spark, tmp_path):
    from mle_proj_datapipeline_spark.sources.pysink import (
        read_manifest,
        register_jsonlsink,
    )

    register_jsonlsink(spark)
    dest = str(tmp_path / "out")
    df = spark.range(0, 100, 1, 4).selectExpr(
        "id", "concat('doc-', id) AS name", "CAST(id * 1.5 AS DOUBLE) AS score"
    )
    df.write.format("jsonlsink").option("path", dest).mode("append").save()

    man = read_manifest(dest)
    assert man["total_rows"] == 100
    assert sum(f["rows"] for f in man["files"]) == 100
    # only committed part files + the manifest are visible; no staging
    import os

    names = sorted(os.listdir(dest))
    assert "_staging" not in names
    assert set(f["file"] for f in man["files"]) == {
        n for n in names if n.endswith(".jsonl")
    }

    back = spark.read.json(dest + "/*.jsonl")
    assert back.count() == 100
    got = {(r["id"], r["name"], r["score"]) for r in back.collect()}
    want = {(r["id"], r["name"], r["score"]) for r in df.collect()}
    assert got == want


def test_jsonl_sink_failed_job_leaves_nothing_visible(spark, tmp_path):
    """Abort path: a task failure during write must leave the
    destination with no manifest and no committed part files —
    write-never-happened semantics."""
    import os

    import pyspark.sql.functions as F
    from pyspark.sql.utils import PythonException

    from mle_proj_datapipeline_spark.sources.pysink import register_jsonlsink

    register_jsonlsink(spark)
    dest = str(tmp_path / "out_fail")

    @F.udf("long")
    def boom(x):
        if x == 37:
            raise ValueError("injected failure")
        return x

    df = spark.range(0, 100, 1, 4).select(boom("id").alias("id"))
    try:
        df.write.format("jsonlsink").option("path", dest).mode("append").save()
        raise AssertionError("write should have failed")
    except Exception as ex:  # Py4J wraps the executor error
        assert "injected failure" in str(ex)

    assert not os.path.exists(os.path.join(dest, "_MANIFEST.json"))
    assert not [
        n for n in (os.listdir(dest) if os.path.isdir(dest) else []) if n.endswith(".jsonl")
    ]


def test_jsonl_sink_append_merges_manifest(spark, tmp_path):
    """A second .mode('append').save() must MERGE the prior manifest's
    file list — earlier committed part files stay visible to
    manifest-respecting readers (ADVICE r5)."""
    from mle_proj_datapipeline_spark.sources.pysink import (
        read_manifest,
        register_jsonlsink,
    )

    register_jsonlsink(spark)
    dest = str(tmp_path / "out_append2")
    spark.range(0, 40, 1, 2).write.format("jsonlsink").option(
        "path", dest
    ).mode("append").save()
    first = read_manifest(dest)
    spark.range(40, 100, 1, 2).write.format("jsonlsink").option(
        "path", dest
    ).mode("append").save()

    man = read_manifest(dest)
    assert man["total_rows"] == 100
    assert {f["file"] for f in first["files"]} <= {f["file"] for f in man["files"]}
    back = spark.read.json(dest + "/*.jsonl")
    assert back.count() == 100
    assert back.agg(F.min("id"), F.max("id")).collect()[0][0:2] == (0, 99)


def test_jsonl_sink_overwrite_removes_prior_files(spark, tmp_path):
    """.mode('overwrite') must delete the previously committed part
    files — no stale data beside the new table (ADVICE r5)."""
    import os

    from mle_proj_datapipeline_spark.sources.pysink import (
        read_manifest,
        register_jsonlsink,
    )

    register_jsonlsink(spark)
    dest = str(tmp_path / "out_over")
    spark.range(0, 40, 1, 2).write.format("jsonlsink").option(
        "path", dest
    ).mode("append").save()
    old_files = {f["file"] for f in read_manifest(dest)["files"]}
    spark.range(1000, 1010, 1, 2).write.format("jsonlsink").option(
        "path", dest
    ).mode("overwrite").save()

    man = read_manifest(dest)
    assert man["total_rows"] == 10
    on_disk = {n for n in os.listdir(dest) if n.endswith(".jsonl")}
    assert on_disk == {f["file"] for f in man["files"]}
    assert not (old_files & on_disk)
    assert spark.read.json(dest + "/*.jsonl").agg(F.min("id")).collect()[0][0] == 1000


def test_jsonl_sink_concurrent_appends_keep_all_files(tmp_path):
    """ADVICE r6: append-mode commit is a read-modify-write of the
    manifest; two concurrent committers must serialize (fcntl lock) so
    neither's part files vanish from the final manifest. Drives the
    writer's commit() directly from racing threads with pre-staged
    files — the exact interleaving the lock exists for."""
    import json
    import os
    import threading

    from mle_proj_datapipeline_spark.sources.pysink import (
        MANIFEST,
        STAGING,
        JsonlCommit,
        JsonlSinkWriter,
    )

    path = str(tmp_path / "sink")
    os.makedirs(os.path.join(path, STAGING), exist_ok=True)

    def stage(name: str, rows: int) -> JsonlCommit:
        staged = os.path.join(path, STAGING, name)
        with open(staged, "w") as fh:
            for i in range(rows):
                fh.write(json.dumps({"i": i}) + "\n")
        return JsonlCommit(staged=staged, rows=rows)

    msgs = [stage(f"part-{k:02d}.jsonl", k + 1) for k in range(8)]
    barrier = threading.Barrier(4)
    errors = []

    def committer(batch):
        w = JsonlSinkWriter({"path": path}, overwrite=False)
        barrier.wait()
        try:
            w.commit(batch)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [
        threading.Thread(target=committer, args=(msgs[k * 2 : k * 2 + 2],))
        for k in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    with open(os.path.join(path, MANIFEST)) as fh:
        manifest = json.load(fh)
    names = [f["file"] for f in manifest["files"]]
    assert names == sorted(f"part-{k:02d}.jsonl" for k in range(8)), names
    assert manifest["total_rows"] == sum(range(1, 9))
    for n in names:
        assert os.path.exists(os.path.join(path, n))
