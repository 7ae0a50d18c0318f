"""Versioned snapshot tables on plain parquet — lakehouse-lite.

The reference's sinks are overwrite-in-place parquet directories
(utils/process_silver_tables.py:85): a failed rewrite corrupts the
table and history is gone. This module layers snapshot isolation and
time travel over parquet with nothing but immutable data files and tiny
JSON manifests (the container ships no Delta/Iceberg jars; the public
designs of both inform the layout):

    table_root/
      _snapshots/v00000017.json   one manifest per committed version:
                                  {version, timestamp, parent, files[]}
      data/c17-<uuid>/part-*.parquet   immutable per-commit file sets

- A reader resolves exactly one manifest (latest, by version, or
  latest-at-timestamp) and scans only the files it lists — data files
  are never mutated, so every historical version stays readable until
  expired.
- A writer stages data files first, then commits by CLAIMING its
  version number (exclusive create of .vNNN.claim — the CAS) and
  renaming the manifest into place; a crash before the rename leaves
  the table untouched (readers never see half-written versions).
  Concurrent committers serialize: a losing writer re-reads the history
  and retries on the next version — no silent manifest clobber (the
  pre-CAS hazard: local-FS rename overwrites an existing destination).
  Orphaned claims from crashed writers are probed past only once the
  claim file ages beyond CLAIM_STALL_SECONDS (a young orphan makes
  write_snapshot fail fast after ~8s of retries — callers re-run the
  job — never fork past a possibly-live holder). Two fences close the
  probed-past race: a pre-rename parent re-check, and a post-commit
  fork check that detects a sibling lineage (a commit the history
  skipped, or one that skipped us), deletes its OWN manifest, and
  retries on fresh history. Residual caveat vs a real table format:
  version numbers can skip after a writer crash, and during a fork
  repair a just-committed version may be briefly visible before its
  writer retracts it.
- OVERWRITE lists only new files; APPEND lists parent files + new.
  MERGE (upsert) and COMPACT (small-file bin-packing) are rewrites
  committed as new versions, so both are time-travel-safe.
- All filesystem access goes through the Hadoop FileSystem API of the
  active session, so the layout works unchanged on HDFS/S3A/local.

Scale notes (100 TB): manifests hold file paths only (KBs per commit);
the expensive part of a snapshot table — per-file column stats for
pruning — is delegated to parquet footers, which Spark already reads.
`compact` exists because streaming/incremental commits accrete small
files and 100 TB scans pay per-file open costs; `expire` bounds
storage growth by dropping manifests and any file no live version
references.
"""

from __future__ import annotations

import json
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

SNAP_DIR = "_snapshots"

# A commit claim younger than this is treated as a possibly-live writer
# (GC pause, slow FS) and never probed past; only older claims are
# declared crashed. Deliberately much longer than any plausible pause —
# the cost is that write_snapshot raises after its in-process retry
# budget (~8s) while a young orphan blocks, and the JOB retries later;
# the cost of probing early is a forked lineage. The post-commit fork
# check (_fork_conflict) is the second fence for the residual race.
CLAIM_STALL_SECONDS = 300.0

# In-process commit retry budget: 40 attempts x 0.2s backoff (~8s plus
# history reads) rides out normal contention; a blocking young orphan
# fails fast past this and the JOB retries.
_COMMIT_ATTEMPTS = 40


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _jpath(spark: SparkSession, path: str):
    return spark._jvm.org.apache.hadoop.fs.Path(path)


def _create_exclusive(spark: SparkSession, path: str) -> bool:
    """Atomic create-if-absent — the CAS primitive for commit claims.

    Hadoop's LocalFileSystem.create(path, overwrite=False) checks
    existence THEN creates (TOCTOU — two racing writers can both
    "win"), so for file:// / schemeless paths this drops to
    java.io.File.createNewFile, which is O_CREAT|O_EXCL. On HDFS the
    namenode create-without-overwrite is atomic server-side. On S3A it
    is NOT by default: Hadoop implements create(overwrite=false) as a
    HEAD-then-PUT existence check (the same TOCTOU), so S3A paths are
    refused unless conditional creates (If-None-Match, S3A's
    fs.s3a.create.conditional.enabled) are turned on."""
    fs, jvm = _fs(spark, path)
    jpath = _jpath(spark, path)
    fs.mkdirs(jpath.getParent())
    scheme = jpath.toUri().getScheme()
    if scheme in (None, "file"):
        return bool(jvm.java.io.File(jpath.toUri().getPath()).createNewFile())
    if scheme == "s3a":
        conf = spark._jsc.hadoopConfiguration()
        if (conf.get("fs.s3a.create.conditional.enabled") or "").lower() != "true":
            raise RuntimeError(
                "snapshot commits on s3a:// require conditional creates "
                "(set fs.s3a.create.conditional.enabled=true); plain S3A "
                "create(overwrite=false) is HEAD-then-PUT and cannot "
                "serialize concurrent committers"
            )
    try:
        out = fs.create(jpath, False)
        out.close()
        return True
    except Exception as ex:
        if "Exists" in type(ex).__name__ or "exists" in str(ex).lower():
            return False
        raise


def _fork_conflict(snaps: list[dict], version: int, parent: int | None) -> bool:
    """After committing ``version`` (built on ``parent``), decide from
    the re-read history whether the commit forked the lineage:

    - a committed manifest sits BETWEEN our parent and our version →
      we probed past a claim whose writer actually completed — our
      manifest's file list (append mode) omits its files;
    - a LATER manifest's parent is below our version → that writer
      committed without seeing us — its lineage omits OUR files.

    Either way the committer must retract its own manifest and retry on
    fresh history (write_snapshot does). Pure function for testability."""
    pv = parent if parent is not None else 0
    for s in snaps:
        v = s["version"]
        if v == version:
            continue
        if pv < v < version:
            return True
        sp = s.get("parent") or 0
        if v > version and sp < version:
            return True
    return False


def _claim_age(spark: SparkSession, path: str) -> float:
    """Seconds since the claim file at ``path`` was written; -1.0 if it
    does not exist (the version is claimable)."""
    import time as _time

    fs, _ = _fs(spark, path)
    jpath = _jpath(spark, path)
    try:
        if not fs.exists(jpath):
            return -1.0
        return _time.time() - fs.getFileStatus(jpath).getModificationTime() / 1000.0
    except Exception as ex:
        # Deleted between exists() and getFileStatus() == claim released
        # — genuinely claimable. Anything else (a transient FS error)
        # must NOT read as claimable: a second committer would steal an
        # ACTIVE claim. The fork-conflict retraction downstream would
        # eventually repair the double-commit, but failing here is
        # strictly cheaper than repairing it.
        if "FileNotFound" in type(ex).__name__ or "FileNotFound" in str(ex):
            return -1.0
        raise


def _write_text(spark: SparkSession, path: str, text: str) -> None:
    fs, _ = _fs(spark, path)
    out = fs.create(_jpath(spark, path), True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _read_text(spark: SparkSession, path: str) -> str:
    fs, jvm = _fs(spark, path)
    stream = fs.open(_jpath(spark, path))
    try:
        reader = jvm.java.io.BufferedReader(jvm.java.io.InputStreamReader(stream, "UTF-8"))
        lines = []
        line = reader.readLine()
        while line is not None:
            lines.append(line)
            line = reader.readLine()
        return "\n".join(lines)
    finally:
        stream.close()


def list_subdirs(spark: SparkSession, path: str) -> list[str]:
    """Names of the immediate child DIRECTORIES of ``path`` ([] when
    absent), via the session's Hadoop FileSystem — never os.listdir,
    so partitioned-state roots on hdfs://, s3a://, etc. resolve the
    same way every other storage-layer listing here does."""
    fs, _ = _fs(spark, path)
    jpath = _jpath(spark, path)
    if not fs.exists(jpath):
        return []
    return sorted(
        st.getPath().getName() for st in fs.listStatus(jpath) if st.isDirectory()
    )


def delete_dir(spark: SparkSession, path: str) -> bool:
    """Recursive delete through the Hadoop FileSystem (idempotent;
    False when the path was already absent)."""
    fs, _ = _fs(spark, path)
    jpath = _jpath(spark, path)
    if not fs.exists(jpath):
        return False
    return bool(fs.delete(jpath, True))


def _list(spark: SparkSession, path: str, suffix: str) -> list[str]:
    fs, _ = _fs(spark, path)
    jpath = _jpath(spark, path)
    if not fs.exists(jpath):
        return []
    return sorted(
        st.getPath().toString()
        for st in fs.listStatus(jpath)
        if st.isFile() and st.getPath().getName().endswith(suffix)
    )


def history(spark: SparkSession, root: str) -> list[dict]:
    """All committed manifests, oldest first."""
    return [
        json.loads(_read_text(spark, p))
        for p in _list(spark, f"{root}/{SNAP_DIR}", ".json")
    ]


def _resolve(
    spark: SparkSession, root: str, version: int | None, as_of: float | None
) -> dict:
    snaps = history(spark, root)
    if not snaps:
        raise FileNotFoundError(f"no snapshots under {root}")
    if version is not None:
        for s in snaps:
            if s["version"] == version:
                return s
        raise ValueError(f"version {version} not found (have {[s['version'] for s in snaps]})")
    if as_of is not None:
        live = [s for s in snaps if s["timestamp"] <= as_of]
        if not live:
            raise ValueError(f"no snapshot at or before timestamp {as_of}")
        return live[-1]
    return snaps[-1]


def write_snapshot(
    df: DataFrame,
    root: str,
    mode: str = "overwrite",
    timestamp: float | None = None,
    meta: dict | None = None,
) -> int:
    """Commit ``df`` as the next version. ``mode='overwrite'`` replaces
    the logical table; ``'append'`` adds to it. Data files stage into a
    fresh per-commit directory; the version becomes visible only at the
    final atomic manifest rename. Returns the committed version.

    ``timestamp`` orders versions for time travel; pass an explicit
    event/processing time for reproducible pipelines (defaults to wall
    clock)."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    spark = df.sparkSession

    # Stage the immutable data files ONCE, outside the commit loop.
    commit_dir = f"{root}/data/c{uuid.uuid4().hex[:12]}"
    df.write.mode("errorifexists").parquet(commit_dir)
    new_files = _list(spark, commit_dir, ".parquet")

    # Optimistic-concurrency commit (the CAS a real table format gives):
    # a writer CLAIMS its version number by exclusive-creating
    # .vNNN.claim (atomic create-if-absent on HDFS; create(overwrite=
    # False) on local), writes the manifest to a temp file, and renames
    # it into place — the rename destination can't exist because only
    # the claim owner writes that version. A losing writer re-reads the
    # history and retries on the next version, so concurrent committers
    # serialize instead of silently overwriting each other's manifest
    # (local-FS rename DOES clobber an existing destination — the
    # pre-CAS lost-commit hazard).
    #
    # Orphaned claims (a claimer crashed between claim and rename) are
    # probed past only when the claim FILE is older than
    # CLAIM_STALL_SECONDS — a live-but-slow holder (GC pause, slow FS)
    # must not be misclassified as crashed, because committing a sibling
    # version from a stale parent forks the lineage (append mode would
    # drop the concurrent winner's files). As a second fence, the parent
    # is re-verified against history immediately before the manifest
    # rename: a writer that stalled long enough to be probed past
    # abandons its claim and retries on a fresh parent instead of
    # committing the fork. `expire` sweeps stale claims; version numbers
    # may skip after a crash — manifests are ordered by version, readers
    # are indifferent.
    fs, _ = _fs(spark, root)
    for _attempt in range(_COMMIT_ATTEMPTS):
        snaps = history(spark, root)
        parent = snaps[-1] if snaps else None
        latest = parent["version"] if parent else 0
        version = latest + 1
        # Skip versions whose claim is demonstrably abandoned (no
        # manifest, claim file old). A younger blocking claim means a
        # possibly-live writer: wait for it rather than fork.
        while _claim_age(spark, f"{root}/{SNAP_DIR}/.v{version:08d}.claim") > CLAIM_STALL_SECONDS:
            version += 1
        if timestamp is None:
            # default wall clock is re-read per attempt so a losing
            # writer can't stamp behind the winner it retries after
            import time as _time

            ts = _time.time()
            if parent:
                ts = max(ts, parent["timestamp"])
        else:
            ts = timestamp
            if parent and ts < parent["timestamp"]:
                raise ValueError(
                    f"timestamp {ts} precedes parent snapshot {parent['timestamp']}"
                )
        files = new_files
        if mode == "append" and parent:
            files = sorted(set(parent["files"]) | set(new_files))
        claim = f"{root}/{SNAP_DIR}/.v{version:08d}.claim"
        if not _create_exclusive(spark, claim):
            # claim taken — another writer owns this version; back off
            import time as _time

            _time.sleep(0.2)
            continue
        manifest = {
            "version": version,
            "timestamp": ts,
            "parent": parent["version"] if parent else None,
            "mode": mode,
            "files": files,
            "meta": meta or {},
        }
        # Pre-rename fence: if another commit landed after `parent` was
        # read (possible only when this writer stalled long enough to be
        # probed past as an orphan), the staged manifest references a
        # stale parent — renaming it would fork the lineage and, in
        # append mode, drop the concurrent winner's files. Abandon the
        # claim (swept by `expire`) and retry on the fresh history.
        cur = history(spark, root)
        if (cur[-1]["version"] if cur else 0) != latest:
            continue
        tmp = f"{root}/{SNAP_DIR}/.v{version:08d}-{uuid.uuid4().hex[:8]}.json.tmp"
        final = f"{root}/{SNAP_DIR}/v{version:08d}.json"
        _write_text(spark, tmp, json.dumps(manifest))
        if not fs.rename(_jpath(spark, tmp), _jpath(spark, final)):
            raise RuntimeError(f"commit rename failed for version {version}")
        # Post-commit fork check: the pre-rename fence is itself
        # check-then-act, so a >CLAIM_STALL-stalled writer waking inside
        # another committer's fence→rename window can still produce
        # sibling lineages. Both siblings re-read history AFTER their
        # rename; whichever observes the conflict (at least the later
        # renamer must) retracts its OWN manifest and retries on fresh
        # history — appends are never silently dropped.
        if _fork_conflict(history(spark, root), version, parent["version"] if parent else None):
            fs.delete(_jpath(spark, final), False)
            continue
        # The claim file INTENTIONALLY outlives the commit: deleting it
        # here would let a retrying loser re-claim this version and die
        # on the rename. `expire` sweeps claims <= the latest commit.
        return version
    raise RuntimeError(
        f"could not commit to {root} after {_COMMIT_ATTEMPTS} attempts "
        "(writer storm, or a young orphaned claim — re-run the job; claims "
        f"older than {CLAIM_STALL_SECONDS:.0f}s are declared dead)"
    )


def read_snapshot(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    as_of: float | None = None,
) -> DataFrame:
    """Read one table version: latest by default, a pinned ``version``,
    or time travel to the latest snapshot with timestamp ≤ ``as_of``."""
    snap = _resolve(spark, root, version, as_of)
    if not snap["files"]:
        raise ValueError(f"snapshot v{snap['version']} is empty")
    return spark.read.parquet(*snap["files"])


def merge_snapshot(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    keys: list[str],
    order_col: str | None = None,
    timestamp: float | None = None,
) -> int:
    """MERGE INTO as a snapshot commit: upsert ``updates`` into the
    latest version (operators/joins.merge_upsert semantics) and commit
    the result as a new version — the pre-merge table remains readable
    at its old version/timestamp."""
    from mle_proj_datapipeline_spark.operators.joins import merge_upsert

    merged = merge_upsert(read_snapshot(spark, root), updates, keys, order_col)
    return write_snapshot(merged, root, mode="overwrite", timestamp=timestamp)


def compact(
    spark: SparkSession,
    root: str,
    target_files: int,
    timestamp: float | None = None,
) -> int:
    """Bin-pack the latest version into ``target_files`` data files and
    commit as a new version (rows unchanged). Run after many small
    incremental commits: scan cost at scale is dominated by per-file
    opens, and time travel to pre-compaction versions still works
    because the small files aren't touched until ``expire``."""
    latest = read_snapshot(spark, root)
    return write_snapshot(
        latest.coalesce(target_files), root, mode="overwrite", timestamp=timestamp
    )


def expire(spark: SparkSession, root: str, keep_last: int) -> list[int]:
    """Drop all but the last ``keep_last`` versions and delete data
    files no surviving version references (VACUUM). Returns expired
    version numbers."""
    snaps = history(spark, root)
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    dead, live = snaps[:-keep_last], snaps[-keep_last:]
    if not dead:
        return []
    keep_files = {f for s in live for f in s["files"]}
    fs, _ = _fs(spark, root)
    for s in dead:
        for f in s["files"]:
            if f not in keep_files:
                fs.delete(_jpath(spark, f), False)
        fs.delete(_jpath(spark, f"{root}/{SNAP_DIR}/v{s['version']:08d}.json"), False)
    # Sweep orphaned commit claims (a writer that crashed between claim
    # and manifest rename) at or below the latest committed version —
    # claims above it may belong to an in-flight writer.
    latest = live[-1]["version"]
    for p in _list(spark, f"{root}/{SNAP_DIR}", ".claim"):
        name = p.rsplit("/", 1)[-1]
        try:
            v = int(name[2:10])
        except ValueError:
            continue
        if v <= latest:
            fs.delete(_jpath(spark, p), False)
    return [s["version"] for s in dead]


def snapshot_changes(
    spark: SparkSession,
    root: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Change-data-feed between two committed versions: the table's rows
    plus a ``_change_type`` column ('insert' | 'delete'). An update under
    overwrite/MERGE commits appears as delete(old) + insert(new) — the
    same convention as lake-format CDF readers.

    Scale shape, in order of preference:
    - **Append fast path**: when every commit in (from, to] is
      append-mode, the change set is EXACTLY the data files added along
      the chain (manifest set difference) — the reader scans only the
      delta files, never the table. This is what makes incremental
      consumers (foreachBatch sinks, downstream rollups) O(delta) at
      100 TB.
    - **General path** (any overwrite in the chain): full-row symmetric
      difference via ``exceptAll`` both ways — multiplicity-preserving,
      shuffles on the row hash. Correct for any commit sequence, cost is
      O(both versions); the fast path exists so the common append-only
      case never pays it.
    """
    snaps = {s["version"]: s for s in history(spark, root)}
    if from_version not in snaps:
        raise ValueError(f"version {from_version} not found under {root}")
    to_version = to_version if to_version is not None else max(snaps)
    if to_version not in snaps:
        raise ValueError(f"version {to_version} not found under {root}")
    if to_version < from_version:
        raise ValueError(f"to_version {to_version} < from_version {from_version}")
    if to_version == from_version:
        base = spark.read.parquet(*snaps[from_version]["files"])
        return base.limit(0).withColumn("_change_type", F.lit("insert"))

    chain = [
        snaps[v] for v in sorted(snaps) if from_version < v <= to_version
    ]
    # Versions may skip after crashed claims; the chain is every commit
    # in the interval. Append-only iff no overwrite-mode commit inside.
    if all(s["mode"] == "append" for s in chain):
        old_files = set(snaps[from_version]["files"])
        delta = [f for f in snaps[to_version]["files"] if f not in old_files]
        if not delta:
            base = spark.read.parquet(*snaps[from_version]["files"])
            return base.limit(0).withColumn("_change_type", F.lit("insert"))
        return spark.read.parquet(*delta).withColumn(
            "_change_type", F.lit("insert")
        )

    old = spark.read.parquet(*snaps[from_version]["files"])
    new = spark.read.parquet(*snaps[to_version]["files"])
    inserted = new.exceptAll(old).withColumn("_change_type", F.lit("insert"))
    deleted = old.exceptAll(new).withColumn("_change_type", F.lit("delete"))
    return inserted.unionByName(deleted)


def zorder_value(cols: list[str], bits: int = 12) -> "Column":
    """Morton (z-curve) key: interleave the low ``bits`` bits of the
    given integer columns — bit j of column i lands at position
    j*len(cols)+i. Rows close on the curve are close in EVERY listed
    dimension, which is what makes multi-column min/max pruning work.

    Interleaved positions must stay inside a signed 64-bit key:
    ``bits * len(cols) <= 63`` or the high bits overflow negative and
    the curve (hence min/max pruning) silently scrambles."""
    import pyspark.sql.functions as F

    if bits * len(cols) > 63:
        raise ValueError(
            f"zorder_value: bits ({bits}) * len(cols) ({len(cols)}) must be <= 63 "
            "to fit a signed 64-bit Morton key; reduce bits or cluster columns"
        )
    terms = [
        f"((((`{c}`) >> {j}) & 1) << {j * len(cols) + i})"
        for i, c in enumerate(cols)
        for j in range(bits)
    ]
    return F.expr("(" + " + ".join(terms) + ")")


def cluster_snapshot(
    spark: SparkSession,
    root: str,
    cols: list[str],
    bits: int = 12,
    n_files: int = 8,
    timestamp: float | None = None,
) -> int:
    """Z-ORDER the latest version and commit the re-clustered layout as
    a new version (rows unchanged — like ``compact``, but the file
    layout now serves MULTI-column predicates: each column is min-max
    scaled to ``bits`` bits, rows sort by the interleaved Morton key,
    and ``repartitionByRange`` gives files disjoint z-ranges, so every
    listed column's per-file min/max spans shrink and parquet
    footer/row-group pruning can skip files for predicates on ANY of
    the clustered columns, not just the first sort key.

    Scale: one range-shuffle of the table (same cost class as compact);
    the min/max scan is a 1-row aggregate. Run it like compaction —
    after heavy appends, not per commit."""
    import pyspark.sql.functions as F

    # Keep the interleaved key inside a signed 64-bit value: with many
    # cluster columns, auto-reduce per-column bits instead of failing.
    bits = min(bits, 63 // max(len(cols), 1))
    if bits < 1:
        raise ValueError("cluster_snapshot: too many cluster columns for a 63-bit key")
    df = read_snapshot(spark, root)
    stats = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    scaled = df
    zcols = []
    top = (1 << bits) - 1
    for c in cols:
        lo, hi = stats[f"lo_{c}"], stats[f"hi_{c}"]
        span = (hi - lo) or 1
        zc = f"__zs_{c}"
        scaled = scaled.withColumn(
            zc,
            F.floor((F.col(c).cast("double") - float(lo)) / float(span) * top).cast("long"),
        )
        zcols.append(zc)
    out = (
        scaled.withColumn("__z", zorder_value(zcols, bits))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *zcols)
    )
    return write_snapshot(out, root, mode="overwrite", timestamp=timestamp)


def materialize_frame(df: DataFrame, snapshot_root: str | None = None) -> DataFrame:
    """Cut lineage on an intermediate frame (signatures, buckets, CC
    edge sets) that multiple plan arms or iterations re-read.

    Default: ``localCheckpoint`` — cheap, but executor-local; a lost
    executor invalidates the blocks. With ``snapshot_root``: commit as a
    snapshot version and read back — the DURABLE path for long
    multi-stage cluster jobs (fault-tolerant, resumable, shareable
    across queries)."""
    if snapshot_root:
        write_snapshot(df, snapshot_root, mode="overwrite")
        return read_snapshot(df.sparkSession, snapshot_root)
    return df.localCheckpoint()


def maintain_rollup(
    spark: SparkSession,
    source_root: str,
    view_root: str,
    keys: list[str],
    sum_cols: list[str],
    timestamp: float | None = None,
) -> dict:
    """Incremental view maintenance for a distributive rollup
    (count + sums by ``keys``) over an append-only snapshot source.

    Manifests make the delta computable at FILE granularity: the view's
    last commit records which source files it has absorbed, so a
    maintenance pass scans only files added since — partial-aggregates
    the delta, merges it with the current view state (group-by over
    view ∪ delta-partials: sums and counts are mergeable), and commits
    the view as a new snapshot. Cost is O(new data + |view|), never
    O(source history).

    If the source advanced by anything other than appends (overwrite,
    compaction, expiry), the file delta is not a data delta — the view
    is rebuilt from the full source (detected, returned as
    ``mode='rebuild'``). Algebraic finals (avg = sum/n) belong in a
    reader view; holistic aggregates (median, distinct) are not
    maintainable this way and must recompute.

    Returns {'mode': 'noop'|'delta'|'rebuild', 'scanned_files': int,
    'version': int|None}.
    """
    import pyspark.sql.functions as F

    src = history(spark, source_root)
    if not src:
        raise FileNotFoundError(f"no snapshots under {source_root}")
    latest = src[-1]
    view_hist = history(spark, view_root)
    absorbed = set(view_hist[-1]["meta"].get("source_files", [])) if view_hist else set()

    cur_files = set(latest["files"])
    new_files = sorted(cur_files - absorbed)
    removed = absorbed - cur_files

    def partials(df):
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n"), *[F.sum(c).alias(f"sum_{c}") for c in sum_cols]
        )

    meta = {"source_files": sorted(cur_files), "source_version": latest["version"]}
    if removed or (view_hist and not new_files and cur_files != absorbed):
        merged = partials(read_snapshot(spark, source_root))
        v = write_snapshot(merged, view_root, timestamp=timestamp, meta=meta)
        return {"mode": "rebuild", "scanned_files": len(cur_files), "version": v}
    if view_hist and not new_files:
        return {"mode": "noop", "scanned_files": 0, "version": None}

    delta = partials(spark.read.parquet(*new_files))
    if view_hist:
        prev = read_snapshot(spark, view_root)
        merged = prev.unionByName(delta).groupBy(*keys).agg(
            F.sum("n").alias("n"),
            *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
        )
    else:
        merged = delta
    v = write_snapshot(merged, view_root, timestamp=timestamp, meta=meta)
    return {"mode": "delta", "scanned_files": len(new_files), "version": v}
