"""Custom Python data SINK (Spark 4 ``pyspark.sql.datasource`` writer
API) — the write-side twin of sources/pysource.py.

``df.write.format("jsonlsink").option("path", dir).save()`` writes
JSONL part files under a TWO-PHASE commit:

- ``write(iterator)`` (executor, per task) streams rows to a uniquely
  named staging file (``_staging/part-<uuid>.jsonl``) and returns a
  commit message carrying the staging name + row count. A retried or
  speculative task leaves an orphan staging file that no commit
  message references.
- ``commit(messages)`` (driver) renames ONLY the files named in commit
  messages into the table root and writes ``_MANIFEST.json`` (file
  list + per-file and total row counts) — readers that respect the
  manifest never see uncommitted or orphaned data. Save modes are
  honored at the manifest level: ``append`` merges the prior
  manifest's file list, ``overwrite`` deletes the prior manifest's
  part files before publishing the new list.
- ``abort(messages)`` removes the staging directory: a failed job
  leaves the destination without a manifest and with no visible part
  files — write-never-happened semantics.

This is the same stage-then-commit discipline as sources/snapshots.py,
expressed through the DataSourceWriter protocol. Scale notes: one
staging file per task (no driver data movement — the driver handles
only renames and counts); on object stores swap the rename for a
manifest-only commit (the file list IS the table, as in snapshots.py).
Local/driver-shared filesystem is assumed here, as with every local
sink in this repo.
"""

from __future__ import annotations

import dataclasses
import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

MANIFEST = "_MANIFEST.json"
STAGING = "_staging"


@dataclasses.dataclass
class JsonlCommit(WriterCommitMessage):
    staged: str
    rows: int


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool) -> None:
        self.path = str(options["path"])
        self.overwrite = bool(overwrite)

    def write(self, iterator) -> JsonlCommit:
        os.makedirs(os.path.join(self.path, STAGING), exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        staged = os.path.join(self.path, STAGING, name)
        n = 0
        with open(staged, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str, sort_keys=True))
                fh.write("\n")
                n += 1
        return JsonlCommit(staged=staged, rows=n)

    def commit(self, messages) -> None:
        """Honor the save mode (ADVICE r5): ``append`` MERGES the prior
        manifest's file list so earlier commits stay visible to
        manifest-respecting readers; ``overwrite`` DELETES the prior
        manifest's part files so no stale data sits beside the new
        table. Either way the manifest swap is the atomic commit
        point.

        Append-mode commit is a read-modify-write of the prior
        manifest, so concurrent appends to the same path are
        serialized with an fcntl lock held across the read+write
        (ADVICE r6): without it two jobs would read the same prior
        file list and the second manifest write would silently orphan
        the first job's freshly committed part files. The lock rides
        the local / driver-shared filesystem this sink already assumes
        (module docstring); on object stores the whole commit becomes
        a conditional manifest PUT instead."""
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, "_MANIFEST.lock"), "w") as lock_fh:
            try:
                import fcntl

                fcntl.flock(lock_fh, fcntl.LOCK_EX)
            except ImportError:  # non-POSIX: single-writer assumption stands
                pass
            self._commit_locked(messages)

    def _commit_locked(self, messages) -> None:
        manifest_path = os.path.join(self.path, MANIFEST)
        prior: list[dict] = []
        if os.path.exists(manifest_path):
            with open(manifest_path) as fh:
                prior = json.load(fh).get("files", [])
        files = []
        for m in messages:
            final = os.path.join(self.path, os.path.basename(m.staged))
            os.replace(m.staged, final)
            files.append({"file": os.path.basename(m.staged), "rows": m.rows})
        new_names = {f["file"] for f in files}
        if self.overwrite:
            for f in prior:
                if f["file"] not in new_names:
                    try:
                        os.remove(os.path.join(self.path, f["file"]))
                    except OSError:
                        pass
        else:
            files = [f for f in prior if f["file"] not in new_names] + files
        files.sort(key=lambda f: f["file"])
        with open(manifest_path, "w") as fh:
            json.dump(
                {"files": files, "total_rows": sum(f["rows"] for f in files)},
                fh,
                indent=1,
                sort_keys=True,
            )
        self._clean_staging(messages)

    def abort(self, messages) -> None:
        self._clean_staging(messages)

    def _clean_staging(self, messages) -> None:
        """Remove only THIS job's staged files (a concurrent appender's
        staged-but-uncommitted files may sit in the same _staging dir
        while it waits on the manifest lock — wiping the whole dir
        would destroy its committed-message files). Orphans from
        retried/speculative tasks stay behind harmlessly: _staging is
        underscore-prefixed so no reader sees it, and the rmdir
        reclaims the dir once it drains."""
        staging = os.path.join(self.path, STAGING)
        for m in messages or []:
            if m is None:
                continue
            try:
                os.remove(m.staged)
            except OSError:
                pass
        try:
            os.rmdir(staging)
        except OSError:
            pass


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonlsink").option("path", d).mode("append").save()``."""

    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def writer(self, schema: StructType, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options, overwrite)


def register_jsonlsink(spark) -> None:
    """Idempotently register the sink on a session."""
    spark.dataSource.register(JsonlSinkDataSource)


def read_manifest(path: str) -> dict:
    """The committed file list — what a manifest-respecting reader
    trusts (uncommitted/orphaned part files are invisible to it)."""
    with open(os.path.join(path, MANIFEST)) as fh:
        return json.load(fh)
