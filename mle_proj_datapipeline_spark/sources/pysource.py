"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic-documents generator with partition-parallel
reads and native filter pushdown.

Why it exists: the engine's other sources are files (CSV/JSONL/parquet)
— this demonstrates the remaining source surface a 100 TB pipeline
needs: programmatic sources (feature services, internal APIs, synthetic
load generators) that plug into the SAME scan planning as file sources.
The generator doubles as the corpus-scale load source for tests — any
row count, zero disk.

Scale shape:
- ``partitions()`` splits the id range into ``numPartitions`` disjoint
  slices → Spark schedules one task per slice; generation is pure map
  work, no driver materialization, no shuffle.
- ``pushFilters`` accepts ``lang = 'xx'`` equality (the generated lang
  is a pure function of doc_id, so pruning at the source is
  semantics-preserving); everything else is left for Spark to apply
  post-scan, per the API contract.
- Rows are a deterministic function of (doc_id) only — NO RNG state —
  so any partitioning, retry, or speculative re-execution reproduces
  identical data (the same property the engine's hash-based samplers
  rely on).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

LANGS = ("en", "de", "fr", "es", "pt")
SOURCES = ("web", "wiki", "news", "code")

SCHEMA_DDL = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _h(doc_id: int, salt: str) -> int:
    """Deterministic 60-bit hash of (doc_id, salt) — stable across
    processes (no PYTHONHASHSEED dependence)."""
    return int(
        hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:15], 16
    )


def _row(doc_id: int) -> tuple:
    lang = LANGS[_h(doc_id, "lang") % len(LANGS)]
    source = SOURCES[_h(doc_id, "src") % len(SOURCES)]
    n_words = 5 + _h(doc_id, "len") % 40
    words = [f"w{_h(doc_id, f'w{i}') % 1000}" for i in range(n_words)]
    text = " ".join(words)
    return (doc_id, text, lang, source, len(text))


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("numPartitions", 8))
        self.lang_eq: str | None = None

    def partitions(self) -> Sequence[InputPartition]:
        per = max(1, -(-self.n_docs // self.n_partitions))
        return [
            _Slice(lo, min(lo + per, self.n_docs))
            for lo in range(0, self.n_docs, per)
        ]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            row = _row(doc_id)
            if self.lang_eq is not None and row[2] != self.lang_eq:
                continue
            yield row


class SynthDocsPushdownReader(SynthDocsReader):
    """Pushdown-capable variant. Spark refuses ANY reader that merely
    implements pushFilters when ``spark.sql.python.filterPushdown
    .enabled`` is false (off by default), so pushdown is an OPT-IN
    subclass — ``.option("filterPushdown", "true")`` — and plain reads
    work on a vanilla session. The engine session factory enables the
    conf, so engine code can always opt in."""

    def pushFilters(self, filters):  # noqa: ANN001 - API signature
        for f in filters:
            # lang is a pure function of doc_id → source-side pruning is
            # semantics-preserving. Everything else stays with Spark.
            if isinstance(f, EqualTo) and f.attribute == ("lang",):
                self.lang_eq = f.value
            else:
                yield f


class SynthDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin: micro-batches of ``batch_size`` docs by id range,
    up to ``max_docs``. The OFFSET ({'next': id}) fully determines the
    data — ``readBetweenOffsets`` regenerates any replayed batch
    byte-identically, which is the whole exactly-once contract for a
    source: recovery after a crash re-reads the same rows, not fresh
    ones. ``commit`` is a no-op (nothing to release; generation is
    pure)."""

    def __init__(self, options: dict):
        self.batch_size = int(options.get("batch_size", 100))
        self.max_docs = int(options.get("max_docs", 1000))

    def initialOffset(self) -> dict:  # noqa: N802 - API
        return {"next": 0}

    def _rows(self, lo: int, hi: int) -> list:
        # Lists, not generators: Spark pickles the prefetched batch to
        # replay it into the plan, and generators don't pickle. A batch
        # is batch_size rows — bounded by the option, never data-sized.
        return [_row(doc_id) for doc_id in range(lo, hi)]

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(lo + self.batch_size, self.max_docs)
        return self._rows(lo, hi), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802 - API
        return self._rows(int(start["next"]), int(end["next"]))

    def commit(self, end: dict) -> None:
        pass


class SynthDocsDataSource(DataSource):
    """``spark.read.format("synthdocs").option("n_docs", N).load()`` —
    or ``spark.readStream`` with batch_size/max_docs for the streaming
    form."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> SynthDocsReader:
        if str(self.options.get("filterPushdown", "false")).lower() == "true":
            return SynthDocsPushdownReader(self.options)
        return SynthDocsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SynthDocsStreamReader:  # noqa: N802
        return SynthDocsStreamReader(self.options)


def register_synthdocs(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(SynthDocsDataSource)
