"""Multimodal (image/audio/video) column handling.

Convention: media travels as an opaque ``binary`` column plus a typed
metadata struct (kind/width/height/sample_rate/...). Decode and
feature-extraction run as Arrow-batched ``mapInPandas`` — the ONE place
the engine deliberately leaves the JVM, because codec work is Python/C
territory. Batches stay columnar end-to-end (parquet → Arrow → pandas →
Arrow), no row-at-a-time serialization.

The actual codecs (PIL/libav/...) are NOT in this container, so
``decode_image``/``sample_frames``/``resize`` raise NotImplementedError
(clearly marked STUB) unless the import succeeds — but the Spark-side
plumbing (schema, batching, partitioning, UDF signatures) is real and
tested via the deterministic ``byte_stats`` extractor, which plays the
role of "decode" with an exactly verifiable output.

Scale notes: mapInPandas is per-partition streaming — no driver
materialization; spark.sql.execution.arrow.maxRecordsPerBatch bounds
batch memory; binary columns must stay OUT of shuffle keys (hash the
bytes instead — see operators/dedup.exact_dedup).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)

BYTE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("source", StringType(), True),
        StructField("n_bytes", LongType(), False),
        StructField("first_byte", IntegerType(), False),
        StructField("checksum_mod", LongType(), False),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test/demo helper: materialize an opaque binary payload + metadata
    struct from a text column (stands in for real image/audio bytes)."""
    return df.withColumn("media", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("blob").alias("kind"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ),
    )


def byte_stats(df: DataFrame, id_col: str = "doc_id", media_col: str = "media") -> DataFrame:
    """Arrow-batched feature extraction over a binary column — the same
    shape a real decode-and-featurize pass takes (mapInPandas, batch in /
    batch out, schema declared)."""
    media_idx_cols = [id_col, "source", media_col]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[media_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "source": pdf["source"],
                    "n_bytes": blobs.map(len).astype("int64"),
                    "first_byte": blobs.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "checksum_mod": blobs.map(lambda b: sum(b) % 997).astype("int64"),
                }
            )

    return df.select(*media_idx_cols).mapInPandas(extract, BYTE_STATS_SCHEMA)


def decode_image(df: DataFrame, media_col: str = "media") -> DataFrame:
    """STUB: real image decode (PIL) is unavailable in this container.

    The mapInPandas shape is identical to ``byte_stats`` — swap the
    extractor body for ``PIL.Image.open(io.BytesIO(b))`` when the codec
    is present."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL; container has no codecs — "
            "use byte_stats() for the tested plumbing path"
        ) from e
    raise NotImplementedError("wire PIL decode here when codecs are available")


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """STUB: video frame sampling (needs libav); same mapInPandas shape."""
    raise NotImplementedError("video codecs unavailable in this container")


def resize(df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB: image resize (needs PIL); same mapInPandas shape."""
    raise NotImplementedError("image codecs unavailable in this container")
