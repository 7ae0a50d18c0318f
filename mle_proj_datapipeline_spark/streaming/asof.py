"""Streaming as-of join — the stateful-streaming member of the as-of
family (operators/joins.asof_join is the batch form; SURVEY.md §2 E4/K5).

Spark's stream-stream joins support equality + time-interval conditions
but NOT "most recent right row at or before each left row" — the as-of
semantics need per-key ordered state. This operator gets them from
``applyInPandasWithState`` over a TAGGED UNION of the two sides (one
keyed stream, so the state operator applies): per key, the state is a
bounded, sorted list of recent right-side timestamps; each micro-batch
processes its rows in (event-time, side) order, rights update the state,
lefts attach the greatest right timestamp ≤ their own.

Semantics and bounds (stated, not implied):
- Within a micro-batch, rows apply in exact event-time order (rights
  sort before lefts at equal timestamps — backward as-of with exact
  matches allowed), so a single-batch run reproduces the batch as-of
  join exactly (tested).
- Across batches, rights persist in state, so lefts in later batches
  match rights from earlier ones (tested). A left that arrives BEFORE
  its right (processing-time inversion beyond a batch boundary) misses
  it — the same lateness contract as a watermarked stream join.
- State per key is capped at ``KEEP_RIGHTS`` timestamps (drop-oldest):
  bounded memory at any key cardinality; a left arriving later than
  KEEP_RIGHTS rights out of order misses — size the cap to the
  out-of-orderness horizon like a watermark.
"""

from __future__ import annotations

from bisect import bisect_right, insort
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

KEEP_RIGHTS = 64

ASOF_OUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("event_id", LongType(), False),
        StructField("ts", StringType(), False),
        StructField("matched_ts", StringType(), True),
    ]
)

ASOF_STATE = StructType([StructField("rights", ArrayType(StringType()), True)])

_TS_FMT = "%Y-%m-%d %H:%M:%S.%f"


def tag_sides(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
) -> DataFrame:
    """events → tagged union: side 'L' rows carry (event_id, ts), side
    'R' rows carry only ts. Works identically on a batch frame and a
    file-source stream (same expressions)."""
    import pyspark.sql.functions as F

    e = events.filter(F.col("event_type").isin(left_type, right_type))
    return e.select(
        "user_id",
        F.coalesce("event_id", F.lit(-1)).alias("event_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        F.when(F.col("event_type") == left_type, F.lit("L")).otherwise(F.lit("R")).alias("side"),
    )


def _fold_group(
    user_id: int, pdf: pd.DataFrame, rights: list[str]
) -> tuple[list[dict], list[str]]:
    # rights sort before lefts at equal ts → exact matches attach.
    # side must be DESCENDING: ASCII 'L' < 'R', so an ascending sort
    # would process lefts first and drop exact-timestamp matches.
    pdf = pdf.sort_values(
        ["ts_s", "side"], ascending=[True, False], kind="mergesort"
    )
    out: list[dict] = []
    for ts_s, side, event_id in zip(pdf["ts_s"], pdf["side"], pdf["event_id"]):
        if side == "R":
            insort(rights, ts_s)
            if len(rights) > KEEP_RIGHTS:
                del rights[0 : len(rights) - KEEP_RIGHTS]
        else:
            i = bisect_right(rights, ts_s)
            out.append(
                {
                    "user_id": user_id,
                    "event_id": int(event_id),
                    "ts": ts_s,
                    "matched_ts": rights[i - 1] if i else None,
                }
            )
    return out, rights


def stream_asof(tagged: DataFrame) -> DataFrame:
    """The streaming as-of operator over a tag_sides() stream."""

    def run(
        key: tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rights = list(state.get[0] or []) if state.exists else []
        rows = pd.concat(list(pdfs), ignore_index=True)
        out, rights = _fold_group(user_id, rows, rights)
        state.update((rights,))
        yield pd.DataFrame(out, columns=[f.name for f in ASOF_OUT])

    return tagged.groupBy("user_id").applyInPandasWithState(
        run,
        outputStructType=ASOF_OUT,
        stateStructType=ASOF_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_asof_reference(events: DataFrame) -> DataFrame:
    """The batch twin on the SAME tagged projection (sort-within-group
    semantics identical) — used by tests to assert stream == batch."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out, _ = _fold_group(int(pdf["user_id"].iloc[0]), pdf, [])
        return pd.DataFrame(out, columns=[f.name for f in ASOF_OUT])

    return tag_sides(events).groupBy("user_id").applyInPandas(run, ASOF_OUT)
