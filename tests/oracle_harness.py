"""Local twin of the driver's DuckDB correctness gate: run a registered
Spark query and its oracle SQL on the same sf dir, compare row count,
column names, and order-insensitive canonicalized values (stricter than a
hash — mismatches show the offending cells)."""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pandas as pd

from mle_proj_datapipeline_spark.sources.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        v = float(v)  # np.float64 → plain float so repr is canonical
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        vals = [None if pd.isna(v) else v for v in row]
        out.append(tuple(_canon_cell(v) for v in vals))
    return sorted(out)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "") -> None:
    got = spark_df.toPandas()
    want = con.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns differ: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} != oracle {len(want)}"
    g, w = canonicalize(got), canonicalize(want)
    diffs = [(a, b) for a, b in zip(g, w) if a != b]
    assert not diffs, f"{name}: {len(diffs)} mismatched rows; first 3: {diffs[:3]}"
