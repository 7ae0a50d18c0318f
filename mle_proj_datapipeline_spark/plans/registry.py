"""Query registry: named (spark, sf_dir) -> DataFrame callables + DuckDB
oracle SQL.

Every operator the engine claims (SURVEY.md §2) registers here; the
driver harness (``__spark_entry__``) exposes the two dicts verbatim.

Float parity convention: any floating-point output column is wrapped in
``round(x, N)`` on BOTH the Spark side and the oracle side (money sums
N=2, ratios/averages N=4) so order-of-summation ulp noise can't flip the
order-insensitive value hash.

Determinism convention: every top-k / rank carries a total-order
tiebreak (e.g. ``count DESC, key ASC``) because the hash compare is
exact — ties must resolve identically in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with an optional DuckDB
    oracle. Queries without an oracle get the driver's weaker rows-only
    check (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
