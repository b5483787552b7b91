"""Query registry: name → (Spark callable, DuckDB oracle SQL).

Every operator the engine claims (SURVEY.md §2) is surfaced as a named
query so the oracle harness can enumerate them mechanically.  A query is a
callable ``(spark, sf_dir) -> DataFrame``; its oracle is an ANSI-SQL string
DuckDB runs over the same parquet tables (views ``region nation customer
supplier part orders lineitem events documents embeddings``).

Hash-match discipline (the driver compares row-count + schema +
order-insensitive value hash):

- alias every computed column identically on both sides;
- never hash a raw double aggregate — SUM over doubles is
  order-dependent across engines; cast to DECIMAL first (exact) or round;
- break top-k ties with a unique key so LIMIT is deterministic;
- timestamps: session TZ is UTC (see session.py), matching DuckDB's
  UTC-naive timestamps.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query; ``oracle=None`` marks a query the driver
    checks rows-only (genuinely non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
