"""Top-k operators (T1 surface, SURVEY §2.9).

Global top-k uses ``orderBy().limit(k)`` — Spark plans this as
TakeOrderedAndProject: each partition keeps a k-heap, the driver merges;
no global sort, no single-task window.  Per-group top-k is a window
row_number filter (one shuffle on the group key).

Determinism: callers must include a unique tiebreak column in ``order``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: Sequence[Column | str], k: int) -> DataFrame:
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group: Sequence[str],
    order: Sequence[Column | str],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    w = Window.partitionBy(*group).orderBy(*order)
    out = df.withColumn("__rn", F.row_number().over(w).cast("long")).filter(
        F.col("__rn") <= k
    )
    if rank_col:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")
