"""Cardinality sketches as reusable operators (SURVEY §2.9 extension
surface).  KMV — K Minimum Values (Bar-Yossef et al., RANDOM'02): keep
the k smallest hash values of a set; estimate distinct count as
(k−1)·DOMAIN / h₍ₖ₎, exactly the set size while fewer than k hashes
have been seen.

Why KMV and not HLL here: the sketch state is plain rows of integer
hashes, so it is engine-portable (the DuckDB oracle replays it
bit-identically), MERGEABLE by construction (k smallest of a union =
k smallest of the pooled sketch rows — the merge theorem
`t1_kmv_sketch` checks as data), and every estimate is exact integer
arithmetic.  Spark's own HLL++ (`approx_count_distinct`) is tighter
per byte but its state is engine-specific — right for live queries,
wrong for cross-engine-verified pipelines; see t1_approx_aggs.

Scale: a sketch is ≤ k rows per group regardless of input size; builds
are one distinct + one per-group top-k, merges and estimates touch
sketch rows only, never the base data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: md5 first 8 hex chars → uniform in [0, 2^32)
KMV_DOMAIN = 2**32


def kmv_hash(value: Column, salt: str = "kmv:") -> Column:
    """Uniform 32-bit integer hash of a value (md5-based, engine-portable:
    the DuckDB mirror is hex2int_sql over the same digest)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), value.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def kmv_build(
    df: DataFrame, keys: Sequence[str], value: Column, k: int
) -> DataFrame:
    """Per-``keys``-group KMV sketch rows (keys..., h): the k smallest
    distinct hashes of ``value`` in each group.  With ``keys=[]`` builds
    one global sketch (TakeOrdered over the distinct hashes — no single
    overloaded partition; Spark plans a per-partition top-k + k-row
    merge)."""
    uh = df.select(*keys, kmv_hash(value).alias("h")).distinct()
    if not keys:
        return uh.orderBy("h").limit(k)
    w = Window.partitionBy(*keys).orderBy("h")
    return (
        uh.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_merge(sketch: DataFrame, keys: Sequence[str], k: int) -> DataFrame:
    """Merge sketch rows down to ``keys`` granularity (pass a subset of
    the build keys, or [] for one global sketch): k smallest of the
    pooled distinct hashes — by the KMV merge theorem this equals the
    sketch built directly on the combined set."""
    pooled = sketch.select(*keys, "h").distinct()
    if not keys:
        return pooled.orderBy("h").limit(k)
    w = Window.partitionBy(*keys).orderBy("h")
    return (
        pooled.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_estimate(
    sketch: DataFrame, keys: Sequence[str], k: int, est_col: str = "est_distinct"
) -> DataFrame:
    """Distinct-count estimate per group from sketch rows: the standard
    small-set branch (n < k hashes ⇒ the sketch saw the whole set ⇒
    exact n), else (k−1)·DOMAIN div h₍ₖ₎ — all integer arithmetic."""
    est = F.expr(
        f"CASE WHEN n < {k} THEN n ELSE ({k} - 1) * {KMV_DOMAIN}L div hk END"
    ).alias(est_col)
    agg = [F.count(F.lit(1)).alias("n"), F.max("h").alias("hk")]
    if not keys:
        return sketch.agg(*agg).select(est)
    return sketch.groupBy(*keys).agg(*agg).select(*keys, est)
