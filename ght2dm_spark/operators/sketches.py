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


def cms_pos(value: Column, j: int, w: int) -> Column:
    """Counter position of a value in CMS hash row ``j`` (md5-derived,
    engine-portable)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), value)), 1, 8), 16, 10
        ).cast("long")
        % w
    )


def cms_build(df: DataFrame, value: Column, d: int, w: int) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of a value
    column: ``d`` hash rows × ``w`` counters as rows (j, pos, c).  One
    pass with map-side combine (d·w groups regardless of input size).
    Sketches MERGE by plain counter addition (linearity):
    ``union.groupBy(j, pos).sum(c)`` — see :func:`cms_merge`."""
    counters = None
    for j in range(1, d + 1):
        c_j = (
            df.groupBy(cms_pos(value, j, w).alias("pos"))
            .agg(F.count(F.lit(1)).alias("c"))
            .select(F.lit(j).alias("j"), "pos", "c")
        )
        counters = c_j if counters is None else counters.unionByName(c_j)
    return counters


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CMS counter tables built with the same (d, w): counters
    add (linearity), so the merged sketch answers point queries over
    the combined input exactly as a directly-built one would."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("j", "pos").agg(F.sum("c").alias("c"))


def cms_point_query(
    counters: DataFrame,
    items: DataFrame,
    value_col: str,
    d: int,
    w: int,
    est_col: str = "cms_est",
) -> DataFrame:
    """Point-query frequency estimates for ``items`` rows: min over the
    d counters each value hashes to.  CMS guarantees est ≥ exact count.
    Both sides of the lookup are sketch/candidate-sized — broadcast
    joins, no rescan of the sketched corpus."""
    cpos = None
    for j in range(1, d + 1):
        p_j = items.withColumn("j", F.lit(j)).withColumn(
            "pos", cms_pos(F.col(value_col), j, w)
        )
        cpos = p_j if cpos is None else cpos.unionByName(p_j)
    return (
        cpos.join(F.broadcast(counters), ["j", "pos"])
        .groupBy(*items.columns)
        .agg(F.min("c").alias(est_col))
    )
