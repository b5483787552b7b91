"""Deterministic distinct-count sketching: KMV (k-minimum-values,
Bar-Yossef et al. 2002) — the mergeable cardinality sketch whose state
is just the k smallest hash values of the set.

Why this exists next to ``t1_approx_aggs`` (HLL++): Spark's HLL sketch
is engine-specific, so that query is a rows-only check.  KMV built on
md5 is ENGINE-NEUTRAL — the sketch, the merge, and the estimate are
pure integer functions of the data, so an approximate-counting
algorithm runs under the exact-match oracle gate: the estimates
themselves (and the merge invariant) are verified bit-for-bit.

At 100 TB this is the shape that matters: per-partition / per-source
sketches of bounded size (k rows) roll up through ordinary top-k
merges — count-distinct over any slice without re-scanning, the
mergeability HLL is used for in production, demonstrated here with its
invariant (merged per-source sketches ≡ sketch of the union) as part
of the checked result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.operators.neardup import hex2int_sql
from ght2dm_spark.queries.registry import register

_KMV_K = 32
_KMV_DOMAIN = 2**32  # md5 first 8 hex chars → uniform in [0, 2^32)


def _kmv_sql() -> str:
    k, dom = _KMV_K, _KMV_DOMAIN
    h = hex2int_sql("md5('kmv:' || CAST(user_id AS VARCHAR))", 1)
    # A sketch holding fewer than k hashes has seen the WHOLE set — the
    # estimate is its exact size (the standard KMV small-set branch).
    est = f"CASE WHEN n < {k} THEN n ELSE ({k} - 1) * {dom} // hk END"
    return f"""
    WITH uh AS (SELECT DISTINCT event_type, user_id, {h} AS h FROM events),
    sk AS (SELECT event_type, h,
                  row_number() OVER (PARTITION BY event_type ORDER BY h)
                    AS rn
           FROM uh),
    per_type AS (
      SELECT s.event_type AS scope, {est} AS est_distinct, x.exact_distinct
      FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS n, max(h) AS hk
            FROM sk WHERE rn <= {k} GROUP BY 1) s
      JOIN (SELECT event_type, CAST(count(*) AS BIGINT) AS exact_distinct
            FROM uh GROUP BY 1) x ON s.event_type = x.event_type),
    gh AS (SELECT DISTINCT user_id, {h} AS h FROM events),
    exact_all AS (SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM gh),
    direct AS (
      SELECT 'all_direct' AS scope, {est} AS est_distinct
      FROM (SELECT CAST(count(*) AS BIGINT) AS n, max(h) AS hk
            FROM (SELECT h FROM gh ORDER BY h LIMIT {k}))),
    merged AS (
      SELECT 'all_merged' AS scope, {est} AS est_distinct
      FROM (SELECT CAST(count(*) AS BIGINT) AS n, max(h) AS hk
            FROM (SELECT h FROM (SELECT DISTINCT h FROM sk WHERE rn <= {k})
                  ORDER BY h LIMIT {k}))),
    allrows AS (
      SELECT scope, est_distinct, exact_distinct FROM per_type
      UNION ALL
      SELECT d.scope, d.est_distinct, e.exact_distinct
      FROM direct d CROSS JOIN exact_all e
      UNION ALL
      SELECT m.scope, m.est_distinct, e.exact_distinct
      FROM merged m CROSS JOIN exact_all e)
    SELECT scope, est_distinct, exact_distinct,
           abs(est_distinct - exact_distinct) * 1000000 // exact_distinct
             AS err_ppm
    FROM allrows
    """


@register("t1_kmv_sketch", oracle=_kmv_sql())
def t1_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-user sketches per event type (k=32 smallest md5
    hashes; estimate = (k−1)·2³²/h₍ₖ₎), the global sketch built two
    ways — directly, and by MERGING the five per-type sketches — and
    every estimate next to its exact count with an integer-ppm error.
    The merged and direct global rows are equal by the KMV merge
    theorem (k smallest of a union = k smallest of the combined
    sketches), and the oracle checks that equality as data.

    Scale: the sketch state is k rows per scope regardless of input
    size; per-type sketches are a partitioned window over the distinct
    (type, user) frame, the global ones are TakeOrdered over sketch
    rows only — the rollup never rescans the base.  Estimates are
    exact integer arithmetic on md5 hashes: deterministic across
    engines, partitioning, and merge order.  (Estimation error at
    k=32 is ~18% 1σ — k is the accuracy dial; HLL++ at the same state
    size is tighter but engine-specific, see t1_approx_aggs.)"""
    ev = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    uh = (
        ev.select("event_type", "user_id")
        .distinct()
        .withColumn("h", h)
    )
    w = Window.partitionBy("event_type").orderBy("h")
    sk = uh.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _KMV_K
    )
    # standard KMV small-set branch: a sketch with < k hashes has seen
    # the whole set, so the estimate is its exact size
    est = F.expr(
        f"CASE WHEN n < {_KMV_K} THEN n "
        f"ELSE ({_KMV_K} - 1) * {_KMV_DOMAIN}L div hk END"
    ).alias("est_distinct")
    exact_t = uh.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    per_type = (
        sk.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("hk"))
        .join(exact_t, "event_type")
        .select(F.col("event_type").alias("scope"), est, "exact_distinct")
    )
    gh = ev.select("user_id").distinct().withColumn("h", h)
    exact_all = gh.agg(F.count(F.lit(1)).alias("exact_distinct"))
    direct = (
        gh.select("h")
        .orderBy("h")
        .limit(_KMV_K)
        .agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("hk"))
        .select(F.lit("all_direct").alias("scope"), est)
        .crossJoin(F.broadcast(exact_all))
    )
    merged = (
        sk.select("h")
        .distinct()
        .orderBy("h")
        .limit(_KMV_K)
        .agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("hk"))
        .select(F.lit("all_merged").alias("scope"), est)
        .crossJoin(F.broadcast(exact_all))
    )
    allrows = per_type.unionByName(direct).unionByName(merged)
    return allrows.withColumn(
        "err_ppm",
        F.expr("abs(est_distinct - exact_distinct) * 1000000L div exact_distinct"),
    )
