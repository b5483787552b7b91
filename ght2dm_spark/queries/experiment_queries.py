"""Experimentation operators: deterministic A/B assignment with a
two-proportion z-test, and linear (equal-credit) multi-touch
attribution.

A/B assignment reuses the engine's md5 hash-bucket discipline
(operators/sampling.py) — a user's variant is a pure function of their
id, reproducible across runs, engines, and repartitioning; Spark's
seeded RNG cannot give that contract.  Attribution credit is kept in
integer parts-per-million (1000000 // n) so summed fractional credits
stay exact — summing 1/n doubles is shuffle-order-dependent.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ght2dm_spark.functions import epoch_us
from ght2dm_spark.io import load_table
from ght2dm_spark.operators.neardup import hex2int_sql
from ght2dm_spark.operators.sampling import hash_bucket
from ght2dm_spark.queries.registry import register

_VARIANT = f"({hex2int_sql('md5(CAST(user_id AS VARCHAR))', 1, 8)} % 2)"


@register(
    "t1_ab_lift",
    oracle=f"""
    WITH u AS (
        SELECT user_id,
               CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                             END) >= 14 THEN 1 ELSE 0 END AS conv,
               {_VARIANT} AS v
        FROM events GROUP BY user_id
    ),
    m AS (
        SELECT CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(sum(CASE WHEN v = 0 THEN conv ELSE 0 END) AS BIGINT)
                 AS conv_a,
               CAST(sum(CASE WHEN v = 1 THEN conv ELSE 0 END) AS BIGINT)
                 AS conv_b
        FROM u
    ),
    r AS (
        SELECT n_a, n_b, conv_a, conv_b,
               CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
               CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
               CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
                 AS pool
        FROM m
    )
    SELECT n_a, n_b, conv_a, conv_b,
           round(rate_a, 6) AS rate_a,
           round(rate_b, 6) AS rate_b,
           CASE WHEN rate_a = CAST(0 AS DOUBLE) THEN NULL
                ELSE round(rate_b / rate_a - CAST(1 AS DOUBLE), 6)
           END AS lift,
           CASE WHEN pool = CAST(0 AS DOUBLE) OR pool = CAST(1 AS DOUBLE)
                THEN NULL
                ELSE round((rate_b - rate_a)
                           / sqrt(pool * (CAST(1 AS DOUBLE) - pool)
                                  * (CAST(1 AS DOUBLE) / CAST(n_a AS DOUBLE)
                                     + CAST(1 AS DOUBLE)
                                       / CAST(n_b AS DOUBLE))), 6)
           END AS z_score
    FROM r
    """,
)
def t1_ab_lift(spark, sf_dir):
    """A/B experiment readout: users are deterministically assigned to
    variants by md5 hash bucket (the sampling discipline — assignment
    survives reruns and engine changes), conversion is "≥14 purchase
    events" (near the per-user median, so both outcomes occur — an
    always-true flag would degenerate the pooled variance to zero; the
    degenerate cases still return NULL lift/z rather than erroring),
    and the output is conversion rates, relative lift, and the
    pooled two-proportion z-statistic.  All inputs to the float math
    are exact integer counts; the closed-form z expression has the same
    shape on both engines and is rounded to 6 digits.

    Scale: one groupBy(user_id) to collapse events to per-user
    conversion flags (map-side combinable max), then a 1-row global
    aggregate.  Assignment is a projection — no assignment table to
    join, no skew."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 14,
            1,
        )
        .otherwise(0)
        .alias("conv")
    ).withColumn("v", hash_bucket(F.col("user_id"), 2))
    m = u.agg(
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("v") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("v") == 0, F.col("conv")).otherwise(0)).alias(
            "conv_a"
        ),
        F.sum(F.when(F.col("v") == 1, F.col("conv")).otherwise(0)).alias(
            "conv_b"
        ),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    r = m.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        (d("conv_a") / d("n_a")).alias("rate_a"),
        (d("conv_b") / d("n_b")).alias("rate_b"),
        ((d("conv_a") + d("conv_b")) / (d("n_a") + d("n_b"))).alias("pool"),
    )
    rate_a, rate_b, pool = F.col("rate_a"), F.col("rate_b"), F.col("pool")
    se = F.sqrt(
        pool
        * (F.lit(1.0) - pool)
        * (F.lit(1.0) / d("n_a") + F.lit(1.0) / d("n_b"))
    )
    return r.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(rate_a, 6).alias("rate_a"),
        F.round(rate_b, 6).alias("rate_b"),
        F.when(rate_a != F.lit(0.0), F.round(rate_b / rate_a - F.lit(1.0), 6))
        .otherwise(F.lit(None))
        .alias("lift"),
        F.when(
            (pool != F.lit(0.0)) & (pool != F.lit(1.0)),
            F.round((rate_b - rate_a) / se, 6),
        )
        .otherwise(F.lit(None))
        .alias("z_score"),
    )


@register(
    "t1_linear_attribution",
    oracle="""
    WITH p AS (
        SELECT event_id AS pid, user_id, epoch_us(ts) AS p_us
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_us
        FROM events WHERE event_type = 'click'
    ),
    pairs AS (
        SELECT p.pid, c.click_id
        FROM p JOIN c ON p.user_id = c.user_id
                     AND c.c_us >= p.p_us - 604800000000
                     AND c.c_us < p.p_us
    ),
    w AS (
        SELECT pid, click_id,
               count(*) OVER (PARTITION BY pid) AS n_touch
        FROM pairs
    )
    SELECT click_id, count(*) AS n_credits,
           CAST(sum(1000000 // n_touch) AS BIGINT) AS credit_ppm
    FROM w GROUP BY click_id
    """,
)
def t1_linear_attribution(spark, sf_dir):
    """Linear multi-touch attribution: every click in the 7 days before
    a purchase shares the purchase's credit equally (1/n each) — the
    multi-touch counterpart of t1_last_touch_attribution.  Credit is
    integer parts-per-million (1000000 // n_touch) so the per-click
    sums are exact; summing 1/n as doubles would be accumulation-order-
    dependent and flake across engines.

    Scale: the purchase×click pairing is an equi join on user_id with
    the time window as a residual filter — a hash join Catalyst
    partitions by user, never a cross product; per-user pair counts are
    bounded by the attribution window.  The per-purchase touch count is
    a purchase-partitioned window on the join output, and the final
    rollup shuffles by click_id with map-side combine."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        epoch_us("ts").alias("p_us"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        epoch_us("ts").alias("c_us"),
    )
    pairs = p.join(c, "user_id").filter(
        (F.col("c_us") >= F.col("p_us") - F.lit(604800000000))
        & (F.col("c_us") < F.col("p_us"))
    )
    w = pairs.select(
        "pid",
        "click_id",
        F.count(F.lit(1)).over(Window.partitionBy("pid")).alias("n_touch"),
    )
    return w.groupBy("click_id").agg(
        F.count(F.lit(1)).alias("n_credits"),
        F.sum(F.expr("1000000 div n_touch")).alias("credit_ppm"),
    )
