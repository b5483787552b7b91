"""Marketing/product analytics: a time-constrained funnel chain, RFM
segmentation, and day-of-week seasonality indices.

The funnel chain is deliberately built as two chained as-of joins with
window predicates applied AFTER the match — "the latest prior touch, if
it was recent enough" — which is both the honest marketing semantics
and the formulation that stays one-shuffle-per-step at scale (versus
k-way inequality joins for k-step funnels).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ght2dm_spark.functions import epoch_us
from ght2dm_spark.io import load_table
from ght2dm_spark.operators.temporal import asof_join
from ght2dm_spark.queries.registry import register


@register(
    "t1_funnel_constrained",
    oracle="""
    WITH c AS (
        SELECT user_id, ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ),
    v AS (
        SELECT user_id, ts, max(event_id) AS view_id
        FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ),
    p AS (
        SELECT event_id AS purchase_id, user_id, ts
        FROM events WHERE event_type = 'purchase'
    ),
    pc AS (
        SELECT p.purchase_id, p.user_id, p.ts AS p_ts,
               CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 86400000000
                    THEN c.click_id END AS click_id,
               CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 86400000000
                    THEN c.ts END AS c_ts
        FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    ),
    pcv AS (
        SELECT pc.purchase_id, pc.click_id,
               CASE WHEN pc.c_ts IS NOT NULL
                     AND epoch_us(pc.c_ts) - epoch_us(v.ts) <= 3600000000
                    THEN v.view_id END AS view_id
        FROM pc ASOF LEFT JOIN v
          ON pc.user_id = v.user_id AND pc.c_ts >= v.ts
    )
    SELECT purchase_id, click_id, view_id,
           CASE WHEN view_id IS NOT NULL THEN 3
                WHEN click_id IS NOT NULL THEN 2
                ELSE 1 END AS chain_depth
    FROM pcv
    """,
)
def t1_funnel_constrained(spark, sf_dir):
    """Time-constrained funnel chain: purchase ← its latest prior click
    IF within 24 h ← that click's latest prior view IF within 1 h.
    Semantics are "latest touch, if recent enough" (the match is the
    as-of latest; the window predicate then keeps or nulls it) — the
    attribution-grade funnel, vs t1_event_funnel's unordered stage
    counts.  Clicks/views are deduped per (user, ts) keeping max
    event_id so both engines break timestamp ties identically; checked
    against DuckDB's native ASOF JOIN chain.

    Scale: a k-step constrained funnel is k chained as-of joins — k
    windows over ONE user_id partitioning, zero row expansion; the
    inequality-join formulation Spark would otherwise pick is
    BroadcastNestedLoop with a per-user cross product."""
    ev = load_table(spark, sf_dir, "events")

    def dedup(etype, idname):
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy("user_id", epoch_us("ts").alias(f"{idname}_us"))
            .agg(F.max("event_id").alias(idname))
        )
    clicks = dedup("click", "click_id").withColumn(
        "c_us", F.col("click_id_us")
    )
    views = dedup("view", "view_id").withColumn("v_us", F.col("view_id_us"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        epoch_us("ts").alias("p_us"),
    )
    pc = asof_join(
        p,
        clicks.select("user_id", "click_id_us", "click_id", "c_us"),
        key="user_id",
        left_ts="p_us",
        right_ts="click_id_us",
        payload=["click_id", "c_us"],
    ).select(
        "purchase_id",
        "user_id",
        "p_us",
        F.when(
            F.col("p_us") - F.col("c_us") <= 86400000000, F.col("click_id")
        ).alias("click_id"),
        F.when(F.col("p_us") - F.col("c_us") <= 86400000000, F.col("c_us")).alias(
            "c_us"
        ),
    )
    # Second hop keys off the (possibly nulled) click time; null left_ts
    # rows can't match any view, matching the oracle's NULL propagation.
    pcv = asof_join(
        pc,
        views.select("user_id", "view_id_us", "view_id", "v_us"),
        key="user_id",
        left_ts="c_us",
        right_ts="view_id_us",
        payload=["view_id", "v_us"],
    ).select(
        "purchase_id",
        "click_id",
        F.when(
            F.col("c_us").isNotNull()
            & (F.col("c_us") - F.col("v_us") <= 3600000000),
            F.col("view_id"),
        ).alias("view_id"),
    )
    return pcv.select(
        "purchase_id",
        "click_id",
        "view_id",
        F.when(F.col("view_id").isNotNull(), 3)
        .when(F.col("click_id").isNotNull(), 2)
        .otherwise(1)
        .alias("chain_depth"),
    )


@register(
    "t1_rfm_segments",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST((epoch_us(TIMESTAMP '2024-01-31 00:00:00')
                     - max(epoch_us(ts))) // 86400000000 AS BIGINT)
                 AS recency_days,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS frequency,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN CAST(value AS DECIMAL(18,2))
                             ELSE CAST(0 AS DECIMAL(18,2)) END)
                    AS DOUBLE) AS monetary
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT user_id, recency_days, frequency, monetary,
               ntile(5) OVER (ORDER BY recency_days DESC, user_id) AS r_score,
               ntile(5) OVER (ORDER BY frequency, user_id) AS f_score,
               ntile(5) OVER (ORDER BY monetary, user_id) AS m_score
        FROM u
    )
    SELECT user_id, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           CAST(r_score AS VARCHAR) || '-' || CAST(f_score AS VARCHAR)
             || '-' || CAST(m_score AS VARCHAR) AS segment,
           CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                THEN 'champion'
                WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
                WHEN f_score <= 2 AND m_score <= 2 THEN 'hibernating'
                ELSE 'core' END AS label
    FROM s
    """,
)
def t1_rfm_segments(spark, sf_dir):
    """RFM segmentation: per-user recency (days before a fixed anchor),
    purchase frequency, and exact-decimal monetary total, each scored
    into quintiles (higher = better, so recency ranks DESC) with
    user_id as the deterministic tie-break, then composed into the
    classic segment code + a label rule.  ntile agrees across engines
    given a total order.

    Scale: the quintile windows rank the per-user AGGREGATE (|users|
    rows, one global sort each) — the local-mode demo form.  At 100 TB
    you broadcast approx-quantile cut points and score by comparison
    (map-side, no global sort); the segment semantics are unchanged,
    which is why the exact form is the correctness anchor."""
    ev = load_table(spark, sf_dir, "events")
    anchor_us = 1706659200000000  # 2024-01-31 00:00:00 UTC
    u = ev.groupBy("user_id").agg(
        (
            (F.lit(anchor_us) - F.max(epoch_us("ts")))
            / F.lit(86400000000)
        )
        .cast("bigint")
        .alias("recency_days"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("frequency"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,2)"),
            ).otherwise(F.lit(0).cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("monetary"),
    )
    s = u.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(5)
        .over(Window.orderBy(F.col("recency_days").desc(), "user_id"))
        .cast("long")
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy("frequency", "user_id"))
        .cast("long")
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy("monetary", "user_id"))
        .cast("long")
        .alias("m_score"),
    )
    return s.select(
        "*",
        F.concat_ws(
            "-",
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
        F.when(
            (F.col("r_score") >= 4)
            & (F.col("f_score") >= 4)
            & (F.col("m_score") >= 4),
            "champion",
        )
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 4), "at_risk")
        .when((F.col("f_score") <= 2) & (F.col("m_score") <= 2), "hibernating")
        .otherwise("core")
        .alias("label"),
    )


@register(
    "t1_dow_seasonality",
    oracle="""
    WITH base AS (
        SELECT event_type, dayofweek(ts) + 1 AS dow,
               CAST(value AS DECIMAL(18,2)) AS v
        FROM events
    ),
    per AS (
        SELECT event_type, dow, count(*) AS n,
               CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS dow_mean
        FROM base GROUP BY 1, 2
    ),
    o AS (
        SELECT event_type,
               CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS all_mean
        FROM base GROUP BY 1
    )
    SELECT p.event_type, p.dow, p.n,
           round(p.dow_mean, 6) AS dow_mean,
           round(p.dow_mean / o.all_mean, 6) AS seasonal_idx
    FROM per p JOIN o USING (event_type)
    """,
)
def t1_dow_seasonality(spark, sf_dir):
    """Day-of-week seasonality profile: per series, each weekday's mean
    against the series' overall mean (seasonal index > 1 = hot day) —
    the decomposition step before de-seasonalized anomaly detection or
    forecasting.  Means come from exact decimal sums; the index divides
    two identically-derived doubles (Spark dayofweek ≡ DuckDB
    dayofweek+1, both Sunday-first).

    Scale: two aggregations over (type, dow) and (type) — both
    cardinality-bounded — and a broadcast re-join; one scan of
    events."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.dayofweek("ts").cast("long").alias("dow"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    per = base.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("v").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "dow_mean"
        ),
    )
    o = base.groupBy("event_type").agg(
        (F.sum("v").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "all_mean"
        )
    )
    return per.join(F.broadcast(o), "event_type").select(
        "event_type",
        "dow",
        "n",
        F.round("dow_mean", 6).alias("dow_mean"),
        F.round(F.col("dow_mean") / F.col("all_mean"), 6).alias(
            "seasonal_idx"
        ),
    )


#: 2^(-gap_days/7) rounded to 9 places for gap 0..7 — Python-computed
#: half-life decay weights spliced into BOTH engines as identical
#: decimal literals (the eval_queries NDCG discipline: no pow() at
#: query time).
_DECAY_W = [round(2 ** (-g / 7.0), 9) for g in range(8)]


def _decay_case(gap_col: str) -> str:
    whens = " ".join(
        f"WHEN {g} THEN {_DECAY_W[g]:.9f}" for g in range(8)
    )
    return f"(CASE {gap_col} {whens} END)"


@register(
    "t1_time_decay_attribution",
    oracle=f"""
    WITH p AS (
        SELECT event_id AS conv_id, user_id, epoch_us(ts) AS p_us
        FROM events WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT event_id AS touch_id, user_id, event_type,
               epoch_us(ts) AS t_us
        FROM events WHERE event_type IN ('click', 'view')
    ),
    pair AS (
        SELECT p.conv_id, t.touch_id, t.event_type,
               CAST(floor((p.p_us - t.t_us) / 86400000000) AS BIGINT)
                 AS gap_d
        FROM p JOIN t ON p.user_id = t.user_id
         AND t.t_us <= p.p_us AND p.p_us - t.t_us < 8 * 86400000000
    ),
    wtd AS (
        SELECT conv_id, touch_id, event_type,
               CAST({_decay_case("gap_d")} AS DECIMAL(18,9)) AS w
        FROM pair
    ),
    tot AS (SELECT conv_id, sum(w) AS sum_w FROM wtd GROUP BY conv_id),
    credit AS (
        SELECT wtd.event_type,
               CAST(round(CAST(wtd.w AS DOUBLE) / CAST(tot.sum_w AS DOUBLE),
                          9) AS DECIMAL(18,9)) AS c
        FROM wtd JOIN tot ON wtd.conv_id = tot.conv_id
    )
    SELECT event_type, count(*) AS n_touches,
           round(CAST(sum(c) AS DOUBLE), 6) AS total_credit
    FROM credit GROUP BY event_type
    """,
)
def t1_time_decay_attribution(spark, sf_dir):
    """Time-decay multi-touch attribution (7-day half-life): every
    click/view in the week before a purchase shares that conversion's
    credit in proportion to 2^(-age/half_life) — the standard middle
    ground between t1_last_touch_attribution (winner-take-all) and
    t1_linear_attribution (flat split), rewarding recency without
    zeroing early touches.

    Exactness: decay weights are spliced decimal literals keyed by the
    INTEGER day gap; per-conversion weight totals are exact decimal
    sums; each credit is one double division rounded to 9 and re-summed
    as fixed-point, so channel totals are order-independent.  Scale:
    the touch join shuffles on user_id with the window predicate inside
    the per-key join (never a cross product), and credits aggregate
    map-side to |channels| rows."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"), "user_id",
        epoch_us("ts").alias("p_us"),
    )
    t = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("touch_id"), "user_id", "event_type",
        epoch_us("ts").alias("t_us"),
    )
    day_us = 86_400_000_000
    pair = (
        p.join(t, ["user_id"])
        .filter(
            (F.col("t_us") <= F.col("p_us"))
            & (F.col("p_us") - F.col("t_us") < 8 * day_us)
        )
        .select(
            "conv_id", "touch_id", "event_type",
            F.floor((F.col("p_us") - F.col("t_us")) / day_us)
            .cast("bigint").alias("gap_d"),
        )
    )
    wtd = pair.select(
        "conv_id", "touch_id", "event_type",
        F.expr(f"CAST({_decay_case('gap_d')} AS DECIMAL(18,9))").alias("w"),
    )
    tot = wtd.groupBy("conv_id").agg(F.sum("w").alias("sum_w"))
    credit = wtd.join(tot, "conv_id").select(
        "event_type",
        F.expr(
            "CAST(round(CAST(w AS DOUBLE) / CAST(sum_w AS DOUBLE), 9)"
            " AS DECIMAL(18,9))"
        ).alias("c"),
    )
    return credit.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.round(F.sum("c").cast("double"), 6).alias("total_credit"),
    )
