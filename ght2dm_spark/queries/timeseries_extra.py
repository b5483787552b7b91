"""Round-8 wave-2 time-series / behavioral declared queries: session
duration distribution, burstiness (index of dispersion), weekend
effect, a day-offset retention curve, and view→purchase conversion
lag — the behavioral-analytics shapes that round out the sessionize /
cohort / funnel family.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ght2dm_spark.functions.cleaning import epoch_us
from ght2dm_spark.io import load_table
from ght2dm_spark.queries.registry import register

_GAP_US = 30 * 60 * 1_000_000  # the t1_sessionize_gap 30-min rule


# --------------------------------------------------------------------------
# t1_session_duration_hist


@register(
    "t1_session_duration_hist",
    oracle=f"""
    WITH e AS (SELECT user_id, epoch_us(ts) AS us,
                      lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id)
                        AS prev_us
               FROM events),
    s AS (SELECT user_id, us,
                 sum(CASE WHEN prev_us IS NULL
                          OR us - prev_us > {_GAP_US}
                     THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY us) AS sess
          FROM e),
    d AS (SELECT user_id, sess,
                 CAST((max(us) - min(us)) // 60000000 AS BIGINT)
                   AS dur_min
          FROM s GROUP BY user_id, sess)
    SELECT CAST(least(dur_min // 10, 12) AS BIGINT) AS bucket_10min,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(min(dur_min) AS BIGINT) AS lo_min,
           CAST(max(dur_min) AS BIGINT) AS hi_min
    FROM d GROUP BY bucket_10min
    """,
)
def t1_session_duration_hist(spark, sf_dir):
    """Session-duration histogram: 30-minute-gap sessionization (the
    t1_sessionize_gap rule), per-session duration in whole minutes,
    bucketed into 10-minute bins capped at 2 h — the engagement-shape
    readout product analytics reads next to DAU (and the input for
    session-length-weighted sampling of behavioral training data).

    Exactness: durations are integer microsecond differences floored
    to minutes; bucketing is integer division.  Scale: one
    user-partitioned lag + running-sum window pass (the standard
    sessionize shape), one (user, session) aggregate, one 13-row
    histogram rollup."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", epoch_us("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    marks = e.select(
        "user_id", "us",
        F.when(
            F.lag("us").over(w).isNull()
            | (F.col("us") - F.lag("us").over(w) > _GAP_US),
            1,
        ).otherwise(0).alias("new_sess"),
    )
    ws = Window.partitionBy("user_id").orderBy("us")
    s = marks.select(
        "user_id", "us", F.sum("new_sess").over(ws).alias("sess")
    )
    d = s.groupBy("user_id", "sess").agg(
        F.floor((F.max("us") - F.min("us")) / 60_000_000).cast("bigint")
        .alias("dur_min")
    )
    bucket = F.least(F.floor(F.col("dur_min") / 10), F.lit(12)).cast("bigint")
    return d.groupBy(bucket.alias("bucket_10min")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.min("dur_min").cast("bigint").alias("lo_min"),
        F.max("dur_min").cast("bigint").alias("hi_min"),
    )


# --------------------------------------------------------------------------
# t1_burstiness


@register(
    "t1_burstiness",
    oracle="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY event_type, day),
    s AS (SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n_days,
                 CAST(sum(n) AS BIGINT) AS sn,
                 CAST(sum(n * n) AS BIGINT) AS sn2
          FROM d GROUP BY event_type)
    SELECT event_type, n_days, sn AS n_events,
           round((CAST(sn2 AS DOUBLE) / n_days
                  - (CAST(sn AS DOUBLE) / n_days)
                    * (CAST(sn AS DOUBLE) / n_days))
                 / (CAST(sn AS DOUBLE) / n_days), 6) AS fano
    FROM s
    """,
)
def t1_burstiness(spark, sf_dir):
    """Burstiness of daily event arrivals per type — the Fano factor
    (index of dispersion, variance/mean of daily counts): ≈1 means
    Poisson-like arrivals, ≫1 means bursty traffic that needs
    skew-aware partitioning and autoscaling headroom.  The one-number
    companion to t1_cusum_drift's where-did-it-shift view.

    Exactness: daily counts are integers, both moment sums exact
    BIGINT, the Fano factor one fixed IEEE chain.  Scale: a day-grain
    aggregate then |types|-row arithmetic."""
    d = load_table(spark, sf_dir, "events").groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("n").cast("bigint").alias("sn"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("sn2"),
    )
    mean = F.col("sn").cast("double") / F.col("n_days")
    var = F.col("sn2").cast("double") / F.col("n_days") - mean * mean
    return s.select(
        "event_type", "n_days", F.col("sn").alias("n_events"),
        F.round(var / mean, 6).alias("fano"),
    )


# --------------------------------------------------------------------------
# t1_weekend_effect


@register(
    "t1_weekend_effect",
    oracle="""
    WITH e AS (SELECT event_type,
                      CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END
                        AS wk,
                      CAST(round(value, 9) AS DECIMAL(18,9)) AS v
               FROM events WHERE value IS NOT NULL),
    s AS (SELECT event_type,
                 CAST(sum(CASE WHEN wk = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_we,
                 CAST(sum(CASE WHEN wk = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_wd,
                 sum(CASE WHEN wk = 1 THEN v END) AS sv_we,
                 sum(CASE WHEN wk = 0 THEN v END) AS sv_wd
          FROM e GROUP BY event_type)
    SELECT event_type, n_we, n_wd,
           round(CAST(sv_we AS DOUBLE) / n_we, 6) AS mean_weekend,
           round(CAST(sv_wd AS DOUBLE) / n_wd, 6) AS mean_weekday,
           round(CAST(sv_we AS DOUBLE) / n_we
                 - CAST(sv_wd AS DOUBLE) / n_wd, 6) AS effect
    FROM s
    """,
)
def t1_weekend_effect(spark, sf_dir):
    """Weekend effect per event type: mean value on weekend vs weekday
    days and their difference — the simplest seasonality contrast (the
    two-level version of t1_dow_seasonality's seven indices), and the
    covariate-shift check a feature pipeline runs before pooling days.

    Exactness: values round to DECIMAL(18,9) before the exact sums
    (order-independent); each mean is one division; dayofweek is
    calendar arithmetic identical on both engines (Sunday=0 in DuckDB,
    mapped explicitly on the Spark side).  Scale: one
    map-side-combinable groupBy."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            # Spark dayofweek: Sunday=1..Saturday=7; DuckDB: Sunday=0
            F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("wk"),
            F.round("value", 9).cast("decimal(18,9)").alias("v"),
        )
    )
    s = e.groupBy("event_type").agg(
        F.sum(F.when(F.col("wk") == 1, 1).otherwise(0)).cast("bigint")
        .alias("n_we"),
        F.sum(F.when(F.col("wk") == 0, 1).otherwise(0)).cast("bigint")
        .alias("n_wd"),
        F.sum(F.when(F.col("wk") == 1, F.col("v"))).alias("sv_we"),
        F.sum(F.when(F.col("wk") == 0, F.col("v"))).alias("sv_wd"),
    )
    m_we = F.col("sv_we").cast("double") / F.col("n_we")
    m_wd = F.col("sv_wd").cast("double") / F.col("n_wd")
    return s.select(
        "event_type", "n_we", "n_wd",
        F.round(m_we, 6).alias("mean_weekend"),
        F.round(m_wd, 6).alias("mean_weekday"),
        F.round(m_we - m_wd, 6).alias("effect"),
    )


# --------------------------------------------------------------------------
# t1_retention_curve

_RET_DAYS = 7


@register(
    "t1_retention_curve",
    oracle=f"""
    WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0
               FROM events GROUP BY user_id),
    act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    offs AS (SELECT unnest(range(1, {_RET_DAYS + 1})) AS offset_day),
    base AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM f),
    r AS (SELECT o.offset_day,
                 CAST(count(*) AS BIGINT) AS n_retained
          FROM f JOIN offs o ON true
               JOIN act a ON a.user_id = f.user_id
                         AND a.day = f.d0 + CAST(o.offset_day AS INTEGER)
          GROUP BY o.offset_day)
    SELECT CAST(o.offset_day AS BIGINT) AS offset_day,
           CAST(coalesce(r.n_retained, 0) AS BIGINT) AS n_retained,
           b.n_users,
           CAST(coalesce(r.n_retained, 0) * 1000000 // b.n_users AS BIGINT)
             AS retention_ppm
    FROM offs o LEFT JOIN r ON o.offset_day = r.offset_day
    CROSS JOIN base b
    """,
)
def t1_retention_curve(spark, sf_dir):
    """Day-N retention curve: the fraction of all users active exactly
    N days after their first-seen day, N = 1..7 — the standard
    growth-accounting curve (t1_cohort_retention slices it per weekly
    cohort; this is the pooled day-offset view).  Retention in exact
    integer ppm.

    Scale: first-seen is one user aggregate; the offset join hits the
    distinct (user, day) activity grid on (user, day) keys — a
    |offsets|-way multiplication of the tiny first-seen frame, never
    of events."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d0")
    )
    act = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    offs = spark.range(1, _RET_DAYS + 1).select(
        F.col("id").cast("bigint").alias("offset_day")
    )
    base = f.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    probes = f.crossJoin(F.broadcast(offs)).select(
        "user_id", "offset_day",
        F.date_add("d0", F.col("offset_day").cast("int")).alias("day"),
    )
    r = probes.join(act, ["user_id", "day"]).groupBy("offset_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_retained")
    )
    return (
        offs.join(r, "offset_day", "left")
        .crossJoin(F.broadcast(base))
        .select(
            "offset_day",
            F.coalesce("n_retained", F.lit(0)).cast("bigint")
            .alias("n_retained"),
            "n_users",
            F.expr(
                "CAST(coalesce(n_retained, 0) * 1000000L div n_users"
                " AS BIGINT)"
            ).alias("retention_ppm"),
        )
    )


# --------------------------------------------------------------------------
# t1_conversion_lag


@register(
    "t1_conversion_lag",
    oracle="""
    WITH v AS (SELECT user_id, min(epoch_us(ts)) AS v_us
               FROM events WHERE event_type = 'view' GROUP BY user_id),
    p AS (SELECT user_id, min(epoch_us(ts)) AS p_us
          FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    lag_h AS (SELECT CAST((p.p_us - v.v_us) // 3600000000 AS BIGINT)
                AS lag_hours
              FROM v JOIN p ON v.user_id = p.user_id
              WHERE p.p_us >= v.v_us)
    SELECT CAST(least(lag_hours // 24, 14) AS BIGINT) AS bucket_days,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(min(lag_hours) AS BIGINT) AS lo_hours,
           CAST(max(lag_hours) AS BIGINT) AS hi_hours
    FROM lag_h GROUP BY bucket_days
    """,
)
def t1_conversion_lag(spark, sf_dir):
    """View→purchase conversion lag: hours between each user's FIRST
    view and FIRST purchase (purchase-after-view only), bucketed into
    days capped at 2 weeks — the time-to-convert distribution that
    sizes attribution windows (the 7-day window the attribution trio
    hardcodes is a policy; this query is the data behind choosing it).

    Exactness: integer microsecond minima, floored hour/day buckets.
    Scale: two user-keyed min-aggregates and one user-keyed join —
    everything after the first aggregate is user-dimension-sized."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min(epoch_us("ts")).alias("v_us")
    )
    p = ev.filter(F.col("event_type") == "purchase").groupBy("user_id").agg(
        F.min(epoch_us("ts")).alias("p_us")
    )
    lag_h = (
        v.join(p, "user_id")
        .filter(F.col("p_us") >= F.col("v_us"))
        .select(
            F.floor((F.col("p_us") - F.col("v_us")) / 3_600_000_000)
            .cast("bigint").alias("lag_hours")
        )
    )
    bucket = F.least(F.floor(F.col("lag_hours") / 24), F.lit(14)).cast("bigint")
    return lag_h.groupBy(bucket.alias("bucket_days")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.min("lag_hours").cast("bigint").alias("lo_hours"),
        F.max("lag_hours").cast("bigint").alias("hi_hours"),
    )
