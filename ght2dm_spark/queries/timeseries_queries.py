"""Time-series completion and null-semantics shapes: minute-spine gap
filling with zero-fill and forward-fill (the resample/ffill idiom), and
null-safe equality joins.

Gap filling is the standard pre-step before windowed models consume a
metric stream (missing minutes must exist as rows); null-safe equality
is the join semantics the reference's zero-value policy (SURVEY §1.3)
implies when absent keys are represented as NULL on both sides.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ght2dm_spark.functions import trunc_ntz
from ght2dm_spark.io import load_table
from ght2dm_spark.queries.registry import register


@register(
    "t1_null_safe_join",
    oracle="""
    WITH l AS (SELECT doc_id, nullif(lang, 'de') AS k FROM documents),
    r AS (SELECT DISTINCT nullif(lang, 'de') AS k, coalesce(lang, '?') AS tag
          FROM documents)
    SELECT l.k, r.tag, count(*) AS n
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    GROUP BY l.k, r.tag
    """,
)
def t1_null_safe_join(spark, sf_dir):
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match NULL keys instead of dropping out — the semantics required
    when a sentinel ("no value") must join to its own dimension row.
    One lang is nulled on both sides to prove NULL↔NULL pairs survive.

    Scale: <=> is hash-joinable in Catalyst (NULL hashes to a bucket
    like any value) — the plan stays a broadcast/SMJ equi join, never a
    nested loop; but ALL null-key rows land in ONE reducer, so a mostly-
    null key needs the salted_join fallback."""
    d = load_table(spark, sf_dir, "documents")
    left = d.select("doc_id", F.nullif("lang", F.lit("de")).alias("k"))
    right = (
        d.select(
            F.nullif("lang", F.lit("de")).alias("k"),
            F.coalesce("lang", F.lit("?")).alias("tag"),
        )
        .distinct()
    )
    return (
        left.join(right, left.k.eqNullSafe(right.k))
        .groupBy(left.k, right.tag)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(left.k.alias("k"), "tag", "n")
    )


@register(
    "t1_time_gapfill",
    oracle="""
    WITH e AS (SELECT ts, value FROM events WHERE ts < TIMESTAMP '2024-01-02'),
    b AS (SELECT date_trunc('minute', min(ts)) AS lo,
                 date_trunc('minute', max(ts)) AS hi FROM e),
    spine AS (SELECT unnest(generate_series(b.lo, b.hi, INTERVAL 1 MINUTE))
                AS minute FROM b),
    m AS (SELECT date_trunc('minute', ts) AS minute, count(*) AS n_raw,
                 CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
          FROM e GROUP BY 1)
    SELECT s.minute, coalesce(m.n_raw, 0) AS n,
           round(last_value(m.v IGNORE NULLS)
                   OVER (ORDER BY s.minute
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS v_ff
    FROM spine s LEFT JOIN m ON s.minute = m.minute
    """,
)
def t1_time_gapfill(spark, sf_dir):
    """Resample-to-minutes with gap filling: a generated minute spine
    (sequence + explode) left-joins the per-minute aggregate; missing
    minutes get count 0 and a forward-filled value (last non-null —
    pandas ffill) via last(..., ignorenulls=True) over a running frame.

    Scale: the spine is generated, never scanned (rows = time range ÷
    grain, independent of event volume).  The single global window here
    is the one-series demo form; the production form partitions the
    window (and the spine) by series key, so state is one running value
    per series.  Filtered to one day to keep the demo spine bounded."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp"))
        .select("ts", "value")
    )
    m = ev.groupBy(trunc_ntz("minute", "ts").alias("minute")).agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"),
    )
    bounds = ev.agg(
        trunc_ntz("minute", F.min("ts")).alias("lo"),
        trunc_ntz("minute", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 minute"))
        ).alias("minute")
    )
    w = Window.orderBy("minute").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        spine.join(m, "minute", "left")
        .select(
            "minute",
            F.coalesce("n_raw", F.lit(0)).alias("n"),
            F.round(F.last("v", ignorenulls=True).over(w), 2).alias("v_ff"),
        )
    )


@register(
    "t1_time_gapfill_series",
    oracle="""
    WITH e AS (SELECT event_type, ts, value FROM events
               WHERE ts < TIMESTAMP '2024-01-02'),
    b AS (SELECT event_type,
                 date_trunc('minute', min(ts)) AS lo,
                 date_trunc('minute', max(ts)) AS hi
          FROM e GROUP BY event_type),
    spine AS (SELECT event_type,
                     unnest(generate_series(lo, hi, INTERVAL 1 MINUTE))
                       AS minute
              FROM b),
    m AS (SELECT event_type, date_trunc('minute', ts) AS minute,
                 count(*) AS n_raw,
                 CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
          FROM e GROUP BY 1, 2)
    SELECT s.event_type, s.minute, coalesce(m.n_raw, 0) AS n,
           round(last_value(m.v IGNORE NULLS)
                   OVER (PARTITION BY s.event_type ORDER BY s.minute
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS v_ff
    FROM spine s
    LEFT JOIN m ON s.event_type = m.event_type AND s.minute = m.minute
    """,
)
def t1_time_gapfill_series(spark, sf_dir):
    """Per-series gap filling — the production form of t1_time_gapfill:
    each series (event_type) gets its OWN minute spine spanning its own
    [min, max] range, and forward-fill runs per series.

    Scale: this is the shape that survives 100 TB where the global
    variant does not.  The spine is generated per series key from a tiny
    per-key bounds aggregate (|series| rows), so spine size is
    |series| × range ÷ grain — never proportional to event volume.  The
    spine-to-aggregate join and the forward-fill window share the same
    (series, minute) hash partitioning, so Catalyst plans one shuffle
    for the join and one sort per partition for the window; window state
    is one running value per series, and series are spread across
    executors instead of the single-reducer global window (flagged by
    plan-lint on the demo variant)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp"))
        .select("event_type", "ts", "value")
    )
    m = ev.groupBy(
        "event_type", trunc_ntz("minute", "ts").alias("minute")
    ).agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"),
    )
    bounds = ev.groupBy("event_type").agg(
        trunc_ntz("minute", F.min("ts")).alias("lo"),
        trunc_ntz("minute", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 minute"))
        ).alias("minute"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("minute")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(m, ["event_type", "minute"], "left")
        .select(
            "event_type",
            "minute",
            F.coalesce("n_raw", F.lit(0)).alias("n"),
            F.round(F.last("v", ignorenulls=True).over(w), 2).alias("v_ff"),
        )
    )


@register(
    "t1_ewma",
    oracle="""
    WITH RECURSIVE daily AS (
        SELECT event_type, date_trunc('day', ts) AS d,
               CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT))
                    AS BIGINT) AS v
        FROM events GROUP BY 1, 2),
    arr AS (SELECT event_type, list(v ORDER BY d) AS vs,
                   CAST(count(*) AS BIGINT) AS n
            FROM daily GROUP BY 1),
    rec AS (
        SELECT event_type, n, vs, CAST(1 AS BIGINT) AS i, vs[1] AS s
        FROM arr
        UNION ALL
        SELECT event_type, n, vs, i + 1,
               CAST((3 * vs[i + 1] + 7 * s) // 10 AS BIGINT) AS s
        FROM rec WHERE i < n)
    SELECT event_type, n AS n_days, vs[n] AS last_micro,
           CAST(s AS BIGINT) AS ewma_micro
    FROM rec WHERE i = n
    """,
)
def t1_ewma(spark, sf_dir):
    """Exponentially-weighted moving average (α = 0.3) of the daily
    value total per event type — the smoothing step feeding alerting /
    forecasting baselines.  EWMA is a sequential recurrence
    (sₜ = α·xₜ + (1−α)·sₜ₋₁), which no distributive aggregate
    expresses; here it runs as an IN-ROW left fold over the per-series
    ordered day array (``F.aggregate`` seeded with the first element);
    the oracle replays the identical recurrence as a DuckDB RECURSIVE
    CTE (the ``t1_holt_linear`` technique), so the engine-portability
    problem reduces to one deterministic fold.  All state is exact
    BIGINT micro-units with truncating division (α as the rational
    3/10) — the pagerank/kmeans fixed-point discipline, because a float
    recurrence drifts by an ulp per step between engines.  Every oracle
    intermediate is CAST to BIGINT: a bare DuckDB ``sum()`` is HUGEINT
    (int128), a type whose downstream ``//`` semantics and client-side
    canonicalization are version-sensitive — the r04 driver hash
    mismatch on this query (values matched bit-exact locally) traced to
    exactly that, so HUGEINT must never reach an output or fold here.

    Scale: one (event_type, day) aggregation — partial map-side sums,
    the only corpus-sized shuffle — then one O(days) array per series.
    A series' history must fit a row (fine for daily grains: 10 years
    ≈ 3.7k elements); an unbounded-grain EWMA would instead use the
    segmented scan over range-partitioned prefix products."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", trunc_ntz("day", F.col("ts")).alias("d")
    ).agg(
        F.sum(F.round(F.col("value") * 1_000_000, 0).cast("long")).alias("v")
    )
    arr = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "v"))), lambda s: s["v"]
        ).alias("vs")
    )
    return arr.select(
        "event_type",
        F.size("vs").cast("bigint").alias("n_days"),
        F.element_at("vs", -1).alias("last_micro"),
        F.expr(
            "aggregate(slice(vs, 2, size(vs) - 1), element_at(vs, 1),"
            " (acc, x) -> (3 * x + 7 * acc) div 10)"
        ).alias("ewma_micro"),
    )


@register(
    "t1_seasonal_decompose",
    oracle="""
    WITH daily AS MATERIALIZED (
        SELECT event_type,
               datediff('day', DATE '1970-01-01',
                        CAST(date_trunc('day', ts) AS DATE)) AS d,
               CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT))
                    AS BIGINT) AS v
        FROM events GROUP BY 1, 2),
    w AS (SELECT event_type, d, v,
                 count(*) OVER win AS cnt,
                 sum(v) OVER win AS s7
          FROM daily
          WINDOW win AS (PARTITION BY event_type ORDER BY d
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    t AS (SELECT event_type, d, v,
                 CASE WHEN cnt = 7 THEN s7 // 7 END AS trend
          FROM w),
    seas AS (SELECT event_type, d % 7 AS dow,
                    sum(v - trend) // count(v - trend) AS seasonal
             FROM t WHERE trend IS NOT NULL
             GROUP BY 1, 2)
    SELECT t.event_type, CAST(t.d AS BIGINT) AS d, t.v AS v_micro,
           CAST(t.trend AS BIGINT) AS trend,
           CAST(s.seasonal AS BIGINT) AS seasonal,
           CAST(t.v - t.trend - s.seasonal AS BIGINT) AS resid
    FROM t JOIN seas s
      ON s.event_type = t.event_type AND s.dow = t.d % 7
    WHERE t.trend IS NOT NULL
    """,
)
def t1_seasonal_decompose(spark, sf_dir):
    """Classical additive decomposition of each event type's daily
    series (the moving-average form of STL): trend = centered 7-day
    moving average (full windows only), seasonal = per-day-of-week mean
    of the detrended values, residual = value − trend − seasonal — the
    pre-step before anomaly thresholds (a Monday spike is only an
    anomaly net of the Monday effect).  All state is exact BIGINT
    micro-units with truncating division, so the decomposition is
    bit-identical across engines; day-of-week is d mod 7 on the epoch
    day (calendar-free, same in both).

    Scale: one (series, day) shuffle; the MA is a single 7-row window
    pass per series; the seasonal table is |series|×7 rows — a
    broadcast joined back map-side."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            trunc_ntz("day", F.col("ts")).cast("date"), F.lit("1970-01-01")
        ).alias("d"),
    ).agg(
        F.sum(F.round(F.col("value") * 1_000_000, 0).cast("long")).alias("v")
    )
    win = (
        Window.partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
    )
    t = daily.select(
        "event_type",
        "d",
        "v",
        F.when(
            F.count(F.lit(1)).over(win) == 7,
            F.expr("sum(v) over (partition by event_type order by d "
                   "rows between 3 preceding and 3 following) div 7"),
        ).alias("trend"),
    )
    det = t.filter(F.col("trend").isNotNull()).withColumn(
        "det", F.col("v") - F.col("trend")
    )
    seas = det.groupBy(
        "event_type", (F.col("d") % 7).alias("dow")
    ).agg(F.expr("sum(det) div count(det)").alias("seasonal"))
    return (
        t.filter(F.col("trend").isNotNull())
        .withColumn("dow", F.col("d") % 7)
        .join(F.broadcast(seas), ["event_type", "dow"])
        .select(
            "event_type",
            F.col("d").cast("bigint").alias("d"),
            F.col("v").alias("v_micro"),
            F.col("trend").cast("bigint").alias("trend"),
            F.col("seasonal").cast("bigint").alias("seasonal"),
            (F.col("v") - F.col("trend") - F.col("seasonal"))
            .cast("bigint")
            .alias("resid"),
        )
    )


@register(
    "t1_acf",
    oracle="""
    WITH daily AS MATERIALIZED (
        SELECT event_type,
               datediff('day', DATE '1970-01-01',
                        CAST(date_trunc('day', ts) AS DATE)) AS d,
               sum(CAST(round(value * 100, 0) AS BIGINT)) AS v
        FROM events GROUP BY 1, 2),
    arr AS (SELECT event_type, list(v ORDER BY d) AS a FROM daily GROUP BY 1),
    m AS (SELECT event_type, a, len(a) AS n,
                 list_sum(a) // len(a) AS mu
          FROM arr),
    base AS (SELECT event_type, a, n, mu,
                    list_sum(list_transform(a, x ->
                      (x - mu) * (x - mu))) AS denom
             FROM m),
    lags AS (SELECT event_type, n, mu, denom, a,
                    unnest(range(1, 8)) AS lag
             FROM base)
    SELECT event_type, CAST(lag AS INT) AS lag,
           CAST(list_sum(list_transform(range(1, n - lag + 1), t ->
                  (a[t + lag] - mu) * (a[t] - mu))) AS BIGINT) AS acov_num,
           CAST(denom AS BIGINT) AS denom,
           round(CAST(list_sum(list_transform(range(1, n - lag + 1), t ->
                  (a[t + lag] - mu) * (a[t] - mu))) AS DOUBLE)
                 / denom, 6) AS acf
    FROM lags
    """,
)
def t1_acf(spark, sf_dir):
    """Autocorrelation function of each event type's daily series, lags
    1..7 — the forecasting diagnostic that tells you whether yesterday
    (lag 1) or last week (lag 7) predicts today.  The biased estimator
    rₖ = Σ(xₜ−x̄)(xₜ₋ₖ−x̄) / Σ(xₜ−x̄)² with an integerized mean
    (sum div n): numerator and denominator are EXACT BIGINT products —
    the series is accumulated in cents, not micro-units, precisely so a
    squared deviation times a year of days stays inside int64 — and
    only the final ratio is a double, rounded at the output edge (the
    house decimal discipline).

    Scale: one (series, day) shuffle; the 7 lags are in-row transforms
    over the per-series array, no self-join against a shifted copy."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            trunc_ntz("day", F.col("ts")).cast("date"), F.lit("1970-01-01")
        ).alias("d"),
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("v"))
    arr = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "v"))), lambda s: s["v"]
        ).alias("a")
    )
    base = arr.select(
        "event_type",
        "a",
        F.size("a").alias("n"),
        F.expr("aggregate(a, 0L, (acc, x) -> acc + x) div size(a)").alias(
            "mu"
        ),
    ).withColumn(
        "denom",
        F.expr("aggregate(a, 0L, (acc, x) -> acc + (x - mu) * (x - mu))"),
    )
    lags = base.select(
        "event_type",
        "n",
        "mu",
        "denom",
        "a",
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("lag"),
    )
    num = F.expr(
        """aggregate(transform(sequence(1, n - lag), t ->
             (element_at(a, t + lag) - mu) * (element_at(a, t) - mu)),
           0L, (acc, x) -> acc + x)"""
    )
    return lags.select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        num.cast("bigint").alias("acov_num"),
        F.col("denom").cast("bigint").alias("denom"),
        F.round(num.cast("double") / F.col("denom"), 6).alias("acf"),
    )


@register(
    "t1_holt_linear",
    oracle="""
    WITH RECURSIVE daily AS (
        SELECT event_type,
               datediff('day', DATE '1970-01-01',
                        CAST(date_trunc('day', ts) AS DATE)) AS d,
               sum(CAST(round(value * 1000000, 0) AS BIGINT)) AS v
        FROM events GROUP BY 1, 2),
    arr AS (SELECT event_type, list(v ORDER BY d) AS a, count(*) AS n
            FROM daily GROUP BY 1),
    rec AS (
        SELECT event_type, n, a, 2 AS i,
               a[1] AS l, a[2] - a[1] AS b
        FROM arr WHERE n >= 2
        UNION ALL
        SELECT event_type, n, a, i + 1,
               (3 * a[i + 1] + 7 * (l + b)) // 10 AS l,
               (2 * ((3 * a[i + 1] + 7 * (l + b)) // 10 - l) + 8 * b) // 10
                 AS b
        FROM rec WHERE i < n)
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(l AS BIGINT) AS level_micro,
           CAST(b AS BIGINT) AS trend_micro,
           CAST(l + b AS BIGINT) AS forecast_micro
    FROM rec WHERE i = n
    """,
)
def t1_holt_linear(spark, sf_dir):
    """Holt double exponential smoothing (Holt 1957) per event type —
    level AND trend state (α = 0.3, β = 0.2 as exact rationals), so
    unlike t1_ewma the one-step forecast (level + trend) tracks a
    drifting series instead of lagging it.  The two-variable recurrence
    runs as an in-row fold with a STRUCT accumulator (init: level = x₁,
    trend = x₂ − x₁); the oracle replays the identical recurrence as a
    DuckDB RECURSIVE CTE — the third oracle technique in the repo next
    to unrolled rounds and list_reduce folds, needed here because
    list_reduce cannot carry two state variables.  Truncating integer
    division keeps every step bit-identical (both engines truncate
    toward zero for all signs; the (a − a mod 10)/10 form below is
    exactly that in Column arithmetic, which has no div operator
    inside lambdas).

    Scale: same as t1_ewma — one (series, day) shuffle, then O(days)
    in-row state per series."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            trunc_ntz("day", F.col("ts")).cast("date"), F.lit("1970-01-01")
        ).alias("d"),
    ).agg(
        F.sum(F.round(F.col("value") * 1_000_000, 0).cast("long")).alias("v")
    )
    arr = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "v"))), lambda s: s["v"]
        ).alias("vs")
    ).filter(F.size("vs") >= 2)

    def tdiv10(c):
        # truncating /10 for either sign: a - (a % 10) is exactly
        # divisible and Spark's % follows the dividend's sign
        return ((c - (c % F.lit(10))) / 10).cast("long")

    def step(acc, x):
        l_new = tdiv10(3 * x + 7 * (acc["l"] + acc["b"]))
        b_new = tdiv10(2 * (l_new - acc["l"]) + 8 * acc["b"])
        return F.struct(l_new.alias("l"), b_new.alias("b"))

    init = F.struct(
        F.element_at("vs", 1).alias("l"),
        (F.element_at("vs", 2) - F.element_at("vs", 1)).alias("b"),
    )
    st = arr.select(
        "event_type",
        F.size("vs").cast("bigint").alias("n_days"),
        F.aggregate(
            F.expr("slice(vs, 3, size(vs) - 2)"), init, step
        ).alias("st"),
    )
    return st.select(
        "event_type",
        "n_days",
        F.col("st.l").cast("bigint").alias("level_micro"),
        F.col("st.b").cast("bigint").alias("trend_micro"),
        (F.col("st.l") + F.col("st.b")).cast("bigint").alias("forecast_micro"),
    )
