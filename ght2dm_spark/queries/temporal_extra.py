"""Second wave of temporal operators: SCD2 point-in-time lookup,
bidirectional nearest-event join, time-weighted average (TWAP), and
OHLC bar aggregation.

All four are classic warehouse/feature-store shapes Spark lacks as
built-ins.  Each reuses the union-and-window as-of machinery
(operators/temporal.py) or plain windowed aggregation — one shuffle on
the entity key, no inequality joins — and each is checked against a
structurally DIFFERENT DuckDB formulation (interval-containment join,
native ASOF in both directions, lead()-based interval weighting,
arg_min/arg_max), so the oracle validates semantics rather than
mirroring the implementation.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ght2dm_spark.functions import epoch_us, trunc_ntz
from ght2dm_spark.io import load_table
from ght2dm_spark.operators.temporal import asof_join
from ght2dm_spark.queries.registry import register


@register(
    "t1_pit_join",
    oracle="""
    WITH v0 AS (
        SELECT o_custkey AS user_id, o_orderdate AS valid_from,
               max(o_orderkey) AS dim_orderkey
        FROM orders GROUP BY 1, 2
    ),
    v AS (
        SELECT user_id, valid_from, dim_orderkey,
               row_number() OVER (PARTITION BY user_id ORDER BY valid_from)
                 AS version,
               lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
                 AS valid_to
        FROM v0
    )
    SELECT e.event_id, e.user_id, v.version, v.dim_orderkey
    FROM events e
    JOIN v ON e.user_id = v.user_id
          AND e.ts >= v.valid_from
          AND (v.valid_to IS NULL OR e.ts < v.valid_to)
    """,
)
def t1_pit_join(spark, sf_dir):
    """Point-in-time (SCD2) dimension lookup: each event reads the
    dimension version that was valid AT its timestamp.  The dimension's
    validity intervals are built from order history (valid_from = order
    date, valid_to = next order date via lead(), last version
    open-ended), then the lookup is the backward as-of join — correct
    because "latest valid_from <= ts" IS "the interval containing ts"
    when intervals tile the timeline.  Inner semantics: events before a
    user's first version drop out.

    The oracle joins on explicit interval containment (BETWEEN-style
    predicates), so it independently verifies the as-of reduction.

    Scale: the as-of form is one shuffle on user_id + one partition-local
    sort — no interval explosion, no inequality join.  An interval join
    at 100 TB would either BroadcastNestedLoop (unbounded) or require
    binning; tiling intervals make as-of strictly better."""
    o = load_table(spark, sf_dir, "orders")
    v0 = (
        o.groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("valid_from"),
        ).agg(F.max("o_orderkey").alias("dim_orderkey"))
    )
    wv = Window.partitionBy("user_id").orderBy("valid_from")
    v = v0.select(
        "user_id",
        "valid_from",
        "dim_orderkey",
        F.row_number().over(wv).cast("long").alias("version"),
    )
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    out = asof_join(
        ev,
        v,
        key="user_id",
        left_ts="ts",
        right_ts="valid_from",
        payload=["version", "dim_orderkey"],
    )
    return out.filter(F.col("version").isNotNull()).select(
        "event_id", "user_id", "version", "dim_orderkey"
    )


@register(
    "t1_nearest_event_join",
    oracle="""
    WITH c AS (
        SELECT user_id, ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ),
    p AS (
        SELECT event_id, user_id, ts
        FROM events WHERE event_type = 'purchase'
    ),
    b AS (
        SELECT p.event_id, p.user_id, p.ts,
               cb.click_id AS b_id, epoch_us(p.ts) - epoch_us(cb.ts) AS b_d
        FROM p ASOF LEFT JOIN c cb
          ON p.user_id = cb.user_id AND p.ts >= cb.ts
    ),
    bf AS (
        SELECT b.event_id, b.b_id, b.b_d,
               cf.click_id AS f_id, epoch_us(cf.ts) - epoch_us(b.ts) AS f_d
        FROM b ASOF LEFT JOIN c cf
          ON b.user_id = cf.user_id AND b.ts <= cf.ts
    )
    SELECT event_id AS purchase_id,
           CASE WHEN b_id IS NULL AND f_id IS NULL THEN NULL
                WHEN f_id IS NULL THEN b_id
                WHEN b_id IS NULL THEN f_id
                WHEN b_d <= f_d THEN b_id ELSE f_id END AS nearest_click_id,
           CASE WHEN b_id IS NULL AND f_id IS NULL THEN NULL
                WHEN f_id IS NULL THEN b_d
                WHEN b_id IS NULL THEN f_d
                WHEN b_d <= f_d THEN b_d ELSE f_d END AS delta_us
    FROM bf
    """,
)
def t1_nearest_event_join(spark, sf_dir):
    """Nearest-neighbor temporal join: each purchase finds the CLOSEST
    click of the same user in either time direction (ties go backward).
    Composition: backward as-of + forward as-of (the same operator run
    on negated epoch-micros — "latest -t' <= -t" is "earliest t' >= t"),
    then an arithmetic pick of the smaller absolute delta.  Checked
    against DuckDB's native ASOF JOIN in both directions.

    Scale: two as-of passes = two windows over the SAME user_id
    partitioning (one shuffle reused), versus the naive |P|×|C| per-user
    cross product.  Clicks are pre-deduped per (user, ts) keeping max
    event_id so both engines break exact-timestamp ties identically."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", epoch_us("ts").alias("c_us"))
        .agg(F.max("event_id").alias("b_id"))
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", epoch_us("ts").alias("p_us"))
        .withColumn("np_us", -F.col("p_us"))
    )
    back = asof_join(
        purch,
        clicks.withColumn("b_us", F.col("c_us")),
        key="user_id",
        left_ts="p_us",
        right_ts="c_us",
        payload=["b_id", "b_us"],
    )
    fwd_side = clicks.select(
        "user_id",
        (-F.col("c_us")).alias("nc_us"),
        F.col("b_id").alias("f_id"),
        F.col("c_us").alias("f_us"),
    )
    both = asof_join(
        back,
        fwd_side,
        key="user_id",
        left_ts="np_us",
        right_ts="nc_us",
        payload=["f_id", "f_us"],
    )
    b_d = F.col("p_us") - F.col("b_us")
    f_d = F.col("f_us") - F.col("p_us")
    pick_b = (
        F.col("f_id").isNull()
        | (F.col("b_id").isNotNull() & (b_d <= f_d))
    )
    return both.select(
        F.col("event_id").alias("purchase_id"),
        F.when(F.col("b_id").isNull() & F.col("f_id").isNull(), F.lit(None))
        .when(pick_b, F.col("b_id"))
        .otherwise(F.col("f_id"))
        .alias("nearest_click_id"),
        F.when(F.col("b_id").isNull() & F.col("f_id").isNull(), F.lit(None))
        .when(pick_b, b_d)
        .otherwise(f_d)
        .alias("delta_us"),
    )


@register(
    "t1_twap",
    oracle="""
    WITH s AS (
        SELECT user_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c,
               epoch_us(ts) AS t_us,
               lead(epoch_us(ts))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt_us
        FROM events
    )
    SELECT user_id, count(*) AS n_intervals,
           round(CAST(sum(CAST(v_c * (nxt_us - t_us) AS DECIMAL(28,0))) AS DOUBLE)
                 / CAST(sum(CAST(nxt_us - t_us AS DECIMAL(28,0))) AS DOUBLE)
                 / 100.0, 6) AS twap
    FROM s WHERE nxt_us IS NOT NULL
    GROUP BY user_id
    """,
)
def t1_twap(spark, sf_dir):
    """Time-weighted average (TWAP): each observation's value holds until
    the next observation (step interpolation); the average weights each
    value by its holding duration — the correct mean for irregularly
    sampled series, where the arithmetic mean over-weights bursts.
    Durations come from lead() over (ts, event_id); the last observation
    per user has no duration and is excluded (both engines).

    Exactness: value quantized to integer cents (the column's actual
    granularity — measured 2-decimal at every SF), so value·duration
    products run in LONG (cents·micros ≤ 5.6e16 per term at the column's
    value bound — the int128 decimal products this replaced were
    measured 1.6× slower at the 10× scale point) and only the SUMS are
    decimal (exact, unbounded).  The final ratio is double, rounded to
    6 digits, identically in both engines.

    Scale: one shuffle on user_id shared by the lead() window and the
    aggregation (same key), partial aggregation map-side.  No state
    beyond one window row of lookahead."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v_c"),
        epoch_us("ts").alias("t_us"),
        F.lead(epoch_us("ts")).over(w).alias("nxt_us"),
    ).filter(F.col("nxt_us").isNotNull())
    dur = F.col("nxt_us") - F.col("t_us")
    return (
        s.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum((F.col("v_c") * dur).cast("decimal(28,0)"))
            .cast("double")
            .alias("_num"),
            F.sum(dur.cast("decimal(28,0)")).cast("double").alias("_den"),
        )
        .select(
            "user_id",
            "n_intervals",
            F.round(F.col("_num") / F.col("_den") / 100.0, 6).alias("twap"),
        )
    )


@register(
    "t1_ohlc",
    oracle="""
    WITH s AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               value,
               CAST(epoch_us(ts) AS HUGEINT) * 18446744073709551616
                 + event_id AS ord_key
        FROM events
    )
    SELECT event_type, day,
           arg_min(value, ord_key) AS open_v,
           max(value) AS high_v,
           min(value) AS low_v,
           arg_max(value, ord_key) AS close_v,
           count(*) AS n_obs,
           CAST(sum(CAST(value AS DECIMAL(19,2))) AS DOUBLE) AS volume
    FROM s
    GROUP BY event_type, day
    """,
)
def t1_ohlc(spark, sf_dir):
    """OHLC bar aggregation (candlesticks): per series per day, the
    first/highest/lowest/last value plus count and exact-decimal volume.
    Open/close are positional aggregates — min_by/max_by over a total
    ordering key so first/last are deterministic even at duplicate
    timestamps.  The key is a STRUCT(epoch_us, event_id) — Spark
    compares structs lexicographically in codegen; the zero-padded
    string key this replaced built two lpads + a concat per row and was
    measured 1.6× slower at the 10× scale point.  DuckDB has no struct
    arg_min, so the oracle packs the same pair into a HUGEINT
    (epoch_us·2⁶⁴ + event_id) — a different encoding of the SAME total
    order (event_id is a nonneg long), which keeps the check
    independent.

    Scale: a single groupBy — min_by/max_by are ordinary partial-final
    aggregates (each partial carries one candidate row), so the bar
    build is one shuffle of |series|×|days| groups with map-side
    combine; no window, no sort of the raw series."""
    ev = load_table(spark, sf_dir, "events")
    ord_key = F.struct(
        epoch_us("ts").alias("us"), F.col("event_id").alias("eid")
    )
    return (
        ev.select(
            "event_type",
            trunc_ntz("day", "ts").alias("day"),
            "value",
            ord_key.alias("ord_key"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.min_by("value", "ord_key").alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.max_by("value", "ord_key").alias("close_v"),
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(F.col("value").cast("decimal(19,2)")).cast("double").alias("volume"),
        )
    )


@register(
    "t1_interval_union",
    oracle="""
    WITH iv AS (
        SELECT user_id, event_id, epoch_us(ts) AS s_us,
               epoch_us(ts)
                 + CAST(CAST(value AS DECIMAL(19,6)) * 1000000 AS BIGINT)
                 AS e_us
        FROM events
    ),
    sw AS (
        SELECT user_id, s_us, e_us,
               max(e_us) OVER (PARTITION BY user_id
                               ORDER BY s_us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS prev_end
        FROM iv
    )
    SELECT user_id,
           count(*) AS n_intervals,
           CAST(sum(CASE WHEN prev_end IS NULL OR s_us > prev_end
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_blocks,
           CAST(sum(greatest(0, e_us - greatest(s_us,
                    coalesce(prev_end, s_us)))) AS BIGINT) AS covered_us
    FROM sw GROUP BY user_id
    """,
)
def t1_interval_union(spark, sf_dir):
    """Interval-union coverage (sweep line): each event spans
    [ts, ts + value seconds]; per user, the total time covered by the
    UNION of those spans plus the count of disjoint merged blocks —
    double-counting overlaps is the classic bug in "time spent" /
    machine-utilization metrics, and naive sum-of-durations gets it
    wrong.  One pass: sort the user's intervals by start, carry the
    running max end over PRECEDING rows, and each row contributes only
    its uncovered suffix (greatest(0, end − greatest(start, prev_end))).
    Durations are integer micros derived via decimal quantization, so
    the sums are exact.

    Scale: one shuffle on user_id; the sweep is a partition-local sort
    with O(1) window state — versus the quadratic self-join of
    interval-overlap formulations.  The same shuffled sort feeds the
    final per-user aggregate."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        epoch_us("ts").alias("s_us"),
        (
            epoch_us("ts")
            + (F.col("value").cast("decimal(19,6)") * 1000000)
            .cast("bigint")
        ).alias("e_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sw = iv.select(
        "user_id",
        "s_us",
        "e_us",
        F.max("e_us").over(w).alias("prev_end"),
    )
    new_block = F.when(
        F.col("prev_end").isNull() | (F.col("s_us") > F.col("prev_end")), 1
    ).otherwise(0)
    contrib = F.greatest(
        F.lit(0),
        F.col("e_us")
        - F.greatest(F.col("s_us"), F.coalesce("prev_end", "s_us")),
    )
    return sw.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(new_block).alias("n_blocks"),
        F.sum(contrib).alias("covered_us"),
    )


@register(
    "t1_overlap_join",
    oracle="""
    WITH iv AS (
        SELECT user_id, event_id, epoch_us(ts) AS s_us,
               epoch_us(ts) + 3600000000 AS e_us
        FROM events WHERE user_id % 40 = 0
    ),
    a AS (SELECT * FROM iv WHERE event_id % 2 = 0),
    b AS (SELECT * FROM iv WHERE event_id % 2 = 1),
    p AS (
        SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
               least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us) AS ov_us
        FROM a JOIN b ON a.user_id = b.user_id
         AND a.s_us < b.e_us AND b.s_us < a.e_us
    )
    SELECT user_id, count(*) AS n_pairs,
           CAST(sum(ov_us) AS BIGINT) AS overlap_us,
           CAST(max(ov_us) AS BIGINT) AS max_overlap_us
    FROM p GROUP BY user_id
    """,
)
def t1_overlap_join(spark, sf_dir):
    """Pairwise interval-OVERLAP join with overlap durations — the
    temporal join behind ad-exposure × session attribution, machine
    co-residency billing, and on-call overlap audits (t1_interval_union
    measures one set's coverage; this measures how two sets intersect
    each other).  Two interval sets per user (even/odd events, one-hour
    spans) join on the user key plus the strict-overlap predicate
    a.start < b.end AND b.start < a.end; each pair contributes
    min(ends) − max(starts) integer microseconds.

    Scale: the equi key (user_id) carries the shuffle; the range
    predicates evaluate inside the per-key join — never a cross
    product (the t1_range_join discipline).  Per-user interval counts
    bound the pair work; a production run adds coarse time-bucket
    blocking to the key exactly like the range join does.  Durations
    stay integer micros end to end."""
    iv = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 40 == 0)
        .select(
            "user_id",
            "event_id",
            epoch_us("ts").alias("s_us"),
            (epoch_us("ts") + F.lit(3_600_000_000)).alias("e_us"),
        )
    )
    a = iv.filter(F.col("event_id") % 2 == 0).select(
        "user_id", F.col("event_id").alias("a_id"),
        F.col("s_us").alias("a_s"), F.col("e_us").alias("a_e"),
    )
    b = iv.filter(F.col("event_id") % 2 == 1).select(
        "user_id", F.col("event_id").alias("b_id"),
        F.col("s_us").alias("b_s"), F.col("e_us").alias("b_e"),
    )
    p = a.join(
        b,
        ["user_id"],
    ).filter((F.col("a_s") < F.col("b_e")) & (F.col("b_s") < F.col("a_e")))
    ov = F.least("a_e", "b_e") - F.greatest("a_s", "b_s")
    return (
        p.select("user_id", ov.alias("ov_us"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("ov_us").cast("bigint").alias("overlap_us"),
            F.max("ov_us").cast("bigint").alias("max_overlap_us"),
        )
    )
