"""Event-time windowing over the ``events`` table (SURVEY §2.9
"Streaming (events)"): tumbling / sliding / session windows in batch form,
plus genuinely-streaming variants (readStream → AvailableNow → memory
sink) whose results are still exactly oracle-checked.

Window-start alignment: Spark tumbling/sliding windows align to the epoch;
the oracles reproduce that with integer epoch math rather than
date_trunc/time_bucket (whose origins differ across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ght2dm_spark.functions import epoch_us
from ght2dm_spark.io import load_table
from ght2dm_spark.queries.registry import register
from ght2dm_spark.streaming import read_events_stream, run_to_completion

_TUMBLE_SQL = """
    SELECT make_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) * 1000000) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
"""


def _tumbling_agg(ev: DataFrame) -> DataFrame:
    """Shared by the batch and streaming forms — identical logical plan on
    both sides of the batch/stream equivalence check."""
    return (
        ev.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_tv"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            F.col("_tv").cast("double").alias("total_value"),
        )
    )


@register("t1_tumbling_window", oracle=_TUMBLE_SQL)
def t1_tumbling_window(spark, sf_dir):
    """15-minute tumbling windows × event_type: one shuffle on
    (window, type); partial aggregation map-side.  Epoch-aligned starts
    match the oracle's integer epoch math."""
    return _tumbling_agg(load_table(spark, sf_dir, "events"))


@register(
    "t1_sliding_window",
    oracle="""
    WITH starts AS (
        SELECT ts, value,
               make_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) * 1000000) AS window_start
        FROM events
        UNION ALL
        SELECT ts, value,
               make_timestamp(CAST(floor(epoch(ts) / 900) * 900 - 900 AS BIGINT) * 1000000) AS window_start
        FROM events
    )
    SELECT window_start,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM starts
    GROUP BY 1
    """,
)
def t1_sliding_window(spark, sf_dir):
    """30-minute windows sliding by 15: every event lands in exactly two
    windows (width/slide = 2 — the oracle enumerates both starts
    explicitly).  Spark's window() does the replication internally."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "30 minutes", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_tv"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            F.col("_tv").cast("double").alias("total_value"),
        )
    )


@register(
    "t1_session_window",
    oracle="""
    WITH o AS (
        SELECT user_id, ts, event_id, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev
        FROM events
    ),
    m AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) >= 14400
                    THEN 1 ELSE 0 END AS new_s
        FROM o
    ),
    s AS (
        SELECT user_id, ts, value,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM m
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 4 HOUR AS session_end,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM s
    GROUP BY user_id, sid
    """,
)
def t1_session_window(spark, sf_dir):
    """Per-user session windows with a 4-hour gap.  Spark merges events
    closer than the gap and extends the session to last_ts + gap; the
    oracle is the classic gaps-and-islands rewrite (lag → new-session
    flag → running sum → group), with the same >= gap boundary rule."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "4 hours").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_tv"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            F.col("_tv").cast("double").alias("total_value"),
        )
    )


@register("t1_stream_tumbling", oracle=_TUMBLE_SQL)
def t1_stream_tumbling(spark, sf_dir):
    """The tumbling agg as a REAL streaming job: readStream over the
    events parquet, 10-minute watermark, AvailableNow trigger, memory
    sink — micro-batch planner and state store genuinely run, and the
    final state exactly equals the batch result (same oracle)."""
    stream = read_events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    return run_to_completion(_tumbling_agg(stream), output_mode="complete").select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


@register(
    "t1_stream_dedup",
    oracle="SELECT DISTINCT event_id, user_id FROM events",
)
def t1_stream_dedup(spark, sf_dir):
    """Streaming stateful dedup: the stream unioned with itself (every
    event arrives twice) → dropDuplicates on event_id emits each exactly
    once.  Production form bounds state with
    dropDuplicatesWithinWatermark; the unbounded form keeps the demo
    deterministic (which copy wins is irrelevant to the projected key)."""
    s1 = read_events_stream(spark, sf_dir).select("event_id", "user_id")
    s2 = read_events_stream(spark, sf_dir).select("event_id", "user_id")
    deduped = s1.union(s2).dropDuplicates(["event_id"])
    return run_to_completion(deduped, output_mode="append", row_grain_state=True)


@register(
    "t1_stream_dedup_watermark",
    oracle="SELECT DISTINCT event_id, user_id FROM events",
)
def t1_stream_dedup_watermark(spark, sf_dir):
    """Streaming dedup with BOUNDED state: dropDuplicatesWithinWatermark
    evicts each key once the watermark passes its event time + horizon,
    so state tracks the horizon, not history — the production form of
    t1_stream_dedup for unbounded feeds (exact dedup only among rows
    whose event times fall within the horizon of each other, which is
    the guarantee ingestion pipelines actually need: replays and
    at-least-once redelivery arrive close together).

    The fixture's duplicate stream (the source unioned with itself)
    delivers both copies in the same micro-batch, so the drained result
    equals global DISTINCT regardless of horizon — keeping the oracle
    exact while the state-eviction machinery genuinely runs.
    ``expect_single_batch`` turns that assumption into an assertion: a
    future maxFilesPerTrigger/multi-file source that split the copies
    across batches would fail loudly here, not flake the oracle."""
    s1 = read_events_stream(spark, sf_dir).select("event_id", "user_id", "ts")
    s2 = read_events_stream(spark, sf_dir).select("event_id", "user_id", "ts")
    deduped = (
        s1.union(s2)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id")
    )
    return run_to_completion(
        deduped, output_mode="append", expect_single_batch=True, row_grain_state=True
    )


@register(
    "t1_stream_session_append",
    oracle="""
    WITH o AS (
        SELECT user_id, ts, event_id, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev
        FROM events
    ),
    m AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) >= 14400
                    THEN 1 ELSE 0 END AS new_s
        FROM o
    ),
    s AS (
        SELECT user_id, ts, value,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM m
    ),
    g AS (
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 4 HOUR AS session_end,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_value
        FROM s GROUP BY user_id, sid
    )
    SELECT * FROM g
    WHERE session_end <= (SELECT max(ts) - INTERVAL 30 MINUTE FROM events)
    """,
)
def t1_stream_session_append(spark, sf_dir):
    """Streaming sessionization in APPEND mode: per-user 4-hour-gap
    session windows over readStream, 30-minute watermark, AvailableNow.
    Unlike the complete-mode aggs, append emits each session exactly
    once, when the watermark passes its end — the production shape for
    an unbounded session feed (state is evicted as sessions finalize,
    so state size tracks the number of OPEN sessions, not history).

    Sessions ending within the final watermark horizon (max event time −
    30 min) are still open in state at shutdown and are NOT emitted; the
    oracle applies the same cutoff to the gaps-and-islands rewrite.
    Boundary note: Spark tracks the watermark at millisecond precision
    while the oracle keeps micros — a session ending inside that sub-ms
    sliver could differ, but event times here never tie the cutoff.

    Scale: each micro-batch shuffles only its delta on user_id; the
    state store holds one (start, end, partial agg) per open session,
    merged via the session-window state format — no per-event state."""
    stream = read_events_stream(spark, sf_dir).withWatermark("ts", "30 minutes")
    agg = (
        stream.groupBy(F.session_window("ts", "4 hours").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_tv"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
            F.col("_tv").cast("double").alias("total_value"),
        )
    )
    return run_to_completion(agg, output_mode="append")


@register(
    "t1_stream_stream_join",
    oracle="""
    SELECT p.event_id AS p_id, c.event_id AS c_id
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
)
def t1_stream_stream_join(spark, sf_dir):
    """Stream-stream interval join: purchases matched to the same
    user's clicks in the preceding hour, both sides real streams with
    2-hour watermarks.  An INNER join emits matches as both sides
    arrive, so the drained result equals the batch join exactly — the
    watermarks exist to BOUND STATE: each side buffers only rows inside
    its watermark horizon, which is what makes an unbounded two-stream
    join feasible (state is horizon-sized, not history-sized).

    Scale: each micro-batch shuffles both deltas on user_id; the
    time-range predicate prunes buffered state per key.  The batch form
    of this plan is the as-of/range join family (t1_asof_join,
    t1_range_join)."""

    def side(pred, ids):
        return (
            read_events_stream(spark, sf_dir)
            .filter(F.col("event_type") == pred)
            .select(
                F.col("event_id").alias(f"{ids}_id"),
                F.col("user_id").alias(f"{ids}_uid"),
                F.col("ts").alias(f"{ids}_ts"),
            )
            .withWatermark(f"{ids}_ts", "2 hours")
        )

    p, c = side("purchase", "p"), side("click", "c")
    cond = (
        (F.col("p_uid") == F.col("c_uid"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts"))
    )
    return run_to_completion(
        p.join(c, cond).select("p_id", "c_id"),
        output_mode="append",
        row_grain_state=True,
    )


@register(
    "t1_stream_stateful_counts",
    oracle="""
    SELECT user_id, count(*) AS n,
           min(event_id) AS first_event, max(event_id) AS last_event
    FROM events GROUP BY user_id
    """,
)
def t1_stream_stateful_counts(spark, sf_dir):
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running (count, min event_id, max event_id) held in an
    explicit state row, updated per micro-batch from pandas — the escape
    hatch for state machines window aggregates can't express (the
    declared-query form of the test-suite operator).  Integer-only state
    keeps it exactly oracle-checkable; update-mode re-emissions collapse
    via a monotone max/min normalization.

    Scale: state lives in the checkpointed state store, one row per
    user, shuffled on the group key per micro-batch — the same state
    sizing argument as the windowed aggs, but user-controlled."""
    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n", LongType()),
            StructField("first_event", LongType()),
            StructField("last_event", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("lo", LongType()),
            StructField("hi", LongType()),
        ]
    )

    def track(key, pdf_iter, state):
        n, lo, hi = state.get if state.exists else (0, None, None)
        for pdf in pdf_iter:
            ids = pdf["event_id"]
            n += len(ids)
            bl, bh = int(ids.min()), int(ids.max())
            lo = bl if lo is None else min(lo, bl)
            hi = bh if hi is None else max(hi, bh)
        state.update((n, lo, hi))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n": [n], "first_event": [lo],
             "last_event": [hi]}
        )

    stream = (
        read_events_stream(spark, sf_dir)
        .select("user_id", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            track, out_schema, state_schema, "update", "NoTimeout"
        )
    )
    got = run_to_completion(stream, output_mode="update")
    return got.groupBy("user_id").agg(
        F.max("n").alias("n"),
        F.min("first_event").alias("first_event"),
        F.max("last_event").alias("last_event"),
    )


_OHLC_STREAM_SQL = """
    WITH s AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
                 AS window_start,
               value,
               CAST(epoch_us(ts) AS HUGEINT) * 18446744073709551616
                 + event_id AS ord_key
        FROM events
    )
    SELECT event_type, window_start,
           arg_min(value, ord_key) AS open_v,
           max(value) AS high_v,
           min(value) AS low_v,
           arg_max(value, ord_key) AS close_v,
           count(*) AS n_obs
    FROM s GROUP BY event_type, window_start
"""


@register("t1_stream_ohlc", oracle=_OHLC_STREAM_SQL)
def t1_stream_ohlc(spark, sf_dir):
    """Daily OHLC bars computed BY THE STREAMING ENGINE: readStream →
    1-day epoch-aligned event-time windows → min_by/max_by positional
    aggregates → AvailableNow → memory sink.  Positional aggregates are
    the interesting case for streaming state: each partial carries one
    candidate (ord_key, value) pair per extreme and merges across
    micro-batches — the final bars exactly equal the batch/DuckDB
    arg_min/arg_max result (same total order as t1_ohlc: struct key in
    Spark, HUGEINT-packed in the oracle).

    Scale: state per (series, day) key is O(1) — four candidate pairs
    and two counters; the watermark lets the store evict closed days.
    This is the standing-query form of the bar builder a market-data /
    metrics pipeline keeps running."""
    stream = read_events_stream(spark, sf_dir).withWatermark("ts", "1 day")
    # struct ordering key, HUGEINT-packed in the oracle — same total
    # order, same rationale as t1_ohlc (string build measured 1.6x slower)
    ord_key = F.struct(epoch_us("ts").alias("us"), F.col("event_id").alias("eid"))
    bars = (
        stream.select("event_type", "ts", "value", ord_key.alias("ord_key"))
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.min_by("value", "ord_key").alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.max_by("value", "ord_key").alias("close_v"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    return run_to_completion(bars, output_mode="complete").select(
        "event_type",
        F.col("w.start").cast("timestamp_ntz").alias("window_start"),
        "open_v",
        "high_v",
        "low_v",
        "close_v",
        "n_obs",
    )
