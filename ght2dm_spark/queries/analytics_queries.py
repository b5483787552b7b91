"""Product-analytics shapes over ``events`` / ``customer``: sequential
funnel conversion, deterministic string aggregation, and distribution
window functions (ntile / percent_rank / cume_dist).

These close the remaining gaps in the window/aggregate surface that the
reference's ad-hoc analytics queries exercise.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ght2dm_spark.functions import trunc_ntz
from ght2dm_spark.io import load_table
from ght2dm_spark.queries.registry import register


@register(
    "t1_event_funnel",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e
          JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e
          JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_click,
           (SELECT count(*) FROM p) AS n_purchase
    """,
)
def t1_event_funnel(spark, sf_dir):
    """Sequential funnel view→click→purchase: a user converts a stage
    only with an event strictly after their previous stage's first
    event.  Each stage is one groupBy-min plus a join of the converted-
    user frame back onto events — no hint: at small SF AQE broadcasts
    the stage frame, at 100 TB (hundreds of millions of users) it
    becomes a shuffle-hash join on user_id.  Events are scanned per
    stage but never shuffled whole; stage frames (≤ one row per user)
    are the only shuffled data."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def stage(prev, etype, prev_ts, out_ts):
        e = ev.filter(F.col("event_type") == etype)
        if prev is None:
            g = e
        else:
            g = e.join(prev, "user_id").filter(F.col("ts") > F.col(prev_ts))
        return g.groupBy("user_id").agg(F.min("ts").alias(out_ts))

    v = stage(None, "view", None, "v_ts")
    c = stage(v, "click", "v_ts", "c_ts")
    p = stage(c, "purchase", "c_ts", "p_ts")
    counts = [
        df.agg(F.count(F.lit(1)).alias(name))
        for df, name in [(v, "n_view"), (c, "n_click"), (p, "n_purchase")]
    ]
    return counts[0].crossJoin(counts[1]).crossJoin(counts[2])


@register(
    "t1_listagg",
    oracle="""
    SELECT n.n_name, string_agg(c.c_name, ',' ORDER BY c.c_name) AS members,
           count(*) AS n
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def t1_listagg(spark, sf_dir):
    """Deterministic string aggregation (LISTAGG): collect_list has no
    cross-partition order, so sort the array before joining — the only
    way a distributed string_agg can be reproducible.  The nation dim
    broadcasts; one shuffle on nationkey."""
    c = load_table(spark, sf_dir, "customer").select("c_nationkey", "c_name")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("members"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "t1_window_distribution",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def t1_window_distribution(spark, sf_dir):
    """Distribution window functions per market segment.  c_custkey
    tie-breaks the ordering so ntile is deterministic under equal
    balances; percent_rank/cume_dist are exact rational divisions —
    identical IEEE doubles on both engines, rounded only for output
    hygiene."""
    w = (
        Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    )
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "t1_markov_transitions",
    oracle="""
    WITH o AS (SELECT user_id, event_type AS cur,
                      lead(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS nxt
               FROM events),
    c AS (SELECT cur, nxt, count(*) AS n FROM o
          WHERE nxt IS NOT NULL GROUP BY cur, nxt),
    t AS (SELECT cur, sum(n) AS total FROM c GROUP BY cur)
    SELECT c.cur, c.nxt, CAST(c.n AS INTEGER) AS n,
           round(CAST(c.n AS DOUBLE) / t.total, 6) AS p
    FROM c JOIN t ON c.cur = t.cur
    """,
)
def t1_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix of event types per user
    stream: P(next | current) from lead() pairs, ties broken by
    event_id so both engines see the same successor.

    Scale: one shuffle on user_id for the lead() window (per-user sort,
    users spread across executors), then a transition count whose
    cardinality is |event_type|² — tiny — so the probability join is a
    broadcast.  The classic sequence-mining shape: per-entity ordering
    work distributes, global state is the small transition table."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    c = o.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("cur").agg(F.sum("n").alias("total"))
    return c.join(F.broadcast(t), "cur").select(
        "cur",
        "nxt",
        F.col("n").cast("int").alias("n"),
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("p"),
    )


@register(
    "t1_sliding_distinct_users",
    oracle="""
    WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    days AS (SELECT DISTINCT day FROM d)
    SELECT days.day,
           CAST(count(DISTINCT d.user_id) AS BIGINT) AS wau
    FROM days JOIN d
      ON d.day BETWEEN days.day - INTERVAL 6 DAY AND days.day
    GROUP BY days.day
    """,
)
def t1_sliding_distinct_users(spark, sf_dir):
    """Trailing-7-day distinct active users per day (the WAU metric).
    Spark windows cannot express count(DISTINCT) over a frame, so the
    distinct-in-frame is built as size(collect_set) over a RANGE window
    keyed on epoch-day — after first collapsing events to distinct
    (day, user) pairs so the window state holds each user once per day,
    not once per event.

    Scale: the heavy lifting happens BEFORE the window — one shuffle
    collapses events to per-day user sets, so the window runs over
    |days| rows only (bounded by the calendar, not event volume; the
    allowlisted single-task sort is over ~tens of rows).  Frame state is
    7 per-day sets; at extreme cardinality those become HLL sketches
    merged across the frame (approx path, t1_approx_aggs) — this exact
    form is the correctness anchor.  The oracle uses a spine join
    (DuckDB materializes the same semantics)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    per_day = d.groupBy("day").agg(F.collect_set("user_id").alias("users"))
    dd = per_day.withColumn(
        "epoch_day", F.datediff("day", F.lit("1970-01-01"))
    )
    w = Window.orderBy("epoch_day").rangeBetween(-6, 0)
    return dd.select(
        "day",
        F.size(
            F.array_distinct(F.flatten(F.collect_list("users").over(w)))
        )
        .cast("bigint")
        .alias("wau"),
    )


@register(
    "t1_mom_growth",
    oracle="""
    WITH m AS (SELECT date_trunc('month', o_orderdate) AS month,
                      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                           AS DOUBLE) AS revenue
               FROM orders GROUP BY 1)
    SELECT CAST(month AS TIMESTAMP) AS month, revenue,
           round(CASE WHEN lag(revenue) OVER (ORDER BY month) > 0
                      THEN revenue / lag(revenue) OVER (ORDER BY month) - 1
                 END, 6) AS mom_growth
    FROM m
    """,
)
def t1_mom_growth(spark, sf_dir):
    """Month-over-month revenue growth: monthly decimal-exact totals,
    then lag()/ratio over the month series (first month NULL).  The
    period-over-period comparison every reporting layer needs.

    Scale: the heavy aggregation shuffles once on month; the lag window
    then runs over |months| rows — calendar-bounded, so the
    unpartitioned window is a few dozen rows (same allowlisted class as
    the WAU query).  Multi-entity variants partition the window by the
    entity key and stay fully distributed."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(trunc_ntz("month", "o_orderdate").alias("month")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "revenue",
        F.round(
            F.when(prev > 0, F.col("revenue") / prev - 1), 6
        ).alias("mom_growth"),
    )


@register(
    "t1_churn_labels",
    oracle="""
    WITH w AS (SELECT user_id,
                      CAST(date_trunc('week', ts) AS DATE) AS week,
                      count(*) AS n_events
               FROM events GROUP BY 1, 2)
    SELECT user_id, week, CAST(n_events AS BIGINT) AS n_events,
           CAST(CASE WHEN lead(week) OVER (PARTITION BY user_id
                                           ORDER BY week)
                          = week + INTERVAL 7 DAY
                     THEN 1 ELSE 0 END AS INTEGER) AS active_next_week
    FROM w
    """,
)
def t1_churn_labels(spark, sf_dir):
    """Training-label generation with temporal correctness: per
    (user, week) activity rows labeled with whether the user was active
    the FOLLOWING week (lead over the user's week sequence — the label
    never reads data from its own feature window, the leakage rule
    supervised pipelines must obey).  Trailing weeks label 0 (churned or
    censored — callers cut the last observed week before training).

    Scale: one shuffle to (user, week) grains (tiny vs events), one
    user-partitioned lead pass.  Features from t1_user_feature_pipeline
    join on the same user key."""
    ev = load_table(spark, sf_dir, "events")
    wk = ev.groupBy(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("user_id").orderBy("week")
    return wk.select(
        "user_id",
        "week",
        "n_events",
        F.when(
            F.lead("week").over(w) == F.date_add("week", 7), 1
        )
        .otherwise(0)
        .cast("int")
        .alias("active_next_week"),
    )


@register(
    "t1_auc_metric",
    oracle="""
    WITH s AS (SELECT source, n_chars AS score,
                      count(*) FILTER (lang = 'en') AS np,
                      count(*) FILTER (lang <> 'en') AS nn
               FROM documents GROUP BY source, n_chars),
    c AS (SELECT source, score, np, nn,
                 coalesce(sum(nn) OVER (PARTITION BY source ORDER BY score
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0) AS neg_below
          FROM s),
    u AS (SELECT source,
                 CAST(sum(np * neg_below) AS BIGINT) AS u2,
                 CAST(sum(np * nn) AS BIGINT) AS ties2,
                 CAST(sum(np) AS BIGINT) AS n_pos,
                 CAST(sum(nn) AS BIGINT) AS n_neg
          FROM c GROUP BY source)
    SELECT source, n_pos, n_neg,
           round((u2 + 0.5 * ties2) / (CAST(n_pos AS DOUBLE) * n_neg), 6)
             AS auc
    FROM u
    """,
)
def t1_auc_metric(spark, sf_dir):
    """Distributed AUC (Mann-Whitney U) per source: does document length
    predict lang='en'?  Computed WITHOUT per-row ranking: scores
    collapse to their distinct-value distribution first (n_pos/n_neg per
    score), U = Σ n_pos(s)·neg_below(s) + ½·ties, so the window runs
    over |distinct scores| rows per source — the score-histogram trick
    that makes exact AUC feasible at corpus scale (production buckets
    scores first, same shape).  All counting is integer; one double
    division at the end.

    Scale: one shuffle to (source, score) grains, one source-partitioned
    cumulative window over the score histogram, one final source
    aggregate."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source", F.col("n_chars").alias("score")).agg(
        F.count_if(F.col("lang") == "en").alias("np"),
        F.count_if(F.col("lang") != "en").alias("nn"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = s.withColumn(
        "neg_below", F.coalesce(F.sum("nn").over(w), F.lit(0))
    )
    u = c.groupBy("source").agg(
        F.sum(F.col("np") * F.col("neg_below")).alias("u2"),
        F.sum(F.col("np") * F.col("nn")).alias("ties2"),
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
    )
    return u.select(
        "source",
        "n_pos",
        "n_neg",
        F.round(
            (F.col("u2") + 0.5 * F.col("ties2"))
            / (F.col("n_pos").cast("double") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )


@register(
    "t1_mode_per_group",
    oracle="""
    WITH c AS (SELECT user_id, event_type, count(*) AS n
               FROM events GROUP BY user_id, event_type),
    r AS (SELECT user_id, event_type, n,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY n DESC, event_type) AS rn
          FROM c)
    SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS n
    FROM r WHERE rn = 1
    """,
)
def t1_mode_per_group(spark, sf_dir):
    """Deterministic MODE per group: each user's most frequent event
    type, ties broken lexicographically — built from count + row_number
    rather than the engine's mode() aggregate, whose tie choice is
    implementation-defined (the reproducibility rule: never ship an
    operator whose output depends on unspecified tie behavior).

    Scale: the (user, type) count collapses events map-side first; the
    pick window runs over ≤ |event_type| rows per user."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "n")
    )


@register(
    "t1_sequence_pattern",
    oracle="""
    WITH s AS (SELECT user_id,
                      string_agg(substr(event_type, 1, 1), ''
                                 ORDER BY ts, event_id) AS seq
               FROM events GROUP BY user_id)
    SELECT user_id, length(seq) AS n_events,
           CAST(regexp_matches(seq, 'v[vc]*p') AS INTEGER)
             AS converted_via_views
    FROM s
    """,
)
def t1_sequence_pattern(spark, sf_dir):
    """Sequence-pattern matching over event streams (the
    MATCH_RECOGNIZE emulation): each user's ordered events encode to a
    character string (v/c/p/… initials), and the behavioral pattern
    "view, then only views/clicks until a purchase" is one regex over
    that string.  Encoding order is pinned by (ts, event_id), so the
    string — and the match — is deterministic.

    Scale: one shuffle on user_id; the per-user string is bounded by
    the user's event count (cap long tails by windowing the encode to
    the trailing N events).  Regex-over-encoded-sequence turns
    arbitrary order-sensitive patterns into a scan over |users| strings
    — the trick that avoids k-way self-joins for k-step patterns
    (compare t1_event_funnel's 3 joins for one fixed funnel)."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("ts", "event_id", "event_type")
                    )
                ),
                lambda x: F.substring(x["event_type"], 1, 1),
            ),
            "",
        ).alias("seq")
    )
    return s.select(
        "user_id",
        F.length("seq").cast("long").alias("n_events"),
        F.col("seq").rlike("v[vc]*p").cast("int").alias(
            "converted_via_views"
        ),
    )


@register(
    "t1_longest_streak",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events WHERE event_type = 'purchase'
    ),
    r AS (
        SELECT user_id, d,
               CAST(d - DATE '2024-01-01' AS BIGINT)
                 - row_number() OVER (PARTITION BY user_id ORDER BY d)
                 AS island
        FROM days
    ),
    runs AS (
        SELECT user_id, island, count(*) AS len, min(d) AS start_d
        FROM r GROUP BY 1, 2
    )
    SELECT user_id, max(len) AS max_streak,
           arg_max(start_d,
                   lpad(CAST(len AS VARCHAR), 10, '0')
                   || lpad(CAST(99999999
                                - CAST(start_d - DATE '2024-01-01' AS BIGINT)
                           AS VARCHAR), 10, '0')) AS streak_start
    FROM runs GROUP BY user_id
    """,
)
def t1_longest_streak(spark, sf_dir):
    """Longest run of CONSECUTIVE calendar days with a purchase, per
    user — gaps-and-islands: day_number − row_number() is constant
    within a consecutive run, so it is the island key; one count per
    island, then the per-user max with the earliest start as the
    deterministic tie-break (via the padded (len, inverted-start)
    ordering string).  Distinct from gap sessionization
    (t1_sessionize_gap): streaks are calendar-aligned integer logic,
    not timestamp-delta logic.

    Scale: distinct-day projection shrinks events to ≤ users×days rows
    first; then two aggregations and one window, all partitioned by
    user_id — one shuffle reused throughout."""
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    r = days.select(
        "user_id",
        "d",
        (
            F.datediff("d", F.lit("2024-01-01").cast("date")).cast("bigint")
            - F.row_number().over(w)
        ).alias("island"),
    )
    runs = r.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"), F.min("d").alias("start_d")
    )
    ord_key = F.concat(
        F.lpad(F.col("len").cast("string"), 10, "0"),
        F.lpad(
            (
                F.lit(99999999)
                - F.datediff("start_d", F.lit("2024-01-01").cast("date"))
                .cast("bigint")
            ).cast("string"),
            10,
            "0",
        ),
    )
    return runs.groupBy("user_id").agg(
        F.max("len").alias("max_streak"),
        F.max_by("start_d", ord_key).alias("streak_start"),
    )


@register(
    "t1_top_n_other",
    oracle="""
    WITH tot AS (
        SELECT event_type,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2))
                 AS revenue,
               count(*) AS n_events
        FROM events GROUP BY 1
    ),
    r AS (
        SELECT event_type, revenue, n_events,
               row_number() OVER (ORDER BY revenue DESC, event_type)
                 AS rk
        FROM tot
    )
    SELECT CASE WHEN rk <= 3 THEN event_type ELSE 'other' END AS bucket,
           CAST(sum(revenue) AS DOUBLE) AS revenue,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           count(*) AS n_members
    FROM r GROUP BY 1
    """,
)
def t1_top_n_other(spark, sf_dir):
    """Top-N-plus-other reporting rollup: the top 3 categories by exact
    decimal revenue keep their identity, the tail collapses into one
    'other' bucket — the conditional re-grouping every dashboard needs
    (a plain top-k LIMIT silently drops the tail; 'other' keeps totals
    reconciling).  Rank ties break on the category name so bucket
    membership is deterministic.

    Scale: the ranking runs on the AGGREGATED category table (|cats|
    rows — the unpartitioned window is over a bounded frame, not raw
    events), then one re-aggregation; events are shuffled once."""
    ev = load_table(spark, sf_dir, "events")
    tot = ev.groupBy("event_type").agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("event_type"))
    r = tot.select(
        "event_type", "revenue", "n_events", F.row_number().over(w).alias("rk")
    )
    return (
        r.select(
            F.when(F.col("rk") <= 3, F.col("event_type"))
            .otherwise(F.lit("other"))
            .alias("bucket"),
            "revenue",
            "n_events",
        )
        .groupBy("bucket")
        .agg(
            F.sum("revenue").cast("double").alias("revenue"),
            F.sum("n_events").alias("n_events"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )
