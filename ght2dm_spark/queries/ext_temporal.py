"""Temporal/skew extension queries: as-of join, binned range join,
salted aggregation, multi-grain time rollup (the hypertable continuous-
aggregate shape), exact percentiles, and edit-distance scalars — each
with a DuckDB oracle (DuckDB has native ASOF JOIN, which checks our
union-window formulation independently).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ght2dm_spark.functions import trunc_ntz
from ght2dm_spark.io import load_table
from ght2dm_spark.operators.temporal import asof_join, range_join_binned, salted_agg
from ght2dm_spark.queries.registry import register


@register(
    "t1_asof_join",
    oracle="""
    WITH o AS (
        SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        FROM orders
        GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, o.o_orderkey AS last_orderkey
    FROM events e
    ASOF LEFT JOIN o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def t1_asof_join(spark, sf_dir):
    """Backward as-of join: each event picks the latest order of the same
    customer at-or-before its timestamp.  Union-and-window formulation —
    one shuffle on the key, no row expansion (SCALING.md) — checked
    against DuckDB's native ASOF JOIN.  Orders are pre-deduped per
    (customer, date) keeping max orderkey so ties are deterministic on
    both engines."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey"
    )
    out = asof_join(
        ev,
        orders,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload=["o_orderkey"],
        tie_break="o_orderkey",
    )
    return out.select(
        "event_id", "user_id", F.col("o_orderkey").alias("last_orderkey")
    )


@register(
    "t1_range_join",
    oracle="""
    SELECT p.event_id AS purchase_id,
           count(c.event_id) AS clicks_before
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 1 HOUR
     AND c.ts <= p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
)
def t1_range_join(spark, sf_dir):
    """Range (interval) join: clicks by the same user within the hour
    before each purchase.  Bucketized to a 1-hour grain → equi join on
    (user, bucket) with exact re-filter; probe side expands ≤2×, and the
    join hash-partitions instead of falling into a nested-loop
    inequality join."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    # how='inner' + aggregate add-back instead of how='left': the left
    # mode pays a second candidate join for its zero-match add-back
    # (operator docstring), while this shape pays one candidate join
    # plus a probe-sized left join of the counts — the cheaper plan at
    # scale for an aggregating consumer like this one.
    joined = range_join_binned(
        purchases.withColumnRenamed("ts", "p_ts"),
        clicks,
        key="user_id",
        probe_ts="p_ts",
        build_ts="c_ts",
        lower=F.expr("INTERVAL -1 HOUR"),
        upper=F.expr("INTERVAL 0 SECOND"),
        grain_seconds=3600,
        how="inner",
    )
    counts = joined.groupBy("purchase_id").agg(
        F.count("click_id").alias("__n")
    )
    return purchases.select("purchase_id").join(counts, "purchase_id", "left").select(
        "purchase_id",
        F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("clicks_before"),
    )


@register(
    "t1_salted_agg",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def t1_salted_agg(spark, sf_dir):
    """Salted two-phase aggregation over a genuinely skewed key (a
    handful of event types for all rows): phase 1 spreads each type over
    16 salt reducers, phase 2 combines 16 partials per type.  Result is
    identical to the plain groupBy (same oracle) — the salt only changes
    the shuffle shape."""
    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        keys=["event_type"],
        salt_col=F.col("event_id"),
        n_salt=16,
        counts=("n",),
        sums={"_tv": F.sum(F.col("value").cast("decimal(18,2)"))},
    )
    return out.select(
        "event_type", "n", F.col("_tv").cast("double").alias("total_value")
    )


@register(
    "t1_time_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CASE WHEN grouping(hour) = 0 THEN hour END AS hour,
           grouping(hour) AS grain,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM (SELECT ts, value, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour
          FROM events) t
    GROUP BY ROLLUP (CAST(date_trunc('day', ts) AS TIMESTAMP), hour)
    HAVING grouping(CAST(date_trunc('day', ts) AS TIMESTAMP)) = 0
    """,
)
def t1_time_rollup(spark, sf_dir):
    """Hypertable-style continuous aggregate: hourly and daily grains in
    ONE pass via ROLLUP(day, hour) (hour rows roll up into day rows;
    grouping() tags the grain; the all-NULL grand total is dropped).
    At scale this halves the scans vs materializing each grain
    separately — partial aggregation handles both levels in the same
    shuffle."""
    ev = load_table(spark, sf_dir, "events").select(
        trunc_ntz("day", "ts").alias("day"),
        trunc_ntz("hour", "ts").alias("hour"),
        "value",
    )
    out = (
        ev.rollup("day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_tv"),
            F.grouping("hour").alias("grain"),
            F.grouping("day").alias("__gd"),
        )
        .filter(F.col("__gd") == 0)
    )
    return out.select(
        "day",
        "hour",
        F.col("grain").cast("long").alias("grain"),
        "n",
        F.col("_tv").cast("double").alias("total_value"),
    )


@register(
    "t1_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
           round(quantile_cont(l_extendedprice, 0.95), 6) AS p95
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def t1_percentile_exact(spark, sf_dir):
    """Exact interpolated percentiles (Spark percentile ≡ DuckDB
    quantile_cont: linear interpolation over the sorted group).  The
    exact form sorts per group — the approx sketch (t1_approx_aggs) is
    the 100 TB path; this is the correctness anchor."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE percentile buffer evaluated at both fractions (array form),
    # not two independent object aggregates each collecting the group's
    # full value map — same sorted-group interpolation, identical
    # doubles, half the aggregate state (measured 2.65 s → 1.31 s for
    # the two-fraction probe at sf0.1)
    ps = F.percentile(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95))
    )
    return (
        li.groupBy("l_returnflag")
        .agg(ps.alias("_ps"))
        .select(
            "l_returnflag",
            F.round(F.col("_ps")[0], 6).alias("p50"),
            F.round(F.col("_ps")[1], 6).alias("p95"),
        )
    )


@register(
    "t1_edit_distance",
    oracle="""
    SELECT doc_id,
           levenshtein(source, lang) AS src_lang_dist,
           levenshtein(substr(text, 1, 10), substr(text, 6, 10)) AS self_shift_dist
    FROM documents
    """,
)
def t1_edit_distance(spark, sf_dir):
    """Edit-distance scalar surface (fuzzy matching primitive for
    record linkage)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.levenshtein("source", "lang").cast("long").alias("src_lang_dist"),
        F.levenshtein(
            F.substring("text", 1, 10), F.substring("text", 6, 10)
        ).cast("long").alias("self_shift_dist"),
    )


@register(
    "t1_fuzzy_blocking_join",
    oracle="""
    WITH probe AS (
      SELECT n_nationkey AS probe_id,
             CASE WHEN n_nationkey % 2 = 1
                  THEN substr(n_name, 1, 2) || 'X' || substr(n_name, 4)
                  ELSE n_name END AS dirty
      FROM nation),
    cand AS (SELECT p.probe_id, p.dirty, n.n_name AS match,
                    levenshtein(p.dirty, n.n_name) AS dist
             FROM probe p JOIN nation n
               ON substr(p.dirty, 1, 2) = substr(n.n_name, 1, 2)
              AND length(p.dirty) = length(n.n_name)
             WHERE levenshtein(p.dirty, n.n_name) <= 1),
    r AS (SELECT probe_id, dirty, match, dist,
                 row_number() OVER (PARTITION BY probe_id
                                    ORDER BY dist, match) AS rn
          FROM cand)
    SELECT probe_id, dirty, match, dist FROM r WHERE rn = 1
    """,
)
def t1_fuzzy_blocking_join(spark, sf_dir):
    """Fuzzy record-linkage join with BLOCKING: dirty probe names (odd
    keys get one character mutated) resolve to canonical names via an
    equi join on the block key (2-char prefix + length) followed by a
    levenshtein ≤ 1 filter, best candidate per probe kept (lowest
    distance, name tiebreak).

    Scale: the blocking equi join is what makes fuzzy matching feasible
    — edit distance runs only INSIDE blocks instead of over the |probe|
    × |canonical| cross product (the join Catalyst would refuse to hash
    anyway).  Block-key choice bounds block size; skewed blocks get the
    same salting/cap treatment as any hot key."""
    n = load_table(spark, sf_dir, "nation")
    probe = n.select(
        F.col("n_nationkey").alias("probe_id"),
        F.when(
            F.col("n_nationkey") % 2 == 1,
            F.concat(
                F.substring("n_name", 1, 2),
                F.lit("X"),
                F.expr("substr(n_name, 4)"),
            ),
        )
        .otherwise(F.col("n_name"))
        .alias("dirty"),
    )
    cand = (
        probe.join(
            n.select(F.col("n_name").alias("match")),
            (
                F.substring("dirty", 1, 2)
                == F.substring("match", 1, 2)
            )
            & (F.length("dirty") == F.length("match")),
        )
        .withColumn("dist", F.levenshtein("dirty", "match").cast("long"))
        .filter(F.col("dist") <= 1)
    )
    w = Window.partitionBy("probe_id").orderBy("dist", "match")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("probe_id", "dirty", "match", "dist")
    )


@register(
    "t1_last_touch_attribution",
    oracle="""
    WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts AS c_ts, max(event_id) AS touch_id
          FROM events WHERE event_type = 'click'
          GROUP BY user_id, ts)
    SELECT p.p_id, p.user_id, c.touch_id
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.p_ts >= c.c_ts
    """,
)
def t1_last_touch_attribution(spark, sf_dir):
    """Last-touch attribution: every purchase credits the same user's
    most recent click at-or-before it (never-clicked purchases keep a
    NULL touch — they must stay visible, not drop out).  This is the
    as-of join wearing its marketing-analytics hat; simultaneous clicks
    pre-dedup to max event_id so attribution is deterministic.

    Scale: union-and-window as-of (one shuffle on user_id, no row
    expansion — the naive correlated max-subquery re-scans clicks per
    purchase); checked against DuckDB's native ASOF JOIN as an
    independent implementation."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"),
        F.col("event_id").alias("touch_id"),
    )
    out = asof_join(
        p,
        c,
        key="user_id",
        left_ts="p_ts",
        right_ts="c_ts",
        payload=["touch_id"],
        tie_break="touch_id",
    )
    return out.select("p_id", "user_id", "touch_id")


@register(
    "t1_histogram_equidepth",
    oracle="""
    WITH b AS (SELECT event_type, value,
                      ntile(4) OVER (PARTITION BY event_type
                                     ORDER BY value, event_id) AS bucket
               FROM events)
    SELECT event_type, bucket, count(*) AS n,
           round(min(value), 6) AS lo, round(max(value), 6) AS hi
    FROM b GROUP BY event_type, bucket
    """,
)
def t1_histogram_equidepth(spark, sf_dir):
    """Equi-DEPTH histogram per event_type: ntile(4) splits each group's
    value distribution into four equal-population buckets whose
    boundaries adapt to the data (the t1_histogram equi-width
    complement, and the statistic behind range-partition boundary
    estimation).  event_id tie-breaks equal values so bucket membership
    is deterministic.

    Scale: one shuffle on event_type + per-group sort; ntile's counter
    state is O(1) per group.  The production variant at extreme group
    size samples (approx_percentile boundaries) instead of total-sorting
    — same output schema."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    b = ev.select(
        "event_type", "value", F.ntile(4).over(w).cast("long").alias("bucket")
    )
    return b.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )


@register(
    "t1_topk_with_ties",
    oracle="""
    SELECT lang, doc_id, n_chars FROM (
      SELECT lang, doc_id, n_chars,
             rank() OVER (PARTITION BY lang ORDER BY n_chars DESC) AS rk
      FROM documents) t
    WHERE rk <= 3
    """,
)
def t1_topk_with_ties(spark, sf_dir):
    """Top-3 longest documents per language WITH ties (rank(), not
    row_number()): equal lengths at the cutoff all survive — the SQL
    FETCH WITH TIES semantics, where the row_number form
    (t1_topk_per_group) picks arbitrarily among ties unless given a
    total order.  Output size becomes data-dependent; deterministic
    either way because rank() depends only on the (documented) sort
    key."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc())
    return (
        d.select("lang", "doc_id", "n_chars", F.rank().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= 3)
        .select("lang", "doc_id", "n_chars")
    )
