"""Behavioral-analytics and statistics shapes over ``events`` /
``lineitem`` / ``orders``: weekly cohort retention, gap-based
sessionization, SCD2 run-length history collapse, histogram binning,
GROUPING SETS, exact-moment correlation statistics, canonical-pick
dedup, and iterative BFS hop levels.

These extend the T1 surface (SURVEY §2.9) with the query shapes a
training-data/product pipeline runs daily.  Determinism discipline per
registry docstring: integer/decimal arithmetic wherever a sum crosses
engines; doubles only for final derived ratios, rounded.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ght2dm_spark.functions import epoch_us
from ght2dm_spark.io import load_table
from ght2dm_spark.operators.temporal import sessionize_gap
from ght2dm_spark.queries.registry import register


@register(
    "t1_cohort_retention",
    oracle="""
    WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id),
    c AS (SELECT user_id, date_trunc('week', first_ts) AS cohort_week FROM f),
    a AS (SELECT e.user_id, c.cohort_week,
                 CAST(floor(date_diff('day', CAST(c.cohort_week AS DATE),
                                      CAST(e.ts AS DATE)) / 7) AS BIGINT)
                   AS week_offset
          FROM events e JOIN c ON e.user_id = c.user_id)
    SELECT CAST(cohort_week AS DATE) AS cohort_week, week_offset,
           count(DISTINCT user_id) AS n_active
    FROM a GROUP BY 1, 2
    """,
)
def t1_cohort_retention(spark, sf_dir):
    """Weekly cohort retention matrix: users bucketed by the ISO week of
    their first event; n_active = distinct users from that cohort seen
    in week cohort+offset.  Both engines truncate weeks to Monday and
    the offset is pure integer day arithmetic — no float drift.

    Scale: first-touch frame is one groupBy on user_id (|users| rows);
    the join back to events is a shuffle-hash join on user_id (AQE
    broadcasts it at small SF).  The retention agg shuffles only
    (cohort_week, week_offset, user_id) distinct triples, a tiny
    fraction of the event volume."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    cohort = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .select("user_id", F.date_trunc("week", "first_ts").alias("cohort_week"))
    )
    return (
        ev.join(cohort, "user_id")
        .select(
            "user_id",
            F.col("cohort_week").cast("date").alias("cohort_week"),
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("cohort_week").cast("date"))
                / 7
            ).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@register(
    "t1_sessionize_gap",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events),
    s AS (
      SELECT user_id,
             sum(CASE WHEN prev_ts IS NULL
                        OR date_diff('microsecond', prev_ts, ts) > 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM o),
    g AS (SELECT user_id, session_id, count(*) AS n FROM s GROUP BY 1, 2)
    SELECT user_id, count(*) AS n_sessions, CAST(sum(n) AS BIGINT) AS n_events,
           max(n) AS max_session_events
    FROM g GROUP BY user_id
    """,
)
def t1_sessionize_gap(spark, sf_dir):
    """Gap-based sessionization (30-minute inactivity splits a session)
    via lag + running-sum-of-boundaries — the batch equivalent of
    session_window(ts, '30 minutes') but assigning explicit session ids.
    Gap test is integer microseconds (unix_micros vs date_diff
    'microsecond'), exact on both engines; every window orders by
    (ts, event_id) so duplicate timestamps cannot make the running
    boundary sum engine-dependent.

    Scale: ONE shuffle on user_id serves both window functions and the
    two-level aggregation (same partitioning reused by Catalyst); state
    per user is a single running counter."""
    # ts alone is not a total order once timestamps collide (first seen
    # at the 10x replicated scale point); the event_id tiebreak makes
    # the running boundary sum deterministic AND keeps every same-ts
    # row in one session (the flagged row sorts first in its tie group)
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    sessions = (
        sessionize_gap(
            ev, ["user_id"], "ts", ["ts", "event_id"], gap_us=1_800_000_000
        )
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n").alias("n_events"),
        F.max("n").alias("max_session_events"),
    )


@register(
    "t1_scd2_history",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events),
    chg AS (
      SELECT user_id, event_type, ts AS valid_from FROM o
      WHERE prev_type IS NULL OR prev_type <> event_type)
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
             AS valid_to
    FROM chg
    """,
)
def t1_scd2_history(spark, sf_dir):
    """Slowly-changing-dimension (type 2) history build: collapse each
    user's event_type stream into change rows with [valid_from,
    valid_to) ranges; the open row has valid_to NULL.  This is the
    standard snapshot→history derivation for dimension tracking.

    Scale: both windows partition by user_id — one shuffle, no joins.
    Change rows are a small fraction of events, so the lead() pass runs
    on the collapsed frame."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .select("user_id", "event_type", F.col("ts").alias("valid_from"))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
    )


@register(
    "t1_histogram",
    oracle="""
    SELECT CAST(least(greatest(floor(o_totalprice / 50000), 0), 9) AS BIGINT)
             AS bucket,
           count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders GROUP BY 1
    """,
)
def t1_histogram(spark, sf_dir):
    """Equi-width histogram (width_bucket semantics, clamped edges) of
    order totals.  floor of a double division is bit-identical across
    engines; min/max need no summation so no decimal cast.

    Scale: a 10-bucket groupBy is a pure map-side partial aggregation —
    the shuffle moves ≤ 10 rows per task regardless of table size."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.greatest(F.floor(F.col("o_totalprice") / 50000), F.lit(0)), F.lit(9)
    )
    return (
        o.groupBy(bucket.cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@register(
    "t1_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def t1_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (the general form behind rollup/cube, which
    t1_rollup/t1_cube already cover) with grouping() flags
    disambiguating aggregated NULLs from data NULLs.  Spark's SQL front
    end plans this as a single Expand + one aggregation — one scan for
    all three grains.  grouping() is cast to BIGINT because Spark emits
    TINYINT where DuckDB emits BIGINT (r05 red row); the quantity sum is
    BIGINT because l_quantity is integral and DECIMAL(38,2) output is
    int128-backed in DuckDB (HUGEINT storage), the hash class behind the
    r04-r06 value-hash reds — the registry-wide discipline is to never
    emit decimals wider than precision 18 (tests/test_oracle_types.py)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "__gs_lineitem"
    )
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
               count(*) AS n
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "t1_stat_moments",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_quantity AS DECIMAL(19,4))
                      * CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))
                      * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS syy,
             CAST(sum(CAST(l_quantity AS DECIMAL(19,4))
                      * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS corr_qty_price,
           round(sqrt((n * sxx - sx * sx) / (n * (n - 1.0))), 6)
             AS stddev_qty
    FROM m
    """,
)
def t1_stat_moments(spark, sf_dir):
    """Correlation and sample stddev from EXACT decimal moments.  Naive
    corr()/stddev() sum doubles in engine-specific order, so results
    differ in the last bits across engines; summing decimals instead is
    exact and associative (safe under any shuffle order), then the
    closed-form combination runs in IEEE doubles identically on both
    sides.  This is also the scale-correct plan: each moment is a
    map-side partial aggregate, one shuffle on the group key."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(19,4)")
    price = F.col("l_extendedprice").cast("decimal(19,4)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qty).cast("double").alias("sx"),
        F.sum(price).cast("double").alias("sy"),
        F.sum(qty * qty).cast("double").alias("sxx"),
        F.sum(price * price).cast("double").alias("syy"),
        F.sum(qty * price).cast("double").alias("sxy"),
    )
    n = F.col("n")
    return m.select(
        "l_returnflag",
        "n",
        F.round(
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (n * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (n * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("corr_qty_price"),
        F.round(
            F.sqrt((n * F.col("sxx") - F.col("sx") * F.col("sx")) / (n * (n - 1.0))),
            6,
        ).alias("stddev_qty"),
    )


@register(
    "t1_dedup_keep_canonical",
    oracle="""
    SELECT doc_id, source, n_chars FROM (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY md5(text)
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents) t
    WHERE rn = 1
    """,
)
def t1_dedup_keep_canonical(spark, sf_dir):
    """Exact dedup with a canonical-survivor policy: among docs with
    identical text (md5 group), keep the longest, tie-broken by lowest
    doc_id — the priority-pick form every training-data dedup needs
    (t1_dedup_exact keeps an arbitrary row; this keeps a DEFINED one).

    Scale: one shuffle on the 128-bit text hash (uniform by
    construction, no skew); row_number state is one counter per group."""
    w = Window.partitionBy(F.md5("text")).orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        load_table(spark, sf_dir, "documents")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "n_chars")
    )


def _sp_bipartite_edges(li):
    """Distinct supplier↔part edge set relabeled to LONGs (suppkey→2k,
    partkey→2k+1 — disjoint even/odd namespaces, a bijection), returned
    PRE-SYMMETRIZED: the swapped union of a distinct (even, odd) edge
    set is itself distinct because the two directions live in disjoint
    key namespaces, which is exactly the ``symmetrized=True`` contract
    of bfs_levels/pagerank (pagerank silently double-counts degrees on
    duplicate edges — keep this the ONLY producer of that contract)."""
    e0 = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).distinct()
    return e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _sp_decode_label(node: str = "node"):
    """Decode the even/odd LONG relabeling back to the oracle's
    's<k>'/'p<k>' string labels (final ≤|V|-row projection only)."""
    return F.concat(
        F.when(F.col(node) % 2 == 0, F.lit("s")).otherwise(F.lit("p")),
        F.expr(f"{node} div 2"),
    )


@register(
    "t1_bfs_levels",
    oracle="""
    WITH e0 AS (SELECT DISTINCT 's' || l_suppkey AS a, 'p' || l_partkey AS b
                FROM lineitem),
    e AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
    l0 AS (SELECT DISTINCT 's' || s_suppkey AS node FROM supplier
           WHERE s_suppkey <= 10),
    l1 AS (SELECT DISTINCT e.b AS node FROM e JOIN l0 ON e.a = l0.node
           WHERE e.b NOT IN (SELECT node FROM l0)),
    l2 AS (SELECT DISTINCT e.b AS node FROM e JOIN l1 ON e.a = l1.node
           WHERE e.b NOT IN (SELECT node FROM l0)
             AND e.b NOT IN (SELECT node FROM l1)),
    l3 AS (SELECT DISTINCT e.b AS node FROM e JOIN l2 ON e.a = l2.node
           WHERE e.b NOT IN (SELECT node FROM l0)
             AND e.b NOT IN (SELECT node FROM l1)
             AND e.b NOT IN (SELECT node FROM l2))
    SELECT node, 0 AS level FROM l0
    UNION ALL SELECT node, 1 FROM l1
    UNION ALL SELECT node, 2 FROM l2
    UNION ALL SELECT node, 3 FROM l3
    """,
)
def t1_bfs_levels(spark, sf_dir):
    """Iterative BFS over the supplier↔part bipartite graph (edges =
    distinct lineitem pairs), 3 hops from suppliers 1..10.  Frontier
    expansion + anti-join against visited gives min-hop levels with
    integer-only arithmetic.  The oracle unrolls the same three rounds
    as CTEs.  See operators/graph.bfs_levels for the scale argument
    (per-round shuffles touch the frontier, never the full edge set).

    Node ids stay LONG through every shuffle (suppkey→2k, partkey→2k+1,
    the t1_pagerank relabel — a bijection, so hop sets are unchanged)
    and decode to the oracle's 's<k>'/'p<k>' labels only in the final
    ≤|V|-row projection: long keys shuffle/compare measurably faster
    than strings in the edge distinct, the per-round frontier distincts
    and the visited anti-joins.  The swapped union of the distinct
    (even, odd) edge set is itself distinct (directions live in
    disjoint namespaces), so ``symmetrized=True`` skips _symmetrize's
    second full-width Exchange."""
    from ght2dm_spark.operators.graph import bfs_levels

    li = load_table(spark, sf_dir, "lineitem")
    both = _sp_bipartite_edges(li)
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 10)
        .select((F.col("s_suppkey") * 2).alias("node"))
    )
    out = bfs_levels(both, seeds, max_level=3, symmetrized=True)
    return out.select(
        _sp_decode_label().alias("node"),
        F.col("level").cast("int").alias("level"),
    )


_PR_ITERS = 3
_PR_DAMP_NUM, _PR_DAMP_DEN = 85, 100  # d = 0.85 as an exact rational


def _pagerank_sql(iters: int) -> str:
    """DuckDB oracle mirroring operators/graph.pagerank: the same
    rounds unrolled as CTEs in the same BIGINT fixed-point (1e-12
    units), `//` standing in for Spark's `div`.  All-integer arithmetic
    is what makes this an exact-match oracle — a float formulation
    diverged by 1 ulp per round (engines' round() algorithms differ at
    digit boundaries)."""
    from ght2dm_spark.operators.graph import PAGERANK_SCALE

    nn = "(SELECT nn FROM n)"
    base_num = (_PR_DAMP_DEN - _PR_DAMP_NUM) * PAGERANK_SCALE
    ctes = [
        "e0 AS (SELECT DISTINCT 's' || l_suppkey AS a, 'p' || l_partkey AS b"
        " FROM lineitem)",
        "e AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0)",
        "deg AS (SELECT a, count(*) AS od FROM e GROUP BY a)",
        "n AS (SELECT count(DISTINCT a) AS nn FROM e)",
        f"r0 AS (SELECT a AS node, CAST({PAGERANK_SCALE} AS BIGINT) // {nn}"
        " AS r FROM (SELECT DISTINCT a FROM e))",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"r{k} AS (SELECT e.b AS node, "
            f"CAST({base_num} AS BIGINT) // ({_PR_DAMP_DEN} * {nn}) "
            f"+ (sum(r.r // d.od) * {_PR_DAMP_NUM}) // {_PR_DAMP_DEN} AS r "
            f"FROM e JOIN r{k - 1} r ON e.a = r.node JOIN deg d ON e.a = d.a "
            f"GROUP BY e.b)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, CAST(r AS BIGINT) AS rank_e12 FROM r{iters}"
    )


@register("t1_pagerank", oracle=_pagerank_sql(_PR_ITERS))
def t1_pagerank(spark, sf_dir):
    """PageRank (3 iterations, d=85/100) over the supplier↔part
    bipartite graph — the iterative-algorithm companion to BFS and
    connected components.  Ranks are BIGINT fixed-point (1e-12 units):
    integer-only state makes the oracle (the same rounds unrolled as
    CTEs) match to the last unit rather than within a tolerance.  See
    operators/graph.pagerank for the per-iteration shuffle shape."""
    from ght2dm_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    # long node keys + pre-symmetrized edges: see _sp_bipartite_edges
    both = _sp_bipartite_edges(li)
    out = pagerank(
        both,
        iterations=_PR_ITERS,
        damp_num=_PR_DAMP_NUM,
        damp_den=_PR_DAMP_DEN,
        symmetrized=True,
    )
    return out.select(
        _sp_decode_label().alias("node"), F.col("r").alias("rank_e12")
    )


@register(
    "t1_user_feature_pipeline",
    oracle="""
    WITH o AS (SELECT user_id, ts, event_id, value, event_type,
                      lag(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev
               FROM events),
    m AS (SELECT *, CASE WHEN prev IS NULL
                              OR epoch(ts) - epoch(prev) >= 14400
                         THEN 1 ELSE 0 END AS new_s FROM o),
    s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sid
          FROM m),
    sess AS (SELECT user_id, sid,
                    count(*) AS n_events,
                    date_diff('microsecond', min(ts), max(ts)) AS dur_us,
                    sum(CAST(value AS DECIMAL(18,2))) AS sv
             FROM s GROUP BY user_id, sid)
    SELECT sess.user_id,
           count(*) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(max(dur_us) AS BIGINT) AS max_session_us,
           round(CAST(sum(n_events) AS DOUBLE) / count(*), 6)
             AS events_per_session,
           CAST(sum(sv) AS DOUBLE) AS total_value,
           u.n_types
    FROM sess
    JOIN (SELECT user_id, count(DISTINCT event_type) AS n_types
          FROM events GROUP BY user_id) u ON sess.user_id = u.user_id
    GROUP BY sess.user_id, u.n_types
    """,
)
def t1_user_feature_pipeline(spark, sf_dir):
    """Fused per-user feature engineering — the events-side counterpart
    to the corpus-build flagship: gap sessionization (4h) → per-session
    stats (events, integer-microsecond duration, decimal-exact value)
    → per-user features
    (session counts, max/avg session shape, total value, event-type
    breadth) in ONE job.

    Scale: every stage clusters on user_id, so hash partitioning on the
    user key SATISFIES every downstream distribution — the sessionize
    windows, the (user_id, sid) session aggregate (subset-partitioning
    rule: grouping by a superset of the partition key needs no
    re-exchange), the user rollup, and the breadth join all run on
    user_id exchanges only (verified: 3 exchanges in the plan, all on
    user_id — main branch, breadth branch, join side; zero sorts beyond
    the window's own).  Running each feature as its own job would cost
    N scans and N shuffles instead."""
    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts alone is not a total order once timestamps collide (first seen
    # at the 10x replicated scale point); the event_id tiebreak makes
    # the running boundary sum deterministic AND keeps every same-ts
    # row in one session (the flagged row sorts first in its tie group)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = (
        ev.withColumn("prev", F.lag("ts").over(wu))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev").isNull()
                | (
                    F.unix_timestamp("ts") - F.unix_timestamp("prev")
                    >= 14400
                ),
                1,
            ).otherwise(0),
        )
        .withColumn("sid", F.sum("new_s").over(run))
    )
    sess = s.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            epoch_us(F.max("ts")) - epoch_us(F.min("ts"))
        ).alias("dur_us"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
    )
    breadth = ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("n_types")
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("dur_us").alias("max_session_us"),
            F.round(
                F.sum("n_events").cast("double") / F.count(F.lit(1)), 6
            ).alias("events_per_session"),
            F.sum("sv").cast("double").alias("total_value"),
        )
        .join(breadth, "user_id")
        .select(
            "user_id",
            "n_sessions",
            "n_events",
            "max_session_us",
            "events_per_session",
            "total_value",
            "n_types",
        )
    )
