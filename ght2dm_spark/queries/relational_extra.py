"""Round-8 relational / time-series / graph declared queries: gaps &
islands, cumulative-distinct users, period-over-period change, Bollinger
bands, a Pareto concentration curve, graph reciprocity and degree
assortativity, and U-shaped multi-touch attribution — widening the
analytic-SQL and graph-metric surface around the existing window/join/
attribution operators.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ght2dm_spark.functions.cleaning import epoch_us
from ght2dm_spark.io import load_table
from ght2dm_spark.queries.registry import register


# --------------------------------------------------------------------------
# t1_gap_islands


@register(
    "t1_gap_islands",
    oracle="""
    WITH m AS (SELECT DISTINCT o_custkey,
                      CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                           AS BIGINT) AS mon
               FROM orders),
    g AS (SELECT o_custkey, mon,
                 mon - row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY mon) AS grp
          FROM m),
    isl AS (SELECT o_custkey, grp,
                   CAST(count(*) AS BIGINT) AS island_len
            FROM g GROUP BY o_custkey, grp)
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(max(island_len) AS BIGINT) AS longest_island,
           CAST(sum(island_len) AS BIGINT) AS active_months
    FROM isl GROUP BY o_custkey
    """,
)
def t1_gap_islands(spark, sf_dir):
    """Gaps & islands: each customer's runs of CONSECUTIVE active months
    (island = maximal streak), via the classic value-minus-row_number
    grouping key — consecutive months share (mon − rank).  The
    engagement-streak shape behind retention and churn features
    (t1_longest_streak does days-per-user; this gives the full island
    inventory per entity).

    Scale: a distinct to (cust, month) grains, one rank window per
    customer partition over months (≤ a few dozen rows each), two
    map-side-combinable aggregations.  Integer month index — no date
    arithmetic ambiguity cross-engine."""
    m = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("bigint").alias("mon"),
        )
        .distinct()
    )
    w = Window.partitionBy("o_custkey").orderBy("mon")
    g = m.select(
        "o_custkey", "mon",
        (F.col("mon") - F.row_number().over(w)).alias("grp"),
    )
    isl = g.groupBy("o_custkey", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("island_len")
    )
    return isl.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.max("island_len").cast("bigint").alias("longest_island"),
        F.sum("island_len").cast("bigint").alias("active_months"),
    )


# --------------------------------------------------------------------------
# t1_running_distinct


@register(
    "t1_running_distinct",
    oracle="""
    WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS first_day
               FROM events GROUP BY user_id),
    d AS (SELECT first_day AS day, CAST(count(*) AS BIGINT) AS new_users
          FROM f GROUP BY first_day),
    a AS (SELECT CAST(ts AS DATE) AS day,
                 CAST(count(DISTINCT user_id) AS BIGINT) AS dau
          FROM events GROUP BY day)
    SELECT a.day, a.dau,
           CAST(coalesce(d.new_users, 0) AS BIGINT) AS new_users,
           CAST(sum(coalesce(d.new_users, 0))
                OVER (ORDER BY a.day) AS BIGINT) AS cum_distinct_users
    FROM a LEFT JOIN d ON a.day = d.day
    """,
)
def t1_running_distinct(spark, sf_dir):
    """Cumulative distinct users by day — the growth-curve metric that a
    naive per-day COUNT(DISTINCT) over expanding prefixes recomputes
    quadratically.  Computed linearly via each user's FIRST-SEEN day
    (one aggregate): cumulative distinct = running sum of first-seen
    counts; daily DAU rides along for the ratio views.

    Scale: two user/day-keyed aggregates + a window over the ~|days|
    frame — the t1_vocab_growth first-occurrence trick on the user
    dimension."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    d = f.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    a = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.countDistinct("user_id").cast("bigint").alias("dau")
    )
    w = Window.orderBy("day")
    return (
        a.join(d, "day", "left")
        .select(
            "day", "dau",
            F.coalesce("new_users", F.lit(0)).cast("bigint")
            .alias("new_users"),
        )
        .withColumn(
            "cum_distinct_users",
            F.sum("new_users").over(w).cast("bigint"),
        )
    )


# --------------------------------------------------------------------------
# t1_percent_change


@register(
    "t1_percent_change",
    oracle="""
    WITH d AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                           AS BIGINT) AS mon,
                      CAST(count(*) AS BIGINT) AS n_orders,
                      CAST(sum(CAST(round(o_totalprice * 100, 0)
                                    AS BIGINT)) AS BIGINT) AS rev_cents
               FROM orders GROUP BY mon),
    l AS (SELECT mon, n_orders, rev_cents,
                 lag(rev_cents) OVER (ORDER BY mon) AS prev_rev,
                 lag(rev_cents, 12) OVER (ORDER BY mon) AS prev_year_rev
          FROM d)
    SELECT mon, n_orders, rev_cents,
           round(CAST((rev_cents - prev_rev) * 100 AS DOUBLE)
                 / prev_rev, 6) AS mom_pct,
           round(CAST((rev_cents - prev_year_rev) * 100 AS DOUBLE)
                 / prev_year_rev, 6) AS yoy_pct
    FROM l
    """,
)
def t1_percent_change(spark, sf_dir):
    """Month-over-month and year-over-year revenue change — the
    period-comparison readout every rollup dashboard derives from a
    time-grain aggregate plus LAG.  Revenue is summed as exact integer
    CENTS (round(price·100)) so the lagged comparisons never touch an
    order-dependent float sum; each pct is one division of exact
    integers; leading periods emit NULL (no prior period ≠ 0% change).

    Scale: one month-grain aggregate (map-side combined, |months| rows)
    then window math on the tiny frame."""
    d = load_table(spark, sf_dir, "orders").groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("bigint").alias("mon")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint").alias("rev_cents"),
    )
    w = Window.orderBy("mon")
    l = d.select(
        "mon", "n_orders", "rev_cents",
        F.lag("rev_cents").over(w).alias("prev_rev"),
        F.lag("rev_cents", 12).over(w).alias("prev_year_rev"),
    )
    return l.select(
        "mon", "n_orders", "rev_cents",
        F.round(
            ((F.col("rev_cents") - F.col("prev_rev")) * 100).cast("double")
            / F.col("prev_rev"),
            6,
        ).alias("mom_pct"),
        F.round(
            ((F.col("rev_cents") - F.col("prev_year_rev")) * 100)
            .cast("double") / F.col("prev_year_rev"),
            6,
        ).alias("yoy_pct"),
    )


# --------------------------------------------------------------------------
# t1_bollinger_bands

_BOLL_W = 7  # rolling window (rows): 6 preceding + current


@register(
    "t1_bollinger_bands",
    oracle=f"""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(sum(CAST(round(value, 9)
                                    AS DECIMAL(18,9))) AS DECIMAL(18,9))
                        AS v
               FROM events WHERE value IS NOT NULL
               GROUP BY event_type, day),
    r AS (SELECT event_type, day, v,
                 CAST(sum(v) OVER w AS DECIMAL(28,9)) AS s,
                 CAST(sum(CAST(round(CAST(v AS DOUBLE) * CAST(v AS DOUBLE),
                                     6) AS DECIMAL(28,6)))
                      OVER w AS DECIMAL(38,6)) AS sq,
                 CAST(count(*) OVER w AS BIGINT) AS n
          FROM d
          WINDOW w AS (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN {_BOLL_W - 1} PRECEDING AND CURRENT ROW)),
    b AS (SELECT event_type, day, v, n,
                 CAST(s AS DOUBLE) / n AS mean,
                 sqrt(greatest(0, CAST(sq AS DOUBLE) / n
                       - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)))
                   AS sd
          FROM r WHERE n = {_BOLL_W})
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN CAST(v AS DOUBLE) > mean + 2 * sd
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_upper_breach,
           CAST(sum(CASE WHEN CAST(v AS DOUBLE) < mean - 2 * sd
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_lower_breach
    FROM b GROUP BY event_type
    """,
)
def t1_bollinger_bands(spark, sf_dir):
    """Bollinger-band breach counts on the daily value series per event
    type: rolling 7-day mean ± 2σ, count of days breaking out — the
    volatility-normalized anomaly gate time-series monitors run (OHLC's
    t1_ohlc gives the candles; this is the band overlay).

    Exactness: daily sums are exact fixed-point (round→DECIMAL before
    summing); the rolling Σv and Σv² are exact DECIMAL window sums over
    those fixed-point values (a double window sum would depend on the
    engine's sliding-sum algorithm — Spark re-adds, DuckDB segment-
    trees), so mean/sd derive from identical operands; breach tests are
    fixed IEEE chains.  Scale: one day-grain aggregate then per-type
    windows over ~|days| rows."""
    d = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.round("value", 9).cast("decimal(18,9)"))
            .cast("decimal(18,9)").alias("v")
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(_BOLL_W - 1), 0)
    )
    vd = F.col("v").cast("double")
    r = d.select(
        "event_type", "day", "v",
        F.sum("v").over(w).cast("decimal(28,9)").alias("s"),
        F.sum(
            F.round(vd * vd, 6).cast("decimal(28,6)")
        ).over(w).cast("decimal(38,6)").alias("sq"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
    ).filter(F.col("n") == _BOLL_W)
    mean = F.col("s").cast("double") / F.col("n")
    sd = F.sqrt(
        F.greatest(
            F.lit(0.0),
            F.col("sq").cast("double") / F.col("n") - mean * mean,
        )
    )
    return r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.when(vd > mean + 2 * sd, 1).otherwise(0))
        .cast("bigint").alias("n_upper_breach"),
        F.sum(F.when(vd < mean - 2 * sd, 1).otherwise(0))
        .cast("bigint").alias("n_lower_breach"),
    )


# --------------------------------------------------------------------------
# t1_order_value_pareto


@register(
    "t1_order_value_pareto",
    oracle="""
    WITH c AS (SELECT o_custkey,
                      CAST(sum(CAST(round(o_totalprice * 100, 0)
                                    AS BIGINT)) AS BIGINT) AS rev_cents
               FROM orders GROUP BY o_custkey),
    r AS (SELECT rev_cents,
                 ntile(10) OVER (ORDER BY rev_cents DESC, o_custkey ASC)
                   AS decile
          FROM c),
    d AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_cust,
                 CAST(sum(rev_cents) AS BIGINT) AS rev
          FROM r GROUP BY decile)
    SELECT CAST(decile AS BIGINT) AS decile, n_cust, rev,
           CAST(sum(rev) OVER (ORDER BY decile) * 1000000
                // (sum(rev) OVER ()) AS BIGINT) AS cum_share_ppm
    FROM d
    """,
)
def t1_order_value_pareto(spark, sf_dir):
    """Pareto concentration curve: customers ranked by lifetime revenue,
    cumulative revenue share by decile — the 80/20 readout behind
    sampling weights and account tiering (for a corpus: which sources
    carry the token mass).  Revenue in exact integer cents; the share
    is integer ppm (floor division) — no float anywhere.

    Scale: a per-customer aggregate, a global NTILE over the (revenue,
    id) projection — decile-bounded output, the t1_lift_deciles shape —
    then 10-row window math."""
    c = load_table(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint").alias("rev_cents")
    )
    w = Window.orderBy(F.col("rev_cents").desc(), F.col("o_custkey").asc())
    r = c.select(
        "rev_cents", F.ntile(10).over(w).alias("decile")
    )
    d = r.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cust"),
        F.sum("rev_cents").cast("bigint").alias("rev"),
    )
    return d.select(
        F.col("decile").cast("bigint").alias("decile"), "n_cust", "rev",
        F.expr(
            "CAST(sum(rev) OVER (ORDER BY decile "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000L "
            "div sum(rev) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT)"
        ).alias("cum_share_ppm"),
    )


# --------------------------------------------------------------------------
# graph: edges = ABOVE-AVERAGE consecutive-event type transitions per
# user (the t1_markov_transitions construction with a relative count
# threshold — the RAW transition graph is a complete K5 at every SF,
# which makes reciprocity trivially 1 and assortativity 0/0; keeping
# only transitions whose count exceeds the mean yields a data-driven
# asymmetric subgraph, the same relative-threshold trick
# t1_triangle_count uses to stay sparse at any scale)

_EDGE_SQL = """
    seq AS (SELECT user_id, event_type, ts, event_id,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS nxt
            FROM events),
    tc AS (SELECT event_type AS src, nxt AS dst,
                  CAST(count(*) AS BIGINT) AS n
           FROM seq WHERE nxt IS NOT NULL AND event_type <> nxt
           GROUP BY 1, 2),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS k FROM tc),
    edges AS (SELECT src, dst FROM tc, tot WHERE n * k > s)
"""


def _edges(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    )
    # NOTE (r09 A/B): checkpointing tc here looks attractive (the edge
    # frame is referenced up to 4× per consumer and its static plan
    # replays the events window per reference — 12 Window nodes in
    # reciprocity's before-plan) but measured NEUTRAL-to-worse
    # (reciprocity 0.72→0.74 s, assortativity 0.83→0.84 s): Spark's
    # exchange reuse already serves every re-reference from the one
    # (src, dst) shuffle, so the only runtime effect was the added
    # materialization barrier.  Reverted; the static-plan duplication
    # is cosmetic.
    tc = (
        seq.filter(
            F.col("nxt").isNotNull() & (F.col("event_type") != F.col("nxt"))
        )
        .groupBy(
            F.col("event_type").alias("src"), F.col("nxt").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = tc.agg(
        F.sum("n").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    return (
        tc.crossJoin(F.broadcast(tot))
        .filter(F.col("n") * F.col("k") > F.col("s"))
        .select("src", "dst")
    )


@register(
    "t1_graph_reciprocity",
    oracle=f"""
    WITH {_EDGE_SQL},
    recip AS (SELECT e.src, e.dst FROM edges e
              JOIN edges r ON e.src = r.dst AND e.dst = r.src)
    SELECT CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
           CAST((SELECT count(*) FROM recip) AS BIGINT) AS n_reciprocal,
           round(CAST((SELECT count(*) FROM recip) AS DOUBLE)
                 / (SELECT count(*) FROM edges), 6) AS reciprocity
    """,
)
def t1_graph_reciprocity(spark, sf_dir):
    """Reciprocity of the directed event-type transition graph (the
    fraction of edges whose reverse also exists) — the first statistic
    of any directed-graph analysis: ~1 means the 'graph' is really
    undirected (skip direction-aware algorithms), ~0 means a DAG-like
    flow.  Edges are distinct consecutive-type transitions per user
    (the t1_markov_transitions construction).

    Scale: one user-partitioned lead window, a distinct to the
    |types|² edge grid, a self-join on that tiny grid; the global
    counts are scalar aggregates."""
    e = _edges(spark, sf_dir)
    r = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(r, ["src", "dst"])
    n_e = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    n_r = recip.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_reciprocal")
    )
    return n_e.crossJoin(F.broadcast(n_r)).select(
        "n_edges", "n_reciprocal",
        F.round(
            F.col("n_reciprocal").cast("double") / F.col("n_edges"), 6
        ).alias("reciprocity"),
    )


@register(
    "t1_degree_assortativity",
    oracle=f"""
    WITH {_EDGE_SQL},
    outd AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
             FROM edges GROUP BY src),
    ind AS (SELECT dst, CAST(count(*) AS BIGINT) AS deg
            FROM edges GROUP BY dst),
    pairs AS (SELECT o.deg AS x, i.deg AS y
              FROM edges e JOIN outd o ON e.src = o.src
                           JOIN ind i ON e.dst = i.dst),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy
          FROM pairs)
    SELECT n,
           round(CASE WHEN n * sxx = sx * sx OR n * syy = sy * sy THEN NULL
                 ELSE (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                    * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy))
                 END, 6) AS assortativity
    FROM s
    """,
)
def t1_degree_assortativity(spark, sf_dir):
    """Degree assortativity of the transition graph: Pearson correlation
    between out-degree of the source and in-degree of the target across
    edges — do hubs link to hubs (positive, social-network-like) or to
    leaves (negative, hub-and-spoke)?  Decides whether degree-based
    partitioning/salting will face correlated hot spots.

    Exactness: all five moment sums are exact BIGINT over integer
    degrees; the coefficient is one fixed IEEE chain.  Scale: two
    degree aggregates + an edge join against the tiny degree dims."""
    e = _edges(spark, sf_dir)
    outd = e.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("xdeg"))
    ind = e.groupBy("dst").agg(F.count(F.lit(1)).cast("bigint").alias("ydeg"))
    pairs = e.join(F.broadcast(outd), "src").join(F.broadcast(ind), "dst")
    s = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xdeg").cast("bigint").alias("sx"),
        F.sum("ydeg").cast("bigint").alias("sy"),
        F.sum(F.col("xdeg") * F.col("ydeg")).cast("bigint").alias("sxy"),
        F.sum(F.col("xdeg") * F.col("xdeg")).cast("bigint").alias("sxx"),
        F.sum(F.col("ydeg") * F.col("ydeg")).cast("bigint").alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    degenerate = (
        (n * F.col("sxx") == F.col("sx") * F.col("sx"))
        | (n * F.col("syy") == F.col("sy") * F.col("sy"))
    )
    return s.select(
        "n",
        F.round(
            F.when(degenerate, F.lit(None).cast("double")).otherwise(
                (n * sxy - sx * F.col("sy"))
                / (
                    F.sqrt(n * sxx - sx * F.col("sx"))
                    * F.sqrt(n * syy - sy * F.col("sy"))
                )
            ),
            6,
        ).alias("assortativity"),
    )


# --------------------------------------------------------------------------
# t1_u_shaped_attribution

_ATTR_WINDOW_US = 604_800_000_000  # 7 days


@register(
    "t1_u_shaped_attribution",
    oracle=f"""
    WITH p AS (SELECT event_id AS pid, user_id, epoch_us(ts) AS p_us
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_us
          FROM events WHERE event_type = 'click'),
    pairs AS (SELECT p.pid, c.click_id, c.c_us
              FROM p JOIN c ON p.user_id = c.user_id
                           AND c.c_us >= p.p_us - {_ATTR_WINDOW_US}
                           AND c.c_us < p.p_us),
    r AS (SELECT pid, click_id,
                 row_number() OVER (PARTITION BY pid
                                    ORDER BY c_us, click_id) AS pos,
                 count(*) OVER (PARTITION BY pid) AS n_touch
          FROM pairs),
    credit AS (SELECT click_id,
                      CASE WHEN n_touch = 1 THEN 1000000
                           WHEN n_touch = 2 THEN 500000
                           WHEN pos = 1 OR pos = n_touch THEN 400000
                           ELSE 200000 // (n_touch - 2) END AS ppm
               FROM r)
    SELECT click_id, CAST(count(*) AS BIGINT) AS n_credits,
           CAST(sum(ppm) AS BIGINT) AS credit_ppm
    FROM credit GROUP BY click_id
    """,
)
def t1_u_shaped_attribution(spark, sf_dir):
    """U-shaped (position-based, 40/20/40) multi-touch attribution:
    first and last click before a purchase get 40% each, the middle
    touches split the remaining 20% — the third attribution model next
    to last-touch and linear (marketing's default trio).  Credit is
    exact integer ppm with floor division for the middle split, so
    per-click sums never ride a float chain.

    Scale: the same window-bounded user equi-join as
    t1_linear_attribution; position and touch count come from one
    purchase-partitioned window pass; the rollup shuffles by click_id
    with map-side combine."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id",
        epoch_us("ts").alias("p_us"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        epoch_us("ts").alias("c_us"),
    )
    pairs = p.join(c, "user_id").filter(
        (F.col("c_us") >= F.col("p_us") - F.lit(_ATTR_WINDOW_US))
        & (F.col("c_us") < F.col("p_us"))
    )
    wp = Window.partitionBy("pid")
    r = pairs.select(
        "pid", "click_id",
        F.row_number().over(wp.orderBy("c_us", "click_id")).alias("pos"),
        F.count(F.lit(1)).over(wp).alias("n_touch"),
    )
    ppm = (
        F.when(F.col("n_touch") == 1, F.lit(1_000_000))
        .when(F.col("n_touch") == 2, F.lit(500_000))
        .when(
            (F.col("pos") == 1) | (F.col("pos") == F.col("n_touch")),
            F.lit(400_000),
        )
        .otherwise(F.expr("200000 div (n_touch - 2)"))
    )
    return (
        r.select("click_id", ppm.alias("ppm"))
        .groupBy("click_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_credits"),
            F.sum("ppm").cast("bigint").alias("credit_ppm"),
        )
    )
