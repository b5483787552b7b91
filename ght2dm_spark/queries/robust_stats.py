"""Robust statistics for data curation: per-group winsorization bounds
and rolling z-score anomaly flagging — the outlier-control pre-steps a
metrics/feature pipeline applies before aggregates or model training
consume a value column.

Exact-match discipline: percentile bounds follow the
t1_percentile_exact precedent (Spark ``percentile`` ≡ DuckDB
``quantile_cont``, rounded in the output only); rolling moments are
accumulated as DECIMAL sums (order-independent) and only the final
mean/σ/z arithmetic runs in IEEE doubles, identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ght2dm_spark.functions import trunc_ntz
from ght2dm_spark.io import load_table
from ght2dm_spark.queries.registry import register


@register(
    "t1_winsorize_bounds",
    oracle="""
    WITH r AS (SELECT event_type, value,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY value) AS rn,
                      count(*) OVER (PARTITION BY event_type) AS n
               FROM events),
    b AS (SELECT event_type,
                 min(CASE WHEN rn = (5 * n + 99) // 100 THEN value END) AS lo,
                 min(CASE WHEN rn = (95 * n + 99) // 100 THEN value END) AS hi
          FROM r GROUP BY event_type)
    SELECT e.event_type,
           b.lo, b.hi,
           count(*) AS n,
           count(*) FILTER (e.value < b.lo) AS n_below,
           count(*) FILTER (e.value > b.hi) AS n_above
    FROM events e JOIN b ON e.event_type = b.event_type
    GROUP BY e.event_type, b.lo, b.hi
    """,
)
def t1_winsorize_bounds(spark, sf_dir):
    """Winsorization audit per event_type: discrete p05/p95 clip bounds
    (the value at rank ceil(p·n) — integer rank arithmetic, so the
    bound IS a data value) and how many values each tail would clamp —
    the compute-stats / broadcast-back / apply pattern for outlier
    control.  Discrete, not interpolated: engine percentile
    interpolations (Spark ``percentile`` vs DuckDB ``quantile_cont``)
    agree only to ~1 ulp, and at the 10x scale point that ulp flipped
    ``value < lo`` for a tie-run of rows sitting exactly on the bound.

    Scale: the bounds table is |event_type| rows, so the apply join is a
    BROADCAST against the fact scan — the expensive part is the exact
    per-group rank (per-group sort), whose 100 TB path is the
    approx_percentile sketch (t1_approx_aggs); this exact form is the
    correctness anchor, same split as t1_percentile_exact."""
    ev = load_table(spark, sf_dir, "events")
    win = Window.partitionBy("event_type").orderBy("value")
    part = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "value",
        F.row_number().over(win).alias("rn"),
        F.count(F.lit(1)).over(part).alias("n"),
    )
    k_lo = F.expr("(5 * n + 99) div 100")
    k_hi = F.expr("(95 * n + 99) div 100")
    b = r.groupBy("event_type").agg(
        F.min(F.when(F.col("rn") == k_lo, F.col("value"))).alias("lo"),
        F.min(F.when(F.col("rn") == k_hi, F.col("value"))).alias("hi"),
    )
    return (
        ev.join(F.broadcast(b), "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("value") < F.col("lo")).alias("n_below"),
            F.count_if(F.col("value") > F.col("hi")).alias("n_above"),
        )
        .select("event_type", "lo", "hi", "n", "n_below", "n_above")
    )


@register(
    "t1_rolling_zscore",
    oracle="""
    WITH w AS (
        SELECT event_id, user_id, ts, value,
               count(*) OVER win AS n,
               CAST(sum(CAST(value AS DECIMAL(19,2))) OVER win AS DOUBLE)
                 AS s1,
               CAST(sum(CAST(value AS DECIMAL(19,2))
                        * CAST(value AS DECIMAL(19,2))) OVER win AS DOUBLE)
                 AS s2
        FROM events
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, ts,
           round(CASE WHEN (s2 - s1 * s1 / n) / (n - 1) > 0
                      THEN (value - s1 / n)
                             / sqrt((s2 - s1 * s1 / n) / (n - 1)) END, 6) AS z
    FROM w
    WHERE n = 20
      AND abs(CASE WHEN (s2 - s1 * s1 / n) / (n - 1) > 0
                   THEN (value - s1 / n)
                          / sqrt((s2 - s1 * s1 / n) / (n - 1)) END) > 2.5
    """,
)
def t1_rolling_zscore(spark, sf_dir):
    """Rolling z-score anomaly flags: each event scored against the
    trailing 20 events of its own user stream; |z| > 2.5 over a full
    window flags the row.  Moments come from DECIMAL sums of value and
    value² over the frame (exact, order-independent); mean/σ/z then run
    the identical IEEE double expression on both engines, so round(6)
    only guards the last bit.  Constant frames (variance 0, where z is
    undefined) are CASE-guarded out identically in both engines.

    Scale: one shuffle on user_id, per-user sort, single window pass
    computing all three frame aggregates together; state per task is
    the 20-row frame.  No self-join against a shifted copy — the
    classic O(n·w) rolling-stats mistake."""
    ev = load_table(spark, sf_dir, "events")
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    vdec = F.col("value").cast("decimal(19,2)")
    w = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum(vdec).over(win).cast("double").alias("s1"),
        F.sum(vdec * vdec).over(win).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (
        F.col("n") - 1
    )
    # CASE-guard the zero/negative-variance frames (constant windows --
    # first hit at the 10x replicated scale point): an unguarded double
    # division by exact 0.0 is an ANSI error in Spark, and z is
    # undefined there anyway.  The guard lives INSIDE the expression
    # (not a separate conjunct) so neither engine can reorder it away.
    z = F.when(var > 0, (F.col("value") - mean) / F.sqrt(var))
    return (
        w.filter((F.col("n") == 20) & (F.abs(z) > 2.5))
        .select("event_id", "user_id", "ts", F.round(z, 6).alias("z"))
    )


@register(
    "t1_weighted_median",
    oracle="""
    WITH s AS (
        SELECT l_returnflag, l_extendedprice AS price,
               CAST(l_quantity AS BIGINT) AS w
        FROM lineitem
    ),
    c AS (
        SELECT l_returnflag, price, w,
               sum(w) OVER (PARTITION BY l_returnflag
                            ORDER BY price, w
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cw,
               sum(w) OVER (PARTITION BY l_returnflag) AS tot
        FROM s
    )
    SELECT l_returnflag, min(price) AS wmedian,
           CAST(max(tot) AS BIGINT) AS total_weight
    FROM c WHERE 2 * cw >= tot
    GROUP BY l_returnflag
    """,
)
def t1_weighted_median(spark, sf_dir):
    """Weighted median per group (price weighted by quantity): sort the
    group by value, take the first row whose cumulative weight reaches
    half the total — the lower weighted median, picked (never
    interpolated), so the comparison stays in integers (2·cw ≥ W) and
    the result is a value that exists in the data.  Neither engine has
    a weighted-median builtin; both run the same cumulative-weight
    formulation.

    Scale: one shuffle on the group key; the cumulative window and the
    total share the partition sort.  The tie among rows of equal price
    is fixed by the (price, w) ordering, and the ≥-threshold pick is
    min() over the qualifying suffix — deterministic on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("price", "w")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    part = Window.partitionBy("l_returnflag")
    c = s.select(
        "l_returnflag",
        "price",
        F.sum("w").over(cum).alias("cw"),
        F.sum("w").over(part).alias("tot"),
    )
    return (
        c.filter(2 * F.col("cw") >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price").alias("wmedian"),
            F.max("tot").alias("total_weight"),
        )
    )


@register(
    "t1_cusum_drift",
    oracle="""
    WITH m AS (
        SELECT user_id,
               CAST(sum(CAST(value AS DECIMAL(19,6))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS mu
        FROM events GROUP BY user_id
    ),
    d AS (
        SELECT e.user_id, e.ts, e.event_id,
               CAST(CASE WHEN e.value - m.mu >= 0
                         THEN floor((e.value - m.mu) * 1000000000 + 0.5)
                         ELSE -floor(-(e.value - m.mu) * 1000000000 + 0.5)
                    END AS BIGINT) AS dev_n
        FROM events e JOIN m USING (user_id)
    ),
    c AS (
        SELECT user_id,
               sum(dev_n) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cusum_n
        FROM d
    )
    SELECT user_id, count(*) AS n,
           CAST((max(abs(cusum_n)) + 500) // 1000 AS DOUBLE) / 1000000.0
             AS max_abs_cusum
    FROM c GROUP BY user_id
    """,
)
def t1_cusum_drift(spark, sf_dir):
    """CUSUM drift score per user: the maximum |running sum of
    deviations from the user's own mean| over the time-ordered series —
    the classic change-point signal (a series that switches regime
    mid-stream accumulates a large excursion even when its global mean
    looks normal; rolling z-scores miss slow drifts).  Deviations are
    quantized to integer nano-units with sign-aware half-away rounding
    (engine round() on a .5 boundary diverges between engines — caught
    at the 10x-scale sweep) and cumulated in LONG, so the running sum
    is exact at every prefix on both engines; the final 6-digit round
    is integer arithmetic too.

    Scale: one shuffle on user_id feeds the mean, the ordered cumsum
    window, and the final max — same key throughout; window state is a
    single decimal accumulator."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy("user_id").agg(
        (
            F.sum(F.col("value").cast("decimal(19,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mu")
    )
    dev_n = F.expr(
        "CAST(CASE WHEN value - mu >= 0D"
        " THEN floor((value - mu) * 1000000000D + 0.5D)"
        " ELSE -floor(-(value - mu) * 1000000000D + 0.5D) END AS BIGINT)"
    )
    d = ev.join(m, "user_id").select("user_id", "ts", "event_id", dev_n.alias("dev_n"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.select("user_id", F.sum("dev_n").over(w).alias("cusum_n"))
    return c.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "CAST((max(abs(cusum_n)) + 500) div 1000 AS DOUBLE) / 1000000.0"
        ).alias("max_abs_cusum"),
    )


@register(
    "t1_theilsen_slope",
    oracle="""
    WITH daily AS MATERIALIZED (
        SELECT event_type,
               datediff('day', DATE '1970-01-01',
                        CAST(date_trunc('day', ts) AS DATE)) AS d,
               sum(CAST(round(value * 1000000, 0) AS BIGINT)) AS v
        FROM events GROUP BY 1, 2),
    arr AS (SELECT event_type,
                   list(struct_pack(d := d, v := v) ORDER BY d) AS a
            FROM daily GROUP BY 1),
    sl AS (SELECT event_type, len(a) AS n_days,
                  flatten(list_transform(range(1, len(a)), i ->
                    list_transform(range(i + 1, len(a) + 1), j ->
                      (a[j].v - a[i].v) // (a[j].d - a[i].d)))) AS slopes
           FROM arr)
    SELECT event_type,
           CAST(n_days AS BIGINT) AS n_days,
           CAST(len(slopes) AS BIGINT) AS n_pairs,
           CAST(list_sort(slopes)[(len(slopes) + 1) // 2] AS BIGINT)
             AS ts_slope
    FROM sl
    """,
)
def t1_theilsen_slope(spark, sf_dir):
    """Theil–Sen robust trend estimator (Sen 1968) per event type: the
    MEDIAN of all pairwise day-to-day slopes of the daily value total —
    ~29% breakdown point, so a burst of outlier days cannot drag the
    trend the way it drags the OLS fit (t1_regression_per_group's
    estimator).  Slopes are exact-integer micro-units/day (truncating
    division, identical in both engines for all signs); the median is
    the lower-median element of the SORTED slope array, picked in-row —
    value-determined, so slope ties cannot make it ambiguous.

    Scale: one (series, day) aggregation is the only corpus-sized
    shuffle; the O(days²) pair enumeration and the median pick are
    in-row array work over the per-series day array (t1_token_pmi's
    comprehension pattern — daily grains keep days² small; a
    minute-grain series would sample pairs instead, the standard
    Theil–Sen scaling fallback)."""
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
        F.array_sort(F.collect_list(F.struct("d", "v"))).alias("a")
    )
    slopes = F.expr(
        """flatten(transform(sequence(1, size(a) - 1), i ->
             transform(sequence(i + 1, size(a)), j ->
               (element_at(a, j).v - element_at(a, i).v)
               div (element_at(a, j).d - element_at(a, i).d))))"""
    )
    out = arr.select(
        "event_type",
        F.size("a").cast("bigint").alias("n_days"),
        slopes.alias("slopes"),
    )
    n = F.size("slopes")
    return out.select(
        "event_type",
        "n_days",
        n.cast("bigint").alias("n_pairs"),
        F.when(
            n > 0,
            F.element_at(F.array_sort("slopes"), ((n + 1) / 2).cast("int")),
        )
        .cast("bigint")
        .alias("ts_slope"),
    )


@register(
    "t1_mann_kendall",
    oracle="""
    WITH daily AS MATERIALIZED (
        SELECT event_type,
               datediff('day', DATE '1970-01-01',
                        CAST(date_trunc('day', ts) AS DATE)) AS d,
               sum(CAST(round(value * 1000000, 0) AS BIGINT)) AS v
        FROM events GROUP BY 1, 2),
    arr AS (SELECT event_type, list(v ORDER BY d) AS a FROM daily GROUP BY 1),
    stat AS (SELECT event_type, len(a) AS n,
                    list_sum(flatten(list_transform(range(1, len(a)), i ->
                      list_transform(range(i + 1, len(a) + 1), j ->
                        CASE WHEN a[j] > a[i] THEN 1
                             WHEN a[j] < a[i] THEN -1 ELSE 0 END)))) AS s,
                    a
             FROM arr),
    ties AS (SELECT event_type,
                    coalesce(list_sum(list_transform(
                      list_distinct(a), x ->
                        len(list_filter(a, y -> y = x))
                        * (len(list_filter(a, y -> y = x)) - 1)
                        * (2 * len(list_filter(a, y -> y = x)) + 5))), 0)
                      AS tie_term
             FROM stat)
    SELECT st.event_type,
           CAST(st.n AS BIGINT) AS n_days,
           CAST(coalesce(st.s, 0) AS BIGINT) AS s_stat,
           CAST(st.n * (st.n - 1) * (2 * st.n + 5) - ti.tie_term
                AS BIGINT) AS var18,
           CASE WHEN coalesce(st.s, 0) > 0 THEN 'up'
                WHEN coalesce(st.s, 0) < 0 THEN 'down'
                ELSE 'flat' END AS trend
    FROM stat st JOIN ties ti USING (event_type)
    """,
)
def t1_mann_kendall(spark, sf_dir):
    """Mann–Kendall trend test (Mann 1945, Kendall 1975) per event
    type — the nonparametric significance companion to t1_theilsen_slope:
    S = Σ_{i<j} sign(vⱼ − vᵢ) over the time-ordered daily totals, with
    the tie-corrected variance reported as the exact integer
    18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) (the caller divides and
    square-roots; keeping the statistic integral is what keeps both
    engines bit-identical).  Trend = sign(S).

    Scale: same shape as Theil–Sen — one (series, day) shuffle, then
    in-row O(days²) sign pairs and an in-row tie histogram."""
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
        ).alias("a")
    )
    s_stat = F.expr(
        """aggregate(flatten(transform(sequence(1, size(a) - 1), i ->
             transform(sequence(i + 1, size(a)), j ->
               CASE WHEN element_at(a, j) > element_at(a, i) THEN 1L
                    WHEN element_at(a, j) < element_at(a, i) THEN -1L
                    ELSE 0L END))), 0L, (acc, x) -> acc + x)"""
    )
    # tie sizes via per-distinct-value counts (O(n²) in-row over a
    # daily-grain array — same bound as the sign-pair comprehension)
    tie_term = F.expr(
        """aggregate(transform(array_distinct(a), x ->
             size(filter(a, y -> y = x)) * (size(filter(a, y -> y = x)) - 1)
             * (2 * size(filter(a, y -> y = x)) + 5)),
           0L, (acc, x) -> acc + cast(x AS bigint))"""
    )
    n = F.size("a").cast("long")
    out = arr.select(
        "event_type",
        n.alias("n"),
        F.coalesce(s_stat, F.lit(0)).cast("bigint").alias("s_stat"),
        tie_term.alias("tie_term"),
    )
    return out.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        "s_stat",
        (F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term"))
        .cast("bigint")
        .alias("var18"),
        F.when(F.col("s_stat") > 0, "up")
        .when(F.col("s_stat") < 0, "down")
        .otherwise("flat")
        .alias("trend"),
    )


@register(
    "t1_rolling_median",
    oracle="""
    WITH w AS (
        SELECT user_id, event_id, value,
               list(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
               ) AS vals
        FROM events WHERE value IS NOT NULL
    )
    SELECT user_id, event_id,
           list_sort(vals)[(len(vals) + 1) // 2] AS med7
    FROM w WHERE user_id % 50 = 0
    """,
)
def t1_rolling_median(spark, sf_dir):
    """Trailing 7-row rolling MEDIAN per entity — the robust smoother
    for spiky metrics where a rolling mean chases outliers (the
    complement of t1_rolling_zscore, which FLAGS them).  The median is
    the LOWER-median element selected from the sorted trailing frame —
    pure element selection, no interpolation, so the emitted double is
    a data value and bit-identical cross-engine (the t1_winsorize_bounds
    lesson: interpolating quantiles differ by 1 ulp between engines;
    discrete ranks cannot).

    Scale: one partitioned ordered window; the frame materializes ≤7
    values per row (constant state), so memory is row-bounded — unlike
    a percentile-over-window, which some engines buffer per partition.
    The user_id filter keeps the emitted slice driver-comparable while
    the window runs over full per-user history."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    vals = F.collect_list("value").over(w)
    med = F.expr(
        "element_at(array_sort(__vals), CAST((size(__vals) + 1) / 2 AS INT))"
    )
    return (
        e.select("user_id", "event_id", vals.alias("__vals"))
        .filter(F.col("user_id") % 50 == 0)
        .select("user_id", "event_id", med.alias("med7"))
    )


@register(
    "t1_robust_scaler",
    oracle="""
    WITH r AS (SELECT event_type, value,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY value, event_id) AS rn,
                      count(*) OVER (PARTITION BY event_type) AS n
               FROM events WHERE value IS NOT NULL),
    q AS (SELECT event_type,
                 min(CASE WHEN rn = (25 * n + 99) // 100 THEN value END) AS q1,
                 min(CASE WHEN rn = (50 * n + 99) // 100 THEN value END) AS med,
                 min(CASE WHEN rn = (75 * n + 99) // 100 THEN value END) AS q3
          FROM r GROUP BY event_type)
    SELECT e.event_type, q.med, q.q1, q.q3,
           count(*) AS n,
           count(*) FILTER (e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                         OR e.value > q.q3 + 1.5 * (q.q3 - q.q1))
             AS n_fence_outliers
    FROM events e JOIN q ON e.event_type = q.event_type
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type, q.med, q.q1, q.q3
    """,
)
def t1_robust_scaler(spark, sf_dir):
    """Robust-scaler statistics (median / IQR standardization, the
    sklearn RobustScaler contract) plus Tukey-fence outlier counts —
    the outlier-immune alternative to z-score standardization for
    heavy-tailed feature columns.  All three quantiles are DISCRETE
    integer-rank picks (rank = ceil(p·n) over a total order), so every
    emitted bound IS a data value and the fence comparisons evaluate on
    bit-identical operands cross-engine — the t1_winsorize_bounds
    lesson applied to the quartile triple.

    Scale: quantiles come from the DISTINCT-VALUE cumulative histogram,
    not a per-row rank window — the k-th order statistic of (value, id)
    has the same VALUE as the k-th in value-only order, so q_p is the
    smallest value whose cumulative count reaches ceil(p·n).  The
    groupBy collapses the stream map-side to its support (5.6× fewer
    rows on events, more at scale) before any window runs; A/B'd at the
    sf≈1 scale point: 2.67 s vs 3.71 s for the row_number formulation.
    The |types|-row quantile frame broadcasts back onto the stream for
    the map-side-combinable fence count — the winsorize two-pass."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cnt = e.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.partitionBy("event_type").orderBy("value")
    wall = Window.partitionBy("event_type")
    r = cnt.select(
        "event_type", "value",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )

    def pick(p):
        rank = F.floor((p * F.col("n") + 99) / 100)
        return F.min(F.when(F.col("cum") >= rank, F.col("value")))

    q = r.groupBy("event_type").agg(
        pick(25).alias("q1"), pick(50).alias("med"), pick(75).alias("q3")
    )
    iqr = F.col("q3") - F.col("q1")
    out = (
        (F.col("value") < F.col("q1") - 1.5 * iqr)
        | (F.col("value") > F.col("q3") + 1.5 * iqr)
    )
    return (
        e.join(F.broadcast(q), "event_type")
        .groupBy("event_type", "med", "q1", "q3")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(out, 1).otherwise(0)).cast("bigint")
            .alias("n_fence_outliers"),
        )
        .select("event_type", "med", "q1", "q3", "n", "n_fence_outliers")
    )
