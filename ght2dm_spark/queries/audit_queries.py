"""Operational data-audit operators: join-key skew profiling, a
chi-square independence test over a contingency grid, and a Benford
first-digit anomaly audit.

The skew audit is the measurement step behind the engine's salting
operators (operators/joins.salted_join, temporal.salted_agg): you salt
AFTER the audit says which keys are hot.  Chi-square follows the
decimal-sum discipline — per-cell contributions are rounded to 9 digits
and summed as DECIMAL so cell order can't perturb the statistic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.queries.registry import register


def _skew_agg(df, key_col: str, label: str):
    """Per-key counts → one audit row (shared by both audited keys)."""
    ord_key = F.concat(
        F.lpad(F.col("n").cast("string"), 12, "0"),
        F.lpad(F.col("k").cast("string"), 12, "0"),
    )
    counts = df.groupBy(F.col(key_col).cast("string").alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # one percentile buffer evaluated at both fractions (array form) —
    # the t1_percentile_exact move; identical interpolated doubles
    return counts.agg(
        F.lit(label).alias("audited_key"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
        F.max_by("k", ord_key).alias("top_key"),
        F.percentile("n", F.array(F.lit(0.5), F.lit(0.99))).alias("_ps"),
        F.round(
            F.max("n").cast("double") / F.sum("n").cast("double"), 6
        ).alias("top_share"),
    ).select(
        "audited_key",
        "n_keys",
        "n_rows",
        "max_n",
        "top_key",
        F.round(F.col("_ps")[0], 6).alias("p50_n"),
        F.round(F.col("_ps")[1], 6).alias("p99_n"),
        "top_share",
    )


@register(
    "t1_skew_audit",
    oracle="""
    WITH c1 AS (
        SELECT CAST(user_id AS VARCHAR) AS k, count(*) AS n
        FROM events GROUP BY 1
    ),
    c2 AS (
        SELECT CAST(l_partkey AS VARCHAR) AS k, count(*) AS n
        FROM lineitem GROUP BY 1
    ),
    a1 AS (
        SELECT 'events.user_id' AS audited_key,
               count(*) AS n_keys,
               CAST(sum(n) AS BIGINT) AS n_rows,
               max(n) AS max_n,
               arg_max(k, lpad(CAST(n AS VARCHAR), 12, '0')
                          || lpad(k, 12, '0')) AS top_key,
               round(quantile_cont(n, 0.5), 6) AS p50_n,
               round(quantile_cont(n, 0.99), 6) AS p99_n,
               round(CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6)
                 AS top_share
        FROM c1
    ),
    a2 AS (
        SELECT 'lineitem.l_partkey' AS audited_key,
               count(*) AS n_keys,
               CAST(sum(n) AS BIGINT) AS n_rows,
               max(n) AS max_n,
               arg_max(k, lpad(CAST(n AS VARCHAR), 12, '0')
                          || lpad(k, 12, '0')) AS top_key,
               round(quantile_cont(n, 0.5), 6) AS p50_n,
               round(quantile_cont(n, 0.99), 6) AS p99_n,
               round(CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6)
                 AS top_share
        FROM c2
    )
    SELECT * FROM a1 UNION ALL SELECT * FROM a2
    """,
)
def t1_skew_audit(spark, sf_dir):
    """Join-key skew audit: per-key count distribution (key count, row
    count, max, p50, p99, the hottest key and its row share) for the
    keys the pipelines shuffle on.  This is the decision input for the
    salting operators — a key with top_share ≫ 1/executors or
    p99 ≫ p50 needs salted_join/salted_agg; auditing first avoids
    salting everything (2× shuffle cost) on a hunch.

    Scale: one count shuffle per audited key (map-side combined), then
    a 1-row aggregate over the per-key counts — the audit output is
    constant-sized regardless of data volume.  The hottest-key pick is
    deterministic via the zero-padded (count, key) ordering string."""
    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    return _skew_agg(ev, "user_id", "events.user_id").unionAll(
        _skew_agg(li, "l_partkey", "lineitem.l_partkey")
    )


@register(
    "t1_crosstab_chisq",
    oracle="""
    WITH t AS (
        SELECT event_type,
               CASE WHEN value < 50 THEN 'low'
                    WHEN value < 200 THEN 'mid'
                    ELSE 'high' END AS tier
        FROM events
    ),
    cells AS (SELECT event_type, tier, count(*) AS o FROM t GROUP BY 1, 2),
    rows_ AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r_tot FROM cells
              GROUP BY 1),
    cols_ AS (SELECT tier, CAST(sum(o) AS BIGINT) AS c_tot FROM cells
              GROUP BY 1),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
    grid AS (
        SELECT r.event_type, c.tier, r.r_tot, c.c_tot, tot.n,
               coalesce(cells.o, 0) AS o,
               CAST(r.r_tot AS DOUBLE) * CAST(c.c_tot AS DOUBLE)
                 / CAST(tot.n AS DOUBLE) AS e
        FROM rows_ r CROSS JOIN cols_ c CROSS JOIN tot
        LEFT JOIN cells ON cells.event_type = r.event_type
                       AND cells.tier = c.tier
    )
    SELECT max(n) AS n,
           CAST((count(DISTINCT event_type) - 1)
                * (count(DISTINCT tier) - 1) AS BIGINT) AS dof,
           round(CAST(sum(CAST(round(
                 (CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e, 9)
                 AS DECIMAL(28,9))) AS DOUBLE), 6) AS chi2
    FROM grid
    """,
)
def t1_crosstab_chisq(spark, sf_dir):
    """Chi-square independence test over the event_type × value-tier
    contingency table — the categorical drift/association check a
    curation pipeline runs between dataset versions.  The full grid is
    generated from the marginals (row-total × column-total cross of two
    tiny frames) so ZERO-count cells still contribute their expected
    mass; per-cell (O−E)²/E terms are rounded to 9 digits and summed as
    DECIMAL (cell-order-proof), and only the final statistic is double.

    Scale: one count shuffle builds the cells; marginals and the 1-row
    total are re-aggregations of the cell table (cardinality = |types|
    × |tiers|, never row count), cross-joined only at marginal size."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "event_type",
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 200, "mid")
        .otherwise("high")
        .alias("tier"),
    )
    cells = t.groupBy("event_type", "tier").agg(F.count(F.lit(1)).alias("o"))
    rows_ = cells.groupBy("event_type").agg(F.sum("o").alias("r_tot"))
    cols_ = cells.groupBy("tier").agg(F.sum("o").alias("c_tot"))
    tot = cells.agg(F.sum("o").alias("n"))
    grid = (
        rows_.crossJoin(F.broadcast(cols_))
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(cells), ["event_type", "tier"], "left")
        .select(
            "event_type",
            "tier",
            "n",
            F.coalesce("o", F.lit(0)).alias("o"),
            (
                F.col("r_tot").cast("double")
                * F.col("c_tot").cast("double")
                / F.col("n").cast("double")
            ).alias("e"),
        )
    )
    o_d = F.col("o").cast("double")
    return grid.agg(
        F.max("n").alias("n"),
        (
            (F.count_distinct(F.col("event_type")) - 1)
            * (F.count_distinct(F.col("tier")) - 1)
        ).alias("dof"),
        F.round(
            F.sum(
                F.round((o_d - F.col("e")) * (o_d - F.col("e")) / F.col("e"), 9)
                .cast("decimal(28,9)")
            ).cast("double"),
            6,
        ).alias("chi2"),
    )


@register(
    "t1_benford_audit",
    oracle="""
    WITH d AS (
        SELECT substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                      1, 1) AS digit
        FROM orders
    ),
    c AS (SELECT digit, count(*) AS n_d FROM d GROUP BY 1),
    t AS (SELECT CAST(sum(n_d) AS BIGINT) AS n FROM c)
    SELECT digit, n_d,
           round(CAST(n_d AS DOUBLE) / CAST(n AS DOUBLE), 6) AS obs_share,
           round(log10(CAST(1 AS DOUBLE)
                       + CAST(1 AS DOUBLE) / CAST(digit AS DOUBLE)), 6)
             AS exp_share,
           round(CAST(n_d AS DOUBLE) / CAST(n AS DOUBLE)
                 - log10(CAST(1 AS DOUBLE)
                         + CAST(1 AS DOUBLE) / CAST(digit AS DOUBLE)), 6)
             AS deviation
    FROM c CROSS JOIN t
    """,
)
def t1_benford_audit(spark, sf_dir):
    """Benford's-law first-digit audit of order totals: observed leading-
    digit shares against log10(1 + 1/d) — the classic fabricated-data /
    corrupted-feed detector for financial-style columns.  The leading
    digit is taken from the DECIMAL(18,2) string form (identical
    rendering on both engines; never from float formatting), so the
    digit histogram is exact and only the share math is double.

    Scale: a 9-group count with map-side combine plus a 1-row total —
    output size is constant; this audit is effectively free next to any
    real scan of the column."""
    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        F.substring(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
        ).alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n_d"))
    t = c.agg(F.sum("n_d").alias("n"))
    obs = F.col("n_d").cast("double") / F.col("n").cast("double")
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n_d",
            F.round(obs, 6).alias("obs_share"),
            F.round(exp, 6).alias("exp_share"),
            F.round(obs - exp, 6).alias("deviation"),
        )
    )


@register(
    "t1_join_cardinality_audit",
    oracle="""
    WITH a AS (SELECT user_id AS k, count(*) AS na FROM events GROUP BY 1),
    b AS (SELECT o_custkey AS k, count(*) AS nb FROM orders GROUP BY 1),
    pred AS (
        SELECT CAST(sum(na * nb) AS BIGINT) AS predicted,
               count(*) AS n_shared_keys,
               max(na * nb) AS max_key_pairs
        FROM a JOIN b USING (k)
    ),
    act AS (
        SELECT count(*) AS actual
        FROM events e JOIN orders o ON e.user_id = o.o_custkey
    )
    SELECT predicted, actual, n_shared_keys, max_key_pairs,
           predicted = actual AS consistent
    FROM pred CROSS JOIN act
    """,
)
def t1_join_cardinality_audit(spark, sf_dir):
    """Join-cardinality audit: the EXACT output size of an equi join,
    predicted from per-side key histograms (Σ n_a(k)·n_b(k)) without
    running the join — then cross-checked against the actual join count
    in the same result row (`consistent` must be true).  With
    t1_skew_audit this is the pre-flight for big joins: `predicted`
    says whether the join explodes, `max_key_pairs` says which key
    explodes it.

    Scale: two key-histogram shuffles (map-side combined, |keys| rows)
    and a histogram-sized join — the prediction costs a fraction of the
    join it sizes; the verification join here is the self-check and
    would be omitted in a pre-flight."""
    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    a = ev.groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).alias("na")
    )
    b = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("nb")
    )
    pred = a.join(b, "k").agg(
        F.sum(F.col("na") * F.col("nb")).alias("predicted"),
        F.count(F.lit(1)).alias("n_shared_keys"),
        F.max(F.col("na") * F.col("nb")).alias("max_key_pairs"),
    )
    act = ev.join(o, ev.user_id == o.o_custkey).agg(
        F.count(F.lit(1)).alias("actual")
    )
    return pred.crossJoin(F.broadcast(act)).select(
        "predicted",
        "actual",
        "n_shared_keys",
        "max_key_pairs",
        (F.col("predicted") == F.col("actual")).alias("consistent"),
    )
