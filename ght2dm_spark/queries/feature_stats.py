"""Statistical feature / audit operators: closed-form per-group OLS
regression, MAD-based robust outlier flags, exact heavy hitters, and a
k-anonymity generalization ladder.

The regression and MAD shapes follow the repo's exactness discipline:
every aggregate is an exact decimal/integer sum; doubles appear only in
the final closed-form arithmetic, with identical expression shape on
both engines, rounded at the edge.  Heavy hitters keeps its threshold
comparison in integers (cnt·1000 ≥ N) so no float compare can flake.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.queries.registry import register


@register(
    "t1_regression_per_group",
    oracle="""
    WITH b AS (
        SELECT event_type, min(epoch_us(ts) // 1000000) AS t0
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT e.event_type,
               epoch_us(e.ts) // 1000000 - b.t0 AS x,
               CAST(e.value AS DECIMAL(19,6)) AS y
        FROM events e JOIN b USING (event_type)
    ),
    m AS (
        SELECT event_type,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(x) AS DOUBLE) AS sx,
               CAST(sum(x * x) AS DOUBLE) AS sxx,
               CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(y * CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS sxy,
               CAST(sum(y * y) AS DOUBLE) AS syy,
               count(*) AS n_obs
        FROM s GROUP BY 1
    )
    SELECT event_type, n_obs,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx)
                 * CAST(86400 AS DOUBLE), 6) AS slope_per_day,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
                 6) AS intercept,
           round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM m
    """,
)
def t1_regression_per_group(spark, sf_dir):
    """Per-group closed-form OLS of value against time (regr_slope /
    regr_intercept / regr_r2 semantics) from the five sufficient
    moments (n, Σx, Σx², Σy, Σxy[, Σy²]) — the map-side-combinable
    formulation that fits any aggregation framework at scale.

    Exactness: x is centered at the per-group minimum epoch-second (a
    broadcast 5-row bounds join), so Σx² stays within int64; y is
    quantized to DECIMAL(19,6) and Σy/Σxy/Σy² are exact int128 decimal
    sums.  Only the closed-form combination of the (identical) moment
    values is double arithmetic, written with the same expression shape
    on both engines and rounded to 6 digits.

    Scale: one shuffle on the group key with full partial aggregation;
    the bounds pass is a second tiny shuffle.  No window, no sort —
    this is how regression features are computed over 100 TB of events
    per entity."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.expr("unix_micros(cast(ts as timestamp)) div 1000000")
    b = ev.groupBy("event_type").agg(F.min(sec).alias("t0"))
    s = ev.join(F.broadcast(b), "event_type").select(
        "event_type",
        (sec - F.col("t0")).alias("x"),
        F.col("value").cast("decimal(19,6)").alias("y"),
    )
    m = s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("y") * F.col("x").cast("decimal(19,0)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    n, sx, sxx, sy, sxy, syy = (
        F.col("n"), F.col("sx"), F.col("sxx"), F.col("sy"), F.col("sxy"),
        F.col("syy"),
    )
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope = num / den
    return m.select(
        "event_type",
        "n_obs",
        F.round(slope * F.lit(86400.0), 6).alias("slope_per_day"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round((num * num) / (den * (n * syy - sy * sy)), 6).alias("r2"),
    )


@register(
    "t1_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY 1
    ),
    dev AS (
        SELECT e.event_type, med.med, abs(e.value - med.med) AS adev
        FROM events e JOIN med USING (event_type)
    ),
    mad AS (
        SELECT event_type, med, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY 1, 2
    )
    SELECT d.event_type, round(m.med, 6) AS med, round(m.mad, 6) AS mad,
           count(*) AS n,
           CAST(sum(CASE WHEN d.adev > CAST(4.4478 AS DOUBLE) * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(CAST(sum(CASE WHEN d.adev > CAST(4.4478 AS DOUBLE) * m.mad
                              THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS outlier_rate
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY 1, 2, 3
    """,
)
def t1_mad_outliers(spark, sf_dir):
    """Robust outlier detection via median absolute deviation: flag
    values beyond 3·1.4826·MAD (≈3σ under normality) of the per-group
    median.  Mean/stddev z-scores break down exactly when outliers are
    present (the outliers inflate σ and mask themselves); the
    median/MAD pair has a 50% breakdown point.

    Two exact interpolated-percentile passes (Spark percentile ≡ DuckDB
    quantile_cont) with the tiny per-group medians broadcast back
    between them; the 4.4478 threshold multiply and compare run on
    bit-identical doubles on both engines.

    Scale: percentile is the exact-sort path (the correctness anchor);
    at 100 TB swap pass 1 for approx_percentile and keep the plan —
    both passes are one shuffle on the group key, and the re-join is a
    5-row broadcast."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type", "med").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    is_out = F.col("adev") > F.lit(4.4478) * F.col("mad")
    return (
        dev.drop("med")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outliers"),
        )
        .select(
            "event_type",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n",
            "n_outliers",
            F.round(
                F.col("n_outliers").cast("double") / F.col("n").cast("double"), 6
            ).alias("outlier_rate"),
        )
    )


@register(
    "t1_heavy_hitters",
    oracle=r"""
    WITH toks AS (
        SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                  t -> t <> '')) AS tok
        FROM documents
    ),
    cnt AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
    tot AS (SELECT count(*) AS total FROM toks)
    SELECT tok, cnt,
           round(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE), 6) AS freq
    FROM cnt, tot
    WHERE cnt * 1000 >= total
    """,
)
def t1_heavy_hitters(spark, sf_dir):
    """Exact φ-frequent items (φ = 0.1%): corpus tokens whose count
    reaches φ·N — the vocabulary-pruning / stopword-discovery primitive,
    and the exact baseline a Misra-Gries or Count-Min sketch
    approximates at stream scale.  The threshold compare is kept in
    integers (cnt·1000 ≥ N) so no engine's float rounding can move a
    boundary token in or out.

    Scale: one explode + one count shuffle (map-side combined — token
    partials bound state by vocabulary, not corpus size); the corpus
    total rides as a 1-row broadcast.  The sketch variant replaces the
    count shuffle with per-partition summaries merged on the driver —
    same contract, sublinear state."""
    from ght2dm_spark.functions.text import explode_ws_tokens

    d = load_table(spark, sf_dir, "documents")
    tok = explode_ws_tokens(d, "text", "tok")
    cnt = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    tot = tok.agg(F.count(F.lit(1)).alias("total"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * 1000 >= F.col("total"))
        .select(
            "tok",
            "cnt",
            F.round(
                F.col("cnt").cast("double") / F.col("total").cast("double"), 6
            ).alias("freq"),
        )
    )


@register(
    "t1_k_anonymity",
    oracle="""
    WITH g0 AS (
        SELECT c_mktsegment AS seg, c_nationkey AS nat, count(*) AS n0
        FROM customer GROUP BY 1, 2
    ),
    g1 AS (
        SELECT g0.seg, n.n_regionkey AS reg, CAST(sum(g0.n0) AS BIGINT) AS n1
        FROM g0 JOIN nation n ON g0.nat = n.n_nationkey
        WHERE g0.n0 < 5
        GROUP BY 1, 2
    )
    SELECT g0.seg, g0.nat, g0.n0,
           CASE WHEN g0.n0 >= 5 THEN 0
                WHEN g1.n1 >= 5 THEN 1
                ELSE 2 END AS level,
           CASE WHEN g0.n0 >= 5 THEN g0.n0
                WHEN g1.n1 >= 5 THEN g1.n1
                ELSE NULL END AS anon_n
    FROM g0
    JOIN nation n ON g0.nat = n.n_nationkey
    LEFT JOIN g1 ON g0.seg = g1.seg AND n.n_regionkey = g1.reg
    """,
)
def t1_k_anonymity(spark, sf_dir):
    """k-anonymity audit with a generalization ladder (k = 5): each
    quasi-identifier group (segment, nation) either passes at level 0,
    is generalized to (segment, region) — pooling only the failing
    groups, i.e. local recoding — and passes at level 1, or must be
    suppressed (level 2).  This is the privacy gate a training-data
    release pipeline runs before publishing user-derived tables.

    Scale: two aggregations over the quasi-identifier keys (group
    counts, then generalized re-counts of the failures only) plus
    broadcast joins of the tiny nation dim and the level-1 group table
    — group-cardinality-sized state, never row-sized."""
    c = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    g0 = (
        c.groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("c_nationkey").alias("nat"),
        )
        .agg(F.count(F.lit(1)).alias("n0"))
        .join(F.broadcast(nation), F.col("nat") == F.col("n_nationkey"))
        .drop("n_nationkey")
        .withColumnRenamed("n_regionkey", "reg")
    )
    g1 = (
        g0.filter(F.col("n0") < 5)
        .groupBy("seg", "reg")
        .agg(F.sum("n0").alias("n1"))
    )
    return (
        g0.join(F.broadcast(g1), ["seg", "reg"], "left")
        .select(
            "seg",
            "nat",
            "n0",
            F.when(F.col("n0") >= 5, 0)
            .when(F.col("n1") >= 5, 1)
            .otherwise(2)
            .alias("level"),
            F.when(F.col("n0") >= 5, F.col("n0"))
            .when(F.col("n1") >= 5, F.col("n1"))
            .otherwise(F.lit(None))
            .alias("anon_n"),
        )
    )


@register(
    "t1_drift_tvd",
    oracle="""
    WITH v AS (SELECT CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END
                        AS cohort,
                      CAST(round(value * 100, 0) AS BIGINT) AS c
               FROM events),
    b AS (SELECT min(c) AS lo, max(c) AS hi FROM v),
    binned AS (SELECT cohort,
                      least(CAST(((c - lo) * 10) // (hi - lo + 1) AS BIGINT),
                            9) AS bin
               FROM v, b),
    cnt AS (SELECT cohort, bin, count(*) AS n FROM binned GROUP BY 1, 2),
    tot AS (SELECT cohort, sum(n) AS t FROM cnt GROUP BY 1),
    p AS (SELECT bin,
                 coalesce(max(CASE WHEN cohort = 'a'
                                   THEN n * 1000000 // t END), 0) AS pa_ppm,
                 coalesce(max(CASE WHEN cohort = 'b'
                                   THEN n * 1000000 // t END), 0) AS pb_ppm,
                 coalesce(max(CASE WHEN cohort = 'a' THEN n END), 0) AS na,
                 coalesce(max(CASE WHEN cohort = 'b' THEN n END), 0) AS nb
          FROM cnt JOIN tot USING (cohort) GROUP BY bin)
    SELECT CAST(bin AS INT) AS bin,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(pa_ppm AS BIGINT) AS pa_ppm, CAST(pb_ppm AS BIGINT) AS pb_ppm,
           CAST(abs(pa_ppm - pb_ppm) AS BIGINT) AS abs_diff_ppm
    FROM p
    """,
)
def t1_drift_tvd(spark, sf_dir):
    """Feature-distribution drift between two cohorts as per-bin
    histogram divergence — the production drift monitor in its
    exact-integer form: events split by id parity (standing in for
    before/after a pipeline change), values bucketed into 10 equal-width
    bins over the GLOBAL range, per-cohort bin shares in integer ppm,
    and |pa − pb| per bin (the consumer sums and halves for total
    variation distance; TVD is chosen over PSI because PSI's ln makes
    exact cross-engine matching impossible while TVD is pure integer
    arithmetic and bounds every f-divergence-based alarm anyway).

    Scale: the bin bounds are one global min/max aggregate broadcast as
    a 1-row frame; binning is a narrow map; everything after is
    10-row frames."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("cohort"),
        F.round(F.col("value") * 100, 0).cast("long").alias("c"),
    )
    b = v.agg(F.min("c").alias("lo"), F.max("c").alias("hi"))
    binned = v.crossJoin(F.broadcast(b)).select(
        "cohort",
        F.least(
            F.expr("((c - lo) * 10) div (hi - lo + 1)"), F.lit(9).cast("long")
        ).alias("bin"),
    )
    cnt = binned.groupBy("cohort", "bin").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("cohort").agg(F.sum("n").alias("t"))
    p = (
        cnt.join(F.broadcast(tot), "cohort")
        .groupBy("bin")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("cohort") == "a", F.expr("n * 1000000 div t"))),
                F.lit(0),
            ).alias("pa_ppm"),
            F.coalesce(
                F.max(F.when(F.col("cohort") == "b", F.expr("n * 1000000 div t"))),
                F.lit(0),
            ).alias("pb_ppm"),
            F.coalesce(
                F.max(F.when(F.col("cohort") == "a", F.col("n"))), F.lit(0)
            ).alias("na"),
            F.coalesce(
                F.max(F.when(F.col("cohort") == "b", F.col("n"))), F.lit(0)
            ).alias("nb"),
        )
    )
    return p.select(
        F.col("bin").cast("int").alias("bin"),
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.col("pa_ppm").cast("bigint").alias("pa_ppm"),
        F.col("pb_ppm").cast("bigint").alias("pb_ppm"),
        F.abs(F.col("pa_ppm") - F.col("pb_ppm"))
        .cast("bigint")
        .alias("abs_diff_ppm"),
    )


@register(
    "t1_length_lognormal",
    oracle="""
    WITH t AS (
        SELECT lang,
               CAST(round(log2(CAST(n_chars AS DOUBLE)), 9)
                    AS DECIMAL(18,9)) AS lg,
               CAST(round(log2(CAST(n_chars AS DOUBLE))
                          * log2(CAST(n_chars AS DOUBLE)), 9)
                    AS DECIMAL(18,9)) AS lg2
        FROM documents WHERE n_chars > 0
    )
    SELECT lang, count(*) AS n,
           round(CAST(sum(lg) AS DOUBLE) / count(*), 6) AS mu,
           round(sqrt(greatest(0,
               CAST(sum(lg2) AS DOUBLE) / count(*)
               - (CAST(sum(lg) AS DOUBLE) / count(*))
                 * (CAST(sum(lg) AS DOUBLE) / count(*)))), 6) AS sigma
    FROM t GROUP BY lang
    """,
)
def t1_length_lognormal(spark, sf_dir):
    """Log-normal fit of document lengths per language (mu, sigma of
    log2 length) — the two numbers that summarize a source's length
    distribution for chunking policy, sampling weights, and
    out-of-distribution detection (real text lengths are famously
    log-normal; a bad sigma flags boilerplate or truncation).

    Exactness discipline: per-document log2 terms (and their squares)
    round to DECIMAL(18,9) before summation — exact fixed-point, order
    independent (the char-entropy pattern; engine log2 parity on
    identical double inputs is pinned by that query's green rows) —
    and mu/sigma are fixed chains of IEEE ops over the exact sums
    (sqrt is correctly rounded by IEEE 754, so it is parity-safe).
    Scale: a narrow map plus one |langs|-row groupBy."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    lg = F.log2(F.col("n_chars").cast("double"))
    t = d.select(
        "lang",
        F.round(lg, 9).cast("decimal(18,9)").alias("lg"),
        F.round(lg * lg, 9).cast("decimal(18,9)").alias("lg2"),
    )
    s1 = F.sum("lg").cast("double") / F.count(F.lit(1))
    s2 = F.sum("lg2").cast("double") / F.count(F.lit(1))
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(s1, 6).alias("mu"),
        F.round(F.sqrt(F.greatest(F.lit(0.0), s2 - s1 * s1)), 6)
        .alias("sigma"),
    )
