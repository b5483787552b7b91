"""Round-9 eval-metric declared queries: expected-calibration-error
bins, Cohen's kappa, Matthews correlation per slice, and pairwise
Jensen–Shannon divergence between source token distributions — the
agreement / calibration / distribution-distance metrics that complete
the eval layer next to AUC, Brier, PR and PSI.

Exactness discipline: every probability is a single division of exact
integers; every data-dependent ln rounds to 9 places and sums as
DECIMAL(18,9) (order-independent) before one final cast; every rounded
double output is +0-normalized (the r8 signed-zero class).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.queries.registry import register

_CAP = 2000  # the t1_calibration_bins length-prior cap — same score
_ALPHA_Y_DUCK = (
    "CASE WHEN length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 10 "
    ">= length(text) * 7 THEN 1 ELSE 0 END"
)
_ALPHA_Y_SPARK = (
    "CASE WHEN length(regexp_replace(text, '[^a-zA-Z]', '')) * 10 "
    ">= length(text) * 7 THEN 1 ELSE 0 END"
)
_TOKS = "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')"


# --------------------------------------------------------------------------
# t1_ece_calibration


@register(
    "t1_ece_calibration",
    oracle=f"""
    WITH m AS (
        SELECT CAST(least(n_chars, {_CAP}) AS DOUBLE) / {_CAP} AS p,
               {_ALPHA_Y_DUCK} AS y
        FROM documents WHERE length(text) > 0
    ),
    b AS (SELECT CAST(least(floor(p * 10), 9) AS BIGINT) AS bin,
                 CAST(round(p, 9) AS DECIMAL(18,9)) AS p9, y
          FROM m),
    agg AS (SELECT bin,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS n_pos,
                   sum(p9) AS sp,
                   CAST(sum(count(*)) OVER () AS BIGINT) AS nt
            FROM b GROUP BY bin)
    SELECT bin, n, n_pos,
           round(CAST(sp AS DOUBLE) / n, 6) + 0 AS conf,
           round(CAST(n_pos AS DOUBLE) / n, 6) + 0 AS acc,
           round(CAST(abs(CAST(n_pos AS DECIMAL(18,9)) - sp) AS DOUBLE)
                 / nt, 9) + 0 AS ece_term
    FROM agg
    """,
)
def t1_ece_calibration(spark, sf_dir):
    """Expected-calibration-error terms per confidence bin for the
    capped-length prior against the alpha-ratio label (the
    t1_calibration_bins construction): ECE = Σ (n_b/N)·|acc_b −
    conf_b|, emitted per-bin so WHICH confidence band is miscalibrated
    stays visible — the actionable half a single ECE number hides.

    Exactness: p rounds to 9 places and sums as DECIMAL(18,9); the
    |n_pos − Σp| numerator is an exact decimal difference, so each
    ece_term is one division of exact operands.  Scale: one narrow map
    + one 10-bin map-side-combinable groupBy; the total-count window
    runs over 10 rows."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    p = F.least(F.col("n_chars"), F.lit(_CAP)).cast("double") / _CAP
    y = F.expr(_ALPHA_Y_SPARK)
    b = d.select(
        F.least(F.floor(p * 10), F.lit(9)).cast("bigint").alias("bin"),
        F.round(p, 9).cast("decimal(18,9)").alias("p9"),
        y.alias("y"),
    )
    agg = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.sum("p9").alias("sp"),
    ).withColumn(
        "nt",
        F.expr(
            "CAST(sum(n) OVER (ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "UNBOUNDED FOLLOWING) AS BIGINT)"
        ),
    )
    return agg.select(
        "bin", "n", "n_pos",
        (F.round(F.col("sp").cast("double") / F.col("n"), 6) + F.lit(0.0))
        .alias("conf"),
        (F.round(F.col("n_pos").cast("double") / F.col("n"), 6)
         + F.lit(0.0)).alias("acc"),
        (
            F.round(
                F.abs(
                    F.col("n_pos").cast("decimal(18,9)") - F.col("sp")
                ).cast("double")
                / F.col("nt"),
                9,
            )
            + F.lit(0.0)
        ).alias("ece_term"),
    )


# --------------------------------------------------------------------------
# t1_cohen_kappa

_LEN_T = 250
_TOK_T = 40


@register(
    "t1_cohen_kappa",
    oracle=f"""
    WITH m AS (
        SELECT lang,
               CASE WHEN n_chars >= {_LEN_T} THEN 1 ELSE 0 END AS a,
               CASE WHEN len({_TOKS}) >= {_TOK_T}
                    THEN 1 ELSE 0 END AS b
        FROM documents
    ),
    c AS (SELECT lang,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n11,
                 CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n10,
                 CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n01,
                 CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n00
          FROM m GROUP BY lang)
    SELECT lang, n, n11, n10, n01, n00,
           round(CASE WHEN (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                            + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
                           / n / n < 1
                      THEN (CAST(n11 + n00 AS DOUBLE) / n
                            - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                               + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
                              / n / n)
                           / (1 - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                                   + CAST(n01 + n00 AS DOUBLE)
                                     * (n10 + n00)) / n / n)
                 END, 6) + 0 AS kappa
    FROM c
    """,
)
def t1_cohen_kappa(spark, sf_dir):
    """Cohen's kappa per language between two independent quality
    raters — the character-length rule and the token-count rule —
    chance-corrected agreement (κ = (p_o − p_e)/(1 − p_e)): the
    standard check that two cheap heuristic labelers actually measure
    the same thing before either is used to train a quality model.

    Exactness: all four confusion cells are exact BIGINT; κ is one
    fixed IEEE chain over them, rounded and +0-normalized.  Scale: one
    narrow map + one |langs|-row map-side-combinable groupBy."""
    d = load_table(spark, sf_dir, "documents")
    a = F.when(F.col("n_chars") >= _LEN_T, 1).otherwise(0)
    b = F.when(
        F.size(
            F.filter(
                F.split(F.lower("text"), r"\s+"), lambda x: x != ""
            )
        )
        >= _TOK_T,
        1,
    ).otherwise(0)
    m = d.select("lang", a.alias("a"), b.alias("b"))
    c = m.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0))
        .cast("bigint").alias("n11"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 0), 1).otherwise(0))
        .cast("bigint").alias("n10"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 1), 1).otherwise(0))
        .cast("bigint").alias("n01"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 0), 1).otherwise(0))
        .cast("bigint").alias("n00"),
    )
    n = F.col("n")
    po = (F.col("n11") + F.col("n00")).cast("double") / n
    pe = (
        (F.col("n11") + F.col("n10")).cast("double")
        * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")).cast("double")
        * (F.col("n10") + F.col("n00"))
    ) / n / n
    kappa = F.when(pe < 1, (po - pe) / (F.lit(1) - pe))
    return c.select(
        "lang", "n", "n11", "n10", "n01", "n00",
        (F.round(kappa, 6) + F.lit(0.0)).alias("kappa"),
    )


# --------------------------------------------------------------------------
# t1_mcc_per_source


@register(
    "t1_mcc_per_source",
    oracle=f"""
    WITH m AS (SELECT source,
                      CASE WHEN n_chars >= {_LEN_T} THEN 1 ELSE 0 END
                        AS pred,
                      CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
               FROM documents),
    c AS (SELECT source,
                 CAST(sum(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS tp,
                 CAST(sum(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS fp,
                 CAST(sum(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS fn,
                 CAST(sum(CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS tn
          FROM m GROUP BY source)
    SELECT source, tp, fp, fn, tn,
           round(CASE WHEN (tp + fp) * (tp + fn) > 0
                       AND (tn + fp) * (tn + fn) > 0
                      THEN (CAST(tp AS DOUBLE) * tn
                            - CAST(fp AS DOUBLE) * fn)
                           / sqrt(CAST(tp + fp AS DOUBLE)
                                  * CAST(tp + fn AS DOUBLE)
                                  * CAST(tn + fp AS DOUBLE)
                                  * CAST(tn + fn AS DOUBLE))
                 END, 6) + 0 AS mcc
    FROM c
    """,
)
def t1_mcc_per_source(spark, sf_dir):
    """Matthews correlation per source of the length-threshold
    classifier against the language label — the single balanced-
    confusion number (unlike F1 it uses all four cells, so a
    majority-class-predictor scores 0, not high) sliced by source to
    show WHERE the heuristic breaks.  Degenerate slices (an all-one
    margin) emit NULL, never a division by zero.

    Exactness: the four cells are exact BIGINT; the four margin
    factors multiply as DOUBLEs in a fixed order (BIGINT products
    would overflow at large SF), then one sqrt and one division,
    rounded and +0-normalized.  Scale: one narrow map + one
    |sources|-row map-side-combinable groupBy."""
    m = load_table(spark, sf_dir, "documents").select(
        "source",
        F.when(F.col("n_chars") >= _LEN_T, 1).otherwise(0).alias("pred"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    c = m.groupBy("source").agg(
        F.sum(F.when((F.col("pred") == 1) & (F.col("y") == 1), 1).otherwise(0))
        .cast("bigint").alias("tp"),
        F.sum(F.when((F.col("pred") == 1) & (F.col("y") == 0), 1).otherwise(0))
        .cast("bigint").alias("fp"),
        F.sum(F.when((F.col("pred") == 0) & (F.col("y") == 1), 1).otherwise(0))
        .cast("bigint").alias("fn"),
        F.sum(F.when((F.col("pred") == 0) & (F.col("y") == 0), 1).otherwise(0))
        .cast("bigint").alias("tn"),
    )
    tp, fp, fn, tn = (F.col(x) for x in ("tp", "fp", "fn", "tn"))
    num = tp.cast("double") * tn - fp.cast("double") * fn
    den = F.sqrt(
        (tp + fp).cast("double")
        * (tp + fn).cast("double")
        * (tn + fp).cast("double")
        * (tn + fn).cast("double")
    )
    mcc = F.when(
        ((tp + fp) * (tp + fn) > 0) & ((tn + fp) * (tn + fn) > 0),
        num / den,
    )
    return c.select(
        "source", "tp", "fp", "fn", "tn",
        (F.round(mcc, 6) + F.lit(0.0)).alias("mcc"),
    )


# --------------------------------------------------------------------------
# t1_js_divergence_sources

_JS_SOURCES = ("src0", "src1", "src2", "src3")  # pinned pair universe


@register(
    "t1_js_divergence_sources",
    oracle=f"""
    WITH tok AS (
        SELECT source, unnest({_TOKS}) AS tok
        FROM documents WHERE source IN {_JS_SOURCES}
    ),
    vocab AS (SELECT DISTINCT tok FROM tok),
    srcs AS (SELECT DISTINCT source FROM tok),
    grid AS (SELECT source, tok FROM srcs CROSS JOIN vocab),
    c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS n
          FROM tok GROUP BY source, tok),
    g AS (SELECT grid.source, grid.tok,
                 CAST(coalesce(c.n, 0) AS BIGINT) AS n
          FROM grid LEFT JOIN c
            ON grid.source = c.source AND grid.tok = c.tok),
    t AS (SELECT source, CAST(sum(n) AS BIGINT) AS tot FROM g GROUP BY source),
    d AS (SELECT g.source, g.tok,
                 CAST(g.n AS DOUBLE) / t.tot AS p
          FROM g JOIN t ON g.source = t.source),
    pair AS (SELECT a.source AS source_a, b.source AS source_b,
                    CAST(round(
                      0.5 * (CASE WHEN a.p > 0
                                  THEN a.p * ln(2 * a.p / (a.p + b.p))
                                  ELSE 0 END
                           + CASE WHEN b.p > 0
                                  THEN b.p * ln(2 * b.p / (a.p + b.p))
                                  ELSE 0 END), 9) AS DECIMAL(18,9)) AS term
             FROM d a JOIN d b
               ON a.tok = b.tok AND a.source < b.source)
    SELECT source_a, source_b,
           round(CAST(sum(term) AS DOUBLE), 9) + 0 AS js
    FROM pair GROUP BY source_a, source_b
    """,
)
def t1_js_divergence_sources(spark, sf_dir):
    """Pairwise Jensen–Shannon divergence between source token
    distributions (pinned 4-source universe, dense vocabulary grid so
    one-sided tokens contribute their full p·ln2 mass) — the bounded
    symmetric distance mixing plans use to decide whether two sources
    are near-duplicates at the DISTRIBUTION level (JS ≈ 0) or
    complementary (JS → ln 2), where KL would be infinite on any
    disjoint token.

    Exactness: p and q are single divisions of exact counts over a
    dense grid; each JS term is a fixed IEEE chain rounded to 9 and
    summed as DECIMAL(18,9), then one cast, +0-normalized.  Scale: the
    per-token work is one (source, tok) aggregate; grid, totals, and
    the pair join all run on |vocab|·|sources| rows with the totals
    broadcast."""
    tok = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("source").isin(*_JS_SOURCES))
        .select(
            "source",
            F.explode(
                F.filter(
                    F.split(F.lower("text"), r"\s+"), lambda x: x != ""
                )
            ).alias("tok"),
        )
    )
    # One explode pass instead of three: vocab / srcs / counts used to
    # aggregate the token stream under THREE different shuffle keys
    # (tok, source, (source, tok)) — distinct subtrees, so exchange
    # reuse could not dedupe them and the tokenize+explode ran three
    # times.  The (source, tok) counts determine both distinct sets, so
    # derive vocab and srcs FROM the checkpointed counts (≤ |srcs|·|vocab|
    # rows — the unigram vocabulary is closed).
    c = tok.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).localCheckpoint(eager=True)
    vocab = c.select("tok").distinct()
    srcs = c.select("source").distinct()
    grid = srcs.crossJoin(F.broadcast(vocab))
    g = grid.join(c, ["source", "tok"], "left").select(
        "source", "tok", F.coalesce("n", F.lit(0)).cast("bigint").alias("n")
    )
    t = g.groupBy("source").agg(F.sum("n").cast("bigint").alias("tot"))
    d = g.join(F.broadcast(t), "source").select(
        "source", "tok",
        (F.col("n").cast("double") / F.col("tot")).alias("p"),
    )
    a = d.select(
        F.col("source").alias("source_a"), "tok", F.col("p").alias("pa")
    )
    b = d.select(
        F.col("source").alias("source_b"), "tok", F.col("p").alias("pb")
    )
    pa, pb = F.col("pa"), F.col("pb")
    term = 0.5 * (
        F.when(pa > 0, pa * F.log(2 * pa / (pa + pb))).otherwise(0.0)
        + F.when(pb > 0, pb * F.log(2 * pb / (pa + pb))).otherwise(0.0)
    )
    pair = (
        a.join(b, "tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .select(
            "source_a", "source_b",
            F.round(term, 9).cast("decimal(18,9)").alias("term"),
        )
    )
    return pair.groupBy("source_a", "source_b").agg(
        (F.round(F.sum("term").cast("double"), 9) + F.lit(0.0)).alias("js")
    )
