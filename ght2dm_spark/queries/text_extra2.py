"""Round-9 text/corpus-analysis declared queries: per-document bigram
entropy, type-token-ratio distribution, Zipf-fit residuals over the
shingle vocabulary, per-source KL divergence from the corpus token
distribution, and shingle burstiness across corpus-prefix deciles —
the lexical-statistics audits that sit between t1_vocab_growth's
macro curve and per-document quality scoring.

The synthetic corpus closes its unigram vocabulary at 31 types (every
rarity-style statistic needs the 3-gram shingle space, 27k types), so
the rank-fit and burstiness queries work on shingles while the
entropy/TTR/KL queries — which measure DISTRIBUTION, not rarity —
stay on tokens where the 31-type support is genuine signal.

Exactness discipline: probabilities are single divisions of exact
BIGINT counts; every data-dependent ln/log2 rounds to 9 and sums as
DECIMAL(18,9); every rounded double output is +0-normalized (the r8
signed-zero class).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.operators.neardup import TOKS_SQL, shingle_df, shingle_sql
from ght2dm_spark.queries.registry import register

_TOKS = TOKS_SQL.format(text="text")

_SH_SQL = f"""
    t0 AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_distinct({shingle_sql("toks", None, 3)}))
                    AS shingle
           FROM t0)
"""


def _spark_toks(d):
    return F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")


# --------------------------------------------------------------------------
# t1_doc_bigram_entropy


@register(
    "t1_doc_bigram_entropy",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    bg AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bigram
           FROM t, unnest(range(1, len(toks))) AS u(i)
           WHERE len(toks) >= 2),
    c AS (SELECT doc_id, bigram, CAST(count(*) AS BIGINT) AS c
          FROM bg GROUP BY doc_id, bigram),
    tt AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS t,
                  CAST(count(*) AS BIGINT) AS n_distinct
           FROM c GROUP BY doc_id),
    term AS (SELECT c.doc_id, tt.t, tt.n_distinct,
                    CAST(round(-(CAST(c.c AS DOUBLE) / tt.t)
                               * log2(CAST(c.c AS DOUBLE) / tt.t), 9)
                         AS DECIMAL(18,9)) AS h
             FROM c JOIN tt ON c.doc_id = tt.doc_id)
    SELECT doc_id, CAST(max(t) AS BIGINT) AS n_bigrams,
           CAST(max(n_distinct) AS BIGINT) AS n_distinct,
           round(CAST(sum(h) AS DOUBLE), 9) + 0 AS entropy
    FROM term GROUP BY doc_id
    """,
)
def t1_doc_bigram_entropy(spark, sf_dir):
    """Per-document token-bigram entropy (bits): the repetitiveness
    score one order above unigram entropy — template/boilerplate docs
    reuse the same transitions and score low even when their unigram
    mix looks normal, making this the cheap structural complement to
    t1_repetition_ratio for quality filtering.

    Exactness: within-doc bigram counts are exact; each −p·log2(p)
    term rounds to 9 and sums as DECIMAL(18,9).  Scale: the bigram
    explosion is a positional zip of the token array with its own tail
    (narrow map, no join); everything downstream groups on doc_id —
    one shuffle key end to end."""
    d = load_table(spark, sf_dir, "documents")
    # ONE exchange end to end: hash the doc rows by doc_id BEFORE the
    # bigram explode — HashPartitioning(doc_id) satisfies the
    # (doc_id, bigram) groupBy's clustering AND the doc_id window/agg
    # below, so the two bigram-sized exchanges the old plan paid
    # (groupBy key, then window key) disappear; the only shuffle moves
    # |docs| rows, pre-explosion (guide §2.4 "share one exchange").
    t = (
        d.select("doc_id", _spark_toks(d).alias("toks"))
        .filter(F.size("toks") >= 2)
        .repartition("doc_id")
    )
    bg = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(toks, 1, size(toks) - 1),"
                " (x, i) -> concat(x, ' ', toks[i + 1]))"
            )
        ).alias("bigram"),
    )
    c = bg.groupBy("doc_id", "bigram").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wt = Window.partitionBy("doc_id")
    p = F.col("c").cast("double") / F.col("t")
    term = c.select(
        "doc_id",
        F.sum("c").over(wt).cast("bigint").alias("t"),
        F.count(F.lit(1)).over(wt).cast("bigint").alias("n_distinct"),
        "c",
    ).select(
        "doc_id", "t", "n_distinct",
        F.round(-p * F.log2(p), 9).cast("decimal(18,9)").alias("h"),
    )
    return term.groupBy("doc_id").agg(
        F.max("t").cast("bigint").alias("n_bigrams"),
        F.max("n_distinct").cast("bigint").alias("n_distinct"),
        (F.round(F.sum("h").cast("double"), 9) + F.lit(0.0))
        .alias("entropy"),
    )


# --------------------------------------------------------------------------
# t1_ttr_distribution


@register(
    "t1_ttr_distribution",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    d AS (SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_toks,
                 CAST(len(list_distinct(toks)) AS BIGINT) AS n_types
          FROM t WHERE len(toks) > 0),
    r AS (SELECT doc_id,
                 CAST(n_types * 1000000 // n_toks AS BIGINT) AS ttr_ppm
          FROM d)
    SELECT CAST(least(ttr_ppm // 100000, 9) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(ttr_ppm) AS BIGINT) AS lo_ppm,
           CAST(max(ttr_ppm) AS BIGINT) AS hi_ppm
    FROM r GROUP BY bucket
    """,
)
def t1_ttr_distribution(spark, sf_dir):
    """Type-token-ratio histogram: per-document lexical diversity
    (distinct/total tokens, exact ppm) bucketed into deciles of the
    [0,1] range — the corpus-level shape that separates recombined
    boilerplate (low-TTR mass) from natural prose, and the quick
    pre-check before paying for the shingle-level novelty pass.

    Exactness: both counts and the ppm floor-division are integers
    end to end.  Scale: one narrow array map per doc (no explode —
    distinct-count via list_distinct inside the row), one 10-row
    rollup."""
    d0 = load_table(spark, sf_dir, "documents")
    d = d0.select(
        "doc_id", _spark_toks(d0).alias("toks")
    ).filter(F.size("toks") > 0).select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_toks"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_types"),
    )
    r = d.select(
        "doc_id",
        F.expr("CAST(n_types * 1000000L div n_toks AS BIGINT)")
        .alias("ttr_ppm"),
    )
    bucket = F.least(
        F.expr("CAST(ttr_ppm div 100000 AS BIGINT)"), F.lit(9)
    ).cast("bigint")
    return r.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("ttr_ppm").cast("bigint").alias("lo_ppm"),
        F.max("ttr_ppm").cast("bigint").alias("hi_ppm"),
    )


# --------------------------------------------------------------------------
# t1_zipf_residuals

_ZIPF_TOP = 50


@register(
    "t1_zipf_residuals",
    oracle=f"""
    WITH {_SH_SQL},
    freq AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df
             FROM sh GROUP BY shingle),
    top AS (SELECT shingle, df,
                   CAST(row_number() OVER (ORDER BY df DESC, shingle ASC)
                        AS BIGINT) AS rank
            FROM freq
            QUALIFY rank <= {_ZIPF_TOP}),
    pt AS (SELECT shingle, df, rank,
                  round(log2(CAST(rank AS DOUBLE)), 9) AS x,
                  round(log2(CAST(df AS DOUBLE)), 9) AS y
           FROM top),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(x AS DECIMAL(18,9))) AS sx,
                 sum(CAST(y AS DECIMAL(18,9))) AS sy,
                 sum(CAST(round(x * y, 9) AS DECIMAL(18,9))) AS sxy,
                 sum(CAST(round(x * x, 9) AS DECIMAL(18,9))) AS sxx
          FROM pt),
    fit AS (SELECT n,
                   (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                      * CAST(sy AS DOUBLE))
                   / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                      * CAST(sx AS DOUBLE)) AS slope,
                   CAST(sy AS DOUBLE) / n AS ybar,
                   CAST(sx AS DOUBLE) / n AS xbar
            FROM s)
    SELECT pt.rank, pt.shingle, pt.df,
           round(pt.y - (fit.ybar + fit.slope * (pt.x - fit.xbar)), 6) + 0
             AS resid
    FROM pt CROSS JOIN fit
    """,
)
def t1_zipf_residuals(spark, sf_dir):
    """Per-rank residuals from the log-log Zipf OLS fit over the top
    50 shingle frequencies — WHERE the rank-frequency curve bends away
    from the power law (positive head residuals = boilerplate
    over-representation, the dedup target; tail sag = truncation),
    the diagnostic detail t1_zipf_fit's single slope summarizes away.

    Exactness: ranks and frequencies are exact; log points round to 9
    and the OLS moments sum as DECIMAL(18,9); each residual is one
    fixed IEEE chain against the broadcast 1-row fit, rounded and
    +0-normalized (head residuals near zero MUST hash +0.0).  Scale:
    one shingle-df aggregate, a 50-row rank window over the vocab
    frame, and a broadcast scalar join."""
    sh = shingle_df(load_table(spark, sf_dir, "documents"),
                    "doc_id", "text", 3)
    freq = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    w = Window.orderBy(F.col("df").desc(), F.col("shingle").asc())
    top = freq.withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    ).filter(F.col("rank") <= _ZIPF_TOP)
    # checkpoint: pt is exactly _ZIPF_TOP rows but its lineage is the
    # full shingle-df aggregate + global rank window; it feeds BOTH the
    # OLS moment aggregate and the final residual projection, and
    # uncheckpointed each reference replays the whole shingle pass
    # (4 Generate / 4 Window nodes in the r09 before-plan — two copies
    # of everything).  One materialized 50-row frame halves the query.
    pt = top.select(
        "shingle", "df", "rank",
        F.round(F.log2(F.col("rank").cast("double")), 9).alias("x"),
        F.round(F.log2(F.col("df").cast("double")), 9).alias("y"),
    ).localCheckpoint(eager=True)
    s = pt.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(18,9)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(18,9)")).alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 9).cast("decimal(18,9)"))
        .alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 9).cast("decimal(18,9)"))
        .alias("sxx"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    fit = s.select(
        ((n * sxy - sx * sy) / (n * sxx - sx * sx)).alias("slope"),
        (sy / n).alias("ybar"),
        (sx / n).alias("xbar"),
    )
    return pt.crossJoin(F.broadcast(fit)).select(
        "rank", "shingle", "df",
        (
            F.round(
                F.col("y")
                - (
                    F.col("ybar")
                    + F.col("slope") * (F.col("x") - F.col("xbar"))
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("resid"),
    )


# --------------------------------------------------------------------------
# t1_kl_source_divergence


@register(
    "t1_kl_source_divergence",
    oracle=f"""
    WITH tok AS (SELECT source, unnest({_TOKS}) AS tok FROM documents),
    cs AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS n
           FROM tok GROUP BY source, tok),
    ts AS (SELECT source, CAST(sum(n) AS BIGINT) AS t
           FROM cs GROUP BY source),
    cc AS (SELECT tok, CAST(sum(n) AS BIGINT) AS nc FROM cs GROUP BY tok),
    tc AS (SELECT CAST(sum(nc) AS BIGINT) AS tt FROM cc),
    term AS (SELECT cs.source, ts.t,
                    CAST(round((CAST(cs.n AS DOUBLE) / ts.t)
                               * ln((CAST(cs.n AS DOUBLE) / ts.t)
                                    / (CAST(cc.nc AS DOUBLE)
                                       / (SELECT tt FROM tc))), 9)
                         AS DECIMAL(18,9)) AS kl9
             FROM cs
             JOIN ts ON cs.source = ts.source
             JOIN cc ON cs.tok = cc.tok)
    SELECT source, CAST(max(t) AS BIGINT) AS n_tokens,
           round(CAST(sum(kl9) AS DOUBLE), 9) + 0 AS kl
    FROM term GROUP BY source
    """,
)
def t1_kl_source_divergence(spark, sf_dir):
    """KL divergence of each source's token distribution from the
    corpus distribution — the per-source skew score a mixing plan
    reads next to t1_mix_entropy: a source with high KL pulls the
    training distribution hardest per token it contributes (and is
    the first candidate for temperature down-weighting).  Tokens the
    source lacks contribute zero by the p·ln(p/q) limit; corpus q is
    positive for every token a source has, so no term is undefined.

    Exactness: p and q are single divisions of exact counts; each
    term rounds to 9 and sums as DECIMAL(18,9).  Scale: one
    (source, tok) aggregate is the only per-token shuffle; source
    totals and the corpus distribution are vocabulary-sized frames
    joined back broadcast."""
    tok = load_table(spark, sf_dir, "documents").select(
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
        ).alias("tok"),
    )
    cs = tok.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    ts = cs.groupBy("source").agg(F.sum("n").cast("bigint").alias("t"))
    cc = cs.groupBy("tok").agg(F.sum("n").cast("bigint").alias("nc"))
    tc = cc.agg(F.sum("nc").cast("bigint").alias("tt"))
    p = F.col("n").cast("double") / F.col("t")
    q = F.col("nc").cast("double") / F.col("tt")
    term = (
        cs.join(F.broadcast(ts), "source")
        .join(F.broadcast(cc), "tok")
        .crossJoin(F.broadcast(tc))
        .select(
            "source", "t",
            F.round(p * F.log(p / q), 9).cast("decimal(18,9)").alias("kl9"),
        )
    )
    return term.groupBy("source").agg(
        F.max("t").cast("bigint").alias("n_tokens"),
        (F.round(F.sum("kl9").cast("double"), 9) + F.lit(0.0)).alias("kl"),
    )


# --------------------------------------------------------------------------
# t1_shingle_burstiness

_BURST_TOP = 30
_BURST_BUCKETS = 10


@register(
    "t1_shingle_burstiness",
    oracle=f"""
    WITH {_SH_SQL},
    n0 AS (SELECT max(doc_id) + 1 AS id_span FROM documents),
    sb AS (SELECT shingle,
                  CAST(floor(doc_id * {_BURST_BUCKETS}
                       / (SELECT id_span FROM n0)) AS BIGINT) AS bucket
           FROM sh),
    tot AS (SELECT shingle, CAST(count(*) AS BIGINT) AS tot
            FROM sb GROUP BY shingle),
    top AS (SELECT shingle, tot,
                   CAST(row_number() OVER (ORDER BY tot DESC, shingle ASC)
                        AS BIGINT) AS rank
            FROM tot
            QUALIFY rank <= {_BURST_TOP}),
    buckets AS (SELECT unnest(range(0, {_BURST_BUCKETS})) AS bucket),
    grid AS (SELECT top.shingle, top.tot, top.rank, buckets.bucket
             FROM top CROSS JOIN buckets),
    c AS (SELECT sb.shingle, sb.bucket, CAST(count(*) AS BIGINT) AS n
          FROM sb JOIN top ON sb.shingle = top.shingle
          GROUP BY sb.shingle, sb.bucket),
    g AS (SELECT grid.shingle, grid.tot, grid.rank, grid.bucket,
                 CAST(coalesce(c.n, 0) AS BIGINT) AS n
          FROM grid LEFT JOIN c
            ON grid.shingle = c.shingle AND grid.bucket = c.bucket),
    m AS (SELECT shingle, tot, rank,
                 CAST(count(*) AS BIGINT) AS nb,
                 CAST(sum(n) AS BIGINT) AS sn,
                 CAST(sum(n * n) AS BIGINT) AS sn2
          FROM g GROUP BY shingle, tot, rank)
    SELECT rank, shingle, tot,
           round((CAST(sn2 AS DOUBLE) / nb
                  - (CAST(sn AS DOUBLE) / nb) * (CAST(sn AS DOUBLE) / nb))
                 / (CAST(sn AS DOUBLE) / nb), 6) + 0 AS fano
    FROM m
    """,
)
def t1_shingle_burstiness(spark, sf_dir):
    """Burstiness (Fano factor of per-decile counts over corpus-prefix
    buckets, absent deciles counted as zero) for the 30 highest-df
    shingles — separates UNIFORM boilerplate (navigation chrome,
    fano ≈ its Poisson floor) from BURSTY boilerplate (one ingestion
    batch's template, fano ≫ 1): the first dedups safely with a global
    df cap, the second needs the batch quarantined.  The t1_burstiness
    construction moved from time buckets to corpus order.

    Exactness: bucket assignment is pure integer arithmetic against a
    broadcast id span; both moment sums are exact BIGINT over the
    dense 10-bucket grid; fano is one fixed chain, rounded and
    +0-normalized.  Scale: the per-shingle work is one (shingle,
    bucket) aggregate pre-filtered by the broadcast top-30 frame; the
    grid and moments run on 300 rows."""
    docs = load_table(spark, sf_dir, "documents")
    span = docs.agg((F.max("doc_id") + 1).alias("id_span"))
    sh = shingle_df(docs, "doc_id", "text", 3)
    sb = sh.crossJoin(F.broadcast(span)).select(
        "shingle",
        F.floor(F.col("doc_id") * _BURST_BUCKETS / F.col("id_span"))
        .cast("bigint").alias("bucket"),
    )
    # ONE (shingle, bucket) aggregate feeds both the per-shingle totals
    # and the per-bucket counts — the previous form evaluated the full
    # shingle explode twice (once per consumer); the totals now roll up
    # from the ≤10-bucket-per-shingle frame and the bucket counts reuse
    # the same exchange (guide §2.4).
    sbc = sb.groupBy("shingle", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = sbc.groupBy("shingle").agg(
        F.sum("n").cast("bigint").alias("tot")
    )
    w = Window.orderBy(F.col("tot").desc(), F.col("shingle").asc())
    top = tot.withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    ).filter(F.col("rank") <= _BURST_TOP)
    buckets = spark.range(_BURST_BUCKETS).select(
        F.col("id").cast("bigint").alias("bucket")
    )
    grid = top.crossJoin(F.broadcast(buckets))
    c = sbc.join(F.broadcast(top.select("shingle")), "shingle").select(
        "shingle", "bucket", "n"
    )
    g = grid.join(c, ["shingle", "bucket"], "left").select(
        "shingle", "tot", "rank", "bucket",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
    )
    m = g.groupBy("shingle", "tot", "rank").agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.sum("n").cast("bigint").alias("sn"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("sn2"),
    )
    mean = F.col("sn").cast("double") / F.col("nb")
    return m.select(
        "rank", "shingle", "tot",
        (
            F.round(
                (F.col("sn2").cast("double") / F.col("nb") - mean * mean)
                / mean,
                6,
            )
            + F.lit(0.0)
        ).alias("fano"),
    )
