"""Retrieval-evaluation and ML-feature declared queries: the metric ops
a training-data pipeline runs AROUND its search/dedup/curation stages —
NDCG over a retrieval run, rank-biased overlap between two orderings,
a two-sample Kolmogorov-Smirnov drift statistic, deterministic
stratified k-fold assignment, equal-frequency quantile bucketing, and
reliability-diagram calibration bins.

Cross-engine exactness discipline (the t1_char_entropy pattern): every
irrational constant (log2 discounts, geometric RBO weights) is computed
ONCE in Python and spliced into BOTH plans as the same decimal literal
— no libm parity is ever assumed; per-term doubles are rounded to
DECIMAL(18,9) so the aggregation is an exact fixed-point sum
(order-independent); each emitted float is one final op (a division or
round) over deterministic operands.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.operators.similarity import topk_neighbors, cosine_sql
from ght2dm_spark.queries.registry import register

NDCG_K = 10
_NDCG_QS = 10  # vec_id < 10 are the evaluated queries

#: 1/log2(rank+1) for rank 1..K, rounded to 9 places — spliced into both
#: engines as identical decimal literals (never log2() at query time).
_DISC = [round(1.0 / math.log2(r + 1), 9) for r in range(1, NDCG_K + 1)]

#: ideal-DCG prefix sums: _IDCG[m] = sum of the first m discounts,
#: computed over the ROUNDED terms so it equals what a fixed-point sum
#: of the spliced literals would produce.
_IDCG = [0.0]
for _d in _DISC:
    _IDCG.append(round(_IDCG[-1] + _d, 9))


def _disc_case(rank_col: str) -> str:
    """CASE mapping rank → discount literal (same text both engines)."""
    whens = " ".join(
        f"WHEN {r + 1} THEN {_DISC[r]:.9f}" for r in range(NDCG_K)
    )
    return f"(CASE {rank_col} {whens} END)"


def _idcg_case(m_col: str) -> str:
    """CASE mapping m = min(#relevant, K) → ideal-DCG literal."""
    whens = " ".join(
        f"WHEN {m} THEN {_IDCG[m]:.9f}" for m in range(1, NDCG_K + 1)
    )
    return f"(CASE {m_col} {whens} END)"


@register(
    "t1_ndcg_eval",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label
               FROM embeddings WHERE vec_id < {_NDCG_QS}),
    c AS (SELECT vec_id AS c_id, embedding AS c_vec, label AS c_label
          FROM embeddings),
    s AS (SELECT q_id, c_id, q_label, c_label,
                 {cosine_sql("q_vec", "c_vec")} AS cos
          FROM c CROSS JOIN q WHERE q_id <> c_id),
    r AS (SELECT q_id, c_id,
                 CASE WHEN q_label = c_label THEN 1 ELSE 0 END AS rel,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos DESC, c_id ASC) AS rank
          FROM s),
    rel_tot AS (SELECT q_id,
                       CAST(sum(CASE WHEN q_label = c_label THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_rel
                FROM s GROUP BY q_id),
    top AS (SELECT q_id,
                   CAST(sum(rel) AS BIGINT) AS n_rel_topk,
                   sum(CAST(rel AS DECIMAL(18,9)) * {_disc_case("rank")}) AS dcg
            FROM r WHERE rank <= {NDCG_K} GROUP BY q_id)
    SELECT t.q_id, t.n_rel_topk,
           round(CAST(t.dcg AS DOUBLE)
                 / CAST({_idcg_case(f"least(rt.n_rel, {NDCG_K})")} AS DOUBLE),
                 6) AS ndcg
    FROM top t JOIN rel_tot rt ON t.q_id = rt.q_id
    """,
)
def t1_ndcg_eval(spark, sf_dir):
    """NDCG@10 of the exact-cosine retrieval run, relevance = shared
    class label — the eval metric that closes the similarity-search
    loop (brute force / LSH / IVF / PQ queries produce runs; this
    grades one).  DCG sums rank-discounted gains; IDCG is the
    best-possible prefix for the query's total relevant count; both
    discounts and ideal prefixes are Python-computed literals spliced
    into both engines, so no log2() parity is assumed anywhere.

    Scale: the scoring join broadcasts the 10-query batch over one
    corpus scan (the t1_ann_bruteforce_topk shape); the metric itself
    touches 10×10 ranked rows — eval cost is rank-bounded, not
    corpus-bounded."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _NDCG_QS).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    c = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    labels = e.select("vec_id", "label")
    ranked = (
        topk_neighbors(q, c, k=NDCG_K)
        .join(
            F.broadcast(labels.select(
                F.col("vec_id").alias("q_id"), F.col("label").alias("q_label"))),
            "q_id",
        )
        .join(
            F.broadcast(labels.select(
                F.col("vec_id").alias("c_id"), F.col("label").alias("c_label"))),
            "c_id",
        )
        .withColumn(
            "rel",
            F.expr("CASE WHEN q_label = c_label THEN 1 ELSE 0 END"),
        )
    )
    top = ranked.groupBy("q_id").agg(
        F.sum("rel").cast("bigint").alias("n_rel_topk"),
        F.sum(
            F.expr(f"CAST(rel AS DECIMAL(18,9)) * {_disc_case('rank')}")
        ).alias("dcg"),
    )
    # total relevant per query (corpus-wide, self excluded): a count on
    # the label dimension — no vectors involved
    lq = labels.select(F.col("vec_id").alias("q_id"), F.col("label").alias("q_label"))
    lc = labels.select(F.col("vec_id").alias("c_id"), F.col("label").alias("c_label"))
    rel_tot = (
        lc.crossJoin(F.broadcast(lq.filter(F.col("q_id") < _NDCG_QS)))
        .filter(F.col("q_id") != F.col("c_id"))
        .groupBy("q_id")
        .agg(
            F.sum(
                F.expr("CASE WHEN q_label = c_label THEN 1 ELSE 0 END")
            ).cast("bigint").alias("n_rel")
        )
    )
    return top.join(rel_tot, "q_id").select(
        "q_id",
        "n_rel_topk",
        F.round(
            F.expr(
                f"CAST(dcg AS DOUBLE) / CAST("
                f"{_idcg_case(f'least(n_rel, {NDCG_K})')} AS DOUBLE)"
            ),
            6,
        ).alias("ndcg"),
    )


RBO_P = 0.9
RBO_K = 10

#: truncated-RBO weight at depth d: (1-p)·p^(d-1)/d, Python-computed and
#: spliced as identical decimal literals (never pow() at query time).
_RBO_W = [
    round((1.0 - RBO_P) * RBO_P ** (d - 1) / d, 9) for d in range(1, RBO_K + 1)
]


def _rbo_sum(a: str, b: str, inter_fn, slice_fn) -> str:
    """Fixed-depth RBO sum as one spliced expression: per-depth overlap
    |A[:d] ∩ B[:d]| (integer) times the depth weight (decimal literal),
    accumulated as exact DECIMAL(18,9)."""
    terms = []
    for d in range(1, RBO_K + 1):
        ov = inter_fn(slice_fn(a, d), slice_fn(b, d))
        terms.append(f"CAST({ov} AS DECIMAL(18,9)) * {_RBO_W[d - 1]:.9f}")
    return " + ".join(terms)


def _spark_rbo(a: str, b: str) -> str:
    return _rbo_sum(
        a, b,
        lambda x, y: f"size(array_intersect({x}, {y}))",
        lambda arr, d: f"slice({arr}, 1, {d})",
    )


def _duck_rbo(a: str, b: str) -> str:
    return _rbo_sum(
        a, b,
        lambda x, y: f"len(list_intersect({x}, {y}))",
        lambda arr, d: f"{arr}[1:{d}]",
    )


@register(
    "t1_rbo_rankings",
    oracle=f"""
    WITH m AS (SELECT source, doc_id, n_chars,
                      length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                        AS alpha
               FROM documents),
    r AS (SELECT source, doc_id,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n_chars DESC, doc_id ASC) AS r1,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY alpha DESC, doc_id ASC) AS r2
          FROM m),
    a AS (SELECT source, list(doc_id ORDER BY r1) AS ra FROM r
          WHERE r1 <= {RBO_K} GROUP BY source),
    b AS (SELECT source, list(doc_id ORDER BY r2) AS rb FROM r
          WHERE r2 <= {RBO_K} GROUP BY source)
    SELECT a.source,
           CAST(len(list_intersect(ra, rb)) AS BIGINT) AS overlap_k,
           round(CAST({_duck_rbo("ra", "rb")} AS DOUBLE), 6) AS rbo
    FROM a JOIN b ON a.source = b.source
    """,
)
def t1_rbo_rankings(spark, sf_dir):
    """Rank-biased overlap (Webber et al., truncated at depth 10,
    p=0.9) between two top-10 rankings of each source's documents —
    by raw length vs by alphabetic mass.  RBO is the rank-similarity
    measure for comparing a cheap ranker against an expensive one
    (e.g. ANN vs exact, heuristic quality vs model quality) that
    weights agreement at the TOP, unlike plain set overlap.

    Exactness: per-depth overlaps are integers from array
    intersections; the geometric weights are Python literals spliced
    into both plans; the sum is exact fixed-point.  Scale: two rank
    windows per source partition and a 10-element array per group —
    state is rank-bounded."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars",
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).alias("alpha"),
    )
    w1 = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    w2 = Window.partitionBy("source").orderBy(
        F.col("alpha").desc(), F.col("doc_id").asc()
    )
    r = d.select(
        "source", "doc_id",
        F.row_number().over(w1).alias("r1"),
        F.row_number().over(w2).alias("r2"),
    )
    a = (
        r.filter(F.col("r1") <= RBO_K)
        .groupBy("source")
        .agg(F.expr("transform(array_sort(collect_list(struct(r1, doc_id))),"
                    " x -> x.doc_id)").alias("ra"))
    )
    b = (
        r.filter(F.col("r2") <= RBO_K)
        .groupBy("source")
        .agg(F.expr("transform(array_sort(collect_list(struct(r2, doc_id))),"
                    " x -> x.doc_id)").alias("rb"))
    )
    return a.join(b, "source").select(
        "source",
        F.expr("CAST(size(array_intersect(ra, rb)) AS BIGINT)").alias("overlap_k"),
        F.round(
            F.expr(f"CAST({_spark_rbo('ra', 'rb')} AS DOUBLE)"), 6
        ).alias("rbo"),
    )


@register(
    "t1_ks_drift",
    oracle="""
    WITH s AS (SELECT event_type, value AS v,
                      CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END AS grp
               FROM events WHERE value IS NOT NULL),
    n AS (SELECT event_type,
                 sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n0,
                 sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n1
          FROM s GROUP BY event_type),
    c AS (SELECT event_type, v,
                 sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS c0,
                 sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS c1
          FROM s GROUP BY event_type, v),
    e AS (SELECT event_type, v,
                 sum(c0) OVER (PARTITION BY event_type ORDER BY v) AS cum0,
                 sum(c1) OVER (PARTITION BY event_type ORDER BY v) AS cum1
          FROM c)
    SELECT e.event_type,
           CAST(n.n0 AS BIGINT) AS n0, CAST(n.n1 AS BIGINT) AS n1,
           round(max(abs(CAST(e.cum0 AS DOUBLE) / n.n0
                         - CAST(e.cum1 AS DOUBLE) / n.n1)), 6) AS ks_stat
    FROM e JOIN n ON e.event_type = n.event_type
    GROUP BY e.event_type, n.n0, n.n1
    """,
)
def t1_ks_drift(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov statistic per event type — the
    distribution-drift gate a feature/data pipeline runs between a
    reference split and a candidate split (here: even vs odd event ids,
    a deterministic surrogate for yesterday-vs-today).  KS = max |ECDF
    difference| over the pooled support.

    Exactness: each ECDF value is ONE integer division; the difference,
    abs and MAX are order-independent — no float accumulation anywhere.
    Scale: one groupBy on (type, value) collapses the data to its
    distinct support before the cumulative window, so the window state
    is support-sized, not row-sized; the totals n0/n1 come from an
    UNBOUNDED window over the same type partitioning the cumulative
    window already shuffled to — one scan, no second aggregation
    branch, no join (A/B'd at the sf≈1 point: 0.57 s vs 0.71 s)."""
    s = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.col("value").alias("v"),
            (F.col("event_id") % 2).cast("int").alias("grp"),
        )
    )
    c = s.groupBy("event_type", "v").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("c1"),
    )
    w = Window.partitionBy("event_type").orderBy("v")
    wall = Window.partitionBy("event_type")
    e = c.select(
        "event_type", "v",
        F.sum("c0").over(w).alias("cum0"),
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c0").over(wall).alias("n0"),
        F.sum("c1").over(wall).alias("n1"),
    )
    return (
        e.groupBy("event_type", "n0", "n1")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("cum0").cast("double") / F.col("n0")
                        - F.col("cum1").cast("double") / F.col("n1")
                    )
                ),
                6,
            ).alias("ks_stat")
        )
        .select(
            "event_type",
            F.col("n0").cast("bigint").alias("n0"),
            F.col("n1").cast("bigint").alias("n1"),
            "ks_stat",
        )
    )


KFOLD = 5
_KNUTH = 2654435761  # Knuth multiplicative constant, spliced both sides


@register(
    "t1_stratified_kfold",
    oracle=f"""
    WITH f AS (SELECT lang, n_chars,
                      ((doc_id % 1000003) * {_KNUTH}) % 4294967296
                        % {KFOLD} AS fold
               FROM documents)
    SELECT lang, CAST(fold AS BIGINT) AS fold,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM f GROUP BY lang, fold
    """,
)
def t1_stratified_kfold(spark, sf_dir):
    """Deterministic stratified k-fold assignment: fold = multiplicative
    hash of the stable id, reduced mod k — every engine, every run,
    every scale assigns each document to the SAME fold with no shuffle
    of the assignment itself (extends t1_train_test_split from one
    holdout to k resampling folds).  Stratification falls out for free:
    a multiplicative hash is equidistributed within every stratum, and
    the per-(lang, fold) counts emitted here ARE the balance audit.

    Scale: fold assignment is a narrow map; the audit is one
    map-side-combinable groupBy on (lang, fold) — k×|langs| rows."""
    d = load_table(spark, sf_dir, "documents")
    # reduce the id into a small prime field BEFORE the Knuth multiply:
    # ids can be billions-large (the scale dir shifts them by 1e9 per
    # copy) and id × 2654435761 overflows BIGINT under ANSI mode —
    # caught by the 10× scale point, not the base tables
    fold = (
        (F.col("doc_id") % F.lit(1_000_003)) * F.lit(_KNUTH)
    ) % F.lit(4294967296) % F.lit(KFOLD)
    return (
        d.select("lang", "n_chars", fold.alias("fold"))
        .groupBy("lang", "fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .select(
            "lang", F.col("fold").cast("bigint").alias("fold"),
            "n_docs", "sum_chars",
        )
    )


NBUCKETS = 4


@register(
    "t1_quantile_bucketing",
    oracle=f"""
    WITH b AS (SELECT lang, n_chars,
                      ntile({NBUCKETS}) OVER (PARTITION BY lang
                          ORDER BY n_chars ASC, doc_id ASC) AS bucket
               FROM documents)
    SELECT lang, CAST(bucket AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(min(n_chars) AS BIGINT) AS lo,
           CAST(max(n_chars) AS BIGINT) AS hi
    FROM b GROUP BY lang, bucket
    """,
)
def t1_quantile_bucketing(spark, sf_dir):
    """Equal-frequency (quantile) feature bucketing per stratum: NTILE
    over a deterministic total order (value, then stable id) — the
    discretization step feature pipelines apply before crossing or
    hashing continuous features, and the exact-arithmetic counterpart
    of approxQuantile-based binning.  Emitted per (lang, bucket): count
    and the observed [lo, hi] bin boundaries.

    Exactness: NTILE's floor-distribution semantics are SQL-standard
    and identical in both engines once the order is total (doc_id
    tiebreak).  Scale: one rank window per stratum partition, then a
    map-side-combinable groupBy — no data beyond (lang, n_chars,
    doc_id) ever shuffles."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.col("n_chars").asc(), F.col("doc_id").asc()
    )
    return (
        d.select("lang", "n_chars", F.ntile(NBUCKETS).over(w).alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("n_chars").cast("bigint").alias("lo"),
            F.max("n_chars").cast("bigint").alias("hi"),
        )
        .select(
            "lang", F.col("bucket").cast("bigint").alias("bucket"),
            "n", "lo", "hi",
        )
    )


CAL_BINS = 10
_CAL_CAP = 2000  # chars at which the length prior saturates


@register(
    "t1_calibration_bins",
    oracle=f"""
    WITH m AS (
        SELECT least(n_chars, {_CAL_CAP}) AS capped,
               CAST(floor(least(n_chars, {_CAL_CAP}) * {CAL_BINS}
                    / ({_CAL_CAP} + 1)) AS BIGINT) AS bin,
               CASE WHEN length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                         * 10 >= length(text) * 7
                    THEN 1 ELSE 0 END AS label
        FROM documents WHERE length(text) > 0
    )
    SELECT bin, count(*) AS n,
           round(CAST(sum(capped) AS DOUBLE) / (count(*) * {_CAL_CAP}), 6)
             AS mean_score,
           round(CAST(sum(label) AS DOUBLE) / count(*), 6) AS frac_positive
    FROM m GROUP BY bin
    """,
)
def t1_calibration_bins(spark, sf_dir):
    """Reliability-diagram binning — the calibration audit run on any
    scoring stage before its scores gate data (a quality classifier
    whose 0.9 bucket is only 60% positive needs recalibrating, not a
    higher threshold).  Here the audited score is the capped-length
    prior (score = min(n_chars, cap)/cap) against an alphabetic-mass
    label; the mechanics — equal-width score bins, per-bin count, mean
    score and positive fraction — are score-agnostic.

    Exactness: the bin index and the label comparison are pure integer
    arithmetic (the alpha-ratio test is cross-multiplied, never a float
    threshold); each emitted fraction is ONE division of exact integer
    sums.  Scale: narrow map + one small groupBy — bins rows never
    exceed CAL_BINS."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    capped = F.least(F.col("n_chars"), F.lit(_CAL_CAP))
    alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    m = d.select(
        capped.alias("capped"),
        F.floor(capped * CAL_BINS / (_CAL_CAP + 1)).cast("bigint")
        .alias("bin"),
        F.when(alpha * 10 >= F.length("text") * 7, 1).otherwise(0)
        .alias("label"),
    )
    return m.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum("capped").cast("double") / (F.count(F.lit(1)) * _CAL_CAP), 6
        ).alias("mean_score"),
        F.round(F.sum("label").cast("double") / F.count(F.lit(1)), 6)
        .alias("frac_positive"),
    )
