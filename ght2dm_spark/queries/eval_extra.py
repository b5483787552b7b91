"""Second wave of eval-metric declared queries (round 8): MRR and
recall@k over the exact-cosine retrieval run, Brier score over the
length-prior classifier, a precision/recall curve, decile lift, PSI
drift, and per-group F1 — completing the train-eval metric surface a
training-data pipeline runs around its retrieval/curation stages
(NDCG/RBO/AUC/calibration landed round 7 in ``eval_queries.py``).

Cross-engine exactness (the repo-wide discipline): integer counting
everywhere it is possible; every emitted double is a SINGLE division
(or a fixed chain of IEEE ops) over exact integer operands; where a
per-row irrational term is unavoidable (Brier squares, PSI logs) the
term is rounded to 9 places and summed as DECIMAL(18,9) fixed-point —
order-independent — exactly the t1_char_entropy pattern whose green
driver rows pin engine log/sqrt parity on identical double inputs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.operators.similarity import cosine_sql, topk_neighbors
from ght2dm_spark.queries.registry import register

_K = 10
_QS = 10  # vec_id < 10 are the evaluated queries (the NDCG batch)

_RANKED_SQL = f"""
    q AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label
          FROM embeddings WHERE vec_id < {_QS}),
    c AS (SELECT vec_id AS c_id, embedding AS c_vec, label AS c_label
          FROM embeddings),
    s AS (SELECT q_id, c_id, q_label, c_label,
                 {cosine_sql("q_vec", "c_vec")} AS cos
          FROM c CROSS JOIN q WHERE q_id <> c_id),
    r AS (SELECT q_id, c_id,
                 CASE WHEN q_label = c_label THEN 1 ELSE 0 END AS rel,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos DESC, c_id ASC) AS rank
          FROM s)
"""


def _ranked_rel(spark, sf_dir):
    """(q_id, c_id, rank, rel) for the shared 10-query cosine run —
    the same construction t1_ndcg_eval scores (broadcast query batch
    over one corpus scan; rank-bounded output)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _QS).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    c = e.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    labels = e.select("vec_id", "label")
    return (
        topk_neighbors(q, c, k=_K)
        .join(
            F.broadcast(labels.select(
                F.col("vec_id").alias("q_id"),
                F.col("label").alias("q_label"))),
            "q_id",
        )
        .join(
            F.broadcast(labels.select(
                F.col("vec_id").alias("c_id"),
                F.col("label").alias("c_label"))),
            "c_id",
        )
        .withColumn(
            "rel", F.expr("CASE WHEN q_label = c_label THEN 1 ELSE 0 END")
        )
    )


# --------------------------------------------------------------------------
# t1_mrr_eval


@register(
    "t1_mrr_eval",
    oracle=f"""
    WITH {_RANKED_SQL}
    SELECT q_id,
           CAST(coalesce(min(CASE WHEN rel = 1 THEN rank END), 0) AS BIGINT)
             AS first_rel_rank,
           round(coalesce(CAST(1 AS DOUBLE)
                          / min(CASE WHEN rel = 1 THEN rank END), 0.0), 6)
             AS rr
    FROM r WHERE rank <= {_K}
    GROUP BY q_id
    """,
)
def t1_mrr_eval(spark, sf_dir):
    """Reciprocal rank per query (MRR's per-query term) over the shared
    cosine run: the rank of the FIRST relevant neighbor in the top-10,
    0/0.0 when none — the navigational-retrieval metric next to
    t1_ndcg_eval's graded one.  rr is one division of exact integers.

    Scale: same broadcast-scoring shape as NDCG; the metric aggregates
    10 ranked rows per query."""
    ranked = _ranked_rel(spark, sf_dir)
    return ranked.groupBy("q_id").agg(
        F.coalesce(
            F.min(F.when(F.col("rel") == 1, F.col("rank"))), F.lit(0)
        ).cast("bigint").alias("first_rel_rank"),
        F.round(
            F.coalesce(
                F.lit(1.0) / F.min(F.when(F.col("rel") == 1, F.col("rank"))),
                F.lit(0.0),
            ),
            6,
        ).alias("rr"),
    )


# --------------------------------------------------------------------------
# t1_recall_at_k


@register(
    "t1_recall_at_k",
    oracle=f"""
    WITH {_RANKED_SQL},
    top AS (SELECT q_id, CAST(sum(rel) AS BIGINT) AS n_rel_topk
            FROM r WHERE rank <= {_K} GROUP BY q_id),
    tot AS (SELECT q_id, CAST(sum(rel) AS BIGINT) AS n_rel
            FROM r GROUP BY q_id)
    SELECT t.q_id, t.n_rel_topk, tot.n_rel,
           round(CAST(t.n_rel_topk AS DOUBLE) / tot.n_rel, 6) AS recall_at_k
    FROM top t JOIN tot ON t.q_id = tot.q_id
    """,
)
def t1_recall_at_k(spark, sf_dir):
    """Recall@10 per query: relevant neighbors retrieved in the top-10
    over the query's total relevant count — the coverage half of the
    precision/NDCG story, and the metric ANN recall audits
    (t1_ann_recall) bound from below.  One integer division per query.

    Scale: the total-relevant count is a label-only aggregate (no
    vectors); the top-k side is rank-bounded."""
    e = load_table(spark, sf_dir, "embeddings")
    labels = e.select("vec_id", "label")
    top = _ranked_rel(spark, sf_dir).groupBy("q_id").agg(
        F.sum("rel").cast("bigint").alias("n_rel_topk")
    )
    lq = labels.filter(F.col("vec_id") < _QS).select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("q_label")
    )
    lc = labels.select(
        F.col("vec_id").alias("c_id"), F.col("label").alias("c_label")
    )
    tot = (
        lc.crossJoin(F.broadcast(lq))
        .filter(F.col("q_id") != F.col("c_id"))
        .groupBy("q_id")
        .agg(
            F.sum(
                F.expr("CASE WHEN q_label = c_label THEN 1 ELSE 0 END")
            ).cast("bigint").alias("n_rel")
        )
    )
    return top.join(tot, "q_id").select(
        "q_id", "n_rel_topk", "n_rel",
        F.round(
            F.col("n_rel_topk").cast("double") / F.col("n_rel"), 6
        ).alias("recall_at_k"),
    )


# --------------------------------------------------------------------------
# t1_brier_score

_CAP = 2000  # the calibration length-prior cap (t1_calibration_bins)


@register(
    "t1_brier_score",
    oracle=f"""
    WITH m AS (
        SELECT lang,
               CAST(least(n_chars, {_CAP}) AS DOUBLE) / {_CAP} AS p,
               CASE WHEN length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                         * 10 >= length(text) * 7
                    THEN 1 ELSE 0 END AS y
        FROM documents WHERE length(text) > 0
    ),
    t AS (SELECT lang,
                 CAST(round((p - y) * (p - y), 9) AS DECIMAL(18,9)) AS sq
          FROM m)
    SELECT lang, count(*) AS n,
           round(CAST(sum(sq) AS DOUBLE) / count(*), 6) AS brier
    FROM t GROUP BY lang
    """,
)
def t1_brier_score(spark, sf_dir):
    """Brier score per language of the capped-length prior against the
    alpha-ratio label — the mean-squared-error half of the calibration
    story (t1_calibration_bins draws the reliability diagram; this is
    the single-number summary a model-selection loop thresholds on).

    Exactness: p is one division of exact integers, (p−y)² is a fixed
    IEEE chain on identical operands, each term rounds to DECIMAL(18,9)
    before the order-independent fixed-point sum.  Scale: one narrow
    map + one |langs|-row groupBy."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    p = F.least(F.col("n_chars"), F.lit(_CAP)).cast("double") / _CAP
    y = F.expr(
        f"CASE WHEN length(regexp_replace(text, '[^a-zA-Z]', '')) * 10 "
        f">= length(text) * 7 THEN 1 ELSE 0 END"
    )
    t = d.select(
        "lang",
        F.round((p - y) * (p - y), 9).cast("decimal(18,9)").alias("sq"),
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum("sq").cast("double") / F.count(F.lit(1)), 6
        ).alias("brier"),
    )


# --------------------------------------------------------------------------
# t1_pr_curve

_PR_THRESHOLDS = list(range(100, 1001, 100))


@register(
    "t1_pr_curve",
    oracle=f"""
    WITH m AS (SELECT n_chars AS score,
                      CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
               FROM documents),
    t AS (SELECT unnest([{", ".join(str(t) for t in _PR_THRESHOLDS)}])
            AS threshold),
    agg AS (SELECT t.threshold,
                   CAST(sum(CASE WHEN m.score >= t.threshold AND m.y = 1
                            THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                   CAST(sum(CASE WHEN m.score >= t.threshold AND m.y = 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                   CAST(sum(m.y) AS BIGINT) AS pos
            FROM m CROSS JOIN t GROUP BY t.threshold)
    SELECT CAST(threshold AS BIGINT) AS threshold, tp, fp,
           round(CASE WHEN tp + fp > 0
                      THEN CAST(tp AS DOUBLE) / (tp + fp) END, 6)
             AS precision_,
           round(CAST(tp AS DOUBLE) / pos, 6) AS recall_
    FROM agg
    """,
)
def t1_pr_curve(spark, sf_dir):
    """Precision/recall curve of the length-threshold classifier for
    lang='en' at 10 fixed operating points — the threshold-sweep eval
    behind choosing a quality-filter cutoff.  Computed as ONE scan with
    a broadcast 10-row threshold frame (never ten scans); counts are
    integers, each emitted ratio one division.

    Scale: |thresholds|× row multiplication happens on a 2-column
    projection; production sweeps bucket scores first (the AUC
    histogram trick) — at 10 literal thresholds the broadcast join is
    already cheaper."""
    d = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.expr("CASE WHEN lang = 'en' THEN 1 ELSE 0 END").alias("y"),
    )
    t = spark.createDataFrame(
        [(t,) for t in _PR_THRESHOLDS], "threshold bigint"
    )
    agg = (
        d.crossJoin(F.broadcast(t))
        .groupBy("threshold")
        .agg(
            F.sum(
                F.when((F.col("score") >= F.col("threshold"))
                       & (F.col("y") == 1), 1).otherwise(0)
            ).cast("bigint").alias("tp"),
            F.sum(
                F.when((F.col("score") >= F.col("threshold"))
                       & (F.col("y") == 0), 1).otherwise(0)
            ).cast("bigint").alias("fp"),
            F.sum("y").cast("bigint").alias("pos"),
        )
    )
    return agg.select(
        "threshold", "tp", "fp",
        F.round(
            F.when(
                F.col("tp") + F.col("fp") > 0,
                F.col("tp").cast("double") / (F.col("tp") + F.col("fp")),
            ),
            6,
        ).alias("precision_"),
        F.round(F.col("tp").cast("double") / F.col("pos"), 6)
        .alias("recall_"),
    )


# --------------------------------------------------------------------------
# t1_lift_deciles


@register(
    "t1_lift_deciles",
    oracle="""
    WITH m AS (SELECT doc_id, n_chars AS score,
                      CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
               FROM documents),
    r AS (SELECT y, ntile(10) OVER (ORDER BY score DESC, doc_id ASC)
            AS decile FROM m),
    d AS (SELECT decile, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS n_pos
          FROM r GROUP BY decile),
    c AS (SELECT decile, n, n_pos,
                 CAST(sum(n) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
                 CAST(sum(n_pos) OVER (ORDER BY decile) AS BIGINT)
                   AS cum_pos,
                 CAST(sum(n) OVER () AS BIGINT) AS tot_n,
                 CAST(sum(n_pos) OVER () AS BIGINT) AS tot_pos
          FROM d)
    SELECT CAST(decile AS BIGINT) AS decile, n, n_pos,
           round(CAST(n_pos AS DOUBLE) / n, 6) AS pos_rate,
           round(CAST(cum_pos * tot_n AS DOUBLE) / (cum_n * tot_pos), 6)
             AS cum_lift
    FROM c
    """,
)
def t1_lift_deciles(spark, sf_dir):
    """Gain/lift table: documents ranked by the length score, split into
    deciles, cumulative lift = (cum positive rate) / (base rate) — the
    model-eval chart marketing/risk pipelines read before a threshold
    is picked.  Lift is ONE division of exact integer PRODUCTS
    (cum_pos·tot_n / cum_n·tot_pos), so no ratio-of-ratios float chain.

    Scale: one global NTILE over (score, id) — rank windows over a
    2-column projection — then 10-row window math.  The global window
    is decile-bounded output; at 100 TB the production form buckets
    scores first (AUC-histogram trick) — plan-lint allowlisted like the
    other top-k global windows."""
    m = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").alias("score"),
        F.expr("CASE WHEN lang = 'en' THEN 1 ELSE 0 END").alias("y"),
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    r = m.select("y", F.ntile(10).over(w).alias("decile"))
    d = r.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = d.select(
        "decile", "n", "n_pos",
        F.sum("n").over(wc).cast("bigint").alias("cum_n"),
        F.sum("n_pos").over(wc).cast("bigint").alias("cum_pos"),
        F.sum("n").over(wt).cast("bigint").alias("tot_n"),
        F.sum("n_pos").over(wt).cast("bigint").alias("tot_pos"),
    )
    return c.select(
        F.col("decile").cast("bigint").alias("decile"), "n", "n_pos",
        F.round(F.col("n_pos").cast("double") / F.col("n"), 6)
        .alias("pos_rate"),
        F.round(
            (F.col("cum_pos") * F.col("tot_n")).cast("double")
            / (F.col("cum_n") * F.col("tot_pos")),
            6,
        ).alias("cum_lift"),
    )


# --------------------------------------------------------------------------
# t1_psi_drift

_PSI_BINS = 10


@register(
    "t1_psi_drift",
    oracle=f"""
    WITH s AS (SELECT CAST(floor(least(value, 99.999) / 10) AS BIGINT)
                 AS bin,
                      CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END AS grp
               FROM events WHERE value IS NOT NULL AND value >= 0),
    b AS (SELECT bin,
                 CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS na,
                 CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS nb
          FROM s GROUP BY bin),
    t AS (SELECT bin, na, nb,
                 CAST(sum(na) OVER () AS BIGINT) AS ta,
                 CAST(sum(nb) OVER () AS BIGINT) AS tb
          FROM b),
    e AS (SELECT bin, na, nb, ta, tb,
                 CAST(na AS DOUBLE) / ta AS pa,
                 CAST(nb AS DOUBLE) / tb AS pb
          FROM t WHERE na > 0 AND nb > 0)
    SELECT bin, na, nb, ta, tb,
           round((pa - pb) * ln(pa / pb), 6) AS psi_term
    FROM e
    """,
)
def t1_psi_drift(spark, sf_dir):
    """Population-stability-index terms per value bucket between the
    even/odd event splits — the drift score credit-risk and feature
    pipelines threshold at 0.1/0.25 (PSI = Σ terms; emitting the terms
    keeps every output cell a per-bin quantity and makes which bin
    moved visible, the actionable half).

    Exactness: pa/pb are single divisions of exact integers; the
    (pa−pb)·ln(pa/pb) term is a fixed IEEE chain on identical operands
    rounded to SIX places (r8 hashed red at 9 dp without a local
    repro — the 6-dp surface has 1000× the boundary margin, and the
    exact BIGINT cells na/nb/ta/tb that DETERMINE each term are now on
    the hashed surface so a recurrence isolates which side moved);
    empty-on-either-side bins are excluded, standard PSI practice.
    r9 hashed red AGAIN with every integer cell on the surface and
    ≥7.6e-9 absolute margin to any 6-dp boundary (ULP noise is 1e-16
    relative — no engine's ln can flip a digit), so the residual
    suspect is the DECIMAL(18,6) cell itself: psi_term was the ONLY
    decimal-typed output cell across all 366 declared queries (schema
    scan, r10), while ~50 queries emitting round(x, 6) as DOUBLE hash
    green every round.  r10 therefore emits psi_term as a rounded
    DOUBLE on both engines — the proven-green representation.  A -0.0
    cannot arise: (pa−pb) and ln(pa/pb) always share a sign, so the
    product is ≥ +0.0 on both engines.
    Scale: one map-side-combinable groupBy to 10 bins."""
    s = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & (F.col("value") >= 0))
        .select(
            F.floor(F.least(F.col("value"), F.lit(99.999)) / 10)
            .cast("bigint").alias("bin"),
            (F.col("event_id") % 2).cast("int").alias("grp"),
        )
    )
    b = s.groupBy("bin").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("bigint").alias("na"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("bigint").alias("nb"),
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = b.select(
        "bin", "na", "nb",
        F.sum("na").over(wt).cast("bigint").alias("ta"),
        F.sum("nb").over(wt).cast("bigint").alias("tb"),
    )
    e = t.filter((F.col("na") > 0) & (F.col("nb") > 0)).select(
        "bin", "na", "nb", "ta", "tb",
        (F.col("na").cast("double") / F.col("ta")).alias("pa"),
        (F.col("nb").cast("double") / F.col("tb")).alias("pb"),
    )
    return e.select(
        "bin", "na", "nb", "ta", "tb",
        F.round(
            (F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb")), 6
        ).alias("psi_term"),
    )


# --------------------------------------------------------------------------
# t1_f1_per_group


@register(
    "t1_f1_per_group",
    oracle="""
    WITH m AS (SELECT source,
                      CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS pred,
                      CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
               FROM documents),
    c AS (SELECT source,
                 CAST(sum(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS tp,
                 CAST(sum(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS fp,
                 CAST(sum(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS fn
          FROM m GROUP BY source)
    SELECT source, tp, fp, fn,
           round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6) AS f1
    FROM c
    """,
)
def t1_f1_per_group(spark, sf_dir):
    """Per-source F1 of the fixed length-threshold classifier against
    the language label — the sliced-eval view (which SOURCE the
    classifier fails on) that aggregate AUC hides.  F1 computed in its
    single-division form 2tp/(2tp+fp+fn), never precision·recall
    chains.  Scale: one map-side-combinable groupBy to |sources|."""
    m = load_table(spark, sf_dir, "documents").select(
        "source",
        F.expr("CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END").alias("pred"),
        F.expr("CASE WHEN lang = 'en' THEN 1 ELSE 0 END").alias("y"),
    )
    c = m.groupBy("source").agg(
        F.sum(F.when((F.col("pred") == 1) & (F.col("y") == 1), 1).otherwise(0))
        .cast("bigint").alias("tp"),
        F.sum(F.when((F.col("pred") == 1) & (F.col("y") == 0), 1).otherwise(0))
        .cast("bigint").alias("fp"),
        F.sum(F.when((F.col("pred") == 0) & (F.col("y") == 1), 1).otherwise(0))
        .cast("bigint").alias("fn"),
    )
    return c.select(
        "source", "tp", "fp", "fn",
        F.round(
            (2 * F.col("tp")).cast("double")
            / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
            6,
        ).alias("f1"),
    )
