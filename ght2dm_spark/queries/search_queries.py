"""Text-retrieval surface over the corpus: inverted-index build, BM25
ranking, and graph node-similarity — the search-engine companion to the
dedup/curation operators (a training-data pipeline needs retrieval for
decontamination lookups, quality audits, and "what's in the corpus"
queries as much as for serving).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.operators.topk import top_k
from ght2dm_spark.queries.registry import register

# --------------------------------------------------------------------------
# t1_inverted_index


@register(
    "t1_inverted_index",
    oracle="""
    WITH toks AS (
      SELECT doc_id, t.tok AS term
      FROM documents,
           unnest(string_split_regex(lower(text), '\\s+')) AS t(tok)
      WHERE t.tok <> ''),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY 1, 2)
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           (list_sort(list(doc_id)))[1:10] AS postings_head
    FROM tf GROUP BY term
    """,
)
def t1_inverted_index(spark, sf_dir):
    """Inverted-index build: token stream → (term, doc) term frequencies
    → per-term posting summary (document frequency, collection
    frequency, head of the sorted posting list).  The index-construction
    step behind BM25 (t1_bm25_topk scores straight off the tf frame).

    Scale: the classic two-aggregation index build — one shuffle to
    (doc, term) for tf, one shuffle to term for the posting merge; both
    map-side combine.  Posting lists are capped to a 10-doc head here
    because a full posting list is a column value of unbounded size —
    at 100 TB postings stay EXPLODED as (term, doc_id, tf) rows (the tf
    frame itself IS the index), and any per-term array materialization
    needs this kind of cap."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
        F.slice(F.array_sort(F.collect_list("doc_id")), 1, 10).alias(
            "postings_head"
        ),
    )


# --------------------------------------------------------------------------
# t1_bm25_topk

_BM25_TERMS = ("spark", "hash", "filter")
_BM25_K1, _BM25_B = 1.2, 0.75
_BM25_K = 10


def _bm25_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    k1, b = _BM25_K1, _BM25_B
    return f"""
    WITH toks AS (
      SELECT doc_id, t.tok AS term
      FROM documents,
           unnest(string_split_regex(lower(text), '\\s+')) AS t(tok)
      WHERE t.tok <> ''),
    dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
           FROM toks GROUP BY 1),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                     CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
              FROM dl),
    tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
           FROM toks WHERE term IN ({terms}) GROUP BY 1, 2),
    dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
              FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id,
             sum(ln(1.0 + (s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl)))
               AS score
      FROM tf JOIN dfreq USING (term)
              JOIN dl USING (doc_id)
              CROSS JOIN stats s
      GROUP BY tf.doc_id)
    SELECT doc_id, round(score, 6) AS bm25
    FROM scored
    ORDER BY round(score, 6) DESC, doc_id ASC
    LIMIT {_BM25_K}
    """


@register("t1_bm25_topk", oracle=_bm25_sql())
def t1_bm25_topk(spark, sf_dir):
    """BM25 ranking (Robertson-Sparck Jones, the Lucene default) for a
    fixed 3-term query: idf = ln(1 + (N - df + ½)/(df + ½)), tf
    saturation with k1=1.2, length normalization with b=0.75 against
    the corpus mean document length.  The float sum is ≤3 terms per
    doc, rounded to 6 places and ORDERED BY THE ROUNDED VALUE with a
    doc_id tiebreak, so the top-k cut is identical across engines (the
    tfidf discipline).

    Scale: tf touches only query-term postings (filter pushes into the
    token stream), dl/avgdl is one map-side-combined aggregate + 1-row
    broadcast, and the top-k is TakeOrderedAndProject (per-partition
    k-heap, no global sort)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("term"),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("double").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    idf = F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    contrib = (
        idf
        * F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(contrib).alias("score"))
        .select("doc_id", F.round("score", 6).alias("bm25"))
    )
    return top_k(scored, [F.col("bm25").desc(), F.col("doc_id").asc()], _BM25_K)


# --------------------------------------------------------------------------
# t1_graph_jaccard

_JAC_K = 20
_JAC_SCALE = 1_000_000


@register(
    "t1_graph_jaccard",
    oracle=f"""
    WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
                FROM lineitem),
    deg AS (SELECT s, CAST(count(*) AS BIGINT) AS deg FROM sp GROUP BY 1),
    com AS (SELECT a.s AS x, b.s AS y, CAST(count(*) AS BIGINT) AS common
            FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
            GROUP BY 1, 2),
    j AS (SELECT com.x, com.y, com.common,
                 da.deg + db.deg - com.common AS union_deg,
                 (com.common * {_JAC_SCALE})
                   // (da.deg + db.deg - com.common) AS jac_fp
          FROM com JOIN deg da ON da.s = com.x
                   JOIN deg db ON db.s = com.y)
    SELECT x, y, common, union_deg, jac_fp
    FROM j ORDER BY jac_fp DESC, x ASC, y ASC LIMIT {_JAC_K}
    """,
)
def t1_graph_jaccard(spark, sf_dir):
    """Node-neighborhood Jaccard similarity over the supplier co-part
    graph (neighbors(s) = the parts s supplies): |N(x) ∩ N(y)| /
    |N(x) ∪ N(y)| in 1e6 integer fixed point, top-20 most-similar
    supplier pairs.  The link-prediction / entity-matching primitive —
    the same shape scores near-duplicate candidates from any bipartite
    co-occurrence (doc-shingle, user-item).

    Scale: intersections come from the part-keyed self-join (fan-out
    capped by per-part supplier count — hot-key caveat as
    t1_triangle_count), degrees are one aggregate, the division is
    exact integer fixed point, and the top-k is TakeOrderedAndProject.
    Never materializes neighbor sets as arrays."""
    sp = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    deg = sp.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    a, b = sp.alias("a"), sp.alias("b")
    com = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("x"), F.col("b.s").alias("y"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    da = deg.select(F.col("s").alias("x"), F.col("deg").alias("deg_x"))
    db = deg.select(F.col("s").alias("y"), F.col("deg").alias("deg_y"))
    j = (
        com.join(F.broadcast(da), "x")
        .join(F.broadcast(db), "y")
        .select(
            "x",
            "y",
            "common",
            (F.col("deg_x") + F.col("deg_y") - F.col("common")).alias(
                "union_deg"
            ),
            F.expr(f"common * {_JAC_SCALE} div (deg_x + deg_y - common)").alias(
                "jac_fp"
            ),
        )
    )
    return top_k(
        j, [F.col("jac_fp").desc(), F.col("x").asc(), F.col("y").asc()], _JAC_K
    )
