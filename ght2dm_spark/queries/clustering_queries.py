"""Dedup clustering + TF-IDF: the step after near-dup pair generation
(group candidate pairs into components, pick one representative), and
the classic corpus-statistics operator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.operators.graph import connected_components
from ght2dm_spark.operators.neardup import (
    lsh_bands,
    lsh_candidate_pairs,
    minhash_signature,
)
from ght2dm_spark.queries.dedup_queries import (
    _AUG_SQL,
    _aug_docs,
    _minhash_sql_cte,
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_K,
)
from ght2dm_spark.queries.registry import register

_CAND_SQL = f"""
    {_minhash_sql_cte("aug")},
    bands AS ({" UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({key}) AS band_key FROM m".format(
            b=b,
            key=" || '|' || ".join(f"h{b * LSH_ROWS + r}" for r in range(LSH_ROWS)),
        )
        for b in range(LSH_BANDS)
    )}),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a
             JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
             WHERE a.doc_id < b.doc_id)
"""


@register(
    "t1_neardup_components",
    oracle=f"""
    WITH RECURSIVE {_AUG_SQL},
    {_CAND_SQL},
    e2 AS (
        SELECT id_a AS a, id_b AS b FROM cand
        UNION
        SELECT id_b AS a, id_a AS b FROM cand
    ),
    reach(a, b) AS (
        SELECT doc_id AS a, doc_id AS b FROM aug
        UNION
        SELECT r.a, e.b FROM reach r JOIN e2 e ON r.b = e.a
    )
    SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a
    """,
)
def t1_neardup_components(spark, sf_dir):
    """Near-dup clustering end-to-end: MinHash → LSH candidate pairs →
    connected components (hash-to-min iterative joins) → every doc
    labeled with its duplicate-cluster id (cluster = min doc_id;
    singletons label themselves).  The oracle computes the same clusters
    via a DuckDB recursive-CTE transitive closure — an independent
    algorithm, same fixpoint."""
    aug = _aug_docs(spark, sf_dir)
    sig = minhash_signature(aug, "doc_id", "text", k=MINHASH_K).cache()
    bands = lsh_bands(sig, "doc_id", bands=LSH_BANDS, rows=LSH_ROWS)
    cand = lsh_candidate_pairs(bands, "doc_id")
    nodes = aug.select("doc_id")
    return connected_components(
        nodes, cand, node_col="doc_id", src="id_a", dst="id_b"
    ).withColumnRenamed("comp", "component")


@register(
    "t1_tfidf_top_terms",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                  t -> t <> '')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0), 6)
                   AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, term ASC) AS rk
        FROM scored
    ) t WHERE rk <= 3
    """,
)
def t1_tfidf_top_terms(spark, sf_dir):
    """TF-IDF with smoothed idf (ln((N+1)/(df+1)) + 1), top-3 terms per
    doc.  Three aggregations over one tokenized frame; the per-term
    document frequency is a small dimension that broadcasts back; N
    arrives as a broadcast scalar.  Ties break lexicographically so
    top-k is deterministic."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("term"),
    ).cache()
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n = d.select(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf")
    )
