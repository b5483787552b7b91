"""Text-retrieval surface over the corpus: inverted-index build, BM25
ranking, and graph node-similarity — the search-engine companion to the
dedup/curation operators (a training-data pipeline needs retrieval for
decontamination lookups, quality audits, and "what's in the corpus"
queries as much as for serving).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ght2dm_spark.functions.text import explode_ws_tokens
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
           array_to_string((list_sort(list(doc_id)))[1:10], ',')
             AS postings_head
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
    needs this kind of cap.

    The posting head is serialized to a comma-joined STRING rather than
    kept as an ARRAY column: the driver's pandas canonicalizer sorts
    output columns and cannot hash/sort numpy arrays (r7 driver err),
    so top-level ARRAY outputs are banned for every registered query
    (mechanically enforced in tests/test_oracle_types.py)."""
    d = load_table(spark, sf_dir, "documents")
    toks = explode_ws_tokens(d, "text", "term", keep=("doc_id",))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
        F.array_join(
            F.transform(
                F.slice(F.array_sort(F.collect_list("doc_id")), 1, 10),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings_head"),
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
    toks = explode_ws_tokens(d, "text", "term", keep=("doc_id",))
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


# --------------------------------------------------------------------------
# t1_hybrid_rrf — lexical + dense retrieval fused by reciprocal rank

_RRF_NQ = 5  # doc_id/vec_id < 5 are the query documents
_RRF_LEG_K = 10  # depth of each retrieval leg
_RRF_K = 5  # fused results per query
_RRF_C = 60  # the standard RRF damping constant (Cormack et al. 2009)


def _rrf_sql() -> str:
    from ght2dm_spark.operators.neardup import TOKS_SQL, shingle_sql
    from ght2dm_spark.operators.similarity import cosine_sql

    toks = TOKS_SQL.format(text="text")
    sh = shingle_sql("toks", "ltext", 3)
    return f"""
    WITH t AS (SELECT doc_id, {toks} AS toks, lower(text) AS ltext
               FROM documents),
    ct AS MATERIALIZED (
        SELECT doc_id, unnest(list_distinct({sh})) AS tok FROM t),
    qt AS MATERIALIZED (
        SELECT doc_id, tok FROM ct WHERE doc_id < {_RRF_NQ}),
    csz AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM ct GROUP BY 1),
    i AS (SELECT qt.doc_id AS q_id, ct.doc_id AS c_id, count(*) AS inter
          FROM ct JOIN qt USING (tok) WHERE ct.doc_id <> qt.doc_id
          GROUP BY 1, 2),
    lex AS (SELECT q_id, c_id, rnk FROM (
              SELECT q_id, c_id,
                     row_number() OVER (PARTITION BY q_id ORDER BY
                       (inter * 1000000) // (qs.n + cs.n - inter) DESC,
                       c_id ASC) AS rnk
              FROM i
              JOIN csz qs ON qs.doc_id = q_id
              JOIN csz cs ON cs.doc_id = c_id) x
            WHERE rnk <= {_RRF_LEG_K}),
    q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
          WHERE vec_id < {_RRF_NQ}),
    c AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings),
    den AS (SELECT q_id, c_id, rnk FROM (
              SELECT q_id, c_id,
                     row_number() OVER (PARTITION BY q_id ORDER BY
                       {cosine_sql("q_vec", "c_vec")} DESC, c_id ASC) AS rnk
              FROM c CROSS JOIN q WHERE q_id <> c_id) x
            WHERE rnk <= {_RRF_LEG_K}),
    fused AS (SELECT coalesce(l.q_id, d.q_id) AS q_id,
                     coalesce(l.c_id, d.c_id) AS c_id,
                     coalesce(1000000000 // ({_RRF_C} + l.rnk), 0)
                   + coalesce(1000000000 // ({_RRF_C} + d.rnk), 0) AS rrf
              FROM lex l FULL OUTER JOIN den d
                ON l.q_id = d.q_id AND l.c_id = d.c_id)
    SELECT q_id, c_id, CAST(rrf AS BIGINT) AS rrf,
           CAST(rank AS INT) AS rank
    FROM (SELECT q_id, c_id, rrf,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY rrf DESC, c_id ASC) AS rank
          FROM fused) f
    WHERE rank <= {_RRF_K}
    """


@register("t1_hybrid_rrf", oracle=_rrf_sql())
def t1_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al.,
    SIGIR 2009): for each query document, a LEXICAL leg (exact 3-gram
    shingle Jaccard top-10 via the inverted-index join) and a DENSE leg
    (exact cosine top-10 over the aligned embedding) are fused by
    RRF(d) = Σ_legs 1/(60 + rank_leg(d)) — the standard trick that
    needs no score calibration between incomparable ranking functions.
    Contributions are exact integers (1e9 div (60+rank)); a document
    missing from a leg contributes 0 via the full-outer join, so each
    leg's evidence is optional, never required.

    Scale: the lexical leg broadcasts only the QUERY shingle index
    (contamination_check's shape) while the corpus token stream streams
    past it; the dense leg broadcasts query vectors over one corpus
    scan (bruteforce baseline's shape — swap in the LSH/IVF leg at
    billion-vector scale, RRF is agnostic to where ranks come from).
    Fusion is a full-outer join on (q_id, c_id) bounded by
    |queries|·leg_k rows — driver-scale, shuffled on q_id."""
    from pyspark.sql import Window

    from ght2dm_spark.operators.neardup import shingle_df
    from ght2dm_spark.operators.similarity import topk_neighbors

    d = load_table(spark, sf_dir, "documents")
    csh = shingle_df(d, "doc_id", "text", 3)
    qsh = csh.filter(F.col("doc_id") < _RRF_NQ).select(
        F.col("doc_id").alias("q_id"), "shingle"
    )
    csz = csh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        csh.join(F.broadcast(qsh), "shingle")
        .filter(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", F.col("doc_id").alias("c_id"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    qs = csz.select(F.col("doc_id").alias("q_id"), F.col("n").alias("qn"))
    cs = csz.select(F.col("doc_id").alias("c_id"), F.col("n").alias("cn"))
    wl = Window.partitionBy("q_id").orderBy(
        F.col("ppm").desc(), F.col("c_id").asc()
    )
    lex = (
        inter.join(F.broadcast(qs), "q_id")
        .join(cs, "c_id")
        .withColumn("ppm", F.expr("inter * 1000000 div (qn + cn - inter)"))
        .withColumn("rnk", F.row_number().over(wl))
        .filter(F.col("rnk") <= _RRF_LEG_K)
        .select("q_id", "c_id", "rnk")
    )
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _RRF_NQ).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    c = e.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    den = topk_neighbors(q, c, k=_RRF_LEG_K).select(
        "q_id", "c_id", F.col("rank").alias("rnk")
    )
    contrib = lambda col: F.coalesce(  # noqa: E731
        F.expr(f"1000000000 div ({_RRF_C} + {col})"), F.lit(0)
    ).cast("bigint")
    fused = (
        lex.withColumnRenamed("rnk", "lr")
        .join(
            den.withColumnRenamed("rnk", "dr"),
            ["q_id", "c_id"],
            "full_outer",
        )
        .select(
            "q_id",
            "c_id",
            (contrib("lr") + contrib("dr")).alias("rrf"),
        )
    )
    wf = Window.partitionBy("q_id").orderBy(
        F.col("rrf").desc(), F.col("c_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("rank") <= _RRF_K)
        .select("q_id", "c_id", F.col("rrf").cast("bigint").alias("rrf"),
                F.col("rank").cast("int").alias("rank"))
    )


# --------------------------------------------------------------------------
# t1_mmr_rerank — diversity-aware reranking (maximal marginal relevance)

_MMR_NQ = 5  # vec_id < 5 are the queries
_MMR_CAND = 10  # relevance candidates per query
_MMR_K = 5  # diversity-selected results
_MMR_LAM_NUM, _MMR_LAM_DEN = 7, 10  # λ = 0.7 as an exact rational


def _mmr_sql() -> str:
    from ght2dm_spark.operators.similarity import cosine_sql

    cos_qc = cosine_sql("q_vec", "c_vec")
    cos_cs = cosine_sql("c_vec", "s_vec")
    parts = [
        f"""q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
          WHERE vec_id < {_MMR_NQ})""",
        "c AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings)",
        f"""cand AS MATERIALIZED (
          SELECT q_id, c_id, c_vec, cos FROM (
            SELECT q_id, c_id, c_vec, {cos_qc} AS cos,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY {cos_qc} DESC, c_id ASC) AS rnk
            FROM c CROSS JOIN q WHERE q_id <> c_id) x
          WHERE rnk <= {_MMR_CAND})""",
        f"""s1 AS (SELECT q_id, c_id, c_vec, cos, 1 AS pick FROM (
          SELECT q_id, c_id, c_vec, cos,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos DESC, c_id ASC) AS rn
          FROM cand) x WHERE rn = 1)""",
    ]
    for r in range(2, _MMR_K + 1):
        q = r - 1
        parts.append(
            f"""ms{r} AS (
          SELECT cd.q_id, cd.c_id, cd.c_vec, cd.cos,
                 max({cos_cs}) AS msim
          FROM cand cd
          JOIN (SELECT q_id, c_id, c_vec AS s_vec FROM s{q}) s
            ON s.q_id = cd.q_id
          WHERE cd.c_id NOT IN (SELECT c_id FROM s{q} ss
                                WHERE ss.q_id = cd.q_id)
          GROUP BY cd.q_id, cd.c_id, cd.c_vec, cd.cos),
    s{r} AS (
          SELECT q_id, c_id, c_vec, cos, {r} AS pick FROM (
            SELECT q_id, c_id, c_vec, cos,
                   row_number() OVER (PARTITION BY q_id ORDER BY
                     {_MMR_LAM_NUM} * cos
                       - {_MMR_LAM_DEN - _MMR_LAM_NUM} * msim DESC,
                     c_id ASC) AS rn
            FROM ms{r}) x WHERE rn = 1
          UNION ALL SELECT q_id, c_id, c_vec, cos, pick FROM s{q})"""
        )
    joined = ",\n    ".join(parts)
    return f"""
    WITH {joined}
    SELECT q_id, c_id, CAST(pick AS INT) AS pick, round(cos, 6) AS cos
    FROM s{_MMR_K}
    """


@register("t1_mmr_rerank", oracle=_mmr_sql())
def t1_mmr_rerank(spark, sf_dir):
    """Diversity-aware reranking by maximal marginal relevance
    (Carbonell & Goldstein, SIGIR 1998): from each query's cosine
    top-10, greedily select 5 maximizing λ·cos(q,c) − (1−λ)·max
    similarity to the already-selected set (λ = 7/10 as an exact
    rational) — the standard answer to near-duplicate result lists in
    retrieval-augmented pipelines (the top-k of a deduplicated-but-
    still-redundant corpus is often five paraphrases of one document).

    The greedy recurrence runs as 5 unrolled selection rounds in BOTH
    engines (same shape as the oracle's CTEs): each round scores the
    remaining candidates against the selected set (one bounded join —
    |selected| ≤ 4 rows per query) and picks the per-query argmax with
    an id tie-break.  Cosines are the sequential-fold doubles of
    operators/similarity (bit-identical across engines), and every
    comparison uses the identical expression, so the selection is
    exact-match despite float scores.

    Scale: candidates come from the brute-force baseline (broadcast
    queries, corpus never shuffles — swap in LSH/IVF at scale, MMR only
    sees the candidate list); the selection rounds touch
    |queries|·candidates rows — driver-scale frames, shuffled on
    q_id."""
    from pyspark.sql import Window

    from ght2dm_spark.operators.similarity import as_double, cosine, topk_neighbors

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _MMR_NQ).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    c = e.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    # MATERIALIZE the candidate frame (|queries|·k rows), don't lazily
    # cache it: the 5 unrolled greedy rounds reference ``sel`` twice
    # each (anti-join + union), so the final plan holds ~2^5 copies of
    # the selection subtree — under a lazy cache the first execution
    # races many concurrent subtree evaluations of the brute-force
    # top-k before the cache exists, recomputing the corpus scan per
    # reference (measured 11.8 s; 1.9 s with the checkpoint).
    cand = (
        topk_neighbors(q, c, k=_MMR_CAND)
        .join(c, "c_id")
        .select("q_id", "c_id", "c_vec", "cos")
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id"))
    sel = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("q_id", "c_id", "c_vec", "cos", F.lit(1).alias("pick"))
    )
    for r in range(2, _MMR_K + 1):
        s_vecs = sel.select(
            F.col("q_id").alias("sq"), F.col("c_id").alias("s_id"),
            F.col("c_vec").alias("s_vec"),
        )
        remaining = cand.join(
            sel.select(F.col("q_id").alias("sq"), F.col("c_id").alias("s_id")),
            (F.col("q_id") == F.col("sq")) & (F.col("c_id") == F.col("s_id")),
            "left_anti",
        )
        ms = (
            remaining.join(s_vecs, remaining.q_id == s_vecs.sq)
            .withColumn(
                "sim",
                cosine(as_double(F.col("c_vec")), as_double(F.col("s_vec"))),
            )
            .groupBy("q_id", "c_id", "c_vec", "cos")
            .agg(F.max("sim").alias("msim"))
        )
        score = (
            _MMR_LAM_NUM * F.col("cos")
            - (_MMR_LAM_DEN - _MMR_LAM_NUM) * F.col("msim")
        )
        wm = Window.partitionBy("q_id").orderBy(score.desc(), F.col("c_id"))
        picked = (
            ms.withColumn("rn", F.row_number().over(wm))
            .filter(F.col("rn") == 1)
            .select("q_id", "c_id", "c_vec", "cos", F.lit(r).alias("pick"))
        )
        # cut the doubling selection lineage each round (≤|queries|·r
        # rows — scalar-sized; same move as the graph loops)
        sel = sel.unionByName(picked).localCheckpoint(eager=True)
    return sel.select(
        "q_id",
        "c_id",
        F.col("pick").cast("int").alias("pick"),
        F.round("cos", 6).alias("cos"),
    )
