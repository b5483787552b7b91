"""Round-9 cross-source contamination declared queries at the n-gram
level: opening/closing-prefix leakage of a held-out split into the
training shingle space, the cross-source shared-n-gram vocabulary,
and asymmetric containment over rare-shingle candidate pairs — the
prefix-granular extensions of t1_contamination_check /
t1_cross_source_leakage (which test whole-doc and whole-shingle
leakage; these localize WHERE in the document the leak sits and HOW
MUCH of each side is contained).

Split convention: doc_id % 10 == 0 is the held-out EVAL slice, the
rest is TRAIN — deterministic, engine-independent arithmetic on the
stable id.

Exactness: everything is exact counts and integer ppm; no floats
anywhere except none at all.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.operators.neardup import (
    TOKS_SQL,
    bucket_pairs,
    shingle_array_df,
    shingle_df,
    shingle_sql,
)
from ght2dm_spark.queries.registry import register

_TOKS = TOKS_SQL.format(text="text")

_SH_SQL = f"""
    t0 AS (SELECT doc_id, lang, source, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, lang, source,
                  unnest(list_distinct({shingle_sql("toks", None, 3)}))
                    AS shingle
           FROM t0)
"""


def _spark_toks():
    return F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")


def _edge_contamination(spark, sf_dir, head: bool):
    """Shared plan for the opening/closing 3-gram leak check: the eval
    slice's edge shingle probed against the DISTINCT train shingle
    vocabulary (vocab-sized build side), counted per language."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", _spark_toks().alias("toks")
    ).filter(F.size("toks") >= 3)
    if head:
        edge = F.concat_ws(" ", F.slice("toks", 1, 3))
    else:
        edge = F.concat_ws(" ", F.slice("toks", F.size("toks") - 2, 3))
    ev = d.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", "lang", edge.alias("shingle")
    )
    # Membership flipped to filter the BIG side first (guide §3.2): the
    # probe set is ~|eval docs| edge shingles, so broadcasting IT and
    # semi-joining the raw train shingle stream against it replaces the
    # corpus-wide DISTINCT-vocabulary shuffle with a map-side hash
    # filter; the surviving shingle set (≤ the probe set) is then the
    # broadcast build side of the original semi join.  Semi-join
    # membership is duplicate-insensitive, so results are identical.
    edge_set = ev.select("shingle").distinct()
    hit_sh = (
        shingle_df(
            load_table(spark, sf_dir, "documents").filter(
                F.col("doc_id") % 10 != 0
            ),
            "doc_id", "text", 3,
        )
        .join(F.broadcast(edge_set), "shingle", "left_semi")
        .select("shingle")
        .distinct()
    )
    hit = ev.join(
        F.broadcast(hit_sh), "shingle", "left_semi"
    ).groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_leaked")
    )
    tot = ev.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval")
    )
    return tot.join(hit, "lang", "left").select(
        "lang", "n_eval",
        F.coalesce("n_leaked", F.lit(0)).cast("bigint").alias("n_leaked"),
        F.expr(
            "CAST(coalesce(n_leaked, 0) * 1000000L div n_eval AS BIGINT)"
        ).alias("leak_ppm"),
    )


def _edge_oracle(head: bool) -> str:
    edge = (
        "toks[1] || ' ' || toks[2] || ' ' || toks[3]"
        if head
        else "toks[-3] || ' ' || toks[-2] || ' ' || toks[-1]"
    )
    return f"""
    WITH t0 AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
    ev AS (SELECT doc_id, lang, {edge} AS shingle
           FROM t0 WHERE doc_id % 10 = 0 AND len(toks) >= 3),
    tr AS (SELECT doc_id, {_TOKS} AS toks FROM documents
           WHERE doc_id % 10 <> 0),
    train_sh AS (SELECT DISTINCT unnest({shingle_sql("toks", None, 3)})
                   AS shingle
                 FROM tr),
    hit AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_leaked
            FROM ev WHERE shingle IN (SELECT shingle FROM train_sh)
            GROUP BY lang),
    tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_eval
            FROM ev GROUP BY lang)
    SELECT tot.lang, tot.n_eval,
           CAST(coalesce(hit.n_leaked, 0) AS BIGINT) AS n_leaked,
           CAST(coalesce(hit.n_leaked, 0) * 1000000 // tot.n_eval AS BIGINT)
             AS leak_ppm
    FROM tot LEFT JOIN hit ON tot.lang = hit.lang
    """


# --------------------------------------------------------------------------
# t1_prefix_contamination


@register("t1_prefix_contamination", oracle=_edge_oracle(head=True))
def t1_prefix_contamination(spark, sf_dir):
    """Opening-3-gram contamination of the held-out slice: the
    fraction of eval docs whose first shingle appears ANYWHERE in the
    training shingle space — the prompt-leak check (benchmark prompts
    leak through their openings first: few-shot headers, question
    stems), stricter than whole-doc dedup and the reason contamination
    sweeps run at n-gram granularity.

    Scale: the probe side is one edge shingle per eval doc (narrow
    map, no explode); the training side is the DISTINCT shingle
    vocabulary — the semi join keys both sides on the shingle they
    already shuffle on, never doc×doc."""
    return _edge_contamination(spark, sf_dir, head=True)


# --------------------------------------------------------------------------
# t1_tail_overlap


@register("t1_tail_overlap", oracle=_edge_oracle(head=False))
def t1_tail_overlap(spark, sf_dir):
    """Closing-3-gram contamination of the held-out slice — the
    answer-leak complement of t1_prefix_contamination (benchmark
    ANSWERS leak through document tails: solution lines, punchlines,
    final citations).  Prefix-clean but tail-contaminated eval data
    inflates scores exactly where it hurts.  Same plan shape as the
    prefix check with the edge taken from the token list's tail."""
    return _edge_contamination(spark, sf_dir, head=False)


# --------------------------------------------------------------------------
# t1_crosssource_ngram_df

_XS_TOP = 50


@register(
    "t1_crosssource_ngram_df",
    oracle=f"""
    WITH {_SH_SQL},
    per AS (SELECT shingle,
                   CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
                   CAST(count(*) AS BIGINT) AS df
            FROM sh GROUP BY shingle),
    multi AS (SELECT shingle, n_sources, df,
                     CAST(row_number() OVER (ORDER BY n_sources DESC,
                                             df DESC, shingle ASC)
                          AS BIGINT) AS rank
              FROM per WHERE n_sources >= 2)
    SELECT rank, shingle, n_sources, df
    FROM multi WHERE rank <= {_XS_TOP}
    """,
)
def t1_crosssource_ngram_df(spark, sf_dir):
    """The cross-source shared-n-gram vocabulary: shingles appearing
    in ≥2 sources, ranked by source spread then document frequency —
    syndicated/boilerplate content that per-source dedup can never
    catch (each source carries one 'copy') and the seed list for a
    cross-source canonical-document pass.

    Scale: one shingle-keyed aggregate (count + distinct-source count
    share the shuffle); the rank window runs over the multi-source
    subset of the vocabulary, never the posting stream."""
    sh = shingle_df(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", 3
    ).join(
        F.broadcast(
            load_table(spark, sf_dir, "documents").select(
                "doc_id", "source"
            )
        ),
        "doc_id",
    )
    per = sh.groupBy("shingle").agg(
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.count(F.lit(1)).cast("bigint").alias("df"),
    )
    w = Window.orderBy(
        F.col("n_sources").desc(), F.col("df").desc(), F.col("shingle").asc()
    )
    return (
        per.filter(F.col("n_sources") >= 2)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _XS_TOP)
        .select("rank", "shingle", "n_sources", "df")
    )


# --------------------------------------------------------------------------
# t1_containment_asym

_CAND_DF_LO = 2
_CAND_DF_HI = 4
_CONT_TOP = 50


@register(
    "t1_containment_asym",
    oracle=f"""
    WITH {_SH_SQL},
    freq AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df
             FROM sh GROUP BY shingle),
    rare AS (SELECT shingle FROM freq
             WHERE df BETWEEN {_CAND_DF_LO} AND {_CAND_DF_HI}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM sh a JOIN sh b ON a.shingle = b.shingle
                                AND a.doc_id < b.doc_id
             WHERE a.shingle IN (SELECT shingle FROM rare)),
    size_ AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
              FROM sh GROUP BY doc_id),
    inter AS (SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS n_common
              FROM cand c
              JOIN sh sa ON sa.doc_id = c.doc_a
              JOIN sh sb ON sb.doc_id = c.doc_b
                        AND sb.shingle = sa.shingle
              GROUP BY c.doc_a, c.doc_b),
    scored AS (SELECT i.doc_a, i.doc_b, i.n_common,
                      za.n_sh AS n_a, zb.n_sh AS n_b,
                      CAST(i.n_common * 1000000 // za.n_sh AS BIGINT)
                        AS contain_a_ppm,
                      CAST(i.n_common * 1000000 // zb.n_sh AS BIGINT)
                        AS contain_b_ppm,
                      CAST(row_number() OVER (ORDER BY i.n_common DESC,
                                              i.doc_a ASC, i.doc_b ASC)
                           AS BIGINT) AS rank
               FROM inter i
               JOIN size_ za ON i.doc_a = za.doc_id
               JOIN size_ zb ON i.doc_b = zb.doc_id)
    SELECT rank, doc_a, doc_b, n_common, n_a, n_b,
           contain_a_ppm, contain_b_ppm
    FROM scored WHERE rank <= {_CONT_TOP}
    """,
)
def t1_containment_asym(spark, sf_dir):
    """Asymmetric containment over rare-shingle candidate pairs:
    |A∩B|/|A| vs |A∩B|/|B| in exact ppm — the direction-aware overlap
    Jaccard hides: a quote-with-commentary pair has high containment
    of the SHORT side and low Jaccard, and the curation action (keep
    the superset, drop the quote) needs the asymmetry.  Candidates
    come from discriminative shingles (2 ≤ df ≤ 4), the same
    candidate-bounding discipline as the LSH family — never all
    pairs.

    Scale: the rare-shingle filter bounds pair generation at
    C(df,4) per shingle; the intersection and both set sizes come from
    per-doc distinct-shingle ARRAYS attached to the bounded pair list
    (size(array_intersect)) — the shingle frame is never exploded or
    shuffled for the recount.

    Round-9 shape: candidates from ONE groupBy(shingle) whose sorted
    doc buckets (df between 2 and 4) emit their pairs in-row
    (bucket_pairs); intersections/sizes from shingle_array_df joined to
    the candidate frame.  The previous form evaluated the shingle
    explode 5× (freq, both self-join sides, both inter sides + sizes)
    and shuffled exploded rows through 3 joins and a pair groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_df(docs, "doc_id", "text", 3).select("doc_id", "shingle")
    freq = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    rare = freq.filter(
        F.col("df").between(_CAND_DF_LO, _CAND_DF_HI)
    ).select("shingle")
    rsh = sh.join(rare, "shingle", "left_semi")
    cand = (
        rsh.alias("a")
        .join(rsh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    arrs = shingle_array_df(docs, "doc_id", "text", 3)
    a = arrs.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"))
    b = arrs.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"))
    inter = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("shs_a", "shs_b"))
            .cast("bigint")
            .alias("n_common"),
            F.size("shs_a").cast("bigint").alias("n_a"),
            F.size("shs_b").cast("bigint").alias("n_b"),
        )
    )
    scored = inter.select(
        "doc_a", "doc_b", "n_common", "n_a", "n_b",
        F.expr("CAST(n_common * 1000000L div n_a AS BIGINT)")
        .alias("contain_a_ppm"),
        F.expr("CAST(n_common * 1000000L div n_b AS BIGINT)")
        .alias("contain_b_ppm"),
    )
    w = Window.orderBy(
        F.col("n_common").desc(), F.col("doc_a").asc(), F.col("doc_b").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _CONT_TOP)
        .select(
            "rank", "doc_a", "doc_b", "n_common", "n_a", "n_b",
            "contain_a_ppm", "contain_b_ppm",
        )
    )
