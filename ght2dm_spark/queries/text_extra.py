"""Round-8 text/corpus-analysis declared queries: stopword profiling,
mixture entropy, per-document shingle novelty, hapax-shingle detection,
cross-language shingle overlap, a Heaps-law exponent fit, and a Gini
coefficient of document lengths — the corpus-composition audits a
training-data pipeline runs between dedup and mixing.

The synthetic corpus is a 31-type token vocabulary (every token's
corpus frequency ≥ 26), so type-level rarity is degenerate; the rarity
and overlap queries therefore work on 3-gram SHINGLES (27k types at
sf0.1, hapax-rich) — same operators a real corpus runs on tokens.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.operators.neardup import TOKS_SQL, shingle_df, shingle_sql
from ght2dm_spark.queries.registry import register

_TOKS = TOKS_SQL.format(text="text")

_SH_SQL = f"""
    t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, lang,
                  unnest(list_distinct({shingle_sql("toks", None, 3)}))
                    AS shingle
           FROM t)
"""


def _sh(spark, sf_dir):
    """(doc_id, lang, shingle) — distinct 3-gram shingles per doc over
    the RAW documents table (no planted duplicates: these queries audit
    the corpus as-is)."""
    d = load_table(spark, sf_dir, "documents")
    sh = shingle_df(d, "doc_id", "text", 3)
    return sh.join(
        F.broadcast(d.select("doc_id", "lang")), "doc_id"
    )


# --------------------------------------------------------------------------
# t1_stopword_profile

_STOPWORDS = ("the", "a")


@register(
    "t1_stopword_profile",
    oracle=f"""
    WITH tok AS (
        SELECT lang, unnest({_TOKS}) AS tok FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN tok IN {_STOPWORDS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_stop,
           CAST(sum(CASE WHEN tok IN {_STOPWORDS} THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS stop_ppm
    FROM tok GROUP BY lang
    """,
)
def t1_stopword_profile(spark, sf_dir):
    """Stopword-occurrence share per language — the C4/Gopher-style
    quality signal (too FEW stopwords flags listings/boilerplate, too
    many flags filler) computed as an exact ppm over the token stream.
    The stopword list is the corpus's function words; a real run swaps
    in a per-language list, same plan.

    Scale: token explode + one map-side-combinable |langs|-row groupBy;
    integer ppm (floor division) — no float anywhere."""
    tok = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
        ).alias("tok"),
    )
    is_stop = F.when(F.col("tok").isin(*_STOPWORDS), 1).otherwise(0)
    return tok.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(is_stop).cast("bigint").alias("n_stop"),
        F.expr(
            f"CAST(sum(CASE WHEN tok IN {_STOPWORDS} THEN 1 ELSE 0 END) "
            f"* 1000000L div count(*) AS BIGINT)"
        ).alias("stop_ppm"),
    )


# --------------------------------------------------------------------------
# t1_mix_entropy


@register(
    "t1_mix_entropy",
    oracle="""
    WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n
               FROM documents GROUP BY lang, source),
    t AS (SELECT lang, source, n,
                 CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS tot
          FROM c),
    e AS (SELECT lang, n, tot,
                 CAST(round(-(CAST(n AS DOUBLE) / tot)
                            * log2(CAST(n AS DOUBLE) / tot), 9)
                      AS DECIMAL(18,9)) AS term
          FROM t)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_sources,
           CAST(max(tot) AS BIGINT) AS n_docs,
           round(CAST(sum(term) AS DOUBLE), 6) AS source_entropy_bits
    FROM e GROUP BY lang
    """,
)
def t1_mix_entropy(spark, sf_dir):
    """Shannon entropy (bits) of each language's SOURCE mixture — the
    diversity score of a data-mixing recipe: entropy near log2(#sources)
    means balanced provenance, near 0 means one source dominates (the
    single-point-of-contamination risk a curation audit flags).

    Exactness: each −p·log2(p) term is a fixed IEEE chain on a
    one-division p, rounded to 9 places and summed as exact fixed-point
    (the t1_char_entropy pattern).  Scale: a (lang, source) count grid
    plus |grid|-row window/aggregate arithmetic."""
    c = load_table(spark, sf_dir, "documents").groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.partitionBy("lang")
    t = c.select(
        "lang", "n", F.sum("n").over(w).cast("bigint").alias("tot")
    )
    p = F.col("n").cast("double") / F.col("tot")
    e = t.select(
        "lang", "n", "tot",
        F.round(-p * F.log2(p), 9).cast("decimal(18,9)").alias("term"),
    )
    return e.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        F.max("tot").cast("bigint").alias("n_docs"),
        F.round(F.sum("term").cast("double"), 6).alias("source_entropy_bits"),
    )


# --------------------------------------------------------------------------
# t1_ngram_novelty


@register(
    "t1_ngram_novelty",
    oracle=f"""
    WITH {_SH_SQL},
    first_seen AS (
        SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle
    )
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(CAST(sum(CASE WHEN f.first_doc = sh.doc_id
                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
             AS novelty
    FROM sh JOIN first_seen f ON sh.shingle = f.shingle
    GROUP BY sh.doc_id
    """,
)
def t1_ngram_novelty(spark, sf_dir):
    """Per-document n-gram NOVELTY in stable-id order: the fraction of
    a doc's 3-gram shingles never seen in any lower-id document — the
    streaming-curation signal ("how much genuinely new content does
    this doc add?") that complements pairwise dedup: a doc can clear
    every pair threshold yet be 95% recombined boilerplate.

    Computed without any prefix rescan: each shingle's global
    first-occurrence doc (one min-aggregate) turns cumulative novelty
    into one join + one groupBy — the t1_vocab_growth trick at document
    granularity.  Integer counts, one division."""
    sh = _sh(spark, sf_dir).select("doc_id", "shingle")
    # one explode pass: min(doc_id) OVER (PARTITION BY shingle) attaches
    # each shingle's first-occurrence doc in the same shuffle the old
    # aggregate-then-self-join form paid TWICE (the tokenize+explode
    # scan ran once under the groupBy and once under the join probe —
    # different payloads, so AQE could not reuse the exchange)
    first = sh.withColumn(
        "first_doc", F.min("doc_id").over(Window.partitionBy("shingle"))
    )
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        first
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(novel).cast("bigint").alias("n_novel"),
            F.round(
                F.sum(novel).cast("double") / F.count(F.lit(1)), 6
            ).alias("novelty"),
        )
    )


# --------------------------------------------------------------------------
# t1_rare_shingle_docs

_RARE_DF = 2


@register(
    "t1_rare_shingle_docs",
    oracle=f"""
    WITH {_SH_SQL},
    freq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
    SELECT sh.doc_id, sh.lang,
           CAST(count(*) AS BIGINT) AS n_rare
    FROM sh JOIN freq f ON sh.shingle = f.shingle
    WHERE f.df <= {_RARE_DF}
    GROUP BY sh.doc_id, sh.lang
    """,
)
def t1_rare_shingle_docs(spark, sf_dir):
    """Documents carrying HAPAX-class shingles (corpus df ≤ 2): the
    unique-content detector — rare n-grams mark either high-value novel
    text or PII/serial-number noise, and either way these are the docs
    a curation pass inspects first (and the ones memorization audits
    track).  The inverse of the hot-shingle cap: that drops the
    never-discriminative head, this surfaces the discriminative tail.

    Scale: one shingle-keyed df aggregate joined back — the df frame is
    vocab-sized, the join key is the shingle both sides already shuffle
    on."""
    sh = _sh(spark, sf_dir)
    # one explode pass: the corpus df comes from count(*) OVER
    # (PARTITION BY shingle) in the same shuffle the old
    # aggregate-then-self-join paid twice (see t1_ngram_novelty)
    return (
        sh.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
        .filter(F.col("df") <= _RARE_DF)
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rare"))
    )


# --------------------------------------------------------------------------
# t1_lang_shingle_overlap


@register(
    "t1_lang_shingle_overlap",
    oracle=f"""
    WITH {_SH_SQL},
    v AS (SELECT DISTINCT lang, shingle FROM sh),
    sz AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY lang),
    p AS (SELECT a.lang AS lang_a, b.lang AS lang_b,
                 CAST(count(*) AS BIGINT) AS inter
          FROM v a JOIN v b ON a.shingle = b.shingle AND a.lang < b.lang
          GROUP BY 1, 2)
    SELECT lang_a, lang_b, inter, sa.n AS n_a, sb.n AS n_b,
           round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6)
             AS jaccard
    FROM p JOIN sz sa ON p.lang_a = sa.lang
           JOIN sz sb ON p.lang_b = sb.lang
    """,
)
def t1_lang_shingle_overlap(spark, sf_dir):
    """Pairwise Jaccard of language-level shingle vocabularies — the
    cross-lingual contamination/consistency audit (parallel corpora and
    mislabeled languages both surface as anomalously HIGH overlap; a
    healthy multilingual mix shows near-zero cross-script overlap).

    Scale: the per-language vocabulary is a DISTINCT over (lang,
    shingle) — map-side combinable — and the pair join runs on the
    shingle key over vocab-sized frames, |langs|²-bounded output.
    (Round-9 A/B: a collect_set(lang)-per-shingle bucket form with
    in-row pairs measured 3.34 s vs 1.25 s for this form at sf0.1 and
    was reverted — the three DISTINCT branches share one AQE-reused
    exchange, and object-hash set collection over the pre-distinct
    posting stream costs more than the vocab-frame self-join.)"""
    v = _sh(spark, sf_dir).select("lang", "shingle").distinct()
    sz = v.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = v.select(F.col("lang").alias("lang_a"), "shingle")
    b = v.select(F.col("lang").alias("lang_b"), "shingle")
    p = (
        a.join(b, "shingle")
        .filter(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    sa = sz.select(F.col("lang").alias("lang_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("lang").alias("lang_b"), F.col("n").alias("n_b"))
    return (
        p.join(F.broadcast(sa), "lang_a")
        .join(F.broadcast(sb), "lang_b")
        .select(
            "lang_a", "lang_b", "inter", "n_a", "n_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# t1_heaps_exponent


_HEAPS_BUCKETS = 10

@register(
    "t1_heaps_exponent",
    oracle=f"""
    WITH {_SH_SQL},
    n0 AS (SELECT max(doc_id) + 1 AS id_span FROM documents),
    sb AS (SELECT CAST(floor(doc_id * {_HEAPS_BUCKETS}
                       / (SELECT id_span FROM n0)) AS BIGINT) + 1 AS bucket,
                  shingle
           FROM sh),
    first_seen AS (SELECT shingle, min(bucket) AS fb FROM sb GROUP BY shingle),
    new_types AS (SELECT fb AS bucket, count(*) AS n_new
                  FROM first_seen GROUP BY fb),
    occ AS (SELECT bucket, count(*) AS n_occ FROM sb GROUP BY bucket),
    vg AS (SELECT occ.bucket,
                  CAST(sum(coalesce(new_types.n_new, 0))
                       OVER (ORDER BY occ.bucket) AS BIGINT) AS cum_types,
                  CAST(sum(occ.n_occ) OVER (ORDER BY occ.bucket) AS BIGINT)
                    AS cum_tokens
           FROM occ LEFT JOIN new_types ON occ.bucket = new_types.bucket),
    pt AS (SELECT round(log2(CAST(cum_tokens AS DOUBLE)), 9) AS x,
                  round(log2(CAST(cum_types AS DOUBLE)), 9) AS y
           FROM vg),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(x AS DECIMAL(18,9))) AS sx,
                 sum(CAST(y AS DECIMAL(18,9))) AS sy,
                 sum(CAST(round(x * y, 9) AS DECIMAL(18,9))) AS sxy,
                 sum(CAST(round(x * x, 9) AS DECIMAL(18,9))) AS sxx
          FROM pt)
    SELECT n,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                    * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                    * CAST(sx AS DOUBLE)), 6) + 0 AS beta,
           round((CAST(sy AS DOUBLE) - (n * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                    * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / n, 6) + 0
             AS log2_k
    FROM s
    """,
)
def t1_heaps_exponent(spark, sf_dir):
    """Heaps'-law fit V(n) = K·n^β: ordinary least squares of
    log2(cum_types) on log2(cum_tokens) over ten id-prefix checkpoints
    of the SHINGLE vocabulary — the two parameters that EXTRAPOLATE
    vocabulary growth to the next 10× of data.  The r8 version fit the
    unigram vocabulary, which this corpus CLOSES at 31 types: cum_types
    was constant, β was catastrophic-cancellation noise (−2.46e-11),
    and Spark/DuckDB rounded that noise to differently-signed zeros.
    The 3-gram shingle space (27k types at sf0.1, hapax-rich) has a
    real growth curve, so the slope is well-conditioned.

    Exactness: the log points and their products round to DECIMAL(18,9)
    before the exact 10-row sums; β and log2(K) are fixed IEEE chains
    over the summed decimals — no engine pow() anywhere — and both
    rounded outputs are normalized with ``+ 0`` on both engines so a
    zero can only ever hash as +0.0 (IEEE: −0.0 + 0.0 = +0.0).
    Scale: the t1_vocab_growth plan shape at shingle granularity — the
    prefix bucket is pure arithmetic against a broadcast 1-row id-span
    frame, first-occurrence min turns cumulative-distinct into one
    vocab-sized map-side-combinable aggregate, and the only windows run
    over the 10-row bucket frame."""
    docs = load_table(spark, sf_dir, "documents")
    span = docs.agg((F.max("doc_id") + 1).alias("id_span"))
    # shingle_df directly — the _sh lang join is a per-row no-op here
    # (only bucket/shingle survive the projection).  A (bucket, shingle)
    # pre-agg feeding both consumers was A/B'd at 1.49 s vs 1.10 s and
    # reverted: the extra exchange costs more than the second map-side
    # explode evaluation it saves.
    sb = shingle_df(docs, "doc_id", "text", 3).crossJoin(
        F.broadcast(span)
    ).select(
        (
            F.floor(
                F.col("doc_id") * _HEAPS_BUCKETS / F.col("id_span")
            ).cast("bigint")
            + 1
        ).alias("bucket"),
        "shingle",
    )
    first_seen = sb.groupBy("shingle").agg(F.min("bucket").alias("fb"))
    new_types = first_seen.groupBy(F.col("fb").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    occ = sb.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_occ"))
    wb = Window.orderBy("bucket")
    vg = occ.join(new_types, "bucket", "left").select(
        "bucket",
        F.sum(F.coalesce("n_new", F.lit(0))).over(wb)
        .cast("bigint").alias("cum_types"),
        F.sum("n_occ").over(wb).cast("bigint").alias("cum_tokens"),
    )
    x = F.round(F.log2(F.col("cum_tokens").cast("double")), 9)
    y = F.round(F.log2(F.col("cum_types").cast("double")), 9)
    pt = vg.select(x.alias("x"), y.alias("y"))
    s = pt.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(18,9)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(18,9)")).alias("sy"),
        F.sum(
            F.round(F.col("x") * F.col("y"), 9).cast("decimal(18,9)")
        ).alias("sxy"),
        F.sum(
            F.round(F.col("x") * F.col("x"), 9).cast("decimal(18,9)")
        ).alias("sxx"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "n",
        (F.round(beta, 6) + F.lit(0.0)).alias("beta"),
        (F.round((sy - beta * sx) / n, 6) + F.lit(0.0)).alias("log2_k"),
    )


# --------------------------------------------------------------------------
# t1_doc_length_gini


@register(
    "t1_doc_length_gini",
    oracle="""
    WITH r AS (SELECT lang, n_chars,
                      row_number() OVER (PARTITION BY lang
                                         ORDER BY n_chars ASC, doc_id ASC)
                        AS i
               FROM documents),
    s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(n_chars) AS BIGINT) AS sx,
                 CAST(sum(i * n_chars) AS BIGINT) AS six
          FROM r GROUP BY lang)
    SELECT lang, n, sx,
           round(CAST(2 * six AS DOUBLE) / (n * sx)
                 - (CAST(n + 1 AS DOUBLE) / n), 6) AS gini
    FROM s
    """,
)
def t1_doc_length_gini(spark, sf_dir):
    """Gini coefficient of document lengths per language — the
    inequality score that drives chunking and packing policy (a high
    Gini corpus wastes context-window tokens on padding unless packed;
    a near-zero one can use fixed-size readers).  Computed by the
    rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over a deterministic
    total order (length, then stable id).

    Exactness: Σ(i·xᵢ) and Σx are exact BIGINT sums; gini is a fixed
    chain of two divisions on exact operands.  Scale: one rank window
    per language partition over a 2-column projection, then one
    |langs|-row aggregate."""
    w = Window.partitionBy("lang").orderBy(
        F.col("n_chars").asc(), F.col("doc_id").asc()
    )
    r = load_table(spark, sf_dir, "documents").select(
        "lang", "n_chars", F.row_number().over(w).alias("i")
    )
    s = r.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("n_chars").cast("bigint").alias("sx"),
        F.sum(F.col("i") * F.col("n_chars")).cast("bigint").alias("six"),
    )
    return s.select(
        "lang", "n", "sx",
        F.round(
            (2 * F.col("six")).cast("double") / (F.col("n") * F.col("sx"))
            - (F.col("n") + 1).cast("double") / F.col("n"),
            6,
        ).alias("gini"),
    )
