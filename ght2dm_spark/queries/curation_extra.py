"""Curation and windowing follow-ups: quality-weighted sampling, rolling
time-range windows (per-entity, scale-correct), and explode_outer
null-preservation semantics.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ght2dm_spark.functions import epoch_us
from ght2dm_spark.io import load_table
from ght2dm_spark.operators.neardup import hex2int_sql
from ght2dm_spark.queries.registry import register


@register(
    "t1_weighted_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             {hex2int_sql("md5(CAST(doc_id AS VARCHAR))", 1, 8)} / 4294967296.0
               AS u,
             least(CAST(n_chars AS DOUBLE) / 2000.0, 1.0) AS w
      FROM documents) t
    WHERE u < w
    """,
)
def t1_weighted_sample(spark, sf_dir):
    """Quality-weighted sampling: keep each doc with probability equal
    to its (deterministic) quality weight — here length-based, capped at
    1 — by comparing the weight against an md5-derived uniform in
    [0, 1).  The curriculum/quality-mix step of corpus construction:
    higher-quality docs survive proportionally more often, yet the draw
    is reproducible and partitioning-independent (hash of the key, no
    RNG state).

    Scale: pure narrow filter — no shuffle, pushes after the scan; the
    same idiom extends to temperature mixing (w = score^t / max)."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    w = F.least(F.col("n_chars").cast("double") / 2000.0, F.lit(1.0))
    return d.filter(u < w).select("doc_id", "lang", "n_chars")


@register(
    "t1_window_time_range",
    oracle="""
    SELECT event_id, user_id, ts,
           count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS n_last_hour
    FROM events
    """,
)
def t1_window_time_range(spark, sf_dir):
    """Rolling one-hour event count per user: a RANGE frame over the
    epoch-microsecond ordering — the time-based sliding window as a
    window function (vs t1_sliding_window's bucketed form).  Integer
    microsecond bounds are exact on both engines.

    Scale: partitioned by user_id — one shuffle, state is the frame's
    row buffer per user (bounded by events-per-hour), unlike a global
    ordered window."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
    )


@register(
    "t1_explode_outer",
    oracle="""
    WITH m AS (SELECT doc_id, regexp_extract_all(text, '[0-9]{{3,}}') AS nums
               FROM documents)
    SELECT m.doc_id, u.num
    FROM m LEFT JOIN
         (SELECT doc_id, unnest(nums) AS num FROM m) u ON m.doc_id = u.doc_id
    """.replace("{{", "{").replace("}}", "}"),
)
def t1_explode_outer(spark, sf_dir):
    """explode_outer: rows with EMPTY match arrays survive with NULL —
    the left-join-lateral semantics plain explode silently drops.  The
    pattern (3+ digit runs) matches almost nothing, so the null-
    preserving branch is the one doing the work.

    Scale: narrow map like explode; no shuffle."""
    m = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_extract_all("text", F.lit("[0-9]{3,}"), 0).alias("nums"),
    )
    return m.select("doc_id", F.explode_outer("nums").alias("num"))


@register(
    "t1_repetition_ratio",
    oracle="""
    WITH t AS (SELECT doc_id,
                      list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                  x -> x <> '') AS toks
               FROM documents),
    g AS (SELECT doc_id,
                 CASE WHEN len(toks) >= 2 THEN
                   list_transform(range(1, len(toks)),
                                  i -> toks[i] || ' ' || toks[i+1])
                 ELSE [] END AS grams
          FROM t)
    SELECT doc_id,
           CAST(len(grams) AS INTEGER) AS n_bigrams,
           round(CASE WHEN len(grams) > 0 THEN
                   1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
                 END, 6) AS rep_ratio
    FROM g
    """,
)
def t1_repetition_ratio(spark, sf_dir):
    """Repetition ratio (Gopher-style quality rule): fraction of
    duplicate word bigrams per document — high values flag boilerplate
    and spam.  Pure integer counts divided once at the end; rounds only
    guard the division's last bit.

    Scale: narrow map (tokenize → bigram transform → distinct count
    inside the array) — no shuffle, no explode; the per-row arrays live
    only inside the projection."""
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", toks.alias("toks")
    )
    grams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("toks", i), F.element_at("toks", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = d.select("doc_id", grams.alias("grams"))
    return g.select(
        "doc_id",
        F.size("grams").alias("n_bigrams"),
        F.round(
            F.when(
                F.size("grams") > 0,
                1.0
                - F.size(F.array_distinct("grams")).cast("double")
                / F.size("grams"),
            ),
            6,
        ).alias("rep_ratio"),
    )


@register(
    "t1_char_entropy",
    oracle="""
    WITH c AS (SELECT doc_id, unnest(string_split_regex(lower(text), '')) AS ch
               FROM documents WHERE length(text) > 0),
    f AS (SELECT doc_id, ch, count(*) AS n FROM c WHERE ch <> ''
          GROUP BY doc_id, ch),
    tot AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS total FROM f
            GROUP BY doc_id),
    term AS (SELECT f.doc_id,
                    CAST(round(
                      -(CAST(f.n AS DOUBLE) / tot.total)
                        * log2(CAST(f.n AS DOUBLE) / tot.total), 9)
                      AS DECIMAL(18,9)) AS t
             FROM f JOIN tot ON f.doc_id = tot.doc_id)
    SELECT doc_id, round(CAST(sum(t) AS DOUBLE), 6) AS entropy
    FROM term GROUP BY doc_id
    """,
)
def t1_char_entropy(spark, sf_dir):
    """Character-level Shannon entropy per document — the gibberish/
    natural-text discriminator in quality pipelines (random strings ≈ 4+
    bits, english ≈ 2.5-3).  Each -p·log2(p) term is computed in IEEE
    doubles (identical on both engines), rounded to 9 digits, then
    summed as DECIMAL so shuffle order can't perturb the total — the
    same exact-moment discipline as t1_stat_moments.

    Scale: shuffle-free — each document's histogram comes from sorting
    ITS OWN char array with ``array_sort`` and diffing run boundaries,
    all inside one projection over the scan (zero extra rows, no
    exchange anywhere).  An earlier explode + groupBy(doc_id, ch) +
    join-back formulation moved ×n_chars rows through two exchanges and
    ran ~2× slower at sf0.1.  Decimal terms fold in array order — exact,
    so the sum can't drift with evaluation order."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    # sorted char array → run-length boundaries → per-char counts, no explode
    chars = F.array_sort(
        F.filter(F.split(F.lower("text"), ""), lambda x: x != F.lit(""))
    )
    d = d.select("doc_id", chars.alias("cs")).withColumn(
        "total", F.size("cs").cast("double")
    )
    # positions where a new run starts (1-indexed), plus the end sentinel
    starts = F.filter(
        F.transform(
            F.col("cs"),
            lambda x, i: F.when(
                (i == 0) | (x != F.col("cs")[i - 1]), i + 1
            ).otherwise(F.lit(None)),
        ),
        lambda x: x.isNotNull(),
    )
    d = d.withColumn("starts", F.concat(starts, F.array(F.size("cs") + 1)))
    # run lengths = consecutive diffs of starts; each → one -p·log2(p) term
    terms = F.transform(
        F.slice(F.col("starts"), 1, F.size("starts") - 1),
        lambda s, i: F.round(
            -((F.col("starts")[i + 1] - s) / F.col("total"))
            * F.log2((F.col("starts")[i + 1] - s) / F.col("total")),
            9,
        ).cast("decimal(18,9)"),
    )
    return d.select(
        "doc_id",
        F.round(
            F.aggregate(
                terms,
                F.lit(None).cast("decimal(28,9)"),
                lambda acc, t: F.coalesce(acc + t, t, acc).cast("decimal(28,9)"),
            ).cast("double"),
            6,
        ).alias("entropy"),
    )


@register(
    "t1_unigram_surprisal",
    oracle="""
    WITH t AS (SELECT doc_id,
                      list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                  x -> x <> '') AS toks
               FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    u AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
    n AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM u),
    term AS (SELECT tok.doc_id,
                    CAST(round(-log2(CAST(u.cnt AS DOUBLE)
                                       / (SELECT total FROM n)), 9)
                         AS DECIMAL(18,9)) AS s
             FROM tok JOIN u ON tok.tok = u.tok)
    SELECT doc_id,
           CAST(count(*) AS INTEGER) AS n_toks,
           round(CAST(sum(s) AS DOUBLE) / count(*), 6) AS avg_surprisal
    FROM term GROUP BY doc_id
    """,
)
def t1_unigram_surprisal(spark, sf_dir):
    """Unigram LM surprisal per document — the perplexity-filter proxy
    quality pipelines use (documents whose tokens are improbable under
    the corpus unigram distribution are outliers: gibberish, wrong
    language, boilerplate).  avg_surprisal = mean over tokens of
    -log2 p(tok), p from corpus counts; per-token terms are rounded to
    9 digits and summed as DECIMAL so shuffle order can't perturb the
    mean (the char-entropy discipline).

    Scale: the unigram table is vocabulary-sized → broadcast join onto
    the exploded token stream; corpus total rides as a 1-row broadcast.
    One count shuffle builds the LM, one doc_id shuffle aggregates
    surprisal — a real n-gram LM scorer swaps the broadcast table for a
    bigger one, the plan shape is identical."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    tok = d.select("doc_id", F.explode(toks).alias("tok"))
    u = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    n = u.agg(F.sum("cnt").cast("bigint").alias("total"))
    term = (
        tok.join(F.broadcast(u), "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.round(
                -F.log2(F.col("cnt").cast("double") / F.col("total")), 9
            )
            .cast("decimal(18,9)")
            .alias("s"),
        )
    )
    return term.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_toks"),
        F.round(
            F.sum("s").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_surprisal"),
    )


@register(
    "t1_bigram_surprisal",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\s+'),
                           x -> x <> '') AS toks
        FROM documents
    ),
    bg AS (
        SELECT doc_id,
               unnest(CASE WHEN len(toks) >= 2
                           THEN list_transform(range(1, len(toks)),
                                               i -> toks[i] || ' ' || toks[i+1])
                           ELSE [] END) AS bigram
        FROM t
    ),
    c2 AS (SELECT bigram, count(*) AS n2 FROM bg GROUP BY 1),
    c1 AS (SELECT split_part(bigram, ' ', 1) AS w1, count(*) AS n1
           FROM bg GROUP BY 1),
    term AS (
        SELECT bg.doc_id,
               CAST(round(-log2(CAST(c2.n2 AS DOUBLE)
                                / CAST(c1.n1 AS DOUBLE)), 9)
                    AS DECIMAL(28,9)) AS s
        FROM bg
        JOIN c2 USING (bigram)
        JOIN c1 ON split_part(bg.bigram, ' ', 1) = c1.w1
    )
    SELECT doc_id, count(*) AS n_bigrams,
           round(CAST(sum(s) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS avg_bigram_surprisal
    FROM term GROUP BY doc_id
    """,
)
def t1_bigram_surprisal(spark, sf_dir):
    """Bigram-LM surprisal per document — one Markov order above
    t1_unigram_surprisal: mean −log2 p(w_i | w_{i−1}) under the corpus
    MLE bigram model (p = c(w1w2)/c(w1·), both counts from the same
    bigram stream, so every probability is well-defined and ≤ 1).
    Catches locally-improbable token SEQUENCES (shuffled text, spam
    keyword stuffing) that unigram frequencies score as normal.
    Per-term surprisals are rounded to 9 digits and summed as DECIMAL
    (the char-entropy discipline); docs with <2 tokens have no bigrams
    and drop out on both engines.

    Scale: bigrams come from slice+array_join over a materialized token
    array (never n× element_at re-tokenization — see ws_shingles);
    the model tables are vocabulary²-bounded → broadcast joins onto the
    exploded stream; one doc_id shuffle aggregates.  A trillion-token
    corpus swaps the broadcasts for shuffle joins on the bigram key —
    same plan shape."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    td = d.select("doc_id", toks.alias("toks"))
    grams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.array_join(F.slice("toks", i, 2), " "),
        ),
    ).otherwise(F.array())
    bg = td.select("doc_id", F.explode(grams).alias("bigram"))
    c2 = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("n2"))
    c1 = bg.groupBy(
        F.substring_index("bigram", " ", 1).alias("w1")
    ).agg(F.count(F.lit(1)).alias("n1"))
    term = (
        bg.join(F.broadcast(c2), "bigram")
        .join(
            F.broadcast(c1),
            F.substring_index(F.col("bigram"), " ", 1) == F.col("w1"),
        )
        .select(
            "doc_id",
            F.round(
                -F.log2(F.col("n2").cast("double") / F.col("n1").cast("double")),
                9,
            )
            .cast("decimal(28,9)")
            .alias("s"),
        )
    )
    return term.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.sum("s").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("avg_bigram_surprisal"),
    )
