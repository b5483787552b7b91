"""The end-to-end corpus-build pipeline as ONE declared query: quality
filter → canonical exact-dedup → PII scrub → overlapping chunking →
per-language manifest.

This is the flagship composition for the training-data use case — each
stage is an operator already oracle-checked in isolation
(t1_text_quality, t1_dedup_keep_canonical, t1_pii_scrub,
t1_doc_chunking); here the whole chain is checked end-to-end, because
stage composition is where column-pruning/pushdown bugs hide.  The
result is a compact manifest (per-lang doc/chunk counts + an
order-insensitive checksum over chunk hashes), so the oracle pins every
chunk byte without shipping chunk text.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.operators.neardup import hex2int_sql
from ght2dm_spark.queries.registry import register

# Stage parameters IMPORTED from the stage modules, not re-declared:
# this query's contract is "equals the composition of the stages", and a
# locally-copied _STRIDE or _EMAIL_RE would silently desynchronize the
# flagship from t1_doc_chunking / t1_pii_scrub while every per-stage
# oracle kept passing.
from ght2dm_spark.queries.chunking_queries import _CHUNK, _STRIDE
from ght2dm_spark.queries.pipeline_queries import _EMAIL_RE

_MIN_CHARS = 60


@register(
    "t1_corpus_build_pipeline",
    oracle=f"""
    WITH q AS (SELECT doc_id, lang, text FROM documents
               WHERE n_chars >= {_MIN_CHARS}),
    d AS (SELECT doc_id, lang, text FROM (
            SELECT doc_id, lang, text,
                   row_number() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) AS rn
            FROM q) t
          WHERE rn = 1),
    s AS (SELECT doc_id, lang,
                 regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g')
                   AS text
          FROM d),
    tk AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM s),
    ch AS (SELECT doc_id, lang,
                  md5(array_to_string(
                        toks[start + 1 : start + {_CHUNK}], ' ')) AS chunk_md5
           FROM (SELECT doc_id, lang, toks,
                        unnest(generate_series(
                          0, CAST(floor((len(toks) - 1) / {_STRIDE}) AS BIGINT)
                               * {_STRIDE}, {_STRIDE})) AS start
                 FROM tk) t)
    SELECT lang,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_chunks,
           CAST(sum({hex2int_sql("chunk_md5", 1, 8)}) AS BIGINT) AS checksum
    FROM ch GROUP BY lang
    """,
)
def t1_corpus_build_pipeline(spark, sf_dir):
    """Corpus build, fused: the four curation stages compose into one
    Spark job — Catalyst prunes text early for dropped docs, the dedup
    window is the only shuffle before the final aggregate, and chunking
    stays a narrow map.  Checksum = sum of each chunk-md5's first 8 hex
    digits as int — order-insensitive (sum is commutative over exact
    longs), so any byte drift in any stage flips it.

    Scale: filter pushes to the scan; dedup shuffles on md5(text)
    (uniform); scrub+chunk are shuffle-free; the manifest aggregation
    moves |langs| rows.  The full corpus never materializes between
    stages — one pipeline, no intermediate writes."""
    q = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") >= _MIN_CHARS
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    d = (
        q.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "text")
    )
    s = d.select(
        "doc_id",
        "lang",
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>").alias("text"),
    )
    tk = s.select("doc_id", "lang", F.split("text", " ").alias("toks"))
    last_start = (
        F.floor((F.size(F.col("toks")) - 1) / _STRIDE) * _STRIDE
    ).cast("long")
    ch = tk.select(
        "doc_id",
        "lang",
        F.explode(
            F.sequence(F.lit(0).cast("long"), last_start, F.lit(_STRIDE))
        ).alias("start"),
        "toks",
    ).select(
        "doc_id",
        "lang",
        F.md5(
            F.array_join(F.slice(F.col("toks"), F.col("start") + 1, _CHUNK), " ")
        ).alias("chunk_md5"),
    )
    return ch.groupBy("lang").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.conv(F.substring("chunk_md5", 1, 8), 16, 10).cast("long")).alias(
            "checksum"
        ),
    )
