"""Training-data curation shapes: PII scrubbing, language-balanced
resampling, and a stream-static dimension join.

PII redaction and per-class rebalancing are standard steps between raw
crawl and training corpus; both are pure built-in expressions (regexp /
window + hash order) so they run JVM-side at any scale.  The
stream-static join is the streaming-enrichment pattern (fact stream ⋈
bounded dim) driven as a real micro-batch job.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.queries.registry import register
from ght2dm_spark.streaming import read_events_stream, run_to_completion

_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "\\b[0-9]{3}-[0-9]{4}\\b"


@register(
    "t1_pii_scrub",
    oracle=f"""
    WITH inj AS (
      SELECT doc_id,
             text || ' contact_' || CAST(doc_id AS VARCHAR)
                  || '@example.com ph 555-1234' AS raw
      FROM documents),
    s AS (
      SELECT doc_id, raw,
             regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                            '{_PHONE_RE}', '<PHONE>', 'g') AS scrubbed
      FROM inj)
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS INTEGER)
             AS n_emails,
           length(raw) AS len_before, length(scrubbed) AS len_after,
           md5(scrubbed) AS scrubbed_md5
    FROM s
    """,
)
def t1_pii_scrub(spark, sf_dir):
    """PII redaction: replace email/phone patterns with placeholder
    tokens.  A deterministic fake email+phone is first injected per doc
    so the scrub provably fires on every row (the synthetic corpus has
    no organic PII).  The md5 of the scrubbed text pins byte-exact
    replacement semantics across engines; the regexes stay in the
    Java/RE2 common subset.

    Scale: pure narrow map — no shuffle at all; whole-stage codegen
    fuses inject→scrub→hash into one pass over the scan."""
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact_"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ph 555-1234"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(raw, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(raw, F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.length(raw).cast("long").alias("len_before"),
        F.length(scrubbed).cast("long").alias("len_after"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


@register(
    "t1_lang_balance_sample",
    oracle="""
    WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    q AS (SELECT min(n) AS quota FROM counts),
    r AS (SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                   AS rn
          FROM documents)
    SELECT r.doc_id, r.lang FROM r, q WHERE r.rn <= q.quota
    """,
)
def t1_lang_balance_sample(spark, sf_dir):
    """Language-balanced downsampling: every language keeps exactly
    quota = min(per-lang count) docs, chosen by md5-of-id order — a
    deterministic, partitioning-independent uniform draw (same trick as
    t1_hash_sample).  This is the class-rebalancing step of corpus
    construction.

    Scale: one groupBy for counts (tiny), one window shuffle on lang;
    if one language dominates (it always does), the window partition
    skews — production path switches to per-lang hash-threshold
    sampling (keep if md5 < quota/n_lang scaled), which needs no window
    at all; the window form here is the exact-quota variant."""
    d = load_table(spark, sf_dir, "documents")
    quota = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.min("n").alias("quota"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .crossJoin(F.broadcast(quota))
        .filter(F.col("rn") <= F.col("quota"))
        .select("doc_id", "lang")
    )


@register(
    "t1_stream_static_join",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n,
           CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def t1_stream_static_join(spark, sf_dir):
    """Stream-static enrichment join: the events STREAM joins the static
    customer dimension (broadcast — stateless, no stream state), then a
    complete-mode aggregation.  This is the canonical streaming-enrich
    pattern: dim lookups never hold state, only the downstream agg
    does.  Result equals the batch join (same oracle)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    stream = read_events_stream(spark, sf_dir).select("user_id", "value")
    joined = stream.join(
        F.broadcast(cust), stream.user_id == cust.c_custkey
    )
    agg = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
            "total_value"
        ),
    )
    return run_to_completion(agg, output_mode="complete").select(
        "c_mktsegment", "n", "total_value"
    )
