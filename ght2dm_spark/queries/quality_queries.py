"""Data-quality queries: corrupt-record routing for semi-structured
input (the E1 fail-and-continue semantics applied to JSON parsing).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.queries.registry import register


@register(
    "t1_corrupt_json_routing",
    oracle="""
    WITH raw AS (
        SELECT event_id,
               CASE WHEN event_id % 7 = 0 THEN '}{' || props ELSE props END AS props
        FROM events
    )
    SELECT event_id,
           CASE WHEN json_valid(props) THEN 'good' ELSE 'reject' END AS route,
           CASE WHEN json_valid(props)
                THEN json_extract_string(props, '$.k') END AS k_val
    FROM raw
    """,
)
def t1_corrupt_json_routing(spark, sf_dir):
    """Corrupt-record routing (E1 for semi-structured data): every 7th
    props string is prefix-mangled (Spark's PERMISSIVE from_json tolerates
    trailing garbage after a valid prefix, so the corruption must break
    the front); from_json yields NULL for unparseable input,
    which routes the row to the rejects branch instead of failing the
    job — the declarative analog of badRecordsPath.  Bad rows keep their
    key so they can be quarantined and replayed."""
    ev = load_table(spark, sf_dir, "events")
    mangled = F.when(
        F.col("event_id") % 7 == 0, F.concat(F.lit("}{"), "props")
    ).otherwise(F.col("props"))
    parsed = F.from_json(mangled, "map<string,string>")
    return ev.select(
        "event_id",
        F.when(parsed.isNotNull(), F.lit("good")).otherwise(F.lit("reject")).alias(
            "route"
        ),
        F.element_at(parsed, "k").alias("k_val"),
    )


@register(
    "t1_dq_rules",
    oracle="""
    WITH t AS (SELECT count(*) AS n,
                      count(*) FILTER (lang IS NULL) AS r_notnull,
                      count(*) - count(DISTINCT doc_id) AS r_unique,
                      count(*) FILTER (lang IS NOT NULL AND lang NOT IN
                        ('en', 'de', 'es', 'fr', 'zh')) AS r_accepted,
                      count(*) FILTER (n_chars < 1 OR n_chars > 100000)
                        AS r_range,
                      count(*) FILTER (length(text) <> n_chars)
                        AS r_consistent
               FROM documents)
    SELECT rule, CAST(n_violations AS BIGINT) AS n_violations,
           round(CAST(n_violations AS DOUBLE) / n, 6) AS violation_rate
    FROM t UNPIVOT (n_violations FOR rule IN
      (r_notnull AS 'lang_not_null', r_unique AS 'doc_id_unique',
       r_accepted AS 'lang_accepted_values', r_range AS 'n_chars_range',
       r_consistent AS 'n_chars_consistent'))
    """,
)
def t1_dq_rules(spark, sf_dir):
    """Declarative data-quality rule evaluation (the dbt-test /
    Deequ-check shape): not-null, key-uniqueness, accepted-values,
    value-range, and cross-column consistency rules over documents,
    all evaluated in ONE scan as conditional aggregates, then unpivoted
    to a (rule, violations, rate) report.

    Scale: N rules cost one pass regardless of N — the anti-pattern is
    one job per rule (N scans).  Uniqueness is the only rule needing a
    shuffle (count distinct); everything else is map-side.  Zero
    violations still emit a row, so silent rule drop-out is visible."""
    d = load_table(spark, sf_dir, "documents")
    t = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("lang").isNull()).alias("lang_not_null"),
        (F.count(F.lit(1)) - F.countDistinct("doc_id")).alias(
            "doc_id_unique"
        ),
        F.count_if(
            F.col("lang").isNotNull()
            & ~F.col("lang").isin("en", "de", "es", "fr", "zh")
        ).alias("lang_accepted_values"),
        F.count_if(
            (F.col("n_chars") < 1) | (F.col("n_chars") > 100000)
        ).alias("n_chars_range"),
        F.count_if(F.length("text") != F.col("n_chars")).alias(
            "n_chars_consistent"
        ),
    )
    rules = [
        "lang_not_null",
        "doc_id_unique",
        "lang_accepted_values",
        "n_chars_range",
        "n_chars_consistent",
    ]
    long = t.unpivot(
        ["n"], rules, "rule", "n_violations"
    )
    return long.select(
        "rule",
        F.col("n_violations").cast("bigint").alias("n_violations"),
        F.round(
            F.col("n_violations").cast("double") / F.col("n"), 6
        ).alias("violation_rate"),
    )


@register(
    "t1_wet_roundtrip",
    oracle="""
    WITH d AS (
        SELECT 'https://corpus.example/' || CAST(doc_id AS VARCHAR) AS uri,
               COALESCE(text, '') AS text,
               doc_id % 7 AS bucket
        FROM documents
    )
    SELECT bucket,
           count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS sum_chars,
           CAST(sum(CAST(('0x' || substr(md5(uri || chr(0) || text), 1, 8))
                    AS BIGINT)) AS BIGINT) AS checksum
    FROM d GROUP BY bucket
    """,
)
def t1_wet_roundtrip(spark, sf_dir):
    """WARC/WET ingestion proven by byte accounting: the documents
    table is written out as real WET files (sources/warc.write_wet —
    executor-side, one gzip-member-per-record like a crawl), read back
    through the WET source (binaryFile → mapInPandas record splitter
    with corrupt routing), and the round trip is audited per doc_id
    bucket with counts, character totals, and an order-insensitive
    md5 checksum over (uri, text) pairs.  The oracle computes the same
    from the documents table directly — a hash match proves the
    writer's framing and the reader's parsing preserve every byte.

    Scale: one whole file per task in both directions (file count =
    parallelism, the crawl-segment shape); the parser is an
    Arrow-batched narrow map, no shuffle until the final bucket
    aggregate."""
    import shutil
    import tempfile

    from ght2dm_spark.sources.warc import read_wet, write_wet

    docs = load_table(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("https://corpus.example/"), F.col("doc_id").cast("string")
        ).alias("uri"),
        F.lit("2024-01-01T00:00:00Z").alias("date"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
    )
    root = tempfile.mkdtemp(prefix="ght2dm-wetq-")
    try:
        write_wet(docs, root, n_files=4).collect()  # the write action
        back = read_wet(spark, root).filter(F.col("warc_type") == "conversion")
        h = F.conv(
            F.substring(
                F.md5(F.concat("target_uri", F.lit("\x00"), "text")), 1, 8
            ),
            16,
            10,
        ).cast("long")
        out = (
            back.select(
                (
                    F.element_at(F.split("target_uri", "/"), -1).cast("long")
                    % 7
                ).alias("bucket"),
                F.length("text").alias("len"),
                h.alias("h"),
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("len").alias("sum_chars"),
                F.sum("h").alias("checksum"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out
