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
