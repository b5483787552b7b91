"""Curation and windowing follow-ups: quality-weighted sampling, rolling
time-range windows (per-entity, scale-correct), and explode_outer
null-preservation semantics.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

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
        .orderBy(F.unix_micros("ts"))
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
