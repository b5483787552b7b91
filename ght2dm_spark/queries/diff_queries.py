"""Snapshot reconciliation (CDC diff): classify every key across two
table versions as added / removed / changed / unchanged — the
change-data-capture shape behind incremental pipeline runs and data-
quality audits (the reference's skip-if-exists probes, F3, are the
degenerate "added-only" case of this).

The "new" snapshot is derived from the old with planted mutations so
the classifier provably exercises all four classes on deterministic
input.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.queries.registry import register


@register(
    "t1_snapshot_diff",
    oracle="""
    WITH old AS (SELECT doc_id, md5(text) AS h FROM documents),
    new AS (
      SELECT doc_id, md5(text || ' edited') AS h
      FROM documents WHERE doc_id % 31 <> 0 AND doc_id % 17 = 0
      UNION ALL
      SELECT doc_id, md5(text) AS h
      FROM documents WHERE doc_id % 31 <> 0 AND doc_id % 17 <> 0
      UNION ALL
      SELECT doc_id + 5000000 AS doc_id, md5(text) AS h
      FROM documents WHERE doc_id % 41 = 0),
    j AS (SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
                 CASE WHEN old.doc_id IS NULL THEN 'added'
                      WHEN new.doc_id IS NULL THEN 'removed'
                      WHEN old.h <> new.h THEN 'changed'
                      ELSE 'unchanged' END AS class
          FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id)
    SELECT class, count(*) AS n,
           min(doc_id) AS min_key, max(doc_id) AS max_key
    FROM j GROUP BY class
    """,
)
def t1_snapshot_diff(spark, sf_dir):
    """CDC diff of two snapshot versions: full outer join on the key,
    row-content hash comparison for change detection, per-class counts
    with key ranges.  Planted mutations (every 31st doc removed, every
    17th edited, every 41st re-added under a new id) light up all four
    classes.

    Scale: both snapshots shuffle once on the key (sort-merge full
    outer — unavoidable: unmatched rows of BOTH sides survive);
    comparing md5 hashes instead of full rows keeps the shuffle rows
    narrow regardless of document size.  Incremental runs
    (io.append-only) consume the added/changed classes."""
    old = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("h")
    )
    base = load_table(spark, sf_dir, "documents")
    kept = base.filter(F.col("doc_id") % 31 != 0)
    new = (
        kept.filter(F.col("doc_id") % 17 == 0)
        .select("doc_id", F.md5(F.concat("text", F.lit(" edited"))).alias("h"))
        .unionByName(
            kept.filter(F.col("doc_id") % 17 != 0).select(
                "doc_id", F.md5("text").alias("h")
            )
        )
        .unionByName(
            base.filter(F.col("doc_id") % 41 == 0).select(
                (F.col("doc_id") + 5_000_000).alias("doc_id"),
                F.md5("text").alias("h"),
            )
        )
    )
    o = old.alias("o")
    n = new.alias("n")
    j = o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full_outer").select(
        F.coalesce("o.doc_id", "n.doc_id").alias("doc_id"),
        F.when(F.col("o.doc_id").isNull(), "added")
        .when(F.col("n.doc_id").isNull(), "removed")
        .when(F.col("o.h") != F.col("n.h"), "changed")
        .otherwise("unchanged")
        .alias("class"),
    )
    return j.groupBy("class").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("min_key"),
        F.max("doc_id").alias("max_key"),
    )
