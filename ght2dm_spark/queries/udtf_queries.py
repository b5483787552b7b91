"""Remaining relational/API surface: FULL OUTER join and the PySpark 4
Python UDTF (user-defined TABLE function) with a correlated LATERAL
join.

The UDTF is the one row-expanding extension point the engine exposes
beyond explode/posexplode and mapInPandas; it is a Python-side path, so
production uses it only where a lateral expansion genuinely needs
imperative logic — here the logic (whitespace split with positions) is
deliberately SQL-mirrorable so the plumbing is oracle-checked exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.queries.registry import register


@register(
    "t1_full_outer_join",
    oracle="""
    WITH big AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000),
    o AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey)
    SELECT coalesce(big.c_custkey, o.o_custkey) AS custkey,
           round(big.c_acctbal, 2) AS acctbal,
           o.n_orders,
           (big.c_custkey IS NULL) AS only_orders,
           (o.o_custkey IS NULL) AS only_customer
    FROM big FULL OUTER JOIN o ON big.c_custkey = o.o_custkey
    """,
)
def t1_full_outer_join(spark, sf_dir):
    """FULL OUTER join with coalesced key and side indicators — the
    reconciliation shape (which keys exist only on either side).  At
    scale a full outer can't broadcast (both sides must shuffle: every
    unmatched row of BOTH sides survives) — it plans as a sort-merge
    join on the key, which is exactly right; the selective side is
    filtered before the join so the shuffle carries only survivors."""
    big = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", "c_acctbal")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    j = big.join(o, big.c_custkey == o.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.round("c_acctbal", 2).alias("acctbal"),
        "n_orders",
        F.col("c_custkey").isNull().alias("only_orders"),
        F.col("o_custkey").isNull().alias("only_customer"),
    )


@register(
    "t1_python_udtf",
    oracle="""
    WITH p AS (SELECT doc_id, string_split(text, ' ') AS parts
               FROM documents WHERE doc_id <= 50)
    SELECT doc_id,
           CAST(unnest(generate_series(1, len(parts))) - 1 AS INTEGER) AS idx,
           unnest(parts) AS word
    FROM p
    """,
)
def t1_python_udtf(spark, sf_dir):
    """Python UDTF (PySpark 4): a class-based table function lateral-
    joined per input row — SELECT ... FROM docs, LATERAL split_words(
    text).  Splits on single spaces (string_split semantics, empties
    kept) with output positions; the DuckDB oracle zips parallel
    unnests of the parts and their subscripts.

    Python-side path: rows cross the JVM↔Python boundary, so the demo
    bounds input (doc_id ≤ 50).  The built-in equivalent
    (posexplode(split(...))) is the 100 TB hot path; the UDTF exists
    for lateral expansions that genuinely need imperative logic."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="idx: int, word: string")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                yield i, w

    spark.udtf.register("split_words", SplitWords)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") <= 50
    ).createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.idx, s.word
        FROM __udtf_docs d, LATERAL split_words(d.text) s
        """
    )
