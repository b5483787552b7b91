"""Z-order layout key as a checked query: the Morton-interleave
computation behind ``operators.layout.zorder_layout`` (multi-dim file
clustering for manifest min/max pruning — see ``snapshots.py``), run
over ``orders`` and summarized per z-range bucket.

The point the result demonstrates: bucketing by the TOP bits of the
interleaved key yields buckets whose (custkey, orderkey) min/max
rectangles are NARROW IN BOTH dimensions — exactly why z-ordered files
prune on either column, where a lexicographic (custkey, orderkey) sort
would give orderkey ranges spanning the whole table.  The same
expression text (shift/mask arithmetic, dialect-formatted) runs in
Spark and DuckDB, so the oracle checks the bit math itself.

Reference scope: the reference relies on PostgreSQL btree indexes for
selective access (``/root/reference/db/schema.sql``); z-order + footer
stats is the columnar-file equivalent of multi-column selectivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.operators.layout import zorder_sql
from ght2dm_spark.queries.registry import register

_COLS = ["o_custkey", "o_orderkey"]


def _zorder_oracle() -> str:
    z = zorder_sql(_COLS, "({x} << {n})")
    # bucket by z >> 20 (not a fixed top nibble): which z bits vary
    # depends on the key magnitude at a given SF, and the demo needs
    # buckets that actually split the keyspace at every test SF
    return f"""
    SELECT ({z}) >> 20 AS z_bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(o_custkey) AS min_cust, max(o_custkey) AS max_cust,
           min(o_orderkey) AS min_order, max(o_orderkey) AS max_order
    FROM orders
    GROUP BY 1
    """


@register("t1_zorder_cluster", oracle=_zorder_oracle())
def t1_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key over (o_custkey, o_orderkey) low-16 bits, bucketed by
    ``z >> 20``; per-bucket row count and per-dimension min/max (narrow
    in BOTH dimensions — the property that makes z-ordered files prune
    on either column).  Pure built-in bitwise expressions — one shuffle
    (the groupBy), whole-stage codegen throughout."""
    orders = load_table(spark, sf_dir, "orders")
    z = F.expr(zorder_sql(_COLS, "shiftleft({x}, {n})"))
    return (
        orders.withColumn("z_bucket", F.shiftright(z, 20))
        .groupBy("z_bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_custkey").alias("min_cust"),
            F.max("o_custkey").alias("max_cust"),
            F.min("o_orderkey").alias("min_order"),
            F.max("o_orderkey").alias("max_order"),
        )
    )
