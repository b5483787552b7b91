"""Additional TPC-H-shaped queries widening the relational surface:
outer-join aggregation (Q13), scalar-subquery-per-group join (Q17),
EXISTS semi join with a date band (Q4), and the JSON-map + pandas-UDF
scalar surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ght2dm_spark.io import load_table
from ght2dm_spark.queries.registry import register


@register(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS with a correlated inequality → left_semi
    join on the equi key with the inequality as join condition (stays a
    hash join; only the equi part shuffles)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate > orders.o_orderdate)
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: LEFT OUTER join with an extra join-side predicate
    (NOT a post-filter — customers with only urgent orders must count 0),
    two-level aggregation.  count(col) counts non-NULLs, preserving the
    outer-join zero-groups."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    cond = (cust.c_custkey == orders.o_custkey) & (
        orders.o_orderpriority != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q17_small_quantity",
    oracle="""
    SELECT l.l_partkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n_small
    FROM lineitem l
    JOIN (SELECT l_partkey, 0.5 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                                   / count(*)) AS half_avg
          FROM lineitem GROUP BY l_partkey) a
      ON l.l_partkey = a.l_partkey
    WHERE l.l_quantity < a.half_avg
    GROUP BY l.l_partkey
    """,
)
def q17_small_quantity(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery (per-part average)
    decorrelated into an aggregate + self-join.  The per-part aggregate is
    small (one row per part) and broadcasts; lineitem never shuffles.
    The threshold avg is computed DECIMAL-exactly then divided as double
    on both sides so the < comparison is bit-identical."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_q = li.groupBy("l_partkey").agg(
        (
            F.lit(0.5)
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("half_avg")
    )
    return (
        li.join(F.broadcast(avg_q), "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@register(
    "t1_json_map",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
           json_extract_string(props, '$.k') AS k_val
    FROM events
    """,
)
def t1_json_map(spark, sf_dir):
    """JSON-in-string → MapType via from_json (SURVEY §1.2's events.props
    mapping), then map_keys/element_at — the map-function surface."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "k").alias("k_val"),
    )


@register(
    "t1_pandas_udf_scalar",
    oracle="""
    SELECT doc_id,
           length(text) * 2 + 1 AS affine_len,
           round(sqrt(CAST(n_chars AS DOUBLE)), 6) AS root_chars
    FROM documents
    """,
)
def t1_pandas_udf_scalar(spark, sf_dir):
    """Vectorized @pandas_udf scalar (Arrow-batched, the sanctioned way
    to run Python in a hot path — ~10-100× over row-at-a-time UDFs).
    Kept off built-in-expressible logic in production; here the logic is
    deliberately trivial so the oracle can verify the plumbing exactly."""

    @pandas_udf("long")
    def affine_len(s: pd.Series) -> pd.Series:
        return s.str.len() * 2 + 1

    @pandas_udf("double")
    def root(s: pd.Series) -> pd.Series:
        return s.astype("float64").pow(0.5)

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        affine_len("text").alias("affine_len"),
        F.round(root("n_chars"), 6).alias("root_chars"),
    )
