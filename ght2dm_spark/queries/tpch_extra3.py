"""TPC-H Q6/Q12/Q14/Q19 shapes + the SQL front-end surface (temp views
+ spark.sql), rounding out the relational plan diversity: pure
filter-agg, conditional aggregation, ratio-of-sums, OR-of-conjunctions
predicates, and SQL-text queries over registered views.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.queries.registry import register

_DEC_REV = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure scan-filter-aggregate — every predicate pushes into
    the parquet scan, the aggregate is a single partial+final pair with a
    1-row shuffle.  The simplest possible plan; anything more in explain
    output is a regression."""
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * F.col("l_discount").cast("decimal(3,2)")
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q12_shipmode_priority",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-06-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12_shipmode_priority(spark, sf_dir):
    """TPC-H Q12 shape: join + conditional aggregation (CASE inside SUM —
    one pass, no per-branch scans)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-06-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_effect",
    oracle=f"""
    SELECT round(
        100.0 * CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%' THEN {_DEC_REV}
                              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
              / CAST(sum({_DEC_REV}) AS DOUBLE), 6) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q14_promo_effect(spark, sf_dir):
    """TPC-H Q14 shape: ratio of conditional sum to total sum in one
    aggregate (never two scans); part broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    agg = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.sum(promo).alias("_pr"), F.sum(rev).alias("_tr")
    )
    return agg.select(
        F.round(
            100.0 * F.col("_pr").cast("double") / F.col("_tr").cast("double"), 6
        ).alias("promo_revenue_pct")
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT CAST(sum({_DEC_REV}) AS DOUBLE) AS revenue, count(*) AS n
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19 shape: OR of conjunctive brand/size/quantity clauses.
    The join stays a plain equi hash join on partkey (the disjunction is
    a post-join filter — Catalyst additionally derives the common
    quantity/size bounds for partial pushdown); never a nested-loop."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    qty = F.col("l_quantity")
    clause = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & qty.between(20, 30))
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )
    return j.filter(clause).agg(
        F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n")
    )


@register(
    "t1_sql_api",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def t1_sql_api(spark, sf_dir):
    """The SQL front end: tables registered as temp views, query written
    in SQL text, planned by the same Catalyst pipeline as the DataFrame
    API (they are literally the same logical plan) — a reference user's
    SQL runs as-is."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT c.c_mktsegment,
               count(*) AS n_orders,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM v_orders o JOIN v_customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        """
    )


@register(
    "t1_sql_parameterized",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_totalprice >= 150000 AND o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY o_orderpriority
    """,
)
def t1_sql_parameterized(spark, sf_dir):
    """Parameterized SQL (Spark 4 named parameter markers): values bind
    as TYPED literals through `spark.sql(query, args=...)` — never
    string interpolation, so no SQL injection and no accidental type
    coercion; Catalyst constant-folds the bound literals into pushed
    filters exactly like inline ones.

    Scale: identical plan to the inline form — the parquet scan shows
    both predicates in PushedFilters."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_v"
    )
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total
        FROM orders_v
        WHERE o_totalprice >= :min_price AND o_orderdate >= :since
        GROUP BY o_orderpriority
        """,
        args={"min_price": 150000, "since": "1996-01-01 00:00:00"},
    )


@register(
    "t1_union_evolved",
    oracle="""
    SELECT doc_id, lang, NULL AS quality_tier FROM documents
    UNION ALL BY NAME
    SELECT doc_id, lang,
           CASE WHEN n_chars > 300 THEN 'long' ELSE 'short' END
             AS quality_tier
    FROM documents
    """,
)
def t1_union_evolved(spark, sf_dir):
    """Union across schema versions (unionByName with
    allowMissingColumns): an old batch lacking a column unions with a
    new batch that has it — missing fields surface as NULL, matched by
    NAME not position (positional unionAll silently mismatches after
    any column reorder).  The in-flight counterpart of the mergeSchema
    read (tests/test_io_sinks.py)."""
    d = load_table(spark, sf_dir, "documents")
    old = d.select("doc_id", "lang")
    new = d.select(
        "doc_id",
        "lang",
        F.when(F.col("n_chars") > 300, "long")
        .otherwise("short")
        .alias("quality_tier"),
    )
    return old.unionByName(new, allowMissingColumns=True)
