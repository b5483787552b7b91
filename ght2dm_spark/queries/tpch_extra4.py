"""TPC-H Q2/Q8/Q15/Q18/Q20/Q22 shapes, adapted to the testdata schema
(no ``partsupp`` table — the part↔supplier relation is derived as
``SELECT DISTINCT l_partkey, l_suppkey FROM lineitem``; no ``c_phone`` —
Q22's "dormant customer" predicate becomes *no orders since 2000*).

These round out the decorrelated-subquery plan space: min-per-group
correlated scalar (Q2), ratio-of-conditional-sums over a 6-way join
(Q8), view + scalar MAX (Q15), IN-aggregate semi join (Q18), nested
HAVING semi join (Q20), NOT-EXISTS anti join + scalar AVG (Q22).

Scale notes (100 TB): every small-dim join (nation/region/supplier/
part/customer) is an explicit ``broadcast()``; the only big-big shuffle
in each query is the single lineitem↔orders hash join on orderkey, and
aggregates run partial→final.  Scalar subqueries (max revenue, avg
acctbal) reduce to a 1-row broadcast cross join — never a driver
``collect()`` round-trip.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.queries.registry import register

_DEC_REV = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)


def _rev_col() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )


@register(
    "q2_min_acctbal_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
        SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal
        FROM part p
        JOIN ps ON ps.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        WHERE p.p_size = 15 AND p.p_type = 'ECONOMY')
    SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal
    FROM cand c
    WHERE s_acctbal = (SELECT min(s_acctbal) FROM cand c2
                       WHERE c2.p_partkey = c.p_partkey)
    """,
)
def q2_min_acctbal_supplier(spark, sf_dir):
    """TPC-H Q2 shape: correlated MIN scalar subquery — for each selected
    part, the supplier(s) with minimum account balance among those who
    shipped it.  Decorrelation: one window-min over the candidate set and
    an equality filter (single shuffle on p_partkey), instead of a
    per-row subquery re-scan (reference executes the subquery per outer
    row).  acctbal passes through unarithmeticked, so double equality is
    exact on both engines."""
    from pyspark.sql import Window

    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY"))
        .select("p_partkey", "p_name")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    cand = ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey).join(
        F.broadcast(s), F.col("l_suppkey") == s.s_suppkey
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("_min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("_min_bal"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
    )


@register(
    "q8_market_share",
    oracle=f"""
    WITH vol AS (
        SELECT year(o.o_orderdate) AS o_year,
               {_DEC_REV} AS volume,
               sn.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN region r ON cn.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        WHERE r.r_name = 'ASIA')
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_5 suppliers' share of ASIA-customer revenue
    per order year.  Six joins: nation/region/supplier are true dims and
    broadcast explicitly; the region-filtered customer key set is joined
    WITHOUT a hint — at 100 TB it is ~1/5 of all customers (too big to
    force-broadcast), so AQE picks broadcast when it fits and
    shuffle-hash when it doesn't.  lineitem↔orders is the one guaranteed
    big-big shuffle (orderkey).  The share is a conditional-sum ratio in
    ONE aggregate pass — never two scans.  Sums in DECIMAL, divide as
    double, round(6) at output."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")

    cust_in_region = (
        c.join(
            F.broadcast(n.select("n_nationkey", "n_regionkey")),
            c.c_nationkey == F.col("n_nationkey"),
        )
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("c_custkey")
    )
    supp_nation = s.join(
        F.broadcast(n.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")

    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust_in_region, o.o_custkey == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _rev_col().alias("volume"),
            "supp_nation",
        )
    )
    agg = vol.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
                F.lit(0).cast("decimal(18,4)")
            )
        ).alias("_nat"),
        F.sum("volume").alias("_tot"),
    )
    return agg.select(
        "o_year",
        F.round(
            F.col("_nat").cast("double") / F.col("_tot").cast("double"), 6
        ).alias("mkt_share"),
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no, sum({_DEC_REV}) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: revenue "view" per supplier for a quarter, then the
    supplier(s) hitting the global max.  The view materializes once
    (cached local to the plan via self-reuse); the scalar MAX is a 1-row
    broadcast cross join — no driver round-trip, no second lineitem
    scan at the same SF (AQE reuses the shuffle).  Revenue compared in
    DECIMAL (exact), cast to double only in the output."""
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev_col()).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("_mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > CAST(300 AS DECIMAL(18,2)))
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18: orders whose total quantity exceeds 300, with customer.
    The IN-aggregate subquery is a semi join against a pre-aggregated
    keys frame; the qualifying key set is tiny, so BOTH big tables
    (lineitem and orders) are broadcast-semi-filtered by it before they
    meet — the final join touches only qualifying rows.  At 100 TB the
    HAVING aggregate is the only full-lineitem shuffle; broadcasting
    unfiltered orders would be a scale bug."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_q"))
        .filter(F.col("_q") > F.lit(300).cast("decimal(18,2)"))
        .select("l_orderkey")
    )
    li_big = li.join(
        F.broadcast(big.withColumnRenamed("l_orderkey", "_bk")),
        li.l_orderkey == F.col("_bk"),
        "left_semi",
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    o_big = o.join(
        F.broadcast(big.withColumnRenamed("l_orderkey", "_bk")),
        o.o_orderkey == F.col("_bk"),
        "left_semi",
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li_big.join(F.broadcast(o_big.join(F.broadcast(c), o.o_custkey == c.c_custkey)),
                    F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty")
        )
    )


@register(
    "q20_promo_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_type = 'PROMO'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_suppkey
        HAVING sum(CAST(l.l_quantity AS DECIMAL(18,2))) > CAST(100 AS DECIMAL(18,2)))
    """,
)
def q20_promo_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (adapted — no partsupp): suppliers who shipped
    more than 100 units of PROMO parts in 1997.  Nested aggregate-HAVING
    subquery → inner groupBy then LEFT SEMI join; part is a broadcast
    dim inside the subquery, and the semi join probes supplier with the
    small qualifying set."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    qual = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_q"))
        .filter(F.col("_q") > F.lit(100).cast("decimal(18,2)"))
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return s.join(
        F.broadcast(qual), s.s_suppkey == F.col("l_suppkey"), "left_semi"
    )


@register(
    "q22_dormant_customers",
    oracle="""
    WITH thr AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS avg_bal
        FROM customer WHERE c_acctbal > 0)
    SELECT n.n_name AS nation, count(*) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey, thr
    WHERE c.c_acctbal > thr.avg_bal
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY n.n_name
    """,
)
def q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape (adapted — dormancy = no orders since 2000, since
    every testdata customer has *some* order): above-average-balance
    customers with no recent orders, counted per nation.  The scalar AVG
    is sum/count over exact DECIMAL (identical across engines — a double
    AVG would be accumulation-order dependent and could flip boundary
    rows); NOT EXISTS is a LEFT ANTI join with the date filter pushed
    below it; nation broadcasts."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    thr = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_bal")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
        )
        .select("o_custkey")
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    rich = c.crossJoin(F.broadcast(thr)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    dormant = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return (
        dormant.join(F.broadcast(n), dormant.c_nationkey == n.n_nationkey)
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )
