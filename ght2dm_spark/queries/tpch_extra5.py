"""TPC-H Q9/Q11/Q16/Q21 shapes, adapted to the testdata schema.

Adaptations (same policy as tpch_extra4 — no ``partsupp``, no
``l_commitdate``/``l_receiptdate``):

- Q9  "product type profit": supply cost := ``l_quantity * p_retailprice``
  (the only per-part cost column available).
- Q11 "important stock": inventory value := revenue per part from a
  single nation's suppliers; threshold = 0.1% of the group total.
- Q16 "parts/supplier relationship": part↔supplier pairs derived as
  ``SELECT DISTINCT l_partkey, l_suppkey FROM lineitem``; the
  "customer complaints" supplier exclusion becomes ``s_acctbal < 2000``.
- Q21 "suppliers who kept orders waiting": lateness :=
  ``l_shipdate > o_orderdate + INTERVAL 90 DAY`` (no receipt/commit
  dates in the testdata).

These complete the TPC-H plan-shape inventory: multi-dim star join with
arithmetic on fact columns (Q9), group-HAVING against a scalar global
aggregate (Q11), anti-join + count-distinct rollup (Q16), and the
double-correlated EXISTS / NOT EXISTS on the SAME fact table (Q21) —
decorrelated here into one per-order aggregate instead of two
re-scans of lineitem per outer row.

Scale notes (100 TB): every query's only big-big shuffle is
lineitem↔orders on orderkey; Q21's EXISTS/NOT-EXISTS pair reuses that
join's partitioning for the per-order aggregate AND the probe-back join
(three operators, one exchange).  Dims broadcast explicitly; aggregates
run partial→final; scalar thresholds (Q11) are 1-row broadcast cross
joins, never a driver collect.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.queries.registry import register

_DEC_REV = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)

_DEC_COST = "CAST(l_quantity AS DECIMAL(18,2)) * CAST(p_retailprice AS DECIMAL(18,2))"


def _rev_col() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )


def _cost_col() -> F.Column:
    return F.col("l_quantity").cast("decimal(18,2)") * F.col("p_retailprice").cast(
        "decimal(18,2)"
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT sn.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(sum({_DEC_REV} - {_DEC_COST}) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY sn.n_name, year(o.o_orderdate)
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit on 'widget' parts by supplier nation and
    order year (reference: queries/tpch/q09 — per-part supply cost there
    comes from partsupp; here from p_retailprice).  part is filtered THEN
    broadcast (never the full dim), supplier⋈nation pre-joins to a
    10²-row broadcast map, and lineitem⋈orders is the single big
    shuffle.  Profit accumulates in DECIMAL (exact — a double sum would
    be accumulation-order dependent across engines) and casts to double
    at output."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    sn = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sn), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(_rev_col() - _cost_col()).cast("double").alias("profit")
        )
    )


@register(
    "q11_important_parts",
    oracle=f"""
    WITH nat_supp AS (
        SELECT s_suppkey FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name IN ('NATION_3', 'NATION_7', 'NATION_11')),
    val AS (
        SELECT l.l_partkey, sum({_DEC_COST}) AS v
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_suppkey IN (SELECT s_suppkey FROM nat_supp)
        GROUP BY l.l_partkey)
    SELECT l_partkey AS p_partkey, CAST(v AS DOUBLE) AS part_value
    FROM val
    WHERE CAST(v AS DOUBLE) > (SELECT CAST(sum(v) AS DOUBLE) FROM val) * 0.001
    """,
)
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: parts whose shipped value (qty × retailprice)
    from three nations' suppliers exceeds 0.1% of the total.  The HAVING
    threshold is a scalar over the SAME aggregate — Spark reuses the
    grouped frame for both the total and the filter (AQE exchange
    reuse), and the 1-row total broadcasts into a cross join, never a
    driver collect.  Values sum in DECIMAL; the >-compare runs in double
    on both engines (identical operands → identical result) so decimal
    division-scale rules never enter."""
    nat_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11")
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    val = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey")
        .agg(F.sum(_cost_col()).alias("v"))
    )
    total = val.agg(F.sum("v").cast("double").alias("_tot"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v").cast("double") > F.col("_tot") * F.lit(0.001))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("v").cast("double").alias("part_value"),
        )
    )


@register(
    "q16_supplier_relation",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM ps
    JOIN part p ON ps.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (9, 10, 16, 24, 29)
      AND ps.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_relation(spark, sf_dir):
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    over the derived part↔supplier relation, excluding one brand, a type
    prefix, and "complained-about" suppliers (adapted: acctbal < 2000).
    NOT IN over a provably non-null key column is a LEFT ANTI join (the
    general NOT-IN null-semantics plan would need a null-aware anti
    join); part filters push into the broadcast dim BEFORE the join, so
    the count-distinct shuffle only carries qualifying pairs."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#13")
            & (~F.col("p_type").like("PROMO%"))
            & (F.col("p_size").isin(9, 10, 16, 24, 29))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 2000)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH fl AS (
        SELECT l.l_orderkey, l.l_suppkey,
               CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                    THEN 1 ELSE 0 END AS is_late
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'),
    stats AS (
        SELECT l_orderkey,
               count(DISTINCT l_suppkey) AS nsupp,
               count(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS nlate
        FROM fl GROUP BY l_orderkey)
    SELECT s.s_name, count(*) AS numwait
    FROM fl
    JOIN stats t ON fl.l_orderkey = t.l_orderkey
    JOIN supplier s ON s.s_suppkey = fl.l_suppkey
    WHERE fl.is_late = 1 AND t.nsupp > 1 AND t.nlate = 1
    GROUP BY s.s_name
    """,
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    finished multi-supplier order (late := shipped >90 days after order
    date).  The reference's plan runs the correlated EXISTS and NOT
    EXISTS as per-row re-probes of lineitem; here both decorrelate into
    ONE per-order aggregate — nsupp>1 ⇔ EXISTS(other supplier),
    nlate=1 ⇔ NOT EXISTS(other late supplier), given the probe row
    itself is late.  The flagged frame, the aggregate, and the
    probe-back join all hash on l_orderkey, so the whole query costs a
    single lineitem↔orders exchange; supplier broadcasts at the end."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    fl = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).alias("_late"),
    )
    stats = fl.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("nsupp"),
        F.countDistinct(
            F.when(F.col("_late"), F.col("l_suppkey"))
        ).alias("nlate"),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        fl.filter(F.col("_late"))
        .join(
            stats.filter((F.col("nsupp") > 1) & (F.col("nlate") == 1)),
            "l_orderkey",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
