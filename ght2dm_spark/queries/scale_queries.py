"""Scale-technique and remaining-surface queries: salted skew join,
value-window functions (first/last/nth with explicit frames), regexp
extraction scalars, and per-label embedding centroids via posexplode.

Each demonstrates a 100 TB-relevant physical technique while remaining
exactly oracle-checkable (the salt/replication never changes results;
float work is rounded-then-decimal per the registry discipline).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.operators.joins import salted_join
from ght2dm_spark.queries.registry import register


@register(
    "t1_salted_join",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def t1_salted_join(spark, sf_dir):
    """Skew-resilient fact⋈dim join: the fact side's join key is salted
    into 8 sub-keys and the orders side replicated per salt, spreading
    any hot orderkey over 8 reducers.  The result is row-identical to
    the plain join (same oracle) — salting only reshapes the shuffle.
    At 100 TB this is the fallback when AQE skew splitting can't apply
    (first resort is AQE; see operators/joins.salted_join)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    return (
        salted_join(li, o, "k", n_salt=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
        )
    )


@register(
    "t1_window_first_last",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           first_value(c_name) OVER w AS seg_poorest,
           last_value(c_name) OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal, c_custkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND UNBOUNDED FOLLOWING)
             AS seg_richest,
           nth_value(c_name, 2) OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal, c_custkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND UNBOUNDED FOLLOWING)
             AS seg_second
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def t1_window_first_last(spark, sf_dir):
    """first_value / last_value / nth_value with explicit frames — the
    frame-boundary trap: last_value over the DEFAULT frame (range
    unbounded-preceding..current-row) is just the current row, so the
    whole-partition answer needs an explicit unbounded-following frame.
    Deterministic via the (c_acctbal, c_custkey) total order."""
    order = [F.col("c_acctbal"), F.col("c_custkey")]
    w_default = Window.partitionBy("c_mktsegment").orderBy(*order)
    w_full = w_default.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.first("c_name").over(w_default).alias("seg_poorest"),
        F.last("c_name").over(w_full).alias("seg_richest"),
        F.nth_value("c_name", 2).over(w_full).alias("seg_second"),
    )


@register(
    "t1_regexp_funcs",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]{7,}')) AS n_long_words,
           CASE WHEN len(regexp_extract_all(text, '[a-z]{7,}')) > 0
                THEN regexp_extract_all(text, '[a-z]{7,}')[1] END
             AS first_long_word,
           regexp_matches(text, '[0-9]') AS has_digit
    FROM documents
    """,
)
def t1_regexp_funcs(spark, sf_dir):
    """Regexp scalar surface: extract-all (array result), first match,
    boolean match.  Both engines use the same RE2-compatible pattern
    subset (character classes + bounded repeats) so semantics align;
    patterns stay in JVM codegen on the Spark side — no Python."""
    d = load_table(spark, sf_dir, "documents")
    matches = F.regexp_extract_all("text", F.lit("[a-z]{7,}"), 0)
    return d.select(
        "doc_id",
        F.size(matches).cast("long").alias("n_long_words"),
        F.when(F.size(matches) > 0, F.element_at(matches, 1)).alias(
            "first_long_word"
        ),
        F.col("text").rlike("[0-9]").alias("has_digit"),
    )


@register(
    "t1_embedding_centroid",
    oracle="""
    WITH x AS (
        SELECT label, CAST(i AS INTEGER) AS pos,
               CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS e
        FROM embeddings, range(1, 65) t(i)
    ),
    m AS (SELECT label, pos,
                 CAST(CASE WHEN e >= 0 THEN floor(e * 1000000 + 0.5)
                           ELSE -floor(-e * 1000000 + 0.5) END AS BIGINT) AS vm
          FROM x),
    g AS (SELECT label, pos, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(vm) AS BIGINT) AS s
          FROM m GROUP BY label, pos)
    SELECT label, pos, n,
           CAST(CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n)
                     ELSE -((-2 * s + n) // (2 * n)) END AS DOUBLE) / 1000000.0
             AS centroid_val
    FROM g
    """,
)
def t1_embedding_centroid(spark, sf_dir):
    """Per-label centroid of the 64-dim embedding column: posexplode to
    (label, dim, value), quantize each float32 (exact when widened to
    double) to integer micro-units, sum, divide at the end.  This is the
    k-means/update step and the class-prototype builder for embedding
    pipelines.

    Exactness: quantization AND the final mean are sign-aware half-away
    INTEGER arithmetic, identical in both engines.  The previous form
    rounded the double quotient — Spark's round() expands the double
    exactly (BigDecimal) while DuckDB's multiplies by 1e6 first, and a
    quotient on a .5 boundary (hit at sf0.1) rounds differently.  Sums
    stay in long: |v|·1e6 ≤ ~1e8 per term leaves 10 orders of headroom.

    Scale: posexplode multiplies rows ×64 but each row is 20 bytes; the
    aggregation shuffles |labels|×64 partial rows per task — partial
    aggregation absorbs the blowup map-side."""
    e = load_table(spark, sf_dir, "embeddings")
    vm = F.expr(
        "CAST(CASE WHEN e >= 0D THEN floor(e * 1000000D + 0.5D)"
        " ELSE -floor(-e * 1000000D + 0.5D) END AS BIGINT)"
    )
    exploded = (
        e.select("label", F.posexplode("embedding").alias("pos0", "v"))
        .select(
            "label",
            (F.col("pos0") + 1).cast("int").alias("pos"),
            F.col("v").cast("double").alias("e"),
        )
        .select("label", "pos", vm.alias("vm"))
    )
    g = exploded.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("n"), F.sum("vm").alias("s")
    )
    mean_micro = F.expr(
        "CASE WHEN s >= 0 THEN (2 * s + n) DIV (2 * n)"
        " ELSE -((-2 * s + n) DIV (2 * n)) END"
    )
    return g.select(
        "label",
        "pos",
        "n",
        (mean_micro.cast("double") / 1000000.0).alias("centroid_val"),
    )
