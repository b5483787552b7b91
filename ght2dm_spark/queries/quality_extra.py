"""Round-8 wave-2 quality/inventory declared queries: duplicate
document prefixes, embedding norm and per-dimension variance audits,
order-size and discount-bucket distributions, and brand share shift —
cheap one-scan inventory statistics a pipeline dashboard refreshes
every run.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.queries.registry import register

_PREFIX_TOKS = 8


# --------------------------------------------------------------------------
# t1_doc_prefix_dup


@register(
    "t1_doc_prefix_dup",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               md5(array_to_string(
                   list_filter(regexp_split_to_array(lower(text), '\\s+'),
                               x -> x <> '')[1:{_PREFIX_TOKS}], ' '))
                 AS pfx
        FROM documents WHERE length(text) > 0
    ),
    g AS (SELECT pfx,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(min(doc_id) AS BIGINT) AS keeper
          FROM t GROUP BY pfx)
    SELECT pfx, n_docs, keeper
    FROM g WHERE n_docs >= 2
    """,
)
def t1_doc_prefix_dup(spark, sf_dir):
    """Duplicate document PREFIXES: md5 of the first 8 tokens, groups
    with ≥2 members — the truncation/expansion duplicate class
    (same article, different cutoffs) that whole-document exact dedup
    misses and pairwise near-dup finds only at quadratic candidate
    cost; prefix-keyed grouping finds it in ONE shuffle.  min-id keeper
    mirrors t1_dedup_exact's survivor rule.

    Scale: one hash-keyed groupBy with map-side combine; only
    (prefix-hash, doc_id) shuffles, never text."""
    toks = F.filter(
        F.split(F.lower("text"), r"\s+"), lambda x: x != ""
    )
    t = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.md5(
                F.array_join(F.slice(toks, 1, _PREFIX_TOKS), " ")
            ).alias("pfx"),
        )
    )
    return (
        t.groupBy("pfx")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("keeper"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# --------------------------------------------------------------------------
# t1_emb_norm_stats


@register(
    "t1_emb_norm_stats",
    oracle="""
    WITH n AS (
        SELECT label,
               CAST(coalesce(list_sum(list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                             * 1000000000000 + 0.5) AS BIGINT))), 0)
                    AS BIGINT) AS sq_pico
        FROM embeddings
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(min(sq_pico) AS BIGINT) AS min_sq_pico,
           CAST(max(sq_pico) AS BIGINT) AS max_sq_pico,
           round(sqrt(CAST(sum(sq_pico) AS DOUBLE)
                      / count(*) / 1000000000000), 6) AS rms_norm
    FROM n GROUP BY label
    """,
)
def t1_emb_norm_stats(spark, sf_dir):
    """Embedding norm statistics per label: squared L2 norms in exact
    integer PICOUNITS (the t1_int8_quantize residual discipline), RMS
    norm per class — the first-line embedding-health audit (collapsed
    or exploding norms per class flag a bad encoder or a normalization
    bug before any similarity search runs).

    Exactness: each x² rounds to an integer picounit BEFORE summing
    (order-independent BIGINT); rms is a fixed IEEE chain over the
    exact sum.  Scale: a narrow array map + one |labels|-row groupBy."""
    sq_pico = F.expr(
        "CAST(coalesce(aggregate(transform(embedding,"
        " x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)"
        " * 1000000000000D + 0.5D) AS BIGINT)), 0L, (a, v) -> a + v), 0L)"
        " AS BIGINT)"
    )
    n = load_table(spark, sf_dir, "embeddings").select(
        "label", sq_pico.alias("sq_pico")
    )
    return n.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.min("sq_pico").cast("bigint").alias("min_sq_pico"),
        F.max("sq_pico").cast("bigint").alias("max_sq_pico"),
        F.round(
            F.sqrt(
                F.sum("sq_pico").cast("double")
                / F.count(F.lit(1)) / 1_000_000_000_000
            ),
            6,
        ).alias("rms_norm"),
    )


# --------------------------------------------------------------------------
# t1_emb_dim_variance

_DIM_TOPK = 10


@register(
    "t1_emb_dim_variance",
    oracle=f"""
    WITH d AS (
        SELECT t.i AS dim,
               CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 1000000 + 0.5)
                    AS BIGINT) AS xm
        FROM embeddings,
             unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    s AS (SELECT dim,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(xm) AS BIGINT) AS sx,
                 CAST(sum(xm * xm) AS BIGINT) AS sx2
          FROM d GROUP BY dim),
    v AS (SELECT dim, n,
                 round((CAST(sx2 AS DOUBLE) / n
                        - (CAST(sx AS DOUBLE) / n)
                          * (CAST(sx AS DOUBLE) / n)) / 1000000000000, 9)
                   AS var_dim
          FROM s)
    SELECT CAST(dim AS BIGINT) AS dim, var_dim,
           CAST(rk AS BIGINT) AS rk
    FROM (SELECT dim, var_dim,
                 row_number() OVER (ORDER BY var_dim DESC, dim ASC) AS rk
          FROM v)
    WHERE rk <= {_DIM_TOPK}
    """,
)
def t1_emb_dim_variance(spark, sf_dir):
    """Top-k highest-variance embedding dimensions — the 'live
    dimensions' audit (dead/collapsed dimensions waste index bytes and
    signal encoder problems; the variance ranking is also the cheap
    feature-selection input for a PQ subspace split).  Components are
    fixed to integer MICROUNITS before the moment sums, so both engines
    rank identical variances.

    Scale: posexplode to (dim, value) — dim-keyed groupBy with map-side
    combine (64 groups); the rank window runs over 64 rows."""
    d = load_table(spark, sf_dir, "embeddings").select(
        F.posexplode("embedding").alias("dim0", "x")
    ).select(
        (F.col("dim0") + 1).alias("dim"),  # 1-based like WITH ORDINALITY
        F.floor(F.col("x").cast("double") * 1_000_000 + 0.5)
        .cast("bigint").alias("xm"),
    )
    s = d.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xm").cast("bigint").alias("sx"),
        F.sum(F.col("xm") * F.col("xm")).cast("bigint").alias("sx2"),
    )
    mean = F.col("sx").cast("double") / F.col("n")
    v = s.select(
        "dim", "n",
        F.round(
            (F.col("sx2").cast("double") / F.col("n") - mean * mean)
            / 1_000_000_000_000,
            9,
        ).alias("var_dim"),
    )
    w = Window.orderBy(F.col("var_dim").desc(), F.col("dim").asc())
    return (
        v.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _DIM_TOPK)
        .select(F.col("dim").cast("bigint").alias("dim"), "var_dim", "rk")
    )


# --------------------------------------------------------------------------
# t1_items_per_order_dist


@register(
    "t1_items_per_order_dist",
    oracle="""
    WITH c AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items
               FROM lineitem GROUP BY l_orderkey)
    SELECT n_items,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(count(*)) OVER () AS BIGINT) AS total_orders
    FROM c GROUP BY n_items
    """,
)
def t1_items_per_order_dist(spark, sf_dir):
    """Order-size distribution: lineitems per order, as a count
    histogram with the total alongside — the cardinality profile that
    drives join-strategy expectations (the l_orderkey fan-out IS this
    histogram) and basket-analysis features.  Pure integer counting.

    Scale: one orderkey-keyed aggregate (map-side combined), then a
    ≤7-row rollup with an unbounded window over it."""
    c = load_table(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items")
    )
    d = c.groupBy("n_items").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return d.select(
        "n_items", "n_orders",
        F.sum("n_orders").over(wt).cast("bigint").alias("total_orders"),
    )


# --------------------------------------------------------------------------
# t1_discount_buckets


@register(
    "t1_discount_buckets",
    oracle="""
    WITH b AS (
        SELECT CAST(round(l_discount * 100, 0) AS BIGINT) AS disc_pct,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_c,
               CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                    AS BIGINT) AS net_c
        FROM lineitem
    )
    SELECT disc_pct,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(price_c) AS BIGINT) AS gross_cents,
           CAST(sum(net_c) AS BIGINT) AS net_cents,
           CAST((sum(price_c) - sum(net_c)) * 1000000
                // sum(price_c) AS BIGINT) AS discount_share_ppm
    FROM b GROUP BY disc_pct
    """,
)
def t1_discount_buckets(spark, sf_dir):
    """Revenue by discount percentage bucket: gross, net, and the
    realized discount share in exact integer ppm — the
    price-realization waterfall every revenue dashboard opens with.
    Money is integer cents end-to-end (round at the ROW level where
    both engines see identical doubles, then exact sums).

    Scale: one map-side-combinable groupBy to ~11 discount buckets."""
    b = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_discount") * 100, 0).cast("bigint")
        .alias("disc_pct"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
        .alias("price_c"),
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
        ).cast("bigint").alias("net_c"),
    )
    return b.groupBy("disc_pct").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("price_c").cast("bigint").alias("gross_cents"),
        F.sum("net_c").cast("bigint").alias("net_cents"),
        F.expr(
            "CAST((sum(price_c) - sum(net_c)) * 1000000L"
            " div sum(price_c) AS BIGINT)"
        ).alias("discount_share_ppm"),
    )


# --------------------------------------------------------------------------
# t1_brand_share_shift


@register(
    "t1_brand_share_shift",
    oracle="""
    WITH y AS (
        SELECT p.p_brand AS brand,
               CAST(year(l.l_shipdate) AS BIGINT) AS yr,
               CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY brand, yr
    ),
    s AS (SELECT brand, yr, rev_c,
                 CAST(rev_c * 1000000 // sum(rev_c) OVER (PARTITION BY yr)
                      AS BIGINT) AS share_ppm
          FROM y),
    l AS (SELECT brand, yr, rev_c, share_ppm,
                 lag(share_ppm) OVER (PARTITION BY brand ORDER BY yr)
                   AS prev_share_ppm
          FROM s)
    SELECT brand, yr, rev_c, share_ppm,
           CAST(share_ppm - prev_share_ppm AS BIGINT) AS shift_ppm
    FROM l WHERE prev_share_ppm IS NOT NULL
    """,
)
def t1_brand_share_shift(spark, sf_dir):
    """Brand revenue-share shift year over year: per-year ppm share of
    each brand, lagged per brand — the market-share-movement readout
    (q8 computes one market's share; this is the full brand × year
    movement grid).  Shares and shifts are exact integer ppm over
    integer-cents revenue.

    Scale: one join against the part dim (broadcastable), a
    (brand, year)-grain aggregate, then window math over the tiny
    grid."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.year("l_shipdate").cast("bigint").alias("yr"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
        .alias("price_c"),
    )
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.col("p_brand").alias("brand"),
    )
    y = (
        li.join(F.broadcast(p), "l_partkey")
        .groupBy("brand", "yr")
        .agg(F.sum("price_c").cast("bigint").alias("rev_c"))
    )
    s = y.select(
        "brand", "yr", "rev_c",
        F.expr(
            "CAST(rev_c * 1000000L div sum(rev_c)"
            " OVER (PARTITION BY yr) AS BIGINT)"
        ).alias("share_ppm"),
    )
    wb = Window.partitionBy("brand").orderBy("yr")
    l = s.select(
        "brand", "yr", "rev_c", "share_ppm",
        F.lag("share_ppm").over(wb).alias("prev_share_ppm"),
    )
    return l.filter(F.col("prev_share_ppm").isNotNull()).select(
        "brand", "yr", "rev_c", "share_ppm",
        (F.col("share_ppm") - F.col("prev_share_ppm")).cast("bigint")
        .alias("shift_ppm"),
    )
