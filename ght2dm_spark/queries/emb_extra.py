"""Round-9 embedding-health declared queries: PSI drift over
scalar-quantized codes, per-dimension code entropy, centroid shift,
quantile clip bounds, and neighbor hubness — the audits a vector
pipeline runs between encoding and index build (is the quantizer
calibrated? did the distribution move between batches? which vectors
dominate every candidate list?).

Exactness discipline: dimension min/max are exact (no accumulation);
the code assignment is one fixed IEEE chain evaluated identically on
both engines; counts are BIGINT; every data-dependent ln rounds to 9
and sums as DECIMAL(18,9); rounded double outputs are +0-normalized
(the r8 signed-zero class).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.operators.similarity import cosine_sql, topk_neighbors
from ght2dm_spark.queries.registry import register

_NQ = 10  # vec_id < 10 are the query vectors (FIXTURES.md §B)
_CODES = 16  # scalar-quantizer buckets per dimension

# (dim, xd) pairs: 1-based dimension index, component as DOUBLE
_DIMS_SQL = """
    d AS (SELECT vec_id, t.i AS dim,
                 CAST(embedding[t.i] AS DOUBLE) AS xd
          FROM embeddings,
               unnest(range(1, len(embedding) + 1)) AS t(i))
"""

# per-dimension scalar-quantizer code over the d frame
_CODE_SQL = f"""
    mm AS (SELECT dim, min(xd) AS mn, max(xd) AS mx
           FROM d GROUP BY dim),
    c AS (SELECT d.vec_id, d.dim,
                 CAST(CASE WHEN mm.mx > mm.mn
                           THEN least(floor(((d.xd - mm.mn)
                                / (mm.mx - mm.mn)) * {_CODES}),
                                {_CODES - 1})
                           ELSE 0 END AS BIGINT) AS code
          FROM d JOIN mm ON d.dim = mm.dim)
"""


def _codes_df(spark, sf_dir):
    """(vec_id, dim, code): per-dimension min/max scalar quantization
    into 16 codes — the Spark mirror of _CODE_SQL (identical IEEE
    chain, so codes agree bit-for-bit)."""
    d = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.posexplode("embedding").alias("dim0", "x")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.col("x").cast("double").alias("xd"),
    )
    mm = d.groupBy("dim").agg(
        F.min("xd").alias("mn"), F.max("xd").alias("mx")
    )
    code = F.when(
        F.col("mx") > F.col("mn"),
        F.least(
            F.floor(
                (F.col("xd") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
                * _CODES
            ),
            F.lit(_CODES - 1),
        ),
    ).otherwise(0)
    return d.join(F.broadcast(mm), "dim").select(
        "vec_id", "dim", code.cast("bigint").alias("code")
    )


# --------------------------------------------------------------------------
# t1_emb_psi_quantized


@register(
    "t1_emb_psi_quantized",
    oracle=f"""
    WITH {_DIMS_SQL},
    {_CODE_SQL},
    b AS (SELECT dim, code,
                 CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS na,
                 CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS nb
          FROM c GROUP BY dim, code),
    t AS (SELECT dim, code, na, nb,
                 CAST(sum(na) OVER (PARTITION BY dim) AS BIGINT) AS ta,
                 CAST(sum(nb) OVER (PARTITION BY dim) AS BIGINT) AS tb
          FROM b),
    e AS (SELECT dim, na, nb,
                 CAST(na AS DOUBLE) / ta AS pa,
                 CAST(nb AS DOUBLE) / tb AS pb
          FROM t WHERE na > 0 AND nb > 0),
    term AS (SELECT dim,
                    CAST(round((pa - pb) * ln(pa / pb), 9)
                         AS DECIMAL(18,9)) AS psi9
             FROM e)
    SELECT CAST(dim AS BIGINT) AS dim,
           CAST(count(*) AS BIGINT) AS n_bins,
           round(CAST(sum(psi9) AS DOUBLE), 9) + 0 AS psi
    FROM term GROUP BY dim
    """,
)
def t1_emb_psi_quantized(spark, sf_dir):
    """Population-stability index per embedding dimension between the
    even/odd vec_id splits, measured over the 16-code scalar-quantizer
    histogram — embedding drift at the granularity a quantized index
    actually stores: a dimension whose code distribution moves between
    batches invalidates that subquantizer's codebook long before
    aggregate recall drops (t1_quant_recall_drift's leading
    indicator).  Empty-on-either-side codes are excluded, standard PSI
    practice.

    Exactness: codes are one fixed IEEE chain off exact per-dim
    min/max; counts exact BIGINT; each PSI term rounds to 9 and sums
    as DECIMAL(18,9).  Scale: one (dim, code) aggregate after a
    broadcast min/max join — the 1024-row histogram does everything
    downstream."""
    c = _codes_df(spark, sf_dir)
    b = c.groupBy("dim", "code").agg(
        F.sum(F.when(F.col("vec_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint").alias("na"),
        F.sum(F.when(F.col("vec_id") % 2 == 1, 1).otherwise(0))
        .cast("bigint").alias("nb"),
    )
    wd = Window.partitionBy("dim")
    t = b.select(
        "dim", "code", "na", "nb",
        F.sum("na").over(wd).cast("bigint").alias("ta"),
        F.sum("nb").over(wd).cast("bigint").alias("tb"),
    )
    e = t.filter((F.col("na") > 0) & (F.col("nb") > 0)).select(
        "dim",
        (F.col("na").cast("double") / F.col("ta")).alias("pa"),
        (F.col("nb").cast("double") / F.col("tb")).alias("pb"),
    )
    term = e.select(
        "dim",
        F.round(
            (F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb")),
            9,
        ).cast("decimal(18,9)").alias("psi9"),
    )
    return term.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        (F.round(F.sum("psi9").cast("double"), 9) + F.lit(0.0))
        .alias("psi"),
    ).select(F.col("dim").cast("bigint").alias("dim"), "n_bins", "psi")


# --------------------------------------------------------------------------
# t1_emb_code_entropy


@register(
    "t1_emb_code_entropy",
    oracle=f"""
    WITH {_DIMS_SQL},
    {_CODE_SQL},
    h AS (SELECT dim, code, CAST(count(*) AS BIGINT) AS n
          FROM c GROUP BY dim, code),
    t AS (SELECT dim, code, n,
                 CAST(sum(n) OVER (PARTITION BY dim) AS BIGINT) AS tot
          FROM h),
    term AS (SELECT dim,
                    CAST(round(-(CAST(n AS DOUBLE) / tot)
                               * log2(CAST(n AS DOUBLE) / tot), 9)
                         AS DECIMAL(18,9)) AS h9
             FROM t)
    SELECT CAST(dim AS BIGINT) AS dim,
           CAST(count(*) AS BIGINT) AS n_codes_used,
           round(CAST(sum(h9) AS DOUBLE), 9) + 0 AS entropy
    FROM term GROUP BY dim
    """,
)
def t1_emb_code_entropy(spark, sf_dir):
    """Entropy (bits) of each dimension's 16-code occupancy — the
    quantizer-utilization audit: a healthy calibrated dimension sits
    near log2(16) = 4 bits; low entropy means most vectors collapse
    into few codes (wasted index bytes, poor ADC discrimination) and
    flags the dimension for re-calibration or merging.  The capacity
    view next to t1_emb_psi_quantized's drift view over the same
    codes.

    Exactness: the code histogram is exact; each −p·log2(p) term
    rounds to 9 and sums as DECIMAL(18,9).  Scale: identical plan
    shape to the PSI query — one (dim, code) aggregate, windows over
    the 1024-row histogram."""
    c = _codes_df(spark, sf_dir)
    h = c.groupBy("dim", "code").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wd = Window.partitionBy("dim")
    t = h.select(
        "dim", "code", "n",
        F.sum("n").over(wd).cast("bigint").alias("tot"),
    )
    p = F.col("n").cast("double") / F.col("tot")
    term = t.select(
        "dim",
        F.round(-p * F.log2(p), 9).cast("decimal(18,9)").alias("h9"),
    )
    return term.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_codes_used"),
        (F.round(F.sum("h9").cast("double"), 9) + F.lit(0.0))
        .alias("entropy"),
    ).select(
        F.col("dim").cast("bigint").alias("dim"), "n_codes_used", "entropy"
    )


# --------------------------------------------------------------------------
# t1_emb_centroid_shift


@register(
    "t1_emb_centroid_shift",
    oracle=f"""
    WITH {_DIMS_SQL},
    m AS (SELECT dim, vec_id,
                 CAST(floor(xd * 1000000 + 0.5) AS BIGINT) AS xm
          FROM d),
    s AS (SELECT dim,
                 CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_even,
                 CAST(sum(CASE WHEN vec_id % 2 = 0 THEN xm ELSE 0 END)
                      AS BIGINT) AS sx_even,
                 CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_odd,
                 CAST(sum(CASE WHEN vec_id % 2 = 1 THEN xm ELSE 0 END)
                      AS BIGINT) AS sx_odd
          FROM m GROUP BY dim)
    SELECT CAST(dim AS BIGINT) AS dim, n_even, n_odd,
           round((CAST(sx_even AS DOUBLE) / n_even
                  - CAST(sx_odd AS DOUBLE) / n_odd) / 1000000, 9) + 0
             AS shift
    FROM s
    """,
)
def t1_emb_centroid_shift(spark, sf_dir):
    """Per-dimension centroid shift between the even/odd vec_id
    batches (mean difference in original units) — the directional
    drift vector that says not just THAT the distribution moved (PSI)
    but WHERE: a consistent sign across many dimensions is a batch
    normalization bug, isolated spikes are genuine content drift.

    Exactness: components fix to integer microunits before the exact
    BIGINT sums; the shift is one fixed chain over exact operands,
    rounded and +0-normalized (tiny negative shifts MUST NOT hash as
    −0.0).  Scale: one dim-keyed aggregate with map-side combine — 64
    output rows."""
    m = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.posexplode("embedding").alias("dim0", "x")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("x").cast("double") * 1_000_000 + 0.5)
        .cast("bigint").alias("xm"),
    )
    even = F.col("vec_id") % 2 == 0
    s = m.groupBy("dim").agg(
        F.sum(F.when(even, 1).otherwise(0)).cast("bigint").alias("n_even"),
        F.sum(F.when(even, F.col("xm")).otherwise(0))
        .cast("bigint").alias("sx_even"),
        F.sum(F.when(~even, 1).otherwise(0)).cast("bigint").alias("n_odd"),
        F.sum(F.when(~even, F.col("xm")).otherwise(0))
        .cast("bigint").alias("sx_odd"),
    )
    return s.select(
        F.col("dim").cast("bigint").alias("dim"), "n_even", "n_odd",
        (
            F.round(
                (
                    F.col("sx_even").cast("double") / F.col("n_even")
                    - F.col("sx_odd").cast("double") / F.col("n_odd")
                )
                / 1_000_000,
                9,
            )
            + F.lit(0.0)
        ).alias("shift"),
    )


# --------------------------------------------------------------------------
# t1_emb_quantile_clip


@register(
    "t1_emb_quantile_clip",
    oracle=f"""
    WITH {_DIMS_SQL},
    m AS (SELECT dim, vec_id,
                 CAST(floor(xd * 1000000 + 0.5) AS BIGINT) AS xm
          FROM d),
    r AS (SELECT dim, xm,
                 row_number() OVER (PARTITION BY dim
                                    ORDER BY xm, vec_id) AS i,
                 count(*) OVER (PARTITION BY dim) AS n
          FROM m)
    SELECT CAST(dim AS BIGINT) AS dim, CAST(max(n) AS BIGINT) AS n,
           CAST(max(CASE WHEN i = (n + 99) // 100 THEN xm END) AS BIGINT)
             AS lo_micro,
           CAST(max(CASE WHEN i = (99 * n + 99) // 100 THEN xm END)
                AS BIGINT) AS hi_micro,
           CAST(max(CASE WHEN i = (99 * n + 99) // 100 THEN xm END)
                - max(CASE WHEN i = (n + 99) // 100 THEN xm END)
                AS BIGINT) AS range_micro
    FROM r GROUP BY dim
    """,
)
def t1_emb_quantile_clip(spark, sf_dir):
    """Per-dimension p1/p99 clip bounds in integer microunits — the
    calibration pass a scalar quantizer runs BEFORE assigning codes
    (min/max calibration lets one outlier stretch the range and
    collapse everyone else into two codes; p1/p99 clipping is the
    standard fix).  Position-based percentiles over a deterministic
    order (value, then vec_id), so both engines pick the same
    physical component.

    Exactness: integer microunits end to end.  Scale: one rank window
    partitioned by dimension (64 partitions), one 64-row rollup."""
    m = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.posexplode("embedding").alias("dim0", "x")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("x").cast("double") * 1_000_000 + 0.5)
        .cast("bigint").alias("xm"),
    )
    wr = Window.partitionBy("dim").orderBy("xm", "vec_id")
    wn = Window.partitionBy("dim")
    r = m.select(
        "dim", "xm",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    lo = F.max(
        F.when(F.col("i") == F.floor((F.col("n") + 99) / 100), F.col("xm"))
    )
    hi = F.max(
        F.when(
            F.col("i") == F.floor((99 * F.col("n") + 99) / 100), F.col("xm")
        )
    )
    return r.groupBy("dim").agg(
        F.max("n").cast("bigint").alias("n"),
        lo.cast("bigint").alias("lo_micro"),
        hi.cast("bigint").alias("hi_micro"),
        (hi - lo).cast("bigint").alias("range_micro"),
    ).select(
        F.col("dim").cast("bigint").alias("dim"),
        "n", "lo_micro", "hi_micro", "range_micro",
    )


# --------------------------------------------------------------------------
# t1_emb_hubness


@register(
    "t1_emb_hubness",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec
               FROM embeddings WHERE vec_id < {_NQ}),
    c AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings),
    s AS (SELECT q_id, c_id, {cosine_sql("q_vec", "c_vec")} AS cos
          FROM c CROSS JOIN q WHERE q_id <> c_id),
    r AS (SELECT q_id, c_id,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos DESC, c_id ASC) AS rank
          FROM s),
    hits AS (SELECT c_id, CAST(count(*) AS BIGINT) AS n_hits
             FROM r WHERE rank <= 5 GROUP BY c_id)
    SELECT n_hits, CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(min(c_id) AS BIGINT) AS min_c_id
    FROM hits GROUP BY n_hits
    """,
)
def t1_emb_hubness(spark, sf_dir):
    """Hubness histogram: how many corpus vectors appear in exactly k
    of the query batch's exact top-5 lists — the high-dimensional
    pathology audit (hub vectors crowd every candidate list, anti-hubs
    are unreachable; a heavy tail here predicts poor ANN recall and
    biased retrieval-augmented sampling long before an index is
    built).  min_c_id anchors each histogram row to a concrete vector
    for drill-down.

    Exactness: ranks come from the shared exact-cosine top-k operator
    (sequential-fold dot, bit-identical to DuckDB's list_reduce); the
    histogram is pure counts.  Scale: the scoring join broadcasts the
    query batch — the corpus never shuffles; the histogram aggregates
    |queries|·k rows."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    c = e.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    hits = (
        topk_neighbors(q, c, k=5)
        .groupBy("c_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )
    return hits.groupBy("n_hits").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.min("c_id").cast("bigint").alias("min_c_id"),
    )
