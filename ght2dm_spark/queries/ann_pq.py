"""Product-quantization ANN (Jégou et al. 2011, "Product Quantization
for Nearest Neighbor Search") — the missing member of the similarity
family next to SRP-LSH and IVF: compress each vector to M small
centroid codes (one per subspace), then answer queries by Asymmetric
Distance Computation (ADC) — sum over subspaces of the exact distance
from the query's subvector to the database vector's assigned centroid,
read from a tiny per-query lookup table.

At 100 TB this is THE index that makes billion-vector search feasible:
the corpus is stored as M bytes of codes per vector (here 4×2 bits),
never as floats, and a query touches only an M×K LUT.  Everything runs
in the integer fixed-point regime of operators/clustering (exact
subspace k-means, exact integer ADC), so the full train→encode→search
composition matches the unrolled-CTE DuckDB oracle bit-for-bit —
an end-to-end compressed-index pipeline under the exact-match gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.operators.clustering import kmeans_int_grouped, sqdist_int
from ght2dm_spark.operators.similarity import EMB_DIM
from ght2dm_spark.queries.registry import register

_PQ_M = 4  # subspaces
_PQ_SUB = EMB_DIM // _PQ_M  # dims per subspace
_PQ_K = 8  # centroids per subspace codebook (3 bits/subspace)
_PQ_ITERS = 2  # k-means rounds per codebook
_PQ_NQ = 10  # vec_id < 10 are the query vectors (house convention)
_PQ_TOPK = 3


def _pq_sub_ctes(m: int) -> tuple[list, str]:
    """Per-subspace k-means CTEs, name-prefixed so M trainings coexist
    in one oracle.  Mirrors clustering_queries._kmeans_ctes (same
    BIGINT micro-units, exact distances, (d, cid) argmin tie-break,
    floor-division means) over the sliced subvector."""
    dim, k = _PQ_SUB, _PQ_K
    lo, hi = m * dim + 1, (m + 1) * dim
    sq = (
        f"list_reduce(list_transform(range(1, {dim + 1}), "
        f"i -> (v[i]-c[i])*(v[i]-c[i])), (x, y) -> x + y)"
    )
    ctes = [
        f"v{m} AS (SELECT vec_id AS id, list_transform(embedding[{lo}:{hi}], "
        "x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS v "
        "FROM embeddings)",
        f"c{m}_0 AS (SELECT id AS cid, v AS c FROM v{m} WHERE id < {k})",
    ]
    for t in range(1, _PQ_ITERS + 1):
        ctes.append(
            f"a{m}_{t} AS (SELECT id, v, "
            f"min(struct_pack(d := {sq}, c := cid)) AS mn "
            f"FROM v{m} CROSS JOIN c{m}_{t - 1} GROUP BY id, v)"
        )
        ctes.append(
            f"c{m}_{t} AS (SELECT cid, list(cm ORDER BY i) AS c FROM "
            f"(SELECT struct_extract(mn, 'c') AS cid, i, "
            f"CAST(sum(v[i]) // count(*) AS BIGINT) AS cm "
            f"FROM a{m}_{t}, unnest(range(1, {dim + 1})) AS u(i) "
            f"GROUP BY 1, 2) GROUP BY cid)"
        )
    return ctes, sq


def _pq_sql() -> str:
    ctes: list[str] = []
    for m in range(_PQ_M):
        sub, sq = _pq_sub_ctes(m)
        ctes.extend(sub)
        ctes.append(
            f"code{m} AS (SELECT id, {m} AS m, "
            f"struct_extract(min(struct_pack(d := {sq}, c := cid)), 'c') "
            f"AS code FROM v{m} CROSS JOIN c{m}_{_PQ_ITERS} GROUP BY id, v)"
        )
        ctes.append(
            f"lut{m} AS (SELECT q.id AS q_id, {m} AS m, cid AS code, "
            f"{sq.replace('v[', 'q.v[')} AS d "
            f"FROM v{m} q CROSS JOIN (SELECT cid, c FROM c{m}_{_PQ_ITERS}) "
            f"WHERE q.id < {_PQ_NQ})"
        )
    codes = " UNION ALL ".join(
        f"SELECT * FROM code{m}" for m in range(_PQ_M)
    )
    luts = " UNION ALL ".join(f"SELECT * FROM lut{m}" for m in range(_PQ_M))
    ctes.append(f"codes AS ({codes})")
    ctes.append(f"luts AS ({luts})")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
    adc AS (SELECT l.q_id, c.id, CAST(sum(l.d) AS BIGINT) AS adc_dist
            FROM codes c JOIN luts l ON c.m = l.m AND c.code = l.code
            GROUP BY 1, 2),
    ranked AS (SELECT q_id, id AS neighbor_id, adc_dist,
                      row_number() OVER (PARTITION BY q_id
                                         ORDER BY adc_dist ASC, id ASC)
                        AS rank
               FROM adc WHERE id <> q_id)
    SELECT q_id, rank, neighbor_id, adc_dist FROM ranked
    WHERE rank <= {_PQ_TOPK}"""
    )


@register("t1_pq_ann", oracle=_pq_sql())
def t1_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed top-k: train M=4 subspace codebooks (K=4, 2
    integer k-means rounds each), encode every vector as 4 codes,
    then answer the 10 query vectors by exact-integer ADC over a
    broadcast M×K lookup table; top-3 per query, (distance, id)
    tie-break, self excluded.

    Scale: all M codebooks train in ONE shared pass
    (kmeans_int_grouped, group = subspace id): the corpus explodes once
    to (m, id, subvector) rows and each iteration is a single broadcast
    join against the M×K centroid table — one corpus scan per
    iteration, not one per subspace per iteration, and the M stage
    chains collapse into one.  Encoding falls out of the final
    assignment (at scale: one M-byte column); search joins the code
    table to a broadcast NQ×M×K LUT and aggregates (q, id) partial
    sums map-side.  The corpus-sized frames never shuffle on anything
    wider than the M-way code join key.  A production variant composes
    this with the IVF coarse quantizer (t1_ann_ivf_learned) for
    IVFADC."""
    e = load_table(spark, sf_dir, "embeddings")
    subs = e.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.slice("embedding", m * _PQ_SUB + 1, _PQ_SUB)
                    for m in range(_PQ_M)
                ]
            )
        ).alias("m", "sub"),
    )
    asg, cents = kmeans_int_grouped(
        subs, "m", "vec_id", "sub", k=_PQ_K, iters=_PQ_ITERS
    )
    codes = asg.select("id", F.col("g").alias("m"), F.col("cid").alias("code"))
    q = asg.filter(F.col("id") < _PQ_NQ).select(
        F.col("g").alias("m"), F.col("id").alias("q_id"), F.col("v").alias("qv")
    )
    luts = q.join(
        F.broadcast(
            cents.select(F.col("g").alias("m"), F.col("cid").alias("kc"), "c")
        ),
        "m",
    ).select(
        "q_id",
        "m",
        F.col("kc").alias("code"),
        sqdist_int(F.col("qv"), F.col("c")).alias("d"),
    )
    adc = (
        codes.join(F.broadcast(luts), ["m", "code"])
        .groupBy("q_id", "id")
        .agg(F.sum("d").alias("adc_dist"))
        .filter(F.col("id") != F.col("q_id"))
    )
    w = Window.partitionBy("q_id").orderBy("adc_dist", "id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _PQ_TOPK)
        .select("q_id", "rank", F.col("id").alias("neighbor_id"), "adc_dist")
    )
