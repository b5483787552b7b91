"""Vector similarity search (SURVEY §2.9 / north_star "similarity
search"): exact cosine top-k as the baseline, and a sign-random-projection
LSH bucketed variant as the scale path.

Determinism contract: the LSH hyperplanes are a ±1 sign matrix derived
from md5 in PYTHON at import time and spliced into both the Spark plan and
the DuckDB oracle as literals — both engines bucket identically, so even
the approximate operator is exactly oracle-checkable.  Dot products fold
left-to-right over doubles in both engines (Spark ``aggregate``, DuckDB
``list_reduce``), so cosine values are bit-identical.

Scale shape (100 TB of vectors):

- brute-force top-k is O(Q·N) but the query side is broadcast — the corpus
  never shuffles for the join, and the rank-filtered window compiles to
  Catalyst's WindowGroupLimit in Partial + Final mode (verified on the
  executed plan): every partition keeps only k rows per query BEFORE
  the shuffle — the mapPartitions-heap shape, done by the optimizer;
- LSH restricts candidates to matching buckets: corpus is bucketed once
  (narrow map), the join is an equi join on bucket code — broadcastable
  query side, AQE handles bucket skew;
- an IVF variant would replace the hash bucketing with learned centroids;
  the plumbing (bucket column + equi join + per-bucket top-k) is identical.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EMB_DIM = 64  # driver testdata embeddings are 64-dim float (FIXTURES.md §B)


@lru_cache(maxsize=None)
def sign_matrix(planes: int = 8, dim: int = EMB_DIM, seed: str = "srp-v1") -> tuple:
    """Deterministic ±1 hyperplane matrix: sign of the first md5 hex nibble
    of ``seed|plane|dim`` — reproducible anywhere, no RNG state."""
    return tuple(
        tuple(
            1.0
            if int(hashlib.md5(f"{seed}|{p}|{i}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1.0
            for i in range(dim)
        )
        for p in range(planes)
    )


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold of pairwise products (order matches DuckDB's
    list_reduce exactly — bit-identical doubles)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity with an explicit zero-norm guard: a zero (or
    corrupt all-zero) vector makes the denominator exactly 0.0, which
    under ANSI Spark (the 4.x default) is a DIVIDE_BY_ZERO error that
    aborts the whole query — while DuckDB's IEEE division yields NaN.
    Both engines now emit NaN for that row (see cosine_sql), so one bad
    embedding degrades one row instead of killing the job."""
    denom = F.sqrt(dot(a, a) * dot(b, b))
    return F.when(denom == 0.0, F.lit(float("nan"))).otherwise(
        dot(a, b) / denom
    )


def with_norm2(df, vec_col: str, prefix: str):
    """Project ``vec_col`` to (``<prefix>_nd``, ``<prefix>_n2``): the
    double-cast vector and its squared norm, computed ONCE PER ROW so a
    downstream pair join never re-pays the cast or the self-dot per
    pair (the r9 topk_neighbors hoist, guide §1.2 per-task work /
    §2.3 narrower pair payload).  Keeps every other column."""
    nd = f"{prefix}_nd"
    return df.withColumn(nd, as_double(F.col(vec_col))).withColumn(
        f"{prefix}_n2", dot(F.col(nd), F.col(nd))
    )


def cosine_hoisted(nd_a: Column, n2_a: Column, nd_b: Column, n2_b: Column) -> Column:
    """Cosine over pre-hoisted per-side (double-vector, squared-norm)
    pairs — bit-identical to :func:`cosine` on the same inputs: dot(v,v)
    is the identical left-to-right fold, the denominator is
    sqrt(n2a * n2b) in both forms, and the zero-norm NaN guard is the
    same; only dot(a, b) remains per pair."""
    denom = F.sqrt(n2_a * n2_b)
    return F.when(denom == 0.0, F.lit(float("nan"))).otherwise(
        dot(nd_a, nd_b) / denom
    )


def dot_sql(a: str, b: str, dim: int = EMB_DIM) -> str:
    """DuckDB mirror of :func:`dot` (1-based indexing, sequential fold)."""
    return (
        f"list_reduce(list_transform(range(1, {dim + 1}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )


def cosine_sql(a: str, b: str, dim: int = EMB_DIM) -> str:
    """DuckDB mirror of :func:`cosine`, zero-norm guard included."""
    denom = f"sqrt({dot_sql(a, a, dim)} * {dot_sql(b, b, dim)})"
    return (
        f"(CASE WHEN {denom} = 0 THEN CAST('nan' AS DOUBLE) "
        f"ELSE {dot_sql(a, b, dim)} / {denom} END)"
    )


def srp_bucket(
    vec: Column, planes: int = 8, dim: int = EMB_DIM, seed: str = "srp-v1"
) -> Column:
    """Sign-random-projection bucket code: one '0'/'1' char per hyperplane
    (projection ≥ 0 → '1'), concatenated MSB-first.  ``seed`` selects an
    independent hyperplane family — band b of an OR-composed LSH uses its
    own seed so bands are independent hash functions."""
    m = sign_matrix(planes, dim, seed)
    bits = []
    for p in range(planes):
        w = F.array(*[F.lit(v) for v in m[p]])
        proj = dot(as_double(vec), w)
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def srp_bucket_sql(
    vec: str, planes: int = 8, dim: int = EMB_DIM, seed: str = "srp-v1"
) -> str:
    """DuckDB mirror of :func:`srp_bucket`."""
    m = sign_matrix(planes, dim, seed)
    bits = []
    for p in range(planes):
        w = "[" + ", ".join(str(v) for v in m[p]) + "]::DOUBLE[]"
        proj = (
            f"list_reduce(list_transform(range(1, {dim + 1}), "
            f"i -> CAST({vec}[i] AS DOUBLE) * ({w})[i]), (x, y) -> x + y)"
        )
        bits.append(f"CASE WHEN {proj} >= 0 THEN '1' ELSE '0' END")
    return " || ".join(bits)


def srp_projections(
    vec: Column, planes: int = 8, dim: int = EMB_DIM, seed: str = "srp-v1"
) -> Column:
    """Signed hyperplane projections as ONE array column.  Compute this
    once with ``withColumn`` and derive BOTH the bucket code
    (:func:`srp_bucket_from`) and the margins from it — srp_bucket +
    srp_margins as separate calls each build their own 8×64-literal
    expression trees, doubling the plan for multi-probe queries."""
    m = sign_matrix(planes, dim, seed)
    return F.array(
        *[
            dot(as_double(vec), F.array(*[F.lit(v) for v in m[p]]))
            for p in range(planes)
        ]
    )


def srp_bucket_from(projs: Column, planes: int = 8) -> Column:
    """Bucket code derived from :func:`srp_projections` output."""
    return F.concat(
        *[
            F.when(F.element_at(projs, p + 1) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for p in range(planes)
        ]
    )


def srp_margins(
    vec: Column, planes: int = 8, dim: int = EMB_DIM, seed: str = "srp-v1"
) -> Column:
    """Absolute projection margin per hyperplane, as an array aligned with
    the bucket-code bit order.  The smallest margin marks the bit most
    likely to be on the wrong side of its hyperplane — the bit that
    query-directed multi-probe LSH (Lv et al., VLDB'07) flips first.
    ``seed`` must match the srp_bucket family being probed (margins
    against the wrong hyperplanes would flip a geometrically meaningless
    bit and silently degrade recall)."""
    m = sign_matrix(planes, dim, seed)
    projs = []
    for p in range(planes):
        w = F.array(*[F.lit(v) for v in m[p]])
        projs.append(F.abs(dot(as_double(vec), w)))
    return F.array(*projs)


def srp_margins_sql(
    vec: str, planes: int = 8, dim: int = EMB_DIM, seed: str = "srp-v1"
) -> str:
    """DuckDB mirror of :func:`srp_margins` (same fold → bit-identical
    doubles → both engines pick the same flip bit)."""
    m = sign_matrix(planes, dim, seed)
    projs = []
    for p in range(planes):
        w = "[" + ", ".join(str(v) for v in m[p]) + "]::DOUBLE[]"
        projs.append(
            f"abs(list_reduce(list_transform(range(1, {dim + 1}), "
            f"i -> CAST({vec}[i] AS DOUBLE) * ({w})[i]), (x, y) -> x + y))"
        )
    return "[" + ", ".join(projs) + "]"


def topk_neighbors(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
    pre_join: list | None = None,
) -> DataFrame:
    """Exact cosine top-k per query over (a join of) corpus.

    ``pre_join``: optional equi-join key column names shared by both sides
    (e.g. an LSH bucket column) restricting the candidate set; ``None``
    means brute force (queries side is broadcast — the corpus never
    shuffles for the join).  Self-matches (same id) are excluded.
    Deterministic: ties in cosine break by neighbor id.

    The squared norms feeding cosine's denominator are computed ONCE PER
    ROW on each side, below the pair join, instead of once per pair: the
    projection is a separate operator under the join, so each corpus row
    pays one self-dot instead of |queries| of them.  dot(v, v) is the
    same sequential fold either way, so every cos double is bit-identical
    to the per-pair form (and to the DuckDB mirror).
    """
    qn = queries.withColumn(
        "__q_n2", dot(as_double(F.col(q_vec)), as_double(F.col(q_vec)))
    )
    cn = corpus.withColumn(
        "__c_n2", dot(as_double(F.col(c_vec)), as_double(F.col(c_vec)))
    )
    joined = (
        # dropDuplicates BEFORE scoring: a queries side carrying multiple
        # probe rows per query (multi-probe, banded codes) can match the
        # same corpus row through two probes — scored twice it would
        # occupy two of the k rank slots and evict a real neighbor.  The
        # duplicate rows are identical after this projection, so the pick
        # is deterministic.
        cn.join(F.broadcast(qn), pre_join)
        .select(q_id, c_id, q_vec, c_vec, "__q_n2", "__c_n2")
        .dropDuplicates([q_id, c_id])
        if pre_join
        else cn.crossJoin(F.broadcast(qn))
    )
    denom = F.sqrt(F.col("__q_n2") * F.col("__c_n2"))
    scored = joined.filter(F.col(q_id) != F.col(c_id)).withColumn(
        "cos",
        F.when(denom == 0.0, F.lit(float("nan"))).otherwise(
            dot(as_double(F.col(q_vec)), as_double(F.col(c_vec))) / denom
        ),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cos").desc(), F.col(c_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "cos", "rank")
    )


def l2_dist(a: Column, b: Column) -> Column:
    """Euclidean distance via the same left-to-right fold as :func:`dot`
    (bit-identical vs the DuckDB mirror)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def l2_sql(a: str, b: str, dim: int = EMB_DIM) -> str:
    """DuckDB mirror of :func:`l2_dist`."""
    return (
        f"sqrt(list_reduce(list_transform(range(1, {dim + 1}), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
        f"* (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))), "
        f"(x, y) -> x + y))"
    )
