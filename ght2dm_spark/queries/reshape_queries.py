"""Reshape + profiling surface: unpivot (wide→long melt) and a
one-scan per-column statistics profile.

``t1_pivot`` (ext_relational) covers long→wide; ``t1_unpivot`` is its
inverse.  The profiler is the engine's answer to ad-hoc data-validation
scans (reference validates imports row-by-row; at scale you profile
columns in one aggregate pass instead).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.queries.registry import register

_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "t1_unpivot",
    oracle=" UNION ALL ".join(
        f"""SELECT l_orderkey, l_linenumber, '{m}' AS measure, {m} AS value
            FROM lineitem WHERE l_quantity >= 45"""
        for m in _MEASURES
    ),
)
def t1_unpivot(spark, sf_dir):
    """Wide→long melt via DataFrame.unpivot: each measure column becomes
    a (measure, value) row.  Catalyst plans this as Expand — one scan,
    no shuffle, output = rows × measures; values pass through without
    arithmetic so doubles compare exactly."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return li.select("l_orderkey", "l_linenumber", *_MEASURES).unpivot(
        ["l_orderkey", "l_linenumber"], _MEASURES, "measure", "value"
    )


_PROF_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]


@register(
    "t1_profile_table",
    oracle=" UNION ALL ".join(
        f"""SELECT '{c}' AS col, count(*) AS n,
                   count(*) - count({c}) AS n_null,
                   count(DISTINCT {c}) AS n_distinct,
                   CAST(min({c}) AS DOUBLE) AS mn,
                   CAST(max({c}) AS DOUBLE) AS mx
            FROM orders"""
        for c in _PROF_COLS
    ),
)
def t1_profile_table(spark, sf_dir):
    """Per-column profile (count / nulls / exact distinct / min / max)
    of the numeric orders columns in ONE aggregate pass: all measures
    for all columns land in a single agg row (Spark expands the multiple
    DISTINCTs), then `stack` reshapes it to one row per column — the
    table is scanned once no matter how many columns are profiled.
    The DuckDB oracle is the naive per-column UNION ALL (3 scans),
    proving the fused plan computes the same thing."""
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROF_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"n_{c}"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"null_{c}"),
            F.count_distinct(F.col(c)).alias(f"dist_{c}"),
            F.min(c).cast("double").alias(f"mn_{c}"),
            F.max(c).cast("double").alias(f"mx_{c}"),
        ]
    row = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n_{c}, null_{c}, dist_{c}, mn_{c}, mx_{c}" for c in _PROF_COLS
    )
    return row.select(
        F.expr(
            f"stack({len(_PROF_COLS)}, {stack_args})"
            " as (col, n, n_null, n_distinct, mn, mx)"
        )
    )
