"""Remaining pandas-UDF surfaces (SURVEY §2.9 "UDF surface"): grouped
AGGREGATE (@pandas_udf GROUPED_AGG shape via F.pandas_udf returning a
scalar per group) and grouped MAP (applyInPandas) — alongside the scalar
pandas UDF (t1_pandas_udf_scalar), the UDTF (t1_python_udtf), mapInPandas
(multimodal/bson) and applyInPandasWithState (streaming test), this
completes the Python-on-Spark execution surface.

Exact-match discipline: the grouped-agg works in int64 only (weighted
sums of bigint columns — no float accumulation order); the grouped-map
derives per-row floats from group min/max (exact doubles), so both are
value-level oracle checks, not rows-only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ght2dm_spark.io import load_table
from ght2dm_spark.queries.registry import register


@register(
    "t1_grouped_agg_udf",
    oracle="""
    SELECT lang,
           CAST(sum(((doc_id % 7) + 1) * n_chars) AS BIGINT) AS wsum,
           CAST(sum((doc_id % 7) + 1) AS BIGINT) AS wtot,
           round(CAST(sum(((doc_id % 7) + 1) * n_chars) AS DOUBLE)
                   / sum((doc_id % 7) + 1), 6) AS wmean_chars
    FROM documents GROUP BY lang
    """,
)
def t1_grouped_agg_udf(spark, sf_dir):
    """Grouped-aggregate pandas UDF: a custom weighted mean computed in
    numpy per group (Arrow hands each group's columns as pandas Series).
    The UDF accumulates int64 weighted sums — order-independent — and
    divides once, so the oracle matches exactly.

    Scale: GROUPED_AGG ships whole groups to Python, so group size must
    be bounded (|lang| groups here are fine; a per-user grouping at
    100 TB wants the two-phase SQL rewrite or a partial-agg pandas UDF).
    The aggregation itself is one shuffle on the group key, same as the
    built-in path — the Python cost is per-group, Arrow-batched."""

    @pandas_udf("long")
    def wsum_udf(w: pd.Series, v: pd.Series) -> int:
        return int((w.astype("int64") * v.astype("int64")).sum())

    @pandas_udf("long")
    def wtot_udf(w: pd.Series) -> int:
        return int(w.astype("int64").sum())

    d = load_table(spark, sf_dir, "documents").withColumn(
        "w", (F.col("doc_id") % 7 + 1).cast("long")
    )
    return (
        d.groupBy("lang")
        .agg(
            wsum_udf("w", "n_chars").alias("wsum"),
            wtot_udf("w").alias("wtot"),
        )
        .select(
            "lang",
            "wsum",
            "wtot",
            F.round(
                F.col("wsum").cast("double") / F.col("wtot"), 6
            ).alias("wmean_chars"),
        )
    )


@register(
    "t1_grouped_map_scale",
    oracle="""
    WITH b AS (SELECT event_type, min(value) AS lo, max(value) AS hi
               FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           round(CASE WHEN b.hi > b.lo
                      THEN (e.value - b.lo) / (b.hi - b.lo)
                      ELSE 0.5 END, 6) AS norm
    FROM events e JOIN b ON e.event_type = b.event_type
    """,
)
def t1_grouped_map_scale(spark, sf_dir):
    """Grouped-map applyInPandas: per-event_type min-max normalization,
    each group rescaled as one pandas DataFrame (the grouped
    feature-engineering shape — a per-group sklearn scaler or model
    scoring call slots in here).  min/max are exact doubles and the
    normalization arithmetic is the same IEEE expression on both
    engines, so round(6) only guards the last bit.

    Scale: applyInPandas shuffles whole groups to Python workers —
    legitimate when groups are bounded (|event_type| here); per-entity
    variants must watch the largest group (salting can't help a grouped
    map — a skewed group needs the broadcast-stats + map-side form,
    which is exactly what the SQL oracle shows)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf["value"].min(), pdf["value"].max()
        norm = (
            (pdf["value"] - lo) / (hi - lo)
            if hi > lo
            else pd.Series(0.5, index=pdf.index)
        )
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "norm": norm,
            }
        )

    out = ev.groupBy("event_type").applyInPandas(
        scale, schema="event_id long, event_type string, norm double"
    )
    return out.select(
        "event_id", "event_type", F.round("norm", 6).alias("norm")
    )


@register(
    "t1_pandas_udwf",
    oracle="""
    SELECT doc_id,
           CAST(sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS roll_chars
    FROM documents
    """,
)
def t1_pandas_udwf(spark, sf_dir):
    """Pandas UDF as a WINDOW function (bounded frame): a custom rolling
    aggregate evaluated per frame by Arrow-batched Python — the shape
    for rolling model scores or domain-specific decayed sums that SQL
    aggregates can't express.  The demo body is a plain int64 sum so the
    SQL window oracle verifies the plumbing exactly.

    Scale: one shuffle on the partition key + per-partition sort — the
    same plan as a built-in window; the UDF evaluates per frame slice,
    so cost is O(rows × frame) Python-side — bounded frames only (an
    unbounded-preceding pandas UDWF re-feeds the whole history per
    row)."""
    from pyspark.sql import Window

    @pandas_udf("long")
    def psum(v: pd.Series) -> int:
        return int(v.astype("int64").sum())

    d = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return d.select("doc_id", psum("n_chars").over(w).alias("roll_chars"))


@register(
    "t1_python_udf_row",
    oracle="SELECT doc_id, length(text) + 7 AS shifted_len FROM documents",
)
def t1_python_udf_row(spark, sf_dir):
    """Row-at-a-time Python UDF (F.udf) — present for SURVEY §2.9 surface
    completeness and as the documented ANTI-PATTERN: each row round-trips
    through pickled Python with no Arrow batching, ~10-100× slower than
    the pandas UDF next door and opaque to Catalyst (no pushdown through
    it).  Production code in this repo never uses F.udf on a hot path —
    every real Python hook is Arrow-batched (see the other queries in
    this module); this query exists so the tier difference is measurable
    on demand."""
    shifted = F.udf(lambda s: len(s) + 7, "long")
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", shifted("text").alias("shifted_len"))


@register(
    "t1_map_in_arrow",
    oracle="""
    SELECT event_id, length(props) AS props_len,
           user_id * 2 AS doubled_uid
    FROM events
    """,
)
def t1_map_in_arrow(spark, sf_dir):
    """mapInArrow: the zero-copy tier BELOW mapInPandas — the UDF
    receives raw pyarrow RecordBatches (no pandas conversion, no index
    materialization), the right level for columnar libraries that speak
    Arrow natively (polars, duckdb-in-executor, custom C++ kernels via
    Arrow C data interface).  Computation here uses pyarrow.compute
    kernels — vectorized C++, never Python per row.

    Scale: same narrow-map properties as mapInPandas (no shuffle,
    batch-size-bounded memory) minus the pandas conversion overhead on
    both edges — the preferred hook once the payload is large or the
    downstream library is Arrow-native."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def batches(it):
        for batch in it:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("event_id")),
                    pc.utf8_length(
                        batch.column(batch.schema.get_field_index("props"))
                    ).cast(pa.int64()),
                    pc.multiply(
                        batch.column(
                            batch.schema.get_field_index("user_id")
                        ),
                        pa.scalar(2, pa.int64()),
                    ),
                ],
                names=["event_id", "props_len", "doubled_uid"],
            )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "props", "user_id"
    )
    return ev.mapInArrow(
        batches, schema="event_id long, props_len long, doubled_uid long"
    )


@register(
    "t1_variant_extract",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_val,
           CAST(json_extract(props, '$.n') AS BIGINT) AS n_val
    FROM events
    """,
)
def t1_variant_extract(spark, sf_dir):
    """VariantType (Spark 4): props parsed ONCE into the binary variant
    encoding, then typed path extraction via variant_get — the
    semi-structured column story that replaces repeated from_json/
    get_json_object string re-parsing (variant decode is a cheap binary
    walk per access, and the parse amortizes across any number of
    extractions).

    Scale: a narrow map either way, but on wide telemetry the
    parse-once-extract-many difference is a large constant factor; the
    oracle extracts the same paths from the JSON text directly."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "string").alias("k_val"),
        F.variant_get(v, "$.n", "bigint").alias("n_val"),
    )
