"""Observation metrics: in-flight data-quality counters attached to a
plan (df.observe) — the zero-extra-pass way to count rejects/nulls at
100 TB (a separate count() would re-run the pipeline).
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from ght2dm_spark.io import load_table


def test_observe_counts_in_one_pass(spark, sf_dir):
    obs = Observation("quality")
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("n_error_events"),
            F.max("value").alias("max_value"),
        )
        .filter(F.col("event_type") != "error")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    kept = {r["event_type"]: r["n"] for r in out.collect()}
    got = obs.get
    # the observation saw every input row (pre-filter), one pass
    assert got["n_rows"] == ev.count()
    assert got["n_error_events"] == ev.filter(F.col("event_type") == "error").count()
    assert "error" not in kept
    assert got["n_rows"] == sum(kept.values()) + got["n_error_events"]
