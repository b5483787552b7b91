"""Deterministic hash-based sampling / splitting.

A 100 TB training-data pipeline needs samples and train/test splits that
are (a) reproducible across runs and engines, (b) stable under
repartitioning, and (c) pure map-side filters — no shuffle, no state, no
seed-dependent RNG stream (Spark's ``df.sample`` draws from a
per-partition RNG, so its output changes with partitioning; useless as a
contract).  Here a row's fate is a pure function of its key:
``bucket = int(md5(key)[:8], 16) % buckets``.

Mirrors the reference's sampled-extract utilities in spirit (the
reference samples at import time); the md5 formulation is engine-neutral
so DuckDB can replay it exactly (see ``neardup.hex2int_sql``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from the md5 of ``key``.
    First 8 hex chars → 32-bit int → mod.  Pure projection: survives any
    repartitioning and is identical on every engine that has md5."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % buckets
    )


def hash_sample(df: DataFrame, key: Column, pct: int, buckets: int = 100) -> DataFrame:
    """Keep ~pct% of rows, chosen by key hash.  A map-side filter — at
    100 TB this prunes before any shuffle, and two runs (or two engines)
    agree row-for-row."""
    return df.filter(hash_bucket(key, buckets) < pct)


def train_test_split(df: DataFrame, key: Column, test_pct: int = 10) -> DataFrame:
    """Label every row 'train'/'test' by key hash.  Deterministic: a
    document never migrates between splits across runs, which is the
    property that matters for contamination control."""
    return df.withColumn(
        "split",
        F.when(hash_bucket(key) < test_pct, F.lit("test")).otherwise(F.lit("train")),
    )


def stratified_hash_sample(
    df: DataFrame, key: Column, stratum: Column, rates: dict[str, int]
) -> DataFrame:
    """Per-stratum sampling rates (pct per stratum value, 0 for absent
    strata).  One CASE expression — still a pure map-side filter, unlike
    ``df.sampleBy`` which is RNG- and partitioning-dependent."""
    rate = F.lit(0)
    for val, pct in rates.items():
        rate = F.when(stratum == val, F.lit(pct)).otherwise(rate)
    return df.filter(hash_bucket(key) < rate)
