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
    repartitioning and is identical on every engine that has md5.

    NULL keys bucket deterministically too (coalesced to a NUL-byte
    sentinel before hashing): md5(NULL) is NULL, and a NULL bucket
    previously made NULL-key rows vanish from BOTH a sample and its
    complement (filter NULL is never true) — silent data loss for a
    sampler whose whole contract is a deterministic partition of the
    input.  Mirror the coalesce in oracle SQL when keys are nullable.

    Caveat the sentinel implies: ALL NULL keys share one bucket, so
    they enter or leave a sample as a single indivisible block (0% of
    them below the sentinel bucket's threshold, 100% at or above) —
    fine for the intended near-unique keys, biased for a key that is
    NULL on a large fraction of rows; such callers should coalesce to
    a secondary key themselves."""
    return (
        F.conv(
            F.substring(
                F.md5(F.coalesce(key.cast("string"), F.lit("\x00"))), 1, 8
            ),
            16,
            10,
        )
        .cast("bigint")
        % buckets
    )


def hash_sample(df: DataFrame, key: Column, pct: int, buckets: int = 100) -> DataFrame:
    """Keep ~pct% of rows, chosen by key hash.  A map-side filter — at
    100 TB this prunes before any shuffle, and two runs (or two engines)
    agree row-for-row.  ``pct`` means PERCENT at every ``buckets``
    granularity (threshold = round(pct·buckets / 100); comparing pct
    against the bucket index directly would silently keep pct/buckets of
    the rows for any buckets ≠ 100).  A pct/buckets combination too
    coarse to represent (threshold rounds to 0 for pct > 0) raises —
    floor division here once returned an EMPTY sample for
    hash_sample(pct=5, buckets=10) with no error."""
    threshold = (pct * buckets + 50) // 100
    if pct > 0 and threshold == 0:
        raise ValueError(
            f"pct={pct} is unrepresentable at buckets={buckets} "
            f"(threshold rounds to 0 — an always-empty sample); raise "
            "buckets or pct"
        )
    return df.filter(hash_bucket(key, buckets) < threshold)


def train_test_split(df: DataFrame, key: Column, test_pct: int = 10) -> DataFrame:
    """Label every row 'train'/'test' by key hash.  Deterministic: a
    document never migrates between splits across runs, which is the
    property that matters for contamination control."""
    if "split" in df.columns:
        raise ValueError(
            "train_test_split writes a 'split' column; the input already "
            "has one (withColumn would silently overwrite it)"
        )
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
