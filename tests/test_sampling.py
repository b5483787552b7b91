"""Deterministic hash-sampling operators: reproducibility is the whole
contract, so the tests attack exactly that — partitioning independence,
run-to-run stability, split disjointness, and stratum gating.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    stratified_hash_sample,
    train_test_split,
)


def _ids(df):
    return {r[0] for r in df.select("doc_id").collect()}


def test_sample_partitioning_independent(spark, sf_dir):
    """df.sample would change under repartitioning; hash_sample must not."""
    d = load_table(spark, sf_dir, "documents")
    a = _ids(hash_sample(d.repartition(1), F.col("doc_id"), 10))
    b = _ids(hash_sample(d.repartition(13), F.col("doc_id"), 10))
    assert a == b and a


def test_sample_monotone_in_rate(spark, sf_dir):
    """A 5% sample is a subset of the 20% sample (bucket < pct nests)."""
    d = load_table(spark, sf_dir, "documents")
    assert _ids(hash_sample(d, F.col("doc_id"), 5)) <= _ids(
        hash_sample(d, F.col("doc_id"), 20)
    )


def test_split_disjoint_and_total(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    s = train_test_split(d, F.col("doc_id"), 10)
    test = _ids(s.filter(F.col("split") == "test"))
    train = _ids(s.filter(F.col("split") == "train"))
    assert test and train
    assert not (test & train)
    assert len(test) + len(train) == d.count()
    # and the test set is exactly the 10% hash sample
    assert test == _ids(hash_sample(d, F.col("doc_id"), 10))


def test_stratified_rates_gate_strata(spark, sf_dir):
    """Absent strata drop to 0%; present strata follow their own rate."""
    d = load_table(spark, sf_dir, "documents")
    s = stratified_hash_sample(d, F.col("doc_id"), F.col("lang"), {"en": 100})
    langs = {r[0] for r in s.select("lang").distinct().collect()}
    assert langs == {"en"}
    assert s.count() == d.filter(F.col("lang") == "en").count()


def test_bucket_range(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    mm = d.select(hash_bucket(F.col("doc_id")).alias("b")).agg(
        F.min("b"), F.max("b")
    ).collect()[0]
    assert 0 <= mm[0] and mm[1] <= 99


def test_hash_sample_threshold_scales_with_buckets(spark, sf_dir):
    """pct must mean PERCENT at every buckets granularity: finer buckets
    give ~the same rate as buckets=100, an unrepresentable pct/buckets
    combination raises instead of returning an always-empty sample, and
    NULL keys partition deterministically on both engines."""
    import pytest
    from pyspark.sql import functions as F

    from ght2dm_spark.operators.sampling import hash_bucket, hash_sample

    d = load_table(spark, sf_dir, "documents")
    base = hash_sample(d, F.col("doc_id"), 10).count()
    fine = hash_sample(d, F.col("doc_id"), 10, buckets=1000).count()
    n = d.count()
    assert abs(fine - base) / n < 0.08, (base, fine, n)

    with pytest.raises(ValueError, match="unrepresentable"):
        hash_sample(d, F.col("doc_id"), 3, buckets=10)

    # NULL keys: present in exactly one of sample/complement, both engines
    nd = spark.createDataFrame([(None,), (1,)], "k long")
    kept = hash_sample(nd, F.col("k"), 50).count()
    dropped = nd.exceptAll(hash_sample(nd, F.col("k"), 50)).count()
    assert kept + dropped == 2
