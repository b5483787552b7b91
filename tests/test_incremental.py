"""Incremental aggregate maintenance: refreshes process only appended
files, the merged state equals a full recompute after every refresh,
and a crash between source-append and refresh loses nothing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ght2dm_spark.incremental import refresh_aggregate, verify_aggregate
from ght2dm_spark.io import load_table
from ght2dm_spark.snapshots import (
    commit,
    compact_snapshot,
    prepare_commit,
    read_snapshot,
)

AGGS = {
    "n_orders": ("count", None),
    "total_cents": ("sum", "price_c"),
    "min_order": ("min", "o_orderkey"),
    "max_order": ("max", "o_orderkey"),
}


def _slice(orders, lo, hi):
    return orders.where(
        (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)
    ).withColumn("price_c", F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)))


def test_incremental_refresh_equals_full_recompute(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    commit(prepare_commit(_slice(orders, 0, 400), src, mode="append"))
    assert refresh_aggregate(spark, src, dst, ["o_orderstatus"], AGGS)
    assert verify_aggregate(spark, src, dst, ["o_orderstatus"], AGGS)
    # two more appends, one refresh each — each refresh reads only the delta
    for lo, hi in [(400, 900), (900, 10**9)]:
        commit(prepare_commit(_slice(orders, lo, hi), src, mode="append"))
        assert refresh_aggregate(spark, src, dst, ["o_orderstatus"], AGGS)
        assert verify_aggregate(spark, src, dst, ["o_orderstatus"], AGGS)
    # totals line up with a direct aggregate over the raw table
    got = {
        r["o_orderstatus"]: r["n_orders"]
        for r in read_snapshot(spark, dst).collect()
    }
    want = {
        r["o_orderstatus"]: r["cnt"]
        for r in orders.groupBy("o_orderstatus").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == want


def test_refresh_is_noop_without_new_data(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    commit(prepare_commit(_slice(orders, 0, 500), src, mode="append"))
    assert refresh_aggregate(spark, src, dst, ["o_orderstatus"], AGGS)
    # nothing appended since → no new commit, state unchanged
    assert refresh_aggregate(spark, src, dst, ["o_orderstatus"], AGGS) is False
    assert verify_aggregate(spark, src, dst, ["o_orderstatus"], AGGS)


def test_crashed_refresh_reprocesses_same_delta(spark, sf_dir, tmp_path):
    """A refresh that dies before its commit leaves the recorded source
    version untouched; the rerun covers the same delta exactly once."""
    orders = load_table(spark, sf_dir, "orders")
    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    commit(prepare_commit(_slice(orders, 0, 500), src, mode="append"))
    assert refresh_aggregate(spark, src, dst, ["o_orderstatus"], AGGS)
    commit(prepare_commit(_slice(orders, 500, 10**9), src, mode="append"))
    # simulate the crash: the delta was computed but never committed —
    # i.e. nothing happened; the next refresh sees the same increment
    assert refresh_aggregate(spark, src, dst, ["o_orderstatus"], AGGS)
    assert verify_aggregate(spark, src, dst, ["o_orderstatus"], AGGS)


def test_compaction_invalidates_increment_path(spark, sf_dir, tmp_path):
    """After a source compaction the append-ancestor containment breaks;
    the refresh must raise (rebuild signal), never double-count."""
    import pytest

    orders = load_table(spark, sf_dir, "orders")
    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    commit(prepare_commit(_slice(orders, 0, 500), src, mode="append"))
    assert refresh_aggregate(spark, src, dst, ["o_orderstatus"], AGGS)
    commit(prepare_commit(_slice(orders, 500, 10**9), src, mode="append"))
    compact_snapshot(spark, src)
    with pytest.raises(ValueError, match="append-ancestor"):
        refresh_aggregate(spark, src, dst, ["o_orderstatus"], AGGS)
