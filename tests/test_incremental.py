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


def test_refresh_join_is_incremental_and_exact(spark, sf_dir, tmp_path):
    """dest = orders ⋈ customer maintained via the delta-join identity:
    appends on BOTH sides are folded in as one append commit of
    ΔL⋈R₀ ∪ L₀⋈ΔR ∪ ΔL⋈ΔR; the result must equal the full recompute
    row-for-row, and the refresh commit must be an APPEND (O(delta)),
    never an overwrite."""
    import json
    from pathlib import Path

    from pyspark.sql import functions as F

    from ght2dm_spark.incremental import refresh_join
    from ght2dm_spark.io import load_table
    from ght2dm_spark.snapshots import commit, history, prepare_commit, read_snapshot

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    ).withColumnRenamed("c_custkey", "o_custkey")
    lsrc, rsrc, dest = (
        str(tmp_path / "o"), str(tmp_path / "c"), str(tmp_path / "j"),
    )
    o1 = o.filter(F.col("o_orderkey") % 3 == 0)
    c1 = c.filter(F.col("o_custkey") % 2 == 0)
    commit(prepare_commit(o1, lsrc))
    commit(prepare_commit(c1, rsrc))

    assert refresh_join(spark, lsrc, rsrc, dest, on=["o_custkey"])
    assert not refresh_join(spark, lsrc, rsrc, dest, on=["o_custkey"])  # no-op

    # append to both sides, refresh, compare vs full recompute
    commit(prepare_commit(o.filter(F.col("o_orderkey") % 3 == 1), lsrc, mode="append"))
    commit(prepare_commit(c.filter(F.col("o_custkey") % 2 == 1), rsrc, mode="append"))
    assert refresh_join(spark, lsrc, rsrc, dest, on=["o_custkey"])

    got = read_snapshot(spark, dest)
    full = read_snapshot(spark, lsrc).join(read_snapshot(spark, rsrc), "o_custkey")
    assert got.count() == full.count() > 0
    cols = sorted(got.columns)
    assert (
        got.select(cols).exceptAll(full.select(cols)).isEmpty()
        and full.select(cols).exceptAll(got.select(cols)).isEmpty()
    )
    # the second refresh was an append commit (delta-sized), not a rewrite
    last = history(dest)[-1]
    m = json.loads((Path(dest) / "_manifests" / last["manifest"]).read_text())
    assert m["mode"] == "append"
    assert m["meta"]["left_version"] == history(lsrc)[-1]["seq"]


def test_refresh_raises_on_delete_commits(spark, sf_dir, tmp_path):
    """A merge-on-read delete commit advances the source version without
    changing its file list, so the append-increment path would silently
    keep deleted rows in the derived state forever — refresh must refuse
    loudly instead (retraction needs the deleted rows' values, which the
    key file doesn't carry)."""
    import pytest

    from ght2dm_spark.snapshots import delete_rows

    orders = load_table(spark, sf_dir, "orders")
    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    commit(prepare_commit(_slice(orders, 0, 400), src, mode="append"))
    assert refresh_aggregate(spark, src, dst, ["o_orderstatus"], AGGS)
    commit(
        delete_rows(
            spark.createDataFrame([(1,)], "o_orderkey long"), src
        )
    )
    with pytest.raises(ValueError, match="delete commits landed"):
        refresh_aggregate(spark, src, dst, ["o_orderstatus"], AGGS)


def test_read_increment_upto_version_bounds_the_window(spark, tmp_path):
    """The (since, upto] window must be exact: rows committed after
    upto_version stay out — the property refresh jobs rely on to record
    precisely the version they folded in (no double-counting)."""
    from ght2dm_spark.snapshots import (
        commit,
        history,
        prepare_commit,
        read_increment,
    )

    table = str(tmp_path / "t")

    def add(rows, mode):
        commit(
            prepare_commit(
                spark.createDataFrame(rows, "k long, v long"), table, mode=mode
            )
        )
        return history(table)[-1]["seq"]

    v1 = add([(1, 1)], "overwrite")
    v2 = add([(2, 2)], "append")
    add([(3, 3)], "append")  # lands AFTER the window
    got = {
        (r.k, r.v)
        for r in read_increment(
            spark, table, since_version=v1, upto_version=v2
        ).collect()
    }
    assert got == {(2, 2)}


def test_verify_aggregate_ignores_post_refresh_appends(spark, tmp_path):
    """The audit recomputes at the PINNED source version: an append
    landing after the refresh must not fail a healthy derived table."""
    from ght2dm_spark.incremental import refresh_aggregate, verify_aggregate
    from ght2dm_spark.snapshots import commit, prepare_commit

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    aggs = {"n": ("count", None), "s": ("sum", "v")}
    commit(
        prepare_commit(
            spark.createDataFrame([(1, 5), (1, 7), (2, 1)], "k long, v long"),
            src,
        )
    )
    assert refresh_aggregate(spark, src, dst, ["k"], aggs)
    assert verify_aggregate(spark, src, dst, ["k"], aggs)
    # fresh source data the derived table has not folded in yet
    commit(
        prepare_commit(
            spark.createDataFrame([(1, 100)], "k long, v long"),
            src,
            mode="append",
        )
    )
    assert verify_aggregate(spark, src, dst, ["k"], aggs), (
        "audit must verify maintenance at the covered version, not freshness"
    )
    # after the next refresh the new rows are covered and it still holds
    assert refresh_aggregate(spark, src, dst, ["k"], aggs)
    assert verify_aggregate(spark, src, dst, ["k"], aggs)
