"""Manifest column-stats data skipping + Z-order layout.

The snapshot layer records per-file min/max from parquet footers at
commit time; ``snapshot_files(prune=...)`` drops files the stats prove
irrelevant.  Z-ordering makes that pruning effective on every layout
column at once.  Correctness contract throughout: pruned-read + filter
≡ full-read + filter (pruning is a superset guarantee, never a filter).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.operators.layout import zorder_key, zorder_layout
from ght2dm_spark.snapshots import (
    prepare_commit,
    commit,
    read_snapshot,
    snapshot_files,
    write_table_atomic,
)


def _manifest(table: Path) -> dict:
    name = (table / "CURRENT").read_text().strip()
    with open(table / "_manifests" / name) as f:
        return json.load(f)


def test_manifest_records_footer_stats(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    t = tmp_path / "orders_snap"
    write_table_atomic(orders.coalesce(1), str(t))
    m = _manifest(t)
    assert m["files"] and set(m["stats"]) == set(m["files"])
    st = m["stats"][m["files"][0]]
    lo, hi = st["o_orderkey"]
    row = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    assert (lo, hi) == (row[0], row[1])
    # string column stats present too (possibly truncated, still bounds)
    slo, shi = st["o_orderstatus"]
    assert slo <= "F" and shi >= "P"


def test_prune_skips_disjoint_append_files(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    t = str(tmp_path / "orders_ranges")
    # three disjoint o_orderkey ranges, one file each, via append commits
    for lo, hi in [(0, 500), (500, 1000), (1000, 10**9)]:
        part = orders.where(
            (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)
        ).coalesce(1)
        commit(prepare_commit(part, t, mode="append"))
    all_files = snapshot_files(t)
    assert len(all_files) == 3
    pruned = snapshot_files(t, prune={"o_orderkey": (600, 800)})
    assert len(pruned) == 1
    # open bounds work: (None, 400) keeps only the first range's file
    assert len(snapshot_files(t, prune={"o_orderkey": (None, 400)})) == 1
    # correctness: pruned read + filter ≡ full read + filter
    flt = (F.col("o_orderkey") >= 600) & (F.col("o_orderkey") <= 800)
    full = sorted(r[0] for r in read_snapshot(spark, t).where(flt).select("o_orderkey").collect())
    fast = sorted(
        r[0]
        for r in read_snapshot(spark, t, prune={"o_orderkey": (600, 800)})
        .where(flt)
        .select("o_orderkey")
        .collect()
    )
    assert full and fast == full


def test_prune_without_stats_keeps_all_files(spark, sf_dir, tmp_path):
    """Old manifests (or un-stat-able columns) must disable pruning, not
    break it: a stats-less manifest survives prune with every file."""
    orders = load_table(spark, sf_dir, "orders")
    t = tmp_path / "orders_nostats"
    write_table_atomic(orders.limit(100).coalesce(1), str(t))
    name = (t / "CURRENT").read_text().strip()
    mpath = t / "_manifests" / name
    m = json.loads(mpath.read_text())
    del m["stats"]
    mpath.write_text(json.dumps(m))
    files = snapshot_files(str(t), prune={"o_orderkey": (10**12, None)})
    assert len(files) == len(m["files"])
    assert read_snapshot(spark, str(t)).count() == 100


def _morton_py(x: int, y: int) -> int:
    z = 0
    for b in range(16):
        z |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_reference_bit_interleave(spark):
    cases = [(3, 5), (0, 0), (65535, 65535), (12345, 54321), (1, 0), (0, 1)]
    df = spark.createDataFrame(cases, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z_key"]
        for r in df.select("x", "y", zorder_key(["x", "y"])).collect()
    }
    assert got == {(x, y): _morton_py(x, y) for x, y in cases}
    assert got[(3, 5)] == 39  # 011 ⨯ 101 interleaved → 100111


def test_zorder_layout_prunes_on_either_dimension(spark, tmp_path):
    """A 64×64 grid z-ordered into 16 files: a narrow range on x ALONE
    (and on y alone) must prune most files — the property a
    lexicographic sort by (x, y) cannot give for y."""
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    t = str(tmp_path / "grid_z")
    write_table_atomic(zorder_layout(grid, ["x", "y"], 16), t)
    n_all = len(snapshot_files(t))
    assert n_all >= 8  # repartitionByRange(16) — allow range-sampler slack
    for col in ("x", "y"):
        kept = snapshot_files(t, prune={col: (10, 17)})
        assert len(kept) <= n_all // 2, f"{col}: kept {len(kept)}/{n_all}"
        flt = (F.col(col) >= 10) & (F.col(col) <= 17)
        full = sorted(
            r[0] for r in read_snapshot(spark, t).where(flt).select("payload").collect()
        )
        fast = sorted(
            r[0]
            for r in read_snapshot(spark, t, prune={col: (10, 17)})
            .where(flt)
            .select("payload")
            .collect()
        )
        assert len(full) == 8 * 64 and fast == full


def test_two_dim_prune_conjunction(spark, tmp_path):
    """Conjunctive prune on both dimensions intersects the survivor
    sets — a point-rectangle query touches a handful of files."""
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    t = str(tmp_path / "grid_z2")
    write_table_atomic(zorder_layout(grid, ["x", "y"], 16), t)
    n_all = len(snapshot_files(t))
    both = snapshot_files(t, prune={"x": (10, 17), "y": (10, 17)})
    only_x = snapshot_files(t, prune={"x": (10, 17)})
    assert len(both) <= len(only_x) <= n_all
    assert len(both) <= max(2, n_all // 4)
    df = read_snapshot(spark, t, prune={"x": (10, 17), "y": (10, 17)})
    got = df.where(
        (F.col("x").between(10, 17)) & (F.col("y").between(10, 17))
    ).count()
    assert got == 64
