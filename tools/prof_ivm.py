"""Measure the O(delta) claim of incremental view maintenance: delta
refresh (append / delete / mixed windows) vs the full recompute the
refresh replaces, on a multiplied orders table (~1.5M rows at the
default 10x).  Writes a small timing report to stdout; numbers land in
SCALING.md.

Run: python tools/prof_ivm.py [copies]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ght2dm_spark.incremental import refresh_aggregate
from ght2dm_spark.io import load_table
from ght2dm_spark.session import get_spark
from ght2dm_spark.snapshots import (
    commit,
    delete_rows,
    prepare_commit,
    read_snapshot,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KEYS = ["g"]
AGGS = {
    "n": ("count", None),
    "cents": ("sum", "price_c"),
}
AGGS_MM = dict(AGGS, mx=("max", "k"))


def t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="prof-ivm")
    orders = load_table(spark, SF, "orders")
    n0 = orders.count()
    big = (
        spark.range(copies)
        .crossJoin(F.broadcast(orders))
        .select(
            (F.col("o_orderkey") + F.col("id") * 10_000_000).alias("k"),
            ((F.col("o_orderkey") + F.col("id")) % 9973).alias("g"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).alias("price_c"),
        )
    )
    root = tempfile.mkdtemp(prefix="ght2dm-profivm-")
    try:
        src = f"{root}/src"
        base = big.filter(F.col("k") % 100 != 0)  # hold back a 1% delta
        delta = big.filter(F.col("k") % 100 == 0)
        commit(prepare_commit(base, src))
        print(f"rows: base={n0 * copies * 99 // 100:,} (copies={copies})")

        for tag, aggs in [("count/sum", AGGS), ("min/max", AGGS_MM)]:
            dst = f"{root}/agg-{tag[0]}"
            seed_s = t(lambda: refresh_aggregate(spark, src, dst, KEYS, aggs))

            commit(prepare_commit(delta, src, mode="append"))
            append_s = t(lambda: refresh_aggregate(spark, src, dst, KEYS, aggs))

            victims = (
                read_snapshot(spark, src)
                .filter(F.col("k") % 977 == 0)
                .select("k")
            )
            commit(delete_rows(victims, src))
            delete_s = t(lambda: refresh_aggregate(spark, src, dst, KEYS, aggs))

            # the comparator: what every refresh would cost without IVM
            def recompute():
                full = read_snapshot(spark, src)
                full.groupBy(*KEYS).agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("price_c").alias("cents"),
                ).write.mode("overwrite").parquet(f"{root}/recomp")

            recompute_s = t(recompute)
            print(
                f"[{tag}] seed={seed_s:.2f}s  append-delta={append_s:.2f}s  "
                f"delete-window={delete_s:.2f}s  full-recompute={recompute_s:.2f}s"
            )
            # fresh source for the second strategy run
            shutil.rmtree(src, ignore_errors=True)
            commit(prepare_commit(base, src))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
