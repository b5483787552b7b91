"""Deterministic surrogate keys.

Replaces the reference's PostgreSQL serials obtained via ``INSERT ...
RETURNING id`` (``/root/reference/ght2dm.go:262,425``;
``db/insert_from_tmp_tables.sql:61``).  Keys must be run-stable and
partitioning-independent so the DuckDB oracle hash-matches — which rules
out ``monotonically_increasing_id()``.

Two strategies:

- ``window``: ``row_number()`` over a global sort.  Exact and simple, but
  Spark evaluates an un-partitioned window in a SINGLE task — fine at test
  scale, a straggler at 100 TB.
- ``range`` (default): sort-free two-pass scheme — range-repartition by the
  order keys, count rows per partition, broadcast cumulative offsets, then
  local row_number per partition.  Same output as ``window`` (given a
  total order), but every stage is distributed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def add_surrogate_key(
    df: DataFrame,
    order_by: Sequence[str],
    name: str = "id",
    start: int = 1,
    strategy: str = "range",
) -> DataFrame:
    """Add column ``name`` = 1-based rank of the row under ``order_by``.

    ``order_by`` must be a unique natural key (asserted by the test suite,
    mirroring O2's uniqueness reliance, ``ght2dm.go:442-479``) — otherwise
    the key assignment within ties is not deterministic.
    """
    if strategy == "window":
        w = Window.orderBy(*order_by)
        return df.withColumn(name, F.row_number().over(w) + F.lit(start - 1))
    if strategy != "range":
        raise ValueError(f"unknown strategy: {strategy}")

    npart = max(df.rdd.getNumPartitions(), 1)
    # persist() is load-bearing, not an optimization: the count pass and
    # the returned plan otherwise re-execute repartitionByRange as two
    # separate jobs, and RangePartitioner samples with a per-job seed —
    # different boundaries on the second run would apply pass-1 offsets
    # to differently-sized partitions, duplicating/skipping key values.
    # (Invisible at test scale, where the reservoir sample is the whole
    # input; real at the data sizes this strategy exists for.)  The
    # MEMORY_AND_DISK default spills rather than evicts, so the pinned
    # partitioning survives; callers may unpersist after materializing.
    ranged = (
        df.repartitionByRange(npart, *order_by)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    # Pass 1: rows per range-partition → cumulative offsets (tiny: one row
    # per partition, collected to the driver and rebroadcast via a join).
    counts = ranged.groupBy("__pid").count().collect()
    sizes = {r["__pid"]: r["count"] for r in counts}
    offsets = {}
    acc = start - 1
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    # Zero-row input → no partitions counted; create_map() with no args is
    # typed VOID and breaks the lookup, so fall back to a constant offset.
    offset_col = (
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])[
            F.col("__pid")
        ]
        if offsets
        else F.lit(start - 1)
    )
    # Pass 2: local rank within each range partition + broadcast offset.
    w = Window.partitionBy("__pid").orderBy(*order_by)
    return (
        ranged.withColumn(name, F.row_number().over(w) + offset_col)
        .drop("__pid")
    )
