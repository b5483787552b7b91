"""Deduplication operators.

The reference gets dedup three different ways; each becomes one declarative
operator here:

- newest-wins across dump files: newest-first file ordering + skip-if-exists
  probes (``/root/reference/ght2dm.go:985-1011,1019-1020`` + ``:341,376,415``)
  → :func:`dedup_newest` (one window, one shuffle, no N round-trips);
- extremal-row selection per group: the repos finalize script's group-back
  join (``/root/reference/db/insert_from_tmp_tables.sql:39-51``)
  → :func:`keep_extremal` (window aggregates, avoids the self-join shuffle);
- full-row DISTINCT (``/root/reference/db/insert_from_tmp_tables.sql:15``)
  → :func:`dedup_exact`.

Scale notes: each is a single hash shuffle on its keys; with AQE on, skewed
keys are split at runtime.  ``dedup_newest`` deliberately uses ``row_number``
(not ``orderBy + dropDuplicates``, whose keep-first depends on partitioning
and is not stable across runs/engines).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_newest(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column | str],
) -> DataFrame:
    """Keep exactly one row per ``keys``, the first under ``order``.

    For reference parity, ``order`` is ``[desc(file_date), asc(file_pos)]``:
    newest dump wins; within a file the first occurrence wins (the
    skip-if-exists probe fires for later ones).  Ties must be fully broken
    by ``order`` for run-stable output.
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def keep_extremal(
    df: DataFrame,
    group: Sequence[str],
    max_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
) -> DataFrame:
    """Keep rows matching the per-group extremes of every listed column.

    Matches the reference's INNER JOIN against a grouped subquery
    (``insert_from_tmp_tables.sql:39-51``): a row survives iff *all* its
    extremal columns equal the group max/min (note NULL-safe equality —
    SQL's ``=`` drops groups whose extreme is NULL, but the reference's
    empty→NULL dates make all-NULL groups possible, and max() of them is
    NULL; we preserve the SQL join behavior: NULL = NULL is not true).
    Window form: one shuffle, no join.
    """
    if not max_cols and not min_cols:
        raise ValueError(
            "keep_extremal needs at least one extremal column "
            "(max_cols and/or min_cols are both empty)"
        )
    w = Window.partitionBy(*group)
    out = df
    conds = []
    for c in max_cols:
        out = out.withColumn(f"__max_{c}", F.max(c).over(w))
        conds.append(F.col(c) == F.col(f"__max_{c}"))
    for c in min_cols:
        out = out.withColumn(f"__min_{c}", F.min(c).over(w))
        conds.append(F.col(c) == F.col(f"__min_{c}"))
    pred = conds[0]
    for c in conds[1:]:
        pred = pred & c
    out = out.filter(pred)
    return out.drop(*[f"__max_{c}" for c in max_cols], *[f"__min_{c}" for c in min_cols])


def dedup_exact(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Exact dedup: full-row or keyed ``dropDuplicates``.

    Keyed form is nondeterministic about WHICH duplicate survives — use
    :func:`dedup_newest` when the survivor matters.
    """
    return df.dropDuplicates(list(cols)) if cols else df.dropDuplicates()
