"""Temporal operators Spark lacks as batch built-ins (SURVEY §2.9; the
"custom operators" tier): as-of join, binned range join, gap
sessionization with explicit ids, plus the salted two-phase
aggregation for skewed keys.

Both joins are expressed as compositions of existing DataFrame ops —
no Pandas UDF, no per-row Python — chosen for their shuffle shape at
100 TB:

- **as-of join**: the union-and-window formulation.  One shuffle on the
  join key, one sort per partition, zero row expansion — versus the
  naive inequality-join (BroadcastNestedLoop or range explosion).  This
  is the classic stream-table "latest value at time t" operator.
- **range join**: bucketize both sides to the range grain, explode the
  probe side to its candidate buckets (bounded, small constant), equi
  join on (key, bucket), re-filter exactly.  Turns an inequality join
  into a hash join with a ≤(range/grain + 1)× probe-side expansion.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ght2dm_spark.functions import epoch_us


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    tie_break: str | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right_ts <= left_ts`` and the same key (backward as-of; rows with
    no prior right row get NULLs — left-join semantics).

    Right side must be unique per (key, right_ts) for deterministic
    results; pass ``tie_break`` (a payload column) to pre-dedup keeping
    its max (remaining payload columns break any residual tie, so the
    kept row is fully deterministic).  Implementation: tag both sides,
    union, sort each key partition by (ts, side) with right-before-left
    at equal ts, carry the payload forward with last(ignorenulls) over
    an expanding frame — as ONE struct, not per column: per-column
    carries would skip a NULL field in the matched row and resurrect a
    STALE value from an older right row (and could tear a multi-column
    payload across different right rows); the struct of the matched row
    is non-NULL even when every field is, so NULL payload fields come
    through faithfully.

    NULL semantics match an equality join against ``right_ts <=
    left_ts``: right rows with a NULL key or NULL right_ts are excluded
    up front — under the window's NULLS-FIRST ordering they would
    otherwise sit at the head of every (or the NULL-key) partition and
    leak payload into left rows that have no genuine prior match.  A
    left row with NULL key or NULL left_ts gets NULL payload.
    """
    reserved = {"__src", "__t", "__pay"}
    clash = (set(payload) | reserved) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join would overwrite left column(s) {sorted(clash)} — "
            "alias the payload (or rename the reserved __src/__t/__pay)"
        )
    right = right.filter(F.col(key).isNotNull() & F.col(right_ts).isNotNull())
    if tie_break is not None:
        w = Window.partitionBy(key, right_ts).orderBy(
            F.col(tie_break).desc(),
            *[F.col(p).desc() for p in payload if p != tie_break],
        )
        right = (
            right.withColumn("__tb", F.row_number().over(w))
            .filter(F.col("__tb") == 1)
            .drop("__tb")
        )
    l_tagged = left.withColumn("__src", F.lit(1)).withColumn(
        "__t", F.col(left_ts)
    )
    r_tagged = right.select(
        F.col(key),
        F.col(right_ts).alias("__t"),
        F.struct(*[F.col(p) for p in payload]).alias("__pay"),
    ).withColumn("__src", F.lit(0))
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t").asc(), F.col("__src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__pay", F.last("__pay", ignorenulls=True).over(w))
    out = u.filter(F.col("__src") == 1)
    keep = [c for c in out.columns if c not in reserved]
    return out.select(
        *keep, *[F.col("__pay")[p].alias(p) for p in payload]
    )


def range_join_binned(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    lower: Column,
    upper: Column,
    grain_seconds: int,
    how: str = "left",
) -> DataFrame:
    """Join rows of ``build`` to each ``probe`` row where
    ``build_ts ∈ [probe_ts + lower, probe_ts + upper]`` and keys match,
    via bucket candidates at ``grain_seconds`` — an equi join Catalyst
    can hash-partition, instead of an inequality join it cannot.

    ``lower``/``upper`` are interval Columns (e.g. ``F.expr("INTERVAL
    -1 HOUR")``).  The probe side explodes to its candidate buckets and
    the exact predicate re-filters inside an INNER join — a (probe,
    build) pair can match in at most one bucket (the build row's), so
    matched multiplicity is exact.  ``how='left'`` adds back ONE row
    (build columns NULL) per zero-match probe row: a left join on the
    exploded frame would instead emit a NULL row per non-matching
    bucket candidate — including for probe rows that DID match in
    another bucket (caught by the randomized interval-model test).
    Match status depends only on ``(key, probe_ts)``, so the add-back
    anti-join on those two columns preserves payload columns and
    duplicate-row multiplicity exactly.

    Cost note for 100 TB callers: ``how='left'`` evaluates the
    candidate join twice (matches + the anti-join's distinct matched
    keys).  A caller that aggregates per probe row anyway can use
    ``how='inner'`` and left-join the aggregate back to the probe
    frame, paying one candidate join plus a probe-sized join instead.
    """
    for side, cols in (("probe", probe.columns), ("build", build.columns)):
        if "__bucket" in cols:
            raise ValueError(
                f"range_join_binned reserves the __bucket column name; "
                f"rename it on the {side} side"
            )
    shared = (set(probe.columns) & set(build.columns)) - {key}
    if shared:
        raise ValueError(
            "range_join_binned requires disjoint column names outside the "
            f"join key (alias one side); shared: {sorted(shared)} — a "
            "shared name would be ambiguous in the exact re-filter and "
            "duplicated in the output"
        )
    lo_b = F.floor(F.unix_timestamp(F.col(probe_ts) + lower) / grain_seconds)
    hi_b = F.floor(F.unix_timestamp(F.col(probe_ts) + upper) / grain_seconds)
    p = probe.withColumn("__bucket", F.explode(F.sequence(lo_b, hi_b)))
    b = build.withColumn(
        "__bucket", F.floor(F.unix_timestamp(build_ts) / grain_seconds)
    )
    in_range = (b[build_ts] >= p[probe_ts] + lower) & (
        b[build_ts] <= p[probe_ts] + upper
    )
    cond = (p[key] == b[key]) & (p["__bucket"] == b["__bucket"]) & in_range
    matched = (
        p.join(b, cond, "inner")
        .drop(b[key])
        .drop(p["__bucket"])
        .drop(b["__bucket"])
    )
    if how == "inner":
        return matched
    if how != "left":
        raise ValueError(f"range_join_binned supports inner/left, not {how!r}")
    unmatched = probe.join(
        matched.select(key, probe_ts).distinct(), [key, probe_ts], "left_anti"
    )
    return matched.unionByName(unmatched, allowMissingColumns=True)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    salt_col: Column,
    n_salt: int,
    counts: Sequence[str] = ("n",),
    sums: dict[str, Column] | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: phase 1 groups by
    (keys, salt) — spreading one hot key over ``n_salt`` reducers — and
    phase 2 combines the partials by keys alone (tiny: n_salt rows per
    key).  For algebraic aggregates (count/sum here; min/max/avg follow
    the same partial/final split).

    ``salt_col`` is any deterministic high-cardinality expression (a
    raw id, a hash — negative values welcome); it is pmod-folded into
    [0, n_salt) here, the same spreading joins.salted_join uses (plain
    ``%`` keeps the sign, silently spreading a hot key over up to
    2·n_salt−1 groups).
    """
    if len(counts) != 1:
        raise ValueError(
            f"salted_agg emits exactly one count column, got {list(counts)}"
        )
    sums = sums or {}
    phase1 = df.groupBy(*keys, F.pmod(salt_col, F.lit(n_salt)).alias("__salt")).agg(
        F.count(F.lit(1)).alias("__pc"),
        *[expr.alias(f"__ps_{name}") for name, expr in sums.items()],
    )
    return phase1.groupBy(*keys).agg(
        F.sum("__pc").alias(counts[0]),
        *[F.sum(f"__ps_{name}").alias(name) for name in sums],
    )


def sessionize_gap(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    order: Sequence[Column | str],
    gap_us: int,
    inclusive: bool = False,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization (gaps-and-islands): append a 1-based
    ``session_col`` per ``keys`` group — a new session starts when the
    gap to the previous row exceeds ``gap_us`` microseconds
    (``inclusive=True`` starts one at gap == gap_us too, the
    session_window convention).  The batch equivalent of
    ``session_window(ts, gap)`` that keeps explicit session ids.

    ``order`` must be a TOTAL order (pass a unique tiebreak column
    after the timestamp): with bare ``ts``, colliding timestamps make
    the running boundary sum partition-order-dependent and the ids
    nondeterministic.  The gap test is exact integer microseconds —
    engine-portable, no float epoch.

    Scale: ONE shuffle on ``keys`` serves both window passes (lag and
    running sum share the same partitioning and sort), and any
    downstream aggregate on (keys..., session_col) reuses the exchange
    — the subset-partitioning rule t1_user_feature_pipeline's plan
    note documents.
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(ts_col).over(w)
    diff = epoch_us(F.col(ts_col)) - epoch_us(prev)
    gap_hit = (diff >= gap_us) if inclusive else (diff > gap_us)
    # A NULL ts makes diff NULL; without the explicit isNull() branches a
    # NULL-ts row would take boundary 0 and glue into the neighboring
    # session (and, under NULLS-FIRST ordering, shift every later id).
    # Instead each NULL-ts row opens its own session, deterministically.
    boundary = F.when(
        prev.isNull() | F.col(ts_col).isNull() | gap_hit, 1
    ).otherwise(0)
    return df.withColumn(session_col, F.sum(boundary).over(run))
