"""Incrementally-maintained aggregates over snapshot tables (the
continuous-aggregate / materialized-view-maintenance pattern).

A derived table holds ``source.groupBy(keys).agg(...)`` and is refreshed
by processing ONLY the source files appended since the last refresh:
``snapshots.read_increment`` yields the delta (valid because snapshot
data files are immutable and appends extend the parent's file list), the
delta's partial aggregate merges with the previous derived state, and
the result commits atomically with the source version it covers pinned
in the commit meta.  A crash mid-refresh leaves the old derived state
(and its recorded version) intact — the next refresh simply re-reads the
same delta.

Only DECOMPOSABLE aggregates participate (count/sum/min/max, and avg as
sum+count): their merge is another aggregate of the same shape, which is
what makes the refresh O(delta) instead of O(history).  At 100 TB this
is the difference between a nightly full groupBy over the corpus and a
per-batch merge over |keys| rows — the same partial/final split Spark's
own map-side combine uses, lifted across refreshes.

Reference scope: the reference's incremental mode skips already-loaded
dump files (``/root/reference/ght2dm.go`` date-window scan) but
recomputes derived state from the database; this layer keeps derived
aggregates current without rescanning loaded data at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ght2dm_spark.snapshots import (
    commit,
    history,
    prepare_commit,
    read_increment,
    read_snapshot,
    snapshot_files,
)

#: aggregate -> (delta partial, state merge) builders; a merge is the
#: aggregate that combines two partial rows for the same key.
_DECOMPOSABLE = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def _validate_aggs(aggs: dict) -> None:
    for out, (fn, _c) in aggs.items():
        if fn not in _DECOMPOSABLE:
            raise ValueError(f"{out}: '{fn}' is not a decomposable aggregate")


def _last_refreshed_version(dest: str) -> int | None:
    return _last_meta(dest).get("source_version")


def _require_no_deletes(
    spark: SparkSession, source: str, since: int, upto: int | None = None
) -> None:
    """Incremental maintenance is APPEND-only: a merge-on-read delete
    commit advances the source version without touching its data-file
    list, so read_increment's containment check passes while the
    derived state silently keeps the deleted rows forever (retracting a
    key from a sum needs the deleted rows' VALUES, which the key file
    doesn't carry).  Surface it loudly — rebuild from the full snapshot
    (delete dest), or compact the source first."""
    from ght2dm_spark.snapshots import read_delete_increment

    if read_delete_increment(spark, source, since, upto_version=upto) is not None:
        raise ValueError(
            f"{source}: merge-on-read delete commits landed after version "
            f"{since} — incremental maintenance cannot retract aggregated "
            "rows; rebuild the derived table (delete dest) or compact the "
            "source to materialize deletes first"
        )


def refresh_aggregate(
    spark: SparkSession,
    source: str,
    dest: str,
    keys: list[str],
    aggs: dict[str, tuple[str, str | None]],
    schema=None,
) -> bool:
    """Bring ``dest`` = ``source.groupBy(keys)`` up to date with the
    source snapshot, reading only files added since the last refresh.

    ``aggs`` maps output column -> (fn, source column), fn one of
    count/sum/min/max (column ignored for count).  Returns False when
    the source has nothing new (no commit made).  First call seeds from
    the full snapshot; later calls merge deltas.  Raises (via
    ``read_increment``) if the source was overwritten/compacted past the
    recorded version — rebuild by deleting ``dest``.
    """
    _validate_aggs(aggs)
    src_hist = history(source)
    if not src_hist:
        return False
    src_version = src_hist[-1]["seq"]

    # EVERY read below is pinned at src_version: version and file set
    # must come from one manifest, or a commit landing between the two
    # reads (a same-driver stream sink, a concurrent runner) is folded
    # into this refresh yet recorded as unprocessed — and double-counted
    # by the next one.
    last = _last_refreshed_version(dest)
    if last is None:
        delta = read_snapshot(spark, source, schema=schema, version=src_version)
    else:
        if src_version == last:
            return False
        _require_no_deletes(spark, source, last, upto=src_version)
        delta = read_increment(
            spark, source, since_version=last, schema=schema,
            upto_version=src_version,
        )
    if delta is None:
        return False

    partial = delta.groupBy(*keys).agg(
        *[
            _DECOMPOSABLE[fn][0](col).alias(out)
            for out, (fn, col) in aggs.items()
        ]
    )
    state = read_snapshot(spark, dest)
    if state is not None:
        merged = (
            state.select(partial.columns)
            .unionByName(partial)
            .groupBy(*keys)
            .agg(
                *[
                    _DECOMPOSABLE[fn][1](out).alias(out)
                    for out, (fn, _c) in aggs.items()
                ]
            )
        )
    else:
        merged = partial
    p = prepare_commit(
        merged, dest, mode="overwrite", meta={"source_version": src_version}
    )
    commit(p)
    return True


def verify_aggregate(
    spark: SparkSession,
    source: str,
    dest: str,
    keys: list[str],
    aggs: dict[str, tuple[str, str | None]],
    schema=None,
) -> bool:
    """Cross-check: derived state ≡ a full recompute over the source
    snapshot (the audit a maintenance pipeline runs on a sample cadence;
    at scale, run it per key-range).  True when they match exactly.
    The compare is EXACT (exceptAll) — use integer/decimal aggregate
    columns, the repo-wide exact-moment discipline: a float sum is
    accumulated in different orders by the incremental merges vs the
    recompute, and last-bit drift would fail a perfectly maintained
    table.

    The recompute runs at the SOURCE VERSION pinned in dest's meta, not
    the live snapshot — verifying maintenance correctness independent of
    freshness (an append landing between refresh and audit must not page
    anyone on a healthy table)."""
    _validate_aggs(aggs)
    ver = _last_refreshed_version(dest)
    full = (
        read_snapshot(spark, source, schema=schema, version=ver)
        if ver is not None
        else None
    )
    if full is None:
        # emptiness only — file names, never row contents, so the
        # merge-on-read guard does not apply
        return len(snapshot_files(dest, allow_deletes=True)) == 0
    expect = full.groupBy(*keys).agg(
        *[
            _DECOMPOSABLE[fn][0](col).alias(out)
            for out, (fn, col) in aggs.items()
        ]
    )
    got: DataFrame | None = read_snapshot(spark, dest)
    if got is None:
        return False
    cols = expect.columns
    a, b = expect.select(cols), got.select(cols)
    return (
        a.exceptAll(b).isEmpty()
        and b.exceptAll(a).isEmpty()
    )


def _last_meta(dest: str) -> dict:
    """meta of dest's CURRENT manifest — O(1): one pointer read + one
    manifest load, not a history() walk over the whole parent chain."""
    from pathlib import Path

    from ght2dm_spark.snapshots import _load_manifest, _read_current

    table = Path(dest)
    name = _read_current(table)
    if name is None:
        return {}
    return _load_manifest(table, name).get("meta", {})


def refresh_join(
    spark: SparkSession,
    left_source: str,
    right_source: str,
    dest: str,
    on: list[str],
    schema_left=None,
    schema_right=None,
) -> bool:
    """Maintain ``dest`` = ``left INNER JOIN right ON on`` reading only
    the rows appended to either side since the last refresh — the
    delta-join identity Δ(L⋈R) = ΔL⋈R₀ ∪ L₀⋈ΔR ∪ ΔL⋈ΔR, where L₀/R₀
    are TIME-TRAVEL reads of each source at the version the last
    refresh covered (pinned in the commit meta).  The three delta terms
    land as ONE append commit, so a crash mid-refresh leaves the old
    state and its versions intact and the next refresh re-derives the
    same delta.

    Valid for append-only sources (exactly read_increment's contract —
    an overwrite/compaction on either side raises there; and the
    retention window must keep the pinned versions' manifests, so
    vacuum no deeper than the refresh cadence).  At 100 TB this turns a
    nightly full O(|L|·|R|-shuffle) join into three joins each bounded
    by a delta on one side — the same reason CDC pipelines never
    re-join history.  First call seeds with the full join.  Returns
    False when neither source moved."""
    lh, rh = history(left_source), history(right_source)
    if not lh or not rh:
        return False
    lv, rv = lh[-1]["seq"], rh[-1]["seq"]
    meta = _last_meta(dest)
    last_lv, last_rv = meta.get("left_version"), meta.get("right_version")

    if last_lv is None:
        # pinned at (lv, rv) — the recorded versions must be exactly
        # what was read (see refresh_aggregate's TOCTOU note)
        left = read_snapshot(spark, left_source, schema=schema_left, version=lv)
        right = read_snapshot(spark, right_source, schema=schema_right, version=rv)
        if left is None or right is None:
            return False
        p = prepare_commit(
            left.join(right, on),
            dest,
            mode="overwrite",
            meta={"left_version": lv, "right_version": rv},
        )
        commit(p)
        return True

    if lv == last_lv and rv == last_rv:
        return False
    _require_no_deletes(spark, left_source, last_lv, upto=lv)
    _require_no_deletes(spark, right_source, last_rv, upto=rv)
    dl = (
        read_increment(
            spark, left_source, since_version=last_lv, schema=schema_left,
            upto_version=lv,
        )
        if lv != last_lv
        else None
    )
    dr = (
        read_increment(
            spark, right_source, since_version=last_rv, schema=schema_right,
            upto_version=rv,
        )
        if rv != last_rv
        else None
    )
    # each time-travel base is needed only by its opposite delta term —
    # skip the manifest load and plan build when that term is absent
    # (the static-dimension common case)
    r0 = (
        read_snapshot(spark, right_source, schema=schema_right, version=last_rv)
        if dl is not None
        else None
    )
    l0 = (
        read_snapshot(spark, left_source, schema=schema_left, version=last_lv)
        if dr is not None
        else None
    )
    parts = []
    if dl is not None and r0 is not None:
        parts.append(dl.join(r0, on))
    if dr is not None and l0 is not None:
        parts.append(l0.join(dr, on))
    if dl is not None and dr is not None:
        parts.append(dl.join(dr, on))
    if not parts:
        return False
    delta = parts[0]
    for x in parts[1:]:
        delta = delta.unionByName(x)
    p = prepare_commit(
        delta,
        dest,
        mode="append",
        meta={"left_version": lv, "right_version": rv},
    )
    commit(p)
    return True
