"""IO layer: parquet table loading + file-date provenance.

The reference reads per-entity directories of date-named dump files and
derives a per-file date used for newest-wins precedence
(``/root/reference/ght2dm.go:985-1029``).  Here that becomes a plain column
recovered from ``input_file_name()`` at scan time — no driver-side listing,
so it scales to millions of input files (the listing is Spark's, distributed
and incremental).
"""

from __future__ import annotations

import logging
import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_log = logging.getLogger(__name__)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: unanchored date pattern, mirroring the reference's filename filter
#: (``ght2dm.go:1023`` uses an unanchored MatchString on
#: ``[0-9]{4}-[0-9]{2}-[0-9]{2}\.bson``)
FILE_DATE_PATTERN = r"(\d{4}-\d{2}-\d{2})"


def _table_cache(spark) -> dict:
    """Per-session DataFrame cache — a DataFrame is a plan, not data, so
    caching the object just avoids re-running footer/schema jobs per
    query build.  Stored ON the session object: a module-level
    WeakKeyDictionary can never evict here, because the cached
    DataFrames hold their session strongly (value→key reference), so
    every stopped session and its plans would leak for the process
    lifetime; an attribute's lifetime is exactly the session's."""
    cache = getattr(spark, "_ght2dm_table_cache", None)
    if cache is None:
        cache = {}
        spark._ght2dm_table_cache = cache
    return cache

# Weak set, not id()-keyed: CPython recycles ids after GC, so an id memo
# could mistake a brand-new session for an already-configured dead one and
# skip the UTC pin that every NTZ identity-reinterpretation depends on.
_conf_ensured: weakref.WeakSet = weakref.WeakSet()


def ensure_session_conf(spark: SparkSession) -> None:
    """Pin runtime-settable SQL confs on an externally-created session.

    The driver's verify constructs its OWN SparkSession and hands it to each
    query, so nothing from :mod:`ght2dm_spark.session` applies there.  Query
    semantics must not depend on ambient config — in particular the session
    time zone (TIMESTAMP_NTZ vs timestamp-literal comparisons shift by the
    TZ offset otherwise) — and small-SF latency should not pay for a default
    200-partition shuffle.  Performance confs are best-effort; the time zone
    is load-bearing for correctness, so failure to pin it is an error, not a
    silent skip.
    """
    if spark in _conf_ensured:
        return
    for k, v in (
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE", "16")),
        # harmless when events.ts is plain micros; required to read NANOS
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            _log.warning("could not set %s=%s on external session", k, v)
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception as exc:
        raise RuntimeError(
            "cannot pin spark.sql.session.timeZone=UTC — timestamp results "
            "would depend on the hosting process's zone"
        ) from exc
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        raise RuntimeError("spark.sql.session.timeZone did not stick at UTC")
    _conf_ensured.add(spark)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (``<sf_dir>/<name>.parquet``) with its
    declared schema (no inference job — SURVEY §1.3).

    ``events.ts`` is parquet TIMESTAMP(NANOS); under
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as a long which we
    truncate to microseconds — matching DuckDB's nanos→micros cast, so both
    engines see identical values.
    """
    ensure_session_conf(spark)
    per_session = _table_cache(spark)
    key = (sf_dir, name)
    if key in per_session:
        return per_session[key]
    from ght2dm_spark.schemas import TESTDATA

    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        schema, ns_ts = events_read_schema(path)
    elif name in TESTDATA:
        schema, ns_ts = TESTDATA[name], False
    else:
        # a typo must be an immediate error naming the table, not a
        # silent schema-INFERENCE job whose types can drift from the
        # declared ones (the module contract: no inference, SURVEY §1.3)
        raise ValueError(
            f"unknown testdata table {name!r} — declared tables: "
            f"{sorted(TESTDATA)}"
        )
    df = spark.read.schema(schema).parquet(path) if schema is not None else (
        spark.read.parquet(path)
    )
    if ns_ts:
        df = df.withColumn("ts", normalize_ns_ts("ts"))
    per_session[key] = df
    return df


def events_read_schema(path: str):
    """Schema to read the events parquet with, plus whether ``ts`` needs
    the nanos-long → timestamp conversion afterwards.  Shared by the batch
    and streaming readers so both see identical rows."""
    from pyspark.sql import types as T

    from ght2dm_spark.schemas import TESTDATA

    schema = TESTDATA["events"]
    if _events_ts_is_nanos(path):
        return schema, True
    # ts is plain parquet TIMESTAMP (micros) — read it natively as NTZ.
    return (
        T.StructType(
            [
                T.StructField("ts", T.TimestampNTZType(), f.nullable)
                if f.name == "ts"
                else f
                for f in schema.fields
            ]
        ),
        False,
    )


def normalize_ns_ts(col_name: str):
    """TIMESTAMP(NANOS)-as-long → TIMESTAMP_NTZ, truncating to micros
    exactly like DuckDB's nanos→micros cast on the PARQUET path.
    Probed (pyarrow timestamp('ns') parquet → `CAST(ts AS TIMESTAMP)`):
    DuckDB truncates toward zero for pre-epoch values (-877 ns →
    1970-01-01 00:00:00, -1999 ns → 23:59:59.999999), which is exactly
    Spark's integer ``div`` — so ``div`` IS the parity-correct form.
    (DuckDB's STRING-literal timestamp_ns cast floors instead; that
    path never feeds the oracle, which reads parquet views.)  Integer
    ``div``, never float division — ns epochs exceed double's 2^53
    exact range; NTZ (not LTZ) so collected values don't shift with the
    verifying process's time zone."""
    return F.expr(f"timestamp_micros({col_name} div 1000)").cast("timestamp_ntz")


import functools


def _events_ts_is_nanos(path: str) -> bool:
    """One footer read deciding how ``events.ts`` is physically encoded.

    The driver's generator has shipped it both as TIMESTAMP(NANOS) (which
    Spark can only read as a long, via ``nanosAsLong``) and as plain
    TIMESTAMP(MICROS); guessing wrong shifts every timestamp by 1000x, so
    ask the file instead of assuming.  Footer-only — no data IO, and
    memoized on (path, mtime, size) — NOT path alone, so a file
    regenerated in-place with the other ts encoding inside one process
    (test/bench fixture rebuilds do this) re-probes instead of silently
    mis-scaling every timestamp by 1000x through a stale memo.  A
    directory "dump" keys on the directory's own stat (cheap, catches
    part-file rewrites via the dir mtime on every POSIX rename into it).

    pyarrow missing is a real environment problem, not a "file is micros"
    signal — re-raise it so the operator sees the cause, not a downstream
    PARQUET_TYPE_ILLEGAL.  Only a failed footer read (corrupt file, path a
    stream source will materialize later, schema without ``ts``) falls back
    to the declared-micros schema, and loudly.
    """
    try:
        st = os.stat(path)
        key = (st.st_mtime_ns, st.st_size)
    except OSError:
        key = (0, 0)  # not materialized yet — probe (and fail) uncached
    return _events_ts_probe(path, key)


@functools.lru_cache(maxsize=64)
def _events_ts_probe(path: str, stat_key: tuple[int, int]) -> bool:
    import pyarrow.dataset as ds
    import pyarrow.types as pt

    try:
        f = ds.dataset(path, format="parquet").schema.field("ts")
    except Exception as exc:
        _log.warning(
            "events footer probe failed for %s (%s); assuming micros ts", path, exc
        )
        return False
    return pt.is_timestamp(f.type) and f.type.unit == "ns"


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def read_dated_dumps(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read a directory of date-named dump files, adding provenance columns.

    Reproduces the reference's S2/S3 scan semantics
    (``ght2dm.go:1014-1029``): files whose names don't contain a
    ``YYYY-MM-DD`` date are skipped; the parsed date is carried as
    ``file_date`` so downstream newest-wins dedup (operators.dedup) can
    order by it.  Works for parquet dumps; BSON dumps go through
    :mod:`ght2dm_spark.sources.bson` first.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    # A parquet "dump" is a DIRECTORY (Spark writes part files inside),
    # so the dump date lives on the deepest dated path component, not
    # the basename.  Take the RIGHTMOST date match: matched leftmost
    # against the full input_file_name() path, a dated ANCESTOR
    # directory would shadow a file's own newer date and invert
    # newest-wins precedence (.../snapshot-2023-05-01/2024-03-01.parquet
    # must be 2024-03-01).  Paths with no date anywhere are SKIPPED
    # (ght2dm.go:1027), not crashed on — hence the try_element_at NULL.
    # Documented trade of the rightmost rule: an UNDATED file under a
    # dated directory inherits the directory's date — necessarily, since
    # parquet part files are themselves undated; a stray undated file
    # parked inside a dated batch dir is structurally indistinguishable
    # from a part file and is ingested with that date (the reference,
    # matching single .bson basenames only, would skip it).
    dates = F.regexp_extract_all(
        F.input_file_name(), F.lit(FILE_DATE_PATTERN), F.lit(1)
    )
    # try_to_date, not to_date: under ANSI mode (the Spark 4 default) a
    # date-SHAPED but non-calendar token ('1234-56-78' carved out of a
    # longer digit run by the unanchored pattern) would otherwise crash
    # the whole read; the skip contract wants NULL → filtered.
    return df.withColumn(
        "file_date", F.try_to_date(F.try_element_at(dates, F.lit(-1)))
    ).filter(F.col("file_date").isNotNull())


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
    **options: str,
) -> None:
    """Bulk sink — replaces the reference's row-at-a-time INSERT (S5,
    ``ght2dm.go:962-979``) and COPY (S6, ``ght2dm.go:510``).  Parquet is
    the scale default (columnar, compressed, prunable); csv/json exist
    for interchange — never for the 100 TB hot path."""
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if options:
        writer = writer.options(**options)
    writer.save(path)


def read_table_fmt(
    spark: SparkSession, path: str, schema, fmt: str = "parquet", **options: str
) -> DataFrame:
    """Schema-declared read for any format (inference stays banned —
    SURVEY §1.3; for csv/json an inference pass is a full extra scan)."""
    reader = spark.read.format(fmt).schema(schema)
    if options:
        reader = reader.options(**options)
    return reader.load(path)


def write_range_clustered(
    df: DataFrame, path: str, cluster_cols: list[str], num_files: int, **options: str
) -> None:
    """Range-clustered parquet layout: repartitionByRange + per-file sort
    on ``cluster_cols`` gives files with disjoint key ranges and sorted
    row groups, so parquet min/max statistics prune both files and row
    groups for range predicates on those columns.  This is the layout
    knob behind 'filters reach the scan': pushdown only skips IO when
    the physical layout clusters the data.  Range boundaries come from
    Spark's reservoir sampling of the keys — balanced even under skew."""
    (
        df.repartitionByRange(num_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .options(**options)
        .parquet(path)
    )


def compact_table(
    spark: SparkSession,
    path: str,
    schema=None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files and
    return the new file count.  Small-file proliferation (per-micro-batch
    appends, over-parallel writers) is a first-order 100 TB problem:
    every file costs a footer read, a task, and namenode pressure.

    Sizing uses the CURRENT compressed bytes on disk, so the rewrite
    keeps file sizes near the parquet sweet spot regardless of the input
    row width.  The rewrite goes through a temp dir + atomic rename —
    reading and overwriting the same path in one job would clobber the
    input mid-scan.  (Sizing walks the local FS here; on a cluster the
    identical listing comes from the Hadoop FileSystem API.)"""
    import shutil

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n = max(1, -(-total // target_file_bytes))  # ceil
    reader = spark.read.schema(schema) if schema is not None else spark.read
    tmp = path.rstrip("/") + "__compact_tmp"
    reader.parquet(path).coalesce(n).write.mode("overwrite").parquet(tmp)
    # Two renames, not rmtree-then-rename: a kill after an rmtree would
    # leave the published path NONEXISTENT with the new data stranded in
    # the temp dir.  Renaming the old dir aside first narrows the
    # no-path window to the instant between the two renames, and either
    # crash outcome leaves a complete directory to recover from.  (The
    # snapshots layer's pointer flip is the fully atomic answer; this
    # in-place rewrite is for plain directories outside it.)
    trash = path.rstrip("/") + "__compact_old"
    shutil.rmtree(trash, ignore_errors=True)
    os.rename(path, trash)
    os.rename(tmp, path)
    shutil.rmtree(trash)
    return len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int,
    bits: int = 16,
    **options: str,
) -> None:
    """Z-order-clustered parquet layout: range-partition + sort on the
    Morton interleave of (col_a, col_b), so every file covers a small
    RECTANGLE in (a, b) space and parquet min/max statistics prune scans
    filtered on EITHER or BOTH columns — the Delta/Iceberg OPTIMIZE
    ZORDER layout, built from public Spark primitives.  Compare
    write_range_clustered, which clusters only its leading column.

    Both columns are min-max scaled to the full 16-bit interleave width
    before the Morton key — otherwise the wider-ranged column's high
    bits dominate and the narrow column ends up unclustered (observed: a
    200-value dimension next to a 6000-value one got zero locality).
    The layout itself is ``operators.layout.zorder_layout`` — ONE Morton
    implementation, not a per-writer copy that drifts.
    """
    if bits != 16:
        raise ValueError(
            "the Morton layout interleaves exactly 16 scaled bits per "
            "column (operators.layout); pass bits=16"
        )
    from ght2dm_spark.operators.layout import zorder_layout

    (
        zorder_layout(df, [col_a, col_b], num_files)
        .write.mode("overwrite")
        .options(**options)
        .parquet(path)
    )
