"""Column cleaning functions — the reference's per-row string hygiene as
vectorized column expressions (all JVM-side built-ins; whole-stage codegen).

Zero-value vs NULL fidelity (SURVEY §1.3): BSON-missing fields become Go
zero values (``""``/``0``/``false``) in the reference; Parquet-missing
fields become NULL here.  :func:`zero_default` reproduces the zero-value
reading where the reference tests ``== ""``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_null_bytes(col: Column | str) -> Column:
    """Strip 0x00 bytes — ``removeNullByte``, applied to all repo string
    columns before insert (``/root/reference/ght2dm.go:573-575,596-617``)."""
    return F.regexp_replace(F.col(col) if isinstance(col, str) else col, "\x00", "")


def empty_to_null(col: Column | str) -> Column:
    """Empty string → NULL — repos date handling (F6,
    ``/root/reference/ght2dm.go:581-594``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(c, F.lit(""))


def coalesce_empty(col: Column | str, fallback: Column | str) -> Column:
    """``col`` if non-empty else ``fallback`` — the users/orgs
    ``updated_at ← created_at`` coalesce (C8,
    ``/root/reference/ght2dm.go:352-354,387-389``)."""
    fb = F.col(fallback) if isinstance(fallback, str) else fallback
    return F.coalesce(empty_to_null(col), fb)


def zero_default(col: Column | str, default: str) -> Column:
    """Empty-or-NULL → literal default — ``buildClonePath``'s substitutions
    (C9, ``/root/reference/ght2dm.go:552-565``)."""
    return F.coalesce(empty_to_null(col), F.lit(default))


def to_ts(col: Column | str) -> Column:
    """ISO-8601 string → timestamp, empty → NULL first (C7+F6) — the
    reference lets PostgreSQL cast at insert
    (``db/create_tmp_tables.sql:30-32``).

    TIMESTAMP_NTZ, not TIMESTAMP: every testdata timestamp is
    isAdjustedToUTC=false, and an LTZ result column shifts under
    ``collect()`` when the verifying process runs in a non-UTC zone —
    the values would be right in-plan yet hash-mismatch the oracle."""
    return empty_to_null(col).cast("timestamp_ntz")


def epoch_us(col: Column | str) -> Column:
    """Integer microseconds since epoch from a TIMESTAMP_NTZ column.

    ``unix_micros`` only accepts TIMESTAMP (LTZ), so NTZ goes through a
    cast first; the session time zone is pinned to UTC by
    ``io.ensure_session_conf`` making the cast an identity reinterpretation
    regardless of where the hosting process runs."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def trunc_ntz(unit: str, col: Column | str) -> Column:
    """``date_trunc`` that stays TIMESTAMP_NTZ.

    Spark's ``date_trunc`` always returns TIMESTAMP (LTZ), which shifts
    at ``collect()`` under a non-UTC host process; with the session zone
    pinned to UTC (io.ensure_session_conf) the round-trip cast is an
    identity reinterpretation, so truncated buckets stay comparable to a
    naive-timestamp oracle."""
    return F.date_trunc(unit, col).cast("timestamp_ntz")
