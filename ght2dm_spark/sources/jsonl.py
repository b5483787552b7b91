"""JSONL / CSV ingestion with fail-and-continue reject routing — the
reference's E1 error discipline (``ght2dm.go:700-714``: a bad record
rejects, the import continues) applied to the formats raw corpus drops
actually arrive in (``*.jsonl`` / ``*.jsonl.gz`` crawl shards, CSV
exports).

Built on Spark's native readers, so the scale properties come free:
PERMISSIVE mode with ``columnNameOfCorruptRecord`` routes malformed
records into the same ``_corrupt`` column the BSON source uses
(``sources/bson.py``), and :func:`ght2dm_spark.sources.bson.split_rejects`
splits them identically — one reject contract across every source.
Gzip is transparent (Spark decompresses by extension); a ``.gz`` file
is a single split, so shard raw drops into many files for parallelism
(the docstring'd rule: the FILE COUNT is the parallelism at 100 TB).

Schema is explicit, never inferred — inference is a full extra pass
over 100 TB and a correctness hazard (a shard of all-null columns
infers string).  The declared schema is amended with the corrupt
column here so callers don't have to remember it.

One Spark rule to know (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
COLUMN): a query whose pruned column set is ONLY the corrupt column —
e.g. ``rejects.count()`` straight off the reader — is rejected by the
analyzer because the parser never ran for the other columns.  Audit
counts over rejects therefore either select a data column too, or
cache the parsed frame first (what a reject-quarantine sink does
anyway before writing both streams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_CORRUPT = "_corrupt"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if _CORRUPT in [f.name for f in schema.fields]:
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType(), True)]
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Read newline-delimited JSON (optionally gzipped) with malformed
    records routed to ``_corrupt`` instead of failing the job.  Rows
    with a parseable frame but missing fields get NULLs (the reference's
    missing-tag policy, SURVEY §2.2 P1); rows that don't parse at all
    carry the raw line in ``_corrupt`` and NULL everywhere else."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """Read CSV with the same reject contract: malformed rows (wrong
    arity, uncastable values) land in ``_corrupt`` with the raw line
    preserved; well-formed rows flow through typed."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("header", "true" if header else "false")
        .option("sep", delimiter)
        .csv(path)
    )


def read_xml(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    row_tag: str = "row",
) -> DataFrame:
    """Read XML (native in Spark 4 — the spark-xml package merged into
    core) with the same reject contract: records under ``row_tag``
    parse against the declared schema, malformed elements land in
    ``_corrupt`` with the raw snippet preserved, missing child elements
    get NULLs (the P1 missing-tag policy verbatim — XML is the format
    the policy was originally about).

    Scale: same native-reader properties as JSONL — schema declared
    (never inferred), gzip transparent by extension, file count = the
    parallelism, and multi-record files split on the row tag."""
    return (
        spark.read.format("xml")
        .schema(_with_corrupt(schema))
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .load(path)
    )
