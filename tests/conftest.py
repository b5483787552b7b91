"""Shared fixtures: one local SparkSession + a DuckDB oracle harness that
mirrors the driver's compare (row-count, schema, order-insensitive values).
"""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from ght2dm_spark.io import TABLES  # noqa: E402
from ght2dm_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ght2dm_spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon_cell(v):
    # floats: compare exactly, but map -0.0 → 0.0 and NaN → a marker so
    # sorting/equality is well-defined
    if isinstance(v, float):
        if math.isnan(v):
            return "__nan__"
        if v == 0.0:
            return 0.0
    return v


def canonicalize(cols, rows):
    """Sort columns by name, then rows — the driver's order-insensitive
    compare. Returns (sorted_col_names, sorted list of tuples)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def assert_oracle_match(spark_df, duck_con, oracle_sql, name=""):
    # No TIMESTAMP (LTZ) output columns, ever: an LTZ value shifts at
    # collect() with the verifying PROCESS's time zone, so a query can be
    # value-correct in-plan yet hash-mismatch when the driver's harness
    # runs outside UTC.  All testdata timestamps are NTZ; results must
    # stay NTZ (functions.to_ts / trunc_ntz / epoch_us).
    from pyspark.sql.types import TimestampType

    ltz = [f.name for f in spark_df.schema.fields if isinstance(f.dataType, TimestampType)]
    assert not ltz, f"{name}: TIMESTAMP (LTZ) output columns {ltz} — use TIMESTAMP_NTZ"

    srows = [tuple(r) for r in spark_df.collect()]
    scols = list(spark_df.columns)
    res = duck_con.sql(oracle_sql)
    dcols = list(res.columns)
    drows = [tuple(r) for r in res.fetchall()]

    assert len(srows) == len(drows), (
        f"{name}: row count mismatch spark={len(srows)} duckdb={len(drows)}"
    )
    sc, sr = canonicalize(scols, srows)
    dc, dr = canonicalize(dcols, drows)
    assert sc == dc, f"{name}: column mismatch {sc} vs {dc}"
    for i, (a, b) in enumerate(zip(sr, dr)):
        assert a == b, f"{name}: first differing row #{i}:\n spark={a}\nduckdb={b}"
    return len(srows)
