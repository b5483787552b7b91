"""The primary correctness gate, run locally: every declared query with an
oracle is executed by Spark AND DuckDB over the same parquet and compared
exactly (SURVEY §5 item 1).  Queries without an oracle get a rows-run smoke
check, mirroring the driver's weaker rows-only path.
"""

from __future__ import annotations

import pytest

from ght2dm_spark.queries import ORACLE, QUERIES
from tests.conftest import assert_oracle_match


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLE:
        assert_oracle_match(df, duck, ORACLE[name], name=name)
    else:
        assert df.count() >= 0  # rows-only smoke


def test_every_oracle_has_query():
    assert set(ORACLE) <= set(QUERIES)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
