"""The primary correctness gate, run locally: every declared query with an
oracle is executed by Spark AND DuckDB over the same parquet and compared
exactly (SURVEY §5 item 1).  Queries without an oracle get a rows-run smoke
check, mirroring the driver's weaker rows-only path.

Every oracle query must also return AT LEAST ONE ROW: a zero-row result
trivially hash-matches its oracle and verifies nothing — round 8 found
``t1_code_ratio_filter`` had been driver-green on an empty compare at
every scale factor (the symbol-free synthetic corpus could never trip
its filter).  A query whose empty result would be LEGITIMATE at some SF
belongs in ``EMPTY_OK`` with a reason; there are currently none.
"""

from __future__ import annotations

import pytest

from ght2dm_spark.queries import ORACLE, QUERIES
from tests.conftest import assert_oracle_match

#: name -> reason a zero-row result is a real answer, not a vacuous pass
EMPTY_OK: dict[str, str] = {
    # Both are oracle-compared EXACTLY like every other query; the
    # allowlist only waives the nonzero-row floor at the suite's tiny
    # fixture.  The driver's correctness window runs at sf0.01 where
    # both return rows (r8 verdict re-verified: 7 and 10 rows).
    "q2_min_acctbal_supplier": (
        "empty at sf0.001 (no part has a qualifying EUROPE supplier at "
        "that scale), 7 rows oracle-exact at sf0.01"
    ),
    "q7_nation_volume": (
        "empty at sf0.001 (no FRANCE<->GERMANY lineitem in the 1995-1996 "
        "ship window at that scale), 10 rows oracle-exact at sf0.01"
    ),
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLE:
        n = assert_oracle_match(df, duck, ORACLE[name], name=name)
        assert n > 0 or name in EMPTY_OK, (
            f"{name}: zero-row result trivially matches its oracle and "
            "verifies nothing (the r8 t1_code_ratio_filter class) — make "
            "the query select data (plant deterministic fixtures if the "
            "corpus can't trip it) or allowlist with a reason in EMPTY_OK"
        )
    else:
        assert df.count() >= 0  # rows-only smoke


def test_every_oracle_has_query():
    assert set(ORACLE) <= set(QUERIES)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
