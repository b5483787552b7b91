"""Oracle output-type sweep — the r04 failure class made mechanical.

DuckDB's bare ``sum()`` over integers is HUGEINT (int128); its
client-side canonicalization of int128 is version-sensitive, which
produced the only two r04 driver hash mismatches (values bit-exact,
hashes different).  Every oracle must therefore CAST integer aggregates
to BIGINT before they reach the output row.  DESCRIBE plans the query
without executing it, so sweeping all ~250 oracles is cheap.
"""

from __future__ import annotations

from ght2dm_spark.queries import ORACLE


def test_no_oracle_emits_hugeint(duck):
    offenders = {}
    for name, sql in ORACLE.items():
        try:
            cols = duck.sql(f"DESCRIBE {sql}").fetchall()
        except Exception:
            # a DESCRIBE that cannot plan would fail the execution tests
            # loudly; this sweep only guards output TYPES
            continue
        bad = [
            (c[0], c[1])
            for c in cols
            if "INT128" in c[1].upper() or "HUGEINT" in c[1].upper()
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "HUGEINT-typed oracle outputs (CAST to BIGINT — the r04 "
        f"driver-hash failure class): {offenders}"
    )
