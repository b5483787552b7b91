"""Driver-sim: consume the repo exactly as the per-round verify does.

Imports ``__spark_entry__`` from the repo root, runs ``entry()`` (smoke),
then every ``queries()[name]`` at sf0.01 compared against
``oracle_sql()[name]`` via DuckDB — row count, sorted column names, and
order-insensitive exact values.  Exit code 1 on any mismatch.
"""

from __future__ import annotations

import math
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from ght2dm_spark.io import TABLES  # noqa: E402
from ght2dm_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SIM_SF_DIR", "/root/testdata/sf0.01")


def canon(cols, rows):
    """Byte-faithful canonical form: floats compare by IEEE-754 bit
    pattern, NOT by ``==``.  The driver's value hash distinguishes
    -0.0 from +0.0 (r8: ``t1_heaps_exponent`` hashed red on a signed
    zero this sim's old ``v == 0.0`` fold could not see) — the local
    gate must see exactly what the driver sees, and any zero
    normalization is a QUERY-side obligation on both engines."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        t = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = "__nan__" if math.isnan(v) else struct.pack("<d", v).hex()
            t.append(v)
        out.append(tuple(t))
    out.sort(key=repr)
    return out


def negzero_cells(cols, rows):
    """Columns holding a literal -0.0 cell — banned on EITHER engine:
    Spark's BigDecimal round never emits one while DuckDB's std::round
    preserves them, so any -0.0 on a hashed surface is a latent
    cross-engine hash split (the r8 class)."""
    bad = set()
    for r in rows:
        for i, v in enumerate(r):
            if isinstance(v, float) and v == 0.0 and math.copysign(1.0, v) < 0:
                bad.add(cols[i])
    return sorted(bad)


def main() -> int:
    spark = get_spark(app_name="driver-sim", shuffle_partitions=8)
    df = e.entry(spark)
    print("entry(): rows =", len(df.collect()), "cols =", df.columns)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs, osql = e.queries(), e.oracle_sql()
    # Default: every query, alphabetical (full audit).  ``--limit N`` walks
    # the first N in REGISTRY order (what the driver's time-budgeted window
    # sees); explicit names walk just those.
    args = sys.argv[1:]
    if args and args[0] == "--limit":
        walk = list(qs.items())[: int(args[1])]
    elif args:
        walk = [(n, qs[n]) for n in args]
    else:
        walk = sorted(qs.items())
    fails = []
    for name, fn in walk:
        try:
            sdf = fn(spark, SF)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ERROR {ex}")
            fails.append(name)
            continue
        nz = negzero_cells(sdf.columns, srows)
        if name not in osql:
            if nz:
                print(f"{name}: NEGZERO in {nz}")
                fails.append(name)
                continue
            print(f"{name}: rows-only, {len(srows)} rows")
            continue
        res = con.sql(osql[name])
        drows = res.fetchall()
        nz += [f"oracle:{c}" for c in negzero_cells(res.columns, drows)]
        ok = (
            len(srows) == len(drows)
            and sorted(sdf.columns) == sorted(res.columns)
            and canon(sdf.columns, srows) == canon(res.columns, drows)
            and not nz
        )
        tag = "OK" if ok else ("NEGZERO " + ",".join(nz) if nz else "MISMATCH")
        print(f"{name}: {tag} ({len(srows)} rows)")
        if not ok:
            fails.append(name)
    print("FAILED:", fails if fails else "none")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
