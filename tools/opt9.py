"""Round-9 optimization harness: per-query timing + plan capture.

Usage:
  python tools/opt9.py time <query> [reps]      # median noop-sink time at sf0.1
  python tools/opt9.py explain <query> <out>    # .explain('formatted') -> file
  python tools/opt9.py snap <out_suffix> <q>...  # plans/r09/<q>_<suffix>.txt each

Timing methodology matches bench.py exactly (run_full = noop sink +
observed count, warmup rep excluded, median of reps) so numbers are
comparable to BENCH_QUERIES.json.  Run SOLO — concurrent load inflates
20-30%.
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from bench import run_full  # noqa: E402
from ght2dm_spark.queries import QUERIES  # noqa: E402
from ght2dm_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark():
    return get_spark(app_name="opt9")


def cmd_time(names: list[str], reps: int = 3) -> None:
    spark = _spark()
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"opt9 warmup {name}")
        run_full(fn(spark, SF_DIR))  # warmup (codegen, page cache)
        samples = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"opt9 {name} rep{i}")
            t0 = time.perf_counter()
            n = run_full(fn(spark, SF_DIR))
            samples.append(time.perf_counter() - t0)
        print(
            f"{name}: p50 {statistics.median(samples):.3f}s of "
            f"{[round(s, 3) for s in samples]} ({n} rows)"
        )


def cmd_explain(name: str, out: str) -> None:
    spark = _spark()
    df = QUERIES[name](spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    Path(out).write_text(plan)
    print(f"wrote {out} ({len(plan)} bytes)")


def cmd_snap(suffix: str, names: list[str]) -> None:
    spark = _spark()
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        out = REPO / "plans" / "r09" / f"{name}_{suffix}.txt"
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(plan)
        print(f"wrote {out} ({len(plan)} bytes)")


def main() -> None:
    cmd, *rest = sys.argv[1:]
    if cmd == "time":
        reps = 3
        if rest and rest[-1].isdigit():
            reps = int(rest[-1])
            rest = rest[:-1]
        cmd_time(rest, reps)
    elif cmd == "explain":
        cmd_explain(rest[0], rest[1])
    elif cmd == "snap":
        cmd_snap(rest[0], rest[1:])
    else:
        raise SystemExit(f"unknown command {cmd!r}")


if __name__ == "__main__":
    main()
