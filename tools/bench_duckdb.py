"""Head-to-head single-node throughput: DuckDB runs every headline
query's oracle SQL over the same parquet, timed the same way bench.py
times Spark (median of N reps), so BENCH_r{N}.json numbers can be read
against a strong native baseline at the same scale factor.

Usage:
    python tools/bench_duckdb.py [path/to/bench.json]

Prints one JSON line {"metric": "duckdb_oracle_wall_clock", "value":
total_sec, "queries": {...}, "sf": ...}; if a bench.py JSON is given,
also a per-query spark/duckdb ratio table on stderr.

Caveats for honest reading: DuckDB here is a *single-process native
columnar engine with zero startup/JIT overhead* — the right bar for
"matches-or-beats single-node throughput".  Spark's per-query constant
(~100-300 ms of planning + task scheduling at local[32]) dominates the
small queries; the ratio that matters is on the heavy scans/joins,
where both engines are IO/CPU-bound.  Queries whose oracle is a
deliberately NAIVE formulation (unrolled iterative rounds, recursive
CTE closures, quadratic pair enumerations) are excluded — timing the
oracle there would measure the check, not the operator.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE  # noqa: E402
from ght2dm_spark.queries import ORACLE  # noqa: E402

#: Oracles that are deliberately naive checking formulations, not
#: implementations (timing them would strawman DuckDB).
NAIVE_ORACLES = {
    "t1_bfs_levels",  # unrolled per-round CTEs
    "t1_pagerank",  # unrolled per-round CTEs
    "t1_kmeans_clusters",  # unrolled per-round CTEs
    "t1_minhash_lsh_pairs",  # generated strpos-nibble hex parsing
    "t1_simhash",  # generated strpos-nibble hex parsing
    "t1_contamination_check",  # shingle blowup without the broadcast index
    "t1_line_dedup",  # positional reassembly via quadratic joins
    "t1_corpus_build_pipeline",  # composes the md5-nibble machinery
    "t1_triangle_count",  # relies on engine join order for the threshold
    "t1_ann_lsh_topk",  # signature build via generated strpos-nibble hex parsing
    "t1_audio_fingerprint",  # oracle PREDICTS samples analytically; Spark decodes real WAV bytes — not equivalent work
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for p in sorted(Path(sf_dir).glob("*.parquet")):
        con.execute(
            f"CREATE VIEW {p.stem} AS SELECT * FROM read_parquet('{p}')"
        )

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in ORACLE or name in NAIVE_ORACLES:
            continue
        sql = ORACLE[name]
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            n = len(con.execute(sql).fetchall())
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)
        print(
            f"# {name}: p50 {timings[name]:.3f}s of "
            f"{[round(s, 3) for s in samples]} ({n} rows)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 4)
    out = {
        "metric": "duckdb_oracle_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }

    if len(sys.argv) > 1:
        spark = json.loads(Path(sys.argv[1]).read_text())["queries"]
        print(
            f"# {'query':32s} {'spark':>8s} {'duckdb':>8s} {'ratio':>7s}",
            file=sys.stderr,
        )
        for name, d in sorted(timings.items()):
            s = spark.get(name)
            if s:
                print(
                    f"# {name:32s} {s:8.3f} {d:8.3f} {s / d:7.2f}x",
                    file=sys.stderr,
                )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
