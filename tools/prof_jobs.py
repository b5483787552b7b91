"""Per-query job breakdown: run a declared query once (noop-sink, same
methodology as bench.run_full) with the UI enabled, then dump every
Spark job's duration, description, and stage shuffle totals from the
REST API — the local stand-in for the Spark UI's Jobs page (guide
section 1.1/1.5).

Usage: python tools/prof_jobs.py <query> [<query>...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["SPARK_GRAFT_UI"] = "true"

from bench import run_full  # noqa: E402
from ght2dm_spark.queries import QUERIES  # noqa: E402
from ght2dm_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    spark = get_spark(app_name="prof_jobs")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    for name in sys.argv[1:]:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"warmup {name}")
        run_full(fn(spark, SF_DIR))  # warmup: codegen + page cache
        first = len(_api(ui, f"applications/{app_id}/jobs"))
        spark.sparkContext.setJobDescription(f"timed {name}")
        t0 = time.perf_counter()
        run_full(fn(spark, SF_DIR))
        wall = time.perf_counter() - t0
        jobs = _api(ui, f"applications/{app_id}/jobs")
        fresh = [j for j in jobs if j["jobId"] >= first]
        fresh.sort(key=lambda j: j["jobId"])
        total_ms = 0
        print(f"\n=== {name}: wall {wall:.3f}s, {len(fresh)} jobs ===")
        for j in fresh:
            t_sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            t_end = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            # sub-second precision from the GMT suffix fields
            ms = (time.mktime(t_end) - time.mktime(t_sub)) * 1000
            ms += int(j["completionTime"][20:23]) - int(j["submissionTime"][20:23])
            total_ms += ms
            desc = (j.get("description") or j["name"])[:100]
            print(
                f"  job {j['jobId']:>4} {ms:7.0f}ms tasks={j['numTasks']:<5} {desc}"
            )
        print(f"  sum of job times: {total_ms / 1000:.3f}s (gaps = driver work)")


if __name__ == "__main__":
    main()
