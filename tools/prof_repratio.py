"""Profile t1_repetition_ratio variants at the ~sf1 scale point.

Run: python tools/prof_repratio.py
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import ensure_scale_dir, run_full
from ght2dm_spark.session import get_spark
from ght2dm_spark.io import load_table
from ght2dm_spark.queries import QUERIES

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/ght2dm_scale_bench")
REPS = int(os.environ.get("REPS", "5"))


def v_current(spark, sf_dir):
    return QUERIES["t1_repetition_ratio"](spark, sf_dir)


def v_numpy(spark, sf_dir):
    """mapInPandas: per-doc split + set-of-bigram-tuples."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def rep_batches(it):
        import pandas as pd

        for pdf in it:
            n_out = []
            r_out = []
            for t in pdf["text"]:
                if t is None:
                    n_out.append(None)
                    r_out.append(None)
                    continue
                toks = t.lower().split()
                n = len(toks) - 1
                if n <= 0:
                    n_out.append(0)
                    r_out.append(None)
                    continue
                uniq = len(set(zip(toks, toks[1:])))
                n_out.append(n)
                r_out.append(round(1.0 - uniq / n, 6))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_bigrams": n_out, "rep_ratio": r_out}
            )

    return d.mapInPandas(rep_batches, "doc_id long, n_bigrams int, rep_ratio double")


def v_single_proj(spark, sf_dir):
    """One projection; grams referenced once via distinct-count only."""
    toks = F.split(F.trim(F.lower("text")), r"\s+")
    d = load_table(spark, sf_dir, "documents").select("doc_id", toks.alias("toks"))
    n = F.when(F.size("toks") >= 2, F.size("toks") - 1).otherwise(0)
    grams = F.transform(
        F.slice("toks", 1, F.greatest(F.size("toks") - 1, F.lit(0))),
        lambda x, i: F.concat_ws(" ", x, F.element_at("toks", i + 2)),
    )
    uniq = F.size(F.array_distinct(grams))
    return d.select(
        "doc_id",
        n.cast("int").alias("n_bigrams"),
        F.round(
            F.when(n > 0, 1.0 - uniq.cast("double") / n.cast("double")), 6
        ).alias("rep_ratio"),
    )


def time_q(spark, fn, name):
    run_full(fn(spark, SCALE))  # warmup
    samples = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        nrows = run_full(fn(spark, SCALE))
        samples.append(time.perf_counter() - t0)
    print(
        f"{name}: p50 {statistics.median(samples):.3f}s "
        f"{[round(s, 2) for s in samples]} ({nrows} rows)"
    )


def main():
    ensure_scale_dir(BASE, SCALE, 10)
    spark = get_spark()
    for name, fn in [
        ("current", v_current),
        ("numpy", v_numpy),
        ("single_proj", v_single_proj),
    ]:
        time_q(spark, fn, name)
    # quick value-parity between current and numpy at base sf
    a = v_current(spark, BASE).orderBy("doc_id").collect()
    b = v_numpy(spark, BASE).orderBy("doc_id").collect()
    diffs = [
        (x, y)
        for x, y in zip(a, b)
        if (x.n_bigrams, x.rep_ratio) != (y.n_bigrams, y.rep_ratio)
    ]
    print("parity current-vs-numpy:", "OK" if not diffs else diffs[:5])
    c = v_single_proj(spark, BASE).orderBy("doc_id").collect()
    diffs2 = [
        (x, y)
        for x, y in zip(a, c)
        if (x.n_bigrams, x.rep_ratio) != (y.n_bigrams, y.rep_ratio)
    ]
    print("parity current-vs-single_proj:", "OK" if not diffs2 else diffs2[:5])


if __name__ == "__main__":
    main()
