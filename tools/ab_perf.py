"""A/B harness for scale-point restructures (judge r7 Next #3).

Times alternative formulations of one query against the current
registered one at the sf≈1 scale point (10× copies of sf0.1, the same
dir bench.py uses), median of N reps after a warmup — the measured
evidence behind every BASELINE.md accepted-floor entry and every
restructure that replaces a formulation.

Usage: python tools/ab_perf.py <query> [reps]
Alternatives live in _ALTS below; each is (label, callable(spark, dir)).
Run SOLO on an idle machine (concurrent load inflates 20-30%).
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import Window
from pyspark.sql import functions as F

from bench import ensure_scale_dir, run_full
from ght2dm_spark.io import load_table
from ght2dm_spark.queries import QUERIES
from ght2dm_spark.session import get_spark

SCALE_DIR = "/tmp/ght2dm_scale_bench"
BASE_DIR = "/root/testdata/sf0.1"
COPIES = 10


# --------------------------------------------------------------------------
# alternative formulations


def robust_scaler_distinct(spark, sf_dir):
    """Distinct-value cumulative-count quantiles instead of a per-row
    rank window: the k-th order statistic of (value, id) has the same
    VALUE as the k-th in value-only order, so q_p = min value whose
    cumulative count reaches ceil(p*n) — the window then runs over the
    distinct support (map-side-combined) instead of every row."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cnt = e.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.partitionBy("event_type").orderBy("value")
    wall = Window.partitionBy("event_type")
    r = cnt.select(
        "event_type", "value",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )

    def pick(p):
        rank = F.floor((p * F.col("n") + 99) / 100)
        return F.min(F.when(F.col("cum") >= rank, F.col("value")))

    q = r.groupBy("event_type").agg(
        pick(25).alias("q1"), pick(50).alias("med"), pick(75).alias("q3")
    )
    iqr = F.col("q3") - F.col("q1")
    out = (
        (F.col("value") < F.col("q1") - 1.5 * iqr)
        | (F.col("value") > F.col("q3") + 1.5 * iqr)
    )
    return (
        e.join(F.broadcast(q), "event_type")
        .groupBy("event_type", "med", "q1", "q3")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(out, 1).otherwise(0)).cast("bigint")
            .alias("n_fence_outliers"),
        )
        .select("event_type", "med", "q1", "q3", "n", "n_fence_outliers")
    )


def ks_drift_onescan(spark, sf_dir):
    """Single scan: totals n0/n1 come from an unbounded window over the
    same event_type partitioning the cumulative window already uses —
    no second aggregation branch, no join."""
    s = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.col("value").alias("v"),
            (F.col("event_id") % 2).cast("int").alias("grp"),
        )
    )
    c = s.groupBy("event_type", "v").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("c1"),
    )
    wcum = Window.partitionBy("event_type").orderBy("v")
    wall = Window.partitionBy("event_type")
    e = c.select(
        "event_type",
        F.sum("c0").over(wcum).alias("cum0"),
        F.sum("c1").over(wcum).alias("cum1"),
        F.sum("c0").over(wall).alias("n0"),
        F.sum("c1").over(wall).alias("n1"),
    )
    return (
        e.groupBy("event_type", "n0", "n1")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("cum0").cast("double") / F.col("n0")
                        - F.col("cum1").cast("double") / F.col("n1")
                    )
                ),
                6,
            ).alias("ks_stat")
        )
        .select(
            "event_type",
            F.col("n0").cast("bigint").alias("n0"),
            F.col("n1").cast("bigint").alias("n1"),
            "ks_stat",
        )
    )


def code_ratio_translate(spark, sf_dir):
    """translate() (single-pass char map) instead of regexp_replace for
    the symbol count — the class [{}();=<>\\[\\]#|&] is all single
    chars, so char-mapping is semantics-identical and skips the regex
    engine for the hottest of the two passes."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_sym = (
        F.length("text")
        - F.length(F.translate("text", "{}();=<>[]#|&", ""))
    ).cast("long")
    n_indent = F.size(
        F.expr(r"regexp_extract_all(text, '(^|\n)(    |\t)', 0)")
    ).cast("long")
    m = d.select(
        "doc_id", "lang",
        F.length("text").cast("long").alias("n_chars"),
        n_sym.alias("n_sym"),
        n_indent.alias("n_indent"),
    )
    ratio = F.col("n_sym").cast("double") / F.col("n_chars")
    return m.filter((ratio >= 0.03) | (F.col("n_indent") >= 2)).select(
        "doc_id", "lang", "n_sym", "n_indent",
        F.round(ratio, 6).alias("sym_ratio"),
    )


def quantile_bucketing_distinct(spark, sf_dir):
    """Derive per-bucket n/lo/hi from the distinct-value cumulative
    histogram instead of a per-row NTILE window: NTILE's floor
    distribution fixes each bucket's [start, end] rank, and lo/hi are
    the order statistics at those ranks."""
    NB = 4
    d = load_table(spark, sf_dir, "documents")
    cnt = d.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.partitionBy("lang").orderBy("n_chars")
    wall = Window.partitionBy("lang")
    r = cnt.select(
        "lang", "n_chars",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    # bucket b (1..NB): size = n//NB + (1 if b <= n%NB), start rank
    # s_b = (b-1)*(n//NB) + min(b-1, n%NB) + 1, end rank e_b = s_b+size-1
    def start(b):
        return (b - 1) * F.floor(F.col("n") / NB) + F.least(
            F.lit(b - 1), F.col("n") % NB
        ) + 1

    def end(b):
        return start(b + 1) - 1 if b < NB else F.col("n")

    picks = []
    for b in range(1, NB + 1):
        s_b, e_b = start(b), end(b)
        picks += [
            F.min(F.when(F.col("cum") >= s_b, F.col("n_chars"))).alias(f"lo{b}"),
            F.min(F.when(F.col("cum") >= e_b, F.col("n_chars"))).alias(f"hi{b}"),
            F.max(e_b - s_b + 1).cast("bigint").alias(f"n{b}"),
        ]
    qq = r.groupBy("lang").agg(*picks)
    rows = []
    for b in range(1, NB + 1):
        rows.append(
            qq.select(
                "lang",
                F.lit(b).cast("bigint").alias("bucket"),
                F.col(f"n{b}").alias("n"),
                F.col(f"lo{b}").cast("bigint").alias("lo"),
                F.col(f"hi{b}").cast("bigint").alias("hi"),
            )
        )
    out = rows[0]
    for x in rows[1:]:
        out = out.unionByName(x)
    return out


def groupby_all_df(spark, sf_dir):
    """Direct DataFrame groupBy — measures the temp-view + SQL-parse
    overhead of the registered GROUP BY ALL formulation (the plan
    itself is identical sugar)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            "l_returnflag", "l_linestatus",
            F.month("l_shipdate").cast("bigint").alias("ship_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").cast("bigint").alias("qty"),
        )
    )


def length_lognormal_nodecimal(spark, sf_dir):
    """Double-sum variant (no DECIMAL fixed-point casts) — measures what
    the exactness discipline costs; NOT oracle-exact (float order), so
    it can only be a floor datapoint, never the shipped formulation."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    lg = F.log2(F.col("n_chars").cast("double"))
    t = d.select("lang", F.round(lg, 9).alias("lg"), F.round(lg * lg, 9).alias("lg2"))
    s1 = F.sum("lg") / F.count(F.lit(1))
    s2 = F.sum("lg2") / F.count(F.lit(1))
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(s1, 6).alias("mu"),
        F.round(F.sqrt(F.greatest(F.lit(0.0), s2 - s1 * s1)), 6).alias("sigma"),
    )


def kfold_nohash_probe(spark, sf_dir):
    """Raw-count probe: the same groupBy WITHOUT the fold hash — what
    the aggregation alone costs; isolates the hash-arithmetic share."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang", (F.col("doc_id") % 5).alias("fold"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


def temperature_mix_cached_counts(spark, sf_dir):
    """Variant: compute the 5-row language-count frame eagerly via
    collect + literal map, removing the broadcast-join stage entirely
    (driver-side 5-row collect is metadata-scale, same class as the IVM
    pushdown keys)."""
    from ght2dm_spark.queries.mixing_queries import _TM_H, _TM_K

    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_before"))
    rows = counts.collect()
    nmap = {r["lang"]: r["n_before"] for r in rows}
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("tmix:"), F.col("doc_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % _TM_H
    )
    nb = F.create_map(
        *[x for kv in nmap.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    )[F.col("lang")]
    kept = (
        d.withColumn("h", h)
        .withColumn("n_before", nb)
        .filter(
            F.col("h").cast("decimal(38,0)") * F.col("h") * F.col("n_before")
            < F.lit(_TM_K * _TM_K * _TM_H * _TM_H).cast("decimal(38,0)")
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    base = (
        counts.join(kept, "lang", "left")
        .withColumn("n_kept", F.coalesce("n_kept", F.lit(0).cast("long")))
    )
    totals = base.agg(F.sum("n_before").alias("tb"), F.sum("n_kept").alias("tk"))
    return base.crossJoin(F.broadcast(totals)).select(
        "lang", "n_before", "n_kept",
        F.expr("n_before * 1000000L div tb").alias("share_before_ppm"),
        F.expr("n_kept * 1000000L div tk").alias("share_after_ppm"),
    )


_ALTS = {
    "t1_robust_scaler": [("distinct_cum", robust_scaler_distinct)],
    "t1_ks_drift": [("onescan_window", ks_drift_onescan)],
    "t1_code_ratio_filter": [("translate", code_ratio_translate)],
    "t1_quantile_bucketing": [("distinct_cum", quantile_bucketing_distinct)],
    "t1_groupby_all": [("dataframe_api", groupby_all_df)],
    "t1_length_lognormal": [("double_sums", length_lognormal_nodecimal)],
    "t1_stratified_kfold": [("no_hash_probe", kfold_nohash_probe)],
    "t1_temperature_mix": [("collected_counts", temperature_mix_cached_counts)],
}


def main() -> None:
    names = sys.argv[1:] or list(_ALTS)
    reps = 5
    if names and names[-1].isdigit():
        reps = int(names.pop())
    ensure_scale_dir(BASE_DIR, SCALE_DIR, COPIES)
    spark = get_spark(app_name="ab_perf")
    for name in names:
        cands = [("current", QUERIES[name])] + _ALTS.get(name, [])
        for label, fn in cands:
            run_full(fn(spark, SCALE_DIR))  # warmup
            samples = []
            for _ in range(reps):
                t0 = time.perf_counter()
                n = run_full(fn(spark, SCALE_DIR))
                samples.append(time.perf_counter() - t0)
            med = statistics.median(samples)
            print(
                f"{name} [{label}]: p50 {med:.3f}s of "
                f"{[round(s, 2) for s in samples]} ({n} rows)"
            )


if __name__ == "__main__":
    main()


# --------------------------------------------------------------------------
# shingle df-cap A/B (judge r7 Next #4) — runs at sf0.1 directly (the
# containment query is a bench heavy there, not a scale-point query)


def _capped_containment(spark, sf_dir, mode):
    from ght2dm_spark.operators.neardup import shingle_df
    from ght2dm_spark.queries.dedup_queries import _aug_docs

    K = 16
    aug = _aug_docs(spark, sf_dir)
    sh = shingle_df(aug, "doc_id", "text", 3)
    if mode == "window":
        wsh = Window.partitionBy("shingle")
        sh = (
            sh.withColumn("__df", F.count(F.lit(1)).over(wsh))
            .filter(F.col("__df") <= K)
            .drop("__df")
        )
    elif mode == "anti":
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > K)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    left = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    right = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        left.join(right, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    c_ab = F.col("inter").cast("double") / F.col("na")
    c_ba = F.col("inter").cast("double") / F.col("nb")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter((c_ab >= 0.9) | (c_ba >= 0.9))
        .select(
            "id_a", "id_b", F.col("inter").cast("bigint").alias("inter"),
            F.round(c_ab, 6).alias("c_ab"), F.round(c_ba, 6).alias("c_ba"),
        )
    )


def main_shingle() -> None:
    import statistics

    spark = get_spark(app_name="ab_shingle")
    sf_dir = BASE_DIR  # sf0.1, the bench dir
    cands = [
        ("current_nocap", lambda s, d: QUERIES["t1_ngram_containment"](s, d)),
        ("cap_window", lambda s, d: _capped_containment(s, d, "window")),
        ("cap_anti", lambda s, d: _capped_containment(s, d, "anti")),
    ]
    for label, fn in cands:
        run_full(fn(spark, sf_dir))
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            n = run_full(fn(spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        print(
            f"t1_ngram_containment [{label}]: p50 "
            f"{statistics.median(samples):.3f}s of "
            f"{[round(s, 2) for s in samples]} ({n} rows)"
        )
