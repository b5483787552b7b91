"""Semantic tests for the round-3 operators — these check the ALGORITHM
is right (invariants, ground truth, known-answer cases), complementing
the oracle suite which checks Spark ≡ DuckDB.  An implementation bug
mirrored into its oracle SQL passes the oracle gate; it does not pass
these.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ght2dm_spark.queries import QUERIES


def rows_by(df, *key_cols):
    return {tuple(r[k] for k in key_cols): r.asDict() for r in df.collect()}


# --------------------------------------------------------------------------
# BPE


def test_bpe_replace_is_greedy_left_to_right(spark):
    """The bracket-wrapped replace must implement BPE's greedy
    non-overlapping merge: 'aaa' + merge (a,a) → [aa, a], never [a, aa]
    or [aa, aa]; and a symbol ending in 'b' must not false-match a
    (b, c) merge across its boundary."""
    out = spark.sql(
        "SELECT replace('<a><a><a>', '<a><a>', '<aa>') AS runs, "
        "       replace('<ab><c>', '<b><c>', '<bc>') AS boundary"
    ).head()
    assert out.runs == "<aa><a>"
    assert out.boundary == "<ab><c>"  # untouched: 'b' is inside <ab>


def test_bpe_merges_are_adjacent_pairs_with_descending_counts(spark, sf_dir):
    rows = QUERIES["t1_bpe_merges"](spark, sf_dir).collect()
    assert [r.round for r in sorted(rows, key=lambda r: r.round)] == [1, 2, 3]
    for r in rows:
        assert r.merged == r.left_sym + r.right_sym
        assert r.n_occurrences > 0


def test_bpe_encode_compresses(spark, sf_dir):
    r = QUERIES["t1_bpe_encode"](spark, sf_dir).head()
    assert 0 < r.tokens_after < r.tokens_before
    assert r.saved_ppm == (
        (r.tokens_before - r.tokens_after) * 1_000_000 // r.tokens_before
    )


# --------------------------------------------------------------------------
# KMV sketch


def test_kmv_merged_equals_direct(spark, sf_dir):
    """KMV merge theorem as an executable check: the k smallest hashes
    of the union equal the k smallest of the merged per-type sketches,
    so the two global estimates must be IDENTICAL, not merely close."""
    by_scope = rows_by(QUERIES["t1_kmv_sketch"](spark, sf_dir), "scope")
    assert (
        by_scope[("all_merged",)]["est_distinct"]
        == by_scope[("all_direct",)]["est_distinct"]
    )


def test_kmv_estimates_are_in_a_sane_band(spark, sf_dir):
    for key, r in rows_by(QUERIES["t1_kmv_sketch"](spark, sf_dir), "scope").items():
        # k=32 → ~18% 1σ; 60% is a >3σ bound that still catches
        # off-by-domain / off-by-k bugs outright.
        assert abs(r["est_distinct"] - r["exact_distinct"]) <= 0.6 * r[
            "exact_distinct"
        ], key


# --------------------------------------------------------------------------
# Bloom membership


def test_bloom_has_no_false_negatives(spark, sf_dir):
    """Every planted duplicate must be flagged (Bloom guarantees no
    false negatives); flagged-but-not-planted rows are the measured
    false positives and must carry is_true_dup = False."""
    out = rows_by(QUERIES["t1_bloom_membership"](spark, sf_dir), "doc_id")
    from ght2dm_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    planted = {
        r.doc_id + 1_000_000
        for r in d.filter(
            (F.substring("source", 4, 10).cast("int") < 10)
            & (F.col("doc_id") % 7 == 0)
        ).collect()
    }
    flagged_true = {k[0] for k, r in out.items() if r["is_true_dup"]}
    assert flagged_true == planted


# --------------------------------------------------------------------------
# Temperature mixing


def test_temperature_mix_flattens_shares(spark, sf_dir):
    rows = QUERIES["t1_temperature_mix"](spark, sf_dir).collect()
    hi = max(rows, key=lambda r: r.n_before)
    lo = min(rows, key=lambda r: r.n_before)
    before_ratio = hi.share_before_ppm / max(lo.share_before_ppm, 1)
    after_ratio = hi.share_after_ppm / max(lo.share_after_ppm, 1)
    assert after_ratio < before_ratio  # α = 0.5 compresses the spread
    for r in rows:
        assert 0 < r.n_kept <= r.n_before


# --------------------------------------------------------------------------
# PCA power iteration


def test_pca_power_climbs_the_spectrum(spark, sf_dir):
    """Checked against numpy's dense eigendecomposition via the RAYLEIGH
    QUOTIENT, not the eigenvector direction: the synthetic embeddings
    are near-isotropic (λ₂/λ₁ ≈ 0.93–0.99 measured), so NO power
    iteration can pin the direction in bounded rounds — but the iterate
    must still climb the spectrum.  3 rounds from e₁ reach ≥ 0.82·λmax
    on both test SFs (init ≈ 0.55·λmax, spectrum mean ≈ 0.54·λmax); a
    wrong-matrix / wrong-normalization bug lands near the spectrum mean
    and fails the 0.75 bound outright."""
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    xc = x - x.mean(axis=0)
    cov = xc.T @ xc / len(x)
    lmax = np.linalg.eigvalsh(cov)[-1]

    rows = QUERIES["t1_pca_power"](spark, sf_dir).collect()
    got = np.zeros(cov.shape[0])
    for r in rows:
        got[r.dim_idx] = r.component
    rayleigh = (got @ cov @ got) / (got @ got)
    assert rayleigh / lmax > 0.75, rayleigh / lmax


# --------------------------------------------------------------------------
# PQ / ADC


def test_pq_adc_approximates_true_distance(spark, sf_dir):
    """ADC is an unbiased-ish surrogate: over all (query, neighbor)
    result pairs, the ADC distance must correlate strongly with the
    true integer L2 distance (guards against subspace misalignment —
    e.g. slicing bugs that would still satisfy the Spark≡DuckDB gate
    because both sides would share them)."""
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    vecs = {
        int(i): np.round(np.asarray(v, dtype=np.float64) * 1e6)
        for i, v in zip(emb["vec_id"], emb["embedding"])
    }
    rows = QUERIES["t1_pq_ann"](spark, sf_dir).collect()
    adc, true = [], []
    for r in rows:
        adc.append(float(r.adc_dist))
        d = vecs[r.q_id] - vecs[r.neighbor_id]
        true.append(float(d @ d))
    corr = np.corrcoef(adc, true)[0, 1]
    assert corr > 0.5, corr


# --------------------------------------------------------------------------
# Count-Min sketch


def test_cms_never_underestimates(spark, sf_dir):
    """The CMS guarantee: counters only ever add, so every point-query
    estimate is >= the exact count; with w=16 buckets over the corpus
    vocabulary at least the structure allows collisions, and any
    underestimate means the hash rows / min-reduction are wrong."""
    rows = QUERIES["t1_cms_sketch"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.cms_est >= r.exact_cnt, r
        assert r.overest_ppm >= 0


# --------------------------------------------------------------------------
# Streaming sketch rollup (mergeability across micro-batches)


def test_streaming_kmv_rollup_equals_batch_sketch(spark, sf_dir, tmp_path):
    """Sketch mergeability THROUGH the streaming engine: a foreachBatch
    sink maintains a KMV sketch table (append each micro-batch's k
    smallest user hashes, truncation deferred to read time); the final
    merged estimate must EQUAL the batch KMV estimate — the telemetry
    rollup pattern where per-batch sketch state, not history, persists.
    Deterministic because the sketch is a pure function of the data
    (md5), however the stream happens to batch it."""
    from ght2dm_spark.queries.sketch_queries import _KMV_DOMAIN, _KMV_K
    from ght2dm_spark.streaming import read_events_stream

    out = str(tmp_path / "sketch_out")

    def h(col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("kmv:"), col.cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
        )

    def sink(batch_df, batch_id):
        (
            batch_df.select(h(F.col("user_id")).alias("hv"))
            .distinct()
            .orderBy("hv")
            .limit(_KMV_K)
            .write.mode("append")
            .parquet(out)
        )

    q = (
        read_events_stream(spark, sf_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    def estimate(df):
        sk = df.select("hv").distinct().orderBy("hv").limit(_KMV_K)
        row = sk.agg(
            F.count(F.lit(1)).alias("n"), F.max("hv").alias("hk")
        ).head()
        if row.n < _KMV_K:
            return row.n
        return (_KMV_K - 1) * _KMV_DOMAIN // row.hk

    streamed = estimate(spark.read.parquet(out))
    from ght2dm_spark.io import load_table

    batch = estimate(
        load_table(spark, sf_dir, "events")
        .select(h(F.col("user_id")).alias("hv"))
        .distinct()
    )
    assert streamed == batch


def test_kcore_fixpoint_within_unroll(sf_dir):
    """The k-core unroll bound is an invariant, not a hope: one extra
    peel round changes nothing at either test SF."""
    import duckdb

    from ght2dm_spark.queries.graph_extra import _KCORE_ROUNDS, _kcore_sql

    for d in [sf_dir, "/root/testdata/sf0.01"]:
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM '{d}/lineitem.parquet'"
        )
        at_bound = sorted(con.execute(_kcore_sql(3, _KCORE_ROUNDS)).fetchall())
        one_more = sorted(con.execute(_kcore_sql(3, _KCORE_ROUNDS + 1)).fetchall())
        assert at_bound == one_more and at_bound
