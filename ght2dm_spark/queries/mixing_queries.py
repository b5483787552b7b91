"""Corpus mixing / cross-corpus membership operators — batch 3 of the
LLM-curation surface.

- t1_temperature_mix — temperature-based language rebalancing (the
  multilingual-sampling rule from XLM-R / mT5: sampling weight
  ∝ share^α, α = 0.5): low-resource languages are UP-weighted relative
  to their corpus share, high-resource ones down-weighted.  The keep
  decision is exact-integer: ``keep ⟺ h² · n_lang < K²·H²`` (squaring
  both sides of ``h/H < K/√n_lang`` — no floating sqrt anywhere, and
  the min(1, ·) clamp falls out of the inequality automatically).
- t1_bloom_membership — Bloom-filter cross-corpus membership probe (the
  cheap first pass of cross-deduplication between two crawls): k=3
  md5-derived bit positions in an m=65536-bit filter built over corpus
  A, probed by corpus B.  No false negatives by construction; false
  positives are part of the measured output (is_true_dup separates
  them).

Determinism discipline: every keep/membership decision is md5-derived
integer arithmetic (the sampling.hash_bucket lesson) so Spark and the
DuckDB oracle agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.operators.neardup import hex2int_sql
from ght2dm_spark.queries.registry import register

# --------------------------------------------------------------------------
# t1_temperature_mix

#: hash domain (h uniform in [0, H)), temperature constant K:
#: keep probability per doc of language l is min(1, K/√n_l) — α = 0.5
#: temperature up to the shared constant.  K = 6 < √(min n_l) at the
#: test SFs, so every language is genuinely subsampled.
_TM_H = 10**6
_TM_K = 6


def _tm_hash_sql() -> str:
    md5 = "md5('tmix:' || CAST(doc_id AS VARCHAR))"
    return f"({hex2int_sql(md5, 1)} % {_TM_H})"


@register(
    "t1_temperature_mix",
    oracle=f"""
    WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_before
               FROM documents GROUP BY 1),
    k AS (SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept
          FROM documents d JOIN c ON d.lang = c.lang
          WHERE CAST({_tm_hash_sql()} AS DECIMAL(38,0))
                * {_tm_hash_sql()} * c.n_before
                < {_TM_K * _TM_K * _TM_H * _TM_H}
          GROUP BY 1),
    t AS (SELECT CAST((SELECT sum(n_before) FROM c) AS BIGINT) AS tb,
                 CAST((SELECT sum(n_kept) FROM k) AS BIGINT) AS tk)
    SELECT c.lang, c.n_before,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(c.n_before * 1000000 // t.tb AS BIGINT)
             AS share_before_ppm,
           CAST(coalesce(k.n_kept, 0) * 1000000 // t.tk AS BIGINT)
             AS share_after_ppm
    FROM c LEFT JOIN k ON c.lang = k.lang CROSS JOIN t
    """,
)
def t1_temperature_mix(spark, sf_dir):
    """Temperature-based language rebalancing (α = 0.5): per-language
    keep probability ∝ 1/√n_lang, evaluated as the exact integer
    predicate ``h²·n_lang < K²·H²`` on a per-doc md5 hash — no floating
    sqrt, no RNG stream, reproducible under any partitioning.

    Scale: two passes over the corpus — a 5-row language-count
    aggregate (broadcast back), then a map-side keep filter; the
    rebalance report itself is |langs| rows.  The global-stats-then-
    filter two-pass is inherent to any share-dependent sampling rule;
    at 100 TB the counts pass is a single map-side-combined aggregate
    over one column.  The final share math cross-joins two 1-row total
    frames (the scalar-subquery pattern, plan-lint allowlisted).

    Oracle portability: the totals and both ppm shares are CAST to
    BIGINT — a bare DuckDB ``sum()`` is HUGEINT (int128), whose ``//``
    and client canonicalization are version-sensitive (the r04 driver
    hash mismatch on this query, bit-exact locally, traced to that)."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_before"))
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("tmix:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _TM_H
    )
    kept = (
        d.join(F.broadcast(counts), "lang")
        .withColumn("h", h)
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
    totals = base.agg(
        F.sum("n_before").alias("tb"), F.sum("n_kept").alias("tk")
    )
    return base.crossJoin(F.broadcast(totals)).select(
        "lang",
        "n_before",
        "n_kept",
        F.expr("n_before * 1000000L div tb").alias("share_before_ppm"),
        F.expr("n_kept * 1000000L div tk").alias("share_after_ppm"),
    )


# --------------------------------------------------------------------------
# t1_bloom_membership

_BL_M = 65536  # filter bits (sized ~10 bits/key at the corpus-A scale)
_BL_HASHES = (1, 2, 3)  # k = 3 salted hash functions


def _bl_pos_sql(text_expr: str, j: int) -> str:
    md5 = "md5('" + str(j) + ":' || " + text_expr + ")"
    return f"({hex2int_sql(md5, 1)} % {_BL_M})"


@register(
    "t1_bloom_membership",
    oracle=f"""
    WITH a AS (SELECT doc_id, text FROM documents
               WHERE CAST(substr(source, 4) AS INT) < 10),
    breal AS (SELECT doc_id, text FROM documents
              WHERE CAST(substr(source, 4) AS INT) >= 10),
    b AS (SELECT * FROM breal
          UNION ALL
          SELECT doc_id + 1000000, text FROM a WHERE doc_id % 7 = 0),
    apos AS (SELECT DISTINCT u.p FROM a,
             unnest([{_bl_pos_sql('a.text', 1)}, {_bl_pos_sql('a.text', 2)},
                     {_bl_pos_sql('a.text', 3)}]) AS u(p)),
    bpos AS (SELECT doc_id, u.p FROM b,
             unnest([{_bl_pos_sql('b.text', 1)}, {_bl_pos_sql('b.text', 2)},
                     {_bl_pos_sql('b.text', 3)}]) AS u(p)),
    bloom AS (SELECT doc_id, bool_and(apos.p IS NOT NULL) AS bloom_hit
              FROM bpos LEFT JOIN apos ON bpos.p = apos.p GROUP BY 1),
    ex AS (SELECT b.doc_id, (at.text IS NOT NULL) AS is_true_dup
           FROM b LEFT JOIN (SELECT DISTINCT text FROM a) at
             ON b.text = at.text)
    SELECT bloom.doc_id, ex.is_true_dup
    FROM bloom JOIN ex ON bloom.doc_id = ex.doc_id
    WHERE bloom.bloom_hit
    """,
)
def t1_bloom_membership(spark, sf_dir):
    """Bloom-filter cross-corpus membership: corpus A (sources src0-9)
    populates a 65536-bit filter via 3 salted md5 positions; corpus B
    (sources src10-19, plus a planted copy of every 7th A doc) probes
    it.  Output: every B doc the filter flags, with is_true_dup
    separating planted duplicates from false positives — the filter
    guarantees no false NEGATIVES, so exact-dup ⊆ flagged always.

    Scale: the filter is materialized as its ≤m distinct set-bit
    positions (≤65536 rows regardless of |A|) and broadcast — corpus B
    is probed map-side with no shuffle of B itself beyond the per-doc
    all-positions-present aggregate.  This is the standard pre-filter
    before an exact anti-join cross-dedup: at 100 TB it prunes the
    exact join's probe side to the flagged sliver.  (Spark's runtime
    row-level bloom pruning — tests/test_scale_layout.py — is the same
    idea applied by the optimizer; this query is the explicit,
    engine-portable form.)"""
    d = load_table(spark, sf_dir, "documents")
    srcnum = F.substring("source", 4, 10).cast("int")
    a = d.filter(srcnum < 10).select("doc_id", "text")
    b = (
        d.filter(srcnum >= 10)
        .select("doc_id", "text")
        .unionByName(
            a.filter(F.col("doc_id") % 7 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
    )

    def positions(text):
        return F.array(
            *[
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{j}:"), text)), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % _BL_M
                for j in _BL_HASHES
            ]
        )

    apos = (
        a.select(F.explode(positions(F.col("text"))).alias("p"))
        .distinct()
        .withColumn("inset", F.lit(True))
    )
    bloom = (
        b.select("doc_id", F.explode(positions(F.col("text"))).alias("p"))
        .join(F.broadcast(apos), "p", "left")
        .groupBy("doc_id")
        .agg(F.min(F.coalesce("inset", F.lit(False))).alias("bloom_hit"))
    )
    exact = b.join(
        F.broadcast(
            a.select("text").distinct().withColumn("indexed", F.lit(True))
        ),
        "text",
        "left",
    ).select(
        "doc_id", F.coalesce("indexed", F.lit(False)).alias("is_true_dup")
    )
    return (
        bloom.filter("bloom_hit").join(exact, "doc_id").select("doc_id", "is_true_dup")
    )
