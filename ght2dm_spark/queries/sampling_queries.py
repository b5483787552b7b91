"""Sampling / split queries over ``documents`` — reproducible,
engine-neutral (md5-keyed) sampling for training-data pipelines.

The DuckDB oracles replay the exact bucket arithmetic via
:func:`ght2dm_spark.operators.neardup.hex2int_sql` (DuckDB lacks
``conv``), so these are full value-level checks, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.operators.neardup import hex2int_sql
from ght2dm_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    stratified_hash_sample,
    train_test_split,
)
from ght2dm_spark.queries.registry import register

# coalesce mirrors operators.sampling.hash_bucket's NULL sentinel
_BUCKET = f"({hex2int_sql('md5(coalesce(CAST(doc_id AS VARCHAR), chr(0)))', 1, 8)} % 100)"


@register(
    "t1_hash_sample",
    oracle=f"""
    SELECT doc_id, {_BUCKET} AS bucket
    FROM documents WHERE {_BUCKET} < 10
    """,
)
def t1_hash_sample(spark, sf_dir):
    """~10% deterministic sample of documents: a pure map-side filter
    (no shuffle, no RNG), so the sampled set is identical across runs,
    partitionings, and engines."""
    d = load_table(spark, sf_dir, "documents")
    return hash_sample(d, F.col("doc_id"), 10).select(
        "doc_id", hash_bucket(F.col("doc_id")).alias("bucket")
    )


@register(
    "t1_train_test_split",
    oracle=f"""
    SELECT CASE WHEN {_BUCKET} < 10 THEN 'test' ELSE 'train' END AS split,
           count(*) AS n,
           CAST(sum(CAST(n_chars AS DECIMAL(18,0))) AS DOUBLE) AS chars
    FROM documents GROUP BY split
    """,
)
def t1_train_test_split(spark, sf_dir):
    """Hash-keyed 90/10 train/test split: a document's split is a pure
    function of its id — it never migrates between splits across runs
    (contamination control at corpus scale)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        train_test_split(d, F.col("doc_id"), 10)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("n_chars").cast("decimal(18,0)")).cast("double").alias("chars"),
        )
    )


@register(
    "t1_stratified_sample",
    oracle=f"""
    SELECT lang, count(*) AS n
    FROM documents
    WHERE {_BUCKET} < (CASE lang WHEN 'en' THEN 20 WHEN 'de' THEN 60 ELSE 0 END)
    GROUP BY lang
    """,
)
def t1_stratified_sample(spark, sf_dir):
    """Per-stratum rates (downsample dominant 'en' to 20%, keep 60% of
    'de', drop the rest) — the rebalancing step of corpus curation, as
    one CASE-gated map-side filter."""
    d = load_table(spark, sf_dir, "documents")
    return (
        stratified_hash_sample(d, F.col("doc_id"), F.col("lang"), {"en": 20, "de": 60})
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_UBUCKET = f"({hex2int_sql('md5(coalesce(CAST(user_id AS VARCHAR), chr(0)))', 1, 8)} % 100)"


@register(
    "t1_group_split",
    oracle=f"""
    WITH s AS (SELECT CASE WHEN {_UBUCKET} < 10 THEN 'test' ELSE 'train' END
                        AS split,
                      user_id, value
               FROM events)
    SELECT split, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM s GROUP BY split
    """,
)
def t1_group_split(spark, sf_dir):
    """GROUP-aware train/test split: the split is a pure function of
    user_id, so ALL of a user's events land in one split — the entity-
    leakage control a row-level split (t1_train_test_split) cannot give
    when rows of one entity are correlated (a user's test events must
    not have train siblings).

    Scale: the split label is a map-side expression (md5 of the group
    key) — no shuffle, no RNG, no group materialization; the only
    shuffle is the verification aggregate.  Any keyed entity (user,
    domain, repository) slots in as the group key."""
    ev = load_table(spark, sf_dir, "events")
    return (
        train_test_split(ev, F.col("user_id"), 10)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@register(
    "t1_negative_sampling",
    oracle="""
    WITH n AS (SELECT count(*) AS nd FROM documents),
    neg AS (SELECT d.doc_id, j,
                   (d.doc_id + j * 97) % (SELECT nd FROM n) AS neg_id
            FROM documents d, unnest([1, 2, 3]) AS u(j)),
    ok AS (SELECT * FROM neg WHERE neg_id <> doc_id)
    SELECT ok.doc_id, ok.j, ok.neg_id, nd.n_chars AS neg_chars
    FROM ok JOIN documents nd ON ok.neg_id = nd.doc_id
    """,
)
def t1_negative_sampling(spark, sf_dir):
    """Deterministic negative-pair sampling for contrastive training:
    each anchor document gets 3 negatives at fixed stride offsets in the
    (contiguous) id space, materialized by joining back to the corpus —
    no RNG, so the pair set is identical across runs/engines/partitions
    (the property that keeps a training set reproducible).

    Scale: negatives generate map-side (explode of a 3-element literal
    array), the fetch is ONE equi join on the corpus key; stride offsets
    decorrelate anchors from negatives without a shuffle-heavy global
    shuffle-pair pass.  Non-contiguous id spaces first map ids through a
    dense rank (one window) or use hash-bucketed negatives."""
    d = load_table(spark, sf_dir, "documents")
    n = d.agg(F.count(F.lit(1)).alias("nd"))
    neg = (
        d.select("doc_id")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"),
            F.col("nd"),
        )
        .select(
            "doc_id",
            "j",
            ((F.col("doc_id") + F.col("j") * 97) % F.col("nd")).alias("neg_id"),
        )
        .filter(F.col("neg_id") != F.col("doc_id"))
    )
    corpus = d.select(
        F.col("doc_id").alias("neg_id"), F.col("n_chars").alias("neg_chars")
    )
    return neg.join(corpus, "neg_id").select(
        "doc_id", "j", "neg_id", "neg_chars"
    )
