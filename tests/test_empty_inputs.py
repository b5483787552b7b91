"""Empty-input robustness: core operators must return EMPTY results on
empty frames — never throw — because at 100 TB a date-partition filter
or a quality gate routinely leaves a stage with zero rows, and a
pipeline that crashes on an empty partition day is a paged on-call.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ght2dm_spark.io import load_table


def _empty(df):
    return df.filter(F.lit(False))


def test_dedup_newest_empty(spark, sf_dir):
    from ght2dm_spark.operators.dedup import dedup_newest

    d = _empty(load_table(spark, sf_dir, "documents")).withColumn(
        "file_date", F.current_date()
    ).withColumn("file_pos", F.lit(0))
    out = dedup_newest(
        d, ["doc_id"], [F.desc("file_date"), F.asc("file_pos")]
    )
    assert out.count() == 0


def test_minhash_empty(spark, sf_dir):
    from ght2dm_spark.operators.neardup import minhash_signature

    d = _empty(load_table(spark, sf_dir, "documents"))
    assert minhash_signature(d, "doc_id", "text", k=4).count() == 0


def test_pagerank_empty_edges(spark, sf_dir):
    from ght2dm_spark.operators.graph import pagerank

    li = _empty(load_table(spark, sf_dir, "lineitem"))
    edges = li.select(
        F.col("l_suppkey").cast("string").alias("src"),
        F.col("l_partkey").cast("string").alias("dst"),
    )
    assert pagerank(edges, iterations=2).count() == 0


def test_kmeans_empty(spark, sf_dir):
    from ght2dm_spark.operators.clustering import kmeans_int

    e = _empty(load_table(spark, sf_dir, "embeddings"))
    asg, cents = kmeans_int(e, "vec_id", "embedding", k=4, iters=1)
    assert asg.count() == 0 and cents.count() == 0


def test_asof_join_empty_right(spark, sf_dir):
    """Empty RIGHT side must keep left-join semantics: all left rows
    survive with NULL payload (not an empty result)."""
    from ght2dm_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    orders = _empty(load_table(spark, sf_dir, "orders")).select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey"
    )
    out = asof_join(
        ev, orders, key="user_id", left_ts="ts",
        right_ts="o_orderdate", payload=["o_orderkey"],
    )
    assert out.count() == ev.count()
    assert out.filter(F.col("o_orderkey").isNotNull()).count() == 0


def test_grouped_kmeans_empty(spark, sf_dir):
    from ght2dm_spark.operators.clustering import kmeans_int_grouped

    e = _empty(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.lit(0).alias("m"), F.col("embedding").alias("sub")
    )
    asg, cents = kmeans_int_grouped(e, "m", "vec_id", "sub", k=4, iters=1)
    assert asg.count() == 0 and cents.count() == 0


def test_ewma_fold_empty_series_frame(spark, sf_dir):
    """Zero events → zero series rows out (the fold never sees an empty
    array because series only exist where a day aggregated, but the
    query as a whole must pass empty frames through cleanly)."""
    from ght2dm_spark.queries import QUERIES  # noqa: F401  (registry import)
    from ght2dm_spark.functions import trunc_ntz

    ev = _empty(load_table(spark, sf_dir, "events"))
    daily = ev.groupBy(
        "event_type", trunc_ntz("day", F.col("ts")).alias("d")
    ).agg(F.sum(F.round(F.col("value") * 1e6, 0).cast("long")).alias("v"))
    arr = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "v"))), lambda s: s["v"]
        ).alias("vs")
    )
    assert arr.count() == 0


def test_simhash_hamming_pairs_empty(spark, sf_dir):
    from ght2dm_spark.operators.neardup import (
        simhash64,
        simhash_hamming_pairs,
    )

    d = _empty(load_table(spark, sf_dir, "documents"))
    sim = simhash64(d, "doc_id", "text")
    assert simhash_hamming_pairs(sim, "doc_id").count() == 0


def test_kn_surprisal_empty(spark, sf_dir, tmp_path):
    """An empty corpus (empty model dict) must yield an empty result,
    not a KeyError inside the scoring map."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ght2dm_spark.queries import QUERIES

    src = f"{sf_dir}/documents.parquet"
    schema = pq.read_schema(src)
    out = tmp_path / "empty_sf"
    out.mkdir()
    pq.write_table(schema.empty_table(), out / "documents.parquet")
    assert QUERIES["t1_kn_surprisal"](spark, str(out)).count() == 0


def test_zipf_and_compaction_empty(spark, sf_dir, tmp_path):
    import pyarrow.parquet as pq

    from ght2dm_spark.queries import QUERIES

    src = f"{sf_dir}/documents.parquet"
    schema = pq.read_schema(src)
    out = tmp_path / "empty_sf2"
    out.mkdir()
    pq.write_table(schema.empty_table(), out / "documents.parquet")
    assert QUERIES["t1_zipf_fit"](spark, str(out)).count() == 0
    assert QUERIES["t1_compaction_plan"](spark, str(out)).count() == 0


def test_round5_filters_empty_corpus(spark, tmp_path):
    """The round-5 curation queries over an EMPTY documents/embeddings
    table must return empty frames, never throw — the gram frame caches
    an empty relation, the rule stats fold over zero rows, and the
    quantizer maps zero vectors."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ght2dm_spark.queries import QUERIES

    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
                "lang": pa.array([], type=pa.string()),
                "source": pa.array([], type=pa.string()),
                "n_chars": pa.array([], type=pa.int64()),
            }
        ),
        f"{d}/documents.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([], type=pa.int64()),
                "embedding": pa.array([], type=pa.list_(pa.float32())),
                "label": pa.array([], type=pa.int32()),
            }
        ),
        f"{d}/embeddings.parquet",
    )
    for name in (
        "t1_gopher_rules",
        "t1_dup_ngram_coverage",
        "t1_source_dup_profile",
        "t1_cross_source_leakage",
        "t1_int8_quantize",
        "t1_sq8_ann",
        "t1_stream_quality_gate",
    ):
        assert QUERIES[name](spark, d).count() == 0, name
