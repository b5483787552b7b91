"""Streaming semantics tests (SURVEY §5 item 5): batch-stream
equivalence, watermark late-data drop, and a custom stateful operator
via applyInPandasWithState.
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from ght2dm_spark.streaming import read_events_stream, run_to_completion, stream_equals_batch


def _rows(df):
    return sorted([tuple(r) for r in df.collect()])


def test_stream_session_window_equals_batch(spark, sf_dir):
    """Session windows (stateful, merge-on-gap) computed by the streaming
    engine equal the batch plan over the same events."""

    def build(ev):
        return (
            ev.withWatermark("ts", "1 minute")
            .groupBy(F.session_window("ts", "4 hours").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("user_id", F.col("w.start").alias("s"), F.col("w.end").alias("e"), "n")
        )

    stream_out, batch_out = stream_equals_batch(spark, sf_dir, build, "complete")
    assert _rows(stream_out) == _rows(batch_out)


def test_watermark_drops_late_data(spark, tmp_path):
    """An event arriving in a later micro-batch, older than the watermark
    horizon, is dropped from an append-mode windowed aggregation
    (the late-data semantics the reference has no analog for)."""
    schema = StructType(
        [StructField("ts", TimestampType()), StructField("uid", LongType())]
    )
    d = str(tmp_path / "stream_in")
    os.makedirs(d)
    base = pd.Timestamp("2024-01-01 00:00:00")

    # batch 0: events at 00:00 / 01:00 → end-of-batch watermark 00:50
    pd.DataFrame(
        {"ts": [base, base + pd.Timedelta("1 hour")], "uid": [1, 2]}
    ).to_parquet(f"{d}/a.parquet", coerce_timestamps="us")
    time.sleep(0.05)
    # batch 1: 02:00 → the [00:00,00:10) window (end < 00:50) is evicted
    # and emitted with uid_sum=1; watermark advances to 01:50
    pd.DataFrame({"ts": [base + pd.Timedelta("2 hours")], "uid": [3]}).to_parquet(
        f"{d}/b.parquet", coerce_timestamps="us"
    )
    time.sleep(0.05)
    # batch 2: a LATE event at 00:05, far behind the 01:50 watermark and
    # belonging to an already-emitted window → must be dropped
    pd.DataFrame({"ts": [base + pd.Timedelta("5 minutes")], "uid": [99]}).to_parquet(
        f"{d}/c.parquet", coerce_timestamps="us"
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.sum("uid").alias("uid_sum"))
        .select(F.col("w.start").alias("ws"), "uid_sum")
    )
    out = run_to_completion(stream, output_mode="append")
    rows = [(r["ws"], r["uid_sum"]) for r in out.collect()]
    # the 00:00 window was closed with only uid=1; the late uid=99 row
    # must neither merge into it nor re-emit it
    assert (base.to_pydatetime(), 1) in rows
    assert all(s != 99 and s != 100 for _, s in rows)


def test_apply_in_pandas_with_state_running_count(spark, sf_dir):
    """Custom stateful operator: per-user event counting with explicit
    GroupState, final counts equal the batch groupBy."""
    out_schema = "user_id long, n long"
    state_schema = "n long"

    def count_fn(key, pdf_iter, state):
        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    stream = (
        read_events_stream(spark, sf_dir)
        .select("user_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            count_fn, out_schema, state_schema, "update", "NoTimeout"
        )
    )
    got = run_to_completion(stream, output_mode="update")
    # update mode may emit a row per micro-batch per key: keep the max
    # (monotone counts), one micro-batch here in practice
    final = {
        r["user_id"]: r["n"]
        for r in got.groupBy("user_id").agg(F.max("n").alias("n")).collect()
    }
    from ght2dm_spark.io import load_table

    expect = {
        r["user_id"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert final == expect


def test_stream_stream_interval_join(spark, sf_dir):
    """Stream-stream inner join with watermarks + a time-range condition
    (clicks within the hour before each purchase) — state-bounded on both
    sides; result equals the equivalent batch join."""
    from ght2dm_spark.io import load_table

    def sides(reader):
        p = (
            reader()
            .filter(F.col("event_type") == "purchase")
            .select(F.col("event_id").alias("p_id"), F.col("user_id").alias("p_uid"),
                    F.col("ts").alias("p_ts"))
            .withWatermark("p_ts", "2 hours")
        )
        c = (
            reader()
            .filter(F.col("event_type") == "click")
            .select(F.col("event_id").alias("c_id"), F.col("user_id").alias("c_uid"),
                    F.col("ts").alias("c_ts"))
            .withWatermark("c_ts", "2 hours")
        )
        cond = (
            (F.col("p_uid") == F.col("c_uid"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts"))
        )
        return p.join(c, cond).select("p_id", "c_id")

    stream_out = run_to_completion(
        sides(lambda: read_events_stream(spark, sf_dir)), output_mode="append"
    )
    batch_out = sides(lambda: load_table(spark, sf_dir, "events"))
    assert _rows(stream_out) == _rows(batch_out)
    assert stream_out.count() > 0


def test_streaming_corpus_ingest_pipeline(spark, sf_dir, tmp_path):
    """Streaming CURATION composition: documents arrive over multiple
    micro-batches (maxFilesPerTrigger=1), each batch flows through the
    quality gate → exact-dedup (cross-batch, via the keyed upsert sink)
    → parquet corpus.  The drained corpus equals the batch-mode
    filter+dedup — the same curation semantics, incremental delivery."""
    import shutil

    from pyspark.sql import functions as F

    from ght2dm_spark.io import load_table

    src = str(tmp_path / "docs_src")
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(3).write.parquet(src)
    target = tmp_path / "corpus"

    def curate(batch_df, batch_id):
        batch = (
            batch_df.filter(F.col("n_chars") >= 100)
            .withColumn("h", F.md5("text"))
            .dropDuplicates(["h"])
            .select("doc_id", "h", "n_chars")
        )
        if target.exists():
            cur = spark.read.parquet(str(target))
            merged = cur.join(batch, "h", "left_anti").unionByName(batch)
        else:
            merged = batch
        tmp = str(tmp_path / f"swap_{batch_id}")
        merged.write.mode("overwrite").parquet(tmp)
        if target.exists():
            shutil.rmtree(target)
        shutil.move(tmp, target)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(curate)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress["batchId"] >= 1

    expect = (
        docs.filter(F.col("n_chars") >= 100)
        .withColumn("h", F.md5("text"))
        .dropDuplicates(["h"])
    )
    got = spark.read.parquet(str(target))
    assert got.count() == expect.count()
    assert got.select("h").distinct().count() == expect.count()


def test_dedup_watermark_state_bounded_by_horizon(spark, sf_dir, tmp_path):
    """The claim in t1_stream_dedup_watermark's docstring, MEASURED: with
    RocksDB state (session.py pins the provider) and a 30-minute
    watermark horizon, dropDuplicatesWithinWatermark state tracks the
    horizon, not history.  Events (30 days of data) stream in 5
    time-ordered files, one per micro-batch; peak state must stay near
    one batch's window and the final cleanup batch must evict
    everything older than the horizon."""
    import shutil
    import uuid

    from ght2dm_spark.io import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    total = ev.count()
    rows_dir = str(tmp_path / "files")
    os.makedirs(rows_dir)
    bounds = ev.select(
        F.percentile_approx("ts", [0.2, 0.4, 0.6, 0.8], 10000).alias("b")
    ).collect()[0].b
    edges = [None, *bounds, None]
    for i in range(5):
        c = ev
        if edges[i] is not None:
            c = c.filter(F.col("ts") > edges[i])
        if edges[i + 1] is not None:
            c = c.filter(F.col("ts") <= edges[i + 1])
        d = str(tmp_path / f"w{i}")
        c.coalesce(1).write.mode("overwrite").parquet(d)
        src = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        dst = os.path.join(rows_dir, f"f{i}.parquet")
        shutil.move(os.path.join(d, src), dst)
        # file source orders batches by mod time — pin the sequence
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(rows_dir)
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    name = f"snk_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    progress = [p for p in q.recentProgress if p.stateOperators]
    assert len(progress) >= 5  # genuinely multi-batch
    peak = max(p.stateOperators[0].numRowsTotal for p in progress)
    final = progress[-1].stateOperators[0]
    # state ≈ one batch window (~total/5 keys), never history
    assert peak <= total * 0.3, f"state grew like history: peak={peak}/{total}"
    # the final cleanup batch evicts everything beyond the horizon
    assert final.numRowsTotal <= total * 0.05, f"final state {final.numRowsTotal}"
    assert sum(p.stateOperators[0].numRowsRemoved for p in progress) > 0
    # RocksDB provider really is serving the state store
    assert any("rocksdb" in k.lower() for k in dict(final.customMetrics))
    # unique keys → every event emitted exactly once despite eviction
    assert spark.table(name).count() == total


def test_streaming_incremental_lsh_neardup_index(spark, sf_dir, tmp_path):
    """Incremental NEAR-dup index maintenance — the 'dedup tonight's
    crawl against the corpus so far' pattern: documents arrive over
    micro-batches; each batch MinHashes its docs, probes the
    accumulated band-bucket store for cross-batch candidates, finds its
    within-batch candidates, then appends its own bands to the store.
    No batch ever re-signatures old documents, yet the accumulated
    candidate-pair set must EQUAL the batch-mode LSH candidate pairs
    over the full corpus: a pair (a, b) shares a band bucket whether
    the two docs arrive together or apart, so incremental delivery
    loses nothing (LSH banding is arrival-order-independent)."""
    from pyspark.sql import functions as F

    from ght2dm_spark.operators.neardup import (
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signature,
    )
    from ght2dm_spark.queries.dedup_queries import (
        LSH_BANDS,
        LSH_ROWS,
        MINHASH_K,
        _aug_docs,
    )

    aug = _aug_docs(spark, sf_dir)
    src = str(tmp_path / "docs_src")
    aug.repartition(3).write.parquet(src)
    band_store = tmp_path / "band_store"
    pair_store = tmp_path / "pair_store"

    def index_batch(batch_df, batch_id):
        sig = minhash_signature(batch_df, "doc_id", "text", k=MINHASH_K)
        bands = lsh_bands(sig, "doc_id", LSH_BANDS, LSH_ROWS)
        within = lsh_candidate_pairs(bands, "doc_id")
        if band_store.exists():
            prev = spark.read.parquet(str(band_store))
            cross = (
                bands.join(prev, ["band", "band_key"])
                .select(
                    F.least("doc_id", "prev_id").alias("id_a"),
                    F.greatest("doc_id", "prev_id").alias("id_b"),
                )
                .distinct()
            )
            pairs = within.unionByName(cross).distinct()
        else:
            pairs = within
        pairs.write.mode("append").parquet(str(pair_store))
        bands.withColumnRenamed("doc_id", "prev_id").write.mode(
            "append"
        ).parquet(str(band_store))

    stream = (
        spark.readStream.schema(aug.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(index_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress["batchId"] >= 1  # genuinely incremental

    got = {
        (r.id_a, r.id_b)
        for r in spark.read.parquet(str(pair_store)).distinct().collect()
    }
    ref_bands = lsh_bands(
        minhash_signature(aug, "doc_id", "text", k=MINHASH_K),
        "doc_id",
        LSH_BANDS,
        LSH_ROWS,
    )
    want = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(ref_bands, "doc_id").collect()
    }
    assert len(want) > 0
    assert got == want
