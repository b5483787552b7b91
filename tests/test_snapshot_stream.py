"""Streaming into the snapshot layer (exactly-once foreachBatch sink)
and schema-evolution reads.

The sink records each micro-batch's ``batch_id`` in the commit
manifest and refuses ids at-or-below the last committed one — the
retry a failed ``foreachBatch`` invocation triggers (same batch_id
re-delivered) must append nothing.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.snapshots import (
    commit_stream_batch,
    last_streamed_batch,
    read_snapshot,
    snapshot_sink,
    write_table_atomic,
)
from ght2dm_spark.streaming import read_events_stream


def test_stream_foreachbatch_sink_appends_snapshot(spark, sf_dir, tmp_path):
    t = str(tmp_path / "events_tbl")
    stream = read_events_stream(spark, sf_dir).select("event_id", "user_id", "event_type")
    q = (
        stream.writeStream.foreachBatch(snapshot_sink(t))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ght2dm-ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch = load_table(spark, sf_dir, "events")
    got = read_snapshot(spark, t)
    assert got.count() == batch.count()
    assert last_streamed_batch(t) is not None
    # sums, not just counts — the snapshot holds the same rows
    assert (
        got.agg(F.sum("event_id")).first()[0]
        == batch.agg(F.sum("event_id")).first()[0]
    )


def test_stream_batch_retry_is_idempotent(spark, sf_dir, tmp_path):
    t = str(tmp_path / "retry_tbl")
    rows = load_table(spark, sf_dir, "events").select("event_id").limit(10)
    assert commit_stream_batch(rows, t, batch_id=0) is not None
    n1 = read_snapshot(spark, t).count()
    # redelivery of the same batch (the foreachBatch failure-retry path)
    assert commit_stream_batch(rows, t, batch_id=0) is None
    assert read_snapshot(spark, t).count() == n1
    # a LOWER id (restart from an old checkpoint) is also refused
    assert commit_stream_batch(rows, t, batch_id=-1) is None
    # the next batch appends
    assert commit_stream_batch(rows, t, batch_id=1) is not None
    assert read_snapshot(spark, t).count() == 2 * n1
    assert last_streamed_batch(t) == 1


def test_schema_evolution_merge_read(spark, sf_dir, tmp_path):
    t = str(tmp_path / "evolve_tbl")
    nation = load_table(spark, sf_dir, "nation")
    write_table_atomic(nation, t)
    evolved = nation.withColumn("n_comment", F.lit("new"))
    write_table_atomic(evolved, t, mode="append")
    df = read_snapshot(spark, t, merge_schema=True)
    assert "n_comment" in df.columns
    n = nation.count()
    assert df.count() == 2 * n
    # old files surface NULL for the added column, new files the value
    assert df.where(F.col("n_comment").isNull()).count() == n
    assert df.where(F.col("n_comment") == "new").count() == n
