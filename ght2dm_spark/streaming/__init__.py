"""Structured Streaming support (SURVEY §2.9 "Streaming (events)").

The driver contract wants a *batch* DataFrame back from every declared
query, so streaming operators run here as real ``readStream`` pipelines
driven to completion with ``Trigger.AvailableNow`` into a memory sink,
then returned as the sink's table — the streaming engine (micro-batch
planner, state store, watermarks) genuinely executes, and the result is
still oracle-comparable.  Unbounded production deployment is the same
pipeline with a different trigger + sink.

Scale notes: file-source streaming at 100 TB partitions by input files
(maxFilesPerTrigger); stateful ops (window aggs, dedup) shuffle on their
state key per micro-batch and persist state in the checkpointed state
store — state sizing is governed by the watermark horizon, which every
windowed query here sets.
"""

from __future__ import annotations

import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ght2dm_spark.io import load_table


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet with the same declared schema
    + nanos→micros normalization as the batch reader (io.load_table), so
    batch and stream see identical rows."""
    from pyspark.sql import functions as F

    from ght2dm_spark.schemas import TESTDATA

    # The file source requires a DIRECTORY; events.parquet is a single
    # file, so stream the parent dir with a glob filter selecting it.
    stream = (
        spark.readStream.schema(TESTDATA["events"])
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def run_to_completion(
    transformed: DataFrame,
    output_mode: str,
) -> DataFrame:
    """Drive a streaming DataFrame to completion (AvailableNow) into a
    uniquely-named memory sink; return the sink contents as a batch DF."""
    name = f"sink_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="ght2dm-ckpt-")
    q = (
        transformed.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return transformed.sparkSession.table(name)


def stream_equals_batch(
    spark: SparkSession,
    sf_dir: str,
    build: Callable[[DataFrame], DataFrame],
    output_mode: str = "complete",
) -> tuple[DataFrame, DataFrame]:
    """Run the same transformation over the events table in streaming and
    batch form; return (stream_result, batch_result) for equivalence
    checks (SURVEY §5 item 5)."""
    stream_out = run_to_completion(build(read_events_stream(spark, sf_dir)), output_mode)
    batch_out = build(load_table(spark, sf_dir, "events"))
    return stream_out, batch_out
