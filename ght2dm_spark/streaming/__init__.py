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

import contextlib
import os
import shutil
import tempfile
import uuid
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ght2dm_spark.io import (
    ensure_session_conf,
    events_read_schema,
    load_table,
    normalize_ns_ts,
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet with the same schema
    adaptation as the batch reader (io.load_table) — footer-sniffed
    nanos-vs-micros ``ts``, normalized to TIMESTAMP_NTZ — so batch and
    stream see identical rows."""
    ensure_session_conf(spark)
    schema, ns_ts = events_read_schema(os.path.join(sf_dir, "events.parquet"))
    # The file source requires a DIRECTORY; events.parquet is a single
    # file, so stream the parent dir with a glob filter selecting it.
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ns_ts:
        stream = stream.withColumn("ts", normalize_ns_ts("ts"))
    # withWatermark demands TIMESTAMP (LTZ); with the session zone pinned
    # to UTC the cast is an identity reinterpretation.  Streaming queries
    # cast timestamp OUTPUT columns back to NTZ so collected values don't
    # shift with the verifying process's zone.
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the documents parquet with the declared batch
    schema (no inference job) — the corpus-as-stream source for the
    streaming curation queries.  Same single-file glob trick as
    :func:`read_events_stream`; no timestamp column, so no ns/NTZ
    adaptation is needed."""
    from ght2dm_spark.schemas import TESTDATA

    ensure_session_conf(spark)
    return (
        spark.readStream.schema(TESTDATA["documents"])
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def stream_shuffle_parts() -> str:
    """Shuffle/state-partition count for streaming runs.

    A stateful streaming query sizes its state-store partition count —
    and a ``foreachBatch`` sink its per-micro-batch shuffles — from
    ``spark.sql.shuffle.partitions`` at query start.  The session-wide
    batch value (cores locally, input-sized on a cluster) is the wrong
    knob for streams whose per-batch state and deltas are KB-sized:
    every extra state partition pays a fixed store-provider open/commit
    cost per micro-batch, so 32 partitions of ~nothing cost ~4x more
    wall clock than 8 (measured: t1_stream_update_counts 4.95s at 32 ->
    1.80s at 8 shuffle partitions, same result).  Production sizes this
    to the state volume / watermark horizon instead — hence the env
    knob rather than a constant."""
    return os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8")


@contextlib.contextmanager
def stream_shuffle_scope(spark: SparkSession) -> Iterator[None]:
    """Scoped ``spark.sql.shuffle.partitions`` override for one
    streaming run: set to :func:`stream_shuffle_parts` before the query
    starts, restored after it terminates (the streaming engine reads
    the conf at query start, so the scope must cover start->await)."""
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, stream_shuffle_parts())
    try:
        yield
    finally:
        spark.conf.set(key, old)


def run_to_completion(
    transformed: DataFrame,
    output_mode: str,
    expect_single_batch: bool = False,
    row_grain_state: bool = False,
) -> DataFrame:
    """Drive a streaming DataFrame to completion (AvailableNow) into a
    uniquely-named memory sink; return the sink contents as a batch DF.

    ``expect_single_batch`` asserts (from the query's progress events)
    that every input row was processed in ONE micro-batch — for queries
    whose exact-DISTINCT oracle is only valid while duplicate copies
    can't straddle a state-eviction boundary.  A fixture or trigger
    change that splits the input then fails loudly instead of flaking
    the oracle.

    ``row_grain_state`` marks queries whose state scales with the INPUT
    (per-row dedup keys, stream-stream join buffers) rather than with a
    bounded key set: those keep the session's batch-sized partitioning
    instead of the small :func:`stream_shuffle_parts` override
    (measured: t1_stream_replay_dedup regresses 2x at 4 partitions
    while every keyed-state query improves)."""
    spark = transformed.sparkSession
    scope = (
        contextlib.nullcontext() if row_grain_state else stream_shuffle_scope(spark)
    )
    name = f"sink_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="ght2dm-ckpt-")
    with scope:
        q = (
            transformed.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
            if expect_single_batch:
                fed = [p for p in q.recentProgress if (p.numInputRows or 0) > 0]
                # > 1, not != 1: an EMPTY input (zero data-bearing batches)
                # trivially satisfies the no-straddle guarantee — DISTINCT
                # over nothing must return nothing, not raise
                if len(fed) > 1:
                    raise AssertionError(
                        f"expected all input in one micro-batch, got {len(fed)} "
                        f"data-bearing batches: {[p.numInputRows for p in fed]}"
                    )
        except BaseException:
            # the failure path must not leak what the hygiene block below
            # exists to clean: a raising UDF over the ~50-query driver walk
            # would otherwise accrue one checkpoint dir + temp view per error
            try:
                q.stop()
            finally:
                shutil.rmtree(ckpt, ignore_errors=True)
                try:
                    transformed.sparkSession.catalog.dropTempView(name)
                except Exception:
                    pass
            raise
    # hygiene: the AvailableNow query has terminated — stop it and drop
    # its checkpoint dir, or a long session (the ~50-query driver walk)
    # accrues one ght2dm-ckpt-* state-store dir per call.  The memory
    # sink table itself must outlive this function (it IS the returned
    # result — bounded aggregate/result-sized by construction); callers
    # that loop can dropTempView the returned table's name when done.
    q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)
    return transformed.sparkSession.table(name)


def stream_equals_batch(
    spark: SparkSession,
    sf_dir: str,
    build: Callable[[DataFrame], DataFrame],
    output_mode: str = "complete",
) -> tuple[DataFrame, DataFrame]:
    """Run the same transformation over the events table in streaming and
    batch form; return (stream_result, batch_result) for equivalence
    checks (SURVEY §5 item 5).

    Both results are NTZ-normalized: the stream side's event time is LTZ
    (withWatermark requires it) while the batch side reads NTZ, so a
    surfaced timestamp column would otherwise collect through
    process-local datetime.fromtimestamp on one side and UTC wall-clock
    on the other — equality would break under any non-UTC verifying
    process even though both plans are value-correct (the repo's
    no-LTZ-output rule, applied to the equivalence harness itself)."""

    def _ntz(df: DataFrame) -> DataFrame:
        from pyspark.sql.types import TimestampType

        out = df
        for f in df.schema.fields:
            if isinstance(f.dataType, TimestampType):
                out = out.withColumn(f.name, F.col(f.name).cast("timestamp_ntz"))
        return out

    stream_out = run_to_completion(build(read_events_stream(spark, sf_dir)), output_mode)
    batch_out = build(load_table(spark, sf_dir, "events"))
    return _ntz(stream_out), _ntz(batch_out)
