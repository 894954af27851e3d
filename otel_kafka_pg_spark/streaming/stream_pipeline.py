"""Structured Streaming re-expression of the reference's ingest loop.

The reference is a streaming consumer: a Kafka poll loop feeds a
mutex-guarded buffer that flushes to the sinks when it reaches BatchSize
rows or FlushInterval ms (reference: modules/kafka/consumer/consumer.go:
162-225 poll, :188-197 size trigger, :148-159 time trigger). The north rule
targets the BATCH re-expression (plans/pipeline.py), but the streaming
shape maps 1:1 onto Structured Streaming and is provided here for parity
of capability:

    Kafka poll loop          → ``readStream`` file/kafka source
    BatchSize/FlushInterval  → ``maxFilesPerTrigger`` / processing trigger
    buffer flush → save      → ``foreachBatch``: the SAME transform DAG
                               (build_routed) + per-sink append
    at-least-once + upsert   → checkpoint replays a failed micro-batch;
                               per-(sink, batch_id) commit markers make the
                               replayed appends idempotent — a sink that
                               already committed batch N is skipped, so a
                               failure between sink writes cannot duplicate
                               rows on restart (effectively-once at batch
                               granularity; parquet's output committer makes
                               each single append atomic)
    batch-insert count logs  → per-batch sink_counts appends; totals are a
                               sum over micro-batches (count parity with the
                               batch pipeline is asserted in tests)

A swap of the source line to ``spark.readStream.format("kafka")`` gives the
reference's exact topology; the file source keeps tests hermetic.

``streaming_severity_counts`` additionally demonstrates the event-time path
the reference lacks entirely (SURVEY §2.10: no watermarks, no event-time
windows in the reference): watermarked hourly tumbling-window severity
counts — late data beyond the watermark is dropped instead of corrupting
closed buckets.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.route import SINK_BUILDERS, sink_counts
from ..schemas import TRANSCRIPTS


def run_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    lookup: DataFrame | None = None,
    max_files_per_trigger: int = 4,
    parse_impl: str = "pandas",
) -> None:
    """Drain ``input_dir`` (parquet files of transcript turns) through the
    full transform DAG in micro-batches; append per-sink parquet + counts.

    Uses ``trigger(availableNow=True)``: process everything currently
    present, in ``max_files_per_trigger`` chunks (the BatchSize analog),
    then stop — the hermetic-test / backfill mode. A production deployment
    drops ``availableNow`` for a continuous processing-time trigger.
    """
    from ..plans.pipeline import build_routed

    checkpoint = os.path.join(out_dir, "_checkpoint")
    stream = (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # identical semantics to the batch pipeline: the micro-batch frame
        # is a plain DataFrame, so the whole DAG (parse, ordering window,
        # broadcast enrich, route) applies unchanged
        routed = build_routed(spark, batch_df, lookup, parse_impl).persist()
        try:
            builders = {**SINK_BUILDERS, "sink_counts": sink_counts}
            for name, builder in builders.items():
                # idempotent replay: if this (sink, batch) already committed
                # (marker present), a checkpoint-replayed batch skips it —
                # without this, a failure after writing some sinks would
                # re-append to them on restart, duplicating rows. A crash
                # between append-commit and marker-write re-appends that one
                # sink; the marker is written immediately after the commit
                # so the window is one filesystem call wide, and the
                # deterministic row IDs let any downstream dedup close it.
                marker_dir = os.path.join(out_dir, name, "_batches")
                marker = os.path.join(marker_dir, f"{batch_id}.done")
                if os.path.exists(marker):
                    continue
                builder(routed).write.mode("append").parquet(os.path.join(out_dir, name))
                os.makedirs(marker_dir, exist_ok=True)
                with open(marker, "w"):
                    pass
        finally:
            routed.unpersist()

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def total_sink_counts(spark: SparkSession, out_dir: str) -> DataFrame:
    """Re-aggregate the per-micro-batch count appends into totals — the
    frame to compare against the batch pipeline's sink_counts (count
    parity across the batch/streaming boundary)."""
    return (
        spark.read.parquet(os.path.join(out_dir, "sink_counts"))
        .groupBy("sink", "conv_id", "role", "tool", "time_bucket")
        .agg(F.sum("n").alias("n"))
    )


def streaming_severity_counts(
    spark: SparkSession,
    input_dir: str,
    watermark: str = "2 hours",
    window: str = "1 hour",
    parse_impl: str = "pandas",
) -> DataFrame:
    """Watermarked event-time windowed severity counts over the turn stream.

    Returns the streaming DataFrame (caller starts it, e.g. to a memory
    sink with availableNow for tests). Late rows older than the watermark
    are dropped once their window closes — the event-time discipline the
    reference never had (it ignores event-time disorder entirely).
    """
    from ..functions.parse import parse_turns

    stream = spark.readStream.schema(TRANSCRIPTS).parquet(input_dir)
    parsed = parse_turns(stream, impl=parse_impl)
    return (
        parsed.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("bucket"), "severity")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("bucket.start").alias("bucket_start"), "severity", "cnt")
    )
