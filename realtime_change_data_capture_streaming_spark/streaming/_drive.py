"""Shared drive for staged-file micro-batch streams.

Every stateful streaming query in this engine follows the same harness:
a directory of mtime-ordered staged files consumed one-per-trigger (so
each staged frame IS one micro-batch), a foreachBatch gate holding the
per-batch state discipline, an availableNow trigger, and a strip-proof
``drain``.  That recipe was copy-pasted across ~10 call sites (VERDICT
r12 task 8); one definition here makes the drain discipline unmissable
for new queries and keeps the trigger/ordering options from drifting.

At scale the file source stands in for Kafka: swap ``staged_source`` for
``spark.readStream.format("kafka")`` with ``maxOffsetsPerTrigger`` and
every gate runs unchanged — foreachBatch sees the same per-batch frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from realtime_change_data_capture_streaming_spark.session import drain


def staged_source(
    spark: SparkSession, in_dir: str, schema, files_per_trigger: int = 1
) -> DataFrame:
    """A parquet file stream over staged micro-batch files, oldest
    first, ``files_per_trigger`` files per micro-batch."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(files_per_trigger))
        .option("latestFirst", "false")
        .parquet(in_dir)
    )


def drive_staged_stream(
    spark: SparkSession,
    in_dir: str,
    schema,
    gate,
    checkpoint: str,
    files_per_trigger: int = 1,
    timeout_s: int = 600,
    transform=None,
) -> None:
    """Run ``gate(batch_df, batch_id)`` over every staged micro-batch
    with an availableNow trigger, blocking until the stream drains
    (raises on timeout or on a gate exception — the crash-replay path
    the checkpoint protects).  ``transform`` optionally rewrites the
    streaming frame BEFORE the sink (e.g. ``parse_envelope``) so the
    gate sees decoded rows."""
    src = staged_source(spark, in_dir, schema, files_per_trigger)
    if transform is not None:
        src = transform(src)
    q = (
        src.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    drain(q, timeout_s)
