"""The flagship CDC pipeline run by the REAL streaming engine, end to end,
inside the correctness gate.

Change events derived from orders (cdc.queries.order_change_events, with
duplication + reorder chaos) are staged as JSON files, consumed as a
multi-micro-batch file stream (the Kafka stand-in), parsed, and merged
into a BucketedParquetSink via foreachBatch — checkpointed offsets +
idempotent latest-wins merge = the reference's effectively-once contract
(transaction_consumer.py:10, :88).  The oracle is the same closed-form
final state from orders used by the batch variant: the streaming and
batch paths must agree exactly.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.cdc.apply_changes import BucketedParquetSink, apply_changes_stream
from realtime_change_data_capture_streaming_spark.cdc.decode import parse_envelope
from realtime_change_data_capture_streaming_spark.cdc.queries import CDC_APPLY_SQL, order_change_events


def stream_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = tempfile.mkdtemp(prefix="stream_cdc_")
    events = order_change_events(spark, sf_dir, chaos=True)
    # parquet staging (the envelope JSON lives in the value column; the
    # container just needs to move strings fast), keeping the chaos
    # generator's own partitioning — no second shuffle.  maxFilesPerTrigger
    # splits the files into two micro-batches so the merge must compose
    # across batches, not just within one.
    events.write.mode("overwrite").parquet(f"{work}/staged")
    import glob

    n_files = max(1, len(glob.glob(f"{work}/staged/part-*")))
    stream = (
        spark.readStream.schema("key string, value string")
        .option("maxFilesPerTrigger", max(1, (n_files + 1) // 2))
        .parquet(f"{work}/staged")
    )
    parsed = parse_envelope(stream, decimal_mode="string")
    sink = BucketedParquetSink(spark, f"{work}/sink", n_buckets=8)
    q = apply_changes_stream(parsed, sink, f"{work}/ckpt", trigger={"availableNow": True})
    q.awaitTermination(600)
    final = sink.read()
    return final.select(
        F.col("transaction_id"),
        F.col("user_id"),
        F.col("amount"),
        F.col("currency"),
        F.col("merchant_name"),
        F.col("voucher_code"),
    )


QUERIES = {"stream_cdc_merge": stream_cdc_merge}
ORACLE = {"stream_cdc_merge": CDC_APPLY_SQL}
