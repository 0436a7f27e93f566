"""Stream-stream joins as oracle-checked queries.

``view -> purchase`` conversion attribution within 30 minutes per user,
run by the REAL streaming engine (two watermarked streams, interval
condition bounding state on both sides), then compared to the exact batch
SQL oracle.  At scale the interval bound is what keeps join state finite:
each side buffers only rows within watermark + interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.streaming.windows import _run_to_table, events_stream


def stream_view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_stream(spark, sf_dir)
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(F.col("user_id"), F.col("ts").alias("view_ts"), F.col("event_id").alias("view_id"))
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("interval 30 minutes")),
    ).select("user_id", "view_id", "purchase_id", "view_ts", "purchase_ts")
    return _run_to_table(joined, "append")


STREAM_JOIN_SQL = """
SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
       v.ts AS view_ts, p.ts AS purchase_ts
FROM events v
JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
"""


QUERIES = {"stream_view_purchase_join": stream_view_purchase_join}
ORACLE = {"stream_view_purchase_join": STREAM_JOIN_SQL}
