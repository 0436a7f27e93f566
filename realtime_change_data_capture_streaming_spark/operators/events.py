"""Event-time analytics over the ``events`` fixture — the batch mirrors of
the streaming operators (tumbling/sliding/session windows, JSON props).

These run identically as Structured Streaming queries (same expressions
over ``readStream``); the streaming wrappers live in
``realtime_change_data_capture_streaming_spark.streaming``.  Batch variants exist so the driver's DuckDB
oracle can verify the window semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.operators._util import dsum
from realtime_change_data_capture_streaming_spark.sources.tables import load_table


def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows: count + exact value sum per event type.
    ``window()`` is the same expression streaming uses; project start/end
    so the oracle can reproduce with date_trunc."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


TUMBLING_SQL = """
SELECT DATE_TRUNC('hour', ts) AS win_start,
       DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR AS win_end,
       event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h size, 30 min slide): each event lands in exactly
    2 windows.  Spark assigns via the window() expression (an Expand node —
    cost scales with size/slide ratio, fine at 2x)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("win_start"), "n_events")
    )


SLIDING_SQL = """
WITH assigned AS (
  SELECT ts, DATE_TRUNC('hour', ts) + CASE WHEN EXTRACT(MINUTE FROM ts) >= 30
           THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS win_start
  FROM events
  UNION ALL
  SELECT ts, DATE_TRUNC('hour', ts) + CASE WHEN EXTRACT(MINUTE FROM ts) >= 30
           THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END - INTERVAL 30 MINUTE
  FROM events
)
SELECT win_start, COUNT(*) AS n_events FROM assigned GROUP BY win_start
"""


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): sessions split on >10 min
    inactivity per user.  Same semantics as streaming session_window(ts,
    '10 minutes'); expressed with lag + cumulative sum so the oracle can
    verify exactly.  One shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsess = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # exact integer microseconds on both engines — no float/truncation
    # disagreement at the 10-minute boundary
    marked = ev.withColumn(
        "new_session",
        (
            F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts")), 1, 0).over(w)
            > 600_000_000
        ).cast("int"),
    ).withColumn("session_no", F.sum("new_session").over(wsess))
    return (
        marked.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.col("session_no").cast("bigint").alias("session_no"),
            "session_start",
            "session_end",
            "n_events",
        )
    )


SESSION_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts), 1, 0) OVER
              (PARTITION BY user_id ORDER BY ts, event_id) > 600000000 THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM marked
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       MIN(ts) AS session_start, MAX(ts) AS session_end, COUNT(*) AS n_events
FROM numbered GROUP BY user_id, session_no
"""


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the props column (get_json_object path) + agg.
    JSON parsing is JVM-side — no Python in the row path."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


JSON_PROPS_SQL = """
SELECT event_type,
       COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""


def events_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup, latest-wins by (ts, event_id) — the batch shape of the
    CDC apply-changes reduction (max_by hash agg, no window sort)."""
    ev = load_table(spark, sf_dir, "events")
    payload = F.struct("ts", "event_id", "event_type", "value")
    return (
        ev.groupBy("user_id")
        .agg(F.max_by(payload, F.struct("ts", "event_id")).alias("last"))
        .select(
            "user_id",
            F.col("last.ts").alias("last_ts"),
            F.col("last.event_id").alias("last_event_id"),
            F.col("last.event_type").alias("last_event_type"),
        )
    )


DEDUP_LATEST_SQL = """
SELECT user_id, ts AS last_ts, event_id AS last_event_id, event_type AS last_event_type
FROM (
  SELECT user_id, ts, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


QUERIES = {
    "events_tumbling_hourly": events_tumbling_hourly,
    "events_sliding_windows": events_sliding_windows,
    "events_sessionization": events_sessionization,
    "events_json_props": events_json_props,
    "events_dedup_latest": events_dedup_latest,
}

ORACLE = {
    "events_tumbling_hourly": TUMBLING_SQL,
    "events_sliding_windows": SLIDING_SQL,
    "events_sessionization": SESSION_SQL,
    "events_json_props": JSON_PROPS_SQL,
    "events_dedup_latest": DEDUP_LATEST_SQL,
}
