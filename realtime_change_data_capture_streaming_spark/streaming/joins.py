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


def _flush_padded_events_dir(sf_dir: str) -> str:
    """Stream dir that makes watermark-gated state eviction deterministic.

    Watermark-finalized rows (outer-join nulls, append-mode aggregate
    closes) only emit once the watermark passes their horizon, and the
    watermark used by batch N derives from data seen through batch N-1 —
    so a data-only schedule would never flush the tail.  Layout: the
    fixture file plus ONE sentinel file with far-future timestamps, all
    consumed in a SINGLE data micro-batch (the consumers set no
    maxFilesPerTrigger): the watermark only updates at batch END, so the
    in-batch sentinels cannot suppress any real output, they just push
    both sides' watermarks past every real row's horizon; the engine's
    trailing no-data micro-batch (noDataMicroBatches, on by default;
    observed to run under availableNow) then performs the final eviction.
    Each micro-batch carries per-state-store fixed cost, so one data
    batch + the no-data flush is the minimal deterministic schedule
    (shared by the as-of enrichment and both outer attributions).  The
    staggered mtimes only keep file order deterministic if a future
    consumer re-splits per file.  Sentinels carry negative user_ids and
    are filtered from the result.
    """
    import os
    from realtime_change_data_capture_streaming_spark.session import scratch_dir
    import time
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = scratch_dir(prefix="ev_louter_")
    src = os.path.join(sf_dir, "events.parquet")
    os.symlink(src, os.path.join(d, "00_events.parquet"))
    schema = pq.read_schema(src).remove_metadata()

    def write_sentinels(name: str, uid: int, base: datetime, mtime: float) -> None:
        # one 'view' + one 'purchase', 10 h apart so they never join
        rows = {
            "event_id": [uid * 100 - 1, uid * 100 - 2],
            "ts": [base, base.replace(hour=10)],
            "user_id": [uid, uid],
            "event_type": ["view", "purchase"],
            "value": [0.0, 0.0],
            "props": [None, None],
        }
        cols = [
            pa.array(rows[f.name]).cast(f.type) if f.name != "ts" else
            pa.array(rows["ts"], type=f.type)
            for f in schema
        ]
        path = os.path.join(d, name)
        pq.write_table(pa.Table.from_arrays(cols, schema=schema), path)
        os.utime(path, (mtime, mtime))

    write_sentinels("01_flush.parquet", -1, datetime(2030, 1, 1), time.time() + 10)
    return d


def stream_left_outer_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join: every view, attributed to a purchase
    within 30 minutes or emitted with nulls once the watermark proves no
    purchase can still arrive — the streaming form of left-join conversion
    attribution, state bounded by watermark + interval on both sides.

    State partitions are sized to the query's state volume (a stream-stream
    join commits several state stores PER shuffle partition PER batch, so
    oversized partitioning is pure fixed cost; at production volume this
    knob goes up with state size).  The session's shuffle setting is
    restored after the bounded run."""
    import os

    d = _flush_padded_events_dir(sf_dir)
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_ndb = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    # the final eviction runs in the trailing no-data batch — pin the
    # default on in case the hosting session disabled it
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    try:
        return _outer_run(spark, sf_dir, d, raw_schema, "leftOuter")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prev_ndb)


def stream_full_outer_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER join — the last outer mode: every view
    AND every purchase appears, matched within the interval or emitted
    with nulls once the watermark proves the partner cannot arrive.
    Same bounded-state machinery and deterministic flush schedule as the
    left-outer variant (shared ``_outer_run``); the unmatched-purchase
    side additionally proves the RIGHT-side state eviction path."""
    import os

    d = _flush_padded_events_dir(sf_dir)
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_ndb = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    try:
        return _outer_run(spark, sf_dir, d, raw_schema, "fullOuter")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prev_ndb)


def _outer_run(spark: SparkSession, sf_dir: str, d: str, raw_schema, how: str) -> DataFrame:
    # one data batch (fixture + far-future sentinels together), then the
    # trailing no-data micro-batch evicts under the sentinel-advanced
    # watermark — the stream_asof_enrich schedule (r9): the watermark
    # only updates at batch END, so in-batch sentinels cannot suppress
    # any real join output, and each dropped micro-batch saves the
    # per-state-store commit cost (4 store families for a stream-stream
    # join)
    stream = spark.readStream.schema(raw_schema).parquet(d)
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dict(stream.dtypes).get("ts") == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    views = (
        stream.filter(F.col("event_type") == "view")
        .select(F.col("user_id"), F.col("ts").alias("view_ts"), F.col("event_id").alias("view_id"))
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
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
        how,
    ).select(
        F.coalesce("user_id", "p_user_id").alias("user_id"),
        "view_id",
        "purchase_id",
        "view_ts",
        "purchase_ts",
    )
    return _run_to_table(joined, "append").filter(F.col("user_id") >= 0)


STREAM_LEFT_OUTER_SQL = """
SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
       v.ts AS view_ts, p.ts AS purchase_ts
FROM events v
LEFT JOIN events p
  ON p.event_type = 'purchase'
 AND v.user_id = p.user_id
 AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
WHERE v.event_type = 'view'
"""


STREAM_FULL_OUTER_SQL = """
SELECT COALESCE(v.user_id, p.user_id) AS user_id,
       v.event_id AS view_id, p.event_id AS purchase_id,
       v.ts AS view_ts, p.ts AS purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'view') v
FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
"""




def stream_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING as-of enrichment — the CDC-consumer ask the reference's
    sink sidesteps (`transaction_consumer.py:85-102` upserts rows and
    never enriches): each purchase is decorated with the user's LATEST
    view at or before it, within a 1-hour horizon.  An unbounded
    streaming as-of is impossible (the latest-before version may be
    arbitrarily old, so state would be infinite); the streaming analog
    is as-of WITH TOLERANCE, and the tolerance is exactly what bounds
    the state.

    Two chained stateful operators, both watermark-bounded:
    (1) a stream-stream interval join collects the candidate dimension
    versions (views within (purchase_ts - 1h, purchase_ts]), each side's
    state evicted by watermark + interval; (2) an event-time-keyed
    aggregate picks max(struct(view_ts, ...)) per purchase —
    latest-before — and finalizes in append mode once the watermark
    passes the purchase timestamp.  Because a purchase's group emits
    only at watermark close, a version arriving AFTER its purchase was
    seen (but inside the watermark allowance) still wins if it is the
    latest in the horizon — the late-arriving-dimension property; views
    later than the allowance are dropped by the watermark like any
    streaming aggregate's late data.  Grouping is per purchase EVENT
    (event_id carried through the join), not per (user, ts): two
    purchases by one user at the same timestamp each get their own
    enrichment row, exactly like the batch ASOF oracle.

    Trigger schedule (r9): the fixture + sentinel files are consumed in
    ONE micro-batch (no maxFilesPerTrigger split).  An inner interval
    join needs no cross-batch isolation — matches emit as soon as both
    sides are in state — and the append-mode agg only needs the
    watermark to pass each purchase, which the sentinels provide at the
    END of that single batch; the engine's trailing no-data micro-batch
    (see ``_flush_padded_events_dir``) then finalizes every real group.
    Two chained stateful operators commit state per partition per batch,
    so one data batch + one no-data flush is the minimal schedule —
    the multi-batch split only paid fixed cost.  Oracle: the batch
    toleranced as-of (``operators/asof.py::events_asof_view_within_1h``
    semantics) — the nearest match filtered to the horizon equals the
    windowed max."""
    import os

    d = _flush_padded_events_dir(sf_dir)
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_ndb = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    # state-partition sizing (the r5 discipline): TWO chained stateful
    # operators here commit join + aggregate state stores per shuffle
    # partition per micro-batch — 4 store families total — so this query
    # pays 2x the per-partition fixed cost of a single stateful op and
    # earns the smallest partition count of the streaming suite.  At the
    # fixture's state volume (tens of KB per store) 2 partitions is
    # honest; at production volume this knob scales up with state size.
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    try:
        stream = spark.readStream.schema(raw_schema).parquet(d)
        if dict(stream.dtypes).get("ts") == "bigint":
            stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif dict(stream.dtypes).get("ts") == "timestamp_ntz":
            stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
        views = (
            stream.filter(F.col("event_type") == "view")
            .select("user_id", F.col("ts").alias("view_ts"))
            .withWatermark("view_ts", "1 hour")
        )
        purchases = (
            stream.filter(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user_id"),
                F.col("ts").alias("purchase_ts"),
                F.col("event_id").alias("purchase_id"),
            )
            .withWatermark("purchase_ts", "1 hour")
        )
        cand = purchases.join(
            views,
            (F.col("p_user_id") == F.col("user_id"))
            & (F.col("view_ts") <= F.col("purchase_ts"))
            & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("interval 1 hour")),
        )
        enriched = (
            cand.groupBy("p_user_id", "purchase_ts", "purchase_id")
            .agg(F.max(F.struct("view_ts")).alias("m"))
            .select(
                F.col("p_user_id").alias("user_id"),
                "purchase_ts",
                F.col("m.view_ts").alias("view_ts"),
                (F.unix_micros("purchase_ts") - F.unix_micros(F.col("m.view_ts"))).alias(
                    "gap_us"
                ),
            )
        )
        return _run_to_table(enriched, "append").filter(F.col("user_id") >= 0)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prev_ndb)


STREAM_ASOF_SQL = """
SELECT user_id, purchase_ts, view_ts, gap_us FROM (
  SELECT p.user_id, p.ts AS purchase_ts, v.ts AS view_ts,
         CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS gap_us
  FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
  ASOF JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
    ON p.user_id = v.user_id AND p.ts >= v.ts
) WHERE gap_us <= 3600000000
"""


QUERIES = {
    "stream_view_purchase_join": stream_view_purchase_join,
    "stream_left_outer_attribution": stream_left_outer_attribution,
    "stream_full_outer_attribution": stream_full_outer_attribution,
    "stream_asof_enrich": stream_asof_enrich,
}
ORACLE = {
    "stream_view_purchase_join": STREAM_JOIN_SQL,
    "stream_left_outer_attribution": STREAM_LEFT_OUTER_SQL,
    "stream_full_outer_attribution": STREAM_FULL_OUTER_SQL,
    "stream_asof_enrich": STREAM_ASOF_SQL,
}
