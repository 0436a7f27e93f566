"""Structured Streaming operators over the events stream.

These run the REAL streaming engine (micro-batch, state store) even inside
the driver's batch-oracle harness: the source is a file stream over the
fixture parquet, the trigger is availableNow, and the result is read back
from the in-memory sink table once the query drains.  Semantics (and the
DuckDB oracles) are therefore identical to the batch mirrors in
``operators/events.py`` — which is the point: one set of expressions, two
execution modes.

Scale notes: streaming aggregations shuffle on the grouping key into the
state store; watermarks bound state.  At 100 TB/day the knobs that matter
are ``maxFilesPerTrigger``/``maxOffsetsPerTrigger`` (micro-batch sizing)
and RocksDB state backend — both config, not code.
"""

from __future__ import annotations

from realtime_change_data_capture_streaming_spark.session import drain, scratch_dir
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.operators._util import dsum
from realtime_change_data_capture_streaming_spark.sources.tables import load_table


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream over the events fixture with the same typed schema the
    batch loader produces (incl. the nanos->micros conversion)."""
    batch = load_table(spark, sf_dir, "events")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # file-stream source requires a directory: stream the sf_dir with a
    # glob restricted to the events file
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dict(stream.dtypes).get("ts") == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    # Mirror load_table's scan-time numeric normalization (decimal/float32
    # fixture drift -> double) so streaming and batch schemas stay identical.
    for f in stream.schema.fields:
        if f.dataType.typeName() in ("decimal", "float"):
            stream = stream.withColumn(f.name, F.col(f.name).cast("double"))
    assert stream.schema == batch.schema
    return stream


def _run_to_table(result: DataFrame, output_mode: str) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) and
    return the materialized result from the memory sink.

    TEST/ORACLE HARNESS ONLY: the memory sink materializes the result on
    the driver, which is fine for the bounded sf0.01 oracle check but is
    NOT a production shape — the scale path for streaming output is
    ``foreachBatch`` + a distributed sink (see ``cdc_stream.stream_cdc_merge``
    and ``BucketedParquetSink``).  Do not copy this into a data path."""
    name = f"stream_result_{uuid.uuid4().hex[:12]}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", scratch_dir(prefix=f"ckpt_{name}_"))
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    spark = result.sparkSession
    return spark.table(name)


def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-window aggregation (watermark + window state).

    Watermark is set but with availableNow + complete mode every window is
    emitted — late-data *dropping* is exercised in tests with a crafted
    two-batch source (see tests/test_streaming.py).
    """
    ev = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
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
    return _run_to_table(agg, "complete")


STREAM_TUMBLING_SQL = """
SELECT DATE_TRUNC('hour', ts) AS win_start,
       DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR AS win_end,
       event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (native session_window state operator):
    10-minute inactivity gap per user; session_end = last event + gap."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    return _run_to_table(agg, "complete")


STREAM_SESSION_SQL = """
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
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 10 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM numbered GROUP BY user_id, session_no
"""


def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sliding windows (1h size / 30min slide)."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("win_start"), "n_events")
    )
    return _run_to_table(agg, "complete")


STREAM_SLIDING_SQL = """
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


def stream_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-dedup of a document stream: corpus ingestion as a
    stream, ``dropDuplicates`` keyed on (lang, md5 fingerprint) holding the
    seen-set in the state store, then per-language unique-doc counts —
    the training-pipeline dedup tier in streaming form.

    Keying on the PAIR makes the counts independent of which duplicate the
    state store happens to keep (cross-language duplicate texts exist in
    the fixture at sf0.1), so the streaming result equals the batch
    COUNT(DISTINCT fingerprint) per language exactly.  The fingerprint is
    16 bytes — at 100 TB the dedup state is keys-only, never documents,
    and a watermark (``dedup_stream_within_watermark``) bounds it for
    unbounded streams.
    """
    raw_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    deduped = stream.select(
        "lang", F.md5(F.col("text").cast("binary")).alias("fp")
    ).dropDuplicates(["lang", "fp"])
    agg = deduped.groupBy("lang").agg(F.count(F.lit(1)).alias("n_unique_docs"))
    return _run_to_table(agg, "complete")


STREAM_DEDUP_DOCS_SQL = """
SELECT lang, COUNT(DISTINCT md5(text)) AS n_unique_docs
FROM documents GROUP BY lang
"""


def stream_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming trending terms: tokenize the document stream, explode to
    (lang, term), per-key counts in streaming state, then top-5 terms per
    language from the drained sink — the streaming form of the corpus
    vocabulary pass.

    State is one counter per distinct (lang, term) — bounded by vocabulary
    size, not stream length.  For unbounded streams the same query runs
    windowed (watermark + tumbling window, as in stream_tumbling_hourly)
    so "trending" means per-window; global counts here keep the DuckDB
    oracle exact.  The top-k is computed batch-side on the drained counts
    (complete-mode agg + rank is not an incremental streaming shape)."""
    from realtime_change_data_capture_streaming_spark.llm_ops.text import tokens

    raw_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    terms = stream.select("lang", F.explode(tokens(F.col("text"))).alias("term"))
    counts = _run_to_table(
        terms.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("n")), "complete"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("term"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", "term", "n", F.col("rk").cast("bigint").alias("rk"))
    )


STREAM_TOPK_TERMS_SQL = """
WITH toks AS (
  SELECT lang,
         unnest(list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '')) AS term
  FROM documents
), c AS (
  SELECT lang, term, COUNT(*) AS n FROM toks GROUP BY lang, term
)
SELECT lang, term, n, rk FROM (
  SELECT lang, term, n,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, term ASC) AS BIGINT) AS rk
  FROM c
) WHERE rk <= 5
"""


def stream_enrich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joined to the customer
    dimension (a BATCH DataFrame — Spark re-plans the static side per
    micro-batch, and a broadcast hash join keeps it shuffle-free on the
    stream side), then per-(segment, event_type) rollups in streaming
    state.  This is THE streaming-ETL staple: dimension lookups on a
    moving fact stream without a stream-stream join's state.

    At 100 TB/day the dimension is broadcast (or a rocksdb-backed state
    store map); the stream never shuffles for the join itself."""
    ev = events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment")
    )
    joined = ev.join(F.broadcast(dim), ev.user_id == dim.c_custkey, "left")
    agg = (
        joined.groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
    )
    return _run_to_table(agg, "complete")


STREAM_ENRICH_SQL = """
SELECT c.c_mktsegment, e.event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment, e.event_type
"""




def stream_dq_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming data-quality monitor: the dq_expectations rule shape run
    ON THE STREAM — per micro-batch the running violation counters update
    in one streaming aggregate (complete mode, counters-only state), the
    production "expectations on a live feed" pattern where per-row
    violation materialization is impossible at stream rates.

    Rules over events: user_id not null, value within [0, 500] (inclusive), known
    event_type, ts inside the feed's contract window.  Output: one row
    per rule with running violations/n_rows — equal, once drained, to the
    batch rule suite (the oracle)."""
    ev = events_stream(spark, sf_dir)
    known = ("view", "click", "purchase", "signup", "error")

    def viol(cond) -> F.Column:
        return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).cast("bigint")

    agg = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        viol(F.col("user_id").isNull()).alias("not_null_user"),
        viol(~F.col("value").between(F.lit(0.0), F.lit(500.0))).alias("value_in_range"),
        viol(~F.col("event_type").isin(*known)).alias("event_type_known"),
        viol(
            (F.col("ts") < F.lit("2024-01-01").cast("timestamp"))
            | (F.col("ts") >= F.lit("2024-02-01").cast("timestamp"))
        ).alias("ts_in_window"),
    )
    rules = agg.select(
        F.explode(
            F.array(
                *(
                    F.struct(
                        F.lit(r).alias("rule"),
                        F.col(r).alias("violations"),
                        F.col("n_rows").alias("n_rows"),
                    )
                    for r in (
                        "not_null_user",
                        "value_in_range",
                        "event_type_known",
                        "ts_in_window",
                    )
                )
            )
        ).alias("r")
    ).select("r.rule", "r.violations", "r.n_rows")
    return _run_to_table(rules, "complete")


STREAM_DQ_SQL = """
WITH base AS (
  SELECT COUNT(*) AS n_rows,
         CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS not_null_user,
         CAST(SUM(CASE WHEN value NOT BETWEEN 0.0 AND 500.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS value_in_range,
         CAST(SUM(CASE WHEN event_type NOT IN ('view','click','purchase','signup','error')
                       THEN 1 ELSE 0 END) AS BIGINT) AS event_type_known,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-01' OR ts >= TIMESTAMP '2024-02-01'
                       THEN 1 ELSE 0 END) AS BIGINT) AS ts_in_window
  FROM events
)
SELECT 'not_null_user' AS rule, not_null_user AS violations, n_rows FROM base
UNION ALL SELECT 'value_in_range', value_in_range, n_rows FROM base
UNION ALL SELECT 'event_type_known', event_type_known, n_rows FROM base
UNION ALL SELECT 'ts_in_window', ts_in_window, n_rows FROM base
"""


QUERIES = {
    "stream_tumbling_hourly": stream_tumbling_hourly,
    "stream_session_windows": stream_session_windows,
    "stream_sliding_counts": stream_sliding_counts,
    "stream_dedup_documents": stream_dedup_documents,
    "stream_topk_terms": stream_topk_terms,
    "stream_enrich_customers": stream_enrich_customers,
    "stream_dq_monitor": stream_dq_monitor,
}

ORACLE = {
    "stream_tumbling_hourly": STREAM_TUMBLING_SQL,
    "stream_session_windows": STREAM_SESSION_SQL,
    "stream_sliding_counts": STREAM_SLIDING_SQL,
    "stream_dedup_documents": STREAM_DEDUP_DOCS_SQL,
    "stream_topk_terms": STREAM_TOPK_TERMS_SQL,
    "stream_enrich_customers": STREAM_ENRICH_SQL,
    "stream_dq_monitor": STREAM_DQ_SQL,
}
