"""Incremental materialized aggregates over the CDC stream.

The reference stops at replicating table state (``transaction_consumer.py``
upserts rows, nothing downstream).  A CDC *analytics* engine wants the
next step: aggregate tables that stay current as changes flow, without
rescanning the fact table — classic incremental view maintenance.

Design (Spark-first):
- The keyed sink (BucketedParquetSink) remains the source of truth.
- Per micro-batch, the view delta is computed as ``group(new touched
  state) − group(old touched state)``: aggregate the touched buckets
  before and after the merge and subtract.  Cost per batch is
  O(touched buckets) + O(groups), never O(table).
- The delta-from-state-diff formulation makes maintenance *idempotent
  for free*: replaying a batch the sink has already absorbed yields
  old == new, an all-zero delta, and an unchanged view — the same
  effectively-once contract as the merge itself.  Contribution-based
  deltas (+after/−before per event) would double-count replays.
- The pre-merge snapshot is eagerly localCheckpoint-ed: the merge
  rewrites touched bucket files in place, so the old state must be
  materialized before, not lazily re-read after.  (With a Delta/Iceberg
  sink, time-travel reads replace the checkpoint.)

Scale notes (100 TB): the view table is O(groups) — rewriting it whole
each batch is cheap; the expensive inputs are bucket-pruned parquet reads
(``_bucket=<i>`` directory pruning).  Group-key skew is irrelevant: the
per-group aggregate is two longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.cdc import commit as table_commit
from realtime_change_data_capture_streaming_spark.cdc.apply_changes import BucketedParquetSink

_VIEW_SCHEMA = "merchant_name string, n_txn bigint, sum_cents bigint"


class IncrementalAggView:
    """Maintains ``group_col -> (n_txn, sum_cents)`` over a sink's live rows."""

    def __init__(
        self,
        spark: SparkSession,
        sink: BucketedParquetSink,
        path: str,
        group_col: str = "merchant_name",
        amount_col: str = "amount",
    ):
        self.spark = spark
        self.sink = sink
        self.path = path
        self.group_col = group_col
        self.amount_col = amount_col

    def _grouped(self, state: DataFrame) -> DataFrame:
        """Live-row contributions per group; cents as exact bigints so
        increments commute and replay-cancel exactly."""
        return (
            state.filter(F.col("op") != "d")
            .groupBy(self.group_col)
            .agg(
                F.count(F.lit(1)).alias("n_txn"),
                F.sum((F.col(self.amount_col) * 100).cast("bigint")).alias("sum_cents"),
            )
        )

    def read(self) -> DataFrame:
        vdir = table_commit.resolve(self.path)
        if vdir is not None:
            return self.spark.read.schema(_VIEW_SCHEMA).parquet(vdir)
        return self.spark.createDataFrame([], _VIEW_SCHEMA)

    def process_batch(self, batch_df: DataFrame, order_cols: tuple[str, ...] = ("lsn", "ts_ms")) -> None:
        """Merge the batch into the sink and fold the state diff into the view."""
        sink = self.sink
        batch_df = batch_df.persist()
        new_state = None
        try:
            touched = [
                r["_b"]
                for r in batch_df.select(sink._bucket().alias("_b")).distinct().collect()
            ]
            if sink.exists():
                old_state = sink.read_raw().filter(F.col("_bucket").isin(touched))
            else:
                old_state = None
            # materialize BEFORE the merge rewrites these bucket files
            old_grouped = (
                self._grouped(old_state).localCheckpoint(eager=True)
                if old_state is not None
                else None
            )
            new_state = sink.merge(batch_df, order_cols, touched=touched, return_state=True)
            new_grouped = self._grouped(new_state)
            g = self.group_col
            if old_grouped is not None:
                delta = (
                    new_grouped.withColumnRenamed("n_txn", "n_new")
                    .withColumnRenamed("sum_cents", "c_new")
                    .join(
                        old_grouped.withColumnRenamed("n_txn", "n_old").withColumnRenamed(
                            "sum_cents", "c_old"
                        ),
                        g,
                        "full_outer",
                    )
                    .select(
                        F.col(g),
                        (F.coalesce("n_new", F.lit(0)) - F.coalesce("n_old", F.lit(0))).alias(
                            "d_n"
                        ),
                        (F.coalesce("c_new", F.lit(0)) - F.coalesce("c_old", F.lit(0))).alias(
                            "d_c"
                        ),
                    )
                )
            else:
                delta = new_grouped.select(
                    F.col(g), F.col("n_txn").alias("d_n"), F.col("sum_cents").alias("d_c")
                )
            updated = (
                self.read()
                .join(delta, g, "full_outer")
                .select(
                    F.col(g).alias("merchant_name") if g != "merchant_name" else F.col(g),
                    (F.coalesce("n_txn", F.lit(0)) + F.coalesce("d_n", F.lit(0)))
                    .cast("bigint")
                    .alias("n_txn"),
                    (F.coalesce("sum_cents", F.lit(0)) + F.coalesce("d_c", F.lit(0)))
                    .cast("bigint")
                    .alias("sum_cents"),
                )
                .filter(F.col("n_txn") > 0)
            )
            # versioned commit: the new view generation reads the OLD live
            # version and is published with one atomic pointer flip, so a
            # concurrent reader never sees a missing/half-written view
            vdir, seq = table_commit.begin(self.path)
            updated.coalesce(1).write.mode("overwrite").parquet(vdir)
            table_commit.commit(self.path, seq)
        finally:
            batch_df.unpersist()
            if new_state is not None:
                new_state.unpersist()


def apply_changes_with_view(
    parsed: DataFrame,
    view: IncrementalAggView,
    checkpoint_dir: str,
    trigger: dict | None = None,
    order_cols: tuple[str, ...] = ("lsn", "ts_ms"),
):
    """Streaming wiring: every micro-batch updates sink AND view in one
    foreachBatch transaction scope (same checkpoint, same replay story)."""

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            view.process_batch(batch_df, order_cols)

    writer = (
        parsed.writeStream.foreachBatch(_step)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def stream_cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chaos change events -> multi-micro-batch stream -> merged sink +
    incrementally maintained per-merchant revenue view.  The oracle is the
    closed-form batch GROUP BY over final state — the incremental path
    must land on exactly what a full recompute would."""
    import tempfile

    from realtime_change_data_capture_streaming_spark.cdc.decode import parse_envelope
    from realtime_change_data_capture_streaming_spark.streaming.cdc_stream import stage_chaos_events

    work = tempfile.mkdtemp(prefix="stream_cdc_ivm_")
    staged, n_files = stage_chaos_events(spark, sf_dir)
    stream = (
        spark.readStream.schema("key string, value string")
        .option("maxFilesPerTrigger", max(1, (n_files + 2) // 3))
        .parquet(staged)
    )
    parsed = parse_envelope(stream, decimal_mode="string")
    sink = BucketedParquetSink(spark, f"{work}/sink", n_buckets=8)
    view = IncrementalAggView(spark, sink, f"{work}/agg_view")
    q = apply_changes_with_view(parsed, view, f"{work}/ckpt", trigger={"availableNow": True})
    q.awaitTermination(600)
    return view.read()


def _ivm_sql() -> str:
    # the view's oracle IS the batch GROUP BY over the apply-changes
    # closed form — wrap that query so the two can never drift apart
    from realtime_change_data_capture_streaming_spark.cdc.queries import CDC_APPLY_SQL

    return f"""
SELECT merchant_name, COUNT(*) AS n_txn,
       CAST(SUM(CAST(amount * 100 AS BIGINT)) AS BIGINT) AS sum_cents
FROM ({CDC_APPLY_SQL})
GROUP BY merchant_name
"""


CDC_IVM_SQL = _ivm_sql()

QUERIES = {"stream_cdc_incremental_agg": stream_cdc_incremental_agg}
ORACLE = {"stream_cdc_incremental_agg": CDC_IVM_SQL}
