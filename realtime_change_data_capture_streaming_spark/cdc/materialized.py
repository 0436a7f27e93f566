"""Incremental materialized aggregates over the CDC stream.

The reference stops at replicating table state (``transaction_consumer.py``
upserts rows, nothing downstream).  A CDC *analytics* engine wants the
next step: aggregate tables that stay current as changes flow, without
rescanning the fact table — classic incremental view maintenance.

Design (Spark-first):
- The keyed sink (BucketedParquetSink) remains the source of truth.
- Per micro-batch, the view delta is ONE signed-union aggregation run
  inside the merge's ``pre_write`` hook: -1 contributions from the
  touched buckets' pre-merge rows, +1 from the post-merge rows, summed
  per group.  Untouched keys contribute identical +/- rows that cancel
  in the map-side partial aggregate; only O(changed groups) rows are
  ever materialized.  No joins, no broadcasts, no full-state snapshot.
- The delta-from-state-diff formulation makes maintenance *idempotent
  for free*: replaying a batch the sink has already absorbed yields a
  delta that cancels to zero and an unchanged view — the same
  effectively-once contract as the merge itself.  Contribution-based
  deltas (+after/−before per event) would double-count replays.
- The hook runs before the write replaces the touched files, and the
  merge persists its output, so maintenance shares the merge's own
  bucket-pruned scan instead of repeating it.  (With a Delta/Iceberg
  sink, time-travel reads would replace the eager delta checkpoint.)

Scale notes (100 TB): the view table is O(groups) — rewriting it whole
each batch is cheap; the only table-sized input is the merge's own
bucket-pruned scan, shared with the merge.  Group-key skew is
irrelevant: the per-group aggregate is two longs.
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

    def read(self) -> DataFrame:
        vdir = table_commit.resolve(self.path)
        if vdir is not None:
            return self.spark.read.schema(_VIEW_SCHEMA).parquet(vdir)
        return self.spark.createDataFrame([], _VIEW_SCHEMA)

    def _signed(self, state: DataFrame, sign: int) -> DataFrame:
        """Per-row view contributions with a +/- sign: +1 for post-merge
        rows, -1 for the pre-merge rows they replace."""
        return state.filter(F.col("op") != "d").select(
            F.col(self.group_col),
            F.lit(sign).alias("d_n"),
            (F.lit(sign) * (F.col(self.amount_col) * 100).cast("bigint")).alias("d_c"),
        )

    def process_batch(self, batch_df: DataFrame, order_cols: tuple[str, ...] = ("lsn", "ts_ms")) -> None:
        """Merge the batch into the sink and fold the state diff into the view.

        The delta is ONE signed-union aggregation inside the merge's
        ``pre_write`` hook: -1 contributions from the touched buckets'
        pre-merge rows, +1 from the post-merge rows, summed per group.
        Untouched-key rows appear identically on both sides and cancel in
        the partial aggregate — no joins, no broadcast, and the only
        eager materialization is the delta itself, O(changed groups).
        A replayed batch yields old == new everywhere, an all-zero delta,
        and an unchanged view (the effectively-once contract)."""
        delta_box: list[DataFrame] = []
        g = self.group_col

        def _delta_hook(old_touched: DataFrame | None, merged: DataFrame) -> None:
            contribs = self._signed(merged, +1)
            if old_touched is not None:
                contribs = contribs.unionByName(self._signed(old_touched, -1))
            delta = (
                contribs.groupBy(g)
                .agg(F.sum("d_n").alias("d_n"), F.sum("d_c").alias("d_c"))
                .filter((F.col("d_n") != 0) | (F.col("d_c") != 0))
            )
            # must be real rows BEFORE the write rewrites old_touched's files
            delta_box.append(delta.localCheckpoint(eager=True))

        self.sink.merge(batch_df, order_cols, pre_write=_delta_hook)
        delta = delta_box[0]
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
    sink = BucketedParquetSink(spark, f"{work}/sink", n_buckets=32)
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
