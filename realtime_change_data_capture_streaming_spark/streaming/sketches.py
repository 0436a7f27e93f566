"""Streaming sketch maintenance: distinct-count monitoring with O(m)
state per group, demonstrated by merging portable-HLL registers across
real micro-batches.

The monitoring problem: "how many distinct users per event type so far"
over an unbounded stream.  Exact distinct state grows with cardinality;
the HLL register table is a FIXED m rows per group, and its merge is an
elementwise max — commutative, associative, idempotent — so replayed or
reordered micro-batches cannot corrupt it (the same effectively-once
shape as the keyed CDC merge, but for aggregate state).

The register store is a versioned-dir table (``cdc/commit.py``): each
micro-batch reads the live version and publishes the merged registers as
a NEW immutable version dir behind one atomic pointer flip.  That keeps
the merge fully distributed — no driver round-trip of the state — so the
state volume may grow with GROUP cardinality (a 10k-group key is
exercised in tests/test_sketches.py) without ever passing through the
driver; only the tiny manifest does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.cdc import commit as table_commit
from realtime_change_data_capture_streaming_spark.operators.stats import (
    _CM_SQL,
    _HLL_SQL,
    cm_counters,
    cm_finalize,
    hll_finalize,
    hll_registers,
)
from realtime_change_data_capture_streaming_spark.session import scratch_dir
from realtime_change_data_capture_streaming_spark.streaming._drive import drive_staged_stream
from realtime_change_data_capture_streaming_spark.sources.tables import load_table


def _already_applied(store: str, bid: int) -> bool:
    """Replay guard for foreachBatch sketch commits.

    foreachBatch is at-least-once: a crash between ``table_commit.commit``
    and the checkpoint advancing re-delivers the SAME batch id on restart.
    The max-merge (HLL) absorbs that, but sum-merge double-counts and the
    bottom-k sample would re-insert duplicate rows — so every store's
    manifest records the last applied batch id and re-delivered batches
    are skipped (idempotent commit keyed on the batch id, the same
    effectively-once recipe as the keyed CDC merge).  Batch ids are
    monotonically increasing within a checkpointed query, so ``<=`` is
    exactly "already applied"."""
    m = table_commit.read_manifest(store)
    return m is not None and bid <= m.get("applied_bid", -1)


def _merge_hll_registers(store: str, batch: DataFrame, bid: int) -> None:
    """One micro-batch of the HLL register max-merge (module-level so
    tests can replay a batch id against a real store)."""
    if _already_applied(store, bid):
        return
    sp = batch.sparkSession
    br = hll_registers(batch)
    live = table_commit.resolve(store)
    if live is not None:
        br = br.unionByName(sp.read.parquet(live))
    merged = br.groupBy("event_type", "j").agg(F.max("r").alias("r"))
    vdir, seq = table_commit.begin(store)
    merged.write.mode("overwrite").parquet(vdir)
    table_commit.commit(store, seq, meta={"applied_bid": bid}, staged=vdir)


def _merge_cm_counters(store: str, batch: DataFrame, bid: int) -> None:
    """One micro-batch of the count-min SUM-merge.  Sum is NOT
    idempotent: a batch re-delivered after a crash between commit and
    checkpoint advance would double-count, so the commit is keyed on the
    batch id via ``_already_applied``."""
    if _already_applied(store, bid):
        return
    sp = batch.sparkSession
    bc = cm_counters(batch)
    live = table_commit.resolve(store)
    if live is not None:
        bc = bc.unionByName(sp.read.parquet(live))
    merged = bc.groupBy("r", "c").agg(F.sum("cnt").cast("bigint").alias("cnt"))
    vdir, seq = table_commit.begin(store)
    merged.write.mode("overwrite").parquet(vdir)
    table_commit.commit(store, seq, meta={"applied_bid": bid}, staged=vdir)


def _merge_bkq_sample(store: str, batch: DataFrame, bid: int) -> None:
    """One micro-batch of the bottom-k MIN-merge.  Min-merge of SETS is
    idempotent, but re-inserting the same event ROW twice is not
    (row_number keeps both copies and corrupts the quantile ranks) — so
    re-delivered batch ids are skipped AND the union is deduped on its
    row identity before re-sampling."""
    from realtime_change_data_capture_streaming_spark.operators.stats import bkq_rows, bkq_sample

    if _already_applied(store, bid):
        return
    sp = batch.sparkSession
    bs = bkq_sample(bkq_rows(batch))
    live = table_commit.resolve(store)
    if live is not None:
        bs = bs.unionByName(sp.read.parquet(live))
    bs = bs.dropDuplicates(["event_type", "event_id"])
    merged = bkq_sample(bs)  # k smallest of the union: the min-merge
    vdir, seq = table_commit.begin(store)
    merged.write.mode("overwrite").parquet(vdir)
    table_commit.commit(store, seq, meta={"applied_bid": bid}, staged=vdir)


def stream_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type maintained ACROSS micro-batches by
    register merge: each batch computes its own HLL register table (one
    partial-agg max per (group, register)), which is max-merged into a
    persistent register store of exactly groups x m rows — the state
    volume is independent of how many users or events the stream has
    seen (it grows only with GROUP cardinality).  Each batch publishes
    the merged store as a new immutable version dir + atomic manifest
    flip (``cdc/commit.py``), so the merge is executor-side end to end —
    no driver collect, and the read side never races the overwrite.

    The input is staged as two files (two real micro-batches) split by
    user-id parity, so every group's final registers MUST combine state
    from both batches.  Oracle: the batch HLL over the whole table —
    register merge makes the batch split invisible, the mergeability
    property `tests/test_sketches.py` pins in isolation, here proven
    through the real engine."""
    from realtime_change_data_capture_streaming_spark.streaming.cdc_stream import stage_ordered_batches

    work = scratch_dir(prefix="stream_hll_")
    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    # pmod, not %: a signed remainder would drop negative ids from BOTH halves
    in_dir = stage_ordered_batches(
        [
            e.filter(F.pmod(F.col("user_id"), F.lit(2)) == 0),
            e.filter(F.pmod(F.col("user_id"), F.lit(2)) == 1),
        ],
        f"{work}/staged",
    )

    store = f"{work}/registers"
    merge_registers = lambda batch, bid: _merge_hll_registers(store, batch, bid)

    drive_staged_stream(
        spark, in_dir, "event_type string, user_id bigint", merge_registers, f"{work}/ckpt"
    )
    regs = spark.read.parquet(table_commit.resolve(store))
    exact = e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_exact"))
    return hll_finalize(regs, exact)


def stream_countmin_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event frequency maintained ACROSS micro-batches by
    counter merge — the additive dual of the HLL stream above: each
    batch computes its own d*w count-min counter table, SUM-merged into
    the persistent store through the same versioned-dir atomic-commit
    machinery (executor-side end to end, no driver collect).  Staged as
    two real micro-batches split by event parity, so every counter must
    combine both batches; oracle: the batch count-min over the whole
    table — sum-merge makes the batch split invisible."""
    from realtime_change_data_capture_streaming_spark.streaming.cdc_stream import stage_ordered_batches

    work = scratch_dir(prefix="stream_cm_")
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    in_dir = stage_ordered_batches(
        [
            e.filter(F.pmod(F.col("event_id"), F.lit(2)) == 0).select("user_id"),
            e.filter(F.pmod(F.col("event_id"), F.lit(2)) == 1).select("user_id"),
        ],
        f"{work}/staged",
    )

    store = f"{work}/counters"
    merge_counters = lambda batch, bid: _merge_cm_counters(store, batch, bid)

    drive_staged_stream(spark, in_dir, "user_id bigint", merge_counters, f"{work}/ckpt")
    counters = spark.read.parquet(table_commit.resolve(store))
    return cm_finalize(counters, e.select("user_id"))


def stream_bottomk_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantiles maintained ACROSS micro-batches by bottom-k
    MIN-merge — the third mergeable-sketch law proven through the real
    engine (HLL = max-merge, count-min = sum-merge, bottom-k =
    min-merge): each batch's per-group k smallest-hash rows union the
    stored sample and the k smallest of the union are re-kept, all
    executor-side through the versioned-dir store.  State is exactly
    groups x k rows regardless of stream volume.  Oracle: the batch
    bottom-k over the whole table — min-merge makes the batch split
    invisible."""
    from realtime_change_data_capture_streaming_spark.operators.stats import (
        bkq_finalize,
        bkq_rows,
        bkq_sample,
    )
    from realtime_change_data_capture_streaming_spark.streaming.cdc_stream import stage_ordered_batches

    work = scratch_dir(prefix="stream_bkq_")
    e = load_table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    in_dir = stage_ordered_batches(
        [
            e.filter(F.pmod(F.col("event_id"), F.lit(2)) == 0),
            e.filter(F.pmod(F.col("event_id"), F.lit(2)) == 1),
        ],
        f"{work}/staged",
    )

    store = f"{work}/sample"
    merge_sample = lambda batch, bid: _merge_bkq_sample(store, batch, bid)

    drive_staged_stream(
        spark,
        in_dir,
        "event_type string, event_id bigint, value double",
        merge_sample,
        f"{work}/ckpt",
    )
    sample = spark.read.parquet(table_commit.resolve(store))
    return bkq_finalize(sample, bkq_rows(e))


QUERIES = {
    "stream_hll_distinct_users": stream_hll_distinct_users,
    "stream_countmin_user_counts": stream_countmin_user_counts,
    "stream_bottomk_quantiles": stream_bottomk_quantiles,
}


def _bkq_oracle() -> str:
    from realtime_change_data_capture_streaming_spark.operators.stats import _BKQ_SQL

    return _BKQ_SQL


ORACLE = {
    "stream_hll_distinct_users": _HLL_SQL,
    "stream_countmin_user_counts": _CM_SQL,
    "stream_bottomk_quantiles": _bkq_oracle(),
}
