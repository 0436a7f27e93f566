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

import glob
import os
import tempfile

from realtime_change_data_capture_streaming_spark.session import drain, scratch_dir
from realtime_change_data_capture_streaming_spark.streaming._drive import drive_staged_stream

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.cdc import commit as table_commit
from realtime_change_data_capture_streaming_spark.cdc.apply_changes import BucketedParquetSink, apply_changes_stream
from realtime_change_data_capture_streaming_spark.cdc.decode import parse_envelope
from realtime_change_data_capture_streaming_spark.cdc.queries import (
    CDC_APPLY_SQL,
    CDC_EVOLUTION_SQL,
    evolution_result_columns,
    order_change_events,
    schema_evolution_events,
)


def stage_chaos_events(spark: SparkSession, sf_dir: str) -> tuple[str, int]:
    """Stage the (deterministic) chaos change events for ``sf_dir`` once
    per machine and reuse: the generator is seed-fixed, so regenerating
    per run only re-benchmarks fixture creation, not the engine.  Returns
    (dir, n_files).  Parquet staging — the envelope JSON lives in the
    value column; the container just needs to move strings fast."""
    from realtime_change_data_capture_streaming_spark.sources.tables import build_once, fixture_fingerprint

    key = fixture_fingerprint(sf_dir, "orders")
    # v2 layout: 96 files, so every maxFilesPerTrigger split (2-batch merge,
    # 3-batch incremental view) hands each micro-batch >= one file per core
    # — the per-batch envelope parse was capped at 6-way parallelism by the
    # generator's natural 17-file output
    root = os.path.join(tempfile.gettempdir(), f"spark_graft_staged_v2_{key}")

    def _build(tmp: str) -> None:
        order_change_events(spark, sf_dir, chaos=True).repartition(96).write.mode(
            "overwrite"
        ).parquet(tmp)

    root = build_once(root, _build)
    return root, max(1, len(glob.glob(f"{root}/part-*")))


def stage_ordered_batches(frames, staged: str) -> str:
    """Write each frame as ONE parquet file under ``staged`` and arrange
    mtimes so a ``maxFilesPerTrigger=1`` file stream consumes them as
    ordered micro-batches (the file source orders by mtime).  Returns
    the directory to stream from.  Shared by every cross-batch scenario
    (schema evolution, the transaction gate, the HLL monitor) so the
    fiddly single-part + mtime contract lives in one place."""
    import os
    import time

    for i, f in enumerate(frames):
        f.coalesce(1).write.mode("overwrite").parquet(f"{staged}/p{i}")
    os.makedirs(f"{staged}/in", exist_ok=True)
    now = time.time()
    for i in range(len(frames)):
        (part,) = [e for e in os.listdir(f"{staged}/p{i}") if e.startswith("part-")]
        dst = f"{staged}/in/{i}-{part}"
        os.rename(f"{staged}/p{i}/{part}", dst)
        os.utime(dst, (now + i, now + i))
    return f"{staged}/in"


def stream_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = scratch_dir(prefix="stream_cdc_")
    # maxFilesPerTrigger splits the staged files into two micro-batches so
    # the merge must compose across batches, not just within one.
    staged, n_files = stage_chaos_events(spark, sf_dir)
    stream = (
        spark.readStream.schema("key string, value string")
        .option("maxFilesPerTrigger", max(1, (n_files + 1) // 2))
        .parquet(staged)
    )
    parsed = parse_envelope(stream, decimal_mode="string")
    # creation-seed buckets stay small (state-partition sizing; compaction
    # grows a production table toward target_bucket_bytes) so the 2-batch
    # merge takes the small-table fast path instead of paying a discovery
    # job + 32-way tiny-file write per micro-batch
    sink = BucketedParquetSink(spark, f"{work}/sink", n_buckets=8)
    q = apply_changes_stream(parsed, sink, f"{work}/ckpt", trigger={"availableNow": True})
    drain(q)
    final = sink.read()
    # decimal→double at the output boundary, matching CDC_APPLY_SQL's cast
    return final.select(
        F.col("transaction_id"),
        F.col("user_id"),
        F.col("amount").cast("double").alias("amount"),
        F.col("currency"),
        F.col("merchant_name"),
        F.col("voucher_code"),
    )




def stream_cdc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution ACROSS micro-batches: batch 1 merges v1-schema
    inserts (every ``_extra`` map empty — a streaming schema is fixed,
    so the evolved values, not the column, are what arrives late);
    batch 2 delivers updates carrying the upstream ALTER-TABLE-ADD
    ``channel`` field plus deletes.  The evolved values must survive the
    CROSS-BATCH latest-wins merge through the sink's copy-on-write
    buckets — rows never touched after the evolution stay NULL, exactly
    like a widened table.  (True column-count widening of an existing
    sink is exercised batch-side in ``tests/test_schema_evolution.py``;
    a stream cannot change its own schema mid-query.)  File mtimes order
    the two phases; one file per trigger makes the phase boundary a real
    micro-batch boundary.  Oracle = the batch closed form
    (CDC_EVOLUTION_SQL): the batch split must be invisible."""
    work = scratch_dir(prefix="stream_cdc_evo_")
    phase1, phase2 = schema_evolution_events(spark, sf_dir)
    in_dir = stage_ordered_batches([phase1, phase2], f"{work}/staged")
    stream = (
        spark.readStream.schema("key string, value string")
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(in_dir)
    )
    parsed = parse_envelope(stream, decimal_mode="string", capture_extras=True)
    sink = BucketedParquetSink(spark, f"{work}/sink", n_buckets=32)
    q = apply_changes_stream(parsed, sink, f"{work}/ckpt", trigger={"availableNow": True})
    drain(q)
    return evolution_result_columns(sink.read())


def stream_toast_column_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TOAST repair in its PRODUCTION form — across micro-batches,
    where the only source for the missing value is the SINK's stored
    state (the insert arrived in an earlier batch; the event set in hand
    has no non-placeholder image).  Per batch, before the merge: the
    incoming keys' touched buckets are read from the sink (path-pruned,
    batch-sized — the merge's own I/O shape), placeholder columns fill
    from the stored row, and the repaired batch merges normally; a
    ``was_toasted`` flag is persisted with the row since the stored
    image is already repaired.

    A real Debezium feed routinely delivers a key's insert and its
    sentinel-bearing update in the SAME micro-batch, where the sink has
    no stored image yet — so before consulting the sink, each batch does
    a BATCH-LOCAL repair (the batch form's max_by(voucher, lsn) over
    non-sentinel images), and only still-unfilled sentinels fall back to
    sink state.  The staging exercises both paths: half the updates ride
    in the insert batch (batch-local path), the rest arrive a batch
    later (sink-state path).  Oracle: the batch closed form — the batch
    split must be invisible either way."""
    from realtime_change_data_capture_streaming_spark.cdc.queries import (
        _TOAST_SENTINEL,
        toast_change_phases,
    )

    work = scratch_dir(prefix="stream_toast_")
    ins, upd_del = toast_change_phases(spark, sf_dir)
    is_upd = F.get_json_object("value", "$.op") == "u"
    same_batch = is_upd & (F.col("key").cast("long") % 20 == 0)
    phase1 = ins.unionByName(upd_del.filter(same_batch))
    phase2 = upd_del.filter(~same_batch)
    in_dir = stage_ordered_batches([phase1, phase2.repartition(1)], f"{work}/staged")
    sink = BucketedParquetSink(spark, f"{work}/sink", n_buckets=32)

    def repair_and_merge(batch: DataFrame, _bid: int) -> None:
        # materialize the flag BEFORE the repair: an expression over
        # after.voucher_code would re-evaluate against the repaired
        # column and always read False
        batch = batch.withColumn(
            "_toasted", F.col("after.voucher_code") == F.lit(_TOAST_SENTINEL)
        )
        toasted = F.col("_toasted")
        # batch-local repair FIRST: if this batch itself carries a
        # non-sentinel image for the key (insert + toasted update in one
        # batch — normal in a real feed), fill from it; otherwise a
        # latest-wins merge would store the sentinel permanently and
        # later batches would "fill" from the stored sentinel.
        local_fills = (
            batch.filter(~toasted & (F.col("op") != "d"))
            .groupBy("key")
            .agg(F.max_by(F.col("after.voucher_code"), F.col("lsn")).alias("_lfill"))
        )
        batch = (
            batch.join(local_fills, "key", "left")
            .withColumn(
                "after",
                F.when(
                    toasted & F.col("_lfill").isNotNull(),
                    F.col("after").withField("voucher_code", F.col("_lfill")),
                ).otherwise(F.col("after")),
            )
            .drop("_lfill")
        )
        # re-materialize AFTER the local repair (a lazy expr would read
        # the repaired value); only still-sentinel rows hit the sink
        batch = batch.withColumn(
            "_unfilled", F.col("after.voucher_code") == F.lit(_TOAST_SENTINEL)
        )
        repaired = batch
        if sink.data_dir() is not None:
            touched = sorted(
                r["b"] for r in batch.select(sink._bucket().alias("b")).distinct().collect()
            )  # metadata-scale: the merge's own touched-bucket discovery
            fills = (
                sink.read_raw(buckets=touched)
                .filter(F.col("op") != "d")
                .select("key", F.col("voucher_code").alias("_fill"))
            )
            repaired = (
                batch.join(fills, "key", "left")
                .withColumn(
                    "after",
                    F.when(
                        F.col("_unfilled") & F.col("_fill").isNotNull(),
                        F.col("after").withField("voucher_code", F.col("_fill")),
                    ).otherwise(F.col("after")),
                )
                .drop("_fill")
            )
        repaired = repaired.withColumn(
            "after", F.col("after").withField("was_toasted", toasted)
        ).drop("_toasted", "_unfilled")
        sink.merge(repaired)

    drive_staged_stream(
        spark,
        in_dir,
        "key string, value string",
        repair_and_merge,
        f"{work}/ckpt",
        transform=lambda s: parse_envelope(s, decimal_mode="string"),
    )
    return sink.read().select(
        "transaction_id",
        F.col("amount").cast("double").alias("amount"),
        "voucher_code",
        "was_toasted",
    )


def stream_cdc_incremental_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DBLog incremental snapshot under the REAL streaming engine,
    with chunks and concurrent changes in SEPARATE micro-batches — the
    production arrival order Debezium actually produces: batch 1 carries
    the pre-existing inserts plus the even-numbered chunk reads, batch 2
    the concurrent updates/deletes plus the odd chunks.  The chunk/
    stream overlap must therefore dedupe ACROSS the sink's copy-on-write
    buckets, not within one event set: a chunk image arriving a batch
    AFTER the change it absorbed (and vice versa) lands on the same
    final state.  Oracle: the batch closed form (``CDC_ISNAP_SQL``) —
    the batch boundary must be invisible."""
    from realtime_change_data_capture_streaming_spark.cdc.queries import (
        _ISNAP_CHUNK,
        incremental_snapshot_events,
    )

    work = scratch_dir(prefix="stream_isnap_")
    reads, stream_ev = incremental_snapshot_events(spark, sf_dir)
    even_chunk = F.pmod(F.floor(F.col("key").cast("long") / _ISNAP_CHUNK), F.lit(2)) == 0
    is_insert = F.get_json_object("value", "$.op") == "c"
    phase1 = stream_ev.filter(is_insert).unionByName(reads.filter(even_chunk))
    phase2 = stream_ev.filter(~is_insert).unionByName(reads.filter(~even_chunk))
    in_dir = stage_ordered_batches([phase1, phase2.repartition(1)], f"{work}/staged")
    stream = (
        spark.readStream.schema("key string, value string")
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(in_dir)
    )
    parsed = parse_envelope(stream, decimal_mode="string")
    sink = BucketedParquetSink(spark, f"{work}/sink", n_buckets=8)
    q = apply_changes_stream(parsed, sink, f"{work}/ckpt", trigger={"availableNow": True})
    drain(q)
    return sink.read_raw().filter(F.col("op") != "d").select(
        "transaction_id",
        F.col("amount").cast("double").alias("amount"),
        F.col("op").alias("last_op"),
    )


QUERIES = {
    "stream_cdc_merge": stream_cdc_merge,
    "stream_cdc_schema_evolution": stream_cdc_schema_evolution,
    "stream_toast_column_fill": stream_toast_column_fill,
    "stream_cdc_incremental_snapshot": stream_cdc_incremental_snapshot,
}


def _toast_sql() -> str:
    from realtime_change_data_capture_streaming_spark.cdc.queries import CDC_TOAST_SQL

    return CDC_TOAST_SQL


def _isnap_sql() -> str:
    from realtime_change_data_capture_streaming_spark.cdc.queries import CDC_ISNAP_SQL

    return CDC_ISNAP_SQL


ORACLE = {
    "stream_cdc_merge": CDC_APPLY_SQL,
    "stream_cdc_schema_evolution": CDC_EVOLUTION_SQL,
    "stream_toast_column_fill": _toast_sql(),
    "stream_cdc_incremental_snapshot": _isnap_sql(),
}


_TXN_TB = 16  # pending-store partition count (txn-hash buckets)


def stream_txn_consistent_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactionally consistent apply under the REAL streaming engine —
    the stateful form of ``cdc.queries.cdc_txn_consistent_apply``: a
    transaction's events may be spread across micro-batches, and NONE of
    them may reach the table until the END-record count is met.

    Staging forces genuine cross-batch completion: batch 1 delivers only
    the inserts, batch 2 the updates + deletes, so every multi-event
    transaction is incomplete after batch 1 and the gate must hold its
    inserts back, then release them when (and only when) the remainder
    arrives.

    State layout per micro-batch (foreachBatch):
      1. append the batch's parsed events to a PENDING store partitioned
         by a txn-hash bucket (the buffered not-yet-committed events — at
         scale this store is bounded by open-transaction volume after
         compaction of released txns, and reads of it below are
         partition-pruned);
      2. re-count distinct (key, lsn) per txn over ONLY the buckets this
         batch touched (bounded metadata collect of <= _TXN_TB bucket
         ids) against the static END metadata;
      3. semi-join the pending events of newly/still-complete txns and
         MERGE them into the sink — latest-wins merge is idempotent, so
         a transaction released in batch 1 and redelivered in batch 2
         re-merges harmlessly.

    Oracle: the same closed-form CDC_TXN_APPLY_SQL as the batch variant —
    the batch split must be invisible in the final state."""
    from realtime_change_data_capture_streaming_spark.cdc.queries import txn_change_events

    work = scratch_dir(prefix="stream_txn_")
    events, meta = txn_change_events(spark, sf_dir)
    op = F.get_json_object(F.col("value"), "$.op")
    final, _paths = _run_txn_stream(
        spark, [events.filter(op == "c"), events.filter(op != "c")], meta, work
    )
    return final


def _run_txn_stream(
    spark: SparkSession,
    frames,
    meta: DataFrame,
    work: str,
    compact: bool = False,
) -> tuple[DataFrame, dict]:
    """The transaction-completeness gate over staged micro-batches;
    returns (final table DataFrame, state paths).

    Default: the pending store is a grow-only flat parquet dir (the
    registered query's driver-checked form — its output is a pure
    function of the feed).  With ``compact=True`` the store is BOUNDED
    the way the docstring above promises: a bucket-mapped versioned
    store (the ANN codes-store shape) where each batch REWRITES only its
    touched txn-hash buckets, dropping released transactions' rows —
    latest-wins re-merge makes re-release redundant, so dropping them
    cannot change the sink — and carries the applied-batch-id in the
    manifest, so a restarted driver skips fully-applied replays.  At
    100 TB the compacted store holds only OPEN transactions (the
    in-flight window), not every event ever gated."""
    from realtime_change_data_capture_streaming_spark.cdc.queries import gate_complete_transactions
    from realtime_change_data_capture_streaming_spark.streaming._store import read_partitioned_store
    from realtime_change_data_capture_streaming_spark.streaming.sketches import _already_applied

    in_dir = stage_ordered_batches(frames, f"{work}/staged")
    meta_pq = f"{work}/meta"
    meta.write.mode("overwrite").parquet(meta_pq)

    pending = f"{work}/pending"
    sink = BucketedParquetSink(spark, f"{work}/sink", n_buckets=32)

    def gate(batch: DataFrame, bid: int) -> None:
        sp = batch.sparkSession
        if compact and _already_applied(pending, bid):
            return  # fully-applied batch replayed after a crash
        # one evaluation of the envelope parse per batch: the append AND
        # the touched-shard discovery both read the checkpointed blocks
        # (the _run_fk_stream/_run_outbox_stream discipline, r10)
        b = batch.withColumn(
            "tb", F.pmod(F.xxhash64("txn_id"), F.lit(_TXN_TB))
        ).localCheckpoint(eager=True)
        touched = [r["tb"] for r in b.select("tb").distinct().collect()]
        if not touched:
            return
        if compact:
            pend = read_partitioned_store(sp, pending, "tb", b.schema, ids=touched).unionByName(b)
        else:
            b.write.mode("append").partitionBy("tb").parquet(pending)
            pend = sp.read.parquet(pending).filter(F.col("tb").isin(touched))
        # ONE definition of all-or-nothing completeness for batch AND
        # stream (VERDICT r12 task 6): the streaming tier differs only in
        # WHAT it gates (the touched-bucket pending slice), never in HOW.
        # materialize once: isEmpty + merge would otherwise each re-run
        # the pending read, the distinct count, and both joins
        gated = gate_complete_transactions(pend, sp.read.parquet(meta_pq))
        released = gated.drop("tb", "txn_id", "txn_order").localCheckpoint(eager=True)
        if not released.isEmpty():
            sink.merge(released)
        if compact:
            _txn_pend_rewrite(
                pending,
                pend.join(gated.select("txn_id").distinct(), "txn_id", "left_anti"),
                touched,
                bid,
            )

    drive_staged_stream(
        spark,
        in_dir,
        "key string, value string",
        gate,
        f"{work}/ckpt",
        transform=lambda s: parse_envelope(s, decimal_mode="string", capture_txn=True),
    )
    final = sink.read().select(
        F.col("transaction_id"),
        F.col("user_id"),
        F.col("amount").cast("double").alias("amount"),
        F.col("currency"),
        F.col("merchant_name"),
        F.col("voucher_code"),
    )
    return final, {"pending": pending}


def _txn_pend_rewrite(store: str, keep: DataFrame, touched: list, bid: int) -> None:
    """Publish the touched buckets' OPEN-transaction rows as a new
    version superseding only those buckets (the ANN codes-store rewrite
    shape): released rows leave the store AFTER the merge folded them —
    a crash in between only re-releases, never loses — and a bucket
    whose every transaction completed drops out of the map entirely."""
    rows = keep.localCheckpoint(eager=True)
    m = table_commit.read_manifest(store)
    buckets = dict(m.get("buckets", {})) if m else {}
    vdir, seq = table_commit.begin(store)
    rows.write.mode("overwrite").partitionBy("tb").parquet(vdir)
    vname = os.path.basename(vdir)
    written = {
        int(e.split("=", 1)[1])
        for e in os.listdir(vdir)
        if e.startswith("tb=")
    }
    for t in touched:
        if int(t) in written:
            buckets[str(t)] = vname
        else:
            buckets.pop(str(t), None)  # bucket fully drained
    table_commit.commit(
        store, seq, meta={"applied_bid": bid, "buckets": buckets}, staged=vdir
    )


from realtime_change_data_capture_streaming_spark.cdc.queries import CDC_TXN_APPLY_SQL  # noqa: E402

QUERIES["stream_txn_consistent_apply"] = stream_txn_consistent_apply
ORACLE["stream_txn_consistent_apply"] = CDC_TXN_APPLY_SQL


class _PendingStore:
    """Manifest-backed pending store for the gated streams: the live
    version dir receives per-batch APPENDS (the materialized-view
    delta-log pattern) and each compaction cycle publishes a rewritten
    keep-set as a new version via ``table_commit``, carrying the LSN
    watermark and the last applied batch id IN the manifest.

    That makes the stream restart-safe (VERDICT r12 task 3): a fresh
    driver resuming from the streaming checkpoint rehydrates the
    version pointer, the watermark, and the applied-bid frontier from
    the store itself — the previous driver-closure counters
    (``state = {"ver": 0, "max_lsn": None}``) silently reset on restart,
    pointing the gate at a compacted-away ``pending_v0`` and rolling the
    eviction cut backwards."""

    def __init__(self, root: str):
        self.root = root

    def _manifest(self) -> dict:
        m = table_commit.read_manifest(self.root)
        if m is None:
            staged, seq = table_commit.begin(self.root)
            table_commit.commit(
                self.root, seq, meta={"max_lsn": None, "applied_bid": -1}, staged=staged
            )
            m = table_commit.read_manifest(self.root)
        return m

    def live_dir(self) -> str:
        return os.path.join(self.root, self._manifest()["version"])

    def max_lsn(self):
        return self._manifest().get("max_lsn")

    def applied_bid(self) -> int:
        return self._manifest().get("applied_bid", -1)

    def rotate(self, keep: DataFrame, max_lsn, bid: int, partition_by: str | None = None) -> None:
        """Publish the compacted keep-set as the new live version.  The
        superseded version stays through commit()'s grace window, then
        GCs — no immediate rmtree under a concurrent reader."""
        m = self._manifest()
        staged, seq = table_commit.begin(self.root)
        w = keep.write.mode("overwrite")
        if partition_by is not None:
            w = w.partitionBy(partition_by)
        w.parquet(staged)
        table_commit.commit(
            self.root,
            seq,
            meta={"max_lsn": max_lsn, "applied_bid": bid},
            expect_prev=m["seq"],
            staged=staged,
        )


def _run_fk_stream(
    spark: SparkSession,
    frames,
    work: str,
    retention_lsn_horizon: int | None = None,
    _crash_after_bid: int | None = None,
) -> tuple[DataFrame, dict]:
    """The FK-gated apply over staged micro-batches; returns (final
    child DataFrame, state paths).  With ``retention_lsn_horizon`` the
    pending store is BOUNDED (VERDICT r9 task 6): each batch compacts
    away released rows (latest-wins makes re-release redundant, so
    dropping them cannot change the sink) and dead-letters orphans whose
    LSN has fallen a full horizon behind the maximum LSN seen — at
    100 TB the store holds only the in-flight horizon window instead of
    every gapped child forever.  Replay safety: a redelivered released
    row re-merges idempotently; a batch fully applied before a crash
    (manifest ``applied_bid``) skips wholesale on replay; a half-applied
    batch re-appends, and the compaction rewrite dedups the store on
    (key, lsn); a redelivered evicted row re-evicts once its horizon
    passes again, and the dead-letter output dedups by (key, lsn) at
    read time.

    ``_crash_after_bid`` is a TEST fault hook: raise after batch N is
    fully processed but before the checkpoint commits it, so a restarted
    run must replay that batch (tests/test_outbox.py restart tests)."""
    in_dir = stage_ordered_batches(frames, f"{work}/staged")
    return _fk_stream_once(
        spark,
        work,
        in_dir,
        retention_lsn_horizon=retention_lsn_horizon,
        _crash_after_bid=_crash_after_bid,
    )


def _fk_stream_once(
    spark: SparkSession,
    work: str,
    in_dir: str,
    retention_lsn_horizon: int | None = None,
    _crash_after_bid: int | None = None,
) -> tuple[DataFrame, dict]:
    """One driver lifetime of the FK stream: builds FRESH gate closures
    (no carried state — everything rehydrates from the checkpoint, the
    sinks, and the pending-store manifest) and drains availableNow.
    Calling it again with the same ``work`` IS the restart path."""
    dead = f"{work}/dead"
    pend = _PendingStore(f"{work}/pending")

    parent_sink = BucketedParquetSink(spark, f"{work}/parent", n_buckets=8)
    child_sink = BucketedParquetSink(spark, f"{work}/child", n_buckets=8)

    def gate(batch: DataFrame, bid: int) -> None:
        sp = batch.sparkSession
        if retention_lsn_horizon is not None and pend.applied_bid() >= bid:
            # a replayed batch whose compaction commit landed before the
            # crash: every effect (parent merge, release, rotate) is
            # already in the stores — skip wholesale
            return
        tbl = F.get_json_object(F.col("value"), "$.source.table")
        parents = parse_envelope(batch.filter(tbl == "orders"), decimal_mode="string")
        children = parse_envelope(batch.filter(tbl == "lineitem"), decimal_mode="string")
        if retention_lsn_horizon is not None:
            # one parse per feed per batch: the watermark max rides the
            # SAME materialization the merge/append consume, instead of
            # a second full re-parse of the raw JSON (r10 review)
            parents = parents.persist()
            children = children.persist()
        try:
            if not parents.isEmpty():
                parent_sink.merge(parents)
            children.withColumn(
                "fk", F.coalesce("after.user_id", "before.user_id")
            ).write.mode("append").parquet(pend.live_dir())
            max_lsn = None
            if retention_lsn_horizon is not None:
                max_lsn = pend.max_lsn()
                for side in (parents, children):
                    hi = side.agg(F.max("lsn")).collect()[0][0]
                    if hi is not None:
                        max_lsn = hi if max_lsn is None else max(max_lsn, hi)
            _fk_release(sp, max_lsn, bid)
        finally:
            if retention_lsn_horizon is not None:
                parents.unpersist()
                children.unpersist()
        if _crash_after_bid is not None and bid >= _crash_after_bid:
            raise RuntimeError(f"injected crash after batch {bid}")

    def _fk_release(sp: SparkSession, max_lsn, bid: int) -> None:
        if not parent_sink.exists():
            return  # no parent state yet: everything stays pending
        rows = sp.read.parquet(pend.live_dir())
        parent_keys = parent_sink.read().select(F.col("transaction_id").alias("fk"))
        released = (
            rows.join(parent_keys, "fk", "left_semi").drop("fk").localCheckpoint(eager=True)
        )
        if not released.isEmpty():
            child_sink.merge(released)
        if retention_lsn_horizon is None:
            return
        # compaction + horizon eviction: released rows leave the store
        # (the sink already folded them — AFTER the merge above, so a
        # crash in between only re-releases, never loses); orphans past
        # the LSN horizon go to the dead letter.  dropDuplicates bounds
        # the store under half-applied-batch replay (the re-append).
        keep = rows.join(parent_keys, "fk", "left_anti").dropDuplicates(["key", "lsn"])
        cut = (max_lsn or 0) - retention_lsn_horizon
        evict = keep.filter(F.col("lsn") <= F.lit(cut)).localCheckpoint(eager=True)
        keep = keep.filter(F.col("lsn") > F.lit(cut)).localCheckpoint(eager=True)
        if not evict.isEmpty():
            evict.write.mode("append").parquet(dead)
        pend.rotate(keep, max_lsn, bid)

    drive_staged_stream(spark, in_dir, "key string, value string", gate, f"{work}/ckpt")
    final = child_sink.read().select(
        F.col("transaction_id").alias("child_id"),
        F.col("user_id").alias("parent_id"),
        F.col("amount").cast("double").alias("amount"),
        F.col("currency").alias("return_flag"),
        F.col("merchant_name").alias("line_status"),
    )
    return final, {"pending": pend.live_dir(), "dead": dead}


def stream_multitable_fk_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential integrity ACROSS micro-batches — the streaming form of
    ``cdc.queries.cdc_multitable_fk_apply``: a child row must not reach
    the child table until its parent key exists in the parent's final
    state, even when the child's envelope arrives a batch BEFORE the
    parent's (the staging here forces exactly that: batch 1 is the whole
    child feed, batch 2 the whole parent feed).

    State layout per micro-batch (foreachBatch):
      1. route the batch by the envelope's ``source.table`` and merge
         parent events into the parent sink (unchanged latest-wins);
      2. append child events to a PENDING parquet store, FK
         materialized (``coalesce(after.user_id, before.user_id)``);
      3. release = pending LEFT-SEMI parent-final-keys on the FK, merged
         into the child sink — latest-wins makes re-release idempotent.
    Pending-store compaction + LSN-horizon eviction are exercised by the
    retention variant (``_run_fk_stream(..., retention_lsn_horizon=...)``,
    pinned in tests/test_outbox.py); this registered form keeps the
    grow-only store so its driver-checked output is a pure function of
    the feed.

    Oracle: the batch closed form (CDC_MULTITABLE_SQL) — the batch split
    must be invisible in the final child state."""
    from realtime_change_data_capture_streaming_spark.cdc.queries import multitable_change_events

    work = scratch_dir(prefix="stream_fk_")
    parent_ev, child_ev = multitable_change_events(spark, sf_dir)
    final, _ = _run_fk_stream(spark, [child_ev, parent_ev], work)
    return final


from realtime_change_data_capture_streaming_spark.cdc.queries import CDC_MULTITABLE_SQL  # noqa: E402

QUERIES["stream_multitable_fk_apply"] = stream_multitable_fk_apply
ORACLE["stream_multitable_fk_apply"] = CDC_MULTITABLE_SQL


def stream_outbox_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outbox publish ACROSS micro-batches — the streaming form of
    ``cdc.queries.cdc_outbox_publish``: an aggregate's later events
    arrive a batch BEFORE its OrderCreated (the staging forces exactly
    that: batch 1 is every seq>=2 event, batch 2 the seq-1 events), so
    the in-order gate must HOLD them in state and release once the
    prefix completes.

    State layout per micro-batch (foreachBatch):
      1. parse the batch's outbox envelopes and append to a PENDING
         parquet store;
      2. re-gate the full pending set (dedup by event id, contiguous
         prefix per aggregate) and publish only rows not already in the
         PUBLISH LOG (anti-join on event id) — the replay-safety
         discipline: an at-least-once redelivery of a whole batch
         changes neither the pending dedup nor the log append.
    At scale the pending store is pruned by rewriting published
    aggregates' hash buckets (the TOAST pending-store shape); the
    full-set re-gate here is the bounded-fixture form of that.

    Oracle: the batch closed form (CDC_OUTBOX_SQL) — the batch split
    must be invisible in the published stream."""
    from realtime_change_data_capture_streaming_spark.cdc.queries import outbox_change_events

    work = scratch_dir(prefix="stream_outbox_")
    ev = outbox_change_events(spark, sf_dir)
    seq = F.get_json_object("value", "$.after.seq").cast("int")
    out, _ = _run_outbox_stream(
        spark, [ev.filter(seq >= 2), ev.filter(seq == 1)], work
    )
    return out


def _run_outbox_stream(
    spark: SparkSession,
    frames,
    work: str,
    retention_lsn_horizon: int | None = None,
    _crash_after_bid: int | None = None,
) -> tuple[DataFrame, dict]:
    """The outbox publish gate over staged micro-batches; returns (the
    published stream, state paths).

    Default (``retention_lsn_horizon=None``): the pending store grows
    and every batch re-gates the full set (the registered query's
    driver-checked form).  With a horizon, the store is BOUNDED
    (VERDICT r9 task 6) via the production frontier shape: the publish
    log's per-aggregate MAX(event_seq) IS the published frontier
    (the log only ever receives contiguous prefixes), so the gate
    releases pending rows continuing each frontier, compacts published
    and released rows out of the store, and dead-letters gapped rows
    whose LSN has fallen a full horizon behind the maximum LSN seen.
    The version pointer, watermark, and applied-bid frontier ride in the
    pending store's manifest (``_PendingStore``) so a restarted driver
    rehydrates them (VERDICT r12 task 3).  Replay safety is unchanged:
    a fully-applied replayed batch skips on its manifest bid,
    redelivered published ids drop at the frontier filter, redelivered
    evicted rows re-evict, and the dead-letter output dedups by event id
    at read time.  If a gap FILLS after its successors were evicted, the
    successors publish from the dead letter, not from state — the
    documented eviction trade."""
    in_dir = stage_ordered_batches(frames, f"{work}/staged")
    return _outbox_stream_once(
        spark,
        work,
        in_dir,
        retention_lsn_horizon=retention_lsn_horizon,
        _crash_after_bid=_crash_after_bid,
    )


def _outbox_stream_once(
    spark: SparkSession,
    work: str,
    in_dir: str,
    retention_lsn_horizon: int | None = None,
    _crash_after_bid: int | None = None,
) -> tuple[DataFrame, dict]:
    """One driver lifetime of the outbox stream (fresh closures; all
    state rehydrates from checkpoint + publog + pending manifest).
    Re-invoking with the same ``work`` is the restart path."""
    from pyspark.sql import Window

    from realtime_change_data_capture_streaming_spark.cdc.queries import outbox_gate, outbox_rows

    publog = f"{work}/publog"
    dead = f"{work}/dead"
    pend_store = _PendingStore(f"{work}/pending")

    def gate(batch: DataFrame, bid: int) -> None:
        sp = batch.sparkSession
        if retention_lsn_horizon is not None and pend_store.applied_bid() >= bid:
            return  # fully-applied batch replayed after a crash
        rows = outbox_rows(batch)
        rows.write.mode("append").parquet(pend_store.live_dir())
        if retention_lsn_horizon is None:
            pub = outbox_gate(sp.read.parquet(pend_store.live_dir())).drop("rn")
            if os.path.exists(publog):
                seen = sp.read.parquet(publog).select("event_id")
                pub = pub.join(seen, "event_id", "left_anti")
            pub = pub.localCheckpoint(eager=True)
            if pub.isEmpty():
                return
            pub.write.mode("append").parquet(publog)
            return
        pend = sp.read.parquet(pend_store.live_dir())
        # watermark from the parquet just appended (column-pruned lsn
        # scan of the already-compacted store), not a second re-parse of
        # the raw envelope JSON (r10 review); floor it at the manifest's
        # rehydrated value so a restart never rolls the cut backwards
        max_lsn = pend_store.max_lsn()
        hi = pend.agg(F.max("lsn")).collect()[0][0]
        if hi is not None:
            max_lsn = hi if max_lsn is None else max(max_lsn, hi)
        # dedup at-least-once redelivery to first-seen LSN (outbox_gate's rule)
        cols = [c for c in pend.columns if c != "event_id"]
        cand = (
            pend.groupBy("event_id")
            .agg(F.min_by(F.struct(*cols), "lsn").alias("r"))
            .select("event_id", "r.*")
        )
        if os.path.exists(publog):
            fr = (
                sp.read.parquet(publog)
                .groupBy("aggregate_id")
                .agg(F.max("event_seq").alias("f"))
            )
            cand = cand.join(fr, "aggregate_id", "left").withColumn(
                "f", F.coalesce("f", F.lit(0))
            )
        else:
            cand = cand.withColumn("f", F.lit(0))
        cand = cand.filter(F.col("event_seq") > F.col("f")).localCheckpoint(eager=True)
        # contiguous continuation of each frontier: seq == f + row_number
        # (outbox_gate's prefix characterization, shifted by f)
        w = Window.partitionBy("aggregate_id").orderBy("event_seq")
        rel = (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("event_seq") == F.col("f") + F.col("rn"))
            .drop("rn")
        )
        pub = rel.drop("f")
        if os.path.exists(publog):
            pub = pub.join(
                sp.read.parquet(publog).select("event_id"), "event_id", "left_anti"
            )
        pub = pub.localCheckpoint(eager=True)
        if not pub.isEmpty():
            pub.write.mode("append").parquet(publog)
        remaining = cand.join(rel.select("event_id"), "event_id", "left_anti").drop("f")
        cut = (max_lsn or 0) - retention_lsn_horizon
        evict = remaining.filter(F.col("lsn") <= F.lit(cut)).localCheckpoint(eager=True)
        keep = remaining.filter(F.col("lsn") > F.lit(cut)).localCheckpoint(eager=True)
        if not evict.isEmpty():
            evict.write.mode("append").parquet(dead)
        pend_store.rotate(keep, max_lsn, bid)
        if _crash_after_bid is not None and bid >= _crash_after_bid:
            raise RuntimeError(f"injected crash after batch {bid}")

    drive_staged_stream(spark, in_dir, "key string, value string", gate, f"{work}/ckpt")
    out = spark.read.parquet(publog).select(
        "dest",
        F.col("aggregate_id").cast("bigint").alias("aggregate_id"),
        F.col("event_seq").cast("int").alias("event_seq"),
        "event_type",
        F.substring(F.md5("payload"), 1, 16).alias("payload_fp"),
    )
    return out, {"publog": publog, "pending": pend_store.live_dir(), "dead": dead}


from realtime_change_data_capture_streaming_spark.cdc.queries import CDC_OUTBOX_SQL  # noqa: E402

QUERIES["stream_outbox_publish"] = stream_outbox_publish
ORACLE["stream_outbox_publish"] = CDC_OUTBOX_SQL
