"""Python DataSource API (Spark 4): the synthetic-transaction producer as
a first-class batch + streaming source (parity for the scan is in
test_oracle_parity via pyds_synthetic_scan)."""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.sources.pydatasource import register


def test_batch_read_is_partitioned(spark):
    register(spark)
    df = (
        spark.read.format("synthetic_tx")
        .option("rows", "1000")
        .option("partitions", "8")
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 1000
    # deterministic content: row 0 and row 999 match the formula
    rows = {r["tx_id"]: r for r in df.filter(F.col("tx_id").isin(0, 999)).collect()}
    assert rows[0]["amount"] == 0.0 and rows[0]["currency"] == "USD"
    assert rows[999]["amount"] == ((999 * 7919) % 1_000_000) / 100.0
    assert rows[999]["merchant"] == f"merchant_{999 % 50:03d}"


def test_filter_pushdown_prunes_source_partitions(spark):
    """Range predicates on tx_id reach the source (pushFilters) and narrow
    the generated id-space before partition planning — a point lookup
    plans ONE partition instead of fanning out over the full range; and a
    non-pushable predicate (amount) still evaluates correctly Spark-side."""
    register(spark)
    base = (
        spark.read.format("synthetic_tx")
        .option("rows", "10000")
        .option("partitions", "8")
        .load()
    )
    point = base.filter(F.col("tx_id") == 7777)
    assert point.rdd.getNumPartitions() == 1
    assert [r["tx_id"] for r in point.collect()] == [7777]

    rng = base.filter((F.col("tx_id") >= 100) & (F.col("tx_id") < 150))
    lo, hi, n = rng.agg(F.min("tx_id"), F.max("tx_id"), F.count(F.lit(1))).collect()[0]
    assert (lo, hi, n) == (100, 149, 50)

    # non-pushable filter: evaluated by Spark post-scan, still exact
    rich = base.filter(F.col("amount") > 9999.0)
    want = sum(1 for i in range(10000) if ((i * 7919) % 1_000_000) / 100.0 > 9999.0)
    assert rich.count() == want

    # empty pushdown range: zero partitions' worth of work, zero rows
    assert base.filter(F.col("tx_id") < 0).count() == 0


def test_scan_survives_pushdown_disabled_session(spark):
    """Spark 4 raises DATA_SOURCE_PUSHDOWN_DISABLED when a reader
    implements pushFilters() under a session with python filter pushdown
    off.  Harness sessions are not ours — pyds_synthetic_scan must set
    the (runtime) conf itself."""
    from realtime_change_data_capture_streaming_spark.sources.pydatasource import (
        pyds_synthetic_scan,
    )

    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")
        out = pyds_synthetic_scan(spark, "")
        got = {r["currency"]: r["n_tx"] for r in out.collect()}
        assert got == {"USD": 5000, "EUR": 5000, "GBP": 5000, "JPY": 5000}
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.python.filterPushdown.enabled", prev)


def test_stream_read_plans_executor_partitions(spark):
    """The default stream reader is the partition-planning
    DataSourceStreamReader: each micro-batch fans out over ``partitions``
    range-splits read ON EXECUTORS (batch_df arrives with that many
    source partitions), not a single driver-materialized iterator like
    the SimpleDataSourceStreamReader path."""
    import threading

    register(spark)
    ckpt = tempfile.mkdtemp(prefix="pyds_parts_")
    seen: list[int] = []
    lock = threading.Lock()

    def capture(batch_df, _bid):
        with lock:
            seen.append(batch_df.rdd.getNumPartitions())

    stream = (
        spark.readStream.format("synthetic_tx")
        .option("rows", "4000")
        .option("batchRows", "2000")
        .option("partitions", "4")
        .load()
    )
    for _ in range(3):  # one batch per availableNow run (no AvailableNow support)
        q = (
            stream.writeStream.foreachBatch(capture)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        if len(seen) >= 2:
            break
    assert seen and all(n == 4 for n in seen), seen


def test_simple_reader_fallback_option(spark):
    """option("simpleReader", "true") falls back to the driver-side
    SimpleDataSourceStreamReader (its wrapper plans exactly ONE
    partition per micro-batch)."""
    import threading

    register(spark)
    ckpt = tempfile.mkdtemp(prefix="pyds_simple_")
    seen: list[int] = []
    lock = threading.Lock()

    def capture(batch_df, _bid):
        with lock:
            seen.append((batch_df.rdd.getNumPartitions(), batch_df.count()))

    stream = (
        spark.readStream.format("synthetic_tx")
        .option("rows", "2000")
        .option("batchRows", "2000")
        .option("simpleReader", "true")
        .load()
    )
    q = (
        stream.writeStream.foreachBatch(capture)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert seen == [(1, 2000)], seen


def test_stream_offsets_resume_across_restarts(spark):
    """The stream reader advances offsets in batchRows steps and the
    checkpoint carries them across query restarts: each availableNow run
    resumes exactly where the previous one stopped, the streaming state
    (complete-mode agg) accumulates, and the drained total equals the
    batch read — offset tracking + exactly-once for a CUSTOM Python
    source."""
    register(spark)
    ckpt = tempfile.mkdtemp(prefix="pyds_ckpt_")
    name = f"pyds_{uuid.uuid4().hex[:8]}"
    totals = []
    for _ in range(6):
        stream = (
            spark.readStream.format("synthetic_tx")
            .option("rows", "10000")
            .option("batchRows", "2500")
            .load()
        )
        agg = stream.groupBy("currency").agg(F.count(F.lit(1)).alias("n"))
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {r["currency"]: r["n"] for r in spark.table(name).collect()}
        totals.append(sum(got.values()))
        if totals[-1] >= 10_000:
            break
    assert totals[-1] == 10_000, totals
    assert len(totals) >= 4, f"2500-row steps should need >=4 runs, took {len(totals)}"
    assert totals == sorted(totals), "offsets must never move backwards"
    assert got == {"USD": 2500, "EUR": 2500, "GBP": 2500, "JPY": 2500}


def test_envelope_writer_atomic_publish(spark):
    """Two-phase commit: after save(), only final part files + _SUCCESS
    exist (no .tmp stage leftovers), and the JSON content round-trips."""
    import json
    import os

    register(spark)
    out = tempfile.mkdtemp(prefix="env_sink_")
    (
        spark.read.format("synthetic_tx")
        .option("rows", "100")
        .option("partitions", "4")
        .load()
        .write.format("tx_envelope_sink")
        .mode("overwrite")
        .option("path", out)
        .save()
    )
    entries = sorted(os.listdir(out))
    assert "_SUCCESS" in entries
    parts = [e for e in entries if e.startswith("part-")]
    assert len(parts) == 4 and not any(e.endswith(".tmp") for e in entries)
    recs = []
    for p in parts:
        with open(os.path.join(out, p)) as f:
            recs += [json.loads(line) for line in f]
    assert len(recs) == 100
    assert {r["tx_id"] for r in recs} == set(range(100))
    # overwrite replaces, never appends
    (
        spark.read.format("synthetic_tx")
        .option("rows", "40")
        .option("partitions", "2")
        .load()
        .write.format("tx_envelope_sink")
        .mode("overwrite")
        .option("path", out)
        .save()
    )
    parts = [e for e in os.listdir(out) if e.startswith("part-")]
    assert len(parts) == 2


def test_envelope_writer_abort_leaves_no_partial_result(spark):
    """A task failure mid-job aborts the write: no _SUCCESS marker and no
    final part files are published (staged .tmp files are cleaned up)."""
    import os

    import pytest
    from pyspark.errors import PySparkException

    register(spark)
    out = tempfile.mkdtemp(prefix="env_sink_abort_")

    @F.udf("long")
    def boom(i):
        if i == 77:
            raise ValueError("synthetic failure")
        return i

    df = (
        spark.read.format("synthetic_tx")
        .option("rows", "100")
        .option("partitions", "4")
        .load()
        .withColumn("tx_id", boom(F.col("tx_id")))
    )
    with pytest.raises(PySparkException):
        df.write.format("tx_envelope_sink").mode("overwrite").option("path", out).save()
    entries = os.listdir(out) if os.path.isdir(out) else []
    assert "_SUCCESS" not in entries
    assert not any(e.startswith("part-") for e in entries), entries
