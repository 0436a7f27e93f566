"""Custom Python Data Source (Spark 4 DataSource API).

The reference's transaction producer is a standalone Python loop that
fabricates rows and pushes them at Kafka
(``/root/reference/transaction_producer.py:20-51``).  Spark-first, the
same generator becomes a FIRST-CLASS SOURCE: ``spark.read.format(...)``
/ ``spark.readStream.format(...)`` against a registered Python
DataSource — partitioned batch reads for backfill, offset-tracked
micro-batches for streaming, with Catalyst planning on top of both.

Determinism discipline: rows derive from the row index by plain integer
arithmetic (no RNG, no clock), so an independent engine reproduces the
exact dataset from ``range(n)`` — the DuckDB oracle for the batch query
below does exactly that.

At scale: ``partitions()`` splits the id-space, so a backfill of 10^12
rows fans out across executors with no driver materialization; the
stream reader hands out the same range splits per micro-batch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

CURRENCIES = ("USD", "EUR", "GBP", "JPY")


def _row(i: int) -> tuple:
    """Row i of the synthetic transaction table — pure integer arithmetic,
    reproducible in any engine (see PYDS_SCAN_SQL)."""
    amount = ((i * 7919) % 1_000_000) / 100.0
    return (i, amount, CURRENCIES[i % 4], f"merchant_{i % 50:03d}")


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int


class SyntheticTxDataSource(DataSource):
    """``spark.read.format("synthetic_tx").option("rows", n)`` — batch —
    and ``spark.readStream.format("synthetic_tx")`` — micro-batched
    stream over the same id-space."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_tx"

    def schema(self) -> str:
        return "tx_id bigint, amount double, currency string, merchant string"

    def reader(self, schema):
        return _BatchReader(self.options)

    def streamReader(self, schema):
        # Default: the partition-planning reader (executor-side reads).
        # ``option("simpleReader", "true")`` opts into the driver-side
        # SimpleDataSourceStreamReader path — raising
        # PySparkNotImplementedError here is the documented fallback
        # trigger (pyspark/sql/datasource_internal.py:_streamReader).
        if str(self.options.get("simpleReader", "false")).lower() == "true":
            from pyspark.errors import PySparkNotImplementedError

            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={"feature": "streamReader"},
            )
        return _PartitionedStreamReader(self.options)

    def simpleStreamReader(self, schema):
        return _StreamReader(self.options)


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 10_000))
        self.n_parts = max(1, int(options.get("partitions", 8)))
        self.lo = 0  # id-range narrowed by pushed tx_id predicates
        self.hi = self.n_rows

    def pushFilters(self, filters):
        """Source-level pushdown: range predicates on ``tx_id`` narrow the
        generated id-space BEFORE partition planning, so a selective scan
        fans out over (and reads) only the matching range — the custom-
        source equivalent of parquet partition pruning.  Pushed filters
        are still returned for Spark to re-apply (cheap, and keeps the
        contract simple); everything else is evaluated by Spark."""
        for f in filters:
            if getattr(f, "attribute", None) != ("tx_id",):
                yield f
                continue
            if isinstance(f, EqualTo):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            else:
                yield f
                continue
            yield f  # re-checked by Spark post-scan (harmless, exact)

    def partitions(self):
        span = max(0, self.hi - self.lo)
        if span == 0:
            return [_RangePartition(0, 0)]
        n = min(self.n_parts, span)
        per = -(-span // n)  # ceil
        return [
            _RangePartition(lo, min(lo + per, self.hi))
            for lo in range(self.lo, self.hi, per)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i)


class _PartitionedStreamReader(DataSourceStreamReader):
    """Partition-planning stream reader: each micro-batch's id-range is
    split into ``partitions`` ``_RangePartition``s and ``read()`` runs ON
    EXECUTORS — no driver materialization, unlike the simple-reader path
    whose ``read()`` builds every batch on the driver.  This is the
    scale path: a 10^9-row/batch backfill stream fans out exactly like
    the batch reader.

    Offset bookkeeping (driver-side, metadata-scale): ``latestOffset``
    exposes one ``batchRows`` step past the last PLANNED batch; the
    engine re-plans the last write-ahead-logged batch on restart (the
    same engine contract ``_SimpleStreamReaderWrapper`` documents), which
    re-seeds ``_pos`` from the checkpoint, so offsets never regress and
    never re-derive from zero."""

    def __init__(self, options):
        self.n_rows = int(options.get("rows", 10_000))
        self.batch_rows = int(options.get("batchRows", 2_500))
        self.n_parts = max(1, int(options.get("partitions", 8)))
        self._pos: int | None = None  # end of the last planned batch

    def initialOffset(self) -> dict:
        return {"next": 0}

    def latestOffset(self) -> dict:
        if self._pos is None:
            self._pos = 0
        return {"next": min(self._pos + self.batch_rows, self.n_rows)}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["next"]), int(end["next"])
        # Seeds restart state: the engine replays the last logged batch's
        # plan before asking for a new latestOffset.
        if self._pos is None or hi > self._pos:
            self._pos = hi
        if hi <= lo:
            return []
        span = hi - lo
        n = min(self.n_parts, span)
        per = -(-span // n)
        return [_RangePartition(p, min(p + per, hi)) for p in range(lo, hi, per)]

    def read(self, partition: _RangePartition):
        # Executor-side: regenerate rows for this id-split only.
        for i in range(partition.start, partition.end):
            yield _row(i)

    def commit(self, end: dict) -> None:
        pass


class _StreamReader(SimpleDataSourceStreamReader):
    """Offset = highest row id emitted; each micro-batch advances by
    ``batchRows`` until ``rows`` is exhausted (then empty batches).
    Driver-side materialization — kept ONLY as the low-volume fallback
    behind ``option("simpleReader", "true")``; the default streaming path
    is ``_PartitionedStreamReader`` above."""

    def __init__(self, options):
        self.n_rows = int(options.get("rows", 10_000))
        self.batch_rows = int(options.get("batchRows", 2_500))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(lo + self.batch_rows, self.n_rows)
        return iter([_row(i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(int(start["next"]), int(end["next"]))])


class EnvelopeSinkDataSource(DataSource):
    """``df.write.format("tx_envelope_sink").option("path", d).save()`` —
    the WRITE half of the custom-source surface: rows leave Spark as
    JSON-lines envelope files, the shape the reference's producer pushes
    at Kafka (``/root/reference/transaction_producer.py:20-51``), but as a
    first-class Spark sink with a two-phase atomic commit.

    Commit protocol (the object-store-safe shape, same idea as
    ``cdc/commit.py``): each task writes ONE staged ``.tmp`` file and
    returns its name as the WriterCommitMessage; ``commit()`` on the
    driver renames every staged file to its final name and only then
    drops the ``_SUCCESS`` marker — a reader that requires the marker
    never observes a torn write, and ``abort()`` deletes the stage."""

    @classmethod
    def name(cls) -> str:
        return "tx_envelope_sink"

    def writer(self, schema, overwrite: bool):
        return _EnvelopeWriter(self.options, [f.name for f in schema.fields], overwrite)


@dataclass
class _FileCommit(WriterCommitMessage):
    staged: str
    final: str


class _EnvelopeWriter(DataSourceWriter):
    def __init__(self, options, field_names, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("tx_envelope_sink requires option('path', ...)")
        self.path = path
        self.fields = list(field_names)
        self.overwrite = overwrite

    def write(self, rows) -> _FileCommit:
        """Executor-side: one staged JSON-lines file per task.  Keys are
        emitted in schema order so files are byte-deterministic for a
        deterministic input partitioning."""
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        final = f"part-{pid:05d}.json"
        staged = os.path.join(self.path, f".{final}.{uuid.uuid4().hex}.tmp")
        with open(staged, "w") as f:
            for row in rows:
                rec = {name: row[i] for i, name in enumerate(self.fields)}
                f.write(json.dumps(rec, separators=(",", ":")) + "\n")
        return _FileCommit(staged=staged, final=final)

    def commit(self, messages) -> None:
        """Driver-side publish: rename staged -> final (os.replace, atomic
        per file), then the _SUCCESS marker.  On overwrite, stale finals
        from a previous commit are removed first."""
        import os

        if self.overwrite:
            for e in os.listdir(self.path):
                if e.startswith("part-") or e == "_SUCCESS":
                    os.remove(os.path.join(self.path, e))
        for m in messages:
            if m is not None:
                os.replace(m.staged, os.path.join(self.path, m.final))
        open(os.path.join(self.path, "_SUCCESS"), "w").close()

    def abort(self, messages) -> None:
        import os

        for m in messages or []:
            if m is not None:
                try:
                    os.remove(m.staged)
                except OSError:
                    pass


def register(spark) -> None:
    """Idempotent registration of the custom sources with this session.

    Carries the ``python.filterPushdown`` conf with it: _BatchReader
    implements ``pushFilters()`` and Spark 4 raises
    DATA_SOURCE_PUSHDOWN_DISABLED at planning when the conf is off, so
    registration on a default-conf session (the driver's) must set it."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticTxDataSource)
    spark.dataSource.register(EnvelopeSinkDataSource)


N_PYDS_ROWS = 20_000


def pyds_synthetic_scan(spark, sf_dir: str):
    """Batch scan through the Python DataSource -> per-currency rollup.
    ``sf_dir`` is unused (the source IS the data); kept for the uniform
    queries() signature."""
    from pyspark.sql import functions as F

    from realtime_change_data_capture_streaming_spark.operators._util import dsum

    register(spark)
    # _BatchReader implements pushFilters(); Spark 4 raises
    # DATA_SOURCE_PUSHDOWN_DISABLED (rather than skipping the method) when
    # the session has python filter pushdown off.  This is a runtime SQL
    # conf, so enable it on whatever session we were handed — harness
    # sessions are not built by our own session factory.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = (
        spark.read.format("synthetic_tx")
        .option("rows", str(N_PYDS_ROWS))
        .option("partitions", "8")
        .load()
    )
    return df.groupBy("currency").agg(
        F.count(F.lit(1)).alias("n_tx"),
        dsum("amount").alias("total_amount"),
        F.min("tx_id").alias("min_tx_id"),
        F.max("tx_id").alias("max_tx_id"),
        F.countDistinct("merchant").alias("n_merchants"),
    )


PYDS_SCAN_SQL = f"""
WITH t AS (
  SELECT i AS tx_id,
         CAST((i * 7919) % 1000000 AS DOUBLE) / 100.0 AS amount,
         ['USD','EUR','GBP','JPY'][(i % 4) + 1] AS currency,
         printf('merchant_%03d', i % 50) AS merchant
  FROM range({N_PYDS_ROWS}) r(i)
)
SELECT currency,
       COUNT(*) AS n_tx,
       CAST(SUM(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total_amount,
       MIN(tx_id) AS min_tx_id,
       MAX(tx_id) AS max_tx_id,
       COUNT(DISTINCT merchant) AS n_merchants
FROM t GROUP BY currency
"""


def pyds_envelope_write_roundtrip(spark, sf_dir: str):
    """Custom READER -> custom WRITER -> read-back: rows generated by the
    Python DataSource are written through the Python DataSourceWriter's
    two-phase commit and re-read as JSON, then rolled up — so the whole
    custom-source round trip (partition planning, executor-side write,
    driver-side atomic publish) sits inside one hash-checked query.
    ``sf_dir`` is unused (the source IS the data)."""
    from realtime_change_data_capture_streaming_spark.session import scratch_dir

    from pyspark.sql import functions as F

    from realtime_change_data_capture_streaming_spark.operators._util import dsum

    register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    out = scratch_dir(prefix="pyds_sink_")
    (
        spark.read.format("synthetic_tx")
        .option("rows", str(N_PYDS_ROWS))
        .option("partitions", "8")
        .load()
        .write.format("tx_envelope_sink")
        .mode("overwrite")
        .option("path", out)
        .save()
    )
    back = spark.read.schema(
        "tx_id bigint, amount double, currency string, merchant string"
    ).json(out)
    return back.groupBy("merchant").agg(
        F.count(F.lit(1)).alias("n_tx"),
        dsum("amount").alias("total_amount"),
        F.min("tx_id").alias("min_tx_id"),
        F.max("tx_id").alias("max_tx_id"),
    )


PYDS_WRITE_SQL = f"""
WITH t AS (
  SELECT i AS tx_id,
         CAST((i * 7919) % 1000000 AS DOUBLE) / 100.0 AS amount,
         printf('merchant_%03d', i % 50) AS merchant
  FROM range({N_PYDS_ROWS}) r(i)
)
SELECT merchant,
       COUNT(*) AS n_tx,
       CAST(SUM(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total_amount,
       MIN(tx_id) AS min_tx_id,
       MAX(tx_id) AS max_tx_id
FROM t GROUP BY merchant
"""


def pyds_stream_scan(spark, sf_dir: str):
    """REAL streaming run through the partition-planning
    ``_PartitionedStreamReader``: ``readStream`` drains the id-space in
    ``batchRows`` micro-batches (availableNow), each batch's range split
    across executor-side ``read()`` calls — the scale path of the custom
    streaming source, driver-checked end to end.  The rollup totals must
    equal the batch scan's closed-form oracle: every row exactly once
    across all micro-batches (offset bookkeeping proven by equality).
    ``sf_dir`` is unused (the source IS the data)."""
    import uuid

    from realtime_change_data_capture_streaming_spark.session import scratch_dir

    from pyspark.sql import functions as F

    from realtime_change_data_capture_streaming_spark.operators._util import dsum

    register(spark)
    stream = (
        spark.readStream.format("synthetic_tx")
        .option("rows", str(N_PYDS_ROWS))
        .option("batchRows", "5000")
        .option("partitions", "8")
        .load()
    )
    agg = stream.groupBy("currency").agg(
        F.count(F.lit(1)).alias("n_tx"),
        dsum("amount").alias("total_amount"),
        F.min("tx_id").alias("min_tx_id"),
        F.max("tx_id").alias("max_tx_id"),
    )
    # PythonMicroBatchStream does not implement Trigger.AvailableNow (Spark
    # falls back to ONE batch) — drain with processAllAvailable() instead:
    # it blocks until latestOffset stops advancing, i.e. the id-space is
    # exhausted across however many micro-batches that takes.
    name = f"pyds_stream_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", scratch_dir(prefix=f"ckpt_{name}_"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


PYDS_STREAM_SQL = f"""
WITH t AS (
  SELECT i AS tx_id,
         CAST((i * 7919) % 1000000 AS DOUBLE) / 100.0 AS amount,
         ['USD','EUR','GBP','JPY'][(i % 4) + 1] AS currency
  FROM range({N_PYDS_ROWS}) r(i)
)
SELECT currency,
       COUNT(*) AS n_tx,
       CAST(SUM(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total_amount,
       MIN(tx_id) AS min_tx_id,
       MAX(tx_id) AS max_tx_id
FROM t GROUP BY currency
"""


QUERIES = {
    "pyds_synthetic_scan": pyds_synthetic_scan,
    "pyds_envelope_write_roundtrip": pyds_envelope_write_roundtrip,
    "pyds_stream_scan": pyds_stream_scan,
}
ORACLE = {
    "pyds_synthetic_scan": PYDS_SCAN_SQL,
    "pyds_envelope_write_roundtrip": PYDS_WRITE_SQL,
    "pyds_stream_scan": PYDS_STREAM_SQL,
}
