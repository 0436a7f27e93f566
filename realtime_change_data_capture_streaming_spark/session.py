"""SparkSession factory tuned for this engine.

Local tests run on ``local[N]``; the configuration below is chosen so the
same logical plans scale to a multi-executor cluster at ~100 TB:

- AQE on (runtime join-strategy switch, skew-join splitting, partition
  coalescing) so the plan adapts when real statistics arrive at scale.
- UTC session timezone: the reference round-trips timestamps through the
  local zone (``/root/reference/main.py:74``); we deliberately fix UTC for
  deterministic semantics (SURVEY.md section 1.4.2).
- Arrow enabled for every pandas-UDF boundary.
- shuffle partitions default small for local runs; at cluster scale AQE
  coalesces from a high initial number, so production configs should set
  ``spark.sql.shuffle.partitions`` ~ 2-3x total cores and let AQE trim.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

#: compression codecs, env-parameterised (guide §2.3/§6).  Local defaults
#: keep Spark's own defaults (lz4 shuffle / snappy parquet): the r17
#: alternated-worktree A/B measured zstd at geomean 0.967 vs lz4 on the
#: local bench (CPU-bound, shuffles of a few MB — compression CPU is
#: pure overhead here), a documented "no" per the measurement protocol.
#: At 100 TB, shuffles are network/disk-bound and zstd's ~1.3-1.5x ratio
#: win is the right trade: production sets SPARK_GRAFT_IO_CODEC=zstd and
#: SPARK_GRAFT_PARQUET_CODEC=zstd.
IO_CODEC = os.environ.get("SPARK_GRAFT_IO_CODEC")
PARQUET_CODEC = os.environ.get("SPARK_GRAFT_PARQUET_CODEC")

_SCRATCH_DIRS: list[str] = []


def _reap_scratch() -> None:
    for d in _SCRATCH_DIRS:
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_reap_scratch)


def scratch_dir(prefix: str) -> str:
    """A temp work dir (staged input, checkpoints, bucketed sinks) removed at
    interpreter exit.  atexit rather than a ``finally`` block because the
    DataFrames these queries return read the dir lazily — the driver collects
    them after the function returns, so an eager rmtree would break them."""
    d = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH_DIRS.append(d)
    return d


def drain(query, timeout_s: int = 600) -> None:
    """Block until an availableNow streaming query finishes; raise on
    timeout.  An explicit raise, NOT an assert: asserts are stripped
    under ``python -O``, which would silently skip the awaitTermination
    call itself and let callers read half-written sink state."""
    if not query.awaitTermination(timeout_s):
        raise TimeoutError(f"availableNow stream did not drain in {timeout_s}s")


def get_spark(
    app_name: str = "realtime-change-data-capture-streaming-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # allow registered Python DataSources (sources/pydatasource.py) to
        # receive pushed predicates and prune their input partitions
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # fixture tables are a handful of small files; smaller split size
        # keeps all cores busy locally.  At cluster scale the input is
        # thousands of files and AQE coalescing governs instead.
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "true")
        # events.parquet carries TIMESTAMP(NANOS) which Spark has no native
        # type for; read as long and convert in the loader (tables.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if IO_CODEC:
        builder = builder.config("spark.io.compression.codec", IO_CODEC)
    if PARQUET_CODEC:
        builder = builder.config("spark.sql.parquet.compression.codec", PARQUET_CODEC)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
