"""Oracle-parity helpers.

The driver hash-compares our Spark results against DuckDB on the same
parquet.  Floating-point aggregation order differs between engines, so raw
``SUM(double)`` is not reproducible.  All measure columns in the fixtures
are exactly-2-decimal doubles (verified against sf0.01), so the lossless,
engine-independent strategy is:

    double --cast--> DECIMAL(18,2) --exact sum--> DECIMAL --cast--> double

Exact decimal arithmetic is associative/commutative, so partial aggregation
(map-side combine) stays enabled and the final double is bit-identical on
any engine and any partitioning — including a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

D2 = "decimal(18,2)"


def dec(col: str | Column, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dsum(col: str | Column, scale: int = 2) -> Column:
    """Exact decimal sum rendered as double (deterministic cross-engine)."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col: str | Column, scale: int = 2) -> Column:
    """Deterministic mean: exact decimal sum -> double, divided by count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale)).cast("double") / F.count(c)


def spread(df, *cols):
    """Repartition to the session's core count before CPU-heavy expressions.

    Locally the fixture tables are single small parquet files -> one input
    partition -> expression-heavy pipelines (shingling, hashing, vector
    math) run on one core.  Keyed columns keep related rows together when
    a downstream group-by can use them.

    The keyless form SKIPS the repartition when the scan already splits
    into >= core-count partitions (driver-side file-split estimate):
    Spark never elides an explicit ``repartition(n)``, so at 100 TB the
    unconditional form was a full-input round-robin shuffle — plus the
    mandatory sort-before-repartition (SPARK-23207) — purely to fix a
    small-file problem the input does not have there (guide §2.4: remove
    shuffles outright; r16).  The keyed form stays unconditional: its
    hash partitioning is reused by the keyed consumers that ask for it.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    if cols:
        return df.repartition(n, *cols)
    from realtime_change_data_capture_streaming_spark.plans.introspect import (
        estimated_scan_partitions_ex,
    )

    est, statable = estimated_scan_partitions_ex(df)
    # conservative branch for THIS consumer: an unstatable input keeps
    # the repartition (the pre-r16 behavior), it never skips on a guess
    if statable and est >= n:
        return df
    return df.repartition(n)


def fp_mean_sql(scale) -> str:
    """THE fixed-point k-means centroid-update mean, as DuckDB SQL over a
    pre-encoded ``iv`` column: exact bigint sum, one double division pair
    at the boundary.  One definition shared by every oracle that replays
    a quantizer chain (the batch ANN indexes and SemDeDup in ``llm_ops``,
    the streaming maintenance and admission tiers in ``streaming/``) so
    the arithmetic can never drift between copies.  ``scale`` is embedded
    exactly as passed — callers pass ``float(...)`` or an int to keep
    their oracle text stable."""
    return f"(CAST(CAST(SUM(iv) AS BIGINT) AS DOUBLE) / COUNT(*)) / {scale}"


def fp_encode_sql(expr: str, scale) -> str:
    """THE fixed-point encode (double multiply, floor, bigint) for the
    quantizer-chain oracles — the SQL twin of the Spark-side
    ``floor(x * scale).cast('bigint')`` discipline.  Shared for the same
    reason as :func:`fp_mean_sql`."""
    return f"CAST(FLOOR({expr} * {scale}) AS BIGINT)"
