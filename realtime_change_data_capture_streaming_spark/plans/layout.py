"""Data-layout operators: Z-order (Morton) clustering for multi-dim scans.

At 100 TB, sorting files by a single column only helps scans filtered on
that column.  Interleaving the bits of several columns into one Morton key
and range-sorting on it gives locality in EVERY interleaved dimension at
once, so min/max file statistics prune scans filtered on any of them —
the same layout trick behind Delta/Databricks ``OPTIMIZE ZORDER BY`` and
Iceberg's sort orders, expressed here as plain Catalyst bit arithmetic
(shift/and/or fold — whole-stage codegen, no UDF).

The bit math is engine-neutral integer arithmetic, so the DuckDB oracle
reproduces it exactly (both SQL strings are generated from the same
Python loop — they cannot drift apart).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.sources.tables import load_table

ZORDER_BITS = 16


def zorder_value(*cols: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton interleave of the low ``bits`` bits of each column.

    Bit ``i`` of column ``j`` lands at output position ``i*n_cols + j``;
    with two 16-bit dims the result fits a 32-bit key.  Inputs must be
    non-negative integers (callers mask/bucket first).
    """
    n = len(cols)
    parts = [
        F.shiftleft(F.shiftrightunsigned(c.cast("long"), i).bitwiseAND(F.lit(1)), i * n + j)
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def _zorder_sql(exprs: list[str], bits: int = ZORDER_BITS) -> str:
    """The identical interleave as ANSI SQL (DuckDB/portable bit ops)."""
    n = len(exprs)
    parts = [
        f"((({e} >> {i}) & 1) << {i * n + j})" for j, e in enumerate(exprs) for i in range(bits)
    ]
    return " | ".join(parts)


def zorder_events(df: DataFrame) -> DataFrame:
    """events keyed by a (user_id, value-cents) Morton code.

    The two dims are masked to 16 bits — at scale you'd bucket each dim
    to its quantile rank first so the key space is dense regardless of
    the raw value distribution.
    """
    # round() before the long cast: Spark's double->long cast truncates
    # while DuckDB's rounds, and 2-decimal doubles times 100 sit a hair
    # below their integer (e.g. 38.29*100 = 3828.999...) — truncation
    # would disagree across engines on nearly every row
    cents = F.round(F.col("value") * 100).cast("long")
    x = F.col("user_id").bitwiseAND(F.lit(0xFFFF))
    y = cents.bitwiseAND(F.lit(0xFFFF))
    return df.select(
        "event_id",
        "user_id",
        cents.alias("cents"),
        zorder_value(x, y).alias("zvalue"),
    )


def layout_zorder_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 200 events in Z-order — the exact row stream a clustered
    rewrite would lay down first.  LIMIT keeps the plan a
    TakeOrderedAndProject (per-partition top-k + single merge), not a
    global sort; the full-table rewrite variant is ``zorder_events``
    + ``orderBy`` + write, whose range-partitioned sort is the normal
    cluster-write shape."""
    ev = load_table(spark, sf_dir, "events")
    return (
        zorder_events(ev)
        .orderBy("zvalue", "event_id")
        .limit(200)
    )


LAYOUT_ZORDER_SQL = f"""
SELECT event_id, user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents,
       {_zorder_sql(["(user_id & 65535)", "(CAST(ROUND(value * 100) AS BIGINT) & 65535)"])} AS zvalue
FROM events
ORDER BY zvalue, event_id
LIMIT 200
"""


QUERIES = {"layout_zorder_topk": layout_zorder_topk}
ORACLE = {"layout_zorder_topk": LAYOUT_ZORDER_SQL}
