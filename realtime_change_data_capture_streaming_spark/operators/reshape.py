"""Reshape operators: PIVOT (long->wide) and UNPIVOT/melt (wide->long).

Spark's ``groupBy().pivot(col, values)`` with explicit values compiles to a
single hash aggregate over ``CASE WHEN`` projections — one shuffle, no
second pass, and (because the pivot values are given, not discovered) no
extra distinct-scan job.  At 100 TB the explicit-values form is the only
sane one: the implicit form runs a full distinct over the pivot column
first and then caps it at ``spark.sql.pivotMaxValues``.

``unpivot`` (a.k.a. ``melt``) is a pure Expand projection — zero shuffles,
output rows = input rows x n_measures; it streams through whole-stage
codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.operators._util import dec
from realtime_change_data_capture_streaming_spark.sources.tables import load_table

#: lineitem ship dates span 1992-1998 at every TPC-H scale factor.
PIVOT_YEARS = tuple(range(1992, 1999))


def pivot_revenue_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per returnflag (rows) x ship year (columns), wide.

    Explicit pivot values keep it a single-shuffle hash aggregate (the
    Expand+CASE physical shape); exact decimal sums rendered as double at
    the boundary (``_util`` discipline) so the hash matches DuckDB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - dec("l_discount"))
    wide = (
        li.select("l_returnflag", F.year("l_shipdate").alias("yr"), rev.alias("rev"))
        .groupBy("l_returnflag")
        .pivot("yr", list(PIVOT_YEARS))
        .agg(F.sum("rev").cast("double"))
    )
    # no final orderBy: the result compare is order-insensitive, and a
    # presentation sort is a needless range shuffle (global-sort guard)
    return wide.select(
        "l_returnflag", *[F.col(str(y)).alias(f"y{y}") for y in PIVOT_YEARS]
    )


PIVOT_REVENUE_SQL = "\n".join(
    ["SELECT l_returnflag,"]
    + [
        "  CAST(SUM(CASE WHEN EXTRACT(year FROM l_shipdate) = {y} THEN"
        " CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) -"
        " CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE) AS y{y},".format(y=y)
        for y in PIVOT_YEARS
    ]
)[:-1] + "\nFROM lineitem GROUP BY l_returnflag"


def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part (p_size, p_retailprice) wide -> long (metric, value) rows.

    ``DataFrame.unpivot`` is the Spark 3.4+ melt: an Expand projection with
    no shuffle.  Measures are cast to a common double type (unpivot
    requires it, and it matches the oracle's UNION ALL).
    """
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").cast("double").alias("retailprice"),
    ).unpivot("p_partkey", ["size", "retailprice"], "metric", "value")


UNPIVOT_PART_SQL = """
SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'retailprice' AS metric, CAST(p_retailprice AS DOUBLE) AS value FROM part
"""


QUERIES = {
    "pivot_revenue_by_year": pivot_revenue_by_year,
    "unpivot_part_measures": unpivot_part_measures,
}

ORACLE = {
    "pivot_revenue_by_year": PIVOT_REVENUE_SQL,
    "unpivot_part_measures": UNPIVOT_PART_SQL,
}
