"""Multi-dimensional aggregation: ROLLUP / CUBE / GROUPING SETS.

One shuffle; Spark expands grouping sets with an Expand node feeding a
single hash aggregate — the same physical shape DuckDB and warehouses use,
and the right one at 100 TB (no N-pass re-aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.operators._util import dsum
from realtime_change_data_capture_streaming_spark.sources.tables import load_table


def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (status, priority): per-cell, per-status, grand total."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
            F.grouping_id("o_orderstatus", "o_orderpriority").cast("bigint").alias("gid"),
        )
    )


ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (returnflag, linestatus): all 4 grouping combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_quantity").alias("sum_qty"),
        F.grouping_id("l_returnflag", "l_linestatus").cast("bigint").alias("gid"),
    )


CUBE_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def grouping_sets_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((mktsegment), (nationkey)) via SQL API —
    the DataFrame API exposes rollup/cube; arbitrary sets go through
    spark.sql on a registered view (still one Expand+aggregate plan)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_gs")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        FROM customer_gs
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )


GROUPING_SETS_SQL = """
SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
"""


QUERIES = {
    "rollup_orders": rollup_orders,
    "cube_lineitem": cube_lineitem,
    "grouping_sets_custom": grouping_sets_custom,
}

ORACLE = {
    "rollup_orders": ROLLUP_SQL,
    "cube_lineitem": CUBE_SQL,
    "grouping_sets_custom": GROUPING_SETS_SQL,
}
