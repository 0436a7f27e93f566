"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the lineitem⋈orders join is THE dominant shuffle.  Bucketing
both tables by the join key at write time (``bucketBy(n, key)``) makes
every subsequent join/aggregation on that key shuffle-free: Spark reads
matching buckets side by side (SortMergeJoin with no Exchange).

This module materializes bucketed copies of the fixture tables into a
warehouse directory and exposes the co-located join; tests assert the
physical plan contains ZERO exchanges.  At production scale the write is
a one-time layout decision (the same one that motivated the reference's
PK index — pay on write, win on every read).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.operators._util import dec
from realtime_change_data_capture_streaming_spark.sources.tables import load_table

N_BUCKETS = 8


def create_bucketed_tables(spark: SparkSession, sf_dir: str, suffix: str = "") -> tuple[str, str]:
    """Write lineitem/orders bucketed + sorted by the join key.  Returns
    the table names (idempotent per (session, suffix))."""
    li_name, o_name = f"lineitem_bkt{suffix}", f"orders_bkt{suffix}"
    # the in-memory catalog dies with the session but the warehouse dir
    # survives: clear orphaned locations so re-creation succeeds
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path
    for name in (li_name, o_name):
        loc = os.path.join(wh, name)
        if not spark.catalog.tableExists(name) and os.path.isdir(loc):
            shutil.rmtree(loc)
    if not spark.catalog.tableExists(li_name):
        (
            load_table(spark, sf_dir, "lineitem")
            .write.bucketBy(N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(li_name)
        )
    if not spark.catalog.tableExists(o_name):
        (
            load_table(spark, sf_dir, "orders")
            .write.bucketBy(N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(o_name)
        )
    return li_name, o_name


def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem⋈orders on the bucket key -> revenue per order status.
    With both sides bucketed on the key, the plan has no Exchange before
    the join (asserted in tests/test_plans.py)."""
    li_name, o_name = create_bucketed_tables(spark, sf_dir)
    li, o = spark.table(li_name), spark.table(o_name)
    return (
        li.join(o.hint("merge"), li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


BUCKETED_JOIN_SQL = """
SELECT o_orderstatus,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


QUERIES = {"bucketed_join_revenue": bucketed_join_revenue}
ORACLE = {"bucketed_join_revenue": BUCKETED_JOIN_SQL}
