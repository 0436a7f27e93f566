"""Skew handling: salted two-phase aggregation.

AQE's skew-join splitting handles joins automatically; for aggregations
with pathological hot keys, salting is the manual tool: scatter each hot
key across S salt buckets (phase 1: partial agg on (key, salt)), then
reduce the S partials (phase 2: final agg on key).  With decimal-exact
sums the result is identical to the direct aggregate — which is exactly
what the oracle checks.

``l_returnflag`` has 3 values over 600k rows at sf0.1 (at 100 TB, tens of
billions of rows per key): the textbook case where one reducer would
otherwise own a third of the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.operators._util import dec
from realtime_change_data_capture_streaming_spark.sources.tables import load_table

N_SALTS = 16


def salted_agg(df: DataFrame, key: str, n_salts: int = N_SALTS) -> DataFrame:
    """Two-phase salted sum/count over a hot grouping key."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)))
    phase1 = salted.groupBy(key, "_salt").agg(
        F.sum(dec("l_extendedprice")).alias("p_sum"),
        F.count(F.lit(1)).alias("p_cnt"),
    )
    return phase1.groupBy(key).agg(
        F.sum("p_sum").cast("double").alias("sum_price"),
        F.sum("p_cnt").alias("n_items"),
    )


def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return salted_agg(li, "l_returnflag")


SKEW_SALTED_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n_items
FROM lineitem GROUP BY l_returnflag
"""


QUERIES = {"skew_salted_agg": skew_salted_agg}
ORACLE = {"skew_salted_agg": SKEW_SALTED_SQL}
