"""DataFrame statistics surface (``df.stat``) + distribution operators.

``crosstab`` is the contingency-table primitive (pairwise frequency of two
low-cardinality columns); ``ntile``-based equi-depth histograms are the
data-profiling complement to the fixed-width histogram in
``operators/events.py`` — bucket boundaries adapt to the distribution, so
every bucket holds the same row count.

Scale shape: crosstab is one hash agg on (a, b) followed by a pivot of a
bounded-cardinality domain (the contract: both columns are dimension-like;
a high-cardinality crosstab is a user error at any scale).  The equi-depth
histogram is a single window sort on the value — the one global sort the
semantic genuinely requires — followed by a hash agg on the bucket id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.operators._util import dsum
from realtime_change_data_capture_streaming_spark.sources.tables import load_table

_N_BUCKETS = 8


def docs_crosstab_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table lang x source via ``df.stat.crosstab`` — one row
    per lang, one count column per source value."""
    d = load_table(spark, sf_dir, "documents")
    return d.stat.crosstab("lang", "source")


# the source domain is data-dependent but dimension-like; the oracle
# enumerates it the same way crosstab does (distinct values as columns)
_CROSSTAB_SQL = """
SELECT lang AS lang_source,
       {cols}
FROM documents GROUP BY lang
""".format(
    cols=",\n       ".join(
        f"CAST(SUM(CASE WHEN source = 'src{i}' THEN 1 ELSE 0 END) AS BIGINT) AS src{i}"
        for i in range(20)
    )
)


def orders_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile-bucketed) histogram of order totals: ntile(8)
    with a deterministic total order (value, key), then per-bucket count /
    bounds / exact sum."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_orderkey", "o_totalprice", F.ntile(_N_BUCKETS).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
            dsum("o_totalprice").alias("sum_total"),
        )
        .select(F.col("bucket").cast("bigint").alias("bucket"), "n_orders", "lo", "hi", "sum_total")
    )


_EQUIDEPTH_SQL = f"""
WITH b AS (
  SELECT o_totalprice,
         NTILE({_N_BUCKETS}) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders
)
SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_orders,
       CAST(MIN(o_totalprice) AS DOUBLE) AS lo, CAST(MAX(o_totalprice) AS DOUBLE) AS hi,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
FROM b GROUP BY bucket
"""


_BASKET_TOP = 20


def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top part pairs ordered together.

    The classic frequent-itemset counting shape, scale-safe because the
    self-join blocks are ORDER-sized (TPC-H orders hold <= 7 distinct
    parts; real baskets are similarly bounded), so the pair expansion is
    linear in orders times k^2, never corpus-quadratic.  Distinct
    (order, part) first — a part appearing on two lines of one order
    must not double-count the pair; top-k via one global
    TakeOrderedAndProject with full (n, pa, pb) tie-break."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.alias("a")
    b = li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
    )
    counted = pairs.groupBy("part_a", "part_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    return counted.orderBy(
        F.desc("n_orders"), F.asc("part_a"), F.asc("part_b")
    ).limit(_BASKET_TOP)


_BASKET_SQL = f"""
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT part_a, part_b, COUNT(*) AS n_orders
FROM pairs GROUP BY 1, 2
ORDER BY n_orders DESC, part_a ASC, part_b ASC
LIMIT {_BASKET_TOP}
"""


QUERIES = {
    "docs_crosstab_lang_source": docs_crosstab_lang_source,
    "orders_equidepth_histogram": orders_equidepth_histogram,
    "basket_part_pairs": basket_part_pairs,
}

ORACLE = {
    "docs_crosstab_lang_source": _CROSSTAB_SQL,
    "orders_equidepth_histogram": _EQUIDEPTH_SQL,
    "basket_part_pairs": _BASKET_SQL,
}
