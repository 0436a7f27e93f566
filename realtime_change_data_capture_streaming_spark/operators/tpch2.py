"""TPC-H-style queries, part 2: correlated/scalar subqueries, EXISTS/IN,
HAVING, CASE aggregation, distributions, disjunctive predicates — the
query shapes Catalyst decorrelates and pushes down.

Adapted to the fixture schema (no commitdate/receiptdate/comment columns).
Every query keeps the decimal-exact aggregation discipline of _util.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.operators._util import dec, dsum
from realtime_change_data_capture_streaming_spark.sources.tables import load_table

def _one():
    # lazy: F.lit needs an active SparkContext, so no module-level Columns
    return F.lit(1).cast("decimal(3,2)")


def q2_top_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: correlated scalar subquery — suppliers holding their
    nation's max account balance.  DataFrame form: broadcast-join the
    per-nation max back (what Catalyst decorrelates the subquery into)."""
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    max_bal = sup.groupBy("s_nationkey").agg(F.max("s_acctbal").alias("max_bal"))
    return (
        sup.join(F.broadcast(max_bal), "s_nationkey")
        .filter(F.col("s_acctbal") == F.col("max_bal"))
        .join(F.broadcast(nation), sup["s_nationkey"] == nation["n_nationkey"])
        .select("s_suppkey", "s_name", "n_name", "s_acctbal")
    )


Q2_SQL = """
SELECT s_suppkey, s_name, n_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_acctbal = (SELECT MAX(s2.s_acctbal) FROM supplier s2
                   WHERE s2.s_nationkey = supplier.s_nationkey)
"""


def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS semi-join — orders with at least one line shipped
    more than 60 days after the order date, counted per priority."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    late = load_table(spark, sf_dir, "lineitem")
    cond = (late["l_orderkey"] == orders["o_orderkey"]) & (
        late["l_shipdate"] > F.date_add(orders["o_orderdate"], 60)
    )
    return (
        orders.join(late, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: revenue flow between (supplier nation, customer nation)
    pairs per year, both directions of a chosen pair."""
    nation = load_table(spark, sf_dir, "nation")
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sk"),
    )
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("ck"),
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(sup.select("s_suppkey", "supp_nation")), li["l_suppkey"] == F.col("s_suppkey"))
        .join(F.broadcast(cust.select("c_custkey", "cust_nation")), orders["o_custkey"] == F.col("c_custkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(
            F.sum(dec("l_extendedprice") * (_one() - dec("l_discount"))).cast("double").alias("revenue")
        )
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM (
  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         EXTRACT(YEAR FROM l_shipdate) AS l_year, l_extendedprice, l_discount
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
     OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: share-of-total — ASIA suppliers' revenue fraction per
    order year.  Ratio of two decimal-exact sums -> deterministic double."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    asia_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        nation["n_regionkey"] == region["r_regionkey"],
        "left_semi",
    ).select("n_nationkey")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    vol = dec("l_extendedprice") * (_one() - dec("l_discount"))
    asia_sup = sup.join(F.broadcast(asia_nations), sup["s_nationkey"] == F.col("n_nationkey"), "left_semi")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(
            F.broadcast(asia_sup.select(F.col("s_suppkey").alias("asia_suppkey"))),
            li["l_suppkey"] == F.col("asia_suppkey"),
            "left",
        )
    )
    return joined.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year")).agg(
        (
            F.sum(F.when(F.col("asia_suppkey").isNotNull(), vol).otherwise(F.lit(0).cast("decimal(38,4)"))).cast("double")
            / F.sum(vol).cast("double")
        ).alias("asia_share")
    )


Q8_SQL = """
SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
       CAST(SUM(CASE WHEN is_asia THEN vol ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE)
       / CAST(SUM(vol) AS DOUBLE) AS asia_share
FROM (
  SELECT o_orderdate,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))) AS vol,
         s_nationkey IN (SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
                         WHERE r_name = 'ASIA') AS is_asia
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
)
GROUP BY 1
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: HAVING against a scalar subquery — (suppkey, partkey)
    value above 0.1% of total value."""
    li = load_table(spark, sf_dir, "lineitem")
    val = dec("l_extendedprice") * (_one() - dec("l_discount"))
    per_pair = li.groupBy("l_suppkey", "l_partkey").agg(F.sum(val).alias("pair_value"))
    total = li.agg(F.sum(val).alias("total_value"))
    return (
        per_pair.crossJoin(F.broadcast(total))
        .filter(F.col("pair_value").cast("double") > F.col("total_value").cast("double") * 0.001)
        .select(
            "l_suppkey",
            "l_partkey",
            F.col("pair_value").cast("double").alias("pair_value"),
        )
    )


Q11_SQL = """
WITH vals AS (
  SELECT l_suppkey, l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS pair_value
  FROM lineitem GROUP BY 1, 2
)
SELECT l_suppkey, l_partkey, CAST(pair_value AS DOUBLE) AS pair_value
FROM vals
WHERE CAST(pair_value AS DOUBLE) >
      (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) FROM lineitem) * 0.001
"""


def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: CASE aggregation — high/low priority order counts per
    lineitem return flag."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: group-by of a group-by — how many customers placed k
    orders, including k=0 (left outer)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left").groupBy(
        "c_custkey"
    ).agg(F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY c_count
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional revenue fraction — PROMO part types' share."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    vol = dec("l_extendedprice") * (_one() - dec("l_discount"))
    promo = F.col("p_type").startswith("PROMO")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            (
                F.sum(F.when(promo, vol).otherwise(F.lit(0).cast("decimal(38,4)"))).cast("double")
                * 100.0
                / F.sum(vol).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


Q14_SQL = """
SELECT CAST(SUM(CASE WHEN starts_with(p_type, 'PROMO')
                     THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))
                     ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE) * 100.0
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
"""


def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: NOT IN + distinct count per attribute group."""
    part = load_table(spark, sf_dir, "part").filter(~F.col("p_brand").isin("Brand#1", "Brand#2"))
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand NOT IN ('Brand#1', 'Brand#2')
GROUP BY 1, 2, 3
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated avg subquery — revenue of lines below 50% of
    their part's average quantity."""
    li = load_table(spark, sf_dir, "lineitem")
    # decimal-exact avg: qty values are integral doubles
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(avg_qty), li["l_partkey"] == F.col("ap"))
        .filter(F.col("l_quantity") < F.col("avg_qty") * 0.5)
        .agg((F.sum(dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"))
    )


Q17_SQL = """
WITH pq AS (
  SELECT l_partkey AS ap,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY 1
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem JOIN pq ON l_partkey = ap
WHERE l_quantity < avg_qty * 0.5
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING on a grouped fact, joined back to dimensions."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = li.groupBy("l_orderkey").agg(dsum("l_quantity").alias("total_qty")).filter(
        F.col("total_qty") > 150
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice, total_qty
FROM (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY 1 HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: disjunction of conjunctions across two tables — the
    pushdown/CNF-conversion stress test."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    cond = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size") <= 5) & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size") <= 15) & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30))
    )
    return j.filter(cond).agg(
        F.sum(dec("l_extendedprice") * (_one() - dec("l_discount"))).cast("double").alias("revenue")
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size <= 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size <= 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size <= 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: anti-join + scalar avg subquery — rich customers (above
    the positive-balance average) with no URGENT orders, counted per
    nation.  (Every fixture customer has some order, so the anti-join is
    against the urgent subset to keep the result non-trivial.)"""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    no_orders = rich.join(orders, rich["c_custkey"] == orders["o_custkey"], "left_anti")
    return no_orders.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"), dsum("c_acctbal").alias("totacctbal")
    )


Q22_SQL = """
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: aggregate-of-aggregate — supplier(s) with the maximum
    total revenue (the CREATE VIEW + WHERE total = (SELECT MAX...) form,
    decorrelated into a broadcast join against the scalar max)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    sup = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(dec("l_extendedprice") * (_one() - dec("l_discount"))).cast("double").alias("total_revenue")
    )
    max_rev = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(sup), rev["l_suppkey"] == sup["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


def q20_nested_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested IN-subqueries — suppliers who shipped any part
    whose name contains 'red' in 1997 (two-level semi-join chain)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    sup = load_table(spark, sf_dir, "supplier")
    shipped_green = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"], "left_semi")
    return sup.join(
        shipped_green, sup["s_suppkey"] == shipped_green["l_suppkey"], "left_semi"
    ).select("s_suppkey", "s_name", "s_acctbal")


Q20_SQL = """
SELECT s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
)
"""


def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: EXISTS + NOT EXISTS over the same fact — suppliers in one
    nation who were the *sole* late shipper on a finished multi-supplier
    order.  "Late" is adapted to the fixture schema (no receipt/commit
    dates): shipped >60 days after the order date.

    Spark form: the two correlated subqueries become a left-semi join
    (another supplier exists on the order) and a left-anti join (no OTHER
    supplier shipped late) on l_orderkey, with the supplier-inequality as a
    residual non-equi predicate — the same decorrelation Catalyst performs
    for EXISTS/NOT EXISTS.  The late set is computed once and reused for
    both the candidate rows and the anti side; orders/supplier prune before
    the fact join, and the final count is a plain shuffle-partial agg."""
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
    )
    late = li.join(orders_f, li["l_orderkey"] == orders_f["o_orderkey"]).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    l1 = late.join(F.broadcast(sup), late["l_suppkey"] == sup["s_suppkey"]).select(
        "l_orderkey", "l_suppkey", "s_name"
    )
    others = li.select(F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key"))
    late_others = late.select(
        F.col("l_orderkey").alias("o3_key"), F.col("l_suppkey").alias("s3_key")
    )
    return (
        l1.join(
            others,
            (l1["l_orderkey"] == others["o2_key"]) & (l1["l_suppkey"] != others["s2_key"]),
            "left_semi",
        )
        .join(
            late_others,
            (l1["l_orderkey"] == late_others["o3_key"])
            & (l1["l_suppkey"] != late_others["s3_key"]),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND n_name = 'NATION_7'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND o3.o_orderstatus = 'F'
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


QUERIES = {
    "q2_top_supplier_per_nation": q2_top_supplier_per_nation,
    "q15_top_supplier": q15_top_supplier,
    "q20_nested_in": q20_nested_in,
    "q21_suppliers_kept_waiting": q21_suppliers_kept_waiting,
    "q4_order_priority_exists": q4_order_priority_exists,
    "q7_nation_volume": q7_nation_volume,
    "q8_market_share": q8_market_share,
    "q11_important_stock": q11_important_stock,
    "q12_priority_by_returnflag": q12_priority_by_returnflag,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q14_promo_share": q14_promo_share,
    "q16_supplier_cnt": q16_supplier_cnt,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive": q19_disjunctive,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
}

ORACLE = {
    "q2_top_supplier_per_nation": Q2_SQL,
    "q15_top_supplier": Q15_SQL,
    "q20_nested_in": Q20_SQL,
    "q21_suppliers_kept_waiting": Q21_SQL,
    "q4_order_priority_exists": Q4_SQL,
    "q7_nation_volume": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q11_important_stock": Q11_SQL,
    "q12_priority_by_returnflag": Q12_SQL,
    "q13_order_count_distribution": Q13_SQL,
    "q14_promo_share": Q14_SQL,
    "q16_supplier_cnt": Q16_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q18_large_orders": Q18_SQL,
    "q19_disjunctive": Q19_SQL,
    "q22_global_sales_opportunity": Q22_SQL,
}
