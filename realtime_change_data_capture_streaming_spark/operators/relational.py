"""Join variants, window functions, sort/top-k, set operations.

Fills SURVEY.md section 2.5's relational inventory (the reference itself
has no joins/aggregations/windows).  Scale notes inline per operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.operators._util import dec, dsum
from realtime_change_data_capture_streaming_spark.sources.tables import load_table


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: customers that have at least one urgent open order.
    Semi-join shuffles only the key column of the probe side — far cheaper
    than join+distinct at scale."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_orderpriority") == "1-URGENT")
    )
    return cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_orderstatus = 'O' AND o_orderpriority = '1-URGENT')
"""


#: bit-space of the bloom-style runtime filter: the broadcast side is
#: capped at this many DISTINCT hash positions no matter how many build
#: keys exist — the property that makes the reduction scale-safe
_BLOOM_BITS = 1 << 17


def join_bloom_prefiltered_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join reduction via a bloom-style runtime filter — the
    100 TB technique for a big-fact x selective-dim join: hash the
    build-side keys (urgent orders) into a bounded bit space, broadcast
    the DISTINCT positions (<= _BLOOM_BITS rows regardless of key
    count — the compaction a raw key broadcast lacks), semi-join the
    fact scan against them BEFORE the shuffle join, and let the exact
    join remove the false positives.  The filter is transparent to the
    result, so the oracle is the plain join; the plan pin in
    tests/test_plans.py asserts the broadcast semi-join sits below the
    shuffle join."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load_table(spark, sf_dir, "lineitem")
    positions = orders.select(
        F.pmod(F.xxhash64("o_orderkey"), F.lit(_BLOOM_BITS)).alias("_b")
    ).distinct()
    pre = li.join(
        F.broadcast(positions),
        F.pmod(F.xxhash64("l_orderkey"), F.lit(_BLOOM_BITS)) == F.col("_b"),
        "left_semi",
    )
    joined = pre.join(orders.select("o_orderkey"), pre["l_orderkey"] == F.col("o_orderkey"))
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
        )
        .select("l_returnflag", "n_items", "revenue")
    )


JOIN_BLOOM_SQL = """
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_returnflag
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI: customers with no orders at all (NOT EXISTS)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def join_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER + agg: order count / total spend per customer, keeping
    zero-order customers.  Aggregate the fact side BEFORE the join — at
    100 TB, pre-aggregation shrinks the shuffle by orders of magnitude and
    turns the join into small⋈small."""
    cust = load_table(spark, sf_dir, "customer")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_spend"))
    )
    return cust.join(per_cust, cust["c_custkey"] == per_cust["o_custkey"], "left").select(
        "c_custkey",
        "c_name",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"),
    )


JOIN_OUTER_SQL = """
SELECT c_custkey, c_name,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(total_spend, 0.0) AS total_spend
FROM customer
LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
  FROM orders GROUP BY o_custkey
) ON c_custkey = o_custkey
"""


def join_full_outer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of customer-count and supplier-count per nation."""
    c = load_table(spark, sf_dir, "customer").groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    s = load_table(spark, sf_dir, "supplier").groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return c.join(s, c["c_nationkey"] == s["s_nationkey"], "full_outer").select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


JOIN_FULL_OUTER_SQL = """
SELECT COALESCE(c.k, s.k) AS nationkey,
       COALESCE(c.n_customers, 0) AS n_customers,
       COALESCE(s.n_suppliers, 0) AS n_suppliers
FROM (SELECT c_nationkey AS k, COUNT(*) AS n_customers FROM customer GROUP BY 1) c
FULL OUTER JOIN (SELECT s_nationkey AS k, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) s
ON c.k = s.k
"""


def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta/range) join: for each order, count lineitems shipped
     60-90 days after the order date.  Equi part (orderkey) carries the
    shuffle; the range predicate is evaluated post-match, so this stays a
    hash join, not a cartesian."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(
        orders,
        (li["l_orderkey"] == orders["o_orderkey"])
        & (li["l_shipdate"] >= F.date_add(orders["o_orderdate"], 60))
        & (li["l_shipdate"] < F.date_add(orders["o_orderdate"], 90)),
    )
    return j.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_late_ships"))


JOIN_RANGE_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_late_ships
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
 AND l_shipdate <  o_orderdate + INTERVAL 90 DAY
GROUP BY o_orderpriority
"""


def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: 3 most expensive orders per customer.

    row_number over (custkey, price desc, orderkey) — the unique tiebreak
    makes the result deterministic.  At scale this is the standard single
    shuffle + per-partition sort; no driver involvement."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rk").cast("bigint").alias("rk"))
    )


WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rk
  FROM orders
) WHERE rk <= 3
"""


def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over supplier account balances."""
    sup = load_table(spark, sf_dir, "supplier")
    w = Window.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return sup.select(
        "s_suppkey",
        "s_acctbal",
        F.rank().over(w).cast("bigint").alias("bal_rank"),
        F.dense_rank().over(w).cast("bigint").alias("bal_dense_rank"),
        F.ntile(4).over(w).cast("bigint").alias("bal_quartile"),
    )


WINDOW_RANK_SQL = """
SELECT s_suppkey, CAST(s_acctbal AS DOUBLE) AS s_acctbal,
       CAST(RANK() OVER w AS BIGINT) AS bal_rank,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS bal_dense_rank,
       CAST(NTILE(4) OVER w AS BIGINT) AS bal_quartile
FROM supplier
WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey ASC)
"""


def orders_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2D skyline (Pareto front): orders minimizing (o_totalprice,
    o_orderdate) — no other order is both cheaper-or-equal AND
    earlier-or-equal with one strict.  The dominance-query operator
    class (best-deal-earliest, multi-objective top results).

    Scale shape: never the naive all-pairs check.  Pass 1 aggregates a
    per-MONTH min price (calendar-bounded, <= ~100 rows collected —
    metadata-scale) whose strict-prefix min gives a dominance threshold:
    any row meeting ``price >= min price of a strictly earlier month``
    is dominated (earlier month implies strictly earlier date) and is
    filtered OUT in one scan.  2D-skyline survivors of n uniform points
    number O(log n), so the exact pairwise dominance anti-join runs on a
    vanishing fraction of the input; the proof that survivors need only
    be checked against survivors (any same-month dominator of a
    survivor beats the prefix threshold too, hence survives) keeps the
    result exact."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", F.col("o_totalprice").cast("double").alias("price")
    )
    bucket = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("b")
    mins = {
        r["b"]: r["m"]
        for r in o.select(bucket, "price").groupBy("b").agg(F.min("price").alias("m")).collect()
    }  # bounded collect: one row per calendar month
    thr, run = {}, None
    for b in sorted(mins):
        if run is not None:
            thr[b] = run
        run = mins[b] if run is None else min(run, mins[b])
    thr_map = (
        F.create_map(*[F.lit(v) for kv in thr.items() for v in kv]) if thr else F.create_map()
    )
    surv = o.withColumn("_b", bucket).filter(
        F.col("price") < F.coalesce(thr_map[F.col("_b")], F.lit(float("inf")))
    ).drop("_b").localCheckpoint(eager=True)
    r, s = surv.alias("r"), surv.alias("s")
    dominated = (
        (F.col("s.price") <= F.col("r.price"))
        & (F.col("s.o_orderdate") <= F.col("r.o_orderdate"))
        & (
            (F.col("s.price") < F.col("r.price"))
            | (F.col("s.o_orderdate") < F.col("r.o_orderdate"))
        )
    )
    return r.join(s, dominated, "left_anti").select(
        "o_orderkey", "o_orderdate", F.col("price").alias("o_totalprice")
    )


# oracle: per-date min + strict-prefix min over the date spine (date
# cardinality, not row cardinality), then the 3-clause dominance rule
PARETO_SQL = """
WITH perd AS (
  SELECT o_orderdate AS d, MIN(CAST(o_totalprice AS DOUBLE)) AS mp
  FROM orders GROUP BY 1
), spine AS (
  SELECT d, mp,
         MIN(mp) OVER (ORDER BY d ASC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS before_mp
  FROM perd
)
SELECT o.o_orderkey, o.o_orderdate, CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
FROM orders o JOIN spine sp ON sp.d = o.o_orderdate
WHERE (sp.before_mp IS NULL OR CAST(o.o_totalprice AS DOUBLE) < sp.before_mp)
  AND CAST(o.o_totalprice AS DOUBLE) <= sp.mp
"""


def window_percentile_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist: each customer's relative balance
    position WITHIN their nation — the distribution-position window pair
    (rank-based and value-based CDF).  Partitioned by nation, so every
    window task holds one nation's customers (~1/25 of the table at any
    scale), never the corpus."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_custkey",
        F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
        F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 8).alias("cume_dist"),
    )


WINDOW_PERCENTILE_SQL = """
SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(c_acctbal AS DOUBLE) AS c_acctbal,
       ROUND(PERCENT_RANK() OVER w, 8) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 8) AS cume_dist
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead: days since a customer's previous order (event sequence
    analytics — same shape as sessionization at 100 TB)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate", 1).over(w))
        .cast("bigint")
        .alias("days_since_prev"),
        F.lead("o_orderkey", 1).over(w).alias("next_orderkey"),
    )


WINDOW_LAG_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(DATE_DIFF('day', LAG(o_orderdate, 1) OVER w, o_orderdate) AS BIGINT) AS days_since_prev,
       LEAD(o_orderkey, 1) OVER w AS next_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total of spend per customer (unbounded-preceding frame).
    Decimal arithmetic keeps every prefix sum exact -> cross-engine stable."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
            (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
"""


def sort_topn_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: TakeOrderedAndProject — per-partition heaps, driver
    merges N*partitions rows; never a full sort at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(25)
    )


SORT_TOPN_SQL = """
SELECT l_orderkey, l_linenumber, CAST(l_extendedprice AS DOUBLE) AS l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 25
"""


def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over nation-key sets of customers vs
    suppliers, tagged per set-op."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = c.intersect(s).withColumn("op", F.lit("both"))
    cust_only = c.subtract(s).withColumn("op", F.lit("customer_only"))  # EXCEPT DISTINCT
    all_n = c.union(s).distinct().withColumn("op", F.lit("union"))
    return both.unionByName(cust_only).unionByName(all_n)


SET_OPS_SQL = """
SELECT nationkey, 'both' AS op FROM
  (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'customer_only' AS op FROM
  (SELECT DISTINCT c_nationkey AS nationkey FROM customer
   EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'union' AS op FROM
  (SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier)
"""


def set_ops_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — multiset semantics preserve duplicate
    cardinality (one 'both' row per matched pair)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    inter = c.intersectAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))
    exc = c.exceptAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))
    return inter.withColumn("op", F.lit("intersect_all")).unionByName(
        exc.withColumn("op", F.lit("except_all"))
    )


SET_OPS_ALL_SQL = """
SELECT nationkey, COUNT(*) AS n, 'intersect_all' AS op FROM
  (SELECT c_nationkey AS nationkey FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier)
GROUP BY nationkey
UNION ALL
SELECT nationkey, COUNT(*) AS n, 'except_all' AS op FROM
  (SELECT c_nationkey AS nationkey FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier)
GROUP BY nationkey
"""


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame + first/last: per customer, count orders within the
    prior 90 days (value-based frame, not row-based) and first/latest
    order keys over the full partition."""
    orders = load_table(spark, sf_dir, "orders")
    day = F.unix_timestamp("o_orderdate") / 86400
    wr = (
        Window.partitionBy("o_custkey")
        .orderBy(day.cast("long"))
        .rangeBetween(-90, Window.currentRow)
    )
    wfull = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(wr).alias("orders_last_90d"),
        F.first("o_orderkey").over(wfull).alias("first_orderkey"),
        F.last("o_orderkey").over(wfull).alias("latest_orderkey"),
    )


WINDOW_RANGE_SQL = """
SELECT o_custkey, o_orderkey,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY CAST(EPOCH(o_orderdate)/86400 AS BIGINT)
                      RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS orders_last_90d,
       FIRST_VALUE(o_orderkey) OVER w AS first_orderkey,
       LAST_VALUE(o_orderkey) OVER w AS latest_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (percentile_cont semantics) per
    status — sort-based, engine-agnostic interpolation arithmetic."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.percentile(F.col("o_totalprice"), F.lit(0.5)).alias("p50"),
        F.percentile(F.col("o_totalprice"), F.lit(0.9)).alias("p90"),
        F.percentile(F.col("o_totalprice"), F.lit(0.99)).alias("p99"),
    )


PERCENTILES_SQL = """
SELECT o_orderstatus,
       CAST(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) AS DOUBLE) AS p50,
       CAST(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9) AS DOUBLE) AS p90,
       CAST(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.99) AS DOUBLE) AS p99
FROM orders GROUP BY o_orderstatus
"""


def distinct_count_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) — expands to two-phase aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_distinct_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


DISTINCT_COUNT_SQL = """
SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_distinct_customers,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderstatus
"""


def approx_count_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approximate distinct — the 100 TB path for cardinality
    (single pass, fixed memory).

    The raw estimate is engine-specific (HLL register layouts differ), so
    it cannot be value-hashed across engines.  Instead the output carries
    the EXACT count plus a Spark-side boolean asserting the sketch landed
    within 10 sigma of it (rsd=0.02 -> |err| <= 20 % with probability
    ~1-1e-23): the oracle recomputes the exact column and expects the flag
    TRUE, so a broken sketch flips the hash red.  Production uses just the
    sketch aggregate; the exact column here is the verification harness.
    """
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("_approx"),
        F.countDistinct("o_custkey").alias("n_distinct_exact"),
    )
    rel_err = F.abs(F.col("_approx") - F.col("n_distinct_exact")) / F.col(
        "n_distinct_exact"
    )
    return agg.select(
        "o_orderstatus", "n_distinct_exact", (rel_err <= 0.20).alias("sketch_within_20pct")
    )


APPROX_DISTINCT_SQL = """
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_distinct_exact,
       TRUE AS sketch_within_20pct
FROM orders GROUP BY o_orderstatus
"""


#: percentile_approx's guarantee is RANK error <= 1/accuracy.
_APPROX_PCT_ACCURACY = 10_000
_APPROX_PCT_QS = (0.25, 0.5, 0.75, 0.99)


def approx_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-style single-pass sketch) — the 100 TB path
    for quantiles; the exact sort-based counterpart is percentiles_exact.

    The sketch value itself is engine-specific, so the hashable output is
    the EXACT quantile plus a RANK check flag: the sketch's value must have
    rank interval [count(<v)+1, count(<=v)] overlapping q*n within
    5/accuracy + 2/n ranks (percentile_approx guarantees rank error <=
    1/accuracy; the slack absorbs boundary rounding).  Rank comparison —
    not a value band — keeps the check exact under ties and gaps between
    order statistics.  The oracle recomputes the exact quantiles and
    expects every flag TRUE, so a broken sketch flips the hash red.

    Plan shape: sketch+exact aggregate (3 rows) broadcast-joined back to
    the fact for the rank counts — the verification pass costs one extra
    scan; production uses just the first aggregate (single pass, one
    shared sketch buffer for all four quantiles).
    """
    orders = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("double")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for q in _APPROX_PCT_QS:
        tag = f"q{int(q * 100)}"
        aggs += [
            F.percentile_approx(price, q, _APPROX_PCT_ACCURACY).alias(f"_{tag}_sketch"),
            F.percentile(price, F.lit(q)).cast("double").alias(f"{tag}_exact"),
        ]
    sk = orders.groupBy("o_orderstatus").agg(*aggs)
    j = orders.select("o_orderstatus", price.alias("_price")).join(
        F.broadcast(sk), "o_orderstatus"
    )
    counts = [
        F.first(c).alias(c)
        for c in sk.columns
        if c != "o_orderstatus"
    ] + [
        agg
        for q in _APPROX_PCT_QS
        for tag in [f"q{int(q * 100)}"]
        for agg in (
            F.sum((F.col("_price") < F.col(f"_{tag}_sketch")).cast("long")).alias(f"_{tag}_lt"),
            F.sum((F.col("_price") <= F.col(f"_{tag}_sketch")).cast("long")).alias(f"_{tag}_le"),
        )
    ]
    agg2 = j.groupBy("o_orderstatus").agg(*counts)
    n = F.col("_n").cast("double")
    eps = F.lit(5.0 / _APPROX_PCT_ACCURACY) + F.lit(2.0) / n
    cols = [F.col("o_orderstatus")]
    for q in _APPROX_PCT_QS:
        tag = f"q{int(q * 100)}"
        lo_ok = F.col(f"_{tag}_le").cast("double") >= (F.lit(q) - eps) * n
        hi_ok = (F.col(f"_{tag}_lt").cast("double") + F.lit(1.0)) <= (F.lit(q) + eps) * n + F.lit(1.0)
        cols += [F.col(f"{tag}_exact"), (lo_ok & hi_ok).alias(f"{tag}_sketch_ok")]
    return agg2.select(*cols)


APPROX_PCT_SQL = """
SELECT o_orderstatus,
       CAST(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.25) AS DOUBLE) AS q25_exact,
       TRUE AS q25_sketch_ok,
       CAST(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) AS DOUBLE) AS q50_exact,
       TRUE AS q50_sketch_ok,
       CAST(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.75) AS DOUBLE) AS q75_exact,
       TRUE AS q75_sketch_ok,
       CAST(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.99) AS DOUBLE) AS q99_exact,
       TRUE AS q99_sketch_ok
FROM orders GROUP BY o_orderstatus
"""


def join_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join: distinct part names within edit distance 3.

    The blocking discipline is the scale story: ``levenshtein(a,b) >=
    abs(len(a)-len(b))``, so a cheap length-band predicate
    (``abs(len diff) <= 3``) is a LOSSLESS pre-filter the join can apply
    before the quadratic comparator — the same blocking shape (bands /
    first-letter / q-gram buckets) production entity-resolution uses to
    keep fuzzy joins sub-quadratic.  The comparator runs on DISTINCT
    values (O(d^2) worst case, d << rows), never on the raw table.
    """
    p = load_table(spark, sf_dir, "part").select("p_name").distinct()
    a, b = p.alias("a"), p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_name") < F.col("b.p_name"))
            & (
                F.abs(F.length(F.col("a.p_name")) - F.length(F.col("b.p_name"))) <= 3
            )
            & (F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 3),
        )
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).cast("bigint").alias("edit_dist"),
        )
    )


def er_resolve_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution END-TO-END: blocking -> pairwise match ->
    transitive clustering -> canonicalization, the full dedupe-a-dirty-
    dimension pipeline composed from machinery that is each separately
    oracle-checked.

    Stages: (1) distinct names with a stable numeric id (min p_partkey);
    (2) the length-band-blocked levenshtein match (the
    ``join_fuzzy_name_pairs`` shape — lossless blocking keeps the
    comparator sub-quadratic); (3) ``connected_components`` min-label
    clustering, because matches CHAIN (a~b, b~c without a~c) and pair-
    level survivorship over-merges or over-splits; (4) survivorship: the
    canonical name is the smallest-id member (deterministic, and exactly
    the component label).  Output: one row per multi-name entity."""
    from realtime_change_data_capture_streaming_spark.llm_ops.dedup import connected_components

    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    names = p.groupBy("p_name").agg(F.min("p_partkey").alias("nid"))
    a, b = names.alias("a"), names.alias("b")
    pairs = a.join(
        b,
        (F.col("a.p_name") < F.col("b.p_name"))
        & (F.abs(F.length(F.col("a.p_name")) - F.length(F.col("b.p_name"))) <= 3)
        & (F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 3),
    ).select(F.col("a.nid").alias("na"), F.col("b.nid").alias("nb"))
    comp = connected_components(pairs, "na", "nb")
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).cast("bigint").alias("n_names"))
    canon = names.select(F.col("nid").alias("component"), F.col("p_name").alias("canonical_name"))
    return sizes.join(canon, "component").select(
        F.col("component").cast("bigint").alias("component"), "n_names", "canonical_name"
    )


ER_RESOLVE_SQL = """
WITH RECURSIVE names AS (
  SELECT p_name, MIN(p_partkey) AS nid FROM part GROUP BY 1
), pairs AS (
  SELECT a.nid AS na, b.nid AS nb
  FROM names a JOIN names b
    ON a.p_name < b.p_name
   AND ABS(LENGTH(a.p_name) - LENGTH(b.p_name)) <= 3
   AND levenshtein(a.p_name, b.p_name) <= 3
), edges AS (
  SELECT na AS src, nb AS dst FROM pairs
  UNION ALL
  SELECT nb AS src, na AS dst FROM pairs
), reach(node, r) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges) t
  UNION
  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r
), comp AS (
  SELECT node, MIN(r) AS component FROM reach GROUP BY 1
), agg AS (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS n_names FROM comp GROUP BY 1
)
SELECT CAST(g.component AS BIGINT) AS component, g.n_names, n.p_name AS canonical_name
FROM agg g JOIN names n ON n.nid = g.component
"""


JOIN_FUZZY_SQL = """
WITH t AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
FROM t a JOIN t b
  ON a.p_name < b.p_name
 AND ABS(LENGTH(a.p_name) - LENGTH(b.p_name)) <= 3
 AND levenshtein(a.p_name, b.p_name) <= 3
"""


QUERIES = {
    "join_fuzzy_name_pairs": join_fuzzy_name_pairs,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_outer_counts": join_outer_counts,
    "join_full_outer_nations": join_full_outer_nations,
    "join_range_theta": join_range_theta,
    "window_topk_per_group": window_topk_per_group,
    "join_bloom_prefiltered_revenue": join_bloom_prefiltered_revenue,
    "orders_pareto_front": orders_pareto_front,
    "er_resolve_part_names": er_resolve_part_names,
    "window_rank_dense_ntile": window_rank_dense_ntile,
    "window_percentile_positions": window_percentile_positions,
    "window_lag_lead": window_lag_lead,
    "window_running_sum": window_running_sum,
    "sort_topn_global": sort_topn_global,
    "set_ops_nations": set_ops_nations,
    "set_ops_all_variants": set_ops_all_variants,
    "window_range_frame": window_range_frame,
    "percentiles_exact": percentiles_exact,
    "distinct_count_exact": distinct_count_exact,
    "approx_count_distinct_hll": approx_count_distinct_hll,
    "approx_percentile_prices": approx_percentile_prices,
}

ORACLE = {
    "join_fuzzy_name_pairs": JOIN_FUZZY_SQL,
    "join_semi": JOIN_SEMI_SQL,
    "join_anti": JOIN_ANTI_SQL,
    "join_outer_counts": JOIN_OUTER_SQL,
    "join_full_outer_nations": JOIN_FULL_OUTER_SQL,
    "join_range_theta": JOIN_RANGE_SQL,
    "window_topk_per_group": WINDOW_TOPK_SQL,
    "join_bloom_prefiltered_revenue": JOIN_BLOOM_SQL,
    "orders_pareto_front": PARETO_SQL,
    "er_resolve_part_names": ER_RESOLVE_SQL,
    "window_rank_dense_ntile": WINDOW_RANK_SQL,
    "window_percentile_positions": WINDOW_PERCENTILE_SQL,
    "window_lag_lead": WINDOW_LAG_SQL,
    "window_running_sum": WINDOW_RUNNING_SQL,
    "sort_topn_global": SORT_TOPN_SQL,
    "set_ops_nations": SET_OPS_SQL,
    "set_ops_all_variants": SET_OPS_ALL_SQL,
    "window_range_frame": WINDOW_RANGE_SQL,
    "percentiles_exact": PERCENTILES_SQL,
    "distinct_count_exact": DISTINCT_COUNT_SQL,
    # sketch queries: the estimate itself is engine-specific, but the
    # output is (exact value, sketch-in-bounds flag) — hash-checkable.
    "approx_count_distinct_hll": APPROX_DISTINCT_SQL,
    "approx_percentile_prices": APPROX_PCT_SQL,
}
