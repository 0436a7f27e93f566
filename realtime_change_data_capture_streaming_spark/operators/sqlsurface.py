"""Spark 4 SQL-surface features: recursive CTEs and LATERAL subqueries.

Both are new/advanced SQL entry points a reference user would expect from
an ANSI engine; both run through ``spark.sql`` over temp views of the
fixture tables so the declared plan is pure SQL (Catalyst plans the
recursion as UnionLoop and the lateral as a correlated join).

Scale notes: the recursion below is a per-row ancestor walk over a
synthesized key forest — frontier size is rows x remaining-depth and
strictly shrinks (anc DIV 10), so UNION ALL recursion is safe (no cycle,
no fan-out).  Transitive-closure-style recursions over dense graphs
belong to the dedicated operators (``llm_ops/dedup.py`` connected
components, ``operators/graph.py`` PageRank), which bound the state
per iteration instead of accumulating paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from realtime_change_data_capture_streaming_spark.sources.tables import load_table


def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE ancestor walk over the key forest parent(k) = k DIV
    10: per customer, the path length to the root and the ancestor count —
    the org-chart/BOM traversal shape."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        WITH RECURSIVE walk(custkey, anc, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM customer_v
          UNION ALL
          SELECT custkey, anc DIV 10, depth + 1 FROM walk WHERE anc > 0
        )
        SELECT custkey, CAST(MAX(depth) AS BIGINT) AS depth_to_root,
               COUNT(*) AS n_ancestors
        FROM walk GROUP BY custkey
        """
    )


SQL_RECURSIVE_SQL = """
WITH RECURSIVE walk(custkey, anc, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer
  UNION ALL
  SELECT custkey, anc // 10, depth + 1 FROM walk WHERE anc > 0
)
SELECT custkey, CAST(MAX(depth) AS BIGINT) AS depth_to_root,
       COUNT(*) AS n_ancestors
FROM walk GROUP BY custkey
"""


def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: per nation, the top-2 customers by
    account balance — the SQL spelling of per-group top-k (the DataFrame
    spelling is ``window_topk_per_group``)."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT n.n_name, l.c_custkey, CAST(l.c_acctbal AS DOUBLE) AS acctbal
        FROM nation_v n,
        LATERAL (
          SELECT c_custkey, c_acctbal FROM customer_v c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) l
        """
    )


SQL_LATERAL_SQL = """
SELECT n.n_name, l.c_custkey, CAST(l.c_acctbal AS DOUBLE) AS acctbal
FROM nation n,
LATERAL (
  SELECT c_custkey, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
) l
"""


QUERIES = {
    "sql_recursive_hierarchy": sql_recursive_hierarchy,
    "sql_lateral_topn": sql_lateral_topn,
}

ORACLE = {
    "sql_recursive_hierarchy": SQL_RECURSIVE_SQL,
    "sql_lateral_topn": SQL_LATERAL_SQL,
}
