"""The Python UDF surface (SURVEY.md section 2.5), done the fast way:
Arrow-batched pandas UDFs — scalar, grouped-aggregate, and grouped-map
(applyInPandas).  Row-at-a-time Python UDFs are deliberately absent from
the engine's hot paths; these exist for semantics Spark built-ins cannot
express (custom per-group models, exotic reductions).

Oracle discipline: UDF bodies stick to order-insensitive / sort-first
computations (median, exact int arithmetic, per-element string transforms)
so DuckDB reproduces them bit-for-bit.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from realtime_change_data_capture_streaming_spark.sources.tables import load_table


@F.pandas_udf(T.StringType())
def normalize_name(s: pd.Series) -> pd.Series:
    """Scalar pandas UDF: vectorized string normalization (Arrow in/out)."""
    return s.str.lower().str.replace(r"[^a-z0-9]+", "_", regex=True).str.strip("_")


@F.pandas_udf(T.DoubleType())
def median_agg(v: pd.Series) -> float:
    """Grouped-agg pandas UDF: exact median (sorts internally, so the
    result is independent of Arrow batch arrival order)."""
    return float(v.median())


@F.pandas_udf(T.LongType())
def count_agg(v: pd.Series) -> int:
    """Grouped-agg pandas UDF count — pandas aggregate UDFs cannot mix
    with built-in aggregates in one agg(), so counts come from pandas too."""
    return int(len(v))


def udf_scalar_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        normalize_name(F.col("p_type")).alias("type_norm"),
        normalize_name(F.col("p_brand")).alias("brand_norm"),
    )


def udf_scalar_iter_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR_ITER pandas UDF: Iterator[Series] -> Iterator[Series] — the
    variant for per-worker one-time setup (model load, dictionary mmap)
    amortized across Arrow batches instead of paid per batch.  The "model"
    here is a deterministic byte-weight table; the per-row computation is
    an exact integer checksum so the oracle replays it."""

    @F.pandas_udf(T.LongType())
    def weighted_checksum(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        weights = [(i * 31 + 7) % 97 for i in range(256)]  # one-time setup
        for s in batches:
            yield s.map(
                lambda t: sum(weights[b] for b in t.encode("utf-8")) if t is not None else None
            ).astype("Int64")

    p = load_table(spark, sf_dir, "part")
    return p.select("p_partkey", weighted_checksum(F.col("p_name")).alias("name_checksum"))


# p_name is pure ASCII in the fixtures (verified: octet_length == length
# for every row), so utf-8 bytes == code points and ascii(ch) replays the
# Python byte iteration exactly.
UDF_SCALAR_ITER_SQL = """
SELECT p_partkey, CAST(SUM((ascii(ch) * 31 + 7) % 97) AS BIGINT) AS name_checksum
FROM (SELECT p_partkey, UNNEST(string_split(p_name, '')) AS ch FROM part)
GROUP BY p_partkey
"""


UDF_SCALAR_SQL = """
SELECT p_partkey,
       trim(regexp_replace(lower(p_type), '[^a-z0-9]+', '_', 'g'), '_') AS type_norm,
       trim(regexp_replace(lower(p_brand), '[^a-z0-9]+', '_', 'g'), '_') AS brand_norm
FROM part
"""


def udf_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        median_agg(F.col("o_totalprice")).alias("median_price"),
        count_agg(F.col("o_totalprice")).alias("n_orders"),
    )


UDF_GROUPED_SQL = """
SELECT o_orderpriority,
       CAST(MEDIAN(CAST(o_totalprice AS DOUBLE)) AS DOUBLE) AS median_price,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""

_SEGMENT_STATS_SCHEMA = T.StructType(
    [
        T.StructField("c_mktsegment", T.StringType()),
        T.StructField("n_customers", T.LongType()),
        T.StructField("bal_min", T.DoubleType()),
        T.StructField("bal_median", T.DoubleType()),
        T.StructField("bal_max", T.DoubleType()),
        T.StructField("top_customer", T.LongType()),
    ]
)


def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map (applyInPandas): per-segment stats computed in pandas.
    The group is sorted inside the worker, so output is arrival-order
    independent — the required discipline for ANY grouped-map UDF, since
    Spark guarantees nothing about intra-group row order."""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["c_acctbal", "c_custkey"], ascending=[False, True])
        return pd.DataFrame(
            {
                "c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
                "n_customers": [len(pdf)],
                "bal_min": [float(pdf["c_acctbal"].min())],
                "bal_median": [float(pdf["c_acctbal"].median())],
                "bal_max": [float(pdf["c_acctbal"].max())],
                "top_customer": [int(pdf["c_custkey"].iloc[0])],
            }
        )

    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").applyInPandas(stats, schema=_SEGMENT_STATS_SCHEMA)


UDF_APPLY_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(MIN(c_acctbal) AS DOUBLE) AS bal_min,
       CAST(MEDIAN(CAST(c_acctbal AS DOUBLE)) AS DOUBLE) AS bal_median,
       CAST(MAX(c_acctbal) AS DOUBLE) AS bal_max,
       (SELECT c2.c_custkey FROM customer c2 WHERE c2.c_mktsegment = c.c_mktsegment
        ORDER BY c2.c_acctbal DESC, c2.c_custkey ASC LIMIT 1) AS top_customer
FROM customer c GROUP BY c_mktsegment
"""


def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas (UDTF-ish): flag outlier orders per Arrow batch; 1 row
    in -> 0..1 rows out (the filter-in-python shape; real use: model
    scoring)."""

    def flag(batches):
        for pdf in batches:
            out = pdf[pdf["o_totalprice"] > 400000.0]
            if len(out):
                yield out[["o_orderkey", "o_custkey", "o_totalprice"]]

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    return o.mapInPandas(flag, schema="o_orderkey long, o_custkey long, o_totalprice double")


UDF_MAP_SQL = """
SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders WHERE o_totalprice > 400000.0
"""


def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy batch path — pyarrow RecordBatches in and
    out, no pandas materialization.  The right shape when the Python work
    is itself Arrow-native (tokenizers, Arrow-backed model featurizers):
    skipping the pandas conversion halves the per-batch overhead.  Here:
    per-row char counts via pyarrow.compute, one batch in -> one out."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def lengths(batches):
        for batch in batches:
            doc_id = batch.column("doc_id")
            n_chars = pc.cast(pc.utf8_length(batch.column("text")), pa.int64())
            yield pa.RecordBatch.from_arrays([doc_id, n_chars], ["doc_id", "n_chars_arrow"])

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(lengths, schema="doc_id long, n_chars_arrow long")


UDF_ARROW_SQL = """
SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars_arrow FROM documents
"""


def udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map over Arrow (applyInArrow): per-language doc stats
    computed with pyarrow.compute on the whole group's Arrow table — the
    zero-pandas counterpart of udf_apply_in_pandas, right when the group
    work is itself Arrow-native.  Aggregations used (count/sum/min) are
    order-independent, so the result is arrival-order stable."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(table: pa.Table) -> pa.Table:
        n_chars = pc.utf8_length(table.column("text"))
        return pa.table(
            {
                "lang": [table.column("lang")[0].as_py()],
                "n_docs": [table.num_rows],
                "total_chars": [pc.sum(n_chars).as_py()],
                "min_doc_id": [pc.min(table.column("doc_id")).as_py()],
            }
        )

    d = load_table(spark, sf_dir, "documents").select("lang", "doc_id", "text")
    return d.groupBy("lang").applyInArrow(
        stats, schema="lang string, n_docs long, total_chars long, min_doc_id long"
    )


UDF_APPLY_ARROW_SQL = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
       MIN(doc_id) AS min_doc_id
FROM documents GROUP BY lang
"""


def udf_cogrouped_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped map (groupBy().cogroup().applyInPandas): the two-table
    grouped UDF — each user's views and purchases arrive as TWO aligned
    pandas frames in one worker call, the shape for per-key model joins
    (feature frame + label frame) that a single-table grouped map cannot
    express.  Computes per-user conversion stats; both frames are sorted
    in-worker so the result is arrival-order independent.

    Empty-side contract (found by the r11 full-corpus sweep at sf0.1,
    where users with views but zero purchases first appear): Spark 4.1's
    cogroup serializer delivers the row-less side as a KEY-ONLY frame —
    ``user_id`` present, payload columns ABSENT, and len() echoing the
    other side's row count — so ``len()`` alone misreads it as data.
    Each side is therefore normalized first: a frame missing its payload
    columns IS the empty group."""

    def side(df: pd.DataFrame) -> pd.DataFrame:
        if "ts" in df.columns:
            return df
        return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                             "ts": pd.Series([], dtype="object")})

    def conv(views: pd.DataFrame, purchases: pd.DataFrame) -> pd.DataFrame:
        uid = (
            views["user_id"].iloc[0]
            if "ts" in views.columns and len(views)
            else purchases["user_id"].iloc[0]
        )
        views, purchases = side(views), side(purchases)
        n_v, n_p = len(views), len(purchases)
        first_p = purchases["ts"].min() if n_p else None
        views_before = int((views["ts"] < first_p).sum()) if n_p and n_v else 0
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_views": [n_v],
                "n_purchases": [n_p],
                "views_before_first_purchase": [views_before],
            }
        )

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    return (
        views.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            conv,
            schema="user_id long, n_views long, n_purchases long, "
            "views_before_first_purchase long",
        )
    )


UDF_COGROUP_SQL = """
WITH v AS (
  SELECT user_id, ts FROM events WHERE event_type = 'view'
), p AS (
  SELECT user_id, MIN(ts) AS first_p, COUNT(*) AS n_p
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), users AS (
  SELECT user_id FROM v UNION SELECT user_id FROM p
)
SELECT u.user_id,
       CAST(COALESCE((SELECT COUNT(*) FROM v WHERE v.user_id = u.user_id), 0) AS BIGINT) AS n_views,
       CAST(COALESCE(p.n_p, 0) AS BIGINT) AS n_purchases,
       CAST(COALESCE((SELECT COUNT(*) FROM v WHERE v.user_id = u.user_id AND v.ts < p.first_p), 0) AS BIGINT)
         AS views_before_first_purchase
FROM users u LEFT JOIN p ON p.user_id = u.user_id
"""


QUERIES = {
    "udf_scalar_normalize": udf_scalar_normalize,
    "udf_scalar_iter_checksum": udf_scalar_iter_checksum,
    "udf_cogrouped_conversion": udf_cogrouped_conversion,
    "udf_grouped_median": udf_grouped_median,
    "udf_apply_in_pandas": udf_apply_in_pandas,
    "udf_map_in_pandas": udf_map_in_pandas,
    "udf_map_in_arrow": udf_map_in_arrow,
    "udf_apply_in_arrow": udf_apply_in_arrow,
}

ORACLE = {
    "udf_scalar_normalize": UDF_SCALAR_SQL,
    "udf_scalar_iter_checksum": UDF_SCALAR_ITER_SQL,
    "udf_cogrouped_conversion": UDF_COGROUP_SQL,
    "udf_grouped_median": UDF_GROUPED_SQL,
    "udf_apply_in_pandas": UDF_APPLY_SQL,
    "udf_map_in_pandas": UDF_MAP_SQL,
    "udf_map_in_arrow": UDF_ARROW_SQL,
    "udf_apply_in_arrow": UDF_APPLY_ARROW_SQL,
}
