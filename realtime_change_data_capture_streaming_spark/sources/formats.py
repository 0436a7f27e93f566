"""File-format connectors: parquet / ORC / CSV / JSON round-trips.

The reference's only storage formats are Postgres rows and Kafka JSON
(``/root/reference/transaction_producer.py:44-48``); an engine replacing
it needs the standard lake formats too.  All four are Spark built-in
DataSource V1/V2 readers — pushdown and pruning come for free on parquet
and ORC; CSV/JSON are schema-on-read with explicit StructTypes (never
inferSchema in production: it triggers an extra full scan).

Avro is Spark-built-in-but-external (spark-avro jar); this container
doesn't ship it, so the JVM reader is probed and joins the matrix only
when present — but the Avro CAPABILITY no longer degrades: ``pyavro``
(the dependency-free OCF codec + Python DataSource in
``sources/avro_ocf.py``) is always in the matrix.

Scale notes (100 TB):
- Round-trip queries here are correctness probes on a small dim table.
  Real ingest goes through the same two functions with a target dir on
  object storage; writer parallelism = input partitioning (no coalesce).
- CSV/JSON scans are line-splittable; ORC/parquet splits respect
  ``spark.sql.files.maxPartitionBytes``.  Timestamps round-trip through
  CSV via an explicit ISO-micros pattern, not the locale default.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.operators._util import dsum
from realtime_change_data_capture_streaming_spark.sources.tables import load_table

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def write_format(df: DataFrame, path: str, fmt: str) -> None:
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true").option("timestampFormat", _TS_FMT)
    elif fmt == "json":
        w = w.option("timestampFormat", _TS_FMT)
    w.save(path)


def read_format(spark: SparkSession, path: str, fmt: str, schema) -> DataFrame:
    r = spark.read.format(fmt).schema(schema)
    if fmt == "csv":
        r = r.option("header", "true").option("timestampFormat", _TS_FMT)
    elif fmt == "json":
        r = r.option("timestampFormat", _TS_FMT)
    return r.load(path)


def _avro_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.spark.sql.avro.functions  # noqa: B018
        df = spark.range(1)
        with tempfile.TemporaryDirectory() as d:
            df.write.format("avro").mode("overwrite").save(os.path.join(d, "probe"))
        return True
    except Exception:
        return False


def roundtrip_formats(spark: SparkSession, sf_dir: str, table: str = "orders") -> DataFrame:
    """Write ``table`` to each available format, read it back, and reduce
    each copy to the same fingerprint row.  Any encode/decode loss (CSV
    timestamp truncation, JSON number widening, ORC decimal mapping)
    shows up as a fingerprint mismatch against the parquet original —
    which is exactly what the DuckDB oracle computes."""
    from realtime_change_data_capture_streaming_spark.sources import avro_ocf

    avro_ocf.register(spark)
    src = load_table(spark, sf_dir, table)
    # pyavro is the dependency-free Avro OCF DataSource (sources/avro_ocf.py)
    # — always present, closing the jar-gated gap; the JVM spark-avro
    # reader still joins the matrix when its jar exists
    fmts = ["parquet", "orc", "csv", "json", "pyavro"]
    if _avro_available(spark):
        fmts.append("avro")
    root = os.path.join(tempfile.gettempdir(), "spark_graft_formats", table)
    out: DataFrame | None = None
    for fmt in fmts:
        path = os.path.join(root, fmt)
        write_format(src, path, fmt)
        back = read_format(spark, path, fmt, src.schema)
        fp = back.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(F.col("o_orderkey")).alias("n_keys"),
            dsum("o_totalprice").alias("sum_total"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("max_date"),
        ).select(F.lit(fmt).alias("fmt"), "n_rows", "n_keys", "sum_total", "max_date")
        out = fp if out is None else out.unionByName(fp)
    return out


ROUNDTRIP_SQL = """
WITH fp AS (
  SELECT COUNT(*) AS n_rows,
         COUNT(DISTINCT o_orderkey) AS n_keys,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
         strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_date
  FROM orders
)
SELECT f.fmt, fp.n_rows, fp.n_keys, fp.sum_total, fp.max_date
FROM (VALUES ('parquet'), ('orc'), ('csv'), ('json'), ('pyavro')) f(fmt), fp
"""


def format_roundtrip_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = roundtrip_formats(spark, sf_dir, "orders")
    # oracle enumerates the always-present formats; drop the gated extras
    return df.filter(F.col("fmt").isin("parquet", "orc", "csv", "json", "pyavro"))


QUERIES = {"format_roundtrip_counts": format_roundtrip_counts}
ORACLE = {"format_roundtrip_counts": ROUNDTRIP_SQL}
