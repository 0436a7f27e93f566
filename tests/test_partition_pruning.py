"""Partition pruning on hive-partitioned layout — the other half of the
file-skipping story (Z-order/min-max pruning is tests/test_layout.py).

At 100 TB the events table is date/type-partitioned on object storage; a
filter on the partition column must prune DIRECTORIES at planning time
(PartitionFilters), not read-then-filter."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.plans.introspect import executed_plan
from realtime_change_data_capture_streaming_spark.sources.tables import load_table


def test_partition_filter_prunes_directories(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    root = str(tmp_path / "events_by_type")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(root)

    df = spark.read.parquet(root).filter(F.col("event_type") == "purchase")
    plan = executed_plan(df)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1].split("]")[0], (
        "partition-column filter must prune at planning time"
    )
    # the scan's file index only touches the one partition directory
    scanned = [
        line for line in plan.splitlines() if "Location" in line or "InMemoryFileIndex" in line
    ]
    assert scanned, plan
    # correctness: pruned read equals filtered full read
    want = ev.filter(F.col("event_type") == "purchase").count()
    assert df.count() == want and want > 0

    # non-partition filters on the same layout still push down to parquet
    df2 = spark.read.parquet(root).filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") > 100)
    )
    plan2 = executed_plan(df2)
    pushed = plan2.split("PushedFilters")[1].split("]")[0] if "PushedFilters" in plan2 else ""
    assert "user_id" in pushed, "row-group filter must reach the parquet reader"


def test_partitioned_write_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    root = str(tmp_path / "events_rt")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(root)
    back = spark.read.parquet(root)
    assert back.count() == ev.count()
    # partition dirs exist per distinct type
    types = {r["event_type"] for r in ev.select("event_type").distinct().collect()}
    dirs = {e.split("=", 1)[1] for e in os.listdir(root) if e.startswith("event_type=")}
    assert dirs == types
