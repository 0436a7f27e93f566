"""Z-order layout: prove the clustering property the operator exists for.

A file layout is Z-ordered so that a scan filtered on ANY interleaved
dimension touches few files (min/max file stats prune the rest).  The
recipe (layout.py docstring): bucket each dimension to its QUANTILE RANK
first — raw values interleave badly when dims have unequal bit widths or
skew (events: user_id spans 8 bits, cents 16 bits and heavily skewed, so
a raw-dim interleave is dominated by cents' high bits).  With both dims
ntile'd to dense 8-bit ranks, a box covering 1/16 of the space lives in
~1/16 of the files, and each single dimension still clusters alone.

(ntile here is a global window — fine for a layout-rewrite job at test
scale; a 100 TB rewrite computes approximate quantile boundaries once and
maps per-row against the broadcast boundaries, same output shape.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from realtime_change_data_capture_streaming_spark.plans.layout import zorder_value
from realtime_change_data_capture_streaming_spark.sources.tables import load_table

N_FILES = 16


def _files_touched(spark, path, predicate):
    df = spark.read.parquet(path).filter(predicate)
    return df.select(F.input_file_name()).distinct().count()


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    wu = Window.orderBy("user_id", "event_id")
    wc = Window.orderBy("cents", "event_id")
    bucketed = ev.select(
        "event_id",
        (F.ntile(256).over(wu) - 1).alias("user_bucket"),
        (F.ntile(256).over(wc) - 1).alias("cents_bucket"),
    )
    z = bucketed.withColumn(
        "zvalue", zorder_value(F.col("user_bucket"), F.col("cents_bucket"), bits=8)
    )
    zpath, rpath = str(base / "zordered"), str(base / "random")
    # range-partition on the Morton key = the clustered rewrite; each of
    # the N output files covers one z-range (a tile of the 2-D space)
    z.repartitionByRange(N_FILES, "zvalue").write.parquet(zpath)
    # control: same rows, hash-shuffled = no clustering at all
    z.repartition(N_FILES, "event_id").write.parquet(rpath)
    return zpath, rpath


def test_zorder_box_query_touches_few_files(spark, layouts):
    zpath, rpath = layouts
    box = (F.col("user_bucket") < 64) & (F.col("cents_bucket") < 64)
    touched_z = _files_touched(spark, zpath, box)
    touched_r = _files_touched(spark, rpath, box)
    # the box holds 1/16 of the rows; z-clustering confines them to the
    # low-z prefix (both dims' top two bucket bits zero -> z < 2^12)
    # while the hash layout smears them over essentially all files
    assert touched_r >= N_FILES * 3 // 4, (touched_z, touched_r)
    assert touched_z <= 2, (touched_z, touched_r)


def test_hive_partition_pruning(spark, sf_dir, tmp_path):
    """Static partition pruning: a filter on the partition column must
    become PartitionFilters (directory-level pruning — the scan never
    lists the other partitions' files), not a row-level post-filter."""
    o = load_table(spark, sf_dir, "orders")
    p = str(tmp_path / "orders_by_status")
    o.write.partitionBy("o_orderstatus").parquet(p)
    df = spark.read.parquet(p).filter(F.col("o_orderstatus") == "F")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters", 1)[1][:200], plan[:2000]
    files = [r[0] for r in df.select(F.input_file_name()).distinct().collect()]
    assert files and all("o_orderstatus=F" in f for f in files), files[:3]


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """Dynamic partition pruning: when the partition key is only
    constrained THROUGH a join with a filtered dimension, Spark must
    inject a runtime subquery filter into the fact scan — at 100 TB this
    is the difference between scanning one partition and all of them."""
    o = load_table(spark, sf_dir, "orders")
    p = str(tmp_path / "orders_by_year")
    o.withColumn("o_year", F.year("o_orderdate")).write.partitionBy("o_year").parquet(p)
    fact = spark.read.parquet(p)
    years = sorted(r[0] for r in fact.select("o_year").distinct().collect())
    dim = (
        spark.range(len(years))
        .select((F.col("id") + years[0]).alias("dim_year"))
        .filter(F.col("dim_year") == years[0])
    )
    j = fact.join(dim, fact.o_year == dim.dim_year).select("o_orderkey", "o_year")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower(), plan[:2000]
    assert all(r["o_year"] == years[0] for r in j.select("o_year").distinct().collect())


def test_zorder_single_dim_also_clusters(spark, layouts):
    """The selling point over a single-column sort: EACH interleaved dim
    alone still clusters (a cents-bucket prefix zeroes alternating high
    z-bits, confining matches to ~1/4 of the z-range)."""
    zpath, rpath = layouts
    for dim in ("cents_bucket", "user_bucket"):
        pred = F.col(dim) < 64
        touched_z = _files_touched(spark, zpath, pred)
        touched_r = _files_touched(spark, rpath, pred)
        assert touched_r >= N_FILES * 3 // 4, (dim, touched_z, touched_r)
        assert touched_z <= N_FILES // 2, (dim, touched_z, touched_r)
