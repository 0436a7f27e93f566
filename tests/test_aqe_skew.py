"""AQE runtime skew-join split — the no-code-change half of the skew
story (manual salting is `operators/skew.py::skew_salted_agg`).

A hot key that concentrates ~90% of a join's probe side into one shuffle
partition must be split by AdaptiveSparkPlan at runtime: the final plan
carries SortMergeJoin(skew=true) with a skewed AQEShuffleRead, and the
join result is unchanged.  Thresholds are lowered to make the toy input
register as skewed; at 100 TB the defaults (256 MB advisory, factor 5)
do the same thing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def skew_confs(spark):
    prev = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in prev.items():
        spark.conf.set(k, v) if v is not None else spark.conf.unset(k)


def test_aqe_splits_skewed_join_partition(spark, skew_confs):
    fact = spark.range(50_000).select(F.lit(0).alias("k"), F.col("id").alias("v")).union(
        spark.range(4_950).select((F.col("id") % 99 + 1).alias("k"), F.col("id").alias("v"))
    )
    dim = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    j = fact.join(dim, "k").select("k", "v", "w")
    rows = j.toPandas()  # executes; AQE finalizes the plan
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, "AQE must mark the skewed join"
    assert "skewed" in plan.split("AQEShuffleRead", 1)[1].lower() if "AQEShuffleRead" in plan else False
    # correctness unchanged: every fact row finds its dim match
    assert len(rows) == 54_950
    assert int(rows[rows.k == 0].w.iloc[0]) == 0
