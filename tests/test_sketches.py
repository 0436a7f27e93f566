"""Accuracy bounds for the sketch-based aggregates (rows-only at the
driver, so the accuracy-vs-exact contract is pinned here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.operators.relational import (
    approx_count_distinct_hll,
    approx_percentile_prices,
)
from realtime_change_data_capture_streaming_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_hll_within_rsd(spark):
    approx = {r["o_orderstatus"]: r["approx_customers"] for r in approx_count_distinct_hll(spark, SF_DIR).collect()}
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in load_table(spark, SF_DIR, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.1 * n), (k, approx[k], n)


def test_approx_percentile_within_rank_error(spark):
    """percentile_approx(accuracy=A) guarantees rank error <= n/A; with
    A=10k and n~1.5k the sketch is effectively exact — assert against the
    true quantiles computed by sorting."""
    approx_rows = approx_percentile_prices(spark, SF_DIR).collect()
    orders = load_table(spark, SF_DIR, "orders")
    for row in approx_rows:
        status = row["o_orderstatus"]
        vals = sorted(
            r["o_totalprice"]
            for r in orders.filter(F.col("o_orderstatus") == status).select("o_totalprice").collect()
        )
        n = len(vals)
        for q, got in zip(
            [0.25, 0.5, 0.75, 0.99],
            [row["q25"], row["q50"], row["q75"], row["q99"]],
        ):
            # allow one rank of slack around the nearest-rank quantile
            lo = vals[max(0, min(n - 1, int(q * n) - 1))]
            hi = vals[max(0, min(n - 1, int(q * n) + 1))]
            assert float(lo) <= float(got) <= float(hi), (status, q, got, lo, hi)
