"""Pins for the distributed exact ntile (equi-depth histogram): equality
to the reference single-window form, NTILE edge semantics, and the plan
guarantee that no corpus-scale single-partition window remains."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.operators.stats import (
    _N_BUCKETS,
    exact_ntile,
    orders_equidepth_histogram,
)
from realtime_change_data_capture_streaming_spark.plans.introspect import (
    unbounded_global_windows,
)

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


def test_equidepth_histogram_equals_single_window_form(spark):
    """The two-pass distributed ntile is a plan optimization, never a
    semantics change: row-identical to ntile() over one global window."""
    from realtime_change_data_capture_streaming_spark.operators._util import dsum
    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    got = [tuple(r) for r in orders_equidepth_histogram(spark, SF_DIR).orderBy("bucket").collect()]
    o = load_table(spark, SF_DIR, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    ref = (
        o.select("o_orderkey", "o_totalprice", F.ntile(_N_BUCKETS).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
            dsum("o_totalprice").alias("sum_total"),
        )
        .select(
            F.col("bucket").cast("bigint").alias("bucket"), "n_orders", "lo", "hi", "sum_total"
        )
        .orderBy("bucket")
    )
    assert got == [tuple(r) for r in ref.collect()]


@pytest.mark.parametrize(
    "n,buckets",
    [(1, 8), (7, 8), (8, 8), (9, 8), (100, 8), (103, 7), (64, 3)],
)
def test_exact_ntile_matches_sql_ntile(spark, n, buckets):
    """Closed-form bucket assignment == SQL NTILE for uneven divisions,
    n < buckets, and heavy duplicate values (ties broken by key)."""
    rows = [(i, float((i * 7919) % 13)) for i in range(n)]  # many duplicate values
    df = spark.createDataFrame(rows, "k bigint, v double")
    got = {
        r["k"]: r["bucket"]
        for r in exact_ntile(df, "v", "k", buckets).collect()
    }
    w = Window.orderBy("v", "k")
    ref = {
        r["k"]: r["bucket"]
        for r in df.select("k", F.ntile(buckets).over(w).alias("bucket")).collect()
    }
    assert got == ref


def test_equidepth_plan_has_no_unbounded_global_window(spark):
    df = orders_equidepth_histogram(spark, "/root/testdata/sf0.001")
    assert unbounded_global_windows(df) == []


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_NTILE_ROWS = st.lists(
    st.integers(-50, 50),  # heavy duplicate values by design
    min_size=1,
    max_size=60,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=_NTILE_ROWS, buckets=st.integers(2, 9))
def test_exact_ntile_property_matches_reference(spark, vals, buckets):
    """Property form of the distributed ntile pin: for arbitrary value
    multisets (duplicates likely) and bucket counts, the two-pass rank +
    closed-form bucket equals the Python reference NTILE (sizes
    ceil-first, order (value, key))."""
    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k bigint, v double")
    got = {r["k"]: r["bucket"] for r in exact_ntile(df, "v", "k", buckets).collect()}
    order = [k for k, _ in sorted(rows, key=lambda t: (t[1], t[0]))]
    n = len(order)
    q, rem = divmod(n, buckets)
    expect = {}
    pos = 0
    for b in range(1, buckets + 1):
        size = q + (1 if b <= rem else 0)
        for _ in range(size):
            if pos < n:
                expect[order[pos]] = b
                pos += 1
    assert got == expect


def test_ks_test_matches_bruteforce_ecdf(spark):
    """events_ks_test_value equals the textbook two-sample KS computed
    by a brute-force Python ECDF sweep over the same cents-folded
    values — exact d_num, and ks_d/ks_stat to the emitted rounding."""
    import math

    from realtime_change_data_capture_streaming_spark.operators.stats import (
        events_ks_test_value,
    )

    got = events_ks_test_value(spark, SF_DIR).collect()[0]
    rows = (
        spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        .filter(F.col("event_type").isin("view", "purchase") & F.col("value").isNotNull())
        .select("event_type", "value")
        .collect()
    )
    s1 = sorted(math.floor(r["value"] * 100.0 + 0.5) for r in rows if r["event_type"] == "view")
    s2 = sorted(math.floor(r["value"] * 100.0 + 0.5) for r in rows if r["event_type"] != "view")
    n1, n2 = len(s1), len(s2)
    points = sorted(set(s1) | set(s2))
    import bisect

    d_num = max(
        abs(bisect.bisect_right(s1, v) * n2 - bisect.bisect_right(s2, v) * n1)
        for v in points
    )
    assert (got["n1"], got["n2"]) == (n1, n2)
    assert got["d_num"] == d_num
    ks_d = d_num / (float(n1) * float(n2))
    assert got["ks_d"] == pytest.approx(ks_d, abs=1e-6)
    assert got["ks_stat"] == pytest.approx(
        math.sqrt(n1 * n2 / (n1 + n2)) * ks_d, abs=1e-6
    )


def test_ks_test_plan_shape(spark):
    """The KS reduction keeps the two-pass discipline: every window is
    range-partitioned (no single-partition window over the per-value
    table), no Python evals, no cartesian join."""
    from realtime_change_data_capture_streaming_spark.operators.stats import (
        events_ks_test_value,
    )
    from realtime_change_data_capture_streaming_spark.plans.introspect import (
        unbounded_global_windows,
    )

    df = events_ks_test_value(spark, SF_DIR)
    assert unbounded_global_windows(df) == []
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BatchEvalPython" not in plan
