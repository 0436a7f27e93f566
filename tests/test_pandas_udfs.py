"""Pins for the pandas/Arrow UDF surface beyond the oracle parity runs —
cases the sf0.01 driver fixture cannot produce."""

from __future__ import annotations

import pandas as pd
import pytest


def test_cogroup_one_sided_users(spark):
    """Regression (r11 full-corpus sweep at sf0.1): Spark 4.1's cogroup
    serializer delivers a row-less side as a KEY-ONLY frame (payload
    columns absent, len() echoing the other side), which crashed the
    conversion UDF with KeyError('ts') the first time a views-only user
    appeared.  Build a feed with a views-only user, a purchases-only
    user, and a mixed user; the UDF must emit all three with the exact
    closed-form stats."""
    from realtime_change_data_capture_streaming_spark.functions.pandas_udfs import udf_cogrouped_conversion
    import realtime_change_data_capture_streaming_spark.functions.pandas_udfs as mod
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [
            (1, "view", "2024-01-01 10:00:00"),
            (1, "view", "2024-01-01 11:00:00"),   # user 1: views only
            (2, "purchase", "2024-01-01 12:00:00"),  # user 2: purchases only
            (3, "view", "2024-01-01 09:00:00"),
            (3, "purchase", "2024-01-01 10:00:00"),
            (3, "view", "2024-01-01 11:00:00"),   # user 3: one view before
        ],
        "user_id bigint, event_type string, ts string",
    ).select("user_id", "event_type", F.to_timestamp("ts").alias("ts"))

    import unittest.mock as um

    with um.patch.object(mod, "load_table", lambda spark, sf, t: ev):
        rows = {
            r["user_id"]: (r["n_views"], r["n_purchases"], r["views_before_first_purchase"])
            for r in udf_cogrouped_conversion(spark, "ignored").collect()
        }
    assert rows == {1: (2, 0, 0), 2: (0, 1, 0), 3: (2, 1, 1)}
