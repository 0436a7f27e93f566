"""Physical-plan introspection (scale-guard utilities)."""

from realtime_change_data_capture_streaming_spark.plans.introspect import (  # noqa: F401
    executed_plan,
    plan_counts,
    has_pushed_filters,
    assert_no_cartesian,
    broadcast_join_count,
    shuffle_count,
)
