"""Batch + streaming sources (SURVEY.md section 2.1)."""

from realtime_change_data_capture_streaming_spark.sources.tables import TABLES, load_table, load_tables, register_views  # noqa: F401
from realtime_change_data_capture_streaming_spark.sources.generator import synthetic_transactions, synthetic_change_events  # noqa: F401
