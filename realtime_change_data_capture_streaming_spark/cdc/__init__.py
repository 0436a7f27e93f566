"""CDC surface: envelope parse/decode, audit stamping, change diffs,
apply-changes (SURVEY.md sections 2.2-2.4)."""

from realtime_change_data_capture_streaming_spark.cdc.decode import decode_amount, parse_envelope  # noqa: F401
from realtime_change_data_capture_streaming_spark.cdc.encode import encode_amount  # noqa: F401
from realtime_change_data_capture_streaming_spark.cdc.diff import audit_stamp, change_diff  # noqa: F401
from realtime_change_data_capture_streaming_spark.cdc.apply_changes import apply_changes_batch, apply_changes_stream  # noqa: F401
