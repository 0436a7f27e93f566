"""PySpark-native CDC streaming + analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference CDC pipeline (AmalDhouib/Realtime-Change-Data-Capture-Streaming):

- CDC surface: Debezium-style change-event parsing (3 decimal modes),
  effectively-once apply-changes (at-least-once transport x key dedup),
  audit stamping, per-column change diffs.
- Analytics surface: joins / aggregations / window functions / sort-top-k /
  set ops / scalar function library over Catalyst-optimized DataFrames.
- Streaming surface: Structured Streaming sources/sinks, watermarks,
  tumbling/sliding/session windows, stateful dedup, foreachBatch merge.
- LLM-data ops: exact + MinHash/SimHash/Jaccard dedup, embedding
  similarity search, multimodal column plumbing, text analysis.

Everything compiles to vanilla DataFrame ops so Catalyst/AQE/Tungsten do
the heavy lifting; Python UDFs appear only as Arrow-batched pandas UDFs
where built-ins cannot express the semantics.
"""

from realtime_change_data_capture_streaming_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
