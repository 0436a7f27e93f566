"""RocksDB state store backend — the 100 TB streaming-state path.

The streaming operators' docstrings claim the scale knobs are "config,
not code"; this proves it: the same windowed aggregation and streaming
dedup run unchanged on RocksDBStateStoreProvider (disk-backed, bounded
heap) and produce results identical to the default HDFS-backed provider.
"""

from __future__ import annotations

import pytest

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
CONF = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def rocksdb_state(spark):
    prev = spark.conf.get(CONF, None)
    spark.conf.set(CONF, ROCKSDB)
    yield
    if prev is None:
        spark.conf.unset(CONF)
    else:
        spark.conf.set(CONF, prev)


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_windowed_agg_identical_on_rocksdb(spark, sf_dir, rocksdb_state):
    from realtime_change_data_capture_streaming_spark.streaming.windows import stream_tumbling_hourly

    got = stream_tumbling_hourly(spark, sf_dir)
    plan = got.sparkSession.conf.get(CONF)
    assert plan == ROCKSDB  # the query above ran under the RocksDB provider
    want_cols = ("win_start", "event_type", "n_events", "sum_value")
    rocks = _rows(got, want_cols)
    spark.conf.unset(CONF)
    default = _rows(stream_tumbling_hourly(spark, sf_dir), want_cols)
    assert rocks == default and len(rocks) > 0


def test_streaming_dedup_identical_on_rocksdb(spark, sf_dir, rocksdb_state):
    from realtime_change_data_capture_streaming_spark.streaming.windows import stream_dedup_documents

    rocks = _rows(stream_dedup_documents(spark, sf_dir), ("lang", "n_unique_docs"))
    spark.conf.unset(CONF)
    default = _rows(stream_dedup_documents(spark, sf_dir), ("lang", "n_unique_docs"))
    assert rocks == default and len(rocks) > 0
