"""Structured Streaming surface: windowed aggs, stateful dedup,
stream-stream joins, CDC apply-changes wiring (cdc.apply_changes)."""

from realtime_change_data_capture_streaming_spark.cdc import materialized
from realtime_change_data_capture_streaming_spark.streaming import (
    ann_maintain,
    bm25_maintain,
    cdc_stream,
    cusum,
    hybrid_serve,
    joins,
    neardup,
    semantic,
    sketches,
    stateful,
    transform_state,
    windows,
)

_MODULES = (windows, joins, neardup, sketches, cdc_stream, stateful, transform_state, materialized, semantic, ann_maintain, cusum, bm25_maintain, hybrid_serve)


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles():
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLE)
    return out
