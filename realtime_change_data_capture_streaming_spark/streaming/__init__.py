"""Structured Streaming surface: windowed aggs, stateful dedup,
stream-stream joins, CDC apply-changes wiring (cdc.apply_changes)."""

from realtime_change_data_capture_streaming_spark.streaming import windows

_MODULES = (windows,)


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
