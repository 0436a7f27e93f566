"""Scalar function library coverage (SURVEY.md section 2.5)."""

from realtime_change_data_capture_streaming_spark.functions import pandas_udfs, scalar, udtfs

_MODULES = (scalar, pandas_udfs, udtfs)


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
