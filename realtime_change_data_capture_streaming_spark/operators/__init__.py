"""Batch analytics operators (SURVEY.md section 2.5).

Each module exposes ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
and ``ORACLE: dict[str, str]`` (DuckDB-runnable SQL producing identical
rows/columns).  ``__spark_entry__.py`` aggregates them for the driver.
"""

from realtime_change_data_capture_streaming_spark.operators import tpch, tpch2, relational, grouping, events, skew, asof, reshape, graph, stats, sqlsurface, quality  # noqa: F401

_MODULES = (asof, reshape, tpch, tpch2, relational, grouping, events, skew, graph, stats, sqlsurface, quality)


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
