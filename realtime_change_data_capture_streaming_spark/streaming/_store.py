"""Shared manifest-driven read for bucket-mapped versioned stores.

``cdc/commit.py`` owns the manifest/GC semantics but is deliberately
Spark-free; this is the one Spark-side reader for stores whose manifest
``buckets`` map keys partition ids to version dirs (the ANN appended-code
store, the CUSUM state store).  Optionally path-prunes to an id subset —
reads touch only the partitions asked for, in whichever version dir each
one is currently served from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from realtime_change_data_capture_streaming_spark.cdc import commit as table_commit


def read_partitioned_store(
    spark: SparkSession,
    store: str,
    partition_col: str,
    schema: str,
    ids: list | None = None,
) -> DataFrame:
    """Rows of the live store snapshot, cast to ``schema`` (a DDL string
    whose column order is the output order), pruned at the PATH level to
    ``ids`` when given (the same ``basePath`` + explicit-dirs idiom as the
    sink's ``read_raw``)."""
    from pyspark.sql import functions as F

    m = table_commit.read_manifest(store)
    if not m:
        return spark.createDataFrame([], schema)
    want = {int(k) for k in ids} if ids is not None else None
    # Spark's own DDL parser, not string-splitting: parameterized types
    # (decimal(18,2), map<...>) contain commas/spaces a naive split mangles
    col_types = [
        (f.name, f.dataType) for f in spark.createDataFrame([], schema).schema.fields
    ]
    parts = []
    for vdir, served in table_commit.bucket_paths(store, m).items():
        sel = served if want is None else [k for k in served if k in want]
        if not sel:
            continue
        paths = [f"{vdir}/{partition_col}={k}" for k in sel]
        parts.append(
            spark.read.option("basePath", vdir)
            .parquet(*paths)
            .select(*[F.col(c).cast(t).alias(c) for c, t in col_types])
        )
    if not parts:
        return spark.createDataFrame([], schema)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
