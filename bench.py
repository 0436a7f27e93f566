#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the noop sink (full computation, no
driver collect).  The set spans the engine's surface: scan-agg, star
joins, windows, sessionization, text/dedup/similarity ops, and a real
Structured Streaming window aggregation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from realtime_change_data_capture_streaming_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q9_profit_by_nation_year",
    "q13_order_count_distribution",
    "q19_disjunctive",
    "q21_suppliers_kept_waiting",
    "join_range_theta",
    "window_topk_per_group",
    "events_sessionization",
    "text_token_stats",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "layout_zorder_topk",
    "curation_pack_shards",
    "curation_contamination_overlap",
    "udf_grouped_median",
    "stream_tumbling_hourly",
    "stream_cdc_merge",
    "stream_cdc_incremental_agg",
)


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="spark-graft-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    # warm the JVM/IO path once with a trivial action, and the Python-UDF
    # worker pool + noop sink classes so the first pandas-UDF query is not
    # charged their one-time startup
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(s):
        return s * 1.0

    _force(spark.range(1000).select(_warm(F.col("id").cast("double"))))
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        # isolate queries from each other: a previous query's leftover
        # cached blocks/broadcasts are not part of THIS query's cost
        spark.catalog.clearCache()
        # every query runs twice and reports the min: local wall-clock
        # noise is ±20-100% (shared host) and the first execution pays
        # one-time JIT/codegen-cache costs that are not the query's
        # steady-state cost.  A fixed "rerun only if fast" threshold is a
        # cliff: a query drifting past it gets charged its cold run.
        t = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _force(qs[name](spark, SF_DIR))
            t = min(t, time.perf_counter() - t0)
        timings[name] = round(t, 3)
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else None
    print(
        json.dumps(
            {
                "metric": "headline-suite wall time",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
