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
    "dedup_substring_spans",
    "ann_cosine_topk",
    "embedding_quantize_int8",
    "ann_pq_adc_topk",
    # build-once/serve-many split: rep 1 may pay the one-time index build,
    # min-of-reps reports the steady-state search cost (the production shape)
    "ann_pq_persisted_topk",
    "ann_ivfpq_persisted_topk",
    "ann_matryoshka_serve_topk",
    "text_bm25_persisted_topk",
    "text_bigram_lm_score",
    "orders_pareto_front",
    "sketch_countmin_user_counts",
    "layout_zorder_topk",
    "curation_pack_shards",
    "curation_contamination_overlap",
    "feature_hashing_counts",
    "udf_grouped_median",
    "multimodal_features",
    "fn_variant",
    "graph_pagerank_purchases",
    "events_gapfill_locf",
    "events_ewma_value",
    "events_time_weighted_avg",
    "sketch_hll_users",
    "join_interval_overlap_daily",
    "stream_tumbling_hourly",
    "stream_topk_terms",
    "stream_left_outer_attribution",
    "stream_cdc_merge",
    "stream_cdc_incremental_agg",
    # round-8 additions: the DBLog incremental snapshot (chunk/stream
    # dedup through latest-wins), the chained-stateful streaming as-of
    # (interval join -> event-time-keyed max), and the linear
    # quality-classifier inference (hashed features, codegen-only)
    "cdc_incremental_snapshot",
    "stream_asof_enrich",
    "quality_logit_scores",
    # round-9 additions: SemDeDup embedding-cluster dedup (normalized
    # hashed-shingle vectors -> fixed-point k-means -> intra-cluster
    # cosine pairs), and real-MJPEG scene cuts (marker-walk demux +
    # mixed 4:4:4/4:2:0 JPEG decode per frame)
    "dedup_semantic_clusters",
    "multimodal_mjpeg_scene_cuts",
    # ... and WebP-lossless (VP8L) decode: all four transforms, color
    # cache, LZ77, meta-prefix groups cycled across fixture variants
    "multimodal_webp_lossless_features",
    # ... and FLAC decode: fixed/LPC predictors, Rice/Rice2/escape
    # residuals, all four stereo assignments, CRC-verified frames
    "multimodal_flac_features",
    # late round-9 additions: the two-sample Kolmogorov-Smirnov test
    # (two-pass range-partitioned exact ECDF prefix sums), and scene
    # cuts over a real RIFF-AVI container (hdrl/movi/idx1 walk wrapping
    # the MJPEG elementary stream)
    "events_ks_test_value",
    "multimodal_avi_scene_cuts",
    # round-11 additions: streaming semantic admission (broadcast-centroid
    # micro-batch probe against a persisted history index), and IMA/MS
    # ADPCM WAV decode features
    "stream_semantic_admission",
    "multimodal_adpcm_features",
    # ... and CCNet-style perplexity bucketing under the TRAINED unigram
    # LM (per-run EM + one broadcast-join scoring pass + lang windows)
    "quality_perplexity_buckets",
    # ... and baseline-TIFF decode features (strips/PackBits/LZW/predictor)
    "multimodal_tiff_features",
    # round-12 additions: streaming ANN index ingestion (frozen-quantizer
    # encode + replay-guarded cluster-mapped append; rep 1 may pay the
    # one-time history-fit, min-of-reps is the steady state), and the
    # bucketed sink's point-lookup serving tier (bucket-pruned PK GET)
    "stream_ann_index_append",
    "cdc_point_lookup",
    # ... and the two-sided CUSUM changepoint monitor (closed-form Page
    # statistic: three window functions over one partition sort) plus its
    # streaming tier (exact cross-batch prefix state, day-keyed store)
    "events_cusum_changepoint",
    "stream_cusum_monitor",
    # round-13 addition: hybrid lexical+vector retrieval (BM25 + cosine
    # fused by RRF; two bounded shortlists, one shortlist-sized join)
    "hybrid_lexical_vector_topk",
)


#: queries whose plan is a driver-side iteration over many short Spark
#: jobs — cold-start (JIT of the loop body, page cache) spans their first
#: TWO runs, so they report min-of-3 like streaming queries do
_ITERATIVE_QUERIES = frozenset({"graph_pagerank_purchases", "dedup_semantic_clusters"})


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
    # Warm the Structured Streaming machinery (StreamExecution, state-store
    # provider, file-stream source, memory sink, checkpoint I/O classes):
    # the first streaming query of a session otherwise pays 0.5-1 s of
    # one-time class loading that is not any query's steady-state cost —
    # this was the dominant term in the round-3 stream_tumbling_hourly
    # regression (1.29 -> 1.97 s with an unchanged aggregation plan).
    import tempfile
    import uuid

    warm_dir = tempfile.mkdtemp(prefix="bench_warm_src_")
    spark.range(10).withColumn("ts", F.current_timestamp()).write.mode("overwrite").parquet(warm_dir)
    wq = (
        spark.readStream.schema("id long, ts timestamp")
        .parquet(warm_dir)
        .groupBy("id")
        .count()
        .writeStream.format("memory")
        .queryName(f"warm_{uuid.uuid4().hex[:8]}")
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="bench_warm_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    wq.awaitTermination(120)
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        # isolate queries from each other: a previous query's leftover
        # cached blocks/broadcasts are not part of THIS query's cost
        spark.catalog.clearCache()
        # every query runs twice (streaming queries three times) and
        # reports the min: local wall-clock noise is ±20-100% (shared
        # host) and the first execution pays one-time JIT/codegen-cache
        # costs that are not the query's steady-state cost.  Streaming
        # queries get an extra rep because each run also pays
        # checkpoint-dir setup + micro-batch scheduling, the noisiest
        # component observed across same-code runs.  A fixed "rerun only
        # if fast" threshold is a cliff: a query drifting past it gets
        # charged its cold run.  Iterative queries (many short stages,
        # loop-carried persists) ALSO get a third rep: their first run is
        # dominated by page-cache + JIT warm-up of the whole loop body
        # (graph_pagerank_purchases measured 5.8 s cold vs 2.1-2.9 s
        # steady-state, r9 audit) and rep 2 still pays stragglers of it.
        t = float("inf")
        reps = 3 if name.startswith("stream_") or name in _ITERATIVE_QUERIES else 2
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _force(qs[name](spark, SF_DIR))
            t = min(t, time.perf_counter() - t0)
        timings[name] = round(t, 2)
    # Streaming CDC throughput (BASELINE.md floor: >=10k events/s through
    # parse -> dedup -> merge; the reference producer tops out ~2 msg/s).
    # Same pipeline as tests/test_throughput.py, recorded here so the
    # measured rate is tracked round-over-round instead of pass/fail.
    from realtime_change_data_capture_streaming_spark.cdc import apply_changes_batch, parse_envelope
    from realtime_change_data_capture_streaming_spark.sources import synthetic_change_events

    # shed whatever the last queries left persisted (KS per-value table,
    # semantic-dedup vectors): the throughput number should measure the
    # pipeline, not leftover cache pressure from an ever-growing suite —
    # measured 13% drag at 50 queries (r9 back-to-back audit)
    spark.catalog.clearCache()
    n_keys = 30_000
    events = synthetic_change_events(spark, n_keys, updates_per_key=2, seed=11)
    _force(events)  # generation warm, excluded from the measured window
    rate = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        apply_changes_batch(parse_envelope(events, decimal_mode="string")).write.format(
            "noop"
        ).mode("overwrite").save()
        rate = max(rate, (n_keys * 3) / (time.perf_counter() - t0))

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else None
    # ONE compact line: the driver records a bounded stdout tail, and at
    # r9/r10 the line outgrew it (BENCH_r10.json "parsed": null, first
    # key clipped).  2-decimal times, no prose — host-drift history and
    # per-round caveats live in BASELINE.md, not here.
    print(
        json.dumps(
            {
                "metric": "headline-suite wall time",
                "value": round(sum(timings.values()), 2),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "throughput": {"parse_dedup_merge_events_per_s": round(rate)},
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
