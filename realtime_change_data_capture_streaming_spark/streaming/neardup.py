"""Streaming near-duplicate ADMISSION against a persisted LSH index.

The production ingestion shape for LLM corpora: the historical corpus's
MinHash band buckets are a persisted index table; every incoming
micro-batch computes its own buckets and probes the index, flagging
documents that collide with history BEFORE they enter the corpus.  This
is the streaming composition of the batch LSH tier (llm_ops/dedup.py) —
same md5-portable signatures, so the whole admission decision is
oracle-checked.

Shingling needs lead() windows (unsupported on unbounded streams), so the
per-batch work runs inside ``foreachBatch`` — the standard pattern for
batch-only logic over micro-batches; flagged rows append to a result dir
(the real deployment would append to the index as well).

At 100 TB: the index is bucketed by (band, bucket) and the probe join is
an equi-join keyed on it — incoming-batch-sized, never corpus-sized; the
index grows by exactly the admitted documents' buckets.
"""

from __future__ import annotations

import os
import tempfile

from realtime_change_data_capture_streaming_spark.session import scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.llm_ops.dedup import MINHASH_LSH_SQL, minhash_band_buckets
from realtime_change_data_capture_streaming_spark.sources.tables import load_table

#: corpus split: doc_id < threshold is the indexed history, the rest stream in
HISTORY_MAX_DOC_ID = 250


def _history_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per machine per sf) the history band-bucket index —
    deterministic (md5-derived), so the cached artifact is identical on
    every rebuild."""
    from realtime_change_data_capture_streaming_spark.sources.tables import fixture_fingerprint

    key = fixture_fingerprint(sf_dir, "documents")
    root = os.path.join(tempfile.gettempdir(), f"spark_graft_lshidx_{key}")
    if not os.path.exists(os.path.join(root, "_SUCCESS")):
        hist = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < HISTORY_MAX_DOC_ID
        )
        minhash_band_buckets(hist).select("doc_id", "band", "bucket").write.mode(
            "overwrite"
        ).parquet(root)
    return root


def stream_neardup_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streamed documents (doc_id >= HISTORY_MAX_DOC_ID) probed against the
    history index: one row per incoming document that shares any band
    bucket with history, with the count of distinct colliding history
    docs."""
    idx = _history_index_dir(spark, sf_dir)
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    out_dir = scratch_dir(prefix="neardup_out_")
    hist = spark.read.parquet(idx).select(
        "band", "bucket", F.col("doc_id").alias("hist_doc")
    )

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        incoming = batch_df.filter(F.col("doc_id") >= HISTORY_MAX_DOC_ID)
        probes = minhash_band_buckets(incoming).select("doc_id", "band", "bucket")
        flagged = (
            probes.join(hist, ["band", "bucket"])
            .groupBy("doc_id")
            .agg(F.countDistinct("hist_doc").alias("n_history_candidates"))
        )
        # per-batch-id subdir + overwrite, not append: foreachBatch is
        # at-least-once, and a re-delivered batch must replace its own
        # prior output instead of appending a duplicate copy
        flagged.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={batch_id}"))

    q = (
        stream.writeStream.foreachBatch(_admit)
        .option("checkpointLocation", scratch_dir(prefix="neardup_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "availableNow stream did not drain in 600s"
    return spark.read.parquet(out_dir).drop("batch")


def _admission_sql() -> str:
    # reuse the oracle's signature/banding CTE chain, replace the pair join
    # with the history-probe admission join
    chain = MINHASH_LSH_SQL[: MINHASH_LSH_SQL.index(", pairs AS (")]
    return f"""{chain}
SELECT i.doc_id, COUNT(DISTINCT h.doc_id) AS n_history_candidates
FROM banded i JOIN banded h
  ON i.band = h.band AND i.bucket = h.bucket
 AND i.doc_id >= {HISTORY_MAX_DOC_ID} AND h.doc_id < {HISTORY_MAX_DOC_ID}
GROUP BY i.doc_id
"""


QUERIES = {"stream_neardup_admission": stream_neardup_admission}
ORACLE = {"stream_neardup_admission": _admission_sql()}
