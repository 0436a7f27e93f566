"""Streaming SEMANTIC-dedup admission against a persisted cluster index.

The SemDeDup composition of ``neardup.stream_neardup_admission``: the
historical corpus's embeddings are k-means-clustered ONCE (the batch
tier's trainer, ``llm_ops.dedup._sem_fit_centroids``) and persisted as
(centroids, per-cluster vector index); every incoming micro-batch then
embeds its documents, assigns them to the persisted centroids (broadcast
— model state), and probes ONLY the matching clusters for cosine >= tau
history neighbors — the admission decision lands BEFORE the document
enters the corpus, and the probe join is batch-sized x cluster-local,
never corpus-wide.

At 100 TB: the index is laid out by cluster (here: a partitioned
parquet; production: bucketed), centroids are k x 128 doubles of
broadcast model state, and per-batch work is linear in the batch with a
cluster-equi-join fan-in of ~|cluster| ~ _SEM_TARGET docs per incoming
document — the same linear-candidate-volume argument as the batch tier.

Correctness: per-document decisions depend only on the FIXED history
index, so the streaming run must EQUAL the batch closed form on any
batch split (pinned), and the closed form replays in DuckDB (same
shingle hashing, same fixed-point k-means on the history split, same
fold shapes).  Like the neardup tier, admitted documents do not extend
the index within a run (the real deployment appends their buckets).

Registered in the r11 window via ``streaming.__init__._MODULES``;
the oracle is additionally pinned by tests/test_sketches.py's local
DuckDB mirror on every pytest run.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.llm_ops.dedup import (
    _SEM_K,
    _SEM_TARGET,
    _SEM_TAU,
    _sem_assign,
    _sem_fit_centroids,
    _semantic_vectors_of,
)
from realtime_change_data_capture_streaming_spark.operators._util import fp_encode_sql, fp_mean_sql
from realtime_change_data_capture_streaming_spark.session import drain, scratch_dir
from realtime_change_data_capture_streaming_spark.sources.tables import load_table
from realtime_change_data_capture_streaming_spark.streaming.neardup import HISTORY_MAX_DOC_ID


def _semantic_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per machine per sf) the history SEMANTIC index:
    k-means centroids fitted on the history split plus every history
    vector labeled with its final cluster, laid out by cluster.
    Deterministic (md5 shingle buckets + fixed-point k-means), so the
    cached artifact is identical on every rebuild."""
    from realtime_change_data_capture_streaming_spark.sources.tables import build_once, fixture_fingerprint

    key = fixture_fingerprint(sf_dir, "documents")
    root = os.path.join(tempfile.gettempdir(), f"spark_graft_semidx_{key}")

    def _build(tmp: str) -> None:
        hist = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < HISTORY_MAX_DOC_ID
        )
        v = _semantic_vectors_of(hist.select("doc_id", "text")).persist()
        n_hist = v.count()
        k = max(_SEM_K, n_hist // _SEM_TARGET)
        cents = _sem_fit_centroids(spark, v, k)
        cents.write.mode("overwrite").parquet(os.path.join(tmp, "centroids"))
        _sem_assign(v, cents).write.mode("overwrite").partitionBy("cluster").parquet(
            os.path.join(tmp, "index")
        )
        v.unpersist()

    return build_once(root, _build)


def _probe(incoming_vectors: DataFrame, cents: DataFrame, index: DataFrame) -> DataFrame:
    """Assign incoming vectors to the persisted centroids and flag
    cosine >= tau collisions with same-cluster history docs: one row per
    flagged incoming doc with the collision count and the smallest
    (deterministic) witness."""
    assigned = _sem_assign(incoming_vectors, cents)
    cos = F.aggregate(
        F.zip_with("vec", "hvec", lambda x, y: x * y), F.lit(0.0), lambda acc, z: acc + z
    )
    hits = (
        assigned.join(
            index.select(
                "cluster", F.col("doc_id").alias("witness_id"), F.col("vec").alias("hvec")
            ),
            "cluster",
        )
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= F.lit(_SEM_TAU))
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_history_candidates"),
            F.min_by(F.struct("witness_id", "cosine"), F.col("witness_id")).alias("w"),
        )
        .select(
            "doc_id",
            "n_history_candidates",
            F.col("w.witness_id").alias("witness_id"),
            F.col("w.cosine").alias("cosine"),
        )
    )


def semantic_admission_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch closed form: every incoming doc probed at once — the
    reference result the streaming run must reproduce exactly."""
    root = _semantic_index_dir(spark, sf_dir)
    cents = spark.read.parquet(os.path.join(root, "centroids"))
    index = spark.read.parquet(os.path.join(root, "index"))
    incoming = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") >= HISTORY_MAX_DOC_ID
    )
    return _probe(_semantic_vectors_of(incoming.select("doc_id", "text")), cents, index)


def stream_semantic_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-batched admission: incoming documents stream in, each batch
    embeds + assigns + probes inside ``foreachBatch`` (embedding needs
    lead() shingle windows — batch-only logic over micro-batches, the
    ``stream_neardup_admission`` pattern)."""
    root = _semantic_index_dir(spark, sf_dir)
    cents = spark.read.parquet(os.path.join(root, "centroids"))
    index = spark.read.parquet(os.path.join(root, "index"))
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    out_dir = scratch_dir(prefix="semadm_out_")

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        incoming = batch_df.filter(F.col("doc_id") >= HISTORY_MAX_DOC_ID)
        flagged = _probe(
            _semantic_vectors_of(incoming.select("doc_id", "text")), cents, index
        )
        # per-batch-id subdir + overwrite: foreachBatch is at-least-once,
        # and a re-delivered batch must replace its own prior output
        flagged.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={batch_id}"))

    q = (
        stream.writeStream.foreachBatch(_admit)
        .option("checkpointLocation", scratch_dir(prefix="semadm_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    return spark.read.parquet(out_dir).drop("batch")


def _admission_sql() -> str:
    """DuckDB replay of the closed form: history-split vectors, the
    SEMANTIC_DEDUP_SQL k-means shapes (k = _SEM_K — the adaptive
    formula's value for the <=512-doc parity fixtures), final history
    assignment as the index, incoming assignment + cluster-local
    probe."""
    from realtime_change_data_capture_streaming_spark.llm_ops.curation import _bucket_sql
    from realtime_change_data_capture_streaming_spark.llm_ops.dedup import _SEM_DIM, _SEM_FP

    dist = (
        "list_sum(list_transform(list_zip(e.vec, c.centroid), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )

    def assign(cents: str, src: str, name: str) -> str:
        return f"""{name} AS (
  SELECT doc_id, vec, cluster FROM (
    SELECT e.doc_id, e.vec, c.cluster,
           ROW_NUMBER() OVER (PARTITION BY e.doc_id ORDER BY {dist} ASC, c.cluster ASC) AS rk
    FROM {src} e CROSS JOIN {cents} c
  ) WHERE rk = 1
)"""

    def update(assigned: str, name: str) -> str:
        return f"""{name} AS (
  SELECT cluster, list(m ORDER BY dim) AS centroid FROM (
    SELECT cluster, dim, {fp_mean_sql(_SEM_FP)} AS m
    FROM (SELECT a.cluster, t.i AS dim, {fp_encode_sql('a.vec[t.i]', _SEM_FP)} AS iv
          FROM {assigned} a, UNNEST(range(1, {_SEM_DIM} + 1)) AS t(i)) GROUP BY 1, 2
  ) GROUP BY cluster
)"""

    cos = "list_sum(list_transform(list_zip(i.vec, h.vec), p -> p[1] * p[2]))"
    return f"""
WITH sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2] AS shingle FROM (
    SELECT doc_id, list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '') AS tl
    FROM documents
  ), UNNEST(range(1, len(tl) - 3 + 2)) AS t(i)
), counts AS (
  SELECT doc_id, {_bucket_sql("shingle", _SEM_DIM)} AS b, COUNT(*) AS c
  FROM sh GROUP BY 1, 2
), raw AS (
  SELECT d.doc_id, list(CAST(COALESCE(c.c, 0) AS DOUBLE) ORDER BY t.i) AS rv
  FROM (SELECT DISTINCT doc_id FROM counts) d
  CROSS JOIN UNNEST(range(0, {_SEM_DIM})) AS t(i)
  LEFT JOIN counts c ON c.doc_id = d.doc_id AND c.b = t.i
  GROUP BY d.doc_id
), v AS MATERIALIZED (
  SELECT doc_id, list_transform(rv, x -> x / SQRT(list_sum(list_transform(rv, y -> y * y)))) AS vec
  FROM raw
), hist AS MATERIALIZED (
  SELECT * FROM v WHERE doc_id < {HISTORY_MAX_DOC_ID}
), inc AS (
  SELECT * FROM v WHERE doc_id >= {HISTORY_MAX_DOC_ID}
), cents0 AS (
  SELECT doc_id AS cluster, vec AS centroid FROM (SELECT * FROM hist ORDER BY doc_id LIMIT {_SEM_K})
), {assign("cents0", "hist", "assign0")}
, {update("assign0", "cents1")}
, {assign("cents1", "hist", "assign1")}
, {update("assign1", "cents2")}
, {assign("cents2", "hist", "hidx")}
, {assign("cents2", "inc", "iassign")}
, hits AS (
  SELECT i.doc_id, h.doc_id AS witness_id, {cos} AS cosine
  FROM iassign i JOIN hidx h ON i.cluster = h.cluster
  WHERE {cos} >= {_SEM_TAU}
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_history_candidates,
       MIN(witness_id) AS witness_id,
       MIN_BY(cosine, witness_id) AS cosine
FROM hits GROUP BY 1
"""


#: staged for r11 registration (see module docstring) — NOT yet wired
#: into streaming.__init__._MODULES
QUERIES = {"stream_semantic_admission": stream_semantic_admission}
ORACLE = {"stream_semantic_admission": _admission_sql()}
