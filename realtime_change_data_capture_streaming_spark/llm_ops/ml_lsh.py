"""Spark ML LSH estimators: the library path for approximate similarity.

Complements the hand-rolled sketches in dedup.py/similarity.py with the
built-in estimators (SURVEY.md section 2.5):

- ``MinHashLSH.approxSimilarityJoin`` over token-set vectors (Jaccard)
- ``BucketedRandomProjectionLSH`` over embeddings (Euclidean)

Both are seeded and deterministic for a given Spark build, but hash
families are engine-internal -> rows-only checks (the exact oracle for
near-dup semantics is dedup_ngram_jaccard / ann_cosine_topk).
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, CountVectorizer, MinHashLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.sources.tables import load_table


def ml_minhash_similarity_join(spark: SparkSession, sf_dir: str, threshold: float = 0.8) -> DataFrame:
    """Near-dup candidates via ML MinHashLSH over 3-gram shingle-presence
    vectors (same shingles as the exact dedup_ngram_jaccard tier — unigram
    sets are degenerate on a small-vocabulary corpus); returns pairs with
    Jaccard distance below the threshold."""
    from realtime_change_data_capture_streaming_spark.llm_ops.dedup import shingle_rows

    docs = (
        shingle_rows(load_table(spark, sf_dir, "documents"))
        .groupBy("doc_id")
        .agg(F.collect_list("shingle").alias("shs"))
    )
    cv = CountVectorizer(inputCol="shs", outputCol="features", binary=True, minDF=1.0)
    model = cv.fit(docs)
    feats = model.transform(docs).filter(F.expr("size(shs) > 0"))
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    mh_model = mh.fit(feats)
    pairs = mh_model.approxSimilarityJoin(feats, feats, threshold, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.col("jaccard_dist"),
        )
    )


def ml_brp_embedding_join(spark: SparkSession, sf_dir: str, threshold: float = 1.25) -> DataFrame:
    """Euclidean near-neighbor pairs via BucketedRandomProjectionLSH over
    the embeddings fixture."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=0.5, numHashTables=4, seed=42
    )
    model = brp.fit(e)
    pairs = model.approxSimilarityJoin(e, e, threshold, distCol="euclidean_dist")
    return (
        pairs.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
            F.col("euclidean_dist"),
        )
    )


QUERIES = {
    "ml_minhash_similarity_join": ml_minhash_similarity_join,
    "ml_brp_embedding_join": ml_brp_embedding_join,
}

ORACLE = {}  # engine-internal hash families -> rows-only
