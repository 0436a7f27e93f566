"""Quantitative pins for the ML-LSH pair (llm_ops/ml_lsh.py).

These two queries are rows-only in the driver by design (Spark ML's hash
families are engine-internal, not DuckDB-replayable), so this file carries
the local quantitative check instead (VERDICT r13 task 6): both estimators
are SEEDED, and their candidate-set recall against the EXACT join ground
truth at sf0.001 is pinned — plus the structural guarantee that
``approxSimilarityJoin``'s distance filter makes precision exact (every
returned pair really is under the threshold).

Measured at pin time (Spark 4.1, seed=42): MinHash recall 1.0 (28/28
pairs), BRP recall 0.972 (4897/5037 pairs), zero false positives each.
The bounds below leave headroom for hash-family drift across Spark
versions while still catching a broken candidate stage outright.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.llm_ops.dedup import shingle_rows
from realtime_change_data_capture_streaming_spark.llm_ops.ml_lsh import (
    ml_brp_embedding_join,
    ml_minhash_similarity_join,
)
from realtime_change_data_capture_streaming_spark.sources.tables import load_table

MINHASH_RECALL_FLOOR = 0.9
BRP_RECALL_FLOOR = 0.9


def test_ml_minhash_recall_vs_exact_jaccard(spark, sf_dir):
    """Candidate recall of MinHashLSH.approxSimilarityJoin vs the exact
    3-gram Jaccard join on the same shingle sets, plus exact precision
    (the threshold filter runs on the true distance)."""
    sh = (
        shingle_rows(load_table(spark, sf_dir, "documents"))
        .select("doc_id", "shingle")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    exact = (
        inter.join(sizes.selectExpr("doc_id as doc_a", "sz as sa"), "doc_a")
        .join(sizes.selectExpr("doc_id as doc_b", "sz as sb"), "doc_b")
        .withColumn(
            "jd", 1 - F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter"))
        )
        .filter(F.col("jd") < 0.8)
    )
    exact_pairs = {(r["doc_a"], r["doc_b"]) for r in exact.select("doc_a", "doc_b").collect()}
    got_pairs = {
        (r["doc_a"], r["doc_b"]) for r in ml_minhash_similarity_join(spark, sf_dir).collect()
    }
    assert exact_pairs, "fixture produced no near-dup ground truth"
    assert got_pairs <= exact_pairs, (
        f"false positives past the distance filter: {sorted(got_pairs - exact_pairs)[:5]}"
    )
    recall = len(got_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= MINHASH_RECALL_FLOOR, f"MinHash candidate recall {recall:.3f}"


def test_ml_brp_recall_vs_exact_euclidean(spark, sf_dir):
    """Candidate recall of BucketedRandomProjectionLSH vs the exact
    Euclidean threshold join over the embeddings fixture."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    l2 = F.sqrt(
        F.aggregate(
            F.zip_with("av", "bv", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    # exact all-pairs ground truth: test-only, bounded to the sf0.001
    # fixture (500 vectors); the production-scale path is the LSH join
    # under test
    exact = (
        e.selectExpr("vec_id as va", "v as av")
        .join(e.selectExpr("vec_id as vb", "v as bv"))
        .filter(F.col("va") < F.col("vb"))
        .withColumn("d", l2)
        .filter(F.col("d") < 1.25)
    )
    exact_pairs = {(r["va"], r["vb"]) for r in exact.select("va", "vb").collect()}
    got_pairs = {
        (r["vec_a"], r["vec_b"]) for r in ml_brp_embedding_join(spark, sf_dir).collect()
    }
    assert exact_pairs, "fixture produced no near-neighbor ground truth"
    assert got_pairs <= exact_pairs, (
        f"false positives past the distance filter: {sorted(got_pairs - exact_pairs)[:5]}"
    )
    recall = len(got_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= BRP_RECALL_FLOOR, f"BRP candidate recall {recall:.3f}"


def test_matryoshka_serve_recall_vs_full(spark, sf_dir):
    """Recall pin for the two-stage Matryoshka serving tier (VERDICT r14
    task 5): the prefix-shortlist + full-rerank top-10 must recover
    >= 0.9 of the exact full-dimension top-10, at the shortlist depth
    the prefix-overlap eval calibrated (L = 32k for the fixture's ~0.2
    measured overlap — see MRL_SHORTLIST).  Also pins the eval->depth
    relationship itself: a QUARTER-depth shortlist must recall strictly
    less, so the depth knob demonstrably buys recall."""
    from pyspark.sql import Window

    from realtime_change_data_capture_streaming_spark.llm_ops.similarity import (
        MRL_K,
        N_QUERY_VECS,
        ann_matryoshka_serve_topk,
        _dot,
        _norm,
    )
    from realtime_change_data_capture_streaming_spark.operators._util import spread
    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = e.filter(F.col("vec_id") >= N_QUERY_VECS).select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb")
    )
    # exact full-dim ground truth: test-only window over the sf0.001
    # fixture (the production path is the two-stage serve under test)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    full = (
        F.broadcast(q)
        .crossJoin(c)
        .select(
            "query_id",
            "cand_id",
            (_dot(F.col("q_emb"), F.col("c_emb")) / (_norm(F.col("q_emb")) * _norm(F.col("c_emb")))).alias("cos"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= MRL_K)
    )
    truth = {(r["query_id"], r["cand_id"]) for r in full.select("query_id", "cand_id").collect()}
    got = {
        (r["query_id"], r["cand_id"])
        for r in ann_matryoshka_serve_topk(spark, sf_dir).collect()
    }
    assert truth and len(truth) == N_QUERY_VECS * MRL_K
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"two-stage recall {recall:.3f} < 0.9"

    import realtime_change_data_capture_streaming_spark.llm_ops.similarity as sim

    orig = sim.MRL_SHORTLIST
    try:
        sim.MRL_SHORTLIST = orig // 4
        got_q = {
            (r["query_id"], r["cand_id"])
            for r in ann_matryoshka_serve_topk(spark, sf_dir).collect()
        }
    finally:
        sim.MRL_SHORTLIST = orig
    recall_q = len(got_q & truth) / len(truth)
    assert recall_q < recall, (
        f"quarter-depth shortlist recalled {recall_q:.3f} >= full-depth {recall:.3f} — "
        "the calibrated depth is not doing anything"
    )


def test_per_query_topk_nulls_rank_last_both_directions(spark):
    """r15 review pin: a NULL metric must sort LAST (the replaced
    windows' desc-NULLS-LAST behavior) in both the partial-heads window
    and the final sorted-slice aggregate — a plain asc sort on the
    negated key would have put NULLs FIRST and handed them top-k
    slots."""
    from realtime_change_data_capture_streaming_spark.llm_ops.similarity import _per_query_topk

    rows = [(1, 10, 0.9), (1, 11, None), (1, 12, 0.5), (1, 13, None), (1, 14, 0.7)]
    scored = spark.createDataFrame(rows, "query_id bigint, cand_id bigint, score double")
    got = sorted(
        (r["rk"], r["cand_id"], r["score"])
        for r in _per_query_topk(scored, 4, "score", ascending=False).collect()
    )
    assert got == [(1, 10, 0.9), (2, 14, 0.7), (3, 12, 0.5), (4, 11, None)], got
    got_asc = sorted(
        (r["rk"], r["cand_id"])
        for r in _per_query_topk(scored, 4, "score", ascending=True).collect()
    )
    assert got_asc == [(1, 12), (2, 14), (3, 10), (4, 11)], got_asc


def test_per_query_topk_second_fold_engages_at_wide_shuffle_and_is_invisible(spark):
    """r15: past _FOLD_WIDTH*8 shuffle partitions the distributed top-k
    adds a constant-width second partial fold (capping the final
    aggregate state at _FOLD_WIDTH*k per query); the fold must be
    value-invisible and must actually be IN the wide-width plan."""
    from realtime_change_data_capture_streaming_spark.llm_ops.similarity import _FOLD_WIDTH, _per_query_topk
    from realtime_change_data_capture_streaming_spark.plans.introspect import executed_plan

    rows = [(q, c, float((q * 31 + c * 17) % 97)) for q in (1, 2) for c in range(100, 160)]
    scored = spark.createDataFrame(rows, "query_id bigint, cand_id bigint, score double")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(_FOLD_WIDTH * 8))
        narrow = sorted(tuple(r) for r in _per_query_topk(scored, 5, "score", False).collect())
        narrow_plan = executed_plan(_per_query_topk(scored, 5, "score", False))
        spark.conf.set("spark.sql.shuffle.partitions", str(_FOLD_WIDTH * 8 + 1))
        wide_df = _per_query_topk(scored, 5, "score", False)
        wide = sorted(tuple(r) for r in wide_df.collect())
        wide_plan = executed_plan(wide_df)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert wide == narrow, "the second fold changed values"
    assert wide_plan.count("Window") > narrow_plan.count("Window"), (
        "the second fold did not engage past the width threshold"
    )


def test_per_query_topk_fold_engages_on_wide_exchange_free_input(spark):
    """ADVICE r15: phase 1's pid domain is the INPUT's partition count
    (spark_partition_id is evaluated before any shuffle), so a scan-fed
    exchange-free input with many partitions must engage the second
    fold even while spark.sql.shuffle.partitions stays at a local width
    — and the fold must stay value-invisible."""
    from realtime_change_data_capture_streaming_spark.llm_ops.similarity import _FOLD_WIDTH, _per_query_topk
    from realtime_change_data_capture_streaming_spark.plans.introspect import executed_plan

    wide_n = _FOLD_WIDTH * 8 + 8

    def scored(n_parts):
        # Range is exchange-free: its partition count IS the pid domain
        return spark.range(0, 4 * wide_n, 1, n_parts).select(
            (F.col("id") % 2 + 1).alias("query_id"),
            (F.col("id") + 100).alias("cand_id"),
            ((F.col("id") * 17) % 97).cast("double").alias("score"),
        )

    assert int(spark.conf.get("spark.sql.shuffle.partitions")) <= _FOLD_WIDTH * 8, (
        "precondition: the session shuffle width must NOT trip the conf gate"
    )
    wide_df = _per_query_topk(scored(wide_n), 5, "score", False)
    narrow_df = _per_query_topk(scored(8), 5, "score", False)
    assert executed_plan(wide_df).count("Window") > executed_plan(narrow_df).count(
        "Window"
    ), "the fold did not engage on a wide exchange-free input"
    assert sorted(tuple(r) for r in wide_df.collect()) == sorted(
        tuple(r) for r in narrow_df.collect()
    ), "the fold changed values"


def test_per_query_topk_fold_engages_on_broadcast_crossjoin_over_wide_scan(spark, sf_dir):
    """The exact ADVICE r15 shape: ``broadcast(q).crossJoin(scan)`` is
    shuffle-free, so the pid domain is the SCAN width, which grows with
    data while shuffle.partitions stays put.  Shrinking
    maxPartitionBytes makes the driver-side scan-width estimate cross
    the threshold — the fold must engage, and must stay
    value-invisible.  (The gate must decide this WITHOUT .rdd, which
    under AQE would execute the broadcast build just to read a
    partition count.)"""
    from realtime_change_data_capture_streaming_spark.llm_ops.similarity import _per_query_topk
    from realtime_change_data_capture_streaming_spark.plans.introspect import executed_plan

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = e.filter(F.col("vec_id") >= 4).select(
        F.col("vec_id").alias("cand_id"), F.col("embedding")
    )
    dot = F.aggregate(
        F.zip_with("qe", "embedding", lambda x, y: x * y), F.lit(0.0), lambda a, z: a + z
    )

    def scored():
        return F.broadcast(q).crossJoin(c).select("query_id", "cand_id", dot.alias("score"))

    prev_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    prev_oc = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        narrow_df = _per_query_topk(scored(), 3, "score", False)
        # 64-byte splits: even the sf0.001 fixture's one small file then
        # estimates to hundreds of scan partitions, crossing the
        # _FOLD_WIDTH*8 threshold
        spark.conf.set("spark.sql.files.maxPartitionBytes", "64b")
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        wide_df = _per_query_topk(scored(), 3, "score", False)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", prev_oc)
    assert executed_plan(wide_df).count("Window") > executed_plan(narrow_df).count(
        "Window"
    ), "the fold did not engage on the broadcast-crossJoin-over-scan shape"
    assert sorted(tuple(r) for r in wide_df.collect()) == sorted(
        tuple(r) for r in narrow_df.collect()
    ), "the fold changed values"
