"""Accuracy bounds for the sketch-based aggregates (rows-only at the
driver, so the accuracy-vs-exact contract is pinned here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.operators.relational import (
    approx_count_distinct_hll,
    approx_percentile_prices,
)
from realtime_change_data_capture_streaming_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_hll_within_rsd(spark):
    """The query's hashable output asserts the 20%-band flag; this pins the
    underlying sketch to a TIGHTER 10% bound against the exact counts."""
    rows = {r["o_orderstatus"]: r for r in approx_count_distinct_hll(spark, SF_DIR).collect()}
    orders = load_table(spark, SF_DIR, "orders")
    approx = {
        r["o_orderstatus"]: r["a"]
        for r in orders.groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey", rsd=0.02).alias("a"))
        .collect()
    }
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in orders.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert rows[k]["n_distinct_exact"] == n
        assert rows[k]["sketch_within_20pct"] is True
        assert abs(approx[k] - n) <= max(2, 0.1 * n), (k, approx[k], n)


def test_approx_percentile_within_rank_error(spark):
    """percentile_approx(accuracy=A) guarantees rank error <= n/A; with
    A=10k and n~1.5k the sketch is effectively exact — assert against the
    true quantiles computed by sorting."""
    approx_rows = approx_percentile_prices(spark, SF_DIR).collect()
    orders = load_table(spark, SF_DIR, "orders")
    for row in approx_rows:
        status = row["o_orderstatus"]
        vals = sorted(
            r["o_totalprice"]
            for r in orders.filter(F.col("o_orderstatus") == status).select("o_totalprice").collect()
        )
        n = len(vals)
        for q, got, ok in zip(
            [0.25, 0.5, 0.75, 0.99],
            [row["q25_exact"], row["q50_exact"], row["q75_exact"], row["q99_exact"]],
            [row["q25_sketch_ok"], row["q50_sketch_ok"], row["q75_sketch_ok"], row["q99_sketch_ok"]],
        ):
            assert ok is True, (status, q)
            # exact interpolated quantile sits within one rank of the
            # nearest-rank quantile by construction
            lo = vals[max(0, min(n - 1, int(q * n) - 1))]
            hi = vals[max(0, min(n - 1, int(q * n) + 1))]
            assert float(lo) <= float(got) <= float(hi), (status, q, got, lo, hi)


def test_int8_quantization_error_bound(spark):
    """Symmetric int8 quantization: codes bounded by [-127, 127] and the
    max reconstruction error of every vector is <= half a quantization
    step (scale/2), the information-theoretic bound for round-to-nearest."""
    from realtime_change_data_capture_streaming_spark.llm_ops.similarity import embedding_quantize_int8

    rows = embedding_quantize_int8(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -127 <= r["q_min"] <= r["q_max"] <= 127, r
        assert r["max_abs_err"] <= r["q_scale"] / 2 + 1e-12, r


# --- near-dup sketch recall: minhash-LSH and simhash vs constructed dups ----
#
# The rows-only driver check proves the sketches RUN; these pin that they
# WORK: a corpus of (doc, perturbed-doc) pairs with ~95% token overlap must
# be recalled by each sketch at a quantitative bound.

_PERT_OFFSET = 1_000_000
_N_DUP_DOCS = 40


@pytest.fixture(scope="module")
def dup_corpus(spark):
    """Fixture docs + near-identical copies (every 20th token replaced),
    ids offset by _PERT_OFFSET.  Deterministic: no RNG anywhere."""
    from realtime_change_data_capture_streaming_spark.llm_ops.text import tokens

    d = (
        load_table(spark, SF_DIR, "documents")
        .orderBy("doc_id")
        .limit(_N_DUP_DOCS)
        .select("doc_id", "lang", "source", "text")
    )
    toks = tokens(F.col("text"))
    perturbed_text = F.array_join(
        F.transform(toks, lambda t, i: F.when(i % 20 == 0, F.lit("qqqq")).otherwise(t)), " "
    )
    pert = d.select(
        (F.col("doc_id") + _PERT_OFFSET).alias("doc_id"),
        "lang",
        "source",
        perturbed_text.alias("text"),
    )
    return d.unionByName(pert).cache()


def test_minhash_lsh_recalls_constructed_neardups(spark, dup_corpus):
    from realtime_change_data_capture_streaming_spark.llm_ops.dedup import minhash_lsh_pairs

    cand = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(dup_corpus).collect()
    }
    hits = sum(1 for i in range(_N_DUP_DOCS) if (i, i + _PERT_OFFSET) in cand)
    recall = hits / _N_DUP_DOCS
    assert recall >= 0.7, f"minhash-LSH recall {recall} over constructed near-dups"


def test_simhash_separates_neardups_from_random(spark, dup_corpus):
    """Two quantitative pins: (1) constructed near-dup pairs sit at far
    lower hamming distance than unrelated pairs; (2) the two phase-offset
    16-bit chunk tables (chunk_0..7) recall most of them as candidates
    without sweeping in unrelated pairs."""
    from realtime_change_data_capture_streaming_spark.llm_ops.dedup import simhash_of

    rows = {r["doc_id"]: r for r in simhash_of(dup_corpus).collect()}
    sigs = {k: r["simhash"] for k, r in rows.items()}

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    dup_d = [hamming(sigs[i], sigs[i + _PERT_OFFSET]) for i in range(_N_DUP_DOCS)]
    rand_d = [
        hamming(sigs[i], sigs[j])
        for i in range(_N_DUP_DOCS)
        for j in range(i + 1, _N_DUP_DOCS)
    ]
    mean_dup = sum(dup_d) / len(dup_d)
    mean_rand = sum(rand_d) / len(rand_d)
    # measured on the deterministic fixture with the portable md5-nibble
    # hash: ~6.6 vs ~18.3.  The unrelated mean sits well below 32 because
    # fixture docs draw from one shared vocabulary pool (and a few are
    # true dups of each other) — the pin is SEPARATION, not absolute
    # distance.
    assert mean_dup <= 10, f"near-dup mean hamming {mean_dup}"
    assert mean_rand >= 14, f"unrelated mean hamming {mean_rand}"
    assert mean_dup < 0.6 * mean_rand

    # chunk-bucket recall over BOTH tables: a pair is a candidate iff some
    # chunk column matches (the aligned table pigeonhole-guarantees
    # hamming <= 3; the phase-offset table catches most of the d=4..6
    # tail).  Measured: 0.55 aligned-only, 0.725 with both tables, with an
    # unrelated-pair candidate rate of ~4%.
    def shares_chunk(i, j):
        return any(rows[i][f"chunk_{c}"] == rows[j][f"chunk_{c}"] for c in range(8))

    hits = sum(1 for i in range(_N_DUP_DOCS) if shares_chunk(i, i + _PERT_OFFSET))
    recall = hits / _N_DUP_DOCS
    assert recall >= 0.6, f"simhash chunk-bucket recall {recall}"

    false_cand = sum(
        1
        for i in range(_N_DUP_DOCS)
        for j in range(i + 1, _N_DUP_DOCS)
        if shares_chunk(i, j)
    ) / len(rand_d)
    assert false_cand <= 0.15, f"unrelated-pair candidate rate {false_cand}"


def test_cross_shard_embedding_neardup_recall_via_lsh(spark):
    """The 100 TB embedding-dedup story measured, not asserted: the exact
    cosine tier (llm_ops.dedup.embedding_cosine_dedup) is sharded by
    label and cannot see a near-dup whose copy lives in ANOTHER shard.
    The claimed cross-shard path is the label-BLIND sign-LSH bucket key
    (llm_ops.similarity.lsh_signatures).  Construct cross-label near-dup
    pairs at cosine ~0.995 (every component scaled by +-10%,
    deterministic) and pin the recall of that path.

    Measured on the fixture: exact-bucket 0.66, multiprobe <=1 flipped
    bit 0.96 (and 1.0 / 1.0 at +-1%).  Multiprobe is the standard serving
    technique (probe the 16 hamming-1 neighbor buckets); the pins bound
    both the cheap path and the multiprobe path.
    """
    from realtime_change_data_capture_streaming_spark.llm_ops.similarity import (
        _dot,
        _norm,
        lsh_signatures,
    )
    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    OFF, N, EPS = 1_000_000, 50, 0.10
    e = load_table(spark, SF_DIR, "embeddings").orderBy("vec_id").limit(N)
    pert_emb = F.transform(
        F.col("embedding"),
        lambda x, i: x * (1.0 + F.when(i % 2 == 0, F.lit(EPS)).otherwise(F.lit(-EPS))),
    )
    pert = e.select(
        (F.col("vec_id") + OFF).alias("vec_id"),
        (F.col("label") + 1000).alias("label"),  # a shard the exact tier never joins
        pert_emb.alias("embedding"),
    )
    both = e.select("vec_id", "label", "embedding").unionByName(pert)

    # the constructed pairs ARE near-dups by the cosine metric
    a = e.select(F.col("vec_id").alias("id"), F.col("embedding").alias("ea"))
    b = pert.select((F.col("vec_id") - OFF).alias("id"), F.col("embedding").alias("eb"))
    min_cos = (
        a.join(b, "id")
        .select(
            (_dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))).alias("c")
        )
        .agg(F.min("c"))
        .collect()[0][0]
    )
    assert min_cos >= 0.99, min_cos

    sig = {r["vec_id"]: r["lsh_bucket"] for r in lsh_signatures(both).collect()}
    exact = sum(1 for i in sig if i < OFF and sig[i] == sig[i + OFF]) / N

    def hamming(x, y):
        return bin(x ^ y).count("1")

    probe1 = sum(1 for i in sig if i < OFF and hamming(sig[i], sig[i + OFF]) <= 1) / N
    assert exact >= 0.5, f"exact-bucket cross-shard recall {exact}"
    assert probe1 >= 0.9, f"multiprobe(1-bit) cross-shard recall {probe1}"


def test_ivf_multiprobe_dominates_single_probe_recall(spark):
    """Multiprobe exists to buy recall: against the exact cosine top-k,
    probing the 2 nearest clusters must recall at least as much as
    probing only the query's own cluster (and the same quantizer means
    single-probe results are a subset of multiprobe's candidates)."""
    from realtime_change_data_capture_streaming_spark.llm_ops.similarity import (
        ann_cosine_topk,
        ann_ivf_multiprobe_topk,
        ann_ivf_topk,
    )

    sf = "/root/testdata/sf0.01"
    exact = {(r["query_id"], r["cand_id"]) for r in ann_cosine_topk(spark, sf).collect()}
    single = {(r["query_id"], r["cand_id"]) for r in ann_ivf_topk(spark, sf).collect()}
    multi = {(r["query_id"], r["cand_id"]) for r in ann_ivf_multiprobe_topk(spark, sf).collect()}
    r_single = len(single & exact) / len(exact)
    r_multi = len(multi & exact) / len(exact)
    assert r_multi >= r_single, (r_single, r_multi)
    assert r_multi >= 0.85, r_multi


def test_pq_adc_rerank_recall(spark):
    """PQ ADC shortlist + exact rerank vs brute-force squared-L2 top-k:
    the shortlist (codes-only scan) must recall >= 85% of the exact
    neighbors, and reranked distances must equal the exact distances for
    every recalled pair (the rerank stage is exact by construction)."""
    from realtime_change_data_capture_streaming_spark.llm_ops.similarity import (
        N_QUERY_VECS,
        TOP_K,
        ann_pq_adc_topk,
    )

    sf = "/root/testdata/sf0.01"
    e = load_table(spark, sf, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    q = e.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = e.filter(F.col("vec_id") >= N_QUERY_VECS).select(
        F.col("vec_id").alias("cand_id"), F.col("v").alias("cv")
    )
    l2 = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.asc("l2_dist"), F.asc("cand_id"))
    exact_rows = (
        q.crossJoin(c)
        .select("query_id", "cand_id", l2.alias("l2_dist"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .collect()
    )
    exact = {(r["query_id"], r["cand_id"]): r["l2_dist"] for r in exact_rows}
    got = {(r["query_id"], r["cand_id"]): r["l2_dist"] for r in ann_pq_adc_topk(spark, sf).collect()}
    hit = set(exact) & set(got)
    assert len(hit) / len(exact) >= 0.85, len(hit) / len(exact)
    for k in hit:
        assert got[k] == exact[k], (k, got[k], exact[k])


def test_pq_persisted_search_matches_refit(spark):
    """The persisted-index search must return exactly what the
    refit-per-query operator returns (they share an oracle), and its plan
    must read the cached code table instead of refitting: no Exchange
    from the k-means chain, i.e. far fewer exchanges than the refit
    plan, and a scan of the index's codes parquet."""
    from realtime_change_data_capture_streaming_spark.llm_ops.similarity import (
        _pq_index_dir,
        ann_pq_adc_topk,
        ann_pq_persisted_topk,
    )

    sf = "/root/testdata/sf0.001"
    refit = ann_pq_adc_topk(spark, sf)
    persisted = ann_pq_persisted_topk(spark, sf)
    assert sorted(map(tuple, refit.collect())) == sorted(map(tuple, persisted.collect()))

    plan = persisted._jdf.queryExecution().executedPlan().toString()
    root = _pq_index_dir(spark, sf)
    assert "spark_graft_pq_" in plan, "search does not scan the persisted index"
    assert root.rsplit("/", 1)[-1] in plan
    n_persist_ex = plan.count("Exchange")
    n_refit_ex = refit._jdf.queryExecution().executedPlan().toString().count("Exchange")
    assert n_persist_ex < n_refit_ex, (n_persist_ex, n_refit_ex)


def test_ivfpq_prunes_partitions_and_bounds_recall(spark):
    """The IVFADC composition must (a) partition-prune the code-table
    scan to the probed-cluster union, and (b) still recall most exact
    neighbors at sf0.01 — the accuracy side of the n_probe/k scan
    saving.  Reranked distances are exact for every recalled pair."""
    from realtime_change_data_capture_streaming_spark.llm_ops.similarity import (
        N_QUERY_VECS,
        TOP_K,
        ann_ivfpq_persisted_topk,
    )

    sf = "/root/testdata/sf0.01"
    got_df = ann_ivfpq_persisted_topk(spark, sf)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "spark_graft_ivfpq_" in plan
    # the code-table scan must carry a cluster partition filter
    assert "PartitionFilters" in plan and "cluster" in plan.split("PartitionFilters", 1)[1][:200]

    e = load_table(spark, sf, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    q = e.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = e.filter(F.col("vec_id") >= N_QUERY_VECS).select(
        F.col("vec_id").alias("cand_id"), F.col("v").alias("cv")
    )
    l2 = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.asc("l2_dist"), F.asc("cand_id"))
    exact_rows = (
        q.crossJoin(c)
        .select("query_id", "cand_id", l2.alias("l2_dist"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .collect()
    )
    exact = {(r["query_id"], r["cand_id"]): r["l2_dist"] for r in exact_rows}
    got = {(r["query_id"], r["cand_id"]): r["l2_dist"] for r in got_df.collect()}
    hit = set(exact) & set(got)
    assert len(hit) / len(exact) >= 0.6, len(hit) / len(exact)
    for k in hit:
        assert got[k] == exact[k], (k, got[k], exact[k])


def test_pca_power_finds_dominant_direction(spark):
    """The power iterate must be a unit vector whose captured variance
    (Rayleigh quotient) at least matches the best coordinate axis — the
    minimal guarantee 3 iterations from a dense start must deliver."""
    import numpy as np

    from realtime_change_data_capture_streaming_spark.llm_ops.similarity import (
        embedding_pca_power,
    )

    sf = "/root/testdata/sf0.01"
    rows = sorted(embedding_pca_power(spark, sf).collect(), key=lambda r: r["dim"])
    v = np.array([r["loading"] for r in rows])
    lam = rows[0]["eigenvalue"]
    assert abs(float(np.dot(v, v)) - 1.0) < 1e-4, "component is not unit norm"

    X = np.array(
        [
            r["embedding"]
            for r in load_table(spark, sf, "embeddings").select("embedding").collect()
        ],
        dtype=np.float64,
    )
    Xc = X - X.mean(axis=0)
    var_along_v = float(((Xc @ v) ** 2).mean())
    best_axis_var = float((Xc**2).mean(axis=0).max())
    assert var_along_v >= best_axis_var, (var_along_v, best_axis_var)
    # the reported eigenvalue is ||Cv|| for the PREVIOUS unit iterate —
    # within the convergence gap of 3 iterations (observed ~8% on this
    # spectrum) of the measured variance along the final iterate
    assert abs(lam - var_along_v) / var_along_v < 0.15, (lam, var_along_v)


def test_hll_registers_merge_by_max(spark):
    """HLL's mergeability contract: registers of a union = elementwise
    MAX of the halves' registers — the property that lets sketches merge
    across partitions, days, or tables without rescanning."""
    from realtime_change_data_capture_streaming_spark.llm_ops.text import tokens  # noqa: F401
    from realtime_change_data_capture_streaming_spark.operators.stats import _HLL_CAP, _HLL_M

    e = load_table(spark, "/root/testdata/sf0.01", "events").select("user_id").distinct()
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("bigint")
    rest = F.shiftrightunsigned(h, 6)
    rho = F.when(rest == 0, F.lit(_HLL_CAP)).otherwise(
        (F.log2((rest.bitwiseAND(-rest)).cast("double")) + F.lit(1.0)).cast("int")
    )
    tagged = e.select((h % F.lit(_HLL_M)).alias("j"), rho.alias("rho"), (F.col("user_id") % 2).alias("half"))

    def regs(df):
        return {r["j"]: r["r"] for r in df.groupBy("j").agg(F.max("rho").alias("r")).collect()}

    whole = regs(tagged)
    h0 = regs(tagged.filter(F.col("half") == 0))
    h1 = regs(tagged.filter(F.col("half") == 1))
    merged = {j: max(h0.get(j, 0), h1.get(j, 0)) for j in set(h0) | set(h1)}
    assert merged == whole


def test_pca_outliers_match_numpy_residuals(spark):
    """The reported top-k must be exactly the k largest PCA residuals as
    computed independently with numpy from the operator's own component
    (residual identity: ||c||^2 - score^2 for a unit component)."""
    import numpy as np

    from realtime_change_data_capture_streaming_spark.llm_ops.similarity import (
        embedding_pca_outliers,
        embedding_pca_power,
    )

    sf = "/root/testdata/sf0.01"
    comp = sorted(embedding_pca_power(spark, sf).collect(), key=lambda r: r["dim"])
    v = np.array([r["loading"] for r in comp])
    rows = load_table(spark, sf, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    C = X - X.mean(axis=0)
    s = C @ v
    resid = (C**2).sum(axis=1) - s**2  # unit v: ||c - s v||^2 = ||c||^2 - s^2
    order = sorted(range(len(ids)), key=lambda i: (-resid[i], ids[i]))[:20]
    expect = [int(ids[i]) for i in order]
    got = [r["vec_id"] for r in sorted(embedding_pca_outliers(spark, sf).collect(), key=lambda r: r["rk"])]
    assert got == expect
    got_res = {r["vec_id"]: r["residual"] for r in embedding_pca_outliers(spark, sf).collect()}
    for i in order:
        assert abs(got_res[int(ids[i])] - resid[i]) < 1e-3, (ids[i], got_res[int(ids[i])], resid[i])


def test_pca_top2_orthogonal_and_ordered(spark):
    """Deflation contract: the two components are unit, near-orthogonal,
    eigenvalue_1 >= eigenvalue_2, component 1 equals the 1-component
    fit, and v2 captures more variance than any axis orthogonal
    residual baseline would by chance (lam2 > 0)."""
    import numpy as np

    from realtime_change_data_capture_streaming_spark.llm_ops.similarity import (
        embedding_pca_power,
        embedding_pca_top2,
    )

    sf = "/root/testdata/sf0.01"
    rows = embedding_pca_top2(spark, sf).collect()
    v1 = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["dim"]) if r["component"] == 1])
    v2 = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["dim"]) if r["component"] == 2])
    lam1 = next(r["eigenvalue"] for r in rows if r["component"] == 1)
    lam2 = next(r["eigenvalue"] for r in rows if r["component"] == 2)
    assert abs(float(v1 @ v1) - 1.0) < 1e-4
    assert abs(float(v2 @ v2) - 1.0) < 1e-4
    assert abs(float(v1 @ v2)) < 0.05, "components not near-orthogonal"
    assert lam1 >= lam2 > 0
    ref = {r["dim"]: r["loading"] for r in embedding_pca_power(spark, sf).collect()}
    assert all(ref[i] == v1[i] for i in range(len(v1))), "component 1 drifted from the 1-comp fit"


def test_kmv_estimates_partial_overlap(spark, monkeypatch):
    """Constructed HALF-overlapping audiences (A=1..100, B=51..150):
    union estimate within 3 rse of 150, intersection estimate within a
    looser band of 50 (theta-sketch intersections inherit both sets'
    error), and the union sketch must equal the bottom-k min-merge of
    the two sketches (mergeability)."""
    import realtime_change_data_capture_streaming_spark.operators.stats as stm

    rows = [("A", u) for u in range(1, 101)] + [("B", u) for u in range(51, 151)]
    d = spark.createDataFrame(rows, "event_type string, user_id long")
    monkeypatch.setattr(stm, "load_table", lambda s_, sf_, n_: d)
    (r,) = stm.sketch_kmv_set_ops(spark, "x").collect()
    assert (r["ta"], r["tb"]) == ("A", "B")
    assert (r["n_a"], r["n_b"], r["exact_union"], r["exact_inter"]) == (100, 100, 150, 50)
    rse = 1.0 / (stm._KMV_K - 2) ** 0.5
    assert abs(r["est_union"] - 150) / 150 <= 3 * rse, r["est_union"]
    assert abs(r["est_inter"] - 50) / 50 <= 6 * rse, r["est_inter"]
    assert r["union_within_3se"] is True


def test_kmv_intersection_scales_for_mixed_small_large_audiences(spark, monkeypatch):
    """A small audience (< k, sketch = whole set) fully contained in a
    large one: the intersection estimate must scale the common-below-
    theta count by the sampled side's theta, not return it raw (the
    OR-vs-AND null-branch regression this test pins)."""
    import realtime_change_data_capture_streaming_spark.operators.stats as stm

    small = [("S", u) for u in range(1, 41)]            # 40 users, < k
    large = [("L", u) for u in range(1, 2001)]          # 2000 users, contains S
    d = spark.createDataFrame(small + large, "event_type string, user_id long")
    monkeypatch.setattr(stm, "load_table", lambda s_, sf_, n_: d)
    (r,) = stm.sketch_kmv_set_ops(spark, "x").collect()
    assert (r["exact_inter"], r["n_a"]) == (40, 2000) or (r["exact_inter"], r["n_b"]) == (40, 2000)
    # true intersection 40; raw common-below-theta would be ~ 40*64/2000 ~ 1
    assert r["est_inter"] >= 15, r["est_inter"]
    assert r["est_inter"] <= 100, r["est_inter"]


def test_bottomk_sample_merges_by_min(spark):
    """Bottom-k mergeability: the union's k smallest hashes = the k
    smallest of the halves' bottom-k sets — the property that lets
    per-partition quantile samples combine without rescanning."""
    from realtime_change_data_capture_streaming_spark.operators.stats import _BKQ_K

    e = load_table(spark, "/root/testdata/sf0.01", "events")
    h = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("bigint")
    rows = e.select("event_id", h.alias("h"), (F.col("event_id") % 2).alias("half"))

    def bottomk(df):
        return sorted(r["h"] for r in df.orderBy("h").limit(_BKQ_K).collect())

    whole = bottomk(rows)
    merged = sorted(bottomk(rows.filter(F.col("half") == 0)) + bottomk(rows.filter(F.col("half") == 1)))[:_BKQ_K]
    assert merged == whole


def test_stream_hll_merge_scales_to_10k_groups(spark, monkeypatch):
    """The versioned-dir register merge must stay correct when the GROUP
    key is high-cardinality (10k event types): state is groups x m rows,
    merged executor-side across micro-batches with no driver collect —
    every group's registers must still combine both parity batches."""
    import realtime_change_data_capture_streaming_spark.streaming.sketches as sk
    from realtime_change_data_capture_streaming_spark.operators.stats import _HLL_M

    n_groups = 10_000
    rows = [(f"g{i % n_groups:05d}", i) for i in range(3 * n_groups)]
    e = spark.createDataFrame(rows, "event_type string, user_id bigint")
    monkeypatch.setattr(sk, "load_table", lambda s_, sf_, n_: e)
    got = sk.stream_hll_distinct_users(spark, "unused")
    assert got.count() == n_groups
    # every group saw 3 users split across the two parity micro-batches;
    # a merge that dropped a batch would undercount half the groups hard
    bad = got.filter("n_exact != 3").count()
    assert bad == 0
    assert got.filter("hll_estimate <= 0").count() == 0


def test_countmin_counters_merge_by_sum(spark):
    """CM mergeability (the additive dual of HLL's max-merge): counters
    of a union are the elementwise SUM of the parts' counters."""
    from pyspark.sql import functions as F

    from realtime_change_data_capture_streaming_spark.operators.stats import cm_counters

    rows = [(i % 97,) for i in range(3000)]
    e = spark.createDataFrame(rows, "user_id bigint").withColumn(
        "half", F.pmod(F.monotonically_increasing_id(), F.lit(2))
    )
    whole = {(r["r"], r["c"]): r["cnt"] for r in cm_counters(e).collect()}
    h0 = {(r["r"], r["c"]): r["cnt"] for r in cm_counters(e.filter("half = 0")).collect()}
    h1 = {(r["r"], r["c"]): r["cnt"] for r in cm_counters(e.filter("half = 1")).collect()}
    merged = {k: h0.get(k, 0) + h1.get(k, 0) for k in set(h0) | set(h1)}
    assert merged == whole


def test_countmin_never_underestimates(spark, monkeypatch):
    """One-sided error is the CM contract: even with heavy collisions
    (synthetic keys >> w), every estimate must be >= the true count."""
    import realtime_change_data_capture_streaming_spark.operators.stats as st

    rows = [(i % 2000,) for i in range(10_000)]
    e = spark.createDataFrame(rows, "user_id bigint").selectExpr(
        "user_id", "'x' AS event_type"
    )
    monkeypatch.setattr(st, "load_table", lambda s_, sf_, n_: e)
    got = st.sketch_countmin_user_counts(spark, "unused").collect()
    assert len(got) == st._CM_TOP
    assert all(r["never_under"] for r in got)


def test_mmr_promotes_diverse_candidate_over_near_duplicate(spark, monkeypatch):
    """MMR's reason to exist: when the two most relevant candidates are
    near-duplicates of each other, the second selection must be the
    DIVERSE candidate, not the duplicate — even though plain cosine
    ranks the duplicate second."""
    import realtime_change_data_capture_streaming_spark.llm_ops.similarity as sim

    rows = [
        (0, "q", [1.0, 0.0, 0.0, 0.0]),
        # near-duplicate pair, both rel ~0.9 to the query
        (8, "a", [0.9, 0.43589, 0.0, 0.0]),
        (9, "a", [0.9, 0.4358, 0.01, 0.0]),
        # diverse candidate: rel ~0.88 but far from the duplicates
        (10, "b", [0.88, 0.0, 0.475, 0.0]),
        # filler
        (11, "c", [0.5, 0.5, 0.5, 0.5]),
    ]
    e = spark.createDataFrame(rows, "vec_id bigint, label string, embedding array<float>")
    monkeypatch.setattr(sim, "load_table", lambda s_, sf_, n_: e)
    got = sorted(
        (r["step"], r["cand_id"])
        for r in sim.ann_mmr_diversified_topk(spark, "unused").filter("query_id = 0").collect()
    )
    assert got[0][1] in (8, 9), "step 0 must take the most relevant candidate"
    assert got[1][1] == 10, f"step 1 must diversify to cand 10, got {got}"
    # plain cosine would rank the other duplicate second
    cos = {r["cand_id"]: r["rk"] for r in sim.ann_cosine_topk(spark, "unused").filter("query_id = 0").collect()}
    assert cos[8] <= 2 and cos[9] <= 2, "sanity: duplicates dominate the cosine ranking"


def test_jl_distortion_concentrates_near_one(spark):
    """JL lemma sanity: sign projections 64d->16d keep squared distances
    within a moderate band around 1 for most pairs (eps ~ sqrt(ln n / k)
    is large at k=16, so the pin is loose but must hold on the fixture:
    all ratios positive, median within [0.4, 1.9])."""
    from realtime_change_data_capture_streaming_spark.llm_ops.similarity import embedding_jl_distortion

    rows = embedding_jl_distortion(spark, "/root/testdata/sf0.001").collect()
    assert rows
    ratios = sorted(r["ratio"] for r in rows)
    assert all(r > 0 for r in ratios)
    med = ratios[len(ratios) // 2]
    assert 0.4 <= med <= 1.9, f"median JL ratio {med}"


def test_sketch_store_commits_are_replay_safe(spark, tmp_path):
    """foreachBatch is at-least-once: a batch re-delivered after a crash
    between the store commit and the checkpoint advance must NOT change
    the store again.  Sum-merge (count-min) double-counts and the
    bottom-k sample re-inserts duplicate rows without the guard — replay
    each batch id twice against a real versioned store and assert the
    state equals the once-each application."""
    from realtime_change_data_capture_streaming_spark.cdc import commit as table_commit
    from realtime_change_data_capture_streaming_spark.streaming.sketches import (
        _merge_bkq_sample,
        _merge_cm_counters,
    )

    users = spark.range(0, 500).select(F.col("id").alias("user_id"))
    b0 = users.filter(F.col("user_id") % 2 == 0)
    b1 = users.filter(F.col("user_id") % 2 == 1)

    def cm_state(store):
        return {
            (r["r"], r["c"]): r["cnt"]
            for r in spark.read.parquet(table_commit.resolve(store)).collect()
        }

    store = str(tmp_path / "cm")
    _merge_cm_counters(store, b0, 0)
    _merge_cm_counters(store, b0, 0)  # crash-replay of batch 0
    _merge_cm_counters(store, b1, 1)
    _merge_cm_counters(store, b1, 1)  # crash-replay of batch 1
    final = cm_state(store)

    ref = str(tmp_path / "cm_ref")
    _merge_cm_counters(ref, b0, 0)
    _merge_cm_counters(ref, b1, 1)
    assert final == cm_state(ref), "replayed batches double-counted the sum-merge"

    events = spark.range(0, 300).select(
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias("event_type"),
        F.col("id").alias("event_id"),
        (F.col("id") * 1.5).alias("value"),
    )
    e0 = events.filter(F.col("event_id") % 2 == 0)
    e1 = events.filter(F.col("event_id") % 2 == 1)
    # source-level duplicate delivery: some batch-0 rows appear again in batch 1
    e1_dup = e1.unionByName(e0.filter(F.col("event_id") % 10 == 0))

    def bkq_state(store):
        return sorted(
            (r["event_type"], r["event_id"], r["v"], r["h"])
            for r in spark.read.parquet(table_commit.resolve(store)).collect()
        )

    bstore = str(tmp_path / "bkq")
    _merge_bkq_sample(bstore, e0, 0)
    _merge_bkq_sample(bstore, e0, 0)  # crash-replay
    _merge_bkq_sample(bstore, e1_dup, 1)
    _merge_bkq_sample(bstore, e1_dup, 1)  # crash-replay
    bref = str(tmp_path / "bkq_ref")
    _merge_bkq_sample(bref, e0, 0)
    _merge_bkq_sample(bref, e1, 1)
    got, want = bkq_state(bstore), bkq_state(bref)
    assert got == want, "replayed/duplicated rows corrupted the bottom-k sample"
    n_per_group = {}
    for t, *_ in got:
        n_per_group[t] = n_per_group.get(t, 0) + 1
    from realtime_change_data_capture_streaming_spark.operators.stats import _BKQ_K

    assert all(v <= _BKQ_K for v in n_per_group.values())


def test_semantic_dedup_cluster_recall_vs_exact(spark):
    """SemDeDup's cluster-bounded candidate generation must not lose the
    near-duplicates the exact all-pairs scan finds: on the fixture, every
    doc dropped by the exact rule (some smaller-id doc anywhere with
    cosine >= tau) is also dropped by the intra-cluster rule — i.e. the
    normalized-vector k-means co-locates all true near-dup pairs
    (unnormalized counts co-locate none; see _semantic_vectors)."""
    from realtime_change_data_capture_streaming_spark.llm_ops.dedup import (
        _SEM_TAU,
        _semantic_vectors,
        dedup_semantic_clusters,
    )

    sf = "/root/testdata/sf0.001"
    got = {r["drop_id"] for r in dedup_semantic_clusters(spark, sf).collect()}

    v = _semantic_vectors(spark, sf)
    a = v.select(F.col("doc_id").alias("ia"), F.col("vec").alias("va"))
    b = v.select(F.col("doc_id").alias("ib"), F.col("vec").alias("vb"))
    cos = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, z: acc + z
    )
    exact = {
        r["ib"]
        for r in a.join(b, F.col("ia") < F.col("ib"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= F.lit(_SEM_TAU))
        .select("ib")
        .distinct()
        .collect()
    }
    assert len(exact) >= 10, "fixture lost its near-duplicate structure"
    assert exact == got, (
        f"cluster-bounded drops diverge from exact: missed={sorted(exact - got)[:5]} "
        f"extra={sorted(got - exact)[:5]}"
    )


def test_stream_semantic_admission_matches_batch_and_oracle(spark):
    """VERDICT r9 task 8 (stretch): streaming semantic admission ==
    the batch closed form exactly (per-doc decisions depend only on the
    persisted history index, so the micro-batch split must be
    invisible), the closed form replays in DuckDB, and admission recall
    covers the batch SemDeDup tier's cross-split drops."""
    import duckdb

    from realtime_change_data_capture_streaming_spark.streaming.semantic import (
        _admission_sql,
        semantic_admission_batch,
        stream_semantic_admission,
    )

    sf = "/root/testdata/sf0.001"
    batch = {
        r["doc_id"]: (r["n_history_candidates"], r["witness_id"], round(r["cosine"], 9))
        for r in semantic_admission_batch(spark, sf).collect()
    }
    streamed = {
        r["doc_id"]: (r["n_history_candidates"], r["witness_id"], round(r["cosine"], 9))
        for r in stream_semantic_admission(spark, sf).collect()
    }
    assert batch and streamed == batch
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    oracle = {
        r[0]: (r[1], r[2], round(r[3], 9)) for r in con.execute(_admission_sql()).fetchall()
    }
    assert oracle == batch, (
        f"oracle diverges: {[(k, batch[k], oracle.get(k)) for k in batch if oracle.get(k) != batch[k]][:3]}"
    )

    # recall: every cross-split near-dup pair the batch SemDeDup tier
    # finds (history witness < 250 <= incoming drop) must be flagged
    from realtime_change_data_capture_streaming_spark.llm_ops.dedup import dedup_semantic_clusters
    from realtime_change_data_capture_streaming_spark.streaming.neardup import HISTORY_MAX_DOC_ID

    cross = {
        r["drop_id"]
        for r in dedup_semantic_clusters(spark, sf).collect()
        if r["witness_id"] < HISTORY_MAX_DOC_ID <= r["drop_id"]
    }
    assert cross, "fixture lost its cross-split near-duplicate structure"
    flagged = set(batch)
    missed = cross - flagged
    assert not missed, f"admission missed cross-split drops: {sorted(missed)[:5]}"


def test_stream_dedup_components_merges_and_replays(spark, tmp_path):
    """The incremental CC's two hard cases, driven directly against real
    versioned stores: (1) a later batch's edge MERGES two components
    formed earlier (per-batch-local clustering would leave them split);
    (2) a re-delivered batch id is a no-op, and even a redelivery whose
    shingle commit survived cannot fabricate edges from double-counted
    internal pairs."""
    from realtime_change_data_capture_streaming_spark.cdc import commit as table_commit
    from realtime_change_data_capture_streaming_spark.streaming.neardup import (
        _merge_dedup_components,
        _read_assign,
    )

    def docs(rows):
        return spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string"
        )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    variant = base + " ok"  # near-dup of base (J >= 0.2 on 3-gram shingles)
    other = "completely different content about spark plans and shuffles here"
    sh_store = str(tmp_path / "sh")
    as_store = str(tmp_path / "as")

    # batch 0: docs 2 and 4 are near-dups -> one component {2, 4};
    # doc 10 is unrelated (no edges -> no assignment row)
    _merge_dedup_components(
        sh_store, as_store,
        docs([(2, base, "en", "web"), (4, variant, "en", "web"), (10, other, "en", "web")]),
        0,
    )
    a0 = {
        (r["node"], r["component"])
        for r in _read_assign(spark, as_store).collect()
    }
    assert a0 == {(2, 2), (4, 2)}

    # batch 1: doc 3 bridges nothing new itself BUT doc 5 near-dups both
    # 4 (existing component 2) and a new doc 7 -> everything joins {2}
    _merge_dedup_components(
        sh_store, as_store,
        docs([(5, base + " more", "en", "web"), (7, variant + " more", "en", "web")]),
        1,
    )
    a1 = {
        (r["node"], r["component"])
        for r in _read_assign(spark, as_store).collect()
    }
    assert a1 == {(2, 2), (4, 2), (5, 2), (7, 2)}

    # replay batch 1: guarded no-op (same version, same rows)
    v_before = table_commit.read_manifest(as_store)["seq"]
    _merge_dedup_components(
        sh_store, as_store,
        docs([(5, base + " more", "en", "web"), (7, variant + " more", "en", "web")]),
        1,
    )
    assert table_commit.read_manifest(as_store)["seq"] == v_before
    a2 = {
        (r["node"], r["component"])
        for r in _read_assign(spark, as_store).collect()
    }
    assert a2 == a1

    # batch 2's docs near-dup each other AND batch 0's edge-less doc 10 —
    # an old singleton must gain its FIRST assignment from a later
    # batch's edge (its shingles come out of the store)
    b2 = docs([(9, other + " exactly", "en", "web"), (11, other + " exactly", "en", "web")])
    _merge_dedup_components(sh_store, as_store, b2, 2)
    a3 = {
        (r["node"], r["component"])
        for r in _read_assign(spark, as_store).collect()
    }
    # adversarial redelivery: shingle store already holds batch 2's rows
    # (crash between the two commits) — recompute must not double-count;
    # simulate by rolling the ASSIGN manifest's applied_bid back
    import json, os
    mpath = os.path.join(as_store, "_CURRENT")
    m = json.load(open(mpath))
    m["applied_bid"] = 1
    json.dump(m, open(mpath, "w"))
    _merge_dedup_components(sh_store, as_store, b2, 2)
    a4 = {
        (r["node"], r["component"])
        for r in _read_assign(spark, as_store).collect()
    }
    assert a4 == a3 == a1 | {(9, 9), (10, 9), (11, 9)}
