"""Deduplication operators for training-data pipelines.

Five tiers, each the idiomatic Spark shape for its scale:

- **exact**: md5 group-by — one shuffle on a 16-byte key; at 100 TB
  group on the digest, never the document body.
- **n-gram Jaccard**: shingle -> explode -> self-join on shingle ->
  pair-count -> Jaccard.  Exact but quadratic per shared-shingle bucket;
  the oracle-checked ground truth for the approximate tiers.
- **MinHash LSH**: k independent min-hashes -> band signatures -> group by
  band bucket -> candidate pairs only.  Linear scan + bounded shuffle:
  THE 100 TB near-dup path.  Hashes are md5-derived (portable), so the
  whole sketch replays in DuckDB for a full value-hash oracle.
- **SimHash**: 64-bit weighted-projection signature per doc; hamming
  buckets by 16-bit chunks.  Same portable-hash discipline, same oracle.
- **embedding-cosine**: near-dup pairs by cosine threshold within label
  shards; the semantic-duplicate tier (exact oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.llm_ops.text import tokens
from realtime_change_data_capture_streaming_spark.operators._util import fp_encode_sql, fp_mean_sql, spread
from realtime_change_data_capture_streaming_spark.sources.tables import load_table


def exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by md5(text): canonical doc + group size.
    (min(doc_id) is the kept representative, the rest are drops.)"""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.md5(F.col("text").cast("binary")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("group_size"))
    )


EXACT_DEDUP_SQL = """
SELECT md5(text) AS fp, MIN(doc_id) AS keep_doc_id, COUNT(*) AS group_size
FROM documents GROUP BY 1
"""


def shingle_rows(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """DISTINCT k-word shingles as rows: (carry-cols..., shingle, n_shingles).

    Stays on the whole-stage-codegen path end to end: posexplode the token
    array, build shingles with lead() windows, dropDuplicates, and attach
    the per-doc distinct count with a count() window over the same
    partitioning (no extra join, no second shuffle).

    Deliberately NOT an array-of-shingles higher-order-function expression:
    transform/slice lambdas are interpreted (CodegenFallback) at ~100us per
    element, and Catalyst's CollapseProject / InferFiltersFromGenerate
    rules re-inline and re-evaluate such expression trees (measured 20-30s
    for 5k docs vs ~1s this way).  One shuffle on the doc id; at 100 TB
    that shuffle carries tokens, which is the theoretical minimum for
    order-sensitive shingling.
    """
    from pyspark.sql import Window

    carry = [c for c in df.columns if c != text_col]
    tokp = spread(df, id_col).select(
        *carry, F.posexplode_outer(tokens(F.col(text_col))).alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    tri = tokp
    for i in range(1, k):
        tri = tri.withColumn(f"_t{i}", F.lead("tok", i).over(w))
    tri = tri.filter(F.col(f"_t{k - 1}").isNotNull())
    shingled = tri.select(
        *carry, "pos", F.concat_ws(" ", "tok", *[f"_t{i}" for i in range(1, k)]).alias("shingle")
    )
    # in-doc distinct via row_number instead of dropDuplicates: a window
    # partitioned by (doc, shingle) is satisfied by the existing doc-hash
    # distribution, so no second shuffle is planned
    wdup = Window.partitionBy(id_col, "shingle").orderBy("pos")
    wd = Window.partitionBy(id_col)
    return (
        shingled.withColumn("_rn", F.row_number().over(wdup))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "pos")
        .withColumn("n_shingles", F.count(F.lit(1)).over(wd))
    )


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard similarity join within (lang, source) shards:
    pairs with J >= 0.20.

    Plan: per-doc distinct shingles -> explode -> self-join on
    (shard, shingle) -> count shared -> J = shared / (|A|+|B|-shared).
    Integer arithmetic + one double division: engine-exact.

    Sharding is the scale story: exact all-pairs Jaccard is quadratic per
    shared-shingle block, so the exact tier runs within natural shards
    (here lang x source) — the join key carries the shard, bounding block
    size — while cross-shard near-dups go through the sub-quadratic
    MinHash tier (minhash_lsh_candidates).  This mirrors production
    pipelines (exact intra-shard + LSH global).
    """
    d = load_table(spark, sf_dir, "documents")
    # shingle rows carry the per-doc distinct count, so sizes ride the join
    # instead of a second scan + two extra joins
    sh = shingle_rows(d)
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_shingles").alias("size_a"),
            F.col("b.n_shingles").alias("size_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.withColumn(
            "jaccard",
            F.col("n_shared").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("n_shared")),
        )
        .filter(F.col("jaccard") >= 0.20)
        .select("doc_a", "doc_b", "n_shared", "jaccard")
    )


_CONTAIN_TOP = 20


def dedup_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional shingle CONTAINMENT — the dedup semantic Jaccard
    misses: C(src->dst) = |S(src) ∩ S(dst)| / |S(src)| is high when src
    is quoted/wrapped inside dst even though resemblance stays low
    (boilerplate wrappers, quotations, templated expansions — Broder's
    resemblance-vs-containment distinction).

    Same sharded self-join as the exact Jaccard tier (one shuffle on
    (shard, shingle), block size bounded by the shard), then each
    undirected shared pair emits BOTH directions with its own
    denominator.  Top pairs by (containment, ids) — integer counts, one
    double division, engine-exact."""
    d = load_table(spark, sf_dir, "documents")
    sh = shingle_rows(d)
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_shingles").alias("size_a"),
            F.col("b.n_shingles").alias("size_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    directed = shared.select(
        F.col("doc_a").alias("doc_src"),
        F.col("doc_b").alias("doc_dst"),
        "n_shared",
        (F.col("n_shared").cast("double") / F.col("size_a")).alias("containment"),
    ).unionByName(
        shared.select(
            F.col("doc_b").alias("doc_src"),
            F.col("doc_a").alias("doc_dst"),
            "n_shared",
            (F.col("n_shared").cast("double") / F.col("size_b")).alias("containment"),
        )
    )
    return directed.orderBy(
        F.desc("containment"), F.asc("doc_src"), F.asc("doc_dst")
    ).limit(_CONTAIN_TOP)


CONTAINMENT_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, source,
         list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '') AS ts
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, lang, source, array_to_string(ts[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(range(1, GREATEST(LEN(ts) - 2, 0) + 1)) AS t(i)
), sizes AS (
  SELECT doc_id, COUNT(DISTINCT shingle) AS n_shingles FROM sh GROUP BY doc_id
), shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.lang = b.lang
                     AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), directed AS (
  SELECT doc_a AS doc_src, doc_b AS doc_dst, n_shared,
         CAST(n_shared AS DOUBLE) / sa.n_shingles AS containment
  FROM shared JOIN sizes sa ON sa.doc_id = doc_a
  UNION ALL
  SELECT doc_b, doc_a, n_shared,
         CAST(n_shared AS DOUBLE) / sb.n_shingles
  FROM shared JOIN sizes sb ON sb.doc_id = doc_b
)
SELECT doc_src, doc_dst, n_shared, containment
FROM directed
ORDER BY containment DESC, doc_src ASC, doc_dst ASC
LIMIT {_CONTAIN_TOP}
"""


def _ngram_jaccard_sql(src: str = "documents") -> str:
    """The exact-Jaccard pair chain, parametrized by the corpus source
    (``src`` — e.g. a ``live_docs`` CTE for the erasure oracles), so
    forget-variant oracles are BUILT rather than derived by textual
    surgery (the r15 review discipline)."""
    return f"""
WITH toks AS (
  SELECT doc_id, lang, source,
         list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '') AS ts
  FROM {src}
), sh AS (
  SELECT DISTINCT doc_id, lang, source, array_to_string(ts[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(range(1, GREATEST(LEN(ts) - 2, 0) + 1)) AS t(i)
), sizes AS (
  SELECT doc_id, COUNT(DISTINCT shingle) AS n_shingles FROM sh GROUP BY doc_id
), shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.lang = b.lang
                     AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_shared,
       CAST(n_shared AS DOUBLE) / (sa.n_shingles + sb.n_shingles - n_shared) AS jaccard
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_shared AS DOUBLE) / (sa.n_shingles + sb.n_shingles - n_shared) >= 0.20
"""


NGRAM_JACCARD_SQL = _ngram_jaccard_sql()


N_MINHASHES = 32
N_BANDS = 8  # 4 hashes per band


#: Mersenne-prime field for the universal-hash permutations: a*h+b stays
#: under 2^62, so the whole family is plain 64-bit arithmetic in ANY engine.
_MH_P = (1 << 31) - 1


def _mh_params(k: int = N_MINHASHES) -> list[tuple[int, int]]:
    """k fixed (a, b) permutation constants from a seeded LCG — plain
    Python ints, inlined as LITERALS into both the Spark expressions and
    the oracle SQL, so cross-engine equality is by construction."""
    params = []
    x = 0x5DEECE66D
    for _ in range(k):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (x % (_MH_P - 1)) + 1  # a != 0
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = x % _MH_P
        params.append((a, b))
    return params


_MH_PARAMS = _mh_params()


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """k=32 min-hashes per doc: ONE portable md5-derived base hash per
    shingle (first 15 hex chars as a bigint, mod 2^31-1), then k universal
    permutations h_i = (a_i*h + b_i) mod p over it — min of each across
    the doc's shingles.

    One scan, no shuffle; per-shingle cost is one md5 + k multiply-adds,
    all in codegen (k independent md5s was measured 2.4x slower at sf0.1).
    Reproducible in any engine with md5 + 64-bit integer arithmetic
    (DuckDB oracle: MINHASH_LSH_SQL)."""
    sh = shingle_rows(df, text_col, id_col).select(F.col(id_col), "shingle")
    base = (
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast("bigint") % _MH_P
    )
    hashed = sh.select(F.col(id_col), base.alias("_h"))
    mins = [
        F.min((F.lit(a) * F.col("_h") + F.lit(b)) % _MH_P).alias(f"mh_{i}")
        for i, (a, b) in enumerate(_MH_PARAMS)
    ]
    return hashed.groupBy(id_col).agg(*mins)


def minhash_band_buckets(d: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, sig, band, bucket) — the banded LSH key table.  This is
    the INDEX a production pipeline persists: new documents are admitted
    by probing their buckets against it (see
    streaming/neardup.stream_neardup_admission)."""
    sig = minhash_signatures(d, text_col, id_col)
    n_per_band = N_MINHASHES // N_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                # portable bucket key: md5 over the comma-joined band slice
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"mh_{b * n_per_band + i}").cast("string")
                            for i in range(n_per_band)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(N_BANDS)
        ]
    )
    return sig.select(
        id_col,
        F.array(*[F.col(f"mh_{i}") for i in range(N_MINHASHES)]).alias("sig"),
        F.explode(bands).alias("bb"),
    ).select(id_col, "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding over the documents fixture — see minhash_lsh_pairs."""
    return minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))


def minhash_lsh_pairs(d: DataFrame) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs,
    scored by estimated Jaccard (fraction of equal min-hashes).

    The only shuffle keyed on (band, bucket-hash); candidate volume scales
    with true near-dup density, not with n^2 — the 100 TB shape.
    Signatures and band buckets are md5-derived, so the whole pipeline
    replays in DuckDB (MINHASH_LSH_SQL); recall vs the exact tier is
    additionally pinned in tests/test_sketches.py.
    """
    banded = minhash_band_buckets(d)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq)
    ).cast("double") / F.lit(N_MINHASHES)
    return pairs.select("doc_a", "doc_b", est.alias("est_jaccard")).filter(
        F.col("est_jaccard") >= 0.2
    )


_MH_MIN_EXPRS = ",\n         ".join(
    f"MIN(({a} * h + {b}) % {_MH_P}) AS mh_{i}" for i, (a, b) in enumerate(_MH_PARAMS)
)
_MH_SIG_LIST = "[" + ", ".join(f"mh_{i}" for i in range(N_MINHASHES)) + "]"

MINHASH_LSH_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '') AS ts
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(range(1, GREATEST(LEN(ts) - 2, 0) + 1)) AS t(i)
), hashed AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(shingle), 1, 15))::UBIGINT % {_MH_P} AS BIGINT) AS h
  FROM sh
), mh AS (
  SELECT doc_id,
         {_MH_MIN_EXPRS}
  FROM hashed
  GROUP BY doc_id
), sig AS (
  SELECT doc_id, {_MH_SIG_LIST} AS sig FROM mh
), banded AS (
  SELECT doc_id, sig, band,
         md5(array_to_string(sig[band*4+1 : band*4+4], ',')) AS bucket
  FROM sig, UNNEST(range({N_BANDS})) u(band)
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sig_a, b.sig AS sig_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(len(list_filter(list_zip(sig_a, sig_b), p -> p[1] = p[2])) AS DOUBLE) / {N_MINHASHES} AS est_jaccard
FROM pairs
WHERE CAST(len(list_filter(list_zip(sig_a, sig_b), p -> p[1] = p[2])) AS DOUBLE) / {N_MINHASHES} >= 0.2
"""


SIMHASH_SQL = """
WITH toks AS (
  SELECT doc_id,
         UNNEST(list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '')) AS tok
  FROM documents
), nib AS (
  SELECT doc_id, md5(tok) AS hx FROM toks
), bits AS (
  SELECT doc_id, i,
         SUM(CASE WHEN (CAST(('0x' || substr(hx, CAST(i // 4 AS INT) + 1, 1))::UBIGINT AS INT) >> CAST(i % 4 AS INT)) & 1 = 1
                  THEN 1 ELSE -1 END) AS s
  FROM nib, UNNEST(range(63)) t(i)
  GROUP BY doc_id, i
), sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << CAST(i AS INT) ELSE CAST(0 AS BIGINT) END)
              AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
)
SELECT doc_id, simhash,
       (simhash >> 0) & 65535 AS chunk_0,
       (simhash >> 16) & 65535 AS chunk_1,
       (simhash >> 32) & 65535 AS chunk_2,
       (simhash >> 48) & 65535 AS chunk_3,
       (simhash >> 8) & 65535 AS chunk_4,
       (simhash >> 24) & 65535 AS chunk_5,
       (simhash >> 40) & 65535 AS chunk_6,
       ((simhash >> 56) & 127) + ((simhash & 255) << 7) AS chunk_7
FROM sig
"""


def embedding_cosine_dedup(spark: SparkSession, sf_dir: str, threshold: float = 0.30) -> DataFrame:
    """Embedding-cosine near-dup tier: pairs of vectors whose cosine
    exceeds the threshold, with the kept/dropped decision (keep min id).
    (The fixture embeddings have no true duplicates — max within-label
    cosine is ~0.47 — so the default threshold selects the top ~1% most
    similar pairs; production dedup would sit at 0.95+.)

    Brute force within a label block — labels act as the natural shard
    (like lang/source for text); the cross-shard path is the LSH/IVF
    candidates in similarity.py.  Exact oracle: same fold order in DuckDB.
    """
    from realtime_change_data_capture_streaming_spark.llm_ops.similarity import _dot, _norm

    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"), F.col("label").alias("lbl"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"), F.col("label").alias("lbl_b"))
    pairs = a.join(b, (F.col("lbl") == F.col("lbl_b")) & (F.col("id_a") < F.col("id_b")))
    cos = _dot(F.col("emb_a"), F.col("emb_b")) / (_norm(F.col("emb_a")) * _norm(F.col("emb_b")))
    return (
        pairs.select("id_a", "id_b", "lbl", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("id_a").alias("keep_id"),
            F.col("id_b").alias("drop_id"),
            F.col("lbl").alias("label"),
            "cosine",
        )
    )


EMBEDDING_COSINE_DEDUP_SQL = """
SELECT a.vec_id AS keep_id, b.vec_id AS drop_id, a.label AS label,
       list_sum(list_transform(list_zip(a.embedding, b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
       / (SQRT(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
          * SQRT(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      / (SQRT(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         * SQRT(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) >= 0.30
"""


# ------------------------------------------------- semantic dedup (SemDeDup)

_SEM_DIM = 128  # hashed-shingle embedding width
_SEM_K = 8  # k-means cluster floor (and the value the oracle replays)
_SEM_TARGET = 64  # target docs per cluster: k = max(_SEM_K, n_docs // _SEM_TARGET)
_SEM_ITERS = 2  # fixed iteration count (determinism, like ivf_model)
_SEM_TAU = 0.8  # intra-cluster cosine threshold for a near-duplicate
_SEM_FP = float(1 << 20)  # fixed-point scale for the centroid mean


def _semantic_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-NORMALIZED ``_SEM_DIM``-dim hashed 3-shingle count vector per
    document — the deterministic stand-in for a model embedding (the
    hashing-trick discipline of ``features.feature_hashing_counts``:
    vocabulary never materializes, feature width fixed at any corpus
    size, md5 buckets so the whole embedding replays in DuckDB).

    Normalization is the load-bearing step: SemDeDup's k-means must
    co-cluster near-duplicates, and on RAW count vectors two documents
    with cosine 0.99 but 2x different lengths sit far apart in L2 — on
    the unit sphere squared-L2 is exactly ``2 - 2*cosine``, so cosine
    neighbors are L2 neighbors and land in the same cell.  (Measured on
    the fixture: raw-count clustering co-locates 0/24 true near-dup
    pairs; normalized co-locates 24/24.)  Documents shorter than one
    shingle carry no signal and are excluded (both engines).
    """
    return _semantic_vectors_of(load_table(spark, sf_dir, "documents").select("doc_id", "text"))


def _semantic_vectors_of(d: DataFrame) -> DataFrame:
    """The embedding pipeline over an arbitrary (doc_id, text) frame —
    shared by the batch dedup, the streaming admission tier (history
    index build + per-micro-batch probes), and the oracle replay."""
    from realtime_change_data_capture_streaming_spark.llm_ops.curation import hash_bucket

    sh = shingle_rows(d)
    counts = (
        sh.select("doc_id", hash_bucket(F.col("shingle"), _SEM_DIM).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    raw = (
        counts.groupBy("doc_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("b", "c"))).alias("m"))
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(_SEM_DIM - 1)),
                lambda i: F.coalesce(F.element_at("m", i.cast("bigint")), F.lit(0)).cast(
                    "double"
                ),
            ).alias("rv"),
        )
    )
    vec = raw.withColumn(
        "norm", F.sqrt(F.aggregate("rv", F.lit(0.0), lambda acc, x: acc + x * x))
    ).select("doc_id", F.transform("rv", lambda x: x / F.col("norm")).alias("vec"))
    # physical barrier (the with_tokens discipline): stop CollapseProject
    # from re-inlining the map->dense->normalize expression tree into every
    # downstream distance lambda, and spread the vectors across the
    # session's core count (the per-pair cosine folds downstream are the
    # hot stage and inherit this partitioning).  ``spread``, not a
    # hard-coded 32: the fixed-point centroid math is partition-invariant
    # by design, so the constant only tuned local[32] and mis-sized every
    # other core count (r16, guide §2.5 synthetic-key sizing).
    from realtime_change_data_capture_streaming_spark.operators._util import spread

    return spread(vec, "doc_id")


def _sem_assign(v: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid per document vector: squared L2 in double
    (left-to-right index-order fold, the cross-engine-exact shape), ties
    broken by the smaller cluster id — ``similarity._assign`` on doc
    vectors.  Centroids stay broadcast-size at any corpus scale."""
    scored = v.crossJoin(F.broadcast(cents)).withColumn(
        "dist",
        F.aggregate(
            F.zip_with("vec", "centroid", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, z: acc + z,
        ),
    )
    # argmin shuffles (doc_id, cluster, dist) ONLY — carrying the 128-dim
    # vector through the k-way-fanned-out aggregation moved ~k*|v| doubles
    # per pass; joining it back from the persisted vector table moves |v|
    assign = scored.groupBy("doc_id").agg(
        F.min_by("cluster", F.struct("dist", "cluster")).alias("cluster")
    )
    return v.join(assign, "doc_id").select("doc_id", "cluster", "vec")


def _sem_fit_centroids(spark: SparkSession, v: DataFrame, k: int) -> DataFrame:
    """Fixed-seed fixed-iteration k-means over a (persisted) vector
    table, returning the final (cluster, centroid) frame.  Seeds: the k
    smallest doc_ids (deterministic; TakeOrderedAndProject, not a
    global sort); cluster id = seed doc_id.  Per iteration the k*dim
    centroid table is COLLECTED and re-broadcast as literals — the
    MLlib k-means shape: centroids are model state, not data, and
    cutting the lineage there keeps iteration i+1 from re-executing
    every prior assignment under it.  Fixed-point means make centroids
    bit-identical under any partitioning (the ivf_model discipline).
    Shared by the batch SemDeDup tier and the streaming admission
    tier's history index build."""
    from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

    cent_schema = StructType(
        [
            StructField("cluster", LongType()),
            StructField("centroid", ArrayType(DoubleType())),
        ]
    )
    seed_rows = v.orderBy("doc_id").limit(k).collect()
    cents = spark.createDataFrame(
        [(r["doc_id"], r["vec"]) for r in seed_rows], cent_schema
    )
    for _ in range(_SEM_ITERS):
        assigned = _sem_assign(v, cents)
        cent_rows = (
            assigned.select("cluster", F.posexplode("vec").alias("dim", "x"))
            .withColumn("iv", F.floor(F.col("x") * F.lit(_SEM_FP)))
            .groupBy("cluster", "dim")
            .agg(F.sum("iv").alias("s"), F.count(F.lit(1)).alias("n"))
            .select(
                "cluster",
                "dim",
                ((F.col("s").cast("double") / F.col("n")) / F.lit(_SEM_FP)).alias("m"),
            )
            .collect()  # bounded: k * _SEM_DIM rows of model state
        )
        by_cluster: dict[int, list[float]] = {}
        for r in cent_rows:
            by_cluster.setdefault(r["cluster"], [0.0] * _SEM_DIM)[r["dim"]] = r["m"]
        cents = spark.createDataFrame(sorted(by_cluster.items()), cent_schema)
    return cents


def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup, SemDeDup-shaped (Abbas et al. 2023): k-means the
    document embeddings, then find near-duplicate pairs ONLY within each
    cluster — cluster-bounded candidate generation, never all-pairs.

    Pipeline: deterministic hashed-shingle embeddings on the unit sphere
    (``_semantic_vectors``) -> fixed-seed fixed-iteration k-means with
    fixed-point centroid means (the ``ivf_model`` reproducibility
    discipline — integer sums are associative, so centroids are
    bit-identical under any partitioning and replay in DuckDB) -> one
    intra-cluster self-join with a single dot-product fold (vectors are
    pre-normalized, so cosine IS the dot).  Drop rule is the one-round
    parallel variant of SemDeDup's greedy scan: doc b is dropped iff some
    same-cluster doc a < b has cosine >= tau; the emitted witness is the
    smallest such a.  (Sequential greedy keeps docs whose only witnesses
    were themselves dropped; the parallel rule — standard in distributed
    dedup, same keep-min-id convention as ``exact_dedup_groups`` — is
    order-free and one shuffle.)

    Scale: the embed+assign passes are linear scans with broadcast
    centroids; candidate volume is sum-of-squares of CLUSTER sizes, and
    k grows with the corpus (``n_docs // _SEM_TARGET``) so blocks stay
    ~``_SEM_TARGET`` docs at any scale — candidate volume ~N*TARGET/2,
    linear in N, never all-pairs.  Per iteration the k*dim centroid
    table is COLLECTED and re-broadcast as literals — the MLlib k-means
    shape: centroids are model state, not data (bounded at k*128
    doubles), and cutting the lineage there keeps iteration i+1 from
    re-executing every prior assignment under it.  The embedding table
    itself is persisted across the iterations (loop-invariant, the
    graph_pagerank discipline).  Recall vs the exact all-pairs drop set
    is pinned at 24/24 in tests/test_sketches.py.

    Oracle note: the DuckDB replay hard-codes k = ``_SEM_K``, which is
    what the adaptive formula yields for the <=512-doc parity fixtures
    (sf0.001/sf0.01, 500 docs); larger SFs run more clusters and are
    covered by the recall/scale tests, not the SQL oracle.
    """
    v = _semantic_vectors(spark, sf_dir).persist()
    n_docs = v.count()  # also materializes the persist
    k = max(_SEM_K, n_docs // _SEM_TARGET)
    cents = _sem_fit_centroids(spark, v, k)
    assigned = _sem_assign(v, cents).persist()
    a = assigned.select(
        F.col("doc_id").alias("witness_id"),
        F.col("cluster").alias("cl_a"),
        F.col("vec").alias("vec_a"),
    )
    b = assigned.select(
        F.col("doc_id").alias("drop_id"), F.col("cluster"), F.col("vec").alias("vec_b")
    )
    cos = F.aggregate(
        F.zip_with("vec_a", "vec_b", lambda x, y: x * y), F.lit(0.0), lambda acc, z: acc + z
    )
    pairs = (
        a.join(b, (F.col("cl_a") == F.col("cluster")) & (F.col("witness_id") < F.col("drop_id")))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= F.lit(_SEM_TAU))
    )
    return (
        pairs.groupBy("cluster", "drop_id")
        .agg(F.min_by(F.struct("witness_id", "cosine"), F.col("witness_id")).alias("w"))
        .select(
            "cluster",
            "drop_id",
            F.col("w.witness_id").alias("witness_id"),
            F.col("w.cosine").alias("cosine"),
        )
    )


def _semantic_sql() -> str:
    """DuckDB replay of dedup_semantic_clusters: same shingle hashing,
    same normalization, same seeds, same two fixed-point k-means
    iterations, same fold shapes, same tie-breaks.  The vector CTE is
    MATERIALIZED — it feeds three assignment passes plus the pair join,
    and DuckDB inlines plain CTEs per reference."""
    from realtime_change_data_capture_streaming_spark.llm_ops.curation import _bucket_sql

    dist = (
        "list_sum(list_transform(list_zip(e.vec, c.centroid), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )

    def assign(cents: str, name: str) -> str:
        return f"""{name} AS (
  SELECT doc_id, vec, cluster FROM (
    SELECT e.doc_id, e.vec, c.cluster,
           ROW_NUMBER() OVER (PARTITION BY e.doc_id ORDER BY {dist} ASC, c.cluster ASC) AS rk
    FROM v e CROSS JOIN {cents} c
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

    cos = "list_sum(list_transform(list_zip(a.vec, b.vec), p -> p[1] * p[2]))"
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
), cents0 AS (
  SELECT doc_id AS cluster, vec AS centroid FROM (SELECT * FROM v ORDER BY doc_id LIMIT {_SEM_K})
), {assign("cents0", "assign0")}
, {update("assign0", "cents1")}
, {assign("cents1", "assign1")}
, {update("assign1", "cents2")}
, {assign("cents2", "assign2")}
, simpairs AS (
  SELECT b.cluster AS cluster, b.doc_id AS drop_id, a.doc_id AS witness_id, {cos} AS cosine
  FROM assign2 a JOIN assign2 b ON a.cluster = b.cluster AND a.doc_id < b.doc_id
  WHERE {cos} >= {_SEM_TAU}
)
SELECT cluster, drop_id, witness_id, cosine FROM (
  SELECT cluster, drop_id, witness_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY drop_id ORDER BY witness_id ASC) AS rk
  FROM simpairs
) WHERE rk = 1
"""


SEMANTIC_DEDUP_SQL = _semantic_sql()


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash over the documents fixture — see simhash_of."""
    return simhash_of(spread(load_table(spark, sf_dir, "documents"), "doc_id"))


def simhash_of(d: DataFrame) -> DataFrame:
    """64-bit SimHash per document + two phase-offset 16-bit chunk tables
    (8 hamming-bucket keys).

    Bit i of the signature = sign of sum over tokens of (+1 if bit i of
    the token hash else -1), where bit i is bit (i mod 4) of hex nibble
    (i div 4) of md5(token) — a portable convention any md5-bearing
    engine replays (SIMHASH_SQL), which is what gives this sketch a real
    oracle.  Near-dups differ in few bits; the aligned chunk table
    (chunk_0..3, 16-bit windows at offsets 0/16/32/48) guarantees
    candidates within hamming distance 3 share a chunk; the second,
    8-bit-phase-offset table (chunk_4..7, windows at 8/24/40 plus the
    wrap-around window 56..62+0..7) catches most of the d=4..6 tail the
    first table misses — the standard multi-table SimHash recall/cost
    knob (2x bucket keys per doc in the LSH shuffle).  Hamming-vs-Jaccard
    recall is additionally pinned in tests/test_sketches.py.
    """
    toks = d.select("doc_id", F.explode_outer(tokens(F.col("text"))).alias("tok")).filter(
        F.col("tok").isNotNull()
    )
    hx = F.md5(F.col("tok"))
    # 16 hex nibbles -> 64 portable bits; computed once per token, reused
    # by 4 bit-sums each (projection below the aggregate)
    nibs = toks.select(
        "doc_id",
        *[
            F.conv(F.substring(hx, j + 1, 1), 16, 10).cast("int").alias(f"n{j}")
            for j in range(16)
        ],
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col(f"n{i // 4}"), i % 4).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(63)  # bit 63 never enters the signature (sign bit)
    ]
    agg = nibs.groupBy("doc_id").agg(*bit_sums)
    sig = agg.select(
        "doc_id",
        sum(
            (F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0)) for i in range(63)),
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    wrap = (
        F.shiftrightunsigned(F.col("simhash"), 56).bitwiseAND(F.lit(0x7F))
        + F.shiftleft(F.col("simhash").bitwiseAND(F.lit(0xFF)), 7)
    )
    return sig.select(
        "doc_id",
        "simhash",
        *[
            F.shiftrightunsigned(F.col("simhash"), 16 * c).bitwiseAND(F.lit(0xFFFF)).alias(f"chunk_{c}")
            for c in range(4)
        ],
        *[
            F.shiftrightunsigned(F.col("simhash"), 16 * c + 8).bitwiseAND(F.lit(0xFFFF)).alias(f"chunk_{4 + c}")
            for c in range(3)
        ],
        wrap.alias("chunk_7"),
    )


def _cc_star(edges: DataFrame, a: str, b: str, max_rounds: int = 40) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14): alternating
    star contractions shrink every path toward the component minimum
    multiplicatively, so convergence is O(log diameter) rounds — the
    adversarial-graph path (long chains) where plain min-label propagation
    needs O(diameter) rounds.

    large-star: every node attaches its LARGER neighbors to the minimum of
    its closed neighborhood; small-star: keyed by the larger endpoint,
    attaches the smaller neighbors (and itself) to that minimum.  Both are
    one groupBy + one co-partitioned join per round; at the fixpoint the
    edge set is a union of stars (child -> component min).
    """
    orig_nodes = (
        edges.select(F.col(a).alias("node"))
        .union(edges.select(F.col(b).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = (
        edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    converged = e.isEmpty()
    for _ in range(max_rounds):
        if converged:
            break
        # large-star
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("u", "mv").alias("m"))
        )
        lg = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star over the large-star output: key = larger endpoint
        dir_ = lg.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v"))
        mins2 = (
            dir_.groupBy("u")
            .agg(F.min("v").alias("m"))  # neighbors are all smaller than u
        )
        ss = (
            dir_.join(mins2, "u")
            .select(F.col("v").alias("child"), F.col("m"))
            .union(mins2.select(F.col("u").alias("child"), F.col("m")))
            .filter(F.col("child") != F.col("m"))
            .select(F.col("child").alias("u"), F.col("m").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        converged = ss.subtract(e).union(e.subtract(ss)).isEmpty()
        e = ss
    if not converged:
        raise RuntimeError(
            f"star contraction did not converge within max_rounds={max_rounds} "
            "— log-diameter rounds should be far below this; check for label "
            "overflow or a pathological edge stream"
        )
    comp = e.groupBy("u").agg(F.min("v").alias("component"))
    return orig_nodes.join(comp, orig_nodes.node == comp.u, "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )


def connected_components(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iters: int = 25,
    algorithm: str = "label",
) -> DataFrame:
    """Distributed connected components: (node, component) where component
    = min node id in the component.

    Near-dup pairs are only half the dedup story: keeping min(doc_id) per
    PAIR over-deletes when dups chain (a~b, b~c but not a~c).  Production
    pipelines cluster the candidate graph and keep one doc per component.

    ``algorithm="label"`` (default): each round every node adopts min(own
    label, neighbors' labels) — one join + one aggregate per round,
    converging in O(diameter) rounds.  Near-dup graphs are unions of small
    cliques (diameter ≲ 3), so this terminates in a handful of rounds even
    at 100 TB.  Labels are localCheckpointed each round to truncate
    lineage (iterative plans otherwise re-execute the whole prefix every
    round).

    ``algorithm="star"``: large-star/small-star contraction (see
    :func:`_cc_star`) converging in O(log diameter) rounds — the escape
    hatch for adversarially long paths.
    """
    if algorithm == "star":
        return _cc_star(edges, a, b)
    if algorithm != "label":
        raise ValueError(f"algorithm must be 'label' or 'star', got {algorithm!r}")
    sym = edges.select(F.col(a).alias("src"), F.col(b).alias("dst")).union(
        edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    )
    sym = sym.localCheckpoint(eager=True)  # edge set reused every round
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce("nbr_component", "component")).alias(
                    "component"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
        )
        labels = new_labels
        # bounded driver check: one count per round, rounds ~ diameter
        if changed.isEmpty():
            converged = True
            break
    if not converged:
        # labels short of the fixpoint are WRONG (over-split components) —
        # never return them silently
        raise RuntimeError(
            f"connected_components did not converge within max_iters={max_iters} "
            "(graph diameter exceeds the round budget); raise max_iters or call "
            "with algorithm='star' for log-diameter convergence"
        )
    return labels


def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters over the exact Jaccard candidate graph:
    (doc_id, component, component_size) — component = canonical kept doc.

    Edges are the oracle-checked ``ngram_jaccard_pairs`` (J >= 0.20), so
    the whole clustering is exactly reproducible in the DuckDB oracle via
    a recursive CTE (min reachable node == min-label fixpoint).
    """
    pairs = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs, "doc_a", "doc_b")
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("component_size"))
    return comp.join(sizes, "component").select(
        F.col("node").alias("doc_id"), "component", "component_size"
    )


# min reachable node over the symmetric closure == min-label fixpoint.
# UNION (not UNION ALL) dedups the frontier, guaranteeing termination.
def _dedup_cluster_sql(src: str = "documents", lead: str = "WITH RECURSIVE") -> str:
    """The connected-components closed form, parametrized like
    ``_ngram_jaccard_sql`` (``lead=","`` lets a caller prepend its own
    CTE under the outer WITH RECURSIVE)."""
    return f"""
{lead} pairs AS (
  {_ngram_jaccard_sql(src)}
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
), reach(node, r) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges) t
  UNION
  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r
), comp AS (
  SELECT node, MIN(r) AS component FROM reach GROUP BY node
)
SELECT node AS doc_id, component,
       COUNT(*) OVER (PARTITION BY component) AS component_size
FROM comp
"""


DEDUP_CLUSTER_SQL = _dedup_cluster_sql()


def dedup_kept_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DECISION applied: keep the min doc_id per normalized
    fingerprint, return the surviving documents — the output a training
    pipeline actually consumes."""
    d = load_table(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id", "lang", "source", F.md5(F.col("text").cast("binary")).alias("fp")
    )
    keep = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    return fp.join(keep, ["fp", "doc_id"], "left_semi").select("doc_id", "lang", "source", "fp")


DEDUP_KEPT_SQL = """
SELECT doc_id, lang, source, md5(text) AS fp
FROM documents
WHERE doc_id = (SELECT MIN(d2.doc_id) FROM documents d2 WHERE md5(d2.text) = md5(documents.text))
"""


# ------------------------------------------------- substring-level dedup

_SPAN_K = 8  # anchor width in tokens
_SPAN_MIN = 12  # minimal reported span length in tokens
_SPAN_MAX_OCC = 32  # corpus-wide occurrence cap per anchor (boilerplate bound)


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-SUBSTRING spans — the token-level tier the
    doc-level sketches miss (Lee et al., "Deduplicating Training Data
    Makes Language Models Better": training corpora repeat long spans
    *across* otherwise-distinct documents).  The exact method there is a
    corpus suffix array; this is the bounded seed-and-extend shape that
    fits a shuffle engine:

    1. anchor every K-token window by md5 (16-byte shuffle payload — the
       window text itself never shuffles);
    2. drop anchors occurring more than _SPAN_MAX_OCC times corpus-wide:
       the boilerplate cap that bounds every candidate-join block at
       MAX_OCC^2 pairs, which is what keeps the self-join linear-ish in
       corpus size instead of quadratic (high-frequency anchors are
       exactly the blocks that would explode, and spans made only of
       boilerplate are not the dedup target);
    3. self-join on the anchor hash (doc_a < doc_b) -> seed matches;
       the capped anchor table is materialized once (localCheckpoint)
       so both join sides read it instead of re-deriving the
       tokenize->window->hash pipeline;
    4. merge seeds on the same (pair, diagonal = pos_b - pos_a) into
       maximal spans with one islands-and-gaps window (consecutive
       pos_a runs), maximality per diagonal being exactly what
       seed-and-extend yields.

    Reported: every shared span >= _SPAN_MIN tokens with its start
    position in both documents.  Both phases replay in DuckDB."""
    return substring_spans_of(load_table(spark, sf_dir, "documents"))


def substring_spans_of(d: DataFrame) -> DataFrame:
    """Core of ``dedup_substring_spans`` over any (doc_id, text) frame."""
    from pyspark.sql import Window

    tokp = spread(d.select("doc_id", "text"), "doc_id").select(
        "doc_id", F.posexplode_outer(tokens(F.col("text"))).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    tri = tokp
    for i in range(1, _SPAN_K):
        tri = tri.withColumn(f"_t{i}", F.lead("tok", i).over(w))
    anch = tri.filter(F.col(f"_t{_SPAN_K - 1}").isNotNull()).select(
        "doc_id",
        "pos",
        F.md5(
            F.concat_ws(" ", "tok", *[f"_t{i}" for i in range(1, _SPAN_K)]).cast("binary")
        ).alias("h"),
    )
    # occurrence cap via a count window over h; localCheckpoint the capped
    # anchor table so the self-join reads ONE materialization instead of
    # re-deriving the tokenize->lead->md5->cap pipeline per join side
    # (same discipline as pq_codebook / connected components)
    anch = (
        anch.withColumn("occ", F.count(F.lit(1)).over(Window.partitionBy("h")))
        .filter(F.col("occ") <= _SPAN_MAX_OCC)
        .drop("occ")
        .localCheckpoint(eager=True)
    )
    a, b = anch.alias("a"), anch.alias("b")
    seeds = a.join(
        b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.pos").alias("pos_a"),
        F.col("b.pos").alias("pos_b"),
        (F.col("b.pos") - F.col("a.pos")).alias("diag"),
    )
    wi = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    isl = seeds.withColumn("grp", F.col("pos_a") - F.row_number().over(wi))
    return (
        isl.groupBy("doc_a", "doc_b", "diag", "grp")
        .agg(
            F.min("pos_a").cast("bigint").alias("start_a"),
            F.min("pos_b").cast("bigint").alias("start_b"),
            (F.count(F.lit(1)) + F.lit(_SPAN_K - 1)).cast("bigint").alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= _SPAN_MIN)
        .select("doc_a", "doc_b", "start_a", "start_b", "span_tokens")
    )


SUBSTRING_SPANS_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '') AS ts
  FROM documents
), anch AS (
  SELECT doc_id, i - 1 AS pos, md5(array_to_string(ts[i:i+{_SPAN_K - 1}], ' ')) AS h
  FROM toks, UNNEST(range(1, GREATEST(LEN(ts) - {_SPAN_K - 1}, 0) + 1)) AS t(i)
), capped AS (
  SELECT doc_id, pos, h FROM (
    SELECT doc_id, pos, h, COUNT(*) OVER (PARTITION BY h) AS occ FROM anch
  ) WHERE occ <= {_SPAN_MAX_OCC}
), seeds AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a, b.pos AS pos_b,
         b.pos - a.pos AS diag
  FROM capped a JOIN capped b ON a.h = b.h AND a.doc_id < b.doc_id
), isl AS (
  SELECT doc_a, doc_b, pos_a, pos_b, diag,
         pos_a - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS grp
  FROM seeds
)
SELECT doc_a, doc_b, start_a, start_b, span_tokens FROM (
  SELECT doc_a, doc_b,
         CAST(MIN(pos_a) AS BIGINT) AS start_a,
         CAST(MIN(pos_b) AS BIGINT) AS start_b,
         CAST(COUNT(*) + {_SPAN_K - 1} AS BIGINT) AS span_tokens
  FROM isl GROUP BY doc_a, doc_b, diag, grp
) WHERE span_tokens >= {_SPAN_MIN}
"""


def dedup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repeated-span coverage — the deletion criterion of
    substring-level dedup (Lee et al. drop/trim documents by how much of
    them is corpus-repeated text): fraction of each document's tokens
    covered by at least one cross-document span from
    ``dedup_substring_spans``.

    A document appears in many pairs with overlapping spans, so the
    intervals are merged first (classic islands: a row starts a new
    island when its start exceeds the running max end of earlier
    intervals — two windows over the per-doc ordering, no join).  The
    interval set is DISTINCT'd first: identical (doc, start, end) rows
    from different pairs would otherwise tie under the island ordering,
    and a running sum over tied rows is frame-order-dependent — the
    de-dup makes (start, end) a strict order per doc, so both window
    passes see one deterministic sequence (caught by a nondeterministic
    DuckDB replay before registration).  All
    arithmetic is integer token counts until the single output division.
    Only documents with at least one qualifying span are returned (the
    complement trivially has coverage 0)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    spans = substring_spans_of(d)
    iv = spans.select(
        F.col("doc_a").alias("doc_id"),
        F.col("start_a").alias("s"),
        (F.col("start_a") + F.col("span_tokens")).alias("e"),
    ).unionAll(
        spans.select(
            F.col("doc_b").alias("doc_id"),
            F.col("start_b").alias("s"),
            (F.col("start_b") + F.col("span_tokens")).alias("e"),
        )
    ).distinct()
    w = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    isl = iv.withColumn(
        "new_island", F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0)
    ).withColumn("island", F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    merged = isl.groupBy("doc_id", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    cov = merged.groupBy("doc_id").agg(F.sum(F.col("me") - F.col("ms")).alias("covered_tokens"))
    ntok = d.select("doc_id", F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"))
    return cov.join(ntok, "doc_id").select(
        "doc_id",
        "n_tokens",
        "covered_tokens",
        F.round(F.col("covered_tokens").cast("double") / F.col("n_tokens"), 6).alias("coverage"),
    )


SPAN_COVERAGE_SQL = f"""
WITH spans AS (
  SELECT * FROM ({SUBSTRING_SPANS_SQL})
), iv AS (
  SELECT DISTINCT doc_id, s, e FROM (
    SELECT doc_a AS doc_id, start_a AS s, start_a + span_tokens AS e FROM spans
    UNION ALL
    SELECT doc_b, start_b, start_b + span_tokens FROM spans
  )
), isl AS (
  SELECT doc_id, s, e,
         CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS new_island
  FROM (
    SELECT doc_id, s, e,
           MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
    FROM iv
  )
), grp AS (
  SELECT doc_id, s, e,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY s, e
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl
), merged AS (
  SELECT doc_id, island, MIN(s) AS ms, MAX(e) AS me FROM grp GROUP BY 1, 2
), cov AS (
  SELECT doc_id, CAST(SUM(me - ms) AS BIGINT) AS covered_tokens FROM merged GROUP BY 1
), ntok AS (
  SELECT doc_id,
         CAST(LEN(list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT c.doc_id, n.n_tokens, c.covered_tokens,
       ROUND(CAST(c.covered_tokens AS DOUBLE) / n.n_tokens, 6) AS coverage
FROM cov c JOIN ntok n ON n.doc_id = c.doc_id
"""


QUERIES = {
    "dedup_exact_groups": exact_dedup_groups,
    "dedup_kept_documents": dedup_kept_documents,
    "dedup_ngram_jaccard": ngram_jaccard_pairs,
    "dedup_shingle_containment": dedup_shingle_containment,
    "dedup_embedding_cosine": embedding_cosine_dedup,
    "dedup_semantic_clusters": dedup_semantic_clusters,
    "dedup_minhash_lsh": minhash_lsh_candidates,
    "dedup_simhash": simhash_signatures,
    "dedup_substring_spans": dedup_substring_spans,
    "dedup_span_coverage": dedup_span_coverage,
    "dedup_cluster_components": dedup_cluster_components,
}

ORACLE = {
    "dedup_exact_groups": EXACT_DEDUP_SQL,
    "dedup_kept_documents": DEDUP_KEPT_SQL,
    "dedup_ngram_jaccard": NGRAM_JACCARD_SQL,
    "dedup_shingle_containment": CONTAINMENT_SQL,
    "dedup_embedding_cosine": EMBEDDING_COSINE_DEDUP_SQL,
    "dedup_semantic_clusters": SEMANTIC_DEDUP_SQL,
    "dedup_cluster_components": DEDUP_CLUSTER_SQL,
    # md5-derived sketches since round 5 -> full hash oracle
    "dedup_minhash_lsh": MINHASH_LSH_SQL,
    "dedup_simhash": SIMHASH_SQL,
    "dedup_substring_spans": SUBSTRING_SPANS_SQL,
    "dedup_span_coverage": SPAN_COVERAGE_SQL,
}
