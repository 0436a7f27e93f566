"""Corpus-curation operators: the bookkeeping half of a training-data
pipeline — deterministic splits, stratified sampling, shard packing, and
PII scrubbing.  (The reference has no analytics surface; this extends
SURVEY.md §2.5's training-pipeline mandate.)

Everything here is hash-deterministic so reruns, replays, and cross-engine
oracles agree exactly:

- Split/sample decisions key off ``md5(doc_id)`` — the only hash both
  Spark and DuckDB compute identically (see tests/test_oracle_parity.py).
  No ``rand()``: a resampled corpus must be reproducible from the data
  alone, or incremental re-runs churn the training set.
- Shard packing is a running-sum window PARTITIONED BY ``lang``: each
  language packs independently, so the sort is per-partition, not global —
  the shape that survives 100 TB (a global ORDER BY window would funnel
  the corpus through one task).

Scale notes (100 TB):
- ``assign_split``/``stratified_sample`` are pure narrow projections —
  no shuffle at all; they pipeline into whatever follows.
- ``pack_token_shards`` shuffles once on the stratum key and sorts within
  partitions (window PARTITION BY lang ORDER BY doc_id).  With skewed
  strata, sub-stratify (e.g. lang + md5-prefix) and renumber shards by
  offset — same plan shape.
- ``scrub_pii`` is regexp_replace chains — whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.llm_ops.text import tokens
from realtime_change_data_capture_streaming_spark.sources.tables import load_table


def hash_bucket(col: Column, n_buckets: int = 100) -> Column:
    """Deterministic cross-engine bucket in [0, n_buckets): first 8 hex
    chars of md5 as an integer.  Uniform enough for splits/sampling; NOT a
    crypto boundary."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint") % n_buckets


def _bucket_sql(expr: str, n_buckets: int = 100) -> str:
    return f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8))::UBIGINT % {n_buckets} AS BIGINT)"


def assign_split(df: DataFrame, key_col: str = "doc_id", train: int = 90, val: int = 5) -> DataFrame:
    """train/val/test assignment from the key hash alone: stable under
    reruns, appends, and repartitioning (no rand(), no row numbering)."""
    b = hash_bucket(F.col(key_col))
    return df.withColumn(
        "split",
        F.when(b < train, F.lit("train")).when(b < train + val, F.lit("val")).otherwise(F.lit("test")),
    )


def curation_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-split document and token counts — the sanity dashboard any
    pipeline prints before training starts."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(tokens(F.col("text"))).cast("bigint")
    return (
        assign_split(d)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok).alias("n_tokens"),
        )
    )


CURATION_SPLIT_SQL = f"""
WITH assigned AS (
  SELECT CASE WHEN {_bucket_sql('doc_id')} < 90 THEN 'train'
              WHEN {_bucket_sql('doc_id')} < 95 THEN 'val'
              ELSE 'test' END AS split,
         CAST(LEN(list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '')) AS BIGINT) AS n_tok
  FROM documents
)
SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM assigned GROUP BY split
"""


def stratified_sample(
    df: DataFrame, rates: dict[str, int], stratum_col: str = "lang", key_col: str = "doc_id"
) -> DataFrame:
    """Keep ``rates[stratum]`` percent of each stratum, hash-deterministic.

    The per-stratum rate is a broadcastable CASE expression (rates are
    config, not data) — the filter stays in the scan's codegen stage."""
    b = hash_bucket(F.col(key_col))
    rate = F.lit(None).cast("bigint")
    expr = None
    for stratum, pct in sorted(rates.items()):
        cond = F.col(stratum_col) == stratum
        expr = F.when(cond, F.lit(pct)) if expr is None else expr.when(cond, F.lit(pct))
    rate = expr.otherwise(F.lit(0))
    return df.filter(b < rate)


_SAMPLE_RATES = {"en": 80, "de": 50, "fr": 50, "es": 25, "zz": 10}


def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    kept = stratified_sample(d, _SAMPLE_RATES)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("n_chars")).cast("bigint").alias("chars_kept"),
    )


_RATE_CASE = " ".join(
    f"WHEN lang = '{s}' THEN {p}" for s, p in sorted(_SAMPLE_RATES.items())
)

CURATION_SAMPLE_SQL = f"""
SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS chars_kept
FROM documents
WHERE {_bucket_sql('doc_id')} < (CASE {_RATE_CASE} ELSE 0 END)
GROUP BY lang
"""


def pack_token_shards(df: DataFrame, budget: int, stratum_col: str = "lang") -> DataFrame:
    """Assign documents to fixed-token-budget shards within each stratum.

    Greedy sequential packing in deterministic (stratum, doc_id) order:
    shard = floor(tokens-before-this-doc / budget).  A document never
    splits; shards overflow by at most one document — the standard
    pretraining sharder.  One shuffle (hash by stratum), per-partition
    sort, no global order."""
    n_tok = F.size(tokens(F.col("text"))).cast("bigint")
    w = (
        Window.partitionBy(stratum_col)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = df.withColumn("n_tokens", n_tok)
    return d.select(
        "doc_id",
        F.col(stratum_col),
        "n_tokens",
        F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / budget).alias("shard_id"),
    )


def curation_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return pack_token_shards(d, budget=2000)


CURATION_PACK_SQL = """
WITH toks AS (
  SELECT doc_id, lang,
         CAST(LEN(list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, lang, n_tokens,
       CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  / 2000) AS BIGINT) AS shard_id
FROM toks
"""


# Portable regex subset (no \\d, no lookaround): same behavior in Spark's
# java.util.regex and DuckDB's RE2.
_PII_PATTERNS = (
    ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"),
    ("ipv4", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"),
    ("phone", "\\+[0-9]{7,15}"),
)


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4s / E.164 phones, and count each redaction.

    Counts come from regexp_count BEFORE replacement; replacement chains
    regexp_replace (replace-all in both engines).  All codegen, no UDF."""
    col = F.col(text_col)
    out = df
    for name, pat in _PII_PATTERNS:
        out = out.withColumn(f"n_{name}", F.regexp_count(col, F.lit(pat)).cast("bigint"))
    scrubbed = col
    for name, pat in _PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name}>")
    return out.withColumn("scrubbed", scrubbed)


def curation_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub a synthetic contact line appended to each fixture doc (the
    fixture corpus is word-salad with no organic PII — the appended line
    makes the redaction observable and exactly checkable)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1555"),
            F.format_string("%07d", (F.col("doc_id") % 1000000).cast("int")),
            F.lit(" at 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
        ).alias("text"),
    )
    s = scrub_pii(d)
    return s.select(
        "doc_id",
        "n_email",
        "n_ipv4",
        "n_phone",
        F.length("scrubbed").cast("bigint").alias("scrubbed_len"),
        F.md5("scrubbed").alias("scrubbed_md5"),
    )


CURATION_PII_SQL = """
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1555'
              || format('{:07d}', doc_id % 1000000) || ' at 10.0.'
              || CAST(doc_id % 256 AS VARCHAR) || '.7' AS text
  FROM documents
), counted AS (
  SELECT doc_id, text,
         CAST(LEN(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS BIGINT) AS n_email,
         CAST(LEN(regexp_extract_all(text, '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS BIGINT) AS n_ipv4,
         CAST(LEN(regexp_extract_all(text, '\\+[0-9]{7,15}')) AS BIGINT) AS n_phone
  FROM aug
)
SELECT doc_id, n_email, n_ipv4, n_phone,
       CAST(LENGTH(scrubbed) AS BIGINT) AS scrubbed_len,
       md5(scrubbed) AS scrubbed_md5
FROM (
  SELECT *,
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<email>', 'g'),
             '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}', '<ipv4>', 'g'),
           '\\+[0-9]{7,15}', '<phone>', 'g') AS scrubbed
  FROM counted
)
"""


def curation_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-based quality gate: keep each language's top-half documents
    by type-token ratio — the distribution-relative filtering step real
    corpus pipelines run after absolute-threshold filters.

    percent_rank over a TOTAL order (score, then doc_id as tiebreak) makes
    the cutoff deterministic and cross-engine exact: rank arithmetic is
    integer math, and the score itself is an int/int double division.
    One shuffle on the stratum key; no global sort.

    Zero-token documents are excluded BEFORE scoring: int/0 division is
    engine-divergent (Spark non-ANSI yields NULL, which sorts first;
    IEEE engines yield NaN, which sorts last), so letting them through
    would shift percent_rank — and a document with no tokens has no
    quality signal to rank anyway."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    scored = d.filter(F.size(toks) > 0).select(
        "doc_id",
        "lang",
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias("score"),
    )
    w = Window.partitionBy("lang").orderBy("score", "doc_id")
    return (
        scored.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= 0.5)
        .select("doc_id", "lang", "score", "pr")
    )


CURATION_QUALITY_SQL = """
WITH scored AS (
  SELECT doc_id, lang,
         CAST(LEN(list_distinct(list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != ''))) AS DOUBLE)
         / LEN(list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '')) AS score
  FROM documents
  WHERE LEN(list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '')) > 0
)
SELECT doc_id, lang, score, pr FROM (
  SELECT *, percent_rank() OVER (PARTITION BY lang ORDER BY score, doc_id) AS pr
  FROM scored
) WHERE pr >= 0.5
"""


#: tokenizer CTE shared by the shingle-based oracles below (identical to
#: dedup.NGRAM_JACCARD_SQL's): 3-word shingles, DISTINCT per doc.
_SHINGLES_CTE = """
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '') AS ts
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, source, array_to_string(ts[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(range(1, GREATEST(LEN(ts) - 2, 0) + 1)) AS t(i)
)
"""


BOILERPLATE_DOC_FRAC = 0.02


def curation_boilerplate_ngrams(
    spark: SparkSession, sf_dir: str, min_doc_frac: float = BOILERPLATE_DOC_FRAC
) -> DataFrame:
    """Boilerplate phrase detection: 3-gram shingles occurring in >=
    ``min_doc_frac`` of a source's documents — the cross-document
    repetition signal corpus pipelines use to strip navigation chrome /
    license headers before training (line-level in production;
    shingle-level here because the fixture text is unstructured).

    The threshold is a parameter (default 2%): the right cut depends on
    the corpus's shingle distribution, and a too-high fixed cut returns
    an empty (untestable) result on natural-ish text where even common
    phrases rarely clear 10% of a source.

    Shape: shingle rows -> count distinct docs per (source, shingle) ->
    ratio against per-source doc counts (broadcast: one row per source).
    One shuffle on (source, shingle); the doc-count side is O(sources).
    """
    from realtime_change_data_capture_streaming_spark.llm_ops.dedup import shingle_rows

    d = load_table(spark, sf_dir, "documents")
    sh = shingle_rows(d).select("doc_id", "source", "shingle")
    per_shingle = sh.groupBy("source", "shingle").agg(F.count(F.lit(1)).alias("n_docs"))
    per_src = d.groupBy("source").agg(F.countDistinct("doc_id").alias("n_src_docs"))
    return (
        per_shingle.join(F.broadcast(per_src), "source")
        .withColumn("doc_frac", F.col("n_docs").cast("double") / F.col("n_src_docs"))
        .filter(F.col("doc_frac") >= min_doc_frac)
        .select("source", "shingle", "n_docs", "doc_frac")
    )


CURATION_BOILERPLATE_SQL = f"""
{_SHINGLES_CTE}
, per_shingle AS (
  SELECT source, shingle, COUNT(*) AS n_docs FROM sh GROUP BY 1, 2
), per_src AS (
  SELECT source, COUNT(DISTINCT doc_id) AS n_src_docs FROM documents GROUP BY source
)
SELECT x.source, x.shingle, x.n_docs,
       CAST(x.n_docs AS DOUBLE) / p.n_src_docs AS doc_frac
FROM per_shingle x JOIN per_src p ON p.source = x.source
WHERE CAST(x.n_docs AS DOUBLE) / p.n_src_docs >= {BOILERPLATE_DOC_FRAC}
"""


def curation_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination scan: training docs sharing >= 2 distinct
    3-gram shingles with any doc in the held-out set (``doc_id % 97 == 0``
    stands in for the benchmark corpus).

    The benchmark side is tiny relative to the corpus, so its shingles
    BROADCAST and the scan stays one pass over training shingles — the
    shape that lets decontamination run over 100 TB without a shuffle of
    the training side.  (A benchmark too large to broadcast falls back to
    the same bucketed join as MinHash-LSH candidates.)
    """
    from realtime_change_data_capture_streaming_spark.llm_ops.dedup import shingle_rows

    d = load_table(spark, sf_dir, "documents")
    sh = shingle_rows(d).select("doc_id", "shingle")
    bench = sh.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_doc"), "shingle"
    )
    train = sh.filter(F.col("doc_id") % 97 != 0).select(
        F.col("doc_id").alias("train_doc"), "shingle"
    )
    return (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("train_doc", "bench_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


CURATION_CONTAMINATION_SQL = f"""
{_SHINGLES_CTE}
SELECT a.doc_id AS train_doc, b.doc_id AS bench_doc, COUNT(*) AS n_shared
FROM sh a JOIN sh b ON a.shingle = b.shingle
WHERE b.doc_id % 97 = 0 AND a.doc_id % 97 <> 0
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""


def curation_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted deterministic sampling: each document keeps with
    probability proportional to its token count (capped at 1) — the
    "sample long documents preferentially" knob of corpus mixing, with
    the same no-rand() reproducibility discipline as assign_split.

    u = md5-bucket(doc_id)/1e6 is a deterministic uniform in [0,1);
    keep iff u < least(1, n_tokens/500).  Pure narrow projection+filter:
    stays in the scan's codegen stage, no shuffle before the final agg."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(tokens(F.col("text")))
    weight = F.least(F.lit(1.0), n_tok.cast("double") / F.lit(500.0))
    u = hash_bucket(F.col("doc_id"), 1_000_000).cast("double") / F.lit(1_000_000.0)
    return (
        d.filter(u < weight)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(n_tok).cast("bigint").alias("tokens_kept"),
        )
    )


CURATION_WEIGHTED_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang,
         LEN(list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '')) AS n_tok
  FROM documents
)
SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_tok) AS BIGINT) AS tokens_kept
FROM toks
WHERE CAST({_bucket_sql("doc_id", 1_000_000)} AS DOUBLE) / 1000000.0 < LEAST(1.0, CAST(n_tok AS DOUBLE) / 500.0)
GROUP BY lang
"""


def curation_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the split key is the document's
    NEAR-DUP CLUSTER representative, not the document id — so a near-dup
    pair can never straddle the train/test boundary (the contamination
    path a doc-keyed split leaves open).  Clusters come from connected
    components over the exact-Jaccard candidate graph; singletons key on
    their own id.  One left join of docs to the (small) clustered-node
    set; the split itself stays a pure hash expression.  Invariant (no
    cluster spans splits) is pinned in tests/test_scd2.py's sibling,
    tests/test_text_ops.py."""
    from realtime_change_data_capture_streaming_spark.llm_ops.dedup import connected_components, ngram_jaccard_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs, "doc_a", "doc_b")
    rep = d.join(comp, d.doc_id == comp.node, "left").select(
        "doc_id",
        F.col("component").isNotNull().alias("clustered"),
        F.coalesce("component", "doc_id").alias("rep"),
    )
    assigned = assign_split(rep, key_col="rep")
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("clustered").cast("bigint")).alias("n_clustered_docs"),
    )


CURATION_CLUSTER_SPLIT_SQL = f"""
WITH RECURSIVE pairs AS (
  {{jaccard}}
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
), assigned AS (
  SELECT d.doc_id, c.component IS NOT NULL AS clustered,
         COALESCE(c.component, d.doc_id) AS rep
  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
)
SELECT CASE WHEN {_bucket_sql('rep')} < 90 THEN 'train'
            WHEN {_bucket_sql('rep')} < 95 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN clustered THEN 1 ELSE 0 END) AS BIGINT) AS n_clustered_docs
FROM assigned GROUP BY 1
"""


def _cluster_split_sql() -> str:
    from realtime_change_data_capture_streaming_spark.llm_ops.dedup import NGRAM_JACCARD_SQL

    return CURATION_CLUSTER_SPLIT_SQL.format(jaccard=NGRAM_JACCARD_SQL)


def curation_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened domain mixture: per-source sampling shares
    proportional to n_docs^0.5 — the standard rebalancing that keeps huge
    web domains from drowning small high-quality ones (temperature 0.5;
    0.7-style exponents need libm pow, whose rounding differs between
    engines, while sqrt is IEEE-correctly-rounded everywhere).

    Reproducible-share discipline: summing 20 double weights is order-
    dependent, so weights become fixed-point bigints (floor(sqrt(n)*2^20))
    whose sum is exact; the share is one double division of two exact
    integers.  One hash agg + one broadcast scalar join."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    wfp = F.floor(F.sqrt(F.col("n_docs").cast("double")) * F.lit(float(1 << 20))).cast(
        "bigint"
    )
    weighted = counts.withColumn("w_fp", wfp)
    total = weighted.agg(F.sum("w_fp").alias("total_fp"))
    return (
        weighted.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            (F.col("w_fp").cast("double") / F.col("total_fp")).alias("mixture_share"),
        )
    )


CURATION_MIXTURE_SQL = """
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
), weighted AS (
  SELECT source, n_docs,
         CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1048576.0) AS BIGINT) AS w_fp
  FROM counts
)
SELECT source, n_docs,
       CAST(w_fp AS DOUBLE) / (SELECT CAST(SUM(w_fp) AS BIGINT) FROM weighted) AS mixture_share
FROM weighted
"""



_CHUNK_W = 32  # tokens per chunk
_CHUNK_STRIDE = 24  # overlap = W - stride


def curation_chunk_documents(spark, sf_dir: str):
    """Sliding-window document chunking — the RAG/embedding-pipeline
    primitive: each doc becomes overlapping token windows of _CHUNK_W
    tokens at _CHUNK_STRIDE offsets (offsets 0, 24, 48, ... below the
    token count; the tail chunk is short).

    One tokenize pass, chunk offsets as a per-row sequence+filter (no
    join against a spine), explode, slice — all codegen expressions;
    output is the chunk table a downstream embedder consumes.  At 100 TB
    chunking is embarrassingly parallel per doc; the only data growth is
    the overlap factor W/stride."""
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens(F.col("text")).alias("ts")).withColumn(
        "n_toks", F.size("ts")
    ).filter(F.col("n_toks") > 0)
    offs = F.filter(
        F.sequence(F.lit(0), F.col("n_toks"), F.lit(_CHUNK_STRIDE)),
        lambda o: o < F.col("n_toks"),
    )
    chunks = toks.select(
        "doc_id", "ts", "n_toks", F.explode(offs).alias("off")
    ).withColumn("chunk", F.slice("ts", F.col("off") + 1, _CHUNK_W))
    return chunks.select(
        "doc_id",
        (F.col("off") / _CHUNK_STRIDE).cast("bigint").alias("chunk_id"),
        F.size("chunk").cast("bigint").alias("n_chunk_tokens"),
        F.element_at("chunk", 1).alias("first_token"),
        F.element_at("chunk", -1).alias("last_token"),
    )


CURATION_CHUNK_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'),
                     t -> t != '') AS ts
  FROM documents
), sized AS (
  SELECT doc_id, ts, len(ts) AS n_toks FROM toks WHERE len(ts) > 0
), chunks AS (
  SELECT doc_id, o.off AS off, list_slice(ts, o.off + 1, o.off + {_CHUNK_W}) AS chunk
  FROM sized, UNNEST(range(0, n_toks, {_CHUNK_STRIDE})) AS o(off)
)
SELECT doc_id,
       CAST(off / {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
       chunk[1] AS first_token,
       chunk[len(chunk)] AS last_token
FROM chunks
"""


_COVERAGE_DROP = 0.5  # drop docs with >= 50% of tokens inside cross-doc repeated spans


def curation_pipeline_summary(spark, sf_dir: str):
    """The curation FUNNEL, end to end in one query — per language, the
    document counts surviving each staged gate, composed from the same
    primitives the standalone operators use (so the composite cannot
    drift from its parts):

      n_raw -> n_tokenized (drop zero-token docs)
             -> n_quality  (top-half type-token ratio per language)
             -> n_unique   (exact dedup among survivors: keep min doc_id
                            per md5(text) — dedup AFTER quality, so a
                            high-quality copy survives even when its
                            duplicate scored lower)
             -> n_span_clean (drop docs >= 50% covered by cross-document
                              repeated spans — the substring tier's
                              deletion criterion), plus tokens_kept.

    One pass computes per-doc flags (two windows: the per-lang quality
    rank, the per-fingerprint min-id), one left join attaches span
    coverage, one hash agg folds the funnel — the fact table is scanned
    once, the spans pipeline once."""
    from realtime_change_data_capture_streaming_spark.llm_ops.dedup import dedup_span_coverage

    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    base = d.select(
        "doc_id",
        "lang",
        F.md5(F.col("text").cast("binary")).alias("fp"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias("score"),
    )
    flagged = (
        base.withColumn("is_tok", F.col("n_tokens") > 0)
        .withColumn(
            "pr",
            F.when(
                F.col("is_tok"),
                F.percent_rank().over(
                    Window.partitionBy("lang", "is_tok").orderBy("score", "doc_id")
                ),
            ),
        )
        .withColumn("is_q", F.col("is_tok") & (F.col("pr") >= 0.5))
    )
    wf = Window.partitionBy("fp", "is_q")
    flagged = flagged.withColumn(
        "is_uniq", F.col("is_q") & (F.col("doc_id") == F.min("doc_id").over(wf))
    )
    cov = dedup_span_coverage(spark, sf_dir).select("doc_id", "coverage")
    j = flagged.join(cov, "doc_id", "left").withColumn(
        "is_clean",
        F.col("is_uniq") & (F.coalesce("coverage", F.lit(0.0)) < F.lit(_COVERAGE_DROP)),
    )
    cnt = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0)).cast("bigint").alias(c.replace("is_", "n_"))
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_raw"),
        cnt("is_tok"),
        cnt("is_q"),
        cnt("is_uniq"),
        cnt("is_clean"),
        F.sum(F.when(F.col("is_clean"), F.col("n_tokens")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("tokens_kept"),
    ).select(
        "lang",
        "n_raw",
        F.col("n_tok").alias("n_tokenized"),
        F.col("n_q").alias("n_quality"),
        F.col("n_uniq").alias("n_unique"),
        F.col("n_clean").alias("n_span_clean"),
        "tokens_kept",
    )


def _pipeline_sql() -> str:
    from realtime_change_data_capture_streaming_spark.llm_ops.dedup import SPAN_COVERAGE_SQL

    tok = "list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '')"
    return f"""
WITH base AS (
  SELECT doc_id, lang, md5(text) AS fp,
         CAST(LEN({tok}) AS BIGINT) AS n_tokens,
         CAST(LEN(list_distinct({tok})) AS DOUBLE) / NULLIF(LEN({tok}), 0) AS score
  FROM documents
), flagged AS (
  SELECT *, (n_tokens > 0) AS is_tok,
         CASE WHEN n_tokens > 0 THEN
           percent_rank() OVER (PARTITION BY lang, (n_tokens > 0) ORDER BY score, doc_id)
         END AS pr
  FROM base
), q AS (
  SELECT *, (is_tok AND pr >= 0.5) AS is_q FROM flagged
), u AS (
  SELECT *, (is_q AND doc_id = MIN(doc_id) OVER (PARTITION BY fp, is_q)) AS is_uniq FROM q
), cov AS (
  SELECT doc_id, coverage FROM ({SPAN_COVERAGE_SQL})
), j AS (
  SELECT u.*, (is_uniq AND COALESCE(cov.coverage, 0.0) < {_COVERAGE_DROP}) AS is_clean
  FROM u LEFT JOIN cov ON cov.doc_id = u.doc_id
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_raw,
       CAST(SUM(CASE WHEN is_tok THEN 1 ELSE 0 END) AS BIGINT) AS n_tokenized,
       CAST(SUM(CASE WHEN is_q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       CAST(SUM(CASE WHEN is_uniq THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(SUM(CASE WHEN is_clean THEN 1 ELSE 0 END) AS BIGINT) AS n_span_clean,
       CAST(SUM(CASE WHEN is_clean THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept
FROM j GROUP BY lang
"""


CURATION_PIPELINE_SQL = _pipeline_sql()


_SHUFFLE_EPOCHS = (0, 1)
_SHUFFLE_HEAD = 10


def curation_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic EPOCH-WISE training-order shuffle: a data loader
    must visit every document once per epoch in a pseudorandom order
    that (a) differs between epochs, (b) is identical on every re-run /
    every worker topology — seeded RNG state does not survive
    repartitioning, but ORDER BY md5(epoch || doc_id) does.  At scale
    the order is realized by a range-partitioned sort on the hash key
    (no global single-partition stage); here the query surfaces each
    epoch's HEAD (orderBy+limit, then a window over the limited rows) so
    the orders themselves are hash-checked cross-engine."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    out = None
    for epoch in _SHUFFLE_EPOCHS:
        key = F.md5(
            F.concat(F.lit(f"{epoch}|"), F.col("doc_id").cast("string")).cast("binary")
        )
        top = (
            d.select(F.lit(epoch).cast("bigint").alias("epoch"), "doc_id", key.alias("k"))
            .orderBy(F.asc("k"), F.asc("doc_id"))
            .limit(_SHUFFLE_HEAD)
        )
        w = Window.orderBy(F.asc("k"), F.asc("doc_id"))
        e = top.withColumn("position", F.row_number().over(w).cast("bigint")).select(
            "epoch", "position", "doc_id"
        )
        out = e if out is None else out.unionByName(e)
    return out


_EPOCH_SHUFFLE_SQL = "\nUNION ALL\n".join(
    f"""SELECT * FROM (
  SELECT CAST({epoch} AS BIGINT) AS epoch,
         CAST(ROW_NUMBER() OVER (ORDER BY md5('{epoch}|' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS BIGINT) AS position,
         doc_id
  FROM documents
  ORDER BY md5('{epoch}|' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
  LIMIT {_SHUFFLE_HEAD}
)"""
    for epoch in _SHUFFLE_EPOCHS
)


QUERIES = {
    "curation_epoch_shuffle": curation_epoch_shuffle,
    "curation_split_counts": curation_split_counts,
    "curation_cluster_safe_split": curation_cluster_safe_split,
    "curation_domain_mixture": curation_domain_mixture,
    "curation_stratified_sample": curation_stratified_sample,
    "curation_pack_shards": curation_pack_shards,
    "curation_scrub_pii": curation_scrub_pii,
    "curation_pipeline_summary": curation_pipeline_summary,
    "curation_quality_filter": curation_quality_filter,
    "curation_boilerplate_ngrams": curation_boilerplate_ngrams,
    "curation_contamination_overlap": curation_contamination_overlap,
    "curation_sample_weighted": curation_sample_weighted,
    "curation_chunk_documents": curation_chunk_documents,
}

ORACLE = {
    "curation_epoch_shuffle": _EPOCH_SHUFFLE_SQL,
    "curation_split_counts": CURATION_SPLIT_SQL,
    "curation_cluster_safe_split": _cluster_split_sql(),
    "curation_domain_mixture": CURATION_MIXTURE_SQL,
    "curation_stratified_sample": CURATION_SAMPLE_SQL,
    "curation_pack_shards": CURATION_PACK_SQL,
    "curation_scrub_pii": CURATION_PII_SQL,
    "curation_pipeline_summary": CURATION_PIPELINE_SQL,
    "curation_quality_filter": CURATION_QUALITY_SQL,
    "curation_boilerplate_ngrams": CURATION_BOILERPLATE_SQL,
    "curation_contamination_overlap": CURATION_CONTAMINATION_SQL,
    "curation_sample_weighted": CURATION_WEIGHTED_SQL,
    "curation_chunk_documents": CURATION_CHUNK_SQL,
}
