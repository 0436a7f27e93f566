"""Text analysis over the ``documents`` fixture: tokenization, quality
scoring, language ID, fingerprinting.

Everything is built-in expression work (split/regexp/aggregate) — at
100 TB this is a single scan with no shuffle except the final group-bys;
no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


from realtime_change_data_capture_streaming_spark.sources.tables import load_table

#: tiny multilingual stopword list for quality/language heuristics
_EN_STOP = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(col: Column) -> Column:
    """Whitespace tokenization of lowercased, punctuation-stripped text.
    Portable regex subset only ([^a-z0-9 ], ' +') so oracle SQL matches."""
    cleaned = F.regexp_replace(F.lower(col), "[^a-z0-9 ]", "")
    return F.filter(F.split(F.trim(cleaned), " +"), lambda t: t != "")


def with_tokens(df: DataFrame, text_col: str = "text", out_col: str = "_toks") -> DataFrame:
    """Attach the token array as a column, spreading narrow scans.

    The repartition fires ONLY when the scan's file-split estimate is
    below the core count (the ``spread`` rule, r16): its one remaining
    job is parallelizing the CPU-bound regex work over a single small
    local file.  It is no longer a mandatory CollapseProject barrier —
    Spark 4's CollapseProject refuses to duplicate non-cheap expressions
    into multiple consumers (the r16 A/B read ONE regexp evaluation in
    every variant's plan, and the unconditional repartition measured 2x
    the no-shuffle plan locally; ``tests/test_plans.py`` pins the
    single-evaluation property mechanically).  On a wide input the old
    form shuffled the whole corpus WITH its materialized token arrays —
    strictly worse than re-reading the scan.
    """
    out = df.withColumn(out_col, tokens(F.col(text_col)))
    n = df.sparkSession.sparkContext.defaultParallelism
    from realtime_change_data_capture_streaming_spark.plans.introspect import (
        estimated_scan_partitions_ex,
    )

    est, statable = estimated_scan_partitions_ex(df)
    # conservative branch for THIS consumer: an unstatable input keeps
    # the repartition (the pre-r16 behavior), it never skips on a guess
    if statable and est >= n:
        return out
    return out.repartition(n)


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts + char stats (the `wc` of the pipeline)."""
    # materialize the token array ONCE: higher-order fns are interpreted,
    # so a lambda over tokens(text) would re-run the regex pipeline per
    # array element if passed as an expression tree
    d = with_tokens(load_table(spark, sf_dir, "documents"))
    toks = F.col("_toks")
    return d.select(
        "doc_id",
        "lang",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique_tokens"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
        (F.length("text") - F.length(F.regexp_replace("text", " ", ""))).cast("bigint").alias("n_spaces"),
        # BPE-ish regex token count: word pieces / digit runs / other
        # symbols counted separately (the pre-tokenizer split a BPE would
        # see); portable regex subset so the oracle matches
        F.regexp_count(F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("bigint").alias("n_bpe_pretokens"),
    )


TOKEN_STATS_SQL = r"""
WITH toks AS (
  SELECT doc_id, lang, text,
         list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '') AS ts
  FROM documents
)
SELECT doc_id, lang,
       CAST(LEN(ts) AS BIGINT) AS n_tokens,
       CAST(LEN(list_distinct(ts)) AS BIGINT) AS n_unique_tokens,
       CAST(LENGTH(text) AS BIGINT) AS n_chars_actual,
       CAST(LENGTH(text) - LENGTH(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
       CAST(LEN(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe_pretokens
FROM toks
"""


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: length band, stopword ratio, mean token
    length, type-token ratio.  Ratios are int/int double divisions —
    bit-identical cross-engine."""
    d = with_tokens(load_table(spark, sf_dir, "documents"))
    toks = F.col("_toks")
    stop_arr = F.array(*[F.lit(s) for s in _EN_STOP])
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return d.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        (n_stop.cast("double") / n_tok).alias("stopword_ratio"),
        (F.size(F.array_distinct(toks)).cast("double") / n_tok).alias("type_token_ratio"),
        (
            F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)).cast("double")
            / n_tok
        ).alias("mean_token_len"),
        (n_tok >= 50).alias("len_ok"),
    )


QUALITY_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '') AS ts
  FROM documents
)
SELECT doc_id,
       CAST(LEN(ts) AS BIGINT) AS n_tokens,
       CAST(LEN(list_filter(ts, t -> list_contains(['the','a','of','and','to','in','is','it'], t))) AS DOUBLE) / LEN(ts) AS stopword_ratio,
       CAST(LEN(list_distinct(ts)) AS DOUBLE) / LEN(ts) AS type_token_ratio,
       CAST(list_sum(list_transform(ts, t -> LENGTH(t))) AS DOUBLE) / LEN(ts) AS mean_token_len,
       LEN(ts) >= 50 AS len_ok
FROM toks
"""


def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword language heuristic + agreement with the labeled lang.
    (The fixture text is synthetic word-salad, so the value here is the
    operator shape: per-class match counts, deterministic heuristic.)"""
    d = with_tokens(load_table(spark, sf_dir, "documents"))
    toks = F.col("_toks")
    stop_arr = F.array(*[F.lit(s) for s in _EN_STOP])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    predicted = (
        F.when(stop_hits.cast("double") / F.size(toks) > 0.05, F.lit("en")).otherwise(F.lit("other"))
    )
    return (
        d.select("lang", predicted.alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


LANGUAGE_ID_SQL = """
WITH toks AS (
  SELECT lang,
         list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '') AS ts
  FROM documents
), pred AS (
  SELECT lang,
         CASE WHEN CAST(LEN(list_filter(ts, t -> list_contains(['the','a','of','and','to','in','is','it'], t))) AS DOUBLE) / LEN(ts) > 0.05
              THEN 'en' ELSE 'other' END AS predicted_lang
  FROM toks
)
SELECT lang, predicted_lang, COUNT(*) AS n_docs FROM pred GROUP BY 1, 2
"""


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprints: md5 of raw and of normalized
    text (md5 is identical everywhere, unlike engine-native hash fns)."""
    d = with_tokens(load_table(spark, sf_dir, "documents"))
    normalized = F.concat_ws(" ", F.col("_toks"))
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("fp_raw"),
        F.md5(normalized.cast("binary")).alias("fp_normalized"),
        F.substring(F.md5(normalized.cast("binary")), 1, 8).alias("fp_short"),
    )


FINGERPRINTS_SQL = """
WITH norm AS (
  SELECT doc_id, text,
         array_to_string(list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != ''), ' ') AS normalized
  FROM documents
)
SELECT doc_id,
       md5(text) AS fp_raw,
       md5(normalized) AS fp_normalized,
       SUBSTRING(md5(normalized), 1, 8) AS fp_short
FROM norm
"""


def bigram_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level n-gram statistics: top bigrams with doc frequency —
    the vocabulary-building pass of a tokenizer pipeline.  Codegen path
    (posexplode + lead), one shuffle on the bigram."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = with_tokens(d).select("doc_id", F.posexplode("_toks").alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    bi = (
        toks.withColumn("nxt", F.lead("tok", 1).over(w))
        .filter(F.col("nxt").isNotNull())
        .select("doc_id", F.concat_ws(" ", "tok", "nxt").alias("bigram"))
    )
    freq = bi.groupBy("bigram").agg(
        F.count(F.lit(1)).alias("occurrences"),
        F.countDistinct("doc_id").alias("doc_frequency"),
    )
    return freq.orderBy(F.desc("occurrences"), F.asc("bigram")).limit(50)


BIGRAMS_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '') AS ts
  FROM documents
), bi AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS bigram
  FROM toks, UNNEST(range(1, GREATEST(LEN(ts) - 1, 0) + 1)) AS t(i)
)
SELECT bigram, COUNT(*) AS occurrences, COUNT(DISTINCT doc_id) AS doc_frequency
FROM bi GROUP BY bigram
ORDER BY occurrences DESC, bigram ASC
LIMIT 50
"""


#: fixed-point scale for the LM-score mean: a power of two, so p * SCALE is
#: an exact exponent shift in double and floor of it an exact integer — the
#: per-doc mean becomes integer arithmetic (order-independent, cross-engine).
_LM_FP_SCALE = 1 << 30


def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-estimated bigram language-model fluency score per document —
    the C4/Gopher-style "LM filter" tier of a curation pipeline, ln-free
    so it stays hash-exact: score = mean over the doc's bigram instances
    of p(w2|w1) = C(w1,w2)/C(w1·) estimated from the whole corpus.
    Degenerate/boilerplate docs score high (self-repeating bigrams),
    random-vocabulary docs score low; downstream filters cut on the
    distribution like curation_quality_filter does.

    Determinism: each p is ONE double division; the per-doc mean folds
    ``floor(p * 2^30)`` integers (exact shift, associative sum) and
    divides once — bit-identical on any engine and any partitioning.

    Shape at 100 TB: ONE tokenize pass; corpus counts ride the instance
    set as window counts over the (w1,w2) / (w1) partitions (no self-join
    that would recompute the token subtree), then one per-doc aggregate —
    three exchanges, same discipline as tfidf_top_terms.  Docs with < 2
    tokens emit n_bigrams=0 with a NULL score (no silent drop)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = with_tokens(d).select("doc_id", F.posexplode("_toks").alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    bi = (
        toks.withColumn("nxt", F.lead("tok", 1).over(w))
        .filter(F.col("nxt").isNotNull())
        .select("doc_id", F.col("tok").alias("w1"), F.col("nxt").alias("w2"))
    )
    w12 = Window.partitionBy("w1", "w2")
    w1 = Window.partitionBy("w1")
    p = F.count(F.lit(1)).over(w12).cast("double") / F.count(F.lit(1)).over(w1).cast("double")
    scored = bi.select(
        "doc_id", F.floor(p * F.lit(float(_LM_FP_SCALE))).cast("bigint").alias("fp")
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            (F.sum("fp").cast("double") / F.count(F.lit(1)).cast("double"))
            / F.lit(float(_LM_FP_SCALE))
        ).alias("lm_score"),
    )
    return (
        d.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.col("lm_score").cast("double").alias("lm_score"),
        )
    )


BIGRAM_LM_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '') AS ts
  FROM documents
), bi AS (
  SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
  FROM toks, UNNEST(range(1, GREATEST(LEN(ts) - 1, 0) + 1)) AS t(i)
), scored AS (
  SELECT doc_id,
         CAST(FLOOR((CAST(COUNT(*) OVER (PARTITION BY w1, w2) AS DOUBLE)
                     / CAST(COUNT(*) OVER (PARTITION BY w1) AS DOUBLE))
                    * {float(_LM_FP_SCALE)}) AS BIGINT) AS fp
  FROM bi
), agg AS (
  SELECT doc_id, COUNT(*) AS n_bigrams,
         (CAST(SUM(fp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / {float(_LM_FP_SCALE)} AS lm_score
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(a.lm_score AS DOUBLE) AS lm_score
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


#: heavy-hitter threshold divisor: report terms with count > N/K
_HH_K = 200


def heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters (terms with frequency > N/200) by the two-pass
    candidate-generation + exact-recount pattern — the distributed shape
    that finds top terms WITHOUT a full (term -> count) shuffle of the
    whole instance set's tail.

    Pass 1 (mapInPandas, vectorized value_counts per partition): emit
    every term whose LOCAL count exceeds local_n/K.  Averaging argument:
    a term with global count > N/K must exceed n_p/K in at least one
    partition, so the candidate set is a SUPERSET of the true heavy
    hitters (for adversarial vocabularies that outgrow executor memory,
    swap the exact per-partition counter for Misra-Gries with K counters
    — same contract, O(K) memory).  Pass 2: broadcast the (tiny)
    candidate list, exact-count only those terms, filter on the global
    threshold.  At 100 TB the shuffle carries candidates-only counts —
    O(partitions x K) rows — instead of the full vocabulary.

    Output is exact counts (no estimate), so it hash-checks against the
    plain GROUP BY/HAVING oracle."""
    d = with_tokens(load_table(spark, sf_dir, "documents"))
    inst = d.select(F.explode("_toks").alias("term"))

    def local_candidates(batches):
        import pandas as _pd

        counts: dict[str, int] = {}
        n_local = 0
        for pdf in batches:
            n_local += len(pdf)
            for term, c in pdf["term"].value_counts().items():
                counts[term] = counts.get(term, 0) + int(c)
        cand = [t for t, c in counts.items() if c > n_local / _HH_K]
        if cand:
            yield _pd.DataFrame({"term": cand})

    candidates = inst.mapInPandas(local_candidates, schema="term string").distinct()
    total = inst.agg(F.count(F.lit(1)).alias("n_total"))
    counted = (
        inst.join(F.broadcast(candidates), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("n").cast("double") > F.col("n_total").cast("double") / F.lit(float(_HH_K)))
        .select(
            "term",
            F.col("n").cast("bigint").alias("n"),
            (F.col("n").cast("double") / F.col("n_total").cast("double")).alias("share"),
        )
    )


HEAVY_HITTERS_SQL = f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '')) AS term
  FROM documents
), tot AS (
  SELECT COUNT(*) AS n_total FROM toks
)
SELECT term, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) AS DOUBLE) / CAST(MAX(tot.n_total) AS DOUBLE) AS share
FROM toks, tot
GROUP BY term
HAVING CAST(COUNT(*) AS DOUBLE) > CAST(MAX(tot.n_total) AS DOUBLE) / {float(_HH_K)}
"""


def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition: fraction of 3-gram shingles that are
    repeats of an earlier shingle in the SAME doc — the Gopher-style
    signal that catches boilerplate loops, keyword stuffing, and
    degenerate generations.  (Cross-document repetition is
    curation_boilerplate_ngrams; this is the per-doc complement.)

    Codegen shingling (posexplode + lead), one shuffle on doc_id, then a
    per-doc count/count-distinct — integer arithmetic plus one double
    division, cross-engine exact.  Docs with < 3 tokens have no shingles
    and drop out of the result on both engines."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = with_tokens(d).select("doc_id", F.posexplode("_toks").alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    tri = (
        toks.withColumn("t1", F.lead("tok", 1).over(w))
        .withColumn("t2", F.lead("tok", 2).over(w))
        .filter(F.col("t2").isNotNull())
        .select("doc_id", F.concat_ws(" ", "tok", "t1", "t2").alias("shingle"))
    )
    return tri.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.countDistinct("shingle").alias("n_distinct"),
        (F.lit(1.0) - F.countDistinct("shingle").cast("double") / F.count(F.lit(1))).alias(
            "rep_ratio"
        ),
    )


REPETITION_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '') AS ts
  FROM documents
), sh AS (
  SELECT doc_id, array_to_string(ts[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(range(1, GREATEST(LEN(ts) - 2, 0) + 1)) AS t(i)
)
SELECT doc_id, COUNT(*) AS n_shingles, COUNT(DISTINCT shingle) AS n_distinct,
       1.0 - CAST(COUNT(DISTINCT shingle) AS DOUBLE) / COUNT(*) AS rep_ratio
FROM sh GROUP BY doc_id
"""


def gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style absolute quality gates, one boolean per rule plus the
    conjunction — the pre-filter that runs before any distribution-
    relative filtering (curation_quality_filter).  All per-row codegen
    expressions; every ratio is a single int/int double division."""
    return gopher_flags_of(with_tokens(load_table(spark, sf_dir, "documents")))


def gopher_flags_of(d: DataFrame, extra_cols: tuple = ()) -> DataFrame:
    """The gate over an arbitrary frame that already carries ``text``
    and a materialized ``_toks`` token array — shared with the quality
    classifier's labeling pass (features._logit_features), which reuses
    one tokenize pass for features AND labels and rides its extra
    doc-level columns (``extra_cols``) through the same projection."""
    toks = F.col("_toks")
    n_tok = F.size(toks)
    mean_len = (
        F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)).cast("double")
        / n_tok
    )
    alpha_frac = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double") / n_tok
    stop_arr = F.array(*[F.lit(s) for s in _EN_STOP])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    cleaned_len = F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""))
    symbol_ratio = F.lit(1.0) - cleaned_len.cast("double") / F.length("text")
    # Zero-token / empty-text guards: Spark's non-ANSI x/0 yields NULL
    # while DuckDB's IEEE division yields NaN (whose comparisons are
    # FALSE) — guard the ratio rules symmetrically so a fixture with an
    # empty document cannot diverge the engines.
    out = d.select(
        "doc_id",
        *extra_cols,
        (n_tok >= 50).alias("len_ok"),
        F.when(n_tok > 0, (mean_len >= 3.0) & (mean_len <= 10.0))
        .otherwise(F.lit(False))
        .alias("mean_len_ok"),
        F.when(n_tok > 0, alpha_frac >= 0.8).otherwise(F.lit(False)).alias("alpha_ok"),
        (n_stop >= 2).alias("stop_ok"),
        F.when(F.length("text") > 0, symbol_ratio <= 0.1)
        .otherwise(F.lit(False))
        .alias("symbol_ok"),
    )
    return out.withColumn(
        "keep",
        F.col("len_ok") & F.col("mean_len_ok") & F.col("alpha_ok") & F.col("stop_ok") & F.col("symbol_ok"),
    )


GOPHER_SQL = """
WITH toks AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '') AS ts
  FROM documents
), m AS (
  SELECT doc_id,
         LEN(ts) >= 50 AS len_ok,
         CASE WHEN LEN(ts) > 0 THEN
           CAST(list_sum(list_transform(ts, t -> LENGTH(t))) AS DOUBLE) / LEN(ts) >= 3.0
             AND CAST(list_sum(list_transform(ts, t -> LENGTH(t))) AS DOUBLE) / LEN(ts) <= 10.0
         ELSE FALSE END AS mean_len_ok,
         CASE WHEN LEN(ts) > 0 THEN
           CAST(LEN(list_filter(ts, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE) / LEN(ts) >= 0.8
         ELSE FALSE END AS alpha_ok,
         LEN(list_filter(ts, t -> list_contains(['the','a','of','and','to','in','is','it'], t))) >= 2 AS stop_ok,
         CASE WHEN LENGTH(text) > 0 THEN
           1.0 - CAST(LENGTH(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS DOUBLE) / LENGTH(text) <= 0.1
         ELSE FALSE END AS symbol_ok
  FROM toks
)
SELECT doc_id, len_ok, mean_len_ok, alpha_ok, stop_ok, symbol_ok,
       len_ok AND mean_len_ok AND alpha_ok AND stop_ok AND symbol_ok AS keep
FROM m
"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most characteristic terms per document by tf x (N/df) —
    the vocabulary/keyword pass of a corpus pipeline.

    Deliberately NOT log-idf: ln() is not guaranteed identically rounded
    across engines, while tf*N/df is integer arithmetic plus ONE double
    division — hash-exact.  The ranking is monotone in idf either way.

    Shape at 100 TB: the tokenize+explode pass runs ONCE — document
    frequency is a count() window over the term partition of the same
    (doc, term) aggregate (not a self-join, which would recompute the
    whole token subtree per consumer), the corpus doc count broadcasts
    via a 1-row cross join, and top-k per doc is a window over the doc
    key.  Three exchanges total: (doc,term) agg, term window, doc
    window."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tok_rows = with_tokens(d).select("doc_id", F.explode("_toks").alias("term"))
    tf = tok_rows.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = d.agg(F.countDistinct("doc_id").alias("n_docs"))
    w_term = Window.partitionBy("term")
    scored = (
        tf.crossJoin(F.broadcast(n_docs))
        .withColumn("df_docs", F.count(F.lit(1)).over(w_term))
        .withColumn("score", (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df_docs"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "df_docs", "score", F.col("rk").cast("bigint").alias("rk"))
    )


TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id, UNNEST(list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT term, COUNT(*) AS df_docs FROM tf GROUP BY 1
), n AS (
  SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents
)
SELECT doc_id, term, tf, df_docs, score, rk FROM (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_docs,
         CAST(tf.tf * n.n_docs AS DOUBLE) / dfreq.df_docs AS score,
         CAST(ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                 ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE) / dfreq.df_docs DESC,
                                          tf.term ASC) AS BIGINT) AS rk
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
) WHERE rk <= 3
"""


# --------------------------------------------------------- collocations

_PMI_MIN_COUNT = 5
_PMI_TOP = 20


def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: top bigrams by pointwise mutual
    information, PMI = ln( p(ab) / (p(a)p(b)) ) — word pairs that
    co-occur far more than their parts' frequencies predict.

    Determinism discipline: the RANKING never touches ln — it orders by
    the exact ratio c_ab * N_uni^2 / (c_a * c_b * N_big), a single
    IEEE-correctly-rounded division of exact integers (identical on any
    engine), with the bigram string as tie-break; ln() runs once per
    OUTPUT row on identical inputs and is rounded at the boundary.  A
    minimum pair count filters the unstable low-frequency tail.  One
    tokenize pass feeds both the bigram and unigram counts."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tokp = with_tokens(d).select(
        "doc_id", F.posexplode("_toks").alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        tokp.withColumn("nxt", F.lead("tok").over(w))
        .filter(F.col("nxt").isNotNull())
        .select("tok", "nxt")
    )
    bcnt = big.groupBy("tok", "nxt").agg(F.count(F.lit(1)).alias("c_ab"))
    ucnt = tokp.groupBy("tok").agg(F.count(F.lit(1)).alias("c_u"))
    n_uni = tokp.agg(F.count(F.lit(1)).alias("n_uni"))
    n_big = big.agg(F.count(F.lit(1)).alias("n_big"))
    scored = (
        bcnt.filter(F.col("c_ab") >= _PMI_MIN_COUNT)
        .join(F.broadcast(ucnt.withColumnRenamed("tok", "a").withColumnRenamed("c_u", "c_a")),
              F.col("tok") == F.col("a"))
        .join(F.broadcast(ucnt.withColumnRenamed("tok", "b").withColumnRenamed("c_u", "c_b")),
              F.col("nxt") == F.col("b"))
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_big))
        .withColumn(
            "ratio",
            (F.col("c_ab") * F.col("n_uni") * F.col("n_uni")).cast("double")
            / (F.col("c_a") * F.col("c_b") * F.col("n_big")).cast("double"),
        )
        .withColumn("bigram", F.concat_ws(" ", "tok", "nxt"))
    )
    wr = Window.orderBy(F.desc("ratio"), F.asc("bigram"))
    top = scored.orderBy(F.desc("ratio"), F.asc("bigram")).limit(_PMI_TOP)
    return top.withColumn("rk", F.row_number().over(wr)).select(
        "bigram",
        F.col("c_ab").cast("bigint").alias("c_ab"),
        F.col("c_a").cast("bigint").alias("c_a"),
        F.col("c_b").cast("bigint").alias("c_b"),
        F.round(F.log("ratio"), 6).alias("pmi"),
        F.col("rk").cast("bigint").alias("rk"),
    )


_PMI_SQL_TEXT = f"""
WITH tk AS (
  SELECT doc_id, list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '') AS ts
  FROM documents
), toks AS (
  SELECT doc_id, t.i AS pos, ts[t.i] AS tok, ts[t.i + 1] AS nxt, LEN(ts) AS n
  FROM tk, UNNEST(range(1, GREATEST(LEN(ts), 0) + 1)) AS t(i)
), big AS (
  SELECT tok, nxt FROM toks WHERE nxt IS NOT NULL AND pos < n
), bcnt AS (
  SELECT tok, nxt, COUNT(*) AS c_ab FROM big GROUP BY 1, 2 HAVING COUNT(*) >= {_PMI_MIN_COUNT}
), ucnt AS (
  SELECT tok, COUNT(*) AS c_u FROM toks GROUP BY 1
), nu AS (SELECT COUNT(*) AS n_uni FROM toks),
nb AS (SELECT COUNT(*) AS n_big FROM big),
scored AS (
  SELECT b.tok || ' ' || b.nxt AS bigram, b.c_ab, ua.c_u AS c_a, ub.c_u AS c_b,
         CAST(b.c_ab * nu.n_uni * nu.n_uni AS DOUBLE)
         / CAST(ua.c_u * ub.c_u * nb.n_big AS DOUBLE) AS ratio
  FROM bcnt b
  JOIN ucnt ua ON ua.tok = b.tok
  JOIN ucnt ub ON ub.tok = b.nxt
  CROSS JOIN nu CROSS JOIN nb
)
SELECT bigram,
       CAST(c_ab AS BIGINT) AS c_ab, CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b,
       ROUND(LN(ratio), 6) AS pmi,
       CAST(ROW_NUMBER() OVER (ORDER BY ratio DESC, bigram ASC) AS BIGINT) AS rk
FROM scored
ORDER BY ratio DESC, bigram ASC
LIMIT {_PMI_TOP}
"""


# ------------------------------------------------------- lexical retrieval

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_QUERY = ("data", "hash", "merge")  # fixed demo query terms
_BM25_TOP = 20
_BM25_FP = float(1 << 15)  # per-factor fixed-point scale (idf and saturation)
_BM25_OUT = float(1 << 30)  # product scale: idf_fp * sat_fp
_RRF_K = 60


def _bm25_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-term postings with scoring inputs attached: (doc_id, term,
    tf, dl, df, n_docs, avgdl).  The (doc, term) aggregate filters to
    the query terms BEFORE any join — the inverted-index access shape —
    and df counts from the POSTINGS, never the full vocabulary.  Shared
    by the BM25 and RRF operators so the two rankings the fusion
    combines cannot drift apart."""
    d = load_table(spark, sf_dir, "documents")
    tok_rows = with_tokens(d).select(
        "doc_id", F.size("_toks").alias("dl"), F.explode("_toks").alias("term")
    )
    tf = (
        tok_rows.filter(F.col("term").isin(*_BM25_QUERY))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    stats = d.agg(F.countDistinct("doc_id").alias("n_docs")).crossJoin(
        with_tokens(d)
        .select(F.size("_toks").alias("dl"))
        .agg((F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"))
    )
    return tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))


def _bm25_fp_columns():
    """(idf_fp, sat_fp) fixed-point factor expressions over a postings
    row.  The ln() is confined to idf_fp — ONE floor per query term
    corpus-wide (the PSI-class libm exposure, minimized); the
    saturation factor is pure rational arithmetic on exact integers
    (IEEE division is correctly rounded, so sat_fp is deterministic
    across engines BY CONSTRUCTION, not by accident).  The per-doc
    score is then the exact integer sum of idf_fp * sat_fp."""
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    sat = (F.col("tf") * F.lit(_BM25_K1 + 1.0)) / (
        F.col("tf")
        + F.lit(_BM25_K1) * (F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl"))
    )
    return F.floor(idf * F.lit(_BM25_FP)), F.floor(sat * F.lit(_BM25_FP))


def _bm25_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quantized BM25 score (s_fp, exact bigint) + the tf-idf
    fixed-point score (t_fp) for the same postings."""
    postings = _bm25_postings(spark, sf_dir)
    idf_fp, sat_fp = _bm25_fp_columns()
    tfidf_fp = F.floor(
        (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df") * F.lit(_BM25_OUT)
    )
    return (
        postings.select(
            "doc_id", (idf_fp * sat_fp).alias("c_fp"), tfidf_fp.alias("t1_fp")
        )
        .groupBy("doc_id")
        .agg(
            F.sum("c_fp").alias("s_fp"),
            F.sum("t1_fp").alias("t_fp"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
        )
    )


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval for a fixed query — the keyword half of
    hybrid (lexical + vector) RAG retrieval, with QUANTIZED scoring:
    score = sum over query terms of floor(idf * 2^15) * floor(sat * 2^15)
    — an exact integer, deterministic under any partitioning or engine
    (see ``_bm25_fp_columns`` for why only the 3 per-term idf floors
    carry any libm exposure).  Global top-k via orderBy+limit
    (TakeOrderedAndProject), ranks tie-broken on doc_id."""
    from pyspark.sql import Window

    per_doc = _bm25_doc_scores(spark, sf_dir)
    w = Window.orderBy(F.desc("s_fp"), F.asc("doc_id"))
    top = per_doc.orderBy(F.desc("s_fp"), F.asc("doc_id")).limit(_BM25_TOP)
    return top.withColumn("rk", F.row_number().over(w)).select(
        "doc_id",
        "n_terms_hit",
        F.round(F.col("s_fp").cast("double") / F.lit(_BM25_OUT), 6).alias("bm25"),
        F.col("rk").cast("bigint").alias("rk"),
    )


# ------------------------------------------------------ BPE training

_BPE_ROUNDS = 8


def _bpe_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Initial BPE state: one row per DISTINCT word with its corpus
    frequency and its character-symbol sequence — the Sennrich et al.
    word-frequency formulation, which bounds the iterated state at
    vocabulary size (millions) rather than corpus size (trillions)."""
    d = load_table(spark, sf_dir, "documents")
    toks = with_tokens(d).select(F.explode("_toks").alias("word"))
    wd = toks.groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    return wd.select(
        F.col("word").alias("word_id"),
        "cnt",
        F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))").alias(
            "syms"
        ),
    )


def _bpe_apply(words: DataFrame, a: str, b: str) -> DataFrame:
    """Apply one merge (a, b) -> ab to every symbol sequence: a JVM-side
    left-to-right greedy fold (``aggregate``), the exact non-overlapping
    replacement BPE specifies.  Cascades are impossible within a round:
    the merged symbol a||b never equals a (b is non-empty), so a freshly
    merged token can never be the left half of another merge this round."""
    merged = a + b
    return words.withColumn(
        "syms",
        F.expr(
            "aggregate(syms, cast(array() as array<string>), (acc, x) -> "
            f"IF(size(acc) > 0 AND element_at(acc, size(acc)) = '{a}' AND x = '{b}', "
            f"concat(slice(acc, 1, size(acc) - 1), array('{merged}')), "
            "concat(acc, array(x))))"
        ),
    )


def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE (byte-pair-encoding) tokenizer TRAINING — the
    iterative vocabulary-learning loop of every modern LLM tokenizer,
    run with the corpus-scale pieces distributed:

    per round, (1) adjacent-pair counts weighted by word frequency via
    arrays_zip-style transforms + one partial agg (state <= |alphabet +
    merges|^2 groups), (2) the argmax pair — ONE 1-row collect per round,
    the driver decision every BPE trainer makes (ties broken (count
    desc, a, b), deterministic) — and (3) merge application as a
    JVM-side fold over each word (``_bpe_apply``), map-only.  Words are
    localCheckpointed per round to truncate the 8-round lineage, the
    ``graph_label_propagation`` discipline.  Output: the learned merge
    table.  Oracle: the ENTIRE iteration unrolled round-by-round into
    DuckDB SQL (``_bpe_sql``) — same pair counts, same tie-break, same
    non-overlapping merge semantics (run-parity formulation, provably
    equal to the greedy fold) — so training replays cross-engine
    bit-identically, the PCA-power-iteration discipline."""
    _, out_rows = _bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        out_rows,
        "round bigint, left_sym string, right_sym string, merged string, pair_count bigint",
    )


def _bpe_train(spark: SparkSession, sf_dir: str):
    """The shared training loop: returns (final per-word symbol state,
    merge rows).  ``text_bpe_merges`` publishes the merge table;
    ``text_bpe_encode`` serves from the SAME final state, so train and
    serve cannot drift (one ``_bpe_apply`` fold produces both)."""
    # the iterated state is VOCABULARY-sized (distinct words), orders of
    # magnitude below the corpus the tokenize pass scanned — re-shape it
    # to a handful of partitions so the 8 small per-round jobs don't pay
    # corpus-width task overhead (at a real 100 TB corpus the vocab is
    # tens of millions of rows: still repartition, just to more than 4)
    words = _bpe_words(spark, sf_dir).coalesce(4).localCheckpoint(eager=True)
    out_rows = []
    for r in range(_BPE_ROUNDS):
        pairs = (
            words.filter(F.size("syms") >= 2)
            .select(
                "cnt",
                # the inner IF guard is load-bearing: under whole-stage
                # codegen the projection may evaluate before the filter,
                # and sequence(1, 0) is DESCENDING in Spark, not empty
                F.expr(
                    "IF(size(syms) < 2, cast(array() as array<struct<a string, b string>>), "
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b)))"
                ).alias("ps"),
            )
            .select(F.explode("ps").alias("p"), "cnt")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").cast("bigint").alias("pc"))
        )
        best = pairs.orderBy(F.desc("pc"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not best:
            break
        a, b, pc = best[0]["a"], best[0]["b"], int(best[0]["pc"])
        out_rows.append((r, a, b, a + b, pc))
        words = _bpe_apply(words, a, b).localCheckpoint(eager=True)
    return words, out_rows


def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE — the serving half of ``text_bpe_merges``: tokenize the
    corpus with the learned merge table and report per-document token
    counts and the compression ratio every tokenizer dashboard tracks.

    The per-word tokenization IS the trainer's final symbol state
    (``_bpe_train`` returns it), so serving replays the identical
    ``_bpe_apply`` folds as training — the two cannot drift.  Documents
    then join word -> token-count on the vocabulary table, which is
    orders of magnitude smaller than the corpus (broadcast-class at any
    realistic vocab; AQE would pick a shuffle join past that), and one
    partial-agg groupBy per doc sums tokens/chars.  The ratio folds as
    floor(chars * 1e6 / tokens) — exact integer fixed point, the
    cross-engine float discipline.  Docs with zero alphanumeric tokens
    drop out of the inner join on both engines alike."""
    words, _ = _bpe_train(spark, sf_dir)
    wtok = words.select(
        "word_id",
        F.size("syms").cast("bigint").alias("n_word_tokens"),
        F.length("word_id").cast("bigint").alias("n_word_chars"),
    )
    d = load_table(spark, sf_dir, "documents")
    doc_words = with_tokens(d).select("doc_id", F.explode("_toks").alias("word_id"))
    per_doc = (
        doc_words.join(F.broadcast(wtok), "word_id")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_word_tokens").cast("bigint").alias("n_tokens"),
            F.sum("n_word_chars").cast("bigint").alias("n_chars"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_words",
        "n_tokens",
        "n_chars",
        F.floor(F.col("n_chars") * F.lit(1000000) / F.col("n_tokens"))
        .cast("bigint")
        .alias("chars_per_token_fp"),
    )


def _bpe_chain_parts(rounds: int = _BPE_ROUNDS) -> list[str]:
    """Shared CTE chain replaying the whole BPE training run in DuckDB:
    per round a pair-count CTE, a 1-row argmax CTE, and the merge
    application in the run-parity formulation — matching positions
    grouped into consecutive runs, odd positions within each run are the
    merge starts (for a != b every match is its own run, so the rule is
    uniform), the right halves of merges dropped, the rest re-assembled
    in order.  Ends at ``w{rounds}``, the final symbol state — the train
    oracle reads the ``best{r}`` rows, the encode oracle reads
    ``w{rounds}``."""
    parts = [
        """tk AS MATERIALIZED (
  SELECT doc_id, list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '') AS ts
  FROM documents
), wd AS MATERIALIZED (
  SELECT u.word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT UNNEST(ts) AS word FROM tk) u GROUP BY 1
), w0 AS MATERIALIZED (
  SELECT word AS word_id, cnt,
         list_transform(range(1, length(word) + 1), i -> substr(word, CAST(i AS INT), 1)) AS syms
  FROM wd
)"""
    ]
    for r in range(rounds):
        parts.append(
            f"""p{r} AS MATERIALIZED (
  SELECT s.syms[CAST(t.i AS INT)] AS a, s.syms[CAST(t.i AS INT) + 1] AS b,
         CAST(SUM(s.cnt) AS BIGINT) AS pc
  FROM w{r} s, UNNEST(range(1, len(s.syms))) AS t(i)
  GROUP BY 1, 2
), best{r} AS MATERIALIZED (
  SELECT a, b, pc FROM p{r} ORDER BY pc DESC, a ASC, b ASC LIMIT 1
), pos{r} AS MATERIALIZED (
  SELECT w.word_id, w.cnt, t.i AS i, w.syms[CAST(t.i AS INT)] AS sym,
         (t.i < len(w.syms) AND w.syms[CAST(t.i AS INT)] = b.a
          AND w.syms[CAST(t.i AS INT) + 1] = b.b) AS m
  FROM w{r} w CROSS JOIN best{r} b, UNNEST(range(1, len(w.syms) + 1)) AS t(i)
), runs{r} AS MATERIALIZED (
  SELECT word_id, i, i - ROW_NUMBER() OVER (PARTITION BY word_id ORDER BY i) AS grp
  FROM pos{r} WHERE m
), starts{r} AS MATERIALIZED (
  SELECT word_id, i FROM (
    SELECT word_id, i, ROW_NUMBER() OVER (PARTITION BY word_id, grp ORDER BY i) AS rn
    FROM runs{r}
  ) WHERE rn % 2 = 1
), w{r + 1} AS MATERIALIZED (
  SELECT p.word_id, p.cnt,
         list(CASE WHEN s.i IS NOT NULL THEN p.sym || b.b ELSE p.sym END ORDER BY p.i) AS syms
  FROM pos{r} p
  CROSS JOIN best{r} b
  LEFT JOIN starts{r} s ON s.word_id = p.word_id AND s.i = p.i
  LEFT JOIN starts{r} s2 ON s2.word_id = p.word_id AND s2.i = p.i - 1
  WHERE s2.i IS NULL
  GROUP BY 1, 2
)"""
        )
        parts.append(
            f"r{r} AS (SELECT CAST({r} AS BIGINT) AS round, a AS left_sym, b AS right_sym, "
            f"a || b AS merged, pc AS pair_count FROM best{r})"
        )
    return parts


def _bpe_sql(rounds: int = _BPE_ROUNDS) -> str:
    parts = _bpe_chain_parts(rounds)
    union = "\nUNION ALL\n".join(f"SELECT * FROM r{r}" for r in range(rounds))
    return "WITH " + ",\n".join(parts) + "\n" + union


def _bpe_encode_sql(rounds: int = _BPE_ROUNDS) -> str:
    """Encode oracle: the same materialized training replay, then the
    vocabulary's final symbol state joined back onto per-doc tokens."""
    parts = _bpe_chain_parts(rounds)
    parts.append(
        f"""wtok AS MATERIALIZED (
  SELECT word_id, CAST(len(syms) AS BIGINT) AS n_word_tokens,
         CAST(length(word_id) AS BIGINT) AS n_word_chars
  FROM w{rounds}
), dw AS MATERIALIZED (
  SELECT doc_id, UNNEST(ts) AS word_id FROM tk
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(w.n_word_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(w.n_word_chars) AS BIGINT) AS n_chars,
       CAST(FLOOR(CAST(SUM(w.n_word_chars) * 1000000 AS DOUBLE)
                  / CAST(SUM(w.n_word_tokens) AS DOUBLE)) AS BIGINT) AS chars_per_token_fp
FROM dw d JOIN wtok w USING (word_id)
GROUP BY 1
"""
    )


_BPE_SQL = _bpe_sql()
_BPE_ENCODE_SQL = _bpe_encode_sql()


_BM25_IDX_BUCKETS = 64  # term-hash partitions of the persisted postings


def _term_bucket_col(term_col) -> Column:
    """Deterministic cross-engine term bucket: first 8 hex chars of
    md5(term) mod _BM25_IDX_BUCKETS — computable identically in Spark
    SQL (index build) and driver-side Python (query routing), so the
    search can name its partitions without running a job."""
    return F.pmod(
        F.conv(F.substring(F.md5(term_col), 1, 8), 16, 10).cast("bigint"),
        F.lit(_BM25_IDX_BUCKETS),
    )


def _term_bucket_py(term: str) -> int:
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % _BM25_IDX_BUCKETS


def _bm25_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per machine per fixture content) the PERSISTED
    inverted index over the FULL vocabulary, the build-once/serve-many
    discipline the ANN tiers follow applied to lexical retrieval:

    - ``postings/`` (doc_id, dl, term, tf) partitioned by term-hash
      bucket — a query scans only its terms' buckets (q/64 of the index
      for q distinct buckets), never the corpus;
    - ``terms/`` (term, df) under the same bucketing;
    - ``stats/`` one row (n_docs, avgdl).

    Fit and serve are separate jobs in production retrieval — the index
    is written by a build pipeline and served by many queries."""
    import os

    from realtime_change_data_capture_streaming_spark.llm_ops.similarity import _index_cache

    def build(root: str) -> None:
        d = load_table(spark, sf_dir, "documents")
        tok_rows = with_tokens(d).select(
            "doc_id", F.size("_toks").alias("dl"), F.explode("_toks").alias("term")
        )
        postings = tok_rows.groupBy("doc_id", "dl", "term").agg(
            F.count(F.lit(1)).alias("tf")
        )
        postings.withColumn("bucket", _term_bucket_col(F.col("term"))).write.mode(
            "overwrite"
        ).partitionBy("bucket").parquet(os.path.join(root, "postings"))
        dfreq = postings.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
        dfreq.withColumn("bucket", _term_bucket_col(F.col("term"))).write.mode(
            "overwrite"
        ).partitionBy("bucket").parquet(os.path.join(root, "terms"))
        stats = d.agg(F.countDistinct("doc_id").alias("n_docs")).crossJoin(
            with_tokens(d)
            .select(F.size("_toks").alias("dl"))
            .agg((F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"))
        )
        stats.coalesce(1).write.mode("overwrite").parquet(os.path.join(root, "stats"))

    return _index_cache("spark_graft_bm25_", spark, sf_dir, build, table="documents")


def _bm25_persisted_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quantized BM25 scores served from the PERSISTED inverted
    index: query terms routed to their md5 buckets driver-side (pure
    arithmetic, no job), ONLY those postings partitions scanned, df /
    n_docs / avgdl from the tiny persisted side tables.  Shared by the
    persisted-top-k operator and the hybrid fusion so the index-served
    scoring has one definition — hash-identical to ``_bm25_doc_scores``'s
    s_fp by construction (same postings rows, same quantized factors)."""
    import os

    root = _bm25_index_dir(spark, sf_dir)
    buckets = sorted({_term_bucket_py(t) for t in _BM25_QUERY})
    postings = (
        spark.read.parquet(os.path.join(root, "postings"))
        .filter(F.col("bucket").isin(buckets) & F.col("term").isin(*_BM25_QUERY))
        .select("doc_id", "dl", "term", "tf")
    )
    dfreq = (
        spark.read.parquet(os.path.join(root, "terms"))
        .filter(F.col("bucket").isin(buckets) & F.col("term").isin(*_BM25_QUERY))
        .select("term", "df")
    )
    # the stats side table holds exactly ONE row (written coalesce(1)
    # from a global aggregate); limit(1) makes that bound plan-visible
    # for the cross-join guard
    stats = spark.read.parquet(os.path.join(root, "stats")).limit(1)
    enriched = postings.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    idf_fp, sat_fp = _bm25_fp_columns()
    return (
        enriched.select("doc_id", (idf_fp * sat_fp).alias("c_fp"))
        .groupBy("doc_id")
        .agg(
            F.sum("c_fp").alias("s_fp"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
        )
    )


def text_bm25_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 served from the PERSISTED inverted index: route the query
    terms to their md5 buckets driver-side (pure arithmetic, no job),
    scan ONLY those postings partitions (partition pruning does the
    inverted-index seek), then apply the identical quantized scoring as
    the refit operator — results are hash-identical to
    ``text_bm25_topk``, so they share its oracle.  At production scale
    the scan reads q/64 of the postings for a q-bucket query, and df /
    n_docs / avgdl come from the tiny persisted side tables instead of
    re-tokenizing the corpus per query."""
    from pyspark.sql import Window

    per_doc = _bm25_persisted_doc_scores(spark, sf_dir)
    w = Window.orderBy(F.desc("s_fp"), F.asc("doc_id"))
    top = per_doc.orderBy(F.desc("s_fp"), F.asc("doc_id")).limit(_BM25_TOP)
    return top.withColumn("rk", F.row_number().over(w)).select(
        "doc_id",
        "n_terms_hit",
        F.round(F.col("s_fp").cast("double") / F.lit(_BM25_OUT), 6).alias("bm25"),
        F.col("rk").cast("bigint").alias("rk"),
    )


#: per-ranker shortlist size for RRF fusion.  A doc absent from a
#: shortlist coalesces to the rank-beyond-N bound N+1 for that side,
#: which OVERESTIMATES its true fused score (its real rank may be far
#: deeper).  With K=60, N=200, top_k=20: an absent doc scores at most
#: 1/(K+1) + 1/(K+N+1) = 1/61 + 1/261 ~= 0.0202, while a doc ranked
#: top_k in BOTH lists scores at least 2/(K+top_k) = 2/80 = 0.025 — so
#: truncation can never displace a doc that is top-k on both sides.  A
#: true fused top-k doc ranked DEEP in one list (say 150th) is NOT
#: covered by that bound: the shortlist form is provably exact only
#: when every true top-k doc appears in both shortlists.  That holds on
#: this corpus because the two rankings share the s_fp/t_fp inputs;
#: exact equality to the full-rank form is pinned empirically at
#: sf0.001 and sf0.01 in tests/test_text_ops.py, not proven in general.
_RRF_SHORTLIST = 200


def _ranked_shortlist(per_doc: DataFrame, score_col: str, rank_name: str) -> DataFrame:
    """Global top-N of ``per_doc`` by (score desc, doc_id) with its exact
    global rank attached.  orderBy+limit compiles to
    TakeOrderedAndProject (per-partition heaps, no global sort); the
    row_number window then runs over the N-row LIMITED result — for a
    shortlist member, rank within the global top-N IS the exact global
    rank, so no corpus-wide window is ever needed."""
    from pyspark.sql import Window

    top = per_doc.orderBy(F.desc(score_col), F.asc("doc_id")).limit(_RRF_SHORTLIST)
    w = Window.orderBy(F.desc(score_col), F.asc("doc_id"))
    return top.withColumn(rank_name, F.row_number().over(w).cast("bigint")).select(
        "doc_id", rank_name
    )


def text_rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval rankings — the standard
    hybrid-search combiner (score = sum of 1/(K + rank_i)): the BM25
    ranking fused with the tf-idf ranking for the same query terms,
    both derived from ONE shared postings/scoring pipeline
    (``_bm25_doc_scores``) so the fused rankings cannot drift from the
    standalone operator.  RRF works on RANKS, so float differences
    cannot reorder it.

    Scale shape: each ranking is reduced to a top-N SHORTLIST first
    (``_ranked_shortlist`` — TakeOrderedAndProject, then a window over
    the N-row limited result), and the shortlists are full-outer-joined;
    a doc missing from one shortlist takes the rank-beyond-N bound N+1
    for that side (see ``_RRF_SHORTLIST`` for why the bound cannot
    displace the true top-k).  No window ever sees more than N rows, so
    the plan carries no corpus-scale single-partition stage."""
    from pyspark.sql import Window

    per_doc = _bm25_doc_scores(spark, sf_dir).localCheckpoint(eager=True)
    b = _ranked_shortlist(per_doc, "s_fp", "rank_bm25")
    t = _ranked_shortlist(per_doc, "t_fp", "rank_tfidf")
    fused = b.join(t, "doc_id", "full_outer")
    rb = F.coalesce(F.col("rank_bm25"), F.lit(_RRF_SHORTLIST + 1))
    rt = F.coalesce(F.col("rank_tfidf"), F.lit(_RRF_SHORTLIST + 1))
    rrf = F.lit(1.0) / (F.lit(_RRF_K) + rb) + F.lit(1.0) / (F.lit(_RRF_K) + rt)
    w = Window.orderBy(F.desc("rrf"), F.asc("doc_id"))
    top = (
        fused.withColumn("rrf", F.round(rrf, 8))
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(_BM25_TOP)
    )
    return top.withColumn("rk", F.row_number().over(w)).select(
        "doc_id",
        F.col("rank_bm25").cast("bigint").alias("rank_bm25"),
        F.col("rank_tfidf").cast("bigint").alias("rank_tfidf"),
        "rrf",
        F.col("rk").cast("bigint").alias("rk"),
    )


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_QUERY)

def _bm25_chain_sql(src: str = "documents", lead: str = "WITH") -> str:
    """The shared oracle CTE chain mirroring ``_bm25_doc_scores``,
    parametrized by the corpus source (``src`` — e.g. a ``live_docs``
    CTE for the erasure oracles) and the leading keyword (``lead=","``
    lets a caller prepend its own CTE) — so forget-variant oracles are
    BUILT, never derived by textual surgery on this string (r15
    review)."""
    return f"""
{lead} tk AS (
  SELECT doc_id, list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '') AS ts
  FROM {src}
), lens AS (
  SELECT doc_id, LEN(ts) AS dl FROM tk
), stats AS (
  SELECT (SELECT COUNT(DISTINCT doc_id) FROM {src}) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM lens
), tf AS (
  SELECT u.doc_id, l.dl, u.term, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(ts) AS term FROM tk) u
  JOIN lens l ON l.doc_id = u.doc_id
  WHERE u.term IN ({_BM25_TERMS_SQL})
  GROUP BY 1, 2, 3
), dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1
), per_doc AS (
  SELECT tf.doc_id,
         CAST(SUM(
           CAST(FLOOR(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * {_BM25_FP}) AS BIGINT)
           * CAST(FLOOR((tf.tf * {_BM25_K1 + 1.0})
                 / (tf.tf + {_BM25_K1} * ({1.0 - _BM25_B} + {_BM25_B} * tf.dl / s.avgdl))
                 * {_BM25_FP}) AS BIGINT)) AS BIGINT) AS s_fp,
         CAST(SUM(CAST(FLOOR(CAST(tf.tf * s.n_docs AS DOUBLE) / d.df * {_BM25_OUT}) AS BIGINT)) AS BIGINT) AS t_fp,
         CAST(COUNT(*) AS BIGINT) AS n_terms_hit
  FROM tf JOIN dfreq d USING (term) CROSS JOIN stats s
  GROUP BY 1
)"""


_BM25_CHAIN_SQL = _bm25_chain_sql()

BM25_SQL = f"""{_BM25_CHAIN_SQL}
SELECT doc_id, n_terms_hit,
       ROUND(CAST(s_fp AS DOUBLE) / {_BM25_OUT}, 6) AS bm25,
       CAST(ROW_NUMBER() OVER (ORDER BY s_fp DESC, doc_id ASC) AS BIGINT) AS rk
FROM per_doc
ORDER BY s_fp DESC, doc_id ASC
LIMIT {_BM25_TOP}
"""

RRF_SQL = f"""{_BM25_CHAIN_SQL}, ranked AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY s_fp DESC, doc_id ASC) AS BIGINT) AS rank_bm25,
         CAST(ROW_NUMBER() OVER (ORDER BY t_fp DESC, doc_id ASC) AS BIGINT) AS rank_tfidf
  FROM per_doc
)
SELECT doc_id, rank_bm25, rank_tfidf,
       ROUND(1.0 / ({_RRF_K} + rank_bm25) + 1.0 / ({_RRF_K} + rank_tfidf), 8) AS rrf,
       CAST(ROW_NUMBER() OVER (
         ORDER BY ROUND(1.0 / ({_RRF_K} + rank_bm25) + 1.0 / ({_RRF_K} + rank_tfidf), 8) DESC,
                  doc_id ASC) AS BIGINT) AS rk
FROM ranked
ORDER BY ROUND(1.0 / ({_RRF_K} + rank_bm25) + 1.0 / ({_RRF_K} + rank_tfidf), 8) DESC, doc_id ASC
LIMIT {_BM25_TOP}
"""


#: the hybrid query's vector side: the corpus embedding standing in for
#: the encoded query (a real pipeline embeds the query text; the fixture
#: has no encoder, so the query IS a corpus vector — excluded from the
#: candidate set so its trivial self-match cannot occupy a slot).
#: documents.doc_id and embeddings.vec_id are the same id space in the
#: fixture (one embedding per document), which is what lets the fusion
#: join the two rankings on doc_id.
_HYBRID_QUERY_VEC = 0


def hybrid_lexical_vector_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE hybrid retrieval — the RAG-serving shape: the BM25 lexical
    ranking (fixed query terms) fused with a VECTOR ranking (cosine of
    every document's embedding against the fixed query vector) by
    reciprocal-rank fusion.  The earlier ``text_rrf_fusion_topk`` fuses
    two LEXICAL rankers sharing one postings pipeline; this one crosses
    modalities, which is the combiner's actual production use.

    Scale shape: the lexical side is the inverted-index access pattern
    (query-term postings only); the vector side is one scan with a
    broadcast 1-row query (at scale: the ANN shortlist — any of the
    persisted IVF/PQ tiers slots in, since fusion only needs ranks);
    both sides reduce to ``_RRF_SHORTLIST``-row shortlists before the
    full-outer fusion join, so the fused join is shortlist x shortlist
    regardless of corpus size.

    Determinism: the cosine fold is the proven left-to-right double
    accumulation (``ann_cosine_topk``), BM25 is the quantized integer
    score, and the fused score is the same double arithmetic on the
    same small integers in both engines (the ``text_rrf_fusion_topk``
    discipline)."""
    from pyspark.sql import Window

    from realtime_change_data_capture_streaming_spark.llm_ops.similarity import _dot, _norm
    from realtime_change_data_capture_streaming_spark.operators._util import spread

    # index-SERVED lexical side: hash-identical s_fp to the re-tokenize
    # form (shared oracle), but the scan is the persisted inverted-index
    # seek — the shape a serving tier actually runs
    per_doc = _bm25_persisted_doc_scores(spark, sf_dir)
    lex = _ranked_shortlist(per_doc, "s_fp", "rank_lex")

    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = (
        e.filter(F.col("vec_id") == _HYBRID_QUERY_VEC)
        .limit(1)
        .select(F.col("embedding").alias("q_emb"))
    )
    cand = e.filter(F.col("vec_id") != _HYBRID_QUERY_VEC).select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("c_emb")
    )
    scored = F.broadcast(q).crossJoin(cand).select(
        "doc_id",
        (
            _dot(F.col("q_emb"), F.col("c_emb"))
            / (_norm(F.col("q_emb")) * _norm(F.col("c_emb")))
        ).alias("cosine"),
    )
    vec = _ranked_shortlist(scored, "cosine", "rank_vec")

    fused = lex.join(vec, "doc_id", "full_outer")
    rl = F.coalesce(F.col("rank_lex"), F.lit(_RRF_SHORTLIST + 1))
    rv = F.coalesce(F.col("rank_vec"), F.lit(_RRF_SHORTLIST + 1))
    rrf = F.lit(1.0) / (F.lit(_RRF_K) + rl) + F.lit(1.0) / (F.lit(_RRF_K) + rv)
    w = Window.orderBy(F.desc("rrf"), F.asc("doc_id"))
    top = (
        fused.withColumn("rrf", F.round(rrf, 8))
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(_BM25_TOP)
    )
    return top.withColumn("rk", F.row_number().over(w)).select(
        "doc_id",
        F.col("rank_lex").cast("bigint").alias("rank_lex"),
        F.col("rank_vec").cast("bigint").alias("rank_vec"),
        "rrf",
        F.col("rk").cast("bigint").alias("rk"),
    )


HYBRID_RRF_SQL = f"""{_BM25_CHAIN_SQL}, lex AS (
  SELECT doc_id, rank_lex FROM (
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY s_fp DESC, doc_id ASC) AS BIGINT) AS rank_lex
    FROM per_doc
  ) WHERE rank_lex <= {{SHORTLIST}}
), vscored AS (
  SELECT c.vec_id AS doc_id,
         list_sum(list_transform(list_zip(q.embedding, c.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / (SQRT(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * SQRT(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
  FROM (SELECT embedding FROM embeddings WHERE vec_id = {{QV}}) q
  CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id != {{QV}}) c
), vec AS (
  SELECT doc_id, rank_vec FROM (
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id ASC) AS BIGINT) AS rank_vec
    FROM vscored
  ) WHERE rank_vec <= {{SHORTLIST}}
), fused AS (
  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id, lex.rank_lex, vec.rank_vec,
         ROUND(1.0 / ({{K}} + COALESCE(lex.rank_lex, {{SHORTLIST}} + 1))
             + 1.0 / ({{K}} + COALESCE(vec.rank_vec, {{SHORTLIST}} + 1)), 8) AS rrf
  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
)
SELECT doc_id, rank_lex, rank_vec, rrf,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id ASC) AS BIGINT) AS rk
FROM fused
ORDER BY rrf DESC, doc_id ASC
LIMIT {{TOP}}
""".replace("{SHORTLIST}", str(_RRF_SHORTLIST)).replace("{QV}", str(_HYBRID_QUERY_VEC)).replace(
    "{K}", str(_RRF_K)
).replace("{TOP}", str(_BM25_TOP))


_UNI_TOPK = 64  # multi-char pieces kept in the unigram vocab
_UNI_MAXLEN = 3  # longest piece; bounds the DP lookback
_UNI_MISS = -(10**12)  # sentinel for pieces outside the vocab

# The dp fold's entries are PACKED bigints: key = s * 2^20 + l * 2^18 + n
# (score, last-piece length, piece count).  Rationale (VERDICT r10): the
# original array<struct<s,l,n>> accumulator took its argmax by passing
# struct candidates to ``greatest``, and Spark's struct comparison inside a
# higher-order-function lambda proved EVALUATION-PATH-UNSTABLE — under
# score-collision-heavy vocabularies (the EM round-2 Laplace re-scoring
# puts ~half the vocab in one score class) the codegen path returned a
# strictly suboptimal path for some words while the interpreted path was
# correct.  A scalar bigint key has exactly one comparison semantics on
# every path, and DuckDB mirrors the identical packing, so the two
# engines take the max of the SAME integers.  The packing preserves the
# (s, l, n) lexicographic tie-break because l*2^18 + n < 2^20 (l <= 3,
# n <= word length << 2^18).  Overflow headroom: every single character
# is in-vocab by construction (``_unigram_vocab`` includes all corpus
# chars), so dp scores stay >= len * min_char_score ~ -1e9; the worst
# candidate is prev + _UNI_MISS ~ -1e12 and the invalid sentinel is
# 2 * _UNI_MISS, so |key| <= ~2.1e18 < 2^63.
_UNI_PACK_N = 1 << 18  # width of the n (piece-count) field
_UNI_PACK_M = 1 << 20  # multiplier lifting s above the (l, n) fields


def _uni_unpack_s(e: str) -> str:
    """Spark SQL: the s field of a packed dp entry (exact: the numerator
    is a multiple of the divisor, so truncating ``div`` == floor)."""
    return f"((({e}) - pmod({e}, {_UNI_PACK_M})) div {_UNI_PACK_M})"


def _uni_unpack_l(e: str) -> str:
    """Spark SQL: the l field (INT, matching the pre-pack struct type)."""
    return f"CAST((pmod({e}, {_UNI_PACK_M}) div {_UNI_PACK_N}) AS INT)"


def _uni_unpack_n(e: str) -> str:
    """Spark SQL: the n field of a packed dp entry."""
    return f"pmod({e}, {_UNI_PACK_N})"


def _duck_unpack_s(e: str) -> str:
    """DuckDB mirror of ``_uni_unpack_s`` (DuckDB ``%`` keeps the
    dividend's sign, so the pmod idiom is spelled out; ``//`` truncation
    vs floor is irrelevant on an exact multiple)."""
    m = _UNI_PACK_M
    return f"((({e}) - (((({e}) % {m}) + {m}) % {m})) // {m})"


def _duck_unpack_l(e: str) -> str:
    """DuckDB mirror of ``_uni_unpack_l``."""
    m, n = _UNI_PACK_M, _UNI_PACK_N
    return f"((((({e}) % {m}) + {m}) % {m}) // {n})"


def _duck_unpack_n(e: str) -> str:
    """DuckDB mirror of ``_uni_unpack_n``."""
    n = _UNI_PACK_N
    return f"(((({e}) % {n}) + {n}) % {n})"


def _unigram_vocab(
    spark: SparkSession, sf_dir: str, words: DataFrame | None = None
) -> list[tuple[str, int]]:
    """The fixed unigram-LM vocabulary, SentencePiece-style: EVERY single
    character seen in the corpus (coverage — any word stays segmentable)
    plus the top-``_UNI_TOPK`` substrings of length 2..3 by word-frequency-
    weighted count (ties: count desc, piece asc).  Scores are fixed-point
    log-likelihoods, floor(1e6 * ln(cnt/total)) — ONE floor per piece,
    the idf_fp discipline, so the Viterbi sums below are exact bigint
    arithmetic cross-engine.  Bounded driver collect: |alphabet| + 64
    rows, the broadcast-vocab shape of ``_bpe_apply``."""
    if words is None:  # distinct word + corpus frequency
        words = _bpe_words(spark, sf_dir)

    def grams(length: int) -> DataFrame:
        return words.filter(F.length("word_id") >= length).select(
            "cnt",
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(word_id) - {length} + 1), "
                    f"i -> substring(word_id, i, {length}))"
                )
            ).alias("piece"),
        )

    chars = (
        grams(1)
        .groupBy("piece")
        .agg(F.sum("cnt").cast("bigint").alias("pc"))
    )
    multi = (
        grams(2)
        .unionByName(grams(3))
        .groupBy("piece")
        .agg(F.sum("cnt").cast("bigint").alias("pc"))
        .orderBy(F.desc("pc"), F.asc("piece"))
        .limit(_UNI_TOPK)
    )
    rows = chars.unionByName(multi).collect()
    total = sum(int(r["pc"]) for r in rows)
    # floor(1e6 * ln(cnt/total)) via the platform libm — the same call
    # DuckDB's ln() makes, so the injected literals equal the oracle's
    # recomputed scores bit-for-bit (the idf_fp discipline)
    import math

    scored = [
        (r["piece"], math.floor(1e6 * math.log(int(r["pc"]) / total))) for r in rows
    ]
    return sorted(scored)


def _unigram_dp_sql() -> str:
    """THE Viterbi fold as a Spark SQL expression — dp[i] = max over
    piece lengths l<=3 of dp[i-l] + score(word[i-l+1..i]), a JVM-side
    ``aggregate`` over character positions reading scores from a
    ``_vocab`` map column.  Entries are PACKED bigints (see the
    ``_UNI_PACK_*`` note above: scalar ``greatest``, never struct
    comparison).  Serving (``text_unigram_segment``) takes the last dp
    entry; training (``text_unigram_train``) backtracks over the whole
    array — ONE expression builder for both, so the E-step and the
    scorer cannot drift (the ``_bpe_train`` discipline)."""

    def cand(lag: int) -> str:
        prev = f"element_at(acc, CAST(i AS INT) - {lag - 1})"
        piece = f"substring(word_id, CAST(i AS INT) - {lag - 1}, {lag})"
        score = f"coalesce(element_at(_vocab, {piece}), {_UNI_MISS}L)"
        return (
            f"IF(i >= {lag}, "
            f"({_uni_unpack_s(prev)} + {score}) * {_UNI_PACK_M} "
            f"+ {lag * _UNI_PACK_N + 1} + {_uni_unpack_n(prev)}, "
            f"{2 * _UNI_MISS * _UNI_PACK_M}L)"
        )

    best = f"greatest({cand(1)}, {cand(2)}, {cand(3)})"
    return (
        "aggregate(sequence(1, length(word_id)), "
        "array(0L), "
        f"(acc, i) -> array_append(acc, {best}))"
    )


#: backtrack over the packed dp array (``_dparr`` column): walk
#: pos -> pos - l emitting each chosen piece; every step shrinks pos by
#: >= 1, so length(word) fold steps always reach position 0
_UNI_BT_L = _uni_unpack_l("element_at(_dparr, acc.p + 1)")
_UNI_BT_SQL = (
    "aggregate(sequence(1, length(word_id)), "
    "named_struct('p', length(word_id), 'ps', array_repeat('', 0)), "
    "(acc, i) -> IF(acc.p > 0, named_struct("
    f"'p', acc.p - {_UNI_BT_L}, "
    "'ps', array_append(acc.ps, substring(word_id, "
    f"acc.p - {_UNI_BT_L} + 1, "
    f"{_UNI_BT_L}))), acc)).ps"
)


def _vocab_map_expr(vocab: list[tuple[str, int]]) -> F.Column:
    pairs = ", ".join(f"'{p}', {s}L" for p, s in vocab)
    return F.expr(f"map({pairs})")


def _unigram_segment_words(words: DataFrame, vocab: list[tuple[str, int]]) -> DataFrame:
    """Per word the best (fixed-point score, piece count) under
    ``vocab``.  Shared by the query and its reference test so the
    expression cannot drift."""
    return (
        words.withColumn("_vocab", _vocab_map_expr(vocab))
        .withColumn("_dp", F.expr(f"element_at({_unigram_dp_sql()}, -1)"))
        .select(
            "word_id",
            F.expr(_uni_unpack_s("_dp")).alias("w_score"),
            F.expr(_uni_unpack_n("_dp")).alias("w_pieces"),
        )
    )


def _unigram_segment_pieces(words: DataFrame, vocab: list[tuple[str, int]]) -> DataFrame:
    """Per word the Viterbi PIECE LIST under ``vocab`` (the E-step's
    sufficient statistics) — the same dp fold as serving plus the
    backtrack fold, all JVM-side codegen."""
    return (
        words.withColumn("_vocab", _vocab_map_expr(vocab))
        .withColumn("_dparr", F.expr(_unigram_dp_sql()))
        .withColumn("pieces", F.expr(_UNI_BT_SQL))
        .select("word_id", "cnt", "pieces")
    )


def text_unigram_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer scoring (the SentencePiece serving half):
    segment every distinct word into the maximum-likelihood piece
    sequence over a fixed corpus-derived vocabulary, by TRUE Viterbi —
    dp[i] = max over piece lengths l<=3 of dp[i-l] + score(word[i-l+1..i])
    — run as a JVM-side ``aggregate`` fold over character positions
    (whole-stage codegen; no Python in the hot path, the ``_bpe_apply``
    discipline).  Scores are exact fixed-point bigints; the argmax is
    tie-broken (score, last-piece length, piece count) via a packed
    bigint comparison key — disjoint bit fields, scalar ``greatest`` —
    so the path choice is deterministic cross-engine AND independent of
    the codegen-vs-interpreted evaluation path (struct-typed comparison
    inside HOF lambdas is not; VERDICT r10).  The DuckDB oracle replays
    the identical fold, same packing, with ``list_reduce``.

    Per document (vocabulary join, broadcast-class like
    ``text_bpe_encode``): word count, total piece count, summed
    log-likelihood, and fixed-point pieces-per-word — the fertility
    metric tokenizer dashboards track.  Parity target: SURVEY §2.5
    LLM-ops mandate (reference has no tokenizer; north-star surface)."""
    # one corpus-wide tokenize+groupBy, checkpointed and REUSED by both
    # the vocab collect and the segmentation (the text_bpe_encode
    # discipline at :804 — without this the heaviest scan runs twice)
    words = _bpe_words(spark, sf_dir).coalesce(4).localCheckpoint(eager=True)
    vocab = _unigram_vocab(spark, sf_dir, words)
    seg = _unigram_segment_words(words.select("word_id", "cnt"), vocab)
    d = load_table(spark, sf_dir, "documents")
    doc_words = with_tokens(d).select("doc_id", F.explode("_toks").alias("word_id"))
    per_doc = (
        doc_words.join(F.broadcast(seg), "word_id")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("w_pieces").cast("bigint").alias("n_pieces"),
            F.sum("w_score").cast("bigint").alias("loglik_fp"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_words",
        "n_pieces",
        "loglik_fp",
        F.floor(F.col("n_pieces") * F.lit(1000000) / F.col("n_words"))
        .cast("bigint")
        .alias("pieces_per_word_fp"),
    )


_UNI_EM_ROUNDS = 2  # fixed EM rounds; each is one distributed E-pass + one bounded M-agg


def _unigram_em_train(
    spark: SparkSession, sf_dir: str, words: DataFrame | None = None
) -> list[tuple[str, int, int]]:
    """SentencePiece-style unigram-LM TRAINING: Viterbi (hard) EM over
    the fixed corpus vocabulary (Kudo 2018's E-step taken at its mode —
    the standard scalable variant, since the mode's sufficient
    statistics are exactly the serving fold's backtracked pieces).

    Per round: E-step = Viterbi-segment every distinct word under the
    current scores (the SHARED dp fold + backtrack — all JVM codegen,
    weighted by corpus word count); M-step = one hash agg of piece usage
    collected driver-side (bounded: |alphabet| + 64 rows of model
    state), then score(p) = floor(1e6 * ln((c_p + 1) / sum(c + 1))) —
    Laplace-smoothed so zero-usage pieces stay finite and the full
    vocabulary survives (fixed-vocab re-estimation; pruning is the
    documented non-goal).  math.log here and DuckDB's ln() are the same
    libm call — the idf_fp literal-injection discipline.

    Returns [(piece, expected_count, score_fp)] after the final round,
    sorted by piece."""
    import math

    if words is None:
        words = _bpe_words(spark, sf_dir).coalesce(4).localCheckpoint(eager=True)
    vocab0 = _unigram_vocab(spark, sf_dir, words)
    pieces_all = sorted(p for p, _ in vocab0)
    scores: list[tuple[str, int]] = vocab0
    exp_cnt: dict[str, int] = {}
    for _ in range(_UNI_EM_ROUNDS):
        seg = _unigram_segment_pieces(words.select("word_id", "cnt"), scores)
        crows = (
            seg.select("cnt", F.explode("pieces").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("cnt").cast("bigint").alias("c"))
            .collect()  # bounded: at most vocab-sized (chars + 64)
        )
        cmap = {r["piece"]: int(r["c"]) for r in crows}
        exp_cnt = {p: cmap.get(p, 0) for p in pieces_all}
        total = sum(exp_cnt.values()) + len(pieces_all)
        scores = [
            (p, math.floor(1e6 * math.log((exp_cnt[p] + 1) / total))) for p in pieces_all
        ]
    return [(p, exp_cnt[p], s) for p, s in scores]


def text_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unigram tokenizer's TRAINING half (VERDICT r9 task 3):
    publish the EM-re-estimated piece table — expected usage count under
    the final Viterbi segmentation and the smoothed fixed-point score.
    Serving (``text_unigram_segment``) and this trainer share the dp
    fold via ``_unigram_dp_sql`` so E-step and scorer cannot drift; the
    oracle replays both EM rounds as materialized CTEs (dp + backtrack
    folds in ``list_reduce``, the ``text_bpe_merges`` unroll shape)."""
    rows = _unigram_em_train(spark, sf_dir)
    return spark.createDataFrame(
        [(p, int(c), int(s)) for p, c, s in rows],
        "piece string, exp_cnt bigint, score_fp bigint",
    )


def _unigram_trained_vocab(
    spark: SparkSession, sf_dir: str, words: DataFrame
) -> list[tuple[str, int]]:
    """The TRAINED unigram scores, build-once/serve-many: the EM runs
    once per machine per fixture content and the final (piece, score_fp)
    table is cached under the fixture fingerprint — the
    ``quality_logit_scores`` / persisted-ANN discipline (training is a
    build pipeline; scoring queries serve the artifact).  The EM is
    deterministic, so a cached artifact is identical to a rebuild."""
    import csv
    import os

    from realtime_change_data_capture_streaming_spark.llm_ops.similarity import _index_cache

    def build(root: str) -> None:
        os.makedirs(root, exist_ok=True)
        trained = _unigram_em_train(spark, sf_dir, words)
        with open(os.path.join(root, "scores.csv"), "w", newline="") as f:
            w = csv.writer(f)
            for p, _, s in trained:
                w.writerow([p, s])

    root = _index_cache("spark_graft_unilm_", spark, sf_dir, build, table="documents")
    with open(os.path.join(root, "scores.csv"), newline="") as f:
        return sorted((p, int(s)) for p, s in csv.reader(f))


def quality_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (r11): score every document with
    the TRAINED unigram LM (the ``text_unigram_train`` EM output, not
    the raw frequency scores serving uses) and split each language into
    head / middle / tail by per-language rank thirds — the curation
    gate CCNet/RedPajama apply before sampling.

    Per doc: Viterbi loglik under the trained scores (the SHARED dp
    fold — trainer, server, and this query cannot drift), negative
    log-likelihood per piece as an exact bigint (``(-loglik_fp) div
    n_pieces``; both engines truncate positive division identically),
    then one lang-partitioned window (guard-safe: never global) ranks
    docs and 3*rank <= n / 3*rank <= 2n cuts the thirds in pure integer
    arithmetic — no float quantiles to drift cross-engine.  The DuckDB
    oracle replays the full EM (the ``UNIGRAM_TRAIN_SQL`` unroll) and
    the same fold/window.  Training state is a bounded driver collect
    (|alphabet| + 64 rows) and is fingerprint-CACHED
    (``_unigram_trained_vocab``) so serving is one broadcast join + one
    lang-partitioned window at any corpus size — the build-once/
    serve-many shape of the other persisted model artifacts."""
    from pyspark.sql import Window

    words = _bpe_words(spark, sf_dir).coalesce(4).localCheckpoint(eager=True)
    vocab = _unigram_trained_vocab(spark, sf_dir, words)
    seg = _unigram_segment_words(words.select("word_id", "cnt"), vocab)
    d = load_table(spark, sf_dir, "documents")
    doc_words = with_tokens(d).select("doc_id", "lang", F.explode("_toks").alias("word_id"))
    per_doc = (
        doc_words.join(F.broadcast(seg), "word_id")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("w_pieces").cast("bigint").alias("n_pieces"),
            F.sum("w_score").cast("bigint").alias("loglik_fp"),
        )
        .select(
            "doc_id",
            "lang",
            F.expr("(-loglik_fp) div n_pieces").cast("bigint").alias("nll_fp"),
        )
    )
    w = Window.partitionBy("lang").orderBy("nll_fp", "doc_id")
    ranked = per_doc.select(
        "doc_id",
        "lang",
        "nll_fp",
        F.row_number().over(w).alias("_r"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("_n"),
    )
    return ranked.select(
        "doc_id",
        "lang",
        "nll_fp",
        F.when(F.col("_r") * 3 <= F.col("_n"), F.lit("head"))
        .when(F.col("_r") * 3 <= F.col("_n") * 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def _unigram_cand_sql(lag: int) -> str:
    """One Viterbi candidate (piece of length ``lag`` ending at position
    x[1]) for the DuckDB fold — mirrors ``cand`` above exactly, PACKED
    bigint included, so both engines take ``greatest`` of the SAME
    integers (the evaluation-path-stability fix; see ``_UNI_PACK_*``)."""
    prev = f"acc[CAST(x[1] AS INT) - {lag} + 1]"
    piece = f"substr(word, CAST(x[1] AS INT) - {lag} + 1, {lag})"
    score = f"coalesce(m[{piece}][1], CAST({_UNI_MISS} AS BIGINT))"
    return (
        f"CASE WHEN x[1] >= {lag} THEN "
        f"({_duck_unpack_s(prev)} + {score}) * {_UNI_PACK_M} "
        f"+ {lag * _UNI_PACK_N + 1} + {_duck_unpack_n(prev)} "
        f"ELSE CAST({2 * _UNI_MISS * _UNI_PACK_M} AS BIGINT) END"
    )


UNIGRAM_SQL = f"""
WITH tk AS MATERIALIZED (
  SELECT doc_id, list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '') AS ts
  FROM documents
), wd AS MATERIALIZED (
  SELECT u.word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT UNNEST(ts) AS word FROM tk) u GROUP BY 1
), chars AS (
  SELECT substr(word, CAST(t.i AS INT), 1) AS piece, CAST(SUM(cnt) AS BIGINT) AS pc
  FROM wd, UNNEST(range(1, length(word) + 1)) AS t(i)
  GROUP BY 1
), multi AS (
  SELECT piece, pc FROM (
    SELECT substr(word, CAST(t.i AS INT), l.l) AS piece, CAST(SUM(cnt) AS BIGINT) AS pc
    FROM wd, (VALUES (2), (3)) AS l(l),
         UNNEST(range(1, length(word) - l.l + 2)) AS t(i)
    WHERE length(word) >= l.l
    GROUP BY 1
  ) ORDER BY pc DESC, piece ASC LIMIT {_UNI_TOPK}
), vocab AS (
  SELECT piece, pc FROM chars UNION ALL SELECT piece, pc FROM multi
), scored AS (
  SELECT piece,
         CAST(floor(1e6 * ln(CAST(pc AS DOUBLE) / (SELECT SUM(pc) FROM vocab))) AS BIGINT) AS s
  FROM vocab
), vmap AS (
  SELECT MAP(list(piece ORDER BY piece), list(s ORDER BY piece)) AS m FROM scored
), seg AS MATERIALIZED (
  SELECT word,
         {_duck_unpack_s("dp[len(dp)]")} AS w_score,
         {_duck_unpack_n("dp[len(dp)]")} AS w_pieces
  FROM (
    SELECT word,
           list_reduce(
             list_concat(
               [[CAST(0 AS BIGINT)]],
               list_transform(range(1, length(word) + 1), i -> [i])
             ),
             (acc, x) -> list_append(acc, greatest(
               {_unigram_cand_sql(1)},
               {_unigram_cand_sql(2)},
               {_unigram_cand_sql(3)}
             ))
           ) AS dp
    FROM wd CROSS JOIN vmap
  )
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(s.w_pieces) AS BIGINT) AS n_pieces,
       CAST(SUM(s.w_score) AS BIGINT) AS loglik_fp,
       CAST(floor(SUM(s.w_pieces) * 1000000 / COUNT(*)) AS BIGINT) AS pieces_per_word_fp
FROM (SELECT doc_id, UNNEST(ts) AS word FROM tk) t
JOIN seg s USING (word)
GROUP BY 1
"""


def _uni_train_dp_sql() -> str:
    """The DuckDB dp fold (same as UNIGRAM_SQL's seg CTE body): packed
    bigint dp entries, scalar ``greatest`` argmax."""
    return f"""list_reduce(
             list_concat(
               [[CAST(0 AS BIGINT)]],
               list_transform(range(1, length(word) + 1), i -> [i])
             ),
             (acc, x) -> list_append(acc, greatest(
               {_unigram_cand_sql(1)},
               {_unigram_cand_sql(2)},
               {_unigram_cand_sql(3)}
             ))
           )"""


# DuckDB 1.0's list_reduce silently mangles a STRUCT accumulator that
# carries a LIST field (each step loses the previous appends — verified
# standalone), and WORSE: a second lambda fold over a COMPUTED list
# column (the dp array) nondeterministically MISALIGNS rows under
# parallel execution — ~10-30% of executes at sf0.01 paired some word
# with another word's backtracked pieces (verified: 'customer' returned
# 'small''s pieces; the dp fold alone never misaligns, 0/25 executes).
# So the oracle's backtrack is a RECURSIVE CTE walking pos -> pos - l
# with plain array indexing — no lambda over a computed list anywhere.
# Each walk row emits the piece ENDING at the pre-step position; pieces
# come out in backtrack order via ORDER BY pos DESC (matching the Spark
# fold's emit order).  Requires the oracle's WITH clause to be
# WITH RECURSIVE.
def _duck_bt_walk_sql(src: str, walk: str) -> str:
    """The recursive backtrack over ``src`` (word, cnt, dp) into CTE
    ``walk`` (word, cnt, pos, piece); seed rows carry piece = NULL."""
    lexpr = _duck_unpack_l("dp[CAST(pos AS INT) + 1]")
    return f"""{walk} AS (
  SELECT word, cnt, dp, CAST(length(word) AS BIGINT) AS pos,
         CAST(NULL AS VARCHAR) AS piece
  FROM {src}
  UNION ALL
  SELECT word, cnt, dp, pos - {lexpr} AS pos,
         substr(word, CAST(pos - {lexpr} + 1 AS INT), CAST({lexpr} AS INT)) AS piece
  FROM {walk} WHERE pos > 0
)"""


def _uni_train_round_sql(r: int) -> str:
    """One EM round: dp{r} (the fold under vmap{r-1}), walk{r} (the
    RECURSIVE backtrack — see ``_duck_bt_walk_sql``) -> usage counts ->
    Laplace-smoothed re-scored vocab -> vmap{r}.  dp/cnt are
    MATERIALIZED (multi-referenced; plain CTEs inline per reference)."""
    return f""", dp{r} AS MATERIALIZED (
  SELECT word, cnt, {_uni_train_dp_sql()} AS dp
  FROM wd CROSS JOIN vmap{r - 1}
), {_duck_bt_walk_sql(f"dp{r}", f"walk{r}")}, cnt{r} AS MATERIALIZED (
  SELECT piece, CAST(SUM(cnt) AS BIGINT) AS c
  FROM walk{r} WHERE piece IS NOT NULL
  GROUP BY 1
), tot{r} AS (
  SELECT CAST(SUM(COALESCE(c.c, 0) + 1) AS BIGINT) AS tot
  FROM vocab v LEFT JOIN cnt{r} c USING (piece)
), scored{r} AS MATERIALIZED (
  SELECT v.piece, CAST(COALESCE(c.c, 0) AS BIGINT) AS exp_cnt,
         CAST(floor(1e6 * ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE) / t.tot)) AS BIGINT) AS s
  FROM vocab v LEFT JOIN cnt{r} c USING (piece) CROSS JOIN tot{r} t
), vmap{r} AS (
  SELECT MAP(list(piece ORDER BY piece), list(s ORDER BY piece)) AS m FROM scored{r}
)"""


def _unigram_train_sql() -> str:
    """Full EM replay: the UNIGRAM_SQL vocabulary prefix (initial
    counts + scores as vmap0), then _UNI_EM_ROUNDS unrolled rounds.
    WITH RECURSIVE because each round's backtrack is a recursive walk
    (the lambda-misalignment workaround in ``_duck_bt_walk_sql``)."""
    prefix = f"""
WITH RECURSIVE tk AS MATERIALIZED (
  SELECT doc_id, list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '') AS ts
  FROM documents
), wd AS MATERIALIZED (
  SELECT u.word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT UNNEST(ts) AS word FROM tk) u GROUP BY 1
), chars AS (
  SELECT substr(word, CAST(t.i AS INT), 1) AS piece, CAST(SUM(cnt) AS BIGINT) AS pc
  FROM wd, UNNEST(range(1, length(word) + 1)) AS t(i)
  GROUP BY 1
), multi AS (
  SELECT piece, pc FROM (
    SELECT substr(word, CAST(t.i AS INT), l.l) AS piece, CAST(SUM(cnt) AS BIGINT) AS pc
    FROM wd, (VALUES (2), (3)) AS l(l),
         UNNEST(range(1, length(word) - l.l + 2)) AS t(i)
    WHERE length(word) >= l.l
    GROUP BY 1
  ) ORDER BY pc DESC, piece ASC LIMIT {_UNI_TOPK}
), vocab AS MATERIALIZED (
  SELECT piece, pc FROM chars UNION ALL SELECT piece, pc FROM multi
), scored0 AS (
  SELECT piece,
         CAST(floor(1e6 * ln(CAST(pc AS DOUBLE) / (SELECT SUM(pc) FROM vocab))) AS BIGINT) AS s
  FROM vocab
), vmap0 AS (
  SELECT MAP(list(piece ORDER BY piece), list(s ORDER BY piece)) AS m FROM scored0
)"""
    rounds = "".join(_uni_train_round_sql(r) for r in range(1, _UNI_EM_ROUNDS + 1))
    return (
        prefix
        + rounds
        + f"\nSELECT piece, exp_cnt, s AS score_fp FROM scored{_UNI_EM_ROUNDS}\n"
    )


UNIGRAM_TRAIN_SQL = _unigram_train_sql()


def _ppl_buckets_sql() -> str:
    """Oracle for ``quality_perplexity_buckets``: the UNIGRAM_TRAIN_SQL
    EM unroll (same prefix + rounds), then the serving fold under the
    FINAL vmap, per-doc rollup, and the integer rank-thirds window."""
    n = _UNI_EM_ROUNDS
    base = _unigram_train_sql().split(
        f"\nSELECT piece, exp_cnt, s AS score_fp FROM scored{n}"
    )[0]
    return (
        base
        + f""", segf AS MATERIALIZED (
  SELECT word,
         {_duck_unpack_s("dp[len(dp)]")} AS w_score,
         {_duck_unpack_n("dp[len(dp)]")} AS w_pieces
  FROM (
    SELECT word, {_uni_train_dp_sql()} AS dp
    FROM wd CROSS JOIN vmap{n}
  )
), perdoc AS (
  SELECT t.doc_id, dd.lang,
         (-CAST(SUM(s.w_score) AS BIGINT)) // CAST(SUM(s.w_pieces) AS BIGINT) AS nll_fp
  FROM (SELECT doc_id, UNNEST(ts) AS word FROM tk) t
  JOIN segf s USING (word)
  JOIN documents dd USING (doc_id)
  GROUP BY 1, 2
)
SELECT doc_id, lang, nll_fp,
       CASE WHEN 3 * r <= n THEN 'head'
            WHEN 3 * r <= 2 * n THEN 'middle'
            ELSE 'tail' END AS bucket
FROM (
  SELECT doc_id, lang, nll_fp,
         row_number() OVER (PARTITION BY lang ORDER BY nll_fp, doc_id) AS r,
         count(*) OVER (PARTITION BY lang) AS n
  FROM perdoc
)
"""
    )


PPL_BUCKETS_SQL = _ppl_buckets_sql()


QUERIES = {
    "text_token_stats": token_stats,
    "text_bigram_frequencies": bigram_frequencies,
    "text_quality_scores": quality_scores,
    "text_language_id": language_id,
    "text_fingerprints": fingerprints,
    "text_repetition_ratio": repetition_ratio,
    "text_gopher_rules": gopher_rules,
    "text_tfidf_top_terms": tfidf_top_terms,
    "text_bm25_topk": text_bm25_topk,
    "text_bm25_persisted_topk": text_bm25_persisted_topk,
    "text_bpe_merges": text_bpe_merges,
    "text_bpe_encode": text_bpe_encode,
    "text_bigram_pmi": text_bigram_pmi,
    "text_rrf_fusion_topk": text_rrf_fusion_topk,
    "hybrid_lexical_vector_topk": hybrid_lexical_vector_topk,
    "text_bigram_lm_score": bigram_lm_score,
    "text_heavy_hitters": heavy_hitter_terms,
    "text_unigram_segment": text_unigram_segment,
    "text_unigram_train": text_unigram_train,
    "quality_perplexity_buckets": quality_perplexity_buckets,
}

ORACLE = {
    "text_token_stats": TOKEN_STATS_SQL,
    "text_bigram_frequencies": BIGRAMS_SQL,
    "text_quality_scores": QUALITY_SQL,
    "text_language_id": LANGUAGE_ID_SQL,
    "text_fingerprints": FINGERPRINTS_SQL,
    "text_repetition_ratio": REPETITION_SQL,
    "text_gopher_rules": GOPHER_SQL,
    "text_tfidf_top_terms": TFIDF_SQL,
    "text_bm25_topk": BM25_SQL,
    "text_bm25_persisted_topk": BM25_SQL,
    "text_bpe_merges": _BPE_SQL,
    "text_bpe_encode": _BPE_ENCODE_SQL,
    "text_bigram_pmi": _PMI_SQL_TEXT,
    "text_rrf_fusion_topk": RRF_SQL,
    "hybrid_lexical_vector_topk": HYBRID_RRF_SQL,
    "text_bigram_lm_score": BIGRAM_LM_SQL,
    "text_heavy_hitters": HEAVY_HITTERS_SQL,
    "text_unigram_segment": UNIGRAM_SQL,
    "text_unigram_train": UNIGRAM_TRAIN_SQL,
    "quality_perplexity_buckets": PPL_BUCKETS_SQL,
}
