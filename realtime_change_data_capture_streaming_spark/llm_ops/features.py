"""Feature-engineering operators for ML training pipelines.

The step between curated data and a trainer: turn raw columns into
model-ready features, at table scale, without a Python hot path.

- ``feature_target_encode``: m-estimate (smoothed-mean) target encoding
  of a categorical column — the leakage-prone-by-default transform done
  right at scale: ONE aggregate over the table plus a broadcast global
  mean, exact decimal sums so the encoding replays bit-identically.
- ``feature_hashing_counts``: the hashing trick — unbounded token
  vocabulary projected onto a fixed feature space by hashing.  The
  bucket hash is md5-derived (the repo-wide portable-hash discipline),
  so the projection is reproducible on any engine/cluster; output is
  the per-bucket load profile, the collision diagnostic a feature-
  hashing pipeline monitors.
- ``events_psi_drift``: population stability index between two time
  periods per segment — THE production drift monitor for feature
  distributions.  Fixed-width bins (a per-row expression, no global
  min/max pass), Laplace smoothing so empty bins stay finite, one hash
  aggregate; ln() is not IEEE-correctly-rounded so the score is rounded
  at the output boundary.

Reference parity: the reference has no analytics surface
(``/root/reference/README.md:29-32``); these extend §2.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.llm_ops.curation import _bucket_sql, hash_bucket
from realtime_change_data_capture_streaming_spark.llm_ops.text import tokens
from realtime_change_data_capture_streaming_spark.sources.tables import load_table

# ------------------------------------------------------- target encoding

_TE_M = 10.0  # m-estimate smoothing weight (pseudo-observations at the prior)


def feature_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m-estimate target encoding of ``o_orderpriority`` against
    ``o_totalprice``: enc = (sum_y + m * prior) / (n + m).

    One aggregate per category + one scalar aggregate broadcast for the
    prior; sums are exact decimals, the single double division happens
    once per category — deterministic under any partitioning.  At scale
    the output is category-cardinality-sized (an encoder table to
    broadcast-join onto training data), never row-scale."""
    o = load_table(spark, sf_dir, "orders")
    per_cat = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("sum_y"),
    )
    prior = o.agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias(
            "prior"
        )
    )
    return per_cat.crossJoin(F.broadcast(prior)).select(
        "o_orderpriority",
        "n",
        F.round(F.col("prior"), 6).alias("prior_mean"),
        F.round(
            (F.col("sum_y").cast("double") + F.lit(_TE_M) * F.col("prior"))
            / (F.col("n").cast("double") + F.lit(_TE_M)),
            6,
        ).alias("encoded"),
    )


_TARGET_ENCODE_SQL = f"""
WITH prior AS (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS prior
  FROM orders
)
SELECT o_orderpriority, COUNT(*) AS n,
       ROUND(prior, 6) AS prior_mean,
       ROUND((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) + {_TE_M} * prior)
             / (CAST(COUNT(*) AS DOUBLE) + {_TE_M}), 6) AS encoded
FROM orders, prior
GROUP BY o_orderpriority, prior
"""

# ------------------------------------------------------- feature hashing

N_HASH_BUCKETS = 64


def feature_hashing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick projection of the document token stream onto
    ``N_HASH_BUCKETS`` feature dimensions: bucket = md5(token) mod B
    (portable across engines), with per-bucket instance count, distinct
    term count (the collision load), and an example term.

    One tokenize pass + one hash aggregate on the bucket id — the
    vocabulary never materializes, which is the point of the trick at
    100 TB: feature width is fixed regardless of corpus growth."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens(F.col("text"))).alias("tok"))
    return (
        toks.withColumn("bucket", hash_bucket(F.col("tok"), N_HASH_BUCKETS))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_instances"),
            F.countDistinct("tok").alias("n_terms"),
            F.min("tok").alias("example_term"),
        )
    )


_FEATURE_HASH_SQL = f"""
WITH toks AS (
  SELECT UNNEST(list_filter(
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'),
           t -> t != '')) AS tok
  FROM documents
)
SELECT {_bucket_sql("tok", N_HASH_BUCKETS)} AS bucket,
       COUNT(*) AS n_instances,
       COUNT(DISTINCT tok) AS n_terms,
       MIN(tok) AS example_term
FROM toks
GROUP BY 1
"""

# ------------------------------------------------------------ PSI drift

_PSI_SPLIT = "2024-01-15"
_PSI_BIN_W = 50.0
_PSI_N_BINS = 10  # values 0..500 -> bins 0..9 (clamped)
_PSI_FP = float(1 << 30)  # fixed-point scale for the order-independent term fold


def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of ``value`` per event_type between the
    periods before/after a fixed split timestamp.

    Bins are fixed-width per-row expressions (no global min/max pass);
    Laplace smoothing (+1 per bin) keeps one-sided-empty bins finite;
    the bin aggregation is ONE hash agg and the PSI fold runs over the
    bounded (type x bin) table.  Bins empty in BOTH periods are excluded
    (only observed bins enter the sum; their smoothed terms would be
    nonzero when n_a != n_b, so this is a definitional choice, mirrored
    exactly by the oracle).  Per-bin terms are folded as
    floor(term * 2^30) fixed-point integers — the same discipline as
    chi-square / PageRank / the bigram LM — so the cross-bin sum is
    order-independent under any partitioning; ln() is confined to the
    one per-bin term expression, and the PSI is rounded at the output
    boundary (a one-ulp libm difference moves the fold by at most
    2^-30, invisible at 6 dp)."""
    e = load_table(spark, sf_dir, "events")
    binned = e.select(
        "event_type",
        F.when(F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp"), F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("period"),
        F.least(
            F.lit(_PSI_N_BINS - 1),
            F.floor(F.col("value") / F.lit(_PSI_BIN_W)).cast("int"),
        ).alias("bin"),
    )
    counts = binned.groupBy("event_type", "period", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    pivoted = counts.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("period") == "a", F.col("c")).otherwise(F.lit(0))).alias("ca"),
        F.sum(F.when(F.col("period") == "b", F.col("c")).otherwise(F.lit(0))).alias("cb"),
    )
    totals = pivoted.groupBy("event_type").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    j = pivoted.join(totals, "event_type")
    pa = (F.col("ca") + F.lit(1)).cast("double") / (
        F.col("na") + F.lit(_PSI_N_BINS)
    ).cast("double")
    pb = (F.col("cb") + F.lit(1)).cast("double") / (
        F.col("nb") + F.lit(_PSI_N_BINS)
    ).cast("double")
    return (
        j.select(
            "event_type",
            "na",
            "nb",
            F.floor(((pa - pb) * F.log(pa / pb)) * F.lit(_PSI_FP)).alias("t_fp"),
        )
        .groupBy("event_type", "na", "nb")
        .agg(F.round(F.sum("t_fp").cast("double") / F.lit(_PSI_FP), 6).alias("psi"))
    )


_PSI_SQL = f"""
WITH binned AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' THEN 'a' ELSE 'b' END AS period,
         LEAST({_PSI_N_BINS - 1}, CAST(FLOOR(value / {_PSI_BIN_W}) AS INTEGER)) AS bin
  FROM events
), counts AS (
  SELECT event_type, period, bin, COUNT(*) AS c FROM binned GROUP BY 1, 2, 3
), pivoted AS (
  SELECT event_type, bin,
         SUM(CASE WHEN period = 'a' THEN c ELSE 0 END) AS ca,
         SUM(CASE WHEN period = 'b' THEN c ELSE 0 END) AS cb
  FROM counts GROUP BY 1, 2
), totals AS (
  SELECT event_type, CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM pivoted GROUP BY 1
)
SELECT p.event_type, t.na, t.nb,
       ROUND(CAST(SUM(CAST(FLOOR(
                 (CAST(ca + 1 AS DOUBLE) / (t.na + {_PSI_N_BINS})
                  - CAST(cb + 1 AS DOUBLE) / (t.nb + {_PSI_N_BINS}))
                 * LN((CAST(ca + 1 AS DOUBLE) / (t.na + {_PSI_N_BINS}))
                      / (CAST(cb + 1 AS DOUBLE) / (t.nb + {_PSI_N_BINS})))
                 * {_PSI_FP}) AS BIGINT)) AS BIGINT) / {_PSI_FP}, 6) AS psi
FROM pivoted p JOIN totals t USING (event_type)
GROUP BY 1, 2, 3
"""


# ------------------------------------------------- linear model inference

_LOGIT_W_RANGE = 1001  # bucket weights in [-500, +500]


def _bucket_weight(bucket: F.Column) -> F.Column:
    """Signed integer weight per feature bucket, md5-derived so the
    "trained model" is a pure function both engines materialize
    identically (the repo-wide portable-hash discipline)."""
    raw = F.conv(
        F.substring(F.md5(F.concat(F.lit("w:"), bucket.cast("string"))), 1, 8), 16, 10
    ).cast("bigint")
    return (raw % _LOGIT_W_RANGE) - ((_LOGIT_W_RANGE - 1) // 2)


def _bucket_weight_sql(expr: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('w:' || CAST({expr} AS VARCHAR)), 1, 8))::UBIGINT "
        f"% {_LOGIT_W_RANGE} AS BIGINT) - {(_LOGIT_W_RANGE - 1) // 2}"
    )


def quality_logit_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier INFERENCE at corpus scale — the
    fastText-shaped filter every web-scale curation pipeline runs (CCNet
    / LLaMA-style "quality model" pass), with the trained weights
    standing in as a deterministic md5-derived weight per hashed feature
    bucket so the whole inference replays cross-engine.

    Scale shape: one tokenize pass, bucket = md5 hash (the vocabulary
    never materializes), the sparse dot product is ONE per-doc hash
    aggregate of exact bigint weight contributions — no model broadcast
    even needed, since the weight is a pure function of the bucket.  The
    per-token mean logit folds as floor(logit*2^20/n) exact fixed point;
    keep = logit >= 0 is the filter decision.  A real trained model
    swaps ``_bucket_weight`` for a broadcast weight-table join; nothing
    else changes."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    contrib = toks.select(
        "doc_id", _bucket_weight(hash_bucket(F.col("tok"), N_HASH_BUCKETS)).alias("w")
    )
    per_doc = contrib.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_toks"),
        F.sum("w").cast("bigint").alias("logit"),
    )
    return per_doc.select(
        "doc_id",
        "n_toks",
        "logit",
        F.floor(F.col("logit") * F.lit(1 << 20) / F.col("n_toks"))
        .cast("bigint")
        .alias("mean_logit_fp"),
        (F.col("logit") >= 0).alias("keep"),
    )


_QUALITY_LOGIT_SQL = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(list_filter(
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'),
           t -> t != '')) AS tok
  FROM documents
), contrib AS (
  SELECT doc_id, {_bucket_weight_sql(_bucket_sql("tok", N_HASH_BUCKETS))} AS w
  FROM toks
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
       CAST(SUM(w) AS BIGINT) AS logit,
       CAST(FLOOR(CAST(SUM(w) * {1 << 20} AS DOUBLE) / COUNT(*)) AS BIGINT) AS mean_logit_fp,
       SUM(w) >= 0 AS keep
FROM contrib
GROUP BY 1
"""


QUERIES = {
    "feature_target_encode": feature_target_encode,
    "feature_hashing_counts": feature_hashing_counts,
    "events_psi_drift": events_psi_drift,
    "quality_logit_scores": quality_logit_scores,
}

ORACLE = {
    "feature_target_encode": _TARGET_ENCODE_SQL,
    "feature_hashing_counts": _FEATURE_HASH_SQL,
    "events_psi_drift": _PSI_SQL,
    "quality_logit_scores": _QUALITY_LOGIT_SQL,
}
