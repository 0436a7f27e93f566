"""Scalar function coverage (SURVEY.md section 2.5: string / date / math /
array) exercised as oracle-checked queries.

All JVM-side built-ins inside whole-stage codegen — the entire row path is
UDF-free.  Regex patterns stay within the portable subset (character
classes, +, *) so Java regex and RE2 agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.sources.tables import load_table


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substring/concat/trim/lpad/replace/regexp over part."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 4).alias("type_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.ltrim(F.rtrim("p_name")).alias("name_trim"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_type", "[aeiou]", "_").alias("type_devoweled"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_first_word"),
        F.col("p_name").contains("gold").alias("has_gold"),
        F.col("p_name").startswith("a").alias("starts_a"),
    )


STRING_SQL = """
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       LOWER(p_brand) AS brand_lower,
       SUBSTRING(p_type, 1, 4) AS type_prefix,
       CONCAT_WS('|', p_brand, p_type) AS brand_type,
       CAST(LENGTH(p_name) AS BIGINT) AS name_len,
       LTRIM(RTRIM(p_name)) AS name_trim,
       LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
       regexp_replace(p_type, '[aeiou]', '_', 'g') AS type_devoweled,
       string_split(p_type, ' ')[1] AS type_first_word,
       contains(p_name, 'gold') AS has_gold,
       starts_with(p_name, 'a') AS starts_a
FROM part
"""


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract/trunc/add/diff/last_day over orders dates."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        F.quarter("o_orderdate").cast("bigint").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate"), 30).cast("timestamp").alias("due_date"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate"))
        .cast("bigint")
        .alias("days_to_2002"),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


DATE_SQL = """
SELECT o_orderkey,
       EXTRACT(YEAR FROM o_orderdate) AS order_year,
       EXTRACT(MONTH FROM o_orderdate) AS order_month,
       EXTRACT(DAY FROM o_orderdate) AS order_day,
       EXTRACT(QUARTER FROM o_orderdate) AS order_quarter,
       DATE_TRUNC('month', o_orderdate) AS month_start,
       CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
       CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002,
       strftime(o_orderdate, '%Y-%m') AS year_month,
       CAST(EPOCH(o_orderdate) AS BIGINT) AS epoch_s
FROM orders
"""


def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/ceil/floor/round/sqrt/pmod/greatest/least/sign over customer
    balances.  sqrt is IEEE-exact; ln/exp are platform-libm and excluded
    from the oracle surface.

    Every float output carries an explicit cast to DOUBLE plus a ``+ 0.0``
    normalization (IEEE: ``-0.0 + 0.0 == +0.0`` in both engines) so the
    hashed representation survives fixture numeric-type drift (the driver
    regenerates testdata between rounds) and negative-zero outputs.
    """
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal").cast("double")
    return c.select(
        "c_custkey",
        (F.abs(bal).cast("double") + F.lit(0.0)).alias("bal_abs"),
        F.ceil(bal).cast("bigint").alias("bal_ceil"),
        F.floor(bal).cast("bigint").alias("bal_floor"),
        (F.round(bal, 1).cast("double") + F.lit(0.0)).alias("bal_round1"),
        (F.sqrt(F.abs(bal)).cast("double") + F.lit(0.0)).alias("bal_sqrt"),
        F.pmod(F.col("c_custkey"), F.lit(7)).cast("bigint").alias("key_mod7"),
        (F.greatest(bal, F.lit(0.0)).cast("double") + F.lit(0.0)).alias("bal_pos"),
        (F.least(bal, F.lit(1000.0)).cast("double") + F.lit(0.0)).alias("bal_capped"),
        (F.signum(bal).cast("double") + F.lit(0.0)).alias("bal_sign"),
        ((bal * bal).cast("double") + F.lit(0.0)).alias("bal_sq"),
    )


MATH_SQL = """
SELECT c_custkey,
       CAST(ABS(CAST(c_acctbal AS DOUBLE)) AS DOUBLE) + 0.0 AS bal_abs,
       CAST(CEIL(CAST(c_acctbal AS DOUBLE)) AS BIGINT) AS bal_ceil,
       CAST(FLOOR(CAST(c_acctbal AS DOUBLE)) AS BIGINT) AS bal_floor,
       CAST(ROUND(CAST(c_acctbal AS DOUBLE), 1) AS DOUBLE) + 0.0 AS bal_round1,
       CAST(SQRT(ABS(CAST(c_acctbal AS DOUBLE))) AS DOUBLE) + 0.0 AS bal_sqrt,
       CAST(c_custkey % 7 AS BIGINT) AS key_mod7,
       CAST(GREATEST(CAST(c_acctbal AS DOUBLE), 0.0) AS DOUBLE) + 0.0 AS bal_pos,
       CAST(LEAST(CAST(c_acctbal AS DOUBLE), 1000.0) AS DOUBLE) + 0.0 AS bal_capped,
       CAST(SIGN(CAST(c_acctbal AS DOUBLE)) AS DOUBLE) + 0.0 AS bal_sign,
       CAST(CAST(c_acctbal AS DOUBLE) * CAST(c_acctbal AS DOUBLE) AS DOUBLE) + 0.0 AS bal_sq
FROM customer
"""


def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/min/max/slice/sort over embedding vectors.
    Comparisons only (no float accumulation) so both engines agree exactly;
    arithmetic reductions live in llm_ops.similarity."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.element_at("embedding", -1).cast("double").alias("last_val"),
        F.array_max("embedding").cast("double").alias("max_val"),
        F.array_min("embedding").cast("double").alias("min_val"),
        F.element_at(F.array_sort("embedding"), 2).cast("double").alias("second_smallest"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("bigint").alias("n_positive"),
    )


ARRAY_SQL = """
SELECT vec_id,
       CAST(LEN(embedding) AS BIGINT) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_val,
       CAST(embedding[-1] AS DOUBLE) AS last_val,
       CAST(list_max(embedding) AS DOUBLE) AS max_val,
       CAST(list_min(embedding) AS DOUBLE) AS min_val,
       CAST(list_sort(embedding)[2] AS DOUBLE) AS second_smallest,
       CAST(LEN(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
FROM embeddings
"""


def conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/WHEN, coalesce, nullif, null-safe equality over orders."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("pending")).alias("status_or_pending"),
        (F.col("o_orderstatus") == "F").cast("boolean").alias("is_finished"),
        F.col("o_orderpriority").eqNullSafe(F.lit("1-URGENT")).alias("is_urgent_nullsafe"),
    )


CONDITIONAL_SQL = """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS price_band,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status_or_pending,
       o_orderstatus = 'F' AS is_finished,
       o_orderpriority IS NOT DISTINCT FROM '1-URGENT' AS is_urgent_nullsafe
FROM orders
"""


def map_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction/extraction + JSON document building."""
    p = load_table(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return p.select(
        "p_partkey",
        F.size(m).cast("bigint").alias("m_size"),
        F.element_at(m, "brand").alias("brand_from_map"),
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("m_keys"),
        F.to_json(F.struct(F.col("p_partkey").alias("k"), F.col("p_brand").alias("b"))).alias(
            "json_doc"
        ),
    )


MAP_JSON_SQL = """
SELECT p_partkey,
       CAST(cardinality(MAP(['brand','type'], [p_brand, p_type])) AS BIGINT) AS m_size,
       MAP(['brand','type'], [p_brand, p_type])['brand'][1] AS brand_from_map,
       array_to_string(list_sort(map_keys(MAP(['brand','type'], [p_brand, p_type]))), ',') AS m_keys,
       concat('{"k":', p_partkey, ',"b":"', p_brand, '"}') AS json_doc
FROM part
"""


def url_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL construction + parse_url round-trip: host/path/query-parameter
    extraction, the web-curation primitives (URL-keyed dedup and host-level
    quality policies both start here).  The URL is synthesized
    deterministically from the documents columns, so the oracle checks
    parse_url's output against the analytic construction.  All JVM-side
    codegen — no regex UDFs."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id").cast("string"),
        F.lit("?page="),
        (F.col("doc_id") % 7).cast("string"),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("page")).alias("page"),
        F.substring_index(F.parse_url(url, F.lit("HOST")), ".", 1).alias("site"),
    )


URL_SQL = """
SELECT doc_id,
       'https://' || source || '.example.com/' || lang || '/doc-' || doc_id
           || '?page=' || CAST(doc_id % 7 AS VARCHAR) AS url,
       source || '.example.com' AS host,
       '/' || lang || '/doc-' || doc_id AS path,
       CAST(doc_id % 7 AS VARCHAR) AS page,
       source AS site
FROM documents
"""


def variant_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type: parse_json -> variant_get path extraction with
    typed casts + schema_of_variant introspection — the semi-structured
    column story (Snowflake-VARIANT-style) over the events props JSON and
    a constructed nested document.  Variant decode is JVM-side binary-
    encoded JSON: no string re-parse per path at scale."""
    ev = load_table(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("event_type"),
            F.col("value"),
            F.array("user_id", "event_id").alias("ids"),
        )
    )
    v = F.parse_json(doc)
    return ev.select(
        "event_id",
        F.variant_get(F.parse_json("props"), "$.k", "bigint").alias("k"),
        F.variant_get(v, "$.event_type", "string").alias("etype"),
        F.variant_get(v, "$.value", "double").alias("val"),
        F.variant_get(v, "$.ids[0]", "bigint").alias("id0"),
        F.variant_get(v, "$.ids[1]", "bigint").alias("id1"),
        F.variant_get(v, "$.missing", "string").alias("missing"),
        F.schema_of_variant(F.parse_json("props")).alias("props_schema"),
    )


VARIANT_SQL = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       event_type AS etype,
       CAST(value AS DOUBLE) AS val,
       user_id AS id0,
       event_id AS id1,
       CAST(NULL AS VARCHAR) AS missing,
       'OBJECT<k: BIGINT>' AS props_schema
FROM events
"""


def stringagg_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/STRING_AGG): per language, the
    sorted distinct sources joined into one csv — collect_set + array_sort
    + array_join keeps the result order-deterministic under any
    partitioning (a bare collect_list concat would not be)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.array_join(F.array_sort(F.collect_set("source")), ",").alias("sources_csv"),
        F.countDistinct("source").alias("n_sources"),
    )


STRINGAGG_SQL = """
SELECT lang,
       string_agg(DISTINCT source, ',' ORDER BY source) AS sources_csv,
       COUNT(DISTINCT source) AS n_sources
FROM documents GROUP BY lang
"""




def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics suite — the cross-engine traps pinned explicitly:
    count(*) vs count(col), aggregates skipping nulls, null-safe
    equality (<=> / IS NOT DISTINCT FROM), COALESCE/NULLIF, and
    null-aware conditionals.  The nullable column is synthesized with
    NULLIF so the scenario is closed-form.  (Null SORT placement also
    differs between engines — Spark ASC default is NULLS FIRST, DuckDB's
    is NULLS LAST — which is why every ordered query in this repo either
    orders on non-null keys or pins the placement explicitly.)"""
    o = load_table(spark, sf_dir, "orders")
    v = F.nullif(F.col("o_orderstatus"), F.lit("P"))  # NULL for 'P' rows
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(v).alias("n_nonnull"),
        F.countDistinct(v).alias("n_distinct_nonnull"),
        F.sum(F.when(v.isNull(), 1).otherwise(0)).cast("bigint").alias("n_null"),
        F.sum(F.when(v.eqNullSafe(F.lit("O")), 1).otherwise(0))
        .cast("bigint")
        .alias("n_nullsafe_eq_o"),
        F.sum(F.when(v.eqNullSafe(F.lit(None).cast("string")), 1).otherwise(0))
        .cast("bigint")
        .alias("n_nullsafe_eq_null"),
        F.count(F.coalesce(v, F.lit("P"))).alias("n_coalesced"),
        F.min(v).alias("min_nonnull"),
    )


NULLS_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_rows,
       COUNT(NULLIF(o_orderstatus, 'P')) AS n_nonnull,
       COUNT(DISTINCT NULLIF(o_orderstatus, 'P')) AS n_distinct_nonnull,
       CAST(SUM(CASE WHEN NULLIF(o_orderstatus, 'P') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(SUM(CASE WHEN NULLIF(o_orderstatus, 'P') IS NOT DISTINCT FROM 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq_o,
       CAST(SUM(CASE WHEN NULLIF(o_orderstatus, 'P') IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq_null,
       COUNT(COALESCE(NULLIF(o_orderstatus, 'P'), 'P')) AS n_coalesced,
       MIN(NULLIF(o_orderstatus, 'P')) AS min_nonnull
FROM orders GROUP BY o_orderpriority
"""


def bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise surface: per-row shifts/masks/popcount plus the bit_and /
    bit_or / bit_xor AGGREGATES per order status — flag-mask analytics
    (feature bitmaps, permission masks) without UDFs.  All integer ops:
    engine-exact by construction."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    per_row = o.select(
        "o_orderstatus",
        k.bitwiseAND(F.lit(0xFF)).alias("low_byte"),
        F.shiftrightunsigned(k, 8).bitwiseAND(F.lit(0xFF)).alias("mid_byte"),
        F.bit_count(k).alias("popcount"),
        k.bitwiseXOR(F.shiftleft(F.col("o_custkey"), 1)).alias("mix"),
    )
    return per_row.groupBy("o_orderstatus").agg(
        F.bit_and("low_byte").cast("bigint").alias("and_low"),
        F.bit_or("low_byte").cast("bigint").alias("or_low"),
        F.bit_xor("mix").cast("bigint").alias("xor_mix"),
        F.sum("popcount").cast("bigint").alias("sum_popcount"),
        F.max("mid_byte").cast("bigint").alias("max_mid"),
    )


BITWISE_SQL = """
WITH per_row AS (
  SELECT o_orderstatus,
         o_orderkey & 255 AS low_byte,
         (o_orderkey >> 8) & 255 AS mid_byte,
         bit_count(o_orderkey) AS popcount,
         xor(o_orderkey, o_custkey << 1) AS mix
  FROM orders
)
SELECT o_orderstatus,
       CAST(BIT_AND(low_byte) AS BIGINT) AS and_low,
       CAST(BIT_OR(low_byte) AS BIGINT) AS or_low,
       CAST(BIT_XOR(mix) AS BIGINT) AS xor_mix,
       CAST(SUM(popcount) AS BIGINT) AS sum_popcount,
       CAST(MAX(mid_byte) AS BIGINT) AS max_mid
FROM per_row GROUP BY 1
"""


QUERIES = {
    "fn_string": string_functions,
    "fn_url": url_functions,
    "fn_variant": variant_functions,
    "fn_stringagg": stringagg_functions,
    "fn_map_json": map_json_functions,
    "fn_date": date_functions,
    "fn_math": math_functions,
    "fn_array": array_functions,
    "fn_conditional": conditional_functions,
    "fn_nulls": null_semantics,
    "fn_bitwise": bitwise_functions,
}

ORACLE = {
    "fn_string": STRING_SQL,
    "fn_url": URL_SQL,
    "fn_variant": VARIANT_SQL,
    "fn_stringagg": STRINGAGG_SQL,
    "fn_map_json": MAP_JSON_SQL,
    "fn_date": DATE_SQL,
    "fn_math": MATH_SQL,
    "fn_array": ARRAY_SQL,
    "fn_conditional": CONDITIONAL_SQL,
    "fn_nulls": NULLS_SQL,
    "fn_bitwise": BITWISE_SQL,
}
