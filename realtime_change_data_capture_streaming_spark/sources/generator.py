"""Deterministic synthetic sources (operator S4).

The reference generates one fake transaction per call with ``Faker``
(``/root/reference/main.py:9-25``).  The Spark-native equivalent is
``spark.range(n)`` plus pure column expressions: every value is a
deterministic function of ``(seed, id)`` via ``xxhash64``, so the same
(seed, n) always yields the same rows on any partitioning, any cluster —
unlike ``F.rand()``, whose output depends on partition layout.

At scale this generates data distributed (no driver-side loop): 10^9 rows
is ``spark.range(0, 10**9, numPartitions=…)`` and the expressions run in
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.schemas import AMOUNT_TYPE

_CURRENCIES = ("EUR", "USD")  # main.py:17
_PAYMENT_METHODS = ("credit_card", "debit_card", "online_transfer")  # main.py:21
_VOUCHERS = ("", "DISCOUNT10", "")  # 2/3 empty string, deliberately not null (main.py:23)


def _h(seed: int, salt: str) -> Column:
    """Uniform int64 derived from (seed, salt, id)."""
    return F.xxhash64(F.lit(seed), F.lit(salt), F.col("id"))


def _uniform01(seed: int, salt: str) -> Column:
    """Uniform double in [0, 1) derived from the hash."""
    return (F.pmod(_h(seed, salt), F.lit(1 << 40))).cast("double") / float(1 << 40)


def _pick(seed: int, salt: str, choices: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(c) for c in choices])
    return F.element_at(arr, (F.pmod(_h(seed, salt), F.lit(len(choices))) + 1).cast("int"))


def _fake_uuid(seed: int, salt: str) -> Column:
    """Deterministic uuid-shaped string from two hashes."""
    hx = F.lower(F.hex(_h(seed, salt)))
    hy = F.lower(F.hex(_h(seed, salt + "2")))
    h = F.lpad(F.concat(hx, hy), 32, "0")
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def synthetic_transactions(spark: SparkSession, n: int, seed: int = 42, num_partitions: int | None = None) -> DataFrame:
    """n deterministic fake transactions matching TRANSACTIONS_SCHEMA domains."""
    df = spark.range(0, n, numPartitions=num_partitions) if num_partitions else spark.range(n)
    base_ts = F.lit("2026-01-01 00:00:00").cast("timestamp")
    return df.select(
        _fake_uuid(seed, "txid").alias("transaction_id"),
        F.concat(F.lit("user_"), F.pmod(_h(seed, "user"), F.lit(1000)).cast("string")).alias("user_id"),
        (base_ts + F.make_interval(secs=F.col("id").cast("double"))).alias("timestamp"),
        F.round(_uniform01(seed, "amount") * 990.0 + 10.0, 2).cast(AMOUNT_TYPE).alias("amount"),
        _pick(seed, "cur", _CURRENCIES).alias("currency"),
        F.concat(F.lit("city_"), F.pmod(_h(seed, "city"), F.lit(500)).cast("string")).alias("city"),
        F.concat(F.lit("country_"), F.pmod(_h(seed, "ctry"), F.lit(60)).cast("string")).alias("country"),
        F.concat(F.lit("merchant_"), F.pmod(_h(seed, "mrch"), F.lit(300)).cast("string")).alias("merchant_name"),
        _pick(seed, "pay", _PAYMENT_METHODS).alias("payment_method"),
        F.concat_ws(
            ".",
            F.pmod(_h(seed, "ip1"), F.lit(256)).cast("string"),
            F.pmod(_h(seed, "ip2"), F.lit(256)).cast("string"),
            F.pmod(_h(seed, "ip3"), F.lit(256)).cast("string"),
            F.pmod(_h(seed, "ip4"), F.lit(256)).cast("string"),
        ).alias("ip_address"),
        _pick(seed, "vch", _VOUCHERS).alias("voucher_code"),
        _fake_uuid(seed, "aff").alias("affiliate_id"),
    )


def synthetic_transactions_stream(spark: SparkSession, rows_per_second: int = 1000, seed: int = 42) -> DataFrame:
    """Streaming variant of S4: the rate source drives event generation
    (the principled version of the reference's sleep(0.5) pacing loop,
    ``transaction_producer.py:41-54``).  Same deterministic column
    derivations keyed off the rate source's ``value`` counter."""
    base = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
        .select(F.col("value").alias("id"), F.col("timestamp").alias("_arrival_ts"))
    )
    out = base.select(
        _fake_uuid(seed, "txid").alias("transaction_id"),
        F.concat(F.lit("user_"), F.pmod(_h(seed, "user"), F.lit(1000)).cast("string")).alias("user_id"),
        F.col("_arrival_ts").alias("timestamp"),
        F.round(_uniform01(seed, "amount") * 990.0 + 10.0, 2).cast(AMOUNT_TYPE).alias("amount"),
        _pick(seed, "cur", _CURRENCIES).alias("currency"),
        _pick(seed, "pay", _PAYMENT_METHODS).alias("payment_method"),
        _pick(seed, "vch", _VOUCHERS).alias("voucher_code"),
    )
    return out


def synthetic_change_events(
    spark: SparkSession,
    n_keys: int,
    updates_per_key: int = 2,
    delete_every: int = 97,
    seed: int = 42,
    decimal_mode: str = "string",
) -> DataFrame:
    """Debezium-shaped change events over n_keys synthetic transactions.

    Emits, per key: one ``c`` (insert), ``updates_per_key`` ``u`` events
    (amount bumped deterministically, full before image — REPLICA IDENTITY
    FULL, ``/root/reference/README.md:170-174``), and a trailing ``d`` for
    every ``delete_every``-th key.  ``source.lsn`` is a global total order;
    within-key order is strictly increasing, as Postgres WAL guarantees.

    Returns the *envelope as JSON strings* in a ``value`` column plus a
    ``key`` column — the exact Kafka wire shape
    (``/root/reference/transaction_producer.py:44-48``).
    """
    from realtime_change_data_capture_streaming_spark.cdc.encode import encode_amount

    base = synthetic_transactions(spark, n_keys, seed=seed)
    # versions 0..updates_per_key (+1 delete row where selected)
    versions = spark.range(updates_per_key + 1).select(F.col("id").alias("_v"))
    rows = base.crossJoin(F.broadcast(versions))
    amount_v = F.round(
        F.col("amount").cast("double") * (1.0 + F.col("_v").cast("double") * 0.1), 2
    ).cast(AMOUNT_TYPE)
    prev_amount = F.round(
        F.col("amount").cast("double") * (1.0 + (F.col("_v") - 1).cast("double") * 0.1), 2
    ).cast(AMOUNT_TYPE)

    def image(amount_col):
        cols = []
        for name in (
            "transaction_id user_id timestamp amount currency city country "
            "merchant_name payment_method ip_address voucher_code affiliate_id"
        ).split():
            if name == "amount":
                cols.append(encode_amount(amount_col, decimal_mode).alias("amount"))
            elif name == "timestamp":
                cols.append(F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss").alias("timestamp"))
            else:
                cols.append(F.col(name))
        return F.struct(*cols)

    key_ord = F.xxhash64(F.lit(seed), F.lit("ord"), F.col("transaction_id"))
    lsn = F.pmod(key_ord, F.lit(10**9)) * (updates_per_key + 2) + F.col("_v")
    events = rows.select(
        F.col("transaction_id").alias("key"),
        F.when(F.col("_v") > 0, image(prev_amount)).alias("before"),
        image(amount_v).alias("after"),
        F.when(F.col("_v") == 0, F.lit("c")).otherwise(F.lit("u")).alias("op"),
        (F.unix_timestamp("timestamp") * 1000 + F.col("_v")).alias("ts_ms"),
        F.struct(
            lsn.alias("lsn"),
            F.lit("transactions").alias("table"),
            F.lit("financialDB").alias("db"),
        ).alias("source"),
    )
    if delete_every:
        last = rows.filter(F.col("_v") == updates_per_key).filter(
            F.pmod(F.abs(F.xxhash64(F.lit(seed), F.lit("del"), F.col("transaction_id"))), F.lit(delete_every)) == 0
        )
        deletes = last.select(
            F.col("transaction_id").alias("key"),
            image(amount_v).alias("before"),
            F.when(F.lit(False), image(amount_v)).alias("after"),
            F.lit("d").alias("op"),
            (F.unix_timestamp("timestamp") * 1000 + updates_per_key + 1).alias("ts_ms"),
            F.struct(
                (lsn + 1).alias("lsn"),
                F.lit("transactions").alias("table"),
                F.lit("financialDB").alias("db"),
            ).alias("source"),
        )
        events = events.unionByName(deletes)
    return events.select(
        "key",
        F.to_json(F.struct("before", "after", "op", "ts_ms", "source")).alias("value"),
    )
