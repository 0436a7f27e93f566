"""Parse Debezium-style change-event JSON into typed rows.

Covers the three ``decimal.handling.mode`` wire shapes
(``/root/reference/README.md:342-347``) and stringly-typed
timestamps/decimals produced by ``json.dumps(tx, default=str)``
(``/root/reference/transaction_producer.py:46-47``).

Everything here is pure column expressions — the parse runs inside
whole-stage codegen on the JVM; no Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.schemas import (
    AMOUNT_TYPE,
    TRANSACTIONS_SCHEMA,
    envelope_schema,
)

_TWO_POW_64 = "18446744073709551616"  # 2^64 as decimal literal


def _precise_to_decimal(wire: Column) -> Column:
    """Debezium precise mode: base64 big-endian two's-complement + scale.

    Decode path: unbase64 -> hex -> unsigned conv -> two's-complement sign
    fix (subtract 2^64 when the top bit of the sign-extended 8-byte value
    is set) -> unscaled / 10^scale.  Handles negative values correctly
    (``/root/reference/README.md:270-274`` shows only positives, but the
    wire format is signed).
    """
    hexs = F.lower(F.hex(F.unbase64(wire.getField("value"))))
    negative = F.substring(hexs, 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f")
    padded = F.lpad(hexs, 16, F.when(negative, F.lit("f")).otherwise(F.lit("0")))
    unsigned = F.conv(padded, 16, 10).cast("decimal(38,0)")
    unscaled = F.when(negative, unsigned - F.expr(f"cast({_TWO_POW_64} as decimal(38,0))")).otherwise(
        unsigned
    )
    # 10^scale as decimal; scale is tiny (0..9) so this is exact
    pow10 = F.pow(F.lit(10.0), wire.getField("scale")).cast("decimal(38,9)")
    decoded = (unscaled.cast("decimal(38,9)") / pow10).cast(AMOUNT_TYPE)
    # width guard: the sign-extension above covers 8 wire bytes (plenty for
    # DECIMAL(18,2): 60 bits).  lpad would silently TRUNCATE a wider value
    # to its high-order hex digits — return NULL instead, so an upstream
    # type widening surfaces as missing data + dead-letter, never as a
    # wrong amount.
    return F.when(F.length(hexs) <= 16, decoded)


def decode_amount(wire: Column, decimal_mode: str) -> Column:
    """Wire-shape amount -> DecimalType(18,2), per mode (SURVEY.md 1.4.1)."""
    if decimal_mode == "precise":
        return _precise_to_decimal(wire)
    if decimal_mode == "string":
        return wire.try_cast(AMOUNT_TYPE)  # malformed -> null, not ANSI error
    if decimal_mode == "double":
        # documented precision caveat: double transit may lose ulps; round
        # to the declared scale on the way back in.
        return F.round(wire, 2).cast(AMOUNT_TYPE)
    raise ValueError(f"unknown decimal_mode {decimal_mode!r}")


def _decode_ts(wire: Column) -> Column:
    """Wire timestamp (string 'yyyy-MM-dd HH:mm:ss', ISO, or epoch seconds)
    -> TimestampType, UTC session zone."""
    return F.coalesce(
        F.try_to_timestamp(wire),
        F.timestamp_seconds(wire.try_cast("double")),
    )


def _decode_image(img: Column, decimal_mode: str) -> Column:
    """Typed row image from the wire image struct."""
    fields = []
    for name in (
        "transaction_id user_id timestamp amount currency city country "
        "merchant_name payment_method ip_address voucher_code affiliate_id"
    ).split():
        if name == "amount":
            fields.append(decode_amount(img.getField("amount"), decimal_mode).alias("amount"))
        elif name == "timestamp":
            fields.append(_decode_ts(img.getField("timestamp")).alias("timestamp"))
        else:
            fields.append(img.getField(name).alias(name))
    return F.when(img.isNull(), F.lit(None)).otherwise(F.struct(*fields))


#: image fields the fixed envelope schema knows; anything else on the wire
#: is a schema-evolution artifact (upstream ALTER TABLE ... ADD).
_KNOWN_IMAGE_FIELDS = tuple(f.name for f in TRANSACTIONS_SCHEMA.fields)


def _extras_map(raw: Column, image: str) -> Column:
    """Unknown fields of one wire image as a ``map<string,string>``.

    The reference's documented evolution flow is ``ALTER TABLE ... ADD``
    (``/root/reference/README.md:211``) after which Debezium envelopes carry
    the new column.  ``from_json`` against the fixed StructType silently
    drops unknown fields, so we parse the image subtree a second time as an
    untyped map and keep what the typed parse missed.  The map keeps the
    output schema STABLE under evolution: a new source column becomes a new
    map key, not a breaking schema change; promotion to a real typed column
    is a compaction-time decision.

    The ``map_filter`` lambda is an interpreted HOF (CodegenFallback) — fine
    here because it runs over ≤ a dozen entries per row on an opt-in path.
    """
    maps_schema = f"{image} map<string,string>"
    m = F.from_json(raw, maps_schema).getField(image)
    return F.when(
        m.isNotNull(),
        F.map_filter(m, lambda k, _v: ~k.isin(*_KNOWN_IMAGE_FIELDS)),
    )


#: LSN sentinel for synthesized tombstone deletes: beyond any real WAL
#: position, so latest-wins always lets the compaction marker win.
#:
#: CAVEAT: the sentinel assumes no post-delete re-insert of the same key is
#: present in the batch.  Kafka log compaction is eventual (the active
#: segment is never cleaned), so a compacted topic can carry BOTH a
#: tombstone and a LATER 'c' envelope for the same key — under the
#: sentinel, the delete would wrongly out-rank the newer insert.  When the
#: input carries Kafka's ``offset`` column, :func:`parse_envelope` therefore
#: also emits ``offset`` on every row (a Debezium tombstone immediately
#: follows its delete, and per-key records share a partition, so offset
#: order IS the true change order): run latest-wins with
#: ``order_cols=("offset",)`` to resolve compacted topics correctly.
TOMBSTONE_LSN = 1 << 62


def parse_envelope(
    df: DataFrame,
    decimal_mode: str = "string",
    value_col: str = "value",
    keep_corrupt: bool = False,
    capture_extras: bool = False,
    capture_txn: bool = False,
    kafka_tombstones: str = "drop",
) -> DataFrame:
    """Kafka-shaped ``value`` (JSON string/bytes) -> typed change rows.

    Output columns: ``key`` (string), ``op`` (c|u|d|r), ``ts_ms``, ``lsn``,
    ``before``/``after`` (typed structs, amount=DecimalType(18,2)).
    Malformed JSON yields null structs; set ``keep_corrupt`` to retain the
    raw payload in ``_corrupt`` for a dead-letter sink — log-and-skip is
    the reference behavior (``/root/reference/transaction_consumer.py:79-81``).

    ``capture_extras`` adds an ``_extra`` map column holding after-image
    fields the fixed schema does not know (see :func:`_extras_map`) so an
    upstream column add is never silently dropped.

    ``capture_txn`` adds ``txn_id`` (string) and ``txn_order`` (long) from
    the OPTIONAL top-level ``transaction`` block Debezium emits when
    ``provide.transaction.metadata`` is on — the handle a transactionally
    consistent consumer groups by before applying (see
    :func:`~realtime_change_data_capture_streaming_spark.cdc.queries.cdc_txn_consistent_apply`).
    Envelopes without the block yield nulls.

    ``kafka_tombstones`` decides what a NULL-value message means.  Debezium
    follows every delete envelope with a null-value record so Kafka log
    compaction can drop the key; these are neither corrupt nor ordinary
    events.  ``"drop"`` (default) discards them — correct when reading the
    uncompacted topic, where the op='d' envelope carries the delete.
    ``"delete"`` synthesizes an op='d' row at a sentinel LSN past any real
    WAL position — correct when bootstrapping from a COMPACTED topic,
    where compaction may have erased the 'd' envelope and the tombstone is
    the only surviving record of the deletion.

    In ``"delete"`` mode, if the input also carries Kafka's ``offset``
    column, it is passed through (as ``offset``, bigint) on every output
    row — real envelopes and synthesized deletes alike.  Downstream
    latest-wins should then use ``order_cols=("offset",)``: per-key records
    live in one partition and a tombstone immediately follows its delete
    envelope, so log position totally orders each key's history, including
    a re-insert AFTER the delete (which the sentinel LSN alone would
    wrongly lose — compaction is eventual and the active segment is never
    cleaned, so tombstone + later 'c' can coexist).
    """
    if kafka_tombstones not in ("drop", "delete"):
        raise ValueError(f"kafka_tombstones must be 'drop' or 'delete', got {kafka_tombstones!r}")
    schema = envelope_schema(decimal_mode)
    tombstones = df.filter(F.col(value_col).isNull()) if kafka_tombstones == "delete" else None
    passthrough_offset = kafka_tombstones == "delete" and "offset" in df.columns
    df = df.filter(F.col(value_col).isNotNull())
    raw = F.col(value_col).cast("string")
    parsed = df.withColumn("_env", F.from_json(raw, schema))
    env = F.col("_env")
    key = (
        F.col("key").cast("string")
        if "key" in df.columns
        else F.coalesce(
            env.getField("after").getField("transaction_id"),
            env.getField("before").getField("transaction_id"),
        )
    )
    out = parsed.select(
        key.alias("key"),
        env.getField("op").alias("op"),
        env.getField("ts_ms").alias("ts_ms"),
        env.getField("source").getField("lsn").alias("lsn"),
        _decode_image(env.getField("before"), decimal_mode).alias("before"),
        _decode_image(env.getField("after"), decimal_mode).alias("after"),
        *([F.col("offset").cast("long").alias("offset")] if passthrough_offset else []),
        *([_extras_map(raw, "after").alias("_extra")] if capture_extras else []),
        *(
            [
                F.get_json_object(raw, "$.transaction.id").alias("txn_id"),
                F.get_json_object(raw, "$.transaction.total_order")
                .cast("long")
                .alias("txn_order"),
            ]
            if capture_txn
            else []
        ),
        # from_json in PERMISSIVE mode yields an all-null row (not a null
        # struct) for malformed input — detect that shape.
        *(
            [
                F.when(
                    env.isNull()
                    | (
                        env.getField("op").isNull()
                        & env.getField("before").isNull()
                        & env.getField("after").isNull()
                    ),
                    raw,
                ).alias("_corrupt")
            ]
            if keep_corrupt
            else []
        ),
    )
    if tombstones is not None:
        if "key" not in tombstones.columns:
            raise ValueError("kafka_tombstones='delete' requires a 'key' column (tombstones have no payload)")
        synth = tombstones.select(
            F.col("key").cast("string").alias("key"),
            F.lit("d").alias("op"),
            F.lit(None).cast("long").alias("ts_ms"),
            F.lit(TOMBSTONE_LSN).alias("lsn"),
            *(
                [F.col("offset").cast("long").alias("offset")]
                if passthrough_offset
                else []
            ),
            *[
                F.lit(None).cast(out.schema[c].dataType).alias(c)
                for c in out.columns
                if c not in ("key", "op", "ts_ms", "lsn", "offset")
            ],
        )
        out = out.unionByName(synth.select(*out.columns))
    return out
