"""Canonical schemas for the CDC surface.

The reference declares the ``transactions`` schema twice (source DDL at
``/root/reference/main.py:31-46``; identical sink DDL at
``/root/reference/transaction_consumer.py:23-70``).  We declare it once as a
StructType and derive everything else (Debezium envelope, audit extension)
from it — the streaming path never relies on schema inference
(SURVEY.md section 1.2).

Decimal modes: Debezium's ``decimal.handling.mode`` changes the JSON shape
of DECIMAL columns (``/root/reference/README.md:342-347``):

- ``precise`` — ``{"scale": 2, "value": "<base64 two's-complement>"}``
- ``string`` — ``"459.38"``
- ``double`` — ``459.38``

The envelope schema for a given mode swaps the ``amount`` field type so
``from_json`` parses strictly; the decode back to ``DecimalType(18,2)``
lives in :mod:`realtime_change_data_capture_streaming_spark.cdc`.
"""

from __future__ import annotations

from pyspark.sql import types as T

DECIMAL_MODES = ("precise", "string", "double")

#: amount as it lands after decoding, whatever the wire mode was.
AMOUNT_TYPE = T.DecimalType(18, 2)

_TRANSACTION_FIELDS: list[tuple[str, T.DataType]] = [
    ("transaction_id", T.StringType()),  # uuid; primary/dedup key
    ("user_id", T.StringType()),
    ("timestamp", T.TimestampType()),
    ("amount", AMOUNT_TYPE),
    ("currency", T.StringType()),
    ("city", T.StringType()),
    ("country", T.StringType()),
    ("merchant_name", T.StringType()),
    ("payment_method", T.StringType()),
    ("ip_address", T.StringType()),
    ("voucher_code", T.StringType()),  # "" with 2/3 prob — empty string, NOT null
    ("affiliate_id", T.StringType()),
]

#: Canonical decoded row schema (source and sink are intentionally identical).
TRANSACTIONS_SCHEMA = T.StructType(
    [T.StructField(name, dtype, True) for name, dtype in _TRANSACTION_FIELDS]
)

#: Audit extension columns added by the README trigger SQL
#: (``/root/reference/README.md:190-192,211``).
AUDIT_FIELDS = [
    T.StructField("modified_by", T.StringType(), True),
    T.StructField("modified_at", T.TimestampType(), True),
    T.StructField("change_info", T.StringType(), True),  # JSON document
]

TRANSACTIONS_AUDIT_SCHEMA = T.StructType(list(TRANSACTIONS_SCHEMA.fields) + AUDIT_FIELDS)

#: Debezium precise-mode decimal wire shape.
PRECISE_DECIMAL_WIRE = T.StructType(
    [
        T.StructField("scale", T.IntegerType(), True),
        T.StructField("value", T.StringType(), True),  # base64 two's-complement bytes
    ]
)


def _row_image_schema(decimal_mode: str) -> T.StructType:
    """Row image (``before``/``after``) schema as it appears on the wire.

    Timestamps cross the JSON boundary as strings (the producer does
    ``json.dumps(tx, default=str)`` — ``/root/reference/transaction_producer.py:47``)
    or as epoch micros in Debezium; we accept a string column and re-coerce
    during decode so both work.
    """
    if decimal_mode not in DECIMAL_MODES:
        raise ValueError(f"decimal_mode must be one of {DECIMAL_MODES}, got {decimal_mode!r}")
    amount_wire: T.DataType
    if decimal_mode == "precise":
        amount_wire = PRECISE_DECIMAL_WIRE
    elif decimal_mode == "string":
        amount_wire = T.StringType()
    else:
        amount_wire = T.DoubleType()
    fields = []
    for name, dtype in _TRANSACTION_FIELDS:
        if name == "amount":
            fields.append(T.StructField(name, amount_wire, True))
        elif name == "timestamp":
            fields.append(T.StructField(name, T.StringType(), True))
        else:
            fields.append(T.StructField(name, dtype, True))
    return T.StructType(fields)


def envelope_schema(decimal_mode: str = "string") -> T.StructType:
    """Debezium-style change-event envelope (FIXTURES.md A2).

    ``before`` carries the full prior image because the reference sets
    ``REPLICA IDENTITY FULL`` (``/root/reference/README.md:170-174``);
    ``op`` is c|u|d|r; ``source.lsn`` gives the within-key total order.
    """
    image = _row_image_schema(decimal_mode)
    return T.StructType(
        [
            T.StructField("before", image, True),  # null for op='c'
            T.StructField("after", image, True),  # null for op='d'
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("lsn", T.LongType(), True),
                        T.StructField("table", T.StringType(), True),
                        T.StructField("db", T.StringType(), True),
                    ]
                ),
                True,
            ),
        ]
    )
