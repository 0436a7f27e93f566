"""Confluent Schema Registry wire format for Debezium envelopes.

Production Debezium deployments overwhelmingly serialize envelopes as
Avro behind Confluent Schema Registry, not JSON: every Kafka message is
framed as ``0x00`` (magic) + 4-byte big-endian schema id + Avro binary
(the published Confluent wire format).  The reference pipeline uses
JSON (`transaction_producer.py:44-48`); this module adds the Avro wire
alternative on top of the dependency-free codec in
``sources/avro_ocf.py``.

Design: decode the Avro record, then re-emit the CANONICAL JSON
envelope string and hand it to the existing
:func:`~realtime_change_data_capture_streaming_spark.cdc.decode.parse_envelope` — one
parser, two wire formats; nothing downstream (decimal modes, dedup,
merge, dead-letter) forks.  The ``amount`` travels as Avro's decimal
logical type (bytes holding the two's-complement unscaled value — the
shape Debezium's precise mode produces under Avro) and is re-emitted in
the JSON "string" decimal mode.

Scale shape: the adapter is a mapInPandas pass — per-row byte decode,
embarrassingly parallel, no shuffle.  Un-decodable frames (bad magic,
unregistered schema id, torn payload) are emitted as non-JSON marker
strings so ``parse_envelope(keep_corrupt=True)`` routes them to the
dead-letter path instead of silently dropping them.
"""

from __future__ import annotations

import json
from decimal import Decimal
from typing import Iterator

from pyspark.sql import DataFrame

from realtime_change_data_capture_streaming_spark.sources.avro_ocf import (
    decode_resolved,
    decode_value,
    encode_value,
)

_STR_FIELDS = (
    "currency",
    "city",
    "country",
    "merchant_name",
    "payment_method",
    "ip_address",
    "voucher_code",
    "affiliate_id",
)


def _image_schema(name: str) -> dict:
    # every nullable field declares "default": null (matching the FIRST
    # union branch, per spec), so this schema can serve as the READER in
    # schema resolution: a v1 frame missing a later-added column decodes
    # with that column null — the ALTER TABLE evolution story
    fields = [
        {"name": "transaction_id", "type": ["null", "string"], "default": None},
        {"name": "user_id", "type": ["null", "string"], "default": None},
        {
            "name": "timestamp",
            "type": ["null", {"type": "long", "logicalType": "timestamp-micros"}],
            "default": None,
        },
        {
            "name": "amount",
            "type": [
                "null",
                {"type": "bytes", "logicalType": "decimal", "precision": 18, "scale": 2},
            ],
            "default": None,
        },
    ] + [{"name": n, "type": ["null", "string"], "default": None} for n in _STR_FIELDS]
    return {"type": "record", "name": name, "fields": fields}


#: The Debezium envelope as an Avro schema (before/after records get
#: distinct names — the spec forbids redefining a named type).
ENVELOPE_AVRO_SCHEMA = {
    "type": "record",
    "name": "envelope",
    "fields": [
        {"name": "before", "type": ["null", _image_schema("before_image")]},
        {"name": "after", "type": ["null", _image_schema("after_image")]},
        {"name": "op", "type": "string"},
        {"name": "ts_ms", "type": "long"},
        {
            "name": "source",
            "type": {
                "type": "record",
                "name": "source",
                "fields": [
                    {"name": "lsn", "type": "long"},
                    {"name": "table", "type": "string"},
                    {"name": "db", "type": "string"},
                ],
            },
        },
    ],
}

_MAGIC = 0
_CORRUPT_PREFIX = "\x00confluent-decode-error:"


def encode_confluent(record: dict, schema: dict, schema_id: int) -> bytes:
    """Frame one Avro record in the Confluent wire format."""
    return bytes([_MAGIC]) + schema_id.to_bytes(4, "big") + encode_value(schema, record)


def decode_confluent(
    buf: bytes, registry: dict, reader_schema: dict | None = None
) -> tuple[int, dict]:
    """Unframe + decode; ``registry`` maps schema id -> WRITER schema.
    With ``reader_schema``, each frame decodes through the Avro spec's
    Schema Resolution rules (``avro_ocf.decode_resolved``) — the
    schema-registry EVOLUTION path: a topic that mixes v1 and v2 ids
    after an ALTER resolves to ONE canonical record shape, reader-added
    fields taking their declared defaults and writer-only fields being
    discarded.  Raises ValueError on bad magic, unknown id, or a torn
    payload."""
    if not buf or buf[0] != _MAGIC:
        raise ValueError(f"confluent: bad magic byte {buf[:1]!r}")
    if len(buf) < 5:
        raise ValueError("confluent: truncated frame header")
    sid = int.from_bytes(buf[1:5], "big")
    if sid not in registry:
        raise ValueError(f"confluent: unregistered schema id {sid}")
    schema = registry[sid]
    if reader_schema is not None:
        rec, pos = decode_resolved(schema, reader_schema, buf, 5)
    else:
        rec, pos = decode_value(schema, buf, 5)
    if pos != len(buf):
        raise ValueError("confluent: trailing bytes after record")
    return sid, rec


def _image_to_json(img: dict | None):
    if img is None:
        return None
    out = dict(img)
    ts = out.get("timestamp")
    if ts is not None:
        # keep the micros timestamp-micros carries (the JSON parser
        # accepts fractional seconds); whole seconds stay in the
        # fixture-canonical short form
        frac = f".{ts.microsecond:06d}" if ts.microsecond else ""
        out["timestamp"] = ts.strftime("%Y-%m-%d %H:%M:%S") + frac
    amt = out.get("amount")
    if amt is not None:
        # JSON "string" decimal mode: the scale-2 Decimal prints exactly
        out["amount"] = str(amt)
    return out


def avro_envelopes_to_json(
    df: DataFrame,
    registry: dict | None = None,
    value_col: str = "value",
    reader_schema: dict | None = None,
) -> DataFrame:
    """(key binary, value binary) Confluent-framed Avro envelopes ->
    (key string, value string) canonical JSON envelopes, ready for
    ``parse_envelope``.  With ``reader_schema``, every frame's writer
    schema (looked up by id) resolves to that one canonical shape —
    mixed v1/v2 topics after an ALTER decode to a single schema
    (pinned == the all-v2 JSON path in tests/test_avro_envelope.py).
    Frames that fail to decode become non-JSON marker strings (magic
    NUL prefix + reason + hex head) so the dead-letter path sees
    them."""
    import pandas as pd

    registry = registry if registry is not None else {1: ENVELOPE_AVRO_SCHEMA}

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if pdf.empty:
                continue
            keys, values = [], []
            for key, buf in zip(pdf["key"], pdf[value_col]):
                keys.append(
                    key.decode("utf-8", "replace") if isinstance(key, (bytes, bytearray)) else key
                )
                if buf is None:
                    values.append(None)  # Kafka tombstone: pass through
                    continue
                try:
                    _, rec = decode_confluent(bytes(buf), registry, reader_schema)
                    values.append(
                        json.dumps(
                            {
                                "before": _image_to_json(rec["before"]),
                                "after": _image_to_json(rec["after"]),
                                "op": rec["op"],
                                "ts_ms": rec["ts_ms"],
                                "source": rec["source"],
                            },
                            separators=(",", ":"),
                        )
                    )
                except Exception as e:  # noqa: BLE001 — dead-letter contract:
                    # NO byte pattern may crash the task; torn payloads can
                    # surface as more than ValueError through arbitrary
                    # registry schemas (KeyError/struct.error/...)
                    values.append(_CORRUPT_PREFIX + f"{e}:" + bytes(buf)[:16].hex())
            yield pd.DataFrame({"key": keys, "value": values})

    return df.mapInPandas(run, schema="key string, value string")
