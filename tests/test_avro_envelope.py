"""Pins for the Confluent-framed Avro envelope wire format: frame
round-trip, JSON-path equivalence through the SHARED parser and merge,
and dead-lettering of undecodable frames."""

from __future__ import annotations

import datetime
import json
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.cdc.avro_envelope import (
    ENVELOPE_AVRO_SCHEMA,
    avro_envelopes_to_json,
    decode_confluent,
    encode_confluent,
)


def _image(k: int, amount: str):
    return {
        "transaction_id": str(k),
        "user_id": str(k % 17),
        # tz-aware instants (timestamp-micros is an instant); every 7th
        # image carries sub-second precision to pin the fractional path
        "timestamp": datetime.datetime(2024, 3, 1, 12, 0, 0, tzinfo=datetime.timezone.utc)
        + datetime.timedelta(minutes=k, microseconds=250_000 * (k % 7 == 0)),
        "amount": Decimal(amount),
        "currency": "USD",
        "city": "city",
        "country": "country",
        "merchant_name": f"m{k % 5}",
        "payment_method": "credit_card",
        "ip_address": "0.0.0.0",
        "voucher_code": "",
        "affiliate_id": str(k),
    }


def _events(n=120):
    """insert for every key, +10 update for %10, delete for %29 — the
    repo's standard change pattern, as Avro envelope records."""
    evs = []
    for k in range(n):
        base = _image(k, f"{100 + k}.25")
        evs.append((str(k), {"before": None, "after": base, "op": "c", "ts_ms": k * 10,
                             "source": {"lsn": k * 3, "table": "transactions", "db": "financialDB"}}))
        if k % 10 == 0:
            evs.append((str(k), {"before": base, "after": _image(k, f"{110 + k}.25"),
                                 "op": "u", "ts_ms": k * 10 + 1,
                                 "source": {"lsn": k * 3 + 1, "table": "transactions", "db": "financialDB"}}))
        if k % 29 == 0:
            evs.append((str(k), {"before": _image(k, f"{110 + k}.25"), "after": None,
                                 "op": "d", "ts_ms": k * 10 + 2,
                                 "source": {"lsn": k * 3 + 2, "table": "transactions", "db": "financialDB"}}))
    return evs


def test_confluent_frame_roundtrip():
    _, rec = _events(3)[1][1], _events(3)[0][1]
    buf = encode_confluent(rec, ENVELOPE_AVRO_SCHEMA, schema_id=7)
    sid, back = decode_confluent(buf, {7: ENVELOPE_AVRO_SCHEMA})
    assert sid == 7 and back == rec
    with pytest.raises(ValueError, match="bad magic"):
        decode_confluent(b"\x01" + buf[1:], {7: ENVELOPE_AVRO_SCHEMA})
    with pytest.raises(ValueError, match="unregistered schema id"):
        decode_confluent(buf, {8: ENVELOPE_AVRO_SCHEMA})
    with pytest.raises(ValueError, match="trailing bytes"):
        decode_confluent(buf + b"\x00", {7: ENVELOPE_AVRO_SCHEMA})


def test_avro_and_json_paths_agree_through_the_merge(spark):
    """The SAME change set encoded as Confluent-Avro and as JSON must
    produce the identical final table through the shared
    parse_envelope -> apply_changes_batch pipeline."""
    from realtime_change_data_capture_streaming_spark.cdc import apply_changes_batch, parse_envelope

    evs = _events()

    def to_json_value(rec):
        out = {
            "before": _jsonify(rec["before"]),
            "after": _jsonify(rec["after"]),
            "op": rec["op"],
            "ts_ms": rec["ts_ms"],
            "source": rec["source"],
        }
        return json.dumps(out, separators=(",", ":"))

    def _jsonify(img):
        if img is None:
            return None
        o = dict(img)
        ts = o["timestamp"]
        frac = f".{ts.microsecond:06d}" if ts.microsecond else ""
        o["timestamp"] = ts.strftime("%Y-%m-%d %H:%M:%S") + frac
        o["amount"] = str(o["amount"])
        return o

    json_df = spark.createDataFrame(
        [(k, to_json_value(r)) for k, r in evs], "key string, value string"
    )
    avro_df = spark.createDataFrame(
        [(k.encode(), encode_confluent(r, ENVELOPE_AVRO_SCHEMA, 1)) for k, r in evs],
        "key binary, value binary",
    )
    want = apply_changes_batch(parse_envelope(json_df, decimal_mode="string"))
    got = apply_changes_batch(
        parse_envelope(avro_envelopes_to_json(avro_df), decimal_mode="string")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() > 0


def test_undecodable_frames_reach_the_dead_letter_path(spark):
    """Bad magic / unknown schema id frames become non-JSON markers that
    parse_envelope(keep_corrupt=True) captures instead of dropping."""
    from realtime_change_data_capture_streaming_spark.cdc import parse_envelope

    k, rec = _events(2)[0]
    good = encode_confluent(rec, ENVELOPE_AVRO_SCHEMA, 1)
    bad_magic = b"\x01" + good[1:]
    unknown_id = b"\x00" + (99).to_bytes(4, "big") + good[5:]
    df = spark.createDataFrame(
        [(k.encode(), good), (b"x", bad_magic), (b"y", unknown_id)],
        "key binary, value binary",
    )
    parsed = parse_envelope(avro_envelopes_to_json(df), keep_corrupt=True)
    rows = parsed.collect()
    corrupt = [r for r in rows if r["_corrupt"] is not None]
    ok = [r for r in rows if r["op"] is not None]
    assert len(ok) == 1 and ok[0]["key"] == k
    assert len(corrupt) == 2
    assert all("confluent-decode-error" in r["_corrupt"] for r in corrupt)


def test_avro_stream_merges_like_json_batch(spark, tmp_path):
    """Confluent-Avro envelopes consumed as a REAL two-micro-batch file
    stream (foreachBatch adapter -> shared parser -> bucketed merge)
    produce the same final state as the JSON batch path."""
    from realtime_change_data_capture_streaming_spark.cdc import apply_changes_batch, parse_envelope
    from realtime_change_data_capture_streaming_spark.cdc.apply_changes import BucketedParquetSink
    from realtime_change_data_capture_streaming_spark.streaming.cdc_stream import (
        stage_ordered_batches,
    )

    evs = _events(90)
    rows = [(k.encode(), encode_confluent(r, ENVELOPE_AVRO_SCHEMA, 1)) for k, r in evs]
    half = len(rows) // 2
    df1 = spark.createDataFrame(rows[:half], "key binary, value binary")
    df2 = spark.createDataFrame(rows[half:], "key binary, value binary")
    in_dir = stage_ordered_batches([df1, df2], str(tmp_path / "staged"))
    sink = BucketedParquetSink(spark, str(tmp_path / "sink"), n_buckets=4)

    def merge(batch, _bid):
        sink.merge(parse_envelope(avro_envelopes_to_json(batch), decimal_mode="string"))

    q = (
        spark.readStream.schema("key binary, value binary")
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)

    json_rows = [
        (k, json.dumps({"before": _j(r["before"]), "after": _j(r["after"]),
                        "op": r["op"], "ts_ms": r["ts_ms"], "source": r["source"]},
                       separators=(",", ":")))
        for k, r in evs
    ]
    want = apply_changes_batch(
        parse_envelope(
            spark.createDataFrame(json_rows, "key string, value string"),
            decimal_mode="string",
        )
    )
    got = sink.read().select(*want.columns)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def _j(img):
    if img is None:
        return None
    o = dict(img)
    ts = o["timestamp"]
    frac = f".{ts.microsecond:06d}" if ts.microsecond else ""
    o["timestamp"] = ts.strftime("%Y-%m-%d %H:%M:%S") + frac
    o["amount"] = str(o["amount"])
    return o


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(payloads=st.lists(st.one_of(st.none(), st.binary(max_size=64)), min_size=1, max_size=8))
def test_adapter_never_crashes_on_arbitrary_bytes(spark, payloads):
    """The dead-letter contract, fuzzed: ANY byte string (or null
    tombstone) through the adapter yields either a JSON envelope, a
    corrupt marker, or a null passthrough — never a task crash."""
    df = spark.createDataFrame(
        [(b"k%d" % i, p) for i, p in enumerate(payloads)], "key binary, value binary"
    )
    rows = avro_envelopes_to_json(df).collect()
    assert len(rows) == len(payloads)
    for r, p in zip(sorted(rows, key=lambda r: r["key"]), payloads):
        v = r["value"]
        if p is None:
            assert v is None
        else:
            assert v is None or v.startswith("\x00confluent-decode-error") or v.startswith("{")


def test_mixed_schema_versions_resolve_to_canonical_reader(spark):
    """Schema-registry EVOLUTION (VERDICT r9 task 5): a topic mixing v1
    frames (written before two columns existed, source lacking db) and
    v2 frames, decoded with reader_schema = the canonical v2 envelope,
    must equal the all-canonical JSON path through
    parse_envelope -> apply_changes_batch — v1 rows with the added
    columns null, field order and dropped fields invisible."""
    import copy

    from realtime_change_data_capture_streaming_spark.cdc import apply_changes_batch, parse_envelope

    # v1: the envelope before an ALTER added voucher_code/affiliate_id
    # to the row images and db to source; also a legacy writer-only
    # field the v2 reader must discard; image fields REORDERED to prove
    # by-name matching
    v2 = ENVELOPE_AVRO_SCHEMA

    def v1_image(name):
        img = copy.deepcopy(
            next(f for f in v2["fields"] if f["name"] == "before")["type"][1]
        )
        img["name"] = name
        img["fields"] = [
            f for f in img["fields"] if f["name"] not in ("voucher_code", "affiliate_id")
        ]
        img["fields"].reverse()
        img["fields"].append({"name": "legacy_flag", "type": "string"})
        return img

    v1 = {
        "type": "record",
        "name": "envelope",
        "fields": [
            {"name": "before", "type": ["null", v1_image("before_image")], "default": None},
            {"name": "after", "type": ["null", v1_image("after_image")], "default": None},
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
                    ],
                },
            },
        ],
    }
    # v2's source.db has no default, so give the reader one for the test
    reader = copy.deepcopy(v2)
    src = next(f for f in reader["fields"] if f["name"] == "source")
    next(f for f in src["type"]["fields"] if f["name"] == "db")["default"] = "financialDB"

    evs = _events(80)

    def strip_v1(rec):
        out = copy.deepcopy(rec)
        for side in ("before", "after"):
            if out[side] is not None:
                out[side].pop("voucher_code")
                out[side].pop("affiliate_id")
                out[side]["legacy_flag"] = "v1"
        out["source"] = {k: v for k, v in rec["source"].items() if k != "db"}
        return out

    registry = {1: v1, 2: v2}
    frames = []
    for i, (k, rec) in enumerate(evs):
        if i % 2 == 0:
            frames.append((k.encode(), encode_confluent(strip_v1(rec), v1, 1)))
        else:
            frames.append((k.encode(), encode_confluent(rec, v2, 2)))
    mixed = spark.createDataFrame(frames, "key binary, value binary")

    # canonical truth: the SAME events all encoded v2, with the v1 rows'
    # added columns nulled (what resolution must produce)
    def canonicalize(i, rec):
        if i % 2 != 0:
            return rec
        out = copy.deepcopy(rec)
        for side in ("before", "after"):
            if out[side] is not None:
                out[side]["voucher_code"] = None
                out[side]["affiliate_id"] = None
        return out

    allv2 = spark.createDataFrame(
        [(k.encode(), encode_confluent(canonicalize(i, r), v2, 1)) for i, (k, r) in enumerate(evs)],
        "key binary, value binary",
    )
    got = apply_changes_batch(
        parse_envelope(
            avro_envelopes_to_json(mixed, registry, reader_schema=reader),
            decimal_mode="string",
        )
    )
    want = apply_changes_batch(
        parse_envelope(avro_envelopes_to_json(allv2), decimal_mode="string")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() > 0
