"""Decimal wire modes, envelope parse, encode/decode round-trip.

Covers SURVEY.md section 1.4: three decimal decode paths, stringly-typed
timestamps, empty-string-vs-null voucher codes.
"""

from __future__ import annotations

import json
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.cdc import decode_amount, encode_amount, parse_envelope
from realtime_change_data_capture_streaming_spark.schemas import DECIMAL_MODES
from realtime_change_data_capture_streaming_spark.sources import synthetic_change_events


@pytest.mark.parametrize("mode", DECIMAL_MODES)
def test_amount_roundtrip(spark, mode):
    vals = ["0.00", "0.01", "-0.01", "459.38", "-459.38", "123456789.99", "-123456789.99", "10.00", "999.99"]
    df = spark.createDataFrame([(v,) for v in vals], "raw string").select(
        F.col("raw").cast("decimal(18,2)").alias("amount")
    )
    out = df.select(
        F.col("amount"),
        decode_amount(encode_amount(F.col("amount"), mode), mode).alias("decoded"),
    ).collect()
    for row in out:
        assert row["decoded"] == row["amount"], (mode, row)


def test_precise_mode_known_vector(spark):
    # README.md:270-274: {"scale": 2, "value": "AAAB9A=="} == 5.00
    # base64 AAAB9A== = bytes 00 00 01 f4 = 500 unscaled, scale 2.
    df = spark.createDataFrame([(2, "AAAB9A==")], "scale int, value string")
    out = df.select(decode_amount(F.struct("scale", "value"), "precise").alias("a")).collect()
    assert out[0]["a"] == Decimal("5.00")


def test_precise_mode_width_guard(spark):
    """A wire value wider than the decoder's 8-byte window must surface as
    NULL (missing data, dead-letterable), never as a silently truncated
    wrong amount."""
    import base64

    # 9-byte two's-complement: 2^66 unscaled — exceeds the 8-byte window
    wide = base64.b64encode((1 << 66).to_bytes(9, "big", signed=True)).decode()
    ok = base64.b64encode((500).to_bytes(4, "big", signed=True)).decode()
    df = spark.createDataFrame([(2, wide), (2, ok)], "scale int, value string")
    out = df.select(decode_amount(F.struct("scale", "value"), "precise").alias("a")).collect()
    assert out[0]["a"] is None
    assert out[1]["a"] == Decimal("5.00")


@pytest.mark.parametrize("mode", DECIMAL_MODES)
def test_parse_envelope_modes(spark, mode):
    events = synthetic_change_events(spark, 50, updates_per_key=2, decimal_mode=mode)
    parsed = parse_envelope(events, decimal_mode=mode)
    rows = parsed.collect()
    assert len(rows) > 100  # 50 keys * 3 versions + deletes
    for r in rows:
        assert r["op"] in ("c", "u", "d")
        if r["op"] != "d":
            assert r["after"]["amount"] is not None
            assert str(r["after"]["amount"].as_tuple().exponent) == "-2"
        if r["op"] == "u":
            assert r["before"] is not None
    # empty-string voucher codes survive the JSON hop as "", not null
    non_null = parsed.filter("after is not null").select("after.voucher_code").collect()
    assert any(v["voucher_code"] == "" for v in non_null)
    assert all(v["voucher_code"] is not None for v in non_null)


def test_parse_envelope_corrupt_records(spark):
    good = json.dumps(
        {
            "before": None,
            "after": {"transaction_id": "t1", "amount": "10.00", "timestamp": "2026-01-01 00:00:00"},
            "op": "c",
            "ts_ms": 1,
            "source": {"lsn": 1, "table": "transactions", "db": "d"},
        }
    )
    df = spark.createDataFrame([("t1", good), ("t2", "{not json")], "key string, value string")
    parsed = parse_envelope(df, "string", keep_corrupt=True)
    rows = {r["key"]: r for r in parsed.collect()}
    assert rows["t1"]["after"]["amount"] == Decimal("10.00")
    assert rows["t1"]["_corrupt"] is None
    assert rows["t2"]["_corrupt"] is not None


def test_timestamp_decode_epoch_and_string(spark):
    df = spark.createDataFrame(
        [("2026-01-01 00:00:10",), ("1767225610",)], "timestamp string"
    ).select(F.struct("timestamp").alias("img"))
    from realtime_change_data_capture_streaming_spark.cdc.decode import _decode_ts

    out = df.select(_decode_ts(F.col("img.timestamp")).alias("ts")).collect()
    assert out[0]["ts"] is not None
    assert out[1]["ts"] is not None


def _env_json(key, op, lsn, amount="10.00"):
    return json.dumps(
        {
            "before": None,
            "after": {"transaction_id": key, "amount": amount, "timestamp": "2026-01-01 00:00:00"},
            "op": op,
            "ts_ms": lsn,
            "source": {"lsn": lsn, "table": "transactions", "db": "d"},
        }
    )


def test_kafka_tombstones_dropped_by_default(spark):
    """Debezium follows op='d' with a null-value compaction tombstone; on
    the uncompacted topic it is a transport artifact — neither a change
    event nor dead-letter material."""
    df = spark.createDataFrame(
        [("t1", _env_json("t1", "c", 1)), ("t1", None), ("t2", _env_json("t2", "c", 2))],
        "key string, value string",
    )
    parsed = parse_envelope(df, "string", keep_corrupt=True)
    rows = parsed.collect()
    assert len(rows) == 2 and all(r["op"] == "c" for r in rows)
    assert all(r["_corrupt"] is None for r in rows)


def test_kafka_tombstones_as_deletes_on_compacted_topic(spark):
    """kafka_tombstones='delete': on a compacted topic the 'd' envelope may
    be gone and the tombstone is the only record of the deletion — it must
    synthesize a delete that wins latest-per-key."""
    from realtime_change_data_capture_streaming_spark.cdc.apply_changes import apply_changes_batch

    df = spark.createDataFrame(
        [
            ("t1", _env_json("t1", "c", 1)),
            ("t1", None),  # compaction marker: t1 was deleted, 'd' envelope compacted away
            ("t2", _env_json("t2", "c", 2)),
        ],
        "key string, value string",
    )
    parsed = parse_envelope(df, "string", kafka_tombstones="delete")
    ops = {(r["key"], r["op"]) for r in parsed.collect()}
    assert ("t1", "d") in ops
    final = apply_changes_batch(parsed)
    keys = {r["transaction_id"] for r in final.collect()}
    assert keys == {"t2"}


def test_kafka_tombstone_then_reinsert_ordered_by_offset(spark):
    """Compaction is eventual (the active segment is never cleaned), so a
    compacted topic can carry a tombstone AND a later re-insert of the same
    key.  With the input's Kafka ``offset`` column present, parse_envelope
    passes it through and latest-wins on ``order_cols=("offset",)`` lets
    the newer 'c' beat the synthesized delete — the sentinel-LSN ordering
    alone would silently drop the live key."""
    from realtime_change_data_capture_streaming_spark.cdc.apply_changes import apply_changes_batch

    df = spark.createDataFrame(
        [
            (0, "t1", _env_json("t1", "c", 1)),
            (1, "t1", None),  # tombstone for a compacted-away delete
            (2, "t1", _env_json("t1", "c", 7)),  # re-insert AFTER the delete
            (3, "t2", _env_json("t2", "c", 2)),
        ],
        "offset long, key string, value string",
    )
    parsed = parse_envelope(df, "string", kafka_tombstones="delete")
    assert "offset" in parsed.columns  # passthrough on real AND synthesized rows
    offsets = {(r["key"], r["op"], r["offset"]) for r in parsed.collect()}
    assert ("t1", "d", 1) in offsets and ("t1", "c", 2) in offsets
    final = apply_changes_batch(parsed, order_cols=("offset",))
    keys = {r["transaction_id"] for r in final.collect()}
    assert keys == {"t1", "t2"}  # the re-insert survives
    # sanity: without offset ordering the sentinel delete would win
    legacy = apply_changes_batch(parsed.drop("offset"))
    assert {r["transaction_id"] for r in legacy.collect()} == {"t2"}


def test_tombstone_reinsert_across_sink_merges_offset_order(spark, tmp_path):
    """The stateful variant of the compacted-topic caveat: tombstone and
    re-insert arrive in DIFFERENT micro-batches against a persistent sink
    running ``order_cols=("offset", "ts_ms")``.  The stored tombstone's
    __lsn is its log offset (not the sentinel), so a later batch's
    re-insert at a higher offset beats it; a replayed tombstone (same
    offset, redelivered batch) and a late lower-offset update both lose
    to the stored state — per-key log position stays the total order
    ACROSS merges, not just within one batch."""
    from realtime_change_data_capture_streaming_spark.cdc.apply_changes import (
        BucketedParquetSink,
    )

    def batch(rows):
        df = spark.createDataFrame(rows, "offset long, key string, value string")
        return parse_envelope(df, "string", kafka_tombstones="delete")

    sink = BucketedParquetSink(spark, str(tmp_path / "offsink"), n_buckets=4)
    oc = ("offset", "ts_ms")

    # batch 1: insert, then compaction tombstone (the 'd' envelope is gone)
    sink.merge(batch([(0, "t1", _env_json("t1", "c", 1)), (5, "t1", None)]), oc)
    assert sink.read().count() == 0  # t1 dead, tombstone retained
    assert sink.read_raw().filter("op = 'd'").count() == 1

    # batch 2: re-insert AFTER the delete (higher offset) -> key revives
    sink.merge(batch([(7, "t1", _env_json("t1", "c", 9, amount="77.00"))]), oc)
    live = {r["transaction_id"]: str(r["amount"]) for r in sink.read().collect()}
    assert live == {"t1": "77.00"}

    # redelivered tombstone (same offset 5): idempotent, re-insert survives
    sink.merge(batch([(5, "t1", None)]), oc)
    assert {r["transaction_id"] for r in sink.read().collect()} == {"t1"}

    # late out-of-order update below the stored offset: loses latest-wins
    sink.merge(batch([(6, "t1", _env_json("t1", "u", 8, amount="66.00"))]), oc)
    live = {r["transaction_id"]: str(r["amount"]) for r in sink.read().collect()}
    assert live == {"t1": "77.00"}

    # and the ordering mode is recorded: a WAL-ordered merge now raises
    import pytest as _pytest

    with _pytest.raises(ValueError, match="order"):
        sink.merge(batch([(8, "t1", _env_json("t1", "u", 9))]), ("lsn", "ts_ms"))
