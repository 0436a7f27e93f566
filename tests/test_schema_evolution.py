"""Schema evolution on the CDC path (reference flow: ALTER TABLE ... ADD,
``/root/reference/README.md:211``): envelopes carrying fields the fixed
StructType does not know must not be silently dropped, and the sink must
widen on first sight instead of failing the merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.cdc import apply_changes_batch, parse_envelope
from realtime_change_data_capture_streaming_spark.cdc.apply_changes import BucketedParquetSink
from realtime_change_data_capture_streaming_spark.sources import synthetic_change_events


def _with_extra_field(events, field: str, value: str):
    """Inject an unknown field into the after image of every envelope —
    string surgery on the JSON, as an upstream producer would emit it."""
    return events.withColumn(
        "value",
        F.regexp_replace(
            F.col("value"), r'"after":\{', f'"after":{{"{field}":"{value}",'
        ),
    )


def test_capture_extras_routes_unknown_fields(spark):
    events = _with_extra_field(
        synthetic_change_events(spark, 20, updates_per_key=0, delete_every=0), "channel", "web"
    )
    parsed = parse_envelope(events, "string", capture_extras=True)
    assert "_extra" in parsed.columns
    rows = parsed.select("key", F.element_at("_extra", "channel").alias("ch")).collect()
    assert all(r["ch"] == "web" for r in rows)
    # the typed image is unaffected, and known fields never leak into _extra
    known_leak = parsed.filter(F.map_contains_key("_extra", "transaction_id")).count()
    assert known_leak == 0
    assert parsed.filter(F.col("after.amount").isNull()).count() == 0


def test_capture_extras_off_is_unchanged(spark):
    events = synthetic_change_events(spark, 5, updates_per_key=0, delete_every=0)
    assert "_extra" not in parse_envelope(events, "string").columns


def test_apply_changes_carries_extras_latest_wins(spark):
    # v1 inserts, evolved updates: the update's extras must win; keys never
    # updated after the evolution must show null (widened-table semantics)
    base = synthetic_change_events(spark, 30, updates_per_key=1, delete_every=0)
    evolved = _with_extra_field(base.filter(F.col("value").contains('"op":"u"')), "channel", "web")
    v1 = base.filter(~F.col("value").contains('"op":"u"'))
    parsed = parse_envelope(v1.unionByName(evolved), "string", capture_extras=True)
    final = apply_changes_batch(parsed)
    assert final.filter(F.element_at("_extra", "channel") == "web").count() == 30


def test_sink_widens_on_first_sight(spark, tmp_path):
    """Merge a pre-evolution batch, then an evolved batch: the union must
    widen (null map for old rows), not fail; and the reverse direction
    (evolved table, v1 batch) must also merge."""
    sink = BucketedParquetSink(spark, str(tmp_path / "esink"), n_buckets=4)
    base = synthetic_change_events(spark, 40, updates_per_key=0, delete_every=0)
    first = parse_envelope(base, "string")  # no _extra column at all
    sink.merge(first)

    updates = _with_extra_field(
        synthetic_change_events(spark, 40, updates_per_key=1, delete_every=0).filter(
            F.col("value").contains('"op":"u"')
        ),
        "channel",
        "store",
    )
    sink.merge(parse_envelope(updates, "string", capture_extras=True))
    live = sink.read()
    assert "_extra" in live.columns
    assert live.count() == 40
    assert live.filter(F.element_at("_extra", "channel") == "store").count() == 40

    # reverse: a later v1 batch (no _extra) against the widened table
    fresh = parse_envelope(
        synthetic_change_events(spark, 5, updates_per_key=0, delete_every=0, seed=99), "string"
    )
    sink.merge(fresh)
    assert sink.read().count() == 45
    assert sink.read().filter(F.col("_extra").isNotNull()).count() == 40
