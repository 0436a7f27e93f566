"""Effectively-once apply-changes semantics (SURVEY.md sections 3.3, 5).

Property: sink state is identical under replay + duplication + within-key
reorder — the guarantee the reference gets from `startingOffsets=earliest`
(`transaction_consumer.py:10`) + PK conflict dedup (`:88`).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.cdc import apply_changes_batch, parse_envelope
from realtime_change_data_capture_streaming_spark.cdc.apply_changes import BucketedParquetSink
from realtime_change_data_capture_streaming_spark.sources import synthetic_change_events


def _sorted_rows(df, cols=("transaction_id", "amount")):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def parsed_events(spark):
    events = synthetic_change_events(spark, 200, updates_per_key=2, delete_every=10, seed=7)
    return parse_envelope(events, decimal_mode="string").cache()


def test_apply_changes_latest_wins(spark, parsed_events):
    final = apply_changes_batch(parsed_events)
    n_keys = parsed_events.select("key").distinct().count()
    n_deleted = parsed_events.filter("op = 'd'").select("key").distinct().count()
    assert final.count() == n_keys - n_deleted
    # latest update multiplies base amount by 1.2 — every survivor must
    # carry the _v=2 image, i.e. amount == round(base*1.2, 2)
    base = parse_envelope(
        synthetic_change_events(spark, 200, updates_per_key=0, delete_every=0, seed=7), "string"
    ).select(F.col("key"), F.col("after.amount").alias("base_amount"))
    joined = final.join(base, final["transaction_id"] == base["key"])
    bad = joined.filter(
        F.col("amount")
        != F.round(F.col("base_amount").cast("double") * 1.2, 2).cast("decimal(18,2)")
    )
    assert bad.count() == 0


def test_effectively_once_under_replay_dup_reorder(spark, parsed_events):
    baseline = _sorted_rows(apply_changes_batch(parsed_events))
    # duplicate everything twice (replay), then shuffle ordering by a
    # repartition+sort on an unrelated column (within-key reorder of arrival)
    chaos = (
        parsed_events.unionAll(parsed_events)
        .unionAll(parsed_events.limit(137))
        .repartition(13)
        .sortWithinPartitions(F.reverse(F.col("key")))
    )
    assert _sorted_rows(apply_changes_batch(chaos)) == baseline


def test_bucketed_sink_incremental_merge(spark, parsed_events, tmp_path):
    """Merging in two halves == merging all at once; re-merge is a no-op."""
    sink = BucketedParquetSink(spark, str(tmp_path / "sink"), n_buckets=8)
    first = parsed_events.filter(F.col("lsn") % 2 == 0)
    second = parsed_events.filter(F.col("lsn") % 2 == 1)
    sink.merge(first)
    sink.merge(second)
    want = _sorted_rows(apply_changes_batch(parsed_events))
    got = _sorted_rows(sink.read())
    assert got == want
    # replay second batch (foreachBatch redelivery) — idempotent
    sink.merge(second)
    assert _sorted_rows(sink.read()) == want


def test_compaction_purges_tombstones_preserving_state(spark, parsed_events, tmp_path):
    from realtime_change_data_capture_streaming_spark.cdc.apply_changes import compact_sink

    sink = BucketedParquetSink(spark, str(tmp_path / "csink"), n_buckets=4)
    sink.merge(parsed_events)
    before_live = _sorted_rows(sink.read())
    n_tombstones = sink.read_raw().filter("op = 'd'").count()
    assert n_tombstones > 0
    max_lsn = sink.read_raw().agg(F.max("__lsn")).collect()[0][0]
    compact_sink(sink, purge_tombstones_through_lsn=max_lsn)
    assert sink.read_raw().filter("op = 'd'").count() == 0
    assert _sorted_rows(sink.read()) == before_live
    # contract: purging through lsn L is only safe if events <= L can no
    # longer be replayed — new (higher-lsn) changes must still apply
    fresh = (
        parsed_events.filter(F.col("op") != "d")
        .limit(20)
        .withColumn("lsn", F.col("lsn") + max_lsn + 1)
        .withColumn("after", F.col("after").withField("amount", F.lit("9999.99").cast("decimal(18,2)")))
    )
    sink.merge(fresh)
    bumped = sink.read().filter(F.col("amount") == 9999.99).count()
    assert bumped == fresh.select("key").distinct().count()


def test_txn_consistent_apply_is_atomic(spark):
    """The transaction gate must drop WHOLE transactions: for every txn
    with a withheld update event, even the perfectly delivered inserts of
    sibling keys must be absent; complete transactions apply fully."""
    from realtime_change_data_capture_streaming_spark.cdc.queries import (
        _TXN_DROP,
        _TXN_GROUP,
        cdc_txn_consistent_apply,
    )
    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {int(r["transaction_id"]) for r in cdc_txn_consistent_apply(spark, sf).collect()}
    keys = [r["o_orderkey"] for r in load_table(spark, sf, "orders").select("o_orderkey").collect()]
    bad_txns = {k // _TXN_GROUP for k in keys if k % 10 == 0 and k % _TXN_DROP == 0}
    assert bad_txns, "fixture has no incomplete transactions - gate untested"
    for k in keys:
        if k // _TXN_GROUP in bad_txns:
            assert k not in got, f"key {k} from incomplete txn leaked into output"
        elif k % 97 != 0:
            assert k in got, f"key {k} from complete txn missing"
