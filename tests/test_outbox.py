"""Pins for the transactional-outbox publish: the in-order contiguous
prefix gate, at-least-once dedup, non-vacuous gap/hold cases in the
fixture, batch == streaming equivalence, and the plan shape."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.cdc.queries import (
    _OUTBOX_DUP,
    _OUTBOX_GAP,
    cdc_outbox_publish,
    outbox_change_events,
    outbox_gate,
    outbox_rows,
)

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


def test_gate_holds_successors_behind_a_gap(spark):
    """Synthetic rows: aggregate 1 has seqs (1,3) — 3 must be held;
    aggregate 2 has (2,3) — nothing publishes; aggregate 3 has (1,2,3)
    — everything publishes.  Redelivered ids collapse to one row."""
    rows = spark.createDataFrame(
        [
            ("1-1", "d", 1, 1, "t", "p", 10),
            ("1-3", "d", 1, 3, "t", "p", 11),
            ("2-2", "d", 2, 2, "t", "p", 20),
            ("2-3", "d", 2, 3, "t", "p", 21),
            ("3-1", "d", 3, 1, "t", "p", 30),
            ("3-2", "d", 3, 2, "t", "p", 31),
            ("3-3", "d", 3, 3, "t", "p", 32),
            ("3-1", "d", 3, 1, "t", "p", 90),  # redelivery, later lsn
        ],
        "event_id string, dest string, aggregate_id long, event_seq int, "
        "event_type string, payload string, lsn long",
    )
    got = {
        (r["aggregate_id"], r["event_seq"]): r["lsn"]
        for r in outbox_gate(rows).collect()
    }
    assert set(got) == {(1, 1), (3, 1), (3, 2), (3, 3)}
    assert got[(3, 1)] == 30  # first-seen lsn wins over the redelivery


def test_fixture_gap_and_dup_cases_are_non_vacuous(spark):
    """The fixture must actually exercise the hold and the dedup: some
    gapped aggregate has an arrived seq-3 event that is NOT published
    (held behind the lost seq-2) while its seq-1 IS, and redelivered
    event ids appear twice pre-dedup."""
    rows = outbox_rows(outbox_change_events(spark, SF_DIR))
    gapped_held = rows.filter(
        (F.col("aggregate_id") % _OUTBOX_GAP == 0) & (F.col("event_seq") == 3)
    )
    assert gapped_held.count() > 0, "no aggregate exercises the hold path"
    dup_counts = rows.groupBy("event_id").count().filter(F.col("count") > 1)
    assert dup_counts.count() > 0, "no event exercises the dedup path"

    pub = cdc_outbox_publish(spark, SF_DIR)
    held_ids = gapped_held.select(
        "aggregate_id", F.lit(3).alias("event_seq")
    ).distinct()
    leaked = pub.join(held_ids, ["aggregate_id", "event_seq"], "left_semi")
    assert leaked.count() == 0, "held events leaked past the gate"
    seq1 = pub.filter(
        (F.col("aggregate_id") % _OUTBOX_GAP == 0) & (F.col("event_seq") == 1)
    )
    assert seq1.count() > 0, "gapped aggregates must still publish seq 1"
    # exactly-once: no (aggregate, seq) publishes twice
    assert (
        pub.groupBy("aggregate_id", "event_seq").count().filter("count > 1").count() == 0
    )


def test_stream_equals_batch(spark):
    """The cross-batch split (successors a batch before their seq-1)
    must be invisible: streaming publish == batch publish, row for row."""
    from realtime_change_data_capture_streaming_spark.streaming.cdc_stream import (
        stream_outbox_publish,
    )

    batch = cdc_outbox_publish(spark, SF_DIR)
    stream = stream_outbox_publish(spark, SF_DIR)
    assert batch.exceptAll(stream).count() == 0
    assert stream.exceptAll(batch).count() == 0


def test_outbox_plan_shape(spark):
    """No cartesian, no Python eval, and the only window is partitioned
    by aggregate (no single-partition window)."""
    from realtime_change_data_capture_streaming_spark.plans.introspect import (
        unbounded_global_windows,
    )

    df = cdc_outbox_publish(spark, SF_DIR)
    assert unbounded_global_windows(df) == []
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BatchEvalPython" not in plan


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_EVENTS = st.lists(
    st.tuples(
        st.integers(1, 4),  # aggregate
        st.integers(1, 5),  # seq
        st.integers(0, 99),  # lsn
    ),
    min_size=1,
    max_size=24,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=_EVENTS)
def test_gate_property_matches_reference(spark, events):
    """For arbitrary (aggregate, seq, lsn) multisets — duplicates and
    redeliveries likely — the gate equals the Python reference: dedup
    event ids to min lsn, then keep each aggregate's contiguous prefix
    from seq 1."""
    rows = [
        (f"{a}-{s}", "d", a, s, "t", "p", lsn) for a, s, lsn in events
    ]
    df = spark.createDataFrame(
        rows,
        "event_id string, dest string, aggregate_id long, event_seq int, "
        "event_type string, payload string, lsn long",
    )
    got = {
        (r["aggregate_id"], r["event_seq"]): r["lsn"]
        for r in outbox_gate(df).collect()
    }
    # reference: min-lsn per id, then the contiguous prefix per aggregate
    first: dict[tuple[int, int], int] = {}
    for a, s, lsn in events:
        k = (a, s)
        first[k] = min(first.get(k, lsn), lsn)
    expect = {}
    for a in {a for a, _, _ in events}:
        seqs = sorted(s for (ag, s) in first if ag == a)
        k = 0
        while k < len(seqs) and seqs[k] == k + 1:
            expect[(a, k + 1)] = first[(a, k + 1)]
            k += 1
    assert got == expect
