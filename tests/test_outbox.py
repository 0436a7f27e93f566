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


def _bump_lsn(df, lsn):
    """Redeliver a copy of the given envelopes at a huge LSN — a
    heartbeat that advances the watermark without changing any gate
    decision (dedup keeps the first-seen LSN per event id)."""
    return df.withColumn(
        "value", F.regexp_replace("value", '"lsn":\\d+', f'"lsn":{lsn}')
    )


def test_outbox_retention_bounds_pending_without_changing_publish(spark):
    """VERDICT r9 task 6 (outbox half): with an LSN-horizon retention
    policy the pending store ends EMPTY (released + published rows
    compacted, gapped orphans dead-lettered once the watermark passes
    the horizon) while the published stream is exactly the no-retention
    run's.  The dead letter holds precisely the permanently-gapped
    successors."""
    from realtime_change_data_capture_streaming_spark.cdc.queries import (
        _OUTBOX_GAP,
        outbox_change_events,
    )
    from realtime_change_data_capture_streaming_spark.session import scratch_dir
    from realtime_change_data_capture_streaming_spark.streaming.cdc_stream import _run_outbox_stream

    ev = outbox_change_events(spark, SF_DIR)
    seq = F.get_json_object("value", "$.after.seq").cast("int")
    heartbeat = _bump_lsn(ev.filter(seq == 1).limit(1), 10**9)
    frames = [ev.filter(seq >= 2), ev.filter(seq == 1), heartbeat]

    base, _ = _run_outbox_stream(spark, frames, scratch_dir(prefix="ret_out_base_"))
    ret, paths = _run_outbox_stream(
        spark, frames, scratch_dir(prefix="ret_out_"), retention_lsn_horizon=10_000_000
    )
    assert base.exceptAll(ret).count() == 0 and ret.exceptAll(base).count() == 0
    assert ret.count() > 0
    # bounded state: nothing left pending after the watermark advanced
    pend = spark.read.parquet(paths["pending"])
    assert pend.count() == 0, pend.collect()[:5]
    dead = spark.read.parquet(paths["dead"]).dropDuplicates(["event_id"])
    rows = dead.collect()
    assert rows, "expected permanently-gapped successors in the dead letter"
    for r in rows:
        assert int(r["aggregate_id"]) % _OUTBOX_GAP == 0, r
        assert r["event_seq"] == 3, r  # seq 2 lost -> only seq 3 was held
    # every gapped aggregate WITH a seq-3 event is accounted for
    n_expected = (
        ev.select(F.get_json_object("value", "$.after.aggregateid").cast("bigint").alias("a"),
                  F.get_json_object("value", "$.after.seq").cast("int").alias("s"))
        .filter((F.col("a") % _OUTBOX_GAP == 0) & (F.col("s") == 3))
        .select("a").distinct().count()
    )
    assert len(rows) == n_expected


def test_fk_retention_bounds_pending_without_changing_final_state(spark):
    """VERDICT r9 task 6 (FK half): with retention the child pending
    store ends empty — released children compacted away (latest-wins
    makes re-release redundant), orphan children of never-arriving
    parents dead-lettered past the horizon — and the final child table
    equals the no-retention run's."""
    from realtime_change_data_capture_streaming_spark.cdc.queries import (
        _FK_PARENT_MISS,
        multitable_change_events,
    )
    from realtime_change_data_capture_streaming_spark.session import scratch_dir
    from realtime_change_data_capture_streaming_spark.streaming.cdc_stream import _run_fk_stream

    parent_ev, child_ev = multitable_change_events(spark, SF_DIR)
    heartbeat = _bump_lsn(parent_ev.limit(1), 10**9)
    frames = [child_ev, parent_ev, heartbeat]

    base, _ = _run_fk_stream(spark, frames, scratch_dir(prefix="ret_fk_base_"))
    ret, paths = _run_fk_stream(
        spark, frames, scratch_dir(prefix="ret_fk_"), retention_lsn_horizon=10_000_000
    )
    assert base.exceptAll(ret).count() == 0 and ret.exceptAll(base).count() == 0
    assert ret.count() > 0
    pend = spark.read.parquet(paths["pending"])
    assert pend.count() == 0, pend.collect()[:5]
    dead = spark.read.parquet(paths["dead"]).dropDuplicates(["key", "lsn"])
    rows = dead.collect()
    assert rows, "expected orphan children in the dead letter"
    for r in rows:
        fk = int(r["fk"])
        # orphan iff the parent never reaches final state: its insert
        # was withheld (%_FK_PARENT_MISS) or it was deleted (%97, the
        # feed's standard delete rule)
        assert fk % _FK_PARENT_MISS == 0 or fk % 97 == 0, r


@pytest.mark.parametrize("seed", [3, 11])
def test_retention_gate_invariant_under_random_batch_splits(spark, seed):
    """The frontier-based retention gate must publish EXACTLY the batch
    closed form under arbitrary micro-batch arrival: the feed split
    into 4 md5-random batches, delivered out of order, with one whole
    batch redelivered — and a horizon too large to evict anything, so
    this isolates the frontier/compaction logic itself."""
    from realtime_change_data_capture_streaming_spark.cdc.queries import (
        cdc_outbox_publish,
        outbox_change_events,
    )
    from realtime_change_data_capture_streaming_spark.llm_ops.curation import hash_bucket
    from realtime_change_data_capture_streaming_spark.session import scratch_dir
    from realtime_change_data_capture_streaming_spark.streaming.cdc_stream import _run_outbox_stream

    ev = outbox_change_events(spark, SF_DIR)
    b = hash_bucket(F.concat(F.lit(str(seed)), F.col("value")), 4)
    parts = [ev.filter(b == i) for i in range(4)]
    frames = [parts[2], parts[0], parts[3], parts[1], parts[0]]  # out of order + redelivery
    got, paths = _run_outbox_stream(
        spark,
        frames,
        scratch_dir(prefix=f"ret_rand_{seed}_"),
        retention_lsn_horizon=10**12,
    )
    want = cdc_outbox_publish(spark, SF_DIR)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    assert got.count() > 0
    # with nothing evictable, pending holds ONLY the gapped successors
    pend = spark.read.parquet(paths["pending"])
    assert pend.count() == pend.select("event_id").distinct().count()  # compacted, deduped
    held = {(r["aggregate_id"], r["event_seq"]) for r in pend.collect()}
    pub = {(str(r["aggregate_id"]), r["event_seq"]) for r in got.collect()}
    assert not (held & pub), "published rows must be compacted out of pending"
    assert not os.path.exists(paths["dead"]), "nothing should evict under a huge horizon"


def test_fk_stream_restart_replays_batch(spark):
    """Kill-and-restart-from-checkpoint (VERDICT r12 task 3): the driver
    dies AFTER batch 0 is fully processed but BEFORE the checkpoint
    commits it, so the restarted run (fresh gate closures — nothing
    carried from the dead driver) must REPLAY batch 0.  The replay
    re-appends the batch's children to the pending store; the final
    child table must still equal the crash-free run's (idempotent
    latest-wins release).  This is the reference's crash contract
    (transaction_consumer.py:10) for the FK-gated apply."""
    from realtime_change_data_capture_streaming_spark.cdc.queries import multitable_change_events
    from realtime_change_data_capture_streaming_spark.session import scratch_dir
    from realtime_change_data_capture_streaming_spark.streaming.cdc_stream import (
        _fk_stream_once,
        _run_fk_stream,
        stage_ordered_batches,
    )

    parent_ev, child_ev = multitable_change_events(spark, SF_DIR)
    frames = [child_ev, parent_ev]
    base, _ = _run_fk_stream(spark, frames, scratch_dir(prefix="rs_fk_base_"))

    work = scratch_dir(prefix="rs_fk_")
    in_dir = stage_ordered_batches(frames, f"{work}/staged")
    with pytest.raises(Exception, match="injected crash|Query .* terminated"):
        _fk_stream_once(spark, work, in_dir, _crash_after_bid=0)
    got, _ = _fk_stream_once(spark, work, in_dir)
    assert got.count() > 0
    assert base.exceptAll(got).count() == 0 and got.exceptAll(base).count() == 0


def test_outbox_retention_restart_rehydrates_state(spark):
    """Kill-and-restart for the BOUNDED outbox store: the crash lands
    after batch 1's compaction commit, so the pending-store manifest is
    already at a rotated version with a non-zero watermark and
    applied_bid=1.  The restarted driver must (a) SKIP the replayed
    batch 1 off the manifest's applied_bid, (b) resume the version
    pointer from the manifest — the old driver-closure counter would
    reset to pending_v0, which compaction deleted — and (c) carry the
    LSN watermark forward so the heartbeat batch still evicts the
    permanently-gapped successors.  End state must be indistinguishable
    from a crash-free run."""
    from realtime_change_data_capture_streaming_spark.cdc.queries import outbox_change_events
    from realtime_change_data_capture_streaming_spark.session import scratch_dir
    from realtime_change_data_capture_streaming_spark.streaming.cdc_stream import (
        _outbox_stream_once,
        _run_outbox_stream,
        stage_ordered_batches,
    )

    ev = outbox_change_events(spark, SF_DIR)
    seq = F.get_json_object("value", "$.after.seq").cast("int")
    heartbeat = _bump_lsn(ev.filter(seq == 1).limit(1), 10**9)
    frames = [ev.filter(seq >= 2), ev.filter(seq == 1), heartbeat]
    base, _ = _run_outbox_stream(
        spark, frames, scratch_dir(prefix="rs_out_base_"), retention_lsn_horizon=10_000_000
    )

    work = scratch_dir(prefix="rs_out_")
    in_dir = stage_ordered_batches(frames, f"{work}/staged")
    with pytest.raises(Exception, match="injected crash|Query .* terminated"):
        _outbox_stream_once(
            spark, work, in_dir, retention_lsn_horizon=10_000_000, _crash_after_bid=1
        )
    got, paths = _outbox_stream_once(spark, work, in_dir, retention_lsn_horizon=10_000_000)
    assert got.count() > 0
    assert base.exceptAll(got).count() == 0 and got.exceptAll(base).count() == 0
    # bounded state survived the restart: pending drained, dead letter
    # holds exactly the gapped successors (same as the crash-free run)
    pend = spark.read.parquet(paths["pending"])
    assert pend.count() == 0, pend.collect()[:5]
    dead = spark.read.parquet(paths["dead"]).dropDuplicates(["event_id"])
    for r in dead.collect():
        assert int(r["aggregate_id"]) % _OUTBOX_GAP == 0, r
