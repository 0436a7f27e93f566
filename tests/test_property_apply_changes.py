"""Property-based test of the apply-changes invariant (SURVEY.md §5):

    apply_changes(E) == apply_changes(shuffle-within-key(duplicate(E)))

for ARBITRARY event sequences — hypothesis searches the input space the
example-based tests cannot (odd op interleavings, all-delete keys, replays
of a strict prefix, single-key floods).  The reference gets this guarantee
from Kafka replay + sink PK dedup (transaction_consumer.py:10, :88); our
latest-wins fold must honor it for every input, not just fixture shapes.

Hypothesis drives the EVENT-SET construction; each case folds through the
real Spark pipeline.  Cases are kept small (Spark per-query overhead), but
the space covered — op patterns × duplication × arrival order — is the
point.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.cdc import apply_changes_batch

# an event: (key, op, lsn) — lsn strictly increasing within key is the WAL
# guarantee; amounts derived deterministically from lsn so value equality
# is implied by key/lsn equality.
ops = st.sampled_from(["c", "u", "d"])
key_histories = st.lists(
    st.tuples(st.integers(0, 5), ops), min_size=1, max_size=24
)


def _events_df(spark, history):
    """history: list of (key, op) in WAL order -> typed change rows with
    per-key increasing lsn, op-dependent images."""
    rows = []
    for lsn, (k, op) in enumerate(history):
        key = f"k{k}"
        after = None if op == "d" else (key, float(100 + lsn))
        before = None if op == "c" else (key, float(1))
        rows.append((key, op, lsn, lsn, before, after))
    schema = (
        "key string, op string, lsn long, ts_ms long, "
        "before struct<transaction_id:string, amount:double>, "
        "after struct<transaction_id:string, amount:double>"
    )
    return spark.createDataFrame(rows, schema)


def _state(final_df):
    # apply_changes_batch output is flattened: key + after.* columns
    return sorted((r["key"], r["amount"]) for r in final_df.select("key", "amount").collect())


@pytest.fixture(scope="module")
def hspark(spark):
    return spark


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(history=key_histories, dup_mod=st.integers(1, 3), parts=st.integers(1, 7))
def test_effectively_once_for_arbitrary_histories(hspark, history, dup_mod, parts):
    spark = hspark
    events = _events_df(spark, history)
    baseline = _state(apply_changes_batch(events))
    # chaos: re-deliver a deterministic subset, scatter arrival order
    redelivered = events.filter(F.pmod(F.col("lsn"), F.lit(dup_mod)) == 0)
    chaos = (
        events.unionAll(redelivered)
        .repartition(parts)
        .sortWithinPartitions(F.reverse(F.col("key")))
    )
    got = _state(apply_changes_batch(chaos))
    assert got == baseline


# ------------------------- transaction-gate all-or-nothing property --------

txn_specs = st.lists(
    st.tuples(
        st.integers(1, 4),          # events intended in this txn
        st.integers(0, 4),          # events actually delivered (capped below)
        st.booleans(),              # redeliver the delivered prefix?
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(spec=txn_specs)
def test_txn_gate_is_all_or_nothing(hspark, spec):
    """For ARBITRARY transactions with arbitrary delivery truncation and
    redelivery, the gate must release exactly the transactions whose
    full event set arrived — never a strict subset of a transaction."""
    from realtime_change_data_capture_streaming_spark.cdc.queries import gate_complete_transactions

    rows, meta_rows, expect_released = [], [], set()
    lsn = 0
    for t, (n_intended, n_deliv, redeliver) in enumerate(spec):
        n_deliv = min(n_deliv, n_intended)
        meta_rows.append((f"t{t}", n_intended))
        if n_deliv == n_intended:
            expect_released.add(f"t{t}")
        for i in range(n_deliv):
            r = (f"t{t}", f"k{t}_{i}", lsn)
            rows.append(r)
            if redeliver:
                rows.append(r)  # duplicate delivery must not inflate counts
            lsn += 1
    if not rows:
        return
    parsed = hspark.createDataFrame(rows, "txn_id string, key string, lsn long")
    meta = hspark.createDataFrame(meta_rows, "txn_id string, n_expected long")
    got = gate_complete_transactions(parsed, meta).collect()
    got_txns = {r["txn_id"] for r in got}
    assert got_txns == expect_released
    # released transactions come through complete (dedup restores each
    # event exactly as many times as delivered, never truncated)
    per_txn = {}
    for r in got:
        per_txn.setdefault(r["txn_id"], set()).add((r["key"], r["lsn"]))
    for t, (n_intended, n_deliv, _rd) in enumerate(spec):
        if f"t{t}" in expect_released:
            assert len(per_txn[f"t{t}"]) == n_intended
