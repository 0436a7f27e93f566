"""Property test: gap-fill LOCF roll-up vs a brute-force reference.

The segment-expansion formulation (lead + explode(sequence)) replaced an
explicit spine join for plan reasons; this pins that the rewrite IS
last-observation-carried-forward: for random per-user series (duplicate
in-slot events, arbitrary gaps, single-slot users) the roll-up equals a
naive python fill over the hourly grid.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_EVENTS = st.lists(
    st.tuples(
        st.integers(0, 2),  # user
        st.integers(0, 40),  # hour index
        st.integers(0, 3),  # intra-hour tiebreak (event_id)
        st.integers(0, 9999),  # cents
    ),
    min_size=1,
    max_size=30,
)


def _reference(events):
    # latest event per (user, hour) by event_id tiebreak; fill the hour grid
    latest = {}
    for u, h, e, c in events:
        if (u, h) not in latest or e > latest[(u, h)][0]:
            latest[(u, h)] = (e, c)
    by_user = {}
    for (u, h), (_e, c) in latest.items():
        by_user.setdefault(u, {})[h] = c
    out = {}
    for u, slots in by_user.items():
        lo, hi = min(slots), max(slots)
        n_gaps, total, last = 0, 0, None
        for h in range(lo, hi + 1):
            if h in slots:
                last = slots[h]
            else:
                n_gaps += 1
            total += last
        out[u] = (hi - lo + 1, n_gaps, total)
    return out


@given(events=_EVENTS)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_gapfill_rollup_matches_bruteforce(spark, events):
    from pyspark.sql import functions as F

    from realtime_change_data_capture_streaming_spark.operators.events import gapfill_locf_rollup

    # drop (user, hour, tiebreak) duplicates: two events with an identical
    # ordering key but different values make the latest-wins pick
    # ambiguous on BOTH sides — not a property either implementation claims
    events = list({(u, h, e): (u, h, e, c) for (u, h, e, c) in events}.values())
    df = spark.createDataFrame(
        [
            (u, 3600 * h, u * 1_000_000 + h * 100 + e, c / 100.0)
            for (u, h, e, c) in events
        ],
        "user_id long, secs long, event_id long, value double",
    ).select("user_id", F.timestamp_seconds("secs").alias("ts"), "event_id", "value")
    got = {
        r["user_id"]: (r["n_slots"], r["n_gap_slots"], r["sum_filled_cents"])
        for r in gapfill_locf_rollup(df).collect()
    }
    assert got == _reference(events)
