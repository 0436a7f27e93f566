"""Property test: join_asof vs a brute-force O(n*m) reference.

The window-fill formulation (union + last/first ignorenulls) is subtle —
tie handling at equal timestamps, per-key isolation, inner semantics,
tolerance cutoffs.  Hypothesis drives random keyed time series through
backward / forward / toleranced variants and checks every matched (and
unmatched) left row against the naive definition.

Right-side (key, ts) pairs are deduplicated: with two right rows at the
same instant the as-of match is genuinely ambiguous (any engine picks an
arbitrary one), so uniqueness is the documented determinism precondition
(the fixture queries rely on the same property).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ROWS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)),  # (key, ts-seconds)
    min_size=0,
    max_size=25,
)


def _reference(left, right, direction, tol_s):
    out = {}
    for i, (k, lt) in enumerate(left):
        if direction == "backward":
            cands = [rt for (rk, rt) in right if rk == k and rt <= lt]
            best = max(cands) if cands else None
            gap = lt - best if best is not None else None
        else:
            cands = [rt for (rk, rt) in right if rk == k and rt >= lt]
            best = min(cands) if cands else None
            gap = best - lt if best is not None else None
        if best is not None and (tol_s is None or gap <= tol_s):
            out[i] = best
    return out


@given(
    left=_ROWS,
    right=_ROWS,
    direction=st.sampled_from(["backward", "forward"]),
    tol_s=st.sampled_from([None, 0, 5, 20]),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_join_asof_matches_bruteforce(spark, left, right, direction, tol_s):
    from pyspark.sql import functions as F

    from realtime_change_data_capture_streaming_spark.operators.asof import join_asof

    right = list({(k, t) for (k, t) in right})  # unique right (key, ts)
    ldf = (
        spark.createDataFrame(
            [(i, k, t) for i, (k, t) in enumerate(left)] or [(None, None, None)],
            "row_id long, k long, secs long",
        )
        .filter(F.col("row_id").isNotNull())
        .select("row_id", "k", F.timestamp_seconds("secs").alias("lts"))
    )
    rdf = (
        spark.createDataFrame(
            [(k, t) for (k, t) in right] or [(None, None)], "k long, secs long"
        )
        .filter(F.col("k").isNotNull())
        .select("k", F.timestamp_seconds("secs").alias("rts"))
    )
    got_df = join_asof(
        ldf,
        rdf,
        on="k",
        left_ts="lts",
        right_ts="rts",
        direction=direction,
        tolerance=f"{tol_s} seconds" if tol_s is not None else None,
    )
    got = {
        r["row_id"]: int(r["_match"]["rts"].timestamp()) for r in got_df.collect()
    }
    assert got == _reference(left, right, direction, tol_s)


def test_nearest_asof_matches_bruteforce_on_fixture(spark):
    """events_asof_nearest_view vs a driver-side nearest computation on
    the sf0.001 fixture: min |gap| across both directions, ties to the
    BEFORE match, single-sided purchases keep their only match."""
    from pyspark.sql import functions as F

    from realtime_change_data_capture_streaming_spark.operators.asof import events_asof_nearest_view
    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select("user_id", "event_type", "ts").collect()
    views = {}
    for r in ev:
        if r["event_type"] == "view":
            views.setdefault(r["user_id"], []).append(r["ts"])
    expect = {}
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        vs = views.get(r["user_id"], [])
        before = [t for t in vs if t <= r["ts"]]
        after = [t for t in vs if t >= r["ts"]]
        b = max(before) if before else None
        f = min(after) if after else None
        if b is None and f is None:
            continue
        if f is None or (b is not None and (r["ts"] - b) <= (f - r["ts"])):
            expect[(r["user_id"], r["ts"])] = ("before", b)
        else:
            expect[(r["user_id"], r["ts"])] = ("after", f)
    got = {
        (r["user_id"], r["purchase_ts"]): (r["direction"], r["view_ts"])
        for r in events_asof_nearest_view(spark, sf).collect()
    }
    assert got == expect


def test_nearest_asof_survives_duplicate_purchase_timestamps(spark, monkeypatch):
    """Two purchases by one user at the SAME timestamp must yield exactly
    one combiner row each (the full-outer merge keys on the purchase
    event_id, not (user_id, ts) — a timestamp join would n^2 fan out)."""
    import datetime as dt

    import realtime_change_data_capture_streaming_spark.operators.asof as asof_mod

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 7, "purchase", 10.0, None),
        (2, t0, 7, "purchase", 20.0, None),  # same user, same ts
        (3, t0 - dt.timedelta(minutes=5), 7, "view", 1.0, None),
        (4, t0 + dt.timedelta(minutes=1), 7, "view", 2.0, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    monkeypatch.setattr(asof_mod, "load_table", lambda s_, sf_, n_: ev)
    got = asof_mod.events_asof_nearest_view(spark, "unused").collect()
    assert len(got) == 2, f"expected one row per purchase, got {len(got)}"
    # both purchases pick the closer AFTER view (1 min < 5 min)
    for r in got:
        assert r["direction"] == "after" and r["abs_gap_us"] == 60_000_000
