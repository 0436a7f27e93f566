"""Semantic properties of the round-5 quality/feature operators, beyond
the oracle hash: invariants that hold by construction and would catch a
silent re-definition (off-by-one chunk windows, EWMA recursion drift,
smoothing direction, PSI of identical distributions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.llm_ops.curation import (
    _CHUNK_STRIDE,
    _CHUNK_W,
    curation_chunk_documents,
)
from realtime_change_data_capture_streaming_spark.llm_ops.features import (
    feature_target_encode,
)
from realtime_change_data_capture_streaming_spark.llm_ops.text import tokens
from realtime_change_data_capture_streaming_spark.operators.quality import (
    _ALPHA,
    events_ewma_value,
)
from realtime_change_data_capture_streaming_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_chunking_covers_every_token_with_expected_overlap(spark):
    """Chunk windows must tile each doc completely: chunk i starts at
    i*stride, spans min(W, n - i*stride) tokens, the last chunk reaches
    exactly token n, and consecutive chunks overlap by W - stride."""
    chunks = curation_chunk_documents(spark, SF_DIR).collect()
    n_toks = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", F.size(tokens(F.col("text"))).alias("n"))
        .collect()
    }
    per_doc: dict[int, list] = {}
    for r in chunks:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in per_doc.items():
        n = n_toks[doc_id]
        rows.sort(key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        covered_end = 0
        for r in rows:
            start = r["chunk_id"] * _CHUNK_STRIDE  # 0-based
            assert start < n
            expect_len = min(_CHUNK_W, n - start)
            assert r["n_chunk_tokens"] == expect_len, (doc_id, r)
            # no gap: each chunk starts inside or at the covered prefix
            assert start <= covered_end
            covered_end = max(covered_end, start + expect_len)
        assert covered_end == n, (doc_id, covered_end, n)
    # every tokenized doc is chunked
    assert set(per_doc) == {d for d, n in n_toks.items() if n > 0}


def test_ewma_matches_sequential_reference(spark):
    """The folded EWMA must equal the plain sequential recursion computed
    driver-side from the same (ts, event_id)-ordered values."""
    got = {r["user_id"]: r for r in events_ewma_value(spark, SF_DIR).collect()}
    pdf = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    for uid, g in pdf.groupby("user_id"):
        vals = list(g["value"])
        acc = vals[0]
        for x in vals[1:]:
            acc = x * _ALPHA + acc * (1.0 - _ALPHA)
        assert got[uid]["n_events"] == len(vals)
        # the operator rounds with F.round (HALF_UP); Python round() is
        # half-even, so compare against the unrounded fold with a tolerance
        # tighter than any neighbouring 6-dp value but wider than the
        # rounding step itself
        assert abs(got[uid]["ewma_value"] - acc) <= 5e-7 + 1e-12, (uid, acc)


def test_psi_is_zero_for_identical_distributions(spark):
    """PSI of a distribution against itself must be exactly 0 — the same
    binned counts on both sides cancel term by term (Laplace smoothing
    keeps every term finite, so 0 is exact, not approximate)."""
    from realtime_change_data_capture_streaming_spark.llm_ops.features import (
        _PSI_N_BINS,
        _PSI_BIN_W,
    )

    rows = [("x", p, float(v % 300)) for v in range(600) for p in ("a", "b")]
    df = spark.createDataFrame(rows, "event_type string, period string, value double")
    binned = df.select(
        "event_type",
        "period",
        F.least(
            F.lit(_PSI_N_BINS - 1), F.floor(F.col("value") / F.lit(_PSI_BIN_W)).cast("int")
        ).alias("bin"),
    )
    counts = (
        binned.groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("period") == "a", 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("period") == "b", 1).otherwise(0)).alias("cb"),
        )
        .collect()
    )
    assert all(r["ca"] == r["cb"] for r in counts)  # identical by construction
    # identical counts -> pa == pb for every bin -> every PSI term is 0
    import math

    na = sum(r["ca"] for r in counts)
    psi = sum(
        ((r["ca"] + 1) / (na + _PSI_N_BINS) - (r["cb"] + 1) / (na + _PSI_N_BINS))
        * math.log(((r["ca"] + 1) / (na + _PSI_N_BINS)) / ((r["cb"] + 1) / (na + _PSI_N_BINS)))
        for r in counts
    )
    assert psi == 0.0


def test_target_encoding_shrinks_toward_prior(spark):
    """m-estimate encoding must lie strictly between the raw category
    mean and the global prior (shrinkage direction), and never farther
    from the prior than the raw mean is."""
    enc = {r["o_orderpriority"]: r for r in feature_target_encode(spark, SF_DIR).collect()}
    o = load_table(spark, SF_DIR, "orders")
    raw = {
        r["o_orderpriority"]: r["m"]
        for r in o.groupBy("o_orderpriority")
        .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias("m"))
        .collect()
    }
    for cat, r in enc.items():
        prior, e, m = r["prior_mean"], r["encoded"], raw[cat]
        assert abs(e - prior) <= abs(m - prior) + 1e-6, (cat, e, m, prior)
        # and e is on the same side of the prior as the raw mean
        assert (e - prior) * (m - prior) >= 0 or abs(m - prior) < 1e-6, (cat, e, m, prior)


def _write_events(spark, tmp_path, rows):
    """Materialize a synthetic events.parquet so table-reading operators
    can be driven on constructed data."""
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_linear_trend_recovers_exact_line(spark, tmp_path):
    """On value = (2*x + 500)/100 with x = seconds since the origin, OLS
    must recover slope exactly 2 cents/s = 1728 value-units/day and
    intercept exactly 5.0 — the closed form is exact on exact data."""
    import datetime

    from realtime_change_data_capture_streaming_spark.operators.quality import (
        events_linear_trend,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=i * 60), 1, "view", (2 * i * 60 + 500) / 100.0, "{}")
        for i in range(200)
    ]
    out = events_linear_trend(spark, _write_events(spark, tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 200
    assert r["slope_per_day"] == round(2.0 * 86400 / 100, 6), r
    assert r["intercept"] == 5.0, r


def test_winsorize_clip_fractions_and_band(spark, tmp_path):
    """On 1000 distinct values 0.01..10.00, the P1/P99 bounds must sit at
    ranks 10 and 990 of the total order, ~1% clips on each side, and the
    winsorized sum must equal the hand-computed clamped sum exactly."""
    import datetime

    from realtime_change_data_capture_streaming_spark.operators.quality import (
        events_winsorize_value,
    )

    t0 = datetime.datetime(2024, 1, 5)
    vals = [round((i + 1) * 0.01, 2) for i in range(1000)]
    rows = [
        (i, t0 + datetime.timedelta(seconds=i), i % 7, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    out = events_winsorize_value(spark, _write_events(spark, tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    # rank index floor((n-1)*q)+1: lo = floor(999*.01)+1 = 10 -> 0.10
    assert r["p01"] == 0.10 and r["p99"] == 9.90, r
    assert r["n_clipped_lo"] == 9 and r["n_clipped_hi"] == 10, r
    expect = round(sum(min(max(v, 0.10), 9.90) for v in vals), 2)
    assert round(r["sum_winsorized"], 2) == expect, (r["sum_winsorized"], expect)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_EV = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 3 * 86400 - 1)),  # (user, sec offset)
    min_size=1,
    max_size=40,
)


@given(rows=_EV)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_interval_overlap_matches_bruteforce(spark, rows):
    """Banded interval overlap vs the naive O(n^2) definition: per day,
    the pair count over per-user [min ts, max ts] activity intervals."""
    import datetime
    import tempfile

    from realtime_change_data_capture_streaming_spark.operators.quality import (
        join_interval_overlap_daily,
    )

    t0 = datetime.datetime(2024, 1, 10)
    ev = [
        (i, t0 + datetime.timedelta(seconds=s), u, "view", 1.0, "{}")
        for i, (u, s) in enumerate(rows)
    ]
    tmp = tempfile.mkdtemp(prefix="ovl_prop_")
    out = {
        r["day"]: r
        for r in join_interval_overlap_daily(spark, _write_events(spark, tmp, ev)).collect()
    }

    # brute force: per (day, user) interval, then all-pairs overlap test
    iv: dict = {}
    for _, ts, u, *_ in ev:
        d = ts.date()
        lo, hi = iv.get((d, u), (ts, ts))
        iv[(d, u)] = (min(lo, ts), max(hi, ts))
    days = sorted({d for (d, _) in iv})
    for d in days:
        users = [(u, *iv[(d, u)]) for (dd, u) in iv if dd == d]
        pairs = sum(
            1
            for i in range(len(users))
            for j in range(i + 1, len(users))
            if users[i][1] <= users[j][2] and users[j][1] <= users[i][2]
        )
        assert out[d]["n_intervals"] == len(users), (d, out[d])
        assert out[d]["n_overlap_pairs"] == pairs, (d, out[d], pairs)
    assert set(out) == set(days)


_ORDERS = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 9)),  # (orderkey, partkey)
    min_size=1,
    max_size=60,
)


@given(rows=_ORDERS)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_basket_and_triangles_match_bruteforce(spark, rows):
    """Co-purchase pair counts and support>=2 triangle participation vs
    naive set arithmetic on random (order, part) incidences — pins the
    distinct-first rule, the (lo, hi) orientation, and each-triangle-once
    enumeration."""
    import itertools
    import tempfile

    from realtime_change_data_capture_streaming_spark.operators.graph import (
        _TRI_SUPPORT,
        graph_triangle_counts,
    )
    from realtime_change_data_capture_streaming_spark.operators.stats import basket_part_pairs

    tmp = tempfile.mkdtemp(prefix="basket_prop_")
    spark.createDataFrame(
        rows, "l_orderkey bigint, l_partkey bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")

    # brute force
    orders: dict = {}
    for ok, pk in set(rows):
        orders.setdefault(ok, set()).add(pk)
    pair_counts: dict = {}
    for parts in orders.values():
        for a, b in itertools.combinations(sorted(parts), 2):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + 1
    edges = {p for p, n in pair_counts.items() if n >= _TRI_SUPPORT}
    tri_part: dict = {}
    nodes = sorted({x for p in edges for x in p})
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in edges and (b, c) in edges and (a, c) in edges:
            for x in (a, b, c):
                tri_part[x] = tri_part.get(x, 0) + 1

    got_pairs = {
        (r["part_a"], r["part_b"]): r["n_orders"] for r in basket_part_pairs(spark, tmp).collect()
    }
    top = sorted(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got_pairs == dict(top), (got_pairs, dict(top))

    got_tri = {r["part"]: r["n_triangles"] for r in graph_triangle_counts(spark, tmp).collect()}
    assert got_tri == tri_part, (got_tri, tri_part)


def test_twap_exact_on_constructed_timeline(spark, monkeypatch):
    """TWAP is the LOCF integral: [v=10 @0s, v=20 @10s, v=0 @40s] ->
    (10*10 + 20*30) / 40 = 17.5; a single-event user reports its raw
    value; a plain average would say 10 - the burst overweighting TWAP
    exists to avoid."""
    import datetime as dt

    import realtime_change_data_capture_streaming_spark.operators.quality as q

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("a", t0, 1, 10.0),
        ("a", t0 + dt.timedelta(seconds=10), 2, 20.0),
        ("a", t0 + dt.timedelta(seconds=40), 3, 0.0),
        ("b", t0, 1, 7.25),
    ]
    d = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long, value double"
    )
    monkeypatch.setattr(q, "load_table", lambda s_, sf_, n_: d)
    got = {r["user_id"]: r for r in q.events_time_weighted_avg(spark, "x").collect()}
    assert got["a"]["twap_value"] == 17.5
    assert got["a"]["span_us"] == 40_000_000
    assert got["a"]["n_events"] == 3
    assert got["b"]["twap_value"] == 7.25
    assert got["b"]["span_us"] == 0


def test_cusum_closed_form_matches_recursion(spark, monkeypatch):
    """The windowed closed form (S_t = C_t - min(0, running-min C)) must
    equal the textbook Page recursion S_t = max(0, S_{t-1} + d_t) run
    sequentially in Python — including alarm counts, first-alarm days and
    max statistics per direction — on a series with an injected sustained
    shift (which must alarm) and a quiet control series."""
    import collections
    import datetime as dt
    import math
    import random

    import realtime_change_data_capture_streaming_spark.operators.quality as q

    rng = random.Random(7)
    t0 = dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    for typ, shift_day in (("m1", 1), ("m2", None)):
        for day in range(3):
            for i in range(40):
                v = rng.uniform(50.0, 150.0)
                if shift_day is not None and day == shift_day and i >= 20:
                    v += 400.0  # sustained mean shift -> must alarm
                rows.append(
                    (typ, t0 + dt.timedelta(days=day, seconds=i), eid, round(v, 2))
                )
                eid += 1
    d = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    )
    monkeypatch.setattr(q, "load_table", lambda s_, sf_, n_: d)
    got = {
        r["event_type"]: r.asDict()
        for r in q.events_cusum_changepoint(spark, "x").collect()
    }

    H = q._CUSUM_H
    bytype = collections.defaultdict(list)
    for typ, ts, e, v in rows:
        bytype[typ].append((ts, e, math.floor(v * 100)))
    for typ, series in bytype.items():
        ksum, n = sum(vc for _, _, vc in series), len(series)
        k = (abs(ksum) // n) * (1 if ksum >= 0 else -1)  # truncating DIV
        byday = collections.defaultdict(list)
        for ts, e, vc in sorted(series):
            byday[ts.date()].append(vc - k)
        max_up = max_dn = 0
        up_alarms = dn_alarms = 0
        first_up = first_dn = None
        for day in sorted(byday):
            s_up = s_dn = 0
            for dd in byday[day]:
                s_up = max(0, s_up + dd)
                s_dn = max(0, s_dn - dd)
                max_up, max_dn = max(max_up, s_up), max(max_dn, s_dn)
                if s_up > H:
                    up_alarms += 1
                    first_up = first_up or day
                if s_dn > H:
                    dn_alarms += 1
                    first_dn = first_dn or day
        g = got[typ]
        assert g["n_events"] == n and g["n_days"] == len(byday)
        assert g["k_cents"] == k
        assert g["max_up_stat"] == max_up and g["max_dn_stat"] == max_dn
        assert g["up_alarms"] == up_alarms and g["dn_alarms"] == dn_alarms
        assert g["first_up_alarm_day"] == first_up
        assert g["first_dn_alarm_day"] == first_dn
    # the shifted series must actually have alarmed upward, the control not
    assert got["m1"]["up_alarms"] > 0
    assert got["m1"]["first_up_alarm_day"] == (t0 + dt.timedelta(days=1)).date()


def test_curation_funnel_is_monotone_and_consistent(spark):
    """Each funnel stage can only shrink the survivor set, stages must
    agree with the standalone operators they compose, and tokens_kept
    must not exceed the tokenized total."""
    from realtime_change_data_capture_streaming_spark.llm_ops.curation import (
        curation_pipeline_summary,
        curation_quality_filter,
    )

    sf = "/root/testdata/sf0.01"
    rows = curation_pipeline_summary(spark, sf).collect()
    assert rows
    for r in rows:
        assert (
            r["n_raw"] >= r["n_tokenized"] >= r["n_quality"] >= r["n_unique"] >= r["n_span_clean"]
        ), r
        assert r["tokens_kept"] >= 0
    # stage 3 must equal the standalone quality filter per lang
    q = curation_quality_filter(spark, sf).groupBy("lang").count().collect()
    standalone = {r["lang"]: r["count"] for r in q}
    composite = {r["lang"]: r["n_quality"] for r in rows}
    assert composite == standalone


def test_logit_training_beats_majority_class(spark):
    """The trained quality classifier must actually LEARN: train-set
    accuracy strictly above the majority-class rate, predictions in
    BOTH classes, and the published weight table is exactly what
    inference consumes (train/serve share _train_quality_logit)."""
    from realtime_change_data_capture_streaming_spark.llm_ops.features import (
        quality_logit_scores,
        quality_logit_train,
    )

    sf = "/root/testdata/sf0.01"
    w = {r["feature_bucket"]: r["w_fp"] for r in quality_logit_train(spark, sf).collect()}
    assert len(w) == 66 and set(w) == set(range(-2, 64))
    rows = quality_logit_scores(spark, sf).collect()
    n = len(rows)
    assert n > 0
    pos = sum(1 for r in rows if r["label_keep"])
    majority = max(pos, n - pos) / n
    acc = sum(1 for r in rows if r["correct"]) / n
    assert acc > majority + 0.1, f"acc {acc} vs majority {majority}: model did not learn"
    preds = {r["keep_pred"] for r in rows}
    assert preds == {True, False}, "degenerate all-one-class predictions"
    # inference consumes the trained weights: recompute one doc's logit
    # by hand from the published table
    from pyspark.sql import functions as F

    from realtime_change_data_capture_streaming_spark.llm_ops.features import _logit_features

    contrib, _, _ = _logit_features(spark, sf)
    doc = rows[0]["doc_id"]
    feats = contrib.filter(F.col("doc_id") == doc).collect()
    manual = sum(w[r["bucket"]] * r["x"] for r in feats)
    assert manual == rows[0]["logit_fp"]


def test_logit_floor_division_primitives_cross_engine():
    """The exact-arithmetic contracts the trainer's oracle relies on:
    >> is arithmetic (floor) shift in BOTH engines, while DuckDB's //
    TRUNCATES toward zero on negatives (Python's // floors) — which is
    why the weight update uses the positive-mod exact-divisibility
    formula instead of a bare quotient."""
    import duckdb

    con = duckdb.connect()
    assert con.execute("SELECT CAST(-1025 AS BIGINT) >> 10").fetchone()[0] == -2
    assert con.execute("SELECT -7 >> 1").fetchone()[0] == -4
    assert con.execute("SELECT CAST(-7 AS BIGINT) // 4").fetchone()[0] == -1  # trunc
    assert con.execute("SELECT CAST(-7 AS HUGEINT) // 3").fetchone()[0] == -2  # trunc
    assert -7 // 4 == -2 and -7 // 3 == -3  # python floors
    # the posmod formula sidesteps both: exactly-divisible numerator
    a, nn = -7, 4
    assert (a - ((a % nn) + nn) % nn) // nn == a // nn == -2  # python floor
    assert con.execute(f"SELECT ({a} - ((({a} % {nn}) + {nn}) % {nn})) // {nn}").fetchone()[0] == -2
