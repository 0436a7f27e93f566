"""Event-time analytics over the ``events`` fixture — the batch mirrors of
the streaming operators (tumbling/sliding/session windows, JSON props).

These run identically as Structured Streaming queries (same expressions
over ``readStream``); the streaming wrappers live in
``realtime_change_data_capture_streaming_spark.streaming``.  Batch variants exist so the driver's DuckDB
oracle can verify the window semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.operators._util import dsum
from realtime_change_data_capture_streaming_spark.sources.tables import load_table


def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows: count + exact value sum per event type.
    ``window()`` is the same expression streaming uses; project start/end
    so the oracle can reproduce with date_trunc."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


TUMBLING_SQL = """
SELECT DATE_TRUNC('hour', ts) AS win_start,
       DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR AS win_end,
       event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h size, 30 min slide): each event lands in exactly
    2 windows.  Spark assigns via the window() expression (an Expand node —
    cost scales with size/slide ratio, fine at 2x)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("win_start"), "n_events")
    )


SLIDING_SQL = """
WITH assigned AS (
  SELECT ts, DATE_TRUNC('hour', ts) + CASE WHEN EXTRACT(MINUTE FROM ts) >= 30
           THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS win_start
  FROM events
  UNION ALL
  SELECT ts, DATE_TRUNC('hour', ts) + CASE WHEN EXTRACT(MINUTE FROM ts) >= 30
           THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END - INTERVAL 30 MINUTE
  FROM events
)
SELECT win_start, COUNT(*) AS n_events FROM assigned GROUP BY win_start
"""


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): sessions split on >10 min
    inactivity per user.  Same semantics as streaming session_window(ts,
    '10 minutes'); expressed with lag + cumulative sum so the oracle can
    verify exactly.  One shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsess = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # exact integer microseconds on both engines — no float/truncation
    # disagreement at the 10-minute boundary
    marked = ev.withColumn(
        "new_session",
        (
            F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts")), 1, 0).over(w)
            > 600_000_000
        ).cast("int"),
    ).withColumn("session_no", F.sum("new_session").over(wsess))
    return (
        marked.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.col("session_no").cast("bigint").alias("session_no"),
            "session_start",
            "session_end",
            "n_events",
        )
    )


SESSION_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts), 1, 0) OVER
              (PARTITION BY user_id ORDER BY ts, event_id) > 600000000 THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM marked
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       MIN(ts) AS session_start, MAX(ts) AS session_end, COUNT(*) AS n_events
FROM numbered GROUP BY user_id, session_no
"""


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the props column (get_json_object path) + agg.
    JSON parsing is JVM-side — no Python in the row path."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


JSON_PROPS_SQL = """
SELECT event_type,
       COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""


def events_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup, latest-wins by (ts, event_id) — the batch shape of the
    CDC apply-changes reduction (max_by hash agg, no window sort)."""
    ev = load_table(spark, sf_dir, "events")
    payload = F.struct("ts", "event_id", "event_type", "value")
    return (
        ev.groupBy("user_id")
        .agg(F.max_by(payload, F.struct("ts", "event_id")).alias("last"))
        .select(
            "user_id",
            F.col("last.ts").alias("last_ts"),
            F.col("last.event_id").alias("last_event_id"),
            F.col("last.event_type").alias("last_event_type"),
        )
    )


DEDUP_LATEST_SQL = """
SELECT user_id, ts AS last_ts, event_id AS last_event_id, event_type AS last_event_type
FROM (
  SELECT user_id, ts, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def events_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel view -> click -> purchase: users reaching each
    stage, where a stage only counts if it happens AFTER the user's entry
    into the previous stage (the product-analytics funnel semantic, not
    three independent filters).

    Three aggregates + two broadcast-able joins on user_id — each event row
    is read once per stage; no window over the full event stream."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase")))
    )


FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1
)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_click,
       (SELECT COUNT(*) FROM p) AS n_purchase
"""


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted per week-offset of later activity — the cohort matrix in long
    form.  Week arithmetic is exact (date_trunc to Mondays, day diffs are
    multiples of 7), so the oracle matches bit-for-bit.

    Two aggregates + one join; the cohort side is one row per user."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select("user_id", F.date_trunc("week", F.col("ts")).alias("week")).distinct()
    return (
        active.join(first, "user_id")
        .withColumn(
            "week_offset",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("bigint"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


COHORT_SQL = """
WITH first AS (
  SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort_week FROM events GROUP BY 1
), active AS (
  SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS week FROM events
)
SELECT f.cohort_week,
       CAST(DATEDIFF('day', f.cohort_week, a.week) / 7 AS BIGINT) AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM active a JOIN first f ON f.user_id = a.user_id
GROUP BY 1, 2
"""


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (bin width 10): count + exact sum per
    bin.  Fixed bounds keep the bin function a pure per-row expression —
    no global min/max pass, no scalar subquery — so it pipelines into the
    scan at any scale; floor(value/10) is the identical IEEE double op on
    both engines."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("bin", F.floor(F.col("value") / 10).cast("bigint"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
    )


HISTOGRAM_SQL = """
SELECT CAST(FLOOR(value / 10) AS BIGINT) AS bin, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1
"""


def events_user_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user anomaly detection: the single most extreme event by
    z-score against that user's own value distribution — the per-entity
    outlier scan of product analytics.

    Reproducible-statistics discipline: a float mean/stddev depends on
    summation order, so the moments are computed on exact integer cents
    (``decimal(18,2)*100`` — no fp anywhere in the aggregation) and the
    z-score collapses to ONE double division over integer terms:
    ``z = (x*n - s) / sqrt(n*ss - s^2)`` — algebraically (x-mean)/std_pop
    with every input exact, hence hash-identical on any engine or
    partitioning.  Integer headroom: |cents| < 2^17 here, so n*ss fits a
    bigint up to ~2^29 events/user; beyond that, compute in decimal(38,0).
    One shuffle on user_id (window moments + ranking share it)."""
    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    w = Window.partitionBy("user_id")
    d = (
        ev.select("user_id", "event_id", cents.alias("cents"))
        .withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn("s", F.sum("cents").over(w))
        .withColumn("ss", F.sum(F.col("cents") * F.col("cents")).over(w))
        .filter((F.col("n") >= 30) & (F.col("n") * F.col("ss") - F.col("s") * F.col("s") > 0))
        .withColumn(
            "z",
            (F.col("cents") * F.col("n") - F.col("s")).cast("double")
            / F.sqrt((F.col("n") * F.col("ss") - F.col("s") * F.col("s")).cast("double")),
        )
    )
    wr = Window.partitionBy("user_id").orderBy(F.abs(F.col("z")).desc(), F.col("event_id"))
    return (
        d.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select("user_id", "event_id", "cents", "z")
    )


OUTLIERS_SQL = """
WITH m AS (
  SELECT user_id, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         COUNT(*) OVER (PARTITION BY user_id) AS n,
         SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER (PARTITION BY user_id) AS s,
         SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER (PARTITION BY user_id) AS ss
  FROM events
), z AS (
  SELECT user_id, event_id, cents,
         CAST(cents * n - s AS DOUBLE) / SQRT(CAST(n * ss - s * s AS DOUBLE)) AS z
  FROM m
  WHERE n >= 30 AND n * ss - s * s > 0
)
SELECT user_id, event_id, cents, z FROM (
  SELECT user_id, event_id, cents, z,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ABS(z) DESC, event_id) AS rk
  FROM z
) WHERE rk = 1
"""


def events_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence mining: the row-normalized Markov transition matrix
    of event types (view->click, click->purchase, ...) over each user's
    time-ordered stream.

    One window pass (lead over user_id) + one hash agg — the shuffle key
    is user_id, so at 100 TB this is a single exchange over the event log
    and the 5x5 output is driver-trivial.  The transition probability is
    one double division of two exact bigints, hence hash-identical on any
    engine."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select("user_id", "ts", "event_id", "event_type").withColumn(
        "next_type", F.lead("event_type").over(w)
    )
    counts = (
        pairs.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    wfrom = Window.partitionBy("from_type")
    return counts.withColumn(
        "p_transition",
        F.col("n_transitions").cast("double") / F.sum("n_transitions").over(wfrom),
    )


TRANSITION_SQL = """
WITH pairs AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
), counts AS (
  SELECT from_type, to_type, COUNT(*) AS n_transitions
  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n_transitions,
       CAST(n_transitions AS DOUBLE) / SUM(n_transitions) OVER (PARTITION BY from_type)
         AS p_transition
FROM counts
"""


def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling: per-user hourly grid with
    last-observation-carried-forward fill over the gaps — the gap-fill
    operator of time-series engines, as a composition of built-ins.

    Plan shape (ONE exchange): rather than joining a generated spine back
    to the observations — which forces co-partitioning exchanges on
    (user_id, slot) for both join sides — each observation emits its own
    covered slot range directly: ``lead(slot)`` names the next observation
    and ``explode(sequence(slot, next-1h))`` generates the carried-forward
    rows.  The up-front user_id partitioning then satisfies the slot
    reduction, the lead window, and the final roll-up, so nothing
    downstream reshuffles; generated volume is users x horizon, not
    events.  Values are exact integer cents end-to-end; the output is the
    per-user roll-up (slot/gap counts + exact filled sum) so the check
    stays row-bounded at any horizon."""
    ev = load_table(spark, sf_dir, "events")
    return gapfill_locf_rollup(ev)


def gapfill_locf_rollup(ev: DataFrame) -> DataFrame:
    """The gap-fill core over any (user_id, ts, event_id, value) frame —
    factored out so the property test can drive constructed series through
    the exact production plan (see tests/test_gapfill_property.py)."""
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    slot = F.date_trunc("hour", F.col("ts"))
    # keyed repartition WITHOUT a pinned count: REPARTITION_BY_NUM blocks
    # AQE partition coalescing, so the old defaultParallelism constant
    # forced 32 near-empty partitions on a 2 MB local input (the r16
    # 8-vs-32 inverse-scaling reading) while being nothing but a local
    # tuning at cluster scale.  The column form plans the same single
    # exchange (hash on user_id, satisfying the slot agg, the lead
    # window, and the roll-up below) at shuffle.partitions width and
    # lets AQE coalesce it to the data's actual size — the
    # scale-adaptive shape, governed by conf in production.
    base = ev.select(
        "user_id", slot.alias("slot"), cents.alias("cents"), "ts", "event_id"
    ).repartition("user_id")
    obs = base.groupBy("user_id", "slot").agg(
        F.max_by("cents", F.struct("ts", "event_id")).alias("cents")
    )
    w = Window.partitionBy("user_id").orderBy("slot")
    segs = obs.withColumn("next_slot", F.lead("slot").over(w))
    filled = segs.select(
        "user_id",
        "cents",
        "slot",
        F.explode(
            F.sequence(
                "slot",
                F.coalesce(
                    F.col("next_slot") - F.expr("interval 1 hour"), F.col("slot")
                ),
                F.expr("interval 1 hour"),
            )
        ).alias("fslot"),
    )
    return filled.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_slots"),
        F.sum((F.col("fslot") > F.col("slot")).cast("bigint")).alias("n_gap_slots"),
        F.sum("cents").alias("sum_filled_cents"),
    )


GAPFILL_SQL = """
WITH obs AS (
  SELECT user_id, slot, cents FROM (
    SELECT user_id, DATE_TRUNC('hour', ts) AS slot,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           ROW_NUMBER() OVER (PARTITION BY user_id, DATE_TRUNC('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
), spine AS (
  SELECT user_id, UNNEST(generate_series(MIN(slot), MAX(slot), INTERVAL 1 HOUR)) AS slot
  FROM obs GROUP BY user_id
), filled AS (
  SELECT s.user_id, o.cents,
         LAST_VALUE(o.cents IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.slot
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fill
  FROM spine s LEFT JOIN obs o ON o.user_id = s.user_id AND o.slot = s.slot
)
SELECT user_id, COUNT(*) AS n_slots,
       CAST(SUM(CASE WHEN cents IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_slots,
       CAST(SUM(fill) AS BIGINT) AS sum_filled_cents
FROM filled GROUP BY user_id
"""


#: query pattern for the subsequence search: a fixed 8-step ramp in cents
_PATTERN_CENTS = [1000 + 450 * i for i in range(8)]


def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series subsequence similarity search (the UCR-suite shape,
    cf. "Time Series Similarity Search for Streaming Data", EDBT 2019):
    slide a length-8 window over each user's value sequence and rank
    windows by squared Euclidean distance to a fixed query pattern,
    returning the global top-20 matches.

    Plan: windows materialize as lead() arrays over the per-user ordering
    (one key shuffle shared with the ordering), the distance is an exact
    BIGINT (integer cents, integer squares — no float anywhere), and the
    global top-k plans as TakeOrderedAndProject (per-partition heaps, no
    full sort).  At 100 TB the pattern is a broadcast literal and the scan
    is one pass."""
    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = ev.select("user_id", "ts", "event_id", cents.alias("c0"))
    for i in range(1, len(_PATTERN_CENTS)):
        base = base.withColumn(f"c{i}", F.lead("c0", i).over(w))
    complete = base.filter(F.col(f"c{len(_PATTERN_CENTS) - 1}").isNotNull())
    dist = sum(
        (F.col(f"c{i}") - F.lit(p)) * (F.col(f"c{i}") - F.lit(p))
        for i, p in enumerate(_PATTERN_CENTS)
    )
    scored = complete.select(
        "user_id", "event_id", dist.alias("dist_sq_cents")
    )
    return scored.orderBy(
        F.asc("dist_sq_cents"), F.asc("user_id"), F.asc("event_id")
    ).limit(20)


_PATTERN_DIST_SQL = " + ".join(
    f"(c{i} - {p}) * (c{i} - {p})" for i, p in enumerate(_PATTERN_CENTS)
)
_PATTERN_LEADS_SQL = ",\n         ".join(
    f"LEAD(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT), {i}) OVER "
    f"(PARTITION BY user_id ORDER BY ts, event_id) AS c{i}"
    for i in range(1, len(_PATTERN_CENTS))
)

PATTERN_MATCH_SQL = f"""
WITH leads AS (
  SELECT user_id, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c0,
         {_PATTERN_LEADS_SQL}
  FROM events
)
SELECT user_id, event_id, CAST({_PATTERN_DIST_SQL} AS BIGINT) AS dist_sq_cents
FROM leads
WHERE c{len(_PATTERN_CENTS) - 1} IS NOT NULL
ORDER BY dist_sq_cents ASC, user_id ASC, event_id ASC
LIMIT 20
"""




_PATH_TOP = 15


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis — the most common 3-step event sequences across user
    streams (the "what do users do next" product query).  One lead()
    pass per step over the per-user (ts, event_id) order — no self-join
    against the stream — then a hash agg on the bounded sequence space
    and a global top-k via TakeOrderedAndProject.  Session boundaries
    (user change) fall out of the window partitioning: lead() returns
    NULL at the end of each user's stream and those partial paths are
    dropped."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        e.select(
            F.col("event_type").alias("s1"),
            F.lead("event_type", 1).over(w).alias("s2"),
            F.lead("event_type", 2).over(w).alias("s3"),
        )
        .where(F.col("s2").isNotNull() & F.col("s3").isNotNull())
        .groupBy("s1", "s2", "s3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_paths"))
    )
    return paths.orderBy(F.desc("n_paths"), "s1", "s2", "s3").limit(_PATH_TOP)


TOP_PATHS_SQL = f"""
WITH steps AS (
  SELECT event_type AS s1,
         LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s2,
         LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s3
  FROM events
)
SELECT s1, s2, s3, COUNT(*) AS n_paths
FROM steps WHERE s2 IS NOT NULL AND s3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n_paths DESC, s1, s2, s3
LIMIT {_PATH_TOP}
"""


_MAD_K = 3.0  # outlier threshold in robust sigmas
_MAD_SIGMA = 1.4826  # MAD -> sigma consistency constant (normal)


def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly counts per event_type by MEDIAN absolute deviation
    — the heavy-tail-safe complement to the z-score scan (mean/std are
    themselves dragged by the outliers they are supposed to find; median
    and MAD have a 50% breakdown point).

    Engine-exactness: both medians are RANK-BASED on integer cents with
    a deterministic total order (value, event_id) — nearest-rank at
    ceil(n/2), no interpolation, no float statistics anywhere until the
    one threshold comparison, which is done in EXACT integer arithmetic:
    |x - med| > K * SIGMA * MAD is evaluated as
    |x - med| * 10000 > K_SIGMA_SCALED * MAD with both sides bigint
    (K*SIGMA = 4.4478 scales to the integer 44478 at 1e4).  Two windows
    over the same event_type partitioning — one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    wt = Window.partitionBy("event_type")
    wr = Window.partitionBy("event_type").orderBy("cents", "event_id")
    d = (
        ev.select("event_type", "event_id", cents.alias("cents"))
        .withColumn("n", F.count(F.lit(1)).over(wt))
        .withColumn("rk", F.row_number().over(wr))
    )
    med = d.filter(F.col("rk") == F.ceil(F.col("n") / 2)).select(
        "event_type", F.col("cents").alias("med")
    )
    dev = d.join(med, "event_type").withColumn("adev", F.abs(F.col("cents") - F.col("med")))
    wd = Window.partitionBy("event_type").orderBy("adev", "event_id")
    dev = dev.withColumn("drk", F.row_number().over(wd))
    mad = dev.filter(F.col("drk") == F.ceil(F.col("n") / 2)).select(
        "event_type", F.col("adev").alias("mad")
    )
    k_scaled = int(round(_MAD_K * _MAD_SIGMA * 10000))  # 44478
    out = (
        dev.join(mad, "event_type")
        .withColumn("is_out", F.col("adev") * 10000 > F.lit(k_scaled) * F.col("mad"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.when(F.col("is_out"), 1).otherwise(0)).cast("bigint").alias("n_outliers"),
            F.max(F.when(F.col("is_out"), F.col("adev"))).cast("bigint").alias("max_out_dev_cents"),
        )
    )
    return out.join(med, "event_type").join(mad, "event_type").select(
        "event_type",
        "n_events",
        (F.col("med").cast("double") / 100).alias("median_value"),
        (F.col("mad").cast("double") / 100).alias("mad_value"),
        "n_outliers",
        F.coalesce("max_out_dev_cents", F.lit(0)).cast("bigint").alias("max_out_dev_cents"),
    )


_MAD_SQL = f"""
WITH d AS (
  SELECT event_type, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT), event_id) AS rk
  FROM events
), med AS (
  SELECT event_type, cents AS med FROM d WHERE rk = CAST(CEIL(n / 2.0) AS BIGINT)
), dev AS (
  SELECT d.event_type, d.event_id, d.cents, d.n, ABS(d.cents - m.med) AS adev
  FROM d JOIN med m ON m.event_type = d.event_type
), devr AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY adev, event_id) AS drk FROM dev
), mad AS (
  SELECT event_type, adev AS mad FROM devr WHERE drk = CAST(CEIL(n / 2.0) AS BIGINT)
), flagged AS (
  SELECT dv.event_type, dv.n, dv.adev, (dv.adev * 10000 > {int(round(_MAD_K * _MAD_SIGMA * 10000))} * md.mad) AS is_out
  FROM dev dv JOIN mad md ON md.event_type = dv.event_type
)
SELECT f.event_type,
       CAST(MAX(f.n) AS BIGINT) AS n_events,
       CAST(MAX(m.med) AS DOUBLE) / 100 AS median_value,
       CAST(MAX(md.mad) AS DOUBLE) / 100 AS mad_value,
       CAST(SUM(CASE WHEN f.is_out THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(COALESCE(MAX(CASE WHEN f.is_out THEN f.adev END), 0) AS BIGINT) AS max_out_dev_cents
FROM flagged f
JOIN med m ON m.event_type = f.event_type
JOIN mad md ON md.event_type = f.event_type
GROUP BY 1
"""


def events_daily_user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting: active users, NEW users (first-ever
    activity that day), returning users, and the cumulative distinct
    user count — the DAU/new/returning panel.

    A running COUNT(DISTINCT) is not windowable directly; the standard
    re-expression is first-seen attribution: one (user -> min day)
    aggregate, new_users = count of first-seens per day, and the
    cumulative distinct count is the running SUM of new_users — exact,
    and every step a partial-agg-friendly hash agg plus one ordered
    window over day-cardinality rows (metadata-scale)."""
    e = load_table(spark, sf_dir, "events")
    d = e.select(F.to_date("ts").alias("day"), "user_id")
    # ONE scan computes both daily aggregates (a second scan joined inner
    # on day would also structurally diverge from the single-CTE oracle
    # on a hypothetical null day: inner joins don't match null = null)
    daily = d.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_active_users"),
    )
    first_seen = d.groupBy("user_id").agg(F.min("day").alias("day"))
    new_users = first_seen.groupBy("day").agg(F.count(F.lit(1)).alias("n_new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    out = (
        daily.join(new_users, "day", "left")
        .withColumn("n_new_users", F.coalesce("n_new_users", F.lit(0)))
        .withColumn("cum_users", F.sum("n_new_users").over(w))
    )
    return out.select(
        "day",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("n_active_users").cast("bigint").alias("n_active_users"),
        F.col("n_new_users").cast("bigint").alias("n_new_users"),
        (F.col("n_active_users") - F.col("n_new_users")).cast("bigint").alias("n_returning_users"),
        F.col("cum_users").cast("bigint").alias("cum_users"),
    )


_GROWTH_SQL = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, user_id FROM events
), daily AS (
  SELECT day, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_active_users
  FROM d GROUP BY 1
), first_seen AS (
  SELECT user_id, MIN(day) AS day FROM d GROUP BY 1
), new_users AS (
  SELECT day, COUNT(*) AS n_new_users FROM first_seen GROUP BY 1
)
SELECT daily.day,
       CAST(daily.n_events AS BIGINT) AS n_events,
       CAST(daily.n_active_users AS BIGINT) AS n_active_users,
       CAST(COALESCE(new_users.n_new_users, 0) AS BIGINT) AS n_new_users,
       CAST(daily.n_active_users - COALESCE(new_users.n_new_users, 0) AS BIGINT) AS n_returning_users,
       CAST(SUM(COALESCE(new_users.n_new_users, 0)) OVER (ORDER BY daily.day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
FROM daily LEFT JOIN new_users ON new_users.day = daily.day
"""


_DECAY_HALF_LIFE = 7.0  # days
_DECAY_NOW = "2024-02-01"  # fixed "as of" so the oracle can reproduce
_DECAY_FP = 1 << 20
_DECAY_MAX_D = 64
#: per-day-age weight 0.5^(d/half_life), PRE-SCALED by 2^20 and computed
#: Python-side once — both engines embed the identical literal, so no
#: pow()/exp() libm call ever runs at query time (the PSI discipline)
_DECAY_W = {d: (0.5 ** (d / _DECAY_HALF_LIFE)) * _DECAY_FP for d in range(_DECAY_MAX_D)}
_DECAY_TOP = 20


def events_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed engagement scoring: per user, the exponentially
    decayed sum of event values as of a fixed date (half-life 7 days) —
    the recency-weighted counter behind trending/engagement rankings,
    where yesterday's click outweighs last month's.

    Determinism: each row contributes floor(value * w[age]) where w[age]
    is the pre-scaled literal weight — ONE double multiply + floor per
    row, then exact bigint sums; ages beyond the weight table decay to
    zero.  Top-k via orderBy+limit."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    age = F.datediff(F.lit(_DECAY_NOW).cast("date"), F.col("ts").cast("date"))
    wmap = F.create_map(*[F.lit(v) for d in range(_DECAY_MAX_D) for v in (d, _DECAY_W[d])])
    contrib = F.floor(F.col("value") * F.coalesce(wmap[age], F.lit(0.0))).cast("bigint")
    raw = F.floor(F.col("value") * F.lit(float(_DECAY_FP))).cast("bigint")
    per_user = e.select("user_id", contrib.alias("c_fp"), raw.alias("r_fp")).groupBy(
        "user_id"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("c_fp").alias("dec_fp"),
        F.sum("r_fp").alias("raw_fp"),
    )
    return (
        per_user.orderBy(F.desc("dec_fp"), F.asc("user_id"))
        .limit(_DECAY_TOP)
        .select(
            "user_id",
            "n_events",
            (F.col("dec_fp").cast("double") / F.lit(float(_DECAY_FP))).alias("decayed_value"),
            (F.col("raw_fp").cast("double") / F.lit(float(_DECAY_FP))).alias("raw_value"),
        )
    )


_DECAY_VALUES = ", ".join(f"({d}, {_DECAY_W[d]!r})" for d in range(_DECAY_MAX_D))

_DECAY_SQL = f"""
WITH w(d, wt) AS (VALUES {_DECAY_VALUES}),
c AS (
  SELECT e.user_id,
         CAST(FLOOR(e.value * COALESCE(w.wt, 0.0)) AS BIGINT) AS c_fp,
         CAST(FLOOR(e.value * {float(_DECAY_FP)!r}) AS BIGINT) AS r_fp
  FROM events e
  LEFT JOIN w ON w.d = date_diff('day', CAST(e.ts AS DATE), DATE '{_DECAY_NOW}')
), per_user AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(c_fp) AS BIGINT) AS dec_fp, CAST(SUM(r_fp) AS BIGINT) AS raw_fp
  FROM c GROUP BY 1
)
SELECT user_id, n_events,
       CAST(dec_fp AS DOUBLE) / {float(_DECAY_FP)!r} AS decayed_value,
       CAST(raw_fp AS DOUBLE) / {float(_DECAY_FP)!r} AS raw_value
FROM per_user
ORDER BY dec_fp DESC, user_id ASC
LIMIT {_DECAY_TOP}
"""


_SEAS_FP = 1 << 20
_SEAS_TOP = 5


def events_seasonal_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal anomaly detection: per event type, the events deviating
    most from their HOUR-OF-DAY baseline — the detrend-then-rank shape
    (a spike at 3am is anomalous even if the same value at noon is
    normal), complementing the global MAD/z outlier operators.

    Determinism: values fold as floor(v * 2^20) integers (the TWAP
    discipline), so the seasonal sums are exact bigints; the residual
    v - mean is computed as the exact integer (v_fp*n - sum_fp) divided
    once by the exact double n*2^20 (correctly rounded, engine-
    identical).  Ranking is a window PARTITIONED by event type."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    vfp = F.floor(F.col("value") * F.lit(float(_SEAS_FP))).cast("bigint")
    hour = F.hour("ts")
    base = (
        e.select("event_type", hour.alias("hh"), vfp.alias("vfp"))
        .groupBy("event_type", "hh")
        .agg(F.sum("vfp").alias("s_fp"), F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    j = e.select("event_id", "event_type", hour.alias("hh"), vfp.alias("vfp")).join(
        F.broadcast(base), ["event_type", "hh"]
    )
    residual = (F.col("vfp") * F.col("n") - F.col("s_fp")).cast("double") / (
        F.col("n").cast("double") * F.lit(float(_SEAS_FP))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc(F.abs(F.col("residual"))), F.asc("event_id")
    )
    return (
        j.withColumn("residual", residual)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _SEAS_TOP)
        .select(
            "event_type",
            "event_id",
            F.col("hh").cast("bigint").alias("hour_of_day"),
            "residual",
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


_SEASONAL_SQL = f"""
WITH v AS (
  SELECT event_id, event_type, EXTRACT(hour FROM ts) AS hh,
         CAST(FLOOR(value * {_SEAS_FP}) AS BIGINT) AS vfp
  FROM events
), base AS (
  SELECT event_type, hh, CAST(SUM(vfp) AS BIGINT) AS s_fp, CAST(COUNT(*) AS BIGINT) AS n
  FROM v GROUP BY 1, 2
), r AS (
  SELECT v.event_type, v.event_id, v.hh,
         CAST(v.vfp * b.n - b.s_fp AS DOUBLE) / (CAST(b.n AS DOUBLE) * {_SEAS_FP}) AS residual
  FROM v JOIN base b USING (event_type, hh)
)
SELECT event_type, event_id, CAST(hh AS BIGINT) AS hour_of_day, residual,
       CAST(rk AS BIGINT) AS rk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ABS(residual) DESC, event_id ASC) AS rk
  FROM r
) WHERE rk <= {_SEAS_TOP}
"""


QUERIES = {
    "events_decayed_engagement": events_decayed_engagement,
    "events_seasonal_residual_topk": events_seasonal_residual_topk,
    "events_mad_outliers": events_mad_outliers,
    "events_daily_user_growth": events_daily_user_growth,
    "events_tumbling_hourly": events_tumbling_hourly,
    "events_pattern_match": events_pattern_match,
    "events_sliding_windows": events_sliding_windows,
    "events_sessionization": events_sessionization,
    "events_json_props": events_json_props,
    "events_dedup_latest": events_dedup_latest,
    "events_funnel_counts": events_funnel_counts,
    "events_cohort_retention": events_cohort_retention,
    "events_value_histogram": events_value_histogram,
    "events_user_value_outliers": events_user_value_outliers,
    "events_transition_counts": events_transition_counts,
    "events_gapfill_locf": events_gapfill_locf,
    "events_top_paths": events_top_paths,
}

ORACLE = {
    "events_decayed_engagement": _DECAY_SQL,
    "events_seasonal_residual_topk": _SEASONAL_SQL,
    "events_mad_outliers": _MAD_SQL,
    "events_daily_user_growth": _GROWTH_SQL,
    "events_tumbling_hourly": TUMBLING_SQL,
    "events_pattern_match": PATTERN_MATCH_SQL,
    "events_sliding_windows": SLIDING_SQL,
    "events_sessionization": SESSION_SQL,
    "events_json_props": JSON_PROPS_SQL,
    "events_dedup_latest": DEDUP_LATEST_SQL,
    "events_funnel_counts": FUNNEL_SQL,
    "events_cohort_retention": COHORT_SQL,
    "events_value_histogram": HISTOGRAM_SQL,
    "events_user_value_outliers": OUTLIERS_SQL,
    "events_transition_counts": TRANSITION_SQL,
    "events_gapfill_locf": GAPFILL_SQL,
    "events_top_paths": TOP_PATHS_SQL,
}
