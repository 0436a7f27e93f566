"""Data-quality + distribution-profiling surface for training pipelines.

A 100 TB ingestion pipeline runs declarative expectation suites (Delta
Live Tables / Great Expectations style) and distribution profiles as
first-class operators, not ad-hoc notebook queries.  Six operators:

- ``dq_expectations``: a rule suite (not-null, uniqueness, range,
  accepted values, time-window, referential integrity) evaluated in ONE
  scan of the fact table plus one anti-join branch for the referential
  rule — per-rule violation counts, never per-row materialization.
- ``lineitem_distribution_profile``: mean/variance/skewness/excess
  kurtosis/mode per group from EXACT integer power sums.  Quantities are
  shifted by the domain midpoint (central moments are shift-invariant)
  so the bigint sums stay far from overflow at any scale factor; the
  float combination of those exact sums is a fixed expression evaluated
  identically by any IEEE-754 engine (`sqrt`, not `pow`, for the 1.5
  power — `sqrt` is correctly rounded, `pow` is libm-dependent).
- ``events_ewma_value``: per-key exponentially weighted moving average
  as a deterministic left fold over the time-ordered value list.  EWMA
  is inherently sequential per key; the groupBy distributes across keys
  (the 100 TB unit of parallelism), and the fold itself is Spark
  ``aggregate`` / DuckDB ``list_reduce`` with the first element as seed
  — same order, same IEEE ops, bit-identical across engines.
- ``join_interval_overlap_daily``: interval-overlap self-join made
  scale-safe by TIME BANDING — intervals are keyed to their day bucket,
  so the quadratic comparison is bounded per band and the join is an
  equi-join on the band key with the overlap predicate as a residual
  filter (no cartesian).  Intervals here never span bands by
  construction; for multi-band intervals the standard extension is to
  emit each interval into every overlapped band and keep a pair only in
  the band containing ``greatest(a.start, b.start)`` — dedup-free.
- ``events_winsorize_value``: outlier clipping at exact rank-based
  P1/P99 — one window sort for the bounds, broadcast back onto the scan
  for the clip aggregate; clipped rows are counted and decimal-summed,
  never materialized.
- ``events_linear_trend``: per-segment OLS slope/intercept from exact
  DECIMAL(38,0) sums of origin-shifted seconds x integer cents; the
  only float work is the final closed-form division.

Reference parity: the reference has no analytics operators
(``/root/reference/README.md:29-32`` limits scope to the CDC layer);
these extend the §2.5 training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.sources.tables import load_table

# ---------------------------------------------------------------- dq rules

_PRICE_LO, _PRICE_HI = 0.0, 400_000.0
_DATE_LO, _DATE_HI = "1995-01-01", "2001-01-01"
_ACCEPTED_STATUS = ("O", "F")


def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite over ``orders``: one scan computes five rule
    counters in a single aggregate (violations surface as counts, the
    table is never re-scanned per rule); the referential rule is a
    broadcast-eligible LEFT ANTI join branch.  Output: one row per rule
    with ``violations`` and ``n_rows``."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def viol(cond) -> F.Column:
        return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).cast("bigint")

    agg = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        viol(F.col("o_custkey").isNull()).alias("not_null_custkey"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).cast("bigint").alias(
            "unique_orderkey"
        ),
        viol(
            ~F.col("o_totalprice").between(F.lit(_PRICE_LO), F.lit(_PRICE_HI))
        ).alias("totalprice_in_range"),
        viol(~F.col("o_orderstatus").isin(*_ACCEPTED_STATUS)).alias("status_accepted"),
        viol(
            (F.col("o_orderdate") < F.lit(_DATE_LO).cast("timestamp"))
            | (F.col("o_orderdate") >= F.lit(_DATE_HI).cast("timestamp"))
        ).alias("orderdate_in_window"),
    )
    rules = agg.select(
        F.explode(
            F.array(
                *(
                    F.struct(
                        F.lit(r).alias("rule"),
                        F.col(r).alias("violations"),
                        F.col("n_rows").alias("n_rows"),
                    )
                    for r in (
                        "not_null_custkey",
                        "unique_orderkey",
                        "totalprice_in_range",
                        "status_accepted",
                        "orderdate_in_window",
                    )
                )
            )
        ).alias("r")
    ).select("r.rule", "r.violations", "r.n_rows")

    # referential branch: anti-join count + total via scalar broadcast
    anti = (
        o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
        .crossJoin(F.broadcast(o.agg(F.count(F.lit(1)).alias("n_rows"))))
        .select(F.lit("ref_custkey_exists").alias("rule"), "violations", "n_rows")
    )
    return rules.unionByName(anti)


_DQ_SQL = f"""
WITH base AS (
  SELECT COUNT(*) AS n_rows,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS not_null_custkey,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS unique_orderkey,
         CAST(SUM(CASE WHEN o_totalprice NOT BETWEEN {_PRICE_LO} AND {_PRICE_HI}
                       THEN 1 ELSE 0 END) AS BIGINT) AS totalprice_in_range,
         CAST(SUM(CASE WHEN o_orderstatus NOT IN ({", ".join(repr(s) for s in _ACCEPTED_STATUS)})
                       THEN 1 ELSE 0 END) AS BIGINT) AS status_accepted,
         CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '{_DATE_LO}'
                         OR o_orderdate >= TIMESTAMP '{_DATE_HI}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS orderdate_in_window
  FROM orders
)
SELECT 'not_null_custkey' AS rule, not_null_custkey AS violations, n_rows FROM base
UNION ALL SELECT 'unique_orderkey', unique_orderkey, n_rows FROM base
UNION ALL SELECT 'totalprice_in_range', totalprice_in_range, n_rows FROM base
UNION ALL SELECT 'status_accepted', status_accepted, n_rows FROM base
UNION ALL SELECT 'orderdate_in_window', orderdate_in_window, n_rows FROM base
UNION ALL
SELECT 'ref_custkey_exists',
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
            AS BIGINT),
       (SELECT COUNT(*) FROM orders)
"""

# ------------------------------------------------------- moments profile

_SHIFT = 25  # l_quantity domain is 1..50; shifting by the midpoint keeps
# |y| <= 25 so SUM(y^4) <= 25^4 * n — exact in bigint to trillions of rows


def lineitem_distribution_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag distribution profile: mean/variance/skewness/excess
    kurtosis from exact bigint power sums (one hash agg, partial-agg
    safe), plus the modal quantity (tie-break: smallest value).

    With n and exact power sums S1..S4 of the shifted values, the
    n-scaled central sums A2 = n*S2 - S1^2, A3 = n^2*S3 - 3n*S1*S2 +
    2*S1^3, A4 = n^3*S4 - 4n^2*S1*S3 + 6n*S1^2*S2 - 3*S1^4 give
    skew = A3 / (A2*sqrt(A2)) and excess kurtosis = A4/A2^2 - 3 — the
    n powers cancel, so the float stage is a handful of correctly-
    rounded IEEE ops replayed identically by the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    y = (F.col("l_quantity").cast("bigint") - F.lit(_SHIFT)).alias("y")
    base = li.select(F.col("l_returnflag"), F.col("l_quantity").cast("bigint").alias("q"), y)

    sums = base.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s1"),
        F.sum(F.col("y") * F.col("y")).alias("s2"),
        F.sum(F.col("y") * F.col("y") * F.col("y")).alias("s3"),
        F.sum(F.col("y") * F.col("y") * F.col("y") * F.col("y")).alias("s4"),
    )
    nd, s1, s2, s3, s4 = (F.col(c).cast("double") for c in ("n", "s1", "s2", "s3", "s4"))
    a2 = nd * s2 - s1 * s1
    a3 = nd * nd * s3 - F.lit(3.0) * nd * s1 * s2 + F.lit(2.0) * s1 * s1 * s1
    a4 = (
        nd * nd * nd * s4
        - F.lit(4.0) * nd * nd * s1 * s3
        + F.lit(6.0) * nd * s1 * s1 * s2
        - F.lit(3.0) * s1 * s1 * s1 * s1
    )
    moments = sums.select(
        "l_returnflag",
        F.col("n"),
        F.round(s1 / nd + F.lit(float(_SHIFT)), 6).alias("mean_qty"),
        F.round(a2 / (nd * nd), 6).alias("var_qty"),
        F.round(a3 / (a2 * F.sqrt(a2)), 6).alias("skew_qty"),
        F.round(a4 / (a2 * a2) - F.lit(3.0), 6).alias("kurt_excess_qty"),
    )

    w = Window.partitionBy("l_returnflag").orderBy(F.desc("cnt"), F.asc("q"))
    mode = (
        base.groupBy("l_returnflag", "q")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("l_returnflag", F.col("q").alias("mode_qty"), F.col("cnt").alias("mode_count"))
    )
    return moments.join(F.broadcast(mode), "l_returnflag")


_MOMENTS_SQL = f"""
WITH base AS (
  SELECT l_returnflag,
         CAST(l_quantity AS BIGINT) AS q,
         CAST(l_quantity AS BIGINT) - {_SHIFT} AS y
  FROM lineitem
), sums AS (
  SELECT l_returnflag, COUNT(*) AS n,
         SUM(y) AS s1, SUM(y*y) AS s2, SUM(y*y*y) AS s3, SUM(y*y*y*y) AS s4
  FROM base GROUP BY l_returnflag
), m AS (
  SELECT l_returnflag, n,
         CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
         CAST(s3 AS DOUBLE) AS s3, CAST(s4 AS DOUBLE) AS s4
  FROM sums
), a AS (
  SELECT l_returnflag, n, nd, s1,
         nd*s2 - s1*s1 AS a2,
         nd*nd*s3 - 3.0*nd*s1*s2 + 2.0*s1*s1*s1 AS a3,
         nd*nd*nd*s4 - 4.0*nd*nd*s1*s3 + 6.0*nd*s1*s1*s2 - 3.0*s1*s1*s1*s1 AS a4
  FROM m
), moments AS (
  SELECT l_returnflag, n,
         ROUND(s1/nd + {float(_SHIFT)}, 6) AS mean_qty,
         ROUND(a2/(nd*nd), 6) AS var_qty,
         ROUND(a3/(a2*SQRT(a2)), 6) AS skew_qty,
         ROUND(a4/(a2*a2) - 3.0, 6) AS kurt_excess_qty
  FROM a
), mode AS (
  SELECT l_returnflag, q AS mode_qty, cnt AS mode_count
  FROM (
    SELECT l_returnflag, q, COUNT(*) AS cnt,
           ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY COUNT(*) DESC, q ASC) AS rk
    FROM base GROUP BY l_returnflag, q
  ) WHERE rk = 1
)
SELECT moments.*, mode_qty, mode_count
FROM moments JOIN mode USING (l_returnflag)
"""

# ----------------------------------------------------------------- EWMA

_ALPHA = 0.3


def events_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of ``value`` over time order: seed = first value,
    then acc' = alpha*x + (1-alpha)*acc, folded left over the
    (ts, event_id)-sorted list.  One hash agg (collect) per key — the
    sequential dependency lives inside a key, parallelism across keys."""
    e = load_table(spark, sf_dir, "events")
    arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    g = e.groupBy("user_id").agg(
        arr.alias("arr"), F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    fold = F.aggregate(
        F.slice(F.col("arr"), 2, F.size("arr") - 1),
        F.element_at("arr", 1)["value"],
        lambda acc, x: x["value"] * F.lit(_ALPHA) + acc * F.lit(1.0 - _ALPHA),
    )
    return g.select("user_id", "n_events", F.round(fold, 6).alias("ewma_value"))


_EWMA_SQL = f"""
WITH s AS (
  SELECT user_id,
         LIST(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vs,
         COUNT(*) AS n_events
  FROM events GROUP BY user_id
)
SELECT user_id, n_events,
       CAST(ROUND(LIST_REDUCE(vs, (acc, x) ->
             x * CAST({_ALPHA} AS DOUBLE) + acc * CAST({1.0 - _ALPHA} AS DOUBLE)), 6) AS DOUBLE)
           AS ewma_value
FROM s
"""

_TWAP_FP = float(1 << 20)  # value fixed-point scale for the exact TWAP sum


def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TIME-weighted average of ``value`` — the LOCF-integral
    metric (each observation holds until the next one): sum of
    value_i * dt_i over the user's span, divided by the span.  Plain
    averages overweight bursts; TWAP is the metering/billing/monitoring
    semantics.

    Exactness: dt is integer microseconds (lead over the per-user
    (ts, event_id) order — one window, one shuffle); each term enters
    the sum as floor(value * 2^20) * dt_us in DECIMAL(38,0), so the
    per-user reduction is exact integer arithmetic at any scale and any
    partitioning, with ONE decimal->double cast and one division at the
    output boundary.  Users with a single event (zero span) are reported
    with their raw value (the integral degenerates to the point)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rows = e.select(
        "user_id",
        F.col("ts"),
        "event_id",
        F.col("value").cast("double").alias("v"),
    ).withColumn("dt", F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts"))
    term = (
        F.floor(F.col("v") * F.lit(_TWAP_FP)).cast("decimal(38,0)")
        * F.col("dt").cast("decimal(38,0)")
    )
    g = rows.groupBy("user_id").agg(
        F.sum(F.when(F.col("dt").isNotNull(), term)).alias("num"),
        F.sum(F.when(F.col("dt").isNotNull(), F.col("dt"))).cast("bigint").alias("span_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min_by("v", F.struct("ts", "event_id")).alias("first_v"),
    )
    twap = (F.col("num").cast("double") / F.lit(_TWAP_FP)) / F.col("span_us").cast("double")
    return g.select(
        "user_id",
        "n_events",
        F.coalesce("span_us", F.lit(0)).cast("bigint").alias("span_us"),
        F.round(
            F.when(F.col("span_us").isNull() | (F.col("span_us") == 0), F.col("first_v"))
            .otherwise(twap),
            6,
        ).alias("twap_value"),
    )


_TWAP_SQL = f"""
WITH r AS (
  SELECT user_id, epoch_us(ts) AS t, event_id, CAST(value AS DOUBLE) AS v,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) - epoch_us(ts) AS dt,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), g AS (
  SELECT user_id,
         SUM(CASE WHEN dt IS NOT NULL
             THEN CAST(CAST(FLOOR(v * {_TWAP_FP}) AS BIGINT) AS DECIMAL(38,0)) * CAST(dt AS DECIMAL(38,0)) END) AS num,
         CAST(SUM(CASE WHEN dt IS NOT NULL THEN dt END) AS BIGINT) AS span_us,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         MAX(CASE WHEN rn = 1 THEN v END) AS first_v
  FROM r GROUP BY user_id
)
SELECT user_id, n_events,
       CAST(COALESCE(span_us, 0) AS BIGINT) AS span_us,
       ROUND(CASE WHEN span_us IS NULL OR span_us = 0 THEN first_v
                  ELSE (CAST(num AS DOUBLE) / {_TWAP_FP}) / CAST(span_us AS DOUBLE) END, 6) AS twap_value
FROM g
"""


# ----------------------------------------- banded interval-overlap join


def join_interval_overlap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily activity intervals (per user-day [min ts, max ts]) self-
    joined on true overlap.  The day bucket is the band key: the join is
    an equi-join on ``day`` (shuffle on a bounded-cardinality key, never
    a cartesian) with the interval predicate as a residual filter.
    Output: per day, interval count and overlapping-pair count."""
    e = load_table(spark, sf_dir, "events")
    iv = e.groupBy(
        F.to_date("ts").alias("day"), F.col("user_id")
    ).agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    a, b = iv.alias("a"), iv.alias("b")
    pairs = a.join(
        b,
        (F.col("a.day") == F.col("b.day"))
        & (F.col("a.user_id") < F.col("b.user_id"))
        & (F.col("a.t0") <= F.col("b.t1"))
        & (F.col("b.t0") <= F.col("a.t1")),
    )
    per_day = pairs.groupBy(F.col("a.day").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlap_pairs")
    )
    counts = iv.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("n_intervals"))
    return (
        counts.join(per_day, "day", "left")
        .select(
            "day",
            "n_intervals",
            F.coalesce("n_overlap_pairs", F.lit(0)).cast("bigint").alias("n_overlap_pairs"),
        )
    )


_OVERLAP_SQL = """
WITH iv AS (
  SELECT CAST(ts AS DATE) AS day, user_id, MIN(ts) AS t0, MAX(ts) AS t1
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.day, COUNT(*) AS n_overlap_pairs
  FROM iv a JOIN iv b
    ON a.day = b.day AND a.user_id < b.user_id
   AND a.t0 <= b.t1 AND b.t0 <= a.t1
  GROUP BY a.day
)
SELECT c.day, c.n_intervals,
       CAST(COALESCE(p.n_overlap_pairs, 0) AS BIGINT) AS n_overlap_pairs
FROM (SELECT day, COUNT(*) AS n_intervals FROM iv GROUP BY day) c
LEFT JOIN pairs p ON c.day = p.day
"""


# ----------------------------------------------------------- winsorize

_WINS_LO, _WINS_HI = 0.01, 0.99


def events_winsorize_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — the outlier-clipping step of feature cleaning:
    per event_type, exact rank-based P1/P99 over the deterministic
    (value, event_id) total order, then every value clamped into the
    band.  Output: per-segment bounds, clip counts, and the exact
    decimal sum of the winsorized values.

    Two passes: bounds (one window sort — the only order the semantic
    needs — feeding a 5-row aggregate) broadcast back onto the scan for
    the clip aggregate.  No per-row materialization of clipped rows."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    lo_idx = F.floor((F.col("n") - 1) * F.lit(_WINS_LO)) + 1
    hi_idx = F.floor((F.col("n") - 1) * F.lit(_WINS_HI)) + 1
    bounds = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == lo_idx, F.col("value"))).alias("p01"),
        F.max(F.when(F.col("rn") == hi_idx, F.col("value"))).alias("p99"),
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    return (
        e.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "p01", "p99")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("value") < F.col("p01"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_lo"),
            F.sum(F.when(F.col("value") > F.col("p99"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_hi"),
            F.sum(clamped.cast("decimal(18,2)")).cast("double").alias("sum_winsorized"),
        )
    )


_WINSORIZE_SQL = f"""
WITH ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
), bounds AS (
  SELECT event_type,
         MAX(CASE WHEN rn = FLOOR((n - 1) * {_WINS_LO}) + 1 THEN value END) AS p01,
         MAX(CASE WHEN rn = FLOOR((n - 1) * {_WINS_HI}) + 1 THEN value END) AS p99
  FROM ranked GROUP BY event_type
)
SELECT e.event_type, CAST(b.p01 AS DOUBLE) AS p01, CAST(b.p99 AS DOUBLE) AS p99,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN e.value < b.p01 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
       CAST(SUM(CASE WHEN e.value > b.p99 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
       CAST(SUM(CAST(LEAST(GREATEST(e.value, b.p01), b.p99) AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_winsorized
FROM events e JOIN bounds b USING (event_type)
GROUP BY 1, 2, 3
"""




# -------------------------------------------------------- linear trend

_TREND_EPOCH = "2024-01-01"  # fixture time origin; x = seconds since


def events_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment OLS trend of value over time — drift/decay detection
    as one hash aggregate: slope and intercept from the closed form
    (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) over EXACT sums (seconds since a
    fixed origin x cents), so the only float work is the final division
    — identical in any engine, rounded at the boundary.

    Overflow discipline: per-row products fit bigint (origin-shifted
    x keeps x*x <= ~1e15), but the SUMS do not at row counts past ~1e4
    per segment-month — Spark's SUM(bigint) would overflow (ANSI throw
    or wrap) exactly where DuckDB silently promotes to HUGEINT.  So the
    products are summed as DECIMAL(38,0) in BOTH engines: exact to 1e38,
    i.e. ~1e23 rows at this x range — genuinely any scale factor."""
    e = load_table(spark, sf_dir, "events")
    x = (
        F.unix_timestamp("ts") - F.unix_timestamp(F.lit(_TREND_EPOCH).cast("timestamp"))
    ).cast("bigint")
    y = F.round(F.col("value") * 100).cast("bigint")  # exact integer cents
    base = e.select("event_type", x.alias("x"), y.alias("y"))
    d38 = "decimal(38,0)"
    sums = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(d38)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).alias("sxx"),
    )
    nd, sx, sy, sxy, sxx = (
        F.col(c).cast("double") for c in ("n", "sx", "sy", "sxy", "sxx")
    )
    slope_cents_per_s = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    intercept_cents = (sy - slope_cents_per_s * sx) / nd
    return sums.select(
        "event_type",
        "n",
        F.round(slope_cents_per_s * F.lit(86400.0) / F.lit(100.0), 6).alias(
            "slope_per_day"
        ),
        F.round(intercept_cents / F.lit(100.0), 6).alias("intercept"),
    )


_TREND_SQL = f"""
WITH base AS (
  SELECT event_type,
         CAST(FLOOR(epoch(ts)) - FLOOR(epoch(TIMESTAMP '{_TREND_EPOCH}')) AS BIGINT) AS x,
         CAST(ROUND(value * 100) AS BIGINT) AS y
  FROM events
), sums AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(x AS DECIMAL(38,0))) AS sx, SUM(CAST(y AS DECIMAL(38,0))) AS sy,
         SUM(CAST(x*y AS DECIMAL(38,0))) AS sxy, SUM(CAST(x*x AS DECIMAL(38,0))) AS sxx
  FROM base GROUP BY event_type
)
SELECT event_type, n,
       ROUND(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
             * 86400.0 / 100.0, 6) AS slope_per_day,
       ROUND((CAST(sy AS DOUBLE)
              - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) / 100.0, 6) AS intercept
FROM sums
"""


#: Benford expected shares log10(1 + 1/d), precomputed driver-side so NO
#: libm call happens at query time in either engine (the PSI discipline:
#: both sides compare against the identical literal)
_BENFORD_EXPECTED = {d: __import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)}
_BENFORD_TOL = 0.05


def orders_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit profile of order totals — the
    fraud/fabrication screen of data auditing: observed share per
    leading digit vs the log10(1 + 1/d) expectation.

    Determinism: the leading digit comes from the exact integer cents
    (floor(x*100 + 0.5), exact for 2-dp decimals in double) rendered as
    a string — never from float log10, whose last-ulp drift near powers
    of ten could flip a digit between engines.  The expected shares are
    Python-precomputed literals; the only floats are two exact int/int
    divisions and literal compares."""
    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("bigint")
    digit = F.substring(cents.cast("string"), 1, 1).cast("bigint")
    counts = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    total = o.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    expected = F.create_map(
        *[F.lit(v) for d in range(1, 10) for v in (d, _BENFORD_EXPECTED[d])]
    )
    share = F.col("n_orders").cast("double") / F.col("n_total")
    return counts.crossJoin(F.broadcast(total)).select(
        "digit",
        "n_orders",
        share.alias("share"),
        expected[F.col("digit")].alias("benford_expected"),
        (F.abs(share - expected[F.col("digit")]) <= F.lit(_BENFORD_TOL)).alias("within_tol"),
    )


_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {_BENFORD_EXPECTED[d]!r}" for d in range(1, 10)
)

_BENFORD_SQL = f"""
WITH d AS (
  SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
), counts AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_orders FROM d GROUP BY 1
), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM d)
SELECT c.digit, c.n_orders,
       CAST(c.n_orders AS DOUBLE) / t.n_total AS share,
       CAST(CASE c.digit {_BENFORD_CASE} END AS DOUBLE) AS benford_expected,
       ABS(CAST(c.n_orders AS DOUBLE) / t.n_total - CAST(CASE c.digit {_BENFORD_CASE} END AS DOUBLE)) <= {_BENFORD_TOL} AS within_tol
FROM counts c CROSS JOIN tot t
"""


# --------------------------------------------- CUSUM changepoint monitor

_CUSUM_FP = 100  # cents fixed point for `value`
_CUSUM_H = 20_000  # alarm threshold: $200 cumulative drift in cents


def _cusum_cents(col: F.Column) -> F.Column:
    """THE fixed-point encoding for CUSUM values — double multiply then
    floor.  One definition shared by the batch operator, the streaming
    tier's frozen-k fit and its per-batch prep (``streaming/cusum.py``):
    the encoding must stay bit-identical across all three or
    stream/batch/oracle parity breaks."""
    return F.floor(col.cast("double") * F.lit(float(_CUSUM_FP))).cast("bigint")


def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM drift monitor per (event_type, day) series — the
    Page (1954) changepoint statistic a production data-quality tier runs
    over every monitored metric stream.

    The textbook form is a per-row recursion
    ``S_t = max(0, S_{t-1} + (x_t - k))``, which would force a sequential
    fold.  We use the closed form instead: with ``C_t = Σ_{j<=t}(x_j - k)``
    and ``C_0 = 0``, ``S_t = C_t - min(0, min_{j<=t} C_j)`` (and the
    downward statistic ``S'_t = max(0, max_{j<=t} C_j) - C_t``), so the
    whole monitor is three window functions over ONE partition sort —
    no recursion, no UDF, fully codegen.

    Exactness: values enter as ``floor(value*100)`` cents (bigint); the
    reference level k is the per-type global mean via truncating integer
    division (exact — inputs here are non-negative, and the oracle's
    ``//`` is sign-corrected to truncation to match Spark's ``DIV``); every
    statistic stays bigint until output.

    Scale: the monitored unit is a (series, day) partition — bounded rows
    per partition regardless of corpus size, parallelism across
    series×days (at 100 TB you monitor many metrics over many days, not
    one infinite sequence); k is a 5-row broadcast; the daily reset is the
    standard production practice for bounded alarm memory.  Output: one
    summary row per event_type (counts, max statistics, alarm counts,
    first alarm day per direction).

    Reference parity: the reference has no monitoring surface; this
    extends §2.5 data-quality (same family as ``dq_expectations`` /
    ``events_psi_drift``)."""
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        F.to_date("ts").alias("day"),
        "ts",
        "event_id",
        _cusum_cents(F.col("value")).alias("vc"),
    )
    k = v.groupBy("event_type").agg(
        F.expr("CAST(sum(vc) DIV count(*) AS BIGINT)").alias("k_cents")
    )
    d = v.join(F.broadcast(k), "event_type").withColumn(
        "d", F.col("vc") - F.col("k_cents")
    )
    w = (
        Window.partitionBy("event_type", "day")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cw = d.withColumn("c", F.sum("d").over(w))
    zero = F.lit(0).cast("bigint")
    s = cw.select(
        "event_type",
        "day",
        "k_cents",
        (F.col("c") - F.least(zero, F.min("c").over(w))).alias("s_up"),
        (F.greatest(zero, F.max("c").over(w)) - F.col("c")).alias("s_dn"),
    )
    h = F.lit(_CUSUM_H).cast("bigint")
    return s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("day").cast("bigint").alias("n_days"),
        F.max("k_cents").alias("k_cents"),
        F.max("s_up").alias("max_up_stat"),
        F.max("s_dn").alias("max_dn_stat"),
        F.sum(F.when(F.col("s_up") > h, 1).otherwise(0)).cast("bigint").alias("up_alarms"),
        F.sum(F.when(F.col("s_dn") > h, 1).otherwise(0)).cast("bigint").alias("dn_alarms"),
        F.min(F.when(F.col("s_up") > h, F.col("day"))).alias("first_up_alarm_day"),
        F.min(F.when(F.col("s_dn") > h, F.col("day"))).alias("first_dn_alarm_day"),
    )


#: the DuckDB rendering of ``_cusum_cents``
_CUSUM_CENTS_SQL = f"CAST(FLOOR(CAST(value AS DOUBLE) * {float(_CUSUM_FP)!r}) AS BIGINT)"


def cusum_oracle_sql(k_from: str, v_where: str = "") -> str:
    """THE closed-form CUSUM oracle body, shared by the batch tier and
    the streaming tier (``streaming/cusum.py``) so a fix to the window
    frames / alarm predicate / sign-corrected division can never apply
    to one oracle and miss the other.  ``k_from`` is the FROM-source of
    the reference-level aggregate (a relation with (event_type, vc)):
    ``"v"`` for the batch tier's full-corpus mean, a history subquery for
    the streaming tier's frozen level.  ``v_where`` filters the monitored
    rows."""
    return f"""
WITH v AS (
  SELECT event_type, CAST(ts AS DATE) AS day, ts, event_id,
         {_CUSUM_CENTS_SQL} AS vc
  FROM events{v_where}
), k AS (
  -- sign-corrected to TRUNCATING division to match Spark's DIV
  SELECT event_type,
         CAST(CASE WHEN SUM(vc) >= 0 THEN SUM(vc) // COUNT(*)
                   ELSE -((-SUM(vc)) // COUNT(*)) END AS BIGINT) AS k_cents
  FROM {k_from} GROUP BY event_type
), d AS (
  SELECT v.event_type, v.day, v.ts, v.event_id, k.k_cents, v.vc - k.k_cents AS d
  FROM v JOIN k USING (event_type)
), cw AS (
  SELECT event_type, day, ts, event_id, k_cents,
         SUM(d) OVER (PARTITION BY event_type, day ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS c
  FROM d
), s AS (
  SELECT event_type, day, k_cents,
         c - LEAST(0, MIN(c) OVER win) AS s_up,
         GREATEST(0, MAX(c) OVER win) - c AS s_dn
  FROM cw
  WINDOW win AS (PARTITION BY event_type, day ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days,
       MAX(k_cents) AS k_cents,
       CAST(MAX(s_up) AS BIGINT) AS max_up_stat,
       CAST(MAX(s_dn) AS BIGINT) AS max_dn_stat,
       CAST(SUM(CASE WHEN s_up > {_CUSUM_H} THEN 1 ELSE 0 END) AS BIGINT) AS up_alarms,
       CAST(SUM(CASE WHEN s_dn > {_CUSUM_H} THEN 1 ELSE 0 END) AS BIGINT) AS dn_alarms,
       MIN(CASE WHEN s_up > {_CUSUM_H} THEN day END) AS first_up_alarm_day,
       MIN(CASE WHEN s_dn > {_CUSUM_H} THEN day END) AS first_dn_alarm_day
FROM s GROUP BY event_type
"""


_CUSUM_SQL = cusum_oracle_sql(k_from="v")


QUERIES = {
    "orders_benford_first_digit": orders_benford_first_digit,
    "dq_expectations": dq_expectations,
    "lineitem_distribution_profile": lineitem_distribution_profile,
    "events_ewma_value": events_ewma_value,
    "events_time_weighted_avg": events_time_weighted_avg,
    "join_interval_overlap_daily": join_interval_overlap_daily,
    "events_winsorize_value": events_winsorize_value,
    "events_linear_trend": events_linear_trend,
    "events_cusum_changepoint": events_cusum_changepoint,
}

ORACLE = {
    "orders_benford_first_digit": _BENFORD_SQL,
    "dq_expectations": _DQ_SQL,
    "lineitem_distribution_profile": _MOMENTS_SQL,
    "events_ewma_value": _EWMA_SQL,
    "events_time_weighted_avg": _TWAP_SQL,
    "join_interval_overlap_daily": _OVERLAP_SQL,
    "events_winsorize_value": _WINSORIZE_SQL,
    "events_linear_trend": _TREND_SQL,
    "events_cusum_changepoint": _CUSUM_SQL,
}
