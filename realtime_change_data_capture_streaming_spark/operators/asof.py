"""As-of (point-in-time) join — the time-series staple Spark lacks natively.

For each left row at time t, attach the latest right row with
``right_ts <= t`` for the same key.  Declared in SURVEY.md §2.5's join
surface ("as-of ≈ union + last-value window"); the oracle uses DuckDB's
native ``ASOF JOIN``.

Scale design: the naive formulation is a range join (every left row ×
every earlier right row, then argmax) — a candidate explosion Spark plans
as O(n·m) per key.  The union + last-value-window form does ONE shuffle
on the key and one per-partition sort over left+right combined: each row
is touched once, which is the same asymptotic shape a dedicated as-of
operator (pandas merge_asof, QuestDB, kdb aj) uses.  Key skew maps to a
window over the hot key; tolerable because the window state is one struct
(the running last right row), not a buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.sources.tables import load_table


def join_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """Inner as-of join: left rows keep their columns; the matched right
    row's columns arrive under a ``_match`` struct (``_match.<col>``),
    with ``right_ts`` included.  Left rows with no match are dropped
    (inner semantics).

    ``direction="backward"`` (default) matches the LATEST right row with
    ``right_ts <= left_ts``; ``"forward"`` matches the EARLIEST right row
    with ``right_ts >= left_ts`` (pandas ``merge_asof`` naming).  Both run
    as one key shuffle + one per-partition sort — each row touched once;
    a tie at equal timestamps matches in either direction (the side
    ordering guarantees the right row is visible from the left row's
    frame).

    ``tolerance`` (an interval literal, e.g. ``"1 hour"``) bounds the
    match gap, pandas merge_asof semantics: a left row whose nearest
    match is farther than the tolerance gets NO match.  It is a pure
    post-fill filter — correct because any other candidate is farther
    than the nearest one — so the plan shape is unchanged.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    backward = direction == "backward"
    r_payload = [c for c in right.columns if c != on]
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0 if backward else 1).alias("_side"),
        F.struct(*[F.col(c) for c in r_payload]).alias("_match"),
        F.lit(None).alias("_left"),
    )
    l_struct = F.struct(*[F.col(c) for c in left.columns])
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1 if backward else 0).alias("_side"),
        F.lit(None).cast(r.schema["_match"].dataType).alias("_match"),
        l_struct.alias("_left"),
    )
    if backward:
        w = (
            Window.partitionBy(on)
            .orderBy("_asof_ts", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fill = F.last("_match", ignorenulls=True)
        left_side = 1
    else:
        w = (
            Window.partitionBy(on)
            .orderBy("_asof_ts", "_side")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        fill = F.first("_match", ignorenulls=True)
        left_side = 0
    u = r.unionByName(l, allowMissingColumns=False)
    filled = u.withColumn("_m", fill.over(w))
    out = filled.filter((F.col("_side") == left_side) & F.col("_m").isNotNull())
    if tolerance is not None:
        gap = F.col("_asof_ts") - F.col("_m").getField(right_ts)
        if not backward:
            gap = F.col("_m").getField(right_ts) - F.col("_asof_ts")
        out = out.filter(gap <= F.expr(f"interval {tolerance}"))
    return out.select(F.col("_left.*"), F.col("_m").alias("_match"))


def events_asof_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the user's most recent view at or before it:
    classic attribution as-of.  (user_id, ts) is unique in the fixture, so
    the match is deterministic."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    j = join_asof(purchases, views, on="user_id")
    return j.select(
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("_match.ts").alias("view_ts"),
        (F.unix_micros("ts") - F.unix_micros(F.col("_match.ts"))).alias("gap_us"),
        F.col("_match.value").alias("view_value"),
    )


ASOF_SQL = """
SELECT p.user_id,
       p.ts AS purchase_ts,
       v.ts AS view_ts,
       CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS gap_us,
       CAST(v.value AS DOUBLE) AS view_value
FROM (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
"""

def events_asof_next_view_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for every purchase, the user's FIRST view at or
    after it — post-purchase behavior attribution (the merge_asof
    direction='forward' counterpart of the backward query above)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    j = join_asof(purchases, views, on="user_id", direction="forward")
    return j.select(
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("_match.ts").alias("view_ts"),
        (F.unix_micros(F.col("_match.ts")) - F.unix_micros("ts")).alias("gap_us"),
        F.col("_match.value").cast("double").alias("view_value"),
    )


ASOF_FWD_SQL = """
SELECT p.user_id,
       p.ts AS purchase_ts,
       v.ts AS view_ts,
       CAST(epoch_us(v.ts) - epoch_us(p.ts) AS BIGINT) AS gap_us,
       CAST(v.value AS DOUBLE) AS view_value
FROM (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts <= v.ts
"""

def events_asof_view_within_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Toleranced as-of (merge_asof tolerance semantics): the most recent
    view at or before each purchase, but only if it happened within the
    last hour — purchases whose nearest view is staler get no row."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    j = join_asof(purchases, views, on="user_id", tolerance="1 hour")
    return j.select(
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("_match.ts").alias("view_ts"),
        (F.unix_micros("ts") - F.unix_micros(F.col("_match.ts"))).alias("gap_us"),
    )


# the tolerance is a post-filter on the nearest match (any other candidate
# is farther), so the oracle is the native ASOF JOIN plus the gap bound
ASOF_TOL_SQL = """
SELECT user_id, purchase_ts, view_ts, gap_us FROM (
  SELECT p.user_id, p.ts AS purchase_ts, v.ts AS view_ts,
         CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS gap_us
  FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
  ASOF JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
    ON p.user_id = v.user_id AND p.ts >= v.ts
) WHERE gap_us <= 3600000000
"""


def events_asof_nearest_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-match as-of: for every purchase, the user's closest view
    in EITHER direction (pandas merge_asof direction='nearest') — the
    variant backward/forward alone cannot express.  Composed as a full
    outer merge of the two directional as-ofs on the purchase EVENT
    IDENTITY (event_id, carried through both sides) — never on
    (user_id, ts), where two purchases at the same timestamp would
    cross-product n^2 combiner rows: min |gap| wins, ties (equidistant
    before/after) go to the BEFORE match, purchases with only one side
    take it.  No new join machinery — ``join_asof`` stays the single
    source of as-of semantics, and the combiner is pure column logic."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    b = join_asof(purchases, views, on="user_id", direction="backward").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_pts"),
        F.col("_match.ts").alias("b_ts"),
        (F.unix_micros("ts") - F.unix_micros(F.col("_match.ts"))).alias("b_gap"),
        F.col("_match.value").cast("double").alias("b_val"),
    )
    f = join_asof(purchases, views, on="user_id", direction="forward").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("f_user"),
        F.col("ts").alias("f_pts"),
        F.col("_match.ts").alias("f_ts"),
        (F.unix_micros(F.col("_match.ts")) - F.unix_micros("ts")).alias("f_gap"),
        F.col("_match.value").cast("double").alias("f_val"),
    )
    j = b.join(f, "pid", "full_outer")
    take_b = F.col("f_gap").isNull() | (
        F.col("b_gap").isNotNull() & (F.col("b_gap") <= F.col("f_gap"))
    )
    return j.select(
        F.coalesce("b_user", "f_user").alias("user_id"),
        F.coalesce("b_pts", "f_pts").alias("purchase_ts"),
        F.when(take_b, F.col("b_ts")).otherwise(F.col("f_ts")).alias("view_ts"),
        F.when(take_b, F.col("b_gap")).otherwise(F.col("f_gap")).cast("bigint").alias("abs_gap_us"),
        F.when(take_b, F.lit("before")).otherwise(F.lit("after")).alias("direction"),
        F.when(take_b, F.col("b_val")).otherwise(F.col("f_val")).cast("double").alias("view_value"),
    )


ASOF_NEAREST_SQL = """
WITH b AS (
  SELECT p.event_id AS pid, p.user_id, p.ts AS purchase_ts, v.ts AS b_ts,
         CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS b_gap,
         CAST(v.value AS DOUBLE) AS b_val
  FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
  ASOF JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
    ON p.user_id = v.user_id AND p.ts >= v.ts
), f AS (
  SELECT p.event_id AS pid, p.user_id, p.ts AS purchase_ts, v.ts AS f_ts,
         CAST(epoch_us(v.ts) - epoch_us(p.ts) AS BIGINT) AS f_gap,
         CAST(v.value AS DOUBLE) AS f_val
  FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
  ASOF JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
    ON p.user_id = v.user_id AND p.ts <= v.ts
)
SELECT COALESCE(b.user_id, f.user_id) AS user_id,
       COALESCE(b.purchase_ts, f.purchase_ts) AS purchase_ts,
       CASE WHEN f.f_gap IS NULL OR (b.b_gap IS NOT NULL AND b.b_gap <= f.f_gap)
            THEN b.b_ts ELSE f.f_ts END AS view_ts,
       CAST(CASE WHEN f.f_gap IS NULL OR (b.b_gap IS NOT NULL AND b.b_gap <= f.f_gap)
            THEN b.b_gap ELSE f.f_gap END AS BIGINT) AS abs_gap_us,
       CASE WHEN f.f_gap IS NULL OR (b.b_gap IS NOT NULL AND b.b_gap <= f.f_gap)
            THEN 'before' ELSE 'after' END AS direction,
       CASE WHEN f.f_gap IS NULL OR (b.b_gap IS NOT NULL AND b.b_gap <= f.f_gap)
            THEN b.b_val ELSE f.f_val END AS view_value
FROM b FULL OUTER JOIN f USING (pid)
"""


QUERIES = {
    "events_asof_view_before_purchase": events_asof_view_before_purchase,
    "events_asof_next_view_after_purchase": events_asof_next_view_after_purchase,
    "events_asof_view_within_1h": events_asof_view_within_1h,
    "events_asof_nearest_view": events_asof_nearest_view,
}
ORACLE = {
    "events_asof_view_before_purchase": ASOF_SQL,
    "events_asof_next_view_after_purchase": ASOF_FWD_SQL,
    "events_asof_view_within_1h": ASOF_TOL_SQL,
    "events_asof_nearest_view": ASOF_NEAREST_SQL,
}
