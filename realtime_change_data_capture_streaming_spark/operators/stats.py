"""DataFrame statistics surface (``df.stat``) + distribution operators.

``crosstab`` is the contingency-table primitive (pairwise frequency of two
low-cardinality columns); ``ntile``-based equi-depth histograms are the
data-profiling complement to the fixed-width histogram in
``operators/events.py`` — bucket boundaries adapt to the distribution, so
every bucket holds the same row count.

Scale shape: crosstab is one hash agg on (a, b) followed by a pivot of a
bounded-cardinality domain (the contract: both columns are dimension-like;
a high-cardinality crosstab is a user error at any scale).  The equi-depth
histogram computes EXACT ntile semantics without any global sort: coarse
range-partition the value domain on approximate quantile boundaries
(balance only — any boundary set is correct), count each coarse range
(bounded collect, <= _COARSE rows), turn the running offsets into exact
global positions via per-range windows, then apply the closed-form ntile
bucket formula.  No window ever spans more than ~1/_COARSE of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.operators._util import dsum
from realtime_change_data_capture_streaming_spark.sources.tables import load_table

_N_BUCKETS = 8


def docs_crosstab_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table lang x source via ``df.stat.crosstab`` — one row
    per lang, one count column per source value."""
    d = load_table(spark, sf_dir, "documents")
    return d.stat.crosstab("lang", "source")


# the source domain is data-dependent but dimension-like; the oracle
# enumerates it the same way crosstab does (distinct values as columns)
_CROSSTAB_SQL = """
SELECT lang AS lang_source,
       {cols}
FROM documents GROUP BY lang
""".format(
    cols=",\n       ".join(
        f"CAST(SUM(CASE WHEN source = 'src{i}' THEN 1 ELSE 0 END) AS BIGINT) AS src{i}"
        for i in range(20)
    )
)


_COARSE = 64  # coarse range-partitions for the distributed exact ntile


def _range_offsets(df: DataFrame, value_col: str, sums: dict):
    """The shared FIRST PASS of the distributed two-pass prefix
    discipline (exact rank, exact prefix sums — never a global
    single-partition window):

    1. approx-quantile boundaries split the value domain into ~_COARSE
       coarse ranges (boundary quality affects BALANCE only, never
       correctness — rows with equal values always land in one range,
       and range id is monotone in value, so (range, ...) orders
       identically to the value order);
    2. one tiny agg evaluates each measure per range — collected
       driver-side (bounded: <= _COARSE+1 rows, metadata-scale) and
       turned into exact per-measure RUNNING OFFSETS in range order.

    ``sums`` maps measure name -> aggregate Column.  Returns
    (df + ``_rng`` column, {name: offsets map Column}, {name: total}).
    Callers finish the second pass with a window PARTITIONED BY ``_rng``
    (offset + local rank / local running sum = exact global value).
    Shared by the exact rank (``with_global_positions``) and the KS
    cumulative ECDFs."""
    vdbl = F.col(value_col).cast("double")
    probs = [i / _COARSE for i in range(1, _COARSE)]
    bnds = sorted(set(df.approxQuantile(value_col, probs, 0.001)))
    if bnds:
        barr = F.array(*[F.lit(float(b)) for b in bnds])
        rng = F.size(F.filter(barr, lambda x: x < vdbl))
    else:
        rng = F.lit(0)
    with_rng = df.withColumn("_rng", rng)
    per_rng = {
        r["_rng"]: r
        for r in with_rng.groupBy("_rng")
        .agg(*[c.alias(nm) for nm, c in sums.items()])
        .collect()
    }  # bounded collect: at most _COARSE+1 rows of (range, measures)
    maps, totals = {}, {}
    for nm in sums:
        off, offsets = 0, {}
        for r in sorted(per_rng):
            offsets[r] = off
            off += per_rng[r][nm] or 0
        totals[nm] = off
        maps[nm] = (
            F.create_map(*[F.lit(v) for kv in offsets.items() for v in kv])
            if offsets
            else F.create_map()
        )
    return with_rng, maps, totals


def with_global_positions(df: DataFrame, value_col: str, key_col: str) -> tuple[DataFrame, int]:
    """EXACT 1-based global rank by (value, key) without a global
    single-partition window — the distributed two-pass rank: coarse
    ranges + exact per-range offsets (``_range_offsets``), then a window
    PARTITIONED BY range computes local row_number; global position =
    range offset + local row_number, exact.

    Returns (df + ``_pos`` bigint column, total row count).  Shared by
    the exact ntile (equi-depth histogram), the Gini coefficient, and
    the Mann-Whitney ranks."""
    with_rng, maps, totals = _range_offsets(df, value_col, {"n": F.count(F.lit(1))})
    lw = Window.partitionBy("_rng").orderBy(value_col, key_col)
    pos = (maps["n"][F.col("_rng")] + F.row_number().over(lw)).cast("bigint")
    return with_rng.withColumn("_pos", pos).drop("_rng"), totals["n"]


def exact_ntile(df: DataFrame, value_col: str, key_col: str, n_buckets: int) -> DataFrame:
    """EXACT ``ntile(n_buckets) OVER (ORDER BY value, key)`` built on the
    distributed two-pass rank (``with_global_positions``); the
    closed-form ntile bucket of a 1-based position p over n rows (first
    n%B buckets hold n//B+1 rows) is pure arithmetic.  Returns ``df``
    plus a ``bucket`` int column matching SQL NTILE."""
    with_pos, n = with_global_positions(df, value_col, key_col)
    q, r = divmod(n, n_buckets)
    if q == 0:  # fewer rows than buckets: bucket == position
        bucket_expr = "CAST(_pos AS INT)"
    else:
        bucket_expr = (
            f"CAST(CASE WHEN _pos <= {(q + 1) * r} THEN (_pos - 1) DIV {q + 1} + 1 "
            f"ELSE {r} + (_pos - 1 - {(q + 1) * r}) DIV {q} + 1 END AS INT)"
        )
    return with_pos.withColumn("bucket", F.expr(bucket_expr)).drop("_pos")


def orders_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile-bucketed) histogram of order totals: exact
    ntile(8) with a deterministic total order (value, key), then
    per-bucket count / bounds / exact sum.  The ntile is the distributed
    two-pass ``exact_ntile`` — no full-table single-partition window
    (equality to the single-window form is pinned in
    tests/test_stats_ops.py; the DuckDB NTILE oracle is the cross-engine
    check)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return (
        exact_ntile(o, "o_totalprice", "o_orderkey", _N_BUCKETS)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
            dsum("o_totalprice").alias("sum_total"),
        )
        .select(F.col("bucket").cast("bigint").alias("bucket"), "n_orders", "lo", "hi", "sum_total")
    )


_EQUIDEPTH_SQL = f"""
WITH b AS (
  SELECT o_totalprice,
         NTILE({_N_BUCKETS}) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders
)
SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_orders,
       CAST(MIN(o_totalprice) AS DOUBLE) AS lo, CAST(MAX(o_totalprice) AS DOUBLE) AS hi,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
FROM b GROUP BY bucket
"""


def customers_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — the inequality/concentration
    profile (how top-heavy is revenue?).  Gini needs every value's exact
    GLOBAL rank; this reuses the distributed two-pass rank
    (``with_global_positions``), so no single-partition window touches
    the customer table at any scale.

    Exactness: per-order cents via floor(x*100+0.5) (exact for 2-dp
    money in double), per-customer spend as exact bigint sums, the
    rank-weighted sum folded in DECIMAL(38,0) (pos * spend products
    overflow bigint at ~1e9 customers), ONE cast to double at the
    output: gini = (2*S1 - (n+1)*S0) / (n*S0) over ascending spend."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("bigint")
    spend = o.select("o_custkey", cents.alias("c")).groupBy("o_custkey").agg(
        F.sum("c").alias("spend")
    )
    ranked, n = with_global_positions(spend, "spend", "o_custkey")
    agg = ranked.agg(
        F.sum(
            F.col("_pos").cast("decimal(19,0)") * F.col("spend").cast("decimal(19,0)")
        ).alias("s1"),
        F.sum(F.col("spend").cast("decimal(38,0)")).alias("s0"),
    )
    s1 = F.col("s1").cast("double")
    s0 = F.col("s0").cast("double")
    nn = F.lit(float(n))
    return agg.select(
        F.lit(n).cast("bigint").alias("n_customers"),
        (s0 / F.lit(100.0)).alias("total_spend"),
        ((F.lit(2.0) * s1 - (nn + F.lit(1.0)) * s0) / (nn * s0)).alias("gini"),
    )


_GINI_SQL = """
WITH spend AS (
  SELECT o_custkey, CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS spend
  FROM orders GROUP BY 1
), ranked AS (
  SELECT spend, ROW_NUMBER() OVER (ORDER BY spend ASC, o_custkey ASC) AS pos FROM spend
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(pos AS HUGEINT) * spend) AS DOUBLE) AS s1,
         CAST(SUM(CAST(spend AS HUGEINT)) AS DOUBLE) AS s0
  FROM ranked
)
SELECT n AS n_customers,
       s0 / 100.0 AS total_spend,
       (2.0 * s1 - (CAST(n AS DOUBLE) + 1.0) * s0) / (CAST(n AS DOUBLE) * s0) AS gini
FROM agg
"""


def customers_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: customers grouped by FIRST-order
    year, cumulative spend per years-since-acquisition — the LTV grid
    behind payback-period decisions (the revenue complement of the
    event-side retention cohort).

    One agg for first-order year per customer, one broadcast join back,
    one (cohort, offset) agg in exact cents, then a running sum over a
    window PARTITIONED by cohort whose input is one row per (cohort,
    year offset) — calendar-bounded at any data scale."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("bigint")
    first = o.groupBy("o_custkey").agg(F.min(F.year("o_orderdate")).alias("cohort_year"))
    grid = (
        o.select("o_custkey", F.year("o_orderdate").alias("yr"), cents.alias("c"))
        .join(F.broadcast(first), "o_custkey")
        .groupBy("cohort_year", (F.col("yr") - F.col("cohort_year")).alias("year_offset"))
        .agg(
            F.sum("c").alias("spend_cents"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_active_customers"),
        )
    )
    w = Window.partitionBy("cohort_year").orderBy("year_offset")
    return grid.select(
        F.col("cohort_year").cast("bigint").alias("cohort_year"),
        F.col("year_offset").cast("bigint").alias("year_offset"),
        "n_active_customers",
        (F.col("spend_cents").cast("double") / F.lit(100.0)).alias("spend"),
        (F.sum("spend_cents").over(w).cast("double") / F.lit(100.0)).alias("cumulative_ltv"),
    )


_COHORT_LTV_SQL = """
WITH first AS (
  SELECT o_custkey, MIN(EXTRACT(year FROM o_orderdate)) AS cohort_year
  FROM orders GROUP BY 1
), grid AS (
  SELECT f.cohort_year,
         EXTRACT(year FROM o.o_orderdate) - f.cohort_year AS year_offset,
         CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS spend_cents,
         CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_active_customers
  FROM orders o JOIN first f USING (o_custkey)
  GROUP BY 1, 2
)
SELECT CAST(cohort_year AS BIGINT) AS cohort_year,
       CAST(year_offset AS BIGINT) AS year_offset,
       n_active_customers,
       CAST(spend_cents AS DOUBLE) / 100.0 AS spend,
       CAST(SUM(spend_cents) OVER (PARTITION BY cohort_year ORDER BY year_offset
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS cumulative_ltv
FROM grid
"""


_ANOVA_FP = float(1 << 20)


def lineitem_anova_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-test: does mean l_quantity differ by return flag? —
    the continuous-response counterpart of the chi-square independence
    test (same fixed-point fold discipline).

    Group sums and squared sums are EXACT bigints (quantity is a small
    int); the only fractional per-group term, S_g^2/n_g, folds as
    floor(x * 2^20) so the cross-group reduction is an integer sum
    (order-independent — a double sum across groups would drift with
    aggregation order); the closed-form F from those integers is a
    handful of correctly-rounded IEEE ops replayed token-for-token by
    the oracle.

    Scale bounds, stated honestly: S_g^2 evaluates in double, so the
    folded integer is bit-exact only while S_g^2 < 2^53; past that BOTH
    engines replay the identical correctly-rounded IEEE product, so
    cross-engine agreement holds even though the "exact" label no longer
    does.  The fold itself dies when S_g^2/n_g reaches 2^43 (~n_g 3.5e9,
    sf ~ 2-3k): the bigint cast would overflow, where non-ANSI Spark
    silently NULLs while DuckDB errors — a latent divergence, so the
    Spark side asserts the bound and fails as loudly as the oracle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("bigint").alias("q")
    )
    per = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("q").alias("s_g"),
        F.sum(F.col("q") * F.col("q")).alias("ss_g"),
    )
    contrib_dbl = (
        F.col("s_g").cast("double") * F.col("s_g").cast("double")
        / F.col("n_g").cast("double")
        * F.lit(_ANOVA_FP)
    )
    # loud overflow guard: past ~sf 2-3k the fold exceeds bigint; Spark's
    # non-ANSI cast would silently NULL while the DuckDB oracle's CAST
    # errors — assert_true makes the failure symmetric (coalesce forces
    # the assertion to survive column pruning)
    guard = F.coalesce(
        F.assert_true(contrib_dbl < F.lit(float(1 << 63)), F.lit("anova fixed-point fold exceeds bigint; rerun with a smaller FP scale")).cast("bigint"),
        F.lit(0).cast("bigint"),
    )
    contrib_fp = F.floor(contrib_dbl).cast("bigint") + guard
    agg = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("ss_g").alias("sst"),
        F.sum(contrib_fp).alias("cfp"),
    )
    n = F.col("n").cast("double")
    k = F.col("k").cast("double")
    cdbl = F.col("cfp").cast("double") / F.lit(_ANOVA_FP)
    ssb = cdbl - F.col("s").cast("double") * F.col("s").cast("double") / n
    ssw = F.col("sst").cast("double") - cdbl
    f_stat = (ssb / (k - F.lit(1.0))) / (ssw / (n - k))
    return agg.select(
        F.col("k").alias("n_groups"),
        F.col("n").alias("n_rows"),
        F.round(ssb, 4).alias("ss_between"),
        F.round(ssw, 4).alias("ss_within"),
        F.round(f_stat, 6).alias("f_stat"),
    )


_ANOVA_SQL = f"""
WITH per AS (
  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s_g,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS ss_g
  FROM lineitem GROUP BY 1
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(s_g) AS BIGINT) AS s,
         CAST(SUM(ss_g) AS BIGINT) AS sst,
         CAST(SUM(CAST(FLOOR(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
              / CAST(n_g AS DOUBLE) * {_ANOVA_FP!r}) AS BIGINT)) AS BIGINT) AS cfp
  FROM per
)
SELECT k AS n_groups, CAST(n AS BIGINT) AS n_rows,
       ROUND(CAST(cfp AS DOUBLE) / {_ANOVA_FP!r}
             - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 4) AS ss_between,
       ROUND(CAST(sst AS DOUBLE) - CAST(cfp AS DOUBLE) / {_ANOVA_FP!r}, 4) AS ss_within,
       ROUND(((CAST(cfp AS DOUBLE) / {_ANOVA_FP!r}
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
             / ((CAST(sst AS DOUBLE) - CAST(cfp AS DOUBLE) / {_ANOVA_FP!r}) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6) AS f_stat
FROM agg
"""


def orders_seasonal_naive_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecasting baseline: predicted revenue for month
    m = actual revenue of the same month one year earlier — the
    benchmark every real forecasting model must beat, evaluated here
    with per-month absolute percentage error.  One exact-cents monthly
    aggregate (calendar-bounded), then lag(1) over a window PARTITIONED
    by month-of-year ordered by year — never a single-partition
    window; errors are exact-integer ratios."""
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("bigint")
    monthly = o.select(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo"), cents.alias("c")
    ).groupBy("yr", "mo").agg(F.sum("c").alias("rev_cents"))
    w = Window.partitionBy("mo").orderBy("yr")
    withf = monthly.withColumn("fc_cents", F.lag("rev_cents", 1).over(w)).filter(
        F.col("fc_cents").isNotNull()
    )
    ape = F.abs(F.col("rev_cents") - F.col("fc_cents")).cast("double") / F.col(
        "rev_cents"
    ).cast("double")
    return withf.select(
        F.col("yr").cast("bigint").alias("yr"),
        F.col("mo").cast("bigint").alias("mo"),
        (F.col("rev_cents").cast("double") / F.lit(100.0)).alias("actual"),
        (F.col("fc_cents").cast("double") / F.lit(100.0)).alias("forecast"),
        F.round(ape, 8).alias("abs_pct_err"),
    )


_SEAS_FC_SQL = """
WITH monthly AS (
  SELECT EXTRACT(year FROM o_orderdate) AS yr, EXTRACT(month FROM o_orderdate) AS mo,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1, 2
), withf AS (
  SELECT yr, mo, rev_cents,
         LAG(rev_cents, 1) OVER (PARTITION BY mo ORDER BY yr) AS fc_cents
  FROM monthly
)
SELECT CAST(yr AS BIGINT) AS yr, CAST(mo AS BIGINT) AS mo,
       CAST(rev_cents AS DOUBLE) / 100.0 AS actual,
       CAST(fc_cents AS DOUBLE) / 100.0 AS forecast,
       ROUND(CAST(ABS(rev_cents - fc_cents) AS DOUBLE) / CAST(rev_cents AS DOUBLE), 8) AS abs_pct_err
FROM withf WHERE fc_cents IS NOT NULL
"""


_RFM_ANCHOR = "1999-01-01"  # fixed "as of" date for recency


def customers_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic marketing-analytics scoring: per customer days-since-last-
    order, order count, and exact spend, each quintiled with the
    distributed two-pass ntile (``exact_ntile`` x3 — no global window
    touches the customer table), then classified into the standard
    segments.  Scores: 6 - recency quintile (recent = high), frequency
    and monetary quintiles directly.  All ties break on c_custkey, so
    the segmentation is a pure function of the data."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("bigint")
    per_cust = o.select("o_custkey", "o_orderdate", cents.alias("c")).groupBy(
        "o_custkey"
    ).agg(
        F.datediff(F.lit(_RFM_ANCHOR).cast("date"), F.max("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("recency_days"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.sum("c").alias("monetary_cents"),
    )
    # each exact_ntile issues two bounded driver actions (approxQuantile +
    # range counts); three chained ntiles would otherwise re-run the
    # orders scan + aggregate up to six times.  The frame is
    # customer-cardinality — cache it once and every pass reuses it.
    per_cust = per_cust.localCheckpoint(eager=True)
    d = exact_ntile(per_cust, "recency_days", "o_custkey", 5).withColumnRenamed(
        "bucket", "_rb"
    )
    d = exact_ntile(d, "frequency", "o_custkey", 5).withColumnRenamed("bucket", "_fb")
    d = exact_ntile(d, "monetary_cents", "o_custkey", 5).withColumnRenamed("bucket", "_mb")
    r = (F.lit(6) - F.col("_rb")).cast("bigint")
    f_ = F.col("_fb").cast("bigint")
    m = F.col("_mb").cast("bigint")
    segment = (
        F.when((r >= 4) & (f_ >= 4) & (m >= 4), F.lit("champions"))
        .when((r <= 2) & (f_ <= 2), F.lit("hibernating"))
        .when((r <= 2) & (f_ >= 3), F.lit("at_risk"))
        .when(f_ >= 4, F.lit("loyal"))
        .otherwise(F.lit("others"))
    )
    return (
        d.select(segment.alias("segment"), "monetary_cents")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            (F.sum("monetary_cents").cast("double") / F.lit(100.0)).alias("total_spend"),
        )
    )


_RFM_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE), DATE '{_RFM_ANCHOR}') AS BIGINT) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS monetary_cents
  FROM orders GROUP BY 1
), scored AS (
  SELECT o_custkey, monetary_cents,
         6 - NTILE(5) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS r,
         NTILE(5) OVER (ORDER BY frequency ASC, o_custkey ASC) AS f,
         NTILE(5) OVER (ORDER BY monetary_cents ASC, o_custkey ASC) AS m
  FROM per_cust
), seg AS (
  SELECT monetary_cents,
         CASE WHEN r >= 4 AND f >= 4 AND m >= 4 THEN 'champions'
              WHEN r <= 2 AND f <= 2 THEN 'hibernating'
              WHEN r <= 2 AND f >= 3 THEN 'at_risk'
              WHEN f >= 4 THEN 'loyal'
              ELSE 'others' END AS segment
  FROM scored
)
SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(monetary_cents AS HUGEINT)) AS DOUBLE) / 100.0 AS total_spend
FROM seg GROUP BY 1
"""


_AQP_PCT = 64  # keep 1/64 of rows: md5 bucket 0 of 64 (power of two: exact)


def aqp_revenue_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing (the BlinkDB shape): estimate total
    revenue per returnflag from a DETERMINISTIC 1/64 row sample — at
    100 TB the sample scan reads ~1.6% of the data for an answer whose
    error the query itself reports.  The sample predicate is
    md5(l_orderkey || '|' || l_linenumber) bucket 0 (replayable in the
    oracle, unlike TABLESAMPLE), estimates scale by 64, and the output
    carries exact value + relative error + a 3-standard-error bound
    flag (sigma from the sample's own variance, the AQP discipline of
    the sketch operators).  Exact side exists for the oracle check; a
    production caller runs only the sample branch."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice", "l_discount"
    )
    rev_fp = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(100.0)
        + F.lit(0.5)
    ).cast("bigint")  # exact cents
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("l_orderkey").cast("string"),
                    F.lit("|"),
                    F.col("l_linenumber").cast("string"),
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    rows = li.select("l_returnflag", rev_fp.alias("r"), F.pmod(h, F.lit(_AQP_PCT)).alias("b"))
    sample = rows.filter(F.col("b") == 0)
    est = sample.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        F.sum("r").alias("s"),
        F.sum(F.col("r").cast("decimal(38,0)") * F.col("r").cast("decimal(38,0)")).alias("ss"),
    )
    exact = rows.groupBy("l_returnflag").agg(F.sum("r").alias("s_exact"))
    j = est.join(exact, "l_returnflag")
    n = F.col("n_sampled").cast("double")
    mean = F.col("s").cast("double") / n
    var = F.col("ss").cast("double") / n - mean * mean
    est_total = F.col("s").cast("double") * F.lit(float(_AQP_PCT))
    exact_d = F.col("s_exact").cast("double")
    # 3-sigma of the scaled-sum estimator, P*sqrt(n*var) for an n-of-N
    # uniform sample (finite-population factor omitted: wider CI); the
    # expression shape matches the oracle token-for-token so the one
    # float comparison is engine-identical
    bound = F.lit(3.0) * F.lit(float(_AQP_PCT)) * F.sqrt(n * var)
    return j.select(
        "l_returnflag",
        "n_sampled",
        F.round(est_total / F.lit(100.0), 2).alias("est_revenue"),
        F.round(exact_d / F.lit(100.0), 2).alias("exact_revenue"),
        (F.abs(est_total - exact_d) <= bound).alias("within_3se"),
    )


_AQP_SQL = f"""
WITH rows AS (
  SELECT l_returnflag,
         CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT) AS r,
         CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)), 1, 15))::UBIGINT % {_AQP_PCT} AS BIGINT) AS b
  FROM lineitem
), est AS (
  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_sampled,
         CAST(SUM(r) AS BIGINT) AS s,
         CAST(SUM(CAST(r AS HUGEINT) * r) AS HUGEINT) AS ss
  FROM rows WHERE b = 0 GROUP BY 1
), exact AS (
  SELECT l_returnflag, CAST(SUM(r) AS BIGINT) AS s_exact FROM rows GROUP BY 1
)
SELECT e.l_returnflag, e.n_sampled,
       ROUND(CAST(e.s AS DOUBLE) * {_AQP_PCT} / 100.0, 2) AS est_revenue,
       ROUND(CAST(x.s_exact AS DOUBLE) / 100.0, 2) AS exact_revenue,
       ABS(CAST(e.s AS DOUBLE) * {_AQP_PCT} - CAST(x.s_exact AS DOUBLE))
         <= 3.0 * {_AQP_PCT} * SQRT(CAST(e.n_sampled AS DOUBLE)
            * (CAST(e.ss AS DOUBLE) / e.n_sampled
               - (CAST(e.s AS DOUBLE) / e.n_sampled) * (CAST(e.s AS DOUBLE) / e.n_sampled)))
         AS within_3se
FROM est e JOIN exact x USING (l_returnflag)
"""


_SKEW_TOP = 10


def diag_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight join-skew diagnostic: the heaviest join keys on the
    fact side, each with its share of all rows and its load ratio vs the
    mean key — the check that decides between a plain shuffle join,
    salting, and AQE skew handling BEFORE burning a cluster-hour.  One
    hash agg + one metadata-sized top-k; exact int/int double divisions
    so the report hash-checks."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    per_key = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    stats = per_key.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("n").cast("bigint").alias("n_rows"),
    )
    top = per_key.orderBy(F.desc("n"), F.asc("l_orderkey")).limit(_SKEW_TOP)
    return top.crossJoin(F.broadcast(stats)).select(
        "l_orderkey",
        F.col("n").alias("n_rows_key"),
        (F.col("n").cast("double") / F.col("n_rows")).alias("share"),
        (
            F.col("n").cast("double") * F.col("n_keys").cast("double")
            / F.col("n_rows").cast("double")
        ).alias("skew_ratio"),
    )


_SKEW_SQL = f"""
WITH per_key AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY 1
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys, CAST(SUM(n) AS BIGINT) AS n_rows FROM per_key
), top AS (
  SELECT l_orderkey, n FROM per_key ORDER BY n DESC, l_orderkey ASC LIMIT {_SKEW_TOP}
)
SELECT t.l_orderkey, t.n AS n_rows_key,
       CAST(t.n AS DOUBLE) / s.n_rows AS share,
       CAST(t.n AS DOUBLE) * CAST(s.n_keys AS DOUBLE) / CAST(s.n_rows AS DOUBLE) AS skew_ratio
FROM top t CROSS JOIN stats s
"""


_BASKET_TOP = 20


def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top part pairs ordered together.

    The classic frequent-itemset counting shape, scale-safe because the
    self-join blocks are ORDER-sized (TPC-H orders hold <= 7 distinct
    parts; real baskets are similarly bounded), so the pair expansion is
    linear in orders times k^2, never corpus-quadratic.  Distinct
    (order, part) first — a part appearing on two lines of one order
    must not double-count the pair; top-k via one global
    TakeOrderedAndProject with full (n, pa, pb) tie-break."""
    counted = co_purchase_pairs(spark, sf_dir).groupBy("part_a", "part_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    return counted.orderBy(
        F.desc("n_orders"), F.asc("part_a"), F.asc("part_b")
    ).limit(_BASKET_TOP)


def co_purchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (order, unordered part pair) co-occurrence, in the
    (part_a < part_b) orientation.  Distinct (order, part) first so a
    part on two lines of one order cannot double-count; the self-join
    blocks are order-sized, so the expansion is linear in orders.
    Shared by the market-basket count and the triangle-counting edge
    builder (``operators/graph.py``) so the pair semantics cannot
    drift between them — ``CO_PURCHASE_PAIRS_SQL`` is the matching
    oracle fragment."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.alias("a")
    b = li.alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
    )


#: oracle CTE fragment matching co_purchase_pairs — embed as
#: ``WITH {CO_PURCHASE_PAIRS_SQL}, ...`` and select from ``pairs``
CO_PURCHASE_PAIRS_SQL = """d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)"""


_BASKET_SQL = f"""
WITH {CO_PURCHASE_PAIRS_SQL}
SELECT part_a, part_b, COUNT(*) AS n_orders
FROM pairs GROUP BY 1, 2
ORDER BY n_orders DESC, part_a ASC, part_b ASC
LIMIT {_BASKET_TOP}
"""




def table_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics for the optimizer surface: per
    column exact NDV, null count, and min/max — the stats a cost-based
    optimizer feeds on, computed in ONE scan (every counter is a branch
    of a single aggregate; no per-column re-scan).  Min/max render
    per-type deterministically (ints verbatim, money as exact cents,
    timestamps via an explicit format) so one string schema serves all
    columns without cross-engine float-formatting drift."""
    o = load_table(spark, sf_dir, "orders")
    cents_min = F.floor(F.min("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("bigint")
    cents_max = F.floor(F.max("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("bigint")
    renders = {
        "o_orderkey": (F.min("o_orderkey").cast("string"), F.max("o_orderkey").cast("string")),
        "o_custkey": (F.min("o_custkey").cast("string"), F.max("o_custkey").cast("string")),
        "o_orderstatus": (F.min("o_orderstatus"), F.max("o_orderstatus")),
        "o_totalprice": (cents_min.cast("string"), cents_max.cast("string")),
        "o_orderdate": (
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd"),
        ),
    }
    cols = tuple(renders)
    agg = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        *[F.countDistinct(c).cast("bigint").alias(f"ndv_{i}") for i, c in enumerate(cols)],
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint").alias(f"nul_{i}")
            for i, c in enumerate(cols)
        ],
        *[renders[c][0].alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[renders[c][1].alias(f"mx_{i}") for i, c in enumerate(cols)],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"ndv_{i}").alias("ndv"),
                F.col(f"nul_{i}").alias("n_nulls"),
                F.col(f"mn_{i}").alias("min_str"),
                F.col(f"mx_{i}").alias("max_str"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return agg.select(F.explode(rows).alias("s")).select("s.*")


_TABLE_STATS_SQL = """
WITH s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM orders
)
SELECT 'o_orderkey' AS column, s.n_rows,
       (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders) AS ndv,
       (SELECT CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders) AS n_nulls,
       (SELECT CAST(MIN(o_orderkey) AS VARCHAR) FROM orders) AS min_str,
       (SELECT CAST(MAX(o_orderkey) AS VARCHAR) FROM orders) AS max_str
FROM s
UNION ALL
SELECT 'o_custkey', s.n_rows,
       (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders),
       (SELECT CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders),
       (SELECT CAST(MIN(o_custkey) AS VARCHAR) FROM orders),
       (SELECT CAST(MAX(o_custkey) AS VARCHAR) FROM orders)
FROM s
UNION ALL
SELECT 'o_orderstatus', s.n_rows,
       (SELECT CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) FROM orders),
       (SELECT CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders),
       (SELECT MIN(o_orderstatus) FROM orders),
       (SELECT MAX(o_orderstatus) FROM orders)
FROM s
UNION ALL
SELECT 'o_totalprice', s.n_rows,
       (SELECT CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) FROM orders),
       (SELECT CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders),
       (SELECT CAST(CAST(FLOOR(MIN(o_totalprice) * 100.0 + 0.5) AS BIGINT) AS VARCHAR) FROM orders),
       (SELECT CAST(CAST(FLOOR(MAX(o_totalprice) * 100.0 + 0.5) AS BIGINT) AS VARCHAR) FROM orders)
FROM s
UNION ALL
SELECT 'o_orderdate', s.n_rows,
       (SELECT CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) FROM orders),
       (SELECT CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders),
       (SELECT strftime(MIN(o_orderdate), '%Y-%m-%d') FROM orders),
       (SELECT strftime(MAX(o_orderdate), '%Y-%m-%d') FROM orders)
FROM s
"""


_ASSOC_TOP = 15


def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule metrics over the top co-purchase pairs: support,
    confidence P(b|a), and lift P(ab)/(P(a)P(b)) — the decision layer on
    the raw pair counts (a frequent pair of two individually-frequent
    parts is uninteresting; lift > 1 is the signal).

    Per-part basket counts are a second metadata-scale agg broadcast to
    the pair table; every metric is an exact-integer ratio evaluated
    with identical expression shapes in both engines."""
    pairs = co_purchase_pairs(spark, sf_dir).groupBy("part_a", "part_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ab")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    per_part = li.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("bigint").alias("n_p"))
    n_orders = li.select("l_orderkey").distinct().count()  # 1 scalar, bounded
    top = pairs.orderBy(F.desc("n_ab"), F.asc("part_a"), F.asc("part_b")).limit(_ASSOC_TOP)
    j = (
        top.join(
            F.broadcast(per_part.withColumnRenamed("l_partkey", "part_a").withColumnRenamed("n_p", "n_a")),
            "part_a",
        )
        .join(
            F.broadcast(per_part.withColumnRenamed("l_partkey", "part_b").withColumnRenamed("n_p", "n_b")),
            "part_b",
        )
    )
    nn = F.lit(float(n_orders))
    return j.select(
        "part_a",
        "part_b",
        "n_ab",
        F.round(F.col("n_ab").cast("double") / nn, 8).alias("support"),
        F.round(F.col("n_ab").cast("double") / F.col("n_a").cast("double"), 8).alias("confidence"),
        F.round(
            F.col("n_ab").cast("double") * nn
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
            6,
        ).alias("lift"),
    )


_ASSOC_SQL = f"""
WITH {CO_PURCHASE_PAIRS_SQL},
pc AS (
  SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS n_ab FROM pairs GROUP BY 1, 2
), d2 AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), per_part AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_p FROM d2 GROUP BY 1
), tot AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n FROM d2
), top AS (
  SELECT part_a, part_b, n_ab FROM pc ORDER BY n_ab DESC, part_a ASC, part_b ASC LIMIT {_ASSOC_TOP}
)
SELECT t.part_a, t.part_b, t.n_ab,
       ROUND(CAST(t.n_ab AS DOUBLE) / tot.n, 8) AS support,
       ROUND(CAST(t.n_ab AS DOUBLE) / CAST(a.n_p AS DOUBLE), 8) AS confidence,
       ROUND(CAST(t.n_ab AS DOUBLE) * tot.n / (CAST(a.n_p AS DOUBLE) * CAST(b.n_p AS DOUBLE)), 6) AS lift
FROM top t
JOIN per_part a ON a.l_partkey = t.part_a
JOIN per_part b ON b.l_partkey = t.part_b
CROSS JOIN tot
"""


def events_ab_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on a deterministic A/B assignment: users
    split by id parity, outcome = did-purchase; z = (p1-p2) /
    sqrt(p(1-p)(1/n1+1/n2)) — the experiment-readout primitive, with
    the null correctly not rejected on the synthetic feed.  All inputs
    are exact integers; the z closed form is a few correctly-rounded
    IEEE ops mirrored token-for-token by the oracle."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    # outcome must be non-degenerate (every fixture user purchases at
    # least once, which would zero the pooled variance): converted =
    # made a HIGH-VALUE purchase
    per_user = e.groupBy("user_id").agg(
        F.max(
            ((F.col("event_type") == "purchase") & (F.col("value") > F.lit(150.0))).cast("int")
        ).alias("converted")
    )
    grp = per_user.groupBy(F.pmod(F.col("user_id"), F.lit(2)).alias("variant")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("converted").cast("bigint").alias("conv"),
    )
    # variant is pmod(_, 2): each filtered side is exactly one group
    # row; limit(1) makes that bound PLAN-VISIBLE so the cross-join
    # guard (plans/introspect.py::unbounded_cross_joins) can prove it
    a = grp.filter(F.col("variant") == 0).limit(1).select(
        F.col("n").alias("n_a"), F.col("conv").alias("c_a")
    )
    b = grp.filter(F.col("variant") == 1).limit(1).select(
        F.col("n").alias("n_b"), F.col("conv").alias("c_b")
    )
    j = a.crossJoin(b)
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ca, cb = F.col("c_a").cast("double"), F.col("c_b").cast("double")
    p1, p2 = ca / na, cb / nb
    pp = (ca + cb) / (na + nb)
    z = (p1 - p2) / F.sqrt(pp * (F.lit(1.0) - pp) * (F.lit(1.0) / na + F.lit(1.0) / nb))
    return j.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        F.round(p1, 8).alias("rate_a"),
        F.round(p2, 8).alias("rate_b"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) < F.lit(1.96)).alias("null_retained"),
    )


_ABTEST_SQL = """
WITH per_user AS (
  SELECT user_id, MAX(CASE WHEN event_type = 'purchase' AND value > 150.0 THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1
), grp AS (
  SELECT user_id % 2 AS variant, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(converted) AS BIGINT) AS conv
  FROM per_user GROUP BY 1
), a AS (SELECT n AS n_a, conv AS c_a FROM grp WHERE variant = 0),
b AS (SELECT n AS n_b, conv AS c_b FROM grp WHERE variant = 1)
SELECT n_a, c_a, n_b, c_b,
       ROUND(CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE), 8) AS rate_a,
       ROUND(CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE), 8) AS rate_b,
       ROUND((CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             / SQRT((CAST(c_a AS DOUBLE) + CAST(c_b AS DOUBLE)) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                    * (1.0 - (CAST(c_a AS DOUBLE) + CAST(c_b AS DOUBLE)) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                    * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6) AS z_score,
       ABS((CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
           / SQRT((CAST(c_a AS DOUBLE) + CAST(c_b AS DOUBLE)) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                  * (1.0 - (CAST(c_a AS DOUBLE) + CAST(c_b AS DOUBLE)) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                  * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))) < 1.96 AS null_retained
FROM a CROSS JOIN b
"""


_CHI_FP = float(1 << 20)


def docs_chisq_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of lang x source — the categorical
    complement to the numeric PSI drift monitor: are documents' language
    and source independent?

    ONE scan of the table (the observed-cell hash agg); marginals, the
    total, and the dimension counts all derive from that metadata-scale
    contingency table, never from re-scanning the fact table.  The FULL
    cell grid (distinct langs x distinct sources) is rebuilt from the
    marginals so zero-observed cells still contribute their expected
    mass — omitting them understates the statistic.  Cell terms are
    folded as floor(term * 2^20) fixed-point integers, so the
    cross-cell sum is order-independent and hash-exact; dof =
    (R-1)(C-1)."""
    d = load_table(spark, sf_dir, "documents")
    obs = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    obs = obs.localCheckpoint(eager=True)  # cell table: computed once, tiny
    rt = obs.groupBy("lang").agg(F.sum("o").alias("rt"))
    ct = obs.groupBy("source").agg(F.sum("o").alias("ct"))
    n = obs.agg(F.sum("o").alias("n"))
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .join(obs, ["lang", "source"], "left")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "source",
            F.coalesce("o", F.lit(0)).cast("double").alias("o"),
            (F.col("rt").cast("double") * F.col("ct") / F.col("n")).alias("e"),
        )
    )
    term = (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")
    cells = grid.select(F.floor(term * F.lit(_CHI_FP)).alias("t_fp"))
    dims = rt.agg(F.count(F.lit(1)).alias("r")).crossJoin(
        F.broadcast(ct.agg(F.count(F.lit(1)).alias("c")))
    )
    return (
        cells.agg(F.sum("t_fp").alias("s"))
        .crossJoin(F.broadcast(dims))
        .crossJoin(F.broadcast(n))
        .select(
            F.round(F.col("s").cast("double") / F.lit(_CHI_FP), 4).alias("chi2"),
            ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"),
            F.col("n").alias("n_docs"),
        )
    )


_CHISQ_SQL = f"""
WITH obs AS (SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2),
rt AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS rt FROM obs GROUP BY 1),
ct AS (SELECT source, CAST(SUM(o) AS BIGINT) AS ct FROM obs GROUP BY 1),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
grid AS (
  SELECT rt.lang, ct.source,
         CAST(COALESCE(obs.o, 0) AS DOUBLE) AS o,
         CAST(rt.rt AS DOUBLE) * ct.ct / tot.n AS e
  FROM rt CROSS JOIN ct
  LEFT JOIN obs ON obs.lang = rt.lang AND obs.source = ct.source
  CROSS JOIN tot
), cells AS (
  SELECT CAST(FLOOR((o - e) * (o - e) / e * {_CHI_FP}) AS BIGINT) AS t_fp FROM grid
)
SELECT ROUND(CAST(CAST(SUM(t_fp) AS BIGINT) AS DOUBLE) / {_CHI_FP}, 4) AS chi2,
       CAST((SELECT COUNT(*) - 1 FROM rt) * (SELECT COUNT(*) - 1 FROM ct) AS BIGINT) AS dof,
       (SELECT n FROM tot) AS n_docs
FROM cells
"""


# ----------------------------------------------------- ABC / Pareto

_ABC_A, _ABC_B = 80, 95  # cumulative-revenue percent thresholds


def parts_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of parts by revenue: class A = parts
    covering the first 80% of cumulative revenue, B to 95%, C the tail —
    the inventory-prioritization classic.

    The fact-table scan reduces to a per-part DECIMAL revenue aggregate
    first (part-cardinality, metadata-scale next to lineitem); the
    cumulative share is a window over the deterministic (revenue DESC,
    partkey) total order of THAT aggregate.  Classification compares
    exact decimals — ``cum_prev * 100 < total * THRESH`` — so no float
    enters until the output revenue column; using the cumulative BEFORE
    each part means the part whose inclusion crosses 80% still lands in
    A (textbook convention)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(28,4)")
    per_part = li.groupBy("l_partkey").agg(F.sum(rev).alias("revenue"))
    total = per_part.agg(F.sum("revenue").alias("total"))
    # a part is classed by the cumulative BEFORE it: the part whose
    # inclusion crosses 80% still belongs to A (textbook convention)
    wprev = Window.orderBy(F.desc("revenue"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    classed = (
        per_part.withColumn("cum_prev", F.coalesce(F.sum("revenue").over(wprev), F.lit(0).cast("decimal(28,4)")))
        .crossJoin(F.broadcast(total))
        .withColumn(
            "abc_class",
            F.when(F.col("cum_prev") * 100 < F.col("total") * _ABC_A, "A")
            .when(F.col("cum_prev") * 100 < F.col("total") * _ABC_B, "B")
            .otherwise("C"),
        )
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("revenue").cast("double").alias("class_revenue"),
        F.min("l_partkey").cast("bigint").alias("min_partkey"),
    )


_ABC_SQL = f"""
WITH per_part AS (
  SELECT l_partkey,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                  AS DECIMAL(28,4))) AS DECIMAL(28,4)) AS revenue
  FROM lineitem GROUP BY 1
), t AS (SELECT SUM(revenue) AS total FROM per_part),
c AS (
  SELECT l_partkey, revenue,
         COALESCE(SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey ASC
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS cum_prev
  FROM per_part
), classed AS (
  SELECT l_partkey, revenue,
         CASE WHEN cum_prev * 100 < t.total * {_ABC_A} THEN 'A'
              WHEN cum_prev * 100 < t.total * {_ABC_B} THEN 'B'
              ELSE 'C' END AS abc_class
  FROM c CROSS JOIN t
)
SELECT abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(revenue) AS DOUBLE) AS class_revenue,
       CAST(MIN(l_partkey) AS BIGINT) AS min_partkey
FROM classed GROUP BY 1
"""


# ------------------------------------------------- portable HyperLogLog

_HLL_M = 64  # registers (p=6); relative std error 1.04/sqrt(64) ~ 13%
_HLL_CAP = 55  # rho cap (60-bit hash, 6 index bits, 54 payload bits)
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)


def sketch_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type via a PORTABLE HyperLogLog — the
    mergeable sketch shape (per-register MAX commutes with any union /
    partitioning / merge schedule), built from md5-derived hashes so the
    registers replay bit-identically in DuckDB (Spark's own
    approx_count_distinct HLL++ is JVM-internal and unreplayable —
    that variant stays oracle-checked via exact value + in-bounds flag).

    Hash = low 60 bits of md5(user_id); register j = hash % m; rank =
    trailing-zero count of the remaining 54 bits + 1 (P(rank >= k) =
    2^-k, computed as log2(x & -x) — exact on powers of two).  The
    harmonic sum folds 2^(CAP - r) integers, so the cross-register
    reduction is exact; the only floats are the final closed form and
    the linear-counting ln().  Output carries the exact distinct count
    and an in-bounds flag (<= 3 standard errors), the oracle discipline
    of the other sketch operators."""
    e = load_table(spark, sf_dir, "events")
    regs = hll_registers(e)
    exact = e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_exact"))
    return hll_finalize(regs, exact)


def hll_registers(e: DataFrame) -> DataFrame:
    """(event_type, j, r): the m max-rank registers per group — the
    MERGEABLE state: registers of any union of event sets are the
    elementwise max of the parts' registers."""
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("bigint")
    # exact floor-div via a bit shift: `/` would route through DOUBLE and
    # round the 60-bit hash to 53 bits of mantissa, zeroing exactly the
    # trailing bits the rank function reads (caught at sf0.01: estimate
    # 229 vs the exact 180)
    rest = F.shiftrightunsigned(h, 6)  # h // 64, h >= 0
    rho = (
        F.when(rest == 0, F.lit(_HLL_CAP))
        .otherwise((F.log2((rest.bitwiseAND(-rest)).cast("double")) + F.lit(1.0)).cast("int"))
    )
    return (
        e.select("event_type", (h % F.lit(_HLL_M)).alias("j"), rho.alias("rho"))
        .groupBy("event_type", "j")
        .agg(F.max("rho").alias("r"))
    )


def hll_finalize(regs: DataFrame, exact: DataFrame) -> DataFrame:
    """Registers -> estimate (+ exact count and the 3-standard-error
    in-bounds flag, the oracle discipline of the sketch operators)."""
    per = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nonzero"),
        # SQL shiftleft: the Python API only takes a literal shift amount
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_CAP} - r)")).alias("ssum"),
    )
    v = F.lit(_HLL_M) - F.col("nonzero")
    harm = (F.col("ssum") + v.cast("bigint") * F.lit(1 << _HLL_CAP)).cast("double") / F.lit(
        float(1 << _HLL_CAP)
    )
    e_raw = F.lit(_HLL_ALPHA * _HLL_M * _HLL_M) / harm
    e_lc = F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / v.cast("double"))
    est = F.when((e_raw <= F.lit(2.5 * _HLL_M)) & (v > 0), e_lc).otherwise(e_raw)
    return (
        per.join(exact, "event_type")
        .select(
            "event_type",
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.round(est, 4).alias("hll_estimate"),
            (
                F.abs(est - F.col("n_exact").cast("double"))
                / F.col("n_exact").cast("double")
                <= F.lit(3 * 1.04 / (_HLL_M**0.5))
            ).alias("within_3se"),
        )
    )


_HLL_SQL = f"""
WITH h AS (
  SELECT event_type, user_id,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT AS BIGINT) AS hv
  FROM events
), rr AS (
  SELECT event_type, hv % {_HLL_M} AS j,
         CASE WHEN hv // {_HLL_M} = 0 THEN {_HLL_CAP}
              ELSE CAST(log2(CAST(((hv // {_HLL_M}) & -(hv // {_HLL_M})) AS DOUBLE)) + 1.0 AS INT)
         END AS rho
  FROM h
), regs AS (
  SELECT event_type, j, MAX(rho) AS r FROM rr GROUP BY 1, 2
), per AS (
  SELECT event_type, COUNT(*) AS nonzero,
         CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_CAP} - r)) AS BIGINT) AS ssum
  FROM regs GROUP BY 1
), est AS (
  SELECT event_type, nonzero, ssum,
         ({_HLL_M} - nonzero) AS v,
         CAST(ssum + ({_HLL_M} - nonzero) * CAST({1 << _HLL_CAP} AS BIGINT) AS DOUBLE)
           / {float(1 << _HLL_CAP)} AS harm
  FROM per
), fin AS (
  SELECT event_type,
         CASE WHEN ({_HLL_ALPHA * _HLL_M * _HLL_M} / harm) <= {2.5 * _HLL_M} AND v > 0
              THEN {float(_HLL_M)} * LN({float(_HLL_M)} / CAST(v AS DOUBLE))
              ELSE {_HLL_ALPHA * _HLL_M * _HLL_M} / harm END AS est
  FROM est
), ex AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact FROM events GROUP BY 1
)
SELECT f.event_type, ex.n_exact,
       ROUND(f.est, 4) AS hll_estimate,
       (ABS(f.est - CAST(ex.n_exact AS DOUBLE)) / CAST(ex.n_exact AS DOUBLE)
        <= {3 * 1.04 / (_HLL_M ** 0.5)}) AS within_3se
FROM fin f JOIN ex ON ex.event_type = f.event_type
"""


_KMV_K = 64  # bottom-k sketch size; rse ~ 1/sqrt(k-2) ~ 13%
_KMV_SCALE = float(1 << 60)  # hash domain for the [0,1) normalization


def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set algebra between event audiences via BOTTOM-K (KMV /
    theta) sketches — the mergeable structure warehouse engines ship for
    COUNT(DISTINCT) set operations: a set's sketch is its k smallest
    md5-derived hashes, the union sketch is the k smallest of a merged
    bag (min-merge, commutative/associative/idempotent), and the
    intersection estimate counts common hashes below theta =
    min(theta_a, theta_b) scaled by 1/theta.

    For every event-type pair: estimated |A|, |B|, |A union B|,
    |A intersect B| with the exact values alongside and in-bounds flags
    (<= 3 relative standard errors; the intersection inherits the union
    bound via inclusion-exclusion).  Sets smaller than k are estimated
    EXACTLY (the sketch holds the whole set; both engines take the same
    branch).  All hash ranks are integer; estimates are single double
    divisions of exact integers."""
    e = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("bigint")
    hashed = e.select("event_type", h.alias("h")).distinct()
    wr = Window.partitionBy("event_type").orderBy("h")
    sk = hashed.withColumn("rk", F.row_number().over(wr)).filter(F.col("rk") <= _KMV_K)
    sizes = hashed.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_exact"))

    a = sk.select(F.col("event_type").alias("ta"), F.col("h").alias("ha"), F.col("rk").alias("ra"))
    b = sk.select(F.col("event_type").alias("tb"), F.col("h").alias("hb"), F.col("rk").alias("rb"))

    theta = sk.filter(F.col("rk") == _KMV_K).select(
        "event_type", F.col("h").alias("theta")
    )
    per_set = sizes.join(theta, "event_type", "left")

    pa = per_set.select(
        F.col("event_type").alias("ta"),
        F.col("n_exact").alias("na"),
        F.col("theta").alias("theta_a"),
    )
    pb = per_set.select(
        F.col("event_type").alias("tb"),
        F.col("n_exact").alias("nb"),
        F.col("theta").alias("theta_b"),
    )
    pairs = pa.crossJoin(pb).filter(F.col("ta") < F.col("tb"))
    # union sketch: k smallest of both sketches' merged hash bag — built
    # pair-wise by fanning each sketch out to its partner types (the fan
    # is types-cardinality, metadata-scale)
    ua = a.crossJoin(b.select("tb").distinct()).filter(F.col("ta") < F.col("tb")).select("ta", "tb", F.col("ha").alias("h"))
    ub = b.crossJoin(a.select("ta").distinct()).filter(F.col("ta") < F.col("tb")).select("ta", "tb", F.col("hb").alias("h"))
    ubag = ua.unionByName(ub).distinct()
    wu = Window.partitionBy("ta", "tb").orderBy("h")
    usk = ubag.withColumn("urk", F.row_number().over(wu))
    utheta = usk.filter(F.col("urk") == _KMV_K).select("ta", "tb", F.col("h").alias("theta_u"))
    ucnt = ubag.groupBy("ta", "tb").agg(F.count(F.lit(1)).alias("cu"))
    # common sketch hashes below min(theta): the theta-sketch intersection
    common = (
        a.join(b, (F.col("ha") == F.col("hb")) & (F.col("ta") < F.col("tb")))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("cc"))
    )
    exact_pairs = (
        hashed.select(F.col("event_type").alias("ta"), F.col("h").alias("h"))
        .join(hashed.select(F.col("event_type").alias("tb"), F.col("h").alias("h")), "h")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    j = (
        pairs.join(utheta, ["ta", "tb"], "left")
        .join(ucnt, ["ta", "tb"], "left")
        .join(common, ["ta", "tb"], "left")
        .join(exact_pairs, ["ta", "tb"], "left")
    )
    min_theta = F.least(
        F.coalesce("theta_a", F.lit(1 << 62)), F.coalesce("theta_b", F.lit(1 << 62))
    )
    est_u = F.when(F.col("cu") < _KMV_K, F.col("cu").cast("double")).otherwise(
        F.lit(_KMV_K - 1) * F.lit(_KMV_SCALE) / F.col("theta_u").cast("double")
    )
    # common-below-theta count scaled by the hash domain / min theta
    cc_below = F.coalesce("cc", F.lit(0))
    # BOTH sketches whole (both sets < k): the common count IS the exact
    # intersection.  With one side sampled, the otherwise-branch scaling
    # by min(theta) is still correct (the nulls coalesce to the domain
    # max, so min(theta) is the sampled side's theta) — an OR here would
    # return the unscaled count for mixed small/large pairs and bias the
    # estimate toward zero.
    est_i = F.when(
        F.col("theta_a").isNull() & F.col("theta_b").isNull(),
        cc_below.cast("double"),
    ).otherwise(cc_below.cast("double") * F.lit(_KMV_SCALE) / min_theta.cast("double"))
    exact_union = F.col("na") + F.col("nb") - F.coalesce("exact_inter", F.lit(0))
    rse3 = 3.0 / (_KMV_K - 2) ** 0.5
    return j.select(
        "ta",
        "tb",
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        exact_union.cast("bigint").alias("exact_union"),
        F.coalesce("exact_inter", F.lit(0)).cast("bigint").alias("exact_inter"),
        F.round(est_u, 4).alias("est_union"),
        F.round(est_i, 4).alias("est_inter"),
        (F.abs(est_u - exact_union.cast("double")) / exact_union <= F.lit(rse3)).alias(
            "union_within_3se"
        ),
    )


_KMV_SQL = f"""
WITH hashed AS (
  SELECT DISTINCT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT AS BIGINT) AS h
  FROM events
), sk AS (
  SELECT event_type, h, rk FROM (
    SELECT event_type, h, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
    FROM hashed
  ) WHERE rk <= {_KMV_K}
), sizes AS (
  SELECT event_type, COUNT(*) AS n_exact FROM hashed GROUP BY 1
), theta AS (
  SELECT event_type, h AS theta FROM sk WHERE rk = {_KMV_K}
), per_set AS (
  SELECT s.event_type, s.n_exact, t.theta
  FROM sizes s LEFT JOIN theta t ON t.event_type = s.event_type
), pairs AS (
  SELECT a.event_type AS ta, a.n_exact AS na, a.theta AS theta_a,
         b.event_type AS tb, b.n_exact AS nb, b.theta AS theta_b
  FROM per_set a CROSS JOIN per_set b
  WHERE a.event_type < b.event_type
), ubag AS (
  SELECT DISTINCT p.ta, p.tb, s.h
  FROM pairs p JOIN sk s ON s.event_type IN (p.ta, p.tb)
), usk AS (
  SELECT ta, tb, h, ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY h) AS urk FROM ubag
), utheta AS (
  SELECT ta, tb, h AS theta_u FROM usk WHERE urk = {_KMV_K}
), ucnt AS (
  SELECT ta, tb, COUNT(*) AS cu FROM ubag GROUP BY 1, 2
), common AS (
  SELECT sa.event_type AS ta, sb.event_type AS tb, COUNT(*) AS cc
  FROM sk sa JOIN sk sb ON sa.h = sb.h AND sa.event_type < sb.event_type
  GROUP BY 1, 2
), exact_pairs AS (
  SELECT ha.event_type AS ta, hb.event_type AS tb, COUNT(*) AS exact_inter
  FROM hashed ha JOIN hashed hb ON ha.h = hb.h AND ha.event_type < hb.event_type
  GROUP BY 1, 2
)
SELECT p.ta, p.tb,
       CAST(p.na AS BIGINT) AS n_a,
       CAST(p.nb AS BIGINT) AS n_b,
       CAST(p.na + p.nb - COALESCE(e.exact_inter, 0) AS BIGINT) AS exact_union,
       CAST(COALESCE(e.exact_inter, 0) AS BIGINT) AS exact_inter,
       ROUND(CASE WHEN uc.cu < {_KMV_K} THEN CAST(uc.cu AS DOUBLE)
                  ELSE {_KMV_K - 1} * {_KMV_SCALE} / CAST(ut.theta_u AS DOUBLE) END, 4) AS est_union,
       ROUND(CASE WHEN p.theta_a IS NULL AND p.theta_b IS NULL THEN CAST(COALESCE(c.cc, 0) AS DOUBLE)
                  ELSE CAST(COALESCE(c.cc, 0) AS DOUBLE) * {_KMV_SCALE}
                       / CAST(LEAST(COALESCE(p.theta_a, {1 << 62}), COALESCE(p.theta_b, {1 << 62})) AS DOUBLE)
             END, 4) AS est_inter,
       (ABS(CASE WHEN uc.cu < {_KMV_K} THEN CAST(uc.cu AS DOUBLE)
                 ELSE {_KMV_K - 1} * {_KMV_SCALE} / CAST(ut.theta_u AS DOUBLE) END
            - CAST(p.na + p.nb - COALESCE(e.exact_inter, 0) AS DOUBLE))
        / (p.na + p.nb - COALESCE(e.exact_inter, 0)) <= {3.0 / (_KMV_K - 2) ** 0.5}) AS union_within_3se
FROM pairs p
LEFT JOIN utheta ut ON ut.ta = p.ta AND ut.tb = p.tb
LEFT JOIN ucnt uc ON uc.ta = p.ta AND uc.tb = p.tb
LEFT JOIN common c ON c.ta = p.ta AND c.tb = p.tb
LEFT JOIN exact_pairs e ON e.ta = p.ta AND e.tb = p.tb
"""


_BKQ_K = 256  # bottom-k sample size
#: DKW(delta=0.05) rank-error bound for k=256: sup |F_sample - F| <= eps w.p. 95%
_BKQ_EPS = 0.08488134473378872


def sketch_bottomk_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles from a BOTTOM-K uniform sample — the third portable
    mergeable sketch (with the HLL distinct counter and the KMV set
    algebra): the k rows with the smallest md5(event_id) are a uniform
    random-but-DETERMINISTIC sample whose merge is min-merge (take the k
    smallest of any union), so per-partition samples combine exactly
    like production quantile sketches ship.

    Per event_type: nearest-rank p50/p90 of ``value`` in the sample,
    the exact population quantiles alongside, and a DKW-bound flag —
    the population CDF evaluated AT the sampled quantile must sit
    within eps of p (rank arithmetic on exact integers; the only
    doubles are the output values themselves)."""
    e = load_table(spark, sf_dir, "events")
    rows = bkq_rows(e)
    sample = bkq_sample(rows)
    return bkq_finalize(sample, rows)


def bkq_rows(e: DataFrame) -> DataFrame:
    """(event_type, event_id, v, h): the hashed row form the bottom-k
    sample selects from — md5-derived so the sample replays in DuckDB."""
    h = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("bigint")
    return e.select(
        "event_type", "event_id", F.col("value").cast("double").alias("v"), h.alias("h")
    )


def bkq_sample(rows: DataFrame) -> DataFrame:
    """Per-group k smallest-hash rows — the MERGEABLE sample state: the
    bottom-k of any union is the bottom-k of the parts' bottom-ks
    (min-merge), so per-partition / per-micro-batch samples combine
    exactly (property-pinned in tests/test_sketches.py; cross-batch
    merge proven through the real engine by stream_bottomk_quantiles)."""
    wr = Window.partitionBy("event_type").orderBy("h", "event_id")
    return (
        rows.withColumn("rk", F.row_number().over(wr)).filter(F.col("rk") <= _BKQ_K).drop("rk")
    )


def bkq_finalize(sample: DataFrame, rows: DataFrame) -> DataFrame:
    """Sample + full rows -> nearest-rank p50/p90 with exact quantiles
    and the DKW in-bounds flag (the sketch-operator oracle discipline)."""
    wn = Window.partitionBy("event_type")
    wv = Window.partitionBy("event_type").orderBy("v", "event_id")
    sq = (
        sample.withColumn("n_s", F.count(F.lit(1)).over(wn))
        .withColumn("vrk", F.row_number().over(wv))
    )

    s50 = sq.filter(F.col("vrk") == F.greatest(F.lit(1), F.ceil(F.col("n_s") * F.lit(0.5)))).select(
        "event_type", F.col("v").alias("sample_p50")
    )
    s90 = sq.filter(F.col("vrk") == F.greatest(F.lit(1), F.ceil(F.col("n_s") * F.lit(0.9)))).select(
        "event_type", F.col("v").alias("sample_p90")
    )
    eq = (
        rows.withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("vrk", F.row_number().over(wv))
    )
    e50 = eq.filter(F.col("vrk") == F.greatest(F.lit(1), F.ceil(F.col("n") * F.lit(0.5)))).select(
        "event_type", F.col("v").alias("exact_p50")
    )
    e90 = eq.filter(F.col("vrk") == F.greatest(F.lit(1), F.ceil(F.col("n") * F.lit(0.9)))).select(
        "event_type", F.col("v").alias("exact_p90")
    )
    cdf = (
        rows.join(s50, "event_type")
        .join(s90, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("v") <= F.col("sample_p50"), 1).otherwise(0)).alias("le50"),
            F.sum(F.when(F.col("v") <= F.col("sample_p90"), 1).otherwise(0)).alias("le90"),
        )
    )
    j = (
        s50.join(s90, "event_type")
        .join(e50, "event_type")
        .join(e90, "event_type")
        .join(cdf, "event_type")
    )
    ok50 = F.abs(F.col("le50").cast("double") / F.col("n") - F.lit(0.5)) <= F.lit(_BKQ_EPS)
    ok90 = F.abs(F.col("le90").cast("double") / F.col("n") - F.lit(0.9)) <= F.lit(_BKQ_EPS)
    return j.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        F.round("sample_p50", 2).alias("sample_p50"),
        F.round("exact_p50", 2).alias("exact_p50"),
        F.round("sample_p90", 2).alias("sample_p90"),
        F.round("exact_p90", 2).alias("exact_p90"),
        (ok50 & ok90).alias("within_dkw"),
    )


_BKQ_SQL = """
WITH rows_ AS (
  SELECT event_type, event_id, CAST(value AS DOUBLE) AS v,
         CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::UBIGINT AS BIGINT) AS h
  FROM events
), sample_ AS (
  SELECT event_type, event_id, v FROM (
    SELECT event_type, event_id, v,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h, event_id) AS rk
    FROM rows_
  ) WHERE rk <= KVAL
), sq AS (
  SELECT event_type, v,
         COUNT(*) OVER (PARTITION BY event_type) AS n_s,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v, event_id) AS vrk
  FROM sample_
), s50 AS (
  SELECT event_type, v AS sample_p50 FROM sq WHERE vrk = GREATEST(1, CAST(CEIL(n_s * 0.5) AS BIGINT))
), s90 AS (
  SELECT event_type, v AS sample_p90 FROM sq WHERE vrk = GREATEST(1, CAST(CEIL(n_s * 0.9) AS BIGINT))
), eqr AS (
  SELECT event_type, v,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v, event_id) AS vrk
  FROM rows_
), e50 AS (
  SELECT event_type, v AS exact_p50 FROM eqr WHERE vrk = GREATEST(1, CAST(CEIL(n * 0.5) AS BIGINT))
), e90 AS (
  SELECT event_type, v AS exact_p90 FROM eqr WHERE vrk = GREATEST(1, CAST(CEIL(n * 0.9) AS BIGINT))
), cdf AS (
  SELECT r.event_type, COUNT(*) AS n,
         SUM(CASE WHEN r.v <= s50.sample_p50 THEN 1 ELSE 0 END) AS le50,
         SUM(CASE WHEN r.v <= s90.sample_p90 THEN 1 ELSE 0 END) AS le90
  FROM rows_ r JOIN s50 ON s50.event_type = r.event_type
               JOIN s90 ON s90.event_type = r.event_type
  GROUP BY 1
)
SELECT s50.event_type,
       CAST(cdf.n AS BIGINT) AS n_events,
       ROUND(s50.sample_p50, 2) AS sample_p50,
       ROUND(e50.exact_p50, 2) AS exact_p50,
       ROUND(s90.sample_p90, 2) AS sample_p90,
       ROUND(e90.exact_p90, 2) AS exact_p90,
       (ABS(CAST(cdf.le50 AS DOUBLE) / cdf.n - 0.5) <= EPSVAL
        AND ABS(CAST(cdf.le90 AS DOUBLE) / cdf.n - 0.9) <= EPSVAL) AS within_dkw
FROM s50 JOIN s90 USING (event_type)
JOIN e50 USING (event_type) JOIN e90 USING (event_type)
JOIN cdf ON cdf.event_type = s50.event_type
""".replace("KVAL", str(_BKQ_K)).replace("EPSVAL", repr(_BKQ_EPS))


# ------------------------------------------------- count-min sketch

_CM_D = 4  # hash rows
_CM_W = 512  # counters per row (power of two: the eps bound 2N/w stays float-exact)
_CM_TOP = 20


def _cm_col(key_col, r_col):
    """Counter column for (key, row): md5-derived so the sketch replays
    bit-identically in DuckDB (same discipline as the portable HLL)."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(key_col.cast("string"), F.lit("|"), r_col.cast("string")).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(_CM_W))


def cm_counters(e: DataFrame, key: str = "user_id") -> DataFrame:
    """The count-min counter table (r, c, cnt): d*w rows of MERGEABLE
    state — counters of any union of streams are the elementwise SUM of
    the parts' counters (the additive dual of the HLL max-merge;
    property-pinned in tests/test_sketches.py).  One explode(d) + one
    partial-agg count per event: map-side combine collapses each task to
    <= d*w partial rows before the shuffle, so the reduction is
    O(tasks * d * w) regardless of event volume."""
    rows = e.select(
        F.col(key), F.explode(F.array(*[F.lit(i) for i in range(_CM_D)])).alias("r")
    )
    return (
        rows.select("r", _cm_col(F.col(key), F.col("r")).alias("c"))
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cm_finalize(counters: DataFrame, e: DataFrame) -> DataFrame:
    """Counter table + event stream -> the top-k frequency report with
    the sketch's two contracts as columns: ``never_under`` (CM error is
    ONE-SIDED — collisions only add, so estimate >= truth
    deterministically) and ``within_eps`` (estimate <= truth + 2N/w, the
    Cormode-Muthukrishnan bound).  The counter table is d*w rows,
    broadcast to the probe join; the exact side exists only for the
    oracle discipline (report estimate vs truth)."""
    exact = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    top = exact.orderBy(F.desc("n_exact"), F.asc("user_id")).limit(_CM_TOP)
    total = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    probes = top.select(
        "user_id",
        "n_exact",
        F.explode(F.array(*[F.lit(i) for i in range(_CM_D)])).alias("r"),
    ).select("user_id", "n_exact", "r", _cm_col(F.col("user_id"), F.col("r")).alias("c"))
    est = (
        probes.join(F.broadcast(counters), ["r", "c"])
        .groupBy("user_id", "n_exact")
        .agg(F.min("cnt").alias("cm_estimate"))
    )
    return est.crossJoin(F.broadcast(total)).select(
        "user_id",
        "n_exact",
        F.col("cm_estimate").cast("bigint").alias("cm_estimate"),
        (F.col("cm_estimate") >= F.col("n_exact")).alias("never_under"),
        (
            F.col("cm_estimate").cast("double")
            <= F.col("n_exact").cast("double")
            + F.lit(2.0) * F.col("n_total").cast("double") / F.lit(float(_CM_W))
        ).alias("within_eps"),
    )


def sketch_countmin_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event frequency via a PORTABLE count-min sketch: estimate
    = min over d rows of the (row, hash(key)) counter (see
    ``cm_counters`` / ``cm_finalize`` for the merge and bound
    contracts)."""
    e = load_table(spark, sf_dir, "events").select("user_id")
    return cm_finalize(cm_counters(e), e)


_CM_HASH_SQL = (
    "CAST(('0x' || substr(md5(CAST({key} AS VARCHAR) || '|' || CAST({r} AS VARCHAR)), 1, 15))"
    f"::UBIGINT % {_CM_W} AS BIGINT)"
)

_CM_SQL = f"""
WITH ev AS (SELECT user_id FROM events),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM ev),
cells AS (
  SELECT r.i AS r, {_CM_HASH_SQL.format(key="user_id", r="r.i")} AS c
  FROM ev, UNNEST(range(0, {_CM_D})) AS r(i)
), counters AS (
  SELECT r, c, CAST(COUNT(*) AS BIGINT) AS cnt FROM cells GROUP BY 1, 2
), exact AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM ev GROUP BY 1
), top AS (
  SELECT user_id, n_exact FROM exact ORDER BY n_exact DESC, user_id ASC LIMIT {_CM_TOP}
), probes AS (
  SELECT t.user_id, t.n_exact, r.i AS r, {_CM_HASH_SQL.format(key="t.user_id", r="r.i")} AS c
  FROM top t, UNNEST(range(0, {_CM_D})) AS r(i)
), est AS (
  SELECT p.user_id, p.n_exact, MIN(co.cnt) AS cm_estimate
  FROM probes p JOIN counters co USING (r, c) GROUP BY 1, 2
)
SELECT e.user_id, e.n_exact, CAST(e.cm_estimate AS BIGINT) AS cm_estimate,
       e.cm_estimate >= e.n_exact AS never_under,
       CAST(e.cm_estimate AS DOUBLE)
         <= CAST(e.n_exact AS DOUBLE) + 2.0 * t.n_total / {_CM_W} AS within_eps
FROM est e CROSS JOIN tot t
"""


def events_mannwhitney_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test: do 'view' and 'click'
    events draw their values from the same distribution? — the
    nonparametric counterpart of the two-sample t/z tests, and the
    rank-based sibling of ``lineitem_anova_returnflag``.

    Rank-based means a GLOBAL ranking — computed with the distributed
    two-pass rank (``with_global_positions``), never a single-partition
    window.  Values fold to integer cents so ties are exact; midranks
    come from one per-value aggregate over the positioned rows
    ((min_pos + max_pos) per tie group — kept DOUBLED so everything
    stays integer), and the whole reduction to (R1, tie term Σ(t³−t))
    is exact bigints, order-independent.  2·U1 is emitted exactly; the
    z statistic (tie-corrected variance) is a handful of IEEE ops from
    those integers, replayed token-for-token by the oracle.  The tie
    term t³ stays under 2^63 while no single tie group exceeds ~2M rows
    (cents ties at this value range: far beyond any tested sf)."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    rows = e.select(
        (F.col("event_type") == "view").cast("int").alias("g1"),
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("bigint").alias("v_cents"),
        "event_id",
    )
    pos, _n = with_global_positions(rows, "v_cents", "event_id")
    per_v = pos.groupBy("v_cents").agg(
        F.min("_pos").alias("mn"),
        F.max("_pos").alias("mx"),
        F.sum("g1").cast("bigint").alias("n1v"),
        F.count(F.lit(1)).cast("bigint").alias("t"),
    )
    agg = per_v.agg(
        F.sum(F.col("n1v") * (F.col("mn") + F.col("mx"))).cast("bigint").alias("r1x2"),
        F.sum("n1v").cast("bigint").alias("n1"),
        F.sum("t").cast("bigint").alias("n"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).cast("bigint").alias("ties"),
    )
    n1, n, r1x2, ties = F.col("n1"), F.col("n"), F.col("r1x2"), F.col("ties")
    n2 = n - n1
    u1x2 = 2 * n1 * n2 + n1 * (n1 + 1) - r1x2
    var = (
        (n1 * n2).cast("double")
        / F.lit(12.0)
        * ((n + 1).cast("double") - ties.cast("double") / (n * (n - 1)).cast("double"))
    )
    z = ((u1x2 - n1 * n2).cast("double") / F.lit(2.0)) / F.sqrt(var)
    return agg.select(
        n1.alias("n1"),
        n2.cast("bigint").alias("n2"),
        u1x2.cast("bigint").alias("u1_x2"),
        ties.alias("tie_term"),
        F.round(z, 6).alias("z_stat"),
        (F.abs(z) > F.lit(1.959964)).alias("significant_5pct"),
    )


_MWU_SQL = """
WITH rows AS (
  SELECT CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g1,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS v_cents, event_id
  FROM events WHERE event_type IN ('view', 'click')
), pos AS (
  SELECT g1, v_cents, ROW_NUMBER() OVER (ORDER BY v_cents, event_id) AS p
  FROM rows
), pv AS (
  SELECT v_cents, MIN(p) AS mn, MAX(p) AS mx,
         CAST(SUM(g1) AS BIGINT) AS n1v, CAST(COUNT(*) AS BIGINT) AS t
  FROM pos GROUP BY 1
), agg AS (
  SELECT CAST(SUM(n1v * (mn + mx)) AS BIGINT) AS r1x2,
         CAST(SUM(n1v) AS BIGINT) AS n1,
         CAST(SUM(t) AS BIGINT) AS n,
         CAST(SUM(t * t * t - t) AS BIGINT) AS ties
  FROM pv
)
SELECT n1, n - n1 AS n2,
       CAST(2 * n1 * (n - n1) + n1 * (n1 + 1) - r1x2 AS BIGINT) AS u1_x2,
       ties AS tie_term,
       ROUND((CAST(2 * n1 * (n - n1) + n1 * (n1 + 1) - r1x2 - n1 * (n - n1) AS DOUBLE) / 2.0)
             / SQRT(CAST(n1 * (n - n1) AS DOUBLE) / 12.0
                    * (CAST(n + 1 AS DOUBLE) - CAST(ties AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE))), 6) AS z_stat,
       ABS((CAST(2 * n1 * (n - n1) + n1 * (n1 + 1) - r1x2 - n1 * (n - n1) AS DOUBLE) / 2.0)
           / SQRT(CAST(n1 * (n - n1) AS DOUBLE) / 12.0
                  * (CAST(n + 1 AS DOUBLE) - CAST(ties AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)))) > 1.959964 AS significant_5pct
FROM agg
"""


def events_ks_test_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test: do 'view' and 'purchase'
    events draw their values from the same distribution? — the
    distribution-SHAPE counterpart of the rank-based Mann-Whitney U
    (``events_mannwhitney_value``): MWU detects location shift, KS
    detects ANY ECDF divergence (D = sup_x |F1(x) - F2(x)|).

    The supremum over a continuous x reduces to a max over the pooled
    DISTINCT values, so the distributed shape is: one hash agg to
    per-value counts (the result is bounded by the value DOMAIN — cents
    in a fixed price range — not the row count), then EXACT cumulative
    counts by the same two-pass discipline as ``with_global_positions``:
    approx-quantile boundaries coarse-range the per-value table (balance
    only, never correctness), per-range sums are collected driver-side
    (bounded: <= _COARSE+1 rows of metadata) to form exact running
    offsets, and a window PARTITIONED BY range finishes the prefix sums
    — no single-partition window at any scale.  The divergence is kept
    as the exact bigint ``d_num = |cum1*n2 - cum2*n1|`` (max of exact
    integers, order-independent); it stays under 2^63 while
    n1*n2 < 2^63, i.e. ~3e9 rows per sample — the same published bound
    as the MWU's 2*n1*n2 term.  ks_d / ks_stat are then a handful of
    correctly-rounded IEEE ops from those integers, replayed
    token-for-token by the oracle; 1.358102 is the 5% two-sample
    critical value of the Kolmogorov distribution (c(0.05) = 1.3581)."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
        # NULL values carry no distribution information AND order
        # differently across engines (Spark windows put NULLS FIRST,
        # DuckDB's running sums NULLS LAST) — exclude them explicitly on
        # both sides so a null row can never shift the cumulative counts
        & F.col("value").isNotNull()
    )
    pv = (
        e.select(
            (F.col("event_type") == "view").cast("bigint").alias("g1"),
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("bigint").alias("v_cents"),
        )
        .groupBy("v_cents")
        .agg(F.sum("g1").alias("n1v"), F.count(F.lit(1)).cast("bigint").alias("t"))
        # three actions read this table (quantile boundaries, per-range
        # offsets, the final max) — persist so the corpus-scale scan and
        # shuffle run once; the table itself is domain-bounded (one row
        # per distinct cent value), so the cache is metadata-scale
        .persist()
    )
    with_rng, maps, totals = _range_offsets(
        pv, "v_cents", {"s1": F.sum("n1v"), "st": F.sum("t")}
    )
    n1, n = totals["s1"], totals["st"]
    n2 = n - n1
    if n1 == 0 or n2 == 0:
        raise ValueError("ks test needs both samples non-empty")
    if n1 * n2 >= 1 << 63:
        # loud, not silent-wrap (the ANOVA discipline, stats.py:294):
        # past this bound Spark's non-ANSI bigint product would wrap
        # while the DuckDB HUGEINT oracle keeps going — fail instead.
        raise OverflowError("ks d_num bound exceeded: n1*n2 >= 2^63")
    lw = Window.partitionBy("_rng").orderBy("v_cents")
    cum1 = (maps["s1"][F.col("_rng")] + F.sum("n1v").over(lw)).cast("bigint")
    cumn = (maps["st"][F.col("_rng")] + F.sum("t").over(lw)).cast("bigint")
    d_num = F.abs(cum1 * F.lit(n2) - (cumn - cum1) * F.lit(n1))
    # the final max is ONE row of model-scale state: collect it (the
    # bounded-collect discipline — same class as the <=65-row range
    # offsets above) so pv's cache is released HERE instead of leaking
    # into the caller's session; bench used to clearCache() around this
    # query to compensate (ADVICE r9).  A localCheckpoint would stay
    # registered in block storage itself, just moving the leak.
    d_val = int(
        with_rng.select(d_num.alias("d_num")).agg(F.max("d_num")).collect()[0][0]
    )
    pv.unpersist()
    ks_d = F.lit(d_val).cast("double") / F.lit(float(n1) * float(n2))
    ks_stat = F.sqrt(F.lit(float(n1) * float(n2) / float(n))) * ks_d
    return spark.range(1).select(
        F.lit(n1).cast("bigint").alias("n1"),
        F.lit(n2).cast("bigint").alias("n2"),
        F.lit(d_val).cast("bigint").alias("d_num"),
        F.round(ks_d, 6).alias("ks_d"),
        F.round(ks_stat, 6).alias("ks_stat"),
        (ks_stat > F.lit(1.358102)).alias("significant_5pct"),
    )


_KS_SQL = """
WITH pv AS (
  SELECT CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS v_cents,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n1v,
         CAST(COUNT(*) AS BIGINT) AS t
  FROM events WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n1v) AS BIGINT) AS n1, CAST(SUM(t) AS BIGINT) AS n FROM pv
), c AS (
  SELECT CAST(SUM(n1v) OVER (ORDER BY v_cents) AS BIGINT) AS cum1,
         CAST(SUM(t) OVER (ORDER BY v_cents) AS BIGINT) AS cumn
  FROM pv
), d AS (
  SELECT MAX(ABS(cum1 * (SELECT n - n1 FROM tot) - (cumn - cum1) * (SELECT n1 FROM tot))) AS d_num
  FROM c
)
SELECT t.n1, t.n - t.n1 AS n2, d.d_num,
       ROUND(CAST(d.d_num AS DOUBLE) / (CAST(t.n1 AS DOUBLE) * CAST(t.n - t.n1 AS DOUBLE)), 6) AS ks_d,
       ROUND(SQRT(CAST(t.n1 AS DOUBLE) * CAST(t.n - t.n1 AS DOUBLE) / CAST(t.n AS DOUBLE))
             * (CAST(d.d_num AS DOUBLE) / (CAST(t.n1 AS DOUBLE) * CAST(t.n - t.n1 AS DOUBLE))), 6) AS ks_stat,
       SQRT(CAST(t.n1 AS DOUBLE) * CAST(t.n - t.n1 AS DOUBLE) / CAST(t.n AS DOUBLE))
       * (CAST(d.d_num AS DOUBLE) / (CAST(t.n1 AS DOUBLE) * CAST(t.n - t.n1 AS DOUBLE))) > 1.358102 AS significant_5pct
FROM tot t, d
"""


QUERIES = {
    "events_mannwhitney_value": events_mannwhitney_value,
    "events_ks_test_value": events_ks_test_value,
    "docs_crosstab_lang_source": docs_crosstab_lang_source,
    "sketch_countmin_user_counts": sketch_countmin_user_counts,
    "customers_gini_spend": customers_gini_spend,
    "diag_join_key_skew": diag_join_key_skew,
    "aqp_revenue_estimate": aqp_revenue_estimate,
    "customers_rfm_segments": customers_rfm_segments,
    "customers_cohort_ltv": customers_cohort_ltv,
    "lineitem_anova_returnflag": lineitem_anova_returnflag,
    "basket_association_rules": basket_association_rules,
    "events_ab_proportion_ztest": events_ab_proportion_ztest,
    "table_stats_orders": table_stats_orders,
    "orders_seasonal_naive_forecast": orders_seasonal_naive_forecast,
    "orders_equidepth_histogram": orders_equidepth_histogram,
    "basket_part_pairs": basket_part_pairs,
    "docs_chisq_lang_source": docs_chisq_lang_source,
    "sketch_hll_users": sketch_hll_users,
    "parts_abc_analysis": parts_abc_analysis,
    "sketch_kmv_set_ops": sketch_kmv_set_ops,
    "sketch_bottomk_quantiles": sketch_bottomk_quantiles,
}

ORACLE = {
    "events_mannwhitney_value": _MWU_SQL,
    "events_ks_test_value": _KS_SQL,
    "docs_crosstab_lang_source": _CROSSTAB_SQL,
    "sketch_countmin_user_counts": _CM_SQL,
    "customers_gini_spend": _GINI_SQL,
    "diag_join_key_skew": _SKEW_SQL,
    "aqp_revenue_estimate": _AQP_SQL,
    "customers_rfm_segments": _RFM_SQL,
    "customers_cohort_ltv": _COHORT_LTV_SQL,
    "lineitem_anova_returnflag": _ANOVA_SQL,
    "basket_association_rules": _ASSOC_SQL,
    "events_ab_proportion_ztest": _ABTEST_SQL,
    "table_stats_orders": _TABLE_STATS_SQL,
    "orders_seasonal_naive_forecast": _SEAS_FC_SQL,
    "orders_equidepth_histogram": _EQUIDEPTH_SQL,
    "basket_part_pairs": _BASKET_SQL,
    "docs_chisq_lang_source": _CHISQ_SQL,
    "sketch_hll_users": _HLL_SQL,
    "parts_abc_analysis": _ABC_SQL,
    "sketch_kmv_set_ops": _KMV_SQL,
    "sketch_bottomk_quantiles": _BKQ_SQL,
}
