"""DataFrame statistics surface (``df.stat``) + distribution operators.

``crosstab`` is the contingency-table primitive (pairwise frequency of two
low-cardinality columns); ``ntile``-based equi-depth histograms are the
data-profiling complement to the fixed-width histogram in
``operators/events.py`` — bucket boundaries adapt to the distribution, so
every bucket holds the same row count.

Scale shape: crosstab is one hash agg on (a, b) followed by a pivot of a
bounded-cardinality domain (the contract: both columns are dimension-like;
a high-cardinality crosstab is a user error at any scale).  The equi-depth
histogram is a single window sort on the value — the one global sort the
semantic genuinely requires — followed by a hash agg on the bucket id.
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


def orders_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile-bucketed) histogram of order totals: ntile(8)
    with a deterministic total order (value, key), then per-bucket count /
    bounds / exact sum."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_orderkey", "o_totalprice", F.ntile(_N_BUCKETS).over(w).alias("bucket"))
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


QUERIES = {
    "docs_crosstab_lang_source": docs_crosstab_lang_source,
    "orders_equidepth_histogram": orders_equidepth_histogram,
    "basket_part_pairs": basket_part_pairs,
    "docs_chisq_lang_source": docs_chisq_lang_source,
    "sketch_hll_users": sketch_hll_users,
    "parts_abc_analysis": parts_abc_analysis,
}

ORACLE = {
    "docs_crosstab_lang_source": _CROSSTAB_SQL,
    "orders_equidepth_histogram": _EQUIDEPTH_SQL,
    "basket_part_pairs": _BASKET_SQL,
    "docs_chisq_lang_source": _CHISQ_SQL,
    "sketch_hll_users": _HLL_SQL,
    "parts_abc_analysis": _ABC_SQL,
}
