"""Repo-wide plan guards — ALL FIVE classes enforced over every
registered query in ONE construction pass (``test_plan_guards``):

1. unpartitioned windows over unbounded input (single-task at scale);
2. un-limited global sorts (full range-shuffle nobody truncates);
3. condition-less cross joins with both sides unbounded (all-pairs);
4. row-wise Python evaluation (``BatchEvalPython`` pickled round trips);
5. windows partitioned ONLY by limit-bounded keys over unbounded input
   (|keys| tasks at scale — the r15 low-cardinality loophole: an 8-key
   query-id window over the full candidate scan sails past guard 1).

``unbounded_global_windows`` walks every queries() optimized plan and
flags Window nodes with an EMPTY partition spec whose child is not (a) a
limit (global top-k shortlists: the window then ranks <= N rows), or (b)
a no-key global aggregate (single-row input).  Windows over keyed
AGGREGATE output deliberately do NOT count as bounded — an aggregate on a
high-cardinality key (doc_id, user_id) is still corpus-sized, which is
exactly the shape this guard exists to catch (the r6 RRF and equi-depth
regressions); genuinely dimension-bounded cases are whitelisted below
with the cardinality argument spelled out.  The sort/cross guards keep
their own whitelists further down; the row-wise guard needs none.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from realtime_change_data_capture_streaming_spark.plans.introspect import (
    low_cardinality_partition_windows,
    unbounded_global_windows,
)

SF_DIR = "/root/testdata/sf0.001"

#: queries whose unpartitioned windows run over DIMENSION-bounded input —
#: a table-cardinality fact the plan cannot express, so the guard cannot
#: see it.  Each entry documents the bound.
WHITELIST = {
    # ranks the SUPPLIER dim table (TPC-H: 10k rows/SF vs 6M lineitems;
    # dims are broadcast-class by definition in this engine)
    "window_rank_dense_ntile",
    # cumulative sum over one row PER DAY (post-aggregate on a calendar
    # key: bounded by stream age in days, ~thousands at any data scale)
    "events_daily_user_growth",
    # Pareto running share over one row PER PART (the PART dim table,
    # 200k rows/SF — dimension-sized, not fact-sized)
    "parts_abc_analysis",
}

_QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_plan_guards(spark, name):
    """ALL FIVE repo-wide plan-guard classes in ONE pass per query —
    unpartitioned windows, low-cardinality-partition windows,
    un-limited global sorts, unbounded cross joins, row-wise Python
    evaluation.  One pass because query
    CONSTRUCTION is the dominant cost (streaming queries execute their
    micro-batch runs when built): separate parametrized sweeps
    re-ran every stream once per guard and cost the suite ~8 extra minutes.
    Per-guard whitelists still apply individually — a whitelisted
    window does not exempt a query from the other four guards."""
    from realtime_change_data_capture_streaming_spark.plans.introspect import (
        rowwise_python_evals,
        unbounded_cross_joins,
        unbounded_global_sorts,
    )

    df = _QUERIES[name](spark, SF_DIR)
    problems = []
    if name not in WHITELIST:
        problems += [
            f"unpartitioned window over unbounded input (single-task at scale): {x}"
            for x in unbounded_global_windows(df)
        ]
    if name not in LOWCARD_WHITELIST:
        problems += [
            f"window partitioned ONLY by limit-bounded keys over unbounded input "
            f"(|keys| tasks at scale — use _per_query_topk): {x}"
            for x in low_cardinality_partition_windows(df)
        ]
    if name not in SORT_WHITELIST:
        problems += [
            f"global sort over unbounded input with no limit (full range-shuffle): {x}"
            for x in unbounded_global_sorts(df)
        ]
    if name not in CROSS_WHITELIST:
        problems += [
            f"condition-less cross join, both sides unbounded (all-pairs): {x}"
            for x in unbounded_cross_joins(df)
        ]
    problems += [
        f"row-wise Python eval (pickled per-row round trip — use pandas_udf/"
        f"mapInPandas): {x}"
        for x in rowwise_python_evals(df)
    ]
    assert problems == [], f"{name} fails plan guard(s):\n" + "\n".join(problems)


def test_guard_catches_full_table_ntile(spark):
    """The guard itself must fire on the shape it exists to catch (the
    pre-r7 equi-depth form): ntile over one global window on a fact
    table."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    o = load_table(spark, SF_DIR, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    df = o.select(F.ntile(8).over(w).alias("bucket"))
    assert unbounded_global_windows(df) != []


def test_guard_catches_window_over_keyed_aggregate(spark):
    """Keyed-aggregate output is still corpus-sized: the pre-r7 RRF shape
    (row_number over all per-doc scores) must trip the guard."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    d = load_table(spark, SF_DIR, "documents").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy(F.desc("n"), F.asc("doc_id"))
    df = d.withColumn("rk", F.row_number().over(w))
    assert unbounded_global_windows(df) != []


def test_guard_accepts_window_over_limit(spark):
    """The sanctioned shortlist shape (window over orderBy+limit) must
    pass: the window input is bounded by construction."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    d = load_table(spark, SF_DIR, "documents")
    top = d.orderBy(F.desc("n_chars"), F.asc("doc_id")).limit(50)
    w = Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    df = top.withColumn("rk", F.row_number().over(w))
    assert unbounded_global_windows(df) == []


#: queries with a window partitioned only by limit-bounded keys whose
#: input IS bounded by a cardinality fact the plan cannot express.
#: Currently empty: every per-query top-k runs through the
#: partial-heads + bounded-aggregate shape (_per_query_topk), whose
#: pid key clears the guard by construction.
LOWCARD_WHITELIST: set[str] = set()


def test_lowcard_guard_catches_query_keyed_window_over_scan(spark):
    """The guard must fire on the shape it exists to catch (the pre-r15
    ann_cosine_topk form): row_number over Window.partitionBy(query_id)
    where query_id comes from a .limit(8) side and the input is the full
    candidate scan."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    e = load_table(spark, SF_DIR, "embeddings")
    q = e.filter(F.col("vec_id") < 8).limit(8).select(
        F.col("vec_id").alias("query_id")
    )
    c = e.filter(F.col("vec_id") >= 8).select(F.col("vec_id").alias("cand_id"))
    scored = F.broadcast(q).crossJoin(c)
    w = Window.partitionBy("query_id").orderBy(F.asc("cand_id"))
    df = scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)
    assert low_cardinality_partition_windows(df) != []


def test_lowcard_guard_accepts_pid_augmented_and_unbounded_keys(spark):
    """The sanctioned shapes must pass: (a) the partial-heads window
    whose keys include spark_partition_id (unbounded provenance), and
    (b) windows keyed by a fact-table column."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    e = load_table(spark, SF_DIR, "embeddings")
    q = e.filter(F.col("vec_id") < 8).limit(8).select(
        F.col("vec_id").alias("query_id")
    )
    c = e.filter(F.col("vec_id") >= 8).select(F.col("vec_id").alias("cand_id"))
    scored = F.broadcast(q).crossJoin(c).withColumn("pid", F.spark_partition_id())
    w = Window.partitionBy("pid", "query_id").orderBy(F.asc("cand_id"))
    df = scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)
    assert low_cardinality_partition_windows(df) == []

    o = load_table(spark, SF_DIR, "orders")
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    df2 = o.withColumn("rn", F.row_number().over(w2))
    assert low_cardinality_partition_windows(df2) == []


def test_lowcard_guard_accepts_bounded_input(spark):
    """A query-keyed window whose INPUT is itself limit-bounded (the
    probe-ranking shape: 8 queries x k limited centroids) must pass."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    e = load_table(spark, SF_DIR, "embeddings")
    q = e.filter(F.col("vec_id") < 8).limit(8).select(
        F.col("vec_id").alias("query_id")
    )
    cents = e.limit(8).select(F.col("vec_id").alias("cluster"))
    crossed = F.broadcast(q).crossJoin(cents)
    w = Window.partitionBy("query_id").orderBy(F.asc("cluster"))
    df = crossed.withColumn("prk", F.row_number().over(w)).filter(F.col("prk") <= 2)
    assert low_cardinality_partition_windows(df) == []


#: queries whose global Sort runs over input the guard cannot prove
#: bounded but which IS bounded by a cardinality fact — none currently:
#: the only offender found (pivot_revenue_by_year's presentation sort)
#: was removed instead of whitelisted, since the result compare is
#: order-insensitive and the sort was a pure range-shuffle tax.
SORT_WHITELIST: set[str] = set()


def test_sort_guard_catches_orderby_without_limit(spark):
    """An orderBy() nobody truncates on a fact table must trip the guard."""
    from pyspark.sql import functions as F

    from realtime_change_data_capture_streaming_spark.plans.introspect import unbounded_global_sorts
    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    o = load_table(spark, SF_DIR, "orders")
    assert unbounded_global_sorts(o.orderBy(F.desc("o_totalprice"))) != []


def test_sort_guard_accepts_topk_and_bounded_inputs(spark):
    """orderBy+limit (TakeOrderedAndProject) and a sort whose input is a
    global aggregate or a limit must pass."""
    from pyspark.sql import functions as F

    from realtime_change_data_capture_streaming_spark.plans.introspect import unbounded_global_sorts
    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    o = load_table(spark, SF_DIR, "orders")
    assert unbounded_global_sorts(o.orderBy(F.desc("o_totalprice")).limit(10)) == []
    assert unbounded_global_sorts(
        o.agg(F.sum("o_totalprice").alias("s")).orderBy("s")
    ) == []
    assert unbounded_global_sorts(o.limit(25).orderBy("o_orderkey")) == []


#: queries with a condition-less cross join the guard cannot prove
#: bounded but which IS bounded by a cardinality fact.  Each entry
#: documents the bound.
CROSS_WHITELIST: set[str] = {
    # chi-square contingency: row marginals (per LANGUAGE, a ~10-value
    # domain) x column marginals (per SOURCE, a ~5-value domain) — the
    # cross is |langs| x |sources| cells, dimension-bounded by the
    # document schema's enum-like domains, never corpus-sized
    "docs_chisq_lang_source",
}


def test_cross_guard_catches_fact_x_fact(spark):
    """The guard must fire on the shape it exists to catch: corpus x
    corpus with no condition."""
    from pyspark.sql import functions as F

    from realtime_change_data_capture_streaming_spark.plans.introspect import unbounded_cross_joins
    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    assert unbounded_cross_joins(o.crossJoin(c.select(F.col("c_custkey")))) != []


def test_cross_guard_accepts_bounded_sides(spark):
    """Cross against a 1-row aggregate, a limit, or a bounded x bounded
    join must pass — the engine's broadcast-scalar idiom."""
    from pyspark.sql import functions as F

    from realtime_change_data_capture_streaming_spark.plans.introspect import unbounded_cross_joins
    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    o = load_table(spark, SF_DIR, "orders")
    total = o.agg(F.sum("o_totalprice").alias("t"))
    n = o.agg(F.count(F.lit(1)).alias("n"))
    assert unbounded_cross_joins(o.crossJoin(F.broadcast(total))) == []
    assert unbounded_cross_joins(o.crossJoin(F.broadcast(o.limit(5)))) == []
    # bounded x bounded composes: (1-row agg x 1-row agg) is itself
    # bounded, so crossing the corpus against it passes too
    stats = total.crossJoin(n)
    assert unbounded_cross_joins(o.crossJoin(F.broadcast(stats))) == []
