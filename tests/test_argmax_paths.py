"""Evaluation-path A/B net for min_by/max_by over STRUCT keys.

Round 11 found that struct-typed ``greatest`` inside HOF fold lambdas
gives DIFFERENT answers under codegen'd vs interpreted evaluation (the
text_unigram_train bug; banned repo-wide by
tests/test_text_ops.py::test_no_struct_greatest_in_fold_lambdas).  The
sibling shape — ``min_by``/``max_by`` whose ordering key is a struct —
appears at 13 sites (dedup.py:568 cluster assignment, events.py:160/426
latest-wins, graph.py:229 negated-count label vote, semantic.py:102,
similarity.py:749 PQ codebook argmin, cdc latest-by-lsn, ...).  This
module pins that the shape is evaluation-path-STABLE: each representative
expression is executed under

  1. the default config (whole-stage codegen + codegen'd orderings +
     ObjectHashAggregate),
  2. fully interpreted (wholeStage off, factoryMode=NO_CODEGEN), and
  3. the SortAggregate path (ObjectHashAggregateExec disabled),

on adversarial data (first-field ties forcing the tiebreaker, negative
keys, single-field structs) and must agree exactly across all three AND
with a row-at-a-time Python ground truth.  If a Spark upgrade ever makes
struct ordering path-dependent the way struct-greatest is, this fails
loudly and names the shape.
"""

from __future__ import annotations

from contextlib import contextmanager

import pyspark.sql.functions as F
import pytest

ROWS = [
    # (grp, dist, cluster, ts, event_id, cents, c, label)
    # grp 1: tie on dist -> cluster tiebreak decides
    (1, 5.0, 9, 100, 7, 10, 3, 2),
    (1, 5.0, 2, 100, 3, 20, 3, 1),  # same ts -> event_id tiebreak
    (1, 7.0, 1, 90, 9, 30, 1, 3),
    # grp 2: negatives in the ordering key (graph.py negates counts)
    (2, -3.0, 4, 50, 1, -5, 2, 5),
    (2, -3.0, 3, 60, 2, -7, 2, 4),
    (2, -9.0, 8, 60, 1, -1, 5, 9),
    # grp 3: single row (degenerate group)
    (3, 0.0, 0, 0, 0, 0, 0, 0),
]
SCHEMA = "grp int, dist double, cluster int, ts int, event_id int, cents int, c int, label int"


def _expected():
    by_grp: dict[int, list] = {}
    for r in ROWS:
        by_grp.setdefault(r[0], []).append(r)
    out = []
    for g, rs in sorted(by_grp.items()):
        # min_by(cluster, struct(dist, cluster))   -- dedup.py:568 shape
        a = min(rs, key=lambda r: (r[1], r[2]))[2]
        # max_by(cents, struct(ts, event_id))      -- events.py:426 shape
        b = max(rs, key=lambda r: (r[3], r[4]))[5]
        # min_by(struct(label), struct(-c, label)) -- graph.py:229 shape
        c = min(rs, key=lambda r: (-r[6], r[7]))[7]
        # min_by(struct(cluster, dist), struct(dist, cluster)) -- struct value
        m = min(rs, key=lambda r: (r[1], r[2]))
        out.append((g, a, b, c, m[2], m[1]))
    return out


def _run(spark):
    df = spark.createDataFrame(ROWS, SCHEMA).repartition(4, "grp")
    agg = df.groupBy("grp").agg(
        F.min_by("cluster", F.struct("dist", "cluster")).alias("argmin_scalar"),
        F.max_by("cents", F.struct("ts", "event_id")).alias("latest_cents"),
        F.min_by(F.struct("label"), F.struct(-F.col("c"), F.col("label"))).alias("vote"),
        F.min_by(F.struct("cluster", "dist"), F.struct("dist", "cluster")).alias("m"),
    )
    rows = agg.select(
        "grp",
        "argmin_scalar",
        "latest_cents",
        F.col("vote.label").alias("vote_label"),
        F.col("m.cluster").alias("m_cluster"),
        F.col("m.dist").alias("m_dist"),
    ).collect()
    return sorted(tuple(r) for r in rows)


@contextmanager
def _confs(spark, pairs):
    old = {}
    for k, v in pairs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


PATHS = {
    "default": {},
    "interpreted": {
        "spark.sql.codegen.wholeStage": "false",
        "spark.sql.codegen.factoryMode": "NO_CODEGEN",
    },
    "sort_aggregate": {
        "spark.sql.execution.useObjectHashAggregateExec": "false",
    },
}


@pytest.mark.parametrize("path", sorted(PATHS))
def test_struct_keyed_argmax_stable_across_paths(spark, path):
    with _confs(spark, PATHS[path]):
        got = _run(spark)
    assert got == _expected(), (path, got, _expected())


def test_real_site_gapfill_latest_wins_path_ab(spark, sf_dir):
    """One REAL registered plan through both evaluation paths: the
    gap-fill rollup's max_by(cents, struct(ts, event_id)) latest-wins
    (operators/events.py:426) at sf0.001 must collect identically under
    codegen and fully-interpreted evaluation."""
    from realtime_change_data_capture_streaming_spark.operators.events import gapfill_locf_rollup
    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    runs = []
    for pairs in (PATHS["default"], PATHS["interpreted"]):
        with _confs(spark, pairs):
            runs.append(sorted(map(tuple, gapfill_locf_rollup(ev).collect())))
    assert runs[0] == runs[1]
    assert len(runs[0]) > 0
