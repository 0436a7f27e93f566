"""Repo-wide plan guard #4: no registered query may evaluate Python
row-at-a-time.  ``BatchEvalPython`` (scalar ``F.udf`` without Arrow) is
the pickled per-row round trip that runs 10-100x slower than the
Arrow-batched surfaces — "zero row-wise Python UDFs in the hot path" has
been a grep-audited claim since r1; this makes it a PLAN property over
every queries() entry, the same promotion the r11 cross-join guard made
for boundedness.

Allowed (not flagged): ArrowEvalPython / MapInPandas / MapInArrow /
FlatMapGroupsInPandas(+WithState) / FlatMapCoGroupsInPandas /
AggregateInPandas, and BatchEvalPythonUDTF (the declared table-function
surface — generators, not hot-path scalars).

Repo-wide ENFORCEMENT lives in ``tests/test_window_guard.py::
test_plan_guards`` (one query-construction pass applies all four guard
classes); this file pins the guard's own behavior.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.plans.introspect import (
    rowwise_python_evals,
)

SF_DIR = "/root/testdata/sf0.001"


def test_guard_catches_rowwise_udf(spark):
    """The guard must fire on the shape it bans: a plain F.udf column."""
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    slow = F.udf(lambda s: (s or "")[:1], "string", useArrow=False)
    assert rowwise_python_evals(o.select(slow("o_orderstatus"))) != []


def test_guard_accepts_arrow_surfaces(spark):
    """Arrow-batched evaluation must NOT be flagged: pandas_udf scalar
    and mapInPandas both stay clean."""
    from pyspark.sql.functions import pandas_udf

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")

    @pandas_udf("double")
    def half(v: pd.Series) -> pd.Series:
        return v / 2.0

    assert rowwise_python_evals(o.select(half("o_totalprice"))) == []

    def ident(it):
        yield from it

    assert rowwise_python_evals(o.mapInPandas(ident, o.schema)) == []
