"""transformWithStateInPandas: Spark 4's typed stateful-processing API.

A per-user value monitor: maintains running count + cumulative value in a
ValueState and emits one row per (user, micro-batch) with the running
totals — the modern replacement for applyInPandasWithState, with typed
state handles (ValueState/ListState/MapState) and timers.

Same oracle trick as streaming/stateful.py: the final state per key (row
with max n_events) equals the plain batch GROUP BY, so an update-mode
custom stateful operator still gets an exact DuckDB check.  Exact integer
cents keep the running sums replay-stable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import StatefulProcessor, StatefulProcessorHandle

from realtime_change_data_capture_streaming_spark.streaming.windows import _run_to_table, events_stream

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value_cents", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("cents", T.LongType())]
)


class RunningTotalsProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, cents = self._totals.get() if self._totals.exists() else (0, 0)
        for pdf in rows:
            n += len(pdf)
            cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        self._totals.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value_cents": [cents]}
        )

    def close(self) -> None:
        pass


def running_totals_tws(stream: DataFrame) -> DataFrame:
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotalsProcessor(),
            outputStructType=_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def stream_tws_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_stream(spark, sf_dir)
    out = _run_to_table(running_totals_tws(ev), "update")
    final = out.groupBy("user_id").agg(
        F.max_by(F.struct("n_events", "sum_value_cents"), F.col("n_events")).alias("s")
    )
    return final.select(
        "user_id",
        F.col("s.n_events").alias("n_events"),
        F.col("s.sum_value_cents").alias("sum_value_cents"),
    )


TWS_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY user_id
"""


def _protobuf_available() -> bool:
    """transformWithStateInPandas requires google.protobuf at worker init
    (StateMessage_pb2); absent in this container, so the operator is
    registered only when the dependency exists."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


if _protobuf_available():
    QUERIES = {"stream_tws_user_totals": stream_tws_user_totals}
    ORACLE = {"stream_tws_user_totals": TWS_SQL}
else:
    QUERIES = {}
    ORACLE = {}
