"""Custom stateful streaming operator: applyInPandasWithState.

Per-user running aggregates (event count, exact value sum in integer
cents, last event time) maintained in GroupState across micro-batches —
the escape hatch for stateful semantics Spark's built-in operators can't
express (custom models, CEP-ish logic, bespoke session rules).

State discipline at scale: the state row is a few scalars per key (not
the event history), value sums are integer cents (exact, so replays and
batch boundaries can't drift), and production deployments bound state
with ``GroupStateTimeout.EventTimeTimeout`` + watermark.

Because each micro-batch emits the updated running totals, the memory
sink holds one row per (key, batch-it-appeared-in); the final state per
key is the row with the highest count — which must equal the plain batch
GROUP BY, giving this operator an exact oracle despite being
update-mode streaming.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from realtime_change_data_capture_streaming_spark.streaming.windows import _run_to_table, events_stream

_OUT_SCHEMA = "user_id bigint, n_events bigint, sum_value_cents bigint, last_ts timestamp"
_STATE_SCHEMA = "n bigint, cents bigint, last bigint"


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, cents, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # exact integer cents: value is a 2-dp double, so round() is lossless
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        last_us = max(last_us, int(pdf["ts"].astype("int64").max()) // 1000)
    state.update((n, cents, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value_cents": [cents],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Attach the stateful operator to any events-shaped stream."""
    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_stream(spark, sf_dir)
    out = _run_to_table(running_user_totals(ev), "update")
    # final state per key = the row with the max running count
    final = out.groupBy("user_id").agg(
        F.max_by(F.struct("n_events", "sum_value_cents", "last_ts"), F.col("n_events")).alias("s")
    )
    return final.select(
        "user_id",
        F.col("s.n_events").alias("n_events"),
        F.col("s.sum_value_cents").alias("sum_value_cents"),
        F.col("s.last_ts").alias("last_ts"),
    )


STATEFUL_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       MAX(ts) AS last_ts
FROM events GROUP BY user_id
"""


QUERIES = {"stream_stateful_user_totals": stream_stateful_user_totals}
ORACLE = {"stream_stateful_user_totals": STATEFUL_SQL}
