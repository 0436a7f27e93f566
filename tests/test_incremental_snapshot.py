"""Property pin for the DBLog incremental-snapshot dedup rule.

The registered queries prove one fixed chunk geometry against the
closed-form oracle; this test pins the underlying CLAIM — emitting each
chunk's 'r' events at the chunk watermark LSN makes plain latest-wins
implement the DBLog chunk/stream dedup rule — on randomized interleavings:
random update/delete ordinals, random chunk boundaries, random watermarks
(odd ordinals, so they never collide with the even change ordinals), with
redelivery duplication on top.  A pure-Python reference computes the
expected final state per key independently of Spark."""

from __future__ import annotations

import json
import random

import pytest
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.cdc.apply_changes import latest_per_key
from realtime_change_data_capture_streaming_spark.cdc.decode import parse_envelope


def _scenario(seed: int):
    rng = random.Random(seed)
    n_keys = rng.randint(8, 40)
    keys = list(range(1, n_keys + 1))
    # per-key change history: insert at ordinal 0; optional update /
    # delete at even ordinals (update < delete)
    upd, dele = {}, {}
    for k in keys:
        if rng.random() < 0.5:
            upd[k] = 2 * rng.randint(1, 50)
        if rng.random() < 0.25:
            dele[k] = (upd.get(k, 0)) + 2 * rng.randint(1, 50)
    # random contiguous chunks with random ODD watermarks
    chunks = []
    i = 0
    while i < n_keys:
        j = min(n_keys, i + rng.randint(1, 7))
        chunks.append((keys[i:j], 2 * rng.randint(0, 100) + 1))
        i = j
    return keys, upd, dele, chunks


def _expected(keys, upd, dele, chunks):
    """Reference: per key, the event with the greatest LSN wins; the
    chunk 'r' (emitted only if the key is live at the watermark) carries
    the state as of the watermark."""
    wm = {}
    for ks, w in chunks:
        for k in ks:
            wm[k] = w
    out = {}
    for k in keys:
        events = [(0, "c", 100 + k)]  # insert: base value
        if k in upd:
            events.append((upd[k], "u", 200 + k))
        if k in dele:
            events.append((dele[k], "d", None))
        w = wm[k]
        if not (k in dele and dele[k] <= w):  # deleted rows leave the chunk
            val = 200 + k if (k in upd and upd[k] <= w) else 100 + k
            events.append((w, "r", val))
        lsn, op, val = max(events)
        if op != "d":
            out[k] = (op, val)
    return out


@pytest.mark.parametrize("seed", [1, 7, 23, 61, 97])
def test_latest_wins_implements_dblog_dedup(spark, seed):
    keys, upd, dele, chunks = _scenario(seed)
    wm = {k: w for ks, w in chunks for k in ks}
    rows = []

    def env(k, lsn, op, val):
        before = None
        after = None if op == "d" else {"transaction_id": str(k), "amount": str(val)}
        return (
            str(k),
            json.dumps(
                {
                    "before": before,
                    "after": after,
                    "op": op,
                    "ts_ms": 1,
                    "source": {"lsn": lsn, "table": "transactions", "db": "financialDB"},
                }
            ),
        )

    for k in keys:
        rows.append(env(k, 0, "c", 100 + k))
        if k in upd:
            rows.append(env(k, upd[k], "u", 200 + k))
        if k in dele:
            rows.append(env(k, dele[k], "d", None))
        w = wm[k]
        if not (k in dele and dele[k] <= w):
            val = 200 + k if (k in upd and upd[k] <= w) else 100 + k
            rows.append(env(k, w, "r", val))
    rng = random.Random(seed + 1)
    rows += [r for r in rows if rng.random() < 0.4]  # redelivery chaos
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "key string, value string")
    parsed = parse_envelope(df, decimal_mode="string")
    got = {
        int(r["key"]): (r["op"], int(float(r["after"]["amount"])))
        for r in latest_per_key(parsed, "key").filter(F.col("op") != "d").collect()
    }
    assert got == _expected(keys, upd, dele, chunks), f"seed {seed}"
