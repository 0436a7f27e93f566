"""Throughput floor: the engine must sustain >=10k events/s through
parse -> dedup -> merge on a small local session (BASELINE.md; the
reference's by-design ceiling is ~2 msg/s, transaction_producer.py:51)."""

from __future__ import annotations

import time

from realtime_change_data_capture_streaming_spark.cdc import apply_changes_batch, parse_envelope
from realtime_change_data_capture_streaming_spark.sources import synthetic_change_events


def test_parse_dedup_merge_throughput(spark):
    n_keys = 30_000  # ~96k events with 2 updates/key + deletes
    events = synthetic_change_events(spark, n_keys, updates_per_key=2, seed=11)
    events.write.format("noop").mode("overwrite").save()  # generation warm, excluded
    t0 = time.perf_counter()
    final = apply_changes_batch(parse_envelope(events, decimal_mode="string"))
    n_out = final.count()
    dt = time.perf_counter() - t0
    n_events = n_keys * 3  # c + 2u per key (deletes add a few more)
    rate = n_events / dt
    assert n_out > 0
    assert rate >= 10_000, f"parse->dedup->merge ran at {rate:.0f} events/s (< 10k floor)"
