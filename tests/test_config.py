"""C4's operational half: option validation and the PUT-reconfigure +
restart lifecycle (reference: README.md:296-339) driven end-to-end through
a checkpointed streaming restart with a mid-stream decimal-mode switch."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.cdc.config import (
    CdcPipelineConfig,
    from_options,
    reconfigure,
    start_pipeline,
)
from realtime_change_data_capture_streaming_spark.sources import synthetic_change_events


def test_option_parsing_and_validation():
    cfg = from_options(
        {"cdc.decimalMode": "double", "cdc.deadLetter": "true", "cdc.buckets": "128"}
    )
    assert cfg.decimal_mode == "double" and cfg.dead_letter and cfg.n_buckets == 128
    with pytest.raises(ValueError, match="unknown option"):
        from_options({"cdc.decimaMode": "string"})  # typo'd key rejected
    with pytest.raises(ValueError, match="decimalMode"):
        from_options({"cdc.decimalMode": "float"})
    with pytest.raises(ValueError):
        from_options({"cdc.buckets": "0"})


def test_reconfigure_flags_restart():
    cfg = CdcPipelineConfig()
    new, restart = reconfigure(cfg, {"cdc.decimalMode": "precise"})
    assert restart and new.decimal_mode == "precise"
    same, restart2 = reconfigure(cfg, {"cdc.decimalMode": cfg.decimal_mode})
    assert not restart2 and same == cfg


def test_decimal_mode_switch_across_checkpointed_restart(spark):
    """The reference's documented flow: connector reconfigured from string
    to double decimal handling, consumer restarted; sink must accumulate
    state across the restart (same checkpoint), with both eras decoded
    correctly."""
    in_dir = tempfile.mkdtemp(prefix="cfg_in_")
    work = tempfile.mkdtemp(prefix="cfg_work_")
    era1 = synthetic_change_events(spark, 50, updates_per_key=0, delete_every=0, seed=1, decimal_mode="string")
    era1.coalesce(1).write.mode("append").json(in_dir)

    def run(cfg):
        src = spark.readStream.schema("key string, value string").json(in_dir)
        q, sink = start_pipeline(
            spark, cfg, src, f"{work}/sink", f"{work}/ckpt", trigger={"availableNow": True}
        )
        q.awaitTermination(300)
        return sink

    cfg = from_options({"cdc.decimalMode": "string", "cdc.buckets": "8"})
    sink = run(cfg)
    assert sink.read().count() == 50

    # upstream connector switched to double mode -> PUT + restart
    era2 = synthetic_change_events(spark, 40, updates_per_key=0, delete_every=0, seed=2, decimal_mode="double")
    era2.coalesce(1).write.mode("append").json(in_dir)
    cfg2, restart = reconfigure(cfg, {"cdc.decimalMode": "double"})
    assert restart
    sink = run(cfg2)

    live = sink.read()
    assert live.count() == 90  # era1 NOT reprocessed (offsets), era2 added
    assert live.filter(F.col("amount").isNull()).count() == 0
    # both eras decoded to exact 2-dp decimals
    bad = live.filter(F.col("amount") != F.round(F.col("amount"), 2)).count()
    assert bad == 0


def test_kafka_tombstones_streaming_compacted_bootstrap(spark):
    """cdc.kafkaTombstones=delete through the full streaming pipeline: a
    compacted-topic bootstrap where one key's delete survives only as a
    null-value tombstone must end with that key absent from the sink."""
    import json as _json

    in_dir = tempfile.mkdtemp(prefix="tomb_in_")
    work = tempfile.mkdtemp(prefix="tomb_work_")
    events = synthetic_change_events(spark, 20, updates_per_key=0, delete_every=0, seed=3)
    keys = [r["key"] for r in events.select("key").orderBy("key").collect()]
    victim = keys[0]
    # stage: all inserts + ONE tombstone (null value) for the victim key
    events.coalesce(1).write.mode("append").json(in_dir)
    with open(f"{in_dir}/tombstone.json", "w") as f:
        f.write(_json.dumps({"key": victim, "value": None}) + "\n")

    cfg = from_options({"cdc.kafkaTombstones": "delete", "cdc.buckets": "8"})
    src = spark.readStream.schema("key string, value string").json(in_dir)
    q, sink = start_pipeline(
        spark, cfg, src, f"{work}/sink", f"{work}/ckpt", trigger={"availableNow": True}
    )
    q.awaitTermination(300)
    live = sink.read()
    assert live.count() == 19
    assert live.filter(F.col("transaction_id") == victim).count() == 0

    with pytest.raises(ValueError, match="kafkaTombstones"):
        from_options({"cdc.kafkaTombstones": "ignore"})


def test_tombstone_then_reinsert_streaming_with_offsets(spark):
    """Compacted-topic bootstrap where the source carries Kafka offsets: a
    tombstone FOLLOWED by a re-insert of the same key must leave the key
    alive — start_pipeline switches latest-wins to log-position order when
    parse_envelope passes the offset through."""
    import json as _json

    in_dir = tempfile.mkdtemp(prefix="tomb_off_in_")
    work = tempfile.mkdtemp(prefix="tomb_off_work_")
    events = synthetic_change_events(spark, 10, updates_per_key=0, delete_every=0, seed=5)
    rows = events.selectExpr("key", "value").orderBy("key").collect()
    victim = rows[0]["key"]
    # log order: all inserts (offsets 0..9), tombstone (10), re-insert (11)
    reinsert = _json.loads(rows[0]["value"])
    reinsert["ts_ms"] += 1
    staged = [
        {"offset": i, "key": r["key"], "value": r["value"]} for i, r in enumerate(rows)
    ]
    staged.append({"offset": len(rows), "key": victim, "value": None})
    staged.append({"offset": len(rows) + 1, "key": victim, "value": _json.dumps(reinsert)})
    with open(f"{in_dir}/log.json", "w") as f:
        for rec in staged:
            f.write(_json.dumps(rec) + "\n")

    cfg = from_options({"cdc.kafkaTombstones": "delete", "cdc.buckets": "8"})
    src = spark.readStream.schema("offset long, key string, value string").json(in_dir)
    q, sink = start_pipeline(
        spark, cfg, src, f"{work}/sink", f"{work}/ckpt", trigger={"availableNow": True}
    )
    q.awaitTermination(300)
    live = sink.read()
    assert live.count() == 10  # the re-insert survives the tombstone
    assert live.filter(F.col("transaction_id") == victim).count() == 1
