"""Engine-option surface for the CDC pipeline — the operational half of C4.

The reference manages its pipeline through Kafka Connect's REST lifecycle:
POST to create a connector, PUT to reconfigure (e.g. switch
``decimal.handling.mode``), and a restart for changes to take effect
(``/root/reference/README.md:296-316``, REST rules ``:334-339``).  The
Spark-side equivalent is a validated, immutable options object plus an
explicit reconfigure-then-restart contract:

- **Options are declared and validated** (unknown keys and bad values are
  rejected up front, like Connect's config validation) — see ``OPTIONS``.
- **Every change requires a pipeline restart** to take effect, exactly as
  the connector REST flow does: stop the streaming query, build a new one
  from the new config.  This is SAFE mid-stream because the checkpoint
  stores only source offsets and the sink merge is idempotent — the
  restarted query resumes where the old one left off, and a replayed
  micro-batch is absorbed (``transaction_consumer.py:10``, ``:88``).
- ``cdc.decimalMode`` may legitimately change between runs when the
  upstream connector is reconfigured: the parse is stateless per batch,
  so old rows (decoded under the old mode) and new rows coexist in the
  sink without rewrite.
- ``cdc.buckets`` applies at table CREATION only; afterwards the sink
  manifest is authoritative and re-bucketing happens via compaction
  (``apply_changes.compact_sink``) — mirroring how a connector ignores
  create-time options on an existing topic.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession

from realtime_change_data_capture_streaming_spark.schemas import DECIMAL_MODES


@dataclass(frozen=True)
class CdcPipelineConfig:
    """Validated engine options for a parse -> apply-changes pipeline."""

    decimal_mode: str = "string"
    capture_extras: bool = False
    dead_letter: bool = False
    key_col: str = "key"
    n_buckets: int = 64
    kafka_tombstones: str = "drop"  # 'drop' (uncompacted topic) | 'delete' (compacted bootstrap)


def _parse_bool(v):
    if isinstance(v, bool):
        return v
    if str(v).lower() in ("true", "1", "yes"):
        return True
    if str(v).lower() in ("false", "0", "no"):
        return False
    raise ValueError(f"not a boolean: {v!r}")


def _parse_mode(v):
    if v not in DECIMAL_MODES:
        raise ValueError(f"cdc.decimalMode must be one of {DECIMAL_MODES}, got {v!r}")
    return v


def _parse_pos_int(v):
    n = int(v)
    if n < 1:
        raise ValueError(f"must be >= 1, got {v!r}")
    return n


#: public option keys -> (dataclass field, value parser).  The dotted names
#: mirror the connector-config style of the reference (README.md:299-312).
def _parse_tombstones(v):
    if v not in ("drop", "delete"):
        raise ValueError(f"cdc.kafkaTombstones must be 'drop' or 'delete', got {v!r}")
    return v


OPTIONS = {
    "cdc.decimalMode": ("decimal_mode", _parse_mode),
    "cdc.captureExtras": ("capture_extras", _parse_bool),
    "cdc.deadLetter": ("dead_letter", _parse_bool),
    "cdc.keyColumn": ("key_col", str),
    "cdc.buckets": ("n_buckets", _parse_pos_int),
    "cdc.kafkaTombstones": ("kafka_tombstones", _parse_tombstones),
}


def from_options(options: dict | None = None) -> CdcPipelineConfig:
    """Build a config from connector-style string options, validating
    every key and value (unknown keys are an error, not silently ignored
    — Connect behaves the same on config PUT)."""
    cfg = CdcPipelineConfig()
    for key, raw in (options or {}).items():
        if key not in OPTIONS:
            raise ValueError(f"unknown option {key!r}; known: {sorted(OPTIONS)}")
        field, parse = OPTIONS[key]
        cfg = replace(cfg, **{field: parse(raw)})
    return cfg


def reconfigure(cfg: CdcPipelineConfig, changes: dict) -> tuple[CdcPipelineConfig, bool]:
    """The PUT-reconfigure step: returns (new config, restart_required).

    ``restart_required`` is True whenever anything actually changed —
    a running streaming query never picks up options mid-flight, exactly
    like a Connect connector (``README.md:334-339``).  Restart = stop the
    query, call ``start_pipeline`` again with the same checkpoint dir.
    """
    merged = dict({k: getattr(cfg, f) for k, (f, _) in OPTIONS.items()})
    merged.update(changes)
    new_cfg = from_options(merged)
    return new_cfg, new_cfg != cfg


def start_pipeline(
    spark: SparkSession,
    cfg: CdcPipelineConfig,
    source: DataFrame,
    sink_path: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
):
    """POST-create / restart step: wire source -> parse -> merge under the
    given config.  Returns (StreamingQuery, BucketedParquetSink)."""
    from realtime_change_data_capture_streaming_spark.cdc.apply_changes import (
        BucketedParquetSink,
        apply_changes_stream,
    )
    from realtime_change_data_capture_streaming_spark.cdc.decode import parse_envelope

    parsed = parse_envelope(
        source,
        decimal_mode=cfg.decimal_mode,
        keep_corrupt=cfg.dead_letter,
        capture_extras=cfg.capture_extras,
        kafka_tombstones=cfg.kafka_tombstones,
    )
    if cfg.dead_letter:
        parsed = parsed.filter("_corrupt IS NULL").drop("_corrupt")
    sink = BucketedParquetSink(spark, sink_path, key_col=cfg.key_col, n_buckets=cfg.n_buckets)
    # Compacted-topic bootstrap with a Kafka-shaped source: parse_envelope
    # passed the record offset through, and log position — not the
    # sentinel-LSN — is the correct latest-wins order (a tombstone followed
    # by a re-insert must lose to the re-insert; see cdc/decode.py).  The
    # sink stores a 2-column ordering, so offset leads and ts_ms tiebreaks
    # (offsets are already unique per partition).
    order_cols: tuple[str, str] = ("lsn", "ts_ms")
    if cfg.kafka_tombstones == "delete" and "offset" in parsed.columns:
        order_cols = ("offset", "ts_ms")
    q = apply_changes_stream(parsed, sink, checkpoint_dir, trigger=trigger, order_cols=order_cols)
    return q, sink
