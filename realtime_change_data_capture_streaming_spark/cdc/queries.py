"""Oracle-checked CDC queries: the reference's core semantics exercised
end-to-end (encode -> Kafka-shaped JSON -> parse -> apply-changes) against
closed-form SQL oracles over the driver's ``orders`` fixture.

Event derivation (deterministic, from orders):
- every order       -> op 'c' (insert) of a transactions-shaped image
- o_orderkey%10==0  -> op 'u' bumping amount by +10.00 (full before image,
                       REPLICA IDENTITY FULL - /root/reference/README.md:170-174)
- o_orderkey%97==0  -> op 'd'
- the whole event set is UNIONed with itself and a prefix re-shuffled:
  at-least-once + reorder, absorbed by apply-changes
  (/root/reference/transaction_consumer.py:10, :88)

The oracle never sees the event stream — it states the expected final
table straight from orders, which is exactly the effectively-once
contract: chaos in, clean state out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.cdc.apply_changes import apply_changes_batch
from realtime_change_data_capture_streaming_spark.cdc.decode import parse_envelope
from realtime_change_data_capture_streaming_spark.cdc.diff import audit_stamp
from realtime_change_data_capture_streaming_spark.schemas import AMOUNT_TYPE
from realtime_change_data_capture_streaming_spark.sources.tables import load_table

_AMOUNT_BUMP = 10.0  # additive update keeps 2-dp values exact cross-engine


def _image(amount_col, key_col="o_orderkey", extra_fields=()):
    """orders row -> transactions-shaped wire image (string decimal mode).

    ``extra_fields`` appends aliased columns the v1 schema does not know —
    the wire shape Debezium produces after an upstream ``ALTER TABLE ADD``
    (``/root/reference/README.md:211``)."""
    return F.struct(
        F.col(key_col).cast("string").alias("transaction_id"),
        F.col("o_custkey").cast("string").alias("user_id"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("timestamp"),
        amount_col.cast(AMOUNT_TYPE).cast("string").alias("amount"),
        F.col("o_orderstatus").alias("currency"),
        F.lit("city").alias("city"),
        F.lit("country").alias("country"),
        F.col("o_orderpriority").alias("merchant_name"),
        F.lit("credit_card").alias("payment_method"),
        F.lit("0.0.0.0").alias("ip_address"),
        F.lit("").alias("voucher_code"),  # empty string, NOT null (main.py:23)
        F.col(key_col).cast("string").alias("affiliate_id"),
        *extra_fields,
    )


def order_change_events(spark: SparkSession, sf_dir: str, chaos: bool = True) -> DataFrame:
    """Kafka-shaped (key, value-JSON) change events derived from orders."""
    o = load_table(spark, sf_dir, "orders")
    base_lsn = F.col("o_orderkey") * 3
    ts_ms = F.unix_timestamp("o_orderdate") * 1000

    def env(before, after, op, lsn_off):
        return F.to_json(
            F.struct(
                before.alias("before"),
                after.alias("after"),
                F.lit(op).alias("op"),
                (ts_ms + lsn_off).alias("ts_ms"),
                F.struct(
                    (base_lsn + lsn_off).alias("lsn"),
                    F.lit("transactions").alias("table"),
                    F.lit("financialDB").alias("db"),
                ).alias("source"),
            )
        )

    key = F.col("o_orderkey").cast("string").alias("key")
    null_img = F.when(F.lit(False), _image(F.col("o_totalprice")))
    inserts = o.select(key, env(null_img, _image(F.col("o_totalprice")), "c", F.lit(0)).alias("value"))
    updates = o.filter(F.col("o_orderkey") % 10 == 0).select(
        key,
        env(
            _image(F.col("o_totalprice")),
            _image(F.col("o_totalprice") + _AMOUNT_BUMP),
            "u",
            F.lit(1),
        ).alias("value"),
    )
    deletes = o.filter(F.col("o_orderkey") % 97 == 0).select(
        key,
        env(
            _image(F.col("o_totalprice") + _AMOUNT_BUMP),
            F.when(F.lit(False), _image(F.col("o_totalprice"))),
            "d",
            F.lit(2),
        ).alias("value"),
    )
    events = inserts.unionByName(updates).unionByName(deletes)
    if chaos:
        # at-least-once + arrival reorder: re-deliver a third of the events
        # and scatter arrival order via a hash repartition (cheaper than a
        # full duplicate+sort; the dedup/ordering property proven is the same)
        redelivered = events.filter(F.pmod(F.xxhash64("key"), F.lit(3)) == 0)
        events = events.unionByName(redelivered).repartition(17)
    return events


def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship CDC pipeline, batch form: duplicated+reordered JSON
    envelopes -> parse (string decimal mode) -> latest-wins apply-changes.
    Oracle = closed-form final state from orders."""
    events = order_change_events(spark, sf_dir, chaos=True)
    parsed = parse_envelope(events, decimal_mode="string")
    final = apply_changes_batch(parsed)
    # exact decimal math internally, single cast to double at the output
    # boundary — the cross-engine hash recipe used by every oracle query
    return final.select(
        F.col("transaction_id"),
        F.col("user_id"),
        F.col("amount").cast("double").alias("amount"),
        F.col("currency"),
        F.col("merchant_name"),
        F.col("voucher_code"),
    )


CDC_APPLY_SQL = f"""
SELECT CAST(o_orderkey AS VARCHAR) AS transaction_id,
       CAST(o_custkey AS VARCHAR) AS user_id,
       CAST(CAST(CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + {_AMOUNT_BUMP} ELSE o_totalprice END
            AS DECIMAL(18,2)) AS DOUBLE) AS amount,
       o_orderstatus AS currency,
       o_orderpriority AS merchant_name,
       '' AS voucher_code
FROM orders
WHERE o_orderkey % 97 != 0
"""


def cdc_parse_envelope_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse-path check: per-op counts + exact decoded amount sums over the
    un-duplicated event stream (decimal decode, before/after presence)."""
    events = order_change_events(spark, sf_dir, chaos=False)
    parsed = parse_envelope(events, decimal_mode="string")
    return parsed.groupBy("op").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("after.amount")).cast("double").alias("sum_after_amount"),
        F.count(F.col("before.transaction_id")).alias("n_with_before"),
    )


CDC_PARSE_SQL = f"""
SELECT 'c' AS op, COUNT(*) AS n_events,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_after_amount,
       0 AS n_with_before
FROM orders
UNION ALL
SELECT 'u', COUNT(*),
       CAST(SUM(CAST(o_totalprice + {_AMOUNT_BUMP} AS DECIMAL(18,2))) AS DOUBLE),
       COUNT(*)
FROM orders WHERE o_orderkey % 10 = 0
UNION ALL
SELECT 'd', COUNT(*), NULL, COUNT(*)
FROM orders WHERE o_orderkey % 97 = 0
"""


def cdc_change_diff_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 change-diff as relational rows: for each update event, one row
    per changed column with old/new rendered as text (the jsonb trigger's
    content, /root/reference/README.md:219-251, minus the formatting)."""
    events = order_change_events(spark, sf_dir, chaos=False)
    parsed = parse_envelope(events, decimal_mode="string").filter(F.col("op") == "u")
    cols = ["amount", "user_id", "currency", "voucher_code"]
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"before.{c}").cast("string").alias("old_val"),
                F.col(f"after.{c}").cast("string").alias("new_val"),
            )
            for c in cols
        ]
    )
    return (
        parsed.select("key", F.explode(pairs).alias("d"))
        .filter(~F.col("d.old_val").eqNullSafe(F.col("d.new_val")))  # IS DISTINCT FROM
        .select("key", F.col("d.col").alias("col"), F.col("d.old_val").alias("old_val"), F.col("d.new_val").alias("new_val"))
    )


CDC_DIFF_SQL = f"""
SELECT CAST(o_orderkey AS VARCHAR) AS key,
       'amount' AS col,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS old_val,
       CAST(CAST(o_totalprice + {_AMOUNT_BUMP} AS DECIMAL(18,2)) AS VARCHAR) AS new_val
FROM orders WHERE o_orderkey % 10 = 0
"""


def cdc_audit_stamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 audit stamping over the applied table (deterministic timestamp
    so the oracle can reproduce; production uses current_timestamp())."""
    final = cdc_apply_changes(spark, sf_dir)
    stamped = audit_stamp(final, user="etl_user", ts=F.lit("2026-02-20 00:00:00").cast("timestamp"))
    return stamped.select(
        "transaction_id",
        F.col("amount").cast("double").alias("amount"),
        "modified_by",
        "modified_at",
    )


CDC_AUDIT_SQL = f"""
SELECT CAST(o_orderkey AS VARCHAR) AS transaction_id,
       CAST(CAST(CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + {_AMOUNT_BUMP} ELSE o_totalprice END
            AS DECIMAL(18,2)) AS DOUBLE) AS amount,
       'etl_user' AS modified_by,
       TIMESTAMP '2026-02-20 00:00:00' AS modified_at
FROM orders
WHERE o_orderkey % 97 != 0
"""


def cdc_decimal_modes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY.md 1.4.1 as a correctness query: orders amounts encoded into
    each Debezium wire shape (precise base64 / string / double) and
    decoded back — all three columns must equal the source value."""
    from realtime_change_data_capture_streaming_spark.cdc.decode import decode_amount
    from realtime_change_data_capture_streaming_spark.cdc.encode import encode_amount

    o = load_table(spark, sf_dir, "orders")
    amount = F.col("o_totalprice").cast(AMOUNT_TYPE)
    # decode math stays exact decimal; the final cast to double is only the
    # cross-engine output rendering (fixture amounts are 2-dp, lossless)
    return o.select(
        "o_orderkey",
        decode_amount(encode_amount(amount, "precise"), "precise").cast("double").alias("amount_precise"),
        decode_amount(encode_amount(amount, "string"), "string").cast("double").alias("amount_string"),
        decode_amount(encode_amount(amount, "double"), "double").cast("double").alias("amount_double"),
    )


CDC_DECIMAL_MODES_SQL = """
SELECT o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS amount_precise,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS amount_string,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS amount_double
FROM orders
"""


def schema_evolution_events(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The ALTER-TABLE-ADD wire scenario as two phases of (key, value)
    envelope events: phase 1 = v1-schema inserts; phase 2 = updates
    carrying the NEW ``channel`` column plus deletes.  Shared by the
    batch query (union) and the streaming variant (one micro-batch per
    phase, so the widening happens MID-STREAM)."""
    o = load_table(spark, sf_dir, "orders")
    base_lsn = F.col("o_orderkey") * 3
    ts_ms = F.unix_timestamp("o_orderdate") * 1000

    def env(before, after, op, lsn_off):
        return F.to_json(
            F.struct(
                before.alias("before"),
                after.alias("after"),
                F.lit(op).alias("op"),
                (ts_ms + lsn_off).alias("ts_ms"),
                F.struct((base_lsn + lsn_off).alias("lsn")).alias("source"),
            )
        )

    key = F.col("o_orderkey").cast("string").alias("key")
    null_img = F.when(F.lit(False), _image(F.col("o_totalprice")))
    channel = F.when(F.col("o_orderkey") % 20 == 0, F.lit("web")).otherwise(F.lit("store"))
    inserts = o.select(key, env(null_img, _image(F.col("o_totalprice")), "c", F.lit(0)).alias("value"))
    updates = o.filter(F.col("o_orderkey") % 10 == 0).select(
        key,
        env(
            _image(F.col("o_totalprice")),
            _image(F.col("o_totalprice") + _AMOUNT_BUMP, extra_fields=(channel.alias("channel"),)),
            "u",
            F.lit(1),
        ).alias("value"),
    )
    deletes = o.filter(F.col("o_orderkey") % 97 == 0).select(
        key,
        env(_image(F.col("o_totalprice") + _AMOUNT_BUMP), F.when(F.lit(False), _image(F.col("o_totalprice"))), "d", F.lit(2)).alias("value"),
    )
    return inserts, updates.unionByName(deletes)


def evolution_result_columns(final: DataFrame) -> DataFrame:
    """The evolution scenario's output shape: amount as double, the
    evolved column surfaced from the ``_extra`` map."""
    return final.select(
        F.col("transaction_id"),
        F.col("amount").cast("double").alias("amount"),
        F.element_at(F.col("_extra"), "channel").alias("channel"),
    )


def cdc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mid-stream column add, end to end: insert events use the v1 schema;
    the later update events carry a ``channel`` column added upstream
    (ALTER TABLE ADD, ``/root/reference/README.md:211``).  The fixed-schema
    parse must NOT silently drop it — ``capture_extras`` routes it into the
    ``_extra`` map, apply-changes carries it latest-wins, and rows never
    touched after the evolution show NULL, exactly like a widened table."""
    phase1, phase2 = schema_evolution_events(spark, sf_dir)
    events = phase1.unionByName(phase2)
    parsed = parse_envelope(events, decimal_mode="string", capture_extras=True)
    return evolution_result_columns(apply_changes_batch(parsed))


CDC_EVOLUTION_SQL = f"""
SELECT CAST(o_orderkey AS VARCHAR) AS transaction_id,
       CAST(CAST(CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + {_AMOUNT_BUMP} ELSE o_totalprice END
            AS DECIMAL(18,2)) AS DOUBLE) AS amount,
       CASE WHEN o_orderkey % 10 = 0
            THEN CASE WHEN o_orderkey % 20 = 0 THEN 'web' ELSE 'store' END
       END AS channel
FROM orders
WHERE o_orderkey % 97 != 0
"""


def cdc_snapshot_then_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium ``snapshot.mode=initial`` bootstrap, end to end: a
    consistent snapshot emits every row as op='r' (read) at the snapshot
    LSN, then the WAL stream takes over — re-delivering some inserts that
    are ALSO in the snapshot (Debezium guarantees overlap, not a clean
    cut) plus the post-snapshot updates and deletes.

    Most keys' final state comes solely from their 'r' row; overlap
    duplicates and the snapshot/stream boundary are absorbed by the same
    latest-wins merge as any replay (``transaction_consumer.py:10,:88``
    generalized).  Oracle = the closed-form final table; the snapshot
    machinery must be invisible in the result."""
    o = load_table(spark, sf_dir, "orders")
    base_lsn = F.col("o_orderkey") * 3
    ts_ms = F.unix_timestamp("o_orderdate") * 1000

    def env(before, after, op, lsn_off):
        return F.to_json(
            F.struct(
                before.alias("before"),
                after.alias("after"),
                F.lit(op).alias("op"),
                (ts_ms + lsn_off).alias("ts_ms"),
                F.struct(
                    (base_lsn + lsn_off).alias("lsn"),
                    F.lit("transactions").alias("table"),
                    F.lit("financialDB").alias("db"),
                ).alias("source"),
            )
        )

    key = F.col("o_orderkey").cast("string").alias("key")
    null_img = F.when(F.lit(False), _image(F.col("o_totalprice")))
    # phase 1: snapshot — every live row as op='r' at the insert LSN
    snapshot = o.select(key, env(null_img, _image(F.col("o_totalprice")), "r", F.lit(0)).alias("value"))
    # phase 2: stream — overlapping 'c' redelivery for a third of keys,
    # then the incremental tail (updates + deletes)
    overlap = o.filter(F.pmod(F.xxhash64(F.col("o_orderkey").cast("string")), F.lit(3)) == 0).select(
        key, env(null_img, _image(F.col("o_totalprice")), "c", F.lit(0)).alias("value")
    )
    updates = o.filter(F.col("o_orderkey") % 10 == 0).select(
        key,
        env(_image(F.col("o_totalprice")), _image(F.col("o_totalprice") + _AMOUNT_BUMP), "u", F.lit(1)).alias("value"),
    )
    deletes = o.filter(F.col("o_orderkey") % 97 == 0).select(
        key,
        env(_image(F.col("o_totalprice") + _AMOUNT_BUMP), F.when(F.lit(False), _image(F.col("o_totalprice"))), "d", F.lit(2)).alias("value"),
    )
    events = snapshot.unionByName(overlap).unionByName(updates).unionByName(deletes).repartition(17)
    parsed = parse_envelope(events, decimal_mode="string")
    final = apply_changes_batch(parsed)
    return final.select(
        F.col("transaction_id"),
        F.col("amount").cast("double").alias("amount"),
        F.col("payment_method"),
    )


CDC_SNAPSHOT_SQL = f"""
SELECT CAST(o_orderkey AS VARCHAR) AS transaction_id,
       CAST(CAST(CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + {_AMOUNT_BUMP} ELSE o_totalprice END
            AS DECIMAL(18,2)) AS DOUBLE) AS amount,
       'credit_card' AS payment_method
FROM orders
WHERE o_orderkey % 97 != 0
"""


def cdc_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sink as a CDC *source*: merge the insert wave (snapshot), then
    the update/delete wave, and read ``changes()`` between the two
    snapshots — the Delta-CDF shape that lets a downstream consumer
    re-subscribe to the table instead of replaying the topic.

    Classification oracle (closed-form from orders): keys with
    ``o_orderkey % 10 == 0`` (and not deleted) advanced -> update_postimage
    with the bumped amount; keys with ``% 97 == 0`` died -> delete with a
    NULL post-image amount (the tombstone's after-image; a delete that was
    also an update candidate still classifies as delete — the 'd' envelope
    carries the higher LSN).  One full-outer join of two bucket-aligned
    snapshots on the key (see ``BucketedParquetSink.changes``)."""
    from realtime_change_data_capture_streaming_spark.session import scratch_dir

    from realtime_change_data_capture_streaming_spark.cdc.apply_changes import (
        BucketedParquetSink,
    )

    o = load_table(spark, sf_dir, "orders")
    base_lsn = F.col("o_orderkey") * 3
    ts_ms = F.unix_timestamp("o_orderdate") * 1000

    def env(before, after, op, lsn_off):
        return F.to_json(
            F.struct(
                before.alias("before"),
                after.alias("after"),
                F.lit(op).alias("op"),
                (ts_ms + lsn_off).alias("ts_ms"),
                F.struct(
                    (base_lsn + lsn_off).alias("lsn"),
                    F.lit("transactions").alias("table"),
                    F.lit("financialDB").alias("db"),
                ).alias("source"),
            )
        )

    key = F.col("o_orderkey").cast("string").alias("key")
    null_img = F.when(F.lit(False), _image(F.col("o_totalprice")))
    inserts = o.select(key, env(null_img, _image(F.col("o_totalprice")), "c", F.lit(0)).alias("value"))
    updates = o.filter(F.col("o_orderkey") % 10 == 0).select(
        key,
        env(_image(F.col("o_totalprice")), _image(F.col("o_totalprice") + _AMOUNT_BUMP), "u", F.lit(1)).alias("value"),
    )
    deletes = o.filter(F.col("o_orderkey") % 97 == 0).select(
        key,
        env(_image(F.col("o_totalprice") + _AMOUNT_BUMP), F.when(F.lit(False), _image(F.col("o_totalprice"))), "d", F.lit(2)).alias("value"),
    )
    sink = BucketedParquetSink(
        spark, scratch_dir(prefix="cdc_feed_") + "/t", n_buckets=16
    )
    sink.merge(parse_envelope(inserts, decimal_mode="string"))  # seq 0
    sink.merge(parse_envelope(updates.unionByName(deletes).repartition(17), decimal_mode="string"))  # seq 1
    feed = sink.changes(0, to_seq=1)
    return feed.select(
        F.col("key"),
        F.col("_change_type"),
        F.col("amount").cast("double").alias("amount"),
    )


CDC_CHANGE_FEED_SQL = f"""
SELECT CAST(o_orderkey AS VARCHAR) AS key,
       'update_postimage' AS _change_type,
       CAST(CAST(o_totalprice + {_AMOUNT_BUMP} AS DECIMAL(18,2)) AS DOUBLE) AS amount
FROM orders WHERE o_orderkey % 10 = 0 AND o_orderkey % 97 != 0
UNION ALL
SELECT CAST(o_orderkey AS VARCHAR) AS key,
       'delete' AS _change_type,
       CAST(NULL AS DOUBLE) AS amount
FROM orders WHERE o_orderkey % 97 = 0
"""


def cdc_time_travel_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta/Iceberg-style TIME TRAVEL as a driver-checked query: two
    real merge commits into the versioned sink (inserts, then
    updates+deletes), then ``read(at_seq=0)`` against the superseded
    manifest alongside the live read — the snapshot summary per version.
    Version 0 must replay the pre-update table exactly even though the
    second merge has already rewritten its buckets' successors (GC
    retains the grace window; ``tests/test_sink_scale.py`` pins the
    mechanism, this query pins the STATE against the closed-form
    oracle)."""
    from realtime_change_data_capture_streaming_spark.cdc.apply_changes import BucketedParquetSink
    from realtime_change_data_capture_streaming_spark.session import scratch_dir

    parsed = parse_envelope(
        order_change_events(spark, sf_dir, chaos=False), decimal_mode="string"
    )
    sink = BucketedParquetSink(spark, scratch_dir(prefix="cdc_tt_") + "/t", n_buckets=16)
    sink.merge(parsed.filter(F.col("op") == "c"))  # seq 0: initial snapshot
    sink.merge(parsed.filter(F.col("op") != "c").repartition(17))  # seq 1: live

    def summarize(df: DataFrame, seq: int) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("amount").cast("double").alias("sum_amount"),
        ).select(F.lit(seq).cast("bigint").alias("version"), "n_rows", "sum_amount")

    return summarize(sink.read(at_seq=0), 0).unionByName(summarize(sink.read(), 1))


CDC_TIME_TRAVEL_SQL = f"""
SELECT CAST(0 AS BIGINT) AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_amount
FROM orders
UNION ALL
SELECT CAST(1 AS BIGINT), CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + {_AMOUNT_BUMP}
                          ELSE o_totalprice END AS DECIMAL(18,2))) AS DOUBLE)
FROM orders WHERE o_orderkey % 97 != 0
"""


#: Debezium's actual placeholder for columns whose value was not in the
#: WAL record (Postgres TOAST columns on UPDATE, unchanged large values)
_TOAST_SENTINEL = "__debezium_unavailable_value__"


def toast_change_phases(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(inserts, updates+deletes) change phases for the TOAST scenario:
    inserts carry the real voucher; updates re-log the amount but carry
    Debezium's unavailable-value placeholder for the voucher (the column
    Postgres did not re-log); deletes as usual.  Shared by the batch
    repair query and the cross-batch streaming variant."""
    o = load_table(spark, sf_dir, "orders")
    base_lsn = F.col("o_orderkey") * 3
    ts_ms = F.unix_timestamp("o_orderdate") * 1000

    def env(before, after, op, lsn_off):
        return F.to_json(
            F.struct(
                before.alias("before"),
                after.alias("after"),
                F.lit(op).alias("op"),
                (ts_ms + lsn_off).alias("ts_ms"),
                F.struct(
                    (base_lsn + lsn_off).alias("lsn"),
                    F.lit("transactions").alias("table"),
                    F.lit("financialDB").alias("db"),
                ).alias("source"),
            )
        )

    key = F.col("o_orderkey").cast("string").alias("key")
    real_voucher = F.concat(F.lit("VC"), F.col("o_orderkey").cast("string"))
    ins_img = _image(F.col("o_totalprice")).withField("voucher_code", real_voucher)
    upd_img = _image(F.col("o_totalprice") + _AMOUNT_BUMP).withField(
        "voucher_code", F.lit(_TOAST_SENTINEL)
    )
    null_img = F.when(F.lit(False), ins_img)
    inserts = o.select(key, env(null_img, ins_img, "c", F.lit(0)).alias("value"))
    updates = o.filter(F.col("o_orderkey") % 10 == 0).select(
        key, env(ins_img, upd_img, "u", F.lit(1)).alias("value")
    )
    deletes = o.filter(F.col("o_orderkey") % 97 == 0).select(
        key, env(upd_img, F.when(F.lit(False), ins_img), "d", F.lit(2)).alias("value")
    )
    return inserts, updates.unionByName(deletes)


def cdc_toast_column_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TOAST-column repair every Postgres+Debezium pipeline needs:
    UPDATE events arrive with ``__debezium_unavailable_value__`` in large
    columns the WAL did not re-log, and a naive latest-wins merge
    OVERWRITES the real value with the placeholder.  The repair: after
    the latest-wins fold, fill sentinel columns from the key's latest
    NON-sentinel image (one max_by(value, lsn) aggregate over the
    filtered change stream — no window, replay-safe under duplication
    since ties carry equal values).  Output pins that no placeholder
    survives and flags which rows needed repair.
    ``stream_toast_column_fill`` proves the cross-batch form, where the
    fill source is the SINK's stored state, not the event set."""
    ins, upd_del = toast_change_phases(spark, sf_dir)
    events = ins.unionByName(upd_del)
    redelivered = events.filter(F.pmod(F.xxhash64("key"), F.lit(3)) == 0)
    events = events.unionByName(redelivered).repartition(17)

    from realtime_change_data_capture_streaming_spark.cdc.apply_changes import latest_per_key

    parsed = parse_envelope(events, decimal_mode="string")
    last = latest_per_key(parsed, "key").filter(F.col("op") != "d")
    fills = (
        parsed.filter(
            (F.col("after.voucher_code") != F.lit(_TOAST_SENTINEL)) & (F.col("op") != "d")
        )
        .groupBy("key")
        .agg(F.max_by(F.col("after.voucher_code"), F.col("lsn")).alias("fill_voucher"))
    )
    toasted = F.col("after.voucher_code") == F.lit(_TOAST_SENTINEL)
    return last.join(fills, "key", "left").select(
        F.col("after.transaction_id").alias("transaction_id"),
        F.col("after.amount").cast("double").alias("amount"),
        F.when(toasted, F.col("fill_voucher"))
        .otherwise(F.col("after.voucher_code"))
        .alias("voucher_code"),
        toasted.alias("was_toasted"),
    )


CDC_TOAST_SQL = f"""
SELECT CAST(o_orderkey AS VARCHAR) AS transaction_id,
       CAST(CAST(CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + {_AMOUNT_BUMP}
                      ELSE o_totalprice END AS DECIMAL(18,2)) AS DOUBLE) AS amount,
       'VC' || CAST(o_orderkey AS VARCHAR) AS voucher_code,
       o_orderkey % 10 = 0 AS was_toasted
FROM orders WHERE o_orderkey % 97 != 0
"""


#: DBLog-style incremental snapshot geometry: chunk size (keys per chunk
#: window) and the ordinal bases that keep every event class in its own
#: LSN region at any scale factor (orderkey < 2^30).  Stream-change
#: ordinals live in DOUBLED space (2k) so each chunk's watermark — the
#: odd number just below the chunk's midpoint ordinal — can sit strictly
#: BETWEEN the first-half and second-half changes of its own chunk:
#: first-half updates are already inside the chunk image (the 'r' event
#: outranks their redundant stream copies), second-half updates arrive
#: only via the stream and outrank the chunk image.  No two events of
#: one key ever share an LSN, so latest-wins needs no tie rules.
_ISNAP_CHUNK = 64
_ISNAP_STREAM_BASE = 1 << 30
_ISNAP_DELETE_BASE = 1 << 31


def incremental_snapshot_events(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(chunk_reads, stream_events) for the incremental-snapshot scenario.

    The reference's snapshot story is ``snapshot.mode=initial`` only
    (``/root/reference/README.md:299-312``): stop the world, copy, then
    stream.  Real Debezium re-snapshots LIVE tables incrementally
    (DBLog): the table is walked in key-range chunks, each chunk emitted
    as 'r' (read) events carrying the row image AS OF that chunk's
    watermark, interleaved with the concurrent 'c'/'u'/'d' stream — and
    the consumer must absorb the chunk/stream overlap per key.  Here a
    chunk's 'r' events carry LSN = the chunk watermark, which makes
    plain latest-wins BY LSN implement exactly the DBLog dedup rule:
    a chunk image already containing a change outranks that change's
    redundant stream copy; a change the chunk missed outranks the stale
    chunk image."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    ts_ms = F.unix_timestamp("o_orderdate") * 1000

    def env(before, after, op, lsn):
        return F.to_json(
            F.struct(
                before.alias("before"),
                after.alias("after"),
                F.lit(op).alias("op"),
                ts_ms.alias("ts_ms"),
                F.struct(
                    lsn.cast("bigint").alias("lsn"),
                    F.lit("transactions").alias("table"),
                    F.lit("financialDB").alias("db"),
                ).alias("source"),
            )
        )

    key = k.cast("string").alias("key")
    base_img = _image(F.col("o_totalprice"))
    upd_img = _image(F.col("o_totalprice") + _AMOUNT_BUMP)
    null_img = F.when(F.lit(False), base_img)
    c, half = _ISNAP_CHUNK, _ISNAP_CHUNK // 2
    inserts = o.select(key, env(null_img, base_img, "c", k).alias("value"))
    upd_lsn = F.lit(_ISNAP_STREAM_BASE) + k * 2
    updates = o.filter(k % 5 == 0).select(
        key, env(base_img, upd_img, "u", upd_lsn).alias("value")
    )
    deletes = o.filter(k % 97 == 0).select(
        key, env(upd_img, null_img, "d", F.lit(_ISNAP_DELETE_BASE) + k).alias("value")
    )
    # chunk watermark: odd ordinal strictly between the chunk's first-
    # and second-half stream changes; the chunk image reflects exactly
    # the changes at or below it
    w_lsn = F.lit(_ISNAP_STREAM_BASE) + (F.floor(k / c) * c + half) * 2 - 1
    snapped = (k % 5 == 0) & (k % c < half)
    reads = o.select(
        key, env(null_img, F.when(snapped, upd_img).otherwise(base_img), "r", w_lsn).alias("value")
    )
    return reads, inserts.unionByName(updates).unionByName(deletes)


def cdc_incremental_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold the interleaved chunk/stream feed (with redelivery chaos) into
    final state: one latest-wins aggregate, no windows.  ``last_op``
    exposes WHICH source won per key — 'r' where the chunk image was
    authoritative (never-changed keys, and first-half updates the chunk
    had already absorbed), 'u' where a post-watermark stream change beat
    the chunk — so the oracle checks the interleaving itself, not just
    the final amounts.  ``stream_cdc_incremental_snapshot`` proves the
    same feed across real micro-batches."""
    from realtime_change_data_capture_streaming_spark.cdc.apply_changes import latest_per_key

    reads, stream = incremental_snapshot_events(spark, sf_dir)
    events = reads.unionByName(stream)
    redelivered = events.filter(F.pmod(F.xxhash64("key"), F.lit(3)) == 0)
    events = events.unionByName(redelivered).repartition(17)
    parsed = parse_envelope(events, decimal_mode="string")
    last = latest_per_key(parsed, "key").filter(F.col("op") != "d")
    return last.select(
        F.col("after.transaction_id").alias("transaction_id"),
        F.col("after.amount").cast("double").alias("amount"),
        F.col("op").alias("last_op"),
    )


CDC_ISNAP_SQL = f"""
SELECT CAST(o_orderkey AS VARCHAR) AS transaction_id,
       CAST(CAST(CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + {_AMOUNT_BUMP}
                      ELSE o_totalprice END AS DECIMAL(18,2)) AS DOUBLE) AS amount,
       CASE WHEN o_orderkey % 5 = 0 AND o_orderkey % {_ISNAP_CHUNK} >= {_ISNAP_CHUNK // 2}
            THEN 'u' ELSE 'r' END AS last_op
FROM orders WHERE o_orderkey % 97 != 0
"""


_RECONCILE_SHARDS = 16


def cdc_reconcile_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sink<->source RECONCILIATION — the audit every CDC operator runs
    on a live replica: shard the key space, compute per-shard
    (row count, exact amount-cents sum, key-fingerprint sum) over the
    SINK's materialized state, and compare against the same checksums
    computed independently from the SOURCE.  Here the full chaos feed is
    merged into a real BucketedParquetSink and the query emits the
    sink-side checksums; the oracle computes the source-side expectation
    closed-form from orders — so the driver's hash match IS the
    reconciliation passing.  Shards and fingerprints are md5-derived
    (portable-hash discipline), sums are exact bigints.  Fingerprints
    are 32-bit (md5 hex chars 9-16, a slice DISJOINT from the shard's
    chars 1-8, so the fingerprint sum carries information the shard id
    does not): max fp < 2^32, so the per-shard bigint sum is guaranteed
    safe to 2^31 rows/shard (~2.1B rows/shard, ~34B keys at 16 shards;
    raise ``_RECONCILE_SHARDS`` past that).  A 48-bit fingerprint would
    wrap a bigint at only ~2^15 rows/shard — and asymmetrically: Spark's
    non-ANSI SUM wraps silently while the DuckDB oracle's HUGEINT-
    promoted SUM fails its BIGINT cast.  The assert_true guard below
    makes any future overflow loud and symmetric instead.
    At scale this is one bucket-pruned scan of the sink + one
    shard-cardinality aggregate — no source-side join, which is the
    point: the two sides are computed independently and compared small."""
    from realtime_change_data_capture_streaming_spark.cdc.apply_changes import BucketedParquetSink
    from realtime_change_data_capture_streaming_spark.llm_ops.curation import hash_bucket
    from realtime_change_data_capture_streaming_spark.session import scratch_dir

    events = order_change_events(spark, sf_dir, chaos=True)
    parsed = parse_envelope(events, decimal_mode="string")
    work = scratch_dir(prefix="cdc_reconcile_")
    sink = BucketedParquetSink(spark, f"{work}/sink", n_buckets=8)
    sink.merge(parsed)
    state = sink.read()
    shard = hash_bucket(F.col("transaction_id"), _RECONCILE_SHARDS)
    fp = F.conv(F.substring(F.md5(F.col("transaction_id")), 9, 8), 16, 10).cast("bigint")
    cents = (F.col("amount").cast(AMOUNT_TYPE) * 100).cast("bigint")
    agged = (
        state.select(shard.alias("shard"), cents.alias("c"), fp.alias("fp"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("c").cast("bigint").alias("sum_cents"),
            F.sum("fp").cast("bigint").alias("key_fingerprint"),
        )
    )
    # loud overflow guard (the ANOVA discipline, stats.py): past 2^31
    # rows/shard the fingerprint sum could exceed bigint — fail the
    # Spark side as loudly as the oracle would, never wrap silently
    guard = F.coalesce(
        F.assert_true(
            F.col("n_rows") < F.lit(1 << 31),
            F.lit("reconcile fingerprint sum may exceed bigint; raise _RECONCILE_SHARDS"),
        ).cast("bigint"),
        F.lit(0).cast("bigint"),
    )
    return agged.select(
        "shard",
        "n_rows",
        "sum_cents",
        (F.col("key_fingerprint") + guard).alias("key_fingerprint"),
    )


CDC_RECONCILE_SQL = f"""
WITH expected AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS k,
         CAST(CAST(CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + {_AMOUNT_BUMP}
                        ELSE o_totalprice END AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM orders WHERE o_orderkey % 97 != 0
)
SELECT CAST(('0x' || substr(md5(k), 1, 8))::UBIGINT % {_RECONCILE_SHARDS} AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(c) AS BIGINT) AS sum_cents,
       CAST(SUM(CAST(('0x' || substr(md5(k), 9, 8))::UBIGINT AS BIGINT)) AS BIGINT) AS key_fingerprint
FROM expected
GROUP BY 1
"""


def cdc_lsn_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAL-continuity audit: per key, does the observed LSN sequence have
    holes?  span = max-min+1 vs the observed event count — the capture-
    completeness check a CDC operator runs when a connector restart or
    topic retention may have dropped changes.  One agg per key, no
    window.  On this feed the keys with a delete but no update (%97
    without %10) genuinely skip one ordinal — the oracle enumerates
    exactly those."""
    events = order_change_events(spark, sf_dir, chaos=False)
    parsed = parse_envelope(events, decimal_mode="string")
    per_key = parsed.groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.max("lsn") - F.min("lsn") + F.lit(1)).cast("bigint").alias("lsn_span"),
    )
    return per_key.select(
        "key",
        "n_events",
        "lsn_span",
        (F.col("lsn_span") - F.col("n_events")).alias("n_missing"),
    ).filter(F.col("n_missing") > 0)


CDC_LSN_GAP_SQL = """
SELECT CAST(o_orderkey AS VARCHAR) AS key,
       CAST(2 AS BIGINT) AS n_events,
       CAST(3 AS BIGINT) AS lsn_span,
       CAST(1 AS BIGINT) AS n_missing
FROM orders
WHERE o_orderkey % 97 = 0 AND o_orderkey % 10 != 0
"""


def cdc_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed events routed to a dead-letter projection instead of
    killing the pipeline (reference behavior is log-and-skip,
    /root/reference/transaction_consumer.py:79-81; we keep the payload)."""
    events = order_change_events(spark, sf_dir, chaos=False)
    garbage = spark.createDataFrame(
        [("bad-1", "{not json"), ("bad-2", ""), ("bad-3", "[1,2,3]")],
        "key string, value string",
    )
    from realtime_change_data_capture_streaming_spark.cdc.decode import parse_envelope as _pe

    parsed = _pe(events.unionByName(garbage), "string", keep_corrupt=True)
    return (
        parsed.filter(F.col("_corrupt").isNotNull())
        .select("key", F.col("_corrupt").alias("payload"))
    )


CDC_DEAD_LETTER_SQL = """
SELECT * FROM (VALUES ('bad-1', '{not json'), ('bad-2', ''), ('bad-3', '[1,2,3]'))
  AS t(key, payload)
"""


def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 from the change stream: every
    non-delete change becomes a VERSION row with a validity interval, so
    downstream joins can ask "what did this row look like at ordinal X" —
    the standard warehouse consumption of CDC history (vs apply-changes,
    which keeps only the latest image).

    Versioned on the LSN ordinal (the WAL clock — exact and timezone-free;
    wall-clock SCD2 is the same window with ts_ms).  At-least-once
    redeliveries collapse via (key, lsn) dedup; ``valid_to_lsn`` is the
    next change's lsn via one lead() window, null = still current; a
    delete event closes the last version without emitting one.  ONE
    shuffle on key: partitioning by key up front satisfies both the
    (key, lsn) dedup aggregation and the lead() window (HashPartitioning
    on a key subset), so the dedup does not add its own exchange.
    """
    events = order_change_events(spark, sf_dir, chaos=True)
    parsed = parse_envelope(events, decimal_mode="string")
    rows = (
        parsed.select(
            "key",
            "op",
            "lsn",
            F.col("after.amount").cast("decimal(18,2)").alias("amount"),
            F.col("after.merchant_name").alias("merchant_name"),
        )
        .repartition(spark.sparkContext.defaultParallelism, "key")
        .dropDuplicates(["key", "lsn"])
    )
    from pyspark.sql import Window

    w = Window.partitionBy("key").orderBy("lsn")
    hist = rows.withColumn("valid_to_lsn", F.lead("lsn").over(w))
    return hist.filter(F.col("op") != "d").select(
        F.col("key").alias("transaction_id"),
        F.col("amount").cast("double").alias("amount"),
        "merchant_name",
        F.col("lsn").alias("valid_from_lsn"),
        "valid_to_lsn",
        F.col("valid_to_lsn").isNull().alias("is_current"),
    )


CDC_SCD2_SQL = f"""
WITH base AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS k, o_orderkey AS ki,
         o_totalprice, o_orderpriority
  FROM orders
)
SELECT k AS transaction_id,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS amount,
       o_orderpriority AS merchant_name,
       CAST(ki * 3 AS BIGINT) AS valid_from_lsn,
       CAST(CASE WHEN ki % 10 = 0 THEN ki * 3 + 1
                 WHEN ki % 97 = 0 THEN ki * 3 + 2 END AS BIGINT) AS valid_to_lsn,
       (ki % 10 != 0 AND ki % 97 != 0) AS is_current
FROM base
UNION ALL
SELECT k,
       CAST(CAST(o_totalprice + {_AMOUNT_BUMP} AS DECIMAL(18,2)) AS DOUBLE),
       o_orderpriority,
       CAST(ki * 3 + 1 AS BIGINT),
       CAST(CASE WHEN ki % 97 = 0 THEN ki * 3 + 2 END AS BIGINT),
       ki % 97 != 0
FROM base WHERE ki % 10 = 0
"""


def cdc_scd2_pointintime_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join against the SCD2 history: each key is
    probed at ordinal ``key*3 + 1`` and must see exactly the version valid
    at that moment — "what did this row look like at X", the query SCD2
    exists to answer.  Equi-join on the key plus the interval predicate
    (probe >= valid_from AND (valid_to IS NULL OR probe < valid_to)): the
    shuffle is the key equi-join; the interval check is a residual filter,
    so the join stays hash-based at any scale."""
    hist = cdc_scd2_history(spark, sf_dir)
    probes = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("transaction_id"),
        (F.col("o_orderkey") * 3 + 1).cast("bigint").alias("probe_lsn"),
    )
    j = probes.join(hist, "transaction_id").filter(
        (F.col("probe_lsn") >= F.col("valid_from_lsn"))
        & (F.col("valid_to_lsn").isNull() | (F.col("probe_lsn") < F.col("valid_to_lsn")))
    )
    return j.select("transaction_id", "probe_lsn", "amount", "merchant_name")


CDC_SCD2_PIT_SQL = f"""
SELECT CAST(o_orderkey AS VARCHAR) AS transaction_id,
       CAST(o_orderkey * 3 + 1 AS BIGINT) AS probe_lsn,
       CAST(CAST(CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + {_AMOUNT_BUMP}
                      ELSE o_totalprice END AS DECIMAL(18,2)) AS DOUBLE) AS amount,
       o_orderpriority AS merchant_name
FROM orders
"""


_FORGET_MOD = 50  # users with o_custkey % 50 == 0 file erasure requests


def cdc_forget_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten, CDC-native: erasure requests enter the
    pipeline as SYNTHETIC DELETE envelopes at a super-LSN above any real
    WAL position — one delete per key owned by a requesting user — and
    the unchanged latest-wins apply erases them like any other delete.
    No special-case purge path: the erasure is idempotent under replay,
    ordered after every real change by construction, and the sink's
    tombstone mechanics (compaction grace, change feed 'delete' rows)
    apply unchanged.  The synthetic envelope carries NO payload (null
    before/after images beyond the key) — the request must not itself
    re-materialize the data it erases.  Output: the purged final state;
    oracle = the closed-form final state minus the requesting users'
    rows."""
    o = load_table(spark, sf_dir, "orders")
    requests = o.filter(F.col("o_custkey") % _FORGET_MOD == 0)
    ts_ms = F.unix_timestamp("o_orderdate") * 1000
    erasure = requests.select(
        F.col("o_orderkey").cast("string").alias("key"),
        F.to_json(
            F.struct(
                F.lit(None).cast("string").alias("before"),
                F.lit(None).cast("string").alias("after"),
                F.lit("d").alias("op"),
                (ts_ms + 10).alias("ts_ms"),
                F.struct(
                    (F.col("o_orderkey") * 3 + 10).alias("lsn"),
                    F.lit("transactions").alias("table"),
                    F.lit("financialDB").alias("db"),
                ).alias("source"),
            )
        ).alias("value"),
    )
    events = order_change_events(spark, sf_dir, chaos=True).unionByName(erasure)
    parsed = parse_envelope(events, decimal_mode="string")
    final = apply_changes_batch(parsed)
    return final.select(
        F.col("transaction_id"),
        F.col("user_id"),
        F.col("amount").cast("double").alias("amount"),
        F.col("currency"),
        F.col("merchant_name"),
        F.col("voucher_code"),
    )


CDC_FORGET_SQL = f"""
SELECT CAST(o_orderkey AS VARCHAR) AS transaction_id,
       CAST(o_custkey AS VARCHAR) AS user_id,
       CAST(CAST(CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + {_AMOUNT_BUMP} ELSE o_totalprice END
            AS DECIMAL(18,2)) AS DOUBLE) AS amount,
       o_orderstatus AS currency,
       o_orderpriority AS merchant_name,
       '' AS voucher_code
FROM orders
WHERE o_orderkey % 97 != 0 AND o_custkey % {_FORGET_MOD} != 0
"""


_TXN_GROUP = 8  # orders per upstream transaction group
_TXN_DROP = 13  # update events for keys %13 are "in flight" (never delivered)


def txn_change_events(spark: SparkSession, sf_dir: str):
    """(delivered data events, transaction END metadata) — the two-topic
    layout Debezium produces with ``provide.transaction.metadata``: data
    envelopes carry a ``transaction{id, total_order,
    data_collection_order}`` block, and a metadata topic carries one END
    record per transaction with its expected event count.

    Deterministic construction from orders: every _TXN_GROUP consecutive
    order keys form one upstream transaction (insert per order, update
    for %10 keys, delete for %97 keys).  Update events for %_TXN_DROP
    keys are withheld — their transactions never complete.  A third of
    delivered events are redelivered (at-least-once transport)."""
    o = load_table(spark, sf_dir, "orders")
    txn = F.floor(F.col("o_orderkey") / F.lit(_TXN_GROUP)).cast("string")
    base_lsn = F.col("o_orderkey") * 3
    ts_ms = F.unix_timestamp("o_orderdate") * 1000

    def env(before, after, op, lsn_off, coll_order):
        return F.to_json(
            F.struct(
                before.alias("before"),
                after.alias("after"),
                F.lit(op).alias("op"),
                (ts_ms + lsn_off).alias("ts_ms"),
                F.struct(
                    (base_lsn + lsn_off).alias("lsn"),
                    F.lit("transactions").alias("table"),
                    F.lit("financialDB").alias("db"),
                ).alias("source"),
                F.struct(
                    txn.alias("id"),
                    ((F.col("o_orderkey") % _TXN_GROUP) * 3 + lsn_off).alias("total_order"),
                    F.lit(coll_order).alias("data_collection_order"),
                ).alias("transaction"),
            )
        )

    key = F.col("o_orderkey").cast("string").alias("key")
    null_img = F.when(F.lit(False), _image(F.col("o_totalprice")))
    inserts = o.select(
        key, env(null_img, _image(F.col("o_totalprice")), "c", F.lit(0), 1).alias("value")
    )
    updates = o.filter(
        (F.col("o_orderkey") % 10 == 0) & (F.col("o_orderkey") % _TXN_DROP != 0)
    ).select(
        key,
        env(
            _image(F.col("o_totalprice")),
            _image(F.col("o_totalprice") + _AMOUNT_BUMP),
            "u",
            F.lit(1),
            2,
        ).alias("value"),
    )
    deletes = o.filter(F.col("o_orderkey") % 97 == 0).select(
        key,
        env(
            _image(F.col("o_totalprice") + _AMOUNT_BUMP),
            F.when(F.lit(False), _image(F.col("o_totalprice"))),
            "d",
            F.lit(2),
            3,
        ).alias("value"),
    )
    events = inserts.unionByName(updates).unionByName(deletes)
    redelivered = events.filter(F.pmod(F.xxhash64("key"), F.lit(3)) == 0)
    events = events.unionByName(redelivered).repartition(17)
    # END metadata: expected counts over the INTENDED event set (the
    # upstream knows what it committed, not what the transport delivered)
    meta = (
        o.select(
            txn.alias("txn_id"),
            (
                F.lit(1)
                + (F.col("o_orderkey") % 10 == 0).cast("int")
                + (F.col("o_orderkey") % 97 == 0).cast("int")
            ).alias("n"),
        )
        .groupBy("txn_id")
        .agg(F.sum("n").alias("n_expected"))
    )
    return events, meta


def gate_complete_transactions(parsed: DataFrame, meta: DataFrame) -> DataFrame:
    """Keep only events of COMPLETE transactions: count distinct
    delivered (key, lsn) per txn_id (redelivery-proof) against the END
    metadata's expected count, then one txn-keyed semi-join.  Shared by
    the batch operator and the property tests so the all-or-nothing
    semantics cannot drift from what is verified."""
    arrived = (
        parsed.select("txn_id", "key", "lsn")
        .distinct()
        .groupBy("txn_id")
        .agg(F.count(F.lit(1)).alias("n_arrived"))
    )
    complete = (
        arrived.join(meta, "txn_id")
        .filter(F.col("n_arrived") == F.col("n_expected"))
        .select("txn_id")
    )
    return parsed.join(complete, "txn_id", "left_semi")


def cdc_txn_consistent_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactionally consistent apply — the multi-event atomicity layer
    over latest-wins: an upstream transaction's events are applied ALL or
    NOT AT ALL.  A consumer reading Debezium's transaction metadata topic
    buffers until the END record's event count is met; the batch form is
    a gate: count distinct delivered (key, lsn) per txn_id, keep
    transactions whose count meets the END record, and run the normal
    apply over the gated events.

    Scale shape: the arrived count is a partial-agg count on txn_id, the
    gate is one semi-join keyed on txn_id (txn-cardinality, AQE picks the
    strategy), and everything downstream is the unchanged
    ``apply_changes_batch``.  Incompleteness is real here: update events
    for %_TXN_DROP keys never arrive, so their whole transaction —
    including perfectly delivered inserts — must be absent from the
    output (the oracle's NOT IN clause)."""
    events, meta = txn_change_events(spark, sf_dir)
    # the gate is inherently two passes over the events (count, then
    # filter); materialize the parsed form once so the JSON decode does
    # not run per branch — the same buffered-pending shape the streaming
    # variant persists to parquet
    parsed = parse_envelope(events, decimal_mode="string", capture_txn=True).localCheckpoint(
        eager=True
    )
    final = apply_changes_batch(gate_complete_transactions(parsed, meta))
    return final.select(
        F.col("transaction_id"),
        F.col("user_id"),
        F.col("amount").cast("double").alias("amount"),
        F.col("currency"),
        F.col("merchant_name"),
        F.col("voucher_code"),
    )


CDC_TXN_APPLY_SQL = f"""
WITH t AS (
  SELECT *, CAST(CAST(FLOOR(o_orderkey / {_TXN_GROUP}) AS BIGINT) AS VARCHAR) AS txn FROM orders
), incomplete AS (
  SELECT DISTINCT txn FROM t WHERE o_orderkey % 10 = 0 AND o_orderkey % {_TXN_DROP} = 0
)
SELECT CAST(o_orderkey AS VARCHAR) AS transaction_id,
       CAST(o_custkey AS VARCHAR) AS user_id,
       CAST(CAST(CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + {_AMOUNT_BUMP} ELSE o_totalprice END
            AS DECIMAL(18,2)) AS DOUBLE) AS amount,
       o_orderstatus AS currency,
       o_orderpriority AS merchant_name,
       '' AS voucher_code
FROM t
WHERE txn NOT IN (SELECT txn FROM incomplete) AND o_orderkey % 97 != 0
"""


_FK_PARENT_MISS = 89  # parent inserts withheld (a skipped snapshot chunk)
_FK_CHILD_DEL = 53  # child deletes: first line item of every 53rd order


def multitable_change_events(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two FK-linked envelope feeds (orders -> lineitem), both
    transactions-shaped on the wire with ``source.table`` naming the
    upstream table — the multi-table form of the reference's single
    financialDB.transactions topic (transaction_consumer.py:23-70).

    Parent feed: inserts for every order EXCEPT %_FK_PARENT_MISS == 0
    (those never arrive — the missed-chunk case a referential consumer
    must tolerate), +10 amount updates for %10, deletes for %97.
    Child feed: one event per lineitem ROW, key = l_orderkey*8 +
    l_linenumber (l_linenumber in 1..7), user_id carries the FK.  The
    fixture's lineitem holds DUPLICATE (orderkey, linenumber) pairs —
    those become a real per-key UPDATE CHAIN: versions are LSN-ordered
    by (l_extendedprice, l_returnflag, l_linestatus, l_shipdate) — the
    full set of row-dependent output/timestamp columns, so even a price
    TIE within a pair orders identically on both engines (and a tie on
    all four makes the rows interchangeable for every derived field);
    version count is loud-guarded at <= 8.  The child apply's
    latest-wins does real work, keeping the max-extendedprice version.  The first
    line of every %_FK_CHILD_DEL order is then deleted at a past-any-
    version LSN.  Both feeds get the standard chaos (1/3 redelivery +
    arrival reorder)."""
    o = load_table(spark, sf_dir, "orders")
    base_lsn = F.col("o_orderkey") * 3
    ts_ms = F.unix_timestamp("o_orderdate") * 1000

    def env(before, after, op, lsn_off, table):
        return F.to_json(
            F.struct(
                before.alias("before"),
                after.alias("after"),
                F.lit(op).alias("op"),
                (ts_ms + lsn_off).alias("ts_ms"),
                F.struct(
                    (base_lsn + lsn_off).alias("lsn"),
                    F.lit(table).alias("table"),
                    F.lit("financialDB").alias("db"),
                ).alias("source"),
            )
        )

    key = F.col("o_orderkey").cast("string").alias("key")
    null_img = F.when(F.lit(False), _image(F.col("o_totalprice")))
    arrived = o.filter(F.col("o_orderkey") % _FK_PARENT_MISS != 0)
    p_ins = arrived.select(
        key, env(null_img, _image(F.col("o_totalprice")), "c", F.lit(0), "orders").alias("value")
    )
    p_upd = arrived.filter(F.col("o_orderkey") % 10 == 0).select(
        key,
        env(
            _image(F.col("o_totalprice")),
            _image(F.col("o_totalprice") + _AMOUNT_BUMP),
            "u",
            F.lit(1),
            "orders",
        ).alias("value"),
    )
    p_del = arrived.filter(F.col("o_orderkey") % 97 == 0).select(
        key,
        env(
            _image(F.col("o_totalprice") + _AMOUNT_BUMP),
            F.when(F.lit(False), _image(F.col("o_totalprice"))),
            "d",
            F.lit(2),
            "orders",
        ).alias("value"),
    )
    parent = p_ins.unionByName(p_upd).unionByName(p_del)

    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "_version",
        F.row_number().over(
            Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
                "l_extendedprice", "l_returnflag", "l_linestatus", "l_shipdate"
            )
        ),
    )
    # 8-version headroom per key; anything past it would collide with the
    # delete LSN, so fail loudly instead of silently mis-ordering
    li = li.withColumn(
        "_version",
        F.when(F.col("_version") <= 8, F.col("_version")).otherwise(
            F.assert_true(F.lit(False), F.lit(">8 versions per lineitem key")).cast("int")
        ),
    )
    child_key_num = F.col("l_orderkey") * 8 + F.col("l_linenumber")
    c_lsn = child_key_num * 27 + F.col("_version") * 3
    c_ts = F.unix_timestamp("l_shipdate") * 1000

    def child_image():
        return F.struct(
            child_key_num.cast("string").alias("transaction_id"),
            F.col("l_orderkey").cast("string").alias("user_id"),  # the FK
            F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss").alias("timestamp"),
            F.col("l_extendedprice").cast(AMOUNT_TYPE).cast("string").alias("amount"),
            F.col("l_returnflag").alias("currency"),
            F.lit("city").alias("city"),
            F.lit("country").alias("country"),
            F.col("l_linestatus").alias("merchant_name"),
            F.lit("credit_card").alias("payment_method"),
            F.lit("0.0.0.0").alias("ip_address"),
            F.lit("").alias("voucher_code"),
            F.col("l_orderkey").cast("string").alias("affiliate_id"),
        )

    def cenv(before, after, op, lsn):
        return F.to_json(
            F.struct(
                before.alias("before"),
                after.alias("after"),
                op.alias("op"),
                (c_ts + F.col("_version")).alias("ts_ms"),
                F.struct(
                    lsn.alias("lsn"),
                    F.lit("lineitem").alias("table"),
                    F.lit("financialDB").alias("db"),
                ).alias("source"),
            )
        )

    ckey = child_key_num.cast("string").alias("key")
    c_null = F.when(F.lit(False), child_image())
    c_op = F.when(F.col("_version") == 1, F.lit("c")).otherwise(F.lit("u"))
    c_ins = li.select(ckey, cenv(c_null, child_image(), c_op, c_lsn).alias("value"))
    # one delete per PAIR (version-1 row), at an LSN past any version
    c_del = li.filter(
        (F.col("l_orderkey") % _FK_CHILD_DEL == 0)
        & (F.col("l_linenumber") == 1)
        & (F.col("_version") == 1)
    ).select(
        ckey,
        cenv(child_image(), c_null, F.lit("d"), child_key_num * 27 + 26).alias("value"),
    )
    child = c_ins.unionByName(c_del)

    def chaos(ev):
        redelivered = ev.filter(F.pmod(F.xxhash64("key"), F.lit(3)) == 0)
        return ev.unionByName(redelivered).repartition(17)

    return chaos(parent), chaos(child)


def cdc_multitable_fk_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table referential apply — parent-before-child across
    FK-linked tables.  The reference's sink is single-table
    (transaction_consumer.py:23-70); every real CDC consumer fans one
    connector out to many tables and must not expose a child row whose
    parent is absent (missed snapshot chunk, deleted parent, or
    not-yet-arrived insert).  Batch form: latest-wins apply per table,
    then ONE left-semi gate of the child final state against the parent
    final state keyed on the FK.

    Scale shape: each table's apply is the unchanged one-shuffle
    latest-wins; the gate is a single semi-join on the FK (parent side
    is orders-cardinality — AQE broadcasts it when small, shuffles when
    not).  No per-row Python, no iteration."""
    parent_ev, child_ev = multitable_change_events(spark, sf_dir)
    parent = apply_changes_batch(parse_envelope(parent_ev, decimal_mode="string"))
    child = apply_changes_batch(parse_envelope(child_ev, decimal_mode="string"))
    gated = child.join(
        parent.select(F.col("transaction_id").alias("user_id")), "user_id", "left_semi"
    )
    return gated.select(
        F.col("transaction_id").alias("child_id"),
        F.col("user_id").alias("parent_id"),
        F.col("amount").cast("double").alias("amount"),
        F.col("currency").alias("return_flag"),
        F.col("merchant_name").alias("line_status"),
    )


CDC_MULTITABLE_SQL = f"""
WITH v AS (
  SELECT *, row_number() OVER (
           PARTITION BY l_orderkey, l_linenumber
           ORDER BY l_extendedprice DESC, l_returnflag DESC,
                    l_linestatus DESC, l_shipdate DESC) AS rn
  FROM lineitem
)
SELECT CAST(l_orderkey * 8 + l_linenumber AS VARCHAR) AS child_id,
       CAST(l_orderkey AS VARCHAR) AS parent_id,
       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS amount,
       l_returnflag AS return_flag,
       l_linestatus AS line_status
FROM v
WHERE rn = 1
  AND l_orderkey % {_FK_PARENT_MISS} != 0
  AND l_orderkey % 97 != 0
  AND NOT (l_orderkey % {_FK_CHILD_DEL} = 0 AND l_linenumber = 1)
"""


_OUTBOX_GAP = 41  # the seq-2 event of every 41st aggregate is never captured
_OUTBOX_DUP = 7  # every 7th aggregate's events are redelivered (same event id)

# the Debezium Outbox Event Router table contract: id / aggregatetype /
# aggregateid / type / payload columns on the after-image of an
# insert-only capture (op 'c'); seq is the per-aggregate event sequence
_OUTBOX_SCHEMA = (
    "struct<after:struct<id:string,aggregatetype:string,aggregateid:bigint,"
    "type:string,payload:string,seq:int>,op:string,ts_ms:bigint,"
    "source:struct<lsn:bigint,table:string,db:string>>"
)


def outbox_change_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional-outbox capture feed (deterministic, from orders):
    each order is an AGGREGATE that wrote 1 + o_orderkey%3 domain events
    (OrderCreated, OrderUpdated, OrderCompleted) to an outbox table in
    the same transaction as the business row; Debezium captures the
    outbox INSERTS — the Outbox Event Router contract (id /
    aggregatetype / aggregateid / type / payload), insert-only op 'c',
    routed by aggregatetype (priority orders to their own destination).

    Injected realities: the seq-2 event of every ``_OUTBOX_GAP``-th
    aggregate is never captured (a lost event — its successors must be
    HELD, not published out of order), and every ``_OUTBOX_DUP``-th
    aggregate's events are redelivered at a later LSN (at-least-once:
    same event id, must collapse).  The payload is the canonical string
    ``aggregateid:type:amount_cents`` so its fingerprint replays in the
    oracle straight from orders."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    ev = o.select(
        "*",
        F.explode(F.sequence(F.lit(1), (F.lit(1) + F.col("o_orderkey") % 3).cast("int"))).alias(
            "seq"
        ),
    ).filter(~((F.col("seq") == 2) & (F.col("o_orderkey") % _OUTBOX_GAP == 0)))
    etype = (
        F.when(F.col("seq") == 1, "OrderCreated")
        .when(F.col("seq") == 2, "OrderUpdated")
        .otherwise("OrderCompleted")
    )
    cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("bigint")
    payload = F.concat_ws(
        ":", F.col("o_orderkey").cast("string"), etype, cents.cast("string")
    )

    def env(lsn_off):
        return F.to_json(
            F.struct(
                F.struct(
                    F.concat_ws(
                        "-", F.col("o_orderkey").cast("string"), F.col("seq").cast("string")
                    ).alias("id"),
                    F.when(F.col("o_orderpriority").startswith("1"), "priority-order")
                    .otherwise("standard-order")
                    .alias("aggregatetype"),
                    F.col("o_orderkey").cast("bigint").alias("aggregateid"),
                    etype.alias("type"),
                    payload.alias("payload"),
                    F.col("seq").alias("seq"),
                ).alias("after"),
                F.lit("c").alias("op"),
                (F.col("o_orderkey") * 8 + F.col("seq")).alias("ts_ms"),
                F.struct(
                    (F.col("o_orderkey") * 8 + F.col("seq") + lsn_off).alias("lsn"),
                    F.lit("outbox").alias("table"),
                    F.lit("financialDB").alias("db"),
                ).alias("source"),
            )
        )

    key = F.concat_ws("-", F.col("o_orderkey").cast("string"), F.col("seq").cast("string"))
    firsts = ev.select(key.alias("key"), env(F.lit(0)).alias("value"))
    redelivered = ev.filter(F.col("o_orderkey") % _OUTBOX_DUP == 0).select(
        key.alias("key"), env(F.lit(4)).alias("value")
    )
    return firsts.unionByName(redelivered)


def outbox_rows(ev: DataFrame) -> DataFrame:
    """Parse outbox envelopes to flat rows (insert-only guard applied:
    an outbox topic carries only op 'c'; anything else is upstream
    corruption and is excluded here, counted by the dead-letter path in
    a production wiring)."""
    p = ev.select(F.from_json("value", _OUTBOX_SCHEMA).alias("e")).filter(
        F.col("e.op") == "c"
    )
    return p.select(
        F.col("e.after.id").alias("event_id"),
        F.col("e.after.aggregatetype").alias("dest"),
        F.col("e.after.aggregateid").alias("aggregate_id"),
        F.col("e.after.seq").alias("event_seq"),
        F.col("e.after.type").alias("event_type"),
        F.col("e.after.payload").alias("payload"),
        F.col("e.source.lsn").alias("lsn"),
    )


def outbox_gate(rows: DataFrame) -> DataFrame:
    """Exactly-once, per-aggregate-in-order publish gate: collapse
    redeliveries to the first-seen LSN per event id (one shuffle on the
    id), then release only each aggregate's CONTIGUOUS event prefix —
    for strictly increasing deduped seqs, ``seq == row_number`` over the
    (aggregate, seq)-ordered window characterizes the prefix exactly
    (s_i >= i always, and s_i == i forces s_j == j for all j < i), so a
    lost event holds all its successors without any explicit frontier
    state.  The window is PARTITIONED BY aggregate — per-aggregate event
    counts are bounded (an aggregate's lifecycle), so no skew class at
    any corpus scale."""
    from pyspark.sql import Window

    cols = [c for c in rows.columns if c != "event_id"]
    first = (
        rows.groupBy("event_id")
        .agg(F.min_by(F.struct(*cols), "lsn").alias("r"))
        .select("event_id", "r.*")
    )
    w = Window.partitionBy("aggregate_id").orderBy("event_seq")
    return first.withColumn("rn", F.row_number().over(w)).filter(
        F.col("event_seq") == F.col("rn")
    )


def cdc_outbox_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional-outbox publish — the canonical application pattern
    of the reference's pipeline (the README's app -> PostgreSQL ->
    Debezium -> Kafka flow, `README.md:40-53`, applied to domain events
    instead of table rows): capture outbox INSERTS, dedup at-least-once
    redelivery by event id, and publish each aggregate's events
    IN ORDER, holding everything behind a lost event.  Emits the routed
    stream: destination (from aggregatetype), aggregate, sequence, type,
    and a payload fingerprint.

    Scale shape: one shuffle on event_id (dedup), one on aggregate_id
    (the per-aggregate window — bounded group size); no global window,
    no join.  Oracle: the closed form over orders — published iff
    seq == 1 OR the aggregate is not gapped."""
    rows = outbox_rows(outbox_change_events(spark, sf_dir))
    return outbox_gate(rows).select(
        "dest",
        F.col("aggregate_id").cast("bigint").alias("aggregate_id"),
        F.col("event_seq").cast("int").alias("event_seq"),
        "event_type",
        F.substring(F.md5("payload"), 1, 16).alias("payload_fp"),
    )


CDC_OUTBOX_SQL = f"""
SELECT CASE WHEN o_orderpriority LIKE '1%' THEN 'priority-order'
            ELSE 'standard-order' END AS dest,
       CAST(o_orderkey AS BIGINT) AS aggregate_id,
       CAST(s.seq AS INTEGER) AS event_seq,
       CASE s.seq WHEN 1 THEN 'OrderCreated' WHEN 2 THEN 'OrderUpdated'
            ELSE 'OrderCompleted' END AS event_type,
       SUBSTR(MD5(CAST(o_orderkey AS VARCHAR) || ':' ||
                  CASE s.seq WHEN 1 THEN 'OrderCreated' WHEN 2 THEN 'OrderUpdated'
                       ELSE 'OrderCompleted' END || ':' ||
                  CAST(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS VARCHAR)),
              1, 16) AS payload_fp
FROM orders, (SELECT UNNEST([1, 2, 3]) AS seq) s
WHERE s.seq <= 1 + o_orderkey % 3
  AND (s.seq = 1 OR o_orderkey % {_OUTBOX_GAP} != 0)
"""


def cdc_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference consumer's PK GET (``transaction_consumer.py:85-102``)
    over the bucketed sink: merge the full chaos event stream, then probe
    a fixed 32-key set through :meth:`BucketedParquetSink.lookup` — the
    serving path that prunes to the probe keys' buckets at the PATH level
    instead of scanning the table (<= min(k, n_buckets) buckets read;
    plan-pinned in ``tests/test_sink_scale.py``).

    Probe set: the 32 smallest orderkeys divisible by 499 — a spread that
    mixes updated (%10), deleted (%97, must NOT come back), and untouched
    keys.  Oracle = the closed-form final state restricted to that set.
    """
    from realtime_change_data_capture_streaming_spark.session import scratch_dir

    from realtime_change_data_capture_streaming_spark.cdc.apply_changes import (
        BucketedParquetSink,
    )

    events = order_change_events(spark, sf_dir, chaos=True)
    sink = BucketedParquetSink(
        spark, scratch_dir(prefix="cdc_lookup_") + "/t", n_buckets=32
    )
    sink.merge(parse_envelope(events, decimal_mode="string"))
    o = load_table(spark, sf_dir, "orders")
    # order on the INT column BEFORE the string cast: orderBy after the
    # cast would sort lexicographically ('100299' < '499') and probe a
    # different 32-key set than the oracle's numeric ORDER BY at any SF
    # with >32 qualifying keys (sf0.1 has 301)
    probe = [
        r[0]
        for r in o.filter(F.col("o_orderkey") % 499 == 0)
        .orderBy(F.col("o_orderkey"))
        .limit(32)
        .select(F.col("o_orderkey").cast("string"))
        .collect()
    ]
    found = sink.lookup(probe)
    return found.select(
        F.col("transaction_id"),
        F.col("user_id"),
        F.col("amount").cast("double").alias("amount"),
        F.col("currency"),
    )


CDC_POINT_LOOKUP_SQL = f"""
WITH probe AS (
  SELECT o_orderkey FROM orders WHERE o_orderkey % 499 = 0
  ORDER BY o_orderkey LIMIT 32
)
SELECT CAST(o_orderkey AS VARCHAR) AS transaction_id,
       CAST(o_custkey AS VARCHAR) AS user_id,
       CAST(CAST(CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + {_AMOUNT_BUMP}
                      ELSE o_totalprice END AS DECIMAL(18,2)) AS DOUBLE) AS amount,
       o_orderstatus AS currency
FROM orders
WHERE o_orderkey IN (SELECT o_orderkey FROM probe) AND o_orderkey % 97 != 0
"""


QUERIES = {
    "cdc_apply_changes": cdc_apply_changes,
    "cdc_scd2_history": cdc_scd2_history,
    "cdc_scd2_pointintime_join": cdc_scd2_pointintime_join,
    "cdc_dead_letter": cdc_dead_letter,
    "cdc_decimal_modes_roundtrip": cdc_decimal_modes_roundtrip,
    "cdc_parse_envelope_stats": cdc_parse_envelope_stats,
    "cdc_change_diff_rows": cdc_change_diff_rows,
    "cdc_audit_stamp": cdc_audit_stamp,
    "cdc_schema_evolution": cdc_schema_evolution,
    "cdc_snapshot_then_stream": cdc_snapshot_then_stream,
    "cdc_change_feed": cdc_change_feed,
    "cdc_time_travel_summary": cdc_time_travel_summary,
    "cdc_lsn_gap_audit": cdc_lsn_gap_audit,
    "cdc_toast_column_fill": cdc_toast_column_fill,
    "cdc_incremental_snapshot": cdc_incremental_snapshot,
    "cdc_reconcile_checksums": cdc_reconcile_checksums,
    "cdc_txn_consistent_apply": cdc_txn_consistent_apply,
    "cdc_multitable_fk_apply": cdc_multitable_fk_apply,
    "cdc_outbox_publish": cdc_outbox_publish,
    "cdc_forget_users": cdc_forget_users,
    "cdc_point_lookup": cdc_point_lookup,
}

ORACLE = {
    "cdc_point_lookup": CDC_POINT_LOOKUP_SQL,
    "cdc_change_feed": CDC_CHANGE_FEED_SQL,
    "cdc_time_travel_summary": CDC_TIME_TRAVEL_SQL,
    "cdc_lsn_gap_audit": CDC_LSN_GAP_SQL,
    "cdc_toast_column_fill": CDC_TOAST_SQL,
    "cdc_incremental_snapshot": CDC_ISNAP_SQL,
    "cdc_reconcile_checksums": CDC_RECONCILE_SQL,
    "cdc_scd2_history": CDC_SCD2_SQL,
    "cdc_scd2_pointintime_join": CDC_SCD2_PIT_SQL,
    "cdc_apply_changes": CDC_APPLY_SQL,
    "cdc_dead_letter": CDC_DEAD_LETTER_SQL,
    "cdc_decimal_modes_roundtrip": CDC_DECIMAL_MODES_SQL,
    "cdc_parse_envelope_stats": CDC_PARSE_SQL,
    "cdc_change_diff_rows": CDC_DIFF_SQL,
    "cdc_audit_stamp": CDC_AUDIT_SQL,
    "cdc_schema_evolution": CDC_EVOLUTION_SQL,
    "cdc_snapshot_then_stream": CDC_SNAPSHOT_SQL,
    "cdc_txn_consistent_apply": CDC_TXN_APPLY_SQL,
    "cdc_multitable_fk_apply": CDC_MULTITABLE_SQL,
    "cdc_outbox_publish": CDC_OUTBOX_SQL,
    "cdc_forget_users": CDC_FORGET_SQL,
}
