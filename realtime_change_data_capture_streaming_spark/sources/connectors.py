"""External-system connectors: Kafka change streams, JDBC scans/writes.

Maps the reference's I/O surface 1:1 (SURVEY.md section 2.1-2.2):

- S2/K1  Kafka consume/produce (``transaction_producer.py:41-54``,
  ``transaction_consumer.py:72-81``) -> Structured Streaming Kafka source
  and sink.  ``startingOffsets=earliest`` reproduces
  ``auto.offset.reset: earliest`` (``transaction_consumer.py:10``);
  the key/value contract (key = transaction_id string, value = JSON)
  reproduces ``transaction_producer.py:44-48``.
- S1  Postgres scan with LIMIT (``transaction_producer.py:33-39``) ->
  JDBC relation; Catalyst pushes LIMIT/filters into the generated query.
- K4  JDBC write (``main.py:49-91``).

This environment has no Kafka broker / Postgres, so these functions build
the fully-configured readers/writers (exercised by tests up to
``.load()``/``.start()``); the pipelines behind them are covered by the
file-stream CDC tests, which exercise identical downstream plans.

Scale notes: one Kafka partition maps to one Spark task — size topic
partitions for target parallelism; ``maxOffsetsPerTrigger`` bounds
micro-batch size (the principled version of the reference's
``sleep(0.5)`` pacing, ``transaction_producer.py:51``).  JDBC reads
parallelize via partitionColumn/bounds — a single-connection read is a
driver bottleneck at any real scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_change_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "transactions",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
):
    """S2: subscribe to the change topic; returns a streaming reader whose
    ``.load()`` yields key/value binary columns (feed to cdc.parse_envelope)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader


def to_kafka_records(df: DataFrame, key_col: str = "transaction_id") -> DataFrame:
    """T1+T3: key-by + JSON-serialize the full row, the exact wire shape of
    ``transaction_producer.py:44-48`` (stringly decimals/timestamps included,
    matching ``json.dumps(tx, default=str)``)."""
    payload_cols = [c for c in df.columns]
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*payload_cols)).alias("value"),
    )


def kafka_sink_batch(df: DataFrame, bootstrap_servers: str, topic: str):
    """K1 batch form: returns a configured writer; ``.save()`` publishes."""
    return (
        to_kafka_records(df)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
    )


def kafka_sink_stream(df: DataFrame, bootstrap_servers: str, topic: str, checkpoint_dir: str):
    """K1 streaming form: exactly-once-per-checkpoint Kafka publish."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )


def jdbc_scan(
    spark: SparkSession,
    url: str,
    table: str,
    limit: int | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
):
    """S1: JDBC table scan.  With ``partition_column`` + bounds the read
    fans out over ``num_partitions`` parallel connections (required at
    scale; the reference's single cursor is the local[1] analog).
    LIMIT is applied via ``.limit`` so Catalyst pushes it into the
    generated SQL where the dialect supports it."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1_000_000))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load()
    return df.limit(limit) if limit else df


def jdbc_write(df: DataFrame, url: str, table: str, mode: str = "append", **options: str):
    """K4: JDBC write (returns configured writer; ``.save()`` executes)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    return writer
