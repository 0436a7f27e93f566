"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real pipelines carry image/audio/video as ``binary`` columns with a typed
metadata struct alongside; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row objects.

The actual media codecs (PIL/ffmpeg/etc.) are NOT in this environment, so
``decode_image_batch`` is stubbed behind ``NotImplementedError`` with a
deterministic fake used for tests — the Spark-side plumbing (schema,
batch iteration, partition-size control) is real and tested.

At 100 TB: binary payloads dominate row size — ``maxPartitionBytes``
should be sized so an Arrow batch of payloads fits executor memory, and
metadata-only queries must prune the binary column (columnar parquet makes
that free; never ``select("*")`` here).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from realtime_change_data_capture_streaming_spark.operators._util import spread
from realtime_change_data_capture_streaming_spark.sources.tables import load_table

#: metadata carried alongside every binary payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),  # image|audio|video|text
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("magic", T.StringType(), True),  # first-bytes signature, hex
    ]
)

MEDIA_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)


def to_media_table(documents: DataFrame) -> DataFrame:
    """documents -> media table: utf-8 payload bytes + metadata struct.
    Stands in for reading real media blobs; the schema/partitioning is the
    production shape."""
    payload = F.encode(F.col("text"), "utf-8")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text").alias("media_type"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.upper(F.substring(F.hex(payload), 1, 8)).alias("magic"),
        ).alias("meta"),
    )


def decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """STUB: real image decode (PIL.Image.open etc.) is unavailable here.

    Raises NotImplementedError when real decoding is requested; tests use
    ``fake=True`` paths below.  The signature (pandas in/out, one row per
    payload) is the production contract for mapInPandas workers.
    """
    raise NotImplementedError(
        "image decode requires PIL/libvips, not present in this environment; "
        "use extract_features(..., fake=True) for the deterministic stand-in"
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("checksum", T.LongType(), True),
    ]
)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``fake=True`` computes deterministic pseudo-features (byte length,
    synthetic width/height from the byte stream, additive checksum) so the
    full mapInPandas path — batch schema, null payloads, empty partitions —
    is exercised without media libs.  ``fake=False`` calls the real
    decoder stub (raises until codecs exist).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if not fake:
                decode_image_batch(pdf["payload"])  # raises NotImplementedError
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            checksum = payloads.map(lambda b: int(sum(b) % (1 << 31)) if b is not None else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "width": (n_bytes % 1920).astype("int32"),
                    "height": (checksum % 1080).astype("int32"),
                    "checksum": checksum.astype("int64"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, schema=_FEATURE_SCHEMA)


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked: binary payload construction + metadata extraction
    (byte lengths via the real binary column, no Python)."""
    media = to_media_table(spread(load_table(spark, sf_dir, "documents")))
    return media.select(
        "doc_id",
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.magic").alias("magic"),
    )


MULTIMODAL_META_SQL = """
SELECT doc_id,
       'text' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       UPPER(SUBSTRING(hex(encode(text)), 1, 8)) AS magic
FROM documents
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full mapInPandas feature-extraction path (fake decode).
    ``checksum``/``height`` derive from the Python byte-sum — rows-only;
    the byte-arithmetic half is oracle-checked by
    ``multimodal_features_meta`` below."""
    media = to_media_table(spread(load_table(spark, sf_dir, "documents")))
    return extract_features(media, fake=True)


def multimodal_features_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic half of the feature row, THROUGH the same
    mapInPandas worker: ``n_bytes`` and ``width = n_bytes % 1920`` are
    pure byte arithmetic DuckDB reproduces with octet_length — so the
    Arrow batch path itself (not just its schema) gets a hash-checked
    oracle row."""
    media = to_media_table(spread(load_table(spark, sf_dir, "documents")))
    return extract_features(media, fake=True).select("doc_id", "n_bytes", "width")


MULTIMODAL_FEATURES_META_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) % 1920 AS INTEGER) AS width
FROM documents
"""


QUERIES = {
    "multimodal_metadata": multimodal_metadata,
    "multimodal_features": multimodal_features,
    "multimodal_features_meta": multimodal_features_meta,
}

ORACLE = {
    "multimodal_metadata": MULTIMODAL_META_SQL,
    "multimodal_features_meta": MULTIMODAL_FEATURES_META_SQL,
    # multimodal_features: checksum/height are python byte-sums -> rows-only
}
