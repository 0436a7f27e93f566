"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real pipelines carry image/audio/video as ``binary`` columns with a typed
metadata struct alongside; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row objects.

Compressed-media codecs (PIL/ffmpeg/etc.) are NOT in this environment;
``decode_image_batch`` really decodes the dependency-free PPM (P6) raster
format (``decode_ppm``, pure struct parsing) and raises
``NotImplementedError`` only for formats whose codecs are absent.  The
Spark-side plumbing (schema, Arrow batch iteration, partition-size
control) is identical for any codec.

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


def decode_ppm(buf: bytes) -> tuple[int, int, int, bytes]:
    """Decode a binary PPM (P6) image: (width, height, maxval, rgb_bytes).

    Dependency-free struct parsing of the netpbm format: ``P6`` magic,
    whitespace-separated width/height/maxval with ``#`` comments allowed,
    one whitespace byte, then ``width*height*3`` raw RGB samples.  Raises
    ``ValueError`` on malformed input (truncated pixel data, bad header) so
    corrupt payloads surface as errors, never as wrong features.
    """
    if buf[:2] != b"P6":
        raise ValueError(f"not a P6 PPM (magic {buf[:2]!r})")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if pos < len(buf) and buf[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(buf) and buf[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
            continue
        start = pos
        while pos < len(buf) and buf[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed PPM header")
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if not (0 < maxval < 65536):
        raise ValueError(f"PPM maxval {maxval} out of range")
    n = width * height * 3 * (2 if maxval > 255 else 1)
    rgb = buf[pos : pos + n]
    if len(rgb) != n:
        raise ValueError(f"truncated PPM: want {n} pixel bytes, have {len(rgb)}")
    return width, height, maxval, rgb


def decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """Real image decode for the formats decodable without media libs.

    PPM (P6) payloads are decoded by the pure-Python parser above into
    (width, height, n_pixel_bytes, checksum, mean_val); null payloads yield
    null features.  ``n_pixel_bytes`` is the raw byte count of the pixel
    plane (2 bytes per sample when maxval > 255); ``mean_val`` and
    ``checksum`` are over decoded SAMPLES, so for 16-bit images the
    big-endian byte pairs are folded first — mean_val is a pixel-sample
    mean at every maxval the parser accepts.  PNG (8-bit RGB/RGBA/gray,
    non-interlaced) decodes via the chunk-walk + stdlib-zlib decoder below;
    remaining compressed formats (JPEG/WebP/...) raise
    ``NotImplementedError`` — their codecs are not in this environment.  The signature (pandas in, one output row per
    payload) is the production contract for mapInPandas workers.
    """
    rows = []
    for b in payloads:
        if b is None:
            rows.append((None, None, None, None, None))
            continue
        b = bytes(b)
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            w, h, rgb = decode_png(b)
            maxval = 255
        elif b[:6] in (b"GIF87a", b"GIF89a"):
            w, h, rgb = decode_gif(b)
            maxval = 255
        elif b[:2] == b"BM":
            w, h, rgb = decode_bmp(b)
            maxval = 255
        elif b[:2] == b"P6":
            w, h, maxval, rgb = decode_ppm(b)
        else:
            raise NotImplementedError(
                f"image decode for magic {b[:4]!r} requires PIL/libvips, not "
                "present in this environment; PPM (P6), PNG, GIF and BMP decode natively"
            )
        if maxval > 255:
            import struct

            samples = struct.unpack(f">{len(rgb) // 2}H", rgb)
        else:
            samples = rgb
        mean_val = float(sum(samples)) / len(samples) if samples else None
        checksum = int(sum(samples) % (1 << 31)) if samples else None
        rows.append((w, h, len(rgb), checksum, mean_val))
    return pd.DataFrame(
        rows, columns=["width", "height", "n_pixel_bytes", "checksum", "mean_val"]
    ).astype(
        {
            "width": "Int32",
            "height": "Int32",
            "n_pixel_bytes": "Int64",
            "checksum": "Int64",
            "mean_val": "float64",
        }
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
    is exercised without media libs.  ``fake=False`` decodes for real:
    PPM (P6) payloads produce true width/height/checksum via
    ``decode_image_batch``; compressed formats raise
    ``NotImplementedError`` (codecs absent from this environment) — real
    mode NEVER silently substitutes fabricated features.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if not fake:
                feats = decode_image_batch(pdf["payload"])  # raises on non-PPM
                n_bytes = (
                    pdf["payload"]
                    .map(lambda b: len(b) if b is not None else None)
                    .astype("Int64")
                    .reset_index(drop=True)
                )
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"].reset_index(drop=True),
                        "n_bytes": n_bytes,
                        "width": feats["width"],
                        "height": feats["height"],
                        "checksum": feats["checksum"],
                    }
                )
                continue
            payloads = pdf["payload"]
            # null payload -> null features (nullable Int64/Int32), matching
            # SQL NULL propagation (octet_length(NULL) IS NULL) — mapping
            # None to 0 would hash-diverge from the oracle on null rows.
            n_bytes = payloads.map(lambda b: len(b) if b is not None else None).astype("Int64")
            checksum = payloads.map(
                lambda b: int(sum(b) % (1 << 31)) if b is not None else None
            ).astype("Int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "width": (n_bytes % 1920).astype("Int32"),
                    "height": (checksum % 1080).astype("Int32"),
                    "checksum": checksum,
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


def to_ppm_media_table(documents: DataFrame) -> DataFrame:
    """Deterministic PPM (P6) payload per document, built entirely from
    codegen expressions: width/height/fill byte derive from ``doc_id``, the
    header is a formatted string, and the pixel plane is a repeated
    printable byte — so an independent engine can compute the expected
    decode results analytically while our side round-trips REAL image
    bytes through the real parser.  Null text -> null payload (exercises
    the null path end-to-end)."""
    w = F.lit(1) + (F.col("doc_id") % 8).cast("int")
    h = F.lit(1) + (F.col("doc_id") % 6).cast("int")
    fill = F.lit(32) + (F.col("doc_id") % 95).cast("int")  # printable ASCII
    header = F.concat(
        F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"), F.lit("\n255\n")
    )
    pixels = F.repeat(F.char(fill), w * h * F.lit(3))
    payload = F.when(
        F.col("text").isNotNull(), F.encode(F.concat(header, pixels), "utf-8")
    )
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.upper(F.substring(F.hex(payload), 1, 8)).alias("magic"),
        ).alias("meta"),
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode through the production mapInPandas path: build PPM
    payloads (`to_ppm_media_table`), parse the actual bytes with the pure-
    Python P6 decoder, emit per-image features.  Every output is
    deterministic, so the whole path — payload construction, Arrow batch
    transfer, header parsing, pixel-plane length/checksum — is
    oracle-checked (the oracle recomputes the expected features
    analytically from doc_id)."""
    media = to_ppm_media_table(spread(load_table(spark, sf_dir, "documents")))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = decode_image_batch(pdf["payload"])
            feats.insert(0, "doc_id", pdf["doc_id"].reset_index(drop=True))
            yield feats

    schema = (
        "doc_id long, width int, height int, n_pixel_bytes long, "
        "checksum long, mean_val double"
    )
    return media.select("doc_id", "payload").mapInPandas(run, schema=schema)


MULTIMODAL_FEATURES_SQL = """
SELECT doc_id,
       CASE WHEN text IS NOT NULL THEN CAST(1 + doc_id % 8 AS INTEGER) END AS width,
       CASE WHEN text IS NOT NULL THEN CAST(1 + doc_id % 6 AS INTEGER) END AS height,
       CASE WHEN text IS NOT NULL
            THEN CAST((1 + doc_id % 8) * (1 + doc_id % 6) * 3 AS BIGINT) END AS n_pixel_bytes,
       CASE WHEN text IS NOT NULL
            THEN CAST((32 + doc_id % 95) * (1 + doc_id % 8) * (1 + doc_id % 6) * 3 AS BIGINT)
       END AS checksum,
       CASE WHEN text IS NOT NULL THEN CAST(32 + doc_id % 95 AS DOUBLE) END AS mean_val
FROM documents
"""


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


def resize_nearest(
    w: int, h: int, rgb: bytes, out_w: int, out_h: int
) -> bytes:
    """Nearest-neighbor resize of a raw 8-bit RGB plane — pure bytes, no
    media libs.  Source pixel for output (x, y) is (x*w//out_w, y*h//out_h),
    the standard NN mapping."""
    out = bytearray(out_w * out_h * 3)
    for y in range(out_h):
        sy = y * h // out_h
        row = sy * w * 3
        for x in range(out_w):
            sx = x * w // out_w
            s = row + sx * 3
            d = (y * out_w + x) * 3
            out[d : d + 3] = rgb[s : s + 3]
    return bytes(out)


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize through the mapInPandas path: decode the PPM
    payload, nearest-neighbor-resize the raster to 2x2, and emit features
    of the RESIZED pixels.  The fixture rasters are constant-fill, so the
    resized checksum is analytically ``fill * 12`` — the oracle checks the
    whole decode->resize->feature chain, not just the plumbing.  (A consty
    image makes the oracle exact without shipping an image lib; the resize
    kernel itself is the production NN mapping over arbitrary rasters and
    is property-tested on non-constant rasters in tests/test_multimodal.py.)"""
    media = to_ppm_media_table(spread(load_table(spark, sf_dir, "documents")))
    out_w, out_h = 2, 2

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                if b is None:
                    rows.append((doc_id, None, None, None))
                    continue
                w, h, _maxval, rgb = decode_ppm(bytes(b))
                small = resize_nearest(w, h, rgb, out_w, out_h)
                rows.append(
                    (doc_id, out_w, out_h, int(sum(small) % (1 << 31)))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "checksum"]
            ).astype({"width": "Int32", "height": "Int32", "checksum": "Int64"})

    return media.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, width int, height int, checksum long"
    )


MULTIMODAL_RESIZE_SQL = """
SELECT doc_id,
       CASE WHEN text IS NOT NULL THEN 2 END AS width,
       CASE WHEN text IS NOT NULL THEN 2 END AS height,
       CASE WHEN text IS NOT NULL
            THEN CAST((32 + doc_id % 95) * 12 AS BIGINT) END AS checksum
FROM documents
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-shaped payloads: N concatenated PPM frames per doc, sampled
    every 2nd frame through mapInPandas — the frame-sampling plumbing of a
    video pipeline with a REAL per-frame parser (frame boundaries come
    from each header's declared pixel-plane length, exactly how a
    container demuxer walks a stream).  n_frames = 1 + doc_id % 4;
    features of the sampled frames are analytic for the oracle."""
    d = spread(load_table(spark, sf_dir, "documents"))
    n_frames = F.lit(1) + (F.col("doc_id") % 4).cast("int")
    w = F.lit(1) + (F.col("doc_id") % 8).cast("int")
    h = F.lit(1) + (F.col("doc_id") % 6).cast("int")
    fill = F.lit(32) + (F.col("doc_id") % 95).cast("int")
    header = F.concat(
        F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"), F.lit("\n255\n")
    )
    frame = F.concat(header, F.repeat(F.char(fill), w * h * F.lit(3)))
    payload = F.when(
        F.col("text").isNotNull(),
        F.encode(F.repeat(frame, n_frames), "utf-8"),
    )
    media = d.select("doc_id", payload.alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                if b is None:
                    rows.append((doc_id, None, None, None))
                    continue
                buf = bytes(b)
                frames = []
                pos = 0
                while pos < len(buf):
                    w_, h_, _mv, rgb = decode_ppm(buf[pos:])
                    # frame length = header bytes + pixel bytes of THIS frame
                    hdr_len = buf.index(b"\n255\n", pos) + 5 - pos
                    frames.append(rgb)
                    pos += hdr_len + len(rgb)
                sampled = frames[::2]  # every 2nd frame
                checksum = int(sum(sum(f) for f in sampled) % (1 << 31))
                rows.append((doc_id, len(frames), len(sampled), checksum))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_frames", "n_sampled", "checksum"]
            ).astype({"n_frames": "Int32", "n_sampled": "Int32", "checksum": "Int64"})

    return media.mapInPandas(
        run, schema="doc_id long, n_frames int, n_sampled int, checksum long"
    )


MULTIMODAL_FRAMES_SQL = """
SELECT doc_id,
       CASE WHEN text IS NOT NULL THEN CAST(1 + doc_id % 4 AS INTEGER) END AS n_frames,
       CASE WHEN text IS NOT NULL
            THEN CAST((1 + doc_id % 4 + 1) // 2 AS INTEGER) END AS n_sampled,
       CASE WHEN text IS NOT NULL
            THEN CAST(((1 + doc_id % 4 + 1) // 2)
                 * (32 + doc_id % 95) * (1 + doc_id % 8) * (1 + doc_id % 6) * 3
                 AS BIGINT) END AS checksum
FROM documents
"""


def decode_wav(buf: bytes) -> tuple[int, int, int, bytes]:
    """Decode a RIFF/WAVE PCM payload: (sample_rate, n_channels,
    bits_per_sample, sample_bytes).  Dependency-free struct parsing of the
    canonical container: RIFF header, fmt chunk (PCM only), chunk walk to
    the data chunk.  Raises ValueError on malformed input — corrupt audio
    surfaces as an error, never as wrong features (same contract as
    ``decode_ppm``)."""
    import struct

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE payload (magic {buf[:4]!r})")
    pos, rate, n_ch, bits = 12, None, None, None
    while pos + 8 <= len(buf):
        cid, clen = buf[pos : pos + 4], struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        body = buf[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt != 1:
                raise ValueError(f"only PCM (fmt=1) decodes natively, got fmt={fmt}")
        elif cid == b"data":
            if len(body) != clen:
                raise ValueError(f"truncated data chunk: want {clen}, have {len(body)}")
            if rate is None:
                raise ValueError("data chunk before fmt chunk")
            return rate, n_ch, bits, body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    raise ValueError("no data chunk")


def _synth_wav(doc_id: int) -> bytes:
    """Deterministic mono 8-bit PCM WAV for doc_id — the fixture stand-in
    for real audio blobs.  Sample i = (doc_id*31 + i*7) % 256 (unsigned
    8-bit PCM), n_samples = 100 + doc_id % 50, rate 8000 Hz."""
    import struct

    n = 100 + doc_id % 50
    data = bytes((doc_id * 31 + i * 7) % 256 for i in range(n))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) % 2 else b"")
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode through mapInPandas: RIFF/WAV PCM payloads parsed
    by the dependency-free container walker, per-doc features emitted
    (sample rate, sample count, exact amplitude sum, duration).  The
    payload synthesis is seed-free integer arithmetic, so every feature is
    analytic for the oracle — the audio analog of ``multimodal_features``."""
    media = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    rows.append((doc_id, None, None, None, None))
                    continue
                rate, n_ch, bits, data = decode_wav(_synth_wav(int(doc_id)))
                assert n_ch == 1 and bits == 8
                rows.append(
                    (
                        doc_id,
                        rate,
                        len(data),
                        int(sum(data)),
                        len(data) * 1000 // rate,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "n_samples", "sum_amplitude", "duration_ms"],
            ).astype(
                {
                    "sample_rate": "Int32",
                    "n_samples": "Int64",
                    "sum_amplitude": "Int64",
                    "duration_ms": "Int64",
                }
            )

    return media.mapInPandas(
        run,
        schema="doc_id long, sample_rate int, n_samples long, "
        "sum_amplitude long, duration_ms long",
    )


# sum over i<n of (a + 7i) % 256: split i by residue class of (a+7i) mod 256
# is closed-form but fiddly; instead the oracle enumerates sample indexes
# with a lateral range — still engine-exact integer arithmetic.
MULTIMODAL_AUDIO_SQL = """
WITH samples AS (
  SELECT d.doc_id, (d.doc_id * 31 + i * 7) % 256 AS amp
  FROM documents d, UNNEST(range(0, 100 + d.doc_id % 50)) AS t(i)
  WHERE d.text IS NOT NULL
), agg AS (
  SELECT doc_id, COUNT(*) AS n, CAST(SUM(amp) AS BIGINT) AS s
  FROM samples GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN d.text IS NOT NULL THEN 8000 END AS sample_rate,
       CAST(a.n AS BIGINT) AS n_samples,
       a.s AS sum_amplitude,
       CAST(a.n * 1000 // 8000 AS BIGINT) AS duration_ms
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
"""


# ------------------------------------------------------------------ PNG

# PNG is decodable WITHOUT media libraries: the container is chunked
# (length/type/data/CRC32), the pixel stream is zlib (Python stdlib), and
# reconstruction is the five scanline filters of the spec.  This closes
# the "compressed codecs raise" gap for the one compressed format whose
# codec ships with CPython.


def encode_png(w: int, h: int, rgb: bytes) -> bytes:
    """Minimal 8-bit RGB PNG encoder: one IDAT, per-row filter chosen as
    row % 5 so a decode round-trip exercises EVERY filter type
    (None/Sub/Up/Average/Paeth), CRC32 via zlib."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    def paeth(a: int, b: int, c: int) -> int:
        pp = a + b - c
        pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    stride = w * 3
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = rgb[y * stride : (y + 1) * stride]
        f = y % 5
        raw.append(f)
        for x in range(stride):
            left = row[x - 3] if x >= 3 else 0
            up = prev[x]
            ul = prev[x - 3] if x >= 3 else 0
            if f == 0:
                v = row[x]
            elif f == 1:
                v = (row[x] - left) & 0xFF
            elif f == 2:
                v = (row[x] - up) & 0xFF
            elif f == 3:
                v = (row[x] - (left + up) // 2) & 0xFF
            else:
                v = (row[x] - paeth(left, up, ul)) & 0xFF
            raw.append(v)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png(buf: bytes) -> tuple[int, int, bytes]:
    """Dependency-free PNG decode for 8-bit RGB/RGBA/grayscale,
    non-interlaced: chunk walk, zlib inflate, and full filter
    reconstruction (the inverse of all five spec filters).  Returns
    (width, height, raw_sample_bytes)."""
    import struct
    import zlib

    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError(f"not a PNG (magic {buf[:8]!r})")
    pos, w, h, bpp = 8, None, None, None
    idat = bytearray()
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        typ = buf[pos + 4 : pos + 8]
        if pos + 8 + ln > len(buf):
            raise ValueError(f"PNG chunk {typ!r} length {ln} overruns buffer")
        data = buf[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            if ln != 13:
                raise ValueError(f"PNG IHDR length {ln} != 13")
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8 or color not in (0, 2, 6) or interlace != 0:
                raise NotImplementedError(
                    f"PNG depth={depth} color={color} interlace={interlace} unsupported"
                )
            bpp = {0: 1, 2: 3, 6: 4}[color]
        elif typ == b"IDAT":
            if w is None:
                raise ValueError("PNG IDAT before IHDR")
            idat += data
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT stream corrupt: {exc}") from exc
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError(f"PNG pixel stream: want {h * (stride + 1)} bytes, have {len(raw)}")

    def paeth(a: int, b: int, c: int) -> int:
        pp = a + b - c
        pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    out = bytearray(h * stride)
    prev = bytes(stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        rec = bytearray(stride)
        for x in range(stride):
            left = rec[x - bpp] if x >= bpp else 0
            up = prev[x]
            ul = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                v = line[x]
            elif f == 1:
                v = (line[x] + left) & 0xFF
            elif f == 2:
                v = (line[x] + up) & 0xFF
            elif f == 3:
                v = (line[x] + (left + up) // 2) & 0xFF
            elif f == 4:
                v = (line[x] + paeth(left, up, ul)) & 0xFF
            else:
                raise ValueError(f"PNG filter {f} invalid")
            rec[x] = v
        out[y * stride : (y + 1) * stride] = rec
        prev = bytes(rec)
    return w, h, bytes(out)


def multimodal_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode through the production mapInPandas
    path: per document, an 8-bit RGB PNG is encoded (pixels analytic in
    doc_id: sample(x,y,c) = (fill + 3x + 7y + c) % 256, per-row filters
    cycling through all five spec types), the bytes run through the real
    chunk-walk + zlib-inflate + filter-reconstruction decoder, and the
    features come from the RECONSTRUCTED samples — so a single wrong
    byte in any filter path breaks the hash.  The oracle recomputes
    width/height/sum/mean analytically from doc_id (the compressed
    representation never needs to be replayed, only the pixels)."""
    d = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    rows.append((int(doc_id), None, None, None, None, None))
                    continue
                w = 1 + int(doc_id) % 8
                h = 1 + int(doc_id) % 6
                fill = 32 + int(doc_id) % 95
                rgb = bytes(
                    (fill + 3 * x + 7 * y + c) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                )
                got_w, got_h, rec = decode_png(encode_png(w, h, rgb))
                if (got_w, got_h, rec) != (w, h, rgb):
                    raise ValueError(f"PNG round-trip failed for doc {doc_id}")
                total = sum(rec)
                rows.append(
                    (
                        int(doc_id),
                        got_w,
                        got_h,
                        len(rec),
                        int(total % (1 << 31)),
                        float(total) / len(rec),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_pixel_bytes", "checksum", "mean_val"],
            ).astype(
                {
                    "doc_id": "int64",
                    "width": "Int32",
                    "height": "Int32",
                    "n_pixel_bytes": "Int64",
                    "checksum": "Int64",
                    "mean_val": "float64",
                }
            )

    schema = (
        "doc_id long, width int, height int, n_pixel_bytes long, "
        "checksum long, mean_val double"
    )
    return d.mapInPandas(run, schema=schema)


MULTIMODAL_PNG_SQL = """
WITH px AS (
  SELECT d.doc_id,
         CAST(1 + d.doc_id % 8 AS BIGINT) AS w,
         CAST(1 + d.doc_id % 6 AS BIGINT) AS h,
         CAST(32 + d.doc_id % 95 AS BIGINT) AS fill
  FROM documents d WHERE d.text IS NOT NULL
), sums AS (
  SELECT doc_id, w, h,
         SUM((fill + 3 * x.i + 7 * y.i + c.i) % 256) AS total
  FROM px,
       UNNEST(range(0, w)) AS x(i),
       UNNEST(range(0, h)) AS y(i),
       UNNEST(range(0, 3)) AS c(i)
  GROUP BY 1, 2, 3
)
SELECT d.doc_id,
       CAST(s.w AS INTEGER) AS width,
       CAST(s.h AS INTEGER) AS height,
       CAST(s.w * s.h * 3 AS BIGINT) AS n_pixel_bytes,
       CAST(s.total % 2147483648 AS BIGINT) AS checksum,
       CAST(s.total AS DOUBLE) / (s.w * s.h * 3) AS mean_val
FROM documents d LEFT JOIN sums s ON s.doc_id = d.doc_id
"""


# ------------------------------------------------------------------ GIF

# GIF is the second compressed format decodable without media libraries:
# the pixel stream is LZW (implemented here from the spec — variable-width
# codes, clear/end codes, the KwKwK case), the container is a fixed
# header + palette + sub-blocked data.


def encode_gif(w: int, h: int, idx: bytes) -> bytes:
    """Minimal GIF89a encoder: grayscale identity palette (index i ->
    (i,i,i)), 8-bit codes, and the classic 'uncompressed GIF' LZW stream
    (periodic CLEAR codes keep the code width fixed) — valid LZW the
    decoder must still fully interpret."""
    import struct

    mcs = 8
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # global palette, 256 entries
    for i in range(256):
        out += bytes((i, i, i))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(mcs)
    # bit-pack codes LSB-first at fixed width mcs+1, CLEAR every 200 pixels
    codes = []
    for i, px in enumerate(idx):
        if i % 200 == 0:
            codes.append(clear)
        codes.append(px)
    codes.append(end)
    acc = n_bits = 0
    data = bytearray()
    for c in codes:
        acc |= c << n_bits
        n_bits += mcs + 1
        while n_bits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8
    if n_bits:
        data.append(acc & 0xFF)
    for off in range(0, len(data), 255):
        blk = data[off : off + 255]
        out.append(len(blk))
        out += blk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(buf: bytes) -> tuple[int, int, bytes]:
    """Dependency-free GIF decode (single image, global palette, no
    interlace): full variable-width LZW with dictionary growth, CLEAR
    resets, and the KwKwK special case; palette expansion to raw RGB.
    Returns (width, height, rgb_bytes)."""
    import struct

    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"not a GIF (magic {buf[:6]!r})")
    if len(buf) < 13:
        raise ValueError("GIF header truncated")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", buf[6:13])
    pos = 13
    palette = None
    if flags & 0x80:
        n = 2 ** ((flags & 7) + 1)
        palette = buf[pos : pos + 3 * n]
        pos += 3 * n
    w = h = None
    while pos < len(buf):
        b0 = buf[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(buf) and buf[pos] != 0:
                pos += 1 + buf[pos]
            if pos >= len(buf):
                raise ValueError("GIF extension sub-blocks truncated")
            pos += 1
        elif b0 == 0x2C:
            if pos + 10 > len(buf):
                raise ValueError("GIF image descriptor truncated")
            _l, _t, w, h, iflags = struct.unpack("<HHHHB", buf[pos + 1 : pos + 10])
            pos += 10
            if iflags & 0x80:
                n = 2 ** ((iflags & 7) + 1)
                palette = buf[pos : pos + 3 * n]
                pos += 3 * n
            if iflags & 0x40:
                raise NotImplementedError("interlaced GIF unsupported")
            if pos >= len(buf):
                raise ValueError("GIF truncated before LZW min code size")
            mcs = buf[pos]
            pos += 1
            data = bytearray()
            while pos < len(buf) and buf[pos] != 0:
                ln = buf[pos]
                data += buf[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            if pos >= len(buf):
                raise ValueError("GIF image sub-blocks truncated")
            pos += 1
            break
        elif b0 == 0x3B:
            raise ValueError("GIF trailer before image data")
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    if w is None or palette is None:
        raise ValueError("GIF missing image descriptor or palette")

    clear, end = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    table = {i: bytes([i]) for i in range(clear)}
    nxt = end + 1
    acc = n_bits = 0
    prev = None
    out = bytearray()
    i = 0
    while True:
        while n_bits < width:
            if i >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[i] << n_bits
            n_bits += 8
            i += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_bits -= width
        if code == clear:
            table = {k: bytes([k]) for k in range(clear)}
            nxt, width, prev = end + 1, mcs + 1, None
            continue
        if code == end:
            break
        if code in table:
            entry = table[code]
        elif code == nxt and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"GIF LZW code {code} out of range")
        out += entry
        if prev is not None:
            table[nxt] = prev + entry[:1]
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) != w * h:
        raise ValueError(f"GIF: want {w * h} pixels, decoded {len(out)}")
    rgb = bytearray(w * h * 3)
    for j, px in enumerate(out):
        rgb[3 * j : 3 * j + 3] = palette[3 * px : 3 * px + 3]
    return w, h, bytes(rgb)


def decode_bmp(buf: bytes) -> tuple[int, int, bytes]:
    """Dependency-free BMP decode (BITMAPINFOHEADER, 24-bit BI_RGB): the
    content here is the container's two traps — rows are stored
    BOTTOM-UP and padded to 4-byte boundaries, and samples are BGR.
    Returns (width, height, rgb_bytes) in top-down RGB order."""
    import struct

    if buf[:2] != b"BM":
        raise ValueError(f"not a BMP (magic {buf[:2]!r})")
    if len(buf) < 34:
        raise ValueError("BMP header truncated")
    (data_off,) = struct.unpack("<I", buf[10:14])
    hdr_sz, w, h, _planes, bpp, comp = struct.unpack("<IiiHHI", buf[14:34])
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp} unsupported")
    if w <= 0:
        raise ValueError(f"BMP width {w} invalid")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    # the last row need not carry its padding, hence the w*3 tail
    if data_off + (h - 1) * stride + w * 3 > len(buf):
        raise ValueError(
            f"BMP pixel data overruns buffer (offset {data_off}, {h} rows of stride {stride})"
        )
    out = bytearray(w * h * 3)
    for row in range(h):
        src_row = row if top_down else h - 1 - row
        line = buf[data_off + src_row * stride : data_off + src_row * stride + w * 3]
        if len(line) < w * 3:
            raise ValueError("truncated BMP pixel data")
        for x in range(w):
            b, g, r = line[3 * x : 3 * x + 3]
            out[(row * w + x) * 3 : (row * w + x) * 3 + 3] = bytes((r, g, b))
    return w, h, bytes(out)


def encode_bmp(w: int, h: int, rgb: bytes) -> bytes:
    """Minimal bottom-up 24-bit BMP encoder (the storage order real BMP
    writers produce)."""
    import struct

    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in range(h - 1, -1, -1):
        line = bytearray()
        for x in range(w):
            r, g, b = rgb[(row * w + x) * 3 : (row * w + x) * 3 + 3]
            line += bytes((b, g, r))
        line += b"\x00" * (stride - w * 3)
        body += line
    info = struct.pack("<IiihHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    off = 14 + 40
    return b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off) + info + bytes(body)


def multimodal_gif_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL LZW decode through the production mapInPandas path: per
    document an 8-bit GIF is encoded (palette indices analytic in
    doc_id: idx(x,y) = (fill + 3x + 7y) % 256 over a grayscale identity
    palette), run through the full variable-width LZW decoder, and the
    features come from the RECONSTRUCTED pixels — grayscale palette
    makes every pixel contribute 3 identical samples, so the oracle's
    analytic sum is 3x the index sum."""
    d = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    rows.append((int(doc_id), None, None, None, None, None))
                    continue
                w = 1 + int(doc_id) % 8
                h = 1 + int(doc_id) % 6
                fill = 32 + int(doc_id) % 95
                idx = bytes((fill + 3 * x + 7 * y) % 256 for y in range(h) for x in range(w))
                got_w, got_h, rgb = decode_gif(encode_gif(w, h, idx))
                expect = bytes(v for px in idx for v in (px, px, px))
                if (got_w, got_h, rgb) != (w, h, expect):
                    raise ValueError(f"GIF round-trip failed for doc {doc_id}")
                total = sum(rgb)
                rows.append(
                    (
                        int(doc_id),
                        got_w,
                        got_h,
                        len(rgb),
                        int(total % (1 << 31)),
                        float(total) / len(rgb),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_pixel_bytes", "checksum", "mean_val"],
            ).astype(
                {
                    "doc_id": "int64",
                    "width": "Int32",
                    "height": "Int32",
                    "n_pixel_bytes": "Int64",
                    "checksum": "Int64",
                    "mean_val": "float64",
                }
            )

    schema = (
        "doc_id long, width int, height int, n_pixel_bytes long, "
        "checksum long, mean_val double"
    )
    return d.mapInPandas(run, schema=schema)


MULTIMODAL_GIF_SQL = """
WITH px AS (
  SELECT d.doc_id,
         CAST(1 + d.doc_id % 8 AS BIGINT) AS w,
         CAST(1 + d.doc_id % 6 AS BIGINT) AS h,
         CAST(32 + d.doc_id % 95 AS BIGINT) AS fill
  FROM documents d WHERE d.text IS NOT NULL
), sums AS (
  SELECT doc_id, w, h,
         3 * SUM((fill + 3 * x.i + 7 * y.i) % 256) AS total
  FROM px,
       UNNEST(range(0, w)) AS x(i),
       UNNEST(range(0, h)) AS y(i)
  GROUP BY 1, 2, 3
)
SELECT d.doc_id,
       CAST(s.w AS INTEGER) AS width,
       CAST(s.h AS INTEGER) AS height,
       CAST(s.w * s.h * 3 AS BIGINT) AS n_pixel_bytes,
       CAST(s.total % 2147483648 AS BIGINT) AS checksum,
       CAST(s.total AS DOUBLE) / (s.w * s.h * 3) AS mean_val
FROM documents d LEFT JOIN sums s ON s.doc_id = d.doc_id
"""


QUERIES = {
    "multimodal_metadata": multimodal_metadata,
    "multimodal_audio_features": multimodal_audio_features,
    "multimodal_features": multimodal_features,
    "multimodal_png_features": multimodal_png_features,
    "multimodal_gif_features": multimodal_gif_features,
    "multimodal_features_meta": multimodal_features_meta,
    "multimodal_resize": multimodal_resize,
    "multimodal_frame_sample": multimodal_frame_sample,
}

ORACLE = {
    "multimodal_metadata": MULTIMODAL_META_SQL,
    "multimodal_audio_features": MULTIMODAL_AUDIO_SQL,
    "multimodal_features": MULTIMODAL_FEATURES_SQL,
    "multimodal_png_features": MULTIMODAL_PNG_SQL,
    "multimodal_gif_features": MULTIMODAL_GIF_SQL,
    "multimodal_features_meta": MULTIMODAL_FEATURES_META_SQL,
    "multimodal_resize": MULTIMODAL_RESIZE_SQL,
    "multimodal_frame_sample": MULTIMODAL_FRAMES_SQL,
}
