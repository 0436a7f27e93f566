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
    JPEG (baseline SOF0 and progressive SOF2, 4:4:4/4:2:0/4:2:2/4:4:0)
    decodes via the marker-walk + canonical-Huffman + numpy-IDCT decoder
    below; WebP-lossless (VP8L) via the codec in ``llm_ops/webp.py``;
    remaining compressed formats (lossy WebP/AVIF/...) raise
    ``NotImplementedError`` — their codecs are not in this environment.
    The signature (pandas in, one output row per payload) is the
    production contract for mapInPandas workers.
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
        elif b[:2] == b"\xff\xd8":
            w, h, rgb = decode_jpeg(b)
            maxval = 255
        elif b[:4] == b"RIFF" and b[8:12] == b"WEBP":
            from realtime_change_data_capture_streaming_spark.llm_ops.webp import decode_webp_lossless

            w, h, rgb = decode_webp_lossless(b)
            maxval = 255
        elif b[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
            from realtime_change_data_capture_streaming_spark.llm_ops.tiff import decode_tiff

            w, h, _spp, rgb = decode_tiff(b)
            maxval = 255
        elif b[:2] == b"P6":
            w, h, maxval, rgb = decode_ppm(b)
        else:
            raise NotImplementedError(
                f"image decode for magic {b[:4]!r} requires PIL/libvips, not "
                "present in this environment; PPM (P6), PNG, GIF, BMP, "
                "baseline+progressive JPEG and WebP-lossless decode natively"
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


_CUT_THRESHOLD = 32.0  # mean-abs-pixel-delta above this = scene cut


def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video scene-cut detection over the frame demuxer: per document a
    multi-frame PPM stream whose fill JUMPS at an analytic cut point
    (two constant scenes), demuxed by the real header-walk parser, then
    consecutive-frame mean-absolute-pixel-delta thresholding — the
    shot-boundary primitive of video curation (sample one frame per
    scene, not per interval).  Deltas between constant frames are exact
    integers, so the oracle recomputes cut position and magnitude
    analytically from doc_id."""
    d = spread(load_table(spark, sf_dir, "documents"))
    doc = F.col("doc_id")
    n_frames = (F.lit(4) + doc % 3).cast("int")
    w = (F.lit(4) + doc % 4).cast("int")
    h = F.lit(4)
    base = (F.lit(20) + doc % 40).cast("int")
    jump = (F.lit(50) + doc % 18).cast("int")
    cut_idx = (F.lit(2) + doc % 2).cast("int")
    header = F.concat(
        F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"), F.lit("\n255\n")
    )
    frames_str = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_frames - F.lit(1)),
            lambda i: F.concat(
                header,
                F.repeat(
                    F.char(base + F.when(i >= cut_idx, jump).otherwise(F.lit(0))),
                    w * h * F.lit(3),
                ),
            ),
        ),
        "",
    )
    payload = F.when(F.col("text").isNotNull(), F.encode(frames_str, "utf-8"))
    media = d.select("doc_id", payload.alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                if b is None:
                    rows.append((doc_id, None, None, None, None))
                    continue
                buf = bytes(b)
                frames = []
                pos = 0
                while pos < len(buf):
                    _w, _h, _mv, rgb = decode_ppm(buf[pos:])
                    hdr_len = buf.index(b"\n255\n", pos) + 5 - pos
                    frames.append(rgb)
                    pos += hdr_len + len(rgb)
                cuts, max_delta = [], 0.0
                for i in range(1, len(frames)):
                    a, bb = frames[i - 1], frames[i]
                    delta = sum(abs(x - y) for x, y in zip(a, bb)) / len(a)
                    max_delta = max(max_delta, delta)
                    if delta > _CUT_THRESHOLD:
                        cuts.append(i)
                rows.append(
                    (
                        doc_id,
                        len(frames),
                        len(cuts),
                        cuts[0] if cuts else None,
                        max_delta,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_frames", "n_cuts", "first_cut", "max_delta"]
            ).astype(
                {
                    "doc_id": "int64",
                    "n_frames": "Int32",
                    "n_cuts": "Int64",
                    "first_cut": "Int64",
                    "max_delta": "float64",
                }
            )

    return media.mapInPandas(
        run,
        schema="doc_id long, n_frames int, n_cuts long, first_cut long, max_delta double",
    )


MULTIMODAL_CUTS_SQL = """
SELECT doc_id,
       CASE WHEN text IS NOT NULL THEN CAST(4 + doc_id % 3 AS INTEGER) END AS n_frames,
       CASE WHEN text IS NOT NULL THEN CAST(1 AS BIGINT) END AS n_cuts,
       CASE WHEN text IS NOT NULL THEN CAST(2 + doc_id % 2 AS BIGINT) END AS first_cut,
       CASE WHEN text IS NOT NULL THEN CAST(50 + doc_id % 18 AS DOUBLE) END AS max_delta
FROM documents
"""


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


def _g711_alaw_table() -> list[int]:
    """The 256-entry ITU-T G.711 A-law -> 16-bit-linear expansion,
    computed from the published segment formula (the reference decoder
    every telephony stack ships): XOR 0x55, quantized mantissa << 4,
    segment 0 adds 8, higher segments add 0x108 then shift.  Max
    magnitude 32256 — the published A-law constant."""
    out = []
    for code in range(256):
        a = code ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t += 0x108
            t <<= seg - 1
        out.append(t if a & 0x80 else -t)
    return out


def _g711_ulaw_table() -> list[int]:
    """The 256-entry ITU-T G.711 mu-law -> 16-bit-linear expansion:
    complement, biased mantissa ((m << 3) + 0x84) shifted by the
    segment, bias removed, sign from bit 7.  Max magnitude 32124 — the
    published mu-law constant; codes 0x7F and 0xFF are the two zeros."""
    out = []
    for code in range(256):
        u = ~code & 0xFF
        t = ((u & 0x0F) << 3) + 0x84
        t <<= (u & 0x70) >> 4
        out.append((0x84 - t) if u & 0x80 else (t - 0x84))
    return out


_G711_ALAW = _g711_alaw_table()
_G711_ULAW = _g711_ulaw_table()


def decode_wav(buf: bytes) -> tuple[int, int, int, int, bytes]:
    """Decode a RIFF/WAVE payload: (sample_rate, n_channels,
    bits_per_sample, format_tag, sample_bytes).  Dependency-free struct
    parsing of the canonical container: RIFF header, fmt chunk, chunk
    walk to the data chunk.  Format tags 1 (linear PCM), 6 (G.711
    A-law), and 7 (G.711 mu-law) are accepted — the three WAVE codecs
    with published closed-form decoders; anything else raises.  Raises
    ValueError on malformed input — corrupt audio surfaces as an error,
    never as wrong features (same contract as ``decode_ppm``)."""
    import struct

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE payload (magic {buf[:4]!r})")
    pos, fmt, rate, n_ch, bits = 12, None, None, None, None
    while pos + 8 <= len(buf):
        cid, clen = buf[pos : pos + 4], struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        body = buf[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt not in (1, 6, 7):
                raise ValueError(
                    f"only PCM (fmt=1) and G.711 (fmt=6/7) decode natively, got fmt={fmt}"
                )
            if fmt in (6, 7) and bits != 8:
                raise ValueError(f"G.711 samples are 8-bit on the wire, got {bits}")
        elif cid == b"data":
            if len(body) != clen:
                raise ValueError(f"truncated data chunk: want {clen}, have {len(body)}")
            if rate is None:
                raise ValueError("data chunk before fmt chunk")
            return rate, n_ch, bits, fmt, body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    raise ValueError("no data chunk")


def decode_audio(buf: bytes) -> tuple[int, int, int, list[list[int]]]:
    """Audio router (the audio counterpart of ``decode_image_batch``'s
    magic dispatch): RIFF/WAVE (linear PCM and G.711 A-law/mu-law) and
    fLaC payloads decode natively to (sample_rate, n_channels,
    bits_per_sample, per-channel sample lists); genuinely-absent codecs
    (MP3/Opus/AAC) raise ``NotImplementedError``.  WAV samples are
    folded to signed ints (8-bit PCM is unsigned on the wire, wider
    widths little-endian signed); G.711 bytes expand through the
    published companding tables to 16-bit linear, reported at the
    decoded width — so every format presents identical sample
    semantics."""
    if buf[:4] == b"fLaC":
        from realtime_change_data_capture_streaming_spark.llm_ops.flac import decode_flac

        return decode_flac(buf)
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        from realtime_change_data_capture_streaming_spark.llm_ops.adpcm import (
            decode_wav_adpcm,
            peek_wav_format_tag,
        )

        if peek_wav_format_tag(buf) in (0x02, 0x11):
            # IMA/DVI and Microsoft ADPCM (4-bit compressed WAVE):
            # decoded to 16-bit linear like the G.711 path below
            return decode_wav_adpcm(buf)
        rate, n_ch, bits, fmt, data = decode_wav(buf)
        if fmt in (6, 7):
            # G.711 companded audio: one byte per sample on the wire,
            # expanded through the published A-law/mu-law tables to
            # 16-bit linear — report the decoded width like FLAC does.
            # Truncate to whole frames (the PCM path below does the same
            # via integer division) so channels stay equal-length.
            table = _G711_ALAW if fmt == 6 else _G711_ULAW
            data = data[: (len(data) // n_ch) * n_ch]
            channels = [
                [table[b] for b in data[c :: n_ch]] for c in range(n_ch)
            ]
            return rate, n_ch, 16, channels
        step = bits // 8
        frames = len(data) // (step * n_ch)
        channels: list[list[int]] = [[] for _ in range(n_ch)]
        for f in range(frames):
            for c in range(n_ch):
                raw = data[(f * n_ch + c) * step : (f * n_ch + c + 1) * step]
                if bits == 8:
                    channels[c].append(raw[0] - 128)  # unsigned on the wire
                else:
                    channels[c].append(int.from_bytes(raw, "little", signed=True))
        return rate, n_ch, bits, channels
    raise NotImplementedError(
        f"audio decode for magic {buf[:4]!r} requires external codecs; "
        "WAV (PCM + G.711 + IMA/MS ADPCM) and FLAC decode natively"
    )


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
                rate, n_ch, bits, _fmt, data = decode_wav(_synth_wav(int(doc_id)))
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


# ----------------------------------------------------------------- JPEG

# Baseline sequential JPEG (SOF0) is the last common image format
# decodable without media libraries: the entropy layer is canonical
# Huffman (tables carried in the file), the transform is the 8x8 DCT
# (numpy matmuls against a precomputed orthonormal basis), and the
# container is marker segments.  Progressive (SOF2), 12-bit, subsampled
# chroma, arithmetic coding, and restart intervals raise
# NotImplementedError — baseline 4:4:4 is the scope, which our own
# encoder (and any encoder told to write 4:4:4) produces.


def _jpeg_zigzag() -> list[int]:
    """Natural (row-major) index of each position in JPEG zigzag order,
    generated by the diagonal walk rather than transcribed."""
    out = []
    for s in range(15):
        cells = [(c, s - c) for c in range(max(0, s - 7), min(8, s + 1))]
        if s % 2:
            cells.reverse()
        out += [8 * y + x for x, y in cells]
    return out


_JPEG_ZZ = _jpeg_zigzag()

#: ITU T.81 Annex K example quantization tables (spec-published)
_JPEG_STD_LUMA_QT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_JPEG_STD_CHROMA_QT = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

#: flat tables: DC quantizer 1 makes constant-per-block images round-trip
#: EXACTLY (DC = 8*(v-128) is an integer; all ACs are 0), the property the
#: analytic oracle relies on
_JPEG_FLAT_QT = [1] * 64

# encoder Huffman tables (simple valid canonical tables; the decoder reads
# whatever DHT carries, so optimality is irrelevant): all 12 DC categories
# at 4 bits, all 162 AC run/size symbols at 8 bits
_JPEG_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_JPEG_DC_SYMS = list(range(12))
#: fixed all-8-bit AC table: EOB0, ZRL, the 160 run/size symbols, plus
#: EOBn (n=1..14) band-end-run symbols progressive scans emit (harmless
#: extras for baseline; 176 codes of 8 bits is a valid canonical table)
_JPEG_AC_COUNTS = [0] * 7 + [176] + [0] * 8
_JPEG_AC_SYMS = (
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [n << 4 for n in range(1, 15)]
)


def _jpeg_canonical(counts: list[int], syms: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, bit length) for a canonical JPEG Huffman table."""
    codes: dict[int, tuple[int, int]] = {}
    code = k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes[syms[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _jpeg_decode_table(counts: list[int], syms: list[int]) -> dict[tuple[int, int], int]:
    """(bit length, code) -> symbol, the decode orientation."""
    return {(ln, c): s for s, (c, ln) in _jpeg_canonical(counts, syms).items()}


def _jpeg_dct_matrix():
    import numpy as np

    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) * np.sqrt(2.0 / 8.0)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c  # orthonormal: forward F = C @ B @ C.T, inverse B = C.T @ F @ C


class _JpegBitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def finish(self) -> bytes:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def _jpeg_quantized(w: int, h: int, rgb: bytes, quant=None):
    """Shared front half of both JPEG encoders: RGB -> YCbCr -> padded
    8x8 blocks -> orthonormal DCT -> quantize.  Returns (qt_l, qt_c,
    blocks_y, blocks_x, coefs) with ``coefs[ci][by][bx]`` an int64[64]
    in ZIGZAG order."""
    import numpy as np

    qt_l = np.asarray(quant[0] if quant else _JPEG_STD_LUMA_QT, dtype=np.float64).reshape(8, 8)
    qt_c = np.asarray(quant[1] if quant else _JPEG_STD_CHROMA_QT, dtype=np.float64).reshape(8, 8)
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3).astype(np.float64)
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    planes = [
        np.clip(np.rint(0.299 * r + 0.587 * g + 0.114 * b), 0, 255),
        np.clip(np.rint(128 - 0.168736 * r - 0.331264 * g + 0.5 * b), 0, 255),
        np.clip(np.rint(128 + 0.5 * r - 0.418688 * g - 0.081312 * b), 0, 255),
    ]
    h8, w8 = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    planes = [np.pad(p, ((0, h8 - h), (0, w8 - w)), mode="edge") for p in planes]
    cmat = _jpeg_dct_matrix()
    coefs = []
    for ci, p in enumerate(planes):
        qt = qt_l if ci == 0 else qt_c
        rows = []
        for by in range(h8 // 8):
            row = []
            for bx in range(w8 // 8):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                fq = np.rint((cmat @ block @ cmat.T) / qt).astype(np.int64)
                row.append(fq.reshape(64)[_JPEG_ZZ])
            rows.append(row)
        coefs.append(rows)
    return qt_l, qt_c, h8 // 8, w8 // 8, coefs


def _jpeg_headers(w: int, h: int, qt_l, qt_c, sof_marker: int) -> bytearray:
    """SOI + DQT + SOF + DHT marker prefix shared by both encoders."""
    import struct

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(payload) + 2) + payload

    def zz_bytes(qt) -> bytes:
        flat = qt.reshape(64)
        return bytes(int(flat[_JPEG_ZZ[i]]) for i in range(64))

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + zz_bytes(qt_l) + bytes([0x01]) + zz_bytes(qt_c))
    out += seg(
        sof_marker,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(_JPEG_DC_COUNTS) + bytes(_JPEG_DC_SYMS)
        + bytes([0x10]) + bytes(_JPEG_AC_COUNTS) + bytes(_JPEG_AC_SYMS),
    )
    return out


def encode_jpeg(w: int, h: int, rgb: bytes, quant=None, restart_interval: int | None = None) -> bytes:
    """Minimal baseline-sequential 4:4:4 JPEG encoder: JFIF-less marker
    stream (SOI/DQT/SOF0/DHT/SOS/EOI), RGB->YCbCr, per-block orthonormal
    DCT + quantization (``quant`` = (luma, chroma) natural-order 64-lists;
    default the Annex K example tables), DC-diff + run/size Huffman with
    the fixed canonical tables above, byte stuffing.  With flat quant
    tables, constant-per-block images encode losslessly.

    ``restart_interval`` emits a DRI segment and an RST0-RST7 marker
    every that many MCUs (byte-aligned, DC predictors reset) — the
    error-resilience feature real camera JPEGs carry."""
    import struct

    qt_l, qt_c, nby, nbx, coefs = _jpeg_quantized(w, h, rgb, quant)
    dc_codes = _jpeg_canonical(_JPEG_DC_COUNTS, _JPEG_DC_SYMS)
    ac_codes = _jpeg_canonical(_JPEG_AC_COUNTS, _JPEG_AC_SYMS)
    segments: list[bytes] = []
    bw = _JpegBitWriter()
    pred = [0, 0, 0]
    mcu = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                segments.append(bw.finish())  # pad to byte; RST goes between
                bw = _JpegBitWriter()
                pred = [0, 0, 0]  # DC predictors reset at every restart
            mcu += 1
            for ci in range(3):
                zz = coefs[ci][by][bx]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t = abs(diff).bit_length()
                if t > 11:
                    raise ValueError(f"DC coefficient category {t} exceeds baseline")
                bw.write(*dc_codes[t])
                if t:
                    bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        bw.write(*ac_codes[0xF0])
                        run -= 16
                    s = abs(v).bit_length()
                    if s > 10:
                        raise ValueError(f"AC coefficient size {s} exceeds baseline")
                    bw.write(*ac_codes[(run << 4) | s])
                    bw.write(v if v > 0 else v + (1 << s) - 1, s)
                    run = 0
                if run:
                    bw.write(*ac_codes[0x00])  # EOB

    segments.append(bw.finish())
    out = _jpeg_headers(w, h, qt_l, qt_c, 0xC0)
    if restart_interval:
        out += bytes((0xFF, 0xDD)) + struct.pack(">HH", 4, restart_interval)
    out += bytes((0xFF, 0xDA)) + struct.pack(">H", 12) + bytes(
        [3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]
    )
    for i, seg in enumerate(segments):
        if i:
            out += bytes((0xFF, 0xD0 + ((i - 1) % 8)))  # RST markers cycle
        out += seg
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_420(w: int, h: int, rgb: bytes, quant=None, restart_interval: int | None = None) -> bytes:
    """Baseline 4:2:0 chroma-subsampled JPEG encoder — the sampling shape
    virtually every camera/web JPEG uses: 16x16 MCUs of 4 luma blocks +
    one 2x2-box-averaged block each of Cb and Cr (half resolution both
    axes).  Same fixed tables, DC-diff per component, optional restart
    intervals.  For gray inputs (R=G=B) the chroma planes are constant
    128, so subsampling is lossless and a 4:2:0 decode equals the 4:4:4
    decode exactly — the fixture/oracle hook."""
    import struct

    import numpy as np

    qt_l = np.asarray(quant[0] if quant else _JPEG_STD_LUMA_QT, dtype=np.float64).reshape(8, 8)
    qt_c = np.asarray(quant[1] if quant else _JPEG_STD_CHROMA_QT, dtype=np.float64).reshape(8, 8)
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3).astype(np.float64)
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    y = np.clip(np.rint(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
    cb = np.clip(np.rint(128 - 0.168736 * r - 0.331264 * g + 0.5 * b), 0, 255)
    cr = np.clip(np.rint(128 + 0.5 * r - 0.418688 * g - 0.081312 * b), 0, 255)
    mcux, mcuy = (w + 15) // 16, (h + 15) // 16
    yw, yh = mcux * 16, mcuy * 16
    y = np.pad(y, ((0, yh - h), (0, yw - w)), mode="edge")
    cb = np.pad(cb, ((0, yh - h), (0, yw - w)), mode="edge")
    cr = np.pad(cr, ((0, yh - h), (0, yw - w)), mode="edge")
    # 2x2 box average then round: the standard chroma downsample
    def down(p):
        return np.rint((p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0)

    cbs, crs = down(cb), down(cr)
    cmat = _jpeg_dct_matrix()
    dc_codes = _jpeg_canonical(_JPEG_DC_COUNTS, _JPEG_DC_SYMS)
    ac_codes = _jpeg_canonical(_JPEG_AC_COUNTS, _JPEG_AC_SYMS)

    def block_zz(plane, by, bx, qt):
        import numpy as np

        block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
        fq = np.rint((cmat @ block @ cmat.T) / qt).astype(np.int64)
        return fq.reshape(64)[_JPEG_ZZ]

    segments: list[bytes] = []
    bw = _JpegBitWriter()
    pred = [0, 0, 0]

    def emit(zz, ci):
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        t = abs(diff).bit_length()
        bw.write(*dc_codes[t])
        if t:
            bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                bw.write(*ac_codes[0xF0])
                run -= 16
            sz = abs(v).bit_length()
            bw.write(*ac_codes[(run << 4) | sz])
            bw.write(v if v > 0 else v + (1 << sz) - 1, sz)
            run = 0
        if run:
            bw.write(*ac_codes[0x00])

    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                segments.append(bw.finish())
                bw = _JpegBitWriter()
                pred = [0, 0, 0]
            mcu += 1
            for v in range(2):
                for hh in range(2):
                    emit(block_zz(y, my * 2 + v, mx * 2 + hh, qt_l), 0)
            emit(block_zz(cbs, my, mx, qt_c), 1)
            emit(block_zz(crs, my, mx, qt_c), 2)
    segments.append(bw.finish())

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(payload) + 2) + payload

    def zz_bytes(qt) -> bytes:
        flat = qt.reshape(64)
        return bytes(int(flat[_JPEG_ZZ[i]]) for i in range(64))

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + zz_bytes(qt_l) + bytes([0x01]) + zz_bytes(qt_c))
    out += seg(
        0xC0,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(_JPEG_DC_COUNTS) + bytes(_JPEG_DC_SYMS)
        + bytes([0x10]) + bytes(_JPEG_AC_COUNTS) + bytes(_JPEG_AC_SYMS),
    )
    if restart_interval:
        out += bytes((0xFF, 0xDD)) + struct.pack(">HH", 4, restart_interval)
    out += bytes((0xFF, 0xDA)) + struct.pack(">H", 12) + bytes(
        [3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]
    )
    for i, sgm in enumerate(segments):
        if i:
            out += bytes((0xFF, 0xD0 + ((i - 1) % 8)))
        out += sgm
    out += b"\xff\xd9"
    return bytes(out)


def encode_progressive_jpeg(
    w: int, h: int, rgb: bytes, quant=None, subsampling: str = "444",
    restart_interval: int | None = None,
) -> bytes:
    """Progressive (SOF2) JPEG encoder exercising BOTH progressive
    mechanisms (ITU T.81 Annex G): spectral selection (DC scan, then the
    luma AC band split 1-5 / 6-63, then each chroma band 1-63) and
    successive approximation (every first pass sends coefficients at
    point transform Al=1; refinement scans Ah=1, Al=0 deliver the final
    bit — raw bits for DC, the correction-bit protocol for AC).  AC
    band-end runs accumulate into true EOBn symbols.  Same quantized
    coefficients as the matching baseline encoder, so a progressive
    decode must equal the baseline decode of the same pixels
    bit-for-bit.

    ``subsampling="420"`` produces the default real-world progressive
    shape (``cjpeg -progressive``): the interleaved DC scans walk 16x16
    MCUs (4 luma + 1 of each chroma block) over the MCU-padded grid,
    while the non-interleaved AC scans cover exactly each component's
    TRUE block grid (T.81 A.2.4) — the geometry split the decoder must
    honor.  ``restart_interval`` emits DRI + per-scan RST0-7 markers
    (byte-aligned, predictors and EOBRUN reset; the band-end run is
    flushed before every restart)."""
    import struct

    import numpy as np

    dc_codes = _jpeg_canonical(_JPEG_DC_COUNTS, _JPEG_DC_SYMS)
    ac_codes = _jpeg_canonical(_JPEG_AC_COUNTS, _JPEG_AC_SYMS)
    qt_l = np.asarray(quant[0] if quant else _JPEG_STD_LUMA_QT, dtype=np.float64).reshape(8, 8)
    qt_c = np.asarray(quant[1] if quant else _JPEG_STD_CHROMA_QT, dtype=np.float64).reshape(8, 8)
    cmat = _jpeg_dct_matrix()

    def plane_blocks(plane, qt):
        """Row-major zigzag coefficient list over the plane's block grid."""
        bh, bwd = plane.shape[0] // 8, plane.shape[1] // 8
        out = []
        for by in range(bh):
            for bx in range(bwd):
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                fq = np.rint((cmat @ block @ cmat.T) / qt).astype(np.int64)
                out.append(fq.reshape(64)[_JPEG_ZZ])
        return out

    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3).astype(np.float64)
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    yp = np.clip(np.rint(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
    cbp = np.clip(np.rint(128 - 0.168736 * r - 0.331264 * g + 0.5 * b), 0, 255)
    crp = np.clip(np.rint(128 + 0.5 * r - 0.418688 * g - 0.081312 * b), 0, 255)
    if subsampling == "444":
        h8, w8 = (h + 7) // 8 * 8, (w + 7) // 8 * 8
        pads = [np.pad(p, ((0, h8 - h), (0, w8 - w)), mode="edge") for p in (yp, cbp, crp)]
        specs = [(1, 1, 1), (2, 1, 1), (3, 1, 1)]
        mcux, mcuy = w8 // 8, h8 // 8
        blocks = {cid: plane_blocks(pads[i], qt_l if i == 0 else qt_c) for i, (cid, _h, _v) in enumerate(specs)}
        geom = {cid: (mcux, mcuy, mcux, mcuy) for cid, _h, _v in specs}
    elif subsampling == "420":
        mcux, mcuy = (w + 15) // 16, (h + 15) // 16
        yw, yh = mcux * 16, mcuy * 16
        ypad = np.pad(yp, ((0, yh - h), (0, yw - w)), mode="edge")
        cbpad = np.pad(cbp, ((0, yh - h), (0, yw - w)), mode="edge")
        crpad = np.pad(crp, ((0, yh - h), (0, yw - w)), mode="edge")

        def down(p):
            return np.rint((p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0)

        specs = [(1, 2, 2), (2, 1, 1), (3, 1, 1)]
        blocks = {
            1: plane_blocks(ypad, qt_l),
            2: plane_blocks(down(cbpad), qt_c),
            3: plane_blocks(down(crpad), qt_c),
        }
        geom = {
            1: (2 * mcux, 2 * mcuy, (w + 7) // 8, (h + 7) // 8),
            2: (mcux, mcuy, ((w + 1) // 2 + 7) // 8, ((h + 1) // 2 + 7) // 8),
            3: (mcux, mcuy, ((w + 1) // 2 + 7) // 8, ((h + 1) // 2 + 7) // 8),
        }
    else:
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    hv_of = {cid: (hi, vi) for cid, hi, vi in specs}

    def mcu_order():
        for my in range(mcuy):
            for mx in range(mcux):
                for cid, hi, vi in specs:
                    bw_pad = geom[cid][0]
                    for v in range(vi):
                        for hh2 in range(hi):
                            yield cid, (my * vi + v) * bw_pad + mx * hi + hh2

    def true_order(cid):
        bw_pad, _bh, bw_true, bh_true = geom[cid]
        for by in range(bh_true):
            for bx in range(bw_true):
                yield by * bw_pad + bx

    def sos(comps: list[int], ss: int, se: int, ah: int, al: int, segs: list[bytes]) -> bytes:
        hdr = bytes([len(comps)])
        for cid in comps:
            hdr += bytes([cid, 0x00])  # Td=0 / Ta=0: the fixed table pair
        hdr += bytes([ss, se, (ah << 4) | al])
        body = b""
        for i, sg in enumerate(segs):
            if i:  # RSTm cycles modulo 8 within each scan (T.81 E.2.4)
                body += bytes((0xFF, 0xD0 + ((i - 1) % 8)))
            body += sg
        return bytes((0xFF, 0xDA)) + struct.pack(">H", len(hdr) + 2) + hdr + body

    ri = restart_interval or 0

    def mcu_units():
        """Blocks grouped per MCU — the restart-interval unit of an
        interleaved scan."""
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for cid, hi, vi in specs:
                    bw_pad = geom[cid][0]
                    for v in range(vi):
                        for hh2 in range(hi):
                            unit.append((cid, (my * vi + v) * bw_pad + mx * hi + hh2))
                yield unit

    def dc_first(al: int) -> list[bytes]:
        segs, bw = [], _JpegBitWriter()
        pred = {cid: 0 for cid, _h, _v in specs}
        for ui, unit in enumerate(mcu_units()):
            if ri and ui and ui % ri == 0:
                segs.append(bw.finish())
                bw = _JpegBitWriter()
                pred = {cid: 0 for cid, _h, _v in specs}
            for cid, bi in unit:
                v = int(blocks[cid][bi][0]) >> al  # DC point transform: arithmetic shift
                diff = v - pred[cid]
                pred[cid] = v
                t = abs(diff).bit_length()
                bw.write(*dc_codes[t])
                if t:
                    bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
        segs.append(bw.finish())
        return segs

    def dc_refine(al: int) -> list[bytes]:
        segs, bw = [], _JpegBitWriter()
        for ui, unit in enumerate(mcu_units()):
            if ri and ui and ui % ri == 0:
                segs.append(bw.finish())
                bw = _JpegBitWriter()
            for cid, bi in unit:
                bw.write((int(blocks[cid][bi][0]) >> al) & 1, 1)
        segs.append(bw.finish())
        return segs

    def _emit_eobrun(bw, state):
        eobrun, buffered = state
        if eobrun > 0:
            n = eobrun.bit_length() - 1
            bw.write(*ac_codes[n << 4])
            if n:
                bw.write(eobrun - (1 << n), n)
        for bit in buffered:
            bw.write(bit, 1)
        state[0], state[1] = 0, []

    def ac_first(cid: int, ss: int, se: int, al: int) -> list[bytes]:
        segs = []
        bw = _JpegBitWriter()
        state = [0, []]  # [eobrun, buffered-bits] (no buffered bits in first scans)
        for ui, bi in enumerate(true_order(cid)):
            if ri and ui and ui % ri == 0:
                # restart: flush the pending band-end run, byte-align,
                # fresh entropy state (a non-interleaved MCU = one block)
                _emit_eobrun(bw, state)
                segs.append(bw.finish())
                bw = _JpegBitWriter()
            zz = blocks[cid][bi]
            run = 0
            for k in range(ss, se + 1):
                c = int(zz[k])
                v = (abs(c) >> al) * (1 if c >= 0 else -1)  # AC point transform
                if v == 0:
                    run += 1
                    continue
                _emit_eobrun(bw, state)
                while run > 15:
                    bw.write(*ac_codes[0xF0])
                    run -= 16
                s = abs(v).bit_length()
                bw.write(*ac_codes[(run << 4) | s])
                bw.write(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
            if run:
                state[0] += 1
                if state[0] == 0x7FFF:
                    _emit_eobrun(bw, state)
        _emit_eobrun(bw, state)
        segs.append(bw.finish())
        return segs

    def ac_refine(cid: int, ss: int, se: int, al: int) -> list[bytes]:
        # T.81 G.1.2.3 / the classic encode_mcu_AC_refine shape: newly
        # nonzero coefficients (|c|>>Al == 1) are coded run/size with the
        # run counting only zero-history positions; already-nonzero
        # positions contribute one correction bit each, interleaved in
        # order; band-end runs buffer their correction bits until the
        # EOBn flush.
        segs = []
        bw = _JpegBitWriter()
        state = [0, []]
        for ui, bi in enumerate(true_order(cid)):
            if ri and ui and ui % ri == 0:
                _emit_eobrun(bw, state)
                segs.append(bw.finish())
                bw = _JpegBitWriter()
            zz = blocks[cid][bi]
            absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            eob = 0  # index AFTER the last newly-nonzero coefficient
            for i, a in enumerate(absv):
                if a == 1:
                    eob = i + 1
            run = 0
            pending: list[int] = []  # correction bits since last emitted symbol
            for i, a in enumerate(absv):
                if a == 0:
                    run += 1
                    continue
                # ZRLs flush on reaching ANY nonzero position (correction
                # bits buffered so far all lie before the 16-zero span, so
                # the decoder's ZRL walk consumes exactly them) — but only
                # before EOB; past the last newly-nonzero coefficient the
                # run folds into the EOB run instead
                while run > 15 and i < eob:
                    _emit_eobrun(bw, state)
                    bw.write(*ac_codes[0xF0])
                    run -= 16
                    for bit in pending:
                        bw.write(bit, 1)
                    pending = []
                if a > 1:
                    pending.append(a & 1)
                    continue
                # newly nonzero (a == 1)
                _emit_eobrun(bw, state)
                bw.write(*ac_codes[(run << 4) | 1])
                bw.write(1 if int(zz[ss + i]) > 0 else 0, 1)
                for bit in pending:
                    bw.write(bit, 1)
                pending = []
                run = 0
            # band end: an EOB is due only if the symbol walk did not end
            # the band exactly (trailing zero-history run or buffered
            # correction bits remain) — the decoder consumes no EOB for a
            # block whose last placement sat at Se
            if run > 0 or pending:
                state[0] += 1
                state[1].extend(pending)
                if state[0] == 0x7FFF or len(state[1]) > 900:
                    _emit_eobrun(bw, state)
        _emit_eobrun(bw, state)
        segs.append(bw.finish())
        return segs

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(payload) + 2) + payload

    def zz_bytes(qt) -> bytes:
        flat = qt.reshape(64)
        return bytes(int(flat[_JPEG_ZZ[i]]) for i in range(64))

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + zz_bytes(qt_l) + bytes([0x01]) + zz_bytes(qt_c))
    sof_comps = b"".join(
        bytes([cid, (hi << 4) | vi, 0 if cid == 1 else 1]) for cid, hi, vi in specs
    )
    out += seg(0xC2, bytes([8]) + struct.pack(">HH", h, w) + bytes([3]) + sof_comps)
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(_JPEG_DC_COUNTS) + bytes(_JPEG_DC_SYMS)
        + bytes([0x10]) + bytes(_JPEG_AC_COUNTS) + bytes(_JPEG_AC_SYMS),
    )
    if ri:
        out += bytes((0xFF, 0xDD)) + struct.pack(">HH", 4, ri)
    al = 1
    out += sos([1, 2, 3], 0, 0, 0, al, dc_first(al))
    out += sos([1], 1, 5, 0, al, ac_first(1, 1, 5, al))
    out += sos([1], 6, 63, 0, al, ac_first(1, 6, 63, al))
    out += sos([2], 1, 63, 0, al, ac_first(2, 1, 63, al))
    out += sos([3], 1, 63, 0, al, ac_first(3, 1, 63, al))
    out += sos([1, 2, 3], 0, 0, 1, 0, dc_refine(0))
    out += sos([1], 1, 63, 1, 0, ac_refine(1, 1, 63, 0))
    out += sos([2], 1, 63, 1, 0, ac_refine(2, 1, 63, 0))
    out += sos([3], 1, 63, 1, 0, ac_refine(3, 1, 63, 0))
    out += b"\xff\xd9"
    return bytes(out)


class _JpegBitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, t: int) -> int:
        v = 0
        for _ in range(t):
            v = (v << 1) | self.bit()
        return v


def _jpeg_extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(buf: bytes) -> tuple[int, int, bytes]:
    """Dependency-free baseline JPEG decode (SOF0, 8-bit, 4:4:4 or
    grayscale): marker walk, canonical-Huffman entropy decode with byte
    unstuffing, dequantization, numpy IDCT, YCbCr->RGB.  Returns
    (width, height, rgb_bytes)."""
    import struct

    import numpy as np

    if buf[:2] != b"\xff\xd8":
        raise ValueError(f"not a JPEG (magic {buf[:2]!r})")
    pos = 2
    qts: dict[int, object] = {}
    huffs: dict[tuple[int, int], dict] = {}
    sof = None
    scan_comps = None
    restart_interval = 0
    while pos + 2 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at offset {pos}")
        m = buf[pos + 1]
        if m == 0xD9:
            raise ValueError("JPEG EOI before scan data")
        if pos + 4 > len(buf):
            raise ValueError("JPEG segment header truncated")
        (ln,) = struct.unpack(">H", buf[pos + 2 : pos + 4])
        if ln < 2 or pos + 2 + ln > len(buf):
            raise ValueError(f"JPEG segment 0x{m:02x} length {ln} overruns buffer")
        data = buf[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if m == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables unsupported")
                if i + 65 > len(data):
                    raise ValueError("JPEG DQT truncated")
                tbl = np.zeros(64, dtype=np.float64)
                for k in range(64):
                    tbl[_JPEG_ZZ[k]] = data[i + 1 + k]
                qts[tq] = tbl.reshape(8, 8)
                i += 65
        elif m == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i < len(data):
                if i + 17 > len(data):
                    raise ValueError("JPEG DHT truncated")
                tc, th = data[i] >> 4, data[i] & 15
                counts = list(data[i + 1 : i + 17])
                n = sum(counts)
                if i + 17 + n > len(data):
                    raise ValueError("JPEG DHT symbols truncated")
                huffs[(tc, th)] = _jpeg_decode_table(counts, list(data[i + 17 : i + 17 + n]))
                i += 17 + n
        elif m == 0xC0:  # SOF0 baseline
            prec, hh, ww, nc = data[0], *struct.unpack(">HH", data[1:5]), data[5]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} unsupported")
            comps = []
            for c in range(nc):
                cid, samp, tq = data[6 + 3 * c : 9 + 3 * c]
                hi, vi = samp >> 4, samp & 15
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(f"JPEG sampling factors {hi}x{vi} unsupported")
                comps.append((cid, hi, vi, tq))
            sof = (ww, hh, comps)
        elif m == 0xC2:  # SOF2 progressive: multi-scan path
            return _decode_progressive_jpeg(buf)
        elif m in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG SOF{m - 0xC0} (extended/lossless/arithmetic) unsupported")
        elif m == 0xDD:  # DRI: restart interval in MCUs (0 = disabled)
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif m == 0xDA:  # SOS: entropy data follows
            ns = data[0]
            scan_comps = [(data[1 + 2 * c], data[2 + 2 * c]) for c in range(ns)]
            break
        # else: APPn/COM — skip
    if sof is None or scan_comps is None:
        raise ValueError("JPEG missing SOF0 or SOS")
    w, h, comps = sof
    # unstuff entropy bytes up to EOI; RST0-7 markers split the stream
    # into byte-aligned restart segments
    segs: list[bytes] = []
    ent = bytearray()
    i = pos
    while i < len(buf):
        b0 = buf[i]
        if b0 == 0xFF:
            if i + 1 >= len(buf):
                raise ValueError("JPEG entropy stream truncated at 0xFF")
            nxt = buf[i + 1]
            if nxt == 0x00:
                ent.append(0xFF)
                i += 2
                continue
            if nxt == 0xD9:
                break
            if 0xD0 <= nxt <= 0xD7:
                segs.append(bytes(ent))
                ent = bytearray()
                i += 2
                continue
            raise NotImplementedError(f"JPEG marker 0x{nxt:02x} inside scan unsupported")
        ent.append(b0)
        i += 1
    segs.append(bytes(ent))
    if len(segs) > 1 and not restart_interval:
        raise ValueError("JPEG RST markers present without a DRI interval")
    seg_iter = iter(segs)
    rd = _JpegBitReader(next(seg_iter))

    def huff_decode(table: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | rd.bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    cmat = _jpeg_dct_matrix()
    nc = len(comps)
    # generic MCU geometry (T.81 A.2.3): MCU = Hi x Vi blocks per
    # component; 4:4:4 degenerates to one block each, 4:2:0 is 4 luma +
    # 1 of each chroma per 16x16 MCU
    meta = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    hmax = max(hi for _cid, hi, _vi, _tq in comps)
    vmax = max(vi for _cid, _hi, vi, _tq in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    order = [cid for cid, _h, _v, _t in comps]
    planes_by_cid = {
        cid: np.zeros((mcuy * 8 * vi, mcux * 8 * hi), dtype=np.float64)
        for cid, hi, vi, _tq in comps
    }
    pred = [0] * nc
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # restart: next byte-aligned segment, DC predictors reset
                try:
                    rd = _JpegBitReader(next(seg_iter))
                except StopIteration:
                    raise ValueError("JPEG restart segment missing") from None
                pred = [0] * nc
            mcu += 1
            for ci in range(nc):
                cid, tsel = scan_comps[ci]
                hi, vi, tq = meta[cid]
                dc_t = huffs.get((0, tsel >> 4))
                ac_t = huffs.get((1, tsel & 15))
                qt = qts.get(tq)
                if dc_t is None or ac_t is None or qt is None:
                    raise ValueError("JPEG scan references missing Huffman/quant table")
                for v in range(vi):
                    for hh2 in range(hi):
                        coef = np.zeros(64, dtype=np.float64)
                        t = huff_decode(dc_t)
                        pred[ci] += _jpeg_extend(rd.bits(t), t) if t else 0
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = huff_decode(ac_t)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past end of block")
                            coef[_JPEG_ZZ[k]] = _jpeg_extend(rd.bits(s), s)
                            k += 1
                        block = (coef * qt.reshape(64)).reshape(8, 8)
                        spatial = cmat.T @ block @ cmat + 128.0
                        py, px = (my * vi + v) * 8, (mx * hi + hh2) * 8
                        planes_by_cid[cid][py : py + 8, px : px + 8] = spatial
    # upsample subsampled planes to full resolution (nearest replicate),
    # then crop to the true image size
    planes = []
    for cid in order:
        hi, vi, _tq = meta[cid]
        p = planes_by_cid[cid]
        if vi < vmax:
            p = np.repeat(p, vmax // vi, axis=0)
        if hi < hmax:
            p = np.repeat(p, hmax // hi, axis=1)
        planes.append(p)
    planes = [np.clip(np.rint(p[:h, :w]), 0, 255) for p in planes]
    if nc == 1:
        y = planes[0].astype(np.uint8)
        rgb = np.repeat(y[:, :, None], 3, axis=2)
    elif nc == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
    else:
        raise NotImplementedError(f"JPEG with {nc} components unsupported")
    return w, h, rgb.tobytes()


def _decode_progressive_jpeg(buf: bytes) -> tuple[int, int, bytes]:
    """Progressive JPEG (SOF2, 8-bit; 4:4:4, 4:2:0/4:2:2, or grayscale)
    decode: the
    full multi-scan coefficient-accumulation model of ITU T.81 Annex G —
    DC first/refinement scans (point transform = arithmetic shift, raw
    refinement bits), AC first scans with EOBn band-end runs, and AC
    refinement scans with the correction-bit protocol — then one
    dequantize + IDCT + color convert over the accumulated coefficients.
    Restart intervals are honored per scan (byte-aligned RST segments,
    DC-predictor + EOBRUN reset); arithmetic coding remains
    unsupported."""
    import struct

    import numpy as np

    pos = 2
    qts: dict[int, object] = {}
    huffs: dict[tuple[int, int], dict] = {}
    sof = None
    coef: dict | None = None
    restart_interval = 0

    def huff_decode(rd, table: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | rd.bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def correction(rd, blk, z, p1, m1) -> None:
        if rd.bit():
            if (int(blk[z]) & p1) == 0:
                blk[z] += p1 if blk[z] >= 0 else m1

    def ac_first_block(rd, ac_t, blk, ss, se, al, eobrun) -> int:
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = huff_decode(rd, ac_t)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rd.bits(r)
                    return eobrun - 1  # this block is part of the run
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("JPEG AC run past end of band")
            blk[_JPEG_ZZ[k]] = _jpeg_extend(rd.bits(s), s) << al
            k += 1
        return 0

    def ac_refine_block(rd, ac_t, blk, ss, se, al, eobrun) -> int:
        p1, m1 = 1 << al, -(1 << al)
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = huff_decode(rd, ac_t)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += rd.bits(r)
                        break  # rest of band handled by the EOB walk below
                    s_val = 0  # ZRL: skip 16 zero-history positions
                else:
                    if s != 1:
                        raise ValueError("bad AC refinement symbol")
                    s_val = p1 if rd.bit() else m1
                while k <= se:
                    z = _JPEG_ZZ[k]
                    if blk[z] != 0:
                        correction(rd, blk, z, p1, m1)
                    else:
                        if r == 0:
                            if s_val:
                                blk[z] = s_val
                            k += 1
                            break
                        r -= 1
                    k += 1
        if eobrun > 0:
            while k <= se:
                z = _JPEG_ZZ[k]
                if blk[z] != 0:
                    correction(rd, blk, z, p1, m1)
                k += 1
            eobrun -= 1
        return eobrun

    while pos + 2 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at offset {pos}")
        m = buf[pos + 1]
        if m == 0xD9:
            break
        if pos + 4 > len(buf):
            raise ValueError("JPEG segment header truncated")
        (ln,) = struct.unpack(">H", buf[pos + 2 : pos + 4])
        if ln < 2 or pos + 2 + ln > len(buf):
            raise ValueError(f"JPEG segment 0x{m:02x} length {ln} overruns buffer")
        data = buf[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if m == 0xDB:
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables unsupported")
                tbl = np.zeros(64, dtype=np.float64)
                for k in range(64):
                    tbl[_JPEG_ZZ[k]] = data[i + 1 + k]
                qts[tq] = tbl
                i += 65
        elif m == 0xC4:
            i = 0
            while i < len(data):
                tc, th = data[i] >> 4, data[i] & 15
                counts = list(data[i + 1 : i + 17])
                n = sum(counts)
                huffs[(tc, th)] = _jpeg_decode_table(counts, list(data[i + 17 : i + 17 + n]))
                i += 17 + n
        elif m == 0xC2:
            prec, hh, ww, nc = data[0], *struct.unpack(">HH", data[1:5]), data[5]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} unsupported")
            comps = []
            for c in range(nc):
                cid, samp, tq = data[6 + 3 * c : 9 + 3 * c]
                hi, vi = samp >> 4, samp & 15
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(f"JPEG sampling factors {hi}x{vi} unsupported")
                comps.append((cid, hi, vi, tq))
            sof = (ww, hh, comps)
            # per-component geometry (T.81 A.1.1/A.2.4): coefficients are
            # stored on the MCU-PADDED grid (interleaved DC scans cover
            # it), while NON-interleaved scans iterate only the
            # component's TRUE block grid derived from its own dimensions
            hmax = max(hi for _c, hi, _v, _t in comps)
            vmax = max(vi for _c, _h, vi, _t in comps)
            mcux = (ww + 8 * hmax - 1) // (8 * hmax)
            mcuy = (hh + 8 * vmax - 1) // (8 * vmax)
            geom = {}
            for cid, hi, vi, _tq in comps:
                bw_pad, bh_pad = mcux * hi, mcuy * vi
                compw = (ww * hi + hmax - 1) // hmax
                comph = (hh * vi + vmax - 1) // vmax
                geom[cid] = (bw_pad, bh_pad, (compw + 7) // 8, (comph + 7) // 8)
            coef = {
                cid: np.zeros((geom[cid][0] * geom[cid][1], 64), dtype=np.int64)
                for cid, _h, _v, _t in comps
            }
        elif m == 0xDD:  # DRI: restart interval in MCUs (0 = disabled)
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif m == 0xDA:
            if sof is None or coef is None:
                raise ValueError("JPEG SOS before SOF2")
            ns = data[0]
            scan_comps = [(data[1 + 2 * c], data[2 + 2 * c]) for c in range(ns)]
            ss, se, aa = data[1 + 2 * ns], data[2 + 2 * ns], data[3 + 2 * ns]
            ah, al = aa >> 4, aa & 15
            if (ss == 0) != (se == 0) or se > 63 or ss > 63:
                # T.81 G.1.1.1: a progressive DC scan is exactly Ss=Se=0;
                # catches SOF0 streams mislabeled as SOF2
                raise ValueError(f"invalid progressive spectral range {ss}-{se}")
            # unstuff this scan's entropy bytes; RST0-7 split the scan
            # into byte-aligned restart segments; stop at any other marker
            segs: list[bytes] = []
            ent = bytearray()
            i = pos
            while i < len(buf):
                b0 = buf[i]
                if b0 == 0xFF:
                    if i + 1 >= len(buf):
                        raise ValueError("JPEG entropy stream truncated at 0xFF")
                    nxt = buf[i + 1]
                    if nxt == 0x00:
                        ent.append(0xFF)
                        i += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        segs.append(bytes(ent))
                        ent = bytearray()
                        i += 2
                        continue
                    break  # next marker (another SOS/DHT/EOI)
                ent.append(b0)
                i += 1
            pos = i
            segs.append(bytes(ent))
            if len(segs) > 1 and not restart_interval:
                raise ValueError("JPEG RST markers present without a DRI interval")
            seg_iter = iter(segs)
            rd = _JpegBitReader(next(seg_iter))

            def next_segment():
                try:
                    return _JpegBitReader(next(seg_iter))
                except StopIteration:
                    raise ValueError("JPEG restart segment missing") from None
            meta = {cid: (hi, vi) for cid, hi, vi, _tq in sof[2]}

            def scan_units(interleaved_comps):
                """Restart-unit (MCU) groups of (cid, block-index): one
                MCU's Hi x Vi blocks per component when interleaved, one
                true-grid block when non-interleaved (T.81 A.2.4 — a
                non-interleaved MCU is a single block)."""
                if len(interleaved_comps) > 1:
                    for my in range(mcuy):
                        for mx in range(mcux):
                            unit = []
                            for cid, _tsel in interleaved_comps:
                                hi, vi = meta[cid]
                                bw_pad = geom[cid][0]
                                for v in range(vi):
                                    for hh2 in range(hi):
                                        unit.append((cid, (my * vi + v) * bw_pad + mx * hi + hh2))
                            yield unit
                else:
                    (cid, _tsel) = interleaved_comps[0]
                    bw_pad, _bh, bw_true, bh_true = geom[cid]
                    for by in range(bh_true):
                        for bx in range(bw_true):
                            yield [(cid, by * bw_pad + bx)]
            if ss == 0:
                if ah == 0:
                    preds = {cid: 0 for cid, _t in scan_comps}
                    tsel_of = dict(scan_comps)
                    for ui, unit in enumerate(scan_units(scan_comps)):
                        if restart_interval and ui and ui % restart_interval == 0:
                            rd = next_segment()  # byte-aligned; predictors reset
                            preds = {cid: 0 for cid, _t in scan_comps}
                        for cid, bi in unit:
                            dc_t = huffs.get((0, tsel_of[cid] >> 4))
                            if dc_t is None:
                                raise ValueError("JPEG scan references missing DC table")
                            t = huff_decode(rd, dc_t)
                            preds[cid] += _jpeg_extend(rd.bits(t), t) if t else 0
                            coef[cid][bi][0] = preds[cid] << al
                else:
                    for ui, unit in enumerate(scan_units(scan_comps)):
                        if restart_interval and ui and ui % restart_interval == 0:
                            rd = next_segment()
                        for cid, bi in unit:
                            if rd.bit():
                                coef[cid][bi][0] |= 1 << al
            else:
                if ns != 1:
                    raise ValueError("progressive AC scan must be single-component")
                cid, tsel = scan_comps[0]
                ac_t = huffs.get((1, tsel & 15))
                if ac_t is None:
                    raise ValueError("JPEG scan references missing AC table")
                blocks = coef[cid]
                eobrun = 0
                step = ac_first_block if ah == 0 else ac_refine_block
                for ui, unit in enumerate(scan_units(scan_comps)):
                    if restart_interval and ui and ui % restart_interval == 0:
                        rd = next_segment()  # entropy state reset incl. EOBRUN
                        eobrun = 0
                    for _cid, bi in unit:
                        eobrun = step(rd, ac_t, blocks[bi], ss, se, al, eobrun)
        # else: APPn/COM — skip
    if sof is None or coef is None:
        raise ValueError("JPEG missing SOF2 scan data")
    w, h, comps = sof
    cmat = _jpeg_dct_matrix()
    planes = []
    for cid, hi, vi, tq in comps:
        qt = qts.get(tq)
        if qt is None:
            raise ValueError("JPEG component references missing quant table")
        bw_pad, bh_pad, _bw_t, _bh_t = geom[cid]
        plane = np.zeros((bh_pad * 8, bw_pad * 8), dtype=np.float64)
        for bi in range(bw_pad * bh_pad):
            by, bx = divmod(bi, bw_pad)
            block = (coef[cid][bi].astype(np.float64) * qt).reshape(8, 8)
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = cmat.T @ block @ cmat + 128.0
        if vi < vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        if hi < hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        planes.append(plane)
    planes = [np.clip(np.rint(p[:h, :w]), 0, 255) for p in planes]
    if len(planes) == 1:
        y = planes[0].astype(np.uint8)
        rgb = np.repeat(y[:, :, None], 3, axis=2)
    elif len(planes) == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
    else:
        raise NotImplementedError(f"JPEG with {len(planes)} components unsupported")
    return w, h, rgb.tobytes()


def multimodal_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode through the production mapInPandas path:
    per document a 4:4:4 SOF0 JPEG is encoded with FLAT quant tables and
    constant-per-8x8-block gray pixels (block value analytic in doc_id:
    v(bi) = (fill + 17*bi) % 256), so DC-only blocks survive the lossy
    transform EXACTLY (DC quantizer 1; all ACs zero; gray pixels keep
    Cb=Cr=128) — the full marker/Huffman/dequant/IDCT/color pipeline runs
    and the features come from the RECONSTRUCTED pixels, which the
    oracle recomputes analytically from doc_id.  Odd doc_ids encode
    4:2:0 CHROMA-SUBSAMPLED (r8: the shape virtually every real JPEG
    uses — 16x16 MCUs, 4 luma + 2 half-resolution chroma blocks), which
    is lossless on gray fixtures (chroma constant 128), so BOTH sampling
    paths are driver-checked against the same analytic oracle."""
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
                w = 8 * (1 + int(doc_id) % 3)
                h = 8 * (1 + int(doc_id) % 2)
                fill = 16 + int(doc_id) % 200
                bw = w // 8
                rgb = bytes(
                    v
                    for y in range(h)
                    for x in range(w)
                    for v in ((fill + 17 * ((y // 8) * bw + x // 8)) % 256,) * 3
                )
                enc = encode_jpeg_420 if int(doc_id) % 2 else encode_jpeg
                buf = enc(w, h, rgb, quant=(_JPEG_FLAT_QT, _JPEG_FLAT_QT))
                got_w, got_h, rec = decode_jpeg(buf)
                if (got_w, got_h, rec) != (w, h, rgb):
                    raise ValueError(f"JPEG round-trip failed for doc {doc_id}")
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


MULTIMODAL_JPEG_SQL = """
WITH px AS (
  SELECT d.doc_id,
         CAST(8 * (1 + d.doc_id % 3) AS BIGINT) AS w,
         CAST(8 * (1 + d.doc_id % 2) AS BIGINT) AS h,
         CAST(16 + d.doc_id % 200 AS BIGINT) AS fill
  FROM documents d WHERE d.text IS NOT NULL
), sums AS (
  SELECT doc_id, w, h,
         3 * 64 * SUM((fill + 17 * b.i) % 256) AS total
  FROM px,
       UNNEST(range(0, (w // 8) * (h // 8))) AS b(i)
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


def multimodal_progressive_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL progressive-JPEG decode through the production mapInPandas
    path: per document the same analytic gray image as
    ``multimodal_jpeg_features`` (constant-per-8x8-block pixels, flat
    quant) is encoded as a 9-scan SOF2 stream — spectral selection plus
    successive approximation, so the decoder's DC first/refine and AC
    EOBn machinery all run — and the features come from the
    RECONSTRUCTED pixels, which the oracle recomputes analytically.
    Odd doc_ids additionally encode progressive 4:2:0 (lossless on the
    gray fixture), so both sampling geometries of the progressive path
    are driver-checked.  The progressive-vs-baseline bit-identity on
    NON-trivial coefficient patterns (random/gradient images, AC
    refinement correction bits, subsampled dummy-block geometry) is
    pinned in tests/test_multimodal.py; this query proves the decode
    path end-to-end through Spark."""
    d = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    rows.append((int(doc_id), None, None, None, None))
                    continue
                w = 8 * (1 + int(doc_id) % 3)
                h = 8 * (1 + int(doc_id) % 2)
                fill = 16 + int(doc_id) % 200
                bw = w // 8
                rgb = bytes(
                    v
                    for y in range(h)
                    for x in range(w)
                    for v in ((fill + 17 * ((y // 8) * bw + x // 8)) % 256,) * 3
                )
                sub = "420" if int(doc_id) % 2 else "444"
                buf = encode_progressive_jpeg(
                    w, h, rgb, quant=(_JPEG_FLAT_QT, _JPEG_FLAT_QT), subsampling=sub
                )
                got_w, got_h, rec = decode_jpeg(buf)
                if (got_w, got_h, rec) != (w, h, rgb):
                    raise ValueError(f"progressive JPEG round-trip failed for doc {doc_id}")
                total = sum(rec)
                rows.append(
                    (
                        int(doc_id),
                        buf.count(b"\xff\xda"),
                        got_w * got_h * 3,
                        int(total % (1 << 31)),
                        float(total) / len(rec),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_scans", "n_pixel_bytes", "checksum", "mean_val"],
            ).astype(
                {
                    "doc_id": "int64",
                    "n_scans": "Int32",
                    "n_pixel_bytes": "Int64",
                    "checksum": "Int64",
                    "mean_val": "float64",
                }
            )

    schema = "doc_id long, n_scans int, n_pixel_bytes long, checksum long, mean_val double"
    return d.mapInPandas(run, schema=schema)


MULTIMODAL_PROG_JPEG_SQL = """
WITH px AS (
  SELECT d.doc_id,
         CAST(8 * (1 + d.doc_id % 3) AS BIGINT) AS w,
         CAST(8 * (1 + d.doc_id % 2) AS BIGINT) AS h,
         CAST(16 + d.doc_id % 200 AS BIGINT) AS fill
  FROM documents d WHERE d.text IS NOT NULL
), sums AS (
  SELECT doc_id, w, h,
         3 * 64 * SUM((fill + 17 * b.i) % 256) AS total
  FROM px,
       UNNEST(range(0, (w // 8) * (h // 8))) AS b(i)
  GROUP BY 1, 2, 3
)
SELECT d.doc_id,
       CAST(CASE WHEN s.doc_id IS NULL THEN NULL ELSE 9 END AS INTEGER) AS n_scans,
       CAST(s.w * s.h * 3 AS BIGINT) AS n_pixel_bytes,
       CAST(s.total % 2147483648 AS BIGINT) AS checksum,
       CAST(s.total AS DOUBLE) / (s.w * s.h * 3) AS mean_val
FROM documents d LEFT JOIN sums s ON s.doc_id = d.doc_id
"""


def demux_mjpeg(buf: bytes) -> list[bytes]:
    """Split a motion-JPEG stream (concatenated JPEG images — the actual
    wire format of MJPG-fourcc AVI video streams) into individual JPEG
    frames by a REAL marker walk: length-prefixed segments are skipped
    by their declared length, entropy-coded scan data is scanned
    honoring 0xFF00 byte stuffing and RST0-7 restart markers, and a
    frame ends at its own EOI.  A naive split on the FFD9 byte pair
    would mis-split whenever a quant/Huffman table happens to contain
    that pair; the marker walk cannot."""
    frames: list[bytes] = []
    pos, n = 0, len(buf)
    while pos < n:
        if buf[pos : pos + 2] != b"\xff\xd8":
            raise ValueError(f"MJPEG: expected SOI at offset {pos}")
        start = pos
        pos += 2
        in_scan = False
        while True:
            if in_scan:
                nxt = buf.find(b"\xff", pos)
                if nxt < 0 or nxt + 1 >= n:
                    raise ValueError("MJPEG: truncated scan data")
                m = buf[nxt + 1]
                if m == 0x00 or 0xD0 <= m <= 0xD7:
                    pos = nxt + 2  # stuffed byte / restart marker
                    continue
                in_scan, pos = False, nxt
                continue
            if pos + 1 >= n:
                raise ValueError("MJPEG: truncated frame (no EOI)")
            if buf[pos] != 0xFF:
                raise ValueError(f"MJPEG: expected marker at offset {pos}")
            m = buf[pos + 1]
            if m == 0xFF:  # optional fill byte before a marker
                pos += 1
                continue
            pos += 2
            if m == 0xD9:  # EOI: frame complete
                frames.append(buf[start:pos])
                break
            if m == 0x01 or 0xD0 <= m <= 0xD8:
                continue  # standalone markers carry no length
            if pos + 2 > n:
                raise ValueError("MJPEG: truncated segment header")
            seg_len = int.from_bytes(buf[pos : pos + 2], "big")
            if seg_len < 2 or pos + seg_len > n:
                raise ValueError("MJPEG: bad segment length")
            pos += seg_len
            if m == 0xDA:  # SOS header consumed; entropy data follows
                in_scan = True
    return frames


def _mjpeg_fixture_jpegs(doc: int) -> tuple[list, int, int]:
    """The SHARED analytic video fixture of ``multimodal_mjpeg_scene_cuts``
    and ``multimodal_avi_scene_cuts`` (and their SQL oracles): 4-6
    constant-fill JPEG frames alternating baseline 4:4:4 and 4:2:0
    encodings, whose fill jumps by an analytic amount at an analytic cut
    index.  One definition — the two queries and two oracles cannot
    drift apart on the fixture constants.  Returns (jpegs, w, h)."""
    n_frames = 4 + doc % 3
    w = 8 * (1 + doc % 3)
    h = 8 * (1 + doc % 2)
    base = 20 + doc % 40
    jump = 50 + doc % 18
    cut_idx = 2 + doc % 2
    jpegs = []
    for i in range(n_frames):
        fill = base + (jump if i >= cut_idx else 0)
        rgb = bytes([fill]) * (w * h * 3)
        enc = encode_jpeg_420 if (doc + i) % 2 else encode_jpeg
        jpegs.append(enc(w, h, rgb, quant=(_JPEG_FLAT_QT, _JPEG_FLAT_QT)))
    return jpegs, w, h


def _scene_cut_stats(frames: list) -> tuple[list, float, int]:
    """Consecutive-frame mean-abs-pixel-delta thresholding + the
    one-representative-frame-per-scene checksum, shared by both video
    scene-cut queries.  Returns (cut indices, max delta, checksum)."""
    cuts, max_delta = [], 0.0
    for i in range(1, len(frames)):
        a, bb = frames[i - 1], frames[i]
        delta = sum(abs(x - y) for x, y in zip(a, bb)) / len(a)
        max_delta = max(max_delta, delta)
        if delta > _CUT_THRESHOLD:
            cuts.append(i)
    checksum = int(sum(sum(frames[i]) for i in [0] + cuts) % (1 << 31))
    return cuts, max_delta, checksum


def multimodal_mjpeg_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MJPEG video scene-cut detection: per document a motion-JPEG
    stream of 4-6 constant-gray JPEG frames (flat quant tables keep
    DC-only blocks exact, so reconstruction is analytic in doc_id) whose
    fill jumps at an analytic cut point; frames alternate baseline 4:4:4
    and 4:2:0 encodings WITHIN one stream, so the demuxer walks mixed
    frame geometries.  ``demux_mjpeg`` splits by marker walk,
    ``decode_jpeg`` reconstructs each frame, and consecutive-frame
    mean-absolute-pixel-delta thresholding finds the cut — the
    shot-boundary primitive of video curation, now over the codec real
    MJPEG files use (vs the PPM analog in ``multimodal_scene_cuts``).
    scene_checksum sums one representative (first) frame per detected
    scene.  Parity target: the multimodal mandate of SURVEY §2.5 /
    BASELINE.json; reference repo has no media path (its 6 files are
    Kafka/Postgres glue), so this is north-star surface."""
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
                doc = int(doc_id)
                jpegs, w, h = _mjpeg_fixture_jpegs(doc)
                stream = b"".join(jpegs)
                frames = []
                for fb in demux_mjpeg(stream):
                    got_w, got_h, rec = decode_jpeg(fb)
                    if (got_w, got_h) != (w, h):
                        raise ValueError(f"MJPEG frame size mismatch for doc {doc}")
                    frames.append(rec)
                cuts, max_delta, checksum = _scene_cut_stats(frames)
                rows.append(
                    (
                        doc,
                        len(frames),
                        len(cuts),
                        cuts[0] if cuts else None,
                        max_delta,
                        checksum,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_frames",
                    "n_cuts",
                    "first_cut",
                    "max_delta",
                    "scene_checksum",
                ],
            ).astype(
                {
                    "doc_id": "int64",
                    "n_frames": "Int32",
                    "n_cuts": "Int64",
                    "first_cut": "Int64",
                    "max_delta": "float64",
                    "scene_checksum": "Int64",
                }
            )

    return d.mapInPandas(
        run,
        schema=(
            "doc_id long, n_frames int, n_cuts long, first_cut long, "
            "max_delta double, scene_checksum long"
        ),
    )


def multimodal_avi_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL AVI video scene-cut detection — the container upgrade of
    ``multimodal_mjpeg_scene_cuts``: per document the same analytic
    mixed-4:4:4/4:2:0 JPEG frames are muxed into a spec-correct RIFF-AVI
    file (``llm_ops/avi.py``: hdrl/avih/strl/strh/strf headers, movi
    ``00dc`` chunks with word alignment, validated idx1 index), then
    demuxed by the real container walk instead of the elementary-stream
    marker walk.  The header metadata (width/height from avih, fps from
    strh dwRate/dwScale, total_frames) is emitted alongside the cut
    analysis, and the demuxer cross-checks it against the decoded
    frames, so a header/payload disagreement fails loudly.

    The container is genuinely AUDIO+VIDEO: a second ``auds`` stream
    (G.711 mu-law, ``01wb`` chunks interleaved one slice per frame)
    carries 40 + doc%25 analytic companded samples; the demuxer
    reassembles them, the shared G.711 tables expand them, and the query
    emits the audio sample count plus the expanded-amplitude checksum —
    per-row AV demux + audio decode + video decode in one pass.  Parity
    target: the multimodal mandate of SURVEY §2.5 / BASELINE.json; the
    reference repo has no media path — north-star surface."""
    from realtime_change_data_capture_streaming_spark.llm_ops.avi import (
        demux_avi_mjpeg,
        encode_avi_mjpeg,
    )

    d = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "doc_id",
            "n_frames",
            "width",
            "height",
            "fps",
            "n_cuts",
            "first_cut",
            "scene_checksum",
            "audio_n_samples",
            "audio_checksum",
        ]
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    rows.append((int(doc_id),) + (None,) * 9)
                    continue
                doc = int(doc_id)
                jpegs, w, h = _mjpeg_fixture_jpegs(doc)
                fps = 24 + doc % 8
                abytes = bytes((doc * 13 + i * 11) % 256 for i in range(40 + doc % 25))
                meta, frames_b = demux_avi_mjpeg(
                    encode_avi_mjpeg(jpegs, w, h, fps, audio=(abytes, 8000), audio_format=7)
                )
                if meta["total_frames"] != len(frames_b):
                    raise ValueError(f"AVI header/movi frame count mismatch for doc {doc}")
                frames = []
                for fb in frames_b:
                    got_w, got_h, rec = decode_jpeg(fb)
                    if (got_w, got_h) != (meta["width"], meta["height"]):
                        raise ValueError(f"AVI header/frame size mismatch for doc {doc}")
                    frames.append(rec)
                cuts, _max_delta, checksum = _scene_cut_stats(frames)
                aud = meta["audio"]
                if aud["format"] != 7:
                    raise ValueError(f"AVI audio format mismatch for doc {doc}")
                samples = [_G711_ULAW[b] for b in aud["data"]]
                rows.append(
                    (
                        doc,
                        len(frames),
                        meta["width"],
                        meta["height"],
                        meta["fps"],
                        len(cuts),
                        cuts[0] if cuts else None,
                        checksum,
                        len(samples),
                        sum(samples),
                    )
                )
            yield pd.DataFrame(rows, columns=cols).astype(
                {
                    "doc_id": "int64",
                    "n_frames": "Int32",
                    "width": "Int32",
                    "height": "Int32",
                    "fps": "Int32",
                    "n_cuts": "Int64",
                    "first_cut": "Int64",
                    "scene_checksum": "Int64",
                    "audio_n_samples": "Int32",
                    "audio_checksum": "Int64",
                }
            )

    return d.mapInPandas(
        run,
        schema=(
            "doc_id long, n_frames int, width int, height int, fps int, "
            "n_cuts long, first_cut long, scene_checksum long, "
            "audio_n_samples int, audio_checksum long"
        ),
    )


# the G.711 mu-law expansion inlined as a 256-row mapping so the audio
# checksum replays in DuckDB (the table is spec-normative, not data)
_G711_ULAW_SQL_ROWS = ", ".join(f"({c}, {v})" for c, v in enumerate(_G711_ULAW))

MULTIMODAL_AVI_CUTS_SQL = f"""
WITH g711(code, v) AS (VALUES {_G711_ULAW_SQL_ROWS})
SELECT doc_id,
       CASE WHEN text IS NOT NULL THEN CAST(4 + doc_id % 3 AS INTEGER) END AS n_frames,
       CASE WHEN text IS NOT NULL THEN CAST(8 * (1 + doc_id % 3) AS INTEGER) END AS width,
       CASE WHEN text IS NOT NULL THEN CAST(8 * (1 + doc_id % 2) AS INTEGER) END AS height,
       CASE WHEN text IS NOT NULL THEN CAST(24 + doc_id % 8 AS INTEGER) END AS fps,
       CASE WHEN text IS NOT NULL THEN CAST(1 AS BIGINT) END AS n_cuts,
       CASE WHEN text IS NOT NULL THEN CAST(2 + doc_id % 2 AS BIGINT) END AS first_cut,
       CASE WHEN text IS NOT NULL THEN CAST(
           (2 * (20 + doc_id % 40) + (50 + doc_id % 18))
           * (8 * (1 + doc_id % 3)) * (8 * (1 + doc_id % 2)) * 3
           AS BIGINT) END AS scene_checksum,
       CASE WHEN text IS NOT NULL THEN CAST(40 + doc_id % 25 AS INTEGER) END AS audio_n_samples,
       CASE WHEN text IS NOT NULL THEN CAST(
           (SELECT SUM(m.v)
            FROM range(0, 65) AS g(i)
            JOIN g711 m ON m.code = (documents.doc_id * 13 + g.i * 11) % 256
            WHERE g.i < 40 + documents.doc_id % 25)
           AS BIGINT) END AS audio_checksum
FROM documents
"""


MULTIMODAL_MJPEG_CUTS_SQL = """
SELECT doc_id,
       CASE WHEN text IS NOT NULL THEN CAST(4 + doc_id % 3 AS INTEGER) END AS n_frames,
       CASE WHEN text IS NOT NULL THEN CAST(1 AS BIGINT) END AS n_cuts,
       CASE WHEN text IS NOT NULL THEN CAST(2 + doc_id % 2 AS BIGINT) END AS first_cut,
       CASE WHEN text IS NOT NULL THEN CAST(50 + doc_id % 18 AS DOUBLE) END AS max_delta,
       CASE WHEN text IS NOT NULL THEN CAST(
           (2 * (20 + doc_id % 40) + (50 + doc_id % 18))
           * (8 * (1 + doc_id % 3)) * (8 * (1 + doc_id % 2)) * 3
           AS BIGINT) END AS scene_checksum
FROM documents
"""


QUERIES = {
    "multimodal_metadata": multimodal_metadata,
    "multimodal_audio_features": multimodal_audio_features,
    "multimodal_features": multimodal_features,
    "multimodal_png_features": multimodal_png_features,
    "multimodal_gif_features": multimodal_gif_features,
    "multimodal_jpeg_features": multimodal_jpeg_features,
    "multimodal_progressive_jpeg_features": multimodal_progressive_jpeg_features,
    "multimodal_features_meta": multimodal_features_meta,
    "multimodal_resize": multimodal_resize,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_scene_cuts": multimodal_scene_cuts,
    "multimodal_mjpeg_scene_cuts": multimodal_mjpeg_scene_cuts,
    "multimodal_avi_scene_cuts": multimodal_avi_scene_cuts,
}

ORACLE = {
    "multimodal_metadata": MULTIMODAL_META_SQL,
    "multimodal_audio_features": MULTIMODAL_AUDIO_SQL,
    "multimodal_features": MULTIMODAL_FEATURES_SQL,
    "multimodal_png_features": MULTIMODAL_PNG_SQL,
    "multimodal_gif_features": MULTIMODAL_GIF_SQL,
    "multimodal_jpeg_features": MULTIMODAL_JPEG_SQL,
    "multimodal_progressive_jpeg_features": MULTIMODAL_PROG_JPEG_SQL,
    "multimodal_features_meta": MULTIMODAL_FEATURES_META_SQL,
    "multimodal_resize": MULTIMODAL_RESIZE_SQL,
    "multimodal_frame_sample": MULTIMODAL_FRAMES_SQL,
    "multimodal_scene_cuts": MULTIMODAL_CUTS_SQL,
    "multimodal_mjpeg_scene_cuts": MULTIMODAL_MJPEG_CUTS_SQL,
    "multimodal_avi_scene_cuts": MULTIMODAL_AVI_CUTS_SQL,
}
