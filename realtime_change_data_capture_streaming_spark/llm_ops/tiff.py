"""Dependency-free baseline TIFF 6.0 codec + the mapInPandas feature
query over it — the scanned-document archival format of the multimodal
tier (SURVEY §2.5 north-star surface; the reference repo at
/root/reference has no media code, per SURVEY §6).

Scope (everything else raises loudly): both byte orders (II little /
MM big), 8-bit samples, grayscale (PhotometricInterpretation 1) and RGB
(2), chunky planar config, strip organization with any RowsPerStrip,
compressions 1 (none), 32773 (PackBits, TIFF 6.0 §9) and 5 (LZW, TIFF
6.0 §13 with the spec's one-code-EARLY code-width change), and the
horizontal-differencing Predictor 2 (§14).  The LZW width timing is the
classic early-change rule (libtiff's, PDF ``/EarlyChange 1``): the
ENCODER widens when the next entry to assign reaches 2^w - 1 (511,
1023, 2047) and resets at 4094; the DECODER — one table-add behind —
widens when its next free entry reaches 2^w - 2 (510, 1022, 2046).
Both directions are implemented from that shared rule and pinned by a
hand-simulated code-sequence vector plus width-crossing round-trips; a
mismatch in either engine's timing breaks those tests.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

_CLEAR = 256
_EOI = 257


# --------------------------------------------------------------- PackBits


def packbits_encode(data: bytes) -> bytes:
    """TIFF 6.0 §9: literal runs (header n-1 for n bytes) and repeat
    runs (header 1-n as signed, next byte repeated n times), both capped
    at 128; ties prefer extending the current literal (the spec's 'one
    reasonable' greedy)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # measure the repeat run at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 2:
            out.append(257 - run & 0xFF)
            out.append(data[i])
            i = j
            continue
        # literal run: until a >=3 repeat starts (2-byte repeats inside a
        # literal cost the same either way; 3 always wins as a repeat)
        lit = i
        while i < n and i - lit < 128:
            if i + 2 < n and data[i] == data[i + 1] == data[i + 2]:
                break
            i += 1
        out.append(i - lit - 1)
        out.extend(data[lit:i])
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        h = data[i]
        i += 1
        if h == 128:  # -128: no-op
            continue
        if h < 128:  # literal of h+1 bytes
            if i + h + 1 > n:
                raise ValueError("tiff: PackBits literal overruns the strip")
            out.extend(data[i : i + h + 1])
            i += h + 1
        else:  # repeat next byte 257-h times
            if i >= n:
                raise ValueError("tiff: PackBits repeat header at end of strip")
            out.extend(data[i : i + 1] * (257 - h))
            i += 1
    if len(out) != expected:
        raise ValueError(f"tiff: PackBits produced {len(out)} of {expected} bytes")
    return bytes(out)


# -------------------------------------------------------------- TIFF LZW


class _BitWriterMSB:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.out)


def tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF 6.0 §13 LZW with early change (see module docstring)."""
    w = _BitWriterMSB()
    if not data:
        w.write(_CLEAR, 9)
        w.write(_EOI, 9)
        return w.flush()

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(256)}

    table = fresh()
    nxt, width = 258, 9
    w.write(_CLEAR, 9)
    omega = data[:1]
    for i in range(1, len(data)):
        k = data[i : i + 1]
        if omega + k in table:
            omega += k
            continue
        w.write(table[omega], width)
        table[omega + k] = nxt
        nxt += 1
        omega = k
        if nxt in (511, 1023, 2047):  # encoder: widen one code EARLY
            width += 1
        elif nxt == 4094:  # table nearly full: flush + reset
            w.write(table[omega], width)
            w.write(_CLEAR, width)
            table, nxt, width = fresh(), 258, 9
            omega = b""
    if omega:
        w.write(table[omega], width)
    w.write(_EOI, width)
    return w.flush()


def tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """Decoder for the encoder above — the one-add-behind width rule
    (widen at next-free 510/1022/2046)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    nxt, width = 258, 9
    pos = 0  # bit position
    total_bits = len(data) * 8
    prev: bytes | None = None

    def read() -> int:
        nonlocal pos
        if pos + width > total_bits:
            raise ValueError("tiff: LZW stream truncated")
        v = 0
        p = pos
        for _ in range(width):
            v = (v << 1) | ((data[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        pos = p
        return v

    first = read()
    if first != _CLEAR:
        raise ValueError("tiff: LZW stream does not start with ClearCode")
    while True:
        code = read()
        if code == _CLEAR:
            table = table[:258]
            nxt, width, prev = 258, 9, None
            continue
        if code == _EOI:
            break
        if prev is None:
            if code >= 256:
                raise ValueError("tiff: first LZW code after Clear not a literal")
            entry = table[code]
        elif code < nxt:
            entry = table[code]
            table.append(prev + entry[:1])
            nxt += 1
        elif code == nxt:  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
            nxt += 1
        else:
            raise ValueError(f"tiff: LZW code {code} beyond table size {nxt}")
        out.extend(entry)
        if len(out) > expected:
            raise ValueError("tiff: LZW output overruns the strip size")
        prev = entry
        if nxt in (510, 1022, 2046):  # decoder: one table-add behind
            width += 1
    if len(out) != expected:
        raise ValueError(f"tiff: LZW produced {len(out)} of {expected} bytes")
    return bytes(out)


# ----------------------------------------------------------- container


def _predict2_forward(row: bytes, spp: int) -> bytes:
    b = bytearray(row)
    for x in range(len(b) - 1, spp - 1, -1):
        b[x] = (b[x] - b[x - spp]) & 0xFF
    return bytes(b)


def _predict2_inverse(row: bytes, spp: int) -> bytes:
    b = bytearray(row)
    for x in range(spp, len(b)):
        b[x] = (b[x] + b[x - spp]) & 0xFF
    return bytes(b)


def encode_tiff(
    width: int,
    height: int,
    pixels: bytes,
    samples_per_pixel: int = 3,
    compression: int = 1,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
    predictor: int = 1,
) -> bytes:
    """Minimal spec-correct baseline TIFF: header, strip data, any
    out-of-line arrays, one IFD.  Strips are whole rows; predictor 2
    (horizontal differencing) is applied per row before compression and
    is only meaningful (and only accepted) with LZW, matching §14."""
    spp = samples_per_pixel
    if spp not in (1, 3):
        raise ValueError("tiff: samples_per_pixel must be 1 (gray) or 3 (RGB)")
    if len(pixels) != width * height * spp:
        raise ValueError("tiff: pixel buffer does not match width*height*spp")
    if compression not in (1, 5, 32773):
        raise ValueError(f"tiff: unsupported compression {compression}")
    if predictor not in (1, 2) or (predictor == 2 and compression != 5):
        raise ValueError("tiff: predictor 2 is only supported with LZW")
    e = ">" if big_endian else "<"
    rps = rows_per_strip or height
    row_bytes = width * spp
    strips: list[bytes] = []
    for y0 in range(0, height, rps):
        rows = []
        for y in range(y0, min(y0 + rps, height)):
            row = pixels[y * row_bytes : (y + 1) * row_bytes]
            if predictor == 2:
                row = _predict2_forward(row, spp)
            rows.append(row)
        raw = b"".join(rows)
        if compression == 1:
            strips.append(raw)
        elif compression == 32773:
            strips.append(packbits_encode(raw))
        else:
            strips.append(tiff_lzw_encode(raw))

    buf = bytearray()
    buf += (b"MM\x00\x2a" if big_endian else b"II\x2a\x00")
    buf += b"\x00" * 4  # IFD offset patched below
    offsets = []
    for s in strips:
        offsets.append(len(buf))
        buf += s
        if len(buf) % 2:
            buf += b"\x00"  # word-align the next strip/array

    def arr(fmt: str, vals: list[int]) -> int:
        off = len(buf)
        buf.extend(struct.pack(f"{e}{len(vals)}{fmt}", *vals))
        if len(buf) % 2:
            buf.extend(b"\x00")
        return off

    bps_off = arr("H", [8] * spp) if spp > 1 else None
    so_off = arr("I", offsets) if len(offsets) > 1 else None
    sc_off = arr("I", [len(s) for s in strips]) if len(strips) > 1 else None

    entries: list[tuple[int, int, int, int]] = []  # tag, type, count, value

    def short_inline(v: int) -> int:
        # a SHORT value occupies the FIRST two bytes of the value field
        return v << 16 if big_endian else v

    entries.append((256, 4, 1, width))
    entries.append((257, 4, 1, height))
    entries.append(
        (258, 3, spp, bps_off if spp > 1 else short_inline(8))
    )
    entries.append((259, 3, 1, short_inline(compression)))
    entries.append((262, 3, 1, short_inline(1 if spp == 1 else 2)))
    entries.append(
        (273, 4, len(strips), so_off if len(strips) > 1 else offsets[0])
    )
    entries.append((277, 3, 1, short_inline(spp)))
    entries.append((278, 4, 1, rps))
    entries.append(
        (279, 4, len(strips), sc_off if len(strips) > 1 else len(strips[0]))
    )
    if predictor == 2:
        entries.append((317, 3, 1, short_inline(2)))
    entries.sort()  # IFD entries must be tag-ascending per spec

    ifd_off = len(buf)
    buf.extend(struct.pack(f"{e}H", len(entries)))
    for tag, typ, cnt, val in entries:
        buf.extend(struct.pack(f"{e}HHII", tag, typ, cnt, val))
    buf.extend(struct.pack(f"{e}I", 0))
    struct.pack_into(f"{e}I", buf, 4, ifd_off)
    return bytes(buf)


def decode_tiff(buf: bytes) -> tuple[int, int, int, bytes]:
    """Parse + decompress a baseline strip TIFF.  Returns (width,
    height, samples_per_pixel, pixel bytes).  Every structural lie —
    strip counts vs geometry, short strips, codes past the LZW table,
    unknown compression/photometric/bit depth — raises ValueError."""
    if len(buf) < 8 or buf[:2] not in (b"II", b"MM"):
        raise ValueError("tiff: not a TIFF byte-order header")
    e = "<" if buf[:2] == b"II" else ">"
    if struct.unpack_from(f"{e}H", buf, 2)[0] != 42:
        raise ValueError("tiff: magic is not 42")
    ifd = struct.unpack_from(f"{e}I", buf, 4)[0]
    if ifd + 2 > len(buf):
        raise ValueError("tiff: IFD offset overruns the buffer")
    n = struct.unpack_from(f"{e}H", buf, ifd)[0]
    if ifd + 2 + 12 * n + 4 > len(buf):
        raise ValueError("tiff: IFD overruns the buffer")
    _SZ = {3: 2, 4: 4}

    tags: dict[int, list[int]] = {}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(f"{e}HHI", buf, ifd + 2 + 12 * i)
        voff = ifd + 2 + 12 * i + 8
        if typ not in _SZ:
            continue  # types we never wrote (RATIONAL etc.): ignorable
        fmt = "H" if typ == 3 else "I"
        nbytes = _SZ[typ] * cnt
        if nbytes <= 4:
            vals = list(struct.unpack_from(f"{e}{cnt}{fmt}", buf, voff))
        else:
            off = struct.unpack_from(f"{e}I", buf, voff)[0]
            if off + nbytes > len(buf):
                raise ValueError(f"tiff: tag {tag} value overruns the buffer")
            vals = list(struct.unpack_from(f"{e}{cnt}{fmt}", buf, off))
        tags[tag] = vals

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"tiff: required tag {tag} missing")
        return default

    width, height = one(256), one(257)
    if width < 1 or height < 1:
        raise ValueError(f"tiff: degenerate geometry {width}x{height}")
    spp = one(277, 1)
    if spp not in (1, 3):
        raise ValueError(f"tiff: samples_per_pixel {spp} unsupported")
    bps = tags.get(258, [1])
    if bps != [8] * spp and bps != [8]:
        raise ValueError(f"tiff: bits-per-sample {bps} unsupported (8-bit only)")
    comp = one(259, 1)
    if comp not in (1, 5, 32773):
        raise ValueError(f"tiff: compression {comp} unsupported")
    photo = one(262)
    if (photo, spp) not in ((1, 1), (2, 3)):
        raise ValueError(f"tiff: photometric {photo} with spp {spp} unsupported")
    if one(284, 1) != 1:
        raise ValueError("tiff: planar configuration 2 unsupported")
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise ValueError(f"tiff: predictor {predictor} unsupported")
    rps = one(278, height)
    if rps < 1:
        raise ValueError("tiff: RowsPerStrip < 1")
    offs = tags.get(273)
    cnts = tags.get(279)
    if not offs or not cnts or len(offs) != len(cnts):
        raise ValueError("tiff: strip offsets/counts missing or mismatched")
    n_strips = -(-height // rps)
    if len(offs) != n_strips:
        raise ValueError(
            f"tiff: {len(offs)} strips but geometry needs {n_strips}"
        )
    row_bytes = width * spp
    out = bytearray()
    for si, (off, cnt) in enumerate(zip(offs, cnts)):
        if off + cnt > len(buf):
            raise ValueError("tiff: strip overruns the buffer")
        rows_here = min(rps, height - si * rps)
        expected = rows_here * row_bytes
        raw = buf[off : off + cnt]
        if comp == 1:
            if len(raw) != expected:
                raise ValueError("tiff: uncompressed strip size mismatch")
            dec = raw
        elif comp == 32773:
            dec = packbits_decode(raw, expected)
        else:
            dec = tiff_lzw_decode(raw, expected)
        if predictor == 2:
            dec = b"".join(
                _predict2_inverse(dec[r * row_bytes : (r + 1) * row_bytes], spp)
                for r in range(rows_here)
            )
        out.extend(dec)
    return width, height, spp, bytes(out)


# ------------------------------------------------------------ the query


def multimodal_tiff_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL TIFF decode through the production mapInPandas path.  Per
    document an analytic image is encoded with a doc_id-cycled
    configuration so the SIX variants cover every decoder path:
    gray/RGB x none/PackBits/LZW, with LZW-RGB adding Predictor 2,
    byte order alternating II/MM by doc parity and RowsPerStrip cycling
    1-4 (multi-strip + short last strip).  Features come from the
    RECONSTRUCTED pixels (the UDF raises on any round-trip mismatch)
    and the oracle recomputes them analytically from doc_id — one wrong
    byte in any strip/predictor/entropy path breaks the hash.

    Scale shape: per-row encode/decode is embarrassingly parallel
    Arrow-batched work; no shuffle anywhere before the driver-side
    compare."""
    import pandas as pd

    from realtime_change_data_capture_streaming_spark.operators._util import spread
    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    d = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")

    _VARIANTS = (
        (1, 1, 1),
        (32773, 1, 1),
        (5, 1, 1),
        (1, 3, 1),
        (32773, 3, 1),
        (5, 3, 2),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    rows.append((int(doc_id), None, None, None, None, None, None, None))
                    continue
                doc = int(doc_id)
                w, h = 5 + doc % 11, 3 + doc % 6
                fill = 16 + doc % 180
                variant = doc % 6
                comp, spp, pred = _VARIANTS[variant]
                px = bytes(
                    (fill + 3 * x + 7 * y + 11 * c) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(spp)
                )
                buf = encode_tiff(
                    w, h, px, spp, comp,
                    big_endian=bool(doc % 2),
                    rows_per_strip=1 + doc % 4,
                    predictor=pred,
                )
                gw, gh, gs, rec = decode_tiff(buf)
                if (gw, gh, gs, rec) != (w, h, spp, px):
                    raise ValueError(f"tiff round-trip failed for doc {doc}")
                total = sum(rec)
                rows.append(
                    (
                        doc, gw, gh, gs, variant,
                        len(rec),
                        int(total % (1 << 31)),
                        float(total) / len(rec),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "spp", "variant",
                    "n_pixel_bytes", "checksum", "mean_val",
                ],
            ).astype(
                {
                    "doc_id": "int64",
                    "width": "Int32",
                    "height": "Int32",
                    "spp": "Int32",
                    "variant": "Int32",
                    "n_pixel_bytes": "Int64",
                    "checksum": "Int64",
                    "mean_val": "float64",
                }
            )

    return d.mapInPandas(
        run,
        schema=(
            "doc_id long, width int, height int, spp int, variant int, "
            "n_pixel_bytes long, checksum long, mean_val double"
        ),
    )


MULTIMODAL_TIFF_SQL = """
WITH px AS (
  SELECT d.doc_id,
         CAST(5 + d.doc_id % 11 AS BIGINT) AS w,
         CAST(3 + d.doc_id % 6 AS BIGINT) AS h,
         CAST(16 + d.doc_id % 180 AS BIGINT) AS fill,
         CAST(d.doc_id % 6 AS BIGINT) AS variant,
         CASE WHEN d.doc_id % 6 < 3 THEN 1 ELSE 3 END AS spp
  FROM documents d WHERE d.text IS NOT NULL
), sums AS (
  SELECT p.doc_id, p.w, p.h, p.variant, p.spp,
         SUM(CASE WHEN p.spp = 1 THEN (p.fill + 3*x.i + 7*y.i) % 256
             ELSE (p.fill + 3*x.i + 7*y.i) % 256
                + (p.fill + 3*x.i + 7*y.i + 11) % 256
                + (p.fill + 3*x.i + 7*y.i + 22) % 256 END) AS total
  FROM px p,
       UNNEST(range(0, p.w)) AS x(i),
       UNNEST(range(0, p.h)) AS y(i)
  GROUP BY 1, 2, 3, 4, 5
)
SELECT d.doc_id,
       CAST(s.w AS INTEGER) AS width,
       CAST(s.h AS INTEGER) AS height,
       CAST(s.spp AS INTEGER) AS spp,
       CAST(s.variant AS INTEGER) AS variant,
       CAST(s.w * s.h * s.spp AS BIGINT) AS n_pixel_bytes,
       CAST(s.total % 2147483648 AS BIGINT) AS checksum,
       CAST(s.total AS DOUBLE) / (s.w * s.h * s.spp) AS mean_val
FROM documents d LEFT JOIN sums s ON s.doc_id = d.doc_id
"""

QUERIES = {"multimodal_tiff_features": multimodal_tiff_features}
ORACLE = {"multimodal_tiff_features": MULTIMODAL_TIFF_SQL}
