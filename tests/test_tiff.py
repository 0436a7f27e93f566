"""Pins for the dependency-free baseline TIFF codec (`llm_ops/tiff.py`):
round-trip exactness over the full config matrix, the hand-simulated
TIFF-LZW code-sequence vector (the early-change width rule), PackBits
vectors from the published algorithm, and clean ValueErrors on every
malformed-container class the parser guards."""

from __future__ import annotations

import itertools
import struct

import pytest

from realtime_change_data_capture_streaming_spark.llm_ops.tiff import (
    _BitWriterMSB,
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
    tiff_lzw_decode,
    tiff_lzw_encode,
)


def _pixels(w, h, spp, fill=17):
    return bytes(
        (fill + 3 * x + 7 * y + 11 * c) % 256
        for y in range(h)
        for x in range(w)
        for c in range(spp)
    )


def test_roundtrip_full_matrix():
    """compression x photometric x byte order x strip height (+ the
    predictor-2 LZW path): decode(encode(px)) == px everywhere,
    including the short last strip."""
    for comp, spp, be, rps in itertools.product(
        (1, 5, 32773), (1, 3), (False, True), (1, 3, 7)
    ):
        w, h = 13, 7
        px = _pixels(w, h, spp)
        for pred in (1, 2) if comp == 5 else (1,):
            buf = encode_tiff(w, h, px, spp, comp, be, rps, pred)
            assert decode_tiff(buf) == (w, h, spp, px), (comp, spp, be, rps, pred)


def test_lzw_hand_simulated_code_sequence():
    """TIFF 6.0 §13 hand simulation for 07 07 07 08 08 07 07 06 06:
    emits CLEAR, 7, 258(=0707), 8, 8, 258, 6, 6, EOI — all 9-bit,
    MSB-first packed.  A wrong add/emit order or a GIF-style LSB packer
    breaks the byte compare."""
    data = bytes([7, 7, 7, 8, 8, 7, 7, 6, 6])
    w = _BitWriterMSB()
    for c in (256, 7, 258, 8, 8, 258, 6, 6, 257):
        w.write(c, 9)
    assert tiff_lzw_encode(data) == w.flush()
    assert tiff_lzw_decode(tiff_lzw_encode(data), len(data)) == data


def test_lzw_width_transitions_and_reset():
    """Incompressible data pushes the table through the 10/11/12-bit
    widths and past the 4094 reset; compressible data must actually
    compress.  Round-trip passes only if encoder and decoder agree on
    the early-change timing (encoder at next==2^w-1, decoder one add
    behind at 2^w-2)."""
    import hashlib

    data = b"".join(
        hashlib.md5(bytes([i % 251, (i * 7) % 241])).digest() for i in range(4000)
    )
    enc = tiff_lzw_encode(data)
    assert tiff_lzw_decode(enc, len(data)) == data
    rep = b"abcabcabc" * 3000
    enc2 = tiff_lzw_encode(rep)
    assert tiff_lzw_decode(enc2, len(rep)) == rep
    assert len(enc2) < len(rep) // 3


def test_lzw_kwkwk_case():
    """code == next-free (the KwKwK pattern, e.g. 'aaaa...') decodes via
    prev + prev[0]."""
    data = b"a" * 50
    assert tiff_lzw_decode(tiff_lzw_encode(data), 50) == data


def test_packbits_published_semantics():
    # repeat run: 300 zeros -> two capped repeat runs + literal tail
    pb = packbits_encode(b"\x00" * 300 + b"abc")
    assert packbits_decode(pb, 303) == b"\x00" * 300 + b"abc"
    # -128 header is a no-op
    assert packbits_decode(b"\x80\x00a", 1) == b"a"
    # literal overrun raises
    with pytest.raises(ValueError, match="literal overruns"):
        packbits_decode(b"\x05ab", 6)


def test_malformed_containers_raise():
    w, h, spp = 9, 4, 3
    good = bytearray(encode_tiff(w, h, _pixels(w, h, spp), spp, 5, False, 2))
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX" + bytes(good[2:]))
    bad_magic = bytearray(good)
    struct.pack_into("<H", bad_magic, 2, 41)
    with pytest.raises(ValueError, match="magic"):
        decode_tiff(bytes(bad_magic))
    # truncation mid-strip
    with pytest.raises(ValueError):
        decode_tiff(bytes(good[: len(good) // 2]))
    # unknown compression: patch the IFD SHORT for tag 259
    ifd = struct.unpack_from("<I", good, 4)[0]
    n = struct.unpack_from("<H", good, ifd)[0]
    for i in range(n):
        tag = struct.unpack_from("<H", good, ifd + 2 + 12 * i)[0]
        if tag == 259:
            struct.pack_into("<H", good, ifd + 2 + 12 * i + 8, 99)
    with pytest.raises(ValueError, match="compression 99"):
        decode_tiff(bytes(good))


def test_lies_about_geometry_raise():
    """A strip count that disagrees with height/RowsPerStrip, and a
    strip whose decompressed size mismatches, both fail loudly."""
    w, h, spp = 8, 6, 1
    buf = bytearray(encode_tiff(w, h, _pixels(w, h, spp), spp, 32773, False, 2))
    ifd = struct.unpack_from("<I", buf, 4)[0]
    n = struct.unpack_from("<H", buf, ifd)[0]
    for i in range(n):
        off = ifd + 2 + 12 * i
        tag = struct.unpack_from("<H", buf, off)[0]
        if tag == 278:  # RowsPerStrip 2 -> 3: geometry now wants 2 strips, file has 3
            struct.pack_into("<I", buf, off + 8, 3)
    with pytest.raises(ValueError, match="strips but geometry"):
        decode_tiff(bytes(buf))


def test_zero_rows_per_strip_raises_value_error():
    """RowsPerStrip=0 (and zero width/height) must fail with the module's
    documented ValueError, not ZeroDivisionError from the strip-count
    ceil-div."""
    w, h, spp = 8, 6, 1
    good = encode_tiff(w, h, _pixels(w, h, spp), spp, 1, False, 1)

    def patch_short_or_long(buf, want_tag, val):
        buf = bytearray(buf)
        ifd = struct.unpack_from("<I", buf, 4)[0]
        n = struct.unpack_from("<H", buf, ifd)[0]
        for i in range(n):
            off = ifd + 2 + 12 * i
            tag, typ = struct.unpack_from("<HH", buf, off)
            if tag == want_tag:
                struct.pack_into("<H" if typ == 3 else "<I", buf, off + 8, val)
        return bytes(buf)

    with pytest.raises(ValueError, match="RowsPerStrip"):
        decode_tiff(patch_short_or_long(good, 278, 0))
    with pytest.raises(ValueError, match="degenerate geometry"):
        decode_tiff(patch_short_or_long(good, 256, 0))
    with pytest.raises(ValueError, match="degenerate geometry"):
        decode_tiff(patch_short_or_long(good, 257, 0))


def test_decode_image_batch_routes_tiff():
    """The shared image router recognizes both TIFF byte orders and
    returns features over the decoded samples."""
    import pandas as pd

    from realtime_change_data_capture_streaming_spark.llm_ops.multimodal import decode_image_batch

    w, h = 6, 5
    px = _pixels(w, h, 3)
    t_le = encode_tiff(w, h, px, 3, 5, big_endian=False)
    t_be = encode_tiff(w, h, px, 3, 32773, big_endian=True)
    out = decode_image_batch(pd.Series([t_le, t_be, None]))
    assert list(out.iloc[0][:3]) == [w, h, w * h * 3]
    assert list(out.iloc[1][:3]) == [w, h, w * h * 3]
    assert out.iloc[0]["checksum"] == out.iloc[1]["checksum"] == sum(px) % (1 << 31)
    assert out.iloc[2].isna().all()
