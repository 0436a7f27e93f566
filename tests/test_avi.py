"""Pins for the AVI (RIFF) container mux/demux: round-trip exactness,
header metadata, both idx1 offset conventions, rec-list interleave,
word alignment, and clean ValueErrors on every malformed-container
class the walker guards."""

from __future__ import annotations

import struct

import pytest

from realtime_change_data_capture_streaming_spark.llm_ops.avi import (
    demux_avi_mjpeg,
    encode_avi_mjpeg,
)
from realtime_change_data_capture_streaming_spark.llm_ops.multimodal import (
    _JPEG_FLAT_QT,
    encode_jpeg,
    encode_jpeg_420,
)


def _frames(n=4, w=16, h=8):
    out = []
    for i in range(n):
        rgb = bytes([30 + 7 * i]) * (w * h * 3)
        enc = encode_jpeg_420 if i % 2 else encode_jpeg
        out.append(enc(w, h, rgb, quant=(_JPEG_FLAT_QT, _JPEG_FLAT_QT)))
    return out


def test_avi_roundtrip_exact():
    frames = _frames(5)
    meta, got = demux_avi_mjpeg(encode_avi_mjpeg(frames, 16, 8, fps=30))
    assert got == frames
    assert (meta["width"], meta["height"]) == (16, 8)
    assert meta["fps"] == 30
    assert meta["total_frames"] == 5
    assert meta["n_streams"] == 1


def test_avi_odd_sized_frame_word_alignment():
    """A frame of odd byte length forces the pad byte; the declared
    chunk size must exclude it and the walk must skip it."""
    frames = _frames(3)
    # JPEG comment segment (COM, 0xFFFE) lets us force odd total length
    # without touching decodability
    f0 = frames[0]
    if len(f0) % 2 == 0:
        com = b"\xff\xfe" + struct.pack(">H", 3) + b"x"
        f0 = f0[:2] + com + f0[2:]
    assert len(f0) % 2 == 1
    frames[0] = f0
    _, got = demux_avi_mjpeg(encode_avi_mjpeg(frames, 16, 8))
    assert got == frames


def test_avi_idx1_absolute_offsets_accepted():
    """Real muxers often write absolute file offsets in idx1; the
    demuxer detects the convention from the first entry."""
    buf = bytearray(encode_avi_mjpeg(_frames(3), 16, 8))
    idx_pos = buf.find(b"idx1")
    movi_pos = buf.find(b"movi")
    n_entries = struct.unpack("<I", buf[idx_pos + 4 : idx_pos + 8])[0] // 16
    for i in range(n_entries):
        off_at = idx_pos + 8 + 16 * i + 8
        rel = struct.unpack("<I", buf[off_at : off_at + 4])[0]
        buf[off_at : off_at + 4] = struct.pack("<I", rel + movi_pos)
    _, got = demux_avi_mjpeg(bytes(buf))
    assert len(got) == 3


def test_avi_rec_list_interleave():
    """##dc chunks grouped under a 'rec ' LIST (the interleave shape)
    are flattened in order."""
    frames = _frames(2)
    base = encode_avi_mjpeg(frames, 16, 8)
    # rebuild the movi list with the chunks wrapped in one rec list
    movi_pos = base.find(b"LIST", 12)
    # simpler: construct manually
    def chunk(cc, payload):
        out = cc + struct.pack("<I", len(payload)) + payload
        return out + (b"\x00" if len(payload) % 2 else b"")

    hdrl_start = base.find(b"LIST")
    hdrl_size = struct.unpack("<I", base[hdrl_start + 4 : hdrl_start + 8])[0]
    hdrl = base[hdrl_start : hdrl_start + 8 + hdrl_size + (hdrl_size % 2)]
    rec = chunk(b"LIST", b"rec " + b"".join(chunk(b"00dc", f) for f in frames))
    movi = chunk(b"LIST", b"movi" + rec)
    riff = chunk(b"RIFF", b"AVI " + hdrl + movi)  # no idx1: optional
    _, got = demux_avi_mjpeg(riff)
    assert got == frames


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda b: b"JUNK" + b[4:], "not a RIFF"),
        (lambda b: b[:8] + b"WAVE" + b[12:], "not 'AVI '"),
        (lambda b: b[:4] + struct.pack("<I", len(b) + 99) + b[8:], "overruns"),
    ],
)
def test_avi_malformed_container_raises(mutate, msg):
    buf = encode_avi_mjpeg(_frames(2), 16, 8)
    with pytest.raises(ValueError, match=msg):
        demux_avi_mjpeg(mutate(buf))


def test_avi_idx1_lying_length_raises():
    buf = bytearray(encode_avi_mjpeg(_frames(2), 16, 8))
    idx_pos = buf.find(b"idx1")
    len_at = idx_pos + 8 + 12  # first entry's dwChunkLength
    buf[len_at : len_at + 4] = struct.pack(
        "<I", struct.unpack("<I", buf[len_at : len_at + 4])[0] + 1
    )
    with pytest.raises(ValueError, match="idx1 entry disagrees"):
        demux_avi_mjpeg(bytes(buf))


def test_avi_non_jpeg_frame_raises():
    frames = _frames(2)
    with pytest.raises(ValueError, match="not a JPEG"):
        encode_avi_mjpeg([b"\x00\x01garbage"], 16, 8)
    buf = bytearray(encode_avi_mjpeg(frames, 16, 8))
    first = buf.find(b"00dc", buf.find(b"movi"))
    buf[first + 8 : first + 10] = b"\x00\x00"  # clobber the SOI
    with pytest.raises(ValueError, match="does not start with SOI"):
        demux_avi_mjpeg(bytes(buf))


def test_avi_non_mjpg_stream_raises():
    buf = bytearray(encode_avi_mjpeg(_frames(2), 16, 8))
    strh = buf.find(b"strh")
    buf[strh + 12 : strh + 16] = b"H264"  # fccHandler
    with pytest.raises(ValueError, match="not MJPG"):
        demux_avi_mjpeg(bytes(buf))


def test_avi_strf_compression_checked():
    buf = bytearray(encode_avi_mjpeg(_frames(2), 16, 8))
    strf = buf.find(b"strf")
    buf[strf + 8 + 16 : strf + 8 + 20] = b"DIB "  # biCompression
    with pytest.raises(ValueError, match="BITMAPINFOHEADER is not MJPG"):
        demux_avi_mjpeg(bytes(buf))


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(1, 6),
    wi=st.integers(1, 3),
    hi=st.integers(1, 2),
    fps=st.integers(1, 60),
    fills=st.lists(st.integers(0, 255), min_size=6, max_size=6),
    use_420=st.booleans(),
)
def test_avi_roundtrip_property(n, wi, hi, fps, fills, use_420):
    """Mux/demux is exact for arbitrary frame counts, geometries, frame
    rates, and frame contents (both JPEG encoders)."""
    w, h = 8 * wi, 8 * hi
    frames = []
    for i in range(n):
        rgb = bytes([fills[i]]) * (w * h * 3)
        enc = encode_jpeg_420 if use_420 else encode_jpeg
        frames.append(enc(w, h, rgb, quant=(_JPEG_FLAT_QT, _JPEG_FLAT_QT)))
    meta, got = demux_avi_mjpeg(encode_avi_mjpeg(frames, w, h, fps))
    assert got == frames
    assert (meta["width"], meta["height"], meta["fps"], meta["total_frames"]) == (
        w,
        h,
        fps,
        n,
    )


def test_avi_audio_stream_roundtrip():
    """A second auds stream: PCM bytes interleave as 01wb chunks (one
    slice per frame), idx1 covers BOTH chunk kinds, and the demuxer
    reassembles the exact audio with its header metadata."""
    frames = _frames(4)
    pcm = bytes((i * 7) % 256 for i in range(1001))  # non-divisible length
    buf = encode_avi_mjpeg(frames, 16, 8, fps=25, audio=(pcm, 8000))
    meta, got = demux_avi_mjpeg(buf)
    assert got == frames
    assert meta["n_streams"] == 2
    a = meta["audio"]
    assert (a["format"], a["channels"], a["rate"], a["bits"]) == (1, 1, 8000, 8)
    assert a["data"] == pcm


def test_avi_g711_audio_stream():
    """G.711 mu-law audio in the container: format tag 7 survives the
    header round-trip and the payload expands through the same tables
    the WAV path uses."""
    from realtime_change_data_capture_streaming_spark.llm_ops.multimodal import _G711_ULAW

    frames = _frames(2)
    ulaw = bytes([0x00, 0x7F, 0x80, 0xFF, 0x12, 0xA3])
    meta, _ = demux_avi_mjpeg(encode_avi_mjpeg(frames, 16, 8, audio=(ulaw, 8000), audio_format=7))
    a = meta["audio"]
    assert a["format"] == 7 and a["data"] == ulaw
    assert [_G711_ULAW[b] for b in a["data"]] == [_G711_ULAW[b] for b in ulaw]
    with pytest.raises(ValueError, match="unsupported audio format"):
        encode_avi_mjpeg(frames, 16, 8, audio=(ulaw, 8000), audio_format=85)


def test_avi_idx1_audio_entry_lie_raises():
    buf = bytearray(encode_avi_mjpeg(_frames(2), 16, 8, audio=(b"\x01" * 64, 8000)))
    idx_pos = buf.find(b"idx1")
    n = struct.unpack("<I", buf[idx_pos + 4 : idx_pos + 8])[0] // 16
    for i in range(n):
        at = idx_pos + 8 + 16 * i
        if buf[at : at + 4].endswith(b"wb"):
            ln_at = at + 12
            buf[ln_at : ln_at + 4] = struct.pack(
                "<I", struct.unpack("<I", buf[ln_at : ln_at + 4])[0] + 1
            )
            break
    with pytest.raises(ValueError, match="idx1 audio entry disagrees"):
        demux_avi_mjpeg(bytes(buf))
