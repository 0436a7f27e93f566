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


def _adpcm_payload(n_samples=2000, align=36):
    """A mono IMA-ADPCM block stream with a deterministic waveform."""
    from realtime_change_data_capture_streaming_spark.llm_ops.adpcm import encode_ima_blocks

    sig = [((i * 37) % 1024 - 512) * 17 for i in range(n_samples)]
    return encode_ima_blocks([sig], align), align


def test_avi_adpcm_audio_roundtrip():
    """IMA-ADPCM auds stream (r11): mux -> demux recovers the exact block
    stream, the WAVEFORMATEX metadata, and decode_avi_audio's samples
    equal decoding the payload directly — the mux/demux layer is
    transparent to the codec."""
    from realtime_change_data_capture_streaming_spark.llm_ops.adpcm import decode_ima_blocks
    from realtime_change_data_capture_streaming_spark.llm_ops.avi import decode_avi_audio

    frames = _frames(4)
    data, align = _adpcm_payload()
    avi = encode_avi_mjpeg(
        frames, 16, 8, fps=25, audio=(data, 8000), audio_format=0x11, audio_block_align=align
    )
    meta, got = demux_avi_mjpeg(avi)
    assert got == frames
    aud = meta["audio"]
    assert aud["format"] == 0x11
    assert aud["bits"] == 4
    assert aud["block_align"] == align
    assert aud["rate"] == 8000
    assert aud["data"] == data
    assert decode_avi_audio(meta) == decode_ima_blocks(data, 1, align)[0]


def test_avi_adpcm_chunks_hold_whole_blocks():
    """Every 01wb chunk must contain whole ADPCM blocks (each block's
    header seeds its decode); verify against the raw movi layout."""
    frames = _frames(3)
    data, align = _adpcm_payload(n_samples=1500, align=36)
    avi = encode_avi_mjpeg(
        frames, 16, 8, audio=(data, 8000), audio_format=0x11, audio_block_align=align
    )
    # scan the movi region only — idx1 entries also begin with '01wb'
    movi_end = avi.find(b"idx1")
    pos, sizes = 0, []
    while True:
        pos = avi.find(b"01wb", pos)
        if pos < 0 or pos >= movi_end:
            break
        sizes.append(struct.unpack_from("<I", avi, pos + 4)[0])
        pos += 8
    assert sizes and all(s % align == 0 for s in sizes)


def test_avi_adpcm_split_block_rejected():
    """A chunk whose size splits a block is undecodable audio: the
    demuxer must raise, not emit garbage samples."""
    frames = _frames(2)
    # a structurally VALID container whose audio chunks are byte-sliced
    # (the G.711 path slices anywhere), then patch the strf to claim
    # IMA ADPCM with a 36-byte block align: the walk and idx1 stay
    # consistent, but no chunk holds whole blocks
    payload = bytes(range(77)) * 3  # 231 bytes: slices of 116/115
    avi = bytearray(
        encode_avi_mjpeg(frames, 16, 8, audio=(payload, 8000), audio_format=7)
    )
    sig = struct.pack("<HHI", 7, 1, 8000)
    pos = avi.find(sig)
    assert pos > 0
    struct.pack_into("<H", avi, pos, 0x11)  # wFormatTag
    struct.pack_into("<H", avi, pos + 12, 36)  # nBlockAlign
    struct.pack_into("<H", avi, pos + 14, 4)  # wBitsPerSample
    with pytest.raises(ValueError, match="splits a block"):
        demux_avi_mjpeg(bytes(avi))


def test_avi_adpcm_encoder_guards():
    """Missing/invalid block align and partial-block payloads are caught
    at mux time."""
    frames = _frames(2)
    data, align = _adpcm_payload(n_samples=200, align=36)
    with pytest.raises(ValueError, match="audio_block_align"):
        encode_avi_mjpeg(frames, 16, 8, audio=(data, 8000), audio_format=0x11)
    with pytest.raises(ValueError, match="whole blocks"):
        encode_avi_mjpeg(
            frames, 16, 8, audio=(data + b"\x00", 8000), audio_format=0x11,
            audio_block_align=align,
        )
    # ADPCM params must not be validated when NO audio stream was
    # requested: audio=None + audio_format=0x11 is a harmless call (the
    # format tag is ignored without audio) and must mux a video-only AVI.
    out = encode_avi_mjpeg(frames, 16, 8, audio=None, audio_format=0x11)
    assert out[:4] == b"RIFF" and out[8:12] == b"AVI "


def test_avi_adpcm_wrong_bits_rejected():
    """A strf declaring non-4-bit ADPCM is nonconformant; the demuxer
    refuses it."""
    frames = _frames(2)
    data, align = _adpcm_payload(n_samples=200, align=36)
    avi = bytearray(
        encode_avi_mjpeg(
            frames, 16, 8, audio=(data, 8000), audio_format=0x11, audio_block_align=align
        )
    )
    # the audio strf: 18+2 bytes starting after its chunk header; find it
    # by the tag+channels+rate prefix
    sig = struct.pack("<HHI", 0x11, 1, 8000)
    pos = avi.find(sig)
    assert pos > 0
    # wBitsPerSample sits at offset 14 within WAVEFORMATEX
    struct.pack_into("<H", avi, pos + 14, 8)
    with pytest.raises(ValueError, match="bits 8 != 4"):
        demux_avi_mjpeg(bytes(avi))


def test_avi_decode_audio_g711_and_pcm_paths():
    """decode_avi_audio is the single expansion entry point: G.711 and
    8-bit PCM routes match the published tables / centering rule."""
    from realtime_change_data_capture_streaming_spark.llm_ops.avi import decode_avi_audio
    from realtime_change_data_capture_streaming_spark.llm_ops.multimodal import _G711_ULAW

    frames = _frames(2)
    payload = bytes(range(256))
    meta, _ = demux_avi_mjpeg(
        encode_avi_mjpeg(frames, 16, 8, audio=(payload, 8000), audio_format=7)
    )
    assert decode_avi_audio(meta) == [_G711_ULAW[b] for b in payload]
    meta, _ = demux_avi_mjpeg(
        encode_avi_mjpeg(frames, 16, 8, audio=(payload, 8000), audio_format=1)
    )
    assert decode_avi_audio(meta) == [(b - 128) << 8 for b in payload]
