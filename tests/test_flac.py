"""FLAC codec unit tests: round-trip properties across every subframe
family / channel assignment / residual form, hand-checked coding
vectors, and clean failures on malformed streams.  The driver's oracle
row (`multimodal_flac_features`) covers the Spark path."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from realtime_change_data_capture_streaming_spark.llm_ops.flac import (
    _Reader,
    _Writer,
    _crc8,
    _crc16,
    _rice_read,
    _rice_write,
    _utf8_decode,
    _utf8_encode,
    decode_flac,
    encode_flac,
)


def _noise(n, lo=-2000, hi=2000, seed=0):
    rnd = random.Random(seed)
    return [rnd.randrange(lo, hi) for _ in range(n)]


def test_crc_check_vectors():
    # published check vectors for FLAC's two CRCs ("123456789")
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_utf8_frame_number_coding():
    # standard UTF-8 code points encode identically...
    assert _utf8_encode(0x24) == b"\x24"
    assert _utf8_encode(0xA2) == b"\xc2\xa2"
    assert _utf8_encode(0x20AC) == b"\xe2\x82\xac"
    assert _utf8_encode(0x10348) == b"\xf0\x90\x8d\x88"
    # ...and the extension reaches 36 bits (7-byte form, 0xFE lead)
    assert _utf8_encode(2**36 - 1)[0] == 0xFE
    for v in (0, 127, 128, 2047, 2048, 65535, 2**21, 2**26, 2**31, 2**36 - 1):
        assert _utf8_decode(_Reader(_utf8_encode(v))) == v, v
    with pytest.raises(ValueError, match="36 bits"):
        _utf8_encode(2**36)


def test_rice_coding_roundtrip_and_bit_shape():
    for param in (0, 1, 4, 10):
        vals = _noise(200, -500, 500, seed=param)
        bw = _Writer()
        _rice_write(bw, vals, param)
        assert _rice_read(_Reader(bw.finish()), len(vals), param) == vals
    # zigzag order: 0, -1, 1, -2, 2 ... (0->0, -1->1, 1->2, -2->3)
    bw = _Writer()
    _rice_write(bw, [0], 0)
    assert bw.finish() == b"\x80"  # unary 0 = single 1 bit


def test_roundtrip_every_subframe_family():
    ramp = [((3 * i * i + 5 * i) % 4000) - 2000 for i in range(300)]
    for kind, kw in (
        ("constant", {}),
        ("verbatim", {}),
        ("fixed", {"fixed_order": 0}),
        ("fixed", {"fixed_order": 1}),
        ("fixed", {"fixed_order": 2}),
        ("fixed", {"fixed_order": 3}),
        ("fixed", {"fixed_order": 4}),
        ("lpc", {"lpc_coefs": [3, -3, 1], "lpc_shift": 1}),
        ("lpc", {"lpc_coefs": [2, -1], "lpc_shift": 0}),
    ):
        chan = [[7] * 300] if kind == "constant" else [ramp]
        buf = encode_flac(chan, subframe=kind, **kw)
        assert decode_flac(buf)[3] == chan, (kind, kw)


def test_roundtrip_every_channel_assignment():
    L, R = _noise(512, seed=1), _noise(512, seed=2)
    for st_ in ("independent", "left_side", "right_side", "mid_side"):
        buf = encode_flac([L, R], subframe="fixed", fixed_order=1, stereo=st_)
        rate, nch, bps, ch = decode_flac(buf)
        assert (rate, nch, bps) == (44100, 2, 16)
        assert ch == [L, R], st_


def test_roundtrip_residual_forms_and_wasted_bits():
    x = _noise(512, seed=3)
    for po in (0, 1, 2, 4):
        buf = encode_flac([x], subframe="fixed", fixed_order=2, partition_order=po)
        assert decode_flac(buf)[3] == [x], po
    buf = encode_flac(
        [_noise(512, -30000, 30000, seed=4)], subframe="fixed", fixed_order=2, rice2=True
    )
    assert decode_flac(buf)[3][0] == _noise(512, -30000, 30000, seed=4)
    shifted = [v * 8 for v in _noise(256, -200, 200, seed=5)]
    buf = encode_flac([shifted], subframe="fixed", fixed_order=1, wasted=3)
    assert decode_flac(buf)[3] == [shifted]
    buf = encode_flac([x[:256]], subframe="fixed", fixed_order=2, escape_bps=15)
    assert decode_flac(buf)[3] == [x[:256]]


def test_short_last_frame_and_many_frames():
    x = _noise(777, seed=6)  # 777 = 6*128 + 9: short last frame
    buf = encode_flac([x], blocksize=128, subframe="fixed", fixed_order=3)
    assert decode_flac(buf)[3] == [x]


def test_malformed_streams_raise_value_error():
    good = encode_flac([_noise(256, seed=7)], subframe="fixed", fixed_order=2)
    with pytest.raises(ValueError, match="marker"):
        decode_flac(b"fLaX" + good[4:])
    with pytest.raises(ValueError):
        decode_flac(good[:30])
    # corrupt one frame-body byte: CRC-16 must catch it
    bad = bytearray(good)
    bad[-10] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))
    # corrupt a frame-header byte: CRC-8 must catch it
    frame_at = 4 + 4 + 34  # fLaC + block header + STREAMINFO
    bad = bytearray(good)
    bad[frame_at + 3] ^= 0x02
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))


def test_unknown_total_samples_decodes_to_eof():
    """STREAMINFO total_samples == 0 means 'unknown length' (streamed /
    live encodes), NOT 'no samples': the decoder must walk frames until
    the stream ends rather than returning empty audio."""
    x = _noise(300, seed=8)
    good = encode_flac([x], blocksize=128, subframe="fixed", fixed_order=2)
    bad = bytearray(good)
    # the 36-bit total field spans bits 108..143 of the STREAMINFO body
    # (body starts at byte 8: fLaC + 4-byte block header)
    bad[8 + 13] &= 0xF0
    bad[8 + 14 : 8 + 18] = b"\x00\x00\x00\x00"
    rate, nch, bps, ch = decode_flac(bytes(bad))
    assert ch == [x]


def test_frame_rate_code_validated_against_streaminfo():
    """A frame header carrying an explicit sample-rate code must agree
    with STREAMINFO; a contradiction is corruption, not a preference."""
    good = encode_flac([_noise(256, seed=9)], subframe="fixed", fixed_order=2)
    frame_at = 4 + 4 + 34
    # encoder layout: sync(2) + bs/sr byte + ch/ss byte + utf8 frame#(1,
    # frame 0) + 8-bit blocksize-1 (bs_code 6) -> CRC-8 at frame_at + 6
    hdr_end = frame_at + 6

    def with_sr_code(code):
        b = bytearray(good)
        b[frame_at + 2] = (b[frame_at + 2] & 0xF0) | code
        b[hdr_end] = _crc8(bytes(b[frame_at:hdr_end]))
        # the frame CRC-16 (last 2 bytes of the single frame) covers the
        # header too — recompute it over the patched bytes
        b[-2:] = _crc16(bytes(b[frame_at:-2])).to_bytes(2, "big")
        return bytes(b)

    # code 9 = 44100 Hz: MATCHES the STREAMINFO default -> decodes fine
    assert decode_flac(with_sr_code(9))[3] == decode_flac(good)[3]
    # code 10 = 48000 Hz: contradicts STREAMINFO -> loud failure
    with pytest.raises(ValueError, match="contradicts"):
        decode_flac(with_sr_code(10))


def test_escape_residual_out_of_range_is_loud():
    """Raw escape residuals are escape_bps-bit two's complement; values
    outside that range would silently truncate into a CRC-valid stream
    that decodes to the WRONG samples — the encoder must refuse."""
    x = _noise(256, seed=10)  # fixed(2) residuals far exceed 4 bits
    with pytest.raises(ValueError, match="escape_bps range"):
        encode_flac([x], subframe="fixed", fixed_order=2, escape_bps=4)
    # in-range escape still round-trips (pinned above at escape_bps=15)
    flat = [5] * 256  # fixed(2) residuals are 0 after warm-up
    buf = encode_flac(flat_ch := [flat], subframe="fixed", fixed_order=2, escape_bps=3)
    assert decode_flac(buf)[3] == flat_ch


@given(
    n=st.integers(1, 600),
    seed=st.integers(0, 10_000),
    variant=st.integers(0, 6),
)
@settings(max_examples=50, deadline=None)
def test_roundtrip_property(n, seed, variant):
    """Any length x content x encoder configuration: lossless."""
    rnd = random.Random(seed)
    x = [rnd.randrange(-2000, 2000) for _ in range(n)]
    opts = (
        {"subframe": "verbatim"},
        {"subframe": "fixed", "fixed_order": min(rnd.randrange(5), n)},
        {"subframe": "lpc", "lpc_coefs": [3, -3, 1][: max(1, min(3, n))], "lpc_shift": rnd.randrange(3)},
        {"subframe": "fixed", "fixed_order": min(2, n), "rice2": True},
        {"subframe": "fixed", "fixed_order": min(1, n), "stereo": "mid_side"},
        {"subframe": "verbatim", "stereo": "left_side"},
        {"subframe": "fixed", "fixed_order": min(2, n), "escape_bps": 15},
    )[variant]
    channels = [x]
    if opts.get("stereo"):
        channels.append([rnd.randrange(-2000, 2000) for _ in range(n)])
    bs = rnd.choice((64, 128, 256))
    buf = encode_flac(channels, blocksize=bs, **opts)
    rate, nch, bps, got = decode_flac(buf)
    assert got == channels


def test_audio_router_dispatches_wav_and_flac():
    from realtime_change_data_capture_streaming_spark.llm_ops.multimodal import _synth_wav, decode_audio

    x = _noise(300, seed=9)
    buf = encode_flac([x], subframe="fixed", fixed_order=2)
    assert decode_audio(buf) == (44100, 1, 16, [x])
    # WAV: 8-bit unsigned on the wire folds to signed samples
    rate, nch, bits, ch = decode_audio(_synth_wav(3))
    assert (rate, nch, bits) == (8000, 1, 8)
    assert ch[0][:3] == [(3 * 31 + i * 7) % 256 - 128 for i in range(3)]
    with pytest.raises(NotImplementedError, match="magic"):
        decode_audio(b"ID3\x04junkjunkjunk")
