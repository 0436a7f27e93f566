"""Pins for the IMA/DVI (fmt 0x11) and Microsoft (fmt 0x02) ADPCM WAV
codecs (`llm_ops/adpcm.py`): hand-computed quantizer vectors (the codecs
are lossy, so known-answer math — not bit-roundtrip — is the correctness
anchor), block-header exactness, constant-signal exactness, bounded
reconstruction error on smooth signals, fact-chunk truncation, the
decode_audio dispatch, and hostile-input hardening."""

from __future__ import annotations

import math
import random

import pytest

from realtime_change_data_capture_streaming_spark.llm_ops.adpcm import (
    decode_ima_blocks,
    decode_ms_blocks,
    decode_wav_adpcm,
    encode_wav_adpcm,
    peek_wav_format_tag,
)
from realtime_change_data_capture_streaming_spark.llm_ops.multimodal import decode_audio


def test_ima_hand_computed_vector():
    """Nibbles [3, 8, 7, 15, 0, 0, 0, 0] from pred=0/index=0, stepped by
    hand through the IMA tables (step 7 -> index walk 0,0,8,16,15,14,13,12)."""
    block = bytes([0, 0, 0, 0,  # pred=0 (int16), index=0, reserved
                   0x83, 0xF7, 0x00, 0x00])  # low nibble first
    (ch,) = decode_ima_blocks(block, 1, 8)
    assert ch == [0, 4, 4, 15, -15, -11, -8, -5, -2]


def test_ms_hand_computed_vector():
    """Coef pair 1 = (512,-256), delta=100, seeds s1=50/s2=25, nibbles
    (2, -1): predicted 75 -> 275, adapted delta 89, predicted 500 -> 411."""
    block = bytes([1]) + (100).to_bytes(2, "little", signed=True) \
        + (50).to_bytes(2, "little", signed=True) + (25).to_bytes(2, "little", signed=True) \
        + bytes([0x2F])
    (ch,) = decode_ms_blocks(block, 1, 8)
    assert ch == [25, 50, 275, 411]


@pytest.mark.parametrize("fmt", [0x11, 0x02])
@pytest.mark.parametrize("n_ch", [1, 2])
def test_smooth_signal_reconstruction_bounded(fmt, n_ch):
    chans = [[int(8000 * math.sin(i / 30 + c)) for i in range(1234)] for c in range(n_ch)]
    wav = encode_wav_adpcm(chans, 16000, fmt)
    rate, nc, bits, back = decode_audio(wav)
    assert (rate, nc, bits) == (16000, n_ch, 16)
    assert [len(b) for b in back] == [1234] * n_ch  # fact-chunk truncation
    for orig, dec in zip(chans, back):
        assert max(abs(a - b) for a, b in zip(orig, dec)) < 1200
    # block-header samples are verbatim PCM
    if fmt == 0x11:
        assert all(b[0] == c[0] for b, c in zip(back, chans))
    else:
        assert all(b[:2] == c[:2] for b, c in zip(back, chans))


def test_constant_signal_exact():
    chans = [[1000] * 500]
    for fmt in (0x11, 0x02):
        _, _, _, back = decode_wav_adpcm(encode_wav_adpcm(chans, 8000, fmt))
        assert back[0] == chans[0], hex(fmt)


def test_stereo_channels_stay_distinct():
    chans = [[2500] * 300, [-7000] * 300]
    for fmt in (0x11, 0x02):
        _, _, _, back = decode_wav_adpcm(encode_wav_adpcm(chans, 8000, fmt))
        assert back[0] == chans[0] and back[1] == chans[1], hex(fmt)


def test_decode_is_deterministic_and_wav_dispatch_routes():
    rng = random.Random(7)
    chans = [[rng.randrange(-3000, 3000) for _ in range(777)]]
    for fmt in (0x11, 0x02):
        wav = encode_wav_adpcm(chans, 22050, fmt)
        assert peek_wav_format_tag(wav) == fmt
        a = decode_audio(wav)
        b = decode_audio(wav)
        assert a == b
        assert a[2] == 16 and len(a[3][0]) == 777


def test_noise_tracks_signal_loosely():
    """White noise is ADPCM's worst case; the decoded signal must still
    correlate strongly with the input (catches nibble-order mistakes,
    which decode to near-uncorrelated output)."""
    rng = random.Random(11)
    sig = [rng.randrange(-8000, 8000) for _ in range(2000)]
    for fmt in (0x11, 0x02):
        _, _, _, (back,) = decode_wav_adpcm(encode_wav_adpcm([sig], 8000, fmt))
        n = len(sig)
        dot = sum(a * b for a, b in zip(sig, back))
        na = math.sqrt(sum(a * a for a in sig))
        nb = math.sqrt(sum(b * b for b in back))
        assert dot / (na * nb) > 0.7, hex(fmt)


def test_hostile_inputs_raise_valueerror():
    good = encode_wav_adpcm([[100] * 300], 8000, 0x11)
    with pytest.raises(ValueError):
        decode_wav_adpcm(b"JUNK" + good[4:])
    with pytest.raises(ValueError):
        decode_wav_adpcm(good[:-7])  # truncated data chunk
    # IMA step index out of range inside a block
    with pytest.raises(ValueError, match="step index"):
        decode_ima_blocks(bytes([0, 0, 99, 0, 0, 0, 0, 0]), 1, 8)
    # trailing partial block
    with pytest.raises(ValueError, match="partial"):
        decode_ima_blocks(bytes(12), 1, 8)
    # MS predictor index and non-positive delta
    with pytest.raises(ValueError, match="predictor"):
        decode_ms_blocks(bytes([9]) + bytes(7), 1, 8)
    with pytest.raises(ValueError, match="delta"):
        decode_ms_blocks(bytes([0]) + bytes(7), 1, 8)
    # fact chunk that lies upward
    bad = bytearray(good)
    i = bad.find(b"fact")
    bad[i + 8 : i + 12] = (10 ** 6).to_bytes(4, "little")
    with pytest.raises(ValueError, match="fact"):
        decode_wav_adpcm(bytes(bad))
    # a PCM wav routed here is loudly not ADPCM
    from realtime_change_data_capture_streaming_spark.llm_ops.multimodal import _synth_wav

    with pytest.raises(ValueError, match="not an ADPCM"):
        decode_wav_adpcm(_synth_wav(1))


def test_random_corruption_never_hangs_or_crashes():
    rng = random.Random(23)
    wav = bytearray(encode_wav_adpcm([[rng.randrange(-500, 500) for _ in range(400)]], 8000, 0x02))
    for _ in range(200):
        m = bytearray(wav)
        for _ in range(rng.randrange(1, 4)):
            m[rng.randrange(len(m))] ^= 1 << rng.randrange(8)
        try:
            rate, n_ch, bits, ch = decode_wav_adpcm(bytes(m))
            assert bits == 16  # survivors still honor the contract
        except (ValueError, NotImplementedError):
            pass


def test_decode_audio_still_rejects_truly_absent_codecs():
    with pytest.raises(NotImplementedError, match="ADPCM"):
        decode_audio(b"ID3\x04 pretend mp3 payload")


def test_staged_adpcm_query_matches_duckdb_oracle(spark, sf_dir):
    """`multimodal_adpcm_features` (staged for r11 registration — the
    r10 window is frozen) decodes real IMA containers through
    mapInPandas while the oracle replays the quantizer recurrence in a
    recursive CTE; every cell must match exactly."""
    import duckdb

    from realtime_change_data_capture_streaming_spark.llm_ops.adpcm import (
        MULTIMODAL_ADPCM_SQL,
        multimodal_adpcm_features,
    )

    got = (
        multimodal_adpcm_features(spark, sf_dir)
        .toArrow()
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = con.execute(MULTIMODAL_ADPCM_SQL).df().sort_values("doc_id", ignore_index=True)
    con.close()
    assert len(got) == len(want) and list(got.columns) == list(want.columns)
    for c in got.columns:
        a = got[c].astype("float64")
        b = want[c].astype("float64")
        assert ((a == b) | (a.isna() & b.isna())).all(), c
    # the fixture exercises both quantizer regimes: wandering samples
    # AND clamp saturation
    assert got["min_amplitude"].nunique() > 10
    assert (got["min_amplitude"] == -32768).any()
