"""VP8L (WebP-lossless) codec unit tests: round-trip properties across
every transform/entropy path, bitstream-structure assertions, transform
edge semantics, and clean failures on malformed input.  The driver's
oracle row (`multimodal_webp_lossless_features`) covers the Spark path."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from realtime_change_data_capture_streaming_spark.llm_ops.webp import (
    _DIST_MAP,
    _BitReader,
    _BitWriter,
    _canon_codes,
    _huff_lengths,
    decode_webp_lossless,
    encode_webp_lossless,
)


def _grad(w: int, h: int) -> bytes:
    return bytes(
        (3 * x + 7 * y + 11 * c) % 256 for y in range(h) for x in range(w) for c in range(3)
    )


def _noise(w: int, h: int, seed: int) -> bytes:
    return bytes(random.Random(seed).randrange(256) for _ in range(w * h * 3))


def test_bit_io_lsb_first():
    bw = _BitWriter()
    bw.bits(0b101, 3)
    bw.bits(0x2F, 8)
    bw.code(0b110, 3)  # prefix codes go MSB-first
    data = bw.finish()
    rd = _BitReader(data)
    assert rd.bits(3) == 0b101
    assert rd.bits(8) == 0x2F
    assert (rd.bit(), rd.bit(), rd.bit()) == (1, 1, 0)
    with pytest.raises(ValueError, match="truncated"):
        rd.bits(8)


def test_canonical_codes_are_prefix_free_and_deflate_ordered():
    lengths = {5: 2, 9: 2, 1: 3, 7: 3, 2: 1}
    codes = _canon_codes(lengths)
    assert codes[2] == (0b0, 1)  # shortest first
    assert codes[5] == (0b10, 2) and codes[9] == (0b11, 2)
    assert codes[1] == (0b110, 3) or codes[1][1] == 3
    vals = sorted((ln, c) for c, ln in codes.values())
    assert len(set(vals)) == len(vals)
    # depth-limited build: skewed freqs still fit in the cap
    freqs = {i: 1 << i for i in range(12)}
    capped = _huff_lengths(freqs, 7)
    assert max(capped.values()) <= 7 and len(capped) == 12


def test_distance_map_matches_spec_prefix():
    # first rows of the published table, written out by hand
    assert _DIST_MAP[:22] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2),
    ]
    assert len(_DIST_MAP) == 120
    assert _DIST_MAP[34:40] == [(0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0)]


def test_roundtrip_every_transform_and_entropy_path():
    cases = [
        ({}, "plain"),
        ({"cache_bits": 6}, "cache"),
        ({"cache_bits": 4, "lz77": False}, "cache only"),
        ({"transforms": ("subtract_green",)}, "subtract green"),
        ({"transforms": ("predictor",)}, "predictor"),
        ({"transforms": ("color",)}, "color"),
        ({"transforms": ("color", "subtract_green", "predictor")}, "stacked"),
        ({"meta_bits": 2, "cache_bits": 5}, "meta groups"),
    ]
    for w, h in ((1, 1), (7, 5), (16, 10), (13, 1), (1, 9)):
        for img in (_grad(w, h), _noise(w, h, w * 100 + h)):
            for opts, tag in cases:
                buf = encode_webp_lossless(w, h, img, **opts)
                assert decode_webp_lossless(buf) == (w, h, img), (tag, w, h)


def test_roundtrip_palette_all_bundle_widths():
    rnd = random.Random(3)
    for ncol in (2, 3, 4, 5, 16, 17, 200):
        cols = [bytes(rnd.randrange(256) for _ in range(3)) for _ in range(ncol)]
        w, h = 17, 6
        img = b"".join(cols[(x + 2 * y) % ncol] for y in range(h) for x in range(w))
        buf = encode_webp_lossless(w, h, img, transforms=("palette",))
        assert decode_webp_lossless(buf) == (w, h, img), ncol
    # >256 distinct colors cannot be paletted
    big = bytes((i % 256, i // 256, 0)[c] for i in range(400) for c in range(3))
    with pytest.raises(ValueError, match="256"):
        encode_webp_lossless(400, 1, big, transforms=("palette",))


def test_roundtrip_every_predictor_mode():
    img = _noise(12, 9, 42)
    for mode in range(14):
        buf = encode_webp_lossless(
            12, 9, img, transforms=("predictor",), predictor_modes=(mode,)
        )
        assert decode_webp_lossless(buf) == (12, 9, img), mode


def test_clamp_add_subtract_half_truncates_toward_zero():
    """Mode 13's (a - b) / 2 is C integer division: -3 / 2 == -1, not
    -2.  A floor-division implementation diverges on pixels where the
    average is below TL — pin one such image."""
    # top row bright, second row dark: avg(L, T) - TL goes negative
    img = bytes([250] * (8 * 3) + [10] * (8 * 3))
    buf = encode_webp_lossless(
        8, 2, img, transforms=("predictor",), predictor_modes=(13,), tile_bits=3
    )
    assert decode_webp_lossless(buf) == (8, 2, img)


def test_structural_bitstream_shapes():
    # two-color image: the simple two-symbol code form must be used and
    # round-trip; a rich image must exercise the code-length-coded form
    # with 17/18 zero-repeats (alphabet 280, most symbols absent)
    img2 = bytes(((5, 5, 5) if (x + y) % 2 else (200, 200, 200))[c]
                 for y in range(6) for x in range(8) for c in range(3))
    buf = encode_webp_lossless(8, 6, img2, lz77=False)
    assert decode_webp_lossless(buf) == (8, 6, img2)
    assert len(buf) < 120  # simple codes keep the stream tiny
    rich = _noise(16, 16, 9)
    buf = encode_webp_lossless(16, 16, rich)
    assert decode_webp_lossless(buf) == (16, 16, rich)
    # LZ77 effectiveness: a constant image compresses to near nothing
    const = bytes([77]) * (64 * 64 * 3)
    buf = encode_webp_lossless(64, 64, const)
    assert len(buf) < 80
    assert decode_webp_lossless(buf) == (64, 64, const)


def test_malformed_inputs_raise_value_error():
    good = encode_webp_lossless(4, 4, _grad(4, 4))
    for bad, why in (
        (b"JUNK" + good[4:], "not RIFF"),
        (good[:8] + b"WAVE" + good[12:], "not WEBP"),
        (good[:20], "truncated"),
        (good[:-3], "truncated bitstream"),
        (good[:12] + b"VP8X" + good[16:], "no VP8L chunk"),
    ):
        with pytest.raises(ValueError):
            decode_webp_lossless(bad)
    # bad signature byte inside the VP8L payload
    sig_at = good.index(b"VP8L") + 8
    with pytest.raises(ValueError, match="signature"):
        decode_webp_lossless(good[:sig_at] + b"\x00" + good[sig_at + 1 :])
    # nonzero version bits
    hdr = bytearray(good)
    # version field: bits 29-31 of the 32-bit header AFTER the signature
    # byte -> top bits of header byte 3 = buffer offset sig_at + 4
    hdr[sig_at + 4] |= 0x80
    with pytest.raises(ValueError, match="version"):
        decode_webp_lossless(bytes(hdr))


def test_image_router_decodes_webp_payloads():
    from realtime_change_data_capture_streaming_spark.llm_ops.multimodal import decode_image_batch
    import pandas as pd

    img = _grad(6, 4)
    buf = encode_webp_lossless(6, 4, img, transforms=("subtract_green", "predictor"))
    out = decode_image_batch(pd.Series([buf, None]))
    assert out.loc[0, "width"] == 6 and out.loc[0, "height"] == 4
    assert out.loc[0, "checksum"] == sum(img)
    assert pd.isna(out.loc[1, "width"])


@given(
    w=st.integers(1, 18),
    h=st.integers(1, 14),
    seed=st.integers(0, 10_000),
    variant=st.integers(0, 7),
)
@settings(max_examples=60, deadline=None)
def test_roundtrip_property(w, h, seed, variant):
    """Any size x content x encoder path: decode(encode(img)) == img."""
    rnd = random.Random(seed)
    if variant == 6:  # paletted content
        ncols = rnd.choice((2, 4, 16, 31))
        cols = [bytes(rnd.randrange(256) for _ in range(3)) for _ in range(ncols)]
        img = b"".join(cols[rnd.randrange(ncols)] for _ in range(w * h))
        opts = {"transforms": ("palette",)}
    else:
        img = bytes(rnd.randrange(256) for _ in range(w * h * 3))
        opts = (
            {},
            {"cache_bits": rnd.randrange(1, 11)},
            {"transforms": ("subtract_green",)},
            {"transforms": ("predictor",), "tile_bits": rnd.randrange(2, 6)},
            {"transforms": ("color", "subtract_green", "predictor")},
            {"meta_bits": rnd.randrange(2, 5), "cache_bits": 3},
            None,
            {"lz77": False},
        )[variant]
    buf = encode_webp_lossless(w, h, img, **opts)
    assert decode_webp_lossless(buf) == (w, h, img)


def test_prefix_code_max_symbol_early_stop():
    """The use_max_symbol branch of the code-length-coded form — our
    encoder never emits it, so pin the decoder against a hand-built
    bitstream: lengths for symbols 0..3 = [1, 2, 3, 3], max_symbol = 4,
    everything past it implicitly zero."""
    from realtime_change_data_capture_streaming_spark.llm_ops.webp import (
        _CODE_LENGTH_ORDER,
        _read_prefix_code,
    )

    bw = _BitWriter()
    bw.bits(0, 1)  # not simple
    # code-length code over symbols {1, 2, 3}: lengths 1=1, 2=2, 3=2
    cl = {1: 1, 2: 2, 3: 2}
    order_lens = [cl.get(s, 0) for s in _CODE_LENGTH_ORDER]
    num = max(4, max(i + 1 for i, ln in enumerate(order_lens) if ln))
    bw.bits(num - 4, 4)
    for i in range(num):
        bw.bits(order_lens[i], 3)
    bw.bits(1, 1)  # USE max_symbol
    bw.bits(0, 3)  # length_nbits = 2 + 2*0 = 2
    bw.bits(2, 2)  # max_symbol = 2 + 2 = 4
    cl_codes = _canon_codes(cl)
    for ln in (1, 2, 3, 3):  # lengths for symbols 0..3
        bw.code(*cl_codes[ln])
    rd = _BitReader(bw.finish())
    dec = _read_prefix_code(rd, 256)
    codes = {s: (c, ln) for (ln, c), s in dec.table.items()}
    assert set(codes) == {0, 1, 2, 3}
    assert codes[0][1] == 1 and codes[1][1] == 2
    assert codes[2][1] == 3 and codes[3][1] == 3


def test_prefix_code_repeat16_before_any_literal_uses_length_8():
    """Spec quirk: a 16-repeat arriving before any literal repeats the
    DEFAULT previous length, 8 — a decoder initializing prev to 0 emits
    an empty code here."""
    from realtime_change_data_capture_streaming_spark.llm_ops.webp import (
        _CODE_LENGTH_ORDER,
        _read_prefix_code,
    )

    bw = _BitWriter()
    bw.bits(0, 1)  # not simple
    cl = {16: 1, 0: 1}  # code-length code over {0, 16}
    order_lens = [cl.get(s, 0) for s in _CODE_LENGTH_ORDER]
    num = max(4, max(i + 1 for i, ln in enumerate(order_lens) if ln))
    bw.bits(num - 4, 4)
    for i in range(num):
        bw.bits(order_lens[i], 3)
    bw.bits(1, 1)  # use max_symbol so we can stop after one token
    bw.bits(0, 3)  # length_nbits = 2
    bw.bits(0, 2)  # max_symbol = 2: at most two code reads
    cl_codes = _canon_codes(cl)
    bw.code(*cl_codes[16])  # FIRST token is a 16-repeat
    bw.bits(0, 2)  # repeat 3 + 0 = 3 times
    bw.code(*cl_codes[0])  # consumed? no - max_symbol hits 0 first
    rd = _BitReader(bw.finish())
    dec = _read_prefix_code(rd, 256)
    codes = {s: (c, ln) for (ln, c), s in dec.table.items()}
    # symbols 0,1,2 all got the default prev length 8
    assert {s: ln for s, (c, ln) in codes.items()} == {0: 8, 1: 8, 2: 8}
