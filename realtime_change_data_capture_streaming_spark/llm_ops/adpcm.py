"""Dependency-free IMA/DVI ADPCM (WAVE fmt 0x0011) and Microsoft ADPCM
(fmt 0x0002) codecs — the two classic compressed-WAV formats, decoded
per their published specifications (the IMA "Recommended Practices for
Enhancing Digital Audio Compatibility" algorithm and Microsoft's
WAVE-format ADPCM reference, both reproduced in the public multimedia
format registries).

Completes the audio tier alongside linear PCM, G.711 A/mu-law and FLAC
(`multimodal.decode_audio` routes WAVE fmt tags here): 4-bit ADPCM is
what legacy telephony/game corpora actually contain, and a 100 TB
multimodal crawl will hit it.

Both codecs are lossy, so the test contract differs from FLAC's
bit-exactness: block-header samples decode EXACTLY (both layouts carry
verbatim PCM seeds per block), constant signals round-trip exactly once
the step index decays, and reconstruction error on smooth signals is
bounded by the quantizer step — all pinned in ``tests/test_adpcm.py``
along with hand-computed nibble vectors and hostile-input fuzz
(malformed blocks raise ValueError, never crash or mis-decode).

Scale shape: like the sibling codecs this runs row-parallel inside
mapInPandas; blocks are independent, so decode is embarrassingly
parallel within a payload too.
"""

from __future__ import annotations

import struct

# ----------------------------------------------------------- IMA tables

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635,
    13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]

# ------------------------------------------------------------ MS tables

_MS_COEFS = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0), (460, -208), (392, -232)]
_MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307, 230, 230, 230]
_MS_DELTA_MAX = 1 << 30  # the int32 storage class of reference decoders


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


# ------------------------------------------------------------ IMA codec


def _ima_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA quantizer step: returns (new predictor, new index).  The
    spec's shift-accumulate reconstruction (NOT the (2d+1)*step/8
    shortcut — they differ in truncation)."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = _clamp16(pred - diff if nibble & 8 else pred + diff)
    index += _IMA_INDEX[nibble & 7]
    return pred, 0 if index < 0 else (88 if index > 88 else index)


def decode_ima_blocks(data: bytes, n_ch: int, block_align: int) -> list[list[int]]:
    """Decode fmt-0x11 block stream to per-channel 16-bit sample lists.
    Block layout per the WAVE spec: a 4-byte header per channel
    (predictor int16, step index u8, reserved u8 — the predictor IS the
    block's first output sample), then 4-byte nibble groups rotating
    through the channels; low nibble first within each byte."""
    if n_ch < 1:
        raise ValueError("adpcm: channel count must be positive")
    if block_align < 4 * n_ch or (block_align - 4 * n_ch) % (4 * n_ch):
        raise ValueError(f"adpcm: IMA block align {block_align} invalid for {n_ch} channel(s)")
    channels: list[list[int]] = [[] for _ in range(n_ch)]
    for base in range(0, len(data) - block_align + 1, block_align):
        preds = [0] * n_ch
        idxs = [0] * n_ch
        for c in range(n_ch):
            p = base + 4 * c
            pred = int.from_bytes(data[p : p + 2], "little", signed=True)
            index = data[p + 2]
            if index > 88:
                raise ValueError(f"adpcm: IMA step index {index} out of range")
            preds[c] = pred
            idxs[c] = index
            channels[c].append(pred)
        pos = base + 4 * n_ch
        end = base + block_align
        while pos < end:
            for c in range(n_ch):
                pred, index = preds[c], idxs[c]
                out = channels[c]
                for b in data[pos : pos + 4]:
                    pred, index = _ima_step(pred, index, b & 0xF)
                    out.append(pred)
                    pred, index = _ima_step(pred, index, b >> 4)
                    out.append(pred)
                preds[c], idxs[c] = pred, index
                pos += 4
    if len(data) % block_align:
        raise ValueError("adpcm: trailing partial IMA block")
    return channels


def encode_ima_blocks(channels: list[list[int]], block_align: int) -> bytes:
    """Greedy IMA encoder (the spec's quantizer run in reverse); pads the
    final block by holding the last sample."""
    n_ch = len(channels)
    if block_align < 4 * n_ch or (block_align - 4 * n_ch) % (4 * n_ch):
        raise ValueError(f"adpcm: IMA block align {block_align} invalid for {n_ch} channel(s)")
    spb = ((block_align - 4 * n_ch) * 2) // n_ch + 1
    n = max(len(ch) for ch in channels)
    out = bytearray()
    preds = [0] * n_ch
    idxs = [0] * n_ch
    for base in range(0, n, spb):
        for c in range(n_ch):
            ch = channels[c]
            preds[c] = _clamp16(ch[base] if base < len(ch) else (ch[-1] if ch else 0))
            out += preds[c].to_bytes(2, "little", signed=True)
            out.append(idxs[c])
            out.append(0)
        nib_rounds = (spb - 1 + 7) // 8
        for r in range(nib_rounds):
            for c in range(n_ch):
                ch = channels[c]
                pred, index = preds[c], idxs[c]
                for k in range(4):
                    byte = 0
                    for half in range(2):
                        i = base + 1 + r * 8 + k * 2 + half
                        want = ch[i] if i < len(ch) else (ch[-1] if ch else 0)
                        step = _IMA_STEPS[index]
                        diff = want - pred
                        nibble = 8 if diff < 0 else 0
                        diff = -diff if diff < 0 else diff
                        if diff >= step:
                            nibble |= 4
                            diff -= step
                        if diff >= step >> 1:
                            nibble |= 2
                            diff -= step >> 1
                        if diff >= step >> 2:
                            nibble |= 1
                        pred, index = _ima_step(pred, index, nibble)
                        byte |= nibble << (4 * half)
                    out.append(byte)
                preds[c], idxs[c] = pred, index
    return bytes(out)


# ------------------------------------------------------------- MS codec


def decode_ms_blocks(data: bytes, n_ch: int, block_align: int,
                     coefs: list[tuple[int, int]] | None = None) -> list[list[int]]:
    """Decode fmt-0x02 block stream.  Per block: a predictor index byte
    per channel (selects an (iCoef1, iCoef2) pair), an initial delta
    int16 per channel, then the two verbatim seed samples per channel
    (iSamp1 newest, iSamp2 oldest — emitted oldest-first), then signed
    4-bit codes, channels rotating per nibble (high nibble first)."""
    coefs = coefs or _MS_COEFS
    header = 7 * n_ch
    if n_ch < 1 or block_align <= header:
        raise ValueError(f"adpcm: MS block align {block_align} invalid for {n_ch} channel(s)")
    channels: list[list[int]] = [[] for _ in range(n_ch)]
    for base in range(0, len(data) - block_align + 1, block_align):
        c1 = [0] * n_ch
        c2 = [0] * n_ch
        delta = [0] * n_ch
        s1 = [0] * n_ch
        s2 = [0] * n_ch
        for c in range(n_ch):
            p = data[base + c]
            if p >= len(coefs):
                raise ValueError(f"adpcm: MS predictor index {p} out of range")
            c1[c], c2[c] = coefs[p]
        for c in range(n_ch):
            delta[c] = int.from_bytes(data[base + n_ch + 2 * c : base + n_ch + 2 * c + 2], "little", signed=True)
            if delta[c] <= 0:
                raise ValueError("adpcm: MS initial delta must be positive")
        o = base + 3 * n_ch
        for c in range(n_ch):
            s1[c] = int.from_bytes(data[o + 2 * c : o + 2 * c + 2], "little", signed=True)
        o += 2 * n_ch
        for c in range(n_ch):
            s2[c] = int.from_bytes(data[o + 2 * c : o + 2 * c + 2], "little", signed=True)
        for c in range(n_ch):
            channels[c].append(s2[c])
            channels[c].append(s1[c])
        ch_i = 0
        for pos in range(base + header, base + block_align):
            byte = data[pos]
            for nib in (byte >> 4, byte & 0xF):
                c = ch_i % n_ch
                ch_i += 1
                signed = nib - 16 if nib >= 8 else nib
                predicted = (s1[c] * c1[c] + s2[c] * c2[c]) >> 8
                new = _clamp16(predicted + signed * delta[c])
                s2[c] = s1[c]
                s1[c] = new
                channels[c].append(new)
                # reference C decoders keep the running delta in an
                # int32; cap at that storage class (2^30) so a hostile
                # all-high-nibble stream cannot drive unbounded big-int
                # growth — no real stream a 32-bit decoder can play
                # ever reaches it, so decode fidelity is unchanged
                d = (_MS_ADAPT[nib] * delta[c]) >> 8
                delta[c] = 16 if d < 16 else (_MS_DELTA_MAX if d > _MS_DELTA_MAX else d)
    if len(data) % block_align:
        raise ValueError("adpcm: trailing partial MS block")
    return channels


def encode_ms_blocks(channels: list[list[int]], block_align: int) -> bytes:
    """MS ADPCM encoder: per block, tries all 7 published coefficient
    pairs and keeps the one with the least squared error."""
    n_ch = len(channels)
    header = 7 * n_ch
    spb = ((block_align - header) * 2) // n_ch + 2
    n = max(len(ch) for ch in channels)
    out = bytearray()

    def sample(c: int, i: int) -> int:
        ch = channels[c]
        return ch[i] if i < len(ch) else (ch[-1] if ch else 0)

    def encode_channel(c: int, base: int, pidx: int):
        c1, c2 = _MS_COEFS[pidx]
        s2, s1 = sample(c, base), sample(c, base + 1)
        # the reference encoder seeds delta from the early prediction
        # errors; any positive value decodes correctly
        errs = [abs(sample(c, base + i) - ((sample(c, base + i - 1) * c1 + sample(c, base + i - 2) * c2) >> 8))
                for i in range(2, min(10, spb))]
        delta = max(16, (sum(errs) // max(1, len(errs))) // 2 or 16)
        init_delta = delta
        nibs = []
        sq = 0
        for i in range(2, spb):
            want = sample(c, base + i)
            predicted = (s1 * c1 + s2 * c2) >> 8
            d = want - predicted
            code = d // delta if delta else 0
            code = -8 if code < -8 else (7 if code > 7 else code)
            new = _clamp16(predicted + code * delta)
            # one refinement step against the reconstruction error
            if code < 7 and abs(want - _clamp16(predicted + (code + 1) * delta)) < abs(want - new):
                code += 1
                new = _clamp16(predicted + code * delta)
            elif code > -8 and abs(want - _clamp16(predicted + (code - 1) * delta)) < abs(want - new):
                code -= 1
                new = _clamp16(predicted + code * delta)
            nib = code + 16 if code < 0 else code
            nibs.append(nib)
            sq += (want - new) * (want - new)
            s2, s1 = s1, new
            nd = (_MS_ADAPT[nib] * delta) >> 8
            delta = 16 if nd < 16 else (_MS_DELTA_MAX if nd > _MS_DELTA_MAX else nd)
        return sq, pidx, init_delta, sample(c, base + 1), sample(c, base), nibs

    for base in range(0, n, spb):
        best = [min((encode_channel(c, base, p) for p in range(len(_MS_COEFS))), key=lambda t: t[0])
                for c in range(n_ch)]
        for c in range(n_ch):
            out.append(best[c][1])
        for c in range(n_ch):
            out += best[c][2].to_bytes(2, "little", signed=True)
        for c in range(n_ch):
            out += _clamp16(best[c][3]).to_bytes(2, "little", signed=True)
        for c in range(n_ch):
            out += _clamp16(best[c][4]).to_bytes(2, "little", signed=True)
        streams = [b[5] for b in best]
        total = sum(len(s) for s in streams)
        byte = 0
        half = 0
        for k in range(total):
            nib = streams[k % n_ch][k // n_ch]
            if half == 0:
                byte = nib << 4
                half = 1
            else:
                out.append(byte | nib)
                half = 0
        if half:
            out.append(byte)
    return bytes(out)


# ------------------------------------------------------------ WAV layer


def encode_wav_adpcm(channels: list[list[int]], rate: int, fmt: int,
                     block_align: int | None = None) -> bytes:
    """Mux per-channel PCM into a RIFF/WAVE with fmt 0x11 (IMA) or
    0x02 (MS), including the spec-required extended fmt fields and the
    fact chunk carrying the true per-channel sample count."""
    n_ch = len(channels)
    n = max((len(ch) for ch in channels), default=0)
    if fmt == 0x11:
        block_align = block_align or 256 * n_ch
        spb = ((block_align - 4 * n_ch) * 2) // n_ch + 1
        data = encode_ima_blocks(channels, block_align)
        extra = struct.pack("<H", spb)
        bits = 4
    elif fmt == 0x02:
        block_align = block_align or 256 * n_ch
        spb = ((block_align - 7 * n_ch) * 2) // n_ch + 2
        data = encode_ms_blocks(channels, block_align)
        extra = struct.pack("<HH", spb, len(_MS_COEFS))
        for a, b in _MS_COEFS:
            extra += struct.pack("<hh", a, b)
        bits = 4
    else:
        raise ValueError(f"adpcm: unsupported format tag {fmt:#x}")
    byte_rate = rate * block_align // spb  # approximate, informational
    fmt_body = struct.pack("<HHIIHH", fmt, n_ch, rate, byte_rate, block_align, bits)
    fmt_body += struct.pack("<H", len(extra)) + extra
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    if len(fmt_body) & 1:
        chunks += b"\x00"
    chunks += b"fact" + struct.pack("<II", 4, n)
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav_adpcm(buf: bytes) -> tuple[int, int, int, list[list[int]]]:
    """Demux + decode an ADPCM RIFF/WAVE (fmt 0x11 or 0x02); returns
    (rate, n_channels, 16, per-channel samples) — the decode_audio
    contract.  The fact chunk, when present, truncates the final
    block's padding to the true sample count."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError(f"adpcm: not a RIFF/WAVE payload (magic {buf[:4]!r})")
    pos = 12
    fmt = n_ch = rate = block_align = None
    coefs = None
    fact = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        clen = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        body = buf[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("adpcm: truncated fmt chunk")
            fmt, n_ch, rate, _br, block_align, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt not in (0x02, 0x11):
                raise ValueError(f"adpcm: format tag {fmt:#x} is not an ADPCM WAVE")
            if bits != 4:
                raise ValueError(f"adpcm: 4-bit codes expected, fmt says {bits}")
            if fmt == 0x02 and len(body) >= 22:
                spb, ncoef = struct.unpack("<HH", body[18:22])
                if len(body) >= 22 + 4 * ncoef and ncoef:
                    coefs = [struct.unpack("<hh", body[22 + 4 * i : 26 + 4 * i]) for i in range(ncoef)]
        elif cid == b"fact":
            if len(body) < 4:
                raise ValueError("adpcm: truncated fact chunk")
            fact = struct.unpack("<I", body[:4])[0]
        elif cid == b"data":
            if len(body) != clen:
                raise ValueError(f"adpcm: truncated data chunk: want {clen}, have {len(body)}")
            if fmt is None:
                # same ordering contract as multimodal.decode_wav
                raise ValueError("adpcm: data chunk before fmt chunk")
            data = body
            break  # first data chunk wins, as in multimodal.decode_wav
        pos += 8 + clen + (clen & 1)
    if fmt is None or data is None:
        raise ValueError("adpcm: missing fmt or data chunk")
    if fmt == 0x11:
        channels = decode_ima_blocks(data, n_ch, block_align)
    else:
        channels = decode_ms_blocks(data, n_ch, block_align, coefs)
    if fact is not None:
        if fact > max((len(c) for c in channels), default=0):
            raise ValueError("adpcm: fact chunk claims more samples than the blocks hold")
        channels = [c[:fact] for c in channels]
    return rate, n_ch, 16, channels


def peek_wav_format_tag(buf: bytes) -> int | None:
    """The fmt tag of a RIFF/WAVE payload, or None if it is not one /
    has no parseable fmt chunk (dispatch helper for decode_audio)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        return None
    pos = 12
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        clen = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        if cid == b"fmt " and clen >= 2 and pos + 10 <= len(buf):
            return struct.unpack("<H", buf[pos + 8 : pos + 10])[0]
        pos += 8 + clen + (clen & 1)
    return None


# ------------------------------------------------- staged r11 query


def _synth_ima_payload(doc_id: int) -> bytes:
    """Seed-free deterministic IMA WAV for doc_id: one mono block whose
    nibbles are ``(doc_id*7 + 13*j) % 16`` — so the LOSSY decode is
    itself an exact integer recurrence the DuckDB oracle replays (the
    lossless-fixture trick the image queries use, adapted to a stateful
    quantizer: the oracle steps the quantizer, not the waveform)."""
    n_bytes = 96 + (doc_id % 5) * 4
    pred0 = (doc_id * 97) % 20001 - 10000
    idx0 = (doc_id * 31) % 89
    block = bytearray(pred0.to_bytes(2, "little", signed=True))
    block.append(idx0)
    block.append(0)

    def nib(j: int) -> int:
        # mostly small codes (the index decays, samples wander) with a
        # spike every 11th nibble (the index climbs, clamping engages)
        return (doc_id * 7 + 13 * j) % 6 + (10 if j % 11 == 0 else 0)

    for k in range(n_bytes):
        block.append(nib(2 * k) | (nib(2 * k + 1) << 4))
    data = bytes(block)
    ba = len(data)
    spb = 2 * n_bytes + 1
    fmt_body = struct.pack("<HHIIHH", 0x11, 1, 8000, 8000 * ba // spb, ba, 4)
    extra = struct.pack("<H", spb)
    fmt_body += struct.pack("<H", len(extra)) + extra  # cbSize, then extension
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    chunks += b"fact" + struct.pack("<II", 4, spb)
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _synth_ms_payload(doc_id: int) -> bytes:
    """Seed-free deterministic MS-ADPCM WAV for doc_id (the odd-doc
    counterpart of ``_synth_ima_payload``): one mono fmt-0x02 block,
    nibbles ``(doc_id*5 + 11*j) % 16`` — the coefficient-prediction +
    delta-adaptation recurrence replays exactly in the oracle's
    recursive CTE."""
    n_bytes = 64 + (doc_id % 7) * 4
    predictor = doc_id % 7
    delta = 16 + (doc_id * 13) % 500
    s1 = (doc_id * 57) % 8001 - 4000
    s2 = (doc_id * 41) % 8001 - 4000
    block = bytearray([predictor])
    block += delta.to_bytes(2, "little", signed=True)
    block += s1.to_bytes(2, "little", signed=True)
    block += s2.to_bytes(2, "little", signed=True)

    def nib(j: int) -> int:
        # mostly small positive codes (the delta decays) with a
        # negative spike every 13th nibble (the delta adapts upward)
        return (doc_id * 5 + 11 * j) % 5 + (9 if j % 13 == 0 else 0)

    for k in range(n_bytes):
        block.append((nib(2 * k) << 4) | nib(2 * k + 1))  # high nibble first
    data = bytes(block)
    ba = len(data)
    spb = 2 * n_bytes + 2
    fmt_body = struct.pack("<HHIIHH", 0x02, 1, 8000, 8000 * ba // spb, ba, 4)
    extra = struct.pack("<HH", spb, len(_MS_COEFS))
    for a, b in _MS_COEFS:
        extra += struct.pack("<hh", a, b)
    fmt_body += struct.pack("<H", len(extra)) + extra
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    chunks += b"fact" + struct.pack("<II", 4, spb)
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def multimodal_adpcm_features(spark, sf_dir: str):
    """REAL compressed-audio decode through mapInPandas: even doc_ids
    carry IMA ADPCM WAV payloads, odd doc_ids Microsoft ADPCM — both
    demuxed and run through the published quantizers; per-doc features
    (rate, sample count, exact amplitude sum/min/max).  The oracle
    replays BOTH quantizer recurrences in recursive CTEs, so the driver
    hash checks every decoded sample's contribution for both codecs."""
    from typing import Iterator

    import pandas as pd

    from realtime_change_data_capture_streaming_spark.llm_ops.multimodal import decode_audio
    from realtime_change_data_capture_streaming_spark.operators._util import spread
    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    media = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    rows.append((doc_id, None, None, None, None, None))
                    continue
                did = int(doc_id)
                payload = _synth_ima_payload(did) if did % 2 == 0 else _synth_ms_payload(did)
                rate, n_ch, bits, chans = decode_audio(payload)
                assert n_ch == 1 and bits == 16
                (ch,) = chans
                rows.append((doc_id, rate, len(ch), int(sum(ch)), min(ch), max(ch)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "n_samples", "sum_amplitude",
                         "min_amplitude", "max_amplitude"],
            ).astype(
                {
                    "sample_rate": "Int32",
                    "n_samples": "Int64",
                    "sum_amplitude": "Int64",
                    "min_amplitude": "Int64",
                    "max_amplitude": "Int64",
                }
            )

    return media.mapInPandas(
        run,
        "doc_id bigint, sample_rate int, n_samples bigint, sum_amplitude bigint, "
        "min_amplitude bigint, max_amplitude bigint",
    )


_NIB = ("((w.doc_id * 7 + (w.j + 1) * 13) % 6"
        " + CASE WHEN (w.j + 1) % 11 = 0 THEN 10 ELSE 0 END)")
_STEPS_VALUES = ", ".join(f"({i}, {v})" for i, v in enumerate(_IMA_STEPS))

MULTIMODAL_ADPCM_SQL = f"""
WITH RECURSIVE steps(s, v) AS (VALUES {_STEPS_VALUES}),
docs AS (  -- even doc_ids: IMA
  SELECT doc_id,
         2 * (96 + (doc_id % 5) * 4) AS n_nib,
         (doc_id * 97) % 20001 - 10000 AS pred0,
         (doc_id * 31) % 89 AS idx0
  FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 0
),
walk(doc_id, j, pred, idx, n_nib) AS (
  SELECT doc_id, -1, pred0, idx0, n_nib FROM docs
  UNION ALL
  SELECT w.doc_id, w.j + 1,
         GREATEST(-32768, LEAST(32767,
           w.pred + (1 - 2 * ({_NIB} // 8)) *
             (st.v // 8 + ({_NIB} % 2) * (st.v // 4)
              + (({_NIB} // 2) % 2) * (st.v // 2)
              + (({_NIB} // 4) % 2) * st.v))),
         LEAST(88, GREATEST(0, w.idx +
           CASE WHEN {_NIB} % 8 < 4 THEN -1 ELSE 2 * ({_NIB} % 8) - 6 END)),
         w.n_nib
  FROM walk w JOIN steps st ON st.s = w.idx
  WHERE w.j + 1 < w.n_nib
),
msdocs AS (  -- odd doc_ids: Microsoft ADPCM
  SELECT doc_id,
         2 * (64 + (doc_id % 7) * 4) AS n_nib,
         16 + (doc_id * 13) % 500 AS delta0,
         (doc_id * 57) % 8001 - 4000 AS s1_0,
         (doc_id * 41) % 8001 - 4000 AS s2_0,
         CASE doc_id % 7 WHEN 0 THEN 256 WHEN 1 THEN 512 WHEN 2 THEN 0
              WHEN 3 THEN 192 WHEN 4 THEN 240 WHEN 5 THEN 460 ELSE 392 END AS c1,
         CASE doc_id % 7 WHEN 0 THEN 0 WHEN 1 THEN -256 WHEN 2 THEN 0
              WHEN 3 THEN 64 WHEN 4 THEN 0 WHEN 5 THEN -208 ELSE -232 END AS c2
  FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 1
),
mswalk(doc_id, j, s1, s2, delta, n_nib, c1, c2) AS (
  SELECT doc_id, -1, s1_0, s2_0, delta0, n_nib, c1, c2 FROM msdocs
  UNION ALL
  -- nibble and signed value via a lateral: DuckDB evaluates the
  -- CTE-step SELECT list left to right, so alias once and reuse
  SELECT w.doc_id, w.j + 1,
         GREATEST(-32768, LEAST(32767,
           CAST(floor((w.s1 * w.c1 + w.s2 * w.c2) / 256.0) AS BIGINT)
           + (CASE WHEN M.nib >= 8 THEN M.nib - 16 ELSE M.nib END) * w.delta)),
         w.s1,
         LEAST(1073741824, GREATEST(16, (CASE M.nib WHEN 4 THEN 307 WHEN 5 THEN 409 WHEN 6 THEN 512 WHEN 7 THEN 614 WHEN 8 THEN 768 WHEN 9 THEN 614 WHEN 10 THEN 512 WHEN 11 THEN 409 WHEN 12 THEN 307 ELSE 230 END * w.delta) // 256)),
         w.n_nib, w.c1, w.c2
  FROM mswalk w,
       LATERAL (SELECT (w.doc_id * 5 + 11 * (w.j + 1)) % 5
                + CASE WHEN (w.j + 1) % 13 = 0 THEN 9 ELSE 0 END AS nib) M
  WHERE w.j + 1 < w.n_nib
),
samples AS (
  SELECT doc_id, pred AS v FROM walk
  UNION ALL SELECT doc_id, s2_0 FROM msdocs
  UNION ALL SELECT doc_id, s1_0 FROM msdocs
  UNION ALL SELECT doc_id, s1 FROM mswalk WHERE j >= 0
),
agg AS (
  SELECT doc_id, COUNT(*) AS n, SUM(v) AS s, MIN(v) AS mn, MAX(v) AS mx
  FROM samples GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN d.text IS NOT NULL THEN 8000 END AS sample_rate,
       CAST(a.n AS BIGINT) AS n_samples,
       CAST(a.s AS BIGINT) AS sum_amplitude,
       CAST(a.mn AS BIGINT) AS min_amplitude,
       CAST(a.mx AS BIGINT) AS max_amplitude
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
"""

# STAGED for r11 registration (the r10 window is frozen at the verdict's
# 2-query budget): wire these into llm_ops once the window has capacity.
QUERIES = {"multimodal_adpcm_features": multimodal_adpcm_features}
ORACLE = {"multimodal_adpcm_features": MULTIMODAL_ADPCM_SQL}
