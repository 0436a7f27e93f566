"""Dependency-free FLAC codec (decoder + fixture encoder).

Implements the published FLAC format: the fLaC stream header and
STREAMINFO metadata block, frame headers with UTF-8-coded frame numbers
and CRC-8 verification, all four channel assignments (independent,
left/side, right/side, mid/side), all four subframe families (CONSTANT,
VERBATIM, FIXED orders 0-4, LPC up to order 32 with quantized
coefficients and arithmetic shift), wasted-bits handling, partitioned
Rice residual coding (both the 4-bit and 5-bit "Rice2" parameter widths
plus the escape-to-raw partition form), and frame CRC-16 verification.

The matching encoder is configurable so fixtures cycle every decoder
path (the PNG/VP8L-fixture trick).  FLAC is lossless by construction,
so round-trips are exact; correctness is pinned by round-trip property
tests, hand-checked Rice/UTF-8/CRC vectors, and clean ValueErrors on
malformed streams.

Parity target: the multimodal mandate of SURVEY §2.5 / BASELINE.json
(the reference repo has no media path — north-star training-data
surface; the audio tier previously ended at RIFF/WAV PCM).
"""

from __future__ import annotations

# ---------------------------------------------------------------- bit I/O
# FLAC is MSB-first (unlike VP8L): bits fill bytes from the top.


class _Reader:
    def __init__(self, data: bytes, pos_bits: int = 0) -> None:
        self.data = data
        self.pos = pos_bits
        self.end = len(data) * 8

    def bits(self, n: int) -> int:
        if self.pos + n > self.end:
            raise ValueError("FLAC: truncated stream")
        v = 0
        for _ in range(n):
            p = self.pos
            v = (v << 1) | ((self.data[p >> 3] >> (7 - (p & 7))) & 1)
            self.pos += 1
        return v

    def sbits(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("FLAC: runaway unary code")
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _Writer:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.nbits = 0

    def bits(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            if self.nbits & 7 == 0:
                self.buf.append(0)
            if (value >> i) & 1:
                self.buf[-1] |= 0x80 >> (self.nbits & 7)
            self.nbits += 1

    def unary(self, q: int) -> None:
        for _ in range(q):
            self.bits(0, 1)
        self.bits(1, 1)

    def align(self) -> None:
        while self.nbits & 7:
            self.bits(0, 1)

    def finish(self) -> bytes:
        return bytes(self.buf)


# ------------------------------------------------------------------- CRCs


def _crc8(data: bytes) -> int:
    """CRC-8 with polynomial x^8 + x^2 + x + 1 (0x07), init 0."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16 with polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# ------------------------------------------------------------ UTF-8 coding
# Frame headers carry the frame number in the UTF-8 code-point encoding
# (extended to 36 bits / 7 bytes).


def _utf8_encode(v: int) -> bytes:
    if v < 1 << 7:
        return bytes([v])
    # n continuation bytes carry 6n bits; the lead byte has (6 - n)
    # payload bits under an (n+1)-one prefix (n = 6 -> prefix 0xFE, 0
    # payload bits, the 36-bit 7-byte form)
    for n in range(1, 7):
        if v < 1 << (6 * n + (6 - n)):
            break
    else:
        raise ValueError("FLAC: frame number exceeds 36 bits")
    lead_prefix = (0xFF << (7 - n)) & 0xFF
    out = [lead_prefix | (v >> (6 * n))]
    for i in range(n - 1, -1, -1):
        out.append(0x80 | ((v >> (6 * i)) & 0x3F))
    return bytes(out)


def _utf8_decode(rd: _Reader) -> int:
    b0 = rd.bits(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("FLAC: invalid UTF-8 frame number")
    v = b0 & (mask - 1)
    for _ in range(n):
        b = rd.bits(8)
        if b & 0xC0 != 0x80:
            raise ValueError("FLAC: invalid UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


# ------------------------------------------------------------- Rice coding


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _rice_write(bw: _Writer, residual: list[int], param: int) -> None:
    for r in residual:
        u = (r << 1) if r >= 0 else ((-r) << 1) - 1
        bw.unary(u >> param)
        if param:
            bw.bits(u & ((1 << param) - 1), param)


def _rice_read(rd: _Reader, n: int, param: int) -> list[int]:
    out = []
    for _ in range(n):
        q = rd.unary()
        u = (q << param) | (rd.bits(param) if param else 0)
        out.append(_unzigzag(u))
    return out


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
for _i in range(8, 16):
    _BLOCKSIZE_CODES[_i] = 256 << (_i - 8)

_SAMPLE_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


# ----------------------------------------------------------------- decoder


def _read_residual(rd: _Reader, blocksize: int, pred_order: int) -> list[int]:
    method = rd.bits(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    pbits = 4 + method  # Rice vs Rice2 parameter width
    escape = (1 << pbits) - 1
    porder = rd.bits(4)
    n_part = 1 << porder
    if blocksize % n_part or (blocksize >> porder) <= pred_order and porder:
        raise ValueError("FLAC: invalid partition order")
    out: list[int] = []
    for p in range(n_part):
        n = (blocksize >> porder) - (pred_order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC: partition smaller than predictor order")
        param = rd.bits(pbits)
        if param == escape:
            raw_bps = rd.bits(5)
            out.extend(rd.sbits(raw_bps) if raw_bps else 0 for _ in range(n))
        else:
            out.extend(_rice_read(rd, n, param))
    return out


def _read_subframe(rd: _Reader, blocksize: int, bps: int) -> list[int]:
    if rd.bits(1):
        raise ValueError("FLAC: subframe padding bit set")
    t = rd.bits(6)
    wasted = 0
    if rd.bits(1):
        wasted = rd.unary() + 1
    eff = bps - wasted
    if t == 0:  # CONSTANT
        v = rd.sbits(eff)
        samples = [v] * blocksize
    elif t == 1:  # VERBATIM
        samples = [rd.sbits(eff) for _ in range(blocksize)]
    elif 8 <= t <= 12:  # FIXED, order t-8
        order = t - 8
        samples = [rd.sbits(eff) for _ in range(order)]
        residual = _read_residual(rd, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in residual:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(pred + r)
    elif t >= 32:  # LPC, order (t & 31) + 1
        order = (t & 31) + 1
        samples = [rd.sbits(eff) for _ in range(order)]
        prec = rd.bits(4)
        if prec == 15:
            raise ValueError("FLAC: invalid LPC precision code")
        prec += 1
        shift = rd.sbits(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [rd.sbits(prec) for _ in range(order)]
        residual = _read_residual(rd, blocksize, order)
        for r in residual:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs)) >> shift
            samples.append(pred + r)
    else:
        raise ValueError(f"FLAC: reserved subframe type {t}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(buf: bytes) -> tuple[int, int, int, list[list[int]]]:
    """fLaC stream -> (sample_rate, n_channels, bits_per_sample,
    per-channel sample lists).  Verifies every frame-header CRC-8 and
    frame CRC-16; raises ValueError on malformed streams."""
    if buf[:4] != b"fLaC":
        raise ValueError("FLAC: bad stream marker")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(buf):
            raise ValueError("FLAC: truncated metadata")
        hdr = buf[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        length = int.from_bytes(buf[pos + 1 : pos + 4], "big")
        body = buf[pos + 4 : pos + 4 + length]
        if len(body) < length:
            raise ValueError("FLAC: truncated metadata block")
        if btype == 0:  # STREAMINFO
            rd = _Reader(body)
            rd.bits(16)  # min blocksize
            rd.bits(16)  # max blocksize
            rd.bits(24)  # min framesize
            rd.bits(24)  # max framesize
            rate = rd.bits(20)
            n_ch = rd.bits(3) + 1
            bps = rd.bits(5) + 1
            total = rd.bits(36)
            info = (rate, n_ch, bps, total)
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO")
    rate, n_ch, bps, total = info

    channels: list[list[int]] = [[] for _ in range(n_ch)]
    done = 0
    # STREAMINFO total_samples == 0 means "unknown length" (common for
    # streamed/live encodes) — in that case decode frames until the
    # stream ends instead of treating the file as empty.
    while done < total if total else pos < len(buf):
        frame_start = pos
        rd = _Reader(buf, pos * 8)
        if rd.bits(14) != 0b11111111111110:
            raise ValueError("FLAC: lost frame sync")
        rd.bits(1)  # reserved
        rd.bits(1)  # blocking strategy
        bs_code = rd.bits(4)
        sr_code = rd.bits(4)
        ch_code = rd.bits(4)
        ss_code = rd.bits(3)
        rd.bits(1)  # reserved
        _utf8_decode(rd)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code")
        elif bs_code == 6:
            blocksize = rd.bits(8) + 1
        elif bs_code == 7:
            blocksize = rd.bits(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 0:
            pass  # rate comes from STREAMINFO
        elif sr_code <= 11:
            if _SAMPLE_RATE_CODES[sr_code] != rate:
                raise ValueError("FLAC: frame sample rate contradicts STREAMINFO")
        elif sr_code == 12:  # 8-bit rate in kHz at header end
            if rd.bits(8) * 1000 != rate:
                raise ValueError("FLAC: frame sample rate contradicts STREAMINFO")
        elif sr_code == 13:  # 16-bit rate in Hz
            if rd.bits(16) != rate:
                raise ValueError("FLAC: frame sample rate contradicts STREAMINFO")
        elif sr_code == 14:  # 16-bit rate in tens of Hz
            if rd.bits(16) * 10 != rate:
                raise ValueError("FLAC: frame sample rate contradicts STREAMINFO")
        else:
            raise ValueError("FLAC: invalid sample rate code")
        f_bps = bps if ss_code == 0 else _SAMPLE_SIZE_CODES.get(ss_code)
        if f_bps is None:
            raise ValueError("FLAC: reserved sample size code")
        header_len = (rd.pos + 7) // 8 - frame_start  # CRC byte follows
        expect_crc8 = rd.bits(8)
        got_crc8 = _crc8(buf[frame_start : frame_start + header_len])
        if expect_crc8 != got_crc8:
            raise ValueError("FLAC: frame header CRC-8 mismatch")

        if ch_code < 8:
            if ch_code + 1 != n_ch:
                raise ValueError("FLAC: channel count mismatch")
            subs = [_read_subframe(rd, blocksize, f_bps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if n_ch != 2:
                raise ValueError("FLAC: stereo decorrelation on non-stereo stream")
            # the SIDE channel carries one extra bit
            if ch_code == 8:  # left/side
                left = _read_subframe(rd, blocksize, f_bps)
                side = _read_subframe(rd, blocksize, f_bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _read_subframe(rd, blocksize, f_bps + 1)
                right = _read_subframe(rd, blocksize, f_bps)
                subs = [[s + r for s, r in zip(side, right)], right]
            else:  # mid/side
                mid = _read_subframe(rd, blocksize, f_bps)
                side = _read_subframe(rd, blocksize, f_bps + 1)
                lr = []
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)
                    lr.append(((m2 + s) >> 1, (m2 - s) >> 1))
                subs = [[a for a, _ in lr], [b for _, b in lr]]
        else:
            raise ValueError("FLAC: reserved channel assignment")

        rd.align()
        body_end = rd.pos // 8
        expect_crc16 = rd.bits(16)
        if _crc16(buf[frame_start:body_end]) != expect_crc16:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        for c in range(n_ch):
            channels[c].extend(subs[c])
        done += blocksize
        pos = rd.pos // 8
    if total and done != total:
        raise ValueError("FLAC: frame samples exceed STREAMINFO total")
    return rate, n_ch, bps, channels


# ----------------------------------------------------------------- encoder


def _best_rice_param(residual: list[int], pbits: int) -> int:
    """Near-optimal Rice parameter: the standard log2-of-mean estimate,
    refined by a +/-1 cost scan (deterministic; parameter choice affects
    stream SIZE only — decode is lossless for any parameter)."""
    if not residual:
        return 0
    mean = sum(_zigzag(r) for r in residual) // len(residual)
    est = max(0, mean.bit_length() - 1)
    cap = (1 << pbits) - 2
    best, best_cost = 0, None
    for param in range(max(0, est - 1), min(cap, est + 1) + 1):
        cost = sum((_zigzag(r) >> param) + 1 + param for r in residual)
        if best_cost is None or cost < best_cost:
            best, best_cost = param, cost
    return best


def _write_residual(
    bw: _Writer,
    residual: list[int],
    blocksize: int,
    pred_order: int,
    partition_order: int,
    rice2: bool,
    escape_bps: int | None,
) -> None:
    method = 1 if rice2 else 0
    pbits = 4 + method
    escape = (1 << pbits) - 1
    bw.bits(method, 2)
    bw.bits(partition_order, 4)
    if blocksize % (1 << partition_order):
        raise ValueError("encode_flac: blocksize not divisible by partitions")
    idx = 0
    for p in range(1 << partition_order):
        n = (blocksize >> partition_order) - (pred_order if p == 0 else 0)
        part = residual[idx : idx + n]
        idx += n
        if escape_bps is not None and p == 0:
            # escape-to-raw form for the first partition; raw residuals
            # are escape_bps-bit two's complement, so out-of-range values
            # would truncate into a CRC-valid stream that decodes to the
            # WRONG samples — guard loudly instead
            lo = -(1 << (escape_bps - 1)) if escape_bps else 0
            hi = (1 << (escape_bps - 1)) - 1 if escape_bps else 0
            bw.bits(escape, pbits)
            bw.bits(escape_bps, 5)
            for r in part:
                if not lo <= r <= hi:
                    raise ValueError(
                        "encode_flac: residual out of escape_bps range"
                    )
                bw.bits(r & ((1 << escape_bps) - 1), escape_bps)
            continue
        param = _best_rice_param(part, pbits)
        if param == escape:
            param = escape - 1
        bw.bits(param, pbits)
        _rice_write(bw, part, param)


def _write_subframe(
    bw: _Writer,
    samples: list[int],
    bps: int,
    kind: str,
    *,
    fixed_order: int = 2,
    lpc_coefs: list[int] | None = None,
    lpc_shift: int = 0,
    partition_order: int = 0,
    rice2: bool = False,
    wasted: int = 0,
    escape_bps: int | None = None,
) -> None:
    bw.bits(0, 1)  # padding
    if wasted:
        if any(s & ((1 << wasted) - 1) for s in samples):
            raise ValueError("encode_flac: wasted bits not actually zero")
        samples = [s >> wasted for s in samples]
    eff = bps - wasted
    blocksize = len(samples)
    if kind == "constant":
        if any(s != samples[0] for s in samples):
            raise ValueError("encode_flac: constant subframe on varying samples")
        bw.bits(0, 6)
        _write_wasted(bw, wasted)
        bw.bits(samples[0] & ((1 << eff) - 1), eff)
    elif kind == "verbatim":
        bw.bits(1, 6)
        _write_wasted(bw, wasted)
        for s in samples:
            bw.bits(s & ((1 << eff) - 1), eff)
    elif kind == "fixed":
        order = fixed_order
        if order > blocksize:
            raise ValueError("encode_flac: predictor order exceeds block size")
        bw.bits(8 + order, 6)
        _write_wasted(bw, wasted)
        for s in samples[:order]:
            bw.bits(s & ((1 << eff) - 1), eff)
        coefs = _FIXED_COEFS[order]
        residual = [
            samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, blocksize)
        ]
        _write_residual(bw, residual, blocksize, order, partition_order, rice2, escape_bps)
    elif kind == "lpc":
        coefs = lpc_coefs or [1]
        order = len(coefs)
        if order > blocksize:
            raise ValueError("encode_flac: predictor order exceeds block size")
        prec = max(max(abs(c) for c in coefs).bit_length() + 1, 2)
        if prec > 15:
            raise ValueError("encode_flac: LPC coefficients exceed 15-bit precision")
        bw.bits(32 + (order - 1), 6)
        _write_wasted(bw, wasted)
        for s in samples[:order]:
            bw.bits(s & ((1 << eff) - 1), eff)
        bw.bits(prec - 1, 4)
        bw.bits(lpc_shift & 0x1F, 5)
        for c in coefs:
            bw.bits(c & ((1 << prec) - 1), prec)
        residual = [
            samples[i]
            - (sum(c * samples[i - 1 - j] for j, c in enumerate(coefs)) >> lpc_shift)
            for i in range(order, blocksize)
        ]
        _write_residual(bw, residual, blocksize, order, partition_order, rice2, escape_bps)
    else:
        raise ValueError(f"encode_flac: unknown subframe kind {kind!r}")


def _write_wasted(bw: _Writer, wasted: int) -> None:
    if wasted:
        bw.bits(1, 1)
        bw.unary(wasted - 1)
    else:
        bw.bits(0, 1)


def encode_flac(
    channels: list[list[int]],
    sample_rate: int = 44100,
    bps: int = 16,
    *,
    blocksize: int = 256,
    subframe: str = "fixed",
    fixed_order: int = 2,
    lpc_coefs: list[int] | None = None,
    lpc_shift: int = 0,
    stereo: str = "independent",
    partition_order: int = 0,
    rice2: bool = False,
    wasted: int = 0,
    escape_bps: int | None = None,
) -> bytes:
    """Per-channel samples -> fLaC stream.  ``subframe`` selects the
    coding family for every channel ('constant'/'verbatim'/'fixed'/
    'lpc'); ``stereo`` selects the channel assignment for 2-channel
    input ('independent'/'left_side'/'right_side'/'mid_side')."""
    n_ch = len(channels)
    total = len(channels[0])
    if any(len(c) != total for c in channels):
        raise ValueError("encode_flac: ragged channels")
    if stereo != "independent" and n_ch != 2:
        raise ValueError("encode_flac: stereo decorrelation needs 2 channels")

    out = bytearray(b"fLaC")
    si = _Writer()
    last_block = total % blocksize or blocksize
    si.bits(min(blocksize, last_block), 16)
    si.bits(blocksize, 16)
    si.bits(0, 24)
    si.bits(0, 24)
    si.bits(sample_rate, 20)
    si.bits(n_ch - 1, 3)
    si.bits(bps - 1, 5)
    si.bits(total, 36)
    body = si.finish() + b"\x00" * 16  # md5 unknown
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body  # last, STREAMINFO

    for fi in range(0, (total + blocksize - 1) // blocksize):
        lo = fi * blocksize
        n = min(blocksize, total - lo)
        hw = _Writer()
        hw.bits(0b11111111111110, 14)
        hw.bits(0, 1)
        hw.bits(0, 1)  # fixed blocking: number = frame index
        hw.bits(6 if n <= 256 else 7, 4)  # 8/16-bit blocksize-1 at header end
        hw.bits(0, 4)  # sample rate from STREAMINFO
        ch_code = {
            "independent": n_ch - 1,
            "left_side": 8,
            "right_side": 9,
            "mid_side": 10,
        }[stereo]
        hw.bits(ch_code, 4)
        hw.bits(0, 3)  # sample size from STREAMINFO
        hw.bits(0, 1)
        for b in _utf8_encode(fi):
            hw.bits(b, 8)
        hw.bits(n - 1, 8 if n <= 256 else 16)
        header = hw.finish()
        fw = _Writer()
        for b in header:
            fw.bits(b, 8)
        fw.bits(_crc8(header), 8)

        blocks = [c[lo : lo + n] for c in channels]
        if stereo == "independent":
            subs = [(b, bps) for b in blocks]
        elif stereo == "left_side":
            side = [l - r for l, r in zip(blocks[0], blocks[1])]
            subs = [(blocks[0], bps), (side, bps + 1)]
        elif stereo == "right_side":
            side = [l - r for l, r in zip(blocks[0], blocks[1])]
            subs = [(side, bps + 1), (blocks[1], bps)]
        else:  # mid_side
            mid = [(l + r) >> 1 for l, r in zip(blocks[0], blocks[1])]
            side = [l - r for l, r in zip(blocks[0], blocks[1])]
            subs = [(mid, bps), (side, bps + 1)]
        # a short LAST frame may be smaller than the predictor order;
        # fall back to verbatim for that frame (per-frame subframe
        # choice, as real encoders make) so losslessness never depends
        # on the divisibility of the total length
        frame_kind = subframe
        order_needed = {
            "fixed": fixed_order,
            "lpc": len(lpc_coefs) if lpc_coefs else 1,
        }.get(subframe, 0)
        if order_needed > n:
            frame_kind = "verbatim"
        for samples, sub_bps in subs:
            _write_subframe(
                fw,
                samples,
                sub_bps,
                frame_kind,
                fixed_order=fixed_order,
                lpc_coefs=lpc_coefs,
                lpc_shift=lpc_shift,
                partition_order=partition_order if n % (1 << partition_order) == 0 else 0,
                rice2=rice2,
                wasted=wasted,
                escape_bps=escape_bps,
            )
        fw.align()
        frame = fw.finish()
        out += frame + _crc16(frame).to_bytes(2, "big")
    return bytes(out)


# ------------------------------------------------------------ Spark query

from collections.abc import Iterator  # noqa: E402

import pandas as pd  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from realtime_change_data_capture_streaming_spark.operators._util import spread  # noqa: E402
from realtime_change_data_capture_streaming_spark.sources.tables import load_table  # noqa: E402


def multimodal_flac_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL FLAC decode through the production mapInPandas path.  Per
    document an analytic waveform is FLAC-encoded with a doc_id-cycled
    configuration so the five fixture variants cover every decoder
    family: (0) mono FIXED order-2 with 2 Rice partitions, (1) stereo
    MID/SIDE fixed-1, (2) mono LPC (quantized coefficients + shift),
    (3) stereo RIGHT/SIDE fixed-2 with 5-bit Rice2 parameters, (4) mono
    fixed-2 with an escape-to-raw first partition.  Non-divisible
    lengths exercise the short last frame; every frame's CRC-8/CRC-16
    is verified on decode.  Features come from the DECODED samples (the
    UDF raises on any round-trip mismatch) and the oracle recomputes
    them analytically from doc_id — one wrong bit in any subframe/Rice/
    stereo-reconstruction path breaks the hash."""
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
                n = 200 + (doc % 5) * 37
                a, b = 1 + doc % 3, doc % 7
                variant = doc % 5
                left = [((a * i * i + b * i + doc) % 4000) - 2000 for i in range(n)]
                stereo = variant in (1, 3)
                channels = [left]
                if stereo:
                    channels.append([((5 * doc + 11 * i) % 4000) - 2000 for i in range(n)])
                opts = (
                    {"subframe": "fixed", "fixed_order": 2, "partition_order": 1},
                    {"subframe": "fixed", "fixed_order": 1, "stereo": "mid_side"},
                    {"subframe": "lpc", "lpc_coefs": [3, -3, 1], "lpc_shift": 1},
                    {"subframe": "fixed", "fixed_order": 2, "stereo": "right_side", "rice2": True},
                    {"subframe": "fixed", "fixed_order": 2, "escape_bps": 15},
                )[variant]
                buf = encode_flac(channels, blocksize=128, **opts)
                rate, n_ch, bps, got = decode_flac(buf)
                if (rate, n_ch, bps, got) != (44100, len(channels), 16, channels):
                    raise ValueError(f"FLAC round-trip failed for doc {doc}")
                total = sum(s + 2000 for c in got for s in c)
                rows.append(
                    (
                        doc,
                        n,
                        n_ch,
                        variant,
                        int(total % (1 << 31)),
                        float(total) / (n * n_ch),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "n_channels", "variant", "checksum", "mean_val"],
            ).astype(
                {
                    "doc_id": "int64",
                    "n_samples": "Int64",
                    "n_channels": "Int32",
                    "variant": "Int32",
                    "checksum": "Int64",
                    "mean_val": "float64",
                }
            )

    return d.mapInPandas(
        run,
        schema=(
            "doc_id long, n_samples long, n_channels int, variant int, "
            "checksum long, mean_val double"
        ),
    )


MULTIMODAL_FLAC_SQL = """
WITH p AS (
  SELECT d.doc_id,
         CAST(200 + (d.doc_id % 5) * 37 AS BIGINT) AS n,
         CAST(1 + d.doc_id % 3 AS BIGINT) AS a,
         CAST(d.doc_id % 7 AS BIGINT) AS b,
         CAST(d.doc_id % 5 AS BIGINT) AS variant,
         CAST(CASE WHEN d.doc_id % 5 IN (1, 3) THEN 2 ELSE 1 END AS BIGINT) AS nch
  FROM documents d WHERE d.text IS NOT NULL
), sums AS (
  SELECT p.doc_id, p.n, p.variant, p.nch,
         SUM((p.a * t.i * t.i + p.b * t.i + p.doc_id) % 4000
             + CASE WHEN p.nch = 2 THEN (5 * p.doc_id + 11 * t.i) % 4000 ELSE 0 END) AS total
  FROM p, UNNEST(range(0, p.n)) AS t(i)
  GROUP BY 1, 2, 3, 4
)
SELECT d.doc_id,
       CAST(s.n AS BIGINT) AS n_samples,
       CAST(s.nch AS INTEGER) AS n_channels,
       CAST(s.variant AS INTEGER) AS variant,
       CAST(s.total % 2147483648 AS BIGINT) AS checksum,
       CAST(s.total AS DOUBLE) / (s.n * s.nch) AS mean_val
FROM documents d LEFT JOIN sums s ON s.doc_id = d.doc_id
"""

QUERIES = {"multimodal_flac_features": multimodal_flac_features}
ORACLE = {"multimodal_flac_features": MULTIMODAL_FLAC_SQL}
