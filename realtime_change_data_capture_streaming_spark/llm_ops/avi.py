"""Dependency-free AVI (RIFF) container mux/demux for MJPEG video.

The MJPEG tier so far decodes the raw elementary stream (concatenated
JPEGs, ``multimodal.demux_mjpeg``); real motion-JPEG files wrap that
stream in the RIFF-AVI container (the `MJPG` fourcc).  This module walks
the container itself, per the published AVI RIFF form (Microsoft
"AVI RIFF File Reference" / OpenDML): the ``hdrl`` header list
(``avih`` MainAVIHeader + per-stream ``strl`` with ``strh``
AVIStreamHeader and ``strf`` BITMAPINFOHEADER), the ``movi`` payload
list whose ``##dc`` chunks each hold one complete JPEG (optionally
grouped under ``rec `` interleave lists) and whose ``##wb`` chunks carry
an optional second ``auds`` stream (PCM or G.711, PCMWAVEFORMAT strf,
one slice interleaved per video frame — the real AV-interleave shape),
word alignment of every odd chunk, and the ``idx1`` index whose entries
— video AND audio — are validated against the actual chunk layout (both published offset conventions: relative to the
``movi`` fourcc, or absolute file offsets — real muxers emit both).

Parity target: the multimodal mandate of SURVEY §2.5 / BASELINE.json —
the reference repo (`transaction_producer.py` / `transaction_consumer.py`)
has no media path, so this is north-star training-data-pipeline surface;
the container walk upgrades ``multimodal_mjpeg_scene_cuts``'s elementary
stream to the actual on-disk file format.

Scale shape: pure per-row byte walking inside mapInPandas batches —
embarrassingly parallel, no shuffle, no state; malformed containers
raise a clean ValueError instead of misdecoding.
"""

from __future__ import annotations

import struct

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """One RIFF chunk: fourcc + little-endian size + payload + pad byte
    to word alignment (the declared size EXCLUDES the pad)."""
    out = fourcc + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        out += b"\x00"
    return out


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 25,
    audio: tuple[bytes, int] | None = None,
    audio_format: int = 1,
    audio_block_align: int | None = None,
) -> bytes:
    """Mux JPEG frames into a minimal spec-correct AVI: RIFF('AVI ')
    { LIST hdrl { avih, LIST strl { strh(vids/MJPG), strf(BITMAPINFOHEADER
    biCompression='MJPG') } }, LIST movi { 00dc... }, idx1 }.  idx1
    offsets use the common convention: relative to the position of the
    ``movi`` fourcc (first chunk at offset 4).

    ``audio=(sample_bytes, sample_rate)`` adds a second ``auds`` stream
    (mono, wave format tag ``audio_format``: 1 = 8-bit PCM, 6/7 = G.711
    A-law/mu-law) whose ``01wb`` chunks interleave with the video — one
    audio slice after each frame, the real AV-interleave shape.

    ``audio_format=0x11`` muxes IMA/DVI ADPCM (r11): ``sample_bytes`` is
    the ALREADY-ENCODED block stream from ``adpcm.encode_ima_blocks``
    and ``audio_block_align`` its block size; the strf becomes the
    18-byte WAVEFORMATEX + wSamplesPerBlock extension real ADPCM AVIs
    carry, and slicing falls on BLOCK boundaries only — each block is
    independently decodable (its header carries predictor + step
    index), so a chunk split mid-block would be undecodable."""
    if not frames:
        raise ValueError("AVI: need at least one frame")
    for f in frames:
        if f[:2] != b"\xff\xd8":
            raise ValueError("AVI: frame is not a JPEG (no SOI)")
    if audio is not None and audio_format not in (1, 6, 7, 0x11):
        raise ValueError(f"AVI: unsupported audio format tag {audio_format}")
    if audio is not None and audio_format == 0x11:
        if audio_block_align is None or audio_block_align < 5:
            raise ValueError("AVI: ADPCM audio requires audio_block_align >= 5")
        if len(audio[0]) % audio_block_align:
            raise ValueError("AVI: ADPCM payload is not whole blocks")
    n = len(frames)
    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        _AVIF_HASINDEX,  # dwFlags
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        2 if audio is not None else 1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        width,
        height,
        0,
        0,
        0,
        0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIII",
            0,  # dwFlags
            0,  # wPriority
            0,  # wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate (rate/scale = fps)
            0,  # dwStart
            n,  # dwLength (in frames)
            max_bytes,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (-1: default)
            0,  # dwSampleSize (0: variable-size samples)
            0,  # rcFrame left/top
        )
        + struct.pack("<hh", width, height)  # rcFrame right/bottom
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage
        0,
        0,
        0,
        0,
    )
    strls = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    audio_slices: list[bytes] = []
    if audio is not None:
        pcm, a_rate = audio
        if audio_format == 0x11:
            align = audio_block_align
            spb = (align - 4) * 2 + 1  # mono IMA: header sample + 2/byte
            n_blocks = len(pcm) // align
            a_len = n_blocks * spb  # dwLength in SAMPLES
            a_sample_size = align  # block-based: one "sample unit" = block
        else:
            align, spb = 1, 1
            a_len = len(pcm)  # 1 byte per sample
            a_sample_size = 1
        a_strh = (
            b"auds"
            + b"\x00\x00\x00\x00"  # fccHandler: 0 for waveform audio
            + struct.pack(
                "<IHHIIIIIIIII",
                0,
                0,
                0,
                0,
                1,  # dwScale
                a_rate,  # dwRate (samples/s)
                0,
                a_len,  # dwLength (in samples)
                max(1, len(pcm) // n),  # dwSuggestedBufferSize
                0xFFFFFFFF,
                a_sample_size,  # dwSampleSize
                0,
            )
            + struct.pack("<hh", 0, 0)
        )
        if audio_format == 0x11:
            # WAVEFORMATEX (18 bytes) + wSamplesPerBlock: the shape real
            # IMA-ADPCM AVIs carry (cbSize = 2)
            avg = max(1, a_rate * align // spb)
            a_strf = struct.pack(
                "<HHIIHHHH", 0x11, 1, a_rate, avg, align, 4, 2, spb
            )
            per_blocks = -(-n_blocks // n)  # ceil: whole blocks per frame
            per = per_blocks * align
        else:
            # strf = PCMWAVEFORMAT (16 bytes): tag 1/6/7, mono, 8-bit
            a_strf = struct.pack("<HHIIHH", audio_format, 1, a_rate, a_rate, 1, 8)
            per = -(-len(pcm) // n)  # ceil split: one slice per video frame
        strls += _list(b"strl", _chunk(b"strh", a_strh) + _chunk(b"strf", a_strf))
        audio_slices = [pcm[i * per : (i + 1) * per] for i in range(n)]
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strls)
    movi_payload = bytearray()
    idx = bytearray()

    def add(ckid: bytes, payload: bytes) -> None:
        # idx1 offset: from the 'movi' fourcc to this chunk's ckid; the
        # fourcc itself is 4 bytes, so the first chunk sits at offset 4
        idx.extend(ckid + struct.pack("<III", _AVIIF_KEYFRAME, 4 + len(movi_payload), len(payload)))
        movi_payload.extend(_chunk(ckid, payload))

    for i, f in enumerate(frames):
        add(b"00dc", f)
        if audio_slices and audio_slices[i]:
            add(b"01wb", audio_slices[i])
    movi = _list(b"movi", bytes(movi_payload))
    riff_payload = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return _chunk(b"RIFF", riff_payload)


def _walk(buf: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for each chunk in
    [pos, end), enforcing word alignment and bounds."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError("AVI: truncated chunk header")
        fourcc = buf[pos : pos + 4]
        size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        body = pos + 8
        if body + size > end:
            raise ValueError(f"AVI: chunk {fourcc!r} overruns its parent")
        yield fourcc, body, size
        pos = body + size + (size % 2)


def demux_avi_mjpeg(buf: bytes) -> tuple[dict, list[bytes]]:
    """Parse an AVI container carrying one MJPG video stream; returns
    (meta, frames) where meta has width/height/fps/total_frames from the
    headers and frames are the raw JPEG payloads of the ``##dc`` chunks
    (in file order, ``rec `` interleave lists flattened).  The ``idx1``
    index, when present, is validated entry-by-entry against the actual
    chunk layout; any structural lie raises ValueError."""
    if len(buf) < 12 or buf[:4] != b"RIFF":
        raise ValueError("AVI: not a RIFF file")
    riff_size = struct.unpack("<I", buf[4:8])[0]
    if 8 + riff_size > len(buf):
        raise ValueError("AVI: RIFF size overruns the buffer")
    if buf[8:12] != b"AVI ":
        raise ValueError("AVI: RIFF form is not 'AVI '")
    end = 8 + riff_size
    meta: dict = {}
    frames: list[bytes] = []
    frame_positions: list[tuple[int, int]] = []  # (ckid pos, payload size)
    audio_chunks: list[bytes] = []
    audio_positions: list[tuple[int, int]] = []
    movi_fourcc_pos = -1
    vid_stream = -1
    aud_stream = -1
    idx_payload = None

    def parse_hdrl(body: int, size: int) -> None:
        nonlocal vid_stream, aud_stream
        stream_no = 0
        for cc, b2, s2 in _walk(buf, body, body + size):
            if cc == b"avih":
                if s2 < 40:
                    raise ValueError("AVI: avih too short")
                f = struct.unpack("<10I", buf[b2 : b2 + 40])
                meta["total_frames"] = f[4]
                meta["n_streams"] = f[6]
                meta["width"] = f[8]
                meta["height"] = f[9]
                if f[0] > 0:
                    meta["fps"] = round(1_000_000 / f[0])
            elif cc == b"LIST" and buf[b2 : b2 + 4] == b"strl":
                is_vids = is_auds = False
                for cc3, b3, s3 in _walk(buf, b2 + 4, b2 + s2):
                    if cc3 == b"strh":
                        if s3 < 36:
                            raise ValueError("AVI: strh too short")
                        ftype = buf[b3 : b3 + 4]
                        if ftype == b"vids":
                            is_vids = True
                            if buf[b3 + 4 : b3 + 8] not in (b"MJPG", b"mjpg"):
                                raise ValueError("AVI: video stream is not MJPG")
                            scale, rate = struct.unpack("<II", buf[b3 + 20 : b3 + 28])
                            if scale > 0:
                                meta["fps"] = round(rate / scale)
                        elif ftype == b"auds":
                            is_auds = True
                    elif cc3 == b"strf" and is_vids:
                        if s3 < 40:
                            raise ValueError("AVI: strf too short")
                        comp = buf[b3 + 16 : b3 + 20]
                        if comp not in (b"MJPG", b"mjpg"):
                            raise ValueError("AVI: BITMAPINFOHEADER is not MJPG")
                    elif cc3 == b"strf" and is_auds and aud_stream < 0:
                        # FIRST auds stream only: its strf must describe the
                        # chunks we collect; later audio streams are left
                        # unread (their headers must not overwrite this one)
                        # PCMWAVEFORMAT: tag, channels, rate, avg, align, bits
                        if s3 < 16:
                            raise ValueError("AVI: audio strf too short")
                        tag, a_ch, a_rate, _, a_align, a_bits = struct.unpack(
                            "<HHIIHH", buf[b3 : b3 + 16]
                        )
                        if tag not in (1, 6, 7, 0x11):
                            raise ValueError(
                                f"AVI: audio format tag {tag} not PCM/G.711/ADPCM"
                            )
                        meta["audio"] = {
                            "format": tag,
                            "channels": a_ch,
                            "rate": a_rate,
                            "bits": a_bits,
                        }
                        if tag == 0x11:
                            # IMA ADPCM: block-based — the decoder needs
                            # nBlockAlign, and 4-bit samples are the only
                            # conformant width
                            if a_align < 5:
                                raise ValueError("AVI: ADPCM block align < 5")
                            if a_bits != 4:
                                raise ValueError(
                                    f"AVI: ADPCM bits {a_bits} != 4"
                                )
                            meta["audio"]["block_align"] = a_align
                if is_vids and vid_stream < 0:
                    vid_stream = stream_no
                if is_auds and aud_stream < 0:
                    aud_stream = stream_no
                stream_no += 1

    def collect_movi(body: int, size: int) -> None:
        want = b"%02ddc" % vid_stream if vid_stream >= 0 else b"00dc"
        want_db = want[:2] + b"db"
        want_wb = b"%02dwb" % aud_stream if aud_stream >= 0 else None
        for cc, b2, s2 in _walk(buf, body, body + size):
            if cc == b"LIST" and buf[b2 : b2 + 4] == b"rec ":
                collect_movi(b2 + 4, s2 - 4)
            elif cc in (want, want_db):
                payload = buf[b2 : b2 + s2]
                if payload[:2] != b"\xff\xd8":
                    raise ValueError("AVI: MJPG chunk does not start with SOI")
                frames.append(payload)
                frame_positions.append((b2 - 8, s2))
            elif want_wb is not None and cc == want_wb:
                audio_chunks.append(buf[b2 : b2 + s2])
                audio_positions.append((b2 - 8, s2))

    for cc, body, size in _walk(buf, 12, end):
        if cc == b"LIST":
            lt = buf[body : body + 4]
            if lt == b"hdrl":
                parse_hdrl(body + 4, size - 4)
            elif lt == b"movi":
                movi_fourcc_pos = body
                collect_movi(body + 4, size - 4)
        elif cc == b"idx1":
            idx_payload = (body, size)

    if movi_fourcc_pos < 0:
        raise ValueError("AVI: no movi list")
    if "width" not in meta:
        raise ValueError("AVI: no avih header")
    if idx_payload is not None:
        body, size = idx_payload
        if size % 16:
            raise ValueError("AVI: idx1 size not a multiple of 16")
        entries = [
            struct.unpack_from("<4sIII", buf, body + 16 * i) for i in range(size // 16)
        ]
        vid_entries = [e for e in entries if e[0].endswith((b"dc", b"db"))]
        if len(vid_entries) != len(frame_positions):
            raise ValueError("AVI: idx1 video entry count != movi chunk count")
        # only the COLLECTED audio stream's entries are held to the movi
        # layout — a second audio stream's wb entries are its own business
        want_wb = b"%02dwb" % aud_stream if aud_stream >= 0 else None
        aud_entries = [e for e in entries if want_wb is not None and e[0] == want_wb]
        if len(aud_entries) != len(audio_positions):
            raise ValueError("AVI: idx1 audio entry count != movi chunk count")
        pairs = list(zip(vid_entries, frame_positions)) + list(
            zip(aud_entries, audio_positions)
        )
        if pairs:
            # detect the offset convention from the first entry: relative
            # to the 'movi' fourcc (spec text) or absolute (common in the
            # wild) — then hold EVERY entry (video and audio) to it
            first_pos = pairs[0][1][0]
            if pairs[0][0][2] == first_pos - movi_fourcc_pos:
                absolute = False
            elif pairs[0][0][2] == first_pos:
                absolute = True
            else:
                raise ValueError("AVI: idx1 offset matches neither convention")
            for (ckid, _flags, off, ln), (pos, s2) in pairs:
                expect = pos if absolute else pos - movi_fourcc_pos
                if off != expect or ln != s2:
                    kind = "audio entry" if ckid.endswith(b"wb") else "entry"
                    raise ValueError(f"AVI: idx1 {kind} disagrees with chunk layout")
    if aud_stream >= 0 and "audio" in meta:
        if meta["audio"]["format"] == 0x11:
            # ADPCM blocks are never split across chunks (each block's
            # header seeds its own decode) — a mux that split one has
            # produced undecodable audio; fail loudly, not garbage
            align = meta["audio"]["block_align"]
            for ch in audio_chunks:
                if len(ch) % align:
                    raise ValueError("AVI: ADPCM audio chunk splits a block")
        meta["audio"]["data"] = b"".join(audio_chunks)
    return meta, frames


def decode_avi_audio(meta: dict) -> list[int]:
    """Expand a demuxed ``auds`` stream (``meta['audio']`` from
    ``demux_avi_mjpeg``) to 16-bit-range PCM samples: 8-bit PCM is
    centered (sample - 128 << 8), G.711 A-law/mu-law expands through
    the published 256-entry tables, IMA ADPCM (0x11, r11) decodes
    through ``adpcm.decode_ima_blocks`` — one shared entry point so the
    feature layer never switches on format tags itself."""
    aud = meta.get("audio")
    if aud is None or "data" not in aud:
        raise ValueError("AVI: no collected audio stream")
    data, tag = aud["data"], aud["format"]
    if tag == 1:
        return [(b - 128) << 8 for b in data]
    if tag in (6, 7):
        from realtime_change_data_capture_streaming_spark.llm_ops.multimodal import (
            _G711_ALAW,
            _G711_ULAW,
        )

        table = _G711_ALAW if tag == 6 else _G711_ULAW
        return [table[b] for b in data]
    if tag == 0x11:
        from realtime_change_data_capture_streaming_spark.llm_ops.adpcm import decode_ima_blocks

        chans = decode_ima_blocks(data, aud["channels"], aud["block_align"])
        if len(chans) != 1:
            raise ValueError("AVI: only mono ADPCM audio is muxed here")
        return chans[0]
    raise ValueError(f"AVI: no decoder for audio format tag {tag}")
