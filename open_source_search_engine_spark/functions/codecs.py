"""Real pure-Python media codecs: BMP (image), WAV (audio), AVI (video).

The reference routes non-HTML payloads through per-content-type converters
(`HttpMime.h:17-39` CT_* table; antiword/pstotext/pdftohtml in
`XmlDoc.cpp`); the training-data analog is an in-process codec per media
type. This container has no media libraries, so these are spec-conformant
encoders/decoders for three UNCOMPRESSED container formats, written with
struct+numpy only:

 * BMP  -- 24-bit uncompressed DIB (BITMAPFILEHEADER + BITMAPINFOHEADER,
           bottom-up or top-down rows, BGR, 4-byte row stride).
 * WAV  -- RIFF/WAVE, PCM16 mono (proper chunk walk, not fixed offsets).
 * AVI  -- RIFF/AVI with hdrl(avih + strl(strh/strf)) + movi('00db'
           uncompressed DIB frames) + idx1.

Encode->decode round-trips bit-exactly (gated in tests/test_multimodal.py),
and decode accepts any conformant writer's output, so swapping in real
camera/microphone payloads needs no Spark-side change.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# BMP


def _bmp_stride(width: int) -> int:
    return ((width * 3 + 3) // 4) * 4


def bmp_size(width: int, height: int) -> int:
    """Exact encoded size of a 24-bit BMP (used by the SQL oracle)."""
    return 54 + _bmp_stride(width) * height


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP bytes."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("encode_bmp expects (h, w, 3) RGB")
    stride = _bmp_stride(w)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    file_header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_header + info_header + data


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """BMP bytes -> (width, height, (h, w, 3) uint8 RGB).

    Accepts bottom-up (height > 0) and top-down (height < 0) 24-bit DIBs.
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    _, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={comp}")
    top_down = h < 0
    h = abs(h)
    stride = _bmp_stride(w)
    rows = np.frombuffer(payload, np.uint8, stride * h, pix_off).reshape(
        h, stride
    )
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1] if top_down else bgr[::-1, :, ::-1]
    return w, h, rgb.copy()


# ---------------------------------------------------------------------------
# WAV


def wav_size(n_samples: int) -> int:
    """Exact encoded size of a PCM16-mono WAV (used by the SQL oracle)."""
    return 44 + 2 * n_samples


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM bytes."""
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return b"".join(
        [
            b"RIFF",
            struct.pack("<I", 4 + (8 + len(fmt)) + (8 + len(data))),
            b"WAVE",
            b"fmt ",
            struct.pack("<I", len(fmt)),
            fmt,
            b"data",
            struct.pack("<I", len(data)),
            data,
        ]
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE bytes -> (sample_rate, int16 mono samples).

    Walks the chunk list (any chunk order, pad bytes honored) rather than
    assuming the canonical 44-byte layout.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAVE payload")
    pos, end = 12, 8 + struct.unpack_from("<I", payload, 4)[0]
    sample_rate, data = None, None
    while pos + 8 <= min(end, len(payload)):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if tag == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from(
                "<HHI", payload, body
            )
            (bits,) = struct.unpack_from("<H", payload, body + 14)
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: fmt={audio_fmt} ch={channels} bits={bits}"
                )
        elif tag == b"data":
            data = np.frombuffer(payload, "<i2", size // 2, body).copy()
        pos = body + size + (size & 1)
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    return sample_rate, data


# ---------------------------------------------------------------------------
# AVI (RIFF, uncompressed 24-bit DIB frames)

_AVIH = struct.Struct("<IIIIIIIIIIIIII")  # 56-byte main header
_STRH = struct.Struct("<4s4sIHHIIIIIIIIhhhh")  # 56-byte stream header


def avi_size(width: int, height: int, n_frames: int) -> int:
    """Exact encoded size of encode_avi output (used by the SQL oracle)."""
    frame = _bmp_stride(width) * height
    #      RIFF hdr  hdrl LIST            movi LIST                 idx1
    return 12 + (12 + 64 + 12 + 64 + 48) + (12 + n_frames * (8 + frame)) + (
        8 + 16 * n_frames
    )


def encode_avi(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """List of (h, w, 3) uint8 RGB frames -> RIFF/AVI bytes (BI_RGB DIBs)."""
    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w, _ = frames[0].shape
    stride = _bmp_stride(w)
    frame_size = stride * h

    def dib(px: np.ndarray) -> bytes:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = np.ascontiguousarray(px, dtype=np.uint8)[
            ::-1, :, ::-1
        ].reshape(h, w * 3)
        return rows.tobytes()

    avih = b"avih" + struct.pack("<I", 56) + _AVIH.pack(
        1_000_000 // fps, frame_size * fps, 0, 0x10, len(frames), 0, 1,
        frame_size, w, h, 0, 0, 0, 0,
    )
    strh = b"strh" + struct.pack("<I", 56) + _STRH.pack(
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, len(frames), frame_size,
        0xFFFFFFFF, frame_size, 0, 0, w, h,
    )
    strf = b"strf" + struct.pack("<I", 40) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0
    )
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) + b"strl" \
        + strh + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih) + len(strl)) + b"hdrl" \
        + avih + strl

    chunks, index, off = [], [], 4  # offsets relative to 'movi' fourcc
    for px in frames:
        body = dib(px)
        chunks.append(b"00db" + struct.pack("<I", len(body)) + body)
        index.append(struct.pack("<4sIII", b"00db", 0x10, off, len(body)))
        off += 8 + len(body)
    movi_body = b"".join(chunks)
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" \
        + movi_body
    idx1 = b"idx1" + struct.pack("<I", 16 * len(index)) + b"".join(index)

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes) -> tuple[int, list[np.ndarray]]:
    """RIFF/AVI bytes -> (fps, list of (h, w, 3) uint8 RGB frames)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")

    fps, w, h, frames = None, None, None, []
    last_stream = None  # fourcc of the preceding strh in this strl

    def walk(pos: int, end: int) -> None:
        nonlocal fps, w, h, last_stream
        while pos + 8 <= end:
            tag = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body = pos + 8
            if tag == b"LIST":
                walk(body + 4, body + size)
            elif tag == b"strh":
                s = _STRH.unpack_from(payload, body)
                last_stream = s[0]
                if s[0] == b"vids":
                    fps = s[7] // max(1, s[6])  # rate / scale
            elif tag == b"strf" and last_stream == b"vids":
                # gate on the VIDEO stream's strl: a later audio strl's
                # strf is a WAVEFORMATEX whose bytes would otherwise be
                # misread as <Iii> and clobber w/h
                _, w, h = struct.unpack_from("<Iii", payload, body)
            elif tag[2:] == b"db":
                if w is None or h is None:
                    # frame chunk with no prior strf (hdrl absent or
                    # ordered after movi): the documented error contract
                    # is ValueError, not a TypeError from None arithmetic
                    raise ValueError("AVI frame before stream format")
                top_down = h < 0
                ah = abs(h)
                stride = _bmp_stride(w)
                rows = np.frombuffer(payload, np.uint8, stride * ah, body)
                bgr = rows.reshape(ah, stride)[:, : w * 3].reshape(ah, w, 3)
                # same DIB orientation rule as decode_bmp: negative strf
                # height = top-down rows
                frames.append(
                    (bgr[:, :, ::-1] if top_down else bgr[::-1, :, ::-1])
                    .copy()
                )
            pos = body + size + (size & 1)

    walk(12, 8 + struct.unpack_from("<I", payload, 4)[0])
    if fps is None or not frames:
        raise ValueError("AVI missing stream header or frames")
    return fps, frames


# ---------------------------------------------------------------------------
# sniffing


def sniff_media(payload: bytes) -> str | None:
    """Content-type sniff by magic bytes (HttpMime.h:17-39 analog):
    'bmp' | 'wav' | 'avi' | None."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF":
        if payload[8:12] == b"WAVE":
            return "wav"
        if payload[8:12] == b"AVI ":
            return "avi"
    return None
