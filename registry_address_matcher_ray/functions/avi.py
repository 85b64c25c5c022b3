"""Minimal MJPEG-in-AVI (RIFF) container codec — pure stdlib + numpy.

Un-gates the video frame-sampling stage for the one container this sandbox
can genuinely decode end-to-end: AVI with Motion-JPEG frames, each frame a
baseline JPEG handled by ``functions/jpeg.py``. MP4/ISO-BMFF and non-MJPEG
codecs still raise — that is where libav plugs in, and the error says so.

Writer emits a well-formed single-video-stream AVI (avih + strl/strh/strf
headers, LIST movi with even-padded ``00dc`` chunks); parser is tolerant —
it walks RIFF chunks, recurses into LISTs, collects ``00dc``/``00db`` frame
chunks and reads frame timing from ``avih.dwMicroSecPerFrame`` (falling back
to ``strh`` rate/scale).
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg

__all__ = ["encode_mjpeg_avi", "decode_mjpeg_avi", "iter_avi_frames"]


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(listtype: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", listtype + data)


def encode_mjpeg_avi(frames: List[np.ndarray], fps: int = 10,
                     quality: int = 85) -> bytes:
    """(H, W, 3) uint8 frames -> MJPEG AVI bytes (one video stream)."""
    if not frames:
        raise ValueError("need at least one frame")
    if fps < 1:
        raise ValueError("fps must be >= 1")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    n = len(jpegs)
    usec_per_frame = 1_000_000 // fps
    maxbuf = max(len(j) for j in jpegs)

    avih = struct.pack("<14I", usec_per_frame, maxbuf * fps, 0, 0x10,
                       n, 0, 1, maxbuf, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1, fps, 0, n,
                          maxbuf, -1, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi = _list(b"movi", b"".join(_chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, start: int, end: int):
    i = start
    while i + 8 <= end:
        fourcc = data[i:i + 4]
        size = struct.unpack("<I", data[i + 4:i + 8])[0]
        yield fourcc, i + 8, size
        i += 8 + size + (size & 1)


def iter_avi_frames(payload: bytes) -> Tuple[int, List[bytes]]:
    """AVI bytes -> (usec_per_frame, [jpeg frame bytes...])."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        if payload[4:8] in (b"ftyp", b"moov", b"mdat"):
            raise ValueError(
                "MP4/ISO-BMFF container needs libav; only MJPEG AVI is "
                "decodable library-free")
        raise ValueError("not an AVI (missing RIFF/AVI signature)")
    usec_per_frame = 0
    rate = scale = 0
    frames: List[bytes] = []

    def _scan(start: int, end: int) -> None:
        nonlocal usec_per_frame, rate, scale
        for fourcc, off, size in _walk_chunks(payload, start, end):
            if fourcc == b"LIST":
                _scan(off + 4, off + size)
            elif fourcc == b"avih" and size >= 4:
                usec_per_frame = struct.unpack(
                    "<I", payload[off:off + 4])[0]
            elif fourcc == b"strh" and size >= 32:
                if payload[off:off + 4] == b"vids":
                    if payload[off + 4:off + 8] not in (b"MJPG", b"mjpg"):
                        raise ValueError(
                            "non-MJPEG video codec "
                            f"{payload[off + 4:off + 8]!r} needs libav")
                    scale, rate = struct.unpack(
                        "<II", payload[off + 20:off + 28])
            elif fourcc[2:] in (b"dc", b"db"):
                frames.append(payload[off:off + size])

    _scan(12, len(payload))
    if not usec_per_frame and rate:
        usec_per_frame = int(1_000_000 * scale / rate) if scale else 0
    return usec_per_frame or 100_000, frames


def decode_mjpeg_avi(payload: bytes) -> Tuple[int, List[np.ndarray]]:
    """AVI bytes -> (usec_per_frame, [(H, W, 3) uint8 frames...])."""
    usec, jpegs = iter_avi_frames(payload)
    return usec, [decode_jpeg(j) for j in jpegs]
