"""Pure-numpy media codecs for the container formats that need no external
libraries: PPM (P6) and BMP (24-bit uncompressed) images, WAV (PCM16) audio.

The multimodal stages (``stages/multimodal.py``) are actor-pool ``map_batches``
plumbing over opaque binary payloads; with these codecs the ``codec="real"``
path genuinely decodes pixels/samples for the uncompressed formats (compressed
formats — JPEG/PNG/MP4 — still raise, marking where PIL/libav would plug in).
All functions are deterministic and vectorized (header parsing aside).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_image", "encode_ppm", "encode_bmp",
    "decode_wav", "encode_wav",
    "resize_nearest",
]


# ------------------------------------------------------------------ images

def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM (P6)."""
    h, w, c = arr.shape
    assert c == 3
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def _decode_ppm(payload: bytes) -> np.ndarray:
    # P6 <ws> width <ws> height <ws> maxval <single ws> raster
    fields: list[bytes] = []
    i = 2  # past 'P6'
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to EOL
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(payload[i:j])
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = (int(f) for f in fields)
    if maxval != 255:
        raise ValueError(f"PPM maxval {maxval} unsupported (8-bit only)")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return raster.reshape(h, w, 3).copy()


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed bottom-up BMP."""
    h, w, c = arr.shape
    assert c == 3
    row = w * 3
    pad = (-row) % 4
    stride = row + pad
    img_size = stride * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    # bottom-up rows, BGR order, zero-padded to 4-byte stride
    bgr = arr[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row] = bgr.reshape(h, row)
    return header + rows.tobytes()


def _decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("BMP core headers unsupported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"BMP bpp={bpp} compression={compression} unsupported")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raster = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                           offset=data_off).reshape(h, stride)
    bgr = raster[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    if not top_down:
        rgb = rgb[::-1]
    return rgb.copy()


def decode_image(payload: bytes) -> np.ndarray:
    """payload -> (H, W, 3) uint8 RGB. PPM(P6) and 24-bit BMP only."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise ValueError(
        "unsupported image format (PPM P6 / 24-bit BMP only; JPEG/PNG need "
        "an external codec)")


def resize_nearest(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure-numpy fancy indexing (vectorized)."""
    h, w = arr.shape[:2]
    ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    return arr[ys[:, None], xs[None, :]]


# ------------------------------------------------------------------ audio

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """1-D int16 samples -> mono PCM16 WAV bytes."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, 1,
        sample_rate, sample_rate * 2, 2, 16, b"data", len(pcm),
    )
    return hdr + pcm


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAV bytes -> (samples float32 in [-1, 1], sample_rate).

    Walks the RIFF chunk list (fmt may be followed by LIST/fact chunks)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    i = 12
    rate, bits, channels = None, None, None
    samples = None
    while i + 8 <= len(payload):
        cid, size = payload[i : i + 4], struct.unpack_from("<I", payload, i + 4)[0]
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1 or bits != 16:
                raise ValueError(f"WAV fmt={fmt} bits={bits} unsupported (PCM16 only)")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        i += 8 + size + (size & 1)
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    if channels and channels > 1:
        samples = samples[: len(samples) - len(samples) % channels]
        samples = samples.reshape(-1, channels).mean(axis=1).astype(np.int16)
    return samples.astype(np.float32) / 32768.0, int(rate)
