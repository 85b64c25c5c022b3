"""Pure-stdlib/numpy media codecs for the formats that need no external
libraries: PPM (P6) and BMP (24-bit uncompressed) images, PNG (8-bit,
non-interlaced — stdlib ``zlib`` inflate + numpy scanline unfiltering),
WAV (PCM16) and FLAC (``functions/flac.py``) audio; JPEG (baseline +
progressive) lives in ``functions/jpeg.py`` and MJPEG-AVI video in
``functions/avi.py``.

The multimodal stages (``stages/multimodal.py``) are actor-pool ``map_batches``
plumbing over opaque binary payloads; with these codecs the ``codec="real"``
path genuinely decodes pixels/samples for PPM/BMP/PNG/JPEG/WAV/FLAC/MJPEG
(MP4/H.264 and MP3 still raise, marking where libav would plug in). All
functions are deterministic; PNG's Average/Paeth filters carry a left-pixel
dependency that forces a per-pixel inner loop (None/Sub/Up rows are fully
vectorized).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "decode_image", "encode_ppm", "encode_bmp", "encode_png", "decode_png",
    "decode_audio", "decode_wav", "encode_wav",
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


# ------------------------------------------------------------------ PNG
# Library-free PNG (ISO/IEC 15948): stdlib zlib handles the DEFLATE stream,
# numpy the scanline unfiltering. Supported: bit depth 8, color types
# 0 (gray) / 2 (RGB) / 3 (palette) / 4 (gray+alpha) / 6 (RGBA), no Adam7
# interlace. That covers the overwhelming majority of crawl PNGs; 16-bit and
# interlaced files raise with a precise message.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(payload: bytes):
    i = 8
    while i + 8 <= len(payload):
        size = struct.unpack_from(">I", payload, i)[0]
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + size]
        crc = struct.unpack_from(">I", payload, i + 8 + size)[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        i += 12 + size
        if ctype == b"IEND":
            return


def _unfilter_png(raw: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse per-scanline filtering: rows of (1 filter byte + w*ch bytes)."""
    stride = w * ch
    rows = raw.reshape(h, 1 + stride)
    out = np.zeros((h, stride), np.uint8)
    zero_prev = np.zeros(stride, np.int32)
    for r in range(h):
        ft = int(rows[r, 0])
        line = rows[r, 1:].astype(np.int32)
        prev = out[r - 1].astype(np.int32) if r else zero_prev
        if ft == 0:                                   # None
            cur = line
        elif ft == 1:                                 # Sub: lane cumsum mod 256
            lanes = line.reshape(w, ch)
            cur = np.cumsum(lanes, axis=0, dtype=np.int64).reshape(stride) % 256
        elif ft == 2:                                 # Up
            cur = (line + prev) % 256
        elif ft in (3, 4):                            # Average / Paeth
            cur = np.zeros(stride, np.int32)
            left = np.zeros(ch, np.int32)
            upleft = np.zeros(ch, np.int32)
            for x in range(w):                        # left-dep: per-pixel,
                s = x * ch                            # vectorized over channels
                up = prev[s : s + ch]
                if ft == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - upleft
                    da, db, dc = (np.abs(p - left), np.abs(p - up),
                                  np.abs(p - upleft))
                    pred = np.where((da <= db) & (da <= dc), left,
                                    np.where(db <= dc, up, upleft))
                cur[s : s + ch] = (line[s : s + ch] + pred) % 256
                left = cur[s : s + ch]
                upleft = up
        else:
            raise ValueError(f"PNG filter type {ft} invalid")
        out[r] = cur.astype(np.uint8)
    return out.reshape(h, w, ch)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, 3) uint8 RGB (alpha dropped, palette expanded)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = None
    idat = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"PNG bit depth {depth} unsupported (8-bit only)")
    if comp or filt:
        raise ValueError("PNG nonstandard compression/filter method")
    if interlace:
        raise ValueError("PNG Adam7 interlace unsupported")
    if ctype_ not in _PNG_CHANNELS:
        raise ValueError(f"PNG color type {ctype_} unsupported")
    ch = _PNG_CHANNELS[ctype_]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if len(raw) != h * (1 + w * ch):
        raise ValueError("PNG IDAT length mismatch")
    img = _unfilter_png(raw, h, w, ch)
    if ctype_ == 2:
        return img.copy()
    if ctype_ == 6:
        return img[:, :, :3].copy()
    if ctype_ == 0:
        return np.repeat(img, 3, axis=2)
    if ctype_ == 4:
        return np.repeat(img[:, :, :1], 3, axis=2)
    if plte is None:
        raise ValueError("palette PNG missing PLTE")
    return plte[img[:, :, 0]]


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W, 3) uint8 RGB -> PNG bytes, every scanline filtered with
    ``filter_type`` (0-4) — exercising all five filters in roundtrip tests."""
    h, w, c = arr.shape
    assert c == 3
    a = np.ascontiguousarray(arr, np.uint8).astype(np.int32)
    zero = np.zeros((1, w, 3), np.int32)
    up = np.concatenate([zero, a[:-1]], axis=0)
    left = np.concatenate([np.zeros((h, 1, 3), np.int32), a[:, :-1]], axis=1)
    upleft = np.concatenate([np.zeros((h, 1, 3), np.int32), up[:, :-1]],
                            axis=1)
    if filter_type == 0:
        filtered = a
    elif filter_type == 1:
        filtered = a - left
    elif filter_type == 2:
        filtered = a - up
    elif filter_type == 3:
        filtered = a - ((left + up) >> 1)
    elif filter_type == 4:
        p = left + up - upleft
        da, db, dc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where((da <= db) & (da <= dc), left,
                        np.where(db <= dc, up, upleft))
        filtered = a - pred
    else:
        raise ValueError(f"filter_type {filter_type} invalid")
    rows = (filtered % 256).astype(np.uint8).reshape(h, w * 3)
    raw = np.concatenate(
        [np.full((h, 1), filter_type, np.uint8), rows], axis=1).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def decode_image(payload: bytes, dri_workers: int | None = None) -> np.ndarray:
    """payload -> (H, W, 3) uint8 RGB. PPM(P6), 24-bit BMP, 8-bit PNG,
    baseline + progressive JPEG (SOF0/SOF2 via functions/jpeg.py;
    arithmetic/lossless/12-bit JPEG still raise there).

    ``dri_workers > 1`` fans baseline-JPEG restart segments out on a
    process pool (see ``jpeg.decode_jpeg``); other formats ignore it."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload, dri_workers=dri_workers)
    raise ValueError(
        "unsupported image format (PPM P6 / 24-bit BMP / 8-bit PNG / "
        "baseline+progressive JPEG)")


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


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """payload -> (mono float32 samples in [-1, 1], sample_rate).
    PCM16 WAV or FLAC (functions/flac.py), dispatched by magic bytes —
    the audio analogue of :func:`decode_image`."""
    if payload[:4] == b"fLaC":
        from .flac import decode_flac

        return decode_flac(payload)
    return decode_wav(payload)


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
