"""Baseline JPEG (ITU-T T.81) codec — pure stdlib + numpy, no PIL/libjpeg.

Closes the last gated image format in the multimodal family
(``stages/multimodal.py``; reference has no media ops — this is north-star
surface, not §2 parity). Scope, honestly stated:

- **decode**: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
  arbitrary JFIF sampling factors (4:4:4 / 4:2:2 / 4:2:0 via ``np.repeat``
  upsampling), restart markers (DRI/RSTn), stuffed-byte removal. Progressive
  (SOF2), arithmetic coding and 12-bit precision raise ``ValueError`` — the
  gate moved from "all JPEG" to exactly those variants.
- **encode**: baseline 4:4:4 (and grayscale) with the Annex-K quantization
  and Huffman tables, libjpeg-style quality scaling — enough to build test
  fixtures and act as a sink; not a rate-optimized encoder.

The entropy decode is a per-block Python loop over a numpy bit cursor (JPEG
Huffman streams are inherently serial); everything after entropy decode —
dequantize, un-zigzag, IDCT over ALL blocks at once (one ``einsum`` against
the orthonormal DCT-II basis), chroma upsampling, YCbCr→RGB — is vectorized.
In the engine this runs inside the multimodal actor pool, one image per
worker at a time, so single-image decode speed bounds per-core throughput
(documented; a C codec drops in behind the same ``decode_image`` dispatch).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

# zigzag order: index i of this array = position in the 8x8 block (row-major)
# of the i-th coefficient in zigzag scan order
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# orthonormal DCT-II basis: pixel = C.T @ coef @ C, coef = C @ pixel @ C.T
_C = np.array([[(np.sqrt(1.0 / 8.0) if k == 0 else np.sqrt(2.0 / 8.0))
                * np.cos((2 * n + 1) * k * np.pi / 16.0)
                for n in range(8)] for k in range(8)])

# Annex K (Tables K.1/K.2) quantization tables, row-major
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K Huffman specs: (bits[1..16] counts, values)
_DC_LUMA_SPEC = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                 list(range(12)))
_DC_CHROMA_SPEC = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                   list(range(12)))
_AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _build_huffman_codes(bits: List[int], values: List[int]) -> Dict[int, Tuple[int, int]]:
    """T.81 C.2: value -> (code, length)."""
    out: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_huffman_decoder(bits: List[int], values: List[int]):
    """(length -> {code: value}) plus min/max code per length, for decode."""
    table: Dict[int, Dict[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        if bits[length - 1]:
            table[length] = {}
            for _ in range(bits[length - 1]):
                table[length][code] = values[k]
                code += 1
                k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit cursor over an entropy-coded segment with stuffed
    0xFF00 already removed; restart markers handled by the caller."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_huff(br: _BitReader, table: Dict[int, Dict[int, int]]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        lt = table.get(length)
        if lt is not None and code in lt:
            return lt[code]
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (H, W, 3) uint8 RGB (grayscale replicated)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, dict] = {}
    huff_ac: Dict[int, dict] = {}
    frame: Optional[dict] = None
    restart_interval = 0
    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = struct.unpack(">H", payload[i:i + 2])[0]
        seg = payload[i + 2:i + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                tbl = np.frombuffer(seg[p:p + 64], dtype=np.uint8).astype(np.int64)
                q = np.zeros(64, dtype=np.int64)
                q[_ZIGZAG] = tbl  # stored in zigzag order
                qt[tq] = q.reshape(8, 8)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                dec = _build_huffman_decoder(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], \
                struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "progressive/extended/arithmetic JPEG unsupported "
                f"(SOF marker 0xFF{marker:02X}); baseline SOF0 only")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scomps.append({"id": cs, "td": tt >> 4, "ta": tt & 0xF})
            data_start = i + seglen
            return _decode_scan(payload, data_start, frame, scomps, qt,
                                huff_dc, huff_ac, restart_interval)
        # else: APPn/COM/unknown -> skip
        i += seglen
    raise ValueError("no SOS scan found in JPEG")


def _decode_scan(payload, start, frame, scomps, qt, huff_dc, huff_ac,
                 restart_interval):
    if frame is None:
        raise ValueError("SOS before SOF0")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # split entropy stream on restart markers; unstuff 0xFF00 per segment
    segments: List[bytes] = []
    cur = bytearray()
    i = start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b == 0xFF:
            m = payload[i + 1] if i + 1 < n else 0xD9
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["id"]] for s in scomps]
    td = {s["id"]: s["td"] for s in scomps}
    ta = {s["id"]: s["ta"] for s in scomps}

    # per component: coefficient array (blocks_y, blocks_x, 8, 8)
    planes = {}
    for c in comps:
        planes[c["id"]] = np.zeros(
            (mcuy * c["v"], mcux * c["h"], 8, 8), dtype=np.int64)

    pred = {c["id"]: 0 for c in comps}
    seg_idx = 0
    br = _BitReader(segments[0])
    total_mcus = mcux * mcuy
    for mi in range(total_mcus):
        if restart_interval and mi and mi % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing JPEG restart segment")
            br = _BitReader(segments[seg_idx])
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(mi, mcux)
        for comp in order:
            cid = comp["id"]
            dc_tab = huff_dc[td[cid]]
            ac_tab = huff_ac[ta[cid]]
            for vy in range(comp["v"]):
                for vx in range(comp["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    t = _decode_huff(br, dc_tab)
                    diff = _extend(br.read_bits(t), t)
                    pred[cid] += diff
                    zz[0] = pred[cid]
                    k = 1
                    while k < 64:
                        rs = _decode_huff(br, ac_tab)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(br.read_bits(s), s)
                        k += 1
                    blk = np.zeros(64, dtype=np.int64)
                    blk[_ZIGZAG] = zz
                    planes[cid][my * comp["v"] + vy,
                                mx * comp["h"] + vx] = blk.reshape(8, 8)

    # vectorized dequantize + IDCT per component, then upsample to full res
    out_planes = []
    for comp in comps:
        cid = comp["id"]
        coefs = planes[cid].astype(np.float64) * qt[comp["tq"]][None, None]
        pix = np.einsum("km,bykl,ln->bymn", _C, coefs, _C,
                        optimize=True)  # C.T @ coef @ C over all blocks
        by, bx = coefs.shape[:2]
        img = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        # upsample to (mcuy*vmax*8, mcux*hmax*8) then crop
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1:
            img = np.repeat(img, ry, axis=0)
        if rx > 1:
            img = np.repeat(img, rx, axis=1)
        out_planes.append(img[:h, :w])

    if len(out_planes) == 1:
        y = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ encoder

class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per T.81
        return bytes(self.buf)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = np.clip((q * s + 50) // 100, 1, 255)
    return t.astype(np.int64)


def _csize(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    dc = int(zz[0])
    diff = dc - pred
    t = _csize(diff)
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _csize(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) float centered plane -> (by, bx, 64) quantized zigzag coefs."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("km,bymn,ln->bykl", _C, blocks, _C, optimize=True)
    qd = np.round(coef / q[None, None]).astype(np.int64)
    # scan[i] = flat_block[_ZIGZAG[i]]: gathering by _ZIGZAG IS the forward
    # zigzag (the decoder's scatter blk[_ZIGZAG] = zz is its exact inverse)
    return qd.reshape(by, bx, 64)[..., _ZIGZAG]


def encode_jpeg(arr: np.ndarray, quality: int = 85,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """(H, W, 3) or (H, W) uint8 -> baseline JFIF JPEG bytes.

    ``subsampling``: ``"444"`` (no chroma subsampling) or ``"420"`` (2x2 box
    average — exercises a decoder's upsampling path). ``restart_interval``:
    emit DRI + RSTn markers every N MCUs (0 = none).
    """
    gray = arr.ndim == 2
    if not gray and arr.shape[2] != 3:
        raise ValueError("expected (H,W) or (H,W,3) uint8")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = arr.shape[:2]
    a = arr.astype(np.float64)
    if gray:
        planes = [("y", a, 1, 1)]
    else:
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            # pad to even, 2x2 box-average the chroma planes
            eh, ew = -(-h // 2) * 2, -(-w // 2) * 2

            def _half(p):
                p = np.pad(p, ((0, eh - h), (0, ew - w)), mode="edge")
                return p.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))

            planes = [("y", y, 2, 2), ("cb", _half(cb), 1, 1),
                      ("cr", _half(cr), 1, 1)]
        else:
            planes = [("y", y, 1, 1), ("cb", cb, 1, 1), ("cr", cr, 1, 1)]

    hmax = max(p[2] for p in planes)
    vmax = max(p[3] for p in planes)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    qy = _quality_scale(_Q_LUMA, quality).reshape(8, 8)
    qc = _quality_scale(_Q_CHROMA, quality).reshape(8, 8)

    dc_y = _build_huffman_codes(*_DC_LUMA_SPEC)
    ac_y = _build_huffman_codes(*_AC_LUMA_SPEC)
    dc_c = _build_huffman_codes(*_DC_CHROMA_SPEC)
    ac_c = _build_huffman_codes(*_AC_CHROMA_SPEC)

    coefs = []
    for name, p, ch, cv in planes:
        q = qy if name == "y" else qc
        th, tw = mcuy * cv * 8, mcux * ch * 8
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                   mode="edge")
        coefs.append(_fdct_quant(p - 128.0, q.astype(np.float64)))

    segments: List[bytes] = []
    bw = _BitWriter()
    preds = [0] * len(planes)
    total_mcus = mcux * mcuy
    for mi in range(total_mcus):
        if restart_interval and mi and mi % restart_interval == 0:
            segments.append(bw.flush())
            bw = _BitWriter()
            preds = [0] * len(planes)
        myy, mxx = divmod(mi, mcux)
        for ci, (name, _, ch, cv) in enumerate(planes):
            dcc = dc_y if name == "y" else dc_c
            acc = ac_y if name == "y" else ac_c
            for vy in range(cv):
                for vx in range(ch):
                    preds[ci] = _encode_block(
                        bw, coefs[ci][myy * cv + vy, mxx * ch + vx],
                        preds[ci], dcc, acc)
    segments.append(bw.flush())
    scan = bytearray()
    for si, segb in enumerate(segments):
        scan += segb
        if si < len(segments) - 1:
            scan += bytes([0xFF, 0xD0 + (si % 8)])

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HHBB", 1, 1, 0, 0)

    def _dqt(tid, q):
        z = np.zeros(64, dtype=np.int64)
        z = q.reshape(64)[_ZIGZAG]  # store in zigzag order
        return b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(v) for v in z)

    out += _dqt(0, qy)
    if not gray:
        out += _dqt(1, qc)

    nc = 1 if gray else 3
    sof = struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    y_hv = (planes[0][2] << 4) | planes[0][3]
    sof += bytes([1, y_hv, 0])
    if not gray:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    out += b"\xff\xc0" + sof

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def _dht(tc, th, spec):
        bits, vals = spec
        return (b"\xff\xc4"
                + struct.pack(">HB", 19 + len(vals), (tc << 4) | th)
                + bytes(bits) + bytes(vals))

    out += _dht(0, 0, _DC_LUMA_SPEC) + _dht(1, 0, _AC_LUMA_SPEC)
    if not gray:
        out += _dht(0, 1, _DC_CHROMA_SPEC) + _dht(1, 1, _AC_CHROMA_SPEC)

    sos = struct.pack(">HB", 6 + 2 * nc, nc) + bytes([1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + sos
    out += scan
    out += b"\xff\xd9"
    return bytes(out)
