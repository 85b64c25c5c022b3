"""Pure-numpy/stdlib FLAC codec (decode + fixture encoder).

Closes the "audio beyond WAV" transport gap the same way ``functions/jpeg.py``
closed images: a library-free decoder for the lossless audio format real
crawls actually carry, behind the same ``decode_audio`` dispatch the
actor-pool stage uses (``stages/multimodal.py AudioFeatureActor``).

- **decode**: CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32) subframes, Rice
  residuals (both 4- and 5-bit parameter methods, escape partitions), wasted
  bits, all four channel assignments (independent, left/side, right/side,
  mid/side), 8/12/16/20/24-bit samples, fixed and variable blocking. Frame
  CRCs are consumed but not verified (crawl tolerance); subset-breaking
  features raise loud ``ValueError``s.
- **encode** (the fixture/export side): 16-bit mono/stereo, FIXED predictor
  orders 0-2 chosen per frame by residual magnitude, Rice-coded residuals
  with per-partition parameter fit, CONSTANT short-circuit, real CRC-8/16 —
  spec-valid output that exercises every decoder path the tests pin.

Like the JPEG codec the per-sample entropy loops are Python — honest about
throughput, shaped for actor pools (decode state is stateless; batch small).
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

__all__ = ["decode_flac", "decode_flac_pcm", "encode_flac"]

_MAGIC = b"fLaC"

_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}

_BLOCKSIZE_TBL = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                  8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                  13: 8192, 14: 16384, 15: 32768}
_RATE_TBL = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
             7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BPS_TBL = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


class _Bits:
    """MSB-first bit cursor over bytes (decode side)."""

    __slots__ = ("d", "pos", "bit")

    def __init__(self, d: bytes):
        self.d = d
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        while n:
            if self.pos >= len(self.d):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(n, avail)
            chunk = (self.d[self.pos] >> (avail - take)) & ((1 << take) - 1)
            v = (v << take) | chunk
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _read_utf8_number(br: _Bits) -> int:
    """FLAC frame/sample number: UTF-8-style coding extended to 36 bits."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    if n < 2 or n > 7:
        raise ValueError("invalid FLAC UTF-8 coded number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid FLAC UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _rice_residual(br: _Bits, n: int, predictor_order: int) -> List[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    parts = 1 << porder
    if n % parts:
        raise ValueError("FLAC partition count does not divide block size")
    out: List[int] = []
    per = n >> porder
    for p in range(parts):
        cnt = per - predictor_order if p == 0 else per
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            out.extend(br.read_signed(raw) if raw else 0 for _ in range(cnt))
        else:
            for _ in range(cnt):
                q = br.read_unary()
                v = (q << param) | br.read(param)
                out.append((v >> 1) ^ -(v & 1))  # unzigzag
    return out


def _subframe(br: _Bits, n: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("FLAC subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    bps -= wasted

    if t == 0:  # CONSTANT
        out = np.full(n, br.read_signed(bps), dtype=np.int64)
    elif t == 1:  # VERBATIM
        out = np.fromiter((br.read_signed(bps) for _ in range(n)),
                          dtype=np.int64, count=n)
    elif 8 <= t <= 12 or (t >> 5):  # FIXED (001xxx) or LPC (1xxxxx)
        if t >> 5:
            order = (t & 0x1F) + 1
        else:
            order = t & 0x7
            if order > 4:
                raise ValueError(f"reserved FLAC fixed order {order}")
        warm = [br.read_signed(bps) for _ in range(order)]
        if t >> 5:  # LPC: quantized coefficients + shift
            prec = br.read(4)
            if prec == 0xF:
                raise ValueError("invalid FLAC LPC precision")
            prec += 1
            shift = br.read_signed(5)
            if shift < 0:
                raise ValueError("negative FLAC LPC shift")
            coef = [br.read_signed(prec) for _ in range(order)]
        else:
            coef, shift = _FIXED_COEF[order], 0
        res = _rice_residual(br, n, order)
        out = np.empty(n, dtype=np.int64)
        out[:order] = warm
        a = out  # integer prediction must match the encoder exactly
        for i in range(order, n):
            p = 0
            for j, c in enumerate(coef):
                p += c * int(a[i - 1 - j])
            a[i] = res[i - order] + (p >> shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {t:#08b}")
    return out << wasted if wasted else out


def decode_flac_pcm(payload: bytes) -> Tuple[np.ndarray, int, int]:
    """FLAC bytes -> (samples int32 (n, channels), sample_rate, bits)."""
    if payload[:4] != _MAGIC:
        raise ValueError("not a FLAC payload (missing fLaC magic)")
    i = 4
    info = None
    while True:
        hdr = payload[i]
        last, btype = hdr >> 7, hdr & 0x7F
        length = int.from_bytes(payload[i + 1:i + 4], "big")
        body = payload[i + 4:i + 4 + length]
        if btype == 0:  # STREAMINFO
            br = _Bits(body)
            br.read(16), br.read(16), br.read(24), br.read(24)
            rate = br.read(20)
            chans = br.read(3) + 1
            bits = br.read(5) + 1
            total = br.read(36)
            info = (rate, chans, bits, total)
        i += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, chans, bits, total = info

    br = _Bits(payload)
    br.pos = i
    chunks: List[np.ndarray] = []
    got = 0
    while br.pos < len(payload) and (total == 0 or got < total):
        if br.read(14) != 0x3FFE:
            raise ValueError("bad FLAC frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy (the coded number is skipped anyway)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code 0")
        n = _BLOCKSIZE_TBL.get(bs_code)
        if bs_code == 6:
            n = br.read(8) + 1
        elif bs_code == 7:
            n = br.read(16) + 1
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample rate code")
        fbps = bits if bps_code == 0 else _BPS_TBL.get(bps_code)
        if fbps is None:
            raise ValueError(f"reserved FLAC sample size code {bps_code}")
        br.read(8)  # header CRC-8 (consumed, not verified)

        if ch_code < 8:
            nch = ch_code + 1
            subs = [_subframe(br, n, fbps) for _ in range(nch)]
            frame = np.stack(subs, axis=1)
        elif ch_code in (8, 9, 10):
            extra = (0, 1) if ch_code == 8 else (1, 0) if ch_code == 9 \
                else (0, 1)
            c0 = _subframe(br, n, fbps + extra[0])
            c1 = _subframe(br, n, fbps + extra[1])
            if ch_code == 8:  # left/side
                left, right = c0, c0 - c1
            elif ch_code == 9:  # side/right
                left, right = c0 + c1, c1
            else:  # mid/side
                mid2 = (c0 << 1) | (c1 & 1)
                left, right = (mid2 + c1) >> 1, (mid2 - c1) >> 1
            frame = np.stack([left, right], axis=1)
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        br.align()
        br.read(16)  # frame CRC-16 (consumed, not verified)
        if total and got + n > total:
            frame = frame[: total - got]
        chunks.append(frame)
        got += len(frame)
    samples = (np.concatenate(chunks, axis=0) if chunks
               else np.zeros((0, chans), np.int64))
    return samples.astype(np.int32), rate, bits


def decode_flac(payload: bytes) -> Tuple[np.ndarray, int]:
    """FLAC bytes -> (mono float32 samples in [-1, 1], sample_rate) — the
    same contract as ``codecs.decode_wav``; stereo is mixed to mono."""
    pcm, rate, bits = decode_flac_pcm(payload)
    mono = pcm.mean(axis=1) if pcm.shape[1] > 1 else pcm[:, 0].astype(
        np.float64)
    return (mono / float(1 << (bits - 1))).astype(np.float32), rate


# ------------------------------------------------------------- encoder


class _BitsW:
    __slots__ = ("buf", "acc", "nb")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nb = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nb += n
        while self.nb >= 8:
            self.nb -= 8
            self.buf.append((self.acc >> self.nb) & 0xFF)
        self.acc &= (1 << self.nb) - 1

    def align(self) -> None:
        if self.nb:
            self.write(0, 8 - self.nb)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
    return c


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    for count, bits_ in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31)):
        if n < (1 << bits_):
            lead = (0xFF << (8 - count)) & 0xFF | (n >> (6 * (count - 1)))
            tail = [0x80 | ((n >> (6 * k)) & 0x3F)
                    for k in range(count - 2, -1, -1)]
            return bytes([lead] + tail)
    raise ValueError("frame number too large")


def _rice_write(bw: _BitsW, res: np.ndarray, order: int) -> None:
    """One partition (porder=0), parameter fit by mean magnitude."""
    arr = res.astype(np.int64)
    zz = (np.abs(arr) << 1) - (arr < 0)  # zigzag
    mean = float(zz.mean()) if len(zz) else 0.0
    param = max(0, min(14, int(np.ceil(np.log2(mean + 1)))))
    bw.write(0, 2)       # method 0: 4-bit rice
    bw.write(0, 4)       # partition order 0
    bw.write(param, 4)
    for v in zz:
        q = int(v) >> param
        if q > 60_000:
            raise ValueError("rice quotient blow-up; fixture data too wild")
        bw.write(0, q)
        bw.write(1, 1)
        if param:
            bw.write(int(v), param)


def encode_flac(samples: np.ndarray, sample_rate: int = 16000,
                block_size: int = 4096) -> bytes:
    """int16 samples, shape (n,) mono or (n, 2) stereo -> FLAC bytes.

    Fixture-grade but spec-valid: independent channels, per-frame FIXED
    predictor order 0-2 picked by residual sum, CONSTANT short-circuit,
    Rice residuals, real header CRC-8 / frame CRC-16 and STREAMINFO."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] not in (1, 2):
        raise ValueError("encode_flac wants (n,) or (n, 1|2) samples")
    if np.any(s > 32767) or np.any(s < -32768):
        raise ValueError("encode_flac is 16-bit")
    n_total, chans = s.shape
    bps = 16

    out = bytearray(_MAGIC)
    si = _BitsW()
    si.write(block_size, 16), si.write(block_size, 16)
    si.write(0, 24), si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(chans - 1, 3)
    si.write(bps - 1, 5)
    si.write(n_total, 36)
    si.align()
    body = bytes(si.buf) + b"\x00" * 16  # md5 unset (decoder tolerant)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    for f, start in enumerate(range(0, n_total, block_size)):
        blk = s[start:start + block_size]
        n = len(blk)
        hw = _BitsW()
        hw.write(0x3FFE, 14)
        hw.write(0, 1)
        hw.write(0, 1)           # fixed blocking
        hw.write(7, 4)           # 16-bit blocksize-1 at end of header
        hw.write(0, 4)           # rate from STREAMINFO
        hw.write(chans - 1, 4)   # independent channels
        hw.write(4, 3)           # 16-bit samples
        hw.write(0, 1)
        hw.align()
        head = bytes(hw.buf) + _utf8_number(f) + (n - 1).to_bytes(2, "big")
        head += bytes([_crc8(head)])

        fw = _BitsW()
        for ch in range(chans):
            x = blk[:, ch]
            if np.all(x == x[0]):
                fw.write(0, 1), fw.write(0, 6), fw.write(0, 1)  # CONSTANT
                fw.write(int(x[0]), bps)
                continue
            best, best_cost = 0, None
            diffs = {0: x}
            for o in (1, 2):
                if n <= o:
                    break
                diffs[o] = np.diff(diffs[o - 1])
                cost = int(np.abs(diffs[o]).sum())
                if best_cost is None or cost < best_cost:
                    best, best_cost = o, cost
            if best_cost is not None and best_cost >= int(
                    np.abs(x[best:]).sum() if best else np.abs(x).sum()):
                best = 0
            fw.write(0, 1)
            fw.write(0b001000 | best, 6)  # FIXED order `best`
            fw.write(0, 1)                # no wasted bits
            for w in x[:best]:
                fw.write(int(w), bps)
            res = diffs[best] if best else x
            _rice_write(fw, res, best)
        fw.align()
        frame = head + bytes(fw.buf)
        out += frame + _crc16(frame).to_bytes(2, "big")
    return bytes(out)
