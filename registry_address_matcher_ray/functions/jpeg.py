"""JPEG (ITU-T T.81) codec — pure stdlib + numpy, no PIL/libjpeg.

Closes the last gated image format in the multimodal family
(``stages/multimodal.py``; reference has no media ops — this is north-star
surface, not §2 parity). Scope, honestly stated:

- **decode**: baseline sequential DCT (SOF0/1) AND progressive (SOF2 —
  spectral selection, successive approximation with DC/AC initial and
  refinement scans, EOB runs, table redefinition between scans), 8-bit,
  1 or 3 components, integer-ratio JFIF sampling factors (4:4:4 / 4:2:2 /
  4:2:0 via ``np.repeat`` upsampling; non-divisible ratios raise),
  restart markers (DRI/RSTn),
  stuffed-byte removal. Arithmetic coding, lossless and 12-bit precision
  raise ``ValueError`` — the gate is now exactly those variants. Validated
  in-session against real libjpeg/mozjpeg files, baseline and progressive.
- **encode**: baseline (4:4:4 / 4:2:0, grayscale, optional restart
  intervals) and progressive (DC init -> AC init -> DC refine -> AC refine
  scan script) with the Annex-K quantization and Huffman tables,
  libjpeg-style quality scaling. Annex-K AC tables carry no EOBn run
  symbols, so the progressive encoder flushes each EOB as a run of 1 —
  valid, just less compact than custom-table encoders. Both encoder modes
  produce IDENTICAL quantized coefficients, so baseline and progressive
  streams of the same image decode byte-identically (pinned in tests).

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


def _split_entropy(payload: bytes, start: int) -> Tuple[List[bytes], int]:
    """Entropy-coded data from ``start`` -> (restart segments with 0xFF00
    unstuffed, index of the terminating marker's 0xFF)."""
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
    return segments, min(i, n)


class _ScanState:
    """Per-frame accumulation across scans (progressive) or one scan
    (baseline): zigzag-order coefficient planes, MCU geometry."""

    def __init__(self, frame):
        self.frame = frame
        comps = frame["comps"]
        self.hmax = max(c["h"] for c in comps)
        self.vmax = max(c["v"] for c in comps)
        self.mcux = -(-frame["w"] // (8 * self.hmax))
        self.mcuy = -(-frame["h"] // (8 * self.vmax))
        self.by_id = {c["id"]: c for c in comps}
        # (BY, BX, 64) zigzag-order int64 per component, MCU-padded dims
        self.planes = {
            c["id"]: np.zeros((self.mcuy * c["v"], self.mcux * c["h"], 64),
                              dtype=np.int64)
            for c in comps
        }

    def comp_block_dims(self, comp) -> Tuple[int, int]:
        """Non-interleaved (single-component scan) block grid: T.81 A.2.2."""
        cw = -(-self.frame["w"] * comp["h"] // self.hmax)
        ch = -(-self.frame["h"] * comp["v"] // self.vmax)
        return -(-ch // 8), -(-cw // 8)


class _Restarts:
    """Restart-segment cursor: yields a fresh _BitReader per interval."""

    def __init__(self, segments: List[bytes], interval: int):
        self.segments = segments
        self.interval = interval
        self.idx = 0
        self.br = _BitReader(segments[0])

    def at_unit(self, u: int) -> bool:
        """True (and advances the reader) when unit ``u`` starts a new
        restart interval."""
        if self.interval and u and u % self.interval == 0:
            self.idx += 1
            if self.idx >= len(self.segments):
                raise ValueError("missing JPEG restart segment")
            self.br = _BitReader(self.segments[self.idx])
            return True
        return False


def _baseline_block(br, dc_tab, ac_tab, zz, pred: int) -> int:
    """Full DC+AC Huffman block decode into zigzag array; returns new pred."""
    t = _decode_huff(br, dc_tab)
    pred += _extend(br.read_bits(t), t)
    zz[0] = pred
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
    return pred


def _ac_first_block(br, tab, zz, ss: int, se: int, al: int,
                    eobrun: int) -> int:
    """Progressive AC initial scan for one block (T.81 G.1.2.2); returns
    the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(br, tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL in an initial AC scan
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("progressive AC run past spectral band")
        zz[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(br, tab, zz, ss: int, se: int, al: int,
                     eobrun: int) -> int:
    """Progressive AC refinement for one block (T.81 G.1.2.3, the libjpeg
    decode_mcu_AC_refine control flow); returns the updated EOB run.

    Python's ``&`` on negative ints is two's-complement like C, so the
    already-set-bit test ``coef & p1`` matches libjpeg bit-for-bit."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(br, tab)
            r, s = rs >> 4, rs & 0xF
            if s:
                # refinement scans only carry magnitude-1 new coefficients
                val = p1 if br.read_bit() else m1
            else:
                if r != 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.read_bits(r)
                    break  # correction of the rest happens below
                val = 0  # ZRL: skip 16 zero-history positions
            # advance over the band: correct nonzeros, count down r zeros
            while k <= se:
                c = int(zz[k])
                if c != 0:
                    if br.read_bit() and (c & p1) == 0:
                        zz[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    else:
        eobrun -= 1
    # EOB region (or whole block inside an EOB run): correction bits only
    while k <= se:
        c = int(zz[k])
        if c != 0 and br.read_bit() and (c & (1 << al)) == 0:
            zz[k] = c + ((1 << al) if c >= 0 else (-1 << al))
        k += 1
    return eobrun


def _decode_scan_into(st: _ScanState, scomps, ss, se, ah, al,
                      segments, restart_interval, huff_dc, huff_ac,
                      progressive: bool, dri_workers: Optional[int] = None,
                      ) -> None:
    order = [st.by_id[s["id"]] for s in scomps]
    td = {s["id"]: s["td"] for s in scomps}
    ta = {s["id"]: s["ta"] for s in scomps}
    rst = _Restarts(segments, restart_interval)
    pred = {c["id"]: 0 for c in order}

    if progressive and ss == 0 and se != 0:
        raise ValueError(
            "invalid progressive scan header (a DC scan must have Se=0; "
            "a baseline stream relabeled SOF2 is not progressive)")
    if progressive and ss > 0:
        if len(order) != 1:
            raise ValueError("progressive AC scans must be non-interleaved")
        comp = order[0]
        plane = st.planes[comp["id"]]
        bh, bw = st.comp_block_dims(comp)
        tab = huff_ac[ta[comp["id"]]]
        fn = _ac_first_block if ah == 0 else _ac_refine_block
        eobrun = 0
        for u in range(bh * bw):
            if rst.at_unit(u):
                eobrun = 0
            by, bx = divmod(u, bw)
            eobrun = fn(rst.br, tab, plane[by, bx], ss, se, al, eobrun)
        return

    # DC scan (progressive ss==0) or full baseline scan. Interleaved MCU
    # order when the scan carries >1 component, component raster otherwise.
    interleaved = len(order) > 1
    if interleaved:
        units = st.mcux * st.mcuy
        bw = st.mcux
    else:
        bh, bw = st.comp_block_dims(order[0])
        units = bh * bw

    if (not progressive and restart_interval and len(segments) > 1
            and dri_workers and dri_workers > 1):
        # restart segments are independently decodable (DC predictors reset
        # at every RSTn): fan the Huffman entropy decode out per segment
        _decode_baseline_segments_parallel(
            st, order, td, ta, huff_dc, huff_ac, segments,
            restart_interval, units, interleaved, bw, dri_workers)
        return

    for u in range(units):
        if rst.at_unit(u):
            pred = {c["id"]: 0 for c in order}
        _decode_one_unit(st, order, td, ta, huff_dc, huff_ac, rst.br, pred,
                         u, interleaved, bw, progressive, ah, al)


def _decode_one_unit(st, order, td, ta, huff_dc, huff_ac, br, pred,
                     u, interleaved, bw, progressive, ah, al) -> None:
    """Decode one MCU (interleaved) or one block (raster) at unit ``u``."""
    if interleaved:
        my, mx = divmod(u, st.mcux)
        blocks = [
            (comp, my * comp["v"] + vy, mx * comp["h"] + vx)
            for comp in order
            for vy in range(comp["v"]) for vx in range(comp["h"])
        ]
    else:
        comp = order[0]
        by, bx = divmod(u, bw)
        blocks = [(comp, by, bx)]
    for comp, by, bx in blocks:
        cid = comp["id"]
        zz = st.planes[cid][by, bx]
        if not progressive:
            pred[cid] = _baseline_block(
                br, huff_dc[td[cid]], huff_ac[ta[cid]], zz, pred[cid])
        elif ah == 0:  # DC initial
            t = _decode_huff(br, huff_dc[td[cid]])
            pred[cid] += _extend(br.read_bits(t), t)
            zz[0] = pred[cid] << al
        else:  # DC refinement: one bit per block
            if br.read_bit():
                zz[0] = int(zz[0]) | (1 << al)


def _decode_segment_task(args):
    """A CHUNK of restart segments -> one set of full-size zero planes with
    those segments' blocks filled (module-level so the fork pool can pickle
    it). Chunking keeps pickled plane traffic at O(workers), not
    O(segments)."""
    (chunk, frame, order_ids, td, ta,
     huff_dc, huff_ac, interleaved, bw) = args
    st = _ScanState(frame)
    order = [st.by_id[cid] for cid in order_ids]
    for seg, u0, u1 in chunk:
        br = _BitReader(seg)
        pred = {cid: 0 for cid in order_ids}
        for u in range(u0, u1):
            _decode_one_unit(st, order, td, ta, huff_dc, huff_ac, br, pred,
                             u, interleaved, bw, False, 0, 0)
    return st.planes


_DRI_POOL = {}


def _dri_pool(workers: int):
    """Per-process cached fork pool for segment-parallel entropy decode.

    Start-method tradeoff, considered deliberately: spawn and forkserver
    both re-import ``__main__`` in the child (spawn.prepare), which breaks
    any unguarded caller script of this library function — a concrete,
    immediate failure. Fork from a threaded parent (a Ray worker carries
    gRPC threads) risks inheriting a locked mutex, but the children here
    execute ONLY module-level pure-Python/numpy decode (no logging, no
    gRPC, no allocator callbacks touched before exec of the task), so the
    exposure window is the brief fork itself; pools are cached (forks are
    rare) and atexit-shutdown so children never outlive the worker. Size
    the enclosing map_batches stage's ``num_cpus`` to match — the pool is
    how a decode actor USES the CPUs it reserved, not extra ones."""
    import atexit
    import multiprocessing as mp
    from concurrent.futures import ProcessPoolExecutor

    pool = _DRI_POOL.get(workers)
    if pool is None:
        pool = ProcessPoolExecutor(
            max_workers=workers, mp_context=mp.get_context("fork"))
        _DRI_POOL[workers] = pool
        if len(_DRI_POOL) == 1:
            atexit.register(
                lambda: [p.shutdown(wait=False, cancel_futures=True)
                         for p in _DRI_POOL.values()])
    return pool


def _decode_baseline_segments_parallel(
        st, order, td, ta, huff_dc, huff_ac, segments, restart_interval,
        units, interleaved, bw, workers) -> None:
    """Baseline scan with DRI: restart segment k owns MCUs
    [k*Ri, min((k+1)*Ri, units)) with a fresh DC predictor, so segments
    decode concurrently (process pool — the entropy loop is pure Python,
    so threads would serialize on the GIL). Each task fills disjoint block
    coordinates of zero planes; the merge is a vectorized sum. Pixel
    output is bit-identical to the serial path (pytest-pinned)."""
    n_units_per = restart_interval
    order_ids = [c["id"] for c in order]
    need = -(-units // n_units_per)
    if len(segments) < need:
        # same error the serial path raises via _Restarts.at_unit — the
        # dri_workers knob must never turn a hard error into silent gray
        raise ValueError("missing JPEG restart segment")
    spans = []
    for k, seg in enumerate(segments):
        u0 = k * n_units_per
        if u0 >= units:
            break
        spans.append((seg, u0, min(u0 + n_units_per, units)))
    # one contiguous chunk per worker: pickled plane traffic is O(workers)
    n_chunks = min(workers, len(spans))
    per = -(-len(spans) // n_chunks)
    tasks = [(spans[j:j + per], st.frame, order_ids, td, ta,
              huff_dc, huff_ac, interleaved, bw)
             for j in range(0, len(spans), per)]
    pool = _dri_pool(workers)
    for planes in pool.map(_decode_segment_task, tasks):
        for cid, p in planes.items():
            st.planes[cid] += p


def _reconstruct(st: _ScanState, qt) -> np.ndarray:
    """Zigzag coefficient planes -> RGB: vectorized dequantize + un-zigzag +
    IDCT (one einsum over all blocks) + chroma upsample + color convert."""
    frame = st.frame
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    out_planes = []
    for comp in comps:
        zzp = st.planes[comp["id"]]
        byn, bxn = zzp.shape[:2]
        nat = np.zeros((byn, bxn, 64), dtype=np.float64)
        nat[..., _ZIGZAG] = zzp  # un-zigzag every block at once
        coefs = nat.reshape(byn, bxn, 8, 8) * qt[comp["tq"]][None, None]
        pix = np.einsum("km,bykl,ln->bymn", _C, coefs, _C,
                        optimize=True)  # C.T @ coef @ C over all blocks
        img = pix.transpose(0, 2, 1, 3).reshape(byn * 8, bxn * 8) + 128.0
        if st.vmax % comp["v"] or st.hmax % comp["h"]:
            raise ValueError(
                f"non-integer chroma sampling ratio {st.hmax}x{st.vmax} vs "
                f"{comp['h']}x{comp['v']} unsupported (integer-ratio "
                f"replication upsampler)")
        ry, rx = st.vmax // comp["v"], st.hmax // comp["h"]
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


def decode_jpeg(payload: bytes,
                dri_workers: Optional[int] = None) -> np.ndarray:
    """JPEG bytes -> (H, W, 3) uint8 RGB (grayscale replicated).

    Handles baseline sequential (SOF0/1) AND progressive (SOF2) Huffman
    streams — spectral selection, successive approximation (DC+AC initial
    and refinement scans, EOB runs), restart markers, table redefinition
    between scans. Arithmetic coding / lossless / 12-bit still raise.

    ``dri_workers > 1``: baseline scans carrying restart intervals decode
    their independent RSTn segments on a fork process pool (pixel-identical
    to serial; the entropy loop is pure Python, so this is the only way one
    image's decode uses more than one core without a C codec). Size the
    calling stage's ``num_cpus`` to match."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, dict] = {}
    huff_ac: Dict[int, dict] = {}
    frame: Optional[dict] = None
    st: Optional[_ScanState] = None
    progressive = False
    saw_scan = False
    restart_interval = 0
    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker
        while i + 1 < n and payload[i + 1] == 0xFF:
            i += 1
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
        elif marker == 0xC4:  # DHT (may be redefined between scans)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                dec = _build_huffman_decoder(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], \
                struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
            st = _ScanState(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "lossless/extended/arithmetic JPEG unsupported "
                f"(SOF marker 0xFF{marker:02X}); SOF0/SOF1/SOF2 only")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — decode this scan's entropy data
            if st is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scomps.append({"id": cs, "td": tt >> 4, "ta": tt & 0xF})
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            segments, i = _split_entropy(payload, i + seglen)
            _decode_scan_into(st, scomps, ss, se, ahal >> 4, ahal & 0xF,
                              segments, restart_interval, huff_dc, huff_ac,
                              progressive, dri_workers=dri_workers)
            saw_scan = True
            continue  # i already points at the terminating marker
        # else: APPn/COM/unknown -> skip
        i += seglen
    if st is None or not saw_scan:
        raise ValueError("no SOS scan found in JPEG")
    return _reconstruct(st, qt)


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


def _emit_dc_diff(bw: _BitWriter, codes, diff: int) -> None:
    t = _csize(diff)
    code, ln = codes[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)


class _EobState:
    """Cross-block EOB-run + buffered-correction-bit state for one
    progressive AC scan (the encoder mirror of the decoder's ``eobrun``)."""

    __slots__ = ("eobrun", "pending")

    def __init__(self):
        self.eobrun = 0
        self.pending: List[int] = []

    def flush(self, bw: _BitWriter, ac_codes) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, ln = ac_codes[nbits << 4]
            bw.write(code, ln)
            if nbits:
                bw.write(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
            for b in self.pending:
                bw.write(b, 1)
            self.pending = []


def _prog_ac_first_block(bw, ac_codes, zz, ss, se, al, st: _EobState) -> None:
    """Progressive AC initial-scan encoder for one block (T.81 G.1.2.2)."""
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = (v if v >= 0 else -v) >> al
        if t == 0:
            r += 1
            continue
        while r > 15:
            st.flush(bw, ac_codes)
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            r -= 16
        st.flush(bw, ac_codes)
        s = t.bit_length()
        code, ln = ac_codes[(r << 4) | s]
        bw.write(code, ln)
        val = t if v >= 0 else -t
        bw.write(val if val >= 0 else val + (1 << s) - 1, s)
        r = 0
    if r > 0:
        # Annex-K tables carry only the plain-EOB symbol 0x00 (no EOBn
        # run-length symbols), so flush every EOB immediately: a run of 1
        # encodes as nbits=0 with no extension bits. Valid, just less
        # compact than custom-table encoders; the decoder's long-run path
        # is exercised by real libjpeg/mozjpeg files instead.
        st.eobrun += 1
        st.flush(bw, ac_codes)


def _prog_ac_refine_block(bw, ac_codes, zz, ss, se, al, st: _EobState) -> None:
    """Progressive AC refinement encoder for one block — the libjpeg
    encode_mcu_AC_refine control flow (new ±1 coefficients interleaved with
    buffered correction bits for history coefficients)."""
    absv = {}
    eob = ss - 1
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = (v if v >= 0 else -v) >> al
        absv[k] = t
        if t == 1:
            eob = k  # last NEWLY-nonzero coefficient position
    r = 0
    br_bits: List[int] = []
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        # ZRLs are only needed inside the newly-nonzero span; beyond it the
        # run folds into the EOB
        while r > 15 and k <= eob:
            st.flush(bw, ac_codes)
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            r -= 16
            for b in br_bits:
                bw.write(b, 1)
            br_bits = []
        if t > 1:
            # history coefficient: just queue its next magnitude bit
            br_bits.append(t & 1)
            continue
        st.flush(bw, ac_codes)
        code, ln = ac_codes[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if int(zz[k]) >= 0 else 0, 1)
        for b in br_bits:
            bw.write(b, 1)
        br_bits = []
        r = 0
    if r > 0 or br_bits:
        # same Annex-K constraint as the initial scan: flush runs of 1
        st.eobrun += 1
        st.pending.extend(br_bits)
        st.flush(bw, ac_codes)


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
                restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """(H, W, 3) or (H, W) uint8 -> JFIF JPEG bytes.

    ``subsampling``: ``"444"`` (no chroma subsampling) or ``"420"`` (2x2 box
    average — exercises a decoder's upsampling path). ``restart_interval``:
    emit DRI + RSTn markers every N MCUs (0 = none; baseline only).
    ``progressive``: emit SOF2 with a successive-approximation scan script
    (DC initial Al=1 -> AC initial per component Al=1 -> DC refine -> AC
    refine) — the quantized coefficients are IDENTICAL to the baseline
    stream's, so both decode to byte-identical pixels.
    """
    gray = arr.ndim == 2
    if not gray and arr.shape[2] != 3:
        raise ValueError("expected (H,W) or (H,W,3) uint8")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if progressive and restart_interval:
        raise ValueError("restart intervals unsupported with progressive")
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

    def _comp_bdims(ch, cv):
        """Non-interleaved block grid (T.81 A.2.2) for a (ch, cv) component."""
        comp_h = -(-h * cv // vmax)
        comp_w = -(-w * ch // hmax)
        return -(-comp_h // 8), -(-comp_w // 8)

    def _mcu_blocks():
        for mi in range(mcux * mcuy):
            myy, mxx = divmod(mi, mcux)
            for ci, (name, _, ch, cv) in enumerate(planes):
                for vy in range(cv):
                    for vx in range(ch):
                        yield mi, ci, name, coefs[ci][myy * cv + vy,
                                                      mxx * ch + vx]

    if not progressive:
        segments: List[bytes] = []
        bw = _BitWriter()
        preds = [0] * len(planes)
        cur_mi = 0
        for mi, ci, name, zz in _mcu_blocks():
            if restart_interval and mi != cur_mi and mi % restart_interval == 0:
                segments.append(bw.flush())
                bw = _BitWriter()
                preds = [0] * len(planes)
            cur_mi = mi
            dcc = dc_y if name == "y" else dc_c
            acc = ac_y if name == "y" else ac_c
            preds[ci] = _encode_block(bw, zz, preds[ci], dcc, acc)
        segments.append(bw.flush())
        scan = bytearray()
        for si, segb in enumerate(segments):
            scan += segb
            if si < len(segments) - 1:
                scan += bytes([0xFF, 0xD0 + (si % 8)])
    else:
        # scan script: DC init (Al=1, interleaved) -> AC init per comp
        # (Ss=1..63, Al=1) -> DC refine -> AC refine per comp
        def _sos_header(comp_ids, ss, se, ah, al_):
            ns = len(comp_ids)
            hdr = struct.pack(">HB", 6 + 2 * ns, ns)
            for ci in comp_ids:
                dc_id = 0 if planes[ci][0] == "y" else 1
                hdr += bytes([ci + 1, (dc_id << 4) | dc_id])
            hdr += bytes([ss, se, (ah << 4) | al_])
            return b"\xff\xda" + hdr

        prog_scans: List[bytes] = []
        # 1. DC initial, Al=1, all components interleaved
        bw = _BitWriter()
        preds = [0] * len(planes)
        for mi, ci, name, zz in _mcu_blocks():
            v = int(zz[0]) >> 1
            _emit_dc_diff(bw, dc_y if name == "y" else dc_c, v - preds[ci])
            preds[ci] = v
        prog_scans.append(
            _sos_header(list(range(len(planes))), 0, 0, 0, 1) + bw.flush())
        # 2. AC initial per component, Al=1
        for ci, (name, _, ch, cv) in enumerate(planes):
            bw = _BitWriter()
            st = _EobState()
            acc = ac_y if name == "y" else ac_c
            bh, bwid = _comp_bdims(ch, cv)
            for u in range(bh * bwid):
                byy, bxx = divmod(u, bwid)
                _prog_ac_first_block(bw, acc, coefs[ci][byy, bxx],
                                     1, 63, 1, st)
            st.flush(bw, acc)
            prog_scans.append(_sos_header([ci], 1, 63, 0, 1) + bw.flush())
        # 3. DC refinement (one bit per block), interleaved
        bw = _BitWriter()
        for mi, ci, name, zz in _mcu_blocks():
            bw.write(int(zz[0]) & 1, 1)
        prog_scans.append(
            _sos_header(list(range(len(planes))), 0, 0, 1, 0) + bw.flush())
        # 4. AC refinement per component, Al 1 -> 0
        for ci, (name, _, ch, cv) in enumerate(planes):
            bw = _BitWriter()
            st = _EobState()
            acc = ac_y if name == "y" else ac_c
            bh, bwid = _comp_bdims(ch, cv)
            for u in range(bh * bwid):
                byy, bxx = divmod(u, bwid)
                _prog_ac_refine_block(bw, acc, coefs[ci][byy, bxx],
                                      1, 63, 0, st)
            st.flush(bw, acc)
            prog_scans.append(_sos_header([ci], 1, 63, 1, 0) + bw.flush())
        scan = b"".join(prog_scans)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HHBB", 1, 1, 0, 0)

    def _dqt(tid, q):
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
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") + sof

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

    if progressive:
        out += scan  # scan bytes already carry their per-scan SOS headers
    else:
        sos = struct.pack(">HB", 6 + 2 * nc, nc) + bytes([1, 0x00])
        if not gray:
            sos += bytes([2, 0x11, 3, 0x11])
        sos += bytes([0, 63, 0])
        out += b"\xff\xda" + sos
        out += scan
    out += b"\xff\xd9"
    return bytes(out)
