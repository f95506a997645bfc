"""Pure-Python baseline JPEG decoder (ITU-T T.81, sequential DCT, Huffman).

Capability layer for media_source stills / MJPEG without codec libraries
(the reference decodes images and MJPEG via ffmpeg, ``src/module/
media_source.rs:185-292``; the preferred tier here is the libavcodec shim,
this is the zero-dependency fallback alongside av/y4m.py).

Scope: baseline sequential (SOF0) and extended sequential (SOF1) 8-bit,
grayscale or YCbCr with any of the common samplings (4:4:4, 4:2:2, 4:2:0),
restart markers, multiple scans NOT supported (progressive SOF2 raises).
Output is yuv420p planes for the engine's Picture type; the inverse DCT is
batched float matrix algebra over every block at once, and the Huffman
entropy decode is the only per-symbol Python.

Accuracy: validated in tests against libavcodec's decode of the same
bytes (mean error well under 1 LSB; IDCT rounding differs by at most 1).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np


class JpegError(ValueError):
    pass


# 8x8 zigzag scan order (flat row-major indices)
ZIGZAG8 = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)

# IDCT basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_A = np.zeros((8, 8), np.float64)
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = _c / 2.0 * np.cos((2 * _x + 1) * _u * np.pi / 16)


@dataclass
class _Component:
    cid: int
    h: int
    v: int
    tq: int
    dc_tab: int = 0
    ac_tab: int = 0


class _HuffLUT:
    """Canonical Huffman table -> flat 16-bit peek LUT (symbol, length)."""

    def __init__(self, bits: bytes, vals: bytes):
        self.sym = np.zeros(1 << 16, np.int16)
        self.len = np.zeros(1 << 16, np.int8)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                sym = vals[k]
                k += 1
                lo = code << (16 - length)
                hi = lo + (1 << (16 - length))
                self.sym[lo:hi] = sym
                self.len[lo:hi] = length
                code += 1
            code <<= 1


class _BitReader:
    """MSB-first reader over destuffed entropy bytes."""

    def __init__(self, data: bytes):
        self.data = data + b"\x00" * 4  # padding for peeks past the end
        self.bitpos = 0
        self.limit = len(data) * 8

    def peek16(self) -> int:
        byte = self.bitpos >> 3
        word = int.from_bytes(self.data[byte : byte + 4], "big")
        return (word >> (16 - (self.bitpos & 7))) & 0xFFFF

    def skip(self, n: int):
        self.bitpos += n

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        v = self.peek16() >> (16 - n)
        self.bitpos += n
        return v

    def exhausted(self) -> bool:
        return self.bitpos >= self.limit


def _extend(v: int, t: int) -> int:
    # T.81 F.12: map magnitude bits to signed value
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _destuff(data: bytes) -> bytes:
    return data.replace(b"\xff\x00", b"\xff")


def decode_jpeg(data: bytes) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """JPEG bytes -> (y, u, v) uint8 planes at 4:2:0 (grayscale: flat
    chroma).  Raises JpegError for progressive/arithmetic/12-bit files and
    for ANY malformed input (uploads are untrusted; structural index/struct
    errors are normalized to JpegError so callers need one except)."""
    try:
        return _decode_jpeg(data)
    except JpegError:
        raise
    except (IndexError, ValueError, KeyError, struct.error,
            ZeroDivisionError) as e:
        raise JpegError(f"malformed JPEG: {type(e).__name__}: {e}") from None


_MAX_PIXELS = 8192 * 8192


def _decode_jpeg(data: bytes) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    if data[:2] != b"\xff\xd8":
        raise JpegError("missing SOI")
    pos = 2
    qt: Dict[int, np.ndarray] = {}
    huff: Dict[Tuple[int, int], _HuffLUT] = {}
    comps: List[_Component] = []
    width = height = 0
    restart_interval = 0
    scan_start = None

    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            if marker == 0xD9:
                break
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    table = np.frombuffer(seg, ">u2", 64, p).astype(np.int64)
                    p += 128
                else:
                    table = np.frombuffer(seg, np.uint8, 64, p).astype(np.int64)
                    p += 64
                qt[tq] = table  # zigzag order
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline/extended
            precision = seg[0]
            if precision != 8:
                raise JpegError(f"{precision}-bit JPEG unsupported")
            height, width = struct.unpack_from(">HH", seg, 1)
            if not height or not width or height * width > _MAX_PIXELS:
                raise JpegError(f"bad dimensions {width}x{height}")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise JpegError(f"unsupported component count {ncomp}")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(_Component(cid, hv >> 4, hv & 15, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegError(f"unsupported SOF marker 0xFF{marker:02X} "
                            "(progressive/arithmetic)")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = seg[p + 1 : p + 17]
                n = sum(bits)
                vals = seg[p + 17 : p + 17 + n]
                huff[(tc, th)] = _HuffLUT(bits, vals)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            by_id = {c.cid: c for c in comps}
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i : 3 + 2 * i]
                by_id[cid].dc_tab = tabs >> 4
                by_id[cid].ac_tab = tabs & 15
            scan_start = pos + seglen
            break
        pos += seglen

    if scan_start is None or not comps:
        raise JpegError("no scan found")

    # ---- entropy-coded data: split on restart markers, destuff ----
    end = data.find(b"\xff\xd9", scan_start)
    if end < 0:
        end = len(data)
    scan = data[scan_start:end]
    intervals: List[bytes] = []
    p = 0
    while True:
        # find next RSTn not part of stuffing
        q = p
        cut = None
        while True:
            q = scan.find(b"\xff", q)
            if q < 0 or q + 1 >= len(scan):
                break
            m = scan[q + 1]
            if 0xD0 <= m <= 0xD7:
                cut = q
                break
            q += 2 if m == 0x00 else 1
        if cut is None:
            intervals.append(_destuff(scan[p:]))
            break
        intervals.append(_destuff(scan[p:cut]))
        p = cut + 2

    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcu_cols = -(-width // (8 * hmax))
    mcu_rows = -(-height // (8 * vmax))
    n_mcu = mcu_cols * mcu_rows

    # per-component coefficient stores [blocks_per_mcu * n_mcu, 64]
    coeffs = [np.zeros((n_mcu * c.h * c.v, 64), np.int32) for c in comps]

    # ---- Huffman decode (the only per-symbol Python) ----
    mcu = 0
    for interval in intervals:
        br = _BitReader(interval)
        preds = [0] * len(comps)
        limit = (min(mcu + restart_interval, n_mcu)
                 if restart_interval else n_mcu)
        while mcu < limit:
            for ci, c in enumerate(comps):
                try:
                    dc_lut = huff[(0, c.dc_tab)]
                    ac_lut = huff[(1, c.ac_tab)]
                except KeyError as e:
                    raise JpegError(f"scan references undefined "
                                    f"Huffman table {e}") from None
                for b in range(c.h * c.v):
                    block = coeffs[ci][mcu * c.h * c.v + b]
                    pk = br.peek16()
                    t = int(dc_lut.sym[pk])
                    ln = int(dc_lut.len[pk])
                    if ln == 0:
                        raise JpegError("bad DC code")
                    br.skip(ln)
                    diff = _extend(br.receive(t), t)
                    preds[ci] += diff
                    block[0] = preds[ci]
                    k = 1
                    while k < 64:
                        pk = br.peek16()
                        rs = int(ac_lut.sym[pk])
                        ln = int(ac_lut.len[pk])
                        if ln == 0:
                            raise JpegError("bad AC code")
                        br.skip(ln)
                        if rs == 0:
                            break  # EOB
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:
                                raise JpegError("bad AC run")
                            k += 16  # ZRL
                            continue
                        k += r
                        if k > 63:
                            raise JpegError("AC overflow")
                        block[k] = _extend(br.receive(s), s)
                        k += 1
            mcu += 1
            if br.exhausted() and mcu < limit:
                raise JpegError("entropy data truncated")
        if mcu >= n_mcu:
            break

    # ---- batched dequant + IDCT per component ----
    planes = []
    for ci, c in enumerate(comps):
        if c.tq not in qt:
            raise JpegError(f"undefined quant table {c.tq}")
        zz = coeffs[ci].astype(np.float64) * qt[c.tq][None, :]
        blocks = np.zeros((len(zz), 64), np.float64)
        blocks[:, ZIGZAG8] = zz
        blocks = blocks.reshape(-1, 8, 8)
        spatial = np.einsum("ux,buv,vy->bxy", _A, blocks, _A)
        px = np.clip(np.round(spatial + 128.0), 0, 255).astype(np.uint8)
        # assemble: MCU raster, then c.v x c.h blocks within the MCU
        g = px.reshape(mcu_rows, mcu_cols, c.v, c.h, 8, 8)
        plane = g.transpose(0, 2, 4, 1, 3, 5).reshape(
            mcu_rows * c.v * 8, mcu_cols * c.h * 8)
        cw = -(-width * c.h // hmax)
        ch = -(-height * c.v // vmax)
        planes.append(plane[:ch, :cw])

    # ---- to yuv420p ----
    y = planes[0][:height, :width]
    if height % 2 or width % 2:
        # pad to even (engine Pictures are 4:2:0-aligned)
        y = np.pad(y, ((0, height % 2), (0, width % 2)), mode="edge")
        height += height % 2
        width += width % 2
    if len(planes) == 1:
        flat = np.full((height // 2, width // 2), 128, np.uint8)
        return y, flat, flat.copy()

    def _avg_pairs(p: np.ndarray, axis: int) -> np.ndarray:
        a = p[0::2] if axis == 0 else p[:, 0::2]
        b = p[1::2] if axis == 0 else p[:, 1::2]
        if b.shape[axis] < a.shape[axis]:  # odd count: replicate the edge
            pad = [(0, 0), (0, 0)]
            pad[axis] = (0, 1)
            b = np.pad(b, pad, mode="edge") if b.size else a
        return ((a.astype(np.uint16) + b + 1) // 2).astype(np.uint8)

    out_c = []
    tgt_h, tgt_w = height // 2, width // 2
    for plane, c in zip(planes[1:3], comps[1:3]):
        p = plane
        if p.shape[0] >= height:  # vertically full-res (4:2:2 / 4:4:4)
            p = _avg_pairs(p, 0)
        if p.shape[1] >= width:  # horizontally full-res (4:4:4)
            p = _avg_pairs(p, 1)
        p = p[:tgt_h, :tgt_w]
        if p.shape != (tgt_h, tgt_w):
            p = np.pad(p, ((0, tgt_h - p.shape[0]), (0, tgt_w - p.shape[1])),
                       mode="edge")
        out_c.append(np.ascontiguousarray(p))
    return np.ascontiguousarray(y), out_c[0], out_c[1]


def is_jpeg(data: bytes) -> bool:
    return data[:2] == b"\xff\xd8"
