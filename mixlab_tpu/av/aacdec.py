"""Pure AAC-LC decoder (zero native dependencies).

Closes the last typed warning in the zero-dep tier (VERDICT r3 ask #8):
``media_source`` MP4+AAC and RTMP AAC ingest decode without the libavcodec
shim.  The reference decodes AAC everywhere via fdk-aac FFI
(``/root/reference/src/rtmp/mod.rs:192-258``) and stops its own pure-Rust
AAC layer at headers (``codec/src/aac/``: ADTS + ASC only); this module
completes what that layer started.

Scope: MPEG-4 AAC-LC (ISO/IEC 14496-3 subpart 4) — SCE/CPE/LFE elements,
long/short/transition window sequences, sine + KBD window shapes, the full
LC toolset (scalefactors, all 11 spectral codebooks + escapes, pulse, TNS,
M/S stereo, intensity stereo, PNS).  Not decoded: SBR/PS extensions (FIL
payloads are skipped — HE-AAC streams decode as their LC core), CCE
(typed error), 960-sample frames (typed error).

Constant tables come from ``aac_tables.py``, recovered clean-room from a
libavcodec strict-decode oracle (tools/extract_aac_tables.py).  Bit
behavior is pinned by differential tests against the same oracle on
ffmpeg-encoded streams (tests/test_aacdec.py).

PNS note: the spec leaves the noise generator implementation-defined
(4.6.13); our noise differs sample-wise from libavcodec's by design, so
differential tests compare PNS bands by energy, not samples.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from mixlab_tpu.av.aac import AacError, AudioSpecificConfiguration, parse_adts_header
from mixlab_tpu.av.aac_tables import (
    BOOK_DIMS,
    BOOK_SIGNED,
    SF_CODEBOOK,
    SPECTRAL_CODEBOOKS,
    SWB_OFFSET_LONG,
)

try:  # generated in a second extraction pass; long-window-only without it
    from mixlab_tpu.av.aac_tables import SWB_OFFSET_SHORT
except ImportError:  # pragma: no cover
    SWB_OFFSET_SHORT = {}


class AacDecodeError(AacError):
    """Typed decode error: malformed or out-of-scope bitstream."""


# ---------------------------------------------------------------------------
# bit reader (MSB first; AAC has no start-code emulation)
# ---------------------------------------------------------------------------


class _Bits:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def u(self, k: int) -> int:
        pos = self.pos
        if pos + k > self.n:
            raise AacDecodeError("bitstream overrun")
        v = 0
        data = self.data
        for _ in range(k):
            v = (v << 1) | ((data[pos >> 3] >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return v

    def bit(self) -> int:
        pos = self.pos
        if pos >= self.n:
            raise AacDecodeError("bitstream overrun")
        b = (self.data[pos >> 3] >> (7 - (pos & 7))) & 1
        self.pos = pos + 1
        return b

    def align(self):
        self.pos = (self.pos + 7) & ~7

    def bits_left(self) -> int:
        return self.n - self.pos


# ---------------------------------------------------------------------------
# Huffman decode maps keyed (length, code) — same structure as the CAVLC
# tables in h264dec.py
# ---------------------------------------------------------------------------


def _invert(table: Dict[str, object]):
    m = {}
    maxlen = 0
    for bits, val in table.items():
        m[(len(bits), int(bits, 2))] = val
        maxlen = max(maxlen, len(bits))
    return m, maxlen


_SF_MAP, _SF_MAXLEN = _invert(SF_CODEBOOK)
_SPEC_MAPS = {book: _invert(tbl) for book, tbl in SPECTRAL_CODEBOOKS.items()}


def _huff(r: _Bits, m, maxlen):
    code = 0
    for ln in range(1, maxlen + 1):
        code = (code << 1) | r.bit()
        v = m.get((ln, code))
        if v is not None:
            return v
    raise AacDecodeError("invalid Huffman code")


def _sf_delta(r: _Bits) -> int:
    return _huff(r, _SF_MAP, _SF_MAXLEN) - 60


# ---------------------------------------------------------------------------
# windows / filterbank
# ---------------------------------------------------------------------------


def _sine_window(n: int) -> np.ndarray:
    return np.sin(np.pi / n * (np.arange(n) + 0.5)).astype(np.float64)


def _kbd_window(n: int, alpha: float) -> np.ndarray:
    """Kaiser-Bessel derived window (14496-3 4.6.11.3.2)."""
    half = n // 2
    t = np.arange(half + 1, dtype=np.float64)
    arg = np.pi * alpha * np.sqrt(np.clip(1.0 - (2.0 * t / half - 1.0) ** 2, 0, None))
    kernel = np.i0(arg)
    cum = np.cumsum(kernel)
    w_half = np.sqrt(cum[:half] / cum[half])
    return np.concatenate([w_half, w_half[::-1]])


_WIN_LONG = {0: _sine_window(2048), 1: _kbd_window(2048, 4.0)}
_WIN_SHORT = {0: _sine_window(256), 1: _kbd_window(256, 6.0)}


class _Imdct:
    """Synthesis half of the orthogonal MDCT filterbank.  The synthesis
    matrix is the transpose of the analysis kernel scaled so that
    windowed overlap-add reconstructs exactly (4/N for this kernel)."""

    _cache: Dict[int, np.ndarray] = {}

    @classmethod
    def matrix(cls, n_out: int) -> np.ndarray:
        m = cls._cache.get(n_out)
        if m is None:
            half = n_out // 2
            n = np.arange(n_out)[:, None]
            k = np.arange(half)[None, :]
            m = (4.0 / n_out) * np.cos(
                2.0 * np.pi / n_out * (n + 0.5 + half / 2.0) * (k + 0.5)
            )
            cls._cache[n_out] = m
        return m

    @classmethod
    def run(cls, coeffs: np.ndarray) -> np.ndarray:
        return cls.matrix(2 * len(coeffs)) @ coeffs


def _long_start_right(shape: int) -> np.ndarray:
    w = np.empty(1024)
    w[:448] = 1.0
    w[448:576] = _WIN_SHORT[shape][128:]
    w[576:] = 0.0
    return w


def _long_stop_left(shape: int) -> np.ndarray:
    w = np.empty(1024)
    w[:448] = 0.0
    w[448:576] = _WIN_SHORT[shape][:128]
    w[576:] = 1.0
    return w


class _Filterbank:
    """Per-channel overlap-add state (4.6.11)."""

    def __init__(self):
        self.overlap = np.zeros(1024)
        self.prev_shape = 0

    def process(self, coeffs: np.ndarray, window_sequence: int, shape: int) -> np.ndarray:
        prev = self.prev_shape
        if window_sequence == 2:  # EIGHT_SHORT
            frame = np.zeros(2048)
            for w in range(8):
                x = _Imdct.run(coeffs[w * 128:(w + 1) * 128])
                win_l = _WIN_SHORT[prev if w == 0 else shape][:128]
                win_r = _WIN_SHORT[shape][128:]
                x = x * np.concatenate([win_l, win_r])
                off = 448 + 128 * w
                frame[off:off + 256] += x
        else:
            x = _Imdct.run(coeffs)
            if window_sequence == 0:  # ONLY_LONG
                left, right = _WIN_LONG[prev][:1024], _WIN_LONG[shape][1024:]
            elif window_sequence == 1:  # LONG_START
                left, right = _WIN_LONG[prev][:1024], _long_start_right(shape)
            elif window_sequence == 3:  # LONG_STOP
                left, right = _long_stop_left(prev), _WIN_LONG[shape][1024:]
            else:
                raise AacDecodeError(f"bad window sequence {window_sequence}")
            frame = x * np.concatenate([left, right])
        out = self.overlap + frame[:1024]
        self.overlap = frame[1024:]
        self.prev_shape = shape
        return out


# ---------------------------------------------------------------------------
# per-channel ICS
# ---------------------------------------------------------------------------

ZERO_HCB = 0
FIRST_PAIR_HCB = 5
ESC_HCB = 11
NOISE_HCB = 13
INTENSITY_HCB2 = 14
INTENSITY_HCB = 15


@dataclass
class _IcsInfo:
    window_sequence: int = 0
    window_shape: int = 0
    max_sfb: int = 0
    num_windows: int = 1
    num_window_groups: int = 1
    group_len: List[int] = field(default_factory=lambda: [1])
    swb_offset: Tuple[int, ...] = ()
    num_swb: int = 0


@dataclass
class _Ics:
    info: _IcsInfo
    global_gain: int = 0
    band_cb: List[List[int]] = field(default_factory=list)     # [group][sfb]
    band_sf: List[List[int]] = field(default_factory=list)     # [group][sfb]
    coeffs: np.ndarray = None                                  # [1024]
    tns: Optional[list] = None
    pulse: Optional[tuple] = None


def _decode_ics_info(r: _Bits, sfi: int) -> _IcsInfo:
    if r.bit():
        raise AacDecodeError("ics_reserved_bit set")
    ws = r.u(2)
    shape = r.bit()
    info = _IcsInfo(window_sequence=ws, window_shape=shape)
    if ws == 2:
        info.max_sfb = r.u(4)
        grouping = r.u(7)
        info.num_windows = 8
        groups = [1]
        for b in range(7):
            if (grouping >> (6 - b)) & 1:
                groups[-1] += 1
            else:
                groups.append(1)
        info.num_window_groups = len(groups)
        info.group_len = groups
        offs = SWB_OFFSET_SHORT.get(sfi)
        if offs is None:
            raise AacDecodeError(f"no short swb table for sfi {sfi}")
    else:
        info.max_sfb = r.u(6)
        if r.bit():
            raise AacDecodeError("predictor data in LC stream")
        offs = SWB_OFFSET_LONG.get(sfi)
        if offs is None:
            raise AacDecodeError(f"no long swb table for sfi {sfi}")
    info.swb_offset = tuple(offs)
    info.num_swb = len(offs) - 1
    if info.max_sfb > info.num_swb:
        raise AacDecodeError(
            f"max_sfb {info.max_sfb} exceeds num_swb {info.num_swb}"
        )
    return info


def _decode_section_data(r: _Bits, info: _IcsInfo) -> List[List[int]]:
    bits = 3 if info.window_sequence == 2 else 5
    esc = (1 << bits) - 1
    out = []
    for _g in range(info.num_window_groups):
        cbs = [0] * info.max_sfb
        k = 0
        while k < info.max_sfb:
            cb = r.u(4)
            if cb == 12:  # reserved (14496-3 table 4.150); spectral decode
                raise AacDecodeError("reserved codebook 12 in section data")
            ln = 0
            while True:
                inc = r.u(bits)
                ln += inc
                if inc != esc:
                    break
            if ln == 0 or k + ln > info.max_sfb:
                raise AacDecodeError("bad section length")
            for i in range(k, k + ln):
                cbs[i] = cb
            k += ln
        out.append(cbs)
    return out


def _decode_scalefactors(r: _Bits, info: _IcsInfo, band_cb, global_gain: int):
    sf = global_gain
    is_pos = 0
    noise = global_gain - 90
    noise_pcm_read = False
    out = []
    for g in range(info.num_window_groups):
        sfs = [0] * info.max_sfb
        for b in range(info.max_sfb):
            cb = band_cb[g][b]
            if cb == ZERO_HCB:
                continue
            if cb in (INTENSITY_HCB, INTENSITY_HCB2):
                is_pos += _sf_delta(r)
                sfs[b] = is_pos
            elif cb == NOISE_HCB:
                if not noise_pcm_read:
                    noise_pcm_read = True
                    noise += r.u(9) - 256
                else:
                    noise += _sf_delta(r)
                sfs[b] = noise
            else:
                sf += _sf_delta(r)
                if not 0 <= sf <= 255:
                    raise AacDecodeError(f"scalefactor {sf} out of range")
                sfs[b] = sf
        out.append(sfs)
    return out


def _decode_pulse(r: _Bits, info: _IcsInfo):
    if info.window_sequence == 2:
        raise AacDecodeError("pulse data in short window")
    n = r.u(2) + 1
    start_sfb = r.u(6)
    if start_sfb >= len(info.swb_offset):
        raise AacDecodeError("pulse start sfb out of range")
    pulses = [(r.u(5), r.u(4)) for _ in range(n)]
    return (start_sfb, pulses)


def _decode_tns(r: _Bits, info: _IcsInfo):
    short = info.window_sequence == 2
    n_filt_bits, len_bits, order_bits = (1, 4, 3) if short else (2, 6, 5)
    filters = []
    for _w in range(info.num_windows):
        n_filt = r.u(n_filt_bits)
        coef_res = r.bit() if n_filt else 0
        wf = []
        for _f in range(n_filt):
            length = r.u(len_bits)
            order = r.u(order_bits)
            if order > 12:
                raise AacDecodeError(f"TNS order {order} > 12 (LC)")
            direction = compress = 0
            coefs = []
            if order:
                direction = r.bit()
                compress = r.bit()
                cb = coef_res + 3 - compress
                coefs = [r.u(cb) for _ in range(order)]
            wf.append((length, order, direction, compress, coef_res, coefs))
        filters.append(wf)
    return filters


def _spectral_band(r: _Bits, cb: int, width: int) -> np.ndarray:
    dims = BOOK_DIMS[cb]
    signed = BOOK_SIGNED[cb]
    m, maxlen = _SPEC_MAPS[cb]
    out = np.zeros(width, dtype=np.float64)
    for i in range(0, width, dims):
        vals = list(_huff(r, m, maxlen))
        if not signed:
            for j, v in enumerate(vals):
                if v:
                    if r.bit():
                        vals[j] = -v
        if cb == ESC_HCB:
            for j, v in enumerate(vals):
                if abs(v) == 16:
                    n = 4
                    while r.bit():
                        n += 1
                        if n > 16:
                            raise AacDecodeError("escape prefix too long")
                    word = r.u(n)
                    mag = (1 << n) + word
                    if mag > 8191:
                        raise AacDecodeError("escape magnitude > 8191")
                    vals[j] = mag if v > 0 else -mag
        out[i:i + dims] = vals
    return out


def _decode_spectral(r: _Bits, ics: _Ics):
    """Quantized coefficients, deinterleaved to [1024] window-major order
    (4.6.3.3: short-window data is stored group -> sfb -> window)."""
    info = ics.info
    coeffs = np.zeros(1024, dtype=np.float64)
    if info.window_sequence == 2:
        win_base = 0
        for g in range(info.num_window_groups):
            glen = info.group_len[g]
            for b in range(info.max_sfb):
                cb = ics.band_cb[g][b]
                lo, hi = info.swb_offset[b], info.swb_offset[b + 1]
                if cb in (ZERO_HCB, NOISE_HCB, INTENSITY_HCB, INTENSITY_HCB2):
                    continue
                for w in range(glen):
                    vals = _spectral_band(r, cb, hi - lo)
                    base = (win_base + w) * 128
                    coeffs[base + lo:base + hi] = vals
            win_base += glen
    else:
        for b in range(info.max_sfb):
            cb = ics.band_cb[0][b]
            lo, hi = info.swb_offset[b], info.swb_offset[b + 1]
            if cb in (ZERO_HCB, NOISE_HCB, INTENSITY_HCB, INTENSITY_HCB2):
                continue
            coeffs[lo:hi] = _spectral_band(r, cb, hi - lo)
    return coeffs


def _decode_ics(r: _Bits, sfi: int, common_info: Optional[_IcsInfo]) -> _Ics:
    global_gain = r.u(8)
    info = common_info if common_info is not None else _decode_ics_info(r, sfi)
    ics = _Ics(info=info, global_gain=global_gain)
    ics.band_cb = _decode_section_data(r, info)
    ics.band_sf = _decode_scalefactors(r, info, ics.band_cb, global_gain)
    if r.bit():
        ics.pulse = _decode_pulse(r, info)
    if r.bit():
        ics.tns = _decode_tns(r, info)
    if r.bit():
        raise AacDecodeError("gain control (SSR) in LC stream")
    ics.coeffs = _decode_spectral(r, ics)
    if ics.pulse is not None:
        _apply_pulse(ics)
    return ics


def _apply_pulse(ics: _Ics):
    start_sfb, pulses = ics.pulse
    if start_sfb >= len(ics.info.swb_offset):
        raise AacDecodeError("pulse sfb out of range")
    k = ics.info.swb_offset[start_sfb]
    for off, amp in pulses:
        k += off
        if k >= 1024:
            raise AacDecodeError("pulse position out of range")
        if ics.coeffs[k] > 0:
            ics.coeffs[k] += amp
        else:
            ics.coeffs[k] -= amp


# ---------------------------------------------------------------------------
# reconstruction: dequant, PNS, IS, MS, TNS
# ---------------------------------------------------------------------------

# output scale matching libavcodec's float convention, calibrated
# against the oracle (uniform 2x across every frame/window type before
# the /65536; the filterbank here uses the 4/N-orthogonal IMDCT kernel)
_OUT_SCALE = 1.0 / 65536.0


def _dequant_inplace(ics: _Ics, rng: np.random.Generator):
    """|q|^(4/3) dequant + per-band 2^((sf-100)/4) gain + PNS noise."""
    info = ics.info
    c = ics.coeffs
    c[:] = np.sign(c) * np.abs(c) ** (4.0 / 3.0)
    win_base = 0
    for g in range(info.num_window_groups):
        glen = info.group_len[g] if info.window_sequence == 2 else 1
        for b in range(info.max_sfb):
            cb = ics.band_cb[g][b]
            if cb in (INTENSITY_HCB, INTENSITY_HCB2):
                continue  # reconstructed from the left channel later
            lo, hi = info.swb_offset[b], info.swb_offset[b + 1]
            if cb == NOISE_HCB:
                # band TOTAL energy = (2^(nrg/4))^2; the -90 bias is already
                # in the noise-energy chain (calibrated against the oracle:
                # per-bin rms = 2^(nrg/4)/sqrt(width)).  The dpcm chain is
                # unbounded in the bitstream; clip at use like libavcodec
                # ([-100, 155]) — Python float pow would otherwise raise
                # OverflowError on crafted input.
                nrg = min(max(ics.band_sf[g][b], -100), 155)
                scale = 2.0 ** (0.25 * nrg)
                for w in range(glen):
                    base = (win_base + w) * 128 if info.window_sequence == 2 else 0
                    noise = rng.standard_normal(hi - lo)
                    norm = np.sqrt(np.sum(noise * noise))
                    c[base + lo:base + hi] = noise * (scale / max(norm, 1e-30))
            elif cb != ZERO_HCB:
                gain = 2.0 ** (0.25 * (ics.band_sf[g][b] - 100))
                for w in range(glen):
                    base = (win_base + w) * 128 if info.window_sequence == 2 else 0
                    c[base + lo:base + hi] *= gain
        win_base += glen if info.window_sequence == 2 else 0


def _apply_ms(left: _Ics, right: _Ics, ms_mask: Optional[List[List[int]]]):
    if ms_mask is None:
        return
    info = left.info
    win_base = 0
    for g in range(info.num_window_groups):
        glen = info.group_len[g] if info.window_sequence == 2 else 1
        for b in range(info.max_sfb):
            if not ms_mask[g][b]:
                continue
            rcb = right.band_cb[g][b]
            lcb = left.band_cb[g][b]
            if rcb in (INTENSITY_HCB, INTENSITY_HCB2) or rcb == NOISE_HCB \
                    or lcb == NOISE_HCB:
                continue
            lo, hi = info.swb_offset[b], info.swb_offset[b + 1]
            for w in range(glen):
                base = (win_base + w) * 128 if info.window_sequence == 2 else 0
                m = left.coeffs[base + lo:base + hi].copy()
                s = right.coeffs[base + lo:base + hi].copy()
                left.coeffs[base + lo:base + hi] = m + s
                right.coeffs[base + lo:base + hi] = m - s
        win_base += glen if info.window_sequence == 2 else 0


def _apply_intensity(left: _Ics, right: _Ics, ms_mask, ms_present: int):
    info = right.info
    win_base = 0
    for g in range(info.num_window_groups):
        glen = info.group_len[g] if info.window_sequence == 2 else 1
        for b in range(info.max_sfb):
            cb = right.band_cb[g][b]
            if cb not in (INTENSITY_HCB, INTENSITY_HCB2):
                continue
            sign = 1.0 if cb == INTENSITY_HCB else -1.0
            if ms_present == 1 and ms_mask is not None and ms_mask[g][b]:
                sign = -sign
            # is_pos dpcm chain is unbounded in the bitstream; clip at use
            # like libavcodec ([-155, 100]) to keep 2^x finite on crafted
            # input (Python float pow raises OverflowError past ~2^1023)
            is_pos = min(max(right.band_sf[g][b], -155), 100)
            scale = sign * 2.0 ** (-0.25 * is_pos)
            lo, hi = info.swb_offset[b], info.swb_offset[b + 1]
            for w in range(glen):
                base = (win_base + w) * 128 if info.window_sequence == 2 else 0
                right.coeffs[base + lo:base + hi] = (
                    left.coeffs[base + lo:base + hi] * scale
                )
        win_base += glen if info.window_sequence == 2 else 0


# TNS: maximum bands the filter may cover, long windows, per sfi
# (14496-3 table 4.139 values confirmed behaviorally for the rates the
# differential suite exercises)
TNS_MAX_BANDS_LONG = {0: 31, 1: 31, 2: 34, 3: 40, 4: 42, 5: 51,
                      6: 46, 7: 46, 8: 42, 9: 42, 10: 42, 11: 39}
TNS_MAX_BANDS_SHORT = {0: 9, 1: 9, 2: 10, 3: 14, 4: 14, 5: 14,
                       6: 14, 7: 14, 8: 14, 9: 14, 10: 14, 11: 14}


def _tns_coefs(order, compress, coef_res, raw) -> np.ndarray:
    """Inverse quantization of TNS reflection coefficients (4.6.9.3):
    sin(c*pi/(2^res - 1)) for c >= 0, sin(c*pi/(2^res + 1)) for c < 0,
    where res is the UNcompressed resolution (compression narrows the
    coded range, not the quantizer)."""
    bits = coef_res + 3 - compress
    res = coef_res + 3
    iq = np.zeros(order)
    for i, c in enumerate(raw):
        # sign-extend
        if c >= (1 << (bits - 1)):
            c -= 1 << bits
        den = ((1 << res) - 1) if c >= 0 else ((1 << res) + 1)
        iq[i] = math.sin(c * math.pi / den)
    # reflection -> direct form LPC
    lpc = np.zeros(order + 1)
    lpc[0] = 1.0
    for m in range(1, order + 1):
        prev = lpc[:m].copy()
        for i in range(1, m):
            lpc[i] = prev[i] + iq[m - 1] * prev[m - i]
        lpc[m] = iq[m - 1]
    return lpc


def _apply_tns(ics: _Ics, sfi: int):
    if ics.tns is None:
        return
    info = ics.info
    short = info.window_sequence == 2
    tns_max = (TNS_MAX_BANDS_SHORT if short else TNS_MAX_BANDS_LONG)[sfi]
    mmm = min(tns_max, info.max_sfb)
    for w, wf in enumerate(ics.tns):
        bottom = info.num_swb
        for (length, order, direction, compress, coef_res, raw) in wf:
            top = bottom
            bottom = max(0, top - length)
            if order == 0:
                continue
            lpc = _tns_coefs(order, compress, coef_res, raw)
            start = info.swb_offset[min(bottom, mmm)]
            end = info.swb_offset[min(top, mmm)]
            if start >= end:
                continue
            base = w * 128 if short else 0
            seg = ics.coeffs[base + start:base + end]
            if direction:
                seg = seg[::-1]
            # all-pole synthesis filter y[n] = x[n] - sum lpc[i] y[n-i]
            y = seg
            for n in range(len(y)):
                acc = y[n]
                for i in range(1, min(order, n) + 1):
                    acc -= lpc[i] * y[n - i]
                y[n] = acc
            if direction:
                ics.coeffs[base + start:base + end] = y[::-1]


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

ID_SCE, ID_CPE, ID_CCE, ID_LFE, ID_DSE, ID_PCE, ID_FIL, ID_END = range(8)

# Hard bound on channel elements per raw_data_block (libavcodec uses 64).
MAX_CHANNELS = 64

# decoded element order -> conventional output order (FL FR FC LFE BL BR)
# for the standard channel configurations (channel count keyed; configs
# 1-2 are identity, 3: C/L/R, 4: +Cs, 5: +Ls/Rs, 6: 5.1)
_CHANNEL_ORDER = {
    3: [1, 2, 0],
    4: [1, 2, 0, 3],
    5: [1, 2, 0, 3, 4],
    6: [1, 2, 0, 5, 3, 4],
}


class AacLcDecoder:
    """Stateful AAC-LC decoder.

    ``decode_adts(data)`` accepts one or more concatenated ADTS frames and
    returns a list of (pcm [1024, channels] float32) arrays;
    ``decode_raw(payload, sfi, channels)`` decodes one raw_data_block
    (e.g. an MP4 sample with config from the ASC).
    """

    def __init__(self, asc: Optional[AudioSpecificConfiguration] = None):
        self.asc = asc
        self._fbs: Dict[int, _Filterbank] = {}
        self._rng = np.random.default_rng(0x6D78)  # PNS (impl-defined)

    # -- element decoding ----------------------------------------------------

    def _channel_out(self, idx: int) -> _Filterbank:
        fb = self._fbs.get(idx)
        if fb is None:
            fb = self._fbs[idx] = _Filterbank()
        return fb

    def _decode_sce(self, r: _Bits, sfi: int) -> List[np.ndarray]:
        r.u(4)  # element_instance_tag
        ics = _decode_ics(r, sfi, None)
        _dequant_inplace(ics, self._rng)
        _apply_tns(ics, sfi)
        return [ics]

    def _decode_cpe(self, r: _Bits, sfi: int) -> List[np.ndarray]:
        r.u(4)
        ms_present = 0
        ms_mask = None
        if r.bit():  # common_window
            info = _decode_ics_info(r, sfi)
            ms_present = r.u(2)
            if ms_present == 1:
                ms_mask = [
                    [r.bit() for _ in range(info.max_sfb)]
                    for _g in range(info.num_window_groups)
                ]
            elif ms_present == 2:
                ms_mask = [
                    [1] * info.max_sfb for _g in range(info.num_window_groups)
                ]
            elif ms_present == 3:
                raise AacDecodeError("reserved ms_mask_present")
            left = _decode_ics(r, sfi, info)
            right = _decode_ics(r, sfi, info)
        else:
            left = _decode_ics(r, sfi, None)
            right = _decode_ics(r, sfi, None)
        _dequant_inplace(left, self._rng)
        _dequant_inplace(right, self._rng)
        if ms_present:
            _apply_ms(left, right, ms_mask)
        _apply_intensity(left, right, ms_mask, ms_present)
        _apply_tns(left, sfi)
        _apply_tns(right, sfi)
        return [left, right]

    def _skip_pce(self, r: _Bits):
        r.u(4)  # instance tag
        r.u(2)  # object type
        r.u(4)  # sampling frequency index
        nfront, nside, nback, nlfe = r.u(4), r.u(4), r.u(4), r.u(2)
        ndata, ncc = r.u(3), r.u(4)
        if r.bit():
            r.u(4)  # mono mixdown
        if r.bit():
            r.u(4)  # stereo mixdown
        if r.bit():
            r.u(3)  # matrix mixdown + pseudo surround
        for _ in range(nfront + nside + nback):
            r.u(5)  # is_cpe + tag
        for _ in range(nlfe + ndata):
            r.u(4)
        for _ in range(ncc):
            r.u(5)
        r.align()
        n = r.u(8)
        for _ in range(n):
            r.u(8)

    def _skip_fil(self, r: _Bits):
        cnt = r.u(4)
        if cnt == 15:
            cnt += r.u(8) - 1
        for _ in range(cnt):
            r.u(8)

    def decode_raw(self, payload: bytes, sfi: int) -> np.ndarray:
        """One raw_data_block -> [1024, n_channels] float32."""
        r = _Bits(payload)
        chans: List[_Ics] = []
        while True:
            if r.bits_left() < 3:
                raise AacDecodeError("missing END element")
            eid = r.u(3)
            if eid == ID_END:
                break
            if eid == ID_SCE or eid == ID_LFE:
                chans.extend(self._decode_sce(r, sfi))
            elif eid == ID_CPE:
                chans.extend(self._decode_cpe(r, sfi))
            elif eid == ID_DSE:
                r.u(4)
                align = r.bit()
                cnt = r.u(8)
                if cnt == 255:
                    cnt += r.u(8)
                if align:
                    r.align()
                for _ in range(cnt):
                    r.u(8)
            elif eid == ID_PCE:
                self._skip_pce(r)
            elif eid == ID_FIL:
                self._skip_fil(r)
            elif eid == ID_CCE:
                raise AacDecodeError("CCE element unsupported")
            else:
                raise AacDecodeError(f"unexpected element id {eid}")
            if len(chans) > MAX_CHANNELS:
                # a crafted payload of minimal ~30-bit SCEs would otherwise
                # cost minutes of CPU and GBs of output per MB of input
                # (RTMP messages can be 16 MB from an unauthenticated
                # publisher, and decode_audio runs on the event loop);
                # libavcodec caps at 64 channels too
                raise AacDecodeError(
                    f"more than {MAX_CHANNELS} channel elements")
        if not chans:
            raise AacDecodeError("raw_data_block with no channel elements")
        out = np.empty((1024, len(chans)), dtype=np.float32)
        for i, ics in enumerate(chans):
            fb = self._channel_out(i)
            pcm = fb.process(
                ics.coeffs, ics.info.window_sequence, ics.info.window_shape
            )
            out[:, i] = (pcm * _OUT_SCALE).astype(np.float32)
        # standard channel configs decode in element order (C, L, R, ...);
        # reorder to the conventional output layout (FL FR FC [LFE] ...)
        perm = _CHANNEL_ORDER.get(len(chans))
        return out[:, perm] if perm is not None else out

    def decode_adts(self, data: bytes) -> List[np.ndarray]:
        """Concatenated ADTS frames -> list of [1024, ch] float32."""
        out = []
        pos = 0
        while pos + 7 <= len(data):
            hdr = parse_adts_header(data[pos:])
            ln = hdr["frame_length"]
            if pos + ln > len(data):
                raise AacDecodeError("truncated ADTS frame")
            hdr_len = 7 if hdr["protection_absent"] else 9
            body = data[pos + hdr_len:pos + ln]
            out.append(self.decode_raw(body, hdr["sampling_frequency_index"]))
            pos += ln
        if pos != len(data):
            raise AacDecodeError("trailing garbage after ADTS frames")
        return out
