"""Pure AAC-LC encoder (zero native dependencies).

Completes the zero-dep codec tier's round trip: with the decoder
(av/aacdec.py) this makes pure-tier RTMP publish and fMP4 monitoring
standards-compliant on a codec-less image — FLV/MP4 players expect AAC,
and the previous fallbacks (PCM-FLV, FLAC-in-fMP4) are nonstandard or
niche.  The reference cannot encode at all without fdk-aac FFI
(``/root/reference/src/video/encode.rs:146-222``).

Scope and posture: correctness-first LC subset —
  * ONLY_LONG window sequence, sine windows (valid for any content;
    transients get 2048-sample pre-echo instead of window switching)
  * flat allocation: one quantizer step per frame anchored at the frame
    peak (quality knob = max quantized magnitude there; quiet bands
    quantize to zero on their own), per-band sf bumps only at the
    escape cap; scalefactors dpcm-coded
  * per-band spectral codebook chosen cost-optimally from each
    magnitude class's pair (the recovered tables make exact bit costs
    available), escapes via codebook 11
  * stereo as L/R in one CPE (common window, no M/S) — decoders that
    apply M/S see ms_mask_present=0
  * no TNS/PNS/pulse (decode-side tools; optional for encoders)

Output frames are raw_data_blocks; ADTS framing via av/aac.py.  Streams
are validated by libavcodec in STRICT mode and by our own decoder
(tests/test_aacenc.py) — encoder and decoder share no code paths beyond
the constant tables, so the round trip cross-checks both.

Tables: aac_tables.py (clean-room recovery, tools/extract_aac_tables.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from mixlab_tpu.av.aac import (
    AacError,
    AudioObjectType,
    AudioSpecificConfiguration,
    sampling_frequency_index,
)
from mixlab_tpu.av.aac_tables import (
    SF_CODEBOOK,
    SPECTRAL_CODEBOOKS,
    SWB_OFFSET_LONG,
)
from mixlab_tpu.av.h264enc import BitWriter

N = 1024


class AacEncodeError(AacError):
    pass


# ---------------------------------------------------------------------------
# inverse code maps (symbol -> (code, bits))
# ---------------------------------------------------------------------------


def _inv(table):
    return {tuple(v) if isinstance(v, tuple) else v: (int(k, 2), len(k))
            for k, v in table.items()}


_SF_ENC = {v: (int(k, 2), len(k)) for k, v in SF_CODEBOOK.items()}
_SPEC_ENC: Dict[int, dict] = {b: _inv(t) for b, t in SPECTRAL_CODEBOOKS.items()}

# dense (codes, lengths) arrays per book, indexed by shifted symbol values
# (signed books: v + lav) — vectorized cost/emit, no per-tuple Python dicts
_BOOK_LAV = {1: 1, 2: 1, 3: 2, 4: 2, 5: 4, 6: 4, 7: 7, 8: 7, 9: 12, 10: 12,
             11: 16}


def _dense(book: int):
    dims = 4 if book <= 4 else 2
    signed = book in (1, 2, 5, 6)
    lav = _BOOK_LAV[book]
    side = (2 * lav + 1) if signed else (lav + 1)
    codes = np.zeros((side,) * dims, dtype=np.int64)
    lens = np.zeros((side,) * dims, dtype=np.int64)
    for sym, (code, bits) in _SPEC_ENC[book].items():
        idx = tuple((v + lav) if signed else v for v in sym)
        codes[idx] = code
        lens[idx] = bits
    return codes, lens


_SPEC_DENSE = {b: _dense(b) for b in range(1, 12)}

# magnitude class -> candidate codebook pair
_BOOK_CLASSES: List[Tuple[int, Tuple[int, ...]]] = [
    (0, ()),            # all zero -> ZERO_HCB
    (1, (1, 2)),        # 4-dim signed
    (2, (3, 4)),        # 4-dim unsigned
    (4, (5, 6)),        # 2-dim signed
    (7, (7, 8)),        # 2-dim unsigned
    (12, (9, 10)),      # 2-dim unsigned
    (8191, (11,)),      # 2-dim unsigned + escapes
]


def _esc_bits(mag: int) -> int:
    n = mag.bit_length() - 5
    return 2 * n + 5


def _tuple_indices(q: np.ndarray, book: int) -> np.ndarray:
    """[n_tuples, dims] dense-table indices for the band's values."""
    dims = 4 if book <= 4 else 2
    signed = book in (1, 2, 5, 6)
    lav = _BOOK_LAV[book]
    t = q.reshape(-1, dims)
    if signed:
        return t + lav
    t = np.abs(t)
    return np.minimum(t, 16) if book == 11 else t


def _band_cost(q: np.ndarray, book: int) -> int:
    _codes, lens = _SPEC_DENSE[book]
    idx = _tuple_indices(q, book)
    bits = int(lens[tuple(idx.T)].sum())
    if book not in (1, 2, 5, 6):
        bits += int(np.count_nonzero(q))
        if book == 11:
            for v in q:
                if abs(int(v)) >= 16:
                    bits += _esc_bits(abs(int(v)))
    return bits


def _pick_book(q: np.ndarray) -> Tuple[int, int]:
    """(codebook, bits) — cheapest book whose range covers the band."""
    maxq = int(np.max(np.abs(q))) if len(q) else 0
    if maxq == 0:
        return 0, 0
    for lav, books in _BOOK_CLASSES:
        if maxq > lav:
            continue
        best = None
        for b in books:
            c = _band_cost(q, b)
            if best is None or c < best[1]:
                best = (b, c)
        if best is not None:
            return best
    raise AacEncodeError(f"quantized magnitude {maxq} uncodeable")


def _write_band(w: BitWriter, q: np.ndarray, book: int):
    codes, lens = _SPEC_DENSE[book]
    dims = 4 if book <= 4 else 2
    signed = book in (1, 2, 5, 6)
    idx = _tuple_indices(q, book)
    key = tuple(idx.T)
    cws = codes[key]
    nbits = lens[key]
    if signed:
        for c, n in zip(cws.tolist(), nbits.tolist()):
            w.u(c, n)
        return
    tv = q.reshape(-1, dims)
    for i, (c, n) in enumerate(zip(cws.tolist(), nbits.tolist())):
        w.u(c, n)
        chunk = tv[i]
        for v in chunk.tolist():
            if v != 0:
                w.u(1 if v < 0 else 0, 1)
        if book == 11:
            for v in chunk.tolist():
                mag = abs(v)
                if mag >= 16:
                    n2 = mag.bit_length() - 5
                    w.u((1 << n2) - 1, n2)   # n2 ones
                    w.u(0, 1)                # stop
                    w.u(mag - (1 << (n2 + 4)), n2 + 4)


# ---------------------------------------------------------------------------
# analysis filterbank (forward MDCT, sine window)
# ---------------------------------------------------------------------------

_ANALYSIS: Optional[np.ndarray] = None


def _analysis_matrix() -> np.ndarray:
    global _ANALYSIS
    if _ANALYSIS is None:
        n = np.arange(2 * N)
        w = np.sin(np.pi / (2 * N) * (n + 0.5))
        k = np.arange(N)[:, None]
        C = np.cos(2.0 * np.pi / (2 * N) * (n[None, :] + 0.5 + N / 2) * (k + 0.5))
        _ANALYSIS = (C * w[None, :]).astype(np.float32)
    return _ANALYSIS


# analysis of a [-1, 1] float span -> decoder coefficient domain
# (aacdec._OUT_SCALE is the inverse; verified by the extraction oracle)
_COEF_SCALE = 65536.0


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class AacLcEncoder:
    """Granule-at-a-time AAC-LC encoder.

    ``quality``: target max quantized magnitude at the frame peak
    (higher = finer quantization = more bits; the spectral noise floor
    sits quality^(4/3) below the peak).  The default 60 measured 18-180
    kb/s stereo depending on spectral density (tests/test_aacenc.py).
    """

    def __init__(self, sample_rate: int = 44100, channels: int = 2,
                 quality: int = 60):
        if channels not in (1, 2):
            raise AacEncodeError("mono or stereo only")
        self.sample_rate = sample_rate
        self.channels = channels
        self.quality = max(1, min(int(quality), 6000))
        self.sfi = sampling_frequency_index(sample_rate)
        offs = SWB_OFFSET_LONG.get(self.sfi)
        if offs is None:
            raise AacEncodeError(f"unsupported sample rate {sample_rate}")
        self.swb = offs
        self.num_swb = len(offs) - 1
        # 1024-sample lookahead (the MDCT span covers granule k and k+1)
        self._hist = np.zeros((N, channels), dtype=np.float64)
        self.asc = AudioSpecificConfiguration(
            object_type=AudioObjectType.LOW_COMPLEXITY,
            sampling_frequency_index=self.sfi,
            channel_configuration=channels,
        )

    # -- per-channel ICS --------------------------------------------------

    def _quantize(self, X: np.ndarray):
        """Per-band scalefactors + quantized values.

        Allocation: constant per-band peak SNR (quality = target max
        quantized magnitude) above a -55 dB spectral floor relative to
        the frame peak — bands below the floor are zeroed, which is what
        keeps tonal content from paying full price for MDCT leakage
        (a stand-in for a psychoacoustic model; documented deviation)."""
        sfs = np.zeros(self.num_swb, dtype=np.int64)
        qbands: List[np.ndarray] = []
        frame_peak = float(np.max(np.abs(X)))
        if frame_peak <= 1e-9:
            return np.full(self.num_swb, -1, dtype=np.int64), [
                np.zeros(self.swb[b + 1] - self.swb[b], dtype=np.int64)
                for b in range(self.num_swb)
            ]
        # one quantizer step for the whole frame, anchored at the frame
        # peak: spectral noise floor sits quality^(4/3) below the peak and
        # quiet bands quantize to zero on their own (bitrate adapts to
        # spectral sparsity).  Per-band sf only rises above the base where
        # the escape cap (8191) would clip.
        base_sf = 100 + int(np.floor(
            4.0 * (np.log2(frame_peak) - (4.0 / 3.0) * np.log2(self.quality))
        ))
        base_sf = max(0, min(255, base_sf))
        absX = np.abs(X)
        step = 2.0 ** (0.25 * (base_sf - 100))
        # whole-spectrum quantization at the base step, one vector pass
        q_full = (np.sign(X) * np.floor((absX / step) ** 0.75 + 0.4054)
                  ).astype(np.int64)
        starts = np.asarray(self.swb[:-1])
        peaks = np.maximum.reduceat(absX, starts)
        nonzero = np.add.reduceat(np.abs(q_full), starts)
        for b in range(self.num_swb):
            lo, hi = self.swb[b], self.swb[b + 1]
            if nonzero[b] == 0:
                sfs[b] = -1
                qbands.append(q_full[lo:hi])
                continue
            sf = base_sf
            if (peaks[b] / step) ** 0.75 + 0.4054 >= 8191:
                # escape-cap bump (rare): re-quantize this band coarser.
                # The bump is dpcm-coded against the previous band, so it
                # cannot exceed +60; past that the clip at 8191 absorbs
                # the (already enormous) overshoot instead.
                sf_cap = min(255, base_sf + 60)
                xb = X[lo:hi]
                while sf < sf_cap:
                    s2 = 2.0 ** (0.25 * (sf - 100))
                    if (peaks[b] / s2) ** 0.75 + 0.4054 < 8191:
                        break
                    sf += 4
                s2 = 2.0 ** (0.25 * (sf - 100))
                q = np.sign(xb) * np.floor(np.abs(xb / s2) ** 0.75 + 0.4054)
                q = np.clip(q, -8191, 8191).astype(np.int64)
                if not np.any(q):
                    sfs[b] = -1
                    qbands.append(q)
                    continue
                sfs[b] = sf
                qbands.append(q)
                continue
            sfs[b] = sf
            qbands.append(q_full[lo:hi])
        return sfs, qbands

    def _write_ics(self, w: BitWriter, X: np.ndarray, write_info: bool):
        sfs, qbands = self._quantize(X)
        books = []
        for b in range(self.num_swb):
            book, _bits = (0, 0) if sfs[b] < 0 else _pick_book(qbands[b])
            books.append(book)
        # trim trailing zero bands
        max_sfb = self.num_swb
        while max_sfb > 0 and books[max_sfb - 1] == 0:
            max_sfb -= 1
        coded = [b for b in range(max_sfb) if books[b] != 0]
        global_gain = int(sfs[coded[0]]) if coded else 100

        w.u(global_gain, 8)
        if write_info:
            self._write_ics_info(w, max_sfb)
        # section_data: runs of equal codebook
        b = 0
        while b < max_sfb:
            run = 1
            while b + run < max_sfb and books[b + run] == books[b]:
                run += 1
            w.u(books[b], 4)
            r = run
            while r >= 31:
                w.u(31, 5)
                r -= 31
            w.u(r, 5)
            b += run
        # scalefactors (dpcm from global_gain)
        prev = global_gain
        for b in range(max_sfb):
            if books[b] == 0:
                continue
            d = int(sfs[b]) - prev
            code, bits = _SF_ENC[d + 60]
            w.u(code, bits)
            prev = int(sfs[b])
        w.u(0, 1)  # pulse
        w.u(0, 1)  # tns
        w.u(0, 1)  # gain control
        for b in range(max_sfb):
            if books[b] != 0:
                _write_band(w, qbands[b], books[b])

    def _write_ics_info(self, w: BitWriter, max_sfb: int):
        w.u(0, 1)   # ics_reserved
        w.u(0, 2)   # ONLY_LONG
        w.u(0, 1)   # sine shape
        w.u(max_sfb, 6)
        w.u(0, 1)   # predictor_data_present

    # -- public -----------------------------------------------------------

    def encode_granule(self, pcm: np.ndarray) -> bytes:
        """One 1024-sample granule ([1024, ch] float in [-1, 1] or i16)
        -> one raw_data_block.  Output has the standard 1024-sample
        encoder latency (the analysis span needs the next granule's
        region, served by the history buffer)."""
        pcm = np.asarray(pcm)
        if pcm.dtype == np.int16:
            pcm = pcm.astype(np.float64) / 32768.0
        pcm = pcm.reshape(-1, self.channels).astype(np.float64)
        if pcm.shape[0] != N:
            raise AacEncodeError(f"granule must be {N} samples")
        span = np.concatenate([self._hist, pcm])  # [2048, ch]
        self._hist = pcm

        M = _analysis_matrix()
        # both channels in one sgemm; quantization math stays float64
        Xall = (_COEF_SCALE * (M @ span.astype(np.float32))).astype(np.float64)
        w = BitWriter()
        if self.channels == 1:
            w.u(0, 3)   # SCE
            w.u(0, 4)
            self._write_ics(w, Xall[:, 0], write_info=True)
        else:
            w.u(1, 3)   # CPE
            w.u(0, 4)
            w.u(1, 1)   # common_window
            # ics_info is shared; max_sfb must cover both channels, so use
            # the full band count (trailing zero bands cost 0 spectral
            # bits and ~0 section bits)
            self._write_ics_info(w, self.num_swb)
            w.u(0, 2)   # ms_mask_present = 0
            for ch in range(2):
                self._write_ics_common(w, Xall[:, ch])
        w.u(7, 3)   # END
        w.align_zero()
        return bytes(w.buf)

    def _write_ics_common(self, w: BitWriter, X: np.ndarray):
        """ICS body when ics_info was written at the CPE level: max_sfb is
        fixed to num_swb, so zero bands are coded as ZERO sections."""
        sfs, qbands = self._quantize(X)
        books = [0 if sfs[b] < 0 else _pick_book(qbands[b])[0]
                 for b in range(self.num_swb)]
        coded = [b for b in range(self.num_swb) if books[b] != 0]
        global_gain = int(sfs[coded[0]]) if coded else 100
        w.u(global_gain, 8)
        b = 0
        while b < self.num_swb:
            run = 1
            while b + run < self.num_swb and books[b + run] == books[b]:
                run += 1
            w.u(books[b], 4)
            r = run
            while r >= 31:
                w.u(31, 5)
                r -= 31
            w.u(r, 5)
            b += run
        prev = global_gain
        for b in range(self.num_swb):
            if books[b] == 0:
                continue
            d = int(sfs[b]) - prev
            code, bits = _SF_ENC[d + 60]
            w.u(code, bits)
            prev = int(sfs[b])
        w.u(0, 1)
        w.u(0, 1)
        w.u(0, 1)
        for b in range(self.num_swb):
            if books[b] != 0:
                _write_band(w, qbands[b], books[b])
