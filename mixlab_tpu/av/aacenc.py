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
  * VBR quality mode: flat allocation — one quantizer step per frame
    anchored at the frame peak (quality knob = max quantized magnitude
    there; quiet bands quantize to zero on their own), per-band sf bumps
    only at the escape cap; scalefactors dpcm-coded
  * CBR mode (round 5): coarse rate control (global-step search +
    reservoir, targeting e.g. the reference's 160 kb/s op point,
    stream_output.rs:337-345) with psychoacoustic-margin per-band
    allocation — spreading-function masked thresholds shape the noise
    floor, adopted per frame only when the shaped plan beats the flat
    anchor on exact band-SNR at the same rate (measured-never-worse)
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
                 quality: int = 60, bitrate: Optional[int] = None,
                 band_alloc: bool = True):
        if channels not in (1, 2):
            raise AacEncodeError("mono or stereo only")
        self.sample_rate = sample_rate
        self.channels = channels
        self.quality = max(1, min(int(quality), 6000))
        # coarse rate control (round 5): target bits/s across all channels.
        # None = VBR quality mode (the realtime default — zero extra cost);
        # set (e.g. 160_000, the reference broadcast op point,
        # stream_output.rs:337-345) for a per-granule search on the global
        # step, warm-started from the previous granule so steady content
        # converges in ~1 iteration.
        self.bitrate = int(bitrate) if bitrate else None
        self._rc_bases: Dict[str, int] = {}  # warm starts per offsets-kind
        # bit reservoir: accumulated (target - actual) bits.  The sf knob is
        # coarse on flat spectra (one step can swing a granule's bits 2-3x),
        # so per-granule hits can miss; steering each granule's target by
        # the reservoir keeps the LONG-RUN rate on the bitrate (the same
        # role as fdk's reservoir, ISO 14496-3 4.5.3)
        self._rc_reservoir = 0.0
        self.last_frame_bits = 0
        # per-band allocation (round 5): scalefactor offsets that track each
        # band's own level at GAMMA_ALLOC of the band-to-peak distance, so
        # the noise floor follows the spectrum instead of sitting flat at
        # the frame-peak anchor — quiet tonal partials keep a constant
        # relative SNR (the stand-in for fdk's psychoacoustic allocation).
        # Bounded to [-24, 0]: combined with the escape-bump cap (+36) the
        # worst adjacent-band dpcm delta stays within the +-60 code range.
        self.band_alloc = bool(band_alloc)
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

    def _base_from_quality(self, frame_peak: float) -> int:
        """Quality -> global step anchor: spectral noise floor sits
        quality^(4/3) below the frame peak."""
        base_sf = 100 + int(np.floor(
            4.0 * (np.log2(frame_peak) - (4.0 / 3.0) * np.log2(self.quality))
        ))
        return max(0, min(255, base_sf))

    # Psychoacoustic-margin allocation (round 5).  A masked threshold per
    # scalefactor band from a triangular spreading function over SFB index
    # (SFB widths are roughly Bark-ish): a band may carry noise SMR_SF
    # scalefactor steps (~18 dB) below its own peak, or whatever a louder
    # neighbor's spreading allows, whichever is higher.  Offsets are the
    # threshold relative to the MOST masked band, <= 0 (finer); the rate
    # loop re-anchors the absolute level, so at constant rate the noise
    # floor follows the threshold contour instead of sitting flat at the
    # frame peak.  Why spreading matters: naive level-tracking allocation
    # spends enormous bits on the MDCT leakage skirts around strong
    # partials; under spreading those bands inherit the partial's
    # threshold and stay coarse, while genuinely isolated quiet partials
    # get the fine steps.  Measured (tests/test_aacenc.py): +3 dB
    # band-mean / +9 dB band-min SNR on tonal content at equal rate.
    #
    # ATTACK frames bypass allocation: on transients the decoded error is
    # pre-echo-bound (ONLY_LONG windows — documented scope), so shaping
    # can only move bits away from the waveform-dominant bands; measured,
    # it costs ~1 dB band-mean there.  The detector is the standard
    # window-switch signal: sub-block energy crest over the analysis span.
    # Units: 1 sf step = 1.505 dB; levels are 4*log2(amplitude).
    SMR_SF = 12          # ~18 dB signal-to-mask in sf steps
    SLOPE_SF = 10        # ~15 dB threshold decay per SFB distance
    ALLOC_MIN = -24      # with the +36 escape-bump cap: dpcm delta <= 60
    ZERO_FLOOR_SF = 52   # bands >78 dB below peak keep the flat base (-> 0)
    ATTACK_CREST = 8.0   # sub-block energy max/mean over the 2048 span

    @classmethod
    def _is_attack(cls, span: np.ndarray) -> bool:
        e = np.sum(span.astype(np.float64) ** 2, axis=1)
        sub = e[: (len(e) // 256) * 256].reshape(-1, 256).sum(axis=1)
        mean = float(np.mean(sub))
        if mean <= 1e-12:
            return False
        return float(np.max(sub)) / mean > cls.ATTACK_CREST

    def _alloc_offsets(self, absX: np.ndarray, frame_peak: float) -> Optional[np.ndarray]:
        starts = np.asarray(self.swb[:-1])
        widths = np.diff(np.asarray(self.swb)).astype(np.float64)
        peaks = np.maximum.reduceat(absX[: self.swb[-1]], starts)
        lvl = 4.0 * np.log2(np.maximum(peaks, 1e-30))  # sf-step units
        # per-band tonality from the in-band crest (peak^2 * width /
        # energy): a sine concentrates in ~1 coefficient (crest ~ width),
        # noise spreads evenly (crest ~ O(1)).  Noise-like bands mask
        # themselves far better than tones, so they need less SNR — a
        # broadband transient floor must not demand tone-grade fidelity
        # across the whole spectrum (measured: without this, a click bed
        # under a bass line pulls ~1 dB band-mean SNR at equal rate).
        energy = np.add.reduceat(absX[: self.swb[-1]] ** 2, starts)
        crest = peaks ** 2 * widths / np.maximum(energy, 1e-30)
        smr = np.clip(2.0 * np.log2(np.maximum(crest, 1.0)), 4.0, self.SMR_SF)
        own = lvl - smr
        # spread: thr_b = max_b' (own_b' - SLOPE_SF*|b-b'|), two linear
        # decaying-max passes
        thr = own.copy()
        for i in range(1, len(thr)):           # spread upward
            thr[i] = max(thr[i], thr[i - 1] - self.SLOPE_SF)
        for i in range(len(thr) - 2, -1, -1):  # spread downward
            thr[i] = max(thr[i], thr[i + 1] - self.SLOPE_SF)
        off = np.floor(thr - np.max(thr)).astype(np.int64)
        off = np.clip(off, self.ALLOC_MIN, 0)
        # truly-empty bands stay at the flat base and quantize to zero —
        # fine steps on the deep noise floor buy bits for nothing
        off[lvl < 4.0 * np.log2(max(frame_peak, 1e-30)) - self.ZERO_FLOOR_SF] = 0
        return off if np.any(off) else None

    def _quantize(self, X: np.ndarray, base_sf: Optional[int] = None,
                  offsets: Optional[np.ndarray] = None):
        """Per-band scalefactors + quantized values at ``base_sf`` (+ the
        per-band allocation ``offsets``).

        Flat mode (offsets None/zero): one quantizer step for the whole
        frame anchored at the frame peak — quiet bands quantize to zero on
        their own, so bitrate adapts to spectral sparsity.  Allocation mode
        shapes the noise floor along the spectrum (see __init__).  Per-band
        sf additionally rises above the base where the escape cap (8191)
        would clip (bounded +36 so dpcm deltas stay within +-60)."""
        frame_peak = float(np.max(np.abs(X)))
        if frame_peak <= 1e-9:
            return np.full(self.num_swb, -1, dtype=np.int64), [
                np.zeros(self.swb[b + 1] - self.swb[b], dtype=np.int64)
                for b in range(self.num_swb)
            ]
        if base_sf is None:
            base_sf = self._base_from_quality(frame_peak)
        absX = np.abs(X)
        n_spec = self.swb[-1]
        widths = np.diff(np.asarray(self.swb))
        if offsets is None:
            offsets = np.zeros(self.num_swb, dtype=np.int64)
        band_sf = np.clip(base_sf + offsets, 0, 255).astype(np.int64)
        step_c = np.repeat(2.0 ** (0.25 * (band_sf - 100)), widths)
        # whole-spectrum quantization, one vector pass
        q_full = (np.sign(X[:n_spec])
                  * np.floor((absX[:n_spec] / step_c) ** 0.75 + 0.4054)
                  ).astype(np.int64)
        starts = np.asarray(self.swb[:-1])
        peaks = np.maximum.reduceat(absX[:n_spec], starts)
        nonzero = np.add.reduceat(np.abs(q_full), starts)
        maxq = np.maximum.reduceat(np.abs(q_full), starts)
        sfs = band_sf.copy()
        qbands: List[np.ndarray] = []
        for b in range(self.num_swb):
            lo, hi = self.swb[b], self.swb[b + 1]
            if nonzero[b] == 0:
                sfs[b] = -1
                qbands.append(q_full[lo:hi])
                continue
            if maxq[b] >= 8191:
                # escape-cap bump (rare): re-quantize this band coarser.
                # Bounded at base+36: with allocation offsets >= -24 the
                # dpcm delta against any neighbor stays within the +-60
                # code range; past the cap the clip at 8191 absorbs the
                # (already enormous) overshoot instead.
                sf = int(band_sf[b])
                sf_cap = min(255, base_sf + 36)
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
            qbands.append(q_full[lo:hi])
        return sfs, qbands

    _ALLOC_UNSET = object()

    def _plan_channel(self, X: np.ndarray, base_sf: Optional[int] = None,
                      offsets=_ALLOC_UNSET, attack: bool = False):
        """Quantize + pick codebooks + estimate the channel's coded bits
        (spectra + scalefactors + sections; used by the rate loop).

        ``offsets``: precomputed allocation offsets (or None for flat).
        The rate loop decides them ONCE per frame and holds them across
        iterations — re-deciding at every candidate base makes the search
        oscillate."""
        if offsets is self._ALLOC_UNSET:
            # VBR (quality) mode plans flat: allocation is an equal-rate
            # trade, only meaningful under the bitrate search where the
            # A/B in _plan_frame can verify the shaped plan actually wins
            offsets = None
        sfs, qbands = self._quantize(X, base_sf, offsets)
        books = []
        spec_bits = 0
        for b in range(self.num_swb):
            if sfs[b] < 0:
                books.append(0)
                continue
            book, bits = _pick_book(qbands[b])
            books.append(book)
            spec_bits += bits
        # scalefactor dpcm bits + section runs (9 bits per run)
        coded = [b for b in range(self.num_swb) if books[b] != 0]
        sf_bits = 0
        prev = int(sfs[coded[0]]) if coded else 100
        first = True
        for b in coded:
            if first:
                first = False
                continue
            sf_bits += _SF_ENC[int(sfs[b]) - prev + 60][1]
            prev = int(sfs[b])
        runs = 1 + sum(1 for i in range(1, self.num_swb)
                       if books[i] != books[i - 1])
        est = spec_bits + sf_bits + 9 * runs + 24  # +gain/flags/tag slack
        return sfs, qbands, books, est

    def _write_ics_body(self, w: BitWriter, sfs, qbands, books, max_sfb):
        coded = [b for b in range(max_sfb) if books[b] != 0]
        global_gain = int(sfs[coded[0]]) if coded else 100
        w.u(global_gain, 8)
        return global_gain

    def _write_ics_rest(self, w: BitWriter, sfs, qbands, books, max_sfb,
                        global_gain):
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

    def _write_ics(self, w: BitWriter, plan, write_info: bool):
        sfs, qbands, books, _est = plan
        # trim trailing zero bands
        max_sfb = self.num_swb
        while max_sfb > 0 and books[max_sfb - 1] == 0:
            max_sfb -= 1
        gg = self._write_ics_body(w, sfs, qbands, books, max_sfb)
        if write_info:
            self._write_ics_info(w, max_sfb)
        self._write_ics_rest(w, sfs, qbands, books, max_sfb, gg)

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
        plans = self._plan_frame(Xall, attack=self._is_attack(span))
        w = BitWriter()
        if self.channels == 1:
            w.u(0, 3)   # SCE
            w.u(0, 4)
            self._write_ics(w, plans[0], write_info=True)
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
                self._write_ics_common(w, plans[ch])
        w.u(7, 3)   # END
        w.align_zero()
        self.last_frame_bits = len(w.buf) * 8
        if self.bitrate:
            nominal = self.bitrate * N / self.sample_rate
            self._rc_reservoir = float(np.clip(
                self._rc_reservoir + nominal - self.last_frame_bits,
                -4.0 * nominal, 4.0 * nominal))
        return bytes(w.buf)

    # rate loop convergence band and iteration bound.  Bit cost moves
    # ~0.375 bits per coded coefficient per sf step, so the proportional
    # update below usually lands within RC_TOL in 1-2 iterations once
    # warm-started (steady content keeps the previous granule's base).
    RC_TOL = 0.08
    RC_ITERS = 8

    def _plan_frame(self, Xall: np.ndarray, attack: bool = False):
        """Per-channel plans.  Under ``bitrate``, searches the shared
        global step so the frame's estimated bits hit the per-granule
        target — ONCE for the flat anchor and (non-attack frames) once for
        the shaped allocation, then keeps whichever plan wins the band-SNR
        objective.  The A/B makes allocation measured-never-worse: shaped
        plans only ship on frames where shaping beats flat at the same
        rate (tonal frames with spectral dynamic range); bit-starved dense
        frames keep flat, which is waveform-optimal there."""
        chans = range(self.channels)
        if not self.bitrate:
            return [self._plan_channel(Xall[:, ch], attack=attack)
                    for ch in chans]
        flat = self._rate_search(Xall, [None] * self.channels, "flat")
        if not self.band_alloc or attack:
            return flat
        ch_offsets = []
        for ch in chans:
            off = None
            peak_ch = float(np.max(np.abs(Xall[:, ch])))
            if peak_ch > 1e-9:
                off = self._alloc_offsets(np.abs(Xall[:, ch]), peak_ch)
            ch_offsets.append(off)
        if all(off is None for off in ch_offsets):
            return flat
        shaped = self._rate_search(Xall, ch_offsets, "alloc")
        if self._band_snr_objective(Xall, shaped) > self._band_snr_objective(
                Xall, flat):
            return shaped
        return flat

    def _rate_search(self, Xall: np.ndarray, ch_offsets, warm_key: str):
        """Global-step search to the per-granule bit target for one fixed
        set of allocation offsets; warm-started per offsets-kind."""
        chans = range(self.channels)
        nominal = self.bitrate * N / self.sample_rate - 16  # header/END slack
        # reservoir steering: owed bits pull this granule's target, bounded
        # to [0.5x, 2x] nominal so one granule never absorbs the whole debt
        target = float(np.clip(nominal + 0.5 * self._rc_reservoir,
                               0.5 * nominal, 2.0 * nominal))
        base = self._rc_bases.get(warm_key)
        if base is None:
            peak = max(float(np.max(np.abs(Xall))), 1e-9)
            base = self._base_from_quality(peak)
        best = None
        for _ in range(self.RC_ITERS):
            plans = [self._plan_channel(Xall[:, ch], base, ch_offsets[ch])
                     for ch in chans]
            cost = sum(p[3] for p in plans)
            if best is None or abs(cost - target) < abs(best[1] - target):
                best = (plans, cost, base)
            ratio = cost / max(target, 1.0)
            if (1 - self.RC_TOL) <= ratio <= (1 + self.RC_TOL):
                break
            if cost < 64 and ratio < 1:
                break  # silence floor: nothing left to spend bits on
            # ~8 sf steps halve/double the spectral bits at these densities
            delta = int(round(8.0 * np.log2(ratio)))
            if delta == 0:
                delta = 1 if ratio > 1 else -1
            nxt = int(np.clip(base + delta, 0, 255))
            if nxt == base:
                break
            base = nxt
        plans, _cost, base = best
        self._rc_bases[warm_key] = base
        return plans

    def _band_snr_objective(self, Xall: np.ndarray, plans) -> float:
        """Mean band SNR (dB) over signal-bearing bands of a plan — the
        exact reconstruction error of the quantized values, not a model."""
        vals = []
        for ch, plan in enumerate(plans):
            sfs, qbands, _books, _est = plan
            X = Xall[:, ch]
            sig_b = []
            err_b = []
            for b in range(self.num_swb):
                xb = X[self.swb[b]:self.swb[b + 1]]
                sig = float(np.sum(xb * xb))
                if sfs[b] < 0:
                    err = sig
                else:
                    scale = 2.0 ** (0.25 * (int(sfs[b]) - 100))
                    q = qbands[b].astype(np.float64)
                    xh = np.sign(q) * np.abs(q) ** (4.0 / 3.0) * scale
                    err = float(np.sum((xb - xh) ** 2))
                sig_b.append(sig)
                err_b.append(err)
            floor = max(sig_b) * 1e-7 if sig_b else 0.0
            for sig, err in zip(sig_b, err_b):
                if sig > floor:
                    vals.append(10.0 * np.log10(sig / max(err, 1e-12)))
        return float(np.mean(vals)) if vals else 0.0

    def _write_ics_common(self, w: BitWriter, plan):
        """ICS body when ics_info was written at the CPE level: max_sfb is
        fixed to num_swb, so zero bands are coded as ZERO sections."""
        sfs, qbands, books, _est = plan
        gg = self._write_ics_body(w, sfs, qbands, books, self.num_swb)
        self._write_ics_rest(w, sfs, qbands, books, self.num_swb, gg)
