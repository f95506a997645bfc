#!/usr/bin/env python
"""Clean-room recovery of the AAC-LC constant tables via a decode oracle.

The pure tier needs the MPEG-4 AAC tables (scalefactor-band offsets, the
scalefactor Huffman codebook, the 11 spectral Huffman codebooks).  This
image carries them only inside the libavcodec binary, so this tool
re-derives them *behaviorally*: it crafts syntactically minimal AAC-LC
raw_data_blocks bit by bit (BitWriter), feeds them to libavcodec opened in
strict mode (any bitstream error fails the decode — avshim_adec_open2),
and reads values back out of the decoded PCM through an exact forward MDCT
(the AAC filterbank is an orthogonal lapped transform, so analysis of the
synthesized stream returns each frame's spectral coefficients to float
precision; verified leak < 1e-7).

Recovery strategies:
  * swb offsets — perceptual-noise-substitution (PNS) fills exactly one
    scalefactor band with noise; the nonzero MDCT bins delimit the band.
  * scalefactor codebook — two-noise-band frames: the first noise energy
    is a 9-bit PCM field, the second is sf-Huffman-coded; decoded band
    energy reveals the index, prefix-free BFS over candidate bitstrings
    enumerates the complete code (codeword = candidate that parses;
    internal node = candidate that does not; Huffman completeness bounds
    the frontier at ~2x the codebook size per depth).
  * spectral codebooks — one coded band at known scalefactor; decoded
    coefficients come back through the MDCT as sign*|q|^(4/3)*2^((sf-100)/4)
    on an exact lattice, so each parsed candidate reveals its quantized
    tuple; same BFS, anchored on the zero-tuple codeword for 2-dim books.

No table values are copied from any source; everything is measured from
the oracle's observable behavior and then pinned by differential tests
(tests/test_aacdec.py) against the same oracle.

Usage: python tools/extract_aac_tables.py [stage]
  stages: offsets, sf, spectral, all (default), emit
State checkpoints in /tmp/aac_extract_state.json; `emit` writes
mixlab_tpu/av/aac_tables.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from mixlab_tpu.av.aac import (  # noqa: E402
    AudioObjectType,
    AudioSpecificConfiguration,
    adts_frame,
)
from mixlab_tpu.av.h264enc import BitWriter  # noqa: E402
from mixlab_tpu.native import avshim  # noqa: E402

STATE_PATH = "/tmp/aac_extract_state.json"
N = 1024


def asc_for(sfi: int) -> AudioSpecificConfiguration:
    return AudioSpecificConfiguration(
        object_type=AudioObjectType.LOW_COMPLEXITY,
        sampling_frequency_index=sfi,
        channel_configuration=1,
    )


# ---------------------------------------------------------------------------
# frame crafting
# ---------------------------------------------------------------------------


def craft_sce(gg, max_sfb, sections, sf_bits=(), spec_bits=()):
    """One-SCE raw_data_block, long windows, sine shape.

    sections: [(codebook, run_length_in_sfbs)]; sf_bits/spec_bits: iterables
    of (value, n_bits) appended verbatim in field order."""
    w = BitWriter()
    w.u(0, 3)      # id_syn_ele SCE
    w.u(0, 4)      # element_instance_tag
    w.u(gg, 8)     # global_gain
    w.u(0, 1)      # ics_reserved_bit
    w.u(0, 2)      # window_sequence = ONLY_LONG_SEQUENCE
    w.u(0, 1)      # window_shape = sine
    w.u(max_sfb, 6)
    w.u(0, 1)      # predictor_data_present (LC: none)
    for cb, ln in sections:
        w.u(cb, 4)
        n = ln
        while n >= 31:
            w.u(31, 5)
            n -= 31
        w.u(n, 5)
    for v, n in sf_bits:
        w.u(v, n)
    w.u(0, 1)      # pulse_data_present
    w.u(0, 1)      # tns_data_present
    w.u(0, 1)      # gain_control_data_present
    for v, n in spec_bits:
        w.u(v, n)
    w.u(7, 3)      # id_syn_ele END
    w.align_zero()
    return bytes(w.buf)


PROBES = {"n": 0, "t0": time.time()}


def probe(payload, sfi=4, nframes=1):
    """Strict decode; returns list of mono float frames or None."""
    PROBES["n"] += 1
    dec = avshim.AudioDecoder("aac", strict=True)
    frame = adts_frame(payload, asc_for(sfi))
    outs = []
    try:
        for _ in range(nframes):
            outs += dec.decode_flt(frame)
    except avshim.ShimError:
        return None
    finally:
        dec.close()
    if len(outs) < nframes:
        return None
    return [o[1][:, 0].astype(np.float64) for o in outs]


# ---------------------------------------------------------------------------
# exact forward MDCT (orthogonal sine-window lapped analysis)
# ---------------------------------------------------------------------------

_MDCT = None


def mdct_matrix():
    global _MDCT
    if _MDCT is None:
        n = np.arange(2 * N)
        w = np.sin(np.pi / (2 * N) * (n + 0.5))
        k = np.arange(N)[:, None]
        C = np.cos(2 * np.pi / (2 * N) * (n[None, :] + 0.5 + N / 2) * (k + 0.5))
        _MDCT = C * w[None, :]
    return _MDCT


def analyze(frames, idx=2):
    span = np.concatenate([frames[idx], frames[idx + 1]])
    return mdct_matrix() @ span


# ---------------------------------------------------------------------------
# stage 1: swb offsets per sampling-frequency index (long windows)
# ---------------------------------------------------------------------------


def stage_offsets(state):
    offsets = state.setdefault("swb_long", {})
    for sfi in range(12):
        key = str(sfi)
        if key in offsets:
            continue
        # find num_swb: largest max_sfb the decoder accepts with all-zero
        # sections (strict mode errors on max_sfb > num_swb)
        num = 0
        for m in range(1, 64):
            if probe(craft_sce(100, m, [(0, m)]), sfi=sfi) is not None:
                num = m
            else:
                break
        if num == 0:
            print(f"sfi {sfi}: rejected entirely, skipping")
            offsets[key] = None
            continue
        offs = [0]
        for b in range(num):
            secs = ([(0, b)] if b else []) + [(13, 1)]
            r = probe(craft_sce(120, b + 1, secs, sf_bits=[(280, 9)]),
                      sfi=sfi, nframes=4)
            assert r is not None, (sfi, b)
            X = analyze(r)
            mag = np.abs(X)
            nz = np.where(mag > mag.max() * 1e-3)[0]
            lo, hi = int(nz.min()), int(nz.max()) + 1
            assert lo == offs[-1], (sfi, b, lo, offs)
            offs.append(hi)
        offsets[key] = offs
        print(f"sfi {sfi}: num_swb={num} offsets={offs[:6]}...{offs[-3:]} "
              f"({PROBES['n']} probes)")
        save(state)
    return state


# ---------------------------------------------------------------------------
# stage 2: scalefactor Huffman codebook (121 entries, dpcm index 0..120)
# ---------------------------------------------------------------------------


def _sf_value_of(cand, sf0, pcm):
    """Three-noise-band frame: band0 energy = 9-bit pcm (known), band1 =
    candidate, band2 = the confirmed dpcm-0 codeword (must echo band1's
    energy).  Returns the candidate's dpcm index or None.

    The pcm operating point matters: index extremes (+/-60) push band
    energies across ~2^30, so callers try low AND high anchors — a
    candidate is a codeword if ANY operating point decodes consistently."""
    bits, ln = int(cand, 2), len(cand)
    z, zl = sf0
    p = craft_sce(140, 3, [(13, 3)],
                  sf_bits=[(pcm, 9), (bits, ln), (z, zl)])
    r = probe(p, nframes=4)
    if r is None:
        return None
    X = analyze(r)
    a0 = np.sqrt(np.mean(X[0:4] ** 2))
    a1 = np.sqrt(np.mean(X[4:8] ** 2))
    a2 = np.sqrt(np.mean(X[8:12] ** 2))
    if min(a0, a1, a2) <= 0:
        return None
    d1 = 4.0 * np.log2(a1 / a0)
    echo = 4.0 * np.log2(a2 / a1)
    if abs(echo) > 0.2 or abs(d1 - round(d1)) > 0.2:
        return None
    idx = round(d1) + 60
    return idx if 0 <= idx <= 120 else None


SF_PCM_OPS = (280, 214, 330)  # mid / low (for +60 deltas) / high (for -60)


def _bootstrap_sf0():
    """Find the dpcm-0 scalefactor codeword: the candidate that, doubled
    across two noise bands, leaves the band energy unchanged twice."""
    for ln in range(1, 5):
        for v in range(1 << ln):
            p = craft_sce(140, 3, [(13, 3)],
                          sf_bits=[(280, 9), (v, ln), (v, ln)])
            r = probe(p, nframes=4)
            if r is None:
                continue
            X = analyze(r)
            a0 = np.sqrt(np.mean(X[0:4] ** 2))
            a1 = np.sqrt(np.mean(X[4:8] ** 2))
            a2 = np.sqrt(np.mean(X[8:12] ** 2))
            if min(a0, a1, a2) <= 0:
                continue
            if (abs(np.log2(a1 / a0)) < 0.05 and
                    abs(np.log2(a2 / a1)) < 0.05):
                return (v, ln)
    raise RuntimeError("dpcm-0 sf codeword not found")


def stage_sf(state):
    if "sf_codebook" in state:
        return state
    sf0 = _bootstrap_sf0()
    print(f"sf bootstrap: dpcm-0 codeword = {format(sf0[0], f'0{sf0[1]}b')}")
    found = {}  # "bits string" -> index
    frontier = ["0", "1"]
    depth = 1
    while frontier and depth <= 21 and len(found) < 121:
        nxt = []
        for cand in frontier:
            idx = None
            for pcm in SF_PCM_OPS:
                idx = _sf_value_of(cand, sf0, pcm)
                if idx is not None:
                    break
            if idx is not None:
                found[cand] = idx
            else:
                nxt.extend((cand + "0", cand + "1"))
        frontier = nxt
        depth += 1
        print(f"sf depth {depth - 1}: {len(found)} found, frontier "
              f"{len(frontier)}, probes {PROBES['n']}")
    assert len(found) == 121, f"sf codebook incomplete: {len(found)}"
    idxs = sorted(found.values())
    assert idxs == list(range(121)), "sf indices not a permutation"
    state["sf_codebook"] = {k: v for k, v in sorted(found.items())}
    save(state)
    return state


# ---------------------------------------------------------------------------
# stage 3: spectral codebooks
# ---------------------------------------------------------------------------

BOOK_DIMS = {1: 4, 2: 4, 3: 4, 4: 4, 5: 2, 6: 2, 7: 2, 8: 2, 9: 2, 10: 2, 11: 2}
BOOK_SIGNED = {1: True, 2: True, 3: False, 4: False, 5: True, 6: True,
               7: False, 8: False, 9: False, 10: False, 11: False}


def sf0_code(state):
    """(bits, len) of the dpcm-0 scalefactor codeword (index 60)."""
    for k, v in state["sf_codebook"].items():
        if v == 60:
            return int(k, 2), len(k)
    raise RuntimeError("dpcm-0 sf codeword missing")


def _bits_of(s):
    return (int(s, 2) if s else 0, len(s))


def _coeffs_of(field_bits_str, book, state, gg=140, field2=None):
    """Decode one coded band (sfb0, 4 coeffs) with the candidate spectral
    field; returns (band0 coeffs[4], band1 coeffs[4] or None).

    With ``field2`` a second coded band of the same book follows —
    the boundary disambiguator: the raw_data_block tail is constant
    (000 + END), so a true field that happens to END in those bits
    parses "early" in a single-band probe; it cannot do so when the
    very next bits are another field whose decoded values we check."""
    z, zl = sf0_code(state)
    if field2 is None:
        p = craft_sce(gg, 1, [(book, 1)], sf_bits=[(z, zl)],
                      spec_bits=[_bits_of(field_bits_str)])
    else:
        p = craft_sce(gg, 2, [(book, 2)], sf_bits=[(z, zl), (z, zl)],
                      spec_bits=[_bits_of(field_bits_str),
                                 _bits_of(field2)])
    r = probe(p, nframes=4)
    if r is None:
        return None
    X = analyze(r)
    hi = 4 if field2 is None else 8
    # everything above the coded bands must be silent, else the parse slid
    if np.max(np.abs(X[hi:])) > 1e-6 * max(np.max(np.abs(X[:hi])), 1e-12):
        return None
    return (X[:4], X[4:8] if field2 is not None else None)


def _quantize_lattice(vals, g):
    """Measured coefficients -> integer quantized values via |q|^(4/3)*g."""
    out = []
    for v in vals:
        m = abs(v) / g
        q = round(m ** 0.75)
        if abs(m - (abs(q) ** (4.0 / 3.0))) > 0.02 * max(m, 1.0):
            return None
        out.append(int(np.sign(v)) * q if q else 0)
    return out


def _zero_field(book, state):
    """Shortest field decoding one all-zero band, verified by doubling
    (two coded bands both reading the candidate)."""
    dims = BOOK_DIMS[book]
    for ln in range(1, 14):
        for v in range(1 << ln):
            z = format(v, f"0{ln}b")
            field = z + z if dims == 2 else z
            c = _coeffs_of(field, book, state)
            if c is None or np.max(np.abs(c[0])) > 1e-9:
                continue
            c2 = _coeffs_of(field, book, state, field2=field)
            if c2 is not None and np.max(np.abs(c2[0])) < 1e-9 \
                    and np.max(np.abs(c2[1])) < 1e-9:
                return z
    raise RuntimeError(f"book {book}: zero field not found")


def stage_spectral(state):
    books = state.setdefault("spectral", {})
    gscale = state.get("gscale")
    for book in range(1, 12):
        key = str(book)
        if key in books:
            continue
        dims = BOOK_DIMS[book]
        n_entries = {1: 81, 2: 81, 3: 81, 4: 81, 5: 81, 6: 81,
                     7: 64, 8: 64, 9: 169, 10: 169, 11: 289}[book]
        z = _zero_field(book, state)
        anchor = z if dims == 2 else ""
        zfield = z + z if dims == 2 else z
        print(f"book {book}: zero codeword '{z}'")
        found = {z: [0, 0, 0, 0]}  # field bits (anchor excluded) -> coeffs
        cws = {z}  # bare codewords (sign/escape bits stripped)
        frontier = ["0", "1"]
        depth = 1
        max_depth = 40 if book == 11 else 24
        while frontier and depth <= max_depth and len(cws) < n_entries:
            nxt = []
            for cand in frontier:
                # anything extending a known codeword is a sign/escape
                # variant or invalid — no new table information
                if any(cand.startswith(k) for k in cws):
                    continue
                field = anchor + cand
                c = _coeffs_of(field, book, state)
                ok = False
                if c is not None:
                    # boundary verification: candidate followed by the
                    # known zero field must parse AND leave band1 zero
                    v = _coeffs_of(field, book, state, field2=zfield)
                    if (v is not None
                            # relative floor: float32 decoder noise leaks
                            # ~1e-9 absolute at large-coefficient frames
                            and np.max(np.abs(v[1]))
                            < 1e-6 * (np.max(np.abs(v[0])) + 1e-12)
                            and np.allclose(v[0], c[0], rtol=1e-4, atol=1e-9)):
                        ok = True
                if ok:
                    vals = c[0]
                    if gscale is None:
                        # book 1 first: values in {-1,0,1} -> scale = max
                        m = float(np.max(np.abs(vals)))
                        if m > 0:
                            gscale = m
                            state["gscale"] = gscale
                    q = (_quantize_lattice(vals, gscale)
                         if gscale else [0, 0, 0, 0])
                    if q is not None:
                        found[cand] = q
                        cws.add(_strip_cw(book, cand, q))
                        continue
                nxt.extend((cand + "0", cand + "1"))
            frontier = nxt
            depth += 1
            if depth % 4 == 0 or len(cws) >= n_entries:
                print(f"book {book} depth {depth - 1}: {len(cws)} codewords "
                      f"({len(found)} fields), frontier {len(nxt)}, "
                      f"probes {PROBES['n']}")
        books[key] = {"anchor": anchor, "zero": z, "fields": found}
        print(f"book {book}: {len(cws)} codewords from {len(found)} fields "
              f"({PROBES['n']} probes, {time.time() - PROBES['t0']:.0f}s)")
        save(state)
    return state


def _strip_cw(book, field, qvals):
    """Bare codeword = field minus trailing sign bits (unsigned books)
    and escape sequences (book 11); mirrors tools/emit_aac_tables.py."""
    if BOOK_SIGNED[book]:
        return field
    dims = BOOK_DIMS[book]
    vals = qvals[-dims:] if dims == 2 else qvals
    tail = 0
    if book == 11:
        for q in vals:
            if abs(q) >= 16:
                n = abs(q).bit_length() - 5
                tail += 2 * n + 5
    tail += sum(1 for q in vals if q != 0)
    return field[: len(field) - tail] if tail else field


# ---------------------------------------------------------------------------


def save(state):
    with open(STATE_PATH, "w") as f:
        json.dump(state, f)


def load():
    if os.path.exists(STATE_PATH):
        with open(STATE_PATH) as f:
            return json.load(f)
    return {}


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    if not avshim.available():
        print("avshim unavailable")
        return 1
    state = load()
    if stage in ("offsets", "all"):
        state = stage_offsets(state)
    if stage in ("sf", "all"):
        state = stage_sf(state)
    if stage in ("spectral", "all"):
        state = stage_spectral(state)
    if stage in ("short", "all"):
        for sfi in range(12):
            if str(sfi) in (state.get("swb_long") or {}) and                     state["swb_long"][str(sfi)]:
                state = stage_offsets_short(state, sfi)
    if stage in ("emit", "all"):
        from tools.emit_aac_tables import emit

        emit(state)
    print(f"total probes: {PROBES['n']} in {time.time() - PROBES['t0']:.0f}s")
    return 0





# ---------------------------------------------------------------------------
# stage 4: swb offsets for SHORT (128-sample) windows
#
# PNS band-painting does not transfer to the 8x128 filterbank, so short
# offsets use the spectral codebooks recovered in stage 3: a (1,0,0,0)
# book-1 quad placed as band b's first quad puts a tone at spectral bin
# swb_short[b] of every short window; the decoded tone frequency
# (j + 0.5) * rate / 256 reveals j.  The probe rides the LEFT channel of
# a CPE whose RIGHT channel is a long-window tone at a known bin — any
# misparse of the left ICS shifts the right one, so a verified right
# tone pins the left field's exact bit length (band width = 4 * quads
# per window).
# ---------------------------------------------------------------------------


def _cw_for(book, symbol, state):
    for field, q in state["spectral"][str(book)]["fields"].items():
        dims = BOOK_DIMS[book]
        vals = tuple(q[-dims:] if dims == 2 else q)
        if vals == tuple(symbol):
            return field  # book 1 is signed: field == codeword
    raise RuntimeError(f"book {book}: no codeword for {symbol}")


def _write_ics_long(w, sections, sf_bits, spec_bits):
    w.u(0, 1); w.u(0, 2); w.u(0, 1)  # reserved, ONLY_LONG, sine
    w.u(sections_max_sfb(sections), 6)
    w.u(0, 1)  # predictor
    for cb, ln in sections:
        w.u(cb, 4)
        n = ln
        while n >= 31:
            w.u(31, 5)
            n -= 31
        w.u(n, 5)
    for v, n in sf_bits:
        w.u(v, n)
    w.u(0, 1); w.u(0, 1); w.u(0, 1)
    for v, n in spec_bits:
        w.u(v, n)


def sections_max_sfb(sections):
    return sum(ln for _cb, ln in sections)


def _write_ics_short(w, sections, sf_bits, spec_bits):
    w.u(0, 1); w.u(2, 2); w.u(0, 1)  # reserved, EIGHT_SHORT, sine
    w.u(sections_max_sfb(sections), 4)
    w.u(0b1111111, 7)  # one group of 8 windows
    for cb, ln in sections:
        w.u(cb, 4)
        n = ln
        while n >= 7:
            w.u(7, 3)
            n -= 7
        w.u(n, 3)
    for v, n in sf_bits:
        w.u(v, n)
    w.u(0, 1); w.u(0, 1); w.u(0, 1)
    for v, n in spec_bits:
        w.u(v, n)


def _right_verifier_band(state, sfi):
    """(band index, start bin, quads) for the long-window verifier tone,
    sized from the stage-1 offsets (long sfb widths vary with the band)."""
    offs = state["swb_long"][str(sfi)]
    br = min(10, len(offs) - 2)
    width = offs[br + 1] - offs[br]
    assert width % 4 == 0
    return br, offs[br], width // 4


def craft_cpe_short_probe(state, sfi, b, quads_per_window):
    """CPE: left = short-window probe at band b (tone quad + zero quads);
    right = long verifier (single tone at a known band start)."""
    cw1000 = _cw_for(1, (1, 0, 0, 0), state)
    cw0 = state["spectral"]["1"]["zero"]
    z, zl = sf0_code(state)
    br, _jr, nqr = _right_verifier_band(state, sfi)
    tone = _bits_of(cw1000)
    zero = _bits_of(cw0)
    w = BitWriter()
    w.u(1, 3)   # id CPE
    w.u(0, 4)   # tag
    w.u(0, 1)   # common_window = 0
    # left ICS: per window, the band's first quad is the tone
    w.u(140, 8)
    secs = ([(0, b)] if b else []) + [(1, 1)]
    spec = ([tone] + [zero] * (quads_per_window - 1)) * 8
    _write_ics_short(w, secs, [(z, zl)], spec)
    # right ICS: long-window tone at a known band start
    w.u(140, 8)
    _write_ics_long(
        w, [(0, br), (1, 1)], [(z, zl)],
        [tone] + [zero] * (nqr - 1),
    )
    w.u(7, 3)
    w.align_zero()
    return bytes(w.buf)


_SHORT_REFS = None


def _short_refs():
    """Steady output frames for a unit coefficient at each short-window
    bin, synthesized with the decoder's own filterbank (aacdec).  A wrong
    filterbank would correlate with nothing — asserted by callers."""
    global _SHORT_REFS
    if _SHORT_REFS is None:
        from mixlab_tpu.av.aacdec import _Filterbank

        refs = np.empty((128, 1024))
        for j in range(128):
            fb = _Filterbank()
            coeffs = np.zeros(1024)
            coeffs[np.arange(8) * 128 + j] = 1.0
            fb.process(coeffs, 2, 0)
            out = fb.process(coeffs, 2, 0)
            refs[j] = out / np.linalg.norm(out)
        _SHORT_REFS = refs
    return _SHORT_REFS


def _short_bin_of(x):
    """Matched-filter bin detection on one steady output frame."""
    o = x[-1024:]
    n = np.linalg.norm(o)
    if n <= 0:
        return None, 0.0
    corr = np.abs(_short_refs() @ (o / n))
    j = int(np.argmax(corr))
    return j, float(corr[j])


def _adts_stereo(payload, sfi=4):
    asc = AudioSpecificConfiguration(
        object_type=AudioObjectType.LOW_COMPLEXITY,
        sampling_frequency_index=sfi,
        channel_configuration=2,
    )
    return adts_frame(payload, asc)


def _probe_cpe(payload, sfi=4, nframes=6):
    PROBES["n"] += 1
    dec = avshim.AudioDecoder("aac", strict=True)
    frame = _adts_stereo(payload, sfi)
    outs = []
    try:
        for _ in range(nframes):
            outs += dec.decode_flt(frame)
    except avshim.ShimError:
        return None
    finally:
        dec.close()
    if len(outs) < nframes:
        return None
    return [o[1] for o in outs]  # [1024, 2] each


def _tone_bin(x, n_fft, n_bins):
    """Dominant spectral bin of a steady tone, on the n_bins grid."""
    spec = np.abs(np.fft.rfft(x[-n_fft:] * np.hanning(n_fft)))
    peak = np.argmax(spec[1:]) + 1
    f = peak / n_fft  # cycles/sample
    return f * 2 * n_bins - 0.5  # (j+0.5)/(2*n_bins) = f


def stage_offsets_short(state, sfi=4):
    key = str(sfi)
    shorts = state.setdefault("swb_short", {})
    if key in shorts:
        return state
    # num_swb: largest max_sfb accepted with all-zero short sections
    from mixlab_tpu.av.h264enc import BitWriter

    def zero_probe(m):
        w = BitWriter()
        w.u(1, 3); w.u(0, 4); w.u(0, 1)
        w.u(140, 8)
        _write_ics_short(w, [(0, m)], [], [])
        w.u(140, 8)
        _write_ics_long(w, [(0, 1)], [], [])
        w.u(7, 3)
        w.align_zero()
        return _probe_cpe(bytes(w.buf), sfi, nframes=1)

    num = 0
    for m in range(1, 16):
        if zero_probe(m) is not None:
            num = m
        else:
            break
    assert num > 0
    offs = [0]
    for b in range(num):
        got = None
        for nq in range(1, 20):
            r = _probe_cpe(craft_cpe_short_probe(state, sfi, b, nq), sfi)
            if r is None:
                continue
            # verify the right-channel long tone at its known bin
            _br, jr_expect, _nqr = _right_verifier_band(state, sfi)
            jr = _tone_bin(np.concatenate([f[:, 1] for f in r[2:]]), 4096, 1024)
            if abs(jr - jr_expect) > 0.75:
                continue
            jl, corr = _short_bin_of(np.concatenate([f[:, 0] for f in r[2:]]))
            got = (nq, jl, corr)
            break
        assert got is not None, (sfi, b, "no quad count parsed")
        nq, j, corr = got
        assert corr > 0.9, (b, j, corr)
        assert j == offs[-1], (b, j, offs)
        offs.append(offs[-1] + 4 * nq)
        print(f"short sfi {sfi} band {b}: start {j} width {4 * nq}")
    assert offs[-1] == 128, offs
    shorts[key] = offs
    save(state)
    print(f"short sfi {sfi}: {num} bands, offsets {offs}")
    return state

if __name__ == "__main__":
    raise SystemExit(main())
