"""Full-intra H.264 decoder surface (av/h264dec.py) vs libavcodec.

The scalar decoder claims the COMPLETE baseline-intra toolset: I_4x4 (all
nine prediction modes), Intra_16x16 V/H/DC/Plane, chroma DC/H/V/Plane,
chained ``mb_qp_delta``, I_PCM, and the §8.7 in-loop deblocking filter.
This suite validates that claim differentially: x264 (via the libavcodec
shim) encodes real baseline intra streams across QP sweeps, deblock
on/off, and adaptive-quant per-MB deltas, and every decoded plane must be
BIT-EXACT against libavcodec's own decode (the conformance reference the
reference project uses everywhere: rtmp/mod.rs:260-338).

Also covers: the typed fast->scalar fallback (H264Unsupported), CAVLC
bounds (corrupt total/total_zeros/run_before raise typed errors, never
crash), byte-mutation fuzz over the full-intra surface, and hand-built
I_PCM + mb_qp_delta chaining streams.
"""

import numpy as np
import pytest

from mixlab_tpu.av.h264cavlc import write_cavlc_block
from mixlab_tpu.av.h264dec import (
    BitReader,
    H264DecodeError,
    H264Unsupported,
    PureH264Decoder,
    read_cavlc_block,
    split_annexb,
)
from mixlab_tpu.av.h264dec import _Pps, _SpsExt
from mixlab_tpu.av.h264dec import _SliceDecoder as ScalarSliceDecoder
from mixlab_tpu.av.h264dec_fast import FastSliceDecoder
from mixlab_tpu.av.h264enc import BitWriter, _slice_header, make_pps, make_sps, nal

pytestmark = pytest.mark.filterwarnings("ignore")


def _shim():
    from mixlab_tpu.native import avshim

    if not avshim.available():
        pytest.skip("libavcodec shim unavailable")
    return avshim


def _content(kind: str, w: int, h: int, seed: int = 0):
    """Plane sets that force different intra mode choices out of x264."""
    rng = np.random.default_rng(seed)
    if kind == "gradient":  # smooth -> plane/directional 16x16 + chroma plane
        y = (np.add.outer(np.arange(h), np.arange(w)) * 2 % 256).astype(np.uint8)
        u = (np.add.outer(np.arange(h // 2), np.arange(w // 2)) * 5 % 256).astype(
            np.uint8
        )
        v = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    elif kind == "noise":  # max entropy -> I_4x4 with varied modes
        y = rng.integers(0, 256, (h, w), dtype=np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    elif kind == "edges":  # hard edges -> directional I_4x4 modes (V/H/diag)
        y = np.zeros((h, w), np.uint8)
        y[:, :: max(4, w // 16)] = 255
        y[:: max(4, h // 16), :] = 200
        y[h // 3 :, w // 3 :] = 90
        u = np.full((h // 2, w // 2), 64, np.uint8)
        u[:, : w // 4] = 192
        v = np.full((h // 2, w // 2), 160, np.uint8)
        v[: h // 4, :] = 30
    else:
        raise ValueError(kind)
    return y, u, v


def _x264_stream(w, h, opts, frames):
    """Encode frames with x264 via the shim -> (annexb extradata, packets)."""
    avshim = _shim()
    enc = avshim.VideoEncoder(w, h, fps=10, opts=opts)
    for i, (y, u, v) in enumerate(frames):
        enc.send(y, u, v, i)
    enc.flush()
    pk = enc.receive()
    ed = enc.extradata()
    enc.close()
    assert pk, "x264 emitted no packets"
    return ed, pk


def _assert_bitexact_vs_libav(ed, pk, label=""):
    """Decode all packets with both decoders (accumulating: libavcodec may
    buffer a frame of latency), then compare positionally."""
    avshim = _shim()
    dec = PureH264Decoder()
    dec.decode_annexb(ed)
    ref = avshim.VideoDecoder("h264")
    ours, theirs = [], []
    for pts, _dts, _key, data in pk:
        ours.extend(dec.decode_annexb(data))
        theirs.extend(ref.decode(ed + data, pts))
    theirs.extend(ref.flush())
    ref.close()
    assert len(ours) == len(theirs) == len(pk)
    for i, ((_, y1, u1, v1), (_, y2, u2, v2)) in enumerate(zip(ours, theirs)):
        assert np.array_equal(y1, y2), f"{label}: Y differs (frame {i})"
        assert np.array_equal(u1, u2), f"{label}: U differs (frame {i})"
        assert np.array_equal(v1, v2), f"{label}: V differs (frame {i})"
    return len(ours)


# ---------------------------------------------------------------------------
# differential: QP sweep x deblock on/off x content class
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("qp", [4, 8, 17, 24, 32, 44])
@pytest.mark.parametrize("deblock", [True, False])
def test_qp_sweep_bitexact(qp, deblock):
    """Noise content (forces I_4x4), every QP class, deblock on and off,
    through the default (native C++) tier.

    QP 17 specifically pins the _TC0 table edge (indexA 17 is the first
    non-zero tc0 row in Table 8-17)."""
    w, h = 64, 48
    x264 = "" if deblock else ",x264-params=no-deblock=1"
    ed, pk = _x264_stream(
        w, h, f"preset=veryfast,profile=baseline,g=1,qp={qp},threads=1{x264}",
        [_content("noise", w, h, seed=qp)],
    )
    _assert_bitexact_vs_libav(ed, pk, f"qp={qp} deblock={deblock}")


@pytest.mark.parametrize("tier_env", [
    {},                                   # native C++ full decoder
    {"MIXLAB_PURE_H264_PYFULL": "1"},     # fast -> scalar fallback path
    {"MIXLAB_PURE_H264_SCALAR": "1"},     # scalar oracle directly
])
def test_all_tiers_bitexact_vs_libav(tier_env, monkeypatch):
    """Every decode tier produces identical, libavcodec-exact planes on a
    full-intra stream (deblocking + I_4x4 + aq deltas)."""
    for k, v in tier_env.items():
        monkeypatch.setenv(k, v)
    w, h = 64, 48
    ed, pk = _x264_stream(
        w, h,
        "preset=veryfast,profile=baseline,g=1,crf=28,threads=1,"
        "x264-params=aq-mode=2",
        [_content("noise", w, h, seed=42)],
    )
    _assert_bitexact_vs_libav(ed, pk, f"tier={tier_env}")


@pytest.mark.parametrize("kind", ["gradient", "edges"])
@pytest.mark.parametrize("size", [(48, 32), (96, 80), (112, 64)])
def test_content_classes_bitexact(kind, size):
    """Smooth/edge content drives Intra_16x16 V/H/Plane, chroma plane, and
    the directional I_4x4 modes."""
    w, h = size
    ed, pk = _x264_stream(
        w, h, "preset=veryfast,profile=baseline,g=1,qp=20,threads=1",
        [_content(kind, w, h, seed=sum(size))],
    )
    _assert_bitexact_vs_libav(ed, pk, f"{kind} {size}")


def test_adaptive_quant_mb_qp_deltas():
    """CRF + aq-mode=2 makes x264 emit per-MB mb_qp_delta chains."""
    w, h = 96, 64
    ed, pk = _x264_stream(
        w, h,
        "preset=veryfast,profile=baseline,g=1,crf=30,threads=1,"
        "x264-params=aq-mode=2",
        [_content("noise", w, h, seed=7)],
    )
    _assert_bitexact_vs_libav(ed, pk, "aq-mode=2")


def test_slow_preset_multiframe():
    """preset=slow (trellis, chroma_qp_offset=-2) across several frames."""
    w, h = 64, 64
    frames = [_content("noise", w, h, seed=i) for i in range(3)]
    ed, pk = _x264_stream(
        w, h, "preset=slow,profile=baseline,g=1,crf=18,threads=1", frames
    )
    n = _assert_bitexact_vs_libav(ed, pk, "slow multiframe")
    assert n == 3


# ---------------------------------------------------------------------------
# typed fast->scalar fallback
# ---------------------------------------------------------------------------


def _first_slice(ed, data):
    sps = pps = None
    for unit in split_annexb(ed + data):
        t = unit[0] & 0x1F
        if t == 7:
            sps = _SpsExt(unit[1:])
        elif t == 8:
            pps = _Pps(unit[1:])
        elif t in (1, 5):
            return sps, pps, unit[1:], t
    raise AssertionError("no slice found")


def test_fast_decoder_raises_typed_unsupported_on_full_intra(monkeypatch):
    """x264 full-intra streams must raise H264Unsupported from the fast
    tier (NOT a generic error, NOT silent mis-decode), and with the native
    tier disabled the fast->scalar fallback must produce output identical
    to forcing the scalar path."""
    w, h = 64, 48
    ed, pk = _x264_stream(
        w, h, "preset=veryfast,profile=baseline,g=1,qp=20,threads=1",
        [_content("noise", w, h, seed=3)],
    )
    sps, pps, rbsp, t = _first_slice(ed, pk[0][3])
    with pytest.raises(H264Unsupported):
        FastSliceDecoder(sps, pps).decode_slice(BitReader(rbsp), t)

    # fast-with-fallback (native tier off) == scalar-only decode
    monkeypatch.setenv("MIXLAB_PURE_H264_PYFULL", "1")
    dec = PureH264Decoder()
    dec.decode_annexb(ed)
    via_fallback = dec.decode_annexb(pk[0][3])
    monkeypatch.setenv("MIXLAB_PURE_H264_SCALAR", "1")
    dec2 = PureH264Decoder()
    dec2.decode_annexb(ed)
    via_scalar = dec2.decode_annexb(pk[0][3])
    assert len(via_fallback) == len(via_scalar) == 1
    for (_, *a), (_, *b) in zip(via_fallback, via_scalar):
        for pa, pb in zip(a, b):
            assert np.array_equal(pa, pb)


def test_native_full_decoder_throughput_floor():
    """The native tier must sustain the RTMP ingest rate at monitor size
    (>= 30 fps at 560x352; the scalar tier measured ~1 fps — this pins the
    fix for that floor, with slack for CI noise)."""
    import time

    from mixlab_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    w, h = 560, 352
    frames = [_content("noise", w, h, seed=i) for i in range(4)]
    ed, pk = _x264_stream(
        w, h, "preset=veryfast,profile=baseline,g=1,crf=30,threads=1",
        frames,
    )
    dec = PureH264Decoder()
    dec.decode_annexb(ed)
    t0 = time.perf_counter()
    n = 0
    for _pts, _dts, _key, data in pk:
        n += len(dec.decode_annexb(data))
    fps = n / (time.perf_counter() - t0)
    assert n == len(pk)
    assert fps >= 30, f"native full-intra tier too slow: {fps:.1f} fps"


def test_fast_decoder_rejects_implicit_deblocking():
    """PPS without deblocking_filter_control_present_flag means the filter
    is implicitly ON (idc defaults 0): the fast tier must route to scalar
    rather than silently skip filtering."""

    # PPS identical to make_pps() but with the control flag OFF
    w = BitWriter()
    w.ue(0); w.ue(0)
    w.u(0, 1); w.u(0, 1)
    w.ue(0); w.ue(0); w.ue(0)
    w.u(0, 1); w.u(0, 2)
    w.se(0); w.se(0); w.se(0)
    w.u(0, 1)  # deblocking_filter_control_present_flag = 0
    w.u(0, 1); w.u(0, 1)
    w.rbsp_trailing()
    pps = _Pps(w.getvalue())
    assert not pps.deblocking_control

    sps = _SpsExt(make_sps(32, 32))
    sl = BitWriter()
    # slice header WITHOUT the deblocking idc field (control flag is 0)
    sl.ue(0)   # first_mb
    sl.ue(7)   # I slice
    sl.ue(0)   # pps id
    sl.u(0, 4)  # frame_num
    sl.ue(0)   # idr_pic_id
    sl.u(0, 1); sl.u(0, 1)
    sl.se(0)   # slice_qp_delta
    sl.ue(25)  # any MB content; rejection must happen at the header
    sl.rbsp_trailing()
    with pytest.raises(H264Unsupported):
        FastSliceDecoder(sps, pps).decode_slice(BitReader(sl.getvalue()), 5)


def test_fast_decoder_rejects_first_mb_nonzero():
    sps = _SpsExt(make_sps(32, 32))
    pps = _Pps(make_pps())
    w = BitWriter()
    w.ue(2)  # first_mb_in_slice != 0
    w.ue(7)
    w.rbsp_trailing()
    with pytest.raises(H264Unsupported):
        FastSliceDecoder(sps, pps).decode_slice(BitReader(w.getvalue()), 5)


# ---------------------------------------------------------------------------
# CAVLC bounds: corrupt streams raise typed errors with exact messages
# ---------------------------------------------------------------------------


def _bits_to_reader(bits: str) -> BitReader:
    bits = bits + "1" + "0" * ((-len(bits) - 1) % 8)
    data = int(bits, 2).to_bytes(len(bits) // 8, "big")
    return BitReader(data)


def test_total_exceeds_block_size_raises():
    """coeff_token with TotalCoeff 16 fed to a 15-coeff AC block must raise
    the typed bounds error, not scatter out of range."""
    from mixlab_tpu.av.h264cavlc import COEFF_TOKEN_BITS, COEFF_TOKEN_LEN

    # class 3 is a 6-bit FLC: find the code for total=16, t1s=0
    idx = 4 * 16 + 0
    ln, bits = COEFF_TOKEN_LEN[3][idx], COEFF_TOKEN_BITS[3][idx]
    assert ln > 0
    r = _bits_to_reader(format(bits, f"0{ln}b") + "1" * 64)
    with pytest.raises(H264DecodeError, match="exceeds block size"):
        read_cavlc_block(r, 8, 15)


def test_total_zeros_overflow_raises():
    """total + total_zeros > max_coeff must raise, not write past the
    coefficient array (the exact crash of the round-3 fuzz regression)."""
    from mixlab_tpu.av.h264cavlc import (
        COEFF_TOKEN_BITS,
        COEFF_TOKEN_LEN,
        TOTAL_ZEROS_BITS,
        TOTAL_ZEROS_LEN,
    )

    # total=2, t1s=2 (two trailing ones) in class 0, then total_zeros=14
    idx = 4 * 2 + 2
    ln, bits = COEFF_TOKEN_LEN[0][idx], COEFF_TOKEN_BITS[0][idx]
    tz_ln, tz_bits = TOTAL_ZEROS_LEN[1][14], TOTAL_ZEROS_BITS[1][14]
    assert ln > 0 and tz_ln > 0
    stream = format(bits, f"0{ln}b") + "00" + format(tz_bits, f"0{tz_ln}b")
    r = _bits_to_reader(stream + "1" * 64)
    with pytest.raises(H264DecodeError, match="exceeds block size"):
        read_cavlc_block(r, 0, 15)


def test_run_before_overflow_raises():
    """run_before decoding past zeros_left must raise the typed error."""
    from mixlab_tpu.av.h264cavlc import (
        COEFF_TOKEN_BITS,
        COEFF_TOKEN_LEN,
        RUN_BITS,
        RUN_LEN,
        TOTAL_ZEROS_BITS,
        TOTAL_ZEROS_LEN,
    )

    # total=2 t1s=2, total_zeros=7 (zeros_left=7 -> run table 7 allows
    # codes up to 14), then run_before=14 > zeros_left
    idx = 4 * 2 + 2
    ln, bits = COEFF_TOKEN_LEN[0][idx], COEFF_TOKEN_BITS[0][idx]
    tz_ln, tz_bits = TOTAL_ZEROS_LEN[1][7], TOTAL_ZEROS_BITS[1][7]
    run_ln, run_bits = RUN_LEN[6][14], RUN_BITS[6][14]
    assert ln > 0 and tz_ln > 0 and run_ln > 0
    stream = (
        format(bits, f"0{ln}b") + "00"
        + format(tz_bits, f"0{tz_ln}b")
        + format(run_bits, f"0{run_ln}b")
    )
    r = _bits_to_reader(stream + "1" * 64)
    with pytest.raises(H264DecodeError, match="run_before"):
        read_cavlc_block(r, 0, 15)


def test_cavlc_decode_inverts_encode_property():
    """Random sparse blocks: decode(encode(x)) == x (round-trip oracle for
    the bounds-checked decoder)."""
    rng = np.random.default_rng(11)
    for _ in range(200):
        max_coeff = int(rng.choice([4, 15, 16]))
        nC = -1 if max_coeff == 4 else int(rng.integers(0, 17))
        coeffs = [0] * max_coeff
        for _ in range(int(rng.integers(0, max_coeff + 1))):
            coeffs[int(rng.integers(0, max_coeff))] = int(
                rng.integers(-30, 31)
            )
        w = BitWriter()
        write_cavlc_block(w, coeffs, nC, max_coeff)
        w.rbsp_trailing()
        out = read_cavlc_block(BitReader(w.getvalue()), nC, max_coeff)
        assert out == coeffs


# ---------------------------------------------------------------------------
# fuzz over the FULL-intra surface (I_4x4 + deblocking reachable)
# ---------------------------------------------------------------------------


def test_full_intra_fuzz_typed_errors():
    """Byte mutations of a real x264 full-intra stream must either decode
    or raise typed errors — never crash (IndexError et al.)."""
    from mixlab_tpu.av.h264dec import decode_annexb_frame
    from mixlab_tpu.av.sps import SpsError

    w, h = 48, 32
    ed, pk = _x264_stream(
        w, h, "preset=veryfast,profile=baseline,g=1,qp=20,threads=1",
        [_content("noise", w, h, seed=13)],
    )
    data = ed + pk[0][3]
    rng = np.random.default_rng(1)
    buf = bytearray(data)
    for _ in range(400):
        i = int(rng.integers(0, len(buf)))
        old = buf[i]
        buf[i] = int(rng.integers(0, 256))
        try:
            decode_annexb_frame(bytes(buf))
        except (H264DecodeError, SpsError, ValueError):
            pass
        buf[i] = old
    for cut in range(1, min(len(data), 200)):
        try:
            decode_annexb_frame(data[:-cut])
        except (H264DecodeError, SpsError, ValueError):
            pass


# ---------------------------------------------------------------------------
# I_PCM + mb_qp_delta chaining (hand-assembled, checked vs libavcodec)
# ---------------------------------------------------------------------------


def _ipcm_then_coded_stream(delta: int, seed: int = 0, slice_qp_delta: int = 0):
    """32x16 picture: MB0 = I_PCM (raw noise), MB1 = Intra_16x16 DC with
    luma DC coefficients and mb_qp_delta=``delta``.  I_PCM does NOT reset
    the qp chain (libavcodec-verified), so MB1's qp =
    (slice_qp + delta + 52) % 52 — slice_qp near 0/51 pins the wrap."""
    rng = np.random.default_rng(seed)
    pcm = rng.integers(0, 256, 384, dtype=np.uint8)
    w = BitWriter()
    _slice_header(w, qp_delta=slice_qp_delta, disable_deblocking=True)
    # MB0: I_PCM
    w.ue(25)
    w.align_zero()
    w.raw_bytes(bytes(pcm))
    # MB1: Intra_16x16, DC pred, cbp_luma=0, cbp_chroma=0 -> mb_type 3
    w.ue(3)
    w.ue(0)        # chroma DC pred
    w.se(delta)    # mb_qp_delta
    # luma DC block: nC = left neighbor nnz = 16 (I_PCM) -> class 3
    dc = [0] * 16
    dc[0], dc[1], dc[5] = 7, -3, 2
    write_cavlc_block(w, dc, 16, 16)
    w.rbsp_trailing()
    return (
        b"\x00\x00\x00\x01" + nal(7, make_sps(32, 16))
        + b"\x00\x00\x00\x01" + nal(8, make_pps())
        + b"\x00\x00\x00\x01" + nal(5, w.getvalue())
    ), pcm


@pytest.mark.parametrize("delta,slice_qp_delta", [
    (-3, 0),     # plain chain through I_PCM
    (5, 0),
    (-10, -24),  # slice qp 2, delta -10 -> (2-10+52)%52 = 44: wrap down
    (20, 24),    # slice qp 50, delta 20 -> 70%52 = 18: wrap up
])
def test_ipcm_qp_chain_fast_matches_scalar_and_libav(delta, slice_qp_delta):
    import os

    stream, pcm = _ipcm_then_coded_stream(
        delta, seed=delta & 0xFF, slice_qp_delta=slice_qp_delta)

    dec_fast = PureH264Decoder()
    fast = dec_fast.decode_annexb(stream)
    os.environ["MIXLAB_PURE_H264_SCALAR"] = "1"
    try:
        dec_sc = PureH264Decoder()
        scalar = dec_sc.decode_annexb(stream)
    finally:
        del os.environ["MIXLAB_PURE_H264_SCALAR"]
    assert len(fast) == len(scalar) == 1
    for a, b in zip(fast[0][1:], scalar[0][1:]):
        assert np.array_equal(a, b), "fast decode != scalar oracle"

    # I_PCM block is lossless
    y = fast[0][1]
    assert np.array_equal(y[:16, :16].ravel(), pcm[:256])

    # ground truth: libavcodec agrees on the qp chain
    from mixlab_tpu.native import avshim

    if avshim.available():
        ref = avshim.VideoDecoder("h264")
        theirs = ref.decode(stream, 0)
        assert len(theirs) == 1
        for a, b in zip(fast[0][1:], theirs[0][1:]):
            assert np.array_equal(a, b), "fast decode != libavcodec"
        ref.close()


def test_ipcm_qp_chain_python_parse_matches_native(monkeypatch):
    """The C++ parser twin must implement the same (prev+delta+52)%52 +
    I_PCM reset chaining as the Python parser."""
    from mixlab_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    stream, _ = _ipcm_then_coded_stream(-7, seed=5)
    dec_nat = PureH264Decoder()
    nat = dec_nat.decode_annexb(stream)
    monkeypatch.setenv("MIXLAB_PURE_H264_PYPARSE", "1")
    dec_py = PureH264Decoder()
    py = dec_py.decode_annexb(stream)
    for a, b in zip(nat[0][1:], py[0][1:]):
        assert np.array_equal(a, b)
