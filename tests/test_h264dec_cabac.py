"""CABAC intra H.264 entropy tier (av/h264cabac.py) vs libavcodec.

x264's DEFAULT entropy coder is CABAC; this suite validates the round-5
pure CABAC tier differentially the same way the CAVLC tier is validated
(tests/test_h264dec_intra_full.py): x264 (via the libavcodec shim)
encodes real main-profile intra streams across QP sweeps, content
classes, deblock on/off, adaptive-quant deltas, and odd crop sizes, and
every decoded plane must be BIT-EXACT against libavcodec's own decode —
the conformance reference the reference project uses everywhere
(/root/reference/src/rtmp/mod.rs:260-338).

I_PCM under CABAC (engine flush, byte realignment, mid-slice engine
re-initialization, neighbor-context bookkeeping) is pinned with
hand-assembled streams built by a minimal spec-9.3.4 arithmetic ENCODER
(test-only), with libavcodec decoding the hand-built bytes as ground
truth — x264 essentially never emits PCM at CABAC's compression rates.

Also covers: typed-error discipline under byte mutation and truncation
fuzz, the fast CAVLC tiers rejecting CABAC slices with H264Unsupported,
and the normative-table anchors that pin the table-extraction method
(tools/extract_cabac_tables.py) against the famous published values —
including the I-vs-PB column distinction that anchor scanning alone
cannot make (the round-5 root cause: all four init tables share the
ctx 0..10 prefix and the PB tables link first in this image's codecs).
"""

import numpy as np
import pytest

from mixlab_tpu.av.cabac_tables import INIT_I, LPS_RANGE, TRANS_LPS, TRANS_MPS
from mixlab_tpu.av.h264cabac import CabacSliceDecoder, _CabacEngine
from mixlab_tpu.av.h264dec import (
    BitReader,
    H264DecodeError,
    H264Unsupported,
    PureH264Decoder,
)
from mixlab_tpu.av.h264enc import BitWriter, make_sps, nal

pytestmark = pytest.mark.filterwarnings("ignore")


def _shim():
    from mixlab_tpu.native import avshim

    if not avshim.available():
        pytest.skip("libavcodec shim unavailable")
    return avshim


def _content(kind: str, w: int, h: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    if kind == "gradient":
        y = (np.add.outer(np.arange(h), np.arange(w)) * 2 % 256).astype(np.uint8)
        u = (np.add.outer(np.arange(h // 2), np.arange(w // 2)) * 5 % 256).astype(
            np.uint8
        )
        v = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    elif kind == "noise":
        y = rng.integers(0, 256, (h, w), dtype=np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    elif kind == "edges":
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


def _x264_cabac_stream(w, h, opts, frames):
    """profile=main -> entropy_coding_mode=1 (CABAC), no transform_8x8."""
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
# differential: QP sweep x content class, deblock on/off, aq, crops
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("qp", [4, 8, 17, 24, 32, 44])
def test_qp_sweep_bitexact(qp):
    """Noise content (forces I_4x4 + I16 mix), every QP class."""
    w, h = 64, 48
    ed, pk = _x264_cabac_stream(
        w, h, f"preset=veryfast,profile=main,g=1,qp={qp},threads=1",
        [_content("noise", w, h, seed=qp)],
    )
    _assert_bitexact_vs_libav(ed, pk, f"cabac qp={qp}")


@pytest.mark.parametrize("kind", ["gradient", "edges"])
@pytest.mark.parametrize("qp", [14, 30])
def test_content_classes_bitexact(kind, qp):
    """Smooth/edge content drives I16 plane modes + directional I_4x4."""
    w, h = 64, 48
    ed, pk = _x264_cabac_stream(
        w, h, f"preset=veryfast,profile=main,g=1,qp={qp},threads=1",
        [_content(kind, w, h, seed=qp)],
    )
    _assert_bitexact_vs_libav(ed, pk, f"cabac {kind} qp={qp}")


@pytest.mark.parametrize("tier_env", [
    {},                                   # native C++ CABAC twin
    {"MIXLAB_PURE_H264_SCALAR": "1"},     # Python scalar tier
])
def test_all_tiers_bitexact_vs_libav(tier_env, monkeypatch):
    """Native and Python CABAC tiers produce identical, libavcodec-exact
    planes on a mixed I16/I4 stream with aq deltas."""
    for k, v in tier_env.items():
        monkeypatch.setenv(k, v)
    w, h = 64, 48
    ed, pk = _x264_cabac_stream(
        w, h,
        "preset=veryfast,profile=main,g=1,crf=26,threads=1,"
        "x264-params=aq-mode=2",
        [_content("noise", w, h, seed=7)],
    )
    _assert_bitexact_vs_libav(ed, pk, f"tier={tier_env}")


def test_native_tier_actually_engaged():
    """The default path uses the C++ twin (guards against a silent
    permanent fallback to the 0.1 fps Python tier)."""
    from mixlab_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    from mixlab_tpu.av import h264cabac

    calls = []
    orig = h264cabac.NativeCabacSliceDecoder.decode_slice

    def spy(self, r, t):
        ok = orig(self, r, t)
        calls.append(ok)
        return ok

    h264cabac.NativeCabacSliceDecoder.decode_slice = spy
    try:
        ed, pk = _x264_cabac_stream(
            32, 32, "preset=veryfast,profile=main,g=1,qp=24,threads=1",
            [_content("noise", 32, 32, seed=3)],
        )
        dec = PureH264Decoder()
        dec.decode_annexb(ed)
        dec.decode_annexb(pk[0][3])
    finally:
        h264cabac.NativeCabacSliceDecoder.decode_slice = orig
    assert calls == [True]


def test_no_deblock_bitexact():
    ed, pk = _x264_cabac_stream(
        64, 48,
        "preset=veryfast,profile=main,g=1,qp=20,threads=1,"
        "x264-params=no-deblock=1",
        [_content("edges", 64, 48, seed=1)],
    )
    _assert_bitexact_vs_libav(ed, pk, "cabac no-deblock")


def test_adaptive_quant_bitexact():
    """aq-mode=2 emits per-MB mb_qp_delta chains (ctx 60..63 state)."""
    ed, pk = _x264_cabac_stream(
        64, 48,
        "preset=veryfast,profile=main,g=1,crf=28,threads=1,"
        "x264-params=aq-mode=2",
        [_content("noise", 64, 48, seed=42)],
    )
    _assert_bitexact_vs_libav(ed, pk, "cabac aq-mode=2")


@pytest.mark.parametrize("size", [(16, 16), (50, 34), (44, 36), (112, 80)])
def test_crop_sizes_bitexact(size):
    """Odd sizes exercise frame cropping + single-MB pictures."""
    w, h = size
    ed, pk = _x264_cabac_stream(
        w, h, "preset=veryfast,profile=main,g=1,qp=20,threads=1",
        [_content("edges", w, h, seed=sum(size))],
    )
    _assert_bitexact_vs_libav(ed, pk, f"cabac {size}")


def test_multiframe_bitexact():
    """Several IDR frames through one decoder: per-slice engine +
    context re-initialization."""
    w, h = 64, 48
    frames = [_content("noise", w, h, seed=i) for i in range(4)]
    ed, pk = _x264_cabac_stream(
        w, h, "preset=veryfast,profile=main,g=1,qp=24,threads=1", frames
    )
    n = _assert_bitexact_vs_libav(ed, pk, "cabac multiframe")
    assert n == 4


# ---------------------------------------------------------------------------
# normative-table anchors (pin the extraction against published values)
# ---------------------------------------------------------------------------


def test_table_anchors():
    # Table 9-12: mb_type SI/I prefix — published spec text values
    assert INIT_I[:6] == [(20, -15), (2, 54), (3, 74), (20, -15), (2, 54),
                          (3, 74)]
    # Table 9-23 significant_coeff_flag ctx 105.. — the I column, NOT the
    # cabac_init_idc-0 column ((-2,85)...) that anchor-order scanning
    # silently picked up in round 5 before the symbol-based fix
    assert INIT_I[105] == (-7, 93) and INIT_I[106] == (-11, 87)
    # Table 9-44 rangeTabLPS boundary rows
    assert LPS_RANGE[0] == [128, 176, 208, 240]
    assert LPS_RANGE[63] == [2, 2, 2, 2]
    # Table 9-45 transitions
    assert TRANS_LPS[0] == 0 and TRANS_LPS[63] == 63
    assert TRANS_MPS[62] == 62 and TRANS_MPS[63] == 63
    assert len(INIT_I) == 1024 and len(LPS_RANGE) == 64


# ---------------------------------------------------------------------------
# I_PCM under CABAC: hand-assembled via a minimal spec-9.3.4 encoder,
# libavcodec decodes the same bytes as ground truth
# ---------------------------------------------------------------------------


class _CabacEnc:
    """Minimal CABAC arithmetic ENCODER (spec 9.3.4) — test-only, used to
    assemble I_PCM streams x264 never emits.  Context state mirrors the
    decoder's 9.3.1.1 init; correctness is established empirically: the
    emitted bytes must decode identically in libavcodec AND our tier."""

    def __init__(self, w: BitWriter, qp: int):
        self.w = w
        self.state = bytearray(1024)
        self.mps = bytearray(1024)
        for i, (m, n) in enumerate(INIT_I):
            pre = ((m * qp) >> 4) + n
            pre = 1 if pre < 1 else (126 if pre > 126 else pre)
            if pre <= 63:
                self.state[i], self.mps[i] = 63 - pre, 0
            else:
                self.state[i], self.mps[i] = pre - 64, 1
        self.reinit()

    def reinit(self):
        """Arithmetic engine restart (slice-data begin / after I_PCM)."""
        self.low, self.range = 0, 510
        self.first_bit, self.outstanding = True, 0

    def _put(self, b: int):
        if self.first_bit:
            self.first_bit = False
        else:
            self.w.u(b, 1)
        while self.outstanding:
            self.w.u(1 - b, 1)
            self.outstanding -= 1

    def _renorm(self):
        while self.range < 256:
            if self.low >= 512:
                self.low -= 512
                self._put(1)
            elif self.low < 256:
                self._put(0)
            else:
                self.low -= 256
                self.outstanding += 1
            self.range <<= 1
            self.low <<= 1

    def decision(self, ctx: int, bit: int):
        lps = LPS_RANGE[self.state[ctx]][(self.range >> 6) & 3]
        self.range -= lps
        if bit != self.mps[ctx]:
            self.low += self.range
            self.range = lps
            if self.state[ctx] == 0:
                self.mps[ctx] = 1 - self.mps[ctx]
            self.state[ctx] = TRANS_LPS[self.state[ctx]]
        else:
            self.state[ctx] = TRANS_MPS[self.state[ctx]]
        self._renorm()

    def terminate(self, bit: int):
        self.range -= 2
        if bit:
            self.low += self.range
            self._flush()
        else:
            self._renorm()

    def _flush(self):
        self.range = 2
        self._renorm()
        self._put((self.low >> 9) & 1)
        self.w.u(((self.low >> 7) & 3) | 1, 2)


def _cabac_pps() -> bytes:
    w = BitWriter()
    w.ue(0)  # pps id
    w.ue(0)  # sps id
    w.u(1, 1)  # entropy_coding_mode_flag = CABAC
    w.u(0, 1)  # bottom_field_pic_order
    w.ue(0)  # num_slice_groups_minus1
    w.ue(0)  # num_ref_idx_l0
    w.ue(0)  # num_ref_idx_l1
    w.u(0, 1)  # weighted_pred
    w.u(0, 2)  # weighted_bipred
    w.se(0)  # pic_init_qp_minus26 -> 26
    w.se(0)  # pic_init_qs
    w.se(0)  # chroma_qp_index_offset
    w.u(0, 1)  # deblocking_filter_control_present
    w.u(0, 1)  # constrained_intra_pred
    w.u(0, 1)  # redundant_pic_cnt_present
    w.rbsp_trailing()
    return w.getvalue()


def _pcm_slice_header(w: BitWriter, qp_delta: int):
    """IDR I-slice header for the hand-built streams (make_sps defaults:
    log2_max_frame_num=4, poc_type=2, no deblock fields in PPS above)."""
    w.ue(0)  # first_mb_in_slice
    w.ue(7)  # slice_type I (all slices)
    w.ue(0)  # pps id
    w.u(0, 4)  # frame_num
    w.ue(0)  # idr_pic_id
    w.u(0, 1)  # no_output_of_prior_pics
    w.u(0, 1)  # long_term_reference
    w.se(qp_delta)  # slice_qp_delta
    while not w.bytes_aligned():  # cabac_alignment_one_bit
        w.u(1, 1)


def _mb_type_ctx_i(enc_left_kind):
    """mb_type bin0 ctxIdxInc: condTermA (left not I_NxN) for our 1-row
    pictures (top always unavailable)."""
    if enc_left_kind is None:
        return 3
    return 3 + (0 if enc_left_kind == "i4" else 1)


def _build_pcm_stream(n_mbs: int, seed: int):
    """n_mbs-wide single-row picture: PCM MBs then one empty I16 MB
    (cbp=0) if n_mbs > 1 — exercising the mid-slice engine reinit AND
    the PCM-neighbor context rules of every following element."""
    rng = np.random.default_rng(seed)
    qp = 26
    w = BitWriter()
    _pcm_slice_header(w, 0)
    enc = _CabacEnc(w, qp)
    samples = []
    left = None
    for mb in range(n_mbs):
        is_last = mb == n_mbs - 1
        if not is_last or n_mbs == 1:
            # I_PCM: bin0=1 (ctx by left kind), bin1 terminate=1 -> flush
            enc.decision(_mb_type_ctx_i(left), 1)
            enc.terminate(1)
            w.align_zero()  # pcm_alignment_zero_bit
            smp = rng.integers(0, 256, 384, dtype=np.uint8)
            # avoid emulation-prevention interactions in the raw samples
            smp[smp == 0] = 1
            w.raw_bytes(smp.tobytes())
            samples.append(smp)
            enc.reinit()
            left = "pcm"
        else:
            # empty Intra_16x16 DC (cbp 0): bins 1,T0,cbp_luma=0,
            # chroma=0, pred mode 2 (DC; valid with top unavailable)
            enc.decision(_mb_type_ctx_i(left), 1)
            enc.terminate(0)
            enc.decision(6, 0)  # cbp_luma != 0 ?
            enc.decision(7, 0)  # cbp_chroma > 0 ?
            enc.decision(9, 1)  # pred mode high bit
            enc.decision(10, 0)  # pred mode low bit -> mode 2 (DC)
            # intra_chroma_pred_mode = 0: ctx 64 + condA(left PCM -> 0)
            enc.decision(64, 0)
            # mb_qp_delta = 0 (I16 always carries it): ctx 60
            enc.decision(60, 0)
            # luma DC coded_block_flag = 0: ctx 85 + inc(left PCM=1,
            # top unavail=1 -> 3)
            enc.decision(88, 0)
            left = "i16"
        enc.terminate(0 if mb < n_mbs - 1 else 1)  # end_of_slice_flag
    # rbsp alignment (the flush already emitted the stop-one bit)
    w.align_zero()
    sps = make_sps(16 * n_mbs, 16, profile_idc=77)  # main: CABAC-capable
    stream = (
        b"\x00\x00\x00\x01" + nal(7, sps)
        + b"\x00\x00\x00\x01" + nal(8, _cabac_pps())
        + b"\x00\x00\x00\x01" + nal(5, w.getvalue())
    )
    return stream, samples


@pytest.mark.parametrize("n_mbs", [1, 2, 3])
def test_ipcm_handbuilt_bitexact(n_mbs):
    """Hand-built CABAC I_PCM streams: libavcodec decodes our bytes as
    ground truth; our tier must match it bit-exactly, and both must
    reproduce the raw samples (PCM is lossless)."""
    avshim = _shim()
    stream, samples = _build_pcm_stream(n_mbs, seed=n_mbs)
    ref = avshim.VideoDecoder("h264")
    theirs = ref.decode(stream, 0) + ref.flush()
    ref.close()
    assert theirs, "libavcodec rejected the hand-built PCM stream"
    _, ty, tu, tv = theirs[0]
    # libavcodec agrees with the raw samples we embedded
    for mb, smp in enumerate(samples):
        assert np.array_equal(
            ty[:16, mb * 16 : mb * 16 + 16].ravel(), smp[:256]
        ), f"libav luma MB{mb}"
        assert np.array_equal(
            tu[:8, mb * 8 : mb * 8 + 8].ravel(), smp[256:320]
        ), f"libav cb MB{mb}"
        assert np.array_equal(
            tv[:8, mb * 8 : mb * 8 + 8].ravel(), smp[320:384]
        ), f"libav cr MB{mb}"
    dec = PureH264Decoder()
    ours = dec.decode_annexb(stream)
    assert len(ours) == 1
    _, oy, ou, ov = ours[0]
    assert np.array_equal(oy, ty) and np.array_equal(ou, tu)
    assert np.array_equal(ov, tv)


# ---------------------------------------------------------------------------
# typed-error discipline: fuzz + truncation + fast-tier rejection
# ---------------------------------------------------------------------------


def test_cabac_fuzz_typed_errors():
    """Byte mutations of a real x264 CABAC stream must either decode or
    raise typed errors — never crash."""
    from mixlab_tpu.av.h264dec import decode_annexb_frame
    from mixlab_tpu.av.sps import SpsError

    w, h = 48, 32
    ed, pk = _x264_cabac_stream(
        w, h, "preset=veryfast,profile=main,g=1,qp=20,threads=1",
        [_content("noise", w, h, seed=13)],
    )
    data = ed + pk[0][3]
    rng = np.random.default_rng(5)
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
    for cut in range(1, min(len(data), 120)):
        try:
            decode_annexb_frame(data[:-cut])
        except (H264DecodeError, SpsError, ValueError):
            pass


def test_bad_initial_offset_rejected():
    """codIOffset 510/511 is forbidden (spec 9.3.1.2)."""
    r = BitReader(bytes([0xFF, 0xFF, 0xFF, 0xFF]))
    with pytest.raises(H264DecodeError, match="codIOffset"):
        _CabacEngine(r, 26)


def test_fast_tiers_reject_cabac_slices():
    """The CAVLC fast tiers must route CABAC slices away with a typed
    error, never mis-decode them."""
    from mixlab_tpu.av.h264dec import _Pps, _SpsExt
    from mixlab_tpu.av.h264dec_fast import FastSliceDecoder, NativeFullSliceDecoder

    sps = _SpsExt(make_sps(32, 32))
    pps = _Pps(_cabac_pps())
    assert pps.entropy_cabac
    for cls in (FastSliceDecoder, NativeFullSliceDecoder):
        try:
            dec = cls(sps, pps)
        except H264Unsupported:
            continue  # rejecting at construction is also fine
        with pytest.raises(H264Unsupported):
            dec.decode_slice(b"\x88", 5)


def test_slice_overrun_rejected():
    """A CABAC slice whose end_of_slice never fires inside the picture
    raises the typed overrun error (hostile stream, engine desync)."""
    stream, _ = _build_pcm_stream(2, seed=9)
    # truncating the final end_of_slice region forces an overrun or a
    # typed truncation error — never a crash
    from mixlab_tpu.av.sps import SpsError

    dec = PureH264Decoder()
    with pytest.raises((H264DecodeError, SpsError)):
        dec.decode_annexb(stream[:-2] + b"\x00\x00")
