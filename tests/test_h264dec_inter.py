"""Inter-coded (P-slice) H.264 pure-tier decode vs libavcodec.

Round-5 scope extension: real-world RTMP publishers send INTER streams,
so the zero-dep tier grows P-slice support — motion-compensated
prediction (quarter-sample luma, eighth-sample chroma, av/h264mc.py),
median MV prediction with the 16x8/8x16 shortcuts and P_Skip inference,
multi-reference DPB with sliding-window marking and ref-list
modification, explicit weighted prediction, and §8.7 deblocking with
derived per-edge boundary strengths (av/h264dec.py).

Ground truth is libavcodec decoding the same x264 streams (the shim
encodes them, so every byte is third-party): planes must be BIT-EXACT
frame by frame.  The reference decodes such streams via ffmpeg FFI
(/root/reference/src/rtmp/mod.rs:260-338).
"""

from __future__ import annotations

import numpy as np
import pytest

from mixlab_tpu.av.h264dec import H264DecodeError, PureH264Decoder


def _shim():
    from mixlab_tpu.native import avshim

    if not avshim.available():
        pytest.skip("libavcodec shim unavailable")
    return avshim


def _content(kind, w, h, n, seed=0):
    """Frame sequences with real temporal structure so x264 emits the
    whole P toolset: translating detail (non-zero MVs incl. fractional),
    static areas (P_Skip runs), and a scene cut (intra MBs in P)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h * 2, w * 2), dtype=np.uint8)
    cu = rng.integers(0, 256, (h, w), dtype=np.uint8)
    cv = rng.integers(0, 256, (h, w), dtype=np.uint8)
    frames = []
    for i in range(n):
        if kind == "pan":  # smooth diagonal pan over a fixed texture
            oy, ox = 3 * i, 2 * i
        elif kind == "still":  # mostly P_Skip
            oy, ox = (0, 0) if i < n - 1 else (1, 0)
        elif kind == "cut":  # scene change mid-sequence
            oy, ox = (5 * i, 0) if i < n // 2 else (h, w - 16)
        else:
            raise ValueError(kind)
        y = base[oy:oy + h, ox:ox + w].copy()
        u = cu[oy // 2:oy // 2 + h // 2, ox // 2:ox // 2 + w // 2].copy()
        v = cv[oy // 2:oy // 2 + h // 2, ox // 2:ox // 2 + w // 2].copy()
        # low-entropy overlay so residuals stay small but non-zero
        y[(i * 7) % max(1, h - 8):, :] ^= 3
        frames.append((y, u, v))
    return frames


def _smooth(frames):
    """Blur the luma so sub-pel motion estimation finds fractional MVs."""
    out = []
    for y, u, v in frames:
        s = y.astype(np.int32)
        s = (s + np.roll(s, 1, 1) + np.roll(s, -1, 1)
             + np.roll(s, 1, 0) + np.roll(s, -1, 0)) // 5
        out.append((s.astype(np.uint8), u, v))
    return out


def _x264(w, h, opts, frames, fps=30):
    avshim = _shim()
    enc = avshim.VideoEncoder(w, h, fps=fps, opts=opts)
    for i, (y, u, v) in enumerate(frames):
        enc.send(y, u, v, i)
    enc.flush()
    pk = enc.receive()
    ed = enc.extradata()
    enc.close()
    assert pk, "x264 emitted no packets"
    return ed, pk


def _assert_bitexact(ed, pk, label=""):
    avshim = _shim()
    ours_dec = PureH264Decoder()
    ours_dec.decode_annexb(ed)
    ref = avshim.VideoDecoder("h264")
    ours, theirs = [], []
    for i, (pts, _dts, _key, data) in enumerate(pk):
        ours.extend(ours_dec.decode_annexb(data))
        theirs.extend(ref.decode((ed if i == 0 else b"") + data, pts))
    theirs.extend(ref.flush())
    ref.close()
    assert len(ours) == len(theirs) == len(pk), (
        f"{label}: {len(ours)} ours vs {len(theirs)} libav of {len(pk)}")
    for i, ((_, y1, u1, v1), (_, y2, u2, v2)) in enumerate(zip(ours, theirs)):
        for name, a, b in (("Y", y1, y2), ("U", u1, u2), ("V", v1, v2)):
            assert np.array_equal(a, b), (
                f"{label}: {name} differs at frame {i} "
                f"(maxdiff {np.abs(a.astype(int) - b.astype(int)).max()}, "
                f"{int((a != b).sum())} samples)")
    return len(ours)


BASE = ("preset=veryfast,profile=baseline,tune=zerolatency,"
        "g=250,threads=1,")


# ---------------------------------------------------------------------------
# CAVLC P-slices: content classes x QP
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kind", ["pan", "still", "cut"])
@pytest.mark.parametrize("qp", [10, 26, 38])
def test_cavlc_p_content_qp(kind, qp):
    frames = _content(kind, 128, 96, 10, seed=qp)
    ed, pk = _x264(128, 96, BASE + f"qp={qp}", frames)
    assert _assert_bitexact(ed, pk, f"{kind}@qp{qp}") == 10


def test_cavlc_p_fractional_mvs():
    """Smoothed pan: sub-pel motion -> all quarter-sample interpolation
    cases exercise (the 6-tap half-pel + quarter averages)."""
    frames = _smooth(_content("pan", 160, 112, 12, seed=3))
    ed, pk = _x264(160, 112, BASE + "qp=20,x264-params=me=umh:subme=7",
                   frames)
    _assert_bitexact(ed, pk, "fractional")


def test_cavlc_p_partitions():
    """All partition shapes incl. sub-8x8: --partitions all + small QP."""
    frames = _content("pan", 128, 96, 8, seed=9)
    ed, pk = _x264(
        128, 96,
        BASE + "qp=16,x264-params=partitions=all:me=umh:subme=7", frames)
    _assert_bitexact(ed, pk, "partitions")


def test_cavlc_p_multiref():
    """ref=4: multi-reference prediction + sliding-window DPB."""
    frames = _content("pan", 128, 96, 16, seed=5)
    ed, pk = _x264(128, 96, BASE + "qp=22,x264-params=ref=4", frames)
    _assert_bitexact(ed, pk, "multiref")


def test_cavlc_p_weightp():
    """Explicit weighted prediction (needs main profile; CAVLC via
    no-cabac): fading luma forces non-default weights and x264's
    duplicate-reference trick exercises ref list modification."""
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (96, 128), dtype=np.uint8)
    frames = []
    for i in range(12):
        fade = np.clip(base.astype(np.int32) * (12 - i) // 12, 0, 255)
        frames.append((fade.astype(np.uint8),
                       np.full((48, 64), 90, np.uint8),
                       np.full((48, 64), 150, np.uint8)))
    ed, pk = _x264(
        128, 96,
        "preset=veryfast,profile=main,tune=zerolatency,g=250,threads=1,"
        "qp=20,x264-params=cabac=0:weightp=2", frames)
    _assert_bitexact(ed, pk, "weightp")


def test_cavlc_p_deblock_off_and_offsets():
    frames = _content("pan", 128, 96, 8, seed=7)
    for params, label in (("no-deblock=1", "deblock-off"),
                          ("deblock=-3,3", "deblock-offsets")):
        ed, pk = _x264(128, 96, BASE + f"qp=30,x264-params={params}", frames)
        _assert_bitexact(ed, pk, label)


def test_cavlc_p_aq_qp_deltas():
    frames = _content("cut", 160, 96, 10, seed=13)
    ed, pk = _x264(160, 96, BASE + "crf=28,x264-params=aq-mode=2", frames)
    _assert_bitexact(ed, pk, "aq")


def test_cavlc_p_crop():
    """Non-MB-aligned dims: MVs reference the full (uncropped) planes."""
    frames = _content("pan", 120, 84, 8, seed=17)
    ed, pk = _x264(120, 84, BASE + "qp=24", frames)
    _assert_bitexact(ed, pk, "crop")


def test_cavlc_p_periodic_idr():
    """IDR mid-stream resets the DPB; decode continues bit-exact."""
    frames = _content("pan", 128, 96, 12, seed=19)
    ed, pk = _x264(128, 96,
                   "preset=veryfast,profile=baseline,tune=zerolatency,"
                   "g=4,threads=1,qp=24,x264-params=scenecut=0", frames)
    _assert_bitexact(ed, pk, "periodic-idr")


def test_cavlc_p_sub8x8_all_shapes():
    """Independently jittering 8x8 tiles force x264 into P_8x8 with every
    sub-partition shape (probed: ~500 8x8, ~600 4x8, ~950 4x4, ~550 8x4
    sub-partitions in this stream)."""
    rng = np.random.default_rng(4)
    w, h, n = 128, 96, 8
    base = rng.integers(0, 256, (h + 16, w + 16), dtype=np.uint8)
    frames = []
    for _ in range(n):
        y = np.zeros((h, w), np.uint8)
        for ty in range(0, h, 8):
            for tx in range(0, w, 8):
                dy = int(rng.integers(-2, 3))
                dx = int(rng.integers(-2, 3))
                y[ty:ty + 8, tx:tx + 8] = base[8 + ty + dy:16 + ty + dy,
                                               8 + tx + dx:16 + tx + dx]
        frames.append((y, np.full((h // 2, w // 2), 100, np.uint8),
                       np.full((h // 2, w // 2), 140, np.uint8)))
    ed, pk = _x264(
        w, h, BASE + "qp=14,"
        "x264-params=partitions=all:me=umh:subme=7:merange=4", frames)
    _assert_bitexact(ed, pk, "jitter-sub8x8")


def test_cavlc_p_weightp_ref_list_modification():
    """weightp=2 + ref=3 on a noisy fade: x264 duplicates a reference
    with different weights via ref_pic_list_modification (probed: 14 of
    15 P slices carry a duplicated entry in list0)."""
    rng = np.random.default_rng(8)
    base = rng.integers(30, 220, (96, 128), dtype=np.uint8)
    frames = []
    for i in range(16):
        fade = np.clip(base.astype(np.int32) * (20 - i) // 20
                       + rng.integers(-4, 5, base.shape), 0, 255)
        frames.append((fade.astype(np.uint8),
                       np.full((48, 64), 90, np.uint8),
                       np.full((48, 64), 150, np.uint8)))
    ed, pk = _x264(
        128, 96,
        "preset=medium,profile=main,tune=zerolatency,g=250,threads=1,"
        "qp=18,x264-params=cabac=0:weightp=2:ref=3", frames)
    _assert_bitexact(ed, pk, "weightp-ref3")


# ---------------------------------------------------------------------------
# CABAC P-slices (x264's true default: profile=main + cabac + inter)
# ---------------------------------------------------------------------------

CABAC = ("preset=veryfast,profile=main,tune=zerolatency,"
         "g=250,threads=1,")


@pytest.mark.parametrize("kind", ["pan", "still", "cut"])
@pytest.mark.parametrize("qp", [17, 26, 38])
def test_cabac_p_content_qp(kind, qp):
    frames = _content(kind, 128, 96, 10, seed=qp)
    ed, pk = _x264(128, 96, CABAC + f"qp={qp}", frames)
    assert _assert_bitexact(ed, pk, f"cabac-{kind}@qp{qp}") == 10


def test_cabac_p_fractional_mvs():
    frames = _smooth(_content("pan", 160, 112, 12, seed=3))
    ed, pk = _x264(160, 112, CABAC + "qp=20,x264-params=me=umh:subme=7",
                   frames)
    _assert_bitexact(ed, pk, "cabac-frac")


def test_cabac_p_sub8x8_all_shapes():
    rng = np.random.default_rng(4)
    w, h, n = 128, 96, 8
    base = rng.integers(0, 256, (h + 16, w + 16), dtype=np.uint8)
    frames = []
    for _ in range(n):
        y = np.zeros((h, w), np.uint8)
        for ty in range(0, h, 8):
            for tx in range(0, w, 8):
                dy = int(rng.integers(-2, 3))
                dx = int(rng.integers(-2, 3))
                y[ty:ty + 8, tx:tx + 8] = base[8 + ty + dy:16 + ty + dy,
                                               8 + tx + dx:16 + tx + dx]
        frames.append((y, np.full((h // 2, w // 2), 100, np.uint8),
                       np.full((h // 2, w // 2), 140, np.uint8)))
    ed, pk = _x264(
        w, h, CABAC + "qp=14,"
        "x264-params=partitions=all:me=umh:subme=7:merange=4", frames)
    _assert_bitexact(ed, pk, "cabac-sub8x8")


def test_cabac_p_weightp_multiref_mixedref():
    """The combination that found the same-MB ref_idx context bug: the
    ref_idx ctx (9.3.3.1.1.6) depends on refs of earlier partitions in
    the CURRENT MB, which CABAC reads before any mvd."""
    rng = np.random.default_rng(8)
    base = rng.integers(30, 220, (96, 128), dtype=np.uint8)
    frames = []
    for i in range(16):
        fade = np.clip(base.astype(np.int32) * (20 - i) // 20
                       + rng.integers(-4, 5, base.shape), 0, 255)
        frames.append((fade.astype(np.uint8),
                       np.full((48, 64), 90, np.uint8),
                       np.full((48, 64), 150, np.uint8)))
    for params in ("weightp=2:ref=3", "weightp=2:ref=3:mixed-refs=1",
                   "weightp=2:ref=5:partitions=all"):
        ed, pk = _x264(
            128, 96,
            "preset=medium,profile=main,tune=zerolatency,g=250,threads=1,"
            f"qp=18,x264-params={params}", frames)
        _assert_bitexact(ed, pk, f"cabac-{params}")


def test_cabac_p_intra_mbs_in_p():
    """Intra MBs inside P slices (scenecut=0 forces the cut frame to
    stay P): I_4x4 and Intra_16x16 with the ctxIdxOffset-17 suffix."""
    w, h = 128, 96
    grad = (np.add.outer(np.arange(h * 2), np.arange(w * 2)) // 3
            % 256).astype(np.uint8)
    frames = []
    for i in range(12):
        if i < 5:
            y = np.full((h, w), 60, np.uint8)
            y[:, (i * 8) % w:] = 180
        else:
            y = grad[3 * (i - 5):3 * (i - 5) + h,
                     2 * (i - 5):2 * (i - 5) + w].copy()
        frames.append((y, np.full((h // 2, w // 2), 100, np.uint8),
                       np.full((h // 2, w // 2), 140, np.uint8)))
    ed, pk = _x264(w, h, CABAC + "qp=30,x264-params=scenecut=0", frames)
    _assert_bitexact(ed, pk, "cabac-intra-in-p")


def test_cabac_p_aq_crop():
    frames = _content("cut", 120, 84, 10, seed=13)
    ed, pk = _x264(120, 84, CABAC + "crf=28,x264-params=aq-mode=2", frames)
    _assert_bitexact(ed, pk, "cabac-aq-crop")


def test_cabac_p_hostile_bytes_typed():
    frames = _content("pan", 64, 48, 4, seed=29)
    ed, pk = _x264(64, 48, CABAC + "qp=24", frames)
    rng = np.random.default_rng(37)
    for _, _, _, data in pk:
        for _ in range(40):
            buf = bytearray(data)
            for _ in range(rng.integers(1, 6)):
                buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
            dec = PureH264Decoder()
            dec.decode_annexb(ed)
            try:
                dec.decode_annexb(bytes(buf))
            except H264DecodeError:
                pass


# ---------------------------------------------------------------------------
# tier equivalence: native C++ P decoder vs the scalar Python tiers
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("profile_opts", [
    "profile=baseline",                      # CAVLC P
    "profile=main",                          # CABAC P
    "profile=main,x264-params=weightp=2:ref=3",  # CABAC + WP + multiref
])
def test_native_p_tier_matches_scalar(profile_opts, monkeypatch):
    """The same stream through the default (native) routing and the
    forced-scalar Python routing must produce identical planes — pins
    both tiers against each other on top of the libavcodec
    differentials."""
    frames = _content("cut", 128, 96, 8, seed=41)
    ed, pk = _x264(
        128, 96,
        f"preset=veryfast,{profile_opts},tune=zerolatency,g=250,threads=1,"
        "qp=22", frames)

    def run():
        dec = PureH264Decoder()
        dec.decode_annexb(ed)
        out = []
        for _, _, _, data in pk:
            out.extend(dec.decode_annexb(data))
        return out

    native_out = run()
    monkeypatch.setenv("MIXLAB_PURE_H264_SCALAR", "1")
    scalar_out = run()
    assert len(native_out) == len(scalar_out) == len(pk)
    for i, (a, b) in enumerate(zip(native_out, scalar_out)):
        for name, x, y in (("Y", a[1], b[1]), ("U", a[2], b[2]),
                           ("V", a[3], b[3])):
            assert np.array_equal(x, y), f"{name} tier mismatch, frame {i}"


# ---------------------------------------------------------------------------
# hostile / truncated bytes stay typed errors
# ---------------------------------------------------------------------------


def test_hostile_p_bytes_raise_typed():
    frames = _content("pan", 64, 48, 4, seed=23)
    ed, pk = _x264(64, 48, BASE + "qp=24", frames)
    rng = np.random.default_rng(31)
    for _, _, _, data in pk:
        for _ in range(40):
            buf = bytearray(data)
            for _ in range(rng.integers(1, 6)):
                buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
            dec = PureH264Decoder()
            dec.decode_annexb(ed)
            try:
                dec.decode_annexb(bytes(buf))
            except H264DecodeError:
                pass  # typed failure is the contract

    for _, _, _, data in pk:
        for cut in (1, len(data) // 2, len(data) - 1):
            dec = PureH264Decoder()
            dec.decode_annexb(ed)
            try:
                dec.decode_annexb(data[:cut])
            except H264DecodeError:
                pass
