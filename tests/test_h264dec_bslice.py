"""B-slice (bi-predicted) H.264 pure-tier decode vs libavcodec.

Round-5 scope completion for the zero-dep tier: x264's DEFAULT GOP
structure uses B-frames (bframes=3, b-pyramid, weightb -> implicit
weighted biprediction, spatial direct), so real-world publishers send
B slices.  This suite pins the pure decoder's B support — POC
computation and display-order reordering, B list0/list1 initialization,
spatial AND temporal direct modes (direct_8x8_inference), bi-predictive
MC with default/implicit weighting, B_Skip/B_Direct inference, all
Table 7-14/7-18 partition shapes, and the 8.7.2.1 two-list deblocking
bS rules (av/h264dec.py).

Ground truth is libavcodec decoding the same x264 streams: planes must
be BIT-EXACT frame by frame in display order.  The reference decodes
such streams via ffmpeg FFI (/root/reference/src/rtmp/mod.rs:260-338).
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
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h * 2, w * 2), dtype=np.uint8)
    cu = rng.integers(0, 256, (h, w), dtype=np.uint8)
    cv = rng.integers(0, 256, (h, w), dtype=np.uint8)
    frames = []
    for i in range(n):
        if kind == "pan":
            oy, ox = 3 * i, 2 * i
        elif kind == "still":
            oy, ox = (0, 0) if i < n - 1 else (1, 0)
        elif kind == "cut":
            oy, ox = (5 * i, 0) if i < n // 2 else (h, w - 16)
        else:
            raise ValueError(kind)
        y = base[oy:oy + h, ox:ox + w].copy()
        u = cu[oy // 2:oy // 2 + h // 2, ox // 2:ox // 2 + w // 2].copy()
        v = cv[oy // 2:oy // 2 + h // 2, ox // 2:ox // 2 + w // 2].copy()
        y[(i * 7) % max(1, h - 8):, :] ^= 3
        frames.append((y, u, v))
    return frames


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
    """Both decoders over the same packets; display-order planes must
    match bit-for-bit (the pure decoder reorders by POC, libavcodec by
    its own DPB bumping — identical display order)."""
    avshim = _shim()
    ours_dec = PureH264Decoder()
    ours_dec.decode_annexb(ed)
    ref = avshim.VideoDecoder("h264")
    ours, theirs = [], []
    for i, (pts, _dts, _key, data) in enumerate(pk):
        ours.extend(ours_dec.decode_annexb(data, pts))
        theirs.extend(ref.decode((ed if i == 0 else b"") + data, pts))
    ours.extend(ours_dec.flush())
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


# x264 main profile with its default B structure; scenecut pinned off so
# the GOP shape is deterministic across builds
CAVLC_B = ("preset=veryfast,profile=main,g=250,threads=1,"
           "x264-params=cabac=0:scenecut=0:")
CABAC_B = ("preset=veryfast,profile=main,g=250,threads=1,"
           "x264-params=scenecut=0:")


# ---------------------------------------------------------------------------
# CAVLC B: content x QP, direct modes, weighting, partitions, structure
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kind", ["pan", "still", "cut"])
@pytest.mark.parametrize("qp", [10, 24, 38])
def test_cavlc_b_content_qp(kind, qp):
    frames = _content(kind, 128, 96, 12, seed=qp)
    ed, pk = _x264(128, 96, CAVLC_B + f"bframes=3,qp={qp}", frames)
    assert _assert_bitexact(ed, pk, f"cavlc-b-{kind}@qp{qp}") == 12


def test_cavlc_b_pyramid_and_without():
    frames = _content("pan", 128, 96, 12, seed=1)
    for params, label in (
            ("bframes=3:b-adapt=0", "pyramid"),  # b-pyramid normal
            ("bframes=1:b-adapt=0:b-pyramid=none", "no-pyramid"),
            ("bframes=16:b-adapt=0", "b16")):
        ed, pk = _x264(128, 96, CAVLC_B + f"{params},qp=24", frames)
        _assert_bitexact(ed, pk, f"cavlc-{label}")


def test_cavlc_b_temporal_direct():
    """direct=temporal: POC-scaled co-located motion (8.4.1.2.3)."""
    frames = _content("pan", 128, 96, 12, seed=2)
    ed, pk = _x264(
        128, 96, CAVLC_B + "bframes=2:b-adapt=0:direct=temporal,qp=24",
        frames)
    _assert_bitexact(ed, pk, "cavlc-b-temporal")


def test_cavlc_b_weighting_modes():
    """weightb on (implicit POC-derived bipred weights, the x264
    default) and off (plain (p0+p1+1)>>1 average)."""
    frames = _content("pan", 128, 96, 12, seed=3)
    for params, label in (("bframes=3", "implicit"),
                          ("bframes=3:weightb=0", "average")):
        ed, pk = _x264(128, 96, CAVLC_B + f"{params},qp=24", frames)
        _assert_bitexact(ed, pk, f"cavlc-b-{label}")


def test_cavlc_b_all_partitions():
    frames = _content("pan", 128, 96, 12, seed=4)
    ed, pk = _x264(
        128, 96,
        CAVLC_B + "bframes=3:b-adapt=0:partitions=all:me=umh:subme=7,qp=16",
        frames)
    _assert_bitexact(ed, pk, "cavlc-b-partitions")


def test_cavlc_b_multiref_aq_crop_deblock():
    for opts, w, h, kind, label in (
            (CAVLC_B + "bframes=3:ref=4,qp=20", 128, 96, "pan", "ref4"),
            (CAVLC_B + "bframes=3:aq-mode=2,crf=28", 128, 96, "cut", "aq"),
            (CAVLC_B + "bframes=3,qp=24", 120, 84, "pan", "crop"),
            (CAVLC_B + "bframes=3:deblock=-3,3,qp=30", 128, 96, "pan",
             "deblock-offsets"),
            (CAVLC_B + "bframes=3:no-deblock=1,qp=30", 128, 96, "pan",
             "deblock-off")):
        frames = _content(kind, w, h, 12, seed=5)
        ed, pk = _x264(w, h, opts, frames)
        _assert_bitexact(ed, pk, f"cavlc-b-{label}")


def test_cavlc_b_periodic_idr_reorder_drain():
    """IDR mid-stream: buffered display-order frames drain before the
    new GOP; POC predictor state resets."""
    frames = _content("pan", 128, 96, 20, seed=6)
    ed, pk = _x264(
        128, 96,
        "preset=medium,profile=main,g=8,threads=1,"
        "x264-params=cabac=0:scenecut=0:bframes=3,qp=24", frames)
    _assert_bitexact(ed, pk, "cavlc-b-gop8")


# ---------------------------------------------------------------------------
# CABAC B (x264's true default: main profile, cabac, B-frames)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kind", ["pan", "still", "cut"])
@pytest.mark.parametrize("qp", [10, 24, 38])
def test_cabac_b_content_qp(kind, qp):
    frames = _content(kind, 128, 96, 12, seed=qp)
    ed, pk = _x264(128, 96, CABAC_B + f"bframes=3,qp={qp}", frames)
    assert _assert_bitexact(ed, pk, f"cabac-b-{kind}@qp{qp}") == 12


def test_cabac_b_structure_sweep():
    frames = _content("pan", 128, 96, 12, seed=8)
    for params, label in (
            ("bframes=3:b-adapt=0", "pyramid"),
            ("bframes=1:b-adapt=0:b-pyramid=none", "no-pyramid"),
            ("bframes=2:b-adapt=0:direct=temporal", "temporal"),
            ("bframes=3:weightb=0", "average"),
            ("bframes=3:ref=4", "ref4"),
            ("bframes=3:b-adapt=0:partitions=all:me=umh:subme=7",
             "partitions")):
        ed, pk = _x264(128, 96, CABAC_B + f"{params},qp=20", frames)
        _assert_bitexact(ed, pk, f"cabac-b-{label}")


def test_cabac_b_aq_crop_gop():
    for opts, w, h, n, kind, label in (
            (CABAC_B + "bframes=3:aq-mode=2,crf=28", 128, 96, 12, "cut",
             "aq"),
            (CABAC_B + "bframes=3,qp=24", 120, 84, 12, "pan", "crop"),
            ("preset=medium,profile=main,g=8,threads=1,"
             "x264-params=scenecut=0:bframes=3,qp=24", 128, 96, 20, "pan",
             "gop8")):
        frames = _content(kind, w, h, n, seed=9)
        ed, pk = _x264(w, h, opts, frames)
        _assert_bitexact(ed, pk, f"cabac-b-{label}")


def test_x264_true_default_ingests():
    """The realistic op point: x264 with NOTHING pinned beyond main
    profile — medium preset, crf, scenecut, adaptive B, mbtree,
    weightp/weightb, CABAC.  The zero-dep tier must ingest exactly what
    a stock third-party publisher sends."""
    frames = _content("cut", 128, 96, 24, seed=10)
    ed, pk = _x264(128, 96, "preset=medium,profile=main,threads=1,crf=23",
                   frames)
    _assert_bitexact(ed, pk, "x264-true-default")


def test_cabac_b_hostile_bytes_typed():
    frames = _content("pan", 64, 48, 8, seed=11)
    ed, pk = _x264(64, 48, CABAC_B + "bframes=3:b-adapt=0,qp=24", frames)
    rng = np.random.default_rng(37)
    for _, _, _, data in pk:
        for _ in range(25):
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
# tier equivalence: native C++ B decoder vs the scalar Python tiers
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("profile_opts", [
    "cabac=0:bframes=3:b-adapt=0",            # CAVLC B, spatial direct
    "cabac=0:bframes=2:direct=temporal",      # CAVLC B, temporal direct
    "bframes=3:b-adapt=0",                    # CABAC B
    "bframes=3:ref=4:partitions=all",         # CABAC B + multiref + parts
])
def test_native_b_tier_matches_scalar(profile_opts, monkeypatch):
    """The same B stream through the default (native) routing and the
    forced-scalar Python routing must produce identical display-order
    planes — pins both tiers against each other on top of the
    libavcodec differentials."""
    frames = _content("cut", 128, 96, 12, seed=41)
    ed, pk = _x264(
        128, 96,
        "preset=veryfast,profile=main,g=250,threads=1,qp=22,"
        f"x264-params=scenecut=0:{profile_opts}", frames)

    def run():
        dec = PureH264Decoder()
        dec.decode_annexb(ed)
        out = []
        for _, _, _, data in pk:
            out.extend(dec.decode_annexb(data))
        out.extend(dec.flush())
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


def test_hostile_b_bytes_raise_typed():
    frames = _content("pan", 64, 48, 8, seed=7)
    ed, pk = _x264(64, 48, CAVLC_B + "bframes=3:b-adapt=0,qp=24", frames)
    rng = np.random.default_rng(31)
    for _, _, _, data in pk:
        for _ in range(25):
            buf = bytearray(data)
            for _ in range(rng.integers(1, 6)):
                buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
            dec = PureH264Decoder()
            dec.decode_annexb(ed)
            try:
                dec.decode_annexb(bytes(buf))
            except H264DecodeError:
                pass  # typed failure is the contract
        for cut in (1, len(data) // 2, len(data) - 1):
            dec = PureH264Decoder()
            dec.decode_annexb(ed)
            try:
                dec.decode_annexb(data[:cut])
            except H264DecodeError:
                pass
