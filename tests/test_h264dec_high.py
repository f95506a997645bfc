"""High-profile (8x8 transform) H.264 pure-tier decode vs libavcodec.

Round-5 completion of the zero-dep decoder: STOCK x264 output — what
OBS and every default-configured publisher sends — is High profile with
8x8dct: transform_size_8x8_flag, Intra_8x8 prediction with
reference-sample filtering (8.3.2.2), the flat-matrix 8x8 dequant +
8-point inverse transform (8.5.13), CAVLC interleaved 8x8 residual
(7.4.5.3.3), CABAC ctxBlockCat-5 residual with the Table 9-43
scan-position context classes, and the 8x8-transform deblocking rules
(no internal 4x4 edges; bS consults the covering 8x8 block).

The Table 9-43 context maps were cross-validated against the byte
patterns both system codec binaries carry (libavcodec AND libx264 embed
the identical normative tables) and are pinned behaviorally by every
differential below.  Ground truth is libavcodec decoding the same x264
streams: planes must be BIT-EXACT in display order.
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
        elif kind == "cut":
            oy, ox = (5 * i, 0) if i < n // 2 else (h, w - 16)
        else:
            raise ValueError(kind)
        y = base[oy:oy + h, ox:ox + w].copy()
        u = cu[oy // 2:oy // 2 + h // 2, ox // 2:ox // 2 + w // 2].copy()
        v = cv[oy // 2:oy // 2 + h // 2, ox // 2:ox // 2 + w // 2].copy()
        y[(i * 7) % max(1, h - 8):, :] ^= 3
        if kind == "pan" and i % 2:
            # smooth half the frames so 8x8 transforms win rate control
            s = y.astype(np.int32)
            s = (s + np.roll(s, 1, 1) + np.roll(s, -1, 1)
                 + np.roll(s, 1, 0) + np.roll(s, -1, 0)) // 5
            y = s.astype(np.uint8)
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


HI = "preset=veryfast,profile=high,g=250,threads=1,"


# ---------------------------------------------------------------------------
# intra: I_8x8 prediction + 8x8 residual, both entropy coders
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("entropy", ["cabac=0:", ""])
@pytest.mark.parametrize("qp", [10, 24, 38])
def test_high_intra_qp(entropy, qp):
    frames = _content("pan", 128, 96, 4, seed=qp)
    ed, pk = _x264(
        128, 96, HI + f"qp={qp},x264-params={entropy}keyint=1:scenecut=0",
        frames)
    assert _assert_bitexact(ed, pk, f"hi-intra-{entropy}qp{qp}") == 4


def test_high_intra_crop_and_deblock():
    for opts, w, h, label in (
            (HI + "qp=24,x264-params=keyint=1", 120, 84, "crop"),
            (HI + "qp=30,x264-params=keyint=1:deblock=-3,3", 128, 96,
             "deblock-offsets"),
            (HI + "qp=30,x264-params=cabac=0:keyint=1:no-deblock=1",
             128, 96, "deblock-off")):
        frames = _content("pan", w, h, 4, seed=3)
        ed, pk = _x264(w, h, opts, frames)
        _assert_bitexact(ed, pk, f"hi-intra-{label}")


# ---------------------------------------------------------------------------
# inter: 8x8 transform on P and B macroblocks
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("params,label", [
    ("cabac=0:bframes=0:scenecut=0", "p-cavlc"),
    ("bframes=0:scenecut=0", "p-cabac"),
    ("cabac=0:bframes=3:b-adapt=0:scenecut=0", "b-cavlc"),
    ("bframes=3:b-adapt=0:scenecut=0", "b-cabac"),
    ("bframes=3:ref=4:partitions=all:scenecut=0", "b-multiref-parts"),
    ("bframes=2:direct=temporal:scenecut=0", "b-temporal"),
])
def test_high_inter(params, label):
    frames = _content("pan", 128, 96, 10, seed=5)
    ed, pk = _x264(128, 96, HI + f"qp=24,x264-params={params}", frames)
    _assert_bitexact(ed, pk, f"hi-{label}")


def test_x264_stock_default_ingests():
    """THE op point: x264 with nothing specified at all — High profile,
    CABAC, B-frames with pyramid, 8x8dct, mbtree, adaptive quant.  This
    is byte-for-byte what a stock OBS/ffmpeg publisher sends."""
    frames = _content("cut", 128, 96, 24, seed=7)
    ed, pk = _x264(128, 96, "preset=medium,threads=1,crf=23", frames)
    assert _assert_bitexact(ed, pk, "x264-stock") == 24


def test_high_hostile_bytes_typed():
    frames = _content("pan", 64, 48, 6, seed=9)
    ed, pk = _x264(64, 48, HI + "qp=24,x264-params=bframes=2:scenecut=0",
                   frames)
    rng = np.random.default_rng(41)
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
