"""Vectorized two-pass H.264 decoder (av/h264dec_fast.py).

Differential suite: the fast decoder must be BIT-EXACT against the
scalar spec-oracle (`av/h264dec._SliceDecoder`) on every stream class
the pure tier emits — the same two-implementation discipline the fast
encoder uses (tests/test_h264cavlc_fast.py).  The scalar path stays
reachable via MIXLAB_PURE_H264_SCALAR=1 so this oracle never rots.
"""

import numpy as np
import pytest

from mixlab_tpu.av.h264dec import BitReader, PureH264Decoder
from mixlab_tpu.av.h264dec import _SliceDecoder as ScalarSliceDecoder
from mixlab_tpu.av.h264dec_fast import FastSliceDecoder
from mixlab_tpu.av.h264enc import PureH264Stream, make_pps, make_sps, nal
from mixlab_tpu.video.frame import Picture, PictureSettings
from tests.test_h264dec import annexb_frame, make_picture


def both_decodes(data):
    """Decode one Annex-B frame with BOTH slice decoders, return planes."""
    from mixlab_tpu.av.h264dec import _Pps, _SpsExt, split_annexb

    outs = []
    for cls in (ScalarSliceDecoder, FastSliceDecoder):
        sps = pps = None
        frames = []
        for unit in split_annexb(data):
            nal_type = unit[0] & 0x1F
            rbsp = unit[1:]
            if nal_type == 7:
                sps = _SpsExt(rbsp)
            elif nal_type == 8:
                pps = _Pps(rbsp)
            elif nal_type in (1, 5):
                sd = cls(sps, pps)
                sd.decode_slice(BitReader(rbsp), nal_type)
                w, h = sps.info.width, sps.info.height
                frames.append(
                    (
                        np.clip(sd.ry, 0, 255).astype(np.uint8)[:h, :w],
                        np.clip(sd.ru, 0, 255).astype(np.uint8)[: h // 2, : w // 2],
                        np.clip(sd.rv, 0, 255).astype(np.uint8)[: h // 2, : w // 2],
                    )
                )
        outs.append(frames)
    return outs


@pytest.mark.parametrize("qp", [10, 22, 34, 46])
@pytest.mark.parametrize("size", [(48, 32), (64, 48), (96, 80)])
def test_fast_matches_scalar(qp, size):
    pic = make_picture(*size, seed=qp + size[0])
    data, _ = annexb_frame(pic, qp)
    scalar, fast = both_decodes(data)
    assert len(scalar) == len(fast) == 1
    for a, b in zip(scalar[0], fast[0]):
        assert np.array_equal(a, b)


def test_fast_matches_scalar_max_entropy():
    """Noise at low qp drives escape codes, long suffixes, full zig-zags."""
    rng = np.random.default_rng(5)
    pic = Picture(
        PictureSettings(64, 64),
        {
            "y": rng.integers(0, 256, (64, 64), dtype=np.uint8),
            "u": rng.integers(0, 256, (32, 32), dtype=np.uint8),
            "v": rng.integers(0, 256, (32, 32), dtype=np.uint8),
        },
    )
    data, _ = annexb_frame(pic, 10)
    scalar, fast = both_decodes(data)
    for a, b in zip(scalar[0], fast[0]):
        assert np.array_equal(a, b)


def test_fast_matches_scalar_flat():
    """All-flat frames: zero-coefficient / skip-run paths."""
    pic = Picture(
        PictureSettings(48, 48),
        {
            "y": np.full((48, 48), 200, np.uint8),
            "u": np.full((24, 24), 90, np.uint8),
            "v": np.full((24, 24), 160, np.uint8),
        },
    )
    data, _ = annexb_frame(pic, 30)
    scalar, fast = both_decodes(data)
    for a, b in zip(scalar[0], fast[0]):
        assert np.array_equal(a, b)


def test_ipcm_stream_via_fast_path():
    """I_PCM macroblocks through the default (fast) decoder are lossless."""
    pic = make_picture(32, 32, seed=2)
    st = PureH264Stream(PictureSettings(32, 32), mode="ipcm")
    st.feed(pic)
    units = st.poll_access_units()
    dec = PureH264Decoder(st.dcr)
    frames = dec.decode(units[0][1])
    _, y, u, v = frames[0]
    assert np.array_equal(y, np.asarray(pic.planes["y"]))
    assert np.array_equal(u, np.asarray(pic.planes["u"]))
    assert np.array_equal(v, np.asarray(pic.planes["v"]))


def test_env_toggle_routes_scalar(monkeypatch):
    """MIXLAB_PURE_H264_SCALAR=1 keeps the scalar oracle reachable."""
    pic = make_picture(32, 32, seed=4)
    data, enc = annexb_frame(pic, 26)
    monkeypatch.setenv("MIXLAB_PURE_H264_SCALAR", "1")
    from mixlab_tpu.av.h264dec import decode_annexb_frame

    y, u, v = decode_annexb_frame(data)
    assert np.array_equal(y, enc.last_recon[0][:32, :32])
