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


def test_native_parse_matches_python_parse(monkeypatch):
    """The C++ pass 1 + recon (mixlab_native h264_parse_slice/h264_dc_recon)
    and the pure-Python fast path must be bit-identical; the env toggle
    keeps the Python twin reachable so this differential never rots."""
    from mixlab_tpu import native
    from mixlab_tpu.av.h264dec import decode_annexb_frame

    if not native.available():
        pytest.skip("native library unavailable")
    for qp, size, seed in ((14, (48, 32), 1), (30, (96, 80), 2),
                           (42, (64, 64), 3)):
        pic = make_picture(*size, seed=seed)
        data, _ = annexb_frame(pic, qp)
        monkeypatch.setenv("MIXLAB_PURE_H264_PYPARSE", "1")
        py = decode_annexb_frame(data)
        monkeypatch.delenv("MIXLAB_PURE_H264_PYPARSE")
        nat = decode_annexb_frame(data)
        for a, b in zip(py, nat):
            assert np.array_equal(a, b)


def test_native_parse_fuzz_typed_errors():
    """Byte mutations of a valid stream must either decode or raise the
    decoder's typed error — never crash or read out of bounds (the C++
    parser's bounds discipline)."""
    from mixlab_tpu.av.h264dec import H264DecodeError, decode_annexb_frame

    pic = make_picture(48, 32, seed=9)
    data, _ = annexb_frame(pic, 24)
    rng = np.random.default_rng(0)
    buf = bytearray(data)
    for _ in range(300):
        i = int(rng.integers(0, len(buf)))
        old = buf[i]
        buf[i] = int(rng.integers(0, 256))
        try:
            decode_annexb_frame(bytes(buf))
        except H264DecodeError:
            pass
        except ValueError:
            pass  # SPS/DCR-level rejects
        buf[i] = old
    # truncations of the slice payload
    for cut in range(1, min(len(data), 200)):
        try:
            decode_annexb_frame(data[:-cut])
        except (H264DecodeError, ValueError):
            pass
