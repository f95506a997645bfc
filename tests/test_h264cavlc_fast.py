"""Vectorized CAVLC encoder (av/h264cavlc_fast.py): byte-for-byte equal to
the scalar reference implementation (which is itself validated against
libavcodec decode in test_h264enc.py), across qps, content, and geometry."""

import numpy as np
import pytest

import jax.numpy as jnp

from mixlab_tpu.av.h264cavlc import CavlcIntraEncoder
from mixlab_tpu.av.h264cavlc_fast import FastCavlcIntraEncoder, _cavlc_batch
from mixlab_tpu.video.frame import Picture, PictureSettings


def _pic(y, u, v):
    h, w = y.shape
    return Picture(PictureSettings(w, h),
                   {"y": jnp.asarray(y), "u": jnp.asarray(u),
                    "v": jnp.asarray(v)})


def _make(w, h, kind, rng):
    if kind == "noise":
        return _pic(rng.integers(0, 256, (h, w)).astype(np.uint8),
                    rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
                    rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8))
    if kind == "flat":
        f = np.full((h, w), 128, np.uint8)
        c = np.full((h // 2, w // 2), 128, np.uint8)
        return _pic(f, c, c.copy())
    if kind == "grad":
        y = (np.add.outer(np.arange(h), np.arange(w)) % 256).astype(np.uint8)
        u = (np.add.outer(np.arange(h // 2) * 2,
                          np.arange(w // 2)) % 256).astype(np.uint8)
        return _pic(y, u, 255 - u)
    y = (np.kron(rng.integers(0, 2, (h // 8, w // 8)),
                 np.ones((8, 8))) * 255).astype(np.uint8)
    u = (np.kron(rng.integers(0, 2, (h // 16, w // 16)),
                 np.ones((8, 8))) * 255).astype(np.uint8)
    return _pic(y, u, np.roll(u, 3, axis=1))


@pytest.mark.parametrize("kind", ["noise", "flat", "grad", "edges"])
@pytest.mark.parametrize("qp", [10, 26, 30, 48])
def test_bitexact_vs_scalar(kind, qp):
    rng = np.random.default_rng(hash((kind, qp)) % (1 << 31))
    for (w, h) in ((16, 16), (48, 32), (112, 64)):
        pic = _make(w, h, kind, rng)
        ref = CavlcIntraEncoder(qp).encode_frame(pic)
        got = FastCavlcIntraEncoder(qp).encode_frame(pic)
        assert ref == got, (kind, qp, w, h)


def test_bitexact_monitor_size_and_recon():
    rng = np.random.default_rng(7)
    pic = _make(560, 352, "grad", rng)
    s = CavlcIntraEncoder(30)
    f = FastCavlcIntraEncoder(30)
    assert s.encode_frame(pic) == f.encode_frame(pic)
    # the decoder-exact reconstruction matches too
    for a, b in zip(s.last_recon, f.last_recon):
        assert np.array_equal(a, b)


def test_bitexact_fuzz_seeds():
    # randomized sweep: odd geometries (MB padding) and random qps
    for seed in range(6):
        rng = np.random.default_rng(seed)
        w = int(rng.integers(1, 6)) * 16
        h = int(rng.integers(1, 6)) * 16
        qp = int(rng.integers(10, 49))
        pic = _make(w, h, "noise", rng)
        assert (CavlcIntraEncoder(qp).encode_frame(pic)
                == FastCavlcIntraEncoder(qp).encode_frame(pic)), (seed, qp)


def test_cavlc_batch_empty_and_single():
    v, n, total = _cavlc_batch(np.zeros((0, 15), np.int64),
                               np.zeros(0, np.int64), 15)
    assert v.shape == (0, 36) and len(total) == 0
    # a single all-zero block: just the coeff_token, nothing else
    v, n, total = _cavlc_batch(np.zeros((1, 15), np.int64),
                               np.zeros(1, np.int64), 15)
    assert total[0] == 0
    assert n[0, 0] > 0 and (n[0, 1:] == 0).all()


def _native_encoder(qp):
    from mixlab_tpu.av.h264cavlc_fast import NativeCavlcIntraEncoder

    try:
        return NativeCavlcIntraEncoder(qp)
    except RuntimeError:
        pytest.skip("native library unavailable")


@pytest.mark.parametrize("kind", ["noise", "flat", "grad", "edges"])
@pytest.mark.parametrize("qp", [10, 26, 30, 48])
def test_native_bitexact_vs_fast(kind, qp):
    """The C++ full-frame encoder is byte-identical to the numpy encoder
    (itself byte-identical to the scalar oracle) across qps/content/size."""
    rng = np.random.default_rng(hash((kind, qp, "native")) % (1 << 31))
    for (w, h) in ((16, 16), (48, 32), (112, 64)):
        pic = _make(w, h, kind, rng)
        ref = FastCavlcIntraEncoder(qp).encode_frame(pic)
        got = _native_encoder(qp).encode_frame(pic)
        assert ref == got, (kind, qp, w, h)


def test_native_bitexact_fuzz_and_recon():
    # randomized geometries incl. non-multiple-of-16 (MB edge padding)
    for seed in range(8):
        rng = np.random.default_rng(1000 + seed)
        w = int(rng.integers(17, 97))
        h = int(rng.integers(17, 97))
        qp = int(rng.integers(10, 49))
        pic = _make(w - w % 2, h - h % 2, "noise", rng)
        f = FastCavlcIntraEncoder(qp)
        n = _native_encoder(qp)
        assert f.encode_frame(pic) == n.encode_frame(pic), (seed, qp, w, h)
        for a, b in zip(f.last_recon, n.last_recon):
            assert np.array_equal(a, b), (seed, qp)


def test_make_cavlc_encoder_is_bit_exact_tier():
    """The factory returns a working encoder whichever tier is available."""
    from mixlab_tpu.av.h264cavlc_fast import make_cavlc_encoder

    rng = np.random.default_rng(5)
    pic = _make(48, 32, "grad", rng)
    enc = make_cavlc_encoder(30)
    assert enc.encode_frame(pic) == FastCavlcIntraEncoder(30).encode_frame(pic)


def test_fast_encoder_through_stream_decodes_independently(tmp_path):
    """PureH264Stream (now on the fast encoder) still decodes in an
    independent decoder with the exact recon."""
    from mixlab_tpu.av.h264enc import PureH264Stream
    from mixlab_tpu.native import avshim

    if not avshim.available() or not avshim.have_decoder("h264"):
        pytest.skip("avshim h264 decoder unavailable")
    rng = np.random.default_rng(3)
    pic = _make(112, 64, "grad", rng)
    st = PureH264Stream(PictureSettings(112, 64), mode="cavlc", qp=26)
    annexb = st.annexb(pic)
    dec = avshim.VideoDecoder("h264")
    frames = dec.decode(annexb) + dec.flush()
    dec.close()
    assert frames, "independent decoder produced no frames"
    _, y, u, v = frames[0]
    ry, ru, rv = st._cavlc.last_recon
    assert np.array_equal(y, ry)
    assert np.array_equal(u, ru)
    assert np.array_equal(v, rv)
