"""Pure H.264 intra encoders (av/h264enc.py, av/h264cavlc.py).

Correctness bar: an independent decoder (libavcodec via the shim) must
reproduce the encoder's own reconstruction BIT-EXACTLY — that pins the
transforms, quantization, prediction, and every CAVLC table."""

import numpy as np
import pytest
import jax.numpy as jnp

from mixlab_tpu.av.h264cavlc import (
    CHROMA_DC_COEFF_TOKEN_BITS,
    CHROMA_DC_COEFF_TOKEN_LEN,
    CHROMA_DC_TOTAL_ZEROS_BITS,
    CHROMA_DC_TOTAL_ZEROS_LEN,
    COEFF_TOKEN_BITS,
    COEFF_TOKEN_LEN,
    RUN_BITS,
    RUN_LEN,
    TOTAL_ZEROS_BITS,
    TOTAL_ZEROS_LEN,
    write_cavlc_block,
)
from mixlab_tpu.av.h264enc import BitWriter, PureH264Stream, make_pps, make_sps
from mixlab_tpu.av.sps import parse_sps
from mixlab_tpu.video.frame import Picture, PictureSettings


def _shim_decoder():
    from mixlab_tpu.native import avshim

    if not (avshim.available() and avshim.have_decoder("h264")):
        pytest.skip("no independent H.264 decoder available")
    return avshim


def _pic(yy, uu, vv):
    h, w = yy.shape
    return Picture(
        PictureSettings(w, h),
        {"y": jnp.asarray(yy), "u": jnp.asarray(uu), "v": jnp.asarray(vv)},
    )


def _decode(avshim, annexb):
    dec = avshim.VideoDecoder("h264")
    frames = dec.decode(annexb)
    frames += dec.flush()
    dec.close()
    return frames


def test_sps_parses_with_own_parser():
    sps = make_sps(560, 352)
    info = parse_sps(sps)
    assert (info.width, info.height) == (560, 352)
    assert info.profile_idc == 66


def test_ipcm_lossless_round_trip():
    avshim = _shim_decoder()
    rng = np.random.default_rng(0)
    w, h = 96, 64
    yy = rng.integers(0, 256, (h, w), dtype=np.uint8)
    uu = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    vv = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    enc = PureH264Stream(PictureSettings(w, h), mode="ipcm")
    frames = _decode(avshim, enc.annexb(_pic(yy, uu, vv)))
    assert frames
    _, dy, du, dv = frames[0]
    np.testing.assert_array_equal(dy, yy)
    np.testing.assert_array_equal(du, uu)
    np.testing.assert_array_equal(dv, vv)


@pytest.mark.parametrize("qp,size", [(20, (64, 48)), (30, (112, 80)), (42, (96, 64))])
def test_cavlc_recon_bit_exact_vs_independent_decoder(qp, size):
    avshim = _shim_decoder()
    rng = np.random.default_rng(qp)
    w, h = size
    yy = rng.integers(0, 256, (h, w), dtype=np.uint8)
    uu = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    vv = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    enc = PureH264Stream(PictureSettings(w, h), mode="cavlc", qp=qp)
    au = enc.annexb(_pic(yy, uu, vv))
    assert len(au) < w * h * 3 // 2, "no compression achieved"
    frames = _decode(avshim, au)
    assert frames, "stream did not decode"
    _, dy, du, dv = frames[0]
    ry, ru, rv = enc._cavlc.last_recon
    np.testing.assert_array_equal(dy, ry[:h, :w])
    np.testing.assert_array_equal(du, ru[: h // 2, : w // 2])
    np.testing.assert_array_equal(dv, rv[: h // 2, : w // 2])


def test_cavlc_quality_and_compression_on_smooth_content():
    avshim = _shim_decoder()
    w, h = 128, 96
    yy = (128 + 60 * np.outer(np.sin(np.linspace(0, 6, h)),
                              np.cos(np.linspace(0, 8, w)))).astype(np.uint8)
    uu = np.full((h // 2, w // 2), 100, np.uint8)
    vv = np.full((h // 2, w // 2), 160, np.uint8)
    enc = PureH264Stream(PictureSettings(w, h), mode="cavlc", qp=28)
    au = enc.annexb(_pic(yy, uu, vv))
    assert len(au) < w * h * 3 // 2 // 10, "smooth content should compress >10x"
    frames = _decode(avshim, au)
    _, dy, _, _ = frames[0]
    psnr = 10 * np.log10(255**2 / max(1e-9, np.mean((dy.astype(float) - yy) ** 2)))
    assert psnr > 38.0, f"psnr {psnr}"


def test_stream_interface_emits_avcc_and_dcr():
    from mixlab_tpu.av.avc import DecoderConfigurationRecord

    w, h = 64, 48
    enc = PureH264Stream(PictureSettings(w, h), mode="cavlc", qp=30)
    dcr = DecoderConfigurationRecord.parse(enc.dcr)
    assert dcr.profile_indication == 66 and dcr.nalu_size == 4
    pic = _pic(np.full((h, w), 90, np.uint8),
               np.full((h // 2, w // 2), 128, np.uint8),
               np.full((h // 2, w // 2), 128, np.uint8))
    enc.feed(pic)
    units = enc.poll_access_units()
    assert len(units) == 1
    is_key, avcc = units[0]
    assert is_key
    n = int.from_bytes(avcc[:4], "big")
    assert n == len(avcc) - 4  # one length-prefixed IDR NAL
    assert avcc[4] & 0x1F == 5


# ---------------------------------------------------------------------------
# CAVLC block coding: property round-trip against a from-spec reader
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data):
        self.bits = "".join(f"{b:08b}" for b in data)
        self.pos = 0

    def u(self, n):
        v = int(self.bits[self.pos : self.pos + n] or "0", 2)
        self.pos += n
        return v


def _read_vlc(r, lens, bits):
    for ln in range(1, 17):
        v = int(r.bits[r.pos : r.pos + ln] or "0", 2)
        for idx in range(len(lens)):
            if lens[idx] == ln and bits[idx] == v:
                r.pos += ln
                return idx
    raise ValueError("no VLC match")


def _decode_block(r, nC, max_coeff):
    """Spec 9.2 decoding process (independent reimplementation)."""
    if nC == -1:
        idx = _read_vlc(r, CHROMA_DC_COEFF_TOKEN_LEN[0], CHROMA_DC_COEFF_TOKEN_BITS[0])
    else:
        cls = 0 if nC < 2 else 1 if nC < 4 else 2 if nC < 8 else 3
        idx = _read_vlc(r, COEFF_TOKEN_LEN[cls], COEFF_TOKEN_BITS[cls])
    total, t1s = idx // 4, idx % 4
    out = [0] * max_coeff
    if total == 0:
        return out
    levels = [(-1 if r.u(1) else 1) for _ in range(t1s)]
    suffix_len = 1 if (total > 10 and t1s < 3) else 0
    for i in range(total - t1s):
        lp = 0
        while r.u(1) == 0:
            lp += 1
        if suffix_len == 0:
            lc = lp if lp < 14 else (14 + r.u(4) if lp == 14 else 30 + r.u(12))
        else:
            lc = ((lp << suffix_len) + r.u(suffix_len)) if lp < 15 else (
                (15 << suffix_len) + r.u(12))
        if i == 0 and t1s < 3:
            lc += 2
        levels.append((lc // 2 + 1) if lc % 2 == 0 else -(lc // 2 + 1))
        if suffix_len == 0:
            suffix_len = 1
        if abs(levels[-1]) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    if total < max_coeff:
        if max_coeff == 4:
            tz = _read_vlc(r, CHROMA_DC_TOTAL_ZEROS_LEN[total - 1],
                           CHROMA_DC_TOTAL_ZEROS_BITS[total - 1])
        else:
            tz = _read_vlc(r, TOTAL_ZEROS_LEN[total - 1], TOTAL_ZEROS_BITS[total - 1])
    else:
        tz = 0
    zeros_left = tz
    pos = total + tz - 1
    for i, lev in enumerate(levels):
        out[pos] = lev
        if i == len(levels) - 1:
            break
        if zeros_left > 0:
            tab = min(zeros_left, 7) - 1
            run = _read_vlc(r, RUN_LEN[tab], RUN_BITS[tab])
            zeros_left -= run
        else:
            run = 0
        pos -= 1 + run
    return out


def test_cavlc_block_round_trip_property():
    rng = np.random.default_rng(0)
    for _ in range(800):
        max_coeff = int(rng.choice([16, 15, 4]))
        nC = -1 if max_coeff == 4 else int(rng.choice([0, 1, 2, 3, 5, 9]))
        n = int(rng.integers(0, max_coeff + 1))
        coeffs = [0] * max_coeff
        for i in rng.choice(max_coeff, size=n, replace=False):
            coeffs[i] = int(rng.integers(1, 600)) * (1 if rng.random() < 0.5 else -1)
        w = BitWriter()
        write_cavlc_block(w, coeffs, nC, max_coeff)
        w.align_zero()
        assert _decode_block(_BitReader(w.getvalue()), nC, max_coeff) == coeffs


def test_transform_quant_jax_matches_numpy():
    from mixlab_tpu.av.h264cavlc import forward4x4, quant4x4, transform_quant_jax

    rng = np.random.default_rng(2)
    blocks = rng.integers(-255, 256, (64, 4, 4))
    for qp in (12, 26, 40):
        want = quant4x4(forward4x4(blocks), qp)
        got = np.asarray(transform_quant_jax(blocks, qp))
        np.testing.assert_array_equal(got, want)
