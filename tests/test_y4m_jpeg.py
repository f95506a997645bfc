"""Pure Y4M reader and baseline JPEG decoder (av/y4m.py, av/jpeg.py) —
the zero-dependency media_source video tier — validated against
libavformat/libavcodec where available."""

import io

import numpy as np
import pytest

from mixlab_tpu.av.jpeg import JpegError, decode_jpeg, is_jpeg
from mixlab_tpu.av.y4m import Y4mError, Y4mReader, parse_header, write_y4m


def _planes(w, h, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    return y, u, v


# ---------------------------------------------------------------------------
# Y4M
# ---------------------------------------------------------------------------


def test_y4m_header_parse():
    info = parse_header(b"YUV4MPEG2 W320 H240 F30000:1001 Ip A1:1 C420jpeg\n")
    assert (info.width, info.height) == (320, 240)
    assert info.fps.numerator == 30000 and info.fps.denominator == 1001
    assert info.colorspace == "420"
    with pytest.raises(Y4mError):
        parse_header(b"RIFFxxxx")
    with pytest.raises(Y4mError):
        parse_header(b"YUV4MPEG2 W31 H24 C420\n")  # odd width


def test_y4m_write_read_roundtrip():
    frames = [_planes(64, 48, s) for s in range(5)]
    blob = write_y4m(frames)
    r = Y4mReader(io.BytesIO(blob))
    assert (r.info.width, r.info.height) == (64, 48)
    for want in frames:
        got = r.read_frame()
        for a, b in zip(got, want):
            assert np.array_equal(a, b)
    assert r.read_frame() is None
    r.rewind()
    again = r.read_frame()
    assert np.array_equal(again[0], frames[0][0])


def test_y4m_422_and_444_downsample_to_420():
    w, h = 16, 8
    y = np.arange(w * h, dtype=np.uint8).reshape(h, w)
    # 4:2:2: chroma [h, w/2]
    u422 = np.arange(h * w // 2, dtype=np.uint8).reshape(h, w // 2)
    blob = (b"YUV4MPEG2 W16 H8 F30:1 C422\nFRAME\n"
            + y.tobytes() + u422.tobytes() + u422.tobytes())
    got = Y4mReader(io.BytesIO(blob)).read_frame()
    assert got[1].shape == (h // 2, w // 2)
    want = ((u422[0::2].astype(int) + u422[1::2] + 1) // 2)
    assert np.array_equal(got[1], want.astype(np.uint8))
    # 4:4:4: chroma [h, w]
    u444 = np.arange(h * w, dtype=np.uint8).reshape(h, w)
    blob = (b"YUV4MPEG2 W16 H8 F30:1 C444\nFRAME\n"
            + y.tobytes() + u444.tobytes() + u444.tobytes())
    got = Y4mReader(io.BytesIO(blob)).read_frame()
    assert got[1].shape == (h // 2, w // 2)


def test_y4m_read_by_independent_demuxer(tmp_path):
    """Our writer's output demuxes bit-exactly in libavformat."""
    from mixlab_tpu.native import avshim

    if not avshim.available():
        pytest.skip("avshim unavailable")
    frames = [_planes(96, 64, s) for s in range(4)]
    path = tmp_path / "t.y4m"
    path.write_bytes(write_y4m(frames))
    r = avshim.MediaReader(str(path))
    assert r.video and r.video["width"] == 96
    k = 0
    while (item := r.read()) is not None:
        if item[0] != "video":
            continue
        _, _, (y, u, v) = item
        assert np.array_equal(y, frames[k][0])
        assert np.array_equal(u, frames[k][1])
        assert np.array_equal(v, frames[k][2])
        k += 1
    r.close()
    assert k == 4


# ---------------------------------------------------------------------------
# JPEG
# ---------------------------------------------------------------------------


def _encode_jpeg(y, u, v, q=2):
    from mixlab_tpu.native import avshim

    if not avshim.available() or not avshim.have_decoder("mjpeg"):
        pytest.skip("avshim mjpeg unavailable")
    h, w = y.shape
    enc = avshim.VideoEncoder(w, h, 10, codec="mjpeg",
                              opts=f"strict=unofficial,qmin={q},qmax={q}")
    enc.send(y, u, v, 0)
    pkts = enc.receive()
    enc.close()
    assert pkts, "mjpeg encoder produced nothing"
    return bytes(pkts[0][3])


@pytest.mark.parametrize("size", [(320, 240), (112, 80), (48, 32)])
def test_jpeg_matches_libavcodec(size):
    w, h = size
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((np.sin(xx / 17) + np.cos(yy / 11)) * 60 + 128).astype(np.uint8)
    u = ((np.sin(xx[::2, ::2] / 23)) * 50 + 128).astype(np.uint8)
    v = ((np.cos(yy[::2, ::2] / 29)) * 50 + 128).astype(np.uint8)
    data = _encode_jpeg(y, u, v)
    assert is_jpeg(data)
    dy, du, dv = decode_jpeg(data)

    from mixlab_tpu.native import avshim

    dec = avshim.VideoDecoder("mjpeg")
    frames = dec.decode(data) + dec.flush()
    dec.close()
    _, ry, ru, rv = frames[0]
    for a, b in ((dy, ry), (du, ru), (dv, rv)):
        assert a.shape == b.shape
        err = np.abs(a.astype(int) - b.astype(int))
        assert err.max() <= 1  # IDCT rounding only
        assert err.mean() < 0.05


def test_jpeg_noise_and_quality_sweep():
    rng = np.random.default_rng(1)
    y = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    u = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    v = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    from mixlab_tpu.native import avshim

    for q in (2, 8, 20):
        data = _encode_jpeg(y, u, v, q=q)
        dy, du, dv = decode_jpeg(data)
        dec = avshim.VideoDecoder("mjpeg")
        frames = dec.decode(data) + dec.flush()
        dec.close()
        _, ry, _, _ = frames[0]
        assert np.abs(dy.astype(int) - ry.astype(int)).max() <= 1


def test_jpeg_rejects_progressive_and_garbage():
    with pytest.raises(JpegError):
        decode_jpeg(b"\x00\x01\x02")
    # progressive SOF2 marker refused explicitly
    fake = (b"\xff\xd8" + b"\xff\xc2" + b"\x00\x0b" + b"\x08"
            + b"\x00\x10\x00\x10" + b"\x01" + b"\x01\x11\x00")
    with pytest.raises(JpegError):
        decode_jpeg(fake + b"\xff\xd9")


def test_media_player_jpeg_still(tmp_path):
    """A JPEG upload plays as a 10 fps still-video source (pure tier)."""
    import queue
    import time

    from mixlab_tpu.engine.config import EngineConfig
    from mixlab_tpu.engine.feeds import MediaSourceFeed
    from mixlab_tpu.engine.media_player import MediaPlayer
    from mixlab_tpu.engine.project import open_or_create

    y = np.full((64, 96), 200, np.uint8)
    u = np.full((32, 48), 100, np.uint8)
    v = np.full((32, 48), 60, np.uint8)
    data = _encode_jpeg(y, u, v)

    cfg = EngineConfig(sample_rate=44_100)
    proj = open_or_create(tmp_path / "still.mixlab", cfg)
    media_id = proj.upload_media("photo.jpg", "image/jpeg", [data])
    stream = proj.base.open_media(media_id)
    feed = MediaSourceFeed(cfg)
    player = MediaPlayer(stream, feed, cfg)
    player.start()
    try:
        pts, frame = feed.video_q.get(timeout=10)
        assert frame is not None, "no video frame from jpeg still"
        yp = np.asarray(frame.picture.planes["y"])
        assert yp.shape == (64, 96)
        assert abs(float(yp.mean()) - 200) < 3
    finally:
        player.stop()
        player.join(timeout=5)
        proj.engine.stop()
        proj.close()


def test_y4m_rejects_high_bit_depth_variants():
    for cs in (b"420p10", b"444p16", b"444alpha", b"mono"):
        with pytest.raises(Y4mError):
            parse_header(b"YUV4MPEG2 W16 H8 F30:1 C" + cs + b"\n")


def test_jpeg_undefined_tables_raise_jpegerror():
    # valid-looking SOF+SOS but the scan references Huffman table 3,
    # which is never defined -> JpegError, not KeyError
    import struct as _s

    def seg(marker, payload):
        return bytes([0xFF, marker]) + _s.pack(">H", len(payload) + 2) + payload

    dqt = seg(0xDB, b"\x00" + bytes(64))
    sof = seg(0xC0, b"\x08" + _s.pack(">HH", 8, 8) + b"\x01" + b"\x01\x11\x00")
    sos = seg(0xDA, b"\x01" + b"\x01\x33" + b"\x00\x3f\x00")
    blob = b"\xff\xd8" + dqt + sof + sos + b"\x00\x00" + b"\xff\xd9"
    with pytest.raises(JpegError):
        decode_jpeg(blob)


def _pil_jpeg(rgb, **kw):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "JPEG", **kw)
    return buf.getvalue()


def _pil_ycbcr(data):
    """Pillow's native-YCbCr decode (draft mode: no RGB round trip)."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(data))
    img.draft("YCbCr", img.size)
    assert img.mode == "YCbCr"
    return np.asarray(img, np.uint8)


def _test_rgb(w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[..., 0] = (xx * 3) % 256
    rgb[..., 1] = (yy * 5) % 256
    rgb[..., 2] = ((xx + yy) * 2) % 256
    return (rgb.astype(int) + rng.integers(-15, 15, rgb.shape)).clip(
        0, 255).astype(np.uint8)


@pytest.mark.parametrize("w,h,quality,subsampling", [
    (96, 64, 85, 2),    # 4:2:0
    (120, 80, 60, 0),   # 4:4:4
    (57, 43, 92, 1),    # 4:2:2, odd dims (MCU padding)
    (320, 200, 40, 2),  # many EOB-run-covered blocks
    (128, 96, 95, 0),   # near-lossless: exercises AC refinement density
])
def test_progressive_jpeg_matches_pillow(w, h, quality, subsampling):
    """Progressive (SOF2) decode: all four Annex-G scan classes, within
    1 LSB of Pillow's libjpeg decoding the same bytes in native YCbCr."""
    pytest.importorskip("PIL")
    rgb = _test_rgb(w, h, seed=quality)
    data = _pil_jpeg(rgb, quality=quality, progressive=True,
                     subsampling=subsampling)
    y, u, v = decode_jpeg(data)
    ycc = _pil_ycbcr(data)
    dy = np.abs(y[:h, :w].astype(int) - ycc[..., 0].astype(int))
    assert dy.max() <= 1, dy.max()
    # strongest check: libjpeg emits IDENTICAL quantized coefficients for
    # progressive and baseline at the same settings — the progressive scan
    # classes must reconstruct the exact same planes as the (independently
    # libavcodec-validated) baseline path
    base = _pil_jpeg(rgb, quality=quality, progressive=False,
                     subsampling=subsampling)
    yb, ub, vb = decode_jpeg(base)
    assert np.array_equal(y, yb)
    assert np.array_equal(u, ub)
    assert np.array_equal(v, vb)


def test_progressive_jpeg_grayscale_and_restarts():
    pytest.importorskip("PIL")
    rgb = _test_rgb(88, 72, seed=7)
    gray = rgb[..., 0]
    data = _pil_jpeg(gray, quality=80, progressive=True)
    y, u, v = decode_jpeg(data)
    ycc = _pil_ycbcr(data) if False else None
    import io

    from PIL import Image

    ref = np.asarray(Image.open(io.BytesIO(data)).convert("L"), np.uint8)
    assert np.abs(y[:72, :88].astype(int) - ref.astype(int)).max() <= 1
    assert (u == 128).all() and (v == 128).all()

    # restart markers inside a progressive scan
    data = _pil_jpeg(_test_rgb(96, 64, seed=9), quality=75, progressive=True,
                     restart_marker_rows=1)
    if b"\xff\xdd" in data:  # DRI present: the restart path is live
        y2, _, _ = decode_jpeg(data)
        ycc = _pil_ycbcr(data)
        assert np.abs(y2[:64, :96].astype(int)
                      - ycc[..., 0].astype(int)).max() <= 1


def test_baseline_jpeg_still_matches_pillow():
    """Regression: the unified scan decoder reproduces baseline exactly as
    before (sequential = one DC+AC scan)."""
    pytest.importorskip("PIL")
    rgb = _test_rgb(96, 64, seed=3)
    data = _pil_jpeg(rgb, quality=85, progressive=False, subsampling=2)
    y, _, _ = decode_jpeg(data)
    ycc = _pil_ycbcr(data)
    assert np.abs(y[:64, :96].astype(int)
                  - ycc[..., 0].astype(int)).max() <= 1
