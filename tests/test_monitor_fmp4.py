"""Monitor fmp4 pipeline with injected mock encoders (no ffmpeg needed)."""

import queue
import struct

import numpy as np

from mixlab_tpu.av import aac, avc
from mixlab_tpu.engine.config import EngineConfig
from mixlab_tpu.engine.engine import _MonitorPipe
from mixlab_tpu.server.monitor import MonitorPipeline
from mixlab_tpu.video.frame import Picture

CFG = EngineConfig(sample_rate=44_100)


class MockAac:
    def __init__(self):
        self.fed = 0
        self.asc = aac.AudioSpecificConfiguration.lc_stereo(44100)

    def feed(self, pcm):
        self.fed += len(pcm)

    def poll_frames(self):
        # one synthetic ADTS frame per poll once fed
        if self.fed >= 2048:
            self.fed -= 2048
            return [aac.adts_frame(b"\xde\xad", self.asc)]
        return []


class MockH264:
    def __init__(self):
        self.dcr = avc.DecoderConfigurationRecord(
            1, 0x64, 0, 0x1F, 4,
            [avc.NalUnit(3, avc.UnitType.SEQUENCE_PARAMETER_SET, b"\x64\x00\x1f")],
            [avc.NalUnit(3, avc.UnitType.PICTURE_PARAMETER_SET, b"\xee")],
        ).to_bytes()
        self._pending = []

    def feed(self, pic):
        idr = avc.NalUnit(3, avc.UnitType.IDR_PICTURE, b"\x88" * 8)
        self._pending.append((True, avc.write_nal_units([idr])))

    def poll_access_units(self):
        out, self._pending = self._pending, []
        return out


def test_fmp4_monitor_emits_init_then_segments():
    pipe = _MonitorPipe()
    pipeline = MonitorPipeline(pipe, CFG, mode="fmp4", encoders=(MockAac(), MockH264()))
    sub = pipeline.broadcast.subscribe()

    spt = CFG.samples_per_tick
    audio = np.zeros((spt, 2), dtype=np.float32)
    packets = []
    for k in range(12):
        pipeline._encode_tick_fmp4(k * spt, audio, None)
    while True:
        try:
            packets.append(sub.get_nowait())
        except queue.Empty:
            break
    pipeline.stop()

    assert packets, "no packets emitted"
    # the init segment is ready at construction (DCR known up front) and is
    # delivered to subscribers by the WS handler via broadcast.init_packet
    header, _, init_payload = pipeline.broadcast.init_packet.partition(b"\n")
    assert b'"fmp4"' in header
    assert init_payload[4:8] == b"ftyp"
    # broadcast packets are moof/mdat media segments
    segs = [p for p in packets if b'"segment"' in p.partition(b"\n")[0]]
    assert segs, "no media segments"
    for s in segs:
        _, _, payload = s.partition(b"\n")
        assert payload[4:8] == b"moof"
        (moof_size,) = struct.unpack_from(">I", payload, 0)
        assert payload[moof_size + 4 : moof_size + 8] == b"mdat"


def _real_codecs():
    from mixlab_tpu.av.codecs import avshim_codecs_available

    return avshim_codecs_available()


def test_fmp4_monitor_real_codecs_validated_by_independent_demuxer(tmp_path):
    """No mocks: real AAC (libavcodec) + real H.264 (libx264) through the
    from-scratch fMP4 mux; the saved stream is then decoded by an
    independent demuxer (OpenCV's libavformat) and the video content
    verified.  This is the reference's monitor path end-to-end
    (monitor.rs:185-251 + mux/src/mp4.rs:236-287)."""
    import pytest

    if not _real_codecs():
        pytest.skip("avshim codecs unavailable")
    import jax.numpy as jnp

    from mixlab_tpu.video.frame import PictureSettings, VideoFrame
    from mixlab_tpu.av.codecs import MONITOR_PICTURE

    pipe = _MonitorPipe()
    pipeline = MonitorPipeline(pipe, CFG, mode="fmp4")
    sub = pipeline.broadcast.subscribe()

    spt = CFG.samples_per_tick
    t = np.arange(spt) / CFG.sample_rate
    # bright half / dark half test pattern at monitor resolution
    w, h = MONITOR_PICTURE.width, MONITOR_PICTURE.height
    y_plane = np.zeros((h, w), np.uint8)
    y_plane[:, : w // 2] = 200
    pic = Picture(
        PictureSettings(w, h),
        {"y": jnp.asarray(y_plane),
         "u": jnp.full((h // 2, w // 2), 128, jnp.uint8),
         "v": jnp.full((h // 2, w // 2), 128, jnp.uint8)},
    )
    frame = VideoFrame(picture=pic)
    for k in range(60):
        tone = np.sin(2 * np.pi * 440 * (t + k * spt / CFG.sample_rate))
        audio = np.stack([tone, tone], -1).astype(np.float32) * 0.5
        pipeline._encode_tick_fmp4(k * spt, audio, frame)

    packets = []
    while True:
        try:
            packets.append(sub.get_nowait())
        except queue.Empty:
            break
    pipeline.stop()

    init_pkt = pipeline.broadcast.init_packet
    assert b'"fmp4"' in init_pkt.partition(b"\n")[0]
    header = init_pkt.partition(b"\n")[0].decode()
    assert "avc1." in header and "mp4a.40.2" in header

    # save init + all media segments as one fragmented MP4
    blob = init_pkt.partition(b"\n")[2] + b"".join(
        p.partition(b"\n")[2] for p in packets
        if b'"segment"' in p.partition(b"\n")[0])
    out = tmp_path / "monitor.mp4"
    out.write_bytes(blob)

    import cv2

    cap = cv2.VideoCapture(str(out))
    ok, bgr = cap.read()
    assert ok, "independent demuxer could not decode the monitor stream"
    assert bgr.shape == (h, w, 3)
    # left half bright, right half dark
    left = bgr[:, : w // 2].mean()
    right = bgr[:, w // 2 :].mean()
    assert left > 150 and right < 50, (left, right)
    n_frames = 1
    while cap.read()[0]:
        n_frames += 1
    assert n_frames >= 5


def test_fmp4_monitor_pure_tier_zero_dependency(tmp_path, monkeypatch):
    """The zero-dependency tier: pure CAVLC intra H.264 (av/h264cavlc.py) +
    pure FLAC (av/flacenc.py) through the from-scratch fMP4 mux, with the
    tier forced to "pure" (as on an image with no codec libraries at all).
    The stream is then demuxed+decoded by an independent stack (libavformat/
    libavcodec via MediaReader): video content and lossless-ish audio are
    verified.  Closes the 'monitor falls back to pcm+png' gap."""
    import pytest

    from mixlab_tpu.native import avshim

    if not avshim.available():
        pytest.skip("avshim unavailable (needed only to VERIFY the stream)")

    import mixlab_tpu.server.monitor as monitor_mod
    import mixlab_tpu.av.codecs as codecs_mod

    monkeypatch.setattr(codecs_mod, "codec_tier", lambda: "pure")
    monkeypatch.setenv("MIXLAB_PURE_AUDIO", "flac")  # AAC is the default
    import jax.numpy as jnp

    from mixlab_tpu.av.codecs import MONITOR_PICTURE
    from mixlab_tpu.video.frame import PictureSettings, VideoFrame

    pipe = _MonitorPipe()
    pipeline = MonitorPipeline(pipe, CFG, mode="fmp4")
    pipeline._ensure_codecs()  # codec setup is deferred off the engine thread
    from mixlab_tpu.av.flacenc import PureFlacStream
    from mixlab_tpu.av.h264enc import PureH264Stream

    assert isinstance(pipeline._aac, PureFlacStream)
    assert isinstance(pipeline._h264, PureH264Stream)
    sub = pipeline.broadcast.subscribe()

    spt = CFG.samples_per_tick
    t = np.arange(spt) / CFG.sample_rate
    w, h = MONITOR_PICTURE.width, MONITOR_PICTURE.height
    y_plane = np.zeros((h, w), np.uint8)
    y_plane[:, : w // 2] = 200
    pic = Picture(
        PictureSettings(w, h),
        {"y": jnp.asarray(y_plane),
         "u": jnp.full((h // 2, w // 2), 128, jnp.uint8),
         "v": jnp.full((h // 2, w // 2), 128, jnp.uint8)},
    )
    frame = VideoFrame(picture=pic)
    sent_audio = []
    for k in range(30):
        tone = np.sin(2 * np.pi * 440 * (t + k * spt / CFG.sample_rate))
        audio = np.stack([tone, tone], -1).astype(np.float32) * 0.5
        sent_audio.append(audio)
        pipeline._encode_tick_fmp4(k * spt, audio, frame)

    packets = []
    while True:
        try:
            packets.append(sub.get_nowait())
        except queue.Empty:
            break
    pipeline.stop()

    assert packets, "no packets emitted"
    init_pkt = pipeline.broadcast.init_packet
    header = init_pkt.partition(b"\n")[0].decode()
    assert '"fmp4"' in header and "avc1." in header and "flac" in header

    blob = init_pkt.partition(b"\n")[2] + b"".join(
        p.partition(b"\n")[2] for p in packets
        if b'"segment"' in p.partition(b"\n")[0])
    out = tmp_path / "monitor_pure.mp4"
    out.write_bytes(blob)

    r = avshim.MediaReader(str(out))
    assert r.audio and r.audio["channels"] == 2
    assert r.video and r.video["width"] == w and r.video["height"] == h
    pcm, frames = [], []
    while True:
        item = r.read()
        if item is None:
            break
        if item[0] == "audio":
            pcm.append(item[2])
        else:
            frames.append(item[2])
    r.close()

    assert frames, "no video frames decoded from the pure-tier stream"
    y, u, v = frames[0]
    left, right = y[:, : w // 2].mean(), y[:, w // 2 :].mean()
    assert left > 150 and right < 60, (left, right)

    got = np.concatenate(pcm).astype(np.float32) / 32767.0
    want = np.concatenate(sent_audio)[: len(got)]
    # FLAC is lossless; the only error is the f32 -> i16 quantization
    assert got.shape[0] >= 20 * spt
    assert np.max(np.abs(got - want[: len(got)])) < 2.0 / 32767.0


def test_codec_tier_env_override(monkeypatch):
    """MIXLAB_CODEC_TIER forces the tier; naming an unavailable tier raises
    instead of silently auto-selecting."""
    import pytest

    from mixlab_tpu.av import codecs

    monkeypatch.setenv("MIXLAB_CODEC_TIER", "pure")
    assert codecs.codec_tier() == "pure"
    monkeypatch.setenv("MIXLAB_CODEC_TIER", "bogus")
    with pytest.raises(ValueError):
        codecs.codec_tier()
    monkeypatch.setenv("MIXLAB_CODEC_TIER", "ffmpeg")
    if not codecs.ffmpeg_available():
        with pytest.raises(RuntimeError):
            codecs.codec_tier()
    monkeypatch.delenv("MIXLAB_CODEC_TIER")
    assert codecs.codec_tier() in ("shim", "ffmpeg", "pure")
