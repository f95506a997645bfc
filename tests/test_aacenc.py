"""Round-trip tests for the pure AAC-LC encoder (av/aacenc.py).

Two independent decoders pin the bitstreams: libavcodec opened STRICT
(any bitstream error fails the decode) and our own av/aacdec.py — the
encoder shares nothing with either beyond the constant tables, so
agreement of all three is a strong cross-check of each.
"""

import numpy as np
import pytest

from mixlab_tpu.av.aac import adts_frame
from mixlab_tpu.av.aacdec import AacLcDecoder
from mixlab_tpu.av.aacenc import AacEncodeError, AacLcEncoder

pytestmark = pytest.mark.filterwarnings("ignore")


def _shim():
    from mixlab_tpu.native import avshim

    if not avshim.available():
        pytest.skip("libavcodec shim unavailable (oracle)")
    return avshim


def _encode_all(sig, rate=44100, ch=2, quality=60):
    enc = AacLcEncoder(rate, ch, quality=quality)
    frames = []
    for k in range(0, len(sig) - 1024, 1024):
        frames.append(adts_frame(enc.encode_granule(sig[k:k + 1024]), enc.asc))
    return frames


def _roundtrip(sig, rate=44100, ch=2, quality=60):
    """(kbps, SNR dB via libav decode, max |libav - ours|)."""
    avshim = _shim()
    frames = _encode_all(sig, rate, ch, quality)
    kbps = sum(len(f) - 7 for f in frames) * 8 / (len(frames) * 1024 / rate) / 1000
    ref = avshim.AudioDecoder("aac", strict=True)
    out_ref = []
    for f in frames:
        out_ref += [o[1] for o in ref.decode_flt(f)]
    ref.close()
    ref_pcm = np.concatenate(out_ref)
    ours = AacLcDecoder()
    out_my = np.concatenate([ours.decode_adts(f)[0] for f in frames])
    d = float(np.max(np.abs(ref_pcm - out_my[: len(ref_pcm)])))
    ref_al = ref_pcm[1024: 1024 + len(sig) - 4096]  # 1024-sample enc latency
    src = np.asarray(sig[: len(ref_al)], dtype=np.float64).reshape(len(ref_al), -1)
    err = ref_al - src
    snr = 10 * np.log10(np.sum(src ** 2) / max(np.sum(err ** 2), 1e-12))
    return kbps, float(snr), d


def _tones(rate, seconds=2.0):
    t = np.arange(int(rate * seconds))
    return np.stack([np.sin(2 * np.pi * 440 * t / rate) * 0.6,
                     np.sin(2 * np.pi * 554 * t / rate) * 0.4], 1)


def test_stereo_tones_roundtrip():
    kbps, snr, d = _roundtrip(_tones(44100))
    assert snr > 33.0, snr          # clean reconstruction through libav
    assert d < 1e-6, d              # our decoder == libav on our streams
    assert kbps < 80.0, kbps        # sparse spectrum stays cheap


def test_dense_content_roundtrip():
    rate = 44100
    t = np.arange(rate * 2)
    rng = np.random.default_rng(0)
    sig = np.stack([
        np.sin(2 * np.pi * (220 + 110 * np.sin(2 * np.pi * 0.5 * t / rate))
               * t / rate) * 0.4 + rng.standard_normal(len(t)) * 0.02,
        np.sin(2 * np.pi * 330 * t / rate) * 0.3
        + rng.standard_normal(len(t)) * 0.02,
    ], 1)
    kbps, snr, d = _roundtrip(sig)
    assert snr > 25.0, snr
    assert d < 1e-6, d


def test_mono_roundtrip():
    kbps, snr, d = _roundtrip(_tones(44100)[:, :1] * 0.8, ch=1)
    assert snr > 33.0 and d < 1e-6


@pytest.mark.parametrize("rate", [48000, 22050, 8000])
def test_rates_roundtrip(rate):
    kbps, snr, d = _roundtrip(_tones(rate, 1.0), rate=rate)
    assert snr > 30.0, (rate, snr)
    assert d < 1e-6


def test_quality_knob_trades_rate_for_snr():
    k1, s1, _ = _roundtrip(_tones(44100, 1.0), quality=20)
    k2, s2, _ = _roundtrip(_tones(44100, 1.0), quality=300)
    assert k2 > k1 and s2 > s1 + 6.0


def test_loud_content_uses_escapes():
    """Full-scale broadband content exercises codebook 11 + escapes."""
    rate = 44100
    rng = np.random.default_rng(3)
    sig = np.clip(rng.standard_normal((rate, 2)) * 0.5, -1, 1)
    kbps, snr, d = _roundtrip(sig, quality=900)
    assert snr > 35.0, snr
    assert d < 1e-6


def test_silence_is_cheap_and_valid():
    sig = np.zeros((44100, 2))
    frames = _encode_all(sig)
    avshim = _shim()
    ref = avshim.AudioDecoder("aac", strict=True)
    for f in frames:
        for _pts, pcm, _r in ref.decode_flt(f):
            assert np.max(np.abs(pcm)) < 1e-6
    ref.close()
    assert max(len(f) for f in frames) < 40  # near-empty raw blocks


def test_bad_params_typed_errors():
    with pytest.raises(AacEncodeError):
        AacLcEncoder(44100, 3)
    with pytest.raises(Exception):
        AacLcEncoder(44101, 2)
    enc = AacLcEncoder(44100, 2)
    with pytest.raises(AacEncodeError):
        enc.encode_granule(np.zeros((512, 2)))


# ---------------------------------------------------------------------------
# integration: pure-tier monitor emits AAC fMP4, stream_output goes AAC
# ---------------------------------------------------------------------------


def test_pure_aac_stream_duck_type():
    from mixlab_tpu.av.codecs import PureAacStream

    s = PureAacStream(44100, 2)
    assert s.codec == "aac"
    assert len(s.configuration_data()) == 2
    rng = np.random.default_rng(0)
    s.feed((rng.standard_normal((3000, 2)) * 3000).astype(np.int16))
    frames = s.poll_frames()
    assert len(frames) == 2  # 3000 samples -> 2 whole granules
    assert frames[0][:2] == b"\xff\xf1"  # ADTS sync


def test_monitor_pure_tier_default_audio_is_aac(tmp_path, monkeypatch):
    """MIXLAB_CODEC_TIER=pure monitor emits AAC fMP4 (round 4 default);
    the stream decodes on an independent stack (libavformat/libavcodec)
    with the tone intact."""
    import queue

    import jax.numpy as jnp

    import mixlab_tpu.av.codecs as codecs_mod
    from mixlab_tpu.av.codecs import MONITOR_PICTURE, PureAacStream
    from mixlab_tpu.engine.config import EngineConfig
    from mixlab_tpu.server.monitor import MonitorPipeline
    from mixlab_tpu.video.frame import Picture, PictureSettings, VideoFrame

    avshim = _shim()
    monkeypatch.setattr(codecs_mod, "codec_tier", lambda: "pure")
    monkeypatch.delenv("MIXLAB_PURE_AUDIO", raising=False)

    cfg = EngineConfig(sample_rate=44100)

    class _Pipe:
        def __init__(self):
            self.q = queue.Queue(maxsize=64)

    pipeline = MonitorPipeline(_Pipe(), cfg, mode="fmp4")
    pipeline._ensure_codecs()
    assert isinstance(pipeline._aac, PureAacStream)
    sub = pipeline.broadcast.subscribe()

    spt = cfg.samples_per_tick
    t = np.arange(spt) / cfg.sample_rate
    w, h = MONITOR_PICTURE.width, MONITOR_PICTURE.height
    pic = Picture(PictureSettings(w, h), {
        "y": jnp.full((h, w), 120, jnp.uint8),
        "u": jnp.full((h // 2, w // 2), 128, jnp.uint8),
        "v": jnp.full((h // 2, w // 2), 128, jnp.uint8)})
    frame = VideoFrame(picture=pic)
    for k in range(40):
        tone = np.sin(2 * np.pi * 440 * (t + k * spt / cfg.sample_rate))
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
    header = init_pkt.partition(b"\n")[0].decode()
    assert "mp4a.40.2" in header

    blob = init_pkt.partition(b"\n")[2] + b"".join(
        p.partition(b"\n")[2] for p in packets
        if b'"segment"' in p.partition(b"\n")[0])
    out = tmp_path / "monitor_aac.mp4"
    out.write_bytes(blob)
    r = avshim.MediaReader(str(out))
    assert r.audio and r.audio["channels"] == 2
    pcm = []
    while True:
        item = r.read()
        if item is None:
            break
        if item[0] == "audio":
            pcm.append(item[2])
    r.close()
    got = np.concatenate(pcm).astype(np.float64)[:, 0]
    assert len(got) > 10 * spt
    body = got[2048:]
    spec = np.abs(np.fft.rfft(body * np.hanning(len(body))))
    peak_hz = np.argmax(spec) * 44100 / len(body)
    assert abs(peak_hz - 440.0) < 10.0, peak_hz


def test_stream_output_pure_tier_uses_aac(monkeypatch):
    import mixlab_tpu.av.codecs as codecs_mod
    from mixlab_tpu.av.codecs import PureAacStream
    from mixlab_tpu.engine.config import EngineConfig
    import mixlab_tpu.server.stream_output as so_mod
    from mixlab_tpu.server.stream_output import StreamOutputController

    monkeypatch.setattr(so_mod, "avshim_codecs_available",
                        lambda: False, raising=False)
    monkeypatch.setattr(codecs_mod, "avshim_codecs_available", lambda: False)

    ctl = StreamOutputController.__new__(StreamOutputController)
    ctl.cfg = EngineConfig(sample_rate=44100)
    ctl._setup_encoders()
    assert isinstance(ctl._aac, PureAacStream)
