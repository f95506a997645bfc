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


# ---------------------------------------------------------------------------
# round 5: rate control + psychoacoustic-margin allocation (VERDICT r4 #4)
# ---------------------------------------------------------------------------

RATE = 44100


def _tonal_sig(seconds=2.0):
    """Strong partial + two weak ones 30/42 dB down (spectral dynamic
    range for the allocator to redistribute into)."""
    t = np.arange(int(RATE * seconds)) / RATE
    s = (0.6 * np.sin(2 * np.pi * 440 * t)
         + 0.02 * np.sin(2 * np.pi * 3000 * t)
         + 0.005 * np.sin(2 * np.pi * 9000 * t))
    return np.stack([s, 0.9 * s], axis=1)


def _transient_sig(seconds=2.0):
    """Click train over a bass bed — attack frames + dense spectra."""
    t = np.arange(int(RATE * seconds)) / RATE
    s = np.zeros(len(t))
    s[::4410] = 0.6
    s = s + 0.5 * np.sin(2 * np.pi * 110 * t) + 0.01 * np.sin(2 * np.pi * 5000 * t)
    return np.stack([s, 0.9 * s], axis=1)


def _noise_sig(seconds=2.0):
    rng = np.random.default_rng(7)
    return np.stack([0.3 * rng.standard_normal(int(RATE * seconds))
                     for _ in range(2)], axis=1)


def _cbr_stream(sig, bitrate, band_alloc):
    enc = AacLcEncoder(RATE, 2, bitrate=bitrate, band_alloc=band_alloc)
    dec = AacLcDecoder()
    outs, bits = [], 0
    n = len(sig) // 1024
    for g in range(n):
        blob = enc.encode_granule(sig[g * 1024:(g + 1) * 1024])
        bits += len(blob) * 8
        outs.append(dec.decode_raw(blob, enc.sfi))
    kbps = bits / (n * 1024 / RATE) / 1000
    pcm = np.concatenate(outs)
    ref = sig[: len(pcm) - 1024]
    out = pcm[1024: 1024 + len(ref)]  # 1024-sample encoder latency
    return kbps, ref, out


def _frame_band_snrs(ref, out):
    """Per-frame mean band SNR (dB) over signal-bearing SFBs, in the
    encoder's own analysis domain — the allocator's objective."""
    from mixlab_tpu.av.aac_tables import SWB_OFFSET_LONG
    from mixlab_tpu.av.aacenc import _COEF_SCALE, _analysis_matrix

    M = _analysis_matrix()
    swb = SWB_OFFSET_LONG[4]
    per_frame = []
    for g in range((len(ref) - 1024) // 1024):
        R = _COEF_SCALE * (M @ ref[g * 1024:(g + 2) * 1024, 0].astype(np.float32))
        O = _COEF_SCALE * (M @ out[g * 1024:(g + 2) * 1024, 0].astype(np.float32))
        sig_b = np.array([float(np.sum(R[swb[b]:swb[b + 1]] ** 2))
                          for b in range(len(swb) - 1)])
        err_b = np.array([float(np.sum((O[swb[b]:swb[b + 1]]
                                        - R[swb[b]:swb[b + 1]]) ** 2))
                          for b in range(len(swb) - 1)])
        m = sig_b > np.max(sig_b) * 1e-7
        if not np.any(m):
            continue
        per_frame.append(float(np.mean(
            10 * np.log10(np.maximum(sig_b[m], 1e-12)
                          / np.maximum(err_b[m], 1e-12)))))
    return np.array(per_frame)


@pytest.mark.parametrize("target", [96_000, 160_000])
@pytest.mark.parametrize("content", ["tonal", "transient", "noise"])
def test_cbr_rate_within_20pct(target, content):
    """VERDICT r4 #4: measured bitrate within +-20% of target on tonal and
    transient (and noise) content; the reference op point is CBR 160k
    (stream_output.rs:337-345)."""
    sig = {"tonal": _tonal_sig, "transient": _transient_sig,
           "noise": _noise_sig}[content]()
    kbps, _ref, _out = _cbr_stream(sig, target, band_alloc=True)
    assert abs(kbps * 1000 - target) / target < 0.20, kbps


def test_allocation_improves_band_snr_on_tonal():
    """At the SAME measured rate, the psychoacoustic allocation must beat
    flat on the band-SNR objective for tonal content — the weak partials
    stop sitting at the flat anchor's uniform noise floor."""
    sig = _tonal_sig()
    kb_f, ref_f, out_f = _cbr_stream(sig, 96_000, band_alloc=False)
    kb_a, ref_a, out_a = _cbr_stream(sig, 96_000, band_alloc=True)
    assert abs(kb_f - kb_a) / kb_f < 0.05  # equal-rate comparison
    snr_f = _frame_band_snrs(ref_f, out_f)
    snr_a = _frame_band_snrs(ref_a, out_a)
    assert snr_a.mean() > snr_f.mean() + 2.0, (snr_a.mean(), snr_f.mean())


@pytest.mark.parametrize("content", ["transient", "noise"])
def test_allocation_never_worse_on_dense_content(content):
    """The per-frame A/B keeps the flat plan whenever shaping loses, so
    bit-starved dense/transient content must not regress: mean per-frame
    band SNR within a small tolerance of flat (and rate equal)."""
    sig = {"transient": _transient_sig, "noise": _noise_sig}[content]()
    kb_f, ref_f, out_f = _cbr_stream(sig, 96_000, band_alloc=False)
    kb_a, ref_a, out_a = _cbr_stream(sig, 96_000, band_alloc=True)
    assert abs(kb_f - kb_a) / kb_f < 0.05
    snr_f = _frame_band_snrs(ref_f, out_f)
    snr_a = _frame_band_snrs(ref_a, out_a)
    assert snr_a.mean() > snr_f.mean() - 0.5, (snr_a.mean(), snr_f.mean())


def test_cbr_streams_strict_decodable_by_libav():
    """Rate-controlled + allocated streams still pass libavcodec STRICT."""
    avshim = _shim()
    sig = _tonal_sig(1.0) + _transient_sig(1.0)
    enc = AacLcEncoder(RATE, 2, bitrate=160_000)
    dec = avshim.AudioDecoder("aac", strict=True)
    n_out = 0
    for g in range(len(sig) // 1024):
        frame = adts_frame(enc.encode_granule(sig[g * 1024:(g + 1) * 1024]),
                           enc.asc)
        for item in dec.decode_flt(frame):
            n_out += len(item[1])
    dec.close()
    assert n_out >= (len(sig) // 1024 - 2) * 1024


def test_vbr_mode_unchanged_by_band_alloc_flag():
    """band_alloc is a rate-control-mode feature; VBR quality mode plans
    flat either way (bit-identical streams)."""
    sig = _tonal_sig(0.5)
    enc_a = AacLcEncoder(RATE, 2, quality=60, band_alloc=True)
    enc_b = AacLcEncoder(RATE, 2, quality=60, band_alloc=False)
    for g in range(len(sig) // 1024):
        blob_a = enc_a.encode_granule(sig[g * 1024:(g + 1) * 1024])
        blob_b = enc_b.encode_granule(sig[g * 1024:(g + 1) * 1024])
        assert blob_a == blob_b


def test_reported_frame_bits_match_stream():
    sig = _tonal_sig(0.5)
    enc = AacLcEncoder(RATE, 2, bitrate=128_000)
    for g in range(len(sig) // 1024):
        blob = enc.encode_granule(sig[g * 1024:(g + 1) * 1024])
        assert enc.last_frame_bits == len(blob) * 8
