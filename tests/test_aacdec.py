"""Differential + fuzz tests for the pure AAC-LC decoder (av/aacdec.py).

The oracle is libavcodec via the shim: ffmpeg's own AAC encoder produces
streams across the LC toolset (window switching, TNS, M/S, intensity,
PNS), both decoders decode the same packets, and the outputs must agree
to float32 precision — except PNS bands, where the spec leaves the noise
generator implementation-defined (4.6.13), so PNS streams are compared
by band energy instead of samples.

Reference surface: the reference's AAC ingest is fdk-aac FFI
(src/rtmp/mod.rs:192-258); its pure-Rust layer stops at headers
(codec/src/aac/).  This decoder closes the zero-dep tier's last typed
audio warning.
"""

import numpy as np
import pytest

from mixlab_tpu.av.aac import AudioSpecificConfiguration, adts_frame
from mixlab_tpu.av.aacdec import AacDecodeError, AacLcDecoder

pytestmark = pytest.mark.filterwarnings("ignore")


def _shim():
    from mixlab_tpu.native import avshim

    if not avshim.available():
        pytest.skip("libavcodec shim unavailable (oracle)")
    return avshim


def _encode(signal, rate=44100, ch=1, opts="", bitrate=None):
    avshim = _shim()
    enc = avshim.AacEncoder(rate, ch, bitrate or 64_000 * ch, opts=opts)
    enc.send(signal)
    enc.flush()
    pk = enc.receive()
    asc = AudioSpecificConfiguration.parse(enc.extradata())
    enc.close()
    assert pk
    return asc, [p for _pts, p in pk]


def _diff(asc, payloads, nf=None):
    """Max |ours - libavcodec| over the stream (float32 samples)."""
    avshim = _shim()
    ref = avshim.AudioDecoder("aac")
    ours = AacLcDecoder()
    worst = 0.0
    try:
        for payload in payloads[:nf]:
            frame = adts_frame(payload, asc)
            theirs = ref.decode_flt(frame)
            mine = ours.decode_adts(frame)
            assert len(theirs) == len(mine) == 1
            worst = max(worst, float(np.max(np.abs(theirs[0][1] - mine[0]))))
    finally:
        ref.close()
    return worst


TOOLS_OFF = "aac_pns=0,aac_tns=0,aac_ms=0,aac_is=0"


def _tone(rate, seconds=1.5, f=440.0, amp=12000):
    t = np.arange(int(rate * seconds))
    return (np.sin(2 * np.pi * f * t / rate) * amp).astype(np.int16).reshape(-1, 1)


# ---------------------------------------------------------------------------
# bit-exact differentials (PNS off)
# ---------------------------------------------------------------------------


def test_mono_tone_exact():
    asc, pk = _encode(_tone(44100), opts=TOOLS_OFF)
    assert _diff(asc, pk) < 1e-6


def test_mono_noise_exact():
    rng = np.random.default_rng(1)
    sig = (rng.standard_normal((66150, 1)) * 6000).astype(np.int16)
    asc, pk = _encode(sig, opts=TOOLS_OFF)
    assert _diff(asc, pk) < 1e-6


def test_transients_exercise_short_windows_exact():
    """Clicks force EIGHT_SHORT + LONG_START/STOP transitions."""
    t = np.arange(66150)
    click = np.zeros((66150, 1), np.int16)
    click[::4000] = 20000
    sig = (_tone(44100, 1.5)[: len(click)] // 2 + click).astype(np.int16)
    asc, pk = _encode(sig, opts=TOOLS_OFF)
    assert _diff(asc, pk) < 1e-6


def test_stereo_exact():
    t = np.arange(66150)
    l = np.sin(2 * np.pi * 440 * t / 44100) * 11000
    r = np.sin(2 * np.pi * 554 * t / 44100) * 9000
    sig = np.stack([l, r], 1).astype(np.int16)
    asc, pk = _encode(sig, ch=2, opts=TOOLS_OFF)
    assert _diff(asc, pk) < 1e-6


def test_tns_exact():
    """Swept bursts make the encoder emit TNS filters (4.6.9)."""
    t = np.arange(88200)
    sweep = np.sin(2 * np.pi * (200 + 3000 * (t / 88200) ** 2) * t / 44100) * 11000
    burst = sweep * (1 + 0.8 * np.sign(np.sin(2 * np.pi * 7 * t / 44100)))
    sig = (burst / 2).astype(np.int16).reshape(-1, 1)
    asc, pk = _encode(sig, opts="aac_pns=0,aac_ms=0,aac_is=0")
    assert _diff(asc, pk) < 1e-6


def test_ms_stereo_exact():
    t = np.arange(66150)
    l = np.sin(2 * np.pi * 440 * t / 44100) * 11000
    r = l * 0.9 + np.sin(2 * np.pi * 660 * t / 44100) * 1500
    sig = np.stack([l, r], 1).astype(np.int16)
    asc, pk = _encode(sig, ch=2, opts="aac_pns=0,aac_tns=0,aac_is=0,aac_ms=1")
    assert _diff(asc, pk) < 1e-6


def test_intensity_stereo_exact():
    t = np.arange(66150)
    l = np.sin(2 * np.pi * 440 * t / 44100) * 11000
    r = l * 0.9 + np.sin(2 * np.pi * 660 * t / 44100) * 1500
    sig = np.stack([l, r], 1).astype(np.int16)
    asc, pk = _encode(sig, ch=2, opts="aac_pns=0,aac_tns=0,aac_ms=0,aac_is=1")
    assert _diff(asc, pk) < 1e-6


@pytest.mark.parametrize("rate", [48000, 32000, 22050, 16000, 8000])
def test_sample_rates_exact(rate):
    rng = np.random.default_rng(rate)
    n = rate
    t = np.arange(n)
    sig = (
        np.sin(2 * np.pi * 440 * t / rate) * 9000 + rng.standard_normal(n) * 800
    ).astype(np.int16).reshape(-1, 1)
    asc, pk = _encode(sig, rate=rate, opts=TOOLS_OFF)
    assert _diff(asc, pk) < 1e-6


# ---------------------------------------------------------------------------
# PNS: implementation-defined noise -> compare band energies
# ---------------------------------------------------------------------------


def test_pns_band_energies_match():
    avshim = _shim()
    rng = np.random.default_rng(2)
    sig = (rng.standard_normal((88200, 1)) * 6000).astype(np.int16)
    asc, pk = _encode(sig, opts="aac_tns=0,aac_ms=0,aac_is=0,aac_pns=1",
                      bitrate=32_000)
    ref = avshim.AudioDecoder("aac")
    ours = AacLcDecoder()
    worst = 0.0
    checked = 0
    prev_t = prev_m = None
    for payload in pk:
        frame = adts_frame(payload, asc)
        theirs = ref.decode_flt(frame)[0][1][:, 0].astype(np.float64)
        mine = ours.decode_adts(frame)[0][:, 0].astype(np.float64)
        if prev_t is not None:
            # frame energies via 256-sample windows (coarse band proxy);
            # noise substitution preserves energy, not samples
            for k in range(0, 1024, 256):
                et = np.sqrt(np.mean(theirs[k:k + 256] ** 2))
                em = np.sqrt(np.mean(mine[k:k + 256] ** 2))
                if et > 1e-4:
                    worst = max(worst, abs(em - et) / et)
                    checked += 1
        prev_t, prev_m = theirs, mine
    ref.close()
    assert checked > 50
    assert worst < 0.35, worst  # chunk-level energy agreement


# ---------------------------------------------------------------------------
# default encoder settings: everything on at once (crash + sanity)
# ---------------------------------------------------------------------------


def test_default_settings_decode_sane():
    t = np.arange(88200)
    l = np.sin(2 * np.pi * 330 * t / 44100) * 10000
    r = l * 0.8 + np.sin(2 * np.pi * 495 * t / 44100) * 2000
    sig = np.stack([l, r], 1).astype(np.int16)
    asc, pk = _encode(sig, ch=2)
    avshim = _shim()
    ref = avshim.AudioDecoder("aac")
    ours = AacLcDecoder()
    for payload in pk:
        frame = adts_frame(payload, asc)
        theirs = ref.decode_flt(frame)[0][1]
        mine = ours.decode_adts(frame)[0]
        nt, nm = np.linalg.norm(theirs), np.linalg.norm(mine)
        if nt > 1e-3:
            assert abs(nm - nt) / nt < 0.2  # PNS bands allowed to differ
    ref.close()


# ---------------------------------------------------------------------------
# robustness: typed errors, never crashes
# ---------------------------------------------------------------------------


def test_truncated_frame_typed_error():
    asc, pk = _encode(_tone(44100, 0.5), opts=TOOLS_OFF)
    frame = adts_frame(pk[3], asc)
    for cut in (8, 9, 12, len(frame) - 1):
        with pytest.raises((AacDecodeError, Exception)) as ei:
            AacLcDecoder().decode_adts(frame[:cut])
        assert isinstance(ei.value, (AacDecodeError,)), type(ei.value)


def test_byte_mutation_fuzz_typed_errors():
    """Mutated real streams either decode or raise AacDecodeError — no
    IndexError/ValueError/crash (same harness discipline as
    test_h264dec_fast.py / test_h264dec_intra_full.py)."""
    asc, pk = _encode(_tone(44100, 0.5), opts="")
    rng = np.random.default_rng(99)
    base = adts_frame(pk[4], asc)
    decoded = errored = 0
    for _ in range(400):
        buf = bytearray(base)
        for _m in range(rng.integers(1, 4)):
            buf[rng.integers(7, len(buf))] = rng.integers(0, 256)
        try:
            AacLcDecoder().decode_raw(bytes(buf[7:]), 4)
            decoded += 1
        except AacDecodeError:
            errored += 1
    assert decoded + errored == 400
    assert errored > 0  # mutations do get caught


def test_random_garbage_typed_errors():
    rng = np.random.default_rng(7)
    for n in (1, 3, 17, 200):
        blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        try:
            AacLcDecoder().decode_raw(blob, 4)
        except AacDecodeError:
            pass


# ---------------------------------------------------------------------------
# integration: the zero-dep tier surfaces
# ---------------------------------------------------------------------------


def test_rtmp_pure_tier_decodes_aac_audio():
    """PureTierDecoder now carries AAC audio (was: typed warning + drop)."""
    from mixlab_tpu.io_host.rtmp.server import PureTierDecoder

    asc, pk = _encode(_tone(44100, 0.5), opts=TOOLS_OFF)
    dec = PureTierDecoder()
    dec.set_audio_config(asc)
    got = []
    for payload in pk:
        pcm = dec.decode_audio(payload)
        if pcm is not None:
            got.append(pcm)
    out = np.concatenate(got)
    assert out.dtype == np.int16 and out.shape[1] == 2
    body = out[4096:, 0].astype(np.float64)
    spec = np.abs(np.fft.rfft(body * np.hanning(len(body))))
    peak_hz = np.argmax(spec) * 44100 / len(body)
    assert abs(peak_hz - 440.0) < 10.0, peak_hz


def test_media_player_mp4_aac_plays_audio_pure(tmp_path, monkeypatch):
    """MP4 + AAC plays AUDIO through the zero-dep tier (closes the
    round-3 'video only' warning path for LC content)."""
    from mixlab_tpu.av import mp4
    from mixlab_tpu.engine.config import EngineConfig
    from mixlab_tpu.engine.feeds import MediaSourceFeed
    from mixlab_tpu.engine.media_player import MediaPlayer
    from mixlab_tpu.engine.project import open_or_create
    from mixlab_tpu.native import avshim
    from mixlab_tpu.utils.mtime import MediaDuration

    SR = 44100
    asc, pk = _encode(_tone(SR, 1.0), opts=TOOLS_OFF)

    params = mp4.Mp4Params(timescale=SR, width=0, height=0, dcr=b"",
                           sample_rate=SR, channels=1, audio_codec="aac")
    mux, blob = mp4.Mp4Mux.create(params)
    blob = bytearray(blob)
    for payload in pk:
        blob += mux.write_track(
            MediaDuration.new(1024, SR),
            mp4.AdtsFrame(adts_frame(payload, asc)),
        )

    monkeypatch.setattr(avshim, "available", lambda: False)
    cfg = EngineConfig(sample_rate=SR)
    proj = open_or_create(tmp_path / "aacpure.mixlab", cfg)
    media_id = proj.upload_media("tone.mp4", "audio/mp4", [bytes(blob)])
    stream = proj.base.open_media(media_id)
    feed = MediaSourceFeed(cfg)
    player = MediaPlayer(stream, feed, cfg)
    player.start()
    try:
        chunks = []
        import queue as _q

        deadline = 20.0
        while sum(len(c) for c in chunks) < SR // 2:
            try:
                pcm = feed.queue.get(timeout=deadline)
            except _q.Empty:
                break
            chunks.append(np.asarray(pcm))
        out = np.concatenate(chunks)
        body = out[2048:, 0].astype(np.float64)
        spec = np.abs(np.fft.rfft(body * np.hanning(len(body))))
        peak_hz = np.argmax(spec) * SR / len(body)
        assert abs(peak_hz - 440.0) < 10.0, peak_hz
    finally:
        player.stop()
        player.join(timeout=5)
        proj.engine.stop()
        proj.close()


def test_tables_structural_invariants():
    """The checked-in tables must be complete prefix codes with the
    spec's entry counts — validated WITHOUT the shim (the differential
    tests above pin the values; this pins the structure on any image)."""
    from fractions import Fraction

    from mixlab_tpu.av import aac_tables as t

    assert sorted(t.SF_CODEBOOK.values()) == list(range(121))
    assert sum(Fraction(1, 2 ** len(c)) for c in t.SF_CODEBOOK) == 1
    expected = {1: 81, 2: 81, 3: 81, 4: 81, 5: 81, 6: 81,
                7: 64, 8: 64, 9: 169, 10: 169, 11: 289}
    for book, table in t.SPECTRAL_CODEBOOKS.items():
        assert len(table) == expected[book], book
        assert sum(Fraction(1, 2 ** len(c)) for c in table) == 1, book
        cws = sorted(table, key=len)
        for i, a in enumerate(cws):
            for b in cws[i + 1:]:
                assert not b.startswith(a), (book, a, b)
    for sfi, offs in t.SWB_OFFSET_LONG.items():
        assert offs[0] == 0 and offs[-1] == 1024
        assert all(b > a for a, b in zip(offs, offs[1:]))
        assert all(o % 4 == 0 for o in offs)
    for sfi, offs in t.SWB_OFFSET_SHORT.items():
        assert offs[0] == 0 and offs[-1] == 128
        assert all(b > a for a, b in zip(offs, offs[1:]))


def test_five_one_multichannel_exact():
    """5.1 (config 6: SCE+CPE+CPE+LFE) decodes bit-exact with the
    conventional output channel order (FL FR FC LFE BL BR)."""
    avshim = _shim()
    t = np.arange(44100)
    chans = [np.sin(2 * np.pi * (200 + 97 * i) * t / 44100) * 9000
             for i in range(6)]
    sig = np.stack(chans, 1).astype(np.int16)
    enc = avshim.AacEncoder(44100, 6, 96_000 * 6, opts=TOOLS_OFF)
    enc.send(sig)
    enc.flush()
    pk = enc.receive()
    asc = AudioSpecificConfiguration.parse(enc.extradata())
    enc.close()
    assert asc.channel_configuration == 6
    ref = avshim.AudioDecoder("aac")
    ours = AacLcDecoder()
    worst = 0.0
    for _pts, payload in pk[:20]:
        frame = adts_frame(payload, asc)
        theirs = ref.decode_flt(frame)[0][1]
        mine = ours.decode_adts(frame)[0]
        assert mine.shape == theirs.shape
        worst = max(worst, float(np.max(np.abs(theirs - mine))))
    ref.close()
    assert worst < 1e-6, worst


# ---------------------------------------------------------------------------
# crafted extreme scalefactor chains: the noise / intensity dpcm chains are
# unbounded in the bitstream; the decoder must clip at use (libavcodec
# semantics: noise [-100, 155], is_pos [-155, 100]) instead of feeding
# Python's float pow an exponent past 2^1023 (OverflowError crash)
# ---------------------------------------------------------------------------


class _Bw:
    def __init__(self):
        self.bits = []

    def u(self, v, k):
        self.bits.extend((v >> (k - 1 - i)) & 1 for i in range(k))

    def code(self, s):
        self.bits.extend(int(c) for c in s)

    def bytes(self):
        while len(self.bits) % 8:
            self.bits.append(0)
        return bytes(
            int("".join(map(str, self.bits[i:i + 8])), 2)
            for i in range(0, len(self.bits), 8)
        )


_SF_PLUS60 = "1111111111111110011"   # SF codebook index 120
_SF_MINUS60 = "111111111111101000"   # SF codebook index 0


def test_crafted_noise_energy_chain_clipped():
    """40 PNS bands of +60 dpcm steps drive the energy chain to ~2760;
    un-clipped that is 2^690 -> OverflowError.  Must decode finite."""
    w = _Bw()
    w.u(0, 3)          # SCE
    w.u(0, 4)          # instance tag
    w.u(255, 8)        # global_gain
    w.u(0, 1); w.u(0, 2); w.u(0, 1)   # ics_info: reserved, ONLY_LONG, sine
    w.u(40, 6); w.u(0, 1)             # max_sfb=40, no predictor
    w.u(13, 4); w.u(31, 5); w.u(9, 5)  # one NOISE_HCB section, len 40
    w.u(511, 9)                        # noise PCM: +255
    for _ in range(39):
        w.code(_SF_PLUS60)
    w.u(0, 1); w.u(0, 1); w.u(0, 1)    # no pulse / tns / gain control
    w.u(7, 3)                          # END
    pcm = AacLcDecoder().decode_raw(w.bytes(), 3)
    assert pcm.shape == (1024, 1)
    assert np.all(np.isfinite(pcm))


def test_crafted_intensity_position_chain_clipped():
    """EIGHT_SHORT with 8 groups x 14 intensity bands of -60 dpcm steps
    drives is_pos to -6720; un-clipped the scale is 2^1680 ->
    OverflowError.  Must decode finite."""
    w = _Bw()
    w.u(1, 3)          # CPE
    w.u(0, 4)          # instance tag
    w.u(1, 1)          # common_window
    w.u(0, 1); w.u(2, 2); w.u(0, 1)   # ics_info: reserved, EIGHT_SHORT, sine
    w.u(14, 4); w.u(0, 7)             # max_sfb=14, grouping=0 (8 groups)
    w.u(0, 2)                          # ms_present = 0
    # left channel: all ZERO_HCB (no scalefactors, no spectra)
    w.u(100, 8)                        # global_gain
    for _ in range(8):                 # per-group ZERO section, len 14
        w.u(0, 4); w.u(7, 3); w.u(7, 3); w.u(0, 3)
    w.u(0, 1); w.u(0, 1); w.u(0, 1)
    # right channel: all INTENSITY_HCB
    w.u(100, 8)
    for _ in range(8):                 # per-group INTENSITY section, len 14
        w.u(15, 4); w.u(7, 3); w.u(7, 3); w.u(0, 3)
    for _ in range(8 * 14):            # then all scalefactors, group-major
        w.code(_SF_MINUS60)
    w.u(0, 1); w.u(0, 1); w.u(0, 1)
    w.u(7, 3)                          # END
    pcm = AacLcDecoder().decode_raw(w.bytes(), 3)
    assert pcm.shape == (1024, 2)
    assert np.all(np.isfinite(pcm))


def test_reserved_codebook_12_typed_error():
    """Section data naming reserved codebook 12 (14496-3 table 4.150)
    must raise AacDecodeError, not KeyError at spectral decode
    (tools/deepfuzz.py aac_adts finding, round 4)."""
    w = _Bw()
    w.u(0, 3)          # SCE
    w.u(0, 4)          # instance tag
    w.u(100, 8)        # global_gain
    w.u(0, 1); w.u(0, 2); w.u(0, 1)   # ics_info: reserved, ONLY_LONG, sine
    w.u(1, 6); w.u(0, 1)              # max_sfb=1, no predictor
    w.u(12, 4); w.u(1, 5)             # section: cb=12 (reserved), len 1
    with pytest.raises(AacDecodeError):
        AacLcDecoder().decode_raw(w.bytes(), 4)


def test_channel_element_flood_capped():
    """A crafted payload of minimal ~30-bit SCEs costs ~2 channels/byte of
    input; a 16 MB unauthenticated RTMP message would decode for hours on
    the event loop and allocate GBs (round-4 advisor finding).  decode_raw
    must raise the typed error at the 64-channel cap, fast."""
    import time as _time

    w = _Bw()
    for _ in range(200):               # minimal all-zero SCE
        w.u(0, 3)      # SCE
        w.u(0, 4)      # instance tag
        w.u(100, 8)    # global_gain
        w.u(0, 1); w.u(0, 2); w.u(0, 1)   # ics_info: reserved, ONLY_LONG, sine
        w.u(0, 6); w.u(0, 1)              # max_sfb=0, no predictor
        w.u(0, 1); w.u(0, 1); w.u(0, 1)   # no pulse / tns / gain control
    w.u(7, 3)                          # END
    t0 = _time.monotonic()
    with pytest.raises(AacDecodeError, match="channel elements"):
        AacLcDecoder().decode_raw(w.bytes(), 4)
    assert _time.monotonic() - t0 < 2.0


def test_asc_reserved_sampling_frequency_index_typed_error():
    """ASC sfi 13/14 are reserved and 15 is the 24-bit escape this 2-byte
    parser does not carry; parse must fail typed, never hand a 13-15 index
    to SAMPLING_FREQUENCIES consumers (round-4 advisor finding: IndexError
    killed the MediaPlayer thread)."""
    from mixlab_tpu.av.aac import AacError, AudioSpecificConfiguration

    for sfi in (13, 14, 15):
        x = (2 << 3) | (sfi >> 1)              # LC object type
        y = ((sfi & 1) << 7) | (2 << 3)        # stereo
        with pytest.raises(AacError):
            AudioSpecificConfiguration.parse(bytes([x, y]))
    # the boundary value 12 (7350 Hz) still parses
    x = (2 << 3) | (12 >> 1)
    y = ((12 & 1) << 7) | (2 << 3)
    asc = AudioSpecificConfiguration.parse(bytes([x, y]))
    assert asc.sampling_frequency_index == 12
