"""Hard Vorbis vectors: stereo coupling, 44.1 kHz, block switching.

The pygame fixture (test_vorbis.py) is mono 11 kHz single-blocksize; these
tests synthesize adversarial content, encode it with libvorbis (via the
ffmpeg-libraries shim), mux it with our own Ogg page writer, and decode the
SAME bytes with (a) the pure decoder (av/vorbis.py) and (b) libavcodec —
asserting the two agree.  Exercises floor/residue/coupling/window paths a
simple file never reaches."""

import numpy as np
import pytest

from mixlab_tpu.av.ogg import parse_xiph_extradata, write_ogg_stream
from mixlab_tpu.av.vorbis import OggVorbisStream


def _shim():
    from mixlab_tpu.native import avshim

    if not (avshim.available() and avshim.have_encoder("libvorbis")):
        pytest.skip("libvorbis encoder unavailable")
    return avshim


def encode_ogg(pcm_i16: np.ndarray, rate: int, bitrate=None) -> bytes:
    """PCM -> Ogg/Vorbis bytes via libvorbis + our Ogg muxer."""
    avshim = _shim()
    ch = pcm_i16.shape[1]
    enc = avshim.AacEncoder(rate, ch, bitrate, codec="libvorbis")
    headers = parse_xiph_extradata(enc.extradata())
    assert len(headers) == 3 and headers[0][:7] == b"\x01vorbis"
    enc.send(pcm_i16)
    enc.flush()
    packets = [(h, 0) for h in headers]
    for pts, frame in enc.receive():
        packets.append((frame, max(pts, 0)))
    enc.close()
    return write_ogg_stream(packets)


def decode_reference(ogg_bytes: bytes) -> np.ndarray:
    """libavcodec decode of the muxed stream (also validates our Ogg
    writer against an independent demuxer)."""
    import tempfile

    from mixlab_tpu.native import avshim

    with tempfile.NamedTemporaryFile(suffix=".ogg", delete=False) as f:
        f.write(ogg_bytes)
        path = f.name
    reader = avshim.MediaReader(path)
    out = []
    while (item := reader.read()) is not None:
        if item[0] == "audio":
            out.append(item[2])
    reader.close()
    import os

    os.unlink(path)
    return np.concatenate(out) if out else np.zeros((0, 2), np.int16)


def _compare(mine_f32: np.ndarray, ref_i16: np.ndarray, rms_floor: float):
    mine = np.clip(mine_f32 * 32768.0, -32768, 32767)
    n = min(len(mine), len(ref_i16))
    assert n > 0, "nothing decoded"
    # lengths agree within one long block
    assert abs(len(mine) - len(ref_i16)) <= 4096, (len(mine), len(ref_i16))
    a = mine[:n].astype(np.float64)
    b = ref_i16[:n].astype(np.float64)
    rms = np.sqrt((b**2).mean())
    assert rms > rms_floor, f"reference decode silent (rms {rms})"
    err = np.sqrt(((a - b) ** 2).mean())
    # the two decoders must agree to a fraction of the signal power
    assert err < max(4.0, rms * 2e-3), f"decoders diverge (err {err}, rms {rms})"
    corr = np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1]
    assert corr > 0.99999, f"corr {corr}"


def _stereo_transient_signal(rate: int, seconds: float) -> np.ndarray:
    """Tonal bed + sharp noise bursts: forces long/short window switching
    and exercises channel coupling (different L/R content)."""
    rng = np.random.default_rng(0)
    n = int(rate * seconds)
    t = np.arange(n) / rate
    left = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 932 * t)
    right = 0.4 * np.sin(2 * np.pi * 554 * t) + 0.1 * np.sin(2 * np.pi * 1397 * t)
    for burst in range(8):
        at = int((burst + 0.5) * n / 8)
        dur = rate // 100
        env = np.hanning(dur)
        noise = rng.normal(0, 0.5, dur) * env
        left[at : at + dur] += noise
        right[at : at + dur] += noise * (-1) ** burst
    pcm = np.stack([left, right], -1)
    pcm = np.clip(pcm, -0.99, 0.99)
    return (pcm * 32767).astype(np.int16)


def test_stereo_44k_transients_round_trip():
    rate = 44_100
    pcm = _stereo_transient_signal(rate, 1.5)
    ogg = encode_ogg(pcm, rate)
    s = OggVorbisStream()
    mine = s.feed(ogg)
    assert s.info.channels == 2 and s.info.sample_rate == rate
    # long/short switching must actually occur for this content
    assert s.decoder.info.blocksize0 < s.decoder.info.blocksize1
    ref = decode_reference(ogg)
    _compare(mine, ref, rms_floor=3000)


def test_stereo_44k_low_bitrate():
    rate = 44_100
    pcm = _stereo_transient_signal(rate, 1.0)
    ogg = encode_ogg(pcm, rate, bitrate=48_000)
    mine = OggVorbisStream().feed(ogg)
    ref = decode_reference(ogg)
    _compare(mine, ref, rms_floor=2000)


def test_mono_8k_speech_band():
    rate = 8_000
    rng = np.random.default_rng(1)
    n = rate
    t = np.arange(n) / rate
    sig = 0.5 * np.sin(2 * np.pi * 200 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
    sig += 0.1 * rng.normal(0, 1, n)
    pcm = (np.clip(sig, -0.99, 0.99) * 32767).astype(np.int16).reshape(-1, 1)
    ogg = encode_ogg(pcm, rate)
    s = OggVorbisStream()
    mine = s.feed(ogg)
    assert s.info.channels == 1
    ref = decode_reference(ogg)
    if ref.shape[1] == 1 and mine.shape[1] == 1:
        _compare(mine, ref, rms_floor=2000)
    else:
        _compare(mine[:, :1], ref[:, :1], rms_floor=2000)


def test_ogg_writer_pages_reparse():
    """Our Ogg writer's pages re-parse through our own reader with CRC
    checking and correct packet boundaries."""
    from mixlab_tpu.av.ogg import PacketReader

    packets = [(b"\x01vorbis" + bytes(23), 0), (b"A" * 1000, 0), (b"B" * 70000, 512)]
    blob = write_ogg_stream(packets, serial=7)
    pr = PacketReader(check_crc=True)
    got = pr.feed(blob)
    assert [g[1] for g in got] == [p[0] for p in packets]
    assert all(serial == 7 for serial, _ in got)


def test_eos_granule_trims_to_sample_exact_length():
    """Vorbis-over-Ogg: the EOS page's granule position is the stream's
    exact total sample count; the decoder must truncate the final block to
    it (lewton does this inside codec/src/ogg.rs's decode loop).  Encode a
    deliberately non-block-aligned length and check the pure decoder's
    output is sample-exact."""
    avshim = _shim()
    rate = 44100
    n = 44100 + 1234  # not a multiple of any vorbis block size
    t = np.arange(n) / rate
    pcm = (np.stack([np.sin(2 * np.pi * 440 * t),
                     np.sin(2 * np.pi * 660 * t)], 1) * 12000).astype(np.int16)
    enc = avshim.AacEncoder(rate, 2, None, codec="libvorbis")
    headers = parse_xiph_extradata(enc.extradata())
    enc.send(pcm)
    enc.flush()
    frames = [frame for _pts, frame in enc.receive()]
    enc.close()

    packets = [(h, 0) for h in headers]
    for i, frame in enumerate(frames[:-1]):
        packets.append((frame, 0))  # mid-stream granules unused by decode
    packets.append((frames[-1], n))  # EOS page granule = exact length
    blob = write_ogg_stream(packets)

    # whole-blob decode is sample-exact
    stream = OggVorbisStream()
    out = stream.feed(blob)
    assert out.shape == (n, 2), out.shape
    assert stream._eos_granule == n

    # dribble-fed decode (odd chunk sizes) is sample-exact too
    stream2 = OggVorbisStream()
    outs = []
    pos = 0
    k = 0
    while pos < len(blob):
        step = 777 + (k % 5) * 1301
        outs.append(stream2.feed(blob[pos:pos + step]))
        pos += step
        k += 1
    total = sum(len(o) for o in outs)
    assert total == n, total


def test_eos_granule_longer_than_decode_is_harmless():
    """An EOS granule >= the decoded total must not trim anything."""
    avshim = _shim()
    rate = 44100
    n = 8192
    t = np.arange(n) / rate
    pcm = (np.stack([np.sin(2 * np.pi * 300 * t)] * 2, 1) * 9000).astype(np.int16)
    enc = avshim.AacEncoder(rate, 2, None, codec="libvorbis")
    headers = parse_xiph_extradata(enc.extradata())
    enc.send(pcm)
    enc.flush()
    frames = [frame for _pts, frame in enc.receive()]
    enc.close()
    packets = [(h, 0) for h in headers] + [(f, 0) for f in frames[:-1]]
    packets.append((frames[-1], 10_000_000))  # absurdly large granule
    out = OggVorbisStream().feed(write_ogg_stream(packets))
    assert len(out) >= n  # untrimmed (codec padding may exceed n)
