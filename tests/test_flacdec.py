"""Pure FLAC decoder (av/flacdec.py): lossless against (a) libavcodec's
ENCODER output — which exercises LPC subframes, rice partitions, and
stereo modes our own encoder never emits — and (b) our own encoder; plus
corruption detection via the CRCs, and zero-dep media playback."""

import numpy as np
import pytest

from mixlab_tpu.av.flacdec import FlacDecoder, FlacError, decode_flac_file
from mixlab_tpu.av.flacenc import FlacEncoder, PureFlacStream


def _sig(n=4096 * 4, seed=1):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 44100
    return np.stack(
        [np.sin(2 * np.pi * 440 * t) * 12000 + rng.integers(-500, 500, n),
         np.sin(2 * np.pi * 554 * t) * 11000 + rng.integers(-500, 500, n)],
        axis=1,
    ).astype(np.int16)


def _libav_flac(sig, rate=44100):
    from mixlab_tpu.native import avshim

    if not (avshim.available() and avshim.have_encoder("flac")):
        pytest.skip("libavcodec flac encoder unavailable")
    enc = avshim.AacEncoder(rate, sig.shape[1], None, codec="flac")
    ed = enc.extradata()
    enc.send(sig)
    enc.flush()
    frames = [f for _p, f in enc.receive()]
    enc.close()
    return ed, frames


def test_decodes_libavcodec_lpc_streams():
    sig = _sig()
    ed, frames = _libav_flac(sig)
    dec = FlacDecoder(ed)
    assert dec.sample_rate == 44100 and dec.channels == 2 and dec.bps == 16
    pcm = dec.decode_stream(b"".join(frames))
    m = min(len(pcm), len(sig))
    assert m >= len(sig) - 8192  # encoder may hold a tail frame
    assert np.array_equal(pcm[:m], sig[:m].astype(np.int32))


def test_decodes_libavcodec_mono_and_noise():
    rng = np.random.default_rng(9)
    mono = rng.integers(-32768, 32768, (8192, 1)).astype(np.int16)
    ed, frames = _libav_flac(mono)
    pcm = FlacDecoder(ed).decode_stream(b"".join(frames))
    m = min(len(pcm), len(mono))
    assert np.array_equal(pcm[:m], mono[:m].astype(np.int32))


def test_roundtrip_own_encoder_all_modes():
    # correlated channels force decorrelated modes; noise forces verbatim;
    # silence forces constant
    cases = [_sig(),
             np.zeros((2048, 2), np.int16),
             np.random.default_rng(3).integers(
                 -32768, 32768, (4096, 2)).astype(np.int16)]
    for sig in cases:
        st = PureFlacStream(44100, 2, 1024)
        st.feed(sig)
        blob = b"".join(st.poll_frames())
        pcm = FlacDecoder(st.configuration_data()).decode_stream(blob)
        m = (len(sig) // 1024) * 1024
        assert np.array_equal(pcm[:m], sig[:m].astype(np.int32))


def test_crc_detects_corruption():
    sig = _sig(4096)
    enc = FlacEncoder(44100, 2, 1024)
    frame = enc.encode_frame(sig[:1024])
    dec = FlacDecoder(FlacEncoder(44100, 2, 1024).streaminfo())
    ok, _ = dec.decode_frame(frame)
    assert ok.shape == (1024, 2)
    bad = bytearray(frame)
    bad[len(bad) // 2] ^= 0x40
    with pytest.raises(FlacError):
        dec.decode_frame(bytes(bad))


def test_decode_flac_file_whole():
    sig = _sig(4096)
    st = PureFlacStream(44100, 2, 1024)
    header = st._enc.stream_header()  # taken before any frames: numbering 0
    st.feed(sig)
    blob = header + b"".join(st.poll_frames())
    pcm, rate, bps = decode_flac_file(blob)
    assert rate == 44100 and bps == 16
    assert np.array_equal(pcm, sig[: len(pcm)].astype(np.int32))


def test_media_player_flac_playback(tmp_path):
    """A .flac upload plays through the PURE decoder path (no shim)."""
    import time

    from mixlab_tpu.engine.config import EngineConfig
    from mixlab_tpu.engine.feeds import MediaSourceFeed
    from mixlab_tpu.engine.media_player import MediaPlayer
    from mixlab_tpu.engine.project import open_or_create

    n = 44100
    t = np.arange(n) / 44100
    sig = (np.stack([np.sin(2 * np.pi * 440 * t)] * 2, 1) * 12000
           ).astype(np.int16)
    st = PureFlacStream(44100, 2, 4096)
    st.feed(sig)
    blob = st._enc.stream_header() + b"".join(st.poll_frames())

    cfg = EngineConfig(sample_rate=44_100)
    proj = open_or_create(tmp_path / "flac.mixlab", cfg)
    media_id = proj.upload_media("tone.flac", "audio/flac", [blob])
    stream = proj.base.open_media(media_id)
    feed = MediaSourceFeed(cfg)
    player = MediaPlayer(stream, feed, cfg)
    player.start()
    try:
        blocks = []
        deadline = time.time() + 10
        while time.time() < deadline and sum(map(len, blocks)) < 8192:
            try:
                blocks.append(feed.queue.get(timeout=1.0))
            except Exception:
                pass
        pcm = np.concatenate(blocks)
        assert len(pcm) >= 8192
        body = pcm[1024:, 0].astype(np.float64)
        spec = np.abs(np.fft.rfft(body * np.hanning(len(body))))
        peak_hz = np.argmax(spec) * 44100 / len(body)
        assert abs(peak_hz - 440.0) < 10.0, peak_hz
    finally:
        player.stop()
        player.join(timeout=5)
        proj.engine.stop()
        proj.close()


def test_media_player_flac_trailing_junk_loops(tmp_path):
    """A FLAC file with trailing non-frame bytes (appended ID3v1 tag) must
    keep looping — the junk is skipped after the last decoded frame rather
    than ending playback (round-2 advisor finding)."""
    import time

    from mixlab_tpu.engine.config import EngineConfig
    from mixlab_tpu.engine.feeds import MediaSourceFeed
    from mixlab_tpu.engine.media_player import MediaPlayer
    from mixlab_tpu.engine.project import open_or_create

    n = 4096  # one frame's worth: loops fast
    t = np.arange(n) / 44100
    sig = (np.stack([np.sin(2 * np.pi * 440 * t)] * 2, 1) * 12000
           ).astype(np.int16)
    st = PureFlacStream(44100, 2, 4096)
    st.feed(sig)
    blob = st._enc.stream_header() + b"".join(st.poll_frames())
    blob += b"TAG" + b"\x00" * 125  # ID3v1 tail

    cfg = EngineConfig(sample_rate=44_100)
    proj = open_or_create(tmp_path / "flacjunk.mixlab", cfg)
    media_id = proj.upload_media("tone.flac", "audio/flac", [blob])
    feed = MediaSourceFeed(cfg)
    player = MediaPlayer(proj.base.open_media(media_id), feed, cfg)
    player.start()
    try:
        total = 0
        deadline = time.time() + 10
        # > n samples received proves the file looped past the junk tail
        while time.time() < deadline and total < n + 4096:
            try:
                total += len(feed.queue.get(timeout=1.0))
            except Exception:
                pass
        assert total > n, "playback ended at the junk tail instead of looping"
    finally:
        player.stop()
        player.join(timeout=5)
        proj.engine.stop()
        proj.close()
