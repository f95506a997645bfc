"""Pure FLAC encoder (av/flacenc.py) verified against an independent
decoder (libavcodec via native/avshim.py) — lossless round trips across
stereo modes, subframe kinds, block sizes, and long frame-number runs."""

import numpy as np
import pytest

from mixlab_tpu.av.flacenc import (
    FlacEncoder,
    PureFlacStream,
    _utf8_coded_number,
    crc8,
    crc16,
)


def _roundtrip(sig: np.ndarray, sample_rate=44100, block=1024):
    """Encode -> decode via libavcodec -> must be bit-exact."""
    from mixlab_tpu.native import avshim

    if not avshim.available() or not avshim.have_decoder("flac"):
        pytest.skip("avshim flac decoder unavailable")
    ch = sig.shape[1]
    st = PureFlacStream(sample_rate, ch, block)
    st.feed(sig)
    frames = st.poll_frames()
    assert frames, "no frames out"
    dec = avshim.AudioDecoder("flac", st.configuration_data())
    out = [pcm for f in frames for _, pcm, _ in dec.decode(f)]
    dec.close()
    got = np.concatenate(out)
    n = (len(sig) // block) * block
    assert got.shape == (n, ch)
    assert np.array_equal(got, sig[:n]), "round trip not lossless"
    return frames


def test_crc_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 over "123456789"
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8
    assert crc8(b"") == 0 and crc16(b"") == 0


def test_utf8_coded_number():
    assert _utf8_coded_number(0) == b"\x00"
    assert _utf8_coded_number(0x7F) == b"\x7F"
    # classic UTF-8 vectors hold for the shared range
    for cp in (0x80, 0x7FF, 0x800, 0xFFFF, 0x10000, 0x10FFFF):
        assert _utf8_coded_number(cp) == chr(cp).encode("utf-8", "surrogatepass")
    # beyond Unicode: FLAC extends the same scheme (6-byte 1111110x lead)
    assert _utf8_coded_number(1 << 30) == bytes(
        [0xFD, 0x80, 0x80, 0x80, 0x80, 0x80]
    )


def test_streaminfo_layout():
    enc = FlacEncoder(48000, 2, 4096)
    si = enc.streaminfo()
    assert len(si) == 34
    assert int.from_bytes(si[0:2], "big") == 4096  # min block
    assert int.from_bytes(si[2:4], "big") == 4096  # max block
    rate = int.from_bytes(si[10:13], "big") >> 4
    assert rate == 48000
    blk = enc.streaminfo_block()
    assert blk[0] == 0x80 and int.from_bytes(blk[1:4], "big") == 34
    assert enc.stream_header().startswith(b"fLaC")


def test_lossless_tonal_stereo():
    n = 1024 * 6
    t = np.arange(n) / 44100
    sig = np.stack(
        [np.sin(2 * np.pi * 440 * t) * 12000,
         np.sin(2 * np.pi * 554 * t) * 11000],
        axis=1,
    ).astype(np.int16)
    frames = _roundtrip(sig)
    # tonal content must actually compress
    assert sum(map(len, frames)) < n * 4 * 0.8


def test_lossless_correlated_channels_use_decorrelation():
    # near-identical channels: side channel is tiny -> left/side or
    # mid/side must win over independent coding
    rng = np.random.default_rng(7)
    base = (np.cumsum(rng.integers(-300, 300, 4096)) % 20000 - 10000).astype(np.int16)
    sig = np.stack([base, (base + rng.integers(-2, 3, 4096)).astype(np.int16)], 1)
    frames = _roundtrip(sig)
    # decode of correlated signal already proves correctness; check size is
    # far below 2x the mono cost (i.e. decorrelation engaged)
    mono = np.ascontiguousarray(sig[:, :1])
    st = PureFlacStream(44100, 1, 1024)
    st.feed(mono)
    mono_bytes = sum(map(len, st.poll_frames()))
    assert sum(map(len, frames)) < mono_bytes * 1.5


def test_lossless_silence_and_constant():
    sig = np.zeros((2048, 2), np.int16)
    frames = _roundtrip(sig)
    # constant subframes: each frame is tiny (header + 2 constants + crc)
    assert all(len(f) < 32 for f in frames)
    dc = np.full((2048, 2), -1234, np.int16)
    _roundtrip(dc)


def test_lossless_fullscale_noise():
    rng = np.random.default_rng(3)
    sig = rng.integers(-32768, 32768, (4096, 2)).astype(np.int16)
    frames = _roundtrip(sig)
    # incompressible: at worst ~verbatim plus small headers
    assert sum(map(len, frames)) < 4096 * 4 * 1.1


def test_lossless_mono_and_odd_blocks():
    rng = np.random.default_rng(11)
    sig = (np.cumsum(rng.integers(-100, 100, (3000, 1)), 0) % 8000).astype(np.int16)
    _roundtrip(sig, block=999)  # non-power-of-two block size


def test_lossless_extreme_values_and_ramps():
    # int16 extremes through the order-4 predictors (residuals > 16 bit)
    sig = np.stack(
        [np.tile([32767, -32768], 2048).astype(np.int16),
         np.linspace(-32768, 32767, 4096).astype(np.int16)],
        axis=1,
    )
    _roundtrip(sig)


def test_many_frames_frame_number_coding():
    # >128 frames exercises multi-byte UTF-8 frame numbers mid-stream
    from mixlab_tpu.native import avshim

    if not avshim.available() or not avshim.have_decoder("flac"):
        pytest.skip("avshim flac decoder unavailable")
    enc = FlacEncoder(44100, 1, 64)
    rng = np.random.default_rng(5)
    dec = avshim.AudioDecoder("flac", enc.streaminfo())
    for k in range(200):
        pcm = rng.integers(-1000, 1000, (64, 1)).astype(np.int16)
        frame = enc.encode_frame(pcm)
        outs = dec.decode(frame)
        assert len(outs) == 1
        assert np.array_equal(outs[0][1], pcm)
    dec.close()
    assert enc.frame_number == 200


def test_standalone_flac_file_plays_in_independent_demuxer(tmp_path):
    """'fLaC' stream header + frames = a complete .flac file readable by
    libavformat (MediaReader)."""
    from mixlab_tpu.native import avshim

    if not avshim.available():
        pytest.skip("avshim unavailable")
    n = 1024 * 4
    t = np.arange(n) / 44100
    sig = np.stack(
        [np.sin(2 * np.pi * 330 * t) * 9000, np.sin(2 * np.pi * 220 * t) * 9000],
        axis=1,
    ).astype(np.int16)
    st = PureFlacStream(44100, 2, 1024)
    st.feed(sig)
    data = st._enc.stream_header()
    # regenerate frames after taking header (frame numbers restart cleanly)
    st2 = PureFlacStream(44100, 2, 1024)
    st2.feed(sig)
    data = st2._enc.stream_header() + b"".join(st2.poll_frames())
    path = tmp_path / "tone.flac"
    path.write_bytes(data)
    r = avshim.MediaReader(str(path))
    assert r.audio and r.audio["rate"] == 44100 and r.audio["channels"] == 2
    pcm = []
    while True:
        item = r.read()
        if item is None:
            break
        if item[0] == "audio":
            pcm.append(item[2])
    r.close()
    got = np.concatenate(pcm)
    assert np.array_equal(got, sig)
