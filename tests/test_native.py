"""C++ native layer tests (build + ctypes bindings + semantics)."""

import threading

import numpy as np
import pytest

from mixlab_tpu import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")


def test_ring_push_pop_wraparound():
    ring = native.NativeByteRing(1024)
    assert ring.capacity == 1024
    data = bytes(range(256))
    # fill beyond one wrap
    for _ in range(3):
        assert ring.push(data)
        assert ring.pop(256) == data
    # all-or-nothing push on full
    big = b"x" * 1024
    assert ring.push(big)
    assert not ring.push(b"y")  # full
    assert ring.pop(1024) == big
    ring.close()


def test_ring_spsc_threads():
    ring = native.NativeByteRing(1 << 16)
    total = 4096 * 488
    chunk = 4096
    payload = np.random.default_rng(0).integers(0, 256, chunk, dtype=np.uint8).tobytes()
    received = []

    def producer():
        sent = 0
        while sent < total:
            if ring.push(payload):
                sent += chunk

    def consumer():
        got = 0
        while got < total:
            data = ring.pop(chunk)
            if data:
                received.append(data)
                got += len(data)

    t1 = threading.Thread(target=producer)
    t2 = threading.Thread(target=consumer)
    t1.start(); t2.start()
    t1.join(10); t2.join(10)
    blob = b"".join(received)
    assert len(blob) == total
    # content integrity: every chunk equals payload
    for i in range(0, total, chunk):
        assert blob[i : i + chunk] == payload[: min(chunk, total - i)]
    ring.close()


def test_pcm_conversions_match_semantics():
    x = np.array([-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0], dtype=np.float32)
    got = native.pcm_f32_to_i16(x)
    want = (np.clip(x, -1, 1) * 32767.0).astype(np.int16)
    np.testing.assert_array_equal(got, want)

    i = np.array([-32768, -1, 0, 1, 32767], dtype=np.int16)
    got = native.pcm_i16_to_f32(i)
    np.testing.assert_allclose(got, i.astype(np.float32) / 32768.0, rtol=0)


def test_ws_unmask():
    rng = np.random.default_rng(1)
    payload = rng.integers(0, 256, 1001, dtype=np.uint8).tobytes()
    mask = b"\x12\x34\x56\x78"
    want = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    assert native.ws_unmask(payload, mask) == want


def test_crossfade_u8_matches_reference_semantics():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, 10000, dtype=np.uint8)
    b = rng.integers(0, 256, 10000, dtype=np.uint8)
    for fade in (0, 1, 127, 200, 255):
        got = native.crossfade_u8(a, b, fade)
        want = ((a.astype(np.uint32) * fade + b.astype(np.uint32) * (255 - fade)) // 255).astype(np.uint8)
        np.testing.assert_array_equal(got, want)


def test_media_reader_callback_io_multiblob(tmp_path):
    """Callback-IO demux (avshim_media_open_io): a >2 MiB WAV stored as
    multiple 1 MiB project blobs plays straight from the ReadStream — no
    temp-file spool — and the seek-to-zero loop works.  Mirrors the
    reference's IoReader->AVIO bridge (codec/src/ffmpeg/ioctx.rs:15-100 +
    src/project/stream.rs:113-190)."""
    import numpy as np
    import pytest

    from mixlab_tpu.engine.project import ProjectBase
    from mixlab_tpu.io_host.wav import write_wav
    from mixlab_tpu.native import avshim

    if not avshim.available():
        pytest.skip("avshim unavailable")

    # >2 MiB of 44.1 kHz stereo i16 (anything avformat probes)
    n = 44100 * 13
    t = np.arange(n) / 44100.0
    pcm = (np.stack([np.sin(2 * np.pi * 440 * t),
                     np.sin(2 * np.pi * 660 * t)], 1) * 12000).astype(np.int16)
    wav_path = tmp_path / "big.wav"
    write_wav(wav_path, 44100, pcm)
    data = wav_path.read_bytes()
    assert len(data) > 2 * 1024 * 1024

    base = ProjectBase(tmp_path / "p.mixlab")
    ws = base.create_stream()
    ws.write(data)
    sid = ws.finalize()
    # really multi-blob
    blobs = base.query_all("SELECT offset FROM blobs WHERE stream_id = ?",
                           (sid,))
    assert len(blobs) >= 3

    stream = base.open_stream(sid)
    r = avshim.MediaReader.from_reader(stream)
    try:
        assert r.audio and r.audio["rate"] == 44100
        got = []
        while sum(len(p) for p in got) < n:
            item = r.read()
            if item is None:
                break
            kind, _pts, payload = item
            if kind == "audio":
                got.append(payload)
        full = np.concatenate(got)
        assert len(full) == n
        # bit-exact PCM through the demux path
        assert np.array_equal(full[:4096], pcm[:4096])
        # seek-to-zero loop: same first samples again
        r.seek_start()
        item = r.read()
        assert item is not None and item[0] == "audio"
        assert np.array_equal(item[2][:1024], pcm[:1024])
        assert r.io_error is None
    finally:
        r.close()
        base.close()


def test_media_reader_callback_io_error_side_channel(tmp_path):
    """A reader that explodes mid-stream surfaces through the error
    side-channel instead of crashing the process (panic-safe callbacks,
    ioctx.rs error channel analogue)."""
    import numpy as np
    import pytest

    from mixlab_tpu.io_host.wav import write_wav
    from mixlab_tpu.native import avshim

    if not avshim.available():
        pytest.skip("avshim unavailable")

    n = 44100
    pcm = (np.zeros((n, 2))).astype(np.int16)
    wav_path = tmp_path / "x.wav"
    write_wav(wav_path, 44100, pcm)
    data = wav_path.read_bytes()

    class ExplodingReader:
        def __init__(self):
            self.pos = 0
            self.size = len(data)
            self.reads = 0

        def read(self, nbytes):
            self.reads += 1
            if self.reads > 2:
                raise RuntimeError("disk on fire")
            out = data[self.pos : self.pos + nbytes]
            self.pos += len(out)
            return out

        def seek(self, pos, whence=0):
            self.pos = pos if whence == 0 else (
                self.pos + pos if whence == 1 else self.size + pos)
            return self.pos

    rd = ExplodingReader()
    try:
        r = avshim.MediaReader.from_reader(rd)
    except avshim.ShimError:
        assert isinstance(rd, ExplodingReader)  # open failed cleanly
        return
    try:
        while r.read() is not None:
            pass
        assert isinstance(r.io_error, RuntimeError)
    finally:
        r.close()
