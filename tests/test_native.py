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
