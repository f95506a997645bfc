"""ALSA output backend (io_host/alsa_out.py) against the in-tree fake
libasound (native/fake_asound.cpp): device enumeration via name hints,
S16_LE interleaved playback, and the underrun recover + 3-silence-period
backoff discipline of the reference (output_device.rs:106-137).

No sound stack exists in this image (documented in ROADMAP.md), so the
fake .so is the only way to execute this path; on a real machine the same
ctypes wrapper drives the actual libasound.
"""

import ctypes
import os
import pathlib
import shutil
import subprocess
import time

import numpy as np
import pytest

_SRC = pathlib.Path(__file__).parent.parent / "mixlab_tpu/native/fake_asound.cpp"


@pytest.fixture()
def fake_lib(tmp_path):
    if shutil.which("g++") is None:
        pytest.skip("g++ unavailable")
    so = tmp_path / "libfake_asound.so"
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-o", str(so), str(_SRC)],
        check=True, capture_output=True, timeout=120)
    return so


def _make_backend(monkeypatch, so, log, epipe_at=None):
    from mixlab_tpu.io_host.alsa_out import AlsaAudioBackend

    monkeypatch.setenv("MIXLAB_ALSA_LIB", str(so))
    monkeypatch.setenv("FAKE_ASOUND_LOG", str(log))
    if epipe_at is not None:
        monkeypatch.setenv("FAKE_ASOUND_EPIPE_AT", str(epipe_at))
    else:
        monkeypatch.delenv("FAKE_ASOUND_EPIPE_AT", raising=False)
    return AlsaAudioBackend()


def test_enumeration_filters_capture_devices(monkeypatch, tmp_path, fake_lib):
    backend = _make_backend(monkeypatch, fake_lib, tmp_path / "log")
    devs = backend.devices()
    names = [n for (n, ch) in devs]
    assert names == ["default", "null"]  # "mic" (IOID=Input) filtered out
    assert all(ch == 2 for (_, ch) in devs)
    assert backend.default_device() == "default"


def test_playback_pcm_bytes_exact(monkeypatch, tmp_path, fake_lib):
    log = tmp_path / "log"
    backend = _make_backend(monkeypatch, fake_lib, log)
    stream = backend.open("default", 48000)
    assert stream is not None
    # two blocks of deterministic audio, incl. out-of-range samples (clamp)
    t = np.arange(2048, dtype=np.float32)
    left = np.sin(t * 0.01) * 1.5  # exceeds +-1: must clamp
    right = np.cos(t * 0.02) * 0.25
    frames = np.stack([left, right], axis=1)
    assert stream.write(frames)
    # wait for the consumer thread to drain the ring through writei
    deadline = time.time() + 5.0
    expect = (np.clip(frames, -1, 1) * 32767).astype("<i2").tobytes()
    pcm_path = pathlib.Path(str(log) + ".pcm")
    got = b""
    while time.time() < deadline:
        got = pcm_path.read_bytes() if pcm_path.exists() else b""
        if len(got) >= len(expect):
            break
        time.sleep(0.02)
    stream.close()
    assert got[: len(expect)] == expect
    text = log.read_text()
    assert "open default" in text
    assert "set_params fmt=2 access=3 ch=2 rate=48000" in text
    assert "close" in text


def test_underrun_recover_and_silence_backoff(monkeypatch, tmp_path, fake_lib):
    log = tmp_path / "log"
    backend = _make_backend(monkeypatch, fake_lib, log, epipe_at=0)
    stream = backend.open("default", 44100)
    assert stream is not None
    frames = np.full((256, 2), 0.5, np.float32)
    assert stream.write(frames)
    deadline = time.time() + 5.0
    while time.time() < deadline:
        text = log.read_text() if log.exists() else ""
        if "recover" in text and text.count("writei 256") >= 4:
            break
        time.sleep(0.02)
    stream.close()
    text = log.read_text()
    # first writei hit -EPIPE, then recover, 3 silence periods, retry
    assert "-EPIPE" in text
    assert "recover err=-32" in text
    lines = [l for l in text.splitlines() if l.startswith("writei 256")]
    assert len(lines) >= 5  # failed + 3 silence + retry
    pcm = pathlib.Path(str(log) + ".pcm").read_bytes()
    arr = np.frombuffer(pcm, "<i2").reshape(-1, 2)
    # 3 silence periods then the real data
    assert np.array_equal(arr[: 3 * 256], np.zeros((768, 2), "<i2"))
    assert (arr[3 * 256 : 4 * 256] == int(0.5 * 32767)).all()


def test_get_backend_env_selection(monkeypatch, tmp_path, fake_lib):
    from mixlab_tpu.io_host import audio_out

    saved = audio_out._BACKEND
    try:
        audio_out._BACKEND = None
        monkeypatch.setenv("MIXLAB_AUDIO_BACKEND", "alsa")
        monkeypatch.setenv("MIXLAB_ALSA_LIB", str(fake_lib))
        monkeypatch.setenv("FAKE_ASOUND_LOG", str(tmp_path / "log"))
        backend = audio_out.get_backend()
        assert backend.name == "alsa"
        # explicit "file" selection always yields the WAV spool backend
        audio_out._BACKEND = None
        monkeypatch.setenv("MIXLAB_AUDIO_BACKEND", "file")
        assert audio_out.get_backend().name == "file"
        # explicit "alsa" with a broken lib raises (no silent fallback)
        audio_out._BACKEND = None
        monkeypatch.setenv("MIXLAB_AUDIO_BACKEND", "alsa")
        monkeypatch.setenv("MIXLAB_ALSA_LIB", "/nonexistent/lib.so")
        with pytest.raises(RuntimeError):
            audio_out.get_backend()
    finally:
        audio_out._BACKEND = saved


def test_short_write_continues_with_remainder(monkeypatch, tmp_path, fake_lib):
    """A short writei (device accepted only part of the period) continues
    with the remainder in the bounded loop — the full PCM still lands, in
    order, with no dropped or duplicated frames."""
    log = tmp_path / "log"
    backend = _make_backend(monkeypatch, fake_lib, log)
    monkeypatch.setenv("FAKE_ASOUND_SHORT_AT", "0")
    stream = backend.open("default", 48000)
    assert stream is not None
    t = np.arange(1024, dtype=np.float32)
    frames = np.stack([np.sin(t * 0.013), np.cos(t * 0.007)], axis=1) * 0.8
    assert stream.write(frames)
    expect = (np.clip(frames, -1, 1) * 32767).astype("<i2").tobytes()
    pcm_path = pathlib.Path(str(log) + ".pcm")
    deadline = time.time() + 5.0
    got = b""
    while time.time() < deadline:
        got = pcm_path.read_bytes() if pcm_path.exists() else b""
        if len(got) >= len(expect):
            break
        time.sleep(0.02)
    stream.close()
    assert got[: len(expect)] == expect
    assert "-> short" in log.read_text()
