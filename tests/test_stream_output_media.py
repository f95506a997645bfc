"""StreamOutput controller + MediaSource playback tests."""

import asyncio
import threading
import time

import numpy as np
import pytest

from mixlab_tpu import protocol as p
from mixlab_tpu.engine.config import EngineConfig
from mixlab_tpu.engine.engine import Engine, _MonitorPipe
from mixlab_tpu.engine.project import open_or_create
from mixlab_tpu.io_host import source as source_mod
from mixlab_tpu.io_host.rtmp import server as rtmp_server
from mixlab_tpu.io_host.wav import write_wav
from mixlab_tpu.protocol import InputId, OutputId
from mixlab_tpu.server.stream_output import ConnState, StreamOutputController, parse_rtmp_url

CFG = EngineConfig(sample_rate=44_100)


def test_parse_rtmp_url():
    assert parse_rtmp_url("rtmp://example.com/live") == ("example.com", 1935, "live")
    assert parse_rtmp_url("rtmp://10.0.0.1:19350/app") == ("10.0.0.1", 19350, "app")
    with pytest.raises(ValueError):
        parse_rtmp_url("http://x/y")


def test_impulse_param_semantics():
    ctl = StreamOutputController(_MonitorPipe(), CFG)
    # stale seq rejected
    assert not ctl.update(p.StreamOutputParams(seq=1, connect_seq=0, disconnect_seq=0))
    # seq bump without impulse: params stored, no connect
    assert not ctl.update(p.StreamOutputParams(seq=2, rtmp_url="rtmp://h/app"))
    assert ctl.state == ConnState.OFFLINE
    # while "live", param changes are rejected but disconnect accepted
    ctl.state = ConnState.LIVE
    assert not ctl.update(p.StreamOutputParams(seq=3, rtmp_url="rtmp://other/app"))
    assert ctl.update(
        p.StreamOutputParams(seq=4, disconnect_seq=4, rtmp_url="rtmp://h/app")
    )
    assert ctl.state == ConnState.OFFLINE


def test_connect_failure_sets_error_indication():
    inds = []
    ctl = StreamOutputController(_MonitorPipe(), CFG, indicate=inds.append)
    ctl.update(
        p.StreamOutputParams(
            seq=2, connect_seq=2, rtmp_url="rtmp://127.0.0.1:1/nope", rtmp_stream_key="k"
        )
    )
    deadline = time.time() + 10
    while ctl.state != ConnState.FAILED and time.time() < deadline:
        time.sleep(0.05)
    assert ctl.state == ConnState.FAILED
    assert ctl.error
    assert any(i.value.live == p.StreamOutputLiveStatus.CONNECTING for i in inds)


def test_stream_output_end_to_end_loopback():
    """Engine -> StreamOutputController -> RTMP client -> our RTMP ingest
    server -> mountpoint ring, PCM intact."""
    recv = source_mod.RTMP_MOUNTPOINTS.listen("outloop")

    # rtmp ingest server on an ephemeral port, own loop thread
    loop = asyncio.new_event_loop()
    started = threading.Event()
    port_holder = {}

    def run_server():
        asyncio.set_event_loop(loop)

        async def main():
            async def on_conn(r, w):
                try:
                    await rtmp_server.accept(r, w)
                except (ConnectionError, asyncio.IncompleteReadError):
                    pass

            srv = await asyncio.start_server(on_conn, "127.0.0.1", 0)
            port_holder["port"] = srv.sockets[0].getsockname()[1]
            started.set()
            async with srv:
                await srv.serve_forever()

        try:
            loop.run_until_complete(main())
        except Exception:
            pass

    t = threading.Thread(target=run_server, daemon=True)
    t.start()
    started.wait(5)
    port = port_holder["port"]

    pipe = _MonitorPipe()
    ctl = StreamOutputController(pipe, CFG)
    ctl.update(
        p.StreamOutputParams(
            seq=2,
            connect_seq=2,
            rtmp_url=f"rtmp://127.0.0.1:{port}/outloop",
            rtmp_stream_key="key",
        )
    )
    deadline = time.time() + 10
    while ctl.state != ConnState.LIVE and time.time() < deadline:
        time.sleep(0.05)
    assert ctl.state == ConnState.LIVE

    # feed ticks like the engine does
    spt = CFG.samples_per_tick
    tone = np.sin(2 * np.pi * 440 * np.arange(spt) / CFG.sample_rate).astype(np.float32)
    audio = np.stack([tone, tone], -1)
    for k in range(4):
        pipe.push((k * spt, audio, None))
        time.sleep(0.03)

    deadline = time.time() + 10
    frames = []
    while time.time() < deadline and len(frames) < 2:
        f = recv.read_audio()
        if f is not None:
            frames.append(f)
        time.sleep(0.02)
    assert len(frames) >= 2, "no PCM arrived over RTMP loopback"
    got = frames[0].data[:, 0].astype(np.float32) / 32767.0
    np.testing.assert_allclose(got, tone, atol=2e-4)

    ctl.disconnect()
    ctl.stop()
    loop.call_soon_threadsafe(loop.stop)
    recv.close()


def test_media_source_wav_playback(tmp_path):
    proj = open_or_create(tmp_path / "media.mixlab", CFG)
    # upload a 0.5 s 330 Hz WAV at engine rate
    n = CFG.sample_rate // 2
    tone = (np.sin(2 * np.pi * 330 * np.arange(n) / CFG.sample_rate) * 20000).astype(
        np.int16
    )
    wav_path = tmp_path / "tone.wav"
    write_wav(wav_path, CFG.sample_rate, np.stack([tone, tone], -1))
    media_id = proj.upload_media("tone.wav", "audio/wav", [wav_path.read_bytes()])

    eng = proj.engine
    sid, _, _ = eng.connect_session()
    eng.update(sid, p.WorkspaceMessage(1, p.CreateModule(
        p.ModuleParams("MediaSource", p.MediaSourceParams(media_id=media_id)),
        p.WindowGeometry())))
    eng.update(sid, p.WorkspaceMessage(2, p.CreateModule(
        p.ModuleParams("Monitor", None), p.WindowGeometry())))
    eng.update(sid, p.WorkspaceMessage(3, p.CreateConnection(
        InputId(p.ModuleId(2), 1), OutputId(p.ModuleId(1), 1))))

    # let the decode thread fill, then run ticks
    time.sleep(0.3)
    peak = 0.0
    for _ in range(20):
        eng.tick_once()
        pipe = eng.monitor_pipe(p.ModuleId(2))
        while True:
            try:
                _, audio, _ = pipe.q.get_nowait()
            except Exception:
                break
            peak = max(peak, float(np.abs(audio).max()))
        time.sleep(0.01)
    assert peak > 0.5, f"media playback silent (peak={peak})"
    proj.close()


def test_media_source_ogg_vorbis_playback(tmp_path):
    """An Ogg/Vorbis file from the media library plays through MediaSource
    via the pure Vorbis decoder (reference decodes via ffmpeg,
    media_source.rs:185-292; Vorbis bar set by codec/src/ogg.rs)."""
    import pathlib

    ogg_bytes = pathlib.Path(
        "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.ogg"
    ).read_bytes()
    proj = open_or_create(tmp_path / "media_ogg.mixlab", CFG)
    media_id = proj.upload_media("house_lo.ogg", "application/ogg", [ogg_bytes])

    eng = proj.engine
    sid, _, _ = eng.connect_session()
    eng.update(sid, p.WorkspaceMessage(1, p.CreateModule(
        p.ModuleParams("MediaSource", p.MediaSourceParams(media_id=media_id)),
        p.WindowGeometry())))
    eng.update(sid, p.WorkspaceMessage(2, p.CreateModule(
        p.ModuleParams("Monitor", None), p.WindowGeometry())))
    eng.update(sid, p.WorkspaceMessage(3, p.CreateConnection(
        InputId(p.ModuleId(2), 1), OutputId(p.ModuleId(1), 1))))

    time.sleep(0.5)
    peak = 0.0
    for _ in range(30):
        eng.tick_once()
        pipe = eng.monitor_pipe(p.ModuleId(2))
        while True:
            try:
                _, audio, _ = pipe.q.get_nowait()
            except Exception:
                break
            peak = max(peak, float(np.abs(audio).max()))
        time.sleep(0.01)
    assert peak > 0.3, f"ogg playback silent (peak={peak})"
    proj.close()
