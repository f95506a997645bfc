"""End-to-end video dataflow through the engine: ingest ring -> stream_input
-> video_mixer -> monitor."""

import queue

import numpy as np

from mixlab_tpu import protocol as p
from mixlab_tpu.engine.config import EngineConfig
from mixlab_tpu.engine.engine import Engine
from mixlab_tpu.io_host import source as source_mod
from mixlab_tpu.protocol import InputId, OutputId
from mixlab_tpu.utils.mtime import MediaDuration, MediaTime
from mixlab_tpu.video.frame import VideoFrame
from mixlab_tpu.video.pattern import pattern_picture

CFG = EngineConfig(sample_rate=44_100)


def msg(seq, op):
    return p.WorkspaceMessage(seq, op)


def test_video_flows_ring_to_monitor():
    eng = Engine(cfg=CFG)
    sid, _, _ = eng.connect_session()

    eng.update(sid, msg(1, p.CreateModule(
        p.ModuleParams("StreamInput", p.StreamInputParams(p.StreamProtocol.RTMP, "vtest")),
        p.WindowGeometry())))
    eng.update(sid, msg(2, p.CreateModule(
        p.ModuleParams("VideoMixer", p.VideoMixerParams(a=0, b=None, fader=1.0)),
        p.WindowGeometry())))
    eng.update(sid, msg(3, p.CreateModule(p.ModuleParams("Monitor", None), p.WindowGeometry())))
    si, vm, mon = p.ModuleId(1), p.ModuleId(2), p.ModuleId(3)
    # stream_input video (out 0) -> video_mixer input 0
    eng.update(sid, msg(4, p.CreateConnection(InputId(vm, 0), OutputId(si, 0))))
    # video_mixer composite (out 0) -> monitor video (in 0)
    eng.update(sid, msg(5, p.CreateConnection(InputId(mon, 0), OutputId(vm, 0))))
    # stream_input audio -> monitor audio too
    eng.update(sid, msg(6, p.CreateConnection(InputId(mon, 1), OutputId(si, 1))))

    # publish a frame into the mountpoint ring like RTMP ingest would
    send = source_mod.RTMP_MOUNTPOINTS.connect("vtest")
    frame = VideoFrame(
        pattern_picture("bars", 64, 48),
        duration_hint=MediaDuration.new(2, CFG.ticks_per_second),
    )
    send.write_audio(MediaTime.zero(), np.ones((735, 2), dtype=np.int16) * 1000)
    send.write_video(MediaTime.zero(), frame)

    eng.tick_once()
    pipe = eng.monitor_pipe(mon)
    t0, audio, video = pipe.q.get(timeout=2.0)
    assert video is not None, "no composited frame reached the monitor"
    # composite is chroma-aligned 64x48 yuv420p
    assert video.picture.settings.width == 64
    assert video.picture.settings.height == 48
    # fader=1.0 selects channel A entirely: composite equals the stored frame
    a_stored = eng._video_mixers[vm].channels[0].stored
    np.testing.assert_array_equal(
        np.asarray(video.picture.planes["y"]), np.asarray(a_stored.planes["y"])
    )
    # audio converted i16 -> f32 (/32768)
    assert abs(float(audio[0, 0]) - 1000 / 32768.0) < 1e-6

    # next tick: stored frame still active (2-tick duration) -> composite still produced
    eng.tick_once()
    t0, audio, video = pipe.q.get(timeout=2.0)
    assert video is not None
    # third tick: frame expired -> no output
    eng.tick_once()
    t0, audio, video = pipe.q.get(timeout=2.0)
    assert video is None
    send.close()
    eng._stream_feeds[si].set_recv(None)
