"""Host engine tests: ops, op-log/sync, feeds, taps, state carry."""

import queue

import numpy as np
import pytest

from mixlab_tpu import protocol as p
from mixlab_tpu.engine.config import EngineConfig
from mixlab_tpu.engine.engine import Busy, Engine, OpClock, SyncEvent, UpdateEvent
from mixlab_tpu.engine.feeds import StreamInputFeed
from mixlab_tpu.io_host.source import Registry
from mixlab_tpu.protocol import InputId, OutputId
from mixlab_tpu.utils.mtime import MediaTime

CFG = EngineConfig(sample_rate=44_100)


def msg(seq, op):
    return p.WorkspaceMessage(sequence=seq, op=op)


def drain(q):
    out = []
    while True:
        try:
            out.append(q.get_nowait())
        except queue.Empty:
            return out


def test_engine_create_connect_render_and_oplog():
    eng = Engine(cfg=CFG)
    sid, state, events = eng.connect_session()
    assert state.modules == []

    eng.client_update(
        sid,
        msg(1, p.CreateModule(
            p.ModuleParams("Oscillator", p.OscillatorParams(440.0, p.Waveform.SINE)),
            p.WindowGeometry(),
        )),
    )
    eng.client_update(
        sid, msg(2, p.CreateModule(p.ModuleParams("Monitor", None), p.WindowGeometry()))
    )
    osc_id, mon_id = p.ModuleId(1), p.ModuleId(2)
    eng.client_update(
        sid, msg(3, p.CreateConnection(InputId(mon_id, 1), OutputId(osc_id, 1)))
    )

    evs = drain(events)
    kinds = [type(e).__name__ for e in evs]
    assert kinds.count("SyncEvent") == 3
    updates = [e.update for e in evs if isinstance(e, UpdateEvent)]
    assert any(isinstance(u, p.SUCreateModule) for u in updates)
    assert any(isinstance(u, p.SUCreateConnection) for u in updates)
    syncs = [e.clock for e in evs if isinstance(e, SyncEvent)]
    assert syncs == [OpClock(sid, 1), OpClock(sid, 2), OpClock(sid, 3)]

    # run ticks; the monitor codec thread broadcasts packets (pcm+png mode
    # sends one audio packet per tick; fmp4 mode needs an AAC granule's
    # worth of samples before the first media segment)
    pipeline = eng._monitor_pipelines[mon_id]
    sub = pipeline.broadcast.subscribe()
    import time as _time

    got = None
    deadline = _time.time() + 10
    while _time.time() < deadline and got is None:
        eng.tick_once()
        try:
            pkt = sub.get(timeout=0.1)
        except queue.Empty:
            continue
        header, _, _payload = pkt.partition(b"\n")
        if b'"audio"' in header or b'"segment"' in header:
            got = header
    assert got is not None


def test_engine_param_edit_keeps_dsp_state():
    eng = Engine(cfg=CFG)
    sid, _, _ = eng.connect_session()
    eng.client_update(
        sid,
        msg(1, p.CreateModule(
            p.ModuleParams("Oscillator", p.OscillatorParams(200.0, p.Waveform.SINE)),
            p.WindowGeometry(),
        )),
    )
    eng.client_update(
        sid,
        msg(2, p.CreateModule(
            p.ModuleParams("EqThree", p.EqThreeParams(p.Decibel(4.0), p.Decibel(0.0), p.Decibel(4.0))),
            p.WindowGeometry(),
        )),
    )
    eng.client_update(
        sid, msg(3, p.CreateModule(p.ModuleParams("Plotter", None), p.WindowGeometry()))
    )
    osc_id, eq_id, plot_id = p.ModuleId(1), p.ModuleId(2), p.ModuleId(3)
    # need a stereo consumer for eq mono; use panner -> plotter
    eng.client_update(
        sid, msg(4, p.CreateModule(p.ModuleParams("StereoPanner", None), p.WindowGeometry()))
    )
    pan_id = p.ModuleId(4)
    eng.client_update(sid, msg(5, p.CreateConnection(InputId(eq_id, 0), OutputId(osc_id, 0))))
    eng.client_update(sid, msg(6, p.CreateConnection(InputId(pan_id, 0), OutputId(eq_id, 0))))
    eng.client_update(sid, msg(7, p.CreateConnection(InputId(pan_id, 1), OutputId(eq_id, 0))))
    eng.client_update(sid, msg(8, p.CreateConnection(InputId(plot_id, 0), OutputId(pan_id, 0))))

    for _ in range(3):
        eng.tick_once()
    poles_before = np.asarray(eng._state[str(eq_id.value)]["poles"])
    assert np.abs(poles_before).max() > 0  # filter has state

    # gain edit: aux-only, state kept
    eng.client_update(
        sid,
        msg(9, p.UpdateModuleParams(
            eq_id,
            p.ModuleParams("EqThree", p.EqThreeParams(p.Decibel(-3.0), p.Decibel(0.0), p.Decibel(0.0))),
        )),
    )
    poles_after = np.asarray(eng._state[str(eq_id.value)]["poles"])
    np.testing.assert_array_equal(poles_before, poles_after)


def test_engine_busy_on_full_cmd_queue():
    eng = Engine(cfg=CFG)
    eng._thread = object()  # simulate a busy engine thread (no direct-drive)
    # queue fills at 8 (engine.rs:74)
    for i in range(8):
        eng.update(1, msg(i + 1, p.DeleteConnection(InputId(p.ModuleId(1), 0))))
    with pytest.raises(Busy):
        eng.update(1, msg(9, p.DeleteConnection(InputId(p.ModuleId(1), 0))))


def test_plotter_indication_every_6_ticks():
    eng = Engine(cfg=CFG)
    sid, _, events = eng.connect_session()
    eng.client_update(
        sid,
        msg(1, p.CreateModule(
            p.ModuleParams("Oscillator", p.OscillatorParams(440.0, p.Waveform.SINE)),
            p.WindowGeometry(),
        )),
    )
    eng.client_update(
        sid, msg(2, p.CreateModule(p.ModuleParams("Plotter", None), p.WindowGeometry()))
    )
    eng.client_update(
        sid, msg(3, p.CreateConnection(InputId(p.ModuleId(2), 0), OutputId(p.ModuleId(1), 1)))
    )
    drain(events)
    inds = []
    for _ in range(12):
        inds.extend(eng.tick_once().values())
    assert len(inds) == 2  # ticks 6 and 12
    assert isinstance(inds[0].value, p.PlotterIndication)
    assert len(inds[0].value.inputs[0]) == CFG.samples_per_tick


def test_stream_input_feed_epoch_and_carry():
    reg = Registry()
    recv = reg.listen("mount")
    send = reg.connect("mount")

    feed = StreamInputFeed(CFG)
    feed.recv = recv

    # producer writes 1000-sample frames of a ramp
    ramp = (np.arange(2000, dtype=np.int16) % 1000).astype(np.int16)
    data = np.stack([ramp[:1000], ramp[:1000]], -1)
    send.write_audio(MediaTime.new(0, 1), data)
    send.write_audio(MediaTime.new(1000, 44100), data)

    spt = CFG.samples_per_tick  # 735
    pcm, video = feed.fill_tick(0, spt)
    assert video is None
    np.testing.assert_array_equal(pcm[:, 0], ramp[:735])
    # second tick: remainder of frame 1 (265) + start of frame 2 (470)
    pcm2, _ = feed.fill_tick(spt, spt)
    np.testing.assert_array_equal(pcm2[:265, 0], ramp[735:1000])
    np.testing.assert_array_equal(pcm2[265:, 0], ramp[:470])
    # third tick: rest of frame 2 (530) then zeros
    pcm3, _ = feed.fill_tick(2 * spt, spt)
    np.testing.assert_array_equal(pcm3[:530, 0], ramp[470:1000])
    np.testing.assert_array_equal(pcm3[530:, 0], np.zeros(spt - 530, np.int16))


def test_monitor_pipe_drop_on_full():
    from mixlab_tpu.engine.engine import _MonitorPipe

    pipe = _MonitorPipe()
    assert pipe.push(1) and pipe.push(2)
    assert not pipe.push(3)  # depth 2, drop (monitor.rs:164-176)
    assert pipe.dropped == 1


def test_checkpoint_restore_dsp_state():
    eng = Engine(cfg=CFG)
    sid, _, _ = eng.connect_session()
    eng.client_update(
        sid,
        msg(1, p.CreateModule(
            p.ModuleParams("Oscillator", p.OscillatorParams(300.0, p.Waveform.SINE)),
            p.WindowGeometry(),
        )),
    )
    eng.client_update(
        sid,
        msg(2, p.CreateModule(
            p.ModuleParams("EqThree", p.EqThreeParams()), p.WindowGeometry()
        )),
    )
    eng.client_update(
        sid, msg(3, p.CreateModule(p.ModuleParams("StereoPanner", None), p.WindowGeometry()))
    )
    eng.client_update(sid, msg(4, p.CreateConnection(InputId(p.ModuleId(2), 0), OutputId(p.ModuleId(1), 0))))
    eng.client_update(sid, msg(5, p.CreateConnection(InputId(p.ModuleId(3), 0), OutputId(p.ModuleId(2), 0))))
    for _ in range(2):
        eng.tick_once()
    ckpt = eng.checkpoint()
    poles = np.asarray(eng._state["2"]["poles"])

    eng2 = Engine(workspace=__import__("mixlab_tpu.engine.graph", fromlist=["Workspace"]).Workspace.from_persist(ckpt["workspace"]), cfg=CFG)
    eng2.restore_dsp_state(ckpt)
    np.testing.assert_array_equal(np.asarray(eng2._state["2"]["poles"]), poles)
    assert eng2.tick == eng.tick


def test_output_device_channel_mapping():
    """Engine L/R map to arbitrary device channels; unmapped channels stay
    silent and clip is detected on mapped samples only
    (output_device.rs:188-208)."""
    from mixlab_tpu.io_host import audio_out

    class CaptureStream:
        def __init__(self, channels):
            self.channels = channels
            self.writes = []

        def write(self, frames):
            self.writes.append(np.array(frames))
            return True

        def close(self):
            pass

    class CaptureBackend:
        name = "capture"

        def __init__(self):
            self.stream = CaptureStream(4)

        def devices(self):
            return [("quad", 4)]

        def default_device(self):
            return "quad"

        def open(self, device, rate):
            return self.stream if device == "quad" else None

    backend = CaptureBackend()
    saved = audio_out.get_backend()
    audio_out.set_backend(backend)
    try:
        eng = Engine(cfg=CFG)
        sid, _, _ = eng.connect_session()
        eng.client_update(sid, msg(1, p.CreateModule(
            p.ModuleParams("Oscillator", p.OscillatorParams(440.0, p.Waveform.SINE)),
            p.WindowGeometry())))
        eng.client_update(sid, msg(2, p.CreateModule(
            p.ModuleParams(
                "OutputDevice",
                p.OutputDeviceParams(device="quad", left=3, right=None),
            ),
            p.WindowGeometry())))
        eng.client_update(sid, msg(3, p.CreateConnection(
            InputId(p.ModuleId(2), 0), OutputId(p.ModuleId(1), 1))))
        eng.tick_once()
        assert backend.stream.writes, "no frames reached the device"
        frames = backend.stream.writes[0]
        assert frames.shape[1] == 4
        # engine L lands on device channel 3; everything else silent
        assert np.max(np.abs(frames[:, 3])) > 0.1
        assert np.all(frames[:, :3] == 0.0)
        # a unity sine never clips
        assert p.ModuleId(2) not in eng._clip_times
    finally:
        audio_out.set_backend(saved)
