"""Async compile-and-swap: the realtime engine keeps ticking through
structural edits; the new program becomes live once warm."""

import time

import numpy as np

from mixlab_tpu import protocol as p
from mixlab_tpu.engine.config import EngineConfig
from mixlab_tpu.engine.engine import Engine
from mixlab_tpu.protocol import InputId, OutputId

CFG = EngineConfig(sample_rate=44_100)


def test_engine_keeps_ticking_through_structural_edit():
    eng = Engine(cfg=CFG)
    eng.start()
    try:
        time.sleep(0.5)
        sid, _, _ = eng.connect_session()
        t_before = eng.tick

        # structural edit: triggers async compile on the engine thread's side
        eng.update(sid, p.WorkspaceMessage(1, p.CreateModule(
            p.ModuleParams("Oscillator", p.OscillatorParams(440.0, p.Waveform.SINE)),
            p.WindowGeometry())))
        eng.update(sid, p.WorkspaceMessage(2, p.CreateModule(
            p.ModuleParams("Monitor", None), p.WindowGeometry())))
        eng.update(sid, p.WorkspaceMessage(3, p.CreateConnection(
            InputId(p.ModuleId(2), 1), OutputId(p.ModuleId(1), 1))))

        # ticks must keep flowing at ~60 Hz during compilation
        time.sleep(1.0)
        t_during = eng.tick
        assert t_during - t_before > 30, "engine stalled during compile"

        # eventually the new program is live and the monitor streams audio
        pipeline = eng._monitor_pipelines[p.ModuleId(2)]
        sub = pipeline.broadcast.subscribe()
        deadline = time.time() + 60
        got_audio = False
        while time.time() < deadline:
            try:
                pkt = sub.get(timeout=1.0)
            except Exception:
                continue
            header, _, pcm = pkt.partition(b"\n")
            if b'"audio"' in header:
                samples = np.frombuffer(pcm, dtype="<i2")
                if np.abs(samples).max() > 16000:
                    got_audio = True
                    break
        assert got_audio, "new program never became live"
    finally:
        eng.stop()
