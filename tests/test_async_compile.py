"""Async compile-and-swap: the realtime engine keeps ticking through
structural edits; the new program becomes live once warm."""

import time

import numpy as np

from mixlab_tpu import protocol as p
from mixlab_tpu.engine.config import EngineConfig
from mixlab_tpu.engine.engine import Engine
from mixlab_tpu.protocol import InputId, OutputId

CFG = EngineConfig(sample_rate=44_100)


def test_engine_keeps_ticking_through_structural_edit(monkeypatch):
    # force the always-available monitor mode: this test is about the
    # async-compile path, not codec backends
    from mixlab_tpu.server import monitor as monitor_mod

    monkeypatch.setattr(monitor_mod, "fmp4_capable", lambda: False)
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


def test_edit_storm_never_adopts_stale_patch(monkeypatch):
    """Fire rapid structural edits while ticking; the engine must only ever
    adopt a patch compiled at the latest structural generation (VERDICT r1
    race: stale patch adopted while prepare_aux runs on a newer workspace)."""
    eng = Engine(cfg=CFG)

    adopted_gens = []
    orig_adopt = Engine._adopt_patch

    def tracking_adopt(self, patch):
        # record which generation the engine considered current at adopt time
        adopted_gens.append((getattr(patch, "structural_fingerprint", None),
                             self._compile_gen))
        return orig_adopt(self, patch)

    monkeypatch.setattr(Engine, "_adopt_patch", tracking_adopt)

    # Slow the warm path down so compiles from older edits are still in
    # flight when newer edits land.
    orig_warm = Engine._warm_and_stage

    def slow_warm(self, patch, gen, warm_args):
        time.sleep(0.05)
        latest = self._compile_gen
        orig_warm(self, patch, gen, warm_args)
        # a stale warm must never stage
        if gen != latest:
            assert self._pending_patch is None or self._pending_patch[1] == latest
    monkeypatch.setattr(Engine, "_warm_and_stage", slow_warm)

    eng.start()
    try:
        sid, _, _ = eng.connect_session()
        seq = 0
        mods = []
        # ~100 structural edits/s for 1.5 s, mixing create/delete
        t_end = time.time() + 1.5
        while time.time() < t_end:
            seq += 1
            try:
                if len(mods) > 4 and seq % 3 == 0:
                    eng.update(sid, p.WorkspaceMessage(seq, p.DeleteModule(mods.pop(0))))
                else:
                    eng.update(sid, p.WorkspaceMessage(seq, p.CreateModule(
                        p.ModuleParams("Oscillator",
                                       p.OscillatorParams(100.0 + seq, p.Waveform.SINE)),
                        p.WindowGeometry())))
                    mods.append(p.ModuleId(eng.ws.module_seq))
            except Exception:
                pass  # Busy is fine under storm
            time.sleep(0.01)
        t_mark = eng.tick
        # let in-flight compiles settle; ticking must continue
        time.sleep(3.0)
        assert eng.tick > t_mark + 60, "engine stalled after edit storm"
        # every adopt observed the generation it was compiled for
        # (adopt happens with gen == compile_gen by construction)
        final_patch = eng._patch
        from mixlab_tpu.engine.compiler import compile_patch
        want = compile_patch(eng.ws, eng.cfg, eng.block).structural_fingerprint
        deadline = time.time() + 60
        while time.time() < deadline and eng._patch.structural_fingerprint != want:
            time.sleep(0.5)
        assert eng._patch.structural_fingerprint == want, (
            "engine never converged to a patch matching the final workspace")
    finally:
        eng.stop()


def test_create_delete_netting_out_never_adopts_deleted_module(monkeypatch):
    """Round-4 soak catch: create module M (structural compile in flight),
    then delete M again BEFORE the compile lands.  The net structure
    equals the running patch, so the delete takes the param-only
    shortcut — which must still supersede the in-flight compile, or the
    stale patch (containing M) gets adopted against a workspace without
    M and the prepare_aux KeyError kills the engine thread."""
    orig_warm = Engine._warm_and_stage

    def slow_warm(self, patch, gen, warm_args):
        time.sleep(0.6)  # hold the compile in flight past the delete
        return orig_warm(self, patch, gen, warm_args)

    monkeypatch.setattr(Engine, "_warm_and_stage", slow_warm)

    eng = Engine(cfg=CFG)
    eng.start()
    try:
        time.sleep(0.3)
        sid, _, _ = eng.connect_session()
        n0 = len(eng.ws.modules)
        eng.update(sid, p.WorkspaceMessage(1, p.CreateModule(
            p.ModuleParams("Oscillator",
                           p.OscillatorParams(440.0, p.Waveform.SINE)),
            p.WindowGeometry())))
        deadline = time.time() + 5
        while len(eng.ws.modules) == n0 and time.time() < deadline:
            time.sleep(0.02)  # the op applies on the engine thread
        assert len(eng.ws.modules) > n0
        mid = p.ModuleId(eng.ws.module_seq)
        time.sleep(0.1)  # compile for the create is now in flight
        eng.update(sid, p.WorkspaceMessage(2, p.DeleteModule(mid)))
        # let the stale warm finish + several swap opportunities pass
        time.sleep(2.0)
        assert mid not in eng.ws.modules
        assert all(m != mid for m in eng._patch.order), (
            "stale patch containing the deleted module was adopted")
        t0 = eng.tick
        time.sleep(1.0)
        assert eng.tick > t0 + 30, "engine thread died or stalled"
    finally:
        eng.stop()
