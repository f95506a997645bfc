"""Fleet serving tests: N sessions in one dispatch, per-instance params."""

import numpy as np

from mixlab_tpu.dsp.base import interleave_tap
import pytest

import oracle
from mixlab_tpu import protocol as p
from mixlab_tpu.engine.config import BlockSpec, EngineConfig
from mixlab_tpu.engine.graph import Workspace
from mixlab_tpu.parallel.fleet import Fleet
from mixlab_tpu.parallel.stems import make_mesh
from mixlab_tpu.protocol import InputId, OutputId

CFG = EngineConfig(sample_rate=44_100)


def patch_ws(freq=440.0, amp=0.5):
    ws = Workspace()
    o = ws.create_module(p.ModuleParams("Oscillator", p.OscillatorParams(freq, p.Waveform.SINE)))
    a = ws.create_module(p.ModuleParams("Amplifier", p.AmplifierParams(amplitude=amp)))
    m = ws.create_module(p.ModuleParams("Monitor", None))
    ws.connect(InputId(a, 0), OutputId(o, 1))
    ws.connect(InputId(m, 1), OutputId(a, 0))
    return ws, m


def test_fleet_renders_per_instance_params():
    base, mon = patch_ws()
    freqs = [220.0, 440.0, 660.0, 880.0]
    instances = [patch_ws(f)[0] for f in freqs]
    fleet = Fleet.build(base, n=4, cfg=CFG, block=BlockSpec(2), per_instance_params=instances)

    taps = fleet.run_block(0)
    audio = interleave_tap(taps[str(mon.value)]["audio"])
    assert audio.shape[0] == 4

    spt = CFG.samples_per_tick
    S = 2 * spt
    for i, f in enumerate(freqs):
        got = audio[i].reshape(S, 2)[:, 0]
        spec = np.abs(np.fft.rfft(got))
        peak_hz = np.argmax(spec) * CFG.sample_rate / S
        assert abs(peak_hz - f) < 40, (f, peak_hz)


def test_fleet_instance_aux_update_no_structure_change():
    base, mon = patch_ws(440.0, 0.5)
    fleet = Fleet.build(base, n=3, cfg=CFG, block=BlockSpec(1))
    quiet, _ = patch_ws(440.0, 0.0)
    fleet.update_instance_aux(1, quiet)
    taps = fleet.run_block(0)
    audio = interleave_tap(taps[str(mon.value)]["audio"])
    assert np.abs(audio[0]).max() > 0.4
    assert np.abs(audio[1]).max() == 0.0  # muted instance
    assert np.abs(audio[2]).max() > 0.4


def test_fleet_rejects_mismatched_structure():
    base, _ = patch_ws()
    other = Workspace()
    other.create_module(p.ModuleParams("Trigger", p.GateState.OPEN))
    with pytest.raises(ValueError):
        Fleet.build(base, n=2, cfg=CFG, per_instance_params=[base, other])


def test_fleet_sharded_over_mesh():
    base, mon = patch_ws()
    mesh = make_mesh(4, axis="fleet")
    fleet = Fleet.build(base, n=8, cfg=CFG, block=BlockSpec(1), mesh=mesh, axis="fleet")
    taps = fleet.run_block(0)
    audio = interleave_tap(taps[str(mon.value)]["audio"])
    assert audio.shape[0] == 8
    assert np.abs(audio).max() > 0.4
