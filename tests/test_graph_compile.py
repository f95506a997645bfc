"""Workspace graph + compiler + end-to-end render tests."""

import numpy as np
import pytest

import oracle
from mixlab_tpu import protocol as p
from mixlab_tpu.engine.compiler import compile_patch
from mixlab_tpu.engine.config import BlockSpec, EngineConfig
from mixlab_tpu.engine.graph import TypeMismatch, Workspace
from mixlab_tpu.engine.render import render
from mixlab_tpu.protocol import InputId, OutputId

CFG = EngineConfig(sample_rate=44_100)


def osc(ws, freq=440.0, waveform=p.Waveform.SINE):
    return ws.create_module(
        p.ModuleParams("Oscillator", p.OscillatorParams(freq, waveform))
    )


def test_connect_type_check():
    ws = Workspace()
    o = osc(ws)
    amp = ws.create_module(p.ModuleParams("Amplifier", p.AmplifierParams()))
    # stereo out -> stereo in ok
    ws.connect(InputId(amp, 0), OutputId(o, 1))
    # mono out -> stereo in rejected (workspace.rs:109-113)
    with pytest.raises(TypeMismatch):
        ws.connect(InputId(amp, 0), OutputId(o, 0))
    # replacing a connection returns the old one
    o2 = osc(ws)
    prev = ws.connect(InputId(amp, 0), OutputId(o2, 1))
    assert prev == OutputId(o, 1)


def test_run_order_terminal_dfs():
    ws = Workspace()
    o = osc(ws)
    amp = ws.create_module(p.ModuleParams("Amplifier", p.AmplifierParams()))
    mon = ws.create_module(p.ModuleParams("Monitor", None))
    ws.connect(InputId(amp, 0), OutputId(o, 1))
    ws.connect(InputId(mon, 1), OutputId(amp, 0))
    assert ws.run_order() == [o, amp, mon]


def test_cycle_only_graph_never_runs():
    # a graph that is only a cycle has no terminal module (engine.rs:408-416)
    ws = Workspace()
    a = ws.create_module(p.ModuleParams("Amplifier", p.AmplifierParams()))
    b = ws.create_module(p.ModuleParams("Amplifier", p.AmplifierParams()))
    ws.connect(InputId(a, 0), OutputId(b, 0))
    ws.connect(InputId(b, 0), OutputId(a, 0))
    assert ws.run_order() == []


def test_cycle_back_edge_reads_zeros():
    # osc -> amp_a; amp_a <-> amp_b cycle; amp_b -> monitor terminal
    # amp_b's input from amp_a is a forward edge; amp_a's input from amp_b is
    # the back edge and must read zeros (engine.rs:478-483)
    ws = Workspace()
    a = ws.create_module(p.ModuleParams("Amplifier", p.AmplifierParams()))
    b = ws.create_module(p.ModuleParams("Amplifier", p.AmplifierParams()))
    mon = ws.create_module(p.ModuleParams("Monitor", None))
    ws.connect(InputId(a, 0), OutputId(b, 0))
    ws.connect(InputId(b, 0), OutputId(a, 0))
    ws.connect(InputId(mon, 1), OutputId(b, 0))
    res = render(ws, n_ticks=2, cfg=CFG, block_ticks=2)
    audio = res.monitor_audio(mon)
    np.testing.assert_array_equal(audio, np.zeros_like(audio))


def test_delete_module_drops_connections():
    ws = Workspace()
    o = osc(ws)
    amp = ws.create_module(p.ModuleParams("Amplifier", p.AmplifierParams()))
    ws.connect(InputId(amp, 0), OutputId(o, 1))
    deleted = ws.delete_module(o)
    assert deleted == [InputId(amp, 0)]
    assert not ws.connections


def test_persist_roundtrip():
    ws = Workspace()
    o = osc(ws, 330.0, p.Waveform.TRIANGLE)
    amp = ws.create_module(
        p.ModuleParams("Amplifier", p.AmplifierParams(amplitude=0.5))
    )
    ws.connect(InputId(amp, 0), OutputId(o, 1))
    save = ws.to_persist()
    ws2 = Workspace.from_persist(save)
    assert ws2.module_seq == ws.module_seq
    assert set(ws2.modules) == set(ws.modules)
    assert ws2.connections == ws.connections
    assert ws2.modules[o].params.params.freq == 330.0


def test_render_config1_sine_amp_monitor_vs_oracle():
    """BASELINE config 1: sine -> amplifier -> monitor, offline render,
    compared against the scalar f64 oracle."""
    ws = Workspace()
    o = osc(ws, 440.0)
    amp = ws.create_module(
        p.ModuleParams("Amplifier", p.AmplifierParams(amplitude=0.5, mod_depth=0.0))
    )
    mon = ws.create_module(p.ModuleParams("Monitor", None))
    ws.connect(InputId(amp, 0), OutputId(o, 1))
    ws.connect(InputId(mon, 1), OutputId(amp, 0))

    n_ticks = 30
    res = render(ws, n_ticks=n_ticks, cfg=CFG, block_ticks=8)
    audio = res.monitor_audio(mon)
    S = n_ticks * CFG.samples_per_tick
    assert audio.shape == (S, 2)

    mono = oracle.oscillator(0, S, 440.0, "sine", CFG.sample_rate)
    want = oracle.amplifier(np.stack([mono, mono], -1), None, 0.5, 0.0)
    np.testing.assert_allclose(audio, want, atol=5e-5)


def test_param_update_no_recompile_same_fingerprint():
    ws = Workspace()
    o = osc(ws, 440.0)
    mon = ws.create_module(p.ModuleParams("Monitor", None))
    ws.connect(InputId(mon, 1), OutputId(o, 1))
    patch1 = compile_patch(ws, CFG, BlockSpec(2))
    ws.update_params(
        ws.run_order()[0] if False else o,
        p.ModuleParams("Oscillator", p.OscillatorParams(880.0, p.Waveform.SINE)),
    )
    patch2 = compile_patch(ws, CFG, BlockSpec(2))
    assert patch1.structural_fingerprint == patch2.structural_fingerprint
    # waveform change IS structural
    ws.update_params(
        o, p.ModuleParams("Oscillator", p.OscillatorParams(880.0, p.Waveform.SAW))
    )
    patch3 = compile_patch(ws, CFG, BlockSpec(2))
    assert patch3.structural_fingerprint != patch1.structural_fingerprint


def test_eq_three_in_graph_state_carries_across_blocks():
    ws = Workspace()
    o = osc(ws, 200.0)
    eq = ws.create_module(
        p.ModuleParams(
            "EqThree",
            p.EqThreeParams(p.Decibel(4.0), p.Decibel(0.0), p.Decibel(4.0)),
        )
    )
    mon = ws.create_module(p.ModuleParams("Monitor", None))
    sp = ws.create_module(p.ModuleParams("StereoPanner", None))
    ws.connect(InputId(eq, 0), OutputId(o, 0))
    ws.connect(InputId(sp, 0), OutputId(eq, 0))
    ws.connect(InputId(sp, 1), OutputId(eq, 0))
    ws.connect(InputId(mon, 1), OutputId(sp, 0))

    n_ticks = 12
    res = render(ws, n_ticks=n_ticks, cfg=CFG, block_ticks=3)
    audio = res.monitor_audio(mon)

    S = n_ticks * CFG.samples_per_tick
    mono = oracle.oscillator(0, S, 200.0, "sine", CFG.sample_rate)
    want, _ = oracle.eq_three(mono, 4.0, 0.0, 4.0, CFG.sample_rate)
    np.testing.assert_allclose(audio[:, 0], want, atol=2e-4)
    np.testing.assert_allclose(audio[:, 1], want, atol=2e-4)
