"""Whole-graph offline render vs a composed float64 oracle.

SURVEY §4: the reference has no whole-graph tests; the TPU build's strategy
is per-kernel goldens plus whole-graph renders against a scalar reference.
This composes the flagship 16-module bench graph in numpy f64 using the
oracle kernels and compares the monitor output sample-for-sample.
"""

import numpy as np

import oracle
from bench import build_16_module_graph
from mixlab_tpu.engine.config import EngineConfig
from mixlab_tpu.engine.render import render

CFG = EngineConfig(sample_rate=48_000)


def oracle_16_module(n_samples: int):
    sr = CFG.sample_rate
    # trigger open -> envelope
    gate = np.ones(n_samples, dtype=np.float32)
    env, _ = oracle.envelope(0, gate, 25.0, 500.0, 0.8, 200.0, sr)

    # four osc(110*i) -> amplifier(0.5, mod 0.3 by env)
    amps = []
    for i in range(4):
        mono = oracle.oscillator(0, n_samples, 110.0 * (i + 1), "sine", sr)
        stereo = np.stack([mono, mono], -1)
        amps.append(oracle.amplifier(stereo, env, 0.5, 0.3))

    # fm_sine driven by env
    fm_mono = oracle.fm_sine(0, env, 440.0, 880.0, sr)
    fm = np.stack([fm_mono, fm_mono], -1)

    # splitter(amps[0]) -> eq(L) ; panner(eq_L, amp0_R)
    eq_l, _ = oracle.eq_three(amps[0][:, 0], 4.0, 0.0, 4.0, sr)
    pan = np.stack([eq_l, amps[0][:, 1]], -1)

    # mixer channels: amps0-3, fm, pan, amps[1], amps[2]; defaults: gain 0dB,
    # fader 1.0, cue off
    inputs = [amps[0], amps[1], amps[2], amps[3], fm, pan, amps[1], amps[2]]
    master, _ = oracle.mixer(inputs, [0.0] * 8, [1.0] * 8, [False] * 8)
    return master


def test_flagship_graph_matches_composed_oracle():
    ws, mon = build_16_module_graph()
    n_ticks = 6
    res = render(ws, n_ticks=n_ticks, cfg=CFG, block_ticks=3)
    got = res.monitor_audio(mon)
    S = n_ticks * CFG.samples_per_tick
    want = oracle_16_module(S)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-3)
    # and it's non-trivial signal
    assert np.abs(got).max() > 0.5
