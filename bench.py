#!/usr/bin/env python
"""Benchmark driver.

Primary metric: realtime multiple of a 16-module 48 kHz stereo graph render
on one chip (BASELINE.json north star: >= 1000x realtime; the reference's
implied floor is 1x, src/engine/timing.rs:36-39).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the multiple of the reference's 1x-realtime floor.

Run with --all for the full BASELINE config sweep (human-readable extras on
stderr).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def build_16_module_graph():
    """BASELINE config 2-flavoured flagship: 8-channel mixer fed by
    4 osc->envelope->amplifier chains + trigger + fm_sine + eq_three +
    panner/splitter + monitor = 16 modules, 48 kHz stereo."""
    from mixlab_tpu import protocol as p
    from mixlab_tpu.engine.graph import Workspace
    from mixlab_tpu.protocol import InputId, OutputId

    ws = Workspace()
    mids = []

    def add(kind, params):
        mid = ws.create_module(p.ModuleParams(kind, params))
        mids.append(mid)
        return mid

    trig = add("Trigger", p.GateState.OPEN)
    env = add("Envelope", p.EnvelopeParams())
    oscs = [
        add("Oscillator", p.OscillatorParams(110.0 * (i + 1), p.Waveform.SINE))
        for i in range(4)
    ]
    fm = add("FmSine", p.FmSineParams(440.0, 880.0))
    amps = [
        add("Amplifier", p.AmplifierParams(amplitude=0.5, mod_depth=0.3))
        for i in range(4)
    ]
    eq = add("EqThree", p.EqThreeParams(p.Decibel(4.0), p.Decibel(0.0), p.Decibel(4.0)))
    split = add("StereoSplitter", None)
    pan = add("StereoPanner", None)
    mixer = add("Mixer", p.MixerParams.with_channels(8))
    mon = add("Monitor", None)

    ws.connect(InputId(env, 0), OutputId(trig, 0))
    for i, (o, a) in enumerate(zip(oscs, amps)):
        ws.connect(InputId(a, 0), OutputId(o, 1))
        ws.connect(InputId(a, 1), OutputId(env, 0))
        ws.connect(InputId(mixer, i), OutputId(a, 0))
    ws.connect(InputId(fm, 0), OutputId(env, 0))
    ws.connect(InputId(mixer, 4), OutputId(fm, 0))
    ws.connect(InputId(split, 0), OutputId(amps[0], 0))
    ws.connect(InputId(eq, 0), OutputId(split, 0))
    ws.connect(InputId(pan, 0), OutputId(eq, 0))
    ws.connect(InputId(pan, 1), OutputId(split, 1))
    ws.connect(InputId(mixer, 5), OutputId(pan, 0))
    ws.connect(InputId(mixer, 6), OutputId(amps[1], 0))
    ws.connect(InputId(mixer, 7), OutputId(amps[2], 0))
    ws.connect(InputId(mon, 1), OutputId(mixer, 0))
    assert len(mids) == 16, len(mids)
    return ws, mon


def bench_audio_graph(seconds_audio: float = 10.0, block_ticks: int = 120, reps: int = 5):
    import jax

    from mixlab_tpu.engine.compiler import compile_patch
    from mixlab_tpu.engine.config import BlockSpec, EngineConfig

    cfg = EngineConfig(sample_rate=48_000)
    ws, mon = build_16_module_graph()
    block = BlockSpec(block_ticks)
    patch = compile_patch(ws, cfg, block)
    aux = patch.prepare_aux(ws)
    state0 = patch.init_state(ws)

    n_ticks = int(seconds_audio * cfg.ticks_per_second)
    n_blocks = max(1, n_ticks // block_ticks)
    spb = block_ticks * cfg.samples_per_tick

    # warmup (compile)
    host_aux = patch.host_aux(0)
    state, taps = patch.run(aux, host_aux, state0)
    jax.block_until_ready((state, taps))

    best = float("inf")
    for _ in range(reps):
        state = state0
        t0 = time.perf_counter()
        t_samples = 0
        for b in range(n_blocks):
            host_aux = patch.host_aux(t_samples)
            state, taps = patch.run(aux, host_aux, state)
            t_samples += spb
        jax.block_until_ready((state, taps))
        dt = time.perf_counter() - t0
        best = min(best, dt)

    audio_seconds = n_blocks * spb / cfg.sample_rate
    return audio_seconds / best


def main():
    multiple = bench_audio_graph()
    print(
        json.dumps(
            {
                "metric": "realtime_multiple_16module_48k_graph",
                "value": round(multiple, 1),
                "unit": "x_realtime",
                "vs_baseline": round(multiple, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
