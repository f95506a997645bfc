#!/usr/bin/env python
"""Isolate the flagship residual: envelope and eq_three costs, each measured
alone (scan-over-blocks, S=384000 like the flagship's 480-tick blocks), plus
flagship-minus-envelope and flagship-minus-eq graph variants.

Follow-up to tools/profile_flagship_residual2.py, which showed the shipped
flagship at ~40 us/s while its elementwise-only subgraph costs ~5.5 us/s —
so ~34 us/s sits in envelope+eq_three (or their coupling), contradicting the
earlier ~8 us/s attribution (BENCH_NOTES "flagship residual profile").

Run: python tools/profile_env_eq.py [reps]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import _thunk, timed_slope  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_16_module_graph
    from mixlab_tpu import protocol as p
    from mixlab_tpu.dsp.registry import get_def
    from mixlab_tpu.engine.config import BlockSpec, EngineConfig
    from mixlab_tpu.engine.graph import Workspace
    from mixlab_tpu.engine.scan_render import build_scanned, stacked_host_aux
    from mixlab_tpu.protocol import InputId, OutputId

    cfg = EngineConfig(sample_rate=48_000)
    block = BlockSpec(480)
    S = block.n_samples(cfg)
    block_seconds = S / cfg.sample_rate

    rows = {}

    # ---- envelope alone: gate square wave so real transitions happen ------
    env_def = get_def("Envelope")
    env_params = p.EnvelopeParams()
    env_aux = env_def.prepare(env_params, cfg)
    env_state0 = env_def.init_state(env_params, cfg)
    # 2 Hz square gate
    tt = np.arange(S, dtype=np.int64)
    gate_np = ((tt * 4 // cfg.sample_rate) % 2).astype(np.float32)
    gate = jnp.asarray(gate_np)

    def env_scanned(gate, state0, n):
        def body(st, _):
            st, (out,), _ = env_def.run_block(
                env_params, env_aux, None, st, [gate], cfg, block)
            return st, jnp.sum(out)
        st, sums = jax.lax.scan(body, state0, None, length=n)
        return jnp.sum(sums)

    def make_env(n):
        f = jax.jit(env_scanned, static_argnums=2)
        return lambda: f(gate, env_state0, n)

    rows["env"] = make_env

    # ---- eq_three alone ----------------------------------------------------
    eq_def = get_def("EqThree")
    eq_params = p.EqThreeParams(p.Decibel(4.0), p.Decibel(0.0), p.Decibel(4.0))
    eq_aux = eq_def.prepare(eq_params, cfg)
    eq_state0 = eq_def.init_state(eq_params, cfg)
    rng = np.random.default_rng(0)
    xin = jnp.asarray(rng.uniform(-1, 1, S).astype(np.float32))

    def eq_scanned(x, state0, n):
        def body(st, _):
            st, (out,), _ = eq_def.run_block(
                eq_params, eq_aux, None, st, [x], cfg, block)
            return st, jnp.sum(out)
        st, sums = jax.lax.scan(body, state0, None, length=n)
        return jnp.sum(sums)

    def make_eq(n):
        f = jax.jit(eq_scanned, static_argnums=2)
        return lambda: f(xin, eq_state0, n)

    rows["eq"] = make_eq

    # ---- flagship variants -------------------------------------------------
    def build_flagship(drop_env=False, drop_eq=False):
        ws = Workspace()
        def add(kind, params):
            return ws.create_module(p.ModuleParams(kind, params))
        trig = add("Trigger", p.GateState.OPEN)
        ctrl_src = trig
        if not drop_env:
            env = add("Envelope", p.EnvelopeParams())
            ws.connect(InputId(env, 0), OutputId(trig, 0))
            ctrl_src = env
        oscs = [add("Oscillator", p.OscillatorParams(110.0 * (i + 1), p.Waveform.SINE))
                for i in range(4)]
        fm = add("FmSine", p.FmSineParams(440.0, 880.0))
        amps = [add("Amplifier", p.AmplifierParams(amplitude=0.5, mod_depth=0.3))
                for _ in range(4)]
        split = add("StereoSplitter", None)
        pan = add("StereoPanner", None)
        mixer = add("Mixer", p.MixerParams.with_channels(8))
        mon = add("Monitor", None)
        for i, (o, a) in enumerate(zip(oscs, amps)):
            ws.connect(InputId(a, 0), OutputId(o, 1))
            ws.connect(InputId(a, 1), OutputId(ctrl_src, 0))
            ws.connect(InputId(mixer, i), OutputId(a, 0))
        ws.connect(InputId(fm, 0), OutputId(ctrl_src, 0))
        ws.connect(InputId(mixer, 4), OutputId(fm, 0))
        ws.connect(InputId(split, 0), OutputId(amps[0], 0))
        if not drop_eq:
            eq = add("EqThree", p.EqThreeParams(p.Decibel(4.0), p.Decibel(0.0), p.Decibel(4.0)))
            ws.connect(InputId(eq, 0), OutputId(split, 0))
            ws.connect(InputId(pan, 0), OutputId(eq, 0))
        else:
            ws.connect(InputId(pan, 0), OutputId(split, 0))
        ws.connect(InputId(pan, 1), OutputId(split, 1))
        ws.connect(InputId(mixer, 5), OutputId(pan, 0))
        ws.connect(InputId(mixer, 6), OutputId(amps[1], 0))
        ws.connect(InputId(mixer, 7), OutputId(amps[2], 0))
        ws.connect(InputId(mon, 1), OutputId(mixer, 0))
        return ws

    def graph_maker(ws):
        patch, fn = build_scanned(ws, cfg, block, checksum_only=True)
        aux = patch.prepare_aux(ws)
        state0 = patch.init_state(ws)
        jfn = jax.jit(lambda a, h, s: fn(a, h, s)[1])
        def make(n):
            return _thunk(jfn, aux, stacked_host_aux(patch, 0, n), state0)
        return make

    def build_chain():
        """trig -> env -> eq -> monitor: both Pallas kernels, no elementwise
        mass — isolates kernel-kernel composition from the big fusions."""
        ws = Workspace()
        trig = ws.create_module(p.ModuleParams("Trigger", p.GateState.OPEN))
        env = ws.create_module(p.ModuleParams("Envelope", p.EnvelopeParams()))
        eq = ws.create_module(p.ModuleParams(
            "EqThree", p.EqThreeParams(p.Decibel(4.0), p.Decibel(0.0), p.Decibel(4.0))))
        pan = ws.create_module(p.ModuleParams("StereoPanner", None))
        mon = ws.create_module(p.ModuleParams("Monitor", None))
        ws.connect(InputId(env, 0), OutputId(trig, 0))
        ws.connect(InputId(eq, 0), OutputId(env, 0))
        ws.connect(InputId(pan, 0), OutputId(eq, 0))
        ws.connect(InputId(pan, 1), OutputId(eq, 0))
        ws.connect(InputId(mon, 1), OutputId(pan, 0))
        return ws

    rows["chain"] = graph_maker(build_chain())
    rows["full"] = graph_maker(build_16_module_graph()[0])

    def build_full_noosc():
        """Flagship topology but oscillators replaced by Trigger constants:
        same module count and both kernels, no sin() mass."""
        ws = Workspace()
        def add(kind, params):
            return ws.create_module(p.ModuleParams(kind, params))
        trig = add("Trigger", p.GateState.OPEN)
        env = add("Envelope", p.EnvelopeParams())
        ws.connect(InputId(env, 0), OutputId(trig, 0))
        srcs = [add("Trigger", p.GateState.OPEN) for _ in range(4)]
        fm = add("FmSine", p.FmSineParams(440.0, 880.0))
        amps = [add("Amplifier", p.AmplifierParams(amplitude=0.5, mod_depth=0.3))
                for _ in range(4)]
        eq = add("EqThree", p.EqThreeParams(p.Decibel(4.0), p.Decibel(0.0), p.Decibel(4.0)))
        split = add("StereoSplitter", None)
        pan = add("StereoPanner", None)
        mixer = add("Mixer", p.MixerParams.with_channels(8))
        mon = add("Monitor", None)
        for i, (o, a) in enumerate(zip(srcs, amps)):
            # Trigger output is MONO; amp input 0 is STEREO -> leave
            # disconnected (zero-fill) and drive via control instead
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
        return ws

    rows["full_noosc"] = graph_maker(build_full_noosc())

    # ---- dummy-kernel substitution: full graph with eq's Pallas call
    # replaced by a same-shape passthrough custom call --------------------
    from jax.experimental import pallas as plx
    from jax.experimental.pallas import tpu as pltpu

    from mixlab_tpu.dsp.base import ModuleDef, expect_mono
    from mixlab_tpu.dsp.registry import register
    from mixlab_tpu.protocol import LineType

    def _dummy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 1.0000001

    class EqDummyDef(ModuleDef):
        kind = "EqDummy"

        def terminals(self, params):
            return [LineType.MONO.unlabeled()], [LineType.MONO.unlabeled()]

        def run_block(self, params, aux, host_aux, state, inputs, cfg, block):
            S = block.n_samples(cfg)
            x = expect_mono(inputs[0], S)
            Cc = 128
            Kk = S // Cc
            xkc = x.reshape(Kk, Cc)
            out = plx.pallas_call(
                _dummy_kernel,
                out_shape=jax.ShapeDtypeStruct((Kk, Cc), jnp.float32),
                in_specs=[plx.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=plx.BlockSpec(memory_space=pltpu.VMEM),
                interpret=jax.default_backend() != "tpu",
            )(xkc)
            return state, [out.reshape(-1)], {}

    try:
        register(EqDummyDef())
    except Exception:
        pass
    p.ModuleParams.KINDS = {**p.ModuleParams.KINDS, "EqDummy": type(None)}

    def build_full_dummy_eq():
        ws = Workspace()
        def add(kind, params):
            return ws.create_module(p.ModuleParams(kind, params))
        trig = add("Trigger", p.GateState.OPEN)
        env = add("Envelope", p.EnvelopeParams())
        ws.connect(InputId(env, 0), OutputId(trig, 0))
        oscs = [add("Oscillator", p.OscillatorParams(110.0 * (i + 1), p.Waveform.SINE))
                for i in range(4)]
        fm = add("FmSine", p.FmSineParams(440.0, 880.0))
        amps = [add("Amplifier", p.AmplifierParams(amplitude=0.5, mod_depth=0.3))
                for _ in range(4)]
        eq = add("EqDummy", None)
        split = add("StereoSplitter", None)
        pan = add("StereoPanner", None)
        mixer = add("Mixer", p.MixerParams.with_channels(8))
        mon = add("Monitor", None)
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
        return ws

    rows["full_dummy_eq"] = graph_maker(build_full_dummy_eq())
    rows["no_env"] = graph_maker(build_flagship(drop_env=True))
    rows["no_eq"] = graph_maker(build_flagship(drop_eq=True))
    rows["no_both"] = graph_maker(build_flagship(drop_env=True, drop_eq=True))

    sel = os.environ.get("MIXLAB_PROFILE_ROWS")
    if sel:
        keep = sel.split(",")
        rows = {k: v for k, v in rows.items() if k in keep}
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    best = {k: float("inf") for k in rows}
    for r in range(reps):
        line = [f"pair {r}:"]
        for k, mk in rows.items():
            s = timed_slope(mk, 8, 248, reps=2)
            best[k] = min(best[k], s)
            line.append(f"{k} {1e6 * s / block_seconds:7.2f}")
        print("  ".join(line), flush=True)
    print("best us/s:", "  ".join(
        f"{k} {1e6 * best[k] / block_seconds:.2f}" for k in rows))


if __name__ == "__main__":
    main()
