#!/usr/bin/env python
"""A/B: module-granular [S,2] stereo (current compiler) vs a tuple-stereo
channel-major composition of the SAME flagship graph math.

Round-3 BENCH_NOTES ("flagship residual profile") showed the 13 elementwise
modules cost ~34 us per content-second while a hand-fused jnp formulation of
the same math is below the harness resolution.  The designed fix is a
graph-compiler pass that keeps stereo as a PAIR of perfectly-tiled [S] mono
arrays (channel-major in the extreme: panner/splitter/stack/reshape vanish
from the dataflow, and XLA sees pure [S] elementwise chains).  This script
measures that representation at MODULE granularity — i.e. exactly what the
compiler pass would emit — against the shipped [S,2] path, interleaved on
one chip session, before committing to the dataflow refactor.

Run on the real chip: python tools/ab_channel_per.py [reps]
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
    from mixlab_tpu.engine.scan_render import build_scanned, stacked_host_aux

    cfg = EngineConfig(sample_rate=48_000)
    block = BlockSpec(480)
    spt = cfg.samples_per_tick
    S = block.n_samples(cfg)
    block_seconds = S / cfg.sample_rate

    # ---------------- side A: shipped compiler ([S,2] stereo) -------------
    ws, _mon = build_16_module_graph()
    patch, fn = build_scanned(ws, cfg, block, checksum_only=True)
    aux_a = patch.prepare_aux(ws)
    state_a = patch.init_state(ws)
    jfn_a = jax.jit(lambda a, h, s: fn(a, h, s)[1])

    def make_a(n):
        h = stacked_host_aux(patch, 0, n)
        return _thunk(jfn_a, aux_a, h, state_a)

    # ---------------- side B: tuple-stereo, module granularity ------------
    env_def = get_def("Envelope")
    eq_def = get_def("EqThree")
    env_params = p.EnvelopeParams()
    eq_params = p.EqThreeParams(p.Decibel(4.0), p.Decibel(0.0), p.Decibel(4.0))
    mix_params = p.MixerParams.with_channels(8)
    amp_params = p.AmplifierParams(amplitude=0.5, mod_depth=0.3)
    osc_freqs = [110.0 * (i + 1) for i in range(4)]
    fm_lo, fm_hi = 440.0, 880.0

    mix_def = get_def("Mixer")
    aux_b = {
        "env": env_def.prepare(env_params, cfg),
        "eq": eq_def.prepare(eq_params, cfg),
        "mix": mix_def.prepare(mix_params, cfg),
        "osc_delta": jnp.asarray(
            [f / cfg.sample_rate for f in osc_freqs], dtype=jnp.float32
        ),
        "amp_amplitude": jnp.float32(amp_params.amplitude),
        "amp_mod_depth": jnp.float32(amp_params.mod_depth),
        "fm_freq_amp": jnp.float32((fm_hi - fm_lo) / 2.0),
        "fm_mid_delta": jnp.float32((fm_lo + (fm_hi - fm_lo) / 2.0) / cfg.sample_rate),
    }
    state_b = {
        "env": env_def.init_state(env_params, cfg),
        "eq": eq_def.init_state(eq_params, cfg),
    }

    def host_aux_b_block(t0):
        ticks = t0 // spt + np.arange(block.n_ticks, dtype=np.float64)
        tsamp = ticks * spt
        osc_base = np.stack(
            [np.mod(tsamp * (f / cfg.sample_rate), 1.0) for f in osc_freqs]
        )
        fmid = fm_lo + (fm_hi - fm_lo) / 2.0
        return {
            "osc_base": jnp.asarray(osc_base, dtype=jnp.float32),
            "fm_base_mid": jnp.asarray(
                np.mod(tsamp * (fmid / cfg.sample_rate), 1.0), dtype=jnp.float32
            ),
            "fm_tsec": jnp.asarray(tsamp / cfg.sample_rate, dtype=jnp.float32),
        }

    def stacked_b(n):
        per = [host_aux_b_block(i * S) for i in range(n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *per)

    two_pi = jnp.float32(2.0 * np.pi)

    def program_b(aux, host_aux, state):
        i = jnp.arange(spt, dtype=jnp.float32)
        # Trigger (OPEN)
        gate = jnp.ones((S,), dtype=jnp.float32)
        # Envelope (mono, stateful — shipped def, Pallas on chip)
        est, (env_out,), _ = env_def.run_block(
            env_params, aux["env"], None, state["env"], [gate], cfg, block
        )
        # Oscillators -> mono [S]; tuple stereo is (s, s): no stack, no [S,2]
        oscs = []
        for k in range(4):
            n_ph = host_aux["osc_base"][k][:, None] + i[None, :] * aux["osc_delta"][k]
            oscs.append(jnp.sin(n_ph.reshape(-1) * two_pi).astype(jnp.float32))
        # FmSine driven by env
        x = env_out.reshape(block.n_ticks, spt)
        carrier = host_aux["fm_base_mid"][:, None] + i[None, :] * aux["fm_mid_delta"]
        tsec = host_aux["fm_tsec"][:, None] + i[None, :] * jnp.float32(
            1.0 / cfg.sample_rate
        )
        n_ph = carrier + aux["fm_freq_amp"] * x * tsec
        fm = jnp.sin(n_ph.reshape(-1) * two_pi).astype(jnp.float32)
        fm_st = (fm, fm)
        # Amplifiers: scale = (1 - d + d*ctrl) * amplitude, per frame
        scale = (
            1.0 - aux["amp_mod_depth"] + aux["amp_mod_depth"] * env_out
        ) * aux["amp_amplitude"]
        amps = [(s * scale, s * scale) for s in oscs]
        # Splitter on amps[0] -> eq on L (mono, stateful) -> panner with R
        eqst, (eq_out,), _ = eq_def.run_block(
            eq_params, aux["eq"], None, state["eq"], [amps[0][0]], cfg, block
        )
        pan = (eq_out, amps[0][1])
        # Mixer: 8 stereo channels, per-lane weighted sums
        chans = [amps[0], amps[1], amps[2], amps[3], fm_st, pan, amps[1], amps[2]]
        g = aux["mix"]["gains"]
        c = aux["mix"]["cues"]
        master = (
            sum(g[k] * ch[0] for k, ch in enumerate(chans)),
            sum(g[k] * ch[1] for k, ch in enumerate(chans)),
        )
        cue = (
            sum(c[k] * ch[0] for k, ch in enumerate(chans)),
            sum(c[k] * ch[1] for k, ch in enumerate(chans)),
        )
        # Monitor tap checksum (same reduction the [S,2] side's tap gets)
        tap_sum = jnp.sum(master[0]) + jnp.sum(master[1])
        return {"env": est, "eq": eqst}, tap_sum + 0.0 * (cue[0][0] + cue[1][0])

    def scanned_b(aux, host_aux_stacked, state0):
        def body(state, hb):
            state, tap = program_b(aux, hb, state)
            return state, tap

        state, taps = jax.lax.scan(body, state0, host_aux_stacked)
        return jnp.sum(taps)

    jfn_b = jax.jit(scanned_b)

    def make_b(n):
        return _thunk(jfn_b, aux_b, stacked_b(n), state_b)

    # ---------------- same-math check -------------------------------------
    ca = float(np.asarray(jfn_a(aux_a, stacked_host_aux(patch, 0, 2), state_a)))
    cb = float(np.asarray(jfn_b(aux_b, stacked_b(2), state_b)))
    print(f"checksums: A {ca:.6f}  B {cb:.6f}  (must match)", flush=True)

    # ---------------- interleaved slope timing ----------------------------
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    pairs = []
    for r in range(reps):
        sa = timed_slope(make_a, 2, 32, reps=2)
        sb = timed_slope(make_b, 2, 32, reps=2)
        pairs.append((sa, sb))
        print(
            f"pair {r}: A {1e6 * sa / block_seconds:8.1f} us/s ({block_seconds/sa:9.0f}x)   "
            f"B {1e6 * sb / block_seconds:8.1f} us/s ({block_seconds/sb:9.0f}x)",
            flush=True,
        )
    best_a = min(a for a, _ in pairs)
    best_b = min(b for _, b in pairs)
    print(
        f"best: A {1e6*best_a/block_seconds:.1f} us/s ({block_seconds/best_a:.0f}x)  "
        f"B {1e6*best_b/block_seconds:.1f} us/s ({block_seconds/best_b:.0f}x)  "
        f"speedup {best_a/best_b:.2f}x"
    )


if __name__ == "__main__":
    main()
