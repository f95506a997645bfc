#!/usr/bin/env python
"""Round-3 follow-up: where does the post-channel-major flagship residual live?

BENCH_NOTES "channel-major landed" leaves ~17 us per content-second between
the module-granular graph (~39k x) and the quantified ~100k x ceiling, and
names "per-module jaxpr composition overhead" as the suspect.  This script
pins it down empirically on the chip:

  A  shipped flagship (build_scanned, channel-major modules, env+eq Pallas)
  B  A minus envelope minus eq_three   (elementwise modules only)
  C  hand-fused monolith of B's math   (one jnp expression, same host_aux)
  D  C but osc phases computed on device from t0 (no stacked host_aux reads)

plus, for A and C, the compiled-HLO fusion census (kernel count and the
largest materialized intermediates) via .lower().compile().as_text() — the
direct evidence for/against "module boundaries materialize between fusion
islands".

Run: python tools/profile_flagship_residual2.py [reps]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import _thunk, timed_slope  # noqa: E402


def hlo_census(compiled, label):
    txt = compiled.as_text()
    fusions = re.findall(r"^\s*(?:ROOT )?%?[\w.-]+ = \S+ fusion\(", txt, re.M)
    customs = re.findall(r'custom_call_target="([^"]+)"', txt)
    # entry computation op census
    print(f"-- HLO census [{label}]: {len(fusions)} fusions, "
          f"{len(customs)} custom-calls {sorted(set(customs))}")
    # biggest tensors appearing as fusion results
    shapes = re.findall(r"= (\w+\[[\d,]*\])[^\n]* fusion\(", txt)
    from collections import Counter
    print("   fusion result shapes:", Counter(shapes).most_common(12))
    return txt


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
    spt = cfg.samples_per_tick
    S = block.n_samples(cfg)
    block_seconds = S / cfg.sample_rate

    # ---------------- A: shipped flagship ---------------------------------
    ws, _mon = build_16_module_graph()
    patch, fn = build_scanned(ws, cfg, block, checksum_only=True)
    aux_a = patch.prepare_aux(ws)
    state_a = patch.init_state(ws)
    jfn_a = jax.jit(lambda a, h, s: fn(a, h, s)[1])

    def make_a(n):
        return _thunk(jfn_a, aux_a, stacked_host_aux(patch, 0, n), state_a)

    # ---------------- B: elementwise-only graph ---------------------------
    def build_elementwise_only():
        ws = Workspace()
        def add(kind, params):
            return ws.create_module(p.ModuleParams(kind, params))
        trig = add("Trigger", p.GateState.OPEN)
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
            ws.connect(InputId(a, 1), OutputId(trig, 0))
            ws.connect(InputId(mixer, i), OutputId(a, 0))
        ws.connect(InputId(fm, 0), OutputId(trig, 0))
        ws.connect(InputId(mixer, 4), OutputId(fm, 0))
        ws.connect(InputId(split, 0), OutputId(amps[0], 0))
        ws.connect(InputId(pan, 0), OutputId(split, 0))
        ws.connect(InputId(pan, 1), OutputId(split, 1))
        ws.connect(InputId(mixer, 5), OutputId(pan, 0))
        ws.connect(InputId(mixer, 6), OutputId(amps[1], 0))
        ws.connect(InputId(mixer, 7), OutputId(amps[2], 0))
        ws.connect(InputId(mon, 1), OutputId(mixer, 0))
        return ws

    ws_b = build_elementwise_only()
    patch_b, fn_b = build_scanned(ws_b, cfg, block, checksum_only=True)
    aux_b = patch_b.prepare_aux(ws_b)
    state_b = patch_b.init_state(ws_b)
    jfn_b = jax.jit(lambda a, h, s: fn_b(a, h, s)[1])

    def make_b(n):
        return _thunk(jfn_b, aux_b, stacked_host_aux(patch_b, 0, n), state_b)

    # ---------------- C: hand-fused monolith of B -------------------------
    osc_freqs = [110.0 * (i + 1) for i in range(4)]
    fm_lo, fm_hi = 440.0, 880.0
    two_pi = jnp.float32(2.0 * np.pi)
    mix = get_def("Mixer").prepare(p.MixerParams.with_channels(8), cfg)

    def host_aux_c_block(t0):
        ticks = t0 // spt + np.arange(block.n_ticks, dtype=np.float64)
        tsamp = ticks * spt
        osc_base = np.stack(
            [np.mod(tsamp * (f / cfg.sample_rate), 1.0) for f in osc_freqs])
        fmid = fm_lo + (fm_hi - fm_lo) / 2.0
        return {
            "osc_base": jnp.asarray(osc_base, dtype=jnp.float32),
            "fm_base_mid": jnp.asarray(
                np.mod(tsamp * (fmid / cfg.sample_rate), 1.0), dtype=jnp.float32),
            "fm_tsec": jnp.asarray(tsamp / cfg.sample_rate, dtype=jnp.float32),
        }

    def stacked_c(n):
        per = [host_aux_c_block(i * S) for i in range(n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *per)

    osc_delta = jnp.asarray([f / cfg.sample_rate for f in osc_freqs], jnp.float32)
    fm_mid_delta = jnp.float32((fm_lo + (fm_hi - fm_lo) / 2.0) / cfg.sample_rate)
    fm_freq_amp = jnp.float32((fm_hi - fm_lo) / 2.0)

    def body_c(h):
        i = jnp.arange(spt, dtype=jnp.float32)
        gate = jnp.ones((S,), dtype=jnp.float32)
        oscs = []
        for k in range(4):
            n_ph = h["osc_base"][k][:, None] + i[None, :] * osc_delta[k]
            oscs.append(jnp.sin(n_ph.reshape(-1) * two_pi).astype(jnp.float32))
        x = gate.reshape(block.n_ticks, spt)
        carrier = h["fm_base_mid"][:, None] + i[None, :] * fm_mid_delta
        tsec = h["fm_tsec"][:, None] + i[None, :] * jnp.float32(1.0 / cfg.sample_rate)
        n_ph = carrier + fm_freq_amp * x * tsec
        fm = jnp.sin(n_ph.reshape(-1) * two_pi).astype(jnp.float32)
        scale = (1.0 - 0.3 + 0.3 * gate) * 0.5
        amps = [(s * scale, s * scale) for s in oscs]
        pan = (amps[0][0], amps[0][1])
        chans = [amps[0], amps[1], amps[2], amps[3], (fm, fm), pan, amps[1], amps[2]]
        g, c = mix["gains"], mix["cues"]
        master = (sum(g[k] * ch[0] for k, ch in enumerate(chans)),
                  sum(g[k] * ch[1] for k, ch in enumerate(chans)))
        cue0 = sum(c[k] * ch[0] for k, ch in enumerate(chans))
        return jnp.sum(master[0]) + jnp.sum(master[1]) + 0.0 * jnp.sum(cue0)

    def scanned_c(host):
        def body(acc, hb):
            return acc + body_c(hb), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), host)
        return out

    jfn_c = jax.jit(scanned_c)

    def make_c(n):
        return _thunk(jfn_c, stacked_c(n))

    # ---------------- D: C with on-device phase bases ----------------------
    def scanned_d(n):
        def body(acc, b_idx):
            t0 = b_idx.astype(jnp.float32) * jnp.float32(S)
            ticks = t0 / spt + jnp.arange(block.n_ticks, dtype=jnp.float32)
            tsamp = ticks * jnp.float32(spt)
            h = {
                "osc_base": jnp.stack([
                    jnp.mod(tsamp * (f / cfg.sample_rate), 1.0) for f in osc_freqs]),
                "fm_base_mid": jnp.mod(
                    tsamp * ((fm_lo + (fm_hi - fm_lo) / 2.0) / cfg.sample_rate), 1.0),
                "fm_tsec": tsamp / cfg.sample_rate,
            }
            return acc + body_c(h), None
        out, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(n, dtype=jnp.int32))
        return out

    def make_d(n):
        f = jax.jit(scanned_d, static_argnums=0)
        return lambda: f(n)

    # ---------------- HLO census ------------------------------------------
    try:
        ca = jfn_a.lower(aux_a, stacked_host_aux(patch, 0, 8), state_a).compile()
        hlo_census(ca, "A shipped flagship, n=8")
        cb = jfn_b.lower(aux_b, stacked_host_aux(patch_b, 0, 8), state_b).compile()
        hlo_census(cb, "B elementwise-only, n=8")
        cc = jfn_c.lower(stacked_c(8)).compile()
        hlo_census(cc, "C hand-fused, n=8")
    except Exception as e:
        print("HLO census failed:", e)

    # ---------------- interleaved slope timing ----------------------------
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rows = {"A": make_a, "B": make_b, "C": make_c, "D": make_d}
    best = {k: float("inf") for k in rows}
    for r in range(reps):
        line = [f"pair {r}:"]
        for k, mk in rows.items():
            s = timed_slope(mk, 2, 32, reps=2)
            best[k] = min(best[k], s)
            line.append(f"{k} {1e6 * s / block_seconds:7.2f} us/s")
        print("  ".join(line), flush=True)
    print("best:", "  ".join(
        f"{k} {1e6 * best[k] / block_seconds:.2f} us/s ({block_seconds / best[k]:.0f}x)"
        for k in rows))


if __name__ == "__main__":
    main()
