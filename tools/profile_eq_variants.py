#!/usr/bin/env python
"""Pin down the eq_three in-graph overhead (~17 us/s vs ~8 isolated).

Suspects: the [S] -> [C,K] transposes around the Pallas call (hoisted as
loop-invariants when the isolated bench feeds a constant input) and the
custom-call materialization boundaries.

Variants (all scan-over-blocks, S=384000):
  const   - constant input (the original isolated measurement)
  vary    - input recomputed from the step index each step (no hoisting)
  varyT   - vary + the output is re-consumed as [S] (forces out transpose)
  notr    - vary, but reshape path without the final [:S] slice (control)

Run: python tools/profile_eq_variants.py [reps]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import timed_slope  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from mixlab_tpu import protocol as p
    from mixlab_tpu.dsp.registry import get_def
    from mixlab_tpu.engine.config import BlockSpec, EngineConfig

    cfg = EngineConfig(sample_rate=48_000)
    block = BlockSpec(480)
    S = block.n_samples(cfg)
    block_seconds = S / cfg.sample_rate

    eq_def = get_def("EqThree")
    eq_params = p.EqThreeParams(p.Decibel(4.0), p.Decibel(0.0), p.Decibel(4.0))
    eq_aux = eq_def.prepare(eq_params, cfg)
    eq_state0 = eq_def.init_state(eq_params, cfg)
    rng = np.random.default_rng(0)
    xin = jnp.asarray(rng.uniform(-1, 1, S).astype(np.float32))
    idx = jnp.arange(S, dtype=jnp.float32)

    def make_variant(mode):
        def scanned(x0, state0, n):
            def body(carry, k):
                st, acc = carry
                if mode == "const":
                    x = x0
                else:
                    x = jnp.sin(idx * 1e-4 + k.astype(jnp.float32))
                st, (out,), _ = eq_def.run_block(
                    eq_params, eq_aux, None, st, [x], cfg, block)
                if mode == "varyT":
                    # consume as [S] with a position-weighted sum: the
                    # reduction is order-sensitive, so the relayout to [S]
                    # cannot be elided
                    acc = acc + jnp.sum(out * idx)
                else:
                    acc = acc + jnp.sum(out)
                return (st, acc), None
            (st, acc), _ = jax.lax.scan(
                body, (state0, jnp.float32(0.0)),
                jnp.arange(n, dtype=jnp.int32))
            return acc
        f = jax.jit(scanned, static_argnums=2)
        def make(n):
            return lambda: f(xin, eq_state0, n)
        return make

    rows = {m: make_variant(m) for m in ("const", "vary", "varyT")}

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
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
