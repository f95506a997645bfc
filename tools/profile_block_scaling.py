#!/usr/bin/env python
"""Per-scan-iteration fixed overhead: flagship cost per content-second as a
function of block length.  If each scan iteration pays a fixed kernel-launch
tax (N kernels x ~us each), us-per-content-second falls ~linearly with
block length; if the cost is honest per-sample compute, it stays flat.

Run: python tools/profile_block_scaling.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _thunk, build_16_module_graph, timed_slope  # noqa: E402


def main():
    import jax

    from mixlab_tpu.engine.config import BlockSpec, EngineConfig
    from mixlab_tpu.engine.scan_render import build_scanned, stacked_host_aux

    cfg = EngineConfig(sample_rate=48_000)
    ws, _mon = build_16_module_graph()

    CONTENT = 1920  # seconds of audio between the slope points

    results = {}
    for bt in (120, 480, 1920):
        block = BlockSpec(bt)
        block_seconds = block.n_samples(cfg) / cfg.sample_rate
        patch, fn = build_scanned(ws, cfg, block, checksum_only=True)
        aux = patch.prepare_aux(ws)
        state0 = patch.init_state(ws)
        jfn = jax.jit(lambda a, h, s, _fn=fn: _fn(a, h, s)[1])

        def make(n):
            return _thunk(jfn, aux, stacked_host_aux(patch, 0, n), state0)

        n2 = max(4, int(round(CONTENT / block_seconds)))
        s = timed_slope(make, 2, 2 + n2, reps=3)
        us_per_cs = 1e6 * s / block_seconds
        results[bt] = (us_per_cs, 1e6 * s)
        print(f"block_ticks={bt:5d} ({block_seconds:5.0f}s/block): "
              f"{us_per_cs:7.2f} us per content-second   "
              f"{1e6*s:9.1f} us per iteration", flush=True)

    # linear fit: us_per_iter = fixed + rate * block_seconds
    import numpy as np
    bts = sorted(results)
    xs = np.array([BlockSpec(bt).n_samples(cfg) / cfg.sample_rate for bt in bts])
    ys = np.array([results[bt][1] for bt in bts])
    A = np.vstack([np.ones_like(xs), xs]).T
    (fixed, rate), *_ = np.linalg.lstsq(A, ys, rcond=None)
    print(f"fit: {fixed:.1f} us fixed per iteration + {rate:.2f} us per content-second")


if __name__ == "__main__":
    main()
