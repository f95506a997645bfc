"""On-chip A/B: whole-graph Pallas lowering vs the regular compiled patch.

Correctness first (one block at bench geometry, taps + state compared),
then matched back-to-back timed_slope on the scanned flagship render —
the same measurement bench.py reports.

Usage: python tools/ab_mega.py [--ticks 480] [--max-s N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import bench
from mixlab_tpu.engine import pallas_graph
from mixlab_tpu.engine.compiler import compile_patch
from mixlab_tpu.engine.config import BlockSpec, EngineConfig
from mixlab_tpu.engine.scan_render import stacked_host_aux


def correctness(ws, cfg, block):
    pr = compile_patch(ws, cfg, block, mega=False)
    pm = compile_patch(ws, cfg, block, mega=True)
    aux, state = pr.prepare_aux(ws), pr.init_state(ws)
    worst = 0.0
    for i in range(2):
        ha = pr.host_aux(i * block.n_samples(cfg))
        state_r, taps_r = pr.run(aux, ha, state if i == 0 else state_r)
        state_m, taps_m = pm.run(aux, ha, state if i == 0 else state_m)
        lr = jax.tree.leaves_with_path(taps_r)
        lm = jax.tree.leaves_with_path(taps_m)
        assert [str(k) for k, _ in lr] == [str(k) for k, _ in lm]
        for (k, vr), (_, vm) in zip(lr, lm):
            d = float(np.abs(np.asarray(vr, np.float64)
                             - np.asarray(vm, np.float64)).max())
            worst = max(worst, d)
        for (k, vr), (_, vm) in zip(
            jax.tree.leaves_with_path(state_r), jax.tree.leaves_with_path(state_m)
        ):
            d = float(np.abs(np.asarray(vr, np.float64)
                             - np.asarray(vm, np.float64)).max())
            worst = max(worst, d)
    print(f"correctness: max |mega - regular| over 2 blocks = {worst:.3e}")
    assert worst < 2e-5, worst


def speed(build, block_ticks, mega_env):
    os.environ["MIXLAB_MEGA"] = mega_env
    x = bench.bench_graph(build, block_ticks=block_ticks)
    return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=480)
    ap.add_argument("--max-s", type=int, default=0)
    ap.add_argument("--skip-correctness", action="store_true")
    args = ap.parse_args()
    if args.max_s:
        pallas_graph.MAX_LAUNCH_S = args.max_s
        os.environ["MIXLAB_MEGA_MAX_S"] = str(args.max_s)

    cfg = EngineConfig(sample_rate=48_000)
    ws, _ = bench.build_16_module_graph()
    block = BlockSpec(args.ticks)

    if not args.skip_correctness:
        correctness(ws, cfg, block)

    r_mega = speed(bench.build_16_module_graph, args.ticks, "1")
    r_reg = speed(bench.build_16_module_graph, args.ticks, "0")
    r_mega2 = speed(bench.build_16_module_graph, args.ticks, "1")
    print(f"regular : {r_reg:,.0f}x realtime")
    print(f"mega    : {r_mega:,.0f}x / {r_mega2:,.0f}x realtime "
          f"(max_launch_s={pallas_graph.MAX_LAUNCH_S})")


if __name__ == "__main__":
    main()
