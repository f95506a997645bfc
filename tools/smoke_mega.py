"""Quick CPU equivalence smoke for the whole-graph Pallas lowering."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import bench
from mixlab_tpu.engine import pallas_graph
from mixlab_tpu.engine.compiler import compile_patch
from mixlab_tpu.engine.config import BlockSpec, EngineConfig


def run(patch, ws, n_blocks=3):
    aux = patch.prepare_aux(ws)
    state = patch.init_state(ws)
    outs = []
    spb = patch.block.n_samples(patch.cfg)
    for i in range(n_blocks):
        ha = patch.host_aux(i * spb)
        state, taps = patch.run(aux, ha, state)
        outs.append(taps)
    return state, outs


def main():
    pallas_graph.MAX_LAUNCH_S = 16384  # force multi-launch on a small block
    cfg = EngineConfig(sample_rate=48_000)
    ws, mon = bench.build_16_module_graph()
    block = BlockSpec(64)  # 51200 samples -> 4 launches
    pr = compile_patch(ws, cfg, block, mega=False)
    pm = compile_patch(ws, cfg, block, mega=True)
    assert pm._mega and not pr._mega

    sr, outs_r = run(pr, ws)
    sm, outs_m = run(pm, ws)

    # state equivalence
    for (kr, vr), (km, vm) in zip(
        sorted(jax.tree.leaves_with_path(sr), key=lambda kv: str(kv[0])),
        sorted(jax.tree.leaves_with_path(sm), key=lambda kv: str(kv[0])),
    ):
        np.testing.assert_allclose(vr, vm, rtol=0, atol=2e-5, err_msg=str(kr))

    # tap equivalence per block
    for bi, (tr, tm) in enumerate(zip(outs_r, outs_m)):
        lr = jax.tree.leaves_with_path(tr)
        lm = jax.tree.leaves_with_path(tm)
        assert [k for k, _ in lr] == [k for k, _ in lm], (lr, lm)
        for (k, vr), (_, vm) in zip(lr, lm):
            np.testing.assert_allclose(
                np.asarray(vr), np.asarray(vm), rtol=0, atol=2e-5,
                err_msg=f"block {bi} {k}")
    print("mega == regular over 3 blocks:",
          float(np.abs(np.asarray(outs_r[2][str(mon.value)]["audio"][0])).max()))


if __name__ == "__main__":
    main()
