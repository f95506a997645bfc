"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np

from mixlab_tpu.dsp.base import interleave_tap

import jax


def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    state, taps = jax.jit(fn)(*args)
    jax.block_until_ready(state)
    assert taps  # monitor tap present


def test_stem_parallel_mixdown_matches_serial():
    from bench import build_16_module_graph
    from mixlab_tpu.engine.compiler import compile_patch
    from mixlab_tpu.engine.config import BlockSpec, EngineConfig
    from mixlab_tpu.parallel.stems import make_mesh, stem_parallel_step

    cfg = EngineConfig(sample_rate=48_000)
    block = BlockSpec(2)
    ws, mon = build_16_module_graph()
    mesh = make_mesh(4)

    fn, make_args, patch = stem_parallel_step(
        ws, cfg, block, mesh, monitor_key=str(mon.value)
    )
    aux, host_aux, state = make_args(0)
    _, master = fn(aux, host_aux, state)

    # serial reference: one stem * 4
    p1 = compile_patch(ws, cfg, block)
    a1 = p1.prepare_aux(ws)
    h1 = p1.host_aux(0)
    s1 = p1.init_state(ws)
    _, taps = p1.run(a1, h1, s1)
    want = 4.0 * interleave_tap(taps[str(mon.value)]["audio"])
    np.testing.assert_allclose(np.asarray(master), want, atol=2e-4)
