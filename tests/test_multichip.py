"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

from mixlab_tpu.dsp.base import interleave_tap

import jax


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_dryrun_multichip_sweep(n_devices):
    """The driver's dryrun across mesh sizes, including the uneven
    stems/rows edge cases it now embeds."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(n_devices)


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
    _, master = fn(*make_args(0))

    # serial reference: one stem * 4
    p1 = compile_patch(ws, cfg, block)
    a1 = p1.prepare_aux(ws)
    h1 = p1.host_aux(0)
    s1 = p1.init_state(ws)
    _, taps = p1.run(a1, h1, s1)
    want = 4.0 * interleave_tap(taps[str(mon.value)]["audio"])
    np.testing.assert_allclose(np.asarray(master), want, atol=2e-4)


@pytest.mark.parametrize("n_stems,n_devices", [(5, 4), (9, 8), (3, 2), (1, 4)])
def test_stem_count_not_divisible_by_devices(n_stems, n_devices):
    """stems % devices != 0: pad stems run but are masked out of the
    mixdown, so master == n_stems * one-stem reference exactly."""
    from bench import build_16_module_graph
    from mixlab_tpu.engine.compiler import compile_patch
    from mixlab_tpu.engine.config import BlockSpec, EngineConfig
    from mixlab_tpu.parallel.stems import make_mesh, stem_parallel_step

    cfg = EngineConfig(sample_rate=48_000)
    block = BlockSpec(2)
    ws, mon = build_16_module_graph()
    mesh = make_mesh(n_devices)

    fn, make_args, _ = stem_parallel_step(
        ws, cfg, block, mesh, monitor_key=str(mon.value), n_stems=n_stems
    )
    args = make_args(0)
    assert args[0] is not None
    mask = np.asarray(args[3])
    pad = -(-n_stems // n_devices) * n_devices
    assert mask.shape == (pad,) and mask.sum() == n_stems
    _, master = fn(*args)

    p1 = compile_patch(ws, cfg, block)
    _, taps = p1.run(p1.prepare_aux(ws), p1.host_aux(0), p1.init_state(ws))
    want = float(n_stems) * interleave_tap(taps[str(mon.value)]["audio"])
    np.testing.assert_allclose(np.asarray(master), want, atol=2e-4)


@pytest.mark.parametrize("height", [127, 129, 64 + 17])
def test_row_sharded_blend_uneven_rows(height):
    """Plane heights that do not divide the mesh shard cleanly."""
    from mixlab_tpu.parallel.stems import make_mesh, row_sharded_blend

    mesh = make_mesh(8)
    rng = np.random.default_rng(height)
    a = rng.integers(0, 256, (height, 320), dtype=np.uint8)
    b = rng.integers(0, 256, (height, 320), dtype=np.uint8)
    for fade in (0, 37, 255):
        out = np.asarray(row_sharded_blend(mesh)(a, b, fade))
        want = (
            (a.astype(np.uint32) * fade + b.astype(np.uint32) * (255 - fade))
            // 255
        ).astype(np.uint8)
        np.testing.assert_array_equal(out, want)
