"""Fused EqThree Pallas kernel (dsp/eq_pallas.py) vs the XLA chunked path:
equivalence, state continuity, vmap batching."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mixlab_tpu.dsp import eq_pallas
from mixlab_tpu.dsp.registry import get_def
from mixlab_tpu.engine.config import BlockSpec, EngineConfig
from mixlab_tpu.protocol import Decibel, EqThreeParams

CFG = EngineConfig(sample_rate=48_000)
EQ = get_def("EqThree")
PARAMS = EqThreeParams(Decibel(4.0), Decibel(-2.0), Decibel(4.0))
AUX = EQ.prepare(PARAMS, CFG)


def _run(x, st, block, force):
    orig = eq_pallas.PALLAS_THRESHOLD
    eq_pallas.PALLAS_THRESHOLD = 0 if force == "pallas" else (1 << 60)
    try:
        return EQ.run_block(PARAMS, AUX, None, st, [x], CFG, block)
    finally:
        eq_pallas.PALLAS_THRESHOLD = orig


@pytest.mark.parametrize("n_ticks", [60, 16, 120])
def test_kernel_matches_xla_path(n_ticks):
    block = BlockSpec(n_ticks)
    S = block.n_samples(CFG)
    rng = np.random.default_rng(n_ticks)
    x = jnp.asarray(rng.uniform(-1, 1, S).astype(np.float32))
    st = {"poles": jnp.asarray(rng.uniform(-0.1, 0.1, (4, 2)).astype(np.float32)),
          "hist": jnp.asarray(rng.uniform(-1, 1, 3).astype(np.float32))}
    st_r, (o_r,), _ = _run(x, st, block, "xla")
    st_k, (o_k,), _ = _run(x, st, block, "pallas")
    assert np.abs(np.asarray(o_r) - np.asarray(o_k)).max() < 2e-5
    assert np.abs(np.asarray(st_r["poles"]) - np.asarray(st_k["poles"])).max() < 2e-5
    assert np.array_equal(np.asarray(st_r["hist"]), np.asarray(st_k["hist"]))


def test_kernel_state_continuity():
    block = BlockSpec(30)
    S = block.n_samples(CFG)
    rng = np.random.default_rng(7)
    x1 = jnp.asarray(rng.uniform(-1, 1, S).astype(np.float32))
    x2 = jnp.asarray(rng.uniform(-1, 1, S).astype(np.float32))
    st0 = {"poles": jnp.zeros((4, 2), jnp.float32),
           "hist": jnp.zeros(3, jnp.float32)}
    stA, (oA,), _ = _run(x1, st0, block, "pallas")
    stB, (oB,), _ = _run(x2, stA, block, "pallas")
    stR, (oR,), _ = _run(jnp.concatenate([x1, x2]), st0, BlockSpec(60), "xla")
    err = np.abs(np.concatenate([np.asarray(oA), np.asarray(oB)])
                 - np.asarray(oR)).max()
    assert err < 2e-5


def test_kernel_under_vmap():
    # config 3 vmaps the eq over stems/channels; the kernel must batch
    block = BlockSpec(60)
    S = block.n_samples(CFG)
    rng = np.random.default_rng(3)
    xs = jnp.asarray(rng.uniform(-1, 1, (4, S)).astype(np.float32))
    st0 = {"poles": jnp.zeros((4, 2), jnp.float32),
           "hist": jnp.zeros(3, jnp.float32)}
    sts = jax.tree.map(lambda a: jnp.broadcast_to(a, (4,) + a.shape), st0)

    def one(x, st):
        st2, (out,), _ = EQ.run_block(PARAMS, AUX, None, st, [x], CFG, block)
        return out, st2

    orig = eq_pallas.PALLAS_THRESHOLD
    eq_pallas.PALLAS_THRESHOLD = 0
    try:
        outs, _ = jax.vmap(one)(xs, sts)
    finally:
        eq_pallas.PALLAS_THRESHOLD = orig
    for i in range(4):
        _, (ref,), _ = _run(xs[i], st0, block, "xla")
        assert np.abs(np.asarray(outs[i]) - np.asarray(ref)).max() < 2e-5


def test_kernel_split_large_blocks(monkeypatch):
    """Blocks above MAX_KERNEL_S split into sequential launches carrying the
    pole state exactly (single-launch OOMs scoped VMEM at ~1.5M samples on
    chip; reproduced small by shrinking the cap)."""
    import mixlab_tpu.dsp.eq_pallas as eqp
    from mixlab_tpu.dsp.registry import get_def
    from mixlab_tpu.protocol import Decibel, EqThreeParams

    cfg = EngineConfig(sample_rate=48_000)
    d = get_def("EqThree")
    params = EqThreeParams(Decibel(4.0), Decibel(-2.0), Decibel(3.0))
    aux = d.prepare(params, cfg)
    S = 64_000
    block = BlockSpec(S // cfg.samples_per_tick)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(-1, 1, S).astype(np.float32))

    st_ref = d.init_state(params, cfg)
    st_ref, (want,), _ = d.run_block(params, aux, None, st_ref, [x], cfg, block)

    monkeypatch.setattr(eqp, "MAX_KERNEL_S", 16_384)  # forces 4 sub-launches
    st_split = d.init_state(params, cfg)
    st_split, (got,), _ = d.run_block(params, aux, None, st_split, [x], cfg, block)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_split["poles"]),
                               np.asarray(st_ref["poles"]), rtol=2e-5, atol=2e-5)
