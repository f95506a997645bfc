"""Pallas envelope kernel vs the flat-scan implementation (and oracle).

The kernel runs in interpret mode on CPU so the exact code path shipping to
the TPU is what's tested."""

import numpy as np
import pytest
import jax.numpy as jnp

from mixlab_tpu.dsp.envelope import EnvelopeDef
from mixlab_tpu.dsp.envelope_pallas import envelope_block_pallas
from mixlab_tpu.engine.config import BlockSpec, EngineConfig
from mixlab_tpu.protocol import EnvelopeParams

CFG = EngineConfig(sample_rate=48_000)
SPT = CFG.samples_per_tick


def gate_signal(S, seed, p_mid=0.3):
    rng = np.random.default_rng(seed)
    x = np.empty(S, np.float32)
    pos = 0
    while pos < S:
        seg = int(rng.integers(5, 900))
        x[pos : pos + seg] = rng.choice([0.0, 1.0, 0.5], p=[0.35, 0.35, 0.3])
        pos += seg
    return x


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n_ticks", [6, 12])
def test_pallas_matches_flat_scans(seed, n_ticks):
    d = EnvelopeDef()
    params = EnvelopeParams()
    aux = d.prepare(params, CFG)
    block = BlockSpec(n_ticks)
    S = block.n_samples(CFG)
    ms = 1000.0 / CFG.sample_rate

    state_flat = d.init_state(params, CFG)
    state_pl = d.init_state(params, CFG)
    for blk in range(3):  # carried state across blocks
        x = jnp.asarray(gate_signal(S, seed * 10 + blk))
        state_flat, outs, _ = d.run_block(
            params, aux, None, state_flat, [x], CFG, block
        )
        want = np.asarray(outs[0])
        got, state_pl = envelope_block_pallas(x, state_pl, aux, ms, interpret=True)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5,
                                   err_msg=f"block {blk}")
    # carried state converges identically
    assert bool(state_flat["mode_on"]) == bool(state_pl["mode_on"])
    np.testing.assert_allclose(
        float(state_flat["off_amp"]), float(state_pl["off_amp"]), atol=2e-5
    )


def test_pallas_matches_scalar_oracle():
    from tests.oracle import envelope as oracle_envelope

    d = EnvelopeDef()
    params = EnvelopeParams(attack_ms=3.0, decay_ms=10.0,
                            sustain_amplitude=0.6, release_ms=25.0)
    aux = d.prepare(params, CFG)
    S = 19_200
    x = gate_signal(S, 7)
    ms = 1000.0 / CFG.sample_rate
    got, _ = envelope_block_pallas(
        jnp.asarray(x), d.init_state(params, CFG), aux, ms, K=128, interpret=True
    )
    want, _ = oracle_envelope(
        0, x, params.attack_ms, params.decay_ms, params.sustain_amplitude,
        params.release_ms, CFG.sample_rate,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_pallas_dense_edges():
    """Edges denser than the lane length stress the combine."""
    d = EnvelopeDef()
    params = EnvelopeParams()
    aux = d.prepare(params, CFG)
    ms = 1000.0 / CFG.sample_rate
    S = 9600
    rng = np.random.default_rng(3)
    x = rng.choice([0.0, 1.0], size=S).astype(np.float32)  # edge every sample
    state = d.init_state(params, CFG)
    got, _ = envelope_block_pallas(jnp.asarray(x), state, aux, ms,
                                   K=256, interpret=True)
    state2, outs, _ = d.run_block(
        params, aux, None, d.init_state(params, CFG), [jnp.asarray(x)], CFG,
        BlockSpec(12),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(outs[0]), atol=2e-5)


def test_pallas_split_large_blocks(monkeypatch):
    """Blocks above MAX_KERNEL_S split into sequential launches with exact
    state carry (the single-launch form OOMs the 16 MB scoped VMEM on real
    chips at ~1.5M samples; reproduced small here by shrinking the cap)."""
    import mixlab_tpu.dsp.envelope_pallas as ep

    d = EnvelopeDef()
    params = EnvelopeParams()
    aux = d.prepare(params, CFG)
    ms = 1000.0 / CFG.sample_rate
    S = 48_000
    x = jnp.asarray(gate_signal(S, 11))

    state_ref = d.init_state(params, CFG)
    block = BlockSpec(S // SPT)
    state_ref, outs, _ = d.run_block(params, aux, None, state_ref, [x], CFG, block)
    want = np.asarray(outs[0])

    monkeypatch.setattr(ep, "MAX_KERNEL_S", 16_384)  # forces 3 sub-launches
    got, state_pl = ep.envelope_block_pallas(
        x, d.init_state(params, CFG), aux, ms, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)
    assert bool(state_ref["mode_on"]) == bool(state_pl["mode_on"])
    np.testing.assert_allclose(
        float(state_ref["off_amp"]), float(state_pl["off_amp"]), atol=2e-5)
