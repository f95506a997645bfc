"""Chunked two-pass envelope vs the flat-scan implementation and oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from mixlab_tpu.dsp.envelope_chunked import pick_lanes, run_block_chunked
from mixlab_tpu.engine.config import EngineConfig

CFG = EngineConfig(sample_rate=44_100)
MS = 1000.0 / CFG.sample_rate
PVALS = dict(attack_ms=5.0, decay_ms=20.0, sustain_amplitude=0.6, release_ms=15.0)
PARAMS = {k: jnp.float32(v) for k, v in PVALS.items()}


def fresh_state():
    return {
        "mode_on": jnp.asarray(False),
        "on_pos": jnp.int32(-(2**30)),
        "off_pos": jnp.int32(-(2**30)),
        "off_amp": jnp.float32(0.0),
    }


def gate_signal(total, events):
    x = np.full(total, 0.5, dtype=np.float32)
    for i, (pos, val) in enumerate(events):
        end = events[i + 1][0] if i + 1 < len(events) else total
        x[pos:end] = val
    return x


@pytest.mark.parametrize("K", [64, 128, 512])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_chunked_matches_oracle_with_state_carry(K, seed):
    rng = np.random.default_rng(seed)
    S = 735 * 12
    n_ev = int(rng.integers(0, 10))
    events = sorted(
        (int(rng.integers(0, S)), float(rng.choice([0.0, 1.0, 0.5])))
        for _ in range(n_ev)
    )
    x = gate_signal(S, events)

    state = fresh_state()
    out1, state = run_block_chunked(jnp.asarray(x[: S // 2]), state, PARAMS, MS, K=K)
    out2, _ = run_block_chunked(jnp.asarray(x[S // 2 :]), state, PARAMS, MS, K=K)
    got = np.concatenate([np.asarray(out1), np.asarray(out2)])
    want, _ = oracle.envelope(0, x, *PVALS.values(), CFG.sample_rate)
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_chunked_symbolic_cross_chunk_off_amp():
    """A falling edge in chunk k whose rising edge is in chunk j<k exercises
    the symbolic off_amp (kind 2) resolution across the lane combine."""
    S = 4096
    K = 32  # chunk length 128
    x = gate_signal(S, [(10, 1.0), (1000, 0.5), (2000, 0.0), (3000, 0.5)])
    out, _ = run_block_chunked(jnp.asarray(x), fresh_state(), PARAMS, MS, K=K)
    want, _ = oracle.envelope(0, x, *PVALS.values(), CFG.sample_rate)
    np.testing.assert_allclose(np.asarray(out), want, atol=3e-4)


def test_pick_lanes_multiple_of_128():
    for S in (32768, 384000, 735 * 60):
        K = pick_lanes(S)
        assert K % 128 == 0 and 256 <= K <= 4096
