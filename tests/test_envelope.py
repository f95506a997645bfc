"""Envelope (ADSR) scan formulation vs sequential oracle."""

import numpy as np
import pytest

import oracle
from util import run_module
from mixlab_tpu.engine.config import BlockSpec, EngineConfig
from mixlab_tpu.protocol import EnvelopeParams

CFG = EngineConfig(sample_rate=44_100)


def run_blocks(params, x, block_ticks=2):
    block = BlockSpec(block_ticks)
    S = block.n_samples(CFG)
    assert len(x) % S == 0
    state = None
    outs = []
    for b in range(len(x) // S):
        state, (o,), _ = run_module(
            "Envelope", params, [x[b * S : (b + 1) * S]], cfg=CFG, block=block,
            state=state,
        )
        outs.append(o)
    return np.concatenate(outs)


def gate_signal(total, events):
    """events: list of (pos, value). Holds value until next event."""
    x = np.full(total, 0.5, dtype=np.float32)
    for i, (pos, val) in enumerate(events):
        end = events[i + 1][0] if i + 1 < len(events) else total
        x[pos:end] = val
    return x


@pytest.mark.parametrize("block_ticks", [1, 4])
def test_envelope_adsr_cycle(block_ticks):
    params = EnvelopeParams(
        attack_ms=5.0, decay_ms=20.0, sustain_amplitude=0.6, release_ms=15.0
    )
    S = 735 * 12
    # gate on at 100, off at 3000 (mid-release re-trigger at 3500), off 6000
    x = gate_signal(
        S,
        [(100, 1.0), (3000, 0.0), (3500, 1.0), (6000, 0.0)],
    )
    got = run_blocks(params, x, block_ticks)
    want, _ = oracle.envelope(0, x, 5.0, 20.0, 0.6, 15.0, CFG.sample_rate)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_envelope_idle_is_zero():
    params = EnvelopeParams()
    x = np.full(735 * 2, 0.5, dtype=np.float32)
    got = run_blocks(params, x, 2)
    np.testing.assert_array_equal(got, np.zeros_like(got))


def test_envelope_gate_held_across_blocks():
    # trigger in block 0, verify sustain continues through later blocks
    params = EnvelopeParams(
        attack_ms=1.0, decay_ms=5.0, sustain_amplitude=0.4, release_ms=10.0
    )
    S = 735 * 8
    x = gate_signal(S, [(10, 1.0)])
    got = run_blocks(params, x, 1)  # 8 single-tick blocks
    want, _ = oracle.envelope(0, x, 1.0, 5.0, 0.4, 10.0, CFG.sample_rate)
    np.testing.assert_allclose(got, want, atol=2e-4)
    assert abs(got[-1] - 0.4) < 1e-3  # settled at sustain


def test_envelope_zero_attack_jumps():
    params = EnvelopeParams(
        attack_ms=0.0, decay_ms=10.0, sustain_amplitude=0.5, release_ms=10.0
    )
    S = 735
    x = gate_signal(S, [(5, 1.0)])
    got = run_blocks(params, x, 1)
    want, _ = oracle.envelope(0, x, 0.0, 10.0, 0.5, 10.0, CFG.sample_rate)
    np.testing.assert_allclose(got, want, atol=2e-4)
    assert got[5] == pytest.approx(1.0, abs=1e-5)  # instant attack
