"""Opt-in golden-fixture parity ON REAL TPU HARDWARE.

Run with: MIXLAB_TPU_GOLDEN=1 python -m pytest tests/test_tpu_golden.py
(from a normal shell, NOT under the CPU-forced conftest of CI runs — this
file overrides the platform back to default when the env var is set).
Regular suite runs skip it.  This test caught the MXU reduced-precision
default (BENCH_NOTES.md "MXU precision").
"""

import os

import numpy as np
import pytest


@pytest.mark.skipif(
    not os.environ.get("MIXLAB_TPU_GOLDEN"), reason="set MIXLAB_TPU_GOLDEN=1"
)
def test_eq_three_golden_on_tpu(fixtures_dir):
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("no TPU backend")
    from mixlab_tpu.dsp.registry import get_def
    from mixlab_tpu.engine.config import BlockSpec, EngineConfig
    from mixlab_tpu.protocol import Decibel, EqThreeParams

    x = np.fromfile(fixtures_dir / "module/eq_three/chronos.f32.raw", dtype="<f4")
    want = np.fromfile(fixtures_dir / "module/eq_three/chronos-eq.f32.raw", dtype="<f4")

    CFG = EngineConfig(sample_rate=44_100)
    block = BlockSpec(60)
    S = block.n_samples(CFG)
    d = get_def("EqThree")
    params = EqThreeParams(Decibel(4.0), Decibel(0.0), Decibel(4.0))
    aux = d.prepare(params, CFG)
    fn = jax.jit(lambda st, xs: d.run_block(params, aux, None, st, [xs], CFG, block)[:2])
    state = d.init_state(params, CFG)
    outs = []
    for b in range(len(x) // S):
        state, (o,) = fn(state, x[b * S : (b + 1) * S])
        outs.append(np.asarray(o))
    got = np.concatenate(outs)
    err = np.abs(got - want[: len(got)])
    assert err.max() < 5e-4, f"max {err.max():.2e} (MXU precision regression?)"
