"""Shared test helpers: jitted single-module runner."""

from __future__ import annotations

import functools

import jax
import numpy as np

from mixlab_tpu.dsp.registry import get_def
from mixlab_tpu.engine.config import BlockSpec, EngineConfig


@functools.lru_cache(maxsize=256)
def _jitted(kind, params, cfg, block, n_inputs, connected_mask):
    d = get_def(kind)

    def fn(aux, host_aux, state, inputs):
        full_inputs = []
        it = iter(inputs)
        for i in range(n_inputs):
            full_inputs.append(next(it) if connected_mask[i] else None)
        return d.run_block(params, aux, host_aux, state, full_inputs, cfg, block)

    return jax.jit(fn)


def run_module(
    kind,
    params,
    inputs,
    t0=0,
    cfg=EngineConfig(sample_rate=44_100),
    block=None,
    state=None,
):
    """Run one module over one block, jitted (cached per shape/kind)."""
    if block is None:
        block = BlockSpec(n_ticks=4)
    d = get_def(kind)
    aux = d.prepare(params, cfg)
    host_aux = d.host_prepare(params, t0, block, cfg)
    if state is None:
        state = d.init_state(params, cfg)
    mask = tuple(x is not None for x in inputs)
    fn = _jitted(kind, params, cfg, block, len(inputs), mask)
    # tests are written in the reference's interleaved [S,2] stereo
    # convention; the device convention is a channel-major (L, R) pair
    # (dsp/base.py) — convert at this boundary in both directions
    dev_inputs = [
        (x[:, 0], x[:, 1]) if getattr(x, "ndim", 0) == 2 and x.shape[1] == 2 else x
        for x in inputs
        if x is not None
    ]
    state, outs, taps = fn(aux, host_aux, state, dev_inputs)

    def host(o):
        if o is None:
            return None
        if isinstance(o, tuple):
            l, r = o
            return np.stack([np.asarray(l), np.asarray(r)], axis=-1)
        return np.asarray(o)

    return state, [host(o) for o in outs], taps
