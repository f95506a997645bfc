"""Scanned offline rendering: many blocks in ONE device dispatch.

The per-block dispatch model (engine/render.py) is right for realtime
serving; for offline/benchmark rendering the block loop itself moves on
device via ``lax.scan`` — the compiled patch program becomes the scan body,
DSP state the carry, and per-block host_aux arrays are stacked into scan
inputs.  One jitted call renders minutes of audio with zero host round
trips (SURVEY §7: "N-ticks-per-dispatch lax.scan for offline/benchmark
mode").
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mixlab_tpu.engine.compiler import CompiledPatch, compile_patch
from mixlab_tpu.engine.config import BlockSpec, EngineConfig
from mixlab_tpu.engine.graph import Workspace


def stacked_host_aux(patch: CompiledPatch, t0: int, n_blocks: int):
    """Stack per-block host_prepare outputs along a leading scan axis.

    Always carries a ``__block__`` index leaf so the scan has a length even
    when no module in the patch prepares host arrays (the compiled program
    ignores keys that aren't module ids)."""
    cfg, block = patch.cfg, patch.block
    spb = block.n_samples(cfg)
    per_block = [patch.host_aux(t0 + i * spb) for i in range(n_blocks)]
    stacked = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *per_block
    )
    stacked["__block__"] = jnp.arange(n_blocks, dtype=jnp.int32)
    return stacked


def build_scanned(
    ws: Workspace,
    cfg: EngineConfig,
    block: BlockSpec,
    checksum_only: bool = False,
):
    """Returns (patch, scanned_fn) where
    ``scanned_fn(aux, host_aux_stacked, state0) -> (state, taps_or_checksum)``
    is jitted; with ``checksum_only`` the stacked taps are reduced to one
    scalar on device (benchmark mode: nothing big crosses the host link)."""
    patch = compile_patch(ws, cfg, block, jit=False)
    program = patch._fn

    def scanned(aux, host_aux_stacked, state0):
        if checksum_only:
            # reduce taps to a scalar INSIDE the body: the stacked-then-summed
            # form materializes an [n_blocks, S] array per tap leaf to HBM
            # before the reduction (seen as f32[n,480,800] fusions in the
            # flagship HLO census) for data the benchmark only checksums
            def body_ck(carry, host_aux_b):
                state, acc = carry
                state, taps = program(aux, host_aux_b, state)
                leaves = jax.tree.leaves(taps)
                acc = acc + sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
                return (state, acc), None

            (state, checksum), _ = jax.lax.scan(
                body_ck, (state0, jnp.float32(0.0)), host_aux_stacked
            )
            return state, checksum

        def body(state, host_aux_b):
            state, taps = program(aux, host_aux_b, state)
            return state, taps

        state, taps = jax.lax.scan(body, state0, host_aux_stacked)
        return state, taps

    return patch, jax.jit(scanned)


def render_scanned(
    ws: Workspace,
    n_ticks: int,
    cfg: EngineConfig = EngineConfig(),
    block_ticks: int = 60,
    t0: int = 0,
):
    """Offline render entirely on device; returns (state, taps pytree with a
    leading [n_blocks] axis)."""
    assert n_ticks % block_ticks == 0
    block = BlockSpec(block_ticks)
    patch, fn = build_scanned(ws, cfg, block)
    aux = patch.prepare_aux(ws)
    state0 = patch.init_state(ws)
    host_aux = stacked_host_aux(patch, t0, n_ticks // block_ticks)
    return patch, fn(aux, host_aux, state0)
