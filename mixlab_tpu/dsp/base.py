"""Module definition interface for the TPU DSP layer.

TPU-native re-design of the reference's ``ModuleT`` trait
(``src/module/mod.rs:7-19`` in haileys/mixlab).  Where the reference runs a
stateful object per tick with borrowed buffers, the TPU build lowers every
module to a *pure function over a block of ticks*:

    run_block(aux, host_aux, state, inputs, cfg, block)
        -> (state', outputs, taps)

and the graph compiler (:mod:`mixlab_tpu.engine.compiler`) composes all
modules of a patch into ONE jitted program.  State (filter poles, envelope
phase, ...) is an explicit pytree carry, which also makes runtime DSP state
checkpointable — something the reference cannot do (its persistence only
saves declarative params, ``src/persist.rs:9-21``).

Data conventions (device):
  * mono buffer:   f32 ``[S]``        (S = block samples)
  * stereo buffer: TUPLE ``(L, R)`` of two f32 ``[S]`` mono arrays
  * video:         handled by the host video engine, not through run_block

Stereo-as-a-pair is the channel-major layout taken to its end point, and it
is the load-bearing performance decision of the audio path (round 3): an
``[S, 2]`` array leaves 126 of the VPU's 128 lanes idle per elementwise op
and forces a materialized stack/unstack at every panner/splitter/oscillator
boundary, which XLA's fusion did not see through — measured at ~34 us per
content-second across the flagship's 13 elementwise modules
(BENCH_NOTES.md "flagship residual profile").  As a pair of perfectly-tiled
``[S]`` arrays, channel routing (panner, splitter, mono->stereo fanout) is
pure pytree plumbing with ZERO device ops, duplicated channels (an
oscillator's L==R) are a single traced value XLA computes once, and every
elementwise module body is a full-lane ``[S]`` kernel.  Measured A/B at
module granularity on the same flagship graph: 1.8x (tools/ab_channel_major
.py, 22k -> 39k x realtime).  Stereo crosses to the host (taps, ext feeds)
as channel-major ``[2, ...]`` arrays; hosts convert with one numpy
transpose.

``aux`` is a pytree of *traced* device values derived from params at edit
time — continuous params (gains, frequencies) live here so that slider drags
do NOT trigger recompilation.  Structural params (waveform, channel count)
are baked into the trace and recompile on change (human-rate, acceptable).

``host_aux`` is a pytree of per-dispatch host-prepared arrays (e.g. per-tick
oscillator phase bases computed in float64 on host for precision) — see
``host_prepare``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from mixlab_tpu.engine.config import BlockSpec, EngineConfig
from mixlab_tpu.protocol import Terminal

Array = Any  # jax array
Pytree = Any


@dataclass
class MegaSpec:
    """How one module participates in the whole-graph Pallas kernel
    (:mod:`mixlab_tpu.engine.pallas_graph`).

    The kernel's buffer layout is chunk-major ``[K, 128]`` f32 in linear
    sample order (sample ``s`` lives at ``[s // 128, s % 128]``); stereo is
    the usual channel-major ``(L, R)`` pair of such values.  A large block
    is split into several sequential launches; per-module scalar state
    crosses between launches through SMEM rows, which requires the layout
    law below.

    Fields (all trace-time callables):
      emit(ctx, ins) -> (outs, taps, (f_exits, i_exits))
          The in-kernel module body.  ``ins[i]`` is a ``[K, 128]`` value,
          an ``(L, R)`` pair, or None (unconnected -> zero semantics via
          ``ctx.expect_*``).  ``taps`` maps declared tap names to values
          (pair / mono [K,128] / scalar).  LAYOUT LAW: the exit scalar
          lists must match ``state_scalars`` element-for-element — the
          builder feeds launch N's exits directly as launch N+1's state
          scalars.
      param_scalars(aux, host_aux) -> (f32 items, i32 items)
          Launch-invariant scalars (params).  Items may be 0-d or 1-d
          traced arrays; they are flattened in order.
      state_scalars(state) -> (f32 items, i32 items)
          The module's carried state flattened to scalars (layout == exits).
      operands(aux, host_aux) -> {name: [S] array}
          Whole-block per-sample arrays the kernel cannot derive (external
          feeds, values produced by XLA).  Any dtype.
      tables(S_launch) -> [np/jnp arrays]
          Per-launch VMEM constants (e.g. Toeplitz tables sized to the
          launch's chunk count).
      scratch(S_launch) -> [(shape, dtype)]
          Per-launch VMEM scratch requests.
      unpack(f_exits, i_exits, old_state) -> new state pytree
          Final-launch exits -> the module's state pytree.
      tap_post(taps) -> taps
          Host-side fixup after taps are reassembled to ``[T, spt]``
          (e.g. OutputDevice's max-|sample| scalar -> clip bool).
      declare: {"taps": [(name, chans)], "exit_f": n, "exit_i": n}
          Static structure: ``chans`` 2 = stereo pair, 1 = mono array,
          0 = scalar (combined across launches with max).
    """

    emit: Callable
    declare: Dict[str, Any] = field(
        default_factory=lambda: {"taps": [], "exit_f": 0, "exit_i": 0}
    )
    param_scalars: Callable = lambda aux, host_aux: ([], [])
    state_scalars: Callable = lambda state: ([], [])
    operands: Callable = lambda aux, host_aux: {}
    tables: Callable = lambda S: []
    scratch: Callable = lambda S: []
    unpack: Callable = lambda f, i, old: old
    tap_post: Optional[Callable] = None


class EmitCtx:
    """Per-module view handed to :meth:`MegaSpec.emit` inside the kernel."""

    def __init__(self, S, cfg, block, pf, pi, sf, si, operands, tables,
                 scratch, t0_index, used):
        self.S = S              # samples in THIS launch
        self.K = S // 128
        self.C = 128
        self.cfg = cfg
        self.block = block
        self.pf = pf            # param f32 scalars (SMEM reads), in order
        self.pi = pi
        self.sf = sf            # state f32 scalars (layout == exits)
        self.si = si
        self.operands = operands  # {name: [K, 128] value}
        self.tables = tables      # per-launch constant values
        self.scratch = scratch    # VMEM scratch refs
        self.t0_index = t0_index  # launch's sample offset within the block
        self.used = used          # tuple of bool per output terminal

    def zeros(self):
        import jax.numpy as jnp

        return jnp.zeros((self.K, self.C), jnp.float32)

    def expect_mono(self, x):
        return self.zeros() if x is None else x

    def expect_stereo(self, x):
        if x is None:
            z = self.zeros()
            return (z, z)
        return x


class ModuleDef:
    """One module kind. Stateless singleton; all data flows through args."""

    kind: str = "?"

    # -- structure ---------------------------------------------------------
    def terminals(self, params) -> Tuple[List[Terminal], List[Terminal]]:
        """(inputs, outputs), mirroring ModuleT::inputs/outputs."""
        raise NotImplementedError

    # -- device state ------------------------------------------------------
    def init_state(self, params, cfg: EngineConfig) -> Pytree:
        """Initial carried DSP state (or None)."""
        return None

    def carry_state(self, old_state: Pytree, params, cfg: EngineConfig) -> Pytree:
        """State carried across a params edit.  Default: keep (matches e.g.
        eq_three keeping filter poles on gain change, eq_three.rs:53-56).
        Modules that reset on edit override this."""
        return old_state

    # -- param lowering ----------------------------------------------------
    def structural_key(self, params) -> Any:
        """Hashable fingerprint of the *structural* parts of params (things
        baked into the trace: waveform, channel count...).  A param edit that
        keeps the structural key only swaps ``aux`` values — no recompile; a
        change to the key rebuilds the compiled program."""
        return None

    def prepare(self, params, cfg: EngineConfig) -> Pytree:
        """Traced device values derived from params (recomputed per edit,
        passed as jit arguments so param tweaks don't recompile)."""
        return None

    def host_prepare(
        self, params, t0: int, block: BlockSpec, cfg: EngineConfig
    ) -> Pytree:
        """Cheap per-dispatch host computation (numpy), e.g. float64 phase
        bases.  ``t0`` is the absolute sample index of the block start (exact
        Python int)."""
        return None

    # -- compute -----------------------------------------------------------
    def run_block(
        self,
        params: Any,
        aux: Pytree,
        host_aux: Pytree,
        state: Pytree,
        inputs: Sequence[Optional[Array]],
        cfg: EngineConfig,
        block: BlockSpec,
    ) -> Tuple[Pytree, List[Optional[Array]], Dict[str, Array]]:
        """Pure block kernel.  ``inputs[i]`` is None iff input i is
        unconnected (reference semantics: expect_mono/expect_stereo read a
        static zero buffer for Disconnected, io.rs:8-9,36-52 — helpers below
        reproduce that; but modules that check ``connected()`` can
        distinguish).

        ``params`` is the raw params object; ONLY parts covered by
        ``structural_key`` may influence the trace — continuous values must
        be read from ``aux`` (traced) so edits don't recompile."""
        raise NotImplementedError

    def mega_spec(
        self, params, cfg: EngineConfig, block: BlockSpec,
        connected: Sequence[bool],
    ) -> Optional[MegaSpec]:
        """How this module runs inside the whole-graph Pallas kernel, or
        None if it can only run through ``run_block`` (the graph then keeps
        the regular compiled-patch path for any region containing it).
        ``connected[i]`` says whether input terminal i is wired (static)."""
        return None


# ---------------------------------------------------------------------------
# input helpers mirroring InputRef::expect_* zero-fill semantics
# ---------------------------------------------------------------------------


def expect_mono(x: Optional[Array], S: int, dtype=np.float32) -> Array:
    import jax.numpy as jnp

    if x is None:
        return jnp.zeros((S,), dtype=dtype)
    return x


def interleave_tap(pair) -> np.ndarray:
    """Host-side: convert a channel-major stereo tap — an ``(L, R)`` pair of
    ``[..., spt]`` arrays — to interleaved ``[..., 2]`` numpy."""
    l, r = pair
    return np.stack([np.asarray(l), np.asarray(r)], axis=-1)


def expect_stereo(
    x: Optional[Tuple[Array, Array]], S: int, dtype=np.float32
) -> Tuple[Array, Array]:
    """Stereo input with zero-fill semantics.  Returns the ``(L, R)`` pair;
    an unconnected input reads ONE zeros array aliased to both channels
    (XLA materializes it once, as the reference's shared static zero buffer
    is, io.rs:8-9)."""
    import jax.numpy as jnp

    if x is None:
        z = jnp.zeros((S,), dtype=dtype)
        return (z, z)
    return x
