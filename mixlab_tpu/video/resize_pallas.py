"""Polyphase bicubic resize as Pallas TPU kernels.

The dense-matmul resize (video/scale.py) is MXU-FLOP-bound: a 720p->1080p
plane costs ~3.6e9 MACs although bicubic has only 4 taps per output
(the dense matrix is ~99% zeros).  Round 1 measured the polyphase
formulation in plain XLA as HBM-bound (each shifted term round-trips HBM),
so this module does it the TPU-native way: ONE kernel per axis with the
whole plane resident in VMEM, phases/taps unrolled as static strided slices
(via a [Q, M, W] reshape of the padded plane — no gathers), f32 accumulate,
~4-9 FLOPs per output instead of n_in.

Rational ratios n_out/n_in = L/M with L <= MAX_PHASES are handled here;
anything else falls back to the dense matmul.  Weights are identical to
video/scale.py's resize_matrix rows (same Mitchell kernel, same antialias
support for minification, same edge clamping), so outputs match the dense
path within rounding.

Reference scope: DynamicScaler / swscale BICUBIC (src/video/encode.rs:
310-398); parity policy documented in video/scale.py.
"""

from __future__ import annotations

import functools
import math
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_PHASES = 16
MAX_TAPS = 12


@functools.lru_cache(maxsize=256)
def _phase_plan(n_in: int, n_out: int):
    """Polyphase decomposition of the dense resize matrix.

    Returns (L, M, J, bases[L] (python ints), weights [L, J] f32,
    pad_lo, pad_hi, Q) or None when the ratio is unsuitable."""
    if n_in == n_out:
        return None
    fr = Fraction(n_out, n_in)
    L, M = fr.numerator, fr.denominator
    if L > MAX_PHASES:
        return None
    if n_out % L:
        return None
    from mixlab_tpu.video.scale import _mitchell

    scale = n_in / n_out
    support = 2.0 * max(scale, 1.0)
    kscale = 1.0 / scale if scale > 1.0 else 1.0
    if 2 * support + 1 > MAX_TAPS:
        return None
    Q = n_out // L
    # output o = q*L + p samples input at pos = (o+0.5)*M/L - 0.5
    #          = q*M + ((p+0.5)*M/L - 0.5)
    bases = []
    weights = []
    J = 0
    per_phase = []
    for p in range(L):
        frac = (p + 0.5) * M / L - 0.5
        lo = int(math.floor(frac - support)) + 1
        hi = int(math.ceil(frac + support))
        idx = np.arange(lo, hi + 1)
        w = _mitchell((idx - frac) * (min(1.0, kscale) if scale > 1.0 else 1.0))
        w = w / w.sum()
        per_phase.append((lo, w))
        J = max(J, len(w))
    for lo, w in per_phase:
        bases.append(lo)
        weights.append(np.pad(w, (0, J - len(w))))
    W = np.asarray(weights, dtype=np.float32)
    # padding so every (q*M + bases[p] + j) lands in [0, Hp)
    pad_lo = max(0, -min(bases))
    max_idx = (Q - 1) * M + max(b for b in bases) + J - 1
    pad_hi = max(0, max_idx - (n_in - 1))
    return L, M, J, tuple(int(b) for b in bases), W, pad_lo, pad_hi, Q


def _axis0_kernel(L, M, J, bases, Q, weights, x_ref, o_ref):
    x = x_ref[:, :]  # [Hp, Wb] (one column strip)
    Hp, Wb = x.shape
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.int32)  # Mosaic has no direct u8->f32
    x = x.astype(jnp.float32)
    Qp = Hp // M
    view = x.reshape(Qp, M, Wb)
    # one contiguous [Qp, Wb] residue class per m: stride-M row access
    # becomes stride-1 slices of these (Mosaic allows only unit strides)
    subs = [
        jax.lax.slice(view, (0, m, 0), (Qp, m + 1, Wb)).reshape(Qp, Wb)
        for m in range(M)
    ]
    # one phase alive at a time; rows stored phase-major (caller
    # de-interleaves) so nothing is stacked in VMEM
    for p in range(L):
        acc = None
        for j in range(J):
            w = float(weights[p, j])
            if w == 0.0:
                continue
            idx = bases[p] + j
            q0, m = divmod(idx, M)
            rows = jax.lax.slice(subs[m], (q0, 0), (q0 + Q, Wb))
            term = w * rows
            acc = term if acc is None else acc + term
        o_ref[pl.ds(p * Q, Q), :] = acc.astype(o_ref.dtype)


def _resize_axis0(x, n_out: int, out_dtype):
    """Resize axis 0 of [H, W] via the Pallas kernel; input u8/bf16/f32."""
    n_in, W_cols = x.shape
    plan = _phase_plan(n_in, n_out)
    assert plan is not None
    L, M, J, bases, weights, pad_lo, pad_hi, Q = plan
    # pad rows (edge clamp) to a multiple of M covering all taps
    Hp = n_in + pad_lo + pad_hi
    if Hp % M:
        pad_hi += M - (Hp % M)
        Hp = n_in + pad_lo + pad_hi
    xp = jnp.pad(x, ((pad_lo, pad_hi), (0, 0)), mode="edge")

    shifted_bases = tuple(b + pad_lo for b in bases)
    kern = functools.partial(
        _axis0_kernel, L, M, J, shifted_bases, Q, weights
    )
    # grid over column strips: columns are independent, and strips keep the
    # per-step VMEM footprint (f32 widening + phase accumulators) small;
    # many-phase plans get narrower strips
    BW = 256 if L * J <= 24 else 128
    n_strips = -(-W_cols // BW)
    # pad the lane dim to a strip multiple: ragged lane blocks defeat
    # Mosaic's block streaming (whole-array VMEM residency -> OOM)
    Wp = n_strips * BW
    if Wp != W_cols:
        xp = jnp.pad(xp, ((0, 0), (0, Wp - W_cols)))
    phase_major = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_out, Wp), out_dtype),
        grid=(n_strips,),
        in_specs=[pl.BlockSpec((Hp, BW), lambda i: (0, i))],
        out_specs=pl.BlockSpec((n_out, BW), lambda i: (0, i)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(xp)
    if Wp != W_cols:
        phase_major = phase_major[:, :W_cols]
    # de-interleave phases: row (q*L + p) <- phase_major[p*Q + q]
    return (
        phase_major.reshape(L, Q, W_cols).swapaxes(0, 1).reshape(n_out, W_cols)
    )


def can_resize_pallas(in_h, in_w, out_h, out_w) -> bool:
    ok_h = in_h == out_h or _phase_plan(in_h, out_h) is not None
    ok_w = in_w == out_w or _phase_plan(in_w, out_w) is not None
    return ok_h and ok_w


def resize_plane_pallas(plane, out_h: int, out_w: int):
    """[H, W] u8 -> [out_h, out_w] u8; Mitchell bicubic, polyphase Pallas."""
    in_h, in_w = plane.shape
    x = plane
    if in_h != out_h:
        x = _resize_axis0(x, out_h, jnp.bfloat16)
    if in_w != out_w:
        # bf16 carries 0..255 integers exactly; final rounding in XLA
        x = _resize_axis0(x.T, out_w, jnp.bfloat16).T
    x = x.astype(jnp.float32)
    return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)
