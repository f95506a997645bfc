"""EqThree's 4-pole cascades as ONE Pallas TPU kernel.

After the envelope moved to a single-launch kernel, the eq became the
flagship graph's dominant cost (~99%: the four sequential
``_linrec_blocked`` stages each pay inter-op HBM round trips and small-op
latency inside the compiled program).  This kernel runs the whole thing —
both bands, all four cascade stages, the chunk-carry scans, and the final
band mix — in one launch with everything VMEM-resident:

  per stage & band:
    Z    = T_band @ B            (lower-triangular Toeplitz, MXU, full f32)
    yend = lane scan of Z[C-1]   (Hillis-Steele, log2 K shifted MACs)
    Y    = Z + a^(i+1) * yend_prev_lane
    B'   = f_band * Y            (next stage drive)
  mix:  out = g_lo·lo + g_mid·(hi_lp − lo) + g_hi·(xd − hi_lp)

Chunk layout: the block is reshaped to [C, K] (C-sample chunks across K
lanes); the Toeplitz tables are the SAME f32 tables the XLA path uses
(``eq_three._toeplitz_tables``), so the in-chunk math is identical and the
only divergence is the association order of the cross-chunk scan (1-ulp
class).  Validated against the flat associative-scan formulation and the
reference golden fixture in tests/test_eq_pallas.py.

Supports vmap (pallas_call batches over a leading grid dimension), so the
stems path (config 3) fuses too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mixlab_tpu.dsp.eq_three import _toeplitz_tables

# use the kernel for blocks at least this long (realtime-tick sizes keep
# the XLA scan path: kernel fixed costs don't amortize, and the realtime
# loop is dispatch-bound anyway)
PALLAS_THRESHOLD = 8192
# Chunk length = per-sample matmul work: the Toeplitz formulation costs
# O(S*C) MXU FLOPs, so C is the whole cost knob.  128 is the MXU tile edge —
# the smallest C that keeps the [C,C] operand a full tile; measured on the
# flagship block (S=384000) the C=256->128 halving cut the isolated eq cost
# ~2x with the lane scan still negligible (one extra Hillis-Steele pass).
_CHUNK = 128


def _plan(S: int):
    C = _CHUNK
    K = -(-S // C)
    return C, K, K * C - S


@functools.lru_cache(maxsize=16)
def _lane_tables(a_lo: float, a_hi: float, C: int, K: int):
    """Per-band lane-axis constants (f64-computed, f32-stored):
    powk[b, k] = aC_b^(k+1) (pole0 contribution to lane-end states) and the
    Hillis-Steele round factors aC_b^(2^r)."""
    out_pow = np.zeros((2, K), np.float64)
    row_pow = np.zeros((2, C), np.float64)
    factors = []
    for b, a in enumerate((a_lo, a_hi)):
        aC = float(a) ** C
        out_pow[b] = aC ** (np.arange(K) + 1)
        row_pow[b] = float(a) ** (np.arange(C) + 1)
        f, rounds = aC, []
        s = 1
        while s < K:
            rounds.append(f)
            f = f * f
            s *= 2
        factors.append(tuple(rounds))
    return out_pow.astype(np.float32), row_pow.astype(np.float32), tuple(factors)


def _make_kernel(S: int, C: int, K: int, a_lo: float, a_hi: float,
                 f_lo: float, f_hi: float, vsa: float):
    _, _, factors = _lane_tables(a_lo, a_hi, C, K)
    r0, k0 = (S - 1) % C, (S - 1) // C  # static position of sample S-1

    def kernel(scal_ref, x2_ref, xd2_ref, tlo_ref, thi_ref, pow_ref, row_ref,
               out_ref, poles_ref):
        # scal layout (VMEM [1,128] row; SMEM scalars break vmap batching on
        # TPU): [poles0(8) = stage-major (s*2+band), gains(3)]
        def scal(i):
            return scal_ref[0:1, i:i + 1]  # [1,1], broadcasts as a scalar

        # inputs arrive chunk-major [K, C] (= linear sample order, so the
        # host-side reshape is free); the [C, K] working orientation is
        # produced HERE, VMEM-resident — as XLA ops the same transposes
        # lowered to three full-block HBM relayout copies around the custom
        # call (seen as f32[3000,128]{0,1} copies in the flagship HLO),
        # costing more than the whole kernel
        x2 = x2_ref[...].T  # [C, K]
        Bs = [x2 * f_lo + vsa, x2 * f_hi + vsa]
        Ts = [tlo_ref[...], thi_ref[...]]
        Y = [None, None]
        for s in range(4):
            for b in range(2):
                pole0 = scal(s * 2 + b)
                Z = jax.lax.dot_general(
                    Ts[b], Bs[b], (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )  # [C, K]
                zlast = Z[C - 1 : C, :]  # [1, K]
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
                carry = zlast
                step = 1
                for fct in factors[b]:
                    # lane shift as rotate+mask (Mosaic rejects the
                    # offset-mismatched concat form)
                    rolled = pltpu.roll(carry, step, 1)
                    shifted = jnp.where(lane >= step, rolled, 0.0)
                    carry = carry + jnp.float32(fct) * shifted
                    step *= 2
                powv = pow_ref[b : b + 1, :]  # [1, K]
                y_end = carry + powv * pole0
                rolled1 = pltpu.roll(y_end, 1, 1)
                y_prev = jnp.where(lane >= 1, rolled1, pole0)  # [1, K]
                # in-chunk pole contribution: a^(i+1) per row (same f64
                # table the XLA path uses, so in-chunk math is identical)
                prow = row_ref[:, b : b + 1]  # [C, 1]
                Yb = Z + prow * y_prev
                # final pole for this stage+band = y at sample S-1
                ps = Yb[r0 : r0 + 1, k0 : k0 + 1]  # [1,1]
                poles_ref[s * 2 + b : s * 2 + b + 1, :] = jnp.broadcast_to(
                    ps, (1, poles_ref.shape[1]))
                Y[b] = Yb
                if s < 3:
                    Bs[b] = Yb * (f_lo if b == 0 else f_hi)
        lo, hi_lp = Y[0], Y[1]
        xd2 = xd2_ref[...].T  # [C, K]
        g_lo = scal(8)
        g_mid = scal(9)
        g_hi = scal(10)
        out_ck = (lo * g_lo + (hi_lp - lo) * g_mid
                  + (xd2 - hi_lp) * g_hi)
        out_ref[...] = out_ck.T  # back to chunk-major = linear order

    return kernel


# largest single-launch block: the kernel holds ~7 full-block [C,K] arrays
# in VMEM against the 16 MB scoped limit; larger blocks split into
# sequential launches carrying the pole state exactly
MAX_KERNEL_S = 384 * 1024


def eq_cascade_pallas(x, xd, poles0, gains, f_lo: float, f_hi: float,
                      vsa: float):
    """Full EqThree block on device in one launch.

    ``x`` [S] driving signal, ``xd`` [S] the 3-sample-delayed input,
    ``poles0`` [4, 2] initial pole states, ``gains`` [3] linear band gains.
    Returns (out [S], poles_out [4, 2]).
    """
    S = x.shape[0]
    if S > MAX_KERNEL_S:
        n_parts = -(-S // MAX_KERNEL_S)
        part = -(-S // n_parts)
        outs = []
        for i in range(n_parts):
            sl = slice(i * part, min((i + 1) * part, S))
            o, poles0 = eq_cascade_pallas(
                x[sl], xd[sl], poles0, gains, f_lo, f_hi, vsa
            )
            outs.append(o)
        return jnp.concatenate(outs), poles0
    C, K, pad = _plan(S)
    a_lo, a_hi = 1.0 - f_lo, 1.0 - f_hi

    xp = jnp.pad(x, (0, pad))
    xdp = jnp.pad(xd, (0, pad))
    x2 = xp.reshape(K, C)  # chunk-major = linear order; kernel transposes
    xd2 = xdp.reshape(K, C)
    T_lo, _, _ = _toeplitz_tables((a_lo, a_lo), C)
    T_hi, _, _ = _toeplitz_tables((a_hi, a_hi), C)
    scal = jnp.zeros((1, 128), jnp.float32)
    scal = scal.at[0, :8].set(poles0.reshape(-1).astype(jnp.float32))
    scal = scal.at[0, 8:11].set(gains.astype(jnp.float32))

    kernel = _make_kernel(S, C, K, a_lo, a_hi, float(f_lo), float(f_hi),
                          float(vsa))
    pow_np, row_np, _ = _lane_tables(a_lo, a_hi, C, K)
    out2, poles_rows = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, C), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ],
    )(scal, x2, xd2, jnp.asarray(T_lo[0]), jnp.asarray(T_hi[0]),
      jnp.asarray(pow_np), jnp.asarray(row_np.T.copy()))

    out = out2.reshape(-1)[:S]
    poles_out = poles_rows[:, 0].reshape(4, 2)
    return out, poles_out
