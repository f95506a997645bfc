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


def _eq_body(x_kc, xd_kc, scal, Ts, pow_v, row_v, S: int,
             f_lo: float, f_hi: float, vsa: float, factors):
    """Whole-block EqThree as in-kernel values.

    ``x_kc``/``xd_kc`` [K, C] chunk-major values (linear sample order);
    ``scal(i)`` returns broadcastable scalar i ([poles0(8) stage-major,
    gains(3)]); ``Ts`` = ([C,C] lo, [C,C] hi) Toeplitz values; ``pow_v``
    [2, K], ``row_v`` [C, 2] lane/row tables; ``factors`` the Hillis-Steele
    round factors per band.  Returns (out_kc [K, C] value, poles list of 8
    [1,1] values stage-major).  Shared by the standalone pallas_call below
    and the whole-graph kernel (engine/pallas_graph.py)."""
    K, C = x_kc.shape
    r0, k0 = (S - 1) % C, (S - 1) // C  # static position of sample S-1

    # the [C, K] working orientation is produced HERE, VMEM-resident — as
    # XLA ops the same transposes lowered to full-block HBM relayout copies
    # around the custom call, costing more than the whole kernel
    x2 = x_kc.T  # [C, K]
    Bs = [x2 * f_lo + vsa, x2 * f_hi + vsa]
    Y = [None, None]
    poles_out = [None] * 8
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
            powv = pow_v[b : b + 1, :]  # [1, K]
            y_end = carry + powv * pole0
            rolled1 = pltpu.roll(y_end, 1, 1)
            y_prev = jnp.where(lane >= 1, rolled1, pole0)  # [1, K]
            # in-chunk pole contribution: a^(i+1) per row (same f64
            # table the XLA path uses, so in-chunk math is identical)
            prow = row_v[:, b : b + 1]  # [C, 1]
            Yb = Z + prow * y_prev
            # final pole for this stage+band = y at sample S-1
            poles_out[s * 2 + b] = Yb[r0 : r0 + 1, k0 : k0 + 1]  # [1,1]
            Y[b] = Yb
            if s < 3:
                Bs[b] = Yb * (f_lo if b == 0 else f_hi)
    lo, hi_lp = Y[0], Y[1]
    xd2 = xd_kc.T  # [C, K]
    out_ck = (lo * scal(8) + (hi_lp - lo) * scal(9)
              + (xd2 - hi_lp) * scal(10))
    return out_ck.T, poles_out  # back to chunk-major = linear order


def _make_kernel(S: int, C: int, K: int, a_lo: float, a_hi: float,
                 f_lo: float, f_hi: float, vsa: float):
    _, _, factors = _lane_tables(a_lo, a_hi, C, K)

    def kernel(scal_ref, x2_ref, xd2_ref, tlo_ref, thi_ref, pow_ref, row_ref,
               out_ref, poles_ref):
        # scal layout (VMEM [1,128] row; SMEM scalars break vmap batching on
        # TPU): [poles0(8) = stage-major (s*2+band), gains(3)]
        def scal(i):
            return scal_ref[0:1, i:i + 1]  # [1,1], broadcasts as a scalar

        out_kc, poles = _eq_body(
            x2_ref[...], xd2_ref[...], scal, (tlo_ref[...], thi_ref[...]),
            pow_ref[...], row_ref[...], S, f_lo, f_hi, vsa, factors)
        out_ref[...] = out_kc
        for i, ps in enumerate(poles):
            poles_ref[i : i + 1, :] = jnp.broadcast_to(
                ps, (1, poles_ref.shape[1]))

    return kernel


def _delay3_kc(x_kc, hist):
    """In-kernel 3-sample delay of a chunk-major [K, C] value: result[s] =
    x[s-3] in linear order s = k*C + c, with the first three samples taken
    from ``hist`` (scalars, oldest first) — the eq's delay line
    (eq_three.rs:71-79) evaluated without leaving VMEM."""
    K, C = x_kc.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (K, C), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (K, C), 0)
    rl = pltpu.roll(x_kc, 3, 1)          # [k, (c-3) mod C]
    rr = pltpu.roll(rl, 1, 0)            # previous row for wrapped lanes
    xd = jnp.where(col >= 3, rl, rr)
    lin = row * C + col
    fill = jnp.where(col == 0, hist[0], jnp.where(col == 1, hist[1], hist[2]))
    return jnp.where(lin >= 3, xd, fill)


def make_mega_emit(sample_rate: int):
    """EqThree's whole-module body for the whole-graph kernel
    (engine/pallas_graph.py): reuses ``_eq_body`` on the kernel's native
    [K, 128] layout.  State scalars / exits layout: 8 poles (stage-major)
    then 3 delay-history samples (oldest first)."""
    from mixlab_tpu.dsp.eq_three import FREQ_HI, FREQ_LO, VSA, _filter_coeff

    f_lo = _filter_coeff(FREQ_LO, sample_rate)
    f_hi = _filter_coeff(FREQ_HI, sample_rate)
    a_lo, a_hi = 1.0 - f_lo, 1.0 - f_hi

    def tables(Sp):
        C = _CHUNK
        K = Sp // C
        T_lo, _, _ = _toeplitz_tables((a_lo, a_lo), C)
        T_hi, _, _ = _toeplitz_tables((a_hi, a_hi), C)
        pow_np, row_np, _ = _lane_tables(a_lo, a_hi, C, K)
        return [T_lo[0], T_hi[0], pow_np, row_np.T.copy()]

    def emit(ctx, ins):
        x = ctx.expect_mono(ins[0])
        K, C = x.shape
        poles = ctx.sf[:8]
        hist = ctx.sf[8:11]
        gains = ctx.pf  # 3 linear band gains

        def scal(i):
            return poles[i] if i < 8 else gains[i - 8]

        xd = _delay3_kc(x, hist)
        _, _, factors = _lane_tables(a_lo, a_hi, C, K)
        out, poles_out = _eq_body(
            x, xd, scal, (ctx.tables[0], ctx.tables[1]),
            ctx.tables[2], ctx.tables[3], ctx.S, f_lo, f_hi, VSA, factors)
        f_exits = [p[0, 0] for p in poles_out]
        f_exits += [x[K - 1, C - 3], x[K - 1, C - 2], x[K - 1, C - 1]]
        return [out], {}, (f_exits, [])

    return emit, tables


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
