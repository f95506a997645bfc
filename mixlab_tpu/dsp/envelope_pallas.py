"""ADSR envelope as ONE Pallas TPU kernel.

The flat associative-scan formulation (dsp/envelope.py) costs ~19 log-depth
HBM passes and was the flagship graph's costliest audio kernel; the chunked
two-pass reformulation (dsp/envelope_chunked.py) has the right math but as
XLA ops it pays per-step kernel launches.  This kernel fuses the whole
thing into a single launch with the block resident in VMEM:

  phase A  - C sequential steps of K-lane-wide VPU work computing each
             lane's symbolic dual-entry transfer record (entry mode unknown:
             both machines run; `on`/`off`/`off_amp` may reference entry
             state symbolically) — the math of envelope_chunked.py;
  combine  - Hillis-Steele inclusive scan over the K lanes (log2 K
             vectorized composition passes, VMEM-resident);
  phase B  - C sequential steps emitting concrete outputs per lane.

Lane layout (round-3 profile fix): the K lanes are carried as an [8, L]
tile (L = K/8, lane k = s*L + l) so every per-step vector op fills whole
(8, 128) vregs.  The first version kept lanes as a flat [1, K] row, which
Mosaic lays out on sublane 0 only — 1/8 VPU utilization on every one of the
~2*C sequential steps; measured on the flagship block size this kernel was
~30 us per content-second, dominating the whole 16-module graph
(tools/profile_flagship_residual2.py: elementwise subgraph 5.5 us/s, full
graph ~40 us/s).  The Hillis-Steele lane shifts become two concatenates
(row-carry for shifts < L, whole-row shifts for multiples of L), which
requires K to be a power of two.

HBM traffic: one read of x, one write of out (the XLA path reads/writes
~19x).  Semantics identical to dsp/envelope.py / src/module/envelope.rs,
validated against the scalar oracle and the flat scans in
tests/test_envelope_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_POS_FLOOR = -(2**30)

# amp record kinds (envelope_chunked.py)
_K_CONC = 0   # off_amp is a concrete value
_K_ENTRY = 1  # off_amp = entry.off_amp
_K_ON = 2     # off_amp = ampOn(amp_pos - entry.on)

_REC = ("mode", "on_sym", "on_pos", "off_sym", "off_pos", "ampk", "ampv", "ampp")


def pick_lanes_pow2(S: int) -> int:
    """Power-of-two lane count for the [8, L] tile layout.  ~190 sequential
    steps stays the sweet spot (envelope_chunked.pick_lanes); snapping to the
    nearest power of two in [1024, 4096] keeps the Hillis-Steele shifts as
    two concatenates and the tile rows full."""
    target = max(1, S // 192)
    k = 1 << int(round(np.log2(target))) if target > 1 else 1
    return max(1024, min(4096, k))


def _amp_on(ms, attack, decay, sustain):
    attack_amp = ms / attack
    decay_amp = 1.0 - jnp.clip((ms - attack) / decay, 0.0, 1.0)
    sustain_amp = sustain + (1.0 - sustain) * decay_amp
    return jnp.where(ms < attack, attack_amp, sustain_amp)


def _env_body(scal_f, scal_i, x_kc, xs_ref, os_ref):
    """Whole-block envelope evaluation as in-kernel values.

    ``scal_f`` = (attack, decay, sustain, release, msps, ent_amp) f32 values,
    ``scal_i`` = (ent_mode, ent_on, ent_off) i32 values, ``x_kc`` [K, C]
    chunk-major gate value, ``xs_ref``/``os_ref`` [C, 8, K//8] VMEM scratch.
    Returns (out_kc [K, C] value, (mode, on, off) i32 exit values, off_amp
    f32 exit value).  Shared by the standalone pallas_call below and the
    whole-graph kernel (engine/pallas_graph.py)."""
    K, C = x_kc.shape
    R, L = xs_ref.shape[1], xs_ref.shape[2]  # R = 8 sublane rows, K = R*L
    attack, decay, sustain, release, msps, ent_amp = scal_f
    ent_mode, ent_on, ent_off = scal_i

    amp_on = functools.partial(_amp_on, attack=attack, decay=decay, sustain=sustain)

    def amp_on_at(pos, on):
        return amp_on((pos - on).astype(jnp.float32) * msps)

    # lane index k = s*L + l over the [R, L] tile
    row_i = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    lane_base = (row_i * L + col_i) * C

    # stage the input as [C, R, L] so each sequential step reads one full
    # [R, L] vreg tile (one in-VMEM transpose instead of per-step gathers)
    xs_ref[...] = x_kc.T.reshape(C, R, L)

    # ---- phase A: dual-machine symbolic records ---------------------------
    # flags are int32 0/1 (Mosaic lowers 1-bit vectors poorly)
    def initA():
        rec = []
        for m in (0, 1):
            rec += [
                jnp.full((R, L), m, dtype=jnp.int32),        # mode
                jnp.ones((R, L), dtype=jnp.int32),           # on_sym
                jnp.zeros((R, L), dtype=jnp.int32),          # on_pos
                jnp.ones((R, L), dtype=jnp.int32),           # off_sym
                jnp.zeros((R, L), dtype=jnp.int32),          # off_pos
                jnp.full((R, L), _K_ENTRY, dtype=jnp.int32), # ampk
                jnp.zeros((R, L), dtype=jnp.float32),        # ampv
                jnp.zeros((R, L), dtype=jnp.int32),          # ampp
            ]
        return tuple(rec)

    def stepA(c, rec):
        xc = xs_ref[pl.ds(c, 1), :, :][0]  # [R, L]
        t = lane_base + c
        out = []
        for m in range(2):
            mode, on_sym, on_pos, off_sym, off_pos, ampk, ampv, ampp = rec[m * 8 : m * 8 + 8]
            rising = (mode == 0) & (xc == 1.0)
            falling = (mode == 1) & (xc == 0.0)
            conc_amp = amp_on_at(t, on_pos)
            fall_conc = falling & (on_sym == 0)
            fall_sym = falling & (on_sym == 1)
            out += [
                jnp.where(rising, 1, jnp.where(falling, 0, mode)),
                jnp.where(rising, 0, on_sym),
                jnp.where(rising, t, on_pos),
                jnp.where(falling, 0, off_sym),
                jnp.where(falling, t, off_pos),
                jnp.where(fall_conc, _K_CONC, jnp.where(fall_sym, _K_ON, ampk)),
                jnp.where(fall_conc, conc_amp, ampv),
                jnp.where(fall_sym, t, ampp),
            ]
        return tuple(out)

    rec = jax.lax.fori_loop(0, C, stepA, initA())

    # ---- combine: Hillis-Steele over lanes --------------------------------
    # prefix[k] = rec[k] ∘ ... ∘ rec[0]  (function composition, lane order)
    def select(machine_pair, mode_sel):
        """machine_pair: list of 16 arrays (2 machines x 8 fields);
        mode_sel [R,L] int — returns the 8 fields of the selected machine."""
        take_b = mode_sel == 1
        out = []
        for f in range(8):
            a = machine_pair[f]          # machine 0 (entry OFF)
            b = machine_pair[8 + f]      # machine 1 (entry ON)
            out.append(jnp.where(take_b, b, a))
        return out

    def substitute(g, f_exit):
        """g's entry symbols resolved against f_exit (8-field records)."""
        g_mode, g_on_sym, g_on_pos, g_off_sym, g_off_pos, g_ampk, g_ampv, g_ampp = g
        f_mode, f_on_sym, f_on_pos, f_off_sym, f_off_pos, f_ampk, f_ampv, f_ampp = f_exit
        o_mode = g_mode
        g_on_s = g_on_sym == 1
        g_off_s = g_off_sym == 1
        o_on_sym = jnp.where(g_on_s, f_on_sym, 0)
        o_on_pos = jnp.where(g_on_s, f_on_pos, g_on_pos)
        o_off_sym = jnp.where(g_off_s, f_off_sym, 0)
        o_off_pos = jnp.where(g_off_s, f_off_pos, g_off_pos)
        g_k0 = g_ampk == _K_CONC
        g_k1 = g_ampk == _K_ENTRY
        k2_conc = (g_ampk == _K_ON) & (f_on_sym == 0)
        k2_val = amp_on_at(g_ampp, f_on_pos)
        o_ampk = jnp.where(
            g_k0, _K_CONC,
            jnp.where(g_k1, f_ampk, jnp.where(k2_conc, _K_CONC, _K_ON)),
        )
        o_ampv = jnp.where(
            g_k0, g_ampv, jnp.where(g_k1, f_ampv, jnp.where(k2_conc, k2_val, 0.0))
        )
        o_ampp = jnp.where(g_k1, f_ampp, g_ampp)
        return [o_mode, o_on_sym, o_on_pos, o_off_sym, o_off_pos, o_ampk, o_ampv, o_ampp]

    def compose(f_pair, g_pair):
        """(g ∘ f) per entry machine; 16-array lists."""
        out = []
        for m in range(2):
            f_exit = f_pair[m * 8 : m * 8 + 8]
            g_sel = select(g_pair, f_exit[0])
            out += substitute(g_sel, f_exit)
        return out

    lane_k = row_i * L + col_i

    def shift_k(fields, ident, n):
        """shifted[k] = fields[k - n] in lane order k = s*L + l (identity for
        k < n), for ARBITRARY n and L.  Built from pltpu.roll + masks —
        Mosaic rejects the offset-mismatched concatenate form (same note in
        eq_pallas).  Decompose n = n_div*L + n_rem: lanes l >= n_rem come
        from row s - n_div, lanes l < n_rem from row s - n_div - 1 (both
        after a lane roll by n_rem); wrapped garbage is masked to identity
        by the k >= n test."""
        n_div, n_rem = divmod(n, L)
        if n_rem == 0:
            def sh(f, idf):
                rr = pltpu.roll(f, n_div, 0)
                return jnp.where(lane_k >= n, rr, idf)
        else:
            def sh(f, idf):
                rl = pltpu.roll(f, n_rem, 1)       # [s, (l-n_rem) mod L]
                b1 = pltpu.roll(rl, n_div, 0) if n_div else rl
                b2 = pltpu.roll(rl, n_div + 1, 0)
                sv = jnp.where(col_i >= n_rem, b1, b2)
                return jnp.where(lane_k >= n, sv, idf)
        return [sh(f, i) for f, i in zip(fields, ident)]

    prefix = list(rec)
    ident = list(initA())
    s = 1
    while s < K:
        shifted = shift_k(prefix, ident, s)
        prefix = compose(shifted, prefix)
        s *= 2

    # ---- entries per lane: apply prefix[k-1] to E0 -------------------------
    def apply_entry(pair, e_mode, e_on, e_off, e_amp):
        selr = select(pair, e_mode)
        mode, on_sym, on_pos, off_sym, off_pos, ampk, ampv, ampp = selr
        on = jnp.where(on_sym == 1, e_on, on_pos)
        off = jnp.where(off_sym == 1, e_off, off_pos)
        amp = jnp.where(
            ampk == _K_CONC, ampv,
            jnp.where(ampk == _K_ENTRY, e_amp, amp_on_at(ampp, e_on)),
        )
        return mode, on, off, amp

    e_mode0 = jnp.full((R, L), ent_mode, dtype=jnp.int32)
    e_on0 = jnp.full((R, L), ent_on, dtype=jnp.int32)
    e_off0 = jnp.full((R, L), ent_off, dtype=jnp.int32)
    e_amp0 = jnp.full((R, L), ent_amp, dtype=jnp.float32)
    ap_mode, ap_on, ap_off, ap_amp = apply_entry(prefix, e_mode0, e_on0, e_off0, e_amp0)

    # entry of lane k = exit of lane k-1 (lane 0 = E0): shift right by one
    def shift1(applied, e0):
        rl = pltpu.roll(applied, 1, 1)
        rr = pltpu.roll(rl, 1, 0)
        return jnp.where(col_i >= 1, rl, jnp.where(row_i >= 1, rr, e0))

    st_mode = shift1(ap_mode, e_mode0)
    st_on = shift1(ap_on, e_on0)
    st_off = shift1(ap_off, e_off0)
    st_amp = shift1(ap_amp, e_amp0)

    # exit state of the whole block = exit of last lane (R-1, L-1)
    exit_i = (ap_mode[R - 1, L - 1], ap_on[R - 1, L - 1],
              ap_off[R - 1, L - 1])
    exit_f = ap_amp[R - 1, L - 1]

    # ---- phase B: concrete outputs ----------------------------------------
    def stepB(c, st):
        mode, on, off, amp = st
        xc = xs_ref[pl.ds(c, 1), :, :][0]
        t = lane_base + c
        rising = (mode == 0) & (xc == 1.0)
        falling = (mode == 1) & (xc == 0.0)
        amp_now = amp_on_at(t, on)
        n_mode = jnp.where(rising, 1, jnp.where(falling, 0, mode))
        n_on = jnp.where(rising, t, on)
        n_off = jnp.where(falling, t, off)
        n_amp = jnp.where(falling, amp_now, amp)
        ms_off = (t - n_off).astype(jnp.float32) * msps
        rel = 1.0 - jnp.clip(ms_off / release, 0.0, 1.0)
        on_amp = amp_on_at(t, n_on)
        out = jnp.where(n_mode == 1, on_amp, n_amp * rel).astype(jnp.float32)
        os_ref[pl.ds(c, 1), :, :] = out[None]
        return (n_mode, n_on, n_off, n_amp)

    jax.lax.fori_loop(0, C, stepB, (st_mode, st_on, st_off, st_amp))

    # back to chunk-major linear order, still in VMEM
    out_kc = os_ref[...].reshape(C, K).T
    return out_kc, exit_i, exit_f


def _kernel(pf_ref, pi_ref, x_ref, out_ref, exit_i_ref, exit_f_ref,
            xs_ref, os_ref):
    # x_ref/out_ref are chunk-major [K, C] (= linear sample order: the host
    # reshape is free).  The [C, R, L] working orientation is built inside
    # _env_body in VMEM scratch — as XLA ops the same transposes lowered to
    # full-block HBM relayout copies around the custom call (same finding as
    # eq_pallas)
    scal_f = tuple(pf_ref[i] for i in range(6))
    scal_i = tuple(pi_ref[i] for i in range(3))
    out_kc, exit_i, exit_f = _env_body(scal_f, scal_i, x_ref[...], xs_ref, os_ref)
    out_ref[...] = out_kc
    exit_i_ref[0, 0] = exit_i[0]
    exit_i_ref[0, 1] = exit_i[1]
    exit_i_ref[0, 2] = exit_i[2]
    exit_f_ref[0, 0] = exit_f


# largest single-launch block: the kernel keeps ~4 full-block arrays (in,
# out, two step-tiled scratches) in VMEM against the 16 MB scoped limit;
# larger blocks split into sequential launches with exact state carry
MAX_KERNEL_S = 512 * 1024


def envelope_block_pallas(x, state, params, ms_per_sample, K=None, interpret=None):
    """Evaluate the envelope over ``x`` [S]; same contract as
    envelope_chunked.run_block_chunked.  Runs the Pallas kernel (interpret
    mode off-TPU so CPU tests execute the same code path)."""
    S = x.shape[0]
    if S > MAX_KERNEL_S:
        n_parts = -(-S // MAX_KERNEL_S)
        part = -(-S // n_parts)
        outs = []
        for i in range(n_parts):
            piece = x[i * part : min((i + 1) * part, S)]
            o, state = envelope_block_pallas(
                piece, state, params, ms_per_sample, K=K, interpret=interpret
            )
            outs.append(o)
        import jax.numpy as _jnp

        return _jnp.concatenate(outs), state
    if K is None:
        K = pick_lanes_pow2(S)
    assert K % 8 == 0, K  # shifts handle arbitrary K; 8 sublane rows fixed
    L = K // 8
    C = -(-S // K)
    pad = C * K - S
    xp = jnp.concatenate([x, jnp.full((pad,), 0.5, x.dtype)]) if pad else x
    x_kc = xp.reshape(K, C)  # chunk-major = linear order (free reshape)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    pf = jnp.stack([
        jnp.asarray(params["attack_ms"], jnp.float32),
        jnp.asarray(params["decay_ms"], jnp.float32),
        jnp.asarray(params["sustain_amplitude"], jnp.float32),
        jnp.asarray(params["release_ms"], jnp.float32),
        jnp.float32(ms_per_sample),
        jnp.asarray(state["off_amp"], jnp.float32),
    ])
    pi = jnp.stack([
        jnp.asarray(state["mode_on"]).astype(jnp.int32),
        jnp.asarray(state["on_pos"], jnp.int32),
        jnp.asarray(state["off_pos"], jnp.int32),
    ])

    out_kc, exit_i, exit_f = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((K, C), jnp.float32),
            jax.ShapeDtypeStruct((1, 4), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # exit state scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((C, 8, L), jnp.float32),  # step-tiled input
            pltpu.VMEM((C, 8, L), jnp.float32),  # step-tiled output
        ],
        interpret=interpret,
    )(pf, pi, x_kc)

    out = out_kc.reshape(-1)[:S]
    new_state = {
        "mode_on": exit_i[0, 0] != 0,
        "on_pos": jnp.maximum(exit_i[0, 1] - S, _POS_FLOOR).astype(jnp.int32),
        "off_pos": jnp.maximum(exit_i[0, 2] - S, _POS_FLOOR).astype(jnp.int32),
        "off_amp": exit_f[0, 0],
    }
    return out, new_state
