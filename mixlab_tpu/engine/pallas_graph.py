"""Whole-graph Pallas lowering: ONE custom call for the kernel region.

Round-3 profiling (BENCH_NOTES "where the last ~12 us/s lives") showed that
a custom call in the MIDDLE of the compiled patch program splits XLA's
single streaming fusion: the elementwise chain around it is duplicated on
both sides of the split (+85% flops on the flagship, measured with a
passthrough dummy kernel), and each extra call pays launch/DMA overhead.
The fix is structural: lower the EqThree kernel AND everything around it —
amplifiers, mixer, panner/splitter plumbing, sink taps — into one Pallas
kernel, so XLA keeps exactly one producer-prefix fusion (oscillator sins,
fm carrier, the envelope kernel's output) whose outputs enter the kernel as
operands.

Region selection (static, per compile):

  1. seeds   = every EqThree (the only mid-graph kernel module; graphs
               without one are already a single XLA fusion + top-of-graph
               envelope call, which mega lowering cannot improve).
  2. region  = downstream closure of the seeds over audio wires.  If any
               member lacks a :class:`~mixlab_tpu.dsp.base.MegaSpec`, bail
               (regular path).
  3. expand  = repeatedly absorb any spec-capable module ALL of whose
               consumers are already in the region (amplifiers, triggers,
               external feeds...).  Oscillator / FmSine / Envelope expose
               no spec on purpose: their sin/phase math and the envelope's
               sequential kernel stay in the XLA prelude, whose outputs are
               exactly the crossing operands.

By construction no region output is consumed outside the region, so the
kernel's only exports are sink taps and scalar state.  Cycle semantics are
preserved: a wire whose producer runs after its consumer reads zeros, both
in-kernel (no buffer yet) and across the boundary (crossing omitted).

Layout contract inside the kernel: every audio buffer is a chunk-major
``[K, 128]`` f32 value in linear sample order (K = S_launch / 128) — the
same free-reshape convention the standalone eq kernel uses, so its body
(``dsp.eq_pallas._eq_body``) drops in unchanged.  Stereo is the usual
channel-major (L, R) pair.

VMEM is bounded by splitting oversized blocks into sequential launches.
Scalar state (eq poles + delay history) crosses between launches through
SMEM exit rows that feed the next launch's state-scalar inputs directly —
MegaSpec's layout law (exits == state_scalars) makes the rethreading a
plain row copy.  Scalars crossing between launches do not split fusions.

Fallback is total: :func:`build_mega_program` returns None whenever the
graph or block doesn't qualify and the regular compiled-patch program runs
instead.  Equivalence is asserted by tests/test_pallas_graph.py.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mixlab_tpu.dsp.base import EmitCtx, MegaSpec
from mixlab_tpu.dsp.registry import get_def
from mixlab_tpu.engine.config import BlockSpec, EngineConfig
from mixlab_tpu.protocol import InputId, LineType, OutputId

C_GLOBAL = 128  # in-kernel chunk length (= eq's MXU tile edge)
ALIGN_S = 128   # launch sizes must be whole chunks
# engage only where the standalone eq kernel would: tiny (realtime) blocks
# are dispatch-bound and keep the proven per-block path
MIN_S = 8192

# per-launch sample cap.  On-chip sweep on the flagship (tools/ab_mega.py,
# matched A/B pairs against the regular path): 64Ki (6 launches) ~parity,
# 128Ki (3) +25-45%, 192Ki (2) and 384Ki (1) both peak ~165kx vs the
# regular path's 33-48kx — Mosaic's buffer reuse keeps even the
# single-launch flagship inside scoped VMEM, but 192Ki leaves headroom for
# denser graphs while measuring the same peak.  Tunable for sweeps.
MAX_LAUNCH_S = int(os.environ.get("MIXLAB_MEGA_MAX_S", 192 * 1024))

KERNEL_SEEDS = ("EqThree",)


def _mid_key(mid) -> str:
    return str(mid.value)


def _audio_consumers(entries, connections):
    """producer module id -> [consumer module ids], audio wires only."""
    consumers: Dict[Any, List[Any]] = {}
    for iid, oid in connections.items():
        term = entries[iid.module_id].inputs[iid.index]
        if term.line_type == LineType.VIDEO:
            continue
        consumers.setdefault(oid.module_id, []).append(iid.module_id)
    return consumers


def _select_region(order, entries, connections, cfg, block):
    """Returns (region set, specs dict) or None if the graph doesn't
    qualify."""
    seeds = [m for m in order if entries[m].params.kind in KERNEL_SEEDS]
    if not seeds:
        return None
    consumers = _audio_consumers(entries, connections)

    region = set()
    stack = list(seeds)
    while stack:
        m = stack.pop()
        if m in region:
            continue
        region.add(m)
        stack.extend(consumers.get(m, ()))

    def make_spec(mid):
        e = entries[mid]
        d = get_def(e.params.kind)
        connected = tuple(
            InputId(mid, i) in connections for i in range(len(e.inputs))
        )
        return d.mega_spec(e.params.params, cfg, block, connected)

    specs: Dict[Any, MegaSpec] = {}
    for mid in region:
        spec = make_spec(mid)
        if spec is None:
            return None  # closure hit a module that can't run in-kernel
        specs[mid] = spec

    # absorb producers whose every consumer is already in the region
    changed = True
    while changed:
        changed = False
        for mid in order:
            if mid in region:
                continue
            cons = consumers.get(mid, ())
            if not cons or not all(c in region for c in cons):
                continue
            spec = make_spec(mid)
            if spec is None:
                continue
            region.add(mid)
            specs[mid] = spec
            changed = True

    return region, specs


def _partition(S: int) -> Optional[List[Tuple[int, int]]]:
    """Contiguous ALIGN_S-aligned launch ranges, each <= MAX_LAUNCH_S."""
    if S % ALIGN_S != 0 or S < MIN_S:
        return None
    n = max(1, -(-S // MAX_LAUNCH_S))
    base = S // n
    bounds = [0]
    for i in range(1, n):
        bounds.append((base * i) // ALIGN_S * ALIGN_S)
    bounds.append(S)
    parts = [(bounds[i], bounds[i + 1]) for i in range(n)]
    if any(b - a <= 0 or (b - a) % ALIGN_S for a, b in parts):
        return None
    if any(b - a > MAX_LAUNCH_S + ALIGN_S for a, b in parts):
        return None
    return parts


def build_mega_program(ws, cfg: EngineConfig, block: BlockSpec):
    """Returns ``program(aux, host_aux, state) -> (new_state, taps)`` with
    the kernel region lowered to Pallas launches, or None if the graph /
    block doesn't qualify.  Drop-in replacement for the regular program
    built by ``engine.compiler.compile_patch``."""
    if os.environ.get("MIXLAB_MEGA", "1") == "0":
        return None

    S = block.n_samples(cfg)
    parts = _partition(S)
    if parts is None:
        return None

    order = ws.run_order()
    entries = {mid: ws.modules[mid] for mid in order}
    connections = dict(ws.connections)
    sel = _select_region(order, entries, connections, cfg, block)
    if sel is None:
        return None
    region, specs = sel

    region_order = [m for m in order if m in region]
    prelude_order = [m for m in order if m not in region]
    order_ix = {m: i for i, m in enumerate(order)}

    # ---- static structure ---------------------------------------------------
    # tap slots: (mid, name, chan|None) in region order x declaration order
    tap_slots: List[Tuple[Any, str, Optional[int]]] = []
    stap_slots: List[Tuple[Any, str]] = []
    mod_exit_f: Dict[Any, Tuple[int, int]] = {}
    mod_exit_i: Dict[Any, Tuple[int, int]] = {}
    n_ef = n_ei = 0
    for mid in region_order:
        d = specs[mid].declare
        for name, chans in d["taps"]:
            if chans == 0:
                stap_slots.append((mid, name))
            elif chans == 1:
                tap_slots.append((mid, name, None))
            else:
                for c in range(chans):
                    tap_slots.append((mid, name, c))
        mod_exit_f[mid] = (n_ef, d["exit_f"])
        n_ef += d["exit_f"]
        mod_exit_i[mid] = (n_ei, d["exit_i"])
        n_ei += d["exit_i"]

    def program(aux, host_aux, state):
        taps_all: Dict[str, Any] = {}
        new_state: Dict[str, Any] = {}
        buffers: Dict[OutputId, Any] = {}

        # ---- prelude: normal XLA run_block for non-region modules ----------
        for mid in prelude_order:
            entry = entries[mid]
            k = _mid_key(mid)
            d = get_def(entry.params.kind)
            ins: List[Optional[Any]] = []
            for i, term in enumerate(entry.inputs):
                if term.line_type == LineType.VIDEO:
                    ins.append(None)
                    continue
                out_id = connections.get(InputId(mid, i))
                ins.append(buffers.get(out_id) if out_id is not None else None)
            st, outs, tp = d.run_block(
                entry.params.params, aux[k], host_aux[k], state[k], ins,
                cfg, block)
            new_state[k] = st
            if tp:
                taps_all[k] = tp
            for i, buf in enumerate(outs):
                if buf is not None:
                    buffers[OutputId(mid, i)] = buf

        # ---- gather kernel inputs ------------------------------------------
        # whole-block operands, dedup by traced identity
        leaf_index: Dict[int, int] = {}
        operand_vals: List[Any] = []

        def op_ix(v):
            key = id(v)
            if key not in leaf_index:
                leaf_index[key] = len(operand_vals)
                operand_vals.append(v)
            return leaf_index[key]

        # crossing wires (prelude -> region); producer must run before the
        # consumer or the wire reads zeros (cycle back-edge semantics)
        crossing: Dict[Tuple[Any, int], Any] = {}
        for mid in region_order:
            entry = entries[mid]
            for i, term in enumerate(entry.inputs):
                if term.line_type == LineType.VIDEO:
                    continue
                out_id = connections.get(InputId(mid, i))
                if out_id is None or out_id.module_id in region:
                    continue
                if order_ix[out_id.module_id] > order_ix[mid]:
                    continue  # back-edge: reads zeros
                v = buffers.get(out_id)
                if v is None:
                    continue
                if isinstance(v, tuple):
                    crossing[(mid, i)] = ("stereo", op_ix(v[0]), op_ix(v[1]))
                else:
                    crossing[(mid, i)] = ("mono", op_ix(v))

        # per-module named operands / scalars
        mod_ops: Dict[Any, Dict[str, int]] = {}
        pf_items: List[Any] = []
        pi_items: List[Any] = []
        sf_items: List[Any] = []
        si_items: List[Any] = []
        mod_pf: Dict[Any, Tuple[int, int]] = {}
        mod_pi: Dict[Any, Tuple[int, int]] = {}
        mod_sf: Dict[Any, Tuple[int, int]] = {}
        mod_si: Dict[Any, Tuple[int, int]] = {}

        def _flat(items, dtype):
            out = []
            for it in items:
                a = jnp.asarray(it, dtype)
                out.extend(a.reshape(-1) if a.ndim else [a])
            return out

        for mid in region_order:
            k = _mid_key(mid)
            spec = specs[mid]
            for name, v in spec.operands(aux[k], host_aux[k]).items():
                mod_ops.setdefault(mid, {})[name] = op_ix(v)
            mod_ops.setdefault(mid, {})
            f, i_ = spec.param_scalars(aux[k], host_aux[k])
            f, i_ = _flat(f, jnp.float32), _flat(i_, jnp.int32)
            mod_pf[mid] = (len(pf_items), len(f))
            pf_items.extend(f)
            mod_pi[mid] = (len(pi_items), len(i_))
            pi_items.extend(i_)
            f, i_ = spec.state_scalars(state[k])
            f, i_ = _flat(f, jnp.float32), _flat(i_, jnp.int32)
            mod_sf[mid] = (len(sf_items), len(f))
            sf_items.extend(f)
            mod_si[mid] = (len(si_items), len(i_))
            si_items.extend(i_)
            # layout law: exits feed the next launch's state scalars
            assert len(f) == mod_exit_f[mid][1], (mid, len(f))
            assert len(i_) == mod_exit_i[mid][1], (mid, len(i_))

        def _stack(items, dtype):
            if not items:
                return jnp.zeros((1,), dtype)
            return jnp.stack(items)

        pf = _stack(pf_items, jnp.float32)
        pi = _stack(pi_items, jnp.int32)
        cur_sf = _stack(sf_items, jnp.float32)
        cur_si = _stack(si_items, jnp.int32)

        # ---- run the launches over the sample partition ---------------------
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        Kg = S // C_GLOBAL
        ops_kc = [v.reshape(Kg, C_GLOBAL) for v in operand_vals]

        part_taps: List[List[Any]] = []
        stap_acc = None
        ef_row = ei_row = None

        for a, b in parts:
            Sp = b - a
            Kp = Sp // C_GLOBAL
            r0 = a // C_GLOBAL
            ops_p = [v[r0 : r0 + Kp] for v in ops_kc]

            tables_p: List[Any] = []
            mod_tab: Dict[Any, Tuple[int, int]] = {}
            scratch_p: List[Tuple[tuple, Any]] = []
            mod_scr: Dict[Any, Tuple[int, int]] = {}
            for mid in region_order:
                t = [jnp.asarray(x) for x in specs[mid].tables(Sp)]
                mod_tab[mid] = (len(tables_p), len(t))
                tables_p.extend(t)
                sc = specs[mid].scratch(Sp)
                mod_scr[mid] = (len(scratch_p), len(sc))
                scratch_p.extend(sc)

            kernel = _make_kernel(
                region_order, entries, connections, specs, crossing, mod_ops,
                mod_pf, mod_pi, mod_sf, mod_si, mod_tab, mod_scr,
                mod_exit_f, mod_exit_i, tap_slots, stap_slots,
                cfg, block, Sp, a,
                n_ops=len(ops_p), n_tab=len(tables_p), order_ix=order_ix)

            out_shapes = (
                [jax.ShapeDtypeStruct((Kp, C_GLOBAL), jnp.float32)
                 for _ in tap_slots]
                + [jax.ShapeDtypeStruct((1, max(1, len(stap_slots))),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((1, max(1, n_ef)), jnp.float32),
                   jax.ShapeDtypeStruct((1, max(1, n_ei)), jnp.int32)]
            )
            in_specs = (
                [pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
                + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                * (len(ops_p) + len(tables_p))
            )
            out_specs = (
                [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(tap_slots)
                + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
            )

            outs = pl.pallas_call(
                kernel,
                out_shape=tuple(out_shapes),
                in_specs=in_specs,
                out_specs=tuple(out_specs),
                scratch_shapes=[pltpu.VMEM(shape, dtype)
                                for shape, dtype in scratch_p],
                interpret=jax.default_backend() != "tpu",
            )(pf, pi, cur_sf, cur_si, *ops_p, *tables_p)

            part_taps.append(list(outs[: len(tap_slots)]))
            stap_row = outs[len(tap_slots)]
            ef_row = outs[len(tap_slots) + 1]
            ei_row = outs[len(tap_slots) + 2]
            stap_acc = (stap_row if stap_acc is None
                        else jnp.maximum(stap_acc, stap_row))
            # exits ARE the next launch's state scalars (layout law)
            if n_ef:
                cur_sf = ef_row[0]
            if n_ei:
                cur_si = ei_row[0]

        # ---- reassemble taps and state --------------------------------------
        T, spt = block.n_ticks, cfg.samples_per_tick
        mod_taps: Dict[Any, Dict[str, Any]] = {m: {} for m in region_order}
        for slot, (mid, name, chan) in enumerate(tap_slots):
            arr = jnp.concatenate([pt[slot] for pt in part_taps], axis=0)
            arr = arr.reshape(T, spt)
            if chan is None:
                mod_taps[mid][name] = arr
            else:
                pair = mod_taps[mid].setdefault(name, [None, None])
                pair[chan] = arr
        for i, (mid, name) in enumerate(stap_slots):
            mod_taps[mid][name] = stap_acc[0, i]

        for mid in region_order:
            k = _mid_key(mid)
            tp = {n: tuple(v) if isinstance(v, list) else v
                  for n, v in mod_taps[mid].items()}
            if specs[mid].tap_post is not None:
                tp = specs[mid].tap_post(tp)
            if tp:
                taps_all[k] = tp

            fo, fn_ = mod_exit_f[mid]
            io, in_ = mod_exit_i[mid]
            f_exits = [ef_row[0, fo + j] for j in range(fn_)]
            i_exits = [ei_row[0, io + j] for j in range(in_)]
            new_state[k] = specs[mid].unpack(f_exits, i_exits, state[k])

        return new_state, taps_all

    return program


def _make_kernel(region_order, entries, connections, specs, crossing,
                 mod_ops, mod_pf, mod_pi, mod_sf, mod_si, mod_tab, mod_scr,
                 mod_exit_f, mod_exit_i, tap_slots, stap_slots,
                 cfg, block, Sp, part_offset, n_ops, n_tab, order_ix):
    """Builds the Pallas kernel function for one launch."""
    n_taps = len(tap_slots)

    # tap emission order per module: the declared order
    decl_taps = {mid: specs[mid].declare["taps"] for mid in region_order}

    def kernel(pf_ref, pi_ref, sf_ref, si_ref, *refs):
        ops_refs = refs[:n_ops]
        tab_refs = refs[n_ops : n_ops + n_tab]
        out_refs = refs[n_ops + n_tab : n_ops + n_tab + n_taps]
        stap_ref = refs[n_ops + n_tab + n_taps]
        ef_ref = refs[n_ops + n_tab + n_taps + 1]
        ei_ref = refs[n_ops + n_tab + n_taps + 2]
        scratch_refs = refs[n_ops + n_tab + n_taps + 3 :]

        # the padded max(1, n) columns of empty scalar rows are never read;
        # every declared column is written exactly once below, so no zeroing
        # pass is needed (SMEM writes are scalar-by-scalar anyway)
        op_vals: Dict[int, Any] = {}

        def op_val(ix):
            if ix not in op_vals:
                op_vals[ix] = ops_refs[ix][...]
            return op_vals[ix]

        kbuffers: Dict[OutputId, Any] = {}
        tap_slot = 0
        stap_slot = 0

        for mid in region_order:
            entry = entries[mid]
            spec = specs[mid]
            fo, fn_ = mod_pf[mid]
            io, in_ = mod_pi[mid]
            so, sn = mod_sf[mid]
            zo, zn = mod_si[mid]
            to, tn = mod_tab[mid]
            co, cn = mod_scr[mid]
            used = tuple(
                any(oid == OutputId(mid, j) for oid in connections.values())
                for j in range(len(entry.outputs))
            )
            ctx = EmitCtx(
                Sp, cfg, block,
                pf=[pf_ref[fo + j] for j in range(fn_)],
                pi=[pi_ref[io + j] for j in range(in_)],
                sf=[sf_ref[so + j] for j in range(sn)],
                si=[si_ref[zo + j] for j in range(zn)],
                operands={name: op_val(ix)
                          for name, ix in mod_ops[mid].items()},
                tables=[tab_refs[to + j][...] for j in range(tn)],
                scratch=list(scratch_refs[co : co + cn]),
                t0_index=part_offset,
                used=used,
            )
            ins: List[Optional[Any]] = []
            for i, term in enumerate(entry.inputs):
                if term.line_type == LineType.VIDEO:
                    ins.append(None)
                    continue
                out_id = connections.get(InputId(mid, i))
                if out_id is not None and out_id in kbuffers:
                    ins.append(kbuffers[out_id])
                elif (mid, i) in crossing:
                    c = crossing[(mid, i)]
                    if c[0] == "stereo":
                        ins.append((op_val(c[1]), op_val(c[2])))
                    else:
                        ins.append(op_val(c[1]))
                else:
                    ins.append(None)
            outs, taps, (f_exits, i_exits) = spec.emit(ctx, ins)
            for i, buf in enumerate(outs):
                if buf is not None:
                    kbuffers[OutputId(mid, i)] = buf
            for name, chans in decl_taps[mid]:
                v = taps[name]
                if chans == 0:
                    stap_ref[0, stap_slot] = v.astype(jnp.float32)
                    stap_slot += 1
                elif chans == 1:
                    out_refs[tap_slot][...] = v
                    tap_slot += 1
                else:
                    for chan in range(chans):
                        out_refs[tap_slot][...] = v[chan]
                        tap_slot += 1
            fo2, _ = mod_exit_f[mid]
            for j, v in enumerate(f_exits):
                ef_ref[0, fo2 + j] = v.astype(jnp.float32)
            io2, _ = mod_exit_i[mid]
            for j, v in enumerate(i_exits):
                ei_ref[0, io2 + j] = v.astype(jnp.int32)

    return kernel
