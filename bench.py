#!/usr/bin/env python
"""Benchmark driver.

Primary metric (stdout, ONE JSON line): realtime multiple of a 16-module
48 kHz stereo graph render on one chip (BASELINE.json north star: >= 1000x;
the reference's implied floor is 1x realtime, src/engine/timing.rs:36-39).

``--all`` additionally runs every BASELINE.json config and prints one JSON
line per config to stderr:
  1. sine -> amplifier -> monitor, 10 s offline render
  2. 8-channel mixer cascade w/ per-channel amplifier+envelope+panner
  3. eq_three + 44.1k->48k polyphase resample on 16 stereo stems
  4. video_mixer: two 720p test patterns composited + scaled + RGB->YUV420
  5. full session: 16-module audio graph + 1080p30 compositing
plus a raw 1080p crossfade kernel number (north star: >= 500 fps).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# persistent XLA compilation cache: bench re-runs skip tunnel recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mixlab_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _emit(obj, primary=False):
    line = json.dumps(obj)
    if primary:
        print(line)
    else:
        print(line, file=sys.stderr)


# ---------------------------------------------------------------------------
# timing harness
#
# This machine reaches the TPU through a tunnel where (a) block_until_ready
# does not reliably wait and (b) every dispatch can move buffers, so the only
# honest measurement is: ONE jitted call containing the whole work loop
# (lax.scan / fori_loop) reduced on device to a scalar, timed by fetching
# that scalar, with the measured tiny-op round-trip subtracted.
# ---------------------------------------------------------------------------

_RTT = None

# TPU v5e peaks for utilization accounting (VERDICT r1 item 8: report MFU /
# HBM util so perf claims are judgeable against the silicon)
PEAK_FLOPS = 197e12  # bf16 MXU
PEAK_HBM = 819e9     # bytes/s


def _thunk(jitted, *args):
    """Zero-arg timing thunk that also carries what's needed for XLA cost
    analysis (flops / bytes accessed)."""
    t = lambda: jitted(*args)
    t.jitted = jitted
    t.args = args
    return t


def slope_utilization(make, n1, n2, sec_per_unit):
    """MFU and HBM utilization per work unit from XLA's own cost analysis,
    differenced between the two slope points (fixed overhead cancels)."""
    try:
        costs = []
        for n in (n1, n2):
            t = make(n)
            if not hasattr(t, "jitted"):
                return {}
            ca = t.jitted.lower(*t.args).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            costs.append((float(ca.get("flops", 0.0)),
                          float(ca.get("bytes accessed", 0.0))))
        df = (costs[1][0] - costs[0][0]) / (n2 - n1)
        db = (costs[1][1] - costs[0][1]) / (n2 - n1)
        return {
            "gflops_per_unit": round(df / 1e9, 3),
            "hbm_gb_per_unit": round(db / 1e9, 3),
            "mfu": round(df / sec_per_unit / PEAK_FLOPS, 4),
            "hbm_util": round(db / sec_per_unit / PEAK_HBM, 4),
        }
    except Exception:
        return {}


def measure_rtt():
    global _RTT
    if _RTT is None:
        import jax
        import jax.numpy as jnp

        g = jax.jit(lambda x: x + 1)
        x = jnp.zeros((8, 128), jnp.float32)
        np.asarray(g(x))
        _RTT = min(
            _time_fetch(lambda: np.asarray(g(x)[0, 0])) for _ in range(5)
        )
    return _RTT


def _time_fetch(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def timed_call(fn, *args, reps=3):
    """Time fn(*args) -> scalar-ish output, fetch-synced, RTT-subtracted."""
    out = fn(*args)
    np.asarray(out)  # warm: compile + first run
    rtt = measure_rtt()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 1e-9)


def timed_slope(make, n1, n2, reps=3):
    """Two-point timing: ``make(n)`` returns a zero-arg jitted thunk doing n
    units of work ending in a scalar fetch.  Returns seconds per unit as
    (t(n2) - t(n1)) / (n2 - n1) — tunnel latency and fixed overhead cancel
    exactly, unlike RTT subtraction which is noise-limited here."""
    f1, f2 = make(n1), make(n2)
    np.asarray(f1())
    np.asarray(f2())
    t1 = min(_time_fetch(lambda: np.asarray(f1())) for _ in range(reps))
    t2 = min(_time_fetch(lambda: np.asarray(f2())) for _ in range(reps))
    return max((t2 - t1) / (n2 - n1), 1e-12)


# ---------------------------------------------------------------------------
# graph builders
# ---------------------------------------------------------------------------


def build_16_module_graph():
    """Flagship: 8-channel mixer fed by osc/env/amp chains + fm_sine +
    eq_three + panner/splitter + monitor = 16 modules."""
    from mixlab_tpu import protocol as p
    from mixlab_tpu.engine.graph import Workspace
    from mixlab_tpu.protocol import InputId, OutputId

    ws = Workspace()
    mids = []

    def add(kind, params):
        mid = ws.create_module(p.ModuleParams(kind, params))
        mids.append(mid)
        return mid

    trig = add("Trigger", p.GateState.OPEN)
    env = add("Envelope", p.EnvelopeParams())
    oscs = [
        add("Oscillator", p.OscillatorParams(110.0 * (i + 1), p.Waveform.SINE))
        for i in range(4)
    ]
    fm = add("FmSine", p.FmSineParams(440.0, 880.0))
    amps = [
        add("Amplifier", p.AmplifierParams(amplitude=0.5, mod_depth=0.3))
        for i in range(4)
    ]
    eq = add("EqThree", p.EqThreeParams(p.Decibel(4.0), p.Decibel(0.0), p.Decibel(4.0)))
    split = add("StereoSplitter", None)
    pan = add("StereoPanner", None)
    mixer = add("Mixer", p.MixerParams.with_channels(8))
    mon = add("Monitor", None)

    ws.connect(InputId(env, 0), OutputId(trig, 0))
    for i, (o, a) in enumerate(zip(oscs, amps)):
        ws.connect(InputId(a, 0), OutputId(o, 1))
        ws.connect(InputId(a, 1), OutputId(env, 0))
        ws.connect(InputId(mixer, i), OutputId(a, 0))
    ws.connect(InputId(fm, 0), OutputId(env, 0))
    ws.connect(InputId(mixer, 4), OutputId(fm, 0))
    ws.connect(InputId(split, 0), OutputId(amps[0], 0))
    ws.connect(InputId(eq, 0), OutputId(split, 0))
    ws.connect(InputId(pan, 0), OutputId(eq, 0))
    ws.connect(InputId(pan, 1), OutputId(split, 1))
    ws.connect(InputId(mixer, 5), OutputId(pan, 0))
    ws.connect(InputId(mixer, 6), OutputId(amps[1], 0))
    ws.connect(InputId(mixer, 7), OutputId(amps[2], 0))
    ws.connect(InputId(mon, 1), OutputId(mixer, 0))
    assert len(mids) == 16, len(mids)
    return ws, mon


def build_config1_graph():
    """sine -> amplifier -> monitor (BASELINE config 1)."""
    from mixlab_tpu import protocol as p
    from mixlab_tpu.engine.graph import Workspace
    from mixlab_tpu.protocol import InputId, OutputId

    ws = Workspace()
    o = ws.create_module(p.ModuleParams("Oscillator", p.OscillatorParams(440.0, p.Waveform.SINE)))
    a = ws.create_module(p.ModuleParams("Amplifier", p.AmplifierParams(amplitude=0.5)))
    m = ws.create_module(p.ModuleParams("Monitor", None))
    ws.connect(InputId(a, 0), OutputId(o, 1))
    ws.connect(InputId(m, 1), OutputId(a, 0))
    return ws, m


def build_config2_graph():
    """8-channel mixer cascade: per channel osc -> amplifier(envelope mod)
    -> splitter -> panner -> mixer channel (BASELINE config 2)."""
    from mixlab_tpu import protocol as p
    from mixlab_tpu.engine.graph import Workspace
    from mixlab_tpu.protocol import InputId, OutputId

    ws = Workspace()
    trig = ws.create_module(p.ModuleParams("Trigger", p.GateState.OPEN))
    env = ws.create_module(p.ModuleParams("Envelope", p.EnvelopeParams()))
    ws.connect(InputId(env, 0), OutputId(trig, 0))
    mixer = ws.create_module(p.ModuleParams("Mixer", p.MixerParams.with_channels(8)))
    for i in range(8):
        o = ws.create_module(
            p.ModuleParams("Oscillator", p.OscillatorParams(55.0 * (i + 2), p.Waveform.SAW))
        )
        a = ws.create_module(
            p.ModuleParams("Amplifier", p.AmplifierParams(amplitude=0.7, mod_depth=0.5))
        )
        sp = ws.create_module(p.ModuleParams("StereoSplitter", None))
        pan = ws.create_module(p.ModuleParams("StereoPanner", None))
        ws.connect(InputId(a, 0), OutputId(o, 1))
        ws.connect(InputId(a, 1), OutputId(env, 0))
        ws.connect(InputId(sp, 0), OutputId(a, 0))
        ws.connect(InputId(pan, 0), OutputId(sp, 0))
        ws.connect(InputId(pan, 1), OutputId(sp, 1))
        ws.connect(InputId(mixer, i), OutputId(pan, 0))
    mon = ws.create_module(p.ModuleParams("Monitor", None))
    ws.connect(InputId(mon, 1), OutputId(mixer, 0))
    return ws, mon


# ---------------------------------------------------------------------------
# audio graph bench
# ---------------------------------------------------------------------------


def bench_graph(build, block_ticks=480, n1=2, n2=32, reps=4, sample_rate=48_000):
    """Whole render in ONE device dispatch (lax.scan over blocks); slope
    timing between n1 and n2 scan lengths cancels tunnel latency.  One body
    compile is shared by both points.  n2-n1 is kept large (30 blocks = 4
    minutes of audio) so the compute delta dwarfs the 20-50 ms fetch-latency
    jitter of this TPU tunnel."""
    from mixlab_tpu.engine.config import BlockSpec, EngineConfig
    from mixlab_tpu.engine.scan_render import build_scanned, stacked_host_aux

    cfg = EngineConfig(sample_rate=sample_rate)
    ws, mon = build()
    block = BlockSpec(block_ticks)
    patch, fn = build_scanned(ws, cfg, block, checksum_only=True)
    aux = patch.prepare_aux(ws)
    state0 = patch.init_state(ws)

    import jax

    jfn = jax.jit(lambda a, h, s: fn(a, h, s)[1])

    def make(n):
        host_aux = stacked_host_aux(patch, 0, n)
        return _thunk(jfn, aux, host_aux, state0)

    sec_per_block = timed_slope(make, n1, n2, reps=reps)
    block_seconds = block.n_samples(cfg) / cfg.sample_rate
    # scan-length slopes cancel to ~0 in XLA's cost analysis (while bodies
    # are counted once, not x trip count — this is why BENCH_r03/r04 carried
    # mfu 0.0): analyze the UNSCANNED single-block program instead and
    # divide by the measured per-block wall time
    util = {}
    try:
        jblock = jax.jit(patch._fn)
        h1 = patch.host_aux(0)
        ca = jblock.lower(aux, h1, state0).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        fl = float(ca.get("flops", 0.0))
        by = float(ca.get("bytes accessed", 0.0))
        util = {
            "gflops_per_block": round(fl / 1e9, 3),
            "hbm_gb_per_block": round(by / 1e9, 3),
            "mfu": round(fl / sec_per_block / PEAK_FLOPS, 6),
            "hbm_util": round(by / sec_per_block / PEAK_HBM, 4),
        }
    except Exception:
        pass
    bench_graph.last_utilization = util
    return block_seconds / sec_per_block


# ---------------------------------------------------------------------------
# config 3: 16 stereo stems, 44.1k -> 48k resample + eq_three
# ---------------------------------------------------------------------------


def bench_stems16(seconds_audio=4.0, reps=2):
    import jax
    import jax.numpy as jnp

    from mixlab_tpu.dsp.eq_three import EqThreeDef
    from mixlab_tpu.dsp.registry import get_def
    from mixlab_tpu.dsp.resampler import context_len, resample_block
    from mixlab_tpu.engine.config import BlockSpec, EngineConfig
    from mixlab_tpu.protocol import Decibel, EqThreeParams

    cfg = EngineConfig(sample_rate=48_000)
    block = BlockSpec(120)  # 2 s per dispatch
    S_in = block.n_ticks * 735  # 44.1k samples per block
    STEMS = 16

    eq = get_def("EqThree")
    params = EqThreeParams(Decibel(4.0), Decibel(-2.0), Decibel(4.0))
    aux = eq.prepare(params, cfg)

    def stem_fn(x, rs_ctx, eq_state):
        # resample the stereo stem, then per-channel eq with per-channel state
        y, rs_ctx = resample_block(x, rs_ctx, 44100, 48000)

        def chan(xc, st):
            st, (out,), _ = eq.run_block(params, aux, None, st, [xc], cfg, block)
            return out, st

        outs, eq_state = jax.vmap(chan)(y.T, eq_state)
        return outs.T, rs_ctx, eq_state

    batched = jax.jit(jax.vmap(stem_fn))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (STEMS, S_in, 2)).astype(np.float32))
    rs_ctx = jnp.zeros((STEMS, context_len(44100, 48000), 2), dtype=jnp.float32)
    # state per (stem, channel)
    eq_state = jax.vmap(
        lambda _: jax.vmap(lambda __: eq.init_state(params, cfg))(jnp.arange(2))
    )(jnp.arange(STEMS))

    n_blocks = max(2, int(seconds_audio / 2.0))

    def make(n):
        def whole(x, rs_ctx, eq_state):
            def body(carry, _):
                c, s = carry
                out, c, s = jax.vmap(stem_fn)(x, c, s)
                return (c, s), jnp.sum(out)
            (_, _), sums = jax.lax.scan(body, (rs_ctx, eq_state), None, length=n)
            return jnp.sum(sums)
        f = jax.jit(whole)
        return lambda: f(x, rs_ctx, eq_state)

    # the eq kernel + conv resampler pushed per-block cost near the timing
    # floor: widen the spread so the slope stays above tunnel noise
    sec_per_block = timed_slope(make, n_blocks, n_blocks + 40)
    return 2.0 / sec_per_block


# ---------------------------------------------------------------------------
# video benches
# ---------------------------------------------------------------------------


def bench_blend_1080p(batch=32, iters=100, reps=2):
    """Raw 1080p crossfade kernel (north star: >= 500 fps/chip).

    ``iters`` dependent blend rounds of a ``batch`` of frames inside one
    dispatch: frames = batch * iters."""
    import jax
    import jax.numpy as jnp

    from mixlab_tpu.video.blend import crossfade_xla

    rng = np.random.default_rng(1)
    planes = {"y": (1088, 1920), "u": (544, 960), "v": (544, 960)}
    a = {k: jnp.asarray(rng.integers(0, 256, (batch,) + s, dtype=np.uint8)) for k, s in planes.items()}
    b = {k: jnp.asarray(rng.integers(0, 256, (batch,) + s, dtype=np.uint8)) for k, s in planes.items()}

    def make(n):
        def whole(a, b):
            def body(acc, _):
                out = {k: crossfade_xla(acc[k], b[k], 200) for k in acc}
                return out, None
            out, _ = jax.lax.scan(body, a, None, length=n)
            return sum(jnp.sum(v.astype(jnp.uint32)) for v in out.values())
        f = jax.jit(whole)
        return lambda: f(a, b)

    sec_per_iter = timed_slope(make, iters, 2 * iters, reps=reps)
    return batch / sec_per_iter


def bench_config4_composite(batch=32, reps=3):
    """Two 720p test patterns -> RGB->YUV -> scale to 1080p -> crossfade."""
    import jax
    import jax.numpy as jnp

    from mixlab_tpu.video.blend import crossfade_xla
    from mixlab_tpu.video.colorspace import rgb_to_yuv420
    from mixlab_tpu.video.frame import PictureSettings
    from mixlab_tpu.video.pattern import gradient_rgb, smpte_bars_rgb
    from mixlab_tpu.video.scale import resize_plane

    H_OUT, W_OUT = 1080, 1920

    def pipeline(t):
        outs = {}
        rgb_a = smpte_bars_rgb(1280, 720, phase=t)
        rgb_b = gradient_rgb(1280, 720, t=t)
        for name, rgb in (("a", rgb_a), ("b", rgb_b)):
            y, u, v = rgb_to_yuv420(rgb)
            outs[name] = (
                resize_plane(y, H_OUT, W_OUT),
                resize_plane(u, H_OUT // 2, W_OUT // 2),
                resize_plane(v, H_OUT // 2, W_OUT // 2),
            )
        return tuple(
            crossfade_xla(pa, pb, 153) for pa, pb in zip(outs["a"], outs["b"])
        )

    def make(n):
        def whole(_):
            def step(carry, k):
                ts = k * batch + jnp.arange(batch, dtype=jnp.int32)
                outs = jax.vmap(pipeline)(ts)
                s = sum(jnp.sum(o.astype(jnp.uint32)) for o in outs)
                return carry + s, None
            total, _ = jax.lax.scan(step, jnp.uint32(0), jnp.arange(n, dtype=jnp.int32))
            return total
        f = jax.jit(whole)
        return lambda: f(0)

    sec_per_chunk = timed_slope(make, 2, 12, reps=reps)
    return batch / sec_per_chunk


def bench_config5_full_session(seconds=4, reps=3):
    """16-module audio graph + 1080p30 compositing, all in one dispatch."""
    import jax
    import jax.numpy as jnp

    from mixlab_tpu.engine.config import BlockSpec, EngineConfig
    from mixlab_tpu.engine.scan_render import build_scanned, stacked_host_aux
    from mixlab_tpu.video.blend import crossfade_xla
    from mixlab_tpu.video.colorspace import rgb_to_yuv420
    from mixlab_tpu.video.pattern import gradient_rgb
    from mixlab_tpu.video.scale import resize_plane

    cfg = EngineConfig(sample_rate=48_000)
    ws, mon = build_16_module_graph()
    block = BlockSpec(60)  # 1 s audio per scan step
    patch, audio_fn = build_scanned(ws, cfg, block, checksum_only=True)
    aux = patch.prepare_aux(ws)
    state0 = patch.init_state(ws)
    host_aux = stacked_host_aux(patch, 0, seconds)

    FRAMES = 30  # 1080p30
    # MIXLAB_BENCH_FUSED=1 routes the luma through the algebraically folded
    # resize+roll+crossfade operator (video/fused.py).  Measured A/B on the
    # chip (round 3, 5 interleaved pairs): performance-NEUTRAL — XLA already
    # fuses the separate elementwise stages into the resize consumers — so
    # the default is the separate path with exact u8 blend semantics.
    fused = os.environ.get("MIXLAB_BENCH_FUSED", "0") == "1"

    # MIXLAB_BENCH_YUV=downfirst routes the converter through the planar
    # integer-downsample-first formulation (colorspace.rgb_planes_to_
    # yuv420_downfirst); isolated stage benches constant-fold under the
    # checksum harness, so the A/B lives at full-pipeline level here.
    downfirst = os.environ.get("MIXLAB_BENCH_YUV", "") == "downfirst"

    def video_frame(i):
        from mixlab_tpu.video.colorspace import rgb_planes_to_yuv420_downfirst
        from mixlab_tpu.video.fused import resize_crossfade_roll
        from mixlab_tpu.video.pattern import gradient_planes

        if downfirst:
            y, u, v = rgb_planes_to_yuv420_downfirst(
                *gradient_planes(960, 540, t=i))
        else:
            rgb = gradient_rgb(960, 540, t=i)
            y, u, v = rgb_to_yuv420(rgb)
        if fused:
            y2 = resize_crossfade_roll(y, 1080, 1920, 128)
        else:
            y1 = resize_plane(y, 1080, 1920)
            y2 = crossfade_xla(y1, jnp.roll(y1, 1, axis=0), 128)
        u = resize_plane(u, 540, 960)
        v = resize_plane(v, 540, 960)
        return (
            jnp.sum(y2.astype(jnp.uint32))
            + jnp.sum(u.astype(jnp.uint32))
            + jnp.sum(v.astype(jnp.uint32))
        )

    def make(n):
        host_aux_n = stacked_host_aux(patch, 0, n)

        def whole(aux, host_aux, state0):
            _, audio_sum = audio_fn(aux, host_aux, state0)
            vsums = jax.vmap(video_frame)(
                jnp.arange(n * FRAMES, dtype=jnp.int32)
            )
            return audio_sum + jnp.sum(vsums).astype(jnp.float32)

        f = jax.jit(whole)
        return _thunk(f, aux, host_aux_n, state0)

    sec_per_content_second = timed_slope(make, seconds, 2 * seconds, reps=reps)
    bench_config5_full_session.last_utilization = slope_utilization(
        make, seconds, 2 * seconds, sec_per_content_second
    )
    return 1.0 / sec_per_content_second


# ---------------------------------------------------------------------------
# fleet serving: sessions per chip at 60 Hz (VERDICT r3 ask #5)
# ---------------------------------------------------------------------------


def bench_fleet_sessions(block_ticks=15, n_start=256, max_n=16384, reps=3):
    """Max independent 16-module 48 kHz sessions one chip sustains at 60 Hz.

    The TPU justification for this framework is consolidation: many mixlab
    sessions served from one chip (parallel/fleet.py).  N sessions of the
    flagship graph are vmapped into one program; the block loop rides a
    device-side scan (same harness as bench_graph, so tunnel latency
    cancels in the slope).  A fleet of N is "realtime" when one block
    (block_ticks/60 s of audio for EVERY session) renders in less wall
    time than it represents.  Doubling/interpolation search on N, bounded
    by HBM ([N, samples, 2] mix buffers cap max_n).

    Per-session aux gets a deterministic ~1e-4 jitter on float leaves so
    no two sessions carry identical parameters (honesty guard: the vmap
    axis is real data, not a broadcast XLA could collapse).

    Returns a dict: sessions held (largest tested N at >= 1x), the
    interpolated capacity estimate, the realtime multiple at the held N,
    and XLA cost-analysis utilization at that N.
    """
    import jax
    import jax.numpy as jnp

    from mixlab_tpu.engine.config import BlockSpec, EngineConfig
    from mixlab_tpu.engine.scan_render import build_scanned, stacked_host_aux

    cfg = EngineConfig(sample_rate=48_000)
    ws, _mon = build_16_module_graph()
    block = BlockSpec(block_ticks)
    patch, fn = build_scanned(ws, cfg, block, checksum_only=True)
    aux1 = patch.prepare_aux(ws)
    state1 = patch.init_state(ws)
    block_seconds = block.n_samples(cfg) / cfg.sample_rate

    def fleet_args(n):
        def tile(x):
            x = jnp.asarray(x)
            t = jnp.broadcast_to(x, (n,) + x.shape)
            if jnp.issubdtype(t.dtype, jnp.floating):
                j = jnp.arange(n, dtype=t.dtype).reshape((n,) + (1,) * x.ndim)
                t = t * (1.0 + 1e-4 * j / max(n, 1))
            return t

        aux = jax.tree.map(tile, aux1)
        state = jax.tree.map(
            lambda x: jnp.broadcast_to(jnp.asarray(x), (n,) + jnp.asarray(x).shape),
            state1,
        )
        return aux, state

    # vmap over sessions; the host time base (host_aux) is shared —
    # per-session copies would be pure data duplication at identical values
    vfleet = jax.vmap(fn, in_axes=(0, None, 0))

    def multiple_at(n_sessions, want_util=False):
        aux, state = fleet_args(n_sessions)
        jf = jax.jit(lambda a, h, s: jnp.sum(vfleet(a, h, s)[1]))

        def make(nb):
            return _thunk(jf, aux, stacked_host_aux(patch, 0, nb), state)

        sec_per_block = timed_slope(make, 2, 8, reps=reps)
        util = {}
        if want_util:
            # scan-length slopes cancel to ~0 in XLA's cost analysis (while
            # bodies are counted once, not x trip count): take the analysis
            # of the UNSCANNED single-block fleet program instead and divide
            # by the measured per-block wall time
            try:
                vblock = jax.jit(
                    jax.vmap(patch._fn, in_axes=(0, None, 0))
                )
                h1 = patch.host_aux(0)
                ca = vblock.lower(aux, h1, state).compile().cost_analysis()
                ca = ca[0] if isinstance(ca, list) else ca
                fl = float(ca.get("flops", 0.0))
                by = float(ca.get("bytes accessed", 0.0))
                util = {
                    "gflops_per_block": round(fl / 1e9, 3),
                    "hbm_gb_per_block": round(by / 1e9, 3),
                    "mfu": round(fl / sec_per_block / PEAK_FLOPS, 4),
                    "hbm_util": round(by / sec_per_block / PEAK_HBM, 4),
                }
            except Exception:
                util = {}
        return block_seconds / sec_per_block, util

    n = n_start
    held, held_m, tested = 0, 0.0, []
    for _ in range(4):
        m, _ = multiple_at(n)
        tested.append({"n": n, "realtime_multiple": round(m, 2)})
        if m >= 1.0:
            held, held_m = n, m
            if n >= max_n:
                break
            # jump toward the interpolated capacity, clamped to the HBM cap
            nxt = min(max_n, 1 << int(np.log2(max(n * m, n * 2))))
            if nxt <= n:
                break
            n = nxt
        else:
            if held:
                break
            n = max(16, n // 4)

    _, util = multiple_at(held or n, want_util=True)
    capacity = int(held * held_m) if held else 0
    return {
        "value": held,
        "estimated_capacity": capacity,
        "realtime_multiple_at_held": round(held_m, 2),
        "saturated_hbm_cap": bool(held >= max_n),
        "sweep": tested,
        **util,
    }


# ---------------------------------------------------------------------------
# fleet serving END TO END: real WS sessions through one vmapped dispatch
# (VERDICT r4 ask #1: the device number above scopes out host fan-out; this
# one includes it — N live WebSocket clients, per-session edits, per-session
# monitor PCM delivered over real sockets)
# ---------------------------------------------------------------------------


def _bench_mask_frame(opcode, payload):
    import os as _os
    import struct

    mask = _os.urandom(4)
    head = bytearray([0x80 | opcode])
    n = len(payload)
    if n < 126:
        head.append(0x80 | n)
    elif n < 0x10000:
        head.append(0x80 | 126)
        head += struct.pack(">H", n)
    else:
        head.append(0x80 | 127)
        head += struct.pack(">Q", n)
    return bytes(head) + mask + bytes(b ^ mask[i % 4] for i, b in enumerate(payload))


async def _bench_ws_recv(reader):
    import struct

    head = await reader.readexactly(2)
    opcode = head[0] & 0x0F
    n = head[1] & 0x7F
    if n == 126:
        (n,) = struct.unpack(">H", await reader.readexactly(2))
    elif n == 127:
        (n,) = struct.unpack(">Q", await reader.readexactly(8))
    return opcode, await reader.readexactly(n)


def bench_fleet_e2e(capacity=None, seconds=10.0, block_ticks=15,
                    warmup=8.0, sample_rate=48_000):
    """``sessions_per_chip_60hz_e2e``: the LARGEST N for which N real
    WebSocket sessions are served end to end at 60 Hz from one process.
    Tries a descending ladder of capacities (env ``MIXLAB_FLEET_E2E_N``
    pins a single N instead) so the driver-captured artifact always
    carries the largest HOLDING capacity, never a bare fail-at-256
    (VERDICT r4 weak #1/#2: the official record must carry the number)."""
    if capacity is not None:
        return _fleet_e2e_once(capacity, seconds, block_ticks, warmup,
                               sample_rate)
    env_n = os.environ.get("MIXLAB_FLEET_E2E_N")
    if env_n is not None:
        return _fleet_e2e_once(int(env_n), seconds, block_ticks, warmup,
                               sample_rate)
    ladder = [256, 128, 96, 64, 32]
    tried = []
    out = None
    while ladder:
        n = ladder.pop(0)
        out = _fleet_e2e_once(n, seconds, block_ticks, warmup, sample_rate)
        tried.append({"n": n,
                      "held_60hz": out["held_60hz"],
                      "achieved_tick_rate": out["achieved_tick_rate"],
                      "pcm_delivered": out["pcm_blocks_delivered_fraction"]})
        if out["held_60hz"]:
            break
        # skip ladder rungs the achieved rate says cannot hold either
        est = n * out["achieved_tick_rate"] / 60.0
        ladder = [m for m in ladder if m <= est * 1.3]
    out["ladder"] = tried
    return out


def _fleet_e2e_once(capacity, seconds=10.0, block_ticks=15,
                    warmup=8.0, sample_rate=48_000):
    """One fleet-serving trial at a fixed capacity: N REAL WebSocket
    sessions served end to end from one process — every session joins over
    a real socket, edits its oscillator to a unique frequency (so the vmap
    axis carries real per-session params), and receives its own monitor tap
    as framed i16 PCM — while ALL N sessions' DSP executes as ONE vmapped
    dispatch per block (server/fleet_serve.py over parallel/fleet.py).

    Unlike bench_fleet_sessions (device throughput only), the measured
    window includes the full host path: per-instance host_aux fan-in, the
    device fetch, per-session packetization, and actual WS delivery.  The
    capacity HOLDS when the engine's whole-window tick rate stays at 60 Hz,
    no block ran later than one block period, and >= 95% of the expected
    PCM blocks were delivered to the clients."""
    import asyncio
    import json as _json

    from mixlab_tpu.engine.config import EngineConfig
    from mixlab_tpu.server.fleet_serve import FleetEngine, FleetServeApp
    ws, _mon = build_16_module_graph()
    osc_mid = next(
        m.value for m, e in ws.modules.items() if e.params.kind == "Oscillator"
    )
    eng = FleetEngine(ws, capacity, EngineConfig(sample_rate=sample_rate),
                      block_ticks=block_ticks)
    eng.start()
    block_seconds = block_ticks / eng.cfg.ticks_per_second
    counting = {"on": False}
    stats = [{"blocks": 0, "joined": False} for _ in range(capacity)]

    async def client(port, i, stop_evt):
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(
            (f"GET /fleet HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
             f"Connection: Upgrade\r\nSec-WebSocket-Key: "
             f"dGhlIHNhbXBsZSBub25jZQ==\r\n"
             f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
        await writer.drain()
        head = await reader.readuntil(b"\r\n\r\n")
        assert b"101" in head.split(b"\r\n")[0]
        opc, payload = await _bench_ws_recv(reader)
        assert _json.loads(payload)["t"] == "Joined"
        opc, payload = await _bench_ws_recv(reader)  # WorkspaceState
        stats[i]["joined"] = True
        op = {"t": "WorkspaceMessage", "sequence": 1,
              "op": {"t": "UpdateModuleParams", "module_id": osc_mid,
                     "params": {"kind": "Oscillator",
                                "params": {"t": "OscillatorParams",
                                           "freq": 150.0 + 0.37 * i,
                                           "waveform": "sine"}}}}
        env = _json.dumps({"v": 1, "kind": "Workspace", "m": op})
        writer.write(_bench_mask_frame(1, env.encode()))
        await writer.drain()
        try:
            while not stop_evt.is_set():
                try:
                    opc, payload = await asyncio.wait_for(
                        _bench_ws_recv(reader), timeout=1.0)
                except asyncio.TimeoutError:
                    continue  # a lagging engine must not kill the client
                if opc == 2 and counting["on"]:
                    stats[i]["blocks"] += 1
        except (ConnectionError, asyncio.IncompleteReadError):
            pass
        finally:
            writer.close()

    async def run():
        app = FleetServeApp(eng)
        port = await app.serve()
        stop_evt = asyncio.Event()
        tasks = [asyncio.create_task(client(port, i, stop_evt))
                 for i in range(capacity)]
        # wait for the whole fleet to join (connect storm included in warmup)
        t_dead = time.monotonic() + max(warmup, 30.0)
        while (sum(s["joined"] for s in stats) < capacity
               and time.monotonic() < t_dead):
            await asyncio.sleep(0.2)
        joined = sum(s["joined"] for s in stats)
        await asyncio.sleep(warmup)  # edits applied, codec warm, loop settled
        # measured window
        stat = eng._stat
        stat.total_ticks = 0
        stat.total_on_schedule = 0
        stat.total_max_late_s = float("-inf")
        tick0, t0 = eng.tick, time.monotonic()
        counting["on"] = True
        await asyncio.sleep(seconds)
        counting["on"] = False
        elapsed = time.monotonic() - t0
        rate = (eng.tick - tick0) / elapsed
        delivered = sum(s["blocks"] for s in stats)
        expected = joined * elapsed / block_seconds
        stop_evt.set()
        await asyncio.gather(*tasks, return_exceptions=True)
        await app.shutdown()
        return joined, rate, delivered, expected

    try:
        joined, rate, delivered, expected = asyncio.run(run())
    finally:
        eng.stop()
    stat = eng._stat
    max_late = stat.total_max_late_s
    delivered_frac = delivered / expected if expected else 0.0
    held = (rate >= eng.cfg.ticks_per_second - 0.5
            and max_late <= block_seconds
            and delivered_frac >= 0.95)
    return {
        "value": capacity if held else 0,
        "capacity_tested": capacity,
        "sessions_joined": joined,
        "held_60hz": bool(held),
        "achieved_tick_rate": round(rate, 1),
        "on_schedule_fraction": round(stat.realtime_fraction_total, 4),
        "max_late_ms": round(max_late * 1e3, 2) if max_late > -1e8 else None,
        "pcm_blocks_delivered_fraction": round(delivered_frac, 4),
        "block_ticks": block_ticks,
    }


# ---------------------------------------------------------------------------


def bench_realtime_engine(block_ticks=4, seconds=8.0):
    """Achieved tick rate of the ACTUAL realtime engine thread
    (Engine.start(): 60 Hz absolute deadlines, cmd drain, live monitor
    codec) on this chip.  See BENCH_NOTES 'Realtime engine ON the TPU'."""
    import time as _t

    from mixlab_tpu.engine.config import EngineConfig
    from mixlab_tpu.engine.engine import Engine

    ws, _mon = build_16_module_graph()
    eng = Engine(workspace=ws, cfg=EngineConfig(sample_rate=44_100),
                 block_ticks=block_ticks)
    for _ in range(3):
        eng.tick_once()  # compile + warm
    eng.tick = 0
    eng.start()
    samples = _sample_tick_rate(eng, seconds)
    stat = eng._stat
    eng.stop()
    return _window_stats(samples, stat, eng.cfg.ticks_per_second,
                         block_ticks / eng.cfg.ticks_per_second)


def _sample_tick_rate(eng, seconds, warmup_s=2.0):
    """Sliding 1 s tick rates over the run, measured BETWEEN block-
    completion events (the tick counter advances block_ticks at a time;
    naive 1 s deltas quantize to 60 +/- block_ticks and fake both lag and
    bursts).  The first ``warmup_s`` are engine-thread startup
    (device-thread first dispatch on this tunnel) and excluded from both
    the rates and the lateness/on-schedule accounting."""
    import time as _t

    _t.sleep(warmup_s)
    stat = eng._stat
    stat.total_ticks = 0
    stat.total_on_schedule = 0
    stat.total_max_late_s = float("-inf")
    events = [(_t.monotonic(), eng.tick)]
    t_end = _t.monotonic() + seconds
    last = events[0][1]
    while _t.monotonic() < t_end:
        _t.sleep(0.02)
        cur = eng.tick
        if cur != last:
            events.append((_t.monotonic(), cur))
            last = cur
    return events


def _window_stats(events, stat, target_rate, block_seconds):
    """{mean rate, min 5 s sliding rate, on-schedule fraction, worst
    lateness, flag}.  Flag semantics (round-3 verdict #7, refined round
    4): true only when the whole-run mean held the target AND no block
    finished more than one block period past its absolute deadline — the
    bound below which double-buffered output cannot underrun.  A 52/60
    window fails the mean; a single stalled block fails the lateness
    bound; sub-ms deadline grazes with full throughput pass.  (Short
    sliding windows are NOT used for the flag: completions land anywhere
    inside their period, so a 1 s window quantizes to +/- one block and
    fakes both lag and burst — the per-block lateness series is the
    exact signal.)"""
    mean = 0.0
    if len(events) >= 2:
        mean = (events[-1][1] - events[0][1]) / (events[-1][0] - events[0][0])
    lo5 = None
    i = 0
    for j in range(1, len(events)):
        while events[j][0] - events[i + 1][0] >= 5.0 and i + 1 < j:
            i += 1
        dt = events[j][0] - events[i][0]
        if dt >= 5.0:
            r = (events[j][1] - events[i][1]) / dt
            lo5 = r if lo5 is None else min(lo5, r)
    fraction = stat.realtime_fraction_total
    max_late = stat.total_max_late_s
    flag = mean >= target_rate - 0.5 and max_late <= block_seconds
    return {
        "value": round(mean, 1),
        "min_5s_window_rate": round(lo5, 1) if lo5 is not None else None,
        "on_schedule_fraction": round(fraction, 4),
        "max_late_ms": round(max_late * 1e3, 2) if max_late > -1e8 else None,
        "realtime_flag": bool(flag),
    }


def bench_realtime_engine_video(block_ticks=4, seconds=8.0):
    """Realtime engine WITH live video: the flagship audio graph plus a
    video_mixer compositing two sources (1280x720 + 960x540) every tick,
    monitor consuming audio+video.  See REALTIME_TPU_VIDEO_r02.json."""
    import time as _t

    import jax.numpy as jnp

    from mixlab_tpu import protocol as p
    from mixlab_tpu.engine.config import EngineConfig
    from mixlab_tpu.engine.engine import Engine
    from mixlab_tpu.utils.mtime import MediaDuration
    from mixlab_tpu.video.frame import Picture, PictureSettings, VideoFrame

    rng = np.random.default_rng(0)
    ws, mon = build_16_module_graph()
    vm = ws.create_module(
        p.ModuleParams("VideoMixer", p.VideoMixerParams(a=0, b=1, fader=0.5))
    )
    ws.connect(p.InputId(mon, 0), p.OutputId(vm, 0))

    def mkframe(w, h):
        return VideoFrame(picture=Picture(PictureSettings(w, h), {
            "y": jnp.asarray(rng.integers(0, 256, (h, w), dtype=np.uint8)),
            "u": jnp.asarray(rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)),
            "v": jnp.asarray(rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)),
        }), duration_hint=MediaDuration.new(1, 30))

    f720, f540 = mkframe(1280, 720), mkframe(960, 540)
    eng = Engine(workspace=ws, cfg=EngineConfig(sample_rate=44_100),
                 block_ticks=block_ticks)
    orig = eng._video_input

    def vin(mid, idx, buffers, _orig=orig):
        if mid == vm and idx in (0, 1):
            return f720 if idx == 0 else f540
        return _orig(mid, idx, buffers)

    eng._video_input = vin
    for _ in range(3):
        eng.tick_once()
    eng.tick = 0
    eng.start()
    samples = _sample_tick_rate(eng, seconds)
    stat = eng._stat
    eng.stop()
    return _window_stats(samples, stat, eng.cfg.ticks_per_second,
                         block_ticks / eng.cfg.ticks_per_second)


def measured_range(fn, reps=3, **kw):
    """Run a whole benchmark ``reps`` times and report the spread — the
    honest-range discipline BENCH_NOTES.md documents in prose (2x swings
    under chip contention), carried into the machine-readable artifact:
    {value (median), min, max, reps}.

    Reps whose slope hit the timing-resolution clamp (timed_slope floors
    sec-per-unit at 1e-12, which reads back as ~1e12x) are measurement
    failures, not results: dropped when any healthy rep exists, and the
    drop is reported."""
    vals = sorted(float(fn(**kw)) for _ in range(reps))
    healthy = [v for v in vals if v < 1e9]
    dropped = len(vals) - len(healthy)
    vals = healthy or vals
    n = len(vals)
    mid = vals[n // 2] if n % 2 else (vals[n // 2 - 1] + vals[n // 2]) / 2
    out = {
        "value": round(mid, 2),
        "min": round(vals[0], 2),
        "max": round(vals[-1], 2),
        "reps": reps,
    }
    if dropped:
        out["reps_dropped_at_timing_floor"] = dropped
    return out


def main():
    """Default run (no flags) = the FULL headline set within a bounded
    budget, every number packed into the one primary stdout JSON line so
    the driver-captured artifact carries the claims (VERDICT r4 weak #1:
    BENCH_r04 recorded only the flagship with mfu 0.0 while the fleet and
    config5 numbers lived in builder notes).  ``--all`` adds the remaining
    BASELINE configs and the full fleet capacity sweep."""
    run_all = "--all" in sys.argv
    budget_s = float(os.environ.get("MIXLAB_BENCH_BUDGET_S", "900"))
    t_start = time.monotonic()

    def left():
        return budget_s - (time.monotonic() - t_start)

    # The tunneled backend can die process-wide (BENCH_NOTES round 3):
    # backend init then hangs forever.  Emit a machine-readable abort
    # instead of a silent driver timeout.
    import os as _os
    import threading as _threading

    first_op_done = _threading.Event()

    def _watchdog():
        if not first_op_done.wait(600.0):
            print(json.dumps({
                "metric": "bench_aborted_backend_unavailable",
                "value": 0,
                "unit": "none",
                "note": "device backend did not complete a first op within "
                        "600 s (tunnel outage; see BENCH_NOTES round 3)",
            }), flush=True)
            _os._exit(3)

    _threading.Thread(target=_watchdog, daemon=True).start()
    import jax.numpy as _jnp

    float(_jnp.zeros((8,)).sum())  # backend init + first op
    first_op_done.set()

    headline = {}

    def stage(key, min_budget_s, fn):
        """Run one headline stage unless the remaining budget cannot cover
        it; a skip is recorded machine-readably, never silent."""
        if left() < min_budget_s:
            headline[key] = {"skipped": f"budget ({int(left())}s left, "
                                        f"needs ~{min_budget_s}s)"}
            _emit({"metric": key, **headline[key]})
            return None
        try:
            out = fn()
        except Exception as e:  # a failed stage must not kill the artifact
            headline[key] = {"error": f"{type(e).__name__}: {e}"}
            _emit({"metric": key, **headline[key]})
            return None
        headline[key] = out
        _emit({"metric": key, **out})
        return out

    # 1. flagship (primary metric)
    rng = measured_range(lambda: bench_graph(build_16_module_graph), reps=3)
    flagship = {
        **rng,
        "unit": "x_realtime",
        **getattr(bench_graph, "last_utilization", {}),
    }
    _emit({"metric": "realtime_multiple_16module_48k_graph", **flagship})

    # 2. the realtime engine (the actual 60 Hz product loop on the chip)
    stage("realtime_engine_ticks_per_s_block4", 60, lambda: {
        **bench_realtime_engine(), "unit": "ticks_per_s (target 60)"})

    # 3. realtime engine WITH live video + codec threads
    stage("realtime_engine_with_video_ticks_per_s_block4", 60, lambda: {
        **bench_realtime_engine_video(), "unit": "ticks_per_s (target 60)"})

    # 4. fleet serving END TO END: real WS sessions, host fan-out included
    stage("sessions_per_chip_60hz_e2e", 240, lambda: {
        **bench_fleet_e2e(),
        "unit": "live WS sessions (16-module 48k graph each)"})

    # 5. fleet device throughput at the round-4 operating point
    stage("sessions_per_chip_60hz", 240, lambda: {
        **bench_fleet_sessions(n_start=8192, max_n=8192),
        "unit": "sessions (16-module 48k graph each, device dispatch only)"})

    # 6. config5 full session with MFU / HBM utilization
    stage("config5_full_session_1080p30", 180, lambda: {
        **measured_range(bench_config5_full_session, reps=3),
        "unit": "x_realtime",
        **getattr(bench_config5_full_session, "last_utilization", {})})

    # 7. config4 composite
    stage("config4_composite_720p_to_1080p", 120, lambda: {
        "value": round(bench_config4_composite(reps=2), 1), "unit": "fps"})

    if run_all:
        v1 = bench_graph(build_config1_graph, reps=2)
        # tiny graphs can dip under the slope-timing resolution floor
        _emit({"metric": "config1_sine_amp_monitor",
               "value": round(min(v1, 1e6), 1), "unit": "x_realtime",
               "note": "clamped to measurement floor" if v1 > 1e6 else ""})
        _emit({"metric": "config2_mixer8_cascade", "value": round(bench_graph(build_config2_graph, reps=2), 1), "unit": "x_realtime"})
        _emit({"metric": "config3_16stems_resample_eq", "value": round(bench_stems16(), 1), "unit": "x_realtime"})
        _emit({"metric": "video_blend_1080p", "value": round(bench_blend_1080p(), 1), "unit": "fps"})
        _emit({"metric": "sessions_per_chip_60hz_full_sweep",
               **bench_fleet_sessions(),
               "unit": "sessions (16-module 48k graph each)"})

    # THE one stdout line: flagship fields at the top level (the driver
    # parses value/min/max there) + every headline stage nested, so
    # BENCH_r{N}.json carries the complete official record
    _emit(
        {
            "metric": "realtime_multiple_16module_48k_graph",
            **flagship,
            "vs_baseline": flagship["value"],
            "headline": headline,
            "bench_wall_s": round(time.monotonic() - t_start, 1),
        },
        primary=True,
    )


if __name__ == "__main__":
    main()
