#!/usr/bin/env python
"""Isolate WHERE rgb2yuv's ~26-33 us/frame goes (roofline ~3 us).

Variants measured in one chip session (relative numbers are what matter):
the full converter, luma only, chroma full-res math without the 2x2 box
mean, the box mean alone, and a downsample-first chroma formulation.

Run: python tools/ab_rgb2yuv.py [reps]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import timed_slope  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from mixlab_tpu.video.colorspace import _OFFSET, _RGB2YUV
    from mixlab_tpu.video.pattern import gradient_planes

    FRAMES = 30
    H, W = 540, 960
    M = _RGB2YUV

    def planes(i):
        return gradient_planes(W, H, t=i)

    def f32(p):
        return p.astype(jnp.float32)

    def q(p):
        return jnp.clip(jnp.round(p), 0, 255).astype(jnp.uint8)

    def v_y_only(i):
        r, g, b = map(f32, planes(i))
        return (q(M[0, 0] * r + M[0, 1] * g + M[0, 2] * b + _OFFSET[0]),)

    def v_yuv_fullres(i):
        # all three, NO chroma downsample
        r, g, b = map(f32, planes(i))
        y = M[0, 0] * r + M[0, 1] * g + M[0, 2] * b + _OFFSET[0]
        u = M[1, 0] * r + M[1, 1] * g + M[1, 2] * b + _OFFSET[1]
        v = M[2, 0] * r + M[2, 1] * g + M[2, 2] * b + _OFFSET[2]
        return q(y), q(u), q(v)

    def v_current(i):
        r, g, b = map(f32, planes(i))
        y = M[0, 0] * r + M[0, 1] * g + M[0, 2] * b + _OFFSET[0]
        u = M[1, 0] * r + M[1, 1] * g + M[1, 2] * b + _OFFSET[1]
        v = M[2, 0] * r + M[2, 1] * g + M[2, 2] * b + _OFFSET[2]
        u = u.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
        v = v.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
        return q(y), q(u), q(v)

    def v_boxmean_rows_then_cols(i):
        r, g, b = map(f32, planes(i))
        y = M[0, 0] * r + M[0, 1] * g + M[0, 2] * b + _OFFSET[0]
        u = M[1, 0] * r + M[1, 1] * g + M[1, 2] * b + _OFFSET[1]
        v = M[2, 0] * r + M[2, 1] * g + M[2, 2] * b + _OFFSET[2]

        def down(p):
            p = p.reshape(H // 2, 2, W).sum(1)  # sublane pairs first
            return p.reshape(H // 2, W // 2, 2).sum(-1) * 0.25

        return q(y), q(down(u)), q(down(v))

    def v_down_first(i):
        # 2x2-average r,g,b in u16 FIRST, then the chroma matrix at half
        # res (linear ops commute; f32 rounding differs at most 1 ulp)
        r, g, b = planes(i)

        def down_u8(p):
            p16 = p.astype(jnp.float32)
            p16 = p16.reshape(H // 2, 2, W).sum(1)
            return p16.reshape(H // 2, W // 2, 2).sum(-1) * 0.25

        rf, gf, bf = map(f32, (r, g, b))
        y = M[0, 0] * rf + M[0, 1] * gf + M[0, 2] * bf + _OFFSET[0]
        rd, gd, bd = down_u8(r), down_u8(g), down_u8(b)
        u = M[1, 0] * rd + M[1, 1] * gd + M[1, 2] * bd + _OFFSET[1]
        v = M[2, 0] * rd + M[2, 1] * gd + M[2, 2] * bd + _OFFSET[2]
        return q(y), q(u), q(v)

    def v_down_bitcast(i):
        # the shipped candidate: exact integer 2x2 sums via the u16
        # bitcast pairing (no lane-strided ops at all)
        from mixlab_tpu.video.colorspace import rgb_planes_to_yuv420_downfirst

        r, g, b = planes(i)
        return rgb_planes_to_yuv420_downfirst(r, g, b)

    def bench(stage, reps):
        def make(n):
            def whole(_):
                def step(carry, k):
                    ts = k * FRAMES + jnp.arange(FRAMES, dtype=jnp.int32)
                    outs = jax.vmap(stage)(ts)
                    s = sum(jnp.sum(o.astype(jnp.uint32)) for o in outs)
                    return carry + s, None

                total, _ = jax.lax.scan(
                    step, jnp.uint32(0), jnp.arange(n, dtype=jnp.int32)
                )
                return total

            f = jax.jit(whole)
            return lambda: f(0)

        return timed_slope(make, 2, 10, reps=reps)

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    for name, fn in [
        ("y only", v_y_only),
        ("yuv full-res", v_yuv_fullres),
        ("current (boxmean)", v_current),
        ("rows-then-cols", v_boxmean_rows_then_cols),
        ("downsample-first", v_down_first),
        ("down-bitcast", v_down_bitcast),
    ]:
        s = bench(fn, reps)
        print(f"{name:20s} {1e6 * s / FRAMES:8.2f} us/frame", flush=True)


if __name__ == "__main__":
    main()
