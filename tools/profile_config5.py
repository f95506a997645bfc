#!/usr/bin/env python
"""Knock-out profile of config5's VIDEO pipeline (the stage costs behind
the ~1.2k x full-session number).

Each variant slope-times 30-frame batches of progressively fewer stages;
successive differences attribute cost per stage per frame.  Run on the
real chip: python tools/profile_config5.py [reps]
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

    from mixlab_tpu.video.blend import crossfade_xla
    from mixlab_tpu.video.colorspace import rgb_to_yuv420
    from mixlab_tpu.video.pattern import gradient_rgb
    from mixlab_tpu.video.scale import resize_plane

    FRAMES = 30

    def stage_pattern(i):
        rgb = gradient_rgb(960, 540, t=i)
        return (jnp.sum(rgb.astype(jnp.uint32)),)

    def stage_yuv(i):
        rgb = gradient_rgb(960, 540, t=i)
        y, u, v = rgb_to_yuv420(rgb)
        return y, u, v

    def stage_resize(i):
        y, u, v = stage_yuv(i)
        return (
            resize_plane(y, 1080, 1920),
            resize_plane(u, 540, 960),
            resize_plane(v, 540, 960),
        )

    def stage_full(i):
        y1, u, v = stage_resize(i)
        y2 = crossfade_xla(y1, jnp.roll(y1, 1, axis=0), 128)
        return y2, u, v

    def stage_xfade_only(i):
        # crossfade WITHOUT resize: isolates the blend at 1080p using a
        # broadcast-from-540p y (upsample by repeat, not matmul)
        y, u, v = stage_yuv(i)
        y1 = jnp.repeat(jnp.repeat(y, 2, axis=0), 2, axis=1)
        y2 = crossfade_xla(y1, jnp.roll(y1, 1, axis=0), 128)
        return y2, u, v

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

        # n = content-seconds of 1080p30
        return timed_slope(make, 2, 10, reps=reps)

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    stages = [
        ("pattern", stage_pattern),
        ("+rgb2yuv", stage_yuv),
        ("+resize", stage_resize),
        ("+xfade(full)", stage_full),
        ("xfade-no-resize", stage_xfade_only),
    ]
    results = {}
    for name, fn in stages:
        s = bench(fn, reps)
        results[name] = s
        print(
            f"{name:18s} {1e6 * s:9.1f} us/content-s  "
            f"({1e6 * s / FRAMES:7.2f} us/frame, {1.0/s:7.0f} x)",
            flush=True,
        )
    print("\nstage deltas (us/frame):")
    order = ["pattern", "+rgb2yuv", "+resize", "+xfade(full)"]
    prev = 0.0
    for name in order:
        cur = 1e6 * results[name] / FRAMES
        print(f"  {name:14s} +{cur - prev:7.2f}")
        prev = cur


if __name__ == "__main__":
    main()
