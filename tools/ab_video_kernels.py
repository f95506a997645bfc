#!/usr/bin/env python
"""A/B the config5 video stage variants on chip.

The stage knock-out profile (tools/profile_config5.py) showed rgb2yuv at
~33 us/frame and crossfade+roll at ~31 us/frame — both elementwise u8
stages running 4-12x off the HBM roofline — while the s8 MXU resize costs
~2 us.  Hypotheses measured here:

  * interleaved [H, W, 3] RGB (stride-3 lane slices + a stack that XLA
    does not fuse away) vs channel-major (r, g, b) planes;
  * crossfade_xla (u32 jnp) vs crossfade_pallas, with and without the
    jnp.roll input.

Run on the real chip: python tools/ab_video_kernels.py [reps]
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

    from mixlab_tpu.video.blend import crossfade_pallas, crossfade_xla
    from mixlab_tpu.video.colorspace import rgb_planes_to_yuv420, rgb_to_yuv420
    from mixlab_tpu.video.pattern import gradient_planes, gradient_rgb
    from mixlab_tpu.video.scale import resize_plane

    FRAMES = 30

    def v_interleaved(i):
        rgb = gradient_rgb(960, 540, t=i)
        return rgb_to_yuv420(rgb)

    def v_planar(i):
        r, g, b = gradient_planes(960, 540, t=i)
        return rgb_planes_to_yuv420(r, g, b)

    rng = np.random.default_rng(0)
    y1080a = jnp.asarray(rng.integers(0, 256, (1080, 1920), dtype=np.uint8))

    def v_xfade_xla(i):
        y = y1080a + i.astype(jnp.uint8)  # defeat CSE across frames
        return (crossfade_xla(y, jnp.roll(y, 1, axis=0), 128),)

    def v_xfade_pallas(i):
        y = y1080a + i.astype(jnp.uint8)
        return (crossfade_pallas(y, jnp.roll(y, 1, axis=0), 128),)

    def v_xfade_xla_noroll(i):
        y = y1080a + i.astype(jnp.uint8)
        return (crossfade_xla(y, y1080a, 128),)

    def v_full_planar(i):
        y, u, v = v_planar(i)
        y1 = resize_plane(y, 1080, 1920)
        y2 = crossfade_xla(y1, jnp.roll(y1, 1, axis=0), 128)
        return y2, resize_plane(u, 540, 960), resize_plane(v, 540, 960)

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
        ("yuv interleaved", v_interleaved),
        ("yuv planar", v_planar),
        ("xfade xla+roll", v_xfade_xla),
        ("xfade pallas+roll", v_xfade_pallas),
        ("xfade xla no-roll", v_xfade_xla_noroll),
        ("full planar", v_full_planar),
    ]:
        s = bench(fn, reps)
        print(
            f"{name:18s} {1e6 * s / FRAMES:8.2f} us/frame  "
            f"({1.0/s:7.0f} x as 1080p30)",
            flush=True,
        )


if __name__ == "__main__":
    main()
