"""On-chip A/B: rgb_to_yuv420 (interleaved, mean-after) vs
rgb_planes_to_yuv420_downfirst (planar, integer box-sum first) at config5's
frame geometry, inside the same vmap'd 30-frame batches config5 uses."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import timed_slope
from mixlab_tpu.video.colorspace import (
    rgb_planes_to_yuv420_downfirst,
    rgb_to_yuv420,
)
from mixlab_tpu.video.pattern import gradient_planes, gradient_rgb

FRAMES = 30


def make_maker(frame_fn):
    def make(n):
        def whole(_):
            def one(i):
                y, u, v = frame_fn(i)
                return (jnp.sum(y.astype(jnp.uint32))
                        + jnp.sum(u.astype(jnp.uint32))
                        + jnp.sum(v.astype(jnp.uint32)))

            return jnp.sum(jax.vmap(one)(jnp.arange(n * FRAMES,
                                                    dtype=jnp.int32)))

        f = jax.jit(whole)
        return lambda: f(0)

    return make


def interleaved(i):
    return rgb_to_yuv420(gradient_rgb(960, 540, t=i))


def downfirst(i):
    r, g, b = gradient_planes(960, 540, t=i)
    return rgb_planes_to_yuv420_downfirst(r, g, b)


def main():
    for name, fn in (("interleaved", interleaved), ("downfirst", downfirst),
                     ("interleaved2", interleaved), ("downfirst2", downfirst)):
        spc = timed_slope(make_maker(fn), 2, 12, reps=3)
        print(f"{name:14s} {spc * 1e6:9.1f} us/content-s "
              f"({spc / FRAMES * 1e6:7.2f} us/frame)")


if __name__ == "__main__":
    main()
