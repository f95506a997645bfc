"""Test-pattern video sources (device-generated).

The reference has no built-in pattern generator (sources are ingest/media);
the benchmark configs require synthetic 720p sources (BASELINE config 4:
"two 720p test-pattern sources alpha-composited").  These render directly on
device as cheap elementwise math so the compositing bench isn't bottlenecked
by host frame upload.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mixlab_tpu.video.colorspace import rgb_to_yuv420
from mixlab_tpu.video.frame import RGB24, YUV420P, Picture, PictureSettings

# classic 75% SMPTE bar colors (RGB)
_BARS = np.array(
    [
        [191, 191, 191],
        [191, 191, 0],
        [0, 191, 191],
        [0, 191, 0],
        [191, 0, 191],
        [191, 0, 0],
        [0, 0, 191],
    ],
    dtype=np.uint8,
)


def smpte_bars_rgb(width: int, height: int, phase: int = 0):
    """[H, W, 3] u8 color bars, horizontally rotated by ``phase`` pixels."""
    col = (jnp.arange(width) + phase) % width
    bar = (col * 7) // width
    rgb = jnp.asarray(_BARS)[bar]  # [W, 3]
    return jnp.broadcast_to(rgb[None, :, :], (height, width, 3))


def gradient_planes(width: int, height: int, t: int = 0):
    """Moving diagonal gradient as channel-major (r, g, b) u8 planes —
    the native layout (see colorspace.rgb_planes_to_yuv420)."""
    xx = jnp.arange(width, dtype=jnp.int32)[None, :]
    yy = jnp.arange(height, dtype=jnp.int32)[:, None]
    r = ((xx + t) % 256).astype(jnp.uint8)
    g = ((yy + 2 * t) % 256).astype(jnp.uint8)
    b = ((xx + yy + 3 * t) % 256).astype(jnp.uint8)
    return (
        jnp.broadcast_to(r, (height, width)),
        jnp.broadcast_to(g, (height, width)),
        b,
    )


def gradient_rgb(width: int, height: int, t: int = 0):
    """Moving diagonal gradient; ``t`` animates it."""
    r, g, b = gradient_planes(width, height, t)
    return jnp.stack([r, g, b], axis=-1)


def smpte_bars_planes(width: int, height: int, phase: int = 0):
    """SMPTE bars as channel-major (r, g, b) u8 planes."""
    col = (jnp.arange(width) + phase) % width
    bar = (col * 7) // width
    rgb = jnp.asarray(_BARS)[bar]  # [W, 3]
    return tuple(
        jnp.broadcast_to(rgb[:, c][None, :], (height, width)) for c in range(3)
    )


def pattern_picture(
    kind: str, width: int, height: int, t: int = 0, pixel_format: str = YUV420P
) -> Picture:
    if kind == "bars":
        rgb = smpte_bars_rgb(width, height, phase=t)
    elif kind == "gradient":
        rgb = gradient_rgb(width, height, t=t)
    else:
        raise ValueError(kind)
    if pixel_format == RGB24:
        return Picture(PictureSettings(width, height, RGB24), {"rgb": rgb})
    y, u, v = rgb_to_yuv420(rgb)
    return Picture(
        PictureSettings(width, height, YUV420P), {"y": y, "u": u, "v": v}
    )
