"""Separable bicubic rescale as two MXU matmuls + letterbox compose.

Reference: ``DynamicScaler`` (``src/video/encode.rs:310-398``) wraps
swscale's BICUBIC with aspect-preserving letterbox into a chroma-aligned
subframe.  Bit parity with swscale is impractical (SURVEY §7); the TPU build
reimplements the same geometry with a Mitchell–Netravali bicubic (B=0,
C=0.6 — swscale's default bicubic parameterization) as a *dense separable
resample*:

    out = clip(round(W_h @ in @ W_w^T))

where W_h [H_out, H_in] and W_w [W_out, W_in] are precomputed host-side and
cached per (in, out) size pair.  Two matmuls per plane → the MXU does the
work; u8 planes are widened to f32 on the way in and rounded back on the way
out (XLA fuses the casts into the matmuls).

Letterbox geometry matches encode.rs:354-396: integer scale ratio
min(w_ratio, h_ratio) (exact rational compare), chroma-aligned scaled size
and offsets, surrounding pixels black/0x80.
"""

from __future__ import annotations

import functools
from fractions import Fraction
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from mixlab_tpu.video.frame import YUV420P, Picture, PictureSettings


def _mitchell(x: np.ndarray, B: float = 0.0, C: float = 0.6) -> np.ndarray:
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax < 1.0,
        ((12 - 9 * B - 6 * C) * ax3 + (-18 + 12 * B + 6 * C) * ax2 + (6 - 2 * B)) / 6.0,
        np.where(
            ax < 2.0,
            ((-B - 6 * C) * ax3 + (6 * B + 30 * C) * ax2 + (-12 * B - 48 * C) * ax + (8 * B + 24 * C)) / 6.0,
            0.0,
        ),
    )
    return w


@functools.lru_cache(maxsize=256)
def resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] f32 bicubic resample matrix (edge-clamped, rows
    normalized to sum 1)."""
    scale = n_in / n_out
    # source center positions for each output pixel
    pos = (np.arange(n_out, dtype=np.float64) + 0.5) * scale - 0.5
    # widen the kernel when minifying (standard anti-aliased resample)
    support = 2.0 * max(scale, 1.0)
    kscale = min(1.0, 1.0 / scale) if scale > 1.0 else 1.0
    W = np.zeros((n_out, n_in), dtype=np.float64)
    for o in range(n_out):
        lo = int(np.floor(pos[o] - support)) + 1
        hi = int(np.ceil(pos[o] + support))
        idx = np.arange(lo, hi + 1)
        w = _mitchell((idx - pos[o]) * kscale)
        cidx = np.clip(idx, 0, n_in - 1)
        for i, wi in zip(cidx, w):
            W[o, i] += wi
    W /= W.sum(axis=1, keepdims=True)
    return W.astype(np.float32)


@functools.lru_cache(maxsize=256)
def _phase_taps(n_in: int, n_out: int):
    """For exact integer upscales (n_out = r*n_in) the dense resize matrix is
    r shifted copies of per-phase tap vectors.  Returns (r, lo, taps[r, J])
    or None when not an integer upscale.  Edge clamping in the dense matrix
    equals replicate padding here, so results match."""
    if n_out % n_in != 0 or n_out == n_in:
        return None
    r = n_out // n_in
    scale = n_in / n_out
    pos0 = (np.arange(r, dtype=np.float64) + 0.5) * scale - 0.5  # phase offsets
    lo = int(np.floor(pos0.min())) - 1
    hi = int(np.ceil(pos0.max())) + 2
    offsets = np.arange(lo, hi + 1)
    taps = _mitchell(offsets[None, :] - pos0[:, None])
    taps /= taps.sum(axis=1, keepdims=True)
    return r, lo, taps.astype(np.float32)


def _upscale_axis(x, n_out: int, axis: int):
    """Polyphase integer-ratio upscale along ``axis`` — pure shifts and
    multiply-adds (VPU), ~J FLOPs/output instead of an n_in-wide matmul."""
    n_in = x.shape[axis]
    r, lo, taps = _phase_taps(n_in, n_out)
    J = taps.shape[1]
    pad_lo = max(0, -lo)
    pad_hi = max(0, lo + J - 1)
    pad_spec = [(0, 0)] * x.ndim
    pad_spec[axis] = (pad_lo, pad_hi)
    xp = jnp.pad(x, pad_spec, mode="edge")

    phases = []
    for p in range(r):
        acc = None
        for j in range(J):
            start = pad_lo + lo + j
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(start, start + n_in)
            term = taps[p, j] * xp[tuple(sl)]
            acc = term if acc is None else acc + term
        phases.append(acc)
    stacked = jnp.stack(phases, axis=axis + 1)  # n_in then r on that axis
    new_shape = list(x.shape)
    new_shape[axis] = n_out
    return stacked.reshape(new_shape)


def resize_plane(plane, out_h: int, out_w: int):
    """Bicubic resize of a [H, W] u8 plane via two dense matmuls.

    NOTE: a polyphase shift/MAC fast path for integer upscales exists above
    (:func:`_upscale_axis`) but measured SLOWER on TPU (config5 422x -> 162x):
    the J*r shifted elementwise terms are HBM-bound while the dense matmul
    rides the MXU.  The fast path is kept for CPU-bound uses and as the
    seed of a fused Pallas resize kernel."""
    in_h, in_w = plane.shape
    x = plane.astype(jnp.float32)
    # default (bf16-input) MXU precision: outputs are 8-bit pixels (<=1 LSB
    # effect); HIGHEST measured 4.7x slower at 1080p
    if in_h != out_h:
        Wh = jnp.asarray(resize_matrix(in_h, out_h))
        x = jnp.einsum("oi,iw->ow", Wh, x, preferred_element_type=jnp.float32)
    if in_w != out_w:
        Ww = jnp.asarray(resize_matrix(in_w, out_w))
        x = jnp.einsum("hw,ow->ho", x, Ww, preferred_element_type=jnp.float32)
    return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)


def letterbox_geometry(
    inp: PictureSettings, out: PictureSettings
) -> Tuple[int, int, int, int]:
    """(x, y, scaled_w, scaled_h) of the content box (encode.rs:354-377)."""
    width_ratio = Fraction(out.width, inp.width)
    height_ratio = Fraction(out.height, inp.height)
    scale = min(width_ratio, height_ratio)
    scaled_w = out.align_horizontal(int(scale * inp.width))
    scaled_h = out.align_vertical(int(scale * inp.height))
    x = out.align_horizontal((out.width - scaled_w) // 2)
    y = out.align_vertical((out.height - scaled_h) // 2)
    return x, y, scaled_w, scaled_h


def scale_picture(pic: Picture, out: PictureSettings) -> Picture:
    """Scale + letterbox a yuv420p picture into ``out`` settings."""
    if pic.settings == out:
        return pic
    assert pic.settings.pixel_format == YUV420P == out.pixel_format
    x, y, sw, sh = letterbox_geometry(pic.settings, out)
    base = Picture.blank(out)
    planes = {}
    for name, (sub_x, sub_y) in (("y", (0, 0)), ("u", (1, 1)), ("v", (1, 1))):
        ph = sh >> sub_y
        pw = sw >> sub_x
        scaled = resize_plane(pic.planes[name], ph, pw)
        canvas = base.planes[name]
        py, px = y >> sub_y, x >> sub_x
        planes[name] = canvas.at[py : py + ph, px : px + pw].set(scaled)
    return Picture(out, planes)
