"""Edge-avoiding À-trous wavelet denoiser — TPU-native replacement for the
reference's OptiX AI denoiser (src/denoiser/OptixDenoiser.{hpp,cpp}).

The reference wraps NVIDIA's binary denoiser, feeding it the noisy color
plus albedo(+normal) feature buffers and blending the result with the input
(OptixDenoiser.cpp:86-159, blend slider in tracer_ui.cpp). A vendor binary
has no TPU analogue, so this module implements the classic edge-avoiding
À-trous wavelet transform (Dammertz et al., HPG 2010 — the spatial filter
at the core of SVGF): N iterations of a 5x5 B3-spline convolution with
exponentially growing hole size, where each tap is weighted by color,
normal and depth similarity so edges are preserved.

Everything is dense elementwise/shift arithmetic on (H, W, C) arrays —
ideal VPU work; no gathers, no convolutions with dynamic footprints.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# 1D B3-spline kernel; the 5x5 filter is its outer product
_B3 = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _shift2d(img, dy, dx):
    """Shift with edge clamping (replicate border)."""
    h, w = img.shape[0], img.shape[1]
    ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return img[ys][:, xs]


@partial(jax.jit, static_argnames=("iterations",))
def atrous_denoise(color: jnp.ndarray, albedo: jnp.ndarray,
                   normal: jnp.ndarray, depth: jnp.ndarray,
                   iterations: int = 4,
                   sigma_color: float = 1.0,
                   sigma_normal: float = 0.25,
                   sigma_depth: float = 0.05,
                   blend: float = 1.0) -> jnp.ndarray:
    """Denoise a linear-radiance image.

    color: (H, W, 3); albedo: (H, W, 3); normal: (H, W, 3) unit vectors
    (zeros on miss); depth: (H, W) hit distance (scene-scale normalized by
    the caller). blend: 0 = passthrough, 1 = fully denoised (reference:
    denoiser blend slider, tracer_ui.cpp)."""
    # demodulate albedo so texture detail is not blurred (standard practice;
    # the OptiX denoiser gets albedo as a guide for the same reason)
    alb = jnp.maximum(albedo, 1e-3)
    out = color / alb

    for it in range(iterations):
        step = 1 << it
        acc = jnp.zeros_like(out)
        wsum = jnp.zeros(out.shape[:2] + (1,), out.dtype)
        for j in range(5):
            for i in range(5):
                dy = (j - 2) * step
                dx = (i - 2) * step
                k = _B3[j] * _B3[i]
                c = _shift2d(out, dy, dx)
                n = _shift2d(normal, dy, dx)
                d = _shift2d(depth, dy, dx)
                w_c = jnp.exp(-jnp.sum((c - out) ** 2, axis=-1)
                              / (sigma_color ** 2 * step))
                w_n = jnp.exp(-jnp.maximum(
                    0.0, 1.0 - jnp.sum(n * normal, axis=-1))
                    / sigma_normal)
                w_d = jnp.exp(-jnp.abs(d - depth) / sigma_depth)
                w = (k * w_c * w_n * w_d)[..., None]
                acc = acc + w * c
                wsum = wsum + w
        out = acc / jnp.maximum(wsum, 1e-8)

    out = out * alb
    return blend * out + (1.0 - blend) * color
