"""Postprocess: sample-divide, exposure, tonemapping, gamma
(reference: src/mk_postprocess.cl:7-55, src/tonemap.cl:3-27).
"""
from __future__ import annotations

import jax.numpy as jnp

TM_LINEAR, TM_REINHARD, TM_UNCHARTED2 = 0, 1, 2


def _uc2_curve(x):
    a, b, c, d, e, f = 0.22, 0.30, 0.10, 0.20, 0.01, 0.30
    return ((x * (a * x + c * b) + d * e) / (x * (a * x + b) + d * f)) - e / f


def uncharted2(color):
    w = 11.2
    exposure_bias = 2.0
    return _uc2_curve(exposure_bias * color) / _uc2_curve(jnp.float32(w))


def reinhard(color):
    return color / (1.0 + color)


def postprocess(radiance: jnp.ndarray, weight: jnp.ndarray, exposure,
                tonemap_op: int) -> jnp.ndarray:
    """(..., 3) accumulated radiance + (...,) sample weight -> display RGB.

    Order matches the reference: divide, exposure, tonemap, gamma 1/2.2."""
    color = radiance / jnp.maximum(weight, 1.0)[..., None]
    color = color * exposure
    if tonemap_op == TM_REINHARD:
        color = reinhard(color)
    elif tonemap_op == TM_UNCHARTED2:
        color = uncharted2(color)
    return jnp.power(jnp.maximum(color, 0.0), 1.0 / 2.2)
