"""Device-side environment-map ops: direction mapping, bilinear eval,
alias-method sampling, pdf queries (reference: src/env_map.cl).

The lat-long convention is the USC HighResProbes mapping
(u = 1 + atan2(x, -z)/π mapped to [0,1], v = acos(y/|dir|)/π), identical to
the reference so .hdr assets and states render the same. The image is a
differentiable input (inverse-rendering of emission).
"""
from __future__ import annotations

import jax.numpy as jnp

from fluctus_tpu.core import vecmath as vm
from fluctus_tpu.core.types import EnvMap

PI = jnp.float32(jnp.pi)
TWO_PI2 = jnp.float32(2.0 * jnp.pi * jnp.pi)


def direction_to_uv(d: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 2) uv in [0,1]² (reference: src/env_map.cl:14-25)."""
    u = (1.0 + jnp.arctan2(d[..., 0], -d[..., 2]) / PI) * 0.5
    r = jnp.clip(d[..., 1] / jnp.maximum(vm.length(d), 1e-20), -1.0, 1.0)
    v = jnp.arccos(r) / PI
    zero = vm.is_zero(d)
    return jnp.stack([jnp.where(zero, 0.0, u), jnp.where(zero, 0.0, v)],
                     axis=-1)


def uv_to_direction(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(...,) uv -> (..., 3) unit dir (reference: src/env_map.cl:29-38)."""
    phi = v * PI
    theta = (u * 2.0 - 1.0) * PI
    sin_phi, cos_phi = jnp.sin(phi), jnp.cos(phi)
    sin_th, cos_th = jnp.sin(theta), jnp.cos(theta)
    return jnp.stack([sin_phi * sin_th, cos_phi, -sin_phi * cos_th], axis=-1)


def eval_uv(env: EnvMap, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear lookup at float uv (CLK_FILTER_LINEAR + clamp-to-edge parity,
    reference: src/env_map.cl:7-10,45-48)."""
    h, w = env.image.shape[:2]
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.clip(jnp.floor(x), 0, w - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, h - 1).astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
    img = env.image
    c00 = img[y0, x0]
    c01 = img[y0, x1]
    c10 = img[y1, x0]
    c11 = img[y1, x1]
    return ((c00 * (1 - fx) + c01 * fx) * (1 - fy)
            + (c10 * (1 - fx) + c11 * fx) * fy)


def eval_dir(env: EnvMap, d: jnp.ndarray) -> jnp.ndarray:
    """Li in direction d (reference: src/env_map.cl:39-43)."""
    uv = direction_to_uv(d)
    return eval_uv(env, uv[..., 0], uv[..., 1])


def sample_alias(env: EnvMap, u_rnd: jnp.ndarray):
    """O(1) alias-method sample of the flat image distribution.

    Returns (L (..,3) unit, pdf_w (..,)) — reference: src/env_map.cl:65-92."""
    h, w = env.image.shape[:2]
    n = w * h
    r = u_rnd * n
    i = jnp.minimum(jnp.floor(r).astype(jnp.int32), n - 1)
    frac = r - i
    take_self = frac < env.prob_table[i]
    uv_ind = jnp.where(take_self, i, env.alias_table[i])
    pdf_uv = env.pdf_table[uv_ind]

    u_ind = uv_ind % w
    v_ind = uv_ind // w
    u = (u_ind.astype(jnp.float32) + 0.5) / w
    v = (v_ind.astype(jnp.float32) + 0.5) / h
    L = uv_to_direction(u, v)
    sin_th = jnp.sin(PI * v)
    pdf_w = jnp.where(sin_th != 0.0,
                      pdf_uv / (TWO_PI2 * jnp.maximum(sin_th, 1e-20)), 0.0)
    return L, pdf_w


def sample_alias_radiance(env: EnvMap, u_rnd: jnp.ndarray):
    """sample_alias + the radiance of the sampled texel in one pass.

    NEE needs Li in the sampled direction; a bilinear eval_dir() at the
    texel-center direction reduces to the texel value itself (fx = fy = 0),
    so the 4-corner gather plus the atan2/acos direction->uv roundtrip is
    redundant — and the texel value is the radiance the alias pdf was
    built from, so the estimator is exactly consistent. Returns
    (L unit (..,3), pdf_w (..,), radiance (..,3))."""
    h, w = env.image.shape[:2]
    n = w * h
    r = u_rnd * n
    i = jnp.minimum(jnp.floor(r).astype(jnp.int32), n - 1)
    frac = r - i
    take_self = frac < env.prob_table[i]
    uv_ind = jnp.where(take_self, i, env.alias_table[i])
    pdf_uv = env.pdf_table[uv_ind]
    rad = env.image.reshape(n, 3)[uv_ind]

    u_ind = uv_ind % w
    v_ind = uv_ind // w
    u = (u_ind.astype(jnp.float32) + 0.5) / w
    v = (v_ind.astype(jnp.float32) + 0.5) / h
    L = uv_to_direction(u, v)
    sin_th = jnp.sin(PI * v)
    pdf_w = jnp.where(sin_th != 0.0,
                      pdf_uv / (TWO_PI2 * jnp.maximum(sin_th, 1e-20)), 0.0)
    return L, pdf_w, rad


def pdf_dir(env: EnvMap, d: jnp.ndarray) -> jnp.ndarray:
    """pdf_w of sampling direction d — MIS query
    (reference: src/env_map.cl:95-107)."""
    h, w = env.image.shape[:2]
    uv = direction_to_uv(d)
    sin_th = jnp.sin(uv[..., 1] * PI)
    iu = jnp.minimum(jnp.floor(uv[..., 0] * w).astype(jnp.int32), w - 1)
    iv = jnp.minimum(jnp.floor(uv[..., 1] * h).astype(jnp.int32), h - 1)
    pdf = env.pdf_table[iv * w + iu] / (TWO_PI2 * jnp.maximum(sin_th, 1e-20))
    return jnp.where(sin_th == 0.0, 0.0, pdf)
