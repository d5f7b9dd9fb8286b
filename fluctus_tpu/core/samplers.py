"""Batched low-level sampling routines (reference: src/utils.cl:62-112).

All functions take pre-drawn uniforms (from core.rng) instead of mutating a
seed, so forward and backward (path-replay) passes draw identical numbers.
"""
from __future__ import annotations

import jax.numpy as jnp

from fluctus_tpu.core import vecmath as vm

PI = jnp.float32(jnp.pi)
TWO_PI = jnp.float32(2.0 * jnp.pi)
INV_PI = jnp.float32(1.0 / jnp.pi)


def uniform_disk(u1: jnp.ndarray, u2: jnp.ndarray):
    """Uniform point on unit disk (reference: src/utils.cl:75-80)."""
    r = jnp.sqrt(u1)
    th = TWO_PI * u2
    return r * jnp.cos(th), r * jnp.sin(th)


def cosine_hemisphere(n: jnp.ndarray, u1: jnp.ndarray, u2: jnp.ndarray):
    """Cosine-weighted hemisphere sample around unit normal `n`.

    Returns (dir (..,3), pdf (..,) = cosθ/π).
    Behavioral parity with reference src/utils.cl:83-112 (different ortho
    basis, same distribution)."""
    t, b = vm.ortho_basis(n)
    phi = TWO_PI * u1
    r2s = jnp.sqrt(u2)
    x = jnp.cos(phi) * r2s
    y = jnp.sin(phi) * r2s
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u2))
    d = t * x[..., None] + b * y[..., None] + n * z[..., None]
    pdf = jnp.maximum(vm.dot(n, d), 0.0) * INV_PI
    return d, pdf


def ggx_sample_half_vector(alpha: jnp.ndarray, n: jnp.ndarray,
                           u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Importance-sample the GGX normal distribution: returns half-vector H.

    Walter et al. 2007 eq. 35-36 (reference: src/ggx.cl:18-35):
      θ_m = atan(α √u1 / √(1-u1)),  φ_m = 2π u2
    implemented via cosθ = √((1-u1)/(1-u1+α²u1)) — same distribution, no
    trig round-trip through atan."""
    a2 = alpha * alpha
    denom = 1.0 + (a2 - 1.0) * u1  # = (1-u1) + a2*u1
    cos_t = jnp.sqrt(jnp.maximum(0.0, (1.0 - u1) / jnp.maximum(denom, 1e-20)))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = TWO_PI * u2
    t, b = vm.ortho_basis(n)
    h = (t * (sin_t * jnp.cos(phi))[..., None]
         + b * (sin_t * jnp.sin(phi))[..., None]
         + n * cos_t[..., None])
    return vm.normalize(h)


def sample_area_light(pos, right, up, half_size, u1, u2):
    """Uniform point on rectangular light; returns (point, pdf_area)
    (reference: src/utils.cl:226-234)."""
    pdf_a = 1.0 / (4.0 * half_size[..., 0] * half_size[..., 1])
    r1 = 2.0 * u1 - 1.0
    r2 = 2.0 * u2 - 1.0
    p = (pos + (r1 * half_size[..., 0])[..., None] * right
         + (r2 * half_size[..., 1])[..., None] * up)
    return p, pdf_a


def pdf_area_to_solid_angle(pdf_a, dist, cos_there):
    """Area measure -> solid-angle measure (reference: src/utils.cl:244-247)."""
    return pdf_a * dist * dist / jnp.maximum(jnp.abs(cos_there), 1e-12)
