"""Batched 3-vector math on (..., 3) float32 arrays.

TPU-first counterpart of the reference's device-side helpers
(reference: src/utils.cl:30-59, src/include/math/float3.hpp) — everything is
written batched so the VPU sees wide elementwise ops, never per-ray scalars.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-12


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the last axis; keeps no dims: (...,3)->(...)."""
    return jnp.sum(a * b, axis=-1)


def dot3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot, keepdims for broadcasting against (...,3)."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def normalize(a: jnp.ndarray) -> jnp.ndarray:
    """Safe normalize; zero vectors stay zero."""
    n2 = dot3(a, a)
    inv = jnp.where(n2 > 0.0, 1.0 / jnp.sqrt(jnp.maximum(n2, EPS)), 0.0)
    return a * inv


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflect direction `d` about normal `n` (d points toward surface).

    reference: src/utils.cl:30-33."""
    return d - 2.0 * dot3(d, n) * n


def refract(wi: jnp.ndarray, n: jnp.ndarray, eta: jnp.ndarray) -> jnp.ndarray:
    """Refract `wi` (pointing toward surface) through normal `n` with eta=n1/n2.

    Returns the un-normalized transmitted direction; on total internal
    reflection the result is degenerate (caller guards via Fresnel==1).
    reference: src/utils.cl:36-43."""
    eta = jnp.asarray(eta)[..., None] if jnp.ndim(eta) < jnp.ndim(wi) else eta
    i_dot_n = dot3(-wi, n)
    sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - i_dot_n * i_dot_n)
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    return wi * eta + n * (eta * i_dot_n - cos_t)


def ortho_basis(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build (t, b) orthonormal to unit `n`, batched and branch-free.

    Uses the Duff et al. 2017 branchless construction (numerically robust,
    unlike the reference's component-comparison variant at src/utils.cl:50-59
    which we deliberately do not replicate — only orthonormality matters).
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t = jnp.stack([1.0 + sign * nx * nx * a, sign * b, -sign * nx], axis=-1)
    bt = jnp.stack([b, sign + ny * ny * a, -ny], axis=-1)
    return t, bt


def luminance(c: jnp.ndarray) -> jnp.ndarray:
    """sRGB luminance (reference: src/utils.cl:237-240)."""
    return 0.212671 * c[..., 0] + 0.715160 * c[..., 1] + 0.072169 * c[..., 2]


def is_zero(v: jnp.ndarray) -> jnp.ndarray:
    """True where the 3-vector is exactly zero (reference: src/utils.cl:21-24)."""
    return jnp.all(v == 0.0, axis=-1)


def where3(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Select (...,3) vectors with a (...,) mask."""
    return jnp.where(mask[..., None], a, b)
