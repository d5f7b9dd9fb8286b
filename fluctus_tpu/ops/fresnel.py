"""Fresnel terms, batched + differentiable (reference: src/fresnel.cl:5-63)."""
from __future__ import annotations

import jax.numpy as jnp


def fresnel_dielectric(cos_i: jnp.ndarray, eta_i: jnp.ndarray,
                       eta_t: jnp.ndarray) -> jnp.ndarray:
    """Exact unpolarized dielectric Fresnel (PBRT p.519;
    reference: src/fresnel.cl:5-20). Returns 1.0 on total internal
    reflection."""
    cos_i = jnp.clip(cos_i, -1.0, 1.0)
    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
    sin_t = eta_i / eta_t * sin_i
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t * sin_t))
    parl = ((eta_t * cos_i) - (eta_i * cos_t)) / \
        jnp.maximum((eta_t * cos_i) + (eta_i * cos_t), 1e-12)
    perp = ((eta_i * cos_i) - (eta_t * cos_t)) / \
        jnp.maximum((eta_i * cos_i) + (eta_t * cos_t), 1e-12)
    f = 0.5 * (parl * parl + perp * perp)
    return jnp.where(sin_t >= 1.0, 1.0, f)


def schlick_dielectric(cos_i, eta_i, eta_t):
    """Schlick approximation (reference: src/fresnel.cl:23-34)."""
    eta = eta_i / eta_t
    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
    r0 = ((1.0 - eta) ** 2) / ((1.0 + eta) ** 2)
    c = 1.0 - jnp.abs(cos_i)
    f = r0 + (1.0 - r0) * c ** 5
    return jnp.where(eta * sin_i >= 1.0, 1.0, f)


def fresnel_conductor(cos_i, eta_i, eta_t, k):
    """RGB conductor Fresnel (PBRT eq. 8.3/8.4;
    reference: src/fresnel.cl:40-63). eta_i/eta_t/k are (..., 3)."""
    cos_i = jnp.clip(cos_i, -1.0, 1.0)[..., None]
    eta = eta_t / eta_i
    etak = k / eta_i
    cos2 = cos_i * cos_i
    sin2 = 1.0 - cos2
    eta2 = eta * eta
    etak2 = etak * etak
    t0 = eta2 - etak2 - sin2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * eta2 * etak2, 0.0))
    t1 = a2b2 + cos2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * cos_i * a
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-12)
    t3 = cos2 * a2b2 + sin2 * sin2
    t4 = t2 * sin2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-12)
    return 0.5 * (rp + rs)
