"""GGX microfacet helpers with Smith shadowing-masking, batched + differentiable.

Math parity with reference src/ggx.cl (Walter et al. 2007 "Microfacet Models
for Refraction"): same D, G1, pdf Jacobians and Phong-exponent->alpha mapping,
re-derived branch-free for the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp

from fluctus_tpu.core import vecmath as vm

PI = jnp.float32(jnp.pi)


def phong_to_alpha(ns: jnp.ndarray) -> jnp.ndarray:
    """Phong exponent -> Beckmann/GGX alpha: sqrt(2/(2+Ns))
    (reference: src/ggx.cl:13-15)."""
    return jnp.sqrt(2.0 / (2.0 + jnp.maximum(ns, 0.0)))


def g1(alpha, v, n, m):
    """Unidirectional Smith masking (eq. 34; reference: src/ggx.cl:39-53)."""
    m_dot_v = vm.dot(m, v)
    n_dot_v = vm.dot(n, v)
    cos_sq = n_dot_v * n_dot_v
    tan_sq = jnp.where(cos_sq > 0.0, (1.0 - cos_sq) / jnp.maximum(cos_sq, 1e-20), 0.0)
    val = 2.0 / (1.0 + jnp.sqrt(1.0 + alpha * alpha * tan_sq))
    return jnp.where(n_dot_v * m_dot_v <= 0.0, 0.0, val)


def g_smith(alpha, wi_out, wo, n, m):
    """Bidirectional Smith G (reference: src/ggx.cl:56-60). `wi_out` points
    away from the surface."""
    return g1(alpha, wi_out, n, m) * g1(alpha, wo, n, m)


def d_ggx(alpha, n, m):
    """GGX/GTR2 microfacet distribution (eq. 33; reference: src/ggx.cl:63-77)."""
    n_dot_m = vm.dot(n, m)
    n_dot_m_sq = n_dot_m * n_dot_m
    tan_sq = jnp.where(n_dot_m != 0.0,
                       (1.0 - n_dot_m_sq) / jnp.maximum(n_dot_m_sq, 1e-20), 0.0)
    a_sq = alpha * alpha
    denom = PI * n_dot_m_sq * n_dot_m_sq * (a_sq + tan_sq) ** 2
    val = jnp.where(denom > 0.0, a_sq / jnp.maximum(denom, 1e-30), 0.0)
    return jnp.where(n_dot_m <= 0.0, 0.0, val)


def pdf_reflect(alpha, wo, n, h):
    """pdf of sampling `wo` by half-vector reflection (eq. 24+14;
    reference: src/ggx.cl:80-87)."""
    n_dot_h = jnp.abs(vm.dot(n, h))
    o_dot_h = jnp.abs(vm.dot(wo, h))
    j_inv = 4.0 * o_dot_h
    return jnp.where(j_inv == 0.0, 0.0,
                     d_ggx(alpha, n, h) * n_dot_h / jnp.maximum(j_inv, 1e-20))


def pdf_refract(alpha, eta_i, eta_o, wi_out, wo, n, h):
    """pdf of sampling `wo` by half-vector refraction (eq. 24+17;
    reference: src/ggx.cl:148-156)."""
    n_dot_h = jnp.abs(vm.dot(n, h))
    i_dot_h = jnp.abs(vm.dot(wi_out, h))
    o_dot_h = jnp.abs(vm.dot(wo, h))
    sqrt_j_inv = eta_i * i_dot_h + eta_o * o_dot_h
    val = d_ggx(alpha, n, h) * n_dot_h * o_dot_h * eta_o * eta_o \
        / jnp.maximum(sqrt_j_inv * sqrt_j_inv, 1e-20)
    return jnp.where(sqrt_j_inv == 0.0, 0.0, val)
