"""Batched ray-primitive intersection (reference: src/intersect.cl).

Everything is written to broadcast over arbitrary leading batch dims so the
same code serves the traversal inner loop ((B, K) ray-x-leaf-triangle tests),
the CPU oracle, and the picking path (single ray).
"""
from __future__ import annotations

import jax.numpy as jnp

from fluctus_tpu.core import vecmath as vm

TRI_EPS = jnp.float32(1e-12)


def ray_aabb(orig, inv_dir, lo, hi, t_max):
    """Slab test. Returns (hit, tmin) where hit means the box is intersected
    in front of the ray and not behind the current best hit
    (reference: src/intersect.cl:41-60)."""
    t0 = (lo - orig) * inv_dir
    t1 = (hi - orig) * inv_dir
    tminv = jnp.minimum(t0, t1)
    tmaxv = jnp.maximum(t0, t1)
    tmin = jnp.max(tminv, axis=-1)
    tmax = jnp.min(tmaxv, axis=-1)
    hit = (tmax >= 0.0) & (tmin <= tmax) & (tmin < t_max)
    return hit, tmin


def ray_triangle(orig, dir, v0, v1, v2):
    """Möller-Trumbore (reference: src/intersect.cl:63-93).

    Returns (t, u, v, valid). Inputs broadcast; orig/dir vs v0/v1/v2 must be
    broadcast-compatible on the last-but-one dims."""
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = vm.cross(dir, e2)
    det = vm.dot(e1, pvec)
    valid = jnp.abs(det) >= TRI_EPS
    inv_det = 1.0 / jnp.where(valid, det, 1.0)
    tvec = orig - v0
    u = vm.dot(tvec, pvec) * inv_det
    qvec = vm.cross(tvec, e1)
    v = vm.dot(dir, qvec) * inv_det
    t = vm.dot(e2, qvec) * inv_det
    valid = valid & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0) \
        & (t >= 0.0)
    return t, u, v, valid


def ray_area_light(orig, dir, light_pos, light_right, light_up, light_normal,
                   light_size, t_best):
    """Intersect the rectangular area light quad; backside hits rejected
    (reference: src/intersect.cl:124-155 intersectLight). Returns
    (hit_mask, t). Implemented as a direct plane+extent test instead of two
    triangle tests — same quad, fewer ops."""
    denom = vm.dot(dir, light_normal)
    front = denom < 0.0  # reject backside (dot(dir, N) > 0) and grazing
    t = vm.dot(light_pos - orig, light_normal) / jnp.where(denom != 0.0, denom, 1.0)
    p = orig + t[..., None] * dir
    d = p - light_pos
    lu = vm.dot(d, vm.normalize(light_right))
    lv = vm.dot(d, vm.normalize(light_up))
    sx = light_size[..., 0] * vm.length(light_right)
    sy = light_size[..., 1] * vm.length(light_up)
    hit = front & (denom != 0.0) & (t > 0.0) & (t < t_best) \
        & (jnp.abs(lu) <= sx) & (jnp.abs(lv) <= sy)
    return hit, t
