"""Counter-based, stateless RNG for path tracing on TPU.

The reference uses a serial per-path mutable 32-bit Wang-hash seed
(reference: src/random.cl:7-22, seeded seed=gid at src/wf_reset.cl:59). That
design is wrong for TPU + differentiability: path-replay backprop must re-draw
the exact same numbers during the backward pass, and lockstep lanes must not
share a serial dependency. We instead hash a 4D counter
(pixel, sample, bounce, stream) with PCG4D (Jarzynski & Olano, JCGT 2020,
"Hash Functions for GPU Rendering") — pure function of the counters, so any
stage can be re-executed bit-exactly.

Stream ids are allocated in `Streams` below, one per decorrelated decision
point per bounce (mirrors the reference's rand() call sites).
"""
from __future__ import annotations

import jax.numpy as jnp

_INV_2_24 = jnp.float32(1.0 / (1 << 24))


class Streams:
    """Decision-point stream ids (per bounce). Keep stable: checkpoint replay
    and gradient replay depend on them."""
    AA_X = 0
    AA_Y = 1
    LENS_R = 2
    LENS_TH = 3
    LIGHT_PICK = 4
    LIGHT_U = 5
    LIGHT_V = 6
    BSDF_U = 7
    BSDF_V = 8
    BSDF_LOBE = 9      # Fresnel lobe / layer choice
    ROULETTE = 10
    LIGHT_AREA_U = 11  # area-light draw when both lights sampled (MK mode)
    LIGHT_AREA_V = 12
    NUM = 16           # stride between bounces


def _pcg4d(v: jnp.ndarray) -> jnp.ndarray:
    """PCG4D hash: (..., 4) uint32 -> (..., 4) uint32."""
    v = v * jnp.uint32(1664525) + jnp.uint32(1013904223)
    x, y, z, w = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    w = w ^ (w >> 16)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return jnp.stack([x, y, z, w], axis=-1)


def _to_unit_float(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> float32 uniform in [0, 1) using the top 24 bits (exact)."""
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * _INV_2_24


def hash4(pixel: jnp.ndarray, sample: jnp.ndarray, bounce: jnp.ndarray,
          stream: jnp.ndarray) -> jnp.ndarray:
    """Raw PCG4D output for 4 broadcastable uint32 counters: (..., 4) uint32."""
    pixel = jnp.asarray(pixel, jnp.uint32)
    sample = jnp.asarray(sample, jnp.uint32)
    bounce = jnp.asarray(bounce, jnp.uint32)
    stream = jnp.asarray(stream, jnp.uint32)
    pixel, sample, bounce, stream = jnp.broadcast_arrays(
        pixel, sample, bounce, stream)
    return _pcg4d(jnp.stack([pixel, sample, bounce, stream], axis=-1))


def uniform(pixel, sample, bounce, stream) -> jnp.ndarray:
    """One float32 uniform in [0,1) per counter tuple."""
    return _to_unit_float(hash4(pixel, sample, bounce, stream)[..., 0])


def uniform2(pixel, sample, bounce, stream) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two independent uniforms per counter tuple (one hash)."""
    h = hash4(pixel, sample, bounce, stream)
    return _to_unit_float(h[..., 0]), _to_unit_float(h[..., 1])


def uniform4(pixel, sample, bounce, stream):
    """Four independent uniforms per counter tuple (one hash)."""
    h = hash4(pixel, sample, bounce, stream)
    return tuple(_to_unit_float(h[..., i]) for i in range(4))
