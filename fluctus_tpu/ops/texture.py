"""Device-side texture fetches from the packed atlas
(reference: src/utils.cl:114-146 readTexture/matGetAlbedo/matGetFloat3 and
:149-182 tangentSpaceNormal).
"""
from __future__ import annotations

import jax.numpy as jnp

from fluctus_tpu.core import vecmath as vm
from fluctus_tpu.core.types import Geometry, TextureAtlas


def fetch_texel(atlas: TextureAtlas, tex_idx: jnp.ndarray, uv: jnp.ndarray):
    """Nearest-texel RGB fetch with wrap addressing, (B,) idx + (B,2) uv ->
    (B,3) in [0,1] (reference: src/utils.cl:114-133). tex_idx lanes of -1
    read texture 0 (caller blends with fallback)."""
    safe_idx = jnp.maximum(tex_idx, 0)
    w = atlas.width[safe_idx]
    h = atlas.height[safe_idx]
    off = atlas.offset[safe_idx]
    u = uv[..., 0] * w
    v = uv[..., 1] * h
    tx = jnp.mod(jnp.floor(u).astype(jnp.int32), w)
    ty = jnp.mod(jnp.floor(v).astype(jnp.int32), h)
    tx = jnp.clip(tx, 0, w - 1)
    ty = jnp.clip(ty, 0, h - 1)
    base = off.astype(jnp.int32) + tx * 4 + ty * w * 4
    r = atlas.data[base + 0].astype(jnp.float32)
    g = atlas.data[base + 1].astype(jnp.float32)
    b = atlas.data[base + 2].astype(jnp.float32)
    return jnp.stack([r, g, b], axis=-1) / 255.0


def _atlas_empty(atlas: TextureAtlas) -> bool:
    """True when the scene has no textures (the packed atlas is the 1-byte
    placeholder; real RGBA payloads are >= 4 bytes and multiples of 4, so a
    real 1x1 texture is NOT misclassified). A static shape property, so
    gating on it removes the fetch code from the traced program entirely —
    the analogue of the reference's per-scene texture compile defines
    (src/kernel_impl.hpp)."""
    return atlas is None or atlas.data.shape[0] < 4


def mat_float3(atlas: TextureAtlas, fallback: jnp.ndarray,
               tex_idx: jnp.ndarray, uv: jnp.ndarray):
    """Textured value with per-lane fallback (reference: src/utils.cl:144-146)."""
    if _atlas_empty(atlas):
        return fallback
    tex = fetch_texel(atlas, tex_idx, uv)
    return vm.where3(tex_idx >= 0, tex, fallback)


def mat_albedo(atlas: TextureAtlas, fallback: jnp.ndarray,
               tex_idx: jnp.ndarray, uv: jnp.ndarray):
    """Albedo with 2.2 gamma decode applied to the whole result, textured or
    not (reference: src/utils.cl:136-141 applies pow(·, 2.2) to both paths)."""
    val = mat_float3(atlas, fallback, tex_idx, uv)
    return jnp.power(jnp.maximum(val, 0.0), 2.2)


def tangent_space_normal(geom: Geometry, atlas: TextureAtlas,
                         prim: jnp.ndarray, uv_tex: jnp.ndarray,
                         n_shading: jnp.ndarray, map_n: jnp.ndarray):
    """Apply a tangent-space normal map where map_n >= 0
    (reference: src/utils.cl:149-182)."""
    if _atlas_empty(atlas):
        return n_shading
    default = jnp.broadcast_to(
        jnp.array([0.5, 0.5, 1.0], jnp.float32), n_shading.shape)
    tex_n = mat_float3(atlas, default, map_n, uv_tex)
    tex_n = 2.0 * tex_n - 1.0

    p = jnp.maximum(prim, 0)
    e1 = geom.v1[p] - geom.v0[p]
    e2 = geom.v2[p] - geom.v0[p]
    t1 = geom.uv1[p] - geom.uv0[p]
    t2 = geom.uv2[p] - geom.uv0[p]

    det = t1[..., 0] * t2[..., 1] - t1[..., 1] * t2[..., 0]
    inv_det = jnp.where(det != 0.0, 1.0 / jnp.where(det != 0.0, det, 1.0), 0.0)
    t = vm.normalize(inv_det[..., None]
                     * (e1 * t2[..., 1:2] - e2 * t1[..., 1:2]))
    b = vm.normalize(inv_det[..., None]
                     * (e2 * t1[..., 0:1] - e1 * t2[..., 0:1]))
    n = vm.normalize(t * tex_n[..., 0:1] + b * tex_n[..., 1:2]
                     + n_shading * tex_n[..., 2:3])
    use = (map_n >= 0) & (det != 0.0)
    return vm.where3(use, n, n_shading)
