"""Lockstep integrator — guaranteed-spp path tracing, TPU redesign of the
reference's microkernel pipeline (reference: src/tracer.cpp:95-169
renderSingle; src/mk_raygen.cl, src/mk_next_vertex.cl, src/mk_sample_bsdf.cl,
src/mk_splat.cl).

Where the reference runs phase-gated kernels over all work-items, the TPU
form is one `lax.scan` over bounces with lane masks: every lane traces,
shades and samples every bounce, dead lanes are masked. Each bounce body is
`jax.checkpoint`-ed so reverse-mode AD re-traces instead of storing all
intermediate wavefronts (path-replay backprop; RNG is counter-based so the
replay is bit-exact).

Like the reference's renderSingle, Russian roulette is not applied here
(src/tracer.cpp:100-108 forces it off for exact-spp exports); the wavefront
integrator implements it.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from fluctus_tpu.core import rng, vecmath as vm
from fluctus_tpu.core.types import (
    DeviceScene, RenderConfig, RenderParams)
from fluctus_tpu.integrators import common
from fluctus_tpu.ops import bsdf as bsdf_mod
from fluctus_tpu.ops import camera as cam_ops
from fluctus_tpu.ops import envmap as env_ops

# MK samples every light with pick prob 1 (reference: mk_sample_bsdf.cl:73)
LIGHT_PICK_PROB = jnp.float32(1.0)


def sample_radiance(scene: DeviceScene, params: RenderParams,
                    cfg: RenderConfig, pixel_idx: jnp.ndarray,
                    sample_idx: jnp.ndarray,
                    early_exit: bool = False) -> jnp.ndarray:
    """Trace one complete path per pixel index; returns (B, 3) radiance.

    early_exit=True runs the bounce loop as a lax.while_loop that stops as
    soon as every lane has terminated (env/light hit or dead throughput) —
    a large win on open scenes where most paths die after bounce 1
    (reference wavefront gets this for free via its raygen queue,
    src/wf_logic.cl:158-177; this is the lockstep equivalent). Forward-only:
    reverse-mode AD needs the fixed-trip scan, so optimization paths call
    with early_exit=False (the default).

    Under reverse-mode AD, the checkpointed bounce body saves the
    traversal/occlusion results as named residuals (see the policy below),
    so the rematerialized backward never re-runs a traversal kernel."""
    types = cfg.bsdf_types_mask
    pix = pixel_idx.astype(jnp.uint32)
    samp = jnp.asarray(sample_idx, jnp.uint32)

    zero_b = jnp.zeros_like(pix)
    u_ax = rng.uniform(pix, samp, zero_b, rng.Streams.AA_X)
    u_ay = rng.uniform(pix, samp, zero_b, rng.Streams.AA_Y)
    u_lr = rng.uniform(pix, samp, zero_b, rng.Streams.LENS_R)
    u_lt = rng.uniform(pix, samp, zero_b, rng.Streams.LENS_TH)
    orig, dir = cam_ops.generate_rays(params.camera, pix, cfg.width,
                                      cfg.height, u_ax, u_ay, u_lr, u_lt,
                                      params.world_radius)

    b = pix.shape[0]
    ei = jnp.zeros((b, 3), jnp.float32)
    throughput = jnp.ones((b, 3), jnp.float32)
    last_pdf_w = jnp.ones((b,), jnp.float32)
    last_specular = jnp.ones((b,), bool)
    alive = jnp.ones((b,), bool)

    def bounce_body(carry, bounce):
        orig, dir, throughput, ei, last_pdf_w, last_specular, alive = carry
        path_len = bounce + 1
        t_orig, t_dir = common.neutralize_rays(orig, dir, alive)
        hit = common.trace_scene(scene, params, cfg, t_orig, t_dir)

        # --- implicit environment hit (mk_next_vertex.cl:72-96)
        miss = hit.prim < 0
        if cfg.use_env_map:
            bg = env_ops.eval_dir(scene.envmap, dir) * params.env_strength
            if not cfg.sample_impl:
                bg = jnp.where(path_len == 1, 1.0, 0.0)[..., None] * bg
            w_env = common.implicit_env_weight(
                scene, params, cfg, dir, last_pdf_w, last_specular,
                path_len, LIGHT_PICK_PROB)
            ei = ei + vm.where3(miss & alive, w_env[..., None] * throughput * bg,
                                jnp.zeros_like(ei))

        # --- implicit area-light hit (mk_next_vertex.cl:98-117)
        if cfg.use_area_light and cfg.sample_impl:
            w_area = common.implicit_area_weight(
                params, cfg, hit, orig, dir, last_pdf_w, last_specular,
                path_len, LIGHT_PICK_PROB)
            ei = ei + vm.where3(
                hit.area_light & alive,
                w_area[..., None] * throughput * params.area_light.emission,
                jnp.zeros_like(ei))

        alive = alive & ~miss & ~hit.area_light

        # --- shading context + NEE (mk_sample_bsdf.cl)
        ctx = common.make_shading_ctx(scene, hit, dir)
        sh_orig = hit.p - common.OFFSET_SHADOW * dir
        singular = bsdf_mod.is_singular(ctx.bsdf_id)

        if cfg.sample_expl:
            nee_mask = alive & ~singular
            if cfg.use_env_map:
                c = common.nee_env(scene, params, cfg, ctx, sh_orig, dir,
                                   types, pix, samp, bounce, LIGHT_PICK_PROB,
                                   active=nee_mask)
                ei = ei + vm.where3(nee_mask, throughput * c,
                                    jnp.zeros_like(ei))
            if cfg.use_area_light:
                c = common.nee_area(scene, params, cfg, ctx, sh_orig, dir,
                                    types, pix, samp, bounce, LIGHT_PICK_PROB,
                                    active=nee_mask)
                ei = ei + vm.where3(nee_mask, throughput * c,
                                    jnp.zeros_like(ei))

        # --- continuation sampling (mk_sample_bsdf.cl:158-199)
        u1 = rng.uniform(pix, samp, bounce, rng.Streams.BSDF_U)
        u2 = rng.uniform(pix, samp, bounce, rng.Streams.BSDF_V)
        ul = rng.uniform(pix, samp, bounce, rng.Streams.BSDF_LOBE)
        s = bsdf_mod.bsdf_sample(ctx, dir, u1, u2, ul, types)
        wo = vm.normalize(s.wo)
        cos_th = vm.dot(ctx.n, wo)
        ok = (s.pdf != 0.0) & ~vm.is_zero(s.f)
        new_t = throughput * s.f * (cos_th / jnp.where(ok, s.pdf, 1.0))[..., None]
        throughput = vm.where3(alive & ok, new_t, throughput)
        alive = alive & ok & ~vm.is_zero(throughput)

        orig = hit.p + common.OFFSET_CONT * wo
        dir = vm.where3(alive, wo, dir)
        last_pdf_w = jnp.where(alive, s.pdf, last_pdf_w)
        last_specular = jnp.where(alive, singular, last_specular)
        return (orig, dir, throughput, ei, last_pdf_w, last_specular,
                alive), None

    carry = (orig, dir, throughput, ei, last_pdf_w, last_specular, alive)
    if early_exit:
        def w_cond(s):
            bounce, carry = s
            return (bounce <= cfg.max_bounces) & jnp.any(carry[6])

        def w_body(s):
            bounce, carry = s
            carry, _ = bounce_body(carry, bounce)
            return bounce + 1, carry

        _, carry = jax.lax.while_loop(w_cond, w_body,
                                      (jnp.uint32(0), carry))
        return carry[3]
    bounces = jnp.arange(cfg.max_bounces + 1, dtype=jnp.uint32)
    # The bounce body is checkpointed with a policy that saves ONLY the
    # traversal results and shadow-occlusion flags (tagged with
    # checkpoint_name in common.py) as residuals — they are stop_gradient
    # by design (fixed-visibility gradients), and with them saved the
    # rematerialized backward pass never re-runs a traversal kernel (the
    # kernel calls are dead code under remat). Everything else (shading)
    # remats, keeping activation memory per bounce tiny.
    ckpt = jax.checkpoint(
        bounce_body,
        policy=jax.checkpoint_policies.save_only_these_names(
            "trace", "shadow"))
    carry, _ = jax.lax.scan(ckpt, carry, bounces)
    return carry[3]


@partial(jax.jit, static_argnames=("cfg",))
def _render_tile(scene, params, cfg, pixel_idx, sample_idx):
    return sample_radiance(scene, params, cfg, pixel_idx, sample_idx)


@partial(jax.jit, static_argnames=("cfg", "n_samples"))
def _render_tile_spp(scene, params, cfg, pixel_idx, sample0, n_samples):
    """Accumulate n_samples inside ONE program (lax.scan over samples),
    amortizing per-program costs; each sample's bounce loop early-exits
    once all its lanes terminate (forward-only render path)."""
    def body(acc, k):
        return acc + sample_radiance(scene, params, cfg, pixel_idx,
                                     sample0 + k, early_exit=True), None
    acc = jnp.zeros((pixel_idx.shape[0], 3), jnp.float32)
    acc, _ = jax.lax.scan(body, acc,
                          jnp.arange(n_samples, dtype=jnp.uint32))
    return acc


def render(scene: DeviceScene, params: RenderParams, cfg: RenderConfig,
           spp: int, samples_per_launch: int = 16):
    """Render cfg.width × cfg.height at exactly `spp` samples/pixel.

    Returns (H, W, 3) float32 linear radiance (pre-postprocess).
    Pixels are processed in tiles of cfg.tile_size rays to bound the
    traversal stack footprint; samples are fused `samples_per_launch` at a
    time into single programs."""
    n_pix = cfg.width * cfg.height
    tile = min(cfg.tile_size, n_pix)
    acc = jnp.zeros((n_pix, 3), jnp.float32)
    for start in range(0, n_pix, tile):
        idx = jnp.arange(start, min(start + tile, n_pix), dtype=jnp.uint32)
        tile_acc = jnp.zeros((idx.shape[0], 3), jnp.float32)
        s = 0
        while s < spp:
            k = min(samples_per_launch, spp - s)
            tile_acc = tile_acc + _render_tile_spp(scene, params, cfg, idx,
                                                   jnp.uint32(s), k)
            s += k
        acc = acc.at[start:start + idx.shape[0]].add(tile_acc)
    img = acc / spp
    return img.reshape(cfg.height, cfg.width, 3)
