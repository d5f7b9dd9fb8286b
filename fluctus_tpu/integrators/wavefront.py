"""Wavefront integrator — persistent path pool, TPU redesign of the
reference's wavefront pipeline (reference: src/tracer.cpp:222-299 update;
src/wf_logic.cl, src/wf_raygen.cl, src/wf_extrays.cl, src/wf_shadowrays.cl,
src/wf_mat_*.cl).

Redesign notes:
  * The pool of `cfg.pool_size` paths is decoupled from the image: terminated
    paths respawn on the next pixel via a striding counter
    (reference: wf_raygen.cl:25, clcontext.cpp:891-901), so arbitrary image
    sizes stream through a fixed-size pool.
  * The reference's 8 atomic-counter queues become mask + prefix-sum ranks:
    respawn ranks are an exclusive cumsum over the terminated mask —
    deterministic, no atomics (SURVEY §5.2).
  * One segment = one jitted iteration fusing logic+raygen+material+extension+
    shadow. The reference clears queues and reads counters on the host each
    segment; here the only host sync is an occasional sample-count readback.
  * Accumulation is a scatter-add into the (n_pix, 4) framebuffer (RGB+count),
    replacing emulated float atomics (reference: src/utils.cl:244-312).
  * Russian roulette extends paths past max_bounces exactly like
    wf_logic.cl:60-69 — the pool loop has no static path-length bound.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from fluctus_tpu.core import rng, vecmath as vm
from fluctus_tpu.core.types import (
    DeviceScene, PathState, RenderConfig, RenderParams)
from fluctus_tpu.integrators import common
from fluctus_tpu.ops import bsdf as bsdf_mod
from fluctus_tpu.ops import camera as cam_ops
from fluctus_tpu.ops import envmap as env_ops


def _raygen(params, cfg, pixel_idx, spawn_id):
    """Camera ray for given pixel index + unique spawn id (RNG sample key)
    (reference: wf_raygen.cl)."""
    pix = pixel_idx.astype(jnp.uint32)
    sid = spawn_id.astype(jnp.uint32)
    zero = jnp.zeros_like(pix)
    u_ax = rng.uniform(pix, sid, zero, rng.Streams.AA_X)
    u_ay = rng.uniform(pix, sid, zero, rng.Streams.AA_Y)
    u_lr = rng.uniform(pix, sid, zero, rng.Streams.LENS_R)
    u_lt = rng.uniform(pix, sid, zero, rng.Streams.LENS_TH)
    return cam_ops.generate_rays(params.camera, pix, cfg.width, cfg.height,
                                 u_ax, u_ay, u_lr, u_lt, params.world_radius)


def init_state(params: RenderParams, cfg: RenderConfig) -> PathState:
    """wf_reset + first raygen: every pool lane starts a path on pixel
    lane % n_pix (reference: wf_reset.cl:62-65)."""
    n = cfg.pool_size
    n_pix = cfg.width * cfg.height
    lane = jnp.arange(n, dtype=jnp.uint32)
    pixel = lane % n_pix
    spawn = lane // n_pix  # unique (pixel, sample) pairs
    orig, dir = _raygen(params, cfg, pixel, spawn)
    return PathState(
        orig=orig, dir=dir,
        throughput=jnp.ones((n, 3), jnp.float32),
        radiance=jnp.zeros((n, 3), jnp.float32),
        pixel_index=pixel,
        sample_index=spawn,
        path_len=jnp.zeros((n,), jnp.uint32),
        last_pdf_w=jnp.ones((n,), jnp.float32),
        last_specular=jnp.ones((n,), bool),
        alive=jnp.ones((n,), bool),
    )


def _nee_single_light(scene, params, cfg, ctx, sh_orig, wi, types, pix, samp,
                      bounce):
    """WF-style NEE: pick ONE light (env with prob envMapProb, else area),
    one shadow ray (reference: wf_logic.cl:215-303 + wf_shadowrays.cl)."""
    use_env = 1 if cfg.use_env_map else 0
    use_area = 1 if cfg.use_area_light else 0
    env_prob = use_env / max(1, use_env + use_area)  # 0, 0.5 or 1

    u_pick = rng.uniform(pix, samp, bounce, rng.Streams.LIGHT_PICK)
    pick_env = u_pick < env_prob if use_area else jnp.full(pix.shape,
                                                           bool(use_env))

    b = wi.shape[0]
    ldir = jnp.zeros((b, 3), jnp.float32)
    llen = jnp.zeros((b,), jnp.float32)
    emission = jnp.zeros((b, 3), jnp.float32)
    direct_pdf_w = jnp.zeros((b,), jnp.float32)
    pick_prob = jnp.ones((b,), jnp.float32)
    valid = jnp.zeros((b,), bool)

    if cfg.use_env_map:
        u = rng.uniform(pix, samp, bounce, rng.Streams.LIGHT_U)
        L, pdf_env = env_ops.sample_alias(scene.envmap, u)
        L = vm.normalize(L)
        li = env_ops.eval_dir(scene.envmap, L) * params.env_strength
        ldir = vm.where3(pick_env, L, ldir)
        llen = jnp.where(pick_env, 2.0 * params.world_radius, llen)
        emission = vm.where3(pick_env, li, emission)
        direct_pdf_w = jnp.where(pick_env, pdf_env, direct_pdf_w)
        pick_prob = jnp.where(pick_env, env_prob, pick_prob)
        valid = valid | (pick_env & (pdf_env != 0.0))

    if cfg.use_area_light:
        from fluctus_tpu.core import samplers
        al = params.area_light
        u1 = rng.uniform(pix, samp, bounce, rng.Streams.LIGHT_AREA_U)
        u2 = rng.uniform(pix, samp, bounce, rng.Streams.LIGHT_AREA_V)
        pos_l, pdf_a = samplers.sample_area_light(al.pos, al.right, al.up,
                                                  al.size, u1, u2)
        delta = pos_l - sh_orig
        dist = vm.length(delta)
        L = vm.normalize(delta)
        cos_light = jnp.maximum(vm.dot(al.normal, -L), 0.0)
        pdf_w = samplers.pdf_area_to_solid_angle(pdf_a, dist * 0.995,
                                                 cos_light)
        pick_area = ~pick_env
        ldir = vm.where3(pick_area, L, ldir)
        llen = jnp.where(pick_area, dist * 0.995, llen)
        emission = vm.where3(
            pick_area, jnp.broadcast_to(al.emission, emission.shape),
            emission)
        direct_pdf_w = jnp.where(pick_area, pdf_w, direct_pdf_w)
        pick_prob = jnp.where(pick_area, 1.0 - env_prob, pick_prob)
        valid = valid | (pick_area & (cos_light > 0.0))

    # reference wf_shadowrays.cl checks the light quad on EVERY shadow ray
    # (area-pick rays are shortened by 0.995 so they miss their own emitter)
    blocked = common._shadow_blocked(scene, params, cfg, sh_orig, ldir,
                                     jnp.maximum(llen, 1e-6),
                                     check_area_quad=True)

    f = bsdf_mod.bsdf_eval(ctx, wi, ldir, types)
    cos_th = jnp.maximum(0.0, vm.dot(ldir, ctx.n))
    bsdf_pdf_w = jnp.maximum(0.0, bsdf_mod.bsdf_pdf(ctx, wi, ldir, types))
    weight = jnp.float32(1.0)
    if cfg.sample_impl:
        weight = (direct_pdf_w * pick_prob) / jnp.maximum(
            direct_pdf_w * pick_prob + bsdf_pdf_w, 1e-20)
    denom = jnp.maximum(pick_prob * direct_pdf_w, 1e-20)
    contrib = f * emission * (weight * cos_th / denom)[..., None]
    ok = valid & ~blocked & (direct_pdf_w > 0.0)
    return vm.where3(ok, contrib, jnp.zeros_like(contrib)), pick_prob


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3, 4, 5))
def wavefront_iteration(scene: DeviceScene, params: RenderParams,
                        cfg: RenderConfig, state: PathState,
                        framebuffer: jnp.ndarray, counters: jnp.ndarray):
    """One wavefront segment over the whole pool. Buffers are donated —
    the pool state and framebuffer update in place like the reference's
    persistent device buffers.

    counters: [pixel_counter, spawn_counter, samples_done] uint32."""
    types = cfg.bsdf_types_mask
    n_pix = cfg.width * cfg.height
    pix = state.pixel_index
    samp = state.sample_index
    bounce = state.path_len

    # --- extension trace (wf_extrays.cl)
    hit = common.trace_scene(scene, params, cfg, state.orig, state.dir)
    path_len = state.path_len + 1

    t = state.throughput
    ei = state.radiance
    # pick prob used by the PREVIOUS NEE draw — same for all light configs
    use_env = 1 if cfg.use_env_map else 0
    use_area = 1 if cfg.use_area_light else 0
    env_prob = use_env / max(1, use_env + use_area)

    # --- logic: Russian roulette (wf_logic.cl:60-69)
    terminate = path_len >= (cfg.max_bounces + 1)
    if cfg.use_roulette:
        cont_prob = jnp.clip(vm.luminance(t), 0.01, 0.5)
        u_rr = rng.uniform(pix, samp, bounce, rng.Streams.ROULETTE)
        survive = u_rr <= cont_prob
        t = vm.where3(terminate & survive, t / cont_prob[..., None], t)
        terminate = terminate & ~survive

    # --- implicit env hit (wf_logic.cl:84-107)
    miss = hit.prim < 0
    if cfg.use_env_map:
        bg = env_ops.eval_dir(scene.envmap, state.dir) * params.env_strength
        if not cfg.sample_impl:
            bg = jnp.where(path_len == 1, 1.0, 0.0)[..., None] * bg
        w_env = common.implicit_env_weight(
            scene, params, cfg, state.dir, state.last_pdf_w,
            state.last_specular, path_len, jnp.float32(env_prob))
        add = w_env[..., None] * t * bg
        ei = ei + vm.where3(miss & ~terminate, add, jnp.zeros_like(ei))

    # --- implicit area hit (wf_logic.cl:109-132)
    if cfg.use_area_light and cfg.sample_impl:
        w_area = common.implicit_area_weight(
            params, cfg, hit, state.orig, state.dir, state.last_pdf_w,
            state.last_specular, path_len, jnp.float32(1.0 - env_prob))
        add = w_area[..., None] * t * params.area_light.emission
        ei = ei + vm.where3(hit.area_light & ~terminate, add,
                            jnp.zeros_like(ei))

    terminate = terminate | miss | hit.area_light

    # --- shading + NEE + continuation for survivors
    ctx = common.make_shading_ctx(scene, hit, state.dir)
    sh_orig = hit.p - common.OFFSET_SHADOW * state.dir
    singular = bsdf_mod.is_singular(ctx.bsdf_id)

    if cfg.sample_expl and (cfg.use_env_map or cfg.use_area_light):
        contrib, _ = _nee_single_light(scene, params, cfg, ctx, sh_orig,
                                       state.dir, types, pix, samp, bounce)
        nee_mask = ~terminate & ~singular
        ei = ei + vm.where3(nee_mask, t * contrib, jnp.zeros_like(ei))

    u1 = rng.uniform(pix, samp, bounce, rng.Streams.BSDF_U)
    u2 = rng.uniform(pix, samp, bounce, rng.Streams.BSDF_V)
    ul = rng.uniform(pix, samp, bounce, rng.Streams.BSDF_LOBE)
    s = bsdf_mod.bsdf_sample(ctx, state.dir, u1, u2, ul, types)
    wo = vm.normalize(s.wo)
    cos_th = vm.dot(ctx.n, wo)
    ok = (s.pdf != 0.0) & ~vm.is_zero(s.f)
    new_t = t * s.f * (cos_th / jnp.where(ok, s.pdf, 1.0))[..., None]
    terminate = terminate | ~ok | vm.is_zero(new_t)

    # --- splat terminated paths (scatter-add; wf_logic.cl:158-177)
    splat = terminate & (path_len > 0)
    fb_pix = jnp.where(splat, pix, 0).astype(jnp.int32)
    add_rgb = vm.where3(splat, ei, jnp.zeros_like(ei))
    add_w = jnp.where(splat, 1.0, 0.0)
    framebuffer = framebuffer.at[fb_pix, :3].add(add_rgb)
    framebuffer = framebuffer.at[fb_pix, 3].add(add_w)

    # --- respawn (wf_raygen.cl + host pixel-index striding)
    rank = jnp.cumsum(terminate.astype(jnp.uint32)) - terminate
    n_respawn = jnp.sum(terminate.astype(jnp.uint32))
    new_pix = (counters[0] + rank) % n_pix
    new_spawn = counters[1] + rank
    r_orig, r_dir = _raygen(params, cfg, new_pix, new_spawn)

    state = PathState(
        orig=vm.where3(terminate, r_orig, hit.p + common.OFFSET_CONT * wo),
        dir=vm.where3(terminate, r_dir, wo),
        throughput=vm.where3(terminate, jnp.ones_like(t), new_t),
        radiance=vm.where3(terminate, jnp.zeros_like(ei), ei),
        pixel_index=jnp.where(terminate, new_pix, pix),
        sample_index=jnp.where(terminate, new_spawn, samp),
        path_len=jnp.where(terminate, 0, path_len).astype(jnp.uint32),
        last_pdf_w=jnp.where(terminate, 1.0, s.pdf),
        last_specular=jnp.where(terminate, True, singular),
        alive=jnp.ones_like(state.alive),
    )
    counters = counters.at[0].set((counters[0] + n_respawn) % n_pix)
    counters = counters.at[1].add(n_respawn)
    counters = counters.at[2].add(jnp.sum(splat.astype(jnp.uint32)))
    return state, framebuffer, counters


def render(scene: DeviceScene, params: RenderParams, cfg: RenderConfig,
           spp: int, max_iters: int | None = None):
    """Render until every pixel has ≥ spp samples on average
    (reference analogue: interactive accumulation until convergence).
    Returns (H, W, 3) radiance (framebuffer normalized by sample counts)."""
    n_pix = cfg.width * cfg.height
    target = n_pix * spp
    state = init_state(params, cfg)
    fb = jnp.zeros((n_pix, 4), jnp.float32)
    counters = jnp.zeros((3,), jnp.uint32)
    # the pool pre-spawned pool_size paths
    counters = counters.at[0].set(cfg.pool_size % n_pix)
    counters = counters.at[1].set(
        (cfg.pool_size + n_pix - 1) // n_pix)

    it = 0
    limit = max_iters if max_iters is not None else 10_000
    while it < limit:
        state, fb, counters = wavefront_iteration(scene, params, cfg, state,
                                                  fb, counters)
        it += 1
        if it % 8 == 0 or it >= limit:
            if int(counters[2]) >= target:
                break
    img = fb[:, :3] / jnp.maximum(fb[:, 3:4], 1.0)
    return img.reshape(cfg.height, cfg.width, 3)
