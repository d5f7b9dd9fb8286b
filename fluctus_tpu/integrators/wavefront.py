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

import time
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
                      bounce, defer: bool = False):
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
        L, pdf_env, rad = env_ops.sample_alias_radiance(scene.envmap, u)
        L = vm.normalize(L)
        li = rad * params.env_strength
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

    f = bsdf_mod.bsdf_eval(ctx, wi, ldir, types)
    cos_th = jnp.maximum(0.0, vm.dot(ldir, ctx.n))
    bsdf_pdf_w = jnp.maximum(0.0, bsdf_mod.bsdf_pdf(ctx, wi, ldir, types))
    # cull zero-contribution lanes before the occlusion trace (~half of env
    # alias draws land below the hemisphere; see common.nee_env). The
    # reference wf_shadowrays.cl checks the light quad on EVERY shadow ray
    # (area-pick rays are shortened by 0.995 so they miss their own emitter).
    live = valid & (cos_th > 0.0) & ~vm.is_zero(f)
    sh_o, ldir_t = common.neutralize_rays(sh_orig, ldir, live)
    weight = jnp.float32(1.0)
    if cfg.sample_impl:
        weight = (direct_pdf_w * pick_prob) / jnp.maximum(
            direct_pdf_w * pick_prob + bsdf_pdf_w, 1e-20)
    denom = jnp.maximum(pick_prob * direct_pdf_w, 1e-20)
    contrib = f * emission * (weight * cos_th / denom)[..., None]
    cand_ok = valid & (direct_pdf_w > 0.0)
    cand = vm.where3(cand_ok, contrib, jnp.zeros_like(contrib))
    if defer:
        # deferred resolution (reference: shadow rays traced this segment,
        # wf_logic.cl:134-156 resolves them next segment): return the
        # candidate + the shadow ray; caller traces it FUSED with the next
        # segment's extension rays (common.trace_scene_with_shadow)
        return cand, (sh_o, ldir_t, jnp.maximum(llen, 1e-6))
    blocked = common._shadow_blocked(scene, params, cfg, sh_o, ldir_t,
                                     jnp.maximum(llen, 1e-6),
                                     check_area_quad=True)
    return vm.where3(~blocked, cand, jnp.zeros_like(cand)), pick_prob


def _segment_core(scene: DeviceScene, params: RenderParams,
                  cfg: RenderConfig, state: PathState, pend=None):
    """The per-segment path logic shared by both wavefront drivers:
    extension trace -> RR -> implicit env/area hits -> NEE -> continuation
    sampling (reference: wf_extrays.cl + wf_logic.cl + wf_mat_*.cl +
    wf_shadowrays.cl). Returns everything the splat/respawn policy needs.

    pend (deferred-shadow mode): (sh_o, sh_d, sh_len, contrib) — the
    PREVIOUS segment's NEE shadow rays + MIS-weighted candidates. The
    shadow rays trace FUSED with this segment's extension rays (one
    traversal call instead of two — each call carries a ~1.5 ms floor,
    BASELINE r3e) exactly like the reference wavefront: shadow rays
    queued in segment k are resolved by segment k+1's logic kernel
    (wf_logic.cl:134-156). Returns two extra values: resolved (the
    previous candidates where unblocked, to credit to whichever path
    generated them) and pend2 (this segment's candidates)."""
    types = cfg.bsdf_types_mask
    pix = state.pixel_index
    samp = state.sample_index
    bounce = state.path_len

    # --- extension trace (wf_extrays.cl); inactive lanes trace miss rays
    t_orig, t_dir = common.neutralize_rays(state.orig, state.dir,
                                           state.alive)
    if pend is not None:
        hit, blocked_prev = common.trace_scene_with_shadow(
            scene, params, cfg, t_orig, t_dir, pend[0], pend[1], pend[2])
        resolved = vm.where3(~blocked_prev, pend[3],
                             jnp.zeros_like(pend[3]))
    else:
        hit = common.trace_scene(scene, params, cfg, t_orig, t_dir)
    path_len = state.path_len + 1

    t = state.throughput
    ei = state.radiance
    # pick prob used by the PREVIOUS NEE draw — same for all light configs
    use_env = 1 if cfg.use_env_map else 0
    use_area = 1 if cfg.use_area_light else 0
    env_prob = use_env / max(1, use_env + use_area)

    # --- max-bounce cutoff + Russian roulette (wf_logic.cl:60-69).
    # Boundary semantics: the reference's OWN integrators disagree at the
    # cutoff — wf_logic.cl:62,84 terminates BEFORE collecting the final
    # segment's implicit hit / NEE, while mk_next_vertex.cl:72-117 collects
    # it. We unify on the MK semantics everywhere (matching our lockstep
    # bit-for-bit): the final traced segment's radiance is collected — the
    # estimator is still the truncated-path estimator, and the already-paid
    # trace isn't wasted. RR (which only extends PAST the cutoff) gates the
    # continuation only; its throughput boost applies to tail vertices.
    cut = path_len >= (cfg.max_bounces + 1)
    rr_term = cut
    t_cont = t
    if cfg.use_roulette:
        cont_prob = jnp.clip(vm.luminance(t), 0.01, 0.5)
        u_rr = rng.uniform(pix, samp, bounce, rng.Streams.ROULETTE)
        survive = u_rr <= cont_prob
        t_cont = vm.where3(cut & survive, t / cont_prob[..., None], t)
        rr_term = cut & ~survive

    # --- implicit env hit (mk_next_vertex.cl:72-96)
    miss = hit.prim < 0
    if cfg.use_env_map:
        bg = env_ops.eval_dir(scene.envmap, state.dir) * params.env_strength
        if not cfg.sample_impl:
            bg = jnp.where(path_len == 1, 1.0, 0.0)[..., None] * bg
        w_env = common.implicit_env_weight(
            scene, params, cfg, state.dir, state.last_pdf_w,
            state.last_specular, path_len, jnp.float32(env_prob))
        add = w_env[..., None] * t * bg
        ei = ei + vm.where3(miss, add, jnp.zeros_like(ei))

    # --- implicit area hit (mk_next_vertex.cl:98-117)
    if cfg.use_area_light and cfg.sample_impl:
        w_area = common.implicit_area_weight(
            params, cfg, hit, state.orig, state.dir, state.last_pdf_w,
            state.last_specular, path_len, jnp.float32(1.0 - env_prob))
        add = w_area[..., None] * t * params.area_light.emission
        ei = ei + vm.where3(hit.area_light, add, jnp.zeros_like(ei))

    # --- shading + NEE at the hit vertex (incl. the cutoff vertex —
    # lockstep's last scan iteration does the same)
    live_vertex = ~miss & ~hit.area_light
    ctx = common.make_shading_ctx(scene, hit, state.dir)
    sh_orig = hit.p - common.OFFSET_SHADOW * state.dir
    singular = bsdf_mod.is_singular(ctx.bsdf_id)

    nee_on = cfg.sample_expl and (cfg.use_env_map or cfg.use_area_light)
    if nee_on and pend is None:
        contrib, _ = _nee_single_light(scene, params, cfg, ctx, sh_orig,
                                       state.dir, types, pix, samp, bounce)
        nee_mask = live_vertex & ~singular
        ei = ei + vm.where3(nee_mask, t * contrib, jnp.zeros_like(ei))
    elif pend is not None:
        if nee_on:
            cand, (sh_o2, sh_d2, sh_l2) = _nee_single_light(
                scene, params, cfg, ctx, sh_orig, state.dir, types, pix,
                samp, bounce, defer=True)
            nee_mask = live_vertex & ~singular
            sh_o2, sh_d2 = common.neutralize_rays(sh_o2, sh_d2, nee_mask)
            pend2 = (sh_o2, sh_d2, sh_l2,
                     vm.where3(nee_mask, t * cand, jnp.zeros_like(cand)))
        else:
            b = pix.shape[0]
            z3 = jnp.zeros((b, 3), jnp.float32)
            sh_o2, sh_d2 = common.neutralize_rays(
                z3, z3.at[:, 2].set(1.0), jnp.zeros((b,), bool))
            pend2 = (sh_o2, sh_d2, jnp.full((b,), 1e-6, jnp.float32), z3)

    terminate = ~live_vertex | rr_term
    t = t_cont

    u1 = rng.uniform(pix, samp, bounce, rng.Streams.BSDF_U)
    u2 = rng.uniform(pix, samp, bounce, rng.Streams.BSDF_V)
    ul = rng.uniform(pix, samp, bounce, rng.Streams.BSDF_LOBE)
    s = bsdf_mod.bsdf_sample(ctx, state.dir, u1, u2, ul, types)
    wo = vm.normalize(s.wo)
    cos_th = vm.dot(ctx.n, wo)
    ok = (s.pdf != 0.0) & ~vm.is_zero(s.f)
    new_t = t * s.f * (cos_th / jnp.where(ok, s.pdf, 1.0))[..., None]
    terminate = terminate | ~ok | vm.is_zero(new_t)
    if pend is not None:
        return (hit, terminate, ei, wo, new_t, s.pdf, singular, path_len,
                resolved, pend2)
    return hit, terminate, ei, wo, new_t, s.pdf, singular, path_len


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3, 4, 5))
def wavefront_iteration(scene: DeviceScene, params: RenderParams,
                        cfg: RenderConfig, state: PathState,
                        framebuffer: jnp.ndarray, counters: jnp.ndarray):
    """One wavefront segment over the whole pool with the REFERENCE policy:
    terminated paths scatter-splat to their pixel and respawn on the next
    pixel via a striding counter (wf_raygen.cl:25). Buffers are donated —
    the pool state and framebuffer update in place like the reference's
    persistent device buffers.

    NOTE (measured): XLA scatter-add on TPU costs ~1 s for a 262k-lane
    pool (~4 us/update), so this general-striding form is VASTLY slower
    than render_pinned below; it is kept as the reference-parity form for
    arbitrary pool/image size ratios.

    counters: [pixel_counter, spawn_counter, samples_done] uint32."""
    n_pix = cfg.width * cfg.height
    pix = state.pixel_index
    samp = state.sample_index

    hit, terminate, ei, wo, new_t, s_pdf, singular, path_len = \
        _segment_core(scene, params, cfg, state)

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
        throughput=vm.where3(terminate, jnp.ones_like(new_t), new_t),
        radiance=vm.where3(terminate, jnp.zeros_like(ei), ei),
        pixel_index=jnp.where(terminate, new_pix, pix),
        sample_index=jnp.where(terminate, new_spawn, samp),
        path_len=jnp.where(terminate, 0, path_len).astype(jnp.uint32),
        last_pdf_w=jnp.where(terminate, 1.0, s_pdf),
        last_specular=jnp.where(terminate, True, singular),
        alive=jnp.ones_like(state.alive),
    )
    counters = counters.at[0].set((counters[0] + n_respawn) % n_pix)
    counters = counters.at[1].add(n_respawn)
    counters = counters.at[2].add(jnp.sum(splat.astype(jnp.uint32)))
    return state, framebuffer, counters


def render_scatter_reference(scene: DeviceScene, params: RenderParams,
                             cfg: RenderConfig, spp: int,
                             max_iters: int | None = None):
    """REFERENCE-PARITY form, NOT a production path: renders with the
    reference's per-segment scatter splat (~4 us/update on TPU — vastly
    slower than render_stream; see wavefront_iteration). Kept for parity
    tests of the striding-respawn policy against arbitrary pool/image
    ratios. Renders until every pixel has >= spp samples on average
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


# ---------------------------------------------------------------------------
# Streaming wavefront with scatter-free binning — the TPU throughput form.
#
# XLA scatter-add costs ~4 us/update on TPU (measured: ~1 s to splat a 262k
# pool), so the reference's per-segment scatter splat is hostile to the
# hardware. This driver keeps the reference's striding-respawn pool (perfect
# load balance, wf_raygen.cl:25) but removes every scatter:
#   * each segment EMITS its completed samples as dense per-lane rows —
#     scan outputs (r, g, b, pixel_id), written exactly once — instead of
#     read-modify-writing any carried accumulation buffer (a lane-private
#     slot buffer costs a full buffer read+write per segment; measured
#     ~4 ms/segment at 9M slots);
#   * exact-spp spawning means every pixel receives exactly spp samples, so
#     one argsort by pixel id at the end lines samples up in contiguous
#     groups of spp -> binning is a reshape-sum. Sorts and gathers are fast
#     on TPU; only scatter is pathological.
# A terminated path respawns IMMEDIATELY (the wavefront's key win over
# lockstep: mean path length ~1.6 segments on open scenes vs a fixed
# max_bounces+1), and Russian roulette works (exact spp is still guaranteed
# because spawn COUNT is exact; RR only changes path length).
# ---------------------------------------------------------------------------

def _stream_segment(scene: DeviceScene, params: RenderParams,
                    cfg: RenderConfig, state: PathState,
                    counters: jnp.ndarray, spp: int,
                    pix_base=0, n_pix_local: int | None = None):
    """One streaming segment (traced body; jit entry points below).

    counters: [spawn_counter, ext_rays, shadow_rays] uint32.
    Returns (state, counters, (r, g, b, pix)) where the last element is the
    segment's completed-sample row: (pool,) each, pix = -1 where the lane
    finished no sample this segment.

    pix_base / n_pix_local: under data parallelism each shard streams its
    own contiguous pixel range [pix_base, pix_base + n_pix_local) with a
    purely local spawn budget — no cross-chip traffic inside the segment
    (SURVEY §2.4 ray/tile DP design). Defaults cover the whole frame."""
    n_pix = n_pix_local if n_pix_local is not None else (
        cfg.width * cfg.height)
    pix_base = jnp.uint32(pix_base)
    target = jnp.uint32(n_pix * spp)
    active = state.alive

    hit, terminate, ei, wo, new_t, s_pdf, singular, path_len = \
        _segment_core(scene, params, cfg, state)
    terminate = terminate & active
    done = terminate & (path_len > 0)

    # --- emit this segment's completed samples as dense write-once rows
    row_pix = jnp.where(done, state.pixel_index.astype(jnp.int32), -1)
    row_r = jnp.where(done, ei[:, 0], 0.0)
    row_g = jnp.where(done, ei[:, 1], 0.0)
    row_b = jnp.where(done, ei[:, 2], 0.0)

    # --- striding respawn with an exact (shard-local) spawn budget
    rank = jnp.cumsum(terminate.astype(jnp.uint32)) - terminate
    new_spawn = counters[0] + rank
    can_spawn = terminate & (new_spawn < target)
    n_spawned = jnp.sum(can_spawn.astype(jnp.uint32))
    new_pix = jnp.where(can_spawn, pix_base + new_spawn % n_pix, 0)
    new_samp = jnp.where(can_spawn, new_spawn // n_pix, 0)
    r_orig, r_dir = _raygen(params, cfg, new_pix, new_samp)

    alive_next = jnp.where(terminate, can_spawn, active)
    state = PathState(
        orig=vm.where3(terminate, r_orig, hit.p + common.OFFSET_CONT * wo),
        dir=vm.where3(terminate, r_dir, wo),
        throughput=vm.where3(terminate, jnp.ones_like(new_t), new_t),
        radiance=vm.where3(terminate, jnp.zeros_like(ei), ei),
        pixel_index=jnp.where(terminate, new_pix, state.pixel_index),
        sample_index=jnp.where(terminate, new_samp, state.sample_index),
        path_len=jnp.where(terminate, 0, path_len).astype(jnp.uint32),
        last_pdf_w=jnp.where(terminate, 1.0, s_pdf),
        last_specular=jnp.where(terminate, True, singular),
        alive=alive_next,
    )
    n_act = jnp.sum(active.astype(jnp.uint32))
    nee_on = cfg.sample_expl and (cfg.use_env_map or cfg.use_area_light)
    counters = counters.at[0].add(n_spawned)
    counters = counters.at[1].add(n_act)
    # shadow rays exist only when NEE has a light to sample (the counter
    # mirrored ext unconditionally before, over-reporting unlit scenes)
    counters = counters.at[2].add(n_act if nee_on else jnp.uint32(0))
    return state, counters, (row_r, row_g, row_b, row_pix)


def _stream_segment_d(scene: DeviceScene, params: RenderParams,
                      cfg: RenderConfig, state: PathState,
                      counters: jnp.ndarray, spp: int,
                      pend, fin_pix, fin_ei,
                      pix_base=0, n_pix_local: int | None = None):
    """Deferred-shadow streaming segment (image form): the previous
    segment's NEE shadow rays trace FUSED with this segment's extension
    rays (one traversal call, ~half the per-call floor — BASELINE r3e),
    and a completed sample's row emits one segment late, after its final
    shadow ray resolves (reference: wf_logic.cl:134-156)."""
    n_pix = n_pix_local if n_pix_local is not None else (
        cfg.width * cfg.height)
    pix_base_u = jnp.uint32(pix_base)
    target = jnp.uint32(n_pix * spp)
    active = state.alive

    (hit, terminate, ei, wo, new_t, s_pdf, singular, path_len, resolved,
     pend2) = _segment_core(scene, params, cfg, state, pend=pend)
    # credit resolved NEE: finished sample awaiting it, else live path
    fin_has = fin_pix >= 0
    row_pix = jnp.where(fin_has, fin_pix, -1)
    fin_total = fin_ei + resolved
    row_r = jnp.where(fin_has, fin_total[:, 0], 0.0)
    row_g = jnp.where(fin_has, fin_total[:, 1], 0.0)
    row_b = jnp.where(fin_has, fin_total[:, 2], 0.0)
    ei = ei + vm.where3(~fin_has, resolved, jnp.zeros_like(resolved))

    terminate = terminate & active
    done = terminate & (path_len > 0)
    fin_pix_n = jnp.where(done, state.pixel_index.astype(jnp.int32), -1)
    fin_ei_n = vm.where3(done, ei, jnp.zeros_like(ei))

    rank = jnp.cumsum(terminate.astype(jnp.uint32)) - terminate
    new_spawn = counters[0] + rank
    can_spawn = terminate & (new_spawn < target)
    n_spawned = jnp.sum(can_spawn.astype(jnp.uint32))
    new_pix = jnp.where(can_spawn, pix_base_u + new_spawn % n_pix, 0)
    new_samp = jnp.where(can_spawn, new_spawn // n_pix, 0)
    r_orig, r_dir = _raygen(params, cfg, new_pix, new_samp)

    alive_next = jnp.where(terminate, can_spawn, active)
    state = PathState(
        orig=vm.where3(terminate, r_orig, hit.p + common.OFFSET_CONT * wo),
        dir=vm.where3(terminate, r_dir, wo),
        throughput=vm.where3(terminate, jnp.ones_like(new_t), new_t),
        radiance=vm.where3(terminate, jnp.zeros_like(ei), ei),
        pixel_index=jnp.where(terminate, new_pix, state.pixel_index),
        sample_index=jnp.where(terminate, new_samp, state.sample_index),
        path_len=jnp.where(terminate, 0, path_len).astype(jnp.uint32),
        last_pdf_w=jnp.where(terminate, 1.0, s_pdf),
        last_specular=jnp.where(terminate, True, singular),
        alive=alive_next,
    )
    n_act = jnp.sum(active.astype(jnp.uint32))
    nee_on = cfg.sample_expl and (cfg.use_env_map or cfg.use_area_light)
    counters = counters.at[0].add(n_spawned)
    counters = counters.at[1].add(n_act)
    counters = counters.at[2].add(n_act if nee_on else jnp.uint32(0))
    return (state, counters, pend2, fin_pix_n, fin_ei_n,
            (row_r, row_g, row_b, row_pix))


@partial(jax.jit, static_argnames=("cfg", "spp", "n_seg"),
         donate_argnums=(3, 4, 5, 6, 7))
def stream_rounds_deferred(scene, params, cfg, state, counters, pend,
                           fin_pix, fin_ei, spp: int, n_seg: int):
    """n_seg deferred segments fused into one program (cf. stream_rounds);
    also returns the carried pend/fin state for the next launch."""
    def body(carry, _):
        state, counters, pend, fin_pix, fin_ei = carry
        state, counters, pend, fin_pix, fin_ei, rows = _stream_segment_d(
            scene, params, cfg, state, counters, spp, pend, fin_pix,
            fin_ei)
        return (state, counters, pend, fin_pix, fin_ei), rows
    carry, rows = jax.lax.scan(body, (state, counters, pend, fin_pix,
                                      fin_ei), None, length=n_seg)
    return carry + (rows,)


@partial(jax.jit, static_argnames=("cfg", "spp"), donate_argnums=(3, 4))
def stream_iteration(scene, params, cfg, state, counters, spp: int):
    return _stream_segment(scene, params, cfg, state, counters, spp)


@partial(jax.jit, static_argnames=("cfg", "spp", "n_seg"),
         donate_argnums=(3, 4))
def stream_rounds(scene, params, cfg, state, counters, spp: int, n_seg: int):
    """n_seg segments fused into ONE program (lax.scan) — amortizes launch
    and donation overhead across the round. Returns the stacked
    (n_seg, pool) sample rows as scan outputs (written once each)."""
    def body(carry, _):
        state, counters = carry
        state, counters, rows = _stream_segment(scene, params, cfg, state,
                                                counters, spp)
        return (state, counters), rows
    carry, rows = jax.lax.scan(body, (state, counters), None, length=n_seg)
    return carry[0], carry[1], rows


def init_stream_state(params: RenderParams, cfg: RenderConfig, pool: int,
                      pix_base=0, n_pix_local: int | None = None):
    """Pre-spawn a full pool over the (shard-local) pixel range; returns
    (state, counters) with counters[0] already counting the pre-spawns."""
    n_pix = n_pix_local if n_pix_local is not None else (
        cfg.width * cfg.height)
    lane = jnp.arange(pool, dtype=jnp.uint32)
    pixel = jnp.uint32(pix_base) + lane % n_pix
    spawn = lane // n_pix
    orig, dir = _raygen(params, cfg, pixel, spawn)
    state = PathState(
        orig=orig, dir=dir,
        throughput=jnp.ones((pool, 3), jnp.float32),
        radiance=jnp.zeros((pool, 3), jnp.float32),
        pixel_index=pixel,
        sample_index=spawn,
        path_len=jnp.zeros((pool,), jnp.uint32),
        last_pdf_w=jnp.ones((pool,), jnp.float32),
        last_specular=jnp.ones((pool,), bool),
        alive=jnp.ones((pool,), bool),
    )
    counters = jnp.zeros((3,), jnp.uint32).at[0].set(pool)
    return state, counters


def render_stream(scene: DeviceScene, params: RenderParams,
                  cfg: RenderConfig, spp: int, segments_per_launch: int = 8,
                  deferred: bool = False):
    """Render exactly `spp` samples/pixel with the streaming wavefront.
    Returns ((H, W, 3) image, counters [spawns, ext_rays, shadow_rays]).
    deferred=True fuses each segment's extension rays with the previous
    segment's NEE shadow rays into one traversal call (same estimator;
    see _stream_segment_d)."""
    # with NEE off there are no shadow rays to defer: the deferred form
    # would trace neutralized no-op shadow rays every segment (doubling the
    # fused traversal width) and pay the one-segment-late row emission for
    # nothing — the immediate path is the same estimator and strictly
    # cheaper (r3 advisor finding)
    if deferred and not (cfg.sample_expl
                         and (cfg.use_env_map or cfg.use_area_light)):
        deferred = False
    n_pix = cfg.width * cfg.height
    pool = min(cfg.pool_size, n_pix * spp)
    total = n_pix * spp

    state, counters = init_stream_state(params, cfg, pool)
    pend = _pend_init(pool)
    fin_pix = jnp.full((pool,), -1, jnp.int32)
    fin_ei = jnp.zeros((pool, 3), jnp.float32)

    # every segment either completes >= 1 sample or advances every live path
    # one bounce; RR extends past max_bounces with survival prob <= 0.5
    cap = (total // pool + cfg.max_bounces + 2) * 8 + 64
    it = 0
    chunks = []
    pending = []  # lagged drain checks: block on an OLD check while the
    #               newest launch is already queued (hides sync latency)
    t_prev = 0.0
    while it < cap:
        t0 = time.perf_counter()
        if deferred:
            state, counters, pend, fin_pix, fin_ei, rows = \
                stream_rounds_deferred(scene, params, cfg, state, counters,
                                       pend, fin_pix, fin_ei, spp,
                                       segments_per_launch)
            drained = jnp.any(state.alive) | jnp.any(fin_pix >= 0)
        else:
            state, counters, rows = stream_rounds(
                scene, params, cfg, state, counters, spp,
                segments_per_launch)
            drained = jnp.any(state.alive)
        chunks.append(rows)
        it += segments_per_launch
        if t_prev > 0.25:
            # big-scene launches run seconds each: the lagged check would
            # queue one full (wasted) launch past the drain — the sync's
            # ~ms round trip is noise at this scale. The lag only pays
            # when launches are fast (small frames, ~30 ms).
            pending.clear()
            done = not bool(drained)
        else:
            pending.append(drained)
            done = len(pending) >= 2 and not bool(pending.pop(0))
        t_prev = time.perf_counter() - t0
        if done:
            break

    # --- scatter-free binning: sort by pixel, reshape-sum groups of spp.
    rows = [jnp.concatenate([c[i].reshape(-1) for c in chunks])
            for i in range(4)]
    img, n_done = _bin_rows(
        bucket_rows(rows, total, pool * segments_per_launch), n_pix, spp)
    if int(n_done) != total:
        raise RuntimeError(
            f"stream drain incomplete: {int(n_done)}/{total} samples "
            f"(cap {cap})")
    return img.reshape(cfg.height, cfg.width, 3), counters


def bucket_rows(rows, total: int, quantum: int = 1):
    """Pad (r, g, b, pix) sample rows up to a multiple of `quantum` (and
    >= total): row count = launches*segments*pool varies with the RR drain
    length, and each distinct length traces the multi-million-element
    binning sort once (empty rows carry pix=-1 and sort to the back).
    Quantum = pool*segments_per_launch, the per-launch row count, so
    padding never inflates the sort (an earlier pow2 bucket cost ~18%
    frame time on the fixed-shape bench); distinct launch counts are few
    and each compiles once."""
    n_rows = rows[0].shape[0]
    bucket = max(n_rows, -(-total // quantum) * quantum)
    pad = bucket - n_rows
    if pad:
        rows = [jnp.concatenate([r, jnp.zeros((pad,), r.dtype)])
                for r in rows[:3]] + [
            jnp.concatenate([rows[3], jnp.full((pad,), -1, rows[3].dtype)])]
    return tuple(rows)


@partial(jax.jit, static_argnames=("n_pix", "spp"))
def _bin_rows(rows, n_pix: int, spp: int):
    """Sort emitted sample rows by pixel id; empty rows (pix=-1) sort to the
    back as 0xFFFFFFFF. Exact spp => the first n_pix*spp sorted entries are
    contiguous per-pixel groups of spp -> reshape-sum. One multi-operand
    lax.sort carries the channels through the sort network (argsort + three
    full-length gathers measured slower)."""
    r, g, b, pix = rows
    keys = pix.astype(jnp.uint32)
    _, rs, gs, bs = jax.lax.sort((keys, r, g, b), num_keys=1,
                                 is_stable=True)
    total = n_pix * spp
    img = jnp.stack([rs[:total].reshape(n_pix, spp).sum(axis=1),
                     gs[:total].reshape(n_pix, spp).sum(axis=1),
                     bs[:total].reshape(n_pix, spp).sum(axis=1)],
                    axis=1) / spp
    n_done = jnp.sum((keys != jnp.uint32(0xFFFFFFFF)).astype(jnp.uint32))
    return img, n_done


# ---------------------------------------------------------------------------
# Differentiable streaming wavefront — the fwd+bwd throughput path.
#
# The lockstep grad path pays (max_bounces+1) full-width traversals per ray
# even though the mean path is ~1.6 segments (teapot: 52 ms forward for 64k
# strided rays, BASELINE.md r3). Early exit cannot help there: strided ray
# sets keep every batch live. The stream structure CAN: a small pool with
# immediate respawn does total work ~ sum(path lengths) instead of
# N x (max_bounces+1). Because the inverse-rendering loss is separable per
# ray (parallel/mesh.py loss_fn), terminated lanes fold their squared error
# into a scalar accumulator the moment they finish — no binning sort, no
# scatter — and the whole scan differentiates with the same named-residual
# checkpoint policy as lockstep ("trace"/"shadow" saved; shading remats).
# Radiance per ray is bit-compatible with lockstep.sample_radiance (same
# counter-RNG streams), so this is the same estimator, restructured.
# ---------------------------------------------------------------------------

def _stream_loss_segment(scene, params, cfg, pixel_idx, sample_idx, target,
                         carry, weight=None):
    """One differentiable pooled segment: advance every live lane one
    bounce, fold finished lanes' loss contribution (see _fold_loss) into
    the accumulator, respawn from the strided ray list."""
    n = pixel_idx.shape[0]
    sample_vec = _sample_vec(sample_idx, n)
    state, ray_id, counter, loss_acc, n_done = carry

    hit, terminate, ei, wo, new_t, s_pdf, singular, path_len = \
        _segment_core(scene, params, cfg, state)
    terminate = terminate & state.alive
    done = terminate & (path_len > 0)

    loss_acc = _fold_loss(loss_acc, ei, done, ray_id, target, weight, n)
    n_done = n_done + jnp.sum(done.astype(jnp.uint32))

    rank = jnp.cumsum(terminate.astype(jnp.uint32)) - terminate
    new_ray = counter + rank
    can = terminate & (new_ray < n)
    n_spawned = jnp.sum(can.astype(jnp.uint32))
    new_ray_c = jnp.where(can, new_ray, 0)
    new_pix = pixel_idx[new_ray_c].astype(jnp.uint32)
    samp = sample_vec[new_ray_c]
    r_orig, r_dir = _raygen(params, cfg, new_pix, samp)

    state = PathState(
        orig=vm.where3(terminate, r_orig, hit.p + common.OFFSET_CONT * wo),
        dir=vm.where3(terminate, r_dir, wo),
        throughput=vm.where3(terminate, jnp.ones_like(new_t), new_t),
        radiance=vm.where3(terminate, jnp.zeros_like(ei), ei),
        pixel_index=jnp.where(terminate, new_pix, state.pixel_index),
        sample_index=jnp.where(terminate, samp, state.sample_index),
        path_len=jnp.where(terminate, 0, path_len).astype(jnp.uint32),
        last_pdf_w=jnp.where(terminate, 1.0, s_pdf),
        last_specular=jnp.where(terminate, True, singular),
        alive=jnp.where(terminate, can, state.alive),
    )
    ray_id = jnp.where(terminate, new_ray_c.astype(jnp.uint32), ray_id)
    return (state, ray_id, counter + n_spawned, loss_acc, n_done)


def _sample_vec(sample_idx, n: int):
    """Per-ray sample indices: a scalar broadcasts (the single-spp form);
    an (n,) array gives each listed pixel its own sample id so one loss
    batch can hold SEVERAL samples per pixel (multi-spp optimizer steps
    amortize the fixed per-segment pallas floor, BASELINE r4)."""
    return jnp.broadcast_to(jnp.asarray(sample_idx, jnp.uint32), (n,))


def _fold_loss(loss_acc, ei, done, ray_id, target, weight, n: int):
    """Fold finished lanes into the scalar accumulator. Two forms:
    L2 (weight None): sum((ei - target[ray])^2) — the self-contained
    inverse-rendering loss. WEIGHTED: sum(weight[ray] . ei) with
    stop-gradient weights — the primitive the production optimizer uses
    to assemble the paired-sample gradient (I_B - t).dI_A + (I_A - t).dI_B
    as per-ray folds (render/optimize.py; weights come from an
    independent forward pass, so no per-pixel binning enters the
    differentiated graph and no scatter appears in the backward)."""
    idx = jnp.minimum(ray_id, jnp.uint32(n - 1))
    if weight is None:
        diff = ei - target[idx]
        return loss_acc + jnp.sum(
            jnp.where(done[:, None], diff * diff, 0.0))
    w = jax.lax.stop_gradient(weight)[idx]
    return loss_acc + jnp.sum(jnp.where(done[:, None], w * ei, 0.0))


def _stream_loss_init(params, cfg, pixel_idx, sample_idx, pool: int):
    n = pixel_idx.shape[0]
    sample_vec = _sample_vec(sample_idx, n)
    lane = jnp.arange(pool, dtype=jnp.uint32)
    alive0 = lane < n
    ray0 = jnp.minimum(lane, jnp.uint32(n - 1))
    pix0 = pixel_idx[ray0].astype(jnp.uint32)
    samp = sample_vec[ray0]
    orig, dir = _raygen(params, cfg, pix0, samp)
    state = PathState(
        orig=orig, dir=dir,
        throughput=jnp.ones((pool, 3), jnp.float32),
        radiance=jnp.zeros((pool, 3), jnp.float32),
        pixel_index=pix0, sample_index=samp,
        path_len=jnp.zeros((pool,), jnp.uint32),
        last_pdf_w=jnp.ones((pool,), jnp.float32),
        last_specular=jnp.ones((pool,), bool),
        alive=alive0,
    )
    return (state, ray0, jnp.uint32(min(pool, n)),
            jnp.float32(0.0), jnp.uint32(0))


def _stream_ckpt_policy():
    """Checkpoint policy for the differentiable stream scan. Default:
    save ONLY the named traversal/occlusion residuals (backward remats
    shading — minimal memory, never re-runs a traversal kernel).
    FLUCTUS_STREAM_SAVE=all saves every intermediate instead (no remat:
    backward is a pure transpose — trades HBM for compute; A/B on HW)."""
    import os
    if os.environ.get("FLUCTUS_STREAM_SAVE", "named") == "all":
        return jax.checkpoint_policies.everything_saveable
    return jax.checkpoint_policies.save_only_these_names(
        "trace", "shadow")


def _pend_init(pool: int):
    """Neutralized no-op pending shadow state (deferred-NEE carry)."""
    z3 = jnp.zeros((pool, 3), jnp.float32)
    o, d = common.neutralize_rays(z3, z3.at[:, 2].set(1.0),
                                  jnp.zeros((pool,), bool))
    return (o, d, jnp.full((pool,), 1e-6, jnp.float32), z3)


def _stream_loss_segment_d(scene, params, cfg, pixel_idx, sample_idx,
                           target, carry, weight=None):
    """Deferred-shadow variant of _stream_loss_segment: the previous
    segment's NEE shadow rays ride in the SAME traversal call as this
    segment's extension rays (common.trace_scene_with_shadow), and a
    finished sample's loss folds one segment late, after its final
    shadow ray resolves (reference: wf_logic.cl:134-156)."""
    n = pixel_idx.shape[0]
    sample_vec = _sample_vec(sample_idx, n)
    (state, ray_id, counter, loss_acc, n_done, pend, fin_ray,
     fin_ei) = carry

    (hit, terminate, ei, wo, new_t, s_pdf, singular, path_len, resolved,
     pend2) = _segment_core(scene, params, cfg, state, pend=pend)

    # credit the resolved NEE: to the finished sample awaiting it, else
    # to the live path that generated it
    fin_has = fin_ray >= 0
    fin_total = fin_ei + resolved
    loss_acc = _fold_loss(loss_acc, fin_total, fin_has,
                          jnp.clip(fin_ray, 0, n - 1).astype(jnp.uint32),
                          target, weight, n)
    n_done = n_done + jnp.sum(fin_has.astype(jnp.uint32))
    ei = ei + vm.where3(~fin_has, resolved, jnp.zeros_like(resolved))

    terminate = terminate & state.alive
    done = terminate & (path_len > 0)
    fin_ray_n = jnp.where(done, ray_id.astype(jnp.int32), -1)
    fin_ei_n = vm.where3(done, ei, jnp.zeros_like(ei))

    rank = jnp.cumsum(terminate.astype(jnp.uint32)) - terminate
    new_ray = counter + rank
    can = terminate & (new_ray < n)
    n_spawned = jnp.sum(can.astype(jnp.uint32))
    new_ray_c = jnp.where(can, new_ray, 0)
    new_pix = pixel_idx[new_ray_c].astype(jnp.uint32)
    samp = sample_vec[new_ray_c]
    r_orig, r_dir = _raygen(params, cfg, new_pix, samp)

    state = PathState(
        orig=vm.where3(terminate, r_orig, hit.p + common.OFFSET_CONT * wo),
        dir=vm.where3(terminate, r_dir, wo),
        throughput=vm.where3(terminate, jnp.ones_like(new_t), new_t),
        radiance=vm.where3(terminate, jnp.zeros_like(ei), ei),
        pixel_index=jnp.where(terminate, new_pix, state.pixel_index),
        sample_index=jnp.where(terminate, samp, state.sample_index),
        path_len=jnp.where(terminate, 0, path_len).astype(jnp.uint32),
        last_pdf_w=jnp.where(terminate, 1.0, s_pdf),
        last_specular=jnp.where(terminate, True, singular),
        alive=jnp.where(terminate, can, state.alive),
    )
    ray_id = jnp.where(terminate, new_ray_c.astype(jnp.uint32), ray_id)
    return (state, ray_id, counter + n_spawned, loss_acc, n_done, pend2,
            fin_ray_n, fin_ei_n)


def stream_loss_deferred(scene: DeviceScene, params: RenderParams,
                         cfg: RenderConfig, pixel_idx, sample_idx, target,
                         pool: int, n_segments: int, weight=None):
    """Deferred-shadow stream loss: one fused traversal per segment.
    Identical estimator to stream_loss (same RNG streams, same MIS
    weights; only the shadow resolve timing and float summation order
    shift). Size n_segments with plan_stream_segments(deferred=True).
    weight: see stream_loss."""
    if not (cfg.sample_expl and (cfg.use_env_map or cfg.use_area_light)):
        # no NEE => no shadow rays to defer; the immediate form is the
        # same estimator without the no-op fused shadow half (r3 advisor)
        return stream_loss(scene, params, cfg, pixel_idx, sample_idx,
                           target, pool, n_segments, weight=weight)
    n = pixel_idx.shape[0]
    base = _stream_loss_init(params, cfg, pixel_idx, sample_idx, pool)
    carry = base + (_pend_init(pool),
                    jnp.full((pool,), -1, jnp.int32),
                    jnp.zeros((pool, 3), jnp.float32))

    def body(carry, _):
        return _stream_loss_segment_d(scene, params, cfg, pixel_idx,
                                      sample_idx, target, carry,
                                      weight=weight), None

    ckpt = jax.checkpoint(body, policy=_stream_ckpt_policy())
    carry, _ = jax.lax.scan(ckpt, carry, None, length=n_segments)
    loss_acc, n_done = carry[3], carry[4]
    if weight is not None:
        return loss_acc, n_done
    return loss_acc / jnp.float32(n * 3), n_done


def stream_loss(scene: DeviceScene, params: RenderParams, cfg: RenderConfig,
                pixel_idx, sample_idx, target, pool: int, n_segments: int,
                weight=None):
    """Differentiable loss over one sample per listed pixel, computed by
    the pooled streaming wavefront. Default form: mean squared error vs
    target[ray]/3n. With `weight` (n, 3): returns the RAW weighted sum
    sum_k stop_grad(weight[k]) . radiance_k — the building block for
    paired-sample gradients (render/optimize.py). Returns
    (loss, n_done); callers MUST check n_done == len(pixel_idx) (see
    plan_stream_segments for sizing n_segments — undrained rays would
    silently drop loss terms)."""
    n = pixel_idx.shape[0]
    carry = _stream_loss_init(params, cfg, pixel_idx, sample_idx, pool)

    def body(carry, _):
        return _stream_loss_segment(scene, params, cfg, pixel_idx,
                                    sample_idx, target, carry,
                                    weight=weight), None

    ckpt = jax.checkpoint(body, policy=_stream_ckpt_policy())
    carry, _ = jax.lax.scan(ckpt, carry, None, length=n_segments)
    _, _, _, loss_acc, n_done = carry
    if weight is not None:
        return loss_acc, n_done
    return loss_acc / jnp.float32(n * 3), n_done


@partial(jax.jit, static_argnames=("cfg", "pool", "n_segments"))
def stream_radiance(scene: DeviceScene, params: RenderParams,
                    cfg: RenderConfig, pixel_idx, sample_idx,
                    pool: int, n_segments: int):
    """FORWARD-ONLY per-ray radiance over a (pixel, sample) ray list via
    the pooled stream: each segment emits finished lanes' radiance as
    write-once rows keyed by ray id; one sort puts exactly one row per
    ray id in list order (scatter-free). Returns ((n, 3) radiance,
    n_done). Not differentiable by design — the backward of the binning
    sort would be a pathological TPU scatter; the optimizer instead
    computes gradients through the weighted stream_loss fold with
    weights DERIVED from this pass (render/optimize.py)."""
    n = pixel_idx.shape[0]
    carry = _stream_loss_init(params, cfg, pixel_idx, sample_idx, pool)

    def seg(c, _):
        state, ray_id, counter, loss_acc, n_done = c
        hit, terminate, ei, wo, new_t, s_pdf, singular, path_len = \
            _segment_core(scene, params, cfg, state)
        terminate = terminate & state.alive
        done = terminate & (path_len > 0)
        row_ray = jnp.where(done, ray_id.astype(jnp.int32), -1)
        rows = (jnp.where(done, ei[:, 0], 0.0),
                jnp.where(done, ei[:, 1], 0.0),
                jnp.where(done, ei[:, 2], 0.0), row_ray)
        n_done = n_done + jnp.sum(done.astype(jnp.uint32))

        sample_vec = _sample_vec(sample_idx, n)
        rank = jnp.cumsum(terminate.astype(jnp.uint32)) - terminate
        new_ray = counter + rank
        can = terminate & (new_ray < n)
        n_spawned = jnp.sum(can.astype(jnp.uint32))
        new_ray_c = jnp.where(can, new_ray, 0)
        new_pix = pixel_idx[new_ray_c].astype(jnp.uint32)
        samp = sample_vec[new_ray_c]
        r_orig, r_dir = _raygen(params, cfg, new_pix, samp)
        state = PathState(
            orig=vm.where3(terminate, r_orig,
                           hit.p + common.OFFSET_CONT * wo),
            dir=vm.where3(terminate, r_dir, wo),
            throughput=vm.where3(terminate, jnp.ones_like(new_t), new_t),
            radiance=vm.where3(terminate, jnp.zeros_like(ei), ei),
            pixel_index=jnp.where(terminate, new_pix, state.pixel_index),
            sample_index=jnp.where(terminate, samp, state.sample_index),
            path_len=jnp.where(terminate, 0, path_len).astype(jnp.uint32),
            last_pdf_w=jnp.where(terminate, 1.0, s_pdf),
            last_specular=jnp.where(terminate, True, singular),
            alive=jnp.where(terminate, can, state.alive),
        )
        ray_id2 = jnp.where(terminate, new_ray_c.astype(jnp.uint32),
                            ray_id)
        return (state, ray_id2, counter + n_spawned, loss_acc, n_done), \
            rows

    (_, _, _, _, n_done), rows = jax.lax.scan(
        seg, carry, None, length=n_segments)
    r, g, b, ray = (x.reshape(-1) for x in rows)
    keys = jnp.where(ray >= 0, ray, jnp.int32(0x7FFFFFFF)).astype(
        jnp.uint32)
    _, rs, gs, bs = jax.lax.sort((keys, r, g, b), num_keys=1,
                                 is_stable=True)
    rad = jnp.stack([rs[:n], gs[:n], bs[:n]], axis=1)
    return rad, n_done


@partial(jax.jit, static_argnames=("cfg", "pool", "cap", "deferred"))
def plan_stream_segments(scene, params, cfg, pixel_idx, sample_idx,
                         pool: int, cap: int = 4096,
                         deferred: bool = False):
    """Segment count needed to drain the ray list at this pool size: runs
    the same segment body (non-diff) in a while_loop until every lane is
    done. Host code rounds the result up (e.g. to a multiple of 4) so one
    compiled stream_loss program serves nearby drain lengths."""
    if deferred and not (cfg.sample_expl
                         and (cfg.use_env_map or cfg.use_area_light)):
        deferred = False  # stream_loss_deferred falls back to immediate
    n = pixel_idx.shape[0]
    target = jnp.zeros((n, 3), jnp.float32)
    carry0 = _stream_loss_init(params, cfg, pixel_idx, sample_idx, pool)
    if deferred:
        carry0 = carry0 + (_pend_init(pool),
                           jnp.full((pool,), -1, jnp.int32),
                           jnp.zeros((pool, 3), jnp.float32))

    def cond(s):
        k, carry = s
        more = jnp.any(carry[0].alive)
        if deferred:
            more = more | jnp.any(carry[6] >= 0)
        return (k < cap) & more

    def body(s):
        k, carry = s
        seg = (_stream_loss_segment_d if deferred
               else _stream_loss_segment)
        return k + 1, seg(scene, params, cfg, pixel_idx,
                          sample_idx, target, carry)

    k, carry = jax.lax.while_loop(cond, body, (jnp.int32(0), carry0))
    return k, carry[4]
