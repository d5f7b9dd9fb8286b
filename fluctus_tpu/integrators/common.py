"""Shared path-tracing stages used by both integrators.

The reference spreads these across wf_logic.cl / mk_next_vertex.cl /
mk_sample_bsdf.cl; here each stage is a pure batched function over SoA
arrays. All stochastic decisions consume counter-based RNG draws keyed by
(pixel, sample, bounce, stream) so forward and path-replay backward passes
are bit-identical.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from fluctus_tpu.core import rng, samplers, vecmath as vm
from fluctus_tpu.core.types import (
    DeviceScene, Hit, RenderConfig, RenderParams)
from fluctus_tpu.ops import bsdf as bsdf_mod
from fluctus_tpu.ops import envmap as env_ops
from fluctus_tpu.ops import texture as tex_ops
from fluctus_tpu.ops import (ray_sort, traverse, traverse_mxu,
                             traverse_packed, traverse_pallas, traverse_wide)
from fluctus_tpu.ops.intersect import ray_area_light
from fluctus_tpu.ops.traverse_mxu import Traversal

T_MAX = jnp.float32(3.4e38)
OFFSET_SHADOW = 1e-3   # reference: wf_logic.cl:184 (orig = P - 1e-3*dir)
OFFSET_CONT = 1e-4     # reference: wf_mat_diffuse.cl:54 (P + 1e-4*newDir)


def _wbvh_bounds(wbvh):
    """Scene AABB from the root node's child boxes (empty slots have
    lo.x=+inf and are masked)."""
    root = max(int(wbvh.root_ref), 0)
    boxes = wbvh.nodes[root, 0:48].reshape(8, 6)
    valid = jnp.isfinite(boxes[:, 0])[:, None]
    lo = jnp.min(jnp.where(valid, boxes[:, 0:3], jnp.inf), axis=0)
    hi = jnp.max(jnp.where(valid, boxes[:, 3:6], -jnp.inf), axis=0)
    return lo, hi


def _pallas_closest(scene, orig, dir, t_max):
    if ((scene.bforest is not None or scene.ftables is not None)
            and not scene.wforest):
        # big scene without a packet forest: the streamed forest kernel is
        # the only VMEM-feasible Pallas path
        return _mxu_closest(scene, orig, dir, t_max)
    lo, hi = _wbvh_bounds(scene.wbvh)
    if scene.wforest:
        fn = lambda o, d: traverse_pallas.traverse_closest_forest(
            scene.wforest, scene.wforest_maps, o, d, t_max)
    else:
        fn = lambda o, d: traverse_pallas.traverse_closest(scene.wbvh, o, d,
                                                           t_max)
    return ray_sort.sorted_apply(orig, dir, lo, hi, fn)


def _pallas_any(scene, orig, dir, lens):
    if ((scene.bforest is not None or scene.ftables is not None)
            and not scene.wforest):
        return _mxu_any(scene, orig, dir, lens)
    lo, hi = _wbvh_bounds(scene.wbvh)
    keys = ray_sort.ray_sort_keys(orig, dir, lo, hi)
    order = jnp.argsort(keys)
    inv = jnp.argsort(order)
    if scene.wforest:
        blocked = traverse_pallas.traverse_any_forest(
            scene.wforest, orig[order], dir[order], lens[order])
    else:
        blocked = traverse_pallas.traverse_any(scene.wbvh, orig[order],
                                               dir[order], lens[order])
    return blocked[inv]


def _mxu_ok(scene: DeviceScene) -> bool:
    if scene.bforest is not None or scene.ftables is not None:
        return True
    if scene.wforest:
        return traverse_mxu.forest_fits_vmem(scene.wforest)
    return scene.wbvh.root_ref >= 0 and traverse_mxu.fits_vmem(scene.wbvh)


def _sorted_trav(orig, dir, run):
    """Octant-sort rays before a per-lane stack traversal, unsort after.
    The MXU kernel's per-BLOCK trip count is the max over its lanes, so
    grouping like-direction rays cuts divergence on long interior walks
    (kitchen-class: traversal is 87% of the frame and walks are ~20x
    teapot's). Teapot-scale scenes measured sort-cost > gain (r3e), so
    this is opt-in via FLUCTUS_TRAV_SORT=octant."""
    key = ((dir[:, 0] < 0).astype(jnp.int32)
           | ((dir[:, 1] < 0).astype(jnp.int32) << 1)
           | ((dir[:, 2] < 0).astype(jnp.int32) << 2))
    order = jnp.argsort(key).astype(jnp.int32)
    rank = jnp.argsort(order).astype(jnp.int32)
    tr = run(orig[order], dir[order])
    return jax.tree_util.tree_map(lambda a: a[rank], tr)


def _mxu_closest(scene, orig, dir, t_max):
    if scene.bforest is not None:
        from fluctus_tpu.ops import traverse_brute
        return traverse_brute.traverse_closest(scene.bforest, orig, dir,
                                               t_max)
    if scene.ftables is not None:
        from fluctus_tpu.ops import traverse_forest
        return traverse_forest.traverse_closest(scene.ftables, orig, dir,
                                                t_max)
    if scene.wforest:
        return traverse_mxu.traverse_closest_forest(
            scene.wforest, scene.wforest_maps, orig, dir, t_max)
    if os.environ.get("FLUCTUS_TRAV_SORT") == "octant":
        return _sorted_trav(
            orig, dir,
            lambda o, d: traverse_mxu.traverse_closest(scene.wbvh, o, d,
                                                       t_max))
    return traverse_mxu.traverse_closest(scene.wbvh, orig, dir, t_max)


def _mxu_any(scene, orig, dir, lens):
    if scene.bforest is not None:
        from fluctus_tpu.ops import traverse_brute
        return traverse_brute.traverse_any(scene.bforest, orig, dir, lens)
    if scene.ftables is not None:
        from fluctus_tpu.ops import traverse_forest
        return traverse_forest.traverse_any(scene.ftables, orig, dir, lens)
    if scene.wforest:
        return traverse_mxu.traverse_any_forest(scene.wforest, orig, dir,
                                                lens)
    return traverse_mxu.traverse_any(scene.wbvh, orig, dir, lens)


def trace_scene(scene: DeviceScene, params: RenderParams, cfg: RenderConfig,
                orig: jnp.ndarray, dir: jnp.ndarray):
    """Closest-hit + optional area-light quad + attribute interpolation
    (reference: src/mk_next_vertex.cl:38-43, src/wf_extrays.cl:27-35).

    Hit attributes are wrapped in stop_gradient: visibility and hit
    parameters are non-differentiable by design (fixed-visibility pixel
    gradients, SURVEY §7 hard parts), which also keeps reverse-mode AD from
    attempting to differentiate the Pallas traversal kernels. Under the
    lockstep integrator's checkpoint policy the traversal result is saved
    as a named residual ("trace"), so the rematerialized backward never
    re-runs a traversal kernel."""
    tr = _traverse_closest_tr(scene, cfg, orig, dir, T_MAX)
    return hit_from_traversal(scene, params, cfg, orig, dir, tr)


def _check_backend_data(scene, cfg):
    if cfg.backend in ("jnp", "packed", "wide", "pallas") \
            and scene.wbvh is None:
        raise ValueError(
            f"backend '{cfg.backend}' needs the full hierarchy, but this "
            "scene was uploaded via the fast big-scene path (brute forest "
            "only). Use backend='mxu' or set FLUCTUS_FAST_BIG=0.")


def _traverse_closest_tr(scene, cfg, orig, dir, t_max):
    """Backend-dispatched raw closest traversal (t_max may be per-lane)."""
    _check_backend_data(scene, cfg)
    g = scene.geom
    if cfg.backend == "jnp":
        tr = traverse.traverse_closest(scene.bvh, g.v0, g.v1, g.v2, orig,
                                       dir, t_max)
    elif cfg.backend == "packed":
        tr = traverse_packed.traverse_closest(scene.pbvh, orig, dir, t_max)
    elif cfg.backend == "mxu" and _mxu_ok(scene):
        tr = _mxu_closest(scene, orig, dir, t_max)
    elif cfg.backend in ("pallas", "mxu"):
        tr = _pallas_closest(scene, orig, dir, t_max)
    else:
        tr = traverse_wide.traverse_closest(scene.wbvh, orig, dir, t_max)
    return tr


def hit_from_traversal(scene: DeviceScene, params: RenderParams,
                       cfg: RenderConfig, orig, dir, tr):
    """Hit record from a raw traversal result: stop-gradient + named
    residual + differentiable reparameterization + area-light quad (the
    second half of trace_scene, split out so fused ext+shadow traversals
    can share it)."""
    g = scene.geom
    tr = jax.lax.stop_gradient(tr)
    # named so lockstep's checkpoint policy saves the traversal result as
    # a residual: the rematerialized backward then never re-runs the
    # traversal kernels (their outputs are dead code under remat)
    tr = type(tr)(*(checkpoint_name(x, "trace") for x in tr))
    prim = tr.prim
    hit_tri = prim >= 0
    p_safe = jnp.maximum(prim, 0)

    # Differentiable hit reparameterization: only the prim ID (visibility)
    # is frozen; t/u/v are recomputed with Moller-Trumbore on the frozen
    # triangle, so gradients w.r.t. camera origin/direction (and later
    # vertex positions) flow exactly — stop-gradienting t itself biases
    # camera gradients because the true hit point slides along the surface
    # as the ray moves (fixed-visibility differentiable rendering; the
    # kernel's own t/u/v come from the same formula, so primal values are
    # unchanged up to float roundoff).
    a = g.v0[p_safe]
    e1 = g.v1[p_safe] - a
    e2 = g.v2[p_safe] - a
    pvec = vm.cross(dir, e2)
    det = vm.dot(e1, pvec)
    safe = hit_tri & (jnp.abs(det) > 1e-20)
    inv_det = 1.0 / jnp.where(safe, det, 1.0)
    tvec = orig - a
    u_d = vm.dot(tvec, pvec) * inv_det
    qvec = vm.cross(tvec, e1)
    v_d = vm.dot(dir, qvec) * inv_det
    t_d = vm.dot(e2, qvec) * inv_det
    # miss lanes keep a FINITE dummy t: orig + t_max*dir overflows f32 to
    # inf, and even though consumers mask miss lanes, inf in the untaken
    # where-branch turns reverse-mode gradients into NaN
    t_hit = jnp.where(safe, t_d, jnp.where(hit_tri, tr.t, 1.0))
    u = jnp.where(safe, u_d, tr.u)[:, None]
    v = jnp.where(safe, v_d, tr.v)[:, None]
    w = 1.0 - u - v
    n = vm.normalize(w * g.n0[p_safe] + u * g.n1[p_safe] + v * g.n2[p_safe])
    uv = w * g.uv0[p_safe] + u * g.uv1[p_safe] + v * g.uv2[p_safe]
    # clamp the hit point to a sane range: miss lanes ride NEUTRALIZED
    # rays with 3e37 origins (neutralize_rays), and a downstream
    # squared-distance (area-light NEE / implicit pdf) overflows to inf —
    # masked in the primal, but reverse-mode then multiplies a zero
    # cotangent by an inf partial and the NaN flows into SHARED leaves
    # like camera params (caught by the r4 camera-FD tests once the
    # tilted test camera had miss lanes). Identity within any real scene.
    p = jnp.clip(orig + t_hit[:, None] * dir, -1e15, 1e15)
    mat_id = jnp.where(hit_tri, g.mat_id[p_safe], 0)

    hit = Hit(t=jnp.where(safe, t_d, tr.t), prim=prim, p=p, n=n, uv=uv,
              mat_id=mat_id, area_light=jnp.zeros(prim.shape, bool))

    if cfg.use_area_light and cfg.sample_impl:
        al = params.area_light
        al_hit, al_t = ray_area_light(orig, dir, al.pos, al.right, al.up,
                                      al.normal, al.size, hit.t)
        hit = hit.replace(
            t=jnp.where(al_hit, al_t, hit.t),
            prim=jnp.where(al_hit, 0, hit.prim),
            p=vm.where3(al_hit, orig + al_t[:, None] * dir, hit.p),
            n=vm.where3(al_hit, jnp.broadcast_to(al.normal, hit.n.shape),
                        hit.n),
            mat_id=jnp.where(al_hit, 0, hit.mat_id),
            area_light=al_hit,
        )
    return hit


def trace_scene_with_shadow(scene, params, cfg, orig, dir,
                            sh_orig, sh_dir, sh_len,
                            check_area_quad: bool = True):
    """Fused extension + shadow traversal: ONE batched closest call over
    [ext rays ; shadow rays], the shadow half with per-lane t_max =
    sh_len so any hit before the light distance reads as blocked.

    Motivation (BASELINE r3e): each traversal pallas call carries a
    ~1.5 ms fixed floor nearly independent of ray count, and a stream
    segment's two traces are that floor twice. The deferred-shadow
    segment (reference: wf_shadowrays.cl traced in segment k, resolved
    by wf_logic.cl:134-156 in segment k+1) makes the two ray sets
    independent, so they share one call. Falls back to two calls on
    backends without per-lane t_max.

    Returns (hit, blocked)."""
    b = orig.shape[0]
    # the fused single call needs per-lane t_max: the in-VMEM mxu kernel
    # and the brute-chunk forest support it; treelet/packet forests don't
    fused = (cfg.backend == "mxu" and _mxu_ok(scene)
             and scene.ftables is None and not scene.wforest)
    if fused:
        o2 = jnp.concatenate([orig, sh_orig])
        d2 = jnp.concatenate([dir, sh_dir])
        t2 = jnp.concatenate([jnp.full((b,), T_MAX, jnp.float32),
                              jnp.maximum(sh_len, 1e-6)])
        if scene.bforest is not None:
            from fluctus_tpu.ops import traverse_brute
            tr2 = traverse_brute.traverse_closest(scene.bforest, o2, d2, t2)
        else:
            tr2 = traverse_mxu.traverse_closest(scene.wbvh, o2, d2, t2)
        tr = Traversal(*(x[:b] for x in tr2))
        blocked = tr2.prim[b:] >= 0
        hit = hit_from_traversal(scene, params, cfg, orig, dir, tr)
    else:
        hit = trace_scene(scene, params, cfg, orig, dir)
        blocked = _shadow_blocked(scene, params, cfg, sh_orig, sh_dir,
                                  jnp.maximum(sh_len, 1e-6),
                                  check_area_quad=False)
    blocked = jax.lax.stop_gradient(blocked)
    if check_area_quad and cfg.use_area_light:
        al = params.area_light
        q_hit, _ = ray_area_light(sh_orig, sh_dir, al.pos, al.right, al.up,
                                  al.normal, al.size,
                                  jnp.maximum(sh_len, 1e-6))
        blocked = blocked | q_hit
    blocked = checkpoint_name(blocked, "shadow")
    return hit, blocked


def make_shading_ctx(scene: DeviceScene, hit: Hit,
                     dir: jnp.ndarray) -> bsdf_mod.ShadingCtx:
    """Resolve material + textures + normal map + backface flip
    (reference: wf_logic.cl:180-184, mk_sample_bsdf.cl:47-54)."""
    m = scene.materials
    mid = hit.mat_id
    map_n = m.map_n[mid]
    n = tex_ops.tangent_space_normal(scene.geom, scene.atlas, hit.prim,
                                     hit.uv, hit.n, map_n)
    backface = vm.dot(n, dir) > 0.0
    n = vm.where3(backface, -n, n)
    kd = tex_ops.mat_albedo(scene.atlas, m.kd[mid], m.map_kd[mid], hit.uv)
    ks = tex_ops.mat_float3(scene.atlas, m.ks[mid], m.map_ks[mid], hit.uv)
    return bsdf_mod.ShadingCtx(
        n=n, backface=backface, kd=kd, ks=ks,
        ns=m.ns[mid], ni=m.ni[mid], bsdf_id=m.bsdf_id[mid])


class NeeResult(NamedTuple):
    contrib: jnp.ndarray  # (B, 3) radiance to add (already MIS weighted)


def _shadow_blocked(scene, params, cfg, orig, ldir, lens, check_area_quad):
    """Occlusion test incl. the (virtual) area-light quad blocking env rays
    (reference: mk_sample_bsdf.cl:88-93)."""
    _check_backend_data(scene, cfg)
    if cfg.backend == "jnp":
        g = scene.geom
        blocked = traverse.traverse_any(scene.bvh, g.v0, g.v1, g.v2, orig,
                                        ldir, lens)
    elif cfg.backend == "packed":
        blocked = traverse_packed.traverse_any(scene.pbvh, orig, ldir, lens)
    elif cfg.backend == "mxu" and _mxu_ok(scene):
        blocked = _mxu_any(scene, orig, ldir, lens)
    elif cfg.backend in ("pallas", "mxu"):
        blocked = _pallas_any(scene, orig, ldir,
                              lens * jnp.ones(orig.shape[0], jnp.float32))
    else:
        blocked = traverse_wide.traverse_any(scene.wbvh, orig, ldir, lens)
    if check_area_quad and cfg.use_area_light:
        al = params.area_light
        q_hit, _ = ray_area_light(orig, ldir, al.pos, al.right, al.up,
                                  al.normal, al.size, lens)
        blocked = blocked | q_hit
    return blocked


def neutralize_rays(orig, dir, active):
    """Replace inactive lanes' rays with guaranteed-miss rays so they do not
    expand packet unions or waste traversal steps (dead lanes in the
    lockstep integrator would otherwise re-trace stale rays)."""
    far = jnp.asarray([3.0e37, 3.0e37, 3.0e37], jnp.float32)
    up = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    o = vm.where3(active, orig, jnp.broadcast_to(far, orig.shape))
    d = vm.where3(active, dir, jnp.broadcast_to(up, dir.shape))
    return o, d


def nee_env(scene, params, cfg, ctx, sh_orig, wi, types_mask, pix, samp,
            bounce, light_pick_prob, active=None):
    """Next-event estimation against the env map via alias sampling
    (reference: mk_sample_bsdf.cl:71-117). The occlusion flag is saved as
    a named checkpoint residual ("shadow") so path-replay backward passes
    skip the shadow traversal."""
    u = rng.uniform(pix, samp, bounce, rng.Streams.LIGHT_U)
    L, direct_pdf_w, rad = env_ops.sample_alias_radiance(scene.envmap, u)
    L = vm.normalize(L)
    len_l = 2.0 * params.world_radius * jnp.ones(wi.shape[0], jnp.float32)

    f = bsdf_mod.bsdf_eval(ctx, wi, L, types_mask)
    cos_th = jnp.maximum(0.0, vm.dot(L, ctx.n))
    bsdf_pdf_w = jnp.maximum(0.0, bsdf_mod.bsdf_pdf(ctx, wi, L, types_mask))
    # trace only lanes whose contribution can be nonzero: the env alias
    # table samples the full sphere, so ~half the draws land below the
    # shading hemisphere on diffuse surfaces — culling them before the
    # occlusion trace halves shadow-traversal work at identical output
    # (blocked only ever gates a zero contribution)
    live = (cos_th > 0.0) & ~vm.is_zero(f) & (direct_pdf_w != 0.0)
    if active is not None:
        live = live & active
    sh_o, L_t = neutralize_rays(sh_orig, L, live)
    blocked = _shadow_blocked(scene, params, cfg, sh_o, L_t, len_l,
                              check_area_quad=True)
    blocked = checkpoint_name(jax.lax.stop_gradient(blocked), "shadow")
    weight = jnp.float32(1.0)
    if cfg.sample_impl:
        weight = (direct_pdf_w * light_pick_prob) / jnp.maximum(
            direct_pdf_w * light_pick_prob + bsdf_pdf_w, 1e-20)
    li = rad * params.env_strength
    denom = jnp.maximum(light_pick_prob * direct_pdf_w, 1e-20)
    contrib = f * li * (weight * cos_th / denom)[..., None]
    ok = (~blocked) & (direct_pdf_w != 0.0)
    return vm.where3(ok, contrib, jnp.zeros_like(contrib))


def nee_area(scene, params, cfg, ctx, sh_orig, wi, types_mask, pix, samp,
             bounce, light_pick_prob, shorten=1.0, active=None):
    """Next-event estimation against the rectangular area light
    (reference: mk_sample_bsdf.cl:120-155; WF shortens the ray by 0.995,
    wf_logic.cl:272)."""
    al = params.area_light
    u1 = rng.uniform(pix, samp, bounce, rng.Streams.LIGHT_AREA_U)
    u2 = rng.uniform(pix, samp, bounce, rng.Streams.LIGHT_AREA_V)
    pos_l, pdf_a = samplers.sample_area_light(al.pos, al.right, al.up,
                                              al.size, u1, u2)
    delta = pos_l - sh_orig
    dist = vm.length(delta)
    L = vm.normalize(delta)
    len_l = dist * shorten

    cos_light = jnp.maximum(vm.dot(al.normal, -L), 0.0)
    f = bsdf_mod.bsdf_eval(ctx, wi, L, types_mask)
    cos_th = jnp.maximum(0.0, vm.dot(L, ctx.n))
    direct_pdf_w = samplers.pdf_area_to_solid_angle(pdf_a, len_l, cos_light)
    bsdf_pdf_w = jnp.maximum(0.0, bsdf_mod.bsdf_pdf(ctx, wi, L, types_mask))
    # cull zero-contribution lanes before the occlusion trace (see nee_env)
    live = (cos_th > 0.0) & ~vm.is_zero(f) & (cos_light > 0.0)
    if active is not None:
        live = live & active
    sh_o, L_t = neutralize_rays(sh_orig, L, live)
    blocked = _shadow_blocked(scene, params, cfg, sh_o, L_t, len_l,
                              check_area_quad=False)
    blocked = checkpoint_name(jax.lax.stop_gradient(blocked), "shadow")
    weight = jnp.float32(1.0)
    if cfg.sample_impl:
        weight = (direct_pdf_w * light_pick_prob) / jnp.maximum(
            direct_pdf_w * light_pick_prob + bsdf_pdf_w, 1e-20)
    denom = jnp.maximum(light_pick_prob * direct_pdf_w, 1e-20)
    contrib = al.emission * (f * (weight * cos_th / denom)[..., None])
    ok = (~blocked) & (cos_light > 0.0)
    return vm.where3(ok, contrib, jnp.zeros_like(contrib))


def implicit_env_weight(scene, params, cfg, dir, last_pdf_w, last_specular,
                        path_len, light_pick_prob):
    """MIS weight for an implicit env-map hit
    (reference: wf_logic.cl:84-107, mk_next_vertex.cl:74-96)."""
    if not (cfg.sample_impl and cfg.sample_expl and cfg.use_env_map):
        return jnp.ones(dir.shape[0], jnp.float32)
    direct_pdf_w = env_ops.pdf_dir(scene.envmap, dir)
    actual = last_pdf_w * light_pick_prob
    w = actual / jnp.maximum(actual + direct_pdf_w, 1e-20)
    return jnp.where((path_len > 1) & ~last_specular, w, 1.0)


def implicit_area_weight(params, cfg, hit: Hit, orig, dir, last_pdf_w,
                         last_specular, path_len, light_pick_prob):
    """MIS weight for an implicit area-light hit
    (reference: wf_logic.cl:109-132, mk_next_vertex.cl:98-117)."""
    if not cfg.sample_expl:
        return jnp.ones(dir.shape[0], jnp.float32)
    al = params.area_light
    pdf_a = 1.0 / (4.0 * al.size[0] * al.size[1])
    dist = vm.length(hit.p - orig)
    cos_l = vm.dot(vm.normalize(-dir), hit.n)
    direct_pdf_w = samplers.pdf_area_to_solid_angle(pdf_a, dist, cos_l)
    w = last_pdf_w / jnp.maximum(
        last_pdf_w + direct_pdf_w * light_pick_prob, 1e-20)
    return jnp.where((path_len > 1) & ~last_specular, w, 1.0)
