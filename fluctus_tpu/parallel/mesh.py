"""Device-mesh data parallelism over the ray/pixel axis.

The reference's entire parallel story is 2²⁰ work-items on one OpenCL device
(SURVEY §2.4); this module is the new first-class scale-out design: a 1-D
`jax.sharding.Mesh` over all chips, path/pixel batches sharded on axis
"rays", scene replicated per chip, and scene-parameter gradients all-reduced
by GSPMD-inserted psums (the only cross-chip traffic — rides ICI).

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; the
mesh then spans all processes and per-host pixel tiles arrive via the same
shardings (DCN only at slice boundaries).
"""
from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fluctus_tpu.core.types import DeviceScene, RenderConfig, RenderParams
from fluctus_tpu.integrators import lockstep, wavefront

RAY_AXIS = "rays"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def ray_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(RAY_AXIS))


def place(scene: DeviceScene, params: RenderParams, mesh: Mesh):
    """Replicate scene + params across the mesh.

    Multi-process: device_put to a replicated sharding runs a cross-process
    equality assert that is NaN-hostile (BVH leaf tables carry NaN padding
    from int-bit reinterpretation, and NaN != NaN) — go through the
    host-local -> global path instead, which trusts each process's local
    copy."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        host = jax.tree_util.tree_map(np.asarray, (scene, params))
        return multihost_utils.host_local_array_to_global_array(
            host, mesh, P())
    rep = replicated(mesh)
    scene = jax.device_put(scene, rep)
    params = jax.device_put(params, rep)
    return scene, params


@partial(jax.jit, static_argnames=("cfg",))
def _sample_radiance_jit(scene, params, cfg, pixel_idx, sample_idx):
    return lockstep.sample_radiance(scene, params, cfg, pixel_idx, sample_idx)


def render_sharded(scene: DeviceScene, params: RenderParams,
                   cfg: RenderConfig, spp: int, mesh: Mesh) -> jnp.ndarray:
    """Data-parallel exact-spp render: pixels sharded over chips, scene
    replicated; no cross-chip traffic until the final host gather."""
    n_pix = cfg.width * cfg.height
    n_dev = mesh.size
    pad = (-n_pix) % n_dev
    idx = jnp.arange(n_pix + pad, dtype=jnp.uint32)
    idx = jax.device_put(idx, ray_sharded(mesh))
    scene, params = place(scene, params, mesh)

    acc = jnp.zeros((n_pix + pad, 3), jnp.float32,
                    device=ray_sharded(mesh))
    for s in range(spp):
        acc = acc + _sample_radiance_jit(scene, params, cfg, idx,
                                         jnp.uint32(s))
    img = acc[:n_pix] / spp
    return img.reshape(cfg.height, cfg.width, 3)


@functools.lru_cache(maxsize=None)
def _stream_sharded_fns(mesh: Mesh, cfg: RenderConfig, spp: int, n_seg: int,
                        pool: int, n_loc: int):
    """Jitted shard_map stages for the sharded streaming wavefront, cached
    per (mesh, config) so repeated frames reuse the compiled programs.

    Each shard owns a contiguous pixel range [d*n_loc, (d+1)*n_loc) and
    streams it with a purely LOCAL pool, spawn budget, and binning sort —
    zero cross-chip traffic until the host gathers the image (the ray/tile
    DP design of SURVEY §2.4; reference analogue: none, its whole parallel
    story is one OpenCL device)."""
    total_loc = n_loc * spp

    def init_local(params):
        d = jax.lax.axis_index(RAY_AXIS).astype(jnp.uint32)
        state, counters = wavefront.init_stream_state(
            params, cfg, pool, pix_base=d * jnp.uint32(n_loc),
            n_pix_local=n_loc)
        return state, counters[None]

    def launch_local(scene, params, state, counters):
        d = jax.lax.axis_index(RAY_AXIS).astype(jnp.uint32)
        base = d * jnp.uint32(n_loc)

        def body(carry, _):
            st, ct = carry
            st, ct, rows = wavefront._stream_segment(
                scene, params, cfg, st, ct, spp,
                pix_base=base, n_pix_local=n_loc)
            return (st, ct), rows

        (state, counters), rows = jax.lax.scan(
            body, (state, counters[0]), None, length=n_seg)
        return state, counters[None], rows, jnp.any(state.alive)[None]

    def bin_local(rows):
        d = jax.lax.axis_index(RAY_AXIS)
        base = (d * n_loc).astype(jnp.int32)
        r, g, b, pix = rows
        pix = jnp.where(pix >= 0, pix - base, -1)
        flat = [x.reshape(-1) for x in (r, g, b, pix)]
        img, n_done = wavefront._bin_rows(
            wavefront.bucket_rows(flat, total_loc, pool * n_seg), n_loc, spp)
        return img, n_done[None]

    sharded = P(RAY_AXIS)
    rows_spec = (P(None, RAY_AXIS),) * 4
    # check_vma off (like grad_step_stream below): Pallas traversal
    # kernels inside the segment produce out_shapes without vma
    # annotations, which the static varying-axis checker rejects; the
    # stages are purely shard-local (no collectives), verified by the
    # 8-device tests + dryrun
    init_fn = jax.jit(jax.shard_map(
        init_local, mesh=mesh, in_specs=(P(),),
        out_specs=(sharded, sharded), check_vma=False))
    launch_fn = jax.jit(jax.shard_map(
        launch_local, mesh=mesh,
        in_specs=(P(), P(), sharded, sharded),
        out_specs=(sharded, sharded, rows_spec, sharded),
        check_vma=False),
        donate_argnums=(2, 3))
    bin_fn = jax.jit(jax.shard_map(
        bin_local, mesh=mesh, in_specs=(rows_spec,),
        out_specs=(sharded, sharded), check_vma=False))
    return init_fn, launch_fn, bin_fn


def render_stream_sharded(scene: DeviceScene, params: RenderParams,
                          cfg: RenderConfig, spp: int, mesh: Mesh,
                          segments_per_launch: int = 8):
    """Data-parallel streaming wavefront: contiguous pixel stripes per chip,
    per-shard pools/respawn/binning, scene replicated. Matches
    `wavefront.render_stream` output up to per-pixel summation order.
    Returns ((H, W, 3) image, per-shard counters (n_dev, 3))."""
    n_pix = cfg.width * cfg.height
    n_dev = mesh.size
    n_loc = -(-n_pix // n_dev)            # phantom tail pixels render and
    n_pad = n_loc * n_dev                 # are sliced off the final image
    pool = min(cfg.pool_size, n_loc * spp)
    init_fn, launch_fn, bin_fn = _stream_sharded_fns(
        mesh, cfg, spp, segments_per_launch, pool, n_loc)

    scene, params = place(scene, params, mesh)
    state, counters = init_fn(params)

    cap = (n_loc * spp // pool + cfg.max_bounces + 2) * 8 + 64
    it = 0
    chunks = []
    pending = []  # lagged drain checks (hide relay sync latency)
    while it < cap:
        state, counters, rows, alive = launch_fn(scene, params, state,
                                                 counters)
        chunks.append(rows)
        it += segments_per_launch
        pending.append(jnp.any(alive))
        if len(pending) >= 2 and not bool(pending.pop(0)):
            break

    rows = tuple(jnp.concatenate([c[i] for c in chunks], axis=0)
                 for i in range(4))
    img, n_done = bin_fn(rows)
    done = int(jnp.sum(n_done))
    if done != n_pad * spp:
        raise RuntimeError(
            f"sharded stream drain incomplete: {done}/{n_pad * spp} "
            f"samples (cap {cap})")
    return (img[:n_pix].reshape(cfg.height, cfg.width, 3),
            counters)


# camera leaves graftable by loss_fn: diff_params key "cam_<field>"
_CAM_FIELDS = ("pos", "dir", "up", "right", "fov", "aperture_size",
               "focal_dist")


def graft(diff_params, scene: DeviceScene, params):
    """Graft differentiable leaves into (scene, params).

    `diff_params` is a dict with any of: kd, ks, ns, ni (materials),
    env_image, env_strength, and camera fields cam_pos / cam_dir / cam_up /
    cam_right / cam_fov / cam_aperture_size / cam_focal_dist — the BASELINE
    config-5 parameter surface (reference: Camera lives inside RenderParams,
    src/geom.h:163-180). Gradients flow through the smooth shading/camera
    math with fixed visibility (the hit's primitive id is frozen; see
    integrators/common.py trace reparameterization)."""
    mats = scene.materials
    if "kd" in diff_params:
        mats = mats.replace(kd=diff_params["kd"])
    if "ks" in diff_params:
        mats = mats.replace(ks=diff_params["ks"])
    if "ns" in diff_params:
        mats = mats.replace(ns=diff_params["ns"])
    if "ni" in diff_params:
        mats = mats.replace(ni=diff_params["ni"])
    env = scene.envmap
    if "env_image" in diff_params:
        env = env.replace(image=diff_params["env_image"])
    scene = scene.replace(materials=mats, envmap=env)
    cam = params.camera
    cam_updates = {f: diff_params[f"cam_{f}"] for f in _CAM_FIELDS
                   if f"cam_{f}" in diff_params}
    if cam_updates:
        cam = cam.replace(**cam_updates)
    params = params.replace(camera=cam)
    if "env_strength" in diff_params:
        params = params.replace(env_strength=diff_params["env_strength"])
    return scene, params


def loss_fn(diff_params, scene: DeviceScene, params, cfg, pixel_idx,
            sample_idx, target):
    """L2 image loss with differentiable leaves grafted into the scene and
    render params (see graft for the parameter surface)."""
    scene, params = graft(diff_params, scene, params)
    radiance = lockstep.sample_radiance(scene, params, cfg, pixel_idx,
                                        sample_idx)
    return jnp.mean((radiance - target) ** 2)


@partial(jax.jit, static_argnames=("cfg", "lr"))
def grad_step(diff_params, scene, params, cfg, pixel_idx, sample_idx, target,
              lr=1e-2):
    """One SGD step on scene parameters. Under a mesh with `pixel_idx` and
    `target` ray-sharded, the mean-loss grad generates a psum over chips —
    the gradient all-reduce of SURVEY §2.4 — inserted by GSPMD."""
    loss, grads = jax.value_and_grad(loss_fn)(diff_params, scene, params,
                                              cfg, pixel_idx, sample_idx,
                                              target)
    new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g,
                                        diff_params, grads)
    return loss, new_params


def grad_step_stream(diff_params, scene, params, cfg, pixel_idx,
                     sample_idx, target, pool: int, n_segments: int,
                     mesh: Mesh, lr=1e-2):
    """One SGD step through the STREAMING fwd+bwd path, data-parallel
    over chips: each shard drains its own pool over its contiguous slice
    of the ray list (the stream's respawn cumsum is shard-local — no
    cross-chip ray migration, SURVEY §2.4), scene/params replicated,
    loss/grads pmean'd over the rays axis. pixel_idx/target must be
    ray-sharded; returns (loss, new_params, n_done_total)."""
    from jax.sharding import PartitionSpec as P_

    def local(diff, pix, tgt):
        def lf(d):
            return loss_fn_stream(d, scene, params, cfg, pix, sample_idx,
                                  tgt, pool, n_segments, deferred=True)
        (loss, n_done), grads = jax.value_and_grad(lf, has_aux=True)(diff)
        loss = jax.lax.pmean(loss, RAY_AXIS)
        grads = jax.lax.pmean(grads, RAY_AXIS)
        n_done = jax.lax.psum(n_done, RAY_AXIS)
        new = jax.tree_util.tree_map(lambda p, g: p - lr * g, diff, grads)
        return loss, new, n_done

    # check_vma off: the stream's scan carry starts replicated (pool init
    # from closure constants) and becomes rays-varying inside the loop,
    # which the static varying-axis checker rejects; collectives here are
    # just the final pmean/psum, verified by the 8-device test
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P_(), P_(RAY_AXIS), P_(RAY_AXIS)),
        out_specs=(P_(), P_(), P_()), check_vma=False)
    return fn(diff_params, pixel_idx, target)


def loss_fn_stream(diff_params, scene: DeviceScene, params, cfg, pixel_idx,
                   sample_idx, target, pool: int, n_segments: int,
                   deferred: bool = False, weight=None):
    """L2 image loss via the differentiable STREAMING wavefront
    (wavefront.stream_loss): identical value to loss_fn (bit-compatible
    counter RNG) at ~E[path len]/(max_bounces+1) of the traced work — the
    fwd+bwd throughput path. With `weight`, the weighted-fold form (see
    wavefront.stream_loss). Returns (loss, n_done); n_done must equal
    len(pixel_idx) (size n_segments with wavefront.plan_stream_segments)."""
    from fluctus_tpu.integrators import wavefront
    scene, params = graft(diff_params, scene, params)
    fn = (wavefront.stream_loss_deferred if deferred
          else wavefront.stream_loss)
    return fn(scene, params, cfg, pixel_idx, sample_idx,
              target, pool, n_segments, weight=weight)
