"""Inverse-rendering driver (new capability; BASELINE config 5): optimize
scene parameters (materials, env emission, camera) against target images
via pixel gradients, with optax + orbax checkpointing.

Variance reduction (r1 verdict: the plain loop plateaued at the MC noise
floor):
  * paired-sample loss  mean((I_A - t) * (I_B - t))  with INDEPENDENT
    sample sets A and B — its expectation is the true squared error
    (the E[noise^2] floor cancels because A and B are uncorrelated), and
    its gradient is the unbiased product estimator
    (I_A - t) dI_B + (I_B - t) dI_A. The plain single-set loss gradient
    carries a d(Var) term that points nowhere.
  * stratified pixel minibatches: each step renders `minibatch` pixels,
    one jittered per stratum, instead of the full frame — more optimizer
    steps per sample budget.
  * spp schedule: early steps run spp/4, ramping to the full spp over the
    run (coarse gradients move parameters cheaply while far from the
    optimum).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fluctus_tpu.integrators import lockstep
from fluctus_tpu.parallel.mesh import graft

_DIFF_GETTERS = {
    "kd": lambda s, p: s.materials.kd,
    "ks": lambda s, p: s.materials.ks,
    "ns": lambda s, p: s.materials.ns,
    "ni": lambda s, p: s.materials.ni,
    "env_image": lambda s, p: s.envmap.image,
    "env_strength": lambda s, p: p.env_strength,
    "cam_pos": lambda s, p: p.camera.pos,
    "cam_dir": lambda s, p: p.camera.dir,
    "cam_fov": lambda s, p: p.camera.fov,
    "cam_aperture_size": lambda s, p: p.camera.aperture_size,
    "cam_focal_dist": lambda s, p: p.camera.focal_dist,
}


def spp_schedule(steps: int, spp: int):
    """(n_steps, spp) phases ramping spp/4 -> spp/2 -> spp over the run."""
    if spp < 4:
        return [(steps, spp)]
    p1, p2 = int(steps * 0.4), int(steps * 0.3)
    return [(p1, max(1, spp // 4)), (p2, max(1, spp // 2)),
            (steps - p1 - p2, spp)]


def run_optimization(session, target_path: str, steps: int = 100,
                     lr: float = 1e-2, spp: int = 4,
                     out_dir: str = "out/optimize",
                     diff_keys=("kd",), log_every: int = 10,
                     checkpoint_every: int = 50, resume: bool = True,
                     minibatch: int = 0, method: str = "auto"):
    """Adam loop on selected scene parameters vs a linear .hdr target, with
    orbax checkpointing of (params, optimizer state, step) for restart
    (capability the reference lacks — SURVEY §5.3/§5.4 notes the TPU build
    needs real optimizer checkpointing). minibatch = pixels per step
    (0 = full frame).

    method: 'lockstep' renders gradients with the fixed-trip scan;
    'stream' uses the streaming-wavefront fwd+bwd path (~2.6x faster at
    production shapes, BASELINE r4a) — the SAME paired-sample gradient,
    assembled as per-ray weighted folds (see make_step_stream below);
    'auto' picks stream off-CPU."""
    from fluctus_tpu.io.hdr import read_hdr

    os.makedirs(out_dir, exist_ok=True)
    scene, params, cfg = session.scene, session.params, session.cfg
    target_img = read_hdr(target_path)
    assert target_img.shape[:2] == (cfg.height, cfg.width), \
        f"target {target_img.shape} vs render {cfg.height}x{cfg.width}"
    target = jnp.asarray(target_img.reshape(-1, 3))
    n_pix = cfg.width * cfg.height
    mb = n_pix if minibatch <= 0 else min(minibatch, n_pix)

    diff = {k: _DIFF_GETTERS[k](scene, params) for k in diff_keys}

    tx = optax.adam(lr)
    opt_state = tx.init(diff)

    # --- checkpoint/resume (orbax)
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(os.path.join(out_dir, "ckpt"))
    mngr = ocp.CheckpointManager(ckpt_dir)
    start_step = 0
    if resume and mngr.latest_step() is not None:
        restored = mngr.restore(
            mngr.latest_step(),
            args=ocp.args.StandardRestore({"diff": diff,
                                           "opt_state": opt_state}))
        diff = restored["diff"]
        opt_state = restored["opt_state"]
        start_step = mngr.latest_step() + 1
        print(f"resumed from checkpoint step {mngr.latest_step()}")

    if method == "auto":
        method = "stream" if jax.default_backend() not in ("cpu",) \
            else "lockstep"

    def stratified_pixels(step_idx):
        stride = n_pix // mb
        key = jax.random.fold_in(jax.random.PRNGKey(0x0F17), step_idx)
        if stride > 1:
            jit_off = jax.random.randint(key, (mb,), 0, stride)
            return (jnp.arange(mb, dtype=jnp.uint32) * stride
                    + jit_off.astype(jnp.uint32))
        return jnp.arange(mb, dtype=jnp.uint32)

    def make_step_stream(cur_spp: int, n_seg: int, pool: int):
        """Streaming-wavefront optimizer step. Same estimator as the
        lockstep pair loss: value = mean((I_A - t)(I_B - t)) from a
        forward-only per-ray radiance pass (wavefront.stream_radiance),
        gradient = (I_B - t).dI_A + (I_A - t).dI_B assembled EXACTLY as
        one weighted stream_loss fold — each ray's contribution is
        stop_grad(w[ray]) . dradiance with w the other set's per-pixel
        error — so no per-pixel binning (and no TPU scatter) enters the
        differentiated graph."""
        from fluctus_tpu.integrators import wavefront
        from fluctus_tpu.parallel.mesh import loss_fn_stream
        n_set = mb * cur_spp
        n_total = 2 * n_set

        @jax.jit
        def step(diff, opt_state, step_idx):
            pix = stratified_pixels(step_idx)
            tgt = target[pix]
            pix2 = jnp.tile(pix, 2 * cur_spp)
            # sample ids match the lockstep path: set A = (2i)*spp + k,
            # set B = (2i+1)*spp + k
            sid = (step_idx.astype(jnp.uint32) * 2 * cur_spp
                   + jnp.arange(2 * cur_spp, dtype=jnp.uint32))
            samp = jnp.repeat(sid, mb)

            s_g, p_g = graft(diff, scene, params)
            rad, nd_f = wavefront.stream_radiance(
                s_g, p_g, cfg, pix2, samp, pool, n_seg)
            i_ab = rad.reshape(2, cur_spp, mb, 3).mean(axis=1)
            loss = jnp.mean((i_ab[0] - tgt) * (i_ab[1] - tgt))

            scale = 1.0 / (cur_spp * mb * 3)
            w_a = (i_ab[1] - tgt) * scale            # weights for A rays
            w_b = (i_ab[0] - tgt) * scale
            weight = jnp.concatenate(
                [jnp.tile(w_a, (cur_spp, 1)), jnp.tile(w_b, (cur_spp, 1))])
            zeros_t = jnp.zeros((n_total, 3), jnp.float32)

            def wloss(d):
                s, n_done = loss_fn_stream(
                    d, scene, params, cfg, pix2, samp, zeros_t, pool,
                    n_seg, deferred=True, weight=weight)
                return s, n_done
            (_, nd_g), grads = jax.value_and_grad(wloss, has_aux=True)(
                diff)
            updates, opt_state_n = tx.update(grads, opt_state)
            return (optax.apply_updates(diff, updates), opt_state_n, loss,
                    jnp.minimum(nd_f, nd_g))
        return step, n_total

    def plan_stream(cur_spp: int):
        """Segment budget for the stream step: plan on a step-0-shaped
        pixel set, +15% margin (+2) for jittered minibatches whose drain
        runs longer; the driver re-plans (recompiling once) if a step
        underdrains."""
        from fluctus_tpu.integrators import wavefront
        n_total = 2 * mb * cur_spp
        pool = int(np.clip(n_total // 32, 1 << 12, 1 << 15))
        pix2 = jnp.tile(stratified_pixels(jnp.uint32(0)), 2 * cur_spp)
        samp = jnp.repeat(jnp.arange(2 * cur_spp, dtype=jnp.uint32), mb)
        k, _ = wavefront.plan_stream_segments(
            scene, params, cfg, pix2, samp, pool, deferred=True)
        return int(int(k) * 1.15) + 2, pool

    def make_step(cur_spp: int):
        @jax.jit
        def step(diff, opt_state, step_idx):
            # stratified minibatch: one jittered pixel per stratum
            pix = stratified_pixels(step_idx)
            tgt = target[pix]

            def render(d, s_idx):
                s, p = graft(d, scene, params)
                acc = 0.0
                for k in range(cur_spp):
                    acc = acc + lockstep.sample_radiance(
                        s, p, cfg, pix, s_idx * cur_spp + k)
                return acc / cur_spp

            def pair_loss(d):
                ia = render(d, step_idx * 2)
                ib = render(d, step_idx * 2 + 1)
                return jnp.mean((ia - tgt) * (ib - tgt))

            loss, grads = jax.value_and_grad(pair_loss)(diff)
            updates, opt_state_n = tx.update(grads, opt_state)
            return optax.apply_updates(diff, updates), opt_state_n, loss
        return step

    history = []
    phases = spp_schedule(steps, spp)
    bounds = np.cumsum([n for n, _ in phases])
    step_fns = {}
    plan_cache = {}
    for i in range(start_step, steps):
        ph = int(np.searchsorted(bounds, i, side="right"))
        cur_spp = phases[min(ph, len(phases) - 1)][1]
        if method == "stream":
            if cur_spp not in plan_cache:
                plan_cache[cur_spp] = plan_stream(cur_spp)
            n_seg, pool = plan_cache[cur_spp]
            if cur_spp not in step_fns:
                step_fns[cur_spp] = make_step_stream(cur_spp, n_seg, pool)
            while True:
                step_f, n_total = step_fns[cur_spp]
                diff_n, opt_n, loss, nd = step_f(diff, opt_state,
                                                 jnp.uint32(i))
                if int(nd) == n_total:
                    diff, opt_state = diff_n, opt_n
                    break
                # a jittered minibatch outran the planned segment
                # budget: grow it and recompile (discarding the
                # under-drained update keeps the gradient unbiased)
                n_seg = n_seg + max(2, n_seg // 4)
                plan_cache[cur_spp] = (n_seg, pool)
                step_fns[cur_spp] = make_step_stream(cur_spp, n_seg, pool)
                print(f"step {i}: re-planned stream segments -> {n_seg}")
        else:
            if cur_spp not in step_fns:
                step_fns[cur_spp] = make_step(cur_spp)
            diff, opt_state, loss = step_fns[cur_spp](diff, opt_state,
                                                      jnp.uint32(i))
        history.append(float(loss))
        if i % log_every == 0:
            print(f"step {i}: loss {float(loss):.6f} (spp {cur_spp})")
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            mngr.save(i, args=ocp.args.StandardSave(
                {"diff": diff, "opt_state": opt_state}))
    mngr.wait_until_finished()
    hist_path = os.path.join(out_dir, "loss_history.npy")
    if start_step > 0 and os.path.exists(hist_path):
        prev = np.load(hist_path).tolist()
        history = prev[:start_step] + history
    np.save(hist_path, np.asarray(history))
    for k, v in diff.items():
        np.save(os.path.join(out_dir, f"opt_{k}.npy"), np.asarray(v))
    if history:
        print(f"final loss {history[-1]:.6f}; results in {out_dir}")
    else:
        print(f"nothing to do (resumed at step {start_step} >= steps)")
    return diff, history
