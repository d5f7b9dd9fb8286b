"""Inverse-rendering driver (new capability; BASELINE config 5): optimize
scene parameters (material kd/ks/ns, env emission) against target images via
pixel gradients, with optax + orbax checkpointing.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fluctus_tpu.integrators import lockstep
from fluctus_tpu.parallel.mesh import loss_fn


def run_optimization(session, target_path: str, steps: int = 100,
                     lr: float = 1e-2, spp: int = 4,
                     out_dir: str = "out/optimize",
                     diff_keys=("kd",), log_every: int = 10,
                     checkpoint_every: int = 50, resume: bool = True):
    """Adam loop on selected scene parameters vs a linear .hdr target, with
    orbax checkpointing of (params, optimizer state, step) for restart
    (capability the reference lacks — SURVEY §5.3/§5.4 notes the TPU build
    needs real optimizer checkpointing)."""
    from fluctus_tpu.io.hdr import read_hdr

    os.makedirs(out_dir, exist_ok=True)
    scene, params, cfg = session.scene, session.params, session.cfg
    target_img = read_hdr(target_path)
    assert target_img.shape[:2] == (cfg.height, cfg.width), \
        f"target {target_img.shape} vs render {cfg.height}x{cfg.width}"
    target = jnp.asarray(target_img.reshape(-1, 3))

    diff = {}
    if "kd" in diff_keys:
        diff["kd"] = scene.materials.kd
    if "ks" in diff_keys:
        diff["ks"] = scene.materials.ks
    if "ns" in diff_keys:
        diff["ns"] = scene.materials.ns
    if "env_image" in diff_keys:
        diff["env_image"] = scene.envmap.image

    tx = optax.adam(lr)
    opt_state = tx.init(diff)
    pixel_idx = jnp.arange(cfg.width * cfg.height, dtype=jnp.uint32)

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

    @jax.jit
    def step(diff, opt_state, sample_idx):
        def spp_loss(d):
            losses = 0.0
            for k in range(spp):
                losses = losses + loss_fn(d, scene, params, cfg, pixel_idx,
                                          sample_idx * spp + k, target)
            return losses / spp

        loss, grads = jax.value_and_grad(spp_loss)(diff)
        updates, opt_state = tx.update(grads, opt_state)
        diff = optax.apply_updates(diff, updates)
        return diff, opt_state, loss

    history = []
    for i in range(start_step, steps):
        diff, opt_state, loss = step(diff, opt_state, jnp.uint32(i))
        history.append(float(loss))
        if i % log_every == 0:
            print(f"step {i}: loss {float(loss):.6f}")
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
