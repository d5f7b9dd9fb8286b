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
                     diff_keys=("kd",), log_every: int = 10):
    """SGD/Adam loop on selected scene parameters. Target is a linear .hdr
    image at the session's resolution."""
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
    for i in range(steps):
        diff, opt_state, loss = step(diff, opt_state, jnp.uint32(i))
        history.append(float(loss))
        if i % log_every == 0:
            print(f"step {i}: loss {float(loss):.6f}")
    np.save(os.path.join(out_dir, "loss_history.npy"), np.asarray(history))
    for k, v in diff.items():
        np.save(os.path.join(out_dir, f"opt_{k}.npy"), np.asarray(v))
    print(f"final loss {history[-1]:.6f}; results in {out_dir}")
    return diff, history
