#!/usr/bin/env python
"""BASELINE config 5 demo: inverse rendering on the gold_rings asset.

Renders a target image with the true materials, perturbs Kd/Ks, and
optimizes them back via pixel gradients. Prints recovery error + loss curve
and writes before/target/after renders.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene",
                    default="/root/reference/assets/gold_rings/"
                            "gold_rings_bark.obj")
    ap.add_argument("--env-map",
                    default="/root/reference/assets/env_maps/night.hdr")
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--minibatch", type=int, default=2048)
    ap.add_argument("--out-dir", default="out/gold_rings")
    args = ap.parse_args()

    from fluctus_tpu.core.types import RenderConfig
    from fluctus_tpu.integrators import lockstep
    from fluctus_tpu.io.image import save_image
    from fluctus_tpu.render import driver

    os.makedirs(args.out_dir, exist_ok=True)
    cfg = RenderConfig(width=args.size, height=args.size, max_bounces=3,
                       use_area_light=False)
    sess = driver.create_session(args.scene, env_map=args.env_map, cfg=cfg)
    scene, params, cfg = sess.scene, sess.params, sess.cfg
    # frame the flat ring arrangement from a 3/4 view under a boosted env
    lo, hi = sess.host_scene.bounds()
    center = (lo + hi) * 0.5
    r = float(np.linalg.norm(hi - lo) * 0.5)
    pos = center + np.array([0.0, 0.9 * r, 1.1 * r])
    d = center - pos
    d = d / np.linalg.norm(d)
    right = np.cross(d, [0.0, 1.0, 0.0]); right /= np.linalg.norm(right)
    up = np.cross(right, d)
    cam = params.camera.replace(
        pos=jnp.asarray(pos, jnp.float32), dir=jnp.asarray(d, jnp.float32),
        right=jnp.asarray(right, jnp.float32), up=jnp.asarray(up, jnp.float32))
    params = params.replace(camera=cam, env_strength=jnp.float32(4.0))
    pix = jnp.arange(cfg.width * cfg.height, dtype=jnp.uint32)

    kd_true = scene.materials.kd
    ks_true = scene.materials.ks

    @jax.jit
    def render_once(kd, ks, sample):
        s = scene.replace(materials=scene.materials.replace(kd=kd, ks=ks))
        return lockstep.sample_radiance(s, params, cfg, pix, sample)

    target = sum(render_once(kd_true, ks_true, jnp.uint32(k))
                 for k in range(4)) / 4
    save_image(os.path.join(args.out_dir, "target.hdr"),
               np.asarray(target).reshape(cfg.height, cfg.width, 3))

    # perturb: gray albedo, dim specular
    kd = jnp.full_like(kd_true, 0.3)
    ks = jnp.full_like(ks_true, 0.3)
    before = render_once(kd, ks, jnp.uint32(0))
    save_image(os.path.join(args.out_dir, "before.hdr"),
               np.asarray(before).reshape(cfg.height, cfg.width, 3))

    # variance-reduced optimize driver: stratified pixel minibatches,
    # paired-sample unbiased loss, spp schedule (render/optimize.py)
    from fluctus_tpu.render.driver import RenderSession
    from fluctus_tpu.render.optimize import run_optimization

    scene_p = scene.replace(
        materials=scene.materials.replace(kd=kd, ks=ks))
    sess_p = RenderSession(host_scene=None, scene=scene_p, params=params,
                           cfg=cfg)
    diff, losses = run_optimization(
        sess_p, os.path.join(args.out_dir, "target.hdr"),
        steps=args.steps, lr=args.lr, spp=args.spp,
        out_dir=args.out_dir, diff_keys=("kd", "ks"),
        minibatch=args.minibatch, checkpoint_every=0, resume=False)

    after = render_once(diff["kd"], diff["ks"], jnp.uint32(0))
    save_image(os.path.join(args.out_dir, "after.hdr"),
               np.asarray(after).reshape(cfg.height, cfg.width, 3))

    kd_err = float(jnp.abs(diff["kd"] - kd_true).mean())
    ks_err = float(jnp.abs(diff["ks"] - ks_true).mean())
    print(f"loss {losses[0]:.5f} -> {losses[-1]:.5f}; "
          f"kd mean abs err {kd_err:.4f}, ks mean abs err {ks_err:.4f}")
    np.save(os.path.join(args.out_dir, "losses.npy"), np.asarray(losses))


if __name__ == "__main__":
    main()
