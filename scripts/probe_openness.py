"""Print (hit rate, escape rate, mean_len, decision) for the protocol
scenes — calibration data for integrator_decision against the measured
samples/s winners (scripts/run_protocol.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from fluctus_tpu.core.types import RenderConfig
from fluctus_tpu.render import driver

ASSETS = "/root/reference/assets"
SCENES = [
    ("egyptcat", f"{ASSETS}/egyptcat/egyptcat.obj",
     f"{ASSETS}/env_maps/night.hdr"),
    ("psor-cube", f"{ASSETS}/psor/psor-cube.obj", None),
    ("gold_rings", f"{ASSETS}/gold_rings/gold_rings_bark.obj", None),
    ("teapot", f"{ASSETS}/teapot.ply", f"{ASSETS}/env_maps/night.hdr"),
]


def main():
    for name, path, env in SCENES:
        if not os.path.exists(path):
            continue
        cfg = RenderConfig(width=1024, height=1024, max_bounces=4,
                           use_env_map=env is not None,
                           use_area_light=False)
        sess = driver.create_session(path, env_map=env, cfg=cfg,
                                     use_sbvh=True,
                                     cache_dir="data/hierarchies",
                                     state_dir=None)
        n_pix = cfg.width * cfg.height
        stride = max(1, n_pix // 4096)
        pix = jnp.arange(0, n_pix, stride, dtype=jnp.uint32)
        h, e = driver._openness_probe(sess.scene, sess.params, sess.cfg,
                                      pix)
        h, e = float(h), float(e)
        mb = cfg.max_bounces
        mean_len = 1.0 + h * min(1.0 / max(e, 1.0 / (mb + 1.0)), float(mb))
        dec = driver.integrator_decision(h, e, mb)
        print(f"{name:10s} h={h:.3f} e={e:.3f} mean_len={mean_len:.2f} "
              f"thresh={0.55*(mb+1):.2f} -> {dec}", flush=True)


if __name__ == "__main__":
    main()
