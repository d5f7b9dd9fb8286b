"""Bit-exactness of the MXU traversal vs the XLA wide backend on real
hardware (CPU interpret mode cannot catch Mosaic's bf16 dot lowering)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fluctus_tpu.core.types import RenderConfig
from fluctus_tpu.integrators import wavefront
from fluctus_tpu.ops import traverse_mxu, traverse_wide
from fluctus_tpu.render import driver


def main():
    for scene, env in (
        ("/root/reference/assets/teapot.ply",
         "/root/reference/assets/env_maps/night.hdr"),
        ("/root/reference/assets/egyptcat/egyptcat.obj", None),
    ):
        cfg0 = RenderConfig(width=256, height=256, max_bounces=2)
        sess = driver.create_session(scene, env_map=env, cfg=cfg0,
                                     use_sbvh=True,
                                     cache_dir="data/hierarchies")
        wb = sess.scene.wbvh
        n = 4096
        lo = jnp.min(sess.scene.geom.v0, axis=0)
        hi = jnp.max(sess.scene.geom.v0, axis=0)
        center = (lo + hi) / 2
        o1 = center + (jax.random.uniform(jax.random.PRNGKey(0), (n, 3))
                       - 0.5) * (hi - lo) * 1.2
        d1 = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
        d1 = d1 / jnp.linalg.norm(d1, axis=1, keepdims=True)
        pix = jnp.arange(n, dtype=jnp.uint32) * 16
        o2, d2 = wavefront._raygen(sess.params, sess.cfg, pix,
                                   jnp.zeros((n,), jnp.uint32))
        orig = jnp.concatenate([o1, o2])
        dirs = jnp.concatenate([d1, d2])

        for blk in (128, 1024):
            r_m = traverse_mxu.traverse_closest(wb, orig, dirs, 3.4e38,
                                                blk=blk)
            r_w = traverse_wide.traverse_closest(wb, orig, dirs, 3.4e38)
            mm_p = int(jnp.sum(r_m.prim != r_w.prim))
            same = np.asarray(r_m.prim == r_w.prim)
            t_m = np.asarray(r_m.t)[same]
            t_w = np.asarray(r_w.t)[same]
            mm_t = int((t_m != t_w).sum())
            a_m = traverse_mxu.traverse_any(wb, orig, dirs, 2.0, blk=blk)
            a_w = traverse_wide.traverse_any(wb, orig, dirs, 2.0)
            mm_a = int(jnp.sum(a_m != a_w))
            print(f"{os.path.basename(scene):14s} blk={blk:5d}: "
                  f"prim mismatches {mm_p}/{2*n}, t mismatches {mm_t}, "
                  f"any-hit mismatches {mm_a}")


if __name__ == "__main__":
    main()
