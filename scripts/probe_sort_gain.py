"""Would sorting rays before the MXU trace reduce block divergence?

Captures the actual ray population of mid-frame stream segments, then
compares per-block step counts (the kernel cost model) unsorted vs
sorted by direction octant + quantized spherical coords."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fluctus_tpu.core.types import RenderConfig
from fluctus_tpu.integrators import common, wavefront
from fluctus_tpu.ops import traverse_mxu
from fluctus_tpu.render import driver


def main():
    spp = 16
    cfg0 = RenderConfig(width=512, height=512, max_bounces=4,
                        use_area_light=False)
    sess = driver.create_session(
        "/root/reference/assets/teapot.ply",
        env_map="/root/reference/assets/env_maps/night.hdr",
        cfg=cfg0, use_sbvh=True, cache_dir="data/hierarchies")
    cfg = sess.cfg.replace(pool_size=1 << 14)
    wb = sess.scene.wbvh

    # capture segment ray populations: the rays a segment traces are the
    # neutralized pool rays of its INPUT state
    captured = []
    state = wavefront.init_state(sess.params, cfg)
    counters = jnp.zeros((3,), jnp.uint32)
    for _ in range(12):
        o, d = common.neutralize_rays(state.orig, state.dir, state.alive)
        captured.append((o, d))
        state, counters, rows = wavefront.stream_iteration(
            sess.scene, sess.params, cfg, state, counters, spp)

    for seg in (0, 3, 8, 11):
        o, d = captured[seg]
        steps = traverse_mxu.traversal_steps(wb, o, d, 3e37)
        # sorted variant: 3-bit octant + 6-bit theta + 6-bit phi
        oct_ = ((d[:, 0] < 0).astype(jnp.int32)
                | ((d[:, 1] < 0).astype(jnp.int32) << 1)
                | ((d[:, 2] < 0).astype(jnp.int32) << 2))
        th = jnp.clip((d[:, 2] * 0.5 + 0.5) * 8, 0, 7).astype(jnp.int32)
        ph = jnp.clip((jnp.arctan2(d[:, 1], d[:, 0]) / jnp.pi * 0.5 + 0.5)
                      * 8, 0, 7).astype(jnp.int32)
        key = (oct_ << 6) | (th << 3) | ph
        order = jnp.argsort(key)
        steps_s = traverse_mxu.traversal_steps(wb, o[order], d[order], 3e37)
        print(f"seg {seg:2d}: unsorted sum-steps {int(steps.sum()):6d} "
              f"(max {int(steps.max()):4d}) | sorted {int(steps_s.sum()):6d}"
              f" (max {int(steps_s.max()):4d})")


if __name__ == "__main__":
    main()
