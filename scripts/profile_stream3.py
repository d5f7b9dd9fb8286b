"""Fine-grained per-segment cost breakdown with traversal stubbed."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fluctus_tpu.core.types import Hit, RenderConfig
from fluctus_tpu.integrators import common, wavefront
from fluctus_tpu.render import driver


def main():
    spp = 16
    cfg0 = RenderConfig(width=512, height=512, max_bounces=4,
                        use_area_light=False, tile_size=1 << 16)
    sess = driver.create_session(
        "/root/reference/assets/teapot.ply",
        env_map="/root/reference/assets/env_maps/night.hdr",
        cfg=cfg0, use_sbvh=True, cache_dir="data/hierarchies")
    n_pix = cfg0.width * cfg0.height
    pool = min(cfg0.pool_size, max(1 << 12, min(1 << 15, n_pix)))

    def stub_trace(scene, params, c, orig, dir):
        b = orig.shape[0]
        t = jnp.ones((b,), jnp.float32)
        return Hit(t=t, prim=jnp.zeros((b,), jnp.int32),
                   p=orig + t[:, None] * dir,
                   n=jnp.broadcast_to(jnp.array([0., 0., 1.]), (b, 3)),
                   uv=jnp.zeros((b, 2), jnp.float32),
                   mat_id=jnp.zeros((b,), jnp.int32),
                   area_light=jnp.zeros((b,), bool))

    def stub_shadow(scene, params, c, o, d, l, **kw):
        return jnp.zeros(o.shape[:1], bool)

    common.trace_scene = stub_trace
    common._shadow_blocked = stub_shadow

    def measure(tag, k, **over):
        cfg = sess.cfg.replace(pool_size=pool, **over)
        wavefront.stream_rounds._clear_cache()
        st = wavefront.init_state(sess.params, cfg)
        out = (st, jnp.zeros((pool,), jnp.uint32),
               jnp.zeros((3, pool, k), jnp.float32),
               jnp.full((pool, k), -1, jnp.int32),
               jnp.zeros((3,), jnp.uint32))
        seg8 = lambda o: wavefront.stream_rounds(
            sess.scene, sess.params, cfg, *o, spp, k, 8)
        out = seg8(out)
        out = seg8(out)
        t0 = time.perf_counter()
        for _ in range(4):
            out = seg8(out)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 32
        print(f"{tag:42s} {dt*1e3:7.2f} ms/segment")
        return dt

    base = measure("stub full (K=272)", 272)
    measure("stub, K=32", 32)
    measure("stub, no NEE", 272, sample_expl=False)
    measure("stub, no env map (impl only)", 272, use_env_map=False)
    measure("stub, no RR", 272, use_roulette=False)
    measure("stub, no NEE + no env", 272, sample_expl=False,
            use_env_map=False)


if __name__ == "__main__":
    main()
