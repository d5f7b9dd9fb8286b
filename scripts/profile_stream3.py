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


    def measure(tag, stub=True, **over):
        cfg = sess.cfg.replace(pool_size=pool, **over)
        common.trace_scene = stub_trace if stub else real_trace
        common._shadow_blocked = stub_shadow if stub else real_shadow
        wavefront.stream_rounds._clear_cache()
        st = wavefront.init_state(sess.params, cfg)
        out = (st, jnp.zeros((3,), jnp.uint32))
        seg8 = lambda o: wavefront.stream_rounds(
            sess.scene, sess.params, cfg, o[0], o[1], spp, 8)
        o = seg8(out)
        out = (o[0], o[1])
        o = seg8(out); out = (o[0], o[1])
        t0 = time.perf_counter()
        for _ in range(4):
            o = seg8(out); out = (o[0], o[1])
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 32
        print(f"{tag:42s} {dt*1e3:7.2f} ms/segment")
        return dt

    real_trace = common.trace_scene
    real_shadow = common._shadow_blocked
    measure("REAL full", stub=False)
    measure("stub full")
    measure("stub, no NEE", sample_expl=False)
    measure("stub, no env map (impl only)", use_env_map=False)
    measure("stub, no NEE + no env", sample_expl=False, use_env_map=False)
    measure("REAL, no NEE", stub=False, sample_expl=False)


if __name__ == "__main__":
    main()
