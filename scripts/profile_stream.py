"""Differencing profile of the streaming-wavefront bench frame.

Splits the bench config's frame time into traversal (ext + shadow) vs
everything else by (a) timing the full frame, (b) timing with NEE off
(drops the shadow traversal + NEE shading), (c) timing the MXU traversal
kernel alone at the same ray population.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fluctus_tpu.core.types import RenderConfig
from fluctus_tpu.integrators import wavefront
from fluctus_tpu.render import driver
from fluctus_tpu.ops import traverse_mxu


def timeit(fn, iters=2, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    best = 1e30
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    spp = 16
    cfg = RenderConfig(width=512, height=512, max_bounces=4,
                       use_area_light=False, tile_size=1 << 16)
    sess = driver.create_session(
        "/root/reference/assets/teapot.ply",
        env_map="/root/reference/assets/env_maps/night.hdr",
        cfg=cfg, use_sbvh=True, cache_dir="data/hierarchies")

    n_pix = cfg.width * cfg.height
    pool = min(cfg.pool_size, max(1 << 12, min(1 << 15, n_pix)))

    def frame(c):
        c = c.replace(pool_size=pool)
        img, counters = wavefront.render_stream(sess.scene, sess.params, c,
                                                spp)
        return img, counters

    # full frame
    (img, counters) = frame(sess.cfg)
    n_ext = int(counters[1])
    n_sh = int(counters[2])
    print(f"segments traced: ext rays {n_ext/1e6:.2f} M, "
          f"shadow rays {n_sh/1e6:.2f} M")
    t_full = timeit(lambda: frame(sess.cfg))
    print(f"full frame:           {t_full*1e3:8.1f} ms")

    cfg_nonee = sess.cfg.replace(sample_expl=False)
    t_nonee = timeit(lambda: frame(cfg_nonee))
    print(f"no NEE (no shadow):   {t_nonee*1e3:8.1f} ms  "
          f"-> shadow+NEE = {(t_full-t_nonee)*1e3:.1f} ms")

    # traversal alone at the bench's ray population: pool lanes of
    # incoherent-ish rays (post-bounce mix). Use the frame's actual ext-ray
    # count split into pool-sized launches.
    key = jax.random.PRNGKey(0)
    center = jnp.array(sess.scene.geom.v0.mean(axis=0))
    o = center[None, :] + jax.random.normal(key, (pool, 3)) * 0.5
    d = jax.random.normal(jax.random.PRNGKey(1), (pool, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    wb = sess.scene.wbvh

    f_tr = jax.jit(lambda o, d: traverse_mxu.traverse_closest(
        wb, o, d, 1e30).t)
    t_tr = timeit(lambda: f_tr(o, d))
    n_launch = (n_ext + pool - 1) // pool
    print(f"MXU closest on {pool} incoherent rays: {t_tr*1e3:8.1f} ms "
          f"({pool/t_tr/1e6:.1f} MRays/s)")
    print(f"  x {n_launch} pool-launches for the frame's ext rays = "
          f"{t_tr*n_launch*1e3:.1f} ms")

    f_any = jax.jit(lambda o, d: traverse_mxu.traverse_any(wb, o, d, 1e3))
    t_any = timeit(lambda: f_any(o, d))
    n_launch_s = (n_sh + pool - 1) // pool
    print(f"MXU any-hit  on {pool} incoherent rays: {t_any*1e3:8.1f} ms "
          f"({pool/t_any/1e6:.1f} MRays/s)")
    print(f"  x {n_launch_s} launches for the frame's shadow rays = "
          f"{t_any*n_launch_s*1e3:.1f} ms")

    # primaries (coherent) for contrast
    pix = (jnp.arange(pool, dtype=jnp.uint32) % n_pix)
    o2, d2 = wavefront._raygen(sess.params, cfg, pix,
                               jnp.zeros((pool,), jnp.uint32))
    t_tr_c = timeit(lambda: f_tr(o2, d2))
    print(f"MXU closest on {pool} camera rays:     {t_tr_c*1e3:8.1f} ms "
          f"({pool/t_tr_c/1e6:.1f} MRays/s)")


if __name__ == "__main__":
    main()
