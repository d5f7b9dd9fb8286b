"""Driver benchmark: one JSON line with the headline metric.

Runs the lockstep integrator on the real TPU chip (platform from env):
teapot.ply + night.hdr env light, 512x512, 4 bounces, MIS — the reference
benchmark protocol's metric (total MRays/s, src/tracer.cpp:362-528) on
BASELINE config-1 geometry.
"""
import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    from fluctus_tpu.core.types import RenderConfig
    from fluctus_tpu.integrators import lockstep
    from fluctus_tpu.render import driver
    from fluctus_tpu.render.benchmark import ray_counts_per_sample

    cfg = RenderConfig(width=512, height=512, max_bounces=4,
                       use_area_light=False, tile_size=1 << 16)
    sess = driver.create_session(
        "/root/reference/assets/teapot.ply",
        env_map="/root/reference/assets/env_maps/night.hdr",
        cfg=cfg, use_sbvh=True, cache_dir="data/hierarchies")
    cfg = sess.cfg
    scene, params = sess.scene, sess.params

    tile = min(cfg.tile_size, cfg.width * cfg.height)
    idx = jnp.arange(tile, dtype=jnp.uint32)
    spp_per_launch = 8
    # compile + warmup
    lockstep._render_tile_spp(scene, params, cfg, idx, jnp.uint32(0),
                              spp_per_launch).block_until_ready()

    iters = 2
    t0 = time.perf_counter()
    for s in range(iters):
        lockstep._render_tile_spp(scene, params, cfg, idx,
                                  jnp.uint32((s + 1) * spp_per_launch),
                                  spp_per_launch).block_until_ready()
    dt = time.perf_counter() - t0

    primary, ext, shadow = ray_counts_per_sample(
        cfg, tile * iters * spp_per_launch)
    total_mrays = (primary + ext + shadow) / dt / 1e6

    print(json.dumps({
        "metric": "teapot_512_b4_total_mrays_per_s",
        "value": round(total_mrays, 3),
        "unit": "MRays/s",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
