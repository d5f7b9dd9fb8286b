"""Full-frame A/B differencing on the bench config (only trustworthy
measurement through the relay: min-of-3 whole frames)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from fluctus_tpu.core.types import RenderConfig
from fluctus_tpu.integrators import lockstep, wavefront
from fluctus_tpu.render import driver


def timed(fn, iters=3):
    jax.block_until_ready(fn())
    best = 1e30
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    spp = 16
    cfg0 = RenderConfig(width=512, height=512, max_bounces=4,
                        use_area_light=False, tile_size=1 << 16)
    sess = driver.create_session(
        "/root/reference/assets/teapot.ply",
        env_map="/root/reference/assets/env_maps/night.hdr",
        cfg=cfg0, use_sbvh=True, cache_dir="data/hierarchies")

    def frame(**over):
        cfg = sess.cfg.replace(pool_size=1 << 15, **over)
        return lambda: wavefront.render_stream(sess.scene, sess.params, cfg,
                                               spp, segments_per_launch=16)[0]

    base = timed(frame())
    print(f"stream b4 full:        {base*1e3:8.1f} ms")
    for tag, over in (
        ("no NEE (no shadow)", dict(sample_expl=False)),
        ("no env (impl only)", dict(use_env_map=False)),
        ("no RR", dict(use_roulette=False)),
        ("b2", dict(max_bounces=2)),
        ("b0", dict(max_bounces=0)),
        ("backend pallas-packet", dict(backend="pallas")),
    ):
        dt = timed(frame(**over))
        print(f"stream {tag:22s} {dt*1e3:8.1f} ms  (delta {(base-dt)*1e3:+8.1f})")

    t_ls = timed(lambda: lockstep.render(sess.scene, sess.params,
                                         sess.cfg, spp))
    print(f"lockstep b4 full:      {t_ls*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
