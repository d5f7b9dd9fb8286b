"""Full-frame time vs pool size for the streaming wavefront."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from fluctus_tpu.core.types import RenderConfig
from fluctus_tpu.integrators import wavefront
from fluctus_tpu.render import driver


def main():
    spp = 16
    cfg0 = RenderConfig(width=512, height=512, max_bounces=4,
                        use_area_light=False, tile_size=1 << 16)
    sess = driver.create_session(
        "/root/reference/assets/teapot.ply",
        env_map="/root/reference/assets/env_maps/night.hdr",
        cfg=cfg0, use_sbvh=True, cache_dir="data/hierarchies")

    for pool_pow, spl in ((14, 16), (15, 16), (16, 16), (16, 8), (17, 8),
                          (18, 4)):
        cfg = sess.cfg.replace(pool_size=1 << pool_pow)
        f = lambda: wavefront.render_stream(sess.scene, sess.params, cfg,
                                            spp, segments_per_launch=spl)[0]
        jax.block_until_ready(f())
        best = 1e30
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(f())
            best = min(best, time.perf_counter() - t0)
        print(f"pool 2^{pool_pow} spl={spl:2d}: {best*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
