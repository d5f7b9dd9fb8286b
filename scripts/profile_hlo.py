"""Compare compiled-program cost analysis with and without NEE."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

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

    for tag, over in (("full", {}), ("no NEE", dict(sample_expl=False))):
        cfg = sess.cfg.replace(pool_size=1 << 15, **over)
        pool = 1 << 15
        lane = jnp.arange(pool, dtype=jnp.uint32)
        st = wavefront.init_state(sess.params, cfg)
        cnt = jnp.zeros((3,), jnp.uint32)
        lowered = jax.jit(
            lambda sc, p, s, c: wavefront.stream_rounds(sc, p, cfg, s, c,
                                                        spp, 16),
            static_argnums=()).lower(sess.scene, sess.params, st, cnt)
        try:
            compiled = lowered.compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            keys = ["flops", "bytes accessed", "transcendentals",
                    "optimal_seconds"]
            print(f"--- {tag}")
            for k in sorted(ca):
                if any(s in k for s in ("flops", "bytes accessed",
                                        "transcendentals", "utilization")):
                    if isinstance(ca[k], float) and ca[k] > 1e6:
                        print(f"  {k}: {ca[k]:.3e}")
        except Exception as e:
            print(f"{tag}: cost_analysis failed: {e}")


if __name__ == "__main__":
    main()
