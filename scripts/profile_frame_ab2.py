"""Split binning cost + shadow-trace vs NEE-shading at full-frame level."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fluctus_tpu.core.types import RenderConfig
from fluctus_tpu.integrators import common, wavefront
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
    cfg = sess.cfg.replace(pool_size=1 << 15)

    def frame():
        return wavefront.render_stream(sess.scene, sess.params, cfg, spp,
                                       segments_per_launch=16)[0]

    base = timed(frame)
    print(f"full frame:            {base*1e3:8.1f} ms")

    # binning alone at frame scale
    n_pix = cfg.width * cfg.height
    total = n_pix * spp
    n_rows = 176 * (1 << 15)  # ~11 launches of 16 segments
    key = jax.random.PRNGKey(0)
    pix = jnp.where(jax.random.uniform(key, (n_rows,)) < total / n_rows,
                    jax.random.randint(jax.random.PRNGKey(1), (n_rows,), 0,
                                       n_pix), -1)
    # make counts exact-spp is hard synthetically; just time the sort+gather
    r = jax.random.uniform(jax.random.PRNGKey(2), (n_rows,))
    rows = (r, r, r, pix)
    f_bin = jax.jit(lambda rows: wavefront._bin_rows(rows, n_pix, spp)[0])
    t_bin = timed(lambda: f_bin(rows))
    print(f"_bin_rows ({n_rows/1e6:.1f}M entries): {t_bin*1e3:8.1f} ms")

    # shadow trace vs NEE shading
    real_shadow = common._shadow_blocked
    common._shadow_blocked = lambda scene, params, c, o, d, l, **kw: \
        jnp.zeros(o.shape[:1], bool)
    wavefront.stream_rounds._clear_cache()
    t_nosh = timed(frame)
    common._shadow_blocked = real_shadow
    wavefront.stream_rounds._clear_cache()
    print(f"stubbed shadow trace:  {t_nosh*1e3:8.1f} ms "
          f"(shadow trace = {(base-t_nosh)*1e3:+.1f})")

    # raygen cost: pin spawn rays to a constant
    real_raygen = wavefront._raygen

    def cheap_raygen(params, c, pix, spawn):
        o, d = real_raygen(params, c, pix * 0, spawn * 0)
        return o, d
    wavefront._raygen = cheap_raygen
    wavefront.stream_rounds._clear_cache()
    t_norg = timed(frame)
    wavefront._raygen = real_raygen
    wavefront.stream_rounds._clear_cache()
    print(f"constant raygen:       {t_norg*1e3:8.1f} ms "
          f"(raygen = {(base-t_norg)*1e3:+.1f})")


if __name__ == "__main__":
    main()
