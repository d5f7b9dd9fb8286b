"""Stage split of the lockstep render via static-config variants.

Per-invocation transport overhead (~25 ms for the scene pytree) swamps
standalone stage timings, so each measurement here is a FUSED 8-sample
program (like the bench) and stages are separated by differencing jit
variants: no-NEE (drops shadow traversals), bounce-count sweeps (drops
closest-hit traversals + shading)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fluctus_tpu.core.types import RenderConfig
from fluctus_tpu.integrators import lockstep
from fluctus_tpu.render import driver

SPP = 8
N = 1 << 16


def timeit(fn, iters=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / iters


def run(sess, **over):
    cfg = sess.cfg.replace(**over) if over else sess.cfg
    # pixels spread over the whole image (coherence like a real tile)
    pix = jnp.arange(N, dtype=jnp.uint32) * (cfg.width * cfg.height // N)
    f = lambda: lockstep._render_tile_spp(sess.scene, sess.params, cfg, pix,
                                          jnp.uint32(0), SPP)
    dt = timeit(f)
    return dt / SPP  # seconds per sample of N pixels


def main():
    cfg = RenderConfig(width=512, height=512, max_bounces=4,
                       use_area_light=False, tile_size=N)
    sess = driver.create_session(
        "/root/reference/assets/teapot.ply",
        env_map="/root/reference/assets/env_maps/night.hdr",
        cfg=cfg, use_sbvh=True, cache_dir="data/hierarchies")

    # overhead of one program invocation (tiny compute, full scene pytree)
    trivial = jax.jit(lambda s: s.geom.v0[0, 0] + s.envmap.pdf_table[0])
    o = timeit(lambda: trivial(sess.scene))
    print(f"invocation overhead (scene pytree arg): {o*1e3:7.2f} ms")

    full = run(sess)
    print(f"full sample (b4, MIS):        {full*1e3:7.2f} ms/sample")
    no_nee = run(sess, sample_expl=False)
    print(f"  no NEE (no shadow rays):    {no_nee*1e3:7.2f} ms/sample "
          f"-> 5 shadow traversals = {(full-no_nee)*1e3:6.2f} ms")
    b1 = run(sess, max_bounces=1)
    b0 = run(sess, max_bounces=0)
    print(f"  b1 full:                    {b1*1e3:7.2f} ms/sample")
    print(f"  b0 full:                    {b0*1e3:7.2f} ms/sample "
          f"-> per-extra-bounce (closest+shadow+shading) = "
          f"{(full-b0)/4*1e3:6.2f} ms")
    b0_nonee = run(sess, max_bounces=0, sample_expl=False)
    print(f"  b0 no-NEE (1 closest+shade):{b0_nonee*1e3:7.2f} ms/sample")

    n_rays = N * SPP
    print(f"\nrates: full {n_rays*(5+5)/ (full*SPP)/1e6:6.1f} "
          f"MRays/s (10 rays/pix)")


if __name__ == "__main__":
    main()
