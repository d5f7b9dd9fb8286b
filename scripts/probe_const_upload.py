"""Quantify the closure-constant re-upload cost in the grad harness.

Hypothesis (probe_stream_fwd r3): the MXU traversal reads ~1.5 ms/call
amortized REGARDLESS of ray count because the jitted lambdas close over
the scene pytree — captured device arrays are re-sent through the relay
on every execution (~23 ms/call, verify-skill r1s2 note). If true, every
recorded fwd/fwd+bwd number carries ~24 ms of NON-compute overhead that
argument-passing eliminates.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fluctus_tpu.core.types import RenderConfig
from fluctus_tpu.parallel.mesh import loss_fn
from fluctus_tpu.render import driver


def timed(f, *a, n=5):
    jax.block_until_ready(f(*a))
    best = 1e30
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cfg = RenderConfig(width=512, height=512, max_bounces=4,
                       use_area_light=False)
    sess = driver.create_session(
        "/root/reference/assets/teapot.ply",
        env_map="/root/reference/assets/env_maps/night.hdr",
        cfg=cfg, use_sbvh=True, cache_dir="data/hierarchies",
        state_dir=None)
    scene, params = sess.scene, sess.params
    cfg = sess.cfg
    n = 1 << 16
    n_pix = cfg.width * cfg.height
    pixel_idx = jnp.arange(n, dtype=jnp.uint32) * (n_pix // n)
    target = jnp.zeros((n, 3), jnp.float32)
    diff = {"kd": scene.materials.kd, "env_image": scene.envmap.image}

    f_closure = jax.jit(lambda d: loss_fn(d, scene, params, cfg, pixel_idx,
                                          jnp.uint32(0), target))
    f_arg = jax.jit(lambda d, sc: loss_fn(d, sc, params, cfg, pixel_idx,
                                          jnp.uint32(0), target))

    import concurrent.futures as cf
    with cf.ThreadPoolExecutor(2) as ex:
        a = ex.submit(lambda: f_closure.lower(diff).compile())
        b = ex.submit(lambda: f_arg.lower(diff, scene).compile())
        fc, fa = a.result(), b.result()

    t_c = timed(fc, diff)
    t_a = timed(fa, diff, scene)
    print(f"lockstep fwd, scene as CLOSURE: {t_c*1e3:7.1f} ms")
    print(f"lockstep fwd, scene as ARG:     {t_a*1e3:7.1f} ms")
    print(f"upload overhead: {(t_c-t_a)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
