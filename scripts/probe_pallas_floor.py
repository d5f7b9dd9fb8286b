"""Isolate the ~1.5 ms per-call floor of the MXU traversal (r3e/r3g).

Times, amortized (16 in-jit reps, concurrent AOT compiles):
  1. a trivial one-block Pallas copy kernel        -> pallas_call overhead
  2. a 64-step grid Pallas copy                    -> per-grid-step cost
  3. mxu traverse_closest at 1k rays (1 block)     -> floor w/o grid
  4. mxu traverse_closest at 64k rays (64 blocks)  -> known ~1.7 ms
If (1) is ~1.4 ms the floor is endemic pallas_call overhead on this
toolchain; if (3) >> (1) it lives in the traversal program itself
(table DMA / pipeline warmup), pointing at kernel-structure fixes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluctus_tpu.core.types import RenderConfig
from fluctus_tpu.integrators import common
from fluctus_tpu.ops import traverse_mxu
from fluctus_tpu.render import driver

REPS = 16


def timed(f, *a, n=3):
    jax.block_until_ready(f(*a))
    best = 1e30
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def rep(f):
    def g(seed):
        def body(s, _):
            return s + jnp.sum(f(s)) * 1e-30, None
        s, _ = jax.lax.scan(body, seed, None, length=REPS)
        return s
    return jax.jit(g)


def _copy_kernel(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :] + 1.0


def copy1(s):
    return pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(s)


def copy64(s):
    big = jnp.tile(s, (64, 1)) + 0.0
    return pl.pallas_call(
        _copy_kernel,
        grid=(64,),
        out_shape=jax.ShapeDtypeStruct((64 * 8, 128), jnp.float32),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(big)


def main():
    cfg = RenderConfig(width=512, height=512, max_bounces=4,
                       use_area_light=False, backend="mxu")
    sess = driver.create_session(
        "/root/reference/assets/teapot.ply",
        env_map="/root/reference/assets/env_maps/night.hdr",
        cfg=cfg, use_sbvh=True, cache_dir="data/hierarchies",
        state_dir=None)
    wb = sess.scene.wbvh
    x0 = jnp.zeros((8, 128), jnp.float32)

    key = jax.random.PRNGKey(0)
    o64 = jax.random.uniform(key, (1 << 16, 3)) * 4.0 - 2.0
    d64 = jax.random.normal(jax.random.PRNGKey(1), (1 << 16, 3))
    d64 = d64 / jnp.linalg.norm(d64, axis=1, keepdims=True)
    o1, d1 = o64[:1024], d64[:1024]

    fns = {
        "pallas copy 1 block ": rep(copy1),
        "pallas copy 64 steps": rep(copy64),
        "mxu closest 1k rays ": rep(lambda s: traverse_mxu.traverse_closest(
            wb, o1 + s[0, 0] * 1e-30, d1, common.T_MAX).t),
        "mxu closest 64k rays": rep(lambda s: traverse_mxu.traverse_closest(
            wb, o64 + s[0, 0] * 1e-30, d64, common.T_MAX).t),
    }
    if os.environ.get("PROBE_TRACE_ONLY"):
        for k, f in fns.items():
            print(k, jax.eval_shape(f, x0))
        return

    import concurrent.futures as cf
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(len(fns)) as ex:
        comp = {k: ex.submit(lambda f=f: f.lower(x0).compile())
                for k, f in fns.items()}
        comp = {k: v.result() for k, v in comp.items()}
    print(f"compiled {len(comp)} in {time.perf_counter()-t0:.0f} s",
          flush=True)
    for k, fc in comp.items():
        t = timed(fc, x0)
        print(f"{k}: {t/REPS*1e3:7.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
