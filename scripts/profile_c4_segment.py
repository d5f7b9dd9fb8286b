"""Config-4 IN-FRAME segment decomposition: the isolated traversal probe
reads ~17 ms/16k primaries but the production frame pays ~4x that per
segment-equivalent. Times ONE compiled 8-segment stream launch on the
6.3M-tri scene at the production pool, real vs traversal-stubbed, plus
a pure-traversal call on the SAME mixed pool population for reference.

JAX_COMPILATION_CACHE_DIR=data/xla_cache python scripts/profile_c4_segment.py
Trace-check: PROBE_TRACE_ONLY=1 on CPU (small grid).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from fluctus_tpu.core.types import Hit, RenderConfig
from fluctus_tpu.integrators import common, wavefront
from fluctus_tpu.render import driver

from bench_config4 import build_scene

NSEG = 8


def stub_trace(scene, params, cfg, orig, dir):
    b = orig.shape[0]
    t = jnp.ones((b,), jnp.float32)
    return Hit(t=t, prim=jnp.zeros((b,), jnp.int32),
               p=orig + t[:, None] * dir,
               n=jnp.broadcast_to(jnp.array([0., 0., 1.]), (b, 3)),
               uv=jnp.zeros((b, 2), jnp.float32),
               mat_id=jnp.zeros((b,), jnp.int32),
               area_light=jnp.zeros((b,), bool))


def main():
    probe = bool(os.environ.get("PROBE_TRACE_ONLY"))
    grid = 5 if probe else 17
    host = build_scene(grid, 3)
    scene = host.to_device()
    cfg = RenderConfig(width=1024, height=1024, max_bounces=4,
                       use_env_map=False, use_area_light=False,
                       backend="mxu", pool_size=1 << 16)
    params = driver.auto_frame_camera(
        driver.default_params(world_radius=host.world_radius()), host)
    pool = 1 << 12 if probe else cfg.pool_size

    real_trace = common.trace_scene

    results = {}
    for tag, stub in (("full", False), ("- traversal", True)):
        common.trace_scene = stub_trace if stub else real_trace

        state, counters = wavefront.init_stream_state(params, cfg, pool)

        # fresh jit per variant: _clear_cache() on the shared module jit
        # does NOT invalidate its trace cache (r5 finding — stub variants
        # silently reused the unstubbed trace). ALSO: segment timings are
        # only valid while counters[0] < n_pix*spp — past the spawn
        # target the pool is DEAD and a segment reads ~1 ms.
        @jax.jit
        def fresh(scene, params, st, ct, cfg=cfg):
            def body(carry, _):
                st, ct, rows = wavefront._stream_segment(
                    scene, params, cfg, carry[0], carry[1], 64)
                return (st, ct), rows
            (st, ct), rows = jax.lax.scan(body, (st, ct), None,
                                          length=NSEG)
            return st, ct, rows

        def launch(s, fresh=fresh):
            return fresh(scene, params, s[0], s[1])

        if probe:
            out = jax.eval_shape(fresh, scene, params, state, counters)
            print(tag, "trace ok")
            continue

        s = (state, counters)
        out = launch(s)
        s = out[:2]
        out = launch(s)
        s = out[:2]
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = launch(s)
            s = out[:2]
            float(jnp.sum(out[1]))
            best = min(best, time.perf_counter() - t0)
        results[tag] = best / NSEG
        print(f"{tag:14s} {best/NSEG*1e3:8.2f} ms/segment "
              f"(counters {np.asarray(out[1])})", flush=True)

    common.trace_scene = real_trace
    if results and "full" in results and "- traversal" in results:
        tr = results["full"] - results["- traversal"]
        print(f"\ntraversal {tr*1e3:.2f} ms/segment "
              f"({100*tr/results['full']:.0f}% of segment), "
              f"glue {results['- traversal']*1e3:.2f} ms")


if __name__ == "__main__":
    main()
