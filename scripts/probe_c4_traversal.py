"""Config-4 traversal isolation: vlist vs rounds on the ACTUAL ray
population of the protocol frame (camera primaries of the 6.3M-tri grid
at 1024², and one diffuse bounce off the primary hits), sweeping chunk
size (the tile-pruned vlist kernel can afford bigger chunks) and V.

JAX_COMPILATION_CACHE_DIR=data/xla_cache python scripts/probe_c4_traversal.py
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

from fluctus_tpu.accel.forest import build_brute_forest
from fluctus_tpu.core.types import BruteForest, RenderConfig
from fluctus_tpu.ops import camera as cam_ops
from fluctus_tpu.ops import traverse_brute as tb
from fluctus_tpu.render import driver

from bench_config4 import build_scene

N = 1 << 14
REPS = 4


def rep(fn):
    def g(seed):
        def body(s, _):
            out = fn(s)
            return s + out * 1e-30, None
        s, _ = jax.lax.scan(body, seed, None, length=REPS)
        return s
    return jax.jit(g)


def main():
    probe = bool(os.environ.get("PROBE_TRACE_ONLY"))
    grid = 5 if probe else 17
    host = build_scene(grid, 3)
    params = driver.auto_frame_camera(
        driver.default_params(world_radius=host.world_radius()), host)
    cfg = RenderConfig(width=1024, height=1024, max_bounces=4,
                       use_env_map=False, backend="mxu")

    # strided primaries across the full frame (the protocol's first
    # segment population after the stream's pixel striding)
    pix = (jnp.arange(N, dtype=jnp.uint32)
           * jnp.uint32(1024 * 1024 // N))
    half = jnp.full((N,), 0.5, jnp.float32)
    zero = jnp.zeros((N,), jnp.float32)
    o_p, d_p = cam_ops.generate_rays(params.camera, pix, 1024, 1024,
                                     half, half, zero, zero,
                                     params.world_radius)

    tts = (8192, 32768, 65536) if not probe else (512,)
    forests = {}
    for tt in tts:
        hb = build_brute_forest(host.v0, host.v1, host.v2, target_tris=tt)
        forests[tt] = BruteForest(
            tris=jnp.asarray(hb.tris), boxes=jnp.asarray(hb.boxes),
            boxes_t=jnp.asarray(hb.boxes_t),
            tboxes=jnp.asarray(hb.tboxes), tile=hb.tile)
        print(f"TT={tt}: C={hb.boxes.shape[0]} tp={hb.tris.shape[2]}",
              flush=True)

    # bounce rays: cosine-ish scatter off the primary hit points (use the
    # default-TT forest to find hits once, outside the timed region)
    bf0 = forests[tts[-1]]
    if probe:
        t = jnp.ones((N,), jnp.float32)   # no real execution in trace mode
    else:
        res = tb.traverse_closest(bf0, o_p, d_p, np.float32(3.4e38))
        t = jnp.where(res.prim >= 0, res.t, 1.0)
    p_hit = o_p + t[:, None] * d_p
    g = np.random.default_rng(5)
    d_b = jnp.asarray(g.normal(size=(N, 3)), jnp.float32)
    d_b = d_b / jnp.linalg.norm(d_b, axis=1, keepdims=True)
    o_b = p_hit - 1e-3 * d_p

    fns = {}
    for kind, (o, d) in (("prim", (o_p, d_p)), ("bounce", (o_b, d_b))):
        for tt, bf in forests.items():
            bfr = bf.replace(tboxes=None)

            def f_r(s, bf=bfr, o=o, d=d):
                r = tb.traverse_closest(bf, o + s * 1e-30, d, 3.4e38)
                return jnp.sum(r.t * (r.t < 1e30))
            fns[f"rounds/{kind}/TT{tt}"] = rep(f_r)
            for v_per in ((8,) if probe else (8, 16)):
                def f_v(s, bf=bf, o=o, d=d, v_per=v_per):
                    o8, d8, tv, b = tb._prep(o + s * 1e-30, d, 3.4e38, 128)
                    bt, bp, bu, bv = tb._run_vlist(
                        bf, o8, d8, tv, False, 128, v_per,
                        tb._vlist_tile(bf))
                    return jnp.sum(bt * (bt < 1e30))
                fns[f"vlist/{kind}/TT{tt}/V{v_per}"] = rep(f_v)

    if probe:
        for k, f in fns.items():
            print(k, jax.eval_shape(f, jnp.float32(0)))
        return

    import concurrent.futures as cf
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(min(len(fns), 10)) as ex:
        compiled = dict(zip(fns, ex.map(
            lambda f: f.lower(jnp.float32(0)).compile(), fns.values())))
    print(f"compiled {len(fns)} in {time.perf_counter() - t0:.1f}s",
          flush=True)

    for name, f in compiled.items():
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(jnp.float32(0)))
            best = min(best, time.perf_counter() - t0)
        per = best / REPS
        print(f"{name:28s} {per*1e3:8.2f} ms "
              f"{N/per/1e6:6.2f} MRays/s", flush=True)


if __name__ == "__main__":
    main()
