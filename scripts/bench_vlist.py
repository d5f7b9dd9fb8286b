"""A/B the r5 visit-list brute scheduler vs the r4 round-loop walk on
real hardware (703k-tri sphere grid, 64k rays, coherent + incoherent),
sweeping V (visits per pass per block) and blk.

Pattern (verify skill): amortized in-jit reps, concurrent AOT compiles,
trace-check with PROBE_TRACE_ONLY=1 on CPU first.
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
from fluctus_tpu.core.types import BruteForest
from fluctus_tpu.ops import traverse_brute as tb

from bench_forest import build_scene

N = 1 << 16
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
    host = build_scene()
    tt_chunk = int(os.environ.get("SWEEP_TT", "8192"))
    hb = build_brute_forest(host.v0, host.v1, host.v2,
                            target_tris=tt_chunk)
    bf_v = BruteForest(tris=jnp.asarray(hb.tris),
                       boxes=jnp.asarray(hb.boxes),
                       boxes_t=jnp.asarray(hb.boxes_t),
                       tboxes=jnp.asarray(hb.tboxes), tile=hb.tile)
    bf_r = bf_v.replace(tboxes=None)  # rounds fallback
    print(f"C={hb.boxes.shape[0]} tp={hb.tris.shape[2]} "
          f"ntp={hb.tboxes.shape[2]}", flush=True)

    key = jax.random.PRNGKey(0)
    o = jax.random.uniform(key, (N, 3)) * 13.0
    d = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    oc = jnp.stack([jnp.full((N,), -2.0),
                    jax.random.uniform(jax.random.PRNGKey(2), (N,)) * 13,
                    jax.random.uniform(jax.random.PRNGKey(3), (N,)) * 13],
                   axis=1)
    dc = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (N, 3))

    fns = {}
    for coh, rays in (("inc", (o, d)), ("coh", (oc, dc))):
        def f_rounds(s, rays=rays):
            r = tb.traverse_closest(bf_r, rays[0] + s * 1e-30, rays[1],
                                    3.4e38)
            return jnp.sum(r.t * (r.t < 1e30))
        fns[f"rounds/{coh}"] = rep(f_rounds)
        for v_per in (4, 8, 16):
            for blk in (128, 256):
                def f_v(s, rays=rays, v_per=v_per, blk=blk):
                    # _run_vlist is called directly so V/blk are explicit
                    # (the env-var default is read at import time)
                    o8, d8, tv, b = tb._prep(rays[0] + s * 1e-30, rays[1],
                                             3.4e38, blk)
                    bt, bp, bu, bv = tb._run_vlist(
                        bf_v, o8, d8, tv, False, blk, v_per,
                        tb._vlist_tile(bf_v))
                    return jnp.sum(bt * (bt < 1e30))
                fns[f"vlist/{coh}/V{v_per}/blk{blk}"] = rep(f_v)

    if os.environ.get("PROBE_TRACE_ONLY"):
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
        per_stage = best / REPS
        print(f"{name:28s} {per_stage * 1e3:8.2f} ms/stage "
              f"{N / per_stage / 1e6:6.2f} MRays/s", flush=True)


if __name__ == "__main__":
    main()
