"""Brute-chunk forest sweep on real hardware: (target_tris, plan, blk)
vs incoherent/coherent stage time on the 703k-tri sphere grid, plus a
round/piece decomposition for the default config.

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
    combos = []
    for tt_chunk in (1536, 4096, 8192):
        hb = build_brute_forest(host.v0, host.v1, host.v2,
                                target_tris=tt_chunk)
        bf = BruteForest(tris=jnp.asarray(hb.tris),
                         boxes=jnp.asarray(hb.boxes),
                         boxes_t=jnp.asarray(hb.boxes_t))
        c = hb.boxes.shape[0]
        for plan in ((1, 2, 4), (2, 4), (4,)):
            combos.append((tt_chunk, c, plan, bf))
    print(f"{len(combos)} combos", flush=True)

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
    for i, (tt_chunk, c, plan, bf) in enumerate(combos):
        def mk(bf=bf, plan=plan):
            def f(s):
                r = tb.traverse_closest(bf, o + s * 1e-30, d, 3.4e38,
                                        plan=plan)
                return jnp.sum(r.t * (r.t < 1e30))
            return rep(f)
        fns[(tt_chunk, c, plan)] = mk()

    if os.environ.get("PROBE_TRACE_ONLY"):
        for k, f in fns.items():
            print(k, jax.eval_shape(f, jnp.float32(0)))
        return

    import concurrent.futures as cf
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(min(len(fns), 10)) as ex:
        comp = {k: ex.submit(lambda f=f: f.lower(jnp.float32(0)).compile())
                for k, f in fns.items()}
        comp = {k: v.result() for k, v in comp.items()}
    print(f"compiled {len(comp)} in {time.perf_counter()-t0:.0f} s",
          flush=True)

    for (tt_chunk, c, plan), fc in comp.items():
        float(fc(jnp.float32(0)))
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            float(fc(jnp.float32(0)))
            best = min(best, time.perf_counter() - t0)
        per = best / REPS
        print(f"tris={tt_chunk:5d} C={c:4d} plan={str(plan):10s}: "
              f"{per*1e3:7.1f} ms/stage ({N/per/1e6:5.2f} MRays/s) "
              f"incoherent", flush=True)


if __name__ == "__main__":
    main()
