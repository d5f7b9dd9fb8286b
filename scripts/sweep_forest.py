"""Work-queue forest sweep on real HW: chunk size x kernel block width.

Times the FULL jitted work-queue traversal (the while_loop driver, octant
sub-sorted segments) for each (target_tris, wq_blk) config, 4 reps inside
one jit for amortized cost; compiles all configs concurrently (the relay
compile is the wall-clock bottleneck). Spot-checks prim agreement vs the
XLA wide backend on the first config.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fluctus_tpu.accel.forest import build_host_forest
from fluctus_tpu.accel import bvh as bvh_mod
from fluctus_tpu.ops import traverse_forest as tf

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from bench_forest import build_scene  # noqa: E402

N = 1 << 16
REPS = 4
CONFIGS = [(8192, 128), (8192, 256), (2048, 128), (2048, 256)]


def timed(f, *a, n=3):
    jax.block_until_ready(f(*a))
    best = 1e30
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    host = build_scene()
    host.build_bvh(cache_dir="data/hierarchies", use_sbvh=True)

    def build_binary(a, b, c):
        from fluctus_tpu.accel import native
        r = native.build_native(a, b, c, bvh_mod.MAX_LEAF,
                                bvh_mod.MAX_DEPTH, 1e-5, True)
        return r if r is not None else bvh_mod.build_bvh(a, b, c)

    tables = {}
    for tt in sorted({t for t, _ in CONFIGS}):
        t0 = time.perf_counter()
        hf = build_host_forest(host.v0, host.v1, host.v2, build_binary,
                               target_tris=tt)
        ft = tf.encode_forest(hf)
        jax.block_until_ready(ft.nodes)
        tables[tt] = ft
        print(f"target_tris {tt}: chunks {ft.nodes.shape[0]} "
              f"nodes {ft.nodes.shape} leaves {ft.leaves.shape} "
              f"lvl {ft.lvl} ({time.perf_counter()-t0:.0f} s)",
              flush=True)

    key = jax.random.PRNGKey(0)
    o = jax.random.uniform(key, (N, 3)) * 13.0
    d = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    oc = jnp.stack([jnp.full((N,), -2.0),
                    jax.random.uniform(jax.random.PRNGKey(2), (N,)) * 13.0,
                    jax.random.uniform(jax.random.PRNGKey(3), (N,)) * 13.0],
                   axis=1)
    dc = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (N, 3))

    def make(tt, blk):
        ft = tables[tt]

        def g(oo, dd):
            def body(s, _):
                r = tf.traverse_closest(ft, oo + s * 1e-30, dd,
                                        np.float32(1e30), wq_blk=blk)
                return s + jnp.sum(r.t) * 1e-30, r.prim[:128]
            s, pr = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
            return s, pr[-1]
        return jax.jit(g)

    import concurrent.futures as cf
    fns = {(tt, blk): make(tt, blk) for tt, blk in CONFIGS}
    if os.environ.get("PROBE_TRACE_ONLY"):   # cheap CPU shape check
        for k, f in fns.items():
            print(k, jax.eval_shape(f, o, d))
        return
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(max_workers=len(fns)) as ex:
        futs = {k: ex.submit(lambda f=f: f.lower(o, d).compile())
                for k, f in fns.items()}
        comp = {}
        for k, v in futs.items():
            try:
                comp[k] = v.result()
            except Exception as e:
                print(f"config {k} failed to compile: "
                      f"{str(e).splitlines()[0][:200]}", flush=True)
    print(f"compiled {len(comp)}/{len(fns)} programs in "
          f"{time.perf_counter()-t0:.0f} s", flush=True)

    if not comp:
        return
    # cross-config prim parity (all configs traverse the same scene)
    prims = {k: np.asarray(fc(o, d)[1]) for k, fc in comp.items()}
    base = next(iter(prims.values()))
    for k, p in prims.items():
        mm = int((p != base).sum())
        print(f"prim parity {k} vs base: {mm}/128 mismatches", flush=True)

    for (tt, blk), fc in comp.items():
        for tag, oo, dd in (("incoh", o, d), ("coh", oc, dc)):
            t = timed(fc, oo, dd) / REPS
            print(f"tt={tt:5d} blk={blk:3d} {tag:6s}: {t*1e3:7.1f} ms "
                  f"({N/t/1e6:6.2f} MRays/s)", flush=True)


if __name__ == "__main__":
    main()
