"""Amortized device-side cost of each work-queue round piece.

probe_forest_rounds showed ~57 ms/round host-stepped but the axon relay
adds per-call latency that swamps single-call timings. Here every piece
runs 16x inside ONE jit (lax.scan with data dependence so XLA cannot
collapse the repeats), so wall/16 is true device cost + 1/16 latency.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fluctus_tpu.ops import traverse_forest as tf

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from bench_forest import build_scene  # noqa: E402

N = 1 << 16
REPS = 16


def timed(f, *a, n=3):
    jax.block_until_ready(f(*a))
    best = 1e30
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    blk = int(os.environ.get("WQ_BLK", tf.WQ_BLK))
    host = build_scene()
    host.build_bvh(cache_dir="data/hierarchies", use_sbvh=True)
    scene = host.to_device()
    ft = scene.ftables
    c = ft.boxes.shape[0]

    key = jax.random.PRNGKey(0)
    o = jax.random.uniform(key, (N, 3)) * 13.0
    d = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    orig_t, dir_t, t_row, bb = tf._prep(o, d, np.float32(1e30), blk)
    ot = orig_t.T
    dt_ = dir_t.T
    inv = tf._safe_inv(dt_)
    t0v = t_row[0]
    cap = bb + c * blk
    nb = cap // blk

    # latency floor
    x0 = jnp.zeros((8, 128), jnp.float32)
    lat = timed(jax.jit(lambda x: x + 1.0), x0)
    print(f"latency floor (tiny op): {lat*1e3:7.2f} ms", flush=True)

    def rep(f):
        """scan f REPS times with a carried perturbation."""
        def g(seed):
            def body(s, _):
                out = f(s)
                return s + jnp.sum(out) * 1e-30, None
            s, _ = jax.lax.scan(body, seed, None, length=REPS)
            return s
        return jax.jit(g)

    # 1. _next_chunk (perturb best_t)
    cur_e0 = jnp.full((bb,), -1.0, jnp.float32)
    cur_c0 = jnp.full((bb,), -1, jnp.int32)
    f1 = rep(lambda s: tf._next_chunk(ft.boxes, ot, dt_, inv,
                                      t0v + s[0, 0], cur_e0, cur_c0)[0])

    # 2. argsort pair (order + rank) at bb
    keyv = jax.random.randint(jax.random.PRNGKey(3), (bb,), 0, c)
    def sorts(s):
        kv = keyv + s[0, 0].astype(jnp.int32)
        order = jnp.argsort(kv)
        rank = jnp.argsort(order)
        return rank.astype(jnp.float32)
    f2 = rep(sorts)

    # 3. kernel launch, round-1 schedule (fixed schedule, perturb t)
    ne0, nc0 = jax.jit(lambda: tf._next_chunk(
        ft.boxes, ot, dt_, inv, t0v, cur_e0, cur_c0))()
    bp0 = jnp.full((bb,), -1, jnp.int32)
    z = jnp.zeros((bb,), jnp.float32)

    def sched_arrays(nc):
        live = nc >= 0
        kv = jnp.where(live, nc, c)
        order = jnp.argsort(kv)
        ch_sorted = kv[order]
        starts = jnp.searchsorted(ch_sorted, jnp.arange(c + 1),
                                  side="left").astype(jnp.int32)
        count = starts[1:] - starts[:-1]
        pc = -(-count // blk) * blk
        ps = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(pc)])
        bpos = jnp.arange(nb, dtype=jnp.int32) * blk
        cb = jnp.clip(jnp.searchsorted(ps, bpos, side="right")
                      .astype(jnp.int32) - 1, 0, c - 1)
        s_idx = jnp.arange(cap, dtype=jnp.int32)
        c_slot = jnp.repeat(cb, blk)
        j = s_idx - ps[c_slot]
        dead = (j < 0) | (j >= count[c_slot])
        ray = jnp.where(dead, 0,
                        order[jnp.clip(starts[c_slot] + j, 0, bb - 1)])
        it = jnp.where(dead, 0.0, t0v[ray])[None, :]
        return cb[:, None], ray, it

    sel, ray, it = jax.block_until_ready(jax.jit(sched_arrays)(nc0))
    ip = bp0[ray][None, :]
    iu = z[ray][None, :]
    iv = z[ray][None, :]
    oT = ot[ray].T
    dT = dt_[ray].T
    sel_ent = jnp.zeros((nb, 1), jnp.int32)
    live_slots = int(jnp.sum(it[0] > 0.0))

    def lau(s):
        out = tf._launch(sel, sel_ent, ft.nodes, ft.leaves, oT, dT,
                         it + s[0, 0] * 1e-30, ip, iu, iv,
                         leaf_width=int(ft.leaf_width), lvl=int(ft.lvl),
                         any_hit=False, blk=blk)
        return out[0]
    f3 = rep(lau)

    # 4. kernel launch, tail occupancy (~1k live)
    live_mask = np.zeros((bb,), bool)
    live_mask[np.random.default_rng(0).choice(bb, 1024, replace=False)] = 1
    nc_tail = jnp.where(jnp.asarray(live_mask), nc0, -1)
    sel4, ray4, it4 = jax.block_until_ready(jax.jit(sched_arrays)(nc_tail))
    ip4 = bp0[ray4][None, :]
    oT4 = ot[ray4].T
    dT4 = dt_[ray4].T

    def lau4(s):
        out = tf._launch(sel4, sel_ent, ft.nodes, ft.leaves, oT4, dT4,
                         it4 + s[0, 0] * 1e-30, ip4, iu, iv,
                         leaf_width=int(ft.leaf_width), lvl=int(ft.lvl),
                         any_hit=False, blk=blk)
        return out[0]
    f4 = rep(lau4)

    # 5. merge-scale gather (cap-sized gather into bb)
    idx = jax.random.randint(jax.random.PRNGKey(5), (bb,), 0, cap)
    big = jnp.zeros((1, cap), jnp.float32)
    def mg(s):
        v = big[0, idx] + s[0, 0]
        return v
    f5 = rep(mg)

    # compile all five CONCURRENTLY (relay compiles dominate wall time)
    import concurrent.futures as cf
    fns = {"_next_chunk": f1, "argsort x2": f2, "kernel round 1": f3,
           "kernel 1k live": f4, "gather bb<-cap": f5}
    if os.environ.get("PROBE_TRACE_ONLY"):   # cheap CPU shape check
        for k, f in fns.items():
            print(k, jax.eval_shape(f, x0))
        return
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(max_workers=5) as ex:
        comp = {k: ex.submit(lambda f=f: f.lower(x0).compile())
                for k, f in fns.items()}
        comp = {k: v.result() for k, v in comp.items()}
    print(f"compiled 5 programs in {time.perf_counter()-t0:.0f} s",
          flush=True)

    for k, fc in comp.items():
        t = timed(fc, x0)
        extra = (f"  ({live_slots} live slots, {nb} blocks)"
                 if k == "kernel round 1" else "")
        print(f"{k:16s} {t/REPS*1e3:7.3f} ms/call{extra}", flush=True)


if __name__ == "__main__":
    main()
