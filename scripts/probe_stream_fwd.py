"""Decompose the stream-grad FORWARD cost (the fwd+bwd bottleneck).

BASELINE r3: stream_loss fwd 44 ms at pool 2^13 / 12 segments on teapot
(lockstep 55 ms) — only 20% better despite ~3.3x less traced work. This
probe times, amortized in-jit (16 reps, concurrent AOT compiles):
  * the MXU closest/any traversal alone at several widths, sorted vs
    unsorted lanes (bounce-ray realism: random hemisphere dirs from
    actual primary hits)
  * one full stream segment (real trace) vs stub-traced segment at the
    same widths -> splits segment cost into trace / shading+respawn
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fluctus_tpu.core.types import Hit, RenderConfig
from fluctus_tpu.integrators import common, wavefront
from fluctus_tpu.ops import ray_sort, traverse_mxu
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


def main():
    cfg = RenderConfig(width=512, height=512, max_bounces=4,
                       use_area_light=False, backend="mxu")
    sess = driver.create_session(
        "/root/reference/assets/teapot.ply",
        env_map="/root/reference/assets/env_maps/night.hdr",
        cfg=cfg, use_sbvh=True, cache_dir="data/hierarchies",
        state_dir=None)
    scene, params = sess.scene, sess.params
    cfg = sess.cfg
    wb = scene.wbvh
    lo, hi = common._wbvh_bounds(wb)

    n_pix = cfg.width * cfg.height
    x0 = jnp.zeros((8, 128), jnp.float32)

    # realistic bounce rays from actual primary hits
    big = 1 << 16
    pix = (jnp.arange(big, dtype=jnp.uint32) * (n_pix // big))
    po, pd = wavefront._raygen(params, cfg, pix, jnp.zeros_like(pix))
    hit = common.trace_scene(scene, params, cfg, po, pd)
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    rnd = jax.random.normal(k1, (big, 3))
    rnd = rnd / jnp.linalg.norm(rnd, axis=1, keepdims=True)
    sdir = jnp.where((jnp.sum(rnd * hit.n, axis=1,
                              keepdims=True) < 0), -rnd, rnd)
    sorig = hit.p + 1e-3 * sdir
    sorig = jnp.where((hit.prim >= 0)[:, None], sorig, po)
    sdir = jnp.where((hit.prim >= 0)[:, None], sdir, pd)
    jax.block_until_ready(sorig)

    fns = {}
    for wlog in (13, 15, 16):
        w = 1 << wlog
        o_w, d_w = sorig[:w], sdir[:w]

        def closest(s, o_w=o_w, d_w=d_w):
            r = traverse_mxu.traverse_closest(wb, o_w + s[0, 0] * 1e-30,
                                              d_w, common.T_MAX)
            return r.t
        fns[f"closest  2^{wlog} unsorted"] = rep(closest)

        def closest_s(s, o_w=o_w, d_w=d_w):
            f = lambda o, d: traverse_mxu.traverse_closest(
                wb, o, d, common.T_MAX)
            r = ray_sort.sorted_apply(o_w + s[0, 0] * 1e-30, d_w, lo, hi, f)
            return r.t
        fns[f"closest  2^{wlog} sorted  "] = rep(closest_s)

    # full stream segment, real vs stub trace, two pool widths
    real_trace = common.trace_scene
    real_shadow = common._shadow_blocked

    def stub_trace(scene_, params_, c_, orig, dir):
        b = orig.shape[0]
        t = jnp.ones((b,), jnp.float32)
        return Hit(t=t, prim=jnp.zeros((b,), jnp.int32),
                   p=orig + t[:, None] * dir,
                   n=jnp.broadcast_to(jnp.array([0., 0., 1.]), (b, 3)),
                   uv=jnp.zeros((b, 2), jnp.float32),
                   mat_id=jnp.zeros((b,), jnp.int32),
                   area_light=jnp.zeros((b,), bool))

    def stub_shadow(scene_, params_, c_, o, d, l, **kw):
        return jnp.zeros(o.shape[:1], bool)

    for wlog in (13, 15):
        pool = 1 << wlog
        pixel_idx = (jnp.arange(pool, dtype=jnp.uint32)
                     * (n_pix // pool))
        target = jnp.zeros((pool, 3), jnp.float32)

        def seg(s, pixel_idx=pixel_idx, target=target, pool=pool):
            carry = wavefront._stream_loss_init(params, cfg, pixel_idx,
                                                jnp.uint32(0), pool)
            st = carry[0]
            st = st.replace(orig=st.orig + s[0, 0] * 1e-30)
            carry = (st,) + carry[1:]
            carry = wavefront._stream_loss_segment(
                scene, params, cfg, pixel_idx, jnp.uint32(0), target, carry)
            return carry[3]
        fns[f"segment  2^{wlog} real    "] = rep(seg)

    import concurrent.futures as cf
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(max_workers=len(fns)) as ex:
        comp = {k: ex.submit(lambda f=f: f.lower(x0).compile())
                for k, f in fns.items()}
        comp = {k: v.result() for k, v in comp.items()}
    print(f"compiled {len(comp)} in {time.perf_counter()-t0:.0f} s",
          flush=True)

    for k, fc in comp.items():
        t = timed(fc, x0)
        print(f"{k}: {t/REPS*1e3:7.3f} ms/call", flush=True)

    # stub-traced segment needs module monkeypatching (separate, serial)
    common.trace_scene = stub_trace
    common._shadow_blocked = stub_shadow
    try:
        for wlog in (13, 15):
            pool = 1 << wlog
            pixel_idx = (jnp.arange(pool, dtype=jnp.uint32)
                         * (n_pix // pool))
            target = jnp.zeros((pool, 3), jnp.float32)

            def seg2(s, pixel_idx=pixel_idx, target=target, pool=pool):
                carry = wavefront._stream_loss_init(params, cfg, pixel_idx,
                                                    jnp.uint32(0), pool)
                st = carry[0]
                st = st.replace(orig=st.orig + s[0, 0] * 1e-30)
                carry = (st,) + carry[1:]
                carry = wavefront._stream_loss_segment(
                    scene, params, cfg, pixel_idx, jnp.uint32(0), target,
                    carry)
                return carry[3]
            t = timed(rep(seg2), x0)
            print(f"segment  2^{wlog} stub    : {t/REPS*1e3:7.3f} ms/call",
                  flush=True)
    finally:
        common.trace_scene = real_trace
        common._shadow_blocked = real_shadow


if __name__ == "__main__":
    main()
