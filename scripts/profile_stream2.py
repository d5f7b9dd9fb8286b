"""In-frame differencing: stub the traversals out of the fused stream
program to split per-segment cost into traversal vs shading/logic."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fluctus_tpu.core.types import Hit, RenderConfig
from fluctus_tpu.integrators import common, wavefront
from fluctus_tpu.render import driver


def timeit(fn, iters=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    best = 1e30
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    spp = 16
    cfg0 = RenderConfig(width=512, height=512, max_bounces=4,
                        use_area_light=False, tile_size=1 << 16)
    sess = driver.create_session(
        "/root/reference/assets/teapot.ply",
        env_map="/root/reference/assets/env_maps/night.hdr",
        cfg=cfg0, use_sbvh=True, cache_dir="data/hierarchies")
    n_pix = cfg0.width * cfg0.height
    pool = min(cfg0.pool_size, max(1 << 12, min(1 << 15, n_pix)))
    cfg = sess.cfg.replace(pool_size=pool)

    real_trace = common.trace_scene
    real_shadow = common._shadow_blocked

    def run_frame():
        img, counters = wavefront.render_stream(sess.scene, sess.params,
                                                cfg, spp)
        return img

    t_full = timeit(run_frame, iters=2)
    print(f"full frame:                {t_full*1e3:8.1f} ms")

    # ---- stub shadow only
    def stub_shadow(scene, params, c, o, d, l, **kw):
        return jnp.zeros(o.shape[:1], bool)

    common._shadow_blocked = stub_shadow
    wavefront.stream_rounds._clear_cache()
    t_nosh = timeit(run_frame, iters=2)
    print(f"stub shadow trace:         {t_nosh*1e3:8.1f} ms  "
          f"(shadow trace = {(t_full-t_nosh)*1e3:.1f} ms)")

    # ---- stub both traversals (fake hit: everything hits prim 0 at t=1)
    def stub_trace(scene, params, c, orig, dir):
        g = scene.geom
        b = orig.shape[0]
        prim = jnp.zeros((b,), jnp.int32)
        t = jnp.ones((b,), jnp.float32)
        p = orig + t[:, None] * dir
        n = jnp.broadcast_to(jnp.array([0., 0., 1.]), (b, 3))
        uv = jnp.zeros((b, 2), jnp.float32)
        return Hit(t=t, prim=prim, p=p, n=n, uv=uv,
                   mat_id=jnp.zeros((b,), jnp.int32),
                   area_light=jnp.zeros((b,), bool))

    common.trace_scene = stub_trace
    wavefront.stream_rounds._clear_cache()
    # NOTE: with everything "hitting", paths run full max_bounces —
    # different segment count; report per-segment cost instead.
    st = wavefront.init_state(sess.params, cfg)
    slots = jnp.zeros((pool,), jnp.uint32)
    k = 272
    rgb = jnp.zeros((3, pool, k), jnp.float32)
    pixb = jnp.full((pool, k), -1, jnp.int32)
    cnt = jnp.zeros((3,), jnp.uint32)

    def seg8(state, slots, rgb, pixb, cnt):
        return wavefront.stream_rounds(sess.scene, sess.params, cfg, state,
                                       slots, rgb, pixb, cnt, spp, k, 8)

    out = seg8(st, slots, rgb, pixb, cnt)  # compile+warm (donates)
    out = seg8(*out)
    t0 = time.perf_counter()
    for _ in range(4):
        out = seg8(*out)
    jax.block_until_ready(out)
    t8 = (time.perf_counter() - t0) / 4
    print(f"8 stubbed segments:        {t8*1e3:8.1f} ms "
          f"({t8/8*1e3:.2f} ms/segment, no traversal at all)")

    # same 8-segment probe with REAL traversal for a clean per-segment split
    common.trace_scene = real_trace
    common._shadow_blocked = real_shadow
    wavefront.stream_rounds._clear_cache()
    st = wavefront.init_state(sess.params, cfg)
    rgb = jnp.zeros((3, pool, k), jnp.float32)
    pixb = jnp.full((pool, k), -1, jnp.int32)
    out = seg8(st, jnp.zeros((pool,), jnp.uint32), rgb, pixb,
               jnp.zeros((3,), jnp.uint32))
    out = seg8(*out)
    t0 = time.perf_counter()
    for _ in range(4):
        out = seg8(*out)
    jax.block_until_ready(out)
    t8r = (time.perf_counter() - t0) / 4
    print(f"8 real segments:           {t8r*1e3:8.1f} ms "
          f"({t8r/8*1e3:.2f} ms/segment)")
    print(f"-> traversal (closest+shadow) = {(t8r-t8)/8*1e3:.2f} ms/segment "
          f"of {t8r/8*1e3:.2f}")


if __name__ == "__main__":
    main()
