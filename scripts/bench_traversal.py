"""Traversal-backend microbenchmark on real hardware.

Measurement notes (hard-won on the axon relay):
  * jit-closure constants are re-uploaded per execution over the relay
    (~23 ms for the BVH tables) — every benched function takes the BVH as
    an ARGUMENT;
  * execution acks can be async — timings chain each call's input on the
    previous output and force a final scalar fetch.

Compares the packet kernel (traverse_pallas) against the MXU one-hot-gather
per-lane kernel (traverse_mxu) on camera primaries and real bounce rays
(cosine-sampled from first hits)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fluctus_tpu.core import rng as prng, samplers
from fluctus_tpu.core.types import RenderConfig
from fluctus_tpu.integrators import common
from fluctus_tpu.ops import camera as cam_ops
from fluctus_tpu.ops import ray_sort, traverse_mxu, traverse_pallas
from fluctus_tpu.render import driver

N = 1 << 16


def chained(fn, wbvh, o, d, iters=8):
    out = fn(wbvh, o, d)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for _ in range(iters):
        out = fn(wbvh, o, d + acc * 1e-30)
        acc = jnp.sum(out) * 0.0
    _ = float(acc)
    return (time.perf_counter() - t0) / iters


def bench(name, wbvh, lo, hi, orig, dir):
    t_max = jnp.float32(3.4e38)
    rows = []
    f = jax.jit(lambda w, o, d: traverse_pallas.traverse_closest(
        w, o, d, t_max).t)
    rows.append(("packet 512", chained(f, wbvh, orig, dir)))
    f = jax.jit(lambda w, o, d: ray_sort.sorted_apply(
        o, d, lo, hi,
        lambda oo, dd: traverse_pallas.traverse_closest(w, oo, dd, t_max)).t)
    rows.append(("packet 512 sorted", chained(f, wbvh, orig, dir)))
    for blk in (512, 1024):
        f = jax.jit(lambda w, o, d, b=blk: traverse_mxu.traverse_closest(
            w, o, d, t_max, blk=b).t)
        rows.append((f"mxu {blk}", chained(f, wbvh, orig, dir)))
    for label, dt in rows:
        print(f"  {name:20s} {label:18s} {dt*1e3:7.2f} ms "
              f"({N/dt/1e6:6.1f} MRays/s)")


def main():
    cfg = RenderConfig(width=512, height=512, max_bounces=4,
                       use_area_light=False, tile_size=N)
    sess = driver.create_session(
        "/root/reference/assets/teapot.ply",
        env_map="/root/reference/assets/env_maps/night.hdr",
        cfg=cfg, use_sbvh=True, cache_dir="data/hierarchies")
    cfg, scene, params = sess.cfg, sess.scene, sess.params
    wbvh = scene.wbvh
    lo, hi = common._wbvh_bounds(wbvh)
    print(f"wbvh nodes {wbvh.nodes.shape} leaves {wbvh.leaves.shape} "
          f"depth {wbvh.depth}")

    pix = jnp.arange(N, dtype=jnp.uint32) * 4
    z = jnp.zeros_like(pix)
    u = [prng.uniform(pix, jnp.uint32(0), z, s) for s in
         (prng.Streams.AA_X, prng.Streams.AA_Y, prng.Streams.LENS_R,
          prng.Streams.LENS_TH)]
    orig, dir = cam_ops.generate_rays(params.camera, pix, cfg.width,
                                      cfg.height, u[0], u[1], u[2], u[3],
                                      params.world_radius)
    bench("primary", wbvh, lo, hi, orig, dir)

    hit = common.trace_scene(scene, params, cfg, orig, dir)
    alive = hit.prim >= 0
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    wo, _ = samplers.cosine_hemisphere(hit.n, jax.random.uniform(k1, (N,)),
                                       jax.random.uniform(k2, (N,)))
    o2 = hit.p + common.OFFSET_CONT * wo
    o2, wo = common.neutralize_rays(o2, wo, alive)
    print(f"bounce alive fraction {float(jnp.mean(alive)):.3f}")
    bench("bounce", wbvh, lo, hi, o2, wo)


if __name__ == "__main__":
    main()
