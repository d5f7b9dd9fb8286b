"""Diagnose the streamed-forest schedule: per-block hit-chunk counts,
entry distributions, and timing sensitivity to blk/kk on the 703k scene."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fluctus_tpu.ops import traverse_forest as tf
from fluctus_tpu.ops import ray_sort

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from bench_forest import build_scene  # noqa: E402

N = 1 << 16


def main():
    host = build_scene()
    host.build_bvh(cache_dir="data/hierarchies", use_sbvh=True)
    scene = host.to_device()
    ft = scene.ftables
    print("chunks:", ft.nodes.shape, ft.leaves.shape, "lvl", ft.lvl)

    key = jax.random.PRNGKey(0)
    grid_hi = 13.0
    o = jax.random.uniform(key, (N, 3)) * grid_hi
    d = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    oc = jnp.stack([jnp.full((N,), -2.0),
                    jax.random.uniform(jax.random.PRNGKey(2), (N,)) * grid_hi,
                    jax.random.uniform(jax.random.PRNGKey(3), (N,)) * grid_hi],
                   axis=1)
    dc = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (N, 3))

    for tag, oo, dd in (("incoherent", o, d), ("coherent", oc, dc)):
        # sort like the driver does
        lo = jnp.min(ft.boxes[:, 0:3], axis=0)
        hi = jnp.max(ft.boxes[:, 3:6], axis=0)
        keys = ray_sort.ray_sort_keys(oo, dd, lo, hi)
        order = jnp.argsort(keys)
        os_, ds_ = oo[order], dd[order]
        for blk in (256, 512, 1024):
            orig_t, dir_t, t_row, _ = tf._prep(os_, ds_,
                                               np.float32(1e30), blk)
            e = tf._block_entries(ft.boxes, orig_t, dir_t, t_row, blk)
            cnt = np.asarray(jnp.sum(jnp.isfinite(e), axis=1))
            print(f"{tag} blk={blk}: hit-chunks/block mean {cnt.mean():.1f} "
                  f"p50 {np.percentile(cnt,50):.0f} "
                  f"p90 {np.percentile(cnt,90):.0f} max {cnt.max()}")

    # timing sensitivity (closest only, chained like bench_forest)
    for blk, kk in ((1024, 8), (512, 8), (256, 8), (1024, 16)):
        @jax.jit
        def chain(o, d):
            def body(c, _):
                o, d = c
                r = tf.traverse_closest(ft, o, d, np.float32(1e30),
                                        blk=blk, kk=kk)
                d2 = d.at[:, 0].add(jnp.where(r.t < 1e30, 1e-6, -1e-6))
                d2 = d2 / jnp.linalg.norm(d2, axis=1, keepdims=True)
                return (o, d2), r.t[0]
            (_, d), ts = jax.lax.scan(body, (o, d), None, length=4)
            return ts.sum() + d.sum()

        for tag, oo, dd in (("incoh", o, d), ("coh", oc, dc)):
            float(chain(oo, dd))
            best = 1e30
            for _ in range(3):
                t0 = time.perf_counter()
                float(chain(oo, dd))
                best = min(best, time.perf_counter() - t0)
            per = best / 4
            print(f"blk={blk} kk={kk} {tag}: {per*1e3:7.1f} ms/stage "
                  f"({N/per/1e6:6.2f} MRays/s)")


if __name__ == "__main__":
    main()
