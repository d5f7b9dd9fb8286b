"""Per-RAY chunk statistics for the work-queue forest design: how many
chunks does each ray's AABB-hit list contain, and how many survive best-t
pruning (entry < final hit t)? Also: per-(block,chunk) visit cost at kk=1."""
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


def main():
    host = build_scene()
    host.build_bvh(cache_dir="data/hierarchies", use_sbvh=True)
    scene = host.to_device()
    ft = scene.ftables
    c = ft.nodes.shape[0]
    print("chunks:", c, "leaf table", ft.leaves.shape)

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
        # per-ray entries: blk=1 reduction -> use _block_entries with blk=1
        orig_t, dir_t, t_row, _ = tf._prep(oo, dd, np.float32(1e30), 1)
        e = tf._block_entries(ft.boxes, orig_t, dir_t, t_row, 1)  # (N, C)
        r = tf.traverse_closest(ft, oo, dd, np.float32(1e30))
        tfin = np.asarray(r.t)[:, None]
        en = np.asarray(e)
        nhit = np.isfinite(en).sum(1)
        npruned = (en < tfin).sum(1)
        print(f"{tag}: per-ray AABB-hit chunks mean {nhit.mean():.2f} "
              f"p90 {np.percentile(nhit,90):.0f}; "
              f"pruned (entry<t_hit) mean {npruned.mean():.2f} "
              f"p50 {np.percentile(npruned,50):.0f} "
              f"p90 {np.percentile(npruned,90):.0f} max {npruned.max()}")
        print(f"{tag}: hit rate {float((np.asarray(r.prim)>=0).mean()):.3f}")


if __name__ == "__main__":
    main()
