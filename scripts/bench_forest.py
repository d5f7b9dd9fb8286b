"""Beyond-VMEM traversal check + benchmark on real hardware: build a
512k-tri sphere grid, verify the MXU treelet-forest traversal against
the XLA wide backend on probe rays, then time coherent/incoherent
stages (chained, scalar-fetched)."""
import os
import sys

os.environ.setdefault("FLUCTUS_FAST_BIG", "0")  # need wbvh for the oracle
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fluctus_tpu.core.types import RenderConfig
from fluctus_tpu.integrators import common
from fluctus_tpu.render import driver
from fluctus_tpu.scene.scene import HostScene, default_material
from fluctus_tpu.scene.textures import TexturePool

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from make_test_scenes import icosphere  # noqa: E402

N_PROBE = 4096
N_BENCH = 1 << 16
STEPS = 8


def build_scene(grid=13, subdiv=2):
    tris = []
    for i in range(grid):
        for j in range(grid):
            for k in range(grid):
                v, f = icosphere(subdiv=subdiv, radius=0.35,
                                 center=(i, j, k))
                tris.append(v[f])
    t = np.concatenate(tris).astype(np.float32)
    print(f"scene: {len(t)} tris")
    v0, v1, v2 = t[:, 0], t[:, 1], t[:, 2]
    n = np.cross(v1 - v0, v2 - v0)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)
    z2 = np.zeros((len(t), 2), np.float32)
    host = HostScene(v0=v0, v1=v1, v2=v2, n0=n, n1=n, n2=n,
                     uv0=z2, uv1=z2, uv2=z2,
                     mat_id=np.zeros(len(t), np.int32),
                     materials=[default_material()],
                     textures=TexturePool())
    return host


def main():
    host = build_scene()
    t0 = time.perf_counter()
    host.build_bvh(cache_dir="data/hierarchies", use_sbvh=True)
    print(f"SBVH build: {time.perf_counter()-t0:.1f} s")
    t0 = time.perf_counter()
    scene = host.to_device()
    if scene.bforest is not None:
        n_chunks = scene.bforest.tris.shape[0]
    elif scene.ftables is not None:
        n_chunks = scene.ftables.nodes.shape[0]
    else:
        n_chunks = len(scene.wforest)
    print(f"upload+tables: {time.perf_counter()-t0:.1f} s; "
          f"forest chunks: {n_chunks}")
    if scene.bforest is not None:
        print(f"bforest (BRUTE): tris {scene.bforest.tris.shape}")
    elif scene.ftables is not None:
        print(f"ftables: nodes {scene.ftables.nodes.shape} "
              f"leaves {scene.ftables.leaves.shape}")

    cfg = RenderConfig(backend="mxu", use_area_light=False,
                       use_env_map=False)
    key = jax.random.PRNGKey(0)
    grid_hi = 13.0
    o = jax.random.uniform(key, (N_BENCH, 3)) * grid_hi
    d = jax.random.normal(jax.random.PRNGKey(1), (N_BENCH, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    # coherent: parallel rays from a face
    oc = jnp.stack([jnp.full((N_BENCH,), -2.0),
                    jax.random.uniform(jax.random.PRNGKey(2), (N_BENCH,))
                    * grid_hi,
                    jax.random.uniform(jax.random.PRNGKey(3), (N_BENCH,))
                    * grid_hi], axis=1)
    dc = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (N_BENCH, 3))

    # --- correctness vs wide backend on probes
    from fluctus_tpu.ops import traverse_wide
    po, pd = o[:N_PROBE], d[:N_PROBE]
    hit_m = common.trace_scene(scene, None, cfg, po, pd)
    r_w = traverse_wide.traverse_closest(scene.wbvh, po, pd, common.T_MAX)
    mm = int(jnp.sum(hit_m.prim != r_w.prim))
    # compare t only on agreeing HITS: miss lanes carry backend-specific
    # far sentinels (wide 3.0e38 vs brute/forest t_max 3.4e38)
    same = np.asarray((hit_m.prim == r_w.prim) & (r_w.prim >= 0))
    tm = np.asarray(hit_m.t)[same]
    tw = np.asarray(r_w.t)[same]
    neq = tm != tw
    mm_t = int(neq.sum())
    rel = (np.abs(tm - tw) / np.maximum(np.abs(tw), 1e-20))[neq]
    print(f"forest vs wide: prim mismatches {mm}/{N_PROBE}, "
          f"t mismatches {mm_t} "
          f"(max rel {rel.max() if len(rel) else 0.0:.2e})")

    # --- throughput (chained, scalar fetch)
    @jax.jit
    def chain(o, d):
        def body(c, _):
            o, d = c
            hit = common.trace_scene(scene, None, cfg, o, d)
            d2 = d.at[:, 0].add(jnp.where(hit.t < 1e30, 1e-6, -1e-6))
            d2 = d2 / jnp.linalg.norm(d2, axis=1, keepdims=True)
            return (o, d2), hit.t[0]
        (_, d), ts = jax.lax.scan(body, (o, d), None, length=STEPS)
        return ts.sum() + d.sum()

    for tag, oo, dd in (("incoherent", o, d), ("coherent", oc, dc)):
        float(chain(oo, dd))
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(oo, dd))
            best = min(best, time.perf_counter() - t0)
        per = best / STEPS
        print(f"forest closest {tag:10s}: {per*1e3:8.1f} ms/stage "
              f"({N_BENCH/per/1e6:6.2f} MRays/s)")


if __name__ == "__main__":
    main()
