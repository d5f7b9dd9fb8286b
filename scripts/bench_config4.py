"""BASELINE config 4 end-to-end on real hardware: a multi-million-triangle
scene through the full pipeline — C++ SBVH build, device upload + forest
table encode, a 1024² reference-protocol render with CSV, and one
forward+backward step. Records the numbers the r2 verdict found missing.

Usage: python scripts/bench_config4.py [--grid 17] [--subdiv 3]
       (17³ spheres × 1280 tris = 6.3M tris; --grid 20 → 10.2M)
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from fluctus_tpu.core.types import RenderConfig
from fluctus_tpu.render import driver
from fluctus_tpu.render.benchmark import run_benchmark_stream
from fluctus_tpu.scene.scene import HostScene, default_material
from fluctus_tpu.scene.textures import TexturePool

from make_test_scenes import icosphere


def build_scene(grid: int, subdiv: int) -> HostScene:
    v, f = icosphere(subdiv=subdiv, radius=0.35, center=(0.0, 0.0, 0.0))
    base = v[f].astype(np.float32)                     # (F, 3, 3)
    offs = np.stack(np.meshgrid(*([np.arange(grid)] * 3),
                                indexing="ij"), axis=-1).reshape(-1, 3)
    t = (base[None] + offs[:, None, None, :]).reshape(-1, 3, 3)
    t = t.astype(np.float32)
    print(f"scene: {len(t)} tris ({grid}^3 spheres x {len(base)})")
    v0, v1, v2 = t[:, 0], t[:, 1], t[:, 2]
    n = np.cross(v1 - v0, v2 - v0)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)
    z2 = np.zeros((len(t), 2), np.float32)
    return HostScene(v0=v0, v1=v1, v2=v2, n0=n, n1=n, n2=n,
                     uv0=z2, uv1=z2, uv2=z2,
                     mat_id=np.zeros(len(t), np.int32),
                     materials=[default_material()],
                     textures=TexturePool(), name=f"grid{grid}s{subdiv}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=17)
    ap.add_argument("--subdiv", type=int, default=3)
    ap.add_argument("--duration", type=float, default=12.0)
    ap.add_argument("--skip-grad", action="store_true")
    args = ap.parse_args()

    host = build_scene(args.grid, args.subdiv)
    from fluctus_tpu.scene.scene import fast_big_eligible
    if fast_big_eligible(host):
        print("fast big-scene path: no hierarchy build (brute forest)")
    else:
        t0 = time.perf_counter()
        host.build_bvh(cache_dir=None, use_sbvh=True)  # C++ builder, no cache
        t_build = time.perf_counter() - t0
        st = host.bvh.stats or {}
        print(f"SBVH build (C++): {t_build:.1f} s; "
              f"nodes {host.bvh.n_nodes}, refs {len(host.bvh.prim_idx)}, "
              f"dup {st.get('duplication_pct', float('nan')):.1f}%")

    t0 = time.perf_counter()
    scene = host.to_device()
    jax.block_until_ready(scene.geom.v0)
    t_up = time.perf_counter() - t0
    if scene.bforest is not None:
        nch = scene.bforest.tris.shape[0]
        kind = "brute"
    elif scene.ftables is not None:
        nch = scene.ftables.nodes.shape[0]
        kind = "treelet"
    else:
        nch, kind = 0, "none"
    print(f"upload + forest tables: {t_up:.1f} s; {kind} chunks {nch}")

    # protocol render: 1024², env-free (synthetic scene), stream integrator
    cfg = RenderConfig(width=1024, height=1024, max_bounces=4,
                       use_env_map=False, use_area_light=False,
                       backend="mxu")
    sess = driver.RenderSession(host_scene=host, scene=scene,
                                params=driver.default_params(
                                    world_radius=host.world_radius()),
                                cfg=cfg)
    sess.params = driver.auto_frame_camera(sess.params, host)
    os.makedirs("out", exist_ok=True)
    res = run_benchmark_stream(sess, duration_s=args.duration,
                               scene_name=host.name,
                               csv_path=f"out/bench_config4_{host.name}.csv")
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in res.items()}))

    if not args.skip_grad:
        # one fwd+bwd step (stream grad path, kd gradient)
        from fluctus_tpu.integrators import wavefront
        from fluctus_tpu.parallel.mesh import loss_fn_stream
        n = 1 << 14
        n_pix = cfg.width * cfg.height
        pix = jnp.arange(n, dtype=jnp.uint32) * (n_pix // n)
        target = jnp.zeros((n, 3), jnp.float32)
        pool = 1 << 12
        k, drained = wavefront.plan_stream_segments(
            sess.scene, sess.params, cfg, pix, jnp.uint32(0), pool,
            deferred=True)
        n_seg = (int(k) + 4 + 3) // 4 * 4
        print(f"grad: {n} rays, pool {pool}, {int(k)} segments "
              f"(drained {int(drained)})")
        diff = {"kd": sess.scene.materials.kd}

        def both(d):
            (loss, n_done), g = jax.value_and_grad(
                loss_fn_stream, has_aux=True)(
                d, sess.scene, sess.params, cfg, pix, jnp.uint32(0),
                target, pool, n_seg, deferred=True)
            return loss + sum(jnp.sum(v) * 1e-30 for v in g.values()), n_done

        l, nd = both(diff)
        print(f"fwd+bwd warm: loss {float(l):.5f}, drained {int(nd)}/{n}")
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            l, nd = both(diff)
            float(l)
            best = min(best, time.perf_counter() - t0)
        rays = n * (2 * (cfg.max_bounces + 1) + 1)
        print(f"fwd+bwd: {best*1e3:.1f} ms "
              f"({rays/best/1e6:.2f} MRays/s analytic fwd rays)")


if __name__ == "__main__":
    main()
