"""One-command scaling-efficiency protocol (VERDICT r4 item 6).

Runs parallel/distributed.py::scaling_benchmark over growing device
meshes for BOTH integrators and writes one JSON artifact. On this
container it exercises the virtual 8-device CPU mesh (the only scaling
artifact producible without multi-chip hardware); on a real multi-chip
slice the same command produces the hardware curve (BASELINE north
star: >=85% rays/s efficiency 1 -> N).

Usage:
  # virtual CPU mesh (8 devices)
  env PYTHONPATH= JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/run_scaling.py --out out/scaling_cpu_mesh.json
  # real hardware: plain `python scripts/run_scaling.py`
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="out/scaling_cpu_mesh.json")
    ap.add_argument("--size", type=int, default=128,
                    help="frame edge (pixels); CPU default small")
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--scene", default="/root/reference/assets/teapot.ply")
    ap.add_argument("--env-map",
                    default="/root/reference/assets/env_maps/night.hdr")
    args = ap.parse_args()

    import jax

    from fluctus_tpu.core.types import RenderConfig
    from fluctus_tpu.parallel.distributed import scaling_benchmark
    from fluctus_tpu.render import driver

    cfg = RenderConfig(width=args.size, height=args.size, max_bounces=4,
                       use_area_light=False,
                       backend="wide" if jax.default_backend() == "cpu"
                       else "mxu")
    sess = driver.create_session(args.scene, env_map=args.env_map, cfg=cfg,
                                 use_sbvh=True, cache_dir="data/hierarchies")

    out = {
        "platform": jax.default_backend(),
        "n_devices": len(jax.devices()),
        "frame": f"{args.size}x{args.size}x{args.spp}spp",
        "scene": args.scene,
    }
    if jax.default_backend() == "cpu":
        out["note"] = (
            "virtual CPU mesh: all shards share the same physical cores, "
            "so wall-time cannot drop with device count — the artifact "
            "validates the sharded layouts, collectives and shard balance "
            "only; rays/s efficiency is only meaningful on real multi-chip "
            "hardware (run this same command there)")
    for integ in ("lockstep", "stream"):
        rows = scaling_benchmark(sess.scene, sess.params, sess.cfg,
                                 spp=args.spp, integrator=integ)
        out[integ] = rows
        for r in rows:
            print(f"{integ:9s} {r['devices']}dev: {r['mrays_s']:8.2f} "
                  f"MRays/s eff={r['efficiency']:.2f} "
                  f"balance={r['shard_ray_balance']:.2f}", flush=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
