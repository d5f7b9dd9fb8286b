"""North-star forward+backward rate (BASELINE.json): MRays/s/chip
fwd+bwd at 4 bounces, grads on kd + env_image, teapot 512² strided rays.

Timing fetches a scalar per call (relay acks are async)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fluctus_tpu.core.types import RenderConfig
from fluctus_tpu.parallel.mesh import loss_fn
from fluctus_tpu.render import driver

N_RAYS = 1 << 16


def timed(f, n=3):
    float(f())
    best = 1e30
    for _ in range(n):
        t0 = time.perf_counter()
        float(f())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="full-frame ray list (512^2 = 262144 rays): "
                         "fixed per-segment costs amortize over 4x lanes")
    ap.add_argument("--pools", default=None,
                    help="comma list of pool log2s (default 13,14,15; "
                         "full: 15,16)")
    ap.add_argument("--spp", type=int, default=1,
                    help="samples per listed pixel in ONE loss batch "
                         "(sample-major tiling) — multi-spp optimizer "
                         "steps amortize the fixed per-segment pallas "
                         "floor and the drain tail")
    args = ap.parse_args()
    cfg = RenderConfig(width=512, height=512, max_bounces=4,
                       use_area_light=False)
    sess = driver.create_session(
        "/root/reference/assets/teapot.ply",
        env_map="/root/reference/assets/env_maps/night.hdr",
        cfg=cfg, use_sbvh=True, cache_dir="data/hierarchies")
    scene, params = sess.scene, sess.params
    cfg = sess.cfg

    n_pix = cfg.width * cfg.height
    n_base = n_pix if args.full else N_RAYS
    base_idx = (jnp.arange(n_base, dtype=jnp.uint32)
                * (n_pix // n_base))
    n_rays = n_base * args.spp
    pixel_idx = jnp.tile(base_idx, args.spp)
    sample_idx = (jnp.uint32(0) if args.spp == 1 else
                  jnp.repeat(jnp.arange(args.spp, dtype=jnp.uint32),
                             n_base))
    target = jnp.zeros((n_rays, 3), jnp.float32)
    diff = {"kd": scene.materials.kd, "env_image": scene.envmap.image}

    f_fwd = jax.jit(lambda d: loss_fn(d, scene, params, cfg, pixel_idx,
                                      sample_idx, target))
    def both(d):
        # fold the grads into the fetched scalar so XLA cannot DCE the
        # backward pass (returning only the loss made bwd measure as free)
        loss, g = jax.value_and_grad(loss_fn)(
            d, scene, params, cfg, pixel_idx, sample_idx, target)
        return loss + sum(jnp.sum(v) * 1e-30 for v in g.values())

    f_both = jax.jit(both)

    t_f = timed(lambda: f_fwd(diff))
    t_fb = timed(lambda: f_both(diff))

    rays = n_rays * (2 * (cfg.max_bounces + 1) + 1)  # ext+shadow+primary
    print(f"lockstep forward:      {t_f*1e3:7.1f} ms "
          f"({rays/t_f/1e6:6.2f} MRays/s analytic)")
    print(f"lockstep fwd+bwd:      {t_fb*1e3:7.1f} ms "
          f"({rays/t_fb/1e6:6.2f} MRays/s counting fwd rays; "
          f"bwd/fwd {(t_fb-t_f)/t_f:.2f}x)")

    # --- streaming grad path (wavefront.stream_loss): pooled immediate
    # respawn, per-row loss folding — same estimator, ~E[len]/(mb+1) work
    from fluctus_tpu.integrators import wavefront
    from fluctus_tpu.parallel.mesh import loss_fn_stream
    pools = (tuple(int(x) for x in args.pools.split(","))
             if args.pools else ((15, 16) if args.full else (13, 14, 15)))

    # plan all (pool, mode) combos first (the drain length gates the loss
    # program shapes), then AOT-compile every loss program CONCURRENTLY
    # (r3 verify-skill pattern: ~5 min serial compile each through the
    # relay, ~1 batch wall when threaded).
    import concurrent.futures as cf
    combos = [(p, d) for p in pools for d in (False, True)]
    plans = {}
    for pool_log2, deferred in combos:
        pool = 1 << pool_log2
        k, drained = wavefront.plan_stream_segments(
            scene, params, cfg, pixel_idx, sample_idx, pool,
            deferred=deferred)
        # exact drain count + 1 spare: the earlier round-to-4 padding cost
        # the deferred mode its own fusion win (16 vs 13 segments at
        # p2^13, BASELINE r3g / r4 fix)
        n_seg = int(k) + 1
        assert int(drained) == n_rays, (int(drained), n_rays)
        plans[(pool_log2, deferred)] = n_seg

    def make_fns(pool_log2, deferred):
        pool = 1 << pool_log2
        n_seg = plans[(pool_log2, deferred)]

        def s_fwd(d):
            loss, n_done = loss_fn_stream(d, scene, params, cfg, pixel_idx,
                                          sample_idx, target, pool,
                                          n_seg, deferred=deferred)
            return loss

        def s_both(d):
            (loss, _), g = jax.value_and_grad(
                loss_fn_stream, has_aux=True)(
                d, scene, params, cfg, pixel_idx, sample_idx, target,
                pool, n_seg, deferred=deferred)
            return loss + sum(jnp.sum(v) * 1e-30 for v in g.values())
        return jax.jit(s_fwd), jax.jit(s_both)

    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(2 * len(combos)) as ex:
        comp = {}
        for key in combos:
            sf, sb = make_fns(*key)
            comp[key] = (ex.submit(lambda f=sf: f.lower(diff).compile()),
                         ex.submit(lambda f=sb: f.lower(diff).compile()))
        comp = {k: (a.result(), b.result()) for k, (a, b) in comp.items()}
    print(f"compiled {2*len(combos)} stream programs in "
          f"{time.perf_counter()-t0:.0f} s", flush=True)

    for (pool_log2, deferred), (sf, sb) in comp.items():
        n_seg = plans[(pool_log2, deferred)]
        tag = "DEFER" if deferred else "immed"
        t_sf = timed(lambda: sf(diff))
        t_sb = timed(lambda: sb(diff))
        print(f"stream {tag} fwd  p2^{pool_log2}: {t_sf*1e3:7.1f} ms "
              f"({rays/t_sf/1e6:6.2f} MRays/s analytic; {n_seg} segs)")
        print(f"stream {tag} f+b  p2^{pool_log2}: {t_sb*1e3:7.1f} ms "
              f"({rays/t_sb/1e6:6.2f} MRays/s counting fwd rays; "
              f"bwd/fwd {(t_sb-t_sf)/t_sf:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
