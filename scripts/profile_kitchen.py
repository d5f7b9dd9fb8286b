"""Kitchen-frame per-stage profile (VERDICT r4 weak 2 / next 2): both
integrators tie at 0.137 Msamples/s on the config-3 interior, so the
bottleneck is shared. This attributes the lockstep frame cost by stub
ablation (profile_segment_r5 pattern) on the ACTUAL protocol shape:
kitchen_proxy, 1024² strided 64k-pixel tile, 8 bounces, area light,
fused 2-spp early-exit programs.

Variants: full; closest-traversal stubbed; closest+shadow stubbed;
shading ctx (textures) stubbed; NEE off; and a real bounce-count sweep
(2/4/8) to expose the path-length scaling.

Run: JAX_COMPILATION_CACHE_DIR=data/xla_cache python scripts/profile_kitchen.py
Trace-check: PROBE_TRACE_ONLY=1 on CPU first.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fluctus_tpu.core.types import Hit, RenderConfig
from fluctus_tpu.integrators import common, lockstep
from fluctus_tpu.ops import bsdf as bsdf_mod
from fluctus_tpu.render import driver

N = 1 << 16
SPP = 2
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def stub_trace(scene, params, cfg, orig, dir):
    b = orig.shape[0]
    t = jnp.ones((b,), jnp.float32)
    return Hit(t=t, prim=jnp.zeros((b,), jnp.int32),
               p=orig + t[:, None] * dir,
               n=jnp.broadcast_to(jnp.array([0., 1., 0.]), (b, 3)),
               uv=jnp.zeros((b, 2), jnp.float32),
               mat_id=jnp.zeros((b,), jnp.int32),
               area_light=jnp.zeros((b,), bool))


def stub_shadow(scene, params, cfg, o, d, l, check_area_quad=True):
    return jnp.zeros(o.shape[:1], bool)


def stub_ctx(scene, hit, dir):
    b = dir.shape[0]
    return bsdf_mod.ShadingCtx(
        n=jnp.broadcast_to(jnp.array([0., 1., 0.]), (b, 3)),
        backface=jnp.zeros((b,), bool),
        kd=jnp.full((b, 3), 0.6, jnp.float32),
        ks=jnp.zeros((b, 3), jnp.float32),
        ns=jnp.full((b,), 100.0, jnp.float32),
        ni=jnp.full((b,), 1.5, jnp.float32),
        bsdf_id=jnp.zeros((b,), jnp.int32))


def main():
    probe = bool(os.environ.get("PROBE_TRACE_ONLY"))
    cfg0 = RenderConfig(width=1024, height=1024, max_bounces=8,
                        use_env_map=False, use_area_light=True,
                        tile_size=N)
    sess = driver.create_session(
        f"{REPO}/assets/kitchen_proxy.obj", cfg=cfg0, use_sbvh=True,
        cache_dir="data/hierarchies", state_dir="data/states",
        auto_frame=False)

    real = {"trace": common.trace_scene, "shadow": common._shadow_blocked,
            "ctx": common.make_shading_ctx,
            "sample": bsdf_mod.bsdf_sample, "eval": bsdf_mod.bsdf_eval,
            "pdf": bsdf_mod.bsdf_pdf}

    def stub_bsdf_sample(ctx, wi, u1, u2, u_lobe, types_mask=0):
        return bsdf_mod.BsdfSample(
            wo=ctx.n, f=jnp.full_like(ctx.kd, 0.3),
            pdf=jnp.full(ctx.ns.shape, 0.5, jnp.float32))

    def stub_bsdf_eval(ctx, wi, wo, types_mask=0):
        return jnp.full_like(ctx.kd, 0.2)

    def stub_bsdf_pdf(ctx, wi, wo, types_mask=0):
        return jnp.full(ctx.ns.shape, 0.5, jnp.float32)

    def apply(stubs):
        common.trace_scene = stub_trace if "trace" in stubs \
            else real["trace"]
        common._shadow_blocked = stub_shadow if "shadow" in stubs \
            else real["shadow"]
        common.make_shading_ctx = stub_ctx if "ctx" in stubs \
            else real["ctx"]
        bsdf_mod.bsdf_sample = stub_bsdf_sample if "bsdf" in stubs \
            else real["sample"]
        bsdf_mod.bsdf_eval = stub_bsdf_eval if "bsdfe" in stubs \
            else real["eval"]
        bsdf_mod.bsdf_pdf = stub_bsdf_pdf if "bsdfe" in stubs \
            else real["pdf"]

    from fluctus_tpu.core.types import BXDF_DIFFUSE
    variants = [
        ("full mb=8", (), {}),
        ("- closest trav", ("trace",), {}),
        ("- closest - shadow", ("trace", "shadow"), {}),
        ("- ctx/textures", ("ctx",), {}),
        ("no NEE (real trav)", (), dict(sample_expl=False)),
        ("full mb=4", (), dict(max_bounces=4)),
        ("full mb=2", (), dict(max_bounces=2)),
        # bsdf-math isolation (r5: traversal/ctx stubs were all FLAT —
        # ~60 ms/bounce of arithmetic remains; the 7-type compute-all
        # dispatch is the suspect)
        ("diffuse-only mask", (), dict(bsdf_types_mask=BXDF_DIFFUSE)),
        ("- bsdf sample", ("bsdf",), {}),
        ("- bsdf - nee evals", ("bsdf", "bsdfe"), {}),
    ]

    pix = (jnp.arange(N, dtype=jnp.uint32)
           * jnp.uint32(1024 * 1024 // N))

    results = {}
    for tag, stubs, over in variants:
        cfg = sess.cfg.replace(**over)
        apply(stubs)

        # a FRESH jit closure per variant: _clear_cache() on the shared
        # module-level jit does NOT invalidate its trace cache on this
        # jax version — every stub variant silently reused the unstubbed
        # trace (caught r5: all stub rows read identical to full)
        @jax.jit
        def fresh(scene, params, px, s0, cfg=cfg):
            def body(acc, k):
                return acc + lockstep.sample_radiance(
                    scene, params, cfg, px, s0 + k, early_exit=True), None
            acc, _ = jax.lax.scan(
                body, jnp.zeros((px.shape[0], 3), jnp.float32),
                jnp.arange(SPP, dtype=jnp.uint32))
            return acc

        def run(s0, fresh=fresh):
            return fresh(sess.scene, sess.params, pix, s0)

        if probe:
            print(tag,
                  jax.eval_shape(run, jnp.uint32(0)).shape, flush=True)
            continue
        np.asarray(run(jnp.uint32(0)))  # compile+warm
        best = 1e9
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(run(jnp.uint32(2 + i)))
            best = min(best, time.perf_counter() - t0)
        per_sample = best / SPP
        results[tag] = per_sample
        msps = N / per_sample / 1e6
        print(f"{tag:24s} {per_sample*1e3:8.2f} ms/sample-tile "
              f"({msps:5.3f} Msamples/s equiv)", flush=True)

    apply(())
    if results:
        full = results.get("full mb=8")
        print("\n--- attribution (deltas vs full mb=8)")
        for tag in results:
            if tag != "full mb=8" and full:
                print(f"{tag:24s} saves {(full-results[tag])*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
