"""Deferred-stream segment decomposition (VERDICT r4 item 3 / r5 #1):
component-level cost of ONE compiled production segment (teapot 512²,
pool 2^15, deferred-shadow form) via stub ablations — each variant
recompiles the 16-segment scan with one more component replaced by a
constant-shape stub, so the deltas attribute the per-segment wall time.

Run on real TPU: JAX_COMPILATION_CACHE_DIR=data/xla_cache \
    python scripts/profile_segment_r5.py
Trace-check first: PROBE_TRACE_ONLY=1 on CPU.
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
from fluctus_tpu.ops import bsdf as bsdf_mod
from fluctus_tpu.ops import envmap as env_ops
from fluctus_tpu.render import driver

POOL = 1 << 15
NSEG = 16


def stub_trace_with_shadow(scene, params, c, orig, dir, sh_o, sh_d, sh_l,
                           **kw):
    b = orig.shape[0]
    t = jnp.ones((b,), jnp.float32)
    hit = Hit(t=t, prim=jnp.zeros((b,), jnp.int32),
              p=orig + t[:, None] * dir,
              n=jnp.broadcast_to(jnp.array([0., 0., 1.]), (b, 3)),
              uv=jnp.zeros((b, 2), jnp.float32),
              mat_id=jnp.zeros((b,), jnp.int32),
              area_light=jnp.zeros((b,), bool))
    return hit, jnp.zeros((b,), bool)


def stub_trace(scene, params, c, orig, dir):
    return stub_trace_with_shadow(scene, params, c, orig, dir,
                                  None, None, None)[0]


def stub_shadow(scene, params, c, o, d, l, **kw):
    return jnp.zeros(o.shape[:1], bool)


def stub_ctx(scene, hit, dir):
    b = dir.shape[0]
    return bsdf_mod.ShadingCtx(
        n=jnp.broadcast_to(jnp.array([0., 0., 1.]), (b, 3)),
        backface=jnp.zeros((b,), bool),
        kd=jnp.full((b, 3), 0.6, jnp.float32),
        ks=jnp.zeros((b, 3), jnp.float32),
        ns=jnp.full((b,), 100.0, jnp.float32),
        ni=jnp.full((b,), 1.5, jnp.float32),
        bsdf_id=jnp.zeros((b,), jnp.int32))


def stub_env_eval(env, dir):
    return jnp.full(dir.shape[:1] + (3,), 0.4, jnp.float32)


def stub_env_sample(env, u):
    b = u.shape[0]
    L = jnp.broadcast_to(jnp.array([0., 0., 1.]), (b, 3))
    return L, jnp.full((b,), 0.25, jnp.float32), \
        jnp.full((b, 3), 0.4, jnp.float32)


def stub_raygen(params, cfg, pixel_idx, spawn_id):
    b = pixel_idx.shape[0]
    o = jnp.broadcast_to(jnp.array([0., 1.5, 4.0]), (b, 3))
    d = jnp.broadcast_to(jnp.array([0., 0., -1.0]), (b, 3))
    return o, d


def main():
    cfg0 = RenderConfig(width=512, height=512, max_bounces=4,
                        use_area_light=False, tile_size=1 << 16)
    sess = driver.create_session(
        "/root/reference/assets/teapot.ply",
        env_map="/root/reference/assets/env_maps/night.hdr",
        cfg=cfg0, use_sbvh=True, cache_dir="data/hierarchies")

    real = {
        "trace": common.trace_scene_with_shadow,
        "trace1": common.trace_scene,
        "shadow": common._shadow_blocked,
        "ctx": common.make_shading_ctx,
        "env_eval": env_ops.eval_dir,
        "env_sample": env_ops.sample_alias_radiance,
        "raygen": wavefront._raygen,
    }

    def apply(stubs):
        common.trace_scene_with_shadow = \
            stub_trace_with_shadow if "trace" in stubs else real["trace"]
        common.trace_scene = stub_trace if "trace" in stubs \
            else real["trace1"]
        common._shadow_blocked = stub_shadow if "trace" in stubs \
            else real["shadow"]
        common.make_shading_ctx = stub_ctx if "ctx" in stubs \
            else real["ctx"]
        env_ops.eval_dir = stub_env_eval if "env" in stubs \
            else real["env_eval"]
        env_ops.sample_alias_radiance = stub_env_sample if "env" in stubs \
            else real["env_sample"]
        wavefront._raygen = stub_raygen if "raygen" in stubs \
            else real["raygen"]

    variants = [
        ("full (real)", ()),
        ("- traversal", ("trace",)),
        ("- traversal - ctx/tex", ("trace", "ctx")),
        ("- traversal - ctx - env", ("trace", "ctx", "env")),
        ("- trav - ctx - env - raygen", ("trace", "ctx", "env", "raygen")),
        ("real, no NEE", (), dict(sample_expl=False)),
        ("- traversal, no NEE", ("trace",), dict(sample_expl=False)),
    ]

    results = {}
    for entry in variants:
        tag, stubs = entry[0], entry[1]
        over = entry[2] if len(entry) > 2 else {}
        cfg = sess.cfg.replace(pool_size=POOL, **over)
        apply(stubs)

        state, counters = wavefront.init_stream_state(sess.params, cfg,
                                                      POOL)
        pend = wavefront._pend_init(POOL)
        fin_pix = jnp.full((POOL,), -1, jnp.int32)
        fin_ei = jnp.zeros((POOL, 3), jnp.float32)

        # fresh jit per variant: _clear_cache() on the shared module jit
        # does NOT invalidate its trace cache on this jax version — stub
        # variants would silently reuse the unstubbed trace (r5 finding).
        # spp=64 keeps the spawn target far away so the pool stays LIVE
        # through warm + timed launches (a drained pool's segments skip
        # all work and read ~1 ms).
        @jax.jit
        def fresh(scene, params, st, ct, pd, fp, fe, cfg=cfg):
            def body(carry, _):
                st, ct, pd, fp, fe, rows = wavefront._stream_segment_d(
                    scene, params, cfg, carry[0], carry[1], 64,
                    carry[2], carry[3], carry[4])
                return (st, ct, pd, fp, fe), rows
            carry, rows = jax.lax.scan(
                body, (st, ct, pd, fp, fe), None, length=NSEG)
            return carry + (rows,)

        def launch(s, fresh=fresh):
            return fresh(sess.scene, sess.params, *s)

        if os.environ.get("PROBE_TRACE_ONLY"):
            out = jax.eval_shape(fresh, sess.scene, sess.params, state,
                                 counters, pend, fin_pix, fin_ei)
            print(tag, "trace ok")
            continue

        s = (state, counters, pend, fin_pix, fin_ei)
        out = launch(s)
        s = out[:5]
        out = launch(s)
        s = out[:5]
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = launch(s)
            s = out[:5]
            float(jnp.sum(out[1]))       # fetch to close the round trip
            best = min(best, time.perf_counter() - t0)
        per_seg = best / NSEG
        results[tag] = per_seg
        print(f"{tag:32s} {per_seg*1e3:7.3f} ms/segment", flush=True)

    apply(())
    if results:
        full = results.get("full (real)")
        notr = results.get("- traversal")
        print("\n--- attribution (deltas)")
        if full and notr:
            print(f"traversal (fused call): {(full-notr)*1e3:.3f} ms")
        pairs = [("- traversal", "- traversal - ctx/tex", "ctx+textures"),
                 ("- traversal - ctx/tex", "- traversal - ctx - env",
                  "env eval+sample"),
                 ("- traversal - ctx - env",
                  "- trav - ctx - env - raygen", "raygen RNG+camera")]
        for a, b, name in pairs:
            if a in results and b in results:
                print(f"{name}: {(results[a]-results[b])*1e3:.3f} ms")
        if "- trav - ctx - env - raygen" in results:
            print(f"residual (state/bsdf/respawn/scan): "
                  f"{results['- trav - ctx - env - raygen']*1e3:.3f} ms")


if __name__ == "__main__":
    main()
