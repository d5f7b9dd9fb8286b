"""Config-4 traversal isolation: vlist vs rounds on the ACTUAL ray
population of the protocol frame (camera primaries of the 6.3M-tri grid
at 1024², and one diffuse bounce off the primary hits), sweeping chunk
size (the tile-pruned vlist kernel can afford bigger chunks) and V.

All forest tables flow as jit ARGUMENTS: at 6.3M tris the tables are
~400 MB, and jit-closure constants are shipped inside the remote-compile
request body, which rejects them with HTTP 413 (this bit; the 703k-tri
bench at 45 MB slid under the limit).

JAX_COMPILATION_CACHE_DIR=data/xla_cache python scripts/probe_c4_traversal.py
Trace-check: PROBE_TRACE_ONLY=1 on CPU (small grid).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fluctus_tpu.accel.forest import build_brute_forest
from fluctus_tpu.core.types import BruteForest, RenderConfig
from fluctus_tpu.ops import camera as cam_ops
from fluctus_tpu.ops import traverse_brute as tb
from fluctus_tpu.render import driver

from bench_config4 import build_scene

N = 1 << 14
REPS = 4


@functools.partial(jax.jit,
                   static_argnames=("kind", "v_per", "gr", "blk"))
def _probe(bf, o, d, s, kind: str, v_per: int, gr: int = 0,
           blk: int = 128):
    o = o + s * 1e-30
    if kind == "rounds":
        def one(s):
            r = tb.traverse_closest(bf.replace(tboxes=None), o + s * 1e-30,
                                    d, 3.4e38)
            return jnp.sum(r.t * (r.t < 1e30))
    else:
        def one(s):
            o8, d8, tv, b = tb._prep(o + s * 1e-30, d, 3.4e38, blk)
            bt, bp, bu, bv = tb._run_vlist(bf, o8, d8, tv, False, blk,
                                           v_per, tb._vlist_tile(bf),
                                           gr=gr)
            return jnp.sum(bt * (bt < 1e30))

    def body(c, _):
        return c + one(c) * 1e-30, None
    s, _ = jax.lax.scan(body, s, None, length=REPS)
    return s


@jax.jit
def _first_hits(bf, o, d):
    o8, d8, tv, b = tb._prep(o, d, 3.4e38, 128)
    bt, bp, _, _ = tb._run_vlist(bf, o8, d8, tv, False, 128, 8,
                                 tb._vlist_tile(bf))
    return bt[:o.shape[0]], bp[:o.shape[0]]


def main():
    probe = bool(os.environ.get("PROBE_TRACE_ONLY"))
    grid = 5 if probe else 17
    host = build_scene(grid, 3)
    params = driver.auto_frame_camera(
        driver.default_params(world_radius=host.world_radius()), host)

    # strided primaries across the full frame (the protocol's first
    # segment population after the stream's pixel striding)
    pix = (jnp.arange(N, dtype=jnp.uint32)
           * jnp.uint32(1024 * 1024 // N))
    half = jnp.full((N,), 0.5, jnp.float32)
    zero = jnp.zeros((N,), jnp.float32)
    o_p, d_p = cam_ops.generate_rays(params.camera, pix, 1024, 1024,
                                     half, half, zero, zero,
                                     params.world_radius)

    # (target_tris, builder tile): tile sets the tbox prune granularity;
    # gr then groups tiles back into wider Möller slices
    builds = ((512, 128),) if probe else ((32768, 128),)
    forests = {}
    for tt, btile in builds:
        hb = build_brute_forest(host.v0, host.v1, host.v2, target_tris=tt,
                                tile=btile)
        forests[(tt, btile)] = BruteForest(
            tris=jnp.asarray(hb.tris), boxes=jnp.asarray(hb.boxes),
            boxes_t=jnp.asarray(hb.boxes_t),
            tboxes=jnp.asarray(hb.tboxes), tile=hb.tile)
        print(f"TT={tt}/tile{btile}: C={hb.boxes.shape[0]} "
              f"tp={hb.tris.shape[2]}", flush=True)

    # bounce rays: diffuse-ish scatter off the primary hit points (use the
    # default-TT forest to find hits once, outside the timed region)
    bf0 = forests[builds[-1]]
    if probe:
        t = jnp.ones((N,), jnp.float32)   # no real execution in trace mode
    else:
        bt, bp = _first_hits(bf0, o_p, d_p)
        t = jnp.where(bp >= 0, bt, 1.0)
        print(f"primary hit rate: "
              f"{float(jnp.mean((bp >= 0).astype(jnp.float32))):.3f}",
              flush=True)
    p_hit = o_p + t[:, None] * d_p
    g = np.random.default_rng(5)
    d_b = jnp.asarray(g.normal(size=(N, 3)), jnp.float32)
    d_b = d_b / jnp.linalg.norm(d_b, axis=1, keepdims=True)
    o_b = p_hit - 1e-3 * d_p

    # realistic bounce population: only lanes with a REAL primary hit
    # spawn a bounce (the stream respawns dead lanes as new primaries —
    # it never traces the mid-air random rays the naive construction
    # makes for miss lanes). Hit lanes tile up to N; directions flip into
    # the back hemisphere of the incoming ray (diffuse-off-front-face).
    if probe:
        o_r, d_r = o_b, d_b
    else:
        hit_idx = np.nonzero(np.asarray(bp) >= 0)[0]
        rep_idx = jnp.asarray(np.resize(hit_idx, N), jnp.int32)
        o_r = o_b[rep_idx]
        d_r = d_b[rep_idx]
        flip = jnp.sum(d_r * d_p[rep_idx], axis=1, keepdims=True) > 0
        d_r = jnp.where(flip, -d_r, d_r)

    cases = []
    for kind_r, (o, d) in (("prim", (o_p, d_p)), ("bounce", (o_b, d_b)),
                           ("bounce_real", (o_r, d_r))):
        for (tt, btile), bf in forests.items():
            # (v_per, blk) at the g8 sweet spot: passes trade against
            # grid width; blk=256 halves grid steps AND visit count
            combos = (((8, 128, 1),) if probe else
                      ((8, 128, 8), (16, 128, 8), (32, 128, 8),
                       (8, 256, 8), (16, 256, 8)))
            for v_per, blk, gr in combos:
                cases.append((f"vlist/{kind_r}/V{v_per}/b{blk}/g{gr}",
                              bf, o, d, "vlist", v_per, gr, blk))

    if probe:
        for name, bf, o, d, kind, v, gr, blk in cases:
            print(name, jax.eval_shape(_probe, bf, o, d, jnp.float32(0),
                                       kind, v, gr, blk))
        return

    import concurrent.futures as cf
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(min(len(cases), 10)) as ex:
        compiled = list(zip(
            [c[0] for c in cases],
            ex.map(lambda c: _probe.lower(c[1], c[2], c[3], jnp.float32(0),
                                          kind=c[4], v_per=c[5],
                                          gr=c[6], blk=c[7]).compile(),
                   cases),
            cases))
    print(f"compiled {len(cases)} in {time.perf_counter() - t0:.1f}s",
          flush=True)

    for name, f, c in compiled:
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(c[1], c[2], c[3], jnp.float32(0)))
            best = min(best, time.perf_counter() - t0)
        per = best / REPS
        print(f"{name:28s} {per*1e3:8.2f} ms "
              f"{N/per/1e6:6.2f} MRays/s", flush=True)


if __name__ == "__main__":
    main()
