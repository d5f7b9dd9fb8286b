"""True per-stage cost of the MXU stack-traversal kernel: chained
traversals inside one fused program, tables passed as arguments."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fluctus_tpu.core.types import RenderConfig
from fluctus_tpu.integrators import wavefront
from fluctus_tpu.ops import traverse_mxu
from fluctus_tpu.render import driver

STEPS = 16


def timed(fn, *args):
    float(fn(*args))  # compile + force value fetch (relay acks are async)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cfg0 = RenderConfig(width=512, height=512, max_bounces=4,
                        use_area_light=False)
    sess = driver.create_session(
        "/root/reference/assets/teapot.ply",
        env_map="/root/reference/assets/env_maps/night.hdr",
        cfg=cfg0, use_sbvh=True, cache_dir="data/hierarchies")
    wb = sess.scene.wbvh
    nodes_t, leaves_t = jax.block_until_ready(traverse_mxu.mxu_tables(wb))
    root = int(wb.root_ref)
    lw = int(wb.leaf_width)
    lvl = int(wb.depth) + 1

    lo = jnp.min(sess.scene.geom.v0, axis=0)
    hi = jnp.max(sess.scene.geom.v0, axis=0)
    center = (lo + hi) / 2

    for n in (1 << 17,):
        # incoherent: random origins in the bbox, random dirs
        o = center + (jax.random.uniform(jax.random.PRNGKey(0), (n, 3))
                      - 0.5) * (hi - lo) * 1.2
        d = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

        # coherent: camera rays
        pix = jnp.arange(n, dtype=jnp.uint32) % (cfg0.width * cfg0.height)
        oc, dc = wavefront._raygen(sess.params, sess.cfg, pix,
                                   jnp.zeros((n,), jnp.uint32))

        import functools
        @functools.partial(jax.jit, static_argnames=("blk",))
        def chain(o, d, nodes_t, leaves_t, blk=128):
            def body(carry, _):
                o, d = carry
                ot, dt, tr, _ = traverse_mxu._prep(o, d, 3e37, blk)
                t, prim, u, v = traverse_mxu._launch(
                    ot, dt, tr, nodes_t, leaves_t, root, lw, lvl, False, blk)
                # dependent perturbation so chains can't be batched
                d2 = d.at[:, 0].add(jnp.where(t[0, :o.shape[0]] < 1e30,
                                              1e-6, -1e-6))
                d2 = d2 / jnp.linalg.norm(d2, axis=1, keepdims=True)
                return (o, d2), t[0, 0]
            (o, d), ts = jax.lax.scan(body, (o, d), None, length=STEPS)
            return ts.sum() + d.sum()

        for blk in (128, 256, 512, 1024, 2048):
            for tag, oo, dd in (("incoherent", o, d), ("coherent", oc, dc)):
                dt = timed(lambda a, b, c, e: chain(a, b, c, e, blk),
                           oo, dd, nodes_t, leaves_t) / STEPS
                print(f"closest {tag:10s} blk={blk:5d}: {dt*1e3:7.2f} ms/stage "
                      f"({n/dt/1e6:6.1f} MRays/s)")
        # step statistics
        steps = traverse_mxu.traversal_steps(wb, o, d, 3e37)
        print(f"  incoherent block steps: mean {float(steps.mean()):.1f} "
              f"max {int(steps.max())}")
        stepsc = traverse_mxu.traversal_steps(wb, oc, dc, 3e37)
        print(f"  coherent   block steps: mean {float(stepsc.mean()):.1f} "
              f"max {int(stepsc.max())}")


if __name__ == "__main__":
    main()
