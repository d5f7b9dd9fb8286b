"""Microbenchmark: XLA gather cost on TPU at wavefront lane counts.

Times a fused scan of dependent gathers (each iteration's indices depend
on the previous result, so XLA cannot batch or hoist them)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

STEPS = 64


def timed(fn, *args):
    jax.block_until_ready(fn(*args))
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = 1 << 15
    for tbl_n, width in ((1 << 17, 1), (1 << 17, 4), (256 * 512, 3),
                         (1 << 10, 1), (1 << 20, 1)):
        tbl = jax.random.uniform(jax.random.PRNGKey(0), (tbl_n, width))
        if width == 1:
            tbl = tbl[:, 0]
        idx = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, tbl_n)

        @jax.jit
        def f(tbl, idx):
            def body(i, _):
                v = tbl[i] if tbl.ndim == 1 else tbl[i, 0]
                i2 = (i + v.astype(jnp.int32) + 1) % tbl_n
                return i2, jnp.sum(jnp.asarray(tbl[i2], jnp.float32))
            _, s = jax.lax.scan(body, idx, None, length=STEPS)
            return s.sum()

        dt = timed(f, tbl, idx) / STEPS
        print(f"gather ({n} lanes) from ({tbl_n:8d},{width}): "
              f"{dt*1e6:8.1f} us/gather  "
              f"({n/dt/1e6:7.1f} M elems-rows/s)")

    # transcendentals for scale
    x = jax.random.uniform(jax.random.PRNGKey(2), (n,))

    @jax.jit
    def g(x):
        def body(c, _):
            c = jnp.arctan2(c, 1.0 - c) * 0.5 + 0.25
            return c, None
        c, _ = jax.lax.scan(body, x, None, length=STEPS)
        return c.sum()

    dt = timed(g, x) / STEPS
    print(f"arctan2 ({n} lanes):                    {dt*1e6:8.1f} us/op")


if __name__ == "__main__":
    main()
