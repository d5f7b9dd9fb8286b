"""Decompose the work-queue forest traversal cost on real hardware.

bench_forest after the component-major _chunk_slabs fix still reads
0.46 MRays/s incoherent (r3 BASELINE) — same as before the fix. This
probe times each piece of one _run_workqueue round separately (its own
small jit, cheap compiles) and walks the round loop on the host to count
rounds + live rays, so the 142 ms/stage gets attributed.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fluctus_tpu.ops import traverse_forest as tf

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from bench_forest import build_scene  # noqa: E402

N = 1 << 16


def timed(f, *a, n=5):
    jax.block_until_ready(f(*a))
    best = 1e30
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    blk = int(os.environ.get("WQ_BLK", tf.WQ_BLK))
    host = build_scene()
    host.build_bvh(cache_dir="data/hierarchies", use_sbvh=True)
    scene = host.to_device()
    ft = scene.ftables
    c = ft.boxes.shape[0]
    print(f"chunks {c}; nodes {ft.nodes.shape} leaves {ft.leaves.shape}; "
          f"blk {blk}")

    key = jax.random.PRNGKey(0)
    o = jax.random.uniform(key, (N, 3)) * 13.0
    d = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    orig_t, dir_t, t_row, bb = tf._prep(o, d, np.float32(1e30), blk)
    ot = orig_t.T
    dt_ = dir_t.T
    inv = tf._safe_inv(dt_)
    t0v = t_row[0]
    cap = bb + c * blk
    nb = cap // blk
    print(f"bb {bb} cap {cap} grid rows {nb}")

    # --- piece 1: _next_chunk
    nc_j = jax.jit(lambda bt, ce, cc: tf._next_chunk(
        ft.boxes, ot, dt_, inv, bt, ce, cc))
    cur_e0 = jnp.full((bb,), -1.0, jnp.float32)
    cur_c0 = jnp.full((bb,), -1, jnp.int32)
    t_nc = timed(nc_j, t0v, cur_e0, cur_c0)
    print(f"_next_chunk:            {t_nc*1e3:7.2f} ms")

    # --- piece 2: the schedule block (sorts + searchsorted + gathers)
    def sched(nc, bt, bp, bu, bv):
        live = nc >= 0
        keyv = jnp.where(live, nc, c)
        order = jnp.argsort(keyv)
        rank = jnp.argsort(order)
        ch_sorted = keyv[order]
        starts = jnp.searchsorted(ch_sorted, jnp.arange(c + 1),
                                  side="left").astype(jnp.int32)
        count = starts[1:] - starts[:-1]
        pc = -(-count // blk) * blk
        ps = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(pc)])
        bpos = jnp.arange(nb, dtype=jnp.int32) * blk
        cb = jnp.clip(jnp.searchsorted(ps, bpos, side="right")
                      .astype(jnp.int32) - 1, 0, c - 1)
        s_idx = jnp.arange(cap, dtype=jnp.int32)
        c_slot = jnp.repeat(cb, blk)
        j = s_idx - ps[c_slot]
        dead = (j < 0) | (j >= count[c_slot])
        ray = jnp.where(dead, 0,
                        order[jnp.clip(starts[c_slot] + j, 0, bb - 1)])
        it = jnp.where(dead, 0.0, bt[ray])[None, :]
        ip = jnp.where(dead, 0, bp[ray])[None, :]
        return (cb[:, None], ray, it, ip, bu[ray][None, :], bv[ray][None, :],
                ot[ray].T, dt_[ray].T, rank, starts, ps)

    sched_j = jax.jit(sched)
    ne0, nc0 = nc_j(t0v, cur_e0, cur_c0)
    bp0 = jnp.full((bb,), -1, jnp.int32)
    z = jnp.zeros((bb,), jnp.float32)
    t_sc = timed(sched_j, nc0, t0v, bp0, z, z)
    print(f"schedule (sorts+gather):{t_sc*1e3:7.2f} ms")

    # --- piece 3: the kernel launch at round-1 occupancy
    sel, ray, it, ip, iu, iv, oT, dT, rank, starts, ps = \
        jax.block_until_ready(sched_j(nc0, t0v, bp0, z, z))
    sel_ent = jnp.zeros((nb, 1), jnp.int32)
    lau = lambda: tf._launch(sel, sel_ent, ft.nodes, ft.leaves, oT, dT,
                             it, ip, iu, iv, leaf_width=int(ft.leaf_width),
                             lvl=int(ft.lvl), any_hit=False, blk=blk)
    t_la = timed(lau)
    print(f"kernel launch round 1:  {t_la*1e3:7.2f} ms "
          f"({nb} blocks, {int(jnp.sum(it[0] > 0.0))} live slots)")

    # --- round walk: live counts + per-round wall time (host-stepped)
    merge_j = jax.jit(lambda ot_, op_, ou_, ov_, nc_, rank_, starts_, ps_,
                      bt, bp, bu, bv: _merge(ot_, op_, ou_, ov_, nc_, rank_,
                                             starts_, ps_, bt, bp, bu, bv))

    def _merge(ot_, op_, ou_, ov_, nc_, rank_, starts_, ps_, bt, bp, bu, bv):
        live = nc_ >= 0
        nc_cl = jnp.clip(nc_, 0, c - 1)
        slot_r = jnp.clip(ps_[nc_cl] + (rank_ - starts_[nc_cl]), 0, cap - 1)
        return (jnp.where(live, ot_[0, slot_r], bt),
                jnp.where(live, op_[0, slot_r], bp),
                jnp.where(live, ou_[0, slot_r], bu),
                jnp.where(live, ov_[0, slot_r], bv))

    bt, bp, bu, bv = t0v, bp0, z, z
    cur_e, cur_c, ne, nc = cur_e0, cur_c0, ne0, nc0
    rounds = 0
    t_total = time.perf_counter()
    while bool(jnp.any(nc >= 0)):
        r0 = time.perf_counter()
        sel, ray, it, ip, iu, iv, oT, dT, rank, starts, ps = \
            sched_j(nc, bt, bp, bu, bv)
        ot_, op_, ou_, ov_ = tf._launch(
            sel, sel_ent, ft.nodes, ft.leaves, oT, dT, it, ip, iu, iv,
            leaf_width=int(ft.leaf_width), lvl=int(ft.lvl),
            any_hit=False, blk=blk)
        bt, bp, bu, bv = merge_j(ot_, op_, ou_, ov_, nc, rank, starts, ps,
                                 bt, bp, bu, bv)
        cur_e = jnp.where(nc >= 0, ne, cur_e)
        cur_c = jnp.where(nc >= 0, nc, cur_c)
        ne, nc = nc_j(bt, cur_e, cur_c)
        jax.block_until_ready(nc)
        live = int(jnp.sum(nc >= 0))
        rounds += 1
        print(f"  round {rounds:2d}: {1e3*(time.perf_counter()-r0):7.2f} ms "
              f"-> live next {live}")
    print(f"rounds {rounds}, host-stepped total "
          f"{1e3*(time.perf_counter()-t_total):7.1f} ms "
          f"(hits {int(jnp.sum(bp >= 0))}/{bb})")


if __name__ == "__main__":
    main()
