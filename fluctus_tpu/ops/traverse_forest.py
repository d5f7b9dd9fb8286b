"""Streamed treelet-forest traversal — beyond-VMEM scenes at full speed.

The r1 forest path launched one kernel per treelet over ALL rays: every ray
block paid >= 1 full-cost step in every chunk (0.15 MRays/s incoherent on
703k tris). This kernel restructures the schedule the TPU way:

  * All chunk tables live stacked in HBM ((C, 72, Tp) + (C, 30W, Lp) bf16,
    global triangle ids baked in) and are streamed chunk-by-chunk through
    VMEM by the Pallas grid pipeline — the BlockSpec index map reads a
    scalar-prefetched per-(ray block) chunk schedule, so the DMA engine
    double-buffers exactly the chunks each block actually visits.
  * XLA computes the schedule: per ray block, slab-test every chunk AABB,
    keep hit chunks sorted by entry distance (near-first => best-t prunes
    later chunks), and run the kernel over grid (n_blocks, K) visiting the
    K nearest chunks per block. Blocks whose rays span more than K chunks
    take further passes over the next K schedule columns inside a
    lax.while_loop (almost always 1 pass; correctness never depends on K).
  * Inside one grid step the per-lane near-first stack traversal of
    ops/traverse_mxu.py runs against the streamed chunk (root = node 0).
    Lanes whose best-t already beats the chunk entry skip it entirely
    (sp = 0); the running best (t, prim, u, v) lives in the output block,
    which Pallas keeps in VMEM across the K chunk visits of a block.

Reference analogue: src/bvh.cl:234-310 traverses one global-memory BVH per
thread; the TPU equivalent tiles the scene into VMEM-sized treelets and
schedules (ray block, treelet) visits so HBM traffic is sequential DMA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluctus_tpu.core.types import ForestTables, WideBVH
from fluctus_tpu.ops.traverse_mxu import (
    _IDX_MASK, _INVALID, _KEY_MASK, _LEAF_BIT, _prep, BIG, TAG_EMPTY,
    TAG_LEAF, TRI_EPS, Traversal, mxu_tables)

BLK = 1024        # rays per block (grid row)
K_CHUNKS = 8      # chunk visits per pass (schedule columns per grid row)
_INF = jnp.float32(jnp.inf)


# ---------------------------------------------------------------------------
# encoding: stack per-chunk MXU tables (host staging -> device bf16)

def encode_forest(host_forest) -> ForestTables:
    """Encode a HostForest (accel/forest.py) into device tables: vmapped
    bf16 MXU encoding over the chunk axis (same exact encodings as
    traverse_mxu.mxu_tables — conservative boxes, byte-chunked indices,
    3-way vertex splits)."""
    lw = int(host_forest.leaf_width)

    def enc(nodes, leaves):
        wb = WideBVH(nodes=nodes, leaves=leaves, root_ref=0, depth=1,
                     leaf_width=lw)
        return mxu_tables(wb)

    nodes_t, leaves_t = jax.jit(jax.vmap(enc))(
        jnp.asarray(host_forest.nodes), jnp.asarray(host_forest.leaves))
    return ForestTables(
        nodes=nodes_t, leaves=leaves_t,
        boxes=jnp.asarray(host_forest.boxes),
        lvl=int(host_forest.lvl), leaf_width=lw)


# ---------------------------------------------------------------------------
# schedule: per-(ray block) chunk entry distances, sorted near-first

def _safe_inv(d):
    return 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                           jnp.where(d < 0, -1e-20, 1e-20), d)


def _chunk_slabs(boxes, o, inv, tl, ct: int):
    """Component-major chunk slab tests, scanned over tiles of ct chunks.

    Returns (tmin (tiles, B, ct), hit (tiles, B, ct)) stacked per tile.
    Layout note (measured): the obvious (B, ct, 3) broadcast puts the
    3-vector on the LAST axis, which Mosaic pads to 128 lanes — a 42x VPU
    waste that made this scan cost 25 ms per call at B=64k, C=128. Six
    separate (B, ct) planes (x/y/z · lo/hi) keep every op on full tiles."""
    c = boxes.shape[0]
    cpad = (-c) % ct
    bx = boxes
    if cpad:
        far = jnp.zeros((cpad, 8), jnp.float32).at[:, 0:6].set(3.0e37)
        bx = jnp.concatenate([bx, far])
    planes = bx.T.reshape(8, -1, ct)        # (8, tiles, ct) component-major
    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
    ix, iy, iz = inv[:, 0:1], inv[:, 1:2], inv[:, 2:3]

    def step(carry, tile):
        lox, loy, loz, hix, hiy, hiz = (tile[k][None, :] for k in range(6))
        t0x = (lox - ox) * ix
        t1x = (hix - ox) * ix
        t0y = (loy - oy) * iy
        t1y = (hiy - oy) * iy
        t0z = (loz - oz) * iz
        t1z = (hiz - oz) * iz
        tmn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                      jnp.minimum(t0y, t1y)),
                          jnp.minimum(t0z, t1z))
        tmx = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                      jnp.maximum(t0y, t1y)),
                          jnp.maximum(t0z, t1z))
        hit = (tmx >= 0.0) & (tmn <= tmx) & (tmn < tl[:, None])
        return carry, (jnp.maximum(tmn, 0.0), hit)

    _, (tmn, hit) = jax.lax.scan(step, 0, jnp.swapaxes(planes, 0, 1))
    return tmn, hit


def _block_entries(boxes, orig_t, dir_t, t_row, blk: int):
    """(n_blocks, C) f32 chunk entry distances: min over the block's lanes
    of the clamped slab tmin, +inf where no lane hits the chunk AABB."""
    bb = orig_t.shape[1]
    nb = bb // blk
    o = orig_t.T
    inv = _safe_inv(dir_t.T)
    ct = 128
    c = boxes.shape[0]
    tmn, hit = _chunk_slabs(boxes, o, inv, t_row[0], ct)
    e = jnp.where(hit, tmn, _INF)                      # (tiles, B, ct)
    ys = jnp.min(e.reshape(-1, nb, blk, ct), axis=2)   # (tiles, nb, ct)
    return jnp.swapaxes(ys, 0, 1).reshape(nb, -1)[:, :c]


def _schedule(ft: ForestTables, orig_t, dir_t, t_row, blk: int, kk: int):
    """Sorted chunk schedule per block: (order (nb, Cp) i32, entries f32
    sorted ascending, padded to a multiple of kk with +inf no-ops)."""
    entries = _block_entries(ft.boxes, orig_t, dir_t, t_row, blk)
    c = entries.shape[1]
    order = jnp.argsort(entries, axis=1).astype(jnp.int32)
    ent = jnp.take_along_axis(entries, order, axis=1)
    cpad = (-c) % kk
    if cpad:
        order = jnp.concatenate(
            [order, jnp.repeat(order[:, -1:], cpad, axis=1)], axis=1)
        ent = jnp.concatenate(
            [ent, jnp.full((ent.shape[0], cpad), _INF)], axis=1)
    return order, ent, c


# ---------------------------------------------------------------------------
# kernel

def _kernel(sel_ref, ent_ref, nodes_ref, leaves_ref, orig_ref, dir_ref,
            it_ref, ip_ref, iu_ref, iv_ref,
            ot_ref, op_ref, ou_ref, ov_ref,
            leaf_width: int, lvl: int, any_hit: bool, blk: int):
    f32 = jnp.float32
    i32 = jnp.int32
    bf16 = jnp.bfloat16
    t_nodes = nodes_ref.shape[2]
    l_leaves = leaves_ref.shape[2]
    w = leaf_width
    b = pl.program_id(0)
    k = pl.program_id(1)

    # first chunk visit of this block: seed the running best from the pass
    # inputs (the out block then stays VMEM-resident across the K visits)
    @pl.when(k == 0)
    def _():
        ot_ref[0, :] = it_ref[0, :]
        op_ref[0, :] = ip_ref[0, :]
        ou_ref[0, :] = iu_ref[0, :]
        ov_ref[0, :] = iv_ref[0, :]

    best_t0 = ot_ref[0, :]
    best_p0 = op_ref[0, :]
    best_u0 = ou_ref[0, :]
    best_v0 = ov_ref[0, :]

    ox = orig_ref[0:1, :]
    oy = orig_ref[1:2, :]
    oz = orig_ref[2:3, :]
    dx = dir_ref[0:1, :]
    dy = dir_ref[1:2, :]
    dz = dir_ref[2:3, :]
    ix = _safe_inv(dx)
    iy = _safe_inv(dy)
    iz = _safe_inv(dz)

    # per-lane chunk skip: entry >= best_t lanes cannot improve (closest)
    # or are already blocked (any-hit). Entries and best_t are >= 0, so the
    # i32 bitcast compare matches float order (ent_ref is bitcast f32).
    ent_i = ent_ref[b, k]
    bt_i = jax.lax.bitcast_convert_type(best_t0, i32)
    live0 = ent_i < bt_i
    if any_hit:
        live0 = live0 & (best_p0 <= 0)

    s_rows = -(-(7 * lvl + 9) // 8) * 8
    stk_iota = jax.lax.broadcasted_iota(i32, (s_rows, blk), 0)

    init = (
        live0.astype(i32),                        # sp (root pre-pushed)
        jnp.zeros((s_rows, blk), i32),            # packed stack (root = 0)
        best_t0,
        best_p0,
        best_u0,
        best_v0,
        (best_p0 > 0).astype(i32) if any_hit else jnp.zeros((blk,), i32),
    )

    def cond(s):
        return jnp.max(s[0]) > 0

    def body(s):
        sp, stk, best_t, best_prim, best_u, best_v, blocked = s
        act = sp > 0

        pop_oh = stk_iota == (sp - 1)[None, :]
        popped = jnp.sum(jnp.where(pop_oh, stk, 0), axis=0)
        key = jax.lax.bitcast_convert_type(popped & jnp.int32(_KEY_MASK),
                                           f32)
        sp = sp - act.astype(i32)
        live = act & (key < best_t)
        is_leaf = (popped & _LEAF_BIT) != 0
        idx = popped & _IDX_MASK
        do_node = live & ~is_leaf
        visit_leaf = live & is_leaf

        cur = jnp.where(do_node, idx, -1)
        oh = (jax.lax.broadcasted_iota(i32, (t_nodes, blk), 0)
              == cur[None, :]).astype(bf16)
        rows = jax.lax.dot_general(
            nodes_ref[0], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)              # (72, BLK)

        lox = rows[0:8, :]
        loy = rows[8:16, :]
        loz = rows[16:24, :]
        hix = rows[24:32, :]
        hiy = rows[32:40, :]
        hiz = rows[40:48, :]
        t0x = (lox - ox) * ix
        t1x = (hix - ox) * ix
        t0y = (loy - oy) * iy
        t1y = (hiy - oy) * iy
        t0z = (loz - oz) * iz
        t1z = (hiz - oz) * iz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.minimum(t0z, t1z))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.maximum(t0z, t1z))
        tag = rows[48:56, :]
        cidx = (rows[56:64, :] * 256.0 + rows[64:72, :]).astype(i32)
        hit = (tmax >= 0.0) & (tmin <= tmax) & (tmin < best_t[None, :])
        valid = do_node[None, :] & hit & (tag != TAG_EMPTY)
        kb = jax.lax.bitcast_convert_type(jnp.maximum(tmin, 0.0), i32)
        packed = ((kb & jnp.int32(_KEY_MASK))
                  | jnp.where(tag == TAG_LEAF, _LEAF_BIT, 0) | cidx)
        packed = jnp.where(valid, packed, _INVALID)

        for j in range(8):
            deeper = valid & (packed > packed[j:j + 1, :])
            r = jnp.sum(deeper.astype(i32), axis=0)
            row_j = jnp.where(valid[j, :], sp + r, -1)
            stk = jnp.where(stk_iota == row_j[None, :],
                            packed[j:j + 1, :], stk)
        sp = sp + jnp.sum(valid.astype(i32), axis=0)

        li = jnp.where(visit_leaf, idx, -1)
        oh_l = (jax.lax.broadcasted_iota(i32, (l_leaves, blk), 0)
                == li[None, :]).astype(bf16)
        lrows = jax.lax.dot_general(
            leaves_ref[0], oh_l, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)          # (30*W, BLK)

        def val(c):
            return ((lrows[c * w:(c + 1) * w, :]
                     + lrows[(9 + c) * w:(10 + c) * w, :])
                    + lrows[(18 + c) * w:(19 + c) * w, :])

        ax = val(0)
        ay = val(1)
        az = val(2)
        e1x = val(3)
        e1y = val(4)
        e1z = val(5)
        e2x = val(6)
        e2y = val(7)
        e2z = val(8)
        tc = 27 * w
        tid = (lrows[tc:tc + w, :] * 65536.0
               + lrows[tc + w:tc + 2 * w, :] * 256.0
               + lrows[tc + 2 * w:tc + 3 * w, :]).astype(i32) - 1
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = jnp.abs(det) >= TRI_EPS
        idet = 1.0 / jnp.where(ok, det, 1.0)
        tvx = ox - ax
        tvy = oy - ay
        tvz = oz - az
        u = (tvx * px + tvy * py + tvz * pz) * idet
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        v = (dx * qx + dy * qy + dz * qz) * idet
        t = (e2x * qx + e2y * qy + e2z * qz) * idet
        ok = ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) \
            & (u + v <= 1.0) & (t >= 0.0) & (t < best_t[None, :]) \
            & (tid >= 0) & visit_leaf[None, :]
        if any_hit:
            blocked = jnp.maximum(blocked, jnp.max(ok.astype(i32), axis=0))
            sp = jnp.where(blocked > 0, 0, sp)
        else:
            t_c = jnp.where(ok, t, BIG)
            t_min = jnp.min(t_c, axis=0)
            improved = jnp.max(ok.astype(i32), axis=0) > 0
            slot_iota = jax.lax.broadcasted_iota(i32, (w, blk), 0)
            win = ok & (t_c == t_min[None, :])
            first = jnp.min(jnp.where(win, slot_iota, w), axis=0)
            sel = win & (slot_iota == first[None, :])
            best_t = jnp.where(improved, t_min, best_t)
            best_prim = jnp.where(improved,
                                  jnp.sum(jnp.where(sel, tid, 0), axis=0),
                                  best_prim)
            best_u = jnp.where(improved,
                               jnp.sum(jnp.where(sel, u, 0.0), axis=0),
                               best_u)
            best_v = jnp.where(improved,
                               jnp.sum(jnp.where(sel, v, 0.0), axis=0),
                               best_v)
        return sp, stk, best_t, best_prim, best_u, best_v, blocked

    s = jax.lax.while_loop(cond, body, init)
    _, _, best_t, best_prim, best_u, best_v, blocked = s
    ot_ref[0, :] = best_t
    op_ref[0, :] = blocked if any_hit else best_prim
    ou_ref[0, :] = best_u
    ov_ref[0, :] = best_v


@functools.partial(jax.jit,
                   static_argnames=("leaf_width", "lvl", "any_hit", "blk"))
def _launch(sel, ent_i, nodes_all, leaves_all, orig_t, dir_t,
            it, ip, iu, iv,
            leaf_width: int, lvl: int, any_hit: bool, blk: int):
    bb = orig_t.shape[1]
    nb = bb // blk
    kk = sel.shape[1]
    tp = nodes_all.shape[2]
    rl = leaves_all.shape[1]
    lp = leaves_all.shape[2]
    kernel = functools.partial(_kernel, leaf_width=leaf_width, lvl=lvl,
                               any_hit=any_hit, blk=blk)
    ray_spec = lambda: pl.BlockSpec((3, blk), lambda b, k, sel, ent: (0, b),
                                    memory_space=pltpu.VMEM)
    row_spec = lambda: pl.BlockSpec((1, blk), lambda b, k, sel, ent: (0, b),
                                    memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, kk),
        in_specs=[
            pl.BlockSpec((1, 72, tp), lambda b, k, sel, ent: (sel[b, k], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rl, lp), lambda b, k, sel, ent: (sel[b, k], 0, 0),
                         memory_space=pltpu.VMEM),
            ray_spec(), ray_spec(),
            row_spec(), row_spec(), row_spec(), row_spec(),
        ],
        out_specs=(row_spec(), row_spec(), row_spec(), row_spec()),
    )
    out_shapes = (
        jax.ShapeDtypeStruct((1, bb), jnp.float32),
        jax.ShapeDtypeStruct((1, bb), jnp.int32),
        jax.ShapeDtypeStruct((1, bb), jnp.float32),
        jax.ShapeDtypeStruct((1, bb), jnp.float32),
    )
    return pl.pallas_call(kernel, grid_spec=grid_spec,
                          out_shape=out_shapes)(
        sel, ent_i, nodes_all, leaves_all, orig_t, dir_t, it, ip, iu, iv)


# ---------------------------------------------------------------------------
# work-queue scheduling: per-RAY chunk visits (the default driver)
#
# Block-level scheduling pays the union of its lanes' chunk lists — measured
# 40-76 of 128 chunks per 1024-lane block on incoherent rays, while a single
# ray's best-t-pruned list averages 1.67 chunks. The work queue schedules
# per ray: each round computes every live ray's next chunk (the nearest
# unvisited chunk whose entry distance still beats the ray's best-t), sorts
# rays by that chunk, pads each chunk's segment to a block multiple so every
# kernel block holds ONE chunk with fully-live lanes, runs the streamed
# kernel, and merges. Rounds continue until no ray has a viable chunk
# (p90 = 3 rounds on the forest bench).

WQ_BLK = 128   # work-queue block: small blocks keep per-chunk padding low
               # (padding ~ C*blk/2 slots) and per-step cost scales with blk


def _next_chunk(boxes, o, d, inv, best_t, cur_e, cur_c):
    """Per-ray (entry, chunk) of the nearest chunk strictly after the
    (cur_e, cur_c) cursor in (entry, id) lexicographic order, restricted to
    entry < best_t. Returns (entry f32 (+inf none), chunk i32 (-1 none)).
    Component-major slab tests (see _chunk_slabs layout note)."""
    ct = 128
    c = boxes.shape[0]
    b = o.shape[0]
    tl = jnp.broadcast_to(jnp.float32(jnp.inf), (b,))
    tmn, hit = _chunk_slabs(boxes, o, inv, tl, ct)      # (tiles, B, ct)
    init = (jnp.full((b,), _INF), jnp.full((b,), -1, jnp.int32))

    def step(carry, tile):
        e_best, c_best = carry
        e, ht, cid0 = tile
        cid = cid0 + jax.lax.broadcasted_iota(jnp.int32, (1, ct), 1)
        cand = ht & (e < best_t[:, None]) \
            & ((e > cur_e[:, None])
               | ((e == cur_e[:, None]) & (cid > cur_c[:, None])))
        e_m = jnp.where(cand, e, _INF)
        cid_m = jnp.where(cand, cid, jnp.int32(0x7FFFFFFF))
        # min by (entry, id): first the min entry, then min id at that entry
        e_t = jnp.min(e_m, axis=1)
        c_t = jnp.min(jnp.where(e_m == e_t[:, None], cid_m, 0x7FFFFFFF),
                      axis=1)
        upd = (e_t < e_best) | ((e_t == e_best) & (c_t < c_best)
                                & (e_t < _INF))
        return (jnp.where(upd, e_t, e_best),
                jnp.where(upd, c_t, c_best)), None

    n_tiles = tmn.shape[0]
    cid0s = (jnp.arange(n_tiles, dtype=jnp.int32) * ct)[:, None]
    (e_best, c_best), _ = jax.lax.scan(step, init, (tmn, hit, cid0s))
    c_best = jnp.where(jnp.isfinite(e_best), c_best, -1)
    return e_best, c_best


def _run_workqueue(ft: ForestTables, orig_t, dir_t, t_row, any_hit: bool,
                   blk: int = WQ_BLK):
    """Round loop: each round visits every live ray's next chunk.

    Carry: best (t, prim/blocked, u, v), cursor (cur_e, cur_c) = last
    visited (entry, chunk) per ray, and the precomputed next visit
    (ne, nc; nc = -1 when the ray is finished). A ray's rounds walk its
    chunks in (entry, id) order; best-t shrinking between rounds prunes
    the tail. All shapes static; runs inside jit/while_loop."""
    c = ft.boxes.shape[0]
    bb = orig_t.shape[1]
    o = orig_t.T
    d = dir_t.T
    inv = _safe_inv(d)
    cap = bb + c * blk            # padded-segment slot bound
    nb = cap // blk
    sel_ent = jnp.zeros((nb, 1), jnp.int32)
    lw = int(ft.leaf_width)
    lvl = int(ft.lvl)

    t0 = t_row[0]
    bp0 = (jnp.zeros((bb,), jnp.int32) if any_hit
           else jnp.full((bb,), -1, jnp.int32))
    z = jnp.zeros((bb,), jnp.float32)
    cur_e0 = jnp.full((bb,), -1.0, jnp.float32)
    cur_c0 = jnp.full((bb,), -1, jnp.int32)
    ne0, nc0 = _next_chunk(ft.boxes, o, d, inv, t0, cur_e0, cur_c0)
    # per-ray direction octant, constant across rounds: sub-sorting each
    # chunk segment by octant groups lanes with similar near-first child
    # order, cutting the block's max-trips divergence
    octant = ((d[:, 0] < 0).astype(jnp.int32)
              | ((d[:, 1] < 0).astype(jnp.int32) << 1)
              | ((d[:, 2] < 0).astype(jnp.int32) << 2))

    def cond(s):
        return jnp.any(s[7] >= 0)

    def body(s):
        bt, bp, bu, bv, cur_e, cur_c, ne, nc = s
        live = nc >= 0
        key = jnp.where(live, nc * 8 + octant, c * 8)
        order = jnp.argsort(key)
        rank = jnp.argsort(order)
        ch_sorted = key[order] // 8
        starts = jnp.searchsorted(ch_sorted, jnp.arange(c + 1),
                                  side="left").astype(jnp.int32)
        count = starts[1:] - starts[:-1]              # (C,) live per chunk
        pc = -(-count // blk) * blk                   # padded to block size
        ps = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(pc)])

        # block -> chunk: padding makes every block a single-chunk block
        bpos = jnp.arange(nb, dtype=jnp.int32) * blk
        cb = jnp.clip(
            jnp.searchsorted(ps, bpos, side="right").astype(jnp.int32) - 1,
            0, c - 1)
        sel = cb[:, None]

        # slot -> ray (dead pad slots get in_t = 0 => zero kernel steps)
        s_idx = jnp.arange(cap, dtype=jnp.int32)
        c_slot = jnp.repeat(cb, blk)
        j = s_idx - ps[c_slot]
        dead = (j < 0) | (j >= count[c_slot])
        ray = jnp.where(
            dead, 0, order[jnp.clip(starts[c_slot] + j, 0, bb - 1)])
        it = jnp.where(dead, 0.0, bt[ray])[None, :]
        ip = jnp.where(dead, 0, bp[ray])[None, :]
        iu = bu[ray][None, :]
        iv = bv[ray][None, :]

        ot, op, ou, ov = _launch(sel, sel_ent, ft.nodes, ft.leaves,
                                 o[ray].T, d[ray].T, it, ip, iu, iv,
                                 leaf_width=lw, lvl=lvl, any_hit=any_hit,
                                 blk=blk)

        # merge: live ray r sits at slot ps[nc] + (rank - starts[nc])
        nc_cl = jnp.clip(nc, 0, c - 1)
        slot_r = jnp.clip(ps[nc_cl] + (rank - starts[nc_cl]), 0, cap - 1)
        bt = jnp.where(live, ot[0, slot_r], bt)
        bp = jnp.where(live, op[0, slot_r], bp)
        bu = jnp.where(live, ou[0, slot_r], bu)
        bv = jnp.where(live, ov[0, slot_r], bv)

        # advance cursor past the visited chunk; find the next one
        cur_e = jnp.where(live, ne, cur_e)
        cur_c = jnp.where(live, nc, cur_c)
        eff_t = jnp.where(bp > 0, 0.0, bt) if any_hit else bt
        ne2, nc2 = _next_chunk(ft.boxes, o, d, inv, eff_t, cur_e, cur_c)
        return bt, bp, bu, bv, cur_e, cur_c, ne2, nc2

    state = (t0, bp0, z, z, cur_e0, cur_c0, ne0, nc0)
    bt, bp, bu, bv = jax.lax.while_loop(cond, body, state)[:4]
    return bt[None, :], bp[None, :], bu[None, :], bv[None, :]


# ---------------------------------------------------------------------------
# drivers: schedule + multi-pass while_loop (jit-safe, no host sync)

def _run_passes(ft: ForestTables, orig_t, dir_t, t_row, any_hit: bool,
                blk: int, kk: int):
    nb = orig_t.shape[1] // blk
    order, ent, c = _schedule(ft, orig_t, dir_t, t_row, blk, kk)
    ent_i = jax.lax.bitcast_convert_type(ent, jnp.int32)
    bb = orig_t.shape[1]
    init = (
        jnp.int32(0),
        t_row,
        jnp.zeros((1, bb), jnp.int32) if any_hit
        else jnp.full((1, bb), -1, jnp.int32),
        jnp.zeros((1, bb), jnp.float32),
        jnp.zeros((1, bb), jnp.float32),
    )

    def cond(s):
        off, t, p, u, v = s
        col = jax.lax.dynamic_slice(ent, (0, off), (nb, 1))[:, 0]
        cur = t.reshape(nb, blk)
        if any_hit:
            cur = jnp.where(p.reshape(nb, blk) > 0, 0.0, cur)
        bmax = jnp.max(cur, axis=1)
        return (off < c) & jnp.any(col < bmax)

    def body(s):
        off, t, p, u, v = s
        sel = jax.lax.dynamic_slice(order, (0, off), (nb, kk))
        ei = jax.lax.dynamic_slice(ent_i, (0, off), (nb, kk))
        t, p, u, v = _launch(sel, ei, ft.nodes, ft.leaves, orig_t, dir_t,
                             t, p, u, v, leaf_width=int(ft.leaf_width),
                             lvl=int(ft.lvl), any_hit=any_hit, blk=blk)
        return off + kk, t, p, u, v

    _, t, p, u, v = jax.lax.while_loop(cond, body, init)
    return t, p, u, v


def _sorted(ft, orig, dir, t_max, fn):
    """Coherence-sort rays (and their per-lane max distances) by
    octant+Morton over the forest bounds so a block's chunk schedule stays
    short (see ops/ray_sort.py)."""
    from fluctus_tpu.ops import ray_sort
    lo = jnp.min(ft.boxes[:, 0:3], axis=0)
    hi = jnp.max(ft.boxes[:, 3:6], axis=0)
    t_vec = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                             (orig.shape[0],))
    keys = ray_sort.ray_sort_keys(orig, dir, lo, hi)
    orderr = jnp.argsort(keys)
    inv = jnp.argsort(orderr)
    out = fn(orig[orderr], dir[orderr], t_vec[orderr])
    return jax.tree_util.tree_map(lambda a: a[inv], out)


def traverse_closest(ft: ForestTables, orig, dir, t_max,
                     blk: int = BLK, kk: int = K_CHUNKS,
                     mode: str = "workqueue",
                     wq_blk: int | None = None) -> Traversal:
    if mode == "workqueue":
        wq = wq_blk or WQ_BLK
        orig_t, dir_t, t_row, b = _prep(orig, dir, t_max, wq)
        t, p, u, v = _run_workqueue(ft, orig_t, dir_t, t_row, False, blk=wq)
        return Traversal(t[0, :b], p[0, :b], u[0, :b], v[0, :b])

    def fn(o, d, tv):
        orig_t, dir_t, t_row, b = _prep(o, d, tv, blk)
        t, p, u, v = _run_passes(ft, orig_t, dir_t, t_row, False, blk, kk)
        return Traversal(t[0, :b], p[0, :b], u[0, :b], v[0, :b])
    return _sorted(ft, orig, dir, t_max, fn)


def traverse_any(ft: ForestTables, orig, dir, t_max,
                 blk: int = BLK, kk: int = K_CHUNKS,
                 mode: str = "workqueue",
                 wq_blk: int | None = None) -> jnp.ndarray:
    if mode == "workqueue":
        wq = wq_blk or WQ_BLK
        orig_t, dir_t, t_row, b = _prep(orig, dir, t_max, wq)
        _, p, _, _ = _run_workqueue(ft, orig_t, dir_t, t_row, True, blk=wq)
        return p[0, :b] > 0

    def fn(o, d, tv):
        orig_t, dir_t, t_row, b = _prep(o, d, tv, blk)
        _, p, _, _ = _run_passes(ft, orig_t, dir_t, t_row, True, blk, kk)
        return p[0, :b] > 0
    return _sorted(ft, orig, dir, t_max, fn)
